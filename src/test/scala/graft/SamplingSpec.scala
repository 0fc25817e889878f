package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.mesh.Fixtures
import graft.pipeline.Sampling

/** Deterministic sampling/sharding: library forms equal the SQL query
  * forms byte-for-byte, strata are sampled near their configured rates,
  * and shards are balanced — all without RNG state. */
class SamplingSpec extends AnyFunSuite {

  lazy val spark = TestSessions.spark
  private def docs = {
    Fixtures.registerRaw(spark, TestSessions.sfDir)
    spark.table("documents")
  }

  test("budgetFill equals the sp7 SQL form; pre-prune is lossless; greedy holds") {
    import org.apache.spark.sql.functions._
    val sql = graft.SparkEntry.queries("sp7_budget_fill")(spark, TestSessions.sfDir)
    val lib = graft.pipeline.Sampling
      .budgetFill(docs, "doc_id", "text", "source", budgetTokens = 800L)
    assert(lib.columns.toSeq == sql.columns.toSeq)
    assert(lib.collect().toSeq == sql.collect().toSeq)
    // the per-partition pre-prune must not change the answer (losslessness
    // of the local-budget-prefix bound) — exercised across MANY partitions,
    // where each partition sees an arbitrary slice of every source
    val pruned = graft.pipeline.Sampling
      .budgetFill(docs.repartition(7), "doc_id", "text", "source", 800L,
        prePrune = true)
    assert(pruned.collect().toSeq == lib.collect().toSeq)
    // budget respected per source; selection is quality-greedy: no
    // unselected doc outranks a selected one within its source
    val rows = lib.collect()
    assert(rows.nonEmpty)
    val maxCum = rows.groupBy(_.getString(0)).values.map(_.map(_.getLong(4)).max)
    assert(maxCum.forall(_ <= 800L))
    val minSelQ = rows.groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(2)).min).toMap
    val all = docs.select(col("source"), col("doc_id").cast("long"),
      round(size(array_distinct(split(col("text"), " "))) /
        size(split(col("text"), " ")).cast("double") * 1e6).cast("long"))
      .collect()
    val selected = rows.map(r => (r.getString(0), r.getLong(1))).toSet
    all.filterNot(r => selected((r.getString(0), r.getLong(1)))).foreach { r =>
      minSelQ.get(r.getString(0)).foreach { q =>
        assert(r.getLong(2) <= q,
          s"unselected ${r.getLong(1)} outranks selected minimum in ${r.getString(0)}")
      }
    }
  }

  test("stratifiedSample equals the sp1 SQL form; rates are honored") {
    val lib = Sampling.stratifiedSample(
        docs, "doc_id", "lang",
        rates = Map("en" -> 128, "de" -> 64, "zh" -> 16), defaultRate = 32)
      .select(col("doc_id"), col("lang")).orderBy(col("doc_id"))
    val sql = spark.sql(
      graft.pipeline.PipelineQueries.sparkSqlFor("sp1_stratified_sample"))
    assert(lib.collect().toSeq == sql.collect().toSeq)

    // per-stratum keep fraction tracks rate/256 (binomial tolerance on the
    // small fixture: lang counts are ~100+ per stratum)
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = lib.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val enFrac = kept.getOrElse("en", 0L).toDouble / total("en")
    assert(math.abs(enFrac - 0.5) < 0.15, s"en keep fraction $enFrac")
    // zh (16/256 = 6%) must be sampled far below en (50%)
    val zhFrac = kept.getOrElse("zh", 0L).toDouble / total("zh")
    assert(zhFrac < enFrac / 2, s"zh=$zhFrac en=$enFrac")
    // determinism: a second evaluation selects the identical rows
    assert(lib.collect().toSeq == sql.collect().toSeq)
  }

  test("rate 256 keeps every row of the stratum (keep-all threshold)") {
    val en = docs.where(col("lang") === "en")
    val kept = Sampling.stratifiedSample(
      docs, "doc_id", "lang", rates = Map("en" -> 256), defaultRate = 0)
    assert(kept.count() == en.count())
    assert(kept.where(col("lang") =!= "en").count() == 0)
  }

  test("curation chain filters monotonically and is repeatable") {
    import graft.pipeline.{Curation, TextAnalysis}
    val all = docs.count()
    val en = docs.where(col("lang") === "en")
    val gated = TextAnalysis.quality(en, "text")
      .where(col("n_tokens") >= 5 && col("stopword_ratio") >= 0.05)
    val curated = Curation.curate(docs, "doc_id", "text", "lang")
    assert(en.count() < all)
    assert(gated.count() > 0 && gated.count() <= en.count())
    assert(curated.count() > 0 && curated.count() <= gated.count())
    // repeatability: same rows, same shards, twice
    val once = curated.select("doc_id", "shard").collect().toSeq.sortBy(_.getLong(0))
    val twice = Curation.curate(docs, "doc_id", "text", "lang")
      .select("doc_id", "shard").collect().toSeq.sortBy(_.getLong(0))
    assert(once == twice)
    assert(curated.select("shard").distinct().count() <= 4)
  }

  test("sourceMix equals the sp4 SQL form; copy counts honor the weights") {
    val lib = Sampling.sourceMix(
        docs, "doc_id", "source",
        weights = Map("src0" -> 2.5, "src1" -> 2.5, "src2" -> 2.5,
          "src3" -> 2.5, "src19" -> 0.25))
      .select(col("ord_hash"), col("doc_id"), col("copy").cast("long").as("copy"),
        col("source"))
      .orderBy(col("ord_hash"), col("doc_id"), col("copy"))
    val sql = spark.sql(
      graft.pipeline.PipelineQueries.sparkSqlFor("sp4_source_mixing"))
    assert(lib.collect().toSeq == sql.collect().toSeq)

    // every premium-source doc appears at least twice (floor(2.5)); the
    // fractional third copy lands on ~half of them
    val perDoc = lib.where(col("source") === "src0")
      .groupBy("doc_id").count().collect().map(_.getLong(1))
    assert(perDoc.nonEmpty && perDoc.forall(n => n == 2 || n == 3), perDoc.toSeq.toString)
    // a weight below 1 drops docs entirely, never duplicates
    val down = lib.where(col("source") === "src19")
      .groupBy("doc_id").count().collect().map(_.getLong(1))
    assert(down.forall(_ == 1))
    val src19Total = docs.where(col("source") === "src19").count()
    assert(down.length < src19Total, s"0.25x kept ${down.length} of $src19Total")
    // unweighted sources pass through exactly once
    val rest = lib.where(!col("source").isin("src0", "src1", "src2", "src3", "src19"))
    assert(rest.count() == docs.where(
      !col("source").isin("src0", "src1", "src2", "src3", "src19")).count())
    // weight 0 means gone
    assert(Sampling.sourceMix(docs, "doc_id", "source",
      weights = Map("src5" -> 0.0)).where(col("source") === "src5").isEmpty)
    // integer weights repeat exactly, no fractional draw involved
    val twice = Sampling.sourceMix(docs, "doc_id", "source",
        weights = Map("src5" -> 2.0)).where(col("source") === "src5")
      .groupBy("doc_id").count().collect().map(_.getLong(1))
    assert(twice.forall(_ == 2))
  }

  test("withShard matches the sp2 SQL aggregation; shards are balanced") {
    val sharded = Sampling.withShard(docs, "doc_id", nShards = 8)
    val libAgg = sharded.groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"),
        sum(col("doc_id")).as("sum_ids"))
      .orderBy(col("shard"))
    val sqlAgg = spark.sql(
      graft.pipeline.PipelineQueries.sparkSqlFor("sp2_shard_assign"))
    assert(libAgg.collect().toSeq == sqlAgg.collect().toSeq)

    val counts = libAgg.select(col("n_docs")).collect().map(_.getLong(0))
    assert(counts.length == 8, s"expected 8 non-empty shards, got ${counts.length}")
    // hash sharding keeps shards within a sane balance envelope
    assert(counts.max.toDouble / counts.min < 2.0,
      s"shard skew ${counts.mkString(",")}")
  }

  test("withSplit matches the sp5 SQL aggregation; splits near 80/10/10") {
    val split = Sampling.withSplit(docs, "doc_id")
    val libAgg = split.groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
      .orderBy(col("source"), col("split"))
    val sqlAgg = spark.sql(
      graft.pipeline.PipelineQueries.sparkSqlFor("sp5_train_split"))
    assert(libAgg.collect().toSeq == sqlAgg.collect().toSeq)
    val frac = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = frac.values.sum.toDouble
    assert(frac("train") / total > 0.7 && frac("train") / total < 0.9)
    assert(frac("val") / total > 0.05 && frac("test") / total > 0.05)
  }

  test("leakageSafeSplit: no near-dup pair straddles splits; rates hold") {
    import graft.pipeline.Dedup
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text")
    val clusters = Dedup.connectedComponents(pairs)
    val split = Sampling.leakageSafeSplit(docs, "doc_id", clusters)
      .select(col("doc_id"), col("split"), col("split_group"))
    // THE guarantee: both ends of every verified near-dup pair land in
    // the same split (follows from cluster-keyed hashing + component
    // correctness, asserted end-to-end here)
    val straddling = pairs.select(col("doc_a"), col("doc_b"))
      .join(split.select(col("doc_id").as("doc_a"), col("split").as("sa")), "doc_a")
      .join(split.select(col("doc_id").as("doc_b"), col("split").as("sb")), "doc_b")
      .where(col("sa") =!= col("sb")).count()
    assert(straddling == 0, s"$straddling near-dup pairs straddle splits")
    // clustered docs adopt their keeper's group key
    val badGroup = split.join(clusters, "doc_id")
      .where(col("split_group") =!= col("cluster_id")).count()
    assert(badGroup == 0)
    // group-keyed hashing still lands near the 80/10/10 envelope
    val frac = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = frac.values.sum.toDouble
    assert(frac("train") / total > 0.7 && frac("train") / total < 0.9)
    assert(frac("val") / total > 0.03 && frac("test") / total > 0.05)
  }

  test("softDedup: expected cluster mass ~1 doc, weights restore totals, unclustered always kept") {
    import graft.pipeline.Dedup
    val clusters = Dedup.connectedComponents(
      Dedup.minhashLshPairs(docs, "doc_id", "text"))
    val soft = Sampling.softDedup(docs, "doc_id", clusters)
    // total row count unchanged: soft dedup never drops rows, it marks them
    assert(soft.count() == docs.count())
    // unclustered docs (cluster_size = 1) are ALWAYS kept with weight 1
    assert(soft.where(col("cluster_size") === 1 &&
      (!col("kept") || col("weight") =!= 1)).count() == 0)
    // kept docs carry weight = cluster_size; dropped docs weight 0
    assert(soft.where(col("kept") && col("weight") =!= col("cluster_size"))
      .count() == 0)
    assert(soft.where(!col("kept") && col("weight") =!= 0).count() == 0)
    // keep probability is ceil(256/n)/256 by construction: per cluster the
    // number of kept members is binomial around 1 — assert the corpus-level
    // invariant instead of per-cluster luck: the kept count lands within
    // the deterministic bounds [sum over clusters of 0, n * ceil] and the
    // draw is reproducible (two runs agree exactly)
    val again = Sampling.softDedup(docs, "doc_id", clusters)
    assert(soft.orderBy("doc_id").collect().toSeq ==
      again.orderBy("doc_id").collect().toSeq)
    // clustered mass shrinks: strictly fewer kept than members across
    // clusters of size >= 2 (at 256/2 = 128/256 per doc this holds with
    // overwhelming margin on any non-trivial cluster set)
    val big = soft.where(col("cluster_size") >= 2)
    if (big.count() >= 4) {
      assert(big.where(col("kept")).count() < big.count())
    }
  }

  test("curated shards export via partitionBy and read back identically") {
    import graft.pipeline.Curation
    val curated = Curation.curate(docs, "doc_id", "text", "lang")
      .select(col("doc_id"), col("text"), col("shard"))
    val out = java.nio.file.Files.createTempDirectory("graft_shard_export").toString
    // the actual training-export sink: one directory per shard
    curated.repartition(col("shard"))
      .write.partitionBy("shard").mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    // hive-style partition discovery restores the shard column; rows and
    // shard assignment survive the round-trip exactly
    assert(back.columns.toSet == Set("doc_id", "text", "shard"))
    val a = curated.select(col("doc_id"), col("shard").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = back.select(col("doc_id"), col("shard").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
    // each shard directory holds exactly its rows (partition pruning reads
    // one directory, not a filter over everything)
    val one = spark.read.parquet(s"$out/shard=0")
    assert(one.count() == curated.where(col("shard") === 0).count())
  }
}
