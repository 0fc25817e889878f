package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Skew
import graft.mesh.Fixtures

/** Salted aggregation/join must equal their unsalted equivalents. */
class SkewSpec extends AnyFunSuite {

  lazy val spark = TestSessions.spark

  test("saltedAggCount == plain groupBy count") {
    Fixtures.registerRaw(spark, TestSessions.sfDir)
    val li = spark.table("raw_lineitem")
    val plain = li.groupBy("l_returnflag").count()
    val salted = Skew.saltedAggCount(li, Seq("l_returnflag"))
    assert(plain.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(plain).count() == 0)
  }

  test("AQE splits skewed join partitions at runtime (skew=true in final plan)") {
    // one hot key carries ~99% of the left side; with broadcast disabled
    // the SMJ's hot partition crosses the (lowered) skew threshold and
    // AQE's OptimizeSkewedJoin must split it — the runtime complement to
    // the manual salting helpers for ad-hoc queries.
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      val left = spark.range(0, 300000).select(
        when(col("id") % 100 === 0, col("id")).otherwise(lit(0L)).as("k"),
        concat(lit("payload_payload_payload_"), col("id")).as("p"))
      val right = spark.range(0, 2000).select(col("id").as("k"),
        concat(lit("dim_"), col("id")).as("d"))
      // keep the payload in the output: pruning it shrinks the hot
      // partition's (compressed) shuffle bytes below any sane threshold
      val joined = left.join(right, "k")
      // execute THIS queryExecution so the adaptive plan is finalized
      assert(joined.collect().length > 0)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"), finalPlan.take(2000))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter from a selective dim lands on the fact side") {
    // the row-level runtime-filtering complement to DPP: a selective
    // filter on the creation side injects bloom_filter_might_contain
    // into the application-side scan, cutting shuffle input at 100 TB
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      Fixtures.registerRaw(spark, TestSessions.sfDir)
      val fact = spark.table("raw_lineitem")
      val dim = spark.table("raw_orders").where(col("o_totalprice") > 400000.0)
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("o_totalprice"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") &&
        optimized.contains("bloom_filter_agg"), optimized.take(1500))
      // correctness unchanged by the runtime filter
      val expect = fact.select(col("l_orderkey"))
        .join(dim.select(col("o_orderkey"), col("o_totalprice")),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expect)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("skew fixture: boilerplate doc at ~5% corpus mass — LSH bucket valve engages") {
    // the first thing a real web corpus does: one boilerplate page
    // ("terms of service...") repeated across a visible fraction of all
    // documents. Every copy has the SAME shingle set, so every copy lands
    // in the SAME (band, bsig) bucket in all bands — the degenerate
    // mega-bucket whose s² in-bucket pair work would dominate the job
    // from one task. The maxBucketSize valve must skip it; exact dedup
    // (dd1) catches the group at 1/s² the cost.
    Fixtures.registerRaw(spark, TestSessions.sfDir)
    val real = spark.table("documents").select(col("doc_id"), col("text"))
    val maxId = real.agg(max("doc_id")).head.getLong(0)
    val nBoiler = math.max(30, (real.count() / 20).toInt) // ~5% of the corpus
    val boiler = spark.range(1, nBoiler + 1)
      .select((col("id") + maxId).as("doc_id"),
        lit("terms of service apply to all content on this page all " +
          "rights reserved contact us for more information about this site").as("text"))
    val skewed = real.unionByName(boiler)
    val idx = graft.pipeline.Dedup.bandIndex(skewed, "doc_id", "text")
      .drop("hash_family")
    val uncapped = graft.pipeline.Dedup.lshCandidatesGrouped(idx)
    val capped = graft.pipeline.Dedup
      .lshCandidatesGrouped(idx, maxBucketSize = Some(16))
    // without the valve the mega-bucket pays the full quadratic blowup:
    // C(n,2) boilerplate-boilerplate candidate pairs
    val bb = uncapped.where(col("da") > maxId && col("db") > maxId).count()
    assert(bb == nBoiler.toLong * (nBoiler - 1) / 2, s"n=$nBoiler bb=$bb")
    // with the valve the mega-bucket is skipped entirely...
    assert(capped.where(col("da") > maxId && col("db") > maxId).count() == 0)
    // ...and candidates among REAL documents are byte-identical (no real
    // near-dup bucket is anywhere near the cap)
    def realPairs(df: org.apache.spark.sql.DataFrame) =
      df.where(col("da") <= maxId && col("db") <= maxId)
    assert(realPairs(capped).exceptAll(realPairs(uncapped)).count() == 0)
    assert(realPairs(uncapped).exceptAll(realPairs(capped)).count() == 0)
    // the documented division of labor: the exact-dedup pass the valve
    // defers to collapses the boilerplate group to one keeper
    val kept = graft.pipeline.Dedup.exact(skewed, "doc_id", "text")
    assert(kept.where(col("keeper") > maxId).count() == 1)
    assert(kept.where(col("keeper") > maxId).head.getLong(2) == nBoiler.toLong)
  }

  test("skew fixture: mega-user owning half of events — salted agg still exact") {
    // one bot/system account emitting a large share of all events is the
    // event-stream analogue of the boilerplate doc: a single groupBy key
    // whose reducer would own half the corpus at 100 TB. Salting must
    // produce exactly the plain result while spreading the hot key.
    Fixtures.registerRaw(spark, TestSessions.sfDir)
    val ev = spark.table("events").select("user_id", "event_id")
    val hot = lit(-1L).cast(ev.schema("user_id").dataType)
    val skewed = ev.withColumn("user_id",
      when(col("event_id") % 2 === 0, hot).otherwise(col("user_id")))
    val plain = skewed.groupBy("user_id").count()
    val salted = Skew.saltedAggCount(skewed, Seq("user_id"))
    assert(plain.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(plain).count() == 0)
    // the hot key really is hot in the fixture (sanity: >= 40% of rows)
    val total = skewed.count()
    val hotN = plain.where(col("user_id") === -1L).head.getLong(1)
    assert(hotN >= (total * 2) / 5, s"hot=$hotN total=$total")
    // and the salted phase-1 spreads it: no (key, salt) partial exceeds
    // ~1/8 of the hot key's mass at 16 buckets (deterministic xxhash salt)
    val maxPartial = skewed
      .withColumn("__salt", pmod(xxhash64(struct(skewed.columns.map(col): _*)), lit(16L)))
      .where(col("user_id") === -1L)
      .groupBy("__salt").count().agg(max("count")).head.getLong(0)
    assert(maxPartial <= hotN / 8 + hotN / 16, s"maxPartial=$maxPartial hot=$hotN")
  }

  test("saltedJoin == plain join (inner and left)") {
    Fixtures.registerRaw(spark, TestSessions.sfDir)
    val li = spark.table("raw_lineitem").select("l_orderkey", "l_suppkey", "l_quantity")
    val supp = spark.table("raw_supplier").select("s_suppkey", "s_name")
      .withColumnRenamed("s_suppkey", "l_suppkey")
    val plain = li.join(supp, Seq("l_suppkey"))
    val salted = Skew.saltedJoin(li, supp, Seq("l_suppkey"))
    assert(plain.count() == salted.count())
    assert(plain.exceptAll(salted).count() == 0)

    val plainLeft = li.join(supp, Seq("l_suppkey"), "left")
    val saltedLeft = Skew.saltedJoin(li, supp, Seq("l_suppkey"), joinType = "left")
    assert(plainLeft.count() == saltedLeft.count())
  }
}
