package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.mesh.Fixtures
import graft.pipeline.{Curation, Dedup, Similarity, TextAnalysis}

/** The composable library API must produce exactly the same results as the
  * oracle-validated SQL queries (same algorithms, DataFrame-API surface). */
class LibraryApiSpec extends AnyFunSuite {

  lazy val spark = TestSessions.spark
  private def sfDir = TestSessions.sfDir

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sfDir)

  private def assertSame(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): Unit = {
    assert(a.columns.toSeq == b.columns.toSeq)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("Dedup.minhashLshPairs == dd2 SQL form (which the query overrides)") {
    Fixtures.registerRaw(spark, sfDir)
    val docs = spark.table("documents")
    val lib = Dedup.minhashLshPairs(docs, "doc_id", "text")
    // the dd2 driver query routes through the library; compare against the
    // raw SQL form to keep this a real two-implementation check
    val sqlForm = spark.sql(
      graft.pipeline.PipelineQueries.sparkSqlFor("dd2_minhash_lsh"))
    assertSame(lib, sqlForm)
    assertSame(lib, q("dd2_minhash_lsh"))
  }

  test("Dedup.exact == dd1 oracle query") {
    Fixtures.registerRaw(spark, sfDir)
    val lib = Dedup.exact(spark.table("documents"), "doc_id", "text")
      .orderBy("sig")
    assertSame(lib, q("dd1_exact_dedup"))
  }

  test("Dedup.simhash low 32 bits == dd4 oracle query (independent bit extraction)") {
    Fixtures.registerRaw(spark, sfDir)
    // dd4 computes the 32-bit simhash char-wise in SQL; the library's 64-bit
    // conv-based variant must agree on the shared low half
    val lib = Dedup.simhash(spark.table("documents"), "doc_id", "text")
      .select(col("doc_id"),
        col("simhash").bitwiseAND(lit(0xFFFFFFFFL)).as("simhash"))
      .orderBy("doc_id")
    assertSame(lib, q("dd4_simhash"))
  }

  test("Similarity.bruteForceTopK == ss1; ivfTopK == ss2; nearDup == dd5") {
    Fixtures.registerRaw(spark, sfDir)
    val e = spark.table("embeddings")
    val brute = Similarity.bruteForceTopK(e, "vec_id", "embedding", Seq(0L, 1L, 2L, 3L, 4L))
      .withColumnRenamed("qid", "qid")
    assertSame(brute.select(col("qid"), col("vec_id"), col("cos")), q("ss1_bruteforce_topk"))
    val ivf = Similarity.ivfTopK(e, "vec_id", "embedding",
      Seq(0L, 1L, 2L, 3L, 4L), (0L until 16L).toSeq)
    assertSame(ivf.select(col("qid"), col("vec_id"), col("cos")), q("ss2_ivf_topk"))
    val nd = Similarity.cosineNearDupPairs(e, "vec_id", "embedding")
    assertSame(nd, q("dd5_embedding_neardup"))
  }

  test("Similarity.ivfFilteredTopK == ss10 SQL form; filter composes with the probe") {
    Fixtures.registerRaw(spark, sfDir)
    val e = spark.table("embeddings")
    val lib = Similarity.ivfFilteredTopK(e, "vec_id", "embedding", "label",
        queryIds = 0L until 5L, centroidIds = 0L until 16L, k = 5, nprobe = 2)
      .orderBy(col("qid"), col("cos").desc, col("vec_id"))
    // the ss10 driver query routes through the library; compare against
    // the raw SQL form to keep this a real two-implementation check
    val sqlForm = spark.sql(
      graft.pipeline.PipelineQueries.sparkSqlFor("ss10_filtered_ivf"))
    assertSame(lib, sqlForm)
    assertSame(lib, q("ss10_filtered_ivf"))
    // every hit respects the metadata predicate (label differs from the
    // query's), and hits are a subset of the probed-cells universe: the
    // brute ss9 result restricted to ss10's cells must contain them
    val labels = e.select(col("vec_id"), col("label"))
    val joined = lib
      .join(labels.withColumnRenamed("label", "vlab"), "vec_id")
      .join(labels.select(col("vec_id").as("qid"), col("label").as("qlab")), "qid")
    assert(joined.where(col("vlab") === col("qlab")).count() == 0)
    // recall vs the exact filtered baseline (ss9): with 16 cells/nprobe 2
    // on the fixture clusters the probe should recover a solid majority
    val brute = q("ss9_filtered_topk").select(col("qid"), col("vec_id"))
    val hits = lib.select(col("qid"), col("vec_id")).intersect(brute).count()
    assert(hits >= (brute.count() * 6) / 10,
      s"filtered-IVF recall collapsed: $hits of ${brute.count()}")
  }

  test("TextAnalysis matches tx1/tx2/tx3/tx4 oracle queries") {
    Fixtures.registerRaw(spark, sfDir)
    val docs = spark.table("documents")
    assertSame(
      TextAnalysis.langId(docs, "text")
        .select("doc_id", "lang", "en_score", "de_score", "fr_score", "es_score", "predicted")
        .orderBy("doc_id"),
      q("tx1_langid"))
    assertSame(
      TextAnalysis.quality(docs, "text")
        .select("doc_id", "n_chars", "n_tokens", "avg_token_len", "stopword_ratio", "length_score")
        .orderBy("doc_id"),
      q("tx2_quality"))
    assertSame(
      TextAnalysis.tokenCounts(docs, "text")
        .select("doc_id", "ws_tokens", "re_tokens", "chars_per_token")
        .orderBy("doc_id"),
      q("tx3_token_count"))
    assertSame(
      TextAnalysis.fingerprints(docs, "text")
        .select("doc_id", "fp_exact", "fp_min_shingle")
        .orderBy("doc_id"),
      q("tx4_fingerprint"))
  }

  test("TextAnalysis.repetition == tx5; Curation.decontaminate == dc1") {
    Fixtures.registerRaw(spark, sfDir)
    val docs = spark.table("documents")
    assertSame(
      TextAnalysis.repetition(docs, "doc_id", "text")
        .select("doc_id", "dup_word_frac", "top_bigram_frac", "keep")
        .orderBy("doc_id"),
      q("tx5_repetition"))
    assertSame(
      Curation.decontaminate(
          docs.where(col("doc_id") % 10 =!= 7),
          docs.where(col("doc_id") % 10 === 7),
          "doc_id", "text")
        .select("doc_id", "n_grams", "n_contaminated", "contamination")
        .orderBy("doc_id"),
      q("dc1_decontamination"))
  }

  test("TextAnalysis.unigramLm == tx7 SQL form; model ships by broadcast") {
    Fixtures.registerRaw(spark, sfDir)
    val docs = spark.table("documents")
    val lib = TextAnalysis.unigramLm(docs, "doc_id", "text")
      .select("doc_id", "n_tokens", "n_oov", "logp_u6", "avg_logp_u6")
      .orderBy("doc_id")
    val sqlForm = spark.sql(
      graft.pipeline.PipelineQueries.sparkSqlFor("tx7_unigram_lm"))
    assertSame(lib, sqlForm)
    assertSame(lib, q("tx7_unigram_lm"))
    // the token stream must not shuffle for the model join — the
    // vocabulary-sized model ships to it
    val plan = TextAnalysis.unigramLm(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // scoring sanity: documents are word salad from one shared vocabulary,
    // so every doc should score with zero OOV under the >=5 count floor
    // except (possibly) docs carrying the rare planted 'dup' markers
    val oov = lib.agg(sum(col("n_oov"))).collect()(0).getLong(0)
    assert(oov < lib.count(), s"unexpected mass OOV: $oov")
    // log-likelihoods are negative and averages sit in a sane band
    assert(lib.where(col("logp_u6") >= 0).count() == 0)
  }

  test("hashed-gram decontamination equals the exact-gram variant") {
    Fixtures.registerRaw(spark, sfDir)
    val docs = spark.table("documents")
    val train = docs.where(col("doc_id") % 10 =!= 7)
    val eval = docs.where(col("doc_id") % 10 === 7)
    val exact = Curation.decontaminate(train, eval, "doc_id", "text")
      .select("doc_id", "n_grams", "n_contaminated").orderBy("doc_id")
    val hashed = Curation
      .contaminationCounts(train, eval, "doc_id", "text", hashGrams = true)
      .where(col("n_contaminated") > 0)
      .select("doc_id", "n_grams", "n_contaminated").orderBy("doc_id")
    assert(exact.collect().toSeq == hashed.collect().toSeq)
  }

  test("Dedup.passageDedup == pd1 SQL form (cleaned text hashes to cleaned_sig)") {
    Fixtures.registerRaw(spark, sfDir)
    val lib = Dedup.passageDedup(spark.table("documents"), "doc_id", "text")
      .select(col("doc_id"), col("n_passages"), col("n_dup_passages"),
        md5(col("cleaned_text")).as("cleaned_sig"))
      .orderBy(col("doc_id"))
    assertSame(lib, q("pd1_passage_dedup"))
  }

  test("Similarity.semanticDedup == sd1 SQL form (which the query overrides)") {
    Fixtures.registerRaw(spark, sfDir)
    val lib = Similarity.semanticDedup(
      spark.table("embeddings"), "vec_id", "embedding", centroidIds = 0L until 16L)
    // the sd1 driver query routes through the library (projection-only
    // assignment); compare against the raw crossJoin+window SQL form to
    // keep this a real two-implementation check
    val sqlForm = spark.sql(
      graft.pipeline.PipelineQueries.sparkSqlFor("sd1_semantic_dedup"))
    assertSame(lib, sqlForm)
    assertSame(lib, q("sd1_semantic_dedup"))
  }

  test("Curation.cleanText == tc1 SQL form on the same derived dirty corpus") {
    Fixtures.registerRaw(spark, sfDir)
    val dirty = spark.table("documents").select(col("doc_id"),
      concat(lit("<div id=\""), col("doc_id"), lit("\"> "), col("text"),
        lit(" contact user"), col("doc_id"),
        lit("@mail.example.com or visit https://site.example/"), col("doc_id"),
        lit(" now</div>")).as("raw"))
    val lib = Curation.cleanText(dirty, "raw")
      .select(col("doc_id"), col("n_emails"), col("n_urls"),
        md5(col("clean_raw")).as("clean_sig"),
        length(col("clean_raw")).cast("long").as("clean_len"))
      .orderBy(col("doc_id"))
    assertSame(lib, q("tc1_clean_pii"))
  }

  test("Similarity.sq8Encode/sq8TopK == ss4 SQL form (which the query overrides)") {
    Fixtures.registerRaw(spark, sfDir)
    val enc = Similarity.sq8Encode(spark.table("embeddings"), "vec_id", "embedding")
    val lib = Similarity.sq8TopK(enc, queryIds = 0L to 4L, k = 5)
    val sqlForm = spark.sql(
      graft.pipeline.PipelineQueries.sparkSqlFor("ss4_quantized_topk"))
    assertSame(lib, sqlForm)
  }

  test("TextAnalysis.tfidf == tx8 SQL form; the DF model ships by broadcast") {
    Fixtures.registerRaw(spark, sfDir)
    val lib = TextAnalysis.tfidf(spark.table("documents"), "doc_id", "text")
    assertSame(lib, q("tx8_tfidf"))
    val plan = lib.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("GapFill.countsDense == ts1 SQL form (session tz pinned to UTC)") {
    // countsDense buckets on UTC-aligned epoch multiples while ts1 uses
    // session-timezone date_trunc('hour') — the two agree only when the
    // session offset is a whole hour. Pin UTC HERE so the parity contract
    // survives a harness timezone change (e.g. Asia/Kolkata is +5:30).
    val tzKey = "spark.sql.session.timeZone"
    val prior = spark.conf.get(tzKey)
    spark.conf.set(tzKey, "UTC")
    try {
      Fixtures.registerRaw(spark, sfDir)
      val lib = graft.operators.GapFill
        .countsDense(spark.table("events"), "event_type", "ts")
        .select(col("event_type"), col("bucket_epoch").as("hr_epoch"), col("n"))
        .orderBy(col("event_type"), col("hr_epoch"))
      assertSame(lib, q("ts1_gapfill"))
    } finally spark.conf.set(tzKey, prior)
  }

  test("entropySignals == tx9; hashedLinearScore == ml1; bpePairCounts == tok1") {
    Fixtures.registerRaw(spark, sfDir)
    val docs = spark.table("documents")
    assertSame(
      TextAnalysis.entropySignals(docs, "doc_id", "text")
        .select("doc_id", "n_chars", "distinct_chars", "char_ent_u6",
          "n_tokens", "distinct_tokens", "token_ent_u6")
        .orderBy("doc_id"),
      q("tx9_entropy"))
    assertSame(
      TextAnalysis.hashedLinearScore(docs, "doc_id", "text", TextAnalysis.ml1Weights())
        .select("doc_id", "n_tokens", "score_u6", "avg_score_u6", "keep_flag")
        .orderBy("doc_id"),
      q("ml1_classifier_score"))
    assertSame(
      TextAnalysis.bpePairCounts(
          docs.select(col("doc_id"), split(col("text"), " ").as("toks")))
        .orderBy(col("cnt").desc, col("left_tok"), col("right_tok"))
        .limit(50),
      q("tok1_bpe_pairs"))
  }

  test("chunkWithOverlap == ch1; bigramLm == tx10; chunks cover every token") {
    Fixtures.registerRaw(spark, sfDir)
    val docs = spark.table("documents")
    val chunks = TextAnalysis.chunkWithOverlap(docs, "doc_id", "text")
    assertSame(
      chunks.select(col("doc_id"), col("chunk_id"), col("n_tokens"),
        md5(col("chunk_text")).as("chunk_md5")).orderBy("doc_id", "chunk_id"),
      q("ch1_chunk_overlap"))
    // coverage: concatenating each chunk's leading stride tokens (all of
    // the last chunk) reconstructs the document exactly
    val win = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    val withPiece = chunks
      .withColumn("last_id", max("chunk_id").over(win))
      .withColumn("piece",
        when(col("chunk_id") === col("last_id"), col("chunk_text"))
          .otherwise(expr("array_join(slice(split(chunk_text, ' '), 1, 48), ' ')")))
    val rebuilt = withPiece.groupBy("doc_id")
      .agg(expr("array_join(transform(" +
        "array_sort(collect_list(struct(chunk_id, piece))), s -> s.piece), ' ')")
        .as("rebuilt"))
    val diff = rebuilt.join(docs, "doc_id")
      .where(col("rebuilt") =!= col("text")).count()
    assert(diff == 0, s"$diff documents not reconstructed by their chunks")
    // the tx10 driver query routes through the library; compare against
    // the raw SQL form to keep this a real two-implementation check
    assertSame(
      TextAnalysis.bigramLm(docs, "doc_id", "text")
        .select("doc_id", "n_bigrams", "nll_u6").orderBy("doc_id"),
      spark.sql(graft.pipeline.PipelineQueries.sparkSqlFor("tx10_bigram_lm")))
    // the web-scale model path (broadcastModel=false: shuffled hash join
    // on (w1,w2) instead of a broadcast) must score identically — it is
    // the shape a corpus-sized model actually runs
    assertSame(
      TextAnalysis.bigramLm(docs, "doc_id", "text", broadcastModel = false)
        .select("doc_id", "n_bigrams", "nll_u6").orderBy("doc_id"),
      TextAnalysis.bigramLm(docs, "doc_id", "text")
        .select("doc_id", "n_bigrams", "nll_u6").orderBy("doc_id"))
  }

  test("Dedup.exciseSpans == dd9 SQL form; owner keeps text, copies lose the span") {
    Fixtures.registerRaw(spark, sfDir)
    val docs = spark.table("documents")
    assertSame(
      Dedup.exciseSpans(docs, "doc_id", "text").orderBy("doc_id"),
      spark.sql(graft.pipeline.PipelineQueries.sparkSqlFor("dd9_span_excision")))
    // semantic edges on a crafted corpus: the lowest-id occurrence keeps
    // its text, a later copy loses EXACTLY the covered positions, and a
    // document shorter than the window passes through unchanged
    import spark.implicits._
    val span = (1 to 15).map(i => s"w$i").mkString(" ")
    val tiny = Seq(
      (1L, s"$span tail1 tail2"),
      (2L, s"lead1 lead2 $span"),
      (3L, "short doc")).toDF("doc_id", "text")
    val out = Dedup.exciseSpans(tiny, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[String]("text_clean") == s"$span tail1 tail2")
    assert(out(0).getAs[Long]("n_removed") == 0L)
    assert(out(1).getAs[String]("text_clean") == "lead1 lead2")
    assert(out(1).getAs[Long]("n_removed") == 15L)
    assert(out(2).getAs[String]("text_clean") == "short doc")
    // a fully-covered document returns an empty row, never a dropped one
    val full = Seq((1L, span), (2L, span)).toDF("doc_id", "text")
    val fo = Dedup.exciseSpans(full, "doc_id", "text").orderBy("doc_id").collect()
    assert(fo.length == 2 && fo(1).getAs[String]("text_clean") == ""
      && fo(1).getAs[Long]("n_removed") == 15L)
  }

  test("TextAnalysis.perplexityFilter == tx12 SQL form; per-language tertiles ordered") {
    Fixtures.registerRaw(spark, sfDir)
    val docs = spark.table("documents")
    val lib = TextAnalysis.perplexityFilter(docs, "doc_id", "text", "lang",
      col("source") === "src0").orderBy("doc_id")
    assertSame(lib,
      spark.sql(graft.pipeline.PipelineQueries.sparkSqlFor("tx12_perplexity_filter")))
    // the web-scale model path must score and bucket identically
    assertSame(lib,
      TextAnalysis.perplexityFilter(docs, "doc_id", "text", "lang",
        col("source") === "src0", broadcastModel = false).orderBy("doc_id"))
    // structural: per language, tertile sizes differ by at most one and
    // every head perplexity <= every tail perplexity
    val sizes = lib.groupBy("lang", "ppl_bucket").count()
      .groupBy("lang").agg(max("count").as("mx"), min("count").as("mn"))
      .collect()
    sizes.foreach(r =>
      assert(r.getAs[Long]("mx") - r.getAs[Long]("mn") <= 1,
        s"unbalanced tertiles for ${r.getAs[String]("lang")}"))
    val order = lib.groupBy("lang").agg(
      max(when(col("ppl_bucket") === "head", col("ppl_u6"))).as("maxh"),
      min(when(col("ppl_bucket") === "tail", col("ppl_u6"))).as("mint"))
      .collect()
    order.foreach(r =>
      assert(r.getAs[Long]("maxh") <= r.getAs[Long]("mint")))
  }

  test("groupedLowerMedian == per-group sort rank at any bucket width, ties included") {
    import spark.implicits._
    // adversarial layout: duplicate values straddling bucket boundaries,
    // negative values, a single-element group, and an even-sized group
    // (lower median, never interpolation)
    val rows = Seq(
      ("a", 1023.0), ("a", 1024.0), ("a", 1024.0), ("a", 1025.0), ("a", -7.0),
      ("b", 5.5), ("b", 5.5), ("b", 9.25), ("b", 2.0),
      ("c", 42.0),
      ("d", -2048.0), ("d", -1.0), ("d", 0.0), ("d", 1.0), ("d", 2048.5),
      ("d", 2048.5), ("d", 4096.0)
    ).toDF("g", "v")
    val naive = rows.as[(String, Double)].collect().groupBy(_._1).map {
      case (g, xs) =>
        val sorted = xs.map(_._2).sorted
        g -> sorted(((sorted.length + 1) / 2) - 1)
    }
    for (width <- Seq(1.0, 7.0, 1024.0, 100000.0)) {
      val got = graft.pipeline.Sketches
        .groupedLowerMedian(rows, "g", "v", bucketWidth = width)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got == naive, s"bucketWidth=$width")
      // the few-groups (collected-targets) form must pick the identical
      // rank — here with a row filter that keeps everything, so the two
      // forms are value-equal by construction
      val fg = graft.pipeline.Sketches
        .groupedLowerMedianFiltered(rows, lit(true), "g", "v", bucketWidth = width)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(fg == naive, s"filtered bucketWidth=$width")
    }
    // few-groups with a REAL row filter: the median of the filtered subset
    val odd = rows.where(expr("v = CAST(v AS BIGINT) AND CAST(v AS BIGINT) % 2 != 0"))
    val naiveOdd = odd.as[(String, Double)].collect().groupBy(_._1).map {
      case (g, xs) =>
        val sorted = xs.map(_._2).sorted
        g -> sorted(((sorted.length + 1) / 2) - 1)
    }
    val fgOdd = graft.pipeline.Sketches
      .groupedLowerMedianFiltered(rows,
        expr("v = CAST(v AS BIGINT) AND CAST(v AS BIGINT) % 2 != 0"),
        "g", "v", bucketWidth = 7.0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(fgOdd == naiveOdd)
  }

  test("pageRank: integer ranks are exact on a hand-computed graph; mass is conserved") {
    import spark.implicits._
    // path graph 1-2-3: deg(1)=deg(3)=1, deg(2)=2. Hand-run the same
    // fixed-point recurrence (Scale=1e12, damping 17/20) for 5 iterations.
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val got = graft.pipeline.Graph.pageRank(pairs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val S = graft.pipeline.Graph.Scale
    val n = 3L
    val base = 3 * S / (20 * n)
    var r = Map(1L -> S / n, 2L -> S / n, 3L -> S / n)
    val deg = Map(1L -> 1L, 2L -> 2L, 3L -> 1L)
    for (_ <- 1 to 5) {
      val c = Map(
        1L -> r(2L) / deg(2L),
        2L -> (r(1L) / deg(1L) + r(3L) / deg(3L)),
        3L -> r(2L) / deg(2L))
      r = c.map { case (k, s) => k -> (base + 17 * s / 20) }
    }
    assert(got.toSeq == Seq(
      (1L, 1L, r(1L)), (2L, 2L, r(2L)), (3L, 1L, r(3L))),
      s"got ${got.mkString(", ")}")
    // the end nodes are symmetric; the center must outrank them
    assert(r(1L) == r(3L) && r(2L) > r(1L))
    // integer truncation only ever loses mass, and at most a few units
    // per node per iteration
    val mass = got.map(_._3).sum
    assert(mass <= S && mass >= S - 5 * 3 * 40,
      s"rank mass $mass vs scale $S")
    // regularity: on a 6-ring (every node degree 2) the recurrence is
    // symmetric, so all ranks must stay exactly uniform
    val ring = (0 until 6).map(i => (i.toLong, ((i + 1) % 6).toLong))
      .toDF("doc_a", "doc_b")
    val ringRanks = graft.pipeline.Graph.pageRank(ring)
      .select("rank_p12").distinct().collect()
    assert(ringRanks.length == 1,
      s"ring ranks not uniform: ${ringRanks.mkString(", ")}")
  }

  test("labelPropagation: a bridge keeps two triangles separate communities; CC would merge them") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("doc_a", "doc_b")
    val got = graft.pipeline.Graph.labelPropagation(pairs)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // hand-run: round 1 pulls each triangle to its min (1 / 3-then-4),
    // round 2 settles the right triangle on 4; stable thereafter. The
    // bridge node 3 stays with the triangle that dominates its
    // neighborhood (three '1' votes vs one '3').
    assert(got.toSeq == Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 4L)),
      s"got ${got.mkString(", ")}")
    // connected components on the same graph merges everything — the
    // two operators answer different questions
    val cc = graft.pipeline.Dedup.connectedComponents(pairs)
      .select("cluster_id").distinct().count()
    assert(cc == 1L)
  }

  test("histogramQuantiles: hand-computed ranks; bin index is the first bin reaching ceil(qn/100)") {
    import spark.implicits._
    // group g: values 0.05, 0.15, ..., 0.95 -> bins 0..9, one count each,
    // n = 10. rank(50) = ceil(500/100) = 5 -> bin 4 (cum 5);
    // rank(90) = 9 -> bin 8; rank(99) = ceil(990/100) = 10 -> bin 9.
    val rows = (0 until 10).map(i => ("g", i / 10.0 + 0.05)) :+ ("h", 3.27)
    val df = rows.toDF("grp", "v")
    val got = graft.pipeline.Sketches
      .histogramQuantiles(df, "grp", "v")
      .orderBy("grp")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // single-value group h: every quantile is its only bin (32)
    assert(got.toSeq == Seq(("g", 10L, 4L, 8L, 9L), ("h", 1L, 32L, 32L, 32L)),
      s"got ${got.mkString(", ")}")
  }

  test("embeddingDrift: identical snapshots give cos 1 and zero churn; disjoint members count as churn") {
    import spark.implicits._
    val emb = Seq(
      (1L, Seq(0.5f, 0.5f), 0), (2L, Seq(0.4f, 0.6f), 0),
      (3L, Seq(-0.5f, 0.25f), 1), (4L, Seq(-0.3f, 0.1f), 1))
      .toDF("vec_id", "embedding", "label")
    val same = graft.pipeline.Similarity
      .embeddingDrift(emb, emb, "vec_id", "embedding", "label")
      .orderBy("label").collect()
    same.foreach { r =>
      assert(r.getLong(1) == 2 && r.getLong(2) == 2 &&
        r.getLong(3) == 0 && r.getLong(4) == 0)
      assert(math.abs(r.getDouble(5) - 1.0) < 1e-6, s"cos ${r.getDouble(5)}")
    }
    // drop one member per label from v2: n_removed counts it, the
    // centroid moves (label-0 vectors are not collinear)
    val v2 = emb.where($"vec_id" % 2 === 0)
    val drift = graft.pipeline.Similarity
      .embeddingDrift(emb, v2, "vec_id", "embedding", "label")
      .orderBy("label").collect()
    drift.foreach { r =>
      assert(r.getLong(1) == 2 && r.getLong(2) == 1 &&
        r.getLong(3) == 0 && r.getLong(4) == 1)
    }
    assert(drift(0).getDouble(5) < 1.0)
  }

  test("triangleStats: K4 plus a pendant — hand-computed counts and coefficients") {
    import spark.implicits._
    // K4 over 1..4 (every node: deg 3, 3 triangles, coefficient
    // 2000*3/(3*2) = 1000) plus pendant 5-1 (node 1: deg 4, still 3
    // triangles, 2000*3/(4*3) = 500; node 5: deg 1, 0, 0). Feed some
    // pairs reversed and one duplicated — orientation + dedup must hide both.
    val pairs = Seq((1L, 2L), (3L, 1L), (1L, 4L), (2L, 3L), (4L, 2L),
      (3L, 4L), (3L, 4L), (5L, 1L)).toDF("doc_a", "doc_b")
    val got = graft.pipeline.Graph.triangleStats(pairs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 4L, 3L, 500L), (2L, 3L, 3L, 1000L), (3L, 3L, 3L, 1000L),
      (4L, 3L, 3L, 1000L), (5L, 1L, 0L, 0L)),
      s"got ${got.mkString(", ")}")
  }

  /** 12 families x 3 variants; variant v mutates 3v bytes of the family
    * base pattern, giving a spread of intra-family hamming distances.
    * SHARED by the batch phash spec and the incremental-ingest spec — the
    * inc == full - corpus equivalence is only meaningful over the same
    * corpus the batch spec validates. */
  private def phashFamilyCorpus: Seq[(Long, Array[Byte])] =
    (0 until 36).map { i =>
      val fam = i / 3
      val bytes = Array.tabulate(96)(j => ((fam * 37 + j * 11) % 251).toByte)
      (0 until (i % 3) * 3).foreach { k =>
        val p = (k * 7) % 96
        bytes(p) = (bytes(p) + 40).toByte
      }
      (i.toLong, bytes)
    }

  private def phashMediaDs(rs: Seq[(Long, Array[Byte])]) = {
    import graft.pipeline.Multimodal
    spark.createDataset(rs.map { case (id, b) =>
      Multimodal.MediaRecord(id, Multimodal.encodePng(b),
        Multimodal.MediaMeta("image/png", b.length, 1, 1))
    })(org.apache.spark.sql.Encoders.product[Multimodal.MediaRecord])
  }

  test("phashNearDupPairs: banded join finds exactly the all-pairs hamming matches") {
    import graft.pipeline.Multimodal
    val recs = phashFamilyCorpus
    val ds = phashMediaDs(recs)
    val got = Multimodal.phashNearDupPairs(ds)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute-force reference over the same hash function (PNG is lossless,
    // so decoded pixels are the input bytes)
    val h = recs.map { case (id, b) => id -> Multimodal.averageHash(b, 48)._1 }
    val expected = (for {
      (ia, ha) <- h; (ib, hb) <- h if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 5
    } yield (ia, ib, d.toLong)).toSet
    assert(expected.nonEmpty, "fixture produced no near pairs — spec is vacuous")
    assert(got == expected,
      s"banded=${got.size} brute=${expected.size}; diff ${(got diff expected) ++ (expected diff got)}")
  }

  test("incrementalPhashPairs: stored-index ingest equals the batch re-band") {
    import graft.pipeline.Multimodal
    // same 12-family corpus as the batch spec (shared fixture); first 18
    // ids are the already-ingested corpus, the rest arrive as a new batch
    val recs = phashFamilyCorpus
    val ds = phashMediaDs _
    val (corpus, batch) = recs.partition(_._1 < 18)
    // the index is STORED state: parquet round-trip like a real ingest
    val dir = java.nio.file.Files.createTempDirectory("graft_phidx").toString
    Multimodal.phashBandIndex(ds(corpus)).write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val inc = Multimodal.incrementalPhashPairs(ds(batch), stored)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val full = Multimodal.phashNearDupPairs(ds(recs))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val corpusOnly = Multimodal.phashNearDupPairs(ds(corpus))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // ingest finds exactly the batch-internal + cross pairs — full result
    // minus what the index build already found
    assert(inc == (full -- corpusOnly),
      s"inc=${inc.size} full=${full.size} corpus=${corpusOnly.size}")
    // forced past the small-batch gate = the pigeonhole-banded tier; both
    // tiers must produce the identical pair set
    val banded = Multimodal
      .incrementalPhashPairs(ds(batch), stored, bruteForceMaxBatch = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded == inc, s"banded=${banded.size} brute=${inc.size}")
    assert(inc.exists { case (a, b, _) => a < 18 && b >= 18 },
      "fixture produced no cross pair — spec is vacuous")
    assert(inc.exists { case (a, b, _) => a >= 18 && b >= 18 },
      "fixture produced no batch-internal pair — spec is vacuous")
    // a mismatched banding scheme fails loudly, never silently empty
    val e = intercept[IllegalArgumentException] {
      Multimodal.incrementalPhashPairs(ds(batch), stored, bits = 48, bands = 8)
        .collect()
    }
    assert(e.getMessage.contains("does not match"))
  }

  test("appendToPhashIndex: sequential appends == one build; empty index verifiable") {
    import graft.pipeline.Multimodal
    val recs = phashFamilyCorpus
    val ds = phashMediaDs _
    // boundaries deliberately OFF the 3-id family stride, so families span
    // both the corpus/b1 and the b1/b2 seams: b2's cross pairs against b1
    // are findable ONLY through the merged generation — a broken merge
    // could not pass the viaMerged == viaFresh equality below
    val (corpus, rest) = recs.partition(_._1 < 11)
    val (b1, b2) = rest.partition(_._1 < 23)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getLong(3), r.getInt(4), r.getInt(5))).toSet
    val oneShot = rows(Multimodal.phashBandIndex(ds(recs)))
    // generation merge through a REAL parquet round-trip per generation —
    // the rolling-pipeline shape: only each batch decodes, never the corpus
    val dir = java.nio.file.Files.createTempDirectory("graft_phmerge").toString
    Multimodal.phashBandIndex(ds(corpus)).write.parquet(s"$dir/g0")
    Multimodal.appendToPhashIndex(spark.read.parquet(s"$dir/g0"), ds(b1))
      .write.parquet(s"$dir/g1")
    val merged = Multimodal.appendToPhashIndex(spark.read.parquet(s"$dir/g1"), ds(b2))
    assert(rows(merged) == oneShot,
      s"merged=${rows(merged).size} oneShot=${oneShot.size}")
    // the merged generation round-trips parquet intact (stamps included)
    merged.write.parquet(s"$dir/g2")
    assert(rows(spark.read.parquet(s"$dir/g2")) == oneShot)
    // probing the merged generation equals probing a fresh full build
    val viaMerged = Multimodal
      .incrementalPhashPairs(ds(b2), spark.read.parquet(s"$dir/g1"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaFresh = Multimodal
      .incrementalPhashPairs(ds(b2), Multimodal.phashBandIndex(ds(corpus ++ b1)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaMerged == viaFresh && viaMerged.nonEmpty)
    assert(viaMerged.exists { case (a, b, _) => a < 23 && b >= 23 },
      "no cross pair spans the b1/b2 seam — the merge is not exercised")
    // an EMPTY index stays verifiable through parquet (schema metadata):
    // matching scheme passes, a mismatch still fails loudly — the
    // first-row probe used to skip the check entirely on zero rows
    Multimodal.phashBandIndex(ds(Seq.empty)).write.parquet(s"$dir/empty")
    val empty = spark.read.parquet(s"$dir/empty")
    assert(Multimodal.appendToPhashIndex(empty, ds(b1)).count() > 0)
    val e1 = intercept[IllegalArgumentException] {
      Multimodal.incrementalPhashPairs(ds(b1), empty, bits = 48, bands = 8)
    }
    assert(e1.getMessage.contains("does not match"))
    // empty AND stripped of metadata -> unverifiable, loud (never a
    // silent batch-internal-only result)
    val stripped = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(
        empty.schema.fields.map(_.copy(
          metadata = org.apache.spark.sql.types.Metadata.empty))))
    val e2 = intercept[IllegalArgumentException] {
      Multimodal.incrementalPhashPairs(ds(b1), stripped)
    }
    assert(e2.getMessage.contains("EMPTY"))
  }

  test("bpeEncode in training order reproduces bpeTrain's tokenization; round-trips") {
    Fixtures.registerRaw(spark, sfDir)
    val docs = spark.table("documents").limit(200)
    val (merges, trained) =
      graft.pipeline.TextAnalysis.bpeTrain(docs, "doc_id", "text", 8)
    assert(merges.nonEmpty)
    val encoded =
      graft.pipeline.TextAnalysis.bpeEncode(docs, "doc_id", "text", merges)
    // duality: the serving-phase encode of the TRAINING corpus equals the
    // tokenization training itself produced (two implementations — the
    // corpus-wide iterative transform vs the per-doc ordered apply)
    val t = trained.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1)))
    val e = encoded.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1)))
    assert(t.toSeq == e.toSeq)
    // flat round-trip: splitting every phrase token back on spaces
    // reconstructs the original word stream
    val bad = encoded.join(docs, "doc_id")
      .where(expr("flatten(transform(toks, t -> split(t, ' '))) <> split(text, ' ')"))
      .count()
    assert(bad == 0)
    // zero merges = plain word split
    val z = graft.pipeline.TextAnalysis
      .bpeEncode(docs, "doc_id", "text", Seq.empty).join(docs, "doc_id")
      .where(expr("toks <> split(text, ' ')")).count()
    assert(z == 0)
  }

  test("snapshotDiff == cd1 SQL form; statuses partition both versions") {
    Fixtures.registerRaw(spark, sfDir)
    assertSame(
      q("cd1_snapshot_diff"),
      spark.sql(graft.pipeline.PipelineQueries.sparkSqlFor("cd1_snapshot_diff")))
    // row-level invariants: statuses partition the union of both versions
    val docs = spark.table("documents")
    val v1 = docs.where(col("doc_id") % 17 =!= 3)
    val v2 = docs.where(col("doc_id") % 19 =!= 7)
      .withColumn("text",
        when(col("doc_id") % 13 === 5, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")))
    val d = graft.pipeline.Curation.snapshotDiff(v1, v2, "doc_id", "text")
    assert(d.count() ==
      v1.select("doc_id").union(v2.select("doc_id")).distinct().count())
    assert(d.where(col("status") === "added").count() ==
      v2.join(v1, Seq("doc_id"), "left_anti").count())
    assert(d.where(col("status") === "removed").count() ==
      v1.join(v2, Seq("doc_id"), "left_anti").count())
    assert(d.where(col("status") === "changed").count() ==
      docs.where(col("doc_id") % 13 === 5 && col("doc_id") % 17 =!= 3 &&
        col("doc_id") % 19 =!= 7).count())
  }

  test("duplicatedSpans == dd8; centroidOutliers == emb1") {
    Fixtures.registerRaw(spark, sfDir)
    val docs = spark.table("documents")
    assertSame(
      Dedup.duplicatedSpans(docs, "doc_id", "text").orderBy("doc_id"),
      q("dd8_duplicated_spans"))
    // every duplicated window of a doc is one of its windows
    val bad = Dedup.duplicatedSpans(docs, "doc_id", "text")
      .where(col("dup_windows") > col("n_windows") ||
        col("dup_pm") > 1000 || col("dup_pm") < 0).count()
    assert(bad == 0, s"$bad docs with impossible span counts")
    val scored = Similarity.centroidOutliers(
      spark.table("embeddings"), "vec_id", "embedding", "label")
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("label").orderBy(col("centroid_cos"), col("vec_id"))
    assertSame(
      scored.withColumn("rn", row_number().over(win)).where(col("rn") <= 10)
        .select("label", "vec_id", "centroid_cos")
        .orderBy(col("label"), col("centroid_cos"), col("vec_id")),
      q("emb1_centroid_outliers"))
    // cosine is bounded; every vector of the corpus is scored
    assert(scored.where(abs(col("centroid_cos")) > 1.0).count() == 0)
    assert(scored.count() == spark.table("embeddings").count())
  }

  test("Sampling.temperatureMix == sp6 SQL form (per-source rollup)") {
    Fixtures.registerRaw(spark, sfDir)
    val mixed = graft.pipeline.Sampling
      .temperatureMix(spark.table("documents"), "doc_id", "source")
    val lib = mixed.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("sampled"), 1L).otherwise(0L)).as("n_sampled"),
        round(max(col("rate")), 6).as("rate"),
        sum(when(col("sampled"), col("doc_id")).otherwise(0L)).as("sampled_id_sum"))
      .orderBy("source")
    assertSame(lib, q("sp6_temperature_mix"))
  }

  test("GapFill.rollingZScores == ts2 SQL form (session tz pinned to UTC)") {
    val tzKey = "spark.sql.session.timeZone"
    val prior = spark.conf.get(tzKey)
    spark.conf.set(tzKey, "UTC")
    try {
      Fixtures.registerRaw(spark, sfDir)
      val lib = graft.operators.GapFill
        .rollingZScores(
          spark.table("events").withColumn("ts", col("ts").cast("timestamp")),
          "event_type", "ts")
        .orderBy(col("event_type"), col("hr_epoch"))
      assertSame(lib, q("ts2_anomaly"))
    } finally spark.conf.set(tzKey, prior)
  }

  test("bloomDecontaminate == exact decontaminate; probe is codegen'd might_contain") {
    Fixtures.registerRaw(spark, sfDir)
    val docs = spark.table("documents")
    val train = docs.where(col("doc_id") % 10 =!= 7)
    val eval = docs.where(col("doc_id") % 10 === 7)
    val exact = Curation.decontaminate(train, eval, "doc_id", "text")
      .orderBy("doc_id")
    // maxBroadcastGrams = 0 forces the Bloom path (the default gate routes
    // broadcast-sized eval sets straight to the exact plan)
    val bloom = Curation.bloomDecontaminate(train, eval, "doc_id", "text",
        maxBroadcastGrams = 0L)
      .orderBy("doc_id")
    // no false negatives + exact re-verification => identical output
    assertSame(bloom, exact)
    // the probe is Spark's runtime-filter expression, not a UDF
    val plan = bloom.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
    assert(!plan.contains("UDF"), plan)
    // the default gate takes the exact broadcast-join plan for this
    // broadcast-sized eval set: same answer, no Bloom build in the plan
    val gated = Curation.bloomDecontaminate(train, eval, "doc_id", "text")
      .orderBy("doc_id")
    assertSame(gated, exact)
    assert(!gated.queryExecution.executedPlan.toString.contains("might_contain"))
  }

  test("decontamination joins the eval gram set by broadcast (plan shape)") {
    Fixtures.registerRaw(spark, sfDir)
    val docs = spark.table("documents")
    val plan = Curation.decontaminate(
        docs.where(col("doc_id") % 10 =!= 7),
        docs.where(col("doc_id") % 10 === 7),
        "doc_id", "text")
      .queryExecution.executedPlan.toString
    // the training corpus must never shuffle for the overlap probe — the
    // benchmark-sized eval gram set ships to it
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
