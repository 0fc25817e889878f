package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Dedup, TextAnalysis}

/** Guarantees for the round-9 curation operators: BM25 retrieval
  * (rt1), deterministic chunking (ck1), cluster representatives (cq1). */
class RetrievalChunkSpec extends AnyFunSuite {

  lazy val spark = TestSessions.spark

  // --- BM25 ---------------------------------------------------------------

  private def toyCorpus = {
    import spark.implicits._
    Seq(
      (1L, "cat dog cat dog cat"), // heavy on both query terms
      (2L, "cat mouse mouse mouse mouse mouse mouse mouse mouse mouse"),
      (3L, "dog bird fish"),
      (4L, "tree rock sky water fire"),
      (5L, "cat cat cat cat cat cat cat cat cat cat")
    ).toDF("doc_id", "text")
  }

  test("bm25TopK ranks the doc containing BOTH query terms first") {
    val out = TextAnalysis.bm25TopK(toyCorpus, "doc_id", "text",
      Seq(7 -> Seq("cat", "dog")), k = 3).collect()
    assert(out.map(_.getInt(0)).forall(_ == 7))
    // doc 1 matches both terms with balanced tf — BM25's saturation puts
    // it above doc 5's single-term tf pile
    assert(out.head.getLong(1) == 1L)
    // all returned docs contain at least one query term; doc 4 never shows
    assert(!out.map(_.getLong(1)).contains(4L))
    // rows emit k per query max
    assert(out.length == 3)
  }

  test("bm25TopK: absent term contributes nothing; scores non-increasing") {
    val out = TextAnalysis.bm25TopK(toyCorpus, "doc_id", "text",
      Seq(1 -> Seq("dog", "unicorn")), k = 5).collect()
    // only docs containing 'dog' score
    assert(out.map(_.getLong(1)).toSet == Set(1L, 3L))
    val scores = out.map(_.getLong(2))
    assert(scores.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
  }

  test("bm25TopK plan: corpus never shuffles — native kernel + broadcast row") {
    // a parquet round-trip keeps the corpus a real scan — over a local
    // relation the optimizer constant-folds the whole kernel at plan time
    val dir = java.nio.file.Files.createTempDirectory("bm25plan").toString
    toyCorpus.write.mode("overwrite").parquet(dir)
    val df = TextAnalysis.bm25TopK(spark.read.parquet(dir), "doc_id", "text",
      Seq(1 -> Seq("cat", "dog")), k = 2)
    val plan = df.queryExecution.executedPlan.toString
    // scoring is a projection over the native kernel; model state arrives
    // as one broadcast row; the only hash exchange keys the tiny stacked
    // (qid, doc, score) frame for TopK — never the corpus by doc
    assert(plan.contains("token_term_counts"), plan)
    assert(plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("TopKPerGroup"), plan)
    assert(!plan.contains("hashpartitioning(doc_id"), plan)
  }

  test("token_term_counts == split/filter spelling on arbitrary unicode") {
    import org.scalacheck.Prop.forAll
    import org.scalacheck.Test.{Parameters, check}
    import spark.implicits._
    val terms = Seq("cat", "", "δx", "a b") // incl. never-matching shapes
    val tb = terms.map(_.getBytes("UTF-8")).toArray
    val gen = org.scalacheck.Gen.listOf(org.scalacheck.Gen.oneOf(
      org.scalacheck.Gen.oneOf("cat", "dog", " ", "δx", "", "ab"),
      org.scalacheck.Gen.alphaStr.map(_.take(5)),
      org.scalacheck.Gen.listOfN(4,
        org.scalacheck.Gen.choose(32.toChar, 0x2fff.toChar)).map(_.mkString)))
      .map(_.mkString(" "))
    val p = forAll(gen) { text =>
      val got = graft.functions.TokenTermCounts.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(text), tb)
      val toks = text.split(" ", -1)
      (0 until terms.size).forall(i =>
        got.getLong(i) == toks.count(_ == terms(i)).toLong) &&
        got.getLong(terms.size) == toks.length.toLong
    }
    val res = check(Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  // --- chunking -----------------------------------------------------------

  test("chunkDocuments: windows tile the text with the declared overlap") {
    import spark.implicits._
    val text = ("abcdefghij" * 35).take(347) // len 347
    val docs = Seq((1L, text), (2L, "short"), (3L, "x" * 200),
      (4L, "y" * 201)).toDF("doc_id", "text")
    val out = TextAnalysis
      .chunkDocuments(docs, "doc_id", "text", chunkSize = 200, stride = 150)
      .orderBy("doc_id", "chunk_idx").collect()
    def rows(id: Long) = out.filter(_.getLong(0) == id)
    // len 347: chunks at 1 (200 chars) and 151 (197 chars) — ceil((347-200)/150)+1 = 2
    assert(rows(1L).map(r => (r.getLong(2), r.getLong(3))).toSeq ==
      Seq((1L, 200L), (151L, 197L)))
    // every chunk md5 matches the substring it claims to cover
    rows(1L).foreach { r =>
      val sub = text.substring(r.getLong(2).toInt - 1,
        math.min(text.length, r.getLong(2).toInt - 1 + 200))
      assert(r.getString(4) == org.apache.commons.codec.digest.DigestUtils.md5Hex(sub))
      assert(r.getLong(5) == 2L)
    }
    // len <= chunkSize -> exactly one chunk covering everything
    assert(rows(2L).length == 1 && rows(2L).head.getLong(3) == 5L)
    assert(rows(3L).length == 1 && rows(3L).head.getLong(3) == 200L)
    // one char past the boundary -> a second (overlap-only) chunk
    assert(rows(4L).map(_.getLong(2)).toSeq == Seq(1L, 151L))
    // chunks reconstruct the full text: first chars of each stride window
    val rebuilt = rows(1L).map { r =>
      text.substring(r.getLong(2).toInt - 1,
        math.min(text.length, r.getLong(2).toInt - 1 + 150))
    }.mkString
    assert(rebuilt == text.take(rebuilt.length) && rebuilt.length >= text.length - 200)
  }

  test("chunkDocuments plan: no exchange (pure row-local explode)") {
    import spark.implicits._
    val docs = Seq((1L, "a" * 500)).toDF("doc_id", "text")
    val plan = TextAnalysis.chunkDocuments(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  // --- DSIR importance selection --------------------------------------------

  test("dsirWeights: target-like documents outweigh source-only documents") {
    import spark.implicits._
    import graft.pipeline.Curation
    // target slice speaks "alpha beta"; the rest speaks "gamma delta";
    // a candidate doc matching the target bigrams must outweigh one that
    // matches only the background
    val docs = (
      (1L to 20L).map(i => (i, "alpha beta alpha beta alpha beta", true)) ++
      (21L to 60L).map(i => (i, "gamma delta gamma delta gamma delta", false)) ++
      Seq((100L, "alpha beta alpha beta alpha beta", false),
        (101L, "gamma delta gamma delta gamma delta", false))
    ).toDF("doc_id", "text", "is_tgt")
    val w = Curation.dsirWeights(docs, "doc_id", "text", col("is_tgt"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w(100L) > w(101L),
      s"target-like doc must outweigh background doc: $w")
    // same text => same weight (pure function of features)
    assert(w(100L) == w(1L))
  }

  test("dsirScore(fitted model) == dsirWeights on the training corpus; stream == batch") {
    import spark.implicits._
    import graft.pipeline.Curation
    graft.mesh.Fixtures.registerRaw(spark, TestSessions.sfDir)
    val docs = spark.table("documents")
    val model = Curation.dsirModel(docs, "doc_id", "text",
      col("lang") === "en", buckets = 512)
    assert(model.length == 512)
    val served = Curation.dsirScore(docs, "doc_id", "text", model)
    val fitted = Curation.dsirWeights(docs, "doc_id", "text",
      col("lang") === "en", buckets = 512)
    assert(served.exceptAll(fitted).count() == 0 &&
      fitted.exceptAll(served).count() == 0)
    // the identical operator scores a live stream in update mode,
    // micro-batch cuts invisible in the final state
    val rows = docs.select("doc_id", "text").as[(Long, String)]
      .collect().toSeq.sortBy(_._1).take(90)
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](spark)
    val q = Curation.dsirScore(ms.toDF.toDF("doc_id", "text"),
        "doc_id", "text", model)
      .writeStream.outputMode("complete").format("memory")
      .queryName("dsir_stream").start()
    Seq(30, 60, 90).foldLeft(0) { (from, to) =>
      ms.addData(rows.slice(from, to)); q.processAllAvailable(); to
    }
    q.stop()
    val streamed = spark.table("dsir_stream")
    val batch = served.join(rows.map(_._1).toDF("doc_id"), "doc_id")
      .select(streamed.columns.map(col): _*)
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0)
  }

  test("dsirWeights plan: bucket model broadcasts, corpus never SMJs") {
    import spark.implicits._
    import graft.pipeline.Curation
    val dir = java.nio.file.Files.createTempDirectory("dsirplan").toString
    (1L to 50L).map(i => (i, "a b c d e f", i % 2 == 0))
      .toDF("doc_id", "text", "is_tgt").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val plan = Curation.dsirWeights(df, "doc_id", "text", col("is_tgt"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  // --- duplicate-mass report ------------------------------------------------

  test("dd10 dup-mass report: doc mass partitions the corpus exactly") {
    val out = graft.SparkEntry.queries("dd10_dup_mass_report")(
      spark, TestSessions.sfDir).collect()
    val total = spark.read
      .parquet(s"${TestSessions.sfDir}/documents.parquet").count()
    // every document lands in exactly one cluster-size bucket
    assert(out.map(_.getLong(2)).sum == total)
    // n_docs = size * n_clusters per bucket; per-mille is the integer share
    out.foreach { r =>
      assert(r.getLong(2) == r.getLong(0) * r.getLong(1), r.toString)
      assert(r.getLong(3) == r.getLong(2) * 1000 / total, r.toString)
    }
    // sizes strictly increasing (deterministic ordering)
    val sizes = out.map(_.getLong(0)).toSeq
    assert(sizes == sizes.sorted && sizes.distinct == sizes)
  }

  test("prfExpand pulls in a document containing none of the original terms") {
    import spark.implicits._
    // d1 is the only doc matching the original query ("alpha"); its
    // dominant co-occurring term is "beta", which must become the
    // expansion term and make d2 (beta-only) retrievable in pass 2.
    val docs = Seq(
      (1L, "alpha beta beta word"),
      (2L, "beta beta gamma word"),
      (3L, "delta delta delta word")
    ).toDF("doc_id", "text")
    val queries = Seq(7 -> Seq("alpha"))
    val expanded = graft.pipeline.TextAnalysis
      .prfExpand(docs, "doc_id", "text", queries, fbK = 1, expK = 1)
    assert(expanded == Seq(7 -> Seq("alpha", "beta")), expanded.toString)
    val pass2 = graft.pipeline.TextAnalysis
      .bm25TopK(docs, "doc_id", "text", expanded, k = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(pass2.contains(2L), pass2.toString) // unreachable before PRF
    // original terms and the empty token never appear as expansions
    val wide = graft.pipeline.TextAnalysis
      .prfExpand(docs, "doc_id", "text", queries, fbK = 3, expK = 10)
    assert(wide.head._2.count(_ == "alpha") == 1)
    assert(!wide.head._2.contains(""))
  }

  test("prfExpand sums tf ACROSS feedback docs and tiebreaks by term") {
    import spark.implicits._
    // both docs match "alpha" (fbK = 2 feedback set). Per-doc maxima
    // favor "zzz" (3 in one doc), but the cross-doc SUM favors "beta"
    // (2 + 2 = 4 > 3) — a per-doc max or last-doc-wins bug would pick
    // zzz. "ccc" and "aaa" tie at w = 2; the term-asc tiebreak must
    // order aaa before ccc.
    val docs = Seq(
      (1L, "alpha beta beta aaa ccc"),
      (2L, "alpha beta beta zzz zzz zzz aaa ccc")
    ).toDF("doc_id", "text")
    val queries = Seq(9 -> Seq("alpha"))
    val exp = graft.pipeline.TextAnalysis
      .prfExpand(docs, "doc_id", "text", queries, fbK = 2, expK = 3)
    // expansion order: beta (w=4), zzz (w=3), then the w=2 tie broken
    // by term ascending -> aaa
    assert(exp == Seq(9 -> Seq("alpha", "beta", "zzz", "aaa")), exp.toString)
  }

  // --- hybrid RRF fusion ----------------------------------------------------

  test("hybridRrf: hand-computed reciprocal-rank fusion of two sides") {
    import spark.implicits._
    // qid 1: doc 10 is rank 1 lexically and rank 2 vectorially; doc 20 is
    // rank 2 / rank 1; doc 30 appears on the BM25 side only (rank 3);
    // doc 40 on the vector side only (rank 3)
    val bm = Seq((1, 10L, 900L), (1, 20L, 800L), (1, 30L, 700L))
      .toDF("qid", "doc_id", "score_micro")
    val vec = Seq((1L, 20L, 0.95), (1L, 10L, 0.90), (1L, 40L, 0.85))
      .toDF("qid", "vec_id", "cos")
    val out = graft.pipeline.TextAnalysis.hybridRrf(bm, vec, k = 10)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val r1 = 1000000L / 61; val r2 = 1000000L / 62; val r3 = 1000000L / 63
    assert(out(10L) == r1 + r2) // rank 1 + rank 2
    assert(out(20L) == r2 + r1)
    assert(out(30L) == r3) // single-side docs score with that side alone
    assert(out(40L) == r3)
    // both-sides docs outrank single-side docs
    assert(out(10L) > out(30L) && out(20L) > out(40L))
  }

  test("mmrRerank diversifies: a near-duplicate of the top hit is deferred") {
    import spark.implicits._
    // query 0 at e1; candidates 1 and 2 are near-identical twins ~20°
    // ABOVE the query axis, candidate 3 sits ~25° BELOW it: slightly less
    // relevant but far (≈45°) from the twins. Pure relevance ranks
    // (1, 2, 3); MMR must defer 2 below 3 because sim(2, selected-1) ≈ 1
    // while sim(3, 1) ≈ cos 45°. (The twins must NOT coincide with the
    // query itself — if they do, sim(c, top) ≈ rel(c) for every candidate
    // and no λ can prefer diversity.)
    def vec(x: Double, y: Double) =
      Array.tabulate(64)(i => if (i == 0) x.toFloat else if (i == 1) y.toFloat else 0.0f)
    val vecs = Seq(
      (0L, vec(1.0, 0.0)),         // query
      (1L, vec(0.940, 0.342)),     // top hit, ~20° off-axis
      (2L, vec(0.939, 0.344)),     // near-duplicate of 1
      (3L, vec(0.906, -0.423))     // diverse: ~25° the other way
    ).toDF("vec_id", "embedding")
    val out = graft.pipeline.Similarity
      .mmrRerank(vecs, "vec_id", "embedding", queryIds = Seq(0L),
        kCand = 3, kSel = 3)
      .orderBy("mmr_rank").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 3L, 2L),
      out.mkString(", "))
    // rank-1 score is pure relevance; later marginals are strictly below
    // the unpenalized lambdaPm-scaled relevance (a positive sim penalty)
    assert(out(0).getLong(4) == out(0).getLong(3))
    assert(out(1).getLong(4) < 700L * out(1).getLong(3))
    assert(out(2).getLong(4) < 700L * out(2).getLong(3))
  }

  // --- cluster representatives --------------------------------------------

  test("clusterRepresentatives keeps the longest member, smallest id on ties") {
    import spark.implicits._
    val docs = Seq(
      (10L, 100L), (11L, 300L), (12L, 300L), // cluster A: 11 wins tie vs 12
      (20L, 50L), // singleton
      (30L, 10L), (31L, 5L) // cluster B: 30 wins on length
    ).toDF("doc_id", "n_chars")
    val clusters = Seq((10L, 10L), (11L, 10L), (12L, 10L), (30L, 30L),
      (31L, 30L)).toDF("doc_id", "cluster_id")
    val out = Dedup
      .clusterRepresentatives(docs, "doc_id", "n_chars", clusters)
      .select("doc_id", "cluster_id", "cluster_n", "is_rep")
      .orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) ->
      (r.getString(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(byId(11L) == ("10", 3L, true))
    assert(byId(10L) == ("10", 3L, false))
    assert(byId(12L) == ("10", 3L, false))
    // singleton is its own representative
    assert(byId(20L) == ("20", 1L, true))
    assert(byId(30L) == ("30", 2L, true))
    assert(byId(31L) == ("30", 2L, false))
    // exactly one representative per cluster
    val reps = out.filter(_.getBoolean(3)).map(_.getString(1))
    assert(reps.toSeq.sorted == reps.toSet.toSeq.sorted)
  }

  test("clusterRepresentatives: a NULL length is never elected over real ones") {
    import spark.implicits._
    // Spark's min(struct) sorts nulls FIRST ascending, which would elect
    // the null-length member; the argmax coalesces a null negated length
    // to Long.MaxValue so it sorts LAST — matching ORDER BY len DESC
    // NULLS LAST (the cq1 oracle's DuckDB semantics)
    val docs = Seq(
      (40L, Some(5L)), (41L, Option.empty[Long]), (42L, Some(9L)),
      (50L, Option.empty[Long]), (51L, Option.empty[Long]) // all-null cluster
    ).toDF("doc_id", "n_chars")
    val clusters = Seq((40L, 40L), (41L, 40L), (42L, 40L),
      (50L, 50L), (51L, 50L)).toDF("doc_id", "cluster_id")
    val out = Dedup
      .clusterRepresentatives(docs, "doc_id", "n_chars", clusters)
      .select("doc_id", "is_rep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out(42L) && !out(40L) && !out(41L))
    // all-null cluster falls back to the smallest id deterministically
    assert(out(50L) && !out(51L))
  }

  test("clusterRepresentatives: non-numeric ids keep their singleton label") {
    import spark.implicits._
    val docs = Seq(("u-1", 10L), ("u-2", 20L)).toDF("doc_id", "n_chars")
    val clusters = spark.emptyDataFrame
      .sparkSession.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("cluster_id",
            org.apache.spark.sql.types.StringType))))
    val out = Dedup
      .clusterRepresentatives(docs, "doc_id", "n_chars", clusters)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[String]("cluster_id")).toSeq == Seq("u-1", "u-2"))
    assert(out.forall(_.getAs[Boolean]("is_rep")))
  }
}
