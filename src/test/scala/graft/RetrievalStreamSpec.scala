package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.mesh.Fixtures
import graft.pipeline.TextAnalysis
import graft.streaming.RetrievalStream

/** Batch ≡ stream for the rt1 twin: BM25 scoring against frozen index
  * stats must reproduce the batch operator's integer micro scores exactly,
  * and the stateful top-k must converge to the batch top-k under
  * micro-batch cuts AND a replayed slice (at-least-once idempotency). */
class RetrievalStreamSpec extends AnyFunSuite {

  lazy val spark = TestSessions.spark
  private def sfDir = TestSessions.sfDir

  private val queries: Seq[(Int, Seq[String])] = Seq(
    1 -> Seq("hash", "join"),
    2 -> Seq("window", "sort", "query"),
    3 -> Seq("spark", "stream", "fast"))

  test("bm25ScoreFrozen == the batch operator's scores on the same corpus") {
    Fixtures.registerRaw(spark, sfDir)
    val docs = spark.table("documents")
    val stats = TextAnalysis.bm25FrozenStats(docs, "text", queries)
    // sanity: the frozen row is the corpus it was built from
    assert(stats.nDocs == docs.where(col("text").isNotNull).count())
    val frozen = TextAnalysis
      .bm25ScoreFrozen(docs, "doc_id", "text", queries, stats)
    // batch top-k at k large enough to cover every hit = the full scored
    // set, ranked; compare as sets of (qid, doc_id, score_micro)
    val batchAll = TextAnalysis
      .bm25TopK(docs, "doc_id", "text", queries, k = Int.MaxValue)
      .select(col("qid").cast("int"), col("doc_id"), col("score_micro"))
    assert(frozen.select(col("qid"), col("doc_id"), col("score_micro"))
      .exceptAll(batchAll).count() == 0)
    assert(batchAll.exceptAll(
      frozen.select(col("qid"), col("doc_id"), col("score_micro"))).count() == 0)
  }

  test("streaming top-k converges to batch rt1 under cuts and replay") {
    import spark.implicits._
    Fixtures.registerRaw(spark, sfDir)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val docsB = spark.table("documents")
      val stats = TextAnalysis.bm25FrozenStats(docsB, "text", queries)
      val all = docsB.select(col("doc_id").cast("long"), col("text"))
        .as[(Long, String)].collect()
      val ms = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)](spark)
      val src = ms.toDF.toDF("doc_id", "text")
      val q = RetrievalStream.bm25TopKStream(
          spark, src, "doc_id", "text", queries, stats, k = 5)
        .writeStream.outputMode("update").format("memory")
        .queryName("rt1_stream").start()
      val cuts = Seq(all.length / 3, 2 * all.length / 3, all.length)
      var from = 0
      cuts.foreach { to =>
        ms.addData(all.slice(from, to).toSeq)
        q.processAllAvailable()
        from = to
      }
      // at-least-once replay: resend the first third; top-k must not move
      val before = spark.table("rt1_stream").count()
      ms.addData(all.slice(0, all.length / 3).toSeq)
      q.processAllAvailable()
      assert(spark.table("rt1_stream").count() == before,
        "replayed docs changed the top-k (idempotency broken)")
      q.stop()
      // final answer per query = its max-version rows
      val finalTop = spark.table("rt1_stream")
        .withColumn("__mv", max(col("version"))
          .over(org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))))
        .where(col("version") === col("__mv"))
        .select(col("qid").cast("int"), col("doc_id"), col("score_micro"))
      val batch = TextAnalysis
        .bm25TopK(docsB, "doc_id", "text", queries, k = 5)
        .select(col("qid").cast("int"), col("doc_id"), col("score_micro"))
      assert(finalTop.count() == batch.count())
      assert(finalTop.exceptAll(batch).count() == 0 &&
        batch.exceptAll(finalTop).count() == 0)
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("counts-based BM25/PRF APIs are bit-equal to the kernel path (both m-forms)") {
    Fixtures.registerRaw(spark, sfDir)
    val docs = spark.table("documents")
    val perDoc = TextAnalysis.bm25DocTermCounts(docs, "doc_id", "text")
      .localCheckpoint()
    def ranked(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("qid"), col("score_micro").desc, col("doc_id"))
        .collect().toSeq
    // columnar form (m <= 10 distinct terms)
    val viaKernel = ranked(TextAnalysis.bm25TopK(docs, "doc_id", "text", queries, k = 7))
    val viaCounts = ranked(TextAnalysis.bm25TopKCounts(perDoc, queries, k = 7))
    assert(viaKernel.nonEmpty && viaKernel == viaCounts)
    // expansion selection is engine-exact in both variants
    val e1 = TextAnalysis.prfExpand(docs, "doc_id", "text", queries, fbK = 5, expK = 4)
    val e2 = TextAnalysis.prfExpandCounts(perDoc, queries, fbK = 5, expK = 4)
    assert(e1 == e2)
    // the expanded set crosses the m > 10 dispatch: array form engages
    assert(e1.flatMap(_._2).distinct.size > 10)
    val bigKernel = ranked(TextAnalysis.bm25TopK(docs, "doc_id", "text", e1, k = 5))
    val bigCounts = ranked(TextAnalysis.bm25TopKCounts(perDoc, e2, k = 5))
    assert(bigKernel.nonEmpty && bigKernel == bigCounts)
  }

  test("streaming filtered-IVF ANN converges to batch ss10 under cuts and replay") {
    import spark.implicits._
    import graft.pipeline.Similarity
    Fixtures.registerRaw(spark, sfDir)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val emb = spark.table("embeddings")
      // frozen index state: ss10's exact parameters (5 queries, 16 seeded
      // centroids, nprobe 2, label-exclusion filter)
      val (cents, qdefs) = Similarity.ivfFilteredFrozen(
        emb, "vec_id", "embedding", "label",
        queryIds = 0L until 5L, centroidIds = 0L until 16L, nprobe = 2)
      assert(cents.size == 16 && qdefs.size == 5 &&
        qdefs.forall(_.probed.size == 2))
      val all = emb.select(col("vec_id").cast("long"), col("embedding"),
          col("label").cast("long"))
        .as[(Long, Seq[Float], Long)].collect()
      val ms = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Seq[Float], Long)](spark)
      val src = ms.toDF.toDF("vec_id", "embedding", "label")
      val q = RetrievalStream.ivfFilteredTopKStream(
          spark, src, "vec_id", "embedding", "label", cents, qdefs, k = 5)
        .writeStream.outputMode("update").format("memory")
        .queryName("ss10_stream").start()
      try {
        val cuts = Seq(all.length / 3, 2 * all.length / 3, all.length)
        var from = 0
        cuts.foreach { to =>
          ms.addData(all.slice(from, to).toSeq)
          q.processAllAvailable()
          from = to
        }
        // at-least-once replay: identical scores re-merge into identical
        // state — no new versions
        val before = spark.table("ss10_stream").count()
        ms.addData(all.slice(0, all.length / 3).toSeq)
        q.processAllAvailable()
        assert(spark.table("ss10_stream").count() == before,
          "replayed vectors changed the top-k (idempotency broken)")
      } finally q.stop()
      val finalTop = spark.table("ss10_stream")
        .withColumn("__mv", max(col("version"))
          .over(org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))))
        .where(col("version") === col("__mv"))
        .select(col("qid"), col("doc_id").as("vec_id"), col("score_micro"))
      // the oracle-gated batch query, cos quantized through the same
      // round(cos * 1e6) the stream applies (exact: cos is already 6 dp)
      val batch = graft.SparkEntry.queries("ss10_filtered_ivf")(spark, sfDir)
        .select(col("qid").cast("long").as("qid"),
          col("vec_id").cast("long").as("vec_id"),
          round(col("cos") * lit(1000000.0)).cast("long").as("score_micro"))
      assert(finalTop.count() == batch.count())
      assert(finalTop.exceptAll(batch).count() == 0 &&
        batch.exceptAll(finalTop).count() == 0)
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
