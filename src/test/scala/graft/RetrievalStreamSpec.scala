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
}
