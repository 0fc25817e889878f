package graft.tools

import org.apache.spark.sql.functions._

import graft.pipeline.TextAnalysis

/** rt4 shared-corpus-kernel A/B (round-12 #2): the current two-pass form
  * (prfExpand + bm25TopK, each running the token_term_counts kernel over
  * the full corpus) vs the shared form (ONE token_counts map pass
  * localCheckpoint-ed, both passes reading tfs by map lookup —
  * TextAnalysis.bm25DocTermCounts / prfExpandCounts / bm25TopKCounts).
  * Prints min-of-3 end-to-end timings (checkpoint build INSIDE the timed
  * window — it is part of the shared form's cost) and a row-for-row
  * result equality check. */
object ProfileRt4Shared {
  private val queries: Seq[(Int, Seq[String])] =
    graft.pipeline.PipelineQueries.bm25QueryDefsForProbe
  private val fbK = 10
  private val expK = 5
  private val k = 5

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val spark = ProfileSession.build()
    graft.mesh.Fixtures.registerRaw(spark, sfDir)
    val docs = spark.table("documents")
    println(s"PROF docs=${docs.count()} dir=$sfDir")

    def current() = {
      val expanded = TextAnalysis.prfExpand(
        docs, "doc_id", "text", queries, fbK = fbK, expK = expK)
      TextAnalysis.bm25TopK(docs, "doc_id", "text", expanded, k = k)
        .orderBy(col("qid"), col("score_micro").desc, col("doc_id"))
    }
    def shared() = {
      val perDoc = TextAnalysis.bm25DocTermCounts(docs, "doc_id", "text")
        .localCheckpoint()
      val expanded = TextAnalysis.prfExpandCounts(
        perDoc, queries, fbK = fbK, expK = expK)
      TextAnalysis.bm25TopKCounts(perDoc, expanded, k = k)
        .orderBy(col("qid"), col("score_micro").desc, col("doc_id"))
    }

    val a = current().collect().toSeq
    val b = shared().collect().toSeq
    println(s"PROF equal=${a == b} rows=${a.size}")

    val tCur = ProfileSession.timeMin() { current().count(): Unit }
    val tShared = ProfileSession.timeMin() { shared().count(): Unit }
    println(f"PROF current=$tCur%.3f s  shared=$tShared%.3f s")
    spark.stop()
  }
}
