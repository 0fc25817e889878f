package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: rt2's cost split — the BM25 corpus pass vs the vector top-k
  * vs fusion (round 11 weak-tail work). */
object ProfileRt2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val spark = ProfileSession.build()
    graft.mesh.Fixtures.registerRaw(spark, sfDir)
    import graft.pipeline.{PipelineQueries, Similarity, TextAnalysis}
    val qdefs = PipelineQueries.bm25QueryDefsForProbe

    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.count()
      val ts = (1 to 5).map { _ =>
        System.gc(); Thread.sleep(100)
        val t0 = System.nanoTime(); mk.count(); (System.nanoTime() - t0) / 1e9
      }
      println(f"PROF $name%-14s min=${ts.min}%.3f s (${ts.map(t => f"$t%.3f").mkString(", ")})")
    }

    time("bm25_k20")(TextAnalysis.bm25TopK(spark.table("documents"),
      "doc_id", "text", qdefs, k = 20))
    time("vector_k20")(Similarity.bruteForceTopK(spark.table("embeddings"),
      "vec_id", "embedding", qdefs.map(_._1.toLong), k = 20))
    time("rt2_full")(graft.SparkEntry.queries("rt2_hybrid_rrf")(spark, sfDir))
    spark.stop()
  }
}
