package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe for the rt4 slowness: time bm25TopK as the distinct-term
  * count grows. */
object Rt4Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.mesh.Fixtures.registerRaw(spark, sfDir)
    val docs = spark.table("documents")
    val pool = Seq("hash", "join", "part", "small", "column", "merge", "the",
      "window", "sort", "query", "order", "group", "line", "slow", "filter",
      "spark", "stream", "fast", "batch", "scan")
    Seq(6, 9, 12, 15, 18).foreach { m =>
      val qs = Seq(1 -> pool.take(m / 3), 2 -> pool.slice(m / 3, 2 * m / 3),
        3 -> pool.slice(2 * m / 3, m))
      val t0 = System.nanoTime()
      val n = graft.pipeline.TextAnalysis
        .bm25TopK(docs, "doc_id", "text", qs, k = 5).collect().length
      println(f"m=$m%2d  ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$n")
    }
    spark.stop()
  }
}
