package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc timing for a subset of SparkEntry queries (same session config as
  * Bench, min-of-3 after warmup). Usage:
  * runMain graft.tools.TimeQueries <sfDir> <query>... */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("dm2_dedup_across_sources")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      // see Bench: keep the codegen compile cache wide enough for the
      // whole suite so timings match the Bench session's steady state
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      // single-JVM local mode: compression is pure overhead (see Bench)
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.broadcast.compress", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // match Bench: wire diagnostics stay out of timed windows
    sys.props("graft.wire.quiet") = "1"
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      fn(spark, sfDir).count() // warmup
      val ts = (1 to 3).map { _ =>
        // JMH-style hygiene: collect BEFORE the timed window, outside it.
        // A long session otherwise accumulates dead plan/shuffle/broadcast
        // state the ContextCleaner only drains after a driver GC (48g heap
        // ⇒ organic GCs are rare), and late queries absorb the debt —
        // measured 17x on a 103-query sf1 session (ss2 24.7 s vs 1.4 s in
        // a fresh session)
        System.gc()
        Thread.sleep(100) // let the ContextCleaner drain OUTSIDE the window
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIMED $n%-28s min=${ts.min}%.3f s (runs: ${ts.map(t => f"$t%.3f").mkString(", ")})")
    }
    spark.stop()
  }
}
