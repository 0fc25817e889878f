package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc timing for a subset of SparkEntry queries (same session config as
  * Bench, min-of-3 after warmup). Usage:
  * runMain graft.tools.TimeQueries <sfDir> <query>... */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("dm2_dedup_across_sources")
    val spark = ProfileSession.build()
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
