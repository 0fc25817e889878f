package graft.tools

/** Dev probe: the Bench/TimeQueries harnesses drive queries with
  * `df.count()`, a DIFFERENT QueryExecution than the df's own collect —
  * so plan properties verified on the collect plan (exchange reuse,
  * broadcast shapes) may not hold in the benchmarked execution. This
  * prints the post-AQE executed plan of the *count* execution.
  * Usage: runMain graft.tools.CountPlanProbe <sfDir> <name>[,<name>...] */
object CountPlanProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args.take(2)
    // the bench-matching session (ProfileSession), NOT a hand-rolled
    // builder: the probe explains Bench/TimeQueries plans, and a config
    // drift (advisory size, coalesce policy, compression) can change the
    // post-AQE plan it prints
    val spark = ProfileSession.build()
    names.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      // mirror the harness: count() builds its own QueryExecution
      val counted = df.groupBy().count()
      val n = counted.collect().head.getLong(0)
      val p = counted.queryExecution.executedPlan.toString
      val scans = "FileScan parquet".r.findAllIn(p).size
      val reused = "(?m)^[\\s:|*()\\d+-]*(ReusedExchange|ReusedQueryStage)"
        .r.findAllIn(p).size
      println(s"== $name(count) rows=$n scans=$scans reused=$reused")
      println(p.split("== Initial Plan ==").head)
    }
    spark.stop()
  }
}
