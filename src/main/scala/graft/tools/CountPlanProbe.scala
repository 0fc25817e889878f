package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: the Bench/TimeQueries harnesses drive queries with
  * `df.count()`, a DIFFERENT QueryExecution than the df's own collect —
  * so plan properties verified on the collect plan (exchange reuse,
  * broadcast shapes) may not hold in the benchmarked execution. This
  * prints the post-AQE executed plan of the *count* execution.
  * Usage: runMain graft.tools.CountPlanProbe <sfDir> <name>[,<name>...] */
object CountPlanProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
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
