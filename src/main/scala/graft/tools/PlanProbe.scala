package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: print the executed plan (post-AQE) of named SparkEntry
  * queries, plus scan/exchange/reuse counts — the iteration loop for plan
  * audits. Usage: runMain graft.tools.PlanProbe <sfDir> <name>[,<name>...] */
object PlanProbe {
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
      val t0 = System.nanoTime()
      // execute THIS df (not df.count(), a different QueryExecution) so
      // the printed plan is the AQE final plan with real stage reuse
      val n = df.collect().length
      val sec = (System.nanoTime() - t0) / 1e9
      val p = df.queryExecution.executedPlan.toString
      val scans = "Scan parquet".r.findAllIn(p).size
      // tree-prefix chars include ':' on left branches (`:- Exchange`,
      // `:  +- Exchange`) — an anchor admitting only whitespace/+/-
      // undercounted every exchange under a join/union left branch
      val exchanges = "(?m)^[\\s:|*()\\d+-]*(Exchange|ShuffleQueryStage)"
        .r.findAllIn(p).size
      val reused = "(?m)^[\\s:|*()\\d+-]*(ReusedExchange|ReusedQueryStage)"
        .r.findAllIn(p).size
      println(s"== $name rows=$n time=${f"$sec%.2f"}s scans=$scans exchanges=$exchanges reused=$reused")
      println(p.split("== Initial Plan ==").head)
    }
    spark.stop()
  }
}
