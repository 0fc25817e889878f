package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: print a query's executed (adaptive, final) physical plan. */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val extraConf = sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.nonEmpty)
      .map { kv => val Array(k, v) = kv.split("=", 2); (k, v) }
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark = extraConf.foldLeft(builder) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      df.collect() // execute THIS plan so AQE prints the final form
      println(s"==== $n ====")
      val txt = df.queryExecution.executedPlan.toString
        .replaceAll("""\[[-0-9.,Ee \t]{40,}\]""", "[<vec>]")
      println(txt.take(20000))
    }
    spark.stop()
  }
}
