package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: split a query's cost into DataFrame construction (mesh
  * resolution + analysis) vs execution (jobs), warm, per query name. */
object ProfileQuery {
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
    val names = args.toSeq
    names.foreach { n => graft.SparkEntry.queries(n)(spark, sfDir).count() } // warm
    names.foreach { n =>
      var bestC = Double.MaxValue; var bestE = Double.MaxValue
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val t1 = System.nanoTime()
        df.count()
        val t2 = System.nanoTime()
        bestC = math.min(bestC, (t1 - t0) / 1e9)
        bestE = math.min(bestE, (t2 - t1) / 1e9)
      }
      println(f"PROFILE $n%-28s construct=$bestC%.3f exec=$bestE%.3f")
    }
    spark.stop()
  }
}
