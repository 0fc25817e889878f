package graft.tools

import org.apache.spark.sql.SparkSession

/** Isolates the per-invocation harness overhead of cheap queries: full
  * query fn (registerRaw + SQL) vs the SQL alone vs registerRaw alone. */
object ProfileOverhead {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String, reps: Int)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => f)
      println(f"PROF $label%-28s ${(System.nanoTime() - t0) / 1e9 / reps}%.4f s/op")
    }
    val fn = graft.SparkEntry.queries("q16_scalar_funcs")
    t("q16 full fn", 10)(fn(spark, sfDir).count())
    t("q30 full fn", 10)(
      graft.SparkEntry.queries("q30_named_windows")(spark, sfDir).count())
    t("Views.registerAll only", 10)(graft.queries.Views.registerAll(spark, sfDir))
    t("registerRaw only", 10)(graft.mesh.Fixtures.registerRaw(spark, sfDir))
    spark.stop()
  }
}
