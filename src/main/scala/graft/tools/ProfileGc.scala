package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B probe: does Bench's pre-window System.gc() hygiene inflate the
  * timed windows themselves (cleaner work bleeding past the 100 ms
  * drain), or is the gap between Bench and ProfileQuery numbers real
  * query cost? */
object ProfileGc {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = args.toSeq
    names.foreach(n => graft.SparkEntry.queries(n)(spark, sfDir).count()) // warm
    def run(label: String, gc: Boolean, sleepMs: Long): Unit = {
      names.foreach { n =>
        var best = Double.MaxValue
        (1 to 3).foreach { _ =>
          if (gc) { System.gc(); Thread.sleep(sleepMs) }
          val t0 = System.nanoTime()
          graft.SparkEntry.queries(n)(spark, sfDir).count()
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
        }
        println(f"GCPROBE $label%-12s $n%-28s $best%.3f")
      }
    }
    run("nogc", gc = false, 0)
    run("gc100", gc = true, 100)
    run("gc500", gc = true, 500)
    run("nogc2", gc = false, 0)
    spark.stop()
  }
}
