package graft.tools

import org.apache.spark.sql.SparkSession

/** ONE definition of the bench-matching dev session + timing harness.
  *
  * The profiling tools exist to explain Bench/TimeQueries numbers, so they
  * must run under the SAME session config — previously each tool
  * copy-pasted the builder block, and a config change A/B'd in the harness
  * (advisory size, compression, codegen cache) would silently
  * desynchronize the profilers from the numbers they explain. New tools
  * call [[build]] and [[timeMin]] instead of pasting. */
object ProfileSession {

  /** The Bench/TimeQueries session: local[cpus], bench AQE settings,
    * compression off (single-JVM), UTC, quiet wire diagnostics. */
  def build(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.broadcast.compress", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.props("graft.wire.quiet") = "1"
    spark
  }

  /** Warm once, then min-of-`runs` with the JMH-style hygiene the harness
    * uses (driver GC + ContextCleaner drain OUTSIDE the timed window —
    * see TimeQueries for the measured 17x long-session effect). */
  def timeMin(runs: Int = 3)(action: => Unit): Double = {
    action // warmup
    (1 to runs).map { _ =>
      System.gc(); Thread.sleep(100)
      val t0 = System.nanoTime(); action; (System.nanoTime() - t0) / 1e9
    }.min
  }
}
