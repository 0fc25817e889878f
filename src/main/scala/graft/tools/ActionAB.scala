package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: A/B the harness ACTION — `df.count()` (a count-rewritten
  * QueryExecution: final sorts eliminated, aggregates pruned, exchange
  * reuse can break when the two CTE instances prune differently) versus a
  * noop DSv2 write (executes the user-visible plan, discards rows) — the
  * action a result-fetching client actually pays.
  * Usage: runMain graft.tools.ActionAB <sfDir> <name>[,<name>...] */
object ActionAB {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args.take(2)
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
    def time(f: => Unit): Double = {
      System.gc(); Thread.sleep(100)
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    names.split(",").map(_.trim).filter(_.nonEmpty).foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      fn(spark, sfDir).count() // warmup (both actions share scans/codegen)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val cs = (1 to 3).map(_ => time(fn(spark, sfDir).count()))
      val ns = (1 to 3).map(_ => time(
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()))
      println(f"AB $n%-28s count=${cs.min}%.3f s noop=${ns.min}%.3f s")
    }
    spark.stop()
  }
}
