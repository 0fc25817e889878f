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
    val spark: SparkSession = ProfileSession.build()
    names.split(",").map(_.trim).filter(_.nonEmpty).foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      // cross-warm both actions so scans/codegen are shared state
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val c = ProfileSession.timeMin()(fn(spark, sfDir).count())
      val o = ProfileSession.timeMin()(
        fn(spark, sfDir).write.format("noop").mode("overwrite").save())
      println(f"AB $n%-28s count=$c%.3f s noop=$o%.3f s")
    }
    spark.stop()
  }
}
