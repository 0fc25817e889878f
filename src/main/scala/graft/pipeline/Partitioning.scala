package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Partition-width control for CPU-heavy row-local stages.
  *
  * The expensive projections in this package (shingling, minhash
  * permutations, k-centroid scoring, per-token digests) run in whatever
  * stage evaluates them. Two Spark behaviors can serialize that work onto
  * far fewer cores than the cluster has:
  *
  *  - a small parquet file yields ONE input split, so everything fused
  *    into the scan stage runs on one core while the rest idle;
  *  - `repartition(col)` without an explicit count (REPARTITION_BY_COL)
  *    is advisory: the optimizer may push deterministic projections
  *    below the exchange (back into the narrow scan stage), and AQE
  *    coalesces its output by SIZE — a few MB of compressed shuffle data
  *    becomes 2-3 tasks even when each row carries heavy compute.
  *
  * `fanOut` therefore repartitions with an EXPLICIT count
  * (REPARTITION_BY_NUM), which the optimizer treats as a hard user
  * requirement: projections stay above the exchange and AQE does not
  * coalesce it. It is also guarded — inputs already at least as wide as
  * the cluster pass through untouched, so at real corpus scale (where
  * the file index yields thousands of splits) no extra full-data
  * exchange is ever inserted.
  */
object Partitioning {

  /** Hash-repartition `df` by `byCol` up to the default parallelism iff
    * it is currently narrower; identity otherwise.
    *
    * The width probe (`df.rdd.getNumPartitions`) runs no job ONLY for
    * exchange-free plans: under AQE, converting a frame whose plan
    * contains exchanges to an RDD materializes its query stages — real
    * shuffle jobs at construction time, discarded when the consumer
    * re-plans the returned frame. So plans that already contain a
    * SHUFFLE exchange pass through UNPROBED: that exchange already
    * spreads rows cluster-wide, which is exactly the condition fanOut
    * exists to establish. The test is ShuffleExchangeLike, NOT the
    * Exchange base class: BroadcastExchangeExec extends Exchange too,
    * and a narrow frame whose only exchange is a broadcast-join build
    * side (docs joined to a small broadcast lookup) spreads nothing —
    * it must still be probed and widened. */
  def fanOut(df: DataFrame, byCol: String): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val hasExchange = df.queryExecution.sparkPlan
      .find(_.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])
      .isDefined
    if (hasExchange) df
    else if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target, col(byCol))
  }
}
