package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for hot keys at scale. AQE's skew-join split
  * handles sort-merge joins after the fact; these helpers restructure the
  * plan up front, which also covers aggregations and broadcast-ineligible
  * shapes:
  *
  *  - `saltedAggCount`: two-phase aggregation — phase 1 groups on
  *    (key, salt) so one hot key spreads over `buckets` reducers, phase 2
  *    merges the partials (the generalization of what Spark already does
  *    for partial aggregates when map-side combine isn't enough because a
  *    single reducer key still overflows).
  *  - `saltedJoin`: fact side gets a deterministic salt, dimension side is
  *    replicated `buckets`x, join key becomes (key, salt) — a hot join key
  *    now lands on `buckets` tasks instead of one.
  *
  * Salts are derived from `xxhash64` of the whole row — deterministic, so
  * results are reproducible run-to-run. */
object Skew {

  private def rowSalt(df: DataFrame, buckets: Int) =
    pmod(xxhash64(struct(df.columns.map(col): _*)), lit(buckets.toLong))

  /** Two-phase distinct-row-count per key under salting; equals
    * `df.groupBy(keys).count()` but a hot key is computed by `buckets`
    * reducers before a cheap merge. */
  def saltedAggCount(df: DataFrame, keys: Seq[String], buckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt", rowSalt(df, buckets))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as("count"))
  }

  /** Salted equi-join: `left` (large/skewed) joined to `right` (smaller,
    * replicated) on `keys`. Result equals the plain join. */
  def saltedJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      buckets: Int = 16, joinType: String = "inner"): DataFrame = {
    val l = left.withColumn("__salt", rowSalt(left, buckets))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }
}
