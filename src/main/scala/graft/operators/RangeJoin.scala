package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-range join on an equi-key plus an interval predicate
  * (`start <= point <= end`) — the "range join" the reference family of
  * engines special-cases (DuckDB's IEJoin, Databricks' range-join hints).
  *
  * Spark plans the naive formulation (key equality AND two inequalities)
  * as a hash join on the key followed by a per-key filter — fine when keys
  * are selective, but a key shared by many rows degenerates toward a
  * per-key cross product; with no equi-key at all it becomes a
  * BroadcastNestedLoopJoin. Bin bucketing restores a pure hash-join shape:
  * every range explodes to the fixed-width bins it overlaps
  * (`ceil(len/binWidth)+1` rows), every point computes its single bin, and
  * the join key becomes (key, bin) with an exact interval filter above.
  * Because a point lies in exactly one bin, each qualifying (point, range)
  * pair matches exactly once — no dedup pass.
  *
  * Choose `binWidth` near the typical range length: much smaller multiplies
  * the range fan-out; much larger packs many ranges per bin and re-grows
  * the post-join filter work.
  */
object RangeJoin {

  /** Join `points` to every row of `ranges` with the same `keys` whose
    * `[startCol, endCol]` interval contains `pointCol`. The three bound
    * columns must be numeric (e.g. epoch micros) and named distinctly from
    * each other; key columns must exist on both sides. */
  def pointInRange(
      points: DataFrame, ranges: DataFrame, keys: Seq[String],
      pointCol: String, startCol: String, endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val binnedRanges = ranges.withColumn("__bin",
      explode(sequence(
        floor(col(startCol) / binWidth).cast("long"),
        floor(col(endCol) / binWidth).cast("long"))))
    val binnedPoints = points.withColumn("__bin",
      floor(col(pointCol) / binWidth).cast("long"))
    binnedPoints.join(binnedRanges, keys :+ "__bin")
      .where(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }

  /** Interval-overlap join: every (left, right) pair with the same `keys`
    * whose closed intervals `[lStart, lEnd]` and `[rStart, rEnd]` overlap.
    * Same bin-bucketing shape as [[pointInRange]] — both sides explode to
    * the fixed-width bins they span and hash-join on (keys, bin) — with
    * exactly-once emission restored by keeping only the bin containing
    * `max(lStart, rStart)`: overlap implies that point lies in BOTH
    * intervals, so exactly one shared bin survives per qualifying pair and
    * no dedup shuffle is needed. Bound columns must be numeric and named
    * distinctly across the two sides. */
  def intervalOverlap(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def binned(df: DataFrame, s: String, e: String) = df.withColumn("__bin",
      explode(sequence(
        floor(col(s) / binWidth).cast("long"),
        floor(col(e) / binWidth).cast("long"))))
    binned(left, lStart, lEnd).join(binned(right, rStart, rEnd), keys :+ "__bin")
      .where(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        col("__bin") === floor(greatest(col(lStart), col(rStart)) / binWidth).cast("long"))
      .drop("__bin")
  }
}
