package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the most recent right row
  * with `rightTime <= leftTime` per key — the operator Spark lacks natively
  * (SURVEY preference order (a): composed from existing ops).
  *
  * Implementation is the scalable union-sort-carry pattern, not a range
  * cross-join: tag both inputs, union, and carry the last right payload
  * forward with an `ignoreNulls` last() over (key, time, tag) ordering.
  * One shuffle on the key, no row explosion — at 100 TB this is a single
  * sort-merge pass, the same shape as stream-to-table temporal joins.
  *
  * Right rows sort before left rows at equal timestamps, so the match is
  * inclusive (`rightTime <= leftTime`). Callers should deduplicate the
  * right side to one row per (key, time) for deterministic payloads.
  */
object AsOfJoin {

  /** @param payload right-side columns to carry onto each left row (null
    *                when no right row precedes the left row). */
  def asofLast(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      payload: Seq[String]): DataFrame =
    asofImpl(left, right, keys, leftTime, rightTime, payload, forward = false)

  /** FORWARD as-of join: for each left row, the NEAREST right row with
    * `rightTime >= leftTime` per key (inclusive). Same union-sort-carry
    * shape with the window ordered descending so the carry flows backwards
    * from the future; right rows still sort before left rows at equal
    * timestamps, keeping the match inclusive. */
  def asofNext(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      payload: Seq[String]): DataFrame =
    asofImpl(left, right, keys, leftTime, rightTime, payload, forward = true)

  /** One implementation for both directions — only the time ordering
    * differs. NULL-time semantics match SQL comparisons: null-time right
    * rows are dropped (they precede/follow nothing) and null-time left
    * rows sort FIRST in either direction (nulls-first), so no right row
    * precedes them and their payload is null. */
  private def asofImpl(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      payload: Seq[String], forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq

    val taggedRight = right.where(col(rightTime).isNotNull).select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"),
        struct(payload.map(col): _*).as("__p"),
        lit(0).as("__tag")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).as(c)): _*)
    val taggedLeft = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("__t"),
        lit(null).cast(taggedRight.schema("__p").dataType).as("__p"),
        lit(1).as("__tag")) ++
        leftCols.filterNot(keys.contains).map(col): _*)

    val timeOrd = if (forward) col("__t").desc_nulls_first else col("__t").asc_nulls_first
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(timeOrd, col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedRight.unionByName(taggedLeft)
      .withColumn("__carried", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__tag") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col(s"__carried.$p").as(p)): _*)
  }
}
