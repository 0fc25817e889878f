package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series gap fill (library form of ts1): dense fixed-step spines per
  * key with zero-filled counts. The spine generates from each key's
  * min/max bucket — |keys| × |buckets| rows, tiny next to the data it
  * left-joins — and bucket arithmetic is integer epochs, so the spine is
  * engine-reproducible. Buckets align to epoch multiples of the step
  * (UTC-anchored); under a session timezone with a non-whole-step UTC
  * offset this differs from wall-clock `date_trunc` boundaries. */
object GapFill {

  /** Per-(key, bucket) row counts with every `stepSeconds` bucket between
    * each key's first and last event present (zeros filled). `tsCol` must
    * be a timestamp column; output buckets are epoch seconds. */
  def countsDense(
      df: DataFrame, keyCol: String, tsCol: String,
      stepSeconds: Long = 3600L): DataFrame = {
    require(stepSeconds > 0, "stepSeconds must be positive")
    val b = df.select(col(keyCol).as("__k"),
        (floor(unix_timestamp(col(tsCol)) / stepSeconds) * stepSeconds)
          .cast("long").as("__bucket"))
      .groupBy(col("__k"), col("__bucket")).agg(count(lit(1)).as("__n"))
    val spine = b.groupBy(col("__k"))
      .agg(min(col("__bucket")).as("__mn"), max(col("__bucket")).as("__mx"))
      .select(col("__k"),
        explode(sequence(col("__mn"), col("__mx"), lit(stepSeconds))).as("__bucket"))
    spine.join(b, Seq("__k", "__bucket"), "left")
      .select(col("__k").as(keyCol), col("__bucket").as("bucket_epoch"),
        coalesce(col("__n"), lit(0L)).as("n"))
  }

  /** Rolling z-score anomaly detection over per-(key, hour) counts
    * (library form of ts2 — the ingest-stream data-quality monitor): each
    * observed hour scores against the mean/variance of its key's trailing
    * `window` OBSERVED hours, computed from integer window sums (sum,
    * sum-of-squares, count) so both the state and the arithmetic are
    * engine-exact; z comes out in 1e-4 units plus a >3-sigma flag. Rows
    * with fewer than `minPrior` trailing hours are warmup and excluded.
    * One shuffle (partition by key), sort within partition — window state
    * is three integers per row. */
  def rollingZScores(
      df: DataFrame, keyCol: String, tsCol: String,
      window: Int = 24, minPrior: Int = 12): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = df.select(col(keyCol).as("__k"),
        unix_timestamp(date_trunc("hour", col(tsCol))).cast("long").as("hr"))
      .groupBy(col("__k"), col("hr")).agg(count(lit(1)).as("n"))
    val win = Window.partitionBy(col("__k")).orderBy(col("hr"))
      .rowsBetween(-window, -1)
    b.select(col("__k"), col("hr"), col("n"),
        sum(col("n")).over(win).cast("long").as("s"),
        sum(col("n") * col("n")).over(win).cast("long").as("ss"),
        count(lit(1)).over(win).cast("long").as("k"))
      .where(col("k") >= minPrior)
      .select(col("__k").as(keyCol), col("hr").as("hr_epoch"),
        col("n").cast("long").as("n"),
        expr("""CAST(round((n - s / CAST(k AS DOUBLE))
               | / sqrt((ss - s * s / CAST(k AS DOUBLE)) / k + CAST(1 AS DOUBLE)) * 1e4) AS BIGINT)"""
          .stripMargin).as("z_u4"),
        expr("""abs((n - s / CAST(k AS DOUBLE))
               | / sqrt((ss - s * s / CAST(k AS DOUBLE)) / k + CAST(1 AS DOUBLE))) > 3"""
          .stripMargin).as("anomaly"))
  }
}
