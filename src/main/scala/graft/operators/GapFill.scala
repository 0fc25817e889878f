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
}
