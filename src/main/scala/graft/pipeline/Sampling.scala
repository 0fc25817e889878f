package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / sharding operators for training-data exports.
  *
  * Both are pure projections over a content-derived md5 hash — no shuffle,
  * no RNG state, and the same rows are selected on any cluster size or
  * retry (the property a 100 TB pipeline needs for reproducible dataset
  * builds; `rand()`-based sampling changes under task re-execution).
  * Hashes are compared as hex STRINGS so any engine with md5 reproduces
  * the selection bit-for-bit (the DuckDB oracles do).
  */
object Sampling {

  /** Hash of `salt` + the row's id rendered as two lowercase hex chars —
    * a uniform draw from 256 buckets, usable as a threshold test. */
  private def hexDraw(idCol: Column, salt: String): Column =
    substring(md5(concat(lit(s"$salt:"), idCol.cast("string"))), 1, 2)

  /** Keep each row with probability `rates(stratum)/256` (default
    * `defaultRate`), deterministically: the row's 2-hex-char draw is
    * compared against the stratum's threshold. Rates are per-256 so the
    * threshold is exact in hex-string space. */
  def stratifiedSample(
      df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Int], defaultRate: Int = 0,
      salt: String = "sp1"): DataFrame = {
    // 256 = keep-all: every 2-hex-char draw must beat the threshold, but
    // f"100" would LOSE lexicographically to "11".."ff" — use "g", which
    // sorts after every hex digit
    def hexByte(n: Int): String =
      if (n >= 256) "g" else f"${math.max(n, 0)}%02x"
    val threshold = rates.foldLeft(lit(hexByte(defaultRate))) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum, lit(hexByte(rate))).otherwise(acc)
    }
    df.where(hexDraw(col(idCol), salt) < threshold)
  }

  /** Deterministic shard id in [0, nShards) for training-shard export:
    * derived from the row's hash draw, so shards are balanced and stable
    * across runs/retries. Writing becomes
    * `df.repartition(col("shard")).write.partitionBy("shard")`. */
  def withShard(
      df: DataFrame, idCol: String, nShards: Int,
      salt: String = "sp2", shardCol: String = "shard"): DataFrame = {
    require(nShards > 0 && nShards <= 256, "nShards must be in 1..256")
    // hex pair -> 0..255; an md5-capable engine reproduces the same value
    // by positional hex decode (the DuckDB oracle uses position-in-string)
    val value = conv(hexDraw(col(idCol), salt), 16, 10).cast("int")
    df.withColumn(shardCol, pmod(value, lit(nShards)).cast("int"))
  }
}
