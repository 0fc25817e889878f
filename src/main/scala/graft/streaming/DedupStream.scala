package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming twin of batch dd1 (`Dedup.exact`): continuous-ingest EXACT
  * dedup — the shape a production corpus pipeline actually runs, where
  * documents arrive forever and each must be admitted or dropped ON
  * ARRIVAL, not re-deduped from scratch per batch.
  *
  * Semantics: first arrival wins. Per content signature (md5 of the text,
  * the batch operator's key), a `ValueState` holds the keeper's doc id;
  * every arriving document emits a verdict row (doc_id, sig, keeper,
  * is_dup). Within one micro-batch the keeper tiebreak is the minimal
  * doc id — so a stream fed in id order converges to EXACTLY the batch
  * operator's (sig → min id) answer, and any feed order still yields a
  * stable first-arrival answer (StreamingDedupSpec pins both).
  *
  * At-least-once replay is idempotent: a keeper, once set, never changes,
  * so replayed documents re-emit their original verdicts (duplicates in
  * the verdict STREAM are collapsed by the sink keying on doc_id — the
  * usual Update-mode contract).
  *
  * Scale shape: state is ONE small row per distinct content signature —
  * the same cardinality the batch groupBy materializes, but spread over
  * the RocksDB state store and carried incrementally (changelog
  * checkpoints at cluster scale). No TTL: dedup state is the product (an
  * eviction horizon would re-admit old duplicates); a deployment that
  * wants a bounded window composes this with a watermark policy upstream.
  * The per-call buffer is one batch's worth of ONE signature's doc ids —
  * batch-bounded, never corpus-bounded. */
object DedupStream {

  final case class DocSig(doc_id: Long, sig: String)
  final case class KeeperState(doc_id: Long)

  private class DedupProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, DocSig, (Long, String, Long, Boolean)] {
    import org.apache.spark.sql.streaming.{TimerValues, TTLConfig, ValueState}

    @transient private var keeper: ValueState[KeeperState] = _

    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      keeper = getHandle.getValueState[KeeperState](
        "keeper", org.apache.spark.sql.Encoders.product[KeeperState],
        TTLConfig.NONE)

    override def handleInputRows(
        key: String, rows: Iterator[DocSig],
        timerValues: TimerValues): Iterator[(Long, String, Long, Boolean)] = {
      // one signature's ids within one micro-batch — batch-bounded
      val ids = rows.map(_.doc_id).toArray
      val k =
        if (keeper.exists()) keeper.get().doc_id
        else { val m = ids.min; keeper.update(KeeperState(m)); m }
      ids.iterator.map(id => (id, key, k, id != k))
    }
  }

  /** Per-arrival dedup verdicts over a streaming document frame: emits
    * (doc_id, sig, keeper, is_dup) per input row. Requires the RocksDB
    * state store provider (transformWithState). */
  def dedupStream(
      spark: SparkSession, docs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        md5(col(textCol)).as("sig"))
      .as[DocSig]
      .groupByKey(_.sig)
      .transformWithState(
        new DedupProcessor, TimeMode.None(), OutputMode.Update())
      .toDF("doc_id", "sig", "keeper", "is_dup")
  }
}
