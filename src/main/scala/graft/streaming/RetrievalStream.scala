package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.pipeline.TextAnalysis

/** Streaming twin of rt1 (BM25 top-k retrieval): documents arrive on a
  * stream and are scored ROW-LOCALLY against the FROZEN index stats of an
  * already-indexed corpus ([[TextAnalysis.bm25FrozenStats]] — the single
  * broadcast-row model state the batch operator folds in one pass), then a
  * per-query stateful processor maintains the running top-k. This is the
  * standard serving split: index stats are stored state refreshed by a
  * periodic batch build; arriving docs never reshuffle the corpus — the
  * only keyed state is queries × k rows.
  *
  * Mirrors the ev1/ev2/ev4 batch-twin discipline: the scoring projection
  * is the SAME expression tree as the batch operator (bit-identical
  * integer micro scores — RetrievalStreamSpec pins batch ≡ stream), and
  * replayed documents are idempotent (the top-k merge dedups by doc id;
  * scores are deterministic, so a replay re-inserts an identical entry).
  *
  * Scale shape: scoring is a stateless map over the stream (parallel by
  * input partitioning); the shuffle carries only hit rows keyed by qid;
  * per-query state is exactly k entries. A corpus-stats drift concern
  * (N/df/avgdl go stale as docs stream in) is deliberate: production BM25
  * serving scores against a FIXED index generation and swaps generations
  * atomically — per-doc incremental stats would make scores
  * order-dependent and irreproducible. */
object RetrievalStream {

  final case class TopEntry(score_micro: Long, doc_id: Long)
  final case class TopKState(version: Long, entries: Seq[TopEntry])
  final case class ScoredHit(qid: Int, doc_id: Long, score_micro: Long)

  /** Per-query bounded top-k maintenance: merge the batch's hits into the
    * stored k-best (dedup by doc id — replay-idempotent), and on any
    * change emit the FULL new top-k as (qid, version, rank, doc_id,
    * score_micro) rows; consumers read the max version per qid. State is
    * exactly k entries per query — no TTL needed, it cannot grow. */
  private class TopKProcessor(k: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Int, ScoredHit, (Int, Long, Int, Long, Long)] {
    import org.apache.spark.sql.streaming.{TimerValues, TTLConfig, ValueState}

    @transient private var st: ValueState[TopKState] = _

    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[TopKState]("topk",
        org.apache.spark.sql.Encoders.product[TopKState], TTLConfig.NONE)

    override def handleInputRows(
        key: Int, rows: Iterator[ScoredHit],
        timerValues: TimerValues): Iterator[(Int, Long, Int, Long, Long)] = {
      val prev = if (st.exists()) st.get() else TopKState(0L, Nil)
      val merged = (prev.entries ++ rows.map(r =>
          TopEntry(r.score_micro, r.doc_id)))
        .groupBy(_.doc_id).map(_._2.head).toSeq
        .sortBy(e => (-e.score_micro, e.doc_id))
        .take(k)
      if (merged == prev.entries) Iterator.empty
      else {
        val next = TopKState(prev.version + 1, merged)
        st.update(next)
        merged.iterator.zipWithIndex.map { case (e, i) =>
          (key, next.version, i + 1, e.doc_id, e.score_micro)
        }
      }
    }
  }

  /** BM25 top-k over a document stream against frozen index stats — see
    * the object doc. Requires the RocksDB state store (transformWithState).
    * Output: (qid, version, rank, doc_id, score_micro) in update mode;
    * the current answer per query is its max-version row set. */
  def bm25TopKStream(
      spark: SparkSession, docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Int, Seq[String])], stats: TextAnalysis.Bm25Frozen,
      k: Int = 5, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    TextAnalysis
      .bm25ScoreFrozen(docs, idCol, textCol, queries, stats, k1, b)
      .selectExpr("CAST(qid AS INT) AS qid", "CAST(doc_id AS BIGINT) AS doc_id",
        "score_micro")
      .as[ScoredHit]
      .groupByKey(_.qid)
      .transformWithState(
        new TopKProcessor(k), TimeMode.None(), OutputMode.Update())
      .toDF("qid", "version", "rank", "doc_id", "score_micro")
  }
}
