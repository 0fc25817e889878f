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
  final case class ScoredHit(qid: Long, doc_id: Long, score_micro: Long)

  /** Per-query bounded top-k maintenance: merge the batch's hits into the
    * stored k-best (dedup by doc id — replay-idempotent), and on any
    * change emit the FULL new top-k as (qid, version, rank, doc_id,
    * score_micro) rows; consumers read the max version per qid. State is
    * exactly k entries per query — no TTL needed, it cannot grow. Shared
    * by the BM25 twin and the ANN twin: both serve a fixed query set
    * against frozen index state, so the keyed stage is identical. */
  private class TopKProcessor(k: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, ScoredHit, (Long, Long, Int, Long, Long)] {
    import org.apache.spark.sql.streaming.{TimerValues, TTLConfig, ValueState}

    @transient private var st: ValueState[TopKState] = _

    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[TopKState]("topk",
        org.apache.spark.sql.Encoders.product[TopKState], TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[ScoredHit],
        timerValues: TimerValues): Iterator[(Long, Long, Int, Long, Long)] = {
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

  /** The shared keyed tail of both serving twins: per-query bounded top-k
    * over a stream of (qid, doc_id, score_micro) hits. */
  private def topKStream(
      spark: SparkSession, hits: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    hits.as[ScoredHit]
      .groupByKey(_.qid)
      .transformWithState(
        new TopKProcessor(k), TimeMode.None(), OutputMode.Update())
      .toDF("qid", "version", "rank", "doc_id", "score_micro")
  }

  /** BM25 top-k over a document stream against frozen index stats — see
    * the object doc. Requires the RocksDB state store (transformWithState).
    * Output: (qid, version, rank, doc_id, score_micro) in update mode;
    * the current answer per query is its max-version row set. */
  def bm25TopKStream(
      spark: SparkSession, docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Int, Seq[String])], stats: TextAnalysis.Bm25Frozen,
      k: Int = 5, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val hits = TextAnalysis
      .bm25ScoreFrozen(docs, idCol, textCol, queries, stats, k1, b)
      .selectExpr("CAST(qid AS BIGINT) AS qid",
        "CAST(doc_id AS BIGINT) AS doc_id", "score_micro")
    topKStream(spark, hits, k)
      // preserve the historical schema: BM25 query ids are small ints
      .selectExpr("CAST(qid AS INT) AS qid", "version", "rank", "doc_id",
        "score_micro")
  }

  /** Streaming twin of ss10 (filtered IVF ANN serving): vectors arrive on
    * a stream and are scored ROW-LOCALLY against the FROZEN IVF index
    * ([[graft.pipeline.Similarity.ivfFilteredFrozen]] — seeded centroids
    * + each query's vector/label/probed cells), then the shared
    * [[TopKProcessor]] maintains each query's top-k. The serving split
    * mirrors the BM25 twin exactly: index state is stored model state
    * refreshed by a periodic batch build; arriving vectors never shuffle
    * the corpus — per row it is one k-centroid cell assignment (the
    * codegen'd VectorCosScores kernel, identical rounded-cosine +
    * lowest-cid-tie arithmetic as the batch coarse quantizer) plus one
    * cosine per query whose probe set covers the cell and whose label
    * filter passes. Hits carry cos quantized to 1e-6 micro integers
    * (round(cos·1e6) of the already-6-dp cosine — exact), ranked
    * (score DESC, doc ASC) = the batch plan's (cos DESC, vec_id ASC).
    * Replay-idempotent: scores are deterministic and the top-k merge
    * dedups by vec id. Requires the RocksDB state store. */
  def ivfFilteredTopKStream(
      spark: SparkSession, vecs: DataFrame,
      idCol: String, vecCol: String, labelCol: String,
      cents: Seq[(Long, Seq[Float], Double)],
      queries: Seq[graft.pipeline.Similarity.IvfQueryFrozen],
      k: Int = 5): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions.{vec_dot => dot}
    require(cents.nonEmpty && queries.nonEmpty,
      "ivfFilteredTopKStream needs frozen centroids and >= 1 query")
    val v = vecs.select(col(idCol).cast("long").as("vec_id"),
        col(vecCol).as("__v"), col(labelCol).cast("long").as("__lab"))
      .withColumn("nrm", sqrt(dot(col("__v"), col("__v"))))
      // drop zero-norm arrivals BEFORE the kernel: they have no cosine
      // direction, and VectorCosScores' exact-round path throws on the
      // NaN a 0/0 produces (BigDecimal has no NaN) — on a long-running
      // serving query that would kill the stream, not one row
      .where(col("nrm") > 0)
    // cell assignment: k rounded cosines against the frozen centroid
    // matrix, first-max-wins — cents are id-ordered, so array_position
    // picks the lowest cid on ties, exactly the batch nearestCells order
    val scores = graft.functions.VectorFunctions.vec_cos_scores(
      col("__v"), col("nrm"),
      cents.map(_._2.toIndexedSeq).toIndexedSeq, cents.map(_._3))
    val cidArr = array(cents.map(c => lit(c._1)): _*)
    val assigned = v.withColumn("__cell",
      element_at(cidArr, array_position(scores, array_max(scores)).cast("int")))
    // all query dots in ONE VectorScores kernel: the query matrix rides
    // as a single reference object instead of queries × dim lit() nodes —
    // the same analysis/codegen-mass fix the batch assignment paths use
    // (large frozen query sets would otherwise bloat every micro-batch's
    // plan). Element i is bit-identical to dot(qv_i, __v): float multiply
    // commutes and both spellings accumulate by index.
    val qDots = graft.functions.VectorFunctions.vec_scores(
      col("__v"), queries.map(_.qv.toIndexedSeq), queries.map(_ => 0.0))
    // per-query scoring struct: null unless the vector's cell is probed,
    // the label filter passes, and the vector is not the query itself
    val perQ = queries.zipWithIndex.map { case (q, i) =>
      val cond = col("__cell").isin(q.probed: _*) &&
        col("__lab") =!= lit(q.qlab) && col("vec_id") =!= lit(q.qid)
      val cos = round(
        element_at(col("__qd"), i + 1) / (lit(q.qn) * col("nrm")), 6)
      struct(lit(q.qid).as("qid"), when(cond, cos).as("cos"))
    }
    val hits = assigned.withColumn("__qd", qDots)
      .select(col("vec_id"), explode(array(perQ: _*)).as("qs"))
      .where(col("qs.cos").isNotNull)
      .select(col("qs.qid").as("qid"), col("vec_id").as("doc_id"),
        round(col("qs.cos") * lit(1000000.0)).cast("long").as("score_micro"))
    topKStream(spark, hits, k)
  }
}
