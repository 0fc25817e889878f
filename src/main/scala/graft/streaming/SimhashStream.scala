package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** Streaming twin of dd12 (`Dedup.incrementalSimhashPairs`): continuous
  * SIMHASH ingest against the FROZEN stored signature index — documents
  * arrive forever, and each is checked against the already-indexed corpus
  * ON ARRIVAL. Completes streaming parity for ALL THREE stored-index
  * ingest operators (text near-dup / image phash already have twins in
  * `NearDupStream` / `PhashStream`).
  *
  * Shape — STATELESS, pure stream-static:
  *  - the arriving doc's 64-bit signature is computed ROW-LOCALLY inside
  *    a partition-preserving mapPartitions ([[Dedup.simhashOf]] — the
  *    Scala twin of the batch aggregation, same md5 halves, same
  *    physical bit mapping, same majority rule; the batch≡stream spec
  *    pins the values);
  *  - band rows come from the SAME 2-of-`blocks` combination derivation
  *    as the batch paths (`Dedup.simhashBanded` — one implementation, so
  *    a probe can never disagree with the index on bucket values); the
  *    static index's band rows derive ONCE at setup and persist for the
  *    stream's lifetime;
  *  - candidates are a stream-static equi-join on (band, bv);
  *  - verification is a row-local xor+popcount over the signatures both
  *    sides already carry — the corpus text is NEVER read, not even at
  *    setup (signatures are 16 bytes/doc of self-contained serving
  *    state). No aggregation, no watermark, no keyed state: append mode.
  *
  * Emission contract: one (doc_a, doc_b, hamming) row PER SHARED
  * combination of a verified pair; rows for the same pair are
  * bit-identical, so the usual idempotent sink keyed on (doc_a, doc_b)
  * collapses them — the NearDupStream/PhashStream verdict contract.
  * Replay is idempotent the same way. Stream-vs-corpus pairs only:
  * intra-stream near-dups belong to the periodic batch re-index
  * (generations fold forward via `Dedup.appendToSimhashIndex`).
  *
  * Scale shape: per arriving doc the work is one tokenize+digest pass +
  * C(blocks,2) index-bucket probes + one popcount per candidate; the
  * static side is a banded stored table persisted once. Nothing grows
  * with stream lifetime. */
object SimhashStream {

  /** Near-dup verdicts over a streaming document frame against a stored
    * simhash index (`Dedup.simhashIndex` output, sh_scheme-stamped). Output:
    * (doc_a, doc_b, hamming) with doc_a < doc_b — the batch incremental
    * operator's columns. Stream and corpus ids must be disjoint (the
    * incrementalSimhashPairs convention). */
  def simhashIngestStream(
      spark: SparkSession, docs: DataFrame, idCol: String, textCol: String,
      index: DataFrame, blocks: Int = 8, maxHamming: Int = 6): DataFrame = {
    require(maxHamming <= blocks - 2,
      "pigeonhole exhaustiveness needs maxHamming <= blocks - 2")
    require(64 % blocks == 0, "blocks must divide 64")
    // same loud scheme gate as the batch ingest, at stream SETUP (the
    // index is static state; IndexStamp metadata verifies even an empty
    // index): signatures from a mismatched tokenizer/bit mapping would
    // popcount unrelated vectors with no error
    Dedup.requireSimhashScheme(index)
    import spark.implicits._
    // malformed arrivals DROP instead of killing the query: a NULL text
    // would NPE inside simhashOf (the batch twin's explode(split(null))
    // silently drops the doc — same outcome), and a NULL id can never
    // surface a pair anyway (every batch-side join null-drops it). A
    // forever-running ingest must survive exactly these rows.
    val sig = docs
      .where(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) => (id, Dedup.simhashOf(md, text)) }
      }
      .toDF("doc_id", "simhash")
    val banded = Dedup.simhashBanded(sig, blocks)
    // the static side bands ONCE at stream setup and persists — banding
    // is a C(blocks,2)-way explode of the corpus-cardinality index, and
    // a stream-static plan would otherwise re-derive it every micro-batch
    val idxB = Dedup.simhashBanded(
        index.select(col("doc_id"), col("simhash")), blocks)
      .select(col("doc_id").as("__cid"), col("simhash").as("__csim"),
        col("band"), col("bv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    banded.join(idxB, Seq("band", "bv"))
      .where(col("doc_id") =!= col("__cid"))
      .select(least(col("doc_id"), col("__cid")).as("doc_a"),
        greatest(col("doc_id"), col("__cid")).as("doc_b"),
        expr("CAST(bit_count(simhash ^ __csim) AS BIGINT)").as("hamming"))
      .where(col("hamming") <= maxHamming)
  }
}
