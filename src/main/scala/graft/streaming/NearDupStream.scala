package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** Streaming twin of dd11 (`Dedup.incrementalNearDupPairs`): continuous
  * NEAR-DUP ingest against the FROZEN stored band index — documents arrive
  * forever, and each is checked against the already-indexed corpus ON
  * ARRIVAL. Completes the frozen-index serving triad (exact dedup / BM25 /
  * filtered-IVF ANN already have streaming twins): index state is written
  * once per corpus build; arrivals never reshuffle or re-hash the corpus.
  *
  * Shape — STATELESS, pure stream-static:
  *  - the arriving doc's band rows come from the SAME projection the
  *    stored index was built with (`Dedup.bandProject` — one derivation,
  *    so a probe can never disagree with the index on bucket boundaries),
  *    with the doc's text riding the projection's tag column;
  *  - candidates are a stream-static equi-join on (band, bsig);
  *  - verification is EXACT Jaccard computed ROW-LOCALLY: the candidate
  *    row joins the static corpus table for the matched doc's text and
  *    both shingle sets reduce through array_distinct/array_intersect —
  *    the same set arithmetic as the batch verifier
  *    (`Dedup.jaccardVerifySets`), so scores are engine-exact. No
  *    aggregation, no watermark, no keyed state: append mode end to end.
  *
  * Emission contract: one (doc_a, doc_b, jaccard) row PER SHARED BAND of
  * a verified pair (deduplicating in-stream would need keyed state for a
  * value that is already deterministic); rows for the same pair are
  * bit-identical, so the usual idempotent sink keyed on (doc_a, doc_b)
  * collapses them — the DedupStream verdict contract. Replay is
  * idempotent the same way. Stream-vs-corpus pairs only: intra-stream
  * near-dups belong to the periodic batch re-index (the same division a
  * production pipeline draws — arrivals are admitted against the current
  * index GENERATION; generations swap atomically).
  *
  * Scale shape: per arriving doc the work is one row-local signature
  * projection + `bands` index-bucket probes + one corpus-row lookup per
  * candidate. The static sides are hash-joinable stored tables; nothing
  * grows with stream lifetime. */
object NearDupStream {

  /** Near-dup verdicts over a streaming document frame against a stored
    * band index (`Dedup.bandIndex` output, hash_family-stamped) and the
    * static corpus table it indexes. Output: (doc_a, doc_b, jaccard)
    * with doc_a < doc_b, jaccard rounded to 4 decimals — the batch
    * incremental operator's columns. Stream and corpus ids must be
    * disjoint (the incrementalNearDupPairs convention).
    *
    * `storedShingles` (the `Dedup.shingleSets` sidecar written beside the
    * band index — the production shape) makes stream SETUP corpus-free:
    * the verification sets load straight from stored state, so a stream
    * (re)start never pays a corpus text-shingling pass. Without it the
    * sets derive from the corpus table once at setup (correct, but each
    * restart re-shingles the corpus to rebuild serving state the sidecar
    * would have held). */
  def nearDupIngestStream(
      spark: SparkSession, docs: DataFrame, idCol: String, textCol: String,
      index: DataFrame, corpus: DataFrame,
      corpusIdCol: String, corpusTextCol: String,
      k: Int = 12, bands: Int = 4, threshold: Double = 0.8,
      fastHash: Boolean = false,
      storedShingles: Option[DataFrame] = None): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    // same loud scheme gate as the batch ingest (IndexStamp: metadata
    // first, so even an empty index verifies): a mismatched signature
    // family finds zero candidates with no error otherwise. The index is
    // STATIC state, so the probe runs at stream setup, not per
    // micro-batch. A mismatched shingle width would yield silently WRONG
    // Jaccard values — the sidecar's stamp is gated the same way.
    Dedup.requireBandScheme(index, k, bands, fastHash)
    storedShingles.foreach(graft.pipeline.IndexStamp.require(
      _, "shingle_n", Dedup.ShingleN.toString, "shingle-set sidecar"))
    def shingles(c: Column): Column =
      array_distinct(graft.functions.TextFunctions.word_ngrams(c, Dedup.ShingleN))
    // band rows with the arriving doc's SHINGLE SET riding the tag column
    // (computed at banding — per-arrival cost, never per-candidate);
    // zero-gram docs drop inside the shared projection, exactly like the
    // index build
    val banded = Dedup.bandProject(
      docs.select(col(idCol).cast("long").as("__did"),
        col(textCol).as("__dtext"),
        shingles(col(textCol)).as("__dsh")),
      "__did", "__dtext", k, bands, fastHash, tagCol = Some("__dsh"))
    val idx = index.select(col("__id").as("__cid"), col("band"), col("bsig"))
    // corpus shingle sets are STATIC serving state: loaded from the
    // stored sidecar when present (no corpus pass at all), else derived
    // once at setup; persisted for the stream's lifetime either way —
    // never recomputed per candidate row per micro-batch
    val corp = storedShingles
      .map(_.select(col("__id").cast("long").as("__cid"), col("__sh").as("__sb")))
      .getOrElse(corpus.select(col(corpusIdCol).cast("long").as("__cid"),
        shingles(col(corpusTextCol)).as("__sb")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // COVERAGE gate at setup (the batch ingest's companion gate): the
    // width stamp proves HOW the serving sets were built, not that they
    // cover the index — an index delta appended without its sidecar
    // companion (or an index over docs missing from the corpus table)
    // would make the verify join below silently drop every pair of the
    // missing docs for the stream's whole LIFETIME. One anti-join probe
    // of the index's doc ids against the serving set frame, paid once at
    // (re)start — exactly when a generation swap could introduce the hole.
    // ONE take(1) — not isEmpty + head, which would run the anti-join
    // twice; on failure the just-materialized serving cache is released
    // before throwing, so a supervisor retrying (re)starts against a
    // stale sidecar does not accumulate corpus-sized cache entries
    val missing = index.select(col("__id").cast("long").as("__cid")).distinct()
      .join(corp, Seq("__cid"), "left_anti")
      .take(1)
    if (missing.nonEmpty) {
      corp.unpersist()
      throw new IllegalStateException(
        "near-dup serving state does not cover every indexed document " +
          "(e.g. " + missing(0).get(0) + ") — the band index and the " +
          "shingle source are out of sync (a delta append folded the index " +
          "but not the sidecar?); re-append the missing generation")
    }
    banded.join(idx, Seq("band", "bsig"))
      .where(col("__id") =!= col("__cid"))
      .join(corp, Seq("__cid"))
      .withColumn("__i", size(array_intersect(col("__tag"), col("__sb"))))
      // filter on the EXACT quotient and round only for emission — the
      // batch verifier's order (a pair at 0.79996 must not round up into
      // admission)
      .withColumn("__j", col("__i").cast("double") /
        (size(col("__tag")) + size(col("__sb")) - col("__i")))
      .where(col("__j") >= threshold)
      .select(least(col("__id"), col("__cid")).as("doc_a"),
        greatest(col("__id"), col("__cid")).as("doc_b"),
        round(col("__j"), 4).as("jaccard"))
  }
}
