package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{IndexStamp, Multimodal}

/** Streaming twin of mm9 (`Multimodal.incrementalPhashPairs`): continuous
  * IMAGE ingest against the FROZEN stored phash band index — images arrive
  * forever, and each is checked against the already-indexed media corpus ON
  * ARRIVAL. Completes streaming parity for the stored-index ingest triad
  * (text near-dups got their twin in `NearDupStream`; exact dedup, BM25,
  * and filtered-IVF ANN were already served streaming).
  *
  * Shape — STATELESS, pure stream-static:
  *  - each arriving image DECODES ONCE, inside a partition-preserving
  *    `mapPartitions` with a per-partition codec (the batch ingest's
  *    decode-once discipline — a stream's parallelism comes from its
  *    source, and the codec never re-initializes per row);
  *  - band rows come from the SAME derivation the stored index was built
  *    with (`Multimodal.bandedPhash` — one implementation, so a probe can
  *    never disagree with the index on bucket boundaries);
  *  - candidates are a stream-static equi-join on (band, bv);
  *  - verification is a row-local xor+popcount over the phashes both
  *    sides already carry — no payload ever re-reads, no aggregation, no
  *    watermark, no keyed state: append mode end to end.
  *
  * Emission contract: one (doc_a, doc_b, hamming) row PER SHARED BAND of a
  * verified pair (deduplicating in-stream would need keyed state for a
  * value that is already deterministic); rows for the same pair are
  * bit-identical, so the usual idempotent sink keyed on (doc_a, doc_b)
  * collapses them — the DedupStream/NearDupStream verdict contract. Replay
  * is idempotent the same way. Stream-vs-corpus pairs only: intra-stream
  * near-dups belong to the periodic batch re-index (arrivals are admitted
  * against the current index GENERATION; generations swap atomically, and
  * `Multimodal.appendToPhashIndex` folds an admitted batch into the next
  * generation without re-decoding the corpus).
  *
  * Scale shape: per arriving image the work is one decode + hash, `bands`
  * index-bucket probes, and a popcount per candidate. The static side is a
  * hash-joinable stored table; nothing grows with stream lifetime. */
object PhashStream {

  /** Near-dup verdicts over a streaming image frame (`idCol` long-castable
    * id, `payloadCol` binary image bytes) against a stored phash band
    * index (`Multimodal.phashBandIndex` output, scheme-stamped). Output:
    * (doc_a, doc_b, hamming) with doc_a < doc_b — the batch incremental
    * operator's columns. Stream and corpus ids must be disjoint (the
    * incrementalPhashPairs convention). */
  def phashIngestStream(
      spark: SparkSession, images: DataFrame, idCol: String, payloadCol: String,
      index: DataFrame, bits: Int = 48, bands: Int = 6,
      maxHamming: Int = 5): DataFrame = {
    require(bits % bands == 0, s"bands ($bands) must divide bits ($bits)")
    require(maxHamming < bands,
      s"pigeonhole needs maxHamming ($maxHamming) < bands ($bands)")
    // same loud scheme gate as the batch ingest, at stream SETUP (the
    // index is static state): metadata-first, so even an empty index
    // verifies — a banding mismatch would silently find zero candidates
    IndexStamp.require(index, "ph_bits", bits.toString, "phash index")
    IndexStamp.require(index, "ph_bands", bands.toString, "phash index")
    import spark.implicits._
    // decode + hash once per arrival; codec per PARTITION, not per row
    // (the ImageIO init and finalizer discipline of the batch path).
    // Malformed arrivals (NULL id/payload) DROP instead of NPE-killing
    // the continuous query — the SimhashStream/NearDupStream contract.
    val ph = images
      .where(col(idCol).isNotNull && col(payloadCol).isNotNull)
      .select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val codec = Multimodal.taskPngCodec()
        it.map { case (id, payload) =>
          (id, Multimodal.averageHash(codec.decodeGray(payload), bits)._1)
        }
      }
      .toDF("doc_id", "phash")
    val bandBits = bits / bands
    val banded = Multimodal.bandedPhash(ph, bandBits, bands, (1L << bandBits) - 1)
    val idx = index.select(col("doc_id").as("__cid"),
      col("phash").as("__cph"), col("band"), col("bv"))
    banded.join(idx, Seq("band", "bv"))
      .where(col("doc_id") =!= col("__cid"))
      // normalize pair order and keep each side's phash aligned with it
      // (a cross pair may arrive with the larger id on the stream side)
      .select(least(col("doc_id"), col("__cid")).as("doc_a"),
        greatest(col("doc_id"), col("__cid")).as("doc_b"),
        when(col("doc_id") < col("__cid"), col("phash"))
          .otherwise(col("__cph")).as("pa"),
        when(col("doc_id") < col("__cid"), col("__cph"))
          .otherwise(col("phash")).as("pb"))
      .withColumn("hamming", expr("bit_count(pa ^ pb)").cast("long"))
      .where(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }
}
