package graft.pipeline

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.awt.image.BufferedImage

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed batch-wise inside partitions.
  *
  * The codec is REAL: payloads are PNG images encoded and decoded with
  * `javax.imageio.ImageIO` (stock-JVM codecs — PNG/JPEG/GIF/BMP), so the
  * decode path exercises an actual image library, not a byte fake. Corpus
  * texts are rendered as 1-row grayscale PNGs (pixel i = byte i of the
  * utf-8 text); PNG is lossless, so decoded pixels round-trip exactly and
  * the DuckDB oracle can re-derive every decoded feature from the text —
  * two independent routes (real encode->decode vs char arithmetic), one
  * answer. The pipeline shape is what a 100 TB media corpus needs:
  * partition-preserving `mapPartitions` (the Scala analogue of
  * `mapInPandas` batch UDFs), per-partition codec init, frame sampling.
  */
object Multimodal {

  // ImageIO's default stream factories spill through a TEMP FILE per
  // image; at many-small-frames scale the filesystem round-trip dwarfs
  // the actual codec work. Memory-cache streams everywhere.
  javax.imageio.ImageIO.setUseCache(false)

  final case class MediaMeta(mime: String, width: Int, height: Int, nFrames: Int)
  final case class MediaRecord(doc_id: Long, payload: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(
      doc_id: Long,
      // decoded pixel count (== utf-8 length for the 1-row corpus images)
      nBytes: Int,
      // 16-bin normalized histogram of decoded gray values
      histogram: Array[Double],
      // sampled "frames": evenly-spaced decoded-pixel offsets
      frameOffsets: Array[Int])

  /** Resettable, finalizer-free ImageInputStream over a byte array.
    *
    * The stock `MemoryCacheImageInputStream` carries a `finalize()` and a
    * sun.java2d Disposer record; allocating one PER FRAME at
    * many-small-frames scale floods the single finalizer thread (objects
    * survive an extra GC cycle each, the queue backs up, and every later
    * stage in the same executor JVM degrades — measured: the video
    * transcode got monotonically slower within one bench run). One
    * instance per partition, re-pointed at each frame, never touches the
    * finalizer queue: HotSpot skips finalizer registration for an empty
    * `finalize()` body. */
  final class ByteArrayImageInputStream extends javax.imageio.stream.ImageInputStreamImpl {
    private var buf: Array[Byte] = Array.emptyByteArray
    private var len: Int = 0
    def setBuffer(b: Array[Byte], n: Int): Unit = {
      buf = b; len = n; streamPos = 0; bitOffset = 0
    }
    override def read(): Int =
      if (streamPos >= len) -1
      else { bitOffset = 0; val v = buf(streamPos.toInt) & 0xff; streamPos += 1; v }
    override def read(b: Array[Byte], off: Int, l: Int): Int = {
      if (streamPos >= len) -1
      else {
        bitOffset = 0
        val n = math.min(l, len - streamPos.toInt)
        System.arraycopy(buf, streamPos.toInt, b, off, n)
        streamPos += n
        n
      }
    }
    override def length(): Long = len.toLong
    override def isCached: Boolean = true
    override def isCachedMemory: Boolean = true
    override protected def finalize(): Unit = ()
  }

  /** Resettable, finalizer-free seekable ImageOutputStream over a growable
    * byte array — same rationale as [[ByteArrayImageInputStream]]. */
  final class ByteArrayImageOutputStream extends javax.imageio.stream.ImageOutputStreamImpl {
    private var buf = new Array[Byte](8 * 1024)
    private var len = 0
    def resetBuffer(): Unit = { len = 0; streamPos = 0; bitOffset = 0; flushedPos = 0 }
    def toByteArray: Array[Byte] = java.util.Arrays.copyOf(buf, len)
    private def ensure(cap: Int): Unit =
      if (cap > buf.length)
        buf = java.util.Arrays.copyOf(buf, math.max(cap, buf.length * 2))
    override def write(b: Int): Unit = {
      flushBits()
      val p = streamPos.toInt
      ensure(p + 1)
      buf(p) = b.toByte
      streamPos += 1
      if (streamPos.toInt > len) len = streamPos.toInt
    }
    override def write(b: Array[Byte], off: Int, l: Int): Unit = {
      flushBits()
      val p = streamPos.toInt
      ensure(p + l)
      System.arraycopy(b, off, buf, p, l)
      streamPos += l
      if (streamPos.toInt > len) len = streamPos.toInt
    }
    override def read(): Int =
      if (streamPos >= len) -1
      else { val v = buf(streamPos.toInt) & 0xff; streamPos += 1; v }
    override def read(b: Array[Byte], off: Int, l: Int): Int = {
      if (streamPos >= len) -1
      else {
        val n = math.min(l, len - streamPos.toInt)
        System.arraycopy(buf, streamPos.toInt, b, off, n)
        streamPos += n
        n
      }
    }
    override def length(): Long = len.toLong
    override def isCached: Boolean = true
    override def isCachedMemory: Boolean = true
    override protected def finalize(): Unit = ()
  }

  /** Per-partition PNG codec: ONE reader, ONE writer, ONE stream of each
    * direction, reused across every image in the partition. This is the
    * "init the codec once per task" pattern a 100 TB media pipeline needs —
    * per-image `ImageIO.read`/`write` pays a codec-registry scan plus a
    * finalizable cache stream per call, and both costs scale with image
    * COUNT, not pixels. */
  final class PngCodec {
    private val reader = newPngReader()
    private val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    private val iis = new ByteArrayImageInputStream
    private val ios = new ByteArrayImageOutputStream

    /** Encode as a real 1-row grayscale PNG: pixel i = bytes(i).
      * Empty input yields a single black pixel (PNG has no 0-width). */
    def encode(bytes: Array[Byte]): Array[Byte] = {
      val w = math.max(bytes.length, 1)
      val img = new BufferedImage(w, 1, BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var i = 0
      while (i < bytes.length) { raster.setSample(i, 0, 0, bytes(i) & 0xff); i += 1 }
      encodeImage(img)
    }

    /** Encode an arbitrary BufferedImage through the reusable writer. */
    def encodeImage(img: BufferedImage): Array[Byte] = {
      ios.resetBuffer()
      writer.setOutput(ios)
      writer.write(img)
      ios.toByteArray
    }

    /** Decode to (width, height, gray pixels row-major); single-band
      * rasters read band 0, RGB decodes to integer-mean luminance. */
    def decode(png: Array[Byte]): (Int, Int, Array[Byte]) = {
      iis.setBuffer(png, png.length)
      reader.setInput(iis, true, true)
      val img = reader.read(0)
      val w = img.getWidth; val h = img.getHeight
      val out = new Array[Byte](w * h)
      val raster = img.getRaster
      if (raster.getNumBands == 1) {
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { out(y * w + x) = raster.getSample(x, y, 0).toByte; x += 1 }
          y += 1
        }
      } else {
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            out(y * w + x) =
              ((((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3).toByte
            x += 1
          }
          y += 1
        }
      }
      (w, h, out)
    }

    /** Gray pixels only (band 0) — the hot decode path for corpus images. */
    def decodeGray(png: Array[Byte]): Array[Byte] = decode(png)._3

    def dispose(): Unit = { reader.dispose(); writer.dispose() }
  }

  /** A per-partition codec wired to dispose with the task. */
  def taskPngCodec(): PngCodec = {
    val codec = new PngCodec
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null) tc.addTaskCompletionListener[Unit](_ => codec.dispose())
    codec
  }

  /** One-shot convenience encode (tests / single images) — see [[PngCodec]]
    * for the batch path. */
  def encodePng(bytes: Array[Byte]): Array[Byte] = {
    val c = new PngCodec
    try c.encode(bytes) finally c.dispose()
  }

  /** One-shot REAL decode: (width, height, gray pixels row-major). Batch
    * paths hold a [[PngCodec]] per partition instead. */
  def decodeImage(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
    val c = new PngCodec
    try c.decode(payload) finally c.dispose()
  }

  /** 16-bin normalized histogram over decoded gray values. */
  def grayHistogram(gray: Array[Byte]): Array[Double] = {
    val bins = new Array[Double](16)
    gray.foreach(b => bins((b & 0xff) / 16) += 1.0)
    val n = math.max(gray.length, 1)
    bins.map(_ / n)
  }

  /** Sample up to `nFrames` evenly-spaced decoded-pixel offsets ("frames"). */
  def sampleFrameOffsets(len: Int, nFrames: Int): Array[Int] =
    if (nFrames <= 0 || len == 0) Array.empty
    else (0 until nFrames).map(i => (i.toLong * len / nFrames).toInt).toArray

  /** Perceptual average-hash over decoded pixels: sample `bits`
    * evenly-spaced pixels, threshold each against their mean — the
    * image-dedup primitive (near-identical images agree on most bits,
    * compare with hamming distance like dd6). Returns (hash, mean). */
  def averageHash(gray: Array[Byte], bits: Int = 8): (Long, Double) = {
    require(bits >= 1 && bits <= 63, "bits must be in [1,63]")
    val n = gray.length
    require(n > 0, "cannot hash an empty image")
    val sampled = (0 until bits).map(j => gray(((j.toLong * n) / bits).toInt) & 0xff)
    val mean = sampled.sum.toDouble / bits
    val h = sampled.zipWithIndex.collect { case (v, j) if v > mean => 1L << j }.sum
    (h, mean)
  }

  /** Batch perceptual hashing off the REAL decode path — same
    * partition-preserving mapPartitions shape as feature extraction, with
    * the per-partition reusable reader (per-record ImageIO.read pays a
    * codec-registry scan per image — the dominant cost at many-small-
    * images scale). */
  def imagePhashes(records: Dataset[MediaRecord]): Dataset[(Long, Long, Double)] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      val codec = taskPngCodec()
      it.map { r =>
        val (h, mean) = averageHash(codec.decodeGray(r.payload))
        (r.doc_id, h, mean)
      }
    }
  }

  /** Image-text PAIR MINING — the curation step of a contrastive
    * (CLIP-style) training set build: join each image's perceptual hash
    * (off the REAL decode path, [[imagePhashes]]) with its caption,
    * gate captions on token count, and keep ONE exemplar per
    * (image-phash, exact-caption) duplicate group — the near-dup-image ×
    * duplicate-caption pairs that poison contrastive batches collapse to
    * their lowest-id representative.
    *
    * Scale shape: phashing is partition-preserving mapPartitions over
    * the media corpus; the caption side is a row-local projection; dedup
    * is ONE hash groupBy on (phash, caption-md5) + a semi join back.
    * Nothing quadratic, nothing driver-side. */
  def mineImageTextPairs(media: Dataset[MediaRecord], docs: DataFrame,
      minTokens: Int = 5, maxTokens: Int = 256): DataFrame = {
    import org.apache.spark.sql.functions._
    val ph = imagePhashes(media).toDF("doc_id", "phash", "mean_px")
      .select(col("doc_id"), col("phash"))
    val cap = docs.select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        md5(col("text")).as("cap_md5"))
      .where(col("n_tokens").between(minTokens, maxTokens))
    // ONE consumption of the joined frame: a group-then-semi-join spelling
    // would reference it twice, and the decode subtree feeding `ph` is not
    // materialized — it would re-decode the whole corpus per reference.
    // min over the struct orders by doc_id first (unique), so the
    // aggregate picks the lowest-id exemplar row atomically.
    ph.join(cap, "doc_id")
      .groupBy("phash", "cap_md5")
      .agg(min(struct(col("doc_id"), col("source"), col("n_tokens"))).as("k"))
      .select(col("k.doc_id").as("doc_id"), col("k.source").as("source"),
        col("phash"), col("k.n_tokens").as("n_tokens"))
  }

  /** Image NEAR-DUPLICATE pair mining over perceptual hashes — the visual
    * analogue of dd6's simhash banding: hash every image off the REAL
    * decode path ([[averageHash]] at `bits` samples for enough hamming
    * head-room), split each hash into `bands` equal bit-bands, bucket-join
    * on (band, band-value), and verify candidates with the exact popcount
    * hamming distance. Pigeonhole guarantee: `maxHamming < bands`, so any
    * pair within the threshold agrees on at least one full band and is
    * found by the bucket join — never an all-pairs comparison.
    *
    * Scale shape: decode + hash is partition-preserving mapPartitions;
    * the (doc_id, phash) frame — 16 bytes/row, corpus-cardinality — is
    * localCheckpointed because the self-join references it twice and the
    * decode subtree must not run twice (at warehouse scale it is a stored
    * artifact of the media ingest, like the dedup pair list); banding is
    * a row-local explode; the candidate join is a hash join on the band
    * bucket; verification is row-local integer popcount. Band width
    * scales with hash width — 8-bit bands here, 16-bit on a 64-bit
    * production hash — so bucket cardinality grows with corpus entropy
    * instead of collapsing. */
  def phashNearDupPairs(records: Dataset[MediaRecord], bits: Int = 48,
      bands: Int = 6, maxHamming: Int = 5): DataFrame = {
    require(bits % bands == 0, s"bands ($bands) must divide bits ($bits)")
    require(maxHamming < bands,
      s"pigeonhole needs maxHamming ($maxHamming) < bands ($bands)")
    val bandBits = bits / bands
    val mask = (1L << bandBits) - 1
    val banded = bandedPhash(
      phashFrame(records, bits).localCheckpoint(), bandBits, bands, mask)
    val a = banded.select(col("doc_id").as("doc_a"), col("phash").as("pa"),
      col("band"), col("bv"))
    val b = banded.select(col("doc_id").as("doc_b"), col("phash").as("pb"),
      col("band"), col("bv"))
    a.join(b, Seq("band", "bv"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("pa"), col("pb")).distinct()
      .withColumn("hamming",
        expr("bit_count(pa ^ pb)").cast("long"))
      .where(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Row-local band explode over a (doc_id, phash) frame — shared by the
    * batch self-join, the stored-index build, and the streaming ingest
    * twin ([[graft.streaming.PhashStream]]) so no probe can ever disagree
    * with the index on bucket boundaries. */
  private[graft] def bandedPhash(
      ph: DataFrame, bandBits: Int, bands: Int, mask: Long): DataFrame =
    ph.select(col("doc_id"), col("phash"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("bv", expr(s"shiftright(phash, band * $bandBits) & $mask"))

  /** Decode + hash only: the slim (doc_id, phash) frame — 16 bytes/row,
    * corpus-cardinality — that both the batch self-join and the index
    * build band rows from. */
  private def phashFrame(
      records: Dataset[MediaRecord], bits: Int): DataFrame = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      val codec = taskPngCodec()
      it.map(r => (r.doc_id, averageHash(codec.decodeGray(r.payload), bits)._1))
    }.toDF("doc_id", "phash")
  }

  /** Stored band index of an already-ingested media corpus's perceptual
    * hashes — the incremental-ingest counterpart of [[phashNearDupPairs]],
    * following the text pipeline's stored-band-index discipline
    * (`Dedup.bandIndex` / `incrementalNearDupPairs`): at warehouse scale
    * the corpus decodes and hashes ONCE at ingest, the (doc_id, phash,
    * band, bv) rows persist as a table, and every new batch probes the
    * stored buckets instead of re-decoding the corpus. The index carries
    * its banding scheme (ph_bits, ph_bands): hashes banded under a
    * different scheme never collide, so a silent mismatch would find zero
    * candidates — the probe fails loudly instead. */
  def phashBandIndex(records: Dataset[MediaRecord], bits: Int = 48,
      bands: Int = 6): DataFrame = {
    require(bits % bands == 0, s"bands ($bands) must divide bits ($bits)")
    val bandBits = bits / bands
    val mask = (1L << bandBits) - 1
    // the scheme rides both as data columns and as schema metadata
    // (graft.pipeline.IndexStamp): metadata survives parquet round-trips,
    // so even an EMPTY index stays verifiable at probe time
    bandedPhash(phashFrame(records, bits), bandBits, bands, mask)
      .select(col("doc_id"), col("phash"), col("band"), col("bv"),
        lit(bits).as("ph_bits", IndexStamp.long("ph_bits", bits.toLong)),
        lit(bands).as("ph_bands", IndexStamp.long("ph_bands", bands.toLong)))
  }

  /** Fold a NEW media batch's band rows into a stored phash index — the
    * generation merge a rolling image pipeline needs ([[phashBandIndex]]
    * is written once per generation; without a merge every generation
    * swap would re-decode the whole corpus). Band rows are row-local and
    * append-only, so the merged index is bit-identical to re-banding
    * corpus ∪ batch (MultimodalSpec pins it) at the cost of decoding ONLY
    * the batch. Scheme-validated first (empty-index safe) and restamped
    * on the output. Batch and corpus ids must be disjoint. */
  def appendToPhashIndex(index: DataFrame, batch: Dataset[MediaRecord],
      bits: Int = 48, bands: Int = 6): DataFrame = {
    requirePhashScheme(index, bits, bands)
    index.select(col("doc_id"), col("phash"), col("band"), col("bv"),
        col("ph_bits"), col("ph_bands"))
      .union(phashBandIndex(batch, bits, bands))
      .select(col("doc_id"), col("phash"), col("band"), col("bv"),
        col("ph_bits").as("ph_bits", IndexStamp.long("ph_bits", bits.toLong)),
        col("ph_bands").as("ph_bands", IndexStamp.long("ph_bands", bands.toLong)))
  }

  /** The batch's band rows alone, scheme-validated against the target
    * index — the append-files merge form
    * ([[graft.pipeline.Dedup.bandIndexDeltaFor]]'s media companion):
    * write with mode("append") into the stored index's table for
    * batch-proportional IO; [[appendToPhashIndex]]'s union form rewrites
    * the corpus and exists for one-shot compaction or in-memory merged
    * reads. */
  def phashIndexDeltaFor(index: DataFrame, batch: Dataset[MediaRecord],
      bits: Int = 48, bands: Int = 6): DataFrame = {
    requirePhashScheme(index, bits, bands)
    phashBandIndex(batch, bits, bands)
  }

  /** The loud scheme gate every phash-index probe runs: banding schemes
    * never collide, so a mismatch would silently find zero candidates.
    * Metadata-first ([[IndexStamp]] — works on an EMPTY index), first-row
    * fallback for pre-metadata indexes, loud failure when empty AND
    * unstamped. */
  private def requirePhashScheme(index: DataFrame, bits: Int, bands: Int): Unit = {
    IndexStamp.require(index, "ph_bits", bits.toString, "phash index")
    IndexStamp.require(index, "ph_bands", bands.toString, "phash index")
  }

  /** Incremental image near-dup ingest: hamming-near pairs between a NEW
    * media batch and an already-indexed corpus (plus batch-internal
    * pairs) — corpus-vs-corpus pairs were found at index build and are
    * not recomputed, and ONLY the batch decodes ([[phashBandIndex]] holds
    * the corpus side). Verification is row-local popcount over the
    * phashes both sides already carry — no payload ever re-reads. Batch
    * and corpus ids must be disjoint (the
    * [[graft.pipeline.Dedup.incrementalNearDupPairs]] convention —
    * unvalidated because checking costs a full index scan per ingest; a
    * re-ingested id with CHANGED bytes would carry two phashes and a pair
    * of it could surface twice with different hamming values). Same
    * output contract as
    * [[phashNearDupPairs]]: (doc_a, doc_b, hamming), doc_a < doc_b. */
  def incrementalPhashPairs(batch: Dataset[MediaRecord], index: DataFrame,
      bits: Int = 48, bands: Int = 6, maxHamming: Int = 5,
      bruteForceMaxBatch: Long = 1024L): DataFrame = {
    require(maxHamming < bands,
      s"pigeonhole needs maxHamming ($maxHamming) < bands ($bands)")
    // loud scheme gate, EMPTY-index safe: the former first-row probe
    // skipped validation entirely on a zero-row index, silently yielding
    // only batch-internal pairs under a parameter mismatch
    requirePhashScheme(index, bits, bands)
    // eager localCheckpoint of the SLIM (doc_id, phash) frame — the
    // phashNearDupPairs checkpoint discipline: the batch feeds BOTH sides
    // of the candidate join and the decode subtree must not run twice,
    // but the row-local band explode is free to recompute (checkpointing
    // post-explode would store bands x the rows for nothing)
    require(bits % bands == 0, s"bands ($bands) must divide bits ($bits)")
    val bandBits = bits / bands
    val bsig = phashFrame(batch, bits).localCheckpoint()
    val nBatch = bsig.count() // block scan over the checkpoint
    if (nBatch <= bruteForceMaxBatch) {
      // SMALL-BATCH tier (round 16, the dd12 shape): the batch's hashes
      // (≤ gate × 16 B) collect from the checkpoint blocks and probe ONE
      // stored row per doc — the index's band-0 rows, a row-local filter
      // instead of a corpus distinct — through the codegen'd
      // HammingMatches literal kernel: ≤ |batch| xor+popcounts per
      // stored row, allocation only on matches, zero band explode, zero
      // join machinery (a broadcast nested-loop spelling evaluated its
      // condition interpreted per pair and A/B'd SLOWER on mm10).
      // Batch-internal pairs are ≤ gate² driver popcounts. Identical
      // pair set to the banded tier (pigeonhole exhaustiveness at
      // hamming < bands; both post-filter at maxHamming — spec-pinned).
      // Past the gate the pigeonhole banding below keeps per-stored-row
      // work constant in |batch|.
      val sess = batch.sparkSession
      import sess.implicits._
      val rows = bsig.collect() // second block scan, no recompute
      val ids = rows.map(_.getLong(0))
      val hs = rows.map(_.getLong(1))
      val internal = for {
        i <- ids.indices.iterator
        j <- (i + 1) until ids.length
        h = java.lang.Long.bitCount(hs(i) ^ hs(j))
        if h <= maxHamming && ids(i) != ids(j)
      } yield (math.min(ids(i), ids(j)), math.max(ids(i), ids(j)), h.toLong)
      val internalDf = internal.toSeq.toDF("doc_a", "doc_b", "hamming")
      index.where(col("band") === 0)
        .select(col("doc_id"),
          explode(graft.functions.HashFunctions.hamming_matches(
            col("doc_id"), col("phash"), ids, hs, maxHamming)).as("m"))
        .select(least(col("doc_id"), col("m.mid")).as("doc_a"),
          greatest(col("doc_id"), col("m.mid")).as("doc_b"),
          col("m.hamming").as("hamming"))
        .union(internalDf)
        .distinct()
    } else {
      val bi = bandedPhash(bsig, bandBits, bands, (1L << bandBits) - 1)
      val all = index.select(col("doc_id"), col("phash"), col("band"), col("bv"))
        .union(bi)
      bi.as("a").join(all.as("b"),
          col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
            col("a.doc_id") =!= col("b.doc_id"))
        // normalize pair order (a cross pair may arrive with the larger id on
        // the batch side) and keep each side's phash aligned with the order
        .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
          greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"),
          when(col("a.doc_id") < col("b.doc_id"), col("a.phash"))
            .otherwise(col("b.phash")).as("pa"),
          when(col("a.doc_id") < col("b.doc_id"), col("b.phash"))
            .otherwise(col("a.phash")).as("pb"))
        .distinct()
        .withColumn("hamming", expr("bit_count(pa ^ pb)").cast("long"))
        .where(col("hamming") <= maxHamming)
        .select(col("doc_a"), col("doc_b"), col("hamming"))
    }
  }

  /** Real image resize: decode, nearest-neighbour sample each row to
    * `targetW` columns (column i reads source column i*w/targetW), re-encode
    * as PNG. Images at or under `targetW` pass through re-encoded. */
  def resizeImage(payload: Array[Byte], targetW: Int): Array[Byte] = {
    require(targetW > 0, "targetW must be positive")
    val c = new PngCodec
    try {
      val (w, h, gray) = c.decode(payload)
      val outW = math.min(w, targetW)
      val img = new BufferedImage(outW, h, BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < outW) {
          val srcX = if (w <= targetW) x else ((x.toLong * w) / targetW).toInt
          raster.setSample(x, y, 0, gray(y * w + srcX) & 0xff)
          x += 1
        }
        y += 1
      }
      c.encodeImage(img)
    } finally c.dispose()
  }

  /** Wrap the documents table as media records: payload = a REAL PNG image
    * of the utf-8 text (1-row grayscale; lossless round-trip), metadata
    * derived deterministically. Encoding runs per-partition on executors —
    * the same distribution an ingest-time media transcode would have. */
  def toMediaRecords(spark: SparkSession, documents: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    documents
      .select(
        col("doc_id").cast("long").as("_1"),
        encode(col("text"), "utf-8").as("_2"),
        (col("n_chars") % 16).cast("int").as("_3"))
      .as[(Long, Array[Byte], Int)]
      .mapPartitions { it =>
        val codec = taskPngCodec()
        it.map { case (id, bytes, nFrames) =>
          MediaRecord(id, codec.encode(bytes),
            MediaMeta("image/png", math.max(bytes.length, 1), 1, nFrames))
        }
      }
  }

  // ------------------------------------------------------------------
  // Video: an MJPEG-style container — length-prefixed PNG frames — with
  // stride-based frame sampling. The container and every frame are REAL
  // (ImageIO encodes/decodes each frame); only the source of the pixel
  // bytes (corpus text) is synthetic, which keeps the oracle independent.

  final case class VideoRecord(doc_id: Long, payload: Array[Byte], nFrames: Int)
  final case class VideoFrameStats(
      doc_id: Long,
      nFrames: Int,
      nSampled: Int,
      // decoded pixel count and sum across the SAMPLED frames only
      sampledBytes: Long,
      sampledSum: Long)

  /** Frame width (pixels per 1-row frame) used by the corpus videos. */
  val FrameWidth = 16

  /** Pack `bytes` into a length-prefixed-PNG container: frame f holds
    * bytes [f*FrameWidth, (f+1)*FrameWidth) as a 1-row grayscale PNG
    * (the last frame may be narrower). Empty input yields an empty
    * container (zero frames) — matching the oracle's ceil(len/16). */
  def encodeVideo(bytes: Array[Byte]): (Array[Byte], Int) = {
    val c = new PngCodec
    try encodeVideo(bytes, c) finally c.dispose()
  }

  /** Codec-reusing variant for per-partition batch transcode. */
  def encodeVideo(bytes: Array[Byte], codec: PngCodec): (Array[Byte], Int) = {
    val n = (bytes.length + FrameWidth - 1) / FrameWidth
    val bos = new ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    var f = 0
    while (f < n) {
      val from = f * FrameWidth
      val until = math.min(from + FrameWidth, bytes.length)
      val png = codec.encode(
        java.util.Arrays.copyOfRange(bytes, from, math.max(until, from)))
      out.writeInt(png.length)
      out.write(png)
      f += 1
    }
    (bos.toByteArray, n)
  }

  /** A reusable PNG ImageReader — `ImageIO.read` searches the codec
    * registry and allocates a fresh reader per call, which dominates at
    * many-small-frames scale; a per-partition reader is the real
    * "codec init once per partition" pattern. */
  def newPngReader(): javax.imageio.ImageReader =
    javax.imageio.ImageIO.getImageReadersByFormatName("png").next()

  /** Decode every `stride`-th frame of a container (frame 0, stride,
    * 2*stride, ...) through the REAL ImageIO path; skipped frames are not
    * decoded (the point of frame sampling — at 100 TB the codec work is
    * the cost, so it must scale with frames KEPT, not frames stored). */
  def decodeSampledFrames(payload: Array[Byte], stride: Int): Seq[Array[Byte]] = {
    val c = new PngCodec
    try decodeSampledFrames(payload, stride, c)
    finally c.dispose()
  }

  /** Codec-reusing variant for per-partition batch decode. */
  def decodeSampledFrames(
      payload: Array[Byte], stride: Int, codec: PngCodec): Seq[Array[Byte]] = {
    require(stride > 0, "stride must be positive")
    val in = new java.io.DataInputStream(new ByteArrayInputStream(payload))
    val frames = Seq.newBuilder[Array[Byte]]
    var f = 0
    while (in.available() >= 4) {
      val len = in.readInt()
      if (f % stride == 0) {
        val png = new Array[Byte](len)
        in.readFully(png)
        frames += codec.decodeGray(png)
      } else {
        // skipped frames are not copied either — container-parse cost
        // scales with frames kept (skipBytes is O(1) on a byte stream)
        in.skipBytes(len)
      }
      f += 1
    }
    frames.result()
  }

  /** Corpus videos: text bytes chunked into FrameWidth-pixel PNG frames.
    * Encoding runs per-partition on executors, like an ingest transcode. */
  def toVideoRecords(spark: SparkSession, documents: DataFrame): Dataset[VideoRecord] = {
    import spark.implicits._
    documents
      .select(col("doc_id").cast("long").as("_1"), encode(col("text"), "utf-8").as("_2"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val codec = taskPngCodec()
        it.map { case (id, bytes) =>
          val (payload, n) = encodeVideo(bytes, codec)
          VideoRecord(id, payload, n)
        }
      }
  }

  /** Frame-sampled decode stats — partition-preserving mapPartitions, one
    * container parsed per row, only sampled frames hit the decoder. */
  def sampleVideoStats(records: Dataset[VideoRecord], stride: Int): Dataset[VideoFrameStats] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // codec init once per partition; rows stream through the one codec
      val codec = taskPngCodec()
      it.map { r =>
        val frames = decodeSampledFrames(r.payload, stride, codec)
        var bytes = 0L
        var sum = 0L
        frames.foreach { g =>
          bytes += g.length
          var i = 0
          while (i < g.length) { sum += g(i) & 0xff; i += 1 }
        }
        VideoFrameStats(r.doc_id, r.nFrames, frames.length, bytes, sum)
      }
    }
  }

  // ------------------------------------------------------------------
  // Audio: REAL WAV (RIFF/PCM16) via javax.sound.sampled — a stock-JVM
  // audio codec, so encode -> AudioSystem decode exercises an actual
  // container parser. Sample i = (byte i of the text - 100) << 8: full
  // 16-bit dynamic range, sign flips between letters and spaces, and —
  // because PCM is lossless — the oracle re-derives every feature from
  // the characters.

  final case class AudioRecord(doc_id: Long, payload: Array[Byte], sampleRate: Int)
  final case class AudioFeatures(
      doc_id: Long,
      nSamples: Long,
      sumAmp: Long, // exact integer sum of samples
      peak: Long, // max |sample|
      zeroCross: Long, // strict sign changes between consecutive samples
      sumSq: Long) // exact integer sum of sample^2 (for RMS)

  /** Sample value for one corpus byte (ASCII: letters ≈ smallish positive,
    * space strongly negative — guaranteed sign structure). Values clip at
    * Short.MaxValue like any PCM pipeline — bytes >= 228 (e.g. UTF-8 lead
    * bytes) would otherwise overflow int16 and sign-wrap on decode. */
  @inline def sampleOf(b: Byte): Int = math.min(((b & 0xff) - 100) << 8, 32767)

  /** Encode bytes as a real mono 16-bit little-endian PCM WAV container. */
  def encodeWav(bytes: Array[Byte], sampleRate: Int = 8000): Array[Byte] = {
    val pcm = new Array[Byte](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val s = sampleOf(bytes(i))
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val stream = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, bytes.length.toLong)
    val bos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      stream, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** The platform WAVE reader resolved ONCE (ServiceLoader): calling
    * `AudioSystem.getAudioInputStream` per payload re-runs a
    * SYNCHRONIZED provider lookup per call, which serializes a 32-thread
    * decode stage almost completely (measured: 12.2 s task time, 0.6 s
    * CPU — 95% lock wait). The provider instance itself is stateless;
    * batch paths call it directly.
    *
    * Selection is by PROBING, not by class name: OpenJDK registers
    * several providers whose names contain "wave" (WaveFloatFileReader,
    * WaveExtensibleFileReader) that reject the PCM16 containers
    * [[encodeWav]] produces, and ServiceLoader order is unspecified — so
    * each candidate is tried against a real sample payload and the first
    * that decodes it wins (AudioSystem's own try-next-provider loop,
    * done once instead of per call). */
  private lazy val wavReader: javax.sound.sampled.spi.AudioFileReader = {
    val probe = encodeWav(Array[Byte](0, 1, 2, 3))
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    var r: javax.sound.sampled.spi.AudioFileReader = null
    while (it.hasNext && r == null) {
      val cand = it.next()
      try {
        cand.getAudioInputStream(new ByteArrayInputStream(probe)).close()
        r = cand
      } catch { case _: Exception => () }
    }
    require(r != null,
      "no AudioFileReader provider on this JVM accepts PCM16 WAVE")
    r
  }

  /** REAL decode via the platform WAVE provider: parse the WAV
    * container, return the int16 samples. Format is validated, not
    * assumed. */
  def decodeWav(payload: Array[Byte]): Array[Int] = {
    val in = wavReader.getAudioInputStream(
      new ByteArrayInputStream(payload))
    val fmt = in.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian,
      s"unexpected WAV format: $fmt")
    val raw = in.readAllBytes()
    val out = new Array[Int](raw.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = ((raw(2 * i + 1) << 8) | (raw(2 * i) & 0xff))
      i += 1
    }
    out
  }

  /** Corpus audio: text bytes as PCM16 WAVs, encoded on executors. */
  def toAudioRecords(spark: SparkSession, documents: DataFrame): Dataset[AudioRecord] = {
    import spark.implicits._
    documents
      .select(col("doc_id").cast("long").as("_1"), encode(col("text"), "utf-8").as("_2"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, bytes) => AudioRecord(id, encodeWav(bytes), 8000) })
  }

  /** Signal features off the REAL decode path — mapPartitions, exact
    * integer accumulators so results are engine-reproducible. */
  def extractAudioFeatures(records: Dataset[AudioRecord]): Dataset[AudioFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        val s = decodeWav(r.payload)
        var sum = 0L; var sumSq = 0L; var peak = 0L; var zc = 0L
        var i = 0
        while (i < s.length) {
          val v = s(i)
          sum += v
          sumSq += v.toLong * v
          if (math.abs(v) > peak) peak = math.abs(v)
          if (i > 0 && ((s(i - 1) < 0 && v > 0) || (s(i - 1) > 0 && v < 0))) zc += 1
          i += 1
        }
        AudioFeatures(r.doc_id, s.length.toLong, sum, peak, zc, sumSq)
      }
    }
  }

  /** Batch feature extraction — partition-preserving mapPartitions over a
    * REAL ImageIO decode: no shuffle, codec state per partition, rows
    * streamed through. Features are derived from the decoded pixels. */
  def extractFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // per-partition init point (ImageIO registry lookup, decoder state)
      val codec = taskPngCodec()
      it.map { r =>
        val (w, h, gray) = codec.decode(r.payload)
        MediaFeatures(
          r.doc_id,
          w * h,
          grayHistogram(gray),
          sampleFrameOffsets(w * h, r.meta.nFrames))
      }
    }
  }
}
