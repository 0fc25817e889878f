package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed batch-wise inside partitions.
  *
  * The Spark-side structure is real and tested — schema, encoders,
  * partition-preserving `mapPartitions` (the Scala analogue of
  * `mapInPandas` batch UDFs), frame sampling over byte ranges. The actual
  * media codec is STUBBED (`decodeStub`): this container has no image/audio
  * libraries, so the "decode" is a deterministic fake (byte histogram) with
  * the same shape a real decoder would produce. Swapping in a real codec
  * changes only the body of `decodeStub`.
  */
object Multimodal {

  final case class MediaMeta(mime: String, width: Int, height: Int, nFrames: Int)
  final case class MediaRecord(doc_id: Long, payload: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(
      doc_id: Long,
      nBytes: Int,
      // 16-bin byte histogram — stands in for a decoded feature vector
      histogram: Array[Double],
      // sampled "frames": fixed-count byte slices of the payload
      frameOffsets: Array[Int])

  /** Wrap the documents table as media records: payload = utf-8 bytes of the
    * text (a stand-in for real image/audio bytes), metadata derived
    * deterministically. */
  def toMediaRecords(spark: SparkSession, documents: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    documents
      .select(
        col("doc_id").cast("long"),
        encode(col("text"), "utf-8").as("payload"),
        struct(
          when(col("lang") === "en", "image/png").otherwise("image/jpeg").as("mime"),
          (col("n_chars") % 640).cast("int").as("width"),
          (col("n_chars") % 480).cast("int").as("height"),
          (col("n_chars") % 16).cast("int").as("nFrames")).as("meta"))
      .as[MediaRecord]
  }

  /** STUB decoder — deterministic fake standing in for e.g. libjpeg/ffmpeg.
    * Real implementation would decode `payload` per `meta.mime`; here we
    * produce a normalized 16-bin byte histogram so downstream feature code
    * is exercised with realistic shapes. */
  def decodeStub(payload: Array[Byte]): Array[Double] = {
    val bins = new Array[Double](16)
    payload.foreach(b => bins((b & 0xff) / 16) += 1.0)
    val n = math.max(payload.length, 1)
    bins.map(_ / n)
  }

  /** Sample up to `meta.nFrames` evenly-spaced byte offsets ("frames"). */
  def sampleFrameOffsets(len: Int, nFrames: Int): Array[Int] =
    if (nFrames <= 0 || len == 0) Array.empty
    else (0 until nFrames).map(i => (i.toLong * len / nFrames).toInt).toArray

  /** STUB resize — deterministic nearest-neighbour downsample of the raw
    * payload to `targetLen` bytes (a real implementation would decode and
    * rescale pixels; the sampling geometry is identical). */
  def resizeStub(payload: Array[Byte], targetLen: Int): Array[Byte] =
    if (payload.isEmpty || targetLen <= 0) Array.empty
    else if (payload.length <= targetLen) payload
    else (0 until targetLen)
      .map(i => payload((i.toLong * payload.length / targetLen).toInt)).toArray

  /** Batch feature extraction — partition-preserving mapPartitions, the
    * shape a 100 TB media pipeline needs: no shuffle, codec state
    * initialized once per partition, rows streamed through. */
  def extractFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // per-partition init point (real codecs allocate decoder state here)
      it.map { r =>
        MediaFeatures(
          r.doc_id,
          r.payload.length,
          decodeStub(r.payload),
          sampleFrameOffsets(r.payload.length, r.meta.nFrames))
      }
    }
  }
}
