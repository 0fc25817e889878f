package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Multimodal
import graft.streaming.PhashStream

/** Batch ≡ stream for the IMAGE ingest twin: arrivals decoded once and
  * probed against the STORED phash band index must find exactly the batch
  * incremental operator's stream-vs-corpus pairs with identical hamming
  * values, under micro-batch cuts AND a replayed slice; a mismatched
  * banding scheme fails loudly at stream setup. */
class PhashStreamSpec extends AnyFunSuite {

  lazy val spark = TestSessions.spark

  // the LibraryApiSpec 12-family corpus: 3 consecutive ids per family,
  // increasing in-family perturbation — families produce hamming-near
  // pairs, cross-family pairs are far
  private def famCorpus: Seq[(Long, Array[Byte])] =
    (0 until 36).map { i =>
      val fam = i / 3
      val bytes = Array.tabulate(96)(j => ((fam * 37 + j * 11) % 251).toByte)
      (0 until (i % 3) * 3).foreach { k =>
        val p = (k * 7) % 96
        bytes(p) = (bytes(p) + 40).toByte
      }
      (i.toLong, bytes)
    }

  private def mediaDs(rs: Seq[(Long, Array[Byte])]) =
    spark.createDataset(rs.map { case (id, b) =>
      Multimodal.MediaRecord(id, Multimodal.encodePng(b),
        Multimodal.MediaMeta("image/png", b.length, 1, 1))
    })(org.apache.spark.sql.Encoders.product[Multimodal.MediaRecord])

  test("phash ingest stream == the batch incremental op's cross pairs") {
    import spark.implicits._
    val recs = famCorpus
    // boundary OFF the family stride so families span the seam and cross
    // pairs exist
    val (corpus, batch) = recs.partition(_._1 < 19)
    val dir = java.nio.file.Files.createTempDirectory("graft_phstream").toString
    Multimodal.phashBandIndex(mediaDs(corpus)).write.parquet(s"$dir/idx")
    val stored = spark.read.parquet(s"$dir/idx")
    // ground truth: the batch ingest restricted to stream-vs-corpus pairs
    // (intra-stream pairs belong to the periodic batch re-index, the
    // NearDupStream division)
    val expected = Multimodal.incrementalPhashPairs(mediaDs(batch), stored)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter { case (a, b, _) => (a < 19) != (b < 19) }.toSet
    assert(expected.nonEmpty, "fixture produced no cross pair — spec is vacuous")

    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Byte])](spark)
    val src = ms.toDF.toDF("doc_id", "payload")
    val q = PhashStream.phashIngestStream(
        spark, src, "doc_id", "payload", stored)
      .writeStream.outputMode("append").format("memory")
      .queryName("ph_stream").start()
    try {
      val arrivals = batch.map { case (id, b) => (id, Multimodal.encodePng(b)) }
      val cuts = Seq(arrivals.length / 3, 2 * arrivals.length / 3, arrivals.length)
      var from = 0
      cuts.foreach { to =>
        ms.addData(arrivals.slice(from, to))
        q.processAllAvailable()
        from = to
      }
      // at-least-once replay: re-sent rows are bit-identical, so the
      // keyed-sink view (the set) must not move
      ms.addData(arrivals.slice(0, arrivals.length / 3))
      q.processAllAvailable()
      val got = spark.table("ph_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected,
        s"stream=${got.size} batch=${expected.size}; " +
          s"diff ${(got diff expected) ++ (expected diff got)}")
      // per-band duplicate emissions are identical rows (the documented
      // contract): raw rows >= distinct pairs
      assert(spark.table("ph_stream").count() >= got.size)
    } finally q.stop()
    // a mismatched banding scheme fails loudly at setup, never empty
    val e = intercept[IllegalArgumentException] {
      PhashStream.phashIngestStream(
        spark, src, "doc_id", "payload", stored, bits = 48, bands = 8)
    }
    assert(e.getMessage.contains("does not match"))
  }
}
