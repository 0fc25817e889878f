package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.mesh.Fixtures
import graft.pipeline.Dedup
import graft.streaming.NearDupStream

/** Batch ≡ stream for the near-dup ingest twin: arrivals probed against
  * the STORED band index must find exactly the batch incremental
  * operator's stream-vs-corpus pairs with identical Jaccard scores, under
  * micro-batch cuts AND a replayed slice; a mismatched signature scheme
  * fails loudly at stream setup. */
class NearDupStreamSpec extends AnyFunSuite {

  lazy val spark = TestSessions.spark

  test("near-dup ingest stream == the batch incremental op's cross pairs") {
    import spark.implicits._
    Fixtures.registerRaw(spark, TestSessions.sfDir)
    val docs = spark.table("documents")
    val corpus = docs.where(col("doc_id") % 10 =!= 0)
    val batch = docs.where(col("doc_id") % 10 === 0)
    // the index is STORED state: parquet round-trip like a real ingest
    val dir = java.nio.file.Files.createTempDirectory("graft_ndidx").toString
    Dedup.bandIndex(corpus, "doc_id", "text").write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    // ground truth: the batch ingest restricted to stream-vs-corpus pairs
    // (intra-stream pairs belong to the periodic batch re-index by the
    // twin's documented contract)
    val expected = Dedup
      .incrementalNearDupPairs(batch, corpus, stored, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => (a % 10 == 0) != (b % 10 == 0) }.toSet
    assert(expected.nonEmpty, "fixture produced no cross pair — spec is vacuous")

    val all = batch.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect()
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](spark)
    val src = ms.toDF.toDF("doc_id", "text")
    val q = NearDupStream.nearDupIngestStream(
        spark, src, "doc_id", "text", stored, corpus, "doc_id", "text")
      .writeStream.outputMode("append").format("memory")
      .queryName("nd_stream").start()
    try {
      val cuts = Seq(all.length / 3, 2 * all.length / 3, all.length)
      var from = 0
      cuts.foreach { to =>
        ms.addData(all.slice(from, to).toSeq)
        q.processAllAvailable()
        from = to
      }
      // at-least-once replay: re-send the first third — replayed rows are
      // bit-identical, so the keyed-sink view (the set) must not move
      ms.addData(all.slice(0, all.length / 3).toSeq)
      q.processAllAvailable()
      val got = spark.table("nd_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == expected,
        s"stream=${got.size} batch=${expected.size}; " +
          s"diff ${(got diff expected) ++ (expected diff got)}")
      // per-band duplicate emissions exist but are identical rows — the
      // documented contract: raw rows >= distinct pairs
      assert(spark.table("nd_stream").count() >= got.size)
    } finally q.stop()
    // a mismatched signature scheme fails loudly at setup, never empty
    val e = intercept[IllegalArgumentException] {
      NearDupStream.nearDupIngestStream(
        spark, src, "doc_id", "text", stored, corpus, "doc_id", "text",
        fastHash = true)
    }
    assert(e.getMessage.contains("does not match"))
  }

  test("stored-shingle sidecar serves the stream with identical verdicts") {
    import spark.implicits._
    Fixtures.registerRaw(spark, TestSessions.sfDir)
    val docs = spark.table("documents")
    val corpus = docs.where(col("doc_id") % 10 =!= 0)
    val batch = docs.where(col("doc_id") % 10 === 0)
    val root = java.nio.file.Files.createTempDirectory("graft_ndside").toString
    Dedup.bandIndex(corpus, "doc_id", "text").write.parquet(s"$root/idx")
    // the sidecar is the production serving state: stream SETUP loads it
    // instead of re-shingling the corpus at every (re)start
    Dedup.shingleSetStore(corpus, "doc_id", "text").write.parquet(s"$root/sh")
    val stored = spark.read.parquet(s"$root/idx")
    val sidecar = spark.read.parquet(s"$root/sh")
    val expected = Dedup
      .incrementalNearDupPairs(batch, corpus, stored, "doc_id", "text",
        storedShingles = Some(sidecar))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => (a % 10 == 0) != (b % 10 == 0) }.toSet
    assert(expected.nonEmpty)
    val all = batch.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect()
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](spark)
    val src = ms.toDF.toDF("doc_id", "text")
    val q = NearDupStream.nearDupIngestStream(
        spark, src, "doc_id", "text", stored, corpus, "doc_id", "text",
        storedShingles = Some(sidecar))
      .writeStream.outputMode("append").format("memory")
      .queryName("nd_side_stream").start()
    try {
      ms.addData(all.toSeq)
      q.processAllAvailable()
      val got = spark.table("nd_side_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == expected,
        s"stream=${got.size} batch=${expected.size}; " +
          s"diff ${(got diff expected) ++ (expected diff got)}")
    } finally q.stop()
    // a sidecar built at a different shingle width would verify WRONG
    // Jaccard values — refused loudly at stream setup
    val e = intercept[IllegalArgumentException] {
      NearDupStream.nearDupIngestStream(
        spark, src, "doc_id", "text", stored, corpus, "doc_id", "text",
        storedShingles = Some(Dedup.shingleSets(corpus, "doc_id", "text", n = 2)))
    }
    assert(e.getMessage.contains("does not match"))
  }
}
