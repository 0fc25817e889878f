package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.mesh.Fixtures
import graft.pipeline.Dedup
import graft.streaming.SimhashStream

/** Batch ≡ stream for the SIMHASH ingest twin: arrivals signed row-locally
  * and probed against the STORED signature index must find exactly the
  * batch incremental operator's stream-vs-corpus pairs with identical
  * hamming values, under micro-batch cuts AND a replayed slice. The spec
  * also pins the shared signature kernel against golden literals and a
  * spec-local independent md5-hex derivation — batch and stream share ONE
  * kernel (SimhashSig), so value correctness needs an outside witness. */
class SimhashStreamSpec extends AnyFunSuite {

  lazy val spark = TestSessions.spark

  /** INDEPENDENT re-derivation of the documented signature contract —
    * "bit b of a token's contribution is bit (3 - b%4) of hex char
    * (b div 4) of its md5; majority over the raw token multiset" — via
    * the hex-string route, sharing no byte-packing code with
    * [[graft.functions.SimhashSig]]. */
  private def refSimhash(text: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val toks = text.split(" ", -1)
    val counts = new Array[Int](64)
    toks.foreach { t =>
      val hex = md.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map(b => f"${b & 0xff}%02x").mkString
      for (b <- 0 until 64) {
        val c = Integer.parseInt(hex.charAt(b / 4).toString, 16)
        counts(b) += (c >> (3 - b % 4)) & 1
      }
    }
    var sim = 0L
    for (b <- 0 until 64) if (2 * counts(b) > toks.length) sim |= (1L << b)
    sim
  }

  test("row-local simhashOf matches golden values + an independent md5-hex derivation") {
    // the batch projection and simhashOf now share ONE kernel (SimhashSig),
    // so comparing them is tautological; value correctness is pinned by
    // (a) GOLDEN literals precomputed with an out-of-JVM md5 implementation
    // and (b) the spec-local hex-route re-derivation above
    val golden = Seq(
      "the quick brown fox" -> 245043733036149744L,
      "hash join spark" -> 8665780067988244504L,
      "" -> 2327517620111259691L,
      "a a a b" -> 1544047492951081776L,
      "spark stream fast window" -> 309069683538136456L)
    val md = java.security.MessageDigest.getInstance("MD5")
    golden.foreach { case (text, expected) =>
      assert(Dedup.simhashOf(md, text) == expected, s"golden mismatch for '$text'")
      assert(refSimhash(text) == expected, s"reference derivation drifted for '$text'")
    }
    // and across real corpus docs, the kernel equals the independent
    // derivation document-by-document
    Fixtures.registerRaw(spark, TestSessions.sfDir)
    val docs = spark.table("documents").where(col("doc_id") < 200)
    val batch = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = docs.select(col("doc_id").cast("long"), col("text"))
      .collect().map(r => r.getLong(0) -> refSimhash(r.getString(1))).toMap
    assert(batch.nonEmpty && batch == local)
  }

  test("simhash ingest stream == the batch incremental op's cross pairs") {
    import spark.implicits._
    Fixtures.registerRaw(spark, TestSessions.sfDir)
    val docs = spark.table("documents")
    val corpus = docs.where(col("doc_id") % 10 =!= 0)
    val batch = docs.where(col("doc_id") % 10 === 0)
    // the index is STORED state: parquet round-trip like a real ingest
    val dir = java.nio.file.Files.createTempDirectory("graft_simidx").toString
    Dedup.simhashIndex(corpus, "doc_id", "text").write.parquet(s"$dir/idx")
    val stored = spark.read.parquet(s"$dir/idx")
    val expected = Dedup
      .incrementalSimhashPairs(batch, stored, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter { case (a, b, _) => (a % 10 == 0) != (b % 10 == 0) }.toSet
    assert(expected.nonEmpty, "fixture produced no cross pair — spec is vacuous")

    val all = batch.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect()
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](spark)
    val src = ms.toDF.toDF("doc_id", "text")
    val q = SimhashStream.simhashIngestStream(
        spark, src, "doc_id", "text", stored)
      .writeStream.outputMode("append").format("memory")
      .queryName("sim_stream").start()
    try {
      val cuts = Seq(all.length / 3, 2 * all.length / 3, all.length)
      var from = 0
      cuts.foreach { to =>
        ms.addData(all.slice(from, to).toSeq)
        q.processAllAvailable()
        from = to
      }
      // at-least-once replay: re-sent rows are bit-identical, so the
      // keyed-sink view (the set) must not move
      ms.addData(all.slice(0, all.length / 3).toSeq)
      q.processAllAvailable()
      val got = spark.table("sim_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected,
        s"stream=${got.size} batch=${expected.size}; " +
          s"diff ${(got diff expected) ++ (expected diff got)}")
      // per-combination duplicate emissions are identical rows (the
      // documented contract): raw rows >= distinct pairs
      assert(spark.table("sim_stream").count() >= got.size)
    } finally q.stop()
    // an unstamped (pre-versioning) index is refused loudly at stream
    // SETUP, never a silently-wrong popcount stream
    val e = intercept[IllegalArgumentException] {
      SimhashStream.simhashIngestStream(
        spark, src, "doc_id", "text",
        Dedup.simhash(corpus, "doc_id", "text"))
    }
    assert(e.getMessage.contains("no sh_scheme"))
  }
}
