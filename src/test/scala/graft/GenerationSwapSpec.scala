package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.mesh.Fixtures
import graft.pipeline.{Dedup, Multimodal}
import graft.streaming.{NearDupStream, PhashStream, SimhashStream}

/** The streaming GENERATION-SWAP restart protocol, pinned for all three
  * stored-index ingest twins: a stream serves arrivals against a FROZEN
  * index generation; to admit a served batch, the stream STOPS, the
  * batch folds into generation N+1 through the validated append-files
  * delta (`bandIndexDeltaFor` / `simhashIndexDeltaFor` /
  * `phashIndexDeltaFor`, plus the shingle sidecar for the near-dup twin),
  * and the stream RESTARTS against the appended state. Across the
  * boundary:
  *  - no pair is lost or duplicated — generation-0 emissions are exactly
  *    the batch operator's A-vs-corpus pairs, generation-1 emissions
  *    exactly its B-vs-(corpus ∪ A) pairs;
  *  - replay ACROSS the swap is idempotent in the keyed-sink sense:
  *    re-sent generation-0 arrivals re-emit their old verdicts
  *    bit-identically AND surface exactly the replayed batch's internal
  *    pairs (its docs are in the index now) — the pairs the batch
  *    re-index owns, never a wrong or duplicate verdict;
  *  - a scheme mismatch is still LOUD at restart (the setup gates re-run
  *    against the appended generation).
  */
class GenerationSwapSpec extends AnyFunSuite {

  lazy val spark = TestSessions.spark

  /** Run `mk(source)` as a memory-sink query named `name`, feed it
    * `batches` in order (processAllAvailable between), return the sink
    * table's rows as Long/Long/last-col tuples. */
  private def runPhase[T: org.apache.spark.sql.Encoder](
      name: String, mk: DataFrame => DataFrame,
      cols: Seq[String], batches: Seq[Seq[T]])(
      read: org.apache.spark.sql.Row => (Long, Long, Any)): Set[(Long, Long, Any)] = {
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[T](spark)
    val q = mk(ms.toDF.toDF(cols: _*))
      .writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    try {
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      spark.table(name).collect().map(read).toSet
    } finally q.stop()
  }

  test("near-dup twin: swap to the delta-appended generation loses nothing; replay is idempotent") {
    import spark.implicits._
    Fixtures.registerRaw(spark, TestSessions.sfDir)
    val docs = spark.table("documents")
    val corpus0 = docs.where(col("doc_id") % 10 <= 5)
    val sliceA = docs.where(col("doc_id") % 10 === 6 || col("doc_id") % 10 === 7)
    val sliceB = docs.where(col("doc_id") % 10 === 8 || col("doc_id") % 10 === 9)
    def inA(id: Long) = id % 10 == 6 || id % 10 == 7
    def inB(id: Long) = id % 10 == 8 || id % 10 == 9
    val root = java.nio.file.Files.createTempDirectory("graft_swap_nd").toString
    Dedup.bandIndex(corpus0, "doc_id", "text").write.parquet(s"$root/idx")
    Dedup.shingleSetStore(corpus0, "doc_id", "text").write.parquet(s"$root/sh")

    def pairs(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // batch ground truths, each against the generation the stream serves
    val ingestA = pairs(Dedup.incrementalNearDupPairs(
      sliceA, corpus0, spark.read.parquet(s"$root/idx"), "doc_id", "text",
      storedShingles = Some(spark.read.parquet(s"$root/sh"))))
    val crossA = ingestA.filter { case (a, b, _) => inA(a) != inA(b) }
    val internalA = ingestA.filter { case (a, b, _) => inA(a) && inA(b) }
    assert(crossA.nonEmpty && internalA.nonEmpty,
      "fixture lacks cross or A-internal pairs — swap spec is vacuous")

    val arrA = sliceA.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect().toSeq
    val arrB = sliceB.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect().toSeq
    def phase(name: String, batches: Seq[Seq[(Long, String)]]) =
      runPhase[(Long, String)](name, src =>
        NearDupStream.nearDupIngestStream(
          spark, src, "doc_id", "text",
          spark.read.parquet(s"$root/idx"), corpus0, "doc_id", "text",
          storedShingles = Some(spark.read.parquet(s"$root/sh"))),
        Seq("doc_id", "text"), batches)(
        r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    // generation 0 serves batch A, then stops
    val got0 = phase("swap_nd_g0", Seq(arrA))
    assert(got0 == crossA.map(t => t: (Long, Long, Any)),
      s"gen0 diff ${(got0 diff crossA.map(t => t: (Long, Long, Any)))}")

    // the swap: fold A into generation 1 — batch-proportional deltas into
    // BOTH stored tables (index and sidecar)
    Dedup.bandIndexDeltaFor(
        spark.read.parquet(s"$root/idx"), sliceA, "doc_id", "text")
      .write.mode("append").parquet(s"$root/idx")
    // a HALF-folded generation (index appended, sidecar forgotten) is
    // LOUD at restart — never a silently-incomplete verdict stream
    val eHole = intercept[IllegalStateException] {
      NearDupStream.nearDupIngestStream(
        spark, sliceB.limit(0), "doc_id", "text",
        spark.read.parquet(s"$root/idx"), corpus0, "doc_id", "text",
        storedShingles = Some(spark.read.parquet(s"$root/sh")))
    }
    assert(eHole.getMessage.contains("does not cover"))
    Dedup.shingleSetsDeltaFor(
        spark.read.parquet(s"$root/sh"), sliceA, "doc_id", "text")
      .write.mode("append").parquet(s"$root/sh")
    // maintenance inside the swap window: compact BOTH stores before the
    // restart — the stream must serve a post-compaction generation with
    // verdicts unchanged (compaction moves bytes between files, never
    // rows; the sidecar's range layout is restored)
    graft.pipeline.IndexMaintenance.compactIndex(spark, s"$root/idx")
    graft.pipeline.IndexMaintenance.compactIndex(spark, s"$root/sh",
      graft.pipeline.IndexMaintenance.rangeByIdLayout("__id"))
    val corpus1 = corpus0.unionByName(sliceA)
    val crossB = pairs(Dedup.incrementalNearDupPairs(
      sliceB, corpus1, spark.read.parquet(s"$root/idx"), "doc_id", "text",
      storedShingles = Some(spark.read.parquet(s"$root/sh"))))
      .filter { case (a, b, _) => inB(a) != inB(b) }
    assert(crossB.exists { case (a, b, _) => inA(a) || inA(b) },
      "no gen1 pair touches batch A — the swap added nothing observable")

    // generation 1 serves batch B, then REPLAYS batch A across the swap
    val got1 = phase("swap_nd_g1", Seq(arrB))
    assert(got1 == crossB.map(t => t: (Long, Long, Any)),
      s"gen1 diff ${(got1 diff crossB.map(t => t: (Long, Long, Any)))}")
    val gotReplay = phase("swap_nd_g1r", Seq(arrB, arrA))
    val wantReplay = (crossB ++ crossA ++ internalA).map(t => t: (Long, Long, Any))
    assert(gotReplay == wantReplay,
      s"replay diff ${(gotReplay diff wantReplay) ++ (wantReplay diff gotReplay)}")

    // scheme mismatch is still loud at RESTART against the new generation
    val e = intercept[IllegalArgumentException] {
      NearDupStream.nearDupIngestStream(
        spark, sliceB.limit(0), "doc_id", "text",
        spark.read.parquet(s"$root/idx"), corpus1, "doc_id", "text",
        fastHash = true)
    }
    assert(e.getMessage.contains("does not match"))
  }

  test("simhash twin: swap to the delta-appended generation loses nothing; replay is idempotent") {
    import spark.implicits._
    Fixtures.registerRaw(spark, TestSessions.sfDir)
    val docs = spark.table("documents")
    val corpus0 = docs.where(col("doc_id") % 10 <= 5)
    val sliceA = docs.where(col("doc_id") % 10 === 6 || col("doc_id") % 10 === 7)
    val sliceB = docs.where(col("doc_id") % 10 === 8 || col("doc_id") % 10 === 9)
    def inA(id: Long) = id % 10 == 6 || id % 10 == 7
    def inB(id: Long) = id % 10 == 8 || id % 10 == 9
    val root = java.nio.file.Files.createTempDirectory("graft_swap_sim").toString
    Dedup.simhashIndex(corpus0, "doc_id", "text").write.parquet(s"$root/idx")

    def pairs(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ingestA = pairs(Dedup.incrementalSimhashPairs(
      sliceA, spark.read.parquet(s"$root/idx"), "doc_id", "text"))
    val crossA = ingestA.filter { case (a, b, _) => inA(a) != inA(b) }
    val internalA = ingestA.filter { case (a, b, _) => inA(a) && inA(b) }
    assert(crossA.nonEmpty, "no cross pair — swap spec is vacuous")

    val arrA = sliceA.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect().toSeq
    val arrB = sliceB.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect().toSeq
    def phase(name: String, batches: Seq[Seq[(Long, String)]]) =
      runPhase[(Long, String)](name, src =>
        SimhashStream.simhashIngestStream(
          spark, src, "doc_id", "text", spark.read.parquet(s"$root/idx")),
        Seq("doc_id", "text"), batches)(
        r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    val got0 = phase("swap_sim_g0", Seq(arrA))
    assert(got0 == crossA.map(t => t: (Long, Long, Any)))

    Dedup.simhashIndexDeltaFor(
        spark.read.parquet(s"$root/idx"), sliceA, "doc_id", "text")
      .write.mode("append").parquet(s"$root/idx")
    val crossB = pairs(Dedup.incrementalSimhashPairs(
      sliceB, spark.read.parquet(s"$root/idx"), "doc_id", "text"))
      .filter { case (a, b, _) => inB(a) != inB(b) }

    val got1 = phase("swap_sim_g1", Seq(arrB))
    assert(got1 == crossB.map(t => t: (Long, Long, Any)))
    val gotReplay = phase("swap_sim_g1r", Seq(arrB, arrA))
    val wantReplay = (crossB ++ crossA ++ internalA).map(t => t: (Long, Long, Any))
    assert(gotReplay == wantReplay,
      s"replay diff ${(gotReplay diff wantReplay) ++ (wantReplay diff gotReplay)}")

    // an unstamped index is still loud at restart
    val e = intercept[IllegalArgumentException] {
      SimhashStream.simhashIngestStream(
        spark, sliceB.limit(0), "doc_id", "text",
        spark.read.parquet(s"$root/idx").drop("sh_scheme"))
    }
    assert(e.getMessage.contains("no sh_scheme"))
  }

  test("phash twin: swap to the delta-appended generation loses nothing; replay is idempotent") {
    import spark.implicits._
    // the PhashStreamSpec 12-family corpus: 3 consecutive ids per family
    val recs: Seq[(Long, Array[Byte])] = (0 until 36).map { i =>
      val fam = i / 3
      val bytes = Array.tabulate(96)(j => ((fam * 37 + j * 11) % 251).toByte)
      (0 until (i % 3) * 3).foreach { k =>
        val p = (k * 7) % 96
        bytes(p) = (bytes(p) + 40).toByte
      }
      (i.toLong, bytes)
    }
    def mediaDs(rs: Seq[(Long, Array[Byte])]) =
      spark.createDataset(rs.map { case (id, b) =>
        Multimodal.MediaRecord(id, Multimodal.encodePng(b),
          Multimodal.MediaMeta("image/png", b.length, 1, 1))
      })(org.apache.spark.sql.Encoders.product[Multimodal.MediaRecord])
    // family boundaries OFF the stride so families span BOTH seams
    val corpus0 = recs.filter(_._1 < 19)
    val sliceA = recs.filter(r => r._1 >= 19 && r._1 < 28)
    val sliceB = recs.filter(_._1 >= 28)
    def inA(id: Long) = id >= 19 && id < 28
    def inB(id: Long) = id >= 28
    val root = java.nio.file.Files.createTempDirectory("graft_swap_ph").toString
    Multimodal.phashBandIndex(mediaDs(corpus0)).write.parquet(s"$root/idx")

    def pairs(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ingestA = pairs(Multimodal.incrementalPhashPairs(
      mediaDs(sliceA), spark.read.parquet(s"$root/idx")))
    val crossA = ingestA.filter { case (a, b, _) => inA(a) != inA(b) }
    val internalA = ingestA.filter { case (a, b, _) => inA(a) && inA(b) }
    assert(crossA.nonEmpty && internalA.nonEmpty,
      "fixture lacks cross or A-internal pairs — swap spec is vacuous")

    val arrA = sliceA.map { case (id, b) => (id, Multimodal.encodePng(b)) }
    val arrB = sliceB.map { case (id, b) => (id, Multimodal.encodePng(b)) }
    def phase(name: String, batches: Seq[Seq[(Long, Array[Byte])]]) =
      runPhase[(Long, Array[Byte])](name, src =>
        PhashStream.phashIngestStream(
          spark, src, "doc_id", "payload", spark.read.parquet(s"$root/idx")),
        Seq("doc_id", "payload"), batches)(
        r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    val got0 = phase("swap_ph_g0", Seq(arrA))
    assert(got0 == crossA.map(t => t: (Long, Long, Any)))

    Multimodal.phashIndexDeltaFor(
        spark.read.parquet(s"$root/idx"), mediaDs(sliceA))
      .write.mode("append").parquet(s"$root/idx")
    val crossB = pairs(Multimodal.incrementalPhashPairs(
      mediaDs(sliceB), spark.read.parquet(s"$root/idx")))
      .filter { case (a, b, _) => inB(a) != inB(b) }
    assert(crossB.exists { case (a, b, _) => inA(a) || inA(b) },
      "no gen1 pair touches batch A — the swap added nothing observable")

    val got1 = phase("swap_ph_g1", Seq(arrB))
    assert(got1 == crossB.map(t => t: (Long, Long, Any)))
    val gotReplay = phase("swap_ph_g1r", Seq(arrB, arrA))
    val wantReplay = (crossB ++ crossA ++ internalA).map(t => t: (Long, Long, Any))
    assert(gotReplay == wantReplay,
      s"replay diff ${(gotReplay diff wantReplay) ++ (wantReplay diff gotReplay)}")

    // a banding-geometry mismatch is still loud at restart
    val e = intercept[IllegalArgumentException] {
      PhashStream.phashIngestStream(
        spark, spark.range(0).selectExpr("id AS doc_id",
          "CAST(NULL AS BINARY) AS payload"),
        "doc_id", "payload", spark.read.parquet(s"$root/idx"),
        bits = 48, bands = 8)
    }
    assert(e.getMessage.contains("does not match"))
  }
}
