package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.mesh.Fixtures
import graft.pipeline.Dedup
import graft.streaming.DedupStream

/** Batch ≡ stream for the dd1 twin: continuous-ingest exact dedup must
  * converge to the batch operator's (sig → min keeper) answer when fed in
  * id order, and replayed slices must not change any verdict. */
class StreamingDedupSpec extends AnyFunSuite {

  lazy val spark = TestSessions.spark
  private def sfDir = TestSessions.sfDir

  test("stream fed in id order converges to batch Dedup.exact; replay is idempotent") {
    import spark.implicits._
    Fixtures.registerRaw(spark, sfDir)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val docsB = spark.table("documents")
      val batch = Dedup.exact(docsB, "doc_id", "text")
        .select(col("sig"), col("keeper"), col("n_docs")).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

      val all = docsB.select(col("doc_id").cast("long"), col("text"))
        .as[(Long, String)].collect().sortBy(_._1)
      val ms = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)](spark)
      val src = ms.toDF.toDF("doc_id", "text")
      val q = DedupStream.dedupStream(spark, src, "doc_id", "text")
        .writeStream.outputMode("update").format("memory")
        .queryName("dd1_stream").start()
      try {
        val cuts = Seq(all.length / 3, 2 * all.length / 3, all.length)
        var from = 0
        cuts.foreach { to =>
          ms.addData(all.slice(from, to).toSeq)
          q.processAllAvailable()
          from = to
        }
        // latest verdict per doc (Update mode re-emits on replay)
        def verdicts() = spark.table("dd1_stream")
          .groupBy("doc_id")
          .agg(last(col("sig")).as("sig"), last(col("keeper")).as("keeper"),
            last(col("is_dup")).as("is_dup"))
          .collect()
          .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getBoolean(3)))
          .toMap

        val v1 = verdicts()
        // every doc got exactly one verdict; keeper matches batch min-id
        assert(v1.size == all.length)
        v1.foreach { case (id, (sig, keeper, isDup)) =>
          val (bKeeper, _) = batch(sig)
          assert(keeper == bKeeper, s"doc $id: keeper $keeper != batch $bKeeper")
          assert(isDup == (id != bKeeper))
        }
        // keep-set cardinality = distinct signatures
        assert(v1.count(!_._2._3) == batch.size)

        // at-least-once replay: resend the middle third — verdicts stable
        ms.addData(all.slice(all.length / 3, 2 * all.length / 3).toSeq)
        q.processAllAvailable()
        assert(verdicts() == v1)
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("first arrival wins across batches on a crafted duplicate") {
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)](spark)
      val q = DedupStream.dedupStream(
          spark, ms.toDF.toDF("doc_id", "text"), "doc_id", "text")
        .writeStream.outputMode("update").format("memory")
        .queryName("dd1_stream2").start()
      try {
        // batch 1: doc 7 arrives first with content X (not the min id)
        ms.addData(Seq((7L, "X"), (9L, "Y")))
        q.processAllAvailable()
        // batch 2: doc 2 brings the SAME content X later — it is the dup
        ms.addData(Seq((2L, "X")))
        q.processAllAvailable()
        val rows = spark.table("dd1_stream2")
          .select("doc_id", "keeper", "is_dup").collect()
          .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
        assert(rows(7L) == (7L, false)) // first arrival keeps
        assert(rows(2L) == (7L, true))  // later smaller id is the dup
        assert(rows(9L) == (9L, false))
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
