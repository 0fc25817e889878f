package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.mesh.Fixtures
import graft.streaming.EventStream

/** Batch ≡ stream for q21's flatMapGroupsWithState twin: gap-sessionized
  * per-session aggregates emitted on session CLOSE must reproduce the
  * batch query's (user, session, n, sum) rows when the feed respects
  * per-user event-time order, with the watermark-timeout path closing
  * each user's final session. */
class SessionizeStreamSpec extends AnyFunSuite {

  lazy val spark = TestSessions.spark
  private def sfDir = TestSessions.sfDir

  test("closed sessions == batch q21 rows; final sessions close via timeout") {
    import spark.implicits._
    Fixtures.registerRaw(spark, sfDir)
    // batch truth from the oracle-gated query itself
    val batch = graft.SparkEntry.queries("q21_events_sessionize")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet

    val evs = spark.table("events")
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("ts").cast("timestamp"), col("value").cast("double"))
      .as[(Long, Long, java.sql.Timestamp, Double)]
      .collect()
      .sortBy(e => (e._3.getTime, e._2)) // global event-time order feed
    val maxTs = evs.map(_._3.getTime).max

    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, java.sql.Timestamp, Double)](spark)
    val src = ms.toDF.toDF("user_id", "event_id", "ts", "value")
    val q = EventStream.sessionizeStream(spark, src)
      .writeStream.outputMode("append").format("memory")
      .queryName("q21_stream").start()
    try {
      val cuts = Seq(evs.length / 3, 2 * evs.length / 3, evs.length)
      var from = 0
      cuts.foreach { to =>
        ms.addData(evs.slice(from, to).toSeq)
        q.processAllAvailable()
        from = to
      }
      // a far-future sentinel (user -1) pushes the watermark past every
      // real session's last-event + gap, so the timeout path closes them
      ms.addData(Seq((-1L, 0L,
        new java.sql.Timestamp(maxTs + 4L * 3600 * 1000), 0.0)))
      q.processAllAvailable()
      // one more empty-ish batch lets the timeout fire for rows whose
      // eviction was decided by the sentinel batch's watermark update
      ms.addData(Seq((-1L, 1L,
        new java.sql.Timestamp(maxTs + 5L * 3600 * 1000), 0.0)))
      q.processAllAvailable()

      val streamed = spark.table("q21_stream")
        .where(col("user_id") >= 0)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val missing = batch.diff(streamed)
      val extra = streamed.diff(batch)
      assert(missing.isEmpty && extra.isEmpty,
        s"missing=${missing.take(5)} extra=${extra.take(5)} " +
          s"(batch=${batch.size} streamed=${streamed.size})")
    } finally q.stop()
  }
}
