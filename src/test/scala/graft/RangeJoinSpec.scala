package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.mesh.Fixtures
import graft.operators.RangeJoin

/** Bin-bucketed range join: equals the naive inequality formulation,
  * matches each qualifying pair exactly once, and plans as a hash
  * equi-join (never a nested-loop / cartesian shape). */
class RangeJoinSpec extends AnyFunSuite {

  lazy val spark = TestSessions.spark

  private def sides = {
    Fixtures.registerRaw(spark, TestSessions.sfDir)
    val ev = spark.table("events")
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        unix_micros(col("ts")).as("c_us"))
    val purch = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        (unix_micros(col("ts")) - 3600000000L).as("w_start"),
        unix_micros(col("ts")).as("w_end"))
    (clicks, purch)
  }

  test("binned range join equals the naive inequality join") {
    val (clicks, purch) = sides
    val binned = RangeJoin.pointInRange(
        clicks, purch, Seq("user_id"), "c_us", "w_start", "w_end",
        binWidth = 3600000000L)
      .select(col("purchase_id"), col("click_id"))
    val naive = purch.as("p").join(clicks.as("c"),
        col("p.user_id") === col("c.user_id") &&
          col("c_us") >= col("w_start") && col("c_us") <= col("w_end"))
      .select(col("purchase_id"), col("click_id"))
    assert(binned.count() > 0)
    assert(binned.count() == naive.count()) // exactly-once matching, no dedup
    assert(binned.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(binned).count() == 0)
  }

  test("plans as a hash equi-join on (key, bin), never nested-loop") {
    val (clicks, purch) = sides
    val plan = RangeJoin.pointInRange(
        clicks, purch, Seq("user_id"), "c_us", "w_start", "w_end",
        binWidth = 3600000000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // the bin column participates in the join keys
    assert(plan.contains("__bin"), plan)
  }

  test("interval overlap equals the naive inequality join, exactly once, hash-planned") {
    Fixtures.registerRaw(spark, TestSessions.sfDir)
    val ev = spark.table("events")
    def side(t: String, idAs: String, sAs: String, eAs: String) =
      ev.where(col("event_type") === t)
        .select(col("user_id"), col("event_id").as(idAs),
          unix_micros(col("ts")).as(sAs),
          (unix_micros(col("ts")) + 1200000000L).as(eAs))
    val clicks = side("click", "click_id", "cs", "ce")
    val purch = side("purchase", "purchase_id", "ps", "pe")
    val binned = RangeJoin.intervalOverlap(
        clicks, purch, Seq("user_id"), "cs", "ce", "ps", "pe",
        binWidth = 1200000000L)
      .select(col("click_id"), col("purchase_id"))
    val naive = clicks.as("c").join(purch.as("p"),
        col("c.user_id") === col("p.user_id") &&
          col("cs") <= col("pe") && col("ps") <= col("ce"))
      .select(col("click_id"), col("purchase_id"))
    assert(binned.count() > 0)
    assert(binned.count() == naive.count()) // exactly-once, no dedup pass
    assert(binned.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(binned).count() == 0)
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    // narrower bins: same pairs, still exactly once
    val narrow = RangeJoin.intervalOverlap(
        clicks, purch, Seq("user_id"), "cs", "ce", "ps", "pe",
        binWidth = 300000000L)
      .select(col("click_id"), col("purchase_id"))
    assert(narrow.count() == naive.count())
    assert(narrow.exceptAll(naive).count() == 0)
  }

  test("forward as-of join picks the nearest at-or-after right row") {
    Fixtures.registerRaw(spark, TestSessions.sfDir)
    val ev = spark.table("events")
    val clicks = ev.where(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts")).agg(max(col("event_id")).as("click_id"))
    val purch = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val got = graft.operators.AsOfJoin.asofNext(
        purch, clicks, Seq("user_id"), "ts", "ts", Seq("click_id"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    // full microsecond precision (getTime alone is millis; the fixture
    // carries sub-millisecond components)
    def us(t: java.sql.Timestamp): Long =
      t.getTime * 1000 + (t.getNanos / 1000) % 1000
    // independent recomputation: first click at-or-after, per purchase
    val clickRows = clicks.collect()
      .map(r => (r.getLong(0), us(r.getTimestamp(1)), r.getLong(2)))
    val purchRows = purch.collect()
      .map(r => (r.getLong(0), r.getLong(1), us(r.getTimestamp(2))))
    purchRows.foreach { case (eid, uid, pts) =>
      val expected = clickRows.filter(c => c._1 == uid && c._2 >= pts)
        .sortBy(c => (c._2, c._3)).headOption.map(_._3)
      assert(got(eid) == expected, s"purchase $eid")
    }
  }

  test("bin width sensitivity: narrower bins produce the same result") {
    val (clicks, purch) = sides
    val wide = RangeJoin.pointInRange(
        clicks, purch, Seq("user_id"), "c_us", "w_start", "w_end",
        binWidth = 3600000000L)
      .select(col("purchase_id"), col("click_id"))
    val narrow = RangeJoin.pointInRange(
        clicks, purch, Seq("user_id"), "c_us", "w_start", "w_end",
        binWidth = 600000000L)
      .select(col("purchase_id"), col("click_id"))
    assert(wide.exceptAll(narrow).count() == 0)
    assert(narrow.exceptAll(wide).count() == 0)
  }
}
