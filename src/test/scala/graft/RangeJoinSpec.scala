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
