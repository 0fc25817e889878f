package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TopKPerGroup

/** Custom whole-operator plan (LogicalPlan + Strategy + SparkPlan): result
  * parity with the window-function spelling, correct behavior when k
  * exceeds the group size, and the defining plan property — no sort. */
class TopKPerGroupSpec extends AnyFunSuite {

  lazy val spark = TestSessions.spark
  private def sfDir = TestSessions.sfDir

  private def events = {
    graft.mesh.Fixtures.registerRaw(spark, sfDir)
    spark.table("events")
      .select(col("user_id"), col("event_id"), col("value"))
  }

  test("matches the row_number window form exactly (value desc, id tiebreak)") {
    val topk = TopKPerGroup(events, keys = Seq("user_id"),
      orderBy = Seq("value" -> false, "event_id" -> true), k = 3)
    val expected = events
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(col("value").desc, col("event_id"))))
      .where(col("rn") <= 3).drop("rn")
    assert(topk.count() == expected.count())
    assert(topk.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(topk).count() == 0)
  }

  test("k larger than every group returns all rows") {
    val small = events.where(col("user_id") < 10)
    val topk = TopKPerGroup(small, Seq("user_id"),
      Seq("value" -> true, "event_id" -> true), k = 1000000)
    assert(topk.count() == small.count())
  }

  test("plans one hash exchange and NO sort (the window form must sort)") {
    val topk = TopKPerGroup(events, Seq("user_id"),
      Seq("value" -> false, "event_id" -> true), k = 3)
    topk.collect()
    val plan = topk.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup "), plan)
    // map-side partial sits BELOW the exchange: shuffle volume is already
    // bounded by groups·k per input partition
    assert(plan.contains("TopKPerGroupPartial"), plan)
    assert(plan.indexOf("TopKPerGroupPartial") > plan.indexOf("Exchange"), plan)
    assert(!plan.contains("Sort "), plan)
    val windowPlan = events.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("value").desc)))
      .where(col("rn") <= 3).queryExecution.executedPlan.toString
    assert(windowPlan.contains("Sort "), windowPlan)
  }

  test("partial-phase overflow (group map full) still yields exact results") {
    // maxPartialGroups=4 forces most keys through the pass-through path;
    // the final phase must still produce the exact top-k
    val topk = TopKPerGroup(events, Seq("user_id"),
      Seq("value" -> false, "event_id" -> true), k = 3, maxPartialGroups = 4)
    val expected = TopKPerGroup(events, Seq("user_id"),
      Seq("value" -> false, "event_id" -> true), k = 3)
    assert(topk.count() == expected.count())
    assert(topk.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(topk).count() == 0)
  }

  test("rank order within each group: first emitted row per key is the best") {
    val topk = TopKPerGroup(events, Seq("user_id"),
      Seq("value" -> false, "event_id" -> true), k = 2)
    val rows = topk.collect()
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (_, rs) =>
      val vals = rs.map(_.getDouble(2)).toSeq
      assert(vals == vals.sorted.reverse || vals.toSet.size < vals.size)
    }
  }
}
