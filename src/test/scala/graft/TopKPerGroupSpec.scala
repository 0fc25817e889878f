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

  test("countCol stamps every row with the group's TOTAL input count") {
    val topk = TopKPerGroup(events, Seq("user_id"),
      Seq("value" -> false, "event_id" -> true), k = 3,
      countCol = Some("__n"))
    val expected = events.groupBy("user_id").agg(count(lit(1)).as("exp_n"))
    // every output row of a group carries the same total = groupBy count
    val joined = topk.select(col("user_id"), col("__n"))
      .join(expected, "user_id")
    assert(joined.where(col("__n") =!= col("exp_n")).count() == 0)
    // and the row set itself is unchanged by counting
    val plain = TopKPerGroup(events, Seq("user_id"),
      Seq("value" -> false, "event_id" -> true), k = 3)
    assert(topk.drop("__n").exceptAll(plain).count() == 0)
    assert(plain.exceptAll(topk.drop("__n")).count() == 0)
  }

  test("countCol survives partial-phase overflow (map-full passthrough)") {
    // maxPartialGroups=4 forces most keys through the pass-through path,
    // whose rows must each contribute exactly 1 to the final sum
    val topk = TopKPerGroup(events, Seq("user_id"),
      Seq("value" -> false, "event_id" -> true), k = 3,
      maxPartialGroups = 4, countCol = Some("__n"))
    val expected = events.groupBy("user_id").agg(count(lit(1)).as("exp_n"))
    val joined = topk.select(col("user_id"), col("__n")).join(expected, "user_id")
    assert(joined.where(col("__n") =!= col("exp_n")).count() == 0)
  }

  test("kmvDistinct plans onto TopKPerGroup in ONE pass (no second distinct branch)") {
    graft.mesh.Fixtures.registerRaw(spark, sfDir)
    val kmv = graft.pipeline.Sketches.kmvDistinct(
      spark.table("lineitem"), "l_returnflag", "l_partkey", k = 64)
    kmv.collect()
    // AQE's toString appends the pre-adaptive "Initial Plan" — assert on
    // the executed final section only
    val plan = kmv.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    assert(plan.contains("TopKPerGroup "), plan)
    // the exact count rides the TopK pass: exactly ONE parquet scan of the
    // input (the old spelling scanned + distinct-aggregated twice), and no
    // join reassembling a second branch
    assert("Scan parquet".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("Join"), plan)
    // correctness: exact_parts equals countDistinct
    val expected = spark.table("lineitem").groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("nd"))
    val joined = kmv.join(expected, kmv("l_returnflag") === expected("l_returnflag"))
    assert(joined.where(col("exact_parts") =!= col("nd")).count() == 0)
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
