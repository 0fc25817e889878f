package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.mesh.Fixtures

/** Pins the plan shape groupedLowerMedianFiltered exists for: the expensive
  * row filter (ap1's md5 sample predicate) is paid on the FULL scan only in
  * the histogram pass; the pick pass filters on the collected target-bucket
  * LITERALS first, so its scan evaluates the md5 only on in-bucket rows
  * (conjunct short-circuit). If a refactor re-orders the conjuncts or
  * reintroduces a join, this spec fails rather than ap1 silently regressing
  * to two full-scan md5 passes. */
class MedianFilterOrderSpec extends AnyFunSuite {

  lazy val spark = TestSessions.spark
  private def sfDir = TestSessions.sfDir

  test("pick pass short-circuits the expensive filter behind bucket literals") {
    Fixtures.registerRaw(spark, sfDir)
    val li = spark.table("lineitem")
    val med = graft.pipeline.Sketches.groupedLowerMedianFiltered(
      li.select(col("l_returnflag"), col("l_extendedprice").as("price"),
        col("l_orderkey"), col("l_linenumber")),
      graft.functions.HashFunctions
        .md5_key48(col("l_orderkey"), col("l_linenumber")) % 10 === 0,
      "l_returnflag", "price")
    med.collect()
    // final adaptive plan only (AQE toString appends the initial plan)
    val plan = med.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    // no join machinery in the pick pass (the losing A/B's shape)
    assert(!plan.contains("Join"), plan)
    // the pick-pass Filter must list the bucket-literal disjunction BEFORE
    // the md5 conjunct — And order is what makes the md5 short-circuit
    // (the expression prints as md5key48 in physical plans)
    val pickFilter = plan.linesIterator
      .filter(l => l.contains("Filter") && l.contains("md5key48"))
      .find(_.contains("FLOOR"))
    assert(pickFilter.isDefined, s"no pick-pass filter with bucket literals:\n$plan")
    val line = pickFilter.get
    assert(line.indexOf("FLOOR") < line.indexOf("md5key48"),
      s"bucket literals must precede the md5 conjunct:\n$line")

    // value identity with the simple (pre-filtered) form
    val samp = graft.pipeline.Sketches
      .hashSample(li, Seq("l_orderkey", "l_linenumber"), oneIn = 10)
      .select(col("l_returnflag"), col("l_extendedprice").as("price"))
    val simple = graft.pipeline.Sketches
      .groupedLowerMedian(samp, "l_returnflag", "price")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val filtered = med.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(filtered == simple)
  }
}
