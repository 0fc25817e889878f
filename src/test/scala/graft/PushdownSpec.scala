package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regression tests for the plan properties the mesh design promises:
  * user predicates/pruning reach the parquet scans through the entity
  * union AND the mapping expressions; small sides broadcast. */
class PushdownSpec extends AnyFunSuite {

  lazy val spark = TestSessions.spark
  private def plan(name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, TestSessions.sfDir)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q3: filter on a transformed entity column pushes into every branch scan") {
    val p = plan("q3_tpch_q1_mesh")
    // shipdate <= DATE '1998-09-02' on the entity view (CAST(l_shipdate AS
    // DATE)) must reach all three parquet scans as an l_shipdate filter
    val pushed = "LessThan\\(l_shipdate".r.findAllIn(p).size
    assert(pushed >= 3, p)
    // column pruning: l_partkey is unused by the query and must not be read
    assert(!p.contains("l_partkey"), "scan reads pruned column")
  }

  test("q10: dimension sides broadcast in the 3-way join") {
    val p = plan("q10_tpch_q3_join")
    assert(p.contains("BroadcastHashJoin"), p)
    assert("EqualTo\\(c_mktsegment,BUILDING\\)".r.findFirstIn(p).isDefined, p)
  }

  test("q32: all five dims broadcast in the star join; the fact never sort-merges") {
    // AQE prints the final plan first, then repeats the initial plan —
    // count joins in the finalized section only
    val p = plan("q32_tpch_q5_join").split("== Initial Plan ==").head
    assert("BroadcastHashJoin".r.findAllIn(p).size == 5, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q1: per-branch limits stay below the union (no global-sort explosion)") {
    val p = plan("q1_proj_filter_limit")
    // TakeOrderedAndProject caps the sort at k instead of a full global sort
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q25: GROUPING SETS and CUBE branches share ONE lineitem scan") {
    // both constructs roll up the same finest-granularity base CTE; the
    // base aggregate's exchange must be reused across the two branches so
    // the corpus is scanned and shuffled once (the two-branch spelling
    // aggregated lineitem twice)
    val p = plan("q25_grouping_sets_cube")
    val scans = "Scan parquet".r.findAllIn(p).size
    val reused = p.contains("ReusedExchange") || p.contains("TableCacheQueryStage") ||
      p.contains("ReusedQueryStage")
    assert(scans <= 1 || reused, s"scans=$scans reused=$reused\n$p")
  }
}
