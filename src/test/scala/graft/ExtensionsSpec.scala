package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** `spark.sql.extensions=graft.GraftExtensions` must make the native
  * expressions available with zero library calls — the config-only install
  * path a Spark cluster admin would use. */
class ExtensionsSpec extends AnyFunSuite {

  test("driver contract: oracles match queries; rows-only set is exactly the documented one") {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    // an oracle without a query is dead config drift; a query without an
    // oracle silently downgrades the driver's gate to rows-only — both
    // must be deliberate, so the allowed rows-only set is pinned here
    // (sketches and learned-model variants whose exact values are not
    // SQL-expressible; each has spec-based verification instead)
    assert((o -- q).isEmpty, s"oracles without queries: ${o -- q}")
    // EVERY query is oracled — tok2 (BPE encode) was the last rows-only
    // hold-out until its stored-merge-table replay oracle landed
    // (PipelineQueries.bpeEncodeOracle: one recursive-CTE replace pass
    // per trained merge). Anything appearing here is config drift that
    // silently downgrades the driver's gate to rows-only.
    assert((q -- o).isEmpty,
      s"undocumented rows-only queries: ${(q -- o).mkString(", ")}")
  }

  test("a session built with the extensions class resolves vec_dot in SQL") {
    val base = TestSessions.spark // ensures the shared SparkContext exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // withExtensions: same installer the `spark.sql.extensions` config
      // resolves on a fresh cluster — the config itself is static and
      // cannot be exercised on this JVM's already-running SparkContext
      val s = SparkSession.builder()
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      assert(s ne base) // a genuinely new session, not the cached one
      val r = s.sql(
        "SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
          "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d").head()
      assert(r.getDouble(0) == 11.0)
      // codegen'd expression, not a UDF: the plan must stay whole-stage
      val plan = s.sql("SELECT vec_dot(array(CAST(1.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT)))").queryExecution.executedPlan.toString
      assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
      // word_ngrams rides the same installer
      val g = s.sql("SELECT word_ngrams('a b c', 2) AS g").head.getSeq[String](0)
      assert(g == Seq("a b", "b c"))
      // the SQL-form query inventory's kernels resolve too: token_counts
      // (ap2's corpus pass) and the 48-bit md5 family (sketch hashing) —
      // md5_key48(j, token) must equal the hex-string SQL spelling
      val tcm = s.sql("SELECT token_counts('a b a') AS m")
        .head.getMap[String, Long](0)
      assert(tcm == Map("a" -> 2L, "b" -> 1L))
      val hk = s.sql(
        """SELECT md5_key48(0, 'tok') AS k,
          |  CAST(conv(substring(md5(concat('0', ':', 'tok')), 1, 12), 16, 10) AS BIGINT) AS ref,
          |  md5_48('x') AS h,
          |  CAST(conv(substring(md5('x'), 1, 12), 16, 10) AS BIGINT) AS href
          |""".stripMargin).head()
      assert(hk.getLong(0) == hk.getLong(1))
      assert(hk.getLong(2) == hk.getLong(3))
      // the planner strategy comes from the extensions too: plan a raw
      // TopKPerGroupNode WITHOUT the helper's self-install path
      import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
      val df = s.range(9).selectExpr("id % 3 AS k", "id AS v")
      val attrs = org.apache.spark.sql.graft.ColumnBridge.planOf(df).output
      val node = graft.plans.TopKPerGroupNode(
        Seq(attrs.head), Seq(SortOrder(attrs(1), Ascending)), k = 1,
        maxPartialGroups = 1024, countAttr = None,
        org.apache.spark.sql.graft.ColumnBridge.planOf(df))
      val out = org.apache.spark.sql.graft.ColumnBridge.ofRows(s, node)
      assert(out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
        Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}
