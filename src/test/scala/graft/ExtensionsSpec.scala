package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** `spark.sql.extensions=graft.GraftExtensions` must make the native
  * expressions available with zero library calls — the config-only install
  * path a Spark cluster admin would use. */
class ExtensionsSpec extends AnyFunSuite {

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
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}
