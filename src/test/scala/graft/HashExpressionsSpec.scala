package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HashFunctions

/** Md5Prefix48 must be bit-identical to the SQL spelling the DuckDB
  * oracles compute — CAST(conv(substring(md5(s), 1, 12), 16, 10) AS
  * BIGINT) — on every input shape (ASCII, UTF-8 multibyte, empty,
  * numeric casts), in both the Column API and the registered SQL form. */
class HashExpressionsSpec extends AnyFunSuite {

  lazy val spark = TestSessions.spark

  test("md5_48 equals conv(substring(md5)) on corpus text") {
    graft.mesh.Fixtures.registerRaw(spark, TestSessions.sfDir)
    val docs = spark.table("documents")
    val mismatch = docs.select(
        HashFunctions.md5_48(col("text")).as("fast"),
        expr("CAST(conv(substring(md5(text), 1, 12), 16, 10) AS BIGINT)").as("ref"))
      .where(col("fast") =!= col("ref")).count()
    assert(mismatch == 0)
  }

  test("md5_48 equals the SQL spelling on edge inputs") {
    import spark.implicits._
    val edge = Seq("", "a", "é中文 mixed", " leading", "trailing ",
      "1234567890", ":", "a:b:c").toDF("s")
    val mismatch = edge.select(
        HashFunctions.md5_48(col("s")).as("fast"),
        expr("CAST(conv(substring(md5(s), 1, 12), 16, 10) AS BIGINT)").as("ref"))
      .where(col("fast") =!= col("ref")).count()
    assert(mismatch == 0)
    // never negative: the value is 48 bits
    assert(edge.select(HashFunctions.md5_48(col("s")).as("h"))
      .where(col("h") < 0 || col("h") >= (1L << 48)).count() == 0)
  }

  test("registered SQL form works inside transform lambdas") {
    graft.functions.HashFunctions.register(spark)
    val r = spark.sql(
      """SELECT transform(array('x', 'y'), s -> md5_48(s)) AS hs,
        |       array(CAST(conv(substring(md5('x'), 1, 12), 16, 10) AS BIGINT),
        |             CAST(conv(substring(md5('y'), 1, 12), 16, 10) AS BIGINT)) AS ref
        |""".stripMargin).head
    assert(r.getSeq[Long](0) == r.getSeq[Long](1))
  }
}
