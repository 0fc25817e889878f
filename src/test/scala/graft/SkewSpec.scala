package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Skew
import graft.mesh.Fixtures

/** Salted aggregation/join must equal their unsalted equivalents. */
class SkewSpec extends AnyFunSuite {

  lazy val spark = TestSessions.spark

  test("saltedAggCount == plain groupBy count") {
    Fixtures.registerRaw(spark, TestSessions.sfDir)
    val li = spark.table("raw_lineitem")
    val plain = li.groupBy("l_returnflag").count()
    val salted = Skew.saltedAggCount(li, Seq("l_returnflag"))
    assert(plain.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(plain).count() == 0)
  }

  test("saltedJoin == plain join (inner and left)") {
    Fixtures.registerRaw(spark, TestSessions.sfDir)
    val li = spark.table("raw_lineitem").select("l_orderkey", "l_suppkey", "l_quantity")
    val supp = spark.table("raw_supplier").select("s_suppkey", "s_name")
      .withColumnRenamed("s_suppkey", "l_suppkey")
    val plain = li.join(supp, Seq("l_suppkey"))
    val salted = Skew.saltedJoin(li, supp, Seq("l_suppkey"))
    assert(plain.count() == salted.count())
    assert(plain.exceptAll(salted).count() == 0)

    val plainLeft = li.join(supp, Seq("l_suppkey"), "left")
    val saltedLeft = Skew.saltedJoin(li, supp, Seq("l_suppkey"), joinType = "left")
    assert(plainLeft.count() == saltedLeft.count())
  }
}
