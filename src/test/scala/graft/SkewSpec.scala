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

  test("AQE splits skewed join partitions at runtime (skew=true in final plan)") {
    // one hot key carries ~99% of the left side; with broadcast disabled
    // the SMJ's hot partition crosses the (lowered) skew threshold and
    // AQE's OptimizeSkewedJoin must split it — the runtime complement to
    // the manual salting helpers for ad-hoc queries.
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      val left = spark.range(0, 300000).select(
        when(col("id") % 100 === 0, col("id")).otherwise(lit(0L)).as("k"),
        concat(lit("payload_payload_payload_"), col("id")).as("p"))
      val right = spark.range(0, 2000).select(col("id").as("k"),
        concat(lit("dim_"), col("id")).as("d"))
      // keep the payload in the output: pruning it shrinks the hot
      // partition's (compressed) shuffle bytes below any sane threshold
      val joined = left.join(right, "k")
      // execute THIS queryExecution so the adaptive plan is finalized
      assert(joined.collect().length > 0)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"), finalPlan.take(2000))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter from a selective dim lands on the fact side") {
    // the row-level runtime-filtering complement to DPP: a selective
    // filter on the creation side injects bloom_filter_might_contain
    // into the application-side scan, cutting shuffle input at 100 TB
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      Fixtures.registerRaw(spark, TestSessions.sfDir)
      val fact = spark.table("raw_lineitem")
      val dim = spark.table("raw_orders").where(col("o_totalprice") > 400000.0)
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("o_totalprice"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") &&
        optimized.contains("bloom_filter_agg"), optimized.take(1500))
      // correctness unchanged by the runtime filter
      val expect = fact.select(col("l_orderkey"))
        .join(dim.select(col("o_orderkey"), col("o_totalprice")),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expect)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
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
