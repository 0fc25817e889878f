package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketed tables: pre-bucketing both sides of a
  * recurring join key removes the per-query shuffle entirely — the
  * 100 TB pattern for fact-to-fact joins that can't broadcast. */
class BucketingSpec extends AnyFunSuite {

  lazy val spark = TestSessions.spark

  test("bucketed fact-fact join plans without a shuffle exchange") {
    // (static warehouse conf can't change at runtime; tables land in the
    // default ./spark-warehouse, dropped in finally + gitignored)
    // disable broadcast so the join strategy decision is about shuffles
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = spark.read.parquet(s"${TestSessions.sfDir}/lineitem.parquet")
      val ord = spark.read.parquet(s"${TestSessions.sfDir}/orders.parquet")
      li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
      ord.write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("ord_bucketed")

      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(round(sum(col("l_quantity")), 2).as("q"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString

      // the join itself must not introduce Exchanges: bucket layout already
      // co-locates both sides (only the final aggregation shuffles)
      val joinSection = plan.split("HashAggregate").last
      assert(joinSection.contains("SortMergeJoin"), plan)
      assert(!joinSection.contains("Exchange"), plan)

      // and the result matches the unbucketed join
      val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(round(sum(col("l_quantity")), 2).as("q"))
      assert(joined.exceptAll(plain).count() == 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
