package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dynamic partition pruning: a directory-partitioned fact joined to a
  * selective dim must scan only the matching partitions at runtime — the
  * mechanism that turns a 100 TB partitioned lake scan into a targeted
  * read without static predicates. */
class DppSpec extends AnyFunSuite {

  lazy val spark = TestSessions.spark
  import spark.implicits._

  test("partition filter is injected dynamically from the joined dim") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    spark.read.parquet(s"${TestSessions.sfDir}/lineitem.parquet")
      .write.partitionBy("l_returnflag").mode("overwrite").parquet(dir)
    val fact = spark.read.parquet(dir)
    // DPP requires a selective predicate on the dim side; a LocalRelation
    // dim folds the filter away, so stage the dim as a parquet table
    val dimDir = java.nio.file.Files.createTempDirectory("graft_dpp_dim").toString
    Seq(("N", "keep"), ("A", "drop"), ("R", "drop"))
      .toDF("flag", "tag").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).where(col("tag") === "keep")

    val joined = fact.join(dim, fact("l_returnflag") === dim("flag"))
    joined.collect()
    val expected = spark.read.parquet(s"${TestSessions.sfDir}/lineitem.parquet")
      .where(col("l_returnflag") === "N").count()
    assert(joined.count() == expected)

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"), plan)
  }
}
