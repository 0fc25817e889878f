package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-probe for the HammingMatches literal kernel: driver-loop floor
  * vs the codegen'd expression over the cached index (dd12's brute tier). */
object ProfileHamming {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.LocalLayout.parquet(spark, s"$sfDir/documents.parquet")
    val idx = graft.pipeline.Dedup.simhashIndex(
      docs.where(col("doc_id") % 10 =!= 0), "doc_id", "text")
      .select(col("doc_id"), col("simhash")).localCheckpoint()
    val bat = graft.pipeline.Dedup.simhash(
      docs.where(col("doc_id") % 10 === 0), "doc_id", "text").collect()
    val ids = bat.map(_.getLong(0)); val sigs = bat.map(_.getLong(1))
    println(s"index=${idx.count()} batch=${ids.length}")

    def t(label: String, reps: Int)(f: => Any): Unit = {
      f
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => f)
      println(f"PROF $label%-30s ${(System.nanoTime() - t0) / 1e9 / reps}%.4f s/op")
    }
    // (a) driver floor: same loop over collected index
    val irows = idx.collect()
    val iids = irows.map(_.getLong(0)); val isigs = irows.map(_.getLong(1))
    t("driver loop", 5) {
      var m = 0L
      var i = 0
      while (i < isigs.length) {
        val r = graft.functions.HammingMatches.compute(
          iids(i), isigs(i), ids, sigs, 6)
        m += r.numElements(); i += 1
      }
      m
    }
    // (b) the expression over the checkpointed index
    t("expr probe count", 5) {
      idx.select(col("doc_id"),
        explode(graft.functions.HashFunctions.hamming_matches(
          col("doc_id"), col("simhash"), ids, sigs, 6)).as("m")).count()
    }
    // (c) coalesced to 1 partition
    t("expr probe coalesce(1)", 5) {
      idx.coalesce(1).select(col("doc_id"),
        explode(graft.functions.HashFunctions.hamming_matches(
          col("doc_id"), col("simhash"), ids, sigs, 6)).as("m")).count()
    }
    spark.stop()
  }
}
