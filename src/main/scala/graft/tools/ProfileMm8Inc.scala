package graft.tools

import org.apache.spark.sql.functions._

/** Incremental vs full-reband image near-dup (round-13 #7): mm8 is the
  * heaviest sf10 entry because `phashNearDupPairs` decodes and re-bands
  * the WHOLE media corpus. A 100 TB pipeline instead ingests new images
  * against a stored band index (`Multimodal.phashBandIndex` +
  * `incrementalPhashPairs`). This measures that split on the given
  * corpus: index build over the first 90% of doc ids (one-off cost),
  * then a 10% batch ingested against the STORED (parquet round-tripped)
  * index, vs the full re-band of everything.
  *
  * Usage: runMain graft.tools.ProfileMm8Inc [sfDir]
  */
object ProfileMm8Inc {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val spark = ProfileSession.build()
    graft.mesh.Fixtures.registerRaw(spark, sfDir)
    val docs = spark.table("documents")
    val maxId = docs.agg(max(col("doc_id"))).head.getLong(0)
    val cut = maxId - maxId / 10
    val corpus = graft.pipeline.Multimodal.toMediaRecords(
      spark, docs.where(col("doc_id") <= cut))
    val batch = graft.pipeline.Multimodal.toMediaRecords(
      spark, docs.where(col("doc_id") > cut))
    println(s"PROF dir=$sfDir docs=${docs.count()} cut=$cut")

    val dir = java.nio.file.Files.createTempDirectory("graft_phidx").toString
    val tBuild = {
      System.gc(); Thread.sleep(100)
      val t0 = System.nanoTime()
      graft.pipeline.Multimodal.phashBandIndex(corpus)
        .write.mode("overwrite").parquet(dir)
      (System.nanoTime() - t0) / 1e9
    }
    val stored = spark.read.parquet(dir)
    // pair counts come from the warmup executions (timeMin warms once) —
    // never a fifth full re-band just to print them
    var nInc = -1L
    var nFull = -1L
    val tInc = ProfileSession.timeMin() {
      val n = graft.pipeline.Multimodal
        .incrementalPhashPairs(batch, stored).count()
      if (nInc < 0) nInc = n
      ()
    }
    val tFull = ProfileSession.timeMin() {
      val n = graft.pipeline.Multimodal.phashNearDupPairs(
        graft.pipeline.Multimodal.toMediaRecords(spark, docs)).count()
      if (nFull < 0) nFull = n
      ()
    }
    println(f"PROF mm8inc build=$tBuild%.3f s  ingest10pct=$tInc%.3f s  " +
      f"fullReband=$tFull%.3f s  pairsInc=$nInc  pairsFull=$nFull")
    spark.stop()
  }
}
