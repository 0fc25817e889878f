package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** Job accounting for the stored-shingles candidate-id decision
  * (round-15 #6): the former shape collected up to 100k+1 distinct ids
  * on the driver EVERY ingest just to decide In-filter vs semi-join —
  * discarded whenever the fallback join was taken. The new shape proves
  * a typical ingest under the bound with a block-scan count of the
  * checkpointed pair list (no id materialization at all), and only an
  * ambiguous ingest pays one id-set checkpoint + count (then reused by
  * both join consumers). This probe counts Spark jobs and driver-fetched
  * result bytes per configuration.
  *
  * Usage: runMain graft.tools.ProfileIngestDecision [sfDir]
  */
object ProfileIngestDecision {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val spark = ProfileSession.build()
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    val docs = graft.sources.LocalLayout.parquet(spark, s"$sfDir/documents.parquet")
    val corpus = docs.where(col("doc_id") % 10 =!= 0)
    val batch = docs.where(col("doc_id") % 10 === 0)
    val index = Dedup.bandIndex(corpus, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    index.count()
    val store = Dedup.shingleSetStore(corpus, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    store.count()
    def run(label: String, inList: Long): Unit = {
      (1 to 2).foreach { i =>
        Thread.sleep(300)
        jobs.set(0)
        val t0 = System.nanoTime()
        val n = Dedup.incrementalNearDupPairs(
            batch, corpus, index, "doc_id", "text",
            storedShingles = Some(store), inListMaxIds = inList)
          .count()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        if (i == 2)
          println(f"PROF ingest-decision $label%-22s jobs=${jobs.get()}%3d " +
            f"wall=$dt%.2f s pairs=$n")
      }
    }
    run("inlist(under-bound)", 100000L)
    run("ambiguous(exact-count)", 1L)
    spark.stop()
  }
}
