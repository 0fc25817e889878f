package graft.tools

import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** dd11 verification-path A/B (round-14 #1): the SAME stored-index ingest
  * probe, verified (a) off the stored shingle-set sidecar vs (b) by
  * re-reading candidate docs' text. Index and sidecar are persisted
  * up-front like production stored state, so the timed delta is purely
  * the verification path. Usage: runMain graft.tools.ProfileDd11Store [sfDir]
  */
object ProfileDd11Store {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val spark = ProfileSession.build()
    val docs = graft.sources.LocalLayout.parquet(spark, s"$sfDir/documents.parquet")
    val corpus = docs.where(col("doc_id") % 10 =!= 0)
    val batch = docs.where(col("doc_id") % 10 === 0)
    val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val index = Dedup.bandIndex(corpus, "doc_id", "text").persist(level)
    val store = Dedup.shingleSetStore(corpus, "doc_id", "text").persist(level)
    println(s"PROF dd11ab dir=$sfDir index=${index.count()} store=${store.count()}")
    def timeMin(f: => Unit): Double = (1 to 3).map { _ =>
      System.gc(); Thread.sleep(100)
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.min
    def run(ss: Option[org.apache.spark.sql.DataFrame]): Double = {
      def probe(): Unit = {
        Dedup.incrementalNearDupPairs(batch, corpus, index, "doc_id", "text",
          storedShingles = ss).count()
        ()
      }
      probe() // warm
      timeMin(probe())
    }
    val tText = run(None)
    val tStore = run(Some(store.toDF()))
    println(f"PROF dd11ab stored=$tStore%.2f s textReread=$tText%.2f s " +
      f"delta=${tText - tStore}%.2f s")
    spark.stop()
  }
}
