package graft.tools

import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** Generation-merge cost A/B (round-14 #2) over the stored band index +
  * shingle sidecar, three legs, each ending with the next generation ON
  * DISK (a merge that is not persisted is not a generation swap):
  *
  *  - appendFiles: `bandIndexDeltaFor` / `shingleSetsDeltaFor` written
  *    with mode("append") into a copy of generation 0 — band rows are
  *    append-only, so appending the batch's rows IS the merge; IO is
  *    batch-proportional. (The g0 copy happens OUTSIDE the timed window.)
  *  - unionRewrite: `appendToBandIndex` / `appendToShingleSets` written
  *    whole — the one-shot compaction shape; banding is still
  *    batch-only but the write rewrites the corpus.
  *  - rebuild: full `bandIndex` / `shingleSets` over corpus ∪ batch —
  *    what a rolling pipeline pays at every swap WITHOUT the merge.
  *
  * Usage: runMain graft.tools.ProfileMerge [sfDir]
  */
object ProfileMerge {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val spark = ProfileSession.build()
    val docs = graft.sources.LocalLayout.parquet(spark, s"$sfDir/documents.parquet")
    val corpus = docs.where(col("doc_id") % 10 =!= 0)
    val batch = docs.where(col("doc_id") % 10 === 0)
    val root = java.nio.file.Files.createTempDirectory("graft_merge").toString
    Dedup.bandIndex(corpus, "doc_id", "text").write.parquet(s"$root/g0")
    Dedup.shingleSetStore(corpus, "doc_id", "text").write.parquet(s"$root/sh0")
    println(s"PROF merge dir=$sfDir gen0 rows=" +
      spark.read.parquet(s"$root/g0").count())
    def timeMin(f: Int => Unit): Double = (1 to 3).map { i =>
      System.gc(); Thread.sleep(100)
      val t0 = System.nanoTime(); f(i); (System.nanoTime() - t0) / 1e9
    }.min
    def copyDir(src: String, dst: String): Unit = {
      val s = java.nio.file.Paths.get(src); val d = java.nio.file.Paths.get(dst)
      scala.util.Using.resource(java.nio.file.Files.walk(s)) { walk =>
        walk.forEach { p =>
          val t = d.resolve(s.relativize(p))
          if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
          else {
            java.nio.file.Files.copy(p, t,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            ()
          }
          ()
        }
      }
    }
    // pre-copy g0/sh0 per run so the timed leg is ONLY the delta append
    (1 to 3).foreach { i =>
      copyDir(s"$root/g0", s"$root/ga$i"); copyDir(s"$root/sh0", s"$root/sa$i")
    }
    val tAppendFiles = timeMin { i =>
      Dedup.bandIndexDeltaFor(
          spark.read.parquet(s"$root/ga$i"), batch, "doc_id", "text")
        .write.mode("append").parquet(s"$root/ga$i")
      Dedup.shingleSetsDeltaFor(
          spark.read.parquet(s"$root/sa$i"), batch, "doc_id", "text")
        .write.mode("append").parquet(s"$root/sa$i")
    }
    val tUnion = timeMin { _ =>
      Dedup.appendToBandIndex(
          spark.read.parquet(s"$root/g0"), batch, "doc_id", "text")
        .write.mode("overwrite").parquet(s"$root/g1")
      Dedup.appendToShingleSets(
          spark.read.parquet(s"$root/sh0"), batch, "doc_id", "text")
        .write.mode("overwrite").parquet(s"$root/sh1")
    }
    val tRebuild = timeMin { _ =>
      Dedup.bandIndex(docs, "doc_id", "text")
        .write.mode("overwrite").parquet(s"$root/gf")
      Dedup.shingleSetStore(docs, "doc_id", "text")
        .write.mode("overwrite").parquet(s"$root/shf")
    }
    // the appended generation must equal the one-shot build
    val nApp = spark.read.parquet(s"$root/ga1").count()
    val nFull = spark.read.parquet(s"$root/gf").count()
    println(f"PROF merge appendFiles=$tAppendFiles%.2f s unionRewrite=$tUnion%.2f s " +
      f"rebuild=$tRebuild%.2f s rows app=$nApp full=$nFull")

    // DEGRADATION-then-COMPACTION: how much probe latency N accumulated
    // delta file-sets cost, and what one union-compaction buys back.
    // Generations: corpus = %10 in 5..9 indexed once, batches %10 = 0..3
    // delta-appended (index + sidecar), batch %10 = 4 is the PROBE. The
    // probe is the real serving operation (incrementalNearDupPairs over
    // the stored sidecar), timed over the N-append layout and again over
    // the compacted layout — identical rows, only file counts differ.
    import graft.pipeline.IndexMaintenance
    val corpusN = docs.where(col("doc_id") % 10 > 4)
    val probeBatch = docs.where(col("doc_id") % 10 === 4)
    val probeCorpus = docs.where(col("doc_id") % 10 =!= 4)
    Dedup.bandIndex(corpusN, "doc_id", "text").write.parquet(s"$root/dn")
    Dedup.shingleSetStore(corpusN, "doc_id", "text").write.parquet(s"$root/sn")
    (0 to 3).foreach { i =>
      val b = docs.where(col("doc_id") % 10 === i)
      Dedup.bandIndexDeltaFor(spark.read.parquet(s"$root/dn"), b, "doc_id", "text")
        .write.mode("append").parquet(s"$root/dn")
      Dedup.shingleSetsDeltaFor(spark.read.parquet(s"$root/sn"), b, "doc_id", "text")
        .write.mode("append").parquet(s"$root/sn")
    }
    def timeProbe(): Double = timeMin { _ =>
      Dedup.incrementalNearDupPairs(
          probeBatch, probeCorpus, spark.read.parquet(s"$root/dn"),
          "doc_id", "text",
          storedShingles = Some(spark.read.parquet(s"$root/sn")))
        .write.mode("overwrite").parquet(s"$root/probe_out")
    }
    val hIdx0 = IndexMaintenance.health(spark, s"$root/dn")
    val hSh0 = IndexMaintenance.health(spark, s"$root/sn")
    val tProbeAppended = timeProbe()
    val hIdx1 = IndexMaintenance.compactIndex(spark, s"$root/dn")
    val hSh1 = IndexMaintenance.compactIndex(spark, s"$root/sn",
      IndexMaintenance.rangeByIdLayout("__id"))
    val tProbeCompacted = timeProbe()
    println(f"PROF compaction idxFiles=${hIdx0.dataFiles}->${hIdx1.dataFiles} " +
      f"shFiles=${hSh0.dataFiles}->${hSh1.dataFiles} " +
      f"probeAppended=$tProbeAppended%.2f s probeCompacted=$tProbeCompacted%.2f s")
    spark.stop()
  }
}
