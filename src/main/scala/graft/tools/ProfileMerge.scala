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
      java.nio.file.Files.walk(s).forEach { p =>
        val t = d.resolve(s.relativize(p))
        if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
        else { java.nio.file.Files.copy(p, t); () }
        ()
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
    spark.stop()
  }
}
