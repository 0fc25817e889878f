package graft.tools

import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, IndexMaintenance}

/** File-count degradation curve for delta-appended stored indexes: where
  * does small-file accumulation actually start to cost a probe on THIS
  * rig, and what does one compaction buy back? ProfileMerge's 4-append
  * state (160 files) measured flat — this tool QUADRUPLES the file
  * count per step by re-appending the SAME batch rows into
  * throwaway copies (row content equal per step is irrelevant here; the
  * probe's open/footer cost depends only on the file layout), then times
  * a SCAN-BOUND probe (full index read + bucket-group count — the
  * candidate join's input side) at each file count and after compaction.
  *
  * Usage: runMain graft.tools.ProfileCompaction [sfDir] [steps]
  */
object ProfileCompaction {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val steps = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val spark = ProfileSession.build()
    val docs = graft.sources.LocalLayout.parquet(spark, s"$sfDir/documents.parquet")
    val corpus = docs.where(col("doc_id") % 10 =!= 0)
    val batch = docs.where(col("doc_id") % 10 === 0)
    val root = java.nio.file.Files.createTempDirectory("graft_pc").toString
    val dir = s"$root/idx"
    Dedup.bandIndex(corpus, "doc_id", "text").write.parquet(dir)
    val delta = Dedup.bandIndexDeltaFor(
        spark.read.parquet(dir), batch, "doc_id", "text")
      .localCheckpoint()
    def timeMin(f: => Unit): Double = (1 to 3).map { _ =>
      System.gc(); Thread.sleep(100)
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.min
    // scan-bound probe: read every live file, bucket-group, count — the
    // shape of the candidate join's index side without the batch work
    def probe(): Unit = {
      spark.read.parquet(dir)
        .groupBy(col("band"), col("bsig")).count()
        .where(col("count") > 1).count()
      ()
    }
    var appends = 1
    (1 to steps).foreach { step =>
      // quadruple the file count per step by appending the delta 4x more
      val target = appends * 4
      while (appends < target) {
        delta.write.mode("append").parquet(dir)
        appends += 1
      }
      val h = IndexMaintenance.health(spark, dir)
      val t = timeMin(probe())
      println(f"PROF filecurve appends=$appends%4d files=${h.dataFiles}%6d " +
        f"bytes=${h.bytes / (1 << 20)}%5d MiB probe=$t%.2f s")
    }
    IndexMaintenance.compactIndex(spark, dir)
    val hc = IndexMaintenance.health(spark, dir)
    val tc = timeMin(probe())
    println(f"PROF filecurve compacted files=${hc.dataFiles}%6d " +
      f"bytes=${hc.bytes / (1 << 20)}%5d MiB probe=$tc%.2f s")
    spark.stop()
  }
}
