package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.LocalLayout

/** Layout compaction: semantic identity (same multiset of rows), real
  * parallelization, cache reuse, and mtime invalidation. */
class LocalLayoutSpec extends AnyFunSuite {

  lazy val spark = TestSessions.spark

  private def writeSingleGroup(rows: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_layout").toString
    // one file, one row group: coalesce(1) with a block size far above the
    // data size
    spark.range(rows.toLong)
      .select(col("id"), (col("id") % 97).as("k"),
        md5(col("id").cast("string")).as("payload"))
      .coalesce(1)
      .write.mode("overwrite")
      .option("parquet.block.size", (512L * 1024 * 1024).toString)
      .parquet(dir)
    // LocalLayout takes a FILE path (the driver's tables are single files)
    new java.io.File(dir).listFiles
      .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .get.getAbsolutePath
  }

  test("compacted read is the same multiset of rows, but parallel") {
    val path = writeSingleGroup(250000)
    val orig = spark.read.parquet(path)
    val comp = LocalLayout.compacted(spark, path)
    assert(comp.count() == orig.count())
    assert(comp.exceptAll(orig).count() == 0)
    assert(orig.exceptAll(comp).count() == 0)
    assert(comp.rdd.getNumPartitions > 1,
      s"expected a parallel scan, got ${comp.rdd.getNumPartitions} partition(s)")
  }

  test("small and already-well-grouped files pass through untouched") {
    val small = writeSingleGroup(1000)
    val df = LocalLayout.compacted(spark, small)
    // passthrough: reads the original path, not a cache copy
    assert(df.inputFiles.exists(_.contains(new java.io.File(small).getName)))
  }

  test("cache reuses across calls; a rewrite invalidates it") {
    val path = writeSingleGroup(150000)
    val first = LocalLayout.compacted(spark, path)
    val firstFiles = first.inputFiles.toSet
    assert(LocalLayout.compacted(spark, path).inputFiles.toSet == firstFiles)
    // touch mtime + change size => new cache key
    val f = new java.io.File(path)
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      java.nio.file.Files.readAllBytes(f.toPath) ++ Array[Byte]())
    f.setLastModified(f.lastModified + 5000)
    val second = LocalLayout.compacted(spark, path)
    assert(second.inputFiles.toSet != firstFiles)
  }

  test("env-gated default compacts an eligible file (round 8: opt-out flips it off)") {
    // SPARK_GRAFT_COMPACT is unset in tests: since round 8 the default is
    // compaction ON for eligible files (the driver's bench session sets no
    // env), and SPARK_GRAFT_COMPACT=0 is the opt-out
    val path = writeSingleGroup(150000)
    val df = LocalLayout.parquet(spark, path)
    assert(!df.inputFiles.exists(_.contains(new java.io.File(path).getName)),
      "expected the default entry point to serve the compacted cache copy")
    // an INELIGIBLE file (too small) still passes through untouched
    val small = writeSingleGroup(1000)
    val sm = LocalLayout.parquet(spark, small)
    assert(sm.inputFiles.exists(_.contains(new java.io.File(small).getName)))
  }
}
