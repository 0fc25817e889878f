package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-layout compaction for scan parallelism — the local analogue of
  * Delta OPTIMIZE / Iceberg rewrite_data_files.
  *
  * Spark parallelizes a parquet scan at ROW-GROUP granularity: a file
  * written as one big row group (pandas/pyarrow defaults on small tables)
  * can never decode on more than one core, no matter how many executors
  * exist — every downstream expression in the scan stage (decode, pushed
  * filters, partial aggregates) serializes behind it. At cluster scale the
  * same pathology appears as the small-file/giant-row-group problem, and
  * every production table format ships a compaction pass for it; this is
  * that pass for plain parquet paths, cached per (path, mtime, size) under
  * the JVM temp dir so repeated sessions (verify, bench, tests) reuse one
  * rewrite.
  *
  * Row order is NOT preserved (hash repartition) — callers must not depend
  * on physical row order, which no mesh/pipeline operator does (every
  * oracled query orders deterministically; the driver compare sorts).
  *
  * Default OFF for the shared fixture tables: measured at sf0.1 the mesh
  * queries already parallelize their scans through the 3-way slice union,
  * and per-query A/B showed the extra task/footer setup cancels the decode
  * win (net ±0.1 s). It pays where a SINGLE scan feeds heavy per-row
  * compute (2x on md5-filter stages — LocalLayoutSpec's profile shape), so
  * it stays available per-session via SPARK_GRAFT_COMPACT=1 or the
  * explicit [[compacted]] entry point.
  */
object LocalLayout {

  /** Compact only when the scan would otherwise be effectively serial. */
  private val MinRows = 100000L

  private val lock = new Object

  private def rowGroupStats(path: String): (Long, Int) = {
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(path),
        new org.apache.hadoop.conf.Configuration()))
    try {
      val rows = reader.getRecordCount
      val groups = reader.getRowGroups.size()
      (rows, groups)
    } finally reader.close()
  }

  /** Env-gated entry the fixtures use: passthrough unless
    * SPARK_GRAFT_COMPACT=1 opts the session in. */
  def parquet(spark: SparkSession, path: String): DataFrame =
    if (sys.env.get("SPARK_GRAFT_COMPACT").contains("1")) compacted(spark, path)
    else spark.read.parquet(path)

  /** Read `path` as parquet, compacting when eligible (see object doc). */
  def compacted(spark: SparkSession, path: String): DataFrame = {
    val f = new java.io.File(path)
    if (!f.isFile) return spark.read.parquet(path) // dirs: already multi-file
    val (rows, groups) = try rowGroupStats(path) catch {
      case _: Throwable => return spark.read.parquet(path)
    }
    val cores = spark.sparkContext.defaultParallelism
    if (rows < MinRows || groups >= math.min(8, cores))
      return spark.read.parquet(path)
    val parts = math.min(16, math.max(4, (rows / 150000L).toInt))
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${f.getAbsolutePath}:${f.lastModified}:${f.length}:$parts"
        .getBytes("UTF-8")).map("%02x".format(_)).mkString
    val cacheRoot = new java.io.File(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_layout_cache")
    val cache = new java.io.File(cacheRoot, key)
    lock.synchronized {
      if (!new java.io.File(cache, "_SUCCESS").exists) {
        // write-to-temp + atomic rename: concurrent JVMs race safely (the
        // loser deletes its temp and reads the winner's cache)
        val tmp = new java.io.File(cacheRoot,
          s"$key.tmp.${java.lang.ProcessHandle.current.pid}")
        spark.read.parquet(path).repartition(parts)
          .write.mode("overwrite").parquet(tmp.getAbsolutePath)
        if (!tmp.renameTo(cache)) {
          def rm(x: java.io.File): Unit = {
            if (x.isDirectory) Option(x.listFiles).foreach(_.foreach(rm))
            x.delete(): Unit
          }
          rm(tmp)
          require(new java.io.File(cache, "_SUCCESS").exists,
            s"layout cache rename failed and no winner present: $cache")
        }
      }
    }
    spark.read.parquet(cache.getAbsolutePath)
  }
}
