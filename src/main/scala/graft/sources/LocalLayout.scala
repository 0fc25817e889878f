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
  * Default ON since round 8 (opt out per-session with
  * SPARK_GRAFT_COMPACT=0): the original A/B that measured it neutral
  * (±0.1 s) predates the codegen-cache fix — with Janino recompilation
  * no longer drowning every stage, the serial-decode stages are a real
  * share of the suite again, and the full-bench A/B now reads
  * 21.4 s → 20.7 s at sf0.1 (ap1's md5-filter scan alone 0.81 → 0.61).
  * The rewrite is cached per (path, mtime, size) so repeated sessions
  * pay it once, during warmup.
  */
object LocalLayout {

  /** Compact only when the scan would otherwise be effectively serial. */
  private val MinRows = 100000L
  private val MinBytes = 8L * 1024 * 1024

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

  /** Env-gated entry the fixtures use: compaction on by default,
    * SPARK_GRAFT_COMPACT=0 opts the session out. */
  def parquet(spark: SparkSession, path: String): DataFrame =
    if (sys.env.get("SPARK_GRAFT_COMPACT").contains("0")) spark.read.parquet(path)
    else compacted(spark, path)

  /** Read `path` as parquet, compacting when eligible (see object doc). */
  def compacted(spark: SparkSession, path: String): DataFrame = {
    val f = new java.io.File(path)
    if (!f.isFile) return spark.read.parquet(path) // dirs: already multi-file
    val (rows, groups) = try rowGroupStats(path) catch {
      case _: Throwable => return spark.read.parquet(path)
    }
    val cores = spark.sparkContext.defaultParallelism
    // eligibility is rows OR bytes: a 50k-row documents table is few rows
    // but tens of MB of text — a single row group still serializes every
    // text-kernel scan (measured: rt1's two corpus passes at the derived
    // sf1 ran ~1 s single-threaded)
    if ((rows < MinRows && f.length < MinBytes) || groups >= math.min(8, cores))
      return spark.read.parquet(path)
    // ~50k rows or ~8 MB per part, capped at the session width: the heavy
    // expression-over-scan stages (ap1/ap2's per-row md5 filters) are
    // CPU-bound in the scan stage, and 150k-row parts left them 4-wide
    // on 32 cores (A/B: full sf0.1 bench 28.2 -> 26.5 s, ap1 0.64 ->
    // 0.43 s); the extra task-scheduling cost on cheap scans is noise
    val parts = math.min(cores, math.max(4,
      math.max(rows / 50000L, f.length / MinBytes).toInt))
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
