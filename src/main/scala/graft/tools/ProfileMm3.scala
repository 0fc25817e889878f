package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe for the mm3 video path: is the persisted corpus reused, and
  * what do encode vs decode cost at the bench settings? */
object ProfileMm3 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROFILE $label%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    val docs = graft.sources.LocalLayout.parquet(spark, s"$sfDir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
    timed("encode (no cache)") {
      graft.pipeline.Multimodal.toVideoRecords(spark, docs).count()
    }
    timed("encode again") {
      graft.pipeline.Multimodal.toVideoRecords(spark, docs).count()
    }
    val cached = graft.pipeline.Multimodal.toVideoRecords(spark, docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("cache build") { cached.count() }
    timed("cached count") { cached.count() }
    timed("decode stride2") {
      graft.pipeline.Multimodal.sampleVideoStats(cached, 2).count()
    }
    timed("decode stride2 again") {
      graft.pipeline.Multimodal.sampleVideoStats(cached, 2).count()
    }
    val single = graft.sources.LocalLayout.parquet(spark, s"$sfDir/documents.parquet")
    val cached1 = graft.pipeline.Multimodal.toVideoRecords(spark, single)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("1-part cache build") { cached1.count() }
    timed("1-part decode") {
      graft.pipeline.Multimodal.sampleVideoStats(cached1, 2).count()
    }
    spark.stop()
  }
}
