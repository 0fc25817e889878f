package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.mesh.Fixtures
import graft.pipeline.Dedup

/** Dev-only profiling harness for the MinHash/LSH chain: times each stage
  * of dd2/dm2 in isolation so optimization targets measured cost, not
  * guesses. Not part of the driver contract. */
object ProfileDedup {
  private def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Fixtures.registerRaw(spark, sfDir)
    val docs = spark.table("documents")

    // warmup: JVM/codegen/parquet footers
    t("warmup full pairs")(Dedup.minhashLshPairs(docs, "doc_id", "text").count())

    // cold stage-by-stage (fresh plans each time; nothing persisted across)
    t("shingles count") {
      docs.select(col("doc_id").as("__id"),
        explode(graft.functions.TextFunctions.word_ngrams(col("text"), 3))
          .as("shingle")).count()
    }
    t("signatures count") {
      Dedup.bandIndex(docs, "doc_id", "text").count()
    }
    t("full pairs (timed)")(Dedup.minhashLshPairs(docs, "doc_id", "text").count())
    t("full pairs again")(Dedup.minhashLshPairs(docs, "doc_id", "text").count())
    t("full pairs fastHash")(
      Dedup.minhashLshPairs(docs, "doc_id", "text", fastHash = true).count())
    t("fast sigs only")(
      Dedup.bandIndex(docs, "doc_id", "text", fastHash = true).count())
    t("md5 sigs only")(
      Dedup.bandIndex(docs, "doc_id", "text").count())

    // inside the pairs chain, step by step (mirrors minhashLshPairs)
    {
      val cand = t("cand persist+count") {
        val c = Dedup.lshCandidates(Dedup.bandIndex(docs, "doc_id", "text"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        c.count(); c
      }
      val candIds = cand.select(col("da").as("__cid"))
        .union(cand.select(col("db").as("__cid"))).distinct()
      val candDocs = t("candDocs count")(
        { val d = docs.join(broadcast(candIds), col("doc_id") === col("__cid"), "left_semi"); d.count(); d })
      val shCand = t("shCand persist+count") {
        val s2 = Dedup.shingles(candDocs, "doc_id", "text")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        s2.count(); s2
      }
      t("verify count")(
        Dedup.jaccardVerify(shCand, cand, 0.8)
          .withColumn("jaccard", round(col("jaccard"), 4))
          .orderBy(col("doc_a"), col("doc_b")).count())
      t("verify localCheckpoint")(
        Dedup.jaccardVerify(shCand, cand, 0.8)
          .withColumn("jaccard", round(col("jaccard"), 4))
          .orderBy(col("doc_a"), col("doc_b")).localCheckpoint().count())
      cand.unpersist(); shCand.unpersist()
    }

    // dm2 shape
    val entity = {
      import graft.catalog._
      val allCols = Set("doc_id", "text", "lang", "source", "n_chars")
      def slice(id: String, filt: String) = DataSource(
        id = id,
        sourceSql = s"SELECT * FROM raw_documents WHERE $filt",
        mappings = Fixtures.documentsEntity.informations
          .map(i => FieldMapping(i.name, i.name)),
        defaultPermission = SourcePermission(allCols, "true"))
      val mesh = Mesh(Map("global" -> Site("global",
        entities = Map("documents" -> Fixtures.documentsEntity),
        localSources = Map("documents" -> Seq(
          slice("docs_even", "doc_id % 2 = 0"),
          slice("docs_odd", "doc_id % 2 = 1"))))))
      graft.mesh.EntityResolver
        .resolve(spark, mesh, "global", "documents", user = None, withProvenance = true)
    }
    t("dm2 entity count")(entity.count())
    t("dm2 pairs on entity")(Dedup.minhashLshPairs(entity, "doc_id", "text").count())
    spark.stop()
  }
}
