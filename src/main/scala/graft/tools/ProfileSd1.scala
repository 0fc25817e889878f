package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off profiling of sd1's phases: plan construction/optimization vs
  * execution, and the assign projection vs the pair join. */
object ProfileSd1 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label%-32s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    graft.mesh.Fixtures.registerRaw(spark, sfDir)
    val emb = spark.table("embeddings")
    t("embeddings count")(emb.count())
    val cents = t("seedCentroids collect")(
      graft.pipeline.Similarity.seedCentroids(emb, "vec_id", "embedding", 0L until 16L))
    // warm
    t("warm full")(graft.pipeline.Similarity
      .semanticDedupSeeded(emb, "vec_id", "embedding", cents).count())
    (1 to 2).foreach { i =>
      val df = t(s"build df $i")(graft.pipeline.Similarity
        .semanticDedupSeeded(emb, "vec_id", "embedding", cents))
      t(s"optimize $i")(df.queryExecution.optimizedPlan)
      t(s"execute $i")(df.count())
    }
    // sub-stages
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions.{vec_dot => dot}
    val v = graft.pipeline.Similarity.withNorm(emb, "vec_id", "embedding")
    t("v count")(v.count())
    val scores = array(cents.map { case (_, cv, cn) =>
      round(dot(col("__v"), array(cv.map(lit(_)): _*)) / (col("nrm") * lit(cn)), 6)
    }.toIndexedSeq: _*)
    val assign = v.withColumn("cid",
      (array_position(scores, array_max(scores)) - 1).cast("int"))
    t("assign count (warm)")(assign.count())
    t("assign count 2")(assign.count())
    val pairs = assign.as("a").join(assign.as("b"),
        col("a.cid") === col("b.cid") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("va"), col("b.__id").as("vb"),
        round(dot(col("a.__v"), col("b.__v")) / (col("a.nrm") * col("b.nrm")), 6)
          .as("cos"))
      .where(col("cos") >= 0.4)
    t("pairs count (warm)")(pairs.count())
    t("pairs count 2")(pairs.count())
    val out = pairs.groupBy(col("vb").as("vec_id"))
      .agg(min(col("va")).as("keeper"), max(col("cos")).as("max_cos"))
      .orderBy(col("vec_id"))
    t("full tail (warm)")(out.count())
    t("full tail 2")(out.count())
    spark.stop()
  }
}
