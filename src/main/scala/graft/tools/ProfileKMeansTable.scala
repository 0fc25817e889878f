package graft.tools

import org.apache.spark.sql.functions._

/** Table-state centroid training cost (round-13 #1): times
  * `Similarity.sphericalKMeansTable` — the distributed Lloyd loop whose
  * centroid state never touches the driver — across a k sweep up to the
  * k = 65536 the round-12 verdict flagged as the Seq trainer's driver
  * funnel, over the given corpus. Small k also A/Bs against the
  * driver-Seq trainer (`sphericalKMeans`) so the table machinery's
  * overhead at the SMALL end is on record too. Rates follow
  * semanticDedupScaled's ~64-points-per-centroid rule.
  *
  * Usage: runMain graft.tools.ProfileKMeansTable [sfDir] [k1,k2,...]
  */
object ProfileKMeansTable {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val ks = args.drop(1).headOption
      .map(_.split(",").toSeq.map(_.trim.toInt))
      .getOrElse(Seq(1024, 16384, 65536))
    val spark = ProfileSession.build()
    graft.mesh.Fixtures.registerRaw(spark, sfDir)
    val emb = spark.table("embeddings")
    val n = emb.count()
    println(s"PROF rows=$n dir=$sfDir")
    for (k <- ks) {
      val rate = math.min(256L,
        math.max(1L, (256L * 64L * k) / math.max(n, 1L))).toInt
      def trainTable(): Unit =
        graft.pipeline.Similarity.sphericalKMeansTable(
            emb, "vec_id", "embedding", k, iters = 2, rate = rate)
          .agg(sum(element_at(col("cv"), 1))).collect()
      // index builds are one-shot: time a single cold-ish run at large k
      // (min-of-3 would triple a multi-minute training for no new signal),
      // min-of-3 at small k where the Seq A/B needs comparable hygiene
      val t =
        if (k > 20000) {
          System.gc(); Thread.sleep(100)
          val t0 = System.nanoTime(); trainTable()
          (System.nanoTime() - t0) / 1e9
        } else ProfileSession.timeMin()(trainTable())
      val seqT =
        if (k <= 4096) {
          val seedIds = emb.select(col("vec_id").cast("long"))
            .orderBy("vec_id").limit(k).collect().map(_.getLong(0)).toSeq
          // SAME sample rate as the table side (sphericalKMeansSampled
          // delegates to the full trainer at rate = 256), so the A/B
          // isolates the table machinery, never a sampling difference
          Some(ProfileSession.timeMin() {
            graft.pipeline.Similarity.sphericalKMeansSampled(
              emb, "vec_id", "embedding", seedIds, iters = 2, rate = rate)
            ()
          })
        } else None
      println(f"PROF kmeans k=$k%-6d rate=$rate%-3d table=$t%.3f s" +
        seqT.map(s => f"  seq=$s%.3f s").getOrElse(""))
    }
    spark.stop()
  }
}
