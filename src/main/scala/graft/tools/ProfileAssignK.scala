package graft.tools

import org.apache.spark.sql.functions._

/** A/B of the two cluster-assignment paths at growing k (round-12 #1):
  * the constant-matrix VectorScores projection vs the broadcast-join +
  * bounded-heap argmax (`Similarity.assignClustersJoin`), over the sf1
  * embeddings at k = 64 / 256 / 1024 / 4096. Prints min-of-3 timings per
  * path plus a row-for-row agreement count (must be 0 disagreements) —
  * the measurement behind `Similarity.joinAssignK` and the SCALE.md row.
  */
object ProfileAssignK {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val spark = ProfileSession.build()
    graft.mesh.Fixtures.registerRaw(spark, sfDir)
    val emb = spark.table("embeddings")
    println(s"PROF rows=${emb.count()} dir=$sfDir")

    def exprAssign(cents0: Seq[Seq[Double]]) = {
      // assignClusters' exact spelling (assignExpr is private): normalize
      // like the public entry points do — centroidFrame applies the same
      // normalize, so the two paths score bit-identical floats — then k
      // dots as ONE reference-object expression, first-max-wins argmax
      val unit = cents0.map { c =>
        val n = math.sqrt(c.map(x => x * x).sum)
        if (n == 0) c else c.map(_ / n)
      }
      val v = graft.pipeline.Similarity.withNorm(emb, "vec_id", "embedding")
        .where(col("nrm") > 0)
      val scores = graft.functions.VectorFunctions.vec_scores(
        col("__v"), unit.map(_.map(_.toFloat)), unit.map(_ => 0.0))
      v.withColumn("cid",
          coalesce((array_position(scores, array_max(scores)) - 1).cast("int"),
            lit(-1)))
        .select(col("__id"), col("cid"))
    }

    val ks = args.drop(1).headOption
      .map(_.split(",").toSeq.map(_.trim.toInt))
      .getOrElse(Seq(64, 256, 1024, 4096))
    for (k <- ks) {
      val seedIds = emb.select(col("vec_id").cast("long"))
        .orderBy("vec_id").limit(k).collect().map(_.getLong(0)).toSeq
      // iters = 0: unit-normalized seed vectors only (index-build state)
      val cents = graft.pipeline.Similarity.sphericalKMeans(
        emb, "vec_id", "embedding", seedIds = seedIds, iters = 0)
      val exprDF = exprAssign(cents)
      val joinDF = graft.pipeline.Similarity.assignClustersJoin(
        emb, "vec_id", "embedding",
        graft.pipeline.Similarity.centroidFrame(spark, cents))
      val tExpr = ProfileSession.timeMin() {
        exprDF.agg(sum(col("cid"))).collect()
      }
      val tJoin = ProfileSession.timeMin() {
        joinDF.agg(sum(col("cid"))).collect()
      }
      val disagree = exprDF.as("a")
        .join(joinDF.withColumnRenamed("cid", "cid2"), Seq("__id"))
        .where(col("cid") =!= col("cid2")).count()
      println(f"PROF k=$k%-5d expr=$tExpr%.3f s  join=$tJoin%.3f s  disagree=$disagree")
    }
    spark.stop()
  }
}
