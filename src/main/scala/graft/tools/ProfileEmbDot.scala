package graft.tools

import org.apache.spark.sql.functions._

/** emb1 integer-dot A/B (round 12): the interpreted
  * aggregate(zip_with(..)) lambda spelling vs the native VectorDotI64
  * codegen'd loop, same session, min-of-3 — both compute the identical
  * exact-long cosine parts, so the frames are value-equal by
  * construction (asserted). */
object ProfileEmbDot {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val spark = ProfileSession.build()
    graft.mesh.Fixtures.registerRaw(spark, sfDir)
    val vecs = spark.table("embeddings")
    val v = vecs.select(col("vec_id"), col("label"),
      expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")
        .as("vu"))
    val cent = v
      .select(col("label"), posexplode(col("vu")).as(Seq("pos", "u")))
      .groupBy("label", "pos")
      .agg(expr("sum(u) DIV count(*)").as("cu"))
      .groupBy("label")
      .agg(expr("transform(array_sort(collect_list(struct(pos, cu))), s -> s.cu)")
        .as("carr"))
      .localCheckpoint() // shared: the A/B times the scoring pass only
    def score(dot: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
        org.apache.spark.sql.Column) =
      v.join(broadcast(cent), "label")
        .select(col("vec_id"), col("label"),
          round(dot(col("vu"), col("carr")) /
            (sqrt(dot(col("vu"), col("vu")).cast("double")) *
              sqrt(dot(col("carr"), col("carr")).cast("double"))), 6)
            .as("centroid_cos"))
    def lambdaDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
      val an = a.toString; val bn = b.toString
      expr(s"aggregate(zip_with($an, $bn, (x, y) -> x * y), CAST(0 AS BIGINT), (s, x) -> s + x)")
    }
    val nativeDf = score(graft.functions.VectorFunctions.vec_dot_i64)
    val lambdaDf = score(lambdaDot)
    val d = nativeDf.as("a").join(lambdaDf.as("b"), Seq("vec_id"))
      .where(col("a.centroid_cos") =!= col("b.centroid_cos")).count()
    println(s"PROF disagree=$d rows=${nativeDf.count()}")
    val tL = ProfileSession.timeMin() { lambdaDf.agg(sum("centroid_cos")).collect() }
    val tN = ProfileSession.timeMin() { nativeDf.agg(sum("centroid_cos")).collect() }
    println(f"PROF lambda=$tL%.3f s  native=$tN%.3f s")
    spark.stop()
  }
}
