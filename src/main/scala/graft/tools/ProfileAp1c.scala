package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: INTERLEAVED A/B of the two median pick-pass forms — the host
  * drifts ±30% across minutes, so alternating runs in one session is the
  * only honest comparison (round 11). */
object ProfileAp1c {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val spark = ProfileSession.build()
    graft.mesh.Fixtures.registerRaw(spark, sfDir)
    val li = spark.table("lineitem")
    import graft.pipeline.Sketches

    def mkOld() = {
      val samp = Sketches
        .hashSample(li, Seq("l_orderkey", "l_linenumber"), oneIn = 10)
        .select(col("l_returnflag"), col("l_extendedprice").as("price"))
      Sketches.groupedLowerMedian(samp, "l_returnflag", "price")
    }
    def mkNew() = Sketches.groupedLowerMedianFiltered(
      li.select(col("l_returnflag"), col("l_extendedprice").as("price"),
        col("l_orderkey"), col("l_linenumber")),
      graft.functions.HashFunctions
        .md5_key48(col("l_orderkey"), col("l_linenumber")) % 10 === 0,
      "l_returnflag", "price")

    def mkOldFull() = {
      val kmv = Sketches.kmvDistinct(li, "l_returnflag", "l_partkey", k = 64)
      val med = mkOld()
        .select(col("l_returnflag"), round(col("p50"), 2).as("p50_sample"))
      kmv.join(med, "l_returnflag")
        .select(col("l_returnflag"), col("exact_parts"), col("kmv_parts"),
          col("p50_sample"))
        .orderBy(col("l_returnflag"))
    }
    def mkNewFull() = graft.SparkEntry.queries("ap1_approx_agg")(spark, sfDir)

    mkOld().count(); mkNew().count(); mkOldFull().count(); mkNewFull().count()
    val n = args.drop(1).headOption.map(_.toInt).getOrElse(7)
    val cases = Seq(
      "med_old" -> (() => mkOld()), "med_new" -> (() => mkNew()),
      "full_old" -> (() => mkOldFull()), "full_new" -> (() => mkNewFull()))
    val acc = cases.map { case (name, _) => name -> Array.ofDim[Double](n) }.toMap
    for (i <- 0 until n; (name, mk) <- cases) {
      System.gc(); Thread.sleep(100)
      val t0 = System.nanoTime(); mk().count()
      acc(name)(i) = (System.nanoTime() - t0) / 1e9
    }
    cases.foreach { case (name, _) =>
      val ts = acc(name)
      println(f"PROF $name%-10s min=${ts.min}%.3f (${ts.map(t => f"$t%.3f").mkString(", ")})")
    }
    spark.stop()
  }
}
