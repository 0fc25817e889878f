package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: ap1's cost split — the KMV distinct pass vs the sampled
  * median's two scans — to target the sf1 weak-list work (round 11). */
object ProfileAp1 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val spark = ProfileSession.build()
    graft.mesh.Fixtures.registerRaw(spark, sfDir)
    val li = spark.table("lineitem")

    import graft.pipeline.Sketches
    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.count() // warm
      val ts = (1 to 3).map { _ =>
        System.gc(); Thread.sleep(100)
        val t0 = System.nanoTime(); mk.count(); (System.nanoTime() - t0) / 1e9
      }
      println(f"PROF $name%-22s min=${ts.min}%.3f s (${ts.map(t => f"$t%.3f").mkString(", ")})")
    }

    time("kmv")(Sketches.kmvDistinct(li, "l_returnflag", "l_partkey", k = 64))
    val samp = Sketches
      .hashSample(li, Seq("l_orderkey", "l_linenumber"), oneIn = 10)
      .select(col("l_returnflag"), col("l_extendedprice").as("price"))
    time("sample_only")(samp)
    time("median")(Sketches.groupedLowerMedian(samp, "l_returnflag", "price"))
    time("median_filtered")(Sketches.groupedLowerMedianFiltered(
      li.select(col("l_returnflag"), col("l_extendedprice").as("price"),
        col("l_orderkey"), col("l_linenumber")),
      graft.functions.HashFunctions
        .md5_key48(col("l_orderkey"), col("l_linenumber")) % 10 === 0,
      "l_returnflag", "price"))
    time("full_ap1")(graft.SparkEntry.queries("ap1_approx_agg")(spark, sfDir))
    spark.stop()
  }
}
