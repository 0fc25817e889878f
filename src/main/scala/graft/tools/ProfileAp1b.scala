package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: raw component costs behind ap1 — how much of the KMV and
  * sample passes is md5 vs scan vs exchange (round 11). */
object ProfileAp1b {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val spark = ProfileSession.build()
    graft.mesh.Fixtures.registerRaw(spark, sfDir)
    val li = spark.table("lineitem")
    import graft.functions.HashFunctions.md5_key48

    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.count()
      val ts = (1 to 3).map { _ =>
        System.gc(); Thread.sleep(100)
        val t0 = System.nanoTime(); mk.count(); (System.nanoTime() - t0) / 1e9
      }
      println(f"PROF $name%-26s min=${ts.min}%.3f s (${ts.map(t => f"$t%.3f").mkString(", ")})")
    }

    time("scan_2col")(li.select("l_returnflag", "l_partkey")
      .where(col("l_partkey") % 7 =!= -1))
    time("scan_md5_all")(li.select(col("l_returnflag"),
      md5_key48(col("l_partkey")).as("hv")).where(col("hv") =!= -1))
    time("distinct_int")(li.select("l_returnflag", "l_partkey").distinct())
    time("distinct_md5")(li.select(col("l_returnflag"),
      md5_key48(col("l_partkey")).as("hv")).distinct())
    time("dedupfirst_then_md5")(li.select("l_returnflag", "l_partkey").distinct()
      .select(col("l_returnflag"), md5_key48(col("l_partkey")).as("hv"))
      .distinct())
    time("sample_filter_md5")(li
      .where(md5_key48(col("l_orderkey"), col("l_linenumber")) % 10 === 0)
      .select("l_returnflag", "l_extendedprice"))
    // packed single-long distinct: ascii(rf) in the top bits, hv below —
    // does a primitive-key hash map beat the (string, long) row map?
    time("distinct_packed")(li.select(
        (ascii(col("l_returnflag")).cast("long") * lit(1L << 48)
          + md5_key48(col("l_partkey"))).as("k"))
      .distinct())
    time("distinct_packed_int")(li.select(
        (ascii(col("l_returnflag")).cast("long") * lit(1L << 48)
          + col("l_partkey")).as("k"))
      .distinct())
    spark.stop()
  }
}
