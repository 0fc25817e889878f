package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: replicate the driver's smoke check (entry rows > 0 at
  * sf0.001). */
object SmokeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"SMOKE rows=${graft.SparkEntry.entry(spark).count()}")
    spark.stop()
  }
}
