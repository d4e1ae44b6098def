package graft

import org.apache.spark.sql.SparkSession

/** Smoke entry: runs the flagship pipeline exactly as the driver does and
  * prints its row count + a sample, so `SparkEntry.entry` is exercisable
  * from the CLI.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    df.show(25, truncate = false)
    println(s"[smoke] entry rows=${df.count()}")
    spark.stop()
  }
}
