package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.GraftBridge

/** Scratch: v_json_schema with vs without the trailing sort. */
object Probe7 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def sorted = SparkEntry.queries("v_json_schema")(spark, dir)
    def unsorted = GraftBridge.stripTopSort(sorted)
    Bench.exec(unsorted) // warm
    val tU = (1 to 2).map(_ => Bench.time(Bench.exec(unsorted))).min
    val tS = (1 to 2).map(_ => Bench.time(Bench.exec(sorted))).min
    println(f"[probe7] unsorted=$tU%.2f sorted=$tS%.2f")
    spark.stop()
  }
}
