package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: scan-only floor at two parallelism levels. */
object Probe5 {
  def run(cpus: Int): (Double, Double) = {
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (d, r) = BenchData.ensureBucketed(spark, "/root/testdata/sf0.1", 4000)
    val docs = spark.table(d)
    val ref = spark.table(r)
    def scan(): Unit = Bench.exec(
      docs.select(col("doc_id"), size(col("spans")).as("n"))
        .unionAll(ref.select(col("doc_id"), size(col("spans")).as("n"))))
    def joinOnly(): Unit = Bench.exec(
      docs.join(ref.select(col("doc_id"),
        col("spans").as("ref_spans")).hint("shuffle_hash"), Seq("doc_id"))
        .select(col("doc_id"), (size(col("spans")) +
          size(col("ref_spans"))).as("n")))
    scan(); joinOnly()
    val s = (1 to 2).map(_ => Bench.time(scan())).min
    val j = (1 to 2).map(_ => Bench.time(joinOnly())).min
    spark.stop()
    (s, j)
  }
  def main(args: Array[String]): Unit = {
    val (s8, j8) = run(8)
    val (s32, j32) = run(32)
    println(f"[probe5] scan n8=$s8%.2f n32=$s32%.2f eff=${s8/s32/4}%.3f; " +
      f"join n8=$j8%.2f n32=$j32%.2f eff=${j8/j32/4}%.3f")
  }
}
