package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: does CollapseProject re-inline split() into HOF lambdas when
  * the staging repartition barrier is removed? Counts `split(` occurrences
  * in the physical plan with and without the barrier.
  */
object Probe6 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")

    def shingles(w: org.apache.spark.sql.Column) = {
      val n = size(w)
      array_distinct(when(n >= 3,
        transform(sequence(lit(1), n - 2), i => concat_ws(" ",
          element_at(w, i), element_at(w, i + 1), element_at(w, i + 2))))
        .otherwise(array().cast("array<string>")))
    }

    val noBarrier = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), shingles(col("w")).as("sh"))
    val withBarrier = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .repartition(4)
      .select(col("doc_id"), shingles(col("w")).as("sh"))
    val inline = docs
      .select(col("doc_id"), shingles(split(col("text"), " ")).as("sh"))

    def countSplit(df: org.apache.spark.sql.DataFrame): Int = {
      val p = df.queryExecution.executedPlan.toString
      "split\\(".r.findAllIn(p).length
    }
    println(s"[probe6] noBarrier=${countSplit(noBarrier)} " +
      s"withBarrier=${countSplit(withBarrier)} inline=${countSplit(inline)}")
    // and timing at sf0.01 to confirm
    val d2 = Tables.documents(spark, "/root/testdata/sf0.01")
    def nb = d2.select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), shingles(col("w")).as("sh"))
    def wb = d2.select(col("doc_id"), split(col("text"), " ").as("w"))
      .repartition(4)
      .select(col("doc_id"), shingles(col("w")).as("sh"))
    Bench.exec(nb); Bench.exec(wb)
    val tn = Bench.time(Bench.exec(nb))
    val tw = Bench.time(Bench.exec(wb))
    println(f"[probe6] time noBarrier=$tn%.2f withBarrier=$tw%.2f")
    spark.stop()
  }
}

object ProbeRecall {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.operators.Similarity
    val dir = "/root/testdata/sf0.01"
    val brute = Similarity.knnBrute(spark, dir, k = 3)
      .select("qid", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val lsh = Similarity.knnLsh(spark, dir)
      .select("qid", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = brute.keys.toSeq.map(q =>
      (brute(q) intersect lsh.getOrElse(q, Set.empty)).size).sum
    val nCand = Similarity.knnLsh(spark, dir, k = 1000000).count()
    println(s"[recall] recall@3=${hits.toDouble / 30} candidates=$nCand of 5000 max")
    spark.stop()
  }
}

object ProbeCosine {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def lsh = graft.operators.Similarity.cosineDupsLsh(spark, dir)
    Bench.exec(lsh)
    val t = (1 to 2).map(_ => Bench.time(Bench.exec(lsh))).min
    println(f"[cosine] lsh_sf01=$t%.2f rows=${lsh.count()}")
    spark.stop()
  }
}
