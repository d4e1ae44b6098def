package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: minimal Generate (explode) cost on the events table. */
object Probe10 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val ev = Tables.events(spark, dir).select(col("event_id"), col("props"))
    def t(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      Bench.exec(df)
      val s = (1 to 2).map(_ => Bench.time(Bench.exec(df))).min
      println(f"[probe10] $name%-30s $s%.2f")
    }
    // simple string array explode
    t("explode_split")(ev.select(col("event_id"),
      explode(split(col("props"), ",")).as("x")))
    // struct array explode, no variant involved
    val arr = array(struct(lit("a").as("p"), lit("b").as("k")),
      struct(lit("c").as("p"), lit("d").as("k")))
    t("explode_struct_lit")(ev.select(col("event_id"),
      explode(arr).as("x")))
    // conditional empty-or-struct array (the violations shape, no variant)
    val cond = when(col("event_id") % 97 === 0,
      array(struct(lit("a").as("p"), lit("b").as("k"))))
      .otherwise(array().cast("array<struct<p:string,k:string>>"))
    t("explode_cond_struct")(ev.select(col("event_id"),
      explode(cond).as("x")))
    // same but computed in a prior projection
    t("explode_cond_staged")(ev.select(col("event_id"), cond.as("v"))
      .select(col("event_id"), explode(col("v")).as("x")))
    // variant array: parse + cast to array<variant> + explode
    t("explode_variant")(ev.select(col("event_id"),
      explode(try_variant_get(parse_json(concat(lit("[") , col("props"), lit("]"))), "$", "array<variant>")).as("x")))
    spark.stop()
  }
}
