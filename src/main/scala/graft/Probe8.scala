package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: VARIANT semantics needed by the schema compiler. */
object Probe8 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq(
      """{"a": null, "arr": [1, "x", 3], "obj": {"k1": "INFO", "k2": {"n": "WARN"}}}""",
      """{"b": 1, "arr": [], "obj": {}}"""
    ).toDF("j").select(parse_json(col("j")).as("v"))
    df.select(
      try_variant_get(col("v"), "$.a", "variant").isNull.as("a_null"),
      try_variant_get(col("v"), "$.b", "variant").isNull.as("b_null_miss_a"),
      schema_of_variant(try_variant_get(col("v"), "$.a", "variant")).as("a_type"),
      is_variant_null(try_variant_get(col("v"), "$.a", "variant")).as("a_vnull"),
      try_variant_get(col("v"), "$.arr", "array<variant>").as("arr"),
      try_variant_get(col("v"), "$.obj", "map<string,variant>").as("obj")
    ).show(false)
    df.select(
      size(try_variant_get(col("v"), "$.arr", "array<variant>")).as("arr_sz"),
      transform(try_variant_get(col("v"), "$.arr", "array<variant>"),
        e => schema_of_variant(e)).as("elem_types"),
      map_keys(try_variant_get(col("v"), "$.obj", "map<string,variant>")).as("keys"),
      to_json(try_variant_get(col("v"), "$.arr", "variant")).as("arr_json")
    ).show(false)
    spark.stop()
  }
}
