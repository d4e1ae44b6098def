package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: what dominates v_json_schema runtime. */
object Probe9 {
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
      println(f"[probe9] $name%-28s $s%.2f")
    }
    println("[probe9] rows=" + ev.count())
    t("scan_only")(ev)
    t("parse_json_typeof")(ev.select(col("event_id"),
      schema_of_variant(parse_json(col("props"))).as("t")))
    t("variant_get_k")(ev.select(col("event_id"),
      try_variant_get(parse_json(col("props")), "$.k", "double").as("k")))
    t("from_json_k")(ev.select(col("event_id"),
      from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k INT")).as("k")))
    val compiled = graft.rules.JsonSchemaCompiler.compile(
      """{"type":"object","required":["k"],"properties":{"k":{"type":"integer","minimum":0,"maximum":80}}}""")
    t("staged_violations")(compiled.withViolations(ev, parse_json(col("props"))))
    t("staged_plus_explode")(compiled.withViolations(ev, parse_json(col("props")))
      .select(col("event_id"), explode(col("violations")).as("x")))
    spark.stop()
  }
}

object Probe9b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val ev = Tables.events(spark, dir).select(col("event_id"), col("props"))
    val compiled = graft.rules.JsonSchemaCompiler.compile(
      """{"type":"object","required":["k"],"properties":{"k":{"type":"integer","minimum":0,"maximum":80}}}""")
    def t(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      Bench.exec(df)
      val s = (1 to 2).map(_ => Bench.time(Bench.exec(df))).min
      println(f"[probe9b] $name%-28s $s%.2f")
    }
    val base = compiled.withViolations(ev, parse_json(col("props")))
    t("filter_then_explode")(base.filter(size(col("violations")) > 0)
      .select(col("event_id"), explode(col("violations")).as("x")))
    val gplan = base.filter(size(col("violations")) > 0)
      .select(col("event_id"), explode(col("violations")).as("x"))
    println("[probe9b] plan:\n" + gplan.queryExecution.executedPlan.toString.take(2500))
    spark.stop()
  }
}
