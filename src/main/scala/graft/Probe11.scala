package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: which part of violations+explode interacts badly. */
object Probe11 {
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
      println(f"[probe11] $name%-30s $s%.2f")
    }
    val base = compiled.withViolations(ev, parse_json(col("props")))
    t("size_only")(base.select(col("event_id"),
      size(col("violations")).as("n")))
    t("explode_whole")(base.select(col("event_id"),
      explode(col("violations")).as("x")))
    // one single-struct check array, no concat
    val oneCheck = when(
      try_variant_get(parse_json(col("props")), "$.k", "double") > 80.0,
      array(struct(lit("/k").as("pointer"), lit("maximum").as("keyword"))))
      .otherwise(array().cast("array<struct<pointer:string,keyword:string>>"))
    t("explode_one_variant_check")(ev.select(col("event_id"),
      explode(oneCheck).as("x")))
    // concat of 5 trivial arrays (no variant)
    val e5 = (1 to 5).map(i => when(col("event_id") % 97 === i,
      array(struct(lit(i.toString).as("pointer"), lit("kw").as("keyword"))))
      .otherwise(array().cast("array<struct<pointer:string,keyword:string>>")))
    t("explode_concat5_novariant")(ev.select(col("event_id"),
      explode(concat(e5: _*)).as("x")))
    // concat of 5 variant-based checks
    val v = parse_json(col("props"))
    val c5 = (1 to 5).map(i => when(
      try_variant_get(v, "$.k", "double") > (90 + i).toDouble,
      array(struct(lit(i.toString).as("pointer"), lit("kw").as("keyword"))))
      .otherwise(array().cast("array<struct<pointer:string,keyword:string>>")))
    t("explode_concat5_variant")(ev.select(col("event_id"),
      explode(concat(c5: _*)).as("x")))
    spark.stop()
  }
}

object Probe11b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.wholeStage", sys.env.getOrElse("WSCG", "true"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val ev = Tables.events(spark, dir).select(col("event_id"), col("props"))
    val compiled = graft.rules.JsonSchemaCompiler.compile(
      """{"type":"object","required":["k"],"properties":{"k":{"type":"integer","minimum":0,"maximum":80}}}""")
    def t(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      Bench.exec(df)
      val s = (1 to 2).map(_ => Bench.time(Bench.exec(df))).min
      println(f"[probe11b] $name%-30s $s%.2f")
    }
    val base = compiled.withViolations(ev, parse_json(col("props")))
    t("explode_whole")(base.select(col("event_id"),
      explode(col("violations")).as("x")))
    spark.stop()
  }
}

object Probe11c {
  def main(args: Array[String]): Unit = {
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    sys.env.get("HUGE").foreach(v =>
      b.config("spark.sql.codegen.hugeMethodLimit", v))
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val ev = Tables.events(spark, dir).select(col("event_id"), col("props"))
    val compiled = graft.rules.JsonSchemaCompiler.compile(
      """{"type":"object","required":["k"],"properties":{"k":{"type":"integer","minimum":0,"maximum":80}}}""")
    def t(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      Bench.exec(df)
      val s = (1 to 2).map(_ => Bench.time(Bench.exec(df))).min
      println(f"[probe11c] $name%-30s $s%.2f")
    }
    val base = compiled.withViolations(ev, parse_json(col("props")))
    t("explode_whole")(base.select(col("event_id"),
      explode(col("violations")).as("x")))
    // flagship-shape sanity: make sure the fix doesn't hurt a fast query
    t("q1_agg")(SparkEntry.benchQueries("q1_agg")(spark, dir))
    spark.stop()
  }
}

object Probe11d {
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
      println(f"[probe11d] $name%-30s $s%.2f")
    }
    val base = compiled.withViolations(ev, parse_json(col("props")))
    t("no_explode")(base)
    t("exchange_then_explode")(base.repartition(32)
      .select(col("event_id"), explode(col("violations")).as("x")))
    t("fused_explode")(base
      .select(col("event_id"), explode(col("violations")).as("x")))
    // explode the violations built WITHOUT any variant exprs in scope:
    // re-create same-shape array from plain columns
    val fake = (1 to 5).map(i => when(col("event_id") % 97 === i,
      array(struct(lit("/k").as("pointer"), lit("kw").as("keyword"),
        concat(lit("m"), col("props")).as("message"),
        lit("#/x").as("schemaLocation"))))
      .otherwise(array().cast(graft.rules.JsonSchemaCompiler.ViolationType)))
    t("fused_explode_novariant")(ev
      .select(col("event_id"), concat(fake: _*).as("violations"))
      .select(col("event_id"), explode(col("violations")).as("x")))
    spark.stop()
  }
}

object Probe11e {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val ev = Tables.events(spark, dir).select(col("event_id"), col("props"))
    val compiled = graft.rules.JsonSchemaCompiler.compile(
      """{"type":"object","required":["k"],"properties":{"k":{"type":"integer","minimum":0,"maximum":80}}}""")
    val df = compiled.withViolations(ev, parse_json(col("props")))
      .select(col("event_id"), explode(col("violations")).as("x"))
    val tPlan = Bench.time(df.queryExecution.executedPlan)
    Bench.exec(df)
    val tExec = (1 to 3).map(_ => Bench.time(Bench.exec(df))).min
    println(f"[probe11e] plan=$tPlan%.2f exec_same_df=$tExec%.2f")
    // fresh df each time (what Bench does)
    def fresh = compiled.withViolations(ev, parse_json(col("props")))
      .select(col("event_id"), explode(col("violations")).as("x"))
    val tFresh = (1 to 2).map(_ => Bench.time(Bench.exec(fresh))).min
    println(f"[probe11e] exec_fresh_df=$tFresh%.2f")
    spark.stop()
  }
}

object Probe11f {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val ev = Tables.events(spark, dir).select(col("event_id"), col("props"))
    val compiled = graft.rules.JsonSchemaCompiler.compile(
      """{"type":"object","required":["k"],"properties":{"k":{"type":"integer","minimum":0,"maximum":80}}}""")
    val df = compiled.withViolations(ev, parse_json(col("props")))
      .select(col("event_id"), explode(col("violations")).as("x"))
    val p = df.queryExecution.executedPlan.toString
    println("[probe11f] parse_json count: " +
      "variantbuilder|parse_json".r.findAllIn(p.toLowerCase).length)
    println("[probe11f] plan nodes:")
    p.split("\n").foreach(l => println("[probe11f] " +
      l.take(200)))
    spark.stop()
  }
}

object Probe11g {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val ev = Tables.events(spark, dir).select(col("event_id"), col("props"))
    val compiled = graft.rules.JsonSchemaCompiler.compile(
      """{"type":"object","required":["k"],"properties":{"k":{"type":"integer","minimum":0,"maximum":80}}}""")
    def t(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      Bench.exec(df)
      val s = (1 to 2).map(_ => Bench.time(Bench.exec(df))).min
      println(f"[probe11g] $name%-30s $s%.2f")
    }
    t("explode_with_rule_excluded")(
      compiled.withViolations(ev, parse_json(col("props")))
        .select(col("event_id"), explode(col("violations")).as("x")))
    t("v_json_schema_full")(SparkEntry.benchQueries("v_json_schema")(spark, dir))
    t("v_json_schema2_full")(SparkEntry.benchQueries("v_json_schema2")(spark, dir))
    spark.stop()
  }
}
