// Scratch measurement harnesses behind BENCH.md's claims (HOF-CSE staging,
// Generate cost, InferFiltersFromGenerate, sort cost, code-cache cliff,
// variant semantics). Consolidated into one file (VERDICT r2); each object
// keeps its Probe<N> name so BENCH.md's citations stay stable.

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


/** Round-4 probe: time any named SparkEntry queries in isolation
  * (bench session config), min-of-N. Usage:
  * `runMain graft.ProbeQ d_minhash_pairs d_dup_clusters`
  * (env SPARK_GRAFT_SF_DIR, SPARK_GRAFT_PROBE_REPS).
  */
object ProbeQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "3").toInt
    args.foreach { name =>
      val fn = SparkEntry.benchQueries(name)
      def rep(): Double = {
        graft.operators.Candidates.releaseAll(blocking = true)
        Bench.time(Bench.exec(fn(spark, dir)))
      }
      rep() // warm
      val s = (1 to reps).map(_ => rep()).min
      println(f"[probeq] $name%-22s $s%7.2f s (min of $reps)")
    }
    spark.stop()
  }
}

/** Round-4 probe: decompose d_minhash_pairs cost — candidate
  * generation (count job), verify (main job from cache), and the
  * r3-style single-job unconditional-broadcast variant.
  */
object ProbeR4 {
  def main(args: Array[String]): Unit = {
    import graft.operators.{Candidates, Dedup}
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def corpusDf = graft.data.Interleaved.spread(
      Dedup.corpus(spark, dir), Tables.documents(spark, dir))
    def rawCand = {
      val docs = corpusDf
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), Dedup.shinglesOf(col("w")).as("sh"))
        .select(col("doc_id"), Dedup.minhashSignature(col("sh")).as("sig"))
      val bandHashes = array((0 until Dedup.NumHashes / Dedup.BandSize).map { b =>
        xxhash64((lit(b) +: (0 until Dedup.BandSize).map(j =>
          element_at(col("sig"), b * Dedup.BandSize + j + 1))): _*)
      }: _*)
      val bands = corpusDf
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), Dedup.shinglesOf(col("w")).as("sh"))
        .select(col("doc_id"), Dedup.minhashSignature(col("sh")).as("sig"))
        .select(col("doc_id"), posexplode(bandHashes).as(Seq("band", "bh")))
      bands.as("a")
        .join(bands.as("b"), col("a.band") === col("b.band") &&
          col("a.bh") === col("b.bh") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .distinct()
    }
    def t(name: String)(f: => Unit): Unit = {
      val s = (1 to 3).map(_ => Bench.time(f)).min
      println(f"[prober4] $name%-28s $s%7.2f s")
    }
    // warm
    Bench.exec(Dedup.minhashCandidatesOf(corpusDf))
    Candidates.releaseAll(blocking = true)
    t("rawCand.count (no persist)") { rawCand.count(); () }
    t("materialize (persist+count)") {
      Candidates.materialize(rawCand)
      Candidates.releaseAll(blocking = true)
    }
    t("full gated (current)") {
      Candidates.releaseAll(blocking = true)
      Bench.exec(Dedup.minhashCandidatesOf(corpusDf))
    }
    spark.stop()
  }
}

/** Round-4 probe b: bisect the verify-stage regression — r3-style
  * verify from the raw plan vs from the cached candidate frame.
  */
object ProbeR4b {
  def main(args: Array[String]): Unit = {
    import graft.operators.{Candidates, Dedup}
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def corpusDf = graft.data.Interleaved.spread(
      Dedup.corpus(spark, dir), Tables.documents(spark, dir))
    def rawCand = {
      val docs = corpusDf
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), Dedup.shinglesOf(col("w")).as("sh"))
        .select(col("doc_id"), Dedup.minhashSignature(col("sh")).as("sig"))
      val bandHashes = array((0 until Dedup.NumHashes / Dedup.BandSize).map { b =>
        xxhash64((lit(b) +: (0 until Dedup.BandSize).map(j =>
          element_at(col("sig"), b * Dedup.BandSize + j + 1))): _*)
      }: _*)
      val bands = docs
        .select(col("doc_id"), posexplode(bandHashes).as(Seq("band", "bh")))
      bands.as("a")
        .join(bands.as("b"), col("a.band") === col("b.band") &&
          col("a.bh") === col("b.bh") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .distinct()
    }
    def verify(cand: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val candIds = cand.select(col("id_a").as("doc_id"))
        .unionAll(cand.select(col("id_b").as("doc_id"))).distinct()
      val sh = corpusDf
        .join(broadcast(candIds), Seq("doc_id"), "left_semi")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), Dedup.shinglesOf(col("w")).as("sh"))
      val withA = broadcast(cand)
        .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")),
          Seq("id_a"))
      broadcast(withA)
        .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")),
          Seq("id_b"))
        .withColumn("jaccard", round(
          size(array_intersect(col("sh_a"), col("sh_b"))) /
            size(array_union(col("sh_a"), col("sh_b"))), 4))
        .filter(col("jaccard") >= 0.6)
        .select(col("id_a"), col("id_b"), col("jaccard"))
    }
    def t(name: String)(f: => Unit): Unit = {
      val s = (1 to 3).map(_ => Bench.time(f)).min
      println(f"[prober4b] $name%-34s $s%7.2f s")
    }
    Bench.exec(verify(rawCand)) // warm
    t("r3-style: single job, raw cand") { Bench.exec(verify(rawCand)) }
    val (cached, n) = Candidates.materialize(rawCand)
    println(s"[prober4b] nCand = $n")
    t("verify from CACHED cand") { Bench.exec(verify(cached)) }
    Candidates.releaseAll(blocking = true)
    spark.stop()
  }
}

/** Round-4 probe c: event-logged single run of the gated
  * d_minhash_pairs to see per-job wall times.
  */
object ProbeR4c {
  def main(args: Array[String]): Unit = {
    import graft.operators.{Candidates, Dedup}
    new java.io.File("/tmp/spark-events").mkdirs()
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.eventLog.enabled", "true")
      .config("spark.eventLog.dir", "/tmp/spark-events")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def corpusDf = graft.data.Interleaved.spread(
      Dedup.corpus(spark, dir), Tables.documents(spark, dir))
    Bench.exec(Dedup.minhashCandidatesOf(corpusDf)) // warm
    Candidates.releaseAll(blocking = true)
    println("[prober4c] ---- timed run starts ----")
    val s = Bench.time(Bench.exec(Dedup.minhashCandidatesOf(corpusDf)))
    println(f"[prober4c] total $s%.2f s; app=${spark.sparkContext.applicationId}")
    Candidates.releaseAll(blocking = true)
    spark.stop()
  }
}

/** Round-4 probe d: event-logged single d_dup_clusters run. */
object ProbeR4d {
  def main(args: Array[String]): Unit = {
    new java.io.File("/tmp/spark-events").mkdirs()
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.eventLog.enabled", "true")
      .config("spark.eventLog.dir", "/tmp/spark-events")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = Bench.time(Bench.exec(
      org.apache.spark.sql.GraftBridge.stripTopSort(
        graft.operators.Clusters.dupClusters(spark, dir))))
    println(f"[prober4d] total $s%.2f s; app=${spark.sparkContext.applicationId}")
    graft.operators.Candidates.releaseAll(blocking = true)
    spark.stop()
  }
}

/** Pre-generate the scaled bucketed tables for a replica level (so the
  * pinned scaling runs don't pay generation inside an 8-core JVM).
  * Args: plain ints → bucketed doc tables (Jobs A/B); `textN` → the
  * replicated disjoint-shingle text corpus at N replicas (Job C).
  */
object PrepScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val specs = if (args.isEmpty) Seq("8000") else args.toSeq
    specs.foreach {
      case t if t.startsWith("text") =>
        val p = BenchData.ensureTextCorpus(spark, sfDir, t.drop(4).toInt)
        println(s"[prep] text corpus $p ${spark.read.parquet(p).count()} docs")
      case n =>
        val (d, r) = BenchData.ensureBucketed(spark, sfDir, n.toInt)
        println(s"[prep] $d ${spark.table(d).count()} docs; $r ready")
    }
    spark.stop()
  }
}

/** Scratch (VERDICT r4 next #5, second lever): would truncating the
  * banding keys to int32 "halve the shuffle bytes"? Tungsten UnsafeRow
  * gives every fixed-width field an 8-byte SLOT, so an int column does
  * not shrink the row (2 fields = 8 B null bitset + 2×8 B = 24 B either
  * way) — but shuffle files are compressed, and a truncated int leaves
  * 4 zero bytes per slot that the codec can squeeze. This measures the
  * ACTUAL shuffle bytes written by the banding candidate join under
  * (long,long) / (long,int) / (int,int) key rows, plus the pair count
  * (int32 band keys add ~|keys|²/2³³ false candidates that the exact
  * verify must then discard — the correctness cost of the byte saving).
  */
object ProbeR5 {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    import org.apache.spark.sql.DataFrame
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicas =
      sys.env.getOrElse("SPARK_GRAFT_MINHASH_REPLICAS", "400").toInt
    val path = BenchData.ensureTextCorpus(spark, sfDir, replicas)
    val corpus = spark.read.parquet(path)
    val bytes = new java.util.concurrent.atomic.AtomicLong
    val records = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          records.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        }
      }
    })
    def run(name: String, keys: DataFrame): Unit = {
      val t0 = System.nanoTime
      val n = keys.as("a").join(keys.as("b").hint("shuffle_hash"),
          col("a.bh") === col("b.bh") &&
            col("a.doc_id") < col("b.doc_id"))
        .count()
      val sec = (System.nanoTime - t0) / 1e9
      Thread.sleep(3000) // listener bus drains async
      println(f"[probeR5] $name: pairs=$n " +
        f"shuffleMB=${bytes.getAndSet(0) / 1e6}%.1f " +
        f"records=${records.getAndSet(0)} sec=$sec%.1f")
    }
    // 31-bit masks, not plain casts: the replicated doc_ids exceed int
    // range and ANSI mode raises on a narrowing cast overflow
    def i31(c: org.apache.spark.sql.Column) =
      c.bitwiseAND(lit(0x7fffffffL)).cast("int")
    val base = graft.operators.Dedup.bandKeysOf(corpus)
    run("bh:long doc:long (production)", base)
    run("bh:long doc:int",
      base.select(i31(col("doc_id")).as("doc_id"), col("bh")))
    run("bh:int doc:int (truncated)",
      base.select(i31(col("doc_id")).as("doc_id"),
        i31(col("bh")).as("bh")))
    spark.stop()
  }
}

/** Round-5 probe: d_boiler_strip references the chunk projection from
  * THREE consumers (df agg, anti-join probe, per-doc totals) — is a
  * persisted chunk frame (narrow: doc_id + idx + 16-byte digest, a few
  * percent of the text size) worth the cache?
  */
object ProbeR5b {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.functions._
  import org.apache.spark.storage.StorageLevel

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def stagedStrip(): DataFrame = {
      val docs = graft.operators.Dedup.corpus(spark, dir)
      val ch = graft.operators.TextOps.contentChunksOf(docs)
        .select(col("doc_id"), col("chunk_idx"), col("chunk_hash"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      ch.count() // materialize once; consumers read cache
      val hot = ch.groupBy(col("chunk_hash"))
        .agg(countDistinct(col("doc_id")).as("df"))
        .filter(col("df") > graft.operators.TextOps.BoilerDf)
        .select(col("chunk_hash"))
      val kept = ch.join(hot, Seq("chunk_hash"), "left_anti")
      val tot = ch.groupBy(col("doc_id")).agg(count(lit(1)).as("n_chunks"))
      val keptAgg = kept.groupBy(col("doc_id")).agg(
        count(lit(1)).as("kept_chunks"),
        md5(concat_ws("", transform(
          array_sort(collect_list(struct(col("chunk_idx"),
            col("chunk_hash")))),
          c => c.getField("chunk_hash")))).as("clean_digest"))
      val out = tot.join(keptAgg, Seq("doc_id"), "left")
        .select(col("doc_id"),
          col("n_chunks").cast("int").as("n_chunks"),
          coalesce(col("kept_chunks"), lit(0L)).cast("int")
            .as("kept_chunks"),
          coalesce(col("clean_digest"), md5(lit(""))).as("clean_digest"))
      out.queryExecution.toRdd.count() // force
      ch.unpersist(blocking = true)
      out
    }
    def plainStrip(): Unit =
      graft.operators.TextOps.boilerStrip(spark, dir)
        .queryExecution.toRdd.count(): Unit

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9
    }
    time(plainStrip()); time(stagedStrip()) // warm
    val plain = (1 to 3).map(_ => time(plainStrip())).min
    val staged = (1 to 3).map(_ => time { stagedStrip(): Unit }).min
    println(f"[prober5b] plain(3-scan) $plain%6.2f s   staged(persist) $staged%6.2f s")
    spark.stop()
  }
}

/** Round-6 probe (VERDICT r5 next-round 4): per-stage shuffle bytes and
  * wall-time for Job C (the MinHash banding pipeline), so the banding
  * stage's data rate can sit beside the box's measured DRAM bandwidth
  * (tools/MemBw.java) as a number, not an inference. Run pinned in its
  * own JVM, like scripts/scaling-two-process.sh:
  *   taskset -c 0-7  java ... graft.ProbeJobCBytes 8
  *   taskset -c 0-31 java ... graft.ProbeJobCBytes 32
  * Prints one JSON line per stage of the timed rep (warm-up rep's
  * stages are dropped) with shuffle read/write + input bytes and the
  * stage wall, then a total line.
  */
object ProbeJobCBytes {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
    val cpus = args(0).toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mReplicas =
      sys.env.getOrElse("SPARK_GRAFT_MINHASH_REPLICAS", "400").toInt
    val path = BenchData.ensureTextCorpus(spark, dir, mReplicas)
    val corpus = spark.read.parquet(path)
    val n = corpus.count()

    case class St(id: Int, name: String, wallMs: Long, inB: Long,
      swB: Long, srB: Long, recs: Long)
    val stages = scala.collection.mutable.ArrayBuffer.empty[St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(
          e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        val wall = (for {a <- si.submissionTime; b <- si.completionTime}
          yield b - a).getOrElse(0L)
        stages.synchronized { stages += St(si.stageId,
          si.name.takeWhile(_ != '\n').take(60), wall,
          m.inputMetrics.bytesRead, m.shuffleWriteMetrics.bytesWritten,
          m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.recordsWritten) }
      }
    })

    def rep(): Double = {
      graft.operators.Candidates.releaseAll(blocking = true)
      Bench.time(Bench.exec(
        graft.operators.Dedup.minhashCandidatesOf(corpus)))
    }
    rep() // warm-up: codegen + JIT; its stages are discarded below
    // stage-completed events are delivered asynchronously on the
    // listener bus: drain the warm-up's late events BEFORE clearing, or
    // they land after clear() and get attributed to the timed rep
    // (ADVICE r6 — the timed rep already had the symmetric post-drain)
    Thread.sleep(500)
    stages.synchronized(stages.clear())
    val sec = rep()
    Thread.sleep(500) // let the last stage-completed events drain
    val snap = stages.synchronized(stages.toList).sortBy(-_.swB)
    snap.foreach { s =>
      println(s"""{"probe":"jobc_stage","cpus":$cpus,"stage":${s.id},""" +
        s""""name":"${s.name}","wall_s":${s.wallMs / 1000.0},""" +
        s""""input_mb":${s.inB / 1e6},"shuf_write_mb":${s.swB / 1e6},""" +
        s""""shuf_read_mb":${s.srB / 1e6},"shuf_write_recs":${s.recs}}""")
    }
    val (tw, tr, ti) = (snap.map(_.swB).sum, snap.map(_.srB).sum,
      snap.map(_.inB).sum)
    println(s"""{"probe":"jobc_total","cpus":$cpus,"docs":$n,""" +
      s""""sec":$sec,"input_mb":${ti / 1e6},""" +
      s""""shuf_write_mb":${tw / 1e6},"shuf_read_mb":${tr / 1e6},""" +
      s""""docs_per_sec":${math.rint(n / sec)}}""")
    spark.stop()
  }
}

/** Round-6 probe: decompose Job C's dominant stage — does the fused
  * words→signature→band KERNEL scale 8→32, or only the shuffle write
  * path? Runs the identical banding computation reduced map-side to a
  * scalar (bit_xor of band keys + count: partial aggregation collapses
  * per-partition, so NO 69M-row exchange is materialized) in its own
  * pinned JVM, like ProbeJobCBytes. If the kernel-only pass scales like
  * Job A (compute-dense) while the full stage does not, the non-scaling
  * residue is the shuffle write/sort/serialize path specifically.
  */
object ProbeJobCKernel {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mReplicas =
      sys.env.getOrElse("SPARK_GRAFT_MINHASH_REPLICAS", "400").toInt
    val path = BenchData.ensureTextCorpus(spark, dir, mReplicas)
    val corpus = spark.read.parquet(path)
    val n = corpus.count()
    def rep(): Double = Bench.time {
      graft.operators.Dedup.bandKeysOf(corpus)
        .agg(bit_xor(col("bh")), count(lit(1))).collect(): Unit
    }
    // scan-only floor: parquet decode + text materialization, no kernel
    def scanRep(): Double = Bench.time {
      corpus.agg(sum(length(col("text"))), count(lit(1)))
        .collect(): Unit
    }
    // signature-only (no band explode/agg fan-out): kernel + scan
    def sigRep(): Double = Bench.time {
      corpus.select(graft.functions.TextHash
          .minhashText(col("text"), 3, 96).as("sig"))
        .agg(bit_xor(element_at(col("sig"), 1)), count(lit(1)))
        .collect(): Unit
    }
    rep(); scanRep(); sigRep() // warm
    val sec = (1 to 3).map(_ => rep()).min
    val scanSec = (1 to 3).map(_ => scanRep()).min
    val sigSec = (1 to 3).map(_ => sigRep()).min
    println(s"""{"probe":"jobc_kernel","cpus":$cpus,"docs":$n,""" +
      s""""sec":$sec,"scan_sec":$scanSec,"sig_sec":$sigSec,""" +
      s""""docs_per_sec":${math.rint(n / sec)}}""")
    spark.stop()
  }
}
