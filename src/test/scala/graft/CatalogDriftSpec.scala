package graft

import org.apache.spark.sql.functions._

import graft.checks.Drift
import graft.rules.Catalog

/** Glob semantics mirror the reference's GlobPatternTest.java:12-31 and
  * SchemaDetectorTest.java:23-51; drift behaves directionally (shifted
  * distribution scores high, identical scores ~0).
  */
class CatalogDriftSpec extends SparkSpec {
  import spark.implicits._

  private def matches(glob: String, path: String): Boolean = {
    val (re, _) = Catalog.compileGlob(glob)
    path.matches(re)
  }

  test("glob: * stays within a path segment, ** crosses, ? is one char") {
    assert(matches("*.yml", "a.yml"))
    assert(!matches("*.yml", "dir/a.yml"))
    assert(matches("**/*.yml", "dir/sub/a.yml"))
    assert(matches("k8s/**/*.yaml", "k8s/prod/deep/app.yaml"))
    assert(!matches("k8s/**/*.yaml", "other/app.yaml"))
    assert(matches("file-?.yml", "file-1.yml"))
    assert(!matches("file-?.yml", "file-12.yml"))
    assert(matches(".github/workflows/*.yml", ".github/workflows/ci.yml"))
    assert(!matches(".github/workflows/*.yml", "xgithub/workflows/ci.yml"))
  }

  test("glob specificity: more literal characters wins") {
    val (_, specWorkflow) = Catalog.compileGlob(".github/workflows/*.yml")
    val (_, specGeneric) = Catalog.compileGlob("*.yml")
    assert(specWorkflow > specGeneric)
  }

  test("routing: most-specific catalog match wins; precedence holds") {
    val r = Catalog.resolve(
        Catalog.docPaths(spark, "/root/testdata/sf0.001"), None)
      .select("doc_id", "resolution", "schema_url")
      .as[(Long, String, String)].collect()
    val byMod = r.groupBy(t => (t._1 % 6).toInt)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(byMod(0) === Set("catalog")) // workflow glob beats *.yml
    assert(byMod(1) === Set("catalog")) // k8s/**
    assert(byMod(3) === Set("error"))   // .txt matches nothing, no default
    assert(byMod(5) === Set("embedded"))
    // the workflow match must be the specific schema, not generic-yml
    val wf = r.filter(_._1 % 6 == 0).map(_._3).toSet
    assert(wf === Set("https://example.org/schemas/github-workflow.json"))
  }

  test("drift: identical snapshots score zero, shifted snapshots don't") {
    val base = (1 to 2000).map(i => ("t", "A", (i % 100).toDouble)) ++
      (1 to 2000).map(i => ("t", "B", (i % 100).toDouble))
    val shifted = (1 to 2000).map(i => ("s", "A", (i % 100).toDouble)) ++
      (1 to 2000).map(i => ("s", "B", (i % 100).toDouble + 150))
    val df = (base ++ shifted).toDF("event_type", "snap", "value")
    // reuse the same math as eventValueDrift via a local copy of the plan
    val ev = df.select(col("event_type"), col("snap"),
      least(floor(col("value") / 20).cast("int"), lit(19)).as("bucket"))
    val counts = ev.groupBy("event_type", "snap", "bucket").count()
    val totals = counts.groupBy("event_type", "snap")
      .agg(sum("count").as("tot"))
    val frac = counts.join(totals, Seq("event_type", "snap"))
      .select(col("event_type"), col("snap"), col("bucket"),
        (col("count") / col("tot")).as("p"))
    val grid = frac.groupBy("event_type", "bucket").agg(
      coalesce(sum(when(col("snap") === "A", col("p"))), lit(0.0)).as("pa"),
      coalesce(sum(when(col("snap") === "B", col("p"))), lit(0.0)).as("pb"))
    val psi = grid
      .withColumn("pa_s", greatest(col("pa"), lit(Drift.Eps)))
      .withColumn("pb_s", greatest(col("pb"), lit(Drift.Eps)))
      .groupBy("event_type")
      .agg(sum((col("pa_s") - col("pb_s")) *
        log(col("pa_s") / col("pb_s"))).as("psi"))
      .as[(String, Double)].collect().toMap
    assert(math.abs(psi("t")) < 1e-9)
    assert(psi("s") > 1.0) // fully disjoint buckets → large PSI
  }
}
