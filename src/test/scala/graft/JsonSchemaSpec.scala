package graft

import org.apache.spark.sql.functions._

import graft.rules.JsonSchemaCompiler

/** The reference's own schema-validation fixtures, run through the
  * JSON-Schema→Catalyst compiler over VARIANT documents.
  */
class JsonSchemaSpec extends SparkSpec {
  import spark.implicits._

  private def violationsOf(schema: String, docs: (String, String)*)
      : Map[String, Seq[(String, String, String)]] = {
    val compiled = JsonSchemaCompiler.compile(schema)
    val df = docs.toSeq.toDF("doc_id", "json")
      .select(col("doc_id"), compiled.violations(parse_json(col("json")))
        .as("v"))
    df.select(col("doc_id"), explode(col("v")).as("x"))
      .select(col("doc_id"), col("x.pointer"), col("x.keyword"),
        col("x.message"))
      .as[(String, String, String, String)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3, t._4)).toSeq).toMap
  }

  test("invalid.yaml golden: 'integer found, boolean expected'") {
    // invalid.yaml:13 `boolean-sample: 123` vs sample-schema boolean —
    // golden at testreport/invalidyaml.txt:6 / invalidyaml.json:6-14
    val schema =
      """{"type":"object","properties":{"sample":{"type":"object",
        |"properties":{"booleanSample":{"type":"boolean"}}}}}"""
        .stripMargin.replace("\n", "")
    val v = violationsOf(schema,
      ("invalid", """{"sample":{"booleanSample":123}}"""),
      ("valid", """{"sample":{"booleanSample":true}}"""))
    assert(v("invalid") === Seq(("/sample/booleanSample", "type",
      "integer found, boolean expected")))
    assert(!v.contains("valid"))
  }

  test("LLM-test mini-schema: required + type (FilesOutputToLlmTest)") {
    // FilesOutputToLlmTest.java:73-78: required:["age"], name must be
    // string; doc {"name": 42} → 2 violations
    val schema =
      """{"type":"object","required":["age"],
        |"properties":{"name":{"type":"string"},
        |"age":{"type":"integer"}}}""".stripMargin.replace("\n", "")
    val v = violationsOf(schema, ("d", """{"name": 42}"""))
    assert(v("d").toSet === Set(
      ("/", "required", "required property 'age' not found"),
      ("/name", "type", "integer found, string expected")))
  }

  test("enum, pattern, minimum/maximum, minLength keywords") {
    val schema =
      """{"type":"object","properties":{
        |"level":{"enum":["info","warn","error"]},
        |"id":{"pattern":"^[a-z]+-[0-9]+$"},
        |"count":{"type":"integer","minimum":0,"maximum":100},
        |"name":{"type":"string","minLength":3}}}"""
        .stripMargin.replace("\n", "")
    val v = violationsOf(schema,
      ("bad", """{"level":"debug","id":"XYZ","count":101,"name":"ab"}"""),
      ("ok", """{"level":"warn","id":"abc-12","count":55,"name":"abc"}"""))
    assert(v("bad").map(t => (t._1, t._2)).toSet === Set(
      ("/level", "enum"), ("/id", "pattern"), ("/count", "maximum"),
      ("/name", "minLength")))
    assert(v("bad").find(_._2 == "enum").get._3 ===
      "does not have a value in the enumeration [info, warn, error]")
    assert(!v.contains("ok"))
  }

  test("$defs/$ref inlining with bounded recursive unrolling") {
    // mirrors sample-schema.json:27-39 loggerLevelProp self-reference
    val schema =
      """{"type":"object",
        |"$defs":{"node":{"type":"object",
        |  "properties":{"level":{"enum":["a","b"]},
        |                "child":{"$ref":"#/$defs/node"}}}},
        |"properties":{"root":{"$ref":"#/$defs/node"}}}"""
        .stripMargin.replace("\n", "")
    val v = violationsOf(schema,
      ("deep", """{"root":{"level":"a","child":{"level":"zz",
        |"child":{"level":"b"}}}}""".stripMargin.replace("\n", "")),
      ("fine", """{"root":{"level":"b"}}"""))
    assert(v("deep").map(t => (t._1, t._2)) ===
      Seq(("/root/child/level", "enum")))
    assert(!v.contains("fine"))
    // recursion is bounded, not infinite: compile succeeds and checks are
    // finite
    val compiled = JsonSchemaCompiler.compile(schema, maxRefDepth = 3)
    assert(compiled.checks.nonEmpty &&
      compiled.checks.size < 50)
  }

  test("missing properties are not violations (only required enforces)") {
    val schema =
      """{"type":"object","properties":{"x":{"type":"integer"}}}"""
    val v = violationsOf(schema, ("d", """{"y": 1}"""))
    assert(!v.contains("d"))
  }
}
