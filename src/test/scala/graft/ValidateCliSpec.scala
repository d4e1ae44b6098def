package graft

import java.nio.file.Files

import graft.sources.YamlSource

/** End-to-end CLI-parity tests: the reference's parameterized pass/fail
  * matrix (YamlSchemaValidatorTest.java:34-93) over real YAML/JSON files
  * on disk, through readFiles → parseDocs → compiled schema → report.
  */
class ValidateCliSpec extends SparkSpec {
  import spark.implicits._

  private def tmpFile(name: String, content: String): String = {
    val d = Files.createTempDirectory("graft-cli")
    val p = d.resolve(name)
    Files.writeString(p, content)
    p.toString
  }

  private val schemaFile = tmpFile("schema.json",
    """{"type":"object","required":["name"],
      |"properties":{"name":{"type":"string"},
      |"level":{"enum":["info","warn"]},
      |"flag":{"type":"boolean"}}}""".stripMargin.replace("\n", ""))

  test("valid yaml file passes (valid.yaml)") {
    val f = tmpFile("valid.yaml", "name: alice\nlevel: info\nflag: true\n")
    val (rows, exit) = Validate.run(spark, Seq(f), schemaFile)
    assert(rows.size === 1 && rows.head.valid && exit === 0)
  }

  test("type violation fails with NetworkNT message (invalid.yaml)") {
    val f = tmpFile("invalid.yaml", "name: bob\nflag: 123\n")
    val (rows, exit) = Validate.run(spark, Seq(f), schemaFile)
    assert(exit === 1)
    assert(rows.head.violations ===
      Seq(("/flag", "type", "integer found, boolean expected")))
  }

  test("multi-doc yaml explodes keyed path-1..3 with vector [T,F,T]") {
    val f = tmpFile("multi3.yaml",
      """name: a
        |---
        |level: bad
        |---
        |name: c
        |""".stripMargin)
    val (rows, exit) = Validate.run(spark, Seq(f), schemaFile)
    assert(exit === 1)
    val byKey = rows.map(r => r.doc_id -> r.valid).toMap
    assert(byKey.keySet.map(_.split('/').last) ===
      Set("multi3.yaml-1", "multi3.yaml-2", "multi3.yaml-3"))
    // doc 2: enum violation AND missing required name
    val vec = rows.sortBy(_.doc_id).map(_.valid)
    assert(vec === Seq(true, false, true))
  }

  test("json input parses via the JSON-first path") {
    val f = tmpFile("valid.json", """{"name":"x","level":"warn"}""")
    val (rows, exit) = Validate.run(spark, Seq(f), schemaFile)
    assert(exit === 0 && rows.head.valid)
  }

  test("parse error becomes an invalid row, run continues (badformat)") {
    val good = tmpFile("good.yaml", "name: ok\n")
    val bad = tmpFile("badformat.yaml", "name: \"unclosed\nitem2:abc: x: [\n")
    val (rows, exit) = Validate.run(spark, Seq(good, bad), schemaFile)
    assert(exit === 1 && rows.size === 2)
    val badRow = rows.find(_.doc_id.contains("badformat")).get
    assert(!badRow.valid)
    assert(badRow.violations.head._2 === "error")
    assert(badRow.violations.head._3.contains("Exception") ||
      badRow.violations.head._3.contains("No schema found"))
    assert(rows.find(_.doc_id.contains("good")).get.valid)
  }

  test("yaml schema file compiles like json (sample-schema.yaml parity)") {
    val yamlSchema = tmpFile("schema.yaml",
      """type: object
        |required: [name]
        |properties:
        |  name: {type: string}
        |""".stripMargin)
    val f = tmpFile("doc.yaml", "name: 42\n")
    val (rows, exit) = Validate.run(spark, Seq(f), yamlSchema)
    assert(exit === 1)
    assert(rows.head.violations.exists(v =>
      v._2 === "type" && v._3 === "integer found, string expected"))
  }

  test("empty yaml doc yields the reference no-schema error (empty.yaml)") {
    val f = tmpFile("empty.yaml", "---\n")
    val parsed = YamlSource.parseDocs(
      YamlSource.readFiles(spark, Seq(f))).collect()
    assert(parsed.length === 1)
    assert(parsed.head.error ===
      "No schema found in YAML file or provided as parameter")
  }
}
