package graft

import graft.report.Reports
import graft.report.Reports.VerdictRow

/** Golden-string report tests mirroring the reference's golden-file
  * strategy (YamlSchemaValidatorRunnerTest.java:200-236): render the
  * multi3invalid-shaped fixture ([T,F,T] vector, FIXTURES.md) in every
  * format and diff against pinned expected output.
  */
class GoldenReportSpec extends SparkSpec {

  // multi3invalid re-expression: doc 2 lacks a resolvable schema
  private val rows = Seq(
    VerdictRow("multi3invalid.yaml-1", valid = true, Seq.empty),
    VerdictRow("multi3invalid.yaml-2", valid = false,
      Seq(("/", "error",
        "No schema found in YAML file or provided as parameter"))),
    VerdictRow("multi3invalid.yaml-3", valid = true, Seq.empty))
  private val summary = Reports.RunSummary(3, 2, 1, 1)

  test("TEXT golden") {
    assert(Reports.renderText(rows) ===
      """multi3invalid.yaml-1: valid
        |multi3invalid.yaml-2: invalid
        |  /: error: No schema found in YAML file or provided as parameter
        |multi3invalid.yaml-3: valid
        |""".stripMargin)
  }

  test("JSON golden") {
    assert(Reports.renderJson(rows, summary) ===
      """{"valid":false,"documents":[""" +
        """{"doc":"multi3invalid.yaml-1","valid":true,"details":[]},""" +
        """{"doc":"multi3invalid.yaml-2","valid":false,"details":[""" +
        """{"instanceLocation":"/","valid":false,"errors":{"error":""" +
        """"No schema found in YAML file or provided as parameter"}}]},""" +
        """{"doc":"multi3invalid.yaml-3","valid":true,"details":[]}]}""")
  }

  test("JUnit golden") {
    val expected =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<testsuite name="validation" tests="3" failures="1">
        |  <testcase name="multi3invalid.yaml-1"/>
        |  <testcase name="multi3invalid.yaml-2">
        |    <failure message="/: error: No schema found in YAML file or provided as parameter"/>
        |  </testcase>
        |  <testcase name="multi3invalid.yaml-3"/>
        |</testsuite>""".stripMargin
    assert(Reports.renderJunit(rows, summary) === expected)
  }

  test("LLM golden") {
    assert(Reports.renderLlm(rows, summary) ===
      """# 2/3 files valid, 1 errors
        |multi3invalid.yaml-2 / error: No schema found in YAML file or provided as parameter""".stripMargin)
  }

  test("YAML golden (reference render branch toYamlString)") {
    assert(Reports.renderYaml(rows, summary) ===
      """valid: false
        |documents:
        |- doc: "multi3invalid.yaml-1"
        |  valid: true
        |- doc: "multi3invalid.yaml-2"
        |  valid: false
        |  details:
        |  - instanceLocation: "/"
        |    valid: false
        |    errors:
        |      error: "No schema found in YAML file or provided as parameter"
        |- doc: "multi3invalid.yaml-3"
        |  valid: true
        |""".stripMargin)
    // well-formed YAML: parses back with the right shape
    val yaml = new com.fasterxml.jackson.databind.ObjectMapper(
      new com.fasterxml.jackson.dataformat.yaml.YAMLFactory())
      .readTree(Reports.renderYaml(rows, summary))
    assert(!yaml.get("valid").asBoolean())
    assert(yaml.get("documents").size() === 3)
  }

  test("colored TEXT wraps verdicts in ANSI (FilesOutput.toColoredString)") {
    val colored = Reports.renderText(rows, color = true)
    assert(colored.contains("[32mvalid[0m"))
    assert(colored.contains("[31minvalid[0m"))
    // plain form stays byte-identical to the golden
    assert(!Reports.renderText(rows).contains(""))
  }

  test("LLM structured form (compact=false, FilesOutputToLlm.toJson)") {
    val json = Reports.renderLlmJson(rows, summary)
    assert(json.startsWith(
      """{"summary":{"files":3,"valid":2,"invalid":1,"errors":1},"""))
    assert(json.contains(
      """{"file":"multi3invalid.yaml-2","valid":false,"errors":["""))
    assert(json.contains(""""keyword":"error""""))
    // valid docs carry no errors key (reference omits empty lists)
    assert(json.contains("""{"file":"multi3invalid.yaml-1","valid":true}"""))
  }

  test("SARIF carries verdict, version and one result") {
    val sarif = Reports.renderSarif(rows, summary)
    assert(sarif.contains(""""executionSuccessful":false"""))
    assert(sarif.contains(""""ruleId":"error""""))
    assert(sarif.contains("multi3invalid.yaml-2"))
  }

  test("exit codes: [T,F,T] → 1, [T,T,T] → 0 (reference K3)") {
    assert(Reports.exitCode(summary) === 1)
    assert(Reports.exitCode(Reports.RunSummary(3, 3, 0, 0)) === 0)
  }
}
