package graft.report

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Report renderers over the verdict/violation Datasets — the Spark
  * re-expression of the reference's output formats (SURVEY.md §2.1 K1-K3,
  * §2.5; FilesOutput.java and the renderers under output/). Aggregation
  * happens distributed; only the (small, ordered) rendered rows are
  * collected. Ordering is always explicit (`doc_id, pointer`) because the
  * reference relies on insertion order (§2.6).
  */
object Reports {

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  final case class VerdictRow(doc_id: String, valid: Boolean,
      violations: Seq[(String, String, String)]) // (pointer, keyword, msg)

  /** Exact run totals, computed DISTRIBUTED in one aggregation — these
    * are what the renderers use for counts/verdicts, so truncating the
    * enumerated rows never skews a report's numbers.
    */
  final case class RunSummary(docs: Long, validDocs: Long,
      invalidDocs: Long, violations: Long) {
    def allValid: Boolean = invalidDocs == 0
  }

  /** Collect a BOUNDED slice of verdicts + violations for rendering,
    * plus exact aggregated totals. The r1 version collected every
    * verdict row to the driver — one row per document, an OOM at 10⁹
    * docs (VERDICT r1 wrongness #4); now at most `maxDocs` verdict rows
    * (ordered by doc_id) and `maxDetails` violation rows ever leave the
    * cluster, and the golden shapes stay exact because every count comes
    * from [[RunSummary]], not from the collected slice.
    */
  def gather(verdicts: DataFrame, violations: DataFrame,
      maxDocs: Int = 10000, maxDetails: Int = 10000)
      : (Seq[VerdictRow], RunSummary) = {
    val s = verdicts.agg(
      count(lit(1)).as("docs"),
      count_if(col("valid")).as("valid_docs")).collect()(0)
    val nViol = violations.count()
    val summary = RunSummary(s.getLong(0), s.getLong(1),
      s.getLong(0) - s.getLong(1), nViol)
    val v = verdicts.select("doc_id", "valid").orderBy("doc_id")
      .limit(maxDocs)
      .collect().map(r => (r.getString(0), r.getBoolean(1)))
    val details = violations
      .select("doc_id", "pointer", "keyword", "message")
      .orderBy("doc_id", "pointer", "keyword")
      .limit(maxDetails).collect()
      .map(r => (r.getString(0), (r.getString(1), r.getString(2),
        r.getString(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val rows = v.map { case (id, ok) =>
      VerdictRow(id, ok, details.getOrElse(id, Seq.empty))
    }.toSeq
    (rows, summary)
  }

  /** TEXT — mirrors the reference shape (testreport/invalidyaml.txt):
    * one line per doc, indented keyword: message details. `color` adds
    * the ANSI verdicts of FilesOutput.toColoredString (CLI default on,
    * like the reference's `--color`).
    */
  def renderText(rows: Seq[VerdictRow], color: Boolean = false): String = {
    val (green, red, reset) =
      if (color) ("\u001b[32m", "\u001b[31m", "\u001b[0m")
      else ("", "", "")
    val sb = new StringBuilder
    rows.foreach { r =>
      val verdict =
        if (r.valid) s"${green}valid$reset" else s"${red}invalid$reset"
      sb.append(s"${r.doc_id}: $verdict\n")
      r.violations.foreach { case (ptr, kw, msg) =>
        sb.append(s"  $ptr: $kw: $msg\n")
      }
    }
    sb.toString
  }

  /** JSON — OutputUnit-LIST-like shape (testreport/invalidyaml.json).
    * Run verdict comes from the exact summary, not the collected slice.
    */
  def renderJson(rows: Seq[VerdictRow], summary: RunSummary): String = {
    val docs = rows.map { r =>
      val details = r.violations.map { case (ptr, kw, msg) =>
        s"""{"instanceLocation":"${jsonEscape(ptr)}","valid":false,""" +
          s""""errors":{"${jsonEscape(kw)}":"${jsonEscape(msg)}"}}"""
      }.mkString("[", ",", "]")
      s"""{"doc":"${jsonEscape(r.doc_id)}","valid":${r.valid},""" +
        s""""details":$details}"""
    }.mkString("[", ",", "]")
    s"""{"valid":${summary.allValid},"documents":$docs}"""
  }

  /** YAML — the reference's YAML render branch
    * (YamlSchemaValidatorRunner.java:103, FilesOutput.toYamlString):
    * same document/details shape as the JSON report, rendered as YAML.
    */
  def renderYaml(rows: Seq[VerdictRow], summary: RunSummary): String = {
    def q(s: String): String = "\"" + jsonEscape(s) + "\""
    val sb = new StringBuilder
    sb.append(s"valid: ${summary.allValid}\n")
    sb.append("documents:\n")
    rows.foreach { r =>
      sb.append(s"- doc: ${q(r.doc_id)}\n")
      sb.append(s"  valid: ${r.valid}\n")
      if (r.violations.nonEmpty) {
        sb.append("  details:\n")
        r.violations.foreach { case (ptr, kw, msg) =>
          sb.append(s"  - instanceLocation: ${q(ptr)}\n")
          sb.append("    valid: false\n")
          sb.append("    errors:\n")
          sb.append(s"      ${kw}: ${q(msg)}\n")
        }
      }
    }
    sb.toString
  }

  /** JUnit XML — testsuite tests/failures counts like
    * FilesOutputToJunit.java:30-31,58-63; counts from the exact summary.
    */
  def renderJunit(rows: Seq[VerdictRow], summary: RunSummary): String = {
    val cases = rows.map { r =>
      if (r.valid) s"""  <testcase name="${xmlEscape(r.doc_id)}"/>"""
      else {
        val msg = r.violations.map { case (ptr, kw, m) => s"$ptr: $kw: $m" }
          .mkString("; ")
        s"""  <testcase name="${xmlEscape(r.doc_id)}">
           |    <failure message="${xmlEscape(msg)}"/>
           |  </testcase>""".stripMargin
      }
    }.mkString("\n")
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<testsuite name="validation" tests="${summary.docs}" failures="${summary.invalidDocs}">
       |$cases
       |</testsuite>""".stripMargin
  }

  /** SARIF 2.1.0 — run verdict via executionSuccessful like
    * FilesOutputToSarif.java:64-67.
    */
  def renderSarif(rows: Seq[VerdictRow], summary: RunSummary): String = {
    val results = rows.flatMap { r =>
      r.violations.map { case (ptr, kw, msg) =>
        s"""{"ruleId":"${jsonEscape(kw)}","level":"error",""" +
          s""""message":{"text":"${jsonEscape(msg)}"},""" +
          s""""locations":[{"physicalLocation":{"artifactLocation":""" +
          s"""{"uri":"${jsonEscape(r.doc_id)}"},""" +
          s""""region":{"snippet":{"text":"${jsonEscape(ptr)}"}}}}]}"""
      }
    }.mkString("[", ",", "]")
    s"""{"version":"2.1.0","$$schema":"https://json.schemastore.org/sarif-2.1.0.json","runs":[{""" +
      s""""tool":{"driver":{"name":"graft-validator"}},""" +
      s""""invocations":[{"executionSuccessful":${summary.allValid}}],""" +
      s""""results":$results}]}"""
  }

  /** LLM structured (non-compact) form — FilesOutputToLlm.toJson
    * (FilesOutputToLlm.java:40-68): `{"summary":{files,valid,invalid,
    * errors},"results":[{file,valid,errors?}]}`; counts from the exact
    * summary.
    */
  def renderLlmJson(rows: Seq[VerdictRow], summary: RunSummary): String = {
    val results = rows.map { r =>
      val errs =
        if (r.violations.isEmpty) ""
        else r.violations.map { case (ptr, kw, msg) =>
          s"""{"pointer":"${jsonEscape(ptr)}","keyword":"${jsonEscape(kw)}",""" +
            s""""message":"${jsonEscape(msg)}"}"""
        }.mkString(""","errors":[""", ",", "]")
      s"""{"file":"${jsonEscape(r.doc_id)}","valid":${r.valid}$errs}"""
    }.mkString("[", ",", "]")
    s"""{"summary":{"files":${summary.docs},"valid":${summary.validDocs},""" +
      s""""invalid":${summary.invalidDocs},"errors":${summary.violations}},""" +
      s""""results":$results}"""
  }

  /** LLM-compact — header + flat error triples like
    * FilesOutputToLlm.java:83-99 (`# v/n files valid, e errors`);
    * header counts from the exact summary.
    */
  def renderLlm(rows: Seq[VerdictRow], summary: RunSummary): String = {
    val header = s"# ${summary.validDocs}/${summary.docs} files valid, " +
      s"${summary.violations} errors"
    val lines = rows.filterNot(_.valid).flatMap { r =>
      r.violations.map { case (ptr, kw, msg) =>
        s"${r.doc_id} $ptr $kw: $msg"
      }
    }
    (header +: lines).mkString("\n")
  }

  /** Exit-code sink (reference K3): 0 iff all valid — from the exact
    * distributed count, never the collected slice.
    */
  def exitCode(summary: RunSummary): Int = if (summary.allValid) 0 else 1
}
