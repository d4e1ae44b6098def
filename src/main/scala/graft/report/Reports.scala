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

  /** Collect verdicts + violations into ordered rows (small by contract:
    * reports render the violating slice, capped at `maxDetails`).
    */
  def gather(verdicts: DataFrame, violations: DataFrame,
      maxDetails: Int = 10000): Seq[VerdictRow] = {
    val v = verdicts.select("doc_id", "valid").orderBy("doc_id")
      .collect().map(r => (r.getString(0), r.getBoolean(1)))
    val details = violations
      .select("doc_id", "pointer", "keyword", "message")
      .orderBy("doc_id", "pointer", "keyword")
      .limit(maxDetails).collect()
      .map(r => (r.getString(0), (r.getString(1), r.getString(2),
        r.getString(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    v.map { case (id, ok) =>
      VerdictRow(id, ok, details.getOrElse(id, Seq.empty))
    }.toSeq
  }

  /** TEXT — mirrors the reference shape (testreport/invalidyaml.txt):
    * one line per doc, indented keyword: message details.
    */
  def renderText(rows: Seq[VerdictRow]): String = {
    val sb = new StringBuilder
    rows.foreach { r =>
      sb.append(s"${r.doc_id}: ${if (r.valid) "valid" else "invalid"}\n")
      r.violations.foreach { case (ptr, kw, msg) =>
        sb.append(s"  $ptr: $kw: $msg\n")
      }
    }
    sb.toString
  }

  /** JSON — OutputUnit-LIST-like shape (testreport/invalidyaml.json). */
  def renderJson(rows: Seq[VerdictRow]): String = {
    val docs = rows.map { r =>
      val details = r.violations.map { case (ptr, kw, msg) =>
        s"""{"instanceLocation":"${jsonEscape(ptr)}","valid":false,""" +
          s""""errors":{"${jsonEscape(kw)}":"${jsonEscape(msg)}"}}"""
      }.mkString("[", ",", "]")
      s"""{"doc":"${jsonEscape(r.doc_id)}","valid":${r.valid},""" +
        s""""details":$details}"""
    }.mkString("[", ",", "]")
    s"""{"valid":${rows.forall(_.valid)},"documents":$docs}"""
  }

  /** JUnit XML — testsuite tests/failures counts like
    * FilesOutputToJunit.java:30-31,58-63.
    */
  def renderJunit(rows: Seq[VerdictRow]): String = {
    val failures = rows.count(!_.valid)
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
       |<testsuite name="validation" tests="${rows.size}" failures="$failures">
       |$cases
       |</testsuite>""".stripMargin
  }

  /** SARIF 2.1.0 — run verdict via executionSuccessful like
    * FilesOutputToSarif.java:64-67.
    */
  def renderSarif(rows: Seq[VerdictRow]): String = {
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
      s""""invocations":[{"executionSuccessful":${rows.forall(_.valid)}}],""" +
      s""""results":$results}]}"""
  }

  /** LLM-compact — header + flat error triples like
    * FilesOutputToLlm.java:83-99 (`# v/n files valid, e errors`).
    */
  def renderLlm(rows: Seq[VerdictRow]): String = {
    val nValid = rows.count(_.valid)
    val nErr = rows.map(_.violations.size).sum
    val header = s"# $nValid/${rows.size} files valid, $nErr errors"
    val lines = rows.filterNot(_.valid).flatMap { r =>
      r.violations.map { case (ptr, kw, msg) =>
        s"${r.doc_id} $ptr $kw: $msg"
      }
    }
    (header +: lines).mkString("\n")
  }

  /** Exit-code sink (reference K3): 0 iff all valid. */
  def exitCode(rows: Seq[VerdictRow]): Int = if (rows.forall(_.valid)) 0 else 1
}
