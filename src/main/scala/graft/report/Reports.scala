package graft.report

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Report renderers over the verdict/violation Datasets — the Spark
  * re-expression of the reference's output formats (SURVEY.md §2.1 K1-K3,
  * §2.5). Shapes are pinned byte-for-byte (TEXT/YAML) or line-for-line
  * (JSON/JUNIT/SARIF, after the reference's own XmlCompareUtil
  * normalization) against copies of the reference's golden files
  * (testreport/{valid,invalid,multi3invalid}yaml.*) in GoldenReportSpec.
  *
  * Aggregation happens distributed; only the (small, ordered) rendered
  * rows are collected. Ordering is always explicit (`doc_id, pointer`)
  * because the reference relies on insertion order (§2.6).
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

  /** One NetworkNT-LIST-style detail (golden invalidyaml.json:6-14):
    * subschema evaluation path, absolute schema location ($id + fragment),
    * failing instance pointer, and the keyword→message error map.
    */
  final case class Detail(evaluationPath: String, schemaLocation: String,
      instanceLocation: String, errors: Seq[(String, String)])

  /** Per-document OutputUnit re-expression: top-level `errors` (schema
    * resolution / parse failures, FilesOutput's `output.getErrors()`) vs
    * per-keyword `details` (FilesOutput's `output.getDetails()`).
    */
  final case class VerdictRow(doc_id: String, valid: Boolean,
      errors: Seq[(String, String)] = Seq.empty,
      details: Seq[Detail] = Seq.empty)

  /** Exact run totals, computed DISTRIBUTED in one aggregation — these
    * are what the renderers use for counts/verdicts, so truncating the
    * enumerated rows never skews a report's numbers.
    */
  final case class RunSummary(docs: Long, validDocs: Long,
      invalidDocs: Long, violations: Long) {
    def allValid: Boolean = invalidDocs == 0
  }

  /** Rebuild a Detail from a flat violation row. The compiler emits
    * schemaLocation as `<$id>#<evaluationPath>/<keyword>`; the keyword
    * moves into the errors map (NetworkNT LIST shape), leaving the
    * subschema path.
    */
  private def toDetail(pointer: String, keyword: String, message: String,
      schemaLocation: String): Detail = {
    val loc = Option(schemaLocation).getOrElse("#")
    val hash = loc.indexOf('#')
    val (base, frag) =
      if (hash >= 0) (loc.substring(0, hash), loc.substring(hash + 1))
      else ("", loc)
    val evalPath = frag.stripSuffix("/" + keyword)
    Detail(evalPath, s"$base#$evalPath", pointer, Seq(keyword -> message))
  }

  /** Collect a BOUNDED slice of verdicts + violations for rendering,
    * plus exact aggregated totals. At most `maxDocs` verdict rows
    * (ordered by doc_id) and `maxDetails` violation rows ever leave the
    * cluster; every count in a rendered report comes from [[RunSummary]],
    * not from the collected slice, so truncation never skews the numbers.
    * Violations with keyword `error` become the doc's top-level errors
    * map (schema-load / parse failures); the rest become details.
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
    val withLoc =
      if (violations.columns.contains("schemaLocation")) violations
      else violations.withColumn("schemaLocation", lit("#"))
    val details = withLoc
      .select("doc_id", "pointer", "keyword", "message", "schemaLocation")
      .orderBy("doc_id", "pointer", "keyword")
      .limit(maxDetails).collect()
      .map(r => (r.getString(0), (r.getString(1), r.getString(2),
        r.getString(3), r.getString(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val rows = v.map { case (id, ok) =>
      val vs = details.getOrElse(id, Seq.empty)
      val (errs, dets) = vs.partition(_._2 == "error")
      VerdictRow(id, ok,
        errs.map { case (_, k, m, _) => (k, m) },
        dets.map { case (p, k, m, l) => toDetail(p, k, m, l) })
    }.toSeq
    (rows, summary)
  }

  /** Flat (pointer, keyword, message) triples — the LLM renderers' view;
    * top-level errors surface at pointer "/".
    */
  private def flatViolations(r: VerdictRow): Seq[(String, String, String)] =
    r.errors.map { case (k, m) => ("/", k, m) } ++
      r.details.flatMap(d =>
        d.errors.map { case (k, m) => (d.instanceLocation, k, m) })

  // ---------------------------------------------------------------------
  // TEXT — byte-exact vs testreport/*.txt (FilesOutput.toColoredString):
  // "Validation Result:" header, per-doc ok/invalid, top-level errors as
  // " label: message", details as " Details:\n Path:\n Schema:\n kw: msg".
  // `color` wraps verdicts in Spring AnsiColor GREEN/RED..DEFAULT (39).
  // ---------------------------------------------------------------------
  def renderText(rows: Seq[VerdictRow], summary: RunSummary,
      color: Boolean = false): String = {
    def verdict(ok: Boolean): String =
      if (!color) { if (ok) "ok" else "invalid" }
      else if (ok) "\u001b[32mok\u001b[39m"
      else "\u001b[31minvalid\u001b[39m"
    val sb = new StringBuilder
    sb.append("Validation Result: ").append(verdict(summary.allValid))
      .append('\n')
    rows.foreach { r =>
      sb.append(r.doc_id).append(": ").append(verdict(r.valid)).append('\n')
      if (!r.valid) {
        r.errors.foreach { case (label, msg) =>
          sb.append(" " + label + ": ").append(msg).append('\n')
        }
        r.details.foreach { d =>
          sb.append(" Details:\n Path: ").append(d.instanceLocation)
            .append("\n Schema: ").append(d.schemaLocation).append('\n')
          d.errors.foreach { case (label, msg) =>
            sb.append(' ').append(label).append(": ").append(msg)
              .append('\n')
          }
        }
      }
    }
    sb.toString
  }

  // ---------------------------------------------------------------------
  // Minimal JSON document model + a writer reproducing Jackson's
  // DefaultPrettyPrinter line-break placement (objects expand one field
  // per line with " : "; arrays stay inline with ", "; empty: "{ }"/"[ ]")
  // so JSON/SARIF output diffs cleanly against the reference goldens.
  // ---------------------------------------------------------------------
  private sealed trait J
  private final case class JObj(fields: Seq[(String, J)]) extends J
  private final case class JArr(items: Seq[J]) extends J
  private final case class JStr(v: String) extends J
  private final case class JBool(v: Boolean) extends J
  private final case class JInt(v: Long) extends J

  private def writeJ(j: J, sb: StringBuilder, indent: Int): Unit = j match {
    case JStr(s) => sb.append('"').append(jsonEscape(s)).append('"')
    case JBool(b) => sb.append(b.toString)
    case JInt(n) => sb.append(n.toString)
    case JObj(Seq()) => sb.append("{ }")
    case JObj(fs) =>
      sb.append("{\n")
      fs.zipWithIndex.foreach { case ((k, v), i) =>
        sb.append("  " * (indent + 1)).append('"').append(jsonEscape(k))
          .append("\" : ")
        writeJ(v, sb, indent + 1)
        sb.append(if (i < fs.size - 1) ",\n" else "\n")
      }
      sb.append("  " * indent).append('}')
    case JArr(Seq()) => sb.append("[ ]")
    case JArr(items) =>
      sb.append("[ ")
      items.zipWithIndex.foreach { case (v, i) =>
        writeJ(v, sb, indent)
        if (i < items.size - 1) sb.append(", ")
      }
      sb.append(" ]")
  }

  private def pretty(j: J): String = {
    val sb = new StringBuilder
    writeJ(j, sb, 0)
    sb.toString
  }

  /** Per-doc OutputUnit JSON: valid, errors?, details? (field order per
    * NetworkNT OutputUnit / golden invalidyaml.json + multi3invalidyaml
    * .json).
    */
  private def docUnit(r: VerdictRow): J = JObj(
    Seq("valid" -> (JBool(r.valid): J)) ++
      (if (r.errors.nonEmpty)
        Seq("errors" -> (JObj(r.errors.map { case (k, m) =>
          k -> (JStr(m): J) }): J))
      else Nil) ++
      (if (r.details.nonEmpty)
        Seq("details" -> (JArr(r.details.map(detailUnit)): J))
      else Nil))

  private def detailUnit(d: Detail): J = JObj(Seq(
    "valid" -> JBool(false),
    "evaluationPath" -> JStr(d.evaluationPath),
    "schemaLocation" -> JStr(d.schemaLocation),
    "instanceLocation" -> JStr(d.instanceLocation),
    "errors" -> JObj(d.errors.map { case (k, m) => k -> (JStr(m): J) })))

  /** JSON — the reference's FilesOutput shape `{valid, files:{...}}`
    * (golden testreport/invalidyaml.json). Run verdict comes from the
    * exact summary, not the collected slice.
    */
  def renderJson(rows: Seq[VerdictRow], summary: RunSummary): String =
    pretty(JObj(Seq(
      "valid" -> JBool(summary.allValid),
      "files" -> JObj(rows.map(r => r.doc_id -> docUnit(r))))))

  /** YAML — FilesOutput.toYamlString (golden testreport/invalidyaml
    * .yaml): `---` header, unquoted keys, double-quoted string values,
    * Jackson YAMLMapper array-dash placement. Byte-exact vs the goldens.
    */
  def renderYaml(rows: Seq[VerdictRow], summary: RunSummary): String = {
    def q(s: String): String = "\"" + jsonEscape(s) + "\""
    val sb = new StringBuilder("---\n")
    sb.append(s"valid: ${summary.allValid}\n")
    sb.append("files:\n")
    rows.foreach { r =>
      sb.append(s"  ${r.doc_id}:\n")
      sb.append(s"    valid: ${r.valid}\n")
      if (r.errors.nonEmpty) {
        sb.append("    errors:\n")
        r.errors.foreach { case (k, m) =>
          sb.append(s"      $k: ${q(m)}\n")
        }
      }
      if (r.details.nonEmpty) {
        sb.append("    details:\n")
        r.details.foreach { d =>
          sb.append("    - valid: false\n")
          sb.append(s"      evaluationPath: ${q(d.evaluationPath)}\n")
          sb.append(s"      schemaLocation: ${q(d.schemaLocation)}\n")
          sb.append(s"      instanceLocation: ${q(d.instanceLocation)}\n")
          sb.append("      errors:\n")
          d.errors.foreach { case (k, m) =>
            sb.append(s"        $k: ${q(m)}\n")
          }
        }
      }
    }
    sb.toString
  }

  /** Failure-category message — extractFailureMessage parity
    * (FilesOutputToJunit.java:130-150): "No Schema Error" / "YAML Parse
    * Error" / "Validation Error" for top-level errors, "Type Mismatch at
    * <instanceLocation>" for detail failures, else "Validation Failure".
    */
  private def failureMessage(r: VerdictRow): String =
    r.errors.collectFirst { case ("error", m) => m } match {
      case Some(m) if m.startsWith("No schema") => "No Schema Error"
      case Some(m) if m.contains("MarkedYAMLException") ||
          m.contains("YAMLException") => "YAML Parse Error"
      case Some(_) => "Validation Error"
      case None => r.details.headOption
        .map(d => "Type Mismatch at " + d.instanceLocation)
        .getOrElse("Validation Failure")
    }

  /** Full error text — extractFullErrorMessage parity
    * (FilesOutputToJunit.java:103-124): top-level "error" values, then
    * each detail message on its own line, trimmed.
    */
  private def fullError(r: VerdictRow): String = {
    val sb = new StringBuilder
    r.errors.foreach { case (k, v) => if (k == "error") sb.append(v) }
    r.details.foreach(d =>
      d.errors.foreach { case (_, v) => sb.append(v).append('\n') })
    sb.toString.trim
  }

  /** JUnit XML — the reference's `<testsuites>`-wrapped suite
    * (FilesOutputToJunit; golden testreport/invalidyaml.xml): fixed
    * SchemaValidationSuite name, file="src/test/resources",
    * classname="files", time="0.0", categorized failure message +
    * full-error body. Counts from the exact summary.
    */
  def renderJunit(rows: Seq[VerdictRow], summary: RunSummary): String = {
    val sb = new StringBuilder
    sb.append("<?xml version='1.0' encoding='UTF-8'?>\n")
    sb.append("<testsuites errors=\"0\" failures=\"")
      .append(summary.invalidDocs)
      .append("\" name=\"SchemaValidationSuite\" skipped=\"0\" tests=\"")
      .append(summary.docs).append("\">\n")
    sb.append("  <testsuite errors=\"0\" failures=\"")
      .append(summary.invalidDocs)
      .append("\" file=\"src/test/resources\" name=\"SchemaValidationSuite\"")
      .append(" skipped=\"0\" tests=\"").append(summary.docs)
      .append("\" time=\"0.0\">\n")
    rows.foreach { r =>
      if (r.valid)
        sb.append("    <testcase classname=\"files\" name=\"")
          .append(xmlEscape(r.doc_id)).append("\" time=\"0.0\"/>\n")
      else {
        sb.append("    <testcase classname=\"files\" name=\"")
          .append(xmlEscape(r.doc_id)).append("\" time=\"0.0\">\n")
        sb.append("      <failure message=\"")
          .append(xmlEscape(failureMessage(r))).append("\">")
          .append(xmlEscape(fullError(r))).append("</failure>\n")
        sb.append("    </testcase>\n")
      }
    }
    sb.append("  </testsuite>\n")
    sb.append("</testsuites>\n")
    sb.toString
  }

  private def sarifResult(filename: String, message: String,
      instanceLocation: Option[String]): J = {
    val region: J = instanceLocation match {
      case Some(il) => JObj(Seq(
        "snippet" -> JObj(Seq("text" -> JStr("Path: " + il)))))
      case None => JObj(Seq.empty)
    }
    JObj(Seq(
      "level" -> JStr("error"),
      "locations" -> JArr(Seq(JObj(Seq(
        "physicalLocation" -> JObj(Seq(
          "artifactLocation" -> JObj(Seq("uri" -> JStr(filename))),
          "region" -> region)))))),
      "message" -> JObj(Seq("text" -> JStr(message))),
      "ruleId" -> JStr("schema-validation")))
  }

  /** SARIF 2.1.0 — FilesOutputToSarif parity (golden testreport/
    * invalidyaml.sarif): tool.driver rules array, invocations with
    * start/end timestamps + exitCode, one result per top-level error
    * (empty region) and per detail ("At path 'X': msg", snippet
    * "Path: X"). Key order matches the golden's (Jackson 3 alphabetical).
    */
  def renderSarif(rows: Seq[VerdictRow], summary: RunSummary): String = {
    val start = java.time.Instant.now().toString
    val results: Seq[J] = rows.filterNot(_.valid).flatMap { r =>
      val errResults =
        if (r.errors.isEmpty) Nil
        else Seq(sarifResult(r.doc_id,
          r.errors.collectFirst { case ("error", m) => m }
            .getOrElse("Validation error"), None))
      val detResults = r.details.map { d =>
        val msg = s"At path '${d.instanceLocation}': " +
          d.errors.map(_._2).mkString(" ")
        sarifResult(r.doc_id, msg.trim, Some(d.instanceLocation))
      }
      errResults ++ detResults
    }
    val rule = JObj(Seq(
      "defaultConfiguration" -> JObj(Seq("level" -> JStr("error"))),
      "fullDescription" -> JObj(Seq("text" -> JStr(
        "The file does not conform to the specified JSON/YAML schema"))),
      "help" -> JObj(Seq("text" -> JStr(
        "Ensure that the file content matches the schema definition"))),
      "id" -> JStr("schema-validation"),
      "shortDescription" -> JObj(Seq(
        "text" -> JStr("Schema validation error")))))
    val driver = JObj(Seq(
      "informationUri" ->
        JStr("https://github.com/alexmond/yj-schema-validator"),
      "name" -> JStr("YAML Schema Validator"),
      "rules" -> JArr(Seq(rule)),
      "semanticVersion" -> JStr("1.0.0"),
      "version" -> JStr("1.0.0")))
    val run = JObj(Seq(
      "invocations" -> JArr(Seq(JObj(Seq(
        "endTimeUtc" -> JStr(java.time.Instant.now().toString),
        "executionSuccessful" -> JBool(summary.allValid),
        "exitCode" -> JInt(if (summary.allValid) 0L else 1L),
        "startTimeUtc" -> JStr(start))))),
      "results" -> JArr(results),
      "tool" -> JObj(Seq("driver" -> driver))))
    pretty(JObj(Seq(
      "$schema" -> JStr("https://json.schemastore.org/sarif-2.1.0.json"),
      "runs" -> JArr(Seq(run)),
      "version" -> JStr("2.1.0"))))
  }

  /** LLM structured (non-compact) form — FilesOutputToLlm.toJson
    * (FilesOutputToLlm.java:40-68): `{"summary":{files,valid,invalid,
    * errors},"results":[{file,valid,errors?}]}`; counts from the exact
    * summary.
    */
  def renderLlmJson(rows: Seq[VerdictRow], summary: RunSummary): String = {
    val results = rows.map { r =>
      val flat = flatViolations(r)
      val errs =
        if (flat.isEmpty) ""
        else flat.map { case (ptr, kw, msg) =>
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
      flatViolations(r).map { case (ptr, kw, msg) =>
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
