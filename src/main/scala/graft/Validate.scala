package graft

import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.report.Reports
import graft.rules.{Catalog, JsonSchemaCompiler}
import graft.sources.YamlSource

/** CLI-parity entry point — the reference's runner
  * (YamlSchemaValidatorRunner.java:57-122) as one Spark pipeline:
  *
  *   Validate [--schema <file>] [--schema-override]
  *            [--report TEXT|JSON|YAML|JUNIT|SARIF|LLM]
  *            [--report-file <path>] [<files...>|-]
  *
  * files (YAML or JSON, multi-doc supported; stdin when no files or `-`
  * is given) → keyed docs → per-doc schema RESOLUTION with the
  * reference's precedence (in-doc `$schema` unless --schema-override >
  * --schema > catalog autodetect, YamlSchemaValidator.java:123-136) →
  * each distinct schema compiled once on the driver → violations →
  * rendered report → exit 0 iff all valid (K1/K2/K3).
  */
object Validate {

  /** Schema file may be JSON or YAML (reference P5,
    * getSchemaYamlJsonNode YamlSchemaValidator.java:224-240).
    */
  def readSchema(path: String): String = {
    val text = Files.readString(Paths.get(path))
    val jsonMapper = new ObjectMapper()
    try { jsonMapper.readTree(text); text }
    catch {
      case _: Exception =>
        val yamlMapper = new ObjectMapper(new YAMLFactory())
        jsonMapper.writeValueAsString(yamlMapper.readTree(text))
    }
  }

  /** Spec-compat entry: one mandatory schema, files only. */
  def run(spark: SparkSession, files: Seq[String], schemaPath: String)
      : (Seq[Reports.VerdictRow], Int) = {
    val (rows, summary) = runFull(spark, files, Some(schemaPath))
    (rows, Reports.exitCode(summary))
  }

  /** Full pipeline. `stdinText` is the at-most-once stdin read
    * (YamlSchemaValidatorRunner.java:75-88: used when `files` is empty
    * or contains "-", which is then removed from the list).
    */
  def runFull(spark: SparkSession, files: Seq[String],
      schema: Option[String], schemaOverride: Boolean = false,
      stdinText: Option[String] = None)
      : (Seq[Reports.VerdictRow], Reports.RunSummary) = {
    import spark.implicits._
    val useStdin = stdinText.isDefined &&
      (files.isEmpty || files.contains("-"))
    val fileList = files.filterNot(_ == "-") // reference removes "-"
    val sources = Seq(
      if (fileList.nonEmpty)
        Some(YamlSource.readFiles(spark, fileList)) else None,
      if (useStdin)
        Some(YamlSource.stdinSource(spark, stdinText.get)) else None
    ).flatten
    require(sources.nonEmpty, "no input files and no stdin")
    val parsed = sources.reduce(_ unionAll _)
    val docs = YamlSource.parseDocs(parsed).toDF()

    // ---- schema resolution precedence (per doc) ----
    val cli = schema.map(lit).getOrElse(lit(null).cast("string"))
    val emb =
      if (schemaOverride) lit(null).cast("string")
      else col("embedded_schema")
    val withUrl =
      if (schema.isDefined)
        docs.withColumn("schema_url", coalesce(emb, cli))
      else {
        // catalog autodetect only runs when no --schema was given
        // (YamlSchemaValidator.java:131-133)
        val urls = Catalog.pathUrls(docs.select("path"))
        docs.join(broadcast(urls), Seq("path"), "left")
          .withColumn("schema_url", coalesce(emb, col("catalog_url")))
      }

    // ---- compile each distinct schema once on the driver ----
    val urls = withUrl
      .filter(col("error").isNull && col("schema_url").isNotNull)
      .select("schema_url").distinct().as[String].collect()
    val compiledByUrl: Map[String,
        Either[String, JsonSchemaCompiler.CompiledSchema]] =
      urls.map { u =>
        u -> (
          if (u.startsWith("http://") || u.startsWith("https://"))
            // zero-egress stand-in with the reference's error parity
            // (YamlSchemaValidator.java:327-331)
            Left("HTTP request failed with status code 404")
          else
            try Right(JsonSchemaCompiler.compile(readSchema(u)))
            catch {
              case e: java.nio.file.NoSuchFileException =>
                Left(s"NoSuchFileException: ${e.getMessage}")
              case e: Exception =>
                Left(s"${e.getClass.getSimpleName}: ${e.getMessage}")
            })
      }.toMap

    // ---- violations: CASE over the compiled schemas by url ----
    val v = try_parse_json(col("json"))
    val emptyViol = array().cast(JsonSchemaCompiler.ViolationType)
    val compiledViol = compiledByUrl.foldLeft(emptyViol) {
      case (acc, (u, Right(cs))) =>
        when(col("schema_url") === u, cs.violations(v)).otherwise(acc)
      case (acc, _) => acc
    }
    val loadErr = compiledByUrl.foldLeft(lit(null).cast("string")) {
      case (acc, (u, Left(msg))) =>
        when(col("schema_url") === u, msg).otherwise(acc)
      case (acc, _) => acc
    }
    val errMsg: Column = coalesce(
      col("error"),
      when(col("schema_url").isNull,
        lit("No schema found in YAML file or provided as parameter")),
      loadErr)
    val validated = withUrl
      .withColumn("violations",
        when(errMsg.isNotNull,
          array(struct(lit("/").as("pointer"), lit("error").as("keyword"),
            errMsg.as("message"), lit("#").as("schemaLocation"))))
          .otherwise(compiledViol))
      .select(col("doc_key").as("doc_id"),
        (size(col("violations")) === 0).as("valid"), col("violations"))
    val verdicts = validated.select("doc_id", "valid")
    val violations = validated
      .select(col("doc_id"), explode(col("violations")).as("x"))
      .select(col("doc_id"), col("x.pointer").as("pointer"),
        col("x.keyword").as("keyword"), col("x.message").as("message"))
    Reports.gather(verdicts, violations)
  }

  /** Usage text — the reference's help gate
    * (YamlSchemaValidatorRunner.java:128-146 printHelp).
    */
  val helpText: String =
    """Usage: Validate [options] [<file1> <file2> ...]
      |
      |Note: If no files are provided, or if '-' is used as a filename,
      |the tool reads from stdin.
      |
      |Options:
      |  --help                    Show this help message
      |  --schema <path>           Path to the JSON/YAML schema file
      |  --schema-override         Use --schema instead of $schema from docs
      |  --report <type>           text (default), json, yaml, junit, sarif, llm
      |  --report-file <name>      Write report to file (default: stdout)
      |  --color <true|false>      ANSI colors in text output (default: true)
      |  --compact <true|false>    LLM report: compact lines vs JSON (default: true)
      |""".stripMargin

  def main(args: Array[String]): Unit = {
    var schema: Option[String] = None
    var schemaOverride = false
    var format = "TEXT"
    var reportFile: Option[String] = None
    var color = true
    var compact = true
    val files = Seq.newBuilder[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--help" => println(helpText); sys.exit(0)
        case "--schema" => schema = Some(args(i + 1)); i += 1
        case "--schema-override" => schemaOverride = true
        case "--report" => format = args(i + 1).toUpperCase; i += 1
        case "--report-file" => reportFile = Some(args(i + 1)); i += 1
        case "--color" => color = args(i + 1).toBoolean; i += 1
        case "--compact" => compact = args(i + 1).toBoolean; i += 1
        case f => files += f
      }
      i += 1
    }
    // config gate (YamlSchemaValidatorRunner.validateConfig)
    if (schemaOverride && schema.isEmpty) {
      println("Configuration error:Schema path must be provided when " +
        "schemaPathOverride is enabled")
      println(helpText)
      sys.exit(0)
    }
    val fileArgs = files.result()
    // stdin read at most once, only when it will be used
    // (YamlSchemaValidatorRunner.java:75-88)
    val stdinText =
      if (fileArgs.isEmpty || fileArgs.contains("-"))
        Some(scala.io.Source.stdin.mkString)
      else None
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (rows, summary) =
      runFull(spark, fileArgs, schema, schemaOverride, stdinText)
    val report = format match {
      case "JSON" => Reports.renderJson(rows, summary)
      case "YAML" => Reports.renderYaml(rows, summary)
      case "JUNIT" => Reports.renderJunit(rows, summary)
      case "SARIF" => Reports.renderSarif(rows, summary)
      case "LLM" =>
        if (compact) Reports.renderLlm(rows, summary)
        else Reports.renderLlmJson(rows, summary)
      case _ => Reports.renderText(rows, color)
    }
    reportFile match {
      case Some(p) => Files.writeString(Paths.get(p), report)
      case None => println(report)
    }
    spark.stop()
    sys.exit(Reports.exitCode(summary))
  }
}
