package graft

import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.report.Reports
import graft.rules.JsonSchemaCompiler
import graft.sources.YamlSource

/** CLI-parity entry point — the reference's runner
  * (YamlSchemaValidatorRunner.java:57-122) as one Spark pipeline:
  *
  *   Validate --schema <file> [--report TEXT|JSON|JUNIT|SARIF|LLM]
  *            [--report-file <path>] <files...>
  *
  * files (YAML or JSON, multi-doc supported) → keyed docs → compiled
  * schema over VARIANT → verdicts + violations → rendered report →
  * exit 0 iff all valid (K1/K2/K3).
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

  /** Run the pipeline; returns (verdict rows, exit code). */
  def run(spark: SparkSession, files: Seq[String], schemaPath: String)
      : (Seq[Reports.VerdictRow], Int) = {
    val compiled = JsonSchemaCompiler.compile(readSchema(schemaPath))
    val parsed = YamlSource.parseDocs(YamlSource.readFiles(spark, files))
    val validated = parsed.toDF()
      .withColumn("violations",
        when(col("error").isNotNull,
          array(struct(lit("/").as("pointer"), lit("error").as("keyword"),
            col("error").as("message"), lit("#").as("schemaLocation"))))
          .otherwise(
            compiled.violations(try_parse_json(col("json")))))
      .select(col("doc_key").as("doc_id"),
        (size(col("violations")) === 0).as("valid"), col("violations"))
    val verdicts = validated.select("doc_id", "valid")
    val violations = validated
      .select(col("doc_id"), explode(col("violations")).as("x"))
      .select(col("doc_id"), col("x.pointer").as("pointer"),
        col("x.keyword").as("keyword"), col("x.message").as("message"))
    val rows = Reports.gather(verdicts, violations)
    (rows, Reports.exitCode(rows))
  }

  def main(args: Array[String]): Unit = {
    var schema: Option[String] = None
    var format = "TEXT"
    var reportFile: Option[String] = None
    val files = Seq.newBuilder[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--schema" => schema = Some(args(i + 1)); i += 1
        case "--report" => format = args(i + 1).toUpperCase; i += 1
        case "--report-file" => reportFile = Some(args(i + 1)); i += 1
        case f => files += f
      }
      i += 1
    }
    require(schema.isDefined, "--schema <file> is required")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (rows, exit) = run(spark, files.result(), schema.get)
    val report = format match {
      case "JSON" => Reports.renderJson(rows)
      case "JUNIT" => Reports.renderJunit(rows)
      case "SARIF" => Reports.renderSarif(rows)
      case "LLM" => Reports.renderLlm(rows)
      case _ => Reports.renderText(rows)
    }
    reportFile match {
      case Some(p) => Files.writeString(Paths.get(p), report)
      case None => println(report)
    }
    spark.stop()
    sys.exit(exit)
  }
}
