package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Document ingestion with the reference's exact semantics
  * (YamlSchemaValidator.java:250-270): try JSON first, fall back to
  * multi-document YAML; N docs explode keyed `path-i` (1-based), one doc
  * keeps the bare path (`:112-121`), zero docs or a parse failure become
  * error rows, never aborts (`:100-109`, P4). Runs as a typed
  * mapPartitions pass — one ObjectMapper pair per partition, no
  * driver-side parsing.
  */
object YamlSource {

  final case class RawFile(path: String, text: String)
  final case class ParsedDoc(path: String, doc_key: String, json: String,
      error: String)

  /** Read whole files into (path, text) rows — the distributed version of
    * the reference's readAllBytes (S1/S3; Spark parallelizes the
    * sequential per-file loop).
    */
  def readFiles(spark: SparkSession, paths: Seq[String]): Dataset[RawFile] = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(paths: _*)
      .select(input_file_name().as("path"), col("value").as("text"))
      .as[RawFile]
  }

  /** Parse each file into keyed JSON documents (as canonical JSON strings,
    * ready for `parse_json` → VARIANT validation).
    */
  def parseDocs(files: Dataset[RawFile]): Dataset[ParsedDoc] = {
    import files.sparkSession.implicits._
    files.mapPartitions { it =>
      val jsonMapper = new ObjectMapper()
      val yamlMapper = new ObjectMapper(new YAMLFactory())
      it.flatMap { f =>
        try {
          val docs =
            try List(jsonMapper.readTree(f.text))
            catch {
              case _: Exception =>
                yamlMapper.readerFor(classOf[JsonNode])
                  .readValues[JsonNode](f.text).readAll().asScala.toList
            }
          docs.filterNot(d => d == null || d.isNull) match {
            case Nil =>
              List(ParsedDoc(f.path, f.path, null,
                "No schema found in YAML file or provided as parameter"))
            case single :: Nil =>
              List(ParsedDoc(f.path, f.path,
                jsonMapper.writeValueAsString(single), null))
            case many =>
              many.zipWithIndex.map { case (d, i) =>
                ParsedDoc(f.path, s"${f.path}-${i + 1}",
                  jsonMapper.writeValueAsString(d), null)
              }
          }
        } catch {
          case e: Exception =>
            // parse failure → invalid row with message, run continues
            // (message class mirrors YamlSchemaValidatorTest.java:53)
            List(ParsedDoc(f.path, f.path, null,
              s"${e.getClass.getSimpleName}: ${e.getMessage}"))
        }
      }
    }
  }
}
