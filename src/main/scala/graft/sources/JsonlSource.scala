package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL document ingestion — the format crawl dumps and training
  * shards actually arrive in (one JSON object per line; see
  * [[graft.operators.Mix.writeShards]] for the write side).
  *
  * Error-as-data, like [[YamlSource]]'s parse-error capture: the schema
  * is EXPLICIT (never inferred — schema inference is a full extra pass
  * over 100 TB and silently widens types on dirty data), the reader
  * runs PERMISSIVE with a corrupt-record column, and a malformed line
  * becomes a row with `parse_error` set instead of a dead job. Callers
  * split on `parse_error IS NULL` and route the rest to a quarantine
  * sink.
  */
object JsonlSource {

  val DocSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("_corrupt", StringType)))

  /** Read a JSONL directory/file into `(doc_id, text, lang, source,
    * parse_error)`. A line that fails to parse (or whose fields fail
    * the type coercion) yields nulls plus the raw line in
    * `parse_error`.
    */
  def readDocuments(s: SparkSession, path: String): DataFrame =
    s.read
      .schema(DocSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("_corrupt").as("parse_error"))
}
