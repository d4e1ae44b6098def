package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multi-document explode with reference key semantics
  * (YamlSchemaValidator.java:112-121): a source blob containing N
  * documents explodes into N rows keyed `"<path>-<1-based index>"`; a
  * single-document blob keeps the bare path; an empty blob is an error
  * row, not an abort (`:105-109`). The reference's P2/P3 operators
  * (SURVEY.md §2.2) as one generator projection.
  */
object MultiDoc {

  /** Explode `textCol` on `sep` into keyed sub-documents. Output:
    * (path, doc_key, doc_index, doc_text, error).
    */
  def explodeDocs(df: DataFrame, pathCol: String, textCol: String,
      sep: String): DataFrame = {
    val parts = split(col(textCol), sep)
    df
      .select(col(pathCol).as("path"), size(parts).as("n"),
        posexplode(parts).as(Seq("pos", "doc_text")))
      .select(
        col("path"),
        when(col("n") === 1, col("path"))
          .otherwise(concat(col("path"), lit("-"),
            (col("pos") + 1).cast("string"))).as("doc_key"),
        (col("pos") + 1).as("doc_index"),
        col("doc_text"),
        when(length(trim(col("doc_text"))) === 0,
          lit("Empty document")).otherwise(lit(null).cast("string"))
          .as("error"))
  }

  /** Driver-gated query: documents' text split on the token " stream "
    * (present in many fixtures, absent in others → both the multi-doc
    * and the single-doc key path are exercised).
    */
  def multiDocQuery(s: SparkSession, dir: String): DataFrame = {
    val src = Tables.documents(s, dir).select(
      concat(lit("f"), col("doc_id").cast("string"), lit(".yaml"))
        .as("path"),
      col("text"))
    explodeDocs(src, "path", "text", " stream ")
      .select(col("path"), col("doc_key"), col("doc_index"),
        length(col("doc_text")).as("doc_len"))
      .orderBy(col("path"), col("doc_index"))
  }
}
