package graft.rules

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ruleset registry: schema_url → compiled ruleset id, with the
  * reference's error-as-data semantics (SURVEY.md §3.2) — a missing local
  * schema or an unreachable remote one never aborts the run; the document
  * gets an invalid verdict with the reference's message shape:
  * `NoSuchFileException: <path>` (YamlSchemaValidator.java:78-81) and
  * `HTTP request failed with status code 404`
  * (YamlSchemaValidator.java:327-331).
  *
  * Remote fetch happens on the driver before plan-build (schemas become
  * broadcast config, never per-row I/O — §2.1 S4); here the registry is a
  * static map standing in for the fetch cache.
  */
object Registry {

  /** Known-good schema urls → ruleset id. */
  val known: Map[String, String] = Map(
    "https://example.org/schemas/github-workflow.json" -> "rs-workflow",
    "https://example.org/schemas/kubernetes.json" -> "rs-k8s",
    "https://example.org/schemas/compose.json" -> "rs-compose",
    "https://example.org/schemas/generic.json" -> "rs-generic",
    "https://example.org/schemas/embedded.json" -> "rs-embedded",
    "https://example.org/schemas/default.json" -> "rs-default")

  /** Attach ruleset ids / error messages to resolved docs
    * ([[Catalog.resolve]] output). Error taxonomy mirrors the reference:
    * file-path urls that don't resolve → NoSuchFileException-class;
    * http urls not in the registry → HTTP 404-class; null (no schema) →
    * already carries the "No schema found..." error from resolution.
    */
  def bind(resolved: DataFrame): DataFrame = {
    val url = col("schema_url")
    val ruleset = known.foldLeft(lit(null).cast("string")) {
      case (acc, (u, id)) => when(url === u, id).otherwise(acc)
    }
    resolved
      .withColumn("ruleset", ruleset)
      .withColumn("error", coalesce(
        col("error"),
        when(url.isNotNull && col("ruleset").isNull &&
          url.startsWith("http"),
          lit("HTTP request failed with status code 404")),
        when(url.isNotNull && col("ruleset").isNull,
          concat(lit("NoSuchFileException: "), url))))
  }
}
