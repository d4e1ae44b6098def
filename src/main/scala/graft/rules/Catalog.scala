package graft.rules

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Schema-store catalog routing: path-glob autodetection with
  * greatest-specificity tie-break, plus the reference's three-level
  * schema-resolution precedence (embedded `$schema` > catalog match >
  * CLI default, else error) — SURVEY.md §1.3 / §2.4 J2, re-expressed as
  * a broadcast theta-join (regex match) + argmax.
  *
  * Glob semantics mirror the reference's GlobPattern (GlobPattern.java:
  * 70-102): `*` matches within a path segment, `**` crosses segments,
  * `?` one non-separator char; specificity = count of literal characters
  * (SchemaDetector.java:39-46 argmax).
  */
object Catalog {

  final case class Entry(name: String, fileMatch: Seq[String], url: String)

  /** Small built-in catalog (stand-in for the reference's 1,347-entry
    * schemastore snapshot; same matching semantics).
    */
  val entries: Seq[Entry] = Seq(
    Entry("github-workflow",
      Seq(".github/workflows/*.yml", ".github/workflows/*.yaml"),
      "https://example.org/schemas/github-workflow.json"),
    Entry("kubernetes", Seq("k8s/**/*.yaml"),
      "https://example.org/schemas/kubernetes.json"),
    Entry("docker-compose", Seq("docker-compose*.yml"),
      "https://example.org/schemas/compose.json"),
    Entry("generic-yml", Seq("*.yml"),
      "https://example.org/schemas/generic.json"))

  /** Glob → (anchored regex, literal-char specificity). RE2-compatible
    * output so the DuckDB oracle can run the identical regex.
    */
  def compileGlob(glob: String): (String, Int) = {
    val sb = new StringBuilder("^")
    var i = 0
    var literals = 0
    while (i < glob.length) {
      glob.charAt(i) match {
        case '*' if i + 1 < glob.length && glob.charAt(i + 1) == '*' =>
          sb.append(".*"); i += 1
        case '*' => sb.append("[^/]*")
        case '?' => sb.append("[^/]")
        case c if "\\.[]{}()+-^$|".indexOf(c) >= 0 =>
          sb.append('\\').append(c); literals += 1
        case c => sb.append(c); literals += 1
      }
      i += 1
    }
    (sb.append("$").toString, literals)
  }

  /** Flattened compiled catalog: (name, url, regex, specificity). */
  lazy val compiled: Seq[(String, String, String, Int)] =
    entries.flatMap { e =>
      e.fileMatch.map { g =>
        val (re, spec) = compileGlob(g)
        (e.name, e.url, re, spec)
      }
    }

  /** Deterministic synthetic path + optional embedded `$schema` per doc —
    * the fixture for resolution-precedence tests. doc_id%6 picks the
    * path family; family 5 embeds its own schema URL (precedence 1);
    * family 3 (.txt) matches nothing (error case when no default).
    */
  def docPaths(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      when(col("doc_id") % 6 === 0,
          concat(lit(".github/workflows/ci-"), col("doc_id"), lit(".yml")))
        .when(col("doc_id") % 6 === 1,
          concat(lit("k8s/prod/app-"), col("doc_id"), lit(".yaml")))
        .when(col("doc_id") % 6 === 2,
          concat(lit("docker-compose-"), col("doc_id"), lit(".yml")))
        .when(col("doc_id") % 6 === 3,
          concat(lit("notes-"), col("doc_id"), lit(".txt")))
        .when(col("doc_id") % 6 === 4,
          concat(lit("conf-"), col("doc_id"), lit(".yml")))
        .otherwise(concat(lit("data-"), col("doc_id"), lit(".yml")))
        .as("path"),
      when(col("doc_id") % 6 === 5,
        lit("https://example.org/schemas/embedded.json"))
        .otherwise(lit(null).cast("string")).as("embedded_schema"))

  /** Catalog match: broadcast the compiled patterns, regex theta-join,
    * keep the greatest-specificity match (URL as deterministic
    * tie-break) — the Spark shape of SchemaDetector's argmax loop.
    */
  def catalogMatch(paths: DataFrame): DataFrame = {
    val s = paths.sparkSession
    import s.implicits._
    val cat = compiled.toDF("cat_name", "cat_url", "regex", "specificity")
    paths
      .join(broadcast(cat), regexp_like(col("path"), col("regex")), "left")
      .groupBy(col("doc_id"), col("path"), col("embedded_schema"))
      .agg(max_by(col("cat_url"), struct(col("specificity"), col("cat_url")))
        .as("catalog_url"))
  }

  /** Full resolution precedence (YamlSchemaValidator.java:123-136):
    * embedded `$schema` > catalog match > CLI default; no match and no
    * default → the reference's exact error message.
    */
  def resolve(paths: DataFrame, defaultSchema: Option[String]): DataFrame = {
    val default = defaultSchema.map(lit).getOrElse(lit(null).cast("string"))
    catalogMatch(paths).select(
      col("doc_id"), col("path"),
      coalesce(col("embedded_schema"), col("catalog_url"), default)
        .as("schema_url"),
      when(col("embedded_schema").isNotNull, "embedded")
        .when(col("catalog_url").isNotNull, "catalog")
        .when(default.isNotNull, "default")
        .otherwise("error").as("resolution"),
      when(col("embedded_schema").isNull && col("catalog_url").isNull &&
          default.isNull,
        lit("No schema found in YAML file or provided as parameter"))
        .otherwise(lit(null).cast("string")).as("error"))
  }
}
