package graft.rules

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Schema-store catalog routing: path-glob autodetection with
  * greatest-specificity tie-break, plus the reference's three-level
  * schema-resolution precedence (embedded `$schema` > catalog match >
  * CLI default, else error) — SURVEY.md §1.3 / §2.4 J2, re-expressed as
  * a broadcast theta-join (regex match) + argmax.
  *
  * Glob semantics mirror the reference's GlobPattern exactly
  * (GlobPattern.java:70-102): `*` matches within a path segment, `?` one
  * non-separator char, a `**` followed by a slash matches zero or more
  * whole segments (regex "(?:.*" + "/)?" — zero-segment match was the r1
  * divergence), a bare `**` any run of characters; a glob containing no
  * slash matches
  * the path's BASENAME only (GlobPattern.java:32-40). Specificity is the
  * count of non-wildcard characters; on ties the first catalog entry
  * wins (SchemaDetector.java:39-46 strict `>` argmax).
  *
  * The catalog is the reference's bundled schemastore snapshot
  * (src/main/resources/schema-catalog.json, public schemastore.org data
  * — 1,347 entries / ~2,600 globs), loaded once on the driver and
  * broadcast.
  */
object Catalog {

  final case class Entry(name: String, fileMatch: Seq[String], url: String)

  /** The real bundled catalog (entries without url or fileMatch are
    * skipped, like SchemaDetector.compiled, SchemaDetector.java:55-66).
    */
  lazy val entries: Seq[Entry] = {
    val in = getClass.getResourceAsStream("/schema-catalog.json")
    try {
      val root = new ObjectMapper().readTree(in)
      root.get("schemas").elements().asScala.map { e =>
        Entry(
          Option(e.get("name")).map(_.asText()).getOrElse(""),
          Option(e.get("fileMatch"))
            .map(_.elements().asScala.map(_.asText()).toSeq)
            .getOrElse(Seq.empty),
          Option(e.get("url")).map(_.asText()).orNull)
      }.filter(e => e.url != null && e.fileMatch.nonEmpty).toSeq
    } finally in.close()
  }

  final case class CompiledGlob(regex: String, basenameOnly: Boolean,
      specificity: Int)

  /** Glob → (anchored regex, basename-only flag, literal-char
    * specificity). RE2-compatible output so the DuckDB oracle can run the
    * identical regex. Mirrors GlobPattern.globToRegex char-for-char.
    */
  def compileGlob(glob: String): CompiledGlob = {
    val sb = new StringBuilder("^")
    var i = 0
    while (i < glob.length) {
      glob.charAt(i) match {
        case '*' if i + 1 < glob.length && glob.charAt(i + 1) == '*' =>
          i += 1
          if (i + 1 < glob.length && glob.charAt(i + 1) == '/') {
            i += 1
            sb.append("(?:.*/)?") // zero or more whole segments
          } else sb.append(".*")
        case '*' => sb.append("[^/]*")
        case '?' => sb.append("[^/]")
        case c if "\\.[]{}()+-^$|".indexOf(c) >= 0 =>
          sb.append('\\').append(c)
        case c => sb.append(c)
      }
      i += 1
    }
    CompiledGlob(sb.append("$").toString,
      basenameOnly = glob.indexOf('/') < 0,
      specificity = glob.count(c => c != '*' && c != '?'))
  }

  /** Driver-side glob match with full reference semantics (separator
    * normalization + basename matching) — the spec-level twin of the
    * distributed path in [[catalogMatch]].
    */
  def globMatches(glob: String, path: String): Boolean = {
    val g = compileGlob(glob)
    val normalized = path.replace('\\', '/')
    val target =
      if (g.basenameOnly) normalized.substring(normalized.lastIndexOf('/') + 1)
      else normalized
    target.matches(g.regex)
  }

  /** Flattened compiled catalog:
    * (name, url, regex, basename_only, specificity, idx). idx preserves
    * catalog order for the reference's first-wins tie-break.
    */
  lazy val compiled: Seq[(String, String, String, Boolean, Int, Int)] =
    entries.flatMap(e => e.fileMatch.map(g => (e, g))).zipWithIndex.map {
      case ((e, g), idx) =>
        val cg = compileGlob(g)
        (e.name, e.url, cg.regex, cg.basenameOnly, cg.specificity, idx)
    }

  /** Driver-side detection against the bundled snapshot — the literal
    * shape of SchemaDetector.detect's argmax loop (strict `>`, so the
    * first catalog entry wins ties). Used by the CLI for one-off paths
    * and by specs; the distributed twin is [[catalogMatch]].
    */
  def detect(path: String): Option[String] = {
    var bestUrl: Option[String] = None
    var bestSpec = -1
    entries.foreach { e =>
      e.fileMatch.foreach { g =>
        val cg = compileGlob(g)
        if (cg.specificity > bestSpec && globMatches(g, path)) {
          bestSpec = cg.specificity
          bestUrl = Some(e.url)
        }
      }
    }
    bestUrl
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

  /** Catalog match, distributed. A regex theta-join (`regexp_like(path,
    * regex_col)`) would re-COMPILE every pattern per row (~13M
    * Pattern.compile at sf0.1 — measured 11 s); instead the compiled
    * catalog is BROADCAST sorted by (specificity desc, catalog idx), each
    * partition compiles the 2,600 patterns once, and the first match in
    * that order IS the argmax with the reference's first-wins tie-break
    * (SchemaDetector.java:39-46) — so the scan early-exits too. One
    * narrow mapPartitions pass; no shuffle, no groupBy.
    */
  def catalogMatch(paths: DataFrame): DataFrame = {
    val s = paths.sparkSession
    import s.implicits._
    val sorted = compiled
      .sortBy { case (_, _, _, _, spec, idx) => (-spec, idx) }
      .map { case (_, url, re, bn, _, _) => (url, re, bn) }.toArray
    val bc = s.sparkContext.broadcast(sorted)
    paths
      .select(col("doc_id").cast("long"), col("path"),
        col("embedded_schema"))
      .as[(Long, String, Option[String])]
      .mapPartitions { it =>
        val pats = bc.value.map { case (url, re, bn) =>
          (url, java.util.regex.Pattern.compile(re), bn)
        }
        it.map { case (id, path, emb) =>
          val norm = path.replace('\\', '/')
          val base = norm.substring(norm.lastIndexOf('/') + 1)
          var hit: String = null
          var i = 0
          while (hit == null && i < pats.length) {
            val (url, p, bn) = pats(i)
            if (p.matcher(if (bn) base else norm).matches()) hit = url
            i += 1
          }
          (id, path, emb, Option(hit))
        }
      }
      .toDF("doc_id", "path", "embedded_schema", "catalog_url")
  }

  /** (path, catalog_url) for a single-column `path` DataFrame — the
    * generic entry the CLI uses (broadcast-joined back); same compiled
    * broadcast + first-match loop as [[catalogMatch]].
    */
  def pathUrls(paths: DataFrame): DataFrame = {
    val s = paths.sparkSession
    import s.implicits._
    catalogMatch(paths.distinct()
        .select(lit(0L).as("doc_id"), col("path"),
          lit(null).cast("string").as("embedded_schema")))
      .select(col("path"), col("catalog_url"))
  }

  /** Full resolution precedence, EXACTLY as the reference implements it
    * (YamlSchemaValidator.java:123-136): the CLI `--schema` value is the
    * starting point; an in-document `$schema` REPLACES it unless
    * `--schema-override` is set (YamlSchemaValidatorRunner.java config);
    * catalog autodetection runs only when neither is present; nothing →
    * the reference's exact error message. So the order is
    * override > embedded > default > catalog — NOT embedded > catalog >
    * default as SURVEY §1.3 paraphrased (the code is authoritative).
    * When a default schema is given the catalog match is skipped
    * entirely (no broadcast, no per-path regex work).
    */
  def resolve(paths: DataFrame, defaultSchema: Option[String],
      schemaOverride: Boolean = false): DataFrame = {
    val default = defaultSchema.map(lit).getOrElse(lit(null).cast("string"))
    val noSchema =
      lit("No schema found in YAML file or provided as parameter")
    if (schemaOverride && defaultSchema.isDefined)
      paths.select(col("doc_id"), col("path"),
        default.as("schema_url"), lit("override").as("resolution"),
        lit(null).cast("string").as("error"))
    else if (defaultSchema.isDefined)
      paths.select(col("doc_id"), col("path"),
        coalesce(col("embedded_schema"), default).as("schema_url"),
        when(col("embedded_schema").isNotNull, "embedded")
          .otherwise("default").as("resolution"),
        lit(null).cast("string").as("error"))
    else
      catalogMatch(paths).select(
        col("doc_id"), col("path"),
        coalesce(col("embedded_schema"), col("catalog_url"))
          .as("schema_url"),
        when(col("embedded_schema").isNotNull, "embedded")
          .when(col("catalog_url").isNotNull, "catalog")
          .otherwise("error").as("resolution"),
        when(col("embedded_schema").isNull && col("catalog_url").isNull,
          noSchema).otherwise(lit(null).cast("string")).as("error"))
  }
}
