package graft.rules

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Schema-store catalog routing: path-glob autodetection with
  * greatest-specificity tie-break, plus the reference's full
  * schema-resolution precedence — `--schema-override` > embedded
  * `$schema` > CLI default > catalog autodetection, else the no-schema
  * error (see [[resolve]], which mirrors YamlSchemaValidator.java:123-136;
  * SURVEY §1.3's "embedded > catalog > default" paraphrase was wrong) —
  * re-expressed as a broadcast first-match scan + argmax.
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

  /** Parse a schemastore-format catalog document (entries without url or
    * fileMatch are skipped, like SchemaDetector.compiled,
    * SchemaDetector.java:55-66).
    */
  def parseCatalog(json: String): Seq[Entry] = {
    val root = new ObjectMapper().readTree(json)
    Option(root.get("schemas")).toSeq
      .flatMap(_.elements().asScala.toSeq).map { e =>
        Entry(
          Option(e.get("name")).map(_.asText()).getOrElse(""),
          Option(e.get("fileMatch"))
            .map(_.elements().asScala.map(_.asText()).toSeq)
            .getOrElse(Seq.empty),
          Option(e.get("url")).map(_.asText()).orNull)
      }.filter(e => e.url != null && e.fileMatch.nonEmpty)
  }

  /** The real bundled catalog snapshot. */
  lazy val entries: Seq[Entry] = {
    val in = getClass.getResourceAsStream("/schema-catalog.json")
    try parseCatalog(new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8))
    finally in.close()
  }

  /** Catalog loading policy, mirroring SchemaCatalogLoader.load
    * (SchemaCatalogLoader.java:42-51): prefer a live fetch from the
    * configured `catalogUrl`, fall back to the bundled snapshot when the
    * fetch fails or yields no schemas, so detection keeps working
    * offline. A `file:` URL or plain local path reads locally (the shape
    * the zero-egress sandbox can exercise end-to-end); `http(s)` is the
    * reference's HttpClient GET — here a stand-in that always takes the
    * loader's catch-and-fallback branch, since the sandbox has no
    * egress. Returns the ENTRIES to route with; callers build a
    * [[Snapshot]] for custom catalogs.
    */
  def loadEntries(catalogUrl: Option[String]): Seq[Entry] = {
    val fetched: Option[Seq[Entry]] = catalogUrl.filter(_.nonEmpty)
      .flatMap { url =>
        try {
          if (url.startsWith("http://") || url.startsWith("https://"))
            None // zero-egress: fetch fails -> loader falls back
          else {
            val p =
              if (url.startsWith("file:"))
                Paths.get(java.net.URI.create(url))
              else Paths.get(url)
            Some(parseCatalog(Files.readString(p)))
          }
        } catch { case _: Exception => None }
      }.filter(_.nonEmpty)
    fetched.getOrElse(entries)
  }

  /** A routable catalog: compiled globs + cached patterns for a given
    * entry list. The process-default [[Catalog]] API routes against the
    * bundled snapshot; `Snapshot(loadEntries(Some(url)))` routes against
    * a custom catalog with the same argmax/first-match machinery.
    */
  final case class Snapshot(snapEntries: Seq[Entry]) {
    lazy val compiledGlobs: Seq[(String, String, String, Boolean, Int, Int, String)] =
      snapEntries.flatMap(e => e.fileMatch.map(g => (e, g)))
        .zipWithIndex.map { case ((e, g), idx) =>
          val cg = compileGlob(g)
          (e.name, e.url, cg.regex, cg.basenameOnly, cg.specificity, idx,
            cg.litSuffix)
        }

    lazy val patterns: Array[(java.util.regex.Pattern, Boolean, Int, String)] =
      compiledGlobs.map { case (_, url, re, bn, spec, _, _) =>
        (java.util.regex.Pattern.compile(re), bn, spec, url)
      }.toArray

    lazy val sortedPatterns: Array[(String, String, Boolean, String)] =
      compiledGlobs
        .sortBy { case (_, _, _, _, spec, idx, _) => (-spec, idx) }
        .map { case (_, url, re, bn, _, _, suf) => (url, re, bn, suf) }
        .toArray
  }

  final case class CompiledGlob(regex: String, basenameOnly: Boolean,
      specificity: Int, litSuffix: String)

  /** Glob → (anchored regex, basename-only flag, literal-char
    * specificity, literal tail). RE2-compatible output so the DuckDB
    * oracle can run the identical regex. Mirrors GlobPattern.globToRegex
    * char-for-char. `litSuffix` is the glob text after the last wildcard
    * — every glob char outside `*`/`?` is matched literally, so
    * `target.endsWith(litSuffix)` is a NECESSARY condition of the regex
    * (the anchored pattern ends with exactly those literal chars), which
    * makes it a sound cheap pre-filter for the 2,600-pattern scan.
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
    val lastWild = math.max(glob.lastIndexOf('*'), glob.lastIndexOf('?'))
    val rawSuffix = glob.substring(lastWild + 1)
    // When the last wildcard is the `**` of a `**/` form, its regex is
    // "(?:.*" + "/)?" — the slash is INSIDE the optional group, so a
    // depth-zero target ("docker-compose.yml" vs "**" + "/docker-compose
    // .yml") legitimately matches without it. Keeping the '/' in the
    // suffix made endsWith reject exactly those matches (ADVICE r3 high:
    // root-level files mis-routed by the distributed autodetect). The
    // slashless remainder is still matched literally by the regex tail,
    // so stripping it preserves the necessary-condition property.
    val litSuffix =
      if (lastWild >= 1 && glob.charAt(lastWild) == '*' &&
          glob.charAt(lastWild - 1) == '*' && rawSuffix.startsWith("/"))
        rawSuffix.substring(1)
      else rawSuffix
    CompiledGlob(sb.append("$").toString,
      basenameOnly = glob.indexOf('/') < 0,
      specificity = glob.count(c => c != '*' && c != '?'),
      litSuffix = litSuffix)
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

  /** The process-default snapshot over the bundled catalog. */
  lazy val bundled: Snapshot = Snapshot(entries)

  /** [[loadEntries]] as a routable snapshot; reuses the bundled
    * snapshot's cached patterns when the loader fell back to it.
    */
  def loadSnapshot(catalogUrl: Option[String]): Snapshot = {
    val es = loadEntries(catalogUrl)
    if (es eq entries) bundled else Snapshot(es)
  }

  /** Flattened compiled bundled catalog:
    * (name, url, regex, basename_only, specificity, idx, lit_suffix).
    * idx preserves catalog order for the reference's first-wins
    * tie-break.
    */
  def compiled: Seq[(String, String, String, Boolean, Int, Int, String)] =
    bundled.compiledGlobs

  /** Driver-side detection — the literal shape of SchemaDetector
    * .detect's argmax loop (strict `>` over catalog order, so the first
    * catalog entry wins ties) over the snapshot's cached compiled
    * patterns (the twin of `SchemaDetector.compiled`; the r2 version
    * recompiled all ~2,600 globs, twice each, per call — ADVICE r2).
    * Used by the CLI for one-off paths and by specs; the distributed
    * twin is [[catalogMatch]], and CatalogDriftSpec asserts the two
    * agree on hundreds of real schemastore fileMatch shapes.
    */
  def detect(path: String, snap: Snapshot = bundled): Option[String] = {
    val norm = path.replace('\\', '/')
    val base = norm.substring(norm.lastIndexOf('/') + 1)
    var bestUrl: Option[String] = None
    var bestSpec = -1
    snap.patterns.foreach { case (p, bn, spec, url) =>
      if (spec > bestSpec &&
          p.matcher(if (bn) base else norm).matches()) {
        bestSpec = spec
        bestUrl = Some(url)
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
    * (SchemaDetector.java:39-46) — so the scan early-exits too. Each
    * pattern is guarded by an `endsWith(litSuffix)` pre-filter — a
    * necessary condition of its anchored regex (see [[compileGlob]]), so
    * semantics are untouched while the overwhelmingly common outcome
    * (wrong extension) costs a few char compares instead of a regex run
    * (v_routing_none 2.4 s → ~0.9 s at sf0.1). One narrow mapPartitions
    * pass; no shuffle, no groupBy.
    */
  def catalogMatch(paths: DataFrame, snap: Snapshot = bundled)
      : DataFrame = {
    val s = paths.sparkSession
    import s.implicits._
    val bc = s.sparkContext.broadcast(snap.sortedPatterns)
    paths
      .select(col("doc_id").cast("long"), col("path"),
        col("embedded_schema"))
      .as[(Long, String, Option[String])]
      .mapPartitions { it =>
        val pats = bc.value.map { case (url, re, bn, suf) =>
          (url, java.util.regex.Pattern.compile(re), bn, suf)
        }
        it.map { case (id, path, emb) =>
          val norm = path.replace('\\', '/')
          val base = norm.substring(norm.lastIndexOf('/') + 1)
          var hit: String = null
          var i = 0
          while (hit == null && i < pats.length) {
            val (url, p, bn, suf) = pats(i)
            val target = if (bn) base else norm
            if (target.endsWith(suf) && p.matcher(target).matches())
              hit = url
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
  def pathUrls(paths: DataFrame, snap: Snapshot = bundled): DataFrame = {
    val s = paths.sparkSession
    import s.implicits._
    catalogMatch(paths.distinct()
        .select(lit(0L).as("doc_id"), col("path"),
          lit(null).cast("string").as("embedded_schema")), snap)
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
