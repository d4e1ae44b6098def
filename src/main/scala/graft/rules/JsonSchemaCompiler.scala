package graft.rules

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** JSON-Schema (draft-2020-12 subset) → Catalyst compiler over Spark 4
  * VARIANT documents — the engine-level analogue of the reference's
  * NetworkNT delegation (YamlSchemaValidator.java:138-140), except the
  * schema compiles ONCE on the driver into a `Column` tree and executes
  * distributed.
  *
  * Supported keyword surface = everything the reference's fixtures
  * exercise (SURVEY.md §2.3): type, properties (nested), required, enum,
  * pattern, minimum/maximum, minLength/maxLength, const, plus `$defs` /
  * `$ref` with compile-time inlining and bounded unrolling for recursive
  * refs (SURVEY.md §7.3 — Columns cannot recurse; depth limit documented).
  *
  * Failure messages reproduce NetworkNT phrasing — e.g. the invalid.yaml
  * golden "integer found, boolean expected"
  * (testreport/invalidyaml.txt:6).
  */
object JsonSchemaCompiler {

  private val mapper = new ObjectMapper()

  /** One compiled check: evaluates over the variant doc column. */
  final case class Check(pointer: String, keyword: String,
      schemaLocation: String, violated: Column => Column,
      message: Column => Column)

  final case class CompiledSchema(checks: Seq[Check]) {
    /** Violations array column (struct per failed keyword) for a VARIANT
      * document column.
      */
    def violations(v: Column): Column = {
      val entries = checks.map { c =>
        when(c.violated(v), struct(
          lit(c.pointer).as("pointer"),
          lit(c.keyword).as("keyword"),
          c.message(v).as("message"),
          lit(c.schemaLocation).as("schemaLocation")))
      }
      filter(array(entries: _*), e => e.isNotNull)
    }

    def valid(v: Column): Column = size(violations(v)) === 0
  }

  /** Map a schema_of_variant type string to the JSON-Schema type name. */
  def jsonType(sub: Column): Column = {
    val t = schema_of_variant(sub)
    when(sub.isNull || t === "VOID", "null")
      .when(t.isin("BIGINT", "INT", "SMALLINT", "TINYINT"), "integer")
      .when(t.startsWith("DECIMAL") || t.isin("DOUBLE", "FLOAT"), "number")
      .when(t === "STRING", "string")
      .when(t === "BOOLEAN", "boolean")
      .when(t.startsWith("ARRAY"), "array")
      .otherwise("object")
  }

  private def path(segments: Seq[String]): String =
    "$" + segments.map(s => s".$s").mkString

  private def pointer(segments: Seq[String]): String =
    "/" + segments.mkString("/")

  /** Compile a schema document. `maxRefDepth` bounds recursive `$ref`
    * unrolling (the reference's one recursive case, loggerLevelProp,
    * nests ≤ 3 in its fixtures).
    */
  def compile(schemaJson: String, maxRefDepth: Int = 3): CompiledSchema = {
    val root = mapper.readTree(schemaJson)
    val checks = Seq.newBuilder[Check]

    def resolveRef(node: JsonNode): JsonNode = {
      val ref = node.get("$ref").asText()
      require(ref.startsWith("#/"),
        s"only intra-document refs supported: $ref")
      ref.stripPrefix("#/").split('/')
        .foldLeft(root)((n, seg) => n.get(seg))
    }

    def walk(node0: JsonNode, segs: Seq[String], depth: Int,
        refDepth: Int): Unit = {
      if (refDepth > maxRefDepth) return // bounded unrolling
      val node =
        if (node0.has("$ref")) resolveRef(node0)
        else node0
      val nextRefDepth = if (node0.has("$ref")) refDepth + 1 else refDepth
      val p = path(segs)
      val ptr = if (segs.isEmpty) "/" else pointer(segs)
      val loc = "#/" + segs.flatMap(s => Seq("properties", s))
        .mkString("/")
      def sub(v: Column): Column =
        if (segs.isEmpty) v else try_variant_get(v, p, "variant")
      def present(v: Column): Column = sub(v).isNotNull

      if (node.has("type")) {
        val expected = node.get("type").asText()
        checks += Check(ptr, "type", s"$loc/type",
          v => present(v) && jsonType(sub(v)) =!= expected,
          v => format_string("%s found, " + expected + " expected",
            jsonType(sub(v))))
      }
      if (node.has("enum")) {
        val vals = node.get("enum").elements().asScala
          .map(_.asText()).toSeq
        checks += Check(ptr, "enum", s"$loc/enum",
          v => present(v) &&
            !try_variant_get(v, p, "string").isin(vals: _*),
          _ => lit("does not have a value in the enumeration " +
            vals.mkString("[", ", ", "]")))
      }
      if (node.has("const")) {
        val c = node.get("const").asText()
        checks += Check(ptr, "const", s"$loc/const",
          v => present(v) && try_variant_get(v, p, "string") =!= c,
          _ => lit(s"must be the constant value '$c'"))
      }
      if (node.has("pattern")) {
        val re = node.get("pattern").asText()
        checks += Check(ptr, "pattern", s"$loc/pattern",
          v => present(v) && !try_variant_get(v, p, "string").rlike(re),
          _ => lit(s"does not match the regex pattern $re"))
      }
      if (node.has("minimum")) {
        val m = node.get("minimum").asDouble()
        checks += Check(ptr, "minimum", s"$loc/minimum",
          v => present(v) && try_variant_get(v, p, "double") < m,
          _ => lit(s"must have a minimum value of " +
            node.get("minimum").asText()))
      }
      if (node.has("maximum")) {
        val m = node.get("maximum").asDouble()
        checks += Check(ptr, "maximum", s"$loc/maximum",
          v => present(v) && try_variant_get(v, p, "double") > m,
          _ => lit(s"must have a maximum value of " +
            node.get("maximum").asText()))
      }
      if (node.has("minLength")) {
        val m = node.get("minLength").asInt()
        checks += Check(ptr, "minLength", s"$loc/minLength",
          v => present(v) &&
            length(try_variant_get(v, p, "string")) < m,
          _ => lit(s"must be at least $m characters long"))
      }
      if (node.has("maxLength")) {
        val m = node.get("maxLength").asInt()
        checks += Check(ptr, "maxLength", s"$loc/maxLength",
          v => present(v) &&
            length(try_variant_get(v, p, "string")) > m,
          _ => lit(s"must be at most $m characters long"))
      }
      if (node.has("required")) {
        node.get("required").elements().asScala.foreach { r =>
          val name = r.asText()
          val childPath = path(segs :+ name)
          checks += Check(
            if (segs.isEmpty) "/" else pointer(segs), "required",
            s"$loc/required",
            v => present(v) &&
              try_variant_get(v, childPath, "variant").isNull,
            _ => lit(s"required property '$name' not found"))
        }
      }
      if (node.has("properties")) {
        node.get("properties").fields().asScala.foreach { e =>
          walk(e.getValue, segs :+ e.getKey, depth + 1, nextRefDepth)
        }
      }
    }

    walk(root, Seq.empty, 0, 0)
    CompiledSchema(checks.result())
  }
}
