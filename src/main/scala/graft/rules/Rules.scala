package graft.rules

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** JSON-Schema-style rule ADT over span documents, compiled to pure
  * Catalyst `Column` trees (whole-stage-codegen'd; zero UDFs).
  *
  * The reference delegates keyword evaluation to NetworkNT
  * (`schema.validate(...)`, YamlSchemaValidator.java:138-140); here each
  * keyword from the exercised surface (SURVEY.md §2.3 — type, enum,
  * required, pattern, minimum/maximum, minLength, items, contains, oneOf,
  * not) compiles to a predicate over a span struct, and a failed keyword
  * yields a violation struct `{pointer, keyword, message, schemaLocation}`
  * mirroring the NetworkNT OutputUnit detail shape
  * (testreport/invalidyaml.json:6-14).
  */
sealed trait SpanRule {
  def field: String
  def keyword: String
  def schemaLocation: String =
    s"#/properties/spans/items/properties/$field/$keyword"

  /** Predicate: TRUE means the span VIOLATES this rule. `span` is the span
    * struct Column, `i1` the 1-based span index.
    */
  def violated(span: Column, i1: Column): Column

  /** Failure message; NetworkNT-flavored phrasing. */
  def message(span: Column, i1: Column): Column
}

/** `enum` — value must be one of `allowed` (sample-schema.json:8-26). */
final case class EnumRule(field: String, allowed: Seq[String])
    extends SpanRule {
  val keyword = "enum"
  def violated(span: Column, i1: Column): Column = {
    val v = span.getField(field)
    v.isNotNull && !v.isin(allowed: _*)
  }
  def message(span: Column, i1: Column): Column =
    lit(s"does not have a value in the enumeration " +
      allowed.mkString("[", ", ", "]"))
}

/** `required` — field must be present (non-null), optionally only when
  * `kind` equals `whenKind` (FilesOutputToLlmTest.java:73-76 exercises
  * `required`).
  */
final case class RequiredRule(field: String, whenKind: Option[String] = None)
    extends SpanRule {
  val keyword = "required"
  def violated(span: Column, i1: Column): Column = {
    val missing = span.getField(field).isNull
    whenKind.fold(missing)(k => span.getField("kind") === k && missing)
  }
  def message(span: Column, i1: Column): Column =
    lit(s"required property '$field' not found")
}

/** `pattern` — string must match regex (sample-schema.json:1451-1453). */
final case class PatternRule(field: String, regex: String) extends SpanRule {
  val keyword = "pattern"
  def violated(span: Column, i1: Column): Column = {
    val v = span.getField(field)
    v.isNotNull && !v.rlike(regex)
  }
  def message(span: Column, i1: Column): Column =
    lit(s"does not match the regex pattern $regex")
}

/** `minimum` / `maximum` on a numeric field (sample-schema.json:1421-1437). */
final case class RangeRule(field: String, min: Option[Long], max: Option[Long])
    extends SpanRule {
  val keyword = if (min.isDefined) "minimum" else "maximum"
  def violated(span: Column, i1: Column): Column = {
    val v = span.getField(field)
    val lo = min.map(m => v < lit(m)).getOrElse(lit(false))
    val hi = max.map(m => v > lit(m)).getOrElse(lit(false))
    v.isNotNull && (lo || hi)
  }
  def message(span: Column, i1: Column): Column = (min, max) match {
    case (Some(m), _) => lit(s"must have a minimum value of $m")
    case (_, Some(m)) => lit(s"must have a maximum value of $m")
    case _ => lit("")
  }
}

/** `minLength` on a string field (sample-schema.json:1964-1966). */
final case class MinLengthRule(field: String, minLen: Int) extends SpanRule {
  val keyword = "minLength"
  def violated(span: Column, i1: Column): Column = {
    val v = span.getField(field)
    v.isNotNull && length(v) < minLen
  }
  def message(span: Column, i1: Column): Column =
    lit(s"must be at least $minLen characters long")
}

/** `type` — dynamic JSON-type check of a string-encoded value, reproducing
  * NetworkNT's "<actual> found, <expected> expected" phrasing
  * (testreport/invalidyaml.txt:6 — "integer found, boolean expected").
  */
final case class TypeRule(field: String, expected: String) extends SpanRule {
  val keyword = "type"
  def violated(span: Column, i1: Column): Column = {
    val v = span.getField(field)
    v.isNotNull && RuleCompiler.jsonTypeOf(v) =!= expected
  }
  def message(span: Column, i1: Column): Column =
    format_string("%s found, " + expected + " expected",
      RuleCompiler.jsonTypeOf(span.getField(field)))
}

/** `format` — 2020-12 format assertion on a string field (the reference
  * enables assertions globally: formatAssertionsEnabled(true),
  * YamlSchemaValidator.java:193). Unknown formats compile to no-ops
  * (annotations), per spec.
  */
final case class FormatRule(field: String, format: String) extends SpanRule {
  val keyword = "format"
  private val regex: Option[String] = Formats.regexes.get(format)
  def violated(span: Column, i1: Column): Column = {
    val v = span.getField(field)
    regex.map(re => v.isNotNull && !v.rlike(re)).getOrElse(lit(false))
  }
  def message(span: Column, i1: Column): Column =
    lit(s"does not match the $format pattern")
}

/** `not` — negation of an inner rule (sample-schema.json:1442-1444). */
final case class NotRule(inner: SpanRule) extends SpanRule {
  val field: String = inner.field
  val keyword = "not"
  def violated(span: Column, i1: Column): Column =
    // violated iff the inner rule is satisfied
    !coalesce(inner.violated(span, i1), lit(false))
  def message(span: Column, i1: Column): Column =
    lit("must not be valid against the schema")
}

/** `oneOf` — exactly one branch must hold (sample-schema.json:29-38).
  * Branches are predicates over the span; Kleene nulls coalesce to false
  * so the sum is always defined (SURVEY.md §7.3).
  */
final case class OneOfRule(field: String,
    branches: Seq[Column => Column]) extends SpanRule {
  val keyword = "oneOf"
  def violated(span: Column, i1: Column): Column = {
    val matches = branches
      .map(b => coalesce(b(span), lit(false)).cast("int"))
      .reduce(_ + _)
    matches =!= 1
  }
  def message(span: Column, i1: Column): Column =
    lit("must be valid against exactly one schema")
}

object DocRules {
  /** Doc-level `contains` (sample-schema.json:1310-1312): the spans array
    * must contain at least one element satisfying the predicate.
    */
  def containsViolation(spans: Column, pred: Column => Column,
      desc: String): Column =
    when(!coalesce(exists(spans, s => coalesce(pred(s), lit(false))),
        lit(false)),
      struct(
        lit("/spans").as("pointer"),
        lit("contains").as("keyword"),
        lit(s"does not contain an element that matches: $desc")
          .as("message"),
        lit("#/properties/spans/contains").as("schemaLocation")))

  /** Doc-level `minItems`/`maxItems` over the spans array. */
  def sizeViolation(spans: Column, minItems: Int, maxItems: Int): Column =
    when(size(spans) < minItems || size(spans) > maxItems,
      struct(
        lit("/spans").as("pointer"),
        when(size(spans) < minItems, "minItems").otherwise("maxItems")
          .as("keyword"),
        when(size(spans) < minItems,
          lit(s"must have at least $minItems items"))
          .otherwise(lit(s"must have at most $maxItems items"))
          .as("message"),
        lit("#/properties/spans/items").as("schemaLocation")))

  /** `additionalProperties` over a MapType column (map-shape objects,
    * sample-schema.json:1286,1641-1643): every key must match the
    * allowed pattern.
    */
  def additionalPropertiesViolation(m: Column, keyPattern: String): Column =
    when(size(filter(map_keys(m), k => !k.rlike(keyPattern))) > 0,
      struct(
        lit("/props").as("pointer"),
        lit("additionalProperties").as("keyword"),
        concat(lit("property "),
          element_at(filter(map_keys(m), k => !k.rlike(keyPattern)), 1),
          lit(" is not allowed")).as("message"),
        lit("#/properties/props/additionalProperties").as("schemaLocation")))
}

object RuleCompiler {
  /** JSON type classification of a string-encoded scalar — the dynamic
    * `typeof` the fixed Spark schema doesn't need for schema'd columns but
    * the reference's dynamic documents do (SURVEY.md §2.3 `type`).
    */
  def jsonTypeOf(v: Column): Column =
    when(v.isNull, "null")
      .when(v.rlike("^-?[0-9]+$"), "integer")
      .when(v.rlike("^-?[0-9]+\\.[0-9]+([eE][+-]?[0-9]+)?$"), "number")
      .when(v.isin("true", "false"), "boolean")
      .otherwise("string")

  /** Compile a rule set into one Column producing
    * `array<struct<pointer, keyword, message, schemaLocation>>` of all
    * violations in the document's spans. One pass over the array, fully
    * codegen'd — the Spark analogue of NetworkNT's single-walk LIST output.
    */
  def violations(spans: Column, rules: Seq[SpanRule]): Column = {
    val perSpan = transform(spans, (s, i0) => {
      val i1 = i0 + 1
      val checks = rules.map { r =>
        when(r.violated(s, i1), struct(
          concat(lit("/spans/"), i0.cast("string"), lit("/" + r.field))
            .as("pointer"),
          lit(r.keyword).as("keyword"),
          r.message(s, i1).as("message"),
          lit(r.schemaLocation).as("schemaLocation")))
      }
      filter(array(checks: _*), v => v.isNotNull)
    })
    flatten(perSpan)
  }

  /** Default rule set for the interleaved-docs domain. */
  val docRules: Seq[SpanRule] = Seq(
    EnumRule("kind", Seq("text", "image", "audio")),
    RequiredRule("media_ref", whenKind = Some("image")),
    PatternRule("media_ref", "^m[0-9]+$"),
    RangeRule("offset", min = Some(0), max = None),
    RangeRule("offset", min = None, max = Some(togetherMax)))

  private def togetherMax: Long = graft.data.Interleaved.MaxSpans.toLong - 1

  /** Flagship benchmark rule set: sized like a real-world schema (the
    * reference's sample-schema.json carries 682 `type` + 131 `properties`
    * + dozens of enum/pattern/range keywords — SURVEY.md §2.3), so the
    * constraint-eval throughput measurement reflects a production keyword
    * density, not a toy. Entirely within the compact fast-path surface.
    */
  val benchRules: Seq[SpanRule] = docRules ++ Seq(
    EnumRule("kind", Seq("text", "image", "audio", "video", "table")),
    EnumRule("kind", Seq("text", "image", "audio", "caption")),
    PatternRule("media_ref", "^[a-z][a-z0-9]*$"),
    PatternRule("media_ref", "^m"),
    PatternRule("media_ref", "[0-9]$"),
    PatternRule("text", "^[\\p{L}\\p{N}\\p{P} ]*$"),
    PatternRule("text", "^\\S|^$"),
    RangeRule("offset", Some(0), None),
    RangeRule("offset", None, Some(1000)),
    RangeRule("offset", Some(-1000), None),
    RequiredRule("kind", None),
    RequiredRule("offset", None),
    MinLengthRule("text", 1),
    MinLengthRule("media_ref", 2),
    MinLengthRule("kind", 3))
}
