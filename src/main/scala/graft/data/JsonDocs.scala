package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic JSON-document fixture for the full VARIANT schema
  * compiler surface (v_json_schema2): each `documents` row becomes one
  * JSON doc whose fields are arithmetic in `doc_id`/`n_chars`, so the
  * DuckDB oracle can derive the expected violation set from the same
  * columns without parsing JSON — a genuinely independent check.
  *
  * Injected violation classes (CASE order matters — first match wins,
  * mirrored exactly in Oracles.jsonSchema2):
  *   - %59: email key absent            → required
  *   - %23: email missing '@'           → format (email)
  *   - %29: ts not a timestamp          → format (date-time)
  *   - n_chars > 500                    → maximum
  *   - %10 == 0 (score=0)              → exclusiveMinimum
  *   - score % 3 != 0                   → multipleOf
  *   - %31: duplicate tags              → uniqueItems
  *   - %37: a non-string tag            → items/type (per-element)
  *   - %41: empty tags                  → minItems
  *   - %53: kind matches no oneOf branch→ oneOf
  *   - %43 / %61: a levels value that fails the recursive
  *     additionalProperties→oneOf→$ref subschema (the reference's
  *     loggerLevelProp shape, sample-schema.json:27-39)
  */
object JsonDocs {

  /** The schema under test — exercises every keyword the compiler
    * implements beyond the r1 surface, including the recursive
    * `$ref` through oneOf under additionalProperties.
    */
  val schema: String =
    """{"type":"object","required":["id","email","count"],
      |"properties":{
      |"id":{"type":"string","pattern":"^d[0-9]+$"},
      |"email":{"type":"string","format":"email"},
      |"ts":{"type":"string","format":"date-time"},
      |"count":{"type":"integer","minimum":0,"maximum":500},
      |"score":{"type":"integer","exclusiveMinimum":0,"multipleOf":3},
      |"tags":{"type":"array","minItems":1,"uniqueItems":true,
      |"items":{"type":"string","minLength":1}},
      |"kind":{"oneOf":[{"const":"text"},{"const":"media"}]},
      |"levels":{"type":"object","additionalProperties":{"oneOf":[
      |{"type":"string","enum":["TRACE","DEBUG","INFO","WARN","ERROR"]},
      |{"$ref":"#/properties/levels"}]}}
      |}}""".stripMargin.replace("\n", "")

  /** (doc_id, json) — the JSON string assembled with Column concat (pure
    * codegen projection, no UDF).
    */
  def docsJson(documents: DataFrame): DataFrame = {
    val i = col("doc_id")
    def s(x: String): Column = lit(x)
    val istr = i.cast("string")
    val email = when(i % 59 === 0, s(""))
      .when(i % 23 === 0,
        concat(s(",\"email\":\"user"), istr, s("-at-example.com\"")))
      .otherwise(concat(s(",\"email\":\"user"), istr, s("@example.com\"")))
    val ts = when(i % 29 === 0, s(",\"ts\":\"June 1st\""))
      .otherwise(s(",\"ts\":\"2024-06-01T12:00:00Z\""))
    val tags = when(i % 31 === 0, s(",\"tags\":[\"a\",\"a\"]"))
      .when(i % 37 === 0, s(",\"tags\":[\"a\",5]"))
      .when(i % 41 === 0, s(",\"tags\":[]"))
      .otherwise(s(",\"tags\":[\"alpha\",\"beta\"]"))
    val kind = when(i % 53 === 0, s(",\"kind\":\"weird\""))
      .otherwise(s(",\"kind\":\"text\""))
    val levels = when(i % 43 === 0, s(",\"levels\":{\"app\":\"SHOUT\"}"))
      .when(i % 47 === 0, s(",\"levels\":{\"app\":{\"db\":\"WARN\"}}"))
      .when(i % 61 === 0, s(",\"levels\":{\"app\":{\"db\":\"shout\"}}"))
      .otherwise(s(",\"levels\":{\"app\":\"INFO\"}"))
    documents.select(
      i.as("doc_id"),
      concat(
        s("{\"id\":\"d"), istr, s("\""),
        email, ts,
        s(",\"count\":"), col("n_chars").cast("string"),
        s(",\"score\":"), (i % 10).cast("string"),
        tags, kind, levels,
        s("}")).as("json"))
  }
}
