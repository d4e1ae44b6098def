package graft.rules

/** 2020-12 `format` assertions as anchored regexes — shared between the
  * VARIANT schema compiler and the span-rule surface. The reference
  * enables format assertions globally
  * (`formatAssertionsEnabled(true)`, YamlSchemaValidator.java:193);
  * these cover the formats its schemas exercise (email, uri, uuid,
  * date-time, date, time, hostname, ipv4). Unknown formats are
  * annotations (no assertion), per the 2020-12 spec. Patterns are
  * RE2-compatible (no backrefs/lookaround) so a DuckDB oracle can run
  * the identical regex.
  */
object Formats {
  val regexes: Map[String, String] = Map(
    "email" ->
      ("^[A-Za-z0-9.!#$%&'*+/=?^_`{|}~-]+@" +
        "[A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?" +
        "(\\.[A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?)*$"),
    "uri" -> "^[A-Za-z][A-Za-z0-9+.-]*:[^ \\t]*$",
    "uuid" ->
      ("^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-" +
        "[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"),
    "date-time" ->
      ("^[0-9]{4}-[0-9]{2}-[0-9]{2}[Tt][0-9]{2}:[0-9]{2}:[0-9]{2}" +
        "(\\.[0-9]+)?([Zz]|[+-][0-9]{2}:[0-9]{2})$"),
    "date" -> "^[0-9]{4}-[0-9]{2}-[0-9]{2}$",
    "time" ->
      "^[0-9]{2}:[0-9]{2}:[0-9]{2}(\\.[0-9]+)?([Zz]|[+-][0-9]{2}:[0-9]{2})$",
    "hostname" ->
      ("^[A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?" +
        "(\\.[A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?)*$"),
    "ipv4" ->
      ("^((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\\.){3}" +
        "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])$"))
}
