package graft

/** DuckDB oracle SQL. The CTE prelude mirrors [[graft.data.Interleaved]]
  * exactly (same injection arithmetic), exploded to one row per span, so
  * every span-level engine query has a genuinely independent oracle.
  */
object Oracles {
  /** Mirrors Interleaved.docs (injected) and Interleaved.referenceSpans
    * (clean) as exploded span rows `(idnum, doc_id, part, i, kind, text,
    * media_ref, offset)` with 1-based span index i.
    */
  val spanCtes: String =
    """WITH words AS (
      |  SELECT doc_id AS idnum, 'd'||CAST(doc_id AS VARCHAR) AS doc_id,
      |         source AS part, string_split(text,' ')[1:8] AS w
      |  FROM documents
      |), sp AS (
      |  SELECT idnum, doc_id, part,
      |         unnest(w) AS word,
      |         unnest(generate_series(1, len(w))) AS i
      |  FROM words
      |), spans AS (
      |  SELECT idnum, doc_id, part, i,
      |    CASE WHEN idnum%97=10 AND i=2 THEN 'video'
      |         WHEN (idnum+i)%4=0 THEN 'image' ELSE 'text' END AS kind,
      |    CASE WHEN idnum%97=20 AND i=1 THEN 'XXX'
      |         WHEN (idnum+i)%4=0 THEN NULL ELSE word END AS text,
      |    CASE WHEN idnum%97=30 THEN NULL
      |         WHEN (idnum+i)%4=0 THEN 'm'||CAST((idnum*7+i)%50 AS VARCHAR)
      |         ELSE NULL END AS media_ref,
      |    CAST(CASE WHEN idnum%97=3 AND i=1 THEN 99 ELSE i-1 END AS INTEGER)
      |      AS offset
      |  FROM sp
      |), refspans AS (
      |  SELECT idnum, doc_id, part, i,
      |    CASE WHEN (idnum+i)%4=0 THEN 'image' ELSE 'text' END AS kind,
      |    CASE WHEN (idnum+i)%4=0 THEN NULL ELSE word END AS text,
      |    CASE WHEN (idnum+i)%4=0 THEN 'm'||CAST((idnum*7+i)%50 AS VARCHAR)
      |         ELSE NULL END AS media_ref,
      |    CAST(i-1 AS INTEGER) AS offset
      |  FROM sp
      |), mismatch AS (
      |  SELECT s.*,
      |    (s.kind IS DISTINCT FROM r.kind OR s.text IS DISTINCT FROM r.text
      |     OR s.media_ref IS DISTINCT FROM r.media_ref
      |     OR s.offset IS DISTINCT FROM r.offset) AS bad
      |  FROM spans s JOIN refspans r USING (idnum, i)
      |)""".stripMargin

  val spanVerdicts: String = spanCtes +
    """
      |SELECT doc_id, part,
      |  (SUM(CASE WHEN bad THEN 1 ELSE 0 END) = 0) AS valid,
      |  CAST(SUM(CASE WHEN bad THEN 1 ELSE 0 END) AS INTEGER) AS n_violations
      |FROM mismatch GROUP BY doc_id, part ORDER BY doc_id""".stripMargin

  val spanViolations: String = spanCtes +
    """
      |SELECT doc_id, '/spans/'||CAST(i-1 AS VARCHAR) AS pointer,
      |  'spanSequence' AS keyword,
      |  'span does not equal reference (kind, text, media_ref, order)'
      |    AS message,
      |  '#/properties/spans/spanSequence' AS schemaLocation
      |FROM mismatch WHERE bad ORDER BY doc_id, pointer""".stripMargin

  val ruleViolations: String = spanCtes +
    """
      |SELECT doc_id, pointer, keyword, message, schemaLocation FROM (
      |  SELECT doc_id, '/spans/'||CAST(i-1 AS VARCHAR)||'/kind' AS pointer,
      |    'enum' AS keyword,
      |    'does not have a value in the enumeration [text, image, audio]'
      |      AS message,
      |    '#/properties/spans/items/properties/kind/enum' AS schemaLocation
      |  FROM spans WHERE kind IS NOT NULL
      |    AND kind NOT IN ('text','image','audio')
      |  UNION ALL
      |  SELECT doc_id, '/spans/'||CAST(i-1 AS VARCHAR)||'/media_ref',
      |    'required', 'required property ''media_ref'' not found',
      |    '#/properties/spans/items/properties/media_ref/required'
      |  FROM spans WHERE kind = 'image' AND media_ref IS NULL
      |  UNION ALL
      |  SELECT doc_id, '/spans/'||CAST(i-1 AS VARCHAR)||'/media_ref',
      |    'pattern', 'does not match the regex pattern ^m[0-9]+$',
      |    '#/properties/spans/items/properties/media_ref/pattern'
      |  FROM spans WHERE media_ref IS NOT NULL
      |    AND NOT regexp_matches(media_ref, '^m[0-9]+$')
      |  UNION ALL
      |  SELECT doc_id, '/spans/'||CAST(i-1 AS VARCHAR)||'/offset',
      |    'minimum', 'must have a minimum value of 0',
      |    '#/properties/spans/items/properties/offset/minimum'
      |  FROM spans WHERE "offset" IS NOT NULL AND "offset" < 0
      |  UNION ALL
      |  SELECT doc_id, '/spans/'||CAST(i-1 AS VARCHAR)||'/offset',
      |    'maximum', 'must have a maximum value of 7',
      |    '#/properties/spans/items/properties/offset/maximum'
      |  FROM spans WHERE "offset" IS NOT NULL AND "offset" > 7
      |) ORDER BY doc_id, pointer, keyword""".stripMargin

  val uniqueness: String =
    """SELECT 'd'||CAST(doc_id AS VARCHAR) AS doc_id, CAST(2 AS BIGINT) AS cnt
      |FROM documents WHERE doc_id%101 = 5 ORDER BY doc_id""".stripMargin

  val referential: String = spanCtes +
    """
      |SELECT doc_id, media_ref, CAST(COUNT(*) AS BIGINT) AS cnt
      |FROM spans
      |WHERE media_ref IS NOT NULL AND media_ref NOT IN
      |  (SELECT 'm'||CAST(x AS VARCHAR) FROM generate_series(0,39) t(x))
      |GROUP BY doc_id, media_ref ORDER BY doc_id, media_ref""".stripMargin

  val partitionVerdicts: String = spanCtes +
    """
      |, v AS (
      |  SELECT doc_id, part, SUM(CASE WHEN bad THEN 1 ELSE 0 END) AS nv
      |  FROM mismatch GROUP BY doc_id, part
      |)
      |SELECT part, (SUM(CASE WHEN nv>0 THEN 1 ELSE 0 END) = 0) AS valid,
      |  CAST(COUNT(*) AS BIGINT) AS docs,
      |  CAST(SUM(CASE WHEN nv>0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS invalid_docs,
      |  CAST(SUM(nv) AS BIGINT) AS violations
      |FROM v GROUP BY part ORDER BY part""".stripMargin

  def statsCol(c: String): String =
    s"""SELECT '$c' AS col_name, CAST(COUNT(*) AS BIGINT) AS count,
       |  CAST(COUNT(*)-COUNT($c) AS BIGINT) AS nulls,
       |  ROUND((COUNT(*)-COUNT($c))/CAST(COUNT(*) AS DOUBLE), 4)
       |    AS null_rate,
       |  CAST(MIN($c) AS VARCHAR) AS min_value,
       |  CAST(MAX($c) AS VARCHAR) AS max_value,
       |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS distinct_count
       |FROM documents""".stripMargin

  val columnStats: String =
    Seq("doc_id", "lang", "source", "n_chars").map(statsCol)
      .mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY col_name")

  val q2FilterProject: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_quantity > 45 AND l_extendedprice > 40000
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  val q3JoinBroadcast: String =
    """SELECT c_mktsegment, ROUND(SUM(o_totalprice), 4) AS revenue,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  val q4JoinShuffle: String =
    """SELECT c_mktsegment, o_orderstatus,
      |  ROUND(SUM(l_extendedprice * (1-l_discount)), 4) AS revenue,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment, o_orderstatus
      |ORDER BY c_mktsegment, o_orderstatus""".stripMargin

  val q5SemiJoin: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_custkey IN
      |  (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
      |ORDER BY c_custkey""".stripMargin

  val q6AntiJoin: String =
    """SELECT c_custkey, c_mktsegment FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey
      |    AND o.o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  val q7Window: String =
    """SELECT o_custkey, o_orderkey, price, rn FROM (
      |  SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 4) AS price,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
      |  FROM orders)
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  val q8SortLimit: String =
    """SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 4) AS price
      |FROM lineitem
      |ORDER BY price DESC, l_orderkey, l_linenumber LIMIT 10""".stripMargin

  val q9Distinct: String =
    """SELECT l_returnflag,
      |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS parts,
      |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supps,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  val q10SetOps: String =
    """SELECT o_custkey, 'only_open' AS tag FROM (
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |  EXCEPT
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      |UNION ALL
      |SELECT o_custkey, 'both' AS tag FROM (
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |  INTERSECT
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      |ORDER BY tag, o_custkey""".stripMargin

  val q11Rollup: String =
    """SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n,
      |  ROUND(SUM(l_quantity), 4) AS qty
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""
      .stripMargin

  val q12HofSpans: String = spanCtes +
    """
      |SELECT doc_id,
      |  bool_or(kind = 'image' AND coalesce(media_ref,'') LIKE '%7')
      |    AS has_ref7,
      |  CAST(SUM(CASE WHEN kind = 'image' THEN 1 ELSE 0 END) AS INTEGER)
      |    AS n_images,
      |  CAST(SUM(CASE WHEN text IS NOT NULL THEN length(text) ELSE 0 END)
      |    AS INTEGER) AS text_chars
      |FROM spans GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val q13EventsHourly: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
      |  event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |  ROUND(SUM(value), 4) AS total
      |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  val q1Agg: String =
    """SELECT l_returnflag, l_linestatus,
      |  ROUND(SUM(l_quantity), 4) AS sum_qty,
      |  ROUND(SUM(l_extendedprice * (1-l_discount)), 4) AS revenue,
      |  ROUND(AVG(l_quantity), 4) AS avg_qty,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
