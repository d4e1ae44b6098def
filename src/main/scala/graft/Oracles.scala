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

  /** Mirrors Dedup.corpus: documents ∪ exact dups ∪ near-identical dups ∪
    * two word-substituted families at J≈0.63 / J≈0.71.
    */
  private def substitutedCte(mod: Int, every: Int, offset: Long): String =
    s"""  SELECT doc_id + $offset, array_to_string(list_transform(
       |    generate_series(1, len(w)),
       |    i -> CASE WHEN i%$every=5 THEN w[i]||'Q' ELSE w[i] END), ' ')
       |  FROM (SELECT doc_id, string_split(text,' ') AS w FROM documents
       |        WHERE doc_id%50 = $mod)""".stripMargin

  val corpusCte: String =
    s"""WITH corpus(doc_id, text) AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id%50 = 0
       |  UNION ALL
       |  SELECT doc_id + 2000000, text || ' zzz zzz' FROM documents
       |  WHERE doc_id%50 = 25
       |  UNION ALL
       |${substitutedCte(10, 14, 3000000L)}
       |  UNION ALL
       |${substitutedCte(35, 18, 4000000L)}
       |)""".stripMargin

  val dedupExact: String = corpusCte +
    """
      |SELECT md5(text) AS fingerprint, CAST(COUNT(*) AS BIGINT) AS cnt,
      |  MIN(doc_id) AS keep_id
      |FROM corpus GROUP BY 1 HAVING COUNT(*) > 1
      |ORDER BY fingerprint""".stripMargin

  /** Exact-Jaccard pair CTEs over `corpus` — yields `jp(id_a, id_b,
    * jaccard)` at the 0.6 threshold; shared by [[jaccardPairs]],
    * [[minhashPairs]] and the [[dupClusters]] component closure.
    */
  private val jaccardCtes: String =
    """, sh AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    generate_series(1, len(w)-2),
      |    i -> w[i]||' '||w[i+1]||' '||w[i+2]))) AS sh
      |  FROM (SELECT doc_id, string_split(text,' ') AS w FROM corpus)
      |), sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
      |shared AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
      |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |jp AS (
      |  SELECT id_a, id_b,
      |    ROUND(shared/CAST(sa.sz+sb.sz-shared AS DOUBLE), 4) AS jaccard
      |  FROM shared
      |  JOIN sizes sa ON sa.doc_id = id_a
      |  JOIN sizes sb ON sb.doc_id = id_b
      |  WHERE shared/CAST(sa.sz+sb.sz-shared AS DOUBLE) >= 0.59995)""".stripMargin

  val jaccardPairs: String = corpusCte + "\n" + jaccardCtes +
    """
      |SELECT id_a, id_b, jaccard FROM jp ORDER BY id_a, id_b""".stripMargin

  /** MinHash+LSH oracle: with b=32/r=3 banding the candidate recall at the
    * J≥0.6 threshold is ≈0.9996 per pair, and on the deterministic fixture
    * corpus every above-threshold pair is caught (verified empirically at
    * sf0.01/sf0.1) — so after the exact-Jaccard verify step the LSH output
    * EQUALS the exact all-pairs result. Oracle = the exact Jaccard SQL.
    */
  val minhashPairs: String = jaccardPairs

  /** Mirrors Clusters.dupClusters: transitive closure of the near-dup
    * pair edges (== the MinHash pairs; see [[minhashPairs]] for why the
    * exact-Jaccard pairs are the same set) as a recursive reachability
    * CTE — r enumerates every node reachable from id, MIN(r) is the
    * component label — then the keep rule (min doc_id per component).
    */
  val dupClusters: String =
    corpusCte.replaceFirst("WITH ", "WITH RECURSIVE ") + "\n" +
      jaccardCtes +
    """
      |, sym AS (
      |  SELECT id_a AS src, id_b AS dst FROM jp
      |  UNION ALL
      |  SELECT id_b, id_a FROM jp),
      |reach(id, r) AS (
      |  SELECT DISTINCT src, src FROM sym
      |  UNION
      |  SELECT s.dst, reach.r FROM reach JOIN sym s ON s.src = reach.id),
      |comp AS (
      |  SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id)
      |SELECT cluster_id, doc_id, (doc_id = cluster_id) AS keep
      |FROM comp ORDER BY cluster_id, doc_id""".stripMargin

  /** Mirrors Dedup.incrDedup FROM THE FULL RECOMPUTE: the incremental
    * path (batch band keys vs the persisted corpus index, verify on
    * matched candidates only) must equal the exact corpus-wide Jaccard
    * pairs restricted to (existing doc, increment doc) — id_a below 1e6
    * is the documents table, id_b ≥ 1e6 the re-keyed increment families,
    * and jp already orders id_a < id_b so the cross filter is exact.
    */
  val incrDedup: String = corpusCte + "\n" + jaccardCtes +
    """
      |SELECT id_a, id_b, jaccard FROM jp
      |WHERE id_a < 1000000 AND id_b >= 1000000
      |ORDER BY id_a, id_b""".stripMargin

  /** [[corpusCte]] extended with the append-loop fixture's +5e6 family
    * (near-dups of batch A's +2e6 docs — see `Dedup.loopBatchB`).
    */
  private val corpusLoopCte: String = corpusCte.stripSuffix(")") +
    """  UNION ALL
      |  SELECT doc_id + 5000000, text || ' zzz zzz www' FROM documents
      |  WHERE doc_id%50 = 25
      |)""".stripMargin

  /** Mirrors Dedup.incrDedup2 from the full recompute: batch 1 must
    * equal the exact cross pairs (documents, A) and batch 2 the exact
    * cross pairs (documents ∪ A, B) — in particular the (A's +2e6,
    * B's +5e6) pairs that only exist if the appended batch-A keys are
    * live in the index. jp orders id_a < id_b and the id ranges are
    * disjoint and increasing, so the range filters select exactly the
    * cross sets.
    */
  val incrDedup2: String = corpusLoopCte + "\n" + jaccardCtes +
    """
      |SELECT 1 AS batch, id_a, id_b, jaccard FROM jp
      |WHERE id_a < 1000000 AND id_b >= 1000000 AND id_b < 3000000
      |UNION ALL
      |SELECT 2 AS batch, id_a, id_b, jaccard FROM jp
      |WHERE id_a < 3000000 AND id_b >= 3000000
      |ORDER BY batch, id_a, id_b""".stripMargin

  /** Mirrors Clusters.keepQuality: the same recursive component closure
    * as [[dupClusters]], joined with the quality composite over the
    * corpus, keep = the best-quality member per cluster (row_number
    * with the deterministic quality-desc, doc_id-asc order — arg_max
    * alone would leave ties engine-defined).
    */
  val keepQuality: String =
    corpusCte.replaceFirst("WITH ", "WITH RECURSIVE ") + "\n" +
      jaccardCtes +
    """
      |, sym AS (
      |  SELECT id_a AS src, id_b AS dst FROM jp
      |  UNION ALL
      |  SELECT id_b, id_a FROM jp),
      |reach(id, r) AS (
      |  SELECT DISTINCT src, src FROM sym
      |  UNION
      |  SELECT s.dst, reach.r FROM reach JOIN sym s ON s.src = reach.id),
      |comp AS (
      |  SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id),
      |q AS (
      |  SELECT doc_id,
      |    ROUND(CAST(CASE WHEN n_tokens >= 10 THEN 0.4 ELSE 0.0 END +
      |          CASE WHEN punct_ratio <= 0.1 THEN 0.3 ELSE 0.0 END +
      |          CASE WHEN stop_ratio >= 0.05 THEN 0.3 ELSE 0.0 END
      |          AS DOUBLE), 4) AS quality_score
      |  FROM (
      |    SELECT doc_id, len(w) AS n_tokens,
      |      (length(text) - length(regexp_replace(text, '[^a-z ]', '',
      |        'g'))) / CAST(length(text) AS DOUBLE) AS punct_ratio,
      |      len(list_filter(w, t -> t IN ('der','die','und','das','the',
      |        'a','and','of','el','la','los','de','le','les','et')))
      |        / CAST(len(w) AS DOUBLE) AS stop_ratio
      |    FROM (SELECT doc_id, text, string_split(text,' ') AS w
      |          FROM corpus)))
      |SELECT cluster_id, doc_id, quality_score,
      |  (ROW_NUMBER() OVER (PARTITION BY cluster_id
      |     ORDER BY quality_score DESC, doc_id) = 1) AS keep
      |FROM comp JOIN q USING (doc_id)
      |ORDER BY cluster_id, doc_id""".stripMargin

  /** Mirrors Dedup.decontam: per-doc fraction of distinct 3-gram
    * shingles shared with the benchmark docs (doc_id ≡ 11 mod 101),
    * flagged at 0.5.
    */
  val decontam: String = corpusCte +
    """
      |, csh AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    generate_series(1, len(w)-2),
      |    i -> w[i]||' '||w[i+1]||' '||w[i+2]))) AS sh
      |  FROM (SELECT doc_id, string_split(text,' ') AS w FROM corpus)),
      |bench AS (
      |  SELECT DISTINCT unnest(list_distinct(list_transform(
      |    generate_series(1, len(w)-2),
      |    i -> w[i]||' '||w[i+1]||' '||w[i+2]))) AS sh
      |  FROM (SELECT string_split(text,' ') AS w FROM documents
      |        WHERE doc_id%101 = 11))
      |SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_shingles,
      |  CAST(COUNT(b.sh) AS INTEGER) AS n_hit,
      |  ROUND(COUNT(b.sh)/CAST(COUNT(*) AS DOUBLE), 4) AS contamination
      |FROM csh c LEFT JOIN bench b ON c.sh = b.sh
      |GROUP BY doc_id
      |HAVING COUNT(b.sh)/CAST(COUNT(*) AS DOUBLE) >= 0.49995
      |ORDER BY doc_id""".stripMargin

  /** SimHash oracle: brute-force all-pairs Hamming ≤ 6 over the identical
    * 60-bit md5-derived simhash (the engine's 7-block LSH is lossless for
    * d ≤ 6 by pigeonhole, so blocked output == brute force).
    */
  val simhashPairs: String = corpusCte +
    """
      |, tok AS (
      |  SELECT doc_id, unnest(list_distinct(string_split(text,' '))) AS t
      |  FROM corpus),
      |th AS (
      |  SELECT doc_id, CAST(('0x'||substr(md5(t),1,15)) AS UBIGINT) AS h
      |  FROM tok),
      |votes AS (
      |  SELECT doc_id, b,
      |    SUM(CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END) AS vote
      |  FROM th, generate_series(0, 59) g(b) GROUP BY doc_id, b),
      |sh AS (
      |  SELECT doc_id,
      |    CAST(SUM(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << b)
      |             ELSE 0 END) AS BIGINT) AS sh
      |  FROM votes GROUP BY doc_id)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
      |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.sh, b.sh)) <= 6
      |ORDER BY id_a, id_b""".stripMargin

  val langId: String =
    """SELECT doc_id, s_de, s_en, s_es, s_fr,
      |  CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
      |       WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
      |       WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
      |       WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS lang_pred
      |FROM (
      |  SELECT doc_id,
      |    CAST(len(list_filter(w, t -> t IN ('der','die','und','das')))
      |      AS INTEGER) AS s_de,
      |    CAST(len(list_filter(w, t -> t IN ('the','a','and','of')))
      |      AS INTEGER) AS s_en,
      |    CAST(len(list_filter(w, t -> t IN ('el','la','los','de')))
      |      AS INTEGER) AS s_es,
      |    CAST(len(list_filter(w, t -> t IN ('le','la','les','et')))
      |      AS INTEGER) AS s_fr
      |  FROM (SELECT doc_id, string_split(text,' ') AS w FROM documents))
      |ORDER BY doc_id""".stripMargin

  val quality: String =
    """SELECT doc_id,
      |  CAST(n_tokens AS INTEGER) AS n_tokens,
      |  CAST(n_chars_actual AS INTEGER) AS n_chars_actual,
      |  ROUND(punct_ratio, 4) AS punct_ratio,
      |  ROUND(stop_ratio, 4) AS stopword_ratio,
      |  ROUND(mean_token_len, 4) AS mean_token_len,
      |  ROUND(CAST(CASE WHEN n_tokens >= 10 THEN 0.4 ELSE 0.0 END +
      |        CASE WHEN punct_ratio <= 0.1 THEN 0.3 ELSE 0.0 END +
      |        CASE WHEN stop_ratio >= 0.05 THEN 0.3 ELSE 0.0 END
      |        AS DOUBLE), 4) AS quality_score
      |FROM (
      |  SELECT doc_id, len(w) AS n_tokens, length(text) AS n_chars_actual,
      |    (length(text) - length(regexp_replace(text, '[^a-z ]', '', 'g')))
      |      / CAST(length(text) AS DOUBLE) AS punct_ratio,
      |    len(list_filter(w, t -> t IN ('der','die','und','das','the','a',
      |      'and','of','el','la','los','de','le','les','et')))
      |      / CAST(len(w) AS DOUBLE) AS stop_ratio,
      |    (length(text) - (len(w)-1)) / CAST(len(w) AS DOUBLE)
      |      AS mean_token_len
      |  FROM (SELECT doc_id, text, string_split(text,' ') AS w
      |        FROM documents))
      |ORDER BY doc_id""".stripMargin

  val tokenCounts: String =
    s"""SELECT doc_id,
       |  CAST(len(string_split(text,' ')) AS INTEGER) AS ws_tokens,
       |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS INTEGER)
       |    AS regex_tokens,
       |  CAST(len(regexp_extract_all(text,
       |    '${graft.operators.TextOps.SubwordPattern}')) AS INTEGER)
       |    AS subword_tokens,
       |  CAST(ceil(length(text)/4.0) AS BIGINT) AS bpe_est
       |FROM documents ORDER BY doc_id""".stripMargin

  val fingerprints: String =
    """SELECT doc_id,
      |  md5(lower(trim(regexp_replace(text, ' +', ' ', 'g'))))
      |    AS fingerprint,
      |  substr(md5(lower(trim(regexp_replace(text, ' +', ' ', 'g')))), 1, 4)
      |    AS bucket
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Mirrors TextOps.pipelineKeep over the SAME duplicated corpus: the
    * langId argmax CASE, the quality composite (decimal sums here vs
    * double sums in Spark — the composite only takes values in
    * {0, .3, .4, .6, .7, 1.0}, where the two arithmetics order
    * identically against the 0.7 threshold; ROUND(·,4) normalizes the
    * output), the 'en' + quality filter, then min-id dedup on the
    * normalized-content md5.
    */
  /** The keep-sweep CTEs over `corpus` — yields `kept(keep_id, copies,
    * quality_score)`; shared by [[pipelineKeep]] and [[keepSweep]].
    */
  private val keepCtes: String =
    """, sig AS (
      |  SELECT doc_id, text,
      |    CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
      |         WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr
      |           THEN 'de'
      |         WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
      |         WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS lang_pred,
      |    ROUND(CAST(CASE WHEN n_tokens >= 10 THEN 0.4 ELSE 0.0 END +
      |          CASE WHEN punct_ratio <= 0.1 THEN 0.3 ELSE 0.0 END +
      |          CASE WHEN stop_ratio >= 0.05 THEN 0.3 ELSE 0.0 END
      |          AS DOUBLE), 4) AS quality_score
      |  FROM (
      |    SELECT doc_id, text,
      |      len(list_filter(w, t -> t IN ('der','die','und','das')))
      |        AS s_de,
      |      len(list_filter(w, t -> t IN ('the','a','and','of'))) AS s_en,
      |      len(list_filter(w, t -> t IN ('el','la','los','de'))) AS s_es,
      |      len(list_filter(w, t -> t IN ('le','la','les','et'))) AS s_fr,
      |      len(w) AS n_tokens,
      |      (length(text) - length(regexp_replace(text, '[^a-z ]', '',
      |        'g'))) / CAST(length(text) AS DOUBLE) AS punct_ratio,
      |      len(list_filter(w, t -> t IN ('der','die','und','das','the',
      |        'a','and','of','el','la','los','de','le','les','et')))
      |        / CAST(len(w) AS DOUBLE) AS stop_ratio
      |    FROM (SELECT doc_id, text, string_split(text,' ') AS w
      |          FROM corpus))),
      |kept AS (
      |  SELECT MIN(doc_id) AS keep_id, CAST(COUNT(*) AS BIGINT) AS copies,
      |    MIN(quality_score) AS quality_score
      |  FROM sig
      |  WHERE lang_pred = 'en' AND quality_score >= 0.7
      |  GROUP BY md5(lower(trim(regexp_replace(text, ' +', ' ', 'g')))))""".stripMargin

  val pipelineKeep: String = corpusCte + "\n" + keepCtes +
    """
      |SELECT keep_id, copies, quality_score FROM kept
      |ORDER BY keep_id""".stripMargin

  private val cosineExpr =
    """ROUND(list_dot_product(qe::DOUBLE[], embedding::DOUBLE[]) /
      |      (sqrt(list_dot_product(qe::DOUBLE[], qe::DOUBLE[])) *
      |       sqrt(list_dot_product(embedding::DOUBLE[],
      |            embedding::DOUBLE[]))), 4)""".stripMargin

  val knnBrute: String =
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
       |  WHERE vec_id%50 = 0),
       |scored AS (
       |  SELECT qid, e.vec_id, $cosineExpr AS sim
       |  FROM embeddings e, q WHERE e.vec_id <> qid),
       |ranked AS (SELECT qid, vec_id, sim,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY qid
       |    ORDER BY sim DESC, vec_id) AS INTEGER) AS rank FROM scored)
       |SELECT qid, vec_id, sim, rank FROM ranked WHERE rank <= 3
       |ORDER BY qid, rank""".stripMargin

  /** Mirrors Similarity.knnLsh: same deterministic dense Rademacher (±1)
    * hyperplanes (the coefficient table is generated from
    * Similarity.planeCoefs), same integer-quantized projections
    * (floor(x·4096) — exact in both engines, so the sign of the unordered
    * DuckDB SUM always equals Spark's ordered fold), same multi-probe
    * bucket set, same exact-cosine re-rank.
    */
  val knnLsh: String = {
    import graft.operators.Similarity.{planeCoefs, NumTables, SigBits, Dim}
    val coefValues = (for {
      t <- 0 until NumTables; j <- 0 until SigBits
      (c, d0) <- planeCoefs(t, j).zipWithIndex
    } yield s"($t,$j,${d0 + 1},$c)").mkString(",")
    val probeValues = (0 +: (0 until SigBits).map(1 << _))
      .map(m => s"($m)").mkString(", ")
    s"""WITH coefs(t, j, d, c) AS (VALUES $coefValues),
       |probes(m) AS (VALUES $probeValues),
       |sigbits AS (
       |  SELECT vec_id, t, j,
       |    CASE WHEN SUM(FLOOR(CAST(embedding[d] AS DOUBLE) * 4096) * c) >= 0
       |      THEN (1 << j) ELSE 0 END AS bit
       |  FROM embeddings, coefs GROUP BY vec_id, t, j),
       |sig AS (
       |  SELECT vec_id, t, CAST(SUM(bit) AS INTEGER) AS sig
       |  FROM sigbits GROUP BY vec_id, t),
       |q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
       |      WHERE vec_id%50 = 0),
       |qprobe AS (
       |  SELECT q.qid, s.t, CAST(xor(s.sig, p.m) AS INTEGER) AS sig
       |  FROM q JOIN sig s ON s.vec_id = q.qid, probes p),
       |cand AS (
       |  SELECT DISTINCT qp.qid, s.vec_id
       |  FROM qprobe qp JOIN sig s ON s.t = qp.t AND s.sig = qp.sig
       |  WHERE s.vec_id <> qp.qid),
       |scored AS (
       |  SELECT c.qid, c.vec_id, $cosineExpr AS sim
       |  FROM cand c
       |  JOIN q ON q.qid = c.qid
       |  JOIN embeddings e ON e.vec_id = c.vec_id),
       |ranked AS (SELECT qid, vec_id, sim,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY qid
       |    ORDER BY sim DESC, vec_id) AS INTEGER) AS rank FROM scored)
       |SELECT qid, vec_id, sim, rank FROM ranked WHERE rank <= 3
       |ORDER BY qid, rank""".stripMargin
  }

  /** Mirrors Similarity.knnIvf: same deterministic sampled codebook
    * (vec_id ≡ 7 mod 31, first IvfCells by vec_id — regenerated from the
    * same embeddings table), then the SAME one-step Lloyd refinement
    * (nearest-cell assignment by integer-quantized cosine, per-(cell,
    * dim) mean as floor(exact-integer-sum / n) — every arithmetic step
    * identical in both engines, so the refined codebooks are equal
    * value-for-value), same 2-way assignment, same nprobe cells per
    * query, same exact-cosine re-rank.
    */
  /** The Lloyd-refined codebook as a reusable CTE chain (ending in
    * `cent(cell, cq)`) — shared verbatim by [[knnIvf]] and [[semDedup]]
    * so both mirror the ONE codebook `ivfCentroidsRefined` builds.
    */
  private def refinedCentCtes: String = {
    import graft.operators.Similarity.{IvfCells, IvfCentroidMod}
    s"""cent0 AS (
       |  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell,
       |    list_transform(embedding::DOUBLE[],
       |      x -> CAST(FLOOR(x*4096) AS BIGINT)) AS cq
       |  FROM embeddings WHERE vec_id % $IvfCentroidMod = 7
       |  ORDER BY vec_id LIMIT $IvfCells),
       |vecq AS (
       |  SELECT vec_id,
       |    list_transform(embedding::DOUBLE[], x -> FLOOR(x*4096)) AS vq
       |  FROM embeddings),
       |scores0 AS (
       |  SELECT v.vec_id, c.cell,
       |    list_dot_product(v.vq, list_transform(c.cq,
       |      x -> CAST(x AS DOUBLE))) /
       |      (sqrt(list_dot_product(v.vq, v.vq)) *
       |       sqrt(list_dot_product(list_transform(c.cq,
       |         x -> CAST(x AS DOUBLE)), list_transform(c.cq,
       |         x -> CAST(x AS DOUBLE))))) AS score
       |  FROM vecq v, cent0 c),
       |assign1 AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY score DESC, cell) AS rn FROM scores0)
       |  WHERE rn = 1),
       |elem AS (
       |  SELECT a.cell, unnest(v.vq) AS qv,
       |    unnest(generate_series(1, len(v.vq))) AS pos
       |  FROM assign1 a JOIN vecq v USING (vec_id)),
       |rmean AS (
       |  SELECT cell, pos,
       |    CAST(FLOOR(CAST(SUM(CAST(qv AS BIGINT)) AS DOUBLE) / COUNT(*))
       |      AS BIGINT) AS cq1
       |  FROM elem GROUP BY cell, pos),
       |rlist AS (
       |  SELECT cell, list(cq1 ORDER BY pos) AS cq FROM rmean
       |  GROUP BY cell),
       |cent AS (
       |  SELECT c0.cell, COALESCE(r.cq, c0.cq) AS cq
       |  FROM cent0 c0 LEFT JOIN rlist r USING (cell))""".stripMargin
  }

  val knnIvf: String = {
    import graft.operators.Similarity.{IvfCells, IvfProbe, IvfAssign,
      IvfCentroidMod}
    s"""WITH $refinedCentCtes,
       |scores AS (
       |  SELECT v.vec_id, c.cell,
       |    list_dot_product(v.vq, list_transform(c.cq,
       |      x -> CAST(x AS DOUBLE))) /
       |      (sqrt(list_dot_product(v.vq, v.vq)) *
       |       sqrt(list_dot_product(list_transform(c.cq,
       |         x -> CAST(x AS DOUBLE)), list_transform(c.cq,
       |         x -> CAST(x AS DOUBLE))))) AS score
       |  FROM vecq v, cent c),
       |assign AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY score DESC, cell) AS rn FROM scores)
       |  WHERE rn <= $IvfAssign),
       |qprobe AS (
       |  SELECT vec_id AS qid, cell FROM (
       |    SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY score DESC, cell) AS rn
       |    FROM scores WHERE vec_id%50 = 0) WHERE rn <= $IvfProbe),
       |q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
       |      WHERE vec_id%50 = 0),
       |cand AS (
       |  SELECT DISTINCT qp.qid, a.vec_id
       |  FROM qprobe qp JOIN assign a ON a.cell = qp.cell
       |  WHERE a.vec_id <> qp.qid),
       |scored AS (
       |  SELECT c.qid, c.vec_id, $cosineExpr AS sim
       |  FROM cand c JOIN q ON q.qid = c.qid
       |  JOIN embeddings e ON e.vec_id = c.vec_id),
       |ranked AS (SELECT qid, vec_id, sim,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY qid
       |    ORDER BY sim DESC, vec_id) AS INTEGER) AS rank FROM scored)
       |SELECT qid, vec_id, sim, rank FROM ranked WHERE rank <= 3
       |ORDER BY qid, rank""".stripMargin
  }

  /** Mirrors Similarity.semDedup: the same Lloyd-refined codebook CTE
    * chain as [[knnIvf]], the same perturbed dup corpus as
    * [[cosineDups]], each dup vector 2-way assigned to its nearest
    * cells by the same integer-quantized cosine (exact in both
    * engines), pairs sharing any cell, exact double cosine ≥ threshold
    * — within-shared-cell is the operator's definition (SemDeDup with
    * the ANN index's multi-assignment), so this is an equality gate,
    * not a recall statement.
    */
  val semDedup: String =
    s"""WITH $refinedCentCtes,
       |base AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |pert AS (
       |  SELECT vec_id + 100000 AS vec_id,
       |    list_transform(generate_series(1, len(e)),
       |      i -> CASE WHEN i <= 8 THEN e[i]*0.5 ELSE e[i] END) AS e
       |  FROM base WHERE vec_id%40 = 0),
       |pert2 AS (
       |  SELECT vec_id + 200000 AS vec_id,
       |    list_transform(generate_series(1, len(e)),
       |      i -> CASE WHEN i <= 16 THEN e[i]*0.25 ELSE e[i] END) AS e
       |  FROM base WHERE vec_id%40 = 20),
       |corpus AS (SELECT * FROM base UNION ALL SELECT * FROM pert
       |           UNION ALL SELECT * FROM pert2),
       |dq AS (
       |  SELECT vec_id, e,
       |    list_transform(e, x -> FLOOR(x*4096)) AS vq
       |  FROM corpus),
       |dscores AS (
       |  SELECT d.vec_id, c.cell,
       |    list_dot_product(d.vq, list_transform(c.cq,
       |      x -> CAST(x AS DOUBLE))) /
       |      (sqrt(list_dot_product(d.vq, d.vq)) *
       |       sqrt(list_dot_product(list_transform(c.cq,
       |         x -> CAST(x AS DOUBLE)), list_transform(c.cq,
       |         x -> CAST(x AS DOUBLE))))) AS score
       |  FROM dq d, cent c),
       |dassign AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY score DESC, cell) AS rn FROM dscores)
       |  WHERE rn <= ${graft.operators.Similarity.IvfAssign}),
       |pairs AS (
       |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM dassign a JOIN dassign b
       |    ON a.cell = b.cell AND a.vec_id < b.vec_id)
       |SELECT p.id_a, p.id_b,
       |  ROUND(list_dot_product(x.e, y.e) /
       |    (sqrt(list_dot_product(x.e, x.e)) *
       |     sqrt(list_dot_product(y.e, y.e))), 4) AS sim
       |FROM pairs p
       |JOIN corpus x ON x.vec_id = p.id_a
       |JOIN corpus y ON y.vec_id = p.id_b
       |WHERE ROUND(list_dot_product(x.e, y.e) /
       |    (sqrt(list_dot_product(x.e, x.e)) *
       |     sqrt(list_dot_product(y.e, y.e))), 4) >= 0.9
       |ORDER BY id_a, id_b""".stripMargin

  /** Mirrors Similarity.cosineDups: same perturbed corpus (×0.5 on the
    * first 8 dims, ×0.25 on the first 16 for the mid-band class — both
    * factors exact in binary), same double-precision cosine, rounded to
    * 4 before the threshold.
    */
  val cosineDups: String =
    """WITH base AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      |pert AS (
      |  SELECT vec_id + 100000 AS vec_id,
      |    list_transform(generate_series(1, len(e)),
      |      i -> CASE WHEN i <= 8 THEN e[i]*0.5 ELSE e[i] END) AS e
      |  FROM base WHERE vec_id%40 = 0),
      |pert2 AS (
      |  SELECT vec_id + 200000 AS vec_id,
      |    list_transform(generate_series(1, len(e)),
      |      i -> CASE WHEN i <= 16 THEN e[i]*0.25 ELSE e[i] END) AS e
      |  FROM base WHERE vec_id%40 = 20),
      |corpus AS (SELECT * FROM base UNION ALL SELECT * FROM pert
      |           UNION ALL SELECT * FROM pert2),
      |pairs AS (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |    ROUND(list_dot_product(a.e, b.e) /
      |      (sqrt(list_dot_product(a.e, a.e)) *
      |       sqrt(list_dot_product(b.e, b.e))), 4) AS sim
      |  FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id)
      |SELECT id_a, id_b, sim FROM pairs WHERE sim >= 0.9
      |ORDER BY id_a, id_b""".stripMargin

  /** Mirrors Similarity.incrCosineDups: the full-recompute ground truth
    * for the incremental embedding path — exact cosine over the SAME
    * perturbed corpus as [[cosineDups]], restricted to (existing corpus,
    * increment) cross pairs. The incremental operator must equal the
    * full recompute on exactly this set (batch-internal pairs are the
    * batch operator's job, excluded on both sides).
    */
  val cosineIncr: String =
    """WITH base AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      |pert AS (
      |  SELECT vec_id + 100000 AS vec_id,
      |    list_transform(generate_series(1, len(e)),
      |      i -> CASE WHEN i <= 8 THEN e[i]*0.5 ELSE e[i] END) AS e
      |  FROM base WHERE vec_id%40 = 0),
      |pert2 AS (
      |  SELECT vec_id + 200000 AS vec_id,
      |    list_transform(generate_series(1, len(e)),
      |      i -> CASE WHEN i <= 16 THEN e[i]*0.25 ELSE e[i] END) AS e
      |  FROM base WHERE vec_id%40 = 20),
      |batch AS (SELECT * FROM pert UNION ALL SELECT * FROM pert2),
      |pairs AS (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |    ROUND(list_dot_product(a.e, b.e) /
      |      (sqrt(list_dot_product(a.e, a.e)) *
      |       sqrt(list_dot_product(b.e, b.e))), 4) AS sim
      |  FROM base a JOIN batch b ON true)
      |SELECT id_a, id_b, sim FROM pairs WHERE sim >= 0.9
      |ORDER BY id_a, id_b""".stripMargin

  val mediaFeatures: String =
    """SELECT 'm'||CAST(x AS VARCHAR) AS media_ref,
      |  CAST(16 AS INTEGER) AS n_bytes,
      |  md5('m'||CAST(x AS VARCHAR)) AS payload_hex,
      |  CAST(32 + (x%8)*16 AS INTEGER) AS width,
      |  CAST(32 + (x%5)*16 AS INTEGER) AS height
      |FROM generate_series(0,49) t(x) ORDER BY media_ref""".stripMargin

  /** Chunk CTEs over `src(doc_id, text)` — same 4-word window hash
    * (first 8 hex chars of md5 as an integer), same mod-16 boundary
    * mask, same implicit boundary at 1, same per-chunk md5 as
    * TextOps.contentChunksOf. Yields `chunkrows(doc_id, chunk_idx,
    * n_words, chunk_hash)`.
    */
  private def chunksCte(src: String): String =
    s"""cd AS (
       |  SELECT doc_id, string_split(text,' ') AS w FROM $src),
       |bounds AS (
       |  SELECT doc_id, w, list_prepend(1, CASE WHEN len(w) >= 5 THEN
       |    list_filter(generate_series(2, len(w) - 3),
       |      i -> CAST(('0x'||substr(md5(
       |        array_to_string(list_slice(w, i, i + 3), ' ')), 1, 8))
       |        AS BIGINT) % 16 = 0)
       |    ELSE [] END) AS bs
       |  FROM cd),
       |spans_c AS (
       |  SELECT doc_id, w, bs, CAST(u.j AS INTEGER) AS chunk_idx,
       |    bs[u.j] AS st,
       |    CASE WHEN u.j < len(bs) THEN bs[u.j + 1] - 1
       |         ELSE len(w) END AS en
       |  FROM bounds, LATERAL unnest(generate_series(1, len(bs))) u(j)),
       |chunkrows AS (
       |  SELECT doc_id, chunk_idx, CAST(en - st + 1 AS INTEGER)
       |    AS n_words,
       |    md5(array_to_string(list_slice(w, st, en), ' ')) AS chunk_hash
       |  FROM spans_c)""".stripMargin

  /** Mirrors TextOps.contentChunks over the documents table. */
  val contentChunks: String =
    "WITH " + chunksCte("documents") + """
      |SELECT doc_id, chunk_idx, n_words, chunk_hash
      |FROM chunkrows ORDER BY doc_id, chunk_idx""".stripMargin

  /** Mirrors TextOps.chunkDups: chunk-SET overlap over the duplicated
    * corpus, ratio against the smaller side, with the same hot-chunk
    * document-frequency cap (df > 64 chunks are boilerplate and carry
    * no pair signal; sizes stay uncapped) before the pair join.
    */
  /** Chunk-overlap pair CTEs over `corpus` — yields `cp(id_a, id_b,
    * shared, overlap)` with the df-64 hot-chunk cap; shared by
    * [[chunkDups]] and the [[keepSweep]] closure.
    */
  private val chunkPairCtes: String = chunksCte("corpus") +
    """
      |, ch AS (SELECT DISTINCT doc_id, chunk_hash FROM chunkrows),
      |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM ch GROUP BY 1),
      |chcold AS (
      |  SELECT ch.doc_id, ch.chunk_hash FROM ch
      |  JOIN (SELECT chunk_hash FROM ch GROUP BY 1
      |        HAVING COUNT(*) <= 64) cold USING (chunk_hash)),
      |shared AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
      |  FROM chcold a JOIN chcold b ON a.chunk_hash = b.chunk_hash
      |    AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |cp AS (
      |  SELECT id_a, id_b, CAST(shared AS INTEGER) AS shared,
      |    ROUND(shared / CAST(LEAST(sa.sz, sb.sz) AS DOUBLE), 4)
      |      AS overlap
      |  FROM shared
      |  JOIN sizes sa ON sa.doc_id = id_a
      |  JOIN sizes sb ON sb.doc_id = id_b
      |  WHERE shared / CAST(LEAST(sa.sz, sb.sz) AS DOUBLE) >= 0.49995)""".stripMargin

  val chunkDups: String = corpusCte + ",\n" + chunkPairCtes +
    """
      |SELECT id_a, id_b, shared, overlap FROM cp
      |ORDER BY id_a, id_b""".stripMargin

  /** Mirrors Clusters.keepSweep: the pipelineKeep survivors minus
    * non-minimum members of chunk-overlap near-dup components (same
    * recursive closure as [[dupClusters]], over the cp edges).
    */
  val keepSweep: String =
    corpusCte.replaceFirst("WITH ", "WITH RECURSIVE ") + ",\n" +
      chunkPairCtes +
    """
      |, sym2 AS (
      |  SELECT id_a AS src, id_b AS dst FROM cp
      |  UNION ALL
      |  SELECT id_b, id_a FROM cp),
      |reach2(id, r) AS (
      |  SELECT DISTINCT src, src FROM sym2
      |  UNION
      |  SELECT s.dst, reach2.r FROM reach2 JOIN sym2 s
      |  ON s.src = reach2.id),
      |comp2 AS (
      |  SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach2
      |  GROUP BY id)""".stripMargin + "\n" + keepCtes +
    """
      |SELECT keep_id, copies, quality_score FROM kept
      |WHERE keep_id NOT IN (
      |  SELECT doc_id FROM comp2 WHERE doc_id <> cluster_id)
      |ORDER BY keep_id""".stripMargin

  /** Mirrors Multimodal.resizePlan: identical IEEE double scale math
    * (LEAST of 1 and 64/dim as doubles, FLOOR of the product).
    */
  val mediaResize: String =
    """WITH media AS (
      |  SELECT 'm'||CAST(x AS VARCHAR) AS media_ref,
      |    CAST(32 + (x%8)*16 AS INTEGER) AS width,
      |    CAST(32 + (x%5)*16 AS INTEGER) AS height
      |  FROM generate_series(0,49) t(x))
      |SELECT media_ref, width, height,
      |  CAST(GREATEST(1, FLOOR(CAST(width AS DOUBLE) * s)) AS INTEGER)
      |    AS out_w,
      |  CAST(GREATEST(1, FLOOR(CAST(height AS DOUBLE) * s)) AS INTEGER)
      |    AS out_h
      |FROM (SELECT *, LEAST(CAST(1 AS DOUBLE),
      |    CAST(64 AS DOUBLE)/CAST(width AS DOUBLE),
      |    CAST(64 AS DOUBLE)/CAST(height AS DOUBLE)) AS s FROM media)
      |ORDER BY media_ref""".stripMargin

  /** Mirrors Multimodal.frameSample: same metadata-derived frame count,
    * same uniform stride, same per-frame digest.
    */
  val mediaFrameSample: String =
    """WITH media AS (
      |  SELECT 'm'||CAST(x AS VARCHAR) AS media_ref,
      |    32 + (x%8)*16 AS width, 32 + (x%5)*16 AS height
      |  FROM generate_series(0,49) t(x)),
      |frames AS (
      |  SELECT media_ref,
      |    CAST((width + height) // 16 AS INTEGER) AS n_frames,
      |    CAST(CEIL(((width + height) // 16) / 4.0) AS INTEGER) AS stride
      |  FROM media)
      |SELECT media_ref, n_frames, CAST(u.i AS INTEGER) AS frame_idx,
      |  md5(media_ref||'-'||CAST(u.i AS VARCHAR)) AS frame_hash
      |FROM frames, LATERAL unnest(generate_series(0, n_frames - 1,
      |  stride)) u(i)
      |ORDER BY media_ref, frame_idx""".stripMargin

  val docMediaProfile: String = spanCtes +
    """
      |, media AS (
      |  SELECT 'm'||CAST(x AS VARCHAR) AS media_ref,
      |    32 + (x%8)*16 AS width, 32 + (x%5)*16 AS height
      |  FROM generate_series(0,49) t(x))
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_media,
      |  CAST(SUM(width*height) AS BIGINT) AS total_pixels
      |FROM spans JOIN media USING (media_ref)
      |WHERE kind = 'image' AND media_ref IS NOT NULL
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val drift: String =
    """WITH ev AS (
      |  SELECT event_type,
      |    CASE WHEN date_part('day', ts) <= 15 THEN 'A' ELSE 'B' END
      |      AS snap,
      |    least(CAST(floor(value/20) AS INTEGER), 19) AS bucket
      |  FROM events),
      |counts AS (SELECT event_type, snap, bucket, COUNT(*) AS cnt
      |  FROM ev GROUP BY 1,2,3),
      |totals AS (SELECT event_type, snap, SUM(cnt) AS tot
      |  FROM counts GROUP BY 1,2),
      |frac AS (SELECT c.event_type, c.snap, c.bucket,
      |    cnt/CAST(tot AS DOUBLE) AS p
      |  FROM counts c JOIN totals t USING (event_type, snap)),
      |grid AS (SELECT event_type, bucket,
      |    coalesce(SUM(CASE WHEN snap='A' THEN p END), 0.0) AS pa,
      |    coalesce(SUM(CASE WHEN snap='B' THEN p END), 0.0) AS pb
      |  FROM frac GROUP BY 1,2),
      |cdf AS (SELECT *,
      |    SUM(pa) OVER (PARTITION BY event_type ORDER BY bucket) AS cdfa,
      |    SUM(pb) OVER (PARTITION BY event_type ORDER BY bucket) AS cdfb,
      |    greatest(pa, 1e-6) AS pa_s, greatest(pb, 1e-6) AS pb_s
      |  FROM grid)
      |SELECT event_type,
      |  ROUND(SUM((pa_s-pb_s)*ln(pa_s/pb_s)), 4) AS psi,
      |  ROUND(MAX(abs(cdfa-cdfb)), 4) AS ks
      |FROM cdf GROUP BY event_type ORDER BY event_type""".stripMargin

  private val pathsCte: String =
    """WITH paths AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id%6=0 THEN '.github/workflows/ci-'||doc_id||'.yml'
      |         WHEN doc_id%6=1 THEN 'k8s/prod/app-'||doc_id||'.yaml'
      |         WHEN doc_id%6=2 THEN 'docker-compose-'||doc_id||'.yml'
      |         WHEN doc_id%6=3 THEN 'notes-'||doc_id||'.txt'
      |         WHEN doc_id%6=4 THEN 'conf-'||doc_id||'.yml'
      |         ELSE 'data-'||doc_id||'.yml' END AS path,
      |    CASE WHEN doc_id%6=5
      |         THEN 'https://example.org/schemas/embedded.json' END
      |      AS embedded
      |  FROM documents)""".stripMargin

  /** The full bundled schemastore catalog (~2,600 compiled globs) as a
    * VALUES list: (url, regex, basename_only, specificity, idx). The
    * regexes are RE2-compatible by construction; matching semantics
    * (basename vs full path, first-wins tie-break) mirror the engine —
    * glob-COMPILE correctness is independently pinned by
    * CatalogDriftSpec's port of the reference's GlobPatternTest vectors.
    */
  private def catValues: String =
    graft.rules.Catalog.compiled.map {
      case (_, url, re, bn, spec, idx, _) =>
        s"('${url.replace("'", "''")}', '${re.replace("'", "''")}', " +
          s"$bn, $spec, $idx)"
    }.mkString(",\n")

  /** No CLI schema → embedded > catalog > error (the only branch where
    * the catalog runs, YamlSchemaValidator.java:131-133).
    */
  val routingNone: String = pathsCte +
    s"""
       |, cat(cat_url, regex, bn, spec, idx) AS (VALUES
       |$catValues),
       |m AS (
       |  SELECT doc_id, path, embedded, cat_url, spec,
       |    ROW_NUMBER() OVER (PARTITION BY doc_id
       |      ORDER BY spec DESC NULLS LAST, idx ASC NULLS LAST)
       |      AS rn
       |  FROM paths LEFT JOIN cat ON regexp_matches(
       |    CASE WHEN bn THEN regexp_extract(path, '[^/]*$$')
       |         ELSE path END, regex))
       |SELECT doc_id, path,
       |  coalesce(embedded, cat_url) AS schema_url,
       |  CASE WHEN embedded IS NOT NULL THEN 'embedded'
       |       WHEN cat_url IS NOT NULL THEN 'catalog'
       |       ELSE 'error' END AS resolution,
       |  CASE WHEN embedded IS NULL AND cat_url IS NULL
       |       THEN 'No schema found in YAML file or provided as parameter'
       |       END AS error
       |FROM m WHERE rn = 1 ORDER BY doc_id""".stripMargin

  /** CLI schema given → embedded beats it, catalog never runs
    * (YamlSchemaValidator.java:123-136 — the r1 oracle had catalog >
    * default, which the reference does not do).
    */
  val routingDefault: String = pathsCte +
    """
      |SELECT doc_id, path,
      |  coalesce(embedded, 'https://example.org/schemas/default.json')
      |    AS schema_url,
      |  CASE WHEN embedded IS NOT NULL THEN 'embedded'
      |       ELSE 'default' END AS resolution,
      |  CAST(NULL AS VARCHAR) AS error
      |FROM paths ORDER BY doc_id""".stripMargin

  /** --schema-override: the CLI schema wins over everything
    * (YamlSchemaValidatorRunner config; YamlSchemaValidator.java:125).
    */
  val routingOverride: String = pathsCte +
    """
      |SELECT doc_id, path,
      |  'https://example.org/schemas/default.json' AS schema_url,
      |  'override' AS resolution,
      |  CAST(NULL AS VARCHAR) AS error
      |FROM paths ORDER BY doc_id""".stripMargin

  val parseJson: String =
    """SELECT event_id,
      |  CASE WHEN json_valid(j) THEN CAST(j->>'k' AS INTEGER) END AS k,
      |  json_valid(j) AS parse_ok,
      |  CASE WHEN NOT json_valid(j)
      |       THEN 'parse error: malformed JSON document' END AS error
      |FROM (SELECT event_id,
      |  CASE WHEN event_id%97=0 THEN replace(props,'}','') ELSE props END
      |    AS j FROM events)
      |ORDER BY event_id""".stripMargin

  val summary: String = spanCtes +
    """
      |, v AS (
      |  SELECT doc_id, SUM(CASE WHEN bad THEN 1 ELSE 0 END) AS nv
      |  FROM mismatch GROUP BY doc_id)
      |SELECT CAST(COUNT(*) AS BIGINT) AS docs,
      |  CAST(SUM(CASE WHEN nv=0 THEN 1 ELSE 0 END) AS BIGINT) AS valid_docs,
      |  CAST(SUM(CASE WHEN nv>0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS invalid_docs,
      |  CAST(SUM(nv) AS BIGINT) AS violations
      |FROM v""".stripMargin

  val quantiles: String =
    """SELECT event_type,
      |  ROUND(quantile_cont(value, 0.5), 4) AS p50,
      |  ROUND(quantile_cont(value, 0.95), 4) AS p95,
      |  ROUND(quantile_cont(value, 0.99), 4) AS p99
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  val saltedAgg: String = spanCtes +
    """
      |SELECT media_ref, CAST(COUNT(*) AS BIGINT) AS cnt
      |FROM spans WHERE media_ref IS NOT NULL
      |GROUP BY media_ref ORDER BY media_ref""".stripMargin

  val multiDoc: String =
    """WITH src AS (
      |  SELECT 'f'||CAST(doc_id AS VARCHAR)||'.yaml' AS path,
      |    string_split(text, ' stream ') AS parts
      |  FROM documents),
      |ex AS (
      |  SELECT path, len(parts) AS n,
      |    unnest(generate_series(1, len(parts))) AS doc_index,
      |    unnest(parts) AS doc_text
      |  FROM src)
      |SELECT path,
      |  CASE WHEN n = 1 THEN path
      |       ELSE path||'-'||CAST(doc_index AS VARCHAR) END AS doc_key,
      |  CAST(doc_index AS INTEGER) AS doc_index,
      |  CAST(length(doc_text) AS INTEGER) AS doc_len
      |FROM ex ORDER BY path, doc_index""".stripMargin

  val snapshotDiff: String = spanCtes +
    """
      |, rv AS (
      |  SELECT doc_id, idnum, '/spans/'||CAST(i-1 AS VARCHAR)||'/offset'
      |      AS pointer, 'maximum' AS keyword
      |  FROM spans WHERE "offset" IS NOT NULL AND "offset" > 7
      |  UNION ALL
      |  SELECT doc_id, idnum, '/spans/'||CAST(i-1 AS VARCHAR)||'/kind',
      |    'enum' FROM spans
      |  WHERE kind IS NOT NULL AND kind NOT IN ('text','image','audio')
      |  UNION ALL
      |  SELECT doc_id, idnum, '/spans/'||CAST(i-1 AS VARCHAR)||'/media_ref',
      |    'required' FROM spans WHERE kind = 'image' AND media_ref IS NULL
      |  UNION ALL
      |  SELECT doc_id, idnum, '/spans/'||CAST(i-1 AS VARCHAR)||'/media_ref',
      |    'pattern' FROM spans
      |  WHERE media_ref IS NOT NULL
      |    AND NOT regexp_matches(media_ref, '^m[0-9]+$')
      |  UNION ALL
      |  SELECT doc_id, idnum, '/spans/'||CAST(i-1 AS VARCHAR)||'/offset',
      |    'minimum' FROM spans WHERE "offset" IS NOT NULL AND "offset" < 0
      |)
      |SELECT doc_id, pointer, keyword FROM (
      |  SELECT doc_id, pointer, keyword FROM rv
      |  EXCEPT ALL
      |  SELECT doc_id, pointer, keyword FROM rv WHERE idnum%97 <> 3)
      |ORDER BY doc_id, pointer, keyword""".stripMargin

  val cubeAgg: String =
    """SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
      |  ROUND(SUM(o_totalprice), 4) AS total,
      |  CAST(GROUPING(o_orderstatus)*2 + GROUPING(o_orderpriority)
      |    AS INTEGER) AS gid
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""
      .stripMargin

  val sqlExists: String =
    """SELECT c_custkey, c_mktsegment FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
      |ORDER BY c_custkey""".stripMargin

  val unionDistinct: String =
    """SELECT DISTINCT o_custkey FROM (
      |  SELECT o_custkey FROM orders WHERE o_totalprice > 450000
      |  UNION ALL
      |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |ORDER BY o_custkey""".stripMargin

  val jsonSchema: String =
    """SELECT event_id, '/k' AS pointer, 'maximum' AS keyword,
      |  'must have a maximum value of 80' AS message,
      |  '#/properties/k/maximum' AS schemaLocation
      |FROM events WHERE CAST(props->>'k' AS INTEGER) > 80
      |ORDER BY event_id, pointer""".stripMargin

  /** Mirrors data.JsonDocs injection arithmetic — derives the expected
    * violation set from the documents columns directly (never parses
    * JSON), so the VARIANT compiler path is checked end-to-end by an
    * independent computation. Exclusion conditions encode JsonDocs'
    * CASE order (first match wins).
    */
  val jsonSchema2: String =
    """SELECT doc_id, pointer, keyword, message, schemaLocation FROM (
      |  SELECT doc_id, '/' AS pointer, 'required' AS keyword,
      |    'required property ''email'' not found' AS message,
      |    '#//required' AS schemaLocation
      |  FROM documents WHERE doc_id%59=0
      |  UNION ALL
      |  SELECT doc_id, '/email', 'format',
      |    'does not match the email pattern', '#/properties/email/format'
      |  FROM documents WHERE doc_id%23=0 AND doc_id%59<>0
      |  UNION ALL
      |  SELECT doc_id, '/ts', 'format',
      |    'does not match the date-time pattern', '#/properties/ts/format'
      |  FROM documents WHERE doc_id%29=0
      |  UNION ALL
      |  SELECT doc_id, '/count', 'maximum',
      |    'must have a maximum value of 500', '#/properties/count/maximum'
      |  FROM documents WHERE n_chars > 500
      |  UNION ALL
      |  SELECT doc_id, '/score', 'exclusiveMinimum',
      |    'must have an exclusive minimum value of 0',
      |    '#/properties/score/exclusiveMinimum'
      |  FROM documents WHERE doc_id%10=0
      |  UNION ALL
      |  SELECT doc_id, '/score', 'multipleOf', 'must be multiple of 3',
      |    '#/properties/score/multipleOf'
      |  FROM documents WHERE (doc_id%10)%3<>0
      |  UNION ALL
      |  SELECT doc_id, '/tags', 'uniqueItems',
      |    'must have only unique items in the array',
      |    '#/properties/tags/uniqueItems'
      |  FROM documents WHERE doc_id%31=0
      |  UNION ALL
      |  SELECT doc_id, '/tags/1', 'type', 'integer found, string expected',
      |    '#/properties/tags/items/type'
      |  FROM documents WHERE doc_id%37=0 AND doc_id%31<>0
      |  UNION ALL
      |  SELECT doc_id, '/tags', 'minItems', 'must have at least 1 items',
      |    '#/properties/tags/minItems'
      |  FROM documents
      |  WHERE doc_id%41=0 AND doc_id%31<>0 AND doc_id%37<>0
      |  UNION ALL
      |  SELECT doc_id, '/kind', 'oneOf',
      |    'must be valid against exactly one schema',
      |    '#/properties/kind/oneOf'
      |  FROM documents WHERE doc_id%53=0
      |  UNION ALL
      |  SELECT doc_id, '/levels/app', 'additionalProperties',
      |    'property ''app'' does not match the additional-properties schema',
      |    '#/properties/levels/additionalProperties'
      |  FROM documents
      |  WHERE doc_id%43=0
      |     OR (doc_id%61=0 AND doc_id%43<>0 AND doc_id%47<>0)
      |) ORDER BY doc_id, pointer, keyword""".stripMargin

  /** Mirrors [[graft.operators.Mix.sampleMix]]: the same md5-derived
    * per-mille bucket (low 60 bits of md5("mix:"||doc_id)) and the same
    * per-language keep thresholds — the point of an md5 bucket is that
    * ANY engine can recompute the keep decision, and this oracle is
    * that claim exercised.
    */
  val sampleMix: String =
    """SELECT doc_id, lang, source, n_chars, mix_bucket
      |FROM (
      |  SELECT *, CAST(
      |      CAST(('0x'||substr(md5('mix:'||CAST(doc_id AS VARCHAR)),1,15))
      |        AS UBIGINT) % 1000 AS BIGINT) AS mix_bucket
      |  FROM documents)
      |WHERE mix_bucket < CASE lang
      |  WHEN 'en' THEN 1000 WHEN 'zh' THEN 600 WHEN 'es' THEN 500
      |  WHEN 'de' THEN 400 WHEN 'fr' THEN 250 ELSE 100 END
      |ORDER BY doc_id""".stripMargin

  /** Mirrors [[graft.operators.Mix.packShards]] with the sequential
    * prefix-sum form the distributed two-level version must equal:
    * shard_id = exclusive running subword-token total `div` budget
    * (integer division — exact at any budget, ADVICE r5).
    */
  val packShards: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CAST(len(regexp_extract_all(text,
       |      '${graft.operators.TextOps.SubwordPattern}')) AS BIGINT)
       |      AS toks
       |  FROM documents)
       |SELECT doc_id, toks,
       |  CAST(COALESCE(SUM(toks) OVER (ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |    // ${graft.operators.Mix.ShardBudget} AS BIGINT) AS shard_id
       |FROM t ORDER BY doc_id""".stripMargin

  /** Mirrors [[graft.operators.Mix.trainOrder]] with the single-window
    * sequential form the two-level distributed position assignment
    * must equal exactly.
    */
  val trainOrder: String =
    """WITH k AS (
      |  SELECT doc_id, lang, CAST(
      |    CAST(('0x'||substr(md5('ord:'||CAST(doc_id AS VARCHAR)),1,15))
      |      AS UBIGINT) AS BIGINT) AS okey
      |  FROM documents)
      |SELECT doc_id, lang,
      |  ROW_NUMBER() OVER (ORDER BY okey, doc_id) - 1 AS pos
      |FROM k ORDER BY pos""".stripMargin

  /** Mirrors [[graft.operators.Mix.stratifiedSample]] with the
    * one-window-per-stratum textbook form.
    */
  val stratifiedSample: String =
    """WITH k AS (
      |  SELECT doc_id, lang, source, CAST(
      |    CAST(('0x'||substr(md5('strat:'||CAST(doc_id AS VARCHAR)),1,15))
      |      AS UBIGINT) AS BIGINT) AS skey
      |  FROM documents)
      |SELECT doc_id, lang, source, stratum_rank FROM (
      |  SELECT doc_id, lang, source, ROW_NUMBER() OVER (
      |      PARTITION BY lang ORDER BY skey, doc_id) AS stratum_rank
      |  FROM k)
      |WHERE stratum_rank <= 40
      |ORDER BY lang, stratum_rank""".stripMargin

  /** Mirrors [[graft.operators.Mix.repeatMix]]: the same per-source
    * (base, per-mille) epoch factors and the same md5 per-mille bucket
    * deciding the fractional copy.
    */
  val repeatMix: String =
    """WITH f AS (
      |  SELECT doc_id, source,
      |    CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 3
      |      WHEN 'src5' THEN 1 WHEN 'src7' THEN 0 ELSE 1 END AS base,
      |    CASE source WHEN 'src0' THEN 500 WHEN 'src1' THEN 0
      |      WHEN 'src5' THEN 250 WHEN 'src7' THEN 300 ELSE 0 END
      |      AS mille,
      |    CAST(CAST(('0x'||substr(md5('rep:'||CAST(doc_id AS VARCHAR)),
      |      1,15)) AS UBIGINT) % 1000 AS BIGINT) AS b
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, source,
      |    base + CASE WHEN b < mille THEN 1 ELSE 0 END AS copies
      |  FROM f)
      |SELECT doc_id, source, CAST(u.copy AS INTEGER) AS copy
      |FROM c, LATERAL unnest(generate_series(1, copies)) u(copy)
      |WHERE copies > 0
      |ORDER BY doc_id, copy""".stripMargin

  /** Mirrors [[graft.operators.Mix.qualityGate]] with the
    * single-window global-rank form: top 60% by (quality DESC,
    * hash-order key, doc_id).
    */
  val qualityGate: String =
    """WITH q AS (
      |  SELECT doc_id,
      |    ROUND(CAST(CASE WHEN n_tokens >= 10 THEN 0.4 ELSE 0.0 END +
      |          CASE WHEN punct_ratio <= 0.1 THEN 0.3 ELSE 0.0 END +
      |          CASE WHEN stop_ratio >= 0.05 THEN 0.3 ELSE 0.0 END
      |          AS DOUBLE), 4) AS quality_score
      |  FROM (
      |    SELECT doc_id, len(w) AS n_tokens,
      |      (length(text) - length(regexp_replace(text, '[^a-z ]', '',
      |        'g'))) / CAST(length(text) AS DOUBLE) AS punct_ratio,
      |      len(list_filter(w, t -> t IN ('der','die','und','das','the',
      |        'a','and','of','el','la','los','de','le','les','et')))
      |        / CAST(len(w) AS DOUBLE) AS stop_ratio
      |    FROM (SELECT doc_id, text, string_split(text,' ') AS w
      |          FROM documents))),
      |k AS (
      |  SELECT doc_id, quality_score, CAST(
      |    CAST(('0x'||substr(md5('gate:'||CAST(doc_id AS VARCHAR)),1,15))
      |      AS UBIGINT) AS BIGINT) AS okey
      |  FROM q),
      |r AS (
      |  SELECT doc_id, quality_score,
      |    ROW_NUMBER() OVER (ORDER BY quality_score DESC, okey, doc_id)
      |      AS quality_rank,
      |    COUNT(*) OVER () AS n
      |  FROM k)
      |SELECT doc_id, quality_score, quality_rank FROM r
      |WHERE quality_rank <= CAST(FLOOR(0.6*n) AS BIGINT)
      |ORDER BY quality_rank""".stripMargin

  /** Mirrors [[graft.operators.TextOps.boilerStripOf]] over the
    * duplicated corpus: same chunking, same df > 2 strip, same ordered
    * clean digest.
    */
  val boilerStrip: String = corpusCte + ",\n" + chunksCte("corpus") +
    """
      |, dfq AS (
      |  SELECT chunk_hash FROM chunkrows
      |  GROUP BY 1 HAVING COUNT(DISTINCT doc_id) > 2),
      |kept AS (
      |  SELECT doc_id, chunk_idx, chunk_hash FROM chunkrows
      |  WHERE chunk_hash NOT IN (SELECT chunk_hash FROM dfq)),
      |tot AS (SELECT doc_id, COUNT(*) AS n_chunks FROM chunkrows
      |        GROUP BY 1),
      |ka AS (
      |  SELECT doc_id, COUNT(*) AS kept_chunks,
      |    md5(string_agg(chunk_hash, '' ORDER BY chunk_idx))
      |      AS clean_digest
      |  FROM kept GROUP BY doc_id)
      |SELECT t.doc_id, CAST(t.n_chunks AS INTEGER) AS n_chunks,
      |  CAST(COALESCE(ka.kept_chunks, 0) AS INTEGER) AS kept_chunks,
      |  COALESCE(ka.clean_digest, md5('')) AS clean_digest
      |FROM tot t LEFT JOIN ka USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** Mirrors [[graft.operators.TextOps.repSignalsOf]]: duplicate
    * n-gram fractions and top-word share per doc, same guards and
    * thresholds.
    */
  val repSignals: String =
    """WITH d AS (
      |  SELECT doc_id, string_split(text,' ') AS w FROM documents),
      |g AS (
      |  SELECT doc_id, w,
      |    CASE WHEN len(w) >= 2 THEN list_transform(
      |      generate_series(1, len(w)-1), i -> w[i]||' '||w[i+1])
      |      ELSE [] END AS g2,
      |    CASE WHEN len(w) >= 3 THEN list_transform(
      |      generate_series(1, len(w)-2),
      |      i -> w[i]||' '||w[i+1]||' '||w[i+2])
      |      ELSE [] END AS g3
      |  FROM d),
      |topw AS (
      |  SELECT doc_id, MAX(c) AS topc FROM (
      |    SELECT doc_id, word, COUNT(*) AS c FROM (
      |      SELECT doc_id, unnest(w) AS word FROM d)
      |    GROUP BY doc_id, word)
      |  GROUP BY doc_id),
      |sig AS (
      |  SELECT g.doc_id,
      |    CAST(len(w) AS INTEGER) AS n_tokens,
      |    CASE WHEN len(g2) > 0 THEN ROUND((len(g2) -
      |      len(list_distinct(g2))) / CAST(len(g2) AS DOUBLE), 4)
      |      ELSE CAST(0.0 AS DOUBLE) END AS dup_bigram_frac,
      |    CASE WHEN len(g3) > 0 THEN ROUND((len(g3) -
      |      len(list_distinct(g3))) / CAST(len(g3) AS DOUBLE), 4)
      |      ELSE CAST(0.0 AS DOUBLE) END AS dup_trigram_frac,
      |    ROUND(topc / CAST(len(w) AS DOUBLE), 4) AS top_word_frac
      |  FROM g JOIN topw ON g.doc_id = topw.doc_id)
      |SELECT doc_id, n_tokens, dup_bigram_frac, dup_trigram_frac,
      |  top_word_frac,
      |  (dup_trigram_frac > 0.35 OR top_word_frac > 0.2) AS repetitive
      |FROM sig ORDER BY doc_id""".stripMargin

  /** Mirrors [[graft.operators.TextOps.redact]]: same deterministic
    * PII injection, same regexes, same email-then-url replace order.
    */
  val redact: String =
    """WITH pii AS (
      |  SELECT doc_id, text ||
      |    CASE WHEN doc_id % 7 = 3 THEN ' contact bob'||
      |      CAST(doc_id AS VARCHAR)||'@example.com now' ELSE '' END ||
      |    CASE WHEN doc_id % 11 = 5 THEN ' see https://x'||
      |      CAST(doc_id AS VARCHAR)||'.example.org/page today'
      |      ELSE '' END AS text
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(text,
      |    '[a-z0-9.]+@[a-z0-9.]+[a-z]')) AS INTEGER) AS n_emails,
      |  CAST(len(regexp_extract_all(text, 'https?://[^ ]+'))
      |    AS INTEGER) AS n_urls,
      |  md5(regexp_replace(regexp_replace(text,
      |    '[a-z0-9.]+@[a-z0-9.]+[a-z]', '<EMAIL>', 'g'),
      |    'https?://[^ ]+', '<URL>', 'g')) AS clean_digest
      |FROM pii ORDER BY doc_id""".stripMargin

  /** Mirrors [[graft.operators.Relational.asofJoin]] with DuckDB's
    * NATIVE ASOF JOIN — a genuinely independent algorithm for the same
    * point-in-time semantics (at-or-before match on the same key).
    */
  val asofJoin: String =
    """WITH r AS (
      |  SELECT user_id, ts, MAX(value) AS ref_value FROM events
      |  WHERE event_type = 'error' GROUP BY 1, 2),
      |l AS (
      |  SELECT event_id, user_id, ts, event_type, value FROM events
      |  WHERE event_type <> 'error')
      |SELECT l.event_id, l.user_id, l.event_type, l.value, r.ref_value
      |FROM l ASOF LEFT JOIN r
      |  ON l.user_id = r.user_id AND l.ts >= r.ts
      |ORDER BY l.event_id""".stripMargin

  /** Mirrors [[graft.operators.Relational.sessionize]]: same lag-break
    * + running-sum session assignment on the same microsecond key.
    */
  val sessionize: String =
    """WITH o AS (
      |  SELECT user_id, event_id, value, epoch_us(ts) AS us
      |  FROM events),
      |b AS (
      |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
      |      OR us - lag(us) OVER w > 21600000000 THEN 1 ELSE 0 END
      |    AS brk
      |  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      |s AS (
      |  SELECT *, SUM(brk) OVER (PARTITION BY user_id
      |    ORDER BY us, event_id) AS session_id FROM b)
      |SELECT user_id, CAST(session_id AS INTEGER) AS session_id,
      |  CAST(COUNT(*) AS INTEGER) AS n_events,
      |  CAST(MAX(us) - MIN(us) AS BIGINT) AS duration_us,
      |  ROUND(SUM(value), 4) AS total_value
      |FROM s GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** Mirrors [[graft.operators.Relational.rangeJoin]] with the naive
    * inequality join DuckDB can afford at fixture scale — a genuinely
    * different algorithm from the bucketized equi-join.
    */
  val rangeJoin: String =
    """WITH w AS (
      |  SELECT CAST(x AS INTEGER) AS window_id,
      |    1704067200000000 + x*37*3600000000 AS ws,
      |    1704067200000000 + (x*37 + x%7 + 1)*3600000000 AS we
      |  FROM generate_series(0,49) t(x)),
      |e AS (SELECT event_id, value, epoch_us(ts) AS us FROM events)
      |SELECT w.window_id,
      |  CAST(COUNT(e.event_id) AS INTEGER) AS n_events,
      |  ROUND(CAST(COALESCE(SUM(e.value), 0) AS DOUBLE), 4)
      |    AS total_value
      |FROM w LEFT JOIN e ON e.us >= w.ws AND e.us < w.we
      |GROUP BY w.window_id
      |ORDER BY w.window_id""".stripMargin

  /** Mirrors [[graft.operators.Relational.attribution]] with the plain
    * inequality join the bucketized equi-join + residual filter must
    * equal exactly (µs integers on both sides).
    */
  val attribution: String =
    """WITH imp AS (
      |  SELECT user_id, event_id AS imp_id, epoch_us(ts) AS imp_us
      |  FROM events WHERE event_type = 'view'),
      |clk AS (
      |  SELECT user_id, event_id AS click_id, epoch_us(ts) AS click_us
      |  FROM events WHERE event_type = 'click')
      |SELECT i.user_id, imp_id, click_id, imp_us, click_us
      |FROM imp i JOIN clk c ON i.user_id = c.user_id
      |  AND c.click_us >= i.imp_us
      |  AND c.click_us <= i.imp_us + 21600000000
      |ORDER BY i.user_id, imp_id, click_id""".stripMargin

  /** Mirrors [[graft.operators.Relational.pivotEvents]] as the
    * conditional aggregation a pivot lowers to.
    */
  val pivotEvents: String =
    """SELECT user_id,
      |  CAST(COALESCE(SUM(CASE WHEN event_type='click' THEN 1 END), 0)
      |    AS BIGINT) AS click,
      |  CAST(COALESCE(SUM(CASE WHEN event_type='error' THEN 1 END), 0)
      |    AS BIGINT) AS error,
      |  CAST(COALESCE(SUM(CASE WHEN event_type='purchase' THEN 1 END), 0)
      |    AS BIGINT) AS purchase,
      |  CAST(COALESCE(SUM(CASE WHEN event_type='signup' THEN 1 END), 0)
      |    AS BIGINT) AS signup,
      |  CAST(COALESCE(SUM(CASE WHEN event_type='view' THEN 1 END), 0)
      |    AS BIGINT) AS view
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Mirrors [[graft.operators.Similarity.centroids]]: identical ×4096
    * quantization (power-of-two float scaling is exact), exact integer
    * sums, same deterministic division.
    */
  val centroids: String =
    """WITH x AS (
      |  SELECT label, unnest(embedding) AS v,
      |    unnest(generate_series(1, len(embedding))) AS p
      |  FROM embeddings)
      |SELECT label, CAST(p - 1 AS INTEGER) AS pos,
      |  CAST(COUNT(*) AS INTEGER) AS n_vecs,
      |  ROUND(CAST(SUM(CAST(FLOOR(v * 4096) AS BIGINT)) AS BIGINT)
      |    / COUNT(*), 4) AS centroid_q
      |FROM x GROUP BY label, p ORDER BY label, pos""".stripMargin

  /** Mirrors [[graft.operators.TextOps.dataCard]]: same quality
    * composite, same ×10000 quantization before the mean.
    */
  val dataCard: String =
    """WITH q AS (
      |  SELECT source, lang, n_tokens,
      |    CAST(ROUND(10000 * (
      |      CASE WHEN n_tokens >= 10 THEN 0.4 ELSE 0.0 END +
      |      CASE WHEN punct_ratio <= 0.1 THEN 0.3 ELSE 0.0 END +
      |      CASE WHEN stop_ratio >= 0.05 THEN 0.3 ELSE 0.0 END))
      |      AS BIGINT) AS qint
      |  FROM (
      |    SELECT source, lang, len(w) AS n_tokens,
      |      (length(text) - length(regexp_replace(text, '[^a-z ]', '',
      |        'g'))) / CAST(length(text) AS DOUBLE) AS punct_ratio,
      |      len(list_filter(w, t -> t IN ('der','die','und','das','the',
      |        'a','and','of','el','la','los','de','le','les','et')))
      |        / CAST(len(w) AS DOUBLE) AS stop_ratio
      |    FROM (SELECT source, lang, text, string_split(text,' ') AS w
      |          FROM documents)))
      |SELECT source,
      |  CAST(COUNT(*) AS INTEGER) AS n_docs,
      |  CAST(COUNT(DISTINCT lang) AS INTEGER) AS n_langs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS tokens,
      |  ROUND(CAST(SUM(qint) AS BIGINT) / (COUNT(*) * 10000.0), 4)
      |    AS mean_quality,
      |  ROUND(CAST(SUM(CASE WHEN qint >= 7000 THEN 1 ELSE 0 END)
      |    AS BIGINT) / CAST(COUNT(*) AS DOUBLE), 4) AS hi_quality_frac
      |FROM q GROUP BY source ORDER BY source""".stripMargin

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
