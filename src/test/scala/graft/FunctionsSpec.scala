package graft

import org.apache.spark.sql.functions._

import graft.functions.{NumStatsAgg, TDigestQuantile}
import graft.operators.Skew
import graft.rules._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("NumStats typed Aggregator: one-pass count/nulls/min/max/mean/var") {
    val data: Seq[java.lang.Double] =
      Seq[java.lang.Double](1.0, 2.0, null, 5.0, 4.0)
    val numStats = udaf(new NumStatsAgg)
    val stats = data.toDS().select(numStats(col("value")).as("s"))
      .select("s.*").as[graft.functions.NumStats].head()
    assert(stats.count === 5)
    assert(stats.nulls === 1)
    assert(stats.nullRate === 0.2)
    assert(stats.min === 1.0 && stats.max === 5.0)
    assert(math.abs(stats.mean - 3.0) < 1e-12)
    assert(math.abs(stats.variance - 10.0 / 3.0) < 1e-12) // sample var
  }

  test("NumStats merge across partitions equals single-partition result") {
    val vals = (1 to 10000).map(i => (i % 997).toDouble)
    val numStats = udaf(new NumStatsAgg)
    val one = vals.toDS().coalesce(1)
      .select(numStats(col("value").cast("double")).as("s"))
      .select("s.*").as[graft.functions.NumStats].head()
    val many = vals.toDS().repartition(13)
      .select(numStats(col("value").cast("double")).as("s"))
      .select("s.*").as[graft.functions.NumStats].head()
    assert(one.count === many.count && one.nulls === many.nulls)
    assert(math.abs(one.mean - many.mean) < 1e-9)
    assert(math.abs(one.variance - many.variance) < 1e-6)
  }

  test("t-digest quantiles within tolerance of exact percentiles") {
    // deterministic skewed-ish distribution
    val vals = (0 until 100000).map(i => (i.toLong * i % 100003).toDouble)
    val df = vals.toDF("v").repartition(16)
    val row = df.agg(
      TDigestQuantile.tdigestQuantile(col("v"), 0.5).as("p50"),
      TDigestQuantile.tdigestQuantile(col("v"), 0.95).as("p95"),
      TDigestQuantile.tdigestQuantile(col("v"), 0.99).as("p99"),
      expr("percentile(v, 0.5)").as("e50"),
      expr("percentile(v, 0.95)").as("e95"),
      expr("percentile(v, 0.99)").as("e99")).head()
    val sorted = vals.sorted
    def rankError(est: Double, q: Double): Double = {
      val rank = sorted.search(est) match {
        case scala.collection.Searching.Found(i) => i
        case scala.collection.Searching.InsertionPoint(i) => i
      }
      math.abs(rank.toDouble / sorted.length - q)
    }
    assert(rankError(row.getDouble(0), 0.5) < 0.02)
    assert(rankError(row.getDouble(1), 0.95) < 0.02)
    assert(rankError(row.getDouble(2), 0.99) < 0.02)
  }

  test("salted aggregation equals plain aggregation on skewed keys") {
    // hot key: 30% of rows share one media_ref
    val rows = (1 to 20000).map { i =>
      if (i % 10 < 3) "mHOT" else s"m${i % 50}"
    }
    val df = rows.toDF("media_ref")
    val plain = df.groupBy("media_ref").count()
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedCount(df, "media_ref", 8)
      .as[(String, Long)].collect().toMap
    assert(salted === plain)
  }

  test("salted join equals plain join on skewed keys") {
    val facts = (1 to 5000).map { i =>
      (if (i % 10 < 3) "mHOT" else s"m${i % 50}", i.toLong)
    }.toDF("media_ref", "v")
    val dim = (Seq("mHOT") ++ (0 until 50).map(i => s"m$i"))
      .map(r => (r, s"kind-$r")).toDF("media_ref", "kind")
    val plain = facts.join(dim, Seq("media_ref"))
      .agg(count(lit(1)), sum(col("v"))).as[(Long, Long)].head()
    val salted = Skew.saltedJoin(facts, dim, "media_ref", 8)
      .agg(count(lit(1)), sum(col("v"))).as[(Long, Long)].head()
    assert(salted === plain)
  }

  test("oneOf / not / contains / minItems / additionalProperties keywords") {
    // oneOf: span must be text-with-text or image-with-ref, exactly one
    val oneOf = OneOfRule("kind", Seq(
      sp => sp.getField("kind") === "text" && sp.getField("text").isNotNull,
      sp => sp.getField("kind") === "image" &&
        sp.getField("media_ref").isNotNull))
    val spans = Seq(
      graft.model.Span("text", "ok", null, 0),    // exactly one → ok
      graft.model.Span("image", null, null, 1))   // zero branches → violated
    val df = spark.createDataFrame(Seq(graft.model.Doc("d", spans, "p")))
    val v1 = df.select(explode(RuleCompiler.violations(col("spans"),
        Seq(oneOf))).as("v"))
      .select($"v.pointer", $"v.keyword").as[(String, String)].collect()
    assert(v1.toSeq === Seq(("/spans/1/kind", "oneOf")))

    // not: offset must NOT be 0 → first span violates
    val notRule = NotRule(RangeRule("offset", None, Some(0)))
    val v2 = df.select(explode(RuleCompiler.violations(col("spans"),
        Seq(notRule))).as("v"))
      .select($"v.pointer").as[String].collect()
    assert(v2.toSeq === Seq("/spans/0/offset"))

    // contains: must contain an audio span → violated
    val c = df.select(DocRules.containsViolation(col("spans"),
      sp => sp.getField("kind") === "audio", "kind == audio").as("v"))
      .select($"v.keyword").as[String].collect()
    assert(c.toSeq === Seq("contains"))

    // minItems
    val sz = df.select(DocRules.sizeViolation(col("spans"), 3, 10).as("v"))
      .select($"v.keyword").as[String].collect()
    assert(sz.toSeq === Seq("minItems"))

    // additionalProperties over a map column
    val m = Seq(Map("good_key" -> "1", "bad key!" -> "2")).toDF("props")
    val ap = m.select(DocRules.additionalPropertiesViolation(col("props"),
      "^[a-z_]+$").as("v")).select($"v.keyword", $"v.message")
      .as[(String, String)].collect()
    assert(ap.length === 1 && ap.head._1 === "additionalProperties")
    assert(ap.head._2 === "property bad key! is not allowed")
  }

  test("codegen MinHash/SimHash kernels ≡ HOF spec trees on real docs") {
    import graft.operators.Dedup
    val dir = "/root/testdata/sf0.001"
    val sh = Dedup.corpusWords(spark, dir)
      .select(col("doc_id"), Dedup.shinglesOf(col("w")).as("sh"),
        col("w"))
    // Shingles: kernel == array_distinct(transform(...)) including
    // keep-first ordering and the short-doc empty array
    val sg = sh.select(col("sh").as("fast"),
      Dedup.shinglesOfHof(col("w")).as("spec"))
      .filter(col("fast") =!= col("spec")).count()
    assert(sg === 0)
    // MinHash: all 96 minima from the one-pass kernel must equal the 96
    // interpreted array_min(transform(...)) folds, hash for hash
    val mh = sh.select(
      Dedup.minhashSignature(col("sh")).as("fast"),
      Dedup.minhashSignatureHof(col("sh")).as("spec"))
      .filter(col("fast") =!= col("spec")).count()
    assert(mh === 0)
    // FUSED words→signature kernel (no shingle materialization at all)
    // == signature over the distinct shingle array: XXH64 over the
    // reused byte buffer is the same base hash as over the concat_ws
    // string, and minima are invariant to duplicate shingles
    val mw = sh.select(
      graft.functions.TextHash
        .minhashWords(col("w"), 3, Dedup.NumHashes).as("fast"),
      Dedup.minhashSignatureHof(Dedup.shinglesOfHof(col("w"))).as("spec"))
      .filter(col("fast") =!= col("spec")).count()
    assert(mw === 0)
    // FULLY fused text→signature kernel (in-place byte split, windows
    // hashed as contiguous text slices) == the words-array kernel over
    // split(text, " "), which is itself == the HOF spec form above.
    // Includes the limit -1 split edges: empty text, consecutive and
    // trailing spaces, short docs (asserted on an explicit edge corpus
    // below the real one).
    val tw = Dedup.corpus(spark, dir)
      .select(col("text"), split(col("text"), " ").as("w"))
    val mt = tw.select(
      graft.functions.TextHash.minhashText(col("text"), 3,
        Dedup.NumHashes).as("fast"),
      graft.functions.TextHash
        .minhashWords(col("w"), 3, Dedup.NumHashes).as("spec"))
      .filter(col("fast") =!= col("spec")).count()
    assert(mt === 0)
    val edges = Seq("", " ", "  ", "a", "a b", "a b c", "a  b  c",
      " a b c ", "a b c d e", "ab  cd", "µ héllo wörld µ x")
      .toDF("text")
      .select(col("text"), split(col("text"), " ").as("w"))
    val me = edges.select(
      graft.functions.TextHash.minhashText(col("text"), 3,
        Dedup.NumHashes).as("fast"),
      graft.functions.TextHash
        .minhashWords(col("w"), 3, Dedup.NumHashes).as("spec"))
      .filter(not(col("fast") <=> col("spec"))).count()
    assert(me === 0)
    // SimHash: kernel == fold-then-collapse, including the md5-top-60-bit
    // token hash the DuckDB oracle mirrors
    val sv = sh.select(
      graft.functions.TextHash.simhashValue(col("w"), Dedup.SimHashBits)
        .as("fast"),
      Dedup.simhashFromVotes(Dedup.simhashVotes(col("w"))).as("spec"))
      .filter(col("fast") =!= col("spec")).count()
    assert(sv === 0)
  }

  test("OrderedPairs kernel ≡ HOF pair expansion, incl. empty/singleton") {
    // the grouped-pairing probe's kernel (BenchExtra "pairing"): all
    // positional pairs i<j of a long array, one pass
    val df = Seq(
      Seq.empty[Long], Seq(7L), Seq(3L, 9L), Seq(1L, 2L, 5L, 8L))
      .toDF("ids")
    val bad = df.select(
      graft.functions.TextHash.orderedPairs(col("ids")).as("fast"),
      flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + lit(2),
          greatest(size(col("ids")) - i - 1, lit(0))),
          y => struct(x.as("id_a"), y.as("id_b"))))).as("spec"))
      .filter(col("fast").cast("string") =!= col("spec").cast("string"))
      .count()
    assert(bad === 0)
  }

  test("codegen token-count kernels ≡ regex forms on real docs and " +
      "adversarial strings") {
    import graft.operators.TextOps
    // real corpus text (incl. the PII-injected variants with @ / URLs)
    val dir = "/root/testdata/sf0.01"
    val texts = Tables.documents(spark, dir).select(col("text"))
      .unionAll(TextOps.piiCorpus(spark, dir).select(col("text")))
    val corpusMismatch = texts.select(
        graft.functions.TokenCount.subwordCount(col("text")).as("k1"),
        TextOps.subwordCountRegex(col("text")).as("r1"),
        graft.functions.TokenCount.asciiRunCount(col("text")).as("k2"),
        size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+"),
          lit(0))).as("r2"))
      .filter(col("k1") =!= col("r1") || col("k2") =!= col("r2")).count()
    assert(corpusMismatch === 0)
    // edge cases: overlapping merges, leftmost-first alternation order,
    // digits, uppercase/punctuation ([^ ]), multi-byte code points
    // (2/3/4-byte UTF-8), empty and all-space strings
    val edges = Seq("", " ", "   ", "tionment", "theers", "athe", "ana",
      "este", "inging", "erst", "th", "aand", "xyz123abc",
      "Hello, Wörld! ß€𝄞", "a b  c",
      "atatat", "esters", "the end", "1a2b", "REa").toDF("text")
    val edgeMismatch = edges.select(
        graft.functions.TokenCount.subwordCount(col("text")).as("k1"),
        TextOps.subwordCountRegex(col("text")).as("r1"),
        graft.functions.TokenCount.asciiRunCount(col("text")).as("k2"),
        size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+"),
          lit(0))).as("r2"))
      .filter(col("k1") =!= col("r1") || col("k2") =!= col("r2")).count()
    assert(edgeMismatch === 0)
  }

  test("codegen cosine kernel ≡ HOF fold tree, bit for bit") {
    import graft.operators.Similarity
    val dir = "/root/testdata/sf0.001"
    // float×float (raw embeddings) and double×double (dup corpus) pairs;
    // equality is EXACT (===), not approximate — the kernel's
    // accumulators advance in the same element order as the folds
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val ff = e.as("a").crossJoin(e.as("b").limit(5))
      .select(Similarity.cosine(col("a.embedding"), col("b.embedding"))
        .as("fast"),
        Similarity.cosineHof(col("a.embedding"), col("b.embedding"))
          .as("spec"))
      .filter(col("fast") =!= col("spec")).count()
    assert(ff === 0)
    val d = Similarity.dupCorpus(spark, dir).limit(40)
    val dd = d.as("a").crossJoin(d.as("b").limit(5))
      .select(Similarity.cosine(col("a.e"), col("b.e")).as("fast"),
        Similarity.cosineHof(col("a.e"), col("b.e")).as("spec"))
      .filter(col("fast") =!= col("spec")).count()
    assert(dd === 0)
  }

  test("codegen SignLsh kernel ≡ HOF signature tree on real embeddings") {
    import graft.operators.Similarity
    val dir = "/root/testdata/sf0.001"
    // float input (knn tables 0..7) and double input (near-dup tables
    // 100..115, wider 16-bit signatures) both agree bit-for-bit with the
    // per-bit HOF fold the Scaladoc declares as the spec form
    val knn = Tables.embeddings(spark, dir).select(
      Similarity.signatures(col("embedding")).as("fast"),
      array((0 until Similarity.NumTables).map(t =>
        Similarity.signatureHof(col("embedding"), t)): _*).as("spec"))
      .filter(col("fast") =!= col("spec")).count()
    assert(knn === 0)
    val dup = Similarity.dupCorpus(spark, dir).select(
      Similarity.dupSignatures(col("e")).as("fast"),
      array((0 until Similarity.DupTables).map(t =>
        Similarity.signatureHof(col("e"), Similarity.DupTableBase + t,
          Similarity.DupBits)): _*).as("spec"))
      .filter(col("fast") =!= col("spec")).count()
    assert(dup === 0)
  }

  test("custom SpanMismatchIndices expression ≡ HOF violations column") {
    val documents = Tables.documents(spark, "/root/testdata/sf0.001")
    val docs = graft.data.Interleaved.docs(documents)
    val ref = graft.data.Interleaved.referenceSpans(documents)
      .select(col("doc_id"), col("spans").as("ref_spans"))
    val joined = docs.join(ref, Seq("doc_id"))
    val both = joined.select(
      col("doc_id"),
      graft.checks.SpanInvariant
        .violationsColumn(col("spans"), col("ref_spans")).as("hof"),
      graft.checks.SpanInvariant
        .violationsColumnFast(col("spans"), col("ref_spans")).as("fast"))
    assert(both.filter(col("hof") =!= col("fast")).count() === 0)
    assert(both.filter(size(col("fast")) > 0).count() > 0)
    // length-mismatch and null-safety edge cases
    val a = Seq(graft.model.Doc("x",
      Seq(graft.model.Span("text", null, null, 0)), "p"))
    val b = Seq(graft.model.Doc("x",
      Seq(graft.model.Span("text", null, null, 0),
        graft.model.Span("image", null, "m1", 1)), "p"))
    val j2 = spark.createDataFrame(a).join(
      spark.createDataFrame(b)
        .select(col("doc_id"), col("spans").as("ref_spans")), Seq("doc_id"))
    val r2 = j2.select(
      graft.checks.SpanInvariant
        .violationsColumnFast(col("spans"), col("ref_spans")).as("v"))
      .select(size(col("v"))).head().getInt(0)
    assert(r2 === 1) // only the missing trailing span mismatches
  }

  test("compact SpanRuleViolationCount ≡ HOF rule compiler count") {
    val documents = Tables.documents(spark, "/root/testdata/sf0.001")
    val docs = graft.data.Interleaved.docs(documents)
    for (rules <- Seq(RuleCompiler.docRules, RuleCompiler.benchRules)) {
      val both = docs.select(
        size(RuleCompiler.violations(col("spans"), rules)).as("hof"),
        graft.functions.SpanRuleViolationCount.spanRuleViolationCount(
          col("spans"), rules).as("fast"))
      assert(both.filter(col("hof") =!= col("fast")).count() === 0)
      assert(both.filter(col("fast") > 0).count() > 0)
    }
    // adversarial field values for the SPECIALIZED pattern matchers
    // (FastPatterns) vs the HOF path's rlike (the same java.util.regex
    // engine the generic path uses): line terminators exercising $'s
    // before-final-terminator rule, ASCII symbols that are NOT \p{P}
    // ($ + < = > ^ ` | ~), multi-byte letters/punctuation, and the
    // digit/lowercase run boundaries
    val adversarial = Seq(
      "m123", "m", "m1x", "m12\n", "m12\r\n", "m12\n\n", "mm", "M1",
      "abc", "a", "a1b2", "ab-", "ab\n", "A", "1abc", "",
      "x5", "x5\n", "5", "\n", "\r", " ", "  x", "\tx", "x ",
      "word,", "a$b", "a+b", "a~b", "a|b", "a=b", "wörd", "héllo",
      "a ", "a ", "a", " ", "†punct", "€sym",
      "ab\ncd", "m1 ", "m\n1")
    import spark.implicits._
    val spanDocs = adversarial.zipWithIndex.map { case (v, i) =>
      (s"p$i", Seq((Option("text"), Option(v), Option(v), Option(i))))
    }.toDF("doc_id", "raw")
      .select(col("doc_id"), transform(col("raw"), r => struct(
        r.getField("_1").as("kind"), r.getField("_2").as("text"),
        r.getField("_3").as("media_ref"),
        r.getField("_4").as("offset"))).as("spans"))
    val adv = spanDocs.select(
      size(RuleCompiler.violations(col("spans"),
        RuleCompiler.benchRules)).as("hof"),
      graft.functions.SpanRuleViolationCount.spanRuleViolationCount(
        col("spans"), RuleCompiler.benchRules).as("fast"))
    assert(adv.filter(col("hof") =!= col("fast")).count() === 0)
  }

  test("fused SpanVerdictCount ≡ spanMismatchCount + " +
      "spanRuleViolationCount on the fixture join") {
    val documents = Tables.documents(spark, "/root/testdata/sf0.001")
    val docs = graft.data.Interleaved.docs(documents)
    val ref = graft.data.Interleaved.referenceSpans(documents)
    val joined = docs.join(
      ref.select(col("doc_id"), col("spans").as("ref_spans")),
      Seq("doc_id"))
    val both = joined.select(
      graft.functions.SpanVerdictCount.spanVerdictCount(col("spans"),
        col("ref_spans"), RuleCompiler.benchRules).as("fused"),
      (graft.functions.SpanMismatchIndices.spanMismatchCount(col("spans"),
        col("ref_spans")) +
        graft.functions.SpanRuleViolationCount.spanRuleViolationCount(
          col("spans"), RuleCompiler.benchRules)).as("pair"))
    assert(both.filter(col("fused") =!= col("pair")).count() === 0)
    assert(both.filter(col("fused") > 0).count() > 0)
  }

  test("registry binds rulesets and mirrors reference error messages") {
    val resolved = Seq(
      ("d1", "https://example.org/schemas/kubernetes.json", null),
      ("d2", "https://example.org/schemas/unknown.json", null),
      ("d3", "file:///schemas/missing.yaml", null),
      ("d4", null, "No schema found in YAML file or provided as parameter"))
      .toDF("doc_id", "schema_url", "error")
    val m = Registry.bind(resolved)
      .select("doc_id", "ruleset", "error")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2)))
      .toMap
    assert(m("d1") === ("rs-k8s", null))
    assert(m("d2") ===
      (null, "HTTP request failed with status code 404"))
    assert(m("d3") ===
      (null, "NoSuchFileException: file:///schemas/missing.yaml"))
    assert(m("d4") ===
      (null, "No schema found in YAML file or provided as parameter"))
  }
}
