package graft.checks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table-scale check suites of the validation engine (north rule): span
  * invariant, uniqueness, referential, column stats, per-partition
  * verdicts. All emit Datasets; renderers live in [[graft.report]].
  */
object SpanInvariant {
  /** Per-row invariant: span-sequence equality (kind, text, media_ref,
    * order) against the reference table (BASELINE.json input_hint),
    * evaluated with arrays_zip + higher-order functions — one codegen'd
    * projection after a doc_id-keyed join.
    *
    * Scale: the join shuffles both sides on doc_id (sort-merge at 10^12
    * rows); with both tables bucketed/partitioned by doc_id in Iceberg the
    * shuffle is elided entirely. No other shuffle exists in this check.
    */
  /** The violations array for one doc given its spans and the reference
    * spans — reusable from batch and streaming plans alike.
    */
  def violationsColumn(spans: Column, refSpans: Column): Column = {
    val zipped = arrays_zip(spans.as("spans"), refSpans.as("ref_spans"))
    filter(
      transform(zipped, (p, i) => {
        val a = p.getField("spans")
        val b = p.getField("ref_spans")
        val mismatch = !(a.getField("kind") <=> b.getField("kind") &&
          a.getField("text") <=> b.getField("text") &&
          a.getField("media_ref") <=> b.getField("media_ref") &&
          a.getField("offset") <=> b.getField("offset"))
        when(a.isNull || b.isNull || mismatch, struct(
          concat(lit("/spans/"), i.cast("string")).as("pointer"),
          lit("spanSequence").as("keyword"),
          lit("span does not equal reference (kind, text, media_ref, order)")
            .as("message"),
          lit("#/properties/spans/spanSequence").as("schemaLocation")))
      }),
      v => v.isNotNull)
  }

  /** Fast path: violations via the custom [[graft.functions
    * .SpanMismatchIndices]] expression — one tight loop over the two span
    * buffers instead of an interpreted HOF tree; violation structs are
    * built only for the (rare) mismatch indices. Semantically identical
    * to [[violationsColumn]] (equivalence is spec-tested).
    */
  def violationsColumnFast(spans: Column, refSpans: Column): Column =
    transform(
      graft.functions.SpanMismatchIndices
        .spanMismatchIndices(spans, refSpans),
      i => struct(
        concat(lit("/spans/"), i.cast("string")).as("pointer"),
        lit("spanSequence").as("keyword"),
        lit("span does not equal reference (kind, text, media_ref, order)")
          .as("message"),
        lit("#/properties/spans/spanSequence").as("schemaLocation")))

  /** Annotate each doc with its violations array: doc_id-keyed join with
    * the reference, one codegen'd projection. Preserves every other input
    * column (streaming keeps `event_time`).
    *
    * The reference side is hinted `shuffle_hash`: it is the same
    * cardinality as the fact side, so the optimizer's broadcast choice
    * (driven by pre-explode size estimates) would build a huge broadcast,
    * and sort-merge pays an unneeded sort. With both tables bucketed by
    * doc_id in Iceberg the shuffle is elided entirely
    * (storage-partitioned join).
    */
  def annotate(docs: DataFrame, ref: DataFrame): DataFrame =
    docs.join(
        ref.select(col("doc_id"), col("spans").as("ref_spans"))
          .hint("shuffle_hash"),
        Seq("doc_id"), "inner")
      .withColumn("violations",
        violationsColumnFast(col("spans"), col("ref_spans")))
      .drop("ref_spans")

  def mismatches(docs: DataFrame, ref: DataFrame): DataFrame =
    annotate(docs, ref).select(col("doc_id"), col("part"), col("violations"))

  /** Per-doc verdicts: valid iff zero span mismatches. Counts via the
    * codegen'd [[graft.functions.SpanMismatchCount]] kernel — the
    * violation structs the detail path builds (through the interpreted
    * transform over mismatch indices) exist here only to be size()d,
    * so the count kernel is the same number without materializing any
    * struct (FunctionsSpec pins indices ≡ HOF violations and the count
    * is their length by construction).
    */
  def verdicts(docs: DataFrame, ref: DataFrame): DataFrame =
    docs.join(
        ref.select(col("doc_id"), col("spans").as("ref_spans"))
          .hint("shuffle_hash"),
        Seq("doc_id"), "inner")
      .select(col("doc_id"), col("part"),
        graft.functions.SpanMismatchIndices.spanMismatchCount(
          col("spans"), col("ref_spans")).as("n_violations"))
      .select(col("doc_id"), col("part"),
        (col("n_violations") === 0).as("valid"), col("n_violations"))
}

object Uniqueness {
  /** Duplicate doc_id detection — partial (map-side) count then shuffle on
    * doc_id; emits one row per duplicated key with its multiplicity
    * (SURVEY.md §2.6).
    */
  def duplicates(docs: DataFrame): DataFrame =
    docs.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
}

object Referential {
  /** Dangling media_ref detection: explode spans, keep media refs, anti-join
    * the media catalog. The catalog is a small dimension → broadcast hash
    * join (no shuffle of the fact side). At 10^12 rows with a huge catalog
    * this degrades gracefully to a shuffled hash join; hot keys are handled
    * by AQE skew splitting (enabled in [[graft.Sessions]]).
    */
  def dangling(docs: DataFrame, catalog: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(col("spans")).as("s"))
      .select(col("doc_id"), col("s.media_ref").as("media_ref"))
      .filter(col("media_ref").isNotNull)
      .join(broadcast(catalog.select("media_ref")), Seq("media_ref"),
        "left_anti")
      .groupBy(col("doc_id"), col("media_ref"))
      .agg(count(lit(1)).as("cnt"))
}

object Validation {
  /** The flagship constraint-eval pipeline: span-sequence invariant
    * (custom expression) + the full compiled keyword rule set, folded to
    * per-partition verdicts in one pass — this is the job the headline
    * docs/sec metric times.
    */
  def fullVerdicts(docs: DataFrame, ref: DataFrame): DataFrame =
    docs.join(
        ref.select(col("doc_id"), col("spans").as("ref_spans"))
          .hint("shuffle_hash"),
        Seq("doc_id"), "inner")
      .select(col("doc_id"), col("part"),
        // fused kernel: mismatch + rule counts in ONE pass over the
        // span buffers (≡ spanMismatchCount + spanRuleViolationCount,
        // FunctionsSpec)
        graft.functions.SpanVerdictCount.spanVerdictCount(
          col("spans"), col("ref_spans"),
          graft.rules.RuleCompiler.benchRules)
          .as("n_violations"))
      .withColumn("valid", col("n_violations") === 0)

  def perPartition(docs: DataFrame, ref: DataFrame): DataFrame =
    Verdicts.perPartition(fullVerdicts(docs, ref))
}

object Verdicts {
  /** Per-partition conjunction (reference A1, FilesOutput.java:47-50
    * allMatch) plus counts (A2/A3) in one aggregation pass.
    */
  def perPartition(docVerdicts: DataFrame): DataFrame =
    docVerdicts.groupBy(col("part")).agg(
      count(lit(1)).as("docs"),
      count_if(!col("valid")).as("invalid_docs"),
      sum(col("n_violations")).cast("long").as("violations"))
      .withColumn("valid", col("invalid_docs") === 0) // AND-conjunction
      .select("part", "valid", "docs", "invalid_docs", "violations")

  /** Run-level summary counts (reference A3, FilesOutputToLlm.java:41-68):
    * docs / valid / invalid / total violations in one aggregation.
    */
  def summary(docVerdicts: DataFrame): DataFrame =
    docVerdicts.agg(
      count(lit(1)).as("docs"),
      count_if(col("valid")).as("valid_docs"),
      count_if(!col("valid")).as("invalid_docs"),
      sum(col("n_violations")).cast("long").as("violations"))

  /** Run verdict: exit-code semantics (K3) — true iff every doc valid. */
  def runValid(docVerdicts: DataFrame): Boolean =
    docVerdicts.agg(count_if(!col("valid"))).head.getLong(0) == 0L
}

object Stats {
  /** One-pass exact per-column profile (count, nulls, null-rate, min, max,
    * distinct) in long format. Single aggregation → single shuffle of one
    * row per partial; at 10^12 rows this is the cheapest full-scan shape.
    * `approxDistinct` uses HLL++ (`approx_count_distinct`) — swap in
    * `countDistinct` only for oracle-exact comparisons at test scale.
    */
  def columnStats(df: DataFrame, cols: Seq[String], exact: Boolean = false)
      : DataFrame = {
    val n = count(lit(1))
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nonnull"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"${c}__distinct"))
    }
    val row = df.agg(n.as("__n"), aggs: _*)
    // unpivot the single wide row into long format via stack
    val stackArgs = cols.map { c =>
      s"'$c', `${c}__nonnull`, `${c}__min`, `${c}__max`, `${c}__distinct`"
    }.mkString(", ")
    row.selectExpr("__n",
      s"stack(${cols.size}, $stackArgs) as " +
        "(col_name, nonnull_count, min_value, max_value, distinct_count)")
      .select(
        col("col_name"),
        col("__n").as("count"),
        (col("__n") - col("nonnull_count")).as("nulls"),
        round((col("__n") - col("nonnull_count")) / col("__n"), 4)
          .as("null_rate"),
        col("min_value"), col("max_value"), col("distinct_count"))
  }
}
