package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Training-mix assembly operators: deterministic per-stratum
  * downsampling (data mixing) and token-budget shard packing — the two
  * steps between "deduped, quality-filtered corpus" and "training
  * shards" in an LLM data pipeline.
  *
  * Both are built for the 100 TB shape of the problem:
  *
  *  - [[sampleMix]] is a pure scan + filter (no shuffle, no RNG): the
  *    keep decision is a function of the row alone, so retried tasks,
  *    re-partitioned inputs and incremental re-runs all make the SAME
  *    decision. Spark's `sample()` draws from a per-partition-index
  *    seeded RNG — its output CHANGES when the file layout changes,
  *    which is unacceptable for a reproducible training set.
  *  - [[packShards]] needs a global running token total — the textbook
  *    sequential loop — expressed as a two-level distributed prefix
  *    sum: per-bucket subtotals (one narrow agg), an offsets frame of
  *    ~corpus/bucketSize rows (metadata-scale: 100 TB / 64k-doc buckets
  *    is ~1.5M offset rows), and a bucket-partitioned window to finish
  *    locally. The only single-point step is the tiny offsets cumsum;
  *    document rows never pass through a global-order window (a naive
  *    `Window.orderBy(doc_id)` without partitioning pulls the entire
  *    corpus through ONE task).
  */
object Mix {

  /** Per-language keep rates in per-mille for the sampling mix —
    * deterministic stand-ins for a real mixing spec (e.g. upweight
    * code/books, downweight crawl). Langs absent from the map keep
    * [[DefaultMille]].
    */
  val Weights: Seq[(String, Int)] = Seq(
    "en" -> 1000, "zh" -> 600, "es" -> 500, "de" -> 400, "fr" -> 250)
  val DefaultMille = 100

  /** Tokens-per-shard budget for [[packShards]], in SUBWORD tokens
    * ([[TextOps.subwordCount]] — training shards are budgeted in the
    * unit the loader consumes, approximating BPE counts, not whitespace
    * words; VERDICT r5 next-round 7). Small at fixture scale (~10 docs
    * per shard) so tests exercise many boundaries; production sets
    * millions.
    */
  val ShardBudget = 2048L

  /** Order-key bucket width for the distributed prefix sum. 64 at
    * fixture scale (≥8 buckets at sf0.01) so the two-level structure is
    * actually exercised; production uses ~64k so the offsets frame
    * stays metadata-sized.
    */
  val PackBucket = 64L

  /** Deterministic [0,1000) bucket for a doc: the low 60 bits of
    * md5("mix:" ++ doc_id) mod 1000. md5 (not xxhash64) because the
    * sampling decision must be reproducible OUTSIDE Spark too — the
    * DuckDB oracle computes the identical bucket, and so can any
    * downstream auditor of the published training set.
    */
  def mixBucket(docId: Column): Column = orderKey("mix:", docId) % 1000

  /** Deterministic 60-bit order key — the "global shuffle" a training
    * run needs, made reproducible: position follows from the doc alone
    * (same md5 rationale as [[mixBucket]]), so two runs, two engines,
    * or a resumed job all read the corpus in the SAME pseudo-random
    * order.
    */
  def orderKey(tag: String, docId: Column): Column =
    conv(substring(md5(concat(lit(tag), docId.cast("string"))), 1, 15),
      16, 10).cast("long")

  /** Per-mille keep threshold for a language. */
  def keepMille(lang: Column): Column =
    Weights.foldRight(lit(DefaultMille): Column) { case ((l, m), els) =>
      when(lang === lit(l), lit(m)).otherwise(els)
    }

  /** Weighted per-language downsampling of `documents`: keep a doc iff
    * its deterministic hash bucket falls under the language's per-mille
    * rate. Scan-speed, shuffle-free, idempotent — rerunning over a
    * grown corpus keeps every previously-kept doc (the keep decision
    * never depends on the rest of the data).
    */
  def sampleMix(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    docs.select(col("doc_id"), col("lang"), col("source"),
        col("n_chars"), mixBucket(col("doc_id")).as("mix_bucket"))
      .where(col("mix_bucket") < keepMille(col("lang")))
      .orderBy(col("doc_id"))
  }

  /** Pack docs (in doc_id order) into fixed token-budget shards:
    * shard_id = floor(exclusive-prefix-sum(tokens) / budget) — the
    * streaming-packer rule, so a shard holds at most budget + one doc's
    * tokens and every shard except possibly the last is full.
    *
    * The prefix sum is two-level: (1) per-bucket token subtotals
    * (bucket = doc_id / [[PackBucket]], one partial-aggregated groupBy);
    * (2) exclusive cumsum over the BUCKET subtotals — the offsets frame
    * has corpus/bucketSize rows, so its global-order window is
    * metadata-scale work; (3) broadcast the offsets back and finish
    * with a window PARTITIONED by bucket (parallel, each partition
    * ≤ bucketSize rows). Doc rows are never globally sorted and never
    * pass through a single-task window.
    */
  def packShards(s: SparkSession, dir: String,
      budget: Long = ShardBudget, bucketSize: Long = PackBucket)
      : DataFrame = {
    val docs = Tables.documents(s, dir)
    // stage the token count once (HOF/regex args get no CSE); the count
    // is the merge-vocab subword segmentation — the unit shard budgets
    // actually mean (a whitespace count under-budgets long-word text)
    val toks = docs.select(col("doc_id"),
      TextOps.subwordCount(col("text")).cast("long").as("toks"),
      (col("doc_id") / lit(bucketSize)).cast("long").as("bucket"))

    val perBucket = toks.groupBy(col("bucket"))
      .agg(sum(col("toks")).as("bucket_toks"))
    // global-order window over BUCKET subtotals only: ~N/bucketSize
    // rows — this is the one deliberately-serial step, sized to stay
    // metadata-scale at any corpus size
    val offsets = perBucket.select(col("bucket"),
      (coalesce(sum(col("bucket_toks"))
          .over(Window.orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .as("bucket_offset"))

    val local = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks.join(broadcast(offsets), Seq("bucket"))
      .select(col("doc_id"), col("toks"),
        (col("bucket_offset") + sum(col("toks")).over(local) -
          col("toks")).as("prefix_toks"))
      .select(col("doc_id"), col("toks"),
        // integer division, not floor(double-quotient): with an
        // arbitrary budget a correctly-rounded double quotient landing
        // exactly on an integer can misassign the boundary doc by one
        // shard (ADVICE r5); prefix sums are non-negative so `div` (a
        // long integral division) IS the floor, exact at any budget
        expr(s"prefix_toks div ${budget}L").as("shard_id"))
      .orderBy(col("doc_id"))
  }

  /** Write training shards: the [[packShards]] assignment joined back
    * to the text, written as ONE JSONL directory per shard (the format
    * training loaders actually consume) plus a parquet manifest of
    * per-shard doc/token counts. `repartition(shard_id)` co-locates a
    * shard's docs into one task's files; the manifest is a
    * metadata-scale agg (one row per shard). Returns the manifest.
    */
  def writeShards(s: SparkSession, dir: String, out: String): DataFrame = {
    val packed = packShards(s, dir)
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    packed.join(docs, Seq("doc_id"))
      .select(col("shard_id"), col("doc_id"), col("toks"), col("text"))
      .repartition(col("shard_id"))
      .write.mode("overwrite").partitionBy("shard_id")
      .json(s"$out/data")
    val manifest = packed.groupBy(col("shard_id"))
      .agg(count(lit(1)).as("docs"), sum(col("toks")).as("tokens"))
      .orderBy(col("shard_id"))
    manifest.write.mode("overwrite").parquet(s"$out/manifest")
    manifest
  }

  /** Order-key buckets for the two-level position assignment. The key
    * is uniform on [0, 2^60), so dividing by a fixed width yields
    * near-equal buckets with NO data statistics — unlike
    * `repartitionByRange`, which samples the data to find split points
    * (a job in itself at 100 TB) and whose splits move when the corpus
    * grows.
    */
  val OrderBuckets = 64L
  private val OrderWidth = (1L << 60) / OrderBuckets

  /** Assign every doc its global position in the deterministic
    * training order — distributed ROW_NUMBER() OVER (ORDER BY okey).
    *
    * The naive form is a single-task global-order window over all doc
    * rows. This is the same two-level shape as [[packShards]]: bucket
    * counts (one narrow agg), an exclusive cumsum over the ~[[OrderBuckets]]
    * bucket subtotals (metadata-scale), then a bucket-PARTITIONED
    * row_number finished in parallel — the hash key is uniform by
    * construction, so the buckets are balanced without sampling the
    * data. Doc rows shuffle ONCE (on `bucket`, for the local window).
    */
  def trainOrder(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val keyed = docs.select(col("doc_id"), col("lang"),
      orderKey("ord:", col("doc_id")).as("okey"))
      .withColumn("obucket", (col("okey") / lit(OrderWidth)).cast("long"))

    val perBucket = keyed.groupBy(col("obucket")).agg(count(lit(1)).as("n"))
    val offsets = perBucket.select(col("obucket"),
      coalesce(sum(col("n")).over(Window.orderBy(col("obucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
        .as("bucket_start"))

    val local = Window.partitionBy(col("obucket"))
      .orderBy(col("okey"), col("doc_id"))
    keyed.join(broadcast(offsets), Seq("obucket"))
      .select(col("doc_id"), col("lang"),
        (col("bucket_start") + row_number().over(local) - 1).as("pos"))
      .orderBy(col("pos"))
  }

  /** Per-source repeat factors for [[repeatMix]] as (whole copies,
    * extra-copy per-mille): src0 ×2.5, src1 ×3, src5 ×1.25, src7 ×0.3
    * (a pure downsample — base 0), everything else ×1. The fraction is
    * an integer per-mille, not a double, so the fractional-copy
    * decision is exact arithmetic in ANY engine — no float-threshold
    * ambiguity between Spark and an auditor recomputing the mix.
    */
  val Epochs: Seq[(String, (Int, Int))] = Seq(
    "src0" -> (2, 500), "src1" -> (3, 0), "src5" -> (1, 250),
    "src7" -> (0, 300))
  val DefaultEpoch: (Int, Int) = (1, 0)

  /** Copies of a doc in the epoch-expanded mix: whole copies plus one
    * fractional copy iff the doc's md5 per-mille bucket clears the
    * source's fraction — the deterministic form of "repeat books 2.5
    * epochs": exactly the expected 2.5× volume, and WHICH docs get the
    * third copy is a pure function of the doc (reproducible across
    * retries, engines, and incremental re-runs).
    */
  def epochCopies(source: Column, docId: Column): Column = {
    val bucket = orderKey("rep:", docId) % 1000
    val base = Epochs.foldRight(lit(DefaultEpoch._1): Column) {
      case ((s, (b, _)), els) => when(source === s, b).otherwise(els)
    }
    val mille = Epochs.foldRight(lit(DefaultEpoch._2): Column) {
      case ((s, (_, m)), els) => when(source === s, m).otherwise(els)
    }
    (base + when(bucket < mille, 1).otherwise(0)).cast("int")
  }

  /** Epoch repetition / source up-sampling: emit each doc `copies`
    * times (copy = 1..copies), where copies follows the per-source
    * repeat factor — how a pipeline up-weights high-quality sources
    * (books ×3) and down-weights crawl without materializing N corpus
    * copies by hand. Scan-speed compute-then-explode: no shuffle, no
    * join, no RNG; the explode multiplies only (doc_id, source, copy)
    * scalar rows, never text.
    */
  def repeatMix(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        epochCopies(col("source"), col("doc_id")).as("copies"))
      .where(col("copies") > 0)
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(1), col("copies"))).as("copy"))
      .orderBy(col("doc_id"), col("copy"))

  /** Fraction of the corpus [[qualityGate]] keeps. */
  val GateFrac = 0.6

  /** Exact corpus-percentile quality filter: keep the top `frac` of
    * docs by (quality_score DESC, hash-order, doc_id) — "keep the best
    * 60%", exactly, not in expectation. A rate threshold can't do this
    * (score distribution is unknown) and `ORDER BY score LIMIT K` at
    * K = 60% of a 100 TB corpus is not driver-safe.
    *
    * Same two-level shape as [[trainOrder]], with the cell key
    * extended to (score, key-bucket): per-cell counts (one narrow
    * agg), an exclusive cumsum over cells ordered (score DESC, bucket)
    * — metadata-scale: distinct-rounded-scores × [[OrderBuckets]] rows
    * — then a cell-partitioned row_number. Doc rows never pass a
    * global-order window, and within a score level the hash order
    * spreads ties across buckets, so a 30%-of-corpus score plateau
    * cannot single-task (the [[stratifiedSample]] argument).
    */
  def qualityGate(s: SparkSession, dir: String,
      frac: Double = GateFrac): DataFrame = {
    val scored = TextOps.qualityScoresOf(Tables.documents(s, dir))
    val keyed = scored.select(col("doc_id"), col("quality_score"),
      orderKey("gate:", col("doc_id")).as("okey"))
      .withColumn("qbucket", (col("okey") / lit(OrderWidth)).cast("long"))

    val perCell = keyed.groupBy(col("quality_score"), col("qbucket"))
      .agg(count(lit(1)).as("n"))
    val cellW = Window.orderBy(col("quality_score").desc, col("qbucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val starts = perCell.select(col("quality_score"), col("qbucket"),
      coalesce(sum(col("n")).over(cellW), lit(0L)).as("cell_start"))
    val tot = perCell.agg(sum(col("n")).as("total"))

    val local = Window.partitionBy(col("quality_score"), col("qbucket"))
      .orderBy(col("okey"), col("doc_id"))
    keyed.join(broadcast(starts), Seq("quality_score", "qbucket"))
      .crossJoin(broadcast(tot))
      .withColumn("quality_rank",
        col("cell_start") + row_number().over(local))
      .where(col("quality_rank") <= floor(col("total") * lit(frac)))
      .select(col("doc_id"), col("quality_score"), col("quality_rank"))
      .orderBy(col("quality_rank"))
  }

  /** Docs to keep per stratum in [[stratifiedSample]] — exact-count
    * sampling (e.g. "exactly 40k held-out docs per language"), where
    * [[sampleMix]]'s rate-based keep only hits the target in
    * expectation.
    */
  val StratumN = 40

  /** Exactly-N-per-stratum deterministic sample. The textbook form —
    * ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hash) <= N — drags
    * an ENTIRE stratum through one task (a stratum can be 30% of a
    * 100 TB corpus). Here the window partitions by (lang, key-bucket),
    * so no task ever sees more than ~stratum/[[OrderBuckets]] rows:
    * a per-(lang,bucket) row_number plus the count of the stratum's
    * earlier buckets (metadata-scale cumsum, broadcast back) is the
    * same global per-stratum rank, computed with bounded partitions.
    */
  def stratifiedSample(s: SparkSession, dir: String,
      n: Int = StratumN): DataFrame = {
    val docs = Tables.documents(s, dir)
    val keyed = docs.select(col("doc_id"), col("lang"), col("source"),
      orderKey("strat:", col("doc_id")).as("skey"))
      .withColumn("sbucket", (col("skey") / lit(OrderWidth)).cast("long"))

    val perCell = keyed.groupBy(col("lang"), col("sbucket"))
      .agg(count(lit(1)).as("n"))
    // per-stratum exclusive cumsum across its buckets: one row per
    // (lang, bucket) cell — metadata-scale at any corpus size
    val starts = perCell.select(col("lang"), col("sbucket"),
      coalesce(sum(col("n")).over(Window.partitionBy(col("lang"))
          .orderBy(col("sbucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
        .as("cell_start"))

    val cell = Window.partitionBy(col("lang"), col("sbucket"))
      .orderBy(col("skey"), col("doc_id"))
    keyed.join(broadcast(starts), Seq("lang", "sbucket"))
      .withColumn("stratum_rank",
        col("cell_start") + row_number().over(cell))
      .where(col("stratum_rank") <= lit(n))
      .select(col("doc_id"), col("lang"), col("source"),
        col("stratum_rank"))
      .orderBy(col("lang"), col("stratum_rank"))
  }
}
