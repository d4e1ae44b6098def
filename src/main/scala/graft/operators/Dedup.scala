package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deduplication suite for training-data pipelines: exact (hash-groupBy),
  * n-gram Jaccard (the exact near-dup baseline), MinHash+LSH (the scale
  * path: shingle → minhash → band → bucket-join), and SimHash.
  *
  * Scale notes (100 TB): exact dedup is one hash aggregation on a 16-byte
  * digest (shuffle of digests only, never text). Jaccard-by-self-join is
  * quadratic in shingle collisions — it is the *oracle* for the MinHash
  * path, which shuffles only (band, bucket-hash) keys and verifies exact
  * Jaccard on the candidate pairs alone.
  */
object Dedup {

  /** Fixture corpus: documents ∪ exact duplicates (doc_id%50==0, re-keyed
    * +1_000_000) ∪ near duplicates (doc_id%50==25, two tokens appended,
    * re-keyed +2_000_000). Deterministic; mirrored in the DuckDB oracle.
    */
  def corpus(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val exact = d.filter(col("doc_id") % 50 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val near = d.filter(col("doc_id") % 50 === 25)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        concat(col("text"), lit(" zzz zzz")).as("text"))
    d.unionAll(exact).unionAll(near)
  }

  /** Exact dedup: md5 fingerprint → hash-groupBy → duplicate groups with
    * multiplicity and the id to keep (min). Only digests shuffle.
    */
  def exactDuplicates(s: SparkSession, dir: String): DataFrame =
    corpus(s, dir)
      .select(md5(col("text")).as("fingerprint"), col("doc_id"))
      .groupBy(col("fingerprint"))
      .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("keep_id"))
      .filter(col("cnt") > 1)
      .orderBy(col("fingerprint"))

  /** Word 3-gram shingles, distinct per document, from a MATERIALIZED
    * words array. Passing `split(text)` in directly is a trap: the HOF
    * path does no common-subexpression elimination, so the split would
    * re-run for every element_at — stage the words behind an exchange
    * (see [[corpusWords]]) so it evaluates once per row.
    */
  def shinglesOf(w: Column): Column = {
    val n = size(w)
    array_distinct(when(n >= 3,
      transform(sequence(lit(1), n - 2), i => concat_ws(" ",
        element_at(w, i), element_at(w, i + 1), element_at(w, i + 2))))
      .otherwise(array().cast("array<string>")))
  }

  /** Corpus with the words array materialized behind a repartition
    * exchange: parallelizes the shingle/signature projections across all
    * cores and guarantees split() runs once per row.
    */
  def corpusWords(s: SparkSession, dir: String): DataFrame =
    corpus(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .repartition(s.sparkContext.defaultParallelism)

  /** Exact n-gram Jaccard near-dup pairs (threshold 0.6): explode distinct
    * shingles, self-join on shingle, |A∩B| per pair, Jaccard from set
    * sizes. The exactness oracle for [[minhashCandidates]].
    */
  def jaccardPairs(s: SparkSession, dir: String,
      threshold: Double = 0.6): DataFrame = {
    val sh = corpusWords(s, dir)
      .select(col("doc_id"), explode(shinglesOf(col("w"))).as("sh"))
    val sizes = sh.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("sz"))
    val shared = sh.as("a")
      .join(sh.as("b"), col("a.sh") === col("b.sh") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.select(col("doc_id").as("id_a"), col("sz").as("sz_a")),
        Seq("id_a"))
      .join(sizes.select(col("doc_id").as("id_b"), col("sz").as("sz_b")),
        Seq("id_b"))
      .withColumn("jaccard", round(col("shared") /
        (col("sz_a") + col("sz_b") - col("shared")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Number of MinHash functions and LSH band width. 16 hashes in 4 bands
    * of 4 → catches Jaccard ≳ 0.5 with high probability.
    */
  val NumHashes = 16
  val BandSize = 4

  /** MinHash signature matrix: min over shingles of xxhash64(shingle, seed)
    * per seed — computed in one projection over the shingle array (no
    * explode, no shuffle).
    */
  def minhashSignature(sh: Column): Column =
    array((0 until NumHashes).map { seed =>
      array_min(transform(sh, x => xxhash64(lit(seed), x)))
    }: _*)

  /** LSH candidate pairs: band the signature, shuffle on (band, hash of
    * band rows), pair up within buckets, then verify with exact Jaccard.
    * This is the 100 TB near-dup path: shuffle volume is
    * docs × bands × 16 bytes, independent of text size.
    */
  def minhashCandidates(s: SparkSession, dir: String,
      threshold: Double = 0.6): DataFrame = {
    // materialize signatures once: the signature projection (16 minhashes
    // over ~100 shingles/doc) must not be recomputed on both sides of the
    // self-join — persist() is the in-session stand-in for the signature
    // table a production pipeline writes out.
    val docs = corpusWords(s, dir)
      .select(col("doc_id"), shinglesOf(col("w")).as("sh"))
      .repartition(s.sparkContext.defaultParallelism) // materialize shingles
      .select(col("doc_id"), minhashSignature(col("sh")).as("sig"))
    val bandHashes = array((0 until NumHashes / BandSize).map { b =>
      xxhash64((lit(b) +: (0 until BandSize).map(j =>
        element_at(col("sig"), b * BandSize + j + 1))): _*)
    }: _*)
    val bands = docs
      .select(col("doc_id"), posexplode(bandHashes).as(Seq("band", "bh")))
      .persist()
    // candidate ids from bucket collisions — ids only, no text shuffled
    val cand = bands.as("a")
      .join(bands.as("b"), col("a.band") === col("b.band") &&
        col("a.bh") === col("b.bh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    // exact verify on candidates only: re-attach shingle sets by id
    val sh = corpusWords(s, dir)
      .select(col("doc_id"), shinglesOf(col("w")).as("sh"))
    val verified = cand
      .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")),
        Seq("id_a"))
      .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")),
        Seq("id_b"))
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))) /
          size(array_union(col("sh_a"), col("sh_b"))), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
    verified
  }

  /** 32-bit SimHash vote vector from xxhash64 token hashes: one
    * aggregate() fold per document, accumulator = 32 per-bit majority
    * votes (bit positions unrolled statically — codegen-friendly).
    */
  def simhashVotes(w: Column): Column = {
    val tokens = array_distinct(w)
    val hashes = transform(tokens, t => xxhash64(t))
    aggregate(hashes,
      array_repeat(lit(0), 32),
      (acc, h) => array((0 until 32).map { bit =>
        element_at(acc, bit + 1) +
          when(shiftright(h, bit).bitwiseAND(1) === 1, 1).otherwise(-1)
      }: _*))
  }

  /** Collapse the vote vector to the 32-bit SimHash value. */
  def simhashFromVotes(votes: Column): Column =
    (0 until 32).map { bit =>
      when(element_at(votes, bit + 1) > 0, lit(1L << bit)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** SimHash near-dup candidates: same 16-bit half as the block key (two
    * blocks → any pair within Hamming distance such that one half matches
    * is caught), verified by exact Hamming distance ≤ maxDist.
    */
  def simhashPairs(s: SparkSession, dir: String, maxDist: Int = 6)
      : DataFrame = {
    val docs = corpusWords(s, dir)
      .select(col("doc_id"), simhashVotes(col("w")).as("votes"))
      .repartition(s.sparkContext.defaultParallelism) // materialize votes
      .select(col("doc_id"), simhashFromVotes(col("votes")).as("sh"))
    val blocks = docs.select(col("doc_id"), col("sh"),
      posexplode(array(col("sh").bitwiseAND(0xFFFF),
        shiftright(col("sh"), 16))).as(Seq("blk", "key")))
    val ham = (a: Column, b: Column) =>
      bit_count(a.bitwiseXOR(b)).cast("int")
    blocks.as("a")
      .join(blocks.as("b"), col("a.blk") === col("b.blk") &&
        col("a.key") === col("b.key") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .distinct()
      .withColumn("hamming", ham(col("sh_a"), col("sh_b")))
      .filter(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .orderBy(col("id_a"), col("id_b"))
  }
}
