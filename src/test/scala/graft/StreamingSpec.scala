package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.model.{Doc, Span}
import graft.operators.{Dedup, Relational}
import graft.streaming.StreamOps
import graft.streaming.StreamOps.{FpEvent, PartEvent, TextDoc, TimedDoc}

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val clean = Seq(Span("text", "hello", null, 0),
    Span("image", null, "m1", 1))
  private val bad = Seq(Span("text", "junk", null, 0),
    Span("image", null, "m1", 1))
  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  private lazy val refDf = spark.createDataFrame(Seq(
    Doc("a", clean, "p1"), Doc("b", clean, "p1"), Doc("c", clean, "p2")))

  test("stream validation: per-doc verdicts over micro-batches") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[TimedDoc]
    val out = StreamOps.validateStream(input.toDF(), refDf)
    val q = out.writeStream.format("memory").queryName("verdicts")
      .outputMode("append").start()
    try {
      input.addData(TimedDoc("a", clean, "p1", ts(0)))
      q.processAllAvailable()
      input.addData(TimedDoc("b", bad, "p1", ts(1)),
        TimedDoc("c", clean, "p2", ts(2)))
      q.processAllAvailable()
      val rows = spark.table("verdicts")
        .select("doc_id", "valid").as[(String, Boolean)].collect().toSet
      assert(rows === Set(("a", true), ("b", false), ("c", true)))
    } finally q.stop()
  }

  test("watermarked tumbling-window invalid counts") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[TimedDoc]
    val out = StreamOps.windowedInvalidCounts(
      StreamOps.validateStream(input.toDF(), refDf))
    val q = out.writeStream.format("memory").queryName("windows")
      .outputMode("update").start()
    try {
      input.addData(
        TimedDoc("a", clean, "p1", ts(0)),
        TimedDoc("b", bad, "p1", ts(0)),
        TimedDoc("c", clean, "p2", ts(1)))
      q.processAllAvailable()
      val rows = spark.table("windows")
        .select("part", "docs", "invalid_docs")
        .as[(String, Long, Long)].collect().toSet
      assert(rows === Set(("p1", 2L, 1L), ("p2", 1L, 0L)))
    } finally q.stop()
  }

  test("streaming exact dedup: first fingerprint arrival wins, " +
      "later duplicates drop (flatMapGroupsWithState)") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[FpEvent]
    val out = StreamOps.streamingDedup(input.toDS())
    val q = out.writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      // batch 1: f1 arrives twice (b then a — min doc_id wins), f2 once
      input.addData(FpEvent("f1", "b", ts(1)), FpEvent("f1", "a", ts(0)),
        FpEvent("f2", "c", ts(2)))
      q.processAllAvailable()
      // batch 2: f1 again (duplicate → dropped), f3 new
      input.addData(FpEvent("f1", "d", ts(3)), FpEvent("f3", "e", ts(4)))
      q.processAllAvailable()
      val rows = spark.table("dedup")
        .as[(String, String)].collect().toSet
      assert(rows === Set(("f1", "a"), ("f2", "c"), ("f3", "e")))
    } finally q.stop()
  }

  // near-dup stream fixture: 1, 2, 3 are mutual near-dups (a 30-word
  // base ± a 2-word suffix → pairwise J ≥ 0.87); 9 shares nothing
  private val base = (1 to 30).map(i => s"a$i").mkString(" ")
  private val other = (1 to 30).map(i => s"z$i").mkString(" ")
  private def textDocs = Map(
    1L -> base, 2L -> (base + " k1 k1"), 3L -> (base + " k2 k2"),
    9L -> other)
  private def docsDf = {
    import spark.implicits._
    textDocs.toSeq.map { case (id, t) => (id, t) }.toDF("doc_id", "text")
  }
  private def components(pairs: Set[(Long, Long)],
      nodes: Set[Long]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    nodes.map(n => n -> find(n)).toMap
  }

  test("streaming band events are bit-identical to the batch band keys") {
    // bandEvents is a pure projection — run it in batch mode on the same
    // rows the batch path sees and compare keys exactly
    val withTime = docsDf.withColumn("event_time",
      lit(ts(0)).cast("timestamp"))
    val streamed = StreamOps.bandEvents(withTime)
      .select("doc_id", "bh").as[(Long, Long)].collect().toSet
    val batch = Dedup.bandKeysOf(docsDf)
      .as[(Long, Long)].collect().toSet
    assert(streamed === batch)
    assert(streamed.size === 4 * Dedup.NumHashes / Dedup.BandSize)
  }

  test("streaming band candidates: band state persists across " +
      "micro-batches, representatives pair later arrivals, disjoint " +
      "docs never pair") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[TextDoc]
    val out = StreamOps.streamingBandCandidates(
      StreamOps.bandEvents(input.toDF()))
    val q = out.writeStream.format("memory").queryName("bandcand")
      .outputMode("append").start()
    try {
      input.addData(TextDoc(1L, textDocs(1L), ts(0)),
        TextDoc(9L, textDocs(9L), ts(0)))
      q.processAllAvailable()
      assert(spark.table("bandcand").count() === 0L,
        "disjoint docs must not pair")
      input.addData(TextDoc(2L, textDocs(2L), ts(1)),
        TextDoc(3L, textDocs(3L), ts(2)))
      q.processAllAvailable()
      val pairs = spark.table("bandcand").select("id_a", "id_b")
        .as[(Long, Long)].collect().toSet
      // 2 and 3 must both pair with the batch-1 representative 1 — the
      // state survived the micro-batch boundary
      assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)), pairs)
      assert(pairs.forall { case (a, b) => a != 9L && b != 9L }, pairs)
      // soundness: every emitted pair shares at least one batch band key
      val byDoc = Dedup.bandKeysOf(docsDf).as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      pairs.foreach { case (a, b) =>
        assert(byDoc(a).intersect(byDoc(b)).nonEmpty, s"($a,$b)")
      }
    } finally q.stop()
  }

  test("streaming near-dup end-to-end: verified pairs are " +
      "component-equal to the batch MinHash pipeline") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[TextDoc]
    val out = StreamOps.streamingNearDup(input.toDF(), docsDf)
    val q = out.writeStream.format("memory").queryName("neardup")
      .outputMode("append").start()
    try {
      input.addData(TextDoc(1L, textDocs(1L), ts(0)),
        TextDoc(9L, textDocs(9L), ts(0)))
      q.processAllAvailable()
      input.addData(TextDoc(2L, textDocs(2L), ts(1)),
        TextDoc(3L, textDocs(3L), ts(2)))
      q.processAllAvailable()
      val got = spark.table("neardup")
        .as[(Long, Long, Double)].collect().toSet
      assert(got.forall(_._3 >= 0.6), got)
      // every pair's J matches the exact batch computation
      val shingles = textDocs.view.mapValues(t =>
        t.split(" ").sliding(3).map(_.mkString(" ")).toSet).toMap
      got.foreach { case (a, b, j) =>
        val (sa, sb) = (shingles(a), shingles(b))
        val exact = sa.intersect(sb).size.toDouble / sa.union(sb).size
        assert(math.abs(j - (math.rint(exact * 10000) / 10000)) < 1e-9,
          s"($a,$b): $j vs $exact")
      }
      // representative-only pairing may skip (2,3) but must yield the
      // SAME components as the batch pipeline's verified pair set
      val batchPairs = Dedup.minhashCandidatesOf(docsDf)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val nodes = textDocs.keySet
      assert(components(got.map(p => (p._1, p._2)), nodes) ===
        components(batchPairs, nodes))
      graft.operators.Candidates.releaseAll(blocking = true)
    } finally q.stop()
  }

  test("streaming index dedup: a doc stream dedups against the " +
      "persisted corpus index with no stream state in the candidate " +
      "stage, multi-band matches collapse to one verified pair") {
    implicit val ctx = spark.sqlContext
    def words(p: String) = (1 to 30).map(i => s"$p$i").mkString(" ")
    val corpus = (1L to 5L).map(i => (i, words(s"c${i}w")))
      .toDF("doc_id", "text")
    val batch = Map(101L -> (words("c1w") + " zzz zzz"),
      102L -> (words("c2w") + " yyy yyy"), 109L -> words("x"))
    val path = Dedup.sigTablePath("stream-index-spec") + "-sidx"
    Dedup.writeSignatureTable(corpus, path)
    val store = corpus.unionAll(
      batch.toSeq.map { case (id, t) => (id, t) }.toDF("doc_id", "text"))
    val input = MemoryStream[TextDoc]
    val out = StreamOps.streamingIndexDedup(input.toDF(), store,
      spark.read.parquet(path))
    val q = out.writeStream.format("memory").queryName("sidx")
      .outputMode("append").start()
    try {
      input.addData(TextDoc(101L, batch(101L), ts(0)),
        TextDoc(109L, batch(109L), ts(0)))
      q.processAllAvailable()
      input.addData(TextDoc(102L, batch(102L), ts(1)))
      q.processAllAvailable()
      val rows = spark.table("sidx")
        .as[(Long, Long, Double)].collect()
      // near-identical pairs verify at J = 28/30; 109 matches nothing;
      // each pair appears exactly ONCE despite sharing ~30 bands
      assert(rows.map(r => (r._1, r._2)).sorted.toSeq ===
        Seq((1L, 101L), (2L, 102L)), rows.toSeq)
      rows.foreach(r => assert(r._3 === math.rint(28d / 30 * 10000) / 10000))
    } finally q.stop()
  }

  test("streaming embedding index dedup equals the batch incremental " +
      "path on the real fixture batch") {
    import graft.operators.Similarity
    implicit val ctx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val corpus = graft.Tables.embeddings(spark, dir).select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("e"))
    val path = Dedup.sigTablePath("stream-emb-spec") + "-eidx"
    Similarity.writeSignTable(corpus, path)
    // ground truth: the oracle-gated batch incremental operator over
    // the same stored index and the same increment batch
    val expected = Similarity.incrementalCosineDups(spark,
        Similarity.embIncrementBatch(spark, dir), corpus, path)._1
      .as[(Long, Long, Double)].collect().toSet
    assert(expected.nonEmpty, "fixture batch must contain near-dups")
    val batchRows = Similarity.embIncrementBatch(spark, dir)
      .as[(Long, Seq[Double])].collect()
    val input = MemoryStream[StreamOps.VecEvent]
    val out = StreamOps.streamingEmbIndexDedup(input.toDF(), corpus,
      spark.read.parquet(path))
    val q = out.writeStream.format("memory").queryName("eidx")
      .outputMode("append").start()
    try {
      // feed the batch across two micro-batches
      val (b1, b2) = batchRows.splitAt(batchRows.length / 2)
      input.addData(b1.map { case (id, e) =>
        StreamOps.VecEvent(id, e, ts(0)) }.toSeq)
      q.processAllAvailable()
      input.addData(b2.map { case (id, e) =>
        StreamOps.VecEvent(id, e, ts(1)) }.toSeq)
      q.processAllAvailable()
      val got = spark.table("eidx").as[(Long, Long, Double)]
        .collect().toSet
      assert(got === expected,
        s"stream != batch: missing ${expected.diff(got)}, " +
          s"extra ${got.diff(expected)}")
    } finally q.stop()
  }

  test("running per-partition state via mapGroupsWithState") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[PartEvent]
    val out = StreamOps.runningPartitionState(input.toDS())
    val q = out.writeStream.format("memory").queryName("state")
      .outputMode("update").start()
    try {
      input.addData(PartEvent("p1", true), PartEvent("p1", false))
      q.processAllAvailable()
      input.addData(PartEvent("p1", true), PartEvent("p2", true))
      q.processAllAvailable()
      // latest state per partition: p1 saw 3 docs 1 invalid → not valid
      val last = spark.table("state")
        .groupBy("part").agg(max(struct("docs", "invalidDocs", "valid"))
          .as("s"))
        .select(col("part"), col("s.docs"), col("s.invalidDocs"),
          col("s.valid"))
        .as[(String, Long, Long, Boolean)].collect().toSet
      assert(last === Set(("p1", 3L, 1L, false), ("p2", 1L, 0L, true)))
    } finally q.stop()
  }

  test("streaming session_window sessions equal the batch lag-break " +
      "sessions on the same events") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[StreamOps.UserEvent]
    val out = StreamOps.sessionizeStream(input.toDF(), "5 minutes",
      watermark = "1 minute")
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      val evs = Seq(
        StreamOps.UserEvent(1L, ts(0), 1.0),
        StreamOps.UserEvent(1L, ts(2), 2.0),
        StreamOps.UserEvent(1L, ts(4), 3.0),
        StreamOps.UserEvent(1L, ts(30), 4.0),
        StreamOps.UserEvent(1L, ts(31), 5.0),
        // exactly-gap-sized interval: BOTH forms must MERGE (the
        // session_window merge bound is inclusive; the batch break
        // is >)
        StreamOps.UserEvent(2L, ts(5), 6.0),
        StreamOps.UserEvent(2L, ts(10), 7.0))
      input.addData(evs: _*)
      q.processAllAvailable()
      // push the watermark far past every session close so the
      // append-mode sessions finalize
      input.addData(StreamOps.UserEvent(99L,
        Timestamp.valueOf("2024-01-01 13:00:00"), 0.0))
      q.processAllAvailable()
      val got = spark.table("sessions")
        .filter(col("user_id") =!= 99)
        .select("user_id", "n_events", "total_value")
        .as[(Long, Int, Double)].collect().toSet
      val static = evs.zipWithIndex.map { case (e, i) =>
        (e.user_id, i.toLong, e.ts, e.value)
      }.toDF("user_id", "event_id", "ts", "value")
      val batch = Relational.sessionizeOf(static, 300000000L)
        .select("user_id", "n_events", "total_value")
        .as[(Long, Int, Double)].collect().toSet
      assert(got == batch, s"stream $got vs batch $batch")
      assert(got == Set((1L, 3, 6.0), (1L, 2, 9.0), (2L, 2, 13.0)))
    } finally q.stop()
  }

  test("stream-stream attribution join: clicks match only same-user " +
      "impressions inside the window, across micro-batches") {
    implicit val ctx = spark.sqlContext
    val imps = MemoryStream[StreamOps.Impression]
    val clks = MemoryStream[StreamOps.Click]
    val out = StreamOps.attributionJoin(imps.toDF(), clks.toDF(),
      window = "5 minutes", watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      imps.addData(StreamOps.Impression(1L, 100L, ts(0)),
        StreamOps.Impression(1L, 101L, ts(20)),
        StreamOps.Impression(2L, 200L, ts(0)))
      q.processAllAvailable()
      // clicks arrive in a LATER micro-batch: the buffered impression
      // state must still match them
      clks.addData(StreamOps.Click(1L, 900L, ts(3)),   // -> imp 100
        StreamOps.Click(1L, 901L, ts(22)),              // -> imp 101
        StreamOps.Click(1L, 902L, ts(40)),              // no imp window
        StreamOps.Click(2L, 903L, ts(21)))              // wrong time
      q.processAllAvailable()
      val got = spark.table("attrib")
        .select("imp_id", "click_id").as[(Long, Long)].collect().toSet
      assert(got == Set((100L, 900L), (101L, 901L)), got.toString)
    } finally q.stop()
  }

  test("batch attribution (bucketized range join) equals the " +
      "stream-stream attribution join on the real events fixture") {
    implicit val ctx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val e = Tables.events(spark, dir).select(col("user_id"),
      col("event_id"), col("event_type"), col("ts").cast("timestamp"))
    val imps = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("imp_id"),
        col("ts").as("imp_ts")).as[StreamOps.Impression].collect()
    val clks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts")).as[StreamOps.Click].collect()
    val impS = MemoryStream[StreamOps.Impression]
    val clkS = MemoryStream[StreamOps.Click]
    val out = StreamOps.attributionJoin(impS.toDF(), clkS.toDF(),
      window = "6 hours", watermark = "12 hours")
    val q = out.writeStream.format("memory").queryName("attrib_eq")
      .outputMode("append").start()
    try {
      impS.addData(imps.toSeq: _*)
      clkS.addData(clks.toSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("attrib_eq")
        .select("user_id", "imp_id", "click_id")
        .as[(Long, Long, Long)].collect().toSet
      val batch = Relational.attribution(spark, dir)
        .select("user_id", "imp_id", "click_id")
        .as[(Long, Long, Long)].collect().toSet
      assert(batch.nonEmpty)
      assert(streamed === batch)
    } finally q.stop()
  }
}
