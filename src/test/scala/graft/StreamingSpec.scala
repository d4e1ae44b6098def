package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.model.{Doc, Span}
import graft.streaming.StreamOps
import graft.streaming.StreamOps.{FpEvent, PartEvent, TimedDoc}

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
}
