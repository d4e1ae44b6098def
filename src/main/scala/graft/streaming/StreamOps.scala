package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.checks.SpanInvariant

/** Structured Streaming validation: the reference's stdin one-shot
  * (YamlSchemaValidatorRunner.java:75-88) generalized to a continuous
  * source. A micro-batch of arriving docs is validated against the static
  * reference table (stream-static join — no state), violations are
  * windowed with a watermark, and per-partition running verdicts are kept
  * with mapGroupsWithState.
  */
object StreamOps {

  /** Per-doc verdicts on a stream: stream-static join + the same
    * invariant projection as batch. Stateless → append mode. Keeps
    * `event_time` for downstream watermarked aggregation.
    */
  def validateStream(docStream: DataFrame, ref: DataFrame): DataFrame =
    SpanInvariant.annotate(docStream, ref)
      .select(col("doc_id"), col("part"), col("event_time"),
        (size(col("violations")) === 0).as("valid"),
        size(col("violations")).as("n_violations"))

  /** Tumbling-window invalid-doc counts with a watermark (late data beyond
    * 10 minutes is dropped; state is bounded by watermark retention).
    * Expects an `event_time` timestamp column on the stream.
    */
  def windowedInvalidCounts(verdictStream: DataFrame): DataFrame =
    verdictStream
      .withWatermark("event_time", "10 minutes")
      .groupBy(window(col("event_time"), "1 minute"), col("part"))
      .agg(count(lit(1)).as("docs"), count_if(!col("valid"))
        .as("invalid_docs"))
      .select(col("window.start").as("win_start"), col("part"),
        col("docs"), col("invalid_docs"))

  final case class PartEvent(part: String, valid: Boolean)
  final case class PartState(part: String, docs: Long, invalidDocs: Long,
      valid: Boolean)

  /** Running per-partition conjunction over the whole stream via
    * mapGroupsWithState — the streaming analogue of the reference's
    * insertion-order accumulation into one result map.
    */
  def runningPartitionState(verdictStream: Dataset[PartEvent])
      : Dataset[PartState] = {
    import verdictStream.sparkSession.implicits._
    verdictStream
      .groupByKey(_.part)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (part: String, events: Iterator[PartEvent],
         state: GroupState[PartState]) =>
          val prev = state.getOption.getOrElse(PartState(part, 0L, 0L, true))
          var docs = prev.docs
          var bad = prev.invalidDocs
          events.foreach { e =>
            docs += 1
            if (!e.valid) bad += 1
          }
          val next = PartState(part, docs, bad, bad == 0)
          state.update(next)
          next
      }
  }

  final case class TimedDoc(doc_id: String,
      spans: Seq[graft.model.Span], part: String, event_time: Timestamp)

  final case class FpEvent(fingerprint: String, doc_id: String,
      event_time: Timestamp)
  final case class FpKeep(fingerprint: String, keep_id: String)

  /** Streaming exact dedup — the continuous analogue of
    * [[graft.operators.Dedup.exactDuplicates]]: the FIRST arrival of
    * each content fingerprint is emitted (min doc_id within its
    * micro-batch for determinism), every later duplicate is dropped by
    * per-fingerprint state. State is keyed on the 16-byte digest only
    * (text never enters state) and EXPIRES one hour past the watermark
    * via event-time timeout, so state size is bounded by the retention
    * window's distinct-fingerprint count, not the stream's lifetime —
    * the documented tradeoff is that a duplicate arriving after its
    * original's state expired is re-emitted (at 100 TB an unbounded
    * exact-dedup memory is the alternative; a compaction join against
    * the deduped sink closes the gap).
    */
  def streamingDedup(docs: Dataset[FpEvent]): Dataset[FpKeep] = {
    import docs.sparkSession.implicits._
    docs
      .withWatermark("event_time", "10 minutes")
      .groupByKey(_.fingerprint)
      .flatMapGroupsWithState[String, FpKeep](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (fp: String, events: Iterator[FpEvent],
         state: GroupState[String]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else if (state.exists) {
            Iterator.empty // duplicates of an already-emitted doc
          } else {
            val first = events.minBy(e => (e.doc_id, e.event_time.getTime))
            state.update(first.doc_id)
            state.setTimeoutTimestamp(
              first.event_time.getTime + 60L * 60 * 1000)
            Iterator.single(FpKeep(fp, first.doc_id))
          }
      }
  }
}
