package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

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
}
