package graft.checks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Distribution-drift checks between two snapshots: PSI (population
  * stability index) and KS (max CDF distance) over fixed histogram
  * buckets. One groupBy over the fact table + one tiny window over the
  * bucket grid — at 10^12 rows the heavy pass is a single partial-agg
  * shuffle of (group, snapshot, bucket) counts.
  *
  * The histogram route (vs t-digest) keeps the oracle exact; a sketch
  * variant can slot into the same bucket-grid contract.
  */
object Drift {
  val Eps = 1e-6

  /** PSI + KS per event_type between the first and second half of the
    * events table's time range (snapshot A: day <= 15, B: after), over 20
    * equal-width buckets of `value`.
    */
  def eventValueDrift(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_type"),
        when(dayofmonth(col("ts")) <= 15, "A").otherwise("B").as("snap"),
        least(floor(col("value") / 20).cast("int"), lit(19)).as("bucket"))
    // ONE partial-aggregated pass over the fact rows straight to the
    // (event_type, bucket) grid with both snapshots' counts as
    // conditional aggregates; the per-snapshot totals that the former
    // counts→totals→join chain derived with two more shuffles are a
    // window sum over the (tiny) grid itself. pa/pb are the identical
    // cnt/tot divisions of the same integer counts.
    val grid = ev.groupBy(col("event_type"), col("bucket"))
      .agg(count(when(col("snap") === "A", 1)).as("ca"),
        count(when(col("snap") === "B", 1)).as("cb"))
    val wt = Window.partitionBy(col("event_type"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cdf = grid
      .withColumn("pa",
        coalesce(col("ca") / sum(col("ca")).over(wt), lit(0.0)))
      .withColumn("pb",
        coalesce(col("cb") / sum(col("cb")).over(wt), lit(0.0)))
      .withColumn("cdfa", sum(col("pa")).over(w))
      .withColumn("cdfb", sum(col("pb")).over(w))
      .withColumn("pa_s", greatest(col("pa"), lit(Eps)))
      .withColumn("pb_s", greatest(col("pb"), lit(Eps)))
    cdf.groupBy(col("event_type"))
      .agg(
        round(sum((col("pa_s") - col("pb_s")) *
          log(col("pa_s") / col("pb_s"))), 4).as("psi"),
        round(max(abs(col("cdfa") - col("cdfb"))), 4).as("ks"))
      .orderBy(col("event_type"))
  }
}
