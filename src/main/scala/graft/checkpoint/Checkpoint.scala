package graft.checkpoint

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.checks.{SpanInvariant, Verdicts}

/** Resumable validation runs: a checkpoint table records per-partition
  * lineage (partition, run id, counts, wall-clock), and an incremental run
  * validates only partitions without committed lineage — the batch
  * re-expression of the reference's one-shot runs plus the north rule's
  * "resumable from checkpoint with per-partition lineage + metrics".
  *
  * Storage here is a parquet directory. Commit protocol, at BATCH
  * granularity (the file-system stand-in for one Iceberg transaction per
  * batch): the batch's per-partition results are written to
  * `<dir>/results` first, then one lineage row per partition is appended
  * to `<dir>/lineage`. Lineage is the commit marker — a run killed
  * between the two writes re-processes the whole pending batch on resume
  * (results are re-written under the new run id), so partitions are never
  * marked done without stored results. On Iceberg, results + lineage land
  * in one atomic commit and snapshot-id watermarks replace the run id.
  */
object Checkpoint {

  final case class Lineage(run_id: String, part: String, docs: Long,
      invalid_docs: Long, violations: Long, completed_at_ms: Long)

  final case class ResultRow(run_id: String, part: String, valid: Boolean,
      docs: Long, invalid_docs: Long, violations: Long)

  private def lineagePath(dir: String) = s"$dir/lineage"
  private def resultsPath(dir: String) = s"$dir/results"

  def processedParts(spark: SparkSession, dir: String): Set[String] = {
    if (!Files.exists(Paths.get(lineagePath(dir)))) return Set.empty
    spark.read.parquet(lineagePath(dir))
      .select("part").distinct().collect().map(_.getString(0)).toSet
  }

  def lineage(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(lineagePath(dir))

  /** Validate only partitions not yet in the checkpoint; commit the
    * batch's results, then its lineage rows (see the commit protocol
    * above). Returns this run's per-partition verdicts READ BACK from the
    * checkpoint — stable under caller reuse (no lazy recompute of the
    * validation after commit); empty when everything is already processed.
    */
  def runIncremental(docs: DataFrame, ref: DataFrame, dir: String,
      runId: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val done = processedParts(spark, dir)
    val pending =
      if (done.isEmpty) docs
      else docs.filter(!col("part").isin(done.toSeq: _*))
    val perPart = Verdicts.perPartition(
      SpanInvariant.verdicts(pending, ref))
    val rows = perPart.collect() // one row per partition — driver-small
    if (rows.isEmpty) return perPart.limit(0)
    val now = System.currentTimeMillis()
    // 1. results (the data) ...
    rows.map { r =>
      ResultRow(runId, r.getAs[String]("part"), r.getAs[Boolean]("valid"),
        r.getAs[Long]("docs"), r.getAs[Long]("invalid_docs"),
        r.getAs[Long]("violations"))
    }.toSeq.toDF().write.mode(SaveMode.Append).parquet(resultsPath(dir))
    // 2. ... then lineage (the commit marker)
    rows.map { r =>
      Lineage(runId, r.getAs[String]("part"), r.getAs[Long]("docs"),
        r.getAs[Long]("invalid_docs"), r.getAs[Long]("violations"), now)
    }.toSeq.toDF().write.mode(SaveMode.Append).parquet(lineagePath(dir))
    spark.read.parquet(resultsPath(dir))
      .where(col("run_id") === runId)
      .select("part", "valid", "docs", "invalid_docs", "violations")
  }
}
