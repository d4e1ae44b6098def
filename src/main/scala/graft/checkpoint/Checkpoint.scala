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
  * Storage here is a parquet directory (appends are new files, and a
  * partition is only visible once its lineage row is written — written
  * AFTER its results, so a killed run re-processes at most the in-flight
  * partition). On Iceberg the same contract is one atomic transaction per
  * batch (results + lineage in one commit) and snapshot-id watermarks
  * replace the run id.
  */
object Checkpoint {

  final case class Lineage(run_id: String, part: String, docs: Long,
      invalid_docs: Long, violations: Long, completed_at_ms: Long)

  private def lineagePath(dir: String) = s"$dir/lineage"

  def processedParts(spark: SparkSession, dir: String): Set[String] = {
    if (!Files.exists(Paths.get(lineagePath(dir)))) return Set.empty
    spark.read.parquet(lineagePath(dir))
      .select("part").distinct().collect().map(_.getString(0)).toSet
  }

  def lineage(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(lineagePath(dir))

  /** Validate only partitions not yet in the checkpoint; append one
    * lineage row per completed partition. Returns this run's per-partition
    * verdicts (empty when everything is already processed).
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
    if (rows.nonEmpty) {
      val now = System.currentTimeMillis()
      val lineageRows = rows.map { r =>
        Lineage(runId, r.getAs[String]("part"), r.getAs[Long]("docs"),
          r.getAs[Long]("invalid_docs"), r.getAs[Long]("violations"), now)
      }.toSeq
      lineageRows.toDF().write.mode(SaveMode.Append)
        .parquet(lineagePath(dir))
    }
    perPart
  }
}
