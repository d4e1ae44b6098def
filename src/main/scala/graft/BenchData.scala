package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.data.Interleaved

/** Materializes the scaled interleaved-docs table (and its clean
  * reference) to parquet once, so throughput measurements time the
  * validation job reading from storage — the north-rule metric is
  * constraint-eval throughput, not synthetic-data generation speed.
  */
object BenchData {
  def ensure(spark: SparkSession, sfDir: String, replicas: Int)
      : (String, String) = {
    val tag = sfDir.replaceAll("[^a-zA-Z0-9.]", "_")
    val base = s"/tmp/graft_bench/${tag}_x$replicas"
    val docsPath = s"$base/docs"
    val refPath = s"$base/ref"
    if (!Files.exists(Paths.get(s"$base/_done"))) {
      val documents = Tables.documents(spark, sfDir)
      Interleaved.docsScaled(documents, replicas)
        .write.mode("overwrite").parquet(docsPath)
      Interleaved.docsScaled(documents, replicas, injected = false)
        .write.mode("overwrite").parquet(refPath)
      Files.createDirectories(Paths.get(base))
      Files.write(Paths.get(s"$base/_done"), Array.emptyByteArray)
    }
    (docsPath, refPath)
  }
}
