package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Similarity search over the embeddings table (`vec_id, embedding:
  * array<float>, label`): brute-force cosine top-k as the exactness
  * baseline, and a bit-sampling LSH-bucketed variant as the scale path.
  *
  * Scale notes: brute force is queries × corpus — right only when one side
  * broadcasts. The LSH variant shuffles on a small signature key, so the
  * corpus streams once; its recall is verified against brute force in the
  * test suite.
  */
object Similarity {

  /** Dot product in double precision via zip_with + aggregate fold —
    * deterministic left-to-right accumulation, fully codegen'd.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Query set: every 50th vector. */
  private def queries(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))

  /** Brute-force cosine top-k: broadcast the (small) query set against the
    * corpus, rank per query on the rounded similarity with a deterministic
    * vec_id tie-break.
    */
  def knnBrute(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val corpus = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"))
    val scored = corpus.crossJoin(broadcast(queries(s, dir)))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(cosine(col("qe"), col("embedding")), 4).as("sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("qid"), col("rank"))
  }

  /** Bit-sampling LSH bucket: sign bits of the first 8 dimensions. A
    * deterministic random-hyperplane signature (axis-aligned planes).
    */
  def signBucket(e: Column): Column =
    concat((1 to 8).map(i =>
      when(element_at(e, i) >= 0, lit("1")).otherwise(lit("0"))): _*)

  /** ANN via LSH buckets: candidates share the query's 8-bit sign
    * signature; exact cosine re-rank within the bucket, top-1 per query.
    */
  def knnLsh(s: SparkSession, dir: String): DataFrame = {
    val corpus = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"),
        signBucket(col("embedding")).as("bucket"))
    val q = queries(s, dir)
      .withColumn("bucket", signBucket(col("qe")))
    val scored = corpus.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(cosine(col("qe"), col("embedding")), 4).as("sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 1)
      .orderBy(col("qid"))
  }
}
