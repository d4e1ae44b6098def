package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.data.Interleaved

/** Multimodal columns: media payloads are opaque `binary` columns with a
  * typed metadata struct; decode/feature-extract runs as a per-partition
  * batch pass (the Spark-side plumbing — schema, partitioning, batch
  * shape — is real; the codec itself is a deterministic STUB because no
  * image/audio libraries ship in this container).
  */
object Multimodal {

  final case class MediaRow(media_ref: String, payload: Array[Byte],
      width: Int, height: Int)
  final case class MediaFeature(media_ref: String, n_bytes: Int,
      width: Int, height: Int, brightness: Double)

  /** Synthesize the media table for every ref the spans can mention
    * (m0..m49): payload = md5(media_ref) bytes — a deterministic 16-byte
    * stand-in for image bytes — plus typed width/height metadata derived
    * from the ref. Pure Column expressions, oracle-mirrorable.
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    s.range(0, 50).select(
      concat(lit("m"), col("id").cast("string")).as("media_ref"),
      unhex(md5(concat(lit("m"), col("id").cast("string")))).as("payload"),
      (lit(32) + (col("id") % 8).cast("int") * 16).as("width"),
      (lit(32) + (col("id") % 5).cast("int") * 16).as("height"))

  /** Media feature projection (oracle-checkable): payload size and hex,
    * typed metadata. The binary column round-trips through parquet.
    */
  def mediaFeatures(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir).select(
      col("media_ref"),
      length(col("payload")).as("n_bytes"),
      lower(hex(col("payload"))).as("payload_hex"),
      col("width"), col("height"))
      .orderBy(col("media_ref"))

  /** Decode/feature-extract pass over binary payloads, batched per
    * partition the way a real codec (libjpeg/ffmpeg) would run. The
    * decode itself is STUBBED with a deterministic fake (mean byte value
    * as "brightness"); swap `decodeOne` for a real codec binding — the
    * Spark plumbing (typed Dataset in/out, per-partition batching, no
    * driver collection) is what carries at 100 TB.
    */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map(decodeOne) // real impl: reuse one codec context per batch
    }
  }

  private def decodeOne(m: MediaRow): MediaFeature = {
    // STUB decode: deterministic "brightness" = mean unsigned byte value.
    val sum = m.payload.foldLeft(0L)((acc, b) => acc + (b & 0xff))
    MediaFeature(m.media_ref, m.payload.length, m.width, m.height,
      math.round(sum.toDouble / m.payload.length * 10000).toDouble / 10000)
  }

  /** Resize box: fit within MaxDim × MaxDim, never upscale. */
  val MaxDim = 64

  /** Resize plan — the metadata math (scale factor, output dims) is pure
    * Column arithmetic (IEEE doubles, identical in the DuckDB oracle);
    * the payload re-encode itself is the per-partition stubbed batch
    * pass [[resizePayloads]], same split as decode/feature-extract.
    */
  def resizePlan(s: SparkSession, dir: String): DataFrame = {
    val w = col("width").cast("double")
    val h = col("height").cast("double")
    val scale = least(lit(1.0), lit(MaxDim.toDouble) / w,
      lit(MaxDim.toDouble) / h)
    mediaTable(s, dir).select(
      col("media_ref"), col("width"), col("height"),
      greatest(lit(1), floor(w * scale)).cast("int").as("out_w"),
      greatest(lit(1), floor(h * scale)).cast("int").as("out_h"))
      .orderBy(col("media_ref"))
  }

  final case class ResizedMedia(media_ref: String, out_w: Int, out_h: Int,
      payload: Array[Byte])

  /** STUB re-encode, batched per partition like [[decodeFeatures]]: the
    * fake "resized" payload is a deterministic digest of (payload, dims)
    * — swap for a real scaler binding; the typed Dataset in/out and
    * per-partition batching are the production plumbing.
    */
  def resizePayloads(resized: DataFrame, media: DataFrame)
      : Dataset[ResizedMedia] = {
    val spark = resized.sparkSession
    import spark.implicits._
    resized.join(media.select(col("media_ref"), col("payload")),
        Seq("media_ref"))
      .select(col("media_ref"), col("out_w"), col("out_h"), col("payload"))
      .as[ResizedMedia].mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          md.reset()
          md.update(r.payload)
          md.update(s"${r.out_w}x${r.out_h}".getBytes)
          r.copy(payload = md.digest())
        }
      }
  }

  /** Frame sampling for video-like payloads: a deterministic frame count
    * from the typed metadata, uniform-stride sampling down to ≤ 4
    * frames, one row per sampled frame keyed by a frame digest (what a
    * real pipeline ships to the captioning/embedding stage). Pure
    * Columns — compute-then-explode at scan speed, oracle-mirrored.
    */
  def frameSample(s: SparkSession, dir: String): DataFrame = {
    val nFrames = floor((col("width") + col("height")) / lit(16))
      .cast("int")
    mediaTable(s, dir)
      .select(col("media_ref"), nFrames.as("n_frames"),
        ceil(nFrames / lit(4.0)).cast("int").as("stride"))
      .select(col("media_ref"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, col("stride")))
          .as("frame_idx"))
      .withColumn("frame_hash",
        md5(concat(col("media_ref"), lit("-"),
          col("frame_idx").cast("string"))))
      .orderBy(col("media_ref"), col("frame_idx"))
  }

  /** Join media features back onto the interleaved docs: per-doc media
    * metadata rollup (images only, broadcast dim join — the pattern for
    * joining a media-object store index to span tables).
    */
  def docMediaProfile(s: SparkSession, dir: String): DataFrame = {
    val docs = Interleaved.docs(Tables.documents(s, dir))
    val media = mediaTable(s, dir)
      .select(col("media_ref"), col("width"), col("height"))
    docs
      .select(col("doc_id"), explode(col("spans")).as("sp"))
      .filter(col("sp.kind") === "image" && col("sp.media_ref").isNotNull)
      .select(col("doc_id"), col("sp.media_ref").as("media_ref"))
      .join(broadcast(media), Seq("media_ref"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("width") * col("height")).as("total_pixels"))
      .orderBy(col("doc_id"))
  }
}
