package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads plus typed metadata, with decode / feature-extract / resize /
  * frame-sample stages as typed `mapPartitions` programs (the Scala
  * analog of `mapInPandas` batch UDFs).
  *
  * The DECODE STEP IS A STUB: the image/audio codecs are not present in
  * this container, so [[decodeStub]] produces a deterministic fake
  * decode (dimensions/duration derived from the payload hash). The
  * Spark-side plumbing — schema, batch iteration shape, partitioning,
  * feature schema — is real and tested (OpsSpec); swapping
  * [[decodeStub]] for a codec call is the only change needed for real
  * media.
  *
  * Scale notes: payloads never leave their partition (no shuffle in
  * decode/extract); `repartition(n)` upstream sizes partitions so one
  * batch of payloads fits in executor memory — the knob that matters
  * when payload rows are MBs, not bytes.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      media_type: String, // image | audio | video
      payload: Array[Byte],
      source: String)

  final case class DecodedMedia(
      media_id: Long,
      media_type: String,
      byte_len: Long,
      sha256: String,
      width: Int, // stub-decoded
      height: Int,
      duration_ms: Long)

  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      byte_len: Long,
      sha256: String,
      feature: Array[Float]) // stub embedding

  /** STUB decode — deterministic fake: dimensions/duration derived from
    * the payload digest. Replace with a codec call for real media. */
  def decodeStub(id: Long, mediaType: String,
      payload: Array[Byte]): DecodedMedia = {
    val digest = MessageDigest.getInstance("SHA-256").digest(payload)
    val hex = digest.map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(hex.substring(0, 8), 16)
    DecodedMedia(id, mediaType, payload.length.toLong, hex,
      width = (h % 1920).toInt + 1, height = ((h >> 8) % 1080).toInt + 1,
      duration_ms = if (mediaType == "image") 0L else (h % 600000))
  }

  /** Batch decode over partitions — the mapPartitions shape keeps one
    * codec context per partition, not per row. */
  def decode(rows: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      // per-partition init would open the codec once, here a no-op
      it.map(r => decodeStub(r.media_id, r.media_type, r.payload))
    }
  }

  /** STUB feature extraction: an 8-dim embedding from the digest bytes.
    * Fully columnar — `sha2`/`length`/`conv` are codegen'd built-ins, so
    * this is one narrow whole-stage-codegen pass with no serialization
    * boundary. Only a real model-inference stage (the decode stub's
    * replacement) would drop to `mapPartitions`. */
  def extractFeatures(rows: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import rows.sparkSession.implicits._
    rows.toDF()
      .withColumn("sha256", sha2(col("payload"), 256))
      .withColumn("byte_len", length(col("payload")).cast("long"))
      .withColumn("feature", transform(sequence(lit(0), lit(7)), i =>
        (conv(col("sha256").substr(i * 2 + 1, lit(2)), 16, 10).cast("int") /
          lit(255f)).cast("float")))
      .select(col("media_id"), col("media_type"), col("byte_len"),
        col("sha256"), col("feature"))
      .as[MediaFeatures]
  }

  /** Frame sampling stub for video rows: every `everyMs` milliseconds of
    * the stub duration — the row-explode shape of real frame sampling. */
  def sampleFrames(decoded: Dataset[DecodedMedia],
      everyMs: Long = 60000): DataFrame = {
    import decoded.sparkSession.implicits._
    decoded.filter(_.media_type == "video")
      .flatMap { d =>
        (0L until math.max(d.duration_ms, 1L) by everyMs).map(ts =>
          (d.media_id, ts, d.sha256.take(16) + f"@$ts%08d"))
      }
      .toDF("media_id", "frame_ts_ms", "frame_ref")
  }

  /** Resize planning for image rows: aspect-preserving fit into a
    * `maxW`×`maxH` box, never upscaling. The dimension math
    * (scale factor, rounded output box, half-up) is pure columnar
    * codegen over the decoded metadata; the pixel resample itself
    * belongs in the codec stage this container stubs ([[decodeStub]]),
    * exactly like real pipelines where resize planning drives a batch
    * GPU/codec call. No shuffle — payload-local like the rest of the
    * file. */
  def resizePlan(decoded: Dataset[DecodedMedia], maxW: Int = 512,
      maxH: Int = 512): DataFrame =
    decoded.toDF()
      .filter(col("media_type") === "image")
      .withColumn("scale",
        least(lit(maxW.toDouble) / col("width"),
          lit(maxH.toDouble) / col("height"), lit(1.0)))
      .select(col("media_id"), col("width"), col("height"),
        greatest(floor(col("width") * col("scale") + 0.5), lit(1))
          .cast("long").as("out_width"),
        greatest(floor(col("height") * col("scale") + 0.5), lit(1))
          .cast("long").as("out_height"),
        (col("scale") < 1.0).as("scaled"))

  /** Build a synthetic media table from the documents table (binary
    * payload = utf-8 text bytes) — the test-data stand-in for real blob
    * columns. */
  def syntheticMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      encode(col("text"), "utf-8").as("payload"),
      col("source"))
      .as[MediaRow]
  }
}
