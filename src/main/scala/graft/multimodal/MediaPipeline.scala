package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata, plus decode / feature-extract / frame-sample stages.
  *
  * The decode step is a STUB (no codec libraries in this container): it
  * produces deterministic fake features derived from the bytes. Everything
  * around it — schema, partition-sized batching via mapPartitions on typed
  * Datasets, feature array shape, frame-offset computation — is the real
  * Spark plumbing a production decoder (JNI/Pandas-UDF) would drop into.
  */
object MediaPipeline {

  final case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      bytes: Array[Byte],
      width: Int,
      height: Int,
      duration_ms: Long)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      features: Array[Float], // STUB: hash-derived; real impl = decoded embedding
      frame_offsets: Array[Long])

  /** Deterministic synthetic media table (binary payload = repeatable bytes
    * from a seeded counter; sizes vary per row). */
  def syntheticMedia(spark: SparkSession, n: Int, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val rnd = new scala.util.Random(seed ^ id)
      val kind = Seq("image", "audio", "video")(math.floorMod(id, 3).toInt)
      val len = 256 + rnd.nextInt(1024)
      val bytes = Array.fill[Byte](len)(rnd.nextInt().toByte)
      MediaRow(id, kind, bytes, 64 + rnd.nextInt(512), 64 + rnd.nextInt(512),
        1000L + rnd.nextInt(60000))
    }
  }

  /** ??? in spirit: the codec boundary. Deterministic fake so the pipeline is
    * testable end-to-end; replace body with a real decoder at deploy time. */
  private def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = h * 31 + bytes(i); i += 1 }
    var j = 0
    while (j < dim) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(j) = ((h >>> 40).toInt % 1000) / 1000.0f
      j += 1
    }
    out
  }

  /** Decode + feature-extract + frame-sample, batched per partition (the
    * Scala analog of `mapInPandas`: one iterator pass per partition, so a
    * real decoder amortizes model/codec init per partition, not per row). */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16, frames: Int = 4): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init would go here (codec contexts, model weights)
      rows.map { r =>
        val offsets =
          if (r.kind == "video")
            (0 until frames).map(i => r.duration_ms * i / frames).toArray
          else Array.empty[Long]
        MediaFeatures(r.media_id, r.kind, r.bytes.length, decodeStub(r.bytes, dim), offsets)
      }
    }
  }

  /** Resize metadata transform (pure column math — no decode needed). */
  def resizePlan(media: DataFrame, maxSide: Int): DataFrame =
    media.withColumn("scale",
        when(greatest(col("width"), col("height")) <= maxSide, lit(1.0))
          .otherwise(lit(maxSide.toDouble) / greatest(col("width"), col("height"))))
      .withColumn("out_w", floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_h", floor(col("height") * col("scale")).cast("int"))
}
