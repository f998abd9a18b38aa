package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata, plus decode / feature-extract / frame-sample stages.
  *
  * Decode is REAL for raw container formats (pure-JVM [[RawCodecs]]: PPM P6
  * images → 4×4 pooled-luminance features; PCM-16 WAV audio → 16-window RMS
  * energy). Compressed codecs (JPEG/MP3/H.264 — i.e. the video rows here)
  * remain behind a declared deterministic STUB: no codec libraries exist in
  * this container, and that is the honest boundary. Everything else —
  * schema, partition-sized batching via mapPartitions on typed Datasets
  * (per-partition decoder init amortization), feature array shape,
  * frame-offset computation — is the production plumbing.
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
      features: Array[Float],
      frame_offsets: Array[Long],
      decoded: Boolean) // false = stub fallback (compressed codec or
                        // undecodable payload) — downstream consumers can
                        // tell real features from deterministic stub noise

  /** Deterministic synthetic media table. Image rows carry REAL PPM-encoded
    * gradient images, audio rows REAL PCM-16 WAV sine waves (both decodable
    * by [[RawCodecs]]); video rows carry opaque bytes (the stubbed
    * compressed-codec path). */
  def syntheticMedia(spark: SparkSession, n: Int, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val rnd = new scala.util.Random(seed ^ id)
      math.floorMod(id, 3).toInt match {
        case 0 => // image: horizontal-gradient PPM
          val w = 8 + rnd.nextInt(24); val h = 8 + rnd.nextInt(16)
          val rgb = new Array[Byte](w * h * 3)
          for (y <- 0 until h; x <- 0 until w) {
            val o = (y * w + x) * 3
            rgb(o) = (x * 255 / math.max(1, w - 1)).toByte
            rgb(o + 1) = (y * 255 / math.max(1, h - 1)).toByte
            rgb(o + 2) = ((x + y + id) % 256).toByte
          }
          MediaRow(id, "image", RawCodecs.encodePpm(w, h, rgb), w, h, 0L)
        case 1 => // audio: sine at a per-row frequency, 8 kHz PCM-16
          val rate = 8000
          val nSamp = 256 + rnd.nextInt(512)
          val freq = 220.0 + (id % 16) * 55.0
          val samples = Array.tabulate(nSamp)(i =>
            (math.sin(2 * math.Pi * freq * i / rate) * 12000).toShort)
          MediaRow(id, "audio", RawCodecs.encodeWav(rate, samples), 0, 0,
            nSamp * 1000L / rate)
        case _ => // video: opaque compressed payload (stub decode path)
          val bytes = Array.fill[Byte](256 + rnd.nextInt(1024))(rnd.nextInt().toByte)
          MediaRow(id, "video", bytes, 64 + rnd.nextInt(512), 64 + rnd.nextInt(512),
            1000L + rnd.nextInt(60000))
      }
    }
  }

  /** ??? in spirit: the COMPRESSED-codec boundary (JPEG/MP3/H.264 — no codec
    * libs in this container). Deterministic fake so the pipeline is testable
    * end-to-end; replace body with a real decoder at deploy time. Raw
    * formats do NOT go through this — see [[RawCodecs]]. */
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
    * real decoder amortizes model/codec init per partition, not per row).
    * Images decode via PPM → pooled luminance; audio via WAV → windowed RMS;
    * anything else (video / undecodable payloads) falls back to the stub. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16, frames: Int = 4): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    val grid = math.max(1, math.sqrt(dim.toDouble).toInt)
    media.mapPartitions { rows =>
      // per-partition init would go here (codec contexts, model weights)
      rows.map { r =>
        val offsets =
          if (r.kind == "video")
            (0 until frames).map(i => r.duration_ms * i / frames).toArray
          else Array.empty[Long]
        val real: Option[Array[Float]] = r.kind match {
          case "image" =>
            RawCodecs.decodePpm(r.bytes)
              .map { case (w, h, rgb) => RawCodecs.poolLuminance(w, h, rgb, grid).padTo(dim, 0f) }
          case "audio" =>
            RawCodecs.decodeWav(r.bytes)
              .map { case (_, samples) => RawCodecs.rmsWindows(samples, dim) }
          case _ => None
        }
        MediaFeatures(r.media_id, r.kind, r.bytes.length,
          real.getOrElse(decodeStub(r.bytes, dim)), offsets, decoded = real.isDefined)
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
