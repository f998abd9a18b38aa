package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming ingest for transcripts. The reference has no
  * streaming at all (SURVEY.md §2.8); this is the engine's forward path for
  * continuous edge derivation: a transcript stream → watermarked dedup →
  * incremental (conv, tool) co-occurrence counts, ready to merge into the
  * edge table.
  */
object TranscriptStream {

  val transcriptSchema: StructType = StructType(Seq(
    StructField("conv_id", StringType),
    StructField("turn_idx", IntegerType),
    StructField("role", StringType),
    StructField("text", StringType),
    StructField("tool", StringType),
    StructField("ts", TimestampType)))

  /** File-source stream over a directory of transcript parquet. */
  def readTranscripts(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    spark.readStream.schema(transcriptSchema).parquet(dir)

  /** Exactly-once turn dedup within the watermark: late duplicates of
    * (conv_id, turn_idx) are dropped before counting. */
  def dedupedTurns(stream: DataFrame, watermark: String = "10 minutes"): DataFrame =
    stream.withWatermark("ts", watermark)
      .dropDuplicates("conv_id", "turn_idx")

  /** Windowed per-tool activity: tool usage counts per event-time window —
    * the streaming analog of the conv↔tool edge weights. */
  def toolWindowCounts(
      stream: DataFrame,
      watermark: String = "10 minutes",
      window_ : String = "5 minutes"): DataFrame =
    dedupedTurns(stream, watermark)
      .where(col("tool").isNotNull)
      .groupBy(window(col("ts"), window_), col("tool"))
      .agg(count(lit(1)).as("turns"), approx_count_distinct(col("conv_id")).as("convs"))

  /** Incremental conv↔tool co-occurrence (update-mode aggregate keyed exactly
    * like the batch edge derivation). */
  def convToolCounts(stream: DataFrame, watermark: String = "10 minutes"): DataFrame =
    dedupedTurns(stream, watermark)
      .where(col("tool").isNotNull)
      .groupBy(col("conv_id"), col("tool"))
      .agg(count(lit(1)).as("weight"))
}
