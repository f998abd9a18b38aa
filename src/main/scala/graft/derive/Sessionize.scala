package graft.derive

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based transcript sessionization — the canonical first transform over
  * multi-turn conversation data: a conversation splits into sessions
  * wherever consecutive turns are separated by more than `gapSeconds`.
  *
  * Execution shape: ONE exchange on conv_id feeding a per-conversation
  * window (lag + running sum — both stream over the sorted partition, no
  * buffering beyond the frame), then an optional per-session partial-agg.
  * Conversations are independent, so the window never sees more than one
  * conversation's turns — at 10¹²-turn scale the sort is per-partition
  * external sort on (conv_id, turn_idx), no global ordering anywhere.
  * The streaming analog lives in
  * [[graft.streaming.TranscriptStream.sessionStatsStream]] (state-timeout
  * sessionization over the same gap — spec-asserted equal to this batch
  * derivation on closed sessions).
  */
object Sessionize {

  /** Shared default gap (1 day) — referenced by the oracle generator so the
    * engine and DuckDB literals cannot fork. */
  val defaultGapSeconds: Long = 86400L

  /** Per-turn session assignment: adds `session_idx` (0-based within the
    * conversation) to the transcript rows. A turn opens a new session iff it
    * is the conversation's first turn or its gap from the previous turn
    * exceeds `gapSeconds`. */
  def sessions(transcripts: DataFrame, gapSeconds: Long = 86400L): DataFrame = {
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
    transcripts
      .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("gap_us", col("ts_us") - lag(col("ts_us"), 1).over(w))
      .withColumn("session_idx",
        sum(when(col("gap_us").isNull || col("gap_us") > gapSeconds * 1000000L, 1L)
          .otherwise(0L)).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1L)
      .drop("gap_us")
  }

  /** Per-session summary: turn count, span, distinct tools touched. */
  def sessionStats(transcripts: DataFrame, gapSeconds: Long = 86400L): DataFrame =
    sessions(transcripts, gapSeconds)
      .groupBy("conv_id", "session_idx")
      .agg(
        count(lit(1)).as("n_turns"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"),
        count_distinct(col("tool")).as("n_tools"))
}
