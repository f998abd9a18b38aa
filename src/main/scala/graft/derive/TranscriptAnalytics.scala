package graft.derive

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence/summary analytics over the transcript table — the engine-side
  * extensions a conversation corpus needs beyond the graph derivation
  * (SURVEY.md §2.8 territory: the reference has no transcript layer at all,
  * so these are engine additions like the streaming stack).
  *
  * Execution shape shared by every operator here: ONE exchange on `conv_id`
  * feeding per-conversation windows (lag streams over the sorted partition,
  * no buffering), then a partial-agg shuffle on the small output key space.
  * Nothing is ever keyed on anything conversation-length-sized, so the
  * shapes are flat in corpus size: at 10¹² turns the only growth is the
  * per-partition external sort that the conv_id exchange already pays.
  */
object TranscriptAnalytics {

  private def byTurn = Window.partitionBy("conv_id").orderBy("turn_idx")

  /** Global role-transition counts (prev_role → role across consecutive
    * turns of the same conversation) — the Markov view of conversation
    * structure. Output is |roles|² rows at most. */
  def roleTransitions(transcripts: DataFrame): DataFrame =
    transcripts
      .withColumn("prev_role", lag(col("role"), 1).over(byTurn))
      .where(col("prev_role").isNotNull)
      .groupBy("prev_role", "role")
      .agg(count(lit(1)).as("n"))

  /** Directed tool-transition (bigram) counts over each conversation's
    * non-null tool sequence — the DIRECTED companion of the undirected
    * tool–tool co-occurrence projection in [[LinkGraph.fromTranscripts]]:
    * "search then code" and "code then search" are separate edges here.
    * Turns without a tool are dropped BEFORE the lag, so a bigram spans
    * intervening tool-less turns. */
  def toolBigrams(transcripts: DataFrame): DataFrame =
    transcripts.where(col("tool").isNotNull)
      .withColumn("prev_tool", lag(col("tool"), 1).over(byTurn))
      .where(col("prev_tool").isNotNull)
      .groupBy("prev_tool", "tool")
      .agg(count(lit(1)).as("n"))

  /** Per-conversation inter-turn gap statistics. Exact integer sums; the
    * average is emitted as a single double division of those exact integers
    * so independent engines agree bit-for-bit (an engine-internal running
    * mean would not). */
  def latencyStats(transcripts: DataFrame): DataFrame =
    transcripts
      .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("gap_us", col("ts_us") - lag(col("ts_us"), 1).over(byTurn))
      .where(col("gap_us").isNotNull)
      .groupBy("conv_id")
      .agg(
        count(lit(1)).as("n_gaps"),
        sum("gap_us").as("sum_gap_us"),
        min("gap_us").as("min_gap_us"),
        max("gap_us").as("max_gap_us"))
      .withColumn("avg_gap_us", col("sum_gap_us").cast("double") / col("n_gaps"))

  /** Session-scoped tool co-occurrence pairs (t1 < t2): two tools co-occur
    * only when used within the SAME session ([[Sessionize.sessions]]), the
    * finer-grained sibling of the conversation-scoped projection in
    * [[LinkGraph.fromTranscripts]]. Fan-out per (conversation, session) is
    * bounded by (distinct tools in the session)², never by session length —
    * same skew envelope as the conversation projection, tightened by the
    * session split. */
  def sessionToolPairs(transcripts: DataFrame, gapSeconds: Long = 86400L): DataFrame = {
    val st = Sessionize.sessions(transcripts, gapSeconds)
      .where(col("tool").isNotNull)
      .select("conv_id", "session_idx", "tool")
      .distinct()
    st.as("a")
      .join(st.as("b"),
        col("a.conv_id") === col("b.conv_id") &&
          col("a.session_idx") === col("b.session_idx") &&
          col("a.tool") < col("b.tool"))
      .groupBy(col("a.tool").as("t1"), col("b.tool").as("t2"))
      .agg(count(lit(1)).as("weight"))
  }

  /** Per-conversation summary: turn/session/tool counts, time span, and the
    * per-role turn mix — the row a corpus-curation pass filters on. */
  def convStats(transcripts: DataFrame, gapSeconds: Long = 86400L): DataFrame =
    Sessionize.sessions(transcripts, gapSeconds)
      .groupBy("conv_id")
      .agg(
        count(lit(1)).as("n_turns"),
        (max("session_idx") + 1L).as("n_sessions"),
        count_distinct(col("tool")).as("n_tools"),
        min("ts_us").as("first_us"),
        max("ts_us").as("last_us"),
        sum(when(col("role") === "user", 1L).otherwise(0L)).as("n_user"),
        sum(when(col("role") === "assistant", 1L).otherwise(0L)).as("n_assistant"))

  /** Conversation → tool-trajectory document (doc_id = conv_id, text = the
    * ordered tool/event-type sequence joined with spaces). The bridge from
    * the transcript axis into the dedup family: feed the result straight
    * into [[graft.dedup.Dedup.ngramJaccard]] / `minhashLsh` and shingles
    * become tool n-grams, so "near-duplicate" means near-identical tool-call
    * trajectories — template sessions, scripted agents, replayed flows.
    * That is trajectory-level dedup, the conversation analog of document
    * near-dup (per-turn text here is too short to shingle; the SEQUENCE is
    * the signal).
    *
    * Scale shape: one exchange on conv_id with partial aggregation; the
    * sort_array over collected (turn_idx, tool) structs is per-conversation
    * work bounded by conversation length — the same bound every per-conv
    * window in this file pays — never by corpus size. */
  def toolTrajectoryDocs(transcripts: DataFrame): DataFrame =
    transcripts
      .groupBy(col("conv_id").as("doc_id"))
      .agg(array_join(
        transform(sort_array(collect_list(struct(col("turn_idx"), col("tool")))),
          s => s.getField("tool")),
        " ").as("text"))
}
