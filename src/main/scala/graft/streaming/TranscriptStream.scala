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

  // ---- sessionization (streaming analog of graft.derive.Sessionize) ----

  // `ts` carries the watermarked event-time column through to the stateful
  // operator (Spark requires it to survive into the flatMapGroupsWithState
  // input); ts_us is the same instant as a plain long for arithmetic.
  final case class Turn(conv_id: String, turn_idx: Int, tool: String, ts_us: Long,
      ts: java.sql.Timestamp)
  final case class SessionAgg(
      sessionIdx: Long, startUs: Long, lastUs: Long, nTurns: Long, tools: Seq[String])
  final case class SessionRow(conv_id: String, session_idx: Long, n_turns: Long,
      start_us: Long, end_us: Long, n_tools: Long)

  /** Continuous gap-based sessionization via `flatMapGroupsWithState` with
    * an EVENT-TIME timeout: a session row is emitted when the next turn
    * arrives past the gap (close-by-gap) or when the watermark passes
    * last-turn + gap (close-by-timeout — the session that never sees
    * another turn). Emitted rows equal [[graft.derive.Sessionize
    * .sessionStats]] over the same turns for every CLOSED session
    * (spec-asserted). State per conversation is ONE SessionAgg (the open
    * session only — closed sessions leave state immediately), so state size
    * is O(active conversations), independent of history length — the shape
    * that survives 10¹² turns.
    *
    * Late-filter boundary (measured): with EventTimeTimeout, input rows with
    * event time `<=` the current watermark are dropped — inclusive, so a row
    * at exactly the watermark (e.g. epoch 0 against the initial watermark 0)
    * silently disappears. Session equality with the batch derivation holds
    * for turns that arrive strictly inside the allowed lateness. */
  def sessionStatsStream(
      stream: DataFrame,
      gapSeconds: Long = 86400L,
      watermark: String = "2 hours"): org.apache.spark.sql.Dataset[SessionRow] = {
    val spark = stream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapUs = gapSeconds * 1000000L
    stream.withWatermark("ts", watermark)
      .select(col("conv_id"), col("turn_idx"), col("tool"),
        unix_micros(col("ts")).as("ts_us"), col("ts"))
      .as[Turn]
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState[SessionAgg, SessionRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (conv: String, rows: Iterator[Turn], state: GroupState[SessionAgg]) =>
          def close(s: SessionAgg): SessionRow = SessionRow(
            conv, s.sessionIdx, s.nTurns, s.startUs, s.lastUs, s.tools.distinct.size.toLong)
          if (state.hasTimedOut) {
            val out = state.getOption.map(close).toList
            state.remove()
            out.iterator
          } else {
            val sorted = rows.toList.sortBy(t => (t.ts_us, t.turn_idx))
            var cur = state.getOption
            val closed = List.newBuilder[SessionRow]
            for (t <- sorted) {
              val toolSeq = if (t.tool == null) Nil else Seq(t.tool)
              cur = cur match {
                case Some(s) if t.ts_us - s.lastUs <= gapUs =>
                  // min/max bounds keep the merge correct when a batch
                  // boundary delivers an in-gap turn out of event-time order.
                  // Dedup tools ON INSERT (round 6): only the DISTINCT count
                  // is read at close, and appending every occurrence grew
                  // open-session state linearly with session length — the
                  // distinct set bounds it by the tool alphabet (guide §5:
                  // what tasks hold in memory), emitted rows identical.
                  Some(s.copy(startUs = math.min(s.startUs, t.ts_us),
                    lastUs = math.max(s.lastUs, t.ts_us), nTurns = s.nTurns + 1,
                    tools = toolSeq.foldLeft(s.tools)((acc, x) =>
                      if (acc.contains(x)) acc else acc :+ x)))
                case Some(s) =>
                  closed += close(s)
                  Some(SessionAgg(s.sessionIdx + 1, t.ts_us, t.ts_us, 1L, toolSeq))
                case None =>
                  Some(SessionAgg(0L, t.ts_us, t.ts_us, 1L, toolSeq))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastUs / 1000L + gapSeconds * 1000L)
            }
            closed.result().iterator
          }
      }
  }

  /** End-to-end continuous edge maintenance: watermarked turn dedup (append
    * mode — each unique (conv_id, turn_idx) is emitted exactly once) →
    * `foreachBatch` merge into the canonical conv↔tool edge table through
    * [[graft.sources.TableIO]].
    *
    * Exactly-once: foreachBatch is at-least-once, so the merge must be
    * idempotent per batchId — each batch writes an INCREMENT-ONLY snapshot
    * `table/delta_<batchId>`; a replayed batch finds the commit marker and
    * skips. The marker is written last, so a torn write is invisible and the
    * replay rewrites it. Weights are additive, so readers fold the committed
    * deltas ([[readEdges]]) — the write path is O(batch), never a full-table
    * rewrite (at production scale the same seam is an Iceberg row-level
    * MERGE, and delta folding is its compaction maintenance).
    */
  def edgeMergeSink(
      stream: DataFrame,
      io: graft.sources.TableIO,
      table: String,
      checkpointDir: String,
      watermark: String = "10 minutes"): org.apache.spark.sql.streaming.StreamingQuery =
    dedupedTurns(stream, watermark)
      .where(col("tool").isNotNull)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        mergeBatch(io, table, batch.toDF(), id)
      }
      .start()

  /** One idempotent micro-batch merge (the foreachBatch body, callable
    * directly in tests): aggregates the batch to (conv_id, tool, weight)
    * increments and commits them as `table/delta_<batchId>`. */
  def mergeBatch(io: graft.sources.TableIO, table: String, batch: DataFrame, batchId: Long): Unit = {
    val snap = f"$table/delta_$batchId%09d" // zero-padded: snapshots() sorts lexically
    if (!io.exists(snap)) {
      // null-tool turns carry no edge; filter here too (not just in the
      // stream) so a directly-merged batch can't pollute the edge table
      val inc = batch.where(col("tool").isNotNull)
        .groupBy(col("conv_id"), col("tool"))
        .agg(count(lit(1)).as("weight"))
      io.write(inc, snap)
    }
  }

  /** Additive fold of an explicit snapshot set — the single definition both
    * the reader view and the compactor share, so what gets folded is always
    * exactly one listing (never two listings that could straddle a
    * concurrent delta commit). */
  private def foldSnapshots(spark: org.apache.spark.sql.SparkSession,
      io: graft.sources.TableIO, table: String, parts: Seq[String]): DataFrame = {
    require(parts.nonEmpty, s"no committed snapshots under $table")
    parts.map(io.read(spark, _)).reduce(_.unionByName(_))
      .groupBy(col("conv_id"), col("tool"))
      .agg(sum(col("weight")).as("weight"))
  }

  /** Committed edge-table view: the latest compaction (if any) plus the
    * additive fold of deltas committed after it. Equals the batch
    * derivation over the same turns (spec-asserted). */
  def readEdges(spark: org.apache.spark.sql.SparkSession, io: graft.sources.TableIO,
      table: String): DataFrame = {
    val (base, deltas) = baseAndTail(io, table)
    foldSnapshots(spark, io, table, base.toSeq ++ deltas)
  }

  /** Fold everything committed so far into ONE consolidated snapshot
    * `compact_<lastDeltaId>` — the parquet-seam analog of Iceberg's
    * rewrite_data_files maintenance: reader cost stops growing with batch
    * count while the delta log stays intact as the replay record. Readers
    * pick it up automatically ([[readEdges]] folds only deltas newer than
    * the latest compaction). The snapshot list is taken ONCE and that exact
    * set is folded and named — a delta committed while the compaction runs
    * is neither folded nor covered by the name, so it stays in the reader's
    * tail and is counted exactly once. Idempotent per lastDeltaId (marker
    * check); a concurrent reader sees either the old or the new view — both
    * correct, since the compaction carries the same additive content. */
  def compact(spark: org.apache.spark.sql.SparkSession, io: graft.sources.TableIO,
      table: String): Unit = {
    val (base, deltas) = baseAndTail(io, table) // the one listing
    if (deltas.nonEmpty) {
      val lastId = deltas.last.split('/').last.stripPrefix("delta_")
      val snap = s"$table/compact_$lastId"
      if (!io.exists(snap))
        io.write(foldSnapshots(spark, io, table, base.toSeq ++ deltas), snap)
    }
  }

  /** (latest compaction, deltas committed after it) — zero-padded ids make
    * string order == numeric order. */
  private def baseAndTail(io: graft.sources.TableIO, table: String): (Option[String], Seq[String]) = {
    val names = io.snapshots(table)
    val compacts = names.filter(_.split('/').last.startsWith("compact_"))
    val deltas = names.filter(_.split('/').last.startsWith("delta_"))
    compacts.lastOption match {
      case Some(c) =>
        val cid = c.split('/').last.stripPrefix("compact_")
        (Some(c), deltas.filter(_.split('/').last.stripPrefix("delta_") > cid))
      case None => (None, deltas)
    }
  }
}
