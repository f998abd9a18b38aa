package graft.derive

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Transcript table → link graph (vertex dictionary + canonical weighted edge
  * table). This replaces the reference's text edge-list loaders
  * (`GraphLoader.edgesFromFile` et al., `GraphLoader.scala:16-376`): the same
  * role — turn raw input into a canonical, deduped, self-loop-free edge set —
  * but the input is the BASELINE transcript schema and the output is a pair of
  * Datasets instead of `RDD[EdgePartition]`.
  *
  * Derivation (FIXTURES.md §2-3):
  *   - vertices: `conv:<conv_id>` ∪ `tool:<tool>`, dense 1-based vids in key
  *     order (so all conv vids < all tool vids — canonical `src < dst` falls
  *     out of the key ordering for free);
  *   - conv↔tool edges: weight = number of turns of that conversation using
  *     that tool;
  *   - tool↔tool edges: weight = number of conversations where both tools
  *     appear (bipartite projection), `t1 < t2`.
  *
  * Scale notes: the conv→tool aggregation is a single partial-agg shuffle on
  * (conv_id, tool); the tool–tool projection joins the *distinct* (conv, tool)
  * pair set with itself on conv_id — per-conversation fan-out is bounded by
  * (distinct tools per conversation)^2, never by conversation length, and the
  * dictionary join on the tool side is a broadcast (tool universe ≪ convs).
  */
object LinkGraph {

  final case class GraphTables(vertices: DataFrame, edges: DataFrame)

  /** transcripts(conv_id, turn_idx, role, text, tool, ts) → graph tables. */
  def fromTranscripts(transcripts: DataFrame): GraphTables = {
    val t = transcripts.select(col("conv_id"), col("tool")).where(col("tool").isNotNull)

    // lazy leaf: convTool feeds the vertex-key union (2 refs), the conv→tool
    // edge arm and the tool–tool projection (2 refs) — 5 references total;
    // checkpointing materializes the transcripts scan + aggregate once. The
    // events-scan column pruning (PLANS.md §A) happens INSIDE this subplan,
    // so it is preserved.
    val convTool = t.groupBy("conv_id", "tool").agg(count(lit(1)).as("weight"))
      .localCheckpoint(false)

    // ONE sizing action on the (conv, tool) pair leaf: materializes it (a
    // lazy checkpoint needs one anyway) and yields the row count that sizes
    // BOTH the dictionary build's range partitioning (scale-adaptive instead
    // of the defaultParallelism constant — a 32-partition range exchange +
    // sampling job over a kilo-row fixture dictionary was pure scheduling
    // overhead, guide §2.2) and the dict-join strategy below. Replaces the
    // round-3 dict.count() (the distinct key count): nKeys ≤ 2·nPairs, so
    // the broadcast cutover reads the upper bound — conservative in the
    // safe direction.
    val nPairs = convTool.count()
    val dictParts = graft.core.IterCache.adaptiveParts(transcripts.sparkSession, 2L * nPairs)

    val keys = convTool
      .select(concat(lit("conv:"), col("conv_id")).as("key"))
      .union(convTool.select(concat(lit("tool:"), col("tool")).as("key")))
    val vertices = Dictionary
      .encode(keys, dictParts)
      .withColumn("kind", substring(col("key"), 1, 4))

    val dict = vertices.select(col("vid"), col("key"))
    // ONLY the tool-side dictionary is always broadcastable (tool universe ≪
    // convs); the conv-side dict is conversation-sized. Round-2 code
    // broadcast-hinted the FULL dict on both joins — at 50M convs the
    // ScalingBench prep built a 6.1 GiB broadcast (caught in the round-3
    // prep log); at 10^12 turns a full-dict broadcast is impossible. The
    // dict is an RDD leaf (no Catalyst stats), so the strategy is chosen
    // here from the sizing count above: broadcast below 10^6 keys (≲100 MB),
    // shuffle-hash above (never sort-merge: both sides hash fine and the
    // sort is pure waste).
    val toolDict = dict.where(col("key").startsWith("tool:"))
    val dictHint = if (2L * nPairs <= 1000000L) "broadcast" else "shuffle_hash"

    val convToolEdges = convTool
      .join(dict.hint(dictHint).as("dv"),
        concat(lit("conv:"), col("conv_id")) === col("dv.key"))
      .withColumnRenamed("vid", "src")
      .drop("key")
      .join(toolDict.hint("broadcast").as("tv"),
        concat(lit("tool:"), col("tool")) === col("tv.key"))
      .withColumnRenamed("vid", "dst")
      .select(col("src"), col("dst"), col("weight"))

    // Distinct (conv, tool) pairs → per-conversation tool-pair projection.
    val ct = convTool.select("conv_id", "tool")
    val toolTool = ct.as("a")
      .join(ct.as("b"),
        col("a.conv_id") === col("b.conv_id") && col("a.tool") < col("b.tool"))
      .groupBy(col("a.tool").as("t1"), col("b.tool").as("t2"))
      .agg(count(lit(1)).as("weight"))

    val toolToolEdges = toolTool
      .join(toolDict.hint("broadcast").as("v1"),
        concat(lit("tool:"), col("t1")) === col("v1.key"))
      .withColumnRenamed("vid", "src")
      .drop("key")
      .join(toolDict.hint("broadcast").as("v2"),
        concat(lit("tool:"), col("t2")) === col("v2.key"))
      .withColumnRenamed("vid", "dst")
      .select(col("src"), col("dst"), col("weight"))

    GraphTables(vertices, convToolEdges.unionByName(toolToolEdges))
  }

  /** Generic bipartite pair stream → graph. `pairs(akey, bkey)` with akey keys
    * lexically below bkey keys (caller prefixes, e.g. `cust:` / `supp:`).
    * Used for the customer–supplier co-purchase graph over the TPC-H-ish
    * testdata (a second, larger topology exercising the same engine).
    */
  def fromBipartitePairs(pairs: DataFrame): GraphTables = {
    // lazy leaf, same rationale as fromTranscripts: 3 references (key union
    // ×2, edge build) would otherwise re-run the upstream join+aggregate
    val agg = pairs.groupBy("akey", "bkey").agg(count(lit(1)).as("weight"))
      .localCheckpoint(false)
    val keys = agg.select(col("akey").as("key")).union(agg.select(col("bkey").as("key")))
    val vertices = Dictionary.encode(keys)
      .withColumn("kind", substring_index(col("key"), ":", 1))
    val dict = vertices.select("vid", "key")
    // ONE sizing action: the exact distinct-key count (doubles as the
    // dictionary leaf's materializing action) picks the dict-join strategy —
    // both leaves are RDD-backed with no Catalyst stats, so the planner
    // alone falls back to sort-merge, sorting the edge side (guide §3.1).
    // A 2·nPairs proxy was measured wrong here: it over-counts keys by the
    // mean key multiplicity (3.5× on the customer–supplier graph) and
    // forced shuffle_hash on a broadcast-sized 165k-key dict (+1.5 s on
    // q_pagerank_cs, round-6 mid bench).
    val dictHint = if (vertices.count() <= 1000000L) "broadcast" else "shuffle_hash"
    val edges = agg
      .join(dict.hint(dictHint).as("va"), col("akey") === col("va.key"))
      .withColumnRenamed("vid", "src").drop("key")
      .join(dict.hint(dictHint).as("vb"), col("bkey") === col("vb.key"))
      .withColumnRenamed("vid", "dst")
      .select(col("src"), col("dst"), col("weight"))
    GraphTables(vertices, edges)
  }

  /** Both-direction view of a canonical edge set (the reference's PageRank is
    * undirected/bidirected — messages flow both ways, `PageRank.scala:62-67`).
    */
  def symmetrize(edges: DataFrame): DataFrame =
    edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))

  /** The transcript-shaped view of the driver's `events` testdata table — the
    * deterministic stand-in for a real transcript source that a DuckDB oracle
    * can reproduce 1:1 (see SparkEntry.oracleSql). conv = user, tool = event
    * type, one turn per event ordered by (ts, event_id).
    */
  def transcriptsFromEvents(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev.withColumn("turn_idx", (row_number().over(w) - 1).cast("int"))
      .select(
        concat(lit("c"), lpad(col("user_id").cast("string"), 6, "0")).as("conv_id"),
        col("turn_idx"),
        element_at(lit(Array("user", "assistant", "tool")),
          pmod(col("turn_idx"), lit(3)).cast("int") + 1).as("role"),
        col("props").as("text"),
        col("event_type").as("tool"),
        col("ts"))
  }
}
