package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.derive.LinkGraph

/** Relational re-expressions of the reference's graph operator surface
  * (SURVEY.md §2.2-2.6). Each maps a `Graph[VD,ED]` method to a declarative
  * Dataset transform so Catalyst plans it (pushdown, partial aggregation,
  * broadcast all come for free).
  */
object GraphOps {

  /** `Graph.calDegree(dir=Both)` (`Graph.scala:349-385`): per-vertex count of
    * incident edges over the canonical edge set. One explode + one partial-agg
    * shuffle; hub skew is absorbed by map-side combine.
    */
  def degrees(edges: DataFrame): DataFrame =
    LinkGraph.symmetrize(edges)
      .groupBy(col("src").as("vid"))
      .agg(count(lit(1)).as("degree"))

  /** Degree distribution (degree, n_vertices): the power-law summary every
    * graph audit starts with. Two partial-agg shuffles, the second over one
    * row per distinct degree — O(max degree) output regardless of scale. */
  def degreeHistogram(edges: DataFrame): DataFrame =
    degrees(edges).groupBy("degree").agg(count(lit(1)).as("n_vertices"))

  /** Degree assortativity (Newman 2002): Pearson correlation of endpoint
    * degrees over the symmetrized edge set — one number summarizing whether
    * hubs link to hubs (>0) or to leaves (<0). All five moments accumulate
    * in EXACT BigInt-free BIGINT space (counts and products of integer
    * degrees — order-independent, so the DuckDB oracle matches bit-for-bit),
    * and only the final Pearson expression drops to doubles. Shape: one
    * degree agg + two vertex-sized shuffle-hash joins onto the edge pairs +
    * a scalar agg — no broadcast of anything vertex-sized, no window.
    *
    * Overflow envelope (ANSI mode throws loudly past it): Σ d² ≤ 2|E|·d²max
    * needs d²max·2|E| < 2⁶³ — fine for |E| ≤ 10¹² with dmax ≤ ~2·10⁶ hubs
    * capped; a web-scale corpus beyond that should pre-cap hub degrees (the
    * same `maxNeighbors` guard the adjacency ops use) or accept double
    * moments. */
  def assortativity(edges: DataFrame): DataFrame = {
    // leaf: the symmetrized pair set feeds both the degree aggregate and the
    // endpoint joins — without it the upstream graph derivation runs twice
    // (round 6; same rationale as the LinkPrediction sym leaf)
    val sym = LinkGraph.symmetrize(edges.select(col("src"), col("dst")))
      .localCheckpoint(false)
    val deg = sym.groupBy(col("src").as("vid")).agg(count(lit(1)).as("degree"))
    val pairs = sym
      .join(deg.select(col("vid").as("src"), col("degree").as("dx"))
        .hint("shuffle_hash"), "src")
      .join(deg.select(col("vid").as("dst"), col("degree").as("dy"))
        .hint("shuffle_hash"), "dst")
    pairs
      .agg(
        count(lit(1)).as("m"),
        sum(col("dx")).as("sx"), sum(col("dy")).as("sy"),
        sum(col("dx") * col("dx")).as("sxx"),
        sum(col("dy") * col("dy")).as("syy"),
        sum(col("dx") * col("dy")).as("sxy"))
      .select(col("m").as("m_edges"),
        round(
          (col("m") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (sqrt((col("m") * col("sxx") - col("sx") * col("sx")).cast("double")) *
              sqrt((col("m") * col("syy") - col("sy") * col("sy")).cast("double"))),
          6).as("assortativity"))
  }

  def outDegrees(edges: DataFrame): DataFrame =
    edges.groupBy(col("src").as("vid")).agg(count(lit(1)).as("degree"))

  def inDegrees(edges: DataFrame): DataFrame =
    edges.groupBy(col("dst").as("vid")).agg(count(lit(1)).as("degree"))

  /** `Graph.calValues` (`Graph.scala:387-424`): per-vertex sum of incident
    * edge weights. */
  def weightedDegrees(edges: DataFrame): DataFrame =
    edges.select(col("src").as("vid"), col("weight"))
      .union(edges.select(col("dst").as("vid"), col("weight")))
      .groupBy("vid").agg(sum("weight").as("weight_sum"))

  /** Adjacency lists (the reference's `NeighN` neighbor-table vertex attrs,
    * `edgesWithNeighborAttrFromFile`, `GraphLoader.scala:75-134`): sorted,
    * deduped neighbor ids per vertex. `sort_array(collect_set)` replaces the
    * hand-written sort-merge `mergeSorted` union (`NeighN.scala:39-98`).
    *
    * `maxNeighbors` is the hub guard (the reference's NeighN k-sampled
    * neighbor tables, `NeighN.scala:9-136`): with Some(k), each vertex keeps
    * a DETERMINISTIC uniform k-sample of its distinct neighbors
    * ([[graft.functions.Samplers.detUniform]] ranking — seed-stable across
    * runs and partitionings), so a 10⁷-degree hub emits a k-sized row instead
    * of a multi-hundred-MB one. The ranking window external-sorts (spills),
    * never materializing the full neighbor set in memory; only the ≤k
    * surviving rows reach collect_list. Default None preserves the exact
    * full-adjacency semantics (oracle parity). */
  def adjacency(edges: DataFrame, maxNeighbors: Option[Int] = None): DataFrame =
    maxNeighbors match {
      case None => // single shuffle: collect_set dedups with map-side combine
        LinkGraph.symmetrize(edges)
          .groupBy(col("src").as("vid"))
          .agg(sort_array(collect_set(col("dst"))).as("neighbors"))
      case Some(k) => // dedup shuffle is only needed ahead of the rank window
        val w = org.apache.spark.sql.expressions.Window.partitionBy("src")
          .orderBy(graft.functions.Samplers.detUniform(col("src"), col("dst")).asc,
            col("dst").asc)
        LinkGraph.symmetrize(edges).distinct()
          .withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
          .groupBy(col("src").as("vid"))
          .agg(sort_array(collect_list(col("dst"))).as("neighbors"))
    }

  /** `Graph.reverse` (`Graph.scala:322-330`). */
  def reverse(edges: DataFrame): DataFrame =
    edges.select(col("dst").as("src"), col("src").as("dst"), col("weight"))

  /** `Graph.subgraph(vpred, epred)` (`Graph.scala:267-320`): keep edges whose
    * endpoints satisfy `vpred` (evaluated against the vertex table) and that
    * satisfy `epred`. Two joins + filter; Catalyst broadcasts the vertex side
    * when small.
    */
  def subgraph(edges: DataFrame, vertices: DataFrame, vpred: Column, epred: Column): DataFrame = {
    val keep = vertices.where(vpred).select(col("vid"))
    edges.where(epred)
      .join(keep.withColumnRenamed("vid", "src"), Seq("src"), "left_semi")
      .join(keep.withColumnRenamed("vid", "dst"), Seq("dst"), "left_semi")
      .select("src", "dst", "weight")
  }

  /** `Graph.groupEdges(merge)` (`Graph.scala:257-265`): merge parallel edges.
    * The reference's run-length merge misfires (compares dst against src,
    * `EdgePartition.scala:312`); the relational form is correct by
    * construction. */
  def groupEdges(multiEdges: DataFrame): DataFrame =
    multiEdges.groupBy("src", "dst").agg(sum("weight").as("weight"))

  /** Triplet view (`Graph.mapTriplets`, `Graph.scala:243-254`): edge rows with
    * both endpoint attribute rows visible. */
  def triplets(edges: DataFrame, vertices: DataFrame): DataFrame =
    edges
      .join(vertices.select(col("vid").as("src"), col("key").as("src_key")), "src")
      .join(vertices.select(col("vid").as("dst"), col("key").as("dst_key")), "dst")
      .select("src", "dst", "weight", "src_key", "dst_key")

  /** The reference's `EdgeActiveness` gate (`GA/framework/EdgePartition.scala:
    * 413-419`): which endpoint(s) must be in the active set for an edge to
    * fire during [[aggregateMessages]]. */
  sealed trait EdgeActiveness
  object EdgeActiveness {
    /** edge fires iff src is active */
    case object SrcOnly extends EdgeActiveness
    /** edge fires iff dst is active */
    case object DstOnly extends EdgeActiveness
    /** edge fires iff src OR dst is active */
    case object Either extends EdgeActiveness
    /** edge fires iff src AND dst are active */
    case object Both extends EdgeActiveness
  }

  /** Edge gating by active set: the frontier semi-join the specialized algos
    * (CC min-prop, frontier PageRank) already use, generalized to the four
    * reference directions. Semi/anti joins keep multi-edge duplicates intact
    * (no distinct), and `Either` decomposes as src-active ∪ (src-inactive ∧
    * dst-active) so no edge is counted twice. The active side is
    * frontier-sized — shuffle-hash hinted, never sort-merge on the edge
    * side. */
  private def gateEdges(edges: DataFrame, active: DataFrame, dir: EdgeActiveness): DataFrame = {
    val aSrc = active.select(col("vid").as("src")).hint("shuffle_hash")
    val aDst = active.select(col("vid").as("dst")).hint("shuffle_hash")
    dir match {
      case EdgeActiveness.SrcOnly => edges.join(aSrc, Seq("src"), "left_semi")
      case EdgeActiveness.DstOnly => edges.join(aDst, Seq("dst"), "left_semi")
      case EdgeActiveness.Both =>
        edges.join(aSrc, Seq("src"), "left_semi").join(aDst, Seq("dst"), "left_semi")
      case EdgeActiveness.Either =>
        // unionByName: a USING-column semi/anti join may move its key to the
        // front, and a positional union would silently swap src/dst
        edges.join(aSrc, Seq("src"), "left_semi")
          .unionByName(
            edges.join(aSrc, Seq("src"), "left_anti").join(aDst, Seq("dst"), "left_semi"))
    }
  }

  /** `Graph.aggregateMessages[M]` (`Graph.scala:491-516`,
    * `EdgePartition.scala:374-480`) — THE core reference op, generically:
    * join vertex state onto each edge endpoint, evaluate message expressions
    * toward dst and/or src, merge per vertex. Spark's hash aggregate supplies
    * the map-side partial merge that `AggregatingEdgeContext` hand-rolls.
    *
    * @param state   (vid, ...attrs)
    * @param msgToDst expression over edge + `src_`-prefixed src attrs, or null
    * @param msgToSrc expression over edge + `dst_`-prefixed dst attrs, or null
    * @param merge    aggregate over column `msg`, e.g. sum(col("msg"))
    * @param activeSet  optional frontier (vid); only edges passing the
    *                   `activeness` gate fire. None = every edge (identical
    *                   to an all-vertex frontier). Vertices receiving no
    *                   message are absent from the result, exactly like the
    *                   ungated form.
    * @param activeness which endpoint(s) must be active (reference
    *                   `EdgeActiveness`); default `Either` matches the
    *                   reference's Pregel default.
    */
  def aggregateMessages(
      edges: DataFrame,
      state: DataFrame,
      msgToDst: Option[Column],
      msgToSrc: Option[Column],
      merge: Column,
      activeSet: Option[DataFrame] = None,
      activeness: EdgeActiveness = EdgeActiveness.Either): DataFrame = {
    require(msgToDst.nonEmpty || msgToSrc.nonEmpty,
      "aggregateMessages: at least one message direction required")
    val gated = activeSet.map(gateEdges(edges, _, activeness)).getOrElse(edges)
    val srcState = state.columns.foldLeft(state)((d, c) => d.withColumnRenamed(c, s"src_$c"))
    val dstState = state.columns.foldLeft(state)((d, c) => d.withColumnRenamed(c, s"dst_$c"))
    // shuffle-hash by hint, same rationale as PageRank.step: the state side
    // is vertex-sized (never broadcast it blindly), and a sort-merge join
    // would sort the EDGE side — pure waste at 10^12 edges
    val toDst = msgToDst.map { m =>
      gated.join(srcState.hint("shuffle_hash"), col("src") === col("src_vid"))
        .select(col("dst").as("vid"), m.as("msg"))
    }
    val toSrc = msgToSrc.map { m =>
      gated.join(dstState.hint("shuffle_hash"), col("dst") === col("dst_vid"))
        .select(col("src").as("vid"), m.as("msg"))
    }
    (toDst.toSeq ++ toSrc.toSeq).reduce(_ union _)
      .groupBy("vid").agg(merge.as("msg"))
  }

  /** `Graph.mapVertices` / `Graph.mapEdges` (`Graph.scala:192-241`): attribute
    * projections (new PSMatrix copies in the reference; pure selects here). */
  def mapVertices(vertices: DataFrame, colName: String, f: Column): DataFrame =
    vertices.withColumn(colName, f)

  def mapEdges(edges: DataFrame, colName: String, f: Column): DataFrame =
    edges.withColumn(colName, f)

  /** Per-neighbor-type adjacency (the reference's `NeighTN` typed neighbor
    * tables, `GC/core/data/NeighTN.scala:10-45`): (vid, kind, neighbors).
    * `maxNeighbors` = per-(vid, kind) deterministic k-sample hub guard, same
    * contract as [[adjacency]]. */
  def typedAdjacency(
      edges: DataFrame,
      vertices: DataFrame,
      maxNeighbors: Option[Int] = None): DataFrame = {
    val typed = LinkGraph.symmetrize(edges)
      .join(vertices.select(col("vid").as("dst"), col("kind")), "dst")
    maxNeighbors match {
      case None => // single shuffle: collect_set dedups with map-side combine
        typed.groupBy(col("src").as("vid"), col("kind"))
          .agg(sort_array(collect_set(col("dst"))).as("neighbors"))
      case Some(k) => // dedup shuffle only ahead of the rank window
        val w = org.apache.spark.sql.expressions.Window.partitionBy("src", "kind")
          .orderBy(graft.functions.Samplers.detUniform(col("src"), col("dst")).asc,
            col("dst").asc)
        typed.select("src", "kind", "dst").distinct()
          .withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
          .groupBy(col("src").as("vid"), col("kind"))
          .agg(sort_array(collect_list(col("dst"))).as("neighbors"))
    }
  }

  def numVertices(vertices: DataFrame): Long = vertices.count()
  def numEdges(edges: DataFrame): Long = edges.count()

  /** `Graph.maxVertexId`/`minVertexId` (`Graph.scala:37-45,539-551`). */
  def vertexIdBounds(edges: DataFrame): (Long, Long) = {
    val r = edges.agg(
      min(least(col("src"), col("dst"))).as("mn"),
      max(greatest(col("src"), col("dst"))).as("mx")).head()
    (r.getLong(0), r.getLong(1))
  }
}
