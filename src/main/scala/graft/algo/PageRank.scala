package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.core.{Checkpointer, IterativeRunner, IterMetrics}
import graft.derive.LinkGraph

/** Dataset-native PageRank with the reference's exact recurrence
  * (`graph-algo/.../algo/pangerank/PageRank.scala:12-70`):
  *
  *   r ← p·r + (1−p)·Σ_{u∼v} r_u / deg(u)       p = resetProb = 0.15
  *
  * over the *symmetrized* edge set with both-direction count degrees
  * (the reference sends `srcAttr/deg(src)` to dst AND `dstAttr/deg(dst)` to
  * src, `PageRank.scala:62-67`; degree is `calDegree("degreeBoth")`,
  * `Graph.scala:349-385`), init r₀ = 1, convergence when
  * max_v |(1−p)(m_v − r_v)| < tol (`PageRank.scala:53` — the tolerance loop
  * the reference intended; its own early-exit was dead, see SURVEY.md §2.9).
  *
  * Execution shape per iteration — one Catalyst plan:
  *   contribs = adj ⋈ ranks on src   (adj cached + hash-partitioned by src
  *                                    once; the rank side is the small one and
  *                                    broadcasts while it fits, sort-merges
  *                                    beyond that)
  *   msgs     = contribs groupBy dst agg sum   (partial map-side combine makes
  *                                    hub skew a non-issue for sums — the
  *                                    Spark answer to the reference's
  *                                    degree-ordered edge sort)
  *   state'   = state ⋈ msgs on vid (left) → vprog + active flag
  *
  * Computation is Double end-to-end (reference uses Float; 1e-6 parity at
  * scale needs Double accumulators — SURVEY.md §7 hard parts).
  */
object PageRank {

  final case class Result(ranks: DataFrame, iterations: Int, metrics: Vector[IterMetrics])

  /** Symmetrized out-adjacency with 1/deg(src) folded in: derivation lineage
    * truncated to a DISK_ONLY leaf (a big logical plan under the cache would
    * otherwise be re-canonicalized by the CacheManager on every iteration —
    * measured as the dominant serial cost), then hash-partitioned on the join
    * key once and cached COLUMNAR (Dataset cache = compressed batches, ~10×
    * less heap than row caching — GC matters at 10M+ edges). Every superstep
    * reuses this exchange; only the vertex-sized rank table moves. */
  private def contribEdges(edges: DataFrame): DataFrame = {
    val sym = LinkGraph.symmetrize(edges)
    val deg = sym.groupBy("src").agg(count(lit(1)).as("deg"))
    graft.core.IterCache.byKey(
      sym.join(deg, "src")
        .select(col("src"), col("dst"), (lit(1.0) / col("deg")).as("inv")),
      "src")
  }

  /** Tolerance-driven run (the north-rule semantics). */
  def run(
      edges: DataFrame,
      resetProb: Double = 0.15,
      tol: Double = 1e-6,
      maxIter: Int = 100,
      checkpointer: Option[Checkpointer] = None): Result = {
    val adj = contribEdges(edges)
    val init = adj.select(col("src").as("vid")).distinct()
      .select(col("vid"), lit(1.0).as("pr"), lit(true).as("active"))
    val res = IterativeRunner.loop(init, maxIter, checkpointer = checkpointer) {
      (state, _) => step(adj, state, resetProb, tol)
    } { next => next.where(col("active")).count() }
    adj.unpersist(false)
    Result(res.state.select("vid", "pr"), res.iterations, res.metrics)
  }

  /** Fixed-iteration run (oracle-parity variant; no convergence action). */
  def runFixed(edges: DataFrame, iterations: Int, resetProb: Double = 0.15): DataFrame = {
    val adj = contribEdges(edges)
    val init = adj.select(col("src").as("vid")).distinct()
      .select(col("vid"), lit(1.0).as("pr"), lit(true).as("active"))
    val res = IterativeRunner.loop(init, iterations) { (state, _) =>
      step(adj, state, resetProb, tol = 0.0)
    } { _ => 1L } // no early exit: run exactly `iterations` supersteps
    adj.unpersist(false)
    res.state.select("vid", "pr")
  }

  /** One superstep. Joins are SHUFFLE_HASH by hint: the rank table must
    * never be broadcast — a per-iteration driver collect+rebuild measured 2×
    * slower locally and impossible at a billion vertices; with adj already
    * hash-partitioned on src, only the vertex-sized side shuffles. */
  private def step(adj: DataFrame, state: DataFrame, resetProb: Double, tol: Double): DataFrame = {
    val msgs = adj
      .join(state.select(col("vid").as("src"), col("pr")).hint("shuffle_hash"), "src")
      .groupBy(col("dst").as("vid"))
      .agg(sum(col("pr") * col("inv")).as("msum"))
    state
      .join(msgs.hint("shuffle_hash"), Seq("vid"), "left")
      .select(
        col("vid"),
        (lit(resetProb) * col("pr") +
          lit(1.0 - resetProb) * coalesce(col("msum"), lit(0.0))).as("pr"),
        (abs(lit(1.0 - resetProb) * (coalesce(col("msum"), lit(0.0)) - col("pr"))) >= lit(tol))
          .as("active"))
  }
}
