package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source shortest paths over the undirected link graph: hop-count BFS
  * (`weighted = false`) or weighted min-plus Bellman–Ford (`weighted = true`,
  * edge weights ≥ 1 from the canonical co-occurrence counts). GraphX ships
  * `lib.ShortestPaths` (landmark BFS); the reference has no analog — this is
  * the landmark-distance operator a link-graph engine needs for closeness /
  * reachability features.
  *
  * Superstep = the standard frontier relaxation: only vertices whose distance
  * IMPROVED last round publish `dist + w` to their neighbors (frontier
  * semi-join via the `active` flag — identical shape to
  * [[ConnectedComponents.minPropagation]]), a min partial-agg combines
  * map-side, and a left join folds the candidate into the running state.
  * Rounds are O(hop diameter) unweighted / O(longest relaxing chain)
  * weighted; both are small on a transcript co-occurrence graph (everything
  * is ≤ a few hops through shared tools). One exchange per superstep, active
  * frontier shrinks monotonically after the wave passes.
  */
object ShortestPaths {

  final case class Result(distances: DataFrame, iterations: Int)

  /** @param sources  (vid) landmark set — distance 0 seeds.
    * @return distances (vid, dist) for EVERY vertex in `vertices`;
    *         unreachable vertices carry dist = -1. */
  def run(
      edges: DataFrame,
      vertices: DataFrame,
      sources: DataFrame,
      weighted: Boolean = false,
      maxIter: Int = 100): Result = {
    val symw = edges
      .select(col("src"), col("dst"),
        (if (weighted) col("weight") else lit(1L)).cast("long").as("w"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst"),
        (if (weighted) col("weight") else lit(1L)).cast("long").as("w")))
    val sym = graft.core.IterCache.byKey(symw, "src")

    val init = vertices.select(col("vid"))
      .join(sources.select(col("vid"), lit(true).as("is_src")), Seq("vid"), "left")
      .select(col("vid"),
        when(col("is_src"), lit(0L)).otherwise(lit(null).cast("long")).as("dist"),
        coalesce(col("is_src"), lit(false)).as("active"))

    val res = graft.core.IterativeRunner.loop(init, maxIter) { (state, _) =>
      val msgs = sym
        .join(state.where(col("active")).select(col("vid").as("src"), col("dist"))
          .hint("shuffle_hash"), "src")
        .groupBy(col("dst").as("vid"))
        .agg(min(col("dist") + col("w")).as("cand"))
      state.join(msgs, Seq("vid"), "left").select(
        col("vid"),
        least(col("dist"), col("cand")).as("dist"), // least skips nulls
        (col("cand").isNotNull &&
          (col("dist").isNull || col("cand") < col("dist"))).as("active"))
    } { next => next.where(col("active")).count() }

    val out = res.state
      .select(col("vid"), coalesce(col("dist"), lit(-1L)).as("dist"))
      .localCheckpoint(false)
    sym.unpersist(false)
    Result(out, res.iterations)
  }
}
