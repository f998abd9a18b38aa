package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Neighborhood samplers — the Dataset re-expression of the reference's
  * sampler stack (`graph-core/.../core/sampler/`: `Simple`, `Reservoir`
  * uniform-k, `BetWheel` weighted-1, `ARes` weighted-k,
  * `ARes.scala:6-38`). The reference draws from a GLOBAL `new Random()`
  * (`package.scala:11`) so its samples are irreproducible across runs; ours
  * use a per-edge deterministic uniform, so results are seed-stable across
  * runs AND partitionings (SURVEY.md §7 determinism requirement) and can be
  * verified by a SQL oracle with the same arithmetic.
  */
object Samplers {

  /** Deterministic uniform in (0, 1]: pure integer arithmetic on (src, dst,
    * seed), portable to any SQL engine (no engine hash functions). */
  def detUniform(src: Column, dst: Column, seed: Long = 7L): Column =
    ((pmod(src * lit(2654435761L) + dst * lit(40503L) + lit(seed), lit(1000003L)) + 1L)
      .cast("double")) / lit(1000004.0)

  /** Uniform k-sample of neighbors per src (Reservoir semantics). */
  def uniformK(edges: DataFrame, k: Int, seed: Long = 7L): DataFrame = {
    val w = Window.partitionBy("src")
      .orderBy(detUniform(col("src"), col("dst"), seed).asc, col("dst").asc)
    edges.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
      .select("src", "rnk", "dst")
  }

  /** Weighted k-sample per src: A-Res (Efraimidis–Spirakis) key
    * u^(1/weight), top-k by key — the reference's `ARes` min-heap as a
    * ranking window. */
  def weightedK(edges: DataFrame, k: Int, seed: Long = 7L): DataFrame = {
    val key = pow(detUniform(col("src"), col("dst"), seed), lit(1.0) / col("weight"))
    val w = Window.partitionBy("src").orderBy(key.desc, col("dst").asc)
    edges.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
      .select("src", "rnk", "dst")
  }

  /** Neighbor-kind column for the typed samplers: dst's `kind` joined from
    * the vertex table (broadcast-eligible dictionary side at scale — the
    * edge side keeps its partitioning). */
  private def withDstKind(edges: DataFrame, vertices: DataFrame): DataFrame =
    edges.join(vertices.select(col("vid").as("dst"), col("kind")), "dst")

  /** PER-NEIGHBOR-TYPE uniform k-sample (the reference's `NeighTN` typed
    * neighbor tables, `GC/core/data/NeighTN.scala:10-45`: k neighbors kept
    * per (vertex, neighbor type), not k overall): composite (src, dst-kind)
    * ranking window over the same deterministic uniform as [[uniformK]].
    * Output (src, kind, rnk, dst), rnk ∈ [1, k] within each (src, kind). */
  def uniformKTyped(edges: DataFrame, vertices: DataFrame, k: Int, seed: Long = 7L): DataFrame = {
    val w = Window.partitionBy("src", "kind")
      .orderBy(detUniform(col("src"), col("dst"), seed).asc, col("dst").asc)
    withDstKind(edges, vertices)
      .withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
      .select("src", "kind", "rnk", "dst")
  }

  /** PER-NEIGHBOR-TYPE weighted k-sample (`NeighTNW.scala:10-40`): A-Res key
    * within each (src, dst-kind) group — [[weightedK]]'s arithmetic over the
    * composite key. */
  def weightedKTyped(edges: DataFrame, vertices: DataFrame, k: Int, seed: Long = 7L): DataFrame = {
    val key = pow(detUniform(col("src"), col("dst"), seed), lit(1.0) / col("weight"))
    val w = Window.partitionBy("src", "kind").orderBy(key.desc, col("dst").asc)
    withDstKind(edges, vertices)
      .withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
      .select("src", "kind", "rnk", "dst")
  }
}
