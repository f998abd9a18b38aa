package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle counting. The reference file is an empty stub
  * (`algo/triangle/TriangleCounting.scala:3-5`); contract = GraphX
  * `TriangleCount` semantics (SURVEY.md §2.9): per-vertex number of triangles
  * through it, on the canonical (deduped, loop-free) undirected edge set.
  *
  * Degree orientation (Suri–Vassilvitskii): orient each edge from its
  * lower-(degree, id) endpoint to the higher one, so every out-adjacency list
  * is O(√m) — the same hub trick as the reference's cluster-on-low-degree-
  * endpoint edge sort (`Edge.scala:62-91`), which makes `collect_list` safe
  * even for hubs. Each triangle is then found exactly once, at its (a,b) edge
  * with apex c in adj(a) ∩ adj(b). Per-vertex and total counts are
  * orientation-independent, so the id-ordered DuckDB oracle matches exactly.
  */
object TriangleCount {

  /** Canonical loop-free edge set as a lazy leaf: the triangle pass
    * references it 3× (degree agg + oriented build reads it twice via the
    * degree joins) and [[clusteringCoefficient]] adds a 4th — the leaf
    * materializes the upstream graph derivation once instead of per
    * reference (round 6; replaces an un-unpersisted MEMORY_AND_DISK persist
    * that additionally paid CacheManager plan canonicalization per lookup). */
  private def canon(edges: DataFrame): DataFrame =
    edges
      .select(least(col("src"), col("dst")).as("src"), greatest(col("src"), col("dst")).as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(false)

  /** Rows (a, b, c): one per triangle (each exactly once). */
  def triangles(edges: DataFrame): DataFrame = trianglesOf(canon(edges))

  private def trianglesOf(e: DataFrame): DataFrame = {
    val deg = graft.operators.GraphOps.degrees(e) // (vid, degree)
    val withDeg = e
      .join(deg.select(col("vid").as("src"), col("degree").as("dsrc")), "src")
      .join(deg.select(col("vid").as("dst"), col("degree").as("ddst")), "dst")
    val oriented = withDeg.select(
      when(struct(col("dsrc"), col("src")) < struct(col("ddst"), col("dst")), col("src"))
        .otherwise(col("dst")).as("a"),
      when(struct(col("dsrc"), col("src")) < struct(col("ddst"), col("dst")), col("dst"))
        .otherwise(col("src")).as("b"))
    val adj = oriented.groupBy(col("a")).agg(sort_array(collect_list(col("b"))).as("nbrs"))
    oriented
      .join(adj.select(col("a"), col("nbrs").as("na")), "a")
      .join(adj.select(col("a").as("b"), col("nbrs").as("nb")), "b")
      .select(col("a"), col("b"), explode(array_intersect(col("na"), col("nb"))).as("c"))
  }

  /** (vid, triangles) for every vertex in `vertices` (0 when none). */
  def perVertex(edges: DataFrame, vertices: DataFrame): DataFrame =
    perVertexOf(triangles(edges), vertices)

  private def perVertexOf(tri0: DataFrame, vertices: DataFrame): DataFrame = {
    // leaf: the corner union references the triangle table 3× — without it
    // the whole oriented-join triangle enumeration runs three times
    val tri = tri0.localCheckpoint(false)
    val corners = tri.select(col("a").as("vid"))
      .union(tri.select(col("b").as("vid")))
      .union(tri.select(col("c").as("vid")))
    val counts = corners.groupBy("vid").agg(count(lit(1)).as("triangles"))
    vertices.select(col("vid"))
      .join(counts, Seq("vid"), "left")
      .select(col("vid"), coalesce(col("triangles"), lit(0L)).as("triangles"))
  }

  def total(edges: DataFrame): Long = triangles(edges).count()

  /** Local clustering coefficient per vertex: 2·tri(v) / (deg(v)·(deg(v)−1)),
    * 0 when deg < 2. Exact integers on both sides of one division, so the
    * doubles are bit-portable to the SQL oracle. Degree here is the
    * distinct-neighbor count over the same canonical loop-free edge set the
    * triangle pass dedups to. */
  def clusteringCoefficient(edges: DataFrame, vertices: DataFrame): DataFrame = {
    val e = canon(edges) // ONE leaf feeds both the triangle pass and degrees
    val deg = graft.operators.GraphOps.degrees(e)
    perVertexOf(trianglesOf(e), vertices)
      .join(deg, Seq("vid"), "left")
      .select(col("vid"), col("triangles"),
        coalesce(col("degree"), lit(0L)).as("degree"))
      .withColumn("lcc",
        when(col("degree") < 2, lit(0.0))
          .otherwise((lit(2L) * col("triangles")).cast("double") /
            (col("degree") * (col("degree") - 1)).cast("double")))
  }
}
