package graft

/** DuckDB oracle SQL for SparkEntry.queries. Each query's SQL recomputes the
  * full derivation (events → transcripts → vertices → edges → algorithm) in
  * portable SQL so the driver's DuckDB run is independent of the engine.
  * Float outputs are rounded to 6 decimals on BOTH sides; everything else is
  * exact integers/strings. All decimal literals are cast to DOUBLE (DuckDB
  * would otherwise use DECIMAL arithmetic and diverge from Spark's doubles).
  */
object Oracles {

  /** events → transcripts → vertex dictionary → canonical weighted edges.
    * Mirrors graft.derive.LinkGraph.{transcriptsFromEvents, fromTranscripts}
    * exactly (same orderings, same key prefixes, same 1-based row_number).
    */
  val graphCtes: String =
    """t0 AS MATERIALIZED (
      SELECT 'c' || lpad(CAST(user_id AS VARCHAR), 6, '0') AS conv_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INTEGER) AS turn_idx,
             props AS text, event_type AS tool, ts
      FROM events
    ), transcripts AS MATERIALIZED (
      SELECT conv_id, turn_idx,
             CASE turn_idx % 3 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
             text, tool, ts
      FROM t0
    ), convtool AS MATERIALIZED (
      SELECT conv_id, tool, COUNT(*) AS w FROM transcripts WHERE tool IS NOT NULL GROUP BY conv_id, tool
    ), vkeys AS MATERIALIZED (
      SELECT DISTINCT 'conv:' || conv_id AS key FROM convtool
      UNION
      SELECT DISTINCT 'tool:' || tool AS key FROM convtool
    ), vertices AS MATERIALIZED (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY key) AS BIGINT) AS vid, key,
             substr(key, 1, 4) AS kind
      FROM vkeys
    ), tooltool AS MATERIALIZED (
      SELECT a.tool AS t1, b.tool AS t2, COUNT(*) AS w
      FROM (SELECT DISTINCT conv_id, tool FROM convtool) a
      JOIN (SELECT DISTINCT conv_id, tool FROM convtool) b
        ON a.conv_id = b.conv_id AND a.tool < b.tool
      GROUP BY a.tool, b.tool
    ), edges AS MATERIALIZED (
      SELECT v1.vid AS src, v2.vid AS dst, CAST(c.w AS BIGINT) AS weight
      FROM convtool c
      JOIN vertices v1 ON v1.key = 'conv:' || c.conv_id
      JOIN vertices v2 ON v2.key = 'tool:' || c.tool
      UNION ALL
      SELECT v1.vid, v2.vid, CAST(t.w AS BIGINT)
      FROM tooltool t
      JOIN vertices v1 ON v1.key = 'tool:' || t.t1
      JOIN vertices v2 ON v2.key = 'tool:' || t.t2
    ), sym AS MATERIALIZED (
      SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges
    )"""

  /** PageRank chain: k iterations of r ← p·r + (1−p)·Σ r_u/deg(u) over sym. */
  def pagerankChain(k: Int, fromVertices: String = "vertices"): String = {
    val iters = (1 to k).map { i =>
      s"""r$i AS MATERIALIZED (
        SELECT r.vid,
               CAST(0.15 AS DOUBLE) * r.pr + CAST(0.85 AS DOUBLE) * COALESCE(m.s, CAST(0 AS DOUBLE)) AS pr
        FROM r${i - 1} r
        LEFT JOIN (
          SELECT a.dst AS vid, SUM(p.pr * a.inv) AS s
          FROM adj a JOIN r${i - 1} p ON p.vid = a.src
          GROUP BY a.dst
        ) m ON m.vid = r.vid
      )"""
    }.mkString(", ")
    s"""deg AS MATERIALIZED (SELECT src, COUNT(*) AS d FROM sym GROUP BY src),
        adj AS MATERIALIZED (SELECT s.src, s.dst, CAST(1.0 AS DOUBLE) / d.d AS inv FROM sym s JOIN deg d ON d.src = s.src),
        r0 AS MATERIALIZED (SELECT vid, CAST(1.0 AS DOUBLE) AS pr FROM $fromVertices), $iters"""
  }

  /** LPA chain: k supersteps, argmax neighbor label, tie → min label. */
  def lpaChain(k: Int): String = {
    val iters = (1 to k).map { i =>
      s"""l$i AS MATERIALIZED (
        SELECT v.vid, COALESCE(nl.lab, v.lab) AS lab
        FROM l${i - 1} v
        LEFT JOIN (
          SELECT vid, lab FROM (
            SELECT s.dst AS vid, l.lab,
                   ROW_NUMBER() OVER (PARTITION BY s.dst ORDER BY COUNT(*) DESC, l.lab ASC) AS rn
            FROM sym s JOIN l${i - 1} l ON l.vid = s.src
            GROUP BY s.dst, l.lab
          ) x WHERE rn = 1
        ) nl ON nl.vid = v.vid
      )"""
    }.mkString(", ")
    s"l0 AS MATERIALIZED (SELECT vid, CAST(vid AS BIGINT) AS lab FROM vertices), $iters"
  }

  val qTranscripts: String =
    s"""WITH $graphCtes
       SELECT conv_id, turn_idx, role, text, tool, epoch_us(ts) AS ts_us
       FROM transcripts ORDER BY conv_id, turn_idx"""

  val qVertices: String =
    s"WITH $graphCtes SELECT vid, key, kind FROM vertices ORDER BY vid"

  val qEdges: String =
    s"WITH $graphCtes SELECT src, dst, weight FROM edges ORDER BY src, dst"

  val qDegree: String =
    s"""WITH $graphCtes
       SELECT src AS vid, CAST(COUNT(*) AS BIGINT) AS degree FROM sym GROUP BY src ORDER BY vid"""

  val qAdjacency: String =
    s"""WITH $graphCtes
       SELECT src AS vid, string_agg(CAST(dst AS VARCHAR), ',' ORDER BY dst) AS neighbors
       FROM (SELECT DISTINCT src, dst FROM sym) GROUP BY src ORDER BY vid"""

  val qPagerank: String =
    s"""WITH $graphCtes, ${pagerankChain(10)}
       SELECT vid, ROUND(pr, 6) AS pr FROM r10 ORDER BY vid"""

  val qCc: String =
    s"""WITH RECURSIVE $graphCtes, reach(v, m) AS (
         SELECT vid, vid FROM vertices
         UNION
         SELECT s.dst, r.m FROM reach r JOIN sym s ON s.src = r.v
       )
       SELECT v AS vid, MIN(m) AS component FROM reach GROUP BY v ORDER BY vid"""

  val qLpa: String =
    s"""WITH $graphCtes, ${lpaChain(5)}
       SELECT vid, lab AS label FROM l5 ORDER BY vid"""

  val qTriangles: String =
    s"""WITH $graphCtes, tri AS MATERIALIZED (
         SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
         FROM edges e1
         JOIN edges e2 ON e2.src = e1.dst
         JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
       ), corners AS MATERIALIZED (
         SELECT a AS vid FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
       )
       SELECT v.vid, CAST(COALESCE(t.c, 0) AS BIGINT) AS triangles
       FROM vertices v
       LEFT JOIN (SELECT vid, COUNT(*) AS c FROM corners GROUP BY vid) t ON t.vid = v.vid
       ORDER BY v.vid"""

  val qTriangleTotal: String =
    s"""WITH $graphCtes
       SELECT CAST(COUNT(*) AS BIGINT) AS triangles
       FROM edges e1
       JOIN edges e2 ON e2.src = e1.dst
       JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst"""

  val qSubgraph: String =
    s"""WITH $graphCtes
       SELECT src, dst, weight FROM edges WHERE weight >= 2 ORDER BY src, dst"""

  val qReverse: String =
    s"""WITH $graphCtes
       SELECT dst AS src, src AS dst, weight FROM edges ORDER BY src, dst"""

  /** Customer–supplier co-purchase bipartite graph (orders ⋈ lineitem), the
    * larger second topology; PageRank 10 iterations. */
  val csCtes: String =
    """pairs AS MATERIALIZED (
      SELECT 'cust:' || lpad(CAST(o.o_custkey AS VARCHAR), 9, '0') AS akey,
             'supp:' || lpad(CAST(l.l_suppkey AS VARCHAR), 9, '0') AS bkey
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ), agg AS MATERIALIZED (
      SELECT akey, bkey, COUNT(*) AS w FROM pairs GROUP BY akey, bkey
    ), vkeys AS MATERIALIZED (
      SELECT DISTINCT akey AS key FROM agg UNION SELECT DISTINCT bkey FROM agg
    ), vertices AS MATERIALIZED (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY key) AS BIGINT) AS vid, key FROM vkeys
    ), edges AS MATERIALIZED (
      SELECT va.vid AS src, vb.vid AS dst, CAST(a.w AS BIGINT) AS weight
      FROM agg a
      JOIN vertices va ON va.key = a.akey
      JOIN vertices vb ON vb.key = a.bkey
    ), sym AS MATERIALIZED (
      SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges
    )"""

  val qPagerankCs: String =
    s"""WITH $csCtes, ${pagerankChain(10)}
       SELECT vid, ROUND(pr, 6) AS pr FROM r10 ORDER BY vid"""
}
