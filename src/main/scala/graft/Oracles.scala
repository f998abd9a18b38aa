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

  /** PageRank chain: k iterations of r ← p·RESET + (1−p)·Σ r_u/deg(u) over
    * sym, where RESET is the running rank (standard chain) or — with
    * `restartCond` — a fixed r₀ seeded 1 where the condition holds
    * (personalized restart, [[graft.algo.PageRank.runRestart]]). ONE copy of
    * the recurrence SQL serves both so the float-parity arithmetic cannot
    * fork. The per-vertex contribution pr/deg is computed on the vertex side
    * (same formulation as graft.algo.PageRank — identical doubles per term).
    */
  def pagerankChain(
      k: Int,
      fromVertices: String = "vertices",
      restartCond: Option[String] = None): String = {
    val resetRef = if (restartCond.isDefined) "r.r0" else "r.pr"
    val carry = if (restartCond.isDefined) ", r.r0" else ""
    val iters = (1 to k).map { i =>
      s"""r$i AS MATERIALIZED (
        SELECT r.vid$carry,
               CAST(0.15 AS DOUBLE) * $resetRef + CAST(0.85 AS DOUBLE) * COALESCE(m.s, CAST(0 AS DOUBLE)) AS pr
        FROM r${i - 1} r
        LEFT JOIN (
          SELECT s.dst AS vid, SUM(c.contrib) AS s
          FROM sym s JOIN (
            SELECT r2.vid, r2.pr / d.d AS contrib
            FROM r${i - 1} r2 JOIN deg d ON d.src = r2.vid
          ) c ON c.vid = s.src
          GROUP BY s.dst
        ) m ON m.vid = r.vid
      )"""
    }.mkString(", ")
    val r0 = restartCond match {
      case Some(cond) =>
        s"""r0 AS MATERIALIZED (SELECT vid,
           CASE WHEN $cond THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS r0,
           CASE WHEN $cond THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS pr
           FROM $fromVertices)"""
      case None =>
        s"r0 AS MATERIALIZED (SELECT vid, CAST(1.0 AS DOUBLE) AS pr FROM $fromVertices)"
    }
    s"""deg AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS DOUBLE) AS d FROM sym GROUP BY src),
        $r0, $iters"""
  }

  /** Frontier (delta) PageRank chain — replays
    * [[graft.algo.PageRank.runFrontier]] exactly for k iterations, including
    * the per-vertex freeze/reactivate schedule: state (pr, deg, sent, msum,
    * active); the active frontier publishes contribution DELTAS
    * (pr/deg − sent), msum accumulates them, a vertex is active iff
    * |(1−p)·(msum_new − pr_old)| ≥ freezeTol. Same doubles per term as the
    * engine (literals cast to DOUBLE; the sum order caveat is the same one
    * every chain oracle carries). `freezeTol` is stringified from the
    * engine's own Double so the threshold constant cannot fork. */
  def frontierChain(k: Int, freezeTol: Double): String = {
    val ft = s"CAST($freezeTol AS DOUBLE)"
    val iters = (1 to k).map { i =>
      s"""fm$i AS MATERIALIZED (
        SELECT s.dst AS vid, SUM(c.dc) AS dsum
        FROM sym s JOIN (
          SELECT vid, (CASE WHEN deg > 0 THEN pr / deg ELSE CAST(0 AS DOUBLE) END) - sent AS dc
          FROM f${i - 1} WHERE active
        ) c ON c.vid = s.src
        GROUP BY s.dst
      ), f$i AS MATERIALIZED (
        SELECT r.vid,
               CASE WHEN r.active
                 THEN CAST(0.15 AS DOUBLE) * r.pr + CAST(0.85 AS DOUBLE) * (r.msum + COALESCE(m.dsum, CAST(0 AS DOUBLE)))
                 ELSE r.pr END AS pr,
               r.deg,
               CASE WHEN r.active
                 THEN (CASE WHEN r.deg > 0 THEN r.pr / r.deg ELSE CAST(0 AS DOUBLE) END)
                 ELSE r.sent END AS sent,
               r.msum + COALESCE(m.dsum, CAST(0 AS DOUBLE)) AS msum,
               ABS(CAST(0.85 AS DOUBLE) * ((r.msum + COALESCE(m.dsum, CAST(0 AS DOUBLE))) - r.pr)) >= $ft AS active
        FROM f${i - 1} r LEFT JOIN fm$i m ON m.vid = r.vid
      )"""
    }.mkString(", ")
    s"""deg AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS DOUBLE) AS d FROM sym GROUP BY src),
        f0 AS MATERIALIZED (
          SELECT v.vid, CAST(1.0 AS DOUBLE) AS pr, d.d AS deg,
                 CAST(0.0 AS DOUBLE) AS sent, CAST(0.0 AS DOUBLE) AS msum, TRUE AS active
          FROM vertices v JOIN deg d ON d.src = v.vid),
        $iters"""
  }

  /** k-core peel chain ([[graft.algo.KCore.run]]): n rounds, each keeping
    * survivors whose degree within the surviving subgraph is ≥ k (the final
    * round is the engine's all-quiet confirmation, a no-op here too). */
  def kcoreChain(n: Int, k: Long): String = {
    val iters = (1 to n).map { i =>
      s"""kc$i AS MATERIALIZED (
        SELECT d.vid FROM (
          SELECT s.src AS vid, COUNT(*) AS c FROM sym s
          JOIN kc${i - 1} a ON a.vid = s.src
          JOIN kc${i - 1} b ON b.vid = s.dst
          GROUP BY s.src) d
        WHERE d.c >= $k
      )"""
    }.mkString(", ")
    s"kc0 AS MATERIALIZED (SELECT vid FROM vertices), $iters"
  }

  /** Shortest-paths relaxation chain ([[graft.algo.ShortestPaths.run]]): n
    * frontier rounds of min-plus relaxation from the deterministic landmark
    * set (tool vertices with vid % 7 = 0 — same set as [[qPpr]]); hop BFS
    * when `weighted` is false, Bellman–Ford over edge weights otherwise. */
  def ssspChain(n: Int, weighted: Boolean): String = {
    val w = if (weighted) "CAST(weight AS BIGINT)" else "CAST(1 AS BIGINT)"
    val iters = (1 to n).map { i =>
      s"""bm$i AS MATERIALIZED (
        SELECT s.dst AS vid, MIN(f.dist + s.w) AS cand
        FROM symw s JOIN (SELECT vid, dist FROM b${i - 1} WHERE active) f ON f.vid = s.src
        GROUP BY s.dst
      ), b$i AS MATERIALIZED (
        SELECT b.vid,
               CASE WHEN m.cand IS NOT NULL AND (b.dist IS NULL OR m.cand < b.dist)
                 THEN m.cand ELSE b.dist END AS dist,
               COALESCE(m.cand IS NOT NULL AND (b.dist IS NULL OR m.cand < b.dist), FALSE) AS active
        FROM b${i - 1} b LEFT JOIN bm$i m ON m.vid = b.vid
      )"""
    }.mkString(", ")
    s"""symw AS MATERIALIZED (
          SELECT src, dst, $w AS w FROM edges
          UNION ALL
          SELECT dst, src, $w FROM edges),
        srcs AS MATERIALIZED (SELECT vid FROM vertices WHERE kind = 'tool' AND vid % 7 = 0),
        b0 AS MATERIALIZED (
          SELECT v.vid,
                 CASE WHEN s.vid IS NOT NULL THEN CAST(0 AS BIGINT) END AS dist,
                 s.vid IS NOT NULL AS active
          FROM vertices v LEFT JOIN srcs s ON s.vid = v.vid),
        $iters"""
  }

  /** Weighted PageRank chain ([[graft.algo.PageRank.runWeighted]]): k
    * rounds of r ← p·r + (1−p)·Σ (r_u/wdeg(u))·w_uv over the symmetric
    * WEIGHTED edges — contribution computed vertex-side (r/wdeg) and
    * multiplied by w inside the per-dst sum, the identical op order as the
    * engine. */
  def weightedPagerankChain(k: Int): String = {
    val iters = (1 to k).map { i =>
      s"""wr$i AS MATERIALIZED (
        SELECT r.vid,
               CAST(0.15 AS DOUBLE) * r.pr + CAST(0.85 AS DOUBLE) * COALESCE(m.s, CAST(0 AS DOUBLE)) AS pr,
               r.wdeg
        FROM wr${i - 1} r
        LEFT JOIN (
          SELECT s.dst AS vid, SUM((r2.pr / r2.wdeg) * s.weight) AS s
          FROM symw s JOIN wr${i - 1} r2 ON r2.vid = s.src
          GROUP BY s.dst
        ) m ON m.vid = r.vid
      )"""
    }.mkString(", ")
    s"""symw AS MATERIALIZED (
          SELECT src, dst, weight FROM edges
          UNION ALL SELECT dst, src, weight FROM edges),
        wdeg AS MATERIALIZED (
          SELECT src, CAST(SUM(weight) AS DOUBLE) AS d FROM symw GROUP BY src),
        wr0 AS MATERIALIZED (
          SELECT src AS vid, CAST(1.0 AS DOUBLE) AS pr, d AS wdeg FROM wdeg),
        $iters"""
  }

  /** HITS chain ([[graft.algo.Hits.run]]): k rounds of the mutual
    * recursion over the DIRECTED canonical edges, max-normalized each
    * half-step (max is float-order-independent — the reason the engine
    * normalizes by max instead of an L1/L2 sum). */
  def hitsChain(k: Int): String = {
    val iters = (1 to k).map { i =>
      s"""ar$i AS MATERIALIZED (
        SELECT e.dst AS vid, SUM(h.hub) AS araw
        FROM edges e JOIN h${i - 1} h ON h.vid = e.src GROUP BY e.dst
      ), am$i AS MATERIALIZED (SELECT MAX(araw) AS amax FROM ar$i),
      au$i AS MATERIALIZED (
        SELECT v.vid, COALESCE(a.araw / m.amax, CAST(0 AS DOUBLE)) AS auth
        FROM h${i - 1} v LEFT JOIN ar$i a ON a.vid = v.vid CROSS JOIN am$i m
      ), hr$i AS MATERIALIZED (
        SELECT e.src AS vid, SUM(a.auth) AS hraw
        FROM edges e JOIN au$i a ON a.vid = e.dst GROUP BY e.src
      ), hm$i AS MATERIALIZED (SELECT MAX(hraw) AS hmax FROM hr$i),
      h$i AS MATERIALIZED (
        SELECT v.vid, COALESCE(h.hraw / m.hmax, CAST(0 AS DOUBLE)) AS hub, v.auth
        FROM au$i v LEFT JOIN hr$i h ON h.vid = v.vid CROSS JOIN hm$i m
      )"""
    }.mkString(", ")
    s"""h0 AS MATERIALIZED (
          SELECT vid, CAST(1.0 AS DOUBLE) AS hub, CAST(1.0 AS DOUBLE) AS auth
          FROM vertices),
        $iters"""
  }

  /** Per-landmark BFS chain ([[graft.algo.ShortestPaths.landmarkDistances]]):
    * sparse (vid, lm, dist) state from the deterministic landmark set, n
    * rounds of frontier relaxation with a FULL join folding newly discovered
    * pairs in — the GraphX `lib.ShortestPaths` distance-map semantics. */
  def landmarkChain(n: Int): String = {
    val iters = (1 to n).map { i =>
      s"""lmm$i AS MATERIALIZED (
        SELECT s.dst AS vid, f.lm, MIN(f.dist + 1) AS cand
        FROM sym s JOIN (SELECT vid, lm, dist FROM lm${i - 1} WHERE active) f
          ON f.vid = s.src
        GROUP BY s.dst, f.lm
      ), lm$i AS MATERIALIZED (
        SELECT COALESCE(a.vid, m.vid) AS vid, COALESCE(a.lm, m.lm) AS lm,
               CASE WHEN m.cand IS NOT NULL AND (a.dist IS NULL OR m.cand < a.dist)
                 THEN m.cand ELSE a.dist END AS dist,
               COALESCE(m.cand IS NOT NULL AND (a.dist IS NULL OR m.cand < a.dist), FALSE) AS active
        FROM lm${i - 1} a FULL JOIN lmm$i m ON m.vid = a.vid AND m.lm = a.lm
      )"""
    }.mkString(", ")
    s"""lmsrcs AS MATERIALIZED (
          SELECT vid FROM vertices WHERE kind = 'tool' AND vid % 2 = 0),
        lm0 AS MATERIALIZED (
          SELECT vid, vid AS lm, CAST(0 AS BIGINT) AS dist, TRUE AS active FROM lmsrcs),
        $iters"""
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

  /** Session-index CTE scaffold shared by the sessionization-family oracles
    * ([[graft.derive.Sessionize]]): lag gap flag → running-sum 0-based
    * session index per turn, gap literal taken from the engine's constant. */
  private val sessionCtes: String = {
    val gapUs = graft.derive.Sessionize.defaultGapSeconds * 1000000L
    s"""sturns AS MATERIALIZED (
         SELECT conv_id, turn_idx, role, tool, epoch_us(ts) AS ts_us,
                CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY conv_id ORDER BY turn_idx) IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY conv_id ORDER BY turn_idx) > $gapUs
                     THEN 1 ELSE 0 END AS newf
         FROM transcripts
       ), sidx AS MATERIALIZED (
         SELECT conv_id, role, tool, ts_us,
                SUM(newf) OVER (PARTITION BY conv_id ORDER BY turn_idx ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
         FROM sturns
       )"""
  }

  /** Sessionization replay ([[graft.derive.Sessionize.sessionStats]]). */
  val qSessions: String =
    s"""WITH $graphCtes, $sessionCtes
       SELECT conv_id, CAST(session_idx AS BIGINT) AS session_idx,
              CAST(COUNT(*) AS BIGINT) AS n_turns,
              MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
              CAST(COUNT(DISTINCT tool) AS BIGINT) AS n_tools
       FROM sidx GROUP BY conv_id, session_idx ORDER BY conv_id, session_idx"""

  /** Role-transition counts ([[graft.derive.TranscriptAnalytics
    * .roleTransitions]]): lag over turn order, global (prev, cur) counts. */
  val qRoleTransitions: String =
    s"""WITH $graphCtes, rr AS MATERIALIZED (
         SELECT role, lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role
         FROM transcripts
       )
       SELECT prev_role, role, CAST(COUNT(*) AS BIGINT) AS n
       FROM rr WHERE prev_role IS NOT NULL
       GROUP BY prev_role, role ORDER BY prev_role, role"""

  /** Directed tool bigrams ([[graft.derive.TranscriptAnalytics.toolBigrams]]):
    * tool-less turns dropped BEFORE the lag, so bigrams span them. */
  val qToolBigrams: String =
    s"""WITH $graphCtes, tb AS MATERIALIZED (
         SELECT tool, lag(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_tool
         FROM transcripts WHERE tool IS NOT NULL
       )
       SELECT prev_tool, tool, CAST(COUNT(*) AS BIGINT) AS n
       FROM tb WHERE prev_tool IS NOT NULL
       GROUP BY prev_tool, tool ORDER BY prev_tool, tool"""

  /** Inter-turn gap stats ([[graft.derive.TranscriptAnalytics.latencyStats]]):
    * exact integer sums; avg emitted as ONE double division of exact ints so
    * the engines agree bit-for-bit. */
  val qLatency: String =
    s"""WITH $graphCtes, g AS MATERIALIZED (
         SELECT conv_id,
                epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS gap_us
         FROM transcripts
       )
       SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
              CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us,
              CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
              CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
              CAST(SUM(gap_us) AS DOUBLE) / COUNT(*) AS avg_gap_us
       FROM g WHERE gap_us IS NOT NULL GROUP BY conv_id ORDER BY conv_id"""

  /** Session-scoped tool co-occurrence ([[graft.derive.TranscriptAnalytics
    * .sessionToolPairs]]): distinct (conv, session, tool) self-join, t1<t2. */
  val qSessionToolPairs: String =
    s"""WITH $graphCtes, $sessionCtes, stp AS MATERIALIZED (
         SELECT DISTINCT conv_id, session_idx, tool FROM sidx WHERE tool IS NOT NULL
       )
       SELECT a.tool AS t1, b.tool AS t2, CAST(COUNT(*) AS BIGINT) AS weight
       FROM stp a JOIN stp b
         ON a.conv_id = b.conv_id AND a.session_idx = b.session_idx AND a.tool < b.tool
       GROUP BY a.tool, b.tool ORDER BY t1, t2"""

  /** Per-conversation summary ([[graft.derive.TranscriptAnalytics
    * .convStats]]). */
  val qConvStats: String =
    s"""WITH $graphCtes, $sessionCtes
       SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_turns,
              CAST(MAX(session_idx) + 1 AS BIGINT) AS n_sessions,
              CAST(COUNT(DISTINCT tool) AS BIGINT) AS n_tools,
              MIN(ts_us) AS first_us, MAX(ts_us) AS last_us,
              CAST(SUM(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT) AS n_user,
              CAST(SUM(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS BIGINT) AS n_assistant
       FROM sidx GROUP BY conv_id ORDER BY conv_id"""

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

  /** Hub-capped adjacency: deterministic 3-sample per vertex — ranked by the
    * SAME portable detUniform arithmetic as graft.functions.Samplers, so the
    * sample replays exactly. */
  val qAdjacencyCapped: String =
    s"""WITH $graphCtes, dedup AS MATERIALIZED (
         SELECT DISTINCT src, dst FROM sym
       ), ranked AS MATERIALIZED (
         SELECT src, dst,
                ROW_NUMBER() OVER (PARTITION BY src ORDER BY
                  (CAST((src * 2654435761 + dst * 40503 + 7) % 1000003 + 1 AS DOUBLE)
                     / CAST(1000004.0 AS DOUBLE)) ASC, dst ASC) AS rnk
         FROM dedup
       )
       SELECT src AS vid, string_agg(CAST(dst AS VARCHAR), ',' ORDER BY dst) AS neighbors
       FROM ranked WHERE rnk <= 3 GROUP BY src ORDER BY vid"""

  val qPagerank: String =
    s"""WITH $graphCtes, ${pagerankChain(10)}
       SELECT vid, ROUND(pr, 6) AS pr FROM r10 ORDER BY vid"""

  /** Personalized PageRank replay ([[graft.algo.PageRank.runRestart]]): 10
    * damped-restart iterations anchored on the deterministic source set
    * (tool vertices with vid % 7 = 0) — the same [[pagerankChain]] scaffold
    * with the reset term anchored on r₀. */
  val qPpr: String =
    s"""WITH $graphCtes, ${pagerankChain(10, restartCond = Some("kind = 'tool' AND vid % 7 = 0"))}
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

  /** Wedge CTE shared by the link-prediction oracles: center z with neighbor
    * pair a < b, over the distinct symmetric adjacency (mirrors
    * [[graft.algo.LinkPrediction]]'s self-join exactly). */
  private val wedgeCtes: String =
    """symd AS MATERIALIZED (SELECT DISTINCT src, dst FROM sym),
       wedge AS MATERIALIZED (
         SELECT x.dst AS a, y.dst AS b, x.src AS z
         FROM symd x JOIN symd y ON y.src = x.src AND x.dst < y.dst
       )"""

  val qCommonNeighbors: String =
    s"""WITH $graphCtes, $wedgeCtes
       SELECT a, b, CAST(COUNT(*) AS BIGINT) AS common
       FROM wedge GROUP BY a, b HAVING COUNT(*) >= 2 ORDER BY a, b"""

  /** Hub-capped variant: wedge centers above the degree cap are dropped
    * before enumeration ([[graft.algo.LinkPrediction]] `maxWedgeDegree`). */
  val qCommonNeighborsCapped: String =
    s"""WITH $graphCtes, symd AS MATERIALIZED (SELECT DISTINCT src, dst FROM sym),
       ok AS MATERIALIZED (
         SELECT src FROM symd GROUP BY src HAVING COUNT(*) <= 20
       ), capped AS MATERIALIZED (
         SELECT s.src, s.dst FROM symd s JOIN ok o ON o.src = s.src
       )
       SELECT x.dst AS a, y.dst AS b, CAST(COUNT(*) AS BIGINT) AS common
       FROM capped x JOIN capped y ON y.src = x.src AND x.dst < y.dst
       GROUP BY x.dst, y.dst HAVING COUNT(*) >= 1 ORDER BY a, b"""

  val qAdamicAdar: String =
    s"""WITH $graphCtes, $wedgeCtes,
       cdeg AS MATERIALIZED (SELECT src, COUNT(*) AS d FROM symd GROUP BY src)
       SELECT w.a, w.b, CAST(COUNT(*) AS BIGINT) AS common,
              ROUND(SUM(CAST(1.0 AS DOUBLE) / ln(CAST(c.d AS DOUBLE))), 6) AS aa
       FROM wedge w JOIN cdeg c ON c.src = w.z
       GROUP BY w.a, w.b HAVING COUNT(*) >= 2 ORDER BY a, b"""

  val qJaccardNeighbors: String =
    s"""WITH $graphCtes, $wedgeCtes,
       deg AS MATERIALIZED (SELECT src AS vid, COUNT(*) AS degree FROM symd GROUP BY src),
       cn AS MATERIALIZED (
         SELECT a, b, COUNT(*) AS common FROM wedge GROUP BY a, b HAVING COUNT(*) >= 2
       )
       SELECT cn.a, cn.b, CAST(cn.common AS BIGINT) AS common,
              ROUND(CAST(cn.common AS DOUBLE) /
                    CAST(da.degree + db.degree - cn.common AS DOUBLE), 6) AS jaccard
       FROM cn JOIN deg da ON da.vid = cn.a JOIN deg db ON db.vid = cn.b
       ORDER BY a, b"""

  val qClusteringCoeff: String =
    s"""WITH $graphCtes, tri AS MATERIALIZED (
         SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
         FROM edges e1
         JOIN edges e2 ON e2.src = e1.dst
         JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
       ), corners AS MATERIALIZED (
         SELECT a AS vid FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
       ), tcount AS MATERIALIZED (
         SELECT vid, COUNT(*) AS c FROM corners GROUP BY vid
       ), deg AS MATERIALIZED (
         SELECT src AS vid, COUNT(*) AS degree FROM sym GROUP BY src
       )
       SELECT v.vid, CAST(COALESCE(t.c, 0) AS BIGINT) AS triangles,
              CAST(COALESCE(d.degree, 0) AS BIGINT) AS degree,
              CASE WHEN COALESCE(d.degree, 0) < 2 THEN CAST(0.0 AS DOUBLE)
                ELSE ROUND(CAST(2 * COALESCE(t.c, 0) AS DOUBLE) /
                           CAST(d.degree * (d.degree - 1) AS DOUBLE), 6) END AS lcc
       FROM vertices v
       LEFT JOIN tcount t ON t.vid = v.vid
       LEFT JOIN deg d ON d.vid = v.vid
       ORDER BY v.vid"""

  val qDegreeHist: String =
    s"""WITH $graphCtes,
       deg AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS BIGINT) AS degree FROM sym GROUP BY src)
       SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_vertices
       FROM deg GROUP BY degree ORDER BY degree"""

  /** Fixed-10-round weighted PageRank replay — static. */
  val qPagerankWeighted: String =
    s"""WITH $graphCtes, ${weightedPagerankChain(10)}
       SELECT vid, ROUND(pr, 6) AS pr FROM wr10 ORDER BY vid"""

  /** Fixed-10-round HITS replay — static (iteration count is not
    * data-dependent, unlike the tolerance chains). */
  val qHits: String =
    s"""WITH $graphCtes, ${hitsChain(10)}
       SELECT vid, ROUND(hub, 6) AS hub, ROUND(auth, 6) AS auth
       FROM h10 ORDER BY vid"""

  /** Degree assortativity replay: exact BIGINT moments over sym, the
    * identical Pearson expression (same op order) evaluated once. */
  val qAssortativity: String =
    s"""WITH $graphCtes,
       deg AS MATERIALIZED (SELECT src AS vid, CAST(COUNT(*) AS BIGINT) AS degree FROM sym GROUP BY src),
       mom AS MATERIALIZED (
         SELECT CAST(COUNT(*) AS BIGINT) AS m,
                SUM(a.degree) AS sx, SUM(b.degree) AS sy,
                SUM(a.degree * a.degree) AS sxx,
                SUM(b.degree * b.degree) AS syy,
                SUM(a.degree * b.degree) AS sxy
         FROM sym s JOIN deg a ON a.vid = s.src JOIN deg b ON b.vid = s.dst
       )
       SELECT m AS m_edges,
              ROUND(CAST(m * sxy - sx * sy AS DOUBLE) /
                (sqrt(CAST(m * sxx - sx * sx AS DOUBLE)) *
                 sqrt(CAST(m * syy - sy * sy AS DOUBLE))), 6) AS assortativity
       FROM mom"""

  val qSubgraph: String =
    s"""WITH $graphCtes
       SELECT src, dst, weight FROM edges WHERE weight >= 2 ORDER BY src, dst"""

  val qReverse: String =
    s"""WITH $graphCtes
       SELECT dst AS src, src AS dst, weight FROM edges ORDER BY src, dst"""

  val qWeightedDegree: String =
    s"""WITH $graphCtes, wsym AS MATERIALIZED (
         SELECT src AS vid, weight FROM edges
         UNION ALL
         SELECT dst AS vid, weight FROM edges
       )
       SELECT vid, CAST(SUM(weight) AS BIGINT) AS weight_sum
       FROM wsym GROUP BY vid ORDER BY vid"""

  /** Typed heterogeneous loader replay: same tokenize/skip/default-weight/
    * self-loop rules as [[graft.sources.GraphLoader.typedEdgeListFile]]
    * (fixture weights are dyadic rationals, so float→double is exact). */
  val qTypedEdgeFile: String =
    s"""WITH lines AS MATERIALIZED (
         SELECT line FROM read_csv('/root/repo/fixtures/typed_edges.txt', header=false,
                                   delim='', columns={'line':'VARCHAR'}, auto_detect=false)
         WHERE line IS NOT NULL AND trim(line) <> '' AND line NOT LIKE '#%'
       ), tok AS MATERIALIZED (
         SELECT regexp_extract_all(trim(line), '\\S+') AS t FROM lines
       )
       SELECT CAST(t[1] AS BIGINT) AS src, CAST(t[2] AS INTEGER) AS src_type,
              CAST(t[3] AS BIGINT) AS dst, CAST(t[4] AS INTEGER) AS dst_type,
              ROUND(CASE WHEN len(t) >= 5 THEN CAST(t[5] AS DOUBLE)
                    ELSE CAST(1.0 AS DOUBLE) END, 6) AS weight
       FROM tok WHERE CAST(t[1] AS BIGINT) <> CAST(t[3] AS BIGINT)
       ORDER BY src, dst"""

  val qMapVertices: String =
    s"""WITH $graphCtes
       SELECT vid, key, kind, CASE WHEN kind = 'conv' THEN 1 ELSE 0 END AS is_conv
       FROM vertices ORDER BY vid"""

  val qMapEdges: String =
    s"""WITH $graphCtes
       SELECT src, dst, weight, weight * weight AS w2 FROM edges ORDER BY src, dst"""

  val qGraphStats: String =
    s"""WITH $graphCtes
       SELECT (SELECT COUNT(*) FROM vertices) AS num_vertices,
              (SELECT COUNT(*) FROM edges) AS num_edges,
              (SELECT MIN(LEAST(src, dst)) FROM edges) AS min_vid,
              (SELECT MAX(GREATEST(src, dst)) FROM edges) AS max_vid"""

  /** Generic aggregateMessages replay (SparkEntry.q_aggmsg): per-vertex
    * deterministic state w = vid%7+1, msgToDst = src_w·weight,
    * msgToSrc = dst_w, merge = sum — the two directed state joins unioned
    * then grouped, exactly [[graft.operators.GraphOps.aggregateMessages]]. */
  val qAggMsg: String =
    s"""WITH $graphCtes, st AS MATERIALIZED (
         SELECT vid, (vid % 7) + 1 AS w FROM vertices
       ), m AS MATERIALIZED (
         SELECT e.dst AS vid, s.w * e.weight AS msg
         FROM edges e JOIN st s ON s.vid = e.src
         UNION ALL
         SELECT e.src AS vid, s.w AS msg
         FROM edges e JOIN st s ON s.vid = e.dst
       )
       SELECT vid, CAST(SUM(msg) AS BIGINT) AS msg
       FROM m GROUP BY vid ORDER BY vid"""

  /** Gated aggregateMessages (EdgeActiveness.Either over frontier
    * vid % 3 = 0): only edges with an active endpoint fire; both message
    * directions as in [[qAggMsg]]. */
  val qAggMsgGated: String =
    s"""WITH $graphCtes, st AS MATERIALIZED (
         SELECT vid, (vid % 7) + 1 AS w FROM vertices
       ), ge AS MATERIALIZED (
         SELECT e.* FROM edges e WHERE e.src % 3 = 0 OR e.dst % 3 = 0
       ), m AS MATERIALIZED (
         SELECT e.dst AS vid, s.w * e.weight AS msg
         FROM ge e JOIN st s ON s.vid = e.src
         UNION ALL
         SELECT e.src AS vid, s.w AS msg
         FROM ge e JOIN st s ON s.vid = e.dst
       )
       SELECT vid, CAST(SUM(msg) AS BIGINT) AS msg
       FROM m GROUP BY vid ORDER BY vid"""

  val qTriplets: String =
    s"""WITH $graphCtes
       SELECT e.src, e.dst, e.weight, v1.key AS src_key, v2.key AS dst_key
       FROM edges e
       JOIN vertices v1 ON v1.vid = e.src
       JOIN vertices v2 ON v2.vid = e.dst
       ORDER BY e.src, e.dst"""

  val qTypedAdjacency: String =
    s"""WITH $graphCtes
       SELECT s.src AS vid, v.kind,
              string_agg(CAST(s.dst AS VARCHAR), ',' ORDER BY s.dst) AS neighbors
       FROM (SELECT DISTINCT src, dst FROM sym) s
       JOIN vertices v ON v.vid = s.dst
       GROUP BY s.src, v.kind ORDER BY vid, kind"""

  /** groupEdges over per-event multi-edges must reproduce the canonical
    * conv→tool weighted arm of the edge derivation. */
  val qGroupEdges: String =
    s"""WITH $graphCtes
       SELECT v1.vid AS src, v2.vid AS dst, CAST(c.w AS BIGINT) AS weight
       FROM convtool c
       JOIN vertices v1 ON v1.key = 'conv:' || c.conv_id
       JOIN vertices v2 ON v2.key = 'tool:' || c.tool
       ORDER BY src, dst"""

  val qMergeLabels: String =
    s"""WITH $graphCtes
       SELECT v.vid, v.key, v.kind,
              CASE WHEN v.vid % 3 = 0 THEN v.vid % 7 ELSE NULL END AS label
       FROM vertices v ORDER BY v.vid"""

  /** Text edge-list loader parity: whole-line read (ctrl-A delim), comment /
    * blank / self-loop filters, whitespace split, optional 3rd-column weight,
    * canonical orientation, duplicate merge. */
  val qEdgeListFile: String =
    s"""WITH lines AS MATERIALIZED (
         SELECT line FROM read_csv('/root/repo/fixtures/cora_sample.txt', header=false,
                                   delim='', columns={'line':'VARCHAR'}, auto_detect=false)
         WHERE line IS NOT NULL AND trim(line) <> '' AND line NOT LIKE '#%'
       ), tok AS MATERIALIZED (
         SELECT regexp_extract_all(trim(line), '\\S+') AS t FROM lines
       ), e AS MATERIALIZED (
         SELECT CAST(t[1] AS BIGINT) AS a, CAST(t[2] AS BIGINT) AS b,
                CASE WHEN len(t) >= 3 THEN CAST(t[3] AS DOUBLE)
                     ELSE CAST(1.0 AS DOUBLE) END AS w
         FROM tok
       )
       SELECT LEAST(a, b) AS src, GREATEST(a, b) AS dst,
              CAST(trunc(SUM(w)) AS BIGINT) AS weight
       FROM e WHERE a <> b GROUP BY 1, 2 ORDER BY src, dst"""

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

  // ---- samplers (deterministic LCG uniform, same arithmetic as
  //      graft.functions.Samplers.detUniform) ----

  private val detU =
    "(CAST((e.src * 2654435761 + e.dst * 40503 + 7) % 1000003 + 1 AS DOUBLE) / CAST(1000004.0 AS DOUBLE))"

  val qSampleUniform: String =
    s"""WITH $graphCtes
       SELECT src, rnk, dst FROM (
         SELECT e.src, e.dst,
                CAST(ROW_NUMBER() OVER (PARTITION BY e.src ORDER BY $detU ASC, e.dst ASC) AS INTEGER) AS rnk
         FROM edges e
       ) x WHERE rnk <= 2 ORDER BY src, rnk"""

  val qSampleWeighted: String =
    s"""WITH $graphCtes
       SELECT src, rnk, dst FROM (
         SELECT e.src, e.dst,
                CAST(ROW_NUMBER() OVER (PARTITION BY e.src
                  ORDER BY power($detU, CAST(1.0 AS DOUBLE) / e.weight) DESC, e.dst ASC) AS INTEGER) AS rnk
         FROM edges e
       ) x WHERE rnk <= 2 ORDER BY src, rnk"""

  /** Per-neighbor-type samplers (NeighTN / NeighTNW parity): the same
    * deterministic draw / A-Res key, ranked within (src, dst-kind). */
  val qSampleTyped: String =
    s"""WITH $graphCtes
       SELECT src, kind, rnk, dst FROM (
         SELECT e.src, v.kind, e.dst,
                CAST(ROW_NUMBER() OVER (PARTITION BY e.src, v.kind
                  ORDER BY $detU ASC, e.dst ASC) AS INTEGER) AS rnk
         FROM edges e JOIN vertices v ON v.vid = e.dst
       ) x WHERE rnk <= 2 ORDER BY src, kind, rnk"""

  val qSampleTypedWeighted: String =
    s"""WITH $graphCtes
       SELECT src, kind, rnk, dst FROM (
         SELECT e.src, v.kind, e.dst,
                CAST(ROW_NUMBER() OVER (PARTITION BY e.src, v.kind
                  ORDER BY power($detU, CAST(1.0 AS DOUBLE) / e.weight) DESC, e.dst ASC) AS INTEGER) AS rnk
         FROM edges e JOIN vertices v ON v.vid = e.dst
       ) x WHERE rnk <= 2 ORDER BY src, kind, rnk"""

  // ---- random walks (portable positional draws — full replay) ----

  /** SQL rendering of [[graft.algo.RandomWalks.mix]]: per-(walk, step, salt)
    * pseudo-uniform in [0, 2000003), pure integer arithmetic. */
  def mixSql(w: String, step: Int, salt: Long): String = {
    val c = step.toLong * 40503L + salt * 97L + 7L
    val t = s"((($w % 1000003) * 2654435761 + $c) % 1000003)"
    s"(($t * $t * 31 + $t * 7 + ($w % 2000003)) % 2000003)"
  }

  /** SQL rendering of [[graft.algo.RandomWalks.wideMix]]: two independently
    * salted mix values combined base-2000003 → a ~42-bit draw, so `% deg` is
    * unbiased-and-complete for hub degrees far beyond 2000003 (the single-mix
    * draw could never reach index ≥ 2000003). Salt offset 777777 matches the
    * engine. */
  def wideMixSql(w: String, step: Int, salt: Long): String =
    s"(${mixSql(w, step, salt)} * 2000003 + ${mixSql(w, step, salt + 777777L)})"

  /** DeepWalk replay: positional index (row_number over sorted neighbors),
    * per-step draw = mix(walk, step, seed) mod deg(cur) — bit-for-bit the
    * engine's walk (walksPerVertex=1, pathLength=5, seed=42). */
  val qDeepwalk: String = {
    val steps = (1 until 5).map { s =>
      val drawE = s"(${wideMixSql("w.walk_id", s, 42L)} % d.deg)"
      s"""w${s + 1} AS MATERIALIZED (
         SELECT w.walk_id, i.dst AS cur, w.path || ',' || CAST(i.dst AS VARCHAR) AS path
         FROM w$s w
         JOIN deg d ON d.src = w.cur
         JOIN idx i ON i.src = w.cur AND i.idx = $drawE
       )"""
    }.mkString(", ")
    s"""WITH $graphCtes, deg AS MATERIALIZED (
         SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM sym GROUP BY src
       ), idx AS MATERIALIZED (
         SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx FROM sym
       ), w1 AS MATERIALIZED (
         SELECT src AS walk_id, src AS cur, CAST(src AS VARCHAR) AS path FROM deg
       ), $steps
       SELECT walk_id, walk_id AS start, path FROM w5 ORDER BY walk_id"""
  }

  /** MetaPath2Vec replay: per-(src, kind) positional index; at step s only
    * kind metaPath(s % 2) is eligible; no eligible neighbor → walk stops
    * (metaPath = conv,tool; pathLength=5, seed=42). */
  val qMetapath: String = {
    val metaPath = Seq("conv", "tool")
    val steps = (1 until 5).map { s =>
      val kind = metaPath(s % metaPath.length)
      val drawE = s"(${wideMixSql("w.walk_id", s, 42L)} % d.deg)"
      s"""m${s + 1} AS MATERIALIZED (
         SELECT w.walk_id,
                CASE WHEN w.stopped OR d.deg IS NULL THEN w.cur ELSE i.dst END AS cur,
                CASE WHEN w.stopped OR d.deg IS NULL THEN w.path
                     ELSE w.path || ',' || CAST(i.dst AS VARCHAR) END AS path,
                (w.stopped OR d.deg IS NULL) AS stopped
         FROM m$s w
         LEFT JOIN kdeg d ON d.src = w.cur AND d.kind = '$kind'
         LEFT JOIN kidx i ON i.src = w.cur AND i.kind = '$kind' AND i.idx = $drawE
       )"""
    }.mkString(", ")
    s"""WITH $graphCtes, kidx AS MATERIALIZED (
         SELECT s.src, v.kind, s.dst,
                ROW_NUMBER() OVER (PARTITION BY s.src, v.kind ORDER BY s.dst) - 1 AS idx
         FROM sym s JOIN vertices v ON v.vid = s.dst
       ), kdeg AS MATERIALIZED (
         SELECT src, kind, CAST(COUNT(*) AS BIGINT) AS deg FROM kidx GROUP BY src, kind
       ), m1 AS MATERIALIZED (
         SELECT vid AS walk_id, vid AS cur, CAST(vid AS VARCHAR) AS path, FALSE AS stopped
         FROM vertices WHERE kind = '${metaPath.head}'
       ), $steps
       SELECT walk_id, walk_id AS start, path FROM m5 ORDER BY walk_id"""
  }

  /** Node2Vec replay: per-step bounded rejection sampling — `attempts`
    * uniform positional candidates, acceptance (1/p, 1, 1/q)/top by
    * d(prev,cand) class (membership = left join on the symmetric edge set),
    * first accepted wins, last draw forced. p=0.5/q=2.0 give exact binary
    * acceptance constants, so the float compare replays bit-for-bit
    * (walksPerVertex=1, pathLength=5, attempts=4, seed=42). */
  val qNode2vec: String = {
    val (p, q, seed, attempts, pathLength) = (0.5, 2.0, 42L, 4, 5)
    val top = math.max(1.0, math.max(1.0 / p, 1.0 / q))
    val (aBack, aNbr, aOut) = (1.0 / p / top, 1.0 / top, 1.0 / q / top)
    def caseOverT(f: Int => String): String =
      s"(CASE ts.t ${(0 until attempts).map(t => s"WHEN $t THEN ${f(t)}").mkString(" ")} END)"
    val steps = (2 until pathLength).map { s =>
      val pick = caseOverT(t => s"(${wideMixSql("w.walk_id", s, seed + t * 1009L)} % w.cur_deg)")
      val u = caseOverT(t =>
        s"(CAST(${mixSql("w.walk_id", s, seed + t * 1009L + 501L)} AS DOUBLE) / CAST(2000003.0 AS DOUBLE))")
      s"""c$s AS MATERIALIZED (
         SELECT w.walk_id, w.cur, w.path, ts.t, i.dst AS cand, dd.deg AS cand_deg,
                (ts.t = ${attempts - 1} OR
                 $u < (CASE WHEN i.dst = w.prev THEN CAST($aBack AS DOUBLE)
                            WHEN m.src IS NOT NULL THEN CAST($aNbr AS DOUBLE)
                            ELSE CAST($aOut AS DOUBLE) END)) AS accepted
         FROM n${s - 1} w
         CROSS JOIN generate_series(0, ${attempts - 1}) ts(t)
         JOIN idx i ON i.src = w.cur AND i.idx = $pick
         JOIN deg dd ON dd.src = i.dst
         LEFT JOIN sym m ON m.src = w.prev AND m.dst = i.dst
       ), n$s AS MATERIALIZED (
         SELECT walk_id, cur AS prev, cand AS cur, cand_deg AS cur_deg,
                path || ',' || CAST(cand AS VARCHAR) AS path
         FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY walk_id
                          ORDER BY (CASE WHEN accepted THEN t ELSE 1000 END), t) AS rn
               FROM c$s) x WHERE rn = 1
       )"""
    }.mkString(", ")
    s"""WITH $graphCtes, deg AS MATERIALIZED (
         SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM sym GROUP BY src
       ), idx AS MATERIALIZED (
         SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx FROM sym
       ), n1 AS MATERIALIZED (
         SELECT d.src AS walk_id, d.src AS prev, i.dst AS cur, dd.deg AS cur_deg,
                CAST(d.src AS VARCHAR) || ',' || CAST(i.dst AS VARCHAR) AS path
         FROM deg d
         JOIN idx i ON i.src = d.src AND i.idx = (${wideMixSql("d.src", 1, seed)} % d.deg)
         JOIN deg dd ON dd.src = i.dst
       ), $steps
       SELECT walk_id, walk_id AS start, path FROM n${pathLength - 1} ORDER BY walk_id"""
  }

  // ---- text analysis over documents ----

  private val toksCte =
    "toks AS MATERIALIZED (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok FROM documents)"

  /** Vocab build replay: same tokenizer, exact tf/df, same (tf desc, tok
    * asc) top-k order as [[graft.text.TextStats.vocab]]. */
  val qVocab: String =
    s"""WITH $toksCte, tfdf AS MATERIALIZED (
         SELECT tok, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
         FROM toks GROUP BY tok
       )
       SELECT tok, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df
       FROM tfdf ORDER BY tf DESC, tok ASC LIMIT 100"""

  /** tf-idf replay: same tokenizer, tf/df/N over the corpus, score =
    * tf · ln(N/df) with the identical operation order as
    * [[graft.text.TextStats.tfidf]] (exact-integer inputs, one division +
    * one ln + one multiply → bit-identical doubles), top-3 per doc. */
  val qTfidf: String =
    s"""WITH $toksCte, tf AS MATERIALIZED (
         SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok
       ), dfn AS MATERIALIZED (
         SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
       ), n AS MATERIALIZED (
         SELECT COUNT(*) AS n_docs FROM documents
       ), ranked AS MATERIALIZED (
         SELECT t.doc_id, t.tok,
                CAST(t.tf AS DOUBLE) * ln(CAST(n.n_docs AS DOUBLE) / CAST(d.df AS DOUBLE)) AS score,
                ROW_NUMBER() OVER (PARTITION BY t.doc_id ORDER BY
                  CAST(t.tf AS DOUBLE) * ln(CAST(n.n_docs AS DOUBLE) / CAST(d.df AS DOUBLE)) DESC,
                  t.tok ASC) AS rnk
         FROM tf t JOIN dfn d ON d.tok = t.tok CROSS JOIN n
       )
       SELECT doc_id, CAST(rnk AS INTEGER) AS rnk, tok, ROUND(score, 6) AS score
       FROM ranked WHERE rnk <= 3 ORDER BY doc_id, rnk"""

  val qTokenCount: String =
    """SELECT doc_id,
       CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS INTEGER) AS n_tokens
       FROM documents ORDER BY doc_id"""

  val qQuality: String = {
    val stop = graft.text.TextStats.stopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH $toksCte, agg AS MATERIALIZED (
         SELECT d.doc_id,
                COUNT(t.tok) AS n_tokens,
                COALESCE(SUM(CASE WHEN t.tok IN ($stop) THEN 1 ELSE 0 END), 0) AS n_stop,
                SUM(length(t.tok)) AS tok_chars
         FROM documents d LEFT JOIN toks t ON t.doc_id = d.doc_id
         GROUP BY d.doc_id
       )
       SELECT d.doc_id,
              CAST(length(d.text) AS INTEGER) AS n_chars,
              CAST(a.n_tokens AS BIGINT) AS n_tokens,
              ROUND(CAST(length(regexp_replace(d.text, '[^.,;:!?]', '', 'g')) AS DOUBLE) / length(d.text), 6) AS punct_ratio,
              CASE WHEN a.n_tokens = 0 THEN CAST(0 AS DOUBLE)
                   ELSE ROUND(CAST(a.n_stop AS DOUBLE) / a.n_tokens, 6) END AS stop_ratio,
              CASE WHEN a.n_tokens = 0 THEN CAST(0 AS DOUBLE)
                   ELSE ROUND(CAST(a.tok_chars AS DOUBLE) / a.n_tokens, 6) END AS avg_token_len
       FROM documents d JOIN agg a ON a.doc_id = d.doc_id ORDER BY d.doc_id"""
  }

  /** Marker-scores + argmax CTEs shared by [[qLangid]] and
    * [[qStratifiedSample]] (assumes `toks` is already in scope). */
  private val langidCtes: String = {
    val markerValues = graft.text.TextStats.langMarkers.toSeq.sortBy(_._1)
      .flatMap { case (l, ws) => ws.map(w => s"('$l', '$w')") }.mkString(", ")
    s"""markers(lang, tok) AS (VALUES $markerValues),
       scores AS MATERIALIZED (
         SELECT t.doc_id, m.lang, CAST(COUNT(*) AS BIGINT) AS score
         FROM toks t JOIN markers m ON m.tok = t.tok GROUP BY t.doc_id, m.lang
         UNION ALL
         SELECT doc_id, 'zh',
                CAST(length(text) - length(regexp_replace(text, '[\\x{4e00}-\\x{9fff}]', '', 'g')) AS BIGINT)
         FROM documents
       ),
       best AS MATERIALIZED (
         SELECT doc_id, lang,
                ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS rn
         FROM scores WHERE score > 0
       ),
       langpred AS MATERIALIZED (
         SELECT d.doc_id, COALESCE(b.lang, 'und') AS lang_pred
         FROM documents d LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1
       )"""
  }

  val qLangid: String =
    s"""WITH $toksCte, $langidCtes
       SELECT doc_id, lang_pred FROM langpred ORDER BY doc_id"""

  val qFingerprint: String = {
    val terms = (0 until 8)
      .map(i => s"CAST(ascii(substr(md5(text), ${i + 1}, 1)) AS BIGINT) * ${1L << (7 * i)}")
      .mkString(" + ")
    s"""SELECT doc_id, md5(text) AS content_md5,
       CAST(($terms) % 1000000007 AS BIGINT) AS fp
       FROM documents ORDER BY doc_id"""
  }

  /** Token repetition replay: 1 − |distinct|/|tokens| per doc. */
  val qRepetition: String =
    """SELECT doc_id,
       CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS INTEGER) AS n_tokens,
       CAST(len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS INTEGER) AS n_distinct,
       CASE WHEN len(regexp_extract_all(lower(text), '[a-z0-9]+')) = 0 THEN CAST(0 AS DOUBLE)
            ELSE ROUND(CAST(1.0 AS DOUBLE) -
              CAST(len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS DOUBLE) /
              len(regexp_extract_all(lower(text), '[a-z0-9]+')), 6) END AS rep_ratio
       FROM documents ORDER BY doc_id"""

  /** Stratified-sample replay ([[graft.text.CorpusOps.stratifiedSample]]):
    * stratum = langid prediction, keep iff the portable md5-nibble draw of
    * 'doc_id:salt' is under the stratum's INTEGER threshold — thresholds
    * stringified from the engine's own `strataThresholds`, so the cutoff
    * literals cannot fork. */
  val qStratifiedSample: String = {
    val thresholdValues = graft.text.CorpusOps.strataThresholds
      .map { case (l, t) => s"('$l', CAST($t AS BIGINT))" }.mkString(", ")
    val draw = graft.functions.PortableHash.md5Pack60Sql(
      s"CAST(doc_id AS VARCHAR) || ':${graft.text.CorpusOps.sampleSalt}'")
    s"""WITH $toksCte, $langidCtes,
       thresholds(lang_pred, threshold) AS (VALUES $thresholdValues),
       drawn AS MATERIALIZED (
         SELECT l.doc_id, l.lang_pred AS stratum, t.threshold,
                CAST($draw % 1000000007 AS BIGINT) AS draw
         FROM langpred l JOIN thresholds t ON t.lang_pred = l.lang_pred
       )
       SELECT doc_id, stratum, draw FROM drawn WHERE draw < threshold
       ORDER BY doc_id"""
  }

  /** Contamination replay ([[graft.text.CorpusOps.contamination]]): distinct
    * 8-token shingles, eval set = doc_id % 97 = 0, per-corpus-doc hit count
    * against the eval shingle set. */
  val qContamination: String =
    """WITH tk8 AS MATERIALIZED (
         SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
       ), sh8 AS MATERIALIZED (
         SELECT DISTINCT doc_id,
                t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
                t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7] AS shingle
         FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) AS i FROM tk8) x
       ), eval_sh AS MATERIALIZED (
         SELECT DISTINCT shingle FROM sh8 WHERE doc_id % 97 = 0
       ), corpus AS MATERIALIZED (
         SELECT doc_id, shingle FROM sh8 WHERE doc_id % 97 <> 0
       ), sizes AS MATERIALIZED (
         SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM corpus GROUP BY doc_id
       ), hits AS MATERIALIZED (
         SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit
         FROM corpus c JOIN eval_sh e ON e.shingle = c.shingle GROUP BY c.doc_id
       )
       SELECT s.doc_id, s.n_sh, COALESCE(h.n_hit, CAST(0 AS BIGINT)) AS n_hit,
              ROUND(CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / s.n_sh, 6) AS frac
       FROM sizes s LEFT JOIN hits h ON h.doc_id = s.doc_id
       ORDER BY s.doc_id"""

  // ---- dedup over documents ----

  val qDedupExact: String =
    """WITH h AS MATERIALIZED (SELECT doc_id, md5(text) AS h FROM documents),
       g AS MATERIALIZED (
         SELECT h, MIN(doc_id) AS canonical_id, CAST(COUNT(*) AS BIGINT) AS group_size
         FROM h GROUP BY h
       )
       SELECT a.doc_id, g.canonical_id, g.group_size
       FROM h a JOIN g ON g.h = a.h ORDER BY a.doc_id"""

  /** Shingle CTE chain parameterized on the (doc_id, text) relation —
    * `documents` for the corpus queries, a derived conversation-trajectory
    * relation for [[qConvNearDup]]. */
  def shingleCtesFor(docsRel: String): String =
    s"""tk AS MATERIALIZED (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM $docsRel
    ), sh AS MATERIALIZED (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i FROM tk) x
    ), sizes AS MATERIALIZED (
      SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
    ), inter AS MATERIALIZED (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )"""

  val shingleCtes: String = shingleCtesFor("documents")

  /** Trajectory-level conversation near-dup ([[graft.derive
    * .TranscriptAnalytics.toolTrajectoryDocs]] → [[graft.dedup.Dedup
    * .ngramJaccard]]): each conversation becomes one document whose text is
    * its ordered tool sequence; exact 3-gram Jaccard over those docs. */
  val qConvNearDup: String =
    s"""WITH $graphCtes, convdocs AS MATERIALIZED (
         SELECT conv_id AS doc_id, string_agg(tool, ' ' ORDER BY turn_idx) AS text
         FROM transcripts GROUP BY conv_id
       ), ${shingleCtesFor("convdocs")}
       SELECT doc_a, doc_b, ROUND(jaccard, 6) AS jaccard FROM (
         SELECT i.doc_a, i.doc_b,
                CAST(i.i AS DOUBLE) / (sa.n_sh + sb.n_sh - i.i) AS jaccard
         FROM inter i
         JOIN sizes sa ON sa.doc_id = i.doc_a
         JOIN sizes sb ON sb.doc_id = i.doc_b
       ) x WHERE jaccard >= CAST(0.35 AS DOUBLE) ORDER BY doc_a, doc_b"""

  /** Banded scale path for conversation trajectory near-dup: the SAME
    * MinHash-LSH chain as [[qMinhashLsh]] over the trajectory docs. Recall
    * vs [[qConvNearDup]] is partial BY DESIGN at this threshold regime —
    * this fixture has no true near-dup trajectories (max Jaccard ≈ 0.5), so
    * 16×4 banding recovers only the strongest pairs; in the ≥0.8 template-
    * session regime the banding is near-exhaustive (same documented-regime
    * situation as q_embed_dedup_lsh). Verify threshold 0.3 (vs the exact
    * baseline's 0.35) so the query is non-vacuous at sf0.001, where the
    * banded candidates top out at j = 0.32. */
  val qConvNearDupLsh: String =
    s"""WITH $graphCtes, convdocs AS MATERIALIZED (
         SELECT conv_id AS doc_id, string_agg(tool, ' ' ORDER BY turn_idx) AS text
         FROM transcripts GROUP BY conv_id
       ), ${minhashCandCtesFor("convdocs")}
       SELECT c.doc_a, c.doc_b,
              ROUND(CAST(i.i AS DOUBLE) / (sa.n_sh + sb.n_sh - i.i), 6) AS jaccard
       FROM cand c
       JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
       JOIN sizes sa ON sa.doc_id = c.doc_a
       JOIN sizes sb ON sb.doc_id = c.doc_b
       WHERE CAST(i.i AS DOUBLE) / (sa.n_sh + sb.n_sh - i.i) >= CAST(0.3 AS DOUBLE)
       ORDER BY c.doc_a, c.doc_b"""

  val qNgramJaccard: String =
    s"""WITH $shingleCtes
       SELECT doc_a, doc_b, ROUND(jaccard, 6) AS jaccard FROM (
         SELECT i.doc_a, i.doc_b,
                CAST(i.i AS DOUBLE) / (sa.n_sh + sb.n_sh - i.i) AS jaccard
         FROM inter i
         JOIN sizes sa ON sa.doc_id = i.doc_a
         JOIN sizes sb ON sb.doc_id = i.doc_b
       ) x WHERE jaccard >= CAST(0.5 AS DOUBLE) ORDER BY doc_a, doc_b"""

  /** df-capped n-gram Jaccard: shingles with document frequency > 5 are
    * excluded from CANDIDATE generation; surviving pairs carry the exact
    * full-shingle Jaccard — mirrors Dedup.ngramJaccard(maxShingleDf). */
  val qNgramJaccardDf: String =
    s"""WITH $shingleCtes, rare_shingles AS MATERIALIZED (
         SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 5
       ), rare AS MATERIALIZED (
         SELECT s.doc_id, s.shingle FROM sh s JOIN rare_shingles r ON r.shingle = s.shingle
       ), cand AS MATERIALIZED (
         SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       )
       SELECT i.doc_a, i.doc_b,
              ROUND(CAST(i.i AS DOUBLE) / (sa.n_sh + sb.n_sh - i.i), 6) AS jaccard
       FROM cand c
       JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
       JOIN sizes sa ON sa.doc_id = c.doc_a
       JOIN sizes sb ON sb.doc_id = c.doc_b
       WHERE CAST(i.i AS DOUBLE) / (sa.n_sh + sb.n_sh - i.i) >= CAST(0.3 AS DOUBLE)
       ORDER BY i.doc_a, i.doc_b"""

  /** MinHash+LSH: recomputes the portable md5-nibble shingle fingerprints,
    * the 64 universal hashes (same a_i/b_i coefficients from
    * [[graft.functions.PortableHash]]), the 16 polynomial band hashes, the
    * banded candidate join, and the exact-Jaccard verify — bit-for-bit the
    * engine's arithmetic. */
  /** Shared MinHash-LSH CTE chain (shingles → fingerprints → 64-min
    * signatures → 16 band hashes → banded candidates) — one definition
    * feeding both the pair query and the clustering replay. */
  private def minhashCandCtesFor(docsRel: String): String = {
    import graft.functions.PortableHash.{P, aCoef, bCoef, md5Pack60Sql}
    val h60 = md5Pack60Sql("shingle")
    val minCols = (0 until 64)
      .map(i => s"MIN((${aCoef(i)} * fp + ${bCoef(i)}) % $P) AS mh$i").mkString(", ")
    val bandSelects = (0 until 16).map { b =>
      val bh = (0 until 4).foldLeft("0")((acc, r) => s"(($acc * 1009 + mh${b * 4 + r}) % $P)")
      s"SELECT doc_id, $b AS band, $bh AS bh FROM mins"
    }.mkString(" UNION ALL ")
    s"""${shingleCtesFor(docsRel)}, fps AS MATERIALIZED (
         SELECT doc_id, $h60 % $P AS fp FROM sh
       ), mins AS MATERIALIZED (
         SELECT doc_id, $minCols FROM fps GROUP BY doc_id
       ), bands AS MATERIALIZED ( $bandSelects
       ), cand AS MATERIALIZED (
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
         GROUP BY 1, 2
       )"""
  }

  private lazy val minhashCandCtes: String = minhashCandCtesFor("documents")

  val qMinhashLsh: String =
    s"""WITH $minhashCandCtes
       SELECT c.doc_a, c.doc_b,
              ROUND(CAST(i.i AS DOUBLE) / (sa.n_sh + sb.n_sh - i.i), 6) AS jaccard
       FROM cand c
       JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
       JOIN sizes sa ON sa.doc_id = c.doc_a
       JOIN sizes sb ON sb.doc_id = c.doc_b
       WHERE CAST(i.i AS DOUBLE) / (sa.n_sh + sb.n_sh - i.i) >= CAST(0.5 AS DOUBLE)
       ORDER BY c.doc_a, c.doc_b"""

  /** Near-dup clustering replay ([[graft.dedup.Dedup.clusters]]): the
    * verified MinHash-LSH pairs become an undirected graph; 8 unrolled
    * synchronous min-canonical propagation rounds (the fixed round count is
    * what makes the flow replayable — convergence-driven CC would need a
    * data-dependent oracle). */
  private def clustersReplaySqlFor(
      docsRel: String, threshold: String, extraCtes: String = ""): String = {
    val rounds = (1 to 8).map { k =>
      s"""s$k AS MATERIALIZED (
         SELECT s.doc_id, LEAST(s.canonical, COALESCE(m.mc, s.canonical)) AS canonical
         FROM s${k - 1} s LEFT JOIN (
           SELECT p.dst AS doc_id, MIN(x.canonical) AS mc
           FROM symp p JOIN s${k - 1} x ON x.doc_id = p.src GROUP BY p.dst
         ) m ON m.doc_id = s.doc_id
       )"""
    }.mkString(", ")
    s"""WITH $extraCtes${minhashCandCtesFor(docsRel)}, vpairs AS MATERIALIZED (
         SELECT c.doc_a, c.doc_b
         FROM cand c
         JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
         JOIN sizes sa ON sa.doc_id = c.doc_a
         JOIN sizes sb ON sb.doc_id = c.doc_b
         WHERE CAST(i.i AS DOUBLE) / (sa.n_sh + sb.n_sh - i.i) >= CAST($threshold AS DOUBLE)
       ), symp AS MATERIALIZED (
         SELECT doc_a AS src, doc_b AS dst FROM vpairs
         UNION ALL
         SELECT doc_b AS src, doc_a AS dst FROM vpairs
       ), s0 AS MATERIALIZED (
         SELECT doc_id, doc_id AS canonical FROM $docsRel
       ), $rounds
       SELECT doc_id, canonical AS canonical_id FROM s8 ORDER BY doc_id"""
  }

  val qDedupClusters: String = clustersReplaySqlFor("documents", "0.5")

  /** Conversation dedup clustering: [[qConvNearDupLsh]]'s verified pair
    * graph fed through the same 8-round min-canonical propagation replay —
    * canonical CONVERSATION ids, the end-to-end trajectory-dedup flow. */
  val qConvClusters: String = clustersReplaySqlFor(
    "convdocs", "0.3",
    s"""$graphCtes, convdocs AS MATERIALIZED (
         SELECT conv_id AS doc_id, string_agg(tool, ' ' ORDER BY turn_idx) AS text
         FROM transcripts GROUP BY conv_id
       ), """)

  /** SimHash: portable 60-bit token hash, 60 conditional-sum bit votes,
    * 4×15-bit banded Hamming candidate join, popcount filter. */
  val qSimhash: String = {
    import graft.functions.PortableHash.md5Pack60Sql
    val h60 = md5Pack60Sql("tok")
    val voteCols = (0 until 60)
      .map(j => s"SUM(CASE WHEN ((h >> $j) & 1) = 1 THEN cnt ELSE -cnt END) AS v$j").mkString(", ")
    val sigExpr = (0 until 60)
      .map(j => s"(CASE WHEN v$j > 0 THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)").mkString(" + ")
    val bandSelects = (0 until 4)
      .map(b => s"SELECT doc_id, simhash, $b AS band, (simhash >> ${b * 15}) & 32767 AS bh FROM sig")
      .mkString(" UNION ALL ")
    s"""WITH $toksCte, tc AS MATERIALIZED (
         SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY doc_id, tok
       ), th AS MATERIALIZED (
         SELECT doc_id, cnt, $h60 AS h FROM tc
       ), votes AS MATERIALIZED (
         SELECT doc_id, $voteCols FROM th GROUP BY doc_id
       ), sig AS MATERIALIZED (
         SELECT doc_id, $sigExpr AS simhash FROM votes
       ), bands AS MATERIALIZED ( $bandSelects
       ), pairs AS MATERIALIZED (
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
         FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
         GROUP BY 1, 2, 3
       )
       SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 3 ORDER BY doc_a, doc_b"""
  }

  // ---- similarity over embeddings ----

  val embCtes: String =
    """u AS MATERIALIZED (
      SELECT vec_id, unnest(generate_series(1, len(embedding))) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    ), norms AS MATERIALIZED (
      SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM u GROUP BY vec_id
    )"""

  val qAnnCosine: String =
    s"""WITH $embCtes, dots AS MATERIALIZED (
         SELECT a.vec_id AS qa, b.vec_id AS qb, SUM(a.x * b.x) AS dot
         FROM u a JOIN u b ON a.i = b.i AND a.vec_id <> b.vec_id
         WHERE a.vec_id % 10 = 0
         GROUP BY a.vec_id, b.vec_id
       ), scored AS MATERIALIZED (
         SELECT d.qa AS query_id, d.qb AS neighbor_id,
                ROW_NUMBER() OVER (PARTITION BY d.qa
                  ORDER BY d.dot / (na.nrm * nb.nrm) DESC, d.qb ASC) AS rnk
         FROM dots d
         JOIN norms na ON na.vec_id = d.qa
         JOIN norms nb ON nb.vec_id = d.qb
       )
       SELECT query_id, CAST(rnk AS INTEGER) AS rnk, neighbor_id
       FROM scored WHERE rnk <= 10 ORDER BY query_id, rnk"""

  /** RP-LSH ANN: recomputes the portable hyperplane components (same squared
    * mixing as [[graft.sim.Similarity.planeComponent]], with u.i 1-based),
    * the sign-of-projection band values, the banded candidate join, and the
    * exact-cosine top-10 window. */
  val qAnnLsh: String =
    s"""WITH $embCtes, planes AS MATERIALIZED (
         SELECT j, i,
                CAST(((t * t * 31 + t * 7 + j) % 2000003) AS DOUBLE)
                  / CAST(1000001.5 AS DOUBLE) - CAST(1.0 AS DOUBLE) AS comp
         FROM (
           SELECT j, i, (j * 40503 + (i - 1) * 2654435761 + 7) % 1000003 AS t
           FROM generate_series(0, 15) t1(j), generate_series(1, 256) t2(i)
         )
       ), proj AS MATERIALIZED (
         SELECT u.vec_id, p.j, SUM(u.x * p.comp) AS proj
         FROM u JOIN planes p ON p.i = u.i GROUP BY u.vec_id, p.j
       ), banded AS MATERIALIZED (
         SELECT vec_id, j // 4 AS band,
                SUM(CASE WHEN proj > 0
                    THEN (CASE j % 4 WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4 ELSE 8 END)
                    ELSE 0 END) AS bh
         FROM proj GROUP BY vec_id, j // 4
       ), cand AS MATERIALIZED (
         SELECT a.vec_id AS qa, b.vec_id AS qb
         FROM banded a JOIN banded b
           ON a.band = b.band AND a.bh = b.bh AND a.vec_id <> b.vec_id
         GROUP BY 1, 2
       ), dots AS MATERIALIZED (
         SELECT c.qa, c.qb, SUM(ua.x * ub.x) AS dot
         FROM cand c
         JOIN u ua ON ua.vec_id = c.qa
         JOIN u ub ON ub.vec_id = c.qb AND ub.i = ua.i
         GROUP BY c.qa, c.qb
       ), scored AS MATERIALIZED (
         SELECT d.qa AS query_id, d.qb AS neighbor_id,
                ROW_NUMBER() OVER (PARTITION BY d.qa
                  ORDER BY d.dot / (na.nrm * nb.nrm) DESC, d.qb ASC) AS rnk
         FROM dots d
         JOIN norms na ON na.vec_id = d.qa
         JOIN norms nb ON nb.vec_id = d.qb
       )
       SELECT query_id, CAST(rnk AS INTEGER) AS rnk, neighbor_id
       FROM scored WHERE rnk <= 10 ORDER BY query_id, rnk"""

  /** IVF ANN replay: quantize to BIGINT micro-units, `iters` Lloyd rounds
    * with EXACT integer distances (assignment/probe argmins are integer
    * comparisons, cid tie-break — no float-order hazards), portable init
    * pick, probe nprobe cells, exact-cosine top-k. Mirrors
    * [[graft.sim.Similarity.ivfTopK]] (nlist=16, nprobe=2, iters=2, k=10,
    * quant=1e6). */
  val qAnnIvf: String = {
    val (nlist, nprobe, iters, k) = (16, 2, 2, 10)
    val rounds = (1 to iters).map { r =>
      s"""d$r AS MATERIALIZED (
         SELECT u.vec_id, c.cid, SUM((u.xq - c.cq) * (u.xq - c.cq)) AS d
         FROM uq u JOIN c${r - 1} c ON c.i = u.i GROUP BY u.vec_id, c.cid
       ), a$r AS MATERIALIZED (
         SELECT vec_id, cid FROM (
           SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
           FROM d$r
         ) x WHERE rn = 1
       ), c$r AS MATERIALIZED (
         SELECT a.cid, u.i, CAST(ROUND(AVG(u.xq), 0) AS BIGINT) AS cq
         FROM a$r a JOIN uq u ON u.vec_id = a.vec_id GROUP BY a.cid, u.i
       )"""
    }.mkString(", ")
    s"""WITH $embCtes, uq AS MATERIALIZED (
         SELECT vec_id, i, CAST(ROUND(x * CAST(1000000.0 AS DOUBLE), 0) AS BIGINT) AS xq FROM u
       ), pick AS MATERIALIZED (
         SELECT vec_id, rn - 1 AS cid FROM (
           SELECT vec_id,
                  ROW_NUMBER() OVER (ORDER BY (vec_id * 2654435761 + 13) % 1000003, vec_id) AS rn
           FROM embeddings
         ) x WHERE rn <= $nlist
       ), c0 AS MATERIALIZED (
         SELECT p.cid, u.i, u.xq AS cq FROM uq u JOIN pick p ON p.vec_id = u.vec_id
       ), $rounds, df AS MATERIALIZED (
         SELECT u.vec_id, c.cid, SUM((u.xq - c.cq) * (u.xq - c.cq)) AS d
         FROM uq u JOIN c$iters c ON c.i = u.i GROUP BY u.vec_id, c.cid
       ), ranked AS MATERIALIZED (
         SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
         FROM df
       ), cand AS MATERIALIZED (
         SELECT DISTINCT p.vec_id AS qa, l.vec_id AS qb
         FROM (SELECT vec_id, cid FROM ranked WHERE rn <= $nprobe) p
         JOIN (SELECT vec_id, cid FROM ranked WHERE rn = 1) l
           ON l.cid = p.cid AND l.vec_id <> p.vec_id
       ), dots AS MATERIALIZED (
         SELECT c.qa, c.qb, SUM(ua.x * ub.x) AS dot
         FROM cand c
         JOIN u ua ON ua.vec_id = c.qa
         JOIN u ub ON ub.vec_id = c.qb AND ub.i = ua.i
         GROUP BY c.qa, c.qb
       ), scored AS MATERIALIZED (
         SELECT d.qa AS query_id, d.qb AS neighbor_id,
                ROW_NUMBER() OVER (PARTITION BY d.qa
                  ORDER BY d.dot / (na.nrm * nb.nrm) DESC, d.qb ASC) AS rnk
         FROM dots d
         JOIN norms na ON na.vec_id = d.qa
         JOIN norms nb ON nb.vec_id = d.qb
       )
       SELECT query_id, CAST(rnk AS INTEGER) AS rnk, neighbor_id
       FROM scored WHERE rnk <= $k ORDER BY query_id, rnk"""
  }

  val qEmbedDedup: String =
    s"""WITH $embCtes, dots AS MATERIALIZED (
         SELECT a.vec_id AS va, b.vec_id AS vb, SUM(a.x * b.x) AS dot
         FROM u a JOIN u b ON a.i = b.i AND a.vec_id < b.vec_id
         GROUP BY a.vec_id, b.vec_id
       )
       SELECT d.va AS vec_a, d.vb AS vec_b
       FROM dots d
       JOIN norms na ON na.vec_id = d.va
       JOIN norms nb ON nb.vec_id = d.vb
       WHERE d.dot / (na.nrm * nb.nrm) >= CAST(0.45 AS DOUBLE)
       ORDER BY vec_a, vec_b"""

  /** RP-LSH near-dup pair replay ([[graft.sim.Similarity.cosinePairsLsh]],
    * numBits=56, bandBits=8): same portable hyperplane components as
    * [[qAnnLsh]] extended to 56 planes, 7 bands of 8 bits, vec_a < vec_b
    * candidate join, exact-cosine verify at the same 0.45 threshold as
    * [[qEmbedDedup]] — so the two oracled paths expose the LSH path's
    * regime-dependent recall directly (at ≥0.9 it approaches 1; the fixture
    * peaks ≈0.6, so the surviving subset is the contract here). */
  val qEmbedDedupLsh: String =
    s"""WITH $embCtes, planes AS MATERIALIZED (
         SELECT j, i,
                CAST(((t * t * 31 + t * 7 + j) % 2000003) AS DOUBLE)
                  / CAST(1000001.5 AS DOUBLE) - CAST(1.0 AS DOUBLE) AS comp
         FROM (
           SELECT j, i, (j * 40503 + (i - 1) * 2654435761 + 7) % 1000003 AS t
           FROM generate_series(0, 55) t1(j), generate_series(1, 256) t2(i)
         )
       ), proj AS MATERIALIZED (
         SELECT u.vec_id, p.j, SUM(u.x * p.comp) AS proj
         FROM u JOIN planes p ON p.i = u.i GROUP BY u.vec_id, p.j
       ), banded AS MATERIALIZED (
         SELECT vec_id, j // 8 AS band,
                SUM(CASE WHEN proj > 0 THEN CAST(POWER(2, j % 8) AS BIGINT) ELSE 0 END) AS bh
         FROM proj GROUP BY vec_id, j // 8
       ), cand AS MATERIALIZED (
         SELECT a.vec_id AS va, b.vec_id AS vb
         FROM banded a JOIN banded b
           ON a.band = b.band AND a.bh = b.bh AND a.vec_id < b.vec_id
         GROUP BY 1, 2
       ), dots AS MATERIALIZED (
         SELECT c.va, c.vb, SUM(ua.x * ub.x) AS dot
         FROM cand c
         JOIN u ua ON ua.vec_id = c.va
         JOIN u ub ON ub.vec_id = c.vb AND ub.i = ua.i
         GROUP BY c.va, c.vb
       )
       SELECT d.va AS vec_a, d.vb AS vec_b,
              ROUND(d.dot / (na.nrm * nb.nrm), 6) AS cosine
       FROM dots d
       JOIN norms na ON na.vec_id = d.va
       JOIN norms nb ON nb.vec_id = d.vb
       WHERE d.dot / (na.nrm * nb.nrm) >= CAST(0.45 AS DOUBLE)
       ORDER BY vec_a, vec_b"""

  // ---- SVD++ (full SGD replay — the round-2 "no_oracle" gap) ----

  /** SQL rendering of [[graft.algo.SVDPlusPlus.detRand]] for a LITERAL dim
    * index `i`: portable squared-mix uniform in [0, 1). */
  def detRandSql(vid: String, i: Int, salt: Long): String = {
    val c = i.toLong * 40503L + salt * 97L + 11L
    val t = s"(($vid * 2654435761 + $c) % 1000003)"
    s"(CAST((($t * $t * 31 + $t * 7 + $i) % 2000003) AS DOUBLE) / CAST(2000003.0 AS DOUBLE))"
  }

  /** SVD++ bias replay: the exact per-iteration SGD recurrence of
    * [[graft.algo.SVDPlusPlus.run]] unrolled as a CTE chain with one column
    * per factor dimension — portable init ([[detRandSql]]), same clamp, same
    * left-to-right dot order, same gradient expressions. Per-vertex gradient
    * SUMs may reassociate vs Spark's partial aggregation; both sides round
    * bias to 6 decimals, absorbing the ~1e-13 reassociation noise (the same
    * argument every other sum-bearing oracle in this file relies on).
    * Parameters mirror SparkEntry.q_svdpp: rank=4, 2 iterations,
    * clamp [1, 5], reference default gammas (SVDPlusPlus.Conf). */
  val qSvdpp: String = {
    val (rank, iters) = (4, 2)
    val (g1, g2, g6, g7) = (0.007, 0.007, 0.005, 0.015)
    val (minV, maxV) = (1.0, 5.0)
    val D = 0 until rank
    def cols(f: Int => String) = D.map(f).mkString(", ")
    val head =
      s"""e AS MATERIALIZED (
        SELECT o.o_custkey AS src, l.l_suppkey + 1000000 AS dst,
               CAST((CAST(trunc(l.l_quantity) AS BIGINT) % 5) + 1 AS DOUBLE) AS rating
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      ), mu AS MATERIALIZED (SELECT AVG(rating) AS u FROM e),
      inc AS MATERIALIZED (
        SELECT vid, COUNT(*) AS deg, AVG(rating) AS meanr FROM (
          SELECT src AS vid, rating FROM e UNION ALL SELECT dst AS vid, rating FROM e
        ) x GROUP BY vid
      ), v0 AS MATERIALIZED (
        SELECT i.vid,
               ${cols(d => detRandSql("i.vid", d, 1L) + s" AS p$d")},
               ${cols(d => detRandSql("i.vid", d, 2L) + s" AS y$d")},
               i.meanr - (SELECT u FROM mu) AS bias,
               CAST(1.0 AS DOUBLE) / sqrt(CAST(i.deg AS DOUBLE)) AS norm
        FROM inc i
      )"""
    val iterCtes = (1 to iters).map { k =>
      val pv = s"v${k - 1}"
      s"""sy$k AS MATERIALIZED (
        SELECT e.src AS vid, ${cols(d => s"SUM(v.y$d) AS s$d")}
        FROM e JOIN $pv v ON v.vid = e.dst GROUP BY e.src
      ), us$k AS MATERIALIZED (
        SELECT v.vid, ${cols(d => s"v.p$d")}, v.bias, v.norm,
               ${cols(d =>
                 s"CASE WHEN s.vid IS NULL THEN v.p$d ELSE v.norm * s.s$d + v.p$d END AS p2_$d")}
        FROM $pv v LEFT JOIN sy$k s ON s.vid = v.vid
      ), tj$k AS MATERIALIZED (
        SELECT e.src, e.dst, e.rating,
               ${cols(d => s"uu.p$d AS pu$d")}, ${cols(d => s"uu.p2_$d AS p2_$d")},
               uu.bias AS bu, uu.norm AS nu,
               ${cols(d => s"vv.p$d AS qi$d")}, ${cols(d => s"vv.y$d AS yi$d")}, vv.bias AS bi
        FROM e JOIN us$k uu ON uu.vid = e.src JOIN $pv vv ON vv.vid = e.dst
      ), t$k AS MATERIALIZED (
        SELECT *, rating - LEAST(GREATEST(
                 (SELECT u FROM mu) + bu + bi + (${D.map(d => s"qi$d * p2_$d").mkString(" + ")}),
                 CAST($minV AS DOUBLE)), CAST($maxV AS DOUBLE)) AS err
        FROM tj$k
      ), gm$k AS MATERIALIZED (
        SELECT src AS vid,
               ${cols(d =>
                 s"CAST($g2 AS DOUBLE) * (err * qi$d - CAST($g7 AS DOUBLE) * pu$d) AS dp$d")},
               CAST($g1 AS DOUBLE) * (err - CAST($g6 AS DOUBLE) * bu) AS db
        FROM t$k
        UNION ALL
        SELECT dst AS vid,
               ${cols(d => s"CAST($g2 AS DOUBLE) * (err * p2_$d - CAST($g7 AS DOUBLE) * qi$d)")},
               CAST($g1 AS DOUBLE) * (err - CAST($g6 AS DOUBLE) * bi)
        FROM t$k
      ), g$k AS MATERIALIZED (
        SELECT vid, ${cols(d => s"SUM(dp$d) AS dp$d")}, SUM(db) AS db FROM gm$k GROUP BY vid
      ), gy$k AS MATERIALIZED (
        SELECT dst AS vid,
               ${cols(d =>
                 s"SUM(CAST($g2 AS DOUBLE) * (err * nu * qi$d - CAST($g7 AS DOUBLE) * yi$d)) AS dy$d")}
        FROM t$k GROUP BY dst
      ), v$k AS MATERIALIZED (
        SELECT v.vid,
               ${cols(d => s"CASE WHEN g.vid IS NULL THEN v.p$d ELSE v.p$d + g.dp$d END AS p$d")},
               ${cols(d => s"CASE WHEN gy.vid IS NULL THEN v.y$d ELSE v.y$d + gy.dy$d END AS y$d")},
               v.bias + COALESCE(g.db, CAST(0 AS DOUBLE)) AS bias, v.norm
        FROM $pv v LEFT JOIN g$k g ON g.vid = v.vid LEFT JOIN gy$k gy ON gy.vid = v.vid
      )"""
    }.mkString(", ")
    s"""WITH $head, $iterCtes SELECT vid, ROUND(bias, 6) AS bias,
       ROUND(p0, 6) AS p0, ROUND(y0, 6) AS y0 FROM v$iters ORDER BY vid"""
  }
}
