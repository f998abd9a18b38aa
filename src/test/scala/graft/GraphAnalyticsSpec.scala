package graft

import scala.collection.mutable

import graft.algo.{KCore, LinkPrediction, ShortestPaths, TriangleCount}
import graft.operators.GraphOps
import graft.text.TextStats

/** Driver-side brute-force oracles for the round-5 analytics additions:
  * k-core peel, multi-source BFS / weighted SSSP, neighborhood-overlap link
  * prediction (common / Adamic–Adar / Jaccard, hub-capped), local clustering
  * coefficient, degree histogram, and per-doc tf-idf top-k.
  */
class GraphAnalyticsSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._

  private def adj: Map[Long, Seq[Long]] = GraphFixture.adj

  /** Weighted symmetric adjacency collected from the canonical edge table. */
  private lazy val wadj: Map[Long, Seq[(Long, Long)]] = {
    val rows = GraphFixture.graph.edges.select("src", "dst", "weight").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val both = rows.flatMap { case (a, b, w) => Seq((a, (b, w)), (b, (a, w))) }
    both.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSeq }
  }

  private lazy val landmarkIds: Set[Long] =
    GraphFixture.graph.vertices
      .where(col("kind") === "tool" && pmod(col("vid"), lit(7L)) === 0L)
      .collect().map(_.getLong(0)).toSet

  // ---- k-core ----

  private def kcoreOracle(k: Long): Map[Long, Int] = {
    var alive = adj.keySet ++ GraphFixture.vertexIds
    var changed = true
    while (changed) {
      val deg = alive.map(v => v -> adj.getOrElse(v, Nil).count(alive)).toMap
      val next = alive.filter(v => deg(v) >= k)
      changed = next != alive
      alive = next
    }
    alive.map(v => v -> adj(v).count(alive)).toMap
  }

  test("k-core peel matches the driver-side fixpoint, k = 2 and 3") {
    for (k <- Seq(2L, 3L)) {
      val res = KCore.run(GraphFixture.graph.edges, GraphFixture.graph.vertices, k = k)
      val got = res.vertices.collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
      val exp = kcoreOracle(k)
      assert(got == exp, s"k=$k: engine $got vs oracle $exp")
      assert(res.iterations >= 1)
      // core property: every surviving vertex keeps >= k neighbors in-core
      assert(got.values.forall(_ >= k))
    }
  }

  test("k-core of an empty-core threshold returns no vertices") {
    val maxDeg = adj.values.map(_.size).max
    val res = KCore.run(GraphFixture.graph.edges, GraphFixture.graph.vertices, k = maxDeg + 1L)
    assert(res.vertices.count() == 0L)
  }

  // ---- shortest paths ----

  private def bfsOracle(srcs: Set[Long]): Map[Long, Long] = {
    val dist = mutable.Map[Long, Long]()
    var frontier = srcs.filter(v => GraphFixture.vertexIds.contains(v))
    frontier.foreach(v => dist(v) = 0L)
    var d = 0L
    while (frontier.nonEmpty) {
      d += 1
      frontier = frontier.flatMap(v => adj.getOrElse(v, Nil)).filterNot(dist.contains)
      frontier.foreach(v => dist(v) = d)
    }
    GraphFixture.vertexIds.map(v => v -> dist.getOrElse(v, -1L)).toMap
  }

  /** Bellman–Ford to fixpoint (weights >= 1, no negative cycles). */
  private def ssspOracle(srcs: Set[Long]): Map[Long, Long] = {
    val dist = mutable.Map[Long, Long]()
    srcs.filter(GraphFixture.vertexIds.contains).foreach(v => dist(v) = 0L)
    var changed = true
    while (changed) {
      changed = false
      for ((u, nbrs) <- wadj if dist.contains(u); (v, w) <- nbrs) {
        val cand = dist(u) + w
        if (!dist.contains(v) || cand < dist(v)) { dist(v) = cand; changed = true }
      }
    }
    GraphFixture.vertexIds.map(v => v -> dist.getOrElse(v, -1L)).toMap
  }

  test("multi-source hop BFS matches the driver-side wave") {
    assert(landmarkIds.nonEmpty, "fixture must contain tool landmarks with vid % 7 = 0")
    val res = ShortestPaths.run(GraphFixture.graph.edges, GraphFixture.graph.vertices,
      GraphFixture.graph.vertices.where(col("kind") === "tool" && pmod(col("vid"), lit(7L)) === 0L)
        .select("vid"),
      weighted = false)
    val got = res.distances.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == bfsOracle(landmarkIds))
    // wave terminates: iterations bounded by hop eccentricity + quiet round
    assert(res.iterations >= 1 && res.iterations <= got.values.max + 2)
  }

  test("weighted SSSP matches driver-side Bellman-Ford, dominated by BFS hops x min-w") {
    val srcsDf = GraphFixture.graph.vertices
      .where(col("kind") === "tool" && pmod(col("vid"), lit(7L)) === 0L).select("vid")
    val res = ShortestPaths.run(GraphFixture.graph.edges, GraphFixture.graph.vertices,
      srcsDf, weighted = true)
    val got = res.distances.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exp = ssspOracle(landmarkIds)
    assert(got == exp)
    // sanity: weighted distance >= hop distance (all weights >= 1)
    val hops = bfsOracle(landmarkIds)
    assert(got.forall { case (v, d) => d == -1L || d >= hops(v) })
  }

  test("BFS from a single isolated-community seed leaves the rest unreachable") {
    import spark.implicits._
    // a seed vertex disconnected from the fixture graph
    val extraV = GraphFixture.graph.vertices.select("vid")
      .unionByName(Seq(999999L).toDF("vid"))
    val res = ShortestPaths.run(GraphFixture.graph.edges, extraV,
      Seq(999999L).toDF("vid"), weighted = false)
    val got = res.distances.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(999999L) == 0L)
    assert(GraphFixture.vertexIds.forall(v => got(v) == -1L))
  }

  // ---- link prediction ----

  /** Brute-force wedge counts over centers passing the degree cap. */
  private def commonOracle(cap: Option[Int]): Map[(Long, Long), Int] = {
    val pairs = mutable.Map[(Long, Long), Int]().withDefaultValue(0)
    for ((z, nbrs) <- adj if cap.forall(nbrs.size <= _);
         a <- nbrs; b <- nbrs if a < b)
      pairs((a, b)) += 1
    pairs.toMap
  }

  test("commonNeighbors matches brute-force wedge counts (minCommon = 2)") {
    val got = LinkPrediction.commonNeighbors(GraphFixture.graph.edges, minCommon = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2).toInt).toMap
    val exp = commonOracle(None).filter(_._2 >= 2)
    assert(got == exp)
  }

  test("hub-capped commonNeighbors == brute force restricted to sub-cap centers") {
    val cap = 20
    val got = LinkPrediction.commonNeighbors(GraphFixture.graph.edges, minCommon = 1L,
        maxWedgeDegree = Some(cap.toLong))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2).toInt).toMap
    val exp = commonOracle(Some(cap))
    assert(got == exp)
    // the cap must actually bite on this fixture (hubs exist) or the test is vacuous
    assert(adj.values.exists(_.size > cap), "fixture lost its hubs; lower the cap")
  }

  test("adamicAdar: score is sum of 1/ln(deg z) over shared neighbors") {
    val got = LinkPrediction.adamicAdar(GraphFixture.graph.edges, minCommon = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val deg = adj.map { case (k, v) => k -> v.size }
    val exp = mutable.Map[(Long, Long), Double]().withDefaultValue(0.0)
    for ((z, nbrs) <- adj; a <- nbrs; b <- nbrs if a < b)
      exp((a, b)) += 1.0 / math.log(deg(z).toDouble)
    val keep = commonOracle(None).filter(_._2 >= 2).keySet
    assert(got.keySet == keep)
    val maxDiff = got.map { case (k, v) => math.abs(v - exp(k)) }.max
    assert(maxDiff < 1e-9, s"max |engine-oracle| = $maxDiff")
  }

  test("jaccardNeighbors: |intersection| / |union| with union via inclusion-exclusion") {
    val got = LinkPrediction.jaccardNeighbors(GraphFixture.graph.edges, minCommon = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val deg = adj.map { case (k, v) => k -> v.size }
    for (((a, b), j) <- got) {
      val common = adj(a).toSet.intersect(adj(b).toSet).size
      val exp = common.toDouble / (deg(a) + deg(b) - common)
      assert(math.abs(j - exp) < 1e-12, s"pair ($a,$b): $j vs $exp")
      assert(j > 0.0 && j <= 1.0)
    }
  }

  // ---- clustering coefficient + degree histogram ----

  test("clusteringCoefficient: lcc = 2*tri / (d*(d-1)), 0 below degree 2") {
    val got = TriangleCount.clusteringCoefficient(
        GraphFixture.graph.edges, GraphFixture.graph.vertices)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val tri = mutable.Map[Long, Long]().withDefaultValue(0L)
    for ((a, b) <- GraphFixture.edgeList; c <- adj(a) if c > b && adj(b).contains(c)) {
      tri(a) += 1; tri(b) += 1; tri(c) += 1
    }
    assert(got.keySet == GraphFixture.vertexIds.toSet)
    for (v <- GraphFixture.vertexIds) {
      val d = adj.getOrElse(v, Nil).size.toLong
      val (gTri, gDeg, gLcc) = got(v)
      assert(gTri == tri(v), s"v=$v triangles")
      assert(gDeg == d, s"v=$v degree")
      val exp = if (d < 2) 0.0 else 2.0 * tri(v) / (d * (d - 1)).toDouble
      assert(math.abs(gLcc - exp) < 1e-12, s"v=$v lcc $gLcc vs $exp")
    }
  }

  test("degreeHistogram sums to |V(with edges)| and matches the adj map") {
    val got = GraphOps.degreeHistogram(GraphFixture.graph.edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exp = adj.values.map(_.size.toLong).groupBy(identity)
      .map { case (d, vs) => d -> vs.size.toLong }
    assert(got == exp)
    assert(got.values.sum == adj.size)
  }

  // ---- HITS ----

  test("HITS matches a driver-side max-normalized power iteration") {
    val dirEdges = GraphFixture.edgeList
    val allV = GraphFixture.vertexIds
    var hub = allV.map(_ -> 1.0).toMap
    var auth = hub
    for (_ <- 1 to 10) {
      val araw = dirEdges.groupBy(_._2).map { case (v, es) => v -> es.map(e => hub(e._1)).sum }
      val amax = araw.values.max
      auth = allV.map(v => v -> araw.get(v).map(_ / amax).getOrElse(0.0)).toMap
      val hraw = dirEdges.groupBy(_._1).map { case (v, es) => v -> es.map(e => auth(e._2)).sum }
      val hmax = hraw.values.max
      hub = allV.map(v => v -> hraw.get(v).map(_ / hmax).getOrElse(0.0)).toMap
    }
    val got = graft.algo.Hits.run(GraphFixture.graph.edges, GraphFixture.graph.vertices, 10)
      .scores.collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got.keySet == allV.toSet)
    val maxDiff = allV.map(v =>
      math.max(math.abs(got(v)._1 - hub(v)), math.abs(got(v)._2 - auth(v)))).max
    assert(maxDiff < 1e-9, s"max |engine-oracle| = $maxDiff")
    // direction sanity on the conv→tool bipartite core: scores are in [0,1]
    // with at least one 1.0 on each side (the max-normalized champion)
    assert(got.values.forall { case (h, a) => h >= 0.0 && h <= 1.0 && a >= 0.0 && a <= 1.0 })
    assert(got.values.exists(_._1 == 1.0) && got.values.exists(_._2 == 1.0))
  }

  // ---- weighted PageRank ----

  test("runWeighted matches a driver-side weight-proportional power iteration") {
    val wdeg = wadj.map { case (v, nbrs) => v -> nbrs.map(_._2).sum.toDouble }
    var pr = wadj.keys.map(_ -> 1.0).toMap
    for (_ <- 1 to 10) {
      val msum = mutable.Map[Long, Double]().withDefaultValue(0.0)
      for ((u, nbrs) <- wadj; (v, w) <- nbrs) msum(v) += (pr(u) / wdeg(u)) * w
      pr = pr.map { case (v, r) => v -> (0.15 * r + 0.85 * msum(v)) }
    }
    val got = graft.algo.PageRank.runWeighted(GraphFixture.graph.edges, iterations = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == pr.keySet)
    val maxDiff = pr.keys.map(v => math.abs(got(v) - pr(v))).max
    assert(maxDiff < 1e-9, s"max |engine-oracle| = $maxDiff")
    // weights matter: the weighted ranks must differ from the unweighted run
    val unw = graft.algo.PageRank.runFixed(GraphFixture.graph.edges, iterations = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr.keys.exists(v => math.abs(got(v) - unw(v)) > 1e-6))
  }

  // ---- landmark distances + closeness ----

  /** Per-landmark driver BFS: (vid, lm) -> hop dist, discovered pairs only. */
  private def landmarkOracle(srcs: Set[Long]): Map[(Long, Long), Long] = {
    val out = mutable.Map[(Long, Long), Long]()
    for (lm <- srcs) {
      val dist = mutable.Map[Long, Long](lm -> 0L)
      var frontier = Set(lm)
      var d = 0L
      while (frontier.nonEmpty) {
        d += 1
        frontier = frontier.flatMap(v => adj.getOrElse(v, Nil)).filterNot(dist.contains)
        frontier.foreach(v => dist(v) = d)
      }
      dist.foreach { case (v, dd) => out((v, lm)) = dd }
    }
    out.toMap
  }

  test("landmarkDistances: per-landmark map equals independent driver BFS runs") {
    val res = ShortestPaths.landmarkDistances(
      GraphFixture.graph.edges, GraphFixture.graph.vertices,
      GraphFixture.graph.vertices
        .where(col("kind") === "tool" && pmod(col("vid"), lit(7L)) === 0L).select("vid"))
    val got = res.distances.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val exp = landmarkOracle(landmarkIds)
    assert(got == exp)
    // and the min over landmarks reproduces the multi-source BFS
    val minGot = got.groupBy(_._1._1).map { case (v, m) => v -> m.values.min }
    val msBfs = bfsOracle(landmarkIds).filter(_._2 >= 0L)
    assert(minGot == msBfs)
  }

  test("harmonicCloseness: sum of 1/dist over reachable landmarks") {
    val res = ShortestPaths.landmarkDistances(
      GraphFixture.graph.edges, GraphFixture.graph.vertices,
      GraphFixture.graph.vertices
        .where(col("kind") === "tool" && pmod(col("vid"), lit(7L)) === 0L).select("vid"))
    val got = ShortestPaths.harmonicCloseness(res.distances).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val exp = landmarkOracle(landmarkIds).groupBy(_._1._1).map { case (v, m) =>
      v -> ((m.size.toLong, m.values.filter(_ > 0L).map(1.0 / _).sum))
    }
    assert(got.keySet == exp.keySet)
    for ((v, (n, h)) <- got) {
      assert(n == exp(v)._1, s"v=$v n_reach")
      assert(math.abs(h - exp(v)._2) < 1e-9, s"v=$v harmonic $h vs ${exp(v)._2}")
    }
  }

  // ---- assortativity ----

  test("assortativity equals the driver-side Pearson over sym degree pairs") {
    val deg = adj.map { case (k, v) => k -> v.size.toLong }
    val pairs = GraphFixture.edgeList.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .map { case (a, b) => (deg(a), deg(b)) }
    val m = pairs.size.toLong
    val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val sxy = pairs.map(p => p._1 * p._2).sum
    val exp = (m * sxy - sx * sy).toDouble /
      (math.sqrt((m * sxx - sx * sx).toDouble) * math.sqrt((m * syy - sy * sy).toDouble))
    val row = GraphOps.assortativity(GraphFixture.graph.edges).head()
    assert(row.getLong(0) == m)
    assert(math.abs(row.getDouble(1) - exp) < 1e-6)
    // a conv-tool bipartite-ish graph should be disassortative (hubs↔leaves)
    assert(row.getDouble(1) < 0.5)
  }

  // ---- tf-idf ----

  test("tfidf: score = tf * ln(N/df), top-k per doc with deterministic ties") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana apple cherry"),
      (2L, "banana cherry cherry date"),
      (3L, "apple apple apple unique"),
      (4L, "date date banana banana")).toDF("doc_id", "text")
    val got = TextStats.tfidf(docs, k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> ((r.getString(2), r.getDouble(3)))).toMap
    val corpus = Map(
      1L -> Seq("apple", "banana", "apple", "cherry"),
      2L -> Seq("banana", "cherry", "cherry", "date"),
      3L -> Seq("apple", "apple", "apple", "unique"),
      4L -> Seq("date", "date", "banana", "banana"))
    val df = corpus.values.flatMap(_.distinct).groupBy(identity).map { case (t, x) => t -> x.size }
    val n = corpus.size.toDouble
    for ((doc, toks) <- corpus) {
      val scores = toks.groupBy(identity).map { case (t, x) =>
        t -> x.size * math.log(n / df(t))
      }.toSeq.sortBy { case (t, s) => (-s, t) }
      for ((rk, (tok, sc)) <- (1 to 2).zip(scores)) {
        val (gTok, gSc) = got((doc, rk))
        assert(gTok == tok, s"doc $doc rank $rk: $gTok vs $tok")
        assert(math.abs(gSc - sc) < 1e-12)
      }
    }
    // rank 1 in doc 3 must be the tf=3 rare term; 'unique' (df=1) scores ln(4)
    assert(got((3L, 1))._1 == "apple" || got((3L, 1))._1 == "unique")
  }
}
