package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.GraphOps
import graft.sources.GraphLoader

class GraphLoaderSpec extends SparkTestBase {

  test("edgeListFile: comments, blanks, self-loops, canonical orientation, dedup") {
    val f = Files.createTempFile("edges", ".txt")
    Files.writeString(f,
      """# comment line
        |1 2
        |2 1
        |3	4	2.0
        |5 5
        |
        |4 3
        |""".stripMargin)
    val e = GraphLoader.edgeListFile(spark, f.toString).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    // 1-2 twice (flipped) -> weight 2; 3-4 (2.0) + 4-3 (1.0) -> 3; 5-5 dropped
    assert(e.toSeq == Seq((1L, 2L, 2L), (3L, 4L, 3L)))
  }

  test("typedEdgeListFile parses 4/5 column heterogeneous edges") {
    val f = Files.createTempFile("tedges", ".txt")
    Files.writeString(f, "1 0 2 1 0.5\n3 1 4 0\n")
    val e = GraphLoader.typedEdgeListFile(spark, f.toString).orderBy("src").collect()
    assert(e.length == 2)
    assert(e(0).getShort(1) == 0 && e(0).getShort(3) == 1 && e(0).getFloat(4) == 0.5f)
    assert(e(1).getFloat(4) == 1.0f)
  }

  test("mergeLabels left-joins labels into vertex state") {
    import spark.implicits._
    val v = Seq(1L, 2L, 3L).toDF("vid")
    val l = Seq((1L, 7L)).toDF("vid", "label")
    val got = GraphLoader.mergeLabels(v, l).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got == Map(1L -> 7L, 2L -> -1L, 3L -> -1L))
  }
}

class GraphOpsExtraSpec extends SparkTestBase {

  test("aggregateMessages reproduces degree and weighted-degree") {
    val g = GraphFixture.graph
    val state = g.vertices.select(col("vid"))
    val deg = GraphOps.aggregateMessages(
      g.edges, state,
      msgToDst = Some(lit(1L)), msgToSrc = Some(lit(1L)),
      merge = sum(col("msg")))
    val expected = GraphOps.degrees(g.edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = deg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("aggregateMessages activeness gate: full frontier == ungated; each direction == manual filter") {
    import GraphOps.EdgeActiveness
    val g = GraphFixture.graph
    val state = g.vertices.select(col("vid"), (pmod(col("vid"), lit(7L)) + 1L).as("w"))
    def run(active: Option[org.apache.spark.sql.DataFrame], dir: GraphOps.EdgeActiveness) =
      GraphOps.aggregateMessages(g.edges, state,
        msgToDst = Some(col("src_w") * col("weight")), msgToSrc = Some(col("dst_w")),
        merge = sum(col("msg")), activeSet = active, activeness = dir)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ungated = run(None, EdgeActiveness.Either)
    val allVids = g.vertices.select("vid")
    // an all-vertex frontier must be a no-op for every direction
    for (dir <- Seq(EdgeActiveness.SrcOnly, EdgeActiveness.DstOnly,
        EdgeActiveness.Either, EdgeActiveness.Both))
      assert(run(Some(allVids), dir) == ungated, s"full-frontier $dir != ungated")
    // subset frontier: each direction reproduces a driver-side manual filter
    val frontier = g.vertices.where(pmod(col("vid"), lit(3L)) === 0).select("vid")
    val fset = frontier.collect().map(_.getLong(0)).toSet
    assert(fset.nonEmpty && fset.size < g.vertices.count())
    val edges = g.edges.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val wmap = state.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def manual(pred: (Long, Long) => Boolean): Map[Long, Long] =
      edges.filter { case (s, d, _) => pred(s, d) }
        .flatMap { case (s, d, w) => Seq(d -> wmap(s) * w, s -> wmap(d)) }
        .groupBy(_._1).map { case (v, ms) => v -> ms.map(_._2).sum }
    assert(run(Some(frontier), EdgeActiveness.SrcOnly) == manual((s, _) => fset(s)))
    assert(run(Some(frontier), EdgeActiveness.DstOnly) == manual((_, d) => fset(d)))
    assert(run(Some(frontier), EdgeActiveness.Either) == manual((s, d) => fset(s) || fset(d)))
    assert(run(Some(frontier), EdgeActiveness.Both) == manual((s, d) => fset(s) && fset(d)))
  }

  test("typed samplers: ranked k per (src, kind); large k keeps every typed edge") {
    import graft.functions.Samplers
    val g = GraphFixture.graph
    // k beyond any degree: every directed edge survives (one dst-kind each)
    assert(Samplers.uniformKTyped(g.edges, g.vertices, 100000).count() == g.edges.count())
    for (df <- Seq(Samplers.uniformKTyped(g.edges, g.vertices, 2),
        Samplers.weightedKTyped(g.edges, g.vertices, 2))) {
      val rows = df.collect()
      val grouped = rows.groupBy(r => (r.getLong(0), r.getString(1)))
      grouped.values.foreach { rs =>
        assert(rs.length <= 2)
        assert(rs.map(_.getInt(2)).sorted.sameElements(1 to rs.length)) // rnk dense from 1
      }
      // sampled rows are real typed edges
      val edgeSet = g.edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      rows.foreach(r => assert(edgeSet((r.getLong(0), r.getLong(3)))))
    }
  }

  test("typedAdjacency splits neighbor lists by vertex kind") {
    val g = GraphFixture.graph
    val rows = GraphOps.typedAdjacency(g.edges, g.vertices).collect()
    val kinds = g.vertices.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    rows.foreach { r =>
      val kind = r.getString(1)
      r.getSeq[Long](2).foreach(n => assert(kinds(n) == kind))
    }
    // conv vertices only have tool neighbors in this bipartite-plus graph
    val convRows = rows.filter(r => kinds(r.getLong(0)) == "conv")
    assert(convRows.nonEmpty && convRows.forall(_.getString(1) == "tool"))
  }

  test("adjacency cap: k larger than every degree reproduces full adjacency") {
    val g = GraphFixture.graph
    def norm(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    assert(norm(GraphOps.adjacency(g.edges, Some(100000))) ==
      norm(GraphOps.adjacency(g.edges)))
    val typed = GraphOps.typedAdjacency(g.edges, g.vertices, Some(100000)).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getSeq[Long](2).toList).toMap
    val full = GraphOps.typedAdjacency(g.edges, g.vertices).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getSeq[Long](2).toList).toMap
    assert(typed == full)
  }

  test("adjacency cap is hub-safe: 10^6-degree hub emits a k-sized row") {
    // uncapped, this hub is ONE multi-MB collect_list row (the round-2
    // verdict's remaining 100×-scale hazard); capped, the ranking window
    // external-sorts and only k rows per vertex reach the aggregate
    val n = 1000000L
    val edges = spark.range(1, n + 1)
      .select(lit(0L).as("src"), col("id").as("dst"), lit(1L).as("weight"))
    val adj = GraphOps.adjacency(edges, Some(32)).cache()
    val hub = adj.where(col("vid") === 0L).head()
    val hubNbrs = hub.getSeq[Long](1)
    assert(hubNbrs.length == 32)
    assert(hubNbrs.forall(d => d >= 1L && d <= n))
    assert(hubNbrs.toList == hubNbrs.sorted.toList)
    // leaves keep their single real neighbor; sample is deterministic
    assert(adj.where(col("vid") =!= 0L).count() == n)
    val again = GraphOps.adjacency(edges.repartition(13), Some(32))
      .where(col("vid") === 0L).head().getSeq[Long](1)
    adj.unpersist()
    assert(again.toList == hubNbrs.toList, "capped sample must be partition-invariant")
  }
}
