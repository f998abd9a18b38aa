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
}
