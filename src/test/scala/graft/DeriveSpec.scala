package graft

import org.apache.spark.sql.functions._

import graft.derive.{Dictionary, LinkGraph}
import graft.model.SyntheticTranscripts

class DeriveSpec extends SparkTestBase {
  import spark.implicits._

  test("dictionary: dense 1-based vids in key order, independent of partitioning") {
    val keys = Seq("b", "a", "c", "a", "zz", "m").toDF("key")
    val d1 = Dictionary.encode(keys, numPartitions = 1).collect().map(r => (r.getLong(0), r.getString(1))).sorted
    val d7 = Dictionary.encode(keys.repartition(7), numPartitions = 7).collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(d1.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "m"), (5L, "zz")))
    assert(d1.toSeq == d7.toSeq)
  }

  test("edges are canonical: src < dst, no self loops, no duplicates") {
    val e = GraphFixture.graph.edges.collect()
    assert(e.forall(r => r.getLong(0) < r.getLong(1)))
    val pairs = e.map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.distinct.length == pairs.length)
    assert(e.forall(_.getLong(2) >= 1L))
  }

  test("conv vertices precede tool vertices; kinds correct") {
    val v = GraphFixture.graph.vertices.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val convMax = v.filter(_._3 == "conv").map(_._1).max
    val toolMin = v.filter(_._3 == "tool").map(_._1).min
    assert(convMax < toolMin)
    assert(v.forall { case (_, key, kind) => key.startsWith(kind + ":") })
    assert(v.map(_._1).sorted.toSeq == (1L to v.length).toSeq)
  }

  test("conv-tool weight = turn co-occurrence count; tool-tool = shared convs") {
    val t = GraphFixture.transcripts.where($"tool".isNotNull)
      .select("conv_id", "tool").collect().map(r => (r.getString(0), r.getString(1)))
    val vmap = GraphFixture.graph.vertices.collect().map(r => r.getString(1) -> r.getLong(0)).toMap
    val expectedCt = t.groupBy(identity).map { case ((c, tool), xs) =>
      (vmap(s"conv:$c"), vmap(s"tool:$tool")) -> xs.length.toLong
    }
    val distinctPairs = t.distinct
    val byConv = distinctPairs.groupBy(_._1).view.mapValues(_.map(_._2).sorted)
    val expectedTt = byConv.values.flatMap { tools =>
      for (i <- tools.indices; j <- (i + 1) until tools.length) yield (tools(i), tools(j))
    }.groupBy(identity).map { case ((t1, t2), xs) =>
      (vmap(s"tool:$t1"), vmap(s"tool:$t2")) -> xs.size.toLong
    }
    val got = GraphFixture.graph.edges.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expectedCt ++ expectedTt)
  }

  test("per-turn text is byte-identical under stable (conv_id, turn_idx) ordering") {
    val before = GraphFixture.transcripts.orderBy("conv_id", "turn_idx")
      .select("text").collect().map(_.getString(0).getBytes("UTF-8").toSeq)
    // run a full engine pass over the same input
    LinkGraph.fromTranscripts(GraphFixture.transcripts).edges.count()
    val after = GraphFixture.transcripts.orderBy("conv_id", "turn_idx")
      .select("text").collect().map(_.getString(0).getBytes("UTF-8").toSeq)
    assert(before.toSeq == after.toSeq)
    assert(before.exists(_.exists(b => (b & 0x80) != 0)), "fixture text must contain multi-byte UTF-8")
  }

  test("synthetic generator is deterministic and Zipf-skewed") {
    val a = SyntheticTranscripts.generate(spark, 40, 10, 8).collect()
    val b = SyntheticTranscripts.generate(spark, 40, 10, 8).collect()
    assert(a.map(_.toString).sorted.toSeq == b.map(_.toString).sorted.toSeq)
    val toolCounts = SyntheticTranscripts.generate(spark, 400, 10, 8)
      .where($"tool".isNotNull).groupBy("tool").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // Zipf-ish: the most popular tool should dominate the least popular
    assert(toolCounts.values.max > 3 * toolCounts.values.min)
  }
}
