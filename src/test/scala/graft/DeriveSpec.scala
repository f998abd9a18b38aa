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

  test("sessionize: gap splits 0-based sessions; stats count turns, span, distinct tools") {
    import java.sql.Timestamp
    def ts(min: Long) = new Timestamp(min * 60000L)
    val t = Seq(
      ("a", 0, "user", "x", "search", ts(0)),
      ("a", 1, "assistant", "x", null, ts(10)),
      ("a", 2, "user", "x", "search", ts(10 + 1441)), // > 1-day gap → session 1
      ("a", 3, "tool", "x", "code", ts(10 + 1442)),
      ("b", 0, "user", "x", null, ts(5)))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val got = graft.derive.Sessionize.sessionStats(t).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got(("a", 0L)) == ((2L, 0L, 10L * 60000000L, 1L)))
    assert(got(("a", 1L)) == ((2L, 1451L * 60000000L, 1452L * 60000000L, 2L)))
    assert(got(("b", 0L)) == ((1L, 5L * 60000000L, 5L * 60000000L, 0L)))
    assert(got.size == 3)
    // exactly-1-day gap does NOT split (> not >=)
    val edge = Seq(("c", 0, "user", "x", null, ts(0)), ("c", 1, "user", "x", null, ts(1440)))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    assert(graft.derive.Sessionize.sessionStats(edge).count() == 1L)
  }

  test("transcript analytics: transitions, bigrams, latency, session pairs, conv stats") {
    import java.sql.Timestamp
    import graft.derive.{TranscriptAnalytics => TA}
    def ts(min: Long) = new Timestamp(min * 60000L)
    val t = Seq(
      ("a", 0, "user", "x", "search", ts(0)),
      ("a", 1, "assistant", "x", null, ts(10)),
      ("a", 2, "user", "x", "code", ts(20)),
      ("a", 3, "assistant", "x", "search", ts(1471)), // 1451-min gap → session 1
      ("b", 0, "user", "x", "code", ts(5)),
      ("b", 1, "tool", "x", "search", ts(6)))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")

    val rt = TA.roleTransitions(t).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(rt == Map(("user", "assistant") -> 2L, ("assistant", "user") -> 1L,
      ("user", "tool") -> 1L))

    // bigrams span the tool-less a/1 turn; code→search occurs in both convs
    val tb = TA.toolBigrams(t).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(tb == Map(("search", "code") -> 1L, ("code", "search") -> 2L))

    val M = 60000000L // one fixture minute in microseconds
    val lat = TA.latencyStats(t).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(lat("a") == ((3L, 1471L * M, 10L * M, 1451L * M, 1471.0 * M / 3)))
    assert(lat("b") == ((1L, M, M, M, M.toDouble)))

    // session-scoped: a's session 1 is a singleton tool set → only one pair
    val sp = TA.sessionToolPairs(t).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(sp == Map(("code", "search") -> 2L))

    val cs = TA.convStats(t).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(6), r.getLong(7)))).toMap
    assert(cs("a") == ((4L, 2L, 2L, 2L, 2L)))
    assert(cs("b") == ((2L, 1L, 2L, 1L, 0L)))
  }

  test("toolTrajectoryDocs: turn-ordered tool text; near-identical trajectories score high") {
    import java.sql.Timestamp
    import graft.derive.{TranscriptAnalytics => TA}
    def ts(min: Long) = new Timestamp(min * 60000L)
    def conv(id: String, tools: Seq[String]) =
      tools.zipWithIndex.map { case (tool, i) => (id, i, "user", "x", tool, ts(i)) }
    val seqA = Seq("search", "code", "test", "commit", "search", "code")
    val t = (conv("a", seqA) ++ conv("b", seqA :+ "deploy") ++
      conv("z", Seq("fetch", "parse", "store", "fetch", "parse")))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
      .repartition(4) // order must come from turn_idx, not input order
    val docs = TA.toolTrajectoryDocs(t).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(docs("a") == seqA.mkString(" "))
    assert(docs("b") == (seqA :+ "deploy").mkString(" "))
    assert(docs.size == 3)
    // a/b share all of a's 4 trigrams; b adds one → jaccard 4/5; z is disjoint
    val pairs = graft.dedup.Dedup.ngramJaccard(TA.toolTrajectoryDocs(t), n = 3, minJaccard = 0.35)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(pairs.keySet == Set(("a", "b")))
    assert(math.abs(pairs(("a", "b")) - 0.8) < 1e-12)
  }
}
