package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.algo.{ConnectedComponents, PageRank, TriangleCount}

/** Property tests (SURVEY.md §5): invariants over random graphs —
  * rank mass conservation, CC = min reachable id, triangle-count invariance
  * under edge permutation/partitioning. Uses scalacheck generators with fixed
  * seeds (the scalatest-plus bridge is not in the offline cache; sampling
  * directly keeps cases deterministic anyway). */
class GraphPropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private val edgeListGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(5, 25)
    m <- Gen.choose(n, 4 * n)
    edges <- Gen.listOfN(m, for {
      a <- Gen.choose(1L, n.toLong)
      b <- Gen.choose(1L, n.toLong)
    } yield (math.min(a, b), math.max(a, b)))
  } yield edges.filter(e => e._1 != e._2).distinct

  private def cases(k: Int): Seq[List[(Long, Long)]] =
    (1 to k).flatMap(i => edgeListGen.apply(Gen.Parameters.default, Seed(i.toLong)))
      .filter(_.nonEmpty)

  test("PageRank: rank mass is conserved (every vertex has degree >= 1)") {
    for (es <- cases(5)) {
      val edges = es.toDF("src", "dst").withColumn("weight", lit(1L))
      val ranks = PageRank.runFixed(edges, 8).collect().map(_.getDouble(1))
      // sum(r') = 0.15*sum(r) + 0.85*sum(msgs) = sum(r) = |V| when no sinks
      assert(math.abs(ranks.sum - ranks.length) < 1e-9, s"mass ${ranks.sum} != ${ranks.length}")
      assert(ranks.forall(_ > 0))
    }
  }

  test("CC: component label is exactly the min reachable vertex id") {
    for (es <- cases(5)) {
      val vids = es.flatMap(e => Seq(e._1, e._2)).distinct
      val edges = es.toDF("src", "dst").withColumn("weight", lit(1L))
      val got = ConnectedComponents.run(edges, vids.toDF("vid"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val adj = es.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      def reachMin(v: Long): Long = {
        val seen = scala.collection.mutable.Set(v)
        val q = scala.collection.mutable.Queue(v)
        while (q.nonEmpty) {
          for (n <- adj.getOrElse(q.dequeue(), Nil) if !seen(n)) { seen += n; q += n }
        }
        seen.min
      }
      assert(got == vids.map(v => v -> reachMin(v)).toMap)
    }
  }

  test("triangles: count invariant under edge-list permutation and repartitioning") {
    for (es <- cases(4) if es.size > 2) {
      val e1 = es.toDF("src", "dst").withColumn("weight", lit(1L))
      val e2 = new scala.util.Random(7).shuffle(es).toDF("src", "dst")
        .withColumn("weight", lit(1L)).repartition(7)
      assert(TriangleCount.total(e1) == TriangleCount.total(e2))
    }
  }
}
