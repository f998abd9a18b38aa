package graft

import graft.algo.SVDPlusPlus

class SVDPlusPlusSpec extends SparkTestBase {
  import spark.implicits._

  // ALS-shaped synthetic ratings (users 1..20, items 101..115, planted
  // low-rank structure), mirroring the reference's 16-line als-test.data
  // smoke shape at slightly larger size.
  private lazy val ratings = {
    val rows = for {
      user <- 1L to 20L
      item <- 101L to 115L
      if (user * 7 + item) % 3 != 0
    } yield {
      val r = 1.0 + ((user % 4) + (item % 3)) % 5 // structured in [1,5]
      (user, item, r)
    }
    rows.toDF("src", "dst", "rating")
  }

  test("SVD++ squared error per edge within the reference's bound, and improving") {
    val conf = SVDPlusPlus.Conf(rank = 4, maxIters = 4)
    val r0 = SVDPlusPlus.run(ratings, conf.copy(maxIters = 0))
    val r = SVDPlusPlus.run(ratings, conf)
    // reference bound: err/numEdges <= 8.0 (GraphTest.scala:186)
    assert(r.squaredErrorPerEdge <= 8.0, s"err/edge = ${r.squaredErrorPerEdge}")
    assert(r.squaredErrorPerEdge <= r0.squaredErrorPerEdge,
      s"training should not worsen: ${r.squaredErrorPerEdge} vs init ${r0.squaredErrorPerEdge}")
    assert(r.mean > 0)
    assert(r.vertices.count() == 35)
  }

  test("SVD++ is deterministic") {
    val conf = SVDPlusPlus.Conf(rank = 4, maxIters = 2)
    val a = SVDPlusPlus.run(ratings, conf).squaredErrorPerEdge
    val b = SVDPlusPlus.run(ratings, conf).squaredErrorPerEdge
    assert(a == b)
  }
}
