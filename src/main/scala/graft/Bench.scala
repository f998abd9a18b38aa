package graft

import org.apache.spark.sql.SparkSession

import graft.algo.PageRank
import graft.derive.LinkGraph
import graft.model.SyntheticTranscripts

/** Per-round benchmark: times every SparkEntry query at the driver-supplied
  * scale factor, plus the headline BASELINE.json metric — PageRank
  * edges-processed/sec/iteration + iterations-to-convergence (tol 1e-6) on a
  * transcript-derived edge graph. Emits ONE JSON line.
  */
object Bench {

  /** Tolerance PageRank over a synthetic transcript graph sized for
    * throughput measurement; returns (symmetrized edge count, iterations,
    * seconds in the iteration loop). */
  def pagerankHeadline(spark: SparkSession, nConvs: Long, nTools: Int): (Long, Int, Double) = {
    val t = SyntheticTranscripts.generate(spark, nConvs, maxTurns = 20, nTools = nTools)
    val g = LinkGraph.fromTranscripts(t)
    val edges = g.edges.persist()
    val nEdges = 2L * edges.count() // both directions processed per iteration
    // (IterativeRunner disables AQE inside the superstep loop itself.)
    val t0 = System.nanoTime()
    val res = PageRank.run(edges, tol = 1e-6, maxIter = 100)
    res.ranks.count()
    val secs = (System.nanoTime() - t0) / 1e9
    edges.unpersist(false)
    (nEdges, res.iterations, secs)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // a failed query records NEGATIVE elapsed time (and lands in "failed"):
    // a crash must not be indistinguishable from a fast success in the JSON
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
      val secs = (System.nanoTime() - t0) / 1e9
      name -> (if (ok) secs else -secs)
    }
    // headline graph: large enough that per-superstep compute dominates the
    // per-iteration serial floor (see BASELINE.md §c) — ~13.7M directed edges
    val headlineConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "2000000").toLong
    val (prEdges, prIters, prSecs) = pagerankHeadline(spark, headlineConvs, nTools = 500)
    val edgesPerSecPerIter = prEdges.toDouble * prIters / prSecs

    val qs = results.map { case (k, v) => "\"" + k + f"""":$v%.3f""" }.mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }.mkString("[", ",", "]")
    val total = results.map { case (_, v) => math.abs(v) }.sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir","pagerank":{"sym_edges":$prEdges,"iterations":$prIters,"loop_sec":$prSecs%.3f,"edges_per_sec_per_iter":$edgesPerSecPerIter%.0f},"cpus":$cpus}""")
    spark.stop()
  }
}
