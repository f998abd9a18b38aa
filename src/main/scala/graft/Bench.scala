package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

import graft.algo.PageRank
import graft.derive.LinkGraph
import graft.model.SyntheticTranscripts

/** Per-round benchmark: the headline BASELINE.json metric — PageRank
  * edges-processed/sec/iteration + iterations-to-convergence (tol 1e-6) on a
  * transcript-derived edge graph — followed by a timed sweep of every
  * SparkEntry query at the driver-supplied scale factor.
  *
  * Output contract (round 4): TWO JSON lines on stdout.
  *   1. a fat diagnostics line (`"detail":"full"`) with per-query
  *      {sec, ok, gc_sec, pos} metadata;
  *   2. LAST, a compact summary line — headline, ok-only total, rounded
  *      per-query seconds, failures, and machine load — sized to survive a
  *      bounded tail capture. Rounds 1-3 all ended `parsed: null`: r1/r2
  *      from the sbt `[info]` prefix, r3 because the single fat line
  *      overflowed the driver's tail window and lost its own FRONT. A
  *      consumer reading the last stdout line gets complete valid JSON.
  *
  * Protocol (round 3, after the round-2 reproducibility gap):
  *   - The headline loop runs FIRST, on a fresh session — round 1 measured a
  *     3× headline degradation from same-session residue (tenured-heap/GC
  *     pressure left by earlier queries), and round 2's builder-vs-driver
  *     1.77× gap had the same shape (the builder measured headline-first
  *     sessions, the driver ran this main where the headline came last).
  *     Headline-first makes the driver's number and the builder's number the
  *     SAME protocol.
  *   - `spark.catalog.clearCache()` between queries kills cross-query cache
  *     residue, and per-query GC time + session position are recorded so
  *     ordering effects are visible in the JSON instead of conjectural.
  *   - 1-minute load average is sampled before/after the headline and after
  *     the sweep: the box is shared, and co-tenant steal is the dominant
  *     variance source (round 3 ran ~2× slow by its own headline with zero
  *     in-VM processes). The load fields make that visible per-artifact
  *     instead of narratively in BASELINE.md.
  *   - A failed query is OMITTED from "queries" (no sign-encoded times) and
  *     listed in "failed"; "value" sums OK queries only, with the failed
  *     remainder reported separately as "failed_sec" so round-over-round
  *     totals stay apples-to-apples when a query crashes.
  */
object Bench {

  /** Tolerance PageRank over a synthetic transcript graph sized for
    * throughput measurement; returns (symmetrized edge count, iterations,
    * seconds in the iteration loop, min per-iteration seconds). The
    * per-iteration MIN is the steady-state number: co-tenant steal shows up
    * as loop_sec ≫ iterations·min_iter_sec, distinguishing environment noise
    * from engine regression inside the artifact itself. */
  /** Build-once headline graph: (persisted edges, symmetrized edge count). */
  def headlineGraph(spark: SparkSession, nConvs: Long, nTools: Int):
      (org.apache.spark.sql.DataFrame, Long) = {
    val t = SyntheticTranscripts.generate(spark, nConvs, maxTurns = 20, nTools = nTools)
    val g = LinkGraph.fromTranscripts(t)
    val edges = g.edges.persist()
    (edges, 2L * edges.count()) // both directions processed per iteration
  }

  /** One timed tolerance loop over pre-built edges: (iterations, loop
    * seconds, min iteration seconds). */
  def timedLoop(edges: org.apache.spark.sql.DataFrame, frontier: Boolean): (Int, Double, Double) = {
    // (IterativeRunner disables AQE inside the superstep loop itself.)
    val t0 = System.nanoTime()
    val res =
      if (frontier) PageRank.runFrontier(edges, tol = 1e-6, maxIter = 100)
      else PageRank.run(edges, tol = 1e-6, maxIter = 100)
    res.ranks.count()
    val secs = (System.nanoTime() - t0) / 1e9
    val minIter =
      if (res.metrics.isEmpty) 0.0 else res.metrics.map(_.wallMs).min / 1e3
    (res.iterations, secs, minIter)
  }

  def pagerankHeadline(
      spark: SparkSession, nConvs: Long, nTools: Int): (Long, Int, Double, Double) = {
    val (edges, nEdges) = headlineGraph(spark, nConvs, nTools)
    val (iters, secs, minIter) = timedLoop(edges, frontier = false)
    edges.unpersist(false)
    (nEdges, iters, secs, minIter)
  }

  private def gcMillis: Long =
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum

  private def load1: Double = graft.core.HostLoad.load1

  /** Bounded idle gate before the headline: wait (up to `maxWaitSec`) for two
    * CONSECUTIVE 1-minute load samples below `threshold`, then run regardless
    * and record what happened. Three straight driver rounds (r2/r3/r4) landed
    * on co-tenant-loaded boxes (r4 load_1m up to 24 on 32 cpus), so the
    * headline field alone never showed the engine's idle-band number; the
    * gate buys an idle window when one exists within the budget, and the
    * returned (waited_sec, passed) goes into the artifact so a gated-but-
    * still-loaded run is distinguishable from an idle one.
    * Opt-out: SPARK_GRAFT_IDLE_GATE_SEC=0. */
  private def idleGate(maxWaitSec: Int, threshold: Double = 0.7): (Double, Boolean) = {
    val t0 = System.nanoTime()
    var below = if (load1 < threshold) 1 else 0
    var waited = 0.0
    while (below < 2 && waited < maxWaitSec) {
      Thread.sleep(15000)
      waited = (System.nanoTime() - t0) / 1e9
      below = if (load1 < threshold) below + 1 else 0
    }
    ((System.nanoTime() - t0) / 1e9, below >= 2)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions.localBuilder(cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // headline FIRST: fresh-JVM conditions, no sweep residue (see scaladoc).
    // A small unrecorded warm-up loop first: a cold JVM otherwise pays
    // interpreter/C1 costs inside the first ~5 measured iterations (~8% of
    // the 67-iteration loop). The warm-up is part of this main, so the
    // number stays driver-reproducible.
    pagerankHeadline(spark, 50000, nTools = 100)
    spark.catalog.clearCache()
    // bounded idle gate (after the warm-up so JIT is paid either way): wait
    // up to 10 min for two consecutive sub-0.7 load samples, then proceed
    val (gateWaited, gatePassed) =
      idleGate(sys.env.getOrElse("SPARK_GRAFT_IDLE_GATE_SEC", "600").toInt)
    val loadPre = load1
    // Graph large enough that per-superstep compute dominates the
    // per-iteration serial floor (see BASELINE.md §c) — ~13.7M directed edges
    val headlineConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "2000000").toLong
    val (hlEdges, prEdges) = headlineGraph(spark, headlineConvs, nTools = 500)
    val (prIters, prSecs, prMinIter) = timedLoop(hlEdges, frontier = false)
    val loadPost = load1
    val edgesPerSecPerIter = prEdges.toDouble * prIters / prSecs
    // secondary metric: the frontier (delta) tolerance loop on the SAME
    // pre-built graph — SAME stop semantics, rel-1e-8 agreement (BASELINE.md
    // §g); reported beside the exact headline, never replacing it
    val (frIters, frSecs, frMinIter) = timedLoop(hlEdges, frontier = true)
    val frLoad = load1
    hlEdges.unpersist(false)
    spark.catalog.clearCache()

    final case class QRes(name: String, sec: Double, ok: Boolean, gcSec: Double, pos: Int)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).zipWithIndex.map {
      case ((name, fn), pos) =>
        spark.catalog.clearCache() // no cross-query cache residue
        val gc0 = gcMillis
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
          }
        QRes(name, (System.nanoTime() - t0) / 1e9, ok, (gcMillis - gc0) / 1e3, pos)
    }
    val loadEnd = load1

    val qs = results.collect { case r if r.ok => "\"" + r.name + f"""":${r.sec}%.2f""" }
      .mkString("{", ",", "}")
    val meta = results.map { r =>
      "\"" + r.name +
        f"""":{"sec":${r.sec}%.3f,"ok":${r.ok},"gc_sec":${r.gcSec}%.3f,"pos":${r.pos}}"""
    }.mkString("{", ",", "}")
    val failed = results.collect { case r if !r.ok => "\"" + r.name + "\"" }
      .mkString("[", ",", "]")
    val totalOk = results.collect { case r if r.ok => r.sec }.sum
    val failedSec = results.collect { case r if !r.ok => r.sec }.sum
    // min-based headline: sym_edges / min_iter_sec — the steady-state number
    // a loaded box cannot depress (co-tenant steal inflates loop_sec but some
    // iteration almost always lands in a quiet slice; BASELINE.md §g idle
    // band for min_iter_sec is 0.76-0.95 s on this graph). Reported BESIDE
    // the loop-total headline, never replacing it.
    val edgesPerSecPerIterMin = if (prMinIter > 0) prEdges.toDouble / prMinIter else 0.0
    val pr =
      f"""{"sym_edges":$prEdges,"iterations":$prIters,"loop_sec":$prSecs%.3f,"min_iter_sec":$prMinIter%.3f,"edges_per_sec_per_iter":$edgesPerSecPerIter%.0f,"edges_per_sec_per_iter_min":$edgesPerSecPerIterMin%.0f}"""
    // no edges/s/iter for the frontier loop: its iterations do NOT process
    // all sym_edges by design — the honest figure is the wall-clock ratio
    val prFrontier =
      f"""{"iterations":$frIters,"loop_sec":$frSecs%.3f,"min_iter_sec":$frMinIter%.3f,"speedup_vs_exact":${prSecs / frSecs}%.2f,"load_1m_post":$frLoad%.2f}"""
    val loads = f"""[$loadPre%.2f,$loadPost%.2f,$loadEnd%.2f]"""
    val gate = f"""{"waited_sec":$gateWaited%.0f,"passed":$gatePassed}"""
    // fat diagnostics line first…
    println(
      f"""{"detail":"full","queries_meta":$meta,"sf":"$sfDir","headline_position":"first","cpus":$cpus}""")
    // …compact summary line LAST (bounded size: survives tail capture)
    println(
      f"""{"metric":"total","value":$totalOk%.2f,"unit":"sec","queries":$qs,"failed":$failed,"failed_sec":$failedSec%.2f,"pagerank":$pr,"pagerank_frontier":$prFrontier,"load_1m":$loads,"idle_gate":$gate,"sf":"$sfDir","cpus":$cpus}""")
    spark.stop()
  }
}
