package graft.core

import org.apache.spark.sql.DataFrame

/** Per-iteration metrics row (the engine analog of the reference Pregel's
  * per-superstep bookkeeping, `framework/Pregel.scala:41-48` — whose early
  * exit was dead because `activeMessageCount` returned `BitSet.capacity`,
  * `Graph.scala:446-455`; ours actually counts).
  */
final case class IterMetrics(iter: Int, activeCount: Long, wallMs: Long)

/** Driver loop shared by every iterative algorithm (PageRank / CC / LPA /
  * walks): persist-swap state management, convergence action, and lineage
  * truncation. The per-iteration body is ONE declarative Catalyst plan
  * (join → partial+final aggregate → join), so AQE and whole-stage codegen
  * apply to every superstep.
  *
  * Lineage: each iteration's plan references the previous one; without
  * truncation the plan tree grows (exponentially for multi-reference steps)
  * and the driver dies around iteration ~10. A lazy `localCheckpoint` per
  * iteration caps it. A durable `Checkpointer` (if given) additionally writes
  * state + lineage + metrics tables every `truncateEvery` iterations so a
  * killed run resumes mid-convergence.
  */
object IterativeRunner {

  final case class Result(state: DataFrame, iterations: Int, metrics: Vector[IterMetrics])

  /** @param init        initial state; any schema, must contain the columns
    *                    `step` expects.
    * @param maxIter     hard iteration cap.
    * @param activeCount action deciding convergence: number of still-active
    *                    vertices in the NEW state; 0 stops the loop.
    * @param step        (state, iter) → next state. Must be a pure Dataset
    *                    transformation. It may reference `state` any number of
    *                    times: the loop truncates the plan to a leaf every
    *                    iteration, so multiple references do NOT nest
    *                    exponentially across supersteps (a k-reference step
    *                    would otherwise grow the logical plan k^n deep and OOM
    *                    the driver around iteration 10 — measured, not
    *                    hypothetical).
    */
  /** @param shuffleParts scale-adaptive shuffle-partition count for every
    *   exchange inside the loop (state shuffles, message aggregates) —
    *   normally the count [[IterCache.byKeyAdaptive]] derived for the cached
    *   edge side, so all loop exchanges co-partition with it and the cached
    *   exchange is reused every superstep. None keeps the session setting
    *   (the pre-round-6 behavior: a constant tuned for local[cpus] that
    *   scheduled 32-task stages over kilo-row fixture graphs — guide §2.2). */
  def loop(
      init: DataFrame,
      maxIter: Int,
      truncateEvery: Int = 10,
      checkpointer: Option[Checkpointer] = None,
      shuffleParts: Option[Int] = None)(
      step: (DataFrame, Int) => DataFrame)(
      activeCount: DataFrame => Long): Result = {

    // AQE off for the duration of the loop: adaptive re-planning of the
    // per-superstep message shuffle defeats the static one-exchange plan and
    // its partitioning reuse (measured ~2× slower; PLANS.md). Restored after.
    val spark = init.sparkSession
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val partsBefore = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    shuffleParts.foreach(p => spark.conf.set("spark.sql.shuffle.partitions", p.toString))
    try loopInner(init, maxIter, truncateEvery, checkpointer)(step)(activeCount)
    finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
      spark.conf.set("spark.sql.shuffle.partitions", partsBefore)
    }
  }

  private def loopInner(
      init: DataFrame,
      maxIter: Int,
      truncateEvery: Int,
      checkpointer: Option[Checkpointer])(
      step: (DataFrame, Int) => DataFrame)(
      activeCount: DataFrame => Long): Result = {
    val startIter = checkpointer.flatMap(_.latestIter).getOrElse(0)
    var state = checkpointer.flatMap(_.restore()).getOrElse(init)
    // LAZY localCheckpoint: truncates the logical plan to a leaf immediately
    // (so multi-reference steps can't nest exponentially) but defers
    // materialization to the convergence action — one job per superstep, not
    // two. Storage is MEMORY_AND_DISK; superseded iterations are dropped by
    // the ContextCleaner once unreferenced.
    state = state.localCheckpoint(false)
    var iter = startIter
    val metrics = Vector.newBuilder[IterMetrics]
    var active = 1L
    while (iter < maxIter && active > 0) {
      val t0 = System.nanoTime()
      iter += 1
      var next = step(state, iter).localCheckpoint(false)
      if (iter % truncateEvery == 0) {
        // durable snapshot for kill/resume (and replaces the in-memory leaf
        // with the on-disk one, bounding recovery lineage)
        checkpointer.foreach { cp => next = cp.save(next, iter) }
      }
      active = activeCount(next)
      val m = IterMetrics(iter, active, (System.nanoTime() - t0) / 1000000L)
      metrics += m
      checkpointer.foreach(_.appendMetrics(m))
      state = next
    }
    Result(state, iter, metrics.result())
  }
}
