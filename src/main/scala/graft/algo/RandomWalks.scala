package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.derive.LinkGraph

/** Random-walk generators (DeepWalk / Node2Vec / MetaPath2Vec — the
  * reference's walker stack, `graph-algo/.../algo/walker/`). The reference
  * grows PS-resident paths tail-by-tail with pull/sample/push RPC chatter
  * (`DeepWalk.scala:140-187`); here a walk table self-extends by one join
  * against a cached adjacency table per step — one shuffle per step, no
  * driver round-trips per batch.
  *
  * Sampling is deterministic: the step draw is a hash of (walk id, step,
  * seed), so walks are reproducible across runs and partitionings (the
  * reference's global `new Random()`, `package.scala:11`, is not).
  */
object RandomWalks {

  private def adjacencyWeighted(edges: DataFrame): DataFrame =
    edges.select(col("src"), col("dst"), col("weight"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst"), col("weight")))
      .groupBy("src")
      .agg(collect_list(struct(col("dst"), col("weight").cast("double").as("w"))).as("nbrs"))
      .select(col("src"),
        array_sort(col("nbrs")).as("nbrs")) // deterministic order for indexed draws

  /** DeepWalk: `walksPerVertex` uniform walks of length `pathLength` from
    * every vertex. Output: (walk_id, start, path: Array[Long]).
    * (`algo/walker/deepwalk/DeepWalk.scala:17-199`; defaults pathLength=10,
    * `WalkerBase.scala:19-21`.) */
  def deepWalk(
      edges: DataFrame,
      walksPerVertex: Int = 1,
      pathLength: Int = 10,
      seed: Long = 42L): DataFrame = {
    val adj = adjacencyWeighted(edges).persist(StorageLevel.MEMORY_AND_DISK)
    val starts = adj.select(col("src").as("cur"))
      .crossJoin(spark(adj).range(walksPerVertex).select(col("id").as("rep")))
      .select(
        (col("cur") * walksPerVertex + col("rep")).as("walk_id"),
        col("cur"),
        array(col("cur")).as("path"))
    var walks = starts.localCheckpoint(false)
    for (step <- 1 until pathLength) {
      val drawn = walks.join(adj, walks("cur") === adj("src"))
        .withColumn("pick",
          element_at(col("nbrs"),
            (pmod(xxhash64(col("walk_id"), lit(step), lit(seed)), size(col("nbrs"))) + 1)
              .cast("int")))
        .select(col("walk_id"), col("pick.dst").as("cur"),
          concat(col("path"), array(col("pick.dst"))).as("path"))
      walks = drawn.localCheckpoint(false)
    }
    adj.unpersist(false)
    walks.select(col("walk_id"), element_at(col("path"), 1).as("start"), col("path"))
  }

  /** Node2Vec p/q-biased second-order walk via bounded rejection sampling
    * (the reference's scheme, `Node2Vec.scala:199-240`, acceptance by
    * d(prev,x) ∈ {0,1,2}): candidates are drawn uniformly; candidate x from
    * cur with previous vertex prev is accepted with probability
    * 1/p if x = prev, 1 if x ∈ N(prev), 1/q otherwise. `attempts` bounded
    * draws per step, last draw force-accepted (bias bounded by
    * (1-min(1,1/p,1/q))^attempts). */
  def node2vec(
      edges: DataFrame,
      p: Double = 1.0,
      q: Double = 0.8,
      pathLength: Int = 10,
      attempts: Int = 4,
      seed: Long = 42L): DataFrame = {
    val adj = adjacencyWeighted(edges).persist(StorageLevel.MEMORY_AND_DISK)
    val nbrSets = adj.select(col("src"),
      array_sort(transform(col("nbrs"), x => x.getField("dst"))).as("nbrset"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // step 1: uniform
    val starts = adj.select(col("src").as("walk_id"))
      .select(col("walk_id"), col("walk_id").as("prev"), col("walk_id").as("cur"),
        array(col("walk_id")).as("path"))
    var walks = starts.join(adj, col("cur") === col("src"))
      .withColumn("pick", element_at(col("nbrs"),
        (pmod(xxhash64(col("walk_id"), lit(1L), lit(seed)), size(col("nbrs"))) + 1).cast("int")))
      .select(col("walk_id"), col("cur").as("prev"), col("pick.dst").as("cur"),
        concat(col("path"), array(col("pick.dst"))).as("path"))
      .localCheckpoint(false)
    for (step <- 2 until pathLength) {
      var w = walks.join(adj, col("cur") === col("src")).drop("src")
        .join(nbrSets.withColumnRenamed("src", "prev").withColumnRenamed("nbrset", "prev_nbrs"),
          Seq("prev"))
        .withColumn("accepted", lit(null).cast("long"))
      for (t <- 0 until attempts) {
        val cand = col("pick_t.dst")
        val u = pmod(xxhash64(col("walk_id"), lit(step.toLong), lit(t.toLong), lit(seed), lit("acc")),
          lit(1000003L)).cast("double") / lit(1000003.0)
        val acceptProb = when(cand === col("prev"), lit(1.0 / p))
          .when(array_contains(col("prev_nbrs"), cand), lit(1.0))
          .otherwise(lit(1.0 / q))
        val forced = t == attempts - 1
        w = w.withColumn("pick_t",
            element_at(col("nbrs"),
              (pmod(xxhash64(col("walk_id"), lit(step.toLong), lit(t.toLong), lit(seed)),
                size(col("nbrs"))) + 1).cast("int")))
          .withColumn("accepted",
            coalesce(col("accepted"),
              when(if (forced) lit(true) else u < acceptProb, cand)))
          .drop("pick_t")
      }
      walks = w.select(col("walk_id"), col("cur").as("prev"), col("accepted").as("cur"),
          concat(col("path"), array(col("accepted"))).as("path"))
        .localCheckpoint(false)
    }
    adj.unpersist(false); nbrSets.unpersist(false)
    walks.select(col("walk_id"), element_at(col("path"), 1).as("start"), col("path"))
  }

  /** MetaPath2Vec: type-constrained walk (`MetaPath2Vec.scala:151-171`): at
    * step s only neighbors whose kind equals metaPath(s % len) are eligible;
    * walks with no eligible neighbor stop (path keeps its length so far). */
  def metaPath2Vec(
      edges: DataFrame,
      vertices: DataFrame,
      metaPath: Seq[String],
      pathLength: Int = 10,
      seed: Long = 42L): DataFrame = {
    val kinds = vertices.select(col("vid").as("dst"), col("kind"))
    val adj = LinkGraph.symmetrize(edges)
      .join(kinds, "dst")
      .groupBy(col("src"), col("kind"))
      .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val starts = vertices.where(col("kind") === metaPath.head)
      .select(col("vid").as("walk_id"), col("vid").as("cur"), array(col("vid")).as("path"),
        lit(false).as("stopped"))
    var walks = starts.localCheckpoint(false)
    for (step <- 1 until pathLength) {
      val wantKind = metaPath(step % metaPath.length)
      val joined = walks.join(
        adj.where(col("kind") === wantKind).select(col("src"), col("nbrs")),
        walks("cur") === col("src"), "left")
      val drawn = joined.select(
        col("walk_id"),
        when(col("stopped") || col("nbrs").isNull, col("cur"))
          .otherwise(element_at(col("nbrs"),
            (pmod(xxhash64(col("walk_id"), lit(step.toLong), lit(seed)), size(col("nbrs"))) + 1)
              .cast("int"))).as("cur"),
        when(col("stopped") || col("nbrs").isNull, col("path"))
          .otherwise(concat(col("path"), array(element_at(col("nbrs"),
            (pmod(xxhash64(col("walk_id"), lit(step.toLong), lit(seed)), size(col("nbrs"))) + 1)
              .cast("int"))))).as("path"),
        (col("stopped") || col("nbrs").isNull).as("stopped"))
      walks = drawn.localCheckpoint(false)
    }
    adj.unpersist(false)
    walks.select(col("walk_id"), element_at(col("path"), 1).as("start"), col("path"))
  }

  private def spark(df: DataFrame) = df.sparkSession
}
