package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.algo.{ConnectedComponents, KCore, LabelPropagation, PageRank, ShortestPaths, TriangleCount}
import graft.derive.LinkGraph
import graft.operators.GraphOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query takes (spark, sfDir) and runs over the driver's parquet
  * testdata; each has a DuckDB oracle in [[Oracles]] that recomputes the same
  * result independently. The graph queries run on the transcript-shaped view
  * of `events` (conv = user, tool = event type) — the deterministic stand-in
  * for the BASELINE transcript input — and on a larger customer–supplier
  * bipartite graph from orders ⋈ lineitem.
  */
object SparkEntry {

  private def graph(spark: SparkSession, sfDir: String): LinkGraph.GraphTables =
    LinkGraph.fromTranscripts(LinkGraph.transcriptsFromEvents(spark, sfDir))

  private def csGraph(spark: SparkSession, sfDir: String): LinkGraph.GraphTables = {
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val pairs = o.join(l, o("o_orderkey") === l("l_orderkey"))
      .select(
        concat(lit("cust:"), lpad(col("o_custkey").cast("string"), 9, "0")).as("akey"),
        concat(lit("supp:"), lpad(col("l_suppkey").cast("string"), 9, "0")).as("bkey"))
    LinkGraph.fromBipartitePairs(pairs)
  }

  /** Flagship query on /root/testdata/sf0.001: full tolerance-driven PageRank
    * over the transcript link graph, ranks joined back to string keys. */
  def entry(spark: SparkSession): DataFrame = {
    val g = graph(spark, "/root/testdata/sf0.001")
    val pr = PageRank.run(g.edges, tol = 1e-6, maxIter = 100)
    pr.ranks.join(g.vertices, "vid")
      .select(col("vid"), col("key"), col("kind"), col("pr"))
      .orderBy(desc("pr"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_transcripts" -> ((s, d) =>
      LinkGraph.transcriptsFromEvents(s, d)
        .select(col("conv_id"), col("turn_idx"), col("role"), col("text"), col("tool"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"))
        .orderBy("conv_id", "turn_idx")),

    "q_sessions" -> ((s, d) => // gap-based transcript sessionization (1-day gap)
      graft.derive.Sessionize.sessionStats(LinkGraph.transcriptsFromEvents(s, d))
        .orderBy("conv_id", "session_idx")),

    "q_role_transitions" -> ((s, d) => // Markov view of conversation structure
      graft.derive.TranscriptAnalytics.roleTransitions(LinkGraph.transcriptsFromEvents(s, d))
        .orderBy("prev_role", "role")),

    "q_tool_bigrams" -> ((s, d) => // directed tool-transition edges
      graft.derive.TranscriptAnalytics.toolBigrams(LinkGraph.transcriptsFromEvents(s, d))
        .orderBy("prev_tool", "tool")),

    "q_latency" -> ((s, d) => // per-conversation inter-turn gap stats
      graft.derive.TranscriptAnalytics.latencyStats(LinkGraph.transcriptsFromEvents(s, d))
        .orderBy("conv_id")),

    "q_session_tool_pairs" -> ((s, d) => // session-scoped tool co-occurrence
      graft.derive.TranscriptAnalytics.sessionToolPairs(LinkGraph.transcriptsFromEvents(s, d))
        .orderBy("t1", "t2")),

    "q_conv_stats" -> ((s, d) => // per-conversation curation summary
      graft.derive.TranscriptAnalytics.convStats(LinkGraph.transcriptsFromEvents(s, d))
        .orderBy("conv_id")),

    "q_conv_near_dup" -> ((s, d) => // trajectory-level conversation near-dup (exact baseline)
      graft.dedup.Dedup.ngramJaccard(
        graft.derive.TranscriptAnalytics.toolTrajectoryDocs(
          LinkGraph.transcriptsFromEvents(s, d)),
        n = 3, minJaccard = 0.35)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("doc_a", "doc_b")),

    "q_conv_near_dup_lsh" -> ((s, d) => // banded scale path (partial recall at this regime)
      graft.dedup.Dedup.minhashLsh(
        graft.derive.TranscriptAnalytics.toolTrajectoryDocs(
          LinkGraph.transcriptsFromEvents(s, d)),
        n = 3, numHashes = 64, bands = 16, minJaccard = 0.3)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("doc_a", "doc_b")),

    "q_conv_clusters" -> ((s, d) => // end-to-end conversation dedup: canonical conv ids
      graft.dedup.Dedup.clusters(
        graft.derive.TranscriptAnalytics.toolTrajectoryDocs(
          LinkGraph.transcriptsFromEvents(s, d)),
        n = 3, numHashes = 64, bands = 16, minJaccard = 0.3)
        .orderBy("doc_id")),

    "q_vertices" -> ((s, d) => graph(s, d).vertices.orderBy("vid")),

    "q_edges" -> ((s, d) => graph(s, d).edges.orderBy("src", "dst")),

    "q_degree" -> ((s, d) => GraphOps.degrees(graph(s, d).edges).orderBy("vid")),

    "q_adjacency" -> ((s, d) =>
      LinkGraph.symmetrize(graph(s, d).edges).distinct()
        .groupBy(col("src").as("vid"))
        .agg(array_join(transform(sort_array(collect_list(col("dst"))), _.cast("string")), ",")
          .as("neighbors"))
        .orderBy("vid")),

    "q_adjacency_capped" -> ((s, d) => // hub-capped variant: deterministic 3-sample
      GraphOps.adjacency(graph(s, d).edges, maxNeighbors = Some(3))
        .select(col("vid"),
          array_join(transform(col("neighbors"), _.cast("string")), ",").as("neighbors"))
        .orderBy("vid")),

    "q_pagerank" -> ((s, d) =>
      PageRank.runFixed(graph(s, d).edges, iterations = 10)
        .select(col("vid"), round(col("pr"), 6).as("pr"))
        .orderBy("vid")),

    "q_pagerank_conv" -> ((s, d) => {
      val r = PageRank.run(graph(s, d).edges, tol = 1e-6, maxIter = 100)
      convIterations.put(d, r.iterations) // reused by dynamicOracleSql
      r.ranks.select(col("vid"), round(col("pr"), 6).as("pr")).orderBy("vid")
    }),

    "q_pagerank_frontier" -> ((s, d) => { // delta/frontier variant, full replay
      val r = PageRank.runFrontier(graph(s, d).edges, tol = 1e-6, maxIter = 100)
      frontierIterations.put(d, r.iterations) // reused by dynamicOracleSql
      r.ranks.select(col("vid"), round(col("pr"), 6).as("pr")).orderBy("vid")
    }),

    "q_pagerank_weighted" -> ((s, d) => // weight-proportional transition mass
      PageRank.runWeighted(graph(s, d).edges, iterations = 10)
        .select(col("vid"), round(col("pr"), 6).as("pr"))
        .orderBy("vid")),

    "q_ppr" -> ((s, d) => { // personalized PageRank / random-walk-with-restart
      val g = graph(s, d)
      val sources = g.vertices
        .where(col("kind") === "tool" && pmod(col("vid"), lit(7L)) === 0L)
        .select("vid")
      PageRank.runRestart(g.edges, sources, iterations = 10)
        .select(col("vid"), round(col("pr"), 6).as("pr"))
        .orderBy("vid")
    }),

    "q_checkpoint" -> ((s, d) => { // vertex-state SINK + restore round-trip:
      // the loop saves at iteration 10 (truncateEvery default) through the
      // TableIO seam; a FRESH Checkpointer restores it — what the driver
      // then oracles is the persisted-and-reloaded state, so the write
      // path itself is under the hash-match gate
      val dir = java.nio.file.Files.createTempDirectory("graft-q-ckpt").toString
      PageRank.runFixed(graph(s, d).edges, iterations = 10,
        checkpointer = Some(new graft.core.Checkpointer(s, dir, "q")))
      val restored = new graft.core.Checkpointer(s, dir, "q").restore()
        .getOrElse(sys.error("q_checkpoint: no committed snapshot"))
      restored.select(col("vid"), round(col("pr"), 6).as("pr")).orderBy("vid")
    }),

    "q_pagerank_cs" -> ((s, d) =>
      PageRank.runFixed(csGraph(s, d).edges, iterations = 10)
        .select(col("vid"), round(col("pr"), 6).as("pr"))
        .orderBy("vid")),

    "q_cc" -> ((s, d) => {
      val g = graph(s, d)
      ConnectedComponents.run(g.edges, g.vertices).orderBy("vid")
    }),

    "q_cc_minprop" -> ((s, d) => {
      val g = graph(s, d)
      ConnectedComponents.minPropagation(g.edges, g.vertices).orderBy("vid")
    }),

    "q_lpa" -> ((s, d) => {
      val g = graph(s, d)
      LabelPropagation.run(g.edges, g.vertices, iterations = 5).orderBy("vid")
    }),

    "q_triangles" -> ((s, d) => {
      val g = graph(s, d)
      TriangleCount.perVertex(g.edges, g.vertices).orderBy("vid")
    }),

    "q_triangle_total" -> ((s, d) =>
      TriangleCount.triangles(graph(s, d).edges).agg(count(lit(1)).as("triangles"))),

    "q_subgraph" -> ((s, d) => {
      val g = graph(s, d)
      GraphOps.subgraph(g.edges, g.vertices, lit(true), col("weight") >= 2)
        .orderBy("src", "dst")
    }),

    "q_reverse" -> ((s, d) => GraphOps.reverse(graph(s, d).edges).orderBy("src", "dst")),

    "q_weighted_degree" -> ((s, d) =>
      GraphOps.weightedDegrees(graph(s, d).edges).orderBy("vid")),

    "q_aggmsg" -> ((s, d) => { // generic aggregateMessages (both directions)
      val g = graph(s, d)
      val state = g.vertices.select(col("vid"), (pmod(col("vid"), lit(7L)) + 1L).as("w"))
      GraphOps.aggregateMessages(g.edges, state,
        msgToDst = Some(col("src_w") * col("weight")),
        msgToSrc = Some(col("dst_w")),
        merge = sum(col("msg")))
        .orderBy("vid")
    }),

    "q_aggmsg_gated" -> ((s, d) => { // EdgeActiveness gate over an active set
      val g = graph(s, d)
      val state = g.vertices.select(col("vid"), (pmod(col("vid"), lit(7L)) + 1L).as("w"))
      val frontier = g.vertices.where(pmod(col("vid"), lit(3L)) === 0).select("vid")
      GraphOps.aggregateMessages(g.edges, state,
        msgToDst = Some(col("src_w") * col("weight")),
        msgToSrc = Some(col("dst_w")),
        merge = sum(col("msg")),
        activeSet = Some(frontier),
        activeness = GraphOps.EdgeActiveness.Either)
        .orderBy("vid")
    }),

    "q_triplets" -> ((s, d) => {
      val g = graph(s, d)
      GraphOps.triplets(g.edges, g.vertices).orderBy("src", "dst")
    }),

    "q_typed_adjacency" -> ((s, d) => {
      val g = graph(s, d)
      GraphOps.typedAdjacency(g.edges, g.vertices)
        .select(col("vid"), col("kind"),
          array_join(transform(col("neighbors"), _.cast("string")), ",").as("neighbors"))
        .orderBy("vid", "kind")
    }),

    "q_group_edges" -> ((s, d) => {
      // per-event multi-edges (one row per transcript tool call) → groupEdges
      // must reproduce the canonical conv→tool weighted edge arm
      val g = graph(s, d)
      val multi = LinkGraph.transcriptsFromEvents(s, d).where(col("tool").isNotNull)
        .select(concat(lit("conv:"), col("conv_id")).as("akey"),
          concat(lit("tool:"), col("tool")).as("bkey"))
        .join(g.vertices.select(col("vid").as("src"), col("key").as("akey")), "akey")
        .join(g.vertices.select(col("vid").as("dst"), col("key").as("bkey")), "bkey")
        .select(col("src"), col("dst"), lit(1L).as("weight"))
      GraphOps.groupEdges(multi).orderBy("src", "dst")
    }),

    "q_merge_labels" -> ((s, d) => {
      val g = graph(s, d)
      val labels = g.vertices.where(col("vid") % 3 === 0)
        .select(col("vid"), (col("vid") % 7).as("label"))
      graft.sources.GraphLoader.mergeLabels(g.vertices, labels).orderBy("vid")
    }),

    "q_edge_list_file" -> ((s, _) =>
      graft.sources.GraphLoader.edgeListFile(s, "/root/repo/fixtures/cora_sample.txt")
        .orderBy("src", "dst")),

    "q_typed_edge_file" -> ((s, _) => // heterogeneous loader (plain typed cols)
      graft.sources.GraphLoader.typedEdgeListFile(s, "/root/repo/fixtures/typed_edges.txt")
        .select(col("src"), col("src_type").cast("int").as("src_type"),
          col("dst"), col("dst_type").cast("int").as("dst_type"),
          round(col("weight").cast("double"), 6).as("weight"))
        .orderBy("src", "dst")),

    "q_map_vertices" -> ((s, d) => // mapVertices: computed attribute column
      GraphOps.mapVertices(graph(s, d).vertices, "is_conv",
          (col("kind") === "conv").cast("int"))
        .orderBy("vid")),

    "q_map_edges" -> ((s, d) => // mapEdges: computed attribute column
      GraphOps.mapEdges(graph(s, d).edges, "w2", col("weight") * col("weight"))
        .orderBy("src", "dst")),

    "q_graph_stats" -> ((s, d) => { // numVertices/numEdges/vertexIdBounds
      val g = graph(s, d)
      // the three stat APIs are separate actions; lazy leaves keep each from
      // re-running the whole derivation (4 derivations -> 1)
      val edges = g.edges.localCheckpoint(false)
      val vertices = g.vertices.localCheckpoint(false)
      val (mn, mx) = GraphOps.vertexIdBounds(edges)
      import s.implicits._
      Seq((GraphOps.numVertices(vertices), GraphOps.numEdges(edges), mn, mx))
        .toDF("num_vertices", "num_edges", "min_vid", "max_vid")
    }),

    // ---- graph analytics beyond the reference surface ----

    "q_common_neighbors" -> ((s, d) =>
      graft.algo.LinkPrediction.commonNeighbors(graph(s, d).edges, minCommon = 2L)
        .orderBy("a", "b")),

    "q_common_neighbors_capped" -> ((s, d) => // hub-capped wedge centers (scale lever)
      graft.algo.LinkPrediction.commonNeighbors(graph(s, d).edges, minCommon = 1L,
          maxWedgeDegree = Some(20L))
        .orderBy("a", "b")),

    "q_adamic_adar" -> ((s, d) =>
      graft.algo.LinkPrediction.adamicAdar(graph(s, d).edges, minCommon = 2L)
        .select(col("a"), col("b"), col("common"), round(col("aa"), 6).as("aa"))
        .orderBy("a", "b")),

    "q_jaccard_neighbors" -> ((s, d) =>
      graft.algo.LinkPrediction.jaccardNeighbors(graph(s, d).edges, minCommon = 2L)
        .select(col("a"), col("b"), col("common"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("a", "b")),

    "q_clustering_coeff" -> ((s, d) => {
      val g = graph(s, d)
      TriangleCount.clusteringCoefficient(g.edges, g.vertices)
        .select(col("vid"), col("triangles"), col("degree"), round(col("lcc"), 6).as("lcc"))
        .orderBy("vid")
    }),

    "q_degree_hist" -> ((s, d) =>
      GraphOps.degreeHistogram(graph(s, d).edges).orderBy("degree")),

    "q_kcore" -> ((s, d) => { // iterative peel; iteration count → dynamic oracle
      val g = graph(s, d)
      val r = graft.algo.KCore.run(g.edges, g.vertices, k = kcoreK)
      dynIterations.put(s"kcore|$d", r.iterations)
      r.vertices.orderBy("vid")
    }),

    "q_bfs" -> ((s, d) => { // multi-source hop BFS from the landmark set
      val g = graph(s, d)
      val r = graft.algo.ShortestPaths.run(g.edges, g.vertices, landmarks(g), weighted = false)
      dynIterations.put(s"bfs|$d", r.iterations)
      r.distances.orderBy("vid")
    }),

    "q_sssp" -> ((s, d) => { // weighted Bellman–Ford over co-occurrence weights
      val g = graph(s, d)
      val r = graft.algo.ShortestPaths.run(g.edges, g.vertices, landmarks(g), weighted = true)
      dynIterations.put(s"sssp|$d", r.iterations)
      r.distances.orderBy("vid")
    }),

    "q_landmark_dists" -> ((s, d) => { // GraphX lib.ShortestPaths semantics
      val g = graph(s, d)
      val r = graft.algo.ShortestPaths.landmarkDistances(g.edges, g.vertices, lmLandmarks(g))
      dynIterations.put(s"lmdist|$d", r.iterations)
      r.distances.orderBy("vid", "lm")
    }),

    "q_closeness" -> ((s, d) => { // harmonic closeness over the landmark set
      val g = graph(s, d)
      val r = graft.algo.ShortestPaths.landmarkDistances(g.edges, g.vertices, lmLandmarks(g))
      dynIterations.put(s"lmdist|$d", r.iterations)
      graft.algo.ShortestPaths.harmonicCloseness(r.distances)
        .select(col("vid"), col("n_reach"), round(col("harmonic"), 6).as("harmonic"))
        .orderBy("vid")
    }),

    "q_hits" -> ((s, d) => { // Kleinberg hubs & authorities, 10 rounds
      val g = graph(s, d)
      graft.algo.Hits.run(g.edges, g.vertices, iterations = 10).scores
        .select(col("vid"), round(col("hub"), 6).as("hub"), round(col("auth"), 6).as("auth"))
        .orderBy("vid")
    }),

    "q_assortativity" -> ((s, d) =>
      GraphOps.assortativity(graph(s, d).edges)),

    // ---- samplers (reference Reservoir / ARes semantics, deterministic) ----

    "q_sample_uniform" -> ((s, d) =>
      graft.functions.Samplers.uniformK(graph(s, d).edges, 2).orderBy("src", "rnk")),

    "q_sample_weighted" -> ((s, d) =>
      graft.functions.Samplers.weightedK(graph(s, d).edges, 2).orderBy("src", "rnk")),

    "q_sample_typed" -> ((s, d) => { // NeighTN: k per (src, neighbor kind)
      val g = graph(s, d)
      graft.functions.Samplers.uniformKTyped(g.edges, g.vertices, 2)
        .orderBy("src", "kind", "rnk")
    }),

    "q_sample_typed_weighted" -> ((s, d) => { // NeighTNW: A-Res per (src, kind)
      val g = graph(s, d)
      graft.functions.Samplers.weightedKTyped(g.edges, g.vertices, 2)
        .orderBy("src", "kind", "rnk")
    }),

    // ---- random walks (portable positional draws → full oracle replay) ----

    "q_deepwalk" -> ((s, d) =>
      graft.algo.RandomWalks.deepWalk(graph(s, d).edges, walksPerVertex = 1, pathLength = 5)
        .select(col("walk_id"), col("start"), array_join(col("path"), ",").as("path"))
        .orderBy("walk_id")),

    "q_node2vec" -> ((s, d) =>
      graft.algo.RandomWalks.node2vec(graph(s, d).edges, p = 0.5, q = 2.0, pathLength = 5)
        .select(col("walk_id"), col("start"), array_join(col("path"), ",").as("path"))
        .orderBy("walk_id")),

    "q_metapath" -> ((s, d) => {
      val g = graph(s, d)
      graft.algo.RandomWalks.metaPath2Vec(g.edges, g.vertices, Seq("conv", "tool"), pathLength = 5)
        .select(col("walk_id"), col("start"), array_join(col("path"), ",").as("path"))
        .orderBy("walk_id")
    }),

    // ---- text analysis over documents ----

    "q_token_count" -> ((s, d) =>
      graft.text.TextStats.tokenCounts(docs(s, d)).orderBy("doc_id")),

    "q_vocab" -> ((s, d) => // corpus top-100 vocab with tf/df
      graft.text.TextStats.vocab(docs(s, d), 100)
        .orderBy(desc("tf"), asc("tok"))),

    "q_quality" -> ((s, d) =>
      graft.text.TextStats.qualityScores(docs(s, d)).orderBy("doc_id")),

    "q_langid" -> ((s, d) =>
      graft.text.TextStats.langId(docs(s, d)).orderBy("doc_id")),

    "q_fingerprint" -> ((s, d) =>
      graft.text.TextStats.fingerprints(docs(s, d)).orderBy("doc_id")),

    "q_tfidf" -> ((s, d) => // per-doc top-3 tf-idf terms
      graft.text.TextStats.tfidf(docs(s, d), k = 3)
        .select(col("doc_id"), col("rnk"), col("tok"), round(col("score"), 6).as("score"))
        .orderBy("doc_id", "rnk")),

    "q_repetition" -> ((s, d) =>
      graft.text.TextStats.repetition(docs(s, d)).orderBy("doc_id")),

    "q_stratified_sample" -> ((s, d) => // deterministic language-stratified mix
      graft.text.CorpusOps.stratifiedSample(docs(s, d)).orderBy("doc_id")),

    "q_contamination" -> ((s, d) => // 8-gram benchmark-overlap screen
      graft.text.CorpusOps.contamination(docs(s, d)).orderBy("doc_id")),

    // ---- dedup ----

    "q_dedup_exact" -> ((s, d) =>
      graft.dedup.Dedup.exact(docs(s, d)).orderBy("doc_id")),

    "q_ngram_jaccard" -> ((s, d) =>
      graft.dedup.Dedup.ngramJaccard(docs(s, d), n = 3, minJaccard = 0.5)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("doc_a", "doc_b")),

    "q_ngram_jaccard_df" -> ((s, d) => // df-capped candidates, exact verify
      graft.dedup.Dedup.ngramJaccard(docs(s, d), n = 3, minJaccard = 0.3,
        maxShingleDf = Some(5L))
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("doc_a", "doc_b")),

    "q_minhash_lsh" -> ((s, d) =>
      graft.dedup.Dedup.minhashLsh(docs(s, d), minJaccard = 0.5)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("doc_a", "doc_b")),

    "q_dedup_clusters" -> ((s, d) => // full dedup flow: LSH pairs -> CC -> canonical
      graft.dedup.Dedup.clusters(docs(s, d), minJaccard = 0.5)
        .orderBy("doc_id")),

    "q_simhash" -> ((s, d) =>
      graft.dedup.Dedup.simhashPairs(docs(s, d), maxHamming = 3).orderBy("doc_a", "doc_b")),

    // ---- similarity search over embeddings ----

    "q_ann_cosine" -> ((s, d) =>
      graft.sim.Similarity.bruteTopK(embeds(s, d), k = 10, queryPred = col("vec_id") % 10 === 0)
        .select("query_id", "rnk", "neighbor_id")
        .orderBy("query_id", "rnk")),

    "q_ann_lsh" -> ((s, d) => // bucketed scale path; recall vs brute in SimilaritySpec
      graft.sim.Similarity.annTopK(embeds(s, d), k = 10)
        .select("query_id", "rnk", "neighbor_id")
        .orderBy("query_id", "rnk")),

    "q_ann_ivf" -> ((s, d) => // IVF coarse-quantizer ANN (integer-space k-means)
      graft.sim.Similarity.ivfTopK(embeds(s, d), k = 10, nlist = 16)
        .select("query_id", "rnk", "neighbor_id")
        .orderBy("query_id", "rnk")),

    "q_ann_ivf_kernel" -> ((s, d) => // beyond-cap assignment path, same oracle:
      // the mapPartitions kernel is bit-identical to the declarative stage
      graft.sim.Similarity.ivfTopK(embeds(s, d), k = 10, nlist = 16, kernelAssign = true)
        .select("query_id", "rnk", "neighbor_id")
        .orderBy("query_id", "rnk")),

    "q_embed_dedup" -> ((s, d) =>
      graft.sim.Similarity.cosinePairs(embeds(s, d), minCosine = 0.45)
        .select("vec_a", "vec_b")
        .orderBy("vec_a", "vec_b")),

    "q_embed_dedup_lsh" -> ((s, d) => // banded RP-LSH candidates + exact verify
      graft.sim.Similarity.cosinePairsLsh(embeds(s, d), minCosine = 0.45)
        .select(col("vec_a"), col("vec_b"), round(col("cosine"), 6).as("cosine"))
        .orderBy("vec_a", "vec_b")),

    "q_svdpp" -> ((s, d) => { // full SGD replay oracle (Oracles.qSvdpp) + SVDPlusPlusSpec
      val o = s.read.parquet(s"$d/orders.parquet")
      val l = s.read.parquet(s"$d/lineitem.parquet")
      val ratings = o.join(l, o("o_orderkey") === l("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000L).as("dst"),
          (pmod(col("l_quantity").cast("long"), lit(5L)) + 1L).cast("double").as("rating"))
      val r = graft.algo.SVDPlusPlus.run(ratings,
        graft.algo.SVDPlusPlus.Conf(rank = 4, maxIters = 2, minVal = 1.0, maxVal = 5.0))
      // bias + one component each of p and y: factor-path regressions fail
      // the hash directly instead of only via err→bias coupling
      r.vertices.select(col("vid"), round(col("bias"), 6).as("bias"),
          round(element_at(col("p"), 1), 6).as("p0"),
          round(element_at(col("y"), 1), 6).as("y0"))
        .orderBy("vid")
    }),
  )

  private def docs(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/documents.parquet")

  /** k for q_kcore — shared with the dynamic oracle's peel chain. */
  private val kcoreK = 3L

  /** Landmark set for q_bfs / q_sssp: the same deterministic tool-vertex
    * predicate as q_ppr, shared with [[Oracles.ssspChain]]'s `srcs` CTE. */
  private def landmarks(g: LinkGraph.GraphTables): DataFrame =
    g.vertices.where(col("kind") === "tool" && pmod(col("vid"), lit(7L)) === 0L)
      .select("vid")

  /** Landmark set for q_landmark_dists / q_closeness: even-vid tools — a
    * DIFFERENT predicate from [[landmarks]] deliberately, because vid%7
    * selects zero tools at sf0.001 and the per-landmark map oracle would be
    * vacuous there (q_bfs/q_sssp stay non-vacuous with an empty set — they
    * emit dist=-1 for every vertex — so their predicate is unchanged). */
  private def lmLandmarks(g: LinkGraph.GraphTables): DataFrame =
    g.vertices.where(col("kind") === "tool" && pmod(col("vid"), lit(2L)) === 0L)
      .select("vid")

  private def embeds(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/embeddings.parquet")

  def oracleSql: Map[String, String] = Map(
    "q_transcripts" -> Oracles.qTranscripts,
    "q_sessions" -> Oracles.qSessions,
    "q_role_transitions" -> Oracles.qRoleTransitions,
    "q_tool_bigrams" -> Oracles.qToolBigrams,
    "q_latency" -> Oracles.qLatency,
    "q_session_tool_pairs" -> Oracles.qSessionToolPairs,
    "q_conv_stats" -> Oracles.qConvStats,
    "q_conv_near_dup" -> Oracles.qConvNearDup,
    "q_conv_near_dup_lsh" -> Oracles.qConvNearDupLsh,
    "q_conv_clusters" -> Oracles.qConvClusters,
    "q_vertices" -> Oracles.qVertices,
    "q_edges" -> Oracles.qEdges,
    "q_degree" -> Oracles.qDegree,
    "q_adjacency" -> Oracles.qAdjacency,
    "q_adjacency_capped" -> Oracles.qAdjacencyCapped,
    "q_ngram_jaccard_df" -> Oracles.qNgramJaccardDf,
    "q_pagerank" -> Oracles.qPagerank,
    "q_checkpoint" -> Oracles.qPagerank, // restored state == 10-step chain
    "q_pagerank_cs" -> Oracles.qPagerankCs,
    "q_pagerank_weighted" -> Oracles.qPagerankWeighted,
    "q_cc" -> Oracles.qCc,
    "q_cc_minprop" -> Oracles.qCc,
    "q_lpa" -> Oracles.qLpa,
    "q_triangles" -> Oracles.qTriangles,
    "q_triangle_total" -> Oracles.qTriangleTotal,
    "q_subgraph" -> Oracles.qSubgraph,
    "q_reverse" -> Oracles.qReverse,
    "q_weighted_degree" -> Oracles.qWeightedDegree,
    "q_aggmsg" -> Oracles.qAggMsg,
    "q_aggmsg_gated" -> Oracles.qAggMsgGated,
    "q_ppr" -> Oracles.qPpr,
    "q_triplets" -> Oracles.qTriplets,
    "q_typed_adjacency" -> Oracles.qTypedAdjacency,
    "q_group_edges" -> Oracles.qGroupEdges,
    "q_merge_labels" -> Oracles.qMergeLabels,
    "q_edge_list_file" -> Oracles.qEdgeListFile,
    "q_typed_edge_file" -> Oracles.qTypedEdgeFile,
    "q_map_vertices" -> Oracles.qMapVertices,
    "q_map_edges" -> Oracles.qMapEdges,
    "q_graph_stats" -> Oracles.qGraphStats,
    "q_common_neighbors" -> Oracles.qCommonNeighbors,
    "q_common_neighbors_capped" -> Oracles.qCommonNeighborsCapped,
    "q_adamic_adar" -> Oracles.qAdamicAdar,
    "q_jaccard_neighbors" -> Oracles.qJaccardNeighbors,
    "q_clustering_coeff" -> Oracles.qClusteringCoeff,
    "q_degree_hist" -> Oracles.qDegreeHist,
    "q_hits" -> Oracles.qHits,
    "q_assortativity" -> Oracles.qAssortativity,
    "q_tfidf" -> Oracles.qTfidf,
    "q_repetition" -> Oracles.qRepetition,
    "q_stratified_sample" -> Oracles.qStratifiedSample,
    "q_contamination" -> Oracles.qContamination,
    "q_sample_uniform" -> Oracles.qSampleUniform,
    "q_sample_weighted" -> Oracles.qSampleWeighted,
    "q_sample_typed" -> Oracles.qSampleTyped,
    "q_sample_typed_weighted" -> Oracles.qSampleTypedWeighted,
    "q_deepwalk" -> Oracles.qDeepwalk,
    "q_node2vec" -> Oracles.qNode2vec,
    "q_metapath" -> Oracles.qMetapath,
    "q_token_count" -> Oracles.qTokenCount,
    "q_vocab" -> Oracles.qVocab,
    "q_quality" -> Oracles.qQuality,
    "q_langid" -> Oracles.qLangid,
    "q_fingerprint" -> Oracles.qFingerprint,
    "q_dedup_exact" -> Oracles.qDedupExact,
    "q_ngram_jaccard" -> Oracles.qNgramJaccard,
    "q_minhash_lsh" -> Oracles.qMinhashLsh,
    "q_dedup_clusters" -> Oracles.qDedupClusters,
    "q_simhash" -> Oracles.qSimhash,
    "q_ann_cosine" -> Oracles.qAnnCosine,
    "q_ann_lsh" -> Oracles.qAnnLsh,
    "q_ann_ivf" -> Oracles.qAnnIvf,
    "q_ann_ivf_kernel" -> Oracles.qAnnIvf, // kernel == declarative, same replay
    "q_embed_dedup" -> Oracles.qEmbedDedup,
    "q_embed_dedup_lsh" -> Oracles.qEmbedDedupLsh,
    "q_svdpp" -> Oracles.qSvdpp,
    // q_pagerank_conv: the tolerance loop's iteration count is data-dependent,
    // so its oracle is generated at Verify time — see dynamicOracleSql.
  )

  /** Converged iteration counts observed by q_pagerank_conv, per sfDir —
    * lets [[dynamicOracleSql]] reuse the run Verify already executed instead
    * of re-running the heaviest loop (and guarantees the emitted chain
    * length matches the dumped ranks exactly). */
  private val convIterations = new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** Same pattern for the frontier variant's data-dependent iteration count
    * (its freeze/reactivate schedule is deterministic, so the oracle replays
    * the whole loop once the length is known). */
  private val frontierIterations = new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** Data-dependent iteration counts for the peel/relaxation loops
    * (q_kcore / q_bfs / q_sssp), keyed "name|sfDir" — same
    * populate-as-side-effect + computeIfAbsent-fallback contract as
    * [[convIterations]]. */
  private val dynIterations = new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** Oracles that depend on engine state at the driver's scale factor:
    * q_pagerank_conv's oracle is the exact n-step DuckDB recurrence chain
    * for the converged iteration count n. Verify merges this over
    * [[oracleSql]] before dumping oracle_sql.json. */
  def dynamicOracleSql(spark: SparkSession, sfDir: String): Map[String, String] = {
    // computeIfAbsent: the tolerance loop runs AT MOST ONCE per process per
    // sfDir no matter how many times (or in what order relative to the
    // queries map) this is called — q_pagerank_conv populates the cache as a
    // side effect when it runs; the fallback here fills it only if the query
    // never executed (e.g. it crashed upstream in Verify).
    val n = convIterations.computeIfAbsent(sfDir,
      _ => PageRank.run(graph(spark, sfDir).edges, tol = 1e-6, maxIter = 100).iterations).intValue
    val nf = frontierIterations.computeIfAbsent(sfDir,
      _ => PageRank.runFrontier(graph(spark, sfDir).edges, tol = 1e-6, maxIter = 100)
        .iterations).intValue
    val nk = dynIterations.computeIfAbsent(s"kcore|$sfDir", _ => {
      val g = graph(spark, sfDir)
      KCore.run(g.edges, g.vertices, k = kcoreK).iterations
    }).intValue
    val nb = dynIterations.computeIfAbsent(s"bfs|$sfDir", _ => {
      val g = graph(spark, sfDir)
      ShortestPaths.run(g.edges, g.vertices, landmarks(g), weighted = false).iterations
    }).intValue
    val nw = dynIterations.computeIfAbsent(s"sssp|$sfDir", _ => {
      val g = graph(spark, sfDir)
      ShortestPaths.run(g.edges, g.vertices, landmarks(g), weighted = true).iterations
    }).intValue
    val nl = dynIterations.computeIfAbsent(s"lmdist|$sfDir", _ => {
      val g = graph(spark, sfDir)
      ShortestPaths.landmarkDistances(g.edges, g.vertices, lmLandmarks(g)).iterations
    }).intValue
    Map(
      "q_pagerank_conv" ->
        s"""WITH ${Oracles.graphCtes}, ${Oracles.pagerankChain(n)}
           SELECT vid, ROUND(pr, 6) AS pr FROM r$n ORDER BY vid""",
      "q_pagerank_frontier" ->
        s"""WITH ${Oracles.graphCtes}, ${Oracles.frontierChain(nf, freezeTol = 1e-6 * 0.01)}
           SELECT vid, ROUND(pr, 6) AS pr FROM f$nf ORDER BY vid""",
      "q_kcore" ->
        s"""WITH ${Oracles.graphCtes}, ${Oracles.kcoreChain(nk, kcoreK)}
           SELECT s.src AS vid, CAST(COUNT(*) AS BIGINT) AS core_degree
           FROM sym s JOIN kc$nk a ON a.vid = s.src JOIN kc$nk b ON b.vid = s.dst
           GROUP BY s.src ORDER BY vid""",
      "q_bfs" ->
        s"""WITH ${Oracles.graphCtes}, ${Oracles.ssspChain(nb, weighted = false)}
           SELECT vid, COALESCE(dist, CAST(-1 AS BIGINT)) AS dist FROM b$nb ORDER BY vid""",
      "q_sssp" ->
        s"""WITH ${Oracles.graphCtes}, ${Oracles.ssspChain(nw, weighted = true)}
           SELECT vid, COALESCE(dist, CAST(-1 AS BIGINT)) AS dist FROM b$nw ORDER BY vid""",
      "q_landmark_dists" ->
        s"""WITH ${Oracles.graphCtes}, ${Oracles.landmarkChain(nl)}
           SELECT vid, lm, dist FROM lm$nl ORDER BY vid, lm""",
      "q_closeness" ->
        s"""WITH ${Oracles.graphCtes}, ${Oracles.landmarkChain(nl)}
           SELECT vid, CAST(COUNT(*) AS BIGINT) AS n_reach,
                  ROUND(SUM(CASE WHEN dist > 0 THEN CAST(1.0 AS DOUBLE) / dist
                            ELSE CAST(0 AS DOUBLE) END), 6) AS harmonic
           FROM lm$nl GROUP BY vid ORDER BY vid""")
  }
}
