package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.derive.LinkGraph

/** Prints the physical plans of the engine's hot paths for audit:
  * parquet pushdown in the derivation scan, the PageRank superstep shape
  * (exchange reuse, shuffle-hash joins, whole-stage codegen spans), and the
  * triangle-count join. Findings are recorded in PLANS.md. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false") // static plans for readability
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    println("=== A. derivation scan: events → transcripts (expect pushed filters + pruned ReadSchema) ===")
    LinkGraph.transcriptsFromEvents(spark, sfDir)
      .where(col("tool").isNotNull)
      .select("conv_id", "tool")
      .explain("formatted")

    println("=== B. PageRank superstep (expect: adj InMemoryTableScan, ShuffledHashJoin, partial+final HashAggregate, NO BroadcastExchange) ===")
    val g = LinkGraph.fromTranscripts(LinkGraph.transcriptsFromEvents(spark, sfDir))
    val sym = LinkGraph.symmetrize(g.edges)
    val deg = sym.groupBy("src").agg(count(lit(1)).as("deg"))
    val adj = graft.core.IterCache.byKey(
      sym.join(deg, "src").select(col("src"), col("dst"), (lit(1.0) / col("deg")).as("inv")), "src")
    adj.count()
    val state = adj.select(col("src").as("vid")).distinct()
      .select(col("vid"), lit(1.0).as("pr")).localCheckpoint(true)
    val msgs = adj.join(state.select(col("vid").as("src"), col("pr")).hint("shuffle_hash"), "src")
      .groupBy(col("dst").as("vid")).agg(sum(col("pr") * col("inv")).as("msum"))
    state.join(msgs.hint("shuffle_hash"), Seq("vid"), "left")
      .select(col("vid"), (lit(0.15) * col("pr") + lit(0.85) * coalesce(col("msum"), lit(0.0))).as("pr"))
      .explain("formatted")

    println("=== C. token stats over documents (expect single codegen span over the scan) ===")
    graft.text.TextStats.tokenCounts(spark.read.parquet(s"$sfDir/documents.parquet"))
      .explain("formatted")

    println("=== D. vocab top-k (expect partial+final HashAggregate then TakeOrderedAndProject — no Window, no full Sort) ===")
    graft.text.TextStats.vocab(spark.read.parquet(s"$sfDir/documents.parquet"), 100)
      .explain("formatted")

    println("=== E. generic aggregateMessages (expect two joins + Union + partial+final HashAggregate, no BroadcastExchange of state) ===")
    val amState = g.vertices.select(col("vid"), (pmod(col("vid"), lit(7L)) + 1L).as("w"))
    graft.operators.GraphOps.aggregateMessages(g.edges, amState,
      msgToDst = Some(col("src_w") * col("weight")),
      msgToSrc = Some(col("dst_w")),
      merge = sum(col("msg")))
      .explain("formatted")

    println("=== F. gated aggregateMessages, Either (expect semi+anti ShuffledHashJoins on the frontier, NO row-multiplying join, then the E-shape) ===")
    val frontier = g.vertices.where(pmod(col("vid"), lit(3L)) === 0).select("vid")
    graft.operators.GraphOps.aggregateMessages(g.edges, amState,
      msgToDst = Some(col("src_w") * col("weight")),
      msgToSrc = Some(col("dst_w")),
      merge = sum(col("msg")),
      activeSet = Some(frontier),
      activeness = graft.operators.GraphOps.EdgeActiveness.Either)
      .explain("formatted")

    println("=== G. typed weighted k-sample (expect ONE Exchange on the window keys feeding Window(src,kind) + filter; dict join broadcast-eligible) ===")
    graft.functions.Samplers.weightedKTyped(g.edges, g.vertices, 2)
      .explain("formatted")

    spark.stop()
  }
}
