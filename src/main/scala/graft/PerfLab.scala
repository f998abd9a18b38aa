package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.derive.LinkGraph
import graft.model.SyntheticTranscripts

/** Join-strategy experiments for the PageRank superstep (run manually; the
  * winning configuration is what graft.algo.PageRank ships with). Compares
  * per-iteration strategies at a given size and core count:
  *   broadcast  — state broadcast into the adj join (driver collect per iter)
  *   shufflehash — co-partitioned shuffle-hash joins (no driver collect;
  *                 the only shape that survives a billion-row rank table)
  */
object PerfLab {

  def loopFixed(adj: DataFrame, init: DataFrame, iters: Int, mode: String): (Double, Double) = {
    var state = init.localCheckpoint(false)
    val perIter = Array.newBuilder[Double]
    val t0 = System.nanoTime()
    for (_ <- 1 to iters) {
      val ti = System.nanoTime()
      val stateForJoin = mode match {
        case "broadcast"   => broadcast(state.select(col("vid").as("src"), col("pr")))
        case "shufflehash" => state.select(col("vid").as("src"), col("pr")).hint("shuffle_hash")
        case _             => state.select(col("vid").as("src"), col("pr"))
      }
      val msgs = adj.join(stateForJoin, "src")
        .groupBy(col("dst").as("vid"))
        .agg(sum(col("pr") * col("inv")).as("msum"))
      val joined = mode match {
        case "shufflehash" => state.join(msgs.hint("shuffle_hash"), Seq("vid"), "left")
        case _             => state.join(msgs, Seq("vid"), "left")
      }
      state = joined.select(col("vid"),
          (lit(0.15) * col("pr") + lit(0.85) * coalesce(col("msum"), lit(0.0))).as("pr"))
        .localCheckpoint(false)
      state.count()
      perIter += (System.nanoTime() - ti) / 1e9
    }
    ((System.nanoTime() - t0) / 1e9, perIter.result().min)
  }

  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("32").toInt
    val nConvs = if (args.length > 1) args(1).toLong else 50000L
    val iters = if (args.length > 2) args(2).toInt else 15
    val aqe = if (args.length > 3) args(3).toBoolean else true
    val parts = if (args.length > 4) args(4).toInt else cores
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.adaptive.enabled", aqe.toString)
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val g = LinkGraph.fromTranscripts(SyntheticTranscripts.generate(spark, nConvs, 20, 500))
    val sym = LinkGraph.symmetrize(g.edges)
    val deg = sym.groupBy("src").agg(count(lit(1)).as("deg"))
    val adjBase = sym.join(deg, "src")
      .select(col("src"), col("dst"), (lit(1.0) / col("deg")).as("inv"))
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val adj = adjBase.repartition(col("src")).persist()
    val nEdges = adj.count()
    val init = adj.select(col("src").as("vid")).distinct()
      .select(col("vid"), lit(1.0).as("pr"))
    for (mode <- Seq("shufflehash", "broadcast", "shufflehash")) {
      val (secs, minIter) = loopFixed(adj, init, iters, mode)
      println(f"PERF cores=$cores parts=$parts convs=$nConvs aqe=$aqe mode=$mode sym_edges=$nEdges iters=$iters sec=$secs%.2f perIter=${secs / iters}%.3f minIter=$minIter%.3f")
    }
    spark.stop()
  }
}
