package graft.core

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Durable iteration-state checkpoint with per-partition lineage and a
  * metrics log, so a killed run resumes mid-convergence (north rule). This
  * supplies what the reference left unimplemented
  * (`PSPartition.checkpoint()` is `???`, `PSPartition.scala:172`) and
  * replaces `Graph.checkpoint` (`Graph.scala:518-528`).
  *
  * Layout (Iceberg-shaped: snapshot-per-iteration directories + an
  * append-only manifest; in production the three tables are Iceberg appends —
  * the format is isolated here, algorithm code never names it):
  *
  *   <root>/<runId>/state/iter=NNNNNN/   parquet snapshot of vertex state
  *   <root>/<runId>/lineage/iter=NNNNNN/ (partition_id, rows, checksum)
  *   <root>/<runId>/metrics.jsonl        one line per iteration
  *   <root>/<runId>/state/iter=NNNNNN/_COMPLETE  commit marker (atomicity:
  *     written after both tables land, so a crash mid-write is invisible)
  */
final class Checkpointer(spark: SparkSession, root: String, runId: String) {

  private val base = s"$root/$runId"

  private def iterDir(iter: Int) = f"$base/state/iter=$iter%06d"

  def save(state: DataFrame, iter: Int): DataFrame = {
    val dir = iterDir(iter)
    state.write.mode("overwrite").parquet(dir)
    val reloaded = spark.read.parquet(dir)
    val hashCols = reloaded.columns.map(col).toSeq
    reloaded
      .groupBy(spark_partition_id().as("partition_id"))
      .agg(count(lit(1)).as("rows"), bit_xor(xxhash64(hashCols: _*)).as("checksum"))
      .withColumn("input_fingerprint", lit(runId))
      .write.mode("overwrite").parquet(f"$base/lineage/iter=$iter%06d")
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(s"$dir/_COMPLETE"), Array.emptyByteArray)
    reloaded
  }

  def appendMetrics(m: IterMetrics): Unit = {
    Files.createDirectories(Paths.get(base))
    val line =
      s"""{"iter":${m.iter},"active_count":${m.activeCount},"wall_ms":${m.wallMs}}\n"""
    Files.write(Paths.get(s"$base/metrics.jsonl"), line.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  /** Latest committed iteration, if any. */
  def latestIter: Option[Int] = {
    val stateDir = Paths.get(s"$base/state")
    if (!Files.isDirectory(stateDir)) None
    else {
      val iters = Files.list(stateDir).iterator()
      var best = -1
      while (iters.hasNext) {
        val p = iters.next()
        val name = p.getFileName.toString
        if (name.startsWith("iter=") && Files.exists(p.resolve("_COMPLETE")))
          best = best.max(name.stripPrefix("iter=").toInt)
      }
      if (best >= 0) Some(best) else None
    }
  }

  def restore(): Option[DataFrame] =
    latestIter.map(i => spark.read.parquet(iterDir(i)))
}
