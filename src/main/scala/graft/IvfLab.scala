package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sim.Similarity

/** A/B lab for the IVF assignment stage (BASELINE.md §g): declarative
  * broadcast-join+aggregate vs the mapPartitions integer kernel, on
  * deterministic synthetic embeddings. The declarative form pushes
  * n·dim·nlist ROWS through an aggregate, so it is only measurable at
  * small n·nlist; the kernel does the same arithmetic as a dense per-row
  * loop and is the beyond-1024-nlist deployment path.
  *
  * Usage: runMain graft.IvfLab <n> <dim> <nlist> <decl|kernel|both> [reps]
  */
object IvfLab {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val dim = if (args.length > 1) args(1).toInt else 32
    val nlist = if (args.length > 2) args(2).toInt else 1024
    val mode = if (args.length > 3) args(3) else "both"
    val reps = if (args.length > 4) args(4).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions.localBuilder(cpus)
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic synthetic embeddings in [-1, 1): portable mix per (id, i)
    val emb = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(dim)),
        i => (pmod(col("id") * 2654435761L + i.cast("long") * 40503L + 7L, lit(1000003L))
          / lit(500001.5) - lit(1.0)).cast("float")).as("embedding"))
      .repartition(cpus.toInt).persist()
    emb.count()

    def time(label: String, kernel: Boolean): Unit = {
      for (rep <- 1 to reps) {
        val t0 = System.nanoTime()
        val cnt = Similarity.assignOnce(emb, nlist, kernel = kernel).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"IVFLAB form=$label n=$n dim=$dim nlist=$nlist rep=$rep " +
          f"assigned=$cnt sec=$sec%.3f")
      }
    }
    if (mode == "decl" || mode == "both") time("declarative", kernel = false)
    if (mode == "kernel" || mode == "both") time("kernel", kernel = true)
    spark.stop()
  }
}
