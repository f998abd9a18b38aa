package graft

import org.apache.spark.sql.SparkSession

/** Micro-lab: time named SparkEntry queries in a fresh session under the
  * exact Bench conditions (clearCache between runs, repeats to separate
  * first-run JIT/IO from steady state). Usage:
  *   runMain graft.QueryLab q_pagerank_cs[,q_x,...] [sfDir] [reps]
  */
object QueryLab {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q_pagerank_cs").split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions.localBuilder(cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names; rep <- 1 to reps) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"QUERYLAB $name rep=$rep rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
