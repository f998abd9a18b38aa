package graft

import org.apache.spark.sql.SparkSession

/** BASELINE.json scaling-efficiency evidence: the same PageRank job + input
  * at two parallelism levels (N=8 cores vs 4N=32 cores on this 32-CPU host —
  * the sandbox protocol standing in for N vs 4N executors; see BASELINE.md).
  * Efficiency = (T_8 / T_32) / 4. Prints one JSON line.
  */
object ScalingBench {

  private def runAt(cores: Int, nConvs: Long, nTools: Int): (Long, Int, Double) = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val r = Bench.pagerankHeadline(spark, nConvs, nTools)
    spark.stop()
    // clear the default-session handle so the next builder makes a fresh one
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    r
  }

  def main(args: Array[String]): Unit = {
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "50000").toLong
    val nTools = 500
    // warm-up at full width (JIT, code cache); measurement runs follow
    runAt(32, 2000L, nTools)
    val (e8, i8, t8) = runAt(8, nConvs, nTools)
    val (e32, i32, t32) = runAt(32, nConvs, nTools)
    val thr8 = e8.toDouble * i8 / t8
    val thr32 = e32.toDouble * i32 / t32
    val eff = (t8 / t32) / 4.0
    println(f"""{"metric":"scaling_efficiency","value":$eff%.3f,"unit":"ratio","n8":{"cores":8,"sym_edges":$e8,"iterations":$i8,"loop_sec":$t8%.3f,"edges_per_sec_per_iter":$thr8%.0f},"n32":{"cores":32,"sym_edges":$e32,"iterations":$i32,"loop_sec":$t32%.3f,"edges_per_sec_per_iter":$thr32%.0f}}""")
  }
}
