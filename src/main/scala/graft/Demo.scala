package graft

import org.apache.spark.sql.SparkSession

/** Flagship demo: tolerance-driven PageRank over the transcript link graph
  * (what the driver smoke-checks via SparkEntry.entry). */
object Demo {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.core.Sessions.localBuilder(cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(15, truncate = false)
    println(s"entry rows: $n")
    spark.stop()
  }
}
