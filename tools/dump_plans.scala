// Capture .explain("formatted") for named SparkEntry queries into
// plans/r06/<query>_<suffix>.txt. Run with spark-shell against whatever
// graft classes are on the classpath (pre-change classes -> _before, post ->
// _after):
//   GRAFT_PLAN_QUERIES=q_pagerank,q_cc GRAFT_PLAN_SUFFIX=before \
//   /opt/spark/bin/spark-shell --master "local[8]" \
//     --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --driver-class-path target/scala-2.13/classes \
//     -i tools/dump_plans.scala
// NOTE: iterative queries RUN their loop during DataFrame construction, so
// use a small sfDir (default sf0.01) - the plan SHAPE is scale-independent
// except for the adaptive partition counts, which is exactly what the
// before/after pair is meant to show.
{
  val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
  val names = sys.env.getOrElse("GRAFT_PLAN_QUERIES", "q_pagerank").split(",").toSeq
  val suffix = sys.env.getOrElse("GRAFT_PLAN_SUFFIX", "before")
  spark.sparkContext.setLogLevel("ERROR")
  for (n <- names) {
    try {
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"/root/repo/plans/r06/${n}_$suffix.txt"),
        s"// $n @ $sfDir ($suffix)\n" + plan)
      println(s"[dump_plans] wrote $n ($suffix)")
    } catch {
      case e: Throwable => println(s"[dump_plans] $n FAILED: ${e.getMessage}")
    }
  }
}
sys.exit(0)
