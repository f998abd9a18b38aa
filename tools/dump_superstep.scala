// Capture the PageRank-superstep physical plan (the shared shape of every
// iterative algo) at a given scale factor, into
// plans/r06/superstep_<suffix>.txt. Uses IterCache.byKeyAdaptive when the
// classpath has it (post-change classes), else IterCache.byKey (pre-change):
// the before/after pair shows the Exchange partition counts - the round-6
// scale-adaptive partitioning evidence.
//   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 GRAFT_PLAN_SUFFIX=before \
//   SPARK_GRAFT_CPUS=32 /opt/spark/bin/spark-shell --master "local[32]" \
//     --conf spark.sql.shuffle.partitions=32 --conf spark.ui.enabled=false \
//     --driver-class-path target/scala-2.13/classes -i tools/dump_superstep.scala
{
  import org.apache.spark.sql.functions._
  val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
  val suffix = sys.env.getOrElse("GRAFT_PLAN_SUFFIX", "before")
  spark.sparkContext.setLogLevel("ERROR")
  spark.conf.set("spark.sql.adaptive.enabled", "false") // loop conditions
  val g = graft.derive.LinkGraph.fromTranscripts(
    graft.derive.LinkGraph.transcriptsFromEvents(spark, sfDir))
  val symRaw = graft.derive.LinkGraph.symmetrize(g.edges)
  // post-change classes have byKeyAdaptive; fall back to byKey on old ones
  val (sym, parts) =
    try {
      val m = graft.core.IterCache.getClass.getMethod(
        "byKeyAdaptive", classOf[org.apache.spark.sql.DataFrame], classOf[String])
      val r = m.invoke(graft.core.IterCache, symRaw, "src")
        .asInstanceOf[(org.apache.spark.sql.DataFrame, Int)]
      spark.conf.set("spark.sql.shuffle.partitions", r._2.toString)
      r
    } catch {
      case _: NoSuchMethodException =>
        (graft.core.IterCache.byKey(symRaw, "src"),
          spark.conf.get("spark.sql.shuffle.partitions").toInt)
    }
  sym.count()
  val state = sym.groupBy(col("src").as("vid"))
    .agg(count(lit(1)).cast("double").as("deg"))
    .select(col("vid"), lit(1.0).as("pr"), col("deg"))
    .localCheckpoint(true)
  val msgs = sym.join(state.select(col("vid").as("src"), // r/deg state-side, as PageRank.messageSums
      (col("pr") / col("deg")).as("contrib"))
      .hint("shuffle_hash"), "src")
    .groupBy(col("dst").as("vid")).agg(sum(col("contrib")).as("msum"))
  val next = state.join(msgs.hint("shuffle_hash"), Seq("vid"), "left")
    .select(col("vid"),
      (lit(0.15) * col("pr") + lit(0.85) * coalesce(col("msum"), lit(0.0))).as("pr"),
      col("deg"))
  val plan = next.queryExecution.explainString(
    org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  java.nio.file.Files.writeString(
    java.nio.file.Paths.get(s"/root/repo/plans/r06/superstep_$suffix.txt"),
    s"// PageRank superstep @ $sfDir ($suffix), loop shuffle partitions = $parts\n" + plan)
  println(s"[dump_superstep] wrote superstep_$suffix.txt (parts=$parts)")
}
sys.exit(0)
