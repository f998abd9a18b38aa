package graft.core

import org.apache.spark.sql.SparkSession

/** Session construction shared by the engine mains.
  *
  * Under `spark-submit`, `--master` / `--conf` arrive as `spark.*` system
  * properties in the driver JVM — and a `.master(...)`/`.config(...)` call
  * on the builder would silently OVERRIDE them, turning a cluster submit
  * into a local run on the driver node. So the local master and the
  * local-tuning shuffle-partition default apply ONLY when no external
  * master was injected; everything spark-submit set wins untouched.
  */
object Sessions {

  /** True when launched via spark-submit (or any launcher that injected a
    * master). */
  def externallyManaged: Boolean = sys.props.contains("spark.master")

  /** Builder honoring an injected master: local[cpus] + cpus shuffle
    * partitions otherwise. Callers add their own extra `.config(...)`s
    * (UI off, timezone, local dirs) — those are engine invariants, not
    * cluster-resource settings, so they are safe either way. */
  def localBuilder(cpus: String): SparkSession.Builder = {
    val b = SparkSession.builder()
    if (externallyManaged) {
      println(s"[sessions] deferring to injected spark.master=${sys.props("spark.master")}")
      b
    } else b.master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
  }
}
