package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Edge-list file loaders — behavioral parity with the reference's
  * `GraphLoader` (`graph-algo/.../framework/GraphLoader.scala:16-73`):
  * whitespace-split text lines (2 columns, or 3 with a weight), `#` comments
  * skipped, blank lines skipped, self-loops dropped, optional canonical
  * orientation (keep `src < dst`, flipping reversed edges —
  * `GraphLoader.scala:41-49`), default weight 1 when absent
  * (`EdgePartitionBuilder.scala:16-21`). All scan-time predicates are
  * Catalyst filters on a text scan.
  */
object GraphLoader {

  /** cora.cites-style text edge list → canonical (src, dst, weight) table. */
  def edgeListFile(
      spark: SparkSession,
      path: String,
      canonicalOrientation: Boolean = true): DataFrame = {
    val lines = spark.read.text(path)
      .where(!col("value").startsWith("#") && trim(col("value")) =!= "")
    val parts = lines.select(split(trim(col("value")), "\\s+").as("f"))
    val raw = parts.select(
      element_at(col("f"), 1).cast("long").as("a"),
      element_at(col("f"), 2).cast("long").as("b"),
      when(size(col("f")) >= 3, element_at(col("f"), 3).cast("double"))
        .otherwise(lit(1.0)).as("weight"))
      .where(col("a") =!= col("b")) // reference drops self loops at load
    val oriented =
      if (canonicalOrientation)
        raw.select(least(col("a"), col("b")).as("src"),
          greatest(col("a"), col("b")).as("dst"), col("weight"))
      else raw.select(col("a").as("src"), col("b").as("dst"), col("weight"))
    oriented.groupBy("src", "dst").agg(sum("weight").cast("long").as("weight"))
  }

  /** 4/5-column heterogeneous edge list `(src srcType dst dstType [w])` — the
    * reference's typed loaders (`GraphLoader.scala:379-603`) bit-pack types
    * and weight into one Long; ours are plain columns (Tungsten handles
    * layout). */
  def typedEdgeListFile(spark: SparkSession, path: String): DataFrame = {
    val lines = spark.read.text(path)
      .where(!col("value").startsWith("#") && trim(col("value")) =!= "")
    val f = lines.select(split(trim(col("value")), "\\s+").as("f"))
    f.select(
        element_at(col("f"), 1).cast("long").as("src"),
        element_at(col("f"), 2).cast("short").as("src_type"),
        element_at(col("f"), 3).cast("long").as("dst"),
        element_at(col("f"), 4).cast("short").as("dst_type"),
        when(size(col("f")) >= 5, element_at(col("f"), 5).cast("float"))
          .otherwise(lit(1.0f)).as("weight"))
      .where(col("src") =!= col("dst"))
  }

  /** `mergeTrainingLabel` / `mergeTestLabel` (`GraphLoader.scala:606-634`):
    * zip a (vid, label) table into vertex state — a plain left join here. */
  def mergeLabels(vertices: DataFrame, labels: DataFrame, colName: String = "label"): DataFrame =
    vertices.join(labels.withColumnRenamed("label", colName), Seq("vid"), "left")
}
