package graft.derive

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Deterministic dense vertex-id dictionary: `vid = row_number() over (order
  * by key)` (1-based), computed scalably.
  *
  * The reference dictionary-encodes vertex ids per edge partition
  * (`global2local`/`local2global`, `EdgePartitionBuilder.scala:121-154`); ours
  * is global and persisted so string keys (`conv:<id>`, `tool:<name>`) become
  * dense Longs exactly once.
  *
  * A naive `row_number().over(Window.orderBy(key))` forces all keys through a
  * single partition — a non-starter at 10^12-turn scale. Instead we range
  * partition by key, sort within partitions, and assign global offsets with
  * `zipWithIndex` (one extra count job; ids are a pure function of the sorted
  * key order, hence independent of partition count and deterministic).
  */
object Dictionary {

  /** @param keys single string column named `key`, need not be distinct.
    * @return DataFrame(vid: Long, key: String), vid 1-based dense in key order.
    */
  def encode(keys: DataFrame, numPartitions: Int = 0): DataFrame = {
    val spark = keys.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism.max(1)
    val sorted = keys
      .select(col("key").cast(StringType))
      .distinct()
      .repartitionByRange(parts, col("key"))
      .sortWithinPartitions("key")
    // zipWithIndex is the documented scalable stand-in for a global row_number:
    // index = partition offset + local position, partitions are ordered ranges.
    val rows = sorted.rdd.zipWithIndex.map { case (r, i) => Row(i + 1L, r.getString(0)) }
    // lazy localCheckpoint: the dictionary is referenced 2-5× per derivation
    // (keys union, src join, dst join) — without a leaf each reference
    // re-runs the distinct shuffle + the zipWithIndex count job; with it the
    // id assignment materializes exactly once per graph (A/B in BASELINE.md
    // §f: q_pagerank_cs derivation 22.7 s → measured drop)
    spark.createDataFrame(
      rows,
      StructType(Seq(StructField("vid", LongType, false), StructField("key", StringType, false))))
      .localCheckpoint(false)
  }
}
