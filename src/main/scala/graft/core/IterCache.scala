package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.storage.StorageLevel

/** Iteration-side cache for the big (edge-shaped) operand of a superstep
  * loop. Three deliberate choices, each measured in PerfLab:
  *
  *  1. `localCheckpoint(DISK_ONLY)` first: truncates the (possibly huge)
  *     derivation lineage to a leaf. The CacheManager canonicalizes every
  *     query's plan against each cache entry's plan — with a large plan under
  *     the cache this is a serial driver cost paid once per iteration, and it
  *     dominated the loop before truncation. DISK_ONLY keeps the row-format
  *     checkpoint off the heap (it is read exactly once).
  *  2. `repartition(key)`: the loop's equi-join key; every superstep reuses
  *     this exchange so only the vertex-sized side shuffles per iteration.
  *  3. Dataset `persist()` on top: columnar compressed batches (~10× less
  *     heap than row caching; GC was the scaling bottleneck at 10M+ rows).
  */
object IterCache {

  def byKey(df: DataFrame, key: String): DataFrame =
    df.localCheckpoint(true, StorageLevel.DISK_ONLY)
      .repartition(col(key))
      .persist()

  /** [[byKey]] + downcast the given long id columns to int when the observed
    * id space fits in int32. MEASURED NEGATIVE on this workload: the round-2
    * A/B on the 337M-edge superstep (`ScalingBench`, packed vs unpacked at 8
    * and 32 cores) showed int packing ~6% SLOWER at both levels with
    * identical 8→32 efficiency — the columnar cache already compresses long
    * vids, so the casts cost more than the width saves (BASELINE.md §c).
    * Kept as the documented experiment + for callers whose cached side is
    * NOT behind a columnar cache. Returns (cached frame, packed?). */
  def byKeyPacked(df: DataFrame, key: String, idCols: Seq[String]): (DataFrame, Boolean) = {
    import org.apache.spark.sql.functions.{greatest, least, max, min}
    val leaf = df.localCheckpoint(true, StorageLevel.DISK_ONLY)
    val bounds = leaf.agg(
      min(least(idCols.map(col): _*)).as("mn"),
      max(greatest(idCols.map(col): _*)).as("mx")).head()
    val pack = !bounds.isNullAt(0) &&
      bounds.getLong(0) > Int.MinValue.toLong && bounds.getLong(1) < Int.MaxValue.toLong
    val typed =
      if (pack) leaf.select(leaf.columns.map(c =>
        if (idCols.contains(c)) col(c).cast("int").as(c) else col(c)): _*)
      else leaf
    (typed.repartition(col(key)).persist(), pack)
  }
}
