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
}
