package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Lifecycle for DataFrames the operator pack persists internally.
  *
  * Operators like [[Dedup.minhashLshPairs]] or [[Similarity.annTopK]] cache
  * an intermediate that several subtrees of the returned (lazy) plan read.
  * The operator cannot unpersist it itself — the caller hasn't run the
  * action yet — so every internal persist is registered here and the owner
  * of the session releases them with [[clear]] once results are consumed.
  * [[graft.Verify]] clears after each query; [[graft.Bench]] clears between
  * runs; library callers embedding these operators should do the same (or
  * `spark.catalog.clearCache()`), otherwise cached blocks accumulate for
  * the life of the session.
  */
object OpCache {
  private val tracked = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Persist (memory-and-disk, spill-safe at scale) and track for [[clear]]. */
  private[graft] def persist(df: DataFrame): DataFrame = synchronized {
    tracked += df
    df.persist(StorageLevel.MEMORY_AND_DISK)
  }

  /** Unpersist everything the operator pack has cached since the last clear. */
  def clear(): Unit = synchronized {
    tracked.foreach(_.unpersist(blocking = false))
    tracked.clear()
  }
}
