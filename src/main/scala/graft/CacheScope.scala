package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Registry of the MEMORY_AND_DISK persists graft operators create
  * internally (multi-action forward-fill, near-dup signature/vector caches,
  * bounds-defaulted resample reads). Those caches back LAZY results, so the
  * operator itself can never unpersist them — without a hook, a long-lived
  * driver session accumulates cached blocks until `spark.catalog
  * .clearCache()` or plan GC. Call [[release]] between batches (or after
  * fully consuming a result) to drop every operator-created cache at once,
  * without touching caches the APPLICATION created.
  *
  * Tracking is JVM-global across sessions (each frame unpersists against
  * its own session's block manager); entries are dropped on release, so the
  * registry's own footprint is bounded by the operator calls since the last
  * release.
  */
object CacheScope {

  private val tracked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[DataFrame]()

  /** Persist `df` at MEMORY_AND_DISK and track it for [[release]]. */
  def persist(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    tracked.add(p)
    p
  }

  /** Unpersist every tracked frame and forget it; returns how many were
    * released. Non-blocking (block eviction proceeds asynchronously).
    * Safe while results are still live: an unpersisted plan recomputes.
    */
  def release(): Int = {
    val it = tracked.iterator()
    var n = 0
    while (it.hasNext) { it.next().unpersist(blocking = false); it.remove(); n += 1 }
    n
  }

  /** Unpersist tracked frames of one session only (multi-session JVMs). */
  def release(spark: org.apache.spark.sql.SparkSession): Int = {
    val it = tracked.iterator()
    var n = 0
    while (it.hasNext) {
      val df = it.next()
      if (df.sparkSession eq spark) { df.unpersist(blocking = false); it.remove(); n += 1 }
    }
    n
  }

  /** Number of currently tracked (not yet released) operator caches. */
  def trackedCount: Int = tracked.size

  /** Marker for [[releaseNewSince]]: the set of frames tracked right now. */
  def snapshot(): java.util.Set[DataFrame] = {
    val s = java.util.concurrent.ConcurrentHashMap.newKeySet[DataFrame]()
    s.addAll(tracked)
    s
  }

  /** Unpersist only frames first tracked AFTER `snap` was taken — the
    * scoped release for loops (e.g. per streaming micro-batch) that must
    * not drop caches the application created earlier. Frames persisted
    * concurrently by OTHER threads during the window are also released;
    * single-writer loops are the intended user.
    */
  def releaseNewSince(snap: java.util.Set[DataFrame]): Int = {
    val it = tracked.iterator()
    var n = 0
    while (it.hasNext) {
      val df = it.next()
      if (!snap.contains(df)) { df.unpersist(blocking = false); it.remove(); n += 1 }
    }
    n
  }
}
