package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Lifecycle registry for frames operators persist on the caller's
  * behalf (shingle tables, inverted indexes, signature tables, star
  * dims). Operators that consume an intermediate more than once cache
  * it so the expensive narrow work (shingling, hashing) runs once —
  * correct for a single job, but a long-lived session accumulates
  * resident frames it has no handle to drop. Routing those persists
  * here gives the session a release path:
  *
  *  - `OpCache.releaseAll()` after consuming results returns the
  *    executors' storage memory without nuking caches the APPLICATION
  *    made (unlike `spark.catalog.clearCache()`, which drops those
  *    too);
  *  - `OpCache.setStorageLevel(StorageLevel.NONE)` turns operator
  *    caching off entirely (recompute semantics — results identical,
  *    narrow stages run per consumer).
  *
  * Purely-internal per-round frames of iterative algorithms (the CC
  * label tables) keep their explicit in-loop unpersist lifecycle and
  * never appear here; only frames still resident when an operator
  * RETURNS are tracked.
  */
object OpCache {

  @volatile private var level: StorageLevel = StorageLevel.MEMORY_AND_DISK
  private val live =
    java.util.concurrent.ConcurrentHashMap.newKeySet[DataFrame]()

  def storageLevel: StorageLevel = level

  /** `StorageLevel.NONE` disables operator-side caching. */
  def setStorageLevel(l: StorageLevel): Unit = level = l

  /** Persist `df` under the session policy and track it for release.
    * Under `StorageLevel.NONE` this is the identity — callers must not
    * rely on materialization side effects. */
  def persist(df: DataFrame): DataFrame =
    if (level == StorageLevel.NONE) df
    else { df.persist(level); live.add(df); df }

  /** Track an already-persisted frame (iterative algorithms persist
    * their final state directly — lineage truncation needs the
    * materialized RDD regardless of the cache policy). */
  def track(df: DataFrame): DataFrame = { live.add(df); df }

  /** Drop a frame from tracking without touching its storage — for
    * callers that released it themselves (index-scoped unpersist). */
  def untrack(df: DataFrame): Unit = live.remove(df)

  /** Identity snapshot of the currently tracked frames — the scoped
    * release pattern for long-running loops (streaming foreachBatch):
    * snapshot before the batch work, then release exactly the frames
    * the batch persisted (snapshot delta minus anything carried
    * forward) so a lifetime stream never accumulates per-batch cache. */
  def trackedSnapshot: Set[DataFrame] = {
    val b = Set.newBuilder[DataFrame]
    live.forEach(f => b += f)
    b.result()
  }

  /** Unpersist every tracked frame; returns how many were released. */
  def releaseAll(blocking: Boolean = false): Int = {
    var n = 0
    val it = live.iterator()
    while (it.hasNext) {
      it.next().unpersist(blocking)
      it.remove()
      n += 1
    }
    n
  }

  def liveCount: Int = live.size
}
