package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Registry for DataFrames persisted inside operators (shingle tables, SRP
  * signature tables) whose lineage branches within one returned plan. The
  * operator cannot unpersist them itself — the returned DataFrame is lazy —
  * so long-lived sessions call `Caches.clear()` between logical runs
  * (Verify and Bench do, per query) to stop cached blocks accumulating
  * until eviction pressure. */
object Caches {
  private val live = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]

  private[graft] def persist(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    live.add(p)
    p
  }

  /** Register an already-persisted frame for the next clear(). */
  private[graft] def track(df: DataFrame): DataFrame = { live.add(df); df }

  /** Unpersist every operator-cached frame registered since the last clear. */
  def clear(): Unit = {
    var df = live.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = live.poll()
    }
  }

  /** Run `f`, then unpersist ONLY the frames persisted during it — for
    * operators embedded in long-lived applications (e.g. a streaming
    * foreachBatch) where the global `clear()` would also evict caches
    * co-resident pipelines still depend on. */
  def scoped[T](f: => T): T = {
    val before = new java.util.IdentityHashMap[DataFrame, java.lang.Boolean]
    live.forEach(df => before.put(df, java.lang.Boolean.TRUE))
    try f
    finally {
      val it = live.iterator()
      while (it.hasNext) {
        val df = it.next()
        if (!before.containsKey(df)) {
          df.unpersist(blocking = false)
          it.remove()
        }
      }
    }
  }
}
