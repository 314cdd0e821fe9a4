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

  /** Innermost active `scoped` registry for THIS thread (a stack, so
    * scopes nest). Scope-tracked frames never touch the global queue, so
    * concurrent pipelines on other threads (e.g. two streaming queries
    * each persisting inside their own foreachBatch) cannot have their
    * fresh caches evicted by this scope's exit — the exact hazard of
    * diffing a shared registry.
    *
    * Deliberately a plain ThreadLocal, NOT scala.util.DynamicVariable:
    * DynamicVariable inherits through InheritableThreadLocal, so a
    * thread SPAWNED inside a scope (e.g. a streaming query started
    * there) would keep registering into the scope's queue after the
    * scope exited and drained it — an orphaned registry no clear() ever
    * unpersists. With a non-inheriting ThreadLocal, child threads fall
    * through to the global queue. */
  private val scopes = new ThreadLocal[List[
      java.util.concurrent.ConcurrentLinkedQueue[DataFrame]]] {
    override def initialValue(): List[
      java.util.concurrent.ConcurrentLinkedQueue[DataFrame]] = Nil
  }

  private def register(df: DataFrame): Unit = scopes.get() match {
    case head :: _ => head.add(df)
    case Nil => live.add(df)
  }

  private[graft] def persist(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    register(p)
    p
  }

  /** Register an already-persisted frame for its scope's exit (or the
    * next clear() when no scope is active). */
  private[graft] def track(df: DataFrame): DataFrame = { register(df); df }

  /** Unpersist every operator-cached frame registered OUTSIDE any scope
    * since the last clear. Frames inside an active `scoped` belong to
    * that scope and are untouched. */
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
    * co-resident pipelines still depend on. Registration is per-scope and
    * thread-confined (operators build their plans on the calling thread),
    * so parallel pipelines each see only their own caches. */
  def scoped[T](f: => T): T = {
    val mine = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]
    scopes.set(mine :: scopes.get())
    try f
    finally {
      scopes.set(scopes.get().tail)
      var df = mine.poll()
      while (df != null) {
        df.unpersist(blocking = false)
        df = mine.poll()
      }
    }
  }
}
