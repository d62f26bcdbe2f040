package graft.ops

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Lifecycle registry for persisted operator intermediates.
  *
  * Several operators (LSH band rows, IVF assignments) persist() a plan
  * that is consumed more than once inside the operator's own output
  * plan. `Dataset.persist` registers the plan in Spark's CacheManager,
  * which holds a strong reference until someone unpersists — but the
  * operator cannot unpersist before the CALLER runs its action, and the
  * caller holds only the final DataFrame. Without a hook, every
  * invocation leaks a cache entry (old behavior relied on Bench's global
  * `clearCache()` between queries).
  *
  * [[lease]] persists and records the plan; [[releaseAll]] unpersists
  * everything leased so far. Callers run it after the consuming action:
  *
  * {{{
  *   val result = Dedup.minhashDedupKeepers(docs, "doc_id", "text")
  *   result.write.parquet(out)   // the action that uses the cache
  *   Caches.releaseAll()         // drop operator intermediates
  * }}}
  *
  * `releaseAll` is safe to call at any time — an unpersisted plan simply
  * recomputes — so a coarse per-query cadence (what Bench and Verify do)
  * is always correct.
  */
object Caches {
  private val leased = new ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` at `level` and register it for [[releaseAll]]. */
  def lease(df: DataFrame,
            level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    df.persist(level)
    leased.add(df)
    df
  }

  /** Unpersist (non-blocking) every leased plan and clear the registry. */
  def releaseAll(): Unit = {
    var df = leased.poll()
    while (df != null) { df.unpersist(blocking = false); df = leased.poll() }
  }
}
