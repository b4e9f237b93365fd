package graft.util

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Tracked persist() for operator-internal intermediates (LSH buckets,
  * shingle tables, hashed embeddings, …).
  *
  * The similarity/dedup operators materialize intermediates that are read by
  * several downstream joins; plain `persist` leaves the blocks pinned until
  * the session ends unless every caller remembers to unpersist. Routing those
  * persists through [[cache]] registers them here, so a long-lived session
  * (a notebook, a service) can release everything an operator pinned with one
  * [[releaseAll]] call once the returned DataFrame has been materialized.
  * `Verify`/`Bench` call it between queries; library users should call it
  * after consuming an operator's result (it is a no-op when nothing is
  * tracked, and unpersisting is always safe — Spark recomputes on demand).
  */
object Caches {

  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()

  /** Persist `df` (MEMORY_AND_DISK) and track it for [[releaseAll]]. */
  def cache[T](df: Dataset[T]): Dataset[T] = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    tracked.add(df)
    df
  }

  /** Unpersist every tracked intermediate (non-blocking) and clear the
    * registry. Safe to call at any time: lazily-recomputed lineage keeps
    * results correct even if a tracked plan is re-executed later.
    */
  def releaseAll(): Unit = {
    var df = tracked.poll()
    while (df != null) {
      df.unpersist(false)
      df = tracked.poll()
    }
  }
}
