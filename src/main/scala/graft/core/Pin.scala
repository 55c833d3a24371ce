package graft.core

import org.apache.spark.sql.DataFrame

/** Eagerly materialize a frame so downstream consumers never re-read its
  * inputs — the barrier a read-modify-write needs when the frame derives
  * from the very table a following merge rewrites. `cache()+count()` is
  * only a BEST-EFFORT pin: evicted or executor-lost cached blocks
  * recompute from lineage, i.e. against the half-rewritten table.
  * `localCheckpoint(eager = true)` truncates lineage, so a lost block is a
  * loud recompute failure instead of a silent wrong answer.
  *
  * `Dataset.unpersist` clears only cache-manager caches, never
  * localCheckpoint RDD persists, so each pin also returns a `free` thunk
  * that unpersists exactly the RDD blocks the checkpoint registered
  * (diffed on `SparkContext.getPersistentRDDs`; callers pin sequentially,
  * so the diff is precise). Forgetting to call it leaks blocks for the
  * session lifetime — always `try ... finally free()`. */
object Pin {

  /** Eager localCheckpoint plus the thunk that frees its blocks. */
  def apply(df: DataFrame): (DataFrame, () => Unit) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val cp = df.localCheckpoint(true)
    val fresh = sc.getPersistentRDDs.filterNot { case (id, _) => before(id) }
      .values.toSeq
    (cp, () => fresh.foreach(_.unpersist(blocking = false)))
  }
}
