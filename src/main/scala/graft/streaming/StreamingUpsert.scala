package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.batch.Upsert
import graft.core.TxnLog

/** Exactly-once streaming upsert sink: a `foreachBatch` body that MERGEs
  * each micro-batch into a partitioned Parquet table and skips a batch the
  * table has already absorbed.
  *
  * The Delta analog (ref `StreamingJob.scala:60-67` rides on it): Delta
  * records a `(txnAppId, txnVersion)` pair in the transaction it commits
  * for a `foreachBatch` write, so a restart that replays the last
  * micro-batch (Structured Streaming's `foreachBatch` is at-least-once —
  * the checkpoint acknowledges a batch only AFTER the function returns)
  * finds the version already committed and becomes a no-op. Here the same
  * ledger entry is a [[TxnLog]] `txn` marker commit: `"<appId>:<batchId>"`.
  *
  * Ordering = correctness: the marker commits AFTER the merge completes.
  *  - crash before the merge finishes → no marker → the replay re-merges;
  *    MERGE is idempotent per key (matched rows replace, not append), so
  *    the partially-applied partitions converge to the same state —
  *    at-least-once execution, exactly-once EFFECT;
  *  - crash between the merge and the marker → same as above, one full
  *    re-merge;
  *  - marker present → the whole batch is skipped: no new TxnLog versions,
  *    no new history generations, no file churn on replay.
  *
  * Structured Streaming serializes micro-batches (batch N+1 never starts
  * before N's function returns, and a restart replays only the LAST
  * unacknowledged batch), so the marker consulted is always within the
  * manifest's retention window — the [[TxnLog.truncate]] caveat on
  * [[TxnLog.txnApplied]] cannot bite a live stream.
  *
  * At 100 TB the shape is unchanged: one marker probe (checkpoint + tail
  * manifest read, O(tail)) per micro-batch, then the delta-scaled partition
  * merge — cost bounded by the partitions the batch touches, never by
  * table size.
  */
object StreamingUpsert {

  /** The `foreachBatch` body. Use as
    * {{{
    * df.writeStream.foreachBatch(
    *   StreamingUpsert.mergeBatch(spark, table, "event_date", Seq("id"), appId) _)
    * }}}
    * `appId` must be stable across restarts (it namespaces batch ids in the
    * table's ledger — two different streams merging into one table must use
    * different ids, a stream resuming from its checkpoint the same one). */
  def mergeBatch(
      spark: SparkSession,
      table: String,
      partCol: String,
      keyCols: Seq[String],
      appId: String)(batch: DataFrame, batchId: Long): Unit = {
    val txnId = s"$appId:$batchId"
    if (TxnLog.txnApplied(spark, table, txnId)) return // restart replay: absorbed
    Upsert.mergeByKey(spark, table, batch, partCol, keyCols)
    TxnLog.commitTxn(spark, table, txnId)
  }
}
