package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.batch.IncrementalView

/** Streaming maintenance of an incremental materialized view — the
  * missing half of the Kappa story: the reference's live-agg table (ref
  * `StreamingJob.scala:57-67`) keeps a real-time aggregate with a
  * streaming query; here the SAME view definition that Maintain refreshes
  * on batch cadence follows its source continuously, one bounded
  * micro-batch of source commits at a time.
  *
  * Exactly-once: [[IncrementalView.syncStep]] is the batch body, and its
  * basis-pinned in-flight cursor IS the txn-marker ledger of
  * [[StreamingUpsert.mergeBatch]] specialized to views — the cursor
  * advances only after the merge commits, a crash between them leaves the
  * `(applyingTo, basis)` record, and the replay re-derives the identical
  * absolute batch against the pinned basis. Nothing here needs a second
  * checkpoint: a stream restart resumes from the view's own cursor, so
  * the stream checkpoint and the view state cannot disagree (the classic
  * two-cursor drift bug is structurally impossible).
  *
  * Bounded commits: `maxCommitsPerBatch` caps each step (Delta's
  * `maxFilesPerTrigger` at commit granularity) — a view restarted after a
  * week of source churn catches up in absorbable steps, each one a
  * committed, crash-safe view version, instead of one giant merge.
  *
  * Scale shape per micro-batch: one manifest probe (O(tail)), one
  * O(changes-in-range) feed read folded to O(touched groups), one keyed
  * merge over the touched view partitions. An idle tick is two metadata
  * reads. */
object StreamingView {

  /** Catch the view up to the source tip in bounded steps — the
    * `Trigger.AvailableNow` analog. Returns the number of steps that
    * advanced the cursor (0 when already at tip). */
  def drainAvailable(
      spark: SparkSession,
      view: String,
      maxCommitsPerBatch: Long = Long.MaxValue): Int = {
    var steps = 0
    var advanced = true
    while (advanced) {
      val st = IncrementalView.syncStep(spark, view, maxCommitsPerBatch)
      advanced = st.toVersion > st.fromVersion
      if (advanced) steps += 1
    }
    steps
  }

  /** Follow the source continuously: a heartbeat stream (rate source —
    * the view's feed is a TxnLog tail, not a file listing, so there is
    * nothing for a file source to watch) triggers one bounded drain per
    * tick. The heartbeat rows are ignored; all state lives in the view's
    * own cursor, so the stream's checkpoint directory is not even needed
    * for correctness — kill the query, call [[drainAvailable]] by hand,
    * restart it: every path converges to the same view. */
  def start(
      spark: SparkSession,
      view: String,
      intervalMs: Long = 1000L,
      maxCommitsPerBatch: Long = Long.MaxValue): StreamingQuery =
    spark.readStream.format("rate")
      .option("rowsPerSecond", 1).load()
      .writeStream
      .trigger(Trigger.ProcessingTime(intervalMs))
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) =>
        // tick-level resilience (same as [[StreamingPack.start]]): a
        // sync step can fail LOUDLY on a transient live-read race; the
        // basis-pinned cursor makes the failed step replay exactly-once,
        // so the tick logs and the next one retries — one transient must
        // not kill the maintenance query permanently. A persistent
        // failure keeps surfacing in the log every tick.
        try { drainAvailable(spark, view, maxCommitsPerBatch); () }
        catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(
              s"[graft-view-maintenance] tick failed, retrying next tick: " +
                s"${e.getClass.getSimpleName}: ${e.getMessage}")
        }
        ()
      }
      .queryName(s"graft-view-maintenance")
      .start()
}
