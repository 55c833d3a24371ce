package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.PackWriter

/** Streaming maintenance of the packed-shard table — the pack sink
  * following an append-only documents table continuously, one bounded
  * range of source commits per micro-batch. The batch body is
  * [[PackWriter.sync]], whose applyingTo-marked cursor IS the ledger
  * (the [[StreamingView]] discipline): the cursor advances only after
  * the shard merge commits, a crash between them leaves the marker, and
  * the replay filters already-packed docs by doc_id — exactly-once with
  * NO second checkpoint, so the stream's state and the shard table's
  * state cannot disagree.
  *
  * Scale shape per micro-batch: one manifest probe, one
  * O(appended-docs) feed read, one merge touching the grown sources'
  * tail rows plus the fresh rows. An idle tick is two metadata reads. */
object StreamingPack {

  /** Catch the shard table up to the source tip in bounded steps — the
    * `Trigger.AvailableNow` analog. Returns the number of steps that
    * advanced the cursor (0 when already at tip; the bootstrap counts
    * as a step). `maxSteps` bounds ONE drain call: against a source that
    * commits continuously, an unbounded chase never reaches the moving
    * tip — inside a streaming tick that starves the trigger and blocks
    * query stop. A partial drain is safe by construction (the cursor is
    * the ledger); the next call continues. */
  def drainAvailable(
      spark: SparkSession,
      srcTable: String,
      partCol: String,
      shardTable: String,
      maxCommitsPerBatch: Long = Long.MaxValue,
      maxSteps: Int = Int.MaxValue): Int = {
    var steps = 0
    var advanced = true
    while (advanced && steps < maxSteps) {
      val st = PackWriter.sync(
        spark, srcTable, partCol, shardTable, maxCommitsPerBatch)
      advanced = st.toVersion > st.fromVersion
      if (advanced) steps += 1
    }
    steps
  }

  /** Follow the source continuously: a heartbeat stream (rate source —
    * the feed is a TxnLog tail, nothing for a file source to watch)
    * triggers one bounded drain per tick. All state lives in the shard
    * table's own cursor: kill the query, call [[drainAvailable]] by
    * hand, restart it — every path converges to the same shards. */
  def start(
      spark: SparkSession,
      srcTable: String,
      partCol: String,
      shardTable: String,
      intervalMs: Long = 1000L,
      maxCommitsPerBatch: Long = Long.MaxValue,
      maxStepsPerTick: Int = 64): StreamingQuery =
    spark.readStream.format("rate")
      .option("rowsPerSecond", 1).load()
      .writeStream
      .trigger(Trigger.ProcessingTime(intervalMs))
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) =>
        // tick-level resilience: a sync can fail LOUDLY on a transient
        // race (the documented live-read contract — e.g. the feed's
        // schema inference pinning a tagged change file that the next
        // merge retires mid-read). The cursor discipline makes a failed
        // tick harmless — the applyingTo marker replays exactly-once —
        // so the tick logs and the next one retries, instead of one
        // transient killing the maintenance query permanently. A
        // persistent failure keeps surfacing in the log every tick.
        // bounded steps per tick: a continuously-committing source must
        // not starve the trigger (or block stop) — the cursor makes a
        // partial drain safe, the next tick continues the chase
        try { drainAvailable(spark, srcTable, partCol, shardTable,
          maxCommitsPerBatch, maxStepsPerTick); () }
        catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(
              s"[graft-pack-maintenance] tick failed, retrying next tick: " +
                s"${e.getClass.getSimpleName}: ${e.getMessage}")
        }
        ()
      }
      .queryName("graft-pack-maintenance")
      .start()
}
