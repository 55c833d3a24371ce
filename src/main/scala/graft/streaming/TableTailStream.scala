package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.batch.ChangeFeed
import graft.core.TxnLog

/** Streaming tail of a TxnLog table's COMMITTED ROWS — the analog of
  * Delta's plain table streaming source (`spark.readStream.format("delta")
  * .load(table)`; the reference's full-Delta session gets it from
  * `SparkManager.scala:36-37`): downstream consumers that just want the
  * rows each commit appended, without change semantics. The CDF consumer
  * ([[ChangeFeedStream]]) remains the tool for DELTAS (delete legs,
  * net-state mirroring); this one emits APPENDS.
  *
  * Same engine shape as [[ChangeFeedStream]] — a micro-batch tail of the
  * TxnLog with a persisted version cursor, never a file stream over the
  * data dirs (files land before their END commit, so a file stream would
  * emit rows of merges that later abort; compactions and Z-ORDER rewrites
  * would re-emit every row they move). Each poll emits the half-open
  * version range `(cursor, tip]` and advances the cursor only after the
  * batch function returns: at-least-once invocation, exactly-once effect
  * for idempotent consumers, checkpoint-resume across restarts.
  *
  * Rewriting commits carry Delta's documented two-tier caveat verbatim: a
  * commit whose change feed has DELETE legs (an update-merge, a row
  * delete, a DV delete) is not expressible as pure appends —
  *   - default: the poll FAILS LOUDLY, exactly like Delta's "Detected a
  *     data update … This is currently not supported" — the consumer must
  *     opt in or switch to the change feed;
  *   - `ignoreDeletes = true` (Delta's weaker opt-in): commits whose legs
  *     are ALL deletes — retention sweeps, GDPR erasure — are skipped;
  *     the deleted rows simply never reach downstream, no duplicate risk.
  *     A commit that both deletes and inserts (a rewrite) still refuses:
  *     skipping its delete legs would disguise an update as an append;
  *   - `ignoreChanges = true`: upserted rows are emitted as appends and
  *     the delete legs are dropped — downstream may see a key twice
  *     (Delta's `ignoreChanges` contract: duplicates possible, data loss
  *     not). Ours is strictly tighter than Delta's, which re-emits every
  *     row of each rewritten FILE; the persisted feed gives exactly the
  *     upserted rows, so unchanged survivors are never re-emitted.
  * Compactions/Z-ORDER rewrites contribute nothing in either mode (they
  * move rows without changing the row set, and the feed knows it).
  *
  * Scale shape: a poll is one O(tail) manifest probe; a batch reads
  * O(changed rows) from persisted change files — never a table scan — and
  * idle polls are two metadata reads. */
object TableTailStream {

  /** The persisted cursor (shared format with [[ChangeFeedStream]]): the
    * newest version whose rows are fully emitted. */
  def cursor(spark: SparkSession, checkpointDir: String): Long =
    ChangeFeedStream.cursor(spark, checkpointDir)

  /** One micro-batch: if committed versions exist past the cursor, hand
    * `(appendedRows, fromVersion, toVersion)` to `f` and advance the
    * cursor. The frame has exactly the table's (logical) columns — no
    * `_change_type`/`_commit_version` tags. Returns whether a batch
    * fired; throws on a rewriting commit unless `ignoreChanges`.
    *
    * `maxCommitsPerBatch` is the trigger rate limit (Delta's
    * `maxFilesPerTrigger`/`maxBytesPerTrigger` discipline at this engine's
    * unit of change, the commit): a tail bootstrapping against a
    * long-lived table must advance `(cursor, cursor+max]`-sized batches a
    * consumer can absorb, not replay the whole retained history as ONE
    * batch whose shuffle has to fit at once. Catch-up is [[drain]]'s loop,
    * not a bigger batch. */
  def pollOnce(
      spark: SparkSession,
      table: String,
      partCol: String,
      checkpointDir: String,
      ignoreChanges: Boolean = false,
      maxCommitsPerBatch: Int = Int.MaxValue,
      ignoreDeletes: Boolean = false)(
      f: (DataFrame, Long, Long) => Unit): Boolean = {
    val from = cursor(spark, checkpointDir)
    readTail(spark, table, partCol, from, ignoreChanges,
        maxCommitsPerBatch, ignoreDeletes) match {
      case None => false
      case Some((appended, tip)) =>
        f(appended, from, tip)
        ChangeFeedStream.writeCursor(spark, checkpointDir, tip)
        true
    }
  }

  /** The STATELESS core of [[pollOnce]] — cursor in, `(appended rows,
    * next cursor)` out, no checkpoint touched: the appended rows of
    * commits `(from, tip]` with `tip = min(currentVersion, from +
    * maxCommitsPerBatch)`. Serves consumers that hold their own cursor
    * (the HTTP `GET /table/tail` route is the curl twin of a
    * checkpointed drain). Returns None when `from` is already at (or
    * past) the tip; throws [[IllegalStateException]] on a rewriting
    * commit in range unless the opt-in flags cover it — see the class
    * doc's two-tier caveat. */
  def readTail(
      spark: SparkSession,
      table: String,
      partCol: String,
      from: Long,
      ignoreChanges: Boolean = false,
      maxCommitsPerBatch: Int = Int.MaxValue,
      ignoreDeletes: Boolean = false): Option[(DataFrame, Long)] = {
    require(maxCommitsPerBatch > 0, "maxCommitsPerBatch must be positive")
    val tip = math.min(TxnLog.currentVersion(spark, table),
      from + maxCommitsPerBatch)
    if (tip <= from) return None
    val changes = ChangeFeed.readChanges(spark, table, partCol, from, Some(tip))
    if (!ignoreChanges) {
      // Delta's two-tier caveat, per COMMIT: a commit with only delete
      // legs is a retention/GDPR delete (`ignoreDeletes` suffices — the
      // rows just never appear downstream); a commit with BOTH legs
      // rewrote existing rows and needs the stronger `ignoreChanges`
      // duplicate-risk opt-in. One O(commits-in-range)-row aggregation.
      val perCommit = changes
        .groupBy(col(ChangeFeed.CommitVersionCol))
        .agg(
          sum(when(col(ChangeFeed.ChangeTypeCol) === "delete", 1L)
            .otherwise(0L)).as("dels"),
          sum(when(col(ChangeFeed.ChangeTypeCol) === "insert", 1L)
            .otherwise(0L)).as("ins"))
      val offending =
        if (ignoreDeletes) perCommit.filter(col("dels") > 0 && col("ins") > 0)
        else perCommit.filter(col("dels") > 0)
      if (!offending.limit(1).isEmpty)
        throw new IllegalStateException(
          s"table tail: commits (v$from, v$tip] of $table " +
            (if (ignoreDeletes) "rewrite existing rows"
             else "rewrite or delete existing rows") +
            ", which an appended-rows tail cannot express — set " +
            "ignoreChanges=true to emit the upserted rows as appends " +
            "(downstream may then see a key twice, Delta's ignoreChanges " +
            "contract)" +
            (if (ignoreDeletes) ""
             else ", ignoreDeletes=true if the commits only delete rows") +
            ", or consume ChangeFeedStream for real deltas")
    }
    val appended = changes
      .filter(col(ChangeFeed.ChangeTypeCol) === "insert")
      .drop(ChangeFeed.ChangeTypeCol, ChangeFeed.CommitVersionCol)
    Some((appended, tip))
  }

  /** Drain every committed append up to the current tip — the
    * `Trigger.AvailableNow` analog. Returns batches fired (0 when caught
    * up); commits landing mid-drain are included before it returns. */
  def drain(
      spark: SparkSession,
      table: String,
      partCol: String,
      checkpointDir: String,
      ignoreChanges: Boolean = false,
      maxCommitsPerBatch: Int = Int.MaxValue,
      ignoreDeletes: Boolean = false)(
      f: (DataFrame, Long, Long) => Unit): Int = {
    var batches = 0
    while (pollOnce(spark, table, partCol, checkpointDir, ignoreChanges,
        maxCommitsPerBatch, ignoreDeletes)(f))
      batches += 1
    batches
  }
}
