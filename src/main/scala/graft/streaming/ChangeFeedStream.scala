package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.batch.{ChangeFeed, Upsert}
import graft.core.TxnLog

/** Streaming consumption of a table's change data feed — the analog of
  * Delta's `spark.readStream.option("readChangeFeed", "true")` (ref
  * `SparkManager.scala:36-37` enables Delta; its streaming CDF is how a
  * downstream table incrementally mirrors an upstream MERGE-maintained
  * one).
  *
  * Design: a MICRO-BATCH TAIL of the TxnLog with a checkpointed version
  * cursor, not a file stream over `_graft_changes`. A raw file source
  * would emit change files the moment they land — but files land BEFORE
  * their END commit (crash-safety of the write path), so a file stream
  * could emit rows of a merge that subsequently aborts. Routing every
  * batch through [[ChangeFeed.readChanges]] keeps the commit boundary:
  * only END-certified versions are ever emitted, in version order, each
  * exactly once per cursor advance.
  *
  * Delivery contract: each poll emits the half-open version range
  * `(cursor, tip]` and advances the cursor only AFTER the batch function
  * returns — at-least-once invocation, exactly-once EFFECT when the
  * consumer is idempotent ([[mirrorTo]] is, via the same `txn`-marker +
  * idempotent-MERGE discipline as [[StreamingUpsert]]). A restart resumes
  * from the persisted cursor; a crash between the function and the cursor
  * write replays the range (possibly extended to a newer tip), which an
  * idempotent consumer absorbs.
  *
  * Scale shape: each poll costs one manifest probe (checkpoint + tail,
  * O(tail)); a batch reads O(changed rows) from persisted change files
  * (never a table scan), and the mirror merge is delta-scaled like any
  * upsert. Idle polls are two metadata reads and nothing else. */
object ChangeFeedStream {

  /** The persisted cursor: the newest version whose changes are fully
    * consumed. 0 before the first batch (feed from the table's first
    * retained commit).
    *
    * Stored as VERSIONED files (`cursor-v<N>`, read the max): an advance
    * only ever ADDS a file and sweeps superseded ones after the new file
    * is durable, so there is no instant at which a crash leaves no cursor
    * — a delete-then-rename scheme would, and a restart would then replay
    * from version 0 (full replay at best, a wedged stream once the range
    * has been vacuumed/truncated). A crash mid-sweep leaves extra files;
    * max-wins makes them harmless debris. Legacy single-file `cursor`
    * checkpoints are still read when no versioned file exists. */
  def cursor(spark: SparkSession, checkpointDir: String): Long = {
    val dir = new org.apache.hadoop.fs.Path(checkpointDir)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dir)) return 0L
    val versioned = fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.startsWith("cursor-v"))
      .flatMap(n =>
        scala.util.Try(n.stripPrefix("cursor-v").toLong).toOption)
    if (versioned.nonEmpty) versioned.max
    else {
      val p = new org.apache.hadoop.fs.Path(dir, "cursor")
      if (!fs.exists(p)) 0L
      else {
        val in = fs.open(p)
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8).trim.toLong
        finally in.close()
      }
    }
  }

  private[streaming] def writeCursor(
      spark: SparkSession, checkpointDir: String, v: Long): Unit = {
    val dir = new org.apache.hadoop.fs.Path(checkpointDir)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(dir)
    val tmp = new org.apache.hadoop.fs.Path(dir, s".cursor.tmp.$v")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val p = new org.apache.hadoop.fs.Path(dir, s"cursor-v$v")
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"cursor advance to $v failed at $p")
    // sweep superseded cursors (and any legacy unversioned file) only
    // AFTER the new one is durable — best-effort, max-wins covers a crash
    fs.listStatus(dir).foreach { st =>
      val n = st.getPath.getName
      val superseded = n == "cursor" || (n.startsWith("cursor-v") &&
        scala.util.Try(n.stripPrefix("cursor-v").toLong)
          .toOption.exists(_ < v))
      if (superseded) scala.util.Try(fs.delete(st.getPath, false))
    }
  }

  /** One micro-batch: if committed versions exist past the cursor, hand
    * `(changes, fromVersion, toVersion)` to `f` and advance the cursor.
    * Returns whether a batch fired. `f` sees the same frame
    * [[ChangeFeed.readChanges]] returns (`_change_type`,
    * `_commit_version` columns included). `maxCommitsPerBatch` bounds the
    * version range a single batch covers (Delta's `maxFilesPerTrigger`
    * discipline at the commit granularity) — a consumer bootstrapping
    * against a long history advances in batches it can absorb instead of
    * replaying every retained commit as one; [[drain]] loops through the
    * bounded batches. */
  def pollOnce(
      spark: SparkSession,
      table: String,
      partCol: String,
      checkpointDir: String,
      maxCommitsPerBatch: Int = Int.MaxValue)(
      f: (DataFrame, Long, Long) => Unit): Boolean = {
    require(maxCommitsPerBatch > 0, "maxCommitsPerBatch must be positive")
    val from = cursor(spark, checkpointDir)
    val tip = math.min(TxnLog.currentVersion(spark, table),
      from + maxCommitsPerBatch)
    if (tip <= from) return false
    f(ChangeFeed.readChanges(spark, table, partCol, from, Some(tip)), from, tip)
    writeCursor(spark, checkpointDir, tip)
    true
  }

  /** Drain every committed change up to the current tip — the
    * `Trigger.AvailableNow` analog. Returns the number of batches fired
    * (0 when already caught up). Each loop iteration re-probes the tip, so
    * commits landing mid-drain are included before it returns. */
  def drain(
      spark: SparkSession,
      table: String,
      partCol: String,
      checkpointDir: String,
      maxCommitsPerBatch: Int = Int.MaxValue)(
      f: (DataFrame, Long, Long) => Unit): Int = {
    var batches = 0
    while (pollOnce(spark, table, partCol, checkpointDir, maxCommitsPerBatch)(f))
      batches += 1
    batches
  }

  /** The standard consumer: maintain `mirrorTable` as an exactly-once copy
    * of `table` by applying each batch's NET per-key state as an idempotent
    * MERGE. Within a batch a key may change many times (update at v3,
    * delete at v5): the row with the newest `_commit_version` wins, with
    * insert preferred over delete AT the same version (an update is
    * delete+insert of one commit — the insert is the final state). Keys
    * whose final change is a delete are removed via `deleteWhen`.
    *
    * Exactly-once across restarts: a `txn` marker `"<appId>:<toVersion>"`
    * commits to the MIRROR table after the merge (the
    * [[StreamingUpsert.mergeBatch]] ledger discipline); a replay of the
    * same range skips, a replay of an EXTENDED range (crash before the
    * cursor advanced, new commits since) re-merges — idempotent per key,
    * so the mirror converges to the source's committed state either way. */
  def mirrorTo(
      spark: SparkSession,
      table: String,
      partCol: String,
      keyCols: Seq[String],
      mirrorTable: String,
      checkpointDir: String,
      appId: String = "cdf-mirror",
      maxCommitsPerBatch: Int = Int.MaxValue): Int =
    drain(spark, table, partCol, checkpointDir, maxCommitsPerBatch) { (changes, _, to) =>
      applyMirrorBatch(spark, partCol, keyCols, mirrorTable, appId)(changes, to)
    }

  /** One mirror batch: MERGE the net per-key state of `changes` into
    * `mirrorTable` under the `"<appId>:<toVersion>"` ledger marker.
    * Package-visible so specs can drive a batch and crash around it. */
  private[graft] def applyMirrorBatch(
      spark: SparkSession,
      partCol: String,
      keyCols: Seq[String],
      mirrorTable: String,
      appId: String)(changes: DataFrame, to: Long): Unit = {
    val txnId = s"$appId:$to"
    if (TxnLog.txnApplied(spark, mirrorTable, txnId)) return
    val keys = (partCol +: keyCols).map(col)
    val newestFirst = Window.partitionBy(keys: _*)
      .orderBy(col(ChangeFeed.CommitVersionCol).desc,
        col(ChangeFeed.ChangeTypeCol).desc) // "insert" > "delete"
    val net = changes
      .withColumn("_rn", row_number().over(newestFirst))
      .filter(col("_rn") === 1).drop("_rn")
      .withColumn("_graft_mirror_delete",
        col(ChangeFeed.ChangeTypeCol) === "delete")
      .drop(ChangeFeed.ChangeTypeCol, ChangeFeed.CommitVersionCol)
    if (!net.limit(1).isEmpty)
      Upsert.mergeByKey(spark, mirrorTable, net, partCol, keyCols,
        deleteWhen = Some("_graft_mirror_delete"))
    TxnLog.commitTxn(spark, mirrorTable, txnId)
  }
}
