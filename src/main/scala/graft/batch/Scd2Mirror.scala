package graft.batch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.TxnLog

/** SCD2 dimension mirror maintained from a managed table's CHANGE DATA
  * FEED — the canonical lakehouse CDC pattern (Delta's own CDF headline
  * demo): the source table holds only current rows; the mirror holds one
  * row PER VERSION of each key, with `[_scd2_valid_from_v,
  * _scd2_valid_to_v)` commit-version validity intervals (`valid_to` NULL
  * while current). Commit versions — not wall clocks — are the time axis:
  * they are exact, totally ordered per table, and already what
  * [[Upsert.readAsOf]] speaks, so "the dimension as of v" and "the table
  * as of v" agree by construction.
  *
  * [[sync]] consumes only the commits since its cursor (O(changes), never
  * a source rescan — the same economics as the index refreshes):
  *
  *   - every INSERT leg opens a version at its commit;
  *   - every DELETE leg closes the key's newest open version at its
  *     commit (an update-merge emits delete+insert at one commit, so the
  *     old version closes exactly where the new one opens; a pure delete
  *     closes with nothing following);
  *   - the mirror's own current rows for changed keys close at the key's
  *     first in-range delete commit.
  *
  * The mirror is itself a managed table (written through [[Upsert
  * .mergeByKey]] keyed by key + `valid_from`), so it inherits OCC, time
  * travel, CDF, and serving. Invariant (spec'd): the mirror's current
  * slice (`valid_to IS NULL`) row-equals the source's committed snapshot
  * at every sync point, and an incremental mirror equals a from-scratch
  * rebuild. */
object Scd2Mirror {

  val ValidFrom = "_scd2_valid_from_v"
  val ValidTo = "_scd2_valid_to_v"

  private def cursorFile(dim: String) =
    new org.apache.hadoop.fs.Path(s"$dim/_graft_meta/scd2_cursor.json")

  private def readCursor(
      spark: SparkSession, dim: String, src: String): Option[Long] = {
    val p = cursorFile(dim)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val txt =
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    val o = graft.http.Json.parse(txt).asObj
    val recordedSrc = o.get("src") match {
      case Some(graft.http.JStr(s)) => s
      case other => throw new IllegalStateException(s"scd2 cursor src: $other")
    }
    require(recordedSrc == src,
      s"scd2 mirror at $dim tracks $recordedSrc, not $src — one mirror " +
        "follows one source; use a fresh dim directory")
    o.get("version") match {
      case Some(graft.http.JNum(n)) => Some(n.toLong)
      case other => throw new IllegalStateException(s"scd2 cursor version: $other")
    }
  }

  private def writeCursor(
      spark: SparkSession, dim: String, src: String, v: Long): Unit =
    graft.core.AtomicWrite.replaceFile(spark, cursorFile(dim),
      s"""{"src":${graft.http.Json.quote(src)},"version":$v}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** What a sync did: key-versions opened/closed, and the cursor move. */
  final case class SyncStats(
      opened: Long, closed: Long, fromVersion: Long, toVersion: Long)

  /** Catch the mirror at `dim` up to `src`'s tip. First call bootstraps
    * from version 0 (the change feed replays the first retained commit's
    * rows as inserts, so a fresh mirror IS the from-scratch build); later
    * calls consume only the new commits. Returns what moved. */
  def sync(
      spark: SparkSession,
      src: String,
      dim: String,
      partCol: String,
      keyCols: Seq[String]): SyncStats = {
    require(keyCols.nonEmpty, "scd2 mirror needs the source's key columns")
    val tip = TxnLog.currentVersion(spark, src)
    val from = readCursor(spark, dim, src).getOrElse(0L)
    if (tip <= from) return SyncStats(0L, 0L, from, tip)
    import graft.batch.{ChangeFeed => CF}
    val changes = CF.readChanges(spark, src, partCol, from, Some(tip)).cache()
    try {
      val srcCols = changes.columns
        .filterNot(c => c == CF.ChangeTypeCol || c == CF.CommitVersionCol)
      // delete legs are the close boundaries, keyed per source key
      val dels = changes.filter(col(CF.ChangeTypeCol) === "delete")
        .select(keyCols.map(col) :+ col(CF.CommitVersionCol).as("_del_v"): _*)
      // a version open at `from_v` closes at the key's FIRST delete commit
      // strictly after it (the delete emitted at the same commit belongs
      // to the PREVIOUS version)
      def closeOf(open: DataFrame): DataFrame = {
        open.join(dels, keyCols, "left")
          .withColumn("_close_v",
            when(col("_del_v") > col(ValidFrom), col("_del_v")))
          .groupBy((keyCols :+ ValidFrom).map(col): _*)
          .agg(min(col("_close_v")).as(ValidTo))
      }
      // in-range opens: one candidate version per insert leg
      val opens = changes.filter(col(CF.ChangeTypeCol) === "insert")
        .select(srcCols.map(col) :+ col(CF.CommitVersionCol).as(ValidFrom): _*)
      val openRows = opens
        .join(closeOf(opens.select((keyCols :+ ValidFrom).map(col): _*)),
          keyCols :+ ValidFrom)
      // the mirror's pre-range current rows for changed keys close at the
      // key's first in-range delete (keys the range only inserted have no
      // current row to close; left-join keeps a never-deleted key open)
      val changedKeys = changes.select(keyCols.map(col): _*).distinct()
      val dimExists = {
        val p = new org.apache.hadoop.fs.Path(dim)
        p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
      }
      val closedRows =
        if (!dimExists) None
        else {
          val cur = Upsert.readCommitted(spark, dim, partCol)
            .filter(col(ValidTo).isNull)
            .join(changedKeys, keyCols, "left_semi")
          val closed = cur.drop(ValidTo)
            .join(closeOf(cur.select((keyCols :+ ValidFrom).map(col): _*)),
              keyCols :+ ValidFrom)
            .filter(col(ValidTo).isNotNull)
          Some(closed)
        }
      // eager, lineage-truncating pin BEFORE merging: the delta's
      // closed-rows branch reads the dim table the merge is about to
      // rewrite. cache()+count() is only best-effort — an evicted block
      // would recompute against the half-rewritten mirror; the
      // localCheckpoint severs the lineage so that cannot happen.
      val (delta, freeDelta) = graft.core.Pin(closedRows.fold(openRows)(c =>
        openRows.unionByName(c.select(openRows.columns.map(col): _*))))
      try {
        val total = delta.count()
        // in-range opens carry a ValidFrom inside the consumed range; the
        // pre-range current rows being closed carry an older one
        val nOpened = delta.filter(col(ValidFrom) > from).count()
        val nClosedPrior = total - nOpened
        val nClosedInRange = delta
          .filter(col(ValidFrom) > from && col(ValidTo).isNotNull).count()
        if (total > 0)
          Upsert.mergeByKey(spark, dim, delta, partCol, keyCols :+ ValidFrom)
        writeCursor(spark, dim, src, tip)
        SyncStats(nOpened, nClosedInRange + nClosedPrior, from, tip)
      } finally freeDelta()
    } finally changes.unpersist()
  }
}
