package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Atomic directory publication — the Parquet-era stand-in for the ACID
  * overwrite the reference gets for free from Delta
  * (ref SparkManager.scala:36-37 enables Delta; see SURVEY.md §2.6).
  *
  * A plain `df.write.mode("overwrite").parquet(target)` deletes the old tree
  * and then writes files into it one by one, so a concurrent reader of a
  * batch being re-run can list a half-written directory. [[publish]] instead
  * writes the complete new tree into a hidden temp sibling, then swaps it in
  * with two directory renames. A reader therefore observes the complete old
  * tree, the complete new tree, or — for the instant between the two
  * renames — a missing directory (a clean, retryable `FileNotFoundException`),
  * '''never''' a partial listing.
  *
  * Renames are O(1) metadata ops on HDFS-compatible filesystems regardless of
  * data size, so the swap cost does not grow with the 100 TB snapshot.
  */
object AtomicWrite {

  /** Atomically replace the SMALL FILE at `target` with `content`: write a
    * hidden temp sibling, then rename it over the target with
    * `FileContext.rename(..., Rename.OVERWRITE)` — a single atomic replace
    * on local filesystems and HDFS, so no instant exists where the target
    * is ABSENT (an in-place `create(overwrite=true)` can tear mid-write;
    * `delete` + `rename` leaves a crash/read window with no file at all —
    * a concurrent reader of an index meta would see "no index" and trigger
    * a spurious full rebuild). Filesystems without a FileContext binding
    * fall back to delete+rename, keeping the torn-file guarantee and
    * shrinking the absent window to the rename gap. For whole DIRECTORY
    * trees use [[publish]]. */
  def replaceFile(spark: SparkSession, target: Path, content: Array[Byte]): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = target.getFileSystem(conf)
    val tmp = new Path(Option(target.getParent).getOrElse(
        throw new IllegalArgumentException(s"target has no parent: $target")),
      s".${target.getName}-${java.util.UUID.randomUUID.toString.take(8)}.tmp")
    val out = fs.create(tmp, true)
    try out.write(content) finally out.close()
    val fc =
      try Some(org.apache.hadoop.fs.FileContext.getFileContext(target.toUri, conf))
      catch { case _: org.apache.hadoop.fs.UnsupportedFileSystemException => None }
    fc match {
      case Some(c) =>
        c.rename(tmp, target, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      case None =>
        fs.delete(target, false)
        require(fs.rename(tmp, target), s"file replace failed: $tmp -> $target")
    }
  }

  /** Run `write` against a temp path, then atomically swap the result into
    * place at `target`. `write` must produce a complete directory tree at the
    * path it is given (e.g. `df.write.parquet(tmp)`).
    *
    * `retainOldTo`: instead of deleting the retired tree after a successful
    * install, rename it to this path — the hook that lets callers keep
    * PRIOR GENERATIONS for versioned snapshot reads (Delta time-travel
    * analog, see [[graft.batch.Upsert.readAsOf]]). By default retention is
    * best-effort-after-success: the swap's atomicity guarantees are
    * unchanged, and a failed retention rename surfaces as an error AFTER
    * the new tree is live. With `retainFirst = true` the retention rename
    * IS the retire step (pre-image lands in history BEFORE the install),
    * closing the window where a snapshot reader could observe installed
    * data whose pre-image is not yet retained.
    *
    * Failure behavior: if the install rename fails AFTER the live tree was
    * retired, the old tree is renamed back into place before the error
    * propagates — a failed publish never leaves the target missing. The one
    * unrecoverable-in-process window is a hard crash between the two
    * renames; [[recoverSwap]] repairs exactly that from the `.old-` sibling
    * on the next maintenance entry. */
  def publish(
      spark: SparkSession, target: String,
      retainOldTo: Option[String] = None,
      retainFirst: Boolean = false)(write: String => Unit): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val live = new Path(target)
    val fs = live.getFileSystem(conf)
    val parent = Option(live.getParent).getOrElse(
      throw new IllegalArgumentException(s"target has no parent: $target"))
    fs.mkdirs(parent)
    def side(prefix: String) =
      new Path(parent, s".$prefix-${live.getName}-${java.util.UUID.randomUUID.toString.take(8)}")
    def gcStrandedSiblings(tmp: Path, old: Path): Unit =
      fs.listStatus(parent).map(_.getPath)
        .filter { p =>
          val n = p.getName
          n != tmp.getName && n != old.getName &&
            (n.startsWith(s".old-${live.getName}-") || n.startsWith(s".tmp-${live.getName}-"))
        }
        .foreach(fs.delete(_, true))
    if (retainFirst && retainOldTo.isDefined) {
      // RETAIN-BEFORE-INSTALL mode (snapshot writers — see Upsert): the
      // pre-image moves to its retention home in the SAME rename that
      // retires it, so there is no instant where the new tree is live but
      // the pre-image is not yet findable in history. A snapshot read
      // racing the publish therefore resolves either (pre-retire) the live
      // pre-image, or (post-retire) the retained generation — never the
      // in-flight writer's data. A crash between the two renames leaves
      // the pre-image IN HISTORY (not at an `.old-` sibling), which the
      // claim-holding writer repairs on its next merge of the partition
      // (Upsert.restoreCrashedInstall); recoverSwap does not apply here.
      val tmp = side("tmp")
      try {
        write(tmp.toString)
        val keep = new Path(retainOldTo.get)
        val retired = fs.exists(live)
        if (retired) {
          Option(keep.getParent).foreach(fs.mkdirs)
          if (!fs.rename(live, keep))
            throw new java.io.IOException(
              s"atomic publish: failed to retain $live at $keep")
          // rename does NOT update the moved tree's own mtime — retention
          // vacuums age generations by mtime, which must mean "age since
          // REPLACEMENT", not "age since the data was first written"
          scala.util.Try(fs.setTimes(keep, System.currentTimeMillis(), -1))
        }
        if (!fs.rename(tmp, live)) {
          // roll the retention back so readers still have a live tree
          if (retired && !fs.exists(live) && !fs.rename(new Path(retainOldTo.get), live))
            throw new java.io.IOException(
              s"atomic publish: install failed AND rollback failed — " +
                s"live tree is at ${retainOldTo.get}")
          throw new java.io.IOException(s"atomic publish: failed to install $tmp -> $live")
        }
        gcStrandedSiblings(tmp, tmp)
      } finally fs.delete(tmp, true)
      return
    }
    val tmp = side("tmp")
    try {
      write(tmp.toString)
      val old = side("old")
      val retired = fs.exists(live)
      // where the pre-image tree ended up (the re-retire race below can
      // move it): retention must follow it
      var retiredTree = old
      if (retired && !fs.rename(live, old))
        throw new java.io.IOException(s"atomic publish: failed to retire $live")
      if (!fs.rename(tmp, live)) {
        // A concurrent reader-repair ([[recoverSwap]]) can resurrect the
        // retired tree in the instant between our two renames — install
        // then fails because live EXISTS. Re-retire the resurrected tree
        // and try again (bounded: each retry needs another reader to hit
        // an ever-narrower window, and readers gate their repair on the
        // TxnLog in-flight probe, so one spin is the realistic maximum).
        var installed = false
        var spins = 0
        while (!installed && fs.exists(live) && spins < 8) {
          val re = side("old")
          if (fs.rename(live, re)) {
            installed = fs.rename(tmp, live)
            if (installed) retiredTree = re // the resurrected pre-image moved here
            else if (!fs.exists(live) && !fs.rename(re, live))
              throw new java.io.IOException(
                s"atomic publish: install retry failed AND restore failed — live tree is at $re")
          }
          spins += 1
        }
        if (!installed) {
          // roll the retire back so readers still have a complete live tree
          if (!fs.exists(live) && retired && !fs.rename(old, live))
            throw new java.io.IOException(
              s"atomic publish: install failed AND rollback failed — live tree is at $old")
          throw new java.io.IOException(s"atomic publish: failed to install $tmp -> $live")
        }
      }
      retainOldTo match {
        case Some(keep) if fs.exists(retiredTree) =>
          val keepPath = new Path(keep)
          Option(keepPath.getParent).foreach(fs.mkdirs)
          if (!fs.rename(retiredTree, keepPath))
            throw new java.io.IOException(
              s"atomic publish: installed $live but failed to retain the prior " +
                s"generation at $keep (it is still at $retiredTree)")
          // rename does NOT update the moved tree's own mtime — retention
          // vacuums age generations by mtime, which must mean "age since
          // REPLACEMENT", not "age since the data was first written"
          scala.util.Try(
            fs.setTimes(keepPath, System.currentTimeMillis(), -1))
        case _ => fs.delete(retiredTree, true)
      }
      if (retiredTree != old) fs.delete(old, true) // consumed by the race; clear debris
      // GC siblings stranded by PRIOR crashed publishes (this one succeeded,
      // so live is complete and no crash-window repair can be pending).
      // Left in place they accumulate, and a stale .old- would be a
      // candidate for a FUTURE recoverSwap to resurrect. Publishers are
      // single-flight per target (registry/maintenance contracts), so no
      // concurrent publish owns these names.
      gcStrandedSiblings(tmp, old)
    } finally {
      fs.delete(tmp, true) // no-op on success (renamed away); cleanup on failure
    }
  }

  /** Repair a [[publish]] interrupted between its two renames (hard crash):
    * if `target` is missing but a `.old-<name>-*` sibling exists, rename the
    * newest one back into place; stale `.tmp-<name>-*` siblings are removed.
    * Call from maintenance entry points before relying on `target` — e.g.
    * the streaming sink's commit log, where a missing directory would
    * otherwise be silently recreated empty by a restarted query (total loss
    * of the prior file index). Returns true if a restore happened.
    *
    * `gcTmp = false` is the READ-PATH mode: a reader only needs the live
    * tree restored, and it must not delete `.tmp-` siblings — those may
    * belong to an in-flight publish by a live maintenance job (deleting its
    * temp dir mid-write fails that job). Repair entry points that own the
    * target exclusively (start()/maintenance) keep the default GC.
    *
    * Concurrent repairers are tolerated in both modes: losing the restore
    * rename to another repairer is success, not failure — after a failed
    * rename the live tree is re-checked and, if present, the repair is
    * reported done. */
  def recoverSwap(spark: SparkSession, target: String, gcTmp: Boolean = true): Boolean = {
    val conf = spark.sessionState.newHadoopConf()
    val live = new Path(target)
    val fs = live.getFileSystem(conf)
    val parent = Option(live.getParent).getOrElse(return false)
    if (!fs.exists(parent)) return false
    val name = live.getName
    val siblings = fs.listStatus(parent)
    if (gcTmp)
      siblings.map(_.getPath)
        .filter(_.getName.startsWith(s".tmp-$name-")).foreach(fs.delete(_, true))
    if (fs.exists(live)) false
    else {
      // newest by MODIFICATION TIME — the .old- suffix is a random UUID, so
      // name order is meaningless; with stale crash debris present, a
      // lexicographic pick could resurrect an ancient tree (for a sink
      // commit log that is a ledger rollback → batch replays)
      val olds = siblings.filter(_.getPath.getName.startsWith(s".old-$name-"))
      olds.sortBy(_.getModificationTime).lastOption match {
        case Some(old) =>
          if (!fs.rename(old.getPath, live)) {
            // the rename raced another repairer; if either restored the live
            // tree, the repair this caller needed has happened
            if (!fs.exists(live))
              throw new java.io.IOException(
                s"recoverSwap: failed to restore ${old.getPath} -> $live")
          } else if (gcTmp) {
            // only the winning OWNER-mode repairer clears leftover debris
            olds.map(_.getPath).filter(_ != old.getPath)
              .filter(p => fs.exists(p)).foreach(fs.delete(_, true))
          }
          true
        case None => false
      }
    }
  }
}
