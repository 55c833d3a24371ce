package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Small-file [[compact]]ion and orphan-file [[vacuum]] for the streaming
  * Parquet file sink — the scheduled maintenance ops the reference specs as
  * OPTIMIZE/VACUUM over its Delta sink
  * (ref AGENTS.md:1162-1171; unimplemented there). A long-running ingest
  * appends one file per micro-batch per partition; this job rewrites each
  * partition's visible files into size-targeted larger ones and rewrites the
  * sink's `_spark_metadata` commit log to match, so readers that resolve the
  * table through the log (`spark.read.parquet(table)` — exactly the batch
  * side's path) keep exactly-once visibility across the rewrite.
  *
  * Log surgery, not log bypass: the file sink's commit log (versioned files
  * `0,1,…,N[.compact]`, header `v1`, one JSON file-status line per visible
  * file) is both the readers' file index AND the sink's exactly-once ledger
  * (on restart the sink skips any batch id ≤ the log's latest). The rewrite
  * therefore preserves the latest batch id N exactly: the full compacted
  * file list lands in the one log version the reader scan starts from (the
  * arithmetic compact boundary for N, or version 0 when N predates the first
  * boundary), every other version in scan range becomes a header-only stub,
  * and the new log directory is swapped in atomically. A restarted ingest
  * resumes at batch N+1 — no skipped data, no replays, old small files are
  * deleted only after the swap.
  *
  * CONTRACT: run while the ingest WRITER on this table is stopped (it is a
  * maintenance op, exactly like the reference's scheduled OPTIMIZE).
  * READERS need no coordination: the log swap is bracketed by
  * [[graft.core.TxnLog]] begin/end marks and [[StreamingIngest.readTable]]
  * probes them around its file-listing resolution, retrying if a swap
  * overlapped — so a concurrent reader always resolves a complete
  * pre-swap or post-swap file set, never the duplicate view a raw
  * `spark.read.parquet` could get by silently falling back to directory
  * listing at the dir-missing instant between the swap's two renames.
  * Replaced small files outlive the swap as unreferenced orphans until
  * [[vacuum]]'s retention horizon passes (the reader grace period), so a
  * reader that resolved the pre-swap log can finish its scan. External
  * raw readers must retry on a missing `_spark_metadata`.
  *
  * At 100 TB: each partition rewrite is a distributed read+write bounded by
  * `targetBytes`; partitions are processed independently so a scheduler can
  * shard them; the log rewrite is O(files) driver metadata, not data.
  */
object SinkCompaction {

  final case class Report(
      partitionsCompacted: Int,
      filesBefore: Int,
      filesAfter: Int,
      bytesRewritten: Long)

  private final case class Entry(path: String, size: Long, line: String)

  /** Compact every partition of `tablePath` whose visible file count exceeds
    * `minFilesToCompact`, targeting `targetBytes` per output file.
    *
    * `compactInterval` must equal the writer's
    * `spark.sql.streaming.fileSink.log.compactInterval` (Spark default 10) —
    * the log's compact-boundary arithmetic depends on it.
    *
    * `layoutCols` folds DATA LAYOUT into the rewrite (Delta's
    * optimized-write analog: the compaction is already reading and
    * rewriting every crowded partition's rows, so clustering them costs
    * one extra shuffle instead of a whole separate OPTIMIZE pass over the
    * same bytes): `layoutMode = "cluster"` range-partitions + sorts on the
    * columns ([[graft.core.LayoutOps.clusterBy]] — single/prefix-key
    * locality), `"zorder"` bit-interleaves 2-4 numeric keys
    * ([[graft.core.LayoutOps.zOrderBy]]). Either way each output file's
    * footer [min,max] covers a narrow key slice, so pushed predicates on
    * the layout keys prune most files of the compacted sink — rows are
    * identical, only their placement changes. Empty `layoutCols` keeps the
    * plain shuffle-free `coalesce`. */
  def compact(
      spark: SparkSession,
      tablePath: String,
      targetBytes: Long = 128L * 1024 * 1024,
      minFilesToCompact: Int = 2,
      compactInterval: Int = 10,
      layoutCols: Seq[String] = Seq.empty,
      layoutMode: String = "cluster"): Report = {
    require(Set("cluster", "zorder").contains(layoutMode),
      s"layoutMode must be 'cluster' or 'zorder', got '$layoutMode'")
    val conf = spark.sessionState.newHadoopConf()
    val logDir = new Path(tablePath, "_spark_metadata")
    val fs = logDir.getFileSystem(conf)
    // repair a previous maintenance run crashed mid-log-swap BEFORE touching
    // anything — otherwise a restarted ingest would recreate an empty log
    graft.core.AtomicWrite.recoverSwap(spark, logDir.toString)

    // ---- 1. read the log: latest batch id + currently visible files
    val (latestId, boundary, entries) = readLog(fs, logDir, compactInterval)

    // ---- 2. group by partition directory; rewrite the crowded ones
    val byDir = entries.groupBy(e => new Path(new java.net.URI(e.path)).getParent)
    var rewritten = Vector.empty[Entry]
    var kept = Vector.empty[Entry]
    var partitions = 0
    var bytes = 0L
    byDir.foreach { case (dir, es) =>
      if (es.size < minFilesToCompact) kept ++= es
      else {
        partitions += 1
        bytes += es.map(_.size).sum
        val nOut = math.max(1, math.ceil(es.map(_.size).sum.toDouble / targetBytes).toInt)
        // read ONLY this partition's visible files (content schema excludes
        // the partition column — preserved as-is on rewrite). mergeSchema:
        // a partition can mix files written before/after a widening schema
        // evolution; resolving from one footer would silently DROP the added
        // columns from the rewrite (and step 4 then deletes the originals).
        val df = spark.read.option("mergeSchema", "true").parquet(es.map(_.path): _*)
        layoutCols.foreach(c => require(df.columns.contains(c),
          s"layout column $c not in sink schema ${df.columns.mkString(",")}"))
        val shaped =
          if (layoutCols.isEmpty) df.coalesce(nOut) // shuffle-free
          else if (layoutMode == "zorder")
            graft.core.LayoutOps.zOrderBy(df, layoutCols, nOut)
          else graft.core.LayoutOps.clusterBy(df, layoutCols, nOut)
        val tmpOut = new Path(dir, s".compact-${java.util.UUID.randomUUID.toString.take(8)}")
        shaped.write.parquet(tmpOut.toString)
        val parts = fs.listStatus(tmpOut)
          .filter(s => s.getPath.getName.startsWith("part-"))
        rewritten ++= parts.zipWithIndex.map { case (s, i) =>
          val dest = new Path(dir,
            f"part-$i%05d-${java.util.UUID.randomUUID}-compacted.snappy.parquet")
          if (!fs.rename(s.getPath, dest))
            throw new java.io.IOException(s"compaction: failed to place $dest")
          val st = fs.getFileStatus(dest)
          Entry(dest.toUri.toString, st.getLen, statusJson(dest, st.getLen, st.getModificationTime))
        }
        fs.delete(tmpOut, true)
      }
    }

    // nothing crowded → leave the log untouched (no reason to take even the
    // tiny swap window for a no-op)
    if (partitions == 0) return Report(0, entries.size, entries.size, 0L)

    // ---- 3. build the replacement log off to the side, then swap — the
    // same retire→install→rollback choreography as every other publish.
    // The swap is bracketed by TxnLog begin/end marks: [[StreamingIngest
    // .readTable]] probes them around its file-listing resolution, so a
    // reader racing the log-dir-missing instant between the swap's two
    // renames detects the overlap and re-resolves instead of silently
    // falling back to a directory listing (which would see old small files
    // PLUS their compacted rewrites — a duplicate view).
    // whole-table claim via the dedicated flag — never a magic partition
    // value, which would collide with a real partition named "*"
    val claim = graft.core.TxnLog.begin(spark, tablePath, "compact",
      Set.empty, graft.core.TxnLog.currentVersion(spark, tablePath), all = true)
    // a failed swap must release the claim (abort), or the next compaction
    // is refused for the staleness horizon and readers wait it out
    try {
      graft.core.AtomicWrite.publish(spark, logDir.toString) { tmpPath =>
        val newLog = new Path(tmpPath)
        fs.mkdirs(newLog)
        val carrier = if (boundary >= 0) boundary else 0L
        val carrierName = if (boundary >= 0) s"$carrier.compact" else "0"
        write(fs, new Path(newLog, carrierName),
          ("v1" +: (kept ++ rewritten).map(_.line)).mkString("\n"))
        ((carrier + 1) to latestId).foreach { v =>
          write(fs, new Path(newLog, v.toString), "v1") // header-only stub keeps batch-id ledger intact
        }
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        scala.util.Try(graft.core.TxnLog.abort(spark, tablePath, claim))
        throw e
    }
    graft.core.TxnLog.end(spark, tablePath, claim)

    // ---- 4. the replaced small files are now unreferenced ORPHANS — they
    // are deliberately NOT deleted here: a reader that resolved the
    // pre-swap log may still be scanning them. [[vacuum]]'s `minAgeMs`
    // retention horizon (the reader grace period, Delta's retention-period
    // analog) removes them on the next maintenance pass. Their mtimes are
    // TOUCHED to the replacement instant — vacuum ages files by mtime, and
    // without the touch a file written hours ago would exit its "grace
    // period" the moment it became an orphan.
    val touchNow = System.currentTimeMillis()
    (entries.toSet -- kept.toSet).foreach { e =>
      scala.util.Try(fs.setTimes(new Path(new java.net.URI(e.path)), touchNow, -1))
    }
    Report(partitions, entries.size, kept.size + rewritten.size, bytes)
  }

  /** (latest batch id, arithmetic compact boundary for it, visible files) —
    * exactly the resolution a reader's `MetadataLogFileIndex` performs. */
  private def readLog(
      fs: FileSystem, logDir: Path, compactInterval: Int): (Long, Long, Seq[Entry]) = {
    require(fs.isDirectory(logDir),
      s"${logDir.getParent} has no _spark_metadata commit log — not a streaming file-sink table")
    val versions = fs.listStatus(logDir).map(_.getPath.getName)
      .filter(_.matches("\\d+(\\.compact)?"))
      .map(n => (n.stripSuffix(".compact").toLong, n.endsWith(".compact")))
    require(versions.nonEmpty, s"empty commit log at $logDir")
    val latestId = versions.map(_._1).max
    // reader scan range: latest arithmetic compact boundary ≤ latestId, else 0
    val boundary = ((latestId + 1) / compactInterval) * compactInterval - 1
    val scanFrom = if (boundary >= 0 && versions.exists(v => v._1 == boundary && v._2)) boundary else 0L
    // a .compact at a non-boundary position means the writer used a
    // different compactInterval — proceeding would silently treat those
    // batches' files as invisible (and vacuum would DELETE them). Fail loud.
    versions.filter(v => v._2 && v._1 > scanFrom).foreach { v =>
      throw new IllegalStateException(
        s"commit log has ${v._1}.compact beyond the interval-$compactInterval boundary " +
          s"$scanFrom — compactInterval does not match the writer's " +
          "spark.sql.streaming.fileSink.log.compactInterval; aborting")
    }
    val entries = (scanFrom to latestId).flatMap { v =>
      val isCompact = v == scanFrom && versions.exists(x => x._1 == v && x._2)
      val p = new Path(logDir, if (isCompact) s"$v.compact" else v.toString)
      if (!fs.exists(p)) {
        throw new IllegalStateException(
          s"commit log is missing version ${p.getName} in scan range [$scanFrom, $latestId] — " +
            "refusing to treat its files as invisible")
      } else {
        val in = fs.open(p)
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
        txt.linesIterator.filter(l => l.startsWith("{") && l.contains("\"action\":\"add\""))
          .map { l =>
            def f(k: String) = s""""$k":"([^"]*)"""".r.findFirstMatchIn(l).map(_.group(1))
            def n(k: String) = s""""$k":(\\d+)""".r.findFirstMatchIn(l).map(_.group(1).toLong)
            Entry(f("path").get, n("size").getOrElse(0L), l)
          }.toSeq
      }
    }
    (latestId, boundary, entries)
  }

  /** In a dry run the counts mean "would remove" and `paths` lists the
    * candidates (capped — the counts stay exact past the cap).
    * `logSwapRepaired` surfaces the ONE mutation even a dry run performs:
    * completing a crashed commit-log swap ([[graft.core.AtomicWrite
    * .recoverSwap]]) — callers serving a "read-only" preview must report
    * it rather than let a GET mutate state silently. */
  final case class VacuumReport(filesRemoved: Int, bytesRemoved: Long, dirsRemoved: Int,
      paths: Seq[String] = Nil, logSwapRepaired: Boolean = false)

  /** Remove data files the commit log does not reference — crash debris: a
    * micro-batch that wrote its file but died before the log append, or a
    * compaction killed before its swap. The reference specs this as the
    * scheduled VACUUM op over its Delta sink (ref AGENTS.md:1162-1171).
    *
    * `minAgeMs` is the safety horizon (Delta's retention-period analog): a
    * file younger than it is kept even if unreferenced, because an ACTIVE
    * micro-batch writes data files before committing them to the log —
    * vacuuming those would lose the in-flight batch. Production default is
    * hours; 0 only makes sense with the ingest stopped (as in tests).
    *
    * `dryRun` is Delta's `VACUUM … DRY RUN`: the same scan reports what
    * WOULD be removed — exact counts/bytes plus up to `maxListedPaths`
    * candidate paths (capped so a million-orphan preview never
    * materializes a million strings on the driver) — and deletes nothing.
    * The one mutation a dry run keeps is [[graft.core.AtomicWrite
    * .recoverSwap]] on the commit log: without completing a crashed log
    * swap every data file would preview as an orphan — the repair is
    * idempotent and the preview's answer is wrong without it. */
  def vacuum(
      spark: SparkSession,
      tablePath: String,
      minAgeMs: Long = 24L * 3600 * 1000,
      compactInterval: Int = 10,
      dryRun: Boolean = false,
      maxListedPaths: Int = 1000): VacuumReport = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(tablePath)
    val fs = root.getFileSystem(conf)
    val logDir = new Path(tablePath, "_spark_metadata")
    // repair a crashed log swap first — without the log every data file
    // would look unreferenced, and this method DELETES unreferenced files.
    // This runs under dryRun too (the preview's answer is wrong without
    // it) — the report carries the fact so no caller hides the mutation.
    val repaired = graft.core.AtomicWrite.recoverSwap(spark, logDir.toString)
    val (_, _, entries) = readLog(fs, logDir, compactInterval)
    val visible = entries.map(e => new Path(new java.net.URI(e.path)).toUri.getPath).toSet
    val cutoff = System.currentTimeMillis() - minAgeMs
    var files = 0; var bytes = 0L; var dirs = 0
    val listed = scala.collection.mutable.ArrayBuffer.empty[String]
    def note(p: Path): Unit =
      if (listed.size < maxListedPaths) listed += p.toUri.getPath
    def remove(p: Path, recursive: Boolean): Unit = {
      note(p)
      if (!dryRun) fs.delete(p, recursive)
    }
    def orphanFile(f: org.apache.hadoop.fs.FileStatus): Unit = {
      val name = f.getPath.getName
      val orphan = !name.startsWith(".") && !name.startsWith("_") &&
        !visible.contains(f.getPath.toUri.getPath) && f.getModificationTime < cutoff
      if (orphan) {
        files += 1; bytes += f.getLen
        remove(f.getPath, recursive = false)
      }
    }
    fs.listStatus(root)
      .filterNot(_.getPath.getName.startsWith("_")) // _spark_metadata
      .foreach { part =>
        if (!part.isDirectory) {
          // UNPARTITIONED sink: data files (and crash debris — a micro-batch
          // that died before its log append, a compaction killed before its
          // swap) sit directly at the table root
          orphanFile(part)
        } else if (part.getPath.getName.startsWith(".")) {
          // orphaned publish/log-swap temp dir at the table root
          if (part.getModificationTime < cutoff) {
            remove(part.getPath, recursive = true); dirs += 1
          }
        } else fs.listStatus(part.getPath).foreach { f =>
          if (f.isDirectory) {
            // a compaction killed mid-rewrite leaves its .compact-<uuid>
            // output INSIDE the partition dir — collect that too
            if (f.getPath.getName.startsWith(".") && f.getModificationTime < cutoff) {
              remove(f.getPath, recursive = true); dirs += 1
            }
          } else orphanFile(f)
        }
      }
    VacuumReport(files, bytes, dirs, listed.toSeq, logSwapRepaired = repaired)
  }

  private def statusJson(p: Path, size: Long, modTime: Long): String =
    s"""{"path":"${p.toUri}","size":$size,"isDir":false,"modificationTime":$modTime,""" +
      s""""blockReplication":1,"blockSize":33554432,"action":"add"}"""

  private def write(fs: FileSystem, p: Path, content: String): Unit = {
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }
}
