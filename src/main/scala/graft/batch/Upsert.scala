package graft.batch

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{AtomicWrite, TxnLog}

/** Partition-granularity MERGE (upsert) for plain-Parquet tables — the
  * stand-in for the `MERGE INTO` the reference would get from Delta
  * (ref `SparkManager.scala:36-37` enables Delta ACID; no Delta jars exist
  * in this environment, see SURVEY.md §2.1).
  *
  * Semantics per key: an update row replaces the existing row with the same
  * key (matched → update), a new key inserts (unmatched → insert), existing
  * rows without an update survive untouched. The unit of rewrite is the
  * PARTITION: only partitions present in `updates` are read or written —
  * sibling partitions are untouched bytes on disk. That is the property that
  * makes the operation delta-scaled at 100 TB: upserting one day into a
  * three-year partitioned table touches ~1/1000th of the data, and the cost
  * is independent of total table size.
  *
  * Each touched partition directory is republished via
  * [[graft.core.AtomicWrite.publish]], so a concurrent reader of the table
  * observes complete-old or complete-new data per partition, never a
  * half-written directory (same crash-safety contract as the batch result
  * store).
  *
  * Concurrent WRITERS are serialized per partition by the table's
  * [[graft.core.TxnLog]] manifest (the Delta optimistic-concurrency analog):
  * each partition merge claims its partition on top of the snapshot version
  * read before any table data, so two merges touching the same partition
  * fail loudly with [[graft.core.TxnLog.ConcurrentWriteException]] instead
  * of silently last-winning; merges of disjoint partitions proceed
  * unimpeded.
  */
object Upsert {

  /** Merge `updates` into the partitioned Parquet table at `table`.
    *
    * @param table    root of a table laid out as `table/<partCol>=<value>/…`
    *                 (written with `.partitionBy(partCol)`)
    * @param updates  new/changed rows; must contain `partCol` and `keyCols`;
    *                 keys must be unique within `updates` (fails fast
    *                 otherwise — ambiguous matched-rows are a silent data
    *                 bug in MERGE implementations); the non-partition
    *                 columns must COVER every column of each touched
    *                 partition (narrower updates would silently drop the
    *                 uncovered columns from surviving rows — refused, like
    *                 Delta MERGE which preserves unmentioned columns)
    * @param partCol  the table's partition column; values are escaped into
    *                 directory names exactly as Spark's `partitionBy` does
    *                 (so timestamps with ':' etc. match the layout on disk);
    *                 null values are refused
    * @param keyCols  match key within a partition
    * @param parallelism max partitions merging at once. Each partition
    *                 merge is one distributed job; running a bounded number
    *                 of them concurrently keeps a many-partition backfill
    *                 from serializing on job latency while capping the peak
    *                 footprint at `parallelism` partition rewrites.
    *                 Atomicity stays per-partition either way.
    * @return the touched partition values, for observability
    *
    * Scale notes: the only driver-side materializations are the DISTINCT
    * set of touched partition values (bounded by the partition count of the
    * delta, not by rows) and one commit record per partition. Failure
    * semantics under parallelism: every partition merge is atomic; on any
    * failure the remaining in-flight merges finish, unstarted ones are
    * skipped, and the first error propagates — completed partitions stay
    * published (re-running the same merge is idempotent per key).
    */
  def mergeByKey(
      spark: SparkSession,
      table: String,
      updates: DataFrame,
      partCol: String,
      keyCols: Seq[String],
      parallelism: Int = 4): Seq[String] = {
    require(keyCols.nonEmpty, "mergeByKey needs at least one key column")
    require(parallelism >= 1, "parallelism must be >= 1")

    // OCC snapshot BEFORE any table read: commits that land after this
    // version and touch our partitions invalidate what we are about to read
    val snapshot = TxnLog.currentVersion(spark, table)

    // One materialization of the updates plan, populated by the FIRST
    // action (the validation probe): validation, the distinct partition
    // collect, and the per-partition delta/anti-join below would otherwise
    // each re-execute a possibly-expensive upstream computation
    // (2 + 2×partitions replays on a backfill).
    updates.persist()
    try {
      // both sanity probes ride one tiny job: ambiguous matches and null
      // partition values are silent data bugs if they reach the write
      val bad = updates.groupBy(partCol, keyCols: _*)
        .count().filter(col("count") > 1 || col(partCol).isNull).limit(1).collect()
      if (bad.nonEmpty)
        throw new IllegalArgumentException(
          s"updates contain a duplicate key or null $partCol (first: ${bad.head}); " +
            "MERGE matches must be unambiguous and partition values non-null")

      val dataCols = updates.columns.filterNot(_ == partCol).toSeq
      val touched = updates.select(col(partCol).cast("string")).distinct()
        .collect().map(_.getString(0)).sorted.toSeq

      // Bounded-parallel partition merges: Spark schedules concurrent jobs
      // fine from multiple submitter threads; the pool only bounds how many
      // partition rewrites are in flight.
      val pool = Executors.newFixedThreadPool(math.min(parallelism, math.max(1, touched.size)))
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      try {
        val merges = touched.map { p =>
          Future(mergeOnePartition(spark, table, updates, partCol, keyCols, dataCols, p, snapshot))
        }
        // surface the FIRST failure but let in-flight merges complete first
        // (each is atomic; cancelling a distributed write mid-flight buys
        // nothing and loses the completed partitions' observability)
        val results = merges.map(f => scala.util.Try(Await.result(f, Duration.Inf)))
        results.collectFirst { case scala.util.Failure(e) => e }.foreach(throw _)
      } finally pool.shutdown()
      touched
    } finally updates.unpersist()
  }

  /** Merge one partition under a two-phase TxnLog claim:
    * begin (the loud-failure point for concurrent same-partition writers,
    * checked against `snapshot`) → read existing + publish merged → end.
    * The begin precedes the partition's file-listing resolution, so a
    * successful claim guarantees no concurrent writer republishes this
    * partition between our read and our install. */
  private def mergeOnePartition(
      spark: SparkSession,
      table: String,
      updates: DataFrame,
      partCol: String,
      keyCols: Seq[String],
      dataCols: Seq[String],
      p: String,
      snapshot: Long): Unit = {
    val claim = TxnLog.begin(spark, table, "upsert", Set(p), snapshot)
    // any failure between the claim and its end must ABORT the claim —
    // otherwise the partition stays locked for the full staleness horizon
    // and an immediate retry after fixing the input is refused
    try mergeUnderClaim(spark, table, updates, partCol, keyCols, dataCols, p, claim)
    catch {
      case scala.util.control.NonFatal(e) =>
        scala.util.Try(TxnLog.abort(spark, table, claim)) // never mask the cause
        throw e
    }
  }

  private def mergeUnderClaim(
      spark: SparkSession,
      table: String,
      updates: DataFrame,
      partCol: String,
      keyCols: Seq[String],
      dataCols: Seq[String],
      p: String,
      claim: TxnLog.Commit): Unit = {
    // Spark's partitionBy ESCAPES special chars in directory names
    // (':' → %3A etc.); building the path from the raw value would miss
    // the existing dir, treat the partition as new, and publish a
    // duplicate sibling that readers merge into old-AND-new rows.
    val escaped = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .escapePathName(p)
    val dirName = s"$partCol=$escaped"
    val partDir = s"$table/$dirName"
    val delta = updates.filter(col(partCol).cast("string") === p)
      .select(dataCols.map(col): _*)
    val existing = existingPartition(spark, partDir, dataCols, p)
    val merged = existing match {
      case Some(old) =>
        // matched → update wins; join only on keys, so changed non-key
        // columns replace the old values
        old.join(delta.select(keyCols.map(col): _*), keyCols, "left_anti")
          .unionByName(delta)
      case None => delta // brand-new partition: pure insert
    }
    // Time travel: the replaced generation is retained under the claim's
    // version (underscore prefix — invisible to plain readers). A
    // brand-new partition retains an ABSENT marker instead, so [[readAsOf]]
    // can tell "did not exist at that version" from "generation vacuumed"
    // (the latter must fail loudly, never silently drop a partition).
    val historyRoot = s"$table/$HistoryDir/v${claim.version}"
    if (existing.isEmpty) {
      val marker = new org.apache.hadoop.fs.Path(s"$historyRoot/$dirName$AbsentSuffix")
      val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
      fs.mkdirs(marker.getParent)
      val out = fs.create(marker, true)
      try out.write(Array.empty[Byte]) finally out.close()
    }
    AtomicWrite.publish(spark, partDir,
      retainOldTo = if (existing.isDefined) Some(s"$historyRoot/$dirName") else None) { tmp =>
      merged.write.parquet(tmp)
    }
    TxnLog.end(spark, table, claim)
  }

  private val HistoryDir = "_graft_history"
  private val AbsentSuffix = ".ABSENT"

  /** Versioned snapshot read — the Delta `VERSION AS OF` analog
    * (ref `SparkManager.scala:36-37`: Delta gives the reference repeatable
    * reads of any retained version for free). Returns the table as of
    * TxnLog `version`: every partition resolves to its live directory if
    * no COMMITTED upsert touched it after `version`, otherwise to the
    * pre-image retained when the earliest such upsert replaced it.
    * Partitions first created after `version` are excluded (their ABSENT
    * marker proves non-existence); a generation already removed by
    * [[vacuumHistory]] fails loudly — a snapshot must never be silently
    * partial.
    *
    * Semantics: "as of v" = the state produced by every write whose END
    * commit is ≤ v. A write in flight at v (begun, not ended) is not yet
    * committed and resolves to its pre-image. Guarantees cover committed
    * writes; a writer that crashed mid-merge leaves its partition visible
    * to PLAIN readers but outside any committed version (same
    * partial-application semantics as [[mergeByKey]] itself).
    *
    * One bounded race: the pre-image lands in history via a rename that
    * FOLLOWS the install rename (reversing them would break crash repair —
    * recoverSwap restores from `.old-` siblings, not from history), so a
    * snapshot read racing that instant can transiently resolve an
    * in-flight writer's partition to the live dir. The window is two
    * metadata ops wide (milliseconds); a re-read after the writer commits
    * is exact.
    *
    * Scale shape: resolution is O(partitions) driver METADATA (one commit
    * scan + one directory listing); data reads group by generation, so the
    * plan holds O(distinct retained versions) scans, each partition-pruned
    * — no per-partition plan explosion, nothing corpus-sized on the
    * driver. */
  def readAsOf(
      spark: SparkSession,
      table: String,
      version: Long,
      partCol: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(table)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val all = TxnLog.commitsSince(spark, table, 0L)
    // TxnLog.truncate removes commits below the retention floor; a version
    // below it cannot be soundly reconstructed — commits in (version,
    // floor) may be GONE, and a missing end-commit would make a rewritten
    // partition silently resolve to live. Refuse rather than guess.
    all.headOption.map(_.version).filter(version < _ - 1).foreach { floor =>
      throw new IllegalStateException(
        s"time travel: version $version predates the manifest horizon " +
          s"(oldest retained commit is v$floor) — the snapshot is no longer " +
          "reconstructible")
    }
    val ends = all.filter(c => c.op == "upsert-end" && c.ref.isDefined)
    val closed = all.flatMap(_.ref).toSet // ends AND aborts release claims
    val liveDirs = fs.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(s"$partCol="))
      .map(_.getPath.getName).sorted
    require(liveDirs.nonEmpty, s"$table has no $partCol=* partitions")

    val liveVals = Seq.newBuilder[String]
    val fromHistory = Seq.newBuilder[(Long, String)] // (begin version, dir name)
    // resolve through the retained generation of `begin`, live dir if the
    // pre-image was never retained (the write had not installed), absent
    // if the marker proves the partition postdates the snapshot
    def resolveVia(begin: Long, dirName: String): Unit = {
      val gen = s"$table/$HistoryDir/v$begin/$dirName"
      if (fs.exists(new org.apache.hadoop.fs.Path(gen + AbsentSuffix))) ()
      else if (fs.exists(new org.apache.hadoop.fs.Path(gen)))
        fromHistory += ((begin, dirName))
      else
        throw new IllegalStateException(
          s"time travel: generation v$begin of $dirName was vacuumed — " +
            s"the snapshot at version $version is no longer reconstructible")
    }
    liveDirs.foreach { dirName =>
      val value = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .unescapePathName(dirName.stripPrefix(s"$partCol="))
      val laterEnds = ends.filter(e => e.partitions.contains(value) && e.version > version)
      // an UNCLOSED begin is a write that never committed (in flight or
      // crashed): its publish may already sit in the live dir, so the live
      // dir is NOT evidence of the committed state — resolve through the
      // pre-image it retained (or the live dir only if it never installed,
      // when no retained generation exists)
      val unclosed = all.filter(c => c.op == "upsert-begin" &&
        !closed.contains(c.version) && c.partitions.contains(value))
      if (laterEnds.nonEmpty) resolveVia(laterEnds.minBy(_.version).ref.get, dirName)
      else if (unclosed.nonEmpty) {
        val b = unclosed.minBy(_.version).version
        val gen = s"$table/$HistoryDir/v$b/$dirName"
        if (fs.exists(new org.apache.hadoop.fs.Path(gen + AbsentSuffix))) ()
        else if (fs.exists(new org.apache.hadoop.fs.Path(gen))) fromHistory += ((b, dirName))
        else liveVals += value // publish never installed: live IS the pre-image
      }
      else liveVals += value
    }
    val live = liveVals.result()
    val reads = Seq.newBuilder[DataFrame]
    if (live.nonEmpty)
      reads += spark.read.option("mergeSchema", "true").parquet(table)
        .filter(col(partCol).cast("string").isin(live: _*))
    fromHistory.result().groupBy(_._1).toSeq.sortBy(_._1).foreach { case (begin, dirs) =>
      val base = s"$table/$HistoryDir/v$begin"
      reads += spark.read.option("mergeSchema", "true").option("basePath", base)
        .parquet(dirs.map(d => s"$base/${d._2}"): _*)
    }
    val parts = reads.result()
    if (parts.isEmpty)
      spark.read.parquet(table).filter(lit(false)) // every partition postdates `version`
    else parts.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Remove retained generations older than `minAgeMs` (age since
    * REPLACEMENT — the retention rename sets the directory mtime), bounding
    * history growth; the time-travel horizon is exactly this retention,
    * like Delta's. Returns the number of generation roots removed. */
  def vacuumHistory(
      spark: SparkSession, table: String,
      minAgeMs: Long = 7L * 24 * 3600 * 1000): Int = {
    val hist = new org.apache.hadoop.fs.Path(s"$table/$HistoryDir")
    val fs = hist.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(hist)) return 0
    val cutoff = System.currentTimeMillis() - minAgeMs
    val victims = fs.listStatus(hist)
      .filter(st => st.getPath.getName.matches("v\\d+") && st.getModificationTime < cutoff)
    victims.foreach(st => fs.delete(st.getPath, true))
    victims.length
  }

  /** The surviving rows of a partition dir, or None if it does not exist.
    * Schema discipline in BOTH directions: updates with columns the table
    * lacks fail in the select below (analysis error); a table with columns
    * the updates lack fails HERE — selecting only the updates' columns
    * would silently rewrite every surviving row without the uncovered
    * columns (Delta MERGE preserves unmentioned columns; losing them must
    * be loud). */
  private def existingPartition(
      spark: SparkSession, partDir: String, dataCols: Seq[String],
      partValue: String): Option[DataFrame] = {
    val path = new org.apache.hadoop.fs.Path(partDir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(path)) None
    else {
      val old = spark.read.parquet(partDir)
      val uncovered = old.columns.toSet -- dataCols.toSet
      if (uncovered.nonEmpty)
        throw new IllegalArgumentException(
          s"updates do not cover existing columns ${uncovered.toSeq.sorted.mkString(", ")} " +
            s"of partition $partValue — surviving rows would lose them; " +
            "include the columns in updates (null-filled if unchanged is not intended)")
      Some(old.select(dataCols.map(col): _*))
    }
  }
}
