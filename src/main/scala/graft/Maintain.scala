package graft

import org.apache.spark.sql.SparkSession

import graft.core.GraftConfig
import graft.streaming.SinkCompaction

/** Standalone scheduled-maintenance entry point — the operational form of
  * the reference's spec'd-but-unimplemented OPTIMIZE/VACUUM jobs
  * (ref AGENTS.md:1162-1171): compact the streaming sink's per-micro-batch
  * small files, then vacuum unreferenced debris, both honoring the typed
  * config tree's `graft.maintenance` knobs. Run from cron/scheduler while
  * the ingest query is stopped (same contract as the reference's scheduled
  * OPTIMIZE); both ops begin by repairing any crashed prior swap.
  *
  * Usage: `runMain graft.Maintain [tablePath] [mode]` — defaults to the
  * config tree's stream table. `mode = stream` (default) runs the
  * streaming-sink compact/vacuum pair; `mode = upsert <partCol>` runs the
  * upsert-table small-file compaction ([[graft.batch.Upsert
  * .compactPartitions]]) instead — sink tables have a commit log to
  * rewrite, upsert tables have partition dirs to coalesce;
  * `mode = zorder <partCol> <col,col[,col]>` runs the multi-dimensional
  * layout rewrite ([[graft.batch.Upsert.optimizeZOrder]], the scheduled
  * `OPTIMIZE … ZORDER BY` form); `mode = bloom <col>` refreshes the
  * per-file Bloom sidecar incrementally ([[graft.core.BloomIndex.refresh]]
  * — only files the sidecar has never seen are read; the upsert write
  * paths already refresh inline after replacing files, so this run mostly
  * catches external appends and builds the first sidecar);
  * `mode = ivf|pq <partCol> <indexDir>` keeps a persisted ANN index in
  * step with its source vector table ([[graft.operators.IvfIndex.sync]] /
  * [[graft.operators.PqIndex.sync]] — build when absent, else an
  * O(changes) change-feed refresh). All modes then share
  * the manifest/history/registry sweeps. Prints one JSON line per op for
  * the scheduler's log scraper; exits non-zero on failure.
  */
object Maintain {
  def main(args: Array[String]): Unit = {
    val cfg = GraftConfig.load()
    val table = args.headOption.getOrElse(cfg.stream.tableDir)
    val mode = args.drop(1).headOption.getOrElse("stream")
    val m = cfg.maintenance
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("GRAFT_SPARK_MASTER", cfg.spark.master))
      .appName(s"${cfg.appName}-maintenance")
      .config("spark.sql.shuffle.partitions", cfg.spark.shufflePartitions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the table path is user/config input — escape it so a quote or
    // backslash in the path cannot produce invalid JSON for the scheduler's
    // log scraper
    val tableJson = graft.http.Json.quote(table)
    try {
      require(Set("stream", "upsert", "zorder", "bloom", "ivf", "pq").contains(mode),
        s"Maintain: unknown mode '$mode' (expected 'stream', 'upsert', " +
          "'zorder', 'bloom', 'ivf', or 'pq') — refusing to guess which " +
          "maintenance to run")
      if (mode == "ivf" || mode == "pq") {
        // scheduled ANN-index maintenance: build the table-backed index if
        // absent, else consume the change feed (O(changes) rewrite)
        val partCol = args.drop(2).headOption.getOrElse(
          sys.error(s"Maintain: $mode mode needs the partition column " +
            s"(runMain graft.Maintain <table> $mode <partCol> <indexDir>)"))
        val indexDir = args.drop(3).headOption.getOrElse(
          sys.error(s"Maintain: $mode mode needs the index directory " +
            s"(runMain graft.Maintain <table> $mode <partCol> <indexDir>)"))
        val (rebuilt, changed, to) =
          if (mode == "ivf") {
            val s = graft.operators.IvfIndex.sync(spark, table, partCol, indexDir)
            (s.rebuilt, s.changedRows, s.toVersion)
          } else {
            val s = graft.operators.PqIndex.sync(spark, table, partCol, indexDir)
            (s.rebuilt, s.changedRows, s.toVersion)
          }
        println(s"""{"op":"$mode-sync","table":$tableJson,"rebuilt":$rebuilt,""" +
          s""""changedRows":$changed,"toVersion":$to}""")
      } else if (mode == "bloom") {
        val column = args.drop(2).headOption.getOrElse(
          sys.error("Maintain: bloom mode needs the indexed column " +
            "(runMain graft.Maintain <table> bloom <col>)"))
        // incremental: existing filters are reused (data files are
        // immutable), only files the sidecar has never seen are read —
        // builds from scratch when no sidecar exists yet
        val st = graft.core.BloomIndex.refresh(spark, table, column)
        println(s"""{"op":"bloom-refresh","table":$tableJson,""" +
          s""""filesIndexed":${st.filesIndexed},"entriesDropped":${st.entriesDropped},""" +
          s""""filesTotal":${st.filesTotal}}""")
      } else if (mode == "zorder") {
        val partCol = args.drop(2).headOption.getOrElse(
          sys.error("Maintain: zorder mode needs the partition column " +
            "(runMain graft.Maintain <table> zorder <partCol> <col,col>)"))
        val zCols = args.drop(3).headOption.map(_.split(",").toSeq)
          .getOrElse(sys.error("Maintain: zorder mode needs the cluster " +
            "columns (runMain graft.Maintain <table> zorder <partCol> <col,col>)"))
        val n = graft.batch.Upsert.optimizeZOrder(spark, table, partCol, zCols,
          targetBytes = m.targetBytes)
        println(s"""{"op":"optimize-zorder","table":$tableJson,"partitions":$n}""")
      } else if (mode == "upsert") {
        val partCol = args.drop(2).headOption.getOrElse(
          sys.error("Maintain: upsert mode needs the partition column " +
            "(runMain graft.Maintain <table> upsert <partCol>)"))
        // a streaming-sink table's visible file set is its commit log, not
        // the directory tree — rewriting its partition files here would
        // orphan every logged path; the sink gets the `stream` mode
        val logDir = new org.apache.hadoop.fs.Path(table, "_spark_metadata")
        require(!logDir.getFileSystem(spark.sessionState.newHadoopConf()).exists(logDir),
          s"$table is a streaming file-sink table (has _spark_metadata) — " +
            "use the default stream mode, not upsert")
        // optional 4th arg: comma-separated layout columns for the rewrite
        // (falls back to the config tree's layout-cols; empty = plain
        // repartition)
        val layout = args.drop(3).headOption
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(m.layoutCols)
        val n = graft.batch.Upsert.compactPartitions(spark, table, partCol,
          targetBytes = m.targetBytes, minFilesToCompact = m.minFilesToCompact,
          layoutCols = layout, layoutMode = m.layoutMode)
        println(s"""{"op":"compact-upsert","table":$tableJson,"partitions":$n}""")
      } else {
        val rep = SinkCompaction.compact(spark, table,
          targetBytes = m.targetBytes,
          minFilesToCompact = m.minFilesToCompact,
          compactInterval = m.compactInterval,
          layoutCols = m.layoutCols,
          layoutMode = m.layoutMode)
        println(s"""{"op":"compact","table":$tableJson,"partitions":${rep.partitionsCompacted},""" +
          s""""filesBefore":${rep.filesBefore},"filesAfter":${rep.filesAfter},""" +
          s""""bytesRewritten":${rep.bytesRewritten}}""")
        val vac = SinkCompaction.vacuum(spark, table,
          minAgeMs = m.minAgeMs, compactInterval = m.compactInterval)
        println(s"""{"op":"vacuum","table":$tableJson,"filesRemoved":${vac.filesRemoved},""" +
          s""""bytesRemoved":${vac.bytesRemoved},"dirsRemoved":${vac.dirsRemoved}}""")
      }
      // bound the table's OCC manifest (metadata, one small file per commit)
      val truncated = graft.core.TxnLog.truncate(spark, table)
      println(s"""{"op":"txn-truncate","table":$tableJson,"removed":$truncated}""")
      // retained time-travel generations past the retention horizon (the
      // min-age knob doubles as the as-of horizon, like Delta's)
      val hist = graft.batch.Upsert.vacuumHistory(spark, table, minAgeMs = m.minAgeMs)
      println(s"""{"op":"history-vacuum","table":$tableJson,"removed":$hist}""")
      // registry sweep: terminal job records older than the retention
      // horizon leave the crash-recovery mirror, so a long-lived deployment
      // cannot grow its restart recovery (and /batch/list) without bound
      val reg = new graft.batch.BatchRegistry(Some(cfg.data.registryDir))
      reg.recover()
      val pruned = reg.prune(m.registryRetentionMs)
      println(s"""{"op":"registry-sweep","dir":${graft.http.Json.quote(cfg.data.registryDir)},""" +
        s""""recovered":${reg.size + pruned},"pruned":$pruned}""")
    } finally spark.stop()
  }
}
