package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.batch.{BatchRegistry, BatchService}
import graft.core.{GraftConfig, SparkSessionFactory, TransactionGen}
import graft.http.{HttpApi, JArr, JBool, JNum, Json}
import graft.streaming.StreamingIngest

/** Standalone end-to-end drive of the whole engine loop (ST8 stream/batch
  * convergence) over the reference's actual interface: typed config →
  * generate reference-distribution transactions → stream them through the
  * JSON drop-dir ingest into the partitioned table → submit a full_report
  * batch over HTTP → poll status → read results back over paginated HTTP
  * envelopes. Prints one summary line per stage; exits non-zero on any
  * failure.
  */
object Drive {
  def main(args: Array[String]): Unit = {
    // 0. config tree: defaults overlaid with this run's scratch root
    val root = Files.createTempDirectory("graft-drive").toString
    val cfg = GraftConfig.load(
      overrides = Some(s"""graft { data { base-path = "$root" } }"""))
    val spark = SparkSessionFactory.create(master = "local[8]",
      appName = "graft-drive", shufflePartitions = Some(8),
      fairSchedulerXml =
        Some(cfg.spark.fairSchedulerFile).filter(f => new java.io.File(f).isFile))
    spark.sparkContext.setLogLevel("ERROR")
    // the allocation file really loaded: reference weights on our pools
    val sched = spark.sparkContext.getPoolForName("streaming")
    assert(sched.exists(p => p.weight == 3 && p.minShare == 4),
      s"streaming pool must carry weight 3 / minShare 4: $sched")
    assert(spark.sparkContext.getPoolForName("batch").exists(_.weight == 1))
    assert(cfg.stream.tableDir == s"$root/stream/transactions",
      s"substitution must chase the overlay: ${cfg.stream.tableDir}")
    val (drop, table, ckpt) =
      (cfg.stream.dropDir, cfg.stream.tableDir, s"${cfg.spark.checkpointDir}/ingest")
    println(s"DRIVE config: base=${cfg.data.basePath} pool=${cfg.batch.threadPoolSize}")

    // 1. 20k deterministic transactions, landed as JSON in two waves
    val tx = TransactionGen.generate(spark, 20000L, days = 30)
    tx.filter(col("transaction_id").substr(5, 10).cast("long") % 2 === 0)
      .toJSON.coalesce(2).write.mode("append").text(drop)
    println(s"DRIVE gen: 20000 rows, wave1 landed")

    // 2. stream ingest (wave 1), then wave 2 through the SAME checkpoint
    val q1 = StreamingIngest.start(spark, drop, table, ckpt)
    q1.processAllAvailable(); q1.stop()
    tx.filter(col("transaction_id").substr(5, 10).cast("long") % 2 =!= 0)
      .toJSON.coalesce(2).write.mode("append").text(drop)
    val q2 = StreamingIngest.start(spark, drop, table, ckpt)
    q2.processAllAvailable(); q2.stop()
    val streamed = StreamingIngest.readTable(spark, table)
    val n = streamed.count()
    assert(n == 20000L, s"streamed table must hold every generated row, got $n")
    val nDates = streamed.select("event_date").distinct().count()
    println(s"DRIVE ingest: $n rows in $nDates date partitions (2 waves, 1 checkpoint)")

    // 2b. realtime dashboard: second streaming query over the same drop-dir
    // source, complete-mode-equivalent snapshot published atomically to the
    // config tree's agg dir (production would trigger every
    // cfg.stream.triggerSeconds; the drive drains all-available instead)
    val dashSrc = StreamingIngest.enrich(spark.readStream
      .schema(graft.core.Schemas.TransactionSchema).json(drop))
    val qd = graft.streaming.StreamingDashboard.start(
      spark, dashSrc, cfg.stream.aggDir, s"${cfg.spark.checkpointDir}/dashboard")
    qd.processAllAvailable(); qd.stop()
    val snap = graft.streaming.StreamingDashboard.readLatest(spark, cfg.stream.aggDir)
    val dashTx = snap.agg(sum(col("txn_count"))).head().getLong(0)
    val completedOrPending = streamed
      .filter(col("transaction_status").isin("completed", "pending")).count()
    // sliding 5m/1m windows: every event lands in exactly 5 windows
    assert(dashTx == 5 * completedOrPending,
      s"dashboard snapshot must cover all $completedOrPending events x5 windows, got $dashTx")
    println(s"DRIVE dashboard: snapshot covers $dashTx window-events at ${cfg.stream.aggDir}")

    // 2c. scheduled sink maintenance with the ingest WRITER stopped (the
    // reference's OPTIMIZE/VACUUM slot): compact each partition's
    // per-micro-batch small files and GC unreferenced debris. READERS stay
    // active throughout compaction — readTable's versioned resolution
    // (TxnLog swap marks + retry) must keep every concurrent read at
    // exactly n rows. Replaced small files persist as orphans until vacuum
    // (run after the readers stop: its minAgeMs retention IS the reader
    // grace period, and the drive uses 0).
    val maintReaderStop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val maintAnomalies = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val maintReader = new Thread(() => {
      while (!maintReaderStop.get()) {
        try {
          val c = StreamingIngest.readTable(spark, table).count()
          if (c != n) maintAnomalies.add(s"saw $c rows")
        } catch { case e: Throwable => maintAnomalies.add(s"threw $e") }
      }
    })
    maintReader.start()
    val rep =
      try graft.streaming.SinkCompaction.compact(
        spark, table, targetBytes = 64L * 1024 * 1024)
      finally { maintReaderStop.set(true); maintReader.join() }
    assert(maintAnomalies.isEmpty,
      s"concurrent readers must stay consistent during compaction: $maintAnomalies")
    val vac = graft.streaming.SinkCompaction.vacuum(spark, table, minAgeMs = 0L)
    val afterMaint = StreamingIngest.readTable(spark, table).count()
    assert(afterMaint == n, s"maintenance must not change visible rows: $afterMaint")
    // the default BATCH read path resolves through the TxnLog manifest the
    // compaction left behind (committed-snapshot read — same row count)
    val committed = graft.batch.Upsert.readCommitted(spark, table, "event_date").count()
    assert(committed == n, s"readCommitted must see the full table: $committed")
    println(s"DRIVE maintenance: ${rep.filesBefore}->${rep.filesAfter} files " +
      s"(${rep.partitionsCompacted} partitions), vacuumed ${vac.filesRemoved} orphans, " +
      "readers consistent throughout")

    // 3. batch full_report over the STREAMED table, submitted over HTTP.
    // The registry runs with its crash-recovery mirror (the production
    // shape): terminal records land in cfg.data.registryDir, a restart
    // recover()s them, and Maintain's retention sweep bounds the dir.
    val registry = new BatchRegistry(Some(cfg.data.registryDir))
    registry.recover() // no-op on first boot; restores records on restart
    val svc = new BatchService(spark, registry, cfg.data.batchBasePath,
      poolSize = cfg.batch.threadPoolSize)
    val api = new HttpApi(spark, svc, registry, sourcePath = table,
      defaultPageSize = cfg.batch.defaultPageSize,
      maxPageSize = cfg.batch.maxPageSize,
      host = cfg.http.host, bindPort = cfg.http.port,
      maintenance = Some(new graft.batch.MaintenanceService(spark, registry,
        cfg.maintenance, s"$root/maint-ops", cfg.data.registryDir))).start()
    // client targets the configured bind host (loopback stays loopback; a
    // wildcard bind is reachable via loopback too)
    val apiHost = if (cfg.http.host == "0.0.0.0") "127.0.0.1" else cfg.http.host
    val client = HttpClient.newHttpClient()
    def get(path: String) = {
      val r = client.send(
        HttpRequest.newBuilder(URI.create(s"http://$apiHost:${api.port}$path"))
          .GET().build(), HttpResponse.BodyHandlers.ofString())
      (r.statusCode(), Json.parse(r.body()))
    }
    val (subCode, subBody) = {
      val r = client.send(
        HttpRequest.newBuilder(URI.create(s"http://$apiHost:${api.port}/batch/run"))
          .POST(HttpRequest.BodyPublishers.ofString(
            """{"startDate":"2026-01-01","endDate":"2026-01-30",
               "analysisType":"full_report",
               "filters":{"transaction_status":"completed"}}"""))
          .build(), HttpResponse.BodyHandlers.ofString())
      (r.statusCode(), Json.parse(r.body()))
    }
    assert(subCode == 202, s"submit: $subCode $subBody")
    val id = subBody.asObj("batchId").str
    val deadline = System.currentTimeMillis() + 120000
    var status = "PENDING"
    while (status != "COMPLETED" && status != "FAILED" &&
        System.currentTimeMillis() < deadline) {
      Thread.sleep(200)
      status = get(s"/batch/status/$id")._2.asObj("status").str
    }
    assert(status == "COMPLETED", s"batch over HTTP: $status")
    val rows = get(s"/batch/status/$id")._2.asObj("rowCount") match {
      case JNum(v) => v.toLong
      case other   => sys.error(s"rowCount: $other")
    }
    println(s"DRIVE batch: $id completed over HTTP, rows=$rows")

    // 4. results readback over paginated HTTP envelopes
    val (ac, ab) = get(s"/batch/data/$id/aggregated?analysis=revenue_by_category")
    assert(ac == 200, s"aggregated: $ac $ab")
    val nCat = ab.asObj("data") match {
      case JArr(items) => items.length
      case other       => sys.error(s"agg data: $other")
    }
    assert(nCat > 0)
    val (pc, pb) = get(s"/batch/data/$id?limit=50&offset=100")
    assert(pc == 200, s"page: $pc $pb")
    val pageLen = pb.asObj("data") match {
      case JArr(items) => items.length
      case other       => sys.error(s"page data: $other")
    }
    assert(pageLen == 50, s"page(100,50) returned $pageLen")
    assert(pb.asObj("page").asObj("hasMore") == graft.http.JBool(true))
    // the crash-recovery mirror really received the terminal record, and a
    // cold registry recovers it — restart durability over the actual
    // serving path, not just a unit fixture
    val recovered = { val r = new BatchRegistry(Some(cfg.data.registryDir)); r.recover(); r }
    assert(recovered.get(id).exists(_.status == graft.batch.BatchStatus.Completed),
      s"registry mirror must hold $id for restart recovery")
    println(s"DRIVE readback: $nCat categories, page(100,50) over HTTP ok, " +
      "registry mirror recoverable")

    // 5. scheduled maintenance over the SAME API (the reference's
    // AGENTS.md:1162-1171 scheduled-ops story, API-drivable): stream-mode
    // compact/vacuum + the shared sweeps on the sink table, tracked through
    // the same registry lifecycle as the batch job above. The ingest writer
    // is stopped; step 2c already compacted, so this run mostly verifies
    // the idempotent path end-to-end.
    val (mc, mb) = {
      val r = client.send(
        HttpRequest.newBuilder(URI.create(s"http://$apiHost:${api.port}/maintenance/run"))
          .POST(HttpRequest.BodyPublishers.ofString(
            s"""{"mode":"stream","table":"$table"}"""))
          .build(), HttpResponse.BodyHandlers.ofString())
      (r.statusCode(), Json.parse(r.body()))
    }
    assert(mc == 202, s"maintenance submit: $mc $mb")
    val mid = mb.asObj("maintenanceId").str
    val mDeadline = System.currentTimeMillis() + 120000
    var mStatus = "PENDING"
    while (mStatus != "COMPLETED" && mStatus != "FAILED" &&
        System.currentTimeMillis() < mDeadline) {
      Thread.sleep(200)
      mStatus = get(s"/maintenance/status/$mid")._2.asObj("status").str
    }
    assert(mStatus == "COMPLETED",
      s"maintenance over HTTP: $mStatus ${get(s"/maintenance/status/$mid")._2}")
    val mOps = get(s"/maintenance/status/$mid")._2.asObj("ops") match {
      case JArr(items) => items.map(_.asObj("op").str)
      case other       => sys.error(s"ops: $other")
    }
    assert(mOps == Vector("compact", "vacuum", "txn-truncate", "history-vacuum",
      "registry-sweep"), s"maintenance ops: $mOps")
    val afterApiMaint = StreamingIngest.readTable(spark, table).count()
    assert(afterApiMaint == n,
      s"API maintenance must not change visible rows: $afterApiMaint")
    println(s"DRIVE maintenance-api: $mid completed over HTTP, ops=${mOps.mkString(",")}")

    // VACUUM dry-run over the API: after the maintenance pass the sink
    // must preview clean — the operator's "is there anything to clean?"
    // probe before scheduling a real run
    val (vpc, vpb) = get(s"/table/vacuum/preview?table=" +
      java.net.URLEncoder.encode(table, "UTF-8") + "&minAgeMs=0")
    assert(vpc == 200 && vpb.asObj("dryRun") == JBool(true) &&
      vpb.asObj("filesToRemove") == JNum(BigDecimal(0)),
      s"vacuum preview: $vpc $vpb")
    println("DRIVE vacuum-preview: clean after maintenance")

    // 6. storage verbs over the API on a small MERGE table: churn,
    // introspect (history + detail), restore the pre-churn version, clone
    // the result — the incident-recovery + dev-copy loop, end to end.
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    val verbsTable = s"$root/verbs/t"
    graft.batch.Upsert.mergeByKey(spark, verbsTable,
      (1 to 60).map(i => (s"2026-01-0${i % 3 + 1}", i.toLong, i * 1.0))
        .toDF("day", "k", "v"),
      "day", Seq("k"))
    val vGood = graft.core.TxnLog.currentVersion(spark, verbsTable)
    graft.batch.Upsert.mergeByKey(spark, verbsTable,
      Seq(("2026-01-01", 7L, -999.0)).toDF("day", "k", "v"), "day", Seq("k"))
    val enc = java.net.URLEncoder.encode(verbsTable, "UTF-8")
    val (hc, hb) = get(s"/table/history?table=$enc&limit=5")
    assert(hc == 200 && (hb.asObj("history") match {
      case JArr(items) => items.nonEmpty; case _ => false
    }), s"history: $hc $hb")
    val (rc2, rb2) = {
      val r = client.send(
        HttpRequest.newBuilder(URI.create(s"http://$apiHost:${api.port}/maintenance/run"))
          .POST(HttpRequest.BodyPublishers.ofString(
            s"""{"mode":"restore","table":"$verbsTable","partCol":"day",""" +
              s""""version":"$vGood","keys":"k"}"""))
          .build(), HttpResponse.BodyHandlers.ofString())
      (r.statusCode(), Json.parse(r.body()))
    }
    assert(rc2 == 202, s"restore submit: $rc2 $rb2")
    val rid = rb2.asObj("maintenanceId").str
    var rStatus = "PENDING"
    val rDeadline = System.currentTimeMillis() + 120000
    while (rStatus != "COMPLETED" && rStatus != "FAILED" &&
        System.currentTimeMillis() < rDeadline) {
      Thread.sleep(200)
      rStatus = get(s"/maintenance/status/$rid")._2.asObj("status").str
    }
    assert(rStatus == "COMPLETED",
      s"restore over HTTP: $rStatus ${get(s"/maintenance/status/$rid")._2}")
    val restored = graft.batch.Upsert.readCommitted(spark, verbsTable, "day")
      .filter(col("k") === lit(7L)).select("v").head.getDouble(0)
    assert(restored == 7.0, s"restore must roll the bad write back: $restored")
    val cloneDst = s"$root/verbs/clone"
    assert(graft.batch.Upsert.cloneTo(spark, verbsTable, cloneDst, "day") == 60L)
    val (dc2, db2) = get(s"/table/detail?table=$enc")
    assert(dc2 == 200 && db2.asObj("numFiles").asInstanceOf[JNum].v > 0,
      s"detail: $dc2 $db2")
    // versioned reads over the API: the snapshot BEFORE the bad write must
    // serve the bad row's pre-image; the change range since it must show
    // the restore's net effect — the incident-forensics loop with curl,
    // not Scala
    val (vc, vb) = get(s"/table/data?table=$enc&partCol=day&asOf=$vGood" +
      "&orderBy=k&limit=100")
    assert(vc == 200, s"asOf data: $vc $vb")
    val asOfRows = vb.asObj("data") match {
      case JArr(items) => items.map(_.asObj); case other => sys.error(s"$other")
    }
    assert(asOfRows.size == 60 && asOfRows.exists(r =>
        r("k").asInstanceOf[JNum].v.toLong == 7L &&
        r("v").asInstanceOf[JNum].v.toDouble == 7.0),
      s"asOf page must serve the pre-incident snapshot: ${asOfRows.size}")
    assert(get(s"/table/data?table=$enc&partCol=day&asOf=99999")._1 == 400,
      "a version beyond the tip must be a 400")
    val (cc2, cb2) = get(s"/table/changes?table=$enc&partCol=day&from=$vGood&limit=200")
    assert(cc2 == 200, s"changes: $cc2 $cb2")
    val chgRows = cb2.asObj("data") match {
      case JArr(items) => items.map(_.asObj); case other => sys.error(s"$other")
    }
    // the bad write keyed on (day=2026-01-01, k=7) — a NEW row next to the
    // real k=7 in 2026-01-02 — so the feed must show its insert arriving
    // and the restore deleting it again, each stamped with its own commit
    def chg(tpe: String) = chgRows.filter(r =>
      r("k").asInstanceOf[JNum].v.toLong == 7L &&
        r("_change_type").str == tpe &&
        r("v").asInstanceOf[JNum].v.toDouble == -999.0)
    assert(chg("insert").nonEmpty && chg("delete").nonEmpty &&
        chg("delete").map(_("_commit_version").asInstanceOf[JNum].v.toLong).min >
          chg("insert").map(_("_commit_version").asInstanceOf[JNum].v.toLong).min,
      s"the served change range must show the bad row arrive and the " +
        s"restore remove it: ${chgRows.filter(r =>
          r("k").asInstanceOf[JNum].v.toLong == 7L)}")
    println(s"DRIVE storage-verbs: restore@v$vGood over HTTP ok, clone 60 rows, " +
      s"history+detail+asOf-data+changes routes ok")

    // 7. the text pipeline's terminal sink: pack the sf0.001 corpus into
    // a managed shard table and read the manifest back — the packed
    // layout every training run consumes, landing through the same merge
    // machinery the fact tables use.
    val packTable = s"$root/pack/t"
    val packedSrcs = graft.operators.PackWriter.write(
      spark, "/root/testdata/sf0.001", packTable)
    val packed = graft.batch.Upsert.readCommitted(spark, packTable, "source")
    val nShards = packed.count()
    val fullShards = packed.filter(col("n_tokens") ===
      lit(graft.operators.PackWriter.SeqLen.toLong)).count()
    assert(nShards > 0 && packedSrcs.nonEmpty,
      s"pack must write shards: $nShards over $packedSrcs")
    assert(fullShards >= nShards - packedSrcs.size,
      "every shard but each source's tail must be exactly L tokens")
    println(s"DRIVE pack: $nShards shards ($fullShards full) across " +
      s"${packedSrcs.size} sources at $packTable")

    // 8. the heartbeat follower end-to-end (the r18 tick-resilience flake
    // class, caught here instead of in a full-suite run): a StreamingPack
    // query follows a CHURNING managed docs table, is killed mid-churn,
    // drained by hand, restarted, churned again — and the shards must
    // converge to a from-scratch pack, with no stream state beyond the
    // shard table's own cursor.
    val hbDocs = s"$root/hbdocs"; val hbShard = s"$root/hbshard"
    def hbWave(from: Int, n: Int): Unit =
      graft.batch.Upsert.mergeByKey(spark, hbDocs,
        (from until from + n).map(i =>
          ("hb", i.toLong, s"t${i}a t${i}b t${i}c"))
          .toDF("source", "doc_id", "text"),
        "source", Seq("doc_id"))
    hbWave(0, 40)
    val hbQ = graft.streaming.StreamingPack.start(
      spark, hbDocs, "source", hbShard, intervalMs = 150L)
    try (1 to 4).foreach { k => hbWave(k * 40, 40); Thread.sleep(150) }
    finally hbQ.stop() // killed mid-churn: an in-flight tick may leave the
                      // applyingTo marker — the next drain must recover
    hbWave(200, 40) // appends land while NO follower is running
    graft.streaming.StreamingPack.drainAvailable(
      spark, hbDocs, "source", hbShard)
    val hbQ2 = graft.streaming.StreamingPack.start(
      spark, hbDocs, "source", hbShard, intervalMs = 150L)
    try {
      hbWave(240, 40)
      val expected = 280L * 3L
      val deadline = System.currentTimeMillis() + 60000L
      var held = -1L
      while (held != expected && System.currentTimeMillis() < deadline) {
        Thread.sleep(250L)
        // the shard table is being rewritten by the LIVE heartbeat: a
        // committed read can race a tick's install at execution time —
        // the documented loud retryable contract (readCommitted under
        // churn). This convergence loop IS the retry, so a transient
        // read failure is just "not converged yet" (step 9's viewFresh
        // loop already does exactly this; unwrapped, one race killed
        // the whole Drive run).
        held = scala.util.Try(
          graft.batch.Upsert.readCommitted(spark, hbShard, "source")
            .agg(coalesce(sum("n_tokens"), lit(0L))).head().getLong(0))
          .recover { case e =>
            // log EVERY swallowed throwable: only the read-under-churn
            // race is expected here, and a real failure (missing table,
            // analysis error) must not masquerade as slow convergence
            // until the deadline's misleading assert
            System.err.println(
              s"[drive] heartbeat read retry: ${e.getClass.getSimpleName}: " +
                s"${e.getMessage}")
            -1L
          }.get
      }
      assert(held == expected,
        s"heartbeat shards must converge to the corpus: $held != $expected")
    } finally hbQ2.stop()
    val hbTruth = s"$root/hbtruth"
    graft.operators.PackWriter.sync(spark, hbDocs, "source", hbTruth)
    val manifestCols = Seq("source", "seq_id", "toks", "n_docs",
      "n_full_docs", "n_tokens", "first_doc", "last_doc")
    val hbGot = graft.batch.Upsert.readCommitted(spark, hbShard, "source")
      .select(manifestCols.map(col): _*)
    val hbWant = graft.batch.Upsert.readCommitted(spark, hbTruth, "source")
      .select(manifestCols.map(col): _*)
    assert(hbGot.exceptAll(hbWant).isEmpty && hbWant.exceptAll(hbGot).isEmpty,
      "restarted heartbeat shards must equal a from-scratch pack")
    println("DRIVE heartbeat-pack: killed mid-churn, hand-drained, " +
      "restarted — shards ≡ from-scratch pack")

    // 9. the OTHER heartbeat follower end-to-end (StreamingView shares
    // StreamingPack's tick-retry machinery — the r18 flake proved the
    // two followers share a failure class, so both get the
    // kill/drain/restart recipe): a view-maintenance query follows a
    // CHURNING source, is killed mid-churn, maintained BY HAND,
    // restarted, churned again — and the view must equal a from-scratch
    // aggregation of the source. The only state is the view's own
    // basis-pinned cursor: no stream checkpoint took part.
    val svSrc = s"$root/svsrc"; val svView = s"$root/svview"
    def svWave(from: Int, n: Int): Unit =
      graft.batch.Upsert.mergeByKey(spark, svSrc,
        (from until from + n).map(i =>
          ("d" + (i % 7), "c" + (i % 3), i.toLong, (i * 3 + 1).toLong))
          .toDF("day", "cat", "k", "qty"),
        "day", Seq("k"))
    svWave(0, 60)
    graft.batch.IncrementalView.register(spark, svView, svSrc, "day",
      Seq("day", "cat"), Seq("qty"), "day")
    val svQ = graft.streaming.StreamingView.start(
      spark, svView, intervalMs = 150L)
    try (1 to 4).foreach { k => svWave(k * 60, 60); Thread.sleep(150) }
    finally { svQ.stop(); svQ.awaitTermination(30000) } // killed mid-churn
    svWave(300, 60) // churn lands while NO follower is running
    graft.streaming.StreamingView.drainAvailable(spark, svView) // by hand
    val svQ2 = graft.streaming.StreamingView.start(
      spark, svView, intervalMs = 150L)
    try {
      svWave(360, 60)
      def viewFresh(): Boolean = {
        val cols = Seq("day", "cat", "n_rows", "sum_qty", "nn_qty")
        val got = graft.batch.Upsert.readCommitted(spark, svView, "day")
          .select(cols.map(col): _*)
        val want = graft.batch.IncrementalView.aggregateOf(
          graft.batch.Upsert.readCommitted(spark, svSrc, "day"),
          Seq("day", "cat"), Seq("qty")).select(cols.map(col): _*)
        got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty
      }
      val svDeadline = System.currentTimeMillis() + 60000L
      var svFresh = false
      while (!svFresh && System.currentTimeMillis() < svDeadline) {
        Thread.sleep(250L)
        svFresh = scala.util.Try(viewFresh()).getOrElse(false)
      }
      assert(svFresh,
        "restarted view heartbeat must converge to the from-scratch " +
          "aggregation of the churned source")
    } finally { svQ2.stop(); svQ2.awaitTermination(30000) }
    println("DRIVE heartbeat-view: killed mid-churn, hand-maintained, " +
      "restarted — view ≡ from-scratch aggregation")
    println("DRIVE OK")
    api.stop()
    svc.shutdown()
    spark.stop()
  }
}
