package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream // moved in Spark 4.1
import org.apache.spark.sql.functions._

import graft.streaming._

/** End-to-end streaming behavior (the [X] rows of SURVEY.md §2.9): ingest
  * with checkpoint-resume, complete-mode dashboard equivalence, watermark
  * late-data drop, stream dedup, custom sessionization, lifecycle guard. */
class StreamingSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // A transaction subset wide enough for realtimeDashboard.
  case class TxLite(
      transaction_id: String, event_timestamp: Timestamp, customer_id: String,
      category: String, total_amount: Double, transaction_status: String,
      is_fraudulent: Option[Boolean])

  test("ingest: JSON drop-dir to partitioned parquet, checkpoint-resume without dupes") {
    val (drop, table, ckpt) = (tmp("drop"), tmp("table"), tmp("ckpt"))
    def writeFile(name: String, lines: Seq[String]): Unit =
      Files.write(java.nio.file.Paths.get(drop, name),
        String.join("\n", lines: _*).getBytes)

    def tx(id: String, ts: String) =
      s"""{"transaction_id":"$id","event_timestamp":"$ts","customer_id":"C1",
          "product_id":"P1","product_name":"W","category":"electronics",
          "quantity":1,"unit_price":10.0,"total_amount":10.0,"currency":"USD",
          "payment_method":"upi","transaction_status":"completed",
          "channel":"web","region":"west","city":"Pune"}""".replaceAll("\n\\s*", "")

    writeFile("b1.json", Seq(
      tx("t1", "2026-01-05 10:00:00"), tx("t2", "2026-01-06 11:00:00")))
    val q1 = StreamingIngest.start(spark, drop, table, ckpt)
    q1.processAllAvailable(); q1.stop()

    val read1 = StreamingIngest.readTable(spark, table)
    assert(read1.count() == 2)
    assert(read1.select("event_date").distinct().count() == 2) // partition col survives round-trip
    assert(new java.io.File(table).list().exists(_.startsWith("event_date=")))

    // restart on the same checkpoint with one new file: only the delta lands
    writeFile("b2.json", Seq(tx("t3", "2026-01-06 12:00:00")))
    val q2 = StreamingIngest.start(spark, drop, table, ckpt)
    q2.processAllAvailable(); q2.stop()
    val read2 = StreamingIngest.readTable(spark, table)
    assert(read2.count() == 3)
    assert(read2.select("transaction_id").distinct().count() == 3)
  }

  test("sink compaction: fewer files, identical rows, checkpoint-resume intact") {
    val (drop, table, ckpt) = (tmp("cdrop"), tmp("ctable"), tmp("cckpt"))
    def writeFile(name: String, lines: Seq[String]): Unit =
      Files.write(java.nio.file.Paths.get(drop, name),
        String.join("\n", lines: _*).getBytes)
    def tx(id: String, ts: String) =
      s"""{"transaction_id":"$id","event_timestamp":"$ts","customer_id":"C1",
          "product_id":"P1","product_name":"W","category":"electronics",
          "quantity":1,"unit_price":10.0,"total_amount":10.0,"currency":"USD",
          "payment_method":"upi","transaction_status":"completed",
          "channel":"web","region":"west","city":"Pune"}""".replaceAll("\n\\s*", "")

    // 6 drop files × maxFilesPerTrigger=1 → 6 micro-batches, each appending
    // one small file to each of the two date partitions
    (1 to 6).foreach { b =>
      writeFile(s"w$b.json", Seq(
        tx(s"t${b}a", "2026-02-01 10:00:00"), tx(s"t${b}b", "2026-02-02 11:00:00")))
    }
    val q1 = StreamingIngest.start(spark, drop, table, ckpt, maxFilesPerTrigger = 1)
    q1.processAllAvailable(); q1.stop()

    def partFiles(): Seq[String] =
      new java.io.File(table).listFiles().filter(_.getName.startsWith("event_date="))
        .flatMap(_.listFiles()).map(_.getName).filter(_.endsWith(".parquet")).toSeq
    def idSet(): Set[String] = StreamingIngest.readTable(spark, table)
      .select("transaction_id").collect().map(_.getString(0)).toSet

    val before = idSet()
    assert(before.size == 12 && partFiles().size == 12)

    val report = SinkCompaction.compact(spark, table, minFilesToCompact = 2)
    assert(report.partitionsCompacted == 2 && report.filesBefore == 12)
    // replaced files persist as orphans until vacuum's retention passes
    // (the reader grace period) — readers that resolved the pre-swap log
    // can still finish their scans
    assert(partFiles().size == 14, s"12 orphans + 2 rewrites: ${partFiles()}")
    assert(idSet() == before)
    SinkCompaction.vacuum(spark, table, minAgeMs = 0)
    assert(partFiles().size == 2, s"expected 1 file per partition: ${partFiles()}")
    // readers still resolve through the commit log and see the same rows
    assert(idSet() == before)
    assert(StreamingIngest.readTable(spark, table)
      .select("event_date").distinct().count() == 2)

    // the batch-id ledger survived: resume on the same checkpoint, new wave
    // lands exactly once on top of the compacted table
    writeFile("w7.json", Seq(tx("t7a", "2026-02-01 12:00:00")))
    val q2 = StreamingIngest.start(spark, drop, table, ckpt, maxFilesPerTrigger = 1)
    q2.processAllAvailable(); q2.stop()
    val after = idSet()
    assert(after == before + "t7a", s"resume must append exactly t7a: $after")
  }

  test("sink compaction folds layout in: clustered rewrite prunes by footer " +
      "bounds, rows identical") {
    val (drop, table, ckpt) = (tmp("ldrop"), tmp("ltable"), tmp("lckpt"))
    def writeFile(name: String, lines: Seq[String]): Unit =
      Files.write(java.nio.file.Paths.get(drop, name),
        String.join("\n", lines: _*).getBytes)
    def tx(id: String, amount: Double) =
      s"""{"transaction_id":"$id","event_timestamp":"2026-03-01 10:00:00","customer_id":"C1",
          "product_id":"P1","product_name":"W","category":"electronics",
          "quantity":1,"unit_price":$amount,"total_amount":$amount,"currency":"USD",
          "payment_method":"upi","transaction_status":"completed",
          "channel":"web","region":"west","city":"Pune"}""".replaceAll("\n\\s*", "")

    // 8 micro-batches into ONE date partition, each interleaving a low and
    // a high amount — arrival order gives the files NO amount locality, so
    // every small file's [min,max] spans the whole domain
    (1 to 8).foreach { b =>
      writeFile(s"w$b.json", Seq(
        tx(s"lo$b", b.toDouble), tx(s"hi$b", 100.0 + b)))
    }
    val q = StreamingIngest.start(spark, drop, table, ckpt, maxFilesPerTrigger = 1)
    q.processAllAvailable(); q.stop()

    val partDir = new java.io.File(table).listFiles()
      .find(_.getName.startsWith("event_date=")).get
    def dataFiles() = partDir.listFiles()
      .filter(f => f.getName.endsWith(".parquet")).toSeq
    assert(dataFiles().size == 8)
    def idSet(): Set[String] = StreamingIngest.readTable(spark, table)
      .select("transaction_id").collect().map(_.getString(0)).toSet
    val before = idSet()
    assert(before.size == 16)

    // target ~half the partition's bytes per file → 2 clustered outputs
    val target = dataFiles().map(_.length).sum / 2 + 1
    val report = SinkCompaction.compact(spark, table,
      targetBytes = target, minFilesToCompact = 2,
      layoutCols = Seq("total_amount"))
    assert(report.partitionsCompacted == 1)
    SinkCompaction.vacuum(spark, table, minAgeMs = 0)
    assert(idSet() == before, "layout rewrite must be row-identical")

    // footer-stats probe: range clustering gives each output file a
    // DISJOINT amount slice — a pushed predicate on either half reads one
    // file where the pre-compaction layout read all 8
    val bounds = graft.core.LayoutOps
      .longColumnBounds(partDir.toString, "total_amount")
      .sortBy(_._2)
    assert(bounds.size == 2, s"expected 2 clustered files: $bounds")
    assert(bounds(0)._3 < bounds(1)._2,
      s"clustered files must cover disjoint amount ranges: $bounds")
    assert(graft.core.LayoutOps.scanFraction(bounds, 0L, 50L) == 0.5)
  }

  test("readers never observe a duplicate or partial view while the log swaps") {
    // Table with 12 small files across 2 partitions, compacted WITHOUT
    // vacuum: 12 orphan files + 2 rewrites sit on disk while the commit log
    // references only the 2 rewrites. A raw directory-listing fallback —
    // exactly what spark.read.parquet degrades to if it catches the
    // dir-missing instant of a log swap — would read 24 rows. Hammer that
    // window: republish the log 25× with the same TxnLog-bracketed publish
    // choreography compact uses, while reader threads loop on readTable.
    val (drop, table, ckpt) = (tmp("rdrop"), tmp("rtable"), tmp("rckpt"))
    def writeFile(name: String, lines: Seq[String]): Unit =
      Files.write(java.nio.file.Paths.get(drop, name),
        String.join("\n", lines: _*).getBytes)
    def tx(id: String, ts: String) =
      s"""{"transaction_id":"$id","event_timestamp":"$ts","customer_id":"C1",
          "product_id":"P1","product_name":"W","category":"electronics",
          "quantity":1,"unit_price":10.0,"total_amount":10.0,"currency":"USD",
          "payment_method":"upi","transaction_status":"completed",
          "channel":"web","region":"west","city":"Pune"}""".replaceAll("\n\\s*", "")
    (1 to 6).foreach { b =>
      writeFile(s"w$b.json", Seq(
        tx(s"t${b}a", "2026-02-01 10:00:00"), tx(s"t${b}b", "2026-02-02 11:00:00")))
    }
    val q1 = StreamingIngest.start(spark, drop, table, ckpt, maxFilesPerTrigger = 1)
    q1.processAllAvailable(); q1.stop()
    SinkCompaction.compact(spark, table, minFilesToCompact = 2)
    // precondition: the poisoned-fallback state is really on disk
    val dataFiles = new java.io.File(table).listFiles()
      .filter(_.getName.startsWith("event_date="))
      .flatMap(_.listFiles()).count(_.getName.endsWith(".parquet"))
    assert(dataFiles == 14, s"12 orphans + 2 rewrites expected, got $dataFiles")
    assert(spark.read.parquet(table).count() == 12, "log-resolving read")

    val logDir = new java.io.File(table, "_spark_metadata")
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val anomalies = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val readers = (1 to 2).map { i =>
      new Thread(() => {
        while (!stop.get()) {
          try {
            val c = StreamingIngest.readTable(spark, table).count()
            if (c != 12L) anomalies.add(s"reader$i saw $c rows")
          } catch { case e: Throwable => anomalies.add(s"reader$i threw $e") }
        }
      })
    }
    readers.foreach(_.start())
    try {
      (1 to 25).foreach { _ =>
        // capture the current log content, then swap in a byte-identical
        // copy — pure window-exercise, no semantic change
        val content = logDir.listFiles().filterNot(_.getName.startsWith("."))
          .map(f => f.getName -> Files.readAllBytes(f.toPath)).toMap
        val claim = graft.core.TxnLog.begin(spark, table, "compact", Set("*"),
          graft.core.TxnLog.currentVersion(spark, table))
        graft.core.AtomicWrite.publish(spark, logDir.toString) { tmpPath =>
          val out = new java.io.File(tmpPath)
          out.mkdirs()
          content.foreach { case (name, bytes) =>
            Files.write(new java.io.File(out, name).toPath, bytes)
          }
        }
        graft.core.TxnLog.end(spark, table, claim)
      }
    } finally {
      stop.set(true); readers.foreach(_.join())
    }
    assert(anomalies.isEmpty, s"versioned reads must stay consistent: $anomalies")
    // vacuum after the readers are done reclaims the orphans
    val vac = SinkCompaction.vacuum(spark, table, minAgeMs = 0)
    assert(vac.filesRemoved == 12, s"orphans reclaimed: $vac")
    assert(StreamingIngest.readTable(spark, table).count() == 12)
  }

  test("compaction orphans get a fresh vacuum grace period; crashed marks don't lock readers") {
    val (drop, table, ckpt) = (tmp("gdrop"), tmp("gtable"), tmp("gckpt"))
    def writeFile(name: String, lines: Seq[String]): Unit =
      Files.write(java.nio.file.Paths.get(drop, name),
        String.join("\n", lines: _*).getBytes)
    def tx(id: String) =
      s"""{"transaction_id":"$id","event_timestamp":"2026-02-01 10:00:00",
          "customer_id":"C1","product_id":"P1","product_name":"W",
          "category":"electronics","quantity":1,"unit_price":10.0,
          "total_amount":10.0,"currency":"USD","payment_method":"upi",
          "transaction_status":"completed","channel":"web","region":"west",
          "city":"Pune"}""".replaceAll("\n\\s*", "")
    (1 to 4).foreach(b => writeFile(s"w$b.json", Seq(tx(s"t$b"))))
    val q = StreamingIngest.start(spark, drop, table, ckpt, maxFilesPerTrigger = 1)
    q.processAllAvailable(); q.stop()

    // backdate every data file by 2 h — files written long before the
    // compaction, exactly the shape whose "grace period" used to be vacuous
    val part = new java.io.File(table, "event_date=2026-02-01")
    val dataFiles = part.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(dataFiles.length == 4)
    val old = System.currentTimeMillis() - 2 * 3600 * 1000
    dataFiles.foreach(f => assert(f.setLastModified(old)))

    SinkCompaction.compact(spark, table, minFilesToCompact = 2)
    // a 1-hour retention must KEEP the just-orphaned (2-hour-old) files:
    // vacuum ages by mtime and compaction touched them at replacement time
    val kept = SinkCompaction.vacuum(spark, table, minAgeMs = 3600 * 1000)
    assert(kept.filesRemoved == 0,
      s"orphan grace period must start at replacement, not file creation: $kept")
    assert(StreamingIngest.readTable(spark, table).count() == 4)

    // a maintenance job hard-killed between begin and end must not lock
    // readers out for the 30 s staleness horizon — readTable's patience
    // window (5 s) expires and the read proceeds
    graft.core.TxnLog.begin(spark, table, "compact", Set("*"),
      graft.core.TxnLog.currentVersion(spark, table))
    val t0 = System.currentTimeMillis()
    assert(StreamingIngest.readTable(spark, table).count() == 4)
    val waited = System.currentTimeMillis() - t0
    assert(waited < 20000, s"reader blocked ${waited} ms on a crashed mark")

    // DRY RUN (Delta's `VACUUM … DRY RUN`): the same scan reports the 4
    // orphans with their paths and removes nothing
    val preview = SinkCompaction.vacuum(spark, table, minAgeMs = 0, dryRun = true)
    assert(preview.filesRemoved == 4 && preview.paths.size == 4, s"$preview")
    assert(preview.paths.forall(p => new java.io.File(p).exists),
      "a dry run must not delete")
    assert(StreamingIngest.readTable(spark, table).count() == 4)

    val gone = SinkCompaction.vacuum(spark, table, minAgeMs = 0)
    assert(gone.filesRemoved == 4)
    assert(gone.paths.toSet == preview.paths.toSet,
      "the dry run must have previewed exactly what the real vacuum removed")
    assert(SinkCompaction.vacuum(spark, table, minAgeMs = 0, dryRun = true)
      .filesRemoved == 0, "post-vacuum preview is clean")
  }

  test("sink compaction across a .compact log boundary (≥10 micro-batches)") {
    // 12 micro-batches → the sink's own log compaction fires at batch 9
    // (default compactInterval 10), so the log is [9.compact, 10, 11] — the
    // carrier-at-boundary rewrite path, distinct from the all-deltas case.
    val (drop, table, ckpt) = (tmp("bdrop"), tmp("btable"), tmp("bckpt"))
    def writeFile(name: String, lines: Seq[String]): Unit =
      Files.write(java.nio.file.Paths.get(drop, name),
        String.join("\n", lines: _*).getBytes)
    def tx(id: String, ts: String) =
      s"""{"transaction_id":"$id","event_timestamp":"$ts","customer_id":"C1",
          "product_id":"P1","product_name":"W","category":"electronics",
          "quantity":1,"unit_price":10.0,"total_amount":10.0,"currency":"USD",
          "payment_method":"upi","transaction_status":"completed",
          "channel":"web","region":"west","city":"Pune"}""".replaceAll("\n\\s*", "")

    (1 to 12).foreach { b =>
      writeFile(f"w$b%02d.json", Seq(tx(f"t$b%02d", "2026-03-01 10:00:00")))
    }
    val q1 = StreamingIngest.start(spark, drop, table, ckpt, maxFilesPerTrigger = 1)
    q1.processAllAvailable(); q1.stop()
    val logNames = new java.io.File(table, "_spark_metadata").list().toSet
    assert(logNames.contains("9.compact"), s"precondition: $logNames")

    def idSet(): Set[String] = StreamingIngest.readTable(spark, table)
      .select("transaction_id").collect().map(_.getString(0)).toSet
    val before = idSet()
    assert(before.size == 12)

    val report = SinkCompaction.compact(spark, table, minFilesToCompact = 2)
    assert(report.filesBefore == 12 && report.filesAfter == 1)
    assert(idSet() == before, "rows must survive the boundary rewrite")
    // the rewritten log keeps the compact carrier + delta stubs to batch 11
    val newNames = new java.io.File(table, "_spark_metadata").list().toSet
      .filterNot(_.startsWith(".")) // drop local-FS .crc siblings
    assert(newNames == Set("9.compact", "10", "11"), s"log shape: $newNames")

    // resume appends batch 12 exactly once on the surgically-rewritten log
    writeFile("w13.json", Seq(tx("t13", "2026-03-01 11:00:00")))
    val q2 = StreamingIngest.start(spark, drop, table, ckpt, maxFilesPerTrigger = 1)
    q2.processAllAvailable(); q2.stop()
    assert(idSet() == before + "t13")
    // and the sink's NEXT own compaction (batch 19) still works: 7 more waves
    (14 to 20).foreach { b =>
      writeFile(s"w$b.json", Seq(tx(s"t$b", "2026-03-01 12:00:00")))
    }
    val q3 = StreamingIngest.start(spark, drop, table, ckpt, maxFilesPerTrigger = 1)
    q3.processAllAvailable(); q3.stop()
    assert(idSet().size == 20, s"got ${idSet().size}")
    assert(new java.io.File(table, "_spark_metadata").list().toSet.contains("19.compact"),
      "the sink must be able to compact its log again after surgery")
  }

  test("sink vacuum: removes uncommitted debris, keeps committed files and young files") {
    val (drop, table, ckpt) = (tmp("vdrop"), tmp("vtable"), tmp("vckpt"))
    def tx(id: String) =
      s"""{"transaction_id":"$id","event_timestamp":"2026-04-01 10:00:00","customer_id":"C1",
          "product_id":"P1","product_name":"W","category":"electronics",
          "quantity":1,"unit_price":10.0,"total_amount":10.0,"currency":"USD",
          "payment_method":"upi","transaction_status":"completed",
          "channel":"web","region":"west","city":"Pune"}""".replaceAll("\n\\s*", "")
    Files.write(java.nio.file.Paths.get(drop, "w1.json"), Seq(tx("t1"), tx("t2")).mkString("\n").getBytes)
    val q = StreamingIngest.start(spark, drop, table, ckpt)
    q.processAllAvailable(); q.stop()

    // plant crash debris: an uncommitted data file (micro-batch died before
    // its log append) and an orphaned compaction temp dir
    val part = new java.io.File(table).listFiles().filter(_.getName.startsWith("event_date=")).head
    val straY = new java.io.File(part, "part-99999-deadbeef-uncommitted.snappy.parquet")
    Files.copy(part.listFiles().filter(_.getName.endsWith(".parquet")).head.toPath, straY.toPath)
    val tmpDir = new java.io.File(table, ".compact-dead")
    tmpDir.mkdir()
    Files.write(new java.io.File(tmpDir, "junk").toPath, "x".getBytes)
    // the location compact() actually writes its rewrite output: INSIDE the
    // partition dir — a kill mid-rewrite orphans it there
    val partTmp = new java.io.File(part, ".compact-died-mid-rewrite")
    partTmp.mkdir()
    Files.write(new java.io.File(partTmp, "part-00000").toPath, "y".getBytes)

    val before = StreamingIngest.readTable(spark, table)
      .select("transaction_id").collect().map(_.getString(0)).toSet
    assert(before == Set("t1", "t2"))

    // young debris survives the safety horizon…
    val kept = SinkCompaction.vacuum(spark, table, minAgeMs = 3600 * 1000)
    assert(kept.filesRemoved == 0 && kept.dirsRemoved == 0)
    assert(straY.exists && tmpDir.exists && partTmp.exists)

    // …and is collected once past it (stream stopped ⇒ age 0 is safe here)
    val r = SinkCompaction.vacuum(spark, table, minAgeMs = 0)
    assert(r.filesRemoved == 1 && r.dirsRemoved == 2 && r.bytesRemoved > 0)
    assert(!straY.exists && !tmpDir.exists && !partTmp.exists)
    // committed files untouched, table reads identically
    assert(StreamingIngest.readTable(spark, table)
      .select("transaction_id").collect().map(_.getString(0)).toSet == before)
  }

  test("maintenance guards: crashed log swap recovers; interval mismatch fails loud") {
    // crashed-swap recovery: retire the log exactly as a kill between the
    // two swap renames would leave it, then any maintenance entry restores it
    val (drop, table, ckpt) = (tmp("gdrop"), tmp("gtable"), tmp("gckpt"))
    def tx(id: String) =
      s"""{"transaction_id":"$id","event_timestamp":"2026-05-01 10:00:00","customer_id":"C1",
          "product_id":"P1","product_name":"W","category":"electronics",
          "quantity":1,"unit_price":10.0,"total_amount":10.0,"currency":"USD",
          "payment_method":"upi","transaction_status":"completed",
          "channel":"web","region":"west","city":"Pune"}""".replaceAll("\n\\s*", "")
    Files.write(java.nio.file.Paths.get(drop, "w1.json"), tx("t1").getBytes)
    val q = StreamingIngest.start(spark, drop, table, ckpt)
    q.processAllAvailable(); q.stop()
    val log = new java.io.File(table, "_spark_metadata")
    assert(log.renameTo(new java.io.File(table, ".old-_spark_metadata-deadbeef")))
    assert(!log.exists)
    val r = SinkCompaction.vacuum(spark, table, minAgeMs = 0) // entry repairs first
    assert(log.exists, "vacuum must restore a crashed log swap before collecting")
    assert(r.filesRemoved == 0)
    assert(StreamingIngest.readTable(spark, table).count() == 1)

    // interval mismatch: a .compact beyond the expected boundary must abort,
    // not silently treat those batches as invisible (vacuum would delete them)
    val fake = tmp("fakesink")
    val flog = new java.io.File(fake, "_spark_metadata")
    flog.mkdirs()
    Files.write(new java.io.File(flog, "4.compact").toPath, "v1".getBytes) // writer interval 5
    Files.write(new java.io.File(flog, "5").toPath, "v1".getBytes)
    Files.write(new java.io.File(flog, "6").toPath, "v1".getBytes)
    val e = intercept[IllegalStateException](SinkCompaction.vacuum(spark, fake, minAgeMs = 0))
    assert(e.getMessage.contains("compactInterval"), e.getMessage)

    // a missing version inside the scan range is log corruption — also loud
    val fake2 = tmp("fakesink2")
    val flog2 = new java.io.File(fake2, "_spark_metadata")
    flog2.mkdirs()
    Files.write(new java.io.File(flog2, "3").toPath, "v1".getBytes) // 0..2 absent
    val e2 = intercept[IllegalStateException](SinkCompaction.vacuum(spark, fake2, minAgeMs = 0))
    assert(e2.getMessage.contains("missing version"), e2.getMessage)
  }

  test("ingest restart repairs a crashed log swap instead of resetting the ledger") {
    val (drop, table, ckpt) = (tmp("rdrop"), tmp("rtable"), tmp("rckpt"))
    def tx(id: String) =
      s"""{"transaction_id":"$id","event_timestamp":"2026-05-02 10:00:00","customer_id":"C1",
          "product_id":"P1","product_name":"W","category":"electronics",
          "quantity":1,"unit_price":10.0,"total_amount":10.0,"currency":"USD",
          "payment_method":"upi","transaction_status":"completed",
          "channel":"web","region":"west","city":"Pune"}""".replaceAll("\n\\s*", "")
    Files.write(java.nio.file.Paths.get(drop, "w1.json"), tx("t1").getBytes)
    val q1 = StreamingIngest.start(spark, drop, table, ckpt)
    q1.processAllAvailable(); q1.stop()

    // a compaction killed between its two log-swap renames: log retired
    val log = new java.io.File(table, "_spark_metadata")
    assert(log.renameTo(new java.io.File(table, ".old-_spark_metadata-cafe0001")))

    // restarting the INGEST (not a maintenance op) must repair the log
    // first — the sink would otherwise create a fresh EMPTY ledger: prior
    // rows invisible to log-resolving readers, then vacuumed as orphans
    Files.write(java.nio.file.Paths.get(drop, "w2.json"), tx("t2").getBytes)
    val q2 = StreamingIngest.start(spark, drop, table, ckpt)
    q2.processAllAvailable(); q2.stop()
    assert(log.exists, "ingest restart must restore the retired commit log")
    val ids = StreamingIngest.readTable(spark, table)
      .select("transaction_id").collect().map(_.getString(0)).sorted.toSeq
    assert(ids == Seq("t1", "t2"), s"no loss, no replay across the repair: $ids")
  }

  test("foreachBatch upsert: exactly-once across a restart replay (txn marker skip)") {
    import spark.implicits._
    val (drop, table, ckpt) = (tmp("udrop"), tmp("utable"), tmp("uckpt"))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "day STRING, k STRING, v DOUBLE")
    def startStream() =
      spark.readStream.schema(schema).json(drop)
        .writeStream
        .foreachBatch(
          StreamingUpsert.mergeBatch(spark, table, "day", Seq("k"), "ingest-upsert") _)
        .option("checkpointLocation", ckpt)
        .start()

    Files.write(java.nio.file.Paths.get(drop, "w1.json"),
      Seq("""{"day":"2026-01-01","k":"a","v":1.0}""",
          """{"day":"2026-01-01","k":"b","v":2.0}""").mkString("\n").getBytes)
    val q1 = startStream()
    q1.processAllAvailable(); q1.stop()
    assert(spark.read.parquet(table).count() == 2)
    val vAfterBatch0 = graft.core.TxnLog.currentVersion(spark, table)

    // a restart after a crash BETWEEN the foreachBatch body and the
    // checkpoint acknowledgment replays the whole batch: simulate by
    // removing the batch's commit record, the standard Structured
    // Streaming at-least-once shape
    java.nio.file.Files.delete(java.nio.file.Paths.get(ckpt, "commits", "0"))
    // the local-FS checksum sibling must go too, or the replayed commit's
    // rename-into-place fails on the stale .crc
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(ckpt, "commits", ".0.crc"))
    val q2 = startStream()
    q2.processAllAvailable(); q2.stop()
    assert(spark.read.parquet(table).count() == 2, "replayed batch must not duplicate")
    assert(graft.core.TxnLog.currentVersion(spark, table) == vAfterBatch0,
      "an absorbed batch must be SKIPPED on replay — no new versions, no file churn")

    // crash BEFORE the marker (merge applied, marker not yet committed):
    // the replay re-merges; MERGE idempotence makes the effect exactly-once
    val batch1 = Seq(("2026-01-01", "a", 10.0), ("2026-01-02", "c", 3.0))
      .toDF("day", "k", "v")
    graft.batch.Upsert.mergeByKey(spark, table, batch1, "day", Seq("k")) // crashed attempt
    StreamingUpsert.mergeBatch(spark, table, "day", Seq("k"), "ingest-upsert")(batch1, 1L)
    val rows = spark.read.parquet(table)
      .select("day", "k", "v").as[(String, String, Double)].collect().toSet
    assert(rows == Set(
      ("2026-01-01", "a", 10.0), ("2026-01-01", "b", 2.0), ("2026-01-02", "c", 3.0)),
      s"re-merged batch must converge to exactly-once effect: $rows")
    // and now that batch 1 is marked, a further replay is a pure no-op
    val vMarked = graft.core.TxnLog.currentVersion(spark, table)
    StreamingUpsert.mergeBatch(spark, table, "day", Seq("k"), "ingest-upsert")(batch1, 1L)
    assert(graft.core.TxnLog.currentVersion(spark, table) == vMarked)
  }

  test("dashboard: complete-mode equivalent via foreachBatch atomic publish") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TxLite]
    val out = tmp("dash")
    val ckpt = tmp("dashckpt")
    val q = StreamingDashboard.start(spark, mem.toDF(), out, ckpt)
    try {
      mem.addData(
        TxLite("t1", ts("2026-01-05 10:00:30"), "C1", "electronics", 10.0, "completed", Some(false)),
        TxLite("t2", ts("2026-01-05 10:01:10"), "C2", "electronics", 20.0, "completed", Some(true)))
      q.processAllAvailable()
      val snap1 = StreamingDashboard.readLatest(spark, out)
      assert(snap1.count() > 0)
      val total1 = snap1.agg(sum("txn_count")).head().getLong(0)

      mem.addData(
        TxLite("t3", ts("2026-01-05 10:02:00"), "C3", "books", 5.0, "pending", None))
      q.processAllAvailable()
      val snap2 = StreamingDashboard.readLatest(spark, out)
      // complete-mode: snapshot reflects ALL data, not just the new batch
      assert(snap2.agg(sum("txn_count")).head().getLong(0) > total1)
      assert(snap2.filter(col("category") === "books").count() > 0)
      assert(snap2.filter(col("fraud_alerts") > 0).count() > 0)
    } finally q.stop()
  }

  test("watermark: late events beyond horizon are dropped from append output") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TxLite]
    val agg = mem.toDF()
      .withWatermark("event_timestamp", "10 minutes")
      .groupBy(window(col("event_timestamp"), "5 minutes"), col("category"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("wmtest")
      .outputMode("append").start()
    try {
      mem.addData(TxLite("t1", ts("2026-01-05 10:01:00"), "C1", "a", 1.0, "completed", None))
      q.processAllAvailable()
      // advance watermark far past the first window
      mem.addData(TxLite("t2", ts("2026-01-05 11:00:00"), "C1", "a", 1.0, "completed", None))
      q.processAllAvailable()
      // late arrival for the long-closed 10:00 window: must be discarded
      mem.addData(TxLite("t3", ts("2026-01-05 10:01:30"), "C1", "a", 1.0, "completed", None))
      q.processAllAvailable()
      mem.addData(TxLite("t4", ts("2026-01-05 12:00:00"), "C1", "a", 1.0, "completed", None))
      q.processAllAvailable()
      val rows = spark.table("wmtest")
        .select(col("window.start").cast("string"), col("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows("2026-01-05 10:00:00") == 1L, s"late event must not resurrect the window: $rows")
    } finally q.stop()
  }

  test("stream dedup within watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TxLite]
    val deduped = StreamOps.dedupWithinWatermark(
      mem.toDF(), "event_timestamp", "10 minutes", Seq("transaction_id"))
    val q = deduped.writeStream.format("memory").queryName("deduptest")
      .outputMode("append").start()
    try {
      mem.addData(
        TxLite("dup", ts("2026-01-05 10:00:00"), "C1", "a", 1.0, "completed", None),
        TxLite("dup", ts("2026-01-05 10:00:05"), "C1", "a", 1.0, "completed", None),
        TxLite("uniq", ts("2026-01-05 10:00:10"), "C1", "a", 1.0, "completed", None))
      q.processAllAvailable()
      mem.addData( // same key again, still within the horizon
        TxLite("dup", ts("2026-01-05 10:01:00"), "C1", "a", 1.0, "completed", None))
      q.processAllAvailable()
      val ids = spark.table("deduptest").select("transaction_id")
        .collect().map(_.getString(0)).toSeq
      assert(ids.sorted == Seq("dup", "uniq"))
    } finally q.stop()
  }

  case class Doc(doc_id: Long, text: String, ts: Timestamp)

  test("clean stream: quality gate + fingerprint dedup within watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val cleaned = StreamOps.cleanDocStream(mem.toDF(), "ts", "10 minutes")
    val q = cleaned.writeStream.format("memory").queryName("cleantest")
      .outputMode("append").start()
    try {
      val good = "the quick brown fox jumps over a lazy dog in the sunny meadow today"
      mem.addData(
        Doc(1L, good, ts("2026-01-05 10:00:00")),
        // duplicate up to whitespace/case normalization: must dedup with doc 1
        Doc(2L, "  " + good.toUpperCase.toLowerCase + "  ", ts("2026-01-05 10:00:10")),
        // degenerate low-quality text: one token repeated -> filtered
        Doc(3L, Array.fill(40)("spam").mkString(" "), ts("2026-01-05 10:00:20")))
      q.processAllAvailable()
      val ids = spark.table("cleantest").select("doc_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids.size == 1 && (ids.head == 1L || ids.head == 2L),
        s"one survivor of the dup pair, spam filtered: $ids")
      // a distinct good doc in a later micro-batch still passes
      mem.addData(Doc(4L,
        "every valid sentence of fresh words keeps its own fingerprint and survives",
        ts("2026-01-05 10:01:00")))
      q.processAllAvailable()
      assert(spark.table("cleantest").count() == 2)
    } finally q.stop()
  }

  test("transformWithState: per-user running totals across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Spark 4's transformWithState requires the RocksDB state store.
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[StreamOps.SessionEvent]
      val totals = StreamOps.runningTotals(mem.toDS())
      val q = totals.writeStream.format("memory").queryName("twstest")
        .outputMode("update").start()
      try {
        mem.addData(
          StreamOps.SessionEvent(1L, ts("2026-01-05 10:00:00"), 1.5),
          StreamOps.SessionEvent(1L, ts("2026-01-05 10:01:00"), 2.5),
          StreamOps.SessionEvent(2L, ts("2026-01-05 10:00:30"), 10.0))
        q.processAllAvailable()
        mem.addData( // state must carry across micro-batches
          StreamOps.SessionEvent(1L, ts("2026-01-05 10:05:00"), 6.0))
        q.processAllAvailable()
        val last = spark.table("twstest")
          .groupBy("user_id")
          .agg(max("n_events").as("n"), max("value_sum").as("s"))
          .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
        assert(last(1L) == ((3L, 10.0)), s"user 1 totals: $last")
        assert(last(2L) == ((1L, 10.0)), s"user 2 totals: $last")
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("transformWithState: a real processing-time TTL starts and totals correctly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[StreamOps.SessionEvent]
      // A non-NONE TTL requires TimeMode.ProcessingTime — with TimeMode.None
      // Spark throws StatefulProcessorCannotAssignTTLInTimeMode at start.
      // The TTL is long enough that no state expires during the test, so the
      // totals still accumulate across micro-batches.
      val ttl = org.apache.spark.sql.streaming.TTLConfig(
        java.time.Duration.ofHours(1))
      val totals = StreamOps.runningTotals(mem.toDS(), ttl)
      val q = totals.writeStream.format("memory").queryName("twsttl")
        .outputMode("update").start()
      // Under TimeMode.ProcessingTime the engine schedules state-maintenance
      // micro-batches indefinitely, so processAllAvailable() never quiesces
      // (it livelocked a 30-minute run). Poll the sink with a deadline
      // instead, failing fast if the query itself dies.
      def awaitSink(pred: () => Boolean, what: String): Unit = {
        val deadline = System.currentTimeMillis() + 60000L
        while (!pred() && System.currentTimeMillis() < deadline) {
          q.exception.foreach(e => fail(s"query died waiting for $what", e))
          Thread.sleep(100)
        }
        assert(pred(), s"timed out waiting for $what")
      }
      def maxN(): Long = spark.table("twsttl")
        .agg(coalesce(max("n_events"), lit(0L))).head().getLong(0)
      try {
        mem.addData(
          StreamOps.SessionEvent(1L, ts("2026-01-05 10:00:00"), 1.5),
          StreamOps.SessionEvent(1L, ts("2026-01-05 10:01:00"), 2.5))
        awaitSink(() => maxN() >= 2L, "first micro-batch totals")
        mem.addData(StreamOps.SessionEvent(1L, ts("2026-01-05 10:05:00"), 6.0))
        awaitSink(() => maxN() >= 3L, "second micro-batch totals")
        val last = spark.table("twsttl")
          .groupBy("user_id")
          .agg(max("n_events").as("n"), max("value_sum").as("s"))
          .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
        assert(last(1L) == ((3L, 10.0)), s"user 1 totals with TTL: $last")
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("transformWithState timers: event-time timer closes the session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[StreamOps.SessionEvent]
      val sessions = StreamOps.sessionizeTws(mem.toDS())
      val q = sessions.writeStream.format("memory").queryName("twssess")
        .outputMode("append").start()
      try {
        mem.addData(
          StreamOps.SessionEvent(1L, ts("2026-01-05 10:00:00"), 1.0),
          StreamOps.SessionEvent(1L, ts("2026-01-05 10:02:00"), 2.0))
        q.processAllAvailable()
        assert(spark.table("twssess").isEmpty, "session still open, no emission")
        // event time jumps 1h ahead: watermark passes the registered timer
        mem.addData(StreamOps.SessionEvent(2L, ts("2026-01-05 11:00:00"), 9.0))
        q.processAllAvailable()
        mem.addData(StreamOps.SessionEvent(2L, ts("2026-01-05 11:00:01"), 1.0))
        q.processAllAvailable()
        val rows = spark.table("twssess")
          .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
            r.getTimestamp(2).toString, r.getLong(3), r.getDouble(4)))
        assert(rows.toSeq == Seq(
          (1L, "2026-01-05 10:00:00.0", "2026-01-05 10:07:00.0", 2L, 3.0)),
          s"timer must close user 1's session exactly once: ${rows.toSeq}")
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("sessionize: flatMapGroupsWithState closes sessions on gap timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamOps.SessionEvent]
    val sessions = StreamOps.sessionize(mem.toDS())
    val q = sessions.writeStream.format("memory").queryName("sesstest")
      .outputMode("append").start()
    try {
      mem.addData(
        StreamOps.SessionEvent(1L, ts("2026-01-05 10:00:00"), 1.0),
        StreamOps.SessionEvent(1L, ts("2026-01-05 10:02:00"), 2.0))
      q.processAllAvailable()
      // jump event time far ahead: watermark passes session timeout
      mem.addData(StreamOps.SessionEvent(2L, ts("2026-01-05 11:00:00"), 9.0))
      q.processAllAvailable()
      mem.addData(StreamOps.SessionEvent(2L, ts("2026-01-05 12:00:00"), 1.0))
      q.processAllAvailable()
      val rows = spark.table("sesstest")
        .select("user_id", "n_events", "value_sum", "start", "end").collect()
      val u1 = rows.find(_.getLong(0) == 1L)
      assert(u1.isDefined, s"user1 session must have closed: ${rows.mkString(";")}")
      assert(u1.get.getLong(1) == 2L && u1.get.getDouble(2) == 3.0)
      assert(u1.get.getTimestamp(4).getTime - ts("2026-01-05 10:02:00").getTime == 5 * 60 * 1000L)
    } finally q.stop()
  }

  case class Imp(ad_id: Long, imp_time: Timestamp)
  case class Clk(ad_id: Long, click_time: Timestamp)

  test("stream-stream join: watermarked interval join attributes clicks to impressions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[Imp]
    val clks = MemoryStream[Clk]
    // Both sides watermarked + a time-range condition bounds the join state
    // Spark must keep (the canonical scalable stream-stream join shape).
    val q = imps.toDF().as("i").withWatermark("imp_time", "10 minutes")
      .join(clks.toDF().as("c").withWatermark("click_time", "10 minutes"),
        col("i.ad_id") === col("c.ad_id") &&
          col("click_time") >= col("imp_time") &&
          col("click_time") <= col("imp_time") + expr("interval 5 minutes"))
      .select(col("i.ad_id"), col("imp_time"), col("click_time"))
      .writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()
    try {
      imps.addData(Imp(1L, ts("2026-01-05 10:00:00")), Imp(2L, ts("2026-01-05 10:00:00")))
      clks.addData(
        Clk(1L, ts("2026-01-05 10:03:00")),  // within 5 min → attributed
        Clk(2L, ts("2026-01-05 10:09:00")))  // beyond 5 min → dropped
      q.processAllAvailable()
      val rows = spark.table("ssjoin").select("ad_id").collect().map(_.getLong(0)).toSeq
      assert(rows == Seq(1L), s"only the in-window click joins: $rows")
    } finally q.stop()
  }

  test("lifecycle: single-flight guard and stop-all") {
    val lc = new QueryLifecycle
    val mk = () => spark.readStream.format("rate").option("rowsPerSecond", "1").load()
      .writeStream.format("noop").queryName("lc").start()
    val first = lc.start(Seq(mk()))
    assert(first.isRight && lc.isRunning)
    val second = lc.start(Seq(mk()))
    assert(second.isLeft, "second start must be refused while running")
    val stopped = lc.stopAll()
    assert(stopped.nonEmpty && !lc.isRunning)
    assert(lc.start(Seq(mk())).isRight) // restart allowed after stop
    lc.stopAll()
  }
}
