package graft

import java.nio.file.Files

import graft.core.TxnLog

/** Manifest mechanics: checkpoint-compacted probes, contiguous truncation,
  * honest wildcard semantics, and idempotence markers. */
class TxnLogSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def vFile(table: String, v: Long) =
    java.nio.file.Paths.get(table, "_graft_txn", f"v$v%020d.json")

  test("probes read checkpoint + tail, not every commit file (O(tail), Delta checkpoint design)") {
    val table = tmp("txn-ckpt")
    (1 to 25).foreach { i =>
      TxnLog.commit(spark, table, "upsert-end", Set(s"p$i"),
        TxnLog.currentVersion(spark, table))
    }
    // every CheckpointInterval-th commit wrote a checkpoint summarizing the
    // retained state ≤ its version
    val dir = new java.io.File(table, "_graft_txn")
    val ckpts = dir.list().filter(_.startsWith("checkpoint-v")).sorted
    assert(ckpts.nonEmpty, s"expected checkpoints among ${dir.list().toSeq}")
    assert(ckpts.last.contains(f"${20L}%020d"), s"latest checkpoint: ${ckpts.last}")

    // delete every commit file the checkpoint covers: if probes still see
    // the full history, they are reading the checkpoint, not the files
    (1L to 20L).foreach(v => java.nio.file.Files.delete(vFile(table, v)))
    val all = TxnLog.commitsSince(spark, table, 0L)
    assert(all.map(_.version) == (1L to 25L),
      s"checkpoint must carry the covered commits: ${all.map(_.version)}")
    assert(all.map(_.partitions) == (1 to 25).map(i => Set(s"p$i")),
      "checkpointed commits must round-trip content, not just versions")
    assert(TxnLog.currentVersion(spark, table) == 25L)
    // and the usual consumers still work on the mixed checkpoint+tail view
    assert(TxnLog.readerState(spark, table)._1 == 25L)
  }

  test("truncate keeps the retained range contiguous: an unclosed begin pins the horizon") {
    val table = tmp("txn-trunc")
    TxnLog.commit(spark, table, "upsert-end", Set("p0"),
      TxnLog.currentVersion(spark, table))
    // v2: a begin that never ends (crashed writer)
    val crashed = TxnLog.begin(spark, table, "upsert", Set("px"),
      TxnLog.currentVersion(spark, table))
    assert(crashed.version == 2L)
    (3 to 30).foreach { i =>
      TxnLog.commit(spark, table, "upsert-end", Set(s"p$i"),
        TxnLog.currentVersion(spark, table))
    }
    // keep=5 would drop v<25 — but dropping the unclosed v2 begin (or any
    // commit above it) would break snapshot resolution's floor soundness
    TxnLog.truncate(spark, table, keep = 5)
    val retained = TxnLog.commitsSince(spark, table, 0L).map(_.version)
    assert(retained.head <= 2L && retained.contains(2L),
      s"unclosed begin must survive truncation: $retained")
    // close it; now truncation proceeds past it
    TxnLog.end(spark, table, crashed)
    TxnLog.truncate(spark, table, keep = 5)
    val after = TxnLog.commitsSince(spark, table, 0L).map(_.version)
    assert(after.head > 2L, s"closed begin no longer pins the horizon: $after")
  }

  test("a crashed begin stops pinning truncation once a later end supersedes it") {
    val table = tmp("txn-supersede")
    // v1: a begin that never closes (hard-killed writer on partition px)
    val crashed = TxnLog.begin(spark, table, "upsert", Set("px"),
      TxnLog.currentVersion(spark, table))
    assert(crashed.version == 1L)
    // px is later merged successfully (the repair-then-merge path): the
    // crashed begin is now inert for snapshot resolution — a later end
    // rules every version at or above itself, and the > lastEnd filter
    // excludes the old begin below it
    TxnLog.commit(spark, table, "upsert-begin", Set("px"),
      TxnLog.currentVersion(spark, table))
    TxnLog.commit(spark, table, "upsert-end", Set("px"),
      TxnLog.currentVersion(spark, table), ref = Some(2L))
    (4 to 30).foreach { i =>
      TxnLog.commit(spark, table, "upsert-end", Set(s"p$i"),
        TxnLog.currentVersion(spark, table))
    }
    TxnLog.truncate(spark, table, keep = 5)
    val retained = TxnLog.commitsSince(spark, table, 0L).map(_.version)
    assert(retained.head > crashed.version,
      s"a superseded crashed begin must not pin the manifest forever: $retained")
  }

  test("an abort-closed begin pins truncation until a later end supersedes it") {
    val table = tmp("txn-abort-pin")
    // v1 begin, v2 abort WITH a surviving retained generation: the claim is
    // released for WRITERS, but snapshot resolution certifies the live dir
    // with END refs only — the abort's rollback crashed before consuming
    // the retained pre-image, so readers still route through the v1
    // generation. Truncating v1 away would make them fall back to the live
    // dir's failed write.
    val b = TxnLog.begin(spark, table, "upsert", Set("px"),
      TxnLog.currentVersion(spark, table))
    assert(b.version == 1L)
    val gen = java.nio.file.Paths.get(table, "_graft_history", "v1", "part=px")
    java.nio.file.Files.createDirectories(gen)
    java.nio.file.Files.write(gen.resolve("data.parquet"), Array[Byte](1))
    TxnLog.abort(spark, table, b)
    (3 to 30).foreach { i =>
      TxnLog.commit(spark, table, "upsert-end", Set(s"p$i"),
        TxnLog.currentVersion(spark, table))
    }
    TxnLog.truncate(spark, table, keep = 5)
    val retained = TxnLog.commitsSince(spark, table, 0L).map(_.version)
    assert(retained.contains(1L),
      s"abort-closed begin must survive truncation: $retained")
    // a later committed end of px supersedes it — resolution now routes
    // through that end, and the old begin stops pinning
    val u = TxnLog.begin(spark, table, "upsert", Set("px"),
      TxnLog.currentVersion(spark, table))
    TxnLog.end(spark, table, u)
    TxnLog.truncate(spark, table, keep = 5)
    val after = TxnLog.commitsSince(spark, table, 0L).map(_.version)
    assert(after.head > 1L, s"superseded abort-closed begin no longer pins: $after")
  }

  test("an abort-closed begin that retained nothing does not pin truncation") {
    val table = tmp("txn-abort-noop")
    // v1 begin, v2 abort, NO generation directory: the writer finished
    // without ever retaining — retain-first ordering proves nothing was
    // installed, so the live dir is the committed state and resolution
    // never routes through v1. This is the no-op deleteByKey shape: no
    // later end will EVER cover a partition value that does not exist, so
    // without the emptiness exemption this begin pins the horizon forever.
    val b = TxnLog.begin(spark, table, "upsert", Set("never-exists"),
      TxnLog.currentVersion(spark, table))
    assert(b.version == 1L)
    TxnLog.abort(spark, table, b)
    (3 to 30).foreach { i =>
      TxnLog.commit(spark, table, "upsert-end", Set(s"p$i"),
        TxnLog.currentVersion(spark, table))
    }
    TxnLog.truncate(spark, table, keep = 5)
    val retained = TxnLog.commitsSince(spark, table, 0L).map(_.version)
    assert(retained.head > 1L,
      s"a nothing-retained aborted begin must not pin the horizon: $retained")
    // an EMPTY generation directory (rollback consumed its contents but
    // crashed before removing the dir) is equally inert
    val b2 = TxnLog.begin(spark, table, "upsert", Set("also-never"),
      TxnLog.currentVersion(spark, table))
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(table, "_graft_history", s"v${b2.version}"))
    TxnLog.abort(spark, table, b2)
    (1 to 10).foreach { i =>
      TxnLog.commit(spark, table, "upsert-end", Set(s"q$i"),
        TxnLog.currentVersion(spark, table))
    }
    TxnLog.truncate(spark, table, keep = 5)
    val after = TxnLog.commitsSince(spark, table, 0L).map(_.version)
    assert(after.head > b2.version,
      s"an empty-generation aborted begin must not pin the horizon: $after")
  }

  test("recurring no-op deleteByKey runs do not ratchet the truncation horizon") {
    import graft.batch.Upsert
    import org.apache.spark.sql.functions._
    val table = tmp("txn-noop-delete")
    val spark2 = spark
    import spark2.implicits._
    // a real table with one committed partition
    Upsert.mergeByKey(spark, table,
      Seq(("a", 1L, 10.0)).toDF("day", "id", "v"), "day", Seq("day", "id"))
    // a recurring GDPR-style delete job keeps naming a partition that does
    // not exist (typo, or data already gone): each run is a no-op abort
    (1 to 3).foreach { _ =>
      Upsert.deleteByKey(spark, table,
        Seq(("zzz", 99L)).toDF("day", "id"), "day", Seq("day", "id"))
    }
    // pad the log, then truncate: the no-op aborts must not pin
    (1 to 30).foreach { i =>
      TxnLog.commit(spark, table, "upsert-end", Set(s"pad$i"),
        TxnLog.currentVersion(spark, table))
    }
    val tip = TxnLog.currentVersion(spark, table)
    TxnLog.truncate(spark, table, keep = 5)
    val retained = TxnLog.commitsSince(spark, table, 0L).map(_.version)
    assert(retained.head >= tip - 6,
      s"no-op delete aborts must not pin truncation (tip $tip): $retained")
    // and the table still reads correctly after truncation
    val rows = Upsert.readCommitted(spark, table, "day")
      .select("day", "id", "v").as[(String, Long, Double)].collect().toSet
    assert(rows == Set(("a", 1L, 10.0)))
  }

  test("a checkpoint whose read raced truncate cannot resurrect truncated commits") {
    val table = tmp("txn-ckpt-race")
    (1 to 30).foreach { i =>
      TxnLog.commit(spark, table, "upsert-end", Set(s"p$i"),
        TxnLog.currentVersion(spark, table))
    }
    // the racing checkpointer reads the retained state BEFORE the truncate…
    val stale = TxnLog.commitsSince(spark, table, 0L)
    assert(stale.map(_.version) == (1L to 30L))
    // …truncate then drops v<25 (and sweeps every checkpoint carrying them)…
    TxnLog.truncate(spark, table, keep = 5)
    assert(TxnLog.commitsSince(spark, table, 0L).map(_.version).head == 25L)
    // …and the checkpointer's create lands AFTER the sweep. Without the
    // post-create validation this resurrects v1-v24 for every future probe.
    val dir = new org.apache.hadoop.fs.Path(table, "_graft_txn")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    TxnLog.writeCheckpointFrom(fs, dir, 30L, stale)
    val all = TxnLog.commitsSince(spark, table, 0L).map(_.version)
    assert(all == (25L to 30L),
      s"stale checkpoint must not resurrect truncated commits: $all")
    assert(!new java.io.File(table, "_graft_txn").list()
      .exists(_.startsWith("checkpoint-")), "the stale checkpoint must self-delete")
  }

  test("a literal '*' partition value is a normal value, not a wildcard") {
    val table = tmp("txn-star")
    // writer A claims the partition whose VALUE is the string "*"
    val a = TxnLog.begin(spark, table, "upsert", Set("*"),
      TxnLog.currentVersion(spark, table))
    // a different value is not blocked by it
    val b = TxnLog.begin(spark, table, "upsert", Set("x"),
      TxnLog.currentVersion(spark, table))
    TxnLog.end(spark, table, b)
    // the same value IS blocked
    intercept[TxnLog.ConcurrentWriteException] {
      TxnLog.begin(spark, table, "upsert", Set("*"),
        TxnLog.currentVersion(spark, table))
    }
    TxnLog.end(spark, table, a)
    // a whole-table claim (the dedicated flag) blocks every value — both
    // the literal "*" and anything else
    val sweep = TxnLog.begin(spark, table, "compact", Set.empty,
      TxnLog.currentVersion(spark, table), all = true)
    intercept[TxnLog.ConcurrentWriteException] {
      TxnLog.begin(spark, table, "upsert", Set("*"),
        TxnLog.currentVersion(spark, table))
    }
    intercept[TxnLog.ConcurrentWriteException] {
      TxnLog.begin(spark, table, "upsert", Set("y"),
        TxnLog.currentVersion(spark, table))
    }
    TxnLog.end(spark, table, sweep)
  }

  test("probes stay consistent under concurrent writers, checkpoints, and truncation") {
    val table = tmp("txn-hammer")
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val writers = (0 until 8).map { t =>
      new Thread(() => {
        try (0 until 25).foreach { _ =>
          val c = TxnLog.begin(spark, table, "upsert", Set(s"p$t"),
            TxnLog.currentVersion(spark, table))
          TxnLog.end(spark, table, c)
        } catch { case e: Throwable => errs.add(s"writer $t: $e") }
      })
    }
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() => {
      while (!stop.get()) {
        try {
          // checkpoint + tail must union into a duplicate-free, ordered,
          // gap-free-above-the-floor view at every instant — including
          // while a checkpoint write or a truncation is mid-flight
          val vs = TxnLog.commitsSince(spark, table, 0L).map(_.version)
          if (vs != vs.sorted) errs.add(s"unordered: $vs")
          if (vs.distinct.size != vs.size) errs.add(s"duplicates: $vs")
          if (vs.nonEmpty && vs != (vs.head to vs.last))
            errs.add(s"gap in retained range: $vs")
        } catch { case e: Throwable => errs.add(s"reader: $e") }
      }
    })
    val truncater = new Thread(() => {
      while (!stop.get()) {
        try { TxnLog.truncate(spark, table, keep = 50); Thread.sleep(100) }
        catch { case e: Throwable => errs.add(s"truncater: $e") }
      }
    })
    reader.start(); truncater.start()
    writers.foreach(_.start()); writers.foreach(_.join())
    stop.set(true); reader.join(); truncater.join()
    assert(errs.isEmpty, s"hammer anomalies: ${errs.peek()}")
    // every begin got its end (disjoint partitions never conflict), the
    // tip reflects all 400 commits, and the retained window is bounded
    assert(TxnLog.currentVersion(spark, table) == 400L)
    val retained = TxnLog.commitsSince(spark, table, 0L)
    val closed = retained.flatMap(_.ref).toSet
    // truncation is contiguous from the bottom and an end always outranks
    // its begin, so a retained begin implies its end is retained too
    val openBegins = retained.filter(c =>
      c.op == "upsert-begin" && !closed.contains(c.version))
    assert(openBegins.isEmpty, s"unclosed begins after quiesce: $openBegins")
  }

  test("txn markers are pure ledger entries: conflict with nothing, found by txnApplied") {
    val table = tmp("txn-marker")
    // a marker lands even while a partition claim is open (it touches no
    // partitions), and an open whole-table claim does not block it either
    val open = TxnLog.begin(spark, table, "upsert", Set("p1"),
      TxnLog.currentVersion(spark, table))
    TxnLog.commitTxn(spark, table, "app:7")
    assert(TxnLog.txnApplied(spark, table, "app:7"))
    assert(!TxnLog.txnApplied(spark, table, "app:8"))
    assert(!TxnLog.txnApplied(spark, table, "other:7"))
    TxnLog.end(spark, table, open)
    // markers do not make later partition claims conflict
    val next = TxnLog.begin(spark, table, "upsert", Set("p2"),
      TxnLog.currentVersion(spark, table))
    TxnLog.end(spark, table, next)
  }
}
