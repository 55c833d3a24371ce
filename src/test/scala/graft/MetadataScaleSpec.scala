package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.{BloomIndex, StatsIndex, TxnLog}

/** Metadata-scale stress gate: the engine's 100 TB claims rest on
  * driver-side metadata paths — TxnLog snapshot resolution, stats/bloom
  * sidecar admission — so this suite drives them at many-file /
  * many-commit scale (5k-file sidecars, 600-commit logs with
  * checkpoints) and asserts the costs stay O(tail)/O(files) with small
  * constants. Fixtures are synthetic where contents don't matter: a file
  * the sidecar skips is never opened, so the 4,99x non-matching "data
  * files" are zero-byte placeholders — which is exactly the property
  * under test. Wall-clock bounds are deliberately loose (shared host);
  * the sharp assertions are structural (files scheduled, rows shipped,
  * commits read). */
class MetadataScaleSpec extends SparkSpec {

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def timeMs(body: => Unit): Long = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1000000L
  }

  test("stats admission over a 5,000-file sidecar schedules only intersecting files") {
    val table = tmp("meta-stats")
    // 5 real files carry the probed range; 4,995 placeholders must be
    // skipped by their sidecar intervals WITHOUT ever being opened (they
    // are not even valid parquet)
    spark.range(420, 430).select(col("id").as("v"))
      .repartitionByRange(5, col("v"))
      .write.mode("overwrite").parquet(table)
    val real = new java.io.File(table).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).sorted.toSeq
    val fakes = (0 until 4995).map(i => f"fake-$i%05d.parquet")
    fakes.foreach(n => Files.createFile(java.nio.file.Paths.get(table, n)))
    // sidecar: real files own [420..429] slices; fakes own disjoint high
    // intervals far from the probe
    import spark.implicits._
    val entries =
      real.zipWithIndex.map { case (n, i) =>
        (s"$table/$n", "long", Some(420L + i * 2), Some(421L + i * 2),
          None: Option[Double], None: Option[Double],
          None: Option[String], None: Option[String], 0L, 2L, true)
      } ++ fakes.zipWithIndex.map { case (n, i) =>
        (s"$table/$n", "long", Some(1000000L + i * 10), Some(1000009L + i * 10),
          None: Option[Double], None: Option[Double],
          None: Option[String], None: Option[String], 0L, 10L, true)
      }
    entries.toDF("file", "typ", "lmin", "lmax", "dmin", "dmax",
        "smin", "smax", "nulls", "rows", "bounded")
      .coalesce(1).write.mode("overwrite").parquet(s"$table/_graft_stats/v")
    val ms = timeMs {
      val (res, candidates, skipped) =
        StatsIndex.rangeScan(spark, table, "v", Some(420L), Some(429L))
      assert(candidates.size == real.size,
        s"only the 5 real files intersect: ${candidates.size}")
      assert(skipped.size == 4995, s"placeholders must all skip: ${skipped.size}")
      assert(res.count() == 10L)
    }
    info(s"5,000-file stats admission + scan: $ms ms")
    assert(ms < 60000, s"admission over 5k entries took $ms ms")
  }

  test("bloom admission over a 5,000-file sidecar ships only admitting keys") {
    val table = tmp("meta-bloom")
    spark.range(1).select(lit("needle").as("k"))
      .coalesce(1).write.mode("overwrite").parquet(table)
    val real = new java.io.File(table).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).head
    val fakes = (0 until 4999).map(i => f"fake-$i%05d.parquet")
    fakes.foreach(n => Files.createFile(java.nio.file.Paths.get(table, n)))
    import spark.implicits._
    def filterBytes(values: Seq[String]): Array[Byte] = {
      val bf = org.apache.spark.util.sketch.BloomFilter.create(64, 0.01)
      values.foreach(bf.putString)
      val out = new java.io.ByteArrayOutputStream(); bf.writeTo(out); out.toByteArray
    }
    // 2,500 of the placeholders also admit a COMMON value — the
    // many-admitting shape whose skipped-list construction used to be
    // O(known × admitted) driver CPU (per-file linear scans of the
    // admitted list); both lookups below must stay flat
    val entries = ((s"$table/$real", filterBytes(Seq("needle", "common"))) +:
      fakes.zipWithIndex.map { case (n, i) =>
        (s"$table/$n", filterBytes(if (i < 2500) Seq("common") else Seq.empty))
      }).toSeq
    entries.toDF("file", "filter")
      .coalesce(1).write.mode("overwrite").parquet(s"$table/_graft_bloom/k")
    val ms = timeMs {
      val (res, candidates, skipped) = BloomIndex.lookup(spark, table, "k", "needle")
      assert(candidates.size == 1, s"one admitting file: $candidates")
      assert(skipped.size == 4999)
      assert(res.count() == 1L)
    }
    info(s"5,000-file bloom admission + scan: $ms ms")
    assert(ms < 60000, s"admission over 5k filters took $ms ms")
    // structural only (placeholders are not readable parquet, so the
    // candidate frame must never be built): admitted and skipped partition
    // the known set in one pass over the key Set
    val msWide = timeMs {
      val (candidates, skipped) = BloomIndex.admission(spark, table, "k", "common")
      assert(candidates.size == 2501, s"real + 2,500 fakes admit: ${candidates.size}")
      assert(skipped.size == 2499, s"the rest skip: ${skipped.size}")
    }
    info(s"5,000-file bloom admission, 2,501 admitting: $msWide ms")
    assert(msWide < 60000, s"many-admitting lookup took $msWide ms")
  }

  test("600-commit TxnLog with checkpoints: flat commit latency, O(tail) probes") {
    val table = tmp("meta-txn")
    var snapshot = 0L
    def commitRange(a: Int, b: Int): (Long, Long) = {
      val r0 = TxnLog.manifestReads.get()
      val ms = timeMs {
        (a until b).foreach { i =>
          snapshot = TxnLog.commit(spark, table, "merge",
            Set(s"day=d${i % 8}"), snapshot).version
        }
      }
      (ms, TxnLog.manifestReads.get() - r0)
    }
    val (first50, reads0) = commitRange(0, 50)
    commitRange(50, 550)
    val (last50, reads550) = commitRange(550, 600)
    info(s"commit latency: first 50 in $first50 ms, last 50 in $last50 ms")
    info(s"manifest files read: first 50 commits $reads0, last 50 $reads550")
    assert(snapshot == 600L)
    // checkpoints exist (every CheckpointInterval-th commit compacts)
    val ckpts = new java.io.File(s"$table/_graft_txn").listFiles()
      .count(_.getName.startsWith("checkpoint-v"))
    assert(ckpts > 0, "checkpoint files must exist at 600 commits")
    // O(tail), not O(history) — STRUCTURAL, not wall-clock (ms figures
    // are info-only; a loaded host must not flake this gate): each commit
    // at depth 550-600 reads the tail above the newest checkpoint plus
    // (every CheckpointInterval-th) one checkpoint compaction re-read —
    // bounded by the interval, never by the 550 commits of history. A
    // quadratic regression would read ~29,000 files here.
    assert(reads550 < 50L * (TxnLog.CheckpointInterval + 10L),
      s"manifest reads grew with history depth: first50=$reads0, last50=$reads550")
    // near-tip probe (the merge-path conflict check) reads only the tail
    val nearTip = TxnLog.commitsSince(spark, table, 597L)
    assert(nearTip.map(_.version) == Seq(598L, 599L, 600L))
    // full-history probe resolves through the checkpoint, all 600 commits
    val all = TxnLog.commitsSince(spark, table, 0L)
    assert(all.size == 600 && all.head.version == 1L && all.last.version == 600L)
    // truncation keeps the tail working at depth
    val dropped = TxnLog.truncate(spark, table, keep = 100)
    assert(dropped > 0)
    assert(TxnLog.currentVersion(spark, table) == 600L)
    assert(TxnLog.commitsSince(spark, table, 597L).size == 3)
  }

  test("5,000-commit lifetime with periodic truncation: flat latency, monotone in-commit ts") {
    // the OPERATIONAL shape of a year of hourly merges: the manifest is
    // periodically truncated by scheduled maintenance, so checkpoints
    // stay bounded and commit cost must be independent of LIFETIME commit
    // count, not just of retained depth. Also stress-proves the in-commit
    // timestamp clamp at depth: ts must stay strictly monotone across
    // 5,000 claims, checkpoint compactions, and truncations.
    val table = tmp("meta-txn5k")
    var snapshot = 0L
    def commitRange(a: Int, b: Int): (Long, Long) = {
      val r0 = TxnLog.manifestReads.get()
      val ms = timeMs {
        (a until b).foreach { i =>
          snapshot = TxnLog.commit(spark, table, "merge",
            Set(s"day=d${i % 8}"), snapshot).version
        }
      }
      (ms, TxnLog.manifestReads.get() - r0)
    }
    val (first50, reads0) = commitRange(0, 50)
    (1 to 9).foreach { k =>
      commitRange(k * 500 - 450, k * 500 + 50)
      TxnLog.truncate(spark, table, keep = 100)
    }
    commitRange(4550, 4950)
    val (last50, reads4950) = commitRange(4950, 5000)
    info(s"5k-commit latency: first 50 in $first50 ms, last 50 in $last50 ms")
    info(s"manifest files read: first 50 commits $reads0, last 50 $reads4950")
    assert(snapshot == 5000L)
    // STRUCTURAL flatness (ms info-only, see the 600-commit gate): at
    // lifetime commit 4,950+ each commit's conflict probe still reads
    // only the tail above the newest checkpoint — bounded by the
    // interval, independent of the 4,900 commits of lifetime history.
    // Post-truncation the retained manifest is ~100 commits, so even the
    // checkpoint compaction re-reads stay O(keep): a lifetime-quadratic
    // regression would read millions of files here.
    assert(reads4950 < 50L * (TxnLog.CheckpointInterval + 10L),
      s"manifest reads grew with lifetime depth: first50=$reads0, last50=$reads4950")
    // the retained manifest is bounded: one truncation brings it to ~keep,
    // and the log directory holds O(keep) files, not O(lifetime)
    TxnLog.truncate(spark, table, keep = 100)
    val retained = TxnLog.commitsSince(spark, table, 0L)
    assert(retained.size <= 120, s"retained manifest must stay bounded: ${retained.size}")
    assert(retained.last.version == 5000L)
    val logFiles = new java.io.File(s"$table/_graft_txn").listFiles().length
    assert(logFiles <= 150, s"log dir must hold O(keep) files after truncation: $logFiles")
    // in-commit timestamps: strictly monotone across the whole retained
    // range (checkpoint round-trips and truncation preserved them)
    assert(retained.map(_.ts).sliding(2).forall(p => p(0) < p(1)),
      "commit ts must be strictly increasing at depth")
    // near-tip probes stay O(tail)
    assert(TxnLog.commitsSince(spark, table, 4997L).map(_.version) ==
      Seq(4998L, 4999L, 5000L))
  }
}
