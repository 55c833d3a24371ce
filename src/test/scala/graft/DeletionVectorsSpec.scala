package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.batch.{ChangeFeed, DeletionVectors, Upsert}
import graft.core.TxnLog

/** Merge-on-read deletes: a row delete writes a kilobyte position sidecar
  * (never a partition rewrite), readers subtract it exactly, rewrites
  * materialize it, and every storage contract (time travel, CDF, OCC,
  * vacuum, truncation) holds the same guarantees as copy-on-write
  * deletes. */
class DeletionVectorsSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def rows(df: DataFrame): Set[(String, Long, Double)] = {
    import spark.implicits._
    df.select("day", "k", "v").as[(String, Long, Double)].collect().toSet
  }

  private def committed(table: String): Set[(String, Long, Double)] =
    rows(Upsert.readCommitted(spark, table, "day"))

  /** A merge-built table: `n` rows split across two day partitions. */
  private def table(n: Int): String = {
    val t = tmp("dv") + "/t"
    val df = spark.range(n).select(
      concat(lit("2026-01-0"), (col("id") % 2 + 1).cast("string")).as("day"),
      col("id").as("k"),
      (col("id") * 1.5).as("v"))
    Upsert.mergeByKey(spark, t, df, "day", Seq("k"))
    t
  }

  private def dataFiles(t: String, day: String): Map[String, Long] = {
    val d = new java.io.File(s"$t/day=$day")
    d.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toMap
  }

  private def keysDf(ks: (String, Long)*): DataFrame = {
    import spark.implicits._
    ks.toSeq.toDF("day", "k")
  }

  test("a vectored delete writes kilobytes and leaves every data file untouched") {
    val t = table(200000)
    val before1 = dataFiles(t, "2026-01-01")
    val before2 = dataFiles(t, "2026-01-02")
    val full = committed(t)
    val touched = DeletionVectors.deleteVectored(spark, t,
      keysDf(("2026-01-01", 40L), ("2026-01-02", 41L)), "day", Seq("k"))
    assert(touched == Seq("2026-01-01", "2026-01-02"))
    // merge-on-read: the 200k-row partitions' files are BYTE-UNTOUCHED
    assert(dataFiles(t, "2026-01-01") == before1, "partition 1 files must not change")
    assert(dataFiles(t, "2026-01-02") == before2, "partition 2 files must not change")
    // the write amplification is the position sidecar: kilobytes
    val dvBytes = {
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length() else f.listFiles().map(walk).sum
      walk(new java.io.File(s"$t/_graft_dv"))
    }
    assert(dvBytes > 0 && dvBytes < 64 * 1024,
      s"deleting 2 of 200k rows must cost KBs of sidecar, not a rewrite: $dvBytes B")
    // and the delete is exact: the two keys are gone, everything else stays
    assert(committed(t) ==
      full.filterNot(r => r._2 == 40L || r._2 == 41L))
    // readCommitted plan stays shuffle-free on the data side: the DV
    // subtraction is a broadcast anti-join, never a sort-merge join
    val plan = Upsert.readCommitted(spark, t, "day")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"DV subtraction must broadcast, not shuffle:\n$plan")
  }

  test("time travel sees through and around deletion vectors") {
    val t = table(2000)
    val v0 = TxnLog.currentVersion(spark, t)
    DeletionVectors.deleteVectored(spark, t, keysDf(("2026-01-01", 100L)),
      "day", Seq("k"))
    val v1 = TxnLog.currentVersion(spark, t)
    assert(!committed(t).exists(_._2 == 100L))
    // before the DV commit the row exists; at/after it is subtracted
    assert(rows(Upsert.readAsOf(spark, t, v0, "day")).exists(_._2 == 100L))
    assert(!rows(Upsert.readAsOf(spark, t, v1, "day")).exists(_._2 == 100L))
  }

  test("a merge materializes pending DVs; old snapshots still resolve them") {
    import spark.implicits._
    val t = table(2000)
    val v0 = TxnLog.currentVersion(spark, t)
    DeletionVectors.deleteVectored(spark, t, keysDf(("2026-01-01", 100L)),
      "day", Seq("k"))
    val v1 = TxnLog.currentVersion(spark, t)
    // an unrelated merge rewrites the partition: the DV'd row must not
    // survive into the new files (materialization), and snapshots on both
    // sides of the DV must stay exact through the retained generation
    Upsert.mergeByKey(spark, t,
      Seq(("2026-01-01", 9999991L, 1.0)).toDF("day", "k", "v"), "day", Seq("k"))
    assert(!committed(t).exists(_._2 == 100L), "materialized delete must hold")
    assert(committed(t).exists(_._2 == 9999991L))
    // the new live files carry no trace of the deleted row: reading the
    // partition dir RAW (no DV application) must already lack it
    assert(!rows(spark.read.parquet(s"$t/day=2026-01-01")
        .withColumn("day", lit("2026-01-01"))).exists(_._2 == 100L),
      "rewrite must materialize the delete into the files")
    assert(rows(Upsert.readAsOf(spark, t, v0, "day")).exists(_._2 == 100L),
      "pre-DV snapshot resolves the retained generation without the DV")
    assert(!rows(Upsert.readAsOf(spark, t, v1, "day")).exists(_._2 == 100L),
      "post-DV snapshot applies the DV to the retained generation")
    // re-inserting the key revives it with the new state, not the old row
    Upsert.mergeByKey(spark, t,
      Seq(("2026-01-01", 100L, 77.0)).toDF("day", "k", "v"), "day", Seq("k"))
    assert(committed(t).contains(("2026-01-01", 100L, 77.0)))
  }

  test("the change feed carries DV deletes with full pre-images") {
    val t = table(1000)
    val v0 = TxnLog.currentVersion(spark, t)
    val base = Upsert.readAsOf(spark, t, v0, "day")
    DeletionVectors.deleteVectored(spark, t,
      keysDf(("2026-01-01", 4L), ("2026-01-02", 5L)), "day", Seq("k"))
    val changes = ChangeFeed.readChanges(spark, t, "day", v0)
    import spark.implicits._
    val del = changes.filter(col(ChangeFeed.ChangeTypeCol) === "delete")
      .select("day", "k", "v").as[(String, Long, Double)].collect().toSet
    assert(del == Set(("2026-01-01", 4L, 6.0), ("2026-01-02", 5L, 7.5)),
      s"full pre-image delete rows expected: $del")
    assert(changes.filter(col(ChangeFeed.ChangeTypeCol) === "insert").isEmpty)
    // the CDF contract closes over DV commits too
    assert(rows(ChangeFeed.applyChanges(base, changes)) == committed(t))
  }

  test("a streaming mirror converges across DV deletes") {
    import spark.implicits._
    val t = table(500)
    val mirror = tmp("dv-mir") + "/m"
    val ckpt = tmp("dv-ckpt")
    graft.streaming.ChangeFeedStream.mirrorTo(spark, t, "day", Seq("k"), mirror, ckpt)
    assert(committed(mirror) == committed(t))
    DeletionVectors.deleteVectored(spark, t, keysDf(("2026-01-01", 10L)),
      "day", Seq("k"))
    graft.streaming.ChangeFeedStream.mirrorTo(spark, t, "day", Seq("k"), mirror, ckpt)
    assert(committed(mirror) == committed(t), "mirror must apply the DV delete")
    assert(!committed(mirror).exists(_._2 == 10L))
  }

  test("compaction materializes DVs version-defining-ly; plain compaction stays invisible") {
    import spark.implicits._
    val t = tmp("dv-compact") + "/t"
    // several merges -> several small files per partition
    (0 until 4).foreach { i =>
      Upsert.mergeByKey(spark, t,
        (0 until 50).map(j => ("2026-02-01", (i * 50 + j).toLong, (i * 50 + j) * 2.0))
          .toDF("day", "k", "v"), "day", Seq("k"))
    }
    // no DVs yet: compaction must NOT be version-defining
    val before = TxnLog.commitsSince(spark, t, 0L)
      .count(c => c.op == "upsert-end")
    assert(Upsert.compactPartitions(spark, t, "day", minFilesToCompact = 2) == 1)
    val afterPlain = TxnLog.commitsSince(spark, t, 0L)
    assert(afterPlain.count(_.op == "upsert-end") == before,
      "a DV-free compaction stays a compact commit (time travel untouched)")
    assert(afterPlain.exists(_.op == "compact-end"))
    // now DV-delete a row and fragment the partition again
    val v0 = TxnLog.currentVersion(spark, t)
    Upsert.mergeByKey(spark, t,
      Seq(("2026-02-01", 500L, 1.0), ("2026-02-01", 501L, 2.0)).toDF("day", "k", "v"),
      "day", Seq("k"))
    val vPre = TxnLog.currentVersion(spark, t)
    DeletionVectors.deleteVectored(spark, t, keysDf(("2026-02-01", 7L)),
      "day", Seq("k"))
    val vDv = TxnLog.currentVersion(spark, t)
    // a materializing compaction commits version-defining (upsert-end)
    assert(Upsert.compactPartitions(spark, t, "day", minFilesToCompact = 2) == 1)
    val after = TxnLog.commitsSince(spark, t, 0L)
    assert(after.count(_.op == "upsert-end") == afterPlain.count(_.op == "upsert-end") + 2,
      s"materializing compaction must be version-defining: ${after.map(_.op)}")
    // live files lack the deleted row even raw
    assert(!rows(spark.read.parquet(s"$t/day=2026-02-01")
      .withColumn("day", lit("2026-02-01"))).exists(_._2 == 7L))
    // and time travel around the DV stays exact through the compaction
    assert(rows(Upsert.readAsOf(spark, t, vPre, "day")).exists(_._2 == 7L),
      "pre-DV snapshot must still show the row after materialization")
    assert(!rows(Upsert.readAsOf(spark, t, vDv, "day")).exists(_._2 == 7L))
    assert(rows(Upsert.readAsOf(spark, t, v0, "day")) ==
      rows(Upsert.readAsOf(spark, t, v0, "day")), "stability smoke")
  }

  test("DV claims serialize against writers via the ordinary partition claim") {
    val t = table(200)
    val held = TxnLog.begin(spark, t, "upsert", Set("2026-01-01"),
      TxnLog.currentVersion(spark, t))
    try {
      intercept[TxnLog.ConcurrentWriteException] {
        DeletionVectors.deleteVectored(spark, t, keysDf(("2026-01-01", 2L)),
          "day", Seq("k"))
      }
    } finally TxnLog.abort(spark, t, held)
    // disjoint partition proceeds
    val ok = DeletionVectors.deleteVectored(spark, t, keysDf(("2026-01-02", 3L)),
      "day", Seq("k"))
    assert(ok == Seq("2026-01-02"))
  }

  test("no-op deletes abort their claim and write nothing") {
    val t = table(100)
    val tip0 = TxnLog.currentVersion(spark, t)
    // missing partition and unmatched keys: both no-ops
    DeletionVectors.deleteVectored(spark, t, keysDf(("2099-12-31", 1L)),
      "day", Seq("k"))
    DeletionVectors.deleteVectored(spark, t, keysDf(("2026-01-01", 999999L)),
      "day", Seq("k"))
    val cs = TxnLog.commitsSince(spark, t, tip0)
    assert(cs.forall(c => !c.op.endsWith("-end")),
      s"no-op DV deletes must not commit an END: ${cs.map(_.op)}")
    assert(!new java.io.File(s"$t/_graft_dv").exists() ||
      new java.io.File(s"$t/_graft_dv").listFiles().isEmpty)
    // already-DV-deleted keys are no-ops too (no duplicate change rows)
    DeletionVectors.deleteVectored(spark, t, keysDf(("2026-01-01", 2L)),
      "day", Seq("k"))
    val tip1 = TxnLog.currentVersion(spark, t)
    DeletionVectors.deleteVectored(spark, t, keysDf(("2026-01-01", 2L)),
      "day", Seq("k"))
    assert(TxnLog.commitsSince(spark, t, tip1).forall(c => !c.op.endsWith("-end")),
      "re-deleting a DV-deleted key is a no-op")
  }

  test("truncation pins live-relevant dv-ends; rewrites release them") {
    import spark.implicits._
    val t = table(300)
    DeletionVectors.deleteVectored(spark, t, keysDf(("2026-01-01", 8L)),
      "day", Seq("k"))
    val dvEnd = TxnLog.commitsSince(spark, t, 0L).filter(_.op == "dv-end")
      .map(_.version).max
    // pad far past the keep window
    (0 until 12).foreach { i =>
      Upsert.mergeByKey(spark, t,
        Seq(("2026-01-02", 1000L + i, i.toDouble)).toDF("day", "k", "v"),
        "day", Seq("k"))
    }
    TxnLog.truncate(spark, t, keep = 2)
    val kept = TxnLog.commitsSince(spark, t, 0L).map(_.version)
    assert(kept.contains(dvEnd),
      s"a dv-end still governing live reads must survive truncation: $kept")
    assert(!committed(t).exists(_._2 == 8L), "the delete still applies at the tip")
    // a rewrite of the DV'd partition materializes and releases the pin
    Upsert.mergeByKey(spark, t,
      Seq(("2026-01-01", 2000L, 5.0)).toDF("day", "k", "v"), "day", Seq("k"))
    TxnLog.truncate(spark, t, keep = 2)
    assert(!TxnLog.commitsSince(spark, t, 0L).map(_.version).contains(dvEnd),
      "a materialized dv-end must stop pinning the horizon")
    assert(!committed(t).exists(_._2 == 8L), "tip state survives the truncation")
  }

  test("vacuum sweeps dv sidecars only once no retained file can need them") {
    import spark.implicits._
    val t = table(300)
    DeletionVectors.deleteVectored(spark, t, keysDf(("2026-01-01", 8L)),
      "day", Seq("k"))
    val dvRoot = new java.io.File(s"$t/_graft_dv")
    assert(dvRoot.listFiles().nonEmpty)
    def ageEverything(): Unit = {
      val old = System.currentTimeMillis() - 10L * 24 * 3600 * 1000
      dvRoot.listFiles().foreach(_.setLastModified(old))
      val hist = new java.io.File(s"$t/_graft_history")
      if (hist.exists()) hist.listFiles().foreach(_.setLastModified(old))
    }
    // aged but still live-relevant (partition never rewritten): kept
    ageEverything()
    Upsert.vacuumHistory(spark, t, minAgeMs = 1000L)
    assert(dvRoot.listFiles().nonEmpty,
      "a live-relevant dv sidecar must survive vacuum")
    assert(!committed(t).exists(_._2 == 8L))
    // rewrite the partition (materializes), then age + vacuum BOTH the
    // generation and the sidecar: now nothing can need the pairs
    Upsert.mergeByKey(spark, t,
      Seq(("2026-01-01", 3000L, 1.0)).toDF("day", "k", "v"), "day", Seq("k"))
    ageEverything()
    Upsert.vacuumHistory(spark, t, minAgeMs = 1000L)
    assert(dvRoot.listFiles() == null || dvRoot.listFiles().isEmpty,
      "a dead dv sidecar must be vacuumed")
    assert(!committed(t).exists(_._2 == 8L), "tip state unaffected by the sweep")
  }

  test("pointLookup: bloom-pruned candidate set with deletion vectors subtracted") {
    val t = table(40000)
    graft.core.BloomIndex.build(spark, t, "k")
    DeletionVectors.deleteVectored(spark, t,
      keysDf(("2026-01-01", 100L)), "day", Seq("k"))
    // the raw bloom lookup sees the PRE-subtraction row set (documented) —
    // pointLookup is the DV-aware answer a takedown verification needs
    val (raw, cand, skip) = graft.core.BloomIndex.lookup(spark, t, "k", "100")
    assert(raw.count() == 1L, "raw lookup returns the not-yet-materialized row")
    assert(Upsert.pointLookup(spark, t, "k", "100").count() == 0L,
      "pointLookup must subtract the deletion vector")
    // a live key: found, row-equal to the committed filter
    assert(rows(Upsert.pointLookup(spark, t, "k", "101")) ==
      rows(Upsert.readCommitted(spark, t, "day").filter(col("k") === 101L)))
    // and the lookup still prunes: the candidate set is not the table
    assert(cand.size + skip.size >= 2 && skip.nonEmpty,
      s"lookup must skip non-admitting files: cand=${cand.size} skip=${skip.size}")
  }

  test("rangeLookup: stats-pruned range scan with deletion vectors subtracted") {
    val t = table(40000)
    graft.core.StatsIndex.build(spark, t, "v")
    // DV a key whose v lands inside the probed range: the raw sidecar scan
    // (pre-subtraction, documented) still returns it; rangeLookup must not
    DeletionVectors.deleteVectored(spark, t,
      keysDf(("2026-01-01", 200L)), "day", Seq("k")) // v = 300.0
    val (raw, _, _) = graft.core.StatsIndex.rangeScan(
      spark, t, "v", Some(299.0), Some(302.0))
    assert(raw.filter(col("k") === 200L).count() == 1L,
      "raw range scan returns the not-yet-materialized row")
    val looked = Upsert.rangeLookup(spark, t, "v", Some(299.0), Some(302.0))
    assert(looked.filter(col("k") === 200L).count() == 0L,
      "rangeLookup must subtract the deletion vector")
    // row parity with the committed read's same filter, DV'd row excluded
    assert(rows(looked) == rows(Upsert.readCommitted(spark, t, "day")
      .filter(col("v").between(299.0, 302.0))))
  }

  test("reorg purge rewrites exactly the DV-carrying partitions and scrubs the bytes") {
    // four partitions so the cost claim is testable: DVs land in two,
    // purge must not even list the other two into a job
    val t = tmp("reorg") + "/t"
    val df = spark.range(4000).select(
      concat(lit("2026-01-0"), (col("id") % 4 + 1).cast("string")).as("day"),
      col("id").as("k"),
      (col("id") * 1.5).as("v"))
    Upsert.mergeByKey(spark, t, df, "day", Seq("k"))
    val v0 = TxnLog.currentVersion(spark, t)
    DeletionVectors.deleteVectored(spark, t,
      keysDf(("2026-01-01", 4L), ("2026-01-02", 5L)), "day", Seq("k"))
    val v1 = TxnLog.currentVersion(spark, t)
    val expected = committed(t)
    val before3 = dataFiles(t, "2026-01-03")
    val before4 = dataFiles(t, "2026-01-04")
    // pre-purge: merge-on-read — the deleted rows' BYTES are still in the
    // live files (that is the debt purge exists to pay down)
    assert(rows(spark.read.parquet(s"$t/day=2026-01-01")
      .withColumn("day", lit("2026-01-01"))).exists(_._2 == 4L))

    val purged = Upsert.reorgPurge(spark, t, "day")
    assert(purged == Seq("2026-01-01", "2026-01-02"),
      s"purge must rewrite exactly the DV-carrying partitions: $purged")
    // untouched partitions: byte-identical (names + mtimes)
    assert(dataFiles(t, "2026-01-03") == before3)
    assert(dataFiles(t, "2026-01-04") == before4)
    // row-identical content, but the bytes are gone from the live files
    assert(committed(t) == expected, "purge must not change table content")
    assert(!rows(spark.read.parquet(s"$t/day=2026-01-01")
      .withColumn("day", lit("2026-01-01"))).exists(_._2 == 4L),
      "purge must materialize the delete into the files")
    // time travel holds on both sides of the DV commit
    assert(rows(Upsert.readAsOf(spark, t, v0, "day")).exists(_._2 == 4L),
      "pre-DV snapshot must still resolve the deleted row")
    assert(!rows(Upsert.readAsOf(spark, t, v1, "day")).exists(_._2 == 4L))
    // no change-feed rows: the DV commit already emitted the logical
    // deletes — purge changes bytes, not content
    assert(ChangeFeed.readChanges(spark, t, "day", v1).isEmpty,
      "purge must emit no change rows")
    // idempotent: the new file names match no pending position
    assert(Upsert.reorgPurge(spark, t, "day").isEmpty,
      "an immediate re-purge must be a no-op")
  }

  test("purge + history vacuum completes the erasure: no file anywhere bears the row") {
    import spark.implicits._
    val t = tmp("reorg2") + "/t"
    val df = spark.range(1000).select(
      concat(lit("2026-01-0"), (col("id") % 2 + 1).cast("string")).as("day"),
      col("id").as("k"),
      (col("id") * 1.5).as("v"))
    Upsert.mergeByKey(spark, t, df, "day", Seq("k"))
    DeletionVectors.deleteVectored(spark, t,
      keysDf(("2026-01-01", 4L)), "day", Seq("k"))
    assert(Upsert.reorgPurge(spark, t, "day") == Seq("2026-01-01"))
    Upsert.vacuumHistory(spark, t, minAgeMs = 0L)
    // the GDPR claim, asserted the strong way: scan EVERY parquet file
    // under the table root (live, retained, change files) for the row
    def parquets(f: java.io.File): Seq[java.io.File] =
      if (f.isFile) { if (f.getName.endsWith(".parquet")) Seq(f) else Nil }
      else Option(f.listFiles()).map(_.toSeq.flatMap(parquets)).getOrElse(Nil)
    val bearing = parquets(new java.io.File(t)).filter { f =>
      val cols = spark.read.parquet(f.getPath).columns
      cols.contains("k") &&
        !spark.read.parquet(f.getPath).filter(col("k") === 4L).isEmpty
    }
    assert(bearing.isEmpty,
      s"erased row must survive in no file after purge+vacuum: $bearing")
    // and the table still serves: content minus the erased row
    assert(!committed(t).exists(_._2 == 4L) && committed(t).size == 999)
  }
}
