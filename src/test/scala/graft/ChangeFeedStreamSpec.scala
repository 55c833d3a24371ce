package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.batch.Upsert
import graft.core.TxnLog
import graft.streaming.ChangeFeedStream

/** The streaming CDF consumer contract: a checkpointed tail of the TxnLog
  * whose mirror converges to the source's committed state exactly-once,
  * including across a crash-restart that replays a batch. */
class ChangeFeedStreamSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def rows(df: DataFrame): Set[(String, String, Double)] = {
    import spark.implicits._
    df.select("day", "k", "v").as[(String, String, Double)].collect().toSet
  }

  private def committed(table: String): Set[(String, String, Double)] =
    rows(Upsert.readCommitted(spark, table, "day"))

  test("a mirror drains the feed incrementally and converges to readCommitted") {
    import spark.implicits._
    val src = tmp("cdfs-src")
    val mirror = tmp("cdfs-mir") + "/mirror"
    val ckpt = tmp("cdfs-ckpt")
    // the source is built ENTIRELY through merges: the feed carries merge
    // commits, so a mirror from cursor 0 sees the table's whole history
    Upsert.mergeByKey(spark, src,
      Seq(("2026-01-01", "k1", 10.0), ("2026-01-02", "k2", 20.0))
        .toDF("day", "k", "v"), "day", Seq("k"))
    val b1 = ChangeFeedStream.mirrorTo(spark, src, "day", Seq("k"), mirror, ckpt)
    assert(b1 >= 1, s"expected at least one batch, got $b1")
    assert(committed(mirror) == committed(src), "mirror after initial drain")
    // caught up: another drain fires no data batches beyond marker-only tips
    val cursorAfter = ChangeFeedStream.cursor(spark, ckpt)
    assert(cursorAfter == TxnLog.currentVersion(spark, src))
    // new commits: update, cross-partition insert, delete — the next drain
    // picks up exactly the delta
    Upsert.mergeByKey(spark, src,
      Seq(("2026-01-01", "k1", 11.0), ("2026-01-03", "k3", 30.0))
        .toDF("day", "k", "v"), "day", Seq("k"))
    Upsert.deleteByKey(spark, src,
      Seq(("2026-01-02", "k2")).toDF("day", "k"), "day", Seq("k"))
    ChangeFeedStream.mirrorTo(spark, src, "day", Seq("k"), mirror, ckpt)
    assert(committed(mirror) == committed(src), "mirror after incremental drain")
    assert(committed(mirror) ==
      Set(("2026-01-01", "k1", 11.0), ("2026-01-03", "k3", 30.0)))
  }

  test("a crash between the batch and the cursor advance replays without duplication") {
    import spark.implicits._
    val src = tmp("cdfs-crash-src")
    val mirror = tmp("cdfs-crash-mir") + "/mirror"
    val ckpt = tmp("cdfs-crash-ckpt")
    Upsert.mergeByKey(spark, src,
      Seq(("2026-01-01", "k1", 10.0)).toDF("day", "k", "v"), "day", Seq("k"))
    ChangeFeedStream.mirrorTo(spark, src, "day", Seq("k"), mirror, ckpt)
    Upsert.mergeByKey(spark, src,
      Seq(("2026-01-01", "k1", 12.0), ("2026-01-01", "k9", 90.0))
        .toDF("day", "k", "v"), "day", Seq("k"))
    // crash injection: the batch function completes its merge (with the
    // marker, exactly as mirrorTo would) but dies BEFORE pollOnce advances
    // the cursor
    val cursorBefore = ChangeFeedStream.cursor(spark, ckpt)
    val boom = intercept[RuntimeException] {
      ChangeFeedStream.pollOnce(spark, src, "day", ckpt) { (changes, _, to) =>
        ChangeFeedStream.applyMirrorBatch(
          spark, "day", Seq("k"), mirror, "cdf-mirror")(changes, to)
        throw new RuntimeException("crash before cursor advance")
      }
    }
    assert(boom.getMessage.contains("crash"))
    assert(ChangeFeedStream.cursor(spark, ckpt) == cursorBefore,
      "the cursor must not advance past a failed batch")
    // the cursor did not advance, so a restart REPLAYS the range; the
    // marker + idempotent merge make the replay a no-op on the data
    val endsBefore = TxnLog.commitsSince(spark, mirror, 0L)
      .count(c => c.op == "upsert-end" && c.ref.isDefined)
    ChangeFeedStream.mirrorTo(spark, src, "day", Seq("k"), mirror, ckpt)
    val endsAfter = TxnLog.commitsSince(spark, mirror, 0L)
      .count(c => c.op == "upsert-end" && c.ref.isDefined)
    assert(committed(mirror) == committed(src), "replayed mirror converges")
    assert(committed(mirror) ==
      Set(("2026-01-01", "k1", 12.0), ("2026-01-01", "k9", 90.0)))
    assert(endsAfter == endsBefore,
      s"the marker must skip the already-applied merge: $endsBefore -> $endsAfter")
  }

  test("cursor storage is versioned: an advance never leaves the cursor absent, " +
      "max wins over debris, legacy files still read") {
    import spark.implicits._
    val src = tmp("cdfs-cur-src")
    val ckpt = tmp("cdfs-cur-ckpt")
    val dir = new org.apache.hadoop.fs.Path(ckpt)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    def put(name: String, v: Long): Unit = {
      val out = fs.create(new org.apache.hadoop.fs.Path(dir, name), true)
      try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    }
    // a legacy (pre-versioned) checkpoint holds a single `cursor` file
    fs.mkdirs(dir)
    put("cursor", 0L)
    assert(ChangeFeedStream.cursor(spark, ckpt) == 0L)
    // a real advance writes cursor-v<tip> and sweeps the legacy file — at
    // no point is the directory cursor-less (add-then-sweep, never
    // delete-then-rename)
    Upsert.mergeByKey(spark, src,
      Seq(("2026-01-01", "k1", 1.0)).toDF("day", "k", "v"), "day", Seq("k"))
    assert(ChangeFeedStream.pollOnce(spark, src, "day", ckpt)((c, _, _) =>
      c.count(): Unit))
    val tip = TxnLog.currentVersion(spark, src)
    val names = fs.listStatus(dir).map(_.getPath.getName).toSet
    assert(names.contains(s"cursor-v$tip"), s"versioned cursor expected: $names")
    assert(!names.contains("cursor"), s"legacy file must be swept: $names")
    assert(ChangeFeedStream.cursor(spark, ckpt) == tip)
    // crash-mid-sweep debris: stale versioned files alongside — max wins,
    // so debris can only ever hold the cursor back to a REPLAY (absorbed
    // by idempotent consumers), never jump it forward or lose it
    put("cursor-v1", 1L)
    assert(ChangeFeedStream.cursor(spark, ckpt) == tip,
      "newest versioned cursor wins over stale debris")
  }

  test("a commit-capped mirror bootstraps in bounded batches and still " +
      "converges") {
    import spark.implicits._
    val src = tmp("cdfs-cap-src")
    val mirror = tmp("cdfs-cap-mir") + "/mirror"
    val ckpt = tmp("cdfs-cap-ckpt")
    // 4 merges land BEFORE the first poll — the bootstrap-against-history
    // case the cap exists for
    (0 until 4).foreach { i =>
      Upsert.mergeByKey(spark, src,
        Seq((s"2026-02-0${i % 2 + 1}", s"k$i", i * 1.0)).toDF("day", "k", "v"),
        "day", Seq("k"))
    }
    val spans = scala.collection.mutable.ArrayBuffer.empty[Long]
    val batches = ChangeFeedStream.drain(spark, src, "day", ckpt,
      maxCommitsPerBatch = 2) { (_, from, to) => spans += to - from }
    assert(batches > 1 && spans.forall(_ <= 2),
      s"4 merges under a 2-commit cap need >1 bounded batch: $spans")
    // the capped consumer path end-to-end: a fresh capped mirror converges
    val mirrorBatches = ChangeFeedStream.mirrorTo(spark, src, "day", Seq("k"),
      mirror, tmp("cdfs-cap-ckpt2"), maxCommitsPerBatch = 2)
    assert(mirrorBatches > 1, s"capped mirror batches: $mirrorBatches")
    assert(committed(mirror) == committed(src),
      "bounded batches must still converge the mirror exactly")
  }

  test("commits landing mid-drain are included before drain returns") {
    import spark.implicits._
    val src = tmp("cdfs-mid-src")
    val mirror = tmp("cdfs-mid-mir") + "/mirror"
    val ckpt = tmp("cdfs-mid-ckpt")
    Upsert.mergeByKey(spark, src,
      Seq(("2026-01-01", "k1", 1.0)).toDF("day", "k", "v"), "day", Seq("k"))
    // a writer lands a new merge DURING the first batch: the drain loop
    // re-probes the tip and must emit it before returning
    var injected = false
    ChangeFeedStream.drain(spark, src, "day", ckpt) { (changes, from, to) =>
      changes.count() // consume
      if (!injected) {
        injected = true
        Upsert.mergeByKey(spark, src,
          Seq(("2026-01-01", "k2", 2.0)).toDF("day", "k", "v"), "day", Seq("k"))
      }
    }
    assert(injected)
    assert(ChangeFeedStream.cursor(spark, ckpt) ==
      TxnLog.currentVersion(spark, src),
      "drain must catch the mid-drain commit before returning")
  }
}
