package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.batch.Upsert
import graft.streaming.TableTailStream

/** Table-tail streaming source (the Delta plain table-streaming-source
  * analog): committed appended rows, exactly-once per cursor advance,
  * checkpoint resume, compaction-transparent, and the documented
  * `ignoreChanges` caveat on rewriting commits. */
class TableTailSpec extends SparkSpec {

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Double)] = {
    import spark.implicits._
    df.select("day", "k", "v").as[(String, Long, Double)].collect().toSet
  }

  test("exactly-once tail across merges and a compaction; drain ≡ readCommitted") {
    import spark.implicits._
    val t = tmp("tail") + "/t"
    val ckpt = tmp("tail-ckpt")
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Double)]
    def drainInto(): Int =
      TableTailStream.drain(spark, t, "day", ckpt) { (batch, _, _) =>
        assert(batch.columns.sorted.toSeq == Seq("day", "k", "v"),
          s"tail emits the table's own columns: ${batch.columns.mkString(",")}")
        emitted ++= rows(batch)
      }

    // two append-only merges (fresh keys), drained in two separate polls
    Upsert.mergeByKey(spark, t,
      (1 to 20).map(i => (s"2026-06-0${i % 2 + 1}", i.toLong, i * 1.0))
        .toDF("day", "k", "v"), "day", Seq("k"))
    assert(drainInto() == 1)
    assert(emitted.size == 20)
    Upsert.mergeByKey(spark, t,
      (21 to 30).map(i => (s"2026-06-0${i % 2 + 1}", i.toLong, i * 1.0))
        .toDF("day", "k", "v"), "day", Seq("k"))
    assert(drainInto() == 1)
    assert(emitted.size == 30, "each appended row exactly once")
    assert(emitted.toSet == rows(Upsert.readCommitted(spark, t, "day")),
      "drained tail must equal the committed table")

    // a compaction moves every row into fresh files — the tail may fire an
    // empty cursor-advance batch (Spark streams have empty micro-batches
    // too) but must emit NO ROWS for it (the row set did not change)
    Upsert.compactPartitions(spark, t, "day",
      targetBytes = 512L * 1024 * 1024, minFilesToCompact = 2)
    drainInto()
    assert(emitted.size == 30, "compaction must not re-emit rows")

    // appends after the compaction flow on
    Upsert.mergeByKey(spark, t,
      Seq(("2026-06-01", 31L, 31.0)).toDF("day", "k", "v"), "day", Seq("k"))
    assert(drainInto() == 1)
    assert(emitted.size == 31)
    assert(emitted.toSet == rows(Upsert.readCommitted(spark, t, "day")))
  }

  test("rate limit: a bounded tail catches up in bounded batches that " +
      "union to the unbounded drain") {
    import spark.implicits._
    val t = tmp("tail-rate") + "/t"
    val ckpt = tmp("tail-rate-ckpt")
    // 5 append-only merges land BEFORE the first poll — the bootstrap case
    (0 until 5).foreach { w =>
      Upsert.mergeByKey(spark, t,
        (w * 10 + 1 to w * 10 + 10)
          .map(i => (s"2026-07-0${i % 2 + 1}", i.toLong, i * 1.0))
          .toDF("day", "k", "v"), "day", Seq("k"))
    }
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Double)]
    val spans = scala.collection.mutable.ArrayBuffer.empty[Long]
    val batches = TableTailStream.drain(spark, t, "day", ckpt,
        maxCommitsPerBatch = 2) { (batch, from, to) =>
      spans += to - from
      emitted ++= rows(batch)
    }
    assert(batches > 1, s"5 merges under a 2-commit cap need >1 batch: $batches")
    assert(spans.forall(_ <= 2), s"every batch within the cap: $spans")
    assert(emitted.size == 50 && emitted.toSet ==
      rows(Upsert.readCommitted(spark, t, "day")),
      "bounded batches must union to exactly the committed table")
    // caught up: a bounded poll is a no-op like an unbounded one
    assert(!TableTailStream.pollOnce(spark, t, "day", ckpt,
      maxCommitsPerBatch = 2)((_, _, _) => fail("no batch when caught up")))
    intercept[IllegalArgumentException] {
      TableTailStream.pollOnce(spark, t, "day", ckpt,
        maxCommitsPerBatch = 0)((_, _, _) => ())
    }
  }

  test("checkpoint resume: a fresh consumer continues from the cursor, " +
      "a second checkpoint replays from scratch") {
    import spark.implicits._
    val t = tmp("tail-resume") + "/t"
    val ckpt = tmp("tail-resume-ckpt")
    Upsert.mergeByKey(spark, t,
      (1 to 10).map(i => (s"2026-06-0${i % 2 + 1}", i.toLong, i * 1.0))
        .toDF("day", "k", "v"), "day", Seq("k"))
    var first = 0
    TableTailStream.drain(spark, t, "day", ckpt) { (b, _, _) => first += b.count().toInt }
    assert(first == 10)
    // "restart": nothing in memory survives; the persisted cursor does
    val resumed = TableTailStream.cursor(spark, ckpt)
    assert(resumed == graft.core.TxnLog.currentVersion(spark, t))
    Upsert.mergeByKey(spark, t,
      Seq(("2026-06-01", 11L, 11.0)).toDF("day", "k", "v"), "day", Seq("k"))
    var second = 0
    TableTailStream.drain(spark, t, "day", ckpt) { (b, _, _) => second += b.count().toInt }
    assert(second == 1, "resume emits only post-cursor commits")
    // an independent checkpoint bootstraps the full table
    var fresh = 0
    TableTailStream.drain(spark, t, "day", tmp("tail-fresh-ckpt")) { (b, _, _) =>
      fresh += b.count().toInt }
    assert(fresh == 11)
  }

  test("rewriting commits: loud by default, appends-with-duplicates under " +
      "ignoreChanges (the Delta caveat)") {
    import spark.implicits._
    val t = tmp("tail-rewrite") + "/t"
    val ckpt = tmp("tail-rewrite-ckpt")
    Upsert.mergeByKey(spark, t,
      (1 to 10).map(i => (s"2026-06-0${i % 2 + 1}", i.toLong, i * 1.0))
        .toDF("day", "k", "v"), "day", Seq("k"))
    TableTailStream.drain(spark, t, "day", ckpt) { (_, _, _) => () }
    // an UPDATE merge rewrites k=2
    Upsert.mergeByKey(spark, t,
      Seq(("2026-06-01", 2L, 99.0)).toDF("day", "k", "v"), "day", Seq("k"))
    val e = intercept[IllegalStateException] {
      TableTailStream.pollOnce(spark, t, "day", ckpt) { (_, _, _) => () }
    }
    assert(e.getMessage.contains("ignoreChanges"), e.getMessage)
    // the failed poll must NOT have advanced the cursor
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Double)]
    assert(TableTailStream.drain(spark, t, "day", ckpt, ignoreChanges = true) {
      (b, _, _) => emitted ++= rows(b) } == 1)
    assert(emitted.toSet == Set(("2026-06-01", 2L, 99.0)),
      s"only the upserted row re-emits, survivors never do: $emitted")
    // a row DELETE is a rewriting commit too
    Upsert.deleteByKey(spark, t,
      Seq(("2026-06-01", 4L)).toDF("day", "k"), "day", Seq("k"))
    intercept[IllegalStateException] {
      TableTailStream.pollOnce(spark, t, "day", ckpt) { (_, _, _) => () }
    }
    // under ignoreChanges a pure delete emits an EMPTY batch (no data
    // loss, no phantom rows) and the cursor advances past it
    var emptyBatch = -1L
    assert(TableTailStream.drain(spark, t, "day", ckpt, ignoreChanges = true) {
      (b, _, _) => emptyBatch = b.count() } == 1)
    assert(emptyBatch == 0L)
    assert(TableTailStream.cursor(spark, ckpt) ==
      graft.core.TxnLog.currentVersion(spark, t))
  }

  test("ignoreDeletes: pure-delete commits pass without the duplicate-risk " +
      "opt-in, rewrites still refuse (Delta's two-tier caveat)") {
    import spark.implicits._
    val t = tmp("tail-igdel") + "/t"
    val ckpt = tmp("tail-igdel-ckpt")
    Upsert.mergeByKey(spark, t,
      (1 to 10).map(i => (s"2026-06-0${i % 2 + 1}", i.toLong, i * 1.0))
        .toDF("day", "k", "v"), "day", Seq("k"))
    TableTailStream.drain(spark, t, "day", ckpt) { (_, _, _) => () }
    // a retention/GDPR-style delete-only commit
    Upsert.deleteByKey(spark, t,
      Seq(("2026-06-01", 4L)).toDF("day", "k"), "day", Seq("k"))
    // default: loud, and the message offers BOTH escapes
    val e = intercept[IllegalStateException] {
      TableTailStream.pollOnce(spark, t, "day", ckpt) { (_, _, _) => () }
    }
    assert(e.getMessage.contains("ignoreDeletes"), e.getMessage)
    // ignoreDeletes alone suffices: empty batch, cursor advances
    var emitted = 0L
    assert(TableTailStream.drain(spark, t, "day", ckpt,
      ignoreDeletes = true) { (b, _, _) => emitted += b.count() } == 1)
    assert(emitted == 0L)
    assert(TableTailStream.cursor(spark, ckpt) ==
      graft.core.TxnLog.currentVersion(spark, t))
    // an UPDATE merge in the range still refuses under ignoreDeletes —
    // skipping its delete legs would hide a rewrite as a plain append…
    Upsert.mergeByKey(spark, t,
      Seq(("2026-06-01", 2L, 99.0)).toDF("day", "k", "v"), "day", Seq("k"))
    val e2 = intercept[IllegalStateException] {
      TableTailStream.pollOnce(spark, t, "day", ckpt,
        ignoreDeletes = true) { (_, _, _) => () }
    }
    assert(e2.getMessage.contains("ignoreChanges") &&
      !e2.getMessage.contains("ignoreDeletes=true"), e2.getMessage)
    // …and ignoreChanges remains the rewrite escape
    val rows2 = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Double)]
    assert(TableTailStream.drain(spark, t, "day", ckpt,
      ignoreChanges = true) { (b, _, _) => rows2 ++= rows(b) } == 1)
    assert(rows2.toSet == Set(("2026-06-01", 2L, 99.0)))
  }
}
