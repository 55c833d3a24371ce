package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.batch.Upsert
import graft.core.TxnLog

/** In-commit timestamps (Delta 3.3 `delta.enableInCommitTimestamps`
  * analog, always on): every commit's ts is clamped to strictly exceed
  * its predecessor's and lives inside the commit record — so the
  * `TIMESTAMP AS OF` axis is monotone in version under clock skew,
  * backward clock steps, and same-millisecond bursts, and survives
  * checkpointing, file copies, and scrambled mtimes. */
class InCommitTimestampSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** Run `f` with commit timestamps drawn from `ticks` (then, past the
    * script's end, from the last tick); always restores the real clock. */
  private def withClock[T](ticks: Long*)(f: => T): T = {
    val prev = TxnLog.clock
    val it = ticks.iterator
    var last = ticks.last
    TxnLog.clock = () => { if (it.hasNext) last = it.next(); last }
    try f finally TxnLog.clock = prev
  }

  private def tsOf(table: String): Seq[Long] =
    TxnLog.commitsSince(spark, table, 0L).map(_.ts)

  test("backward clock steps and same-ms bursts still yield strictly increasing ts") {
    val table = tmp("ict-skew")
    // scripted writer clocks: fine, then 1h BACKWARD, then frozen
    withClock(5000L, 9000L, 9000L - 3600L * 1000, 2000L, 2000L, 12000L) {
      (1 to 6).foreach { i =>
        TxnLog.commit(spark, table, "upsert-end", Set(s"p$i"),
          TxnLog.currentVersion(spark, table))
      }
    }
    val ts = tsOf(table)
    assert(ts == Seq(5000L, 9000L, 9001L, 9002L, 9003L, 12000L),
      s"clamp must ride out the backward step, then rejoin the clock: $ts")
    assert(ts.sliding(2).forall(p => p(0) < p(1)), s"ts must be strictly increasing: $ts")
  }

  test("versionAt binary-searches the in-commit axis exactly (boundaries inclusive)") {
    val table = tmp("ict-resolve")
    withClock(1000L, 1000L, 1000L, 5000L) { // v1..v3 burst at one ms, v4 later
      (1 to 4).foreach { i =>
        TxnLog.commit(spark, table, "upsert-end", Set(s"p$i"),
          TxnLog.currentVersion(spark, table))
      }
    }
    assert(tsOf(table) == Seq(1000L, 1001L, 1002L, 5000L))
    assert(Upsert.versionAt(spark, table, 1000L) == 1L, "exact ts hits its commit")
    assert(Upsert.versionAt(spark, table, 1001L) == 2L)
    assert(Upsert.versionAt(spark, table, 1002L) == 3L)
    assert(Upsert.versionAt(spark, table, 4999L) == 3L, "between commits -> older")
    assert(Upsert.versionAt(spark, table, 5000L) == 4L)
    assert(Upsert.versionAt(spark, table, Long.MaxValue) == 4L)
    val e = intercept[IllegalStateException] { Upsert.versionAt(spark, table, 999L) }
    assert(e.getMessage.contains("predates"), e.getMessage)
  }

  test("the axis is IN-COMMIT: checkpoints carry it and mtimes are irrelevant") {
    val table = tmp("ict-durable")
    val ticks = (1 to 25).map(i => 1000L * i)
    withClock(ticks: _*) {
      (1 to 25).foreach { i =>
        TxnLog.commit(spark, table, "upsert-end", Set(s"p$i"),
          TxnLog.currentVersion(spark, table))
      }
    }
    assert(tsOf(table) == ticks, "scripted ts recorded verbatim")
    // scramble every log file's mtime (what a naive copy/restore does to a
    // mtime-based time axis) — resolution must not move
    val dir = new java.io.File(table, "_graft_txn")
    dir.listFiles().foreach { f =>
      Files.setLastModifiedTime(f.toPath,
        java.nio.file.attribute.FileTime.fromMillis(42L))
    }
    assert(tsOf(table) == ticks, "ts must come from record content, not mtime")
    // delete the commit files a checkpoint covers: ts must round-trip
    // through the checkpoint too (v20 checkpoint exists at interval 10)
    (1L to 20L).foreach { v =>
      Files.delete(java.nio.file.Paths.get(table, "_graft_txn", f"v$v%020d.json"))
    }
    assert(tsOf(table) == ticks, "checkpointed commits must keep their ts")
    assert(Upsert.versionAt(spark, table, 17500L) == 17L)
  }

  test("TIMESTAMP AS OF through real merges under a skewed writer clock") {
    val table = tmp("ict-merge") + "/t"
    import spark.implicits._
    def day(kvs: (Long, String)*): DataFrame =
      kvs.map { case (k, v) => ("d1", k, v) }.toDF("day", "k", "v")
    // first merge at a sane clock; second writer's clock is 1h BEHIND
    val base = 1700000000000L
    val (v1Ts, v2Ts) = withClock(
        Seq.fill(8)(base) ++ Seq.fill(8)(base - 3600L * 1000): _*) {
      Upsert.mergeByKey(spark, table, day(1L -> "a", 2L -> "b"), "day", Seq("k"))
      val t1 = TxnLog.commitsSince(spark, table, 0L).last.ts
      Upsert.mergeByKey(spark, table, day(2L -> "B"), "day", Seq("k"))
      (t1, TxnLog.commitsSince(spark, table, 0L).last.ts)
    }
    assert(v2Ts > v1Ts, s"skewed writer's commits must still land after: $v1Ts vs $v2Ts")
    // as-of the first merge's commit instant: the pre-update row
    val at1 = Upsert.readAsOfTimestamp(spark, table, v1Ts, "day")
      .select("k", "v").as[(Long, String)].collect().toMap
    assert(at1 == Map(1L -> "a", 2L -> "b"), s"state at v1's ts: $at1")
    val at2 = Upsert.readAsOfTimestamp(spark, table, v2Ts, "day")
      .select("k", "v").as[(Long, String)].collect().toMap
    assert(at2 == Map(1L -> "a", 2L -> "B"), s"state at v2's ts: $at2")
  }
}
