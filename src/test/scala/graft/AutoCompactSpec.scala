package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.batch.Upsert
import graft.core.TxnLog

/** Post-merge auto-compaction (Delta autoCompact analog): a wide merge's
  * task-fragmented output is consolidated inline for exactly the touched
  * partitions when the conf enables it; the default is off and costs the
  * merge nothing. */
class AutoCompactSpec extends SparkSpec {

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toString + "/t"

  private def files(t: String, day: String): Int =
    new java.io.File(s"$t/day=$day").listFiles()
      .count(_.getName.endsWith(".parquet"))

  private def wideUpdates(n: Int, vOff: Double = 0.0) =
    spark.range(n).repartition(8).select(
      lit("d1").as("day"), col("id").as("k"),
      (col("id").cast("double") + vOff).as("v"))

  test("off by default: a wide merge leaves task-count files; on: the " +
      "touched partition consolidates inline, content and history intact") {
    import spark.implicits._
    val off = tmp("acoff")
    Upsert.mergeByKey(spark, off, wideUpdates(400), "day", Seq("k"))
    assert(files(off, "d1") >= 4,
      s"a repartition(8) merge should fragment: ${files(off, "d1")} files")

    val on = tmp("acon")
    spark.conf.set("graft.autoCompact.enabled", "true")
    spark.conf.set("graft.autoCompact.minFiles", "4")
    try {
      Upsert.mergeByKey(spark, on, wideUpdates(400), "day", Seq("k"))
      assert(files(on, "d1") < 4,
        s"auto-compact must consolidate the fan-out: ${files(on, "d1")} files")
      // content exact, and the compaction is an ordinary version-defining
      // commit: the pre-compact state stays time-travelable
      assert(Upsert.readCommitted(spark, on, "day").count() == 400L)
      val v = TxnLog.currentVersion(spark, on)
      assert(v >= 2L, s"merge + compact commits expected, at v$v")
      assert(Upsert.readAsOf(spark, on, v - 1, "day").count() == 400L,
        "the pre-compact version must remain readable")
      // a second merge touching the same partition keeps steady state
      Upsert.mergeByKey(spark, on, wideUpdates(400, vOff = 0.5), "day", Seq("k"))
      assert(files(on, "d1") < 4, s"steady state: ${files(on, "d1")} files")
      assert(Upsert.readCommitted(spark, on, "day")
        .filter(col("v") === 0.5).count() == 1L, "the update landed")
    } finally {
      spark.conf.unset("graft.autoCompact.enabled")
      spark.conf.unset("graft.autoCompact.minFiles")
    }
  }

  test("below the threshold nothing compacts: the merge pays only a listing") {
    import spark.implicits._
    val t = tmp("acidle")
    spark.conf.set("graft.autoCompact.enabled", "true")
    spark.conf.set("graft.autoCompact.minFiles", "64")
    try {
      Upsert.mergeByKey(spark, t, wideUpdates(400), "day", Seq("k"))
      val v = TxnLog.currentVersion(spark, t)
      Upsert.mergeByKey(spark, t,
        Seq(("d1", 1L, 9.9)).toDF("day", "k", "v"), "day", Seq("k"))
      // exactly ONE commit pair landed (the merge) — no compact commit
      assert(TxnLog.commitsSince(spark, t, v)
        .forall(c => !c.op.startsWith("compact")),
        "no compaction below the file threshold")
    } finally {
      spark.conf.unset("graft.autoCompact.enabled")
      spark.conf.unset("graft.autoCompact.minFiles")
    }
  }
}
