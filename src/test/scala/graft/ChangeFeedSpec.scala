package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.batch.{ChangeFeed, Upsert}
import graft.core.TxnLog

/** The CDF contract: snapshot(v0) + changes(v0→tip) ≡ snapshot(tip), both
  * one-shot and replayed commit by commit like a checkpointing streaming
  * consumer; horizons fail loudly. */
class ChangeFeedSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def rows(df: DataFrame): Set[(String, String, Double)] = {
    import spark.implicits._
    df.select("day", "k", "v").as[(String, String, Double)].collect().toSet
  }

  /** Seed + three merges (update, insert, cross-partition mix, delete).
    * Returns (table, v0, seed-state). */
  private def history(): (String, Long, Set[(String, String, Double)]) = {
    import spark.implicits._
    val table = tmp("cdf")
    Seq(("2026-01-01", "k1", 10.0), ("2026-01-01", "k2", 20.0),
        ("2026-01-02", "k3", 30.0))
      .toDF("day", "k", "v")
      .write.partitionBy("day").mode("overwrite").parquet(table)
    val v0 = TxnLog.currentVersion(spark, table)
    val s0 = rows(spark.read.parquet(table))
    // M1: update k1, insert k9 (same partition)
    Upsert.mergeByKey(spark, table,
      Seq(("2026-01-01", "k1", 11.0), ("2026-01-01", "k9", 90.0))
        .toDF("day", "k", "v"), "day", Seq("k"))
    // M2: cross-partition — new partition 01-03, update k3
    Upsert.mergeByKey(spark, table,
      Seq(("2026-01-03", "k5", 50.0), ("2026-01-02", "k3", 33.0))
        .toDF("day", "k", "v"), "day", Seq("k"))
    // M3: delete k2 and the freshly inserted k9
    Upsert.deleteByKey(spark, table,
      Seq(("2026-01-01", "k2"), ("2026-01-01", "k9")).toDF("day", "k"),
      "day", Seq("k"))
    (table, v0, s0)
  }

  test("snapshot(v0) + changes(v0->tip) reproduces snapshot(tip), one-shot") {
    val (table, v0, s0) = history()
    val changes = ChangeFeed.readChanges(spark, table, "day", v0)
    val replayed = ChangeFeed.applyChanges(
      Upsert.readAsOf(spark, table, v0, "day"), changes)
    assert(rows(replayed) == rows(spark.read.parquet(table)),
      "one-shot CDF application must land on the live state")
    assert(rows(replayed) != s0, "the history must actually change the table")
    // the feed classifies: k9 appears as BOTH insert (M1) and delete (M3);
    // updates appear as delete+insert pairs of the same key
    import spark.implicits._
    val k9 = changes.filter(col("k") === "k9")
      .select("_change_type").as[String].collect().sorted
    assert(k9.toSeq == Seq("delete", "insert"), s"k9 lifecycle: ${k9.toSeq}")
    val k1 = changes.filter(col("k") === "k1")
      .select("_change_type", "v").as[(String, Double)].collect().toSet
    assert(k1 == Set(("delete", 10.0), ("insert", 11.0)), s"k1 update: $k1")
  }

  test("a checkpointing consumer replays commit by commit to the same state") {
    val (table, v0, _) = history()
    val tip = TxnLog.currentVersion(spark, table)
    // walk the feed one commit at a time, checkpointing the version like a
    // streaming consumer: each step applies only that commit's changes
    var state = Upsert.readAsOf(spark, table, v0, "day")
    var checkpoint = v0
    val endVersions = TxnLog.commitsSince(spark, table, checkpoint)
      .filter(c => c.op == "upsert-end" && c.ref.isDefined).map(_.version)
    assert(endVersions.size >= 4, s"expected >=4 data commits: $endVersions")
    endVersions.foreach { v =>
      val step = ChangeFeed.readChanges(spark, table, "day", checkpoint, Some(v))
      state = ChangeFeed.applyChanges(state, step)
      checkpoint = v
    }
    assert(checkpoint == tip || checkpoint <= tip)
    assert(rows(state) == rows(spark.read.parquet(table)),
      "incremental replay must converge to the live state")
    // replaying an already-consumed range is an explicit empty feed
    assert(ChangeFeed.readChanges(spark, table, "day", tip).isEmpty)
  }

  test("a feed range reaching below the vacuum horizon fails loudly") {
    val (table, v0, _) = history()
    // vacuum everything regardless of age: pre-images below tip are gone
    val hist = new java.io.File(s"$table/_graft_history")
    hist.listFiles().foreach { d =>
      d.setLastModified(System.currentTimeMillis() - 10L * 24 * 3600 * 1000)
    }
    assert(Upsert.vacuumHistory(spark, table, minAgeMs = 1000L) > 0)
    val e = intercept[IllegalStateException] {
      ChangeFeed.readChanges(spark, table, "day", v0).count()
    }
    assert(e.getMessage.contains("vacuumed"), e.getMessage)
    // and a beyond-tip range is refused up front
    intercept[IllegalStateException] {
      ChangeFeed.readChanges(spark, table, "day", 0L,
        Some(TxnLog.currentVersion(spark, table) + 5))
    }
  }
}
