package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.batch.{ChangeFeed, DeletionVectors, RowTracking, Upsert}
import graft.core.TxnLog

/** Row tracking: stable `_graft_row_id`s minted at first insert, kept by
  * every update, and surviving every rewrite verb — compaction, Z-order,
  * REORG PURGE, RESTORE, CLONE — plus CDF pre/post correlation with zero
  * key knowledge and time-travel exactness. */
class RowTrackingSpec extends SparkSpec {

  private val Rid = RowTracking.RowIdCol

  private def rows(day: String, kvs: (Long, String)*): DataFrame = {
    import spark.implicits._
    kvs.map { case (k, v) => (day, k, v) }.toDF("day", "k", "v")
  }

  /** key -> row id map of the committed table. */
  private def ids(t: String): Map[Long, Long] = {
    import spark.implicits._
    Upsert.readCommitted(spark, t, "day")
      .select(col("k"), col(Rid)).as[(Long, Long)].collect().toMap
  }

  test("fresh table: merges mint unique ids, updates keep them, explicit values refused") {
    val t = Files.createTempDirectory("rowtrack1").toString + "/t"
    assert(RowTracking.enable(spark, t, "day", Seq("k")) == 0L,
      "enabling before first write backfills nothing")
    assert(RowTracking.isEnabled(spark, t))
    Upsert.mergeByKey(spark, t,
      rows("d1", 1L -> "a", 2L -> "b").unionByName(rows("d2", 3L -> "c")),
      "day", Seq("k"))
    val first = ids(t)
    assert(first.keySet == Set(1L, 2L, 3L))
    assert(first.values.toSet.size == 3, s"ids must be unique: $first")
    // update k=2, insert k=4: the update keeps its id, the insert mints a
    // fresh one disjoint from every existing id
    Upsert.mergeByKey(spark, t, rows("d1", 2L -> "B", 4L -> "d"), "day", Seq("k"))
    val second = ids(t)
    assert(second(1L) == first(1L) && second(2L) == first(2L) &&
      second(3L) == first(3L), "updates must never reassign row ids")
    assert(!first.values.toSet.contains(second(4L)),
      "a fresh row's id must be new")
    // GENERATED ALWAYS: a producer cannot forge row ids
    val forged = rows("d1", 9L -> "x").withColumn(Rid, lit(999L))
    val e = intercept[IllegalArgumentException] {
      Upsert.mergeByKey(spark, t, forged, "day", Seq("k"))
    }
    assert(e.getMessage.contains("GENERATED ALWAYS"), e.getMessage)
  }

  test("existing table: enable backfills every row once, then minting continues past them") {
    val t = Files.createTempDirectory("rowtrack2").toString + "/t"
    Upsert.mergeByKey(spark, t,
      rows("d1", 1L -> "a", 2L -> "b").unionByName(rows("d2", 3L -> "c", 4L -> "d")),
      "day", Seq("k"))
    assert(!RowTracking.isEnabled(spark, t))
    val vPre = TxnLog.currentVersion(spark, t)
    assert(RowTracking.enable(spark, t, "day", Seq("k")) == 4L)
    val first = ids(t)
    assert(first.keySet == Set(1L, 2L, 3L, 4L) && first.values.toSet.size == 4)
    // pre-enable versions time-travel exactly, without the column
    val preEnable = Upsert.readAsOf(spark, t, vPre, "day")
    assert(!preEnable.columns.contains(Rid),
      "pre-enable snapshots must not grow the column retroactively")
    // post-enable merge: matched keeps, fresh mints disjoint
    Upsert.mergeByKey(spark, t, rows("d2", 4L -> "D", 5L -> "e"), "day", Seq("k"))
    val second = ids(t)
    assert(second(4L) == first(4L))
    assert(!first.values.toSet.contains(second(5L)))
    // enabling twice is refused
    val e = intercept[IllegalArgumentException] {
      RowTracking.enable(spark, t, "day", Seq("k"))
    }
    assert(e.getMessage.contains("already on"), e.getMessage)
  }

  test("ids survive compaction, Z-order layout, and REORG PURGE") {
    val t = Files.createTempDirectory("rowtrack3").toString + "/t"
    RowTracking.enable(spark, t, "day", Seq("k"))
    // several merges -> several files per partition
    (0 until 4).foreach { i =>
      Upsert.mergeByKey(spark, t,
        rows("d1", (10L * i) -> s"a$i", (10L * i + 1) -> s"b$i"), "day", Seq("k"))
    }
    val before = ids(t)
    assert(before.size == 8 && before.values.toSet.size == 8)
    assert(Upsert.compactPartitions(spark, t, "day", minFilesToCompact = 2) >= 1,
      "fixture must actually compact")
    assert(ids(t) == before, "compaction must preserve every row id")
    Upsert.optimizeZOrder(spark, t, "day", Seq("k", Rid))
    assert(ids(t) == before, "Z-order layout must preserve every row id")
    // DV-delete one key, purge the bytes: survivors keep their ids
    DeletionVectors.deleteVectored(spark, t,
      rows("d1", 11L -> "unused").select("day", "k"), "day", Seq("k"))
    assert(ids(t) == before - 11L, "DV delete removes exactly one key")
    assert(Upsert.reorgPurge(spark, t, "day").nonEmpty, "purge must rewrite")
    assert(ids(t) == before - 11L, "REORG PURGE must preserve survivor ids")
  }

  test("CDF legs of an update correlate on row id with zero key knowledge") {
    val t = Files.createTempDirectory("rowtrack4").toString + "/t"
    RowTracking.enable(spark, t, "day", Seq("k"))
    Upsert.mergeByKey(spark, t,
      rows("d1", 1L -> "a", 2L -> "b", 3L -> "c"), "day", Seq("k"))
    val v1 = TxnLog.currentVersion(spark, t)
    Upsert.mergeByKey(spark, t, rows("d1", 2L -> "B2", 3L -> "C3", 7L -> "g"),
      "day", Seq("k"))
    val changes = ChangeFeed.readChanges(spark, t, "day", v1)
    import spark.implicits._
    // correlate WITHOUT the key: join delete legs to insert legs on the
    // row id alone — exactly what a keyless CDC consumer does
    val pre = changes.filter(col(ChangeFeed.ChangeTypeCol) === "delete")
      .select(col(Rid).as("rid"), col("v").as("v_pre"))
    val post = changes.filter(col(ChangeFeed.ChangeTypeCol) === "insert")
      .select(col(Rid).as("rid"), col("v").as("v_post"), col("k"))
    val updates = pre.join(post, "rid")
      .select("k", "v_pre", "v_post").as[(Long, String, String)].collect().toSet
    assert(updates == Set((2L, "b", "B2"), (3L, "c", "C3")),
      s"row-id join must recover exactly the updates: $updates")
    // the pure insert has no delete partner
    val inserts = post.join(pre, Seq("rid"), "left_anti")
      .select("k").as[Long].collect().toSet
    assert(inserts == Set(7L))
  }

  test("time travel, RESTORE, and CLONE: ids are exact at every version") {
    val t = Files.createTempDirectory("rowtrack5").toString + "/t"
    RowTracking.enable(spark, t, "day", Seq("k"))
    Upsert.mergeByKey(spark, t,
      rows("d1", 1L -> "a", 2L -> "b", 3L -> "c"), "day", Seq("k"))
    val v1 = TxnLog.currentVersion(spark, t)
    val atV1 = ids(t)
    Upsert.mergeByKey(spark, t, rows("d1", 2L -> "B"), "day", Seq("k"))
    Upsert.deleteByKey(spark, t, rows("d1", 3L -> "x").select("day", "k"),
      "day", Seq("k"))
    Upsert.mergeByKey(spark, t, rows("d1", 8L -> "h"), "day", Seq("k"))
    import spark.implicits._
    // time travel reads the v1 ids physically
    val asOf = Upsert.readAsOf(spark, t, v1, "day")
      .select(col("k"), col(Rid)).as[(Long, Long)].collect().toMap
    assert(asOf == atV1, "as-of snapshot must carry the v1 ids exactly")
    // RESTORE re-installs committed ids verbatim — including the deleted
    // key's original id coming back
    Upsert.restoreTo(spark, t, v1, "day", Seq("k"))
    assert(ids(t) == atV1,
      "restore must bring back the exact v1 id assignment")
    // CLONE preserves ids AND the allocation floor: a post-clone merge on
    // the clone mints ids disjoint from everything it copied
    val c = Files.createTempDirectory("rowtrack5-clone").toString + "/c"
    Upsert.cloneTo(spark, t, c, "day")
    assert(ids(c) == atV1, "clone must carry the source ids")
    Upsert.mergeByKey(spark, c, rows("d1", 9L -> "i"), "day", Seq("k"))
    val cIds = ids(c)
    assert(cIds(9L) > atV1.values.max,
      s"clone's fresh mints must clear the copied high-water mark: $cIds")
  }
}
