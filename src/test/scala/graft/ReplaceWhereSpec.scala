package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.batch.{ChangeFeed, RowTracking, Upsert}
import graft.core.TxnLog

/** `replaceWhere` — Delta's predicate-scoped INSERT OVERWRITE: matching
  * rows leave, incoming rows (which must THEMSELVES match) enter, in one
  * verb riding the ordinary merge machinery (claims, CDF, retain-first,
  * identity/row-tracking). */
class ReplaceWhereSpec extends SparkSpec {

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toString + "/t"

  private def seed(t: String): Unit = {
    import spark.implicits._
    Upsert.mergeByKey(spark, t,
      Seq(("d1", 1L, 10.0), ("d1", 2L, 20.0),
        ("d2", 3L, 30.0), ("d2", 4L, 40.0),
        ("d3", 5L, 50.0))
        .toDF("day", "k", "v"),
      "day", Seq("k"))
  }

  private def rowsOf(t: String): Set[(String, Long, Double)] = {
    import spark.implicits._
    Upsert.readCommitted(spark, t, "day")
      .select("day", "k", "v").as[(String, Long, Double)].collect().toSet
  }

  test("partition-slice replace: the slice becomes exactly the new rows, " +
      "sibling partitions keep their exact files") {
    import spark.implicits._
    val t = tmp("rw")
    seed(t)
    def files(sub: String) = {
      val d = new java.io.File(s"$t/day=$sub")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val d2Before = files("d2")
    val d3Before = files("d3")
    val touched = Upsert.replaceWhere(spark, t,
      Seq(("d1", 7L, 70.0), ("d1", 8L, 80.0)).toDF("day", "k", "v"),
      "day", Seq("k"), "day = 'd1'")
    assert(touched == Seq("d1"), s"touched: $touched")
    assert(rowsOf(t) == Set(("d1", 7L, 70.0), ("d1", 8L, 80.0),
      ("d2", 3L, 30.0), ("d2", 4L, 40.0), ("d3", 5L, 50.0)))
    assert(files("d2") == d2Before && files("d3") == d3Before,
      "untouched partitions must be untouched BYTES")
  }

  test("incoming rows outside the predicate are refused; nothing is written") {
    import spark.implicits._
    val t = tmp("rwviol")
    seed(t)
    val v0 = TxnLog.currentVersion(spark, t)
    val e = intercept[IllegalArgumentException] {
      Upsert.replaceWhere(spark, t,
        Seq(("d1", 7L, 70.0), ("d2", 9L, 90.0)).toDF("day", "k", "v"),
        "day", Seq("k"), "day = 'd1'")
    }
    assert(e.getMessage.contains("satisfy the predicate"), e.getMessage)
    assert(TxnLog.currentVersion(spark, t) == v0, "no commit on refusal")
    assert(rowsOf(t).size == 5)
  }

  test("non-partition predicate: matching rows leave, UNKNOWN (null) rows " +
      "survive — SQL three-valued semantics") {
    import spark.implicits._
    val t = tmp("rwpred")
    Upsert.mergeByKey(spark, t,
      Seq(("d1", 1L, Some(10.0)), ("d1", 2L, Some(90.0)),
        ("d1", 3L, Option.empty[Double]), ("d2", 4L, Some(95.0)))
        .toDF("day", "k", "v"),
      "day", Seq("k"))
    Upsert.replaceWhere(spark, t,
      Seq(("d1", 7L, Some(99.0))).toDF("day", "k", "v"),
      "day", Seq("k"), "v > 50.0")
    val got = Upsert.readCommitted(spark, t, "day")
      .select("day", "k").as[(String, Long)].collect().toSet
    // k=2 (90>50) and k=4 (95>50) replaced away; k=3 (null v) survives
    assert(got == Set(("d1", 1L), ("d1", 3L), ("d1", 7L)), s"got $got")
  }

  test("empty incoming rows: replaceWhere is the pure predicate DELETE, " +
      "and the change feed shows exactly the departures") {
    import spark.implicits._
    val t = tmp("rwdel")
    seed(t)
    val v0 = TxnLog.currentVersion(spark, t)
    val touched = Upsert.replaceWhere(spark, t,
      Seq.empty[(String, Long, Double)].toDF("day", "k", "v"),
      "day", Seq("k"), "day = 'd2'")
    assert(touched == Seq("d2"))
    assert(rowsOf(t) == Set(("d1", 1L, 10.0), ("d1", 2L, 20.0),
      ("d3", 5L, 50.0)))
    val ch = ChangeFeed.readChanges(spark, t, "day", v0)
      .select("k", ChangeFeed.ChangeTypeCol).as[(Long, String)].collect().toSet
    assert(ch == Set((3L, "delete"), (4L, "delete")), s"feed: $ch")
  }

  test("a key the incoming rows reuse is an UPDATE, not delete+insert: " +
      "row-tracking ids are retained for it") {
    import spark.implicits._
    val t = tmp("rwid")
    seed(t)
    RowTracking.enable(spark, t, "day", Seq("k"))
    val idBefore = Upsert.readCommitted(spark, t, "day")
      .filter(col("k") === 1L)
      .select(RowTracking.RowIdCol).as[Long].head()
    Upsert.replaceWhere(spark, t,
      Seq(("d1", 1L, 11.0), ("d1", 9L, 99.0)).toDF("day", "k", "v"),
      "day", Seq("k"), "day = 'd1'")
    val after = Upsert.readCommitted(spark, t, "day").filter(col("day") === "d1")
      .select(col("k"), col(RowTracking.RowIdCol))
      .as[(Long, Long)].collect().toMap
    assert(after.keySet == Set(1L, 9L), s"d1 keys: ${after.keySet}")
    assert(after(1L) == idBefore,
      "the reused key must keep its row id (update, not delete+insert)")
    assert(after(9L) != idBefore, "the new key mints a fresh id")
  }

  test("brand-new table: replaceWhere is a pure insert") {
    import spark.implicits._
    val t = tmp("rwnew")
    val touched = Upsert.replaceWhere(spark, t,
      Seq(("d1", 1L, 1.0)).toDF("day", "k", "v"),
      "day", Seq("k"), "day = 'd1'")
    assert(touched == Seq("d1"))
    assert(rowsOf(t) == Set(("d1", 1L, 1.0)))
  }
}
