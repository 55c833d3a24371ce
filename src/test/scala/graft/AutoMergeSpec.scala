package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.batch.{ChangeFeed, Constraints, GeneratedColumns, Upsert}

/** Merge-time schema evolution — the Delta `schema.autoMerge.enabled`
  * analog (the reference enables it session-wide, ref
  * `SparkManager.scala:36`): a merge whose updates carry NEW columns
  * widens the touched partitions (old rows null-fill), untouched
  * partitions stay narrow and read null-filled through the mergeSchema
  * union read path, pre-widening snapshots time-travel back EXACT, and
  * everything refuses loudly when the toggle is off. */
class AutoMergeSpec extends SparkSpec {

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private val Toggle = "graft.schema.autoMerge.enabled"

  private def withAutoMerge[A](body: => A): A = {
    spark.conf.set(Toggle, "true")
    try body finally spark.conf.unset(Toggle)
  }

  private def seed(t: String): Unit = {
    import spark.implicits._
    Upsert.mergeByKey(spark, t,
      (1 to 40).map(i => (s"2026-05-0${i % 2 + 1}", i.toLong, i * 1.0))
        .toDF("day", "k", "v"),
      "day", Seq("k"))
  }

  test("off by default: a widening merge is refused loudly, nothing lands") {
    import spark.implicits._
    val t = tmp("automerge-off") + "/t"
    seed(t)
    val e = intercept[Exception] {
      Upsert.mergeByKey(spark, t,
        Seq(("2026-05-01", 2L, 2.0, "eu")).toDF("day", "k", "v", "region"),
        "day", Seq("k"))
    }
    assert(e.getMessage.contains("region") && e.getMessage.contains(Toggle),
      e.getMessage)
    val committed = Upsert.readCommitted(spark, t, "day")
    assert(!committed.columns.contains("region"))
    assert(committed.filter(col("k") === 2L).select("v").head.getDouble(0) == 2.0)
    assert(committed.count() == 40L)
  }

  test("widening merge: new column lands, old rows null-fill, " +
      "untouched partitions read null-filled") {
    import spark.implicits._
    val t = tmp("automerge-on") + "/t"
    seed(t)
    withAutoMerge {
      // touch ONLY day 2026-05-01 (even keys): update k=2, insert k=100
      Upsert.mergeByKey(spark, t,
        Seq(("2026-05-01", 2L, 2.5, "eu"), ("2026-05-01", 100L, 100.0, "us"))
          .toDF("day", "k", "v", "region"),
        "day", Seq("k"))
    }
    val committed = Upsert.readCommitted(spark, t, "day")
    assert(committed.columns.contains("region"))
    // merged rows carry the value
    assert(committed.filter(col("k") === 2L).select("region").head.getString(0) == "eu")
    assert(committed.filter(col("k") === 100L).select("region").head.getString(0) == "us")
    // surviving rows of the touched partition null-filled
    assert(committed.filter(col("k") === 4L).select("region").head.isNullAt(0))
    // rows of the UNTOUCHED partition (day 02, odd keys) null-fill through
    // the union read path — their files never rewrote
    assert(committed.filter(col("k") === 3L).select("region").head.isNullAt(0))
    assert(committed.count() == 41L)
    // plain parquet read agrees once mergeSchema is requested
    val plain = spark.read.option("mergeSchema", "true").parquet(t)
    assert(plain.columns.contains("region"))
    // a later merge carrying the widened schema into the narrow partition
    // widens it too (its survivors null-fill), no special casing
    withAutoMerge {
      Upsert.mergeByKey(spark, t,
        Seq(("2026-05-02", 3L, 3.5, "ap")).toDF("day", "k", "v", "region"),
        "day", Seq("k"))
    }
    val after = Upsert.readCommitted(spark, t, "day")
    assert(after.filter(col("k") === 3L).select("region").head.getString(0) == "ap")
    assert(after.filter(col("k") === 5L).select("region").head.isNullAt(0))
    // coverage discipline now includes the widened column: a merge into
    // the WIDENED partition that omits it is refused (survivors would
    // silently lose it)
    val e = intercept[Exception] {
      Upsert.mergeByKey(spark, t,
        Seq(("2026-05-01", 6L, 6.5)).toDF("day", "k", "v"),
        "day", Seq("k"))
    }
    assert(e.getMessage.contains("region"), e.getMessage)
  }

  test("pre-widening snapshots time-travel back EXACT (no phantom column); " +
      "restore across the widening is refused") {
    import spark.implicits._
    val t = tmp("automerge-tt") + "/t"
    seed(t)
    val vNarrow = graft.core.TxnLog.currentVersion(spark, t)
    withAutoMerge {
      Upsert.mergeByKey(spark, t,
        Seq(("2026-05-01", 2L, 2.5, "eu")).toDF("day", "k", "v", "region"),
        "day", Seq("k"))
    }
    // the snapshot BEFORE the widening reads its exact narrow schema —
    // the widened partition resolves through its retained pre-image, and
    // schema inference must not leak the new column back in time
    val asOf = Upsert.readAsOf(spark, t, vNarrow, "day")
    assert(asOf.columns.sorted.toSeq == Seq("day", "k", "v"),
      s"pre-widening snapshot schema: ${asOf.columns.mkString(",")}")
    assert(asOf.count() == 40L)
    assert(asOf.filter(col("k") === 2L).select("v").head.getDouble(0) == 2.0)
    // restore to the pre-widening version is a schema change — refused
    val e = intercept[IllegalArgumentException] {
      Upsert.restoreTo(spark, t, vNarrow, "day", Seq("k"))
    }
    assert(e.getMessage.contains("schema"), e.getMessage)
  }

  test("the change feed spans the widening: pre-widening commits null-fill") {
    import spark.implicits._
    val t = tmp("automerge-cdf") + "/t"
    seed(t)
    withAutoMerge {
      Upsert.mergeByKey(spark, t,
        Seq(("2026-05-01", 2L, 2.5, "eu")).toDF("day", "k", "v", "region"),
        "day", Seq("k"))
    }
    val feed = ChangeFeed.readChanges(spark, t, "day", 0L)
    assert(feed.columns.contains("region"))
    // the seed commit's inserts (pre-widening records) read null-filled
    assert(feed.filter(col("k") === 4L &&
      col(ChangeFeed.ChangeTypeCol) === "insert").select("region").head.isNullAt(0))
    // the widening merge's insert side carries the value
    assert(feed.filter(col("k") === 2L &&
        col(ChangeFeed.ChangeTypeCol) === "insert" && col("v") === 2.5)
      .select("region").head.getString(0) == "eu")
  }

  test("the table tail crosses a widening commit: appended rows carry the " +
      "new column, earlier batches replayed after it null-fill") {
    import spark.implicits._
    val t = tmp("automerge-tail") + "/t"
    val ckpt = tmp("automerge-tail-ckpt")
    seed(t)
    // drain the pre-widening state through the tail
    val cols0 = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    graft.streaming.TableTailStream.drain(spark, t, "day", ckpt) { (b, _, _) =>
      cols0 += b.columns.toSeq.sorted
    }
    assert(cols0.flatten.toSet == Set("day", "k", "v"))
    // a widening APPEND-only merge (fresh keys — the tail must not refuse)
    withAutoMerge {
      Upsert.mergeByKey(spark, t,
        Seq(("2026-05-01", 100L, 100.0, "eu"), ("2026-05-02", 101L, 101.0, "us"))
          .toDF("day", "k", "v", "region"),
        "day", Seq("k"))
    }
    val emitted = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Double, Option[String])]
    graft.streaming.TableTailStream.drain(spark, t, "day", ckpt) { (b, _, _) =>
      assert(b.columns.contains("region"),
        s"post-widening batches carry the new column: ${b.columns.mkString(",")}")
      emitted ++= b.select("k", "v", "region")
        .as[(Long, Double, Option[String])].collect()
    }
    assert(emitted.toSet == Set((100L, 100.0, Some("eu")),
      (101L, 101.0, Some("us"))),
      s"the widening commit's appends flow with their values: $emitted")
    // a FRESH checkpoint replays the whole history — pre-widening commits
    // must null-fill the new column, not refuse the union
    val ckpt2 = tmp("automerge-tail-ckpt2")
    val all = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Option[String])]
    graft.streaming.TableTailStream.drain(spark, t, "day", ckpt2) { (b, _, _) =>
      if (b.columns.contains("region"))
        all ++= b.select("k", "region").as[(Long, Option[String])].collect()
      else all ++= b.select("k").as[Long].collect().map(_ -> None)
    }
    assert(all.size == 42 && all.count(_._2.isDefined) == 2,
      s"full replay: 40 null-filled + 2 widened, got ${all.size} / " +
        s"${all.count(_._2.isDefined)}")
  }

  test("refusals: key columns never widen; type conflicts are loud; " +
      "generated/constraint interplay") {
    import spark.implicits._
    val t = tmp("automerge-refuse") + "/t"
    seed(t)
    withAutoMerge {
      // a key column absent from the table cannot be added by evolution
      val e1 = intercept[Exception] {
        Upsert.mergeByKey(spark, t,
          Seq(("2026-05-01", 2L, "x", 2.5)).toDF("day", "k", "k2", "v"),
          "day", Seq("k", "k2"))
      }
      assert(e1.getMessage.contains("k2"), e1.getMessage)
      // same-name column with a DIFFERENT type is a conflict, not a widen
      val e2 = intercept[Exception] {
        Upsert.mergeByKey(spark, t,
          Seq(("2026-05-01", 2L, "fast", "eu")).toDF("day", "k", "v", "region"),
          "day", Seq("k"))
      }
      assert(e2.getMessage.toLowerCase.contains("conflict") ||
        e2.getMessage.contains("v"), e2.getMessage)
      // a CHECK constraint over existing columns still validates rows of a
      // widening merge (zero interplay: the probe runs on the updates)
      Constraints.add(spark, t, "v_pos", "v > 0")
      val e3 = intercept[IllegalArgumentException] {
        Upsert.mergeByKey(spark, t,
          Seq(("2026-05-01", 2L, -1.0, "eu")).toDF("day", "k", "v", "region"),
          "day", Seq("k"))
      }
      assert(e3.getMessage.contains("v_pos"), e3.getMessage)
      Constraints.drop(spark, t, "v_pos")
      // a generated column computed from existing inputs lands on the
      // widening merge like any other (generation + widening compose)
      GeneratedColumns.add(spark, t, "v", "cast(k as double)")
      Upsert.mergeByKey(spark, t,
        Seq(("2026-05-01", 2L, "eu")).toDF("day", "k", "region"),
        "day", Seq("k"))
      val row = Upsert.readCommitted(spark, t, "day").filter(col("k") === 2L)
      assert(row.select("v").head.getDouble(0) == 2.0)
      assert(row.select("region").head.getString(0) == "eu")
      GeneratedColumns.drop(spark, t, "v")
    }
  }
}
