package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.batch.{ChangeFeed, ColumnMapping, Constraints, GeneratedColumns, Upsert}

/** Column mapping: rename/drop are metadata-only (zero data rewrite),
  * every read path shows the logical view, writes land under the
  * original physical names, and the physical-keyed artifacts (history
  * generations, CDF records, stats/bloom sidecars) survive untouched. */
class ColumnMappingSpec extends SparkSpec {

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def dataFiles(table: String): Map[String, (Long, Long)] = {
    def walk(d: java.io.File): Seq[java.io.File] =
      d.listFiles().toSeq.flatMap { f =>
        if (f.isDirectory && !f.getName.startsWith("_") &&
          !f.getName.startsWith(".")) walk(f)
        else if (f.getName.endsWith(".parquet")) Seq(f)
        else Seq.empty
      }
    walk(new java.io.File(table))
      .map(f => f.getPath -> (f.length(), f.lastModified())).toMap
  }

  test("rename is metadata-only and every path follows the logical name") {
    import spark.implicits._
    val t = tmp("colmap") + "/t"
    Upsert.mergeByKey(spark, t,
      (1 to 100).map(i => (s"2026-01-0${i % 3 + 1}", i.toLong, i * 1.5))
        .toDF("day", "k", "v"),
      "day", Seq("k"))
    val v0 = graft.core.TxnLog.currentVersion(spark, t)
    val before = dataFiles(t)

    ColumnMapping.rename(spark, t, "v", "speed")
    // ZERO data rewrite: every data file byte-identical in place
    assert(dataFiles(t) == before, "rename must not touch data files")
    // reads show the logical name; physical files still carry the old one
    val df = Upsert.readCommitted(spark, t, "day")
    assert(df.columns.contains("speed") && !df.columns.contains("v"))
    assert(spark.read.parquet(t).columns.contains("v"))
    assert(df.filter(col("k") === 7L).select("speed").head.getDouble(0) == 10.5)

    // writes arrive under the NEW logical name and land physically as v —
    // new files stay name-compatible with old ones (k=7 lives in
    // day=2026-01-02: 7 % 3 + 1)
    Upsert.mergeByKey(spark, t,
      Seq(("2026-01-02", 7L, 99.0)).toDF("day", "k", "speed"),
      "day", Seq("k"))
    val after = Upsert.readCommitted(spark, t, "day")
    assert(after.filter(col("k") === 7L).select("speed").head.getDouble(0) == 99.0)
    assert(spark.read.parquet(t).columns.sorted.toSeq == Seq("day", "k", "v"),
      "physical schema must stay uniform across the rename")

    // time travel: OLD versions read under the CURRENT logical names
    val asOld = Upsert.readAsOf(spark, t, v0, "day")
    assert(asOld.columns.contains("speed") && !asOld.columns.contains("v"))
    assert(asOld.filter(col("k") === 7L).select("speed").head.getDouble(0) == 10.5)

    // the change feed reads through logical names too (records are
    // physical on disk — written before AND after the rename)
    val feed = ChangeFeed.readChanges(spark, t, "day", 0L)
    assert(feed.columns.contains("speed") && !feed.columns.contains("v"))
    assert(feed.filter(col("k") === 7L &&
      col(ChangeFeed.ChangeTypeCol) === "insert").count() >= 2L)

    // renaming back to the physical name clears the map entirely
    ColumnMapping.rename(spark, t, "speed", "v")
    assert(ColumnMapping.mapping(spark, t).isEmpty)
    assert(Upsert.readCommitted(spark, t, "day").columns.contains("v"))
  }

  test("stats/bloom sidecars keyed by physical name survive a rename") {
    import spark.implicits._
    val t = tmp("colmap-idx") + "/t"
    Upsert.mergeByKey(spark, t,
      (1 to 2000).map(i => (s"2026-02-0${i % 2 + 1}", s"u$i", i.toLong))
        .toDF("day", "user_id", "v"),
      "day", Seq("user_id"))
    graft.core.BloomIndex.build(spark, t, "user_id")
    graft.core.StatsIndex.build(spark, t, "v")

    ColumnMapping.rename(spark, t, "user_id", "subject")
    ColumnMapping.rename(spark, t, "v", "amount")
    // lookups by the NEW logical names ride the OLD sidecars
    val hit = Upsert.pointLookup(spark, t, "subject", "u1337")
    assert(hit.count() == 1L)
    assert(hit.columns.contains("subject") && hit.columns.contains("amount"))
    val rng = Upsert.rangeLookup(spark, t, "amount", Some(100L), Some(110L))
    assert(rng.count() == 11L)
    assert(rng.columns.contains("amount") && !rng.columns.contains("v"))
  }

  test("drop hides the column everywhere; the name cannot resurrect") {
    import spark.implicits._
    val t = tmp("colmap-drop") + "/t"
    Upsert.mergeByKey(spark, t,
      (1 to 50).map(i => (s"2026-03-0${i % 2 + 1}", i.toLong, i * 2.0, s"x$i"))
        .toDF("day", "k", "v", "note"),
      "day", Seq("k"))
    val v0 = graft.core.TxnLog.currentVersion(spark, t)
    val before = dataFiles(t)
    ColumnMapping.drop(spark, t, "note")
    assert(dataFiles(t) == before, "drop must not touch data files")
    assert(!Upsert.readCommitted(spark, t, "day").columns.contains("note"))
    assert(!Upsert.readAsOf(spark, t, v0, "day").columns.contains("note"))
    assert(!ChangeFeed.readChanges(spark, t, "day", 0L).columns.contains("note"))
    // merges keep working without the dropped column...
    Upsert.mergeByKey(spark, t,
      Seq(("2026-03-01", 500L, 1.0)).toDF("day", "k", "v"), "day", Seq("k"))
    assert(Upsert.readCommitted(spark, t, "day")
      .filter(col("k") === 500L).count() == 1L)
    // ...but supplying the dropped name is refused (old files still hold
    // its bytes; re-adding would silently resurrect them)
    val e = intercept[IllegalArgumentException] {
      Upsert.mergeByKey(spark, t,
        Seq(("2026-03-01", 501L, 1.0, "boo")).toDF("day", "k", "v", "note"),
        "day", Seq("k"))
    }
    assert(e.getMessage.contains("DROPPED"), e.getMessage)
  }

  test("deletion vectors accept logical names and compose with lookups") {
    import spark.implicits._
    val t = tmp("colmap-dv") + "/t"
    Upsert.mergeByKey(spark, t,
      (1 to 200).map(i => (s"2026-06-0${i % 2 + 1}", s"u$i", i.toLong))
        .toDF("day", "user_id", "v"),
      "day", Seq("user_id"))
    graft.core.BloomIndex.build(spark, t, "user_id")
    ColumnMapping.rename(spark, t, "user_id", "subject")
    // a merge-on-read DELETE by the NEW logical key name
    graft.batch.DeletionVectors.deleteVectored(spark, t,
      Seq(("2026-06-02", "u7")).toDF("day", "subject"), "day", Seq("subject"))
    assert(Upsert.readCommitted(spark, t, "day")
      .filter(col("subject") === "u7").count() == 0L)
    // the DV-composed point lookup sees the subtraction through the
    // logical name too
    assert(Upsert.pointLookup(spark, t, "subject", "u7").count() == 0L)
    assert(Upsert.pointLookup(spark, t, "subject", "u8").count() == 1L)
  }

  test("layout ops (compact/zorder) accept logical column names") {
    import spark.implicits._
    val t = tmp("colmap-layout") + "/t"
    Upsert.mergeByKey(spark, t,
      (1 to 4000).map(i => (s"2026-06-0${i % 2 + 1}", i.toLong, (i * 7 % 4000).toLong))
        .toDF("day", "k", "v"),
      "day", Seq("k"))
    Upsert.mergeByKey(spark, t,
      (1 to 50).map(i => (s"2026-06-0${i % 2 + 1}", (10000 + i).toLong, i.toLong))
        .toDF("day", "k", "v"),
      "day", Seq("k"))
    ColumnMapping.rename(spark, t, "v", "score")
    // zorder by the NEW logical name resolves to the physical column
    val n = Upsert.optimizeZOrder(spark, t, "day", Seq("score", "k"),
      targetBytes = 64L * 1024)
    assert(n > 0)
    val got = Upsert.readCommitted(spark, t, "day")
    assert(got.columns.contains("score"))
    assert(got.count() == 4050L)
    assert(Upsert.compactPartitions(spark, t, "day",
      layoutCols = Seq("score")) >= 0)
  }

  test("refusals: partition columns, collisions, referenced expressions") {
    import spark.implicits._
    val t = tmp("colmap-refuse") + "/t"
    Upsert.mergeByKey(spark, t,
      (1 to 20).map(i => (s"2026-04-0${i % 2 + 1}", i.toLong, i * 2.0, i * 4.0))
        .toDF("day", "k", "v", "v2"),
      "day", Seq("k"))
    // partition column: values live in directory names
    intercept[IllegalArgumentException] {
      ColumnMapping.rename(spark, t, "day", "event_day")
    }
    intercept[IllegalArgumentException] { ColumnMapping.drop(spark, t, "day") }
    // collisions with live logical names
    intercept[IllegalArgumentException] { ColumnMapping.rename(spark, t, "v", "k") }
    // unknown column
    intercept[IllegalArgumentException] {
      ColumnMapping.rename(spark, t, "nope", "x")
    }
    // referenced by a CHECK constraint / generated column
    Constraints.add(spark, t, "v_pos", "v > 0")
    intercept[IllegalArgumentException] { ColumnMapping.rename(spark, t, "v", "w") }
    intercept[IllegalArgumentException] { ColumnMapping.drop(spark, t, "v") }
    Constraints.drop(spark, t, "v_pos")
    GeneratedColumns.add(spark, t, "v2", "v * 2")
    intercept[IllegalArgumentException] { ColumnMapping.rename(spark, t, "v", "w") }
    intercept[IllegalArgumentException] { ColumnMapping.rename(spark, t, "v2", "w") }
    GeneratedColumns.drop(spark, t, "v2")
    // now legal
    ColumnMapping.rename(spark, t, "v", "w")
    assert(ColumnMapping.logicalColumns(spark, t).contains("w"))
    // renaming another column TO the physical home of w is ambiguous
    intercept[IllegalArgumentException] { ColumnMapping.rename(spark, t, "v2", "v") }
    // a dropped physical name is not a valid target either
    ColumnMapping.drop(spark, t, "v2")
    intercept[IllegalArgumentException] { ColumnMapping.rename(spark, t, "w", "v2") }
  }

  test("a stale producer writing a renamed column's OLD name is refused") {
    import spark.implicits._
    val t = tmp("colmap-stale") + "/t"
    Upsert.mergeByKey(spark, t,
      (1 to 20).map(i => (s"2026-04-0${i % 2 + 1}", i.toLong, i * 2.0))
        .toDF("day", "k", "v"),
      "day", Seq("k"))
    ColumnMapping.rename(spark, t, "v", "speed")
    // `v` is no longer a logical column — without the refusal it would
    // pass through untranslated, merge into the renamed column's physical
    // storage, and silently reappear as `speed`
    val e = intercept[IllegalArgumentException] {
      Upsert.mergeByKey(spark, t,
        Seq(("2026-04-01", 2L, 999.0)).toDF("day", "k", "v"),
        "day", Seq("k"))
    }
    assert(e.getMessage.contains("v") && e.getMessage.contains("speed"),
      e.getMessage)
    // nothing landed
    assert(Upsert.readCommitted(spark, t, "day")
      .filter(col("k") === 2L).select("speed").head.getDouble(0) == 4.0)
    // the CURRENT logical name still merges fine
    Upsert.mergeByKey(spark, t,
      Seq(("2026-04-01", 2L, 999.0)).toDF("day", "k", "speed"),
      "day", Seq("k"))
    assert(Upsert.readCommitted(spark, t, "day")
      .filter(col("k") === 2L).select("speed").head.getDouble(0) == 999.0)
  }
}
