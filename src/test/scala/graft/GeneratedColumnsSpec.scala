package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.batch.{GeneratedColumns, Upsert}

/** Generated columns: omitted values are computed (including the
  * partition column — the self-partitioning table), explicit values are
  * held to the expression by name, deletes are exempt, and registration
  * validates existing data. */
class GeneratedColumnsSpec extends SparkSpec {

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  test("registration validates existing rows; omitted columns are computed") {
    import spark.implicits._
    val t = tmp("gencol") + "/t"
    // v2 is derived: v * 2
    Upsert.mergeByKey(spark, t,
      (1 to 50).map(i => (s"2026-01-0${i % 2 + 1}", i.toLong, i.toDouble, i * 2.0))
        .toDF("day", "k", "v", "v2"),
      "day", Seq("k"))
    // mismatching expression is refused up front
    intercept[IllegalArgumentException] {
      GeneratedColumns.add(spark, t, "v2", "v * 3")
    }
    intercept[IllegalArgumentException] {
      GeneratedColumns.add(spark, t, "no_such_col", "v * 2")
    }
    GeneratedColumns.add(spark, t, "v2", "v * 2")
    assert(GeneratedColumns.list(spark, t) == Map("v2" -> "v * 2"))

    // an update WITHOUT v2: generated, and it counts as column coverage
    // (without generation this narrow update would be refused)
    Upsert.mergeByKey(spark, t,
      Seq(("2026-01-01", 500L, 7.0)).toDF("day", "k", "v"), "day", Seq("k"))
    val row = Upsert.readCommitted(spark, t, "day")
      .filter(col("k") === 500L).select("v", "v2").head
    assert(row.getDouble(0) == 7.0 && row.getDouble(1) == 14.0,
      s"omitted generated column must be computed: $row")

    // an explicit CORRECT value passes; a wrong one is refused by name,
    // before any claim
    Upsert.mergeByKey(spark, t,
      Seq(("2026-01-01", 501L, 3.0, 6.0)).toDF("day", "k", "v", "v2"),
      "day", Seq("k"))
    val v0 = graft.core.TxnLog.currentVersion(spark, t)
    val e = intercept[IllegalArgumentException] {
      Upsert.mergeByKey(spark, t,
        Seq(("2026-01-01", 502L, 3.0, 99.0)).toDF("day", "k", "v", "v2"),
        "day", Seq("k"))
    }
    assert(e.getMessage.contains("v2 GENERATED ALWAYS AS"),
      s"mismatch must name the generated column: ${e.getMessage}")
    assert(graft.core.TxnLog.currentVersion(spark, t) == v0)
    assert(Upsert.readCommitted(spark, t, "day")
      .filter(col("k") === 502L).count() == 0L)

    // deletes are exempt: key-only updates can't even evaluate v * 2
    Upsert.deleteByKey(spark, t, Seq(("2026-01-01", 500L)).toDF("day", "k"),
      "day", Seq("k"))
    assert(Upsert.readCommitted(spark, t, "day")
      .filter(col("k") === 500L).count() == 0L)

    GeneratedColumns.drop(spark, t, "v2")
    intercept[IllegalArgumentException] { GeneratedColumns.drop(spark, t, "v2") }
    // post-drop, the formerly-mismatching write lands
    Upsert.mergeByKey(spark, t,
      Seq(("2026-01-01", 503L, 3.0, 99.0)).toDF("day", "k", "v", "v2"),
      "day", Seq("k"))
    assert(Upsert.readCommitted(spark, t, "day")
      .filter(col("k") === 503L).count() == 1L)
  }

  test("a generated PARTITION column: producers ship raw rows, the table " +
      "partitions itself") {
    import spark.implicits._
    val t = tmp("gencol-part") + "/t"
    // event_date derives from the event timestamp — Delta's marquee
    // generated-column use
    Upsert.mergeByKey(spark, t,
      Seq(("2026-03-01", 1L, ts("2026-03-01 10:00:00")),
          ("2026-03-02", 2L, ts("2026-03-02 11:00:00")))
        .toDF("day", "k", "event_ts"),
      "day", Seq("k"))
    GeneratedColumns.add(spark, t, "day",
      "date_format(event_ts, 'yyyy-MM-dd')")
    // raw rows WITHOUT the partition column land in the right partitions
    Upsert.mergeByKey(spark, t,
      Seq((3L, ts("2026-03-02 12:00:00")), (4L, ts("2026-03-03 09:00:00")))
        .toDF("k", "event_ts"),
      "day", Seq("k"))
    val got = Upsert.readCommitted(spark, t, "day")
      .select(col("day").cast("string"), col("k"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("2026-03-01", 1L), ("2026-03-02", 2L),
      ("2026-03-02", 3L), ("2026-03-03", 4L)), s"got $got")
    assert(new java.io.File(s"$t/day=2026-03-03").isDirectory,
      "the generated partition value must create its directory")

    // deleteByKey carries the generated PARTITION column explicitly (delete
    // keys must include it) but NOT its expression input event_ts — the
    // validation probe must skip the unanalyzable expression instead of
    // dying in analysis (delete-marked rows are exempt from it anyway)
    Upsert.deleteByKey(spark, t,
      Seq(("2026-03-02", 3L)).toDF("day", "k"), "day", Seq("k"))
    val after = Upsert.readCommitted(spark, t, "day")
      .select(col("k")).collect().map(_.getLong(0)).toSet
    assert(after == Set(1L, 2L, 4L), s"delete must land: $after")
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
}
