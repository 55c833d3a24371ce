package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.batch.Upsert

/** Partition-granularity MERGE: matched keys update, new keys insert,
  * untouched partitions are untouched BYTES (same files on disk) — the
  * delta-scaled property that makes upsert viable on a 100 TB table. */
class UpsertSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def seed(table: String): Unit = {
    import spark.implicits._
    Seq(
      ("2026-01-01", "k1", 10.0), ("2026-01-01", "k2", 20.0),
      ("2026-01-02", "k3", 30.0), ("2026-01-02", "k4", 40.0),
      ("2026-01-03", "k5", 50.0))
      .toDF("day", "k", "v")
      .write.partitionBy("day").mode("overwrite").parquet(table)
  }

  private def fileIndex(dir: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(dir))
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath -> f.lastModified()).toMap
  }

  test("mergeByKey: update + insert in touched partition; siblings keep their exact files") {
    import spark.implicits._
    val table = tmp("upsert")
    seed(table)
    val before = fileIndex(table)

    val updates = Seq(
      ("2026-01-02", "k3", 300.0), // matched → update
      ("2026-01-02", "k9", 90.0),  // unmatched in existing partition → insert
      ("2026-01-04", "k7", 70.0))  // brand-new partition → insert
      .toDF("day", "k", "v")

    val touched = Upsert.mergeByKey(spark, table, updates, "day", Seq("k"))
    assert(touched == Seq("2026-01-02", "2026-01-04"))

    val after = spark.read.parquet(table)
      .select("day", "k", "v").as[(String, String, Double)].collect().toSet
    assert(after == Set(
      ("2026-01-01", "k1", 10.0), ("2026-01-01", "k2", 20.0),
      ("2026-01-02", "k3", 300.0), ("2026-01-02", "k4", 40.0),
      ("2026-01-02", "k9", 90.0),
      ("2026-01-03", "k5", 50.0),
      ("2026-01-04", "k7", 70.0)))

    // untouched partitions: identical file paths and mtimes (zero rewrite)
    val untouchedBefore = before.filter(p =>
      p._1.contains("day=2026-01-01") || p._1.contains("day=2026-01-03"))
    val afterIdx = fileIndex(table)
    untouchedBefore.foreach { case (path, mtime) =>
      assert(afterIdx.get(path).contains(mtime), s"sibling partition rewritten: $path")
    }
    // touched partition: all-new files (atomic republish, not in-place edit)
    assert(!afterIdx.keys.exists(before.keySet.filter(_.contains("day=2026-01-02"))),
      "old 01-02 files must be retired")
  }

  test("mergeByKey: composite keys match on the full tuple") {
    import spark.implicits._
    val table = tmp("upsert-ck")
    Seq(("2026-01-01", "a", 1, 10.0), ("2026-01-01", "a", 2, 20.0))
      .toDF("day", "k1", "k2", "v")
      .write.partitionBy("day").mode("overwrite").parquet(table)
    val upd = Seq(("2026-01-01", "a", 2, 200.0), ("2026-01-01", "b", 2, 99.0))
      .toDF("day", "k1", "k2", "v")
    Upsert.mergeByKey(spark, table, upd, "day", Seq("k1", "k2"))
    val after = spark.read.parquet(table)
      .select("k1", "k2", "v").as[(String, Int, Double)].collect().toSet
    // (a,1) survives untouched, (a,2) updates, (b,2) inserts — a
    // single-column match on k1 alone would have clobbered (a,1) too
    assert(after == Set(("a", 1, 10.0), ("a", 2, 200.0), ("b", 2, 99.0)))
  }

  test("mergeByKey: partition values needing path escaping update in place") {
    import spark.implicits._
    val table = tmp("upsert-esc")
    // ':' is escaped by partitionBy (hour=2026-01-01 10%3A00); building the
    // dir from the raw value would miss it and publish a duplicate sibling
    Seq(("2026-01-01 10:00", "k1", 1.0), ("2026-01-01 11:00", "k2", 2.0))
      .toDF("hour", "k", "v")
      .write.partitionBy("hour").mode("overwrite").parquet(table)
    val upd = Seq(("2026-01-01 10:00", "k1", 100.0)).toDF("hour", "k", "v")
    Upsert.mergeByKey(spark, table, upd, "hour", Seq("k"))
    val after = spark.read.parquet(table)
      .select("hour", "k", "v").as[(String, String, Double)].collect().toSet
    assert(after == Set(("2026-01-01 10:00", "k1", 100.0), ("2026-01-01 11:00", "k2", 2.0)),
      s"matched row must UPDATE, not duplicate: $after")
    // exactly one physical dir per partition value — no unescaped sibling
    val dirs = new java.io.File(table).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("hour=")).map(_.getName).toSeq
    assert(dirs.size == 2, s"no duplicate partition dirs: $dirs")
  }

  test("mergeByKey: duplicate keys or null partition values fail fast") {
    import spark.implicits._
    val table = tmp("upsert-dup")
    seed(table)
    val dup = Seq(("2026-01-01", "k1", 1.0), ("2026-01-01", "k1", 2.0))
      .toDF("day", "k", "v")
    val e = intercept[IllegalArgumentException] {
      Upsert.mergeByKey(spark, table, dup, "day", Seq("k"))
    }
    assert(e.getMessage.contains("duplicate key"))
    val nullPart = Seq((Option.empty[String], "k9", 9.0)).toDF("day", "k", "v")
    intercept[IllegalArgumentException] {
      Upsert.mergeByKey(spark, table, nullPart, "day", Seq("k"))
    }
    // table unchanged by either refused merge
    assert(spark.read.parquet(table).count() == 5)
  }
}
