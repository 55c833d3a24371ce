package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.batch.{ChangeFeed, Upsert}
import graft.core.TxnLog

/** CONVERT TO (adopt-in-place): a plain partitioned-parquet directory —
  * the reference seeder's output shape — becomes a TxnLog-managed table
  * with zero rewrite, then merges/time-travels/change-feeds from v1. */
class ConvertSpec extends SparkSpec {

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  /** A foreign writer's table: plain `partitionBy` parquet, _SUCCESS and
    * all, with NO engine metadata. */
  private def seedPlain(path: String, n: Int = 40): Unit = {
    import spark.implicits._
    (1 to n).map(i => (s"2026-08-0${i % 2 + 1}", i.toLong, i * 1.0))
      .toDF("day", "k", "v")
      .write.partitionBy("day").mode("overwrite").parquet(path)
  }

  private def fileInventory(path: String): Map[String, Long] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val out = scala.collection.mutable.Map.empty[String, Long]
    def walk(p: org.apache.hadoop.fs.Path): Unit =
      fs.listStatus(p).foreach { st =>
        if (st.isDirectory) {
          if (st.getPath.getName != "_graft_txn") walk(st.getPath)
        } else if (st.getPath.getName.endsWith(".parquet"))
          out(st.getPath.toUri.getPath) = st.getModificationTime
      }
    walk(root)
    out.toMap
  }

  test("convert adopts in place: v1 claim, byte-identical files, then merges/time-travel/CDF") {
    import spark.implicits._
    val t = tmp("convert") + "/t"
    seedPlain(t)
    val before = fileInventory(t)
    assert(before.nonEmpty)

    val v = Upsert.convert(spark, t, "day")
    assert(v == 1L, s"first manifest commit must be v1, got v$v")
    assert(TxnLog.currentVersion(spark, t) == 1L)
    // zero rewrite: identical file names AND mtimes
    assert(fileInventory(t) == before,
      "convert must not touch a single data file")
    // the claim names the adopted partitions
    val cs = TxnLog.commitsSince(spark, t, 0L)
    assert(cs.map(_.op) == Seq("convert"))
    assert(cs.head.partitions == Set("2026-08-01", "2026-08-02"))

    // a second convert is refused — already managed
    val again = intercept[IllegalArgumentException](Upsert.convert(spark, t, "day"))
    assert(again.getMessage.contains("already"))

    // the adopted table reads committed
    val adopted = Upsert.readCommitted(spark, t, "day")
    assert(adopted.count() == 40)

    // …and MERGES like any engine-written table (update + insert)
    Upsert.mergeByKey(spark, t,
      Seq(("2026-08-01", 2L, 999.0), ("2026-08-01", 100L, 100.0))
        .toDF("day", "k", "v"), "day", Seq("k"))
    val now = Upsert.readCommitted(spark, t, "day")
    assert(now.count() == 41)
    assert(now.filter($"k" === 2L).select("v").as[Double].head() == 999.0)

    // time travel to v1 reconstructs the ADOPTED state exactly (the merge
    // retained the adopted files as its pre-image)
    val asOf1 = Upsert.readAsOf(spark, t, 1L, "day")
    assert(asOf1.count() == 40)
    assert(asOf1.filter($"k" === 2L).select("v").as[Double].head() == 2.0)
    assert(asOf1.filter($"k" === 100L).isEmpty)

    // the change feed tails commits past the conversion: exactly the
    // merge's legs, nothing synthesized for the adopted history
    val changes = ChangeFeed.readChanges(spark, t, "day", fromVersion = 1L)
    val legs = changes.groupBy("_change_type").count()
      .as[(String, Long)].collect().toMap
    assert(legs == Map("insert" -> 2L, "delete" -> 1L),
      s"CDF from v1 must carry the merge only: $legs")

    // sidecars build over the adopted+merged files
    graft.core.StatsIndex.build(spark, t, "k")
    val hit = Upsert.rangeLookup(spark, t, "k", Some(100L), Some(100L))
    assert(hit.count() == 1)
  }

  test("migration on-ramp e2e: convert a foreign table, adopt its id column as identity, merge") {
    import spark.implicits._
    // a foreign writer's table that already carries its own unique BIGINT
    // ids — the realistic migration: adopt the directory, adopt the
    // sequence, keep writing
    val t = tmp("convert-migrate") + "/t"
    (1 to 10).map(i => (s"2026-08-0${i % 2 + 1}", s"k$i", i.toLong))
      .toDF("day", "k", "uid")
      .write.partitionBy("day").mode("overwrite").parquet(t)
    assert(Upsert.convert(spark, t, "day") == 1L)
    graft.batch.IdentityColumns.add(spark, t, "uid")
    // update an adopted row + insert a new one (key-only rows: uid is
    // assigned, nothing else to cover): the adopted id sticks, the new
    // row continues the adopted sequence past its max
    Upsert.mergeByKey(spark, t,
      Seq(("2026-08-01", "k2"), ("2026-08-02", "fresh"))
        .toDF("day", "k"), "day", Seq("k"))
    val ids = Upsert.readCommitted(spark, t, "day")
      .select("k", "uid").as[(String, Long)].collect().toMap
    assert(ids("k2") == 2L, "an adopted row's id survives its first managed update")
    // the range covers every source row (the matched update burns one id,
    // Delta-style: gaps allowed, monotonicity guaranteed), so the fresh
    // row lands PAST the adopted max — not necessarily at max+1
    assert(ids("fresh") > 10L, s"the sequence resumes past the adopted max: $ids")
    assert(ids.size == 11 && ids.values.toSeq.distinct.size == 11)
    // and the adopted history is still reachable: v1 = the foreign state
    assert(Upsert.readAsOf(spark, t, 1L, "day").count() == 10)
  }

  test("Maintain convert mode adopts over the ops surface") {
    val t = tmp("convert-maint") + "/t"
    seedPlain(t, n = 10)
    val lines = graft.Maintain.runMode(spark, t, "convert", Seq("day"),
      graft.core.GraftConfig.load().maintenance)
    assert(lines.exists(l => l.contains("\"op\":\"convert\"") &&
      l.contains("\"version\":1")), s"got $lines")
    assert(TxnLog.currentVersion(spark, t) == 1L)
    assert(Upsert.readCommitted(spark, t, "day").count() == 10)
    // missing args and re-converts fail loudly through the same surface
    intercept[RuntimeException](graft.Maintain.runMode(spark, t, "convert",
      Nil, graft.core.GraftConfig.load().maintenance))
    intercept[IllegalArgumentException](graft.Maintain.runMode(spark, t,
      "convert", Seq("day"), graft.core.GraftConfig.load().maintenance))
  }

  test("convert refuses non-Hive layouts, wrong columns, and managed tables") {
    import spark.implicits._
    // unpartitioned: data files loose at the root
    val flat = tmp("convert-flat") + "/t"
    (1 to 5).toDF("k").write.mode("overwrite").parquet(flat)
    val e1 = intercept[IllegalArgumentException](Upsert.convert(spark, flat, "day"))
    assert(e1.getMessage.contains("root"))

    // wrong partition column name
    val wrong = tmp("convert-wrong") + "/t"
    seedPlain(wrong)
    val e2 = intercept[IllegalArgumentException](Upsert.convert(spark, wrong, "dt"))
    assert(e2.getMessage.contains("dt=<value>"))

    // nested partitioning
    val nested = tmp("convert-nested") + "/t"
    (1 to 8).map(i => (s"2026-08-0${i % 2 + 1}", s"h$i", i.toLong))
      .toDF("day", "hr", "k")
      .write.partitionBy("day", "hr").mode("overwrite").parquet(nested)
    val e3 = intercept[IllegalArgumentException](Upsert.convert(spark, nested, "day"))
    assert(e3.getMessage.contains("nested"))

    // a non-parquet file inside a partition
    val alien = tmp("convert-alien") + "/t"
    seedPlain(alien)
    val fs = new org.apache.hadoop.fs.Path(alien)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val bad = new org.apache.hadoop.fs.Path(s"$alien/day=2026-08-01/rogue.csv")
    val out = fs.create(bad, true); out.write("x".getBytes); out.close()
    val e4 = intercept[IllegalArgumentException](Upsert.convert(spark, alien, "day"))
    assert(e4.getMessage.contains("non-parquet"))

    // empty dir / nothing to adopt; missing dir
    val empty = tmp("convert-empty")
    intercept[IllegalArgumentException](Upsert.convert(spark, empty, "day"))
    intercept[IllegalArgumentException](
      Upsert.convert(spark, empty + "/nope", "day"))

    // an engine-written table is already managed
    val managed = tmp("convert-managed") + "/t"
    Upsert.mergeByKey(spark, managed,
      Seq(("2026-08-01", 1L, 1.0)).toDF("day", "k", "v"), "day", Seq("k"))
    intercept[IllegalArgumentException](Upsert.convert(spark, managed, "day"))
  }
}
