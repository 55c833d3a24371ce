package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.batch.{Constraints, Upsert}

/** CHECK constraints: ADD validates existing data, merges enforce on the
  * rows being written (deletes exempt, SQL-standard UNKNOWN satisfies),
  * violations fail loudly by name BEFORE any claim, and the registry
  * storage is crash-safe max-wins. */
class ConstraintsSpec extends SparkSpec {

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def mkTable(): String = {
    import spark.implicits._
    val t = tmp("constraints") + "/t"
    Upsert.mergeByKey(spark,
      t,
      (1 to 100).map(i => (s"2026-01-0${i % 2 + 1}", i.toLong, i.toDouble))
        .toDF("day", "k", "v"),
      "day", Seq("k"))
    t
  }

  private def rows(df: DataFrame): Set[(String, Long)] =
    df.select(col("day").cast("string"), col("k"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

  private def merge(t: String, day: String, k: Long, v: java.lang.Double): Unit = {
    import spark.implicits._
    Upsert.mergeByKey(spark, t,
      Seq((day, k, v)).toDF("day", "k", "v"), "day", Seq("k"))
    ()
  }

  test("add validates existing data; merges enforce by name; nothing is written") {
    val t = mkTable()
    Constraints.add(spark, t, "v_nonneg", "v >= 0")
    assert(Constraints.list(spark, t) == Map("v_nonneg" -> "v >= 0"))
    // registering a constraint current rows violate is refused up front
    val bad = intercept[IllegalArgumentException] {
      Constraints.add(spark, t, "impossible", "v > 1000000")
    }
    assert(bad.getMessage.contains("existing rows"))
    assert(Constraints.list(spark, t).keySet == Set("v_nonneg"))

    merge(t, "2026-01-01", 500L, 5.0) // satisfying rows merge as usual
    val before = rows(Upsert.readCommitted(spark, t, "day"))
    val v0 = graft.core.TxnLog.currentVersion(spark, t)
    val e = intercept[IllegalArgumentException] {
      merge(t, "2026-01-01", 501L, -1.0)
    }
    assert(e.getMessage.contains("v_nonneg") && e.getMessage.contains("v >= 0"),
      s"violation must name the constraint: ${e.getMessage}")
    // refused BEFORE any claim: no commit, no file churn, rows unchanged
    assert(graft.core.TxnLog.currentVersion(spark, t) == v0)
    assert(rows(Upsert.readCommitted(spark, t, "day")) == before)
  }

  test("UNKNOWN satisfies; NOT NULL is its own explicit check; deletes are exempt") {
    import spark.implicits._
    val t = mkTable()
    Constraints.add(spark, t, "v_nonneg", "v >= 0")
    // SQL-standard CHECK: a null v is UNKNOWN, which satisfies v >= 0
    merge(t, "2026-01-01", 600L, null)
    assert(Upsert.readCommitted(spark, t, "day")
      .filter(col("k") === 600L && col("v").isNull).count() == 1L)
    // ...so NOT NULL must be registered explicitly — and the add-time scan
    // refuses while the null row exists
    intercept[IllegalArgumentException] {
      Constraints.add(spark, t, "v_notnull", "v IS NOT NULL")
    }
    // deletes are exempt even though the narrow key-only updates cannot
    // evaluate a constraint over v (rows leaving need no check)
    Upsert.deleteByKey(spark, t, Seq(("2026-01-01", 600L)).toDF("day", "k"),
      "day", Seq("k"))
    Constraints.add(spark, t, "v_notnull", "v IS NOT NULL")
    val e = intercept[IllegalArgumentException] {
      merge(t, "2026-01-02", 601L, null)
    }
    assert(e.getMessage.contains("v_notnull"))
    // drop restores writability; dropping an unknown name is loud
    Constraints.drop(spark, t, "v_notnull")
    merge(t, "2026-01-02", 601L, null)
    intercept[IllegalArgumentException] {
      Constraints.drop(spark, t, "no_such")
    }
    // the surviving set is exactly what a fresh reader finds (max-wins)
    assert(Constraints.list(spark, t) == Map("v_nonneg" -> "v >= 0"))
  }

  test("storage is crash-safe max-wins: stale version files never resurrect") {
    val t = mkTable()
    Constraints.add(spark, t, "a", "v >= 0")
    Constraints.add(spark, t, "b", "k >= 0")
    // a crashed writer's leftover OLDER version (sweep died) must lose to
    // the newest complete set
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$t/_graft_meta/constraints-v1.json"),
      """{"ghost":"v < 0"}""")
    assert(Constraints.list(spark, t) ==
      Map("a" -> "v >= 0", "b" -> "k >= 0"))
    // and the next DDL write sweeps the debris
    Constraints.drop(spark, t, "b")
    assert(Constraints.list(spark, t) == Map("a" -> "v >= 0"))
    assert(!new java.io.File(s"$t/_graft_meta/constraints-v1.json").exists())
  }
}
