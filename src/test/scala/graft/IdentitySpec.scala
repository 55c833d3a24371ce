package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.batch.{IdentityColumns, Upsert}
import graft.core.TxnLog

/** GENERATED ALWAYS AS IDENTITY: OCC-serialized range allocation in the
  * txn log, id stability across updates and replays, explicit-value
  * refusal, disjoint ranges under concurrency. */
class IdentitySpec extends SparkSpec {

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  test("inserts draw fresh ids, updates keep them, replays do not duplicate") {
    import spark.implicits._
    val t = tmp("ident") + "/t"
    // Delta-normal: declared before the table exists; the first merge
    // materializes the column
    IdentityColumns.add(spark, t, "id", start = 100L, step = 1L)

    Upsert.mergeByKey(spark, t,
      (1 to 20).map(i => (s"2026-08-0${i % 2 + 1}", s"k$i", i * 1.0))
        .toDF("day", "k", "v"), "day", Seq("k"))
    val v1 = TxnLog.currentVersion(spark, t)
    val first = Upsert.readCommitted(spark, t, "day")
      .select("k", "id").as[(String, Long)].collect().toMap
    assert(first.size == 20)
    assert(first.values.toSeq.sorted == (100L to 119L),
      s"a fresh table's first merge allocates the exact range: ${first.values.toSeq.sorted}")

    // update 3 keys + insert 2 new: updated keys KEEP their ids, new keys
    // get ids past the high-water mark, nothing collides
    Upsert.mergeByKey(spark, t,
      Seq(("2026-08-01", "k2", 99.0), ("2026-08-02", "k3", 98.0),
        ("2026-08-01", "k4", 97.0), ("2026-08-01", "new1", 1.0),
        ("2026-08-02", "new2", 2.0)).toDF("day", "k", "v"),
      "day", Seq("k"))
    val second = Upsert.readCommitted(spark, t, "day")
      .select("k", "id").as[(String, Long)].collect().toMap
    assert(second.size == 22)
    Seq("k2", "k3", "k4").foreach(k =>
      assert(second(k) == first(k), s"update must not reassign $k's id"))
    assert(Seq("new1", "new2").forall(k => second(k) >= 120L),
      s"new rows draw past the high-water mark: $second")
    assert(second.values.toSeq.distinct.size == 22, "ids stay unique")

    // exact replay of the same merge (the crashed-streaming-batch shape):
    // every key now matches, so every id is preserved — no duplicates, no
    // drift; the burned range is just a gap
    Upsert.mergeByKey(spark, t,
      Seq(("2026-08-01", "k2", 99.0), ("2026-08-02", "k3", 98.0),
        ("2026-08-01", "k4", 97.0), ("2026-08-01", "new1", 1.0),
        ("2026-08-02", "new2", 2.0)).toDF("day", "k", "v"),
      "day", Seq("k"))
    val third = Upsert.readCommitted(spark, t, "day")
      .select("k", "id").as[(String, Long)].collect().toMap
    assert(third == second, "a replayed merge must not move a single id")

    // time travel serves the ids each version committed
    assert(Upsert.readAsOf(spark, t, v1, "day")
      .select("k", "id").as[(String, Long)].collect().toMap == first)
  }

  test("explicit values, key/partition roles, and bad registrations are refused by name") {
    import spark.implicits._
    val t = tmp("ident-refuse") + "/t"
    IdentityColumns.add(spark, t, "id")
    val e = intercept[IllegalArgumentException] {
      Upsert.mergeByKey(spark, t,
        Seq(("2026-08-01", "k1", 5L)).toDF("day", "k", "id"), "day", Seq("k"))
    }
    assert(e.getMessage.contains("id") &&
      e.getMessage.contains("GENERATED ALWAYS AS IDENTITY"))
    // identity as merge key: no update could ever address a row
    val ek = intercept[IllegalArgumentException] {
      Upsert.mergeByKey(spark, t,
        Seq(("2026-08-01", "k1", 1.0)).toDF("day", "k", "v"), "day", Seq("id"))
    }
    assert(ek.getMessage.contains("merge key"))
    // identity as partition column
    val ep = intercept[IllegalArgumentException] {
      Upsert.mergeByKey(spark, t,
        Seq(("2026-08-01", "k1", 1.0)).toDF("day", "k", "v"), "id", Seq("k"))
    }
    assert(ep.getMessage.contains("partition"))

    // DESCRIBE DETAIL surfaces the declaration
    assert(Upsert.detail(spark, t).identityColumns ==
      Seq("id IDENTITY (START WITH 1 INCREMENT BY 1)"))

    intercept[IllegalArgumentException](
      IdentityColumns.add(spark, t, "id")) // already registered
    intercept[IllegalArgumentException](
      IdentityColumns.add(spark, t, "id2", step = 0L)) // zero step
    intercept[IllegalArgumentException](
      IdentityColumns.drop(spark, t, "nope")) // unknown drop

    // adoption path: an existing BIGINT column seeds past its max; a
    // non-unique one is refused
    val t2 = tmp("ident-adopt") + "/t"
    Upsert.mergeByKey(spark, t2,
      Seq(("2026-08-01", "a", 7L), ("2026-08-01", "b", 3L))
        .toDF("day", "k", "uid"), "day", Seq("k"))
    IdentityColumns.add(spark, t2, "uid", start = 1L, step = 1L)
    Upsert.mergeByKey(spark, t2,
      Seq(("2026-08-01", "c")).toDF("day", "k"), "day", Seq("k"))
    val ids = Upsert.readCommitted(spark, t2, "day")
      .select("k", "uid").as[(String, Long)].collect().toMap
    assert(ids("a") == 7L && ids("b") == 3L && ids("c") == 8L,
      s"adopted sequence must resume past the existing max: $ids")

    val t3 = tmp("ident-dupes") + "/t"
    Upsert.mergeByKey(spark, t3,
      Seq(("2026-08-01", "a", 7L), ("2026-08-01", "b", 7L))
        .toDF("day", "k", "uid"), "day", Seq("k"))
    val ed = intercept[IllegalArgumentException](
      IdentityColumns.add(spark, t3, "uid"))
    assert(ed.getMessage.contains("unique"))

    // a missing column on an existing table cannot be adopted
    intercept[IllegalArgumentException](
      IdentityColumns.add(spark, t3, "ghost"))
  }

  test("streaming upsert replay after a crash assigns no duplicate ids") {
    import spark.implicits._
    val t = tmp("ident-stream") + "/t"
    IdentityColumns.add(spark, t, "id")
    val merge = graft.streaming.StreamingUpsert
      .mergeBatch(spark, t, "day", Seq("k"), "ident-app") _
    val batch1 = Seq(("2026-08-01", "a", 1.0), ("2026-08-01", "b", 2.0))
      .toDF("day", "k", "v")
    merge(batch1, 1L)
    val after1 = Upsert.readCommitted(spark, t, "day")
      .select("k", "id").as[(String, Long)].collect().toMap

    // crash BEFORE the txn marker: the ledger has no record, so the
    // restart re-merges the same batch — every key matches, every id is
    // preserved, the burned range is a gap (simulated by merging the same
    // rows under a DIFFERENT batch id)
    merge(batch1, 2L)
    val replayed = Upsert.readCommitted(spark, t, "day")
      .select("k", "id").as[(String, Long)].collect().toMap
    assert(replayed == after1, "a pre-marker crash replay must not move ids")

    // crash AFTER the txn marker: the ledger absorbs the replayed batch
    // id entirely — no merge, no allocation
    val allocsBefore = TxnLog.commitsSince(spark, t, 0L).count(_.op == "identity")
    merge(batch1, 2L) // same (appId, batchId): absorbed
    assert(TxnLog.commitsSince(spark, t, 0L).count(_.op == "identity")
      == allocsBefore, "an absorbed replay must not allocate")
    assert(Upsert.readCommitted(spark, t, "day")
      .select("k", "id").as[(String, Long)].collect().toMap == after1)

    // a genuinely new batch draws ids past everything allocated so far
    merge(Seq(("2026-08-01", "c", 3.0)).toDF("day", "k", "v"), 3L)
    val ids = Upsert.readCommitted(spark, t, "day")
      .select("id").as[Long].collect().toSeq
    assert(ids.distinct.size == 3, s"no duplicate ids anywhere: $ids")
  }

  test("concurrent merges allocate disjoint ranges; deletes allocate nothing") {
    import spark.implicits._
    val t = tmp("ident-conc") + "/t"
    IdentityColumns.add(spark, t, "id")
    // seed two partitions so concurrent merges claim disjoint partitions
    Upsert.mergeByKey(spark, t,
      Seq(("2026-08-01", "seed1", 0.0), ("2026-08-02", "seed2", 0.0))
        .toDF("day", "k", "v"), "day", Seq("k"))

    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      val fs = Seq("2026-08-01" -> (1 to 30), "2026-08-02" -> (31 to 60)).map {
        case (day, range) => scala.concurrent.Future {
          Upsert.mergeByKey(spark, t,
            range.map(i => (day, s"c$i", i * 1.0)).toDF("day", "k", "v"),
            "day", Seq("k"))
        }
      }
      fs.foreach(f => scala.concurrent.Await.result(f,
        scala.concurrent.duration.Duration.Inf))
    } finally pool.shutdown()
    val ids = Upsert.readCommitted(spark, t, "day")
      .select("id").as[Long].collect().toSeq
    assert(ids.size == 62 && ids.distinct.size == 62,
      s"concurrent merges must allocate disjoint ranges: ${ids.sorted}")

    // the allocation trail is in the log: identity commits with ranges
    val allocs = TxnLog.commitsSince(spark, t, 0L).filter(_.op == "identity")
    assert(allocs.size == 3, s"3 allocating merges: ${allocs.map(_.txn)}")
    assert(allocs.forall(_.partitions == Set("_graft_identity:id")))

    // deletes allocate nothing — no new identity commit, ids untouched
    Upsert.deleteByKey(spark, t,
      Seq(("2026-08-01", "c1")).toDF("day", "k"), "day", Seq("k"))
    val allocsAfter = TxnLog.commitsSince(spark, t, 0L).filter(_.op == "identity")
    assert(allocsAfter.size == 3, "a delete-only merge must not allocate")
    assert(Upsert.readCommitted(spark, t, "day").count() == 61)
  }
}
