package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.batch.{Scd2Mirror, Upsert}

/** SCD2 mirror from the change feed: the mirror's current slice equals
  * the source's committed snapshot at every sync point, closed versions
  * carry exact commit-version intervals, an incremental mirror equals a
  * from-scratch rebuild, and a mirror never follows two sources. */
class Scd2MirrorSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def rows(ks: (String, Long, Double)*): DataFrame = {
    import spark.implicits._
    ks.toSeq.toDF("day", "k", "v")
  }

  private def current(dim: String): Set[(String, Long, Double)] = {
    import spark.implicits._
    Upsert.readCommitted(spark, dim, "day")
      .filter(col(Scd2Mirror.ValidTo).isNull)
      .select("day", "k", "v").as[(String, Long, Double)].collect().toSet
  }

  private def committed(src: String): Set[(String, Long, Double)] = {
    import spark.implicits._
    Upsert.readCommitted(spark, src, "day")
      .select("day", "k", "v").as[(String, Long, Double)].collect().toSet
  }

  private def versions(dim: String): Set[(String, Long, Double, Long, Option[Long])] = {
    import spark.implicits._
    Upsert.readCommitted(spark, dim, "day")
      .select(col("day"), col("k"), col("v"),
        col(Scd2Mirror.ValidFrom), col(Scd2Mirror.ValidTo))
      .as[(String, Long, Double, Long, Option[Long])].collect().toSet
  }

  test("bootstrap then churn: the current slice equals the source at every sync") {
    val src = tmp("scd2src") + "/t"
    val dim = tmp("scd2dim") + "/d"
    Upsert.mergeByKey(spark, src,
      rows(("d1", 1L, 1.0), ("d1", 2L, 2.0), ("d2", 3L, 3.0)), "day", Seq("k"))
    val s1 = Scd2Mirror.sync(spark, src, dim, "day", Seq("k"))
    assert(s1.opened == 3L && s1.closed == 0L, s"bootstrap: $s1")
    assert(current(dim) == committed(src))
    assert(versions(dim).forall(_._5.isEmpty), "bootstrap rows are all current")

    // churn: update k=1, delete k=2, insert k=9 — one sync catches up all
    Upsert.mergeByKey(spark, src, rows(("d1", 1L, 10.0)), "day", Seq("k"))
    Upsert.deleteByKey(spark, src,
      rows(("d1", 2L, 0.0)).select("day", "k"), "day", Seq("k"))
    Upsert.mergeByKey(spark, src, rows(("d2", 9L, 9.0)), "day", Seq("k"))
    val s2 = Scd2Mirror.sync(spark, src, dim, "day", Seq("k"))
    assert(s2.opened == 2L && s2.closed == 2L, s"churn sync: $s2")
    assert(current(dim) == committed(src), "the SCD2 invariant")

    val vs = versions(dim)
    // k=1: old version closed exactly where the new one opens
    val k1 = vs.filter(r => r._2 == 1L).toSeq.sortBy(_._4)
    assert(k1.size == 2 && k1.head._3 == 1.0 && k1.last._3 == 10.0)
    assert(k1.head._5.contains(k1.last._4),
      s"old version must close at the new version's valid_from: $k1")
    assert(k1.last._5.isEmpty)
    // k=2: closed with nothing following
    val k2 = vs.filter(_._2 == 2L)
    assert(k2.size == 1 && k2.head._5.nonEmpty, s"deleted key: $k2")
    // k=9: a single current version
    val k9 = vs.filter(_._2 == 9L)
    assert(k9.size == 1 && k9.head._5.isEmpty)

    // as-of agreement at EVERY version the mirror knows: the interval
    // slice (valid_from <= v < valid_to) equals readAsOf(src, v) —
    // commit versions are per-partition claims, so the slice and the
    // as-of read must agree even at versions between two claims of one
    // logical merge
    import spark.implicits._
    val boundary = vs.flatMap(r => Seq(r._4) ++ r._5).toSeq.sorted
    boundary.foreach { v =>
      val slice = vs.filter(r => r._4 <= v && r._5.forall(_ > v))
        .map(r => (r._1, r._2, r._3))
      val srcAt = Upsert.readAsOf(spark, src, v, "day")
        .select("day", "k", "v").as[(String, Long, Double)].collect().toSet
      assert(slice == srcAt, s"interval slice at v$v: $slice vs $srcAt")
    }
  }

  test("an incremental mirror equals a from-scratch rebuild") {
    val src = tmp("scd2src2") + "/t"
    val inc = tmp("scd2inc") + "/d"
    Upsert.mergeByKey(spark, src,
      rows(("d1", 1L, 1.0), ("d2", 2L, 2.0)), "day", Seq("k"))
    Scd2Mirror.sync(spark, src, inc, "day", Seq("k"))
    Upsert.mergeByKey(spark, src, rows(("d1", 1L, 5.0)), "day", Seq("k"))
    Scd2Mirror.sync(spark, src, inc, "day", Seq("k"))
    Upsert.deleteByKey(spark, src,
      rows(("d2", 2L, 0.0)).select("day", "k"), "day", Seq("k"))
    Upsert.mergeByKey(spark, src, rows(("d1", 7L, 7.0)), "day", Seq("k"))
    Scd2Mirror.sync(spark, src, inc, "day", Seq("k"))
    // fresh mirror consumes the whole retained feed in one sync
    val scratch = tmp("scd2scratch") + "/d"
    Scd2Mirror.sync(spark, src, scratch, "day", Seq("k"))
    assert(versions(inc) == versions(scratch),
      "three incremental syncs must equal one bootstrap sync")
    // idempotent at the tip
    val s = Scd2Mirror.sync(spark, src, inc, "day", Seq("k"))
    assert(s.opened == 0L && s.closed == 0L)
  }

  test("a mirror refuses to follow a second source") {
    val srcA = tmp("scd2srcA") + "/t"
    val srcB = tmp("scd2srcB") + "/t"
    val dim = tmp("scd2dimAB") + "/d"
    Upsert.mergeByKey(spark, srcA, rows(("d1", 1L, 1.0)), "day", Seq("k"))
    Upsert.mergeByKey(spark, srcB, rows(("d1", 2L, 2.0)), "day", Seq("k"))
    Scd2Mirror.sync(spark, srcA, dim, "day", Seq("k"))
    val e = intercept[IllegalArgumentException] {
      Scd2Mirror.sync(spark, srcB, dim, "day", Seq("k"))
    }
    assert(e.getMessage.contains("one mirror follows one source"))
  }
}
