package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.TemporalJoinQueries

/** Edge semantics of the temporal joins on hand-built fixtures:
  * as-of inclusivity/tie-handling, and range-join boundary exclusivity. */
class TemporalJoinSpec extends SparkSpec {

  private def us(sec: Long): Long = sec * 1000000L // seconds → micros
  private def ns(sec: Long): Long = sec * 1000000000L // seconds → nanos

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-temporal").toString
    import spark.implicits._
    // events.ts is written as int64 nanos — the same shape Tables.events
    // normalizes (nanosAsLong) before deriving ts_ts.
    val base = 1700000000L // any µs-aligned epoch anchor
    Seq(
      // user 1: purchase history around probes
      (1L, ns(base + 100), 1L, "purchase", 10.0, "{}"),
      (2L, ns(base + 200), 1L, "purchase", 20.0, "{}"),
      (3L, ns(base + 200), 1L, "click", 0.5, "{}"),    // tie: purchase@200 wins (inclusive)
      (4L, ns(base + 150), 1L, "click", 0.6, "{}"),    // between purchases → purchase@100
      (5L, ns(base + 300), 1L, "view", 0.7, "{}"),     // after both → purchase@200
      // user 2: probe BEFORE any purchase → nulls
      (6L, ns(base + 50), 2L, "click", 0.8, "{}"),
      (7L, ns(base + 500), 2L, "purchase", 30.0, "{}"),
      // user 1: two purchases at the SAME ts → deterministic max(event_id)
      (8L, ns(base + 400), 1L, "purchase", 40.0, "{}"),
      (9L, ns(base + 400), 1L, "purchase", 41.0, "{}"),
      (10L, ns(base + 450), 1L, "error", 0.9, "{}"),   // → id 9 (value 41.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")

    Seq(
      (0L, java.sql.Timestamp.valueOf("1995-06-01 00:00:00"), "O", 1.0, "1-URGENT"),
      (997L, java.sql.Timestamp.valueOf("1995-07-01 00:00:00"), "O", 1.0, "1-URGENT"),
      (5L, java.sql.Timestamp.valueOf("1995-01-01 00:00:00"), "O", 1.0, "1-URGENT"), // not sampled
    ).toDF("o_orderkey", "o_orderdate", "o_orderstatus", "o_totalprice", "o_orderpriority")
      .write.parquet(s"$d/orders.parquet")

    Seq(
      // vs order 0 window [06-01, 06-08):
      (1L, 1L, java.sql.Timestamp.valueOf("1995-06-01 00:00:00"), 1.0), // start inclusive
      (2L, 2L, java.sql.Timestamp.valueOf("1995-06-07 23:59:59"), 2.0), // inside
      (3L, 3L, java.sql.Timestamp.valueOf("1995-06-08 00:00:00"), 4.0), // end exclusive
      (4L, 4L, java.sql.Timestamp.valueOf("1995-05-31 23:59:59"), 8.0), // before start
      // vs order 997 window [07-01, 07-08):
      (5L, 2L, java.sql.Timestamp.valueOf("1995-07-03 12:00:00"), 16.0),
    ).toDF("l_orderkey", "l_suppkey", "l_shipdate", "l_quantity")
      .write.parquet(s"$d/lineitem.parquet")
    d
  }

  test("as-of join: inclusive match, tie-dedup, null before first quote") {
    val out = TemporalJoinQueries.asofJoin(spark, dir)
      .select("event_id", "last_purchase_id", "last_purchase_value")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    assert(out(3L) == (Some(2L), Some(20.0)))  // equal-ts purchase included
    assert(out(4L) == (Some(1L), Some(10.0)))  // most recent prior only
    assert(out(5L) == (Some(2L), Some(20.0)))  // later purchases invisible
    assert(out(6L) == (None, None))            // no prior purchase → nulls
    assert(out(10L) == (Some(9L), Some(41.0))) // same-ts quotes → max id
    assert(out.size == 5)                      // purchases are not probes
  }

  test("range join: [start, start+7d) boundaries, sampling, per-order agg") {
    val rows = TemporalJoinQueries.rangeJoin(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3))))
      .toMap
    // order 0: lineitems 1 and 2 only (start inclusive, end exclusive)
    assert(rows(0L) == ((2L, 3.0, 2L)))
    // order 997: single in-window item; order 5 absent (not sampled)
    assert(rows(997L) == ((1L, 16.0, 1L)))
    assert(rows.size == 2)
  }
}
