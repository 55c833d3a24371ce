package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.ExtendedQueries

/** Cross-validation of the extension operators against INDEPENDENT
  * implementations of the same math (the DuckDB oracle already pins
  * engine-vs-engine equality; these pin the formulas themselves). */
class ExtendedQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("moment-based stats match Spark's built-in var/stddev/corr") {
    val mine = ExtendedQueries.statsAgg(spark, dir)
      .select("l_returnflag", "var_qty", "stddev_price", "corr_qp")
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    val builtin = graft.core.Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        var_samp(col("l_quantity")).as("v"),
        stddev_samp(col("l_extendedprice")).as("s"),
        corr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(mine.keySet == builtin.keySet)
    // statsAgg ROUNDs to 6 decimals (cross-engine cast stability), so the
    // bound is the rounding granule, not double precision.
    mine.foreach { case (flag, (v, s, c)) =>
      val (bv, bs, bc) = builtin(flag)
      assert(math.abs(v - bv) / bv < 1e-7, s"$flag var: $v vs $bv")
      assert(math.abs(s - bs) / bs < 1e-7, s"$flag stddev: $s vs $bs")
      assert(math.abs(c - bc) < 1e-6, s"$flag corr: $c vs $bc")
    }
  }

  test("top-k aggregator equals the row_number window form") {
    val viaAgg = ExtendedQueries.topkAgg(spark, dir)
      .collect().map(_.toString).sorted
    val viaWindow = graft.core.Tables.orders(spark, dir)
      .select(
        col("o_orderstatus"),
        row_number().over(Window.partitionBy("o_orderstatus")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").desc))
          .cast("long").as("rk"),
        col("o_totalprice").as("total_price"), col("o_orderkey"))
      .filter(col("rk") <= 3)
      .select("o_orderstatus", "rk", "total_price", "o_orderkey")
      .collect().map(_.toString).sorted
    assert(viaAgg.nonEmpty && viaAgg.sameElements(viaWindow))
  }

  test("histogram buckets partition the input exactly") {
    val h = ExtendedQueries.histogram(spark, dir).collect()
    val total = graft.core.Tables.orders(spark, dir).count()
    assert(h.map(_.getLong(1)).sum == total, "bucket counts must sum to row count")
    assert(h.map(_.getLong(0)).distinct.length == h.length, "buckets unique")
  }
}
