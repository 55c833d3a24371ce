package graft

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Sketch-based aggregates excluded from oracle hashing (SURVEY.md §5.2 —
  * engine-specific sketches can't hash-match DuckDB): bounded-error checks
  * instead, per the declared test strategy. */
class ApproxSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct error tracks the requested rsd") {
    for (colName <- Seq("o_custkey", "o_orderkey")) {
      val r = Tables.orders(spark, dir).agg(
        countDistinct(col(colName)).as("exact"),
        approx_count_distinct(col(colName)).as("approx_default"), // rsd 0.05
        approx_count_distinct(col(colName), 0.01).as("approx_tight")).head()
      val exact = r.getLong(0).toDouble
      // default rsd 0.05 ⇒ ~3σ bound 15%; measured 6.7% on o_custkey
      assert(math.abs(r.getLong(1) - exact) / exact < 0.15,
        s"$colName default-rsd: approx=${r.getLong(1)} exact=$exact")
      assert(math.abs(r.getLong(2) - exact) / exact < 0.03,
        s"$colName rsd=0.01: approx=${r.getLong(2)} exact=$exact")
    }
  }

  test("approx_percentile brackets the exact percentile") {
    val r = Tables.orders(spark, dir).agg(
      expr("percentile(o_totalprice, 0.5)").as("exact_med"),
      expr("approx_percentile(o_totalprice, 0.5, 1000)").as("approx_med")).head()
    val (e, a) = (r.getDouble(0), r.getDouble(1))
    assert(math.abs(a - e) / e < 0.02, s"approx median $a vs exact $e")
  }

  test("deterministic seeded sample: stable fraction, reproducible rows") {
    val li = Tables.lineitem(spark, dir)
    val s1 = li.sample(withReplacement = false, 0.1, seed = 7)
    val s2 = li.sample(withReplacement = false, 0.1, seed = 7)
    val n = li.count().toDouble
    assert(math.abs(s1.count() / n - 0.1) < 0.01)
    assert(s1.count() == s2.count(), "same seed + data must reproduce the sample")
  }
}
