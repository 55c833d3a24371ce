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

  test("LSH OR-amplification reaches recall ≥0.9 on separable embeddings") {
    // on the near-random corpus recall floors at ~0.62 (method-limited);
    // the clustered mixture corpus is where the 1-(1-r)^L curve must climb
    val r = graft.operators.SimilarityQueries.clusteredRecall(spark, dir)
      .agg(avg("recall_l1").as("l1"), avg("recall_l4").as("l4"), avg("recall_l8").as("l8"))
      .head()
    val (l1, l4, l8) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    assert(l1 <= l4 && l4 <= l8, s"amplification must be monotonic: $l1 $l4 $l8")
    assert(l8 >= 0.9, s"8-table recall@5 on separable data should be ≥0.9, got $l8")
    assert(l8 - l1 > 0.05, s"amplification should visibly lift recall: $l1 -> $l8")
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
