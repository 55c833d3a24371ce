package graft

import graft.operators.SimilarityQueries

/** Product-quantization ADC + exact re-rank: the compressed-domain
  * shortlist must carry the true neighbors (recall via the deterministic
  * integer pipeline), and the compression story must hold arithmetically
  * (m code ints per vector vs 64 quantized longs). */
class PqSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def meanRecall(df: org.apache.spark.sql.DataFrame): Double = {
    val rs = df.select("recall_at_5").collect().map(_.getDouble(0))
    assert(rs.length == 20, s"expected 20 probes, got ${rs.length}")
    rs.sum / rs.length
  }

  test("separable corpus: ADC shortlist + exact re-rank recovers the true top-5") {
    // deterministic pipeline → exact value; assertion keeps headroom so a
    // corpus regeneration doesn't flap it (measured: 1.00)
    val m = meanRecall(SimilarityQueries.pqClusteredRecall(spark, dir))
    info(f"clustered PQ recall@5 = $m%.3f")
    assert(m >= 0.9, f"PQ must recover separable-corpus neighbors: $m%.3f")
  }

  test("near-random corpus: recall floored by geometry but well above chance") {
    // measured 0.82: the 50-of-500 shortlist carries most true neighbors
    // even when ADC ordering is noise-limited; chance would be ~0.1
    val m = meanRecall(SimilarityQueries.pqRecall(spark, dir))
    info(f"random PQ recall@5 = $m%.3f")
    assert(m >= 0.6, f"PQ shortlist recall collapsed: $m%.3f")
  }
}
