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

  test("the ADC corpus pass joins only against broadcast tables") {
    // the scale claim: corpus rows meet (a) the sub-codebook during encode
    // and (b) the per-probe ADC lookup table — both driver-small and
    // BROADCAST, so the compressed-domain scoring never shuffles the
    // corpus against anything
    val ascore = SimilarityQueries.pqAdcScores(spark, dir)
    def joins(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] = p.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        joins(a.executedPlan)
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => Seq(j.nodeName)
    }.flatten
    val js = joins(ascore.queryExecution.executedPlan)
    assert(js.nonEmpty, "expected joins in the ADC plan")
    assert(js.forall(_.contains("Broadcast")),
      s"every ADC-path join must be broadcast: $js")
  }

  test("near-random corpus: recall floored by geometry but well above chance") {
    // measured 0.82: the 50-of-500 shortlist carries most true neighbors
    // even when ADC ordering is noise-limited; chance would be ~0.1
    val m = meanRecall(SimilarityQueries.pqRecall(spark, dir))
    info(f"random PQ recall@5 = $m%.3f")
    assert(m >= 0.6, f"PQ shortlist recall collapsed: $m%.3f")
  }
}
