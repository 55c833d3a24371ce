package graft

import java.nio.file.Files

import graft.operators.{IvfPqIndex, SimilarityQueries}

/** The composed IVF-PQ index: cell-partition-pruned codes scan, broadcast
  * compressed-domain scoring, and a MEASURED recall cost for stacking the
  * two lossy stages (the DuckDB oracle replays the whole composition —
  * this spec covers the scan shape and determinism). */
class IvfPqSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val idx: String = {
    val p = Files.createTempDirectory("ivfpq-index").toString
    assert(IvfPqIndex.build(spark, dir, p) > 0)
    p
  }

  private def recallRows(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "n_hits", "recall_at_5")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)

  test("the codes read prunes to the probed cell partitions") {
    val (_, pruned, _) = IvfPqIndex.probed(spark, dir, idx)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("cell"),
      s"expected a cell partition filter in the codes scan:\n$plan")
    // semantic, not cosmetic: fewer code rows than the corpus whenever
    // the probes miss at least one cell
    val total = spark.read.parquet(s"$idx/codes").count()
    val nCells = spark.read.parquet(s"$idx/codes")
      .select("cell").distinct().count()
    val probedCells = pruned.select("cell").distinct().count()
    assert(probedCells <= nCells)
    if (probedCells < nCells)
      assert(pruned.count() < total,
        s"pruned codes ${pruned.count()} must be < corpus $total")
  }

  test("composed recall is measured and well above chance; probes are deterministic") {
    val r1 = recallRows(IvfPqIndex.recall(spark, dir, idx))
    assert(r1.length == 20)
    val mean = r1.map(_._3).sum / r1.length
    info(f"ivf-pq recall@5 mean $mean%.2f")
    // two stacked lossy stages on the near-random corpus: recall floors
    // below plain PQ's (the coarse stage's cells cost a few true
    // neighbors) but far above the ~5/500 chance level
    assert(mean >= 0.4, f"composed recall collapsed: $mean%.2f")
    // and strictly cheaper candidates than all-pairs: a probed-cell
    // candidate set cannot exceed (probes x corpus)
    val r2 = recallRows(IvfPqIndex.recall(spark, dir, idx))
    assert(r1.toSeq == r2.toSeq, "repeated probes must be identical")
  }

  test("the ADC stage joins codes only against broadcast tables") {
    val (_, _, ascore) = IvfPqIndex.probed(spark, dir, idx)
    val plan = ascore.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"a SortMergeJoin means the codes side shuffled against a non-broadcast table:\n$plan")
    assert(SimilarityQueries.quantized(spark, dir)
      .filter(org.apache.spark.sql.functions.col("vec_id") < 20).count() == 20)
  }
}
