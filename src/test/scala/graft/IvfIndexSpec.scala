package graft

import java.nio.file.Files

import graft.operators.{IvfIndex, SimilarityQueries}

/** The persisted IVF index: hash-parity with the in-query probe, and a
  * genuinely partition-pruned scan — the two properties that make it the
  * 100 TB ANN path (same answers, O(probed cells) read). */
class IvfIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val idx: String = {
    val p = Files.createTempDirectory("ivf-index").toString
    val cells = IvfIndex.build(spark, dir, p)
    assert(cells > 0, "index must hold at least one cell")
    p
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "neighbor_id", "cell", "cosine", "rank")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
      .sortBy(t => (t._1, t._5))

  test("persisted-index probe is row-identical with the in-query IVF") {
    val inQuery = rows(SimilarityQueries.topkIvf(spark, dir))
    val indexed = rows(IvfIndex.topk(spark, dir, idx))
    assert(inQuery.nonEmpty)
    assert(indexed.toSeq == inQuery.toSeq,
      s"indexed probe must be row-identical: ${indexed.take(3).toSeq} vs ${inQuery.take(3).toSeq}")
  }

  test("the index read prunes to the probed cell partitions") {
    val (_, pruned) = IvfIndex.probed(spark, dir, idx)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("cell"),
      s"expected a cell partition filter in the scan:\n$plan")
    // and the pruning is semantic, not cosmetic: the pruned read touches
    // only probed cells, a strict subset of the corpus when cells > probes
    val total = spark.read.parquet(s"$idx/cells").count()
    val scanned = pruned.count()
    val nCells = spark.read.parquet(s"$idx/cells").select("cell").distinct().count()
    val probedCells = pruned.select("cell").distinct().count()
    assert(probedCells <= nCells)
    if (probedCells < nCells)
      assert(scanned < total, s"pruned scan $scanned must be < corpus $total")
  }

  test("a corpus rewrite is caught at rebuild (fresh codebook, fresh cells)") {
    // build against the same corpus twice: deterministic → same cell count
    val p2 = Files.createTempDirectory("ivf-index2").toString
    val c1 = IvfIndex.build(spark, dir, p2)
    val c2 = IvfIndex.build(spark, dir, p2) // overwrite mode: rebuild in place
    assert(c1 == c2)
    assert(rows(IvfIndex.topk(spark, dir, p2)).toSeq ==
      rows(IvfIndex.topk(spark, dir, idx)).toSeq)
  }
}
