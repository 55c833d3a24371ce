package graft

/** The storage micro-bench must produce a timing for every op (tiny sizes —
  * the spec checks mechanics, the bench run measures). */
class StorageBenchSpec extends SparkSpec {
  test("storage micro-bench returns positive timings for every op") {
    val r = StorageBench.run(spark, partitions = 2, rowsPerPartition = 200, churnMerges = 2)
    assert(r.map(_._1) == Seq(
      "storage_merge", "storage_compact", "storage_dv_delete",
      "storage_dv_read", "storage_read_committed_churn",
      "storage_bloom_build", "storage_stats_build", "storage_stats_scan",
      "storage_merge_indexed", "storage_restore", "storage_clone",
      "storage_shallow_create", "storage_shallow_cow",
      "storage_shallow_materialize",
      "storage_reorg",
      "storage_cluster_full", "storage_cluster_quiet",
      "storage_view_bootstrap", "storage_view_sync",
      "storage_serve_offset", "storage_serve_keyset", "storage_serve_indexed",
      "storage_pack", "storage_packsync"))
    assert(r.forall(_._2 > 0), s"timings: $r")
  }
}
