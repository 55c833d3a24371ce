package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.SimilarityQueries

/** The IVF codebook memo is keyed on a corpus fingerprint
  * (path, length, modTime of the parquet files): an immutable-snapshot dir
  * hits the memo every query, a dir REWRITTEN in place invalidates it so
  * the next query retrains against the current vectors instead of scanning
  * them against stale centroids. */
class IvfCodebookSpec extends SparkSpec {

  test("codebook memo: stable corpus reuses, rewritten corpus retrains") {
    val dir = Files.createTempDirectory("ivf-corpus").toString
    val src = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    src.coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val cb1 = SimilarityQueries.codebookRows(spark, dir)
    assert(cb1.nonEmpty)
    // memo hit: identical instance, no retrain
    assert(SimilarityQueries.codebookRows(spark, dir) eq cb1)

    // rewrite the corpus dir IN PLACE with genuinely different vectors
    // (drop half the corpus — centroid sums must change)
    src.filter(col("vec_id") % 2 === 0)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val cb2 = SimilarityQueries.codebookRows(spark, dir)
    assert(cb2 != cb1,
      "a rewritten corpus must retrain the codebook, not reuse stale centroids")
    // and the new codebook is itself memo-stable
    assert(SimilarityQueries.codebookRows(spark, dir) eq cb2)

    // the fingerprint path keeps the immutable-testdata behavior intact:
    // two reads of an untouched dir share one training
    val t1 = SimilarityQueries.codebookRows(spark, "/root/testdata/sf0.001")
    assert(SimilarityQueries.codebookRows(spark, "/root/testdata/sf0.001") eq t1)
  }
}
