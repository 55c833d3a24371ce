package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.LayoutOps

/** Layout quality is measurable, not aspirational: clusterBy must turn an
  * arrival-order table (every file spans the whole key domain → zero
  * pruning) into a range-clustered one where a selective pushed predicate
  * touches one file's row groups. Asserted from the parquet FOOTER
  * statistics — the same metadata the reader's pruning consults. */
class LayoutSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("clusterBy: arrival-order layout scans everything, clustered layout prunes to one file") {
    import spark.implicits._
    // deterministic interleaved arrival order: key strides the domain so
    // every round-robin chunk sees the full range (the worst realistic case)
    val n = 8000L
    val df = spark.range(n)
      .withColumn("k", (col("id") * 2477L) % n) // 2477 coprime with 8000 → permutation
      .withColumn("payload", md5(col("k").cast("string")))

    val unclustered = tmp("layout-raw")
    df.repartition(8).write.mode("overwrite").parquet(unclustered)
    val clustered = tmp("layout-clustered")
    LayoutOps.clusterBy(df, Seq("k"), 8).write.mode("overwrite").parquet(clustered)

    // same rows either way
    assert(spark.read.parquet(clustered).count() == n)
    assert(spark.read.parquet(clustered).agg(sum("k")).head.getLong(0) ==
      spark.read.parquet(unclustered).agg(sum("k")).head.getLong(0))

    val rawB = LayoutOps.longColumnBounds(unclustered, "k")
    val cluB = LayoutOps.longColumnBounds(clustered, "k")
    assert(rawB.size >= 4 && cluB.size >= 4, s"want multiple files: ${rawB.size}/${cluB.size}")

    // a 1%-of-domain range predicate: arrival order reads every file,
    // clustered reads at most two (range boundary may split the window)
    val (lo, hi) = (1000L, 1079L)
    assert(LayoutOps.scanFraction(rawB, lo, hi) == 1.0,
      s"interleaved layout must have no pruning power: $rawB")
    val cluFrac = LayoutOps.scanFraction(cluB, lo, hi)
    assert(cluFrac <= 2.0 / cluB.size + 1e-9,
      s"clustered layout must prune to ≤2 of ${cluB.size} files: $cluB")

    // clustered files are pairwise disjoint on k (distinct keys → strict)
    val sorted = cluB.sortBy(_._2)
    sorted.sliding(2).foreach {
      case Seq((fa, _, amax, _), (fb, bmin, _, _)) =>
        assert(amax < bmin, s"files $fa and $fb overlap on k")
      case _ => ()
    }

    // and the filtered read is still correct
    val got = spark.read.parquet(clustered)
      .filter(col("k").between(lo, hi)).count()
    assert(got == hi - lo + 1)
  }
}
