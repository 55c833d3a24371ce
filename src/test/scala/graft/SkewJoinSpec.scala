package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling: the runtime re-plan that keeps hot-key joins
  * alive at 100 TB. With thresholds scaled down to fixture size, a join
  * where one key holds ~90% of the rows must get its skewed partition
  * split (AQEShuffleRead reports skewed splits), and results must equal the
  * non-adaptive plan. */
class SkewJoinSpec extends SparkSpec {

  private def withConfs[A](kv: (String, String)*)(f: => A): A = {
    val olds = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits the skewed partition of a hot-key sort-merge join") {
    import spark.implicits._
    // key 0 carries 90k of 100k rows — one shuffle partition dwarfs the rest
    val skewed = spark.range(100000L)
      .select(when(col("id") < 90000L, 0L).otherwise(col("id")).as("k"),
        col("id").as("v"))
    val dim = spark.range(2000L).select(col("id").as("k2"))

    val expected = withConfs("spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      skewed.join(dim, col("k") === col("k2")).count()
    }

    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.forceApply" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = skewed.join(dim, col("k") === col("k2"))
      // collect() executes j's own queryExecution (count() would plan a
      // separate tree and leave this one un-executed / non-final)
      assert(j.collect().length == expected, "adaptive result must match non-adaptive")
      val finalPlan = j.queryExecution.executedPlan.toString
      assert(finalPlan.contains("AQEShuffleRead skewed"),
        s"expected AQEShuffleRead skew split in final plan:\n$finalPlan")
    }
  }
}
