package graft

import org.apache.spark.sql.functions._

/** Bucketing = the co-located fact-fact join path at 100 TB: both tables
  * written bucketed by the join key means the join needs NO shuffle exchange
  * at read time — each task joins bucket i against bucket i. This spec
  * proves the property end-to-end on a warehouse-managed table pair. */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed fact tables join without a shuffle exchange") {
    // warehouse dir is a temp dir set at session build (SparkSpec).
    val d = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    val ord = spark.read.parquet(s"$d/orders.parquet")

    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    ord.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("ord_bucketed")

    // disable broadcast so the join would otherwise demand a full shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      val plan = j.queryExecution.executedPlan.toString
      // the join itself must read co-located buckets: no Exchange below SMJ
      val joinSection = plan.split("HashAggregate").last
      assert(joinSection.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey"),
        s"bucketed join must not shuffle the fact side:\n$plan")
      assert(!joinSection.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join must not shuffle the orders side:\n$plan")
      // correctness: same result as the plain parquet join
      val expected = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .collect().map(_.toString).sorted
      assert(j.collect().map(_.toString).sorted.sameElements(expected))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
