package graft
import graft.operators.SimilarityQueries
object MarginSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val dir = "/tmp/stress-emb-sweep"
    if (!new java.io.File(s"$dir/embeddings.parquet").exists) {
      spark.range(20000L).selectExpr(
        "id AS vec_id",
        "concat('L', CAST(id % 10 AS STRING)) AS label",
        "transform(sequence(0, 63), i -> CAST(sin(CAST(id * 64 + i AS DOUBLE)) AS FLOAT)) AS embedding")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    }
    for (m <- Seq(0.05, 0.04, 0.03, 0.02)) {
      val (recallDf, cand) = SimilarityQueries.ivfClusteredRecallWith(spark, dir, 1, m)
      val recalls = recallDf.select("recall_at_5").collect().map(_.getDouble(0))
      val mean = recalls.sum / recalls.length
      val frac = cand.count().toDouble / (20.0 * 20000)
      println(f"MARGIN $m%.2f recall $mean%.3f scan ${frac * 100}%.2f%%")
    }
    spark.stop()
  }
}
