package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Analytics

/** Real-time dashboard aggregation: sliding-window metrics maintained by a
  * second streaming query over the same source (A8/ST5).
  *
  * The reference writes this with `outputMode("complete")` to a Delta sink
  * (StreamingJob.scala:60-67). The Parquet sink cannot do complete mode, so
  * the idiomatic rewrite (SURVEY.md §2.9 S4) is `foreachBatch` + atomic
  * directory swap: each micro-batch recomputes the full window table and
  * publishes it under `<path>/data` via rename, so readers never observe a
  * half-written snapshot. State (watermark + window partials) lives in the
  * checkpoint exactly as in the reference.
  */
object StreamingDashboard {

  /** Overwrite-publish one micro-batch result atomically under target
    * (shared swap mechanics: [[graft.core.AtomicWrite]]). */
  private[streaming] def publish(df: DataFrame, target: String): Unit =
    graft.core.AtomicWrite.publish(df.sparkSession, s"$target/data") { tmp =>
      df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
    }

  def start(
      spark: SparkSession,
      source: DataFrame,
      outputPath: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery =
    Analytics.realtimeDashboard(source).writeStream
      .queryName("realtime-dashboard")
      .outputMode("complete")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) => publish(batch, outputPath) }
      .start()

  /** Latest published snapshot. */
  def readLatest(spark: SparkSession, outputPath: String): DataFrame =
    spark.read.parquet(s"$outputPath/data")
}
