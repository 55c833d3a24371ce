package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.core.Schemas

/** Streaming ingestion: JSON drop-dir → typed parse → enrich → date-
  * partitioned Parquet append with checkpointing.
  *
  * Parity target: StreamingJob.scala:30-53 (Kafka → Delta). This environment
  * has no Kafka/Delta jars (SURVEY.md §7), so the source is Structured
  * Streaming's file source over a drop directory — same at-least-once
  * delivery + offset tracking via checkpoint — and the sink is the Parquet
  * file sink, whose `_spark_metadata` commit log gives exactly-once file
  * visibility to readers that go through the same path (ST2/ST8). Swapping
  * `format("kafka")`/`format("delta")` back in is a config change, not a
  * design change.
  *
  * Scale notes: the enrich step is a pure projection (codegen, no shuffle);
  * partitioning by `event_date` makes the batch side's date-range reads
  * prune at the directory level (§4 partition pruning). `maxFilesPerTrigger`
  * bounds per-microbatch work so processing time stays under the trigger
  * interval at any backlog size.
  */
object StreamingIngest {

  /** The enrichment applied to every parsed micro-batch (P6):
    * event_date partition column + ingest timestamp. */
  def enrich(parsed: DataFrame): DataFrame =
    parsed
      .withColumn("event_date", to_date(col("event_timestamp")))
      .withColumn("processing_timestamp", current_timestamp())

  /** Start the raw-ingest query: dropDir JSON → transactions Parquet.
    *
    * `schema` defaults to the reference transaction schema; an upgraded
    * producer widens it (the streaming face of Delta `schema.autoMerge`,
    * ref SparkManager.scala:36). The sink's commit log tracks files, not
    * schemas, so a restart on the SAME checkpoint with a wider schema is
    * legal: offsets resume exactly-once, old files keep the narrow footer,
    * and readers union the generations with `mergeSchema`
    * (SchemaEvolutionSpec covers the full upgrade round trip). */
  def start(
      spark: SparkSession,
      dropDir: String,
      tablePath: String,
      checkpointDir: String,
      maxFilesPerTrigger: Int = 100,
      trigger: Trigger = Trigger.ProcessingTime(0),
      schema: org.apache.spark.sql.types.StructType = Schemas.TransactionSchema): StreamingQuery = {
    // A maintenance run (SinkCompaction) crashed between its log-swap
    // renames leaves `_spark_metadata` retired to an `.old-` sibling. The
    // file sink would silently CREATE A FRESH EMPTY LOG here — resetting
    // the exactly-once ledger and orphaning every prior data file (which
    // the next vacuum would then delete). Repair before starting.
    graft.core.AtomicWrite.recoverSwap(spark, s"$tablePath/_spark_metadata")
    val raw = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dropDir)
    enrich(raw).writeStream
      .queryName("transactions-ingest")
      .format("parquet")
      .partitionBy("event_date")
      .outputMode("append")
      .option("path", tablePath)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }

  /** Read the ingested table THROUGH the sink's commit log so in-progress
    * files are invisible (the Parquet stand-in for Delta ACID, §7.3).
    *
    * Repairs a crashed maintenance log-swap first: with `_spark_metadata`
    * missing, `spark.read.parquet` would NOT fail — it silently falls back
    * to plain directory listing, which during/after an interrupted
    * compaction can surface old small files AND their compacted rewrites
    * (a ~2× duplicate view). Going through this method restores the log
    * and with it exactly-once visibility.
    *
    * Reader-safe repair: `gcTmp = false` — a reader must not delete the
    * `.tmp-` siblings of a maintenance publish that is legitimately in
    * flight, and a repair rename lost to a concurrent reader is tolerated.
    * `mergeSchema` is on so a table whose producer widened the schema
    * (see [[start]]) reads as the union of generations instead of a
    * footer-dependent subset. */
  def readTable(spark: SparkSession, tablePath: String): DataFrame = {
    graft.core.AtomicWrite.recoverSwap(spark, s"$tablePath/_spark_metadata", gcTmp = false)
    spark.read.option("mergeSchema", "true").parquet(tablePath)
  }
}
