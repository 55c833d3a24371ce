package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.batch.{BatchRegistry, BatchRequest, BatchService}
import graft.core.{SparkSessionFactory, TransactionGen}
import graft.streaming.StreamingIngest

/** Standalone end-to-end drive of the whole engine loop (ST8 stream/batch
  * convergence): generate reference-distribution transactions → stream them
  * through the JSON drop-dir ingest into the partitioned table → run a
  * full_report batch over the STREAMED table → read results back paginated.
  * Prints one summary line per stage; exits non-zero on any failure.
  */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSessionFactory.create(master = "local[8]",
      appName = "graft-drive", shufflePartitions = Some(8))
    spark.sparkContext.setLogLevel("ERROR")
    val root = Files.createTempDirectory("graft-drive").toString
    val (drop, table, ckpt, out) =
      (s"$root/drop", s"$root/table", s"$root/ckpt", s"$root/batches")

    // 1. 20k deterministic transactions, landed as JSON in two waves
    val tx = TransactionGen.generate(spark, 20000L, days = 30)
    tx.filter(col("transaction_id").substr(5, 10).cast("long") % 2 === 0)
      .toJSON.coalesce(2).write.mode("append").text(drop)
    println(s"DRIVE gen: 20000 rows, wave1 landed")

    // 2. stream ingest (wave 1), then wave 2 through the SAME checkpoint
    val q1 = StreamingIngest.start(spark, drop, table, ckpt)
    q1.processAllAvailable(); q1.stop()
    tx.filter(col("transaction_id").substr(5, 10).cast("long") % 2 =!= 0)
      .toJSON.coalesce(2).write.mode("append").text(drop)
    val q2 = StreamingIngest.start(spark, drop, table, ckpt)
    q2.processAllAvailable(); q2.stop()
    val streamed = StreamingIngest.readTable(spark, table)
    val n = streamed.count()
    assert(n == 20000L, s"streamed table must hold every generated row, got $n")
    val nDates = streamed.select("event_date").distinct().count()
    println(s"DRIVE ingest: $n rows in $nDates date partitions (2 waves, 1 checkpoint)")

    // 3. batch full_report over the streamed table
    val svc = new BatchService(spark, new BatchRegistry, out)
    val id = svc.submit(table, BatchRequest(
      startDate = "2026-01-01", endDate = "2026-01-30",
      analysisType = "full_report",
      filters = Map("transaction_status" -> "completed"))).fold(
      err => sys.error(s"submit failed: $err"), identity)
    val deadline = System.currentTimeMillis() + 120000
    while (svc.status(id).exists(r => r.status.toString == "Pending" ||
        r.status.toString == "Running") && System.currentTimeMillis() < deadline)
      Thread.sleep(200)
    val rec = svc.status(id).get
    assert(rec.status.toString == "Completed", s"batch: $rec")
    println(s"DRIVE batch: $id completed, rows=${rec.rowCount.get}")

    // 4. results readback: one aggregation + stable pagination
    val rev = svc.readAggregated(id, "revenue_by_category")
      .fold(e => sys.error(e), identity)
    assert(rev.count() > 0)
    val page = svc.readData(id, offset = 100, limit = 50)
      .fold(e => sys.error(e), identity)
    assert(page.count() == 50)
    println(s"DRIVE readback: ${rev.count()} categories, page(100,50) ok")
    println("DRIVE OK")
    svc.shutdown()
    spark.stop()
  }
}
