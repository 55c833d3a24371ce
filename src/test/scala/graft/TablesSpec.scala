package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.core.Tables

/** The events corpus has shipped `ts` in more than one parquet physical type
  * across driver regenerations (TIMESTAMP(NANOS) → int64-nanos read path, then
  * plain `timestamp[us]`). [[Tables.eventsWithTs]] must normalize every
  * generation to the same session-UTC `ts_ts` TimestampType value. */
class TablesSpec extends SparkSpec {

  // One µs-aligned instant, expressed per physical type.
  private val epochMicros = 1700000123456789L

  private def writeEvents(dir: String)(tsCol: org.apache.spark.sql.Column): Unit = {
    import spark.implicits._
    Seq((1L, 7L, "click", 0.5, "{}"))
      .toDF("event_id", "user_id", "event_type", "value", "props")
      .withColumn("ts", tsCol)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
  }

  private def tsTsMicros(dir: String): Long = {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts_ts").dataType == TimestampType, df.schema.treeString)
    df.select(unix_micros(col("ts_ts"))).head().getLong(0)
  }

  test("eventsWithTs normalizes int64-nanos, timestamp_ntz, and timestamp to the same ts_ts") {
    // int64 nanos (legacy TIMESTAMP(NANOS) corpus shape)
    val dNanos = Files.createTempDirectory("graft-ev-nanos").toString
    writeEvents(dNanos)(lit(epochMicros * 1000L))

    // timestamp_ntz (current timestamp[us] corpus shape)
    val dNtz = Files.createTempDirectory("graft-ev-ntz").toString
    writeEvents(dNtz)(timestamp_micros(lit(epochMicros)).cast("timestamp_ntz"))

    // timestamp (UTC-adjusted)
    val dTz = Files.createTempDirectory("graft-ev-tz").toString
    writeEvents(dTz)(timestamp_micros(lit(epochMicros)))

    assert(tsTsMicros(dNanos) == epochMicros)
    assert(tsTsMicros(dNtz) == epochMicros)
    assert(tsTsMicros(dTz) == epochMicros)
  }

  test("the live corpus events table analyzes and yields rows") {
    val sf = "/root/testdata/sf0.001"
    val df = Tables.events(spark, sf)
    assert(df.schema.fieldNames.contains("ts_ts"))
    assert(df.schema("ts_ts").dataType == TimestampType)
    assert(df.limit(1).count() == 1L)
  }
}
