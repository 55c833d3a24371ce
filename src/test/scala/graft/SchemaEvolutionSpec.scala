package graft

import java.nio.file.Files

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

/** Storage-layer schema evolution over Parquet partitions — the stand-in for
  * the reference's Delta `schema.autoMerge` (ref SparkManager.scala:36): a
  * long-lived table whose later partitions were written with a widened
  * schema must read back as the union schema with null-fill, via the
  * `mergeSchema` read option. (In-flight union evolution is covered by
  * [Q:rel_union_by_name]; this suite covers the at-rest layout.) */
class SchemaEvolutionSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("mergeSchema: widened later partitions read as union schema with null-fill") {
    import spark.implicits._
    val root = tmp("evolve")
    // month 1: original schema (id, amount)
    Seq(("t1", 10L), ("t2", 20L)).toDF("id", "amount")
      .write.parquet(s"$root/event_month=2026-01")
    // month 2: same columns plus two added ones — the autoMerge scenario
    Seq(("t3", 30L, 0.18, "upi"), ("t4", 40L, 0.0, "card"))
      .toDF("id", "amount", "discount", "method")
      .write.parquet(s"$root/event_month=2026-02")

    // default read resolves the schema from one footer — mergeSchema=true is
    // what makes the union visible (assert the option genuinely matters)
    val merged = spark.read.option("mergeSchema", "true").parquet(root)
    val fields = merged.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(fields("id") == StringType && fields("amount") == LongType)
    assert(fields("discount") == DoubleType && fields("method") == StringType)
    assert(fields.contains("event_month"), "partition column must survive discovery")
    assert(merged.schema.forall(_.nullable), "merged fields must be nullable for null-fill")

    // old-partition rows null-fill the added columns; new rows carry values
    val rows = merged.orderBy("id").collect()
    assert(rows.length == 4)
    val byId = rows.map(r => r.getString(r.fieldIndex("id")) -> r).toMap
    assert(byId("t1").isNullAt(byId("t1").fieldIndex("discount")))
    assert(byId("t1").isNullAt(byId("t1").fieldIndex("method")))
    assert(byId("t3").getDouble(byId("t3").fieldIndex("discount")) == 0.18)
    assert(byId("t4").getString(byId("t4").fieldIndex("method")) == "card")

    // aggregation over the union schema treats missing as null (not 0)
    val agg = merged.agg(
      count(lit(1)).as("n"), count(col("discount")).as("n_disc")).head()
    assert(agg.getLong(0) == 4 && agg.getLong(1) == 2)
  }

  test("streaming upgrade: widened schema resumes the same checkpoint, exactly-once") {
    import org.apache.spark.sql.types.StructType
    import graft.core.Schemas
    import graft.streaming.StreamingIngest
    val (drop, table, ckpt) = (tmp("updrop"), tmp("uptable"), tmp("upckpt"))
    def tx(id: String, extra: String = "") =
      s"""{"transaction_id":"$id","event_timestamp":"2026-03-01 10:00:00",
          "customer_id":"C1","product_id":"P1","product_name":"W",
          "category":"electronics","quantity":1,"unit_price":10.0,
          "total_amount":10.0,"currency":"USD","payment_method":"upi",
          "transaction_status":"completed","channel":"web","region":"west",
          "city":"Pune"$extra}""".replaceAll("\n\\s*", "")

    // generation 1: reference schema
    Files.write(java.nio.file.Paths.get(drop, "g1.json"),
      (tx("v1a") + "\n" + tx("v1b")).getBytes)
    val q1 = StreamingIngest.start(spark, drop, table, ckpt)
    q1.processAllAvailable(); q1.stop()

    // generation 2: producer upgrade adds loyalty_points; SAME checkpoint.
    // The sink's commit log tracks files (not schemas), so offsets resume
    // exactly-once and the new files carry the wider footer.
    Files.write(java.nio.file.Paths.get(drop, "g2.json"),
      tx("v2a", ""","loyalty_points":42""").getBytes)
    val widened: StructType =
      Schemas.TransactionSchema.add("loyalty_points", LongType)
    val q2 = StreamingIngest.start(spark, drop, table, ckpt, schema = widened)
    q2.processAllAvailable(); q2.stop()

    // read through the PRODUCT reader: readTable must itself carry
    // mergeSchema, or the union schema would be footer-order-dependent
    val merged = StreamingIngest.readTable(spark, table)
    assert(merged.count() == 3, "no replays, no skips across the upgrade")
    assert(merged.schema.fieldNames.contains("loyalty_points"))
    val byId = merged.collect()
      .map(r => r.getString(r.fieldIndex("transaction_id")) -> r).toMap
    assert(byId("v1a").isNullAt(byId("v1a").fieldIndex("loyalty_points")),
      "old-generation rows null-fill the added column")
    assert(byId("v2a").getLong(byId("v2a").fieldIndex("loyalty_points")) == 42L)
  }

  test("mergeSchema: incompatible type change fails loudly, not silently") {
    import spark.implicits._
    val root = tmp("conflict")
    Seq(("t1", 10L)).toDF("id", "amount").write.parquet(s"$root/v=1")
    Seq(("t2", "not-a-number")).toDF("id", "amount").write.parquet(s"$root/v=2")
    val e = intercept[SparkException] {
      spark.read.option("mergeSchema", "true").parquet(root).collect()
    }
    // merge rejects LongType vs StringType on `amount` — a corrupt-write
    // guard, the analog of Delta refusing a non-additive schema change
    assert(e.getMessage.contains("merge") || e.getMessage.contains("amount"),
      s"unexpected failure mode: ${e.getMessage}")
  }
}
