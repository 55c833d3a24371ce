package graft.core

import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, from_json}

/** Transaction-domain data model (31 columns), expressed as a declarative
  * field inventory rather than a hand-chained builder.
  *
  * Parity target: the reference's fixed transaction StructType
  * (ref: src/main/scala/com/pipeline/models/Schemas.scala:8-39) — same
  * field names, types, and nullability, enforced at parse time; malformed
  * JSON rows become null structs (PERMISSIVE `from_json`), not errors.
  * Nullability doubles as semantics there (null card_network ⇔ non-card
  * payment, null store_id ⇔ digital channel, null fraud fields ⇔ unscored),
  * so the required set below is the fields every generator path populates.
  */
object Schemas {

  /** Name → type inventory, in the reference's column order. */
  private val fieldTypes: Seq[(String, DataType)] = {
    val s = StringType; val ts = TimestampType; val d = DoubleType
    Seq(
      "transaction_id" -> s, "event_timestamp" -> ts,
      "processing_timestamp" -> ts,
      "customer_id" -> s, "customer_tier" -> s,
      "product_id" -> s, "product_name" -> s, "category" -> s,
      "sub_category" -> s, "brand" -> s,
      "quantity" -> IntegerType, "unit_price" -> d, "discount_percent" -> d,
      "total_amount" -> d, "tax_amount" -> d, "currency" -> s,
      "payment_method" -> s, "card_network" -> s, "transaction_status" -> s,
      "channel" -> s, "store_id" -> s,
      "region" -> s, "city" -> s, "state" -> s, "postal_code" -> s,
      "device_type" -> s, "session_id" -> s, "ip_address" -> s,
      "is_fraudulent" -> BooleanType, "fraud_score" -> d, "batch_id" -> s)
  }

  /** Columns every event carries; the rest are nullable-by-meaning. */
  private val required = Set(
    "transaction_id", "event_timestamp", "customer_id", "product_id",
    "product_name", "category", "quantity", "unit_price", "total_amount",
    "currency", "payment_method", "transaction_status", "channel",
    "region", "city")

  val TransactionSchema: StructType = StructType(fieldTypes.map {
    case (name, dt) => StructField(name, dt, nullable = !required(name))
  })

  /** Decode a raw `value` payload column (bytes or string, Kafka-shaped or
    * file-stream) into TransactionSchema rows, PERMISSIVE-ly. */
  def parseJsonValue(df: DataFrame): DataFrame = {
    val decoded: Column = from_json(col("value").cast("string"), TransactionSchema)
    df.select(decoded.as("tx")).select("tx.*")
  }
}
