package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.core.Schemas

/** Hand-built transaction rows for unit specs — edge cases the corpus-derived
  * oracle queries cannot reach (FIXTURES.md §1: LTV exactly at segment
  * boundaries, fraud-score-only fraud rows, null enum keys). */
object TxFixture {

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** One 31-field row; defaults are a plain completed web transaction. */
  def row(
      id: String = "t1",
      eventTs: Timestamp = ts("2026-01-05 10:30:00"),
      customerId: String = "C1",
      tier: String = "gold",
      productId: String = "P1",
      productName: String = "Widget",
      category: String = "electronics",
      subCategory: String = "phones",
      brand: String = "Acme",
      quantity: Int = 1,
      unitPrice: Double = 100.0,
      discountPct: java.lang.Double = 0.0,
      totalAmount: Double = 100.0,
      taxAmount: java.lang.Double = 9.0,
      paymentMethod: String = "credit_card",
      cardNetwork: String = null,
      status: String = "completed",
      channel: String = "web",
      storeId: String = null,
      region: String = "west",
      city: String = "Mumbai",
      isFraud: java.lang.Boolean = false,
      fraudScore: java.lang.Double = 0.01): Row =
    Row(id, eventTs, null, customerId, tier, productId, productName, category,
      subCategory, brand, quantity, unitPrice, discountPct, totalAmount,
      taxAmount, "USD", paymentMethod, cardNetwork, status, channel, storeId,
      region, city, null, null, null, null, null, isFraud, fraudScore, null)

  def df(spark: SparkSession, rows: Row*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Schemas.TransactionSchema)
}
