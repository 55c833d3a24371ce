package graft

import org.apache.spark.sql.Row

import graft.TxFixture._
import graft.operators.Analytics

/** Unit coverage for the branches the corpus oracle can't reach:
  * segment CASE-chain boundaries (ref AnalysisAggregator.scala:146-153),
  * fraud-filter null semantics (:162-163), null-key grouping (:105),
  * null-skipping countDistinct (:93), velocity date math (:276-283). */
class AnalyticsSpec extends SparkSpec {

  test("customer segmentation hits every CASE branch at exact boundaries") {
    val d = df(spark,
      row(id = "a1", customerId = "VIP", totalAmount = 10000.0),
      row(id = "b1", customerId = "HIGH", totalAmount = 9999.99),
      row(id = "c1", customerId = "MID", totalAmount = 1000.0),
      row(id = "d1", customerId = "ONE", totalAmount = 999.99),
      row(id = "e1", customerId = "LOW", totalAmount = 400.0),
      row(id = "e2", customerId = "LOW", totalAmount = 400.0),
      row(id = "x1", customerId = "PENDING", totalAmount = 99999.0, status = "pending"))
    val seg = Analytics.customerSegmentation(d)
      .select("customer_id", "segment").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(seg == Map("VIP" -> "vip", "HIGH" -> "high_value",
      "MID" -> "mid_value", "ONE" -> "one_time", "LOW" -> "low_value"))
  }

  test("segmentation channel conditional counts") {
    val d = df(spark,
      row(id = "a1", customerId = "C", channel = "mobile_app"),
      row(id = "a2", customerId = "C", channel = "mobile_app"),
      row(id = "a3", customerId = "C", channel = "web"),
      row(id = "a4", customerId = "C", channel = "pos_in_store"),
      row(id = "a5", customerId = "C", channel = "call_center"))
    val r = Analytics.customerSegmentation(d)
      .select("mobile_orders", "web_orders", "instore_orders").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 1L, 1L)))
  }

  test("fraud filter: null is_fraudulent passes only via score branch") {
    val d = df(spark,
      row(id = "f1", isFraud = true, fraudScore = null), // flag branch
      row(id = "f2", isFraud = null, fraudScore = 0.9),  // score branch
      row(id = "f3", isFraud = false, fraudScore = 0.71), // score branch
      row(id = "f4", isFraud = null, fraudScore = 0.5),  // excluded
      row(id = "f5", isFraud = false, fraudScore = 0.7), // excluded (strict >)
      row(id = "f6", isFraud = null, fraudScore = null)) // excluded
    val n = Analytics.fraudDetectionAnalysis(d)
      .agg(org.apache.spark.sql.functions.sum("fraud_count")).head().getLong(0)
    assert(n == 3L)
  }

  test("fraud analysis: affected_cities sorted and deduplicated") {
    val d = df(spark,
      row(id = "f1", isFraud = true, city = "Pune"),
      row(id = "f2", isFraud = true, city = "Agra"),
      row(id = "f3", isFraud = true, city = "Pune"))
    val cities = Analytics.fraudDetectionAnalysis(d)
      .select("affected_cities").head().getString(0)
    assert(cities == "Agra,Pune")
  }

  test("payment analysis: null card_network forms its own group; shares sum to 100") {
    val d = df(spark,
      row(id = "p1", paymentMethod = "credit_card", cardNetwork = "visa", totalAmount = 60.0),
      row(id = "p2", paymentMethod = "upi", cardNetwork = null, totalAmount = 40.0))
    val rows = Analytics.paymentMethodAnalysis(d).collect()
    assert(rows.length == 2)
    val byNet = rows.map(r => Option(r.getAs[String]("card_network")) -> r.getAs[Double]("revenue_share_pct")).toMap
    assert(byNet(Some("visa")) == 60.0 && byNet(None) == 40.0)
  }

  test("region revenue: countDistinct skips null store_id") {
    val d = df(spark,
      row(id = "r1", storeId = "S1", channel = "pos_in_store"),
      row(id = "r2", storeId = null, channel = "web"),
      row(id = "r3", storeId = "S1", channel = "pos_in_store"))
    val r = Analytics.revenueByRegionAndCity(d).select("active_stores").head()
    assert(r.getLong(0) == 1L)
  }

  test("hourly trends derives date and hour from event time") {
    val d = df(spark,
      row(id = "h1", eventTs = ts("2026-01-05 23:59:59")),
      row(id = "h2", eventTs = ts("2026-01-05 23:01:00")),
      row(id = "h3", eventTs = ts("2026-01-06 00:00:00")))
    val rows = Analytics.hourlyTrendAnalysis(d)
      .select("event_date", "event_hour", "transaction_count").collect()
      .map(r => (r.get(0).toString, r.getInt(1), r.getLong(2))).toSet
    assert(rows == Set(("2026-01-05", 23, 2L), ("2026-01-06", 0, 1L)))
  }

  test("inventory velocity: days_in_range inclusive, velocity = units/days") {
    val d = df(spark,
      row(id = "v1", eventTs = ts("2026-01-01 09:00:00"), quantity = 6),
      row(id = "v2", eventTs = ts("2026-01-03 18:00:00"), quantity = 6))
    val r = Analytics.inventoryVelocity(d)
      .select("days_in_range", "daily_velocity", "total_units_sold").head()
    assert(r.getLong(0) == 3L && r.getDouble(1) == 4.0 && r.getLong(2) == 12L)
  }

  test("channel performance fraud rate") {
    val d = df(spark,
      row(id = "c1", isFraud = true),
      row(id = "c2", isFraud = false),
      row(id = "c3", isFraud = null),
      row(id = "c4", isFraud = false))
    val r = Analytics.channelPerformance(d).select("fraud_count", "fraud_rate_pct").head()
    assert(r.getLong(0) == 1L && r.getDouble(1) == 25.0)
  }

  test("dispatcher: unknown type throws, full_report fans out to all 8") {
    val d = df(spark, row())
    assertThrows[IllegalArgumentException](Analytics.runAnalysis(d, "nope"))
    assert(Analytics.runAnalysis(d, "full_report").keySet == Analytics.validAnalysisTypes - "full_report")
    assert(Analytics.runAnalysis(d, "revenue_by_category").keySet == Set("revenue_by_category"))
  }

  test("deterministic numerics: money sums independent of partitioning") {
    val rows: Seq[Row] = (1 to 500).map(i => row(id = s"m$i", customerId = "C",
      totalAmount = i * 0.01 + 1000000.0))
    val one = df(spark, rows: _*).repartition(1)
    val many = df(spark, rows: _*).repartition(7)
    val a = Analytics.revenueByCategory(one).select("total_revenue").head().getDouble(0)
    val b = Analytics.revenueByCategory(many).select("total_revenue").head().getDouble(0)
    assert(a == b, s"sum must be bit-identical under repartitioning: $a vs $b")
  }
}
