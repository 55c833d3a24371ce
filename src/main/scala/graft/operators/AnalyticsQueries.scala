package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.QueryModule
import graft.core.TransactionView

/** Oracle wiring for [[Analytics]]: each reference analysis runs end-to-end
  * on the transaction view derived from the driver corpus
  * ([[graft.core.TransactionView]]), and the oracle SQL is the SAME view as
  * a DuckDB CTE + the same aggregation. This checks the real parity code
  * path, not a hand-written analog.
  *
  * Timestamp/date output columns are cast to string at the harness boundary
  * only (engine-portable rendering); the [[Analytics]] functions themselves
  * keep native types.
  */
object AnalyticsQueries extends QueryModule {

  private def tx(s: SparkSession, d: String): DataFrame = TransactionView(s, d)

  private def strCols(df: DataFrame, cols: String*): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast("string")))

  val queries: Map[String, Q] = Map(
    "ana_revenue_by_category" -> ((s, d) => Analytics.revenueByCategory(tx(s, d))),
    "ana_revenue_by_region" -> ((s, d) => Analytics.revenueByRegionAndCity(tx(s, d))),
    "ana_payment_analysis" -> ((s, d) => Analytics.paymentMethodAnalysis(tx(s, d))),
    "ana_customer_segmentation" -> ((s, d) =>
      strCols(Analytics.customerSegmentation(tx(s, d)),
        "last_purchase_date", "first_purchase_date")),
    "ana_fraud_analysis" -> ((s, d) => Analytics.fraudDetectionAnalysis(tx(s, d))),
    "ana_hourly_trends" -> ((s, d) =>
      strCols(Analytics.hourlyTrendAnalysis(tx(s, d)), "event_date")
        .withColumn("event_hour", col("event_hour").cast("long"))),
    "ana_channel_performance" -> ((s, d) => Analytics.channelPerformance(tx(s, d))),
    "ana_inventory_velocity" -> ((s, d) =>
      strCols(Analytics.inventoryVelocity(tx(s, d)), "first_sale", "last_sale")),
    "ana_summary_stats" -> ((s, d) =>
      strCols(Analytics.summaryStats(tx(s, d)), "min_ts", "max_ts")),
  )

  private val cte = TransactionView.duckCte

  val oracleSql: Map[String, String] = Map(
    "ana_revenue_by_category" -> s"""$cte
      SELECT category,
        CAST(SUM(total_amount) AS DOUBLE) AS total_revenue,
        CAST(SUM(total_amount) AS DOUBLE) / CAST(COUNT(total_amount) AS DOUBLE) AS avg_order_value,
        COUNT(transaction_id) AS transaction_count,
        CAST(SUM(quantity) AS BIGINT) AS total_units_sold,
        CAST(SUM(CAST(discount_percent AS DECIMAL(18,4))) AS DOUBLE) / CAST(COUNT(discount_percent) AS DOUBLE) AS avg_discount_pct,
        COUNT(DISTINCT customer_id) AS unique_customers
      FROM tx WHERE transaction_status = 'completed' GROUP BY 1""",
    "ana_revenue_by_region" -> s"""$cte
      SELECT region, city,
        CAST(SUM(total_amount) AS DOUBLE) AS total_revenue,
        COUNT(transaction_id) AS transaction_count,
        CAST(SUM(total_amount) AS DOUBLE) / CAST(COUNT(total_amount) AS DOUBLE) AS avg_order_value,
        COUNT(DISTINCT store_id) AS active_stores,
        COUNT(DISTINCT customer_id) AS unique_customers
      FROM tx WHERE transaction_status = 'completed' GROUP BY 1, 2""",
    "ana_payment_analysis" -> s"""$cte
      SELECT payment_method, card_network,
        COUNT(transaction_id) AS transaction_count,
        CAST(SUM(total_amount) AS DOUBLE) / CAST(COUNT(total_amount) AS DOUBLE) AS avg_transaction_value,
        COUNT(DISTINCT customer_id) AS unique_customers,
        CAST(SUM(total_amount) * 100 AS DOUBLE) / CAST(SUM(SUM(total_amount)) OVER () AS DOUBLE) AS revenue_share_pct,
        CAST(SUM(total_amount) AS DOUBLE) AS total_revenue
      FROM tx WHERE transaction_status = 'completed' GROUP BY 1, 2""",
    "ana_customer_segmentation" -> s"""$cte
      SELECT customer_id, customer_tier,
        COUNT(transaction_id) AS total_transactions,
        CAST(SUM(total_amount) AS DOUBLE) / CAST(COUNT(total_amount) AS DOUBLE) AS avg_order_value,
        CAST(MAX(event_timestamp) AS VARCHAR) AS last_purchase_date,
        CAST(MIN(event_timestamp) AS VARCHAR) AS first_purchase_date,
        COUNT(DISTINCT category) AS category_diversity,
        CAST(SUM(CASE WHEN channel = 'mobile_app' THEN 1 ELSE 0 END) AS BIGINT) AS mobile_orders,
        CAST(SUM(CASE WHEN channel = 'web' THEN 1 ELSE 0 END) AS BIGINT) AS web_orders,
        CAST(SUM(CASE WHEN channel = 'pos_in_store' THEN 1 ELSE 0 END) AS BIGINT) AS instore_orders,
        CASE WHEN SUM(total_amount) >= 10000 THEN 'vip'
             WHEN SUM(total_amount) >= 5000 THEN 'high_value'
             WHEN SUM(total_amount) >= 1000 THEN 'mid_value'
             WHEN COUNT(transaction_id) = 1 THEN 'one_time'
             ELSE 'low_value' END AS segment,
        CAST(SUM(total_amount) AS DOUBLE) AS lifetime_value
      FROM tx WHERE transaction_status = 'completed' GROUP BY 1, 2""",
    "ana_fraud_analysis" -> s"""$cte
      SELECT category, region, channel, payment_method,
        COUNT(transaction_id) AS fraud_count,
        CAST(SUM(total_amount) AS DOUBLE) AS fraud_total_amount,
        CAST(SUM(CAST(fraud_score AS DECIMAL(18,4))) AS DOUBLE) / CAST(COUNT(fraud_score) AS DOUBLE) AS avg_fraud_score,
        CAST(SUM(total_amount) AS DOUBLE) / CAST(COUNT(total_amount) AS DOUBLE) AS avg_fraud_amount,
        COUNT(DISTINCT customer_id) AS affected_customers,
        ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT city)), ',') AS affected_cities
      FROM tx WHERE is_fraudulent = TRUE OR fraud_score > 0.7 GROUP BY 1, 2, 3, 4""",
    "ana_hourly_trends" -> s"""$cte
      SELECT CAST(CAST(event_timestamp AS DATE) AS VARCHAR) AS event_date,
        CAST(HOUR(event_timestamp) AS BIGINT) AS event_hour,
        COUNT(transaction_id) AS transaction_count,
        CAST(SUM(total_amount) AS DOUBLE) AS hourly_revenue,
        CAST(SUM(total_amount) AS DOUBLE) / CAST(COUNT(total_amount) AS DOUBLE) AS avg_order_value,
        COUNT(DISTINCT customer_id) AS unique_customers,
        CAST(SUM(quantity) AS BIGINT) AS units_sold
      FROM tx WHERE transaction_status = 'completed' GROUP BY 1, 2""",
    "ana_channel_performance" -> s"""$cte
      SELECT channel,
        COUNT(transaction_id) AS transaction_count,
        CAST(SUM(total_amount) AS DOUBLE) AS total_revenue,
        CAST(SUM(total_amount) AS DOUBLE) / CAST(COUNT(total_amount) AS DOUBLE) AS avg_order_value,
        COUNT(DISTINCT customer_id) AS unique_customers,
        CAST(SUM(CAST(discount_percent AS DECIMAL(18,4))) AS DOUBLE) / CAST(COUNT(discount_percent) AS DOUBLE) AS avg_discount,
        CAST(SUM(CASE WHEN is_fraudulent = TRUE THEN 1 ELSE 0 END) AS BIGINT) AS fraud_count,
        CAST(SUM(CAST(fraud_score AS DECIMAL(18,4))) AS DOUBLE) / CAST(COUNT(fraud_score) AS DOUBLE) AS avg_fraud_score,
        CAST(SUM(CASE WHEN is_fraudulent = TRUE THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(transaction_id) AS DOUBLE) * 100 AS fraud_rate_pct
      FROM tx WHERE transaction_status = 'completed' GROUP BY 1""",
    "ana_inventory_velocity" -> s"""$cte
      SELECT product_id, product_name, category, sub_category, brand,
        CAST(SUM(quantity) AS BIGINT) AS total_units_sold,
        COUNT(transaction_id) AS order_count,
        CAST(SUM(total_amount) AS DOUBLE) AS total_revenue,
        CAST(SUM(CAST(unit_price AS DECIMAL(18,4))) AS DOUBLE) / CAST(COUNT(unit_price) AS DOUBLE) AS avg_selling_price,
        CAST(SUM(CAST(discount_percent AS DECIMAL(18,4))) AS DOUBLE) / CAST(COUNT(discount_percent) AS DOUBLE) AS avg_discount,
        COUNT(DISTINCT region) AS regions_sold_in,
        COUNT(DISTINCT store_id) AS stores_sold_in,
        CAST(MIN(event_timestamp) AS VARCHAR) AS first_sale,
        CAST(MAX(event_timestamp) AS VARCHAR) AS last_sale,
        CAST(DATE_DIFF('day', CAST(MIN(event_timestamp) AS DATE), CAST(MAX(event_timestamp) AS DATE)) + 1 AS BIGINT) AS days_in_range,
        CAST(SUM(quantity) AS DOUBLE) / CAST(DATE_DIFF('day', CAST(MIN(event_timestamp) AS DATE), CAST(MAX(event_timestamp) AS DATE)) + 1 AS DOUBLE) AS daily_velocity
      FROM tx WHERE transaction_status = 'completed' GROUP BY 1, 2, 3, 4, 5""",
    "ana_summary_stats" -> s"""$cte
      SELECT COUNT(*) AS n_rows,
        CAST(MIN(event_timestamp) AS VARCHAR) AS min_ts,
        CAST(MAX(event_timestamp) AS VARCHAR) AS max_ts,
        CAST(SUM(total_amount) AS DOUBLE) / CAST(COUNT(total_amount) AS DOUBLE) AS avg_amount,
        CAST(SUM(CAST(CAST(is_fraudulent AS INT) AS DECIMAL(18,4))) AS DOUBLE) / CAST(COUNT(is_fraudulent) AS DOUBLE) AS fraud_rate,
        COUNT(DISTINCT customer_id) AS n_customers
      FROM tx""",
  )
}
