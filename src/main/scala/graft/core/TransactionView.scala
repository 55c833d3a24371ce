package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic mapping of the driver corpus (TPC-H-ish tables) onto the
  * reference's 31-column transaction schema, so the reference's analysis
  * functions ([[graft.operators.Analytics]]) can be oracle-checked end-to-end
  * on real testdata: the SAME mapping is expressed once in Spark here and
  * once as a DuckDB CTE ([[duckCte]]), and every analytics oracle query is
  * `WITH tx AS (<cte>) SELECT … FROM tx`.
  *
  * Every derived column uses only engine-agnostic, exactly-representable
  * expressions (integer modulo, CASE, decimal arithmetic per
  * [[graft.core.Ora]]) so Spark and DuckDB produce bit-identical values.
  *
  * Scale notes: the view is a 6-table join. `nation`/`region` are broadcast
  * (constant-size); `part`/`customer`/`orders` joins are left to Catalyst +
  * AQE (sort-merge with skew handling at 100 TB, broadcast at small SF —
  * AQE picks per-run from actual sizes). Nothing here is collected to the
  * driver.
  */
object TransactionView {

  import Ora.dec2

  def apply(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val ord = Tables.orders(s, d)
    val cust = Tables.customer(s, d)
    val nat = broadcast(Tables.nation(s, d))
    val reg = broadcast(Tables.region(s, d))
    val prt = Tables.part(s, d)

    val joined = li
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(nat, col("c_nationkey") === col("n_nationkey"))
      .join(reg, col("n_regionkey") === col("r_regionkey"))
      .join(prt, col("l_partkey") === col("p_partkey"))

    val channel = when(col("l_suppkey") % 5 === 0, "web")
      .when(col("l_suppkey") % 5 === 1, "mobile_app")
      .when(col("l_suppkey") % 5 === 2, "pos_in_store")
      .when(col("l_suppkey") % 5 === 3, "marketplace")
      .otherwise("call_center")

    joined.select(
      concat(col("l_orderkey"), lit("-"), col("l_linenumber")).as("transaction_id"),
      col("l_shipdate").as("event_timestamp"),
      lit(null).cast("timestamp").as("processing_timestamp"),
      col("o_custkey").cast("string").as("customer_id"),
      col("o_orderpriority").as("customer_tier"),
      col("l_partkey").cast("string").as("product_id"),
      col("p_name").as("product_name"),
      col("p_type").as("category"),
      col("p_size").cast("string").as("sub_category"),
      col("p_brand").as("brand"),
      col("l_quantity").cast("int").as("quantity"),
      col("l_extendedprice").as("unit_price"),
      (dec2(col("l_discount")) * 100).cast("double").as("discount_percent"),
      (dec2(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec2(col("l_discount"))))
        .cast("decimal(18,4)").as("total_amount"),
      (dec2(col("l_extendedprice")) * dec2(col("l_tax")))
        .cast("decimal(18,4)").as("tax_amount"),
      lit("USD").as("currency"),
      col("o_orderstatus").as("payment_method"),
      when(col("l_linenumber") % 2 === 0, col("l_linestatus"))
        .otherwise(lit(null).cast("string")).as("card_network"),
      when(col("l_returnflag") === "N", "completed")
        .when(col("l_returnflag") === "R", "refunded")
        .otherwise("failed").as("transaction_status"),
      channel.as("channel"),
      when(channel === "pos_in_store", concat(lit("STORE-"), col("l_suppkey") % 50))
        .otherwise(lit(null).cast("string")).as("store_id"),
      col("r_name").as("region"),
      col("n_name").as("city"),
      col("n_name").as("state"),
      col("c_custkey").cast("string").as("postal_code"),
      when(col("l_linenumber") % 4 === 0, "android")
        .when(col("l_linenumber") % 4 === 1, "ios")
        .when(col("l_linenumber") % 4 === 2, "desktop")
        .otherwise("tablet").as("device_type"),
      concat(lit("sess-"), col("o_orderkey")).as("session_id"),
      lit(null).cast("string").as("ip_address"),
      when(col("l_tax") > 0.06, col("l_discount") >= 0.09)
        .otherwise(lit(null).cast("boolean")).as("is_fraudulent"),
      when(col("l_tax") === 0.0, lit(null).cast("double"))
        .otherwise((dec2(col("l_tax")) * 10).cast("double")).as("fraud_score"),
      lit(null).cast("string").as("batch_id"))
  }

  // Measured and rejected: persisting this view once per session
  // (MEMORY_AND_DISK) and sharing it across the 9 analyses made the suite
  // SLOWER at sf0.1 (build 10.6 s + 8×0.2 s vs ~1 s/analysis uncached).
  // Caching materializes all 31 derived columns; left lazy, Catalyst prunes
  // the 6-table join down to each analysis's needed columns — pruned joins
  // beat a full-width cache for single-pass workloads. (BatchService's
  // written snapshot serves the repeated-read case, as the reference does.)

  /** DuckDB CTE producing exactly the rows [[apply]] produces (same column
    * names, same exact values). Oracle queries prepend this. */
  val duckCte: String =
    """WITH tx AS (
       SELECT
         CONCAT(l_orderkey, '-', l_linenumber) AS transaction_id,
         l_shipdate AS event_timestamp,
         CAST(NULL AS TIMESTAMP) AS processing_timestamp,
         CAST(o_custkey AS VARCHAR) AS customer_id,
         o_orderpriority AS customer_tier,
         CAST(l_partkey AS VARCHAR) AS product_id,
         p_name AS product_name,
         p_type AS category,
         CAST(p_size AS VARCHAR) AS sub_category,
         p_brand AS brand,
         CAST(l_quantity AS INT) AS quantity,
         l_extendedprice AS unit_price,
         CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS DOUBLE) AS discount_percent,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) AS total_amount,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_tax AS DECIMAL(18,2)) AS DECIMAL(18,4)) AS tax_amount,
         'USD' AS currency,
         o_orderstatus AS payment_method,
         CASE WHEN l_linenumber % 2 = 0 THEN l_linestatus END AS card_network,
         CASE WHEN l_returnflag = 'N' THEN 'completed'
              WHEN l_returnflag = 'R' THEN 'refunded'
              ELSE 'failed' END AS transaction_status,
         CASE CAST(l_suppkey % 5 AS INT)
              WHEN 0 THEN 'web' WHEN 1 THEN 'mobile_app'
              WHEN 2 THEN 'pos_in_store' WHEN 3 THEN 'marketplace'
              ELSE 'call_center' END AS channel,
         CASE WHEN l_suppkey % 5 = 2 THEN CONCAT('STORE-', l_suppkey % 50) END AS store_id,
         r_name AS region,
         n_name AS city,
         n_name AS state,
         CAST(c_custkey AS VARCHAR) AS postal_code,
         CASE CAST(l_linenumber % 4 AS INT)
              WHEN 0 THEN 'android' WHEN 1 THEN 'ios'
              WHEN 2 THEN 'desktop' ELSE 'tablet' END AS device_type,
         CONCAT('sess-', o_orderkey) AS session_id,
         CAST(NULL AS VARCHAR) AS ip_address,
         CASE WHEN l_tax > 0.06 THEN l_discount >= 0.09 END AS is_fraudulent,
         CASE WHEN l_tax = 0.0 THEN NULL
              ELSE CAST(CAST(l_tax AS DECIMAL(18,2)) * 10 AS DOUBLE) END AS fraud_score,
         CAST(NULL AS VARCHAR) AS batch_id
       FROM lineitem
       JOIN orders   ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation   ON c_nationkey = n_nationkey
       JOIN region   ON n_regionkey = r_regionkey
       JOIN part     ON l_partkey = p_partkey
     )"""
}
