package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryModule
import graft.core.{Ora, Tables}

/** Temporal join operators the reference lacks entirely (its operator surface
  * has zero joins — SURVEY.md §2.3) but that any time-series/event engine
  * needs: AS-OF join and interval RANGE join. Both are implemented
  * Spark-first with *scalable* plans, not the naive theta-join Catalyst
  * would otherwise produce.
  *
  * As-of join — "for each event, the most recent purchase at-or-before it,
  * per user" — is expressed as the classic union + ordered-window
  * `last(ignoreNulls)` plan: tag quotes and probes, union them, and run one
  * window partitioned by the join key, ordered by (time, tag). That is a
  * SINGLE shuffle on the key (identical to what a sort-merge join would
  * need) and zero row expansion — versus the O(probe × quote) blowup +
  * re-aggregation of the naive `t_q <= t_p` theta join. Ties are made
  * deterministic by (a) pre-aggregating quotes to one row per (key, ts) and
  * (b) ordering quotes before probes at equal timestamps (inclusive as-of
  * semantics, matching DuckDB `ASOF JOIN ... ON q.ts <= p.ts`).
  *
  * Range join — "lineitems shipped inside a 7-day window after each sampled
  * order date" — uses interval binning: the small (probe) side explodes its
  * interval into daily bins, is broadcast, and the fact side equi-joins on
  * its own day bin, then refines with the exact range predicate. The fact
  * table is scanned once, shuffles nothing, and each fact row meets only the
  * handful of intervals sharing its bin — the standard scale-out plan for
  * interval joins (bin size ≈ interval length). Catalyst alone would plan a
  * broadcast-nested-loop over the raw range predicate: correct, but probing
  * every interval per row; binning makes the probe O(bins-per-row).
  */
object TemporalJoinQueries extends QueryModule {

  import Ora.dec2

  /** As-of join: last purchase (quote) at-or-before each non-purchase event
    * (probe), per user. Nulls where a user has no prior purchase. */
  def asofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    // One quote row per (user, ts): dedup makes equal-ts quotes deterministic.
    val quotes = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts_ts"))
      .agg(max(col("event_id")).as("purchase_id"),
        // value travels WITH the winning row (max_by on the unique id), so
        // the (id, value) pair always comes from one source purchase
        expr("max_by(value, event_id)").as("purchase_value"))
      .select(col("user_id"), col("ts_ts"), lit(0).as("is_probe"),
        lit(null).cast("long").as("event_id"),
        lit(null).cast("string").as("event_type"),
        lit(null).cast("double").as("value"),
        col("purchase_id"), col("purchase_value"),
        col("ts_ts").as("purchase_ts"))
    val probes = ev.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("ts_ts"), lit(1).as("is_probe"),
        col("event_id"), col("event_type"), col("value"),
        lit(null).cast("long").as("purchase_id"),
        lit(null).cast("double").as("purchase_value"),
        lit(null).cast("timestamp").as("purchase_ts"))
    // Quotes sort before probes at equal ts → inclusive (<=) as-of match.
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_ts"), col("is_probe"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    quotes.unionByName(probes)
      .withColumn("last_purchase_id",
        last(col("purchase_id"), ignoreNulls = true).over(w))
      .withColumn("last_purchase_value",
        last(col("purchase_value"), ignoreNulls = true).over(w))
      .withColumn("last_purchase_ts",
        last(col("purchase_ts"), ignoreNulls = true).over(w).cast("string"))
      .filter(col("is_probe") === 1)
      .select(col("event_id"), col("user_id"),
        col("ts_ts").cast("string").as("ts"), col("event_type"), col("value"),
        col("last_purchase_id"), col("last_purchase_value"),
        col("last_purchase_ts"))
  }

  /** Interval range join: for each sampled order (o_orderkey % 997 == 0),
    * aggregate the lineitems — of ANY order — shipped in
    * [o_orderdate, o_orderdate + 7 days). Day-binned broadcast equi-join +
    * exact-range refine; no theta join, no fact shuffle. */
  def rangeJoin(s: SparkSession, d: String): DataFrame = {
    val intervals = Tables.orders(s, d)
      .filter(col("o_orderkey") % 997 === 0)
      .select(col("o_orderkey"), col("o_orderdate"))
    // 0..7 days: the +7th bin covers a lower bound with a time-of-day
    // component (date(lo)+7 can still satisfy t < lo+7d); the exact refine
    // below discards any false positives.
    val binned = intervals.withColumn("ship_day",
      explode(sequence(to_date(col("o_orderdate")),
        date_add(to_date(col("o_orderdate")), 7))))
    Tables.lineitem(s, d)
      .withColumn("ship_day", to_date(col("l_shipdate")))
      .join(broadcast(binned), "ship_day")
      .filter(col("l_shipdate") >= col("o_orderdate") &&
        col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 7 DAYS"))
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("n_items"),
        sum(dec2(col("l_quantity"))).cast("double").as("qty_sum"),
        countDistinct(col("l_suppkey")).as("n_suppliers"))
  }

  /** The same interval join written the NATURAL way — a raw range theta
    * join, no manual binning. Under a session with
    * [[graft.functions.GraftExtensions]] (Verify/Bench/production), the
    * [[graft.plans.IntervalBinJoinRule]] optimizer rule rewrites it to the
    * binned equi-join automatically; without the extension it still runs
    * (broadcast-nested-loop) and returns identical rows. 30-day window to
    * exercise multi-day binning. */
  def rangeJoinAuto(s: SparkSession, d: String): DataFrame = {
    val intervals = Tables.orders(s, d)
      .filter(col("o_orderkey") % 499 === 0)
      .select(col("o_orderkey"), col("o_orderdate"))
    Tables.lineitem(s, d)
      .join(intervals,
        col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("n_items"),
        sum(dec2(col("l_quantity"))).cast("double").as("qty_sum"))
  }

  val queries: Map[String, Q] = Map(
    "rel_asof_join" -> (asofJoin _),
    "rel_range_join" -> (rangeJoin _),
    "rel_range_join_auto" -> (rangeJoinAuto _),
  )

  val oracleSql: Map[String, String] = Map(
    "rel_asof_join" ->
      """WITH quotes AS (
           SELECT user_id, ts, MAX(event_id) AS purchase_id,
                  ARG_MAX(value, event_id) AS purchase_value
           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
         probes AS (
           SELECT event_id, user_id, ts, event_type, value
           FROM events WHERE event_type <> 'purchase')
         SELECT p.event_id, p.user_id, CAST(p.ts AS VARCHAR) AS ts,
           p.event_type, p.value,
           q.purchase_id AS last_purchase_id,
           q.purchase_value AS last_purchase_value,
           CAST(q.ts AS VARCHAR) AS last_purchase_ts
         FROM probes p ASOF LEFT JOIN quotes q
           ON p.user_id = q.user_id AND q.ts <= p.ts""",
    "rel_range_join" ->
      """SELECT o.o_orderkey, COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_sum,
           COUNT(DISTINCT l.l_suppkey) AS n_suppliers
         FROM orders o JOIN lineitem l
           ON l.l_shipdate >= o.o_orderdate
          AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY
         WHERE o.o_orderkey % 997 = 0
         GROUP BY 1""",
    "rel_range_join_auto" ->
      """SELECT o.o_orderkey, COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_sum
         FROM orders o JOIN lineitem l
           ON l.l_shipdate >= o.o_orderdate
          AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
         WHERE o.o_orderkey % 499 = 0
         GROUP BY 1""",
  )
}
