package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Oracle-safe numeric discipline.
  *
  * The correctness gate hash-compares Spark results against DuckDB running
  * equivalent SQL. Floating-point SUM/AVG over doubles is order-dependent —
  * two engines (or two runs) produce last-ulp-different doubles, which breaks
  * hash equality. All money/quantity doubles in the corpus are exact
  * 2-decimal values (verified empirically), so casting to DECIMAL before
  * aggregating makes every sum EXACT and order-independent in both engines.
  *
  * Rules used by every oracle-checked query:
  *   - sums of doubles     → `sum(dec2(c))` here, `SUM(CAST(c AS DECIMAL(18,2)))` in SQL
  *   - averages            → exact-decimal sum cast to double, divided by count:
  *                           both engines perform the identical IEEE-754 division
  *                           on identical operands → bit-identical doubles
  *   - ratios/percentages  → double division of exact operands only
  *   - NO `round()` on computed doubles (Spark HALF_UP vs DuckDB HALF_EVEN)
  *
  * This is also the right call at 100 TB: decimal partial aggregates are
  * deterministic under any degree of parallelism / AQE re-planning, so results
  * are stable run-to-run on a 1000-executor cluster.
  */
object Ora {
  /** Exact 2-dp decimal view of a money-like double column. */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Narrow 2-dp decimal for small-domain columns (discount/tax in [0,1)). */
  def frac2(c: Column): Column = c.cast(DecimalType(3, 2))

  /** Deterministic average: exact decimal sum / count, as double. */
  def avgExact(c: Column): Column =
    sum(dec2(c)).cast("double") / count(c).cast("double")

  /** Deterministic double ratio of two exact (int/decimal) columns. */
  def ratio(num: Column, den: Column): Column =
    num.cast("double") / den.cast("double")
}
