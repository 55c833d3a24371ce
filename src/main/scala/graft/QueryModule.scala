package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of oracle-checked queries. Each module contributes to
  * `SparkEntry.queries` / `SparkEntry.oracleSql`; queries without an oracle
  * entry get the driver's weaker rows-only check (reserved for semantics DuckDB
  * SQL cannot express, e.g. hash-seeded LSH).
  */
trait QueryModule {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracleSql: Map[String, String]
}
