package graft

/** Mirror of the external driver's smoke checks: the flagship entry query
  * returns rows, and every declared oracle key has a query implementation
  * (the reverse is enforced at SparkEntry init). */
class EntrySpec extends SparkSpec {

  test("entry flagship query returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query is declared exactly once and oracle keys all resolve") {
    assert(SparkEntry.queries.nonEmpty)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    // since round 5 every query (media included) is oracle-checked:
    // a new query without an oracleSql entry is a coverage regression
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"queries without an oracle: $rowsOnly")
  }
}
