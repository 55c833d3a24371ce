package graft

import graft.operators.SqlQueries

/** Temp-view registration behind the spark.sql surface: views are
  * session-global, so switching data dirs within one session must re-point
  * them (regression: a (session, dir)-keyed memo served dir A's queries
  * from dir B's views after an A → B → A sequence). */
class SqlQueriesSpec extends SparkSpec {

  private val a = "/root/testdata/sf0.001"
  private val b = "/root/testdata/sf0.01"

  test("dir switch re-registers views: A -> B -> A returns A's data") {
    val q = SqlQueries.queries("sql_returned_items")
    val nA = q(spark, a).count()
    val nB = q(spark, b).count()
    assert(nA != nB, "fixture dirs must differ for this test to mean anything")
    assert(q(spark, a).count() == nA,
      "returning to dir A must serve A's data, not stale B views")
  }
}
