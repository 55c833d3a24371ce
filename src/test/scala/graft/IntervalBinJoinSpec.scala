package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.GraftExtensions

/** The [[graft.plans.IntervalBinJoinRule]] optimizer extension: a naive
  * range theta join must (a) lose its nested-loop physical join under a
  * GraftExtensions session and (b) return exactly the rows the unoptimized
  * plan returns. */
class IntervalBinJoinSpec extends SparkSpec {

  /** A session with the extensions installed, sharing the test
    * SparkContext. getOrCreate would return the shared session, so the
    * default/active slots are cleared first and restored after. */
  private def withExtSession[A](f: SparkSession => A): A = {
    val orig = SparkSpec.session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      f(s)
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }

  private val dir = "/root/testdata/sf0.001"

  private def naiveJoin(s: SparkSession) = {
    val iv = s.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderkey") % 499 === 0)
      .select(col("o_orderkey"), col("o_orderdate"))
    s.read.parquet(s"$dir/lineitem.parquet")
      .join(iv,
        col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .select("o_orderkey", "l_orderkey", "l_linenumber", "l_shipdate")
  }

  test("rule rewrites the theta join to an equi-join with identical results") {
    val baseline = naiveJoin(spark).collect().map(_.toString).sorted
    assert(baseline.nonEmpty, "fixture must produce matches")
    // without extensions: nested-loop join is all Catalyst can do
    assert(naiveJoin(spark).queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))

    withExtSession { s =>
      val df = naiveJoin(s)
      val physical = df.queryExecution.executedPlan.toString
      assert(!physical.contains("BroadcastNestedLoopJoin") &&
        !physical.contains("CartesianProduct"),
        s"rule must eliminate the nested loop:\n$physical")
      assert(df.collect().map(_.toString).sorted.sameElements(baseline),
        "rewritten plan must return identical rows")
    }
  }

  test("rule leaves equi-joins and non-matching conditions alone") {
    withExtSession { s =>
      val o = s.read.parquet(s"$dir/orders.parquet")
      val l = s.read.parquet(s"$dir/lineitem.parquet")
      val equi = l.join(o, col("l_orderkey") === col("o_orderkey"))
      assert(!equi.queryExecution.optimizedPlan.toString.contains("graft_bin"))
      // open-ended range (no upper interval bound): not our pattern
      val open = l.join(o, col("l_shipdate") >= col("o_orderdate"))
      assert(!open.queryExecution.optimizedPlan.toString.contains("graft_bin"))
      assert(open.count() > 0)
    }
  }

  test("size guard: broadcastable probe vs much larger interval side declines") {
    withExtSession { s =>
      // probe = 5 timestamp rows (easily broadcastable), intervals = full
      // lineitem-sized side: exploding the big side by nDays+1 would replace
      // a cheap broadcast-nested-loop, so the rule must leave the join alone.
      val probe = s.sql(
        """SELECT explode(sequence(TIMESTAMP'1996-01-01 00:00:00',
                                   TIMESTAMP'1996-01-05 00:00:00',
                                   INTERVAL 1 DAY)) AS t""")
      val iv = s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_shipdate").as("lo"))
      val j = probe.join(iv,
        col("t") >= col("lo") && col("t") < col("lo") + expr("INTERVAL 30 DAYS"))
      assert(!j.queryExecution.optimizedPlan.toString.contains("graft_bin"),
        "rule must decline when the probe side is broadcastable and the " +
          "interval side is vastly larger")
      // sanity: the flipped shape (big probe, small intervals) still rewrites
      val smallIv = s.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderkey") % 499 === 0)
        .select(col("o_orderkey"), col("o_orderdate"))
      val big = s.read.parquet(s"$dir/lineitem.parquet")
      val k = big.join(smallIv,
        col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      assert(k.queryExecution.optimizedPlan.toString.contains("graft_bin"))
    }
  }

  test("extension session also serves graft_dot via SQL") {
    withExtSession { s =>
      val r = s.sql("SELECT graft_dot(array(1L,2L,3L), array(4L,5L,6L)) AS d")
        .head().getLong(0)
      assert(r == 32L)
    }
  }
}
