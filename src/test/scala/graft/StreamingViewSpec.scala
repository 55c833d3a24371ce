package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.batch.{IncrementalView, Upsert}
import graft.core.TxnLog
import graft.streaming.StreamingView

/** Streaming maintenance of incremental materialized views: waves
  * streamed into the source converge the view to the from-scratch rebuild
  * after every bounded micro-batch; catch-up runs in absorbable commit
  * steps, each a committed view version; a crash mid-stream replays
  * without double-applying; and the live heartbeat query follows the
  * source with no checkpoint of its own (the view cursor IS the state). */
class StreamingViewSpec extends SparkSpec {

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toString + "/t"

  private def rows(kvs: (String, String, Long, Long)*): DataFrame = {
    import spark.implicits._
    kvs.toDF("day", "cat", "k", "qty")
  }

  private def assertFresh(view: String, src: String): Unit = {
    val cols = Seq("day", "cat", "n_rows", "sum_qty", "nn_qty")
    val got = Upsert.readCommitted(spark, view, "day").select(cols.map(col): _*)
    val want = IncrementalView.aggregateOf(
      Upsert.readCommitted(spark, src, "day"), Seq("day", "cat"), Seq("qty"))
      .select(cols.map(col): _*)
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      s"view != rebuild:\nview: ${got.orderBy("day", "cat").collect().toSeq}\n" +
        s"def:  ${want.orderBy("day", "cat").collect().toSeq}")
  }

  private def register(view: String, src: String): Unit =
    IncrementalView.register(spark, view, src, "day",
      Seq("day", "cat"), Seq("qty"), "day")

  test("streamed waves converge the view to the rebuild after every micro-batch") {
    val src = tmp("svsrc")
    val view = tmp("svview")
    Upsert.mergeByKey(spark, src,
      rows(("d1", "a", 1L, 2L), ("d1", "b", 2L, 3L)), "day", Seq("k"))
    register(view, src)
    assert(StreamingView.drainAvailable(spark, view) == 1, "bootstrap step")
    assertFresh(view, src)
    // wave 1: insert + update; wave 2: full-group delete + new group
    Upsert.mergeByKey(spark, src,
      rows(("d1", "a", 3L, 5L), ("d1", "b", 2L, 7L)), "day", Seq("k"))
    assert(StreamingView.drainAvailable(spark, view) >= 1)
    assertFresh(view, src)
    Upsert.deleteByKey(spark, src,
      rows(("d1", "b", 2L, 0L)).select("day", "k"), "day", Seq("k"))
    Upsert.mergeByKey(spark, src,
      rows(("d2", "c", 4L, 9L)), "day", Seq("k"))
    assert(StreamingView.drainAvailable(spark, view) >= 1)
    assertFresh(view, src)
    // caught up: the next drain is an idle tick
    assert(StreamingView.drainAvailable(spark, view) == 0)
  }

  test("catch-up after long churn runs in bounded steps, each a committed view version") {
    val src = tmp("svboundsrc")
    val view = tmp("svboundview")
    Upsert.mergeByKey(spark, src, rows(("d1", "a", 1L, 1L)), "day", Seq("k"))
    register(view, src)
    StreamingView.drainAvailable(spark, view) // bootstrap at current tip
    val v0 = TxnLog.currentVersion(spark, src)
    // six waves land while the maintainer is down
    (1 to 6).foreach { i =>
      Upsert.mergeByKey(spark, src,
        rows(("d1", "a", 100L + i, i.toLong)), "day", Seq("k"))
    }
    val commits = TxnLog.currentVersion(spark, src) - v0
    assert(commits >= 6, s"expected >= 6 commits of churn, got $commits")
    // bounded restart: each step consumes at most 2 source commits and
    // leaves a complete, committed view version behind
    val viewV0 = TxnLog.currentVersion(spark, view)
    val steps = StreamingView.drainAvailable(spark, view, maxCommitsPerBatch = 2)
    assert(steps == (commits + 1) / 2,
      s"$commits commits at <=2/step should take ${(commits + 1) / 2} steps, took $steps")
    assert(TxnLog.currentVersion(spark, view) > viewV0)
    assertFresh(view, src)
  }

  test("a crash between merge and cursor write replays exactly-once under the stream") {
    val src = tmp("svcrashsrc")
    val view = tmp("svcrashview")
    Upsert.mergeByKey(spark, src,
      rows(("d1", "a", 1L, 2L), ("d2", "b", 2L, 3L)), "day", Seq("k"))
    register(view, src)
    StreamingView.drainAvailable(spark, view)
    val srcV1 = TxnLog.currentVersion(spark, src)
    val basis = TxnLog.currentVersion(spark, view)
    Upsert.mergeByKey(spark, src,
      rows(("d1", "a", 1L, 10L), ("d2", "c", 3L, 4L)), "day", Seq("k"))
    val srcV2 = TxnLog.currentVersion(spark, src)
    StreamingView.drainAvailable(spark, view) // the "crashed" batch applied…
    // …but its cursor never advanced: restore the in-flight record
    graft.batch.IncrementalViewTestHook.simulateCrashAfterMerge(
      spark, view, src, srcV1, srcV2, basis)
    // more churn lands before the stream restarts
    Upsert.mergeByKey(spark, src, rows(("d2", "b", 2L, 30L)), "day", Seq("k"))
    assert(StreamingView.drainAvailable(spark, view) >= 1)
    assertFresh(view, src)
    assert(StreamingView.drainAvailable(spark, view) == 0)
  }

  test("MIN/MAX views stream too: extremum-loss deletes recompute under " +
      "the same drain loop, view ≡ rebuild after every wave") {
    val src = tmp("svmmsrc")
    val view = tmp("svmmview")
    Upsert.mergeByKey(spark, src,
      rows(("d1", "a", 1L, 5L), ("d1", "a", 2L, 9L), ("d1", "b", 3L, 4L)),
      "day", Seq("k"))
    IncrementalView.register(spark, view, src, "day",
      Seq("day", "cat"), Seq("qty"), "day",
      minCols = Seq("qty"), maxCols = Seq("qty"))
    def fresh(): Unit = {
      val cols = Seq("day", "cat", "n_rows", "min_qty", "max_qty")
      val got = Upsert.readCommitted(spark, view, "day").select(cols.map(col): _*)
      val want = IncrementalView.aggregateOf(
        Upsert.readCommitted(spark, src, "day"),
        Seq("day", "cat"), Seq("qty"), Seq("qty"), Seq("qty"))
        .select(cols.map(col): _*)
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"view != rebuild:\n${got.collect().toSeq}\n${want.collect().toSeq}")
    }
    assert(StreamingView.drainAvailable(spark, view) == 1)
    fresh()
    // wave 1: delete the current MAX of (d1, a) — the extremum-loss path
    Upsert.deleteByKey(spark, src,
      rows(("d1", "a", 2L, 0L)).select("day", "k"), "day", Seq("k"))
    assert(StreamingView.drainAvailable(spark, view) >= 1)
    fresh()
    // wave 2: inserts only — the least/greatest fast path
    Upsert.mergeByKey(spark, src,
      rows(("d1", "a", 4L, 1L), ("d1", "b", 5L, 99L)), "day", Seq("k"))
    assert(StreamingView.drainAvailable(spark, view) >= 1)
    fresh()
  }

  test("the live heartbeat query follows the source; restart needs no stream state") {
    val src = tmp("svlivesrc")
    val view = tmp("svliveview")
    Upsert.mergeByKey(spark, src, rows(("d1", "a", 1L, 2L)), "day", Seq("k"))
    register(view, src)
    val q = StreamingView.start(spark, view, intervalMs = 150L)
    try {
      def awaitFresh(): Unit = {
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        var ok = false
        while (!ok && System.nanoTime() < deadline) {
          ok = scala.util.Try {
            assertFresh(view, src); true
          }.getOrElse(false)
          if (!ok) Thread.sleep(200)
        }
        assertFresh(view, src)
      }
      awaitFresh() // bootstrap through the stream
      Upsert.mergeByKey(spark, src,
        rows(("d1", "a", 2L, 5L), ("d2", "b", 3L, 7L)), "day", Seq("k"))
      awaitFresh()
      q.stop(); q.awaitTermination(30000)
      // kill the query, churn, maintain BY HAND, restart a fresh query:
      // every path converges — all state is the view's own cursor
      Upsert.deleteByKey(spark, src,
        rows(("d2", "b", 3L, 0L)).select("day", "k"), "day", Seq("k"))
      StreamingView.drainAvailable(spark, view)
      assertFresh(view, src)
      val q2 = StreamingView.start(spark, view, intervalMs = 150L)
      try {
        Upsert.mergeByKey(spark, src, rows(("d3", "c", 9L, 1L)), "day", Seq("k"))
        awaitFresh()
      } finally { q2.stop(); q2.awaitTermination(30000) }
    } finally if (q.isActive) { q.stop(); q.awaitTermination(30000) }
  }
}
