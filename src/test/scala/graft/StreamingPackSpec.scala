package graft

import java.nio.file.Files

import graft.batch.Upsert
import graft.core.TxnLog
import graft.operators.PackWriter
import graft.streaming.StreamingPack

/** The packed-shard table following an append-only docs table
  * continuously: bounded drains, the live heartbeat query, and
  * convergence to a from-scratch pack after every micro-batch. */
class StreamingPackSpec extends SparkSpec {

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toString + "/t"

  private def words(from: Int, n: Int): String =
    (from until from + n).map(i => s"t$i").mkString(" ")

  private var nextId = 0L
  private def appendDocs(t: String, src: String, nDocs: Int, tokens: Int): Unit = {
    import spark.implicits._
    val rows = (1 to nDocs).map { _ =>
      nextId += 1
      (src, nextId, words((nextId * 1000).toInt, tokens))
    }
    Upsert.mergeByKey(spark, t,
      rows.toDF("source", "doc_id", "text"), "source", Seq("doc_id"))
  }

  private def shardRows(t: String) =
    Upsert.readCommitted(spark, t, "source")
      .select("source", "seq_id", "toks", "n_docs", "n_full_docs",
        "n_tokens", "first_doc", "last_doc")

  private def assertFresh(shard: String, docsT: String): Unit = {
    val truth = tmp("spktruth")
    PackWriter.sync(spark, docsT, "source", truth)
    assert(shardRows(shard).exceptAll(shardRows(truth)).isEmpty &&
      shardRows(truth).exceptAll(shardRows(shard)).isEmpty,
      "streamed shards must equal a from-scratch pack")
  }

  test("drained waves converge the shards to a from-scratch pack; idle " +
      "drains are no-ops") {
    val docsT = tmp("spksrc"); val shard = tmp("spkshard")
    appendDocs(docsT, "s1", 2, 150)
    assert(StreamingPack.drainAvailable(spark, docsT, "source", shard) == 1,
      "bootstrap step")
    assertFresh(shard, docsT)
    appendDocs(docsT, "s1", 1, 90)
    appendDocs(docsT, "s2", 2, 40)
    assert(StreamingPack.drainAvailable(spark, docsT, "source", shard) >= 1)
    assertFresh(shard, docsT)
    assert(StreamingPack.drainAvailable(spark, docsT, "source", shard) == 0)
  }

  test("catch-up after long churn runs in bounded steps, each a committed " +
      "shard version") {
    val docsT = tmp("spkbsrc"); val shard = tmp("spkbshard")
    appendDocs(docsT, "s1", 1, 30)
    StreamingPack.drainAvailable(spark, docsT, "source", shard)
    val v0 = TxnLog.currentVersion(spark, docsT)
    (1 to 6).foreach(_ => appendDocs(docsT, "s1", 1, 30))
    val commits = TxnLog.currentVersion(spark, docsT) - v0
    assert(commits >= 6, s"expected >= 6 commits of churn, got $commits")
    val shardV0 = TxnLog.currentVersion(spark, shard)
    val steps = StreamingPack.drainAvailable(
      spark, docsT, "source", shard, maxCommitsPerBatch = 2)
    assert(steps == (commits + 1) / 2,
      s"$commits commits at <=2/step should take ${(commits + 1) / 2} " +
        s"steps, took $steps")
    assert(TxnLog.currentVersion(spark, shard) > shardV0,
      "each step must land as a committed shard version")
    assertFresh(shard, docsT)
  }

  test("maxSteps caps ONE drain call; the cursor lets the next call " +
      "continue — a churning source cannot starve a tick") {
    val docsT = tmp("spkcsrc"); val shard = tmp("spkcshard")
    appendDocs(docsT, "s1", 1, 30)
    StreamingPack.drainAvailable(spark, docsT, "source", shard)
    (1 to 4).foreach(_ => appendDocs(docsT, "s1", 1, 30))
    // 4 commits of churn at 2 commits/step would need 2 steps; cap at 1:
    // the drain RETURNS mid-catch-up instead of chasing the tip
    val s1 = StreamingPack.drainAvailable(
      spark, docsT, "source", shard, maxCommitsPerBatch = 2, maxSteps = 1)
    assert(s1 == 1, s"capped drain must stop after one step: $s1")
    // partial state is safe: the next (uncapped) call finishes the chase
    val s2 = StreamingPack.drainAvailable(
      spark, docsT, "source", shard, maxCommitsPerBatch = 2)
    assert(s2 >= 1, s"the next drain continues from the cursor: $s2")
    assertFresh(shard, docsT)
  }

  test("the live heartbeat query follows the docs table; restart needs no " +
      "stream state") {
    val docsT = tmp("spklsrc"); val shard = tmp("spklshard")
    appendDocs(docsT, "s1", 1, 60)
    val q = StreamingPack.start(spark, docsT, "source", shard,
      intervalMs = 150L)
    try {
      def awaitFresh(): Unit = {
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        var ok = false
        while (!ok && System.nanoTime() < deadline) {
          ok = scala.util.Try { assertFresh(shard, docsT); true }
            .getOrElse(false)
          if (!ok) Thread.sleep(200)
        }
        assertFresh(shard, docsT)
      }
      awaitFresh() // bootstrap through the stream
      appendDocs(docsT, "s1", 2, 70)
      awaitFresh()
      q.stop(); q.awaitTermination(30000)
      // kill the query, churn, maintain BY HAND, restart a fresh query:
      // every path converges — all state is the shard table's own cursor
      appendDocs(docsT, "s2", 1, 25)
      StreamingPack.drainAvailable(spark, docsT, "source", shard)
      assertFresh(shard, docsT)
      val q2 = StreamingPack.start(spark, docsT, "source", shard,
        intervalMs = 150L)
      try {
        appendDocs(docsT, "s1", 1, 45)
        awaitFresh()
      } finally { q2.stop(); q2.awaitTermination(30000) }
    } finally if (q.isActive) { q.stop(); q.awaitTermination(30000) }
  }
}
