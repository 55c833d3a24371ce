package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.batch.{ColumnMapping, Constraints, Upsert}

/** Deep CLONE: an independent copy of a committed (optionally historic)
  * snapshot that materializes deletion vectors, carries the _graft_meta
  * registries (column map, constraints), and shares no future with the
  * source. */
class CloneSpec extends SparkSpec {

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  test("clone at a version = readAsOf, independent, registries carried") {
    import spark.implicits._
    val src = tmp("clone-src") + "/t"
    Upsert.mergeByKey(spark, src,
      (1 to 100).map(i => (s"2026-07-0${i % 2 + 1}", i.toLong, i * 1.0))
        .toDF("day", "k", "v"),
      "day", Seq("k"))
    ColumnMapping.rename(spark, src, "v", "speed")
    // stored expressions may only reference UNMAPPED columns (they must
    // read identically in logical and physical space) — both the renamed
    // column's names are refused, the unmapped key is fine
    intercept[IllegalArgumentException] {
      Constraints.add(spark, src, "v_pos", "v > 0")
    }
    intercept[IllegalArgumentException] {
      Constraints.add(spark, src, "v_pos", "speed > 0")
    }
    Constraints.add(spark, src, "k_small", "k < 400")
    val vThen = graft.core.TxnLog.currentVersion(spark, src)
    // post-version churn the clone must NOT see
    Upsert.mergeByKey(spark, src,
      Seq(("2026-07-01", 1L, 999.0)).toDF("day", "k", "speed"),
      "day", Seq("k"))

    val dst = tmp("clone-dst") + "/t"
    val rows = Upsert.cloneTo(spark, src, dst, "day", Some(vThen))
    assert(rows == 100L)
    def state(t: String) = Upsert.readCommitted(spark, t, "day")
      .select("day", "k", "speed").as[(String, Long, Double)].collect().toSet
    val asOf = Upsert.readAsOf(spark, src, vThen, "day")
      .select("day", "k", "speed").as[(String, Long, Double)].collect().toSet
    assert(state(dst) == asOf, "clone must equal the as-of snapshot")
    // column map carried: logical name visible, physical files keep v
    assert(spark.read.parquet(dst).columns.contains("v"))
    assert(!state(dst).isEmpty)
    // constraints carried: a violating merge into the CLONE is refused
    val e = intercept[IllegalArgumentException] {
      Upsert.mergeByKey(spark, dst,
        Seq(("2026-07-01", 500L, 1.0)).toDF("day", "k", "speed"),
        "day", Seq("k"))
    }
    assert(e.getMessage.contains("k_small"), e.getMessage)
    // independence: merging into the clone leaves the source untouched,
    // and vice versa
    val srcBefore = state(src)
    Upsert.mergeByKey(spark, dst,
      Seq(("2026-07-01", 201L, 5.0)).toDF("day", "k", "speed"),
      "day", Seq("k"))
    assert(state(src) == srcBefore)
    Upsert.mergeByKey(spark, src,
      Seq(("2026-07-02", 301L, 6.0)).toDF("day", "k", "speed"),
      "day", Seq("k"))
    assert(!state(dst).exists(_._2 == 301L))
    // provenance recorded outside the manifest (the clone's log is its own)
    assert(new java.io.File(s"$dst/_graft_meta/clone-v1.json").isFile)
  }

  /** Sum of Spark input bytesRead across all jobs run by `body`, polled
    * until the listener bus drains (value stable for 500 ms). */
  private def bytesReadDuring(body: => Unit): Long = {
    val acc = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          acc.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      var last = -1L
      while (System.nanoTime() < deadline && acc.get() != last) {
        last = acc.get()
        Thread.sleep(500)
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    acc.get()
  }

  test("clone is ONE data pass: the row count rides the write via observe()") {
    import spark.implicits._
    val src = tmp("clone-1pass-src") + "/t"
    Upsert.mergeByKey(spark, src,
      (1 to 60000).map(i => (s"2026-07-0${i % 4 + 1}", i.toLong))
        .toDF("day", "k").withColumn("payload", md5(col("k").cast("string"))),
      "day", Seq("k"))
    val baseline = bytesReadDuring {
      Upsert.readCommitted(spark, src, "day").rdd.foreach(_ => ())
    }
    val dst = tmp("clone-1pass-dst") + "/t"
    var rows = 0L
    val cloneBytes = bytesReadDuring {
      rows = Upsert.cloneTo(spark, src, dst, "day")
    }
    assert(rows == 60000L)
    info(s"one-scan bytes $baseline, clone bytes $cloneBytes")
    // the old implementation re-read the freshly-written clone for its
    // return count — a second full pass, ~2× baseline
    assert(cloneBytes < (baseline * 1.6).toLong,
      s"clone must read the source once: $cloneBytes vs one-scan $baseline")
  }

  test("a clone racing source writers copies exactly its pinned version") {
    import spark.implicits._
    val src = tmp("clone-race") + "/t"
    Upsert.mergeByKey(spark, src,
      (1 to 60).map(i => (s"2026-07-0${i % 3 + 1}", i.toLong, i * 1.0))
        .toDF("day", "k", "v"),
      "day", Seq("k"))
    // churn the source WHILE the clone reads: the clone pinned the tip
    // before reading, so later rewrites resolve through retained history
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val churnErr = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val churn = new Thread(() => {
      try {
        var i = 0
        while (!stop.get && i < 30) {
          Upsert.mergeByKey(spark, src,
            Seq((s"2026-07-0${i % 3 + 1}", (i % 60 + 1).toLong, 1000.0 + i))
              .toDF("day", "k", "v"),
            "day", Seq("k"))
          i += 1
        }
      } catch { case t: Throwable => churnErr.set(t) }
    }, "clone-churn")
    churn.start()
    // losing a race with a source writer's install is cloneTo's
    // DOCUMENTED loud-retryable failure (no dst is left behind) — a real
    // consumer retries, so the spec does too, against a fresh dst each
    // attempt; the CLONE runs inside the churn window (that is the test),
    // the verification below runs after it quiesces (readAsOf against a
    // live writer has the same documented loud-retry contract, which is
    // TimeTravelSpec's subject, not this test's)
    var dst: String = null
    try {
      var attempts = 0
      var done = false
      while (!done) {
        dst = tmp("clone-race-dst") + "/t"
        attempts += 1
        try { assert(Upsert.cloneTo(spark, src, dst, "day") == 60L); done = true }
        catch {
          case e: Throwable
              if Option(e.getMessage).exists(_.contains("FILE_NOT_EXIST")) &&
                attempts < 10 => // loud, retryable, retried
        }
      }
    } finally {
      stop.set(true); churn.join()
    }
    if (churnErr.get != null) throw churnErr.get
    // provenance names the pinned version; the clone equals EXACTLY that
    val prov = graft.http.Json.parse(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dst/_graft_meta/clone-v1.json"))).asObj
    val pinned = prov("sourceVersion").str.toLong
    val asOf = Upsert.readAsOf(spark, src, pinned, "day")
      .select("day", "k", "v").as[(String, Long, Double)].collect().toSet
    val cloned = spark.read.parquet(dst)
      .select("day", "k", "v").as[(String, Long, Double)].collect().toSet
    assert(cloned == asOf,
      s"clone must equal its pinned version v$pinned exactly")
  }

  test("clone materializes pending deletion vectors; refuses existing dst") {
    import spark.implicits._
    val src = tmp("clone-dv") + "/t"
    Upsert.mergeByKey(spark, src,
      (1 to 40).map(i => (s"2026-07-0${i % 2 + 1}", i.toLong, i * 1.0))
        .toDF("day", "k", "v"),
      "day", Seq("k"))
    graft.batch.DeletionVectors.deleteVectored(spark, src,
      Seq(("2026-07-01", 2L), ("2026-07-02", 3L)).toDF("day", "k"),
      "day", Seq("k"))
    val dst = tmp("clone-dv-dst") + "/t"
    assert(Upsert.cloneTo(spark, src, dst, "day") == 38L)
    // the clone has NO dv sidecars — deletes are materialized in its files
    assert(!new java.io.File(s"$dst/_graft_dv").exists())
    assert(spark.read.parquet(dst).filter(col("k").isin(2L, 3L)).count() == 0L)
    intercept[IllegalArgumentException] {
      Upsert.cloneTo(spark, src, dst, "day")
    }
    // the Maintain mode wires the same entry
    val m = graft.core.GraftConfig.Maintenance(
      128L * 1024 * 1024, 0L, 10, 2, 86400000L, Seq.empty, "zorder")
    val dst2 = tmp("clone-dv-dst2") + "/t"
    val ops = graft.Maintain.runMode(spark, src, "clone", Seq("day", dst2), m)
    assert(ops.exists(o => o.contains("\"op\":\"clone\"") &&
      o.contains("\"rows\":38")), ops.mkString("\n"))
  }
}
