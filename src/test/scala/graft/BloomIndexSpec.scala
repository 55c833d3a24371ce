package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.BloomIndex

/** The per-file Bloom sidecar: point lookups on a non-layout column skip
  * most files, never lose rows, and degrade conservatively (new files are
  * scanned, absent keys may cost a false-positive file but return empty). */
class BloomIndexSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** 16 files, each holding a DISJOINT slice of user ids — the
    * needle-in-haystack shape (a given id lives in exactly one file). */
  private def buildTable(): (String, Long) = {
    val n = 40000L
    val table = tmp("bloom-table")
    spark.range(n)
      .withColumn("user_id", concat(lit("u"), col("id").cast("string")))
      .withColumn("payload", md5(col("id").cast("string")))
      .repartitionByRange(16, col("id")) // 16 disjoint, non-empty slices
      .write.mode("overwrite").parquet(table)
    (table, n)
  }

  test("point lookup scans a small candidate set and finds exactly the row") {
    val (table, n) = buildTable()
    val files = BloomIndex.build(spark, table, "user_id",
      fpp = 0.01)
    assert(files >= 12L, s"expected many data files, got $files")
    val (result, candidates, skipped) =
      BloomIndex.lookup(spark, table, "user_id", "u31337")
    assert(result.count() == 1L)
    assert(result.select("id").head.getLong(0) == 31337L)
    info(s"candidates ${candidates.size}, skipped ${skipped.size} of ${files}")
    // the key lives in one file; 1% fpp over ~16 filters admits at most a
    // couple of false positives — the lookup must skip >= 2/3 of the table
    assert(candidates.size + skipped.size == files)
    assert(skipped.size.toDouble / files >= 2.0 / 3.0,
      s"bloom lookup must skip most files: ${skipped.size} of $files")
    // and the pruned result equals the full-scan filter
    val full = spark.read.parquet(table).filter(col("user_id") === "u31337")
    assert(result.collect().toSet == full.collect().toSet)
    // an absent key returns empty (false positives may scan a file or two,
    // but membership over-approximates — it never invents rows)
    val (miss, _, _) = BloomIndex.lookup(spark, table, "user_id", "no-such-user")
    assert(miss.count() == 0L)
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

  test("lookup on a Hive-partitioned table keeps partition columns " +
      "and matches the full scan") {
    val table = tmp("bloom-part")
    // 4 event_date partitions × 4 files each: the engine's primary table
    // shape (date-partitioned fact table)
    spark.range(40000)
      .withColumn("event_date",
        date_add(lit("2024-01-01").cast("date"), (col("id") % 4).cast("int")))
      .withColumn("user_id", concat(lit("u"), col("id").cast("string")))
      .withColumn("payload", md5(col("id").cast("string")))
      .repartitionByRange(16, col("event_date"), col("id"))
      .write.partitionBy("event_date").mode("overwrite").parquet(table)
    val files = BloomIndex.build(spark, table, "user_id")
    assert(files >= 12L, s"expected many data files, got $files")
    val (result, candidates, skipped) =
      BloomIndex.lookup(spark, table, "user_id", "u31337")
    val full = spark.read.parquet(table).filter(col("user_id") === "u31337")
    // schema parity: the partition column must survive the file-list read
    assert(result.columns.sorted.sameElements(full.columns.sorted),
      s"lookup schema ${result.columns.mkString(",")} != " +
        s"full-scan schema ${full.columns.mkString(",")}")
    assert(result.columns.contains("event_date"),
      "partition column lost by candidate-file read")
    // row parity, including the partition column's VALUE
    val cols = full.columns.sorted.map(col).toSeq
    assert(result.select(cols: _*).collect().toSet ==
      full.select(cols: _*).collect().toSet)
    assert(result.count() == 1L)
    assert(candidates.size + skipped.size == files)
    assert(skipped.size.toDouble / files >= 2.0 / 3.0,
      s"bloom lookup must skip most files: ${skipped.size} of $files")
  }

  test("build reads the data once (footer-sized filters, no counting pre-scan)") {
    val (table, _) = buildTable()
    // baseline: exactly one scan of the two columns the fold pass reads
    val baseline = bytesReadDuring {
      spark.read.parquet(table)
        .select(input_file_name().as("_f"), col("user_id").cast("string"))
        .filter(col("user_id").isNotNull)
        .rdd.foreach(_ => ())
    }
    val built = bytesReadDuring {
      BloomIndex.build(spark, table, "user_id")
    }
    info(s"baseline one-scan bytes $baseline, build bytes $built")
    // the old implementation pre-counted with groupBy(file) — a second full
    // scan, ~2× baseline. Footer reads are KB-scale and untracked by input
    // metrics; 1.5× leaves headroom for sidecar-write re-reads.
    assert(built < (baseline * 1.5).toLong,
      s"build must be one data pass: $built vs one-scan $baseline")
    // and the sized filters still prune: disjoint needle skips >= 2/3
    val (_, c, s) = BloomIndex.lookup(spark, table, "user_id", "u31337")
    assert(s.size.toDouble / (c.size + s.size) >= 2.0 / 3.0)
  }

  test("refresh reads only files the sidecar has never seen") {
    val (table, _) = buildTable()
    BloomIndex.build(spark, table, "user_id")
    // one full-scan's worth of bytes, for scale
    val fullScan = bytesReadDuring {
      spark.read.parquet(table).select("user_id").rdd.foreach(_ => ())
    }
    // a late-arriving file the index has never seen
    spark.range(1).select(
        lit(999999L).as("id"), lit("u-late").as("user_id"),
        md5(lit("x")).as("payload"))
      .coalesce(1).write.mode("append").parquet(table)
    var st: BloomIndex.RefreshStats = null
    val refreshBytes = bytesReadDuring {
      st = BloomIndex.refresh(spark, table, "user_id")
    }
    assert(st.filesIndexed == 1L, s"one new file, got $st")
    assert(st.entriesDropped == 0L)
    info(s"full scan $fullScan bytes, refresh $refreshBytes bytes")
    // refresh read the 1-row new file + the KB sidecar — nothing close to
    // a table scan (the old build-from-scratch path would pay fullScan)
    assert(refreshBytes < fullScan / 4,
      s"refresh must not rescan the table: $refreshBytes vs $fullScan")
    // pruning is restored without a rebuild
    val (r, c, s) = BloomIndex.lookup(spark, table, "user_id", "u-late")
    assert(r.count() == 1L)
    assert(c.size + s.size == st.filesTotal)
    assert(s.size.toDouble / st.filesTotal >= 2.0 / 3.0)
    // an up-to-date sidecar makes refresh a metadata-only no-op
    val st2 = BloomIndex.refresh(spark, table, "user_id")
    assert(st2 == BloomIndex.RefreshStats(0L, 0L, st.filesTotal))
  }

  test("mergeByKey keeps the sidecar fresh: post-merge lookup prunes " +
      "with no Maintain run") {
    import spark.implicits._
    val table = tmp("bloom-merge")
    // a partitioned UPSERT table: 4 day partitions × ~4 files, user ids
    // disjoint across partitions (id % 4 fixes the day)
    spark.range(40000)
      .withColumn("day", concat(lit("2026-01-0"),
        ((col("id") % 4) + 1).cast("string")))
      .withColumn("user_id", concat(lit("u"), col("id").cast("string")))
      .withColumn("v", col("id").cast("double"))
      .repartitionByRange(16, col("day"), col("id"))
      .select("day", "user_id", "v") // merge updates must cover data cols
      .write.partitionBy("day").mode("overwrite").parquet(table)
    BloomIndex.build(spark, table, "user_id")

    // a merge rewrites day=2026-01-02 (all-new file names); the write path
    // must refresh the sidecar inline
    graft.batch.Upsert.mergeByKey(spark, table,
      Seq(("2026-01-02", "u5", 999.5), ("2026-01-02", "u-fresh", 1.0))
        .toDF("day", "user_id", "v"),
      "day", Seq("user_id"))

    // the merged row is found through the index, value updated
    val (upd, cU, sU) = BloomIndex.lookup(spark, table, "user_id", "u5")
    assert(upd.select("v").head.getDouble(0) == 999.5)
    assert(upd.count() == 1L)
    val total = cU.size + sU.size
    assert(sU.size.toDouble / total >= 2.0 / 3.0,
      s"post-merge lookup must still prune: skipped ${sU.size} of $total")
    // an absent key admits at most false positives — a STALE sidecar would
    // have to scan every rewritten file as unknown instead
    val (miss, cM, _) = BloomIndex.lookup(spark, table, "user_id", "no-such")
    assert(miss.count() == 0L)
    assert(cM.size <= 2, s"stale sidecar? absent key scans ${cM.size} files")
    // row parity with the committed read (untouched partitions included)
    val full = graft.batch.Upsert.readCommitted(spark, table, "day")
      .filter(col("user_id") === "u4")
    val (r4, _, _) = BloomIndex.lookup(spark, table, "user_id", "u4")
    assert(r4.select("day", "user_id", "v").collect().toSet ==
      full.select("day", "user_id", "v").collect().toSet)
  }

  /** Sum of task-result bytes shipped to the driver by the jobs `body`
    * runs, polled until the listener bus drains. */
  private def resultBytesDuring(body: => Unit): Long = {
    val acc = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) acc.addAndGet(t.taskMetrics.resultSize)
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

  test("lookup admission runs on executors: non-admitting filter bytes " +
      "never reach the driver") {
    import spark.implicits._
    val table = tmp("bloom-dist")
    // 200 single-value files; the synthetic sidecar gives every file a
    // ~60 KB filter (≈12 MB total) — the shape of a large table whose
    // sidecar the driver must NOT materialize
    spark.range(200)
      .withColumn("user_id", concat(lit("u"), col("id").cast("string")))
      .repartitionByRange(200, col("id")) // exactly one row per file
      .write.mode("overwrite").parquet(table)
    assert(BloomIndex.build(spark, table, "user_id") == 200L)
    val sidecarDir = s"$table/_graft_bloom/user_id"
    val fileVal = spark.read.parquet(table)
      .select(input_file_name().as("f"), col("user_id"))
      .collect()
      .map(r => (new java.net.URI(r.getString(0)).getPath, r.getString(1)))
      .toMap
    val fat = fileVal.toSeq.map { case (k, v) =>
      // filter sized for 50k items at 1% fpp (~60 KB) holding ONLY the
      // file's own value — exactly one file admits any given probe
      val bf = org.apache.spark.util.sketch.BloomFilter.create(50000, 0.01)
      bf.putString(v)
      val out = new java.io.ByteArrayOutputStream()
      bf.writeTo(out)
      (k, out.toByteArray)
    }
    fat.toDF("file", "filter").coalesce(1)
      .write.mode("overwrite").parquet(sidecarDir)
    val sidecarBytes = fat.map(_._2.length.toLong).sum
    assert(sidecarBytes > 10L * 1024 * 1024, s"fixture too small: $sidecarBytes")
    var admitted: Seq[String] = null
    var skipped: Seq[String] = null
    val shipped = resultBytesDuring {
      val (res, c, s) = BloomIndex.lookup(spark, table, "user_id", "u7")
      assert(res.count() == 1L)
      admitted = c; skipped = s
    }
    assert(admitted.size == 1 && skipped.size == 199,
      s"exactly one file admits: ${admitted.size} / ${skipped.size}")
    info(s"sidecar $sidecarBytes bytes, driver-collected $shipped bytes")
    // pre-rework the driver collected the whole sidecar (>12 MB); now only
    // admitting keys + the key column come back
    assert(shipped < sidecarBytes / 4,
      s"driver must not materialize the sidecar: $shipped of $sidecarBytes")
  }

  test("files newer than the index are scanned conservatively") {
    val (table, _) = buildTable()
    BloomIndex.build(spark, table, "user_id")
    // a late-arriving file the index has never seen
    spark.range(1).select(
        lit(999999L).as("id"), lit("u-late").as("user_id"),
        md5(lit("x")).as("payload"))
      .coalesce(1).write.mode("append").parquet(table)
    val (result, candidates, _) =
      BloomIndex.lookup(spark, table, "user_id", "u-late")
    assert(result.count() == 1L,
      "a stale index must degrade to scanning unknown files, not lose rows")
    assert(candidates.nonEmpty)
    // rebuilding absorbs the new file and restores full pruning
    val files = BloomIndex.build(spark, table, "user_id")
    val (r2, c2, s2) = BloomIndex.lookup(spark, table, "user_id", "u-late")
    assert(r2.count() == 1L)
    assert(c2.size + s2.size == files)
    assert(s2.size.toDouble / files >= 2.0 / 3.0)
  }
}
