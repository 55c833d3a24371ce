package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.StatsIndex

/** The per-file min/max zone-map sidecar: range scans on a clustered
  * column schedule only intersecting files, never lose rows, and degrade
  * conservatively (new files are scanned, all-null files are skipped,
  * stats-less files are never skipped). */
class StatsIndexSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** 16 files, each a DISJOINT contiguous range of `v` (what clusterBy /
    * repartitionByRange produces) — the layout whose narrow intervals the
    * index exists to exploit. */
  private def buildTable(): (String, Long) = {
    val n = 64000L
    val table = tmp("stats-table")
    spark.range(n)
      .withColumn("v", col("id"))
      .withColumn("s", format_string("k%07d", col("id")))
      .withColumn("d", date_add(lit("2026-01-01").cast("date"),
        (col("id") / 1000).cast("int")))
      .withColumn("payload", md5(col("id").cast("string")))
      .repartitionByRange(16, col("v"))
      .write.mode("overwrite").parquet(table)
    (table, n)
  }

  test("range scan schedules only intersecting files and matches the full scan") {
    val (table, _) = buildTable()
    val files = StatsIndex.build(spark, table, "v")
    assert(files >= 12L, s"expected many data files, got $files")
    // a 3000-wide probe of a 64000-wide domain: at most 2 slices intersect
    val (result, candidates, skipped) =
      StatsIndex.rangeScan(spark, table, "v", Some(10000L), Some(12999L))
    info(s"candidates ${candidates.size}, skipped ${skipped.size} of $files")
    assert(candidates.size + skipped.size == files)
    assert(skipped.size.toDouble / files >= 2.0 / 3.0,
      s"range scan must skip most files: ${skipped.size} of $files")
    val full = spark.read.parquet(table)
      .filter(col("v") >= 10000L && col("v") <= 12999L)
    assert(result.count() == 3000L)
    assert(result.collect().toSet == full.collect().toSet)
    // half-open probes work too (hi-only)
    val (tail, cT, sT) = StatsIndex.rangeScan(spark, table, "v", None, Some(999L))
    assert(tail.count() == 1000L)
    assert(sT.size.toDouble / (cT.size + sT.size) >= 2.0 / 3.0)
    // a probe outside the domain schedules nothing and returns empty
    val (miss, cM, _) =
      StatsIndex.rangeScan(spark, table, "v", Some(900000L), Some(900100L))
    assert(cM.isEmpty && miss.count() == 0L)
    // an unbounded probe is refused — that is a table scan, not an index use
    intercept[IllegalArgumentException] {
      StatsIndex.rangeScan(spark, table, "v", None, None)
    }
  }

  test("string and date columns prune with their natural bound types") {
    val (table, _) = buildTable()
    // s = k%07d sorts exactly like v, d steps every 1000 ids: both inherit
    // the v-range clustering
    StatsIndex.build(spark, table, "s")
    val (rs, cS, sS) =
      StatsIndex.rangeScan(spark, table, "s", Some("k0010000"), Some("k0012999"))
    assert(rs.count() == 3000L)
    assert(sS.size.toDouble / (cS.size + sS.size) >= 2.0 / 3.0,
      s"string range must prune: skipped ${sS.size} of ${cS.size + sS.size}")
    StatsIndex.build(spark, table, "d")
    val lo = java.sql.Date.valueOf("2026-01-11")
    val hi = java.sql.Date.valueOf("2026-01-13")
    val (rd, cD, sD) = StatsIndex.rangeScan(spark, table, "d", Some(lo), Some(hi))
    assert(rd.count() == 3000L) // 3 days x 1000 ids
    assert(sD.size.toDouble / (cD.size + sD.size) >= 1.0 / 2.0,
      s"date range must prune: skipped ${sD.size} of ${cD.size + sD.size}")
    val full = spark.read.parquet(table).filter(col("d").between(lo, hi))
    assert(rd.collect().toSet == full.collect().toSet)
  }

  test("Hive-partitioned table keeps partition columns and row parity") {
    val table = tmp("stats-part")
    spark.range(40000)
      .withColumn("event_date",
        date_add(lit("2024-01-01").cast("date"), (col("id") % 4).cast("int")))
      .withColumn("amount", col("id").cast("double"))
      .withColumn("payload", md5(col("id").cast("string")))
      .repartitionByRange(16, col("event_date"), col("id"))
      .write.partitionBy("event_date").mode("overwrite").parquet(table)
    val files = StatsIndex.build(spark, table, "amount")
    assert(files >= 12L)
    val (result, candidates, skipped) =
      StatsIndex.rangeScan(spark, table, "amount", Some(10000.0), Some(10999.0))
    val full = spark.read.parquet(table)
      .filter(col("amount").between(10000.0, 10999.0))
    assert(result.columns.sorted.sameElements(full.columns.sorted),
      s"scan schema ${result.columns.mkString(",")} != " +
        s"full-scan schema ${full.columns.mkString(",")}")
    assert(result.columns.contains("event_date"),
      "partition column lost by candidate-file read")
    val cols = full.columns.sorted.map(col).toSeq
    assert(result.select(cols: _*).collect().toSet ==
      full.select(cols: _*).collect().toSet)
    assert(candidates.size + skipped.size == files)
    assert(skipped.nonEmpty, "per-file ranges must prune something here")
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

  test("build is footer-only: no row-group IO at any table size") {
    val (table, _) = buildTable()
    val fullScan = bytesReadDuring {
      spark.read.parquet(table).select("v").rdd.foreach(_ => ())
    }
    val built = bytesReadDuring {
      StatsIndex.build(spark, table, "v")
    }
    info(s"full scan $fullScan bytes, build $built bytes")
    // footer reads bypass Spark input metrics entirely; the only tracked
    // bytes are schema probes — nowhere near a data scan (this is the
    // property that makes indexing a 100 TB table an O(files) metadata job)
    assert(built < fullScan / 10,
      s"build must not read row groups: $built vs full scan $fullScan")
  }

  test("refresh is incremental, conservative on late files, and a no-op at tip") {
    val (table, _) = buildTable()
    StatsIndex.build(spark, table, "v")
    // late file OUTSIDE every recorded interval: unknown → scanned
    spark.range(1).select(
        lit(999999L).as("id"), lit(999999L).as("v"),
        lit("k0999999").as("s"), lit("2027-01-01").cast("date").as("d"),
        md5(lit("x")).as("payload"))
      .coalesce(1).write.mode("append").parquet(table)
    val (late, cL, _) =
      StatsIndex.rangeScan(spark, table, "v", Some(999000L), Some(1000000L))
    assert(late.count() == 1L,
      "a stale index must degrade to scanning unknown files, not lose rows")
    assert(cL.nonEmpty)
    val st = StatsIndex.refresh(spark, table, "v")
    assert(st.filesIndexed == 1L && st.entriesDropped == 0L, s"got $st")
    // refreshed: the late row is now found through its OWN interval and
    // every original slice is skipped
    val (r2, c2, s2) =
      StatsIndex.rangeScan(spark, table, "v", Some(999000L), Some(1000000L))
    assert(r2.count() == 1L)
    assert(c2.size == 1 && c2.size + s2.size == st.filesTotal)
    val st2 = StatsIndex.refresh(spark, table, "v")
    assert(st2 == StatsIndex.RefreshStats(0L, 0L, st.filesTotal))
  }

  test("mergeByKey keeps the sidecar fresh; all-null files are skipped") {
    import spark.implicits._
    val table = tmp("stats-merge")
    spark.range(40000)
      .withColumn("day", concat(lit("2026-01-0"),
        ((col("id") % 4) + 1).cast("string")))
      .withColumn("user_id", concat(lit("u"), col("id").cast("string")))
      .withColumn("v", col("id"))
      .repartitionByRange(16, col("day"), col("id"))
      .select("day", "user_id", "v")
      .write.partitionBy("day").mode("overwrite").parquet(table)
    StatsIndex.build(spark, table, "v")

    // the merge rewrites day=2026-01-02 with all-new file names; the write
    // path must refresh the stats sidecar inline (same hook as bloom)
    graft.batch.Upsert.mergeByKey(spark, table,
      Seq(("2026-01-02", "u5", 70000041L), ("2026-01-02", "u-fresh", 70000042L))
        .toDF("day", "user_id", "v"),
      "day", Seq("user_id"))
    val (upd, cU, sU) =
      StatsIndex.rangeScan(spark, table, "v", Some(70000000L), Some(70000050L))
    assert(upd.count() == 2L)
    val total = cU.size + sU.size
    assert(sU.size.toDouble / total >= 2.0 / 3.0,
      s"post-merge range scan must prune: skipped ${sU.size} of $total")

    // an ALL-NULL file can never match a range probe — recorded and skipped
    Seq(("2026-01-05", "u-null", null.asInstanceOf[java.lang.Long]))
      .toDF("day", "user_id", "v")
      .coalesce(1).write.partitionBy("day").mode("append").parquet(table)
    StatsIndex.refresh(spark, table, "v")
    val (_, c2, s2) =
      StatsIndex.rangeScan(spark, table, "v", Some(0L), Some(100000000L))
    assert(s2.nonEmpty, "the all-null file must be skipped even by a " +
      "domain-wide probe")
  }

  /** Files actually scheduled by every file scan in `q`'s plan (AQE
    * subtrees traversed). */
  private def filesScanned(q: org.apache.spark.sql.DataFrame): Long = {
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
    }.flatten
    scans(q.queryExecution.executedPlan)
      .map(_.selectedPartitions.totalNumberOfFiles).sum
  }

  test("transparent skipping: pushed-down predicates prune files at planning") {
    val (table, _) = buildTable()
    val total = StatsIndex.build(spark, table, "v")
    StatsIndex.build(spark, table, "s")
    StatsIndex.build(spark, table, "d")
    val df = StatsIndex.read(spark, table)
    // an ordinary filter — no lookup API — skips non-intersecting files
    val q = df.filter(col("v") >= 10000L && col("v") <= 12999L)
    val full = spark.read.parquet(table)
      .filter(col("v") >= 10000L && col("v") <= 12999L)
    assert(q.collect().toSet == full.collect().toSet)
    val pruned = filesScanned(q)
    assert(pruned <= total / 4, s"planner must skip files: $pruned of $total")
    // no predicate → the whole table; unindexed column → conservative
    assert(filesScanned(df) == total)
    assert(filesScanned(df.filter(col("payload") === "nope")) == total)
    // string equality and date probes prune through their own sidecars
    // (catalyst literals: UTF8String, epoch-day int)
    assert(filesScanned(df.filter(col("s") === "k0031337")) <= total / 4)
    val dq = df.filter(col("d") === java.sql.Date.valueOf("2026-01-11"))
    assert(filesScanned(dq) <= total / 2)
    assert(dq.count() == 1000L)
    // SQL over a temp view rides the same planner path
    df.createOrReplaceTempView("stats_skip_t")
    val sq = spark.sql(
      "SELECT count(*) AS n FROM stats_skip_t WHERE v BETWEEN 10000 AND 12999")
    assert(sq.head.getLong(0) == 3000L)
    assert(filesScanned(sq) <= total / 4)
  }

  test("transparent skipping composes with Hive partition pruning") {
    val table = tmp("stats-skip-part")
    spark.range(40000)
      .withColumn("event_date",
        date_add(lit("2024-01-01").cast("date"), (col("id") % 4).cast("int")))
      .withColumn("amount", col("id").cast("double"))
      .withColumn("payload", md5(col("id").cast("string")))
      .repartitionByRange(16, col("event_date"), col("id"))
      .write.partitionBy("event_date").mode("overwrite").parquet(table)
    val total = StatsIndex.build(spark, table, "amount")
    val df = StatsIndex.read(spark, table)
    val q = df.filter(col("event_date") === "2024-01-02" &&
      col("amount").between(10000.0, 10999.0))
    val full = spark.read.parquet(table)
      .filter(col("event_date") === "2024-01-02" &&
        col("amount").between(10000.0, 10999.0))
    val cols = full.columns.sorted.map(col).toSeq
    assert(q.select(cols: _*).collect().toSet ==
      full.select(cols: _*).collect().toSet)
    // partition pruning drops 3 of 4 date dirs FIRST (base index), then
    // the stats wrapper drops the non-intersecting files within the dir
    val n = filesScanned(q)
    assert(n <= 2, s"partition + stats pruning must compose: $n of $total files")
  }

  test("composite AND admission intersects per-column file sets") {
    val table = tmp("stats-and")
    // a 4x4 grid layout: file (i,j) holds a in [1000i, 1000i+249] and
    // b in [1000j, 1000j+249] — each column alone admits a full row/column
    // of the grid, the conjunction exactly one cell
    var first = true
    for (i <- 0 until 4; j <- 0 until 4) {
      spark.range(250).select(
          (lit(i * 1000L) + col("id")).as("a"),
          (lit(j * 1000L) + col("id")).as("b"),
          md5(col("id").cast("string")).as("payload"))
        .coalesce(1).write.mode(if (first) "overwrite" else "append")
        .parquet(table)
      first = false
    }
    StatsIndex.build(spark, table, "a")
    StatsIndex.build(spark, table, "b")
    val (_, cA, _) = StatsIndex.rangeScan(spark, table, "a", Some(1000L), Some(1249L))
    val (_, cB, _) = StatsIndex.rangeScan(spark, table, "b", Some(2000L), Some(2249L))
    assert(cA.size == 4 && cB.size == 4, s"grid rows/cols: ${cA.size}/${cB.size}")
    val (res, cAB, sAB) = StatsIndex.rangeScanAll(spark, table, Seq(
      ("a", Some(1000L), Some(1249L)), ("b", Some(2000L), Some(2249L))))
    assert(cAB.size <= math.min(cA.size, cB.size),
      s"AND must intersect, not union: ${cAB.size}")
    assert(cAB.size == 1 && sAB.size == 15, s"exactly the (1,2) cell: ${cAB.size}")
    val full = spark.read.parquet(table)
      .filter(col("a").between(1000L, 1249L) && col("b").between(2000L, 2249L))
    assert(res.collect().toSet == full.collect().toSet)
    // the transparent planner path composes the same way on pushed-down
    // conjuncts
    val df = StatsIndex.read(spark, table)
    val q = df.filter(col("a").between(1000L, 1249L) &&
      col("b").between(2000L, 2249L))
    assert(q.collect().toSet == full.collect().toSet)
    assert(filesScanned(q) == 1, s"planner must schedule one grid cell")
  }

  test("build refuses Hive partition columns (footers can never prune them)") {
    val table = tmp("stats-partcol")
    spark.range(1000)
      .withColumn("event_date",
        date_add(lit("2024-01-01").cast("date"), (col("id") % 4).cast("int")))
      .withColumn("amount", col("id").cast("double"))
      .write.partitionBy("event_date").mode("overwrite").parquet(table)
    // a partition column's values live in directory names — every footer
    // would record all-null and every probe would skip every file
    val e = intercept[RuntimeException] {
      StatsIndex.build(spark, table, "event_date")
    }
    assert(e.getMessage.contains("partition column"), e.getMessage)
    // ...and the data column still indexes fine on the same table
    assert(StatsIndex.build(spark, table, "amount") > 0L)
  }

  test("an empty sidecar resolves the probe type from the table schema") {
    import org.apache.hadoop.fs.Path
    val (table, _) = buildTable()
    StatsIndex.build(spark, table, "s")
    // truncation: every data file vanishes; refresh leaves an EMPTY sidecar
    val fs = new Path(table).getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(new Path(table)).filter(st =>
        st.getPath.getName.endsWith(".parquet"))
      .foreach(st => fs.delete(st.getPath, false))
    val st = StatsIndex.refresh(spark, table, "s")
    assert(st.filesTotal == 0L && st.entriesDropped > 0L, s"got $st")
    // data returns before the next refresh; a STRING probe must normalize
    // against the schema type, not a bogus "long" default
    spark.range(100)
      .withColumn("v", col("id"))
      .withColumn("s", format_string("k%07d", col("id")))
      .withColumn("d", lit("2026-01-01").cast("date"))
      .withColumn("payload", md5(col("id").cast("string")))
      .coalesce(1).write.mode("append").parquet(table)
    val (r, c, sk) =
      StatsIndex.rangeScan(spark, table, "s", Some("k0000010"), Some("k0000019"))
    assert(r.count() == 10L, "empty sidecar must degrade to an unpruned scan")
    assert(sk.isEmpty && c.nonEmpty)
  }

  test("string bounds compare in parquet's unsigned UTF-8 order, not UTF-16") {
    import spark.implicits._
    val table = tmp("stats-unicode")
    // one file per value: "a", and U+1F600 (non-BMP — its UTF-16 surrogate
    // D83D sorts BELOW U+E000 while its UTF-8 bytes F0 9F 98 80 sort ABOVE)
    Seq("a").toDF("s").coalesce(1).write.mode("overwrite").parquet(table)
    Seq("\uD83D\uDE00").toDF("s").coalesce(1)
      .write.mode("append").parquet(table)
    StatsIndex.build(spark, table, "s")
    // lo = U+E000: under UTF-16 compareTo the emoji file's max looks
    // SMALLER than lo and the file is wrongly skipped — silent row loss
    val (r, c, sk) =
      StatsIndex.rangeScan(spark, table, "s", Some("\uE000"), None)
    assert(r.count() == 1L,
      "file holding a supplementary-plane match must not be skipped")
    assert(sk.size == 1, s"the 'a' file still prunes: skipped $sk")
  }

  test("unsupported column types are refused loudly") {
    val table = tmp("stats-bad")
    spark.range(100)
      .withColumn("arr", array(col("id")))
      .write.mode("overwrite").parquet(table)
    val e = intercept[RuntimeException] {
      StatsIndex.build(spark, table, "arr")
    }
    assert(e.getMessage.contains("unsupported type"))
    intercept[IllegalArgumentException] {
      StatsIndex.build(spark, table, "no_such_col")
    }
  }
}
