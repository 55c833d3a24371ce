package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.LayoutOps

/** Layout quality is measurable, not aspirational: clusterBy must turn an
  * arrival-order table (every file spans the whole key domain → zero
  * pruning) into a range-clustered one where a selective pushed predicate
  * touches one file's row groups. Asserted from the parquet FOOTER
  * statistics — the same metadata the reader's pruning consults. */
class LayoutSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("clusterBy: arrival-order layout scans everything, clustered layout prunes to one file") {
    import spark.implicits._
    // deterministic interleaved arrival order: key strides the domain so
    // every round-robin chunk sees the full range (the worst realistic case)
    val n = 8000L
    val df = spark.range(n)
      .withColumn("k", (col("id") * 2477L) % n) // 2477 coprime with 8000 → permutation
      .withColumn("payload", md5(col("k").cast("string")))

    val unclustered = tmp("layout-raw")
    df.repartition(8).write.mode("overwrite").parquet(unclustered)
    val clustered = tmp("layout-clustered")
    LayoutOps.clusterBy(df, Seq("k"), 8).write.mode("overwrite").parquet(clustered)

    // same rows either way
    assert(spark.read.parquet(clustered).count() == n)
    assert(spark.read.parquet(clustered).agg(sum("k")).head.getLong(0) ==
      spark.read.parquet(unclustered).agg(sum("k")).head.getLong(0))

    val rawB = LayoutOps.longColumnBounds(unclustered, "k")
    val cluB = LayoutOps.longColumnBounds(clustered, "k")
    assert(rawB.size >= 4 && cluB.size >= 4, s"want multiple files: ${rawB.size}/${cluB.size}")

    // a 1%-of-domain range predicate: arrival order reads every file,
    // clustered reads at most two (range boundary may split the window)
    val (lo, hi) = (1000L, 1079L)
    assert(LayoutOps.scanFraction(rawB, lo, hi) == 1.0,
      s"interleaved layout must have no pruning power: $rawB")
    val cluFrac = LayoutOps.scanFraction(cluB, lo, hi)
    assert(cluFrac <= 2.0 / cluB.size + 1e-9,
      s"clustered layout must prune to ≤2 of ${cluB.size} files: $cluB")

    // clustered files are pairwise disjoint on k (distinct keys → strict)
    val sorted = cluB.sortBy(_._2)
    sorted.sliding(2).foreach {
      case Seq((fa, _, amax, _), (fb, bmin, _, _)) =>
        assert(amax < bmin, s"files $fa and $fb overlap on k")
      case _ => ()
    }

    // and the filtered read is still correct
    val got = spark.read.parquet(clustered)
      .filter(col("k").between(lo, hi)).count()
    assert(got == hi - lo + 1)
  }

  test("zOrderBy: a predicate on the SECOND key alone prunes; prefix sort cannot") {
    import spark.implicits._
    // two independent uniform keys — the classic two-predicate serving
    // table (e.g. customer_id × event_day)
    val n = 60000L
    val dom = 1000L
    val df = spark.range(n)
      .withColumn("a", (col("id") * 2477L) % dom)
      .withColumn("b", (col("id") * 3163L) % dom)
      .withColumn("payload", md5(col("id").cast("string")))
    // 32 files: range-partition boundaries come from seeded sampling whose
    // seed varies with session history (rdd ids), wobbling each file's key
    // rectangle by a file or two — finer granularity keeps the pruning
    // assertions far from that noise
    val files = 32

    val prefix = tmp("layout-prefix")
    LayoutOps.clusterBy(df, Seq("a", "b"), files).write.mode("overwrite").parquet(prefix)
    val zed = tmp("layout-z")
    LayoutOps.zOrderBy(df, Seq("a", "b"), files).write.mode("overwrite").parquet(zed)

    // identical content either way
    assert(spark.read.parquet(zed).count() == n)
    assert(spark.read.parquet(zed).agg(sum("b")).head.getLong(0) ==
      spark.read.parquet(prefix).agg(sum("b")).head.getLong(0))

    // a 1%-of-domain range on b ALONE: the lexicographic layout has b
    // interleaved within every a-run — every file intersects; the z-order
    // layout gives b its own bit positions — at most ~sqrt coverage
    val (lo, hi) = (500L, 509L)
    val prefixFrac = LayoutOps.scanFraction(
      LayoutOps.longColumnBounds(prefix, "b"), lo, hi)
    val zFrac = LayoutOps.scanFraction(
      LayoutOps.longColumnBounds(zed, "b"), lo, hi)
    info(f"b-only range scan fraction: prefix $prefixFrac%.2f vs z-order $zFrac%.2f")
    assert(prefixFrac >= 0.9,
      s"prefix sort should have ~no pruning power on b: $prefixFrac")
    assert(zFrac <= 1.0 / 3.0,
      s"z-order must skip >= 2/3 of files on a second-key predicate: $zFrac")

    // the FIRST key keeps real pruning power too (z-order trades a little
    // per-key locality for locality on every key; the first key sits at
    // the lower interleave positions, so its runs are shorter — the bound
    // is looser than the second key's, and both are far from the prefix
    // layout's 1.0)
    val zFracA = LayoutOps.scanFraction(
      LayoutOps.longColumnBounds(zed, "a"), lo, hi)
    assert(zFracA <= 0.5,
      s"z-order must also prune on the first key: $zFracA")

    // filtered reads stay correct
    assert(spark.read.parquet(zed).filter(col("b").between(lo, hi)).count() ==
      df.filter(col("b").between(lo, hi)).count())
  }

  test("zOrderBy: quantile bucketing keeps pruning power under heavy skew") {
    import spark.implicits._
    // 90% of rows concentrate in 1% of the a-domain: linear min/max
    // normalization would waste nearly every bucket on the empty range;
    // quantile bucketing spreads the dense region across buckets
    val n = 40000L
    val df = spark.range(n)
      .withColumn("a",
        when(col("id") % 10 =!= 0, (col("id") * 7919L) % 10L)
          .otherwise((col("id") * 7919L) % 1000000L))
      .withColumn("b", (col("id") * 3163L) % 1000L)
    val zed = tmp("layout-z-skew")
    LayoutOps.zOrderBy(df, Seq("a", "b"), 16).write.mode("overwrite").parquet(zed)
    // a narrow predicate inside the DENSE region must still prune on a
    val aFrac = LayoutOps.scanFraction(
      LayoutOps.longColumnBounds(zed, "a"), 3L, 3L)
    assert(aFrac <= 0.5, s"skewed dense-region point lookup must prune: $aFrac")
    // and the sparse tail prunes hard (few files hold any tail values)
    val tailFrac = LayoutOps.scanFraction(
      LayoutOps.longColumnBounds(zed, "a"), 500000L, 600000L)
    assert(tailFrac <= 0.5, s"sparse tail range must prune: $tailFrac")
    assert(spark.read.parquet(zed).filter(col("a") === 3L).count() ==
      df.filter(col("a") === 3L).count())
  }

  test("optimizeZOrder: scheduled layout rewrite under claims, time-travelable, prunes") {
    import spark.implicits._
    import graft.batch.Upsert
    import graft.core.TxnLog
    val table = tmp("layout-optimize")
    val n = 20000
    // one partition, two serving keys, arrival-order interleaved
    (0 until n).map(i => ("2026-01-01", i.toLong, (i.toLong * 2477L) % 500L,
        (i.toLong * 3163L) % 500L))
      .toDF("day", "id", "x", "y")
      .repartition(8)
      .write.partitionBy("day").mode("overwrite").parquet(table)
    val v0 = TxnLog.currentVersion(spark, table)
    val before = spark.read.parquet(table)
      .agg(sum("x"), sum("y"), count("*")).head

    assert(Upsert.optimizeZOrder(spark, table, "day", Seq("x", "y"),
      targetBytes = 12L * 1024) == 1)

    // row-identical
    val after = spark.read.parquet(table)
      .agg(sum("x"), sum("y"), count("*")).head
    assert(after == before, s"layout rewrite must not change rows: $before -> $after")
    // the partition's files now prune on the SECOND key alone
    val bounds = LayoutOps.longColumnBounds(s"$table/day=2026-01-01", "y")
    assert(bounds.size >= 4, s"want multiple files, got ${bounds.size}")
    val frac = LayoutOps.scanFraction(bounds, 100L, 104L)
    info(f"post-OPTIMIZE y-only scan fraction: $frac%.2f over ${bounds.size} files")
    assert(frac <= 0.5, s"z-ordered partition must prune on y: $frac")
    // the pre-layout generation is retained: time travel still serves it
    assert(Upsert.readAsOf(spark, table, v0, "day").count() == n.toLong)

    // ...and the table came out SELF-INDEXED: the rewrite built min/max
    // sidecars for its own cluster keys, so a transparent read prunes on
    // the second key with no further maintenance step
    assert(graft.core.StatsIndex.indexedColumns(spark, table) == Seq("x", "y"))
    val skipDf = graft.core.StatsIndex.read(spark, table)
    val q = skipDf.filter(col("y") >= 100L && col("y") <= 104L)
    assert(q.count() == spark.read.parquet(table)
      .filter(col("y").between(100L, 104L)).count())
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
    }.flatten
    val scanned = scans(q.queryExecution.executedPlan)
      .map(_.selectedPartitions.totalNumberOfFiles).sum
    assert(scanned <= (bounds.size + 1) / 2,
      s"self-indexed read must plan-prune on y: $scanned of ${bounds.size} files")
  }

  test("compactPartitions folds layout in: clustered output prunes by footer bounds") {
    import spark.implicits._
    val table = tmp("upsert-layout")
    // one crowded partition: 8 arrival files, each a hash-mixed slice of
    // the v domain — every file's [min,max] spans nearly everything
    spark.range(64)
      .select(lit("2026-01-01").as("day"),
        col("id").as("k"),
        ((col("id") * 37) % 64).cast("double").as("v")) // 37 ⊥ 64: a permutation
      .repartition(8)
      .write.partitionBy("day").mode("overwrite").parquet(table)
    // establish the txn log through the ordinary write path (sibling
    // partition — the crowded one keeps its 8 arrival files)
    graft.batch.Upsert.mergeByKey(spark, table,
      Seq(("2026-01-02", 999L, 1.0)).toDF("day", "k", "v"), "day", Seq("k"))
    val partDir = s"$table/day=2026-01-01"
    def files() = new java.io.File(partDir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files() == 8)
    val before = graft.batch.Upsert.readCommitted(spark, table, "day")
      .select("day", "k", "v").as[(String, Long, Double)].collect().toSet

    // target half the partition's bytes -> 2 output files, clustered on v
    val bytes = new java.io.File(partDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val n = graft.batch.Upsert.compactPartitions(spark, table, "day",
      targetBytes = bytes / 2 + 1, layoutCols = Seq("v"))
    assert(n >= 1)
    assert(files() == 2, "compaction must hit the byte-derived file count")

    // footer-stats probe: the two files cover DISJOINT v ranges — a pushed
    // v predicate now prunes where the arrival layout scanned all 8 files
    val bounds = LayoutOps.longColumnBounds(partDir, "v").sortBy(_._2)
    assert(bounds.size == 2)
    assert(bounds(0)._3 < bounds(1)._2,
      s"clustered files must cover disjoint v ranges: $bounds")
    // row-identical, including the untouched sibling partition
    val after = graft.batch.Upsert.readCommitted(spark, table, "day")
      .select("day", "k", "v").as[(String, Long, Double)].collect().toSet
    assert(after == before)
  }

  test("zOrderBy refuses string keys and degenerate arity") {
    import spark.implicits._
    val df = Seq((1L, "x", 2L)).toDF("a", "s", "b")
    intercept[IllegalArgumentException] {
      LayoutOps.zOrderBy(df, Seq("a", "s"), 4)
    }
    intercept[IllegalArgumentException] {
      LayoutOps.zOrderBy(df, Seq("a"), 4)
    }
  }

  test("OPTIMIZE … WHERE: the scope bounds both compaction and layout to named partitions") {
    import spark.implicits._
    import graft.batch.Upsert
    val table = tmp("optimize-where")
    // three partitions, each crowded (4 files of interleaved keys)
    (0 until 3000).map(i =>
        (s"2026-02-0${i % 3 + 1}", i.toLong, (i.toLong * 2477L) % 500L,
          (i.toLong * 3163L) % 500L))
      .toDF("day", "id", "x", "y")
      .repartition(4)
      .write.partitionBy("day").mode("overwrite").parquet(table)
    def files(day: String): Map[String, Long] = {
      val d = new java.io.File(s"$table/day=$day")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val before2 = files("2026-02-02")
    val before3 = files("2026-02-03")

    // scoped compaction touches ONLY day 1; the others stay byte-identical
    assert(Upsert.compactPartitions(spark, table, "day",
      onlyPartitions = Some(Set("2026-02-01"))) == 1)
    assert(files("2026-02-02") == before2 && files("2026-02-03") == before3,
      "out-of-scope partitions must not be touched")
    assert(files("2026-02-01").size == 1, "in-scope partition compacted")

    // scoped layout: day 2 only; a value with no directory is a no-op
    assert(Upsert.optimizeZOrder(spark, table, "day", Seq("x", "y"),
      onlyPartitions = Some(Set("2026-02-02", "2026-02-09"))) == 1)
    assert(files("2026-02-03") == before3, "day 3 still untouched")
    assert(files("2026-02-02") != before2, "day 2 rewritten by the layout pass")
    // rows unchanged by either pass
    assert(spark.read.parquet(table).count() == 3000L)

    // an empty scope is refused loudly — it reads as success over nothing
    intercept[IllegalArgumentException] {
      Upsert.compactPartitions(spark, table, "day",
        onlyPartitions = Some(Set.empty))
    }
  }
}
