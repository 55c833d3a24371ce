package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.batch.Upsert
import graft.core.TxnLog
import graft.operators.{PackWriter, TextQueries}

/** The materialized packed-shard writer: written shards must carry the
  * exact payload the accounting query describes, land in a managed table,
  * and re-pack idempotently. */
class PackWriterSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("written shards' occupancy ≡ the accounting query's report, and " +
      "the payload stream reconstructs the corpus in doc order") {
    val table = Files.createTempDirectory("packw").toString + "/t"
    val touched = PackWriter.write(spark, dir, table)
    assert(touched.nonEmpty, "the pack must touch at least one source")
    val got = Upsert.readCommitted(spark, table, "source")

    // 1) manifest columns match the accounting query row for row
    val acc = TextQueries.packSequencesSharded(spark, dir)
      .select("source", "seq_id", "n_docs", "n_full_docs", "n_tokens",
        "first_doc", "last_doc")
    val written = got.select("source", "seq_id", "n_docs", "n_full_docs",
      "n_tokens", "first_doc", "last_doc")
    assert(written.count() == acc.count(),
      "one written shard per accounted sequence")
    assert(written.exceptAll(acc).isEmpty && acc.exceptAll(written).isEmpty,
      "written occupancy must equal the accounting report exactly")

    // 2) every payload holds exactly n_tokens tokens, full shards hold L
    assert(got.filter(size(col("toks")) =!= col("n_tokens")).isEmpty,
      "payload length must equal the manifest token count")

    // 3) concatenating payloads in seq order reconstructs each source's
    //    token stream in doc_id order — no token lost, duplicated, or
    //    reordered by the distributed assembly
    val streams = got.orderBy("source", "seq_id")
      .groupBy("source")
      .agg(expr("flatten(collect_list(toks))").as("packed"))
    val truth = graft.core.Tables.documents(spark, dir)
      .withColumn("toks", TextQueries.toks(col("text")))
      .filter(size(col("toks")) > 0)
      .orderBy("source", "doc_id")
      .groupBy("source")
      .agg(expr("flatten(collect_list(toks))").as("original"))
    val joined = streams.join(truth, "source")
      .withColumn("same", col("packed") === col("original"))
    assert(joined.filter(!col("same")).isEmpty,
      "packed stream must equal the doc_id-ordered corpus stream")

    // 4) the destination is a MANAGED table: versioned, time-travelable
    val v1 = TxnLog.currentVersion(spark, table)
    assert(v1 >= 1L, "pack writes must commit through the TxnLog")

    // 5) re-pack of the same corpus is idempotent in content (same keys,
    //    same rows) and commits a new version like any merge
    PackWriter.write(spark, dir, table)
    val again = Upsert.readCommitted(spark, table, "source")
      .select("source", "seq_id", "n_docs", "n_full_docs", "n_tokens",
        "first_doc", "last_doc")
    assert(again.exceptAll(acc).isEmpty && acc.exceptAll(again).isEmpty,
      "re-pack must not change shard content")
    assert(Upsert.readAsOf(spark, table, v1, "source").count() == acc.count(),
      "the first pack remains readable AS OF its version")
  }

  private def words(from: Int, n: Int): String =
    (from until from + n).map(i => s"t$i").mkString(" ")

  private def mkDocs(t: String, rows: (String, Long, String)*): Unit = {
    import spark.implicits._
    Upsert.mergeByKey(spark, t,
      rows.toDF("source", "doc_id", "text"), "source", Seq("doc_id"))
  }

  private def shardRows(t: String) =
    Upsert.readCommitted(spark, t, "source")
      .select("source", "seq_id", "toks", "n_docs", "n_full_docs",
        "n_tokens", "first_doc", "last_doc")

  test("sync ≡ full re-pack at every version: append waves rewrite only " +
      "the grown source's tail plus the fresh rows") {
    import graft.operators.PackWriter
    val root = Files.createTempDirectory("packsync").toString
    val docsT = s"$root/docs"; val shard = s"$root/shard"
    // wave 0: s1 = 200 + 100 tokens (T=300 → seq0 full, seq1 holds 44)
    mkDocs(docsT,
      ("s1", 1L, words(0, 200)),
      ("s1", 2L, words(200, 100)))
    val st0 = PackWriter.sync(spark, docsT, "source", shard)
    assert(st0.rebuilt && st0.newDocs == 2 && st0.seqsWritten == 2, s"$st0")
    // bootstrap ≡ a directory-less full pack: fresh bootstrap of the same
    // table must produce identical rows
    val truth0 = s"$root/truth0"
    PackWriter.sync(spark, docsT, "source", truth0)
    assert(shardRows(shard).exceptAll(shardRows(truth0)).isEmpty &&
      shardRows(truth0).exceptAll(shardRows(shard)).isEmpty)
    val vAfterWave0 = TxnLog.currentVersion(spark, shard)
    val seq0Before = shardRows(shard).filter(col("seq_id") === 0L)
      .collect().map(_.toString).toSeq

    // wave 1: s1 grows by 100 tokens (T=400: seq1 rewrites to 144, seq0
    // untouched); a brand-new source s2 appears (packs from offset 0)
    mkDocs(docsT,
      ("s1", 3L, words(300, 100)),
      ("s2", 10L, words(0, 60)))
    val st1 = PackWriter.sync(spark, docsT, "source", shard)
    assert(!st1.rebuilt && st1.newDocs == 2, s"$st1")
    // exactly TWO rows written: s1's rewritten tail seq1 + s2's seq0 —
    // s1 seq0 (full) must not be touched
    assert(st1.seqsWritten == 2, s"tail rewrite must be O(growth): $st1")
    assert(shardRows(shard).filter(col("seq_id") === 0L &&
        col("source") === "s1")
      .collect().map(_.toString).toSeq == seq0Before,
      "the full seq0 must be byte-identical after an append sync")
    // hand math for the rewritten tail: doc2's last 44 + doc3's 100
    import spark.implicits._
    val tail = shardRows(shard)
      .filter(col("source") === "s1" && col("seq_id") === 1L)
      .as[(String, Long, Seq[String], Long, Long, Long, Long, Long)]
      .collect().head
    assert(tail._6 == 144L && tail._4 == 2L && tail._5 == 1L &&
      tail._7 == 2L && tail._8 == 3L,
      s"tail manifest (n_tokens, n_docs, n_full, first, last): $tail")
    assert(tail._3 == ((256 until 300) ++ (300 until 400)).map(i => s"t$i"),
      "tail payload must be doc2's last 44 tokens then doc3's 100")
    // and the whole table ≡ a from-scratch pack of the current snapshot
    val truth1 = s"$root/truth1"
    PackWriter.sync(spark, docsT, "source", truth1)
    assert(shardRows(shard).exceptAll(shardRows(truth1)).isEmpty &&
      shardRows(truth1).exceptAll(shardRows(shard)).isEmpty,
      "sync-maintained shards must equal a from-scratch pack")
    // pre-sync state remains time-travelable
    assert(Upsert.readAsOf(spark, shard, vAfterWave0, "source").count() == 2)

    // idempotent at tip: nothing new → no-op, cursor advances cleanly
    val st2 = PackWriter.sync(spark, docsT, "source", shard)
    assert(!st2.rebuilt && st2.newDocs == 0 && st2.seqsWritten == 0, s"$st2")
  }

  test("sync refuses corpus rewrites and out-of-order appends loudly") {
    import graft.operators.PackWriter
    val root = Files.createTempDirectory("packsyncr").toString
    val docsT = s"$root/docs"; val shard = s"$root/shard"
    mkDocs(docsT, ("s1", 5L, words(0, 50)))
    PackWriter.sync(spark, docsT, "source", shard)
    // an UPDATE of a packed doc (delete+insert legs) must refuse
    mkDocs(docsT, ("s1", 5L, words(0, 10)))
    val e1 = intercept[IllegalArgumentException] {
      PackWriter.sync(spark, docsT, "source", shard)
    }
    assert(e1.getMessage.contains("non-append"), e1.getMessage)
    // an out-of-order append (doc below the last packed doc) must refuse
    val docsT2 = s"$root/docs2"; val shard2 = s"$root/shard2"
    mkDocs(docsT2, ("s1", 5L, words(0, 50)))
    PackWriter.sync(spark, docsT2, "source", shard2)
    mkDocs(docsT2, ("s1", 3L, words(100, 20)))
    val e2 = intercept[IllegalArgumentException] {
      PackWriter.sync(spark, docsT2, "source", shard2)
    }
    assert(e2.getMessage.contains("append-only"), e2.getMessage)
  }

  test("Maintain drives the pack: one JSON line, managed result") {
    val table = Files.createTempDirectory("packm").toString + "/t"
    val lines = graft.Maintain.runMode(spark, table, "pack", Seq(dir),
      graft.core.GraftConfig.load().maintenance)
    assert(lines.size == 1 && lines.head.contains("\"op\":\"pack\""),
      lines.mkString("\n"))
    assert(TxnLog.currentVersion(spark, table) >= 1L)
    assert(Upsert.readCommitted(spark, table, "source").count() > 0)
  }

  test("Maintain packsync mode bootstraps then follows the docs table") {
    val root = Files.createTempDirectory("packms").toString
    val docsT = s"$root/docs"; val shard = s"$root/shard"
    val m = graft.core.GraftConfig.load().maintenance
    mkDocs(docsT, ("s1", 1L, words(0, 40)))
    val l1 = graft.Maintain.runMode(spark, shard, "packsync",
      Seq("source", docsT), m)
    assert(l1.size == 1 && l1.head.contains("\"rebuilt\":true"), s"$l1")
    mkDocs(docsT, ("s1", 2L, words(40, 30)))
    val l2 = graft.Maintain.runMode(spark, shard, "packsync",
      Seq("source", docsT), m)
    assert(l2.head.contains("\"rebuilt\":false") &&
      l2.head.contains("\"newDocs\":1"), s"$l2")
  }

  /** Total task input bytes during `body` (the BloomIndexSpec probe). */
  private def bytesRead(body: => Unit): Long = {
    val acc = new java.util.concurrent.atomic.AtomicLong(0L)
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

  /** Strip the `state` field from a shard's cursor (the r18 format),
    * leaving version/applyingTo intact. */
  private def stripCursorState(shard: String): Unit = {
    val p = java.nio.file.Paths.get(shard, "_graft_meta", "pack_cursor.json")
    val old = new String(java.nio.file.Files.readAllBytes(p))
    val v = old.split("\"version\":")(1).takeWhile(_.isDigit)
    java.nio.file.Files.write(p, s"""{"version":$v}""".getBytes)
    // java.nio writes bypass Hadoop's checksum sidecar — drop it
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(
      shard, "_graft_meta", ".pack_cursor.json.crc"))
  }

  test("steady sync is O(growth): state rides the cursor and the shard " +
      "table contributes only the grown source's tail row") {
    val root = Files.createTempDirectory("packbytes").toString
    val docsT = s"$root/docs"; val shard = s"$root/shard"
    // 12 sources × 80 docs × 40 tokens: a shard table whose full payload
    // dwarfs any single source's partition
    val seed = (0 until 12).flatMap { s =>
      (0 until 80).map(i => (s"s$s", i.toLong, words(i * 40, 40)))
    }
    mkDocs(docsT, seed: _*)
    PackWriter.sync(spark, docsT, "source", shard)
    // the completed sync's cursor carries the |sources|-row state
    val cursor = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(shard, "_graft_meta", "pack_cursor.json")))
    assert(cursor.contains("\"state\""), s"cursor must carry state: $cursor")
    assert(!cursor.contains("applyingTo"), s"completed cursor: $cursor")
    // two identically-shaped appends to ONE source. The FIRST sync runs
    // with the state stripped (the r18 fallback: full-manifest state
    // scan); the SECOND runs steady (state from the cursor the fallback
    // sync rewrote). The steady sync runs against the LARGER table, so
    // any growth bias works AGAINST the assertion — a pass means the
    // state scan is really gone, not that the table shrank.
    stripCursorState(shard)
    mkDocs(docsT, ("s3", 100L, words(0, 10)))
    val fallbackBytes = bytesRead {
      val st = PackWriter.sync(spark, docsT, "source", shard)
      assert(st.newDocs == 1L, s"$st")
    }
    mkDocs(docsT, ("s3", 101L, words(10, 10)))
    val steadyBytes = bytesRead {
      val st = PackWriter.sync(spark, docsT, "source", shard)
      assert(st.newDocs == 1L, s"$st")
    }
    info(s"fallback sync (state scan): $fallbackBytes bytes; " +
      s"steady sync (cursor state): $steadyBytes bytes")
    assert(steadyBytes < fallbackBytes,
      s"steady sync must read strictly less than the state-scanning " +
        s"fallback: steady=$steadyBytes vs fallback=$fallbackBytes")
    // and the result still equals a from-scratch pack
    val truth = s"$root/truth"
    PackWriter.sync(spark, docsT, "source", truth)
    assert(shardRows(shard).exceptAll(shardRows(truth)).isEmpty &&
      shardRows(truth).exceptAll(shardRows(shard)).isEmpty)
  }

  test("pre-state cursors (and crash recovery) fall back to the manifest " +
      "scan: sync stays exact") {
    val root = Files.createTempDirectory("packoldcur").toString
    val docsT = s"$root/docs"; val shard = s"$root/shard"
    mkDocs(docsT, ("s1", 1L, words(0, 300)), ("s2", 1L, words(0, 100)))
    PackWriter.sync(spark, docsT, "source", shard)
    // rewrite the cursor in the r18 (state-less) format
    stripCursorState(shard)
    mkDocs(docsT, ("s1", 2L, words(300, 50)))
    val st = PackWriter.sync(spark, docsT, "source", shard)
    assert(!st.rebuilt && st.newDocs == 1L, s"$st")
    val truth = s"$root/truth"
    PackWriter.sync(spark, docsT, "source", truth)
    assert(shardRows(shard).exceptAll(shardRows(truth)).isEmpty &&
      shardRows(truth).exceptAll(shardRows(shard)).isEmpty,
      "state-less cursor fallback must equal a from-scratch pack")
    // and the fallback sync upgrades the cursor to the state-carrying form
    assert(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths
      .get(shard, "_graft_meta", "pack_cursor.json"))).contains("\"state\""))
  }

  test("docs tables partitioned by a column other than 'source' pack " +
      "through the same pipeline") {
    import spark.implicits._
    val root = Files.createTempDirectory("packpcol").toString
    val docsT = s"$root/docs"; val shard = s"$root/shard"
    Upsert.mergeByKey(spark, docsT,
      Seq(("web", 1L, words(0, 100)), ("books", 1L, words(0, 60)))
        .toDF("src", "doc_id", "text"), "src", Seq("doc_id"))
    val st = PackWriter.sync(spark, docsT, "src", shard)
    assert(st.rebuilt && st.newDocs == 2L, s"$st")
    val got = Upsert.readCommitted(spark, shard, "source")
    assert(got.select("source").distinct().orderBy("source")
      .as[String].collect().toSeq == Seq("books", "web"))
    // incremental leg under the renamed partition column
    Upsert.mergeByKey(spark, docsT,
      Seq(("web", 2L, words(100, 30))).toDF("src", "doc_id", "text"),
      "src", Seq("doc_id"))
    val st1 = PackWriter.sync(spark, docsT, "src", shard)
    assert(!st1.rebuilt && st1.newDocs == 1L, s"$st1")
    // re-read: the merge rewrote web's partition under the first plan
    assert(Upsert.readCommitted(spark, shard, "source")
      .filter(col("source") === "web")
      .agg(sum("n_tokens")).as[Long].collect().head == 130L)
  }

  test("collect_list assembly is deterministic: straddling docs gather in " +
      "offset order regardless of partitioning") {
    // the same pack computed under 2 and 32 shuffle partitions must be
    // byte-identical (array_sort on start_off, not arrival order)
    val conf = spark.conf
    val saved = conf.get("spark.sql.shuffle.partitions")
    val a = PackWriter.packedRows(spark, dir).orderBy("source", "seq_id")
      .collect().map(_.toString)
    conf.set("spark.sql.shuffle.partitions", "2")
    try {
      val b = PackWriter.packedRows(spark, dir).orderBy("source", "seq_id")
        .collect().map(_.toString)
      assert(a.sameElements(b), "payload assembly must not depend on " +
        "shuffle partitioning")
    } finally conf.set("spark.sql.shuffle.partitions", saved)
  }
}
