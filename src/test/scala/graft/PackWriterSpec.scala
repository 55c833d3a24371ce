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

  test("Maintain drives the pack: one JSON line, managed result") {
    val table = Files.createTempDirectory("packm").toString + "/t"
    val lines = graft.Maintain.runMode(spark, table, "pack", Seq(dir),
      graft.core.GraftConfig.load().maintenance)
    assert(lines.size == 1 && lines.head.contains("\"op\":\"pack\""),
      lines.mkString("\n"))
    assert(TxnLog.currentVersion(spark, table) >= 1L)
    assert(Upsert.readCommitted(spark, table, "source").count() > 0)
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
