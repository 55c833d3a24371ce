package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.batch.Upsert

/** Materialized training-shard writer — the terminal sink of the text
  * pipeline. [[TextQueries.packSequencesSharded]] REPORTS the
  * concat-and-chunk layout; this verb actually WRITES it: one row per
  * packed sequence carrying the exact L=[[TextQueries.PackLen]]-token
  * payload plus its occupancy manifest (n_docs / n_full_docs / n_tokens /
  * first_doc / last_doc — the same numbers the accounting query emits, so
  * the two are spec-comparable row for row). The destination is a MANAGED
  * table (partitioned by source, keyed by seq_id, written through
  * [[Upsert.mergeByKey]]), so the shards inherit the whole storage
  * surface for free: OCC claims, change feed, time travel, RESTORE,
  * constraints, HTTP serving.
  *
  * 100 TB shape: offsets are the two-phase sharded form (no per-source
  * single-partition window); the payload assembly is one exchange keyed
  * (source, seq_id) — each sequence gathers the ≤2 documents that
  * straddle it (fan-in bounded by docs-per-sequence, never corpus-wide);
  * the merge rewrites only the source partitions the pack touched.
  * Re-packing after corpus growth upserts by (source, seq_id): appended
  * docs extend a source's token stream, so only its tail sequences
  * change — the merge's claim machinery keeps concurrent source packs
  * serialized per partition.
  */
object PackWriter {

  /** Tokens per packed sequence — the published layout constant a
    * consumer of the shard table sizes its reader against. */
  val SeqLen: Int = TextQueries.PackLen

  /** The packed rows: payload + manifest columns, one row per
    * (source, seq_id). Deterministic for a fixed corpus — contributions
    * gather via `array_sort` on their running offset, so assembly order
    * is independent of task scheduling. */
  def packedRows(s: SparkSession, d: String): DataFrame = {
    val L = TextQueries.PackLen
    TextQueries.shardedOffsets(s, d)
      .select(col("source"), col("doc_id"), col("toks"),
        col("start_off"), col("end_off"))
      .withColumn("seq_id",
        explode(expr(s"sequence(start_off DIV $L, (end_off - 1) DIV $L)")))
      .withColumn("lo", greatest(col("start_off"), col("seq_id") * L))
      .withColumn("hi", least(col("end_off"), (col("seq_id") + lit(1L)) * L))
      .withColumn("part", expr(
        "slice(toks, CAST(lo - start_off + 1 AS INT), CAST(hi - lo AS INT))"))
      .groupBy("source", "seq_id")
      .agg(
        expr("flatten(transform(array_sort(collect_list(" +
          "struct(start_off, part))), x -> x.part))").as("toks"),
        count(lit(1)).as("n_docs"),
        sum(when(col("start_off") >= col("seq_id") * L &&
                 col("end_off") <= (col("seq_id") + lit(1L)) * L, 1L)
          .otherwise(0L)).as("n_full_docs"),
        sum(col("hi") - col("lo")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
  }

  /** Pack the corpus at `d` into managed table `table`. Returns the
    * partition values (sources) the merge touched. */
  def write(spark: SparkSession, d: String, table: String): Seq[String] =
    Upsert.mergeByKey(spark, table, packedRows(spark, d),
      "source", Seq("seq_id"))
}
