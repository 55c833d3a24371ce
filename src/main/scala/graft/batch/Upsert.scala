package graft.batch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.AtomicWrite

/** Partition-granularity MERGE (upsert) for plain-Parquet tables — the
  * stand-in for the `MERGE INTO` the reference would get from Delta
  * (ref `SparkManager.scala:36-37` enables Delta ACID; no Delta jars exist
  * in this environment, see SURVEY.md §2.1).
  *
  * Semantics per key: an update row replaces the existing row with the same
  * key (matched → update), a new key inserts (unmatched → insert), existing
  * rows without an update survive untouched. The unit of rewrite is the
  * PARTITION: only partitions present in `updates` are read or written —
  * sibling partitions are untouched bytes on disk. That is the property that
  * makes the operation delta-scaled at 100 TB: upserting one day into a
  * three-year partitioned table touches ~1/1000th of the data, and the cost
  * is independent of total table size.
  *
  * Each touched partition directory is republished via
  * [[graft.core.AtomicWrite.publish]], so a concurrent reader of the table
  * observes complete-old or complete-new data per partition, never a
  * half-written directory (same crash-safety contract as the batch result
  * store).
  */
object Upsert {

  /** Merge `updates` into the partitioned Parquet table at `table`.
    *
    * @param table    root of a table laid out as `table/<partCol>=<value>/…`
    *                 (written with `.partitionBy(partCol)`)
    * @param updates  new/changed rows; must contain `partCol` and `keyCols`;
    *                 keys must be unique within `updates` (fails fast
    *                 otherwise — ambiguous matched-rows are a silent data
    *                 bug in MERGE implementations)
    * @param partCol  the table's partition column; values are escaped into
    *                 directory names exactly as Spark's `partitionBy` does
    *                 (so timestamps with ':' etc. match the layout on disk);
    *                 null values are refused
    * @param keyCols  match key within a partition
    * @return the touched partition values, for observability
    *
    * Scale notes: the only driver-side materialization is the DISTINCT set
    * of touched partition values (bounded by the partition count of the
    * delta, not by rows). Each partition merge is one distributed job —
    * old-rows anti-join new-keys, union, write — and partitions merge
    * sequentially so the peak footprint is one partition's rewrite; a
    * many-partition backfill would parallelize across jobs instead (or use
    * Spark's `partitionOverwriteMode=dynamic` when atomicity per partition
    * is not required).
    */
  def mergeByKey(
      spark: SparkSession,
      table: String,
      updates: DataFrame,
      partCol: String,
      keyCols: Seq[String]): Seq[String] = {
    require(keyCols.nonEmpty, "mergeByKey needs at least one key column")
    // both sanity probes ride one tiny job: ambiguous matches and null
    // partition values are silent data bugs if they reach the write
    val bad = updates.groupBy(partCol, keyCols: _*)
      .count().filter(col("count") > 1 || col(partCol).isNull).limit(1).collect()
    if (bad.nonEmpty)
      throw new IllegalArgumentException(
        s"updates contain a duplicate key or null $partCol (first: ${bad.head}); " +
          "MERGE matches must be unambiguous and partition values non-null")

    val dataCols = updates.columns.filterNot(_ == partCol).toSeq
    val touched = updates.select(col(partCol).cast("string")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq

    // One materialization of the updates plan: validation, the distinct
    // partition collect, and the per-partition delta/anti-join below would
    // otherwise each re-execute a possibly-expensive upstream computation
    // (2 + 2×partitions replays on a backfill).
    updates.persist()
    try touched.foreach { p =>
      // Spark's partitionBy ESCAPES special chars in directory names
      // (':' → %3A etc.); building the path from the raw value would miss
      // the existing dir, treat the partition as new, and publish a
      // duplicate sibling that readers merge into old-AND-new rows.
      val escaped = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .escapePathName(p)
      val partDir = s"$table/$partCol=$escaped"
      val delta = updates.filter(col(partCol).cast("string") === p)
        .select(dataCols.map(col): _*)
      val existing = existingPartition(spark, partDir, dataCols)
      val merged = existing match {
        case Some(old) =>
          // matched → update wins; join only on keys, so changed non-key
          // columns replace the old values
          old.join(delta.select(keyCols.map(col): _*), keyCols, "left_anti")
            .unionByName(delta)
        case None => delta // brand-new partition: pure insert
      }
      AtomicWrite.publish(spark, partDir) { tmp =>
        merged.write.parquet(tmp)
      }
    } finally updates.unpersist()
    touched
  }

  /** The surviving rows of a partition dir, or None if it does not exist.
    * Read with an explicit column list so a schema drift between table and
    * updates fails loudly in the select, not silently in the union. */
  private def existingPartition(
      spark: SparkSession, partDir: String, dataCols: Seq[String]): Option[DataFrame] = {
    val path = new org.apache.hadoop.fs.Path(partDir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(path)) Some(spark.read.parquet(partDir).select(dataCols.map(col): _*))
    else None
  }
}
