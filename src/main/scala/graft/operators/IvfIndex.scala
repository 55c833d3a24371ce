package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted IVF index — the 100 TB shape of [[SimilarityQueries.topkIvf]].
  *
  * The in-query IVF path re-assigns the whole corpus to cells on every
  * probe batch: fine at test scale, but at 100 TB the assignment is a full
  * corpus scan no probe should pay. This index materializes the assignment
  * ONCE as a parquet table PARTITIONED BY CELL (`cell=<cid>/…` dirs — the
  * "bucketed by cell" layout the in-query path's scaladoc promises), plus
  * the trained codebook. A probe batch then:
  *
  *   1. scores its (few) query vectors against the broadcast codebook —
  *      centroid math only, no corpus scan;
  *   2. collects the probed CELL IDS (bounded by the codebook size K,
  *      never by the corpus);
  *   3. reads `cells/` with `cell IN (...)` — Catalyst partition-prunes
  *      the scan to exactly the probed directories (`PartitionFilters` in
  *      the plan), so executor cost is O(candidates), not O(corpus);
  *   4. exact-scores through the same [[SimilarityQueries.ivfProbeTail]]
  *      the in-query path uses — the results are row-identical
  *      (hash-parity is a spec'd contract).
  *
  * Refresh on corpus change = rebuild (the index is a derived snapshot,
  * like any materialized view; the codebook memo's fingerprint logic
  * detects staleness at train time). */
object IvfIndex {

  private def cellsDir(indexDir: String) = s"$indexDir/cells"
  private def codebookDir(indexDir: String) = s"$indexDir/codebook"

  /** Built-index memo, per (session, corpus dir), keyed on the same corpus
    * fingerprint as the codebook memo: an index is built ONCE per corpus
    * state and reused by every probe (the production shape — repeated
    * bench/verify invocations must not each materialize a corpus-sized
    * index copy into /tmp). A corpus rewrite invalidates the entry; the
    * superseded index directory is deleted when replaced. */
  private val built =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, Map[String, (String, String)]]())

  /** The memoized index directory for the corpus at `d`, building (and
    * retiring any stale predecessor) if absent or out of date. */
  def ensureBuilt(s: SparkSession, d: String): String = built.synchronized {
    val fp = SimilarityQueries.corpusFingerprint(s, d)
    val m = Option(built.get(s)).getOrElse(Map.empty)
    m.get(d) match {
      case Some((oldFp, dir)) if oldFp == fp => dir
      case stale =>
        val dir = java.nio.file.Files.createTempDirectory("graft-ivf-index").toString
        build(s, d, dir)
        stale.foreach { case (_, old) =>
          val p = new org.apache.hadoop.fs.Path(old)
          scala.util.Try(
            p.getFileSystem(s.sessionState.newHadoopConf()).delete(p, true))
        }
        built.put(s, m.updated(d, (fp, dir)))
        dir
    }
  }

  /** Train (or reuse the memoized) codebook for the corpus at `d` and
    * materialize the cell assignment under `indexDir`. Returns the number
    * of distinct cells written. */
  def build(s: SparkSession, d: String, indexDir: String): Long = {
    val rows = SimilarityQueries.codebookRows(s, d)
    val cent = broadcast(SimilarityQueries.centroidsDf(s, rows))
    val q = SimilarityQueries.quantized(s, d)
    val wAssign = Window.partitionBy(col("a.vec_id")).orderBy(desc("ccos"), col("cid"))
    val assign = q.as("a").join(cent)
      .withColumn("cdot", expr("graft_dot(a.qv, cqv)"))
      .withColumn("ccos", col("cdot").cast("double") /
        (sqrt(col("a.nrm").cast("double")) * sqrt(col("cnrm").cast("double"))))
      .withColumn("crk", row_number().over(wAssign))
      .filter(col("crk") === 1)
      .select(col("a.vec_id").as("vec_id"), col("cid").as("cell"),
        col("a.qv").as("qv"), col("a.nrm").as("nrm"))
    assign.write.mode("overwrite").partitionBy("cell").parquet(cellsDir(indexDir))
    import s.implicits._
    s.createDataset(rows).toDF("cid", "cqv")
      .coalesce(1).write.mode("overwrite").parquet(codebookDir(indexDir))
    s.read.parquet(cellsDir(indexDir)).select("cell").distinct().count()
  }

  /** Top-5 ANN over the persisted index: row-identical with
    * [[SimilarityQueries.topkIvf]] on the same corpus (same codebook, same
    * nprobe + boundary margin, same exact-scoring tail). */
  def topk(s: SparkSession, d: String, indexDir: String): DataFrame =
    probed(s, d, indexDir)._1

  /** (top-5, pruned assignment read) — the second element exposes the
    * partition-pruned scan for plan probes. */
  private[graft] def probed(
      s: SparkSession, d: String, indexDir: String): (DataFrame, DataFrame) = {
    val rows = s.read.parquet(codebookDir(indexDir))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toSeq.sortBy(_._1)
    val cent = broadcast(SimilarityQueries.centroidsDf(s, rows))
    // probe scoring: query vectors only — K×probes centroid dots, no corpus
    val probes = SimilarityQueries.quantized(s, d).filter(col("vec_id") < 20)
    val wAssign = Window.partitionBy(col("a.vec_id")).orderBy(desc("ccos"), col("cid"))
    val wBest = Window.partitionBy(col("a.vec_id"))
    val probeCells = probes.as("a").join(cent)
      .withColumn("cdot", expr("graft_dot(a.qv, cqv)"))
      .withColumn("ccos", col("cdot").cast("double") /
        (sqrt(col("a.nrm").cast("double")) * sqrt(col("cnrm").cast("double"))))
      .withColumn("crk", row_number().over(wAssign))
      .withColumn("cbest", max("ccos").over(wBest))
      .filter(col("crk") <= SimilarityQueries.IvfNprobe ||
        col("ccos") >= col("cbest") - lit(SimilarityQueries.IvfProbeMargin))
      .select(col("a.vec_id").as("query_id"), col("cid").as("cell"),
        col("a.qv").as("pqv"), col("a.nrm").as("pnrm"))
    // probed cell ids: bounded by K (codebook size), NEVER corpus-sized —
    // this is the one collect, and it is what turns the index read into a
    // partition-pruned scan of only the probed cell directories
    val cellIds = probeCells.select("cell").distinct()
      .collect().map(_.getLong(0)).sorted
    val prunedAssign = s.read.parquet(cellsDir(indexDir))
      .filter(col("cell").isin(cellIds.map(Long.box): _*))
      .select(col("vec_id"), col("cell").cast("long").as("cell"),
        col("qv"), col("nrm"))
    val (top, _) = SimilarityQueries.ivfProbeTail(probeCells, prunedAssign)
    (top, prunedAssign)
  }
}
