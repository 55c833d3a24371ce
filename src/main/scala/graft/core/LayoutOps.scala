package graft.core

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Data-layout maintenance for Parquet tables at scale.
  *
  * Parquet predicate pushdown prunes ROW GROUPS by their footer min/max
  * statistics — but the statistics only help if the layout gives each row
  * group a TIGHT value range. A table written in arrival order interleaves
  * keys, so every row group's [min,max] spans nearly the whole domain and a
  * selective filter still reads every byte. [[clusterBy]] is the write-side
  * fix (the plain-Parquet analog of Delta's `OPTIMIZE ZORDER BY` for the
  * single-/prefix-key case): range-partition on the cluster key(s), then
  * sort within each partition, so each output file — and each row group
  * inside it — covers a narrow, non-overlapping slice of the key domain. A
  * pushed predicate then skips all but the matching files' row groups, which
  * at 100 TB is the difference between a full scan and touching a handful of
  * files.
  *
  * [[longColumnBounds]] reads the footer statistics back (same metadata the
  * reader's pruning consults), which lets a maintenance job — or LayoutSpec —
  * MEASURE layout quality (bounds overlap across files) instead of assuming
  * it.
  */
object LayoutOps {

  /** Rewrite shape: range-partition by `cols` into `numFiles` output tasks,
    * sorted within each partition. Deterministic output CONTENT; file
    * boundaries come from range-sampling. One shuffle — the same cost class
    * as the OPTIMIZE rewrite it mirrors. */
  def clusterBy(df: DataFrame, cols: Seq[String], numFiles: Int): DataFrame =
    df.repartitionByRange(numFiles, cols.map(col): _*)
      .sortWithinPartitions(cols.map(col): _*)

  /** Shared footer walk: per data file under `dir`, the column's non-null
    * row-group statistics and the row-group count. Footer-only reads —
    * O(files) metadata ops, no data pages touched. */
  private def footerStats(dir: String, column: String)
      : Seq[(String, Seq[org.apache.parquet.column.statistics.Statistics[_]], Int)] = {
    val conf = new Configuration()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    fs.listStatus(root).map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet"))
      .toSeq.sortBy(_.getName)
      .map { p =>
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
        try {
          val blocks = reader.getFooter.getBlocks.asScala.toSeq
          val stats = blocks
            .flatMap(_.getColumns.asScala)
            .filter(_.getPath.toDotString == column)
            .map(_.getStatistics)
            .filter(s => s != null && s.hasNonNullValue)
          require(stats.nonEmpty, s"no footer statistics for $column in $p")
          (p.getName, stats.toSeq, blocks.size)
        } finally reader.close()
      }
  }

  /** Per-file bounds of an integral column:
    * (fileName, min over row groups, max over row groups, rowGroupCount). */
  def longColumnBounds(dir: String, column: String): Seq[(String, Long, Long, Int)] =
    footerStats(dir, column).map { case (name, stats, rowGroups) =>
      (name,
        stats.map(_.genericGetMin.asInstanceOf[Number].longValue()).min,
        stats.map(_.genericGetMax.asInstanceOf[Number].longValue()).max,
        rowGroups)
    }

  /** Fraction of files whose [min,max] intersects [lo,hi] — the fraction of
    * the table a pushed range predicate must actually read. 1.0 = layout
    * gives no pruning; k/n = only k files touched. */
  def scanFraction(bounds: Seq[(String, Long, Long, Int)], lo: Long, hi: Long): Double = {
    require(bounds.nonEmpty, "no files")
    bounds.count { case (_, mn, mx, _) => mx >= lo && mn <= hi }.toDouble / bounds.size
  }

  /** [[longColumnBounds]] for string columns (parquet BINARY/UTF8 stats):
    * (fileName, min, max) per file. */
  def stringColumnBounds(dir: String, column: String): Seq[(String, String, String)] = {
    def str(b: Any) =
      b.asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8
    footerStats(dir, column).map { case (name, stats, _) =>
      (name, stats.map(s => str(s.genericGetMin)).min,
        stats.map(s => str(s.genericGetMax)).max)
    }
  }
}
