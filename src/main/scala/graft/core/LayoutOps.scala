package graft.core

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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

  /** Multi-dimensional clustering — the `OPTIMIZE ... ZORDER BY (a, b)`
    * analog (the reference specs ZORDER as a scheduled op over its Delta
    * sink, ref AGENTS.md:1162-1171). [[clusterBy]]'s lexicographic sort
    * gives the SECOND key no locality at all: a predicate on `b` alone
    * intersects every file. Z-ordering interleaves the keys' bits so each
    * output file covers a small hyper-rectangle of the key space, and a
    * single-key predicate on ANY of the keys prunes most files.
    *
    * Per column: values map to their approximate QUANTILE bucket
    * (`2^bitsPerCol` buckets from one `approxQuantile` sketch pass), which
    * makes the curve distribution-robust — skewed domains still spread
    * uniformly across buckets, exactly why Delta Z-orders range-ids rather
    * than raw bytes. Buckets' bits interleave into a single long z-value;
    * the rewrite is then [[clusterBy]] on that derived key (one shuffle).
    * All expression-level (aggregate/shift/or over a literal boundary
    * array): codegen-friendly, no UDF, no window, nothing driver-sized but
    * the `(cols × 2^bitsPerCol)`-entry boundary table.
    *
    * Columns must be numeric, date, or timestamp (dates/timestamps map
    * through their epoch value; nulls take bucket 0 and cluster together).
    * String keys have no rank-preserving cheap numeric image — hashing
    * would destroy the very min/max locality the footer pruning needs — so
    * they are refused; put a string key FIRST in a [[clusterBy]] prefix
    * sort instead. */
  def zOrderBy(
      df: DataFrame, cols: Seq[String], numFiles: Int,
      bitsPerCol: Int = 8): DataFrame = {
    require(cols.size >= 2 && cols.size <= 4,
      s"zOrderBy interleaves 2-4 keys, got ${cols.size} (one key → clusterBy)")
    require(bitsPerCol >= 2 && bitsPerCol <= 12, s"bitsPerCol out of range: $bitsPerCol")
    val numeric = cols.map(c => numericImage(df, c).as(s"_graft_zn_$c"))
    val nBuckets = 1 << bitsPerCol
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val boundaries = df.select(numeric: _*).na.drop(cols.map(c => s"_graft_zn_$c"))
      .stat.approxQuantile(cols.map(c => s"_graft_zn_$c").toArray, probs, 0.001)
    val buckets = cols.indices.map { ci =>
      // Keep DUPLICATED quantile cuts: on a skewed or low-cardinality
      // domain a heavy value repeats across many quantiles, so counting
      // cuts ≤ v gives it a bucket index proportional to its cumulative
      // MASS — each key spreads over the full 2^bits range by rank, the
      // range-partition-id behavior Delta Z-orders on. Distinct-ing the
      // cuts would collapse 90% of the mass into a few low buckets and
      // hand the curve's high bits entirely to the other key.
      bucketOf(numericImage(df, cols(ci)), boundaries(ci).sorted)
    }
    val z = interleave(buckets, cols.size, bitsPerCol)
    clusterBy(df.withColumn("_graft_z", z), Seq("_graft_z"), numFiles)
      .drop("_graft_z")
  }

  /** A rank-preserving numeric image of a column, for quantile bucketing. */
  private def numericImage(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case _: NumericType => col(c).cast(DoubleType)
      case DateType => datediff(col(c), to_date(lit("1970-01-01")))
        .cast(DoubleType)
      case TimestampType | TimestampNTZType =>
        col(c).cast(DoubleType) // epoch seconds
      case other => throw new IllegalArgumentException(
        s"zOrderBy key $c: unsupported type $other (numeric/date/timestamp " +
          "only; string keys belong in a clusterBy prefix)")
    }

  /** Quantile-bucket index of `v` against sorted cut points, as a codegen'd
    * expression: the count of boundaries ≤ v (a literal-array fold, no
    * UDF). Nulls land in bucket 0. */
  private def bucketOf(v: Column, cuts: Array[Double]): Column =
    coalesce(
      aggregate(
        lit(cuts),
        lit(0L),
        (acc, b) => acc + when(v >= b, 1L).otherwise(0L)),
      lit(0L))

  /** Interleave the low `bitsPerCol` bits of each bucket index into one
    * long: bit `i` of column `j` lands at position `i*nCols + j`, the
    * classic Morton/Z curve. */
  private def interleave(buckets: Seq[Column], nCols: Int, bitsPerCol: Int): Column =
    (0 until bitsPerCol).foldLeft(lit(0L)) { (acc, bit) =>
      buckets.zipWithIndex.foldLeft(acc) { case (a, (b, ci)) =>
        a.bitwiseOR(shiftleft(
          shiftright(b, bit).bitwiseAND(lit(1L)), bit * nCols + ci))
      }
    }

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
