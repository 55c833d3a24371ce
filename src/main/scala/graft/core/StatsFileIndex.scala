package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan,
  LessThanOrEqual, Literal}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/** TRANSPARENT data skipping — the [[StatsIndex]] sidecars consulted by
  * the planner itself, Delta-style: [[StatsIndex.read]] returns an
  * ordinary DataFrame whose parquet relation carries this [[FileIndex]]
  * wrapper, so ANY pushed-down comparison predicate on an indexed column
  * prunes files at planning time — `df.filter(...)`, SQL over a temp
  * view, subquery predicates — with no special lookup API. This is the
  * idiomatic Spark shape for the feature (Delta implements data skipping
  * exactly here, in its `TahoeFileIndex`): `FileSourceStrategy` hands
  * every scan's partition + data filters to `FileIndex.listFiles`, and
  * this wrapper intersects the data filters with each file's recorded
  * [min,max] interval before the file ever enters the scan.
  *
  * Conservative by construction, like [[StatsIndex.rangeScan]]: only
  * `=`, `<`, `<=`, `>`, `>=` conjuncts comparing an indexed column to a
  * literal prune (strict bounds are treated as inclusive); unsupported
  * shapes, unindexed columns, files the sidecar has never seen, and
  * stats-less files all pass through unpruned. All-null files fail every
  * comparison and are skipped. The files the planner DOES keep still
  * carry the predicate, so parquet row-group pruning fires within them
  * as usual, and Hive partition pruning runs first (the base index
  * handles `partitionFilters` before this wrapper sees the listing).
  *
  * The sidecars are loaded ONCE when [[StatsIndex.read]] constructs the
  * wrapper (KB-scale driver state, same as one `rangeScan` pays); a
  * wrapper over a table that later gained files degrades to scanning the
  * new files — entries key immutable files, unknown files are admitted.
  */
final class StatsFileIndex(
    base: FileIndex,
    /** column → (type tag, sidecar-key → recorded interval) */
    entries: Map[String, (String, Map[String, StatsIndex.Entry])])
  extends FileIndex {

  override def rootPaths: Seq[Path] = base.rootPaths
  override def inputFiles: Array[String] = base.inputFiles
  override def refresh(): Unit = base.refresh()
  override def sizeInBytes: Long = base.sizeInBytes
  override def partitionSchema: StructType = base.partitionSchema
  override def metadataOpsTimeNs: Option[Long] = base.metadataOpsTimeNs

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val listed = base.listFiles(partitionFilters, dataFilters)
    val cs = constraintsFor(dataFilters)
    if (cs.isEmpty) listed
    else listed
      .map(pd => pd.copy(files = pd.files.filter(f => admits(f.getPath, cs))))
      .filter(_.files.nonEmpty)
  }

  /** One indexed column's tightest [lo, hi] implied by the conjuncts
    * (either side optional, values in the sidecar's storage form). */
  private final case class Constraint(
      files: Map[String, StatsIndex.Entry],
      lo: Option[StatsIndex.Bound],
      hi: Option[StatsIndex.Bound])

  /** A catalyst internal literal normalized to the sidecar's storage
    * form. Dates arrive as epoch-day ints and timestamps as epoch-micro
    * longs — exactly the sidecar encoding; strings as UTF8String. None =
    * shape/type we don't prune on (conservative). */
  private def norm(typ: String, v: Any): Option[StatsIndex.Bound] = (typ, v) match {
    case ("long" | "date" | "ts", n: java.lang.Number) =>
      Some(StatsIndex.LBound(n.longValue()))
    case ("double", n: java.lang.Number) =>
      Some(StatsIndex.DBound(n.doubleValue()))
    case ("string", s: UTF8String) => Some(StatsIndex.SBound(s.toString))
    case ("string", s: String)     => Some(StatsIndex.SBound(s))
    case _                         => None
  }

  private def constraintsFor(dataFilters: Seq[Expression]): Seq[Constraint] = {
    // (column, isLowerBound, raw literal) atoms from the conjuncts; an
    // equality contributes both bounds. Strict comparisons relax to
    // inclusive — over-admitting is always safe.
    val atoms: Seq[(String, Boolean, Any)] = dataFilters.flatMap {
      case EqualTo(a: Attribute, Literal(v, _)) if v != null =>
        Seq((a.name, true, v), (a.name, false, v))
      case EqualTo(Literal(v, _), a: Attribute) if v != null =>
        Seq((a.name, true, v), (a.name, false, v))
      case GreaterThan(a: Attribute, Literal(v, _)) if v != null =>
        Seq((a.name, true, v))
      case GreaterThanOrEqual(a: Attribute, Literal(v, _)) if v != null =>
        Seq((a.name, true, v))
      case LessThan(a: Attribute, Literal(v, _)) if v != null =>
        Seq((a.name, false, v))
      case LessThanOrEqual(a: Attribute, Literal(v, _)) if v != null =>
        Seq((a.name, false, v))
      case GreaterThan(Literal(v, _), a: Attribute) if v != null =>
        Seq((a.name, false, v))
      case GreaterThanOrEqual(Literal(v, _), a: Attribute) if v != null =>
        Seq((a.name, false, v))
      case LessThan(Literal(v, _), a: Attribute) if v != null =>
        Seq((a.name, true, v))
      case LessThanOrEqual(Literal(v, _), a: Attribute) if v != null =>
        Seq((a.name, true, v))
      case _ => Nil
    }
    atoms.groupBy(_._1).toSeq.flatMap { case (col, as) =>
      entries.get(col).flatMap { case (typ, files) =>
        val los = as.collect { case (_, true, v) => norm(typ, v) }.flatten
        val his = as.collect { case (_, false, v) => norm(typ, v) }.flatten
        if (los.isEmpty && his.isEmpty) None
        else Some(Constraint(files,
          los.reduceOption((x, y) => if (StatsIndex.cmpBound(x, y) >= 0) x else y),
          his.reduceOption((x, y) => if (StatsIndex.cmpBound(x, y) <= 0) x else y)))
      }
    }
  }

  private def admits(path: Path, cs: Seq[Constraint]): Boolean = {
    val key = StatsIndex.normKey(path.toString)
    cs.forall { c =>
      c.files.get(key) match {
        case None    => true // file newer than the sidecar: scan it
        case Some(e) => StatsIndex.admitsEntry(e, c.lo, c.hi)
      }
    }
  }
}
