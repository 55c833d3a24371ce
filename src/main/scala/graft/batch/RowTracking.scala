package graft.batch

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Row tracking — the Delta `delta.enableRowTracking` analog (implied by
  * the reference's full-Delta enablement, ref `SparkManager.scala:36-37`):
  * a STABLE per-row id, minted once when the row first enters the table
  * and unchanged for the row's whole life, across every rewrite verb the
  * engine has. It is what lets a CDC consumer correlate an update's
  * pre/post change-feed legs without knowing the table's key columns, and
  * what makes incremental materialized views cheap (the view keys on the
  * row id, not on whatever business key the table happens to use).
  *
  * == Design: a reserved materialized identity column ==
  *
  * Delta tracks rows with per-file base ids plus a materialized column
  * for rows whose position changed. This engine materializes from the
  * start: [[RowIdCol]] (`_graft_row_id`, BIGINT) is a physical column of
  * every data file, registered as `GENERATED ALWAYS AS IDENTITY` — which
  * buys the whole lifecycle from machinery that already exists and is
  * already spec-hammered:
  *
  *   - '''minting''': every [[Upsert.mergeByKey]] assigns ids through
  *     [[IdentityColumns.assign]] — matched keys KEEP their existing id
  *     (an update never reassigns), new rows draw from an OCC-serialized
  *     disjoint range ([[IdentityColumns.allocate]]'s synthetic-partition
  *     commit protocol), so concurrent merges mint unique ids with no
  *     coordinator;
  *   - '''explicit values refused by name''' (the GENERATED ALWAYS
  *     contract) — a producer cannot forge or recycle a row id;
  *   - '''rewrite survival for free''': compaction, Z-order/cluster
  *     layout, and REORG PURGE rewrite whole physical rows, so a
  *     materialized column rides along untouched — no id-remap bookkeeping
  *     per rewrite, which is exactly why materialize-always beats
  *     position-based ids for an engine with this many rewrite verbs;
  *   - '''CDF correlation''': the change feed's pre/post legs are written
  *     from the same physical rows, so an update's delete-leg and
  *     insert-leg carry the SAME row id — join the legs on [[RowIdCol]]
  *     and the update correlates with zero key knowledge;
  *   - '''time travel / RESTORE / CLONE exactness''': retained
  *     generations hold the ids physically; RESTORE re-installs committed
  *     ids verbatim (`keepSuppliedIdentity` — reassignment would break
  *     stability); CLONE copies data and the identity registration plus
  *     high-water mark, so ids persist and a clone's future mints stay
  *     disjoint from everything it copied.
  *
  * Unlike Delta the id is an ordinary (visible) column on read — this
  * engine has no metadata-column layer, and hiding it would cost a
  * projection on every read path for cosmetics; readers that want the
  * business schema drop one well-known column.
  *
  * == Enablement ==
  *
  * [[enable]] on a not-yet-written table just registers (zero cost; the
  * first merge materializes). On a table with data it BACKFILLS: one
  * self-merge of the committed snapshot — the registration makes the
  * merge mint an id for every row, `schema.autoMerge` widens the touched
  * partitions. O(table) once, the same bill Delta's
  * `ALTER TABLE ... SET TBLPROPERTIES (delta.enableRowTracking = true)`
  * backfill pays, and it rides the normal merge path: OCC claims,
  * retained pre-images (pre-enable versions stay exactly readable,
  * without the column), change feed, sidecar refresh. */
object RowTracking {

  /** The reserved row-id column. Physical BIGINT in every data file of a
    * row-tracked table; `GENERATED ALWAYS` — never supplied by writers. */
  val RowIdCol = "_graft_row_id"

  private val FilePrefix = "rowtracking-v"

  /** Whether `table` tracks rows. */
  def isEnabled(spark: SparkSession, table: String): Boolean =
    TableMeta.read(spark, table, FilePrefix).get("enabled").contains("true")

  /** Turn row tracking on. Returns the number of existing rows
    * backfilled with ids (0 when the table has no data yet — the cheap,
    * Delta-normal case: enable at creation, every row ever written gets
    * its id at first insert). */
  def enable(
      spark: SparkSession,
      table: String,
      partCol: String,
      keyCols: Seq[String]): Long = {
    require(!isEnabled(spark, table), s"row tracking is already on for $table")
    // the backfill is a keyed self-merge of the committed snapshot — on a
    // shallow clone that snapshot is partly remote
    ShallowClone.refuseDirect(spark, table, "RowTracking.enable")
    val existing =
      try {
        val df = Upsert.readCommitted(spark, table, partCol)
        if (df.isEmpty) None else Some(df)
      } catch { case _: org.apache.spark.sql.AnalysisException => None }
    existing match {
      case None =>
        // declaration case: IdentityColumns.add handles both "no dir" and
        // "metadata-only dir"; the first merge materializes the column
        IdentityColumns.add(spark, table, RowIdCol)
        TableFeatures.declare(spark, table, TableFeatures.RowTracking)
        TableMeta.write(spark, table, FilePrefix, Map("enabled" -> "true"))
        0L
      case Some(snapshot) =>
        require(!snapshot.columns.contains(RowIdCol),
          s"$table already has a $RowIdCol column but no row-tracking " +
            "registration — refusing to guess whether its values are " +
            "trustworthy row ids; drop or rename the column first")
        require(keyCols.nonEmpty,
          "enabling row tracking on a table with data needs its key " +
            "columns (the backfill is a keyed self-merge)")
        // register FIRST (declare skips the adoption probe — the column
        // does not exist yet), then backfill: merging the committed
        // snapshot onto itself matches every key, so the identity
        // assignment mints one id per existing row and autoMerge widens
        // the partition files with the new column
        IdentityColumns.declare(spark, table, RowIdCol)
        val n = snapshot.count()
        withAutoMerge(spark) {
          Upsert.mergeByKey(spark, table, snapshot, partCol, keyCols)
        }
        TableFeatures.declare(spark, table, TableFeatures.RowTracking)
        TableMeta.write(spark, table, FilePrefix, Map("enabled" -> "true"))
        n
    }
  }

  /** The table with its row-id column dropped — for consumers that want
    * the business schema only. */
  def strip(df: DataFrame): DataFrame = df.drop(RowIdCol)

  private def withAutoMerge[T](spark: SparkSession)(f: => T): T = {
    val key = "graft.schema.autoMerge.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try f
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
