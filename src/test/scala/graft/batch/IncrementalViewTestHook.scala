package graft.batch

/** Reaches [[IncrementalView.sync]]'s cursor-vs-spec source check with a
  * mismatch (the public API cannot express one — registration refuses —
  * but a cursor file left by an older deployment could). Lives in the
  * batch package for [[TableMeta]] access; test-only. */
object IncrementalViewTestHook {
  def syncAgainstWrongSource(
      spark: org.apache.spark.sql.SparkSession, view: String, other: String): Unit = {
    // swap the registration's src in place, keeping the cursor: the next
    // sync sees cursor.src != spec.src and must refuse
    val m = TableMeta.read(spark, view, "incview-v")
    TableMeta.write(spark, view, "incview-v", m + ("src" -> other))
    try IncrementalView.sync(spark, view)
    finally TableMeta.write(spark, view, "incview-v", m)
  }
}
