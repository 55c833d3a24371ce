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

  /** Rewrite the cursor as the in-flight record a sync that crashed
    * between its merge and its clean-cursor write would leave behind. */
  def simulateCrashAfterMerge(
      spark: org.apache.spark.sql.SparkSession, view: String, src: String,
      cleanVersion: Long, applyingTo: Long, basis: Long): Unit =
    graft.core.AtomicWrite.replaceFile(spark,
      new org.apache.hadoop.fs.Path(s"$view/_graft_meta/incview_cursor.json"),
      (s"""{"src":${graft.http.Json.quote(src)},"version":$cleanVersion,""" +
        s""""applyingTo":$applyingTo,"basis":$basis}""")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Rewrite the cursor as the pin record a BOOTSTRAP that crashed
    * between its merge and its clean-cursor write would leave behind. */
  def simulateCrashDuringBootstrap(
      spark: org.apache.spark.sql.SparkSession, view: String, src: String,
      bootstrappingTo: Long): Unit =
    graft.core.AtomicWrite.replaceFile(spark,
      new org.apache.hadoop.fs.Path(s"$view/_graft_meta/incview_cursor.json"),
      (s"""{"src":${graft.http.Json.quote(src)},"version":0,""" +
        s""""bootstrappingTo":$bootstrappingTo}""")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
}
