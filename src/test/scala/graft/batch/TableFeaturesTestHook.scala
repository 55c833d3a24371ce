package graft.batch

/** Writes a RAW feature entry the public API cannot (declare refuses
  * names this build does not support) — simulating a table written by a
  * FUTURE build whose feature this one has never heard of. Lives in the
  * batch package for [[TableMeta]] access; test-only. */
object TableFeaturesTestHook {
  def declareRaw(
      spark: org.apache.spark.sql.SparkSession,
      table: String, feature: String, level: String): Unit =
    TableMeta.write(spark, table, "features-v",
      TableMeta.read(spark, table, "features-v") + (feature -> level))
}
