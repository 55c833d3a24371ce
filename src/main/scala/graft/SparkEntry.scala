package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** All query modules contributing to the declared operator inventory
    * (SURVEY.md §2). Key collisions are a bug: fail fast at class-init. */
  private val modules: Seq[QueryModule] = Seq(
    operators.RelationalQueries,
    operators.ExtendedQueries,
    operators.TemporalJoinQueries,
    operators.SqlQueries,
    operators.AnalyticsQueries,
    operators.EventQueries,
    operators.TextQueries,
    operators.DedupQueries,
    operators.SimilarityQueries,
    operators.MediaQueries,
    operators.PackWriter,
    operators.WidenQueries,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.RelationalQueries.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = modules.flatMap(_.queries.toSeq)
    require(all.map(_._1).distinct.size == all.size,
      s"duplicate query names across modules")
    all.toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  val oracleSql: Map[String, String] = {
    val all = modules.flatMap(_.oracleSql.toSeq)
    val unknown = all.map(_._1).toSet -- queries.keySet
    require(unknown.isEmpty, s"oracleSql without query impl: $unknown")
    all.toMap
  }
}
