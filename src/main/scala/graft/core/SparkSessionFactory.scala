package graft.core

import org.apache.spark.sql.SparkSession

/** Engine SparkSession builder (parity: SparkManager.scala:11-54).
  *
  * One session serves streaming + batch concurrently, isolated by FAIR
  * scheduler pools; AQE stays on (default in Spark 4) for runtime re-plan
  * (skew-join split, shuffle coalescing). Shuffle partitions default to the
  * core count locally — on a real cluster set this to ~2-3× total executor
  * cores, or leave AQE's coalescing to trim it from a higher ceiling.
  */
object SparkSessionFactory {

  def create(
      master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
      appName: String = "graft-engine",
      shufflePartitions: Option[Int] = None,
      fairSchedulerXml: Option[String] = None,
      checkpointRoot: Option[String] = None): SparkSession = {
    val cores = Runtime.getRuntime.availableProcessors()
    val b = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", shufflePartitions.getOrElse(cores).toString)
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.streaming.minBatchesToRetain", "100")
      .config("spark.ui.enabled", "false")
    fairSchedulerXml.foreach(b.config("spark.scheduler.allocation.file", _))
    checkpointRoot.foreach(b.config("spark.sql.streaming.checkpointLocation", _))
    // Engine extensions: graft_dot + the interval-range join rewrite rule.
    b.withExtensions(new graft.functions.GraftExtensions)
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
