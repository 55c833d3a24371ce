package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryModule

/** Driver-visible media pipeline queries. The byte-level decode is the
  * deterministic [[MediaOps.StubCodec]] (no codecs in the container), so
  * these have NO DuckDB oracle — the driver records its weaker rows-only
  * check, and the full semantics are asserted in MediaSpec. What the
  * queries prove end-to-end: the binary-column schema contract, the
  * mapPartitions decode/feature batch shape, the frame-sample explode
  * fan-out, and that only small derived columns (never payload bytes)
  * reach the aggregation shuffle. Corpus size scales with the sf dir so
  * the bench tracks media throughput too.
  */
object MediaQueries extends QueryModule {

  /** Deterministic corpus sized from the sf directory's documents table.
    * The sizing count() is memoized per (session, dir) so only the first
    * media query pays it; Long math + clamp before toInt (a count beyond
    * Int range must saturate, not overflow). */
  // Weak session keys: no strong SparkSession reference held across session
  // restarts in a long-lived JVM. Inner map is per-dir.
  private val sizes =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, Map[String, Int]]())
  private def corpus(s: SparkSession, d: String) = {
    val n = sizes.synchronized {
      val m = Option(sizes.get(s)).getOrElse(Map.empty)
      m.getOrElse(d, {
        val v = (graft.core.Tables.documents(s, d).count() / 2)
          .max(300L).min(100000L).toInt
        sizes.put(s, m.updated(d, v))
        v
      })
    }
    MediaOps.syntheticCorpus(s, n)
  }

  /** Decode (stub) + per-kind feature/geometry aggregation. */
  def mediaDecodeStats(s: SparkSession, d: String): DataFrame = {
    val decoded = MediaOps.decodeImages(corpus(s, d)) // filters kind internally
    decoded.groupBy(lit("image").as("kind"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_pixels")).as("total_pixels"),
        min(col("mean_luma")).as("min_luma"),
        max(col("mean_luma")).as("max_luma"),
        countDistinct(col("checksum")).as("distinct_payloads"))
  }

  /** Frame sampling fan-out + per-asset frame counts. */
  def mediaFrameSample(s: SparkSession, d: String): DataFrame = {
    MediaOps.sampleFrames(corpus(s, d), stride = 2) // filters kind internally
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"),
        countDistinct(col("checksum")).as("distinct_frames"))
  }

  /** Feature extraction feeding the similarity surface: 16-dim features,
    * quantized-cosine self-join bounded to a probe set. */
  def mediaFeatureSim(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val feats = MediaOps.extractFeatures(corpus(s, d)).toDF()
      .withColumn("qv", expr(
        "transform(feature, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))"))
      .withColumn("nrm", expr("graft_dot(qv, qv)"))
    val probes = feats.filter(col("media_id") < 20)
    probes.as("a").join(feats.as("b"), col("a.media_id") < col("b.media_id"))
      .withColumn("dot", expr("graft_dot(a.qv, b.qv)"))
      .withColumn("cosine", col("dot").cast("double") /
        (sqrt(col("a.nrm").cast("double")) * sqrt(col("b.nrm").cast("double"))))
      .filter(col("cosine") >= 0.5)
      .groupBy(col("a.media_id").as("probe_id"))
      .agg(count(lit(1)).as("n_similar"), max(col("cosine")).as("best_cosine"))
  }

  val queries: Map[String, Q] = Map(
    "media_decode_stats" -> (mediaDecodeStats _),
    "media_frame_sample" -> (mediaFrameSample _),
    "media_feature_sim" -> (mediaFeatureSim _),
  )

  /** Stub-codec outputs are not expressible in DuckDB SQL → rows-only. */
  val oracleSql: Map[String, String] = Map.empty
}
