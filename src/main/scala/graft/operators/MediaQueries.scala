package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryModule

/** Driver-visible media pipeline queries. The byte-level decode is the
  * deterministic [[MediaOps.StubCodec]] (no codecs in the container), and
  * because the synthetic corpus is pure LCG arithmetic the whole pipeline
  * IS expressible in DuckDB SQL: the oracles below re-derive the payload
  * bytes with HUGEINT mod-2^64 recursion (wrapping 64-bit multiply fits
  * signed 128-bit: s < 2^64, A < 2^63 ⇒ s·A < 2^127) and reproduce
  * luma/checksum/stripe-feature semantics exactly, so all three queries
  * are hash-checked, not rows-only. What the queries prove end-to-end:
  * the binary-column schema contract, the mapPartitions decode/feature
  * batch shape, the frame-sample explode fan-out, and that only small
  * derived columns (never payload bytes) reach the aggregation shuffle.
  * Corpus size scales with the sf dir so the bench tracks media
  * throughput too.
  *
  * Signedness note: Java's `(s >>> 56).toByte` then `b & 0xff` round-trips
  * to the unsigned top byte, so the SQL uses `s // 2^56` directly; the
  * checksum folds stay as unsigned HUGEINT residues because they only ever
  * feed COUNT(DISTINCT …) — signed↔unsigned is a bijection.
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

  /** Resize (downsample to half resolution) then decode — the two
    * mapPartitions stages composed, aggregated like [[mediaDecodeStats]].
    * The oracle replays the same LCG but folds only even-index bytes
    * (StubCodec.downsample keeps every other byte). */
  def mediaResizeStats(s: SparkSession, d: String): DataFrame = {
    val resized = MediaOps.decodeImages(MediaOps.resizeImages(corpus(s, d)))
    resized.groupBy(lit("image").as("kind"))
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

  /** Perceptual-hash image dedup — the cross-modal completion of the
    * text dedup family: dHash every image (plus its deterministic
    * "re-encoded twin", [[MediaOps.dHashes]]), band the 64-bit hash into
    * 4×16-bit keys, equi-join on (band index, band value) — NEVER
    * all-pairs, the same banding economics as `dedup_simhash` — and
    * verify candidates by exact Hamming distance ≤ 6. Random images
    * collide on a band with probability 4·2⁻¹⁶ and then fail the
    * Hamming bar, so the output is the re-encoding pairs plus any true
    * band-collision near-dups, at O(images) join cost. */
  def mediaPhashPairs(s: SparkSession, d: String): DataFrame = {
    val hashes = MediaOps.dHashes(corpus(s, d)).toDF()
    val bands = hashes
      .withColumn("j", explode(expr("sequence(0, 3)")))
      .withColumn("band", expr("(dhash >> (j * 16)) & 65535"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.j") === col("y.j") && col("x.band") === col("y.band") &&
          col("x.img_id") < col("y.img_id"))
      .select(col("x.img_id").as("id_a"), col("y.img_id").as("id_b"),
        col("x.dhash").as("ha"), col("y.dhash").as("hb"))
      .distinct()
    cand.withColumn("hamming", expr("CAST(bit_count(ha ^ hb) AS BIGINT)"))
      .filter(col("hamming") <= 6)
      .select("id_a", "id_b", "hamming")
  }

  val queries: Map[String, Q] = Map(
    "media_phash_pairs" -> (mediaPhashPairs _),
    "media_decode_stats" -> (mediaDecodeStats _),
    "media_resize_stats" -> (mediaResizeStats _),
    "media_frame_sample" -> (mediaFrameSample _),
    "media_feature_sim" -> (mediaFeatureSim _),
  )

  // ----------------------------------------------------------------- oracle

  /** One wrapping-64-bit LCG step (`s` must already be a HUGEINT residue
    * in [0, 2^64)). */
  private def lcgNext(s: String): String =
    s"($s * 6364136223846793005 + 1442695040888963407) % 18446744073709551616"

  /** `id → corpus` params CTE: ids below the documents-derived clamp, with
    * the per-kind payload size and the seed state. `range()` only takes
    * constants, so it generates the clamp maximum and filters. */
  private def paramsCte(kindFilter: String): String =
    s"""params AS (
         SELECT id,
           CASE WHEN id % 3 = 0 THEN ((64 + (id % 4) * 16) * 48) // 16
                WHEN id % 3 = 1 THEN (16000 * (500 + (id % 7) * 100)) // 8000
                ELSE 6144 END AS size,
           ${lcgNext("CAST(id AS HUGEINT)")} AS s0
         FROM range(100000) t(id),
              (SELECT GREATEST(300, LEAST(100000, COUNT(*)//2)) AS n FROM documents) c
         WHERE id < c.n$kindFilter)"""

  val oracleSql: Map[String, String] = Map(
    "media_phash_pairs" ->
      s"""WITH RECURSIVE ${paramsCte(" AND id % 3 = 0")},
         gen(id, k, s) AS (
           SELECT id, -1, s0 FROM params
           UNION ALL
           SELECT id, k + 1, ${lcgNext("s")} FROM gen WHERE k < 71),
         bytes AS (
           SELECT id, k, s // 72057594037927936 AS b FROM gen WHERE k >= 0),
         grads AS (
           SELECT a.id, (a.k // 9) * 8 + (a.k % 9) AS bit, a.b > n.b AS g
           FROM bytes a JOIN bytes n ON n.id = a.id AND n.k = a.k + 1
           WHERE a.k % 9 < 8 AND a.k < 71),
         h0 AS (
           SELECT id,
             CAST(SUM(CASE WHEN g THEN CAST(pow(2, bit) AS HUGEINT)
               ELSE 0 END) AS HUGEINT) AS h,
             MAX(CASE WHEN bit = 0 AND g THEN 1 ELSE 0 END) AS bit0
           FROM grads GROUP BY id),
         hashes AS (
           SELECT id * 2 AS img_id, h FROM h0
           UNION ALL
           SELECT id * 2 + 1, h - bit0 FROM h0),
         bands AS (
           SELECT img_id, h, j,
             (h // CAST(pow(2, j * 16) AS HUGEINT)) % 65536 AS band
           FROM hashes, range(4) t(j)),
         cand AS (
           SELECT DISTINCT x.img_id AS id_a, y.img_id AS id_b,
             x.h AS ha, y.h AS hb
           FROM bands x JOIN bands y
             ON x.j = y.j AND x.band = y.band AND x.img_id < y.img_id)
         SELECT id_a, id_b,
           CAST(bit_count(xor(
             CAST(ha - CASE WHEN ha >= 9223372036854775808 THEN
               18446744073709551616 ELSE 0 END AS BIGINT),
             CAST(hb - CASE WHEN hb >= 9223372036854775808 THEN
               18446744073709551616 ELSE 0 END AS BIGINT))) AS BIGINT) AS hamming
         FROM cand
         WHERE bit_count(xor(
             CAST(ha - CASE WHEN ha >= 9223372036854775808 THEN
               18446744073709551616 ELSE 0 END AS BIGINT),
             CAST(hb - CASE WHEN hb >= 9223372036854775808 THEN
               18446744073709551616 ELSE 0 END AS BIGINT))) <= 6""",
    "media_decode_stats" ->
      s"""WITH RECURSIVE ${paramsCte(" AND id % 3 = 0")},
         gen(id, k, s, h_acc, luma_sum, size) AS (
           SELECT id, -1, s0, CAST(1125899906842597 AS HUGEINT), CAST(0 AS HUGEINT), size FROM params
           UNION ALL
           SELECT id, k + 1, ${lcgNext("s")},
                  (31 * h_acc + ${lcgNext("s")} // 72057594037927936) % 18446744073709551616,
                  luma_sum + ${lcgNext("s")} // 72057594037927936,
                  size
           FROM gen WHERE k < size - 1),
         fin AS (
           SELECT g.id, g.h_acc,
                  CAST(g.luma_sum AS DOUBLE) / CAST(g.size AS DOUBLE) AS mean_luma,
                  (64 + (g.id % 4) * 16) * 48 AS n_pixels
           FROM gen g WHERE g.k = g.size - 1)
         SELECT 'image' AS kind, COUNT(*) AS n,
                CAST(SUM(n_pixels) AS BIGINT) AS total_pixels,
                MIN(mean_luma) AS min_luma, MAX(mean_luma) AS max_luma,
                COUNT(DISTINCT h_acc) AS distinct_payloads
         FROM fin""",
    "media_resize_stats" ->
      s"""WITH RECURSIVE ${paramsCte(" AND id % 3 = 0")},
         gen(id, k, s, h_acc, luma_sum, n_kept, size) AS (
           SELECT id, -1, s0, CAST(1125899906842597 AS HUGEINT), CAST(0 AS HUGEINT), 0, size FROM params
           UNION ALL
           SELECT id, k + 1, ${lcgNext("s")},
                  CASE WHEN (k + 1) % 2 = 0
                       THEN (31 * h_acc + ${lcgNext("s")} // 72057594037927936) % 18446744073709551616
                       ELSE h_acc END,
                  CASE WHEN (k + 1) % 2 = 0
                       THEN luma_sum + ${lcgNext("s")} // 72057594037927936
                       ELSE luma_sum END,
                  n_kept + CASE WHEN (k + 1) % 2 = 0 THEN 1 ELSE 0 END,
                  size
           FROM gen WHERE k < size - 1),
         fin AS (
           SELECT g.id, g.h_acc,
                  CAST(g.luma_sum AS DOUBLE) / CAST(g.n_kept AS DOUBLE) AS mean_luma,
                  ((64 + (g.id % 4) * 16) // 2) * 24 AS n_pixels
           FROM gen g WHERE g.k = g.size - 1)
         SELECT 'image' AS kind, COUNT(*) AS n,
                CAST(SUM(n_pixels) AS BIGINT) AS total_pixels,
                MIN(mean_luma) AS min_luma, MAX(mean_luma) AS max_luma,
                COUNT(DISTINCT h_acc) AS distinct_payloads
         FROM fin""",
    "media_frame_sample" ->
      s"""WITH RECURSIVE ${paramsCte(" AND id % 3 = 2")},
         gen(id, k, s, fh) AS (
           SELECT id, -1, s0, CAST(0 AS HUGEINT) FROM params
           UNION ALL
           SELECT id, k + 1, ${lcgNext("s")},
                  (31 * (CASE WHEN (k + 1) % 768 = 0
                              THEN CAST(1125899906842597 AS HUGEINT) ELSE fh END)
                     + ${lcgNext("s")} // 72057594037927936) % 18446744073709551616
           FROM gen WHERE k < 6143),
         frames AS (
           SELECT id AS media_id, k // 768 AS frame_idx, fh AS checksum
           FROM gen WHERE k % 768 = 767 AND (k // 768) % 2 = 0)
         SELECT media_id, COUNT(*) AS n_frames,
                COUNT(DISTINCT checksum) AS distinct_frames
         FROM frames GROUP BY 1""",
    "media_feature_sim" ->
      s"""WITH RECURSIVE ${paramsCte("")},
         gen(id, k, s, size) AS (
           SELECT id, -1, s0, size FROM params
           UNION ALL
           SELECT id, k + 1, ${lcgNext("s")}, size FROM gen WHERE k < size - 1),
         bytes AS (
           SELECT id, k, s // 72057594037927936 AS b, size // 16 AS stripe
           FROM gen WHERE k >= 0),
         feat AS (
           SELECT id, k // stripe AS i,
                  CAST(CAST((CAST(SUM(b) AS DOUBLE) / CAST(stripe AS DOUBLE)) / 255.0 AS FLOAT) AS DOUBLE) AS f
           FROM bytes WHERE k < 16 * stripe
           GROUP BY id, k // stripe, stripe),
         q AS (SELECT id, i, CAST(FLOOR(f * 1000) AS BIGINT) AS qv FROM feat),
         nrm AS (SELECT id, SUM(qv * qv) AS nrm FROM q GROUP BY id),
         dots AS (
           SELECT a.id AS pa, b.id AS pb, SUM(a.qv * b.qv) AS dot
           FROM q a JOIN q b ON a.i = b.i AND a.id < b.id
           WHERE a.id < 20 GROUP BY 1, 2),
         cs AS (
           SELECT pa, pb,
                  CAST(dot AS DOUBLE) /
                    (SQRT(CAST(na.nrm AS DOUBLE)) * SQRT(CAST(nb.nrm AS DOUBLE))) AS cosine
           FROM dots JOIN nrm na ON na.id = pa JOIN nrm nb ON nb.id = pb)
         SELECT pa AS probe_id, COUNT(*) AS n_similar, MAX(cosine) AS best_cosine
         FROM cs WHERE cosine >= 0.5 GROUP BY 1""",
  )
}
