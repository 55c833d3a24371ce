package graft

import java.nio.file.Files

import org.scalatest.tagobjects.Slow

import graft.operators.DedupQueries

/** Scale-stress for the dedup pair/cluster path: the same code on a 10×
  * corpus must cost ≲ linearly more wall-clock (LSH is a bucketed
  * equi-join, never all-pairs) and connected components must converge in
  * O(log diameter) rounds at every size (pointer doubling, not plain
  * propagation). Corpora are generated transiently at 1× = 5 000 docs
  * (the sf0.1 shape) and 10× = 50 000 docs with identical duplicate
  * structure, so the ratio isolates scaling from data character.
  *
  * Wall-clock assertions carry deliberate slack (host CPU varies ±50%
  * run-to-run and co-tenant waves distort far more — BASELINE.md); the
  * deterministic assertions (pair-count scaling, round counts) are the
  * primary gate. Measured slope is recorded in BASELINE.md. */
class ScalingStressSpec extends SparkSpec {

  /** Deterministic corpus: every doc is 40 md5-derived tokens; docs with
    * id % 25 == 1 are a near-duplicate of id-1 (one interior token
    * replaced → 3-shingle Jaccard = 35/41 ≈ 0.854, above the 0.8 verify
    * threshold and near-certain under 8-band LSH) — so pair count scales
    * exactly linearly with the corpus. */
  private def gen(n: Long): String = {
    val dir = Files.createTempDirectory(s"stress$n").toString
    spark.range(n).selectExpr(
      "id AS doc_id",
      // base doc: tokens t(i) = md5(base_id:i); near-dup member replaces
      // token 20 with its own marker
      """concat_ws(' ', transform(sequence(0, 39), i ->
           CASE WHEN i = 20 AND id % 25 = 1
                THEN substr(md5(concat('own:', CAST(id AS STRING))), 1, 8)
                ELSE substr(md5(concat(
                       CAST(id - CAST(id % 25 = 1 AS INT) AS STRING), ':',
                       CAST(i AS STRING))), 1, 8) END)) AS text""",
      "'en' AS lang",
      "concat('s', CAST(id % 5 AS STRING)) AS source",
      "CAST(40 * 9 - 1 AS BIGINT) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def timeIt[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** min-of-2 damps (but cannot eliminate) co-tenant interference. */
  private def minTime(body: => Long): (Long, Double) = {
    val (a1, t1) = timeIt(body)
    val (_, t2) = timeIt(body)
    (a1, math.min(t1, t2))
  }

  test("10x corpus: pairs scale linearly, CC rounds stay flat, time ≲ linear", Slow) {
    val dir1 = gen(5000L)
    val dir10 = gen(50000L)

    val (pairs1, tp1) = minTime(DedupQueries.minhashPairs(spark, dir1).count())
    val (pairs10, tp10) = minTime(DedupQueries.minhashPairs(spark, dir10).count())
    // the generator plants exactly n/25 near-dup pairs; LSH+verify must
    // recover them all — and ONLY them (no quadratic bucket blowup)
    assert(pairs1 == 200L, s"1x pairs: $pairs1")
    assert(pairs10 == 2000L, s"10x pairs: $pairs10")

    val (_, tc1) = minTime(DedupQueries.clusters(spark, dir1).count())
    val rounds1 = DedupQueries.lastCcRounds
    val (nClusters10, tc10) = minTime(DedupQueries.clusters(spark, dir10).count())
    val rounds10 = DedupQueries.lastCcRounds
    assert(nClusters10 == 4000L, "2000 pair-clusters x 2 member rows")

    // pointer doubling: rounds must NOT grow with corpus size (components
    // here have diameter 1; propagation depth is O(log d), and d is fixed)
    assert(rounds1 >= 1 && rounds1 <= 6, s"1x rounds: $rounds1")
    assert(rounds10 <= rounds1 + 1, s"rounds grew with corpus size: $rounds1 -> $rounds10")

    // wall-clock: 10x data within ~3x of linear (generous: host variance)
    assert(tp10 / tp1 < 30.0, f"minhashPairs 10x slope ${tp10 / tp1}%.1f")
    assert(tc10 / tc1 < 30.0, f"clusters 10x slope ${tc10 / tc1}%.1f")
    info(f"minhashPairs: 1x ${tp1}%.2f s, 10x ${tp10}%.2f s (x${tp10 / tp1}%.1f); " +
      f"clusters: 1x ${tc1}%.2f s, 10x ${tc10}%.2f s (x${tc10 / tc1}%.1f); " +
      s"cc rounds $rounds1 -> $rounds10")
  }

  test("10x corpus: sharded packing stays ≲ linear and bit-identical to windowed", Slow) {
    import graft.operators.TextQueries
    val dir1 = gen(5000L)
    val dir10 = gen(50000L)

    // a canonical checksum of the full packing output — equality proves the
    // two-phase offsets reproduce the windowed cumulative sum bit-for-bit
    def checksum(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.selectExpr(
        "count(1) AS n",
        "sum(hash(source, seq_id, n_docs, n_full_docs, n_tokens, first_doc, last_doc)) AS h")
        .head()
      (r.getLong(0), r.getLong(1))
    }

    val (win1, tw1) = minTime(checksum(TextQueries.packSequences(spark, dir1))._1)
    val (sh1, ts1) = minTime(checksum(TextQueries.packSequencesSharded(spark, dir1))._1)
    val (win10, tw10) = minTime(checksum(TextQueries.packSequences(spark, dir10))._1)
    val (sh10, ts10) = minTime(checksum(TextQueries.packSequencesSharded(spark, dir10))._1)
    assert(win1 == sh1 && win10 == sh10, "row counts must match between variants")
    assert(checksum(TextQueries.packSequences(spark, dir10)) ==
      checksum(TextQueries.packSequencesSharded(spark, dir10)),
      "sharded offsets must be bit-identical to the windowed cumulative sum at 10x")

    // the sharded variant must scale ≲ linearly (generous 3x-of-linear
    // slack for host variance — the deterministic equality above is the
    // primary gate; the structural argument is that its widest window
    // partition is G=500 docs at ANY corpus size, where the windowed
    // variant's is corpus/5 and grows 10x here)
    assert(ts10 / ts1 < 30.0, f"sharded packing 10x slope ${ts10 / ts1}%.1f")
    info(f"packing 1x: windowed ${tw1}%.2f s vs sharded ${ts1}%.2f s; " +
      f"10x: windowed ${tw10}%.2f s (x${tw10 / tw1}%.1f) vs " +
      f"sharded ${ts10}%.2f s (x${ts10 / ts1}%.1f)")
  }

  /** Deterministic 10× embeddings corpus (the sf0.1 table is 2 000
    * vectors → 10× = 20 000): 64-dim unit-scale floats. The recall
    * evaluation runs on the separable mixture built from it (the
    * `clustered` transform — 10 components), the corpus family the
    * multi-probe configuration is tuned for. */
  private def genEmbeddings(n: Long): String = {
    val dir = Files.createTempDirectory(s"stress-emb$n").toString
    spark.range(n).selectExpr(
      "id AS vec_id",
      "concat('L', CAST(id % 10 AS STRING)) AS label",
      """transform(sequence(0, 63), i ->
           CAST(sin(CAST(id * 64 + i AS DOUBLE)) AS FLOAT)) AS embedding""")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("10x ANN: IVF multi-probe holds recall@5 >= 0.95 at <= 13% scan", Slow) {
    import graft.operators.SimilarityQueries
    val dir10 = genEmbeddings(20000L)
    val n = 20000L
    val (recallDf, cand) = SimilarityQueries.ivfClusteredRecallWith(
      spark, dir10, SimilarityQueries.IvfClusteredNprobe,
      SimilarityQueries.IvfProbeMargin)
    val recalls = recallDf.select("recall_at_5")
      .collect().map(_.getDouble(0))
    assert(recalls.length == 20, s"expected 20 probes: ${recalls.length}")
    val mean = recalls.sum / recalls.length
    val scanned = cand.count()
    val scanFrac = scanned.toDouble / (20.0 * n)
    info(f"10x ANN: mean recall@5 $mean%.3f at ${scanFrac * 100}%.1f%% scan " +
      f"($scanned%d candidates / ${20 * n}%d brute pairs)")
    assert(mean >= 0.95, f"recall@5 degraded at 10x: $mean%.3f")
    // Deterministic measured value on this corpus is 12.02% (recall 1.000);
    // the bound is calibrated with ~1pp headroom above it so the assertion
    // catches a real scan blow-up, not the measurement itself.
    assert(scanFrac <= 0.13, f"scan fraction blew up at 10x: ${scanFrac * 100}%.1f%%")
  }

  test("connected components: chain of depth 2048 converges in O(log d) rounds", Slow) {
    import spark.implicits._
    // a single path graph is the worst case for label propagation: plain
    // min-label needs ~d rounds; pointer doubling must stay ~log2(d)
    val d = 2048
    val chain = (0 until d).map(i => (i.toLong, (i + 1).toLong))
      .toDF("doc_a", "doc_b")
    val cc = DedupQueries.connectedComponents(spark, chain)
    assert(cc.count() == (d + 1).toLong)
    assert(cc.select("cluster").distinct().count() == 1L)
    val rounds = DedupQueries.lastCcRounds
    assert(rounds <= 16, s"chain-$d took $rounds rounds — propagation is not O(log d)")
  }
}
