package graft

import graft.operators.TextQueries

/** Branch coverage for the language-ID precedence chain — the corpus is
  * all-ASCII synthetic English, so zh/de/fr/es branches only execute here. */
class TextSpec extends SparkSpec {

  private def docsDf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text").cast("long"))
      .withColumn("toks", TextQueries.toks($"text"))
  }

  test("language-ID: charset and stopword branches") {
    import spark.implicits._
    val d = docsDf(
      1L -> "这是一个中文测试文档 数据处理 引擎",          // CJK → zh
      2L -> "der hund und die katze ist nicht da",         // de markers
      3L -> "le chat et la maison est une idee",           // fr markers
      4L -> "el perro y los gatos es una casa",            // es markers
      5L -> "the quick fox and a dog of the farm",         // en markers
      6L -> "xyzzy plugh quux")                            // no markers → en
    val got = TextQueries.withPredictedLang(d)
      .select("doc_id", "predicted_lang").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "zh", 2L -> "de", 3L -> "fr", 4L -> "es",
      5L -> "en", 6L -> "en"))
  }

  test("predicted-lang tie precedence: de beats fr on equal votes") {
    val d = docsDf(1L -> "und le")
    val got = TextQueries.withPredictedLang(d)
      .select("predicted_lang").head().getString(0)
    assert(got == "de")
  }

  test("sequence packing: exact-fill and straddling documents") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("packdocs").toString
    def doc(id: Long, src: String, n: Int) =
      (id, Seq.fill(n)("w").mkString(" "), "en", src, n.toLong)
    // s1: doc1 fills sequence 0 EXACTLY (boundary: full, not straddling);
    //     doc2 lands wholly in sequence 1.
    // s2: doc3 [0,200) + doc4 [200,400) — doc4 straddles the 256 cut.
    Seq(doc(1, "s1", 256), doc(2, "s1", 100), doc(3, "s2", 200), doc(4, "s2", 200))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextQueries.packSequences(spark, dir)
      .select("source", "seq_id", "n_docs", "n_full_docs", "n_tokens")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("s1", 0L, 1L, 1L, 256L),
      ("s1", 1L, 1L, 1L, 100L),
      ("s2", 0L, 2L, 1L, 256L),
      ("s2", 1L, 1L, 0L, 144L)), s"got $got")
  }

  test("sharded two-phase packing offsets equal the windowed offsets") {
    // groups of 500 doc_ids with bases joined back must reproduce the
    // per-source global running offsets bit-for-bit — packing is
    // associative over group boundaries. Real corpus (sf0.001) so group
    // boundaries genuinely split sources mid-stream.
    val d = "/root/testdata/sf0.001"
    val cols = Seq("source", "seq_id", "n_docs", "n_full_docs", "n_tokens",
      "first_doc", "last_doc")
    val windowed = TextQueries.packSequences(spark, d)
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    val sharded = TextQueries.packSequencesSharded(spark, d)
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    assert(windowed.nonEmpty && sharded == windowed)
  }

  test("PII redaction: scrub is complete and hits every injected class") {
    val d = "/root/testdata/sf0.001"
    val rows = TextQueries.redactPii(spark, d).collect()
    assert(rows.nonEmpty)
    // residual_pii re-counts every pattern on the redacted text — a
    // single surviving match anywhere fails here, not in production
    assert(rows.forall(_.getAs[Long]("residual_pii") == 0L))
    assert(rows.map(_.getAs[Long]("pii_docs")).sum > 0)
    assert(rows.map(_.getAs[Long]("n_emails")).sum > 0)
    assert(rows.map(_.getAs[Long]("n_ips")).sum > 0)
    assert(rows.map(_.getAs[Long]("n_phones")).sum > 0)
  }

  test("quality: single-token and all-duplicate docs stay finite") {
    val d = docsDf(1L -> "word", 2L -> "dup dup dup dup")
    val rows = TextQueries.withQuality(d)
      .select("doc_id", "uniq_ratio", "quality_score").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(rows(1L)._1 == 1.0 && !rows(1L)._2.isNaN)
    assert(rows(2L)._1 == 0.25 && !rows(2L)._2.isNaN)
  }

  test("span dedup: first occurrence wins in (doc_id, span_idx) order") {
    // 8-token spans; doc 1 and doc 2 share an identical first span, doc 2's
    // copy must be the dropped one. Doc 3 is a 3-token partial span, unique.
    val shared = "a b c d e f g h"
    val d = docsDf(
      1L -> (shared + " i j k l m n o p"), // spans: shared + unique → keeps 2
      2L -> (shared + " q r s t u v w x"), // spans: shared(dup) + unique → keeps 1
      3L -> "y z zz")                      // one partial span, unique → keeps 1
    val got = TextQueries.spanDedupOf(d)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_spans"), r.getAs[Long]("n_kept"),
          r.getAs[Long]("n_dropped"), r.getAs[Double]("kept_frac"))))
      .toMap
    assert(got(1L) == ((2L, 2L, 0L, 1.0)))
    assert(got(2L) == ((2L, 1L, 1L, 0.5)))
    assert(got(3L) == ((1L, 1L, 0L, 1.0)))
  }

  test("exact-substring dedup: planted duplicate covered exactly, " +
      "interval union merges overlapping windows") {
    import org.apache.spark.sql.functions._
    // doc 1 and doc 2 share a planted 10-token run (in different token
    // positions); L=8 stride-1 windows inside the run duplicate, nothing
    // else does. Coverage per doc must be exactly the 10 shared tokens:
    // three dup windows at starts s, s+1, s+2 union to 8 + 1 + 1.
    val run = "p q r s t u v w x y" // 10 planted tokens
    val d = docsDf(
      1L -> (run + " alpha beta gamma delta"),
      2L -> ("one two three " + run),
      3L -> "lone doc with no repeats at all here now")
      .withColumn("source",
        when(col("doc_id") === 1L, lit("srcA")).otherwise(lit("srcB")))
    import spark.implicits._
    val got = TextQueries.exactSubstrOf(d)
      .select("source", "n_docs", "tokens", "dup_docs", "dup_tokens",
        "dup_windows", "dup_frac")
      .as[(String, Long, Long, Long, Long, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    // srcA: doc 1 alone — 14 tokens, 10 duplicated by 3 windows
    assert(got("srcA") == (("srcA", 1L, 14L, 1L, 10L, 3L, 10.0 / 14.0)))
    // srcB: doc 2 (13 tokens, same 10 covered) + doc 3 (9 tokens, clean)
    assert(got("srcB") == (("srcB", 2L, 22L, 1L, 10L, 3L, 10.0 / 22.0)))
  }

  test("exact-substring CUT keeps the first occurrence: the canonical doc " +
      "loses nothing, the later copy loses exactly the planted run") {
    import org.apache.spark.sql.functions._
    val run = "p q r s t u v w x y" // 10 planted tokens
    val d = docsDf(
      1L -> (run + " alpha beta gamma delta"),
      2L -> ("one two three " + run),
      3L -> "lone doc with no repeats at all here now")
      .withColumn("source",
        when(col("doc_id") === 1L, lit("srcA")).otherwise(lit("srcB")))
    import spark.implicits._
    val got = TextQueries.exactSubstrCutOf(d)
      .select("source", "n_docs", "tokens", "docs_affected", "cut_windows",
        "cut_tokens", "kept_tokens", "kept_frac")
      .as[(String, Long, Long, Long, Long, Long, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    // doc 1 holds the canonical (first) occurrences — srcA loses nothing
    assert(got("srcA") == (("srcA", 1L, 14L, 0L, 0L, 0L, 14L, 1.0)))
    // doc 2's three dup windows are all rank-2 — its 10 run tokens cut
    assert(got("srcB") == (("srcB", 2L, 22L, 1L, 3L, 10L, 12L, 12.0 / 22.0)))
  }

  test("BPE training: hand-checked champions, overlap counting, greedy " +
      "apply, lexicographic tie-break") {
    import spark.implicits._
    // frequencies: "data" ×3, "date" ×2, "aaaa" ×1, "Ab" (non-[a-z]) ×1
    val words = (Seq.fill(3)("data") ++ Seq.fill(2)("date") ++
      Seq("aaaa", "Ab")).toDF("w")
    val learned = TextQueries.trainMergesOf(words)
    // round 1 pair counts: (d,a)=5, (a,t)=5, (t,a)=3, (t,e)=2, (a,a)=3
    // (overlaps: aaaa contributes three (a,a) pairs); tie at 5 between
    // (a,t) and (d,a) breaks lexicographically → (a,t)
    assert(learned.head == ((1, "a", "t", 5L)), s"${learned.head}")
    // round 2: data=|d|at|a|, date=|d|at|e| → (d,at)=5 wins over (a,a)=3
    assert(learned(1) == ((2, "d", "at", 5L)), s"${learned(1)}")
    // round 3: (dat,a)=3 vs (a,a)=3 vs (dat,e)=2 → tie breaks to (a,a).
    // The delimited replace consumes the shared '|', so |a|a|a|a| folds
    // to |aa|a|a| (one merge) — BOTH engines scan-after-match the same
    // way, which is what the oracle pins
    assert(learned(2) == ((3, "a", "a", 3L)), s"${learned(2)}")
    // round 4: (dat,a)=3 wins over (aa,a)=1, (a,a)=1, (dat,e)=2
    assert(learned(3) == ((4, "dat", "a", 3L)), s"${learned(3)}")
    // the trained table then drives the counting plumbing end-to-end:
    // ranks are contiguous from 1 and counts never increase between the
    // first rounds of a shrinking vocabulary
    assert(learned.map(_._1) == (1 to learned.size))
  }

  test("RAG chunking: window/stride boundary math and duplicate-chunk accounting") {
    import org.apache.spark.sql.functions._
    // chunk policy W=64 S=48: n=64 → 1 chunk; n=65 → 2 (the second covers
    // tokens 49..65, clen 17); n=112 → 2 exactly (49..112 fills chunk 2);
    // n=113 → 3 (97..113, clen 16). Tokens per doc distinct so only the
    // deliberate copy (docs 10/11) collides.
    def words(id: Long, n: Int): String =
      (0 until n).map(j => s"t${id}x$j").mkString(" ")
    val d = docsDf(
      1L -> words(1, 64), 2L -> words(2, 65),
      3L -> words(3, 112), 4L -> words(4, 113),
      10L -> words(10, 64), 11L -> words(10, 64)) // exact copies: dup chunks
      .withColumn("source", when(col("doc_id") >= 10L, "dup").otherwise("base"))
    import spark.implicits._
    val got = TextQueries.ragChunksOf(d)
      .select("source", "n_docs", "n_chunks", "chunk_tokens", "doc_tokens",
        "dup_chunks", "overlap_frac")
      .as[(String, Long, Long, Long, Long, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    // base: chunks 1+2+2+3 = 8; chunk tokens 64 + (64+17) + (64+64) + (64+64+17)
    assert(got("base") == (("base", 4L, 8L, 418L, 354L, 0L,
      (418.0 - 354.0) / 418.0)))
    // dup: two identical 1-chunk docs → both chunks are global duplicates
    assert(got("dup") == (("dup", 2L, 2L, 128L, 128L, 2L, 0.0)))
  }

  test("duplicate trigram mass: hand-computed fractions and short-doc drop") {
    val d = docsDf(
      1L -> "a b a b a b a", // trigrams aba×3, bab×2 → all 5 duplicated
      2L -> "p q r s t",     // 3 distinct trigrams → dup_mass 0
      3L -> "x y")           // <3 tokens → no trigram rows at all
    val got = TextQueries.dupNgramFracOf(d)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_trigrams"), r.getAs[Long]("dup_mass"),
          r.getAs[Double]("dup_frac"))))
      .toMap
    assert(got(1L) == ((5L, 5L, 1.0)))
    assert(got(2L) == ((3L, 0L, 0.0)))
    assert(!got.contains(3L))
  }
}
