package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryModule
import graft.core.Tables

/** Text-analysis operators for a large-scale training-data pipeline, over the
  * `documents` table: tokenization, token-class counting (BPE-ish regex),
  * language identification (charset + stopword-vote heuristic), quality
  * scoring (length/stopword/uniqueness ratios), and document fingerprinting
  * (normalized-text digest).
  *
  * Everything is built from codegen'd built-in functions (split /
  * higher-order `filter` / `regexp_count` / `md5`) — no UDFs — so the whole
  * pipeline stays inside WholeStageCodegen and scales linearly with
  * documents: per-doc work is embarrassingly parallel, aggregations are
  * algebraic partial+final. At 100 TB the only shuffles are the final
  * group-bys over small key spaces (lang, bucket, ngram).
  *
  * Design note: every operator is expressed ONCE in Spark and ONCE as
  * equivalent DuckDB SQL, and the hash-compare proves both agree — i.e. the
  * heuristics are deterministic functions of the text, not model calls.
  */
object TextQueries extends QueryModule {

  /** Whitespace tokens of the trimmed text. */
  def toks(c: Column): Column = split(trim(c), "\\s+")

  private def docs(s: SparkSession, d: String): DataFrame = {
    val raw = Tables.documents(s, d)
    // A small corpus arrives as a single-row-group parquet file → ONE scan
    // partition, serializing tokenize/explode/regex work on one core (same
    // fix as DedupQueries.docs). No-op at real scale where the scan already
    // has ≥ parallelism partitions.
    val par = s.sparkContext.defaultParallelism
    val wide = if (raw.rdd.getNumPartitions < par) raw.repartition(par) else raw
    wide.withColumn("toks", toks(col("text")))
  }

  private def inSet(lambdaVar: String, words: Seq[String]): String =
    words.map(w => s"$lambdaVar = '$w'").mkString(" OR ")

  /** Count of tokens belonging to a marker set (higher-order filter — no
    * explode, no shuffle). */
  private def markerCount(words: Seq[String]): Column =
    expr(s"size(filter(toks, t -> ${inSet("t", words)}))")

  private val enWords = Seq("the", "a", "of", "and", "to", "in", "is")
  private val deWords = Seq("der", "die", "das", "und", "ist", "nicht")
  private val frWords = Seq("le", "la", "les", "et", "est", "une")
  private val esWords = Seq("el", "los", "las", "y", "es", "una")

  /** Language-ID heuristic: CJK/non-ASCII charset ratio first, then
    * stopword votes with a deterministic precedence chain. Returns the
    * input plus `predicted_lang`. */
  def withPredictedLang(df: DataFrame): DataFrame =
    df.withColumn("nonascii", regexp_count(col("text"), lit("[^\\x00-\\x7F]")))
      .withColumn("v_en", markerCount(enWords))
      .withColumn("v_de", markerCount(deWords))
      .withColumn("v_fr", markerCount(frWords))
      .withColumn("v_es", markerCount(esWords))
      .withColumn("predicted_lang",
        when(col("nonascii").cast("double") / col("n_chars").cast("double") > 0.3, "zh")
          .when(col("v_de") > col("v_en") && col("v_de") >= col("v_fr") && col("v_de") >= col("v_es"), "de")
          .when(col("v_fr") > col("v_en") && col("v_fr") >= col("v_es"), "fr")
          .when(col("v_es") > col("v_en"), "es")
          .otherwise("en"))

  /** Per-document quality score from deterministic ratios. */
  def withQuality(df: DataFrame): DataFrame =
    df.withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_uniq", size(array_distinct(col("toks"))).cast("long"))
      .withColumn("uniq_ratio",
        col("n_uniq").cast("double") / col("n_tokens").cast("double"))
      .withColumn("stop_ratio",
        markerCount(enWords).cast("double") / col("n_tokens").cast("double"))
      .withColumn("avg_token_len",
        length(regexp_replace(col("text"), "\\s+", "")).cast("double") /
          col("n_tokens").cast("double"))
      .withColumn("quality_score",
        col("uniq_ratio") * 0.5 + col("stop_ratio") * 0.3 +
          least(col("avg_token_len") / 10.0, lit(1.0)) * 0.2)

  // ---------------------------------------------------------------- queries

  /** Token statistics per (labeled) language. */
  def tokenStats(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("n_tokens")).cast("double") / count(lit(1)).cast("double") as "avg_tokens_per_doc",
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"))

  /** Confusion matrix of labeled vs predicted language. */
  def langConfusion(s: SparkSession, d: String): DataFrame =
    withPredictedLang(docs(s, d))
      .groupBy("lang", "predicted_lang")
      .agg(count(lit(1)).as("n"))

  /** Per-document quality metrics (the per-doc map stage of a corpus
    * filter; at scale this is a pure projection — no shuffle). */
  def quality(s: SparkSession, d: String): DataFrame =
    withQuality(docs(s, d))
      .select("doc_id", "n_tokens", "n_uniq", "uniq_ratio", "stop_ratio",
        "avg_token_len", "quality_score")

  /** Normalized-text digest fingerprint + 256-way bucket histogram check:
    * emits per-doc md5 so exact-dup detection joins on it. */
  def fingerprint(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .withColumn("norm", regexp_replace(lower(trim(col("text"))), "\\s+", " "))
      .select(
        col("doc_id"),
        md5(col("norm")).as("fingerprint"),
        substring(md5(col("norm")), 1, 2).as("bucket"))

  /** Top-20 word trigrams (deterministic tiebreak on the ngram text).
    * Trigram construction is the native [[graft.functions.Ngrams3]] (r21,
    * guide §4) — same space-joined trigrams in the same order, one
    * compiled pass instead of an interpreted transform lambda. */
  def ngramTop(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    docs(s, d)
      .withColumn("ngram", explode(expr("graft_ngrams3(toks)")))
      .groupBy("ngram")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("ngram"))
      .limit(20)
  }

  /** BPE-ish token-class counting via regex: word / number / symbol runs per
    * source. */
  def tokenClasses(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .groupBy("source")
      .agg(
        sum(regexp_count(col("text"), lit("[a-z]+")).cast("long")).as("word_runs"),
        sum(regexp_count(col("text"), lit("[0-9]+")).cast("long")).as("number_runs"),
        sum(regexp_count(col("text"), lit("[^a-z0-9\\s]")).cast("long")).as("symbol_chars"),
        count(lit(1)).as("n_docs"))

  /** TF-IDF-style top terms: term frequency per doc × corpus rarity weight
    * (tf · N/df), top 3 terms per probe doc. The damping log() of classic
    * tf-idf is swapped for the exact rational weight N/df so the score is a
    * deterministic function of integer counts in both engines (libm log
    * could differ in the last ulp and flip near-tie rankings). Corpus stats
    * (df, N) come from the FULL corpus; only the ranked output is bounded
    * to the probe set — the incremental-scoring shape at 100 TB. Ties break
    * on the term itself, so the ranking is total and reproducible. */
  def tfidfTop(s: SparkSession, d: String): DataFrame = {
    val tf = docs(s, d)
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // N = plain document count — taken from the raw table, NOT from a second
    // docs() pipeline, which would re-run the tokenize+repartition stage
    // (the whole corpus scanned twice). A bare count over parquet is served
    // from footer row counts; tokenization happens exactly once (in `tf`).
    val total = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(desc("score"), col("term"))
    tf.filter(col("doc_id") < 30)
      .join(dfreq, "term")
      .crossJoin(total)
      .withColumn("score",
        col("tf").cast("double") * col("n_docs").cast("double") / col("df").cast("double"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk").cast("long").as("rk"),
        col("term"), col("tf"), col("df"), col("score"))
  }

  /** Gopher-style repetition filters (Rae et al. 2021, §A1.1 public filter
    * suite): per document, the mass of its most frequent word bigram and the
    * count of immediately-repeated tokens — the two signals that catch
    * boilerplate/looping text that length and stopword ratios miss. Pure
    * per-doc map + one (doc_id, bigram) count shuffle whose key space is
    * bounded by corpus vocabulary; scales linearly. */
  def repetition(s: SparkSession, d: String): DataFrame = {
    // every stat derives from the (doc_id, bigram) counts — ONE tokenize
    // scan, ONE exchange on doc_id (both Windows share it), no self-join:
    // n_bigrams = Σn, adjacent-dup mass = Σn over bigrams whose halves are
    // equal (tokens are whitespace-split, so the split is unambiguous)
    graft.functions.GraftFunctions.register(s)
    val grams = docs(s, d)
      .withColumn("bigram", explode(expr("graft_ngrams(toks, 2)")))
      .groupBy("doc_id", "bigram").agg(count(lit(1)).as("n"))
    val wdoc = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    val wtop = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(desc("n"), col("bigram"))
    val isAdjDup =
      element_at(split(col("bigram"), " "), 1) === element_at(split(col("bigram"), " "), 2)
    grams
      .withColumn("n_bigrams", sum("n").over(wdoc))
      .withColumn("n_adj_dup", sum(when(isAdjDup, col("n")).otherwise(0L)).over(wdoc))
      .withColumn("rk", row_number().over(wtop))
      .filter(col("rk") === 1)
      .select(
        col("doc_id"), col("n_bigrams"),
        col("bigram").as("top_bigram"), col("n").as("top_bigram_n"),
        (col("n").cast("double") / col("n_bigrams").cast("double")).as("top_bigram_frac"),
        col("n_adj_dup"),
        (col("n_adj_dup").cast("double") / col("n_bigrams").cast("double")).as("adj_dup_frac"))
  }

  /** Corpus-wide span dedup accounting (the C4 "three-sentence span" /
    * Dolma paragraph dedup, at this corpus's deterministic unit: consecutive
    * non-overlapping 8-token spans, trailing partial kept). Every span keeps
    * its FIRST occurrence in (doc_id, span_idx) order; the report is
    * per-document retention — how much of each doc survives global dedup.
    * One exchange keyed on the span string (key space bounded by distinct
    * corpus content — the dedup target itself), then a per-doc rollup;
    * never all-pairs, linear at 100 TB like the decontamination scan. */
  def spanDedup(s: SparkSession, d: String): DataFrame =
    spanDedupOf(docs(s, d))

  /** Core of [[spanDedup]] over any (doc_id, toks) frame (unit-testable). */
  def spanDedupOf(docsDf: DataFrame): DataFrame = {
    val spans = docsDf
      .select(col("doc_id"), posexplode(expr(
        """transform(sequence(0, (size(toks) + 7) div 8 - 1),
                     i -> concat_ws(' ', slice(toks, i*8+1, 8)))""")))
      .toDF("doc_id", "span_idx", "span")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("span").orderBy("doc_id", "span_idx")
    spans.withColumn("rk", row_number().over(w))
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("rk") === 1, 1L).otherwise(0L)).as("n_kept"))
      .select(col("doc_id"), col("n_spans"), col("n_kept"),
        (col("n_spans") - col("n_kept")).as("n_dropped"),
        (col("n_kept").cast("double") / col("n_spans").cast("double"))
          .as("kept_frac"))
  }

  /** Gopher's duplicate n-gram mass (Rae et al. 2021 §A1.1) at n=3: per
    * document, the fraction of trigram OCCURRENCES whose trigram appears
    * more than once in that document — the loop/boilerplate signal the
    * top-bigram statistic ([[repetition]]) misses when the repeated mass
    * is spread over many distinct grams. Same scale shape as repetition:
    * one (doc_id, trigram) count shuffle, vocabulary-bounded. */
  def dupNgramFrac(s: SparkSession, d: String): DataFrame =
    dupNgramFracOf(docs(s, d))

  /** Core of [[dupNgramFrac]] over any (doc_id, toks) frame. */
  def dupNgramFracOf(docsDf: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docsDf.sparkSession)
    docsDf
      .withColumn("tri", explode(expr("graft_ngrams3(toks)")))
      .groupBy("doc_id", "tri").agg(count(lit(1)).as("n"))
      .groupBy("doc_id").agg(
        sum("n").as("n_trigrams"),
        sum(when(col("n") > 1, col("n")).otherwise(0L)).as("dup_mass"))
      .select(col("doc_id"), col("n_trigrams"), col("dup_mass"),
        (col("dup_mass").cast("double") / col("n_trigrams").cast("double"))
          .as("dup_frac"))
  }

  /** Benchmark decontamination scan (the public 13-gram protocol of
    * GPT-3/PaLM appendix C, at 8 tokens for this corpus's ~55-token docs):
    * treat docs 0-9 as the held-out eval set, report the 20 most
    * contaminated training docs by distinct-shingle overlap. The probe
    * shingle set is tiny → broadcast; the corpus side is an equi-join on
    * the shingle string — never all-pairs, so the scan is linear at 100 TB
    * with the eval set as the build side. */
  def contamination(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    // shingling is the native stride-1 k-gram expression (r21, guide §4);
    // same 8-grams in the same order as the transform/slice lambda
    val sh = docs(s, d)
      .withColumn("sh",
        explode(expr("array_distinct(graft_ngrams(toks, 8))")))
      .select(col("doc_id"), col("sh"))
    val probes = sh.filter(col("doc_id") < 10).select("sh").distinct()
    val corpus = sh.filter(col("doc_id") >= 10)
    // ONE corpus shingle pass (r21, guide §1.2): the old shape ran the
    // shingle explode twice (a per-doc total branch + an inner-join hit
    // branch, then joined the two O(docs) aggregates). probes is distinct,
    // so the LEFT broadcast join matches each corpus shingle at most once
    // — count(hit) ≡ the old inner-join count, row-identical.
    corpus.join(broadcast(probes.withColumn("hit", lit(1))), Seq("sh"), "left")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_shingles"),
        count(col("hit")).as("n_cont"))
      .select(
        col("doc_id"), col("n_shingles"),
        col("n_cont").as("n_contaminated"),
        (col("n_cont").cast("double") /
          col("n_shingles").cast("double")).as("contamination_rate"))
      .orderBy(desc("contamination_rate"), col("doc_id"))
      .limit(20)
  }

  /** Training-sequence packing (concat-and-chunk, the layout step between a
    * cleaned corpus and a training run): within each source shard, documents
    * are concatenated in doc_id order and the token stream is cut into
    * fixed-length sequences of L=256. Emits per-sequence occupancy stats —
    * how many documents touch the sequence, how many sit fully inside it,
    * and the exact token count it holds (the last sequence of a shard may be
    * partial). All integer math on running offsets, so Spark and DuckDB
    * agree bit-for-bit.
    *
    * Scale shape: the running offset is a cumulative sum windowed PER
    * SOURCE, so shards pack in parallel; at 100 TB you'd sub-shard a large
    * source (pack per (source, file-group)) or compute offsets two-phase
    * (per-partition totals broadcast as bases) — packing is associative over
    * shard boundaries, nothing here requires a global order. The explode
    * fan-out is ≤ 2 rows per document for any L larger than a typical doc. */
  def packSequences(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
    val withOffsets = packSized(s, d)
      .withColumn("end_off", sum("n_tokens").over(w))
      .withColumn("start_off", col("end_off") - col("n_tokens"))
    packTail(withOffsets)
  }

  /** Two-phase packing offsets — IDENTICAL output to [[packSequences]]
    * (same oracle SQL), computed the way a 100 TB source actually must be:
    * docs are grouped into contiguous doc_id ranges (the file-group
    * analog), phase 1 aggregates one token total per group and turns them
    * into per-group BASE offsets with a window over the group list (tiny:
    * one row per group, not per doc), phase 2 computes running offsets
    * WITHIN each group in parallel and adds the base. The per-source
    * single-partition window over all docs — the one scale hazard of the
    * windowed version — is gone; packing is associative over group
    * boundaries, so the offsets (and every downstream sequence) are
    * bit-identical. */
  def packSequencesSharded(s: SparkSession, d: String): DataFrame =
    packTail(shardedOffsets(s, d))

  /** The two-phase running offsets (with toks still aboard) — shared by
    * the accounting query and [[PackWriter]]'s materializing write. */
  private[operators] def shardedOffsets(s: SparkSession, d: String): DataFrame =
    shardedOffsetsOf(packSized(s, d))

  /** [[shardedOffsets]] over any (source, doc_id, toks, n_tokens) frame —
    * [[PackWriter.sync]] runs it over the change feed's appended docs. */
  private[operators] def shardedOffsetsOf(sized: DataFrame): DataFrame = {
    val G = 500 // docs per offset group; at scale ≈ one parquet file-group
    val base = sized.withColumn("grp", expr(s"doc_id DIV $G"))
    // phase 1: one row per (source, group) → base offsets; the window runs
    // over the GROUP list (corpus_size / G rows), broadcastable metadata
    val wg = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("grp")
    val bases = base.groupBy("source", "grp")
      .agg(sum("n_tokens").as("grp_tokens"))
      .withColumn("base_off", sum("grp_tokens").over(wg) - col("grp_tokens"))
      .select("source", "grp", "base_off")
    // phase 2: per-group local running offsets, shifted by the group base —
    // windows partitioned by (source, grp) parallelize across groups
    val wl = org.apache.spark.sql.expressions.Window
      .partitionBy("source", "grp").orderBy("doc_id")
    base.join(broadcast(bases), Seq("source", "grp"))
      .withColumn("end_off", col("base_off") + sum("n_tokens").over(wl))
      .withColumn("start_off", col("end_off") - col("n_tokens"))
  }

  /** (source, doc_id, n_tokens, toks…) of the packable docs. Zero-token
    * guard: sequence(a, b) DESCENDS when b < a (an empty doc would
    * fabricate phantom seq_ids); DuckDB's range() returns empty. Neither
    * is wanted — an empty doc contributes to no sequence. */
  private def packSized(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .filter(col("n_tokens") > 0)

  /** Cut the running offsets into L=256-token sequences and aggregate
    * per-sequence occupancy — shared by both offset computations. */
  /** Packed-sequence length; [[PackWriter]] writes payloads at the same L
    * so the written shards and the accounting report describe the SAME
    * layout. */
  private[operators] val PackLen = 256

  private def packTail(withOffsets: DataFrame): DataFrame = {
    val L = PackLen
    withOffsets
      .withColumn("seq_id",
        explode(expr(s"sequence(start_off DIV $L, (end_off - 1) DIV $L)")))
      .groupBy(col("source"), col("seq_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("start_off") >= col("seq_id") * L &&
                 col("end_off") <= (col("seq_id") + 1) * L, 1L).otherwise(0L))
          .as("n_full_docs"),
        sum(least(col("end_off"), (col("seq_id") + 1) * L) -
            greatest(col("start_off"), col("seq_id") * L)).as("n_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
  }

  /** Weighted source mixing: sample each source at the rate that hits a
    * TARGET token share inside an overall token budget (here: equal 1/5
    * share per source of a half-corpus budget) — the mixing step that turns
    * cleaned shards into a training corpus with chosen domain proportions.
    * Rates are data-dependent (derived in-plan from per-source token totals
    * — no driver round trip) and the accept/reject decision is a
    * deterministic 16-bit md5 threshold per doc, so the sample is stable
    * across engines, runs, AND cluster sizes (hash-based, not RNG-based:
    * adding executors cannot change the sample). Over-weighted small
    * sources cap at rate 1.0 (can't up-sample what isn't there — reported,
    * not silently re-normalized). One agg + one broadcast-size join; the
    * per-doc accept is a pure projection. */
  def sourceMix(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d).withColumn("n_tokens", size(col("toks")).cast("long"))
    val totals = base.groupBy("source").agg(sum("n_tokens").as("tok_s"))
    val grand = totals.agg(sum("tok_s").as("tok_total"))
    // rate_s = min(1, share * budget_frac * T / tok_s), share=0.2 budget=0.5
    val rated = totals.crossJoin(grand)
      .withColumn("rate", least(lit(1.0),
        (lit(0.1) * col("tok_total").cast("double")) / col("tok_s").cast("double")))
      .withColumn("threshold", floor(col("rate") * 65536.0).cast("long"))
    val hash16 = conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
      .cast("long")
    base.join(broadcast(rated), "source")
      .withColumn("keep", hash16 < col("threshold"))
      .groupBy(col("source"), col("tok_s"), col("rate"))
      .agg(
        sum(when(col("keep"), 1L).otherwise(0L)).as("kept_docs"),
        sum(when(col("keep"), col("n_tokens")).otherwise(0L)).as("kept_tokens"))
  }

  /** The composed corpus-cleaning pipeline a training-data user actually
    * runs, end-to-end in one plan: quality-score filter (≥ 0.35 ≈ drops
    * the worse half of this corpus) → exact dedup on the normalized-text
    * fingerprint (keep the lowest doc_id per fingerprint) → per-language
    * survivor stats. Shuffles once on fingerprint (dedup) and
    * once on the tiny lang key; the quality/lang/fingerprint map stage is
    * pure projection. The per-lang quality mass is reported as an exact
    * integer sum of micro-quantized scores (floor(q·1e6)) — averaging the
    * raw doubles would be accumulation-order dependent. */
  def cleanPipeline(s: SparkSession, d: String): DataFrame = {
    val base = withQuality(docs(s, d))
      .withColumn("fingerprint",
        md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")))
      .filter(col("quality_score") >= 0.35)
    val keep = base.groupBy("fingerprint").agg(min(col("doc_id")).as("doc_id"))
    base.join(keep, Seq("fingerprint", "doc_id"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(floor(col("quality_score") * 1e6)).cast("long").as("quality_micro_sum"))
  }

  // --- PII redaction (the scrub stage every public training-data
  // pipeline documents: C4 removes lines with "bad words"/boilerplate,
  // Dolma and FineWeb regex-scrub emails, phone numbers, and IP
  // addresses before training). Patterns restricted to syntax with
  // IDENTICAL semantics in Java regex (Spark codegen) and RE2 (the
  // DuckDB oracle): character classes, bounded repetition, \b — no
  // lookaround, no backreferences.
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private val PhoneRe = "\\b\\d{3}-\\d{4}\\b"

  /** PII redaction over the corpus. The synthetic corpus carries no PII
    * (zero digits), so the query first INJECTS deterministic PII derived
    * from `doc_id` — the oracle replays the same injection, making the
    * cross-engine check exercise the actual redaction semantics instead
    * of vacuously agreeing on zero matches. Everything up to the final
    * per-source rollup is codegen'd string expressions on the scan — no
    * UDF, no shuffle, linear in corpus bytes, which is the property that
    * matters at 100 TB (the rollup shuffles |sources| rows).
    * `residual_pii` re-counts every pattern on the redacted text and must
    * be 0: the scrub is PROVEN complete, not assumed. */
  def redactPii(s: SparkSession, d: String): DataFrame = {
    val dirty = concat(
      col("text"),
      when(col("doc_id") % 3 === 0, concat(
        lit(" reach user"), col("doc_id").cast("string"),
        lit("@mail.example.com"))).otherwise(lit("")),
      when(col("doc_id") % 5 === 0, concat(
        lit(" call 555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"))).otherwise(lit("")),
      when(col("doc_id") % 7 === 0, concat(
        lit(" from 10."), (col("doc_id") % 200).cast("string"), lit("."),
        ((col("doc_id") * 3) % 250).cast("string"), lit("."),
        (col("doc_id") % 250).cast("string"))).otherwise(lit("")))
    // email first: the local part holds digits the looser numeric
    // patterns must never see half-redacted
    val redacted = regexp_replace(
      regexp_replace(
        regexp_replace(dirty, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")
    docs(s, d)
      .withColumn("dirty", dirty)
      .withColumn("redacted", redacted)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("dirty") =!= col("redacted"), 1L).otherwise(0L)).as("pii_docs"),
        sum(regexp_count(col("dirty"), lit(EmailRe))).as("n_emails"),
        sum(regexp_count(col("dirty"), lit(Ipv4Re))).as("n_ips"),
        sum(regexp_count(col("dirty"), lit(PhoneRe))).as("n_phones"),
        (sum(regexp_count(col("redacted"), lit(EmailRe))) +
          sum(regexp_count(col("redacted"), lit(Ipv4Re))) +
          sum(regexp_count(col("redacted"), lit(PhoneRe)))).as("residual_pii"),
        countDistinct(md5(col("redacted"))).as("distinct_redacted"),
        min(md5(col("redacted"))).as("sample_hash"))
  }

  /** Length-bucketed batching accounting — the padding-waste budget of
    * inference/training batching: group documents into power-of-2 token
    * buckets (the standard bucketed-batching scheme; every doc in a batch
    * pads to the bucket's capacity), report per bucket how many tokens are
    * real vs padding. The whole computation is one scan + one
    * |buckets|-row aggregation — `ceil(log2(n))` via integer bit math, no
    * UDF — so at 100 TB the cost is the corpus read. `pad_ratio` is the
    * number a pipeline owner actually tunes bucket boundaries against. */
  def lengthBuckets(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .withColumn("n_toks", size(col("toks")).cast("long"))
      .filter(col("n_toks") > 0)
      .withColumn("cap", expr(capCaseSql))
      .groupBy("cap")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("real_tokens"),
        (sum(col("cap")) - sum(col("n_toks"))).as("pad_tokens"),
        ((sum(col("cap")) - sum(col("n_toks"))).cast("double") /
          sum(col("cap")).cast("double")).as("pad_ratio"))

  /** Power-of-2 bucket capacities, 16 … 2^24. The capacity expression is
    * an exact integer CASE chain shared verbatim with the oracle —
    * `2^ceil(log2(n))` float math rounds differently across engines at
    * exact powers (log2(8) can land a hair above 3.0), and a one-bucket
    * disagreement is a hash mismatch. Docs beyond the last bucket keep
    * their own length as capacity (pad 0) — at that size you batch alone
    * anyway. */
  private val capCaseSql: String =
    "CAST(CASE " +
      (4 to 24).map(b => s"WHEN n_toks <= ${1L << b} THEN ${1L << b}")
        .mkString(" ") +
      " ELSE n_toks END AS BIGINT)"

  // --- Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
  // Methods, Analysis & Insights from Training Gopher", Appendix A —
  // the published rule set C4/MassiveText-style pipelines filter on).
  // Thresholds are the paper's: word count ∈ [50, 100k], mean word length
  // ∈ [3, 10], symbol-to-word ratio (# or …) ≤ 0.1, ≥ 80% of words carry
  // an alphabetic character, ≥ 2 designated stop words present. The stop
  // LIST is a parameter of the rule: Gopher's canonical eight is
  // (the, be, to, of, and, that, have, with); the declared query
  // instantiates it with this synthetic corpus's two function words so
  // the rule discriminates here instead of vacuously rejecting everything
  // (the corpus vocabulary contains no 'of'/'and'/'to').
  private val gopherStops = Seq("the", "a")

  /** Per-source Gopher-rule loss report: how many documents each rule
    * rejects, how many survive all five. The per-doc stage is pure
    * codegen'd projection (higher-order `filter`, `regexp_count`,
    * `array_contains` — no UDF, no explode), so at 100 TB the cost is the
    * corpus scan; the only shuffle is the |sources|-row rollup. Per-rule
    * FAIL counts (not a single pass flag) are what a pipeline owner needs
    * to tune thresholds — they name which rule eats the corpus. */
  def gopherRules(s: SparkSession, d: String): DataFrame = {
    val flagged = docs(s, d)
      .withColumn("n_toks", size(col("toks")).cast("long"))
      .filter(col("n_toks") > 0)
      .withColumn("mean_wl",
        length(regexp_replace(col("text"), "\\s+", "")).cast("double") /
          col("n_toks").cast("double"))
      .withColumn("sym_ratio",
        (regexp_count(col("text"), lit("#")) +
          regexp_count(col("text"), lit("\\.\\.\\."))).cast("double") /
          col("n_toks").cast("double"))
      .withColumn("alpha_frac",
        expr("size(filter(toks, t -> t rlike '[A-Za-z]'))").cast("double") /
          col("n_toks").cast("double"))
      .withColumn("stop_hits",
        gopherStops.map(w =>
          when(array_contains(col("toks"), w), 1).otherwise(0))
          .reduce(_ + _))
      .withColumn("f_wc", col("n_toks") < 50 || col("n_toks") > 100000)
      .withColumn("f_mwl", col("mean_wl") < 3.0 || col("mean_wl") > 10.0)
      .withColumn("f_sym", col("sym_ratio") > 0.1)
      .withColumn("f_alpha", col("alpha_frac") < 0.8)
      .withColumn("f_stop", col("stop_hits") < 2)
    def fails(c: String) = sum(when(col(c), 1L).otherwise(0L))
    flagged.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      fails("f_wc").as("fail_word_count"),
      fails("f_mwl").as("fail_mean_word_len"),
      fails("f_sym").as("fail_symbol_ratio"),
      fails("f_alpha").as("fail_alpha_words"),
      fails("f_stop").as("fail_stop_words"),
      sum(when(!col("f_wc") && !col("f_mwl") && !col("f_sym") &&
        !col("f_alpha") && !col("f_stop"), 1L).otherwise(0L)).as("n_pass"),
      (sum(when(!col("f_wc") && !col("f_mwl") && !col("f_sym") &&
        !col("f_alpha") && !col("f_stop"), 1L).otherwise(0L)).cast("double") /
        count(lit(1)).cast("double")).as("pass_frac"))
  }

  // --- RAG chunking: fixed-size overlapping token windows (the standard
  // retrieval-corpus preparation — e.g. LangChain/LlamaIndex defaults),
  // window 64 tokens, stride 48 (16-token overlap).
  private val ChunkW = 64
  private val ChunkS = 48

  /** Chunking accounting for a retrieval corpus: per source, how many
    * chunks the window/stride policy yields, the token amplification the
    * overlap costs (`overlap_frac`), and how many of the source's chunks
    * are GLOBAL duplicates (`dup_chunks` — the chunk's fingerprint occurs
    * more than once corpus-wide; cross-doc and cross-source boilerplate
    * lands here, and every duplicate chunk is a wasted encoder call in
    * the embedding budget). Chunk count per doc: 1 if n ≤ W, else
    * 1 + ceil((n-W)/S) — exact integer arithmetic shared verbatim with
    * the oracle. The explode amplifies rows by ~n/S per doc (a constant
    * factor ≈ W/S of the corpus), all narrow-dependency; the shuffles are
    * the fingerprint-frequency groupBy + join (both partial+final over
    * 16-byte hashes, the exact-dedup shape that scales to 100 TB) and the
    * |sources|-row rollup. */
  def ragChunks(s: SparkSession, d: String): DataFrame =
    ragChunksOf(docs(s, d))

  /** Frame-level form (needs `doc_id`, `source`, `toks`) for edge-case
    * specs on hand-built corpora. */
  private[graft] def ragChunksOf(docsDf: DataFrame): DataFrame = {
    val chunks = docsDf
      .withColumn("n_toks", size(col("toks")).cast("long"))
      .filter(col("n_toks") > 0)
      .withColumn("n_chunks",
        when(col("n_toks") <= ChunkW, 1L).otherwise(expr(
          s"1 + CAST((n_toks - ${ChunkW - ChunkS + 1}) DIV $ChunkS AS BIGINT)")))
      .withColumn("c", explode(expr(
        s"""transform(sequence(0, CAST(n_chunks - 1 AS INT)),
              i -> struct(
                i AS ci,
                md5(concat_ws(' ', slice(toks, i*$ChunkS + 1, $ChunkW))) AS h,
                least(CAST($ChunkW AS BIGINT), n_toks - i*$ChunkS) AS clen))""")))
      .select(col("source"), col("doc_id"), col("n_toks"),
        col("c.ci").as("ci"), col("c.h").as("h"), col("c.clen").as("clen"))
    val freq = chunks.groupBy("h").agg(count(lit(1)).as("freq"))
    chunks.join(freq, "h")
      .groupBy("source").agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_chunks"),
        sum(col("clen")).as("chunk_tokens"),
        // doc token mass counted once per doc (on its first chunk), so the
        // overlap amplification is measurable in one aggregation
        sum(when(col("ci") === 0, col("n_toks")).otherwise(0L)).as("doc_tokens"),
        sum(when(col("freq") > 1, 1L).otherwise(0L)).as("dup_chunks"),
        ((sum(col("clen")) -
          sum(when(col("ci") === 0, col("n_toks")).otherwise(0L))).cast("double") /
          sum(col("clen")).cast("double")).as("overlap_frac"))
  }

  // --- Token-budget data selection: the curation step between scoring
  // and training ("fill each source's token budget with its best
  // documents") — the greedy quality-ranked form of data selection
  // (the shape behind quality-filtered mixes in C4/FineWeb-style
  // pipelines and budget-constrained selection generally).
  private val BudgetFrac = 0.6

  /** Per-source token-budget selection: rank documents by quality
    * (deterministic doc_id tiebreak), keep in rank order while the
    * cumulative token count stays within [[BudgetFrac]] of the source's
    * token mass, report what survived and the effective quality floor
    * (min kept quality, micro-quantized — the number that tells a
    * pipeline owner what bar the budget actually bought). One shuffle:
    * the running sum and the per-source total are windows over the SAME
    * source partitioning, and the rollup reuses it. At 100 TB the
    * per-source sort is the only super-linear step — and it sorts doc
    * STATS (id, tokens, score), never text. */
  def budgetSelect(s: SparkSession, d: String): DataFrame = {
    val base = withQuality(docs(s, d)).filter(col("n_tokens") > 0)
    val wRank = Window.partitionBy("source")
      .orderBy(desc("quality_score"), col("doc_id"))
    val wAll = Window.partitionBy("source")
    val flagged = base
      .withColumn("cum_tokens", sum(col("n_tokens")).over(
        wRank.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total_tokens", sum(col("n_tokens")).over(wAll))
      .withColumn("keep", col("cum_tokens").cast("double") <=
        col("total_tokens").cast("double") * BudgetFrac)
    flagged.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      max(col("total_tokens")).as("total_tokens"),
      sum(when(col("keep"), 1L).otherwise(0L)).as("kept_docs"),
      sum(when(col("keep"), col("n_tokens")).otherwise(0L)).as("kept_tokens"),
      (sum(when(col("keep"), col("n_tokens")).otherwise(0L)).cast("double") /
        max(col("total_tokens")).cast("double")).as("kept_frac"),
      min(when(col("keep"), floor(col("quality_score") * 1e6)))
        .cast("long").as("quality_floor_micro"))
  }

  /** Epoch planning under a token budget — the data-constrained scaling
    * recipe (Muennighoff et al. 2023: repeating a source up to ~4 epochs
    * is nearly as good as fresh data; beyond that returns decay): give
    * every source an equal share of a budget of half the corpus's
    * tokens, and report how many passes (epochs, capped at 4) each
    * source needs to fill its share, the tokens it can actually
    * contribute, and the shortfall where even 4 epochs fall short. All
    * integer arithmetic on exact token counts (the ceil rides the
    * engines' shared IEEE division on exact operands); one
    * |sources|-row aggregate + a window total — nothing corpus-sized
    * moves. */
  def mixEpochs(s: SparkSession, d: String): DataFrame =
    epochsOver(docs(s, d).filter(size(col("toks")) > 0)
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(size(col("toks")).cast("long")).as("tokens")))

  /** Tokenizer-true epoch planning: [[mixEpochs]] run on BPE subword
    * counts, the whitespace-form epochs joined back — where the two
    * accountings disagree, the whitespace plan repeats a source the
    * wrong number of times. One corpus pass computes both token sums
    * ([[mixUnimaxBpe]]'s discipline); everything downstream is
    * |sources|-row metadata. */
  def mixEpochsBpe(s: SparkSession, d: String): DataFrame = {
    val per = docs(s, d).filter(size(col("toks")) > 0)
      .withColumn("n_bpe", expr(bpeDocCount))
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(size(col("toks")).cast("long")).as("tokens_ws"),
        sum(col("n_bpe")).as("tokens_bpe"))
      .cache() // |sources| rows; feeds both plans
    val bpe = epochsOver(per.select(col("source"), col("n_docs"),
      col("tokens_bpe").as("tokens")))
    val ws = epochsOver(per.select(col("source"), col("n_docs"),
        col("tokens_ws").as("tokens")))
      .select(col("source"), col("tokens").as("tokens_ws"),
        col("epochs").as("epochs_ws"))
    bpe.select(col("source"), col("n_docs"),
        col("tokens").as("tokens_bpe"), col("target_tokens"),
        col("epochs"), col("effective_tokens"), col("shortfall"))
      .join(ws, Seq("source"))
      .withColumn("epochs_delta", col("epochs") - col("epochs_ws"))
  }

  /** The Muennighoff epoch plan over any (source, n_docs, tokens) frame —
    * shared by the whitespace and tokenizer-true forms. */
  private def epochsOver(perSource: DataFrame): DataFrame = {
    val wAll = Window.partitionBy()
    perSource
      .withColumn("total_tokens", sum("tokens").over(wAll))
      .withColumn("n_sources", count(lit(1)).over(wAll))
      .withColumn("target_tokens",
        floor(col("total_tokens").cast("double") / lit(2.0) /
          col("n_sources").cast("double")).cast("long"))
      .withColumn("epochs",
        least(lit(4L), floor(
          (col("target_tokens") + col("tokens") - lit(1L)).cast("double") /
            col("tokens").cast("double")).cast("long")))
      .withColumn("effective_tokens",
        least(col("target_tokens"), col("epochs") * col("tokens")))
      .withColumn("shortfall", col("target_tokens") - col("effective_tokens"))
      .select("source", "n_docs", "tokens", "target_tokens", "epochs",
        "effective_tokens", "shortfall")
  }

  /** UniMax epoch cap (the paper's N; 4 matches [[mixEpochs]]' cap so the
    * two recipes read against the same repetition bar). */
  private val UniMaxCap = 4L

  /** UniMax sampling (Chung et al. 2023, "UniMax: Fairer and More
    * Effective Language Sampling for Large-Scale Multilingual
    * Pretraining"): allocate a total training budget UNIFORMLY across
    * sources, each capped at [[UniMaxCap]] epochs of its own data — the
    * published fix for temperature sampling's twin failure modes (head
    * sources starve the tail at low T; tail sources over-epoch at high
    * T). Where [[mixEpochs]] computes epochs for a GIVEN per-source
    * target, UniMax computes the mix itself.
    *
    * Closed-form integer water-filling: with sources sorted by capacity
    * (`tokens × cap`) ascending, the capped set is the LONGEST PREFIX
    * where `cap_i × (sources remaining at i) ≤ budget − caps already
    * taken` (once that fails it fails for every later source — caps
    * ascending make the inequality absorbing), and every uncapped source
    * takes the equal integer share of what remains. The comparison is
    * cross-MULTIPLIED (never divided) and runs in DECIMAL(38,0) /
    * HUGEINT, so both engines agree bit-for-bit at any token scale; the
    * reported per-source epochs are q16 fixed point.
    *
    * 100 TB shape: one map-side-combined |sources|-row aggregate; the
    * only unpartitioned windows run over that metadata-sized frame (the
    * [[mixEpochs]]/[[dsirSelect]] discipline — never a doc-grained
    * frame). Budget = total_tokens/2, the mixEpochs target discipline. */
  def mixUnimax(s: SparkSession, d: String): DataFrame =
    unimaxOver(docs(s, d).filter(size(col("toks")) > 0)
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(size(col("toks")).cast("long")).as("tokens")))
      .select("source", "n_docs", "tokens", "cap_tokens", "capped",
        "alloc_tokens", "epochs_q16")

  /** The closed-form integer water-filling over any (source, n_docs,
    * tokens) frame — shared by [[mixUnimax]] (whitespace tokens) and
    * [[mixUnimaxBpe]] (subword tokens). Returns the input columns plus
    * cap_tokens/capped/alloc_tokens/epochs_q16. */
  private def unimaxOver(perSource: DataFrame): DataFrame = {
    val wAll = Window.partitionBy()
    val byCap = Window.orderBy(col("cap_tokens"), col("source"))
    val runByCap = byCap.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perSource
      .withColumn("cap_tokens", col("tokens") * lit(UniMaxCap))
      .withColumn("total_tokens", sum("tokens").over(wAll))
      .withColumn("m", count(lit(1)).over(wAll))
      .withColumn("budget", expr("total_tokens DIV 2"))
      .withColumn("i", row_number().over(byCap).cast("long"))
      .withColumn("prefix_cap", sum("cap_tokens").over(runByCap))
      .withColumn("cond",
        col("cap_tokens").cast("decimal(38,0)") *
          (col("m") - col("i") + lit(1L)).cast("decimal(38,0)") <=
          (col("budget") - col("prefix_cap") + col("cap_tokens"))
            .cast("decimal(38,0)"))
      .withColumn("capped",
        min(col("cond").cast("int")).over(runByCap) === 1)
      .withColumn("k", sum(col("capped").cast("long")).over(wAll))
      .withColumn("capped_sum",
        sum(when(col("capped"), col("cap_tokens")).otherwise(lit(0L)))
          .over(wAll))
      .withColumn("alloc_tokens",
        when(col("capped"), col("cap_tokens"))
          .when(col("m") === col("k"), lit(0L))
          .otherwise(expr("(budget - capped_sum) DIV (m - k)")))
      // the *65536 rides DECIMAL(38,0) (oracle: HUGEINT) — a BIGINT
      // multiply would wrap silently past ~1.4e14 alloc tokens, the one
      // place the scaladoc's any-token-scale claim could break
      .withColumn("epochs_q16", expr(
        "CAST((CAST(alloc_tokens AS DECIMAL(38,0)) * 65536) DIV tokens AS BIGINT)"))
      .select("source", "n_docs", "tokens", "cap_tokens", "capped",
        "alloc_tokens", "epochs_q16")
  }

  // --- DSIR importance resampling (Xie et al. 2023, "Data Selection for
  // Language Models via Importance Resampling"): estimate target and raw
  // distributions over HASHED n-gram features, weight every raw document
  // by its target/raw log-likelihood ratio, keep the top fraction. This
  // is the published data-selection method that complements
  // [[budgetSelect]]'s quality-rank form: budget select keeps what scores
  // well absolutely; DSIR keeps what LOOKS LIKE the target domain.

  /** Hashed-feature bucket count (DSIR's paper uses 10k; 256 keeps the
    * bucket table broadcast-trivial and the oracle replay exact). */
  private val DsirBuckets = 256
  /** The target-domain source: documents from this source define the
    * distribution raw documents are scored against. */
  private val DsirTarget = "src0"
  private val DsirKeepFrac = 0.2

  /** DSIR selection over the corpus: per-source counts of documents the
    * importance-resampling filter keeps.
    *
    * Determinism discipline (the cross-engine gate): the log in the
    * log-likelihood ratio is the one transcendental the oracle cannot
    * share bit-exactly (`Math.log` vs libm differ in the last ulp), so
    * the per-bucket log-ratio uses the monotone Padé form
    * `ln r ≈ 2(r−1)/(r+1)` — IEEE add/div on bit-identical operands, <1%
    * error on the smoothed ratios this corpus produces — quantized to
    * q16 fixed point with the repo's `floor(x·65536)` pattern. A doc's
    * score is then an exact BIGINT sum (order-independent under any
    * parallelism), and every boundary the query compares is integer.
    *
    * 100 TB shape: tokenize/hash/explode is narrow on the scan; the two
    * distribution estimates aggregate to ≤ [[DsirBuckets]] rows
    * (map-side combine, candle-sized shuffle); the bucket→weight table is
    * BROADCAST into the scoring join, so scoring is one map-side join +
    * a per-doc combine whose shuffle is O(docs); totals ride the plan
    * inside the broadcast weight table (no driver collect). The whole
    * query reads the corpus exactly ONCE (r21): both DSIR phases —
    * estimation and scoring — derive from one cached per-(doc, bucket)
    * count frame, so the second tokenize+hash pass the two-phase shape
    * used to pay is gone. The keep-set is a THRESHOLD
    * cut, not a global rank: no unpartitioned window ever sees a
    * doc-grained frame (the one single-partition window runs over the
    * coarse score-bucket list, pure metadata). */
  def dsirSelect(s: SparkSession, d: String): DataFrame = {
    val tok = docs(s, d)
      .select(col("doc_id"), col("source"), explode(col("toks")).as("t"))
      .withColumn("b", conv(substring(md5(col("t")), 1, 2), 16, 10).cast("long"))
      .drop("t")
    val isTarget = col("source") === DsirTarget
    // ONE tokenize+hash pass for the WHOLE query (r21, guide §1.2): the
    // per-(doc, bucket) token counts are doc-grained STATS (4 narrow
    // cols, ≤ DsirBuckets rows per doc, never text) from which BOTH the
    // distribution estimate (groupBy b) and the scoring pass (Σ n·λ per
    // doc) derive — the previous two-pass form tokenized and md5-hashed
    // the corpus twice (estimation pass + scoring pass). Integer counts
    // and an exact BIGINT Σ n·λ keep the scores bit-identical to the
    // per-token sum (order-independent — addition over the same terms).
    val docBuckets = tok.groupBy("doc_id", "source", "b")
      .agg(count(lit(1)).as("n"))
      .cache()
    // both distribution estimates from the doc-bucket stats (conditional
    // sums), both totals as a second agg over the 256-row result — the
    // estimation phase costs one candle-sized shuffle, not a corpus scan
    val cnt = docBuckets.groupBy("b").agg(
      sum(when(isTarget, col("n")).otherwise(0L)).as("tc"),
      sum(when(!isTarget, col("n")).otherwise(0L)).as("sc"))
    val bl = lit(DsirBuckets.toLong)
    // add-one smoothed ratio, factored as two exact-operand divisions so
    // no integer product can outgrow a double's 2^53 exactness window.
    // Totals come from a window over the 256-row count frame (a separate
    // .agg would recompute the whole scan subtree — .explain-audited);
    // totals BEFORE the sc>0 filter (a bucket only target tokens hash to
    // still counts toward t_tot), filter after (such a bucket can never
    // score a raw doc, matching the oracle's raw-side-driven base)
    val wBuckets = Window.partitionBy()
    val lam = cnt
      .withColumn("t_tot", sum("tc").over(wBuckets))
      .withColumn("s_tot", sum("sc").over(wBuckets))
      .filter(col("sc") > 0)
      .withColumn("r",
        (col("tc") + lit(1L)).cast("double") /
          (col("t_tot") + bl).cast("double") *
          ((col("s_tot") + bl).cast("double") /
            (col("sc") + lit(1L)).cast("double")))
      .withColumn("lam_q16",
        floor(lit(2.0) * (col("r") - lit(1.0)) / (col("r") + lit(1.0)) *
          lit(65536.0)).cast("long"))
      .select("b", "lam_q16")
    val perDoc = docBuckets.filter(!isTarget)
      .join(broadcast(lam), Seq("b"))
      .groupBy("doc_id", "source")
      .agg(sum(col("lam_q16") * col("n")).as("score_q16"))
      .cache() // ~24 B/doc stats frame; four tiny passes read it below
    // ---- selection by THRESHOLD, not by global rank ----
    // keep-set = top floor(n_raw·frac) docs by (score desc, doc_id asc),
    // computed without ranking every doc through one partition: a
    // per-score histogram (distributed shuffle on the score value), a
    // two-phase cumulative over coarse score buckets (the
    // [[packSequencesSharded]] pattern — the only unpartitioned window
    // runs over the BUCKET list, score-range/2^16 rows of metadata), and
    // a deterministic tie cut at the boundary score. Bit-identical to the
    // rank form: docs strictly above the cut score are kept outright; at
    // the cut score the `need` smallest doc_ids win.
    val hist = perDoc.groupBy("score_q16").agg(count(lit(1)).as("n_at"))
      .withColumn("hbkt",
        expr("(score_q16 - pmod(score_q16, 65536L)) DIV 65536L"))
      .cache() // ≤ one row per distinct score; read thrice below
    val buckets = hist.groupBy("hbkt").agg(sum("n_at").as("n_b"))
      .withColumn("above_b",
        sum("n_b").over(Window.orderBy(desc("hbkt"))) - col("n_b"))
      .select("hbkt", "above_b")
    val scoreCum = hist.join(broadcast(buckets), Seq("hbkt"))
      .withColumn("above", col("above_b") +
        sum("n_at").over(
          Window.partitionBy("hbkt").orderBy(desc("score_q16"))) -
        col("n_at"))
    val kRow = hist.agg(sum("n_at").as("n_raw"))
      .select(floor(col("n_raw").cast("double") * lit(DsirKeepFrac))
        .cast("long").as("k"))
    // the unique score where the rank-k boundary falls; agg keeps the
    // frame 1-row even when k = 0 selects nothing (nulls → sel false)
    val cutRow = scoreCum.crossJoin(broadcast(kRow))
      .filter(col("above") < col("k") &&
        col("k") <= col("above") + col("n_at"))
      .agg(max(col("score_q16")).as("cut_s"),
        max(col("k") - col("above")).as("need"))
    // the `need`-th smallest doc_id AT the cut score. Only the docs
    // sharing the exact boundary BIGINT score enter this window —
    // near-singleton in practice (ties on an exact 64-bit token-sum are
    // duplicate-content docs) — and it is hash-partitioned on the score,
    // never Window.partitionBy().
    val tieCut = perDoc.join(broadcast(cutRow),
        col("score_q16") === col("cut_s"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("score_q16").orderBy("doc_id")))
      .filter(col("rn") === col("need"))
      .agg(max(col("doc_id")).as("tie_doc"))
    val flagged = perDoc
      .crossJoin(broadcast(cutRow))
      .crossJoin(broadcast(tieCut))
      .withColumn("sel",
        col("score_q16") > col("cut_s") ||
          (col("score_q16") === col("cut_s") &&
            col("doc_id") <= col("tie_doc")))
    flagged.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("sel"), 1L).otherwise(0L)).as("sel_docs"),
      (sum(when(col("sel"), 1L).otherwise(0L)).cast("double") /
        count(lit(1)).cast("double")).as("sel_frac"),
      sum(when(col("sel"), col("score_q16")).otherwise(0L)).as("sel_score_q16"),
      min(when(col("sel"), col("score_q16"))).as("cut_score_q16"))
  }

  /** The broadcast BPE merges table: (left, right) pairs, rank =
    * position. A FIXED shipped artifact, exactly how GPT-2 inference
    * works (the merges file is trained once, distributed with the
    * tokenizer, and the encoder never derives it from the corpus at
    * hand — ref: the published GPT-2 BPE; Sennrich et al. 2016). Rules
    * cascade: later ranks consume earlier ranks' outputs ("data" builds
    * d+a → da+t → dat+a). Tiny here; at 50k rules the same table rides
    * one broadcast exactly like [[dsirSelect]]'s weight table. */
  private val BpeMerges: Seq[(String, String)] = Seq(
    ("e", "r"), ("t", "h"), ("th", "e"), ("a", "t"), ("s", "t"),
    ("o", "r"), ("a", "n"), ("i", "n"), ("d", "a"), ("da", "t"),
    ("dat", "a"), ("j", "o"), ("jo", "in"), ("s", "c"), ("sc", "an"),
    ("b", "at"), ("bat", "c"), ("batc", "h"), ("m", "er"), ("mer", "g"),
    ("merg", "e"), ("r", "o"), ("ro", "w"), ("k", "e"), ("ke", "y"))

  /** The BPE merge LOOP as a pure expression both engines run
    * byte-identically: symbols ride a '|'-delimited string
    * (`|h|e|l|l|o|`), and applying merge (l, r) is one non-overlapping
    * left-to-right `replace('|l|r|' -> '|lr|')` — the exact greedy
    * semantics of applying BPE merges in rank order. `init` is the
    * dialect-specific char-interleave expression. */
  private def bpeChain(init: String): String =
    BpeMerges.foldLeft(init) { case (e, (l, r)) =>
      s"replace($e, '|$l|$r|', '|$l$r|')"
    }

  /** Subword (BPE) vs whitespace token accounting per source: every
    * token budget in this module (packing, length buckets, budget
    * select, epoch planning) counts whitespace tokens; this query
    * measures the drift a real tokenizer implies — `drift_q16` is the
    * q16 fixed-point subword-per-word
    * ratio, all-integer so Spark and DuckDB agree bit-for-bit. Words
    * outside the tokenizer's alphabet count 1 (the <unk> convention).
    *
    * 100 TB shape: tokenize/explode is narrow on the scan; the merge
    * chain is per-row string work inside whole-stage codegen (no UDF,
    * no shuffle); the only exchange is the |sources|-row final agg. */
  def bpeTokens(s: SparkSession, d: String): DataFrame =
    bpeTokensWith(s, d,
      bpeChain("concat('|', regexp_replace(w, '(.)', '$1|'))"))

  /** [[bpeTokens]] with the merge chain swapped in — the plumbing is
    * table-agnostic (the shipped-artifact contract): [[bpeTokensLearned]]
    * feeds it the corpus-trained table byte-for-byte. */
  // Measured and rejected (r20): folding the merge chain once per DISTINCT
  // (source, word) instead of per occurrence — this corpus's vocabulary is
  // large relative to its occurrence count, so the extra (source, w)
  // exchange cost more than the deduplicated chain evaluations saved
  // (txt_bpe_tokens_learned 2.26 s → 2.97 s at sf0.1). Per-occurrence
  // map-side evaluation feeding ONE per-source partial agg stands.
  private def bpeTokensWith(
      s: SparkSession, d: String, enc: String): DataFrame = {
    val words = docs(s, d).select(col("doc_id"), col("source"),
      explode(col("toks")).as("w"))
    val sym = words.withColumn("s",
      when(col("w").rlike("^[a-z]+$"), expr(enc)))
    val counted = sym.withColumn("bpe_w",
      when(col("s").isNull, lit(1L)).otherwise(
        (length(col("s")) - length(expr("replace(s, '|', '')")) - lit(1))
          .cast("long")))
    counted.groupBy("source").agg(
      countDistinct(col("doc_id")).as("n_docs"),
      count(lit(1)).as("ws_tokens"),
      sum(col("bpe_w")).as("bpe_tokens"))
      .withColumn("drift_q16", expr("(bpe_tokens * 65536) DIV ws_tokens"))
  }

  /** Number of merges [[bpeTrain]] learns — fixed and small, the
    * bounded-rounds discipline of the Lloyd iterations in
    * [[SimilarityQueries]] (every round is oracle-replayable as one
    * unrolled CTE stage). */
  private[operators] val BpeTrainRounds = 8

  /** LEARN the top-K BPE merges from the corpus itself (Sennrich et al.
    * 2016): start from characters, repeatedly count adjacent symbol
    * pairs over the word-frequency dictionary and merge the most
    * frequent pair — ties broken lexicographically on (l, r), so the
    * champion is deterministic under any parallelism. [[bpeTokens]]
    * APPLIES a fixed shipped table (inference); this is the published
    * counterpart that learns one.
    *
    * 100 TB shape: ONE corpus exchange builds the word-frequency dict
    * (Sennrich's training input — |vocab| rows, orders of magnitude
    * smaller than the corpus); each of the K rounds is one pair-count
    * aggregation over the dict plus a 1-row champion collect, and the
    * dict re-caches per round (lineage stays K-deep, never corpus-wide). */
  private[graft] def trainMerges(
      s: SparkSession, d: String): Seq[(Int, String, String, Long)] =
    trainMergesOf(docs(s, d).select(explode(col("toks")).as("w")))

  private[graft] def trainMergesOf(
      words: DataFrame): Seq[(Int, String, String, Long)] = {
    // ONE cached dict; round r re-derives the current symbols by folding
    // the r-1 merges learned so far as a per-row replace chain over it —
    // cheap string work inside the round's single aggregation job, so no
    // intermediate dict ever caches or materializes (K jobs total, the
    // unrolled-CTE shape the oracle replays)
    val vocab = words.filter(col("w").rlike("^[a-z]+$"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .withColumn("sym",
        expr("concat('|', regexp_replace(w, '(.)', '$1|'))"))
      .cache()
    val learned = Seq.newBuilder[(Int, String, String, Long)]
    var chain = "sym"
    (1 to BpeTrainRounds).foreach { round =>
      val top = pairCounts(vocab.withColumn("sym", expr(chain)))
        .orderBy(desc("c"), col("l"), col("r"))
        .limit(1).collect()
      if (top.nonEmpty) {
        val (l, r, c) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        learned += ((round, l, r, c))
        chain = s"replace($chain, '|$l|$r|', '|$l$r|')"
      }
    }
    vocab.unpersist()
    learned.result()
  }

  /** One training round's pair counts over the (w, cnt, sym) dict —
    * Sennrich's get_stats: every adjacent pair of every word counts,
    * weighted by the word's corpus frequency (overlaps included). ONE
    * aggregation exchange per round (PlanSpec probes it); the champion
    * pick rides a TakeOrdered, never a global sort. */
  private[graft] def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .withColumn("sy", expr("filter(split(sym, '\\\\|'), x -> x != '')"))
      .filter(size(col("sy")) >= 2)
      .select(col("cnt"), explode(expr(
        "transform(sequence(1, size(sy) - 1), " +
          "i -> struct(element_at(sy, i) AS l, element_at(sy, i + 1) AS r))"))
        .as("pr"))
      .groupBy(col("pr.l").as("l"), col("pr.r").as("r"))
      .agg(sum("cnt").as("c"))

  /** The learned merge table as a declared query: (merge_rank, l, r,
    * pair_count) — DuckDB replays the identical K rounds as an unrolled
    * CTE chain and must agree bit-for-bit. */
  def bpeTrain(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    trainMerges(s, d).toDF("merge_rank", "l", "r", "pair_count")
  }

  /** [[bpeTokens]] under the CORPUS-TRAINED merge table — proves the
    * shipped-table plumbing swaps byte-for-byte (the learned table folds
    * through the exact same chain [[bpeChain]] builds for the fixed one). */
  def bpeTokensLearned(s: SparkSession, d: String): DataFrame = {
    val enc = trainMerges(s, d).foldLeft(
      "concat('|', regexp_replace(w, '(.)', '$1|'))") {
      case (e, (_, l, r, _)) => s"replace($e, '|$l|$r|', '|$l$r|')"
    }
    bpeTokensWith(s, d, enc)
  }

  /** Per-document BPE token count as ONE codegen'd expression — the
    * [[bpeChain]] merge loop folded over the token array with
    * `aggregate` (no explode, no shuffle): the per-doc subword count
    * the tokenizer-true budgets rank and allocate on. Words outside
    * the tokenizer alphabet count 1 (<unk>), matching [[bpeTokens]]. */
  private lazy val bpeDocCount: String = {
    val enc = bpeChain("concat('|', regexp_replace(w, '(.)', '$1|'))")
    "aggregate(toks, 0L, (acc, w) -> acc + (CASE WHEN w RLIKE '^[a-z]+" +
      "$' THEN CAST(length(" + enc + ") - length(replace(" + enc +
      ", '|', '')) - 1 AS BIGINT) ELSE 1L END))"
  }

  /** DuckDB twin of [[bpeDocCount]] (list_transform + list_sum). */
  private lazy val sqlBpeDocCount: String = {
    val enc = bpeChain("""('|' || regexp_replace(w, '(.)', '\1|', 'g'))""")
    s"""list_sum(list_transform(toks, w ->
        CASE WHEN regexp_full_match(w, '[a-z]+')
          THEN length($enc) - length(replace($enc, '|', '')) - 1
          ELSE 1 END))"""
  }

  /** DuckDB integer value of the first `n` lowercase-hex digits of
    * expression `e` (the md5-prefix bucket/weight idiom — Spark's
    * `conv(substring(x, 1, n), 16, 10)`). */
  private def sqlHexVal(e: String, n: Int): String =
    (1 to n).map { k =>
      val term = s"(strpos('0123456789abcdef', substring($e, $k, 1)) - 1)"
      if (k < n) s"$term * ${math.pow(16, (n - k).toDouble).toLong}" else term
    }.mkString("(", " + ", ")")

  /** Hashed-feature bucket count for the classifier (fastText defaults
    * to 2M bigram buckets; 256 keeps the weight table broadcast-trivial
    * and oracle-replayable — the [[DsirBuckets]] discipline). */
  private val ClfBuckets = 256

  /** Learned quality-classifier selection — the CCNet/DCLM/FineWeb-Edu
    * gate: a LINEAR fastText-style classifier over hashed word-bigram
    * features, trained offline, shipped as a weight table, applied as
    * one inference pass (Joulin et al. 2016; the published pipelines
    * gate on exactly this, not only heuristics). The weight table here
    * is a deterministic keyed-hash stand-in for the trained artifact
    * (the shipped-artifact discipline of [[BpeMerges]] — the engine's
    * job is the inference plumbing, and the table swaps byte-for-byte
    * for real trained weights); scoring is exact integer q16 (a doc's
    * score is a SUM of bucket weights — order-independent under any
    * parallelism), keep = score > 0 (the sigmoid-0.5 boundary of a
    * bias-free linear model).
    *
    * 100 TB shape: bigram/hash/explode is narrow on the scan; the
    * 256-row weight table is BROADCAST into the scoring join (the
    * [[dsirSelect]] economics); the per-doc combine is the one O(docs)
    * shuffle; keep is a threshold on the doc's OWN score — no global
    * rank, no doc-grained unpartitioned window; the report aggregates
    * to |sources| rows. Featureless docs (<2 tokens) score through the
    * empty-feature bucket, so every doc classifies in the one pass —
    * no join-back for the unfeatured. */
  def classifierSelect(s: SparkSession, d: String): DataFrame = {
    val perDoc = classifierScores(s, docs(s, d))
    perDoc.withColumn("keep", col("score_q16") > 0)
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("kept_docs"),
        (sum(when(col("keep"), 1L).otherwise(0L)).cast("double") /
          count(lit(1)).cast("double")).as("kept_frac"),
        sum(col("score_q16")).as("sum_score_q16"),
        sum(when(col("keep"), col("score_q16")).otherwise(0L))
          .as("kept_score_q16"))
  }

  /** Exact duplicate-substring mass (Lee et al. 2021, "Deduplicating
    * Training Data Makes Language Models Better" — the suffix-array
    * ≥50-token criterion re-expressed relationally): every STRIDE-1
    * window of L consecutive tokens whose exact text occurs ≥2 times
    * anywhere in the corpus marks its positions duplicated; a doc's
    * duplicate mass is the UNION of its duplicated windows. L=8 at
    * this corpus's ~55-token docs — the same published-protocol
    * downscale as [[contamination]]'s 8-gram. Fixed-L stride-1
    * coverage marks the SAME positions the paper's maximal repeats ≥ L
    * do: every length-L subwindow of a longer repeat is itself
    * repeated.
    *
    * 100 TB shape: the stride-1 fan-out is narrow on the scan; the ONE
    * wide exchange keys on the shingle string (bounded by distinct
    * corpus content — the dedup target itself; [[spanDedup]]'s
    * economics at stride 1, never all-pairs); the interval union is a
    * per-DOC window over equal-length intervals (one lag,
    * hash-partitioned on doc_id); the report is |sources| rows. */
  /** Per-doc classifier score over any docs frame — the inference half
    * of [[classifierSelect]], shared by [[dclmPipeline]]: hashed bigram
    * buckets, the broadcast weight table, one O(docs) combine. */
  private def classifierScores(s: SparkSession, docsDf: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docsDf.sparkSession)
    // bigrams via the native stride-1 k-gram expression (r21, guide §4);
    // identical values (whitespace tokens are never null, so the old
    // concat and concat_ws agree), and the <2-token empty-feature bucket
    // edge is preserved by the CASE
    val grams = docsDf.select(col("doc_id"), col("source"),
      explode(expr(
        """CASE WHEN size(toks) >= 2
             THEN graft_ngrams(toks, 2)
             ELSE array('') END""")).as("bg"))
    val w = s.range(ClfBuckets.toLong).select(
      col("id").as("b"),
      (conv(substring(md5(concat(lit("clfw:"), col("id").cast("string"))),
        1, 4), 16, 10).cast("long") - lit(32768L)).as("w_q16"))
    grams
      .withColumn("b", conv(substring(md5(col("bg")), 1, 2), 16, 10).cast("long"))
      .join(broadcast(w), Seq("b"))
      .groupBy("doc_id", "source")
      .agg(sum("w_q16").as("score_q16"))
  }

  /** The composed DCLM-baseline curation pipeline in ONE declarative
    * plan (Li et al. 2024, "DataComp-LM" — the published reproduction's
    * stage ordering): classifier gate → exact dedup (first doc_id per
    * fingerprint among the gated) → per-source token-budget selection by
    * classifier score. Reported per source AT EVERY STAGE, so a pipeline
    * owner sees where documents leave — the composition is the product a
    * curation run actually ships, not any single filter.
    *
    * 100 TB shape: two corpus scans (fingerprint/stats + bigram scoring —
    * the dsirSelect two-pass discipline), then everything downstream
    * moves doc STATS only (id, source, tokens, fp, score — text never
    * leaves the scans): the gate is a threshold, dedup is ONE
    * fingerprint exchange (min-doc_id groupBy + equi-join, the
    * [[cleanPipeline]] form), the budget is [[budgetSelect]]'s
    * source-partitioned window over stats, the rollup is |sources|
    * rows. */
  def dclmPipeline(s: SparkSession, d: String): DataFrame = {
    val (stats, rollup) = dclmStages(s, d, cache = true)
    // pin the |sources|-row rollup, then drop the doc-grained caches —
    // the scratch frames must not linger for the rest of the session
    val pinned = rollup.localCheckpoint(true)
    stats.foreach(_.unpersist())
    pinned
  }

  /** The UNMATERIALIZED rollup plan — what PlanSpec probes (broadcast
    * weights, no unpartitioned window, no cross product). The declared
    * query executes exactly this plan, with the doc-stats stage cached
    * across the four rollup branches and dropped after materialization. */
  private[graft] def dclmPipelinePlan(s: SparkSession, d: String): DataFrame =
    dclmStages(s, d, cache = false)._2

  private def dclmStages(
      s: SparkSession, d: String, cache: Boolean): (Seq[DataFrame], DataFrame) = {
    val base0 = docs(s, d)
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .filter(col("n_tokens") > 0)
      .withColumn("fp",
        md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")))
      .select("doc_id", "source", "n_tokens", "fp")
    // base doc-stats (id, source, tokens, fp — never text) are referenced
    // twice: the gate join AND the rollup's all-docs branch. Uncached, the
    // rollup branch re-ran the whole tokenize+fingerprint scan (r21, guide
    // §1.2) — the pipeline now reads the corpus text exactly TWICE (stats
    // pass + bigram classifier pass), the floor its scaladoc claims.
    val base = if (cache) base0.cache() else base0
    val gated0 = base
      .join(classifierScores(s, docs(s, d)).drop("source"), Seq("doc_id"))
      .filter(col("score_q16") > 0)
    // doc-stats frame (id, source, tokens, fp, score) — cached only in
    // the executing form, for the four rollup branches of ONE action
    val gated = if (cache) gated0.cache() else gated0
    val canon = gated.groupBy("fp").agg(min("doc_id").as("doc_id"))
    val dd = gated.join(canon, Seq("fp", "doc_id"))
    val wRank = Window.partitionBy("source")
      .orderBy(desc("score_q16"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("source")
    val sel = dd
      .withColumn("cum", sum("n_tokens").over(wRank))
      .withColumn("tot", sum("n_tokens").over(wAll))
      .withColumn("keep", col("cum").cast("double") <=
        col("tot").cast("double") * BudgetFrac)
    val rollup = base.groupBy("source").agg(
        count(lit(1)).as("n_docs"), sum("n_tokens").as("tokens"))
      .join(gated.groupBy("source")
        .agg(count(lit(1)).as("clf_kept_docs")), Seq("source"), "left")
      .join(dd.groupBy("source")
        .agg(count(lit(1)).as("dedup_kept_docs")), Seq("source"), "left")
      .join(sel.groupBy("source").agg(
          sum(when(col("keep"), 1L).otherwise(0L)).as("sel_docs"),
          sum(when(col("keep"), col("n_tokens")).otherwise(0L))
            .as("sel_tokens")), Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("tokens"),
        coalesce(col("clf_kept_docs"), lit(0L)).as("clf_kept_docs"),
        coalesce(col("dedup_kept_docs"), lit(0L)).as("dedup_kept_docs"),
        coalesce(col("sel_docs"), lit(0L)).as("sel_docs"),
        coalesce(col("sel_tokens"), lit(0L)).as("sel_tokens"),
        (coalesce(col("sel_tokens"), lit(0L)).cast("double") /
          col("tokens").cast("double")).as("retention"))
    (Seq(base, gated), rollup)
  }

  def exactSubstr(s: SparkSession, d: String): DataFrame =
    exactSubstrOf(docs(s, d))

  /** Stride-1 L-token windows of every doc: (doc_id, source, n_tokens,
    * pos, sh) — shared by the accounting ([[exactSubstrOf]]) and the cut
    * ([[exactSubstrCutOf]]). `pos` is the 1-based start. */
  private def strideWindows(docsDf: DataFrame, L: Int): DataFrame = {
    graft.functions.GraftFunctions.register(docsDf.sparkSession)
    docsDf.withColumn("n_tokens", size(col("toks")).cast("long"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        posexplode(expr(s"graft_ngrams(toks, $L)")))
      .toDF("doc_id", "source", "n_tokens", "p0", "sh")
      .withColumn("pos", (col("p0") + 1).cast("long")).drop("p0")
  }

  /** Per-doc interval union of equal-length (L) windows: one lag over a
    * doc-partitioned window — overlapping windows merge exactly. */
  private def intervalUnion(windows: DataFrame, L: Int): DataFrame = {
    val wDoc = Window.partitionBy("doc_id").orderBy("pos")
    windows
      .withColumn("prev", lag("pos", 1).over(wDoc))
      .withColumn("covers",
        when(col("prev").isNull, lit(L.toLong))
          .otherwise(least(lit(L.toLong), col("pos") - col("prev"))))
      .groupBy("doc_id", "source").agg(
        sum("covers").as("dup_tokens"),
        count(lit(1)).as("dup_windows"))
  }

  /** Core of [[exactSubstr]] over any (doc_id, source, toks) frame
    * (unit-testable with planted duplicates). */
  def exactSubstrOf(docsDf: DataFrame): DataFrame = {
    val L = 8
    val base = docsDf.withColumn("n_tokens", size(col("toks")).cast("long"))
    val sh = strideWindows(docsDf, L)
    val dup = sh
      .withColumn("n_occ", count(lit(1)).over(Window.partitionBy("sh")))
      .filter(col("n_occ") > 1)
    val perDoc = intervalUnion(dup, L)
    base.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("tokens"))
      .join(
        perDoc.groupBy("source").agg(
          count(lit(1)).as("dup_docs"),
          sum("dup_tokens").as("dup_tokens"),
          sum("dup_windows").as("dup_windows")),
        Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("tokens"),
        coalesce(col("dup_docs"), lit(0L)).as("dup_docs"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        coalesce(col("dup_windows"), lit(0L)).as("dup_windows"),
        (coalesce(col("dup_tokens"), lit(0L)).cast("double") /
          col("tokens").cast("double")).as("dup_frac"))
  }

  def exactSubstrCut(s: SparkSession, d: String): DataFrame =
    exactSubstrCutOf(docs(s, d))

  /** The REMOVAL [[exactSubstr]] only accounts for — what Lee et al.
    * actually apply: every duplicated window keeps its FIRST occurrence
    * in (doc_id, pos) order (the [[spanDedup]] keep rule at stride 1) and
    * later occurrences are cut; a token is removed when ≥1 non-canonical
    * duplicated window covers it. The report is the per-source removal
    * bill — cut tokens, surviving tokens, affected docs — the numbers a
    * curation run budgets the cut by.
    *
    * Same scale shape as [[exactSubstrOf]]: one shingle-keyed exchange
    * (the rank and the occurrence count ride the SAME partitioning), a
    * per-doc interval union, a |sources|-row rollup. */
  def exactSubstrCutOf(docsDf: DataFrame): DataFrame = {
    val L = 8
    val base = docsDf.withColumn("n_tokens", size(col("toks")).cast("long"))
    val wSh = Window.partitionBy("sh")
    val cutW = strideWindows(docsDf, L)
      .withColumn("n_occ", count(lit(1)).over(wSh))
      .withColumn("rk", row_number().over(wSh.orderBy("doc_id", "pos")))
      .filter(col("n_occ") > 1 && col("rk") > 1)
    val perDoc = intervalUnion(cutW, L)
      .withColumnRenamed("dup_tokens", "cut_tokens")
      .withColumnRenamed("dup_windows", "cut_windows")
    base.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("tokens"))
      .join(
        perDoc.groupBy("source").agg(
          count(lit(1)).as("docs_affected"),
          sum("cut_tokens").as("cut_tokens"),
          sum("cut_windows").as("cut_windows")),
        Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("tokens"),
        coalesce(col("docs_affected"), lit(0L)).as("docs_affected"),
        coalesce(col("cut_windows"), lit(0L)).as("cut_windows"),
        coalesce(col("cut_tokens"), lit(0L)).as("cut_tokens"),
        (col("tokens") - coalesce(col("cut_tokens"), lit(0L)))
          .as("kept_tokens"),
        ((col("tokens") - coalesce(col("cut_tokens"), lit(0L)))
          .cast("double") / col("tokens").cast("double")).as("kept_frac"))
  }

  /** Tokenizer-true budget selection: [[budgetSelect]]'s greedy
    * quality-ranked fill, budgeted in SUBWORD (BPE) tokens — the unit
    * a training run actually pays — with the whitespace-form decision
    * computed in the SAME pass so the report quantifies what the
    * approximation mis-selects (`swapped_docs`). Same one-exchange
    * shape: both cumulative sums ride one (source, quality, doc_id)
    * window sort; the BPE count is [[bpeDocCount]], per-row codegen'd
    * string work on the scan — no explode, no extra shuffle. */
  def budgetSelectBpe(s: SparkSession, d: String): DataFrame = {
    val base = withQuality(docs(s, d)).filter(col("n_tokens") > 0)
      .withColumn("n_bpe", expr(bpeDocCount))
    val wRank = Window.partitionBy("source")
      .orderBy(desc("quality_score"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("source")
    val flagged = base
      .withColumn("cum_bpe", sum(col("n_bpe")).over(wRank))
      .withColumn("cum_ws", sum(col("n_tokens")).over(wRank))
      .withColumn("tot_bpe", sum(col("n_bpe")).over(wAll))
      .withColumn("tot_ws", sum(col("n_tokens")).over(wAll))
      .withColumn("keep", col("cum_bpe").cast("double") <=
        col("tot_bpe").cast("double") * BudgetFrac)
      .withColumn("keep_ws", col("cum_ws").cast("double") <=
        col("tot_ws").cast("double") * BudgetFrac)
    flagged.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      max(col("tot_bpe")).as("bpe_tokens"),
      max(col("tot_ws")).as("ws_tokens"),
      sum(when(col("keep"), 1L).otherwise(0L)).as("kept_docs"),
      sum(when(col("keep"), col("n_bpe")).otherwise(0L)).as("kept_bpe_tokens"),
      (sum(when(col("keep"), col("n_bpe")).otherwise(0L)).cast("double") /
        max(col("tot_bpe")).cast("double")).as("kept_frac"),
      sum(when(col("keep_ws"), 1L).otherwise(0L)).as("ws_kept_docs"),
      sum(when(col("keep") =!= col("keep_ws"), 1L).otherwise(0L))
        .as("swapped_docs"))
  }

  /** Tokenizer-true UniMax: [[mixUnimax]]'s water-filling run on BPE
    * subword counts (the unit the budget is actually spent in), with
    * the whitespace-form allocation joined back so the report shows
    * the drift in EPOCHS — the unit-free number that is comparable
    * across token accountings. One corpus pass computes both token
    * sums; everything downstream is |sources|-row metadata. */
  def mixUnimaxBpe(s: SparkSession, d: String): DataFrame = {
    val per = docs(s, d).filter(size(col("toks")) > 0)
      .withColumn("n_bpe", expr(bpeDocCount))
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(size(col("toks")).cast("long")).as("tokens_ws"),
        sum(col("n_bpe")).as("tokens_bpe"))
      .cache() // |sources| rows; feeds both water-fillings
    val bpe = unimaxOver(per.select(col("source"), col("n_docs"),
      col("tokens_bpe").as("tokens")))
    val ws = unimaxOver(per.select(col("source"), col("n_docs"),
        col("tokens_ws").as("tokens")))
      .select(col("source"), col("tokens").as("tokens_ws"),
        col("epochs_q16").as("epochs_q16_ws"))
    bpe.select(col("source"), col("n_docs"),
        col("tokens").as("tokens_bpe"), col("capped"),
        col("alloc_tokens"), col("epochs_q16"))
      .join(ws, Seq("source"))
      .withColumn("epochs_delta_q16",
        col("epochs_q16") - col("epochs_q16_ws"))
  }

  val queries: Map[String, Q] = Map(
    "txt_bpe_tokens" -> (bpeTokens _),
    "txt_bpe_train" -> (bpeTrain _),
    "txt_bpe_tokens_learned" -> (bpeTokensLearned _),
    "txt_budget_select_bpe" -> (budgetSelectBpe _),
    "txt_classifier_select" -> (classifierSelect _),
    "txt_dclm_pipeline" -> (dclmPipeline _),
    "txt_exact_substr" -> (exactSubstr _),
    "txt_exact_substr_cut" -> (exactSubstrCut _),
    "txt_mix_unimax_bpe" -> (mixUnimaxBpe _),
    "txt_budget_select" -> (budgetSelect _),
    "txt_dsir_select" -> (dsirSelect _),
    "txt_mix_epochs" -> (mixEpochs _),
    "txt_mix_epochs_bpe" -> (mixEpochsBpe _),
    "txt_mix_unimax" -> (mixUnimax _),
    "txt_gopher_rules" -> (gopherRules _),
    "txt_rag_chunks" -> (ragChunks _),
    "txt_span_dedup" -> (spanDedup _),
    "txt_dup_ngram_frac" -> (dupNgramFrac _),
    "txt_redact_pii" -> (redactPii _),
    "txt_length_buckets" -> (lengthBuckets _),
    "txt_repetition" -> (repetition _),
    "txt_contamination" -> (contamination _),
    "txt_clean_pipeline" -> (cleanPipeline _),
    "txt_pack_sequences" -> (packSequences _),
    "txt_pack_sequences_sharded" -> (packSequencesSharded _),
    "txt_source_mix" -> (sourceMix _),
    "txt_tfidf" -> (tfidfTop _),
    "txt_token_stats" -> (tokenStats _),
    "txt_lang_confusion" -> (langConfusion _),
    "txt_quality" -> (quality _),
    "txt_fingerprint" -> (fingerprint _),
    "txt_ngram_top" -> (ngramTop _),
    "txt_token_classes" -> (tokenClasses _),
  )

  private val cte =
    """WITH docs AS (
         SELECT doc_id, text, lang, source, n_chars,
                regexp_split_to_array(trim(text), '\s+') AS toks
         FROM documents)"""

  private def sqlMarker(words: Seq[String]): String =
    s"len(list_filter(toks, t -> ${inSet("t", words)}))"

  /** The Muennighoff epoch plan as a reusable DuckDB CTE chain over a
    * (source, n_docs, tokens) CTE named `per`, stage names prefixed `p`.
    * Ends at `${p}out`. */
  private def epochsChainSql(per: String, p: String): String = s"""
      ${p}tot AS (
        SELECT *, SUM(tokens) OVER () AS total_tokens,
               COUNT(*) OVER () AS n_sources
        FROM $per),
      ${p}tgt AS (
        SELECT *, CAST(FLOOR(CAST(total_tokens AS DOUBLE) / 2.0 /
               CAST(n_sources AS DOUBLE)) AS BIGINT) AS target_tokens
        FROM ${p}tot),
      ${p}ep AS (
        SELECT *, LEAST(4, CAST(FLOOR(
               CAST(target_tokens + tokens - 1 AS DOUBLE) /
               CAST(tokens AS DOUBLE)) AS BIGINT)) AS epochs
        FROM ${p}tgt),
      ${p}out AS (
        SELECT *, LEAST(target_tokens, epochs * tokens) AS effective_tokens,
               target_tokens - LEAST(target_tokens, epochs * tokens)
                 AS shortfall
        FROM ${p}ep)"""

  /** The UniMax water-filling as a reusable DuckDB CTE chain over a
    * (source, n_docs, tokens) CTE named `per` — every stage name gets
    * prefix `p` so two chains (whitespace + BPE accounting) compose in
    * one query. Ends at `${p}out`: input columns + cap_tokens / capped /
    * alloc_tokens / epochs_q16. */
  private def unimaxChainSql(per: String, p: String): String = s"""
      ${p}tot AS (
        SELECT *, tokens * 4 AS cap_tokens,
               SUM(tokens) OVER () AS total_tokens,
               COUNT(*) OVER () AS m
        FROM $per),
      ${p}ord AS (
        SELECT *, total_tokens // 2 AS budget,
               CAST(ROW_NUMBER() OVER (ORDER BY cap_tokens, source) AS BIGINT) AS i,
               SUM(cap_tokens) OVER (ORDER BY cap_tokens, source
                 ROWS UNBOUNDED PRECEDING) AS prefix_cap
        FROM ${p}tot),
      ${p}cnd AS (
        SELECT *, CAST(cap_tokens AS HUGEINT) * (m - i + 1) <=
               CAST(budget - prefix_cap + cap_tokens AS HUGEINT) AS cond
        FROM ${p}ord),
      ${p}cp AS (
        SELECT *, MIN(CASE WHEN cond THEN 1 ELSE 0 END) OVER
               (ORDER BY cap_tokens, source ROWS UNBOUNDED PRECEDING) = 1
               AS capped
        FROM ${p}cnd),
      ${p}fin AS (
        SELECT *, SUM(CASE WHEN capped THEN 1 ELSE 0 END) OVER () AS k,
               SUM(CASE WHEN capped THEN cap_tokens ELSE 0 END) OVER ()
                 AS capped_sum
        FROM ${p}cp),
      ${p}alloc AS (
        SELECT *, CAST(CASE WHEN capped THEN cap_tokens
                            WHEN m = k THEN 0
                            ELSE (budget - capped_sum) // (m - k)
                       END AS BIGINT) AS alloc_tokens
        FROM ${p}fin),
      ${p}out AS (
        SELECT *, CAST((CAST(alloc_tokens AS HUGEINT) * 65536) // tokens
                 AS BIGINT) AS epochs_q16
        FROM ${p}alloc)"""

  private[operators] lazy val packSql: String = s"""$cte,
      sized AS (
        SELECT source, doc_id, CAST(len(toks) AS BIGINT) AS n_tokens
        FROM docs WHERE len(toks) > 0),
      off AS (
        SELECT source, doc_id, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) AS end_off
        FROM sized),
      spans AS (
        SELECT source, doc_id, n_tokens,
               CAST(end_off - n_tokens AS BIGINT) AS start_off,
               CAST(end_off AS BIGINT) AS end_off
        FROM off),
      ex AS (
        SELECT source, doc_id, start_off, end_off, seq_id
        FROM spans CROSS JOIN
          UNNEST(range(start_off // 256, ((end_off - 1) // 256) + 1)) AS u(seq_id))
      SELECT source, seq_id,
        COUNT(*) AS n_docs,
        CAST(SUM(CASE WHEN start_off >= seq_id * 256 AND end_off <= (seq_id + 1) * 256
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_full_docs,
        CAST(SUM(LEAST(end_off, (seq_id + 1) * 256) -
                 GREATEST(start_off, seq_id * 256)) AS BIGINT) AS n_tokens,
        MIN(doc_id) AS first_doc,
        MAX(doc_id) AS last_doc
      FROM ex GROUP BY 1, 2"""

  private val sqlStopHits: String = gopherStops
    .map(w => s"(CASE WHEN list_contains(toks, '$w') THEN 1 ELSE 0 END)")
    .mkString(" + ")

  /** The quality formula as shared DuckDB text (mirrors [[withQuality]]);
    * expects `toks` + `text` in scope. Shared with [[DedupQueries]]'s
    * keep-best oracle so both engines rank by the SAME score text. */
  private[operators] lazy val sqlQuality: String =
    s"""(CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE)) * 0.5 +
        (CAST(${sqlMarker(enWords)} AS DOUBLE) / CAST(len(toks) AS DOUBLE)) * 0.3 +
        LEAST(CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) / CAST(len(toks) AS DOUBLE) / 10.0, 1.0) * 0.2"""

  /** DuckDB replay of the K training rounds ([[trainMergesOf]]): `w0` is
    * the word-frequency dict with char-interleaved symbols; round i
    * counts adjacent pairs from `w{i-1}`, picks the champion with the
    * SAME tie-break (ORDER BY c DESC, l, r LIMIT 1), and applies the
    * merge — the [[SimilarityQueries]] unrolled-Lloyd discipline. */
  private def sqlBpeTrainChain(k: Int): String = {
    // every stage MATERIALIZED: each round references its predecessor
    // twice (pair counts + merge apply), and DuckDB inlines plain CTEs —
    // an un-materialized chain re-expands w0 2^K times and opens the
    // parquet once per expansion (observed: EMFILE at K=8)
    val w0 =
      """
      w0 AS MATERIALIZED (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt,
          '|' || regexp_replace(w, '(.)', '\1|', 'g') AS sym
        FROM (SELECT unnest(toks) AS w FROM docs)
        WHERE regexp_full_match(w, '[a-z]+')
        GROUP BY w)"""
    val rounds = (1 to k).map { i =>
      s"""
      pc$i AS MATERIALIZED (
        SELECT sy[i] AS l, sy[i + 1] AS r, CAST(SUM(cnt) AS BIGINT) AS c
        FROM (
          SELECT cnt, sy, unnest(generate_series(1, len(sy) - 1)) AS i
          FROM (SELECT cnt,
                  list_filter(string_split(sym, '|'), x -> x <> '') AS sy
                FROM w${i - 1}))
        GROUP BY 1, 2),
      b$i AS MATERIALIZED (
        SELECT l, r, c FROM pc$i ORDER BY c DESC, l, r LIMIT 1),
      w$i AS MATERIALIZED (
        SELECT w, cnt, replace(sym,
          '|' || (SELECT l FROM b$i) || '|' || (SELECT r FROM b$i) || '|',
          '|' || (SELECT l FROM b$i) || (SELECT r FROM b$i) || '|') AS sym
        FROM w${i - 1})"""
    }.mkString(",")
    s"$w0,$rounds"
  }

  val oracleSql: Map[String, String] = Map(
    "txt_bpe_train" -> s"""$cte,${sqlBpeTrainChain(BpeTrainRounds)}
      SELECT * FROM (
        ${(1 to BpeTrainRounds).map(i =>
          s"SELECT $i AS merge_rank, l, r, c AS pair_count FROM b$i")
          .mkString(" UNION ALL ")}
      ) ORDER BY merge_rank""",
    "txt_bpe_tokens_learned" -> s"""$cte,${sqlBpeTrainChain(BpeTrainRounds)},
      wc AS (
        SELECT w, CAST(len(list_filter(string_split(sym, '|'),
          x -> x <> '')) AS BIGINT) AS bpe_w
        FROM w$BpeTrainRounds),
      tok AS (SELECT doc_id, source, unnest(toks) AS w FROM docs),
      j AS (
        SELECT t.doc_id, t.source, COALESCE(wc.bpe_w, 1) AS bpe_w
        FROM tok t LEFT JOIN wc ON t.w = wc.w),
      per_source AS (
        SELECT source,
          CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
          CAST(COUNT(*) AS BIGINT) AS ws_tokens,
          CAST(SUM(bpe_w) AS BIGINT) AS bpe_tokens
        FROM j GROUP BY 1)
      SELECT source, n_docs, ws_tokens, bpe_tokens,
        CAST((bpe_tokens * 65536) // ws_tokens AS BIGINT) AS drift_q16
      FROM per_source""",
    "txt_bpe_tokens" -> s"""$cte,
      words AS (
        SELECT doc_id, source, unnest(toks) AS w FROM docs),
      enc AS (
        SELECT doc_id, source, w,
          CASE WHEN regexp_full_match(w, '[a-z]+') THEN
            ${bpeChain("""('|' || regexp_replace(w, '(.)', '\1|', 'g'))""")}
          END AS s
        FROM words),
      per_source AS (
        SELECT source,
          CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
          CAST(COUNT(*) AS BIGINT) AS ws_tokens,
          CAST(SUM(CASE WHEN s IS NULL THEN 1
            ELSE length(s) - length(replace(s, '|', '')) - 1 END) AS BIGINT)
            AS bpe_tokens
        FROM enc GROUP BY 1)
      SELECT source, n_docs, ws_tokens, bpe_tokens,
        CAST((bpe_tokens * 65536) // ws_tokens AS BIGINT) AS drift_q16
      FROM per_source""",
    "txt_budget_select" -> s"""$cte,
      scored AS (
        SELECT source, doc_id,
          CAST(len(toks) AS BIGINT) AS n_tokens,
          $sqlQuality AS quality_score
        FROM docs WHERE len(toks) > 0),
      ranked AS (
        SELECT source, doc_id, n_tokens, quality_score,
          SUM(n_tokens) OVER (PARTITION BY source
            ORDER BY quality_score DESC, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens,
          SUM(n_tokens) OVER (PARTITION BY source) AS total_tokens
        FROM scored),
      flagged AS (
        SELECT *, CAST(cum_tokens AS DOUBLE) <=
          CAST(total_tokens AS DOUBLE) * $BudgetFrac AS keep
        FROM ranked)
      SELECT source,
        CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(MAX(total_tokens) AS BIGINT) AS total_tokens,
        CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
        CAST(SUM(CASE WHEN keep THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens,
        CAST(SUM(CASE WHEN keep THEN n_tokens ELSE 0 END) AS DOUBLE) /
          CAST(MAX(total_tokens) AS DOUBLE) AS kept_frac,
        CAST(MIN(CASE WHEN keep THEN FLOOR(quality_score * 1e6) END) AS BIGINT)
          AS quality_floor_micro
      FROM flagged GROUP BY 1""",
    "txt_mix_epochs" -> s"""$cte,
      per AS (
        SELECT source,
          CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(len(toks)) AS BIGINT) AS tokens
        FROM docs WHERE len(toks) > 0 GROUP BY 1),
      ${epochsChainSql("per", "")}
      SELECT source, n_docs, tokens, target_tokens, epochs,
        effective_tokens, shortfall
      FROM out""",
    "txt_mix_epochs_bpe" -> s"""$cte,
      per0 AS (
        SELECT source,
          CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(len(toks)) AS BIGINT) AS tokens_ws,
          CAST(SUM($sqlBpeDocCount) AS BIGINT) AS tokens_bpe
        FROM docs WHERE len(toks) > 0 GROUP BY 1),
      bper AS (SELECT source, n_docs, tokens_bpe AS tokens FROM per0),
      wper AS (SELECT source, n_docs, tokens_ws AS tokens FROM per0),
      ${epochsChainSql("bper", "b")},
      ${epochsChainSql("wper", "w")}
      SELECT b.source, b.n_docs, b.tokens AS tokens_bpe, b.target_tokens,
        b.epochs, b.effective_tokens, b.shortfall,
        w.tokens AS tokens_ws, w.epochs AS epochs_ws,
        b.epochs - w.epochs AS epochs_delta
      FROM bout b JOIN wout w ON b.source = w.source""",
    "txt_mix_unimax" -> s"""$cte,
      per AS (
        SELECT source,
          CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(len(toks)) AS BIGINT) AS tokens
        FROM docs WHERE len(toks) > 0 GROUP BY 1),
      ${unimaxChainSql("per", "")}
      SELECT source, n_docs, tokens, cap_tokens, capped, alloc_tokens,
        epochs_q16
      FROM out""",
    "txt_mix_unimax_bpe" -> s"""$cte,
      per0 AS (
        SELECT source,
          CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(len(toks)) AS BIGINT) AS tokens_ws,
          CAST(SUM($sqlBpeDocCount) AS BIGINT) AS tokens_bpe
        FROM docs WHERE len(toks) > 0 GROUP BY 1),
      bper AS (SELECT source, n_docs, tokens_bpe AS tokens FROM per0),
      wper AS (SELECT source, n_docs, tokens_ws AS tokens FROM per0),
      ${unimaxChainSql("bper", "b")},
      ${unimaxChainSql("wper", "w")}
      SELECT b.source, b.n_docs, b.tokens AS tokens_bpe,
        w.tokens AS tokens_ws, b.capped, b.alloc_tokens, b.epochs_q16,
        w.epochs_q16 AS epochs_q16_ws,
        b.epochs_q16 - w.epochs_q16 AS epochs_delta_q16
      FROM bout b JOIN wout w ON b.source = w.source""",
    "txt_budget_select_bpe" -> s"""$cte,
      scored AS (
        SELECT source, doc_id,
          CAST(len(toks) AS BIGINT) AS n_tokens,
          CAST($sqlBpeDocCount AS BIGINT) AS n_bpe,
          $sqlQuality AS quality_score
        FROM docs WHERE len(toks) > 0),
      ranked AS (
        SELECT *,
          SUM(n_bpe) OVER w AS cum_bpe,
          SUM(n_tokens) OVER w AS cum_ws,
          SUM(n_bpe) OVER (PARTITION BY source) AS tot_bpe,
          SUM(n_tokens) OVER (PARTITION BY source) AS tot_ws
        FROM scored
        WINDOW w AS (PARTITION BY source
          ORDER BY quality_score DESC, doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      flagged AS (
        SELECT *,
          CAST(cum_bpe AS DOUBLE) <= CAST(tot_bpe AS DOUBLE) * $BudgetFrac
            AS keep,
          CAST(cum_ws AS DOUBLE) <= CAST(tot_ws AS DOUBLE) * $BudgetFrac
            AS keep_ws
        FROM ranked)
      SELECT source,
        CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(MAX(tot_bpe) AS BIGINT) AS bpe_tokens,
        CAST(MAX(tot_ws) AS BIGINT) AS ws_tokens,
        CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
        CAST(SUM(CASE WHEN keep THEN n_bpe ELSE 0 END) AS BIGINT)
          AS kept_bpe_tokens,
        CAST(SUM(CASE WHEN keep THEN n_bpe ELSE 0 END) AS DOUBLE) /
          CAST(MAX(tot_bpe) AS DOUBLE) AS kept_frac,
        CAST(SUM(CASE WHEN keep_ws THEN 1 ELSE 0 END) AS BIGINT)
          AS ws_kept_docs,
        CAST(SUM(CASE WHEN keep <> keep_ws THEN 1 ELSE 0 END) AS BIGINT)
          AS swapped_docs
      FROM flagged GROUP BY 1""",
    "txt_classifier_select" -> s"""$cte,
      grams AS (
        SELECT doc_id, source, array_to_string(toks[i:i+1], ' ') AS bg
        FROM docs CROSS JOIN UNNEST(range(1, len(toks))) AS u(i)
        WHERE len(toks) >= 2
        UNION ALL
        SELECT doc_id, source, '' AS bg FROM docs WHERE len(toks) < 2),
      wt AS (
        SELECT CAST(i AS BIGINT) AS b,
          CAST(${sqlHexVal("md5('clfw:' || CAST(i AS VARCHAR))", 4)}
            - 32768 AS BIGINT) AS w_q16
        FROM range(256) t(i)),
      feats AS (
        SELECT doc_id, source,
          CAST(${sqlHexVal("md5(bg)", 2)} AS BIGINT) AS b
        FROM grams),
      per_doc AS (
        SELECT doc_id, source, SUM(w_q16) AS score_q16
        FROM feats JOIN wt USING (b) GROUP BY 1, 2)
      SELECT source,
        CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(CASE WHEN score_q16 > 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS kept_docs,
        CAST(SUM(CASE WHEN score_q16 > 0 THEN 1 ELSE 0 END) AS DOUBLE) /
          COUNT(*) AS kept_frac,
        CAST(SUM(score_q16) AS BIGINT) AS sum_score_q16,
        CAST(SUM(CASE WHEN score_q16 > 0 THEN score_q16 ELSE 0 END)
          AS BIGINT) AS kept_score_q16
      FROM per_doc GROUP BY 1""",
    "txt_dclm_pipeline" -> s"""$cte,
      base AS (
        SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_tokens,
          md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
        FROM docs WHERE len(toks) > 0),
      grams AS (
        SELECT doc_id, source, array_to_string(toks[i:i+1], ' ') AS bg
        FROM docs CROSS JOIN UNNEST(range(1, len(toks))) AS u(i)
        WHERE len(toks) >= 2
        UNION ALL
        SELECT doc_id, source, '' AS bg FROM docs WHERE len(toks) < 2),
      wt AS (
        SELECT CAST(i AS BIGINT) AS b,
          CAST(${sqlHexVal("md5('clfw:' || CAST(i AS VARCHAR))", 4)}
            - 32768 AS BIGINT) AS w_q16
        FROM range(256) t(i)),
      feats AS (
        SELECT doc_id, CAST(${sqlHexVal("md5(bg)", 2)} AS BIGINT) AS b
        FROM grams),
      scores AS (
        SELECT doc_id, SUM(w_q16) AS score_q16
        FROM feats JOIN wt USING (b) GROUP BY 1),
      gated AS (
        SELECT b.doc_id, b.source, b.n_tokens, b.fp, s.score_q16
        FROM base b JOIN scores s ON b.doc_id = s.doc_id
        WHERE s.score_q16 > 0),
      canon AS (SELECT fp, MIN(doc_id) AS doc_id FROM gated GROUP BY 1),
      dd AS (
        SELECT g.* FROM gated g
        JOIN canon c ON g.fp = c.fp AND g.doc_id = c.doc_id),
      sel AS (
        SELECT *, SUM(n_tokens) OVER w AS cum,
               SUM(n_tokens) OVER (PARTITION BY source) AS tot
        FROM dd
        WINDOW w AS (PARTITION BY source
          ORDER BY score_q16 DESC, doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      flg AS (
        SELECT *, CAST(cum AS DOUBLE) <= CAST(tot AS DOUBLE) * $BudgetFrac
          AS keep
        FROM sel),
      allx AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS tokens
        FROM base GROUP BY 1),
      gcnt AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS clf_kept_docs
               FROM gated GROUP BY 1),
      dcnt AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS dedup_kept_docs
               FROM dd GROUP BY 1),
      scnt AS (
        SELECT source,
          CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS sel_docs,
          CAST(SUM(CASE WHEN keep THEN n_tokens ELSE 0 END) AS BIGINT)
            AS sel_tokens
        FROM flg GROUP BY 1)
      SELECT a.source, n_docs, tokens,
        CAST(COALESCE(clf_kept_docs, 0) AS BIGINT) AS clf_kept_docs,
        CAST(COALESCE(dedup_kept_docs, 0) AS BIGINT) AS dedup_kept_docs,
        CAST(COALESCE(sel_docs, 0) AS BIGINT) AS sel_docs,
        CAST(COALESCE(sel_tokens, 0) AS BIGINT) AS sel_tokens,
        CAST(COALESCE(sel_tokens, 0) AS DOUBLE) / CAST(tokens AS DOUBLE)
          AS retention
      FROM allx a
      LEFT JOIN gcnt g ON a.source = g.source
      LEFT JOIN dcnt dc ON a.source = dc.source
      LEFT JOIN scnt sc ON a.source = sc.source""",
    "txt_exact_substr" -> s"""$cte,
      sized AS (
        SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_tokens, toks
        FROM docs),
      sh AS (
        SELECT doc_id, source, CAST(i AS BIGINT) AS pos,
               array_to_string(toks[i:i+7], ' ') AS sh
        FROM sized CROSS JOIN UNNEST(range(1, len(toks) - 6)) AS u(i)
        WHERE len(toks) >= 8),
      dup AS (
        SELECT * FROM (
          SELECT doc_id, source, pos,
                 COUNT(*) OVER (PARTITION BY sh) AS n_occ
          FROM sh) WHERE n_occ > 1),
      cov AS (
        SELECT doc_id, source, pos,
               LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        FROM dup),
      per_doc AS (
        SELECT doc_id, source,
               SUM(CASE WHEN prev IS NULL THEN 8
                        ELSE LEAST(8, pos - prev) END) AS dup_tokens,
               COUNT(*) AS dup_windows
        FROM cov GROUP BY 1, 2),
      per_src AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS tokens
        FROM sized GROUP BY 1),
      dup_src AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS dup_docs,
               CAST(SUM(dup_tokens) AS BIGINT) AS dup_tokens,
               CAST(SUM(dup_windows) AS BIGINT) AS dup_windows
        FROM per_doc GROUP BY 1)
      SELECT p.source, n_docs, tokens,
        CAST(COALESCE(d.dup_docs, 0) AS BIGINT) AS dup_docs,
        CAST(COALESCE(d.dup_tokens, 0) AS BIGINT) AS dup_tokens,
        CAST(COALESCE(d.dup_windows, 0) AS BIGINT) AS dup_windows,
        CAST(COALESCE(d.dup_tokens, 0) AS DOUBLE) / CAST(tokens AS DOUBLE)
          AS dup_frac
      FROM per_src p LEFT JOIN dup_src d ON p.source = d.source""",
    "txt_exact_substr_cut" -> s"""$cte,
      sized AS (
        SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_tokens, toks
        FROM docs),
      sh AS (
        SELECT doc_id, source, CAST(i AS BIGINT) AS pos,
               array_to_string(toks[i:i+7], ' ') AS sh
        FROM sized CROSS JOIN UNNEST(range(1, len(toks) - 6)) AS u(i)
        WHERE len(toks) >= 8),
      marked AS (
        SELECT doc_id, source, pos,
               COUNT(*) OVER (PARTITION BY sh) AS n_occ,
               ROW_NUMBER() OVER (PARTITION BY sh ORDER BY doc_id, pos) AS rk
        FROM sh),
      cutw AS (
        SELECT doc_id, source, pos FROM marked WHERE n_occ > 1 AND rk > 1),
      cov AS (
        SELECT doc_id, source, pos,
               LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        FROM cutw),
      per_doc AS (
        SELECT doc_id, source,
               SUM(CASE WHEN prev IS NULL THEN 8
                        ELSE LEAST(8, pos - prev) END) AS cut_tokens,
               COUNT(*) AS cut_windows
        FROM cov GROUP BY 1, 2),
      per_src AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS tokens
        FROM sized GROUP BY 1),
      cut_src AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS docs_affected,
               CAST(SUM(cut_tokens) AS BIGINT) AS cut_tokens,
               CAST(SUM(cut_windows) AS BIGINT) AS cut_windows
        FROM per_doc GROUP BY 1)
      SELECT p.source, n_docs, tokens,
        CAST(COALESCE(c.docs_affected, 0) AS BIGINT) AS docs_affected,
        CAST(COALESCE(c.cut_windows, 0) AS BIGINT) AS cut_windows,
        CAST(COALESCE(c.cut_tokens, 0) AS BIGINT) AS cut_tokens,
        CAST(tokens - COALESCE(c.cut_tokens, 0) AS BIGINT) AS kept_tokens,
        CAST(tokens - COALESCE(c.cut_tokens, 0) AS DOUBLE) /
          CAST(tokens AS DOUBLE) AS kept_frac
      FROM per_src p LEFT JOIN cut_src c ON p.source = c.source""",
    "txt_dsir_select" -> s"""$cte,
      tok AS (
        SELECT doc_id, source,
          (strpos('0123456789abcdef', substring(md5(t), 1, 1)) - 1) * 16 +
          (strpos('0123456789abcdef', substring(md5(t), 2, 1)) - 1) AS b
        FROM (SELECT doc_id, source, unnest(toks) AS t FROM docs)),
      tc AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS tc FROM tok
             WHERE source = '$DsirTarget' GROUP BY 1),
      sc AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS sc FROM tok
             WHERE source <> '$DsirTarget' GROUP BY 1),
      tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS t_tot FROM tok
             WHERE source = '$DsirTarget'),
      st AS (SELECT CAST(COUNT(*) AS BIGINT) AS s_tot FROM tok
             WHERE source <> '$DsirTarget'),
      ratio AS (
        SELECT s.b,
          (CAST(COALESCE(t.tc, 0) + 1 AS DOUBLE) /
             CAST(tt.t_tot + $DsirBuckets AS DOUBLE)) *
          (CAST(st.s_tot + $DsirBuckets AS DOUBLE) /
             CAST(s.sc + 1 AS DOUBLE)) AS r
        FROM sc s LEFT JOIN tc t ON s.b = t.b CROSS JOIN tt CROSS JOIN st),
      lam AS (
        SELECT b, CAST(FLOOR(2.0 * (r - 1.0) / (r + 1.0) * 65536.0) AS BIGINT)
          AS lam_q16
        FROM ratio),
      score AS (
        SELECT tok.doc_id, tok.source, SUM(lam.lam_q16) AS score_q16
        FROM tok JOIN lam ON tok.b = lam.b
        WHERE tok.source <> '$DsirTarget'
        GROUP BY 1, 2),
      ranked AS (
        SELECT *,
          row_number() OVER (ORDER BY score_q16 DESC, doc_id) AS rn,
          COUNT(*) OVER () AS n_raw
        FROM score),
      flagged AS (
        SELECT *, rn <= FLOOR(CAST(n_raw AS DOUBLE) * $DsirKeepFrac) AS sel
        FROM ranked)
      SELECT source,
        CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(CASE WHEN sel THEN 1 ELSE 0 END) AS BIGINT) AS sel_docs,
        CAST(SUM(CASE WHEN sel THEN 1 ELSE 0 END) AS DOUBLE) /
          CAST(COUNT(*) AS DOUBLE) AS sel_frac,
        CAST(SUM(CASE WHEN sel THEN score_q16 ELSE 0 END) AS BIGINT)
          AS sel_score_q16,
        CAST(MIN(CASE WHEN sel THEN score_q16 END) AS BIGINT) AS cut_score_q16
      FROM flagged GROUP BY 1""",
    "txt_gopher_rules" -> s"""$cte,
      scored AS (
        SELECT source,
          CAST(len(toks) AS BIGINT) AS n_toks,
          CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) /
            CAST(len(toks) AS DOUBLE) AS mean_wl,
          CAST(len(regexp_extract_all(text, '#')) +
               len(regexp_extract_all(text, '\\.\\.\\.')) AS DOUBLE) /
            CAST(len(toks) AS DOUBLE) AS sym_ratio,
          CAST(len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE) /
            CAST(len(toks) AS DOUBLE) AS alpha_frac,
          ($sqlStopHits) AS stop_hits
        FROM docs WHERE len(toks) > 0),
      flagged AS (
        SELECT source,
          (n_toks < 50 OR n_toks > 100000) AS f_wc,
          (mean_wl < 3.0 OR mean_wl > 10.0) AS f_mwl,
          sym_ratio > 0.1 AS f_sym,
          alpha_frac < 0.8 AS f_alpha,
          stop_hits < 2 AS f_stop
        FROM scored)
      SELECT source,
        CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(CASE WHEN f_wc THEN 1 ELSE 0 END) AS BIGINT) AS fail_word_count,
        CAST(SUM(CASE WHEN f_mwl THEN 1 ELSE 0 END) AS BIGINT) AS fail_mean_word_len,
        CAST(SUM(CASE WHEN f_sym THEN 1 ELSE 0 END) AS BIGINT) AS fail_symbol_ratio,
        CAST(SUM(CASE WHEN f_alpha THEN 1 ELSE 0 END) AS BIGINT) AS fail_alpha_words,
        CAST(SUM(CASE WHEN f_stop THEN 1 ELSE 0 END) AS BIGINT) AS fail_stop_words,
        CAST(SUM(CASE WHEN NOT(f_wc OR f_mwl OR f_sym OR f_alpha OR f_stop)
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
        CAST(SUM(CASE WHEN NOT(f_wc OR f_mwl OR f_sym OR f_alpha OR f_stop)
                 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS pass_frac
      FROM flagged GROUP BY 1""",
    "txt_rag_chunks" -> s"""$cte,
      sized AS (
        SELECT source, doc_id, toks, CAST(len(toks) AS BIGINT) AS n_toks,
          CASE WHEN len(toks) <= $ChunkW THEN 1
               ELSE 1 + (CAST(len(toks) AS BIGINT) - ${ChunkW - ChunkS + 1}) // $ChunkS
          END AS n_chunks
        FROM docs WHERE len(toks) > 0),
      ch AS (
        SELECT source, doc_id, n_toks, i,
          md5(array_to_string(toks[(i*$ChunkS + 1):(i*$ChunkS + $ChunkW)], ' ')) AS h,
          LEAST($ChunkW, n_toks - i*$ChunkS) AS clen
        FROM sized CROSS JOIN UNNEST(range(0, n_chunks)) AS u(i)),
      freq AS (SELECT h, COUNT(*) AS freq FROM ch GROUP BY 1)
      SELECT source,
        CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
        CAST(COUNT(*) AS BIGINT) AS n_chunks,
        CAST(SUM(clen) AS BIGINT) AS chunk_tokens,
        CAST(SUM(CASE WHEN i = 0 THEN n_toks ELSE 0 END) AS BIGINT) AS doc_tokens,
        CAST(SUM(CASE WHEN freq > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_chunks,
        CAST(SUM(clen) - SUM(CASE WHEN i = 0 THEN n_toks ELSE 0 END) AS DOUBLE) /
          CAST(SUM(clen) AS DOUBLE) AS overlap_frac
      FROM ch JOIN freq USING (h) GROUP BY 1""",
    "txt_span_dedup" -> s"""$cte,
      spans AS (
        SELECT doc_id, i AS span_idx,
               array_to_string(toks[(i*8+1):(i*8+8)], ' ') AS span
        FROM docs CROSS JOIN UNNEST(range(0, (len(toks) + 7) // 8)) AS u(i)),
      ranked AS (
        SELECT doc_id, span,
               ROW_NUMBER() OVER (PARTITION BY span ORDER BY doc_id, span_idx) AS rk
        FROM spans)
      SELECT doc_id,
        CAST(COUNT(*) AS BIGINT) AS n_spans,
        CAST(SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        CAST(COUNT(*) - SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        CAST(SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS kept_frac
      FROM ranked GROUP BY 1""",
    "txt_dup_ngram_frac" -> s"""$cte,
      grams AS (
        SELECT doc_id, array_to_string(toks[i:i+2], ' ') AS tri
        FROM docs CROSS JOIN UNNEST(range(1, len(toks) - 1)) AS u(i)
        WHERE len(toks) >= 3),
      counted AS (SELECT doc_id, tri, COUNT(*) AS n FROM grams GROUP BY 1, 2)
      SELECT doc_id,
        CAST(SUM(n) AS BIGINT) AS n_trigrams,
        CAST(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS dup_mass,
        CAST(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS DOUBLE) / SUM(n) AS dup_frac
      FROM counted GROUP BY 1""",
    "txt_repetition" -> s"""$cte,
      grams AS (
        SELECT doc_id, array_to_string(toks[i:i+1], ' ') AS bigram
        FROM docs CROSS JOIN UNNEST(range(1, len(toks))) AS u(i)
        WHERE len(toks) >= 2),
      counted AS (SELECT doc_id, bigram, COUNT(*) AS n FROM grams GROUP BY 1, 2),
      top AS (
        SELECT doc_id, bigram AS top_bigram, n AS top_bigram_n FROM (
          SELECT doc_id, bigram, n,
                 ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY n DESC, bigram) AS rk
          FROM counted) WHERE rk = 1),
      stats AS (
        SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks,
          CAST(CASE WHEN len(toks) >= 2
                 THEN len(list_filter(range(1, len(toks)), i -> toks[i] = toks[i+1]))
                 ELSE 0 END AS BIGINT) AS n_adj_dup
        FROM docs)
      SELECT s.doc_id, (n_toks - 1) AS n_bigrams, top_bigram,
             CAST(top_bigram_n AS BIGINT) AS top_bigram_n,
             CASE WHEN n_toks - 1 > 0
               THEN CAST(top_bigram_n AS DOUBLE) / CAST(n_toks - 1 AS DOUBLE)
               ELSE 0.0 END AS top_bigram_frac,
             n_adj_dup,
             CASE WHEN n_toks - 1 > 0
               THEN CAST(n_adj_dup AS DOUBLE) / CAST(n_toks - 1 AS DOUBLE)
               ELSE 0.0 END AS adj_dup_frac
      FROM stats s JOIN top USING (doc_id)""",
    "txt_contamination" -> s"""$cte,
      sh AS (
        SELECT DISTINCT doc_id, array_to_string(toks[i:i+7], ' ') AS sh
        FROM docs CROSS JOIN UNNEST(range(1, len(toks) - 6)) AS u(i)
        WHERE len(toks) >= 8),
      probes AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 10),
      corpus AS (SELECT doc_id, sh FROM sh WHERE doc_id >= 10),
      per AS (SELECT doc_id, COUNT(*) AS n_shingles FROM corpus GROUP BY 1),
      hits AS (
        SELECT c.doc_id, COUNT(*) AS n_cont
        FROM corpus c JOIN probes p ON c.sh = p.sh GROUP BY 1)
      SELECT per.doc_id, CAST(n_shingles AS BIGINT) AS n_shingles,
             CAST(COALESCE(n_cont, 0) AS BIGINT) AS n_contaminated,
             CAST(COALESCE(n_cont, 0) AS DOUBLE) / CAST(n_shingles AS DOUBLE)
               AS contamination_rate
      FROM per LEFT JOIN hits ON per.doc_id = hits.doc_id
      ORDER BY contamination_rate DESC, per.doc_id LIMIT 20""",
    "txt_clean_pipeline" -> s"""$cte,
      scored AS (
        SELECT doc_id, lang,
          CAST(len(toks) AS BIGINT) AS n_tokens,
          (CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE)) * 0.5 +
          (CAST(${sqlMarker(enWords)} AS DOUBLE) / CAST(len(toks) AS DOUBLE)) * 0.3 +
          LEAST(CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) / CAST(len(toks) AS DOUBLE) / 10.0, 1.0) * 0.2 AS quality_score,
          md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
        FROM docs),
      surviving AS (SELECT * FROM scored WHERE quality_score >= 0.35),
      keep AS (SELECT fingerprint, MIN(doc_id) AS doc_id FROM surviving GROUP BY 1)
      SELECT lang, COUNT(*) AS n_docs,
        CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        CAST(SUM(FLOOR(quality_score * 1e6)) AS BIGINT) AS quality_micro_sum
      FROM surviving JOIN keep USING (fingerprint, doc_id)
      GROUP BY 1""",
    "txt_redact_pii" -> s"""$cte,
      dirtied AS (
        SELECT source,
          text
          || CASE WHEN doc_id % 3 = 0 THEN ' reach user' || CAST(doc_id AS VARCHAR) || '@mail.example.com' ELSE '' END
          || CASE WHEN doc_id % 5 = 0 THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
          || CASE WHEN doc_id % 7 = 0 THEN ' from 10.' || CAST(doc_id % 200 AS VARCHAR) || '.' || CAST((doc_id * 3) % 250 AS VARCHAR) || '.' || CAST(doc_id % 250 AS VARCHAR) ELSE '' END
          AS dirty
        FROM docs),
      red AS (
        SELECT source, dirty,
          regexp_replace(regexp_replace(regexp_replace(dirty,
            '$EmailRe', '<EMAIL>', 'g'),
            '$Ipv4Re', '<IP>', 'g'),
            '$PhoneRe', '<PHONE>', 'g') AS redacted
        FROM dirtied)
      SELECT source,
        COUNT(*) AS n_docs,
        CAST(SUM(CASE WHEN dirty <> redacted THEN 1 ELSE 0 END) AS BIGINT) AS pii_docs,
        CAST(SUM(len(regexp_extract_all(dirty, '$EmailRe'))) AS BIGINT) AS n_emails,
        CAST(SUM(len(regexp_extract_all(dirty, '$Ipv4Re'))) AS BIGINT) AS n_ips,
        CAST(SUM(len(regexp_extract_all(dirty, '$PhoneRe'))) AS BIGINT) AS n_phones,
        CAST(SUM(len(regexp_extract_all(redacted, '$EmailRe')))
           + SUM(len(regexp_extract_all(redacted, '$Ipv4Re')))
           + SUM(len(regexp_extract_all(redacted, '$PhoneRe'))) AS BIGINT) AS residual_pii,
        COUNT(DISTINCT md5(redacted)) AS distinct_redacted,
        MIN(md5(redacted)) AS sample_hash
      FROM red GROUP BY 1""",
    "txt_length_buckets" -> s"""$cte,
      sized AS (
        SELECT CAST(len(toks) AS BIGINT) AS n_toks FROM docs
        WHERE len(toks) > 0),
      capped AS (SELECT n_toks, $capCaseSql AS cap FROM sized)
      SELECT cap,
        COUNT(*) AS n_docs,
        CAST(SUM(n_toks) AS BIGINT) AS real_tokens,
        CAST(SUM(cap) - SUM(n_toks) AS BIGINT) AS pad_tokens,
        (CAST(SUM(cap) - SUM(n_toks) AS DOUBLE) / CAST(SUM(cap) AS DOUBLE))
          AS pad_ratio
      FROM capped GROUP BY 1""",
    "txt_pack_sequences" -> packSql,
    // the sharded two-phase offsets are output-identical by construction —
    // the ONE oracle text checks both computations against the same answer
    "txt_pack_sequences_sharded" -> packSql,
    "txt_source_mix" -> s"""$cte,
      sized AS (
        SELECT source, doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM docs),
      totals AS (
        SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS tok_s FROM sized GROUP BY 1),
      grand AS (SELECT CAST(SUM(tok_s) AS BIGINT) AS tok_total FROM totals),
      rated AS (
        SELECT source, tok_s,
          LEAST(1.0, (0.1 * CAST(tok_total AS DOUBLE)) / CAST(tok_s AS DOUBLE)) AS rate,
          CAST(FLOOR(LEAST(1.0, (0.1 * CAST(tok_total AS DOUBLE)) / CAST(tok_s AS DOUBLE)) * 65536.0) AS BIGINT) AS threshold
        FROM totals CROSS JOIN grand),
      hashed AS (
        SELECT s.source, s.n_tokens, r.tok_s, r.rate, r.threshold,
          CAST(
            (strpos('0123456789abcdef', substring(md5(CAST(s.doc_id AS VARCHAR)), 1, 1)) - 1) * 4096 +
            (strpos('0123456789abcdef', substring(md5(CAST(s.doc_id AS VARCHAR)), 2, 1)) - 1) * 256 +
            (strpos('0123456789abcdef', substring(md5(CAST(s.doc_id AS VARCHAR)), 3, 1)) - 1) * 16 +
            (strpos('0123456789abcdef', substring(md5(CAST(s.doc_id AS VARCHAR)), 4, 1)) - 1)
            AS BIGINT) AS h16
        FROM sized s JOIN rated r USING (source))
      SELECT source, tok_s, rate,
        CAST(SUM(CASE WHEN h16 < threshold THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
        CAST(SUM(CASE WHEN h16 < threshold THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens
      FROM hashed GROUP BY 1, 2, 3""",
    "txt_tfidf" -> s"""$cte,
      tok AS (SELECT doc_id, UNNEST(toks) AS term FROM docs),
      tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
      dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      total AS (SELECT COUNT(*) AS n_docs FROM docs),
      scored AS (
        SELECT doc_id, term, tf, df,
               CAST(tf AS DOUBLE) * CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE) AS score
        FROM tf JOIN dfreq USING (term) CROSS JOIN total
        WHERE doc_id < 30),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                    ORDER BY score DESC, term) AS rk
        FROM scored)
      SELECT doc_id, CAST(rk AS BIGINT) AS rk, term, tf, df, score
      FROM ranked WHERE rk <= 3""",
    "txt_token_stats" -> s"""$cte
      SELECT lang, COUNT(*) AS n_docs,
        CAST(SUM(len(toks)) AS BIGINT) AS total_tokens,
        CAST(SUM(len(toks)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_tokens_per_doc,
        CAST(MIN(len(toks)) AS BIGINT) AS min_tokens,
        CAST(MAX(len(toks)) AS BIGINT) AS max_tokens
      FROM docs GROUP BY 1""",
    "txt_lang_confusion" -> s"""$cte,
      scored AS (
        SELECT lang,
          len(regexp_extract_all(text, '[^\\x00-\\x7F]')) AS nonascii,
          ${sqlMarker(enWords)} AS v_en, ${sqlMarker(deWords)} AS v_de,
          ${sqlMarker(frWords)} AS v_fr, ${sqlMarker(esWords)} AS v_es,
          n_chars
        FROM docs)
      SELECT lang,
        CASE WHEN CAST(nonascii AS DOUBLE) / CAST(n_chars AS DOUBLE) > 0.3 THEN 'zh'
             WHEN v_de > v_en AND v_de >= v_fr AND v_de >= v_es THEN 'de'
             WHEN v_fr > v_en AND v_fr >= v_es THEN 'fr'
             WHEN v_es > v_en THEN 'es'
             ELSE 'en' END AS predicted_lang,
        COUNT(*) AS n
      FROM scored GROUP BY 1, 2""",
    "txt_quality" -> s"""$cte
      SELECT doc_id,
        CAST(len(toks) AS BIGINT) AS n_tokens,
        CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq,
        CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS uniq_ratio,
        CAST(${sqlMarker(enWords)} AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS stop_ratio,
        CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS avg_token_len,
        (CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE)) * 0.5 +
        (CAST(${sqlMarker(enWords)} AS DOUBLE) / CAST(len(toks) AS DOUBLE)) * 0.3 +
        LEAST(CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) / CAST(len(toks) AS DOUBLE) / 10.0, 1.0) * 0.2 AS quality_score
      FROM docs""",
    "txt_fingerprint" -> s"""$cte
      SELECT doc_id,
        md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint,
        substring(md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')), 1, 2) AS bucket
      FROM docs""",
    "txt_ngram_top" -> s"""$cte,
      grams AS (
        SELECT array_to_string(toks[i:i+2], ' ') AS ngram
        FROM docs CROSS JOIN UNNEST(range(1, len(toks) - 1)) AS u(i)
        WHERE len(toks) >= 3)
      SELECT ngram, COUNT(*) AS n FROM grams
      GROUP BY 1 ORDER BY n DESC, ngram LIMIT 20""",
    "txt_token_classes" -> s"""$cte
      SELECT source,
        CAST(SUM(len(regexp_extract_all(text, '[a-z]+'))) AS BIGINT) AS word_runs,
        CAST(SUM(len(regexp_extract_all(text, '[0-9]+'))) AS BIGINT) AS number_runs,
        CAST(SUM(len(regexp_extract_all(text, '[^a-z0-9\\s]'))) AS BIGINT) AS symbol_chars,
        COUNT(*) AS n_docs
      FROM docs GROUP BY 1""",
  )
}
