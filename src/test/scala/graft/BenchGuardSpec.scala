package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's contention guard, replayed against synthetic loads —
  * including the exact round-6 failure shape (one 1015 s round against a
  * 600 s budget produced an unusable repeat=1 artifact). */
class BenchGuardSpec extends AnyFunSuite {

  private val budget = 600000L // 600 s in ms

  test("round 1 always runs") {
    assert(BenchGuard.shouldRunAnother(Nil, 0, 0, 3, budget, 5))
  }

  test("quiet host: stop at repeat, spread under the limit") {
    val totals = Seq(100.0, 110.0, 105.0)
    assert(!BenchGuard.isContended(totals, budget))
    assert(!BenchGuard.shouldRunAnother(totals, 315000, 105000, 3, budget, 5))
  }

  test("quiet host: budget projection still stops a slow-but-consistent run") {
    // one 400 s round, 600 s budget: the projected second round does not
    // fit and nothing indicates contention — stop (the pre-guard behavior)
    val totals = Seq(400.0)
    assert(!BenchGuard.isContended(totals, budget))
    assert(!BenchGuard.shouldRunAnother(totals, 400000, 400000, 3, budget, 5))
  }

  test("round-6 replay: a round that blew the whole budget forces extra rounds") {
    // BENCH_r06: round 1 took 1015 s against the 600 s budget; the old
    // guard stopped with repeat=1 and no medians. The guard must instead
    // keep going (elapsed 1015 s < 2 x budget) so a median exists.
    val totals = Seq(1015.0)
    assert(BenchGuard.isContended(totals, budget))
    assert(BenchGuard.shouldRunAnother(totals, 1015000, 1015000, 3, budget, 5))
    // and the hard stop still bounds it: after two such rounds the 2x
    // elapsed budget is spent
    assert(!BenchGuard.shouldRunAnother(Seq(1015.0, 980.0), 1995000, 980000, 3, budget, 5))
  }

  test("spread >3x across rounds marks contention and buys extra rounds") {
    // three fast-ish rounds with one 4x outlier: contended, rounds remain
    // under the cap, elapsed far under 2x budget -> run more
    val totals = Seq(100.0, 380.0, 95.0)
    assert(BenchGuard.isContended(totals, budget))
    assert(BenchGuard.shouldRunAnother(totals, 575000, 95000, 3, budget, 5))
    // consistent equivalents do not
    assert(!BenchGuard.isContended(Seq(100.0, 120.0, 95.0), budget))
  }

  test("maxRounds caps contended runs") {
    val totals = Seq(100.0, 380.0, 95.0, 97.0, 101.0)
    assert(BenchGuard.isContended(totals, budget))
    assert(!BenchGuard.shouldRunAnother(totals, 773000, 101000, 3, budget, 5))
  }

  test("contended extra rounds respect the 2x elapsed hard stop") {
    val totals = Seq(100.0, 380.0, 95.0)
    assert(!BenchGuard.shouldRunAnother(totals, 2 * budget, 95000, 3, budget, 5))
  }

  // --- self-adjudication: trusted_total + per-query outlier marks ---

  /** The BENCH_r07 shape in miniature: a contention wave inflates a
    * DIFFERENT subset of queries in each round (ana_revenue 116x in round
    * 1, dedup 40x in round 2), so the per-query MEDIAN carries junk — but
    * every query has at least one quiet measurement, and min-of-rounds
    * recovers it. */
  private val quiet = Map("q1" -> 1.0, "q2" -> 2.0, "q3" -> 0.5)
  private val r07Shape = Seq(
    Map("q1" -> 116.0, "q2" -> 2.1, "q3" -> 0.55), // wave hits q1
    Map("q1" -> 1.05, "q2" -> 80.0, "q3" -> 0.5),  // wave hits q2
    Map("q1" -> 30.0, "q2" -> 2.0, "q3" -> 12.0))  // wave hits q1+q3

  test("trusted_total recovers a usable number from contention-junk rounds") {
    val trusted = BenchGuard.trustedTotal(r07Shape)
    val quietTotal = quiet.values.sum // 3.5
    assert(trusted == 1.05 + 2.0 + 0.5, s"per-query minimum: $trusted")
    assert(trusted <= 1.5 * quietTotal,
      s"trusted_total $trusted must land within 1.5x of the quiet baseline $quietTotal")
    // while the medians over the same rounds are junk (30 + 2.1 + 0.55)
    assert(r07Shape.map(_("q1")).sorted.apply(1) == 30.0)
  }

  test("outliers flag only queries whose BEST round misses the baseline by >3x") {
    // q1's best round is 1.05x baseline -> clean; a query that never saw a
    // quiet round (best 4x) is flagged; a new query with no baseline never is
    val rounds = Seq(
      Map("q1" -> 116.0, "slow" -> 4.0, "fresh" -> 9.0),
      Map("q1" -> 1.05, "slow" -> 4.2, "fresh" -> 9.1))
    val base = Map("q1" -> 1.0, "slow" -> 1.0)
    assert(BenchGuard.outliers(rounds, base) == Seq("slow"))
    // a 2x miss is within normal host variance -> not flagged
    assert(BenchGuard.outliers(Seq(Map("slow" -> 2.0)), base).isEmpty)
  }

  test("trusted_total and outliers are total on empty input") {
    assert(BenchGuard.trustedTotal(Nil) == 0.0)
    assert(BenchGuard.outliers(Nil, Map("q" -> 1.0)).isEmpty)
  }

  test("trusted_total and outliers survive rounds with missing queries") {
    // a query that errored in round 1 (no entry) but ran in round 2 still
    // contributes its one good measurement; one that never ran contributes 0
    val rounds = Seq(Map("q2" -> 2.0), Map("q1" -> 1.0, "q2" -> 2.2))
    assert(BenchGuard.trustedTotal(rounds) == 3.0)
    assert(BenchGuard.outliers(rounds, Map("q1" -> 1.0, "q2" -> 0.5)) == Seq("q2"))
  }

  // --- r9 guard miss: blown baseline with an under-limit spread ---

  test("r9 replay: best round 2.6x the committed baseline total is contended") {
    // BENCH_r09: round totals 192/195/115 s (spread 1.69x, under SpreadLimit)
    // against a committed 44 s baseline total, with load rising 2.9 -> 9.2.
    // The old guard said contended=false; the best round never getting
    // within 2x of baseline must now trigger it and buy extra rounds.
    val totals = Seq(192.1, 195.5, 115.4)
    val baselineTotal = 44.05
    assert(!BenchGuard.isContended(totals, budget)) // the r9 miss, preserved
    assert(BenchGuard.baselineBlown(totals, baselineTotal))
    assert(BenchGuard.shouldRunAnother(totals, 503000, 115400, 3, budget, 5,
      extraContended = BenchGuard.baselineBlown(totals, baselineTotal)))
  }

  test("blown-baseline trigger: quiet runs and absent baselines never fire") {
    assert(!BenchGuard.baselineBlown(Seq(45.0, 46.0, 44.0), 44.05)) // at baseline
    assert(!BenchGuard.baselineBlown(Seq(80.0, 200.0), 44.05)) // one round escaped
    assert(!BenchGuard.baselineBlown(Seq(500.0), 0.0)) // no baseline recorded
    assert(!BenchGuard.baselineBlown(Nil, 44.05)) // no rounds yet
  }

  // --- r14 guard miss: repeat=2 published a contaminated mean ---

  test("r14 replay: 2-round totals 146.2/314.1 must force a third round") {
    // BENCH_r14: the driver's run stopped after 2 rounds (projected round 3
    // did not fit the budget), totals 146.2/314.1 s — spread 2.15x, under
    // the 3x limit — and published their 230 s MEAN as contended:false on
    // code the judge then measured at 74 s. At exactly 2 rounds there is no
    // robust estimator, so the tighter 1.5x spread limit must mark the run
    // contended and buy the third round.
    val totals = Seq(146.2, 314.1)
    assert(BenchGuard.isContended(totals, budget))
    assert(BenchGuard.shouldRunAnother(totals, 460300, 314100, 3, budget, 5))
    // a quiet 2-round stop (projection says round 3 does not fit) is
    // unaffected: spread 1.04 stays under even the tight limit
    assert(!BenchGuard.isContended(Seq(290.0, 302.0), budget))
    assert(!BenchGuard.shouldRunAnother(Seq(290.0, 302.0), 592000, 302000, 3, budget, 5))
  }

  // --- r17 guard miss: repeat=3 with TWO contaminated rounds ---

  test("r17 replay: 3-round totals 147.3/97.7/209.9 must force a fourth round") {
    // BENCH_r17: 2.15x spread sailed under the 3.0 bar and published
    // 109 s medians as contended:false that the judge's quiet re-measure
    // put at 78-96 s — at n=3 the median tolerates only ONE bad round.
    val totals = Seq(147.3, 97.7, 209.9)
    assert(BenchGuard.isContended(totals, budget))
    assert(BenchGuard.shouldRunAnother(totals, 455000, 209900, 3, budget, 5))
    // a genuinely quiet 3-round stop is unaffected (spread 1.16)
    assert(!BenchGuard.isContended(Seq(100.0, 116.0, 105.0), budget))
    // and from n=4 the median is robust to two bad rounds: the 3x limit
    // stands so one more noisy-but-settling round can end the run
    assert(!BenchGuard.isContended(Seq(100.0, 210.0, 95.0, 101.0), budget))
  }

  test("estimate: min at exactly 2 samples, true median otherwise") {
    // one contaminated round of two: the old mean published 2.3x truth;
    // the min publishes the quiet round
    assert(BenchGuard.estimate(Seq(146.2, 314.1)) == 146.2)
    // quiet 2-round pair: min ~= either sample
    assert(BenchGuard.estimate(Seq(1.00, 1.04)) == 1.00)
    // >=3 samples keep the median (robust to the one bad round)
    assert(BenchGuard.estimate(Seq(1.0, 50.0, 1.2)) == 1.2)
    assert(BenchGuard.estimate(Seq(1.0, 2.0, 3.0, 100.0)) == 2.5)
    assert(BenchGuard.estimate(Seq(7.0)) == 7.0)
    assert(BenchGuard.estimate(Nil) == 0.0)
  }

  // --- loud failures: a throwing query must never become a "timing" ---

  test("a throwing query lands in errors, not in the timing map") {
    val queries: Seq[(String, () => Unit)] = Seq(
      "ok_a" -> (() => ()),
      "boom" -> (() => throw new IllegalStateException("ts column \"broke\"\nbadly")),
      "ok_b" -> (() => ()))
    val (times, errs) = Bench.runRound(queries)
    assert(times.map(_._1) == Seq("ok_a", "ok_b")) // 2 of 3 measured
    assert(errs.keySet == Set("boom"))
    assert(errs("boom").startsWith("IllegalStateException:"))
    assert(!errs("boom").contains("\n"), "message must be single-line for the JSON artifact")
    // and the artifact fields derived from this shape stay honest:
    // n_queries_ok = total - errors
    assert(queries.size - errs.size == 2)
    // the error text survives JSON escaping as a parseable string
    val json = s"""{"errors":{${Bench.jstr("boom")}: ${Bench.jstr(errs("boom"))}}}"""
    val parsed = graft.http.Json.parse(json).asObj("errors").asObj
    assert(parsed.keySet == Set("boom"))
  }
}
