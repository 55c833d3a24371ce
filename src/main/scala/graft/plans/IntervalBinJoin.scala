package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DateType, DayTimeIntervalType, TimestampNTZType, TimestampType}

/** Optimizer rule: rewrite the natural interval-range theta join
  *
  * {{{ fact JOIN iv ON fact.t >= iv.lo AND fact.t < iv.lo + INTERVAL d }}}
  *
  * — which Catalyst can only plan as a broadcast-nested-loop / cartesian
  * product (every fact row probes every interval) — into a day-binned
  * equi-join plus an exact-range refine filter:
  *
  * {{{
  * SELECT <original output> FROM
  *   (fact + bin = date(t)) JOIN (iv × explode([date(lo) … date(lo)+n]))
  *   ON bin = bin_i
  * WHERE t >= lo AND t < lo + d        -- original predicate, kept verbatim
  * }}}
  *
  * Each fact row carries exactly one bin; each interval spans at most
  * `ceil(d / 1 day) + 1` bins (a constant), so the join is a plain hash /
  * sort-merge equi-join whose probe cost is O(intervals-sharing-the-bin)
  * per fact row instead of O(all intervals). The refine filter removes the
  * boundary false-positives, so results are bit-identical to the naive
  * plan. This is the optimization that makes user-written range joins
  * survive a 100 TB fact table; the manual form of the same plan is
  * [[graft.operators.TemporalJoinQueries.rangeJoin]].
  *
  * Scope guards (the rule must never fire on something it can't prove):
  * inner joins only; both bound conjuncts reference the SAME timestamp `t`
  * (one side) and lower bound `lo` (other side), both deterministic,
  * typed timestamp/timestamp_ntz; the interval is a positive foldable
  * day-time literal. The rewritten join's condition is a bare equality, so
  * the rule cannot re-match its own output (no fixed-point loops).
  */
object IntervalBinJoinRule extends Rule[LogicalPlan] {

  private val DayUs = 86400000000L

  private def isTs(e: Expression): Boolean = e.dataType match {
    case TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** Extract (t, lo, duration-micros) from `t >= lo AND t < lo + d`,
    * tolerating operand/conjunct order variants. */
  private def split(cond: Expression): Option[(Expression, Expression, Long)] = {
    def upper(e: Expression): Option[(Expression, Expression, Long)] = e match {
      case LessThan(t, ta: TimestampAddInterval) => fromAdd(t, ta)
      case GreaterThan(ta: TimestampAddInterval, t) => fromAdd(t, ta)
      case _ => None
    }
    def fromAdd(t: Expression, ta: TimestampAddInterval) = ta.interval match {
      case Literal(v: Long, _: DayTimeIntervalType) if v > 0 => Some((t, ta.start, v))
      case _ => None
    }
    def lowerMatches(e: Expression, t: Expression, lo: Expression): Boolean = e match {
      case GreaterThanOrEqual(x, y) => x.semanticEquals(t) && y.semanticEquals(lo)
      case LessThanOrEqual(y, x) => x.semanticEquals(t) && y.semanticEquals(lo)
      case _ => false
    }
    cond match {
      case And(a, b) =>
        upper(b).filter { case (t, lo, _) => lowerMatches(a, t, lo) }
          .orElse(upper(a).filter { case (t, lo, _) => lowerMatches(b, t, lo) })
      case _ => None
    }
  }

  /** Above this, the per-interval bin explosion outweighs the nested-loop
    * it replaces; the rule declines and leaves the plan alone. */
  private val MaxBinsPerInterval = 366

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // Batch-only: streaming joins derive state-cleanup bounds from the join
    // condition itself — moving the range predicate into a post-join Filter
    // would make it invisible to watermark/state management.
    case j @ Join(left, right, Inner, Some(cond), _)
        if !left.isStreaming && !right.isStreaming =>
      split(cond) match {
        case Some((t, lo, durUs))
            if t.deterministic && lo.deterministic && isTs(t) && isTs(lo) &&
              t.references.nonEmpty && lo.references.nonEmpty &&
              Math.floorDiv(durUs - 1, DayUs) + 2 <= MaxBinsPerInterval =>
          if (t.references.subsetOf(left.outputSet) &&
              lo.references.subsetOf(right.outputSet)) {
            rewrite(j, left, right, t, lo, durUs, probeIsLeft = true)
          } else if (t.references.subsetOf(right.outputSet) &&
              lo.references.subsetOf(left.outputSet)) {
            rewrite(j, right, left, t, lo, durUs, probeIsLeft = false)
          } else j
        case _ => j
      }
  }

  private def rewrite(
      j: Join, probe: LogicalPlan, intervals: LogicalPlan,
      t: Expression, lo: Expression, durUs: Long,
      probeIsLeft: Boolean): LogicalPlan = {
    val tz = Some(conf.sessionLocalTimeZone)
    // Interval [lo, lo+d) can touch dates date(lo) .. date(lo)+nDays.
    val nDays = (Math.floorDiv(durUs - 1, DayUs) + 1).toInt
    // Size guard: when the probe side is small enough to broadcast, Catalyst
    // plans the naive theta join as a broadcast-nested-loop — linear in the
    // interval side with no shuffle. Exploding a vastly larger interval side
    // by nDays+1 and shuffling it would replace that cheap plan with a
    // strictly worse one, so decline. When neither side is broadcastable the
    // naive plan degenerates to a cartesian product and the rewrite always
    // wins, whatever the size ratio.
    val bcast = conf.autoBroadcastJoinThreshold
    if (bcast > 0 && probe.stats.sizeInBytes <= bcast &&
        intervals.stats.sizeInBytes > probe.stats.sizeInBytes * (nDays + 1))
      return j
    val probeBin = Alias(Cast(t, DateType, tz), "graft_bin_t")()
    val probeProj = Project(probe.output :+ probeBin, probe)
    val loDate = Cast(lo, DateType, tz)
    val binArray = CreateArray((0 to nDays).map(i => DateAdd(loDate, Literal(i))))
    val binAttr = AttributeReference("graft_bin_i", DateType)()
    val gen = Generate(Explode(binArray), Nil, outer = false, None,
      Seq(binAttr), intervals)
    val eq = EqualTo(probeBin.toAttribute, binAttr)
    val (l, r) = if (probeIsLeft) (probeProj, gen) else (gen, probeProj)
    val binned = Join(l, r, Inner, Some(eq), j.hint)
    Project(j.output, Filter(j.condition.get, binned))
  }
}
