package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopKAgg
import graft.functions.TopKAgg.In

/** Pure-logic coverage of the bounded top-k Aggregator: reduce capping,
  * merge order-independence, total tie-break. (The distributed path is
  * oracle-checked by rel_topk_agg.) */
class TopKAggSpec extends AnyFunSuite {

  private val agg = new TopKAgg(3)

  private def reduceAll(xs: Seq[In]): Seq[In] =
    xs.foldLeft(agg.zero)(agg.reduce)

  test("reduce keeps only the k best, ordered desc by (score, key)") {
    val r = reduceAll(Seq(In(1.0, 1), In(5.0, 2), In(3.0, 3), In(4.0, 4), In(2.0, 5)))
    assert(r == Seq(In(5.0, 2), In(4.0, 4), In(3.0, 3)))
  }

  test("equal scores break ties on key desc, totally") {
    val r = reduceAll(Seq(In(2.0, 10), In(2.0, 30), In(2.0, 20), In(2.0, 40)))
    assert(r == Seq(In(2.0, 40), In(2.0, 30), In(2.0, 20)))
  }

  test("merge is partition-order independent") {
    val xs = Seq(In(9.0, 1), In(7.0, 2), In(5.0, 3))
    val ys = Seq(In(8.0, 4), In(6.0, 5))
    assert(agg.merge(xs, ys) == agg.merge(ys, xs))
    assert(agg.merge(xs, ys) == Seq(In(9.0, 1), In(8.0, 4), In(7.0, 2)))
    assert(agg.merge(agg.zero, xs) == xs)
  }

  test("fewer than k inputs pass through") {
    assert(reduceAll(Seq(In(1.0, 1))) == Seq(In(1.0, 1)))
    assert(reduceAll(Nil) == Nil)
  }
}
