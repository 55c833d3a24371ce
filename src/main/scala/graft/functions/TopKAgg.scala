package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed `Aggregator`: keeps the k largest
  * (score, key) pairs — ordered by score then key, both descending — in a
  * fixed-size buffer that is MERGEABLE across partitions.
  *
  * This is the aggregation-shaped alternative to `row_number() OVER
  * (PARTITION BY g ORDER BY s DESC) <= k`: the window form shuffles and
  * sorts EVERY row of each group; this form does partial top-k map-side and
  * shuffles at most k rows per group per partition — the right plan when
  * groups are huge and k is small (the 100 TB "top products per category"
  * shape). Determinism: the (score, key) order is total, so the result is
  * independent of partitioning and merge order.
  */
class TopKAgg(k: Int)
    extends Aggregator[TopKAgg.In, Seq[TopKAgg.In], Seq[TopKAgg.In]] {
  require(k > 0, s"k must be positive, got $k")

  private val ord: Ordering[TopKAgg.In] =
    Ordering.by((e: TopKAgg.In) => (-e.score, -e.key))

  override def zero: Seq[TopKAgg.In] = Vector.empty

  override def reduce(buf: Seq[TopKAgg.In], a: TopKAgg.In): Seq[TopKAgg.In] =
    if (buf.size < k) (buf :+ a).sorted(ord)
    else if (ord.lt(a, buf.last)) (buf.init :+ a).sorted(ord)
    else buf

  override def merge(x: Seq[TopKAgg.In], y: Seq[TopKAgg.In]): Seq[TopKAgg.In] =
    (x ++ y).sorted(ord).take(k)

  override def finish(r: Seq[TopKAgg.In]): Seq[TopKAgg.In] = r

  override def bufferEncoder: Encoder[Seq[TopKAgg.In]] = TopKAgg.seqEnc
  override def outputEncoder: Encoder[Seq[TopKAgg.In]] = TopKAgg.seqEnc
}

object TopKAgg {
  /** One scored element; `key` both identifies the row and breaks ties. */
  final case class In(score: Double, key: Long)

  private[functions] val seqEnc: Encoder[Seq[In]] = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    ExpressionEncoder[Seq[In]]()
  }
}
