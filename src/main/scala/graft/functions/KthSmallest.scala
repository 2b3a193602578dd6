package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** k-th smallest value per group as a typed [[Aggregator]] (the
  * Dataset-native UDAF API): each partial state is the k smallest
  * values seen so far, so map-side combine ships AT MOST k doubles per
  * group per partition — a bounded-state alternative to windowing the
  * whole group through a sort. reduce/merge are commutative and
  * associative (value-based, order-free), which is exactly the
  * contract partial aggregation needs; the result is deterministic
  * under any shuffle order.
  *
  * Groups with fewer than k values yield NaN — callers comparing
  * against a SQL oracle must FILTER such groups out (`!isnan(...)`),
  * because the oracle idiom `WHERE rn = k` drops them structurally
  * (q65 does; see RelationalNext).
  */
class KthSmallest(k: Int) extends Aggregator[Double, Seq[Double], Double] {
  require(k >= 1, s"k must be positive: $k")

  override def zero: Seq[Double] = Seq.empty

  override def reduce(buf: Seq[Double], v: Double): Seq[Double] =
    if (buf.size == k && v >= buf.last) buf
    else (buf :+ v).sorted.take(k)

  override def merge(a: Seq[Double], b: Seq[Double]): Seq[Double] =
    (a ++ b).sorted.take(k)

  override def finish(r: Seq[Double]): Double =
    if (r.size < k) Double.NaN else r.last

  override def bufferEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
