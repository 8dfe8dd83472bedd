package graft.core

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed one-pass co-moment aggregator (the optional custom-aggregate
  * surface from SURVEY.md §2.2/§7.3): folds a stream of co-rating
  * pairs into the six moments the metric layer consumes, in a single
  * pass with a tiny mutable-free buffer.
  *
  * The relational path ([[Moments.pairMoments]]) expresses the same
  * thing as six built-in sums — which Catalyst partial-aggregates and
  * codegens, so it stays the default. This Aggregator exists for the
  * typed API: `Dataset[(Double, Double)].groupByKey(...).agg(
  * MomentAggregator.toColumn)` — and demonstrates that the moment
  * buffer is a commutative monoid (merge is pointwise +), which is
  * exactly the property that makes the metrics streaming-aggregable
  * (SURVEY.md §7.5).
  */
/** (n, Σx, Σy, Σx², Σy², Σxy) */
case class MomentBuf(n: Long, sx: Double, sy: Double,
                     sxx: Double, syy: Double, sxy: Double)

object MomentAggregator
    extends Aggregator[(Double, Double), MomentBuf, MomentBuf] {
  type Buf = MomentBuf

  override def zero: Buf = MomentBuf(0L, 0.0, 0.0, 0.0, 0.0, 0.0)

  override def reduce(b: Buf, a: (Double, Double)): Buf = {
    val (x, y) = a
    MomentBuf(b.n + 1, b.sx + x, b.sy + y,
      b.sxx + x * x, b.syy + y * y, b.sxy + x * y)
  }

  override def merge(a: Buf, b: Buf): Buf =
    MomentBuf(a.n + b.n, a.sx + b.sx, a.sy + b.sy,
      a.sxx + b.sxx, a.syy + b.syy, a.sxy + b.sxy)

  override def finish(r: Buf): Buf = r

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]

  /** Pearson from a finished buffer — scalar twin of
    * [[Similarity.correlation]] (same 0.0 sentinel). */
  def pearson(b: Buf): Double = {
    val n = b.n.toDouble
    val den = math.sqrt(math.max(n * b.sxx - b.sx * b.sx, 0.0)) *
      math.sqrt(math.max(n * b.syy - b.sy * b.sy, 0.0))
    if (den == 0.0) 0.0 else (n * b.sxy - b.sx * b.sy) / den
  }
}
