package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded-top-k harmonic-sum aggregate — the reference's HarmonicSumScorer
  * (mrtarget/common/Scoring.py:13-89; orchestration
  * mrtarget/modules/Association.py:272-299): keep the top-`buffer` scores,
  * sort descending, return Σ s_i / (i+1)^scale. The reference pins
  * harmonic_sum(100 × 1.0, scale=2) = 1.6349839001848923
  * (tests/test_score.py:39-41) — asserted in HarmonicSumSpec.
  *
  * Implemented as a typed Aggregator (partial/merge-friendly: the buffer is
  * trimmed to the top `buffer` values on every reduce/merge, so map-side
  * partial aggregation keeps shuffle rows bounded at scale).
  */
class HarmonicSum(bufferSize: Int = 100, scale: Double = 2.0)
    extends Aggregator[Double, Seq[Double], Double] {

  private def trim(vs: Seq[Double]): Seq[Double] =
    if (vs.length <= bufferSize) vs
    else vs.sorted(Ordering[Double].reverse).take(bufferSize)

  override def zero: Seq[Double] = Vector.empty

  override def reduce(b: Seq[Double], a: Double): Seq[Double] = {
    val appended = b :+ a
    if (appended.length > bufferSize * 2) trim(appended) else appended
  }

  override def merge(b1: Seq[Double], b2: Seq[Double]): Seq[Double] =
    trim(b1 ++ b2)

  override def finish(r: Seq[Double]): Double = {
    val top = r.sorted(Ordering[Double].reverse).take(bufferSize)
    var s = 0.0
    var i = 0
    while (i < top.length) {
      s += top(i) / math.pow(i + 1.0, scale)
      i += 1
    }
    s
  }

  override def bufferEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object HarmonicSum {
  /** Untyped column form for DataFrame groupBy().agg(...). */
  def column(bufferSize: Int = 100, scale: Double = 2.0) =
    udaf(new HarmonicSum(bufferSize, scale))

  /** Driver-side reference for specs. */
  def exact(values: Seq[Double], bufferSize: Int = 100, scale: Double = 2.0): Double =
    values.sorted(Ordering[Double].reverse).take(bufferSize)
      .zipWithIndex.map { case (v, i) => v / math.pow(i + 1.0, scale) }.sum
}
