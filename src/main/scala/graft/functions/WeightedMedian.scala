package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable.ArrayBuffer

/** Exact weighted median as a typed `Aggregator` — SURVEY.md §7.3's one
  * deliberate UDAF, the contrast to `percentile_approx` (exactness traded
  * for a buffer proportional to the group's distinct values).
  *
  * Semantics: the smallest x such that the cumulative weight of values ≤ x
  * reaches half the total weight (lower weighted median). With all weights
  * 1 this is the lower median (no interpolation — a deliberate, documented
  * difference from `percentile(0.5)`).
  *
  * Scale note: the buffer holds (value, weight) pairs merged map-side, so
  * memory is O(distinct values per group). For unbounded-cardinality groups
  * at 100 TB, use the mergeable GK sketch (`approxMedian`) instead — this
  * Aggregator exists to prove the typed-UDAF surface and to provide an
  * exact oracle-checkable statistic for bounded domains. */
object WeightedMedian
    extends Aggregator[(Double, Double), ArrayBuffer[(Double, Double)], Double] {

  override def zero: ArrayBuffer[(Double, Double)] = ArrayBuffer.empty

  override def reduce(buf: ArrayBuffer[(Double, Double)],
      in: (Double, Double)): ArrayBuffer[(Double, Double)] = {
    buf += in
    if (buf.length > 4096) compact(buf) else buf
  }

  override def merge(a: ArrayBuffer[(Double, Double)],
      b: ArrayBuffer[(Double, Double)]): ArrayBuffer[(Double, Double)] =
    compact(a ++= b)

  private def compact(buf: ArrayBuffer[(Double, Double)])
      : ArrayBuffer[(Double, Double)] = {
    val m = buf.groupMapReduce(_._1)(_._2)(_ + _)
    buf.clear()
    buf ++= m.toSeq.sortBy(_._1)
  }

  override def finish(buf: ArrayBuffer[(Double, Double)]): Double = {
    if (buf.isEmpty) return Double.NaN
    val sorted = buf.groupMapReduce(_._1)(_._2)(_ + _).toSeq.sortBy(_._1)
    val half = sorted.iterator.map(_._2).sum / 2.0
    var acc = 0.0
    for ((v, w) <- sorted) {
      acc += w
      if (acc >= half) return v
    }
    sorted.last._1
  }

  override def bufferEncoder: Encoder[ArrayBuffer[(Double, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Typed column for Dataset[(Double, Double)] aggregation. */
  def asColumn: TypedColumn[(Double, Double), Double] = toColumn
}
