package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded k-smallest aggregate over a Long column — O(k) state that
  * partial-combines map-side, the primitive a bounded "sample of the
  * posting list / group" needs at scale (a window rank over the group
  * would buffer and sort the whole group in one task; collect_list
  * would hold it in one aggregation buffer). Buffer is an ascending
  * array of ≤ k elements; merge keeps the k smallest of both sides. */
class BoundedMinK(k: Int)
  extends Aggregator[Long, Array[Long], Array[Long]] {

  def zero: Array[Long] = Array.empty

  def reduce(b: Array[Long], x: Long): Array[Long] =
    if (b.length < k) {
      val out = java.util.Arrays.copyOf(b, b.length + 1)
      out(b.length) = x
      java.util.Arrays.sort(out)
      out
    } else if (x < b(k - 1)) {
      val out = b.clone()
      out(k - 1) = x
      java.util.Arrays.sort(out)
      out
    } else b

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val both = a ++ b
    java.util.Arrays.sort(both)
    both.take(k)
  }

  def finish(r: Array[Long]): Array[Long] = r

  // Catalyst-native array<long> encoder: buffer ser/de is a primitive
  // array copy per partial merge, not a Java serialization stream
  def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

/** Bounded top-k (count desc, label asc) over (count, label) rows —
  * O(k) state with map-side combine, replacing a rank window whose
  * partition would otherwise buffer and sort every candidate of a
  * group in one task. Ties follow the engine-wide deterministic rule
  * (higher count first, then lexicographic label). */
class BoundedTopByCount(k: Int)
  extends Aggregator[(Long, String), Seq[(Long, String)],
    Seq[(Long, String)]] {

  private val ord: Ordering[(Long, String)] =
    Ordering.by { case (c, w) => (-c, w) }

  def zero: Seq[(Long, String)] = Seq.empty
  def reduce(b: Seq[(Long, String)], x: (Long, String)): Seq[(Long, String)] =
    (b :+ x).sorted(ord).take(k)
  def merge(a: Seq[(Long, String)], b: Seq[(Long, String)])
  : Seq[(Long, String)] = (a ++ b).sorted(ord).take(k)
  def finish(r: Seq[(Long, String)]): Seq[(Long, String)] = r

  def bufferEncoder: Encoder[Seq[(Long, String)]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Seq[(Long, String)]]()
  def outputEncoder: Encoder[Seq[(Long, String)]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Seq[(Long, String)]]()
}
