package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise vector-sum aggregator: sums `array<double>` columns
  * into one array per group with map-side partial aggregation, so a
  * k-means Lloyd step shuffles k×dims partial sums instead of n×dims
  * exploded (cid, dim, x) rows (the round-2 verdict's q36 finding).
  * Empty-input groups yield an empty array (callers guard on count). */
final class VecSumAggregator
    extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {

  override def zero: Array[Double] = Array.emptyDoubleArray

  override def reduce(buf: Array[Double], v: Seq[Double]): Array[Double] =
    if (buf.isEmpty) v.toArray
    else {
      var i = 0
      while (i < buf.length) { buf(i) += v(i); i += 1 }
      buf
    }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

  override def finish(buf: Array[Double]): Seq[Double] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
}
