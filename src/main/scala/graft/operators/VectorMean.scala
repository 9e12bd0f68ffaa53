package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY §2B B34): element-wise mean of a group of float
  * vectors — e.g. the centroid of each embedding-cluster label.
  *
  * Buffer is (running component sums, count); merge is associative and
  * commutative so Spark computes map-side partials before the shuffle —
  * the aggregation moves one dim-sized array per partition per group, not
  * per row.
  */
final case class VecMeanBuf(sums: Array[Double], n: Long)

class VectorMean(dim: Int)
  extends Aggregator[Array[Float], VecMeanBuf, Array[Double]] {

  override def zero: VecMeanBuf = VecMeanBuf(Array.ofDim[Double](dim), 0L)

  override def reduce(b: VecMeanBuf, a: Array[Float]): VecMeanBuf = {
    require(a.length == dim,
      s"ragged embedding dimensions: got ${a.length}, expected $dim")
    var i = 0
    while (i < dim) { b.sums(i) += a(i); i += 1 }
    VecMeanBuf(b.sums, b.n + 1)
  }

  override def merge(x: VecMeanBuf, y: VecMeanBuf): VecMeanBuf = {
    var i = 0
    while (i < dim) { x.sums(i) += y.sums(i); i += 1 }
    VecMeanBuf(x.sums, x.n + y.n)
  }

  override def finish(b: VecMeanBuf): Array[Double] =
    if (b.n == 0) Array.ofDim[Double](dim) else b.sums.map(_ / b.n)

  override def bufferEncoder: Encoder[VecMeanBuf] = Encoders.product[VecMeanBuf]
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
