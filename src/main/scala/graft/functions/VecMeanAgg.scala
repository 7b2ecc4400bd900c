package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed Aggregator computing the element-wise mean of float-vector
  * columns (the centroid operator — what a k-means "train" step needs
  * per cluster, SURVEY.md §2.10's reserved Aggregator slot).
  *
  * Buffer is (double sums, count): partial aggregation happens
  * map-side exactly like any built-in agg, merge is element-wise sum
  * — one small Array[Double] per group per partition, no shuffle of
  * raw vectors beyond the group key's normal hash exchange.
  */
case class VecMeanBuf(sums: Array[Double], var n: Long)

class VecMeanAgg(dim: Int)
    extends Aggregator[Array[Float], VecMeanBuf, Array[Float]] {

  override def zero: VecMeanBuf = VecMeanBuf(new Array[Double](dim), 0L)

  override def reduce(b: VecMeanBuf, a: Array[Float]): VecMeanBuf = {
    if (a != null) {
      var i = 0
      val m = math.min(dim, a.length)
      while (i < m) { b.sums(i) += a(i); i += 1 }
      b.n += 1
    }
    b
  }

  override def merge(x: VecMeanBuf, y: VecMeanBuf): VecMeanBuf = {
    var i = 0
    while (i < dim) { x.sums(i) += y.sums(i); i += 1 }
    x.n += y.n
    x
  }

  override def finish(b: VecMeanBuf): Array[Float] =
    if (b.n == 0) new Array[Float](dim)
    else b.sums.map(s => (s / b.n).toFloat)

  override def bufferEncoder: Encoder[VecMeanBuf] = Encoders.product[VecMeanBuf]
  override def outputEncoder: Encoder[Array[Float]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]()
}

object VecMeanAgg {
  /** Column form: vec_mean(embedding) for use in groupBy().agg(). */
  def vecMean(c: Column, dim: Int = Embed.DefaultDim): Column =
    udaf(new VecMeanAgg(dim)).apply(c)
}
