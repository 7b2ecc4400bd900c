package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.types.Decimal

/** Reduction-order-free decimal arithmetic on whole float vectors —
  * the one-shuffle replacement for the posexplode → groupBy(key, dim)
  * → davg pattern (which pays a 64x row-volume exchange per use).
  *
  * Bit-compatibility contract: every helper reproduces EXACTLY the
  * bits of the equivalent [[graft.util.Num]] column formula —
  * `micros` is Spark's own `CAST(x AS DECIMAL(18,6))` (same
  * `Decimal.changePrecision` HALF_UP rounding), sums are exact 64-bit
  * integer micro-units, and `toDouble` is the same decimal→double
  * cast — so swapping a davg pipeline for the aggregator never moves
  * a hash-checked oracle.
  */
object DecVec {
  val Precision = 18
  val Scale = 6

  /** Exact unscaled (1e-6 units) value of Spark's
    * CAST(x AS DECIMAL(18,6)) — HALF_UP via Decimal.changePrecision,
    * the identical code path the Cast expression runs. */
  def micros(x: Double): Long = {
    val d = Decimal(x)
    // overflow (|x| >= 1e12) cannot happen for normalized embedding
    // coordinates; fail loudly rather than corrupt a mean
    require(d.changePrecision(Precision, Scale), s"decimal(18,6) overflow: $x")
    d.toJavaBigDecimal.unscaledValue().longValueExact()
  }

  /** CAST(sum AS DOUBLE) of an exact micro-unit sum — same bits as
    * casting the decimal sum column to double. */
  def toDouble(sumMicros: Long): Double =
    java.math.BigDecimal.valueOf(sumMicros, Scale).doubleValue()
}

/** Aggregation buffer: per-dimension exact micro-unit sums and
  * per-dimension counts (mirroring davg's per-(key, dim) COUNT so a
  * ragged corpus would still average correctly). */
case class DecVecSumBuf(var sums: Array[Long], var counts: Array[Long])

/** Typed Aggregator: per-dimension mean of float vectors in exact
  * DECIMAL(18,6) arithmetic, returned as ARRAY<DOUBLE> — bit-for-bit
  * `davg(x_i)` per dimension, in ONE map-side-combined aggregate
  * (the buffer is two small long arrays per group per partition; no
  * posexplode, no (key, dim) shuffle). */
class DecVecMeanAgg extends Aggregator[Array[Float], DecVecSumBuf, Array[Double]] {

  private def grow(b: DecVecSumBuf, len: Int): Unit =
    if (b.sums.length < len) {
      b.sums = java.util.Arrays.copyOf(b.sums, len)
      b.counts = java.util.Arrays.copyOf(b.counts, len)
    }

  override def zero: DecVecSumBuf =
    DecVecSumBuf(Array.emptyLongArray, Array.emptyLongArray)

  override def reduce(b: DecVecSumBuf, a: Array[Float]): DecVecSumBuf = {
    if (a != null) {
      grow(b, a.length)
      var i = 0
      while (i < a.length) {
        b.sums(i) += DecVec.micros(a(i).toDouble)
        b.counts(i) += 1
        i += 1
      }
    }
    b
  }

  override def merge(x: DecVecSumBuf, y: DecVecSumBuf): DecVecSumBuf = {
    grow(x, y.sums.length)
    var i = 0
    while (i < y.sums.length) {
      x.sums(i) += y.sums(i)
      x.counts(i) += y.counts(i)
      i += 1
    }
    x
  }

  /** mean_i = CAST(sum_i AS DOUBLE) / count_i — davg's exact shape
    * (decimal→double cast FIRST, then a double division). */
  override def finish(b: DecVecSumBuf): Array[Double] = {
    val out = new Array[Double](b.sums.length)
    var i = 0
    while (i < out.length) {
      out(i) = DecVec.toDouble(b.sums(i)) / b.counts(i)
      i += 1
    }
    out
  }

  override def bufferEncoder: Encoder[DecVecSumBuf] = Encoders.product[DecVecSumBuf]
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}

object DecVecAgg {
  /** Column form: dec_vec_mean(vec) for groupBy().agg() — the
    * bit-exact centroid trainer (IVF Lloyd steps, label centroids). */
  def decVecMean(c: Column): Column = udaf(new DecVecMeanAgg).apply(c)
}
