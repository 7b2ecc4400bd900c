package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector distance/similarity over ArrayType(FloatType) embedding
  * columns (SURVEY.md §2.5 V3), composed from Spark's higher-order
  * functions — fully declarative, no UDF serialization, Catalyst can
  * push surrounding filters/projections around them.
  *
  * All arithmetic is promoted to double element-wise and folded
  * left-to-right (sequential `aggregate`), making results
  * deterministic for a given element order.
  */
object VectorOps {

  private def d(c: Column): Column = c.cast("double")

  /** Sum of a double array via sequential fold. */
  private def asum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  def vecDot(a: Column, b: Column): Column =
    asum(zip_with(a, b, (x, y) => d(x) * d(y)))

  def vecNormSq(a: Column): Column = asum(transform(a, x => d(x) * d(x)))

  def vecNorm(a: Column): Column = sqrt(vecNormSq(a))

  def vecL2Sq(a: Column, b: Column): Column =
    asum(zip_with(a, b, (x, y) => (d(x) - d(y)) * (d(x) - d(y))))

  def vecL2(a: Column, b: Column): Column = sqrt(vecL2Sq(a, b))

  def vecCosine(a: Column, b: Column): Column =
    vecDot(a, b) / (vecNorm(a) * vecNorm(b))

  /** Dot product against a plan-time constant query vector. */
  def vecDotConst(a: Column, q: Array[Float]): Column =
    vecDot(a, lit(q))

  def vecL2Const(a: Column, q: Array[Float]): Column =
    vecL2(a, lit(q))

  def vecCosineConst(a: Column, q: Array[Float]): Column =
    vecCosine(a, lit(q))
}
