package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shims

/** Vector distance/similarity over ArrayType(FloatType) embedding
  * columns (SURVEY.md §2.5 V3). Backed by the codegen'd VecKernels
  * expressions (tight loops over unsafe array data); arithmetic is
  * element-wise double with a left-to-right fold, so results are
  * deterministic and bit-identical to both the declarative
  * `zip_with`+`aggregate` formulation and the DuckDB oracle mirrors.
  */
object VectorOps {

  def vecDot(a: Column, b: Column): Column =
    shims.toColumn(VecDot(shims.toExpression(a), shims.toExpression(b)))

  def vecNormSq(a: Column): Column =
    shims.toColumn(VecNormSq(shims.toExpression(a)))

  def vecNorm(a: Column): Column = sqrt(vecNormSq(a))

  def vecL2Sq(a: Column, b: Column): Column =
    shims.toColumn(VecL2Sq(shims.toExpression(a), shims.toExpression(b)))

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
