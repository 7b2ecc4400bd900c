package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Tight-loop kernels + codegen'd Catalyst expressions for vector
  * arithmetic over ArrayType(FloatType) columns.
  *
  * The declarative `zip_with`+`aggregate` forms in VectorOps are
  * correct but interpret a lambda per element; these expressions
  * compile to a single static-call in generated code and loop over
  * the unsafe array data directly — the hot path of every kNN /
  * similarity-join operator. Fold order is identical (index order,
  * double accumulator), so results are bit-for-bit the same as the
  * declarative forms and the DuckDB oracles.
  */
object VecKernels {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def normSq(a: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val x = a.getFloat(i).toDouble; s += x * x; i += 1 }
    s
  }

  def l2Sq(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      s += d * d
      i += 1
    }
    s
  }
}

private[functions] trait FloatVecInput { self: Expression =>
  protected def okType(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  protected def check(ts: DataType*) =
    if (ts.forall(okType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"expected ARRAY<FLOAT> inputs, got ${ts.mkString(", ")}")
}

case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with FloatVecInput {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() = check(left.dataType, right.dataType)
  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecKernels.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
}

case class VecNormSq(child: Expression)
    extends UnaryExpression with FloatVecInput {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() = check(child.dataType)
  override def nullSafeEval(a: Any): Any =
    VecKernels.normSq(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VecKernels.normSq($a)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

case class VecL2Sq(left: Expression, right: Expression)
    extends BinaryExpression with FloatVecInput {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() = check(left.dataType, right.dataType)
  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.l2Sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecKernels.l2Sq($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
}
