package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types._

/** Codegen'd a<b pair generation over an in-row array — the
  * aggregation-side pair kernel for the co-occurrence / overlap
  * family (guide §2.4): `collect_list` per key, then ONE generator
  * pass per key row, replaces the key self-join whose two branches
  * re-plan (and re-run) the whole upstream subtree. The r21 A/B
  * rejected this shape built from higher-order functions because
  * Catalyst's array lambdas are CodegenFallback (interpreted per
  * row); these expressions compile to a static call like every other
  * graft kernel, which is the difference that makes the single-pass
  * form win. Both kernels REQUIRE their input array sorted ascending
  * (the caller wraps `sort_array`), so emitted pairs satisfy a < b
  * exactly like the self-join's `x.item < y.item` condition.
  */
object PairGen {

  /** All i<j pairs of a sorted ARRAY<LONG> as
    * ARRAY<STRUCT<item_a BIGINT, item_b BIGINT>>. */
  def pairsLong(items: ArrayData): ArrayData = {
    val n = items.numElements()
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val a = items.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(Array[Any](a, items.getLong(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** All i<j pairs of a sorted ARRAY<STRUCT<id BIGINT, v BIGINT>> as
    * ARRAY<STRUCT<id_a, id_b, v_a, v_b>> — the keyed form for pair
    * families that carry a per-id payload through the join (winnow
    * overlap's n_fp). */
  def pairsKeyed(items: ArrayData): ArrayData = {
    val n = items.numElements()
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val a = items.getStruct(i, 2)
      val aId = a.getLong(0)
      val aV = a.getLong(1)
      var j = i + 1
      while (j < n) {
        val b = items.getStruct(j, 2)
        out(k) = new GenericInternalRow(
          Array[Any](aId, b.getLong(0), aV, b.getLong(1)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** pairs_long(sorted ARRAY<LONG>) -> ARRAY<STRUCT<item_a, item_b>>. */
case class PairsLong(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item_a", LongType, nullable = false),
      StructField("item_b", LongType, nullable = false))),
    containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pairs_long needs ARRAY<BIGINT>, got $t")
    }
  override def nullSafeEval(v: Any): Any =
    PairGen.pairsLong(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.PairGen.pairsLong($v)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** pairs_keyed(sorted ARRAY<STRUCT<BIGINT, BIGINT>>) ->
  * ARRAY<STRUCT<id_a, id_b, v_a, v_b>>. */
case class PairsKeyed(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id_a", LongType, nullable = false),
      StructField("id_b", LongType, nullable = false),
      StructField("v_a", LongType, nullable = false),
      StructField("v_b", LongType, nullable = false))),
    containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StructType(fs), _)
          if fs.length == 2 && fs.forall(_.dataType == LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pairs_keyed needs ARRAY<STRUCT<BIGINT, BIGINT>>, got $t")
    }
  override def nullSafeEval(v: Any): Any =
    PairGen.pairsKeyed(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.PairGen.pairsKeyed($v)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Column builders. */
object pairGenExprs {
  def pairsLong(c: Column): Column =
    shims.toColumn(PairsLong(shims.toExpression(c)))
  def pairsKeyed(c: Column): Column =
    shims.toColumn(PairsKeyed(shims.toExpression(c)))
}
