package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the dedup hash kernels
  * (SURVEY.md §2.10) — minhash bands, simhash, shingle hashes,
  * winnowing fingerprints, and hyperplane-LSH buckets. Each compiles
  * to one static kernel call in generated code (the EmbedText
  * pattern), replacing the ScalaUDF forms whose encoder round trips
  * dominated the signature scans. Parameters are plan-time constants
  * baked into the generated call.
  */

private[functions] trait TextHashExpr extends UnaryExpression {
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"expected STRING input, got ${child.dataType}")
}

/** minhash_bands(text): ARRAY<LONG> LSH band keys of the k-permutation
  * MinHash signature over word shingles. */
case class MinHashBands(child: Expression, k: Int, shingleN: Int, bands: Int)
    extends TextHashExpr {
  // plan-time validation: a bad constant must fail at construction,
  // not per-row mid-job
  require(k > 0 && bands > 0 && k % bands == 0,
    s"bands ($bands) must divide k ($k), both positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    Hashes.minhashBandsData(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      k, shingleN, bands)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.Hashes.minhashBandsData($t, $k, $shingleN, $bands)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** simhash64(text): LONG term-frequency-weighted SimHash. */
case class SimHash64(child: Expression) extends TextHashExpr {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    Hashes.simhash64Utf8(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.Hashes.simhash64Utf8($t)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** shingle_hashes(text): ARRAY<LONG> distinct 64-bit word-shingle
  * hashes (the inverted-index posting keys). */
case class ShingleHashes(child: Expression, n: Int) extends TextHashExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    Hashes.shingleHashesData(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.Hashes.shingleHashesData($t, $n)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** winnow_fp(text): ARRAY<LONG> winnowing document fingerprint. */
case class WinnowFp(child: Expression, kGram: Int, window: Int) extends TextHashExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    Hashes.winnowData(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      kGram, window)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.Hashes.winnowData($t, $kGram, $window)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** lsh_buckets(vec): ARRAY<LONG> multi-table hyperplane bucket keys.
  * The sign matrix is derived deterministically from (dim, bits,
  * tables). On the codegen path it rides the plan's reference-object
  * array (addReferenceObj serializes it to executors with the plan,
  * ~tables*bits*dim doubles — small, and never inlined into the
  * generated source); on the interpreted path the @transient lazy val
  * recomputes it per executor. */
case class LshBuckets(child: Expression, dim: Int, nBits: Int, nTables: Int)
    extends UnaryExpression with FloatVecInput {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() = check(child.dataType)
  @transient private lazy val signs = Lsh.signMatrix(dim, nBits, nTables)
  override def nullSafeEval(v: Any): Any =
    Lsh.bucketsData(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      signs, dim, nBits, nTables)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("lshSigns", signs, "double[][][]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.Lsh.bucketsData($v, $signsRef, $dim, $nBits, $nTables)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Column builders. */
object hashExprs {
  def minhashBands(c: Column, k: Int, shingleN: Int, bands: Int): Column =
    shims.toColumn(MinHashBands(shims.toExpression(c), k, shingleN, bands))
  def simhash64(c: Column): Column =
    shims.toColumn(SimHash64(shims.toExpression(c)))
  def shingleHashes(c: Column, n: Int): Column =
    shims.toColumn(ShingleHashes(shims.toExpression(c), n))
  def winnowFp(c: Column, kGram: Int, window: Int): Column =
    shims.toColumn(WinnowFp(shims.toExpression(c), kGram, window))
  def lshBuckets(c: Column, dim: Int, nBits: Int, nTables: Int): Column =
    shims.toColumn(LshBuckets(shims.toExpression(c), dim, nBits, nTables))
}
