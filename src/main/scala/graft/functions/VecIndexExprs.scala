package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types._

/** Scan-side vector-index kernels (SURVEY.md §2.5): nearest-centroid
  * assignment for IVF (the fix for the N x C crossJoin+window shuffle
  * — cell assignment is now a codegen'd argmin per row against a
  * plan-constant centroid table, no Exchange), and 8-bit scalar
  * quantization (SQ8) for compressed-domain candidate generation.
  *
  * Centroid tables ride into generated code via
  * `CodegenContext.addReferenceObj` — the standard mechanism for
  * plan-constant state (what Spark itself does for, e.g., regex
  * patterns). A K-cell coarse quantizer is index METADATA (K ~ sqrt N
  * vectors), centrally trained and broadcast in every IVF system; the
  * corpus-sized work stays distributed and codegen'd.
  */
object VecIndex {

  private def l2sqTo(v: ArrayData, c: Array[Float]): Double = {
    val n = math.min(v.numElements(), c.length)
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = v.getFloat(i).toDouble - c(i).toDouble
      s += d * d
      i += 1
    }
    s
  }

  /** Id of the L2-nearest centroid; ties break on the smaller id.
    * Compares on sqrt(d2) so ordering (incl. near-ties collapsed by
    * sqrt rounding) is bit-for-bit the order a window over vecL2
    * would produce. */
  def nearestCell(v: ArrayData, ids: Array[Long], cents: Array[Array[Float]]): Long = {
    var best = 0
    var bestD = Double.MaxValue
    var i = 0
    while (i < cents.length) {
      val d = math.sqrt(l2sqTo(v, cents(i)))
      if (d < bestD || (d == bestD && ids(i) < ids(best))) { bestD = d; best = i }
      i += 1
    }
    ids(best)
  }

  /** Ids of the `p` L2-nearest centroids, ascending (dist, id) —
    * partial selection, O(C*p). */
  def nearestCells(v: ArrayData, ids: Array[Long], cents: Array[Array[Float]],
                   p: Int): ArrayData = {
    val c = cents.length
    val k = math.min(p, c)
    val d = new Array[Double](c)
    var i = 0
    while (i < c) { d(i) = math.sqrt(l2sqTo(v, cents(i))); i += 1 }
    val taken = new Array[Boolean](c)
    val out = new Array[Long](k)
    var r = 0
    while (r < k) {
      var best = -1
      i = 0
      while (i < c) {
        if (!taken(i) && (best < 0 || d(i) < d(best) ||
            (d(i) == d(best) && ids(i) < ids(best)))) best = i
        i += 1
      }
      taken(best) = true
      out(r) = ids(best)
      r += 1
    }
    new GenericArrayData(out)
  }

  /** Distance (L2) to the nearest centroid — the farthest-first
    * seeding scan. */
  def minCentDist(v: ArrayData, cents: Array[Array[Float]]): Double = {
    var bestD = Double.MaxValue
    var i = 0
    while (i < cents.length) {
      val d = l2sqTo(v, cents(i))
      if (d < bestD) bestD = d
      i += 1
    }
    math.sqrt(bestD)
  }

  // ---- SQ8: symmetric per-vector 8-bit scalar quantization ----------

  /** code[i] = round(x[i] / s) with s = max|x|/127 — 4x smaller than
    * float32, dot products in integer arithmetic. */
  def sq8Code(v: ArrayData): Array[Byte] = {
    val n = v.numElements()
    val out = new Array[Byte](n)
    var mx = 0.0f
    var i = 0
    while (i < n) { val a = math.abs(v.getFloat(i)); if (a > mx) mx = a; i += 1 }
    if (mx > 0) {
      val inv = 127.0 / mx
      i = 0
      while (i < n) { out(i) = math.round(v.getFloat(i) * inv).toByte; i += 1 }
    }
    out
  }

  /** Per-vector cosine rank factor: scale / ||x|| (so approx cosine =
    * sq8Dot(a,b) * factor(a) * factor(b)); 0 for the zero vector. */
  def sq8Factor(v: ArrayData): Double = {
    val n = v.numElements()
    var mx = 0.0
    var nrm = 0.0
    var i = 0
    while (i < n) {
      val x = v.getFloat(i).toDouble
      val a = math.abs(x)
      if (a > mx) mx = a
      nrm += x * x
      i += 1
    }
    if (nrm == 0.0) 0.0 else (mx / 127.0) / math.sqrt(nrm)
  }

  def sq8Dot(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var s = 0
    var i = 0
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  // ---- PQ: product quantization (FAISS IVF-PQ's fine quantizer) ----

  /** PQ-encode: for each of the `m = books.length` subspaces, the
    * index of the L2-nearest codebook centroid of the corresponding
    * `dsub`-dim slice of `v` (comparison on sqrt(d2) with ties to the
    * smaller code, exactly [[nearestCell]]'s convention so the DuckDB
    * mirror's `ORDER BY sqrt-l2, code` re-derives identical codes).
    * One byte per subspace — m bytes/vector total (vs 1 byte/dim SQ8,
    * 4 bytes/dim float): the memory-resident fine-quantizer scale
    * path for corpora where even SQ8 codes outgrow RAM. */
  def pqEncode(v: ArrayData, books: Array[Array[Array[Float]]]): Array[Byte] = {
    val m = books.length
    val out = new Array[Byte](m)
    var s = 0
    var off = 0
    while (s < m) {
      val book = books(s)
      val dsub = if (book.length > 0) book(0).length else 0
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < book.length) {
        val c = book(j)
        var d2 = 0.0
        var i = 0
        while (i < dsub) {
          val d = v.getFloat(off + i).toDouble - c(i).toDouble
          d2 += d * d
          i += 1
        }
        val d = math.sqrt(d2)
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      out(s) = best.toByte
      off += dsub
      s += 1
    }
    out
  }

  /** Training-time sub-assignment: nearest code of `subvec` in
    * codebook `sub` (same sqrt + smaller-code tie convention). */
  def pqSubAssign(sub: Int, subvec: ArrayData,
                  books: Array[Array[Array[Float]]]): Int = {
    val book = books(sub)
    var best = 0
    var bestD = Double.MaxValue
    var j = 0
    while (j < book.length) {
      val d = math.sqrt(l2sqTo(subvec, book(j)))
      if (d < bestD) { bestD = d; best = j }
      j += 1
    }
    best
  }

  /** Asymmetric-distance (ADC) score of a PQ code against a
    * query-derived lookup table: Σ_s lut(s)(code(s)) — integer
    * micro-units end to end (the LUT is floor-quantized once per
    * query, so candidate ranks are exact integers that any engine
    * reproduces; FAISS's fast-scan path quantizes its LUTs the same
    * way). Codes read unsigned so ksub up to 256 round-trips. */
  def pqAdc(code: Array[Byte], lut: Array[Array[Long]]): Long = {
    // a stored code whose m disagrees with the query LUT is a
    // geometry mismatch (stale or foreign _pq sidecar) — fail fast
    // rather than truncate into a plausible-but-wrong rank
    require(code.length == lut.length,
      s"PQ geometry mismatch: code has ${code.length} subvectors, " +
        s"query LUT has ${lut.length}")
    var s = 0
    var acc = 0L
    while (s < code.length) { acc += lut(s)(code(s) & 0xFF); s += 1 }
    acc
  }

  /** Binary quantization: bit i (i < 64) set iff v[i] > 0 — the
    * 1-bit/dim code (ONE long at the 64-dim fixture; dim/64 longs in
    * general, here the first word). Hamming distance between codes
    * approximates angle (the sign-random-projection bound), giving
    * an 8-byte pre-rank the q124/q129 meters compare against PQ at
    * EQUAL bytes. Strict `> 0`: a zero coordinate clears the bit in
    * every engine. */
  def signBits(v: ArrayData): Long = {
    // one long holds 64 sign bits; the q124/q129 mirrors Hamming
    // over len(embedding), so a dim > 64 would silently diverge —
    // fail loudly until a multi-word code is actually needed
    require(v.numElements() <= 64,
      s"signBits encodes at most 64 dims (got ${v.numElements()}); " +
        "emit dim/64 words before raising the embedding dim")
    val n = v.numElements()
    var bits = 0L
    var i = 0
    while (i < n) {
      if (v.getFloat(i) > 0f) bits |= (1L << i)
      i += 1
    }
    bits
  }

  /** [[pqAdc]] against a row-carried FLAT lut (m·ksub longs,
    * lut[s*ksub + code] layout) — the batch search form, where each
    * query's LUT rides the broadcast probe table as a column instead
    * of a plan constant. */
  def pqAdcFlat(code: Array[Byte], lut: ArrayData, ksub: Int): Long = {
    val m = code.length
    var s = 0
    var acc = 0L
    while (s < m) { acc += lut.getLong(s * ksub + (code(s) & 0xFF)); s += 1 }
    acc
  }

  /** Reduction-order-free L2 distance of a float vector to a double
    * centroid: sqrt of the exact DECIMAL(18,6) sum of squared per-dim
    * deviations — bit-for-bit `sqrt(dsum((x_i - m_i)^2))` over
    * posexploded rows ([[graft.functions.DecVec]] carries the
    * Cast-identical rounding), collapsed to one scan-side kernel so
    * centroid-dispersion queries never shuffle (row, dim) pairs. */
  def decL2(v: ArrayData, m: ArrayData): Double = {
    val n = math.min(v.numElements(), m.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val d = v.getFloat(i).toDouble - m.getDouble(i)
      s += DecVec.micros(d * d)
      i += 1
    }
    math.sqrt(DecVec.toDouble(s))
  }
}

/** nearest_cell(vec): LONG id of the L2-nearest centroid. The
  * centroid table is a plan constant (addReferenceObj), so IVF cell
  * assignment is one codegen'd scan stage — no crossJoin, no window,
  * no Exchange (PlanAuditSpec enforces). */
case class NearestCell(child: Expression, ids: Array[Long],
                       cents: Array[Array[Float]])
    extends UnaryExpression with FloatVecInput {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = check(child.dataType)
  override def nullSafeEval(v: Any): Any =
    VecIndex.nearestCell(v.asInstanceOf[ArrayData], ids, cents)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("cellIds", ids, "long[]")
    val centsRef = ctx.addReferenceObj("cents", cents, "float[][]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.VecIndex.nearestCell($v, $idsRef, $centsRef)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** nearest_cells(vec, p): ARRAY<LONG> of the p nearest centroid ids
  * (multiprobe cell list, ascending distance). */
case class NearestCells(child: Expression, ids: Array[Long],
                        cents: Array[Array[Float]], p: Int)
    extends UnaryExpression with FloatVecInput {
  require(p >= 1, s"probe count p must be >= 1, got $p")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() = check(child.dataType)
  override def nullSafeEval(v: Any): Any =
    VecIndex.nearestCells(v.asInstanceOf[ArrayData], ids, cents, p)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("cellIds", ids, "long[]")
    val centsRef = ctx.addReferenceObj("cents", cents, "float[][]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.VecIndex.nearestCells($v, $idsRef, $centsRef, $p)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** min_cent_dist(vec): DOUBLE L2 distance to the nearest of a
  * plan-constant seed set (farthest-first seeding scan). */
case class MinCentDist(child: Expression, cents: Array[Array[Float]])
    extends UnaryExpression with FloatVecInput {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() = check(child.dataType)
  override def nullSafeEval(v: Any): Any =
    VecIndex.minCentDist(v.asInstanceOf[ArrayData], cents)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "float[][]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.VecIndex.minCentDist($v, $centsRef)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** sq8_code(vec): BINARY 8-bit scalar-quantized code (1 byte/dim). */
case class Sq8Code(child: Expression) extends UnaryExpression with FloatVecInput {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() = check(child.dataType)
  override def nullSafeEval(v: Any): Any =
    VecIndex.sq8Code(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.VecIndex.sq8Code($v)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** sq8_factor(vec): DOUBLE per-vector cosine rank factor. */
case class Sq8Factor(child: Expression) extends UnaryExpression with FloatVecInput {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() = check(child.dataType)
  override def nullSafeEval(v: Any): Any =
    VecIndex.sq8Factor(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.VecIndex.sq8Factor($v)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** sq8_dot(code_a, code_b): INT integer dot product of two codes. */
case class Sq8Dot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes() =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sq8_dot needs BINARY inputs, got ${left.dataType}, ${right.dataType}")
  override def nullSafeEval(a: Any, b: Any): Any =
    VecIndex.sq8Dot(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecIndex.sq8Dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
}

/** pq_encode(vec): BINARY m-byte product-quantization code (one
  * codebook index per subspace; the codebook tensor is a plan
  * constant, like [[NearestCell]]'s centroid table — PQ codebooks
  * are index metadata, m×ksub×dsub floats). */
case class PqEncode(child: Expression, books: Array[Array[Array[Float]]])
    extends UnaryExpression with FloatVecInput {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() = check(child.dataType)
  override def nullSafeEval(v: Any): Any =
    VecIndex.pqEncode(v.asInstanceOf[ArrayData], books)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", books, "float[][][]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.VecIndex.pqEncode($v, $booksRef)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** pq_sub_assign(sub INT, subvec FLOAT[]): INT nearest code of the
  * subvector in codebook `sub` — the Lloyd assignment step of PQ
  * training, scan-side over (sub, subvec) exploded rows so one job
  * re-assigns every subspace per iteration. */
case class PqSubAssign(left: Expression, right: Expression,
                       books: Array[Array[Array[Float]]])
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes() = (left.dataType, right.dataType) match {
    case (IntegerType, ArrayType(FloatType, _)) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case (l, r) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_sub_assign needs (INT, ARRAY<FLOAT>), got $l, $r")
  }
  override def nullSafeEval(sub: Any, v: Any): Any =
    VecIndex.pqSubAssign(sub.asInstanceOf[Int], v.asInstanceOf[ArrayData], books)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", books, "float[][][]")
    defineCodeGen(ctx, ev, (s, v) =>
      s"graft.functions.VecIndex.pqSubAssign($s, $v, $booksRef)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
}

/** pq_adc(code BINARY): LONG integer ADC score against a plan-constant
  * query LUT (micro-units). The candidate-generation scan of the
  * IVF-PQ search path reads m bytes + this lookup per row. */
case class PqAdcMicros(child: Expression, lut: Array[Array[Long]])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"pq_adc needs BINARY input, got ${child.dataType}")
  override def nullSafeEval(c: Any): Any =
    VecIndex.pqAdc(c.asInstanceOf[Array[Byte]], lut)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lutRef = ctx.addReferenceObj("pqLut", lut, "long[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VecIndex.pqAdc($c, $lutRef)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** sign_bits(vec): LONG 1-bit/dim binary quantization word. */
case class SignBits(child: Expression) extends UnaryExpression with FloatVecInput {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = check(child.dataType)
  override def nullSafeEval(v: Any): Any =
    VecIndex.signBits(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.VecIndex.signBits($v)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** pq_adc_flat(code BINARY, lut ARRAY<LONG>): LONG integer ADC score
  * against a row-carried flat LUT — the batch form, LUTs ride the
  * broadcast query table as a column. */
case class PqAdcFlatMicros(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = (left.dataType, right.dataType) match {
    case (BinaryType, ArrayType(LongType, _)) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case (l, r) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_adc_flat needs (BINARY, ARRAY<LONG>), got $l, $r")
  }
  override def nullSafeEval(c: Any, lut: Any): Any =
    VecIndex.pqAdcFlat(c.asInstanceOf[Array[Byte]], lut.asInstanceOf[ArrayData], ksub)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, l) =>
      s"graft.functions.VecIndex.pqAdcFlat($c, $l, $ksub)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
}

/** dec_l2(vec FLOAT[], cent DOUBLE[]): DOUBLE reduction-order-free L2
  * distance to a (typically per-group decimal-mean) centroid. */
case class DecL2(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case (l, r) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dec_l2 needs (ARRAY<FLOAT>, ARRAY<DOUBLE>), got $l, $r")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    VecIndex.decL2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecIndex.decL2($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
}

/** Column builders. */
object vecIndexExprs {
  def nearestCell(c: Column, ids: Array[Long], cents: Array[Array[Float]]): Column =
    shims.toColumn(NearestCell(shims.toExpression(c), ids, cents))
  def nearestCells(c: Column, ids: Array[Long], cents: Array[Array[Float]], p: Int): Column =
    shims.toColumn(NearestCells(shims.toExpression(c), ids, cents, p))
  def minCentDist(c: Column, cents: Array[Array[Float]]): Column =
    shims.toColumn(MinCentDist(shims.toExpression(c), cents))
  def sq8Code(c: Column): Column = shims.toColumn(Sq8Code(shims.toExpression(c)))
  def sq8Factor(c: Column): Column = shims.toColumn(Sq8Factor(shims.toExpression(c)))
  def sq8Dot(a: Column, b: Column): Column =
    shims.toColumn(Sq8Dot(shims.toExpression(a), shims.toExpression(b)))
  def decL2(v: Column, m: Column): Column =
    shims.toColumn(DecL2(shims.toExpression(v), shims.toExpression(m)))
  def pqEncode(c: Column, books: Array[Array[Array[Float]]]): Column =
    shims.toColumn(PqEncode(shims.toExpression(c), books))
  def pqSubAssign(sub: Column, v: Column, books: Array[Array[Array[Float]]]): Column =
    shims.toColumn(PqSubAssign(shims.toExpression(sub), shims.toExpression(v), books))
  def pqAdc(c: Column, lut: Array[Array[Long]]): Column =
    shims.toColumn(PqAdcMicros(shims.toExpression(c), lut))
  def pqAdcFlat(c: Column, lut: Column, ksub: Int): Column =
    shims.toColumn(PqAdcFlatMicros(shims.toExpression(c), shims.toExpression(lut), ksub))
  def signBits(c: Column): Column = shims.toColumn(SignBits(shims.toExpression(c)))
}
