package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Product-quantization kernels (Jégou et al. 2011, "Product Quantization
  * for Nearest Neighbor Search", IEEE TPAMI 33(1)).
  *
  * A dim-vector is split into `m` contiguous subvectors; each subvector is
  * quantized to its nearest (L2) centroid of a per-subspace `ksub`-entry
  * codebook. With m ≤ 8 and ksub ≤ 256 the whole code packs into ONE
  * 64-bit long (8 bits per subspace) — the serve-side corpus shrinks from
  * dim doubles (512 B at dim=64) to 8 B per vector, which is the entire
  * point at 100 TB: an ANN scan streams codes, not vectors.
  *
  * Query-side scoring is asymmetric distance computation (ADC): the query
  * stays un-quantized, a per-query lookup table lut[s][j] = ⟨q_s, c_{s,j}⟩
  * is built once (PqLut, m·ksub doubles), and each corpus code scores as
  * Σ_s lut[s][code_s] (PqAdc) — m array reads and adds per row instead of
  * a dim-length multiply-add, inside whole-stage codegen.
  *
  * All three expressions share static kernels between the interpreted and
  * codegen paths, and the codebook rides into generated code as a
  * reference object (no literal expression tree, no join, no Exchange).
  */
object PqKernels {

  /** Nearest sub-centroid (squared-L2, ties to the smallest index) of
    * subvector s of `v` against the flat [m][ksub][dsub] codebook. A NaN
    * distance never beats a finite one (strict `<`), and an all-NaN row
    * deterministically keeps index 0.
    */
  def nearestSub(v: ArrayData, s: Int, dsub: Int, cents: Array[Double],
      ksub: Int): Int = {
    val vOff = s * dsub
    val cBase = s * ksub * dsub
    var bestJ = 0
    var best = Double.PositiveInfinity
    var j = 0
    while (j < ksub) {
      var d2 = 0.0
      var d = 0
      val cOff = cBase + j * dsub
      while (d < dsub) {
        val diff = v.getDouble(vOff + d) - cents(cOff + d)
        d2 += diff * diff
        d += 1
      }
      if (d2 < best) { best = d2; bestJ = j }
      j += 1
    }
    bestJ
  }

  /** Packed PQ code: subspace s's centroid index in bits [8s, 8s+8). */
  def encode(v: ArrayData, cents: Array[Double], m: Int, ksub: Int): Long = {
    val dsub = v.numElements() / m
    var code = 0L
    var s = 0
    while (s < m) {
      code |= nearestSub(v, s, dsub, cents, ksub).toLong << (8 * s)
      s += 1
    }
    code
  }

  /** ADC lookup table for query q: lut[s·ksub + j] = ⟨q_s, c_{s,j}⟩,
    * index-order accumulation within each subspace.
    */
  def lut(q: ArrayData, cents: Array[Double], m: Int, ksub: Int): ArrayData = {
    val dsub = q.numElements() / m
    val out = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      val qOff = s * dsub
      var j = 0
      while (j < ksub) {
        var dot = 0.0
        var d = 0
        val cOff = (s * ksub + j) * dsub
        while (d < dsub) {
          dot += q.getDouble(qOff + d) * cents(cOff + d)
          d += 1
        }
        out(s * ksub + j) = dot
        j += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Σ_s lut[s·ksub + code_s] — approximates ⟨q, x⟩ by ⟨q, x̂⟩ with the
    * subspace-grouped summation order (s ascending).
    */
  def adc(code: Long, lut: ArrayData, m: Int): Double = {
    val ksub = lut.numElements() / m
    var sum = 0.0
    var s = 0
    while (s < m) {
      sum += lut.getDouble(s * ksub + ((code >>> (8 * s)) & 0xFFL).toInt)
      s += 1
    }
    sum
  }
}

/** v → packed 64-bit PQ code against a plan-constant flat codebook. Null
  * on a dimension mismatch (dim must be m·dsub with
  * cents.length = ksub·dim), same fail-loudly policy as DotProduct.
  */
case class PqEncode(child: Expression, cents: Array[Double], m: Int, ksub: Int)
    extends UnaryExpression {
  require(m >= 1 && m <= 8 && ksub >= 1 && ksub <= 256,
    s"PQ code must pack into one long: m=$m (≤8), ksub=$ksub (≤256)")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double> argument, got ${t.sql}")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val dim = a.numElements()
    if (dim % m != 0 || dim * ksub != cents.length) null
    else java.lang.Long.valueOf(PqKernels.encode(a, cents, m, ksub))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("pqCents", cents, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |if ($v.numElements() % $m != 0 ||
         |    $v.numElements() * $ksub != $centsRef.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.expressions.PqKernels.encode($v, $centsRef, $m, $ksub);
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** q → ADC lookup table (array of m·ksub doubles) against the same
  * plan-constant codebook. Null on a dimension mismatch.
  */
case class PqLut(child: Expression, cents: Array[Double], m: Int, ksub: Int)
    extends UnaryExpression {
  require(m >= 1 && m <= 8 && ksub >= 1 && ksub <= 256,
    s"PQ code must pack into one long: m=$m (≤8), ksub=$ksub (≤256)")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pq_lut"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double> argument, got ${t.sql}")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val dim = a.numElements()
    if (dim % m != 0 || dim * ksub != cents.length) null
    else PqKernels.lut(a, cents, m, ksub)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("pqCents", cents, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |if ($v.numElements() % $m != 0 ||
         |    $v.numElements() * $ksub != $centsRef.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.expressions.PqKernels.lut($v, $centsRef, $m, $ksub);
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

/** (code, lut) → approximate ⟨q, x⟩. Null when the lut length is not a
  * multiple of m (a codebook/kernel mismatch must not pass silently); the
  * 8-bit field of a valid PqEncode code is always < ksub by construction.
  */
case class PqAdc(left: Expression, right: Expression, m: Int)
    extends BinaryExpression {
  require(m >= 1 && m <= 8, s"PQ code must pack into one long: m=$m (≤8)")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (LongType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, array<double>) arguments, got ${l.sql} and ${r.sql}")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(code: Any, lutArr: Any): Any = {
    val l = lutArr.asInstanceOf[ArrayData]
    if (l.numElements() % m != 0) null
    else {
      val ksub = l.numElements() / m
      val c = code.asInstanceOf[Long]
      var s = 0
      while (s < m) {
        if (((c >>> (8 * s)) & 0xFFL) >= ksub) return null
        s += 1
      }
      PqKernels.adc(c, l, m)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (code, l) => {
      val ksub = ctx.freshName("ksub")
      val s = ctx.freshName("s")
      val bad = ctx.freshName("bad")
      s"""
         |if ($l.numElements() % $m != 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $ksub = $l.numElements() / $m;
         |  boolean $bad = false;
         |  for (int $s = 0; $s < $m; $s++) {
         |    if ((($code >>> (8 * $s)) & 0xFFL) >= $ksub) { $bad = true; break; }
         |  }
         |  if ($bad) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = graft.expressions.PqKernels.adc($code, $l, $m);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}
