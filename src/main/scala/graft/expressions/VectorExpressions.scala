package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst dot product over two Array[Double] columns.
  *
  * The higher-order-function encoding (`aggregate(zip_with(a,b,*),0,+)`)
  * allocates an intermediate array and evaluates two lambdas per element;
  * this expression compiles to a tight multiply-add loop inside
  * whole-stage codegen — the difference between an interpreted and a
  * compiled kernel on the 64-float hot path of every ANN/dedup pair.
  *
  * Accumulation is left-to-right in index order, exactly like the HOF
  * encoding and the DuckDB oracle (`list_inner_product`) — results are
  * bit-identical, so swapping the kernel never perturbs the correctness
  * gate.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  // null on length mismatch (and on a null slot, when the static type
  // allows one): DuckDB's list_inner_product errors on mismatched lengths,
  // so a dimension bug in embeddings must not pass silently as a truncated
  // sum on the Spark side.
  override def nullable: Boolean = true

  // lazy: children are unresolved at construction time (no dataType yet)
  private lazy val slotsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, n) => n
    case _ => false
  })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (slotsNullable && (x.isNullAt(i) || y.isNullAt(i))) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      // the null-slot check is only compiled in when the type carries it —
      // the common containsNull=false hot loop stays a pure multiply-add
      val slotCheck = if (slotsNullable)
        s"""if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }"""
      else ""
      s"""
         |int $n = $x.numElements();
         |${ev.value} = 0.0;
         |if ($y.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    $slotCheck
         |    ${ev.value} += $x.getDouble($i) * $y.getDouble($i);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Banded random-hyperplane LSH signature over an Array[Double] column.
  *
  * Returns `bands` Long codes; code i packs the sign bits of the vector's
  * dot products with `bits` pseudo-random hyperplanes. Two vectors at angle
  * θ agree on one plane's bit with probability 1 − θ/π, so sharing a band
  * code is the classic SimHash/hyperplane-LSH collision event — the
  * candidate-generation key for cosine similarity joins.
  *
  * Plane components are derived on the fly from a splitmix64 mix of
  * (seed, band, bit, dim): no plane matrix is stored, broadcast, or
  * embedded in the plan (a 72-band × 6-bit × 64-dim literal would be a
  * 27k-node expression tree), and the signature is deterministic across
  * runs and cluster layouts. Interpreted and codegen paths share the one
  * static kernel, so whole-stage codegen keeps a single tight loop.
  */
case class HyperplaneSig(child: Expression, seed: Long, bands: Int, bits: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hyperplane_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double> argument, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    HyperplaneSig.compute(v.asInstanceOf[ArrayData], seed, bands, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.expressions.HyperplaneSig.compute($v, ${seed}L, $bands, $bits)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

object HyperplaneSig {
  /** splitmix64 finalizer → uniform double in [-0.5, 0.5). */
  private def mixToDouble(x: Long): Double = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^= (z >>> 31)
    (z >>> 11) * 1.1102230246251565e-16 - 0.5 // 2^-53
  }

  /** Shared interpreted/codegen kernel. */
  def compute(v: ArrayData, seed: Long, bands: Int, bits: Int): ArrayData = {
    val dim = v.numElements()
    val out = new Array[Long](bands)
    var band = 0
    while (band < bands) {
      var code = 0L
      var bit = 0
      while (bit < bits) {
        val planeId = seed + (band.toLong * bits + bit) * 0x632BE59BD9B4E019L
        var dot = 0.0
        var d = 0
        while (d < dim) {
          dot += v.getDouble(d) * mixToDouble(planeId + d * 0xFF51AFD7ED558CCDL)
          d += 1
        }
        code = (code << 1) | (if (dot > 0) 1L else 0L)
        bit += 1
      }
      out(band) = code
      band += 1
    }
    new GenericArrayData(out)
  }
}

/** Argmax-cosine centroid id for an Array[Double] column against a
  * plan-constant codebook (ids, row-major flattened centroid vectors,
  * centroid norms) — the IVF coarse-quantization assignment as ONE narrow
  * codegen'd projection.
  *
  * This replaces a `crossJoin(broadcast(centroids))` →
  * `row_number() over (partitionBy vec_id)` plan whose Window forced a
  * full hash Exchange of the n·k-exploded corpus: at k=1024 cells that is
  * a 1024×-amplified full-corpus shuffle in the one operator whose whole
  * point is avoiding corpus-sized work. The codebook is already a
  * driver-local ≤1024-row array (the fit/serve split materializes it), so
  * assignment needs no join at all — the arrays ride into the generated
  * code as references and each row costs one k×dim multiply-add sweep
  * inside whole-stage codegen, zero Exchange.
  *
  * Tie-breaks mirror the Window ordering it replaces
  * (`ORDER BY ccos DESC, c_id`) under Spark SQL's total ordering on
  * doubles: NaN ranks above every value (a zero-norm vector or centroid
  * yields NaN cosine and wins), equal cosines break to the smallest c_id,
  * and a null vector slot — which nulls every cosine, ranking all
  * centroids equal (NULLS LAST) — resolves to the smallest c_id.
  */
case class NearestCentroid(child: Expression, cids: Array[Long],
    cents: Array[Double], cnorms: Array[Double])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_nearest_centroid"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double> argument, got ${t.sql}")
  }

  // null on a dimension mismatch with the codebook (same policy as
  // DotProduct: a dimension bug must not pass silently)
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    if (a.numElements() * cids.length != cents.length) null
    else java.lang.Long.valueOf(NearestCentroid.compute(a, cids, cents, cnorms))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("centroidIds", cids, "long[]")
    val vecsRef = ctx.addReferenceObj("centroidVecs", cents, "double[]")
    val nrmsRef = ctx.addReferenceObj("centroidNorms", cnorms, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |if ($v.numElements() * ${cids.length} != $vecsRef.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.expressions.NearestCentroid.compute(
         |    $v, $idsRef, $vecsRef, $nrmsRef);
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {
  /** Shared interpreted/codegen kernel. Caller guarantees
    * v.numElements() * cids.length == cents.length.
    */
  def compute(v: ArrayData, cids: Array[Long], cents: Array[Double],
      cnorms: Array[Double]): Long = {
    val dim = v.numElements()
    val k = cids.length
    // ‖v‖ in one pass; a null slot nulls every cosine (old-plan NULLS
    // LAST ties) → smallest centroid id
    var ss = 0.0
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i)) {
        var m = cids(0); var c = 1
        while (c < k) { if (cids(c) < m) m = cids(c); c += 1 }
        return m
      }
      val x = v.getDouble(i)
      ss += x * x
      i += 1
    }
    val vnrm = math.sqrt(ss)
    var bestId = Long.MaxValue
    var best = Double.NegativeInfinity
    var bestNaN = false
    var c = 0
    while (c < k) {
      var dot = 0.0
      var d = 0
      val off = c * dim
      while (d < dim) { dot += v.getDouble(d) * cents(off + d); d += 1 }
      val cos = dot / (vnrm * cnorms(c))
      val isNaN = java.lang.Double.isNaN(cos)
      // Spark SQL double ordering: NaN > everything, NaN == NaN
      val better =
        if (bestNaN) isNaN && cids(c) < bestId
        else isNaN || cos > best || (cos == best && cids(c) < bestId)
      if (better) { best = cos; bestId = cids(c); bestNaN = isNaN }
      c += 1
    }
    bestId
  }
}

/** Top-`p` centroid ids by cosine for an Array[Double] column against the
  * same plan-constant codebook as [[NearestCentroid]] — the multi-probe
  * cell assignment for the k-NN pair-graph build (r16) as ONE narrow
  * codegen'd projection.
  *
  * Why a second kernel instead of crossJoin + window over the probe rank:
  * the k-NN graph build assigns probe cells to EVERY distinct corpus
  * vector (not 20 queries), so the n·k exploded crossJoin — 90M+ rows each
  * carrying a 64-dim vector at 200k distinct × 450 cells — is exactly the
  * corpus-sized Window Exchange the singular kernel exists to avoid.
  *
  * Ordering is [[NearestCentroid.compute]]'s (`ccos DESC, c_id` under
  * Spark's NaN-greatest double total order), so element 0 of the result
  * ALWAYS equals the singular kernel's assignment; output is in rank
  * order. p is tiny (≤8) — selection is an insertion pass per candidate.
  */
case class NearestCentroids(child: Expression, cids: Array[Long],
    cents: Array[Double], cnorms: Array[Double], p: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_nearest_centroids"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double> argument, got ${t.sql}")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    if (a.numElements() * cids.length != cents.length) null
    else new GenericArrayData(
      NearestCentroids.computeTop(a, cids, cents, cnorms, p))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("centroidIds", cids, "long[]")
    val vecsRef = ctx.addReferenceObj("centroidVecs", cents, "double[]")
    val nrmsRef = ctx.addReferenceObj("centroidNorms", cnorms, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |if ($v.numElements() * ${cids.length} != $vecsRef.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    graft.expressions.NearestCentroids.computeTop(
         |      $v, $idsRef, $vecsRef, $nrmsRef, $p));
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}

object NearestCentroids {
  /** Shared interpreted/codegen kernel: ids of the top-min(p,k) centroids
    * in (ccos DESC NaN-greatest, c_id ASC) rank order. Caller guarantees
    * v.numElements() * cids.length == cents.length.
    */
  def computeTop(v: ArrayData, cids: Array[Long], cents: Array[Double],
      cnorms: Array[Double], p: Int): Array[Long] = {
    val dim = v.numElements()
    val k = cids.length
    val keep = math.min(p, k)
    // null slot → every cosine null → all centroids tie (NULLS LAST) →
    // smallest ids win, ascending (the singular kernel's tie rule)
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i)) {
        val sorted = cids.clone()
        java.util.Arrays.sort(sorted)
        return java.util.Arrays.copyOf(sorted, keep)
      }
      i += 1
    }
    var ss = 0.0
    i = 0
    while (i < dim) { val x = v.getDouble(i); ss += x * x; i += 1 }
    val vnrm = math.sqrt(ss)
    val topIds = new Array[Long](keep)
    val topCos = new Array[Double](keep)
    val topNaN = new Array[Boolean](keep)
    var filled = 0
    var c = 0
    while (c < k) {
      var dot = 0.0
      var d = 0
      val off = c * dim
      while (d < dim) { dot += v.getDouble(d) * cents(off + d); d += 1 }
      val cos = dot / (vnrm * cnorms(c))
      val isNaN = java.lang.Double.isNaN(cos)
      val id = cids(c)
      // rank: NaN > any value; equal → smaller id first
      def beats(j: Int): Boolean =
        if (topNaN(j)) isNaN && id < topIds(j)
        else isNaN || cos > topCos(j) || (cos == topCos(j) && id < topIds(j))
      var pos = filled
      while (pos > 0 && beats(pos - 1)) pos -= 1
      if (pos < keep) {
        val stop = math.min(filled, keep - 1)
        var m = stop
        while (m > pos) {
          topIds(m) = topIds(m - 1); topCos(m) = topCos(m - 1)
          topNaN(m) = topNaN(m - 1); m -= 1
        }
        topIds(pos) = id; topCos(pos) = cos; topNaN(pos) = isNaN
        if (filled < keep) filled += 1
      }
      c += 1
    }
    java.util.Arrays.copyOf(topIds, filled)
  }
}

object VectorExpressions {
  /** Column API for the native kernel. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column API for the banded hyperplane-LSH signature. */
  def hyperplaneSig(v: Column, seed: Long, bands: Int, bits: Int): Column =
    ColumnBridge.column(HyperplaneSig(
      ColumnBridge.expression(v), seed, bands, bits))

  /** Column API for the narrow IVF centroid assignment. */
  def nearestCentroid(v: Column, cids: Array[Long], cents: Array[Double],
      cnorms: Array[Double]): Column =
    ColumnBridge.column(NearestCentroid(
      ColumnBridge.expression(v), cids, cents, cnorms))

  /** Column API for the top-p multi-probe centroid assignment. */
  def nearestCentroids(v: Column, cids: Array[Long], cents: Array[Double],
      cnorms: Array[Double], p: Int): Column =
    ColumnBridge.column(NearestCentroids(
      ColumnBridge.expression(v), cids, cents, cnorms, p))
}
