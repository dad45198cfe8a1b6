package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StructField, StructType}

/** Shared input-type guard for the vector kernels: analysis-time
  * rejection of non-`array<float|double>` children, instead of a
  * ClassCastException at execution time.
  */
private[expressions] object VectorExprs {
  def isFloatingArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }
}

/** Native codegen'd dot product over two `array<double>` columns.
  *
  * Replaces the `aggregate(zip_with(a, b, _*_), 0.0, _+_)` higher-order
  * chain: HOFs are interpreted per element (lambda dispatch + boxed
  * `zip_with` intermediate array per row), which dominated the pairwise
  * cosine queries (~2M pairs × 64 dims ⇒ ~20 s at sf0.1). This
  * expression is one tight fused loop inside whole-stage codegen — no
  * intermediate array, no boxing — and preserves the exact left-to-right
  * IEEE summation order of the fold (acc starts at 0.0; `0.0 + x ≡ x`),
  * so results stay bit-identical to the DuckDB oracle's `list_reduce`.
  *
  * Semantics pinned by GraftExpressionsSpec: unequal lengths fold the
  * common prefix; a null array yields null (nullSafe). Either side may
  * be `array<float>` — elements are widened to double per element
  * (exact, so the result is bit-identical to casting the array first),
  * which lets the pairwise-cosine verify joins shuffle raw float
  * vectors at half the bytes of their double form.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    Seq(left, right).zip(Seq("left", "right")).collectFirst {
      case (e, side) if !VectorExprs.isFloatingArray(e.dataType) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires the $side input to be array<float> or " +
            s"array<double>, got ${e.dataType.catalogString}")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val leftFloat = isFloat(left)
  @transient private lazy val rightFloat = isFloat(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val xe = if (leftFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val ye = if (rightFloat) y.getFloat(i).toDouble else y.getDouble(i)
      s += xe * ye
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val xe = if (leftFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val ye = if (rightFloat) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $xe * $ye;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Symmetric int8 quantization statistics in ONE pass over the vector:
  * struct(scale, q_sum, q_min, q_max, mse).
  *
  * The HOF formulation (`transform` for |v|, `array_max`, a second
  * `transform` for q, `aggregate` for the sum, `array_min`/`array_max`
  * for the range, `zip_with`+`aggregate` for the MSE) re-evaluates the
  * interpreted quantize lambda chain once per OUTPUT COLUMN — five
  * recomputes per row, ~9 s at sf0.1. This kernel computes all five
  * stats in two tight loops per row.
  *
  * Bit-exactness contract (pinned by GraftExpressionsSpec equivalence
  * and the q_sim_quantize oracle):
  *   scale = max(max_i |v_i|, 1e-12) / 127.0
  *   q_i   = floor(v_i / scale + 0.5).toLong
  *   mse   = Σ_i (v_i - q_i·scale)² / dim, summed left-to-right
  * Accepts `array<float>` (widened per element, exactly like
  * `transform(v, _.cast(double))`) or `array<double>`. Empty/null
  * arrays yield a null struct — a DELIBERATE semantics choice, not an
  * HOF equivalence: the replaced formulation's
  * `greatest(array_max(|v|), 1e-12)` SKIPS the null from
  * `array_max(empty)` (Spark `greatest` ignores nulls), so it produced
  * scale = 1e-12/127, q_sum = 0, mse = 0.0 with only q_min/q_max null.
  * Quantization stats of a zero-dimension vector are undefined; one
  * null struct beats a half-null row of fictitious zeros. Pinned in
  * GraftExpressionsSpec (non-empty equivalence + the empty-array
  * null).
  */
case class QuantizeStats(child: Expression, dim: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q_sum", LongType, nullable = false),
    StructField("q_min", LongType, nullable = false),
    StructField("q_max", LongType, nullable = false),
    StructField("mse", DoubleType, nullable = false)))

  override def prettyName: String = "graft_quantize_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorExprs.isFloatingArray(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> or array<double> input, " +
        s"got ${child.dataType.catalogString}")

  // Always nullable regardless of the child: an EMPTY array yields a
  // null struct (mirroring array_max(empty) = null upstream), even
  // when the array column itself is non-nullable.
  override def nullable: Boolean = true

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (n == 0) return null
    @inline def at(i: Int): Double =
      if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
    var maxabs = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(at(i))
      if (a > maxabs) maxabs = a
      i += 1
    }
    val scale = math.max(maxabs, 1e-12) / 127.0
    var qSum = 0L
    var qMin = Long.MaxValue
    var qMax = Long.MinValue
    var sq = 0.0
    i = 0
    while (i < n) {
      val x = at(i)
      val q = math.floor(x / scale + 0.5).toLong
      qSum += q
      if (q < qMin) qMin = q
      if (q > qMax) qMax = q
      val e = x - q * scale
      sq += e * e
      i += 1
    }
    new GenericInternalRow(Array[Any](scale, qSum, qMin, qMax, sq / dim.toDouble))
  }

  override protected def withNewChildInternal(newChild: Expression): QuantizeStats =
    copy(child = newChild)
}

/** All hyperplane-LSH band buckets of a vector in ONE pass — the
  * signature kernel of the scale-adaptive embedding near-dup banding
  * (graft.operators.Similarity.bandedBuckets, consumed by
  * Dedup.embeddingPairsOf).
  *
  * The declarative formulation built one `when(graft_dot(lit_plane, v)
  * > 0, …)` expression per plane: at the ladder floor (4×8 = 32
  * planes) that held inside the sf0.1 budget, but the r8 sf1 bench
  * showed it dominating the adaptive rungs — 12 planes × 6 bands = 72
  * root expressions per row, each re-dispatching into the projection
  * interpreter (the wide CreateArray around them disables whole-stage
  * codegen for the projection), which turned the rung step-up into
  * 12.65× time for 10× data. This kernel evaluates the whole
  * bands × planes × dim triple loop in primitive arithmetic: one
  * expression node per row, zero boxing, O(bands·planes·dim) flops.
  *
  * Bit-exactness contract (pinned by GraftExpressionsSpec): plane i of
  * band b is `planes(b·planesPerBand + p)`; each dot folds
  * left-to-right in double over the common prefix (exactly
  * [[DotProduct]]), and bit p of band b's bucket is set iff that dot
  * is strictly positive — so buckets are bit-identical to the
  * `when(dot > 0, 1L << p)` chain and to the DuckDB oracle's
  * `list_reduce` + `CASE WHEN > 0` derivation. Accepts `array<float>`
  * (widened per element) or `array<double>`.
  *
  * Null contract — a DELIBERATE divergence from the declarative form:
  * a null vector yields a null bucket ARRAY (nullSafe), where the
  * `when(dot > 0, …).otherwise(0L)` chain produced all-zero buckets
  * (graft_dot's null propagates into `when`'s condition, which reads
  * null as false). Banding a vector that does not exist is undefined;
  * null-out beats a fabricated all-zeros bucket that would collide
  * every null vector into one candidate clique. Consumers posexplode
  * the array, so null vectors simply leave the banding path — and the
  * final pair set is unaffected either way (a null vector's cosine is
  * null, which the verify filter drops). Pinned in
  * GraftExpressionsSpec alongside the non-null parity cases.
  */
case class HyperplaneBands(child: Expression, planes: Seq[Seq[Double]],
    planesPerBand: Int) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hyperplane_bands"

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorExprs.isFloatingArray(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> or array<double> input, " +
        s"got ${child.dataType.catalogString}")

  @transient private lazy val mat: Array[Array[Double]] =
    planes.map(_.toArray).toArray
  @transient private lazy val nBands: Int = planes.size / planesPerBand
  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var bucket = 0L
      var p = 0
      while (p < planesPerBand) {
        val plane = mat(b * planesPerBand + p)
        val m = math.min(plane.length, n)
        var s = 0.0
        var j = 0
        if (isFloat) while (j < m) { s += plane(j) * v.getFloat(j); j += 1 }
        else while (j < m) { s += plane(j) * v.getDouble(j); j += 1 }
        if (s > 0) bucket |= 1L << p
        p += 1
      }
      out(b) = bucket
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBands =
    copy(child = newChild)
}
