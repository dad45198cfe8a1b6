package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

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
  * common prefix; a null array yields null (nullSafe).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
