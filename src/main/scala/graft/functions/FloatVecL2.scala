package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native squared-L2 distance over two `array<float>` columns — the
  * product-quantization distance kernel ([[FloatVecDot]]'s sibling).
  *
  * Semantics are EXACTLY those of
  * `aggregate(zip_with(a, b, (x,y) -> (double(x)-double(y))^2), 0.0d, +)`:
  * each float widens to double exactly, the difference and square are
  * single IEEE ops, accumulation is a sequential left fold in ascending
  * index order starting at 0.0 — bit-identical to the higher-order-
  * function form and to any engine folding the same way (the DuckDB
  * oracles mirror this shape verbatim), but a tight codegen loop over
  * the unsafe array data. Hot kernel of PQ training, encoding, and the
  * ADC distance-table build.
  */
case class FloatVecL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_vec_l2sq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ((double) $a.getFloat($i)) - ((double) $b.getFloat($i));
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecL2 =
    copy(left = newLeft, right = newRight)
}
