package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native integer dot product over two `array<tinyint>` columns — the
  * scoring kernel of the scalar-quantized ANN tier ([[FloatVecDot]]'s
  * int8 sibling).
  *
  * Semantics are EXACTLY those of
  * `aggregate(zip_with(a, b, (x,y) -> long(x)*long(y)), 0L, +)`:
  * widened byte×byte products summed in long — integer arithmetic, so
  * the result is exact and order-free by nature; the codegen form
  * exists purely for speed (a tight primitive loop over unsafe array
  * bytes instead of per-element lambda evaluation). Products fit a
  * long for any realistic dimensionality (|x·y| ≤ 127² per element).
  */
case class ByteVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_byte_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getByte(i).toLong * y.getByte(i).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((long) $a.getByte($i)) * ((long) $b.getByte($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ByteVecDot =
    copy(left = newLeft, right = newRight)
}
