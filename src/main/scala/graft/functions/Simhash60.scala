package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native 60-bit SimHash majority vote over an `array<long>` of token
  * hashes.
  *
  * Semantics are EXACTLY those of the composed-expression form
  * ([[graft.operators.Dedup.simhashOfHashes]]): per bit j, count
  * elements with bit j set (null elements count for no bits but DO
  * count toward the total — `size` vs `filter` semantics); set the
  * result bit where 2·count > total. The composed form evaluates 60
  * separate `filter`+`size` array traversals per row — O(60·k) lambda
  * evaluations with object allocation; this kernel is one tight pass
  * (O(k) longs, 60 integer counters), bit-identical output. Hot path
  * of the SimHash dedup family (qd03/qd06).
  */
case class Simhash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash60"

  override def nullSafeEval(in: Any): Any = {
    val hs = in.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val cnt = new Array[Int](60)
    var i = 0
    while (i < n) {
      if (!hs.isNullAt(i)) {
        val h = hs.getLong(i)
        var j = 0
        while (j < 60) {
          cnt(j) += ((h >>> j) & 1L).toInt
          j += 1
        }
      }
      i += 1
    }
    var res = 0L
    var j = 0
    while (j < 60) {
      if (2 * cnt(j) > n) res |= (1L << j)
      j += 1
    }
    res
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val res = ctx.freshName("res")
      s"""
         |int $n = $a.numElements();
         |int[] $cnt = new int[60];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    long $h = $a.getLong($i);
         |    for (int $j = 0; $j < 60; $j++) {
         |      $cnt[$j] += (int) (($h >>> $j) & 1L);
         |    }
         |  }
         |}
         |long $res = 0L;
         |for (int $j = 0; $j < 60; $j++) {
         |  if (2 * $cnt[$j] > $n) $res |= (1L << $j);
         |}
         |${ev.value} = $res;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Simhash60 =
    copy(child = newChild)
}
