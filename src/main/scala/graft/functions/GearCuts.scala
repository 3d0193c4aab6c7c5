package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Gear rolling-hash cut positions over a string's bytes — the native
  * kernel behind [[graft.operators.Multimodal.gearChunkDedupStats]].
  *
  * Semantics (identical to the per-position expression form the oracle
  * replays): rolling state h_i = (h_{i-1} << 1) + gear8(b_i); emit cut
  * position i (1-based) when i ≥ 8 and (h_i & 255) == 0. Because a
  * term shifted j positions contributes nothing below bit j and carries
  * only propagate upward, (h_i & 255) depends on exactly the trailing
  * 8 bytes — which is why the SQL oracle can compute the same cut set
  * windowed, while this kernel runs the true single-pass rolling form:
  * two integer ops per byte instead of 8 × (substr + ascii +
  * element_at) per position (~20× on the chunking-heavy queries).
  *
  * The gear table is [[graft.operators.Multimodal.gearTable8]] —
  * md5-derived, low 8 bits, engine-reproducible.
  */
case class GearCuts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_gear_cuts"

  override def nullSafeEval(t: Any): Any =
    GearCuts.cuts(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.GearCuts.cuts($t);")

  override protected def withNewChildInternal(newChild: Expression): GearCuts =
    copy(child = newChild)
}

object GearCuts {
  private val gear: Array[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(256)(b => md.digest(s"gear:$b".getBytes("UTF-8"))(0) & 0xFF)
  }

  /** Single rolling pass; returns 1-based cut positions ≥ 8. */
  def cuts(text: UTF8String): ArrayData = {
    val b = text.getBytes
    val n = b.length
    var h = 0
    var i = 0
    val out = new java.util.ArrayList[Integer](8)
    while (i < n) {
      h = (h << 1) + gear(b(i) & 0xFF)
      if (i >= 7 && (h & 255) == 0) out.add(i + 1)
      i += 1
    }
    val arr = new Array[Any](out.size)
    var k = 0
    while (k < out.size) { arr(k) = out.get(k).intValue(); k += 1 }
    new GenericArrayData(arr)
  }
}
