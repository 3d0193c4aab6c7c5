package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over two `array<float>` columns.
  *
  * Semantics are EXACTLY those of
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0.0d, +)`:
  * float×float products are exact in double, accumulation is a
  * sequential left fold in ascending index order starting at 0.0 — so
  * results are bit-identical to the higher-order-function form (and to
  * any engine folding the same way), but ~20× faster: a tight codegen
  * loop over the unsafe array data instead of per-element lambda
  * evaluation with object allocation. This is the hot kernel of the
  * O(n²)/IVF similarity operators.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
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
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

/** Session registration for graft's native expressions; idempotent. */
object GraftFunctions {
  /** Extract a literal Int argument (filter geometry must be constant
    * so build and probe agree by construction). */
  private[functions] def litInt(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v, _) => v.toString.toInt
    case other =>
      throw new IllegalArgumentException(s"$what must be a literal, got $other")
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_vec_dot", exprs => FloatVecDot(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_byte_dot", exprs => ByteVecDot(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_vec_l2sq", exprs => FloatVecL2(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_vocab_tokens", exprs => VocabTokenCount(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_gear_cuts", exprs => GearCuts(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash60", exprs => Simhash60(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bottom_k",
      exprs => {
        val k = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"graft_bottom_k k must be a literal, got $other")
        }
        // raw AggregateFunction: the analyzer wraps it in an
        // AggregateExpression during function resolution
        BottomKSketch(exprs(0), k)
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hll",
      exprs => HllSketch(exprs(0), litInt(exprs(1), "p")),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_topk",
      exprs => TopKAgg(exprs(0), exprs(1), litInt(exprs(2), "k")),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_build",
      exprs => BloomBuild(exprs(0), litInt(exprs(1), "nBits"), litInt(exprs(2), "nHashes")),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_contains",
      exprs => BloomMightContain(exprs(0), exprs(1), litInt(exprs(2), "nHashes")),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cms",
      exprs => CountMinSketch(
        exprs(0), litInt(exprs(1), "depth"), litInt(exprs(2), "width")),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_heavy_keys",
      exprs => {
        val k = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"graft_heavy_keys k must be a literal, got $other")
        }
        MisraGries(exprs(0), k)
      },
      "built-in")
  }
}
