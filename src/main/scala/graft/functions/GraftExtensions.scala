package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension registration of graft's native expressions, the
  * deployment-grade alternative to the per-session
  * [[GraftFunctions.register]] call:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions ...
  * // or
  * SparkSession.builder().withExtensions(new GraftExtensions)
  * }}}
  *
  * makes `graft_vec_dot` available to every session (including pure
  * SQL users) without application code.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "graft_vec_dot"),
      (exprs: Seq[Expression]) => FloatVecDot(exprs(0), exprs(1)))
      : (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_byte_dot"),
      new ExpressionInfo(classOf[ByteVecDot].getName, "graft_byte_dot"),
      (exprs: Seq[Expression]) => ByteVecDot(exprs(0), exprs(1)))
      : (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_vec_l2sq"),
      new ExpressionInfo(classOf[FloatVecL2].getName, "graft_vec_l2sq"),
      (exprs: Seq[Expression]) => FloatVecL2(exprs(0), exprs(1)))
      : (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_vocab_tokens"),
      new ExpressionInfo(classOf[VocabTokenCount].getName, "graft_vocab_tokens"),
      (exprs: Seq[Expression]) => VocabTokenCount(exprs(0), exprs(1)))
      : (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_gear_cuts"),
      new ExpressionInfo(classOf[GearCuts].getName, "graft_gear_cuts"),
      (exprs: Seq[Expression]) => GearCuts(exprs(0)))
      : (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash60"),
      new ExpressionInfo(classOf[Simhash60].getName, "graft_simhash60"),
      (exprs: Seq[Expression]) => Simhash60(exprs(0)))
      : (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_bottom_k"),
      new ExpressionInfo(classOf[BottomKSketch].getName, "graft_bottom_k"),
      (exprs: Seq[Expression]) => {
        val k = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"graft_bottom_k k must be a literal, got $other")
        }
        BottomKSketch(exprs(0), k)
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_hll"),
      new ExpressionInfo(classOf[HllSketch].getName, "graft_hll"),
      (exprs: Seq[Expression]) => HllSketch(
        exprs(0), GraftFunctions.litInt(exprs(1), "p")))
      : (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKAgg].getName, "graft_topk"),
      (exprs: Seq[Expression]) => TopKAgg(
        exprs(0), exprs(1), GraftFunctions.litInt(exprs(2), "k")))
      : (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_build"),
      new ExpressionInfo(classOf[BloomBuild].getName, "graft_bloom_build"),
      (exprs: Seq[Expression]) => BloomBuild(
        exprs(0),
        GraftFunctions.litInt(exprs(1), "nBits"),
        GraftFunctions.litInt(exprs(2), "nHashes")))
      : (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(classOf[BloomMightContain].getName, "graft_bloom_contains"),
      (exprs: Seq[Expression]) => BloomMightContain(
        exprs(0), exprs(1), GraftFunctions.litInt(exprs(2), "nHashes")))
      : (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_cms"),
      new ExpressionInfo(classOf[CountMinSketch].getName, "graft_cms"),
      (exprs: Seq[Expression]) => CountMinSketch(
        exprs(0),
        GraftFunctions.litInt(exprs(1), "depth"),
        GraftFunctions.litInt(exprs(2), "width")))
      : (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_heavy_keys"),
      new ExpressionInfo(classOf[MisraGries].getName, "graft_heavy_keys"),
      (exprs: Seq[Expression]) => {
        val k = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"graft_heavy_keys k must be a literal, got $other")
        }
        MisraGries(exprs(0), k)
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))
  }
}
