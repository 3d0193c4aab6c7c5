package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from
  * codegen'd higher-order functions.
  *
  * Determinism contract: every reduction is a SEQUENTIAL left fold in
  * ascending index order accumulating in Double (float×float products
  * are exact in double, so the only rounding is the ordered additions).
  * That makes results bit-identical regardless of partitioning — and
  * bit-identical to any other engine that folds the same way — which is
  * what lets cosine ranks hash-match an external oracle.
  */
object VectorFunctions {

  /** Dot product of two float-array columns, accumulated in double,
    * ascending index order — the native codegen'd kernel
    * ([[FloatVecDot]]); bit-identical to the higher-order-function
    * fold it replaces. Requires [[GraftFunctions.register]] on the
    * session (queries call it; it is idempotent). */
  def dotProduct(a: Column, b: Column): Column =
    call_function("graft_vec_dot", a, b)

  /** L2 norm (same fold discipline). */
  def l2Norm(a: Column): Column =
    sqrt(call_function("graft_vec_dot", a, a))

  /** Cosine similarity given precomputed norms: dot / (na * nb) —
    * keep this exact expression shape on both engine and oracle side. */
  def cosineWithNorms(a: Column, b: Column, na: Column, nb: Column): Column =
    dotProduct(a, b) / (na * nb)
}
