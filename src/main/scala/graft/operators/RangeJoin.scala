package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join — fact value ∈ [lo, hi) of a dimension of
  * intervals — expressed as a bucketed EQUI-join, not a non-equi join.
  *
  * Spark plans a raw `f.v >= d.lo AND f.v < d.hi` join as a
  * broadcast-nested-loop: every fact row tests every interval. That is
  * fine for a 4-row dim and fatal for a 10⁶-row one. The scale-safe
  * shape decomposes the range predicate into an equi-join key: each
  * interval explodes to the fixed-width buckets it covers, the fact
  * side computes its single bucket, the join is `bucket = bucket` (hash
  * join, broadcastable, AQE-eligible) and the original range predicate
  * remains only as a residual filter on the matched pairs.
  *
  * Cost: |dim| × (interval width / bucketWidth) exploded build rows —
  * pick bucketWidth near the median interval width so the explosion
  * stays ~2×. Non-overlapping intervals ⇒ ≤1 match per fact row.
  */
object RangeJoin {

  /** @param fact       large side
    * @param dim        interval side with [loCol, hiCol) half-open bounds
    * @param factValue  fact column probed into the intervals
    * @param bucketWidth fixed bucket width (same unit as the value)
    * @param broadcastDim broadcast the exploded dim (default; disable
    *   for interval tables too large to broadcast — the equi-join then
    *   shuffles both sides on the bucket, still no nested loop) */
  def bucketedRangeJoin(
      fact: DataFrame,
      dim: DataFrame,
      factValue: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Double,
      broadcastDim: Boolean = true): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val dimB = dim.withColumn(
      "__bkt",
      // hi is exclusive, but the last bucket is floor(hi/w) anyway —
      // an epsilon subtraction would DROP the final bucket whenever hi
      // sits within the epsilon above a boundary (and float ulp makes
      // that reachable). The residual range filter below discards the
      // false candidates the extra bucket admits; correctness beats
      // one exploded row.
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    val factB = fact.withColumn(
      "__bkt", floor(col(factValue) / bucketWidth).cast("long"))
    factB.join(if (broadcastDim) broadcast(dimB) else dimB, Seq("__bkt"))
      .filter(col(factValue) >= col(loCol) && col(factValue) < col(hiCol))
      .drop("__bkt")
  }
}
