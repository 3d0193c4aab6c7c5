package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Partitioning hygiene helpers. */
object Partitioning {

  /** Two-phase (salted) aggregation for skewed group keys: phase 1
    * aggregates on (key, salt) spreading a hot key over `buckets`
    * reducers; phase 2 merges the partials per key. Correct for any
    * aggregate with an associative merge — pass the partial aggs and
    * the matching merge aggs (e.g. sum→sum, count→sum, min→min).
    * AQE's skew handling covers joins; aggregation skew still needs
    * this shape at 1000-executor scale.
    */
  def twoPhaseAgg(
      df: DataFrame,
      keys: Seq[String],
      buckets: Int)(
      partial: Seq[Column],
      merge: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Ensure a CPU-heavy narrow pipeline gets the session's full
    * shuffle parallelism. A small single-file parquet scan yields one
    * input split, which would serialize hashing/shingling/vector math
    * onto one core; at real scale inputs arrive in many splits and this
    * is a no-op (it never *reduces* partitioning). The repartition key
    * keeps co-location meaningful for downstream aggregates.
    *
    * Cost note: reading `rdd.getNumPartitions` plans the frame once
    * without executing it. Call this on scan-level inputs (as the
    * operators do), not on deep plans, so the extra planning pass is
    * file-listing only. */
  def parallelize(df: DataFrame, key: Column): DataFrame = {
    val target = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions < target) df.repartition(target, key) else df
  }
}
