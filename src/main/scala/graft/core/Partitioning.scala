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

  /** Dense surrogate ids 1..n in `order`-sorted order for a DIM-SIZED
    * frame, without a global window. `dense_rank().over(Window.orderBy)`
    * plans a partitionless WindowExec — same single reducer, plus a
    * planner warning in every run. Instead: coalesce to one partition,
    * sort within it, and number rows with monotonically_increasing_id
    * (partition 0 ⇒ ids 0,1,2,…). Equal to dense_rank when the sort
    * keys are distinct (dim builds always are — they follow a
    * distinct/groupBy). The nondeterministic id expression cannot be
    * reordered past the sort by Catalyst, and the sorted single
    * partition makes the numbering deterministic. Dim-sized frames
    * only: the coalesce serializes the tail of the plan. */
  def denseIds(df: DataFrame, idCol: String, order: Column*): DataFrame =
    df.coalesce(1).sortWithinPartitions(order: _*)
      .withColumn(idCol, (monotonically_increasing_id() + 1).cast("long"))

  /** CORPUS-SCALE global row numbers 1..n in `order`-sorted order,
    * without a global window OR a single-partition coalesce (contrast
    * [[denseIds]], which is for dim-sized frames): range-partition on
    * the sort keys, sort within partitions, number rows per partition
    * with `monotonically_increasing_id` (pid in the upper bits, a
    * per-partition counter in the lower 33), then add per-partition
    * start offsets — computed from a #partitions-row count aggregate
    * collected at the driver (calibration-sized, like Histogram's
    * range probe; NOT a data collect) and broadcast back. Equals
    * `row_number() OVER (ORDER BY order*)` whenever the sort keys are
    * a total order (pass a unique id as the last key): the rank is a
    * pure order statistic, so it is partitioning-invariant and
    * deterministic. The ranked frame is persisted (OpCache) so the
    * count pass and every consumer read one materialization.
    *
    * The scalable-sort shape: at 100 TB the sort is P parallel
    * within-partition sorts after one range exchange, and the only
    * driver traffic is P (pid, count) rows. */
  def globalRank(df: DataFrame, rankCol: String, order: Column*): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val target = spark.sessionState.conf.numShufflePartitions
    val ranged = OpCache.persist(
      df.repartitionByRange(target, order: _*)
        .sortWithinPartitions(order: _*)
        .withColumn("__mid", monotonically_increasing_id()))
    val counts = ranged
      .groupBy(shiftright(col("__mid"), 33).as("__pid"))
      .agg(count(lit(1)).as("__cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.scanLeft((0L, 0L)) { case ((_, acc), (pid, c)) =>
      (pid, acc + c)
    }.sliding(2).collect { case Array((_, start), (pid, _)) =>
      (pid, start)
    }.toSeq
    // scanLeft pairs each pid with the cumulative count BEFORE it
    val offDf = offsets.toDF("__pid", "__off")
    ranged
      .join(broadcast(offDf), shiftright(col("__mid"), 33) === col("__pid"))
      .withColumn(rankCol,
        col("__off") + col("__mid").bitwiseAND(lit((1L << 33) - 1)) + 1)
      .drop("__mid", "__pid", "__off")
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
