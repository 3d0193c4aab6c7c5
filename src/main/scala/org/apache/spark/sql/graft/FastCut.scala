package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.execution.LogicalRDD

/** Lineage truncation without the external-row round trip.
  *
  * The engine's iterative operators (CC label rounds, GD rounds, Lloyd
  * rounds, per-micro-batch state) must cut their logical plans each
  * round or Catalyst re-analyzes a tree that doubles per iteration
  * (see Dedup.connectedComponents). The original cut —
  * `spark.createDataFrame(df.rdd, df.schema)` — pays two full codec
  * passes per row (`df.rdd` decodes InternalRow → external Row objects
  * with per-field boxing; `createDataFrame` immediately encodes them
  * back) and, worse, returns a frame with UNKNOWN output partitioning,
  * so a downstream join/aggregate on the very key the frame was just
  * shuffled by plans a fresh Exchange.
  *
  * This helper is the cut `Dataset.checkpoint` itself uses internally
  * (public Spark API surface, `LogicalRDD.fromDataset`): wrap the
  * plan's OWN InternalRow RDD in a LogicalRDD leaf. No row conversion
  * happens at all. `fromDataset` also carries the physical plan's
  * output partitioning onto the new leaf where that plan is final —
  * but under AQE an unexecuted plan reports UnknownPartitioning, so
  * callers that need a partitioning-stable loop input should use the
  * cached-plan pattern instead (`OpCache.persist(df.repartition(key))`
  * — cached plans keep their partitioning; see LineageSpec).
  *
  * The RDD is the lazy `queryExecution.toRdd` — same laziness contract
  * as the `df.rdd` cut: nothing materializes until an action, and a
  * multiply-consumed cut frame should be persisted (OpCache) exactly
  * as before. Rows flowing out of the leaf go through RDDScanExec's
  * UnsafeProjection like any scan, so downstream buffering operators
  * see the standard reuse contract.
  *
  * Lives under `org.apache.spark.sql` because `LogicalRDD` and
  * `Dataset.ofRows` are `private[sql]` — the standard extension-point
  * packaging for Catalyst-adjacent helpers.
  */
object FastCut {

  /** `df` with its logical plan replaced by a LogicalRDD leaf over the
    * plan's own InternalRow RDD — analysis-cost O(1), output
    * partitioning and ordering preserved. */
  def cut(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[ClassicDataset[Row]]
    val spark = ds.sparkSession
    val rdd = ds.queryExecution.toRdd
    ClassicDataset.ofRows(
      spark, LogicalRDD.fromDataset(rdd, ds, isStreaming = false))
  }
}
