package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture materialization: collapse an ordered change
  * feed (upserts + delete tombstones) into the current snapshot — the
  * set-based half of mirroring an OLTP table into the warehouse (the
  * executed-MERGE path for serving is [[JdbcUpsert]]; this operator is
  * the one that SCALES, because it never round-trips the warehouse).
  *
  * Semantics: per key, the feed row with the greatest `orderBy` tuple
  * wins ("latest wins" — a re-insert after a delete resurrects the
  * key); a key whose winning row is a tombstone is absent from the
  * snapshot entirely.
  *
  * Scale shape: one shuffle on the key, a per-key window (sort runs
  * bounded by per-key feed depth), no join against the previous
  * snapshot — at 100 TB the feed partitions by key hash and AQE
  * handles a hot key. Combine with [[graft.queries.Q]] qw03's SCD2
  * build when history, not just current state, must survive.
  */
object Cdc {

  /** Current-state snapshot of `changes`.
    *
    * @param keyCols  the business key
    * @param orderBy  change order, ASCENDING (latest = greatest tuple);
    *                 must be total per key for a deterministic winner —
    *                 include a tiebreaker column (e.g. the change id)
    * @param isDelete tombstone predicate on a feed row
    */
  def applyChanges(
      changes: DataFrame,
      keyCols: Seq[String],
      orderBy: Seq[Column],
      isDelete: Column): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderBy.map(_.desc): _*)
    changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && !isDelete)
      .drop("__rn")
  }
}
