package graft.storage

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Zone-map (min/max statistics) pruning simulation — the WHY behind
  * the layout machinery (q47 Z-order clustering, qw12 compaction,
  * qw13 partition refresh): data skipping only skips when values
  * CLUSTER within files, and this operator measures exactly how much
  * a given layout buys for a given predicate, before any rewrite is
  * paid for.
  *
  * This is the planning half of what parquet row-group statistics /
  * lakehouse file-skipping do at read time; running it as a query
  * over the live table turns "should we re-cluster?" into a measured
  * answer (scan fraction under the current vs the proposed layout).
  */
object ZoneMaps {

  /** Per-layout pruning stats for the range predicate
    * `lo <= valCol <= hi`: assign every row to a file via `fileExpr`
    * (the layout under evaluation), build each file's zone map
    * (min/max of `valCol` + row count — one hash aggregate), mark a
    * file scanned iff its [min, max] overlaps [lo, hi] (the
    * skip-or-scan decision needs ONLY the zone map, never the data —
    * that is the point), and fold to one row of exact counters.
    *
    * Scale shape: one map-side-combinable aggregate over the table
    * (files are metadata-sized after it) + one metadata fold; the
    * matching-row count is one more predicate-pushed scan. Rows with
    * NULL `valCol` never match the range and never force a scan
    * (nulls sit outside every zone, as in parquet stats).
    *
    * @return (layout, n_files, n_files_scanned, n_rows,
    *         n_rows_scanned, n_rows_matching) */
  def zonePruningStats(
      df: DataFrame, layout: String, fileExpr: Column,
      valCol: String, lo: Long, hi: Long): DataFrame = {
    val v = col(valCol).cast("long")
    val zones = df.groupBy(fileExpr.as("__file"))
      .agg(min(v).as("zmin"), max(v).as("zmax"),
        count(lit(1)).cast("long").as("n_rows"))
    val scanned = col("zmin").isNotNull &&
      col("zmin") <= lit(hi) && col("zmax") >= lit(lo)
    val folded = zones.agg(
      count(lit(1)).cast("long").as("n_files"),
      sum(when(scanned, 1L).otherwise(0L)).cast("long")
        .as("n_files_scanned"),
      sum(col("n_rows")).cast("long").as("n_rows"),
      sum(when(scanned, col("n_rows")).otherwise(0L)).cast("long")
        .as("n_rows_scanned"))
    val matching = df.filter(v >= lo && v <= hi)
      .agg(count(lit(1)).cast("long").as("n_rows_matching"))
    folded.crossJoin(matching)
      .select(lit(layout).as("layout"), col("n_files"),
        col("n_files_scanned"), col("n_rows"), col("n_rows_scanned"),
        col("n_rows_matching"))
  }
}
