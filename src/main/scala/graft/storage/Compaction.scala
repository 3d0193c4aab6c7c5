package graft.storage

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Small-file compaction planning — the lakehouse maintenance pass
  * (beyond-reference). A long-lived 100 TB table accretes small files
  * (streaming micro-batches, per-provider reloads, late-partition
  * repairs) until scan planning drowns in file-open overhead; the fix
  * is periodic rewrite of each partition's small files into
  * target-sized ones. The PLAN is the hard part to get reproducible:
  * which files co-rewrite into which output bin must be deterministic
  * so a retried/resumed maintenance job rewrites the same groups
  * (idempotent against the commit log) — RNG- or listing-order-based
  * packing is neither.
  *
  * [[Compaction.compactionPlan]] assigns files to bins by EXCLUSIVE
  * prefix sum: within a table partition, files ordered by id, bin k =
  * files whose preceding cumulative bytes land in
  * [k·target, (k+1)·target). Properties: bins are contiguous runs in
  * id order; every bin except the last holds ≥ target bytes minus one
  * file's overflow (a bin exceeds target by at most its last file);
  * the assignment is engine- and partitioning-invariant (pure window
  * arithmetic, no floats).
  *
  * Scale shape: the inventory is METADATA — one row per data file
  * (millions of rows for a 100 TB table), never the data itself. The
  * window partitions by the table-partition key, so each window group
  * is directory-sized (thousands of files); planning cost is one
  * metadata shuffle. The rewrite itself is the existing write path
  * (read bin, coalesce, [[Storage.writePartitioned]] overwrite of the
  * partition subtree).
  */
object Compaction {

  /** One row per file: (grp, file_id, bytes, bin). Files with
    * bytes ≥ `targetBytes` land alone in their own bin by
    * construction (their prefix interval spans ≥ one full bin) —
    * already-compact files are typically filtered out upstream.
    *
    * @param targetBytes desired output file size; must be positive.
    *                    Sizes must be non-negative (a negative size
    *                    would make the prefix sum non-monotonic and
    *                    the plan meaningless) — enforced at runtime
    *                    via an error expression, not an action. */
  def compactionPlan(
      files: DataFrame,
      groupCol: String,
      idCol: String,
      bytesCol: String,
      targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    files
      .select(col(groupCol).as("grp"), col(idCol).as("file_id"),
        // fail loudly on a negative size instead of emitting a bogus plan
        when(col(bytesCol).cast("long") < 0,
          raise_error(concat(lit("compactionPlan: negative file size for "),
            col(idCol).cast("string"))))
          .otherwise(col(bytesCol).cast("long")).as("bytes"))
      .withColumn("bin",
        expr(s"(sum(bytes) OVER (PARTITION BY grp ORDER BY file_id " +
          s"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - bytes) " +
          s"div ${targetBytes}L").cast("long"))
  }

  /** The bin-level summary a maintenance scheduler consumes: files
    * per bin and total bytes per bin, small bins first — rewriting
    * the many-tiny-file bins buys the most planning time per byte
    * moved. Pure aggregation over [[compactionPlan]]'s output. */
  def compactionSummary(plan: DataFrame): DataFrame =
    plan.groupBy(col("grp"), col("bin"))
      .agg(count(lit(1)).cast("long").as("n_files"),
        sum(col("bytes")).cast("long").as("total_bytes"))
}
