package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout — the WRITE-TIME shuffle lever.
  *
  * A join of two 100 TB fact tables shuffles both sides every time it
  * runs. Bucketing moves that shuffle to write time, ONCE: each table
  * is hash-partitioned into `nBuckets` files per partition on the join
  * key as it lands, and every later equi-join (or aggregation) on that
  * key reads co-located buckets directly — Catalyst plans a
  * SortMergeJoin with ZERO Exchange on either side (asserted in
  * BucketingSpec). The shuffle a recurring pipeline pays N times
  * collapses into one write-side partitioning amortized over every
  * downstream query, and bucket pruning (`SelectedBucketsCount`)
  * serves point lookups by reading 1/nBuckets of the data.
  *
  * Contract notes:
  *  - both sides must use the SAME nBuckets and bucket column for the
  *    exchange-free plan; mismatched widths fall back to a normal
  *    shuffle (still correct, just not free);
  *  - `sortBy` on the bucket key writes per-bucket sorted files, which
  *    lets the SMJ skip its sort when Spark can prove the order;
  *  - tables are EXTERNAL (explicit `path`) so callers control the
  *    storage location and lifetime; the catalog entry is metadata.
  */
object Bucketing {

  /** Write `df` as an external bucketed+sorted parquet table,
    * replacing any previous table of the same name. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      path: String,
      bucketCol: String,
      nBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.write
      .format("parquet")
      .mode("overwrite")
      .option("path", path)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
  }

  /** Equi-join two co-bucketed tables on the bucket key — the
    * exchange-free read path. */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      leftKey: String,
      rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey), "inner")
  }
}
