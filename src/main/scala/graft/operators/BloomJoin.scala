package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-prefiltered EXACT joins — the runtime-row-filter pattern a
  * 100 TB join plan lives on.
  *
  * The gap this fills: Spark broadcasts a small side automatically only
  * while its full hash relation fits in memory (~tens of MB). A
  * medium dimension — say 50M keys after a selective filter — is far
  * past broadcast but its Bloom filter is not: 50M keys at 10 bits/key
  * is ~60 MB; at 6 bits/key ~38 MB, still one broadcast. So:
  *
  *   1. aggregate the small side's join keys into one `nBits`-bit
  *      filter (a single binary row — the ONLY state that moves;
  *      partial aggregation ORs per-partition filters map-side),
  *   2. broadcast it and drop big-side rows that cannot join BEFORE
  *      the join's shuffle,
  *   3. run the ordinary exact join on the survivors — it removes the
  *      false positives, so the composed operator is EXACT while the
  *      shuffle sees only `selectivity + fpr` of the big side.
  *
  * With a 1% match rate and a 1% fpr, the big-side shuffle drops 50×.
  * Spark's own `spark.sql.optimizer.runtimeFilter.bloomFilter.enabled`
  * applies the same idea opportunistically; this operator makes it an
  * explicit, deterministic building block (the filter bytes are
  * bit-reproducible — see [[graft.functions.BloomFilter64]]) that
  * callers can persist and reuse across queries like the stored ANN
  * indexes.
  *
  * Semi/inner need one scan of the big side. Anti needs the two-branch
  * shape: rows FAILING the Bloom probe are definite non-matches
  * (Bloom has no false negatives) and bypass the join entirely; only
  * the `fpr + selectivity` sliver that passes goes through the exact
  * anti-join. Both branches re-scan the big side, but scans are
  * column-pruned parquet reads while the avoided cost is a full-table
  * shuffle — the right trade at scale.
  */
object BloomJoin {

  /** Default filter geometry: ~10 bits/key at 5 hashes ≈ 0.9% fpr. */
  val DefaultBits: Int = 1 << 20
  val DefaultHashes: Int = 5

  /** Build the 1-row filter table for `small`'s LongType key column.
    * Persist/reuse the result across queries if the small side is
    * expensive to recompute. */
  def keyBloom(
      small: DataFrame,
      smallKey: String,
      nBits: Int = DefaultBits,
      nHashes: Int = DefaultHashes): DataFrame =
    small.agg(
      call_function("graft_bloom_build", col(smallKey), lit(nBits), lit(nHashes))
        .as("bloom_bits"))

  /** Big-side rows that MIGHT join (exact matches plus ~fpr false
    * positives): cross-join the broadcast 1-row filter, probe per row.
    * The probe is a codegen'd expression, so the filter runs inside
    * the scan's WholeStageCodegen span. */
  def prefilter(
      big: DataFrame,
      bigKey: String,
      bloom: DataFrame,
      nHashes: Int = DefaultHashes): DataFrame =
    big.join(broadcast(bloom))
      .where(call_function("graft_bloom_contains", col("bloom_bits"), col(bigKey), lit(nHashes)))
      .drop("bloom_bits")

  /** Exact left-semi join of `big` against `small`'s key set, Bloom-
    * prefiltered. Output == plain `LEFT SEMI JOIN`. */
  def semiJoin(
      big: DataFrame,
      bigKey: String,
      small: DataFrame,
      smallKey: String,
      nBits: Int = DefaultBits,
      nHashes: Int = DefaultHashes): DataFrame = {
    val pre = prefilter(big, bigKey, keyBloom(small, smallKey, nBits, nHashes), nHashes)
    val keys = small.select(col(smallKey).as("__bloom_probe_key"))
    pre.join(keys, pre(bigKey) === keys("__bloom_probe_key"), "left_semi")
  }

  /** Exact inner join, Bloom-prefiltered: the canonical runtime-filter
    * shape — the join itself eliminates false positives, so no second
    * pass is needed and the big side is scanned once. */
  def innerJoin(
      big: DataFrame,
      bigKey: String,
      small: DataFrame,
      smallKey: String,
      joinExpr: (DataFrame, DataFrame) => Column,
      nBits: Int = DefaultBits,
      nHashes: Int = DefaultHashes): DataFrame = {
    val pre = prefilter(big, bigKey, keyBloom(small, smallKey, nBits, nHashes), nHashes)
    pre.join(small, joinExpr(pre, small), "inner")
  }

  /** Exact left-anti join, Bloom-prefiltered with the two-branch
    * shape: Bloom failures are definite output (no false negatives);
    * only Bloom passes go through the exact anti-join shuffle. */
  def antiJoin(
      big: DataFrame,
      bigKey: String,
      small: DataFrame,
      smallKey: String,
      nBits: Int = DefaultBits,
      nHashes: Int = DefaultHashes): DataFrame = {
    // both branches consume the filter — persist the 1-row frame so
    // the small-side scan + OR-aggregate runs once, not per branch
    val bloom = graft.core.OpCache.persist(
      keyBloom(small, smallKey, nBits, nHashes))
    val flagged = big.join(broadcast(bloom))
      .withColumn(
        "__bloom_maybe",
        call_function("graft_bloom_contains", col("bloom_bits"), col(bigKey), lit(nHashes)))
      .drop("bloom_bits")
    val definite = flagged.where(!col("__bloom_maybe")).drop("__bloom_maybe")
    val maybe = flagged.where(col("__bloom_maybe")).drop("__bloom_maybe")
    val keys = small.select(col(smallKey).as("__bloom_probe_key"))
    val checked =
      maybe.join(keys, maybe(bigKey) === keys("__bloom_probe_key"), "left_anti")
    definite.unionByName(checked)
  }
}
