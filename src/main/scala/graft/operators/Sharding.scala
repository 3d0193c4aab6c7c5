package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sharding for training-data export — the last
  * step before a tokenized corpus ships to trainers: place every
  * document at a reproducible pseudo-random position (hash order, so
  * the "shuffle" is stable across runs and partitionings) and cut the
  * stream into shards holding ~`budget` tokens each, in order.
  *
  * The core primitive is a GLOBAL cumulative token sum computed
  * WITHOUT a global window (a single-reducer sort is exactly what
  * dies first at 100 TB): documents bucket by the first hex digit of
  * their placement key — a PREFIX of the global sort key, so each
  * bucket is a contiguous range of the global order — then
  *   1. per-bucket cumulative sums (windows partitioned by bucket:
  *      16-way parallel, per-partition external sort),
  *   2. one 16-row aggregate of bucket totals, folded into per-bucket
  *      prefix OFFSETS inside a single array expression (no window,
  *      no cartesian — the frame is one row),
  *   3. a broadcast equi-join adds offset + in-bucket cumsum.
  * global_before(doc) = tokens strictly before doc in key order, and
  * shard = global_before div budget. More buckets (two hex digits →
  * 256) widen parallelism at any scale; correctness is unaffected
  * because bucket boundaries align with key order by construction.
  *
  * Determinism: md5 keys are unique per doc (distinct ids), the
  * cumsum is integer, shard cuts are integer division — bit-identical
  * at any partition count, which is what makes shard manifests
  * reproducible artifacts rather than run-lottery outputs.
  */
object Sharding {

  /** Per-shard manifest: (shard, n_docs, shard_tokens).
    *
    * @param tokensCol token count per document (pre-tokenized length —
    *                  same seam as [[Packing.sequencePack]])
    * @param budget    target tokens per shard (a shard holds the docs
    *                  whose running total falls in one budget window;
    *                  a doc larger than `budget` still lands in
    *                  exactly one shard — shards never split docs)
    */
  def tokenShards(
      docs: DataFrame, idCol: String, tokensCol: Column,
      budget: Long): DataFrame =
    tokenShardAssignments(docs, idCol, tokensCol, budget)
      .groupBy(col("shard"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("tokens")).cast("long").as("shard_tokens"))

  /** The per-document assignment table behind [[tokenShards]] — the
    * artifact an export job actually consumes (join it back to the
    * corpus and write one directory per shard): (doc_id, tokens,
    * before = tokens strictly ahead in placement order, shard).
    * Same two-phase global cumsum; deterministic at any
    * partitioning. */
  def tokenShardAssignments(
      docs: DataFrame, idCol: String, tokensCol: Column,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    // keyed feeds BOTH the in-bucket windows and the bucket-total
    // fold — persist so the upstream (possibly a whole composed
    // pipeline, e.g. qt36's decontaminate→dedup→mix→pack) computes
    // once, not per consumer (measured qt36 12.8 → ~7 s)
    val keyed = graft.core.OpCache.persist(docs.select(
      col(idCol).as("doc_id"),
      md5(col(idCol).cast("string")).as("key"),
      tokensCol.cast("long").as("tokens"))
      .withColumn("bucket", substring(col("key"), 1, 1)))
    // materialize BEFORE branching: the two consumers' shuffles map
    // over keyed concurrently in one job, and a lazily-populated cache
    // would let both recompute the upstream (measured on qt36)
    keyed.count()
    // (1) in-bucket running totals — 16-way parallel window
    val wb = Window.partitionBy(col("bucket")).orderBy(col("key"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = keyed.withColumn("cum_in", sum(col("tokens")).over(wb))
    // (2) bucket totals → prefix offsets, inside one 1-row array frame
    // (sort_array orders by bucket — the struct's first field)
    val totals = keyed.groupBy(col("bucket"))
      .agg(sum(col("tokens")).as("total"))
      .agg(sort_array(collect_list(struct(col("bucket"), col("total")))).as("bt"))
      .select(explode(transform(col("bt"), (x, i) => struct(
        x.getField("bucket").as("bucket"),
        aggregate(slice(col("bt"), lit(1), i), lit(0L),
          (acc, s) => acc + s.getField("total")).as("offset")))).as("o"))
      .select(col("o.bucket").as("bucket"), col("o.offset").as("offset"))
    // (3) broadcast the 16-row offset table back onto the stream
    local.join(broadcast(totals), Seq("bucket"))
      .withColumn("before", col("offset") + col("cum_in") - col("tokens"))
      .withColumn("shard", expr("before div " + budget))
      .select(col("doc_id"), col("tokens"), col("before"), col("shard"))
  }

  /** GROUPED two-phase cumulative token sum — the
    * [[tokenShardAssignments]] machinery per group: every document
    * stands at its stable md5-hash position WITHIN its group, and
    * `before` counts the group's tokens strictly ahead of it. Used by
    * [[graft.operators.Curation.waterfilledMix]] to cut deterministic
    * per-source prefixes; the same no-single-reducer discipline —
    * windows partition on (group, key-prefix bucket), one
    * 16-rows-per-group offset fold, a broadcast join back (the offset
    * table is 16·|groups| rows — switch the join to a plain equi-join
    * if groups ever outgrow a broadcast).
    *
    * @return (doc_id, grp, tokens, before) */
  def groupedTokenPrefix(
      docs: DataFrame, groupCol: String, idCol: String,
      tokensCol: Column): DataFrame = {
    // same two-consumer shape as tokenShardAssignments — persist so
    // the upstream computes once
    val keyed = graft.core.OpCache.persist(docs.select(
      col(groupCol).as("grp"),
      col(idCol).as("doc_id"),
      md5(col(idCol).cast("string")).as("key"),
      tokensCol.cast("long").as("tokens"))
      .withColumn("bucket", substring(col("key"), 1, 1)))
    keyed.count() // materialize before the two consumers branch
    val wb = Window.partitionBy(col("grp"), col("bucket")).orderBy(col("key"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = keyed.withColumn("cum_in", sum(col("tokens")).over(wb))
    val totals = keyed.groupBy(col("grp"), col("bucket"))
      .agg(sum(col("tokens")).as("total"))
      .groupBy(col("grp"))
      .agg(sort_array(collect_list(struct(col("bucket"), col("total")))).as("bt"))
      .select(col("grp"),
        explode(transform(col("bt"), (x, i) => struct(
          x.getField("bucket").as("bucket"),
          aggregate(slice(col("bt"), lit(1), i), lit(0L),
            (acc, s) => acc + s.getField("total")).as("offset")))).as("o"))
      .select(col("grp"), col("o.bucket").as("bucket"),
        col("o.offset").as("offset"))
    local.join(broadcast(totals), Seq("grp", "bucket"))
      .withColumn("before", col("offset") + col("cum_in") - col("tokens"))
      .select(col("doc_id"), col("grp"), col("tokens"), col("before"))
  }
}
