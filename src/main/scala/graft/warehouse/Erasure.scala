package graft.warehouse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Subject-erasure planning (GDPR Art. 17 / CCPA deletion): given a
  * set of subject keys, walk the foreign-key graph and emit the full
  * per-table delete manifest — every dependent row that must go with
  * the subject. Planning is separated from execution on purpose: the
  * manifest is the auditable artifact (what WILL be deleted, reviewed
  * before any rewrite), and at 100 TB the execution is a partition
  * rewrite scheduled off this manifest (the qw12 compaction machinery),
  * not a row-at-a-time delete.
  */
object Erasure {

  /** One FK hop of the cascade: rows of `child` whose `fkCol` is in
    * the parent manifest's key set — a left-semi equi-join, the
    * shuffle partitioned by the FK. The parent key set is whatever the
    * previous hop produced; Spark broadcasts it when it is small (the
    * usual erasure batch) and falls back to a shuffled semi-join when
    * a hot subject fans out, both correct. */
  private def hop(child: DataFrame, fkCol: String,
      parentKeys: DataFrame): DataFrame =
    child.join(parentKeys.withColumnRenamed("k", fkCol), Seq(fkCol),
      "left_semi")

  /** The cascade over the TPC-H-ish subject graph:
    * customer → orders (o_custkey) → lineitem (l_orderkey).
    *
    * @param subjects one column `k` of customer keys to erase
    * @return manifest (table_name, k1, k2): customer and orders rows
    *         carry their single key in k1; lineitem carries its
    *         composite (l_orderkey, l_linenumber) in (k1, k2). */
  def erasurePlan(
      customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
      subjects: DataFrame): DataFrame = {
    val custRows = hop(customer.select(col("c_custkey")), "c_custkey",
      subjects)
    val orderRows = graft.core.OpCache.persist(
      hop(orders.select(col("o_orderkey"), col("o_custkey")),
        "o_custkey", subjects)
        .select(col("o_orderkey")))
    val lineRows = hop(
      lineitem.select(col("l_orderkey"), col("l_linenumber")),
      "l_orderkey", orderRows.select(col("o_orderkey")).toDF("k"))
    custRows.select(lit("customer").as("table_name"),
        col("c_custkey").as("k1"), lit(null).cast("long").as("k2"))
      .unionByName(orderRows.select(lit("orders").as("table_name"),
        col("o_orderkey").as("k1"), lit(null).cast("long").as("k2")))
      .unionByName(lineRows.select(lit("lineitem").as("table_name"),
        col("l_orderkey").as("k1"),
        col("l_linenumber").cast("long").as("k2")))
  }

  /** The rewritten (erased) tables — [[erasurePlan]]'s manifest
    * EXECUTED as whole-table anti-joins. At 100 TB the anti-joins run
    * per affected partition off the manifest (qw13's refresh plan
    * bounds the rewrite set); the semantics are these. */
  final case class ErasedTables(
      customer: DataFrame, orders: DataFrame, lineitem: DataFrame)

  /** Execute the cascade: every subject row and FK-dependent row is
    * anti-joined away, in dependency order (orders doomed by subject,
    * lineitem doomed by doomed order). */
  def erasureExecute(
      customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
      subjects: DataFrame): ErasedTables = {
    val subj = graft.core.OpCache.persist(subjects.select(col("k")))
    val doomedOrders = graft.core.OpCache.persist(
      orders.join(subj.withColumnRenamed("k", "o_custkey"),
        Seq("o_custkey"), "left_semi").select(col("o_orderkey")))
    ErasedTables(
      customer.join(subj.withColumnRenamed("k", "c_custkey"),
        Seq("c_custkey"), "left_anti"),
      orders.join(subj.withColumnRenamed("k", "o_custkey"),
        Seq("o_custkey"), "left_anti"),
      lineitem.join(
        doomedOrders.withColumnRenamed("o_orderkey", "l_orderkey"),
        Seq("l_orderkey"), "left_anti"))
  }

  /** Erasure execution AUDIT — run [[erasureExecute]] and prove it:
    * one row per table with (rows_before, rows_deleted, rows_after)
    * and `orphans_after` — rows in the REWRITTEN table that still
    * reference an erased subject or a deleted order. A correct
    * execution has zero orphans everywhere; the oracle pins that
    * column to 0, so any cascade bug (a missed hop, a wrong key)
    * breaks parity loudly. Counts are metadata-sized aggregates; the
    * per-table 1-row frames combine with broadcast-singleton joins. */
  def erasureAudit(
      customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
      subjects: DataFrame): DataFrame = {
    val subj = graft.core.OpCache.persist(subjects.select(col("k")))
    val t = erasureExecute(customer, orders, lineitem, subjects)
    val doomedOrders = orders.join(
      subj.withColumnRenamed("k", "o_custkey"), Seq("o_custkey"),
      "left_semi").select(col("o_orderkey"))
    def stat(name: String, before: DataFrame, after: DataFrame,
        orphans: DataFrame): DataFrame =
      before.agg(count(lit(1)).cast("long").as("rows_before"))
        .crossJoin(broadcast(
          after.agg(count(lit(1)).cast("long").as("rows_after"))))
        .crossJoin(broadcast(
          orphans.agg(count(lit(1)).cast("long").as("orphans_after"))))
        .select(lit(name).as("table_name"), col("rows_before"),
          (col("rows_before") - col("rows_after")).as("rows_deleted"),
          col("rows_after"), col("orphans_after"))
    stat("customer", customer, t.customer,
      t.customer.join(subj.withColumnRenamed("k", "c_custkey"),
        Seq("c_custkey"), "left_semi"))
      .unionByName(stat("orders", orders, t.orders,
        t.orders.join(subj.withColumnRenamed("k", "o_custkey"),
          Seq("o_custkey"), "left_semi")))
      .unionByName(stat("lineitem", lineitem, t.lineitem,
        t.lineitem.join(
          doomedOrders.withColumnRenamed("o_orderkey", "l_orderkey"),
          Seq("l_orderkey"), "left_semi")))
  }
}
