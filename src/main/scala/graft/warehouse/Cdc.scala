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

  /** Snapshot diff — the reconciliation half of mirroring: which keys
    * were added, removed, or changed between two versions of a table.
    * Rows reduce to (key, row-hash) on each side — the non-key columns
    * hash in SORTED NAME ORDER with a null sentinel (concat_ws skips
    * nulls, which would make ("a", null) collide with (null, "a")) —
    * then one full-outer equi-join on the key classifies every key.
    * Only differences are returned: the diff is output-proportional,
    * never snapshot-proportional, which is what makes auditing a
    * 100 TB mirror nightly feasible (both sides shuffle once on the
    * key; the hash collapses row width to 32 bytes before the join).
    *
    * CONTRACT: each side must be unique per key (i.e. a snapshot, not
    * a feed — run [[applyChanges]] first if in doubt). A duplicated key
    * fans out through the full-outer join and emits one status row per
    * old×new pairing, which is enforced here with a loud failure
    * instead of silently multiplied output.
    */
  def snapshotDiff(
      oldDf: DataFrame, newDf: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    def hashed(df: DataFrame, side: String): DataFrame = {
      val others = df.columns.filterNot(keyCols.contains).sorted
      // control-byte separator + null sentinel: ("a", null) never
      // collides with (null, "a") and adjacent values cannot merge.
      // Doubles stringify shortest-roundtrip, so distinct values hash
      // distinct; values containing the control bytes are out of scope.
      val perRow = df.select(keyCols.map(col) :+
        md5(concat_ws("\u0001",
          others.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*))
          .as("__h"): _*)
      // one-row-per-key contract, enforced at execution time: the agg
      // shares the join's key partitioning (one shuffle either way) and
      // max(__h) is the identity for a well-formed snapshot
      perRow.groupBy(keyCols.map(col): _*)
        .agg(max(col("__h")).as("__hm"), count(lit(1)).as("__c"))
        .select(keyCols.map(col) :+
          when(col("__c") > 1, raise_error(concat(
            lit(s"snapshotDiff: duplicate key in $side snapshot: "),
            concat_ws(",", keyCols.map(c => col(c).cast("string")): _*))))
            .otherwise(col("__hm")).as("__h"): _*)
    }
    val o = hashed(oldDf, "old").withColumnRenamed("__h", "__h_old")
    val n = hashed(newDf, "new").withColumnRenamed("__h", "__h_new")
    o.join(n, keyCols, "full_outer")
      .withColumn("status",
        when(col("__h_new").isNull, lit("removed"))
          .when(col("__h_old").isNull, lit("added"))
          .when(col("__h_old") =!= col("__h_new"), lit("changed"))
          .otherwise(lit("unchanged")))
      .filter(col("status") =!= "unchanged")
      .select(keyCols.map(col) :+ col("status"): _*)
  }

  /** Partition REFRESH planning — turn a [[snapshotDiff]] into the
    * minimal set of storage partitions a publisher must rewrite: each
    * differing key joins its partition columns (from the union of both
    * snapshots — removed keys exist only in the old one), and the plan
    * aggregates per partition. At 100 TB the point is what is ABSENT:
    * untouched partitions never appear, so a nightly publish rewrites
    * `O(changed partitions)` of the serving layout (dynamic partition
    * overwrite of exactly these subtrees via
    * [[graft.storage.Storage.writePartitioned]]), not the table. The
    * diff is output-proportional already; this join touches diff-sized
    * data against a key→partition projection.
    *
    * @param keyed one row per key carrying the partition columns —
    *              pass the UNION of old and new snapshots projected to
    *              (keyCols ++ partCols); duplicate (key, partition)
    *              rows are fine (distinct-ed), a key mapping to TWO
    *              partitions yields a row for each (both need the
    *              rewrite — the row moved across partitions). */
  def partitionRefreshPlan(
      diff: DataFrame,
      keyed: DataFrame,
      keyCols: Seq[String],
      partCols: Seq[String]): DataFrame = {
    val pk = keyed.select((keyCols ++ partCols).map(col): _*).distinct()
    diff.join(pk, keyCols)
      .groupBy(partCols.map(col): _*)
      .agg(
        sum(when(col("status") === "added", 1L).otherwise(0L))
          .cast("long").as("n_added"),
        sum(when(col("status") === "removed", 1L).otherwise(0L))
          .cast("long").as("n_removed"),
        sum(when(col("status") === "changed", 1L).otherwise(0L))
          .cast("long").as("n_changed"))
  }

  /** Incremental SCD2 apply — advance a type-2 dimension history by
    * one full snapshot, effective at `effectiveTs`:
    *
    *  - key in both, attrs EQUAL      → current row passes unchanged;
    *  - key in both, attrs differ     → current row closes
    *    (valid_to = effectiveTs) and a new open row starts;
    *  - key only in snapshot          → new open row;
    *  - key only in history (delete)  → current row closes, no
    *    successor.
    *
    * Closed history rows pass through untouched — at 100 TB that is
    * the point: only the CURRENT slice (dimension-sized) joins the
    * snapshot (one equi-join), and the closed majority of the history
    * is append-only storage no query rewrites. The join output is
    * consumed ONCE: each joined row explodes into its 0–2 result rows
    * via a conditional struct array, so no branch re-executes the
    * join. History schema: key, attrs…, valid_from, valid_to (null =
    * open), is_current. Contract: one current row per key and a
    * snapshot unique per key — both ENFORCED with a loud failure (the
    * [[snapshotDiff]] discipline): a duplicate on either side would
    * fan out through the full-outer join and silently multiply
    * history rows.
    */
  def scd2Apply(
      history: DataFrame,
      snapshot: DataFrame,
      keyCol: String,
      attrCols: Seq[String],
      effectiveTs: String): DataFrame = {
    require(attrCols.nonEmpty, "scd2Apply needs at least one attribute column")
    val metaCols = Seq("valid_from", "valid_to", "is_current")
    val outCols = (keyCol +: attrCols) ++ metaCols
    val closedPass = history.filter(!col("is_current"))
      .select(outCols.map(col): _*)
    // one-row-per-key guards, folded into columns the join consumes so
    // they cannot be pruned (the snapshotDiff pattern); the count agg
    // shares the join's key partitioning
    def dupGuard(df: DataFrame, what: String): DataFrame =
      df.join(df.groupBy(col(keyCol)).agg(count(lit(1)).as("__c")), Seq(keyCol))
    def guarded(c: Column, what: String): Column =
      when(col("__c") > 1, raise_error(concat(
        lit(s"scd2Apply: duplicate key in $what: "), col(keyCol).cast("string"))))
        .otherwise(c)
    val cur = dupGuard(history.filter(col("is_current")), "current history")
      .withColumn("valid_from", guarded(col("valid_from"), "current history"))
      .drop("__c")
    val snap = dupGuard(snapshot, "snapshot").select(
      col(keyCol).as("__sk") +: attrCols.map(a =>
        guarded(col(a), "snapshot").as(s"__s_$a")): _*)
    val j = cur.join(snap, col(keyCol) === col("__sk"), "full_outer")
    val same = attrCols.map(a => col(a) <=> col(s"__s_$a")).reduce(_ && _)
    val hEx = col(keyCol).isNotNull
    val sEx = col("__sk").isNotNull
    def rowStruct(
        key: Column, attrs: Seq[Column],
        from: Column, to: Column, current: Column): Column =
      struct(key.as("__k") +:
        attrs.zip(attrCols).map { case (c, a) => c.as(s"__a_$a") } :+
        from.as("__vf") :+ to.as("__vt") :+ current.as("__ic"): _*)
    val ts = lit(effectiveTs)
    val emitted = j.select(explode(filter(array(
      // close the current row (change or delete)
      when(hEx && (!sEx || !same),
        rowStruct(col(keyCol), attrCols.map(col),
          col("valid_from"), ts, lit(false))),
      // keep the current row open (no change)
      when(hEx && sEx && same,
        rowStruct(col(keyCol), attrCols.map(col),
          col("valid_from"), col("valid_to"), lit(true))),
      // open a new row (new key or changed attrs)
      when(sEx && (!hEx || !same),
        rowStruct(col("__sk"), attrCols.map(a => col(s"__s_$a")),
          ts, lit(null).cast("string"), lit(true)))),
      s => s.isNotNull)).as("r"))
    val updated = emitted.select(
      col("r.__k").as(keyCol) +:
        attrCols.map(a => col(s"r.__a_$a").as(a)) :+
        col("r.__vf").as("valid_from") :+
        col("r.__vt").as("valid_to") :+
        col("r.__ic").as("is_current"): _*)
    closedPass.unionByName(updated)
  }

  /** Two-writer write-write conflict audit — the set-based heart of
    * optimistic concurrency control (the Delta/Iceberg commit-time
    * check) run as one query instead of a transaction manager: writers
    * A and B each hold a change feed taken against the same base
    * snapshot; before serializing their commits, classify every key
    * either one touched. Per side a key's winning INTENT is its
    * latest-wins row ([[applyChanges]]'s order contract: greatest
    * `orderBy` tuple; a tombstone row is delete intent). Keys touched
    * by one writer are 'a_only'/'b_only' (the writes commute — either
    * serialization order works); keys touched by both are 'agree' when
    * the intents coincide (both delete, or neither deletes and every
    * value column is pairwise null-safe-equal — the merge is
    * idempotent) and 'diverge' otherwise (a true write-write conflict:
    * one writer must rebase or lose).
    *
    * Scale shape: each feed collapses to one row per TOUCHED key (one
    * key shuffle + a per-key window — feed-sized, never table-sized);
    * the audit is one full-outer equi-join of the two touched-key
    * sets. Output is touched-keys-proportional and the base table
    * never participates at all — which is what lets the check run on
    * every commit against a 100 TB table.
    *
    * @param valueCols the payload columns whose equality defines "same
    *        intent" — EXCLUDE ordering metadata (ts, change id): two
    *        writers never share those, and including them would mark
    *        every co-touched key divergent. */
  def writeConflictAudit(
      feedA: DataFrame,
      feedB: DataFrame,
      keyCols: Seq[String],
      orderBy: Seq[Column],
      isDelete: Column,
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "writeConflictAudit needs value columns")
    def intent(df: DataFrame, side: String): DataFrame = {
      val w = Window.partitionBy(keyCols.map(col): _*)
        .orderBy(orderBy.map(_.desc): _*)
      df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(keyCols.map(col) ++
          (isDelete.as(s"__del_$side") +:
            valueCols.map(c => col(c).as(s"__${side}_$c"))): _*)
    }
    val j = intent(feedA, "a").join(intent(feedB, "b"), keyCols, "full_outer")
    val inA = col("__del_a").isNotNull
    val inB = col("__del_b").isNotNull
    val sameVals = valueCols.map(c => col(s"__a_$c") <=> col(s"__b_$c"))
      .reduce(_ && _)
    val agree = (col("__del_a") && col("__del_b")) ||
      (!col("__del_a") && !col("__del_b") && sameVals)
    j.select(keyCols.map(col) :+
      when(!inB, lit("a_only"))
        .when(!inA, lit("b_only"))
        .when(agree, lit("agree"))
        .otherwise(lit("diverge")).as("status"): _*)
  }

  /** Signed deltas from a keyed changelog WITH before-images — the
    * retraction half of incremental view maintenance (qw05 merges
    * append-only partials; this handles UPDATES and DELETES, the
    * Flink/Materialize retract-stream semantics). Every change row
    * becomes 0–2 delta rows:
    *   I → (grp, +1, +val)
    *   U → (before_grp, −1, −before_val) AND (grp, +1, +val) —
    *       a group-moving update retracts from the old group and
    *       inserts into the new one, no special case
    *   D → (before_grp, −1, −before_val)
    * Values are cast DECIMAL(30,6) so retraction is EXACT: applying
    * +v then −v restores the state bit-for-bit at any partitioning
    * (an IEEE float sum would drift and the maintained view would
    * diverge from a recompute). Output: (grp, dn, dv) — linear,
    * narrow, no shuffle of its own.
    *
    * @param opCol 'I' | 'U' | 'D'; before-image columns may be null
    *              on I rows (they are not read there) */
  def retractDeltas(
      changes: DataFrame, opCol: Column,
      grpCol: Column, valCol: Column,
      beforeGrpCol: Column, beforeValCol: Column): DataFrame = {
    val dec = "decimal(30,6)"
    val inserts = changes.filter(opCol.isin("I", "U"))
      .select(grpCol.as("grp"), lit(1L).as("dn"),
        valCol.cast(dec).as("dv"))
    val retracts = changes.filter(opCol.isin("U", "D"))
      .select(beforeGrpCol.as("grp"), lit(-1L).as("dn"),
        (-beforeValCol.cast(dec)).as("dv"))
    inserts.unionByName(retracts)
  }

  /** Merge a stored per-group aggregate state with a batch of signed
    * deltas ([[retractDeltas]]) — one union + one hash aggregate over
    * state ∪ deltas, never a rescan of history. A group whose
    * maintained count reaches 0 disappears (equality with a full
    * recompute is the correctness bar, and a recompute has no row
    * for an emptied group). Both inputs: (grp, n/dn, total/dv). */
  def retractMerge(state: DataFrame, deltas: DataFrame): DataFrame = {
    val cols = Seq("grp", "dn", "dv")
    state.toDF(cols: _*).unionByName(deltas.toDF(cols: _*))
      .groupBy(col("grp"))
      .agg(sum(col("dn")).cast("long").as("n_rows"),
        sum(col("dv")).as("total"))
      .filter(col("n_rows") =!= 0L)
  }
}
