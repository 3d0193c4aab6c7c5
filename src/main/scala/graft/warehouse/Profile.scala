package graft.warehouse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dataset profiling — the "what is actually in this table" audit every
  * ingest runs before trusting a new source (the reference's validation
  * stage answers "does it conform"; this answers "what does it contain").
  */
object Profile {

  /** Per-column profile: row count, null count, EXACT distinct count,
    * and typed min/max — numerics (and timestamps, as epoch
    * microseconds) in `min_num`/`max_num`, strings lexicographically in
    * `min_str`/`max_str`; the inapplicable pair stays NULL.
    *
    * Shape: one single-column aggregate per profiled column, unioned.
    * Deliberately NOT one wide multi-distinct aggregate — Spark plans
    * n count-distincts over one frame via Expand (n× row replication
    * through the shuffle); n independent single-column branches instead
    * each prune their parquet scan to exactly one column (`ReadSchema`
    * shows a single field per branch), so the union's total IO equals
    * ONE full-width scan of the table while every shuffle carries only
    * (column, partial-distinct) rows. Branches are independent — a
    * 1000-executor cluster runs them concurrently.
    *
    * Exact distinct (not approx_count_distinct) because the profile IS
    * the oracle other checks hang off; where an estimate suffices at
    * 100 TB, q49's HLL sketch is the drop-in.
    */
  def profile(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val targets = if (cols.nonEmpty) cols else df.columns.toSeq
    val parts = targets.map { c =>
      val dt = df.schema(c).dataType
      val (mnN, mxN, mnS, mxS) = dt match {
        case _: NumericType =>
          (min(col(c)).cast("double"), max(col(c)).cast("double"),
            lit(null).cast("string"), lit(null).cast("string"))
        case _: TimestampType =>
          (unix_micros(min(col(c))).cast("double"),
            unix_micros(max(col(c))).cast("double"),
            lit(null).cast("string"), lit(null).cast("string"))
        case _: StringType =>
          (lit(null).cast("double"), lit(null).cast("double"),
            min(col(c)), max(col(c)))
        case _ =>
          (lit(null).cast("double"), lit(null).cast("double"),
            lit(null).cast("string"), lit(null).cast("string"))
      }
      df.select(col(c))
        .agg(
          count(lit(1)).cast("long").as("n_rows"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).cast("long")
            .as("n_nulls"),
          count_distinct(col(c)).cast("long").as("n_distinct"),
          mnN.as("min_num"), mxN.as("max_num"),
          mnS.as("min_str"), mxS.as("max_str"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_num"), col("max_num"),
          col("min_str"), col("max_str"))
    }
    parts.reduce(_ unionByName _)
  }

  /** Foreign-key DISCOVERY via inclusion coefficients — qw15's
    * complement: that audits DECLARED FKs, this proposes candidates by
    * measuring, for each (child column, parent column) pair, what
    * fraction of the child's distinct values the parent contains.
    * 1.0 = a perfect inclusion dependency (FK candidate); anything
    * under it quantifies the violation mass.
    *
    * Each pair costs two distinct-projections (column-pruned scans,
    * dimension-sized after distinct) and one left join between them —
    * at 100 TB the distincts are the only corpus-proportional work and
    * both are map-side combinable; the verdict join runs on the
    * collapsed value sets. `containment` is ONE division of two exact
    * longs (engine-identical); null child values are excluded (SQL FK
    * semantics: null references nothing).
    *
    * @param pairs (label, child frame, child col, parent frame,
    *              parent col) candidate pairs
    * @return (candidate, n_child_values, n_contained, containment) */
  def fkDiscovery(
      pairs: Seq[(String, DataFrame, String, DataFrame, String)])
      : DataFrame = {
    require(pairs.nonEmpty, "fkDiscovery needs at least one candidate pair")
    pairs.map { case (label, child, childCol, parent, parentCol) =>
      val c = child.select(col(childCol).as("v"))
        .filter(col("v").isNotNull).distinct()
      val p = parent.select(col(parentCol).as("v"))
        .filter(col("v").isNotNull).distinct()
        .withColumn("__hit", lit(1L))
      c.join(p, Seq("v"), "left")
        .agg(count(lit(1)).cast("long").as("n_child_values"),
          coalesce(sum(coalesce(col("__hit"), lit(0L))), lit(0L))
            .cast("long").as("n_contained"))
        .select(lit(label).as("candidate"),
          col("n_child_values"), col("n_contained"),
          // empty child column → NULL (inclusion vacuous, not 0 or 1)
          when(col("n_child_values") > 0,
            col("n_contained").cast("double") /
              col("n_child_values").cast("double")).as("containment"))
    }.reduce(_ unionByName _)
  }

  /** Profile DRIFT between two snapshots of a table — the data-
    * observability monitor that pairs with [[profile]]: run the
    * per-column profile on both sides, full-outer join on column
    * name, classify. Statuses:
    *   - 'col_added' / 'col_removed': schema drift;
    *   - 'drifted': the null rate (integer basis points — exact, no
    *     float ratio) or any typed min/max moved (null-safe compare,
    *     so a column going all-null registers);
    *   - 'stable': none of the above.
    * Distinct-count deltas are REPORTED, not classified — cardinality
    * naturally grows with rows, so a threshold belongs to the caller.
    *
    * Scale shape: two profile passes (each one full-width scan's IO,
    * column-pruned per branch) + a join on ≤|columns| rows — the
    * output is schema-sized metadata. Everything integer/null-safe:
    * the drift verdict is bit-identical on any engine, which is what
    * lets a nightly monitor diff verdicts across runs. */
  def profileDrift(oldDf: DataFrame, newDf: DataFrame): DataFrame =
    driftJoin(profile(oldDf), profile(newDf))

  /** The classification half of [[profileDrift]], over two PREBUILT
    * [[profile]] outputs — so a stored baseline profile (metadata,
    * schema-sized) can be diffed against fresh snapshots or streaming
    * micro-batches without re-profiling the baseline. */
  def driftJoin(oldProfile: DataFrame, newProfile: DataFrame): DataFrame = {
    def side(p: DataFrame, s: String): DataFrame =
      p.select(col("col_name"),
        col("n_rows").as(s"n_rows_$s"),
        col("n_nulls").as(s"n_nulls_$s"),
        col("n_distinct").as(s"n_distinct_$s"),
        col("min_num").as(s"min_num_$s"), col("max_num").as(s"max_num_$s"),
        col("min_str").as(s"min_str_$s"), col("max_str").as(s"max_str_$s"))
    val j = side(oldProfile, "old").join(side(newProfile, "new"),
      Seq("col_name"), "full_outer")
    def bp(s: String) =
      expr(s"n_nulls_$s * 10000 div n_rows_$s") // null when n_rows = 0
    val moved =
      !(bp("old") <=> bp("new")) ||
        !(col("min_num_old") <=> col("min_num_new")) ||
        !(col("max_num_old") <=> col("max_num_new")) ||
        !(col("min_str_old") <=> col("min_str_new")) ||
        !(col("max_str_old") <=> col("max_str_new"))
    j.select(col("col_name"),
      when(col("n_rows_old").isNull, lit("col_added"))
        .when(col("n_rows_new").isNull, lit("col_removed"))
        .when(moved, lit("drifted"))
        .otherwise(lit("stable")).as("status"),
      col("n_rows_old"), col("n_rows_new"),
      col("n_distinct_old"), col("n_distinct_new"),
      bp("old").as("null_bp_old"), bp("new").as("null_bp_new"))
  }

  /** KMV sketch size for the mergeable profile (the qw05 bottom-k). */
  val ProfileSketchK: Int = 64

  /** MERGEABLE per-column profile state — the incremental-maintenance
    * face of [[profile]]: counts and typed min/max are mergeable as
    * they stand, and the one non-mergeable statistic (exact distinct)
    * is replaced by the KMV bottom-k sketch (qw05's
    * `graft_bottom_k`), whose union-truncate merge is EXACT with
    * respect to the full value set's bottom k — so profiling 100 TB
    * happens once and each delta batch merges in O(delta), never a
    * history rescan. One state row per column: (col_name, n_rows,
    * n_nulls, sk, min_num, max_num, min_str, max_str).
    *
    * @param distinctKey per-column 60-bit hash input for the sketch.
    *   The default hashes `CAST(col AS STRING)` — override for
    *   columns whose string rendering is not engine-portable (e.g.
    *   doubles: hash exact integer cents instead), the same hash
    *   discipline every sketch here follows. */
  def mergeableProfile(
      df: DataFrame, cols: Seq[String] = Nil,
      distinctKey: String => org.apache.spark.sql.Column =
        c => graft.operators.Dedup.hash60(col(c).cast("string")),
      k: Int = ProfileSketchK): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val targets = if (cols.nonEmpty) cols else df.columns.toSeq
    val parts = targets.map { c =>
      val dt = df.schema(c).dataType
      val (mnN, mxN, mnS, mxS) = dt match {
        case _: NumericType =>
          (min(col(c)).cast("double"), max(col(c)).cast("double"),
            lit(null).cast("string"), lit(null).cast("string"))
        case _: TimestampType =>
          (unix_micros(min(col(c))).cast("double"),
            unix_micros(max(col(c))).cast("double"),
            lit(null).cast("string"), lit(null).cast("string"))
        case _: StringType =>
          (lit(null).cast("double"), lit(null).cast("double"),
            min(col(c)), max(col(c)))
        case _ =>
          (lit(null).cast("double"), lit(null).cast("double"),
            lit(null).cast("string"), lit(null).cast("string"))
      }
      df.select(col(c), distinctKey(c).as("__dk"))
        .agg(
          count(lit(1)).cast("long").as("n_rows"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).cast("long")
            .as("n_nulls"),
          call_function("graft_bottom_k",
            when(col(c).isNotNull, col("__dk")), lit(k)).as("sk"),
          mnN.as("min_num"), mxN.as("max_num"),
          mnS.as("min_str"), mxS.as("max_str"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_nulls"),
          col("sk"), col("min_num"), col("max_num"),
          col("min_str"), col("max_str"))
    }
    parts.reduce(_ unionByName _)
  }

  /** Merge two [[mergeableProfile]] states — one union + one hash
    * aggregate over 2·|columns| rows: counts add, min/max fold
    * (null-ignoring, so a column absent on one side keeps the other's
    * bound), KMV sketches union-truncate (order-invariant). The
    * merged state equals the state a full rebuild would produce. */
  def mergeProfiles(a: DataFrame, b: DataFrame,
      k: Int = ProfileSketchK): DataFrame =
    a.unionByName(b)
      .groupBy(col("col_name"))
      .agg(sum(col("n_rows")).cast("long").as("n_rows"),
        sum(col("n_nulls")).cast("long").as("n_nulls"),
        aggregate(collect_list(col("sk")),
          array().cast("array<bigint>"),
          (acc, x) => slice(array_sort(array_union(acc, x)), 1, k)).as("sk"),
        min(col("min_num")).as("min_num"), max(col("max_num")).as("max_num"),
        min(col("min_str")).as("min_str"), max(col("max_str")).as("max_str"))

  /** Distinct-count estimate from a profile KMV sketch (qw05's
    * estimator: exact below k, (k−1)·2^60 / kth-min at k). */
  def kmvEstimate(sk: org.apache.spark.sql.Column,
      k: Int = ProfileSketchK): org.apache.spark.sql.Column =
    when(size(sk) < k, size(sk).cast("double"))
      .otherwise(lit((k - 1).toDouble) * pow(lit(2.0), lit(60.0)) /
        element_at(sk, k).cast("double"))
}
