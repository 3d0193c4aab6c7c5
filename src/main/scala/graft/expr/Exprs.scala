package graft.expr

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-level building blocks of the engine, UDF-free so every one of
  * them stays inside Catalyst codegen.
  *
  * Each function is the Spark-native re-expression of a semantic the
  * reference implements row-at-a-time in pandas (cites point at
  * /root/reference, file:line).
  */
object Exprs {

  /** Event-time in epoch MICROSECONDS, tolerant of both TIMESTAMP and
    * TIMESTAMP_NTZ inputs (parquet written without a timezone —
    * `timestamp[us]` — reads as NTZ, which `unix_micros` rejects).
    * The NTZ→LTZ cast interprets the wall-clock in the session
    * timezone, which shifts every value by the SAME constant — so
    * every consumer here (ordering, lag differences, range frames,
    * as-of gap comparisons) is invariant to it, and under the
    * pinned-UTC harness the cast is an epoch identity matching
    * DuckDB's `epoch_us` on naive timestamps. */
  def tsMicros(c: Column): Column = unix_micros(c.cast("timestamp"))

  /** P1 "reindex-rename projection" (`world_bank_wdi.py:78-87` et al.):
    * keep exactly the listed columns in order, creating missing ones as
    * typed nulls, then rename. The universal projection idiom of the
    * reference — here a single `select`, so Catalyst prunes the scan to
    * just the referenced columns.
    *
    * @param mapping (sourceColumn -> targetName) in output order
    * @param missingType type given to created-null columns
    */
  def selectRenamed(
      df: DataFrame,
      mapping: Seq[(String, String)],
      missingType: DataType = StringType): DataFrame = {
    val have = df.columns.toSet
    df.select(mapping.map { case (src, dst) =>
      (if (have(src)) col(src) else lit(null).cast(missingType)).as(dst)
    }: _*)
  }

  /** C2 `to_snake_case` (`utils.py:158-188`): trim, lower, collapse
    * whitespace runs to `_`, optional prefix/suffix. */
  def toSnakeCase(c: Column, prefix: String = "", suffix: String = ""): Column = {
    val core = regexp_replace(lower(trim(c)), "\\s+", "_")
    (prefix, suffix) match {
      case ("", "") => core
      case (p, "")  => concat(lit(p), core)
      case ("", s)  => concat(core, lit(s))
      case (p, s)   => concat(lit(p), core, lit(s))
    }
  }

  /** Driver-side variant for column renames (the reference mostly
    * snake-cases column *names*, e.g. `unstats_sdg_database.py:109-112`). */
  def snakeCaseName(name: String, prefix: String = "", suffix: String = ""): String =
    prefix + name.trim.toLowerCase.replaceAll("\\s+", "_") + suffix

  /** C4 indicator-name synthesis (`world_bank_wdi.py:88-90` and nine
    * other call sites): `"{name} [{code}]"` / `"{name}, {unit} [{code}]"`. */
  def indicatorName(name: Column, code: Column): Column =
    concat(name, lit(" ["), code, lit("]"))
  def indicatorName(name: Column, unit: Column, code: Column): Column =
    concat(name, lit(", "), unit, lit(" ["), code, lit("]"))

  /** C6 bound-marker strip + coercing numeric cast
    * (`unstats_sdg_database.py:121-124`, `unicef_sdmx_api.py:190-194`):
    * `<2.5` / `>95%` lose their marker; a failed cast yields null —
    * pandas `to_numeric(errors="coerce")`. Spark 4 runs ANSI mode, so
    * coerce-to-null must be `try_cast`, never `cast`. */
  def boundedNumeric(c: Column): Column =
    regexp_replace(c, "^[<>]+|%$", "").try_cast(DoubleType)

  /** F5 contains-with-null-passes (`ilo_sdmx_api.py:179-183`): pandas
    * `str.contains(pat, na=True)` keeps null rows — load-bearing. */
  def containsOrNull(c: Column, needle: String): Column =
    c.isNull || c.contains(needle)

  /** F10 empty-string→null (`world_bank_api.py:176`). */
  def emptyToNull(c: Column): Column = when(c === "", lit(null)).otherwise(c)

  /** C3 `_resolve_dimensions` (`utils.py:191-218`): fold a
    * MapType(name→category) column into the canonical `"; "`-joined
    * dimension string. Null entries are dropped; `_`→space in names;
    * a case-insensitive category "total" renders as `"All {name}"`;
    * an empty surviving map renders as `"Total"`. Insertion order of
    * the map is preserved (Spark map columns keep entry order).
    */
  def resolveDimensions(dims: Column): Column = {
    val cleaned = map_filter(dims, (_, v) => v.isNotNull)
    val parts = transform(
      map_entries(cleaned),
      e => {
        val name = regexp_replace(e.getField("key"), "_", " ")
        val value = e.getField("value")
        when(lower(value) === "total", concat(lit("All "), name))
          .otherwise(value)
      })
    when(size(parts) === 0, lit("Total"))
      .otherwise(array_join(parts, "; "))
  }

  /** R5 `combine_dimensions` (`utils.py:221-248`, `validation.py:109-112`):
    * if the frame has no `dimension` column, build one from all
    * `dimension_*` columns via [[resolveDimensions]]; with neither,
    * the literal `"Total"`. */
  def combineDimensions(df: DataFrame, prefix: String = "dimension_"): DataFrame = {
    if (df.columns.contains("dimension")) df
    else {
      val dimCols = df.columns.filter(_.startsWith(prefix)).toSeq
      if (dimCols.isEmpty) df.withColumn("dimension", lit("Total"))
      else {
        val entries = dimCols.flatMap(c =>
          Seq(lit(c.stripPrefix(prefix)), col(c).cast(StringType)))
        df.withColumn("dimension", resolveDimensions(map(entries: _*)))
          .drop(dimCols: _*)
      }
    }
  }

  /** Build a map column from an `array<struct<key,value>>` with
    * Python-dict duplicate-key semantics: the key keeps its FIRST
    * insertion position but carries the LAST value written
    * (`d[k]=v1; d[k]=v2` leaves k where it was, holding v2). Spark's
    * default `spark.sql.mapKeyDedupPolicy=EXCEPTION` makes a plain
    * `map()`/`transform_keys` throw RUNTIME_ERROR on a collision at
    * execution time — e.g. two `DimType` slots carrying the same type
    * (`who_gho_api.py:152-190`'s dict fold silently last-wins), so the
    * dedup must happen BEFORE the map is built. O(k²) per row — fine
    * for the ≤dozen-entry dimension maps this serves. */
  def mapLastWins(entries: Column): Column = {
    val lastValued = transform(entries, e =>
      struct(
        e.getField("key").as("key"),
        element_at(
          filter(entries, e2 => e2.getField("key") === e.getField("key")), -1)
          .getField("value").as("value")))
    map_from_entries(filter(lastValued, (e, i) =>
      !exists(slice(entries, lit(1), i),
        prior => prior.getField("key") === e.getField("key"))))
  }

  /** Exact-sum of a double measure: cast each value to DECIMAL(30,6)
    * (exact for data with ≤6 decimal digits), sum exactly (decimal sums
    * are order-independent — safe under any shuffle/partial-agg order),
    * return double. This is how every money/measure aggregate in the
    * engine stays deterministic across partitionings — a plain double
    * `sum` is order-dependent and irreproducible at 1000 executors. */
  def exactSum(c: Column): Column =
    sum(c.cast(DecimalType(30, 6))).cast(DoubleType)

  /** Deterministic mean built from [[exactSum]] (single IEEE division
    * of two reproducible values). */
  def exactAvg(c: Column): Column =
    exactSum(c) / count(lit(1)).cast(DoubleType)
}
