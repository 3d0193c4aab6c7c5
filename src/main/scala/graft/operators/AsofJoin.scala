package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — the temporal join Spark lacks as a built-in
  * (pandas `merge_asof`, DuckDB `ASOF JOIN`).
  *
  * For every left row, attach the payload of the *latest* right row
  * whose timestamp is `<=` the left timestamp within the same key
  * (match-at-equality included, like DuckDB's `ON l.ts >= r.ts`).
  *
  * Execution shape (the scale-safe one): instead of a non-equi range
  * join (which Spark would plan as a broadcast-nested-loop or a
  * sort-merge with per-key scans), the two sides are tagged and
  * UNIONed, then a single window pass per key carries the last seen
  * right ROW forward — `last(struct, ignoreNulls)` over
  * `(key ORDER BY ts, side)` rows-unbounded-preceding. The carried
  * value is a struct of (matched ts, payload…), non-null exactly on
  * right rows, so a right row whose payload value is itself null still
  * wins the carry (a bare `last(payload)` would skip past it to an
  * older row). Right rows sort before left rows at equal timestamps so
  * equality matches.
  *
  * Cost: ONE shuffle on the key (the window partition), a
  * within-partition sort that spills gracefully, zero join explosion.
  * At 100 TB this is the same plan a dedicated as-of physical operator
  * would produce; per-key history never has to fit in memory (sort is
  * external) — only the carried payload row does. A skewed key means a
  * skewed sort partition; mitigate upstream by splitting the key range
  * in time (sessionized sub-keys), not by salting — order matters.
  */
object AsofJoin {

  /** @param payload  right columns to carry onto left rows
    * @param rightTiebreak  deterministic winner among right rows that
    *   share (key, ts): the one with the greatest tiebreak value wins.
    * @param toleranceSeconds  if set, matches older than this many
    *   seconds before the left timestamp are nulled out. */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      rightTiebreak: Option[String] = None,
      toleranceSeconds: Option[Long] = None): DataFrame =
    asofImpl(left, right, key, leftTs, rightTs, payload, rightTiebreak,
      toleranceSeconds, forward = false)

  /** Forward as-of join: the *earliest* right row with timestamp `>=`
    * the left timestamp (pandas merge_asof direction='forward'). Same
    * single-shuffle window plan, iterated in descending time order. */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      rightTiebreak: Option[String] = None,
      toleranceSeconds: Option[Long] = None): DataFrame =
    asofImpl(left, right, key, leftTs, rightTs, payload, rightTiebreak,
      toleranceSeconds, forward = true)

  private def asofImpl(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      rightTiebreak: Option[String],
      toleranceSeconds: Option[Long],
      forward: Boolean): DataFrame = {
    val collisions = payload.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"payload columns ${collisions.mkString(", ")} already exist on the " +
        "left side — rename them on the right frame before joining")
    val reserved = (left.columns ++ right.columns).filter(_.startsWith("__"))
    require(reserved.isEmpty,
      s"columns ${reserved.mkString(", ")} use the reserved __ prefix — " +
        "rename them before joining")

    // Deterministic right side: one row per (key, ts) — keep-last by
    // the tiebreak (A3 keep-first machinery, reversed).
    val rDedup = rightTiebreak match {
      case None => right
      case Some(tb) =>
        val w = Window.partitionBy(col(key), col(rightTs)).orderBy(col(tb).desc)
        right.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
    }

    // The carried value: one struct per right row holding the matched
    // timestamp and every payload column. Null on left rows — struct
    // nullity (not payload nullity) drives the ignoreNulls carry.
    val rTagged = rDedup.select(
      Seq(col(key), col(rightTs).as("__ts"), lit(0).as("__side"),
        struct((col(rightTs).as("__mts") +:
          payload.map(p => col(p).as(s"__p_$p"))): _*).as("__rpack")): _*)

    val lTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))

    val merged = lTagged.unionByName(rTagged, allowMissingColumns = true)

    // backward walks time ascending (latest right ≤ left); forward
    // walks descending (earliest right ≥ left). Right rows sort before
    // left rows at equal timestamps either way, so equality matches.
    val w = Window.partitionBy(col(key))
      .orderBy(if (forward) col("__ts").desc else col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val withMatch = merged
      .withColumn("__m", last(col("__rpack"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    // Tolerance gap in MICROSECONDS — unix_timestamp() truncates to
    // whole seconds and would let matches up to ~1 s staler through.
    val inWindow: Column = toleranceSeconds match {
      case None => col("__m").isNotNull
      case Some(tol) =>
        val mts = graft.expr.Exprs.tsMicros(col("__m").getField("__mts"))
        val lts = graft.expr.Exprs.tsMicros(col("__ts"))
        val gap = if (forward) mts - lts else lts - mts
        col("__m").isNotNull && gap <= tol * 1000000L
    }

    val result = payload.foldLeft(withMatch) { (d, p) =>
      d.withColumn(p, when(inWindow, col("__m").getField(s"__p_$p")))
    }
    result.drop("__m", "__ts", "__side", "__rpack")
  }
}
