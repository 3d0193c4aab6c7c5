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
  * right payload forward — `last(payload, ignoreNulls)` over
  * `(key ORDER BY ts, side)` rows-unbounded-preceding. Right rows sort
  * before left rows at equal timestamps so equality matches.
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
    val collisions = payload.toSet
      .intersect(left.columns.toSet -- Set(key))
    require(collisions.isEmpty,
      s"payload columns ${collisions.mkString(", ")} already exist on the " +
        "left side — rename them on the right frame before joining")
    val rTypes = right.schema.fields.map(f => f.name -> f.dataType).toMap
    val pCols = payload.map(p => s"__p_$p")

    // Deterministic right side: one row per (key, ts) — keep-last by
    // the tiebreak (A3 keep-first machinery, reversed).
    val rDedup = rightTiebreak match {
      case None => right
      case Some(tb) =>
        val w = Window.partitionBy(col(key), col(rightTs)).orderBy(col(tb).desc)
        right.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
    }

    val lTagged = payload.foldLeft(
      left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(1)).withColumn("__rts", lit(null).cast("timestamp"))
    )((d, p) => d.withColumn(s"__p_$p", lit(null).cast(rTypes(p))))

    val rTagged = rDedup.select(
      Seq(col(key), col(rightTs).as("__ts"), lit(0).as("__side"),
        col(rightTs).as("__rts")) ++
        payload.map(p => col(p).as(s"__p_$p")): _*)

    val merged = lTagged.unionByName(rTagged, allowMissingColumns = true)

    // backward walks time ascending (latest right ≤ left); forward
    // walks descending (earliest right ≥ left). Right rows sort before
    // left rows at equal timestamps either way, so equality matches.
    val w = Window.partitionBy(col(key))
      .orderBy(if (forward) col("__ts").desc else col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedTs = last(col("__rts"), ignoreNulls = true).over(w)

    val withPayload = (pCols :+ "__asof_ts").foldLeft(merged) {
      case (d, "__asof_ts") => d.withColumn("__asof_ts", matchedTs)
      case (d, p) => d.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }

    val inWindow: Column = toleranceSeconds match {
      case None => lit(true)
      case Some(tol) =>
        val gap =
          if (forward)
            unix_timestamp(col("__asof_ts")) - unix_timestamp(col("__ts"))
          else
            unix_timestamp(col("__ts")) - unix_timestamp(col("__asof_ts"))
        col("__asof_ts").isNotNull && gap <= tol
    }

    val result = payload.foldLeft(withPayload.filter(col("__side") === 1)) {
      (d, p) => d.withColumn(p, when(inWindow, col(s"__p_$p")))
    }
    result.drop((pCols ++ Seq("__ts", "__side", "__rts", "__asof_ts")): _*)
  }
}
