package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization — the gap-filling stage of an indicator
  * pipeline (the reference's domain is yearly indicator series; the
  * same shapes serve any regular grid).
  */
object Timeseries {

  /** Per-key daily resample + LINEAR interpolation of interior gaps:
    * observations aggregate to (key, day) with order-invariant decimal
    * sums, each key's grid spans its own [min, max] day (sequence
    * explode — fan-out bounded by the key's span, never a global
    * calendar join), and a missing day takes
    * prev + (next − prev) · (day − prevDay)/(nextDay − prevDay) from
    * the nearest observed neighbors on each side (two frame-bounded
    * windows with IGNORE NULLS — the W1 forward-fill pattern run in
    * both directions). Grid endpoints are observed by construction, so
    * every interior day has both neighbors; values round to 6 decimals
    * (the qm01 discipline) so the one interpolation division stays
    * engine-comparable.
    *
    * Scale shape: one hash agg on (key, day), one per-key explode, two
    * windows over the same (key ORDER BY day) sort — a single shuffle
    * on the key reused by every stage after the agg. */
  def resampleInterpolateDaily(
      df: DataFrame, keyCol: String, tsCol: String,
      valCol: String): DataFrame = {
    val obs = df.groupBy(col(keyCol).as("k"), to_date(col(tsCol)).as("day"))
      .agg(graft.expr.Exprs.exactSum(col(valCol).cast("double")).as("v"))
    val grid = obs.groupBy(col("k"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("k"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val j = grid.join(obs, Seq("k", "day"), "left")
    val wPrev = Window.partitionBy(col("k")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col("k")).orderBy(col("day"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    j.withColumn("pv", last(col("v"), ignoreNulls = true).over(wPrev))
      .withColumn("pd",
        last(when(col("v").isNotNull, col("day")), ignoreNulls = true).over(wPrev))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(wNext))
      .withColumn("nd",
        first(when(col("v").isNotNull, col("day")), ignoreNulls = true).over(wNext))
      .select(col("k").as(keyCol), col("day"),
        round(when(col("v").isNotNull, col("v"))
          .otherwise(col("pv") + (col("nv") - col("pv")) *
            (datediff(col("day"), col("pd")).cast("double") /
              datediff(col("nd"), col("pd")).cast("double"))), 6)
          .as("value"))
  }

  /** Per-group z-score outliers: flag rows with |x − μ| > z·σ using
    * population moments from ONE aggregation pass (decimal-exact sum
    * and sum-of-squares — order-invariant, so μ and σ are
    * bit-reproducible; σ via one correctly-rounded sqrt). Groups with
    * zero variance produce no flags (nothing deviates). The
    * data-quality sibling of the validation stage: one hash agg + one
    * broadcast-sized stats join + a narrow filter. */
  def zScoreOutliers(
      df: DataFrame, groupCol: String, valCol: String,
      z: Double = 3.0): DataFrame = {
    val x = col(valCol).cast("double")
    val st = df.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("double").as("n"),
        graft.expr.Exprs.exactSum(x).as("s"),
        graft.expr.Exprs.exactSum(x * x).as("s2"))
      .select(col(groupCol), (col("s") / col("n")).as("mu"),
        sqrt(col("s2") / col("n") - (col("s") / col("n")) * (col("s") / col("n")))
          .as("sigma"))
    df.join(broadcast(st), Seq(groupCol))
      .filter(col("sigma") > 0.0 && abs(x - col("mu")) > lit(z) * col("sigma"))
      .withColumn("z_score", round((x - col("mu")) / col("sigma"), 6))
      .drop("mu", "sigma")
  }

  /** Per-group ROBUST outliers via median absolute deviation —
    * [[zScoreOutliers]]'s resistant sibling: μ/σ are themselves
    * dragged by the outliers they hunt (one 10⁶× point inflates σ
    * until nothing else flags); the median/MAD pair has a 50%
    * breakdown point, so contamination cannot hide itself. Flags
    * |x − med| > z · 1.4826 · MAD (1.4826 = 1/Φ⁻¹(3/4), the
    * consistency constant that makes MAD estimate σ under normality —
    * so `z` means the same thing in both operators).
    *
    * Median and MAD are the q28 interpolated `percentile` — the same
    * doubles on both engines; the robust score is one division
    * rounded to 6 (the q42 discipline). Zero-MAD groups (>50% of
    * values identical) flag nothing: deviation is unmeasurable there,
    * and a loud NaN would be wrong more often than silence.
    *
    * Scale shape: two group aggregates (med, then MAD of deviations)
    * + one broadcast of the tiny per-group stats + a narrow filter —
    * the fact table is scanned twice but never shuffled; at 100 TB
    * swap the exact percentiles for q38's histogram quantiles to get
    * one pass. */
  def madOutliers(
      df: DataFrame, groupCol: String, valCol: String,
      z: Double = 3.0): DataFrame = {
    val x = col(valCol).cast("double")
    val med = df.filter(x.isNotNull).groupBy(col(groupCol))
      .agg(expr(s"percentile(cast($valCol as double), 0.5)").as("med"))
    val dev = df.join(broadcast(med), Seq(groupCol))
      .filter(x.isNotNull)
      .groupBy(col(groupCol))
      .agg(expr(s"percentile(abs(cast($valCol as double) - med), 0.5)")
        .as("mad"))
    val st = med.join(dev, Seq(groupCol))
    df.join(broadcast(st), Seq(groupCol))
      .filter(col("mad") > 0.0 &&
        abs(x - col("med")) > lit(z) * lit(1.4826) * col("mad"))
      .withColumn("robust_score",
        round((x - col("med")) / (lit(1.4826) * col("mad")), 6))
      .drop("med", "mad")
  }

  /** Classical seasonal decomposition by moving averages (the
    * additive decompose every indicator/monitoring pipeline runs):
    * daily totals → centered `maWindow`-observation moving-average
    * TREND (full windows only; edge days get null) → SEASONAL index =
    * mean detrended value per position-in-period → RESIDUAL.
    *
    * Determinism discipline: daily totals are order-invariant decimal
    * sums; the moving-average and seasonal sums stay in DECIMAL (the
    * detrended value is kept SCALED as maWindow·daily − trendSum, so
    * no division happens before the seasonal aggregation); each
    * output is one decimal→double cast and at most one division,
    * rounded to 6 (the q42/q43 discipline). Position-in-period is
    * pure date arithmetic (days since a fixed epoch mod `period`) —
    * no engine-specific day-of-week convention.
    *
    * The single-partition window is deliberate and allow-listed: it
    * runs over the DAILY AGGREGATE (one row per day — years of data
    * is thousands of rows), not the event stream; the 100 TB of
    * events collapse in the decimal hash agg before any window sees
    * them. */
  def seasonalDecompose(
      df: DataFrame, tsCol: String, valCol: String,
      period: Int = 7, maWindow: Int = 7): DataFrame = {
    require(period >= 2, s"period must be >= 2, got $period")
    require(maWindow >= 3 && maWindow % 2 == 1,
      s"maWindow must be odd and >= 3, got $maWindow")
    val half = maWindow / 2
    val daily = df
      .select(to_date(col(tsCol)).as("day"),
        col(valCol).cast("double")
          .cast(org.apache.spark.sql.types.DecimalType(30, 6)).as("v"))
      .groupBy(col("day")).agg(sum(col("v")).as("dsum"))
    val w = Window.partitionBy(lit(0)).orderBy(col("day"))
      .rowsBetween(-half, half)
    val base = daily
      .withColumn("tsum",
        when(count(lit(1)).over(w) === maWindow, sum(col("dsum")).over(w)))
      .withColumn("sidx",
        datediff(col("day"), lit("1970-01-05").cast("date")) % period)
    val seas = base.filter(col("tsum").isNotNull)
      .groupBy(col("sidx"))
      .agg(sum(lit(maWindow) * col("dsum") - col("tsum")).as("ssum"),
        count(lit(1)).as("sn"))
    base.join(broadcast(seas), Seq("sidx"), "left")
      .select(col("day"),
        round(col("dsum").cast("double"), 6).as("daily"),
        round(col("tsum").cast("double") / lit(maWindow.toDouble), 6).as("trend"),
        round(col("ssum").cast("double") /
          (lit(maWindow.toDouble) * col("sn").cast("double")), 6).as("seasonal"))
      .select(col("day"), col("daily"), col("trend"), col("seasonal"),
        round(col("daily") - col("trend") - col("seasonal"), 6).as("residual"))
  }
}
