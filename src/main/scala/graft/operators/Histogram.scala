package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Equi-width histogram quantile estimation — the one-pass sketch
  * alternative to exact per-group percentiles (q28's `percentile`
  * sorts every group; at 100 TB that sort IS the job). Calibration is
  * one global min/max aggregate; the histogram build is one linear
  * pass with map-side partial aggregation on the uniform (group, bin)
  * key; estimates read the cumulative counts per group.
  *
  * The estimate returned for quantile q is the RIGHT EDGE of the first
  * bin whose cumulative count reaches ⌈q·n⌉ — an upper bound with
  * error ≤ one bin width (max−min)/bins, the standard equi-width
  * contract. Histograms are mergeable (bin counts add), so the same
  * state serves incremental maintenance ([[graft.queries.Q]] qw05's
  * pattern) and distributed combine trees.
  *
  * Determinism: binning is ⌊(x−min)/w⌋ clamped to the last bin —
  * fixed-order IEEE arithmetic mirrored verbatim in oracle SQL; counts
  * and cumulative sums are exact integers; the final edge arithmetic
  * is two IEEE ops. No libm anywhere.
  */
object Histogram {

  /** @param quantiles (outputSuffix, q) pairs, e.g. ("p50", 0.5) →
    *   column `est_p50`
    * @return one row per group: (groupCol, n_rows, est_*...) */
  def quantileEstimates(
      df: DataFrame, groupCol: String, valCol: String,
      bins: Int, quantiles: Seq[(String, Double)]): DataFrame = {
    require(bins >= 1 && quantiles.nonEmpty)
    require(quantiles.forall { case (_, q) => q > 0.0 && q <= 1.0 })
    // Null values are excluded up front: they carry no position on the
    // value axis, and counting them would inflate n while landing in a
    // bin no quantile can select (they'd also diverge from engines that
    // sort nulls last, e.g. DuckDB, vs Spark's nulls-first windows).
    val dfNn = df.filter(col(valCol).isNotNull)
    // calibration pass: global value range (two scalars; the second
    // scan below is the histogram build — bounds are inherently a
    // separate pass unless supplied by table statistics)
    val mm = dfNn.agg(min(col(valCol).cast("double")).as("mn"),
      max(col(valCol).cast("double")).as("mx")).head()
    require(!mm.isNullAt(0),
      s"quantileEstimates: input has no non-null '$valCol' values")
    val mn = mm.getDouble(0)
    val mx = mm.getDouble(1)
    require(mx > mn, s"degenerate value range [$mn, $mx]: all values equal")
    val w = (mx - mn) / bins
    val hist = dfNn.select(col(groupCol).as("grp"),
        least(floor((col(valCol).cast("double") - lit(mn)) / lit(w)),
          lit((bins - 1).toLong)).as("bin"))
      .groupBy(col("grp"), col("bin")).agg(count(lit(1)).cast("long").as("c"))
    val cum = hist
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy(col("grp")).orderBy(col("bin"))))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("grp"))))
    val sel = cum.groupBy(col("grp")).agg(
      max(col("n")).cast("long").as("n_rows"),
      quantiles.map { case (nme, q) =>
        min(when(col("cum") >= ceil(lit(q) * col("n").cast("double")),
          col("bin"))).as(s"b_$nme")
      }: _*)
    sel.select(col("grp").as(groupCol) +: col("n_rows") +:
      quantiles.map { case (nme, _) =>
        (lit(mn) + (col(s"b_$nme") + 1).cast("double") * lit(w)).as(s"est_$nme")
      }: _*)
  }
}
