package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min frequency estimation over a key column — the
  * approximate-counting complement to [[HeavyHitters]]:
  * Misra-Gries answers "which keys are heavy" with candidates that
  * need an exact verify pass; a CMS answers "how often did THIS key
  * occur" for any key, after one linear pass, from `depth · width`
  * longs of mergeable state (elementwise-sum merge → map-side partial
  * aggregation collapses each task's stream before the exchange; see
  * [[graft.functions.CountMinSketch]]).
  *
  * Both estimates here carry the classic CMS one-sided guarantee:
  * `true ≤ est`, and `est − true ≤ ε·n` with probability `1 − δ` at
  * `width = e/ε`, `depth = ln(1/δ)` — so the sketch is the
  * planner-statistics tool (overcounting a join is safe, undercounting
  * is not). All bucketing derives from the shared 60-bit md5 hash
  * ([[Dedup.hash60]]): row i probes bucket `((h >> 15i) & 0x7fff) %
  * width`, three integer ops an oracle replays exactly.
  *
  * At 100 TB: the sketch build is one partial-aggregating pass whose
  * shuffle moves O(d·w·8) bytes per group — counters for a trillion
  * rows fit in 16 KB at (4, 512). Point estimation broadcasts the
  * one-row sketch and probes it with four `element_at`s per key —
  * no join against a frequency table, no second scan of the data.
  */
object Frequency {

  /** Row i's bucket for hash column `h` (nonnegative 60-bit). */
  private def bucket(h: Column, i: Int, width: Int): Column =
    (shiftright(h, 15 * i).bitwiseAND(lit(0x7fffL)) % width).cast("int")

  private def keyed(df: DataFrame, keyCol: String): DataFrame =
    df.select(col(keyCol).cast("long").as("key"))
      .withColumn("h", Dedup.hash60(col("key").cast("string")))

  /** One-row frame `(regs)`: the row-major d×w counter grid over
    * `keyCol`'s occurrences. */
  def cmsSketch(df: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    keyed(df, keyCol)
      .agg(call_function("graft_cms", col("h"), lit(depth), lit(width)).as("regs"))
  }

  /** CMS estimate of `h`'s frequency from a `regs` grid column:
    * `least` over the d probed counters (1-based `element_at`). */
  def cmsEstimate(regs: Column, h: Column, depth: Int, width: Int): Column =
    least((0 until depth).map(i =>
      element_at(regs, lit(i * width + 1) + bucket(h, i, width))): _*)

  /** Per-key `(key, true_cnt, est_cnt)`: the exact count next to the
    * sketch's point estimate — `true_cnt ≤ est_cnt` always (collisions
    * only ADD), equality for keys alone in all d buckets. The exact
    * side exists to exhibit the guarantee; production keeps only the
    * broadcast-sketch probe. */
  def cmsPointEstimates(
      df: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 2, s"depth must be >= 2 for a least() estimate, got $depth")
    graft.functions.GraftFunctions.register(df.sparkSession)
    val k = graft.core.OpCache.persist(keyed(df, keyCol))
    val sketch =
      k.agg(call_function("graft_cms", col("h"), lit(depth), lit(width)).as("regs"))
    k.groupBy(col("key"), col("h")).agg(count(lit(1)).as("true_cnt"))
      .crossJoin(broadcast(sketch))
      .select(col("key"), col("true_cnt"),
        cmsEstimate(col("regs"), col("h"), depth, width).as("est_cnt"))
  }

  /** One-row `(true_size, est_size)`: equi-join cardinality
    * |A ⋈_key B| estimated as `min_i Σ_b ctrA_i[b] · ctrB_i[b]` — the
    * CMS inner-product bound — next to the exact size. Each side is
    * sketched in one linear pass; the estimate itself touches only the
    * two d·w grids, so at 100 TB the join-size QUESTION costs two
    * counting scans + 16 KB of arithmetic where the exact answer costs
    * the join. Self-joins (pass the same frame twice) estimate
    * Σ cnt² — the skew diagnostic. */
  def cmsJoinSize(
      dfA: DataFrame, keyColA: String,
      dfB: DataFrame, keyColB: String,
      depth: Int, width: Int): DataFrame = {
    val a = cmsSketch(dfA, keyColA, depth, width).select(col("regs").as("ra"))
    val b = cmsSketch(dfB, keyColB, depth, width).select(col("regs").as("rb"))
    val dots = a.crossJoin(b).select((0 until depth).map { i =>
      aggregate(
        zip_with(
          slice(col("ra"), i * width + 1, width),
          slice(col("rb"), i * width + 1, width),
          (x, y) => x * y),
        lit(0L), (acc, x) => acc + x).as(s"dot_$i")
    }: _*)
    val est = dots.select(
      least((0 until depth).map(i => col(s"dot_$i")): _*).as("est_size"))
    val tru = dfA.select(col(keyColA).cast("long").as("key"))
      .join(dfB.select(col(keyColB).cast("long").as("key")), Seq("key"))
      .agg(count(lit(1)).as("true_size"))
    tru.crossJoin(broadcast(est))
  }
}
