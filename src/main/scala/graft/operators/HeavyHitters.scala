package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact heavy hitters at scale — the two-pass pattern that finds
  * every key holding ≥ `permille`‰ of a 100 TB table WITHOUT ever
  * shuffling the key column:
  *
  *  1. Candidate pass: one [[graft.functions.MisraGries]] summary
  *     (capacity `capacity`) over the whole input. The only state that
  *     crosses the wire is the ≤ `capacity`-entry summary per partial
  *     aggregate — no per-key shuffle, no wide exchange. The
  *     mergeable-summaries guarantee makes the result a SUPERSET of
  *     every key with true share > 1/(capacity+1), under any
  *     partitioning.
  *  2. Verify pass: exact `count(*)` restricted to the candidates
  *     (a broadcast semi-join — the candidate table is ≤ `capacity`
  *     rows by construction), then the integer-exact threshold
  *     `count·1000 ≥ n·permille`.
  *
  * Because step 1 is a guaranteed superset for any threshold above the
  * summary's error floor (`capacity + 1 > 1000/permille`, enforced),
  * the output equals the plain `GROUP BY HAVING` answer exactly — the
  * nondeterministic sub-threshold tail that MG may or may not retain
  * is filtered away by the exact verify. Deterministic output from a
  * sketch-shaped plan.
  *
  * Scale: pass 2's hash agg sees only candidate-key rows, and partial
  * (map-side) aggregation collapses each heavy key per task before the
  * ≤ `capacity`-row exchange — a 10%-of-everything mega-key never
  * concentrates raw rows on one reducer.
  */
object HeavyHitters {

  /** Keys of `keyCol` (LongType) holding ≥ permille‰ of `df`'s rows,
    * with their exact counts and the total. */
  def heavyHitters(
      df: DataFrame,
      keyCol: String,
      permille: Int,
      capacity: Int): DataFrame = {
    require(permille >= 1 && permille <= 1000, "permille in 1..1000")
    require((capacity + 1).toLong * permille > 1000L,
      s"capacity $capacity too small for ${permille}‰: need capacity+1 > 1000/permille " +
        "or the MG superset guarantee does not cover the threshold")
    val src = graft.core.OpCache.persist(
      df.select(col(keyCol).cast("long").as("hh_key")))
    val cand = src
      .agg(call_function("graft_heavy_keys", col("hh_key"), lit(capacity)).as("ks"))
      .select(explode(col("ks")).as("hh_key"))
    val total = src.agg(count(lit(1)).as("n_total"))
    src.join(broadcast(cand), Seq("hh_key"), "left_semi")
      .groupBy(col("hh_key"))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * 1000 >= col("n_total") * permille)
      .select(col("hh_key"), col("cnt"), col("n_total"))
  }
}
