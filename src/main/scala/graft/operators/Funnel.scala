package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event log: how many users reach
  * stage k, where reaching stage k means an event matching stage k's
  * predicate STRICTLY AFTER the user's first stage-(k−1) event (first
  * touch, the classic product-analytics funnel).
  *
  * Scale shape: stage k is one predicate-pruned scan (the filter
  * pushes to the source), one equi-join on the user against the
  * (shrinking) reached-set, and one min-aggregate — all partitioned by
  * user id, no window over the whole log, no per-user event sorting.
  * The reached-set only ever shrinks, so later stages get cheaper; a
  * hot user dedupes to one row per stage before the next join.
  */
object Funnel {

  /** @param stages (name, predicate) per funnel stage, in order
    * @return one row per stage: (stage_idx, stage, n_users) */
  def funnel(
      events: DataFrame, userCol: String, tsCol: String,
      stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    var reached: DataFrame = null
    val outs = Seq.newBuilder[DataFrame]
    stages.zipWithIndex.foreach { case ((name, pred), i) =>
      val hits = events.filter(pred)
        .select(col(userCol).as("u"), col(tsCol).as("t"))
      // Each stage's reached-set is consumed twice (next stage's join +
      // this stage's count in the final union) — persist it, or the
      // union re-executes every prior stage's join per branch and the
      // log gets rescanned O(k²) times for a k-stage funnel.
      reached = graft.core.OpCache.persist(
        if (i == 0) hits.groupBy(col("u")).agg(min(col("t")).as("t"))
        else hits
          .join(reached.select(col("u"), col("t").as("prev_t")), Seq("u"))
          .filter(col("t") > col("prev_t"))
          .groupBy(col("u")).agg(min(col("t")).as("t")))
      outs += reached.agg(count(lit(1)).cast("long").as("n_users"))
        .select(lit(i + 1).cast("long").as("stage_idx"),
          lit(name).as("stage"), col("n_users"))
    }
    outs.result().reduce(_ unionByName _)
  }
}
