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

  /** First/last-touch attribution: for every conversion event, the id
    * of the FIRST and the LAST qualifying touch event by the same user
    * that happened strictly before it (marketing attribution's two
    * canonical models, answered in one pass).
    *
    * Both touches come from ONE per-user sort: two IGNORE-NULLS window
    * reads over (user ORDER BY ts, id) with a rows-frame ending at
    * 1 PRECEDING — the W1 forward-fill pattern pointed at event ids.
    * The frame makes "strictly before" positional, so simultaneous
    * touch+conversion timestamps resolve deterministically by the id
    * tiebreak instead of engine-dependent peer handling (why the frame
    * is ROWS, not RANGE). Conversions with no preceding touch keep
    * NULL attributions — dropped rows would silently understate
    * unattributed conversions.
    *
    * Scale shape: one shuffle on the user key, per-partition sort
    * bounded by a user's event count, output pruned to conversions.
    * No self-join (the naive formulation joins conversions×touches and
    * re-aggregates — quadratic in a hot user's events; this is linear).
    */
  def touchAttribution(
      events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, idCol: String,
      conversionType: String, touchTypes: Seq[String]): DataFrame = {
    require(touchTypes.nonEmpty, "attribution needs at least one touch type")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(Long.MinValue, -1)
    val touchId = when(col(typeCol).isInCollection(touchTypes), col(idCol))
    events
      .withColumn("first_touch_id", first(touchId, ignoreNulls = true).over(w))
      .withColumn("last_touch_id", last(touchId, ignoreNulls = true).over(w))
      .filter(col(typeCol) === conversionType)
      .select(col(idCol).as("conversion_id"), col(userCol),
        col(tsCol).as("conversion_ts"),
        col("first_touch_id"), col("last_touch_id"))
  }

  /** Sequence-pattern occurrence counting (the MATCH_RECOGNIZE shape):
    * encode each user's event history as a one-char-per-event string in
    * (ts, id) order, then count non-overlapping occurrences of a
    * regex over the alphabet. Types outside the alphabet become a gap
    * character, so patterns can demand adjacency (`VCP`) or tolerate
    * noise (`V[^P]*P`) explicitly.
    *
    * A funnel asks "did the user ever reach stage k"; this asks "how
    * many times did the exact motif occur" — the complementary
    * sequential-analysis primitive.
    *
    * Scale shape: one hash-agg per user building the sequence string
    * (order enforced by sort_array over (ts, id)-keyed structs — a
    * deterministic, partitioning-independent encode; no window), then
    * a narrow regexp_count map. A user's string is bounded by their
    * event count; the pathological hot user degrades to one long
    * string, not a quadratic join.
    *
    * @param alphabet event-type → pattern character (1 char each)
    * @param pattern Java regex over those characters + the gap char '_'
    */
  def patternOccurrences(
      events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, idCol: String,
      alphabet: Map[String, String], pattern: String): DataFrame = {
    require(alphabet.values.forall(_.length == 1),
      "alphabet symbols must be single characters")
    val enc = alphabet.foldLeft(lit("_")) { case (acc, (k, v)) =>
      when(col(typeCol) === k, lit(v)).otherwise(acc)
    }
    events
      .select(col(userCol).as("u"),
        struct(col(tsCol).as("t"), col(idCol).as("i"), enc.as("c")).as("e"))
      .groupBy(col("u"))
      .agg(array_join(transform(sort_array(collect_list(col("e"))),
        e => e.getField("c")), "").as("seq"))
      .select(col("u").as(userCol),
        regexp_count(col("seq"), lit(pattern)).cast("long").as("n_matches"))
  }
}
