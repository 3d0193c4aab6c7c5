package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions.col
import graft.SparkSuite

class FunnelSpec extends SparkSuite {
  import spark.implicits._

  private def ts(min: Long): Timestamp = new Timestamp(1700000000000L + min * 60000)

  test("funnel: strictly-after first-touch semantics") {
    val events = Seq(
      // user 1 completes the funnel in order
      (1L, ts(0), "view"), (1L, ts(1), "click"), (1L, ts(2), "purchase"),
      // user 2 clicks BEFORE viewing — the click cannot count; no later click
      (2L, ts(0), "click"), (2L, ts(1), "view"), (2L, ts(2), "purchase"),
      // user 3 views and clicks at the SAME instant — strictly-after fails
      (3L, ts(0), "view"), (3L, ts(0), "click"),
      // user 4 views only
      (4L, ts(0), "view"),
      // user 5: click after FIRST view counts even with a later view
      (5L, ts(0), "view"), (5L, ts(3), "view"), (5L, ts(1), "click")
    ).toDF("user_id", "ts", "event_type")
    val stages = Seq(
      "view" -> (col("event_type") === "view"),
      "click" -> (col("event_type") === "click"),
      "purchase" -> (col("event_type") === "purchase"))
    val got = Funnel.funnel(events, "user_id", "ts", stages)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    // view: users 1,2,3,4,5; click-after-view: 1,5; purchase-after-click: 1
    assert(got == Map("view" -> 5L, "click" -> 2L, "purchase" -> 1L))
    graft.core.OpCache.releaseAll(blocking = true)
  }

  test("funnel: reached-sets are persisted — no O(k²) re-execution") {
    val events = Seq(
      (1L, ts(0), "view"), (1L, ts(1), "click"), (1L, ts(2), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val stages = Seq(
      "view" -> (col("event_type") === "view"),
      "click" -> (col("event_type") === "click"),
      "purchase" -> (col("event_type") === "purchase"))
    val df = Funnel.funnel(events, "user_id", "ts", stages)
    // every stage count reads its stage's CACHED reached-set; the final
    // union plan must reference one InMemoryRelation per stage and zero
    // direct scans of the raw events relation (those live only inside
    // each cached build, which executes once)
    val optimized = df.queryExecution.optimizedPlan
    val cached = optimized.collect {
      case _: org.apache.spark.sql.execution.columnar.InMemoryRelation => 1
    }.sum
    val raw = optimized.collect {
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => 1
    }.sum
    assert(cached == stages.size,
      s"expected ${stages.size} cached stage relations, got $cached")
    assert(raw == 0, s"raw events relation leaked into the union plan ($raw scans)")
    assert(df.count() == 3)
    graft.core.OpCache.releaseAll(blocking = true)
  }
}
