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

  test("touchAttribution: first/last touch strictly before conversion") {
    val events = Seq(
      // user 1: view, click, purchase — first=10 (view), last=11 (click)
      (10L, 1L, ts(0), "view"), (11L, 1L, ts(1), "click"),
      (12L, 1L, ts(2), "purchase"),
      // user 2: purchase with NO preceding touch → NULL attribution
      (20L, 2L, ts(0), "purchase"), (21L, 2L, ts(1), "view"),
      // user 3: touch at the SAME ts as the purchase, smaller id —
      // positional frame (ROWS ... 1 PRECEDING) counts it
      (30L, 3L, ts(5), "view"), (31L, 3L, ts(5), "purchase"),
      // user 3's second purchase sees the same single touch
      (32L, 3L, ts(6), "purchase"),
      // user 4: error events are not touches
      (40L, 4L, ts(0), "error"), (41L, 4L, ts(1), "purchase")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = Funnel.touchAttribution(events, "user_id", "ts",
        "event_type", "event_id", "purchase", Seq("view", "click"))
      .collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(3)), Option(r.get(4))))).toMap
    assert(got == Map(
      12L -> ((Some(10L), Some(11L))),
      20L -> ((None, None)),
      31L -> ((Some(30L), Some(30L))),
      32L -> ((Some(30L), Some(30L))),
      41L -> ((None, None))))
  }

  test("patternOccurrences: non-overlapping motif counts over (ts,id) order") {
    val events = Seq(
      // user 1: V C P V C P → two disjoint matches
      (1L, 1L, ts(0), "view"), (2L, 1L, ts(1), "click"),
      (3L, 1L, ts(2), "purchase"), (4L, 1L, ts(3), "view"),
      (5L, 1L, ts(4), "click"), (6L, 1L, ts(5), "purchase"),
      // user 2: V _ C P with a gap (error) the pattern tolerates
      (7L, 2L, ts(0), "view"), (8L, 2L, ts(1), "error"),
      (9L, 2L, ts(2), "click"), (10L, 2L, ts(3), "purchase"),
      // user 3: C V P — no click after the view before the purchase
      (11L, 3L, ts(0), "click"), (12L, 3L, ts(1), "view"),
      (13L, 3L, ts(2), "purchase"),
      // user 4: same-ts ordering falls back to event_id: V(14) C(15) P(16)
      (14L, 4L, ts(0), "view"), (15L, 4L, ts(0), "click"),
      (16L, 4L, ts(0), "purchase")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = Funnel.patternOccurrences(events, "user_id", "ts",
        "event_type", "event_id",
        Map("view" -> "V", "click" -> "C", "purchase" -> "P"),
        "V[^P]*C[^P]*P")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 1L, 3L -> 0L, 4L -> 1L))
  }
}
