package graft.storage

import graft.SparkSuite

class RetentionSpec extends SparkSuite {
  import spark.implicits._

  test("retentionPlan: last-N window, monthly winners, rest expires") {
    // 3 commits/month over 4 months: ids 1..12, ts = month m day d
    val log = (for {
      m <- 1 to 4; d <- Seq(5, 15, 25)
    } yield ((m - 1) * 3L + (d / 10 + 1),
      java.sql.Date.valueOf(f"2024-0$m-$d%02d")))
      .zipWithIndex.map { case ((_, ts), i) => (i + 1L, ts) }
      .toDF("version_id", "committed_ts")
    val plan = Retention.retentionPlan(log, "version_id", "committed_ts",
        keepLast = 2, keepMonths = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(2), r.getString(3))))
      .toMap
    // last 2 commits: ids 12, 11 (Apr 25, Apr 15)
    assert(plan(12L) == (("keep", "last_n")))
    assert(plan(11L) == (("keep", "last_n")))
    // monthly winners within 2 months of max (Apr): Mar 25 (id 9); the
    // Apr winner (id 12) is already claimed by last_n precedence
    assert(plan(9L) == (("keep", "monthly")))
    // outside the monthly horizon and the rollback window: expire
    assert(plan(3L) == (("expire", "expired"))) // Jan 25 (its month's winner, too old)
    assert(plan(10L) == (("expire", "expired"))) // Apr 5, superseded
    assert(plan(8L) == (("expire", "expired"))) // Mar 15, superseded
    // covering: every version classified
    assert(plan.size == 12)
    graft.core.OpCache.releaseAll(blocking = true)
  }

  test("retentionPlan: ties on ts break by version id, deterministic") {
    val ts = java.sql.Date.valueOf("2024-01-10")
    val log = Seq((1L, ts), (2L, ts), (3L, ts)).toDF("v", "t")
    val plan = Retention.retentionPlan(log, "v", "t", keepLast = 1,
        keepMonths = 1)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    // id 3 wins both the last-N slot and the month (highest id)
    assert(plan(3L) == "last_n")
    assert(plan(2L) == "expired" && plan(1L) == "expired")
    graft.core.OpCache.releaseAll(blocking = true)
  }
}
