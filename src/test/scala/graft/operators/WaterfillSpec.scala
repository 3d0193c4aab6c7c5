package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions.col

class WaterfillSpec extends SparkSuite {
  import spark.implicits._

  private def alloc(df: org.apache.spark.sql.DataFrame,
      weights: Map[String, Int], budget: Long, rounds: Int = 3) = {
    val r = Curation.tokenBudgetWaterfill(df, "source", col("tokens"),
      weights, defaultWeight = 10, budget = budget, rounds = rounds)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getBoolean(3)))).toMap
    graft.core.OpCache.releaseAll()
    r
  }

  test("waterfill: saturation redistributes exactly as hand-computed") {
    // a: avail 100 w 60, b: avail 1000 w 30, c: avail 1000 w 10
    // budget 1000: round1 wsum=100 → want a=600>100 SAT, b=300, c=100
    // round2 R=900 wsum=40 → want b=675, c=225 (no saturation)
    // round3 identical → a:(100,sat) b:675 c:225
    val df = Seq(("a", 100L), ("b", 1000L), ("c", 1000L))
      .toDF("source", "tokens")
    val got = alloc(df, Map("a" -> 60, "b" -> 30), 1000L)
    assert(got("a") == ((100L, 100L, true)))
    assert(got("b") == ((1000L, 675L, false)))
    assert(got("c") == ((1000L, 225L, false)))
  }

  test("waterfill: budget exceeding supply saturates everything") {
    val df = Seq(("a", 50L), ("b", 70L)).toDF("source", "tokens")
    val got = alloc(df, Map("a" -> 1), 10000L)
    assert(got("a") == ((50L, 50L, true)))
    assert(got("b") == ((70L, 70L, true)))
  }

  test("waterfill: zero budget allocates zero, nothing saturates early") {
    val df = Seq(("a", 50L), ("b", 70L)).toDF("source", "tokens")
    val got = alloc(df, Map.empty, 0L)
    assert(got("a")._2 == 0L && got("b")._2 == 0L)
    // allocation never exceeds budget
    assert(got.values.map(_._2).sum == 0L)
  }

  test("waterfill: total allocation never exceeds the budget") {
    val df = Seq(("a", 10L), ("b", 2000L), ("c", 300L), ("d", 7L))
      .toDF("source", "tokens")
    for (b <- Seq(1L, 37L, 500L, 2318L)) {
      val got = alloc(df, Map("a" -> 500, "d" -> 300), b)
      assert(got.values.map(_._2).sum <= b, s"budget $b")
    }
  }

  test("waterfilledMix: kept prefixes respect allocations; saturated keeps all") {
    // 60 docs of 10 tokens each across 3 sources (200 tokens/source)
    val df = (0 until 60).map(i =>
      (i.toLong, s"s${i % 3}", 10L)).toDF("doc_id", "source", "tokens")
    val kept = Curation.waterfilledMix(df, "doc_id", "source", col("tokens"),
      Map("s0" -> 80), defaultWeight = 10, budget = 300L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    graft.core.OpCache.releaseAll()
    val bySrc = kept.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    // round1: wsum=100 → s0 wants 240 > 200 SAT (keeps all 200);
    // round2: R=100, wsum=20 → s1/s2 want 50 each → 5 docs each
    assert(bySrc("s0") == 200L)
    assert(bySrc.getOrElse("s1", 0L) == 50L && bySrc.getOrElse("s2", 0L) == 50L)
    // partitioning invariance: identical kept set at another layout
    val kept7 = Curation.waterfilledMix(df.repartition(7), "doc_id", "source",
      col("tokens"), Map("s0" -> 80), defaultWeight = 10, budget = 300L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    graft.core.OpCache.releaseAll()
    assert(kept7.toSet == kept.toSet)
  }

  test("groupedTokenPrefix: before = tokens strictly ahead in key order, per group") {
    val df = (0 until 30).map(i =>
      (i.toLong, s"g${i % 2}", (i % 4 + 1).toLong)).toDF("doc_id", "g", "tokens")
    val got = Sharding.groupedTokenPrefix(df, "g", "doc_id", col("tokens"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // recompute the expected prefix sums naively
    val expected = got.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      val order = rows.toSeq.sortBy(r =>
        java.security.MessageDigest.getInstance("MD5")
          .digest(r._1.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString)
      order.scanLeft(0L)(_ + _._3).zip(order).map { case (bef, r) => r._1 -> bef }
    }.toMap
    assert(got.map(r => r._1 -> r._4).toMap == expected)
  }
}
