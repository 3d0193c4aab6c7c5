package graft.operators

import java.sql.Timestamp
import graft.SparkSuite

class TimeseriesSpec extends SparkSuite {
  import spark.implicits._

  private def ts(day: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")

  test("resampleInterpolateDaily: linear fill between observed neighbors") {
    // key 1: days 1, 4 observed (10.0, 40.0) → days 2, 3 interpolate
    // to 20, 30; key 2: single day — grid of one, no interpolation
    val df = Seq(
      (1L, ts(1), 10.0), (1L, ts(4), 40.0),
      (2L, ts(7), 5.0)
    ).toDF("user_id", "ts", "value")
    val got = Timeseries.resampleInterpolateDaily(df, "user_id", "ts", "value")
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString) -> r.getDouble(2)).toMap
    assert(got == Map(
      (1L, "2024-01-01") -> 10.0, (1L, "2024-01-02") -> 20.0,
      (1L, "2024-01-03") -> 30.0, (1L, "2024-01-04") -> 40.0,
      (2L, "2024-01-07") -> 5.0))
    // same-day observations aggregate before gridding
    val dup = Seq((1L, ts(1), 1.0), (1L, ts(1), 2.0)).toDF("user_id", "ts", "value")
    val one = Timeseries.resampleInterpolateDaily(dup, "user_id", "ts", "value")
      .collect()
    assert(one.length == 1 && one(0).getDouble(2) == 3.0)
  }

  test("zScoreOutliers: flags only beyond z sigma; zero-variance silent") {
    // group a: 9 values at 0 and one at 10 → the 10 is ~3 sigma out
    val a = (1 to 9).map(i => ("a", i.toLong, 0.0)) :+ (("a", 10L, 10.0))
    // group b: constant → sigma 0, nothing flagged
    val b = (1 to 5).map(i => ("b", 100L + i, 7.0))
    val df = (a ++ b).toDF("grp", "id", "value")
    val got = Timeseries.zScoreOutliers(df, "grp", "value", z = 2.5)
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("id")))
    assert(got.toSeq == Seq(("a", 10L)), got.mkString(","))
  }

  test("seasonalDecompose: recovers a planted trend+seasonal signal") {
    // 28 days: flat level 100 + seasonal bump (+14 on sidx 0, -14/6 on
    // the rest → zero-mean over the period) — on a constant trend the
    // 7-day MA is exactly 100 and the seasonal means recover the bump.
    import java.sql.Timestamp
    val rows = (0 until 28).map { d =>
      val bump = if (d % 7 == 4) 14.0 else -14.0 / 6.0
      (Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00"), 100.0 + bump)
    }
    val out = Timeseries.seasonalDecompose(rows.toDF("ts", "value"), "ts", "value")
      .collect().map(r => (r.getDate(0).toString,
        r.getDouble(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
      .sortBy(_._1)
    assert(out.length == 28)
    // edge days (first/last 3) have no full MA window → null trend/residual
    assert(out.take(3).forall(_._3.isEmpty) && out.takeRight(3).forall(_._3.isEmpty))
    val interior = out.drop(3).dropRight(3)
    assert(interior.forall(r => math.abs(r._3.get - 100.0) < 1e-6),
      "constant-level MA must be 100")
    // seasonal index recovered: +14 on the bump day, ≈ -2.333333 elsewhere
    val bumpDays = interior.filter(_._2 > 110.0)
    assert(bumpDays.nonEmpty && bumpDays.forall(r => math.abs(r._4.get - 14.0) < 1e-6))
    assert(interior.forall(r => math.abs(r._5.get) < 1e-5), "residual ≈ 0")
  }

  test("madOutliers: resistant where the z-score is dragged; zero-MAD silent") {
    // 20 inliers at ~10 plus one 10^6 outlier: σ inflates to ~2·10^5 so
    // the z-score at 3σ misses SECONDARY outliers like 200; MAD flags it
    val contaminated = ((1 to 20).map(i => (1L + i, "a", 10.0 + (i % 5) * 0.1)) ++
      Seq((100L, "a", 1e6), (101L, "a", 200.0)) ++
      // >50% identical values → MAD = 0 → silent
      Seq((200L, "b", 5.0), (201L, "b", 5.0), (202L, "b", 5.0), (203L, "b", 99.0))
    ).toDF("event_id", "g", "v")
    val mad = Timeseries.madOutliers(contaminated, "g", "v", z = 3.0)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(mad.contains(100L) && mad.contains(101L), mad.toString)
    assert(!mad.exists(_ >= 200L), "zero-MAD group must stay silent")
    assert(!mad.exists(id => id >= 2L && id <= 21L), "inliers must not flag")
    val z = Timeseries.zScoreOutliers(
      contaminated.filter($"g" === "a"), "g", "v", z = 3.0)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(!z.contains(101L), "σ dragged by the 10^6 point hides 200.0 — the contrast")
  }
}
