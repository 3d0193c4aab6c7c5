package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite

class MisraGriesSpec extends SparkSuite {
  import spark.implicits._

  // 1000 rows: key 1 ×400, key 2 ×200, keys 100..599 ×~1 (long tail)
  private def skewed(parts: Int) = {
    val rows = Seq.fill(400)(1L) ++ Seq.fill(200)(2L) ++ (100L until 500L)
    rows.toDF("k").repartition(parts)
  }

  test("summary retains every key above n/(k+1) under any partitioning") {
    graft.functions.GraftFunctions.register(spark)
    for (parts <- Seq(1, 7, 32)) {
      val got = skewed(parts)
        .agg(call_function("graft_heavy_keys", col("k"), lit(9)).as("ks"))
        .select(explode(col("ks")).as("k")).as[Long].collect().toSet
      // error floor n/(k+1) = 100: keys 1 (400) and 2 (200) must survive
      assert(got.contains(1L) && got.contains(2L), s"parts=$parts got=$got")
      assert(got.size <= 9, s"capacity violated: $got")
    }
  }

  test("heavyHitters equals the exact GROUP BY HAVING answer") {
    graft.functions.GraftFunctions.register(spark)
    val df = skewed(13)
    val got = graft.operators.HeavyHitters
      .heavyHitters(df, "k", permille = 150, capacity = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // exact answer: n=1000, threshold 150 -> keys with >= 150 rows
    assert(got == Set((1L, 400L, 1000L), (2L, 200L, 1000L)), got.toString)
    graft.core.OpCache.releaseAll(blocking = true)
  }

  test("heavyHitters rejects a capacity below the guarantee floor") {
    val df = Seq(1L).toDF("k")
    intercept[IllegalArgumentException] {
      graft.operators.HeavyHitters.heavyHitters(df, "k", permille = 8, capacity = 100)
    }
  }
}
