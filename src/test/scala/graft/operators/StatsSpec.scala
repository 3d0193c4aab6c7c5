package graft.operators

import graft.SparkSuite

class StatsSpec extends SparkSuite {
  import spark.implicits._

  test("groupedRegression: exact fit on exactly-linear data") {
    // g=a lies exactly on y = 2x + 3 → slope 2, intercept 3, r² = 1
    val df = Seq(
      ("a", 1.0, 5.0), ("a", 2.0, 7.0), ("a", 3.0, 9.0), ("a", 4.0, 11.0),
      // g=b: y constant → slope 0, r² NULL (no y-variance to explain)
      ("b", 1.0, 4.0), ("b", 2.0, 4.0), ("b", 3.0, 4.0),
      // g=c: x constant (vertical) → dropped
      ("c", 5.0, 1.0), ("c", 5.0, 2.0),
      // g=d: a null on either side is excluded from the fit
      ("d", 1.0, 1.0), ("d", 2.0, 2.0), ("d", 3.0, Double.NaN)
    ).toDF("g", "x", "y")
      .withColumn("y",
        org.apache.spark.sql.functions.nanvl(
          org.apache.spark.sql.functions.col("y"),
          org.apache.spark.sql.functions.lit(null)))
    val got = Stats.groupedRegression(df, "g", "x", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3),
          Option(r.get(4))))).toMap
    assert(got.keySet == Set("a", "b", "d"))
    assert(got("a") == ((4L, 2.0, 3.0, Some(1.0))))
    assert(got("b") == ((3L, 0.0, 4.0, None)))
    assert(got("d") == ((2L, 1.0, 0.0, Some(1.0))))
  }

  test("groupedGini: known distributions, null for all-zero, loud on negatives") {
    val df = Seq(
      // perfect equality → G = 0
      ("eq", 5.0), ("eq", 5.0), ("eq", 5.0), ("eq", 5.0),
      // one holder of everything, n=4 → G = (n-1)/n = 0.75
      ("conc", 0.0), ("conc", 0.0), ("conc", 0.0), ("conc", 8.0),
      // all zeros → undefined → NULL
      ("zero", 0.0), ("zero", 0.0)
    ).toDF("g", "x")
    val got = Stats.groupedGini(df, "g", "x")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2))))).toMap
    assert(got("eq") == ((4L, Some(0.0))))
    assert(got("conc") == ((4L, Some(0.75))))
    assert(got("zero") == ((2L, None)))
    val neg = intercept[Exception] {
      Stats.groupedGini(Seq(("a", -1.0)).toDF("g", "x"), "g", "x")
        .collect()
    }
    assert(neg.getMessage != null)
  }

  test("groupedGini: tie-order invariance and repartition invariance") {
    // heavy ties: Σi·x(i) must not depend on how ties rank
    val base = (1 to 300).map(i => ("g", (i % 5).toDouble + 1))
    val a = Stats.groupedGini(base.toDF("g", "x"), "g", "x")
    val b = Stats.groupedGini(
      base.reverse.toDF("g", "x").repartition(7), "g", "x")
    assert(rowsOf(a) == rowsOf(b))
  }

  test("groupedRegression: reproducible under repartitioning") {
    val base = (1 to 500).map(i =>
      (s"g${i % 3}", (i % 37).toDouble, (i % 11).toDouble * 1.5 + i % 7))
    val a = Stats.groupedRegression(base.toDF("g", "x", "y"), "g", "x", "y")
    val b = Stats.groupedRegression(
      base.toDF("g", "x", "y").repartition(7), "g", "x", "y")
    assert(rowsOf(a) == rowsOf(b))
    assert(a.count() == 3)
  }
}
