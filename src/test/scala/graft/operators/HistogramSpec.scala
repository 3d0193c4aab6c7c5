package graft.operators

import graft.SparkSuite

class HistogramSpec extends SparkSuite {
  import spark.implicits._

  test("quantileEstimates: right-edge bound within one bin width of exact") {
    // values 1..1000 in one group: with 100 bins over [1, 1000], width
    // 9.99; exact p50 = 500, estimate = right edge of the bin whose
    // cumulative count reaches 500
    val df = (1 to 1000).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val out = Histogram.quantileEstimates(df, "grp", "v", bins = 100,
      quantiles = Seq("p50" -> 0.5, "p99" -> 0.99))
      .collect()(0)
    assert(out.getLong(1) == 1000L)
    val w = (1000.0 - 1.0) / 100
    val p50 = out.getDouble(2)
    val p99 = out.getDouble(3)
    // upper bound, within one bin width of the exact quantile
    assert(p50 >= 500.0 && p50 <= 500.0 + w + 1e-9, s"p50=$p50")
    assert(p99 >= 990.0 && p99 <= 990.0 + w + 1e-9, s"p99=$p99")
    assert(p99 > p50)
  }

  test("quantileEstimates: per-group cumulative counts stay separate") {
    val df = ((1 to 100).map(i => ("lo", i.toDouble)) ++
      (1 to 100).map(i => ("hi", 1000.0 + i))).toDF("grp", "v")
    val got = Histogram.quantileEstimates(df, "grp", "v", bins = 50,
      quantiles = Seq("p50" -> 0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // groups live at opposite ends of the global range
    assert(got("lo") < 200.0 && got("hi") > 1000.0)
  }

  test("quantileEstimates: degenerate range is refused loudly") {
    val df = Seq(("g", 5.0), ("g", 5.0)).toDF("grp", "v")
    intercept[IllegalArgumentException] {
      Histogram.quantileEstimates(df, "grp", "v", 10, Seq("p50" -> 0.5))
    }
  }

  test("quantileEstimates: nulls excluded from n and bins; empty refused") {
    // nulls must not inflate the count or occupy a bin: with them
    // filtered, 1..100 + 50 nulls estimates like plain 1..100
    val withNulls = ((1 to 100).map(i => ("g", Some(i.toDouble))) ++
      (1 to 50).map(_ => ("g", None: Option[Double]))).toDF("grp", "v")
    val clean = (1 to 100).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val a = Histogram.quantileEstimates(withNulls, "grp", "v", 20, Seq("p50" -> 0.5))
      .collect()(0)
    val b = Histogram.quantileEstimates(clean, "grp", "v", 20, Seq("p50" -> 0.5))
      .collect()(0)
    assert(a.getLong(1) == 100L && a.getLong(1) == b.getLong(1))
    assert(a.getDouble(2) == b.getDouble(2))
    // all-null and empty inputs fail with the explicit message, not an NPE
    val allNull = Seq(("g", None: Option[Double])).toDF("grp", "v")
    val e = intercept[IllegalArgumentException] {
      Histogram.quantileEstimates(allNull, "grp", "v", 10, Seq("p50" -> 0.5))
    }
    assert(e.getMessage.contains("no non-null"))
    val empty = Seq.empty[(String, Double)].toDF("grp", "v")
    intercept[IllegalArgumentException] {
      Histogram.quantileEstimates(empty, "grp", "v", 10, Seq("p50" -> 0.5))
    }
  }
}
