package graft.operators

import graft.SparkSuite

class EvalSpec extends SparkSuite {
  import spark.implicits._

  test("aucReport: perfect, random, inverted, and tied scorers") {
    // perfect separation → AUC 1.0
    val perfect = Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0))
      .toDF("score", "label")
    val p = Eval.aucReport(perfect, "label", "score").collect()(0)
    assert((p.getLong(0), p.getLong(1), p.getDouble(2)) == ((2L, 2L, 1.0)))

    // inverted scorer → AUC 0.0
    val inv = Seq((0.1, 1), (0.9, 0)).toDF("score", "label")
    assert(Eval.aucReport(inv, "label", "score").collect()(0).getDouble(2) == 0.0)

    // every score tied → AUC exactly 0.5 (the ½·P(=) term)
    val tied = Seq((0.5, 1), (0.5, 1), (0.5, 0), (0.5, 0)).toDF("score", "label")
    assert(Eval.aucReport(tied, "label", "score").collect()(0).getDouble(2) == 0.5)

    // hand-computed mix: pos scores {0.8, 0.4}, neg {0.6, 0.4, 0.2}
    // pairs: (0.8 beats all 3) + (0.4 beats 0.2, ties 0.4, loses 0.6)
    // → (2·3 + 2·1 + 1) / (2·2·3) = 9/12 = 0.75
    val mix = Seq((0.8, 1), (0.4, 1), (0.6, 0), (0.4, 0), (0.2, 0))
      .toDF("score", "label")
    val m = Eval.aucReport(mix, "label", "score").collect()(0)
    assert((m.getLong(0), m.getLong(1), m.getDouble(2)) == ((2L, 3L, 0.75)))
  }

  test("aucReport: single-class input yields NULL auc, not a crash") {
    val onlyPos = Seq((0.9, 1), (0.1, 1)).toDF("score", "label")
    val r = Eval.aucReport(onlyPos, "label", "score").collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 0L && r.isNullAt(2))
  }

  test("aucReport: invariant to bucket count and partitioning") {
    val df = spark.range(0, 1000).selectExpr(
      "cast(pmod(id * 37, 101) as double) / 101.0 as score",
      "cast(id % 3 = 0 as int) as label")
    val expect = Eval.aucReport(df, "label", "score", buckets = 1)
      .collect()(0).getDouble(2)
    for (b <- Seq(4, 16, 64); parts <- Seq(1, 7)) {
      val got = Eval.aucReport(df.repartition(parts), "label", "score", b)
        .collect()(0).getDouble(2)
      assert(got == expect, s"buckets=$b parts=$parts")
    }
  }

  test("aucReport: out-of-range scores clamp into edge buckets correctly") {
    // scores beyond [0,1] must still rank correctly (bucket clamping
    // is monotone, in-bucket order is by raw score)
    val df = Seq((-2.0, 0), (-1.5, 0), (3.0, 1), (5.0, 1)).toDF("score", "label")
    assert(Eval.aucReport(df, "label", "score").collect()(0).getDouble(2) == 1.0)
  }

  test("aucFromScoreGroups: exact past long overflow (P·N > 2⁶³)") {
    // Synthetic score-group counts at full-corpus scale — the subplan
    // from here on is count-driven, so these groups exercise exactly
    // the arithmetic 4B real rows would, without materializing them.
    // All-tied case: P = N = 3.2e9 → 2·AUC·P·N = P·N = 1.024e19 >
    // Long.MaxValue (9.22e18); a long u2 would wrap negative and the
    // reported AUC would be garbage. DECIMAL must give exactly 0.5.
    val big = 3200000000L
    val tied = Seq((0.5, big, big)).toDF("score", "pos", "neg")
    val t = Eval.aucFromScoreGroups(tied, 16).collect()(0)
    assert((t.getLong(0), t.getLong(1), t.getDouble(2)) ==
      ((big, big, 0.5)), s"tied full-corpus AUC: $t")
    // Perfect separation at the same scale: u2 = 2·P·N = 2.048e19,
    // more than 2× past the long edge. Must be exactly 1.0.
    val perfect = Seq((0.9, big, 0L), (0.1, 0L, big))
      .toDF("score", "pos", "neg")
    val p = Eval.aucFromScoreGroups(perfect, 16).collect()(0)
    assert((p.getLong(0), p.getLong(1), p.getDouble(2)) ==
      ((big, big, 1.0)), s"perfect full-corpus AUC: $p")
    // Interleaved case with an exactly-representable expectation:
    // pos {0.8: n, 0.4: n}, neg {0.6: n, 0.2: n} → u2 = n·4n + n·2n =
    // 6n² = 1.536e19 (past the long edge), AUC = 6n²/(2·2n·2n) = 0.75.
    val n = big / 2
    val mixed = Seq((0.8, n, 0L), (0.6, 0L, n), (0.4, n, 0L),
      (0.2, 0L, n)).toDF("score", "pos", "neg")
    val m = Eval.aucFromScoreGroups(mixed, 16).collect()(0)
    assert((m.getLong(0), m.getLong(1), m.getDouble(2)) ==
      ((big, big, 0.75)), s"interleaved full-corpus AUC: $m")
  }

  test("aucReportBy: per-group AUC matches per-group global runs") {
    val df = Seq(
      ("a", 0.9, 1), ("a", 0.8, 1), ("a", 0.2, 0), ("a", 0.1, 0), // perfect
      ("b", 0.1, 1), ("b", 0.9, 0),                               // inverted
      ("c", 0.5, 1), ("c", 0.5, 1)                                // one class
    ).toDF("g", "score", "label")
    val got = Eval.aucReportBy(df, "g", "label", "score")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3))))).toMap
    assert(got("a") == ((2L, 2L, Some(1.0))))
    assert(got("b") == ((1L, 1L, Some(0.0))))
    assert(got("c") == ((2L, 0L, None)))
    // each slice equals a standalone aucReport on that slice
    for (g <- Seq("a", "b")) {
      val solo = Eval.aucReport(df.filter($"g" === g), "label", "score")
        .collect()(0).getDouble(2)
      assert(Some(solo) == got(g)._3.map(_.asInstanceOf[Double]), g)
    }
  }

  test("calibrationBins: bin membership, counts, exact means") {
    val df = Seq(
      (0.05, 0), (0.08, 0),            // bin 0
      (0.55, 1), (0.55, 0),            // bin 5
      (0.95, 1), (1.0, 1)              // bin 9 (1.0 clamps into 9)
    ).toDF("score", "label")
    val got = Eval.calibrationBins(df, "label", "score")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got.keySet == Set(0L, 5L, 9L))
    assert(got(0L) == ((2L, 0L, 0.065, 0.0)))
    assert(got(5L) == ((2L, 1L, 0.55, 0.5)))
    assert(got(9L) == ((2L, 2L, 0.975, 1.0)))
  }
}
