package graft.operators

import graft.SparkSuite

class LshRecallSpec extends SparkSuite {
  import spark.implicits._

  private def doc(words: Seq[String]): String = words.mkString(" ")

  test("lshRecallReport: identical docs are found, recall accounts the rest") {
    // a/b identical (jaccard 1 → every band collides → always found);
    // c/d share half their shingles (jaccard ≥ 0.5 → a true pair that
    // LSH may or may not catch); e unrelated.
    val base = (1 to 12).map(i => s"w$i")
    val df = Seq(
      (1L, doc(base)),
      (2L, doc(base)),
      (3L, doc(base.take(8) ++ Seq("x1", "x2", "x3", "x4"))),
      (4L, doc(base.take(8) ++ Seq("y1", "y2", "y3", "y4"))),
      (5L, doc((1 to 12).map(i => s"z$i")))
    ).toDF("doc_id", "text")
    val r = Dedup.lshRecallReport(df, "doc_id", "text").collect()(0)
    val (nTrue, nLsh, nMissed) = (r.getLong(0), r.getLong(1), r.getLong(2))
    // truth: at least the identical pair; every LSH pair is true
    assert(nTrue >= 1L)
    assert(nLsh == nTrue - nMissed)
    assert(nMissed >= 0L && nMissed <= nTrue)
    assert(r.getDouble(3) ==
      BigDecimal((nTrue - nMissed).toDouble / nTrue)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    graft.core.OpCache.releaseAll()
  }

  test("lshRecallReport: no near-dups -> zero counts, NULL recall") {
    val df = (1 to 6).map(i =>
      (i.toLong, doc((1 to 10).map(j => s"u${i}_$j")))).toDF("doc_id", "text")
    val r = Dedup.lshRecallReport(df, "doc_id", "text").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((0L, 0L, 0L)))
    assert(r.isNullAt(3))
    graft.core.OpCache.releaseAll()
  }

  test("lshRecallSampled: full-corpus sample reproduces the exhaustive audit") {
    val base = (1 to 12).map(i => s"w$i")
    val df = Seq(
      (1L, doc(base)),
      (2L, doc(base)),
      (3L, doc(base.take(8) ++ Seq("x1", "x2", "x3", "x4"))),
      (4L, doc(base.take(8) ++ Seq("y1", "y2", "y3", "y4"))),
      (5L, doc((1 to 12).map(i => s"z$i")))
    ).toDF("doc_id", "text")
    val full = Dedup.lshRecallReport(df, "doc_id", "text").collect()(0)
    val samp = Dedup.lshRecallSampled(df, "doc_id", "text",
      sampleSize = 100).collect()(0)
    // sample ⊇ corpus → identical counts and estimate
    assert(samp.getLong(0) == 5L) // sample_n = all docs
    assert((samp.getLong(1), samp.getLong(2), samp.getLong(3)) ==
      ((full.getLong(0), full.getLong(1), full.getLong(2))))
    assert(samp.getDouble(4) == full.getDouble(3))
    graft.core.OpCache.releaseAll()
  }

  test("lshRecallSampled: out-of-sample pairs are invisible to both sides") {
    // two identical pairs; a 2-doc sample can see at most one of them
    val a = doc((1 to 12).map(i => s"a$i"))
    val b = doc((1 to 12).map(i => s"b$i"))
    val df = Seq((1L, a), (2L, a), (3L, b), (4L, b)).toDF("doc_id", "text")
    val r = Dedup.lshRecallSampled(df, "doc_id", "text", sampleSize = 2)
      .collect()(0)
    assert(r.getLong(0) == 2L)
    assert(r.getLong(1) <= 1L, "a 2-doc sample holds at most one pair")
    // every sampled LSH pair is jaccard-verified → n_lsh ≤ n_true
    assert(r.getLong(2) <= r.getLong(1))
    graft.core.OpCache.releaseAll()
  }

  test("minhashErrorReport: identical docs estimate exactly 1.0, error 0") {
    val txt = doc((1 to 12).map(i => s"w$i"))
    val near = doc((1 to 11).map(i => s"w$i") :+ "x9")
    val df = Seq((1L, txt), (2L, txt), (3L, near)).toDF("doc_id", "text")
    val got = Dedup.minhashErrorReport(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    graft.core.OpCache.releaseAll()
    // the exact-duplicate pair: jaccard 1, every signature coordinate
    // agrees, error exactly 0
    assert(got((1L, 2L)) == ((1.0, 1.0, 0.0)))
    // every reported estimate is a multiple of 1/16 within [0, 1] and
    // abs_err is consistent with the pair's own columns
    got.values.foreach { case (j, e, err) =>
      assert(e >= 0.0 && e <= 1.0 && (e * 16).round == e * 16)
      assert(math.abs(err - math.abs(e - j)) < 2e-6, s"$j $e $err")
    }
  }
}
