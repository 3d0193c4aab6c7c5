package graft.operators

import graft.SparkSuite

class LogitSpec extends SparkSuite {
  import spark.implicits._

  // two planted vocabularies; labels follow the vocabulary exactly
  private val pos = Seq("the", "of", "and", "to", "in", "that", "was")
  private val neg = Seq("der", "und", "das", "ein", "zu", "mit", "von")
  private def doc(words: Seq[String], seed: Int, n: Int): String =
    (0 until n).map(i => words((seed * 31 + i * 7) % words.length))
      .mkString(" ")
  private val docs: Seq[(Long, String, Long)] =
    (0L until 40L).map { id =>
      val isPos = id % 2 == 0
      (id, doc(if (isPos) pos else neg, id.toInt, 30),
        if (isPos) 1L else 0L)
    }

  test("three GD rounds separate the planted vocabularies") {
    val df = docs.toDF("doc_id", "text", "label")
    val out = Logit.trainAndScore(df, "doc_id", "text", "label",
        buckets = 64, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3)))
    assert(out.length == 40)
    val acc = out.count { case (_, y, _, p) => y == p }.toDouble / 40
    assert(acc >= 0.95, s"training accuracy too low: $acc")
    // scores actually separate, not just straddle 0.5
    val posMin = out.filter(_._2 == 1L).map(_._3).min
    val negMax = out.filter(_._2 == 0L).map(_._3).max
    assert(posMin > negMax,
      s"score ranges overlap: pos >= $posMin, neg <= $negMax")
  }

  test("deterministic under repartitioning") {
    val df = docs.toDF("doc_id", "text", "label")
    val a = rowsOf(Logit.trainAndScore(df, "doc_id", "text", "label",
      buckets = 64, rounds = 2))
    val b = rowsOf(Logit.trainAndScore(df.repartition(13), "doc_id", "text",
      "label", buckets = 64, rounds = 2))
    assert(a == b)
    graft.core.OpCache.releaseAll(blocking = true)
  }

  test("single round moves weights off zero (round-1 gradient is the prior)") {
    val df = docs.toDF("doc_id", "text", "label")
    val out = Logit.trainAndScore(df, "doc_id", "text", "label",
        buckets = 64, rounds = 1)
      .collect().map(r => r.getDouble(2))
    assert(out.exists(_ != 0.5)) // scores responded to the data
    graft.core.OpCache.releaseAll(blocking = true)
  }
}
