package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions.col

class DsirSpec extends SparkSuite {
  import spark.implicits._

  // target = feline corpus; the raw pool mixes cat-like and finance docs
  private val docs = Seq(
    (0L, "t", "the cat sat on the mat"),
    (1L, "t", "a cat and a kitten purr"),
    (2L, "t", "the kitten chased the cat"),
    (10L, "r", "the cat purred on the mat"),
    (11L, "r", "a kitten sat with the cat"),
    (12L, "r", "quarterly revenue grew four percent"),
    (13L, "r", "the board approved the merger"),
    (14L, "r", "bond yields fell on friday")
  ).toDF("doc_id", "pool", "text")

  test("cat-like raw docs outscore finance docs under a feline target") {
    val got = Curation.importanceResample(docs, "doc_id", "text",
        col("pool") === "t", buckets = 256, keep = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // only raw-pool docs are scored
    assert(got.keySet == Set(10L, 11L, 12L, 13L, 14L))
    val catMin = Seq(10L, 11L).map(got).min
    val finMax = Seq(12L, 13L, 14L).map(got).max
    assert(catMin > finMax,
      s"cat docs $catMin should outrank finance docs $finMax")
  }

  test("keep cuts by (score DESC, doc_id) and never returns target docs") {
    val top = Curation.importanceResample(docs, "doc_id", "text",
        col("pool") === "t", buckets = 256, keep = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(top.length == 2)
    assert(top.map(_._1).toSet.subsetOf(Set(10L, 11L, 12L, 13L, 14L)))
    // the two cat-like docs are the top-2
    assert(top.map(_._1).toSet == Set(10L, 11L))
  }

  test("single-token and null docs survive the bigram guard") {
    val tiny = Seq(
      (0L, "t", "cat"), (1L, "r", "cat"),
      (2L, "r", null.asInstanceOf[String])
    ).toDF("doc_id", "pool", "text")
    val got = Curation.importanceResample(tiny, "doc_id", "text",
        col("pool") === "t", buckets = 64, keep = 10)
      .collect().map(r => r.getLong(0)).toSet
    assert(got == Set(1L, 2L)) // both raw docs scored, no crash
  }

  test("deterministic across runs and partitionings") {
    val a = rowsOf(Curation.importanceResample(docs, "doc_id", "text",
      col("pool") === "t", buckets = 256, keep = 5))
    val b = rowsOf(Curation.importanceResample(docs.repartition(7), "doc_id",
      "text", col("pool") === "t", buckets = 256, keep = 5))
    assert(a == b)
  }
}
