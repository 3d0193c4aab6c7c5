package graft.operators

import graft.SparkSuite

class BpeSpec extends SparkSuite {
  import spark.implicits._

  // the classic Sennrich corpus: low×3 lower×2 newest×4 widest×1
  private val docs = Seq(
    (1L, "low low low lower lower"),
    (2L, "newest newest newest newest widest")
  ).toDF("doc_id", "text")

  test("trainBpe learns the hand-computed merge sequence with exact tie-breaks") {
    val model = Bpe.trainBpe(docs, "doc_id", "text", rounds = 3)
    val merges = model.merges.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .sortBy(_._1)
    // round 1: (w,e) dominates with 2(lower)+4(newest)=6
    // round 2: (l,o)=5 ties (s,t)=5 — (l,o) wins on left ASC
    // round 3: (s,t)=5
    assert(merges.toSeq == Seq(
      (1L, "w", "e", "we", 6L),
      (2L, "l", "o", "lo", 5L),
      (3L, "s", "t", "st", 5L)), merges.mkString(","))
    // post-merge vocab symbol counts: low=[lo,w] lower=[lo,we,r]
    // newest=[n,e,we,st] widest=[w,i,d,e,st] (round 3's st applies too)
    val vocab = model.vocab.collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(vocab == Map("low" -> 2L, "lower" -> 3L, "newest" -> 4L, "widest" -> 5L),
      vocab.toString)
    graft.core.OpCache.releaseAll(blocking = true)
  }

  test("bpeTokenCounts sums learned lengths per document; invariant under partitioning") {
    val model = Bpe.trainBpe(docs, "doc_id", "text", rounds = 3)
    val counts = Bpe.bpeTokenCounts(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc1 = 3·|low| + 2·|lower| = 3·2+2·3 = 12; doc2 = 4·4+1·5 = 21
    assert(counts == Map(1L -> 12L, 2L -> 21L), counts.toString)
    graft.core.OpCache.releaseAll(blocking = true)
    val model2 = Bpe.trainBpe(docs.repartition(7), "doc_id", "text", rounds = 3)
    val re = Bpe.bpeTokenCounts(docs, "doc_id", "text", model2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(re == counts)
    // more rounds than useful merges is safe: rounds beyond pair
    // exhaustion keep merging the next-best pair until none remain
    val deep = Bpe.trainBpe(Seq((1L, "ab ab")).toDF("doc_id", "text"),
      "doc_id", "text", rounds = 2)
    assert(deep.merges.count() >= 1)
    graft.core.OpCache.releaseAll(blocking = true)
  }
}
