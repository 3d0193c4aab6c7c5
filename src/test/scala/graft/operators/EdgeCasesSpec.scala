package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Empty- and degenerate-input behavior of the round-5 operators: a
  * curation pipeline meets empty partitions, fresh corpora, and
  * batches with nothing to admit as a matter of course — operators
  * must return empty/identity results, not throw. */
class EdgeCasesSpec extends SparkSuite {
  import spark.implicits._

  private val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private val someDocs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2L, "one two three four five six seven eight nine ten eleven"))
    .toDF("doc_id", "text")

  test("dedup operators return empty on an empty corpus") {
    assert(Dedup.exactDupGroups(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.lshNearDupPairs(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.corpusClusters(emptyDocs, "doc_id", "text").count() == 0)
    assert(Overlap.duplicatedSpanStats(emptyDocs, "doc_id", "text").count() == 0)
    assert(QualityRules.repetitionStats(emptyDocs, "doc_id", "text").count() == 0)
  }

  test("incrementalDedup admits everything against an empty corpus") {
    val kept = Dedup.incrementalDedup(emptyDocs, someDocs, "doc_id", "text")
      .as[Long].collect().toSet
    assert(kept == Set(1L, 2L))
  }

  test("incrementalDedup of an empty batch returns empty") {
    assert(Dedup.incrementalDedup(someDocs, emptyDocs, "doc_id", "text")
      .count() == 0)
  }

  test("contaminationHits with an empty benchmark keeps all docs clean") {
    val got = Overlap.contaminationHits(someDocs, emptyDocs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 0L))
  }

  test("asofBackward with an empty right side yields all-null payload") {
    val left = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("k", "ts").withColumn("k", lit("a"))
    val right = Seq.empty[(String, java.sql.Timestamp, Double)]
      .toDF("k", "rts", "v")
    val got = AsofJoin.asofBackward(left, right, "k", "ts", "rts", Seq("v"))
      .select("v").as[Option[Double]].collect()
    assert(got.toSeq == Seq(None))
  }

  test("connectedComponents of an empty edge list is empty") {
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Dedup.connectedComponents(edges, "a", "b").count() == 0)
  }

  test("curate of an empty corpus is empty") {
    val docs = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "lang")
    assert(graft.operators.Curation
      .curate(docs, "doc_id", "text", "lang", Seq("en")).count() == 0)
  }

  test("sequencePack of an empty corpus is empty") {
    assert(Packing.sequencePack(emptyDocs, "doc_id", "text").count() == 0)
  }

  test("trainingPipeline of an empty corpus is empty") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String, String, String)]
      .toDF("doc_id", "text", "lang", "source")
    assert(graft.operators.Curation.trainingPipeline(
      empty, "doc_id", "text", "lang", "source", Seq("en"),
      Map("src0" -> 500), defaultPermille = 100).count() == 0)
  }

  test("round-6 operators: empty and degenerate inputs") {
    // PageRank with no edges: every node keeps the base rank
    val nodes = Seq(1L, 2L).toDF("id")
    val noEdges = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    val pr = GraphRank.pageRank(nodes, "id", noEdges, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr == Map(1L -> 75000000000L, 2L -> 75000000000L))
    // funnel where a later stage matches nothing: zero, not absent
    val ev = Seq((1L, new java.sql.Timestamp(0L), "view"))
      .toDF("user_id", "ts", "event_type")
    val fn = Funnel.funnel(ev, "user_id", "ts",
      Seq("view" -> (col("event_type") === "view"),
        "click" -> (col("event_type") === "click")))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(fn == Map("view" -> 1L, "click" -> 0L))
    // winnowing / rarity on an empty corpus
    assert(Dedup.winnowingPairs(emptyDocs, "doc_id", "text").count() == 0)
    assert(TextAnalysis.rarityScore(emptyDocs, "doc_id", "text").count() == 0)
    // chunk dedup over an empty media frame
    val emptyMedia = Multimodal.asMedia(emptyDocs, "doc_id", "text", "x")
    assert(Multimodal.chunkDedupStats(emptyMedia).count() == 0)
    // snapshot diff of identical frames is empty
    assert(graft.warehouse.Cdc.snapshotDiff(someDocs, someDocs, Seq("doc_id"))
      .count() == 0)
    // CDC apply of an empty feed is empty
    assert(graft.warehouse.Cdc.applyChanges(
      Seq.empty[(Long, Long, String)].toDF("k", "chg", "op"),
      Seq("k"), Seq(col("chg")), col("op") === "delete").count() == 0)
    graft.core.OpCache.releaseAll(blocking = true)
  }

  test("round-7 operators: empty and degenerate inputs") {
    // edit-distance dedup: empty, single-row, and no-pair corpora
    assert(Dedup.editDistanceNearDup(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.editDistanceNearDup(
      Seq((1L, "only row")).toDF("doc_id", "text"), "doc_id", "text")
      .count() == 0)
    // triangle counts: empty edges → all zeros; empty nodes → empty
    val nodes = Seq(1L, 2L).toDF("id")
    val noEdges = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    val tc = GraphRank.triangleCounts(nodes, "id", noEdges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tc == Map(1L -> 0L, 2L -> 0L))
    assert(GraphRank.triangleCounts(
      Seq.empty[Long].toDF("id"), "id", noEdges).count() == 0)
    // gear chunking: empty corpus and sub-window-length payloads
    assert(Multimodal.gearChunkDedupStats(emptyDocs, "doc_id", "text")
      .count() == 0)
    val tiny = Multimodal.gearChunkDedupStats(
      Seq((1L, "abc")).toDF("doc_id", "text"), "doc_id", "text").collect()
    assert(tiny.length == 1 && tiny(0).getLong(1) == 1L) // one whole-doc chunk
    // vocab tokenizer: empty corpus vocab still tokenizes via fallback
    val va = VocabTokenizer.vocabArray(
      VocabTokenizer.buildVocab(emptyDocs, "text"))
    assert(va.length == 95) // printable-ASCII fallback only
    val counted = VocabTokenizer.tokenCounts(someDocs, "doc_id", "text", va)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counted.values.forall(_ > 0))
    // timeseries: empty inputs are empty, not throwing
    val emptyEv = Seq.empty[(Long, java.sql.Timestamp, Double)]
      .toDF("user_id", "ts", "value")
    assert(Timeseries.resampleInterpolateDaily(
      emptyEv, "user_id", "ts", "value").count() == 0)
    assert(Timeseries.zScoreOutliers(
      Seq.empty[(String, Double)].toDF("grp", "value"), "grp", "value")
      .count() == 0)
    // PQ: empty query batch scores nothing; rerank likewise
    val em = Seq((0L, Array.fill(8)(1.0f)), (1L, Array.fill(8)(2.0f)))
      .toDF("vec_id", "embedding")
    val noQ = em.filter(col("vec_id") < 0)
    assert(Similarity.pqTopK(em, noQ, "vec_id", "embedding", k = 2,
      nSub = 4, dim = 8, centroidStride = 1, iters = 0).count() == 0)
    assert(Similarity.scalarQuantRerankTopK(em, noQ,
      "vec_id", "embedding", k = 2).count() == 0)
    graft.core.OpCache.releaseAll(blocking = true)
  }

  test("scalar quantization: empty query batch and empty corpus calibration") {
    val em = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(2.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val noQueries = em.filter(col("vec_id") < 0)
    assert(Similarity.scalarQuantTopK(em, noQueries,
      "vec_id", "embedding", k = 3).count() == 0)
    // calibration of an empty corpus yields an empty scale table (and
    // quantization against it produces no rows rather than throwing)
    val emptyEm = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.sqCalibrate(emptyEm, "embedding").count() == 0)
    graft.core.OpCache.releaseAll(blocking = true)
  }

  test("round-7 session-2 operators handle empty inputs") {
    assert(Dedup.segmentDedupRewrite(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.sortedNeighborhoodPairs(emptyDocs, "doc_id", "text",
      Dedup.snmDefaultKeys("text")).count() == 0)
    assert(Dedup.containmentPairs(emptyDocs, "doc_id", "text").count() == 0)
    val emptyEdges = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    assert(GraphRank.kCore(emptyEdges, k = 2, rounds = 3).count() == 0)
    // LPA with no edges: every node keeps its own label
    val nodes = Seq(1L, 2L).toDF("id")
    val lpa = GraphRank.labelPropagation(nodes, "id", emptyEdges, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lpa == Map(1L -> 1L, 2L -> 2L))
    val emptyEv = Seq.empty[(java.sql.Timestamp, Double)].toDF("ts", "value")
    assert(Timeseries.seasonalDecompose(emptyEv, "ts", "value").count() == 0)
    graft.core.OpCache.releaseAll(blocking = true)
  }

  test("round-7 session-3 operators handle empty inputs") {
    val emptyKeys = Seq.empty[Long].toDF("k")
    // no keys → no estimate rows (the sketch itself is a zero grid)
    assert(Frequency.cmsPointEstimates(emptyKeys, "k", 4, 64).count() == 0)
    // empty sides → exact size 0, every inner product 0
    val r = Frequency.cmsJoinSize(emptyKeys, "k", emptyKeys, "k", 4, 64)
      .collect()(0)
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L)
    assert(TextAnalysis.chunkTokens(emptyDocs, "doc_id", "text", 64, 48)
      .count() == 0)
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkTokens(someDocs, "doc_id", "text",
        chunkSize = 8, stride = 9) // stride > chunkSize would skip tokens
    }
    graft.core.OpCache.releaseAll(blocking = true)
  }

  test("round-7 session-4 operators handle empty inputs") {
    assert(Dedup.sketchContainmentPairs(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.clusterSizeHistogram(
      Seq.empty[(Long, Long)].toDF("node", "component")).count() == 0)
    assert(Curation.clusterAwareSplit(emptyDocs, "doc_id", "text").count() == 0)
    // BPE on an empty corpus: zero merges, empty vocab — not a throw
    val m = Bpe.trainBpe(emptyDocs, "doc_id", "text", rounds = 2)
    assert(m.merges.count() == 0 && m.vocab.count() == 0)
    assert(Bpe.bpeTokenCounts(emptyDocs, "doc_id", "text", m).count() == 0)
    // MMR with an empty query batch / empty corpus
    val emptyEm = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val someEm = Seq((1L, Array(1f, 0f))).toDF("vec_id", "embedding")
    assert(Similarity.mmrTopK(someEm, emptyEm, "vec_id", "embedding",
      candK = 3, k = 2).count() == 0)
    assert(Similarity.mmrTopK(emptyEm, someEm, "vec_id", "embedding",
      candK = 3, k = 2).count() == 0)
    // compaction/GC/refresh planning over empty inventories
    val emptyFiles = Seq.empty[(String, Long, Long)].toDF("grp", "file_id", "bytes")
    assert(graft.storage.Compaction.compactionPlan(
      emptyFiles, "grp", "file_id", "bytes", 100L).count() == 0)
    val emptyMedia = Multimodal.asMedia(emptyDocs, "doc_id", "text", "x")
    assert(Multimodal.chunkOrphans(emptyMedia,
      Seq.empty[Long].toDF("media_id")).count() == 0)
    val emptyDiff = Seq.empty[(Long, String)].toDF("k", "status")
    val emptyKeyed = Seq.empty[(Long, String)].toDF("k", "part")
    assert(graft.warehouse.Cdc.partitionRefreshPlan(
      emptyDiff, emptyKeyed, Seq("k"), Seq("part")).count() == 0)
    graft.core.OpCache.releaseAll(blocking = true)
  }

  test("round-7 session-5 operators handle empty inputs") {
    val emptyKV = Seq.empty[(String, Double, Double)].toDF("g", "x", "y")
    assert(Stats.groupedRegression(emptyKV, "g", "x", "y").count() == 0)
    assert(Stats.groupedGini(emptyKV, "g", "x").count() == 0)
    val emptyEvents = Seq.empty[(Long, Long, java.sql.Timestamp, String)]
      .toDF("event_id", "user_id", "ts", "event_type")
    assert(Funnel.touchAttribution(emptyEvents, "user_id", "ts",
      "event_type", "event_id", "purchase", Seq("view")).count() == 0)
    assert(Funnel.patternOccurrences(emptyEvents, "user_id", "ts",
      "event_type", "event_id", Map("view" -> "V"), "V").count() == 0)
    assert(Timeseries.madOutliers(emptyKV, "g", "x").count() == 0)
    assert(TextAnalysis.sourceDivergence(
      Seq.empty[(String, String)].toDF("source", "text"),
      "source", "text").count() == 0)
    // hashed vectors of an empty corpus are empty; neighbors too
    assert(TextAnalysis.hashedDocVectors(emptyDocs, "doc_id", "text")
      .count() == 0)
    assert(TextAnalysis.hashedNeighbors(emptyDocs, "doc_id", "text",
      lit(true), k = 3).count() == 0)
    // profile of an empty frame: one row per column, zero counts
    val prof = graft.warehouse.Profile.profile(emptyKV).collect()
    assert(prof.length == 3 && prof.forall(_.getLong(1) == 0))
    assert(Multimodal.curateMedia(
      Multimodal.asMedia(emptyDocs, "doc_id", "text", "x")).count() == 0)
    graft.core.OpCache.releaseAll(blocking = true)
  }

  test("round-7 session-6 operators: empty and degenerate inputs") {
    // span rewrite: empty corpus → empty; empty-string doc and a doc
    // shorter than n pass through untouched (one word/row each)
    assert(Overlap.spanDedupRewrite(emptyDocs, "doc_id", "text").count() == 0)
    val weird = Seq((1L, ""), (2L, "just three words")).toDF("doc_id", "text")
    val wr = Overlap.spanDedupRewrite(weird, "doc_id", "text")
      .as[(Long, String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._4))).toMap
    assert(wr(1L) == (("", 0L)) && wr(2L) == (("just three words", 0L)))
    // an intra-doc repeated gram is its own corpus duplicate
    val rep = Seq((1L, "a a a a a a")).toDF("doc_id", "text")
    assert(Overlap.spanDedupRewrite(rep, "doc_id", "text")
      .select("n_removed").as[Long].head() == 6L)
    // write conflicts: one empty feed → every key one-sided
    val feed = Seq((1L, 1L, 1L, "set", 1.0)).toDF("k", "ts", "cid", "typ", "v")
    val emptyFeed = Seq.empty[(Long, Long, Long, String, Double)]
      .toDF("k", "ts", "cid", "typ", "v")
    val wc = graft.warehouse.Cdc.writeConflictAudit(feed, emptyFeed,
        Seq("k"), Seq(col("ts"), col("cid")), col("typ") === "del",
        Seq("typ", "v"))
      .as[(Long, String)].collect().toMap
    assert(wc == Map(1L -> "a_only"))
    // retention: a single-commit log is kept by the rollback window
    val one = Seq((7L, java.sql.Date.valueOf("2024-03-01"))).toDF("v", "t")
    val rp = graft.storage.Retention.retentionPlan(one, "v", "t", 5, 12)
      .collect().head
    assert(rp.getString(2) == "keep" && rp.getString(3) == "last_n")
    // ivfInsert with an empty batch leaves the cells unchanged
    val vecs = (0L until 10L)
      .map(i => (i, Array.tabulate(4)(j => (i + j).toFloat)))
      .toDF("vec_id", "embedding")
    val idx = Similarity.buildIvfIndex(vecs, "vec_id", "embedding", 5)
    val grown = Similarity.ivfInsert(idx,
      vecs.filter(col("vec_id") < 0), "vec_id", "embedding")
    assert(grown.cells.count() == idx.cells.count())
    // graph search with k exceeding the reachable set still returns
    // complete self-free rankings (fewer than k rows per query is fine)
    val tiny = (0L until 4L)
      .map(i => (i, Array.tabulate(3)(j => (i * 3 + j).toFloat)))
      .toDF("vec_id", "embedding")
    val gs = Similarity.graphSearchTopK(tiny, "vec_id", "embedding",
      k = 10, beam = 4, hops = 2, graphK = 2, graphRounds = 1, nSeeds = 2)
      .collect()
    assert(gs.nonEmpty && gs.forall(r => r.getLong(0) != r.getLong(1)))
    graft.core.OpCache.releaseAll(blocking = true)
  }
}
