package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

class DedupSpec extends SparkSuite {
  import spark.implicits._

  test("wordShingles builds distinct n-grams in order") {
    val df = Seq("a b c d b c d").toDF("t")
      .select(Dedup.wordShingles(split($"t", " "), 3).as("sh"))
    val sh = df.collect()(0).getSeq[String](0)
    assert(sh == Seq("a b c", "b c d", "c d b", "d b c"))
  }

  test("exactDupGroups groups identical content with min-id representative") {
    val docs = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val groups = Dedup.exactDupGroups(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(groups == Set((1L, 2L), (3L, 1L)))
  }

  test("lshNearDupPairs finds a planted near-duplicate and skips unrelated docs") {
    val base = (0 until 60).map(i => s"w${i % 13} t$i").mkString(" ")
    val nearDup = base.replace("t7", "t999") // tiny edit
    val other = (0 until 60).map(i => s"z$i q${i * 3}").mkString(" ")
    val docs = Seq((1L, base), (2L, nearDup), (3L, other)).toDF("doc_id", "text")
    val pairs = Dedup.lshNearDupPairs(docs, "doc_id", "text",
      nShingle = 3, k = 16, bands = 4, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("simhash: identical texts agree, near texts close in hamming, different far") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),
      (3L, "one two three four five six seven eight"))
      .toDF("doc_id", "text")
    val sig = Dedup.withSimhash(docs, "text", "sh")
      .select($"doc_id", $"sh").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sig(1L), sig(2L)) < ham(sig(1L), sig(3L)))
  }

  test("blockedJaccardPairs respects lang blocking and threshold") {
    val t1 = (0 until 40).map(i => s"w$i").mkString(" ")
    val t2 = (0 until 40).map(i => if (i == 5) "X" else s"w$i").mkString(" ")
    val docs = Seq(
      (1L, t1, "en", t1.length.toLong),
      (2L, t2, "en", t2.length.toLong),
      (3L, t1, "fr", t1.length.toLong)) // same text, different lang: blocked
      .toDF("doc_id", "text", "lang", "n_chars")
    val pairs = Dedup.blockedJaccardPairs(docs, "doc_id", "text", "lang", "n_chars",
      bucketWidth = 100, nShingle = 3, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("mega-bucket cap bounds pair emission for a 1000-member near-dup cluster") {
    // 1000 identical docs: every member lands in the same LSH bucket in
    // every band. Uncapped, that emits C(1000,2) = 499500 pairs from one
    // reducer; with the cap only the `cap` lowest ids per bucket pair up.
    val base = (0 until 60).map(i => s"w${i % 13} t$i").mkString(" ")
    val cluster = (1L to 1000L).map(i => (i, base))
    val docs = cluster.toDF("doc_id", "text")

    val lshPairs = Dedup.lshNearDupPairs(docs, "doc_id", "text",
      nShingle = 3, k = 16, bands = 4, threshold = 0.5, maxBucketSize = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(lshPairs.length == 50 * 49 / 2)
    assert(lshPairs.forall { case (a, b) => a <= 50 && b <= 50 })

    val shPairs = Dedup.simhashNearDupPairs(docs, "doc_id", "text",
      maxHamming = 8, nShingle = 3, maxBucketSize = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(shPairs.length == 50 * 49 / 2)
    assert(shPairs.forall { case (a, b) => a <= 50 && b <= 50 })
  }

  test("bucket cap leaves small buckets untouched (same pairs as uncapped)") {
    val base = (0 until 60).map(i => s"w${i % 13} t$i").mkString(" ")
    val nearDup = base.replace("t7", "t999")
    val other = (0 until 60).map(i => s"z$i q${i * 3}").mkString(" ")
    val docs = Seq((1L, base), (2L, nearDup), (3L, other)).toDF("doc_id", "text")
    def run(cap: Int) = Dedup.lshNearDupPairs(docs, "doc_id", "text",
      nShingle = 3, k = 16, bands = 4, threshold = 0.5, maxBucketSize = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(Dedup.DefaultMaxBucketSize) == run(1000000))
  }

  test("dedupCorpus: exact dups collapse, near-dups drop, short docs survive") {
    val base = (0 until 60).map(i => s"w${i % 13} t$i").mkString(" ")
    val nearDup = base.replace("t7", "t999")
    val other = (0 until 60).map(i => s"z$i q${i * 3}").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base),      // exact dup of 1 → collapsed, rep = 1
      (3L, nearDup),   // near-dup of 1 → dropped (higher id)
      (4L, other),     // unrelated → kept
      (5L, "hi"))      // < nShingle words → never enters LSH, kept
      .toDF("doc_id", "text")
    val kept = Dedup.dedupCorpus(docs, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L, 5L))
  }

  test("minhashSignature matches the explode-aggregate construction") {
    // library API (expression form) must agree with the query-path math
    val df = Seq("a b c d e f g").toDF("t")
      .select(Dedup.wordShingles(split($"t", " "), 3).as("sh"))
      .select(Dedup.minhashSignature($"sh", 4).as("sig"))
    val sig = df.collect()(0).getSeq[Long](0)
    assert(sig.length == 4)
    assert(sig.forall(v => v >= 0 && v < Dedup.MinhashP))
  }

  test("connectedComponents labels clusters, chains, and singletons") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), // triangle-ish cluster via 1-2-3
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L), // a chain
      (20L, 20L) // singleton via self-edge
    ).toDF("a", "b")
    val got = Dedup.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 14L -> 10L,
      20L -> 20L))
  }

  test("corpusClusters unites exact copies and near-dups transitively") {
    val base = (0 until 50).map(i => s"word$i").mkString(" ")
    val near = base.replace("word49", "changed") // jaccard ≈ 0.96
    val docs = Seq(
      (1L, base), (2L, base), // exact copies of each other
      (3L, near), // near-dup of the rep -> same cluster transitively
      (4L, "completely different content that shares nothing at all " +
        "with anything else in this tiny corpus of documents"),
      (5L, "short text")
    ).toDF("doc_id", "text")
    val got = Dedup.corpusClusters(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L)
    assert(got(4L) == 4L && got(5L) == 5L)
    assert(got.size == 5)
  }

  test("incrementalDedup admits only genuinely new batch documents") {
    val base = (0 until 50).map(i => s"word$i").mkString(" ")
    val corpus = Seq(
      (1L, base),
      (2L, "existing corpus content that is entirely unrelated to the rest")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, base), // exact dup of corpus -> dropped
      (11L, base.replace("word49", "changed")), // near-dup of corpus -> dropped
      (12L, "fresh content one " + (50 until 90).map(i => s"w$i").mkString(" ")),
      (13L, "fresh content one " + (50 until 90).map(i => s"w$i").mkString(" ")), // exact dup of 12 -> dropped
      (14L, "another genuinely novel document with its own words entirely")
    ).toDF("doc_id", "text")
    val kept = Dedup.incrementalDedup(corpus, batch, "doc_id", "text")
      .as[Long].collect().toSet
    assert(kept == Set(12L, 14L))
  }

  test("incrementalDedup over a storage round-tripped index matches inline") {
    val base = (0 until 50).map(i => s"word$i").mkString(" ")
    val corpus = Seq((1L, base),
      (2L, "existing corpus content that is entirely unrelated here"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, base),
      (11L, base.replace("word49", "changed")),
      (12L, "fresh content " + (50 until 90).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_corpus_index").toString
    Dedup.writeCorpusIndex(
      Dedup.buildCorpusIndex(corpus, "doc_id", "text"), dir)
    val viaIndex = Dedup.incrementalDedupWithIndex(
        Dedup.readCorpusIndex(spark, dir), batch, "doc_id", "text")
      .as[Long].collect().toSet
    val inline = Dedup.incrementalDedup(corpus, batch, "doc_id", "text")
      .as[Long].collect().toSet
    assert(viaIndex == inline && viaIndex == Set(12L))
  }

  test("connectedComponents collapses a long chain within the iteration cap") {
    // a 64-node path has diameter 63; pointer jumping must converge in
    // far fewer rounds than the plain-propagation bound
    val edges = (0L until 63L).map(i => (i, i + 1)).toDF("a", "b")
    val got = Dedup.connectedComponents(edges, "a", "b", maxIter = 10)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 64 && got.values.forall(_ == 0L))
  }

  test("star-contraction components agree with label propagation") {
    // chains, cliques, a star, singletons, shared-node merges — both
    // algorithms must produce the identical (node, component-min) map
    val fixtures = Seq(
      (0L until 20L).map(i => (i, i + 1)), // one path
      Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (20L, 20L)), // cycle + pair + self
      for (i <- 30L until 36L; j <- (i + 1) to 36L) yield (i, j), // clique
      Seq((100L, 1L), (100L, 2L), (100L, 3L), (200L, 201L)), // star + pair
      Seq((5L, 9L), (9L, 2L), (7L, 7L), (3L, 8L), (8L, 1L), (1L, 3L)))
    fixtures.foreach { fx =>
      val edges = fx.toDF("a", "b")
      val viaProp = Dedup.connectedComponents(edges, "a", "b")
        .as[(Long, Long)].collect().toMap
      val viaStars = Dedup.connectedComponentsStars(edges, "a", "b")
        .as[(Long, Long)].collect().toMap
      assert(viaStars == viaProp, s"fixture $fx")
    }
  }

  test("star contraction collapses a long chain too") {
    val edges = (0L until 63L).map(i => (i, i + 1)).toDF("a", "b")
    val got = Dedup.connectedComponentsStars(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got.size == 64 && got.values.forall(_ == 0L))
  }

  test("winnowingContamination: ordered run triggers, bag paraphrase does not") {
    val bench = Seq((100L, "m n p q r s t u o w")).toDF("doc_id", "text")
    val corpus = Seq(
      // contains the benchmark's ordered run "p q r s t u"
      (1L, "a b c p q r s t u x y z"),
      // same WORDS as the run but reordered — no shared ordered window
      (2L, "a b c u t s r q p x y z"),
      (3L, "one two three four five six seven")
    ).toDF("doc_id", "text")
    val got = Dedup.winnowingContamination(corpus, bench, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) >= 1L, s"ordered run must share a fingerprint: $got")
    assert(got(2L) == 0L, s"reordered bag must NOT trigger: $got")
    assert(got(3L) == 0L && got.size == 3)
    graft.core.OpCache.releaseAll(blocking = true)
  }

  test("winnowing: shared 6-word run guarantees a shared fingerprint") {
    // docs 1 and 2 share the contiguous run "p q r s t u" (6 words =
    // window + n − 1) embedded in different surroundings; doc 3 shares
    // nothing. With minShared = 1 the run must surface pair (1,2) only.
    val docs = Seq(
      (1L, "a b c p q r s t u x y z"),
      (2L, "m n p q r s t u o w k j"),
      (3L, "one two three four five six seven eight")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowingPairs(docs, "doc_id", "text",
      n = 3, window = 4, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
    // density: fingerprints ≤ windows, and far fewer than grams
    val fps = Dedup.winnowingFingerprints(docs, "doc_id", "text", 3, 4)
    val byDoc = fps.groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1: 12 words → 10 grams → 7 windows → ≤ 7 distinct minima
    assert(byDoc(1L) <= 7)
    // short doc below window + n − 1 words yields no fingerprints
    val tiny = Seq((9L, "a b c d e")).toDF("doc_id", "text")
    assert(Dedup.winnowingFingerprints(tiny, "doc_id", "text", 3, 4).count() == 0)
    graft.core.OpCache.releaseAll(blocking = true)
  }

  test("editDistanceNearDup: blocking union, length band, exact verify") {
    import spark.implicits._
    val df = Seq(
      (1L, "red widget"),   // base
      (2L, "red widgets"),  // +1 char, k1 collides -> dist 1
      (3L, "xed widget"),   // first char edited: k1 differs, k2 catches -> dist 1
      (4L, "blu widget"),   // k2 collides but dist 3 > 2 -> verified away
      (5L, "xed widgex"),   // both endpoints edited vs 1: no block collides
      (6L, "red widget")    // exact duplicate of 1 -> dist 0, emitted ONCE
    ).toDF("id", "name")
    val got = Dedup.editDistanceNearDup(df, "id", "name", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.get((1L, 2L)).contains(1L), s"suffix edit: $got")
    assert(got.get((1L, 3L)).contains(1L), "prefix edit must be caught by the last-token pass")
    assert(!got.contains((1L, 4L)), "distance 3 must not survive verification")
    assert(!got.contains((1L, 5L)), "both endpoints edited: documented blocking miss")
    assert(got.get((1L, 6L)).contains(0L), "exact dup, exactly one row despite colliding in both passes")
    // each surviving pair appears exactly once (map building would hide dups; re-check raw)
    val raw = Dedup.editDistanceNearDup(df, "id", "name", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(raw.length == raw.distinct.length)
    graft.core.OpCache.releaseAll(blocking = true)
  }

  test("prefixJaccardPairs is lossless vs the all-pairs definition") {
    // adversarial corpus: exact dups, boundary-similarity pairs, docs
    // dominated by one hot shingle run (the case qd04's df-cut drops),
    // and unrelated docs
    val hot = (0 until 20).map(_ => "the quick brown").mkString(" ")
    val docs = Seq(
      (1L, "a b c d e f g h i j k l"),
      (2L, "a b c d e f g h i j k l"),          // exact dup of 1
      (3L, "a b c d e f g h i j zz yy"),        // high overlap with 1
      (4L, s"$hot extra tokens here"),          // hot-shingle heavy
      (5L, s"$hot extra tokens there"),         // near-dup of 4 via hot run
      (6L, "totally different words only here now yes"),
      (7L, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11 x12")
    ).toDF("doc_id", "text")
    for (t <- Seq(0.3, 0.5, 0.8, 1.0)) {
      val got = Dedup.prefixJaccardPairs(docs, "doc_id", "text", threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // brute force over the same hashed shingle sets
      val sets = docs
        .select($"doc_id", Dedup.wordShingles(split($"text", " "), 3).as("sh"))
        .select($"doc_id", transform($"sh", s => Dedup.hash60(s)).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet)
      val expect = (for {
        (ai, as) <- sets; (bi, bs) <- sets if ai < bi
        inter = (as & bs).size
        j = inter.toDouble / (as.size + bs.size - inter).toDouble
        if j >= t
      } yield (ai, bi, j)).toSet
      assert(got === expect, s"threshold $t")
    }
    graft.core.OpCache.releaseAll(blocking = true)
  }

  test("sortedNeighborhoodPairs: prefix pass catches tail edits, reversed pass head edits") {
    val body = (0 until 40).map(i => s"w${i % 11} t$i").mkString(" ")
    val tailEdit = body.replace("t39", "t999")   // same prefix → adjacent in pass 1
    val headEdit = body.replace("t0", "t888")    // same suffix → adjacent in pass 2
    val far = (0 until 40).map(i => s"z$i q${i * 7}").mkString(" ")
    val docs = Seq((1L, body), (2L, tailEdit), (3L, headEdit), (4L, far))
      .toDF("doc_id", "text")
    val pairs = Dedup.sortedNeighborhoodPairs(docs, "doc_id", "text",
      Dedup.snmDefaultKeys("text"), window = 2, nShingle = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // window=2 pairs only immediate sort successors: (1,2) are adjacent
    // under the text-prefix key, (1,3) under the reversed-word key;
    // (2,3) is adjacent under neither — the documented SNM trade
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    graft.core.OpCache.releaseAll(blocking = true)
  }

  test("containmentPairs finds subset-duplication that jaccard structurally misses") {
    // doc 2 = doc 1's 20 words verbatim inside 100 words of noise:
    // jaccard ≈ 18/(98+18-18) ≈ 0.18 — below any useful symmetric
    // threshold — but containment(1 ⊆ 2) = 1.0
    val small = (0 until 20).map(i => s"w$i").mkString(" ")
    val big = ((100 until 180).map(i => s"n$i") :+ small).mkString(" ")
    val other = (0 until 40).map(i => s"z$i").mkString(" ")
    val docs = Seq((1L, small), (2L, big), (3L, other)).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 2L, 1.0)), got.mkString(","))
    // and the symmetric PPJoin at 0.4 cannot see the pair
    assert(Dedup.prefixJaccardPairs(docs, "doc_id", "text", threshold = 0.4)
      .count() == 0)
    // lossless vs brute force across thresholds (both directions)
    for (t <- Seq(0.3, 0.6, 1.0)) {
      val gotT = Dedup.containmentPairs(docs, "doc_id", "text", threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sets = docs
        .select($"doc_id", Dedup.wordShingles(split($"text", " "), 3).as("sh"))
        .select($"doc_id", transform($"sh", s => Dedup.hash60(s)).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet)
      val expect = (for {
        (ai, as) <- sets; (bi, bs) <- sets if ai != bi
        if (as & bs).size.toDouble / as.size.toDouble >= t
      } yield (ai, bi)).toSet
      assert(gotT === expect, s"threshold $t")
    }
    graft.core.OpCache.releaseAll(blocking = true)
  }

  test("duplicationScore: basis points exact, short docs absent, pristine doc keeps 10000") {
    val docs = Seq(
      (1L, "a b c d"),        // shingles {a b c, b c d} — both shared with 2
      (2L, "a b c d e"),      // {a b c, b c d, c d e} — 2 of 3 shared
      (3L, "x y z w"),        // {x y z, y z w} — unique
      (4L, "too short"))      // < 3 words → absent
      .toDF("doc_id", "text")
    val got = Dedup.duplicationScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) == ((2L, 2L, 10000L, 5000L)))            // fully duplicated
    assert(got(2L) == ((3L, 2L, 6666L, 6667L)))             // floor(20000/3)
    assert(got(3L) == ((2L, 0L, 0L, 10000L)))               // pristine
  }

  test("clusterSizeHistogram summarizes the label table") {
    val labels = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L),   // one cluster of 3
      (4L, 4L), (5L, 4L),             // one of 2
      (6L, 6L), (7L, 7L), (8L, 8L))   // three singletons
      .toDF("node", "component")
    val got = Dedup.clusterSizeHistogram(labels)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(3L -> 1L, 2L -> 1L, 1L -> 3L), got.toString)
  }

  test("sketchContainmentPairs: exact for small docs, estimates match brute sketch definition") {
    // doc 1 (20 words → 18 shingles > 16: true sketch) inside doc 2;
    // doc 3 disjoint; doc 4 (6 words → 4 shingles ≤ 16: whole set,
    // estimate must be EXACT containment)
    val small = (0 until 20).map(i => s"w$i").mkString(" ")
    val big = ((100 until 180).map(i => s"n$i") :+ small).mkString(" ")
    val tiny = (0 until 6).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, small), (2L, big), (3L, (0 until 40).map(i => s"z$i").mkString(" ")),
      (4L, tiny)).toDF("doc_id", "text")
    val got = Dedup.sketchContainmentPairs(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // 1 ⊆ 2 fully: every sketch hash of 1 is in 2 → estimate 1.0
    assert(got((1L, 2L)) == 1.0)
    // 4's 4 shingles are all in 1 (and in 2) → exact 1.0
    assert(got((4L, 1L)) == 1.0 && got((4L, 2L)) == 1.0)
    // brute replay of the sketch definition over all pairs
    val sets = docs
      .filter(size(split($"text", " ")) >= 3)
      .select($"doc_id", array_distinct(
        transform(Dedup.wordShingles(split($"text", " "), 3),
          s => Dedup.hash60(s))).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val expect = (for {
      (ai, as) <- sets.toSeq; (bi, bs) <- sets.toSeq if ai != bi
      sk = as.toSet.toSeq.sorted.take(16)
      est = sk.count(bs.toSet).toDouble / sk.size
      if est >= 0.5
    } yield (ai, bi) -> est).toMap
    assert(got == expect, s"got $got expect $expect")
    // partitioning-invariant
    val re = Dedup.sketchContainmentPairs(docs.repartition(5), "doc_id", "text",
      threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(re == got)
    graft.core.OpCache.releaseAll(blocking = true)
  }

  test("segmentDedupRewrite: keep-first rewrite, partial tail segments, emptied docs") {
    // segWords=2 → doc 1: [a b][c d][e f]; doc 2 repeats [a b] and [e f]
    // and contributes one new segment + a 1-word tail; doc 3 is entirely
    // segments already seen → must survive with empty text.
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b x y e f z"),
      (3L, "c d a b"))
      .toDF("doc_id", "text")
    val out = Dedup.segmentDedupRewrite(docs, "doc_id", "text", segWords = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(out === Set(
      (1L, "a b c d e f", 3L, 0L),
      (2L, "x y z", 2L, 2L),      // [a b] and [e f] seen in doc 1; tail "z" kept
      (3L, "", 0L, 2L)))          // both segments first occurred earlier
    // keep-first is ordered by (doc_id, seg_idx), not input order: the
    // duplicate inside one doc drops its LATER copy
    val selfDup = Seq((7L, "p q r s p q")).toDF("doc_id", "text")
    val out2 = Dedup.segmentDedupRewrite(selfDup, "doc_id", "text", segWords = 2)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(out2 === Set(("p q r s", 2L, 1L)))
    // null text = empty string; the doc is never silently dropped
    val withNull = Seq((8L, Some("x y")), (9L, None))
      .toDF("doc_id", "text")
    val out3 = Dedup.segmentDedupRewrite(withNull, "doc_id", "text", segWords = 2)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out3 === Map(8L -> "x y", 9L -> ""))
    graft.core.OpCache.releaseAll(blocking = true)
  }

  test("incrementalComponents: touched components merge, untouched pass through") {
    import spark.implicits._
    // stored state: {1,2,3}→1, {5,6}→5, {8}→8
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L), (8L, 8L))
      .toDF("node", "component")
    // batch {10, 11, 12}; edges: 3↔10 (merges comp 1 with 10),
    // 10↔11 (chains the batch); 12 isolated
    val newEdges = Seq((3L, 10L), (10L, 11L)).toDF("a_id", "b_id")
    val newNodes = Seq(10L, 11L, 12L).toDF("node")
    val got = Dedup.incrementalComponents(labels, newEdges, newNodes)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 1L, 11L -> 1L, // merged
      5L -> 5L, 6L -> 5L, 8L -> 8L,                       // untouched
      12L -> 12L))                                        // new singleton
    // a batch edge can also merge two PREVIOUSLY SEPARATE components
    val bridge = Seq((2L, 20L), (20L, 6L)).toDF("a_id", "b_id")
    val got2 = Dedup.incrementalComponents(labels, bridge,
      Seq(20L).toDF("node"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 1L, 6L -> 1L, 20L -> 1L,
      8L -> 8L))
    graft.core.OpCache.releaseAll(blocking = true)
  }

  test("incrementalComponents is idempotent under re-delivery") {
    import spark.implicits._
    val labels = Seq((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L), (8L, 8L))
      .toDF("node", "component")
    val edges = Seq((2L, 10L)).toDF("a_id", "b_id")
    // 8 is re-delivered with NO incident edge (e.g. a shingle-less
    // short doc): its untouched stored label must win over the
    // self-edge solve, with no duplicate row
    val nodes = Seq(10L, 8L).toDF("node")
    val once = Dedup.incrementalComponents(labels, edges, nodes)
    val first = once.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(first === Map(1L -> 1L, 2L -> 1L, 10L -> 1L,
      5L -> 5L, 6L -> 5L, 8L -> 8L))
    assert(once.count() == 6) // no duplicated node rows
    val twice = Dedup.incrementalComponents(once, edges, nodes)
    assert(twice.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      === first)
    assert(twice.count() == 6)
    graft.core.OpCache.releaseAll(blocking = true)
  }

  test("incrementalComponents equals full re-clustering on a random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val n = 120
    val oldEdges = (1 to 150).map(_ =>
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
    val newE = (1 to 40).map(_ =>
      (rnd.nextInt(n).toLong, (n + rnd.nextInt(30)).toLong))
    val allNodes = (0 until n).map(_.toLong)
    val batchNodes = (n until n + 30).map(_.toLong)
    val oldDf = oldEdges.toDF("a_id", "b_id")
      .unionByName(allNodes.map(i => (i, i)).toDF("a_id", "b_id"))
    val labels = Dedup.connectedComponents(oldDf, "a_id", "b_id")
    val inc = Dedup.incrementalComponents(labels,
      newE.toDF("a_id", "b_id"), batchNodes.toDF("node"))
    val full = Dedup.connectedComponents(
      oldDf.unionByName(newE.toDF("a_id", "b_id"))
        .unionByName(batchNodes.map(i => (i, i)).toDF("a_id", "b_id")),
      "a_id", "b_id")
    assert(rowsOf(inc) == rowsOf(full.select($"node", $"component")))
    graft.core.OpCache.releaseAll(blocking = true)
  }

  test("linkCorpora links near-identical rows across tables, oriented left-right") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val left = Seq(
      (1L, base),
      (2L, "completely unrelated left content about maritime law and tariffs"),
      (3L, base + " tail")).toDF("doc_id", "text")
    val right = Seq(
      (10L, base), // exact text of left 1 / near-dup of left 3
      (11L, "different right content on astronomy orbital mechanics and tides"))
      .toDF("doc_id", "text")
    val links = Dedup.linkCorpora(left, right, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(links.contains((1L, 10L)))
    assert(links.contains((3L, 10L))) // near-dup crosses too
    assert(links.forall { case (a, b) => Set(1L, 2L, 3L)(a) && Set(10L, 11L)(b) })
    assert(!links.exists(_._1 == 2L) && !links.exists(_._2 == 11L))
    graft.core.OpCache.releaseAll(blocking = true)
  }

  test("linkCorpora tolerates id overlap between sides (ids are side-namespaced)") {
    val txt = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val left = Seq((7L, txt)).toDF("doc_id", "text")
    val right = Seq((7L, txt)).toDF("doc_id", "text")
    val links = Dedup.linkCorpora(left, right, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(links.toSeq == Seq((7L, 7L)))
    graft.core.OpCache.releaseAll(blocking = true)
  }

  test("bestRepresentatives: highest score wins the cluster, not lowest id") {
    import org.apache.spark.sql.functions.{coalesce => cl, _}
    // docs 1/2 are exact duplicates with a repeated tail word (ttr
    // 10/11); doc 3 shares all but the final shingle and has no
    // repeat (ttr 1.0 — the higher-quality copy). 8 of 10 distinct
    // shingles shared → jaccard 0.8, well over the 0.5 verify bar.
    val dup = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w10"
    val clean = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11"
    val df = Seq(
      (1L, dup), (2L, dup), (3L, clean),
      (9L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11")
    ).toDF("doc_id", "text")
    val t = split(cl(col("text"), lit("")), " ")
    val score = size(array_distinct(t)).cast("double") / size(t).cast("double")
    val got = Dedup.bestRepresentatives(df, "doc_id", "text", score)
      .collect().map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    graft.core.OpCache.releaseAll(blocking = true)
    // one 3-doc cluster keeping doc 3 (ttr 1.0 beats 10/11, despite
    // the larger id) and one singleton keeping itself
    assert(got.values.toSet == Set((3L, 3L), (9L, 1L)),
      got.mkString(","))
  }

  test("batchNearDupStarEdges: label-identical to raw pairs, linear edges") {
    // corpus of two near-dup families; the ingest batch is
    // DUPLICATE-HEAVY: 4 exact copies of a doc near family A, 3 copies
    // of a brand-new text, plus one doc near family B — the shape that
    // makes the raw pair contract quadratic in copy count
    val corpus = Seq(
      (10L, "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10 a11"),
      (11L, "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10 a12"),
      (20L, "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10 b11")
    ).toDF("doc_id", "text")
    val nearA = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10 a13"
    val fresh = "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11"
    val nearB = "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10 b12"
    val batch = Seq(
      (30L, nearA), (31L, nearA), (32L, nearA), (33L, nearA),
      (40L, fresh), (41L, fresh), (42L, fresh),
      (50L, nearB)
    ).toDF("doc_id", "text")
    val built = Dedup.buildCorpusIndex(corpus, "doc_id", "text")
    val labels0 = Dedup.connectedComponents(
      Dedup.pairsFromIndex(built).select($"a_id", $"b_id")
        .unionByName(corpus.select($"doc_id".as("a_id"), $"doc_id".as("b_id"))),
      "a_id", "b_id")
    def solve(edges: org.apache.spark.sql.DataFrame) =
      Dedup.incrementalComponents(labels0, edges,
        batch.select($"doc_id".as("node")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaRaw = solve(
      Dedup.batchNearDupPairs(built, batch, "doc_id", "text"))
    val viaStars = solve(
      Dedup.batchNearDupStarEdges(built, batch, "doc_id", "text"))
    assert(viaStars == viaRaw,
      s"star edges must be label-identical to the raw pair contract:\n$viaStars\n$viaRaw")
    // the fresh 3-copy group must be ONE component keyed by min id 40,
    // and the nearA copies must fold into family A's component (10)
    val m = viaStars.toMap
    assert(m(41L) == 40L && m(42L) == 40L && m(40L) == 40L)
    assert(Seq(30L, 31L, 32L, 33L).forall(m(_) == 10L))
    assert(m(50L) == 20L)
    // edge volume: the raw contract pairs every copy with every other
    // (4-clique + 3-clique fan-out); stars carry one edge per member
    val starEdges = Dedup.batchNearDupStarEdges(
      built, batch, "doc_id", "text").count()
    val rawEdges = Dedup.batchNearDupPairs(
      built, batch, "doc_id", "text").count()
    assert(starEdges < rawEdges,
      s"stars ($starEdges) must undercut the clique fan-out ($rawEdges)")
    graft.core.OpCache.releaseAll(blocking = true)
  }

  test("label store round-trips and feeds the diagnostics unchanged") {
    import org.apache.spark.sql.functions.{coalesce => cl, _}
    val dup = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w10"
    val clean = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11"
    val df = Seq(
      (1L, dup), (2L, dup), (3L, clean),
      (9L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11")
    ).toDF("doc_id", "text")
    val labels = Dedup.corpusClusters(df, "doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_labels_spec").toString
    Dedup.writeLabels(labels, dir)
    val back = Dedup.readLabels(spark, dir)
    val asSet = (d: org.apache.spark.sql.DataFrame) =>
      d.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(asSet(back) == asSet(labels),
      "stored labels must round-trip bit-exactly")
    // diagnostics over the READ-BACK labels equal the inline pipeline
    val t = split(cl(col("text"), lit("")), " ")
    val score = size(array_distinct(t)).cast("double") / size(t).cast("double")
    val viaStore = Dedup.bestRepresentativesFromLabels(back,
        df.select(col("doc_id").as("node"), score.as("score")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val inline = Dedup.bestRepresentatives(df, "doc_id", "text", score)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaStore == inline,
      "representatives from stored labels must equal the inline run")
    val hist = Dedup.clusterSizeHistogram(back)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hist == Set((3L, 1L), (1L, 1L)),
      s"histogram over stored labels: $hist")
    graft.core.OpCache.releaseAll(blocking = true)
  }
}
