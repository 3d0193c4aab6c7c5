package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

class CorpusOpsSpec extends SparkSuite {
  import spark.implicits._

  test("repetitionStats flags the repeated-phrase document") {
    val docs = Seq(
      // "spam spam" repeated: top 2-gram dominates
      (1L, Seq.fill(20)("spam").mkString(" ")),
      (2L, "the quick brown fox jumps over a lazy dog while many other " +
        "animals watch from the tall grass near an old wooden fence today"),
      // one tripled 3-gram in otherwise unique text
      (3L, "a b c d e f g h a b c a b c")
    ).toDF("doc_id", "text")
    val got = QualityRules.repetitionStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(2), r.getDouble(3), r.getBoolean(4))).toMap
    // doc 1: every 2-gram is "spam spam" (19 of them, 9 chars each)
    assert(got(1L)._1 > 1.0 && !got(1L)._3)
    // doc 2: all 2-grams unique -> top fraction small, kept
    assert(got(2L)._1 < 0.20 && got(2L)._2 == 0.0 && got(2L)._3)
    // doc 3: "a b c" occurs 3 times among 12 3-grams -> dup fraction 3·5/12·5
    assert(math.abs(got(3L)._2 - 3.0 / 12.0) < 1e-12)
  }

  test("repetitionStats never computes per-document quadratic lambdas") {
    // a long document must go through explode+groupBy, not array lambdas:
    // verify the plan aggregates rather than nesting transform(filter())
    val docs = Seq((1L, (1 to 5000).map(i => s"w${i % 97}").mkString(" ")))
      .toDF("doc_id", "text")
    val df = QualityRules.repetitionStats(docs, "doc_id", "text")
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("Aggregate"), plan)
    assert(df.count() == 1)
  }

  test("piiCounts and redact find and scrub planted PII") {
    val df = Seq(
      (1L, "mail me at jane.doe+x@sub.example.org or call +555 123-4567 ok"),
      (2L, "server at 192.168.0.1 and 10.0.255.99 no phones"),
      (3L, "clean text without identifiers")
    ).toDF("id", "t")
    val got = df.select((col("id") +: Pii.piiCounts(col("t")) :+
      Pii.redact(col("t")).as("red")): _*)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(got(1L)._1 == 1 && got(1L)._3 == 1)
    assert(got(1L)._4 == "mail me at <EMAIL> or call <PHONE> ok")
    assert(got(2L)._2 == 2 && got(2L)._4 == "server at <IP> and <IP> no phones")
    assert(got(3L) == ((0L, 0L, 0L, "clean text without identifiers")))
  }

  test("redact scrubs emails before IPs so dotted domains survive as <EMAIL>") {
    val df = Seq((1L, "x@10.0.0.1.example.com then 10.0.0.1")).toDF("id", "t")
    val red = df.select(Pii.redact(col("t")).as("r")).head().getString(0)
    assert(red == "<EMAIL> then <IP>")
  }

  test("contaminationHits counts distinct shared 8-grams and keeps clean docs") {
    val bench = Seq((100L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // shares the full 10-token run: 8-grams at offsets 0,1,2 -> 3 hits
      (1L, "zz one two three four five six seven eight nine ten yy"),
      (2L, "totally different words with no overlap at all here now"),
      (3L, "short text") // < 8 tokens, still present with 0 hits
    ).toDF("doc_id", "text")
    val got = Overlap.contaminationHits(corpus, bench, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 0L, 3L -> 0L))
  }

  test("duplicatedSpanStats counts own repeats and cross-doc spans") {
    val docs = Seq(
      (1L, "p q r s t u v"), // grams: pqrst qrstu rstuv (3 spans)
      (2L, "p q r s t x y"), // shares pqrst with doc 1
      (3L, "a b c d e a b c d e") // own repeat: abcde twice + cross grams
    ).toDF("doc_id", "text")
    val got = Overlap.duplicatedSpanStats(docs, "doc_id", "text", n = 5)
      .select("doc_id", "n_spans", "n_dup_spans")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(got(1L) == ((3L, 1L))) // only pqrst duplicated
    assert(got(2L) == ((3L, 1L)))
    // doc 3: 6 spans; "a b c d e" occurs twice (corpus count 2 from itself)
    assert(got(3L)._1 == 6L && got(3L)._2 == 2L)
  }

  test("duplicatedSpanStats df-cut drops boilerplate spans from both sides") {
    // "b1..b5" is a boilerplate span in all three docs; each doc also
    // has a unique tail span
    val docs = Seq(
      (1L, "b1 b2 b3 b4 b5 u1 u2 u3 u4 u5"),
      (2L, "b1 b2 b3 b4 b5 v1 v2 v3 v4 v5"),
      (3L, "b1 b2 b3 b4 b5 w1 w2 w3 w4 w5")
    ).toDF("doc_id", "text")
    val exact = Overlap.duplicatedSpanStats(docs, "doc_id", "text", n = 5)
      .select("doc_id", "n_spans", "n_dup_spans")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    // 6 spans each; only the pure "b1..b5" span (1 per doc) repeats
    assert(exact(1L)._1 == 6L && exact(1L)._2 == 1L)
    val cut = Overlap.duplicatedSpanStats(docs, "doc_id", "text", n = 5,
      maxDocFreq = Some(2))
      .select("doc_id", "n_spans", "n_dup_spans")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    // the df-3 boilerplate span is excluded from both counts
    assert(cut(1L)._1 == 5L && cut(1L)._2 == 0L)
  }

  test("spanDedupRewrite cuts covered words, keeps short and clean docs") {
    val docs = Seq(
      (1L, "p q r s t u v"),       // shares "p q r s t" with doc 2
      (2L, "p q r s t x y"),
      (3L, "a b c d e"),           // fully duplicated against doc 4
      (4L, "a b c d e"),
      (5L, "one two three"),       // < n words: passes through intact
      (6L, "n1 n2 n3 n4 n5 n6")    // all grams unique: untouched
    ).toDF("doc_id", "text")
    val got = Overlap.spanDedupRewrite(docs, "doc_id", "text", n = 5)
      .as[(Long, String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    // doc 1: positions 0..4 covered by the shared gram; "u v" survives
    assert(got(1L) == (("u v", 7L, 5L)))
    assert(got(2L) == (("x y", 7L, 5L)))
    // fully-duplicated docs collapse to '' but keep their audit row
    assert(got(3L) == (("", 5L, 5L)))
    assert(got(4L) == (("", 5L, 5L)))
    assert(got(5L) == (("one two three", 3L, 0L)))
    assert(got(6L) == (("n1 n2 n3 n4 n5 n6", 6L, 0L)))
  }

  test("spanDedupRewrite own-repeat spans cut both occurrences") {
    // "a b c d e" occurs twice within one doc -> corpus count 2 -> both
    // occurrences' positions covered (plus the bridging grams' span)
    val docs = Seq((1L, "a b c d e a b c d e")).toDF("doc_id", "text")
    val got = Overlap.spanDedupRewrite(docs, "doc_id", "text", n = 5)
      .as[(Long, String, Long, Long)].collect().head
    assert(got == ((1L, "", 10L, 10L)))
  }

  test("sequencePack fills each stratum contiguously in id order") {
    val docs = (1L to 40L).map(i => (i, (0 until (i % 7 + 3).toInt)
      .map(j => s"t$j").mkString(" "))).toDF("doc_id", "text")
    val rows = Packing.sequencePack(docs, "doc_id", "text",
      maxLen = 10, nStrata = 4)
      .select("doc_id", "stratum", "n_tokens", "seq_id", "seq_offset")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.length == 40)
    // replay the fill per stratum: offsets must be the running totals
    rows.groupBy(_._2).foreach { case (_, members) =>
      var cum = 0L
      members.sortBy(_._1).foreach { case (_, _, nt, seqId, off) =>
        assert(seqId == cum / 10 && off == cum % 10)
        cum += nt
      }
    }
  }

  test("sequencePack consumes a pre-tokenized length column when given") {
    // real-tokenizer seam: BPE counts arrive as a column; the packer
    // must trust them verbatim and only fall back to whitespace tokens
    val docs = (1L to 20L)
      .map(i => (i, "a b c", i * 3)) // pre-tokenized count != 3 whitespace tokens
      .toDF("doc_id", "text", "bpe_len")
    val packed = Packing.sequencePack(docs, "doc_id", "text",
      maxLen = 10, nStrata = 2, tokenCountCol = Some("bpe_len"))
      .select("doc_id", "stratum", "n_tokens", "seq_id", "seq_offset")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(packed.forall { case (id, _, nt, _, _) => nt == id * 3 },
      "n_tokens must be the supplied column, not the whitespace count")
    packed.groupBy(_._2).foreach { case (_, members) =>
      var cum = 0L
      members.sortBy(_._1).foreach { case (_, _, nt, seqId, off) =>
        assert(seqId == cum / 10 && off == cum % 10)
        cum += nt
      }
    }
    // default stays the whitespace tokenizer
    val ws = Packing.sequencePack(docs, "doc_id", "text", maxLen = 10, nStrata = 2)
      .select("n_tokens").as[Long].collect()
    assert(ws.forall(_ == 3))
  }

  test("curate drops wrong-lang, low-quality, repetitive, and duplicate docs") {
    val good = (0 until 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, good, "en"), // kept
      (2L, good, "en"), // exact dup of 1 -> dropped
      (3L, good, "zh"), // wrong lang -> dropped
      (4L, "too short", "en"), // < 20 tokens -> dropped
      (5L, Seq.fill(40)("spam").mkString(" "), "en"), // repetitive -> dropped
      (6L, (100 until 130).map(i => s"w$i").mkString(" "), "es") // kept
    ).toDF("doc_id", "text", "lang")
    val kept = graft.operators.Curation
      .curate(docs, "doc_id", "text", "lang", Seq("en", "es"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 6L))
  }

  test("weightedMix keeps ~rate per source, deterministically") {
    val docs = (0L until 2000L)
      .map(i => (i, s"src${i % 2}")).toDF("doc_id", "source")
    def run() = Curation.weightedMix(docs, "doc_id", "source",
        Map("src0" -> 900, "src1" -> 100), defaultPermille = 0)
      .select("doc_id").as[Long].collect().toSet
    val kept = run()
    assert(kept == run(), "hash-mod sampling must be reproducible")
    val bySrc = kept.groupBy(_ % 2).view.mapValues(_.size).toMap
    // 1000 docs per source; expect ~900 and ~100 within a loose band
    assert(bySrc(0L) > 850 && bySrc(0L) < 950, s"src0 kept ${bySrc(0L)}")
    assert(bySrc(1L) > 60 && bySrc(1L) < 140, s"src1 kept ${bySrc(1L)}")
  }

  test("percentileCut keeps exactly floor(n*p/1000) per group, ties by id") {
    // group a: 8 rows, keep floor(8*250/1000)=2; score ties at the
    // boundary must resolve to the LOWER doc_id
    val df = ((1L to 8L).map(i => (i, "a", if (i <= 4) 100L else 50L)) ++
      (11L to 13L).map(i => (i, "b", 10L * i))).toDF("doc_id", "source", "n_chars")
    val got = Curation.percentileCut(df, "source", "n_chars", "doc_id", 250)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    val a = got.filter(_._2 == "a").map(x => x._1 -> x._3).sorted
    assert(a.toSeq == Seq(1L -> 1L, 2L -> 2L), a.mkString(","))
    // group b: 3 rows -> floor(0.75) = 0 kept
    assert(!got.exists(_._2 == "b"))
    // keepPermille=1000 keeps everything
    assert(Curation.percentileCut(df, "source", "n_chars", "doc_id", 1000)
      .count() == 11)
  }

  test("pmiCollocations ranks the glued pair above independent words") {
    // "san francisco" is exclusive on both sides; "francisco the" is
    // equally frequent but "the" is promiscuous (huge w2 marginal), so
    // PMI must rank the glued pair strictly first
    val docs = (1L to 20L).map { i =>
      (i, s"the a$i the b$i the c$i san francisco the d$i")
    }.toDF("doc_id", "text")
    val got = TextAnalysis.pmiCollocations(docs, "doc_id", "text",
      minCount = 5, topK = 10).collect()
    val lab = got.map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(lab.map(x => (x._1, x._2)).toSeq ==
      Seq(("san", "francisco"), ("francisco", "the")), lab.mkString(","))
    assert(lab(0)._4 > lab(1)._4, lab.mkString(","))
    // support floor: every returned bigram has c2 >= 5
    assert(got.forall(_.getLong(2) >= 5L))
    graft.core.OpCache.releaseAll(blocking = true)
  }

  test("qualityWeightedMix: exact tiers per source, tier-0 always kept at 1000 permille") {
    import spark.implicits._
    // 8 docs in one source with distinct perplexities; 4 tiers of 2
    val docs = (1L to 8L).map { i =>
      // doc i repeats a small vocabulary i times over — lower i = more
      // diverse text = higher self-LM perplexity
      val words = (0 until 24).map(j => s"w${j % (2 + i.toInt * 3)}")
      (i, words.mkString(" "), "s0")
    }.toDF("doc_id", "text", "source")
    val out = Curation.qualityWeightedMix(docs, "doc_id", "text", "source",
      tierPermille = Seq(1000, 1000, 1000, 1000))
    val tiers = out.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // all kept at 1000 permille, exactly 2 docs per tier
    assert(tiers.size == 8 && tiers.values.groupBy(identity).forall(_._2.size == 2),
      tiers.toString)
    // determinism: repartitioned input yields the identical kept set
    val re = Curation.qualityWeightedMix(docs.repartition(5),
      "doc_id", "text", "source", tierPermille = Seq(1000, 1000, 1000, 1000))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(re == tiers)
    // zero rate drops the tier entirely
    val none = Curation.qualityWeightedMix(docs, "doc_id", "text", "source",
      tierPermille = Seq(0, 0, 0, 0))
    assert(none.count() == 0)
    graft.core.OpCache.releaseAll(blocking = true)
  }

  test("clusterAwareSplit: no near-dup pair straddles splits; covering and deterministic") {
    // 30 template families: members of a family are exact or near dups
    // of each other (one word changed), so each family must land whole
    // in a single split
    val docs = (0L until 90L).map { i =>
      val fam = i / 3
      val words = (0 until 12).map(j => s"fam${fam}w$j").toVector
      val v = i % 3 match {
        case 0 => words
        case 1 => words // exact duplicate of variant 0
        case _ => words.updated(11, "changed") // near dup (jaccard > 0.5)
      }
      (i, v.mkString(" "))
    }.toDF("doc_id", "text")
    val out = Curation.clusterAwareSplit(docs, "doc_id", "text")
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.length == 90 && rows.map(_._1).distinct.length == 90)
    // EXACT duplicates always share a component (and so a split) — the
    // collapse-first stage is recall-1; near-dup edges depend on LSH
    // banding (probabilistic per pair), so families are asserted via
    // the discovered-pair invariant below instead
    val comp = rows.map(r => r._1 -> r._2).toMap
    (0L until 30L).foreach { fam =>
      assert(comp(fam * 3) == comp(fam * 3 + 1), s"exact dups of family $fam split")
    }
    // the leakage guarantee: no discovered near-dup pair straddles splits
    val split = rows.map(r => r._1 -> r._3).toMap
    val pairs = Dedup.lshNearDupPairs(docs, "doc_id", "text",
      nShingle = 3, k = 16, bands = 4, threshold = 0.5)
      .select("a_id", "b_id").collect()
    assert(pairs.nonEmpty)
    pairs.foreach { p =>
      assert(split(p.getLong(0)) == split(p.getLong(1)),
        s"leak: ${p.getLong(0)} vs ${p.getLong(1)}")
    }
    // partitioning-invariant
    val re = Curation.clusterAwareSplit(docs.repartition(7), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(re == rows.map(r => r._1 -> r._3).toMap)
    // rates are validated
    intercept[IllegalArgumentException] {
      Curation.clusterAwareSplit(docs, "doc_id", "text",
        valPermille = 600, testPermille = 600)
    }
    graft.core.OpCache.releaseAll(blocking = true)
  }

  test("contamination benchmark side is a broadcast semi-join") {
    val bench = Seq((100L, "one two three four five six seven eight"))
      .toDF("doc_id", "text")
    val corpus = (1L to 50L).map(i => (i, s"doc $i one two three four five six seven eight"))
      .toDF("doc_id", "text")
    val df = Overlap.contaminationHits(corpus, bench, "doc_id", "text")
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastHashJoin") ||
      physical.contains("BroadcastExchange"), physical)
  }

  test("dualDecontaminationReport: surface and semantic channels flag independently") {
    // bench doc 100 = a verbatim 8-word run; bench embedding 100 points
    // along e1. Corpus: 1 copies the run (surface hit, orthogonal
    // embedding), 2 is clean text with an embedding parallel to the
    // bench's (semantic hit), 3 is clean on both channels.
    val run = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (100L, run + " and the benchmark tail words here"),
      (1L, "prefix words " + run + " suffix words"),
      (2L, "totally different clean words one two three four five six"),
      (3L, "another clean document with its own words seven eight nine ten")
    ).toDF("doc_id", "text")
    val em = Seq(
      (100L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0f, 1f, 0f, 0f)),
      (2L, Array(0.99f, 0.1f, 0f, 0f)),
      (3L, Array(0f, 0f, 1f, 0f))
    ).toDF("vec_id", "embedding")
    val report = Curation.dualDecontaminationReport(
      docs.filter($"doc_id" =!= 100L), docs.filter($"doc_id" === 100L),
      "doc_id", "text", em, "vec_id", "embedding",
      n = 3, window = 4, benchStride = 1, nProbe = 1,
      cosThreshold = 0.9, maxSharedFp = 0L)
    val got = report
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          r.getBoolean(3), r.getBoolean(4)))).toMap
    assert(got(1L)._1 > 0L, "verbatim run must share fingerprints")
    assert(!got(1L)._4, "surface hit → dropped")
    assert(got(2L)._1 == 0L && got(2L)._2.exists(_ >= 0.9) && got(2L)._3,
      s"doc 2 is a semantic-only hit: ${got(2L)}")
    assert(!got(2L)._4, "semantic hit → dropped")
    assert(got(3L)._1 == 0L && !got(3L)._3 && got(3L)._4,
      s"doc 3 clears both: ${got(3L)}")
    // the model-card rollup counts each channel and the overlap
    val rate = Curation.contaminationRate(report).collect()(0)
    assert((rate.getLong(0), rate.getLong(1), rate.getLong(2),
      rate.getLong(3), rate.getLong(4)) == ((3L, 1L, 1L, 0L, 2L)),
      rate.toString)
    assert(rate.getDouble(5) == 0.666667)
    graft.core.OpCache.releaseAll(blocking = true)
  }
}
