package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

class TextAnalysisSpec extends SparkSuite {
  import spark.implicits._

  test("langId: stopword argmax with en-first tiebreak") {
    val df = Seq(
      (1L, "the cat sat on the mat and a dog"),
      (2L, "el perro y la casa de los gatos que ladran"),
      (3L, "xyzzy plugh")) // no stopwords at all -> en by tiebreak
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id") +: TextAnalysis.langIdColumns(col("text")): _*)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en")
    assert(out(2L) == "es")
    assert(out(3L) == "en")
  }

  test("quality columns: counts, ttr, mean length, keep flag") {
    val text = (1 to 30).map(i => s"tok$i").mkString(" ") // 30 distinct tokens
    val out = Seq((1L, text)).toDF("doc_id", "text")
      .select(col("doc_id") +: TextAnalysis.qualityColumns(col("text")): _*)
      .collect()(0)
    assert(out.getLong(1) == 30) // n_tokens
    assert(out.getLong(2) == 30) // n_types
    assert(out.getDouble(4) == 1.0) // ttr
    assert(out.getBoolean(6)) // keep
  }

  test("tokenCount: whitespace vs regex tokens") {
    val out = Seq((1L, "Hello, world 42!")).toDF("doc_id", "text")
      .select(col("doc_id") +: TextAnalysis.tokenCountColumns(col("text")): _*)
      .collect()(0)
    assert(out.getLong(1) == 3) // ws tokens
    // Hello , world 42 ! -> 5 regex tokens
    assert(out.getLong(2) == 5)
    assert(out.getLong(3) == 16)
  }

  test("fingerprints: content hash differs on order, bow hash does not") {
    val df = Seq((1L, "b a c x y"), (2L, "a b c y x")).toDF("doc_id", "text")
    val out = df.select(col("doc_id") +: TextAnalysis.fingerprintColumns(col("text")): _*)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out(1L)._1 != out(2L)._1)
    assert(out(1L)._2 == out(2L)._2)
  }

  test("tokenEntropy: uniform distribution maxes, constant doc is zero") {
    val df = Seq(
      (1L, "a a a a"),          // one token: H = 0
      (2L, "a b c d"),          // uniform over 4: H = 2 bits
      (3L, "a a b b b b b b")   // p(a)=1/4, p(b)=3/4
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tokenEntropy(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L) == ((4L, 0.0)))
    assert(got(2L) == ((4L, 2.0)))
    // H = 0.25*2 + 0.75*log2(4/3) = 0.811278 at 6dp
    assert(got(3L)._1 == 8L && math.abs(got(3L)._2 - 0.811278) < 1e-6)
  }

  test("rarityScore: common vocabulary scores high, junk scores low") {
    // docs 1-3 share every token; doc 4 is all-singleton garbage
    val df = Seq(
      (1L, "the cat sat"), (2L, "the cat ran"), (3L, "the cat hid"),
      (4L, "xq9 zzv1 qqj8")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.rarityScore(df, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // doc 1: tokens the(df 3) cat(df 3) sat(df 1) -> sum 7, mean 7/3
    assert(out(1L) == ((3L, 7L, 7.0 / 3.0)))
    // garbage doc: every token df 1 -> mean exactly 1 (the floor)
    assert(out(4L) == ((3L, 3L, 1.0)))
    assert(out.values.filter(_._3 > 1.0).map(_._3).min > out(4L)._3)
    // repeated tokens inside one doc count once (distinct-per-doc)
    val rep = Seq((1L, "a a a b"), (2L, "a b")).toDF("doc_id", "text")
    val repOut = TextAnalysis.rarityScore(rep, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(repOut(1L) == ((2L, 4L)) && repOut(2L) == ((2L, 4L)))
    graft.core.OpCache.releaseAll(blocking = true)
  }

  test("ngramPerplexity: predictable text scores below one-off text") {
    // doc 1 repeats the corpus-dominant bigram; doc 3 is all one-off
    // bigrams — under the self-trained model, 1 must be the most
    // predictable (lowest bits/bigram) and 3 the least
    val df = Seq(
      (1L, "the cat the cat the cat the cat"),
      (2L, "the cat sat on a mat"),
      (3L, "zig quux blorp wibble frotz")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.ngramPerplexity(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(1L)._1 == 7L && got(2L)._1 == 5L && got(3L)._1 == 4L)
    assert(got(1L)._2 < got(2L)._2 && got(2L)._2 < got(3L)._2, got.toString)
    // sub-bigram docs are excluded, not zero-scored
    val tiny = Seq((9L, "solo")).toDF("doc_id", "text")
    assert(TextAnalysis.ngramPerplexity(tiny, "doc_id", "text").count() == 0)
    graft.core.OpCache.releaseAll(blocking = true)
  }

  test("chunkTokens: window count, overlap, clamped tail, content identity") {
    // 10 tokens, chunkSize 4, stride 3:
    // n_chunks = 1 + ceil((10-4)/3) = 3, starts t1/t4/t7 — the last
    // chunk covers tokens 7..10 so nothing is lost.
    val text = (1 to 10).map(i => s"t$i").mkString(" ")
    val out = TextAnalysis.chunkTokens(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text",
      chunkSize = 4, stride = 3)
      .orderBy("chunk_idx").collect()
    assert(out.length == 3)
    assert(out.map(_.getLong(2)).toSeq == Seq(4L, 4L, 4L)) // 6+4 <= 10: full
    // overlap: chunk 0 = t1..t4, chunk 1 = t4..t7 — shares t4
    val h = (s: String) => java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(0).getString(3) == h("t1 t2 t3 t4"))
    assert(out(1).getString(3) == h("t4 t5 t6 t7"))
    assert(out(2).getString(3) == h("t7 t8 t9 t10"))
  }

  test("chunkTokens: short docs yield one chunk; empty/null yield none") {
    val df = Seq(
      (1L, "a b"), (2L, ""), (4L, "   ")).toDF("doc_id", "text")
      .unionByName(Seq((3L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val out = TextAnalysis.chunkTokens(df, "doc_id", "text", 64, 48)
    assert(out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet == Set((1L, 0L, 2L)))
    // tail clamp: 65 tokens at stride 48 → chunks of 64 and 17
    val long = (1 to 65).map(i => s"w$i").mkString(" ")
    val sizes = TextAnalysis.chunkTokens(
      Seq((9L, long)).toDF("doc_id", "text"), "doc_id", "text", 64, 48)
      .orderBy("chunk_idx").collect().map(_.getLong(2)).toSeq
    assert(sizes == Seq(64L, 17L))
  }

  test("datasheet: exact per-source volumes, dup mass, lang mix, keep rate") {
    val en = ("the a of and to in " * 5).trim // 30 tokens, all stopwords: en, keep
    val short = "the a"                       // en but < 20 tokens: not keep
    val df = Seq(
      (1L, en, "s1"), (2L, en, "s1"),         // exact duplicates
      (3L, short, "s1"),
      (4L, en + " extra", "s2"))
      .toDF("doc_id", "text", "source")
      .unionByName(Seq((5L, null.asInstanceOf[String], "s2"))
        .toDF("doc_id", "text", "source"))
    val got = TextAnalysis.datasheet(df, "doc_id", "text", "source")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))).toMap
    // s1: 3 docs, 3 texts, 2 unique, 30+30+2 tokens, 3 en, 2 keep
    assert(got("s1") == ((3L, 3L, 2L, 62L, 3L, 2L)), got.toString)
    // s2: 2 docs (one null text), 1 text, 1 unique, 31 tokens, 1 en, 1 keep
    assert(got("s2") == ((2L, 1L, 1L, 31L, 1L, 1L)), got.toString)
    // ratios are single divisions of the exact counts
    val r = TextAnalysis.datasheet(df, "doc_id", "text", "source")
      .filter($"source" === "s2").collect()(0)
    assert(r.getDouble(7) == 0.5 && r.getDouble(8) == 1.0)
  }

  test("sourceDivergence: off-mix source scores the closed-form JS; on-mix scores ~0") {
    // s1/s2 disjoint single-token vocabularies, equal mass → for each,
    // P = {t:1}, Q = {t:0.5, other:0.5}:
    // JS = ½·log2(4/3) + ½·(½·log2(2/3) + ½) ≈ 0.311278
    val df = Seq(
      ("s1", "aa aa aa aa"), ("s2", "bb bb bb bb"),
      // s3 mirrors the corpus-wide mix of its own tokens exactly? No —
      // just assert it scores strictly lower than the disjoint sources.
      ("s3", "aa aa bb bb")
    ).toDF("source", "text")
    val got = TextAnalysis.sourceDivergence(df, "source", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("s1") == got("s2"))
    assert(math.abs(got("s1") - 0.311278) < 1e-6, got.toString)
    assert(got("s3") < got("s1"))
    // a source that IS the corpus distribution diverges by zero
    val uni = Seq(("a", "x y"), ("b", "x y")).toDF("source", "text")
    val z = TextAnalysis.sourceDivergence(uni, "source", "text")
      .collect().map(_.getDouble(1))
    assert(z.forall(_ == 0.0), z.mkString(","))
    graft.core.OpCache.releaseAll(blocking = true)
  }

  test("hashedDocVectors: deterministic dims, idf weighting, repartition-invariant") {
    val docs = Seq(
      (1L, "alpha beta beta"), (2L, "alpha gamma"), (3L, "alpha beta beta")
    ).toDF("doc_id", "text")
    val a = TextAnalysis.hashedDocVectors(docs, "doc_id", "text", dims = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // identical documents embed identically
    assert(a(1L) == a(3L))
    assert(a.values.forall(_.size == 8))
    // same under repartitioning (order-invariant decimal sums)
    val b = TextAnalysis.hashedDocVectors(docs.repartition(5),
        "doc_id", "text", dims = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(a == b)
    graft.core.OpCache.releaseAll(blocking = true)
  }

  test("hashedNeighbors: exact duplicate ranks first") {
    val docs = Seq(
      (20L, "alpha beta gamma delta"), (21L, "alpha beta gamma delta"),
      (22L, "epsilon zeta eta theta"), (23L, "alpha beta iota kappa")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.hashedNeighbors(docs, "doc_id", "text",
        org.apache.spark.sql.functions.col("doc_id") === 20L, k = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._2)
    // cosine(20, 21) = 1.0 — the duplicate must rank 1
    assert(got.head == ((21L, 1L)), got.mkString(","))
    assert(got.size == 3)
    graft.core.OpCache.releaseAll(blocking = true)
  }

  test("sourceDivergence: invariant under repartitioning") {
    val docs = (1 to 200).map(i =>
      (s"s${i % 4}", s"w${i % 13} w${i % 7} w${i % 29} common"))
    val a = TextAnalysis.sourceDivergence(
      docs.toDF("source", "text"), "source", "text")
    val b = TextAnalysis.sourceDivergence(
      docs.toDF("source", "text").repartition(7), "source", "text")
    assert(rowsOf(a) == rowsOf(b) && a.count() == 4)
    graft.core.OpCache.releaseAll(blocking = true)
  }
}
