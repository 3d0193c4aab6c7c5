package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Unit coverage for the seventh-wave operators: OPH minhash
  * (signature totality, duplicate detection, empty input),
  * token-balanced sharding (conservation, determinism under
  * repartitioning, degenerate budgets) and retraction-aware IVM
  * (exact retraction, group moves, count-to-zero disappearance). */
class SeventhWaveSpec extends SparkSuite {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog near the river bank today"
  private val docs = Seq(
    (1L, base),
    (2L, base + " extra"),                      // near-dup of 1
    (3L, "completely different text about spark catalyst optimizer rules engine"),
    (4L, "short one two"),                      // 1 shingle → sparse bins
    (5L, "too short"))                          // no shingle → excluded
    .toDF("doc_id", "text")

  test("ophNearDupPairs finds the planted near-dup and verifies jaccard") {
    val pairs = Dedup.ophNearDupPairs(docs, "doc_id", "text",
      nShingle = 3, k = 16, bands = 4, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    assert(pairs.exists { case (a, b, j) => a == 1L && b == 2L && j >= 0.5 })
    // no pair may involve the unrelated or sub-shingle docs
    assert(pairs.forall { case (a, b, _) => Set(a, b).subsetOf(Set(1L, 2L)) })
  }

  test("OPH signatures are total (densification fills every empty bin)") {
    val sh = Seq((4L, Seq("only one shingle")))
      .toDF("doc_id", "shingles")
    val banded = Dedup.ophBandTable(sh, k = 16, bands = 4)
    // 4 band rows, and no bkey may contain an empty/null component
    val keys = banded.select("bkey").as[String].collect()
    assert(keys.length == 4)
    assert(keys.forall(k => k.split(",", -1).forall(s => s.nonEmpty && s != "null")))
  }

  test("ophNearDupPairs on an empty corpus returns empty") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.ophNearDupPairs(empty, "doc_id", "text").count() == 0)
  }

  private val shardDocs = (1L to 100L)
    .map(i => (i, Seq.fill(10 + (i % 7).toInt)("w").mkString(" ")))
    .toDF("doc_id", "text")

  test("tokenShards conserves docs and tokens, shards are contiguous") {
    val out = Sharding.tokenShards(shardDocs, "doc_id",
      size(split(col("text"), " ")).cast("long"), budget = 100L)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val totalTokens = (1L to 100L).map(i => 10 + (i % 7)).sum
    assert(out.map(_._2).sum == 100L)          // every doc placed once
    assert(out.map(_._3).sum == totalTokens)   // every token counted once
    assert(out.map(_._1).toSeq == out.indices.map(_.toLong)) // shards 0..n gap-free
    // every shard crosses its budget boundary by at most one doc's
    // tokens: tokens-before-last-doc < (shard+1)*budget ≤ tokens-through-last-doc…
    // conservatively: no shard except the last is under ~budget-minus-max-doc
    val maxDoc = 16L
    assert(out.dropRight(1).forall(_._3 >= 100L - maxDoc))
  }

  test("tokenShards is invariant under input partitioning") {
    val expr = size(split(col("text"), " ")).cast("long")
    val a = Sharding.tokenShards(shardDocs, "doc_id", expr, 100L)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val b = Sharding.tokenShards(shardDocs.repartition(7), "doc_id", expr, 100L)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  test("tokenShards with budget larger than the corpus yields one shard") {
    val out = Sharding.tokenShards(shardDocs, "doc_id",
      size(split(col("text"), " ")).cast("long"), budget = 1000000L)
      .as[(Long, Long, Long)].collect()
    assert(out.toSeq == Seq((0L, 100L, (1L to 100L).map(i => 10 + (i % 7)).sum)))
  }

  private def changelog(rows: Seq[(String, String, java.math.BigDecimal,
      String, java.math.BigDecimal)]) =
    rows.toDF("op", "grp", "val", "bgrp", "bval")
      .select(col("op"), col("grp"), col("val").cast("decimal(30,6)").as("val"),
        col("bgrp"), col("bval").cast("decimal(30,6)").as("bval"))

  private def bd(s: String) = new java.math.BigDecimal(s)

  test("retract IVM: insert then delete restores state exactly (group vanishes)") {
    val ins = changelog(Seq(("I", "a", bd("10.5"), null, null)))
    val del = changelog(Seq(("D", null, null, "a", bd("10.5"))))
    val state0 = graft.warehouse.Cdc.retractDeltas(ins,
      col("op"), col("grp"), col("val"), col("bgrp"), col("bval"))
      .groupBy(col("grp")).agg(sum(col("dn")).cast("long").as("n"),
        sum(col("dv")).as("v"))
    val after = graft.warehouse.Cdc.retractMerge(state0,
      graft.warehouse.Cdc.retractDeltas(del,
        col("op"), col("grp"), col("val"), col("bgrp"), col("bval")))
    assert(after.count() == 0)
  }

  test("retract IVM: a group-moving update transfers mass exactly") {
    val log = changelog(Seq(
      ("I", "a", bd("1.25"), null, null),
      ("I", "a", bd("2.75"), null, null),
      ("U", "b", bd("9.00"), "a", bd("1.25")))) // 1.25 moves a→b as 9.00
    val deltas = graft.warehouse.Cdc.retractDeltas(log,
      col("op"), col("grp"), col("val"), col("bgrp"), col("bval"))
    val state = graft.warehouse.Cdc.retractMerge(
      deltas.filter(lit(false)) // empty stored state
        .groupBy(col("grp")).agg(sum(col("dn")).cast("long").as("n"),
          sum(col("dv")).as("v")),
      deltas)
    val byGrp = state.collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getDecimal(2).toPlainString)).toMap
    assert(byGrp("a") == (1L, "2.750000"))
    assert(byGrp("b") == (1L, "9.000000"))
  }

  test("dedupProvenance partitions the corpus and agrees with dedupCorpus") {
    val corpus = Seq(
      (1L, base),
      (2L, base),                              // exact dup of 1
      (3L, base + " extra"),                   // near dup of 1
      (4L, "completely different text about spark catalyst optimizer rules"))
      .toDF("doc_id", "text")
    val prov = Dedup.dedupProvenance(corpus, "doc_id", "text")
      .as[(Long, String, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(prov.keySet == Set(1L, 2L, 3L, 4L)) // one row per input doc
    assert(prov(1L) == ("kept", 1L))
    assert(prov(2L) == ("exact_dup", 1L))
    assert(prov(3L) == ("near_dup", 1L))
    assert(prov(4L) == ("kept", 4L))
    val kept = Dedup.dedupCorpus(corpus, "doc_id", "text")
      .as[Long].collect().toSet
    assert(prov.filter(_._2._1 == "kept").keySet == kept)
  }

  test("benchmarkLeakReport: zero-hit items stay, leaks count distinct docs") {
    val bench = Seq(
      (100L, base),                            // leaked into docs 1 and 2
      (200L, "pristine benchmark item nothing in the corpus resembles it"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, base),
      (2L, "prefix words here " + base),       // shares the run
      (3L, "completely different text about spark catalyst optimizer rules"))
      .toDF("doc_id", "text")
    val got = Dedup.benchmarkLeakReport(corpus, bench, "doc_id", "text")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.keySet == Set(100L, 200L))      // every benchmark item present
    assert(got(200L) == (0L, 0L))              // zero-hit survives with zeros
    assert(got(100L)._1 == 2L)                 // both leaking docs counted once
    assert(got(100L)._2 >= got(100L)._1)       // occurrences ≥ distinct docs
  }

  test("profileDrift classifies added/removed/drifted/stable columns") {
    val oldDf = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, null, 30.0))
      .toDF("k", "s", "v")
    val newDf = Seq((1L, "a", 10.0, "x"), (2L, "b", 99.0, "y"),
      (3L, null, 30.0, "z"))
      .toDF("k", "s", "v2", "t")
      .select(col("k"), col("s"), col("v2").as("v"), col("t"))
    val got = graft.warehouse.Profile.profileDrift(oldDf, newDf)
      .select(col("col_name"), col("status"))
      .as[(String, String)].collect().toMap
    assert(got == Map("k" -> "stable", "s" -> "stable",
      "v" -> "drifted", "t" -> "col_added"))
    val gone = graft.warehouse.Profile.profileDrift(newDf, oldDf)
      .select(col("col_name"), col("status"))
      .as[(String, String)].collect().toMap
    assert(gone("t") == "col_removed")
  }

  test("mergeableProfile: merged state equals a full rebuild, sketch included") {
    val full = (1L to 300L).map(i =>
      (i, if (i % 10 == 0) null else s"v${i % 97}", i * 1.5))
      .toDF("k", "s", "v")
    val a = full.filter(col("k") % 3 =!= 0)
    val b = full.filter(col("k") % 3 === 0)
    def prof(df: org.apache.spark.sql.DataFrame) =
      graft.warehouse.Profile.mergeableProfile(df)
    val merged = graft.warehouse.Profile.mergeProfiles(prof(a), prof(b))
    val rebuilt = prof(full)
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("sk"), col("min_num"), col("max_num"),
        col("min_str"), col("max_str"))
        .collect().map(_.toSeq.map {
          case a: scala.collection.Seq[_] => a.toList
          case x => x
        }).sortBy(_.head.toString)
    assert(norm(merged).toSeq == norm(rebuilt).toSeq)
    // 300 distinct keys > k=64 → the estimator path is exercised and
    // the merged estimate is the rebuild's estimate exactly
    val est = merged.filter(col("col_name") === "k")
      .select(graft.warehouse.Profile.kmvEstimate(col("sk"))).head.getDouble(0)
    assert(est > 100.0 && est < 900.0, s"implausible KMV estimate $est")
  }

  test("exportManifest shards cover exactly the packed sequences' tokens") {
    val corpus = graft.core.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    val docs = corpus.filter(col("doc_id") % 10 =!= 0)
    val bench = corpus.filter(col("doc_id") % 10 === 0)
    val langs = Seq("en", "es", "fr")
    val mix = Map("src0" -> 1000, "src1" -> 1000)
    val packed = Curation.trainingPipelineDecontaminated(
      docs, bench, "doc_id", "text", "lang", "source", langs,
      mix, defaultPermille = 1000, maxLen = 64, nStrata = 2,
      maxSharedFp = 0L)
    val expected = packed.agg(sum(col("n_tokens")).cast("long")).head.getLong(0)
    val manifest = Curation.exportManifest(
      docs, bench, "doc_id", "text", "lang", "source", langs,
      mix, defaultPermille = 1000, maxLen = 64, nStrata = 2,
      maxSharedFp = 0L, shardBudget = 128L)
      .as[(Long, Long, Long)].collect()
    assert(manifest.map(_._3).sum == expected)
    // every packed sequence lands in exactly one shard (an oversized
    // sequence may skip a shard id — ids are ordered, not gap-free)
    val nSeqs = packed.select(col("stratum"), col("seq_id")).distinct().count()
    assert(manifest.map(_._2).sum == nSeqs)
    assert(manifest.map(_._1).distinct.length == manifest.length)
  }
}
