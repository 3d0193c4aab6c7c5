package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large text corpora — the beyond-reference
  * surface a training-data pipeline needs. All portable-hash based:
  * the base hash is the top 60 bits of MD5 (hex-parsed), so any engine
  * can reproduce signatures exactly. Everything is expression-level
  * (no UDFs) and shuffle-frugal: LSH turns the O(n²) near-dup problem
  * into equi-joins on band keys, which is the only strategy that
  * survives 100 TB (candidate generation stays linear in n, the join
  * shuffles only band keys, and verification touches candidate pairs
  * only).
  */
object Dedup {

  /** Portable 60-bit hash: top 15 hex chars of md5, parsed base-16.
    * Fits a positive Long; reproducible in any engine with md5. */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Distinct word n-gram shingles over a pre-split token array.
    * Caller must guarantee size(words) >= n (filter first): Spark's
    * `sequence` would otherwise run backwards. */
  def wordShingles(words: Column, n: Int = 3): Column =
    array_distinct(transform(
      sequence(lit(1), size(words) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(o => element_at(words, i + lit(o))): _*)))

  /** MinHash signature: k minimum values of k seeded hash functions
    * over the shingle set. Seeding = prefixing the shingle with "j:",
    * so h_j is independent per j yet portable. */
  def minhashSignature(shingles: Column, k: Int): Column =
    transform(
      sequence(lit(0), lit(k - 1)),
      j => array_min(transform(shingles,
        x => hash60(concat(j.cast("string"), lit(":"), x)))))

  /** LSH band keys: signature split into `bands` bands of r rows, each
    * rendered "v1,v2,..,vr"; result is array<struct<band,bkey>>. */
  def bandKeys(sig: Column, bands: Int, r: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => struct(
        b.as("band"),
        array_join(
          transform(slice(sig, b * lit(r) + lit(1), lit(r)), _.cast("string")),
          ",").as("bkey")))

  /** Set jaccard of two distinct-element arrays (single exact double
    * division of two int counts — deterministic). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** MinHash+LSH near-duplicate pairs with exact-jaccard verification.
    *
    * Plan shape (scale-first): shingle (narrow) → explode band keys
    * (×bands) → self equi-join on (band, bkey) → distinct candidate id
    * pairs → join shingle sets back → verify jaccard ≥ threshold.
    * No cartesian anywhere; the band join is the only shuffle over data
    * proportional to n·bands.
    */
  def lshNearDupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      nShingle: Int = 3,
      k: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    val r = k / bands
    require(bands * r == k, "k must be divisible by bands")
    val sh = docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("w"))
      .filter(size(col("w")) >= nShingle)
      .select(col("doc_id"), wordShingles(col("w"), nShingle).as("shingles"))
    val banded = sh
      .select(col("doc_id"),
        explode(bandKeys(minhashSignature(col("shingles"), k), bands, r)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    val pairs = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
    pairs
      .join(sh.as("sa"), col("a_id") === col("sa.doc_id"))
      .join(sh.as("sb"), col("b_id") === col("sb.doc_id"))
      .select(col("a_id"), col("b_id"),
        jaccard(col("sa.shingles"), col("sb.shingles")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash signature (60-bit) over a column holding the DISTINCT
    * token hashes (array<long> from [[hash60]]): majority vote per bit.
    * Pass a materialized column (see [[withSimhash]]) — inlining the
    * hash computation here would re-evaluate md5 per bit term.
    */
  def simhashOfHashes(hs: Column): Column = {
    val n = size(hs)
    (0 until 60).map { j =>
      val mask = 1L << j
      when(lit(2) * size(filter(hs, h => h.bitwiseAND(lit(mask)) =!= 0)) > n,
        lit(mask)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Attach a 60-bit simhash of the whitespace tokens of `textCol`.
    * Hashes are materialized in a temp column so md5 runs once per
    * token, not once per bit. */
  def withSimhash(df: DataFrame, textCol: String, out: String): DataFrame =
    df.withColumn("__hs",
        transform(array_distinct(split(col(textCol), " ")), x => hash60(x)))
      .withColumn(out, simhashOfHashes(col("__hs")))
      .drop("__hs")

  /** Exact duplicate groups: hash-groupBy on content hash. Returns one
    * row per content hash with the representative (min id) and group
    * size; a semi-join against `keep_id` dedups the corpus. */
  def exactDupGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol).cast("binary")).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Blocked exact n-gram-jaccard near-dup pairs: block on
    * (lang, length-bucket), probe ±1 bucket via an exploded equi-join
    * (the scale-safe form of the |lenA−lenB|≤width range join). */
  def blockedJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      langCol: String,
      lenCol: String,
      bucketWidth: Int = 100,
      nShingle: Int = 3,
      threshold: Double = 0.4): DataFrame = {
    val base = docs.select(
      col(idCol).as("doc_id"), col(langCol).as("lang"),
      (col(lenCol).cast("long") / bucketWidth).cast("long").as("bkt"),
      split(col(textCol), " ").as("w"))
      .filter(size(col("w")) >= nShingle)
      .select(col("doc_id"), col("lang"), col("bkt"),
        wordShingles(col("w"), nShingle).as("sh"))
    val probe = base.select(col("doc_id"), col("lang"), col("sh"),
      explode(array(col("bkt") - 1, col("bkt"), col("bkt") + 1)).as("jbkt"))
    probe.as("p")
      .join(base.as("q"),
        col("p.jbkt") === col("q.bkt") && col("p.lang") === col("q.lang") &&
          col("p.doc_id") < col("q.doc_id"))
      .select(col("p.doc_id").as("a_id"), col("q.doc_id").as("b_id"),
        jaccard(col("p.sh"), col("q.sh")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
