package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vocab-driven tokenization — the in-engine stand-in for a trained
  * BPE tokenizer, feeding the pre-tokenized seam
  * ([[Packing.sequencePack]]'s `tokenCountCol`) with REAL subword
  * counts instead of whitespace counts, no external deps.
  *
  * The vocab is deterministic and corpus-derived: the top-N corpus
  * words by (frequency DESC, token ASC) plus every printable-ASCII
  * single character as the <unk>-free fallback (any ASCII word
  * tokenizes, worst case char-by-char — exactly BPE's byte-fallback
  * discipline). A production run would swap in a trained merges-file
  * vocab; the greedy longest-match machinery
  * ([[graft.functions.VocabTokenCount]]) is the same either way.
  *
  * Scale shape: vocab building is one word-count aggregate +
  * orderBy/limit top-N (per-partition heaps — no global window, no
  * single-reducer sort); the vocab itself is dictionary-sized and
  * ships as a plan literal (the centroid-broadcast discipline — the
  * driver-side collect is the broadcast, same as [[Similarity]]'s
  * centroid tables); counting is then a narrow codegen'd expression,
  * embarrassingly parallel over the corpus.
  */
object VocabTokenizer {

  /** Deterministic vocab: top-`topN` words by (count DESC, token ASC)
    * unioned with the 95 printable ASCII single characters. */
  def buildVocab(docs: DataFrame, textCol: String, topN: Int = 200): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val top = docs
      .select(explode(split(coalesce(col(textCol), lit("")), " ")).as("tok"))
      .filter(length(col("tok")) >= 1)
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok")).limit(topN)
      .select(col("tok"))
    val chars = (32 to 126).map(_.toChar.toString)
    top.unionByName(chars.toDF("tok")).distinct()
  }

  /** Materialize the (dictionary-sized) vocab as a sorted array — the
    * literal the codegen kernel embeds. The collect IS the broadcast
    * (vocab ≪ data, like a centroid table); sorted for a deterministic
    * plan fingerprint. */
  def vocabArray(vocab: DataFrame): Array[String] =
    vocab.select(col("tok")).collect().map(_.getString(0)).sorted

  /** (idCol, n_vocab_tokens): greedy longest-match token count per
    * document against the vocab literal. */
  def tokenCounts(
      docs: DataFrame, idCol: String, textCol: String,
      vocab: Array[String]): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(col(idCol),
      call_function("graft_vocab_tokens",
        coalesce(col(textCol), lit("")), typedLit(vocab))
        .as("n_vocab_tokens"))
  }

  /** [[Packing.sequencePack]] fed by vocab token lengths — the packer
    * consuming REAL subword counts end-to-end (the seam qt09 packs
    * whitespace counts through, now closed with an in-engine
    * tokenizer). */
  def packWithVocab(
      docs: DataFrame, idCol: String, textCol: String,
      vocab: Array[String], maxLen: Int = 1024,
      nStrata: Int = 4): DataFrame = {
    val counted = docs.join(
      tokenCounts(docs, idCol, textCol, vocab), Seq(idCol))
    Packing.sequencePack(counted, idCol, textCol, maxLen, nStrata,
      tokenCountCol = Some("n_vocab_tokens"))
  }
}
