package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composed text-side lifecycle, one
  * operator: language filter → quality rules (token counts, type-token
  * ratio) → repetition rules (Gopher) → PII redaction → exact dedup of
  * the redacted text. What qw01 is to the relational lifecycle, this
  * is to the corpus-curation surface: proof the library's stages
  * compose into the pipeline a training-data run actually executes.
  *
  * Scale shape is the sum of its parts, every one audited separately:
  * narrow filters and expressions until the repetition join (doc-local
  * aggregates on uniform keys) and the final dedup (one hash shuffle).
  * Filters run cheapest-first so each stage sees only survivors.
  */
object Curation {

  /** Returns the curated corpus: (doc_id, lang, n_tokens,
    * redacted_md5), one row per kept document. */
  def curate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      langCol: String,
      langs: Seq[String]): DataFrame = {
    val lf = docs.filter(col(langCol).isInCollection(langs))
    val withQ = lf.select(
      (Seq(col(idCol).as("doc_id"), col(langCol).as("lang"),
        col(textCol).as("text")) ++
        TextAnalysis.qualityColumns(col(textCol))): _*)
    val q = withQ.filter(col("keep"))
      .select(col("doc_id"), col("lang"), col("text"), col("n_tokens"))
    val rep = QualityRules.repetitionStats(q, "doc_id", "text")
      .filter(col("keep")).select(col("doc_id"))
    val red = q.join(rep, Seq("doc_id"))
      .withColumn("redacted_md5",
        md5(Pii.redact(col("text")).cast("binary")))
    val w = Window.partitionBy(col("redacted_md5")).orderBy(col("doc_id"))
    red.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("redacted_md5"))
  }

  /** Deterministic weighted data mixing: keep each document with its
    * source's sampling rate (permille), decided by a content-stable
    * hash — the per-source up/down-weighting step that turns a curated
    * pool into a training mixture. Pure narrow filter (zero shuffle,
    * reproducible under any partitioning and across engines), unlike
    * RNG-based `sample()` which is neither. */
  def weightedMix(
      docs: DataFrame,
      idCol: String,
      sourceCol: String,
      permille: Map[String, Int],
      defaultPermille: Int): DataFrame = {
    require((permille.values ++ Seq(defaultPermille)).forall(p =>
      p >= 0 && p <= 1000), "rates are permille (0..1000)")
    val rate = permille.foldLeft(lit(defaultPermille)) {
      case (acc, (src, p)) => when(col(sourceCol) === src, lit(p)).otherwise(acc)
    }
    docs.filter(
      pmod(Dedup.hash60(
        concat(col(idCol).cast("string"), lit(":"), col(sourceCol))),
        lit(1000)) < rate)
  }
}
