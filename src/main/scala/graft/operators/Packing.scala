package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the "concatenate documents and split into
  * fixed-length training sequences" stage of an LLM data pipeline,
  * as a deterministic distributed assignment.
  *
  * True first-fit bin packing is inherently sequential; the shape that
  * scales is STRATIFIED CONTIGUOUS FILL: documents hash into
  * `nStrata` independent streams, each stream concatenates its
  * documents in id order, and every document gets (sequence id, token
  * offset) within its stream from a running token total. One shuffle
  * (the stratum window); each stratum sorts locally and externally.
  * Waste vs. perfect packing is bounded by (docs spanning a boundary)
  * — the standard trade every large-scale packer makes.
  *
  * At 100 TB raise `nStrata` to ~4× executor-core count: strata are
  * embarrassingly parallel, per-stratum order stays deterministic, and
  * the final (stratum, seq_id) pair is a stable global sequence key.
  * Deterministic by construction — hash-mod stratum, id-ordered fill —
  * so re-runs and engines agree bit-exactly.
  */
object Packing {

  /** @param tokenCountCol optional pre-tokenized length column (real
    *   tokenizer output — BPE counts computed upstream). When set, the
    *   packer trusts it verbatim; the whitespace count is only the
    *   fallback. Token counting and packing stay consistent as long as
    *   the same column feeds both. */
  def sequencePack(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxLen: Int = 2048,
      nStrata: Int = 8,
      tokenCountCol: Option[String] = None): DataFrame = {
    val nt = TextAnalysis.tokenCount(col(textCol), tokenCountCol.map(col))
    val stratum = pmod(Dedup.hash60(col(idCol).cast("string")), lit(nStrata))
      .cast("long")
    val w = Window.partitionBy(col("stratum")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(idCol).as("doc_id"), stratum.as("stratum"), nt.as("n_tokens"))
      .withColumn("start_tok", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(
        col("doc_id"), col("stratum"), col("n_tokens"),
        floor(col("start_tok") / maxLen).cast("long").as("seq_id"),
        pmod(col("start_tok"), lit(maxLen.toLong)).as("seq_offset"))
  }
}
