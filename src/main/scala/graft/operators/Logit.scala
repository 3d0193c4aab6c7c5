package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** In-engine trained text classifier — batch gradient descent over
  * hashed bag-of-n-gram features, the "train a fasttext-style quality
  * filter" step of a curation pipeline run entirely as DataFrame
  * algebra. The canonical use is DISTILLATION: fit the model to a
  * trusted labeling (a hand-written rule set, a human-audited sample,
  * an expensive teacher model) and serve the distilled scorer at
  * corpus scale — same shape as qt32's DSIR scorer (KB-sized
  * broadcast model, embarrassingly parallel scoring), but
  * discriminatively trained.
  *
  * Determinism is the whole design (the `trainIvfCentroids` / `Bpe`
  * discipline extended to supervised learning):
  *  - weights start at ZERO (no random init — round 1's gradient is
  *    the class-prior direction), so there is nothing to seed;
  *  - the activation is the RATIONAL fast sigmoid
  *    σ̂(z) = 0.5 + z / (2·(1+|z|)) — pure IEEE arithmetic, no
  *    exp/libm anywhere in the training loop, so engines can't
  *    disagree by a ulp;
  *  - per-round, every per-doc margin, activation, and per-bucket
  *    gradient quantizes to DECIMAL(30,6) before its order-invariant
  *    sum; the weight table itself is DECIMAL(30,6) — rounds replay
  *    bit-identically on any engine/partitioning (unrolled in the
  *    DuckDB oracle exactly like the Lloyd rounds).
  *
  * Scale shape per round: one broadcast join of the (doc, bucket, tf)
  * frame against the B-row weight table + one per-doc hash agg (the
  * margins) + one per-bucket hash agg (the gradient) — all linear in
  * corpus tokens, shuffles keyed on doc_id/bucket (uniform by
  * construction: buckets are a hash). The model never exceeds B rows
  * + 1 bias row no matter the corpus or vocabulary.
  */
object Logit {

  /** Hashed L1-normalized features: (doc_id, bucket, x) with
    * x = tf / n_doc — the per-doc feature vector rows. Unigrams +
    * bigrams, bag semantics, same bucket map as
    * [[Curation.importanceResample]] (hash60 mod `buckets`). */
  private def features(
      docs: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame = {
    val words = split(coalesce(col(textCol), lit("")), " ")
    val feats = concat(words, Dedup.wordGrams(words, 2))
    val tf = docs.select(col(idCol).as("doc_id"), explode(feats).as("f"))
      .select(col("doc_id"),
        pmod(Dedup.hash60(col("f")), lit(buckets.toLong)).as("bucket"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).cast("long").as("tf"))
    val n = tf.groupBy(col("doc_id")).agg(sum(col("tf")).cast("double").as("n"))
    tf.join(n, Seq("doc_id"))
      .select(col("doc_id"), col("bucket"),
        (col("tf").cast("double") / col("n")).as("x"))
  }

  /** The rational fast sigmoid σ̂(z) = 0.5 + z/(2(1+|z|)) — range
    * (0, 1), monotone, exact IEEE arithmetic. */
  private def fastSigmoid(z: Column): Column =
    lit(0.5) + z / (lit(2.0) * (lit(1.0) + abs(z)))

  /** A trained model: `weights` = (bucket, w DECIMAL(30,6)) — B+1 rows
    * at most (the -1 sentinel included), `bias` = one (b) row. Both are
    * KB-sized broadcast tables; persist/round-trip them like any stored
    * index here (they are plain DataFrames). */
  final case class LogitModel(weights: DataFrame, bias: DataFrame)

  /** Score `docs` with a trained model — the SERVE half, stateless and
    * embarrassingly parallel (one broadcast join + one per-doc agg), so
    * it runs unchanged inside a streaming micro-batch
    * ([[graft.streaming.EventStreams.logitScoreFeed]]).
    *
    * @return (doc_id, score, pred) — score = σ̂(gain·⟨w,x⟩+b) rounded
    *         to 6, pred = 1 iff score ≥ 0.5. `buckets`/`gain` must
    *         match training. */
  def score(
      docs: DataFrame, idCol: String, textCol: String, model: LogitModel,
      buckets: Int = 256, gain: Double = 8.0): DataFrame = {
    val x = features(docs, idCol, textCol, buckets)
    margin(x, model.weights, model.bias, gain)
      .select(col("doc_id"), round(fastSigmoid(col("z")), 6).as("score"))
      .withColumn("pred", when(col("score") >= 0.5, 1L).otherwise(0L))
  }

  private def margin(
      x: DataFrame, wCur: DataFrame, bCur: DataFrame,
      gain: Double): DataFrame =
    x.join(broadcast(wCur), Seq("bucket"), "left")
      .select(col("doc_id"),
        (col("x") * coalesce(col("w").cast("double"), lit(0.0)))
          .cast(DecimalType(30, 6)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).cast("double").as("zx"))
      .crossJoin(broadcast(bCur))
      .select(col("doc_id"),
        // gain sharpens the shallow rational sigmoid (slope ½ at 0):
        // L1-normalized features compress z toward 0, so an explicit
        // margin temperature is what lets full-batch rounds reach
        // decisive scores instead of hugging the prior
        (lit(gain) * col("zx") + col("b").cast("double"))
          .cast(DecimalType(30, 6)).cast("double").as("z"))

  /** Train `rounds` full-batch GD rounds and SCORE the corpus with
    * the final model. `labelCol` must be 0/1 (LONG/INT/BOOLEAN all
    * cast). Learning rate is the exact double `lr`.
    *
    * @return (doc_id, label, score, pred) — score = σ̂(final margin)
    *         rounded to 6, pred = 1 iff score ≥ 0.5 */
  def trainAndScore(
      docs: DataFrame, idCol: String, textCol: String, labelCol: String,
      buckets: Int = 256, rounds: Int = 3, lr: Double = 1.0,
      gain: Double = 8.0): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    // ONE persisted feature table feeds training AND final scoring —
    // the feature build (explode + two hash aggs over corpus tokens)
    // is the costliest single stage, and train-then-score would
    // otherwise run it twice. CUT as well as persist: every round
    // constructs margin/gradient frames over x, and an un-cut x makes
    // each construction re-analyze the feature plan (the pipeline
    // seam lesson).
    val xPlan = features(docs, idCol, textCol, buckets)
    val x = graft.core.OpCache.persist(
      docs.sparkSession.createDataFrame(xPlan.rdd, xPlan.schema))
    val y = graft.core.OpCache.persist(
      docs.select(col(idCol).as("doc_id"),
        col(labelCol).cast("int").cast("double").as("y")))
    val m = trainOnFeatures(docs.sparkSession, x, y, rounds, lr, gain)
    margin(x, m.weights, m.bias, gain)
      .select(col("doc_id"), round(fastSigmoid(col("z")), 6).as("score"))
      .withColumn("pred", when(col("score") >= 0.5, 1L).otherwise(0L))
      .join(y, Seq("doc_id"))
      .select(col("doc_id"), col("y").cast("long").as("label"),
        col("score"), col("pred"))
  }

  /** The TRAIN half: `rounds` full-batch GD rounds, returning the
    * (weights, bias) model for [[score]] to serve — batch or
    * streaming. Same determinism contract as [[trainAndScore]]. */
  def train(
      docs: DataFrame, idCol: String, textCol: String, labelCol: String,
      buckets: Int = 256, rounds: Int = 3, lr: Double = 1.0,
      gain: Double = 8.0): LogitModel = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val xPlan = features(docs, idCol, textCol, buckets)
    val x = graft.core.OpCache.persist(
      docs.sparkSession.createDataFrame(xPlan.rdd, xPlan.schema))
    val y = graft.core.OpCache.persist(
      docs.select(col(idCol).as("doc_id"),
        col(labelCol).cast("int").cast("double").as("y")))
    trainOnFeatures(docs.sparkSession, x, y, rounds, lr, gain)
  }

  /** Training rounds over a prebuilt persisted feature table `x` =
    * (doc_id, bucket, x) and label frame `y` = (doc_id, y). */
  private def trainOnFeatures(
      spark: org.apache.spark.sql.SparkSession,
      x: DataFrame, y: DataFrame,
      rounds: Int, lr: Double, gain: Double): LogitModel = {
    require(rounds >= 1, s"rounds >= 1, got $rounds")
    require(gain > 0, s"gain must be > 0, got $gain")
    val nDocs = y.groupBy().agg(count(lit(1)).cast("double").as("nd"))
    // weight table: (bucket, w DECIMAL(30,6)); the -1 sentinel row
    // stands in for "empty" so round 1 is the same plan as round r
    // (bucket -1 never matches a real feature)
    var w: DataFrame = spark.range(1)
      .select(lit(-1L).as("bucket"),
        lit(0.0).cast(DecimalType(30, 6)).as("w"))
    var bias: DataFrame = spark.range(1)
      .select(lit(0.0).cast(DecimalType(30, 6)).as("b"))
    (1 to rounds).foreach { _ =>
      val res = margin(x, w, bias, gain)
        .join(y, Seq("doc_id"))
        .select(col("doc_id"),
          (fastSigmoid(col("z")) - col("y"))
            .cast(DecimalType(30, 6)).cast("double").as("r"))
      val resP = graft.core.OpCache.persist(res)
      // Coordinate-NORMALIZED step: each bucket moves by the
      // feature-mass-weighted MEAN residual of the docs containing it
      // (Σ r·x / Σ x), not the raw gradient / N — a bucket seen in 3
      // docs and one seen in 3 million take same-scale steps, so
      // margins reach O(1) in a handful of rounds instead of
      // vanishing at the 1/N·1/n_doc scale (where DECIMAL(30,6)
      // quantization would freeze learning entirely). The denominator
      // is strictly positive: a bucket only exists through x rows.
      val grad = x.join(resP, Seq("doc_id"))
        .select(col("bucket"),
          (col("r") * col("x")).cast(DecimalType(30, 6)).as("g"),
          col("x").cast(DecimalType(30, 6)).as("xm"))
        .groupBy(col("bucket"))
        .agg((sum(col("g")).cast("double") / sum(col("xm")).cast("double"))
          .as("gs"))
      val wNext = w.join(grad, Seq("bucket"), "full_outer")
        .select(col("bucket"),
          (coalesce(col("w").cast("double"), lit(0.0)) -
            lit(lr) * coalesce(col("gs"), lit(0.0)))
            .cast(DecimalType(30, 6)).as("w"))
      // bias step: lr × plain mean residual (1-row frames join free)
      val bNext = resP
        .select(col("r").cast(DecimalType(30, 6)).as("rq"))
        .groupBy().agg(sum(col("rq")).cast("double").as("rs"))
        .crossJoin(broadcast(nDocs)).crossJoin(broadcast(bias))
        .select((col("b").cast("double") - lit(lr) * col("rs") / col("nd"))
          .cast(DecimalType(30, 6)).as("b"))
      // Cut EVERY round, not just past a threshold: the model is
      // ≤ B+1 rows so the cut is free, and an un-cut model frame
      // carries the whole nested training tree into every consumer —
      // a streaming serve loop would re-ANALYZE it per micro-batch
      // (the connectedComponents entry-cut lesson; measured 30 s vs
      // 10 s on qst18 when a 4-round model skipped the cut).
      w = graft.core.OpCache.persist(
        spark.createDataFrame(wNext.rdd, wNext.schema))
      bias = graft.core.OpCache.persist(
        spark.createDataFrame(bNext.rdd, bNext.schema))
    }
    LogitModel(w, bias)
  }
}
