package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for corpus curation: language ID, quality
  * scoring, token counting, fingerprinting. All pure column
  * expressions (codegen'd, narrow, no shuffle) — they scan-transform
  * each document independently, the embarrassingly-parallel shape that
  * scales linearly with executors.
  */
object TextAnalysis {

  /** Stopword marker lists per language for the n-gram/stopword
    * language-ID heuristic. Deliberately tiny and deterministic. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in"),
    "es" -> Seq("el", "la", "de", "los", "en", "que"),
    "fr" -> Seq("le", "la", "les", "de", "et", "en"),
    "de" -> Seq("der", "die", "das", "und", "ein", "zu"))

  private def countIn(words: Column, vocab: Seq[String]): Column =
    size(filter(words, w => w.isInCollection(vocab))).cast("long")

  /** Language-ID: CJK codepoint presence → zh; otherwise argmax of
    * per-language stopword counts with fixed tiebreak order
    * en > es > fr > de. Returns (pred_lang, cnt_en, cnt_es, cnt_fr, cnt_de). */
  def langIdColumns(text: Column): Seq[Column] = {
    val w = split(text, " ")
    val cnt = Seq("en", "es", "fr", "de").map(l => l -> countIn(w, stopwords(l))).toMap
    val pred = when(text.rlike("[\\u4e00-\\u9fff]"), lit("zh"))
      .when(cnt("en") >= cnt("es") && cnt("en") >= cnt("fr") && cnt("en") >= cnt("de"), lit("en"))
      .when(cnt("es") >= cnt("fr") && cnt("es") >= cnt("de"), lit("es"))
      .when(cnt("fr") >= cnt("de"), lit("fr"))
      .otherwise(lit("de"))
    Seq(pred.as("pred_lang"), cnt("en").as("cnt_en"), cnt("es").as("cnt_es"),
      cnt("fr").as("cnt_fr"), cnt("de").as("cnt_de"))
  }

  /** Quality signals: token/type counts, punctuation density, type-token
    * ratio, mean token length, and a composite keep/drop flag. Ratios
    * are single exact divisions of integer counts → deterministic. */
  def qualityColumns(text: Column): Seq[Column] = {
    val w = split(text, " ")
    val nTokens = size(w).cast("long")
    val nTypes = size(array_distinct(w)).cast("long")
    val nPunct = size(regexp_extract_all(text, lit("[.,;:!?]"), lit(0))).cast("long")
    val sumLen = aggregate(transform(w, t => length(t)), lit(0), (acc, x) => acc + x)
      .cast("long")
    val ttr = nTypes.cast("double") / nTokens.cast("double")
    val meanLen = sumLen.cast("double") / nTokens.cast("double")
    val keep = nTokens >= 20 && nTokens <= 100000 && ttr >= 0.15
    Seq(nTokens.as("n_tokens"), nTypes.as("n_types"), nPunct.as("n_punct"),
      ttr.as("ttr"), meanLen.as("mean_token_len"), keep.as("keep"))
  }

  /** Per-source corpus DATASHEET — the one-row-per-source summary a
    * dataset publication ships ("datasheets for datasets"): document
    * and token volumes, exact-duplicate mass, language mix, and the
    * quality-filter pass rate, every number an order-invariant
    * aggregate of exact integers (counts, flag sums, a distinct-hash
    * count) with ratios taken as single divisions at the end — so the
    * datasheet is bit-reproducible across engines and partitionings.
    * Null-text documents count toward `n_docs` but not `n_text`/
    * `n_unique_texts` (distinct-ignores-nulls in every engine), and
    * their keep flag contributes 0 — the same per-row semantics
    * qt01/qt02 already verify.
    *
    * Scale shape: one narrow pass computing the per-row signals, one
    * hash aggregate keyed by source (map-side combinable; the
    * distinct-count goes through the standard partial-distinct
    * expand). Sources are few; rows per source are corpus-scale —
    * exactly the shape hash aggregation is built for. */
  def datasheet(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String): DataFrame = {
    val perRow = docs.select(
      (Seq(col(sourceCol).as("source"),
        md5(col(textCol).cast("binary")).as("__h"),
        col(textCol).isNotNull.as("__has_text")) ++
        langIdColumns(col(textCol)) ++ qualityColumns(col(textCol))): _*)
    perRow.groupBy(col("source"))
      .agg(
        count(lit(1)).cast("long").as("n_docs"),
        sum(when(col("__has_text"), 1L).otherwise(0L)).cast("long")
          .as("n_text"),
        countDistinct(col("__h")).cast("long").as("n_unique_texts"),
        sum(col("n_tokens")).cast("long").as("n_tokens_total"),
        sum(when(col("pred_lang") === "en", 1L).otherwise(0L)).cast("long")
          .as("n_en"),
        sum(when(col("keep"), 1L).otherwise(0L)).cast("long").as("n_keep"))
      .withColumn("pct_en",
        col("n_en").cast("double") / col("n_docs").cast("double"))
      .withColumn("unique_ratio",
        when(col("n_text") > 0,
          col("n_unique_texts").cast("double") / col("n_text").cast("double")))
  }

  /** The tokenizer seam: a document's token count is the supplied
    * pre-tokenized length column when one exists (real tokenizer
    * output, e.g. BPE counts computed upstream of Spark), else the
    * whitespace fallback. Everything downstream that consumes token
    * counts (budgeting, packing via
    * [[Packing.sequencePack]]'s `tokenCountCol`) stays correct under a
    * real tokenizer as long as the same column feeds each stage. */
  def tokenCount(text: Column, preTokenized: Option[Column] = None): Column =
    preTokenized.map(_.cast("long"))
      .getOrElse(size(split(text, " ")).cast("long"))

  /** Overlapping token-window chunking — the retrieval/pretraining
    * segmenter: each document becomes `ceil(max(n−chunkSize,0)/stride)
    * + 1` windows of up to `chunkSize` whitespace tokens starting
    * every `stride` tokens, so consecutive chunks share
    * `chunkSize − stride` tokens of context (the overlap every RAG
    * chunker keeps so a fact spanning a boundary survives in at least
    * one chunk whole). Contrast [[Packing.sequencePack]], which packs
    * whole documents into training rows, and `Dedup` segment dedup
    * (qd21), which splits on CONTENT (paragraphs); this splits on a
    * token BUDGET — the shape embedding models and context windows
    * impose.
    *
    * Embarrassingly parallel: tokenize, a per-row chunk-count
    * expression, one `explode` of the index range, and `slice` per
    * chunk — no shuffle at all until a downstream consumer aggregates.
    * At 100 TB the fan-out is ~n/stride rows per document, produced
    * map-side; output chunk identity is `(doc_id, chunk_idx)` plus the
    * md5 of the joined window (content-addressed, so cross-corpus
    * chunk dedup composes via qd01's hash-groupBy on `chunk_hash`).
    *
    * Output: (doc_id, chunk_idx, n_tokens, chunk_hash). Empty/null
    * documents produce zero chunks.
    */
  def chunkTokens(
      df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1, got $chunkSize")
    require(stride >= 1 && stride <= chunkSize,
      s"stride must be in [1, chunkSize], got $stride")
    df.filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("w"))
      .withColumn("n_chunks",
        expr(s"CAST(1 + (greatest(size(w) - $chunkSize, 0) + ${stride - 1}) " +
          s"div $stride AS INT)"))
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(0), col("n_chunks") - 1)).as("k"))
      .select(col("doc_id"), col("k").cast("long").as("chunk_idx"),
        slice(col("w"), col("k") * stride + 1, lit(chunkSize)).as("c"))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("c")).cast("long").as("n_tokens"),
        md5(array_join(col("c"), " ").cast("binary")).as("chunk_hash"))
  }

  /** Token counting: whitespace tokens and a BPE-ish regex token count
    * (letter runs / digit runs / single punctuation marks). */
  def tokenCountColumns(text: Column): Seq[Column] = Seq(
    size(split(trim(text), "\\s+")).cast("long").as("n_ws_tokens"),
    size(regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))
      .cast("long").as("n_regex_tokens"),
    length(text).cast("long").as("n_chars_measured"))

  /** Top-k TF-IDF terms per document — the one operator in this file
    * that shuffles (term statistics are corpus-level by definition):
    * explode to (doc, term) occurrence rows, partial-agg term
    * frequencies, aggregate document frequencies from the tf table
    * (already one row per (doc, term) — no second corpus scan), join
    * back on the term and rank per document.
    *
    * idf is the RATIONAL form n_docs/df, not log(n_docs/df): ranking
    * is order-isomorphic (log is monotone) and the score stays a
    * two-operation IEEE expression — (tf·n)/df — that any engine
    * reproduces bit-exactly, where libm log ulp differences would
    * break reproducibility. At 100 TB the df table is corpus-sized:
    * it equi-joins (no broadcast assumption) and a df-cut drops
    * stop-terms before the join if vocabulary skew ever shows.
    *
    * @param maxDocFreq optional stop-term cut: terms present in more
    *   than this many documents never reach the scoring join — the
    *   df-table skew bound for web-scale vocabularies. None keeps the
    *   exact (oracle-checked) semantics. */
  def tfIdfTopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      maxDocFreq: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // The tokenized projection is every downstream input (df table,
    // scoring join, corpus count), so cache it: the raw corpus is
    // scanned ONCE — the n_docs count below reads the cached tf, not
    // the input again (a second full pass at 100 TB otherwise).
    // coalesce keeps null-text docs in the frame (split(null) would
    // drop them), so the tf-derived corpus count equals docs.count().
    val tf = graft.core.OpCache.persist(docs
      .select(col(idCol).as("doc_id"),
        explode(split(coalesce(col(textCol), lit("")), " ")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("long").as("tf")))
    val dfAll = tf.groupBy(col("term")).agg(count(lit(1)).cast("long").as("df"))
    val dfT = maxDocFreq match {
      case None => dfAll
      case Some(cut) => dfAll.filter(col("df") <= cut)
    }
    // corpus size resolves to a literal (one count job at build time,
    // against the cached tf): a 1-row crossJoin would carry the same
    // value but plans as a nested-loop join, which the plan audit
    // rightly refuses anywhere
    val nDocs = tf.select(countDistinct(col("doc_id")))
      .head.getLong(0).toDouble
    val scored = tf.join(dfT, Seq("term"))
      .select(col("doc_id"), col("term"),
        ((col("tf").cast("double") * lit(nDocs)) /
          col("df").cast("double")).as("score"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("term"), col("score"), col("rnk"))
  }

  /** BM25 keyword search over the corpus — the retrieval face of the
    * text surface (inspecting a training corpus IS a search problem):
    * score every document against a fixed query term set, return the
    * global top-k. Uses the Lucene idf form ln(1 + (n−df+0.5)/(df+0.5))
    * (always positive — the classic Robertson idf goes negative for
    * terms in over half the corpus, which a 40-word synthetic
    * vocabulary hits constantly).
    *
    * Scale shape: one cached tokenized scan feeds doc lengths, the
    * corpus stats, and the query-term tf rows (the `isInCollection`
    * prune keeps the explode output query-sized, not corpus-sized);
    * df and the per-term join are tiny (≤ |query| rows); the global
    * top-k is orderBy+limit (TakeOrderedAndProject — per-partition
    * heaps + one k-row merge, never a single-reducer global window).
    *
    * Determinism: the only libm call is ln(); per-(doc,term) scores
    * quantize to DECIMAL(30,6) BEFORE the cross-term sum
    * (order-invariant) and the output rounds to 6 decimals — the qm01
    * discipline that absorbs libm ulp differences across engines.
    * Ties rank by doc_id, so the top-k set is total-ordered. */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      query: Seq[String],
      k: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(query.nonEmpty, "query terms must be non-empty")
    val base = graft.core.OpCache.persist(docs.select(
      col(idCol).as("doc_id"),
      split(coalesce(col(textCol), lit("")), " ").as("w")))
    val dl = base.select(col("doc_id"), size(col("w")).cast("long").as("dl"))
    val st = dl.agg(
      count(lit(1)).cast("double").as("n"),
      graft.expr.Exprs.exactAvg(col("dl").cast("double")).as("avgdl")).head()
    val n = st.getDouble(0)
    val avgdl = st.getDouble(1)
    val tf = base.select(col("doc_id"), explode(col("w")).as("term"))
      .filter(col("term").isInCollection(query))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("long").as("tf"))
    val dfT = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))
    val termScore =
      log(lit(1.0) + (lit(n) - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
        (col("tf").cast("double") * lit(k1 + 1.0)) /
        (col("tf").cast("double") +
          lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / lit(avgdl)))
    tf.join(dfT, Seq("term"))
      .join(dl, Seq("doc_id"))
      .select(col("doc_id"), termScore.cast(DecimalType(30, 6)).as("s"))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("s")).cast("double"), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Corpus-frequency rarity score — the CCNet-style quality signal:
    * how common a document's vocabulary is across the corpus. Each
    * document's DISTINCT tokens join the corpus document-frequency
    * table; the score is mean df = Σ df / n_types — one exact BIGINT
    * sum and one IEEE division, engine-exact. (A production CCNet
    * filter scores LM perplexity; this is the rational surrogate —
    * monotone in every token's corpus frequency, no libm — and the
    * pipeline seam is identical: a per-token corpus statistic joined
    * back, aggregated per document, thresholded downstream. Natural
    * text scores high; hash-garbage and boilerplate-free junk score
    * low because their tokens appear nowhere else.)
    *
    * Scale shape: distinct-per-doc happens BEFORE the explode
    * (array_distinct is narrow), the df build is a hash agg with
    * map-side partials (hot stopwords collapse to one row per map
    * task), and the df join back is an equi-join on the token. The
    * token key is Zipfian — at web scale enable AQE skew-join or
    * broadcast the head of the vocabulary (df is tiny per term; only
    * the join fan-in is hot) — same mitigation family as qd04's
    * df-cut. The final per-doc aggregate is uniform in doc_id. */
  def rarityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = graft.core.OpCache.persist(docs.select(
      col(idCol).as("doc_id"),
      explode(array_distinct(split(coalesce(col(textCol), lit("")), " ")))
        .as("token")))
    val dfT = tok.groupBy(col("token")).agg(count(lit(1)).cast("long").as("df"))
    tok.join(dfT, Seq("token"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_types"),
        sum(col("df")).cast("long").as("sum_df"))
      .select(col("doc_id"), col("n_types"), col("sum_df"),
        (col("sum_df").cast("double") / col("n_types").cast("double"))
          .as("mean_df"))
  }

  /** Unigram token entropy per document — the information-density
    * quality signal (low entropy = repetitive/template text, the same
    * family as qt06's repetition rules but distribution-level):
    * H = −Σ p·log2(p) over the document's token distribution.
    *
    * Determinism discipline (the bm25TopK pattern): the only libm
    * call is log2; each token's contribution quantizes to
    * DECIMAL(30,6) BEFORE the cross-token sum (order-invariant exact
    * addition) and the output rounds to 6 decimals, absorbing log2
    * ulp differences across engines. Shape: one explode + two hash
    * aggs + one equi-join back on the doc — linear, uniform keys. */
  def tokenEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val tf = docs.select(col(idCol).as("doc_id"),
        explode(split(coalesce(col(textCol), lit("")), " ")).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).cast("long").as("tf"))
    val n = tf.groupBy(col("doc_id")).agg(sum(col("tf")).cast("long").as("n"))
    val p = col("tf").cast("double") / col("n").cast("double")
    tf.join(n, Seq("doc_id"))
      .select(col("doc_id"), col("n"),
        (-(p * log2(p))).cast(DecimalType(30, 6)).as("s"))
      .groupBy(col("doc_id"))
      .agg(max(col("n")).cast("long").as("n_tokens"),
        round(sum(col("s")).cast("double"), 6).as("entropy"))
  }

  /** Bigram language-model perplexity — the CCNet-style quality
    * filter: score each document by the mean surprisal (bits/bigram)
    * of its word bigrams under an add-one-smoothed bigram LM trained
    * on the CORPUS ITSELF. Template/boilerplate text scores low
    * (predictable), lorem-garbage scores high — the standard
    * perplexity-filtering signal, self-trained so no external model.
    *
    * Model: P(w2|w1) = (c2(w1,w2) + 1) / (c1(w1) + V) with c1 the
    * bigram-PREFIX count (Σ_w2 c2 — histories, not raw unigrams, so
    * probabilities normalize over the V-word vocabulary exactly) and
    * V = |distinct corpus tokens|. Surprisal per bigram
    * log2(c1+V) − log2(c2+1) quantizes to DECIMAL(30,6) BEFORE the
    * order-invariant sum (the BM25/entropy libm-ulp discipline);
    * output rounds to 6.
    *
    * Scale shape: bigram counting is one hash agg on the (w1,w2) key
    * (Zipfian — the qt15 mitigation family applies: AQE skew join or
    * broadcasting the head of the distribution); scoring is one join
    * of doc-bigrams against the count tables; V is a 1-row broadcast.
    * Docs with < 2 tokens carry no bigrams and are excluded. */
  /** (w1, w2) adjacent-pair structs from a token array — the zipped
    * shifted-slice construction (Dedup.wordGrams' speedup applied to
    * struct pairs): one arraycopy + one struct per element instead of
    * two element_at lookups per position. Tail position (no
    * successor) zips against null and is filtered. */
  private def wordPairs(w: Column): Column =
    filter(
      zip_with(w, slice(w, lit(2), greatest(size(w) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2"))),
      p => p.getField("w2").isNotNull)

  def ngramPerplexity(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val toks = docs.select(col(idCol).as("doc_id"),
      split(coalesce(col(textCol), lit("")), " ").as("w"))
    val big = graft.core.OpCache.persist(
      toks.filter(size(col("w")) >= 2)
        .select(col("doc_id"), explode(wordPairs(col("w"))).as("bg"))
        .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2")))
    val bgc = big.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).cast("long").as("c2"))
    val pre = big.groupBy(col("w1")).agg(count(lit(1)).cast("long").as("c1"))
    val vocab = toks.select(explode(col("w")).as("t"))
      .agg(countDistinct(col("t")).cast("double").as("v"))
    big.join(bgc, Seq("w1", "w2")).join(pre, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        (log2(col("c1").cast("double") + col("v")) -
          log2(col("c2").cast("double") + 1.0))
          .cast(DecimalType(30, 6)).as("s"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        round(sum(col("s")).cast("double") / count(lit(1)).cast("double"), 6)
          .as("bits_per_bigram"))
  }

  /** Pointwise-mutual-information collocations — the vocabulary-mining
    * pass that surfaces multi-word terms ("new york", "machine
    * learning") from a raw corpus: top-k word bigrams by
    * PMI = log2(P(w1,w2) / (P(w1)·P(w2))), estimated from corpus
    * bigram counts with prefix/suffix marginals, restricted to
    * bigrams seen ≥ `minCount` times (PMI is noise below a support
    * floor). Tie-break and boundary are deterministic: ordered by
    * (rounded pmi DESC, w1, w2), the log2 argument is the single
    * expression c2·N / (c1l·c1r) evaluated in the same operation
    * order on both engines, and the result quantizes to 6 places
    * before the sort so the top-k cut can't straddle a ULP.
    *
    * Scale shape: one Zipfian-keyed hash agg for c2 (qt15's skew
    * mitigations apply), two aggs OVER the distinct-bigram table (not
    * the corpus) for the marginals, a 1-row broadcast for N, and a
    * TakeOrdered top-k — no global sort ever materializes. */
  def pmiCollocations(
      docs: DataFrame, idCol: String, textCol: String,
      minCount: Int = 5, topK: Int = 100): DataFrame = {
    val toks = docs.select(
      split(coalesce(col(textCol), lit("")), " ").as("w"))
    val big = toks.filter(size(col("w")) >= 2)
      .select(explode(wordPairs(col("w"))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val bgc = graft.core.OpCache.persist(
      big.groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).cast("long").as("c2")))
    val lm = bgc.groupBy(col("w1")).agg(sum(col("c2")).as("c1l"))
    val rm = bgc.groupBy(col("w2")).agg(sum(col("c2")).as("c1r"))
    val tot = bgc.agg(sum(col("c2")).as("n"))
    bgc.filter(col("c2") >= minCount)
      .join(lm, Seq("w1")).join(rm, Seq("w2"))
      .crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("c2"),
        round(log2(col("c2").cast("double") * col("n").cast("double") /
          (col("c1l").cast("double") * col("c1r").cast("double"))), 6)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** Per-source distribution drift: Jensen–Shannon divergence (bits)
    * between each source's unigram distribution P and the corpus-wide
    * distribution Q — the monitor that catches a source going off-mix
    * (scraper broke, spam flood, template takeover) between corpus
    * snapshots. Linear in sources, NOT pairwise: production drift
    * detection compares against the reference mix, so cost never
    * squares in the source count.
    *
    * The absent-token mass is folded CLOSED-FORM: for a corpus token
    * the source lacks, p = 0, m = q/2, and the Q-side term
    * q·log2(q/m) collapses to q — so
    *
    *   JS = ½·Σ_present p·log2(p/m) + ½·(Σ_present q·log2(q/m)
    *        + (1 − Σ_present q))
    *
    * needs ONLY (source, present-token) rows. The naive source×vocab
    * expansion this avoids is the difference between |tf| rows and
    * |sources|·|vocab| rows — at 10⁵ sources × 10⁸ vocab, the
    * difference between a join and an impossibility.
    *
    * Determinism: the qt16 libm discipline — each term quantizes to
    * DECIMAL(30,6) BEFORE its order-invariant sum; output rounds to 6.
    * Shape: one explode, two hash aggs (source-token tf, global tf),
    * one broadcastable vocab join, one final agg per source. */
  def sourceDivergence(
      docs: DataFrame, sourceCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val tok = docs.select(col(sourceCol).as("source"),
      explode(split(coalesce(col(textCol), lit("")), " ")).as("token"))
    val tf = graft.core.OpCache.persist(
      tok.groupBy(col("source"), col("token"))
        .agg(count(lit(1)).cast("long").as("tf")))
    val ns = tf.groupBy(col("source")).agg(sum(col("tf")).cast("long").as("n"))
    val tfg = tf.groupBy(col("token")).agg(sum(col("tf")).cast("long").as("tfg"))
    val nTot = tfg.groupBy().agg(sum(col("tfg")).cast("long").as("n_tot"))
    val p = col("tf").cast("double") / col("n").cast("double")
    val q = col("tfg").cast("double") / col("n_tot").cast("double")
    val m = (p + q) / lit(2.0)
    val terms = tf
      .join(ns, Seq("source"))
      .join(tfg, Seq("token"))
      .crossJoin(broadcast(nTot))
      .select(col("source"),
        (p * log2(p / m)).cast(DecimalType(30, 6)).as("tp"),
        (q * log2(q / m)).cast(DecimalType(30, 6)).as("tq"),
        q.cast(DecimalType(30, 6)).as("qm"))
    terms.groupBy(col("source"))
      .agg(round(
        lit(0.5) * sum(col("tp")).cast("double") +
          lit(0.5) * (sum(col("tq")).cast("double") +
            (lit(1.0) - sum(col("qm")).cast("double"))), 6).as("js_bits"))
  }

  /** In-engine document embeddings via the HASHING TRICK — signed
    * feature hashing of tf·idf weights into a fixed `dims`-dim dense
    * vector (Weinberger et al., "Feature Hashing for Large Scale
    * Multitask Learning"): token t contributes sign(t)·tf·(n/df) to
    * dimension h(t) mod dims, where sign and dimension are disjoint
    * bits of the engine-wide md5 `hash60`. No external model, no
    * vocabulary table, no training pass — the map is pure arithmetic
    * on the token hash, so it is identical on every engine and every
    * partitioning, and NEW tokens hash somewhere without a vocab
    * update (the property that matters for a streaming corpus).
    *
    * Determinism: idf is the RATIONAL n/df (the bm25TopK argument —
    * no libm); each contribution quantizes to DECIMAL(30,6) before
    * the order-invariant per-dimension sum; the dense vector rounds
    * through FLOAT (one correctly-rounded cast both engines share).
    *
    * Shape: one explode + two hash aggs (doc-token tf, token df) +
    * one broadcastable df join + one (doc, dim) agg — all linear,
    * uniform keys. n derives from the tf relation (qt10's single-scan
    * lesson), counting every document (null text tokenizes to one
    * empty token, the engine-wide convention).
    *
    * @return (doc_id, vec: array<float> of length dims) */
  def hashedDocVectors(
      docs: DataFrame, idCol: String, textCol: String,
      dims: Int = 16): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(dims >= 2, s"dims must be >= 2, got $dims")
    val tf = graft.core.OpCache.persist(
      docs.select(col(idCol).as("doc_id"),
          explode(split(coalesce(col(textCol), lit("")), " ")).as("token"))
        .groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).cast("long").as("tf")))
    val dfreq = tf.groupBy(col("token"))
      .agg(count(lit(1)).cast("long").as("df"))
    val n = tf.select(col("doc_id")).distinct()
      .agg(count(lit(1)).cast("double").as("n"))
    val h = Dedup.hash60(col("token"))
    val sign = (h % 2) * 2 - 1
    val contrib = tf.join(dfreq, Seq("token")).crossJoin(broadcast(n))
      .select(col("doc_id"),
        // h div 2 via shiftright — h exceeds double's 53-bit exact
        // range, so a float division here would corrupt dimensions
        (shiftright(h, 1) % dims).cast("int").as("dim"),
        (sign.cast("double") * col("tf").cast("double") *
          (col("n") / col("df").cast("double")))
          .cast(DecimalType(30, 6)).as("w"))
    val cells = contrib.groupBy(col("doc_id"), col("dim"))
      .agg(sum(col("w")).cast("double").as("v"))
    cells.groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("dim"), col("v"))))
        .as("m"))
      .select(col("doc_id"),
        transform(sequence(lit(0), lit(dims - 1)),
          d => coalesce(element_at(col("m"), d), lit(0.0)).cast("float"))
          .as("vec"))
  }

  /** Semantic nearest neighbors over [[hashedDocVectors]] — the
    * text→vector composition closed entirely in-engine: embed every
    * document with the hashing trick, then rank cosine neighbors for
    * a query subset. The whole qs ladder (IVF/SQ/PQ, stored indexes,
    * rerank) accepts these vectors unchanged; this entry serves the
    * broadcast-linear form (query batch × corpus scan — linear in the
    * corpus, never a pair join). Zero-vector documents (possible when
    * signed contributions cancel exactly) never rank: cosine against
    * them is undefined, so they are filtered with norm > 0, not
    * passed through as NaN. */
  def hashedNeighbors(
      docs: DataFrame, idCol: String, textCol: String,
      queryFilter: org.apache.spark.sql.Column, k: Int,
      dims: Int = 16): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val vecs = graft.core.OpCache.persist(
      hashedDocVectors(docs, idCol, textCol, dims)
        .withColumn("nrm",
          sqrt(call_function("graft_vec_dot", col("vec"), col("vec"))))
        .filter(col("nrm") > 0))
    val q = vecs.filter(queryFilter)
    val scored = broadcast(q.select(col("doc_id").as("qid"),
        col("vec").as("qv"), col("nrm").as("qn")))
      .crossJoin(vecs.select(col("doc_id").as("cid"),
        col("vec").as("cv"), col("nrm").as("cn")))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        (call_function("graft_vec_dot", col("qv"), col("cv")) /
          (col("qn") * col("cn"))).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid").as("doc_id"), col("cid").as("nbr_id"),
        col("rnk").cast("long").as("rnk"))
  }

  /** Document fingerprints: exact content hash, an order-insensitive
    * bag-of-words hash, and a rolling-shingle minimizer (the min
    * 60-bit hash over 3-word shingles — the winnowing primitive). */
  def fingerprintColumns(text: Column): Seq[Column] = {
    val sorted = array_join(array_sort(array_distinct(split(lower(text), " "))), " ")
    val sh = Dedup.wordShingles(split(text, " "), 3)
    Seq(
      md5(text.cast("binary")).as("fp_content"),
      md5(sorted.cast("binary")).as("fp_bow"),
      array_min(transform(sh, s => Dedup.hash60(s))).as("fp_minimizer"))
  }
}
