package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{Dedup, TextAnalysis}

/** Dedup + text-analysis operators over the `documents` table — the
  * beyond-reference training-data-pipeline surface. Every oracle
  * mirrors the Spark algorithm exactly (same md5-derived 60-bit base
  * hash, same fold orders) so outputs hash-match bit-for-bit.
  */
object TextQueries {

  /** DuckDB replay of Logit.train(+score) over the documents table
    * (lang='en' labeling, 4096 buckets, 10 unrolled GD rounds) --
    * shared by qt33 (withLabel = true: the training-accuracy read)
    * and qst18 (withLabel = false: the streaming serve feed's
    * (doc_id, score, pred) contract). */
  private[queries] def logitOracle(withLabel: Boolean, rounds: Int = 10): String = {
        def sig(z: String): String =
          s"0.5 + CAST($z AS DOUBLE) / (2.0 * (1.0 + abs(CAST($z AS DOUBLE))))"
        def round(r: Int): String = {
          val p = r - 1
          s"""z$r AS (
            |  SELECT x.doc_id,
            |    CAST(8.0 * CAST(sum(CAST(x.x * CAST(coalesce(w.w, 0) AS DOUBLE)
            |      AS DECIMAL(30,6))) AS DOUBLE) + CAST(b.b AS DOUBLE)
            |      AS DECIMAL(30,6)) AS zq
            |  FROM x LEFT JOIN w$p w USING (bucket), b$p b
            |  GROUP BY x.doc_id, b.b),
            |r$r AS MATERIALIZED (
            |  SELECT z.doc_id,
            |    CAST(CAST(${sig("zq")} - y AS DECIMAL(30,6)) AS DOUBLE) AS r
            |  FROM z$r z JOIN yt USING (doc_id)),
            |g$r AS (
            |  SELECT bucket,
            |    CAST(sum(CAST(r * x AS DECIMAL(30,6))) AS DOUBLE) /
            |    CAST(sum(CAST(x AS DECIMAL(30,6))) AS DOUBLE) AS gs
            |  FROM x JOIN r$r USING (doc_id) GROUP BY 1),
            |w$r AS MATERIALIZED (
            |  SELECT coalesce(w.bucket, g.bucket) AS bucket,
            |    CAST(CAST(coalesce(w.w, 0) AS DOUBLE)
            |      - 1.0 * coalesce(g.gs, 0) AS DECIMAL(30,6)) AS w
            |  FROM w$p w FULL OUTER JOIN g$r g ON w.bucket = g.bucket),
            |b$r AS (
            |  SELECT CAST(CAST(b.b AS DOUBLE)
            |    - 1.0 * CAST(sum(CAST(r AS DECIMAL(30,6))) AS DOUBLE) / nd.nd
            |    AS DECIMAL(30,6)) AS b
            |  FROM r$r, b$p b, nd GROUP BY b.b, nd.nd)""".stripMargin
        }
        val finalSelect =
          if (withLabel)
            s"""SELECT doc_id, label, score,
              |  CASE WHEN score >= 0.5 THEN CAST(1 AS BIGINT)
              |       ELSE CAST(0 AS BIGINT) END AS pred
              |FROM (
              |  SELECT z.doc_id, CAST(y AS BIGINT) AS label,
              |    round(${sig("zq")}, 6) AS score
              |  FROM zf z JOIN yt USING (doc_id))""".stripMargin
          else
            s"""SELECT doc_id, score,
              |  CASE WHEN score >= 0.5 THEN CAST(1 AS BIGINT)
              |       ELSE CAST(0 AS BIGINT) END AS pred
              |FROM (
              |  SELECT z.doc_id, round(${sig("zq")}, 6) AS score
              |  FROM zf z)""".stripMargin
        s"""WITH ${logitChain(rounds)}
        |$finalSelect""".stripMargin
  }

  /** The logit training chain as composable CTEs (tokl ... zf) — the
    * body logitOracle wraps; qt34 composes curation stages after it. */
  private[queries] def logitChain(rounds: Int): String = {
        def sig(z: String): String =
          s"0.5 + CAST($z AS DOUBLE) / (2.0 * (1.0 + abs(CAST($z AS DOUBLE))))"
        def round(r: Int): String = {
          val p = r - 1
          s"""z$r AS (
            |  SELECT x.doc_id,
            |    CAST(8.0 * CAST(sum(CAST(x.x * CAST(coalesce(w.w, 0) AS DOUBLE)
            |      AS DECIMAL(30,6))) AS DOUBLE) + CAST(b.b AS DOUBLE)
            |      AS DECIMAL(30,6)) AS zq
            |  FROM x LEFT JOIN w$p w USING (bucket), b$p b
            |  GROUP BY x.doc_id, b.b),
            |r$r AS MATERIALIZED (
            |  SELECT z.doc_id,
            |    CAST(CAST(${sig("zq")} - y AS DECIMAL(30,6)) AS DOUBLE) AS r
            |  FROM z$r z JOIN yt USING (doc_id)),
            |g$r AS (
            |  SELECT bucket,
            |    CAST(sum(CAST(r * x AS DECIMAL(30,6))) AS DOUBLE) /
            |    CAST(sum(CAST(x AS DECIMAL(30,6))) AS DOUBLE) AS gs
            |  FROM x JOIN r$r USING (doc_id) GROUP BY 1),
            |w$r AS MATERIALIZED (
            |  SELECT coalesce(w.bucket, g.bucket) AS bucket,
            |    CAST(CAST(coalesce(w.w, 0) AS DOUBLE)
            |      - 1.0 * coalesce(g.gs, 0) AS DECIMAL(30,6)) AS w
            |  FROM w$p w FULL OUTER JOIN g$r g ON w.bucket = g.bucket),
            |b$r AS (
            |  SELECT CAST(CAST(b.b AS DOUBLE)
            |    - 1.0 * CAST(sum(CAST(r AS DECIMAL(30,6))) AS DOUBLE) / nd.nd
            |    AS DECIMAL(30,6)) AS b
            |  FROM r$r, b$p b, nd GROUP BY b.b, nd.nd)""".stripMargin
        }
        s"""tokl AS MATERIALIZED (
        |  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS a,
        |    CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS DOUBLE) AS y
        |  FROM documents),
        |feats AS (
        |  SELECT doc_id, unnest(a) AS f FROM tokl
        |  UNION ALL
        |  SELECT doc_id, a[t.i] || ' ' || a[t.i + 1] AS f
        |  FROM tokl, unnest(range(1, len(a))) t(i)),
        |tf AS (
        |  SELECT doc_id, ${dkHash60("f")} % 4096 AS bucket,
        |    CAST(count(*) AS BIGINT) AS tf
        |  FROM feats GROUP BY 1, 2),
        |nper AS (SELECT doc_id, CAST(sum(tf) AS DOUBLE) AS n FROM tf GROUP BY 1),
        |x AS MATERIALIZED (
        |  SELECT tf.doc_id, bucket, CAST(tf AS DOUBLE) / n AS x
        |  FROM tf JOIN nper USING (doc_id)),
        |yt AS (SELECT doc_id, y FROM tokl),
        |nd AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM yt),
        |w0 AS (SELECT CAST(-1 AS BIGINT) AS bucket, CAST(0 AS DECIMAL(30,6)) AS w),
        |b0 AS (SELECT CAST(0 AS DECIMAL(30,6)) AS b),
        |${(1 to rounds).map(round).mkString(",\n")},
        |zf AS (
        |  SELECT x.doc_id,
        |    CAST(8.0 * CAST(sum(CAST(x.x * CAST(coalesce(w.w, 0) AS DOUBLE)
        |      AS DECIMAL(30,6))) AS DOUBLE) + CAST(b.b AS DOUBLE)
        |      AS DECIMAL(30,6)) AS zq
        |  FROM x LEFT JOIN w$rounds w USING (bucket), b$rounds b
        |  GROUP BY x.doc_id, b.b)""".stripMargin
  }

  /** DuckDB replay of Overlap.spanDedupRewrite over documents (n=5) —
    * shared by qd32 (batch) and qst19 (the streaming serve, whose
    * double-delivered distinct output must equal the same rewrite). */
  private[queries] def spanRewriteOracle: String =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |g AS (SELECT doc_id, t.i AS i,
      |        ${dkHash60("concat(w[t.i],' ',w[t.i+1],' ',w[t.i+2],' ',w[t.i+3],' ',w[t.i+4])")} AS gh
      |      FROM w, unnest(range(1, len(w) - 3)) t(i) WHERE len(w) >= 5),
      |dup AS (SELECT gh FROM g GROUP BY gh HAVING count(*) >= 2),
      |cov AS (SELECT DISTINCT g.doc_id, t.p AS p
      |        FROM g JOIN dup USING (gh), unnest(range(g.i, g.i + 5)) t(p)),
      |words AS (SELECT doc_id, t.p AS p, w[t.p] AS word
      |          FROM w, unnest(range(1, len(w) + 1)) t(p)),
      |kept AS (SELECT wo.doc_id, wo.p, wo.word FROM words wo
      |         LEFT JOIN cov ON wo.doc_id = cov.doc_id AND wo.p = cov.p
      |         WHERE cov.p IS NULL),
      |agg AS (SELECT doc_id, string_agg(word, ' ' ORDER BY p) AS text,
      |               CAST(count(*) AS BIGINT) AS n_kept FROM kept GROUP BY doc_id)
      |SELECT w.doc_id, coalesce(agg.text, '') AS text,
      |  CAST(len(w.w) AS BIGINT) AS n_words,
      |  CAST(len(w.w) - coalesce(agg.n_kept, 0) AS BIGINT) AS n_removed
      |FROM w LEFT JOIN agg USING (doc_id)""".stripMargin

  // DuckDB rendition of Dedup.hash60
  private[queries] def dkHash60(e: String): String =
    s"CAST(concat('0x', substr(md5($e), 1, 15)) AS BIGINT)"

  /** DuckDB replay of Bpe.trainBpe (shared by qt27/qt28): the word-
    * frequency table, STX·c·ETX delimited symbol strings, and `rounds`
    * unrolled merge rounds — pair count → (cnt DESC, l, r) argmax →
    * left-to-right `replace` (SQL replace is non-overlapping left-to-
    * right, exactly greedy BPE merge application). MATERIALIZED per
    * round for the same inlining reason as [[kcoreOracle]]. */
  private def bpeCtes(rounds: Int): String = {
    val roundCtes = (1 to rounds).map { r =>
      s"""p$r AS (
         |  SELECT a[t.i] AS l, a[t.i + 1] AS r, CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM (SELECT freq, string_split(sym[2:-2], chr(3) || chr(2)) AS a
         |        FROM s${r - 1}),
         |    unnest(range(1, len(a))) t(i)
         |  GROUP BY 1, 2),
         |m$r AS (SELECT l, r, cnt FROM p$r ORDER BY cnt DESC, l, r LIMIT 1),
         |s$r AS MATERIALIZED (
         |  SELECT word, freq,
         |    replace(sym, chr(2) || m.l || chr(3) || chr(2) || m.r || chr(3),
         |      chr(2) || m.l || m.r || chr(3)) AS sym
         |  FROM s${r - 1}, m$r m)""".stripMargin
    }.mkString(",\n")
    s"""wf AS MATERIALIZED (
       |  SELECT word, CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
       |  WHERE len(word) > 0 GROUP BY 1),
       |s0 AS MATERIALIZED (
       |  SELECT word, freq,
       |    array_to_string(list_transform(string_split(word, ''),
       |      c -> chr(2) || c || chr(3)), '') AS sym
       |  FROM wf),
       |$roundCtes""".stripMargin
  }

  /** DuckDB replay of GraphRank.labelPropagation over the qd18
    * maxDist=1 name-edit graph: `rounds` unrolled synchronous rounds,
    * each a neighbor-label count + (count DESC, label ASC) argmax +
    * isolated-node fallback. MATERIALIZED for the same inlining
    * reason as [[kcoreOracle]]. */
  private def lpaOracle(rounds: Int): String = {
    val roundCtes = (1 to rounds).map { r =>
      s"""v$r AS (
         |  SELECT s.u, l.label, count(*) AS c
         |  FROM sym s JOIN l${r - 1} l ON l.node_id = s.v
         |  GROUP BY 1, 2),
         |w$r AS (
         |  SELECT u, label FROM v$r
         |  QUALIFY row_number() OVER (PARTITION BY u ORDER BY c DESC, label) = 1),
         |l$r AS MATERIALIZED (
         |  SELECT n.node_id, coalesce(w.label, n.node_id) AS label
         |  FROM ids n LEFT JOIN w$r w ON w.u = n.node_id)""".stripMargin
    }.mkString(",\n")
    s"""WITH s AS (
       |  SELECT p_partkey AS sid, p_name AS str, length(p_name) AS len,
       |    string_split(p_name, ' ')[1] AS k1,
       |    string_split(p_name, ' ')[-1] AS k2
       |  FROM part),
       |b1 AS (SELECT sid, str, len, k1 FROM s
       |       QUALIFY row_number() OVER (PARTITION BY k1 ORDER BY sid) <= 500),
       |b2 AS (SELECT sid, str, len, k2 FROM s
       |       QUALIFY row_number() OVER (PARTITION BY k2 ORDER BY sid) <= 500),
       |cand AS (
       |  SELECT a.sid AS a_id, b.sid AS b_id, a.str AS sa, b.str AS sb
       |  FROM b1 a JOIN b1 b ON a.k1 = b.k1 AND a.sid < b.sid
       |    AND abs(a.len - b.len) <= 1
       |  UNION
       |  SELECT a.sid AS a_id, b.sid AS b_id, a.str AS sa, b.str AS sb
       |  FROM b2 a JOIN b2 b ON a.k2 = b.k2 AND a.sid < b.sid
       |    AND abs(a.len - b.len) <= 1),
       |e AS (SELECT a_id, b_id FROM cand WHERE levenshtein(sa, sb) <= 1),
       |sym AS MATERIALIZED (SELECT a_id AS u, b_id AS v FROM e
       |       UNION ALL SELECT b_id, a_id FROM e),
       |ids AS MATERIALIZED (SELECT DISTINCT p_partkey AS node_id FROM part),
       |l0 AS (SELECT node_id, node_id AS label FROM ids),
       |$roundCtes
       |SELECT node_id, label FROM l$rounds""".stripMargin
  }

  /** DuckDB replay of GraphRank.kCore on the bipartite order–part
    * graph: `rounds` unrolled peel rounds (degree agg → survivor
    * filter → edge restriction), then degrees over the final edge
    * set — the same fixed-round unrolling discipline as the Lloyd
    * rounds in SimilarityQueries. */
  private def kcoreOracle(k: Int, rounds: Int): String = {
    // AS MATERIALIZED: each e_r is referenced three times by round
    // r+1 — inlining would expand e0 3^rounds times (and exhaust file
    // handles re-opening the parquet); materialization keeps the
    // oracle linear, mirroring the Spark side's per-round lineage cut
    val roundCtes = (1 to rounds).map { r =>
      s"""d$r AS MATERIALIZED (SELECT u AS n, count(*) AS d FROM
         |  (SELECT a_id AS u FROM e${r - 1} UNION ALL SELECT b_id FROM e${r - 1})
         |  GROUP BY 1),
         |v$r AS (SELECT n FROM d$r WHERE d >= $k),
         |e$r AS MATERIALIZED (SELECT p.a_id, p.b_id FROM e${r - 1} p
         |  JOIN v$r va ON p.a_id = va.n JOIN v$r vb ON p.b_id = vb.n)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey AS a_id,
       |    CAST(l_partkey AS BIGINT) + 1000000000 AS b_id
       |  FROM lineitem),
       |$roundCtes
       |SELECT u AS node_id, CAST(count(*) AS BIGINT) AS degree FROM
       |  (SELECT a_id AS u FROM e$rounds UNION ALL SELECT b_id FROM e$rounds)
       |GROUP BY 1""".stripMargin
  }

  /** DuckDB rendition of Dedup.lshNearDupPairs (16 hashes, 4×4 bands,
    * jaccard ≥ 0.5): the CTE chain producing candidate pairs, and the
    * verified-pair SELECT. Shared by qd02 (pairs), qd10 (clusters =
    * connected components over the same pairs) and qd11 (clusters over
    * exact-dup representatives — `src` parameterizes the corpus). */
  /** The full decontaminated-pipeline oracle (qt17); qt36 wraps it
    * as a nested-WITH subquery and appends the shard manifest. */
  private def decontPipelineOracle: String =
    s"""WITH corp AS (
          |  SELECT * FROM documents WHERE doc_id % 50 <> 0),
          |${curationCtes("corp")},
          |curated AS (
          |  SELECT doc_id FROM (
          |    SELECT doc_id, row_number() OVER (
          |      PARTITION BY redacted_md5 ORDER BY doc_id) AS rn FROM red)
          |  WHERE rn = 1),
          |d2 AS (
          |  SELECT d.doc_id, d.text, d.source FROM corp d
          |  JOIN curated USING (doc_id)),
          |wdc AS (
          |  SELECT doc_id, string_split(text, ' ') AS w FROM d2
          |  WHERE len(string_split(text, ' ')) >= 6),
          |hsc AS (
          |  SELECT doc_id,
          |    list_transform(
          |      list_transform(range(1, len(w) - 1),
          |        i -> concat(w[i], ' ', w[i+1], ' ', w[i+2])),
          |      g -> ${dkHash60("g")}) AS h
          |  FROM wdc),
          |cfp AS (
          |  SELECT doc_id, unnest(list_distinct(
          |    list_transform(range(1, len(h) - 2),
          |      i -> list_min(list_slice(h, i, i + 3))))) AS fp
          |  FROM hsc),
          |wdb AS (
          |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
          |  WHERE doc_id % 50 = 0 AND len(string_split(text, ' ')) >= 6),
          |hsb AS (
          |  SELECT doc_id,
          |    list_transform(
          |      list_transform(range(1, len(w) - 1),
          |        i -> concat(w[i], ' ', w[i+1], ' ', w[i+2])),
          |      g -> ${dkHash60("g")}) AS h
          |  FROM wdb),
          |bfp AS (
          |  SELECT DISTINCT unnest(list_distinct(
          |    list_transform(range(1, len(h) - 2),
          |      i -> list_min(list_slice(h, i, i + 3))))) AS fp
          |  FROM hsb),
          |contaminated AS (
          |  SELECT DISTINCT doc_id FROM cfp WHERE fp IN (SELECT fp FROM bfp)),
          |clean AS (
          |  SELECT d2.* FROM d2
          |  WHERE d2.doc_id NOT IN (SELECT doc_id FROM contaminated)),
          |reps AS (SELECT min(doc_id) AS doc_id FROM clean GROUP BY md5(text)),
          |d3 AS (SELECT clean.doc_id, clean.text FROM clean JOIN reps USING (doc_id)),
          |${lshCtes("d3")},
          |pairs AS ($lshPairSelect),
          |kept AS (
          |  SELECT r.doc_id FROM reps r
          |  WHERE r.doc_id NOT IN (SELECT DISTINCT b_id FROM pairs)),
          |mixed AS (
          |  SELECT clean.doc_id, clean.text FROM clean JOIN kept USING (doc_id)
          |  WHERE ${dkHash60("concat(CAST(clean.doc_id AS VARCHAR), ':', clean.source)")} % 1000 <
          |    CASE clean.source WHEN 'src0' THEN 900 WHEN 'src1' THEN 700
          |      WHEN 'src2' THEN 500 WHEN 'src3' THEN 200 ELSE 100 END),
          |base AS (
          |  SELECT doc_id, ${dkHash60("CAST(doc_id AS VARCHAR)")} % 4 AS stratum,
          |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
          |  FROM mixed),
          |packed AS (
          |  SELECT doc_id, stratum, n_tokens,
          |    sum(n_tokens) OVER (PARTITION BY stratum ORDER BY doc_id
          |      ROWS UNBOUNDED PRECEDING) - n_tokens AS start_tok
          |  FROM base)
          |SELECT doc_id, stratum, n_tokens,
          |  CAST(floor(start_tok / 1024) AS BIGINT) AS seq_id,
          |  CAST(start_tok % 1024 AS BIGINT) AS seq_offset
          |FROM packed""".stripMargin

  /** DuckDB replay of Curation.dualDecontaminationReport's two
    * channels (corpus = doc_id % 50 <> 0, bench = % 50 = 0, winnowing
    * n=3/window=4, bench-indexed IVF stride 3 / nProbe 2) — CTE chain
    * ending at `surf` (doc_id, n_shared_fp) and `sem`
    * (doc_id, max_cos). Shared by qt42 (per-doc audit) and qt43
    * (rate rollup). */
  private def dualDecontCtes: String =
    s"""wd AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |  WHERE len(string_split(text, ' ')) >= 6),
      |hs AS (
      |  SELECT doc_id,
      |    list_transform(
      |      list_transform(range(1, len(w) - 1),
      |        i -> concat(w[i], ' ', w[i+1], ' ', w[i+2])),
      |      g -> ${dkHash60("g")}) AS h
      |  FROM wd),
      |fp AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    list_transform(range(1, len(h) - 2),
      |      i -> list_min(list_slice(h, i, i + 3))))) AS fp
      |  FROM hs),
      |cfp AS (SELECT doc_id, fp FROM fp WHERE doc_id % 50 <> 0),
      |bfp AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 50 = 0),
      |shd AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared_fp
      |  FROM cfp WHERE fp IN (SELECT fp FROM bfp) GROUP BY 1),
      |surf AS (
      |  SELECT d.doc_id,
      |    CAST(coalesce(shd.n_shared_fp, 0) AS BIGINT) AS n_shared_fp
      |  FROM (SELECT doc_id FROM documents WHERE doc_id % 50 <> 0) d
      |  LEFT JOIN shd USING (doc_id)),
      |e AS (
      |  SELECT vec_id, embedding,
      |    sqrt(list_reduce(list_transform(embedding,
      |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
      |      (x, y) -> x + y)) AS nrm
      |  FROM embeddings),
      |be AS (SELECT * FROM e WHERE vec_id % 50 = 0),
      |ce AS (SELECT * FROM e WHERE vec_id % 50 <> 0),
      |cents AS (SELECT vec_id AS cent_id, embedding AS cemb, nrm AS cnrm
      |          FROM be WHERE vec_id % 3 = 0),
      |ar AS (
      |  SELECT be.vec_id, ct.cent_id,
      |    row_number() OVER (PARTITION BY be.vec_id ORDER BY
      |      list_reduce(list_transform(list_zip(be.embedding, ct.cemb),
      |        s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)),
      |        (x, y) -> x + y) / (be.nrm * ct.cnrm) DESC,
      |      ct.cent_id) AS rn
      |  FROM be, cents ct),
      |cells AS (
      |  SELECT be.vec_id, be.embedding, be.nrm, a.cent_id
      |  FROM be JOIN (SELECT vec_id, cent_id FROM ar WHERE rn = 1) a
      |    USING (vec_id)),
      |qr AS (
      |  SELECT ce.vec_id, ct.cent_id,
      |    row_number() OVER (PARTITION BY ce.vec_id ORDER BY
      |      list_reduce(list_transform(list_zip(ce.embedding, ct.cemb),
      |        s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)),
      |        (x, y) -> x + y) / (ce.nrm * ct.cnrm) DESC,
      |      ct.cent_id) AS rn
      |  FROM ce, cents ct),
      |p AS (
      |  SELECT ce.vec_id, ce.embedding, ce.nrm, pr.cent_id
      |  FROM ce JOIN (SELECT vec_id, cent_id FROM qr WHERE rn <= 2) pr
      |    USING (vec_id)),
      |sc AS (
      |  SELECT p.vec_id AS qid, cl.vec_id AS nbr,
      |    list_reduce(list_transform(list_zip(p.embedding, cl.embedding),
      |      s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)),
      |      (x, y) -> x + y) / (p.nrm * cl.nrm) AS cos
      |  FROM p JOIN cells cl ON p.cent_id = cl.cent_id
      |    AND p.vec_id <> cl.vec_id),
      |rr AS (
      |  SELECT qid, cos, row_number() OVER (PARTITION BY qid
      |    ORDER BY cos DESC, nbr) AS rn
      |  FROM sc),
      |sem AS (SELECT qid AS doc_id, round(cos, 6) AS max_cos
      |        FROM rr WHERE rn = 1)""".stripMargin

  private[queries] def lshCtes(src: String = "documents"): String =
    s"""sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, len(w)-1),
      |      i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))) AS shingles
      |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM $src)
      |  WHERE len(w) >= 3),
      |sigs AS (
      |  SELECT doc_id,
      |    list_transform(range(0, 16), j ->
      |      list_min(list_transform(prs, p -> (p[1] + j * p[2]) % 2305843009213693951))) AS sig
      |  FROM (
      |    SELECT doc_id,
      |      list_transform(list_transform(shingles, x -> md5(x)), h ->
      |        [CAST(concat('0x', substr(h, 1, 14)) AS BIGINT),
      |         CAST(concat('0x', substr(h, 15, 14)) AS BIGINT)]) AS prs
      |    FROM sh)),
      |bands AS (
      |  SELECT doc_id, b.band AS band,
      |    concat(CAST(sig[4*b.band+1] AS VARCHAR), ',', CAST(sig[4*b.band+2] AS VARCHAR), ',',
      |           CAST(sig[4*b.band+3] AS VARCHAR), ',', CAST(sig[4*b.band+4] AS VARCHAR)) AS bkey
      |  FROM sigs, (SELECT unnest(range(0, 4)) AS band) b),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS a_id, b2.doc_id AS b_id
      |  FROM bands a JOIN bands b2
      |    ON a.band = b2.band AND a.bkey = b2.bkey AND a.doc_id < b2.doc_id)""".stripMargin

  /** DuckDB replay of Dedup.corpusClusters (exact collapse-first +
    * LSH pairs over representatives + recursive component closure) —
    * CTE chain ending at `lab` = (doc_id, component). The caller must
    * open the statement with WITH RECURSIVE. Shared by
    * qd11/qd29/qd38. */
  private def clusterLabelCtes: String =
    s"""reps AS (SELECT min(doc_id) AS keep_id, md5(text) AS h
      |         FROM documents GROUP BY md5(text)),
      |hm AS (SELECT d.doc_id, r.keep_id FROM documents d
      |       JOIN reps r ON md5(d.text) = r.h),
      |repdocs AS (SELECT d.doc_id, d.text FROM documents d
      |            JOIN reps r ON d.doc_id = r.keep_id),
      |${lshCtes("repdocs")},
      |pairs AS ($lshPairSelect),
      |sym(s, t) AS (
      |  SELECT keep_id, doc_id FROM hm UNION SELECT doc_id, keep_id FROM hm
      |  UNION SELECT a_id, b_id FROM pairs UNION SELECT b_id, a_id FROM pairs),
      |r(s, t) AS (
      |  SELECT s, t FROM sym
      |  UNION
      |  SELECT r.s, sym.t FROM r JOIN sym ON r.t = sym.s),
      |lab AS (SELECT s AS doc_id, min(t) AS component FROM r GROUP BY s)"""
      .stripMargin

  private[queries] val lshPairSelect: String =
    """SELECT c.a_id, c.b_id,
      |  CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) /
      |  CAST(len(list_distinct(sa.shingles || sb.shingles)) AS DOUBLE) AS jaccard
      |FROM cand c
      |JOIN sh sa ON sa.doc_id = c.a_id
      |JOIN sh sb ON sb.doc_id = c.b_id
      |WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) /
      |      CAST(len(list_distinct(sa.shingles || sb.shingles)) AS DOUBLE) >= 0.5""".stripMargin

  /** DuckDB rendition of Curation.curate's CTE chain (lang filter →
    * quality → repetition → PII-redacted md5), ending at CTE `red`.
    * Shared by qt11 (curated table), qt13 (the composed training
    * pipeline) and qt17 (the decontaminated pipeline, which curates a
    * restricted corpus — `src` parameterizes the source relation). */
  private def curationCtes(src: String = "documents"): String =
    raw"""lf AS (
        |  SELECT doc_id, lang, text,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_types
        |  FROM $src WHERE lang IN ('en', 'es', 'fr')),
        |q AS (
        |  SELECT doc_id, lang, text, n_tokens FROM lf
        |  WHERE n_tokens >= 20 AND n_tokens <= 100000
        |    AND CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE) >= 0.15),
        |w2 AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM q),
        |g2 AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
        |         i -> concat(w[i], ' ', w[i+1]))) AS gram
        |       FROM w2 WHERE len(w) >= 2),
        |c2 AS (SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS cnt FROM g2 GROUP BY 1, 2),
        |top2 AS (SELECT doc_id,
        |           max({'c': cnt, 'ch': cnt * length(gram)}).ch AS top2_chars
        |         FROM c2 GROUP BY 1),
        |g3 AS (SELECT doc_id, unnest(list_transform(range(1, len(w)-1),
        |         i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))) AS gram
        |       FROM w2 WHERE len(w) >= 3),
        |c3 AS (SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS cnt FROM g3 GROUP BY 1, 2),
        |dup3 AS (SELECT doc_id,
        |           CAST(sum(CASE WHEN cnt >= 2 THEN cnt * length(gram) ELSE 0 END) AS BIGINT) AS dup3_chars,
        |           CAST(sum(cnt * length(gram)) AS BIGINT) AS all3_chars
        |         FROM c3 GROUP BY 1),
        |rep AS (
        |  SELECT q.doc_id FROM q
        |  LEFT JOIN top2 USING (doc_id) LEFT JOIN dup3 USING (doc_id)
        |  WHERE CAST(coalesce(top2_chars, 0) AS DOUBLE) / CAST(length(q.text) AS DOUBLE) <= 0.20
        |    AND CAST(coalesce(dup3_chars, 0) AS DOUBLE) / CAST(coalesce(all3_chars, 1) AS DOUBLE) <= 0.60),
        |red AS (
        |  SELECT q.doc_id, q.lang, q.n_tokens,
        |    md5(regexp_replace(regexp_replace(regexp_replace(q.text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
        |      '\+?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}', '<PHONE>', 'g')) AS redacted_md5
        |  FROM q JOIN rep ON q.doc_id = rep.doc_id)""".stripMargin

  val all: Seq[Q] = Seq(
    Q(
      "qd01_exact_dedup",
      "Exact dedup via content-hash groupBy: one shuffle on the hash, " +
        "representative = min id. The 100 TB version is identical — " +
        "hash partitioning spreads uniformly by construction.",
      (s, dir) =>
        Dedup.exactDupGroups(Tables.load(s, dir, "documents"), "doc_id", "text"),
      Some("""SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin)),

    Q(
      "qd02_minhash_lsh",
      "MinHash+LSH near-dup pairs (16 hashes, 4 bands × 4 rows, verify " +
        "jaccard ≥ 0.5 on 3-word shingles). Candidate generation is " +
        "linear; the band self-join is the only shuffle.",
      (s, dir) =>
        Dedup.lshNearDupPairs(Tables.load(s, dir, "documents"), "doc_id", "text",
          nShingle = 3, k = 16, bands = 4, threshold = 0.5),
      Some(s"WITH ${lshCtes()}\n$lshPairSelect")),

    Q(
      "qd03_simhash",
      "SimHash signatures (60-bit majority vote over distinct-token " +
        "hashes): narrow scan-transform, no shuffle; near-dup search is " +
        "then hamming distance over the signature.",
      (s, dir) =>
        Dedup.withSimhash(Tables.load(s, dir, "documents"), "text", "simhash")
          .select(col("doc_id"), col("simhash")),
      Some(s"""SELECT doc_id,
        |  CAST(list_sum(list_transform(range(0, 60), j ->
        |    CASE WHEN 2 * len(list_filter(hs, h -> (h & (CAST(1 AS BIGINT) << j)) <> 0)) > len(hs)
        |         THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS simhash
        |FROM (
        |  SELECT doc_id,
        |    list_transform(list_distinct(string_split(text, ' ')), x -> ${dkHash60("x")}) AS hs
        |  FROM documents)""".stripMargin)),

    Q(
      "qd06_simhash_pairs",
      "SimHash near-dup pairs: shingle-based 60-bit signatures, banded " +
        "into four 15-bit keys for candidate generation, exact hamming " +
        "verification (≤ 8). LSH-shaped plan: linear banding, bucket " +
        "combinations, verify only candidates.",
      (s, dir) =>
        Dedup.simhashNearDupPairs(Tables.load(s, dir, "documents"),
          "doc_id", "text", maxHamming = 8, nShingle = 3),
      Some(s"""WITH sigs AS (
        |  SELECT doc_id,
        |    CAST(list_sum(list_transform(range(0, 60), j ->
        |      CASE WHEN 2 * len(list_filter(hs, h2 -> (h2 & (CAST(1 AS BIGINT) << j)) <> 0)) > len(hs)
        |           THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS sh
        |  FROM (
        |    SELECT doc_id,
        |      list_transform(
        |        list_distinct(list_transform(range(1, len(w)-1),
        |          i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))),
        |        g -> ${dkHash60("g")}) AS hs
        |    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |    WHERE len(w) >= 3)),
        |banded AS (
        |  SELECT doc_id, b.band AS band, (sh >> (15 * b.band)) & 32767 AS bval
        |  FROM sigs, (SELECT unnest(range(0, 4)) AS band) b),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS a_id, c.doc_id AS b_id
        |  FROM banded a JOIN banded c
        |    ON a.band = c.band AND a.bval = c.bval AND a.doc_id < c.doc_id)
        |SELECT c.a_id, c.b_id,
        |  CAST(bit_count(xor(sa.sh, sb.sh)) AS BIGINT) AS hamming
        |FROM cand c
        |JOIN sigs sa ON sa.doc_id = c.a_id
        |JOIN sigs sb ON sb.doc_id = c.b_id
        |WHERE bit_count(xor(sa.sh, sb.sh)) <= 8""".stripMargin)),

    Q(
      "qd07_dedup_corpus",
      "End-to-end corpus dedup in production order: collapse exact " +
        "duplicates (hash shuffle, min-id representative), MinHash-LSH " +
        "near-dup pairs among representatives only, greedy keep (drop " +
        "the higher id of every verified pair). Output = kept ids.",
      (s, dir) =>
        Dedup.dedupCorpus(Tables.load(s, dir, "documents"), "doc_id", "text",
          nShingle = 3, k = 16, bands = 4, threshold = 0.5),
      Some(s"""WITH reps AS (
        |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
        |d2 AS (
        |  SELECT d.doc_id, d.text FROM documents d JOIN reps r ON d.doc_id = r.doc_id),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(w)-1),
        |      i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))) AS shingles
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM d2)
        |  WHERE len(w) >= 3),
        |sigs AS (
        |  SELECT doc_id,
        |    list_transform(range(0, 16), j ->
        |      list_min(list_transform(prs, p -> (p[1] + j * p[2]) % 2305843009213693951))) AS sig
        |  FROM (
        |    SELECT doc_id,
        |      list_transform(list_transform(shingles, x -> md5(x)), h ->
        |        [CAST(concat('0x', substr(h, 1, 14)) AS BIGINT),
        |         CAST(concat('0x', substr(h, 15, 14)) AS BIGINT)]) AS prs
        |    FROM sh)),
        |bands AS (
        |  SELECT doc_id, b.band AS band,
        |    concat(CAST(sig[4*b.band+1] AS VARCHAR), ',', CAST(sig[4*b.band+2] AS VARCHAR), ',',
        |           CAST(sig[4*b.band+3] AS VARCHAR), ',', CAST(sig[4*b.band+4] AS VARCHAR)) AS bkey
        |  FROM sigs, (SELECT unnest(range(0, 4)) AS band) b),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS a_id, b2.doc_id AS b_id
        |  FROM bands a JOIN bands b2
        |    ON a.band = b2.band AND a.bkey = b2.bkey AND a.doc_id < b2.doc_id),
        |dropped AS (
        |  SELECT DISTINCT c.b_id AS doc_id
        |  FROM cand c
        |  JOIN sh sa ON sa.doc_id = c.a_id
        |  JOIN sh sb ON sb.doc_id = c.b_id
        |  WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) /
        |        CAST(len(list_distinct(sa.shingles || sb.shingles)) AS DOUBLE) >= 0.5)
        |SELECT r.doc_id AS keep_id FROM reps r
        |WHERE r.doc_id NOT IN (SELECT doc_id FROM dropped)""".stripMargin)),

    Q(
      "qd04_shingle_jaccard",
      "Blocked exact n-gram jaccard near-dup pairs: block on " +
        "(lang, n_chars÷100), probe +1 bucket via exploded equi-join — " +
        "the scale-safe form of a length-band range join. Benched in " +
        "the skew-mitigated configuration: maxDocFreq=15 drops " +
        "stop-phrase shingles (df > 15) from the inverted index before " +
        "pair counting, so no single hot shingle hash can concentrate " +
        "a join partition; denominators keep the FULL set sizes (a " +
        "hot-shingle match never raises similarity, dropping it can " +
        "only lower it — conservative). The oracle replays the " +
        "identical cut, so the semantics stay gate-checked.",
      (s, dir) =>
        Dedup.blockedJaccardPairs(Tables.load(s, dir, "documents"),
          "doc_id", "text", "lang", "n_chars",
          bucketWidth = 100, nShingle = 3, threshold = 0.4,
          maxDocFreq = Some(15L)),
      Some(s"""WITH s AS (
        |  SELECT doc_id, lang, n_chars // 100 AS bkt,
        |    list_transform(
        |      list_distinct(list_transform(range(1, len(w)-1),
        |        i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))),
        |      g -> ${dkHash60("g")}) AS sh
        |  FROM (SELECT doc_id, lang, n_chars, string_split(text, ' ') AS w FROM documents)
        |  WHERE len(w) >= 3),
        |inv AS (
        |  SELECT doc_id, lang, bkt, len(sh) AS n_sh, unnest(sh) AS shh FROM s),
        |hot AS (SELECT shh FROM inv GROUP BY shh HAVING count(*) > 15),
        |invc AS (SELECT * FROM inv WHERE shh NOT IN (SELECT shh FROM hot)),
        |probe AS (
        |  SELECT *, unnest([bkt, bkt + 1]) AS jbkt FROM invc),
        |pairs AS (
        |  SELECT least(p.doc_id, q.doc_id) AS a_id,
        |    greatest(p.doc_id, q.doc_id) AS b_id,
        |    CASE WHEN p.doc_id < q.doc_id THEN p.n_sh ELSE q.n_sh END AS na,
        |    CASE WHEN p.doc_id < q.doc_id THEN q.n_sh ELSE p.n_sh END AS nb,
        |    count(*) AS inter
        |  FROM probe p JOIN invc q
        |    ON p.shh = q.shh AND p.jbkt = q.bkt AND p.lang = q.lang
        |   AND (p.bkt < q.bkt OR (p.bkt = q.bkt AND p.doc_id < q.doc_id))
        |   AND CAST(least(p.n_sh, q.n_sh) AS DOUBLE) >=
        |       0.4 * CAST(greatest(p.n_sh, q.n_sh) AS DOUBLE)
        |  GROUP BY 1, 2, 3, 4)
        |SELECT a_id, b_id,
        |  CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) AS jaccard
        |FROM pairs
        |WHERE CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) >= 0.4""".stripMargin)),

    Q(
      "qd05_kmv_distinct",
      "KMV bottom-k sketch (custom TypedImperativeAggregate): per-lang " +
        "distinct-shingle estimation from the 32 minimum hashes — the " +
        "mergeable sketch shape (map-side partials, order-invariant) " +
        "that replaces exact countDistinct when groups stop fitting " +
        "memory. Output carries estimate AND exact for the error to be " +
        "visible.",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        graft.functions.GraftFunctions.register(s)
        val k = 32
        val docs = Tables.load(s, dir, "documents")
        val sh = graft.core.Partitioning.parallelize(docs, col("doc_id"))
          .select(col("lang"), split(col("text"), " ").as("w"))
          .filter(size(col("w")) >= 3)
          .select(col("lang"),
            explode(graft.operators.Dedup.wordShingles(col("w"), 3)).as("sg"))
          .select(col("lang"), graft.operators.Dedup.hash60(col("sg")).as("h"))
        sh.groupBy(col("lang"))
          .agg(call_function("graft_bottom_k", col("h"), lit(k)).as("sk"),
            countDistinct(col("h")).as("exact_distinct"))
          .select(col("lang"),
            // try_element_at: a group with < k distinct hashes yields
            // null (ANSI element_at would throw), matching the oracle's
            // out-of-range list index -> NULL
            try_element_at(col("sk"), lit(k)).as("kth_min"),
            (lit((k - 1).toDouble) * pow(lit(2.0), lit(60.0)) /
              try_element_at(col("sk"), lit(k)).cast("double")).as("est_distinct"),
            col("exact_distinct"))
      },
      Some(s"""WITH sh AS (
        |  SELECT lang,
        |    unnest(list_distinct(list_transform(range(1, len(w)-1),
        |      i -> concat(w[i], ' ', w[i+1], ' ', w[i+2])))) AS sg
        |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents)
        |  WHERE len(w) >= 3),
        |h AS (SELECT lang, ${dkHash60("sg")} AS hv FROM sh),
        |agg AS (
        |  SELECT lang, list_sort(list(DISTINCT hv)) AS sorted,
        |    count(DISTINCT hv) AS exact_distinct
        |  FROM h GROUP BY lang)
        |SELECT lang, sorted[32] AS kth_min,
        |  CAST(31 AS DOUBLE) * power(CAST(2 AS DOUBLE), CAST(60 AS DOUBLE))
        |    / CAST(sorted[32] AS DOUBLE) AS est_distinct,
        |  exact_distinct
        |FROM agg""".stripMargin)),

    Q(
      "qd15_kmv_setops",
      "Sketch-based set algebra between sub-corpora: per-source KMV " +
        "(bottom-64) sketches of 3-shingle hashes, then pairwise " +
        "union/intersection/jaccard ESTIMATES computed from sketches " +
        "alone — the mergeable-sketch path for cross-corpus overlap " +
        "when exact distincts stop fitting (|union| from the merged " +
        "bottom-k, |intersect| = jaccard × union). The pair join runs " +
        "over the per-source sketch table — one row per source, " +
        "dim-sized by construction; the corpus-scale work is the one " +
        "partial-agg sketch build.",
      (s, dir) => {
        import org.apache.spark.sql.Column
        graft.functions.GraftFunctions.register(s)
        val k = 64
        val docs = Tables.load(s, dir, "documents")
        val sh = graft.core.Partitioning.parallelize(docs, col("doc_id"))
          .select(col("source"), split(col("text"), " ").as("w"))
          .filter(size(col("w")) >= 3)
          .select(col("source"),
            explode(Dedup.wordShingles(col("w"), 3)).as("sg"))
          .select(col("source"), Dedup.hash60(col("sg")).as("h"))
        val sk = sh.groupBy(col("source"))
          .agg(call_function("graft_bottom_k", col("h"), lit(k)).as("sk"))
        def est(c: Column): Column =
          when(size(c) < k, size(c).cast("double"))
            .otherwise(lit((k - 1).toDouble) * pow(lit(2.0), lit(60.0)) /
              element_at(c, k).cast("double"))
        val paired = sk.as("a").join(sk.as("b"), col("a.source") < col("b.source"))
          .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
            col("a.sk").as("ska"), col("b.sk").as("skb"),
            slice(array_sort(array_union(col("a.sk"), col("b.sk"))), 1, k).as("u"))
        val scored = paired.select(col("src_a"), col("src_b"),
          est(col("ska")).as("est_a"), est(col("skb")).as("est_b"),
          est(col("u")).as("est_union"),
          (size(filter(col("u"), x =>
            array_contains(col("ska"), x) && array_contains(col("skb"), x)))
            .cast("double") / size(col("u")).cast("double")).as("est_jaccard"))
        scored.withColumn("est_intersect", col("est_jaccard") * col("est_union"))
      },
      Some(s"""WITH w AS (
        |  SELECT source, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |g AS (
        |  SELECT DISTINCT source, ${dkHash60("sg")} AS h FROM (
        |    SELECT source, unnest(list_transform(range(1, len(w)-1),
        |      i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))) AS sg FROM w)),
        |sk AS (SELECT source, list_slice(list_sort(list(h)), 1, 64) AS sk
        |       FROM g GROUP BY source),
        |p AS (
        |  SELECT a.source AS src_a, b.source AS src_b, a.sk AS ska, b.sk AS skb,
        |    list_slice(list_sort(list_distinct(a.sk || b.sk)), 1, 64) AS u
        |  FROM sk a JOIN sk b ON a.source < b.source),
        |f AS (
        |  SELECT src_a, src_b,
        |    CASE WHEN len(ska) < 64 THEN CAST(len(ska) AS DOUBLE)
        |         ELSE CAST(63 AS DOUBLE) * power(CAST(2 AS DOUBLE), CAST(60 AS DOUBLE))
        |              / CAST(ska[64] AS DOUBLE) END AS est_a,
        |    CASE WHEN len(skb) < 64 THEN CAST(len(skb) AS DOUBLE)
        |         ELSE CAST(63 AS DOUBLE) * power(CAST(2 AS DOUBLE), CAST(60 AS DOUBLE))
        |              / CAST(skb[64] AS DOUBLE) END AS est_b,
        |    CASE WHEN len(u) < 64 THEN CAST(len(u) AS DOUBLE)
        |         ELSE CAST(63 AS DOUBLE) * power(CAST(2 AS DOUBLE), CAST(60 AS DOUBLE))
        |              / CAST(u[64] AS DOUBLE) END AS est_union,
        |    CAST(len(list_filter(u, x -> list_contains(ska, x) AND list_contains(skb, x))) AS DOUBLE)
        |      / CAST(len(u) AS DOUBLE) AS est_jaccard
        |  FROM p)
        |SELECT src_a, src_b, est_a, est_b, est_union, est_jaccard,
        |  est_jaccard * est_union AS est_intersect
        |FROM f""".stripMargin)),

    Q(
      "qd16_winnowing",
      "Winnowing fingerprint pairs (Dedup.winnowingPairs — the MOSS " +
        "algorithm): min-hash per sliding window of 4 consecutive " +
        "ordered 3-gram hashes, distinct minima = the fingerprint " +
        "set; documents sharing ≥ 2 fingerprints pair up. Catches " +
        "shared SUBSTRINGS (ordered runs ≥ 6 words guarantee a shared " +
        "fingerprint) where MinHash measures bag similarity, at " +
        "2/(window+1) of the full index density. Inverted-index " +
        "equi-join + hash-agg pair counting. Benched skew-mitigated " +
        "(qd04's discipline): maxDocFreq=15 drops boilerplate " +
        "fingerprints shared by >15 docs before the join — exactly " +
        "the hot keys that concentrate a partition — and the oracle " +
        "replays the identical cut.",
      (s, dir) =>
        Dedup.winnowingPairs(
          graft.core.Partitioning.parallelize(
            Tables.load(s, dir, "documents"), col("doc_id")),
          "doc_id", "text", n = 3, window = 4, minShared = 2,
          maxDocFreq = Some(15L)),
      Some(s"""WITH wd AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 6),
        |hs AS (
        |  SELECT doc_id,
        |    list_transform(
        |      list_transform(range(1, len(w) - 1),
        |        i -> concat(w[i], ' ', w[i+1], ' ', w[i+2])),
        |      g -> ${dkHash60("g")}) AS h
        |  FROM wd),
        |fp AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    list_transform(range(1, len(h) - 2),
        |      i -> list_min(list_slice(h, i, i + 3))))) AS fp
        |  FROM hs),
        |hot AS (SELECT fp FROM fp GROUP BY fp HAVING count(*) > 15),
        |inv AS (SELECT doc_id, fp FROM fp WHERE fp NOT IN (SELECT fp FROM hot))
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(count(*) AS BIGINT) AS n_shared
        |FROM inv a JOIN inv b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2
        |HAVING count(*) >= 2""".stripMargin)),

    Q(
      "qd17_winnowing_contamination",
      "Winnowing-based benchmark contamination " +
        "(Dedup.winnowingContamination): corpus docs scored by shared " +
        "winnowed fingerprints with the benchmark split (doc_id % 50 " +
        "= 0) — only ORDERED runs ≥ 6 words trigger, the precision " +
        "complement to qd08's bag-of-ngram hits. Benchmark " +
        "fingerprints broadcast; corpus side is one narrow pass + " +
        "semi-join, zero corpus shuffle. Zero-hit docs stay in the " +
        "output for direct curation joins.",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Dedup.winnowingContamination(
          docs.filter(pmod(col("doc_id"), lit(50)) =!= 0),
          docs.filter(pmod(col("doc_id"), lit(50)) === 0),
          "doc_id", "text", n = 3, window = 4)
      },
      Some(s"""WITH wd AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 6),
        |hs AS (
        |  SELECT doc_id,
        |    list_transform(
        |      list_transform(range(1, len(w) - 1),
        |        i -> concat(w[i], ' ', w[i+1], ' ', w[i+2])),
        |      g -> ${dkHash60("g")}) AS h
        |  FROM wd),
        |fp AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    list_transform(range(1, len(h) - 2),
        |      i -> list_min(list_slice(h, i, i + 3))))) AS fp
        |  FROM hs),
        |cfp AS (SELECT doc_id, fp FROM fp WHERE doc_id % 50 <> 0),
        |bfp AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 50 = 0),
        |hits AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared_fp
        |  FROM cfp WHERE fp IN (SELECT fp FROM bfp) GROUP BY 1)
        |SELECT d.doc_id, CAST(coalesce(h.n_shared_fp, 0) AS BIGINT) AS n_shared_fp
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 50 <> 0) d
        |LEFT JOIN hits h USING (doc_id)""".stripMargin)),

    Q(
      "qd18_edit_distance_dedup",
      "Edit-distance near-dup pairs over short strings " +
        "(Dedup.editDistanceNearDup on part names — the record-" +
        "linkage family, where shingle operators measure the wrong " +
        "thing: one-edit variants share zero 3-gram shingles). " +
        "Blocking = first-token ∪ last-token passes (one edit away " +
        "from both endpoints still collides somewhere) with an " +
        "in-join |Δlen| ≤ 2 band (levenshtein ≥ length gap — lossless " +
        "prune); verify = exact integer levenshtein ≤ 2. Both joins " +
        "equi on vocabulary-sized block keys.",
      (s, dir) =>
        Dedup.editDistanceNearDup(Tables.load(s, dir, "part"),
          "p_partkey", "p_name", maxDist = 2),
      Some("""WITH s AS (
        |  SELECT p_partkey AS sid, p_name AS str, length(p_name) AS len,
        |    string_split(p_name, ' ')[1] AS k1,
        |    string_split(p_name, ' ')[-1] AS k2
        |  FROM part),
        |b1 AS (SELECT sid, str, len, k1 FROM s
        |       QUALIFY row_number() OVER (PARTITION BY k1 ORDER BY sid) <= 500),
        |b2 AS (SELECT sid, str, len, k2 FROM s
        |       QUALIFY row_number() OVER (PARTITION BY k2 ORDER BY sid) <= 500),
        |cand AS (
        |  SELECT a.sid AS a_id, b.sid AS b_id, a.str AS sa, b.str AS sb
        |  FROM b1 a JOIN b1 b ON a.k1 = b.k1 AND a.sid < b.sid
        |    AND abs(a.len - b.len) <= 2
        |  UNION
        |  SELECT a.sid AS a_id, b.sid AS b_id, a.str AS sa, b.str AS sb
        |  FROM b2 a JOIN b2 b ON a.k2 = b.k2 AND a.sid < b.sid
        |    AND abs(a.len - b.len) <= 2)
        |SELECT a_id, b_id, CAST(levenshtein(sa, sb) AS BIGINT) AS dist
        |FROM cand WHERE levenshtein(sa, sb) <= 2""".stripMargin)),

    Q(
      "qd19_triangle_count",
      "Per-node triangle counts over the edit-distance similarity " +
        "graph (GraphRank.triangleCounts on qd18's maxDist=1 pairs): " +
        "the clustering-density curation signal — dense template " +
        "cliques score high, chance pairs score zero. Degree-oriented " +
        "wedge generation (edges point low→high (degree, id); wedges " +
        "only from common sources) bounds work at O(|E|^1.5) and " +
        "structurally removes hot-node skew; three equi-joins + one " +
        "hash agg, each triangle counted once.",
      (s, dir) => {
        val part = Tables.load(s, dir, "part")
        val edges = Dedup.editDistanceNearDup(part, "p_partkey", "p_name",
          maxDist = 1).select(col("a_id"), col("b_id"))
        graft.operators.GraphRank.triangleCounts(part, "p_partkey", edges)
      },
      Some("""WITH s AS (
        |  SELECT p_partkey AS sid, p_name AS str, length(p_name) AS len,
        |    string_split(p_name, ' ')[1] AS k1,
        |    string_split(p_name, ' ')[-1] AS k2
        |  FROM part),
        |b1 AS (SELECT sid, str, len, k1 FROM s
        |       QUALIFY row_number() OVER (PARTITION BY k1 ORDER BY sid) <= 500),
        |b2 AS (SELECT sid, str, len, k2 FROM s
        |       QUALIFY row_number() OVER (PARTITION BY k2 ORDER BY sid) <= 500),
        |cand AS (
        |  SELECT a.sid AS a_id, b.sid AS b_id, a.str AS sa, b.str AS sb
        |  FROM b1 a JOIN b1 b ON a.k1 = b.k1 AND a.sid < b.sid
        |    AND abs(a.len - b.len) <= 1
        |  UNION
        |  SELECT a.sid AS a_id, b.sid AS b_id, a.str AS sa, b.str AS sb
        |  FROM b2 a JOIN b2 b ON a.k2 = b.k2 AND a.sid < b.sid
        |    AND abs(a.len - b.len) <= 1),
        |e AS (SELECT a_id, b_id FROM cand WHERE levenshtein(sa, sb) <= 1),
        |sym AS (SELECT a_id AS u, b_id AS v FROM e
        |        UNION ALL SELECT b_id, a_id FROM e),
        |dg AS (SELECT u AS n, count(*) AS d FROM sym GROUP BY 1),
        |o AS (
        |  SELECT CASE WHEN (da.d, e.a_id) < (db.d, e.b_id)
        |           THEN e.a_id ELSE e.b_id END AS s,
        |         CASE WHEN (da.d, e.a_id) < (db.d, e.b_id)
        |           THEN e.b_id ELSE e.a_id END AS t
        |  FROM e JOIN dg da ON da.n = e.a_id JOIN dg db ON db.n = e.b_id),
        |otd AS (SELECT o.s, o.t, dg.d AS dt FROM o JOIN dg ON dg.n = o.t),
        |tri AS (
        |  SELECT w1.s AS tu, w1.t AS tv, w2.t AS tw
        |  FROM otd w1 JOIN otd w2
        |    ON w1.s = w2.s AND (w1.dt, w1.t) < (w2.dt, w2.t)
        |  JOIN o ON o.s = w1.t AND o.t = w2.t),
        |pn AS (
        |  SELECT node_id, CAST(count(*) AS BIGINT) AS n_triangles FROM (
        |    SELECT unnest([tu, tv, tw]) AS node_id FROM tri)
        |  GROUP BY 1)
        |SELECT p.p_partkey AS node_id,
        |  coalesce(pn.n_triangles, 0) AS n_triangles
        |FROM (SELECT DISTINCT p_partkey FROM part) p
        |LEFT JOIN pn ON pn.node_id = p.p_partkey""".stripMargin)),

    Q(
      "qd20_prefix_jaccard",
      "Prefix-filtered EXACT set-similarity join (PPJoin family) over " +
        "3-gram shingle sets: each doc's shingles are ordered " +
        "rarest-first by global df and only the |x|-ceil(t|x|)+1 " +
        "PREFIX is indexed — lossless (a qualifying pair must share a " +
        "prefix token), so the oracle is the direct all-pairs jaccard " +
        "definition with no replayed cut. The lossless complement to " +
        "qd04's df-cut: hot boilerplate shingles sit in suffixes and " +
        "never reach the join; candidates verify with one linear " +
        "array_intersect over 8-byte hashes.",
      (s, dir) =>
        Dedup.prefixJaccardPairs(Tables.load(s, dir, "documents"),
          "doc_id", "text", nShingle = 3, threshold = 0.4),
      Some(s"""WITH s AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      list_transform(range(1, len(w)-1),
        |        i -> concat(w[i], ' ', w[i+1], ' ', w[i+2])),
        |      g -> ${dkHash60("g")})) AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |  WHERE len(w) >= 3)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |  CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |    AS jaccard
        |FROM s a JOIN s b ON a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |  CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |    >= 0.4""".stripMargin)),

    Q(
      "qd21_segment_dedup",
      "Exact segment-level corpus REWRITE (C4-style: every other " +
        "dedup op here finds or measures duplicates; this one removes " +
        "them): documents cut into non-overlapping 10-word segments, " +
        "globally keep-FIRST per distinct segment ((doc_id, seg_idx) " +
        "total order via an argmin groupBy — only distinct segments " +
        "shuffle), survivors semi-join back and reassemble in " +
        "original order. Output is the rewritten corpus + per-doc " +
        "kept/dropped counts.",
      (s, dir) =>
        Dedup.segmentDedupRewrite(Tables.load(s, dir, "documents"),
          "doc_id", "text", segWords = 10),
      Some("""WITH segs AS (
        |  SELECT doc_id, CAST(t.i AS BIGINT) AS seg_idx,
        |    array_to_string(list_slice(w, CAST(t.i*10+1 AS BIGINT),
        |      CAST(t.i*10+10 AS BIGINT)), ' ') AS seg
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) d,
        |       LATERAL unnest(range(0, (len(d.w) + 9) // 10)) AS t(i)),
        |kept AS (
        |  SELECT doc_id, seg_idx, seg FROM segs
        |  QUALIFY row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) = 1),
        |reb AS (
        |  SELECT doc_id, string_agg(seg, ' ' ORDER BY seg_idx) AS text_new,
        |         count(*) AS n_kept
        |  FROM kept GROUP BY doc_id),
        |tot AS (SELECT doc_id, count(*) AS n_segs FROM segs GROUP BY doc_id)
        |SELECT t.doc_id, COALESCE(r.text_new, '') AS text,
        |  CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
        |  CAST(t.n_segs - COALESCE(r.n_kept, 0) AS BIGINT) AS n_dropped
        |FROM tot t LEFT JOIN reb r ON t.doc_id = r.doc_id""".stripMargin)),

    Q(
      "qd22_sorted_neighborhood",
      "Sorted-neighborhood near-dup pairs (Hernandez-Stolfo SNM): two " +
        "distributed global sorts (text-prefix and reversed-word " +
        "keys; globalRank = range-partitioned sort + per-partition " +
        "offsets, no global window), each doc paired with its 3 rank " +
        "successors per pass, candidates unioned, exact shingle " +
        "jaccard verify. Candidate count is exactly n*3*2 — linear " +
        "and skew-proof; measured 100% recall vs brute force on this " +
        "corpus at t=0.4.",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Dedup.sortedNeighborhoodPairs(docs, "doc_id", "text",
          Dedup.snmDefaultKeys("text"), window = 4,
          nShingle = 3, threshold = 0.4)
      },
      Some(s"""WITH sh AS (
        |  SELECT doc_id, text,
        |    list_distinct(list_transform(
        |      list_transform(range(1, len(w)-1),
        |        i -> concat(w[i], ' ', w[i+1], ' ', w[i+2])),
        |      g -> ${dkHash60("g")})) AS sh
        |  FROM (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)
        |  WHERE len(w) >= 3),
        |r1 AS (SELECT doc_id, row_number() OVER (ORDER BY text, doc_id) AS rnk FROM sh),
        |r2 AS (SELECT doc_id, row_number() OVER (
        |  ORDER BY array_to_string(list_reverse(string_split(text,' ')),' '), doc_id) AS rnk FROM sh),
        |cand AS (
        |  SELECT DISTINCT least(a.doc_id, b.doc_id) AS a_id,
        |    greatest(a.doc_id, b.doc_id) AS b_id
        |  FROM r1 a JOIN r1 b ON b.rnk >= a.rnk + 1 AND b.rnk <= a.rnk + 3
        |  UNION
        |  SELECT DISTINCT least(a.doc_id, b.doc_id), greatest(a.doc_id, b.doc_id)
        |  FROM r2 a JOIN r2 b ON b.rnk >= a.rnk + 1 AND b.rnk <= a.rnk + 3)
        |SELECT c.a_id, c.b_id,
        |  CAST(len(list_intersect(da.sh, db.sh)) AS DOUBLE) /
        |  CAST(len(da.sh) + len(db.sh) - len(list_intersect(da.sh, db.sh)) AS DOUBLE)
        |    AS jaccard
        |FROM cand c JOIN sh da ON da.doc_id = c.a_id JOIN sh db ON db.doc_id = c.b_id
        |WHERE CAST(len(list_intersect(da.sh, db.sh)) AS DOUBLE) /
        |  CAST(len(da.sh) + len(db.sh) - len(list_intersect(da.sh, db.sh)) AS DOUBLE)
        |    >= 0.4""".stripMargin)),

    Q(
      "qt25_quality_weighted_mix",
      "QUALITY-weighted sampling (Curation.qualityWeightedMix - the " +
        "CCNet head/middle/tail treatment generalized): per-source " +
        "perplexity quartiles (bigram-LM scores, qt20's audited " +
        "plan), tier boundaries integer-exact, keep rates 1000/600/" +
        "300/100 permille by tier via the content-stable hash - " +
        "natural text upsampled, boilerplate-ish downsampled, " +
        "deterministically per source.",
      (s, dir) =>
        graft.operators.Curation.qualityWeightedMix(
          graft.core.Partitioning.parallelize(
            Tables.load(s, dir, "documents"), col("doc_id")),
          "doc_id", "text", "source",
          tierPermille = Seq(1000, 600, 300, 100)),
      Some(s"""WITH toks AS (
        |  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w
        |  FROM documents),
        |big AS (
        |  SELECT doc_id, w[t.i] AS w1, w[t.i + 1] AS w2
        |  FROM toks, unnest(range(1, len(w))) t(i)
        |  WHERE len(w) >= 2),
        |bgc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
        |        FROM big GROUP BY 1, 2),
        |pre AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1
        |        FROM big GROUP BY 1),
        |vv AS (SELECT CAST(count(DISTINCT t) AS DOUBLE) AS v
        |       FROM (SELECT unnest(w) AS t FROM toks)),
        |terms AS (
        |  SELECT big.doc_id,
        |    CAST(log2(CAST(pre.c1 AS DOUBLE) + vv.v) -
        |         log2(CAST(bgc.c2 AS DOUBLE) + 1.0)
        |      AS DECIMAL(30,6)) AS s
        |  FROM big JOIN bgc USING (w1, w2) JOIN pre USING (w1), vv),
        |ppl AS (
        |  SELECT doc_id,
        |    round(CAST(sum(s) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
        |      AS bits_per_bigram
        |  FROM terms GROUP BY 1),
        |r AS (
        |  SELECT d.doc_id, d.source, p.bits_per_bigram,
        |    CAST(row_number() OVER (PARTITION BY d.source
        |      ORDER BY p.bits_per_bigram, d.doc_id) AS BIGINT) AS rk,
        |    CAST(count(*) OVER (PARTITION BY d.source) AS BIGINT) AS n
        |  FROM documents d JOIN ppl p USING (doc_id)),
        |t AS (
        |  SELECT doc_id, source, bits_per_bigram,
        |    ((rk - 1) * 4) // n AS tier
        |  FROM r)
        |SELECT doc_id, source, CAST(tier AS BIGINT) AS tier, bits_per_bigram
        |FROM t
        |WHERE ${dkHash60("concat(CAST(doc_id AS VARCHAR), ':', source)")} % 1000 <
        |  CASE tier WHEN 0 THEN 1000 WHEN 1 THEN 600
        |            WHEN 2 THEN 300 ELSE 100 END""".stripMargin)),

    Q(
      "qt26_cluster_split",
      "Leakage-safe train/val/test split (Curation.clusterAwareSplit): " +
        "the split unit is the near-duplicate CLUSTER (qd11's " +
        "collapse-first clustering, exact + near dups transitively " +
        "closed), so no duplicate pair can straddle train and eval - " +
        "splitting documents independently leaks template siblings " +
        "into the eval set and scores memorization. Assignment hashes " +
        "the CLUSTER id (content-stable hash60 % 1000: <100 test, " +
        "<200 val, else train) - engine- and partitioning-invariant, " +
        "and stable as the corpus grows (a cluster's id is its min " +
        "doc id). The split projection adds zero shuffle beyond the " +
        "audited clustering itself.",
      (s, dir) =>
        graft.operators.Curation.clusterAwareSplit(
          Tables.load(s, dir, "documents"), "doc_id", "text"),
      Some(s"""WITH RECURSIVE
        |reps AS (SELECT min(doc_id) AS keep_id, md5(text) AS h
        |         FROM documents GROUP BY md5(text)),
        |hm AS (SELECT d.doc_id, r.keep_id FROM documents d
        |       JOIN reps r ON md5(d.text) = r.h),
        |repdocs AS (SELECT d.doc_id, d.text FROM documents d
        |            JOIN reps r ON d.doc_id = r.keep_id),
        |${lshCtes("repdocs")},
        |pairs AS ($lshPairSelect),
        |sym(s, t) AS (
        |  SELECT keep_id, doc_id FROM hm UNION SELECT doc_id, keep_id FROM hm
        |  UNION SELECT a_id, b_id FROM pairs UNION SELECT b_id, a_id FROM pairs),
        |r(s, t) AS (
        |  SELECT s, t FROM sym
        |  UNION
        |  SELECT r.s, sym.t FROM r JOIN sym ON r.t = sym.s),
        |lab AS (SELECT s AS doc_id, min(t) AS component FROM r GROUP BY s)
        |SELECT doc_id, component,
        |  CASE WHEN ${dkHash60("CAST(component AS VARCHAR)")} % 1000 < 100
        |         THEN 'test'
        |       WHEN ${dkHash60("CAST(component AS VARCHAR)")} % 1000 < 200
        |         THEN 'val'
        |       ELSE 'train' END AS split
        |FROM lab""".stripMargin)),

    Q(
      "qt27_bpe_train",
      "In-engine BPE merge TRAINING (Bpe.trainBpe, 3 rounds): the " +
        "map-reduce formulation - the corpus is touched ONCE by the " +
        "word-frequency aggregate; every merge round is vocab-sized " +
        "(Zipf-bounded at any corpus scale). Pair counts are exact " +
        "integers, each round's winner breaks ties (cnt DESC, l, r), " +
        "and merges apply via delimited-string replace whose " +
        "left-to-right non-overlapping semantics ARE greedy BPE - " +
        "identical in both engines, so the learned merge table is " +
        "bit-identical. Closes the tokenizer loop the qt18 vocab " +
        "seam left open.",
      (s, dir) =>
        graft.operators.Bpe.trainBpe(
          Tables.load(s, dir, "documents"), "doc_id", "text", rounds = 3)
          .merges
          .select(col("round"), col("left").as("lhs"), col("right").as("rhs"),
            col("merged"), col("cnt")),
      Some(s"""WITH ${bpeCtes(3)}
        |SELECT CAST(1 AS BIGINT) AS round, l AS lhs, r AS rhs,
        |  l || r AS merged, cnt FROM m1
        |UNION ALL SELECT CAST(2 AS BIGINT), l, r, l || r, cnt FROM m2
        |UNION ALL SELECT CAST(3 AS BIGINT), l, r, l || r, cnt FROM m3""".stripMargin)),

    Q(
      "qt28_bpe_tokens",
      "Per-document token counts under the self-trained BPE model " +
        "(Bpe.bpeTokenCounts over Bpe.trainBpe's 3-round vocab): " +
        "documents explode to words, join the vocab's post-merge " +
        "symbol counts (vocab-sized side), sum per doc - real " +
        "learned-tokenizer lengths for Packing.sequencePack's " +
        "tokenCountCol seam, no external deps. Oracle replays the " +
        "identical training rounds then counts STX delimiters.",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val model = graft.operators.Bpe.trainBpe(docs, "doc_id", "text", rounds = 3)
        graft.operators.Bpe.bpeTokenCounts(docs, "doc_id", "text", model)
      },
      Some(s"""WITH ${bpeCtes(3)},
        |ns AS (SELECT word,
        |    CAST(length(sym) - length(replace(sym, chr(2), '')) AS BIGINT)
        |      AS n_sym
        |  FROM s3),
        |dw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |       FROM documents)
        |SELECT dw.doc_id, CAST(sum(ns.n_sym) AS BIGINT) AS n_tokens
        |FROM dw JOIN ns ON dw.word = ns.word
        |WHERE len(dw.word) > 0
        |GROUP BY 1""".stripMargin)),

    Q(
      "qt29_datasheet",
      "Per-source corpus DATASHEET (TextAnalysis.datasheet - the " +
        "'datasheets for datasets' artifact a corpus publication " +
        "ships): document/token volumes, exact-duplicate mass " +
        "(distinct md5 count), language mix, quality pass rate - " +
        "every number an order-invariant aggregate of exact ints, " +
        "ratios as single end divisions, so the sheet is " +
        "bit-reproducible. One narrow pass + one source-keyed hash " +
        "aggregate; null-text docs count in n_docs, not " +
        "n_text/n_unique_texts.",
      (s, dir) =>
        graft.operators.TextAnalysis.datasheet(
          Tables.load(s, dir, "documents"), "doc_id", "text", "source"),
      Some("""WITH c AS (
        |  SELECT doc_id, source, text,
        |    len(list_filter(string_split(text,' '), t -> t IN ('the','a','of','and','to','in'))) AS cnt_en,
        |    len(list_filter(string_split(text,' '), t -> t IN ('el','la','de','los','en','que'))) AS cnt_es,
        |    len(list_filter(string_split(text,' '), t -> t IN ('le','la','les','de','et','en'))) AS cnt_fr,
        |    len(list_filter(string_split(text,' '), t -> t IN ('der','die','das','und','ein','zu'))) AS cnt_de
        |  FROM documents),
        |sig AS (
        |  SELECT source, text, md5(text) AS h, text IS NOT NULL AS has_text,
        |    CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
        |         WHEN cnt_en >= cnt_es AND cnt_en >= cnt_fr AND cnt_en >= cnt_de THEN 'en'
        |         WHEN cnt_es >= cnt_fr AND cnt_es >= cnt_de THEN 'es'
        |         WHEN cnt_fr >= cnt_de THEN 'fr'
        |         ELSE 'de' END AS pred_lang,
        |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
        |    (len(string_split(text,' ')) >= 20 AND len(string_split(text,' ')) <= 100000
        |     AND CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE) /
        |         CAST(len(string_split(text,' ')) AS DOUBLE) >= 0.15) AS keep
        |  FROM c),
        |agg AS (
        |  SELECT source,
        |    CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(CASE WHEN has_text THEN 1 ELSE 0 END) AS BIGINT) AS n_text,
        |    CAST(count(DISTINCT h) AS BIGINT) AS n_unique_texts,
        |    CAST(sum(n_tokens) AS BIGINT) AS n_tokens_total,
        |    CAST(sum(CASE WHEN pred_lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
        |    CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
        |  FROM sig GROUP BY 1)
        |SELECT source, n_docs, n_text, n_unique_texts, n_tokens_total,
        |  n_en, n_keep,
        |  CAST(n_en AS DOUBLE) / CAST(n_docs AS DOUBLE) AS pct_en,
        |  CASE WHEN n_text > 0
        |    THEN CAST(n_unique_texts AS DOUBLE) / CAST(n_text AS DOUBLE)
        |  END AS unique_ratio
        |FROM agg""".stripMargin)),

    Q(
      "qt23_text_chunks",
      "Overlapping token-window chunking (TextAnalysis.chunkTokens, " +
        "chunkSize=64, stride=48): each document fans out to windows " +
        "of up to 64 whitespace tokens starting every 48, so adjacent " +
        "chunks share 16 tokens of context - the RAG/embedding " +
        "segmenter (a fact on a window boundary survives whole in one " +
        "chunk). Pure map-side: tokenize, a chunk-count expression, " +
        "explode+slice; zero shuffle. Chunks are content-addressed " +
        "(md5 of the joined window) so downstream chunk-level dedup " +
        "is qd01's hash-groupBy. Oracle replays the same 1-based " +
        "inclusive slicing with DuckDB list syntax.",
      (s, dir) =>
        graft.operators.TextAnalysis.chunkTokens(
          Tables.load(s, dir, "documents"), "doc_id", "text",
          chunkSize = 64, stride = 48),
      Some("""WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS w
        |  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
        |n AS (
        |  SELECT doc_id, w,
        |    1 + (greatest(len(w) - 64, 0) + 47) // 48 AS n_chunks FROM d),
        |c AS (
        |  SELECT doc_id, w, t.k AS k
        |  FROM n, unnest(range(0, n_chunks)) t(k))
        |SELECT doc_id, CAST(k AS BIGINT) AS chunk_idx,
        |  CAST(len(w[(k*48+1):(k*48+64)]) AS BIGINT) AS n_tokens,
        |  md5(array_to_string(w[(k*48+1):(k*48+64)], ' ')) AS chunk_hash
        |FROM c""".stripMargin)),

    Q(
      "qt24_uniform_sample",
      "Deterministic uniform k-sample per group (bottom-k-of-hash " +
        "reservoir): per source, the 10 docs with smallest " +
        "hash60(doc_id) via the mergeable KMV buffer (graft_bottom_k " +
        "- k longs of state per group, map-side collapse), exploded " +
        "and joined back to rows. EXACTLY k per group (vs sampleBy's " +
        "Bernoulli approximation), partitioning-invariant, and " +
        "refreshable: re-running on a grown corpus keeps a consistent " +
        "sample (hash order is stable). Oracle = the window form.",
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val h = Tables.load(s, dir, "documents")
          .select(col("source"), col("doc_id"),
            Dedup.hash60(col("doc_id").cast("string")).as("h"))
        val sk = h.groupBy(col("source"))
          .agg(call_function("graft_bottom_k", col("h"), lit(10)).as("sk"))
          .select(col("source"), explode(col("sk")).as("h"))
        h.join(sk, Seq("source", "h"), "left_semi")
          .select(col("source"), col("doc_id"))
      },
      Some(s"""SELECT source, doc_id FROM (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source ORDER BY
        |      ${dkHash60("CAST(doc_id AS VARCHAR)")}, doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 10""".stripMargin)),

    Q(
      "qd24_containment",
      "Asymmetric containment pairs |A∩B|/|A| >= 0.5 " +
        "(Dedup.containmentPairs) - the subset-duplication detector: " +
        "a short doc copied into a long page has jaccard ~0.1 (the " +
        "size-ratio prune in qd04/qd20 structurally EXCLUDES it) but " +
        "containment ~1.0. Lossless prefix filter on the contained " +
        "side probing the FULL token index (prefix x full - the " +
        "asymmetry is structural), no size-ratio prune; oracle = the " +
        "direct all-pairs definition.",
      (s, dir) =>
        Dedup.containmentPairs(Tables.load(s, dir, "documents"),
          "doc_id", "text", nShingle = 3, threshold = 0.5),
      Some(s"""WITH s AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      list_transform(range(1, len(w)-1),
        |        i -> concat(w[i], ' ', w[i+1], ' ', w[i+2])),
        |      g -> ${dkHash60("g")})) AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |  WHERE len(w) >= 3)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |    CAST(len(a.sh) AS DOUBLE) AS containment
        |FROM s a JOIN s b ON a.doc_id <> b.doc_id
        |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |    CAST(len(a.sh) AS DOUBLE) >= 0.5""".stripMargin)),

    Q(
      "qd28_sketch_containment",
      "KMV-sketch containment estimate (Dedup.sketchContainmentPairs " +
        "- qd24's constant-cost sibling): probe the inverted index " +
        "with the 16 SMALLEST shingle hashes of each doc (a " +
        "deterministic uniform sample under the hash order) and " +
        "estimate containment as the fraction of sketch hashes " +
        "present in B - k probe rows per document regardless of " +
        "length, vs qd24's (1-t)|A|+1 prefix. Docs with <= 16 " +
        "shingles carry their whole set (estimate exact); candidate " +
        "generation is lossless for the estimator (est >= t > 0 " +
        "implies a shared sketch hash). Oracle = the direct " +
        "definition over sorted-list slices.",
      (s, dir) =>
        Dedup.sketchContainmentPairs(Tables.load(s, dir, "documents"),
          "doc_id", "text", nShingle = 3, k = 16, threshold = 0.5),
      Some(s"""WITH s AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      list_transform(range(1, len(w)-1),
        |        i -> concat(w[i], ' ', w[i+1], ' ', w[i+2])),
        |      g -> ${dkHash60("g")})) AS hs
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |  WHERE len(w) >= 3),
        |sk AS (SELECT doc_id, (list_sort(hs))[1:16] AS sk FROM s)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(len(list_intersect(a.sk, b.hs)) AS DOUBLE) /
        |    CAST(len(a.sk) AS DOUBLE) AS est_containment
        |FROM sk a JOIN s b ON a.doc_id <> b.doc_id
        |WHERE CAST(len(list_intersect(a.sk, b.hs)) AS DOUBLE) /
        |    CAST(len(a.sk) AS DOUBLE) >= 0.5""".stripMargin)),

    Q(
      "qd26_corpus_coverage",
      "Corpus-level n-gram coverage (Overlap.corpusCoverage - the " +
        "'is this new crawl worth adding' one-row summary, computed " +
        "BEFORE any expensive dedup): fraction of the odd-doc " +
        "corpus's 3-gram occurrences (and distinct types) already " +
        "present in the even-doc corpus. Both sides collapse to " +
        "distinct-gram tables in Zipfian-keyed hash aggs; one left " +
        "join on 8-byte hashes; exact counts + two single divisions.",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        graft.operators.Overlap.corpusCoverage(
          docs.filter(col("doc_id") % 2 === 1),
          docs.filter(col("doc_id") % 2 === 0),
          "doc_id", "text", n = 3)
      },
      Some(s"""WITH tg AS (
        |  SELECT ${dkHash60("concat(w[t.i], ' ', w[t.i+1], ' ', w[t.i+2])")} AS gh,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT string_split(text, ' ') AS w FROM documents
        |        WHERE doc_id % 2 = 1),
        |       unnest(range(1, len(w) - 1)) t(i)
        |  WHERE len(w) >= 3
        |  GROUP BY 1),
        |rg AS (
        |  SELECT DISTINCT
        |    ${dkHash60("concat(w[t.i], ' ', w[t.i+1], ' ', w[t.i+2])")} AS gh
        |  FROM (SELECT string_split(text, ' ') AS w FROM documents
        |        WHERE doc_id % 2 = 0),
        |       unnest(range(1, len(w) - 1)) t(i)
        |  WHERE len(w) >= 3)
        |SELECT
        |  CAST(sum(tg.c) AS BIGINT) AS tgt_occurrences,
        |  CAST(sum(CASE WHEN rg.gh IS NOT NULL THEN tg.c ELSE 0 END) AS BIGINT)
        |    AS tgt_occ_covered,
        |  CAST(sum(CASE WHEN rg.gh IS NOT NULL THEN tg.c ELSE 0 END) AS DOUBLE) /
        |    CAST(sum(tg.c) AS DOUBLE) AS occ_coverage,
        |  CAST(count(*) AS BIGINT) AS tgt_types,
        |  CAST(count(rg.gh) AS BIGINT) AS tgt_types_covered,
        |  CAST(count(rg.gh) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |    AS type_coverage
        |FROM tg LEFT JOIN rg ON rg.gh = tg.gh""".stripMargin)),

    Q(
      "qd25_label_propagation",
      "Bounded-round synchronous label propagation (GraphRank." +
        "labelPropagation, 3 rounds) over the name-edit similarity " +
        "graph (qd18 maxDist=1 pairs): community detection, the " +
        "density-aware complement to connected components - loosely " +
        "bridged dense groups keep distinct labels where CC would " +
        "fuse them. Deterministic (count DESC, label ASC) argmax as " +
        "an exact-integer struct argmin, partial-aggregated " +
        "map-side; isolated nodes keep their own id. Oracle unrolls " +
        "the three identical rounds (MATERIALIZED CTEs).",
      (s, dir) => {
        val part = Tables.load(s, dir, "part")
        val edges = Dedup.editDistanceNearDup(part, "p_partkey", "p_name",
          maxDist = 1).select(col("a_id"), col("b_id"))
        graft.operators.GraphRank.labelPropagation(part, "p_partkey",
          edges, rounds = 3)
      },
      Some(lpaOracle(rounds = 3))),

    Q(
      "qd23_kcore",
      "Bounded-round k-core peel (GraphRank.kCore, k=6, rounds=6) " +
        "over the bipartite order-part graph (distinct (l_orderkey, " +
        "l_partkey) edges; partkeys offset into their own id range): " +
        "each round drops nodes with degree < 6 and the edges " +
        "touching them — a measured multi-round cascade on this " +
        "graph (orders losing parts push parts under threshold and " +
        "back). Per round: one hash agg + two semi-joins, edge set " +
        "only shrinks; lineage cut per round (rounds > 4). Oracle " +
        "unrolls the identical six rounds.",
      (s, dir) => {
        val e = Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey").as("a_id"),
            (col("l_partkey").cast("long") + 1000000000L).as("b_id"))
          .distinct()
        graft.operators.GraphRank.kCore(e, k = 6, rounds = 6)
      },
      Some(kcoreOracle(k = 6, rounds = 6))),

    Q(
      "qt01_lang_id",
      "Language-ID heuristic: CJK codepoint check then stopword-count " +
        "argmax with fixed tiebreak. Pure narrow transform.",
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select((col("doc_id") +: TextAnalysis.langIdColumns(col("text"))): _*),
      Some("""WITH c AS (
        |  SELECT doc_id, text,
        |    len(list_filter(string_split(text,' '), t -> t IN ('the','a','of','and','to','in'))) AS cnt_en,
        |    len(list_filter(string_split(text,' '), t -> t IN ('el','la','de','los','en','que'))) AS cnt_es,
        |    len(list_filter(string_split(text,' '), t -> t IN ('le','la','les','de','et','en'))) AS cnt_fr,
        |    len(list_filter(string_split(text,' '), t -> t IN ('der','die','das','und','ein','zu'))) AS cnt_de
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
        |       WHEN cnt_en >= cnt_es AND cnt_en >= cnt_fr AND cnt_en >= cnt_de THEN 'en'
        |       WHEN cnt_es >= cnt_fr AND cnt_es >= cnt_de THEN 'es'
        |       WHEN cnt_fr >= cnt_de THEN 'fr'
        |       ELSE 'de' END AS pred_lang,
        |  cnt_en, cnt_es, cnt_fr, cnt_de
        |FROM c""".stripMargin)),

    Q(
      "qt02_quality_score",
      "Quality scoring: token/type/punct counts, type-token ratio, mean " +
        "token length, keep flag. Ratios are single divisions of exact " +
        "ints — deterministic.",
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select((col("doc_id") +: TextAnalysis.qualityColumns(col("text"))): _*),
      Some("""SELECT doc_id,
        |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS n_types,
        |  CAST(len(regexp_extract_all(text, '[.,;:!?]', 0)) AS BIGINT) AS n_punct,
        |  CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE) /
        |    CAST(len(string_split(text,' ')) AS DOUBLE) AS ttr,
        |  CAST(list_sum(list_transform(string_split(text,' '), t -> len(t))) AS DOUBLE) /
        |    CAST(len(string_split(text,' ')) AS DOUBLE) AS mean_token_len,
        |  (len(string_split(text,' ')) >= 20 AND len(string_split(text,' ')) <= 100000
        |   AND CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE) /
        |       CAST(len(string_split(text,' ')) AS DOUBLE) >= 0.15) AS keep
        |FROM documents""".stripMargin)),

    Q(
      "qt03_token_count",
      "Token counting: whitespace tokens + BPE-ish regex tokens " +
        "(letter runs / digit runs / punctuation marks) + char length.",
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select((col("doc_id") +: TextAnalysis.tokenCountColumns(col("text"))): _*),
      Some("""SELECT doc_id,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]', 0)) AS BIGINT) AS n_regex_tokens,
        |  CAST(length(text) AS BIGINT) AS n_chars_measured
        |FROM documents""".stripMargin)),

    Q(
      "qt05_normalize",
      "Text normalization (curation preprocessing): lowercase, strip " +
        "punctuation, collapse whitespace runs — plus the length delta " +
        "as a cheap cleanliness signal. Narrow codegen'd transform.",
      (s, dir) => {
        val norm = trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9\\s]", " "),
          "\\s+", " "))
        Tables.load(s, dir, "documents").select(
          col("doc_id"), norm.as("norm_text"),
          (length(col("text")) - length(norm)).cast("long").as("len_delta"))
      },
      Some("""SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
        |       '\s+', ' ', 'g')) AS norm_text,
        |  CAST(length(text) - length(trim(regexp_replace(
        |    regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
        |    '\s+', ' ', 'g'))) AS BIGINT) AS len_delta
        |FROM documents""".stripMargin)),

    Q(
      "qt04_fingerprint",
      "Document fingerprints: content md5, order-insensitive " +
        "bag-of-words md5, and the 3-shingle minimizer hash (winnowing " +
        "primitive).",
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .filter(size(split(col("text"), " ")) >= 3)
          .select((col("doc_id") +: TextAnalysis.fingerprintColumns(col("text"))): _*),
      Some(s"""SELECT doc_id,
        |  md5(text) AS fp_content,
        |  md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ')) AS fp_bow,
        |  list_min(list_transform(
        |    list_distinct(list_transform(range(1, len(w)-1),
        |      i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))),
        |    s -> ${dkHash60("s")})) AS fp_minimizer
        |FROM (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)
        |WHERE len(w) >= 3""".stripMargin)),

    Q(
      "qt06_repetition",
      "Gopher-style repetition quality rules: fraction of characters in " +
        "the most common word 2-gram and in duplicated word 3-grams. " +
        "Computed by exploding to (doc, gram) occurrence rows + partial " +
        "aggregation — linear in token count, never O(len²) per " +
        "document; deterministic tie-break via max over (count, chars) " +
        "structs. See operators.QualityRules.",
      (s, dir) =>
        graft.operators.QualityRules.repetitionStats(
          graft.core.Partitioning.parallelize(
            Tables.load(s, dir, "documents"), col("doc_id")),
          "doc_id", "text"),
      Some("""WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
        |g2 AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
        |         i -> concat(w[i], ' ', w[i+1]))) AS gram
        |       FROM w WHERE len(w) >= 2),
        |c2 AS (SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS cnt FROM g2 GROUP BY 1, 2),
        |top2 AS (SELECT doc_id,
        |           max({'c': cnt, 'ch': cnt * length(gram)}).ch AS top2_chars
        |         FROM c2 GROUP BY 1),
        |g3 AS (SELECT doc_id, unnest(list_transform(range(1, len(w)-1),
        |         i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))) AS gram
        |       FROM w WHERE len(w) >= 3),
        |c3 AS (SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS cnt FROM g3 GROUP BY 1, 2),
        |dup3 AS (SELECT doc_id,
        |           CAST(sum(CASE WHEN cnt >= 2 THEN cnt * length(gram) ELSE 0 END) AS BIGINT) AS dup3_chars,
        |           CAST(sum(cnt * length(gram)) AS BIGINT) AS all3_chars
        |         FROM c3 GROUP BY 1)
        |SELECT doc_id, n_chars_total, frac_top_2gram_chars, frac_dup_3gram_chars,
        |  (frac_top_2gram_chars <= 0.20 AND frac_dup_3gram_chars <= 0.60) AS keep
        |FROM (
        |  SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars_total,
        |    CAST(coalesce(top2_chars, 0) AS DOUBLE) / CAST(length(d.text) AS DOUBLE)
        |      AS frac_top_2gram_chars,
        |    CAST(coalesce(dup3_chars, 0) AS DOUBLE) / CAST(coalesce(all3_chars, 1) AS DOUBLE)
        |      AS frac_dup_3gram_chars
        |  FROM documents d
        |  LEFT JOIN top2 USING (doc_id) LEFT JOIN dup3 USING (doc_id))""".stripMargin)),

    Q(
      "qt07_pii_redact",
      "PII detection + redaction (emails, IPv4, phones) over text with " +
        "deterministically planted PII — regexes restricted to the " +
        "Java-regex ∩ RE2 common subset so the oracle reproduces " +
        "matches exactly. Pure narrow expressions, zero shuffle. See " +
        "operators.Pii.",
      (s, dir) => {
        val planted = concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com from 10.0."),
          pmod(col("doc_id"), lit(256)).cast("string"),
          lit(".99 call +123 456-7890 now"))
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), planted.as("t"))
          .select((col("doc_id") +: graft.operators.Pii.piiCounts(col("t")) :+
            md5(graft.operators.Pii.redact(col("t")).cast("binary"))
              .as("redacted_md5")): _*)
      },
      Some("""WITH p AS (SELECT doc_id,
        |  concat(text, ' contact user', CAST(doc_id AS VARCHAR), '@example.com from 10.0.',
        |         CAST(doc_id % 256 AS VARCHAR), '.99 call +123 456-7890 now') AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(t, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS n_ipv4,
        |  CAST(len(regexp_extract_all(t, '\+?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}')) AS BIGINT) AS n_phones,
        |  md5(regexp_replace(regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
        |    '\+?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}', '<PHONE>', 'g')) AS redacted_md5
        |FROM p""".stripMargin)),

    Q(
      "qt08_stratified_sample",
      "Deterministic hash-based sampling (1-in-10 within each (doc_id, " +
        "lang) stratum key): pmod(hash60, 10) = 0 — reproducible on any " +
        "engine, any partitioning, no RNG state. The 100 TB shape of " +
        "corpus subsampling: a pure filter, fully pushed parallel scan.",
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .filter(pmod(Dedup.hash60(
            concat(col("doc_id").cast("string"), lit(":"), col("lang"))),
            lit(10)) === 0)
          .select(col("doc_id"), col("lang"), col("source")),
      Some(s"""SELECT doc_id, lang, source FROM documents
        |WHERE ${dkHash60("concat(CAST(doc_id AS VARCHAR), ':', lang)")} % 10 = 0""".stripMargin)),

    Q(
      "qt09_sequence_pack",
      "Deterministic sequence packing (the concatenate-and-split stage " +
        "of LLM training-data prep): documents hash into 8 independent " +
        "strata, each stream fills 2048-token sequences contiguously in " +
        "id order — every doc gets (stratum, seq_id, offset). One " +
        "shuffle; strata scale with executors. See operators.Packing.",
      (s, dir) =>
        graft.operators.Packing.sequencePack(
          Tables.load(s, dir, "documents"), "doc_id", "text",
          maxLen = 2048, nStrata = 8),
      Some(s"""SELECT doc_id, stratum, n_tokens,
        |  CAST(floor(start_tok / 2048) AS BIGINT) AS seq_id,
        |  CAST(start_tok % 2048 AS BIGINT) AS seq_offset
        |FROM (
        |  SELECT doc_id, stratum, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY stratum ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) - n_tokens AS start_tok
        |  FROM (
        |    SELECT doc_id,
        |      ${dkHash60("CAST(doc_id AS VARCHAR)")} % 8 AS stratum,
        |      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |    FROM documents))""".stripMargin)),

    Q(
      "qt10_tfidf_topk",
      "Top-3 TF-IDF terms per document. idf is the rational n_docs/df " +
        "(rank-isomorphic to the log form, bit-reproducible across " +
        "engines — no libm); tf and df are partial-aggregated, df " +
        "equi-joins back on the term (corpus-sized at scale, no " +
        "broadcast assumption). See TextAnalysis.tfIdfTopK.",
      (s, dir) =>
        TextAnalysis.tfIdfTopK(
          graft.core.Partitioning.parallelize(
            Tables.load(s, dir, "documents"), col("doc_id")),
          "doc_id", "text", k = 3),
      Some("""WITH tf AS (
        |  SELECT doc_id, w AS term, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(coalesce(text, ''), ' ')) AS w
        |        FROM documents)
        |  GROUP BY doc_id, w),
        |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
        |scored AS (
        |  SELECT t.doc_id, t.term,
        |    (CAST(t.tf AS DOUBLE) * n.n_docs) / CAST(d.df AS DOUBLE) AS score
        |  FROM tf t JOIN df d USING (term), n)
        |SELECT doc_id, term, score, CAST(rnk AS BIGINT) AS rnk FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, term) AS rnk
        |  FROM scored)
        |WHERE rnk <= 3""".stripMargin)),

    Q(
      "qd08_contamination",
      "Benchmark-contamination audit (GPT-3 appendix-C shape): distinct " +
        "8-gram overlap between every corpus document and a benchmark " +
        "set (docs with doc_id % 50 = 0). Benchmark gram hashes " +
        "broadcast (eval sets are small by definition); corpus side is " +
        "one linear explode + map-side semi-join. See " +
        "operators.Overlap.",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        graft.operators.Overlap.contaminationHits(
          graft.core.Partitioning.parallelize(
            docs.filter(pmod(col("doc_id"), lit(50)) =!= 0), col("doc_id")),
          docs.filter(pmod(col("doc_id"), lit(50)) === 0),
          "doc_id", "text", n = 8)
      },
      Some(s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |gr AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w)-6),
        |         i -> ${dkHash60("concat(w[i],' ',w[i+1],' ',w[i+2],' ',w[i+3],' ',w[i+4],' ',w[i+5],' ',w[i+6],' ',w[i+7])")}))) AS gh
        |       FROM w WHERE len(w) >= 8),
        |b AS (SELECT DISTINCT gh FROM gr WHERE doc_id % 50 = 0),
        |hits AS (SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_hits
        |         FROM gr g JOIN b USING (gh) WHERE g.doc_id % 50 <> 0 GROUP BY 1)
        |SELECT d.doc_id, coalesce(h2.n_hits, 0) AS n_hits
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 50 <> 0) d
        |LEFT JOIN hits h2 USING (doc_id)""".stripMargin)),

    Q(
      "qd09_span_dedup",
      "Corpus-level duplicated-span statistics (C4 span-dedup signal): " +
        "per document, how many word 5-gram occurrences belong to spans " +
        "seen >= 2 times corpus-wide. Explode to 8-byte gram hashes, " +
        "partial-agg count per (doc, gram) then per gram, equi-join " +
        "back — two shuffles, AQE-skew-safe. See operators.Overlap.",
      (s, dir) =>
        graft.operators.Overlap.duplicatedSpanStats(
          graft.core.Partitioning.parallelize(
            Tables.load(s, dir, "documents"), col("doc_id")),
          "doc_id", "text", n = 5),
      Some(s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT doc_id, unnest(list_transform(range(1, len(w)-3),
        |        i -> ${dkHash60("concat(w[i],' ',w[i+1],' ',w[i+2],' ',w[i+3],' ',w[i+4])")})) AS gh
        |      FROM w WHERE len(w) >= 5),
        |pd AS (SELECT doc_id, gh, CAST(count(*) AS BIGINT) AS c_in_doc FROM g GROUP BY 1, 2),
        |cc AS (SELECT gh, CAST(sum(c_in_doc) AS BIGINT) AS c_corpus FROM pd GROUP BY 1)
        |SELECT doc_id, CAST(sum(c_in_doc) AS BIGINT) AS n_spans,
        |  CAST(sum(CASE WHEN c_corpus >= 2 THEN c_in_doc ELSE 0 END) AS BIGINT) AS n_dup_spans,
        |  CAST(sum(CASE WHEN c_corpus >= 2 THEN c_in_doc ELSE 0 END) AS DOUBLE) /
        |  CAST(sum(c_in_doc) AS DOUBLE) AS frac_dup
        |FROM pd JOIN cc USING (gh) GROUP BY doc_id""".stripMargin)),

    Q(
      "qd10_dedup_clusters",
      "Near-dup CLUSTERS via distributed connected components over the " +
        "LSH pair graph (pairs are not transitive; keep-one-per-cluster " +
        "needs the closure). Iterative min-label propagation with " +
        "pointer jumping — O(log diameter) rounds, two hash joins per " +
        "round, fully shuffle-partitioned. Oracle = recursive-CTE " +
        "transitive closure over the identical pair set. See " +
        "Dedup.connectedComponents.",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val pairs = Dedup.lshNearDupPairs(docs, "doc_id", "text",
          nShingle = 3, k = 16, bands = 4, threshold = 0.5)
          .select(col("a_id"), col("b_id"))
        val self = docs.select(col("doc_id").as("a_id"),
          col("doc_id").as("b_id"))
        Dedup.connectedComponents(pairs.unionByName(self), "a_id", "b_id")
          .select(col("node").as("doc_id"), col("component"))
      },
      Some(s"""WITH RECURSIVE ${lshCtes()},
        |pairs AS ($lshPairSelect),
        |sym(s, t) AS (
        |  SELECT a_id, b_id FROM pairs UNION SELECT b_id, a_id FROM pairs
        |  UNION SELECT doc_id, doc_id FROM documents),
        |r(s, t) AS (
        |  SELECT s, t FROM sym
        |  UNION
        |  SELECT r.s, sym.t FROM r JOIN sym ON r.t = sym.s)
        |SELECT s AS doc_id, min(t) AS component FROM r GROUP BY s""".stripMargin)),

    Q(
      "qt11_curate_corpus",
      "Composed curation lifecycle (operators.Curation.curate): " +
        "language filter → quality rules → Gopher repetition rules → " +
        "PII redaction → exact dedup of the redacted text. The " +
        "text-side counterpart of qw01: proof the curation stages " +
        "compose into one pipeline with stage order cheapest-first.",
      (s, dir) =>
        graft.operators.Curation.curate(
          graft.core.Partitioning.parallelize(
            Tables.load(s, dir, "documents"), col("doc_id")),
          "doc_id", "text", "lang", Seq("en", "es", "fr")),
      Some(s"""WITH ${curationCtes()}
        |SELECT doc_id, lang, n_tokens, redacted_md5 FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY redacted_md5 ORDER BY doc_id) AS rn FROM red)
        |WHERE rn = 1""".stripMargin)),

    Q(
      "qt12_weighted_mix",
      "Deterministic weighted data mixing (Curation.weightedMix): " +
        "per-source sampling rates applied via a content-stable " +
        "hash-mod — the up/down-weighting step that turns a curated " +
        "pool into a training mixture. Pure narrow filter, " +
        "reproducible under any partitioning, which RNG sampling is " +
        "not.",
      (s, dir) =>
        graft.operators.Curation.weightedMix(
            Tables.load(s, dir, "documents"),
            "doc_id", "source",
            Map("src0" -> 900, "src1" -> 700, "src2" -> 500, "src3" -> 200),
            defaultPermille = 100)
          .select(col("doc_id"), col("source"), col("lang")),
      Some(s"""SELECT doc_id, source, lang FROM documents
        |WHERE ${dkHash60("concat(CAST(doc_id AS VARCHAR), ':', source)")} % 1000 <
        |  CASE source WHEN 'src0' THEN 900 WHEN 'src1' THEN 700
        |    WHEN 'src2' THEN 500 WHEN 'src3' THEN 200 ELSE 100 END""".stripMargin)),

    Q(
      "qt13_training_pipeline",
      "The COMPLETE training-data preparation lifecycle composed end " +
        "to end (Curation.trainingPipeline): curate (lang -> quality " +
        "-> repetition -> PII -> exact dedup) -> NEAR-dedup over the " +
        "curated pool (exact-collapse + MinHash-LSH + greedy keep) -> " +
        "weighted source mixing -> sequence packing into 1024-token " +
        "streams. Output = the packed assignment table for exactly " +
        "the documents a training run would consume; the oracle " +
        "replays every stage in one SQL composition.",
      (s, dir) =>
        graft.operators.Curation.trainingPipeline(
          graft.core.Partitioning.parallelize(
            Tables.load(s, dir, "documents"), col("doc_id")),
          "doc_id", "text", "lang", "source", Seq("en", "es", "fr"),
          Map("src0" -> 900, "src1" -> 700, "src2" -> 500, "src3" -> 200),
          defaultPermille = 100, maxLen = 1024, nStrata = 4),
      Some(s"""WITH ${curationCtes()},
        |curated AS (
        |  SELECT doc_id FROM (
        |    SELECT doc_id, row_number() OVER (
        |      PARTITION BY redacted_md5 ORDER BY doc_id) AS rn FROM red)
        |  WHERE rn = 1),
        |d2 AS (
        |  SELECT d.doc_id, d.text, d.source FROM documents d
        |  JOIN curated USING (doc_id)),
        |reps AS (SELECT min(doc_id) AS doc_id FROM d2 GROUP BY md5(text)),
        |d3 AS (SELECT d2.doc_id, d2.text FROM d2 JOIN reps USING (doc_id)),
        |${lshCtes("d3")},
        |pairs AS ($lshPairSelect),
        |kept AS (
        |  SELECT r.doc_id FROM reps r
        |  WHERE r.doc_id NOT IN (SELECT DISTINCT b_id FROM pairs)),
        |mixed AS (
        |  SELECT d2.doc_id, d2.text FROM d2 JOIN kept USING (doc_id)
        |  WHERE ${dkHash60("concat(CAST(d2.doc_id AS VARCHAR), ':', d2.source)")} % 1000 <
        |    CASE d2.source WHEN 'src0' THEN 900 WHEN 'src1' THEN 700
        |      WHEN 'src2' THEN 500 WHEN 'src3' THEN 200 ELSE 100 END),
        |base AS (
        |  SELECT doc_id, ${dkHash60("CAST(doc_id AS VARCHAR)")} % 4 AS stratum,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM mixed),
        |packed AS (
        |  SELECT doc_id, stratum, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY stratum ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) - n_tokens AS start_tok
        |  FROM base)
        |SELECT doc_id, stratum, n_tokens,
        |  CAST(floor(start_tok / 1024) AS BIGINT) AS seq_id,
        |  CAST(start_tok % 1024 AS BIGINT) AS seq_offset
        |FROM packed""".stripMargin)),

    Q(
      "qt17_decontaminated_pipeline",
      "The training pipeline WITH benchmark decontamination " +
        "(Curation.trainingPipelineDecontaminated) — the stage qt13 " +
        "lacked and every real pre-training run includes: after " +
        "curation, documents sharing ANY winnowing fingerprint with " +
        "the benchmark split (doc_id % 50 = 0) are excluded before " +
        "near-dedup/mixing/packing, so contaminated text never " +
        "reaches a training sequence (nor claims a near-dup cluster's " +
        "representative). Added cost is qd17's audited shape: " +
        "broadcast benchmark fingerprints, one narrow corpus pass, no " +
        "new pool shuffle.",
      (s, dir) => {
        val docs = graft.core.Partitioning.parallelize(
          Tables.load(s, dir, "documents"), col("doc_id"))
        graft.operators.Curation.trainingPipelineDecontaminated(
          docs.filter(pmod(col("doc_id"), lit(50)) =!= 0),
          docs.filter(pmod(col("doc_id"), lit(50)) === 0),
          "doc_id", "text", "lang", "source", Seq("en", "es", "fr"),
          Map("src0" -> 900, "src1" -> 700, "src2" -> 500, "src3" -> 200),
          defaultPermille = 100, maxLen = 1024, nStrata = 4,
          maxSharedFp = 0L)
      },
      Some(decontPipelineOracle)),

    Q(
      "qt18_vocab_tokens",
      "Vocab-driven greedy longest-match token counts " +
        "(VocabTokenizer + the graft_vocab_tokens codegen kernel): " +
        "vocab = top-15 corpus words + printable-ASCII char fallback " +
        "(the synthetic corpus has only 31 distinct words, so top-15 " +
        "forces real subword splits), tokens never cross spaces, " +
        "unmatched positions consume one char. The oracle replays the " +
        "greedy advance as a recursive CTE — counts are deterministic " +
        "because longest-match has no ties. Counted subset: doc_id % " +
        "10 = 0; the vocab builds from the FULL corpus.",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val va = graft.operators.VocabTokenizer.vocabArray(
          graft.operators.VocabTokenizer.buildVocab(docs, "text", topN = 15))
        graft.operators.VocabTokenizer.tokenCounts(
          docs.filter(pmod(col("doc_id"), lit(10)) === 0),
          "doc_id", "text", va)
      },
      Some("""WITH RECURSIVE vocab AS (
        |  SELECT tok FROM (
        |    SELECT tok, count(*) AS c FROM (
        |      SELECT unnest(string_split(coalesce(text, ''), ' ')) AS tok
        |      FROM documents)
        |    WHERE length(tok) >= 1 GROUP BY tok
        |    ORDER BY c DESC, tok LIMIT 15)
        |  UNION
        |  SELECT chr(CAST(x AS INT)) AS tok FROM range(32, 127) t(x)),
        |words AS (
        |  SELECT doc_id, t.i AS widx, ws[t.i] AS word
        |  FROM (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS ws
        |        FROM documents WHERE doc_id % 10 = 0),
        |    unnest(range(1, len(ws) + 1)) t(i)),
        |tok AS (
        |  SELECT doc_id, widx, word, 1 AS pos, 0 AS cnt FROM words
        |  UNION ALL
        |  SELECT doc_id, widx, word,
        |    pos + coalesce((SELECT max(length(v.tok)) FROM vocab v
        |      WHERE v.tok = substring(word, CAST(pos AS INT), length(v.tok))), 1),
        |    cnt + 1
        |  FROM tok WHERE pos <= length(word))
        |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_vocab_tokens
        |FROM tok WHERE pos > length(word)
        |GROUP BY doc_id""".stripMargin)),

    Q(
      "qt19_vocab_pack",
      "Sequence packing fed by VOCAB token lengths end-to-end " +
        "(VocabTokenizer.packWithVocab): the tokenizer seam qt09 " +
        "packs whitespace counts through, now closed with the " +
        "in-engine greedy tokenizer — stratified contiguous fill over " +
        "real subword counts. Same subset/vocab as qt18.",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val va = graft.operators.VocabTokenizer.vocabArray(
          graft.operators.VocabTokenizer.buildVocab(docs, "text", topN = 15))
        graft.operators.VocabTokenizer.packWithVocab(
          graft.core.Partitioning.parallelize(
            docs.filter(pmod(col("doc_id"), lit(10)) === 0), col("doc_id")),
          "doc_id", "text", va, maxLen = 256, nStrata = 4)
      },
      Some(s"""WITH RECURSIVE vocab AS (
        |  SELECT tok FROM (
        |    SELECT tok, count(*) AS c FROM (
        |      SELECT unnest(string_split(coalesce(text, ''), ' ')) AS tok
        |      FROM documents)
        |    WHERE length(tok) >= 1 GROUP BY tok
        |    ORDER BY c DESC, tok LIMIT 15)
        |  UNION
        |  SELECT chr(CAST(x AS INT)) AS tok FROM range(32, 127) t(x)),
        |words AS (
        |  SELECT doc_id, t.i AS widx, ws[t.i] AS word
        |  FROM (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS ws
        |        FROM documents WHERE doc_id % 10 = 0),
        |    unnest(range(1, len(ws) + 1)) t(i)),
        |tok AS (
        |  SELECT doc_id, widx, word, 1 AS pos, 0 AS cnt FROM words
        |  UNION ALL
        |  SELECT doc_id, widx, word,
        |    pos + coalesce((SELECT max(length(v.tok)) FROM vocab v
        |      WHERE v.tok = substring(word, CAST(pos AS INT), length(v.tok))), 1),
        |    cnt + 1
        |  FROM tok WHERE pos <= length(word)),
        |counts AS (
        |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens
        |  FROM tok WHERE pos > length(word)
        |  GROUP BY doc_id),
        |base AS (
        |  SELECT doc_id, ${dkHash60("CAST(doc_id AS VARCHAR)")} % 4 AS stratum,
        |    n_tokens
        |  FROM counts),
        |packed AS (
        |  SELECT doc_id, stratum, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY stratum ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) - n_tokens AS start_tok
        |  FROM base)
        |SELECT doc_id, stratum, n_tokens,
        |  CAST(floor(start_tok / 256) AS BIGINT) AS seq_id,
        |  CAST(start_tok % 256 AS BIGINT) AS seq_offset
        |FROM packed""".stripMargin)),

    Q(
      "qt20_ngram_perplexity",
      "Bigram LM perplexity (TextAnalysis.ngramPerplexity — the " +
        "CCNet-style quality filter, self-trained): mean surprisal in " +
        "bits/bigram under an add-one-smoothed bigram model with " +
        "prefix-count histories and vocab-V normalization. Surprisal " +
        "terms quantize to DECIMAL(30,6) before the order-invariant " +
        "sum (the BM25/entropy libm discipline); one Zipfian-keyed " +
        "hash agg + one scoring join; V is a 1-row broadcast.",
      (s, dir) =>
        graft.operators.TextAnalysis.ngramPerplexity(
          graft.core.Partitioning.parallelize(
            Tables.load(s, dir, "documents"), col("doc_id")),
          "doc_id", "text"),
      Some("""WITH toks AS (
        |  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w
        |  FROM documents),
        |big AS (
        |  SELECT doc_id, w[t.i] AS w1, w[t.i + 1] AS w2
        |  FROM toks, unnest(range(1, len(w))) t(i)
        |  WHERE len(w) >= 2),
        |bgc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
        |        FROM big GROUP BY 1, 2),
        |pre AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1
        |        FROM big GROUP BY 1),
        |vv AS (SELECT CAST(count(DISTINCT t) AS DOUBLE) AS v
        |       FROM (SELECT unnest(w) AS t FROM toks)),
        |terms AS (
        |  SELECT big.doc_id,
        |    CAST(log2(CAST(pre.c1 AS DOUBLE) + vv.v) -
        |         log2(CAST(bgc.c2 AS DOUBLE) + 1.0)
        |      AS DECIMAL(30,6)) AS s
        |  FROM big JOIN bgc USING (w1, w2) JOIN pre USING (w1), vv)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  round(CAST(sum(s) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
        |    AS bits_per_bigram
        |FROM terms GROUP BY 1""".stripMargin)),

    Q(
      "qt21_percentile_cut",
      "Exact per-group percentile cut (Curation.percentileCut): keep " +
        "the top 250‰ of each source by n_chars, ties broken by " +
        "doc_id. Integer-exact boundary (rank*1000 <= count*permille) " +
        "so no float percentile can disagree at the cut; one window " +
        "pass partitioned by the group key — sound for numerous " +
        "domain-sized groups, with the q38 histogram threshold as the " +
        "documented few-huge-groups alternative.",
      (s, dir) =>
        graft.operators.Curation.percentileCut(
          graft.core.Partitioning.parallelize(
            Tables.load(s, dir, "documents"), col("doc_id")),
          "source", "n_chars", "doc_id", keepPermille = 250),
      Some("""SELECT doc_id, source, n_chars, grp_rank FROM (
        |  SELECT doc_id, source, n_chars,
        |    CAST(row_number() OVER (
        |      PARTITION BY source ORDER BY n_chars DESC, doc_id)
        |      AS BIGINT) AS grp_rank,
        |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS grp_n
        |  FROM documents)
        |WHERE grp_rank * 1000 <= grp_n * 250""".stripMargin)),

    Q(
      "qt22_pmi_collocations",
      "PMI collocation mining (TextAnalysis.pmiCollocations): top-100 " +
        "word bigrams by pointwise mutual information with support " +
        "c2 >= 5. Marginals aggregate the distinct-bigram table, not " +
        "the corpus; N is a 1-row broadcast; top-k is TakeOrdered " +
        "(no global sort). The log2 argument is one fixed-shape " +
        "expression and pmi rounds to 6 before the deterministic " +
        "(pmi DESC, w1, w2) cut.",
      (s, dir) =>
        graft.operators.TextAnalysis.pmiCollocations(
          graft.core.Partitioning.parallelize(
            Tables.load(s, dir, "documents"), col("doc_id")),
          "doc_id", "text", minCount = 5, topK = 100),
      Some("""WITH toks AS (
        |  SELECT string_split(coalesce(text, ''), ' ') AS w FROM documents),
        |big AS (
        |  SELECT w[t.i] AS w1, w[t.i + 1] AS w2
        |  FROM toks, unnest(range(1, len(w))) t(i)
        |  WHERE len(w) >= 2),
        |bgc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
        |        FROM big GROUP BY 1, 2),
        |lm AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1l FROM bgc GROUP BY 1),
        |rm AS (SELECT w2, CAST(sum(c2) AS BIGINT) AS c1r FROM bgc GROUP BY 1),
        |tot AS (SELECT CAST(sum(c2) AS BIGINT) AS n FROM bgc)
        |SELECT w1, w2, c2,
        |  round(log2(CAST(c2 AS DOUBLE) * CAST(n AS DOUBLE) /
        |    (CAST(c1l AS DOUBLE) * CAST(c1r AS DOUBLE))), 6) AS pmi
        |FROM bgc JOIN lm USING (w1) JOIN rm USING (w2), tot
        |WHERE c2 >= 5
        |ORDER BY pmi DESC, w1, w2 LIMIT 100""".stripMargin)),

    Q(
      "qt14_bm25_search",
      "BM25 keyword search (TextAnalysis.bm25TopK): rank the corpus " +
        "against query terms ('hash', 'join', 'vector'), global " +
        "top-10. Lucene idf form (positive for any df), one cached " +
        "tokenized scan, query-pruned explode, orderBy+limit top-k " +
        "(per-partition heaps, no global window). Scores quantize to " +
        "DECIMAL(30,6) per term before the order-invariant sum; " +
        "round-6 output absorbs ln() ulp differences (the qm01 " +
        "discipline).",
      (s, dir) =>
        graft.operators.TextAnalysis.bm25TopK(
          graft.core.Partitioning.parallelize(
            Tables.load(s, dir, "documents"), col("doc_id")),
          "doc_id", "text", Seq("hash", "join", "vector"), k = 10),
      Some("""WITH w AS (
        |  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w FROM documents),
        |dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM w),
        |st AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(CAST(CAST(dl AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE) /
        |      CAST(count(*) AS DOUBLE) AS avgdl
        |  FROM dl),
        |tf AS (
        |  SELECT doc_id, t AS term, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, unnest(w) AS t FROM w)
        |  WHERE t IN ('hash', 'join', 'vector') GROUP BY 1, 2),
        |dfx AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
        |sc AS (
        |  SELECT tf.doc_id,
        |    CAST(ln(1.0 + (st.n - dfx.df + 0.5) / (dfx.df + 0.5)) *
        |      (CAST(tf.tf AS DOUBLE) * 2.2) /
        |      (CAST(tf.tf AS DOUBLE) +
        |        1.2 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE) / st.avgdl))
        |      AS DECIMAL(30,6)) AS s
        |  FROM tf JOIN dfx USING (term) JOIN dl USING (doc_id), st),
        |agg AS (SELECT doc_id, round(CAST(sum(s) AS DOUBLE), 6) AS score
        |        FROM sc GROUP BY 1)
        |SELECT doc_id, score FROM agg ORDER BY score DESC, doc_id LIMIT 10""".stripMargin)),

    Q(
      "qt15_rarity_score",
      "Corpus-frequency rarity score (TextAnalysis.rarityScore, the " +
        "CCNet-style quality signal): mean document frequency of each " +
        "document's distinct tokens — exact BIGINT sum of the joined " +
        "df table, one IEEE division. Distinct-per-doc before the " +
        "explode, partial-agg df build, token equi-join (Zipfian key — " +
        "AQE skew-join / head-of-vocabulary broadcast at web scale).",
      (s, dir) =>
        graft.operators.TextAnalysis.rarityScore(
          graft.core.Partitioning.parallelize(
            Tables.load(s, dir, "documents"), col("doc_id")),
          "doc_id", "text"),
      Some("""WITH tok AS (
        |  SELECT doc_id, unnest(list_distinct(string_split(coalesce(text, ''), ' '))) AS token
        |  FROM documents),
        |dfT AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tok GROUP BY 1),
        |agg AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_types,
        |    CAST(sum(df) AS BIGINT) AS sum_df
        |  FROM tok JOIN dfT USING (token) GROUP BY 1)
        |SELECT doc_id, n_types, sum_df,
        |  CAST(sum_df AS DOUBLE) / CAST(n_types AS DOUBLE) AS mean_df
        |FROM agg""".stripMargin)),

    Q(
      "qt16_token_entropy",
      "Unigram token entropy per document (TextAnalysis.tokenEntropy " +
        "— the information-density quality signal; low entropy = " +
        "template/repetitive text): exact tf counts, per-token " +
        "−p·log2(p) quantized to DECIMAL(30,6) before the " +
        "order-invariant sum, round-6 output (the bm25 libm " +
        "discipline). One explode + two hash aggs + one equi-join.",
      (s, dir) =>
        graft.operators.TextAnalysis.tokenEntropy(
          graft.core.Partitioning.parallelize(
            Tables.load(s, dir, "documents"), col("doc_id")),
          "doc_id", "text"),
      Some("""WITH tf AS (
        |  SELECT doc_id, t AS token, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(coalesce(text, ''), ' ')) AS t
        |        FROM documents)
        |  GROUP BY 1, 2),
        |nn AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n FROM tf GROUP BY 1),
        |c AS (
        |  SELECT tf.doc_id, nn.n,
        |    CAST(-((CAST(tf AS DOUBLE) / CAST(n AS DOUBLE)) *
        |      log2(CAST(tf AS DOUBLE) / CAST(n AS DOUBLE))) AS DECIMAL(30,6)) AS s
        |  FROM tf JOIN nn USING (doc_id))
        |SELECT doc_id, CAST(max(n) AS BIGINT) AS n_tokens,
        |  round(CAST(sum(s) AS DOUBLE), 6) AS entropy
        |FROM c GROUP BY 1""".stripMargin)),

    Q(
      "qd12_incremental_dedup",
      "Incremental dedup — the daily-ingest lifecycle: admit a new " +
        "batch (doc_id % 10 = 0) against the existing corpus. Exact " +
        "stages are hash anti-joins against the corpus hash set; the " +
        "near stage filters LSH pairs touching the batch (corpus wins, " +
        "lowest batch id wins). See Dedup.incrementalDedup.",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Dedup.incrementalDedup(
          docs.filter(pmod(col("doc_id"), lit(10)) =!= 0),
          docs.filter(pmod(col("doc_id"), lit(10)) === 0),
          "doc_id", "text")
      },
      Some(s"""WITH ${lshCtes()},
        |pairs AS ($lshPairSelect),
        |b AS (SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 10 = 0),
        |cp AS (SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 10 <> 0)
        |SELECT b.doc_id AS keep_id FROM b
        |WHERE NOT EXISTS (SELECT 1 FROM cp WHERE cp.h = b.h)
        |  AND NOT EXISTS (SELECT 1 FROM b b2 WHERE b2.h = b.h AND b2.doc_id < b.doc_id)
        |  AND NOT EXISTS (SELECT 1 FROM pairs p JOIN cp
        |    ON (p.a_id = cp.doc_id AND p.b_id = b.doc_id)
        |    OR (p.b_id = cp.doc_id AND p.a_id = b.doc_id))
        |  AND NOT EXISTS (SELECT 1 FROM pairs p JOIN b b3
        |    ON p.a_id = b3.doc_id AND p.b_id = b.doc_id)""".stripMargin)),

    Q(
      "qd27_incremental_components",
      "Incremental cluster maintenance (Dedup.incrementalComponents) " +
        "- the state-update half qd12 lacked: stored component labels " +
        "absorb an ingest batch (doc_id % 50 = 0) by re-solving ONLY " +
        "components touched by a new edge (each re-enters as a " +
        "depth-1 star node->component-min, so the closure converges " +
        "in O(1) rounds); every untouched label passes through with " +
        "zero recompute. Edge discovery probes the STORED band index " +
        "COLLAPSE-FIRST (batchNearDupStarEdges - batch exact dups " +
        "fold to reps before shingling, stars replace the quadratic " +
        "identical-content pair fan-out; connectivity is provably " +
        "unchanged, and labels are what this query emits). Components " +
        "only merge under edge addition, so the result is " +
        "bit-identical to full re-clustering - the oracle IS qd10's " +
        "full recursive-CTE closure over the complete pair set.",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val corpus = docs.filter(pmod(col("doc_id"), lit(50)) =!= 0)
        val batch = docs.filter(pmod(col("doc_id"), lit(50)) === 0)
        // Stored state is PERSISTED (the production service reads it
        // from storage between ingests) and built ONCE: the bootstrap
        // pair graph and the ingest-probe target both derive from the
        // same index (pairsFromIndex), so the corpus-scale shingle +
        // minhash passes run once, not once per consumer.
        val built = Dedup.buildCorpusIndex(corpus, "doc_id", "text")
        val idx = Dedup.CorpusIndex(
          graft.core.OpCache.persist(built.hashes),
          graft.core.OpCache.persist(built.shingles),
          graft.core.OpCache.persist(built.bands))
        val pairsC = Dedup.pairsFromIndex(idx, threshold = 0.5)
          .select(col("a_id"), col("b_id"))
        val selfC = corpus.select(col("doc_id").as("a_id"),
          col("doc_id").as("b_id"))
        val labels = graft.core.OpCache.persist(
          Dedup.connectedComponents(
            pairsC.unionByName(selfC), "a_id", "b_id"))
        val newEdges = Dedup.batchNearDupStarEdges(idx, batch, "doc_id",
          "text", nShingle = 3, k = 16, bands = 4, threshold = 0.5)
        Dedup.incrementalComponents(labels, newEdges,
          batch.select(col("doc_id").as("node")))
          .select(col("node").as("doc_id"), col("component"))
      },
      Some(s"""WITH RECURSIVE ${lshCtes()},
        |pairs AS ($lshPairSelect),
        |sym(s, t) AS (
        |  SELECT a_id, b_id FROM pairs UNION SELECT b_id, a_id FROM pairs
        |  UNION SELECT doc_id, doc_id FROM documents),
        |r(s, t) AS (
        |  SELECT s, t FROM sym
        |  UNION
        |  SELECT r.s, sym.t FROM r JOIN sym ON r.t = sym.s)
        |SELECT s AS doc_id, min(t) AS component FROM r GROUP BY s""".stripMargin)),

    Q(
      "qd13_cluster_stars",
      "qd10's clustering via the OTHER algorithm: large-star/small-star " +
        "edge contraction (Dedup.connectedComponentsStars) over the " +
        "identical LSH pair graph — the 10^10-node form (no label " +
        "table; the edge list itself contracts). Same oracle as qd10: " +
        "both algorithms must produce the identical closure.",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val pairs = Dedup.lshNearDupPairs(docs, "doc_id", "text",
          nShingle = 3, k = 16, bands = 4, threshold = 0.5)
          .select(col("a_id"), col("b_id"))
        val self = docs.select(col("doc_id").as("a_id"),
          col("doc_id").as("b_id"))
        Dedup.connectedComponentsStars(pairs.unionByName(self), "a_id", "b_id")
          .select(col("node").as("doc_id"), col("component"))
      },
      Some(s"""WITH RECURSIVE ${lshCtes()},
        |pairs AS ($lshPairSelect),
        |sym(s, t) AS (
        |  SELECT a_id, b_id FROM pairs UNION SELECT b_id, a_id FROM pairs
        |  UNION SELECT doc_id, doc_id FROM documents),
        |r(s, t) AS (
        |  SELECT s, t FROM sym
        |  UNION
        |  SELECT r.s, sym.t FROM r JOIN sym ON r.t = sym.s)
        |SELECT s AS doc_id, min(t) AS component FROM r GROUP BY s""".stripMargin)),

    Q(
      "qd11_cluster_corpus",
      "Full-corpus duplicate clustering at production scale " +
        "(Dedup.corpusClusters): exact duplicates collapse FIRST, exact " +
        "groups enter the graph as diameter-2 stars (not O(m²) " +
        "cliques), LSH pairs run over unique content only, then the " +
        "connected-component closure labels every document. The " +
        "linear-edge version of qd10. This is the clustering RUN: its " +
        "labels persist as a stored artifact (Dedup.writeLabels via " +
        "Stores.corpusLabels) that qd29/qd38 read back instead of " +
        "re-clustering — the composed production lifecycle.",
      (s, dir) =>
        Stores.corpusLabels(s, dir)
          .select(col("node").as("doc_id"), col("component")),
      Some(s"""WITH RECURSIVE
        |$clusterLabelCtes
        |SELECT doc_id, component FROM lab""".stripMargin)),

    Q(
      "qd38_best_representative",
      "QUALITY-aware cluster representative selection " +
        "(Dedup.bestRepresentatives): every production dedup keeps " +
        "ONE doc per duplicate cluster — min-id (qd07) is arbitrary; " +
        "this keeps the HIGHEST-QUALITY copy (qt02's type-token " +
        "ratio, ties to the smallest id) — the 'keep the clean " +
        "mirror, drop the boilerplate-wrapped scrape' rule. Labels " +
        "come from the STORED label table qd11's clustering run " +
        "maintains (Stores.corpusLabels — built once per corpus, " +
        "parquet read-back after), so this query is one narrow join " +
        "+ a map-side struct-max aggregate over labels, never " +
        "corpus-scale. Output (component, keep_id, cluster_size, " +
        "score).",
      (s, dir) => {
        val t = split(coalesce(col("text"), lit("")), " ")
        Dedup.bestRepresentativesFromLabels(
          Stores.corpusLabels(s, dir),
          Tables.load(s, dir, "documents").select(
            col("doc_id").as("node"),
            (size(array_distinct(t)).cast("double") /
              size(t).cast("double")).as("score")))
      },
      Some(s"""WITH RECURSIVE
        |$clusterLabelCtes,
        |sc AS (
        |  SELECT doc_id,
        |    CAST(len(list_distinct(string_split(coalesce(text,''),' '))) AS DOUBLE) /
        |      CAST(len(string_split(coalesce(text,''),' ')) AS DOUBLE) AS score
        |  FROM documents),
        |j AS (
        |  SELECT l.component, l.doc_id, s.score
        |  FROM lab l JOIN sc s USING (doc_id)),
        |rk AS (
        |  SELECT component, doc_id, score,
        |    row_number() OVER (PARTITION BY component
        |      ORDER BY score DESC, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY component) AS cluster_size
        |  FROM j)
        |SELECT component, doc_id AS keep_id,
        |  CAST(cluster_size AS BIGINT) AS cluster_size,
        |  round(score, 6) AS score
        |FROM rk WHERE rn = 1""".stripMargin)),

    Q(
      "qd29_cluster_histogram",
      "Cluster-size histogram (Dedup.clusterSizeHistogram over qd11's " +
        "corpusClusters labels): the one-page diagnostic every dedup " +
        "run prints - (cluster_size, n_clusters). A healthy graph is " +
        "size-1-dominated with a thin tail; a GIANT component " +
        "(threshold too low, stop-phrase percolation) surfaces here " +
        "as one huge bucket before it derails the keep-one rewrite. " +
        "Two map-side hash aggregates over the STORED label table " +
        "(Stores.corpusLabels - qd11's clustering run persists it, " +
        "this query only reads it) - never corpus-scale.",
      (s, dir) =>
        Dedup.clusterSizeHistogram(Stores.corpusLabels(s, dir)),
      Some(s"""WITH RECURSIVE
        |$clusterLabelCtes,
        |cs AS (SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
        |       FROM lab GROUP BY 1)
        |SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
        |FROM cs GROUP BY 1""".stripMargin)),

    Q(
      "qd14_pagerank",
      "Fixed-point PageRank over the near-duplicate graph " +
        "(GraphRank.pageRank, 2 iterations, damping 85%): centrality " +
        "as a curation signal — documents inside dense template " +
        "clusters rank high, isolated documents keep the base rank. " +
        "The ENTIRE iteration is BIGINT fixed-point (1e12 = rank 1): " +
        "floor-division contributions, exact integer sums — " +
        "bit-reproducible across engines and partitionings with no " +
        "decimal casts anywhere. Per iteration: one edge⋈rank " +
        "equi-join + one hash agg on dst, linear in |E|.",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        graft.operators.GraphRank.pageRank(
          docs, "doc_id",
          Dedup.lshNearDupPairs(docs, "doc_id", "text",
            nShingle = 3, k = 16, bands = 4, threshold = 0.5),
          iters = 2)
          .select(col("node_id").as("doc_id"), col("pr_int"))
      },
      Some(s"""WITH ${lshCtes()},
        |pairs AS ($lshPairSelect),
        |e2 AS (SELECT a_id AS src, b_id AS dst FROM pairs
        |       UNION ALL SELECT b_id, a_id FROM pairs),
        |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e2 GROUP BY 1),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |p0 AS (SELECT doc_id, 1000000000000 // nn.n AS pr FROM documents, nn),
        |c1 AS (SELECT e2.dst, CAST(sum(p0.pr // deg.deg) AS BIGINT) AS s
        |       FROM e2 JOIN p0 ON e2.src = p0.doc_id
        |       JOIN deg ON e2.src = deg.src GROUP BY 1),
        |p1 AS (SELECT d.doc_id,
        |         (1000000000000 * 15 // 100) // nn.n +
        |         (85 * coalesce(c1.s, 0)) // 100 AS pr
        |       FROM documents d LEFT JOIN c1 ON d.doc_id = c1.dst, nn),
        |c2 AS (SELECT e2.dst, CAST(sum(p1.pr // deg.deg) AS BIGINT) AS s
        |       FROM e2 JOIN p1 ON e2.src = p1.doc_id
        |       JOIN deg ON e2.src = deg.src GROUP BY 1),
        |p2 AS (SELECT d.doc_id,
        |         (1000000000000 * 15 // 100) // nn.n +
        |         (85 * coalesce(c2.s, 0)) // 100 AS pr
        |       FROM documents d LEFT JOIN c2 ON d.doc_id = c2.dst, nn)
        |SELECT doc_id, CAST(pr AS BIGINT) AS pr_int FROM p2""".stripMargin)),

    Q(
      "qd30_soft_dedup",
      "Soft dedup (Dedup.duplicationScore — downweight, don't delete): " +
        "per-document duplication score from the corpus-wide shingle " +
        "document-frequency table — the fraction (basis points, " +
        "integer division) of a document's distinct 3-shingles seen " +
        "in 2+ documents — and the derived sampling weight " +
        "10000 - bp/2. The weighted-sampling complement to qd07's " +
        "hard removal: boilerplate-heavy documents survive with " +
        "reduced draw probability instead of vanishing. Linear " +
        "inverted-index shape (explode → df hash-agg → one equi-join " +
        "back → per-doc agg); no pair join anywhere, so no df-cut is " +
        "even needed. All-integer outputs: bit-identical under any " +
        "partitioning.",
      (s, dir) =>
        Dedup.duplicationScore(
          Tables.load(s, dir, "documents"), "doc_id", "text"),
      Some(s"""WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w)-1),
        |    i -> concat(w[i], ' ', w[i+1], ' ', w[i+2])))) AS g
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |  WHERE len(w) >= 3),
        |h AS (SELECT doc_id, ${dkHash60("g")} AS hh FROM sh),
        |dfreq AS (SELECT hh, count(*) AS df FROM h GROUP BY 1),
        |p AS (
        |  SELECT doc_id, count(*) AS n_shingles,
        |    CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
        |  FROM h JOIN dfreq USING (hh) GROUP BY 1)
        |SELECT doc_id, n_shingles, n_dup,
        |  (10000 * n_dup) // n_shingles AS dup_bp,
        |  10000 - ((10000 * n_dup) // n_shingles) // 2 AS weight_bp
        |FROM p""".stripMargin)),

    Q(
      "qd31_record_linkage",
      "Cross-corpus fuzzy record linkage (Dedup.linkCorpora) - the " +
        "entity-resolution JOIN between two different tables (here " +
        "the even-id and odd-id halves of documents, standing in for " +
        "crawl-vs-archive): each side builds its own band table (a " +
        "signature depends only on the row's text), candidates come " +
        "from ONE equi-join on (band, bkey) with per-side bucket " +
        "caps, verified by shingle jaccard >= 0.5. Output oriented " +
        "(left_id, right_id); equals union-LSH pairs restricted to " +
        "cross pairs, which the oracle replays.",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Dedup.linkCorpora(
          docs.filter(pmod(col("doc_id"), lit(2)) === 0),
          docs.filter(pmod(col("doc_id"), lit(2)) === 1),
          "doc_id", "text", threshold = 0.5)
      },
      Some(s"""WITH ${lshCtes()},
        |pairs AS ($lshPairSelect)
        |SELECT
        |  CASE WHEN a_id % 2 = 0 THEN a_id ELSE b_id END AS a_id,
        |  CASE WHEN a_id % 2 = 0 THEN b_id ELSE a_id END AS b_id,
        |  jaccard
        |FROM pairs
        |WHERE (a_id % 2) <> (b_id % 2)""".stripMargin)),

    Q(
      "qd32_span_rewrite",
      "Duplicated-span REMOVAL (Overlap.spanDedupRewrite) - the " +
        "rewrite companion of qd09's stats: every word position " +
        "covered by a corpus-duplicated 5-gram occurrence (>= 2 " +
        "occurrences corpus-wide, multiplicity counted, own repeats " +
        "included - qd09's exact definition) is cut, surviving words " +
        "re-join in order; short docs pass through, fully-duplicated " +
        "docs collapse to '' but keep their audit row. The Lee et " +
        "al. 2022 exact-substring-dedup shape at word granularity. " +
        "One gram-hash agg + semi-join back + bounded covered-" +
        "position explode + (doc, pos) anti-join rebuild - narrow " +
        "keys only, nothing all-pairs.",
      (s, dir) =>
        graft.operators.Overlap.spanDedupRewrite(
          graft.core.Partitioning.parallelize(
            Tables.load(s, dir, "documents"), col("doc_id")),
          "doc_id", "text", n = 5),
      Some(spanRewriteOracle)),

    Q(
      "qt35_token_shard",
      "Deterministic token-balanced corpus sharding " +
        "(Sharding.tokenShards — the export step that hands a " +
        "tokenized corpus to trainers): docs placed at stable " +
        "hash-order positions, the stream cut into ~4000-token " +
        "shards. The global cumulative token sum runs WITHOUT a " +
        "global window: bucket by the key's first hex digit (a " +
        "PREFIX of the sort key, so buckets are contiguous ranges " +
        "of the global order), 16-way-parallel in-bucket cumsum " +
        "windows, a one-row 16-entry prefix-offset fold, one " +
        "broadcast equi-join back. Oracle = the straightforward " +
        "single-window global cumsum the engine refuses to run.",
      (s, dir) =>
        graft.operators.Sharding.tokenShards(
          Tables.load(s, dir, "documents"), "doc_id",
          size(split(col("text"), " ")).cast("long"), budget = 4000L),
      Some("""WITH t AS (
        |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS key,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
        |  FROM documents),
        |c AS (
        |  SELECT tokens,
        |    sum(tokens) OVER (ORDER BY key ROWS UNBOUNDED PRECEDING)
        |      - tokens AS bef
        |  FROM t)
        |SELECT CAST(bef // 4000 AS BIGINT) AS shard,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(tokens) AS BIGINT) AS shard_tokens
        |FROM c GROUP BY 1""".stripMargin)),

    Q(
      "qt36_export_manifest",
      "The EXPORT manifest closing the pre-training lifecycle " +
        "(Curation.exportManifest): qt17's decontaminated pipeline " +
        "(curate → decontaminate → near-dedup → mix → pack) plus " +
        "qt35's token-balanced sharding over the packed SEQUENCES — " +
        "the (stratum, seq_id) key is the shard unit, so a shard " +
        "boundary can never split a training sequence. This is the " +
        "table a trainer actually consumes: deterministic shard → " +
        "token-budget assignment, reproducible at any partitioning. " +
        "Oracle = qt17's full oracle nested as a subquery + the " +
        "global-cumsum shard cut.",
      (s, dir) => {
        val docs = graft.core.Partitioning.parallelize(
          Tables.load(s, dir, "documents"), col("doc_id"))
        graft.operators.Curation.exportManifest(
          docs.filter(pmod(col("doc_id"), lit(50)) =!= 0),
          docs.filter(pmod(col("doc_id"), lit(50)) === 0),
          "doc_id", "text", "lang", "source", Seq("en", "es", "fr"),
          Map("src0" -> 900, "src1" -> 700, "src2" -> 500, "src3" -> 200),
          defaultPermille = 100, maxLen = 1024, nStrata = 4,
          maxSharedFp = 0L, shardBudget = 1024L)
      },
      Some(s"""WITH assign AS (
        |$decontPipelineOracle
        |),
        |seqs AS (
        |  SELECT concat(CAST(stratum AS VARCHAR), ':', CAST(seq_id AS VARCHAR)) AS sk,
        |    CAST(sum(n_tokens) AS BIGINT) AS seq_tokens
        |  FROM assign GROUP BY 1),
        |csum AS (
        |  SELECT seq_tokens,
        |    sum(seq_tokens) OVER (ORDER BY md5(sk) ROWS UNBOUNDED PRECEDING)
        |      - seq_tokens AS bef
        |  FROM seqs)
        |SELECT CAST(bef // 1024 AS BIGINT) AS shard,
        |  CAST(count(*) AS BIGINT) AS n_seqs,
        |  CAST(sum(seq_tokens) AS BIGINT) AS shard_tokens
        |FROM csum GROUP BY 1""".stripMargin)),

    Q(
      "qt34_classifier_curation",
      "LEARNED-filter curation (Curation.curateWithClassifier) - the " +
        "'replace my regex quality rules with a trained model' " +
        "migration as one composed operator: qt33's classifier " +
        "distills the lang='en' labeling (4 GD rounds, 4096 buckets), " +
        "docs scoring >= 0.55 survive, and the kept pool runs qd07's " +
        "production-order near-dedup (exact-collapse, LSH over " +
        "representatives, greedy keep). Output (doc_id, score) of the " +
        "survivors. Training offline-amortized; scoring map-side " +
        "against the KB model; composition, not new machinery - and " +
        "the composed oracle replays train + filter + dedup exactly.",
      (s, dir) =>
        graft.operators.Curation.curateWithClassifier(
          Tables.load(s, dir, "documents")
            .withColumn("label", (col("lang") === "en").cast("int")),
          "doc_id", "text", "label", threshold = 0.55,
          buckets = 4096, rounds = 4),
      Some {
        val sigZq =
          "0.5 + CAST(zq AS DOUBLE) / (2.0 * (1.0 + abs(CAST(zq AS DOUBLE))))"
        s"""WITH ${logitChain(4)},
          |scored AS (
          |  SELECT z.doc_id, round($sigZq, 6) AS score FROM zf z),
          |keptd AS (
          |  SELECT d.doc_id, d.text, s.score FROM documents d
          |  JOIN scored s USING (doc_id) WHERE s.score >= 0.55),
          |reps AS (
          |  SELECT min(doc_id) AS doc_id FROM keptd GROUP BY md5(text)),
          |d2 AS (
          |  SELECT k.doc_id, k.text FROM keptd k
          |  JOIN reps r ON k.doc_id = r.doc_id),
          |${lshCtes("d2")},
          |dropped AS (
          |  SELECT DISTINCT c.b_id AS doc_id
          |  FROM cand c
          |  JOIN sh sa ON sa.doc_id = c.a_id
          |  JOIN sh sb ON sb.doc_id = c.b_id
          |  WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) /
          |        CAST(len(list_distinct(sa.shingles || sb.shingles)) AS DOUBLE) >= 0.5)
          |SELECT k.doc_id, k.score FROM keptd k
          |JOIN reps r ON k.doc_id = r.doc_id
          |WHERE k.doc_id NOT IN (SELECT doc_id FROM dropped)""".stripMargin
      }),

    Q(
      "qd33_band_plan",
      "LSH band-plan S-curve (Dedup.lshBandPlan - the tuning table " +
        "behind qd02's bands=4/rows=4 and every banded threshold " +
        "here): for each (bands, rows) split of the 16-minhash " +
        "signature and each jaccard level, the collision probability " +
        "1-(1-s^r)^b. The dial that separates a linear candidate " +
        "stream from a flood at 100 TB. Powers are LEFT-FOLD repeated " +
        "multiplication (exact IEEE both engines), never libm pow; " +
        "the table is parameter-sized metadata.",
      (s, dir) => graft.operators.Dedup.lshBandPlan(s, k = 16),
      Some("""WITH combos AS (
        |  SELECT b AS bands, 16 // b AS rows FROM unnest([1,2,4,8,16]) t(b)),
        |grid AS (SELECT j FROM unnest(range(5, 100, 5)) t(j)),
        |base AS (
        |  SELECT bands, rows, j, CAST(j AS DOUBLE) / 100.0 AS s
        |  FROM combos, grid),
        |pb AS (
        |  SELECT *, list_reduce(
        |    list_prepend(1.0, list_transform(range(1, rows + 1), i -> s)),
        |    (a, x) -> a * x) AS p_band
        |  FROM base)
        |SELECT CAST(16 AS INT) AS k, CAST(bands AS BIGINT) AS bands,
        |  CAST(rows AS BIGINT) AS rows, CAST(j AS BIGINT) AS jaccard_pct,
        |  1.0 - list_reduce(
        |    list_prepend(1.0, list_transform(range(1, bands + 1),
        |      i -> 1.0 - p_band)),
        |    (a, x) -> a * x) AS p_collide
        |FROM pb""".stripMargin)),

    Q(
      "qd34_oph_minhash",
      "One-permutation-hashing MinHash near-dup pairs " +
        "(Dedup.ophNearDupPairs — the signature-cost optimization of " +
        "qd02): ONE hash per shingle split into 16 bins (slot i = min " +
        "hash in bin i) instead of 16 affine rehashes per shingle, so " +
        "signature construction is O(shingles) not O(k·shingles) — " +
        "the dominant cost at corpus scale. Empty bins fill by " +
        "rotation densification (nearest occupied bin rightward, " +
        "offset-shifted so borrow distances cannot collide). Same " +
        "band/candidate/verify machinery as qd02; 16 conditional min " +
        "aggregates in one map-side-combined hash agg.",
      (s, dir) =>
        Dedup.ophNearDupPairs(Tables.load(s, dir, "documents"), "doc_id", "text",
          nShingle = 3, k = 16, bands = 4, threshold = 0.5),
      Some {
        val minCols = (0 until 16)
          .map(i => s"min(CASE WHEN h % 16 = $i THEN h END) AS m$i")
          .mkString(",\n        |    ")
        val minsList = (0 until 16).map(i => s"m$i").mkString("[", ", ", "]")
        s"""WITH sh AS (
          |  SELECT doc_id,
          |    list_distinct(list_transform(range(1, len(w)-1),
          |      i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))) AS shingles
          |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
          |  WHERE len(w) >= 3),
          |hb AS (
          |  SELECT doc_id, ${dkHash60("s")} AS h
          |  FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)),
          |sparse AS (
          |  SELECT doc_id,
          |    $minCols
          |  FROM hb GROUP BY doc_id),
          |ml AS (SELECT doc_id, $minsList AS mins FROM sparse),
          |sigs AS (
          |  SELECT doc_id,
          |    list_transform(range(0, 16), i ->
          |      list_filter(list_transform(range(0, 16), o ->
          |        CASE WHEN mins[((i + o) % 16) + 1] IS NOT NULL
          |             THEN mins[((i + o) % 16) + 1] + o * ${Dedup.OphDensifyC}
          |        END), x -> x IS NOT NULL)[1]) AS sig
          |  FROM ml),
          |bands AS (
          |  SELECT doc_id, b.band AS band,
          |    concat(CAST(sig[4*b.band+1] AS VARCHAR), ',', CAST(sig[4*b.band+2] AS VARCHAR), ',',
          |           CAST(sig[4*b.band+3] AS VARCHAR), ',', CAST(sig[4*b.band+4] AS VARCHAR)) AS bkey
          |  FROM sigs, (SELECT unnest(range(0, 4)) AS band) b),
          |cand AS (
          |  SELECT DISTINCT a.doc_id AS a_id, b2.doc_id AS b_id
          |  FROM bands a JOIN bands b2
          |    ON a.band = b2.band AND a.bkey = b2.bkey AND a.doc_id < b2.doc_id)
          |$lshPairSelect""".stripMargin
      }),

    Q(
      "qd35_dedup_provenance",
      "Dedup PROVENANCE audit (Dedup.dedupProvenance — the 'why did " +
        "my document vanish' table behind qd07's kept set): one row " +
        "per input doc — kept (own id), exact_dup (its content-hash " +
        "group's min-id representative), or near_dup (the minimum " +
        "verified-pair witness). Statuses partition the corpus and " +
        "the kept set equals qd07 by construction; cost is qd07's " +
        "two audited stages plus a witness min-agg and one left " +
        "join — the debugging table every curation run should ship " +
        "next to its output.",
      (s, dir) =>
        Dedup.dedupProvenance(Tables.load(s, dir, "documents"),
          "doc_id", "text", nShingle = 3, k = 16, bands = 4,
          threshold = 0.5),
      Some(s"""WITH gh AS (SELECT doc_id, md5(text) AS h FROM documents),
        |gr AS (SELECT h, min(doc_id) AS rep_id FROM gh GROUP BY h),
        |ex AS (SELECT gh.doc_id, gr.rep_id FROM gh JOIN gr USING (h)),
        |d2 AS (
        |  SELECT d.doc_id, d.text FROM documents d
        |  JOIN ex ON d.doc_id = ex.doc_id AND ex.rep_id = d.doc_id),
        |${lshCtes("d2")},
        |pairs AS ($lshPairSelect),
        |wit AS (SELECT b_id, min(a_id) AS w_id FROM pairs GROUP BY 1)
        |SELECT ex.doc_id,
        |  CASE WHEN ex.rep_id <> ex.doc_id THEN 'exact_dup'
        |       WHEN wit.w_id IS NOT NULL THEN 'near_dup'
        |       ELSE 'kept' END AS status,
        |  CASE WHEN ex.rep_id <> ex.doc_id THEN ex.rep_id
        |       WHEN wit.w_id IS NOT NULL THEN wit.w_id
        |       ELSE ex.doc_id END AS kept_id
        |FROM ex LEFT JOIN wit ON ex.doc_id = wit.b_id""".stripMargin)),

    Q(
      "qd36_leak_report",
      "Per-BENCHMARK-item leakage fan-out (Dedup.benchmarkLeakReport " +
        "— qd17 reversed): for each benchmark doc (doc_id % 50 = 0), " +
        "how many corpus docs share a winnowing fingerprint and the " +
        "total shared occurrences — the table an eval owner reads to " +
        "decide which items are BURNED (a contaminated corpus doc is " +
        "curable by exclusion; a benchmark item mirrored across the " +
        "web is not). Benchmark fingerprints broadcast; one narrow " +
        "corpus pass; aggregation keyed on the benchmark id.",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Dedup.benchmarkLeakReport(
          docs.filter(pmod(col("doc_id"), lit(50)) =!= 0),
          docs.filter(pmod(col("doc_id"), lit(50)) === 0),
          "doc_id", "text", n = 3, window = 4)
      },
      Some(s"""WITH wd AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 6),
        |hs AS (
        |  SELECT doc_id,
        |    list_transform(
        |      list_transform(range(1, len(w) - 1),
        |        i -> concat(w[i], ' ', w[i+1], ' ', w[i+2])),
        |      g -> ${dkHash60("g")}) AS h
        |  FROM wd),
        |fp AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    list_transform(range(1, len(h) - 2),
        |      i -> list_min(list_slice(h, i, i + 3))))) AS fp
        |  FROM hs),
        |cfp AS (SELECT doc_id AS c_id, fp FROM fp WHERE doc_id % 50 <> 0),
        |bfp AS (SELECT doc_id AS b_id, fp FROM fp WHERE doc_id % 50 = 0),
        |hits AS (
        |  SELECT b.b_id AS doc_id,
        |    CAST(count(DISTINCT c.c_id) AS BIGINT) AS n_leaking_docs,
        |    CAST(count(*) AS BIGINT) AS n_shared_fp
        |  FROM bfp b JOIN cfp c ON b.fp = c.fp GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(coalesce(h.n_leaking_docs, 0) AS BIGINT) AS n_leaking_docs,
        |  CAST(coalesce(h.n_shared_fp, 0) AS BIGINT) AS n_shared_fp
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 50 = 0) d
        |LEFT JOIN hits h USING (doc_id)""".stripMargin)),

    Q(
      "qd37_lsh_recall",
      "RECALL audit of the qd02 LSH configuration vs exhaustive " +
        "exact-jaccard truth (Dedup.lshRecallReport) — the dedup " +
        "family's qs22, and the measured point on the curve " +
        "qd33's band plan predicts: n_true exact pairs ≥ 0.5, n_lsh " +
        "verified LSH pairs (precision 1 by construction), n_missed " +
        "candidate-generation misses, recall. Ground truth is the " +
        "unblocked inverted shingle-hash self-join (O(Σ df²) — an " +
        "audit op: sample-estimable at 100 TB, never the production " +
        "path).",
      (s, dir) =>
        Dedup.lshRecallReport(Tables.load(s, dir, "documents"),
          "doc_id", "text", nShingle = 3, k = 16, bands = 4,
          threshold = 0.5),
      Some(s"""WITH ${lshCtes()},
        |lshp AS (
        |  SELECT c.a_id, c.b_id
        |  FROM cand c
        |  JOIN sh sa ON sa.doc_id = c.a_id
        |  JOIN sh sb ON sb.doc_id = c.b_id
        |  WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) /
        |        CAST(len(list_distinct(sa.shingles || sb.shingles)) AS DOUBLE) >= 0.5),
        |inv AS (
        |  SELECT doc_id, len(shingles) AS n_sh,
        |    unnest(list_transform(shingles, x -> ${dkHash60("x")})) AS shh
        |  FROM sh),
        |tp AS (
        |  SELECT p.doc_id AS a_id, q.doc_id AS b_id,
        |    p.n_sh AS na, q.n_sh AS nb, count(*) AS inter
        |  FROM inv p JOIN inv q ON p.shh = q.shh AND p.doc_id < q.doc_id
        |  GROUP BY 1, 2, 3, 4),
        |truth AS (
        |  SELECT a_id, b_id FROM tp
        |  WHERE CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) >= 0.5),
        |c1 AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM truth),
        |c2 AS (SELECT CAST(count(*) AS BIGINT) AS n_lsh FROM lshp),
        |c3 AS (SELECT CAST(count(*) AS BIGINT) AS n_missed FROM (
        |  SELECT a_id, b_id FROM truth EXCEPT SELECT a_id, b_id FROM lshp))
        |SELECT n_true, n_lsh, n_missed,
        |  CASE WHEN n_true > 0 THEN
        |    round(CAST(n_true - n_missed AS DOUBLE) / CAST(n_true AS DOUBLE), 6)
        |  END AS recall
        |FROM c1, c2, c3""".stripMargin)),

    Q(
      "qd40_lsh_recall_sampled",
      "SAMPLED-TRUTH recall audit (Dedup.lshRecallSampled — qd37 " +
        "made runnable at production scale): exact-jaccard truth on " +
        "a deterministic 250-doc hash-order sample (qt24's bottom-k " +
        "machinery, stable under corpus growth), LSH side = the FULL " +
        "production pairs restricted to in-sample pairs, so both " +
        "sides count the same pair universe and est_recall is an " +
        "unbiased pair-recall estimate (binomial se ≈ √(r(1−r)/" +
        "n_true) — n_true reported for the error bar). Truth cost " +
        "is sample²-bounded: FLAT as the corpus grows where qd37's " +
        "is corpus-quadratic (ScaleSmoke).",
      (s, dir) =>
        Dedup.lshRecallSampled(Tables.load(s, dir, "documents"),
          "doc_id", "text", nShingle = 3, k = 16, bands = 4,
          threshold = 0.5, sampleSize = 250),
      Some(s"""WITH ${lshCtes()},
        |smp AS (SELECT doc_id FROM (
        |    SELECT doc_id, row_number() OVER (ORDER BY
        |      ${dkHash60("CAST(doc_id AS VARCHAR)")}, doc_id) AS rn
        |    FROM documents) WHERE rn <= 250),
        |lshp AS (
        |  SELECT c.a_id, c.b_id
        |  FROM cand c
        |  JOIN smp pa ON pa.doc_id = c.a_id
        |  JOIN smp pb ON pb.doc_id = c.b_id
        |  JOIN sh sa ON sa.doc_id = c.a_id
        |  JOIN sh sb ON sb.doc_id = c.b_id
        |  WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) /
        |        CAST(len(list_distinct(sa.shingles || sb.shingles)) AS DOUBLE) >= 0.5),
        |inv AS (
        |  SELECT sh.doc_id, len(sh.shingles) AS n_sh,
        |    unnest(list_transform(sh.shingles, x -> ${dkHash60("x")})) AS shh
        |  FROM sh JOIN smp USING (doc_id)),
        |tp AS (
        |  SELECT p.doc_id AS a_id, q.doc_id AS b_id,
        |    p.n_sh AS na, q.n_sh AS nb, count(*) AS inter
        |  FROM inv p JOIN inv q ON p.shh = q.shh AND p.doc_id < q.doc_id
        |  GROUP BY 1, 2, 3, 4),
        |truth AS (
        |  SELECT a_id, b_id FROM tp
        |  WHERE CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) >= 0.5),
        |c0 AS (SELECT CAST(count(*) AS BIGINT) AS sample_n FROM smp),
        |c1 AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM truth),
        |c2 AS (SELECT CAST(count(*) AS BIGINT) AS n_lsh FROM lshp),
        |c3 AS (SELECT CAST(count(*) AS BIGINT) AS n_missed FROM (
        |  SELECT a_id, b_id FROM truth EXCEPT SELECT a_id, b_id FROM lshp))
        |SELECT sample_n, n_true, n_lsh, n_missed,
        |  CASE WHEN n_true > 0 THEN
        |    round(CAST(n_true - n_missed AS DOUBLE) / CAST(n_true AS DOUBLE), 6)
        |  END AS est_recall
        |FROM c0, c1, c2, c3""".stripMargin)),

    Q(
      "qt42_dual_decontamination",
      "DUAL-MODALITY decontamination audit " +
        "(Curation.dualDecontaminationReport): per corpus doc, the " +
        "SURFACE channel (winnowing fingerprints shared with the " +
        "benchmark text — verbatim runs, qd17's machinery) and the " +
        "SEMANTIC channel (embedding within 0.5 cosine of a " +
        "benchmark vector, probed through an IVF index built OVER " +
        "THE BENCHMARK — qs38's machinery with the roles flipped: " +
        "the bench index is eval-set-sized, the corpus makes one " +
        "probing pass). kept = clears BOTH. The audit table a " +
        "release review reads; zero-hit docs stay for direct joins.",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val em = Tables.load(s, dir, "embeddings")
        graft.operators.Curation.dualDecontaminationReport(
          docs.filter(pmod(col("doc_id"), lit(50)) =!= 0),
          docs.filter(pmod(col("doc_id"), lit(50)) === 0),
          "doc_id", "text", em, "vec_id", "embedding",
          n = 3, window = 4, benchStride = 3, nProbe = 2,
          cosThreshold = 0.5, maxSharedFp = 0L)
      },
      Some(s"""WITH $dualDecontCtes
        |SELECT surf.doc_id, surf.n_shared_fp, sem.max_cos,
        |  (sem.max_cos IS NOT NULL AND sem.max_cos >= 0.5) AS semantic_hit,
        |  (surf.n_shared_fp <= 0 AND
        |   (sem.max_cos IS NULL OR sem.max_cos < 0.5)) AS kept
        |FROM surf LEFT JOIN sem USING (doc_id)""".stripMargin)),

    Q(
      "qt43_contamination_rate",
      "One-row CONTAMINATION-RATE rollup " +
        "(Curation.contaminationRate over qt42's dual audit) — the " +
        "MODEL-CARD number: docs flagged by the surface channel, by " +
        "the semantic channel, by both, total dropped, and the drop " +
        "rate a release review signs off on. One hash aggregate " +
        "over the audit table; rate is a single end division.",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val em = Tables.load(s, dir, "embeddings")
        graft.operators.Curation.contaminationRate(
          graft.operators.Curation.dualDecontaminationReport(
            docs.filter(pmod(col("doc_id"), lit(50)) =!= 0),
            docs.filter(pmod(col("doc_id"), lit(50)) === 0),
            "doc_id", "text", em, "vec_id", "embedding",
            n = 3, window = 4, benchStride = 3, nProbe = 2,
            cosThreshold = 0.5, maxSharedFp = 0L))
      },
      Some(s"""WITH $dualDecontCtes,
        |rep AS (
        |  SELECT surf.n_shared_fp,
        |    (sem.max_cos IS NOT NULL AND sem.max_cos >= 0.5) AS semantic_hit,
        |    (surf.n_shared_fp <= 0 AND
        |     (sem.max_cos IS NULL OR sem.max_cos < 0.5)) AS kept
        |  FROM surf LEFT JOIN sem USING (doc_id))
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN n_shared_fp > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_surface,
        |  CAST(sum(CASE WHEN semantic_hit THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_semantic,
        |  CAST(sum(CASE WHEN n_shared_fp > 0 AND semantic_hit
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
        |  CAST(sum(CASE WHEN NOT kept THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dropped,
        |  CASE WHEN count(*) > 0 THEN
        |    round(CAST(sum(CASE WHEN NOT kept THEN 1 ELSE 0 END) AS DOUBLE) /
        |      CAST(count(*) AS DOUBLE), 6)
        |  END AS drop_rate
        |FROM rep""".stripMargin)),

    Q(
      "qd39_minhash_error",
      "MinHash ESTIMATOR-ERROR audit (Dedup.minhashErrorReport — the " +
        "sketch-accuracy twin of qs36/qs37's distortion reports): for " +
        "every LSH-verified near-dup pair, the 16-coordinate " +
        "signature-agreement jaccard estimate next to the exact " +
        "value and |error| — the realized spread (sd ≈ √(j(1−j)/k)) " +
        "that justifies a signature width before qd33's S-curve is " +
        "trusted. Output-proportional: one fixed-k zip per verified " +
        "pair, nothing corpus-scale beyond the audited LSH machinery.",
      (s, dir) =>
        Dedup.minhashErrorReport(Tables.load(s, dir, "documents"),
          "doc_id", "text", nShingle = 3, k = 16, bands = 4,
          threshold = 0.5),
      Some(s"""WITH ${lshCtes()},
        |pairs AS ($lshPairSelect)
        |SELECT p.a_id, p.b_id, round(p.jaccard, 6) AS jaccard,
        |  round(CAST(len(list_filter(range(1, 17),
        |    i -> x.sig[i] = y.sig[i])) AS DOUBLE) / 16, 6) AS est_jaccard,
        |  round(abs(CAST(len(list_filter(range(1, 17),
        |    i -> x.sig[i] = y.sig[i])) AS DOUBLE) / 16 - p.jaccard), 6)
        |    AS abs_err
        |FROM pairs p
        |JOIN sigs x ON x.doc_id = p.a_id
        |JOIN sigs y ON y.doc_id = p.b_id""".stripMargin)),

    Q(
      "qt33_quality_classifier",
      "In-engine TRAINED text classifier (Logit.trainAndScore): " +
        "full-batch gradient descent over hashed unigram+bigram " +
        "features (4096 buckets), 10 unrolled rounds, distilling the " +
        "lang='en' labeling into a servable scorer - 91% training " +
        "accuracy vs the 61% majority baseline at sf0.001. " +
        "Deterministic by construction: zero init (nothing to seed), " +
        "the RATIONAL fast sigmoid 0.5 + z/(2(1+|z|)) with margin " +
        "gain 8 (pure IEEE, no exp/libm in the loop), coordinate-" +
        "normalized steps (bucket moves by its feature-mass-weighted " +
        "mean residual - frequency-independent step scale), and " +
        "DECIMAL(30,6) quantization of every margin, residual, " +
        "gradient and weight - so the oracle replays training " +
        "bit-for-bit like the Lloyd rounds. Model = 4096 weights + " +
        "bias at any corpus size; per round one broadcast join + two " +
        "hash aggs; lineage cut per round past 4 rounds.",
      (s, dir) =>
        graft.operators.Logit.trainAndScore(
          Tables.load(s, dir, "documents")
            .withColumn("label", (col("lang") === "en").cast("int")),
          "doc_id", "text", "label", buckets = 4096, rounds = 10),
      Some(logitOracle(withLabel = true))),

    Q(
      "qt30_source_divergence",
      "Per-source distribution drift (TextAnalysis.sourceDivergence): " +
        "Jensen-Shannon divergence in bits between each source's " +
        "unigram distribution and the corpus-wide mix — the monitor " +
        "that catches a source going off-mix between snapshots. " +
        "Linear in sources (vs the reference mix, never pairwise); " +
        "the absent-token mass folds closed-form (p=0 → m=q/2 → the " +
        "Q-term collapses to q), so only (source, present-token) rows " +
        "exist — no source×vocab expansion. qt16's libm discipline: " +
        "per-term DECIMAL(30,6) quantization before order-invariant " +
        "sums, round-6 output.",
      (s, dir) =>
        graft.operators.TextAnalysis.sourceDivergence(
          Tables.load(s, dir, "documents"), "source", "text"),
      Some("""WITH tok AS (
        |  SELECT source, unnest(string_split(coalesce(text, ''), ' ')) AS token
        |  FROM documents),
        |tf AS (SELECT source, token, CAST(count(*) AS BIGINT) AS tf
        |       FROM tok GROUP BY 1, 2),
        |ns AS (SELECT source, CAST(sum(tf) AS BIGINT) AS n FROM tf GROUP BY 1),
        |tfg AS (SELECT token, CAST(sum(tf) AS BIGINT) AS tfg FROM tf GROUP BY 1),
        |ntot AS (SELECT CAST(sum(tfg) AS BIGINT) AS n_tot FROM tfg),
        |terms AS (
        |  SELECT tf.source,
        |    CAST((CAST(tf AS DOUBLE)/CAST(n AS DOUBLE)) *
        |      log2((CAST(tf AS DOUBLE)/CAST(n AS DOUBLE)) /
        |        ((CAST(tf AS DOUBLE)/CAST(n AS DOUBLE) +
        |          CAST(tfg AS DOUBLE)/CAST(n_tot AS DOUBLE)) / 2.0))
        |      AS DECIMAL(30,6)) AS tp,
        |    CAST((CAST(tfg AS DOUBLE)/CAST(n_tot AS DOUBLE)) *
        |      log2((CAST(tfg AS DOUBLE)/CAST(n_tot AS DOUBLE)) /
        |        ((CAST(tf AS DOUBLE)/CAST(n AS DOUBLE) +
        |          CAST(tfg AS DOUBLE)/CAST(n_tot AS DOUBLE)) / 2.0))
        |      AS DECIMAL(30,6)) AS tq,
        |    CAST(CAST(tfg AS DOUBLE)/CAST(n_tot AS DOUBLE)
        |      AS DECIMAL(30,6)) AS qm
        |  FROM tf JOIN ns USING (source) JOIN tfg USING (token), ntot)
        |SELECT source,
        |  round(0.5 * CAST(sum(tp) AS DOUBLE) +
        |    0.5 * (CAST(sum(tq) AS DOUBLE) +
        |      (1.0 - CAST(sum(qm) AS DOUBLE))), 6) AS js_bits
        |FROM terms GROUP BY 1""".stripMargin)),

    Q(
      "qt31_doc_neighbors",
      "In-engine document embeddings + semantic neighbors " +
        "(TextAnalysis.hashedDocVectors/hashedNeighbors): signed " +
        "feature hashing of tf·(n/df) weights into 16 dense dims — " +
        "sign and dimension are disjoint bits of the engine-wide md5 " +
        "hash60 (dim via shiftright: the hash exceeds double's 53-bit " +
        "exact range, so no float division touches it), " +
        "contributions DECIMAL(30,6)-quantized before per-dim sums, " +
        "vectors rounded through FLOAT. No external model, no vocab " +
        "table; new tokens hash somewhere without retraining. " +
        "Neighbors = broadcast query batch (doc_id % 20 = 0) × corpus " +
        "scan, codegen float-dot cosine, top-5; zero-norm vectors " +
        "filtered, never NaN-ranked. The qs ladder (IVF/SQ/PQ) " +
        "accepts these vectors unchanged.",
      (s, dir) =>
        graft.operators.TextAnalysis.hashedNeighbors(
          Tables.load(s, dir, "documents"), "doc_id", "text",
          col("doc_id") % 20 === 0, k = 5),
      Some {
        def dot(a: String, b: String): String =
          s"list_reduce(list_transform(list_zip($a, $b), " +
            s"s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), (x, y) -> x + y)"
        s"""WITH tok AS (
        |  SELECT doc_id, unnest(string_split(coalesce(text, ''), ' ')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
        |       FROM tok GROUP BY 1, 2),
        |dfreq AS (SELECT token, CAST(count(*) AS BIGINT) AS df
        |          FROM tf GROUP BY 1),
        |nn AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM tf),
        |contrib AS (
        |  SELECT doc_id,
        |    CAST(((${dkHash60("token")} // 2) % 16) AS INT) AS dim,
        |    CAST(CAST((${dkHash60("token")} % 2) * 2 - 1 AS DOUBLE)
        |      * CAST(tf AS DOUBLE) * (n / CAST(df AS DOUBLE))
        |      AS DECIMAL(30,6)) AS w
        |  FROM tf JOIN dfreq USING (token), nn),
        |cells AS (SELECT doc_id, dim, CAST(sum(w) AS DOUBLE) AS v
        |          FROM contrib GROUP BY 1, 2),
        |grid AS (SELECT doc_id, t.d AS dim
        |         FROM (SELECT DISTINCT doc_id FROM cells), unnest(range(0, 16)) t(d)),
        |vec AS (
        |  SELECT g.doc_id,
        |    list(CAST(coalesce(c.v, 0.0) AS FLOAT) ORDER BY g.dim) AS vec
        |  FROM grid g LEFT JOIN cells c
        |    ON c.doc_id = g.doc_id AND c.dim = g.dim
        |  GROUP BY 1),
        |vn AS (SELECT doc_id, vec, sqrt(${dot("vec", "vec")}) AS nrm FROM vec),
        |vnz AS (SELECT * FROM vn WHERE nrm > 0),
        |q AS (SELECT * FROM vnz WHERE doc_id % 20 = 0)
        |SELECT doc_id, nbr_id, rnk FROM (
        |  SELECT q.doc_id AS doc_id, c.doc_id AS nbr_id,
        |    row_number() OVER (PARTITION BY q.doc_id ORDER BY
        |      ${dot("q.vec", "c.vec")} / (q.nrm * c.nrm) DESC,
        |      c.doc_id) AS rnk
        |  FROM q JOIN vnz c ON q.doc_id <> c.doc_id)
        |WHERE rnk <= 5""".stripMargin
      }),

    Q(
      "qt32_importance_resample",
      "DSIR data selection (Curation.importanceResample, Xie et al. " +
        "2023 arXiv:2302.03169): hashed unigram+bigram bag counts " +
        "(1024 buckets), add-one-smoothed log2-likelihood-ratio " +
        "importance weights target-vs-raw, per-doc sparse score " +
        "sum tf*lambda, top-100 raw docs by (score DESC, doc_id). " +
        "Target = source 'src0'; lambda and each contribution " +
        "DECIMAL(30,6)-quantized (qt30 libm discipline); selection " +
        "via orderBy+limit, never a global window.",
      (s, dir) =>
        graft.operators.Curation.importanceResample(
          Tables.load(s, dir, "documents"), "doc_id", "text",
          col("source") === "src0", buckets = 1024, keep = 100),
      Some(s"""WITH tokl AS MATERIALIZED (
        |  SELECT doc_id, source = 'src0' AS is_target,
        |    string_split(coalesce(text, ''), ' ') AS a
        |  FROM documents),
        |feats AS (
        |  SELECT doc_id, is_target, unnest(a) AS f FROM tokl
        |  UNION ALL
        |  SELECT doc_id, is_target, a[t.i] || ' ' || a[t.i + 1] AS f
        |  FROM tokl, unnest(range(1, len(a))) t(i)),
        |fb AS MATERIALIZED (
        |  SELECT doc_id, is_target,
        |    ${dkHash60("f")} % 1024 AS bucket,
        |    CAST(count(*) AS BIGINT) AS tf
        |  FROM feats GROUP BY 1, 2, 3),
        |ct AS (SELECT bucket, CAST(sum(tf) AS BIGINT) AS ct
        |       FROM fb WHERE is_target GROUP BY 1),
        |cr AS (SELECT bucket, CAST(sum(tf) AS BIGINT) AS cr
        |       FROM fb WHERE NOT is_target GROUP BY 1),
        |nt AS (SELECT CAST(sum(ct) AS DOUBLE) AS nt FROM ct),
        |nr AS (SELECT CAST(sum(cr) AS DOUBLE) AS nr FROM cr),
        |lam AS (
        |  SELECT coalesce(ct.bucket, cr.bucket) AS bucket,
        |    CAST(log2((CAST(coalesce(ct, 0) AS DOUBLE) + 1.0) / (nt + 1024.0)) -
        |         log2((CAST(coalesce(cr, 0) AS DOUBLE) + 1.0) / (nr + 1024.0))
        |      AS DECIMAL(30,6)) AS lam
        |  FROM ct FULL OUTER JOIN cr ON ct.bucket = cr.bucket, nt, nr)
        |SELECT doc_id,
        |  round(CAST(sum(CAST(CAST(tf AS DOUBLE) * CAST(lam AS DOUBLE)
        |    AS DECIMAL(30,6))) AS DOUBLE), 6) AS score
        |FROM fb JOIN lam USING (bucket)
        |WHERE NOT is_target
        |GROUP BY 1
        |ORDER BY score DESC, doc_id
        |LIMIT 100""".stripMargin)),

    Q(
      "qt37_scorer_auc",
      "Exact tie-aware ROC AUC of a quality scorer against labels " +
        "(Eval.aucReport) — the measurement half of the learned-" +
        "filter loop: before a filter gates the corpus, its score " +
        "needs a discrimination number. Integer Mann–Whitney pair " +
        "counts (concordant=2, tied=1) from one hash agg on distinct " +
        "scores; the negBelow prefix sum runs bucketed (qt35's " +
        "no-global-window discipline — floor(score·16) buckets are " +
        "contiguous score ranges), one double division at the end. " +
        "Scored here: qt02's type-token ratio vs the lang='en' " +
        "labeling; Logit.trainAndScore output feeds the same " +
        "operator unchanged.",
      (s, dir) => {
        val t = split(coalesce(col("text"), lit("")), " ")
        graft.operators.Eval.aucReport(
          Tables.load(s, dir, "documents").select(
            (size(array_distinct(t)).cast("double") /
              size(t).cast("double")).as("score"),
            (col("lang") === "en").cast("int").as("label")),
          "label", "score")
      },
      Some("""WITH s AS (
        |  SELECT CAST(len(list_distinct(string_split(coalesce(text,''),' '))) AS DOUBLE) /
        |      CAST(len(string_split(coalesce(text,''),' ')) AS DOUBLE) AS score,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents),
        |g AS (
        |  SELECT score, CAST(sum(y) AS BIGINT) AS pos,
        |    CAST(count(*) - sum(y) AS BIGINT) AS neg
        |  FROM s GROUP BY 1),
        |c AS (
        |  SELECT pos, neg,
        |    sum(neg) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING) - neg
        |      AS negbelow
        |  FROM g)
        |SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
        |  CAST(sum(neg) AS BIGINT) AS n_neg,
        |  round(CAST(sum(pos * (2 * negbelow + neg)) AS DOUBLE) /
        |    (2.0 * CAST(sum(pos) AS DOUBLE) * CAST(sum(neg) AS DOUBLE)), 6)
        |    AS auc
        |FROM c""".stripMargin)),

    Q(
      "qt38_calibration",
      "Reliability table for the same scorer (Eval.calibrationBins): " +
        "scores cut into 10 equal-width probability bins, per bin " +
        "count / positives / DECIMAL-exact mean score / positive " +
        "fraction — whether 'score 0.8' means 80% precision or just " +
        "'more than 0.7'. A calibrated filter lets curation pick its " +
        "threshold from the target kept-quality directly. One hash " +
        "aggregate, |bins| rows out.",
      (s, dir) => {
        val t = split(coalesce(col("text"), lit("")), " ")
        graft.operators.Eval.calibrationBins(
          Tables.load(s, dir, "documents").select(
            (size(array_distinct(t)).cast("double") /
              size(t).cast("double")).as("score"),
            (col("lang") === "en").cast("int").as("label")),
          "label", "score")
      },
      Some("""WITH s AS (
        |  SELECT CAST(len(list_distinct(string_split(coalesce(text,''),' '))) AS DOUBLE) /
        |      CAST(len(string_split(coalesce(text,''),' ')) AS DOUBLE) AS score,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents)
        |SELECT CAST(least(greatest(floor(score * 10), 0), 9) AS BIGINT) AS bin,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(y) AS BIGINT) AS n_pos,
        |  round(CAST(sum(CAST(score AS DECIMAL(30,6))) AS DOUBLE) /
        |    count(*), 6) AS mean_score,
        |  round(CAST(sum(y) AS DOUBLE) / count(*), 6) AS frac_pos
        |FROM s GROUP BY 1""".stripMargin)),

    Q(
      "qt41_sliced_auc",
      "SLICED scorer evaluation (Eval.aucReportBy — qt37 per group): " +
        "the type-token-ratio scorer's AUC per SOURCE — a scorer can " +
        "hold a healthy global AUC while being noise on one source, " +
        "and the global number never says so. Same integer " +
        "Mann–Whitney identity, every stage keyed by (source, …): " +
        "one (source, score) hash agg, per-(source, bucket) windows, " +
        "a 16-rows-per-group offset fold, one broadcast join. " +
        "Single-class slices report NULL auc.",
      (s, dir) => {
        val t = split(coalesce(col("text"), lit("")), " ")
        graft.operators.Eval.aucReportBy(
          Tables.load(s, dir, "documents").select(
            col("source"),
            (size(array_distinct(t)).cast("double") /
              size(t).cast("double")).as("score"),
            (col("lang") === "en").cast("int").as("label")),
          "source", "label", "score")
      },
      Some("""WITH s AS (
        |  SELECT source,
        |    CAST(len(list_distinct(string_split(coalesce(text,''),' '))) AS DOUBLE) /
        |      CAST(len(string_split(coalesce(text,''),' ')) AS DOUBLE) AS score,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents),
        |g AS (
        |  SELECT source, score, CAST(sum(y) AS BIGINT) AS pos,
        |    CAST(count(*) - sum(y) AS BIGINT) AS neg
        |  FROM s GROUP BY 1, 2),
        |c AS (
        |  SELECT source, pos, neg,
        |    sum(neg) OVER (PARTITION BY source ORDER BY score
        |      ROWS UNBOUNDED PRECEDING) - neg AS negbelow
        |  FROM g)
        |SELECT source,
        |  CAST(sum(pos) AS BIGINT) AS n_pos,
        |  CAST(sum(neg) AS BIGINT) AS n_neg,
        |  CASE WHEN sum(pos) > 0 AND sum(neg) > 0 THEN
        |    round(CAST(sum(pos * (2 * negbelow + neg)) AS DOUBLE) /
        |      (2.0 * CAST(sum(pos) AS DOUBLE) * CAST(sum(neg) AS DOUBLE)), 6)
        |  END AS auc
        |FROM c GROUP BY 1""".stripMargin)),

    Q(
      "qt39_token_budget",
      "WATER-FILLING token-budget allocation " +
        "(Curation.tokenBudgetWaterfill) — the mixture-planning step " +
        "before weightedMix samples anything: per-source availability " +
        "vs integer mixing weights vs a 20k-token budget; sources " +
        "whose proportional claim exceeds their supply SATURATE and " +
        "the unused claim redistributes (3 unrolled rounds). Pure " +
        "integer arithmetic (want = floor(R·w/Σw)) — the allocation " +
        "is bit-reproducible and the oracle replays each round. One " +
        "corpus hash agg, then |sources|-row passes.",
      (s, dir) =>
        graft.operators.Curation.tokenBudgetWaterfill(
          Tables.load(s, dir, "documents"), "source",
          size(split(col("text"), " ")).cast("long"),
          Map("src0" -> 400, "src1" -> 300, "src2" -> 200),
          defaultWeight = 10, budget = 20000L, rounds = 3),
      Some(s"""WITH $waterfillCtes
        |SELECT source, avail AS avail_tokens,
        |  CAST(CASE WHEN sat THEN avail ELSE coalesce(want, 0) END
        |    AS BIGINT) AS alloc_tokens,
        |  sat AS saturated
        |FROM st3""".stripMargin)),

    Q(
      "qt40_budget_mix",
      "EXECUTE the water-fill plan (Curation.waterfilledMix): qt39's " +
        "per-source allocations realized as a deterministic document " +
        "selection — each source's docs stand in md5-hash order and " +
        "the prefix whose cumulative tokens fit the allocation is " +
        "kept (a doc never splits; saturated sources keep " +
        "everything). The per-source cumulative sum runs bucketed " +
        "(qt35's two-phase discipline, partitioned by (source, " +
        "key-prefix)), so no source ever needs a single-reducer " +
        "sort. Output: the kept (doc_id, source, tokens) manifest, " +
        "reproducible at any partitioning.",
      (s, dir) =>
        graft.operators.Curation.waterfilledMix(
          Tables.load(s, dir, "documents"), "doc_id", "source",
          size(split(col("text"), " ")).cast("long"),
          Map("src0" -> 400, "src1" -> 300, "src2" -> 200),
          defaultWeight = 10, budget = 20000L, rounds = 3),
      Some(s"""WITH $waterfillCtes,
        |alloc AS (
        |  SELECT source,
        |    CAST(CASE WHEN sat THEN avail ELSE coalesce(want, 0) END
        |      AS BIGINT) AS alloc
        |  FROM st3),
        |t AS (
        |  SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS key,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, tokens,
        |    sum(tokens) OVER (PARTITION BY source ORDER BY key
        |      ROWS UNBOUNDED PRECEDING) - tokens AS bef
        |  FROM t)
        |SELECT c.doc_id, c.source, c.tokens
        |FROM c JOIN alloc a ON a.source = c.source
        |WHERE c.bef + c.tokens <= a.alloc""".stripMargin))
  )

  /** DuckDB replay of Curation.tokenBudgetWaterfill (3 unrolled
    * rounds, 20k budget, src0/1/2 weighted 400/300/200, default 10) —
    * the CTE chain ending at `st3`; shared by qt39 (the plan) and
    * qt40 (its execution). */
  private def waterfillCtes: String = {
    def rnd(r: Int): String = {
      val p = if (r == 1) "st0" else s"st${r - 1}"
      s"""g$r AS (
        |  SELECT 20000 - coalesce(sum(CASE WHEN sat THEN avail END), 0)
        |      AS rb,
        |    coalesce(sum(CASE WHEN NOT sat THEN w END), 0) AS ws
        |  FROM $p),
        |st$r AS (
        |  SELECT source, avail, w,
        |    CASE WHEN p.sat THEN p.want
        |         WHEN g.ws > 0 THEN (g.rb * w) // g.ws
        |         ELSE 0 END AS want,
        |    p.sat OR (g.ws > 0 AND avail <= (g.rb * w) // g.ws) AS sat
        |  FROM $p p, g$r g)""".stripMargin
    }
    s"""av AS (
      |  SELECT source,
      |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS avail
      |  FROM documents GROUP BY 1),
      |st0 AS (
      |  SELECT source, avail,
      |    CAST(CASE source WHEN 'src0' THEN 400 WHEN 'src1' THEN 300
      |         WHEN 'src2' THEN 200 ELSE 10 END AS BIGINT) AS w,
      |    false AS sat, CAST(NULL AS BIGINT) AS want
      |  FROM av),
      |${rnd(1)},
      |${rnd(2)},
      |${rnd(3)}""".stripMargin
  }
}
