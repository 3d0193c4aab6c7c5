package graft.queries

import graft.core.Tables
import graft.operators.Similarity
import org.apache.spark.sql.functions.col

/** ANN over the `embeddings` table. Outputs are (vec_id, nbr_id, rnk)
  * id-triples only — the cosine values themselves are bit-identical
  * across engines (fixed-fold math) but keeping floats out of the
  * output removes any residual hash risk.
  */
object SimilarityQueries {

  // DuckDB rendition of the fixed-fold double dot product
  private def dkDot(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), " +
      s"s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), (x, y) -> x + y)"
  private def dkNorm(a: String): String =
    s"sqrt(list_reduce(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))"

  /** DuckDB rendition of Similarity.sqCalibrate + sqQuantize (shared
    * by qs10 and qs11): per-dim max-abs scales, the scales folded to a
    * list in dim order, and the clamped ⌊x/s·127+0.5⌋ int8 codes —
    * expression shapes mirrored verbatim from the Spark side. */
  private[queries] def sqCtes: String = """sc AS (
    |  SELECT t.i AS dim,
    |    CASE WHEN max(abs(CAST(e.embedding[t.i] AS DOUBLE))) = 0 THEN 1.0
    |         ELSE max(abs(CAST(e.embedding[t.i] AS DOUBLE))) END AS scale
    |  FROM embeddings e, unnest(range(1, len(e.embedding) + 1)) t(i)
    |  GROUP BY t.i),
    |scl AS (SELECT list(scale ORDER BY dim) AS s FROM sc),
    |qv AS (
    |  SELECT vec_id,
    |    list_transform(range(1, len(embedding) + 1), i ->
    |      CAST(least(greatest(floor(CAST(embedding[i] AS DOUBLE) / s[i] * 127 + 0.5),
    |        -127), 127) AS BIGINT)) AS q
    |  FROM embeddings, scl)""".stripMargin

  /** Shared by qs02 (build-and-search) and qs07 (search against the
    * parquet-round-tripped index): the from-index path is semantics-
    * identical, so one oracle checks both. */
  private def ivfOracle: String = s"""WITH e AS (
        |  SELECT vec_id, embedding, ${dkNorm("embedding")} AS nrm
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cent_id, embedding AS cemb, nrm AS cnrm FROM e WHERE vec_id % 40 = 0),
        |ranked AS (
        |  SELECT e.vec_id, c.cent_id,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      ${dkDot("e.embedding", "c.cemb")} / (e.nrm * c.cnrm) DESC,
        |      c.cent_id) AS rn
        |  FROM e, c),
        |assign AS (SELECT vec_id, cent_id FROM ranked WHERE rn = 1),
        |probes AS (SELECT vec_id, cent_id FROM ranked WHERE rn <= 4),
        |b AS (SELECT e.vec_id, e.embedding, e.nrm, a.cent_id FROM e JOIN assign a USING (vec_id)),
        |p AS (SELECT e.vec_id, e.embedding, e.nrm, pr.cent_id FROM e JOIN probes pr USING (vec_id))
        |SELECT vec_id, nbr_id, rnk FROM (
        |  SELECT p.vec_id AS vec_id, q.vec_id AS nbr_id,
        |    row_number() OVER (PARTITION BY p.vec_id ORDER BY
        |      ${dkDot("p.embedding", "q.embedding")} / (p.nrm * q.nrm) DESC,
        |      q.vec_id) AS rnk
        |  FROM p JOIN b q ON p.cent_id = q.cent_id AND p.vec_id <> q.vec_id)
        |WHERE rnk <= 5""".stripMargin

  /** One unrolled Lloyd round for the qs08 oracle: assignment by
    * cosine rank against `centsIn`, per-cell per-dim decimal mean,
    * repack in dim order, cast to float, renorm — the SQL rendition
    * of Similarity.trainIvfCentroids' round. */
  private def lloydRound(r: Int, centsIn: String): String =
    s"""r$r AS (
      |  SELECT e.vec_id, c.cent_id,
      |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |      ${dkDot("e.embedding", "c.cemb")} / (e.nrm * c.cnrm) DESC, c.cent_id) AS rn
      |  FROM e, $centsIn c),
      |a$r AS (SELECT vec_id, cent_id FROM r$r WHERE rn = 1),
      |m$r AS (
      |  SELECT a$r.cent_id, t.i AS dim,
      |    CAST(sum(CAST(CAST(e.embedding[t.i] AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE) /
      |      CAST(count(*) AS DOUBLE) AS m
      |  FROM e JOIN a$r USING (vec_id), unnest(range(1, len(e.embedding) + 1)) t(i)
      |  GROUP BY 1, 2),
      |c$r AS (
      |  SELECT cent_id, list_transform(list(m ORDER BY dim), x -> CAST(x AS FLOAT)) AS cemb
      |  FROM m$r GROUP BY 1),
      |cn$r AS (SELECT cent_id, cemb, ${dkNorm("cemb")} AS cnrm FROM c$r)"""
      .stripMargin

  private def kmeansOracle: String =
    s"""WITH e AS (
      |  SELECT vec_id, embedding, ${dkNorm("embedding")} AS nrm FROM embeddings),
      |c0 AS (
      |  SELECT vec_id AS cent_id, embedding AS cemb, nrm AS cnrm FROM e WHERE vec_id % 40 = 0),
      |${lloydRound(1, "c0")},
      |${lloydRound(2, "cn1")},
      |rf AS (
      |  SELECT e.vec_id, c.cent_id,
      |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |      ${dkDot("e.embedding", "c.cemb")} / (e.nrm * c.cnrm) DESC, c.cent_id) AS rn
      |  FROM e, cn2 c)
      |SELECT vec_id, cent_id FROM rf WHERE rn = 1""".stripMargin

  /** DuckDB rendition of the fixed-fold squared-L2 distance
    * (FloatVecL2's contract). */
  private def dkL2(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), " +
      s"s -> (CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE)) * " +
      s"(CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE))), (x, y) -> x + y)"

  /** PQ train + encode CTE chain (sv → c0 → one Lloyd round → cb →
    * codes), shared by qs14 (pure ADC scan), qs15 (IVF-PQ) and qs16
    * (residual IVF-PQ, which quantizes a residual relation instead of
    * raw embeddings — `rel`/`vec` parameterize the source): nSub=8,
    * dim=64, pqStride=40, iters=1. Ends at `codes`
    * (vec_id, m, cent_id). */
  private def pqCtes: String = pqCtesFrom("embeddings", "embedding")

  private def pqCtesFrom(rel: String, vec: String): String =
    s"""sv AS (
      |  SELECT vec_id, t.m AS m,
      |    e.$vec[t.m*8+1 : t.m*8+8] AS sv
      |  FROM $rel e, unnest(range(0, 8)) t(m)),
      |c0 AS (SELECT m, vec_id AS cent_id, sv AS cvec FROM sv
      |       WHERE vec_id % 40 = 0 AND vec_id < 10240),
      |r1 AS (
      |  SELECT sv.vec_id, sv.m, c.cent_id,
      |    row_number() OVER (PARTITION BY sv.vec_id, sv.m ORDER BY
      |      ${dkL2("sv.sv", "c.cvec")} ASC, c.cent_id) AS rn
      |  FROM sv JOIN c0 c ON sv.m = c.m),
      |a1 AS (SELECT vec_id, m, cent_id FROM r1 WHERE rn = 1),
      |m1 AS (
      |  SELECT a1.m, a1.cent_id, u.i AS dim,
      |    CAST(sum(CAST(CAST(sv.sv[u.i] AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE) /
      |      CAST(count(*) AS DOUBLE) AS mu
      |  FROM sv JOIN a1 ON sv.vec_id = a1.vec_id AND sv.m = a1.m,
      |    unnest(range(1, len(sv.sv) + 1)) u(i)
      |  GROUP BY 1, 2, 3),
      |cb AS (
      |  SELECT m, cent_id,
      |    list_transform(list(mu ORDER BY dim), x -> CAST(x AS FLOAT)) AS cvec
      |  FROM m1 GROUP BY 1, 2),
      |re AS (
      |  SELECT sv.vec_id, sv.m, c.cent_id,
      |    row_number() OVER (PARTITION BY sv.vec_id, sv.m ORDER BY
      |      ${dkL2("sv.sv", "c.cvec")} ASC, c.cent_id) AS rn
      |  FROM sv JOIN cb c ON sv.m = c.m),
      |codes AS (SELECT vec_id, m, cent_id FROM re WHERE rn = 1)""".stripMargin

  /** Parameterized MULTI-ROUND PQ train+encode CTE chain — the
    * production-recipe variant of [[pqCtesFrom]] (which stays pinned
    * at stride=40/iters=1 for qs14/qs15/qs16/qs29): seeds every
    * `stride`-th vector capped at 256 entries (vec_id < stride·256 —
    * K=256, the one-byte-per-code production standard), then `iters`
    * unrolled Lloyd rounds (assign by fixed-fold squared L2, ties →
    * lowest cent_id; per-(m, cent, dim) DECIMAL-exact means repacked
    * in dim order, cast to float). Ends at `cb` / `codes`. */
  private def pqCtesMulti(rel: String, vec: String,
      stride: Int, iters: Int): String = {
    def round(r: Int, cbIn: String): String =
      s"""r$r AS (
        |  SELECT sv.vec_id, sv.m, c.cent_id,
        |    row_number() OVER (PARTITION BY sv.vec_id, sv.m ORDER BY
        |      ${dkL2("sv.sv", "c.cvec")} ASC, c.cent_id) AS rn
        |  FROM sv JOIN $cbIn c ON sv.m = c.m),
        |a$r AS (SELECT vec_id, m, cent_id FROM r$r WHERE rn = 1),
        |m$r AS (
        |  SELECT a$r.m, a$r.cent_id, u.i AS dim,
        |    CAST(sum(CAST(CAST(sv.sv[u.i] AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE) /
        |      CAST(count(*) AS DOUBLE) AS mu
        |  FROM sv JOIN a$r ON sv.vec_id = a$r.vec_id AND sv.m = a$r.m,
        |    unnest(range(1, len(sv.sv) + 1)) u(i)
        |  GROUP BY 1, 2, 3),
        |cb$r AS MATERIALIZED (
        |  SELECT m, cent_id,
        |    list_transform(list(mu ORDER BY dim), x -> CAST(x AS FLOAT)) AS cvec
        |  FROM m$r GROUP BY 1, 2)""".stripMargin
    val rounds = (1 to iters)
      .map(r => round(r, if (r == 1) "c0" else s"cb${r - 1}")).mkString(",\n")
    s"""sv AS MATERIALIZED (
      |  SELECT vec_id, t.m AS m,
      |    e.$vec[t.m*8+1 : t.m*8+8] AS sv
      |  FROM $rel e, unnest(range(0, 8)) t(m)),
      |c0 AS (SELECT m, vec_id AS cent_id, sv AS cvec FROM sv
      |       WHERE vec_id % $stride = 0 AND vec_id < ${stride * 256}),
      |$rounds,
      |cb AS (SELECT * FROM cb$iters),
      |re AS (
      |  SELECT sv.vec_id, sv.m, c.cent_id,
      |    row_number() OVER (PARTITION BY sv.vec_id, sv.m ORDER BY
      |      ${dkL2("sv.sv", "c.cvec")} ASC, c.cent_id) AS rn
      |  FROM sv JOIN cb c ON sv.m = c.m),
      |codes AS (SELECT vec_id, m, cent_id FROM re WHERE rn = 1)""".stripMargin
  }

  /** qs14 oracle: PQ train (1 Lloyd round from stride seeds, per-
    * subquantizer decimal-exact means) → encode → ADC distance-table
    * scoring — the SQL rendition of Similarity.pqTopK with nSub=8,
    * dim=64, stride=40, iters=1, queries = vec_id % 50. */
  private def pqOracle: String =
    s"""WITH $pqCtes,
      |qd AS (
      |  SELECT sv.vec_id AS q_id, sv.m, c.cent_id,
      |    ${dkL2("sv.sv", "c.cvec")} AS d2
      |  FROM sv JOIN cb c ON sv.m = c.m
      |  WHERE sv.vec_id % 50 = 0),
      |scored AS (
      |  SELECT qd.q_id, codes.vec_id AS nbr_id,
      |    CAST(sum(CAST(qd.d2 AS DECIMAL(30,6))) AS DOUBLE) AS dist
      |  FROM codes JOIN qd ON codes.m = qd.m AND codes.cent_id = qd.cent_id
      |  WHERE qd.q_id <> codes.vec_id
      |  GROUP BY 1, 2)
      |SELECT vec_id, nbr_id, rnk FROM (
      |  SELECT q_id AS vec_id, nbr_id,
      |    row_number() OVER (PARTITION BY q_id ORDER BY dist ASC, nbr_id) AS rnk
      |  FROM scored)
      |WHERE rnk <= 10""".stripMargin

  val all: Seq[Q] = Seq(
    Q(
      "qs01_cosine_topk",
      "Brute-force exact cosine top-10 (self excluded): the O(n²) " +
        "baseline; viable when one side broadcasts. Rank by " +
        "(cos DESC, nbr_id) — total order, deterministic.",
      (s, dir) =>
        Similarity.bruteForceTopK(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", k = 10),
      Some(s"""WITH e AS (
        |  SELECT vec_id, embedding, ${dkNorm("embedding")} AS nrm
        |  FROM embeddings)
        |SELECT vec_id, nbr_id, rnk FROM (
        |  SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
        |    row_number() OVER (PARTITION BY a.vec_id ORDER BY
        |      ${dkDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) DESC,
        |      b.vec_id) AS rnk
        |  FROM e a JOIN e b ON a.vec_id <> b.vec_id)
        |WHERE rnk <= 10""".stripMargin)),

    Q(
      "qs03_cosine_neardup",
      "Embedding-cosine near-duplicate pairs (dedup flavour): all " +
        "unordered pairs with cosine ≥ 0.45, ids only. The pair source " +
        "swaps for the IVF cell join at corpus scale; scoring/filter " +
        "identical.",
      (s, dir) =>
        Similarity.cosineNearDupPairs(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", threshold = 0.45),
      Some(s"""WITH e AS (
        |  SELECT vec_id, embedding, ${dkNorm("embedding")} AS nrm
        |  FROM embeddings)
        |SELECT a.vec_id AS a_id, b.vec_id AS b_id
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE ${dkDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= 0.45""".stripMargin)),

    Q(
      "qs04_lsh_bucketed_neardup",
      "Sign-LSH bucketed near-dup pairs (the LSH ANN scale path, " +
        "sibling of IVF): bucket = 8 hyperplane sign bits, pairs " +
        "searched within buckets only — equi-join shuffle, no " +
        "cartesian. Plane literals are generated from one source into " +
        "both engines.",
      (s, dir) =>
        Similarity.lshBucketedNearDup(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", threshold = 0.4),
      Some {
        def planeList(p: Array[Float]): String =
          p.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ", ", "]")
        val planes = Similarity.signPlanes(8, 64)
        val bucketExpr = planes.zipWithIndex.map { case (p, j) =>
          s"CASE WHEN ${dkDot("embedding", planeList(p))} > 0.0 THEN ${1 << j} ELSE 0 END"
        }.mkString(" + ")
        s"""WITH e AS (
           |  SELECT vec_id, embedding, ${dkNorm("embedding")} AS nrm,
           |    ($bucketExpr) AS bucket
           |  FROM embeddings)
           |SELECT a.vec_id AS a_id, b.vec_id AS b_id
           |FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
           |WHERE ${dkDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= 0.4""".stripMargin
      }),

    Q(
      "qs05_dedup_embeddings",
      "End-to-end embedding dedup: sign-LSH bucketed near-dup pairs " +
        "(cos ≥ 0.4), greedy keep of the lower id per verified pair. " +
        "Output = kept ids.",
      (s, dir) =>
        Similarity.dedupEmbeddings(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", threshold = 0.4),
      Some {
        def planeList(p: Array[Float]): String =
          p.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ", ", "]")
        val planes = Similarity.signPlanes(8, 64)
        val bucketExpr = planes.zipWithIndex.map { case (p, j) =>
          s"CASE WHEN ${dkDot("embedding", planeList(p))} > 0.0 THEN ${1 << j} ELSE 0 END"
        }.mkString(" + ")
        s"""WITH e AS (
           |  SELECT vec_id, embedding, ${dkNorm("embedding")} AS nrm,
           |    ($bucketExpr) AS bucket
           |  FROM embeddings),
           |dropped AS (
           |  SELECT DISTINCT b.vec_id AS vec_id
           |  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
           |  WHERE ${dkDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= 0.4)
           |SELECT vec_id AS keep_id FROM embeddings
           |WHERE vec_id NOT IN (SELECT vec_id FROM dropped)""".stripMargin
      }),

    Q(
      "qs17_semantic_dedup",
      "SemDeDup (Similarity.semanticDedup, arXiv:2303.09540): cluster " +
        "the embedding space with the stride-40 IVF quantizer, call " +
        "any WITHIN-cluster pair with cos >= 0.45 semantic duplicates, " +
        "greedily keep the lower id. Pairwise work is the bounded " +
        "O(sum cell^2) equi-join on cent_id (maxCell=512 rank cap, " +
        "replayed by the oracle); cross-cluster dups are the paper's " +
        "documented recall tradeoff. The embedding-space complement " +
        "of MinHash near-dedup (qd02).",
      (s, dir) =>
        Similarity.semanticDedup(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", threshold = 0.45,
          centroidStride = 40, maxCell = 512),
      Some(s"""WITH e AS (
        |  SELECT vec_id, embedding, ${dkNorm("embedding")} AS nrm
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cent_id, embedding AS cemb, nrm AS cnrm
        |      FROM e WHERE vec_id % 40 = 0),
        |ranked AS (
        |  SELECT e.vec_id, c.cent_id,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      ${dkDot("e.embedding", "c.cemb")} / (e.nrm * c.cnrm) DESC,
        |      c.cent_id) AS rn
        |  FROM e, c),
        |assign AS (SELECT vec_id, cent_id FROM ranked WHERE rn = 1),
        |b AS (
        |  SELECT e.vec_id, e.embedding, e.nrm, a.cent_id,
        |    row_number() OVER (PARTITION BY a.cent_id ORDER BY e.vec_id) AS cr
        |  FROM e JOIN assign a USING (vec_id)),
        |bc AS (SELECT * FROM b WHERE cr <= 512),
        |dropped AS (
        |  SELECT DISTINCT y.vec_id
        |  FROM bc x JOIN bc y
        |    ON x.cent_id = y.cent_id AND x.vec_id < y.vec_id
        |  WHERE ${dkDot("x.embedding", "y.embedding")} / (x.nrm * y.nrm) >= 0.45)
        |SELECT vec_id AS keep_id FROM embeddings
        |WHERE vec_id NOT IN (SELECT vec_id FROM dropped)""".stripMargin)),

    Q(
      "qs02_ivf_ann",
      "IVF-flat ANN: deterministic centroids (vec_id % 40 = 0), " +
        "nearest-centroid assignment, multi-probe (nProbe=4, the " +
        "library default — recall@5 0.53 vs 0.21 single-probe), exact " +
        "in-cell top-5. The cell join is an equi-join on cent_id — " +
        "shuffle-partitionable at scale, centroids broadcast.",
      (s, dir) =>
        Similarity.ivfTopK(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", k = 5, centroidStride = 40, nProbe = 4),
      Some(ivfOracle)),

    Q(
      "qs07_ivf_from_index",
      "IVF ANN against a STORED index (the production similarity-" +
        "service shape): build centroids + assigned cells once, " +
        "round-trip them through parquet, then answer the same top-5 " +
        "search by probing the reloaded artifacts — nothing " +
        "corpus-sized recomputed at query time. Same oracle as qs02: " +
        "stored norms make the reloaded index score bit-identically.",
      (s, dir) => {
        val em = Tables.load(s, dir, "embeddings")
        // per-process unique dir: a fixed shared path would let two
        // concurrent runs (bench + gate check) overwrite each other's
        // part-files mid-read
        val idxDir = java.nio.file.Files
          .createTempDirectory("graft_ivf_").toString
        Similarity.writeIvfIndex(
          Similarity.buildIvfIndex(em, "vec_id", "embedding", centroidStride = 40),
          idxDir)
        Similarity.ivfTopKWithIndex(Similarity.readIvfIndex(s, idxDir),
          em, "vec_id", "embedding", k = 5, nProbe = 4)
      },
      Some(ivfOracle)),

    Q(
      "qs08_kmeans_ivf",
      "K-means-TRAINED IVF quantizer (two fixed Lloyd rounds from the " +
        "deterministic stride seeds): assignment by cosine rank, " +
        "update by per-cell per-dim decimal-exact mean repacked in " +
        "dim order and cast to float — bit-reproducible training, so " +
        "the final assignment is oracle-checkable. Output = each " +
        "vector's trained cell; the index itself persists via " +
        "IvfIndex like qs07.",
      (s, dir) =>
        Similarity.kmeansIvfIndex(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", centroidStride = 40, iters = 2)
          .cells.select(org.apache.spark.sql.functions.col("vec_id"),
            org.apache.spark.sql.functions.col("cent_id")),
      Some(kmeansOracle)),

    Q(
      "qs09_multitable_lsh",
      "Multi-table sign-LSH near-dup pairs: three INDEPENDENT " +
        "10-plane tables (seeded hyperplanes), candidates = union of " +
        "per-table bucket collisions, exact-cosine verification runs " +
        "once over the distinct union — recall 1-(1-p)^3 at linear " +
        "cost, with small selective buckets. The concrete form of the " +
        "recall dial the single-table operator documents.",
      (s, dir) =>
        Similarity.multiTableLshNearDup(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", threshold = 0.4,
          nPlanes = 10, nTables = 3),
      Some {
        def planeList(p: Array[Float]): String =
          p.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ", ", "]")
        def bucketExpr(t: Int): String =
          Similarity.signPlanesSeeded(t, 10, 64).zipWithIndex.map { case (p, j) =>
            s"CASE WHEN ${dkDot("embedding", planeList(p))} > 0.0 THEN ${1 << j} ELSE 0 END"
          }.mkString(" + ")
        val tables = (0 until 3).map(t =>
          s"""SELECT a.vec_id AS a_id, b.vec_id AS b_id
             |  FROM e a JOIN e b ON a.bucket$t = b.bucket$t AND a.vec_id < b.vec_id"""
            .stripMargin).mkString("\n  UNION\n  ")
        s"""WITH e AS (
           |  SELECT vec_id, embedding, ${dkNorm("embedding")} AS nrm,
           |    (${bucketExpr(0)}) AS bucket0,
           |    (${bucketExpr(1)}) AS bucket1,
           |    (${bucketExpr(2)}) AS bucket2
           |  FROM embeddings),
           |cand AS (
           |  $tables)
           |SELECT c.a_id, c.b_id
           |FROM cand c
           |JOIN e a ON a.vec_id = c.a_id
           |JOIN e b ON b.vec_id = c.b_id
           |WHERE ${dkDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= 0.4""".stripMargin
      }),

    Q(
      "qs10_scalar_quant",
      "Int8 scalar-quantized top-k scan (the memory-bound ANN tier): " +
        "per-dim max-abs calibration (one partial-agg pass), corpus + " +
        "query batch quantized to tinyint codes (4× smaller than the " +
        "floats), exact integer-dot scoring — no rounding after " +
        "quantization, so ranks are engine-exact. One linear corpus " +
        "pass per broadcast query batch; no pair shuffle.",
      (s, dir) => {
        val em = Tables.load(s, dir, "embeddings")
        Similarity.scalarQuantTopK(em,
          em.filter(org.apache.spark.sql.functions.col("vec_id") % 50 === 0),
          "vec_id", "embedding", k = 10)
      },
      Some(s"""WITH $sqCtes,
        |qq AS (SELECT * FROM qv WHERE vec_id % 50 = 0)
        |SELECT vec_id, nbr_id, rnk FROM (
        |  SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
        |    row_number() OVER (PARTITION BY a.vec_id ORDER BY
        |      list_sum(list_transform(list_zip(a.q, b.q), p -> p[1] * p[2])) DESC,
        |      b.vec_id) AS rnk
        |  FROM qq a JOIN qv b ON a.vec_id <> b.vec_id)
        |WHERE rnk <= 10""".stripMargin)),

    Q(
      "qs12_sq_from_index",
      "Scalar-quantized search against a STORED index " +
        "(Similarity.SqIndex — the qs07 pattern for the SQ tier): " +
        "calibration + int8 codes build once, round-trip through " +
        "parquet (the stored codes ARE the 4×-compressed corpus), and " +
        "the query batch quantizes against the RELOADED calibration — " +
        "integer scoring makes the reload rank bit-identically, no " +
        "stored-norm subtlety. Same oracle as qs10.",
      (s, dir) => {
        val em = Tables.load(s, dir, "embeddings")
        val idxDir = java.nio.file.Files
          .createTempDirectory("graft_sq_").toString
        Similarity.writeSqIndex(
          Similarity.buildSqIndex(em, "vec_id", "embedding"), idxDir)
        Similarity.scalarQuantTopKWithIndex(
          Similarity.readSqIndex(s, idxDir),
          em.filter(org.apache.spark.sql.functions.col("vec_id") % 50 === 0),
          "vec_id", "embedding", k = 10)
      },
      Some(s"""WITH $sqCtes,
        |qq AS (SELECT * FROM qv WHERE vec_id % 50 = 0)
        |SELECT vec_id, nbr_id, rnk FROM (
        |  SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
        |    row_number() OVER (PARTITION BY a.vec_id ORDER BY
        |      list_sum(list_transform(list_zip(a.q, b.q), p -> p[1] * p[2])) DESC,
        |      b.vec_id) AS rnk
        |  FROM qq a JOIN qv b ON a.vec_id <> b.vec_id)
        |WHERE rnk <= 10""".stripMargin)),

    Q(
      "qs13_sq_rerank",
      "Quantized-candidates + exact-rerank composition (the " +
        "production ANN serving shape): int8 scan nominates " +
        "top-(k·4) candidates per query over the 4×-compressed " +
        "corpus, exact float cosine re-scores ONLY those rows (two " +
        "id equi-joins, never a corpus-wide float scan), top-k by " +
        "(cos DESC, nbr_id). Buys quantization's recall gap back: " +
        "recall@5 0.794 (qs10) → 1.0 at overfetch=4 (tools/AnnRecall).",
      (s, dir) => {
        val em = Tables.load(s, dir, "embeddings")
        Similarity.scalarQuantRerankTopK(em,
          em.filter(org.apache.spark.sql.functions.col("vec_id") % 50 === 0),
          "vec_id", "embedding", k = 10, overfetch = 4)
      },
      Some(s"""WITH $sqCtes,
        |qq AS (SELECT * FROM qv WHERE vec_id % 50 = 0),
        |cand AS (
        |  SELECT vec_id, nbr_id FROM (
        |    SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
        |      row_number() OVER (PARTITION BY a.vec_id ORDER BY
        |        list_sum(list_transform(list_zip(a.q, b.q), p -> p[1] * p[2])) DESC,
        |        b.vec_id) AS rnk
        |    FROM qq a JOIN qv b ON a.vec_id <> b.vec_id)
        |  WHERE rnk <= 40),
        |e AS (
        |  SELECT vec_id, embedding, ${dkNorm("embedding")} AS nrm
        |  FROM embeddings)
        |SELECT vec_id, nbr_id, rnk FROM (
        |  SELECT c.vec_id AS vec_id, c.nbr_id AS nbr_id,
        |    row_number() OVER (PARTITION BY c.vec_id ORDER BY
        |      ${dkDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) DESC,
        |      c.nbr_id) AS rnk
        |  FROM cand c
        |  JOIN e a ON a.vec_id = c.vec_id
        |  JOIN e b ON b.vec_id = c.nbr_id)
        |WHERE rnk <= 10""".stripMargin)),

    Q(
      "qs11_ivf_sq",
      "IVF-SQ ANN (Similarity.ivfSqTopK — the production IVF+SQ8 " +
        "configuration): float cosine picks the probe cells (qs02's " +
        "recall dial unchanged), in-cell scoring runs over int8 codes " +
        "with the exact integer dot — cells ship 4× less data through " +
        "the probe join and every in-cell comparison is integer, so " +
        "ranks are engine-exact with no float-tie risk.",
      (s, dir) =>
        Similarity.ivfSqTopK(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", k = 5, centroidStride = 40, nProbe = 4),
      Some(s"""WITH e AS (
        |  SELECT vec_id, embedding, ${dkNorm("embedding")} AS nrm
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cent_id, embedding AS cemb, nrm AS cnrm FROM e WHERE vec_id % 40 = 0),
        |ranked AS (
        |  SELECT e.vec_id, c.cent_id,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      ${dkDot("e.embedding", "c.cemb")} / (e.nrm * c.cnrm) DESC,
        |      c.cent_id) AS rn
        |  FROM e, c),
        |assign AS (SELECT vec_id, cent_id FROM ranked WHERE rn = 1),
        |probes AS (SELECT vec_id, cent_id FROM ranked WHERE rn <= 4),
        |$sqCtes,
        |b AS (SELECT qv.vec_id, qv.q, a.cent_id FROM qv JOIN assign a USING (vec_id)),
        |p AS (SELECT qv.vec_id, qv.q, pr.cent_id FROM qv JOIN probes pr USING (vec_id))
        |SELECT vec_id, nbr_id, rnk FROM (
        |  SELECT p.vec_id AS vec_id, q.vec_id AS nbr_id,
        |    row_number() OVER (PARTITION BY p.vec_id ORDER BY
        |      list_sum(list_transform(list_zip(p.q, q.q), s -> s[1] * s[2])) DESC,
        |      q.vec_id) AS rnk
        |  FROM p JOIN b q ON p.cent_id = q.cent_id AND p.vec_id <> q.vec_id)
        |WHERE rnk <= 5""".stripMargin)),

    Q(
      "qs14_pq_adc",
      "Product-quantization ADC top-k (the 100 TB ANN default's " +
        "scoring half): 8 per-subvector codebooks trained with the " +
        "bit-reproducible k-means discipline (stride seeds + 1 " +
        "decimal-exact Lloyd round, ONE composite-keyed job for all " +
        "subquantizers), corpus stored as codes only (32× smaller " +
        "packed), queries score via a broadcast distance table + one " +
        "(m,code) equi-join + decimal-exact sum — corpus floats never " +
        "touched at query time.",
      (s, dir) => {
        val em = Tables.load(s, dir, "embeddings")
        Similarity.pqTopK(em,
          em.filter(org.apache.spark.sql.functions.col("vec_id") % 50 === 0),
          "vec_id", "embedding", k = 10,
          nSub = 8, dim = 64, centroidStride = 40, iters = 1)
      },
      Some(pqOracle)),

    Q(
      "qs29_pq_from_index",
      "PQ-ADC search against a STORED index (Similarity.PqIndex — " +
        "the qs07/qs12 pattern completing the PQ rung): codebooks + " +
        "corpus codes build once, round-trip through parquet (the " +
        "codes ARE the 32×-compressed corpus — 8 small ints per " +
        "vector), and the query batch scores against the RELOADED " +
        "index. Training is offline-amortized: the serve path is one " +
        "code explode + (m, cent_id) equi-join + decimal-exact sum, " +
        "corpus floats never read. Round-trip is bit-identical " +
        "(integer codes, decimal codebooks), so same oracle as qs14.",
      (s, dir) => {
        val em = Tables.load(s, dir, "embeddings")
        val idxDir = java.nio.file.Files
          .createTempDirectory("graft_pq_").toString
        Similarity.writePqIndex(
          Similarity.buildPqIndex(em, "vec_id", "embedding",
            nSub = 8, dim = 64, centroidStride = 40, iters = 1), idxDir)
        Similarity.pqAdcTopKWithIndex(
          Similarity.readPqIndex(s, idxDir),
          em.filter(org.apache.spark.sql.functions.col("vec_id") % 50 === 0),
          "vec_id", "embedding", k = 10, nSub = 8, dim = 64)
      },
      Some(pqOracle)),

    Q(
      "qs15_ivf_pq",
      "IVF-PQ ANN (Similarity.ivfPqTopK — the canonical 100 TB " +
        "configuration assembled from its audited halves): float " +
        "cosine picks the nProbe=4 probe cells (qs02's dial), in-cell " +
        "scoring is PQ's ADC table lookup over codes only — nSub " +
        "bytes per probed vector instead of the float embedding. " +
        "Every join equi; codebooks/centroids/distance tables " +
        "broadcast; decimal-exact sums make ranks engine-exact. " +
        "Codebooks train on raw vectors (residual training documented " +
        "as the next quality step).",
      (s, dir) =>
        Similarity.ivfPqTopK(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", k = 5, centroidStride = 40, nProbe = 4,
          nSub = 8, dim = 64, pqStride = 40, iters = 1),
      Some(s"""WITH e AS (
        |  SELECT vec_id, embedding, ${dkNorm("embedding")} AS nrm
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cent_id, embedding AS cemb, nrm AS cnrm FROM e WHERE vec_id % 40 = 0),
        |ranked AS (
        |  SELECT e.vec_id, c.cent_id,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      ${dkDot("e.embedding", "c.cemb")} / (e.nrm * c.cnrm) DESC,
        |      c.cent_id) AS rn
        |  FROM e, c),
        |assign AS (SELECT vec_id, cent_id AS cell_id FROM ranked WHERE rn = 1),
        |probes AS (SELECT vec_id AS q_id, cent_id AS cell_id FROM ranked WHERE rn <= 4),
        |$pqCtes,
        |qd AS (
        |  SELECT sv.vec_id AS q_id, sv.m, c2.cent_id,
        |    ${dkL2("sv.sv", "c2.cvec")} AS d2
        |  FROM sv JOIN cb c2 ON sv.m = c2.m),
        |scored AS (
        |  SELECT p.q_id, codes.vec_id AS nbr_id,
        |    CAST(sum(CAST(qd.d2 AS DECIMAL(30,6))) AS DOUBLE) AS dist
        |  FROM codes
        |  JOIN assign a ON codes.vec_id = a.vec_id
        |  JOIN probes p ON p.cell_id = a.cell_id AND p.q_id <> codes.vec_id
        |  JOIN qd ON qd.q_id = p.q_id AND qd.m = codes.m AND qd.cent_id = codes.cent_id
        |  GROUP BY 1, 2)
        |SELECT vec_id, nbr_id, rnk FROM (
        |  SELECT q_id AS vec_id, nbr_id,
        |    row_number() OVER (PARTITION BY q_id ORDER BY dist ASC, nbr_id) AS rnk
        |  FROM scored)
        |WHERE rnk <= 5""".stripMargin)),

    Q(
      "qs20_ivfpq_rerank",
      "IVF-PQ + EXACT rerank (Similarity.ivfPqRerankTopK) - the full " +
        "production serving composition: the memory-resident IVF-PQ " +
        "tier over-fetches 4k candidates by ADC distance (codes " +
        "only), then ONLY those touch full float embeddings for an " +
        "exact fixed-fold L2 rerank - quantization error decides " +
        "candidate membership, never final ranks; rerank cost is " +
        "queries x 4k, corpus-size-independent. qs13's argument at " +
        "the IVF-PQ rung.",
      (s, dir) =>
        Similarity.ivfPqRerankTopK(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", k = 5, overfetch = 4,
          centroidStride = 40, nProbe = 4, nSub = 8, dim = 64,
          pqStride = 40, iters = 1),
      Some(s"""WITH e AS (
        |  SELECT vec_id, embedding, ${dkNorm("embedding")} AS nrm
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cent_id, embedding AS cemb, nrm AS cnrm FROM e WHERE vec_id % 40 = 0),
        |ranked AS (
        |  SELECT e.vec_id, c.cent_id,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      ${dkDot("e.embedding", "c.cemb")} / (e.nrm * c.cnrm) DESC,
        |      c.cent_id) AS rn
        |  FROM e, c),
        |assign AS (SELECT vec_id, cent_id AS cell_id FROM ranked WHERE rn = 1),
        |probes AS (SELECT vec_id AS q_id, cent_id AS cell_id FROM ranked WHERE rn <= 4),
        |$pqCtes,
        |qd AS (
        |  SELECT sv.vec_id AS q_id, sv.m, c2.cent_id,
        |    ${dkL2("sv.sv", "c2.cvec")} AS d2
        |  FROM sv JOIN cb c2 ON sv.m = c2.m),
        |scored AS (
        |  SELECT p.q_id, codes.vec_id AS nbr_id,
        |    CAST(sum(CAST(qd.d2 AS DECIMAL(30,6))) AS DOUBLE) AS dist
        |  FROM codes
        |  JOIN assign a ON codes.vec_id = a.vec_id
        |  JOIN probes p ON p.cell_id = a.cell_id AND p.q_id <> codes.vec_id
        |  JOIN qd ON qd.q_id = p.q_id AND qd.m = codes.m AND qd.cent_id = codes.cent_id
        |  GROUP BY 1, 2),
        |cand AS (
        |  SELECT q_id, nbr_id FROM (
        |    SELECT q_id, nbr_id,
        |      row_number() OVER (PARTITION BY q_id ORDER BY dist ASC, nbr_id) AS rnk
        |    FROM scored)
        |  WHERE rnk <= 20),
        |rr AS (
        |  SELECT c.q_id AS vec_id, c.nbr_id,
        |    ${dkL2("qa.embedding", "qb.embedding")} AS d2
        |  FROM cand c
        |  JOIN e qa ON qa.vec_id = c.q_id
        |  JOIN e qb ON qb.vec_id = c.nbr_id)
        |SELECT vec_id, nbr_id, rnk FROM (
        |  SELECT vec_id, nbr_id,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, nbr_id) AS rnk
        |  FROM rr)
        |WHERE rnk <= 5""".stripMargin)),

    Q(
      "qs21_mmr_rerank",
      "Maximal-Marginal-Relevance diversified top-3 " +
        "(Similarity.mmrTopK, lambda=0.5 over 20 exact-cosine " +
        "candidates): greedy selection maximizing relevance minus " +
        "max-similarity-to-already-selected - the serving rerank that " +
        "stops a near-dup cluster from monopolizing a result list " +
        "(RAG context dedup). Ties break on ascending id each step; " +
        "lambda=0.5 is an exact IEEE halving, so selection is " +
        "engine-invariant. Pairwise sims are candidate-bounded " +
        "(candK^2 per query), computed once, persisted across the " +
        "k unrolled greedy steps; the oracle unrolls the identical " +
        "3 steps as CTEs (the Lloyd-round discipline).",
      (s, dir) => {
        val em = Tables.load(s, dir, "embeddings")
        Similarity.mmrTopK(em,
          em.filter(org.apache.spark.sql.functions.pmod(
            org.apache.spark.sql.functions.col("vec_id"),
            org.apache.spark.sql.functions.lit(97)) === 0),
          "vec_id", "embedding", candK = 20, k = 3, lambda = 0.5)
      },
      Some(s"""WITH e AS (
        |  SELECT vec_id, embedding, ${dkNorm("embedding")} AS nrm
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, embedding AS qv, nrm AS qn
        |      FROM e WHERE vec_id % 97 = 0),
        |rel0 AS (
        |  SELECT q.q_id, e.vec_id AS d_id,
        |    ${dkDot("q.qv", "e.embedding")} / (q.qn * e.nrm) AS rel
        |  FROM q JOIN e ON e.vec_id <> q.q_id),
        |cand AS MATERIALIZED (
        |  SELECT q_id, d_id, rel FROM (
        |    SELECT q_id, d_id, rel,
        |      row_number() OVER (PARTITION BY q_id ORDER BY rel DESC, d_id) AS rnk
        |    FROM rel0)
        |  WHERE rnk <= 20),
        |ps AS MATERIALIZED (
        |  SELECT a.q_id, a.d_id AS a_id, b.d_id AS b_id,
        |    ${dkDot("ea.embedding", "eb.embedding")} / (ea.nrm * eb.nrm) AS sim
        |  FROM cand a JOIN cand b ON a.q_id = b.q_id AND a.d_id <> b.d_id
        |  JOIN e ea ON ea.vec_id = a.d_id
        |  JOIN e eb ON eb.vec_id = b.d_id),
        |s1 AS MATERIALIZED (
        |  SELECT q_id, d_id FROM cand
        |  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY rel DESC, d_id) = 1),
        |p2 AS (SELECT ps.q_id, ps.a_id, max(ps.sim) AS pen
        |       FROM ps JOIN s1 ON ps.q_id = s1.q_id AND ps.b_id = s1.d_id
        |       GROUP BY 1, 2),
        |m2 AS (
        |  SELECT c.q_id, c.d_id, 0.5 * c.rel - 0.5 * p.pen AS mmr
        |  FROM cand c JOIN p2 p ON c.q_id = p.q_id AND c.d_id = p.a_id
        |  WHERE NOT EXISTS (SELECT 1 FROM s1
        |    WHERE s1.q_id = c.q_id AND s1.d_id = c.d_id)),
        |s2 AS MATERIALIZED (
        |  SELECT q_id, d_id FROM m2
        |  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY mmr DESC, d_id) = 1),
        |sel2 AS (SELECT * FROM s1 UNION ALL SELECT * FROM s2),
        |p3 AS (SELECT ps.q_id, ps.a_id, max(ps.sim) AS pen
        |       FROM ps JOIN sel2 s ON ps.q_id = s.q_id AND ps.b_id = s.d_id
        |       GROUP BY 1, 2),
        |m3 AS (
        |  SELECT c.q_id, c.d_id, 0.5 * c.rel - 0.5 * p.pen AS mmr
        |  FROM cand c JOIN p3 p ON c.q_id = p.q_id AND c.d_id = p.a_id
        |  WHERE NOT EXISTS (SELECT 1 FROM sel2 s
        |    WHERE s.q_id = c.q_id AND s.d_id = c.d_id)),
        |s3 AS (
        |  SELECT q_id, d_id FROM m3
        |  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY mmr DESC, d_id) = 1)
        |SELECT q_id, d_id, CAST(1 AS BIGINT) AS step FROM s1
        |UNION ALL SELECT q_id, d_id, CAST(2 AS BIGINT) FROM s2
        |UNION ALL SELECT q_id, d_id, CAST(3 AS BIGINT) FROM s3""".stripMargin)),

    Q(
      "qs22_recall_report",
      "ANN recall as an ORACLE-CHECKED query (Similarity.recallReport " +
        "over qs02's IVF nProbe=4 vs qs01's exact top-5): the quality " +
        "number SCALING.md cites, computed in-engine - micro-averaged " +
        "recall@5 as one division of exact integers (total hits / " +
        "5*queries), bit-reproducible. The same operator serves any " +
        "two rankings: exact-vs-PQ, yesterday-vs-today (serving " +
        "regression). One (vec_id, nbr_id) equi-join + two single-row " +
        "aggregates.",
      (s, dir) => {
        val em = Tables.load(s, dir, "embeddings")
        Similarity.recallReport(
          Similarity.bruteForceTopK(em, "vec_id", "embedding", k = 5),
          Similarity.ivfTopK(em, "vec_id", "embedding", k = 5,
            centroidStride = 40, nProbe = 4),
          k = 5)
      },
      Some(s"""WITH e AS (
        |  SELECT vec_id, embedding, ${dkNorm("embedding")} AS nrm
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cent_id, embedding AS cemb, nrm AS cnrm
        |      FROM e WHERE vec_id % 40 = 0),
        |ranked AS (
        |  SELECT e.vec_id, c.cent_id,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      ${dkDot("e.embedding", "c.cemb")} / (e.nrm * c.cnrm) DESC,
        |      c.cent_id) AS rn
        |  FROM e, c),
        |assign AS (SELECT vec_id, cent_id FROM ranked WHERE rn = 1),
        |probes AS (SELECT vec_id, cent_id FROM ranked WHERE rn <= 4),
        |b AS (SELECT e.vec_id, e.embedding, e.nrm, a.cent_id
        |      FROM e JOIN assign a USING (vec_id)),
        |p AS (SELECT e.vec_id, e.embedding, e.nrm, pr.cent_id
        |      FROM e JOIN probes pr USING (vec_id)),
        |ivf AS (
        |  SELECT vec_id, nbr_id FROM (
        |    SELECT p.vec_id AS vec_id, q.vec_id AS nbr_id,
        |      row_number() OVER (PARTITION BY p.vec_id ORDER BY
        |        ${dkDot("p.embedding", "q.embedding")} / (p.nrm * q.nrm) DESC,
        |        q.vec_id) AS rnk
        |    FROM p JOIN b q ON p.cent_id = q.cent_id AND p.vec_id <> q.vec_id)
        |  WHERE rnk <= 5),
        |exact AS (
        |  SELECT vec_id, nbr_id FROM (
        |    SELECT a.vec_id AS vec_id, b2.vec_id AS nbr_id,
        |      row_number() OVER (PARTITION BY a.vec_id ORDER BY
        |        ${dkDot("a.embedding", "b2.embedding")} / (a.nrm * b2.nrm) DESC,
        |        b2.vec_id) AS rnk
        |    FROM e a JOIN e b2 ON a.vec_id <> b2.vec_id)
        |  WHERE rnk <= 5),
        |hits AS (SELECT CAST(count(*) AS BIGINT) AS n_hits
        |         FROM ivf JOIN exact USING (vec_id, nbr_id)),
        |nq AS (SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n_queries
        |       FROM exact)
        |SELECT n_queries, n_hits,
        |  CAST(n_hits AS DOUBLE) / (5.0 * CAST(n_queries AS DOUBLE))
        |    AS recall_at_5
        |FROM nq, hits""".stripMargin)),

    Q(
      "qs16_ivf_pq_residual",
      "RESIDUAL IVF-PQ (Similarity.ivfPqResidualTopK — the textbook " +
        "formulation): PQ quantizes each vector's residual against " +
        "its cell centroid, spending codebook resolution where the " +
        "data lives; probing cell c scores with the QUERY's residual " +
        "vs c, so the distance table gains a cell key and each corpus " +
        "vector scores only in its own cell. Residual subtraction is " +
        "double-exact with one float rounding — deterministic in both " +
        "engines — keeping codes and ranks engine-exact.",
      (s, dir) =>
        Similarity.ivfPqResidualTopK(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", k = 5, centroidStride = 40, nProbe = 4,
          nSub = 8, dim = 64, pqStride = 40, iters = 1),
      Some(s"""WITH e AS (
        |  SELECT vec_id, embedding, ${dkNorm("embedding")} AS nrm
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cent_id, embedding AS cemb, nrm AS cnrm FROM e WHERE vec_id % 40 = 0),
        |ranked AS (
        |  SELECT e.vec_id, c.cent_id,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      ${dkDot("e.embedding", "c.cemb")} / (e.nrm * c.cnrm) DESC,
        |      c.cent_id) AS rn
        |  FROM e, c),
        |assign AS (SELECT vec_id, cent_id AS cell_id FROM ranked WHERE rn = 1),
        |probes AS (SELECT vec_id AS q_id, cent_id AS cell_id FROM ranked WHERE rn <= 4),
        |resv AS (
        |  SELECT e.vec_id,
        |    list_transform(list_zip(e.embedding, c.cemb),
        |      s -> CAST(CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE) AS FLOAT)) AS rv
        |  FROM e JOIN assign a ON e.vec_id = a.vec_id
        |  JOIN c ON c.cent_id = a.cell_id),
        |${pqCtesFrom("resv", "rv")},
        |qres AS (
        |  SELECT p.q_id, p.cell_id,
        |    list_transform(list_zip(e.embedding, c.cemb),
        |      s -> CAST(CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE) AS FLOAT)) AS rv
        |  FROM probes p JOIN e ON e.vec_id = p.q_id
        |  JOIN c ON c.cent_id = p.cell_id),
        |qsv AS (
        |  SELECT q_id, cell_id, t.m AS m,
        |    q.rv[t.m*8+1 : t.m*8+8] AS sv
        |  FROM qres q, unnest(range(0, 8)) t(m)),
        |qd AS (
        |  SELECT q.q_id, q.cell_id, q.m, c2.cent_id,
        |    ${dkL2("q.sv", "c2.cvec")} AS d2
        |  FROM qsv q JOIN cb c2 ON q.m = c2.m),
        |scored AS (
        |  SELECT qd.q_id, codes.vec_id AS nbr_id,
        |    CAST(sum(CAST(qd.d2 AS DECIMAL(30,6))) AS DOUBLE) AS dist
        |  FROM codes
        |  JOIN assign a ON codes.vec_id = a.vec_id
        |  JOIN qd ON qd.cell_id = a.cell_id AND qd.m = codes.m
        |    AND qd.cent_id = codes.cent_id
        |  WHERE qd.q_id <> codes.vec_id
        |  GROUP BY 1, 2)
        |SELECT vec_id, nbr_id, rnk FROM (
        |  SELECT q_id AS vec_id, nbr_id,
        |    row_number() OVER (PARTITION BY q_id ORDER BY dist ASC, nbr_id) AS rnk
        |  FROM scored)
        |WHERE rnk <= 5""".stripMargin)),

    Q(
      "qs06_label_centroids",
      "Per-label centroid table (element-wise embedding mean): " +
        "posexplode to (label, dim, x) and hash-aggregate on the " +
        "composite key — map-side partials, uniform shuffle key space " +
        "(labels × dims), exact decimal sums + one IEEE division so " +
        "the centroid doubles are bit-reproducible. The building block " +
        "for IVF training and class prototypes.",
      (s, dir) =>
        Similarity.labelCentroids(Tables.load(s, dir, "embeddings"),
          "label", "embedding"),
      Some("""SELECT label, CAST(t.i - 1 AS BIGINT) AS dim,
        |  CAST(sum(CAST(CAST(embedding[t.i] AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE) /
        |    CAST(count(*) AS DOUBLE) AS centroid,
        |  CAST(count(*) AS BIGINT) AS n_vectors
        |FROM embeddings e, unnest(range(1, len(e.embedding) + 1)) t(i)
        |GROUP BY label, t.i""".stripMargin)),

    Q(
      "qs19_filtered_ann",
      "FILTERED ANN (Similarity.filteredIvfTopK): top-5 neighbors " +
        "sharing the query's label - the metadata-predicate + vector " +
        "search composition. The attribute equality rides the " +
        "probe-cell equi-join as a SECOND join key (shuffle by " +
        "(cent_id, label)): buckets thin by selectivity instead of " +
        "being scored then discarded (post-filter waste) and recall " +
        "stays on the nProbe dial (pre-filter trap avoided). Query " +
        "batch = the 1% vec_id % 101 = 0 convention.",
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        val em = Tables.load(s, dir, "embeddings")
        Similarity.filteredIvfTopK(em, "vec_id", "embedding", "label",
          em.filter(col("vec_id") % 101 === 0),
          k = 5, centroidStride = 40, nProbe = 4)
      },
      Some(s"""WITH e AS (
        |  SELECT vec_id, embedding, label, ${dkNorm("embedding")} AS nrm
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cent_id, embedding AS cemb, nrm AS cnrm FROM e WHERE vec_id % 40 = 0),
        |ranked AS (
        |  SELECT e.vec_id, c.cent_id,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      ${dkDot("e.embedding", "c.cemb")} / (e.nrm * c.cnrm) DESC,
        |      c.cent_id) AS rn
        |  FROM e, c WHERE e.vec_id % 101 = 0),
        |assignq AS (
        |  SELECT e.vec_id, c.cent_id,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      ${dkDot("e.embedding", "c.cemb")} / (e.nrm * c.cnrm) DESC,
        |      c.cent_id) AS rn
        |  FROM e, c),
        |assign AS (SELECT vec_id, cent_id FROM assignq WHERE rn = 1),
        |probes AS (SELECT vec_id, cent_id FROM ranked WHERE rn <= 4),
        |b AS (SELECT e.vec_id, e.embedding, e.nrm, e.label, a.cent_id
        |      FROM e JOIN assign a USING (vec_id)),
        |p AS (SELECT e.vec_id, e.embedding, e.nrm, e.label, pr.cent_id
        |      FROM e JOIN probes pr USING (vec_id))
        |SELECT vec_id, nbr_id, rnk FROM (
        |  SELECT p.vec_id AS vec_id, q.vec_id AS nbr_id,
        |    row_number() OVER (PARTITION BY p.vec_id ORDER BY
        |      ${dkDot("p.embedding", "q.embedding")} / (p.nrm * q.nrm) DESC,
        |      q.vec_id) AS rnk
        |  FROM p JOIN b q ON p.cent_id = q.cent_id
        |    AND p.label IS NOT DISTINCT FROM q.label
        |    AND p.vec_id <> q.vec_id)
        |WHERE rnk <= 5""".stripMargin)),

    Q(
      "qs18_random_projection",
      "Random-projection (Johnson-Lindenstrauss) ANN tier: 64-dim " +
        "float vectors project onto 16 deterministic ±1 hyperplanes " +
        "(signPlanes literals shared with the oracle), ranking runs " +
        "in the PROJECTED space — 4× fewer bytes per vector in the " +
        "broadcast and per-pair scoring, with JL-bounded angle " +
        "distortion. Projections are codegen float-dots with double " +
        "accumulators and ascending folds, so projected ranks are " +
        "bit-reproducible and the oracle replays them exactly. " +
        "Composable with the qs13 exact rerank as a cheap first pass.",
      (s, dir) => {
        val em = Tables.load(s, dir, "embeddings")
        Similarity.randomProjectTopK(em,
          em.filter(org.apache.spark.sql.functions.col("vec_id") % 50 === 0),
          "vec_id", "embedding", kProj = 16, k = 10)
      },
      Some {
        def planeList(p: Array[Float]): String =
          p.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ", ", "]")
        val planes = Similarity.signPlanes(16, 64)
        val projExpr = planes.map(p => dkDot("embedding", planeList(p)))
          .mkString("[", ",\n        ", "]")
        s"""WITH e AS (
           |  SELECT vec_id, $projExpr AS pv FROM embeddings),
           |e2 AS (
           |  SELECT vec_id, pv,
           |    sqrt(list_reduce(list_transform(pv, x -> x * x), (x, y) -> x + y)) AS pn
           |  FROM e),
           |qq AS (SELECT * FROM e2 WHERE vec_id % 50 = 0)
           |SELECT vec_id, nbr_id, rnk FROM (
           |  SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
           |    row_number() OVER (PARTITION BY a.vec_id ORDER BY
           |      list_reduce(list_transform(list_zip(a.pv, b.pv), s -> s[1] * s[2]),
           |        (x, y) -> x + y) / (a.pn * b.pn) DESC,
           |      b.vec_id) AS rnk
           |  FROM qq a JOIN e2 b ON a.vec_id <> b.vec_id)
           |WHERE rnk <= 10""".stripMargin
      }),

    Q(
      "qs23_hard_negatives",
      "HARD-NEGATIVE MINING (Similarity.hardNegatives, the " +
        "contrastive-training data factory): top-5 most similar " +
        "corpus vectors with a DIFFERENT label per query. The mirror " +
        "of qs19's filter decision: an inequality passes ~(L-1)/L of " +
        "pairs, so it post-filters INSIDE the cent_id equi-join (zero " +
        "extra shuffle) instead of riding it as a join key. Null " +
        "labels match nothing on either side. Query batch = " +
        "vec_id % 101 = 0; same IVF probing as qs02, recall on the " +
        "nProbe dial.",
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        val em = Tables.load(s, dir, "embeddings")
        Similarity.hardNegatives(em, "vec_id", "embedding", "label",
          em.filter(col("vec_id") % 101 === 0),
          k = 5, centroidStride = 40, nProbe = 4)
      },
      Some(s"""WITH e AS (
        |  SELECT vec_id, embedding, label, ${dkNorm("embedding")} AS nrm
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cent_id, embedding AS cemb, nrm AS cnrm FROM e WHERE vec_id % 40 = 0),
        |ranked AS (
        |  SELECT e.vec_id, c.cent_id,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      ${dkDot("e.embedding", "c.cemb")} / (e.nrm * c.cnrm) DESC,
        |      c.cent_id) AS rn
        |  FROM e, c WHERE e.vec_id % 101 = 0),
        |assignq AS (
        |  SELECT e.vec_id, c.cent_id,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      ${dkDot("e.embedding", "c.cemb")} / (e.nrm * c.cnrm) DESC,
        |      c.cent_id) AS rn
        |  FROM e, c),
        |assign AS (SELECT vec_id, cent_id FROM assignq WHERE rn = 1),
        |probes AS (SELECT vec_id, cent_id FROM ranked WHERE rn <= 4),
        |b AS (SELECT e.vec_id, e.embedding, e.nrm, e.label, a.cent_id
        |      FROM e JOIN assign a USING (vec_id)),
        |p AS (SELECT e.vec_id, e.embedding, e.nrm, e.label, pr.cent_id
        |      FROM e JOIN probes pr USING (vec_id))
        |SELECT vec_id, nbr_id, rnk FROM (
        |  SELECT p.vec_id AS vec_id, q.vec_id AS nbr_id,
        |    row_number() OVER (PARTITION BY p.vec_id ORDER BY
        |      ${dkDot("p.embedding", "q.embedding")} / (p.nrm * q.nrm) DESC,
        |      q.vec_id) AS rnk
        |  FROM p JOIN b q ON p.cent_id = q.cent_id
        |    AND p.label IS NOT NULL AND q.label IS NOT NULL
        |    AND p.label <> q.label)
        |WHERE rnk <= 5""".stripMargin)),

    Q(
      "qs24_hashed_ivf",
      "The embed-once-index-with-the-ladder claim made EXECUTABLE: " +
        "qt31's in-engine hashed document embeddings fed through the " +
        "standard IVF build + stored-index search " +
        "(Similarity.buildIvfIndex/ivfTopKWithIndex, stride 20, " +
        "nProbe 4, k 5) with zero adaptation - the text->vector " +
        "bridge and the ANN ladder compose because both speak " +
        "(id, float-vec). Zero-norm vectors filtered before the " +
        "build on both sides.",
      (s, dir) => {
        import org.apache.spark.sql.functions.{col, call_function}
        val docs = Tables.load(s, dir, "documents")
        graft.functions.GraftFunctions.register(s)
        val em = graft.core.OpCache.persist(
          graft.operators.TextAnalysis
            .hashedDocVectors(docs, "doc_id", "text")
            .select(col("doc_id").as("vec_id"), col("vec").as("embedding"))
            .filter(call_function("graft_vec_dot",
              col("embedding"), col("embedding")) > 0))
        val idx = Similarity.buildIvfIndex(em, "vec_id", "embedding",
          centroidStride = 20)
        Similarity.ivfTopKWithIndex(idx,
          em.filter(col("vec_id") % 20 === 0),
          "vec_id", "embedding", k = 5, nProbe = 4)
      },
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
        |    CAST((((CAST(concat('0x', substr(md5(token), 1, 15)) AS BIGINT)) // 2) % 16) AS INT) AS dim,
        |    CAST(CAST(((CAST(concat('0x', substr(md5(token), 1, 15)) AS BIGINT)) % 2) * 2 - 1 AS DOUBLE)
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
        |e AS (
        |  SELECT doc_id AS vec_id, vec AS embedding,
        |    sqrt(${dot("vec", "vec")}) AS nrm
        |  FROM vec WHERE ${dot("vec", "vec")} > 0),
        |c AS (SELECT vec_id AS cent_id, embedding AS cemb, nrm AS cnrm
        |      FROM e WHERE vec_id % 20 = 0),
        |ranked AS (
        |  SELECT e.vec_id, c.cent_id,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      ${dot("e.embedding", "c.cemb")} / (e.nrm * c.cnrm) DESC,
        |      c.cent_id) AS rn
        |  FROM e, c WHERE e.vec_id % 20 = 0),
        |assignq AS (
        |  SELECT e.vec_id, c.cent_id,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      ${dot("e.embedding", "c.cemb")} / (e.nrm * c.cnrm) DESC,
        |      c.cent_id) AS rn
        |  FROM e, c),
        |assign AS (SELECT vec_id, cent_id FROM assignq WHERE rn = 1),
        |probes AS (SELECT vec_id, cent_id FROM ranked WHERE rn <= 4),
        |bb AS (SELECT e.vec_id, e.embedding, e.nrm, a.cent_id
        |       FROM e JOIN assign a USING (vec_id)),
        |p AS (SELECT e.vec_id, e.embedding, e.nrm, pr.cent_id
        |      FROM e JOIN probes pr USING (vec_id))
        |SELECT vec_id, nbr_id, rnk FROM (
        |  SELECT p.vec_id AS vec_id, q.vec_id AS nbr_id,
        |    row_number() OVER (PARTITION BY p.vec_id ORDER BY
        |      ${dot("p.embedding", "q.embedding")} / (p.nrm * q.nrm) DESC,
        |      q.vec_id) AS rnk
        |  FROM p JOIN bb q ON p.cent_id = q.cent_id AND p.vec_id <> q.vec_id)
        |WHERE rnk <= 5""".stripMargin
      }),

    Q(
      "qs25_nn_descent",
      "NN-Descent k-NN graph construction (Similarity.nnDescentGraph, " +
        "Dong et al. WWW'11): every vector's top-5 neighbors WITHOUT " +
        "the O(n^2) all-pairs scan - each round scores only current + " +
        "neighbor-of-neighbor + reverse-neighbor candidates (O(n*k^2) " +
        "per round, pure equi-joins + the mergeable top-k heap) and " +
        "keeps the best k. Deterministic: dense-id RING seed " +
        "(u -> (u+j) mod n, recall ~ k/n by construction), candidates " +
        "set-deduped, ranks (cos DESC, id). 2 rounds unrolled in the " +
        "oracle, the Lloyd-round replay discipline.",
      (s, dir) =>
        Similarity.nnDescentGraph(
          Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
          k = 5, rounds = 2),
      Some(s"""WITH $nnDescentCtes
        |SELECT u AS vec_id, v AS nbr_id, rn AS rnk FROM (
        |  SELECT g.u, g.v,
        |    row_number() OVER (PARTITION BY g.u ORDER BY
        |      ${dkDot("eu.embedding", "ev.embedding")} / (eu.nrm * ev.nrm)
        |        DESC, g.v) AS rn
        |  FROM g2 g JOIN e eu ON eu.vec_id = g.u
        |    JOIN e ev ON ev.vec_id = g.v)
        |WHERE rn <= 5""".stripMargin)),

    Q(
      "qs26_knn_graph_clusters",
      "Semantic clustering over the NN-Descent k-NN graph " +
        "(Similarity.knnGraphClusters) - SemDeDup WITHOUT the IVF " +
        "cell boundary: qs17 restricts duplicate pairs to vectors " +
        "sharing a coarse cell (cross-cluster dups out of scope by " +
        "design); here candidates are the k-NN graph's edges, which " +
        "follow the data's density with no cell to straddle. Graph " +
        "edges re-score, keep cosine >= 0.4, symmetrize (min, max), " +
        "union self-edges, close with connected components - the " +
        "(vec_id, component=min-id) contract every dedup clustering " +
        "emits. Everything after the O(n*k^2) graph build is " +
        "edge-linear.",
      (s, dir) =>
        Similarity.knnGraphClusters(
          Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
          threshold = 0.4, k = 5, rounds = 2),
      Some(s"""WITH RECURSIVE $nnDescentCtes,
        |strong AS (
        |  SELECT least(g.u, g.v) AS a, greatest(g.u, g.v) AS b
        |  FROM g2 g JOIN e eu ON eu.vec_id = g.u
        |    JOIN e ev ON ev.vec_id = g.v
        |  WHERE ${dkDot("eu.embedding", "ev.embedding")} /
        |    (eu.nrm * ev.nrm) >= 0.4
        |  GROUP BY 1, 2),
        |sym(s, t) AS (
        |  SELECT a, b FROM strong UNION SELECT b, a FROM strong
        |  UNION SELECT vec_id, vec_id FROM e),
        |r(s, t) AS (
        |  SELECT s, t FROM sym
        |  UNION
        |  SELECT r.s, sym.t FROM r JOIN sym ON r.t = sym.s)
        |SELECT s AS vec_id, min(t) AS component FROM r GROUP BY s"""
        .stripMargin)),

    Q(
      "qs28_ivf_insert",
      "Incremental IVF index ingest (Similarity.ivfInsert): the index " +
        "builds on 90% of the corpus, the held-out batch (vec_id % " +
        "10 = 7) is INSERTED against the frozen stored centroids - " +
        "one broadcast-assign pass, O(batch*C), never a rebuild - " +
        "and the updated index serves qs07's top-5 probe. The stride " +
        "picks identical centroid ids either way (40 | id implies " +
        "id % 10 != 7), so insert-then-serve must be BIT-IDENTICAL " +
        "to building on the full corpus - the oracle is literally " +
        "qs02's: index maintenance that provably converges to the " +
        "rebuilt index. Per-batch cost batch-proportional; re-train " +
        "only when drift accumulates.",
      (s, dir) => {
        val em = Tables.load(s, dir, "embeddings")
        val idx0 = Similarity.buildIvfIndex(
          em.filter(col("vec_id") % 10 =!= 7), "vec_id", "embedding", 40)
        val idx = Similarity.ivfInsert(
          idx0, em.filter(col("vec_id") % 10 === 7), "vec_id", "embedding")
        Similarity.ivfTopKWithIndex(idx, em, "vec_id", "embedding",
          k = 5, nProbe = 4)
      },
      Some(ivfOracle)),

    Q(
      "qs27_graph_search",
      "Graph-navigating ANN serve (Similarity.graphSearchTopK) - the " +
        "HNSW-family greedy walk over the qs25 NN-Descent graph, " +
        "re-expressed as 3 bulk-synchronous hops so EVERY query " +
        "advances together through two equi-joins per hop (frontier " +
        "x out-edges, then score vs query) instead of one query " +
        "pointer-chasing remote edges. The serve graph = k-NN edges " +
        "UNION a ring backbone (k-NN graphs disconnect across " +
        "clusters; a walk cannot cross an edgeless gap - HNSW's " +
        "level-0 role), entry = 8 hash-spread fixed ids (md5(j) mod " +
        "n; arithmetic spacing can alias a periodic id layout), beam " +
        "8; answer = top-5 of everything visited, (cos DESC, id). " +
        "Hop cost bounded by |Q|*beam*(graphK+2) - independent of " +
        "corpus size; the graph is an id-pair table, parquet-" +
        "persistable like every stored index here. Oracle unrolls " +
        "the identical 3 hops over the shared NN-Descent CTE chain.",
      (s, dir) =>
        Similarity.graphSearchTopK(
          Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
          k = 5, beam = 8, hops = 3, graphK = 5, graphRounds = 2,
          nSeeds = 8),
      Some {
        def hop(h: Int): String = {
          val p = if (h == 1) "bf0" else s"bf${h - 1}"
          s"""bx$h AS (
            |  SELECT qid, node FROM $p
            |  UNION
            |  SELECT f.qid, g.v AS node FROM $p f JOIN ga g ON g.u = f.node),
            |bs$h AS MATERIALIZED (
            |  SELECT x.qid, x.node,
            |    ${dkDot("eq.embedding", "en.embedding")} / (eq.nrm * en.nrm) AS cos
            |  FROM bx$h x JOIN e eq ON eq.vec_id = x.qid
            |    JOIN e en ON en.vec_id = x.node),
            |bf$h AS MATERIALIZED (
            |  SELECT qid, node FROM (
            |    SELECT qid, node, row_number() OVER (PARTITION BY qid
            |      ORDER BY cos DESC, node) AS rn FROM bs$h)
            |  WHERE rn <= 8)""".stripMargin
        }
        s"""WITH $nnDescentCtes,
          |ga AS (SELECT u, v FROM g2
          |       UNION SELECT e.vec_id, (e.vec_id + 1) % nc.n FROM e, nc),
          |seeds AS (SELECT DISTINCT
          |            ${TextQueries.dkHash60("CAST(t.j AS VARCHAR)")} % nc.n AS node
          |          FROM nc, unnest(range(0, 8)) t(j)),
          |bf0 AS (SELECT e.vec_id AS qid, s.node FROM e, seeds s),
          |${hop(1)},
          |${hop(2)},
          |${hop(3)},
          |vis AS (
          |  SELECT qid, node, max(cos) AS cos FROM (
          |    SELECT * FROM bs1 UNION ALL SELECT * FROM bs2
          |    UNION ALL SELECT * FROM bs3)
          |  GROUP BY qid, node)
          |SELECT qid AS vec_id, node AS nbr_id, rn AS rnk FROM (
          |  SELECT qid, node, row_number() OVER (PARTITION BY qid
          |    ORDER BY cos DESC, node) AS rn
          |  FROM vis WHERE qid <> node)
          |WHERE rn <= 5""".stripMargin
      }),

    Q(
      "qs30_ivf_routed_graph",
      "IVF-ROUTED graph search (Similarity.ivfRoutedGraphTopK — the " +
        "hierarchical-entry step separating HNSW-class serving from " +
        "qs27's flat walk): each query (vec_id % 25 = 0) enters the " +
        "k-NN graph AT its region — the min-id member of each of its " +
        "4 nearest IVF cells (the coarse quantizer IS the upper " +
        "layer, playing HNSW's top-level role) — then the same " +
        "3-hop beam-8 walk refines locally. Entry routing = qs02's " +
        "broadcast centroid scoring + a dim-sized representative " +
        "aggregate; hop cost stays |Q|·beam·(graphK+2), corpus-" +
        "independent. Routing's value needs STRUCTURE: on the " +
        "planted-cluster fixture routed entry reaches recall 1.0 at " +
        "hops=2 vs 0.963 for hash seeds (NnDescentSpec); on this " +
        "clusterless synthetic corpus cells don't predict neighbors " +
        "and spread seeds explore better — the fixture exercises " +
        "plan shape and parity, not recall. Oracle = qs27's " +
        "unrolled hops with the routed entry frontier.",
      (s, dir) =>
        Similarity.ivfRoutedGraphTopK(
          Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
          queriesFilter = col("vec_id") % 25 === 0,
          k = 5, beam = 8, hops = 3, graphK = 5, graphRounds = 2,
          centroidStride = 40, nProbe = 4),
      Some {
        def hop(h: Int): String = {
          val p = if (h == 1) "bf0" else s"bf${h - 1}"
          s"""bx$h AS (
            |  SELECT qid, node FROM $p
            |  UNION
            |  SELECT f.qid, g.v AS node FROM $p f JOIN ga g ON g.u = f.node),
            |bs$h AS MATERIALIZED (
            |  SELECT x.qid, x.node,
            |    ${dkDot("eq.embedding", "en.embedding")} / (eq.nrm * en.nrm) AS cos
            |  FROM bx$h x JOIN e eq ON eq.vec_id = x.qid
            |    JOIN e en ON en.vec_id = x.node),
            |bf$h AS MATERIALIZED (
            |  SELECT qid, node FROM (
            |    SELECT qid, node, row_number() OVER (PARTITION BY qid
            |      ORDER BY cos DESC, node) AS rn FROM bs$h)
            |  WHERE rn <= 8)""".stripMargin
        }
        s"""WITH $nnDescentCtes,
          |ga AS (SELECT u, v FROM g2
          |       UNION SELECT e.vec_id, (e.vec_id + 1) % nc.n FROM e, nc),
          |cc AS (SELECT vec_id AS cent_id, embedding AS cemb, nrm AS cnrm
          |       FROM e WHERE vec_id % 40 = 0),
          |rc AS (
          |  SELECT e.vec_id, cc.cent_id,
          |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
          |      ${dkDot("e.embedding", "cc.cemb")} / (e.nrm * cc.cnrm) DESC,
          |      cc.cent_id) AS rn
          |  FROM e, cc),
          |assign AS (SELECT vec_id, cent_id FROM rc WHERE rn = 1),
          |reps AS (SELECT cent_id, min(vec_id) AS node FROM assign GROUP BY 1),
          |bf0 AS (
          |  SELECT DISTINCT r2.vec_id AS qid, rp.node
          |  FROM rc r2 JOIN reps rp USING (cent_id)
          |  WHERE r2.rn <= 4 AND r2.vec_id % 25 = 0),
          |${hop(1)},
          |${hop(2)},
          |${hop(3)},
          |vis AS (
          |  SELECT qid, node, max(cos) AS cos FROM (
          |    SELECT * FROM bs1 UNION ALL SELECT * FROM bs2
          |    UNION ALL SELECT * FROM bs3)
          |  GROUP BY qid, node)
          |SELECT qid AS vec_id, node AS nbr_id, rn AS rnk FROM (
          |  SELECT qid, node, row_number() OVER (PARTITION BY qid
          |    ORDER BY cos DESC, node) AS rn
          |  FROM vis WHERE qid <> node)
          |WHERE rn <= 5""".stripMargin
      }),

    Q(
      "qs31_pca_projection",
      "Deterministic top-principal-component projection via POWER " +
        "ITERATION (Similarity.pcaProjection, 3 rounds): the learned " +
        "1-D corpus summary (drift axis, whitening prep) trained with " +
        "the Lloyd/Logit bit-reproducibility discipline — v0 = exact " +
        "1/8, every cross-row sum term DECIMAL(30,6)-quantized, " +
        "correctly-rounded sqrt/div, per-round round(·,6) " +
        "re-quantization, per-round lineage cut. The covariance " +
        "matrix never materializes: each round is c=(X−μ)v then " +
        "u=Xᵀc−(Σc)μ — two linear passes, shuffles on vec_id/dim, " +
        "model state = 64 rows. Output (vec_id, proj).",
      (s, dir) =>
        Similarity.pcaProjection(
          Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
          iters = 3),
      Some(s"""WITH $pcaCtes
        |SELECT d.vec_id,
        |  round(CAST(sum(CAST(d.x * v.v AS DECIMAL(30,6))) AS DOUBLE)
        |    - muv, 6) AS proj
        |FROM dims d JOIN v3 v USING (dim), muvf
        |GROUP BY d.vec_id, muv""".stripMargin)),

    Q(
      "qs32_pca_variance",
      "Variance-explained report for the trained axis " +
        "(Similarity.pcaVarianceReport): total centered sum of " +
        "squares vs the component's projection sum of squares and " +
        "their ratio — the one-row number that says whether the " +
        "qs31 axis actually summarizes the corpus (and when to add " +
        "components). Same decimal-term discipline as training; two " +
        "linear passes past the shared 3-round power iteration.",
      (s, dir) =>
        Similarity.pcaVarianceReport(
          Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
          iters = 3),
      Some(s"""WITH $pcaCtes,
        |cf AS (
        |  SELECT d.vec_id,
        |    CAST(CAST(sum(CAST(d.x * v.v AS DECIMAL(30,6))) AS DOUBLE)
        |      - muv AS DECIMAL(30,6)) AS cq
        |  FROM dims d JOIN v3 v USING (dim), muvf
        |  GROUP BY d.vec_id, muv),
        |t1 AS (
        |  SELECT CAST(sum(CAST((d.x - m.mu) * (d.x - m.mu)
        |    AS DECIMAL(30,6))) AS DOUBLE) AS total_ss
        |  FROM dims d JOIN mu m USING (dim)),
        |t2 AS (
        |  SELECT CAST(sum(CAST(CAST(cq AS DOUBLE) * CAST(cq AS DOUBLE)
        |    AS DECIMAL(30,6))) AS DOUBLE) AS pc1_ss
        |  FROM cf)
        |SELECT round(total_ss, 6) AS total_ss, round(pc1_ss, 6) AS pc1_ss,
        |  CASE WHEN total_ss > 0 THEN round(pc1_ss / total_ss, 6) END
        |    AS explained
        |FROM t1, t2""".stripMargin)),

    Q(
      "qs33_semantic_leakage",
      "SEMANTIC benchmark-leakage audit " +
        "(Similarity.semanticLeakageReport) — the embedding-space " +
        "complement of qd08/qd17's surface contamination: " +
        "paraphrased or translated eval items share no n-grams but " +
        "sit next to their source in embedding space. Benchmark = " +
        "vec_id % 50 = 0 (broadcast — eval sets are KB–MB), corpus " +
        "= the rest in ONE linear scan; per-query nearest neighbor " +
        "collapses map-side (struct-max, no window, no pair " +
        "shuffle). Output (vec_id, nbr_id, max_cos, leaked ≥ 0.5), " +
        "ties to the smallest neighbor id.",
      (s, dir) => {
        val em = Tables.load(s, dir, "embeddings")
        Similarity.semanticLeakageReport(
          em.filter(col("vec_id") % 50 =!= 0),
          em.filter(col("vec_id") % 50 === 0),
          "vec_id", "embedding", threshold = 0.5)
      },
      Some(s"""WITH e AS (
        |  SELECT vec_id, embedding, ${dkNorm("embedding")} AS nrm
        |  FROM embeddings),
        |c AS (SELECT * FROM e WHERE vec_id % 50 <> 0),
        |q AS (SELECT * FROM e WHERE vec_id % 50 = 0),
        |s AS (
        |  SELECT q.vec_id AS qid, c.vec_id AS nbr,
        |    ${dkDot("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cos
        |  FROM q, c),
        |r AS (
        |  SELECT qid, nbr, cos, row_number() OVER (PARTITION BY qid
        |    ORDER BY cos DESC, nbr) AS rn
        |  FROM s)
        |SELECT qid AS vec_id, nbr AS nbr_id, round(cos, 6) AS max_cos,
        |  round(cos, 6) >= 0.5 AS leaked
        |FROM r WHERE rn = 1""".stripMargin)),

    Q(
      "qs38_semantic_leakage_indexed",
      "INDEXED semantic leakage " +
        "(Similarity.semanticLeakageReportIndexed — qs33 routed " +
        "through the stored IVF index instead of a linear corpus " +
        "scan): the benchmark ranks the broadcast centroids for its " +
        "4 probe cells and only those cells' members are scored — " +
        "per-bench-item cost is probed-cells-sized, never " +
        "corpus-sized, on the artifacts an ANN service already " +
        "maintains (qs07's machinery). IVF approximation contract: " +
        "a source in an unprobed cell is invisible; nProbe is the " +
        "dial qs35 prices. Same output/tie discipline as qs33.",
      (s, dir) => {
        val em = Tables.load(s, dir, "embeddings")
        val idx = Similarity.buildIvfIndex(
          em.filter(col("vec_id") % 50 =!= 0), "vec_id", "embedding",
          centroidStride = 40)
        Similarity.semanticLeakageReportIndexed(
          idx, em.filter(col("vec_id") % 50 === 0),
          "vec_id", "embedding", threshold = 0.5, nProbe = 4)
      },
      Some(s"""WITH e AS (
        |  SELECT vec_id, embedding, ${dkNorm("embedding")} AS nrm
        |  FROM embeddings),
        |c AS (SELECT * FROM e WHERE vec_id % 50 <> 0),
        |q AS (SELECT * FROM e WHERE vec_id % 50 = 0),
        |cents AS (SELECT vec_id AS cent_id, embedding AS cemb, nrm AS cnrm
        |          FROM c WHERE vec_id % 40 = 0),
        |ar AS (
        |  SELECT c.vec_id, ct.cent_id,
        |    row_number() OVER (PARTITION BY c.vec_id ORDER BY
        |      ${dkDot("c.embedding", "ct.cemb")} / (c.nrm * ct.cnrm) DESC,
        |      ct.cent_id) AS rn
        |  FROM c, cents ct),
        |cells AS (
        |  SELECT c.vec_id, c.embedding, c.nrm, a.cent_id
        |  FROM c JOIN (SELECT vec_id, cent_id FROM ar WHERE rn = 1) a
        |    USING (vec_id)),
        |qr AS (
        |  SELECT q.vec_id, ct.cent_id,
        |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |      ${dkDot("q.embedding", "ct.cemb")} / (q.nrm * ct.cnrm) DESC,
        |      ct.cent_id) AS rn
        |  FROM q, cents ct),
        |p AS (
        |  SELECT q.vec_id, q.embedding, q.nrm, pr.cent_id
        |  FROM q JOIN (SELECT vec_id, cent_id FROM qr WHERE rn <= 4) pr
        |    USING (vec_id)),
        |s AS (
        |  SELECT p.vec_id AS qid, cl.vec_id AS nbr,
        |    ${dkDot("p.embedding", "cl.embedding")} / (p.nrm * cl.nrm) AS cos
        |  FROM p JOIN cells cl ON p.cent_id = cl.cent_id
        |    AND p.vec_id <> cl.vec_id),
        |r AS (
        |  SELECT qid, nbr, cos, row_number() OVER (PARTITION BY qid
        |    ORDER BY cos DESC, nbr) AS rn
        |  FROM s)
        |SELECT qid AS vec_id, nbr AS nbr_id, round(cos, 6) AS max_cos,
        |  round(cos, 6) >= 0.5 AS leaked
        |FROM r WHERE rn = 1""".stripMargin)),

    Q(
      "qs34_embedding_datasheet",
      "Per-dimension embedding DATASHEET " +
        "(Similarity.embeddingDimStats — qw16's profile for vector " +
        "data): n / DECIMAL-exact mean / population variance / min / " +
        "max per dim. The pre-flight audit before quantization or " +
        "indexing: dead dims waste SQ code range, runaway scales " +
        "break max-abs calibration, version drift shows as per-dim " +
        "movement. One posexplode + map-side-combined hash agg to 64 " +
        "rows; variance from two exact sums in a fixed IEEE dag.",
      (s, dir) =>
        Similarity.embeddingDimStats(
          Tables.load(s, dir, "embeddings"), "vec_id", "embedding"),
      Some("""WITH d AS (
        |  SELECT CAST(t.d AS BIGINT) AS dim,
        |    CAST(embedding[t.d + 1] AS DOUBLE) AS x
        |  FROM embeddings, unnest(range(0, 64)) t(d))
        |SELECT dim, CAST(count(*) AS BIGINT) AS n,
        |  round(CAST(sum(CAST(x AS DECIMAL(30,6))) AS DOUBLE)
        |    / count(*), 6) AS mean,
        |  round((CAST(sum(CAST(x * x AS DECIMAL(30,6))) AS DOUBLE)
        |    - CAST(sum(CAST(x AS DECIMAL(30,6))) AS DOUBLE)
        |      * CAST(sum(CAST(x AS DECIMAL(30,6))) AS DOUBLE) / count(*))
        |    / count(*), 6) AS variance,
        |  min(x) AS min_x, max(x) AS max_x
        |FROM d GROUP BY 1""".stripMargin)),

    Q(
      "qs35_probe_sweep",
      "IVF OPERATING CURVE in one amortized pass " +
        "(Similarity.probeSweepRecall): recall@5 for nProbe ∈ " +
        "{1,2,4,8} at once — candidates score ONCE against the " +
        "maxProbe fan-out (each corpus vector lives in exactly one " +
        "cell, so pairs carry their cell's probe rank), each sweep " +
        "point is a filter + mergeable top-k + one semi-join vs " +
        "exact truth (recall denominator = the truth PAIR count, so " +
        "1.0 stays reachable even when an exact list comes up " +
        "short). The table an index owner reads to pick the " +
        "latency/recall point; qs22 measures one configuration, " +
        "this measures the curve without rescoring.",
      (s, dir) =>
        Similarity.probeSweepRecall(
          Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
          k = 5, centroidStride = 40, probes = Seq(1, 2, 4, 8)),
      Some {
        def point(p: Int): String =
          s"""ivf$p AS (
            |  SELECT vec_id, nbr_id FROM (
            |    SELECT pp.vec_id AS vec_id, q.vec_id AS nbr_id,
            |      row_number() OVER (PARTITION BY pp.vec_id ORDER BY
            |        ${dkDot("pp.embedding", "q.embedding")} / (pp.nrm * q.nrm)
            |          DESC, q.vec_id) AS rnk
            |    FROM (SELECT e.vec_id, e.embedding, e.nrm, r.cent_id
            |          FROM e JOIN ranked r USING (vec_id)
            |          WHERE r.rn <= $p) pp
            |    JOIN b q ON pp.cent_id = q.cent_id AND pp.vec_id <> q.vec_id)
            |  WHERE rnk <= 5),
            |hits$p AS (SELECT CAST(count(*) AS BIGINT) AS n_hits
            |           FROM ivf$p JOIN exact USING (vec_id, nbr_id))"""
            .stripMargin
        def row(p: Int): String =
          s"""SELECT CAST($p AS BIGINT) AS n_probe, nq.n_queries,
            |  nq.n_truth, h.n_hits,
            |  CASE WHEN nq.n_truth > 0 THEN
            |    round(CAST(h.n_hits AS DOUBLE) /
            |      CAST(nq.n_truth AS DOUBLE), 6) END AS recall
            |FROM hits$p h, nq""".stripMargin
        s"""WITH e AS (
          |  SELECT vec_id, embedding, ${dkNorm("embedding")} AS nrm
          |  FROM embeddings),
          |c AS (SELECT vec_id AS cent_id, embedding AS cemb, nrm AS cnrm
          |      FROM e WHERE vec_id % 40 = 0),
          |ranked AS MATERIALIZED (
          |  SELECT e.vec_id, c.cent_id,
          |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
          |      ${dkDot("e.embedding", "c.cemb")} / (e.nrm * c.cnrm) DESC,
          |      c.cent_id) AS rn
          |  FROM e, c),
          |assign AS (SELECT vec_id, cent_id FROM ranked WHERE rn = 1),
          |b AS MATERIALIZED (
          |  SELECT e.vec_id, e.embedding, e.nrm, a.cent_id
          |  FROM e JOIN assign a USING (vec_id)),
          |exact AS MATERIALIZED (
          |  SELECT vec_id, nbr_id FROM (
          |    SELECT a.vec_id AS vec_id, b2.vec_id AS nbr_id,
          |      row_number() OVER (PARTITION BY a.vec_id ORDER BY
          |        ${dkDot("a.embedding", "b2.embedding")} / (a.nrm * b2.nrm)
          |          DESC, b2.vec_id) AS rnk
          |    FROM e a JOIN e b2 ON a.vec_id <> b2.vec_id)
          |  WHERE rnk <= 5),
          |nq AS (SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n_queries,
          |       CAST(count(*) AS BIGINT) AS n_truth
          |       FROM exact),
          |${point(1)},
          |${point(2)},
          |${point(4)},
          |${point(8)}
          |${Seq(1, 2, 4, 8).map(row).mkString("\n", "\nUNION ALL\n", "")}"""
          .stripMargin
      }),

    Q(
      "qs39_recall_sampled",
      "SAMPLED-truth ANN recall (Similarity.recallReportSampled — " +
        "qd40's discipline applied to vectors): exact truth only for " +
        "a deterministic bottom-k-of-hash sample of 100 query " +
        "vectors — O(sample·corpus) as one broadcast-query scan " +
        "collapsed by the mergeable top-k heap, never qs22's O(n²) " +
        "baseline — served IVF (stride 40, nProbe 4) evaluated on " +
        "the same sample. Unbiased recall estimate under uniform " +
        "query sampling; n_truth reported for the binomial error " +
        "bar. The audit that stays runnable when the corpus is 10^10 " +
        "vectors.",
      (s, dir) =>
        Similarity.recallReportSampled(
          Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
          k = 5, centroidStride = 40, nProbe = 4, sampleSize = 100),
      Some(s"""WITH e AS (
        |  SELECT vec_id, embedding, ${dkNorm("embedding")} AS nrm
        |  FROM embeddings),
        |smp AS (SELECT vec_id FROM (
        |    SELECT vec_id, row_number() OVER (ORDER BY
        |      ${TextQueries.dkHash60("CAST(vec_id AS VARCHAR)")}, vec_id) AS rn
        |    FROM e) WHERE rn <= 100),
        |q AS (SELECT e.* FROM e JOIN smp USING (vec_id)),
        |truth AS (
        |  SELECT vec_id, nbr_id FROM (
        |    SELECT a.vec_id AS vec_id, b2.vec_id AS nbr_id,
        |      row_number() OVER (PARTITION BY a.vec_id ORDER BY
        |        ${dkDot("a.embedding", "b2.embedding")} / (a.nrm * b2.nrm)
        |          DESC, b2.vec_id) AS rnk
        |    FROM q a JOIN e b2 ON a.vec_id <> b2.vec_id)
        |  WHERE rnk <= 5),
        |c AS (SELECT vec_id AS cent_id, embedding AS cemb, nrm AS cnrm
        |      FROM e WHERE vec_id % 40 = 0),
        |ranked AS (
        |  SELECT e.vec_id, c.cent_id,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      ${dkDot("e.embedding", "c.cemb")} / (e.nrm * c.cnrm) DESC,
        |      c.cent_id) AS rn
        |  FROM e, c),
        |assign AS (SELECT vec_id, cent_id FROM ranked WHERE rn = 1),
        |b AS (SELECT e.vec_id, e.embedding, e.nrm, a.cent_id
        |      FROM e JOIN assign a USING (vec_id)),
        |p AS (SELECT q.vec_id, q.embedding, q.nrm, r.cent_id
        |      FROM q JOIN ranked r USING (vec_id) WHERE r.rn <= 4),
        |served AS (
        |  SELECT vec_id, nbr_id FROM (
        |    SELECT p.vec_id AS vec_id, bb.vec_id AS nbr_id,
        |      row_number() OVER (PARTITION BY p.vec_id ORDER BY
        |        ${dkDot("p.embedding", "bb.embedding")} / (p.nrm * bb.nrm)
        |          DESC, bb.vec_id) AS rnk
        |    FROM p JOIN b bb ON p.cent_id = bb.cent_id
        |      AND p.vec_id <> bb.vec_id)
        |  WHERE rnk <= 5),
        |c0 AS (SELECT CAST(count(*) AS BIGINT) AS sample_n FROM smp),
        |c1 AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth),
        |c2 AS (SELECT CAST(count(*) AS BIGINT) AS n_hits
        |       FROM served JOIN truth USING (vec_id, nbr_id))
        |SELECT sample_n, n_truth, n_hits,
        |  CASE WHEN n_truth > 0 THEN
        |    round(CAST(n_hits AS DOUBLE) / CAST(n_truth AS DOUBLE), 6)
        |  END AS recall
        |FROM c0, c1, c2""".stripMargin)),

    Q(
      "qs40_ivf_index_stats",
      "IVF index HEALTH datasheet (Similarity.ivfIndexStats): one " +
        "row of cell-population metadata over the stored index — " +
        "n_cells / n_vectors / min / max / dead cells / mean / " +
        "max-to-mean SKEW, the number that says when a hot cell " +
        "will serve most probes slowly and the quantizer needs a " +
        "retrain (qs08) or a split. Pure metadata aggregation: one " +
        "hash agg on cent_id + a broadcast anti-join for dead " +
        "cells — never touches embedding floats.",
      (s, dir) =>
        Similarity.ivfIndexStats(
          Similarity.buildIvfIndex(
            Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
            centroidStride = 40)),
      Some(s"""WITH e AS (
        |  SELECT vec_id, embedding, ${dkNorm("embedding")} AS nrm
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cent_id, embedding AS cemb, nrm AS cnrm
        |      FROM e WHERE vec_id % 40 = 0),
        |ranked AS (
        |  SELECT e.vec_id, c.cent_id,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      ${dkDot("e.embedding", "c.cemb")} / (e.nrm * c.cnrm) DESC,
        |      c.cent_id) AS rn
        |  FROM e, c),
        |assign AS (SELECT vec_id, cent_id FROM ranked WHERE rn = 1),
        |pc AS (SELECT cent_id, CAST(count(*) AS BIGINT) AS members
        |       FROM assign GROUP BY 1),
        |dead AS (SELECT CAST(count(*) AS BIGINT) AS empty_cells
        |         FROM c WHERE cent_id NOT IN (SELECT cent_id FROM pc)),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_cells,
        |    CAST(sum(members) AS BIGINT) AS n_vectors,
        |    CAST(min(members) AS BIGINT) AS min_cell,
        |    CAST(max(members) AS BIGINT) AS max_cell
        |  FROM pc)
        |SELECT n_cells, n_vectors, min_cell, max_cell, empty_cells,
        |  CASE WHEN n_cells > 0 THEN
        |    round(CAST(n_vectors AS DOUBLE) / CAST(n_cells AS DOUBLE), 6)
        |  END AS mean_cell,
        |  CASE WHEN n_vectors > 0 THEN
        |    round(CAST(max_cell AS DOUBLE) * CAST(n_cells AS DOUBLE) /
        |      CAST(n_vectors AS DOUBLE), 6)
        |  END AS skew
        |FROM agg, dead""".stripMargin)),

    Q(
      "qs41_trained_index_stats",
      "qs40's health datasheet over the K-MEANS-TRAINED index " +
        "(Similarity.kmeansIvfIndex, 2 Lloyd rounds — qs08's " +
        "quantizer): the measured value of training is the SKEW " +
        "delta between this row and qs40's stride-seeded row — " +
        "Lloyd rounds move centroids toward population balance, so " +
        "hot cells shrink and probe latency evens out. The pair is " +
        "the retrain decision, in-engine and bit-reproducible. " +
        "Oracle unrolls both Lloyd rounds then replays the " +
        "metadata aggregation.",
      (s, dir) =>
        Similarity.ivfIndexStats(
          Similarity.kmeansIvfIndex(
            Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
            centroidStride = 40, iters = 2)),
      Some(s"""WITH e AS (
        |  SELECT vec_id, embedding, ${dkNorm("embedding")} AS nrm
        |  FROM embeddings),
        |c0 AS (
        |  SELECT vec_id AS cent_id, embedding AS cemb, nrm AS cnrm
        |  FROM e WHERE vec_id % 40 = 0),
        |${lloydRound(1, "c0")},
        |${lloydRound(2, "cn1")},
        |rf AS (
        |  SELECT e.vec_id, c.cent_id,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      ${dkDot("e.embedding", "c.cemb")} / (e.nrm * c.cnrm) DESC,
        |      c.cent_id) AS rn
        |  FROM e, cn2 c),
        |assign AS (SELECT vec_id, cent_id FROM rf WHERE rn = 1),
        |pc AS (SELECT cent_id, CAST(count(*) AS BIGINT) AS members
        |       FROM assign GROUP BY 1),
        |dead AS (SELECT CAST(count(*) AS BIGINT) AS empty_cells
        |         FROM cn2 WHERE cent_id NOT IN (SELECT cent_id FROM pc)),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_cells,
        |    CAST(sum(members) AS BIGINT) AS n_vectors,
        |    CAST(min(members) AS BIGINT) AS min_cell,
        |    CAST(max(members) AS BIGINT) AS max_cell
        |  FROM pc)
        |SELECT n_cells, n_vectors, min_cell, max_cell, empty_cells,
        |  CASE WHEN n_cells > 0 THEN
        |    round(CAST(n_vectors AS DOUBLE) / CAST(n_cells AS DOUBLE), 6)
        |  END AS mean_cell,
        |  CASE WHEN n_vectors > 0 THEN
        |    round(CAST(max_cell AS DOUBLE) * CAST(n_cells AS DOUBLE) /
        |      CAST(n_vectors AS DOUBLE), 6)
        |  END AS skew
        |FROM agg, dead""".stripMargin)),

    Q(
      "qs42_hot_cell_split",
      "HOT-CELL SPLIT (Similarity.splitHotCells — the rebalance " +
        "ACTION qs40's skew row signals): every cell over 40 " +
        "members splits by a deterministic in-cell 2-means (two " +
        "lowest-id members seed, ONE Lloyd round with decimal-exact " +
        "means, re-assign to the nearer trained child; ids stay " +
        "collision-free — cold cells keep 2·id, children take 2·p " +
        "and 2·p+1). Only hot-cell members move; the corpus never " +
        "re-shuffles. Output = the split index's per-cell " +
        "populations; oracle replays the whole split.",
      (s, dir) => {
        val idx = Similarity.buildIvfIndex(
          Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
          centroidStride = 40)
        Similarity.splitHotCells(idx, maxCell = 40).cells
          .groupBy(col("cent_id"))
          .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).cast("long").as("members"))
      },
      Some(s"""WITH e AS (
        |  SELECT vec_id, embedding, ${dkNorm("embedding")} AS nrm
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cent_id, embedding AS cemb, nrm AS cnrm
        |      FROM e WHERE vec_id % 40 = 0),
        |ranked AS (
        |  SELECT e.vec_id, c.cent_id,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      ${dkDot("e.embedding", "c.cemb")} / (e.nrm * c.cnrm) DESC,
        |      c.cent_id) AS rn
        |  FROM e, c),
        |cl AS (
        |  SELECT e.vec_id, e.embedding, e.nrm, a.cent_id
        |  FROM e JOIN (SELECT vec_id, cent_id FROM ranked WHERE rn = 1) a
        |    USING (vec_id)),
        |sz AS (SELECT cent_id, count(*) AS n FROM cl GROUP BY 1),
        |hot AS (SELECT cent_id FROM sz WHERE n > 40),
        |hm AS (SELECT cl.* FROM cl JOIN hot USING (cent_id)),
        |cold AS (SELECT cl.* FROM cl
        |         WHERE cent_id NOT IN (SELECT cent_id FROM hot)),
        |sd AS (
        |  SELECT cent_id, rk, embedding AS semb, nrm AS snrm FROM (
        |    SELECT cent_id, embedding, nrm,
        |      row_number() OVER (PARTITION BY cent_id ORDER BY vec_id) AS rk
        |    FROM hm) WHERE rk <= 2),
        |r1 AS (
        |  SELECT hm.cent_id, hm.vec_id, s.rk,
        |    row_number() OVER (PARTITION BY hm.cent_id, hm.vec_id ORDER BY
        |      ${dkDot("hm.embedding", "s.semb")} / (hm.nrm * s.snrm) DESC,
        |      s.rk) AS rn
        |  FROM hm JOIN sd s USING (cent_id)),
        |a1 AS (SELECT cent_id, vec_id, rk FROM r1 WHERE rn = 1),
        |m1 AS (
        |  SELECT a1.cent_id, a1.rk, t.i AS dim,
        |    CAST(sum(CAST(CAST(hm.embedding[t.i] AS DOUBLE)
        |      AS DECIMAL(30,6))) AS DOUBLE) /
        |      CAST(count(*) AS DOUBLE) AS mu
        |  FROM hm JOIN a1 ON hm.cent_id = a1.cent_id
        |    AND hm.vec_id = a1.vec_id,
        |    unnest(range(1, len(hm.embedding) + 1)) t(i)
        |  GROUP BY 1, 2, 3),
        |ch AS (
        |  SELECT cent_id, rk,
        |    list_transform(list(mu ORDER BY dim),
        |      x -> CAST(x AS FLOAT)) AS cvec
        |  FROM m1 GROUP BY 1, 2),
        |chn AS (SELECT cent_id, rk, cvec, ${dkNorm("cvec")} AS cnrm FROM ch),
        |r2 AS (
        |  SELECT hm.cent_id, hm.vec_id, ch2.rk,
        |    row_number() OVER (PARTITION BY hm.cent_id, hm.vec_id ORDER BY
        |      ${dkDot("hm.embedding", "ch2.cvec")} / (hm.nrm * ch2.cnrm) DESC,
        |      ch2.rk) AS rn
        |  FROM hm JOIN chn ch2 USING (cent_id)),
        |a2 AS (SELECT cent_id, vec_id, rk FROM r2 WHERE rn = 1),
        |newcells AS (
        |  SELECT vec_id, cent_id * 2 AS cent_id FROM cold
        |  UNION ALL
        |  SELECT vec_id, cent_id * 2 + rk - 1 AS cent_id FROM a2)
        |SELECT cent_id, CAST(count(*) AS BIGINT) AS members
        |FROM newcells GROUP BY 1""".stripMargin)),

    Q(
      "qs36_sq_distortion",
      "Scalar-quantization DISTORTION audit " +
        "(Similarity.sqDistortionReport): per-vector cosine fidelity " +
        "between each embedding and its int8 round-trip (quantize on " +
        "corpus-calibrated scales, dequantize q·s/127) — the 'how " +
        "lossy is this tier' datasheet read before qs10's codes " +
        "serve traffic; recall (qs22/qs35) measures ranking damage, " +
        "this localizes it per vector. One calibration agg + a " +
        "map-side quantize/dequantize pass, ascending-index double " +
        "folds.",
      (s, dir) =>
        Similarity.sqDistortionReport(
          Tables.load(s, dir, "embeddings"), "vec_id", "embedding"),
      Some(s"""WITH $sqCtes,
        |d AS (
        |  SELECT vec_id, embedding,
        |    list_transform(range(1, len(embedding) + 1), i ->
        |      CAST(least(greatest(floor(CAST(embedding[i] AS DOUBLE)
        |        / s[i] * 127 + 0.5), -127), 127) AS DOUBLE)
        |        * s[i] / 127.0) AS deq
        |  FROM embeddings, scl)
        |SELECT vec_id,
        |  round(${dkDot("embedding", "deq")} /
        |    (${dkNorm("embedding")} * ${dkNorm("deq")}), 6) AS fidelity
        |FROM d""".stripMargin)),

    Q(
      "qs37_pq_distortion",
      "Product-quantization DISTORTION audit " +
        "(Similarity.pqDistortionReport — qs36's twin for the PQ " +
        "tier) at the PRODUCTION training recipe: K=256 codebooks " +
        "(stride 2 seeds, capped — one byte per code) and 2 Lloyd " +
        "rounds per subquantizer. Measured mean fidelity 0.94 " +
        "(p10 0.89) at the SAME 32× compression where qs14's " +
        "1-round stride-40 recipe prices at 0.60 (tools/PqSweep) — " +
        "training quality, not code size, was the gap. Together " +
        "with qs36 this prices the quantization ladder; " +
        "reconstruction is one (m, cent_id) equi-join + a " +
        "sorted-struct flatten. Oracle unrolls both Lloyd rounds.",
      (s, dir) =>
        Similarity.pqDistortionReport(
          Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
          nSub = 8, dim = 64, centroidStride = 2, iters = 2),
      Some(s"""WITH ${pqCtesMulti("embeddings", "embedding", 2, 2)},
        |rec AS (
        |  SELECT c.vec_id,
        |    flatten(list(cb.cvec ORDER BY c.m)) AS deq
        |  FROM codes c JOIN cb ON cb.m = c.m AND cb.cent_id = c.cent_id
        |  GROUP BY 1)
        |SELECT e.vec_id,
        |  round(${dkDot("e.embedding", "r.deq")} /
        |    (${dkNorm("e.embedding")} * ${dkNorm("r.deq")}), 6) AS fidelity
        |FROM embeddings e JOIN rec r USING (vec_id)""".stripMargin))
  )

  /** DuckDB replay of Similarity.pcaLoop (3 unrolled power-iteration
    * rounds over the embeddings table) — CTE chain ending at the
    * trained component `v3` and its mean-dot `muvf`; shared by qs31
    * (projections) and qs32 (variance report). */
  private[queries] def pcaCtes: String = {
    def rnd(r: Int): String = {
      val pv = if (r == 1) "v0" else s"v${r - 1}"
      s"""muv$r AS (
        |  SELECT CAST(sum(CAST(m.mu * v.v AS DECIMAL(30,6))) AS DOUBLE)
        |    AS muv
        |  FROM mu m JOIN $pv v USING (dim)),
        |c$r AS MATERIALIZED (
        |  SELECT d.vec_id,
        |    CAST(CAST(sum(CAST(d.x * v.v AS DECIMAL(30,6))) AS DOUBLE)
        |      - muv AS DECIMAL(30,6)) AS cq
        |  FROM dims d JOIN $pv v USING (dim), muv$r
        |  GROUP BY d.vec_id, muv),
        |s$r AS (
        |  SELECT d.dim,
        |    CAST(sum(CAST(CAST(c.cq AS DOUBLE) * d.x AS DECIMAL(30,6)))
        |      AS DOUBLE) AS sd
        |  FROM dims d JOIN c$r c USING (vec_id) GROUP BY 1),
        |ct$r AS (SELECT CAST(sum(cq) AS DOUBLE) AS ct FROM c$r),
        |u$r AS (
        |  SELECT s.dim, s.sd - ct.ct * m.mu AS u
        |  FROM s$r s JOIN mu m USING (dim), ct$r ct),
        |nrm$r AS (
        |  SELECT sqrt(CAST(sum(CAST(u * u AS DECIMAL(30,6))) AS DOUBLE))
        |    AS nrm FROM u$r),
        |v$r AS MATERIALIZED (
        |  SELECT dim, round(u / nrm, 6) AS v FROM u$r, nrm$r)"""
        .stripMargin
    }
    s"""e AS (SELECT vec_id, embedding FROM embeddings),
      |dims AS MATERIALIZED (
      |  SELECT vec_id, CAST(t.d AS INT) AS dim,
      |    CAST(embedding[t.d + 1] AS DOUBLE) AS x
      |  FROM e, unnest(range(0, 64)) t(d)),
      |nd AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM e),
      |mu AS MATERIALIZED (
      |  SELECT dim,
      |    CAST(sum(CAST(x AS DECIMAL(30,6))) AS DOUBLE) / nd AS mu
      |  FROM dims, nd GROUP BY dim, nd),
      |v0 AS (SELECT CAST(t.d AS INT) AS dim, 0.125 AS v
      |       FROM unnest(range(0, 64)) t(d)),
      |${rnd(1)},
      |${rnd(2)},
      |${rnd(3)},
      |muvf AS (
      |  SELECT CAST(sum(CAST(m.mu * v.v AS DECIMAL(30,6))) AS DOUBLE)
      |    AS muv
      |  FROM mu m JOIN v3 v USING (dim))""".stripMargin
  }

  /** Shared NN-Descent CTE chain (e, nc, ring seed g0, two unrolled
    * candidate-propagation rounds ending at g2) — qs25 reads the
    * ranked graph off it, qs26 closes it into components. */
  private def nnDescentCtes: String = {
    def nnRound(r: Int, prev: String): String =
      s"""c$r AS (
        |  SELECT u, v FROM $prev
        |  UNION
        |  SELECT a.u AS u, b.v AS v
        |  FROM $prev a JOIN $prev b ON a.v = b.u WHERE b.v <> a.u
        |  UNION
        |  SELECT v AS u, u AS v FROM $prev),
        |s$r AS (
        |  SELECT c.u, c.v,
        |    row_number() OVER (PARTITION BY c.u ORDER BY
        |      ${dkDot("eu.embedding", "ev.embedding")} / (eu.nrm * ev.nrm)
        |        DESC, c.v) AS rn
        |  FROM c$r c JOIN e eu ON eu.vec_id = c.u
        |    JOIN e ev ON ev.vec_id = c.v),
        |g$r AS MATERIALIZED (SELECT u, v FROM s$r WHERE rn <= 5)"""
        .stripMargin
    s"""e AS MATERIALIZED (
      |  SELECT vec_id, embedding, ${dkNorm("embedding")} AS nrm
      |  FROM embeddings),
      |nc AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e),
      |g0 AS MATERIALIZED (
      |  SELECT e.vec_id AS u, (e.vec_id + t.j) % nc.n AS v
      |  FROM e, nc, unnest(range(1, 6)) t(j)),
      |${nnRound(1, "g0")},
      |${nnRound(2, "g1")}""".stripMargin
  }
}
