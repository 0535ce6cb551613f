package graft.queries

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.functions.{broadcast, coalesce, col, count, countDistinct, expr, floor, lit, max, pmod, posexplode, round, row_number, sqrt, sum, when}

/** Similarity search over the embeddings table. The brute-force queries
  * carry exact DuckDB oracles (`embedding::DOUBLE[]` upcast first, so
  * both engines fold doubles in index order); the LSH path is verified
  * for recall against the exact result in the test suite and checked
  * rows-only by the driver. */
object SimilarityQueries {

  /** Exact brute-force cosine top-5 neighbours per vector. */
  val q32 = QueryDef.sql("q32_cosine_topk",
    """WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
      |n AS (SELECT id, v, sqrt(list_dot_product(v, v)) AS nrm FROM v),
      |p AS (SELECT a.id AS id_a, b.id AS id_b,
      |        list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cosine
      |      FROM n a JOIN n b ON a.id <> b.id),
      |r AS (SELECT id_a, id_b, cosine,
      |        row_number() OVER (PARTITION BY id_a
      |                           ORDER BY cosine DESC, id_b) AS rnk
      |      FROM p)
      |SELECT id_a, id_b, round(cosine, 6) AS sim, rnk FROM r WHERE rnk <= 5""")(
    (s, dir) => Similarity.cosineTopK(Tables.embeddings(s, dir),
      "vec_id", "embedding", k = 5))

  /** Embedding-cosine near-duplicate pairs (threshold 0.45). */
  val q33 = QueryDef.sql("q33_cosine_neardup",
    """WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
      |n AS (SELECT id, v, sqrt(list_dot_product(v, v)) AS nrm FROM v),
      |p AS (SELECT a.id AS id_a, b.id AS id_b,
      |        list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cosine
      |      FROM n a JOIN n b ON a.id < b.id)
      |SELECT id_a, id_b, round(cosine, 6) AS sim FROM p WHERE cosine >= 0.45""")(
    (s, dir) => Similarity.cosineNearDup(Tables.embeddings(s, dir),
      "vec_id", "embedding", threshold = 0.45))

  /** LSH-bucketed approximate top-k — the 100 TB path. Recall vs exact
    * (0.956 at sf0.1, ≥ 0.9 asserted in DedupSimilaritySpec; 0.917 at
    * sf0.01) at wall-time below the exact brute force, via margin-guided
    * multiprobe. Parameters sit on the measured recall-time frontier for
    * this corpus's geometry — see Similarity.lshTopK and SCALING.md.
    *
    * HASH-CHECKED against a full DuckDB replay of the approximate
    * pipeline — every step is deterministic: the md5-derived ±1 planes
    * rebuild in SQL (first hex digit ≥ '8' ⇔ +1), plane dot products
    * are strict in-order double folds on both engines (the q32
    * `list_dot_product` contract), so bucket bits (s > 0), |margin|
    * probe ranking (ties to the lowest plane index — the scan order of
    * LshProbes.computeProbes), the probe⋈base candidate set, and the
    * final (cosine DESC, id_b) top-5 all replay bit-for-bit. Constants
    * 140 = tables·20 × planes·7; flips = multiprobe = 4. */
  val q34 = QueryDef.sql("q34_ann_lsh",
    """WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
      |n AS (SELECT id, v, sqrt(list_dot_product(v, v)) AS nrm FROM v),
      |signs AS (
      |  SELECT p, list(CASE WHEN strpos('89abcdef',
      |                   substr(md5(p || ':' || d), 1, 1)) > 0
      |                 THEN 1.0::DOUBLE ELSE -1.0::DOUBLE END ORDER BY d) AS sv
      |  FROM range(0, 140) t1(p), range(0, 64) t2(d)
      |  GROUP BY p),
      |m AS (SELECT n.id, CAST(s.p // 7 AS INT) AS t, CAST(s.p % 7 AS INT) AS j,
      |        list_dot_product(n.v, s.sv) AS s
      |      FROM n CROSS JOIN signs s),
      |base AS (SELECT id, t,
      |        sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT AS b
      |      FROM m GROUP BY id, t),
      |flips AS (SELECT id, t, j,
      |        row_number() OVER (PARTITION BY id, t ORDER BY abs(s), j) AS rnk
      |      FROM m),
      |probe AS (
      |  SELECT id, t, b FROM base
      |  UNION ALL
      |  SELECT f.id, f.t, xor(b.b, (1::BIGINT << f.j)) AS b
      |  FROM flips f JOIN base b ON b.id = f.id AND b.t = f.t
      |  WHERE f.rnk <= 4),
      |pairs AS (SELECT DISTINCT p.id AS id_a, c.id AS id_b
      |      FROM probe p JOIN base c ON p.t = c.t AND p.b = c.b
      |      WHERE p.id <> c.id),
      |scored AS (SELECT pr.id_a, pr.id_b,
      |        list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cosine
      |      FROM pairs pr
      |      JOIN n a ON a.id = pr.id_a
      |      JOIN n b ON b.id = pr.id_b),
      |r AS (SELECT id_a, id_b, cosine,
      |        row_number() OVER (PARTITION BY id_a
      |                           ORDER BY cosine DESC, id_b) AS rnk
      |      FROM scored)
      |SELECT id_a, id_b, round(cosine, 6) AS sim, rnk FROM r WHERE rnk <= 5""")(
    (s, dir) => Similarity.lshTopK(Tables.embeddings(s, dir),
      "vec_id", "embedding", dim = 64, planes = 7, tables = 20, k = 5,
      multiprobe = 4))

  /** IVF ANN (KMeans cells + nprobe search), auto-sized nlist ≈ √n.
    * The fitted-KMeans index is seed-dependent, so this variant is not
    * in the driver catalog: recall vs exact is asserted in IvfSpec, and
    * the deterministic grid-cell twin (q160) carries the hash-checked
    * oracle for the IVF probe semantics. */
  val q39 = QueryDef.rowsOnly("q39_ann_ivf")(
    (s, dir) => graft.operators.Ivf.ivfTopKAuto(Tables.embeddings(s, dir),
      "vec_id", "embedding", k = 5))

  /** Exact top-5 again, by the BLOCK-nested-loop kernel — bit-identical
    * to q32 (they share this oracle; the driver hash proves the kernel
    * against an independent engine), at a fraction of the row-handoff
    * overhead. This is the exact-search formulation that scales: dense
    * primitive-array tiles instead of n² per-row expression evaluations.
    * See [[graft.operators.Similarity.cosineTopKBlocked]]. */
  val q55 = QueryDef.sql("q55_cosine_topk_blocked",
    """WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
      |n AS (SELECT id, v, sqrt(list_dot_product(v, v)) AS nrm FROM v),
      |p AS (SELECT a.id AS id_a, b.id AS id_b,
      |        list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cosine
      |      FROM n a JOIN n b ON a.id <> b.id),
      |r AS (SELECT id_a, id_b, cosine,
      |        row_number() OVER (PARTITION BY id_a
      |                           ORDER BY cosine DESC, id_b) AS rnk
      |      FROM p)
      |SELECT id_a, id_b, round(cosine, 6) AS sim, rnk FROM r WHERE rnk <= 5""")(
    (s, dir) => Similarity.cosineTopKBlocked(Tables.embeddings(s, dir),
      "vec_id", "embedding", k = 5))

  /** L2-normalize + int8-quantize every embedding, one row per (vector,
    * dimension): q = ⌊x/‖v‖·127 + 0.5⌋. Fold order, sqrt and IEEE
    * divide/multiply are exact-rounded and order-fixed on both engines,
    * so the codes replay bit-for-bit. */
  val q60 = QueryDef.sql("q60_embed_quantize",
    """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM v),
      |e AS (SELECT vec_id, nrm, v, unnest(range(1, len(v) + 1)) AS i FROM n)
      |SELECT vec_id, CAST(i - 1 AS INT) AS i,
      |  CAST(CASE WHEN nrm = 0 THEN 0
      |       ELSE floor(v[CAST(i AS INT)] / nrm * 127.0::DOUBLE + 0.5::DOUBLE)
      |       END AS INT) AS q
      |FROM e""")(
    (s, dir) => Similarity.quantizeInt8(Tables.embeddings(s, dir),
      "vec_id", "embedding"))

  /** Semantic dedup (SemDeDup shape): exact-cosine near-dup pairs from
    * the blocked kernel (the plan that survives corpus scale — no
    * row-level crossJoin) clustered into connected components; every
    * vector is labelled with its component minimum and whether it is
    * the kept canonical. Pairs, components and labels are all exact,
    * so the oracle replays the fixpoint with a recursive transitive-
    * closure CTE (same pattern as q56's text-side clustering). */
  val q61 = QueryDef.sql("q61_semantic_dedup",
    """WITH RECURSIVE
      |v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
      |n AS (SELECT id, v, sqrt(list_dot_product(v, v)) AS nrm FROM v),
      |pairs AS (SELECT a.id AS id1, b.id AS id2
      |          FROM n a JOIN n b ON a.id < b.id
      |          WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.45),
      |edges AS (SELECT id1 AS u, id2 AS w FROM pairs
      |          UNION SELECT id2 AS u, id1 AS w FROM pairs),
      |reach(id, lab) AS (
      |  SELECT vec_id, vec_id FROM embeddings
      |  UNION
      |  SELECT e.u, r.lab FROM edges e JOIN reach r ON e.w = r.id)
      |SELECT id AS vec_id, min(lab) AS cluster, min(lab) = id AS keep
      |FROM reach GROUP BY id""")(
    (s, dir) => graft.operators.Graph.dedupClusters(
      Tables.embeddings(s, dir), "vec_id",
      Similarity.cosineNearDupBlocked(Tables.embeddings(s, dir),
        "vec_id", "embedding", threshold = 0.45),
      "id_a", "id_b"))

  /** Retrieval top-k: every 50th vector is a "query", the rest are the
    * corpus; exact cosine top-5 per query. The query side broadcasts;
    * the corpus is scanned once with map-side bounded top-k — the plan
    * that serves a small query batch against a 100 TB corpus. */
  val q65 = QueryDef.sql("q65_retrieve_topk",
    """WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
      |n AS (SELECT id, v, sqrt(list_dot_product(v, v)) AS nrm FROM v),
      |q AS (SELECT * FROM n WHERE id % 50 = 0),
      |c AS (SELECT * FROM n WHERE id % 50 <> 0),
      |p AS (SELECT q.id AS id_a, c.id AS id_b,
      |        list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cosine
      |      FROM q, c),
      |r AS (SELECT id_a, id_b, cosine,
      |        row_number() OVER (PARTITION BY id_a
      |                           ORDER BY cosine DESC, id_b) AS rnk
      |      FROM p)
      |SELECT id_a, id_b, round(cosine, 6) AS sim, rnk FROM r WHERE rnk <= 5""")(
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.retrieveTopK(
        emb.where(pmod(col("vec_id"), lit(50)) =!= 0),
        emb.where(pmod(col("vec_id"), lit(50)) === 0),
        "vec_id", "embedding", k = 5)
    })

  /** Hard-negative mining ([[Similarity.hardNegatives]]): for each
    * anchor (every 13th vector — mining runs per training batch, not
    * per corpus), the highest-cosine vector with a DIFFERENT label.
    * The oracle replays the brute force with a rank-1 window; ranking
    * happens on unrounded cosines on both engines (round only in the
    * output), the q32 contract. */
  val q98 = QueryDef.sql("q98_hard_negatives",
    """WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v, label
      |           FROM embeddings),
      |n AS (SELECT id, v, label, sqrt(list_dot_product(v, v)) AS nrm FROM v),
      |a AS (SELECT * FROM n WHERE id % 13 = 0),
      |p AS (SELECT a.id AS id_a, a.label AS label_a,
      |        b.id AS id_b, b.label AS label_b,
      |        list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cosine
      |      FROM a JOIN n b ON a.label <> b.label),
      |r AS (SELECT *, row_number() OVER (PARTITION BY id_a
      |        ORDER BY cosine DESC, id_b) AS rnk FROM p)
      |SELECT id_a, label_a, id_b, label_b, round(cosine, 6) AS sim
      |FROM r WHERE rnk = 1""")(
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.hardNegatives(emb,
        emb.where(pmod(col("vec_id"), lit(13)) === 0),
        "vec_id", "embedding", "label")
    })

  /** Deterministic IVF ANN — hash-sampled centroids (the corpus
    * vectors ranking first by md5(id) become the cells), fused
    * one-loop 2-ASSIGNMENT and probing, count-then-dialed nlist/nprobe,
    * exact rescoring with candidate dedup.
    *
    * HASH-CHECKED against a full DuckDB replay (the q34 treatment for
    * the IVF family): centroid choice is a pure md5-rank sample,
    * d² = nrm² − 2⟨v,c⟩ + ‖c‖² is evaluated in the same literal order
    * with in-index-order dot folds on both engines (the q32
    * `list_dot_product` contract; nrm² is sqrt-then-square, matching
    * IvfProbe), assignment (rank ≤ 2 — multi-assignment, the
    * boundary-miss recall fix) and probe ties break to the lowest
    * cell, duplicate candidate pairs collapse identically on both
    * sides (they carry the identical cosine; Spark dedupes by id in
    * the bounded top-k buffer, the oracle with DISTINCT), so the final
    * (cosine DESC, id_b) top-5 replays bit-for-bit. The fitted-KMeans
    * path stays q39 (rows-only + recall-spec'd); this pins the serving
    * machinery end-to-end. */
  val q160 = QueryDef.sql("q160_ann_ivf_det",
    """WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
      |dial AS (SELECT CAST(greatest(64, ceil(sqrt(count(*)))) AS BIGINT)
      |           AS nlist,
      |         greatest(16, length(bin(count(*)))) AS nprobe
      |  FROM v),
      |n AS (SELECT id, v, sqrt(list_dot_product(v, v)) AS nrm FROM v),
      |cent AS (
      |  SELECT row_number() OVER (ORDER BY md5(CAST(id AS VARCHAR)), id) - 1
      |           AS cell,
      |         v AS cv, list_dot_product(v, v) AS cn2
      |  FROM v ORDER BY md5(CAST(id AS VARCHAR)), id
      |  LIMIT (SELECT nlist FROM dial)),
      |d AS (SELECT n.id, c.cell,
      |        n.nrm * n.nrm - 2.0::DOUBLE * list_dot_product(n.v, c.cv)
      |          + c.cn2 AS d2
      |      FROM n CROSS JOIN cent c),
      |rkd AS (SELECT id, cell,
      |        row_number() OVER (PARTITION BY id ORDER BY d2, cell) AS r
      |      FROM d),
      |asgn AS (SELECT id, cell FROM rkd WHERE r <= 2),
      |probe AS (SELECT id, cell FROM rkd, dial WHERE r <= nprobe),
      |cand AS (SELECT DISTINCT p.id AS id_a, a.id AS id_b
      |      FROM probe p JOIN asgn a ON p.cell = a.cell
      |      WHERE p.id <> a.id),
      |scored AS (SELECT c.id_a, c.id_b,
      |        list_dot_product(x.v, y.v) / (x.nrm * y.nrm) AS cosine
      |      FROM cand c
      |      JOIN n x ON x.id = c.id_a
      |      JOIN n y ON y.id = c.id_b),
      |r AS (SELECT id_a, id_b, cosine,
      |        row_number() OVER (PARTITION BY id_a
      |                           ORDER BY cosine DESC, id_b) AS rnk
      |      FROM scored)
      |SELECT id_a, id_b, round(cosine, 6) AS sim, rnk FROM r WHERE rnk <= 5""")(
    // count-then-dialed nlist = √n (floor 64), nprobe = bitlen(n)
    // (floor 16) — DECOUPLED from nlist so the probed fraction FALLS
    // with the corpus (VERDICT r13 #1; total candidate work
    // Θ(n^1.5·log n), see Ivf.detDial). The oracle computes the
    // identical dial from count(*) — `length(bin(n))` is the exact
    // binary digit count on both engines — so the replay stays
    // bit-for-bit at every SF.
    (s, dir) => graft.operators.Ivf.ivfTopKDeterministicAuto(
      Tables.embeddings(s, dir), "vec_id", "embedding", k = 5))

  /** Matryoshka truncation audit: per vector, L2-norm fraction
    * retained by the first k ∈ {8,16,32} of 64 dimensions. In-row
    * integer micro-unit arithmetic (q157's contract), zero shuffles;
    * see [[graft.operators.Similarity.matryoshkaRetention]]. */
  val q176 = QueryDef.sql("q176_matryoshka_retention",
    """WITH q AS (SELECT vec_id, i AS pos,
      |    CAST(floor(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1000000)
      |      AS BIGINT) AS qx
      |  FROM (SELECT vec_id, embedding,
      |        unnest(range(1, len(embedding) + 1)) AS i FROM embeddings)),
      |s AS (SELECT vec_id, k,
      |    sum(CASE WHEN pos <= k THEN qx * qx ELSE 0 END) AS ssqk,
      |    sum(qx * qx) AS ssq
      |  FROM q CROSS JOIN (SELECT unnest([8, 16, 32]) AS k) ks
      |  GROUP BY vec_id, k)
      |SELECT vec_id, CAST(k AS INT) AS k,
      |  CASE WHEN ssq = 0 THEN NULL
      |       ELSE round(sqrt(CAST(ssqk AS DOUBLE)) / sqrt(CAST(ssq AS DOUBLE)),
      |                  6) END AS retained_norm
      |FROM s""")(
    (s, dir) => Similarity.matryoshkaRetention(
      Tables.embeddings(s, dir), "vec_id", "embedding", ks = Seq(8, 16, 32)))

  /** One deterministic Lloyd step over the embedding corpus (64
    * hash-sampled seeds, micro-unit integer distances, exact argmin,
    * integer centroid sums) — hash-checked k-means, see
    * [[graft.operators.Ivf.kmeansStepDeterministic]]. */
  val q187 = QueryDef.sql("q187_kmeans_step",
    """WITH q AS (SELECT vec_id AS id,
      |    list_transform(embedding,
      |      x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
      |  FROM embeddings),
      |r AS (SELECT id, qv,
      |    row_number() OVER (ORDER BY md5(CAST(id AS VARCHAR)), id) - 1 AS rk
      |  FROM q),
      |cent AS (SELECT rk AS cidx, qv AS cv FROM r WHERE rk < 64),
      |d AS (SELECT q.id, c.cidx,
      |    (SELECT sum((q.qv[CAST(j + 1 AS INT)] - c.cv[CAST(j + 1 AS INT)])
      |              * (q.qv[CAST(j + 1 AS INT)] - c.cv[CAST(j + 1 AS INT)]))
      |     FROM unnest(range(len(q.qv))) t(j)) AS dist
      |  FROM q CROSS JOIN cent c),
      |a AS (SELECT id, cidx FROM (
      |    SELECT id, cidx,
      |      row_number() OVER (PARTITION BY id ORDER BY dist, cidx) AS rn
      |    FROM d) WHERE rn = 1),
      |e AS (SELECT a.cidx AS cluster, CAST(j AS INT) AS dim_idx,
      |    q.qv[CAST(j + 1 AS INT)] AS qx
      |  FROM a JOIN q USING (id), unnest(range(len(q.qv))) t(j))
      |SELECT CAST(cluster AS INT) AS cluster, dim_idx,
      |  CAST(count(*) AS BIGINT) AS n_members,
      |  CAST(CAST(sum(qx) AS BIGINT) // count(*) AS BIGINT) AS dim_mean_micro
      |FROM e GROUP BY 1, 2""")(
    (s, dir) => graft.operators.Ivf.kmeansStepDeterministic(
      Tables.embeddings(s, dir), "vec_id", "embedding", k = 64))

  /** Held-out kNN label-prediction accuracy — the end-to-end quality
    * number for the embedding space itself (q216 scores a ranking
    * against graded labels; this scores the SPACE against class
    * labels). Split is deterministic and leakage-free (q168's stance):
    * vec_id % 50 = 0 becomes the query set, the rest the corpus; each
    * query takes its 10 nearest corpus neighbours (exact brute force —
    * the same [[graft.operators.Similarity.retrieveTopK]] the ANN
    * paths are recalled against) and predicts by majority vote with
    * (count DESC, label ASC) integer tie-break. Per-label accuracy in
    * floor-ppm. At corpus scale the candidate stream swaps for the IVF/
    * LSH prefilter; the brute-force eval subset (2% of vectors) is the
    * standing harness. */
  val q231 = QueryDef.sql("q231_knn_label_eval",
    """WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v, label
      |  FROM embeddings),
      |n AS (SELECT id, v, label, sqrt(list_dot_product(v, v)) AS nrm
      |  FROM v),
      |q AS (SELECT * FROM n WHERE id % 50 = 0),
      |c AS (SELECT * FROM n WHERE id % 50 <> 0),
      |p AS (SELECT q.id AS id_a, q.label AS label_a, c.id AS id_b,
      |    c.label AS label_b,
      |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cosine
      |  FROM q, c),
      |r AS (SELECT id_a, label_a, label_b,
      |    row_number() OVER (PARTITION BY id_a
      |      ORDER BY cosine DESC, id_b) AS rnk
      |  FROM p),
      |votes AS (SELECT id_a, label_a, label_b, count(*) AS cnt
      |  FROM r WHERE rnk <= 10 GROUP BY 1, 2, 3),
      |pred AS (SELECT id_a, label_a, label_b AS predicted
      |  FROM (SELECT *, row_number() OVER (PARTITION BY id_a
      |      ORDER BY cnt DESC, label_b) AS vr FROM votes)
      |  WHERE vr = 1)
      |SELECT CAST(label_a AS INT) AS label,
      |  CAST(count(*) AS BIGINT) AS n_queries,
      |  CAST(sum(CASE WHEN predicted = label_a THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_correct,
      |  CAST(floor(sum(CASE WHEN predicted = label_a THEN 1 ELSE 0 END)
      |    * 1000000.0 / count(*)) AS BIGINT) AS acc_ppm
      |FROM pred GROUP BY 1""")(
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val queries = emb.where(col("vec_id") % 50 === 0)
      val corpus = emb.where(col("vec_id") % 50 =!= 0)
      val labels = emb.select(col("vec_id"), col("label"))
      val nn = Similarity.retrieveTopK(corpus, queries,
          "vec_id", "embedding", k = 10)
        .select("id_a", "id_b")
      val votes = nn
        .join(broadcast(labels.toDF("id_b", "label_b")), "id_b")
        .groupBy("id_a", "label_b").agg(count(lit(1)).as("cnt"))
      val pred = votes.withColumn("vr", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("id_a")
            .orderBy(col("cnt").desc, col("label_b"))))
        .where(col("vr") === 1)
        .select(col("id_a"), col("label_b").as("predicted"))
      pred.join(broadcast(labels.toDF("id_a", "label_a")), "id_a")
        .groupBy(col("label_a").as("label"))
        .agg(count(lit(1)).as("n_queries"),
          sum(when(col("predicted") === col("label_a"), 1L).otherwise(0L))
            .as("n_correct"))
        .select(col("label"), col("n_queries"), col("n_correct"),
          floor(col("n_correct") * lit(1000000.0) / col("n_queries"))
            .cast("long").as("acc_ppm"))
    })

  /** Label confusability matrix — pairwise cosine between label
    * centroids, the "which classes need more training data" read-out
    * (confusable label pairs are where q98's hard negatives live).
    * Centroids stay EXACT integer sums of q128's µ-quantized
    * components (cosine is scale-invariant, so the per-label count
    * never needs to divide anything — the mean drops out); dot and
    * norm² are integer aggregates, the single double appears in the
    * final dot/√·√ and ships rounded. The whole matrix is
    * |labels|²/2 rows computed from a |labels|×dim frame — fact-scale
    * work is ONE quantize+sum pass. */
  val q242 = QueryDef.sql("q242_label_confusability",
    """WITH q AS (SELECT label, pos,
      |    CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS qx
      |  FROM (SELECT label, unnest(embedding) AS x,
      |          unnest(range(len(embedding))) AS pos FROM embeddings)),
      |cen AS (SELECT label, pos, CAST(sum(qx) AS BIGINT) AS s
      |  FROM q GROUP BY 1, 2),
      |nrm AS (SELECT label, CAST(sum(s * s) AS BIGINT) AS n2
      |  FROM cen GROUP BY 1),
      |dots AS (SELECT a.label AS label_a, b.label AS label_b,
      |    CAST(sum(a.s * b.s) AS BIGINT) AS dp
      |  FROM cen a JOIN cen b ON a.pos = b.pos AND a.label < b.label
      |  GROUP BY 1, 2),
      |sc AS (SELECT d.label_a, d.label_b,
      |    CAST(d.dp AS DOUBLE) /
      |      (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
      |      AS cosine
      |  FROM dots d JOIN nrm na ON d.label_a = na.label
      |              JOIN nrm nb ON d.label_b = nb.label)
      |SELECT CAST(label_a AS INT) AS label_a,
      |  CAST(label_b AS INT) AS label_b,
      |  round(cosine, 6) AS confusability,
      |  CAST(row_number() OVER (ORDER BY cosine DESC, label_a, label_b)
      |    AS BIGINT) AS rk
      |FROM sc""")(
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val q = Tables.embeddings(s, dir)
        .select(col("label"), posexplode(col("embedding"))
          .as(Seq("pos", "x")))
        .select(col("label"), col("pos"),
          floor(col("x").cast("double") * 1000000).cast("long").as("qx"))
      val cen = q.groupBy("label", "pos").agg(sum("qx").as("s")).cache()
      val nrm = cen.groupBy("label").agg(sum(col("s") * col("s")).as("n2"))
      val dots = cen.toDF("la", "pos", "sa")
        .join(cen.toDF("lb", "pos", "sb"), "pos")
        .where(col("la") < col("lb"))
        .groupBy("la", "lb").agg(sum(col("sa") * col("sb")).as("dp"))
      val sc = dots
        .join(broadcast(nrm.toDF("la", "n2a")), "la")
        .join(broadcast(nrm.toDF("lb", "n2b")), "lb")
        .select(col("la"), col("lb"),
          (col("dp").cast("double") /
            (sqrt(col("n2a").cast("double")) *
              sqrt(col("n2b").cast("double")))).as("cosine"))
      // |labels|²/2 frame — bounded global window (q209 stance)
      sc.select(col("la").cast("int").as("label_a"),
          col("lb").cast("int").as("label_b"),
          round(col("cosine"), 6).as("confusability"),
          row_number().over(Window.orderBy(col("cosine").desc,
            col("la"), col("lb"))).cast("long").as("rk"))
    })

  /** q262's oracle: the Gonzalez rounds as chained MATERIALIZED CTEs
    * (p_r picks the farthest point, d_r folds the new center into the
    * running min-distance) — materialized because DuckDB re-inlines
    * CTEs and a self-referencing chain explodes exponentially (the
    * q239 lesson). Distances are integer squared-L2 over the q60
    * int8 codes, dim pinned at 64 (range(1, 65)). */
  private val kCenterOracle: String = {
    def dist(a: String, b: String): String =
      s"CAST(list_sum(list_transform(range(1, 65), " +
        s"i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))) AS BIGINT)"
    val sb = new StringBuilder
    sb ++= "WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v" +
      " FROM embeddings),\n"
    sb ++= "n AS (SELECT id, v, sqrt(list_dot_product(v, v)) AS nrm" +
      " FROM v),\n"
    sb ++= "q AS MATERIALIZED (SELECT id, list_transform(v," +
      " x -> CASE WHEN nrm = 0 THEN CAST(0 AS BIGINT)" +
      " ELSE CAST(floor(x / nrm * 127.0 + 0.5) AS BIGINT) END) AS qv" +
      " FROM n),\n"
    sb ++= "p1 AS (SELECT id AS cid, qv AS cqv FROM q" +
      " WHERE id = (SELECT min(id) FROM q)),\n"
    sb ++= s"d1 AS MATERIALIZED (SELECT q.id, q.qv," +
      s" ${dist("q.qv", "p1.cqv")} AS dm FROM q, p1),\n"
    for (r <- 2 to 8) {
      sb ++= s"p$r AS (SELECT id AS cid, qv AS cqv, dm FROM d${r - 1}" +
        s" ORDER BY dm DESC, id LIMIT 1),\n"
      if (r < 8)
        sb ++= s"d$r AS MATERIALIZED (SELECT d.id, d.qv, least(d.dm," +
          s" ${dist("d.qv", s"p$r.cqv")}) AS dm" +
          s" FROM d${r - 1} d, p$r),\n"
    }
    sb ++= "sel AS (SELECT CAST(1 AS BIGINT) AS rk, cid AS center_id," +
      " CAST(0 AS BIGINT) AS d2_at_pick FROM p1"
    for (r <- 2 to 8)
      sb ++= s" UNION ALL SELECT CAST($r AS BIGINT), cid, dm FROM p$r"
    sb ++= ")\nSELECT rk, center_id, d2_at_pick FROM sel"
    sb.toString
  }

  /** Greedy k-center (Gonzalez) diversity coreset over the int8-
    * quantized embeddings — 8 centers, each round picking the point
    * farthest from the chosen set (exact integer distances, ties by
    * id). See [[graft.operators.Similarity.kCenterGonzalez]]. */
  val q262 = QueryDef.sql("q262_kcenter_diversity", kCenterOracle)(
    (s, dir) => Similarity.kCenterGonzalez(
      Tables.embeddings(s, dir), "vec_id", "embedding", k = 8))

  /** Active-learning batch selection by vote margin: the q231 kNN
    * machinery (10 exact-cosine neighbours vote a label for each
    * held-out query point), then the 20 query points with the
    * SMALLEST top-1 − top-2 vote margin — the least-confident items,
    * the ones a labeling budget buys the most from. Votes are
    * integers, so margins and the selection order are exact. */
  val q263 = QueryDef.sql("q263_margin_sampling",
    """WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v, label
      |  FROM embeddings),
      |n AS (SELECT id, v, label, sqrt(list_dot_product(v, v)) AS nrm
      |  FROM v),
      |q AS (SELECT * FROM n WHERE id % 50 = 0),
      |c AS (SELECT * FROM n WHERE id % 50 <> 0),
      |p AS (SELECT q.id AS id_a, c.id AS id_b, c.label AS label_b,
      |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cosine
      |  FROM q, c),
      |r AS (SELECT id_a, label_b,
      |    row_number() OVER (PARTITION BY id_a
      |      ORDER BY cosine DESC, id_b) AS rnk
      |  FROM p),
      |votes AS (SELECT id_a, label_b, count(*) AS cnt
      |  FROM r WHERE rnk <= 10 GROUP BY 1, 2),
      |m AS (SELECT id_a,
      |    max(CASE WHEN vr = 1 THEN label_b END) AS top_label,
      |    max(CASE WHEN vr = 1 THEN cnt END) AS c1,
      |    coalesce(max(CASE WHEN vr = 2 THEN cnt END), 0) AS c2
      |  FROM (SELECT *, row_number() OVER (PARTITION BY id_a
      |      ORDER BY cnt DESC, label_b) AS vr FROM votes)
      |  GROUP BY 1)
      |SELECT id_a, top_label, margin, rk FROM (
      |  SELECT id_a, CAST(top_label AS INT) AS top_label,
      |    CAST(c1 - c2 AS BIGINT) AS margin,
      |    CAST(row_number() OVER (ORDER BY c1 - c2 ASC, id_a)
      |      AS BIGINT) AS rk
      |  FROM m) WHERE rk <= 20""")(
    (s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val emb = Tables.embeddings(s, dir)
      val queries = emb.where(col("vec_id") % 50 === 0)
      val corpus = emb.where(col("vec_id") % 50 =!= 0)
      val labels = emb.select(col("vec_id"), col("label"))
      val votes = Similarity.retrieveTopK(corpus, queries,
          "vec_id", "embedding", k = 10)
        .select("id_a", "id_b")
        .join(broadcast(labels.toDF("id_b", "label_b")), "id_b")
        .groupBy("id_a", "label_b").agg(count(lit(1)).as("cnt"))
      val m = votes.withColumn("vr", row_number().over(
          W.partitionBy("id_a").orderBy(col("cnt").desc, col("label_b"))))
        .groupBy("id_a").agg(
          max(when(col("vr") === 1, col("label_b"))).as("top_label"),
          max(when(col("vr") === 1, col("cnt"))).as("c1"),
          coalesce(max(when(col("vr") === 2, col("cnt"))), lit(0L))
            .as("c2"))
      m.select(col("id_a"), col("top_label").cast("int").as("top_label"),
          (col("c1") - col("c2")).as("margin"))
        .withColumn("rk", row_number().over(
          W.orderBy(col("margin").asc, col("id_a"))).cast("long"))
        .where(col("rk") <= 20)
        .select(col("id_a"), col("top_label"), col("margin"), col("rk"))
    })

  /** q264's oracle: the six power-iteration rounds as chained
    * MATERIALIZED CTEs (u = Xv per row, w = Xᵀu per dim, then the
    * shifted non-negative integer rescale — see
    * [[graft.operators.Similarity.pcaTopComponent]] for why the shift
    * makes floor-div engine-portable). v is carried as (d, val) rows;
    * dims are 1-based internally and shipped 0-based. */
  private val pcaOracle: String = {
    val iters = 6
    val sb = new StringBuilder
    sb ++= "WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v" +
      " FROM embeddings),\n"
    sb ++= "n AS (SELECT id, v, sqrt(list_dot_product(v, v)) AS nrm" +
      " FROM v),\n"
    sb ++= "q AS MATERIALIZED (SELECT id, list_transform(v," +
      " x -> CASE WHEN nrm = 0 THEN CAST(0 AS BIGINT)" +
      " ELSE CAST(floor(x / nrm * 127.0 + 0.5) AS BIGINT) END) AS qv" +
      " FROM n),\n"
    sb ++= "dims AS (SELECT unnest(range(1, 65)) AS d),\n"
    sb ++= "v0 AS (SELECT d, CAST(1000 AS BIGINT) AS vv FROM dims),\n"
    for (t <- 1 to iters) {
      sb ++= s"u$t AS MATERIALIZED (SELECT q.id," +
        s" CAST(sum(q.qv[v.d] * v.vv) AS BIGINT) AS u" +
        s" FROM q, v${t - 1} v GROUP BY 1),\n"
      sb ++= s"w$t AS MATERIALIZED (SELECT dims.d," +
        s" CAST(sum(q.qv[dims.d] * u.u) AS BIGINT) AS w" +
        s" FROM q JOIN u$t u ON q.id = u.id, dims GROUP BY 1),\n"
      sb ++= s"m$t AS (SELECT max(abs(w)) AS wmax," +
        s" greatest(max(abs(w)) // 1000000, 1) AS m FROM w$t),\n"
      sb ++= s"v$t AS MATERIALIZED (SELECT w.d," +
        s" ((w.w + m.wmax) // m.m) - (m.wmax // m.m) AS vv" +
        s" FROM w$t w, m$t m),\n"
    }
    sb ++= s"sel AS (SELECT CAST(d - 1 AS BIGINT) AS dim," +
      s" CAST(vv AS BIGINT) AS v_comp FROM v$iters" +
      s" UNION ALL SELECT CAST(-1 AS BIGINT), wmax FROM m$iters)\n"
    sb ++= "SELECT dim, v_comp FROM sel"
    sb.toString
  }

  /** Top principal component of the quantized embedding matrix by
    * integer power iteration (6 rounds) — dims 0–63 carry the final
    * direction iterate, dim −1 the last |XᵀXv|∞ scale (the unnormalized
    * eigenvalue signal). */
  val q264 = QueryDef.sql("q264_pca_power", pcaOracle)(
    (s, dir) => Similarity.pcaTopComponent(
      Tables.embeddings(s, dir), "vec_id", "embedding", iters = 6))

  /** Johnson–Lindenstrauss distortion audit of the q34 hyperplane
    * family: project the int8 codes through 16 md5-derived ±1 planes
    * and histogram the pairwise distortion ‖Pa−Pb‖²/(16·‖a−b‖²)
    * (expectation exactly 1 for ±1 planes) over a deterministic
    * sample. Everything integer — projections are ±1 dot products of
    * int8 codes, ratios floor-ppm — so the distortion histogram
    * replays exactly. The audit that justifies ANN bit budgets: how
    * much of the metric survives 64 → 16 dimensions. */
  val q280 = QueryDef.sql("q280_jl_distortion",
    """WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
      |  FROM embeddings WHERE vec_id % 20 = 0),
      |n AS (SELECT id, v, sqrt(list_dot_product(v, v)) AS nrm FROM v),
      |q AS MATERIALIZED (SELECT id, list_transform(v,
      |    x -> CASE WHEN nrm = 0 THEN CAST(0 AS BIGINT)
      |    ELSE CAST(floor(x / nrm * 127.0 + 0.5) AS BIGINT) END) AS qv
      |  FROM n),
      |signs AS (SELECT p, list(CASE WHEN strpos('89abcdef',
      |      substr(md5(p || ':' || d), 1, 1)) > 0
      |    THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END
      |    ORDER BY d) AS sv
      |  FROM range(0, 16) t1(p), range(0, 64) t2(d) GROUP BY p),
      |pr AS MATERIALIZED (SELECT q.id, list(CAST(list_sum(
      |    list_transform(range(1, 65), i -> q.qv[i] * s.sv[i]))
      |    AS BIGINT) ORDER BY s.p) AS pv
      |  FROM q CROSS JOIN signs s GROUP BY q.id),
      |pairs AS (SELECT a.id AS ia, b.id AS ib,
      |    CAST(list_sum(list_transform(range(1, 65),
      |      i -> (qa.qv[i] - qb.qv[i]) * (qa.qv[i] - qb.qv[i])))
      |      AS BIGINT) AS d64,
      |    CAST(list_sum(list_transform(range(1, 17),
      |      j -> (a.pv[j] - b.pv[j]) * (a.pv[j] - b.pv[j])))
      |      AS BIGINT) AS dp
      |  FROM pr a JOIN pr b ON a.id < b.id
      |  JOIN q qa ON qa.id = a.id JOIN q qb ON qb.id = b.id),
      |r AS (SELECT (dp * 1000000) // (16 * d64) AS ratio_ppm
      |  FROM pairs WHERE d64 > 0)
      |SELECT CAST(ratio_ppm // 200000 AS BIGINT) AS bucket,
      |  CAST(count(*) AS BIGINT) AS n_pairs,
      |  CAST(min(ratio_ppm) AS BIGINT) AS lo_ppm,
      |  CAST(max(ratio_ppm) AS BIGINT) AS hi_ppm
      |FROM r GROUP BY 1""")(
    (s, dir) => {
      import org.apache.spark.sql.functions.{aggregate => fold, _}
      val signs: Seq[Seq[Long]] = (0 until 16).map(p =>
        (0 until 64).map(d => Similarity.planeSign(p, d).toLong))
      val q = Tables.embeddings(s, dir)
        .where(col("vec_id") % 20 === 0)
        .select(col("vec_id").as("id"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
        .withColumn("nrm", sqrt(graft.functions.VectorExpressions
          .dotNative(col("v"), col("v"))))
        .select(col("id"),
          when(col("nrm") === 0, transform(col("v"), _ => lit(0L)))
            .otherwise(transform(col("v"),
              x => floor(x / col("nrm") * 127.0 + 0.5).cast("long")))
            .as("qv"))
        .withColumn("pv", transform(typedlit(signs), pl =>
          fold(zip_with(col("qv"), pl, (x, y) => x * y), lit(0L),
            (a, x) => a + x)))
      def d2(a: String, b: String) =
        fold(zip_with(col(a), col(b), (x, y) => (x - y) * (x - y)),
          lit(0L), (acc, x) => acc + x)
      val pa = q.toDF("ia", "qva", "pva")
      val pb = q.toDF("ib", "qvb", "pvb")
      pa.join(broadcast(pb), col("ia") < col("ib"))
        .select(d2("qva", "qvb").as("d64"), d2("pva", "pvb").as("dp"))
        .where(col("d64") > 0)
        .select(expr("(dp * 1000000) DIV (16 * d64)").as("ratio_ppm"))
        .groupBy(expr("ratio_ppm DIV 200000").as("bucket"))
        .agg(count(lit(1)).as("n_pairs"),
          min("ratio_ppm").as("lo_ppm"), max("ratio_ppm").as("hi_ppm"))
    })

  /** Cluster-separation audit over the labeled embedding corpus — a
    * Davies–Bouldin-shaped compactness/separation report with NO
    * sqrt: per label, the mean SQUARED distance of members to their
    * centroid (intra) and the squared distance to the nearest other
    * centroid (inter), with scatter_ppm = 1e6 * intra / inter (< 1e6
    * means the cluster is tighter than its nearest neighbor is
    * close). Everything exact: elements floor-quantized to micro
    * units (the q157 contract), centroids as signed floor-means
    * (portable floor-div — embeddings are signed), squared distances
    * in BIGINT. Scale shape: one (label, dim) centroid aggregate →
    * one member-vs-own-centroid join keyed (label, dim) → one
    * |labels|^2 centroid cross on a 10-row frame. The E[x^2]-style
    * one-pass alternative would square micro sums past BIGINT; the
    * two-pass shape is also the one that streams (centroids are the
    * maintained state). */
  val q295 = QueryDef.sql("q295_cluster_scatter",
    """WITH q0 AS (SELECT vec_id, label,
      |    unnest(list_transform(range(1, len(embedding) + 1),
      |      i -> struct_pack(dim := i,
      |        qx := CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000)
      |          AS BIGINT)))) AS u
      |  FROM embeddings),
      |q AS (SELECT vec_id, label, u.dim AS dim, u.qx AS qx FROM q0),
      |c AS (SELECT label, dim,
      |    CAST(count(*) AS BIGINT) AS n, CAST(sum(qx) AS BIGINT) AS sx
      |  FROM q GROUP BY 1, 2),
      |cen AS (SELECT label, dim,
      |    (CASE WHEN sx >= 0 THEN sx // n
      |      ELSE -((-sx + n - 1) // n) END) AS cm
      |  FROM c),
      |intra AS (SELECT q.label, CAST(count(DISTINCT q.vec_id) AS BIGINT)
      |      AS n_vecs,
      |    CAST(sum((q.qx - cen.cm) * (q.qx - cen.cm)) AS BIGINT) AS ss
      |  FROM q JOIN cen ON q.label = cen.label AND q.dim = cen.dim
      |  GROUP BY 1),
      |pairs AS (SELECT a.label AS la, b.label AS lb,
      |    CAST(sum((a.cm - b.cm) * (a.cm - b.cm)) AS BIGINT) AS d2
      |  FROM cen a JOIN cen b
      |    ON a.dim = b.dim AND a.label <> b.label
      |  GROUP BY 1, 2),
      |nn AS (SELECT la AS label, lb AS nearest_label, d2,
      |    row_number() OVER (PARTITION BY la ORDER BY d2, lb) AS rk
      |  FROM pairs)
      |SELECT i.label, i.n_vecs, i.ss // i.n_vecs AS intra_msd,
      |  CAST(nn.nearest_label AS BIGINT) AS nearest_label,
      |  nn.d2 AS inter_d2,
      |  ((i.ss // i.n_vecs) * 1000000) // nn.d2 AS scatter_ppm
      |FROM intra i JOIN nn ON i.label = nn.label AND nn.rk = 1""")(
    (s, dir) => {
      val q = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"),
          posexplode(col("embedding")).as(Seq("p", "x")))
        .select(col("vec_id"), col("label"), (col("p") + 1).as("dim"),
          floor(col("x").cast("double") * 1000000).cast("long")
            .as("qx"))
      val cen = q.groupBy("label", "dim")
        .agg(count(lit(1)).as("n"), sum("qx").as("sx"))
        .select(col("label"), col("dim"),
          expr("CASE WHEN sx >= 0 THEN sx DIV n" +
            " ELSE -((-sx + n - 1) DIV n) END").as("cm"))
      val intra = q.join(broadcast(cen), Seq("label", "dim"))
        .groupBy("label")
        .agg(countDistinct(col("vec_id")).as("n_vecs"),
          sum((col("qx") - col("cm")) * (col("qx") - col("cm")))
            .as("ss"))
      val a = cen.toDF("la", "dim", "ca")
      val b = cen.toDF("lb", "dim", "cb")
      val pairs = a.join(b, Seq("dim")).where(col("la") =!= col("lb"))
        .groupBy("la", "lb")
        .agg(sum((col("ca") - col("cb")) * (col("ca") - col("cb")))
          .as("d2"))
      val nn = pairs.withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("la")
            .orderBy(col("d2"), col("lb"))))
        .where(col("rk") === 1)
        .select(col("la").as("label"),
          col("lb").cast("long").as("nearest_label"),
          col("d2").as("inter_d2"))
      intra.join(broadcast(nn), "label")
        .select(col("label"), col("n_vecs"),
          expr("ss DIV n_vecs").as("intra_msd"),
          col("nearest_label"), col("inter_d2"),
          expr("((ss DIV n_vecs) * 1000000) DIV inter_d2")
            .as("scatter_ppm"))
    })

  /** Product-quantization encode audit ([[graft.operators.Pq]]): code
    * usage + summed distortion per (subquantizer, codeword) — 64 dims
    * → 8 subvectors × 16-codeword codebooks on the shared milli-unit
    * lattice, codebook = the 16 lowest-id vectors, argmin ties to the
    * lowest code. Encoding is one broadcast-join pass with map-side
    * argmin; the oracle replays codes and distances bit-for-bit in
    * exact integer L2². */
  val q317 = QueryDef.sql("q317_pq_codes",
    """WITH v AS (SELECT CAST(vec_id AS BIGINT) AS id,
      |    list_transform(embedding::DOUBLE[],
      |                   x -> CAST(floor(x*1000) AS BIGINT)) AS v
      |  FROM embeddings),
      |cb0 AS (SELECT id, v FROM v ORDER BY id LIMIT 16),
      |cb AS (SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS INT)
      |         AS code, v FROM cb0),
      |ms AS (SELECT CAST(unnest(range(0, 8)) AS INT) AS m),
      |cbs AS (SELECT m, code, list_slice(v, m*8 + 1, m*8 + 8) AS cw
      |        FROM cb, ms),
      |vs AS (SELECT id, m, list_slice(v, m*8 + 1, m*8 + 8) AS sub
      |       FROM v, ms),
      |d AS (SELECT vs.id, vs.m, cbs.code,
      |    CAST(list_sum(list_transform(range(1, 9),
      |      i -> (sub[CAST(i AS INT)] - cw[CAST(i AS INT)])
      |         * (sub[CAST(i AS INT)] - cw[CAST(i AS INT)]))) AS BIGINT)
      |      AS dist2
      |  FROM vs JOIN cbs USING (m)),
      |enc AS (SELECT id, m, code, dist2,
      |    row_number() OVER (PARTITION BY id, m
      |                       ORDER BY dist2, code) AS rn FROM d)
      |SELECT m, code, count(*) AS n_vecs, CAST(sum(dist2) AS BIGINT)
      |  AS dist_sum
      |FROM enc WHERE rn = 1 GROUP BY m, code""")(
    (s, dir) => graft.operators.Pq.codeStats(Tables.embeddings(s, dir),
      "vec_id", "embedding"))

  /** PQ ADC serving ([[graft.operators.Pq.adcTopK]]): queries (every
    * 250th vector) look up exact subvector-to-codeword distances in a
    * broadcast LUT and rank the encoded corpus by Σ_m lut[m][code] —
    * the table-lookup scan that serves billion-vector indexes. Top-5
    * per query, (adc ASC, id ASC) ties, self excluded; shuffle carries
    * q·k rows after the bounded top-k aggregate, never the corpus. */
  val q318 = QueryDef.sql("q318_pq_adc_topk",
    """WITH v AS (SELECT CAST(vec_id AS BIGINT) AS id,
      |    list_transform(embedding::DOUBLE[],
      |                   x -> CAST(floor(x*1000) AS BIGINT)) AS v
      |  FROM embeddings),
      |cb0 AS (SELECT id, v FROM v ORDER BY id LIMIT 16),
      |cb AS (SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS INT)
      |         AS code, v FROM cb0),
      |ms AS (SELECT CAST(unnest(range(0, 8)) AS INT) AS m),
      |cbs AS (SELECT m, code, list_slice(v, m*8 + 1, m*8 + 8) AS cw
      |        FROM cb, ms),
      |vs AS (SELECT id, m, list_slice(v, m*8 + 1, m*8 + 8) AS sub
      |       FROM v, ms),
      |d AS (SELECT vs.id, vs.m, cbs.code,
      |    CAST(list_sum(list_transform(range(1, 9),
      |      i -> (sub[CAST(i AS INT)] - cw[CAST(i AS INT)])
      |         * (sub[CAST(i AS INT)] - cw[CAST(i AS INT)]))) AS BIGINT)
      |      AS dist2
      |  FROM vs JOIN cbs USING (m)),
      |enc AS (SELECT id, m, code FROM (
      |    SELECT id, m, code, row_number() OVER (PARTITION BY id, m
      |        ORDER BY dist2, code) AS rn FROM d) WHERE rn = 1),
      |lut AS (SELECT id AS id_a, m, code, dist2 AS lut FROM d
      |        WHERE id % 250 = 7),
      |adc AS (SELECT lut.id_a, e.id AS id_b,
      |          CAST(sum(lut.lut) AS BIGINT) AS adc
      |        FROM enc e JOIN lut ON e.m = lut.m AND e.code = lut.code
      |          AND e.id <> lut.id_a
      |        GROUP BY 1, 2),
      |r AS (SELECT id_a, id_b, adc, row_number() OVER (PARTITION BY id_a
      |        ORDER BY adc, id_b) AS rnk FROM adc)
      |SELECT id_a, id_b, adc AS adc_dist2, CAST(rnk AS INT) AS rnk
      |FROM r WHERE rnk <= 5""")(
    (s, dir) => graft.operators.Pq.adcTopK(Tables.embeddings(s, dir),
      "vec_id", "embedding", queryPred = pmod(col("vec_id"), lit(250)) === 7,
      k = 5))

  /** Mutual-kNN graph degrees: edge (a, b) iff each is in the other's
    * exact cosine top-5 — the symmetric neighbourhood graph embedding
    * curation builds for density/outlier analysis (an isolated vector
    * has degree 0 even though kNN always returns 5 rows). Rides the
    * blocked exact top-k kernel (q32/q55's plan — block pairs, bounded
    * per-block emission), then one n·k self-join on the (a, b) pair
    * and a degree count; the oracle replays top-5 sets and the mutual
    * intersection exactly (shared fold order ⇒ identical sets). */
  val q321 = QueryDef.sql("q321_mutual_knn",
    """WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
      |n AS (SELECT id, v, sqrt(list_dot_product(v, v)) AS nrm FROM v),
      |p AS (SELECT a.id AS id_a, b.id AS id_b,
      |        list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cosine
      |      FROM n a JOIN n b ON a.id <> b.id),
      |r AS (SELECT id_a, id_b FROM (SELECT id_a, id_b,
      |        row_number() OVER (PARTITION BY id_a
      |                           ORDER BY cosine DESC, id_b) AS rnk
      |      FROM p) WHERE rnk <= 5),
      |m AS (SELECT x.id_a AS u, x.id_b AS w FROM r x JOIN r y
      |      ON x.id_a = y.id_b AND x.id_b = y.id_a AND x.id_a < x.id_b),
      |deg AS (SELECT id, CAST(count(*) AS BIGINT) AS deg FROM (
      |    SELECT u AS id FROM m UNION ALL SELECT w AS id FROM m)
      |  GROUP BY id)
      |SELECT e.vec_id, COALESCE(deg.deg, CAST(0 AS BIGINT))
      |  AS mutual_degree
      |FROM embeddings e LEFT JOIN deg ON e.vec_id = deg.id""")(
    (s, dir) => {
      val top = Similarity.cosineTopKBlocked(Tables.embeddings(s, dir),
          "vec_id", "embedding", k = 5)
        .select(col("id_a"), col("id_b"))
      val mutual = top.as("x").join(top.as("y"),
          col("x.id_a") === col("y.id_b") && col("x.id_b") === col("y.id_a")
            && col("x.id_a") < col("x.id_b"))
        .select(col("x.id_a").as("u"), col("x.id_b").as("v"))
      val deg = mutual.select(col("u").as("id"))
        .unionAll(mutual.select(col("v").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
      Tables.embeddings(s, dir).select(col("vec_id"))
        .join(deg, col("vec_id") === col("id"), "left")
        .select(col("vec_id"),
          coalesce(col("deg"), lit(0L)).as("mutual_degree"))
    })

  /** IVF-PQ residual encoding ([[graft.operators.Pq.ivfPqCodeStats]]):
    * each vector's deterministic IVF cell (q160's md5-sampled
    * assignment) plus PQ codes of the RESIDUAL v − mean(cell), the
    * cell centroid being the exact integer milli-lattice mean — the
    * storage layout of billion-scale quantized indexes, with every
    * step (assignment, means, residuals, codes) replaying
    * bit-for-bit. */
  val q325 = QueryDef.sql("q325_ivfpq_codes",
    """WITH v AS (SELECT CAST(vec_id AS BIGINT) AS id, embedding::DOUBLE[]
      |    AS v FROM embeddings),
      |n AS (SELECT id, v, list_dot_product(v, v) AS vn2 FROM v),
      |cent AS (SELECT row_number() OVER (ORDER BY md5(CAST(id AS VARCHAR)),
      |           id) - 1 AS cell, v AS cv, list_dot_product(v, v) AS cn2
      |         FROM v ORDER BY md5(CAST(id AS VARCHAR)), id LIMIT 64),
      |dc AS (SELECT n.id, c.cell,
      |         n.vn2 - 2.0::DOUBLE * list_dot_product(n.v, c.cv) + c.cn2
      |           AS d2
      |       FROM n CROSS JOIN cent c),
      |asgn AS (SELECT id, cell FROM (SELECT id, cell,
      |           row_number() OVER (PARTITION BY id ORDER BY d2, cell) AS r
      |         FROM dc) WHERE r = 1),
      |vm AS (SELECT v.id, a.cell,
      |         list_transform(v.v, x -> CAST(floor(x * 1000.0) AS BIGINT))
      |           AS vm
      |       FROM v JOIN asgn a ON v.id = a.id),
      |mexp AS (SELECT cell, pos, qx FROM (SELECT cell, unnest(vm) AS qx,
      |           unnest(range(len(vm))) AS pos FROM vm)),
      |mm AS (SELECT cell, pos, CAST(sum(qx) AS BIGINT) // count(*) AS cm
      |       FROM mexp GROUP BY 1, 2),
      |cmv AS (SELECT cell, list(cm ORDER BY pos) AS cmv FROM mm
      |        GROUP BY cell),
      |res AS (SELECT vm.id, list_transform(range(1, len(vm.vm) + 1),
      |          i -> vm.vm[CAST(i AS INT)] - c.cmv[CAST(i AS INT)]) AS rv
      |        FROM vm JOIN cmv c ON vm.cell = c.cell),
      |cb0 AS (SELECT id, rv FROM res ORDER BY id LIMIT 16),
      |cb AS (SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS INT)
      |         AS code, rv FROM cb0),
      |ms AS (SELECT CAST(unnest(range(0, 8)) AS INT) AS m),
      |cbs AS (SELECT m, code, list_slice(rv, m*8 + 1, m*8 + 8) AS cw
      |        FROM cb, ms),
      |vs AS (SELECT id, m, list_slice(rv, m*8 + 1, m*8 + 8) AS sub
      |       FROM res, ms),
      |d AS (SELECT vs.id, vs.m, cbs.code,
      |    CAST(list_sum(list_transform(range(1, 9),
      |      i -> (sub[CAST(i AS INT)] - cw[CAST(i AS INT)])
      |         * (sub[CAST(i AS INT)] - cw[CAST(i AS INT)]))) AS BIGINT)
      |      AS dist2
      |  FROM vs JOIN cbs USING (m)),
      |enc AS (SELECT id, m, code, dist2,
      |    row_number() OVER (PARTITION BY id, m
      |                       ORDER BY dist2, code) AS rn FROM d)
      |SELECT m, code, count(*) AS n_vecs, CAST(sum(dist2) AS BIGINT)
      |  AS dist_sum
      |FROM enc WHERE rn = 1 GROUP BY m, code""")(
    (s, dir) => graft.operators.Pq.ivfPqCodeStats(Tables.embeddings(s, dir),
      "vec_id", "embedding"))

  /** Recall@5 of PQ-ADC serving vs the exact cosine top-5
    * ([[graft.operators.Pq.adcRecallAtK]]) — what 8-byte codes cost
    * in recall, per query. The honest-measurement twin of q318. */
  val q326 = QueryDef.sql("q326_pq_recall",
    """WITH v AS (SELECT CAST(vec_id AS BIGINT) AS id,
      |    list_transform(embedding::DOUBLE[],
      |                   x -> CAST(floor(x*1000) AS BIGINT)) AS v
      |  FROM embeddings),
      |cb0 AS (SELECT id, v FROM v ORDER BY id LIMIT 16),
      |cb AS (SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS INT)
      |         AS code, v FROM cb0),
      |ms AS (SELECT CAST(unnest(range(0, 8)) AS INT) AS m),
      |cbs AS (SELECT m, code, list_slice(v, m*8 + 1, m*8 + 8) AS cw
      |        FROM cb, ms),
      |vs AS (SELECT id, m, list_slice(v, m*8 + 1, m*8 + 8) AS sub
      |       FROM v, ms),
      |d AS (SELECT vs.id, vs.m, cbs.code,
      |    CAST(list_sum(list_transform(range(1, 9),
      |      i -> (sub[CAST(i AS INT)] - cw[CAST(i AS INT)])
      |         * (sub[CAST(i AS INT)] - cw[CAST(i AS INT)]))) AS BIGINT)
      |      AS dist2
      |  FROM vs JOIN cbs USING (m)),
      |enc AS (SELECT id, m, code FROM (
      |    SELECT id, m, code, row_number() OVER (PARTITION BY id, m
      |        ORDER BY dist2, code) AS rn FROM d) WHERE rn = 1),
      |lut AS (SELECT id AS id_a, m, code, dist2 AS lut FROM d
      |        WHERE id % 250 = 7),
      |adcd AS (SELECT lut.id_a, e.id AS id_b,
      |          CAST(sum(lut.lut) AS BIGINT) AS adc
      |        FROM enc e JOIN lut ON e.m = lut.m AND e.code = lut.code
      |          AND e.id <> lut.id_a GROUP BY 1, 2),
      |adct AS (SELECT id_a, id_b FROM (SELECT id_a, id_b,
      |        row_number() OVER (PARTITION BY id_a ORDER BY adc, id_b)
      |          AS rnk FROM adcd) WHERE rnk <= 5),
      |fv AS (SELECT vec_id AS id, embedding::DOUBLE[] AS fv
      |       FROM embeddings),
      |fn AS (SELECT id, fv, sqrt(list_dot_product(fv, fv)) AS nrm FROM fv),
      |ext AS (SELECT id_a, id_b FROM (SELECT q.id AS id_a, c.id AS id_b,
      |        row_number() OVER (PARTITION BY q.id ORDER BY
      |          list_dot_product(q.fv, c.fv) / (q.nrm * c.nrm) DESC, c.id)
      |          AS rnk
      |      FROM fn q JOIN fn c ON q.id <> c.id WHERE q.id % 250 = 7)
      |      WHERE rnk <= 5),
      |hits AS (SELECT a.id_a, CAST(count(e.id_b) AS BIGINT) AS hits
      |         FROM adct a LEFT JOIN ext e
      |           ON a.id_a = e.id_a AND a.id_b = e.id_b
      |         GROUP BY 1)
      |SELECT id_a, hits, CAST(hits * 200000 AS BIGINT) AS recall_ppm
      |FROM hits""")(
    (s, dir) => graft.operators.Pq.adcRecallAtK(Tables.embeddings(s, dir),
      "vec_id", "embedding", queryPred = pmod(col("vec_id"), lit(250)) === 7,
      k = 5))

  val all: Seq[QueryDef] = Seq(q32, q33, q34, q55, q60, q61, q65, q98,
    q160, q176, q187, q231, q242, q262, q263, q264, q280, q295, q317,
    q318, q321, q325, q326)
}
