package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift and ranking-evaluation queries — the monitoring
  * battery a production training-data pipeline runs between refreshes:
  * PSI feature drift (the go/no-go number on every model-retrain
  * dashboard), graded-relevance retrieval metrics (nDCG@k / MRR /
  * P@k) for judging an embedding index against labels, and rank-biased
  * overlap for comparing two rankings without labels at all.
  *
  * Scale shape shared by all three: ONE distributed aggregate over the
  * fact table reduces to a bounded frame (buckets × features, query
  * groups, top-k lists); every log/power/division happens on that
  * bounded frame. Integer counts stay exact end-to-end; doubles appear
  * only in final scores, rounded to 6 so 1-ulp libm differences between
  * engines can't flip the hash.
  */
object EvalQueries {

  /** Population-stability-index drift report between the first and
    * second half of the events stream (split at the exact integer
    * midpoint of the µs time range — no calendar arithmetic to
    * disagree on). Two features audited: the categorical event_type
    * mix and the order-of-magnitude bucket of `value` (digit count of
    * the exact µ-scaled integer — a base-10 log bucket with no
    * floating log at bucket boundaries). Add-one smoothing keeps
    * empty buckets finite, so the oracle is total: psi contribution
    * per bucket plus the per-feature total, PSI ≥ 0.2 = "retrain".
    * One scan, one groupBy; the PSI math runs on ≤ (2 features ×
    * buckets) rows. */
  val q215 = QueryDef.sql("q215_psi_drift",
    """WITH m AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2
      |    AS mid FROM events),
      |b AS (SELECT
      |    CASE WHEN epoch_us(ts) < m.mid THEN 0 ELSE 1 END AS cur,
      |    event_type,
      |    length(CAST(GREATEST(
      |      CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT),
      |      1) AS VARCHAR)) AS vbucket
      |  FROM events, m),
      |u AS (SELECT 'event_type' AS feature, event_type AS bucket, cur
      |    FROM b
      |  UNION ALL
      |  SELECT 'value_mag', CAST(vbucket AS VARCHAR), cur FROM b),
      |c AS (SELECT feature, bucket,
      |    CAST(sum(CASE WHEN cur = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_ref,
      |    CAST(sum(cur) AS BIGINT) AS n_cur
      |  FROM u GROUP BY 1, 2),
      |t AS (SELECT feature,
      |    CAST(sum(n_ref) AS BIGINT) AS tot_ref,
      |    CAST(sum(n_cur) AS BIGINT) AS tot_cur,
      |    CAST(count(*) AS BIGINT) AS n_buckets
      |  FROM c GROUP BY 1),
      |p AS (SELECT c.feature, c.bucket, c.n_ref, c.n_cur,
      |    CAST(c.n_ref + 1 AS DOUBLE) / (t.tot_ref + t.n_buckets)
      |      AS p_ref,
      |    CAST(c.n_cur + 1 AS DOUBLE) / (t.tot_cur + t.n_buckets)
      |      AS p_cur
      |  FROM c JOIN t ON c.feature = t.feature)
      |SELECT feature, bucket, n_ref, n_cur,
      |  round((p_cur - p_ref) * ln(p_cur / p_ref), 6) AS psi_term,
      |  round(sum((p_cur - p_ref) * ln(p_cur / p_ref))
      |    OVER (PARTITION BY feature), 6) AS psi_feature
      |FROM p""")(
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val m = ev.agg(((min(unix_micros(col("ts"))) +
        max(unix_micros(col("ts")))) / 2).cast("long").as("mid"))
      val b = ev.crossJoin(broadcast(m)).select(
        when(unix_micros(col("ts")) < col("mid"), 0).otherwise(1).as("cur"),
        col("event_type"),
        length(greatest(
          (col("value").cast("decimal(18,6)") * 1000000).cast("long"),
          lit(1L)).cast("string")).as("vbucket"))
      val u = b.select(lit("event_type").as("feature"),
          col("event_type").as("bucket"), col("cur"))
        .unionByName(b.select(lit("value_mag").as("feature"),
          col("vbucket").cast("string").as("bucket"), col("cur")))
      val c = u.groupBy("feature", "bucket").agg(
        sum(when(col("cur") === 0, 1L).otherwise(0L)).as("n_ref"),
        sum("cur").cast("long").as("n_cur"))
      val t = c.groupBy("feature").agg(
        sum("n_ref").as("tot_ref"), sum("n_cur").as("tot_cur"),
        count(lit(1)).as("n_buckets"))
      val p = c.join(broadcast(t), "feature").select(
        col("feature"), col("bucket"), col("n_ref"), col("n_cur"),
        ((col("n_ref") + 1).cast("double") /
          (col("tot_ref") + col("n_buckets"))).as("p_ref"),
        ((col("n_cur") + 1).cast("double") /
          (col("tot_cur") + col("n_buckets"))).as("p_cur"))
      val term = (col("p_cur") - col("p_ref")) *
        log(col("p_cur") / col("p_ref"))
      p.select(col("feature"), col("bucket"), col("n_ref"), col("n_cur"),
        round(term, 6).as("psi_term"),
        round(sum(term).over(Window.partitionBy("feature")), 6)
          .as("psi_feature"))
    })

  /** Graded-relevance retrieval evaluation — nDCG@10, MRR and P@10 per
    * query group, the table a similarity index (q32/q34/q160) is
    * judged against. Stand-in labels: each brand is a "query", its
    * parts ranked by retail price (the model's score, exact integer
    * cents with partkey tiebreak) and graded by p_size (integer
    * relevance 1–50, "relevant" = size ≥ 40 for MRR/P@k). DCG's
    * log2(position+1) runs over positions 1–10 of an already-ranked
    * ~100-row group — the fact-scale work is only the per-group
    * window sort, which at 100 TB shards by query group. IDCG re-ranks
    * the same group by relevance (tiebreak partkey), so ndcg = 1.0
    * flags a perfectly calibrated score. */
  val q216 = QueryDef.sql("q216_retrieval_eval",
    // mrr is an int/int quotient (1/first_rel) — a 6-decimal tie
    // generator (1/128 = .0078125) — so it ships as exact floor-ppm
    // integer per the q128 rounding stance; ndcg/dcg are log2 sums
    // (tie measure zero) and stay round(…, 6).
    """WITH b AS (SELECT p_brand,
      |    CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS sc,
      |    p_partkey, CAST(p_size AS BIGINT) AS rel
      |  FROM part),
      |r AS (SELECT p_brand, rel,
      |    row_number() OVER (PARTITION BY p_brand
      |      ORDER BY sc DESC, p_partkey) AS pos,
      |    row_number() OVER (PARTITION BY p_brand
      |      ORDER BY rel DESC, p_partkey) AS ipos
      |  FROM b),
      |d AS (SELECT p_brand,
      |    sum(CASE WHEN pos <= 10
      |      THEN rel / log2(CAST(pos + 1 AS DOUBLE)) ELSE 0 END) AS dcg,
      |    sum(CASE WHEN ipos <= 10
      |      THEN rel / log2(CAST(ipos + 1 AS DOUBLE)) ELSE 0 END)
      |      AS idcg,
      |    min(CASE WHEN rel >= 40 THEN pos END) AS first_rel,
      |    CAST(sum(CASE WHEN pos <= 10 AND rel >= 40 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS hits10
      |  FROM r GROUP BY 1)
      |SELECT p_brand AS query_group,
      |  round(dcg / idcg, 6) AS ndcg10,
      |  CAST(CASE WHEN first_rel IS NULL THEN 0
      |    ELSE floor(1000000.0 / first_rel) END AS BIGINT) AS mrr_ppm,
      |  round(hits10 / 10.0, 6) AS p_at_10
      |FROM d""")(
    (s, dir) => {
      val b = Tables.part(s, dir).select(col("p_brand"),
        (col("p_retailprice").cast("decimal(18,2)") * 100).cast("long")
          .as("sc"),
        col("p_partkey"), col("p_size").cast("long").as("rel"))
      val wSc = Window.partitionBy("p_brand")
        .orderBy(col("sc").desc, col("p_partkey"))
      val wRel = Window.partitionBy("p_brand")
        .orderBy(col("rel").desc, col("p_partkey"))
      val r = b.select(col("p_brand"), col("rel"),
        row_number().over(wSc).as("pos"),
        row_number().over(wRel).as("ipos"))
      val d = r.groupBy("p_brand").agg(
        sum(when(col("pos") <= 10,
          col("rel") / log2((col("pos") + 1).cast("double")))
          .otherwise(0d)).as("dcg"),
        sum(when(col("ipos") <= 10,
          col("rel") / log2((col("ipos") + 1).cast("double")))
          .otherwise(0d)).as("idcg"),
        min(when(col("rel") >= 40, col("pos"))).as("first_rel"),
        sum(when(col("pos") <= 10 && col("rel") >= 40, 1L).otherwise(0L))
          .as("hits10"))
      d.select(col("p_brand").as("query_group"),
        round(col("dcg") / col("idcg"), 6).as("ndcg10"),
        when(col("first_rel").isNull, 0L)
          .otherwise(floor(lit(1000000.0) / col("first_rel")))
          .cast("long").as("mrr_ppm"),
        round(col("hits10") / lit(10.0), 6).as("p_at_10"))
    })

  /** Rank-biased overlap (p = 0.9, truncated at depth 50) between the
    * part-revenue rankings of the two halves of the shipdate range —
    * "did the bestseller list reorder?" without any relevance labels
    * (Webber et al., TOIS 2010 shape). The trick that keeps it one
    * aggregate: an item with ranks (ra, rb) is inside both top-d
    * prefixes iff max(ra, rb) ≤ d, so the per-depth overlap X_d is a
    * count over the joined rank table and the truncated series
    * Σ p^(d-1)·X_d/d is a 50-row sum after a range join on
    * max(ra,rb) ≤ d. Revenue in exact integer cents; only the 50-term
    * series is floating point. Because only items with BOTH ranks ≤ 50
    * can ever contribute (mx ≤ d ≤ 50), each half needs only its exact
    * top-50 — a distributed TakeOrdered (per-partition top-50, driver
    * merge of 50-row heads), NOT a global row_number over the
    * per-partkey aggregate: that frame grows linearly with distinct
    * l_partkey (~2 B keys at the 100 TB design point) and would sort
    * through one task. The residual row_number window ranks the 50
    * surviving rows, a literal-bounded frame. */
  val q217 = QueryDef.sql("q217_rank_biased_overlap",
    """WITH h AS (SELECT (SELECT
      |      (min(date_diff('day', DATE '1970-01-01',
      |         CAST(l_shipdate AS DATE))) +
      |       max(date_diff('day', DATE '1970-01-01',
      |         CAST(l_shipdate AS DATE)))) // 2 FROM lineitem) AS mid),
      |g AS (SELECT l_partkey,
      |    CASE WHEN date_diff('day', DATE '1970-01-01',
      |        CAST(l_shipdate AS DATE)) < h.mid THEN 0 ELSE 1 END
      |      AS half,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
      |      AS BIGINT) * (100 - CAST(l_discount * 100 AS BIGINT)))
      |      AS BIGINT) AS rev
      |  FROM lineitem, h GROUP BY 1, 2),
      |ra AS (SELECT l_partkey, row_number()
      |    OVER (ORDER BY rev DESC, l_partkey) AS r
      |  FROM g WHERE half = 0),
      |rb AS (SELECT l_partkey, row_number()
      |    OVER (ORDER BY rev DESC, l_partkey) AS r
      |  FROM g WHERE half = 1),
      |j AS (SELECT GREATEST(ra.r, rb.r) AS mx
      |  FROM ra JOIN rb ON ra.l_partkey = rb.l_partkey
      |  WHERE ra.r <= 50 OR rb.r <= 50),
      |depths AS (SELECT CAST(range AS BIGINT) AS d
      |  FROM range(1, 51)),
      |x AS (SELECT d, CAST(count(mx) AS BIGINT) AS xd
      |  FROM depths LEFT JOIN j ON j.mx <= d GROUP BY 1)
      |SELECT CAST(50 AS BIGINT) AS k,
      |  (SELECT xd FROM x WHERE d = 50) AS overlap_at_k,
      |  round((SELECT xd FROM x WHERE d = 50) / 50.0, 6)
      |    AS jaccard_at_k,
      |  round(0.1 * sum(power(0.9, d - 1) * xd / d), 6) AS rbo
      |FROM x""")(
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val epochDay = unix_date(col("l_shipdate").cast("date"))
      val mid = li.agg(((min(epochDay) + max(epochDay)) / 2).cast("long")
        .as("mid"))
      val g = li.crossJoin(broadcast(mid))
        .groupBy(col("l_partkey"),
          when(epochDay < col("mid"), 0).otherwise(1).as("half"))
        .agg(sum((col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("long") *
          (lit(100L) - (col("l_discount") * 100).cast("long")))
          .cast("long").as("rev"))
      // Exact top-50 per half via TakeOrdered (limit after orderBy):
      // per-partition top-50 + driver merge — never a single-task sort
      // of the full per-partkey frame. Ranks within the 50 survivors
      // equal the global ranks (same total order, unique tiebreaker),
      // and rows with either rank > 50 contribute nothing downstream.
      def ranked(h: Int) = g.where(col("half") === h)
        .orderBy(col("rev").desc, col("l_partkey")).limit(50)
        .select(col("l_partkey"), row_number()
          .over(Window.orderBy(col("rev").desc, col("l_partkey"))).as("r"))
      val j = ranked(0).as("ra")
        .join(ranked(1).as("rb"), col("ra.l_partkey") === col("rb.l_partkey"))
        .where(col("ra.r") <= 50 || col("rb.r") <= 50)
        .select(greatest(col("ra.r"), col("rb.r")).as("mx"))
      val depths = s.range(1, 51).select(col("id").as("d"))
      val x = broadcast(depths).join(j, col("mx") <= col("d"), "left")
        .groupBy("d").agg(count(col("mx")).as("xd"))
      val at50 = x.where(col("d") === 50)
        .select(col("xd").as("overlap_at_k"))
      x.agg(round(lit(0.1) * sum(pow(lit(0.9), col("d") - 1) * col("xd") /
          col("d")), 6).as("rbo"))
        .crossJoin(broadcast(at50))
        .select(lit(50L).as("k"), col("overlap_at_k"),
          round(col("overlap_at_k") / lit(50.0), 6).as("jaccard_at_k"),
          col("rbo"))
    })

  /** Precision/recall of the MinHash+LSH candidate generator (q30's
    * 12-perm, 4×3 banding) against the catalog's exact near-dup truth
    * (q29's df-capped n-gram Jaccard ≥ 0.3) — the measurement that
    * turns "LSH finds near-dups" from a claim into a dial: banding
    * parameters trade recall against candidate volume, and THIS query
    * is the feedback loop for turning them. Both relations already
    * exist as oracled queries; the eval is their join plus one
    * aggregate, so the oracle is the two CTE chains concatenated.
    * Counts are integers; ratios ship as floor-ppm (q128 stance).
    * Expect precision ≪ 1: banding at (4,3) is tuned for recall, and
    * candidates are verified downstream (q29's exact pass) — the
    * precision number here is the VERIFICATION COST dial, not an
    * accuracy failure. */
  val q225 = QueryDef.sql("q225_lsh_dedup_eval", {
    val bands = 4
    val rpb = 3
    val hashes = (0 until bands * rpb)
      .map(i => s"  min(h1 + $i * h2) AS h$i").mkString(",\n")
    val bucketSelects = (0 until bands).map { b =>
      val parts = (0 until rpb).map(r => s"h${b * rpb + r}")
        .mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band, md5($parts) AS key FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""WITH sh AS (SELECT DISTINCT doc_id, substring(text, i, 8) AS s
       |  FROM (SELECT doc_id, text,
       |        unnest(range(1, greatest(length(text) - 7, 0) + 1)) AS i
       |        FROM documents)),
       |hot AS (SELECT s FROM sh GROUP BY s HAVING count(*) > 100),
       |rare AS (SELECT * FROM sh WHERE s NOT IN (SELECT s FROM hot)),
       |sz AS (SELECT doc_id, count(*) AS sz FROM rare GROUP BY doc_id),
       |co AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c
       |       FROM rare a JOIN rare b ON a.s = b.s AND a.doc_id < b.doc_id
       |       GROUP BY a.doc_id, b.doc_id),
       |tp AS (SELECT id1, id2
       |  FROM co JOIN sz s1 ON co.id1 = s1.doc_id
       |          JOIN sz s2 ON co.id2 = s2.doc_id
       |  WHERE round(CAST(c AS DOUBLE) / (s1.sz + s2.sz - c), 6) >= 0.3),
       |hh AS (SELECT doc_id,
       |         ('0x' || substring(md, 1, 15))::BIGINT AS h1,
       |         ('0x' || substring(md, 17, 15))::BIGINT
       |           % 576460752303423488 AS h2
       |       FROM (SELECT doc_id, md5(s) AS md FROM sh) t),
       |sig AS (SELECT doc_id,
       |$hashes
       |FROM hh GROUP BY doc_id),
       |buckets AS (
       |  $bucketSelects),
       |cp AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
       |  FROM buckets a JOIN buckets b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |hit AS (SELECT count(*) AS n_hit FROM tp JOIN cp USING (id1, id2)),
       |nt AS (SELECT count(*) AS n_true FROM tp),
       |nc AS (SELECT count(*) AS n_cand FROM cp)
       |SELECT CAST(nt.n_true AS BIGINT) AS n_true,
       |  CAST(nc.n_cand AS BIGINT) AS n_cand,
       |  CAST(hit.n_hit AS BIGINT) AS n_hit,
       |  CAST(floor(hit.n_hit * 1000000.0 / nt.n_true) AS BIGINT)
       |    AS recall_ppm,
       |  CAST(floor(hit.n_hit * 1000000.0 / nc.n_cand) AS BIGINT)
       |    AS precision_ppm
       |FROM nt, nc, hit"""
  })(
    (s, dir) => {
      import graft.operators.Dedup
      val docs = Tables.documents(s, dir)
      val truth = Dedup.ngramJaccard(docs, "doc_id", "text",
        k = 8, maxDf = 100, threshold = 0.3).select("id1", "id2")
      val cand = Dedup.minhashLshCandidates(docs, "doc_id", "text",
        k = 8, bands = 4, rowsPerBand = 3)
      val nt = truth.agg(count(lit(1)).as("n_true"))
      val nc = cand.agg(count(lit(1)).as("n_cand"))
      // merge hint: BOTH sides are pair-id frames that grow
      // superlinearly with the corpus, but they arrive as
      // post-aggregation subtrees whose size ESTIMATES sit under the
      // broadcast threshold — at 10× the planner's broadcast build ran
      // the driver out of heap mid-bench (r13 sf1 run, the only red
      // row). A pair-frame side is never a safe broadcast at scale;
      // the sort-merge join is the plan a 100 TB eval needs anyway.
      val hit = truth.hint("merge").join(cand, Seq("id1", "id2"))
        .agg(count(lit(1)).as("n_hit"))
      nt.crossJoin(broadcast(nc)).crossJoin(broadcast(hit))
        .select(col("n_true"), col("n_cand"), col("n_hit"),
          floor(col("n_hit") * lit(1000000.0) / col("n_true"))
            .cast("long").as("recall_ppm"),
          floor(col("n_hit") * lit(1000000.0) / col("n_cand"))
            .cast("long").as("precision_ppm"))
    })

  /** Top movers between the two halves of the shipdate range — the
    * per-ITEM drill-down of the aggregate drift metrics (q119's TV
    * distance, q215's PSI say "the mix moved"; this names the 20
    * parts that moved it). Selection is entirely integer: |Δ count|
    * DESC with partkey tiebreak via one post-aggregate window over
    * the per-part frame. The period split reuses q217's exact
    * epoch-day midpoint. */
  val q241 = QueryDef.sql("q241_top_movers",
    """WITH h AS (SELECT (SELECT
      |      (min(date_diff('day', DATE '1970-01-01',
      |         CAST(l_shipdate AS DATE))) +
      |       max(date_diff('day', DATE '1970-01-01',
      |         CAST(l_shipdate AS DATE)))) // 2 FROM lineitem) AS mid),
      |g AS (SELECT l_partkey,
      |    CAST(sum(CASE WHEN date_diff('day', DATE '1970-01-01',
      |      CAST(l_shipdate AS DATE)) < h.mid THEN 1 ELSE 0 END)
      |      AS BIGINT) AS c1,
      |    CAST(sum(CASE WHEN date_diff('day', DATE '1970-01-01',
      |      CAST(l_shipdate AS DATE)) < h.mid THEN 0 ELSE 1 END)
      |      AS BIGINT) AS c2
      |  FROM lineitem, h GROUP BY 1),
      |r AS (SELECT l_partkey, c1, c2, c2 - c1 AS delta,
      |    row_number() OVER (ORDER BY abs(c2 - c1) DESC, l_partkey)
      |      AS rk
      |  FROM g)
      |SELECT l_partkey, c1, c2, delta, rk FROM r WHERE rk <= 20""")(
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val li = Tables.lineitem(s, dir)
      val epochDay = unix_date(col("l_shipdate").cast("date"))
      val mid = li.agg(((min(epochDay) + max(epochDay)) / 2).cast("long")
        .as("mid"))
      val g = li.crossJoin(broadcast(mid))
        .groupBy("l_partkey")
        .agg(sum(when(epochDay < col("mid"), 1L).otherwise(0L)).as("c1"),
          sum(when(epochDay < col("mid"), 0L).otherwise(1L)).as("c2"))
      // post-aggregate frame (|parts| rows) — bounded global window
      g.select(col("l_partkey"), col("c1"), col("c2"),
          (col("c2") - col("c1")).as("delta"),
          row_number().over(Window.orderBy(
            abs(col("c2") - col("c1")).desc, col("l_partkey"))).as("rk"))
        .where(col("rk") <= 20)
    })

  /** Data scaling-law probe: train the q172 integer-bits unigram
    * model on NESTED md5 fractions of the corpus (1/16 ⊂ 2/16 ⊂ 4/16
    * ⊂ 8/16 — nesting is free because the thresholds share one hash),
    * score a DISJOINT held-out sixteenth under each, and fit the
    * doublings-of-data → held-out mean-bits line (x = the exact
    * doubling exponent k, so the regressor is integer) — the
    * more-data-less-surprisal curve that data-budget decisions
    * extrapolate from. Per-fraction scoring is the q172 machinery
    * (integer bits, unseen tokens smoothed to c = 0); the OLS runs on
    * a FOUR-row frame with every sum an explicit ascending-k left
    * fold (`list_reduce` / driver fold — a GROUP sum of doubles has
    * engine-dependent order, the q239 lesson). Slope ships
    * floor-micro; negative slope = data is still buying fluency. */
  val q243 = QueryDef.sql("q243_scaling_law_probe",
    """WITH hd AS (SELECT doc_id, text,
      |    ('0x' || substring(md5('s|' || CAST(doc_id AS VARCHAR)),
      |      1, 15))::BIGINT % 16 AS h
      |  FROM documents),
      |tok AS (SELECT doc_id, h, tok FROM (
      |    SELECT doc_id, h,
      |      unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      |    FROM hd) t WHERE length(tok) > 0),
      |ks AS (SELECT CAST(k AS BIGINT) AS k
      |  FROM (VALUES (0), (1), (2), (3)) v(k)),
      |mc AS MATERIALIZED (SELECT ks.k, tok.tok, count(*) AS c
      |  FROM tok, ks WHERE tok.h < (1::BIGINT << ks.k) GROUP BY 1, 2),
      |mt AS MATERIALIZED (SELECT k, CAST(sum(c) AS BIGINT) AS t,
      |    CAST(count(*) AS BIGINT) AS v FROM mc GROUP BY 1),
      |td AS (SELECT ks.k, CAST(count(DISTINCT doc_id) AS BIGINT)
      |    AS train_docs
      |  FROM tok, ks WHERE tok.h < (1::BIGINT << ks.k) GROUP BY 1),
      |ev AS MATERIALIZED (SELECT tok FROM tok WHERE h = 15),
      |eb AS (SELECT mt.k,
      |    CAST(sum(length(bin((mt.t + mt.v) // (coalesce(mc.c, 0) + 1))))
      |      - count(*) AS BIGINT) AS bits
      |  FROM ev CROSS JOIN mt LEFT JOIN mc
      |    ON mc.k = mt.k AND mc.tok = ev.tok
      |  GROUP BY 1),
      |en AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ev),
      |pts AS (SELECT eb.k, mt.t, eb.bits,
      |    CAST(eb.k AS DOUBLE) AS x,
      |    CAST(eb.bits AS DOUBLE) / en.n AS y
      |  FROM eb JOIN mt USING (k), en),
      |fold AS (SELECT
      |    list_reduce(list(x ORDER BY k), (a, b) -> a + b) AS sx,
      |    list_reduce(list(y ORDER BY k), (a, b) -> a + b) AS sy,
      |    list_reduce(list(x * y ORDER BY k), (a, b) -> a + b) AS sxy,
      |    list_reduce(list(x * x ORDER BY k), (a, b) -> a + b) AS sxx
      |  FROM pts),
      |sl AS (SELECT CAST(floor((4.0 * sxy - sx * sy) /
      |    (4.0 * sxx - sx * sx) * 1000000.0) AS BIGINT) AS slope_micro
      |  FROM fold)
      |SELECT pts.k, td.train_docs, pts.t AS train_tokens, en.n
      |    AS eval_tokens, pts.bits AS sum_bits,
      |  CAST(floor(pts.bits * 1000000.0 / en.n) AS BIGINT)
      |    AS mean_bits_micro,
      |  sl.slope_micro
      |FROM pts JOIN td USING (k), en, sl""")(
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val hd = docs.select(col("doc_id"), col("text"),
        (conv(substring(md5(concat(lit("s|"),
          col("doc_id").cast("string"))), 1, 15), 16, 10).cast("long")
          % 16).as("h"))
      val tok = hd.select(col("doc_id"), col("h"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
        .where(length(col("tok")) > 0).cache()
      val ev = tok.where(col("h") === 15).select("tok").cache()
      val evN = ev.count()
      val ks = Seq(0, 1, 2, 3)
      val perK = ks.map { k =>
        val train = tok.where(col("h") < (1L << k))
        val mc = train.groupBy("tok").agg(count(lit(1)).as("c"))
        val mt = mc.agg(sum("c").as("t"), count(lit(1)).as("v"))
          .collect()(0)
        val (t, v) = (mt.getLong(0), mt.getLong(1))
        val trainDocs = train.select("doc_id").distinct().count()
        val bits = ev.join(mc, Seq("tok"), "left")
          .select((length(bin(
            expr(s"(${t}L + ${v}L) DIV (coalesce(c, 0) + 1)"))) - 1)
            .cast("long").as("b"))
          .agg(sum("b")).collect()(0).getLong(0)
        (k.toLong, trainDocs, t, bits)
      }
      // 4-point OLS over x = k (exact doubling exponent — a log2 of
      // token counts would drag 1-ulp libm differences into the fit);
      // ascending-k left folds match the oracle's list_reduce
      val xs = perK.map { case (k, _, _, _) => k.toDouble }
      val ys = perK.map { case (_, _, _, b) => b.toDouble / evN }
      val sx = xs.foldLeft(0.0)(_ + _)
      val sy = ys.foldLeft(0.0)(_ + _)
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.foldLeft(0.0)(_ + _)
      val sxx = xs.map(a => a * a).foldLeft(0.0)(_ + _)
      val slope = math.floor((4.0 * sxy - sx * sy) /
        (4.0 * sxx - sx * sx) * 1000000.0).toLong
      val rows = perK.map { case (k, td, t, b) =>
        (k, td, t, evN, b, math.floor(b * 1000000.0 / evN).toLong, slope)
      }
      tok.unpersist(blocking = false)
      ev.unpersist(blocking = false)
      s.createDataFrame(rows).toDF("k", "train_docs", "train_tokens",
        "eval_tokens", "sum_bits", "mean_bits_micro", "slope_micro")
    })

  /** Near-dup threshold sweep: the q29 exact-Jaccard pair relation
    * evaluated at SEVEN thresholds in one pass — the dial table a
    * curation run reads before committing to "0.3" (how many pairs,
    * how many documents touched, at each cut). Thresholds compare as
    * EXACT integer cross-products (c·100 ≥ th·(s1+s2−c)) — the
    * rounded jaccard column would misclassify boundary pairs. One
    * inverted-index pass builds the pairs; the sweep is a 7-way
    * broadcast fan-out over the pair frame. */
  val q248 = QueryDef.sql("q248_dedup_threshold_sweep",
    """WITH sh AS (SELECT DISTINCT doc_id, substring(text, i, 8) AS s
      |  FROM (SELECT doc_id, text,
      |        unnest(range(1, greatest(length(text) - 7, 0) + 1)) AS i
      |        FROM documents)),
      |hot AS (SELECT s FROM sh GROUP BY s HAVING count(*) > 100),
      |rare AS (SELECT * FROM sh WHERE s NOT IN (SELECT s FROM hot)),
      |sz AS (SELECT doc_id, count(*) AS sz FROM rare GROUP BY doc_id),
      |co AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c
      |       FROM rare a JOIN rare b ON a.s = b.s AND a.doc_id < b.doc_id
      |       GROUP BY a.doc_id, b.doc_id),
      |p AS (SELECT id1, id2, c, s1.sz + s2.sz - c AS un
      |  FROM co JOIN sz s1 ON co.id1 = s1.doc_id
      |          JOIN sz s2 ON co.id2 = s2.doc_id),
      |th AS (SELECT CAST(t AS BIGINT) AS th_pct FROM
      |  (VALUES (20), (30), (40), (50), (60), (70), (80)) v(t)),
      |hits AS (SELECT th.th_pct, p.id1, p.id2 FROM p, th
      |  WHERE p.c * 100 >= th.th_pct * p.un),
      |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
      |SELECT th.th_pct,
      |  CAST((SELECT count(*) FROM hits h WHERE h.th_pct = th.th_pct)
      |    AS BIGINT) AS n_pairs,
      |  CAST((SELECT count(DISTINCT d) FROM (
      |    SELECT id1 AS d FROM hits h WHERE h.th_pct = th.th_pct
      |    UNION ALL SELECT id2 FROM hits h WHERE h.th_pct = th.th_pct))
      |    AS BIGINT) AS n_docs_affected,
      |  CAST(floor((SELECT count(DISTINCT d) FROM (
      |    SELECT id1 AS d FROM hits h WHERE h.th_pct = th.th_pct
      |    UNION ALL SELECT id2 FROM hits h WHERE h.th_pct = th.th_pct))
      |    * 1000000.0 / nd.n_docs) AS BIGINT) AS affected_ppm
      |FROM th, nd""")(
    (s, dir) => {
      import graft.operators.Dedup
      val docs = Tables.documents(s, dir)
      val inv = Dedup.invertedIndexHashed(docs, "doc_id", "text", 8)
      val kept = inv.where(size(col("docs")) <= 100)
      val sizes = kept.select(explode(col("docs")).as("doc_id"))
        .groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val pairsOfBucket = kept.where(size(col("docs")) >= 2)
      val co = pairsOfBucket
        .select(explode(Dedup.expandPairs(pairsOfBucket, "docs")).as("p"))
        .select(col("p.id1"), col("p.id2"))
        .groupBy("id1", "id2").agg(count(lit(1)).as("c"))
      val p = co.join(sizes.toDF("id1", "sz1"), "id1")
        .join(sizes.toDF("id2", "sz2"), "id2")
        .select(col("id1"), col("id2"), col("c"),
          (col("sz1") + col("sz2") - col("c")).as("un")).cache()
      val th = s.createDataFrame(Seq(20L, 30L, 40L, 50L, 60L, 70L, 80L)
        .map(Tuple1(_))).toDF("th_pct")
      val hits = p.crossJoin(broadcast(th))
        .where(col("c") * 100 >= col("th_pct") * col("un")).cache()
      val nDocs = docs.count()
      val byTh = hits.groupBy("th_pct").agg(count(lit(1)).as("n_pairs"))
      val docsByTh = hits.select(col("th_pct"), col("id1").as("d"))
        .unionByName(hits.select(col("th_pct"), col("id2").as("d")))
        .groupBy("th_pct").agg(count_distinct(col("d")).as("n_aff"))
      th.join(byTh, Seq("th_pct"), "left")
        .join(docsByTh, Seq("th_pct"), "left")
        .select(col("th_pct"),
          coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
          coalesce(col("n_aff"), lit(0L)).as("n_docs_affected"),
          floor(coalesce(col("n_aff"), lit(0L)) * lit(1000000.0) /
            lit(nDocs.toDouble)).cast("long").as("affected_ppm"))
    })

  /** Youden-optimal decision threshold from q210's score-group table:
    * the cut maximizing TPR − FPR, selected by the EXACT integer
    * statistic J₂ = tp·N⁻ − fp·N⁺ (ties → smallest score) — the step
    * that turns an AUC into a deployable classifier. Suffix counts
    * come from totals minus the q210 prefix sums (two-pass, never a
    * single-task window); the argmax is max-then-join (two
    * aggregates), not a global ranking. */
  val q249 = QueryDef.sql("q249_youden_threshold",
    """WITH b AS (SELECT
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS sc,
      |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      |  FROM lineitem),
      |g AS (SELECT sc, CAST(sum(y) AS BIGINT) AS np,
      |    CAST(count(*) - sum(y) AS BIGINT) AS nn
      |  FROM b GROUP BY 1),
      |c AS (SELECT sc, np, nn,
      |    sum(np) OVER (ORDER BY sc ROWS UNBOUNDED PRECEDING) AS cnp,
      |    sum(nn) OVER (ORDER BY sc ROWS UNBOUNDED PRECEDING) AS cnn
      |  FROM g),
      |t AS (SELECT CAST(sum(np) AS BIGINT) AS tp_all,
      |    CAST(sum(nn) AS BIGINT) AS tn_all FROM g),
      |j AS (SELECT sc, t.tp_all - cnp AS tp, t.tn_all - cnn AS fp,
      |    (t.tp_all - cnp) * t.tn_all - (t.tn_all - cnn) * t.tp_all
      |      AS j2
      |  FROM c, t),
      |m AS (SELECT max(j2) AS mj FROM j)
      |SELECT (SELECT min(sc) FROM j, m WHERE j.j2 = m.mj) AS threshold,
      |  CAST((SELECT tp FROM j, m WHERE j.j2 = m.mj ORDER BY sc LIMIT 1)
      |    AS BIGINT) AS tp,
      |  CAST((SELECT fp FROM j, m WHERE j.j2 = m.mj ORDER BY sc LIMIT 1)
      |    AS BIGINT) AS fp,
      |  CAST(floor((SELECT tp FROM j, m WHERE j.j2 = m.mj
      |    ORDER BY sc LIMIT 1) * 1000000.0 / t.tp_all) AS BIGINT)
      |    AS tpr_ppm,
      |  CAST(floor((SELECT fp FROM j, m WHERE j.j2 = m.mj
      |    ORDER BY sc LIMIT 1) * 1000000.0 / t.tn_all) AS BIGINT)
      |    AS fpr_ppm,
      |  CAST(m.mj AS BIGINT) AS j2
      |FROM t, m""")(
    (s, dir) => {
      import graft.operators.Rank
      val g = Tables.lineitem(s, dir).select(
          (col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("long").as("sc"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
        .groupBy("sc")
        .agg(sum("y").as("np"), (count(lit(1)) - sum("y")).as("nn"))
      // both running class counts fused onto one range exchange
      val c = Rank.globalOrderStats(g,
        Seq("cnp" -> "np", "cnn" -> "nn"), None, col("sc"))
      val t = g.agg(sum("np").as("tp_all"), sum("nn").as("tn_all"))
      val j = c.crossJoin(broadcast(t))
        .select(col("sc"),
          (col("tp_all") - col("cnp")).as("tp"),
          (col("tn_all") - col("cnn")).as("fp"),
          ((col("tp_all") - col("cnp")) * col("tn_all") -
            (col("tn_all") - col("cnn")) * col("tp_all")).as("j2"))
        .cache()
      val m = j.agg(max("j2").as("mj"))
      val best = j.join(broadcast(m), col("j2") === col("mj"))
        .agg(min("sc").as("threshold"))
      val row = j.join(broadcast(best), col("sc") === col("threshold"))
        .crossJoin(broadcast(t)).crossJoin(broadcast(m))
      row.select(col("threshold"), col("tp"), col("fp"),
        floor(col("tp") * lit(1000000.0) / col("tp_all")).cast("long")
          .as("tpr_ppm"),
        floor(col("fp") * lit(1000000.0) / col("tn_all")).cast("long")
          .as("fpr_ppm"),
        col("mj").as("j2"))
    })

  /** Pairwise source-distribution overlap — histogram intersection
    * Σ min(p, q) between every two sources' token distributions, as
    * exact integer cross-products min(c₁T₂, c₂T₁)/(T₁T₂): the
    * REDUNDANCY matrix (q125's vocab Jaccard says sources share
    * words; this says they use them in the same proportions — the
    * difference between "same language" and "same corpus twice").
    * The pair fan-out is per-TOKEN over sources sharing it, bounded
    * by |vocab|·|sources|², never by corpus rows. */
  val q250 = QueryDef.sql("q250_source_overlap",
    """WITH tk AS (SELECT source, tok FROM (
      |    SELECT source,
      |      unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      |    FROM documents) t WHERE length(tok) > 0),
      |cs AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
      |  FROM tk GROUP BY 1, 2),
      |ts AS (SELECT source, CAST(sum(c) AS BIGINT) AS t
      |  FROM cs GROUP BY 1),
      |p AS (SELECT a.source AS source_a, b.source AS source_b,
      |    CAST(sum(LEAST(a.c * tb.t, b.c * ta.t)) AS BIGINT) AS num,
      |    min(ta.t) AS t_a, min(tb.t) AS t_b
      |  FROM cs a JOIN cs b ON a.tok = b.tok AND a.source < b.source
      |    JOIN ts ta ON ta.source = a.source
      |    JOIN ts tb ON tb.source = b.source
      |  GROUP BY 1, 2)
      |SELECT source_a, source_b,
      |  CAST(floor(num * 1000000.0 / (t_a * t_b)) AS BIGINT)
      |    AS overlap_ppm
      |FROM p""")(
    (s, dir) => {
      val tk = Tables.documents(s, dir)
        .select(col("source"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
        .where(length(col("tok")) > 0)
      val cs = tk.groupBy("source", "tok").agg(count(lit(1)).as("c"))
      val ts = cs.groupBy("source").agg(sum("c").as("t"))
      cs.toDF("sa", "tok", "ca")
        .join(cs.toDF("sb", "tok", "cb"), "tok")
        .where(col("sa") < col("sb"))
        .join(broadcast(ts.toDF("sa", "ta")), "sa")
        .join(broadcast(ts.toDF("sb", "tb")), "sb")
        .groupBy(col("sa").as("source_a"), col("sb").as("source_b"))
        .agg(sum(least(col("ca") * col("tb"), col("cb") * col("ta")))
          .as("num"), min("ta").as("t_a"), min("tb").as("t_b"))
        .select(col("source_a"), col("source_b"),
          floor(col("num") * lit(1000000.0) / (col("t_a") * col("t_b")))
            .cast("long").as("overlap_ppm"))
    })

  /** Reciprocal-rank fusion (k = 60) of two retrieval rankings per
    * query group — the zero-training ensemble every multi-index
    * search stack ships (BM25 ⊕ dense, here price-rank ⊕ size-rank
    * per brand): fused = 1/(60+r₁) + 1/(60+r₂), top-3 per group.
    * The two-term sum folds in a FIXED order, so the fused doubles
    * are engine-identical and the (fused DESC, partkey) selection is
    * deterministic; the score ships floor-micro (floor of identical
    * doubles is pure — only round()'s tie-break semantics differ
    * between engines). Windows shard by query group. */
  val q254 = QueryDef.sql("q254_rrf_fusion",
    """WITH b AS (SELECT p_brand, p_partkey,
      |    CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS price_c,
      |    CAST(p_size AS BIGINT) AS sz
      |  FROM part),
      |r AS (SELECT p_brand, p_partkey,
      |    row_number() OVER (PARTITION BY p_brand
      |      ORDER BY price_c DESC, p_partkey) AS r1,
      |    row_number() OVER (PARTITION BY p_brand
      |      ORDER BY sz DESC, p_partkey) AS r2
      |  FROM b),
      |f AS (SELECT p_brand, p_partkey, r1, r2,
      |    1.0 / (60 + r1) + 1.0 / (60 + r2) AS fused
      |  FROM r),
      |t AS (SELECT *, row_number() OVER (PARTITION BY p_brand
      |    ORDER BY fused DESC, p_partkey) AS rk FROM f)
      |SELECT p_brand AS query_group, p_partkey, CAST(r1 AS BIGINT)
      |    AS rank_price, CAST(r2 AS BIGINT) AS rank_size,
      |  CAST(floor(fused * 1000000.0) AS BIGINT) AS rrf_micro,
      |  CAST(rk AS BIGINT) AS fused_rank
      |FROM t WHERE rk <= 3""")(
    (s, dir) => {
      val b = Tables.part(s, dir).select(col("p_brand"), col("p_partkey"),
        (col("p_retailprice").cast("decimal(18,2)") * 100).cast("long")
          .as("price_c"),
        col("p_size").cast("long").as("sz"))
      val w1 = Window.partitionBy("p_brand")
        .orderBy(col("price_c").desc, col("p_partkey"))
      val w2 = Window.partitionBy("p_brand")
        .orderBy(col("sz").desc, col("p_partkey"))
      val r = b.select(col("p_brand"), col("p_partkey"),
        row_number().over(w1).as("r1"), row_number().over(w2).as("r2"))
      val f = r.withColumn("fused",
        lit(1.0) / (lit(60) + col("r1")) + lit(1.0) / (lit(60) + col("r2")))
      f.withColumn("rk", row_number().over(Window.partitionBy("p_brand")
          .orderBy(col("fused").desc, col("p_partkey"))))
        .where(col("rk") <= 3)
        .select(col("p_brand").as("query_group"), col("p_partkey"),
          col("r1").cast("long").as("rank_price"),
          col("r2").cast("long").as("rank_size"),
          floor(col("fused") * lit(1000000.0)).cast("long")
            .as("rrf_micro"),
          col("rk").cast("long").as("fused_rank"))
    })

  /** Quantile–quantile table between the purchase and click value
    * distributions — the whole comparison CURVE behind q211's
    * single-number KS distance (where q211 says HOW FAR apart, the QQ
    * table says WHERE: head, body or tail). Nineteen 5%-spaced
    * quantiles, each an EXACT order statistic (rank ⌈p·n⌉ per group,
    * integer arithmetic — no interpolation, no percentile estimator),
    * values in exact µ-units. Per-type windows shard by type; the
    * quantile grid is a broadcast. */
  val q255 = QueryDef.sql("q255_qq_table",
    """WITH b AS (SELECT event_type,
      |    CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS sc,
      |    event_id
      |  FROM events WHERE event_type IN ('purchase', 'click')),
      |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
      |  FROM b GROUP BY 1),
      |r AS (SELECT event_type, sc, row_number() OVER (
      |    PARTITION BY event_type ORDER BY sc, event_id) AS rk
      |  FROM b),
      |p AS (SELECT CAST(p AS BIGINT) AS p_pct FROM range(5, 100, 5)
      |  t(p)),
      |k AS (SELECT p.p_pct, n.event_type,
      |    (p.p_pct * n.n + 99) // 100 AS k
      |  FROM p, n),
      |qv AS (SELECT k.p_pct, k.event_type, r.sc
      |  FROM k JOIN r ON r.event_type = k.event_type AND r.rk = k.k)
      |SELECT a.p_pct,
      |  a.sc AS q_purchase_micro, c.sc AS q_click_micro,
      |  a.sc - c.sc AS diff_micro
      |FROM qv a JOIN qv c ON a.p_pct = c.p_pct
      |WHERE a.event_type = 'purchase' AND c.event_type = 'click'""")(
    (s, dir) => {
      val b = Tables.events(s, dir)
        .where(col("event_type").isin("purchase", "click"))
        .select(col("event_type"),
          (col("value").cast("decimal(18,6)") * 1000000).cast("long")
            .as("sc"),
          col("event_id"))
      val n = b.groupBy("event_type").agg(count(lit(1)).as("n"))
      val r = b.withColumn("rk", row_number().over(
        Window.partitionBy("event_type").orderBy("sc", "event_id")))
      val p = s.range(1, 20).select((col("id") * 5).as("p_pct"))
      val k = broadcast(p).crossJoin(broadcast(n))
        .select(col("p_pct"), col("event_type"),
          expr("(p_pct * n + 99) DIV 100").as("k"))
      val qv = r.join(broadcast(k),
          r("event_type") === k("event_type") && col("rk") === col("k"))
        .select(col("p_pct"), r("event_type").as("et"), col("sc"))
      qv.where(col("et") === "purchase").toDF("p_pct", "eta", "sca")
        .join(qv.where(col("et") === "click").toDF("p_pct", "etc", "scc"),
          "p_pct")
        .select(col("p_pct"), col("sca").as("q_purchase_micro"),
          col("scc").as("q_click_micro"),
          (col("sca") - col("scc")).as("diff_micro"))
    })

  def all: Seq[QueryDef] = Seq(q215, q216, q217, q225, q241, q243, q248,
    q249, q250, q254, q255)
}
