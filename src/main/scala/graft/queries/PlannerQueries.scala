package graft.queries

import graft.Tables
import graft.operators.{Skew, TextAnalysis}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Planner-grade profiling and cohort analytics: the queries a 100 TB
  * warehouse runs ABOUT its data before running ON it — skew profiling
  * ahead of join-strategy choice, exact join-cardinality estimation from
  * key histograms, cohort retention, and LM-model fluency scoring.
  * Every oracle is integer-exact or a round-6 of an integer ratio.
  */
object PlannerQueries {

  /** Monthly cohort retention triangle over orders: cohort = month of a
    * customer's first order; for each (cohort, month-offset), distinct
    * active customers and the retention ratio vs the cohort size.
    * Offset 0 is every cohort's size by construction, so the ratio
    * denominator needs no separate scan. Plan shape: one groupBy on
    * custkey for first-order month, one custkey-co-partitioned join
    * back (same key ⇒ single exchange under AQE), then a months×offsets
    * aggregate (tiny) and a broadcast of the offset-0 slice. */
  val q190 = QueryDef.sql("q190_cohort_retention",
    """WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS od
      |           FROM orders),
      |f AS (SELECT o_custkey, min(date_trunc('month', od)) AS cm
      |      FROM o GROUP BY 1),
      |a AS (SELECT DISTINCT o.o_custkey, f.cm,
      |    (year(o.od) - year(f.cm)) * 12 + (month(o.od) - month(f.cm))
      |      AS moff
      |  FROM o JOIN f ON o.o_custkey = f.o_custkey),
      |r AS (SELECT cm, moff, count(*) AS n_active FROM a GROUP BY 1, 2),
      |c0 AS (SELECT cm, n_active AS cohort_size FROM r WHERE moff = 0)
      |SELECT CAST(r.cm AS DATE) AS cohort_month,
      |  CAST(r.moff AS BIGINT) AS month_offset,
      |  CAST(r.n_active AS BIGINT) AS n_active,
      |  CAST(c0.cohort_size AS BIGINT) AS cohort_size,
      |  round(CAST(r.n_active AS DOUBLE) / c0.cohort_size, 6) AS retention
      |FROM r JOIN c0 ON r.cm = c0.cm""")(
    (s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_custkey"), to_date(col("o_orderdate")).as("od"))
      val f = o.groupBy("o_custkey").agg(min(trunc(col("od"), "month")).as("cm"))
      val a = o.join(f, "o_custkey")
        .select(col("o_custkey"), col("cm"),
          ((year(col("od")) - year(col("cm"))) * 12 +
            (month(col("od")) - month(col("cm")))).cast("long").as("moff"))
        .distinct()
      val r = a.groupBy(col("cm"), col("moff")).agg(count(lit(1)).as("n_active"))
      val c0 = r.where(col("moff") === 0)
        .select(col("cm"), col("n_active").as("cohort_size"))
      r.join(broadcast(c0), "cm")
        .select(col("cm").as("cohort_month"), col("moff").as("month_offset"),
          col("n_active"), col("cohort_size"),
          round(col("n_active").cast("double") / col("cohort_size"), 6)
            .as("retention"))
    })

  /** Join-key skew report over the warehouse's four hottest join keys.
    * See [[graft.operators.Skew.report]] — max/avg skew factor plus the
    * integer-exact salt factor a salted join would need. The profiling
    * pass that decides broadcast vs shuffle vs salt BEFORE the join
    * runs. */
  val q191 = QueryDef.sql("q191_skew_report",
    """WITH k AS (
      |  SELECT 'l_partkey' AS key_col, l_partkey AS k FROM lineitem
      |  UNION ALL SELECT 'l_suppkey', l_suppkey FROM lineitem
      |  UNION ALL SELECT 'o_custkey', o_custkey FROM orders
      |  UNION ALL SELECT 'user_id', user_id FROM events),
      |c AS (SELECT key_col, k, count(*) AS cnt FROM k GROUP BY 1, 2)
      |SELECT key_col,
      |  CAST(count(*) AS BIGINT) AS n_keys,
      |  CAST(sum(cnt) AS BIGINT) AS n_rows,
      |  CAST(max(cnt) AS BIGINT) AS max_cnt,
      |  round(CAST(max(cnt) * count(*) AS DOUBLE) / sum(cnt), 6)
      |    AS skew_factor,
      |  CAST((max(cnt) * count(*) + sum(cnt) - 1) // sum(cnt) AS BIGINT)
      |    AS salt_factor
      |FROM c GROUP BY 1""")(
    (s, dir) => Skew.report(Seq(
      ("l_partkey", Tables.lineitem(s, dir), "l_partkey"),
      ("l_suppkey", Tables.lineitem(s, dir), "l_suppkey"),
      ("o_custkey", Tables.orders(s, dir), "o_custkey"),
      ("user_id", Tables.events(s, dir), "user_id"))))

  /** Exact join-cardinality estimation WITHOUT running the joins:
    * |A ⋈ B| = Σ_k c_A(k)·c_B(k) over per-key count histograms. The
    * histograms are map-side-combined aggregates (distinct-key-sized,
    * not row-sized), their join is key-count vs key-count — so sizing a
    * 100 TB fact-fact join costs two profiling aggregates instead of
    * the join's full shuffle. The numbers are exact, not sketches; the
    * same Σc·c machinery with HLL inputs is the approximate form. */
  val q192 = QueryDef.sql("q192_join_card_est",
    """WITH lo AS (SELECT l_orderkey AS k, count(*) AS c FROM lineitem
      |            GROUP BY 1),
      |oo AS (SELECT o_orderkey AS k, count(*) AS c FROM orders GROUP BY 1),
      |lp AS (SELECT l_partkey AS k, count(*) AS c FROM lineitem GROUP BY 1),
      |pp AS (SELECT p_partkey AS k, count(*) AS c FROM part GROUP BY 1),
      |ls AS (SELECT l_suppkey AS k, count(*) AS c FROM lineitem GROUP BY 1),
      |ss AS (SELECT s_suppkey AS k, count(*) AS c FROM supplier GROUP BY 1),
      |j AS (
      |  SELECT 'lineitem_orders' AS join_name, count(*) AS nk,
      |      sum(a.c * b.c) AS est
      |    FROM lo a JOIN oo b ON a.k = b.k
      |  UNION ALL SELECT 'lineitem_part', count(*), sum(a.c * b.c)
      |    FROM lp a JOIN pp b ON a.k = b.k
      |  UNION ALL SELECT 'lineitem_supplier', count(*), sum(a.c * b.c)
      |    FROM ls a JOIN ss b ON a.k = b.k)
      |SELECT join_name, CAST(nk AS BIGINT) AS n_match_keys,
      |  CAST(est AS BIGINT) AS join_rows
      |FROM j""")(
    (s, dir) => {
      def hist(df: org.apache.spark.sql.DataFrame, key: String) =
        df.groupBy(df(key).as("k")).agg(count(lit(1)).as("c"))
      def est(name: String, a: org.apache.spark.sql.DataFrame,
              b: org.apache.spark.sql.DataFrame) =
        a.join(b.withColumnRenamed("c", "c2"), "k")
          .agg(count(lit(1)).as("n_match_keys"),
            sum(col("c") * col("c2")).as("join_rows"))
          .select(lit(name).as("join_name"), col("n_match_keys"),
            col("join_rows"))
      val li = Tables.lineitem(s, dir)
      est("lineitem_orders", hist(li, "l_orderkey"),
          hist(Tables.orders(s, dir), "o_orderkey"))
        .unionByName(est("lineitem_part", hist(li, "l_partkey"),
          hist(Tables.part(s, dir), "p_partkey")))
        .unionByName(est("lineitem_supplier", hist(li, "l_suppkey"),
          hist(Tables.supplier(s, dir), "s_suppkey")))
    })

  /** Bigram conditional surprisal per document — see
    * [[graft.operators.TextAnalysis.bigramSurprisalBits]]. The bigram
    * analogue of q172's unigram filter: integer floor-log2 bits of the
    * add-one-smoothed inverse conditional probability, summed per doc. */
  val q193 = QueryDef.sql("q193_bigram_surprisal",
    """WITH tok AS (
      |  SELECT doc_id, pos, t AS w FROM (
      |    SELECT doc_id,
      |      unnest(string_split_regex(lower(trim(text)), '\s+')) AS t,
      |      unnest(range(len(string_split_regex(lower(trim(text)), '\s+'))))
      |        AS pos
      |    FROM documents) WHERE t <> ''),
      |bi AS (SELECT doc_id, w AS w1,
      |    lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      |  FROM tok),
      |db AS (SELECT doc_id, w1, w2 FROM bi WHERE w2 IS NOT NULL),
      |cb AS (SELECT w1, w2, count(*) AS c_xy FROM db GROUP BY 1, 2),
      |cu AS (SELECT w AS w1, count(*) AS c_x FROM tok GROUP BY 1),
      |v AS (SELECT count(*) AS vsz FROM cu),
      |bits AS (SELECT cb.w1, cb.w2,
      |    CAST(length(bin((cu.c_x + v.vsz) // (cb.c_xy + 1))) - 1 AS BIGINT)
      |      AS bits
      |  FROM cb JOIN cu USING (w1), v)
      |SELECT db.doc_id, count(*) AS n_bigrams,
      |  CAST(sum(bits) AS BIGINT) AS bigram_bits,
      |  round(CAST(sum(bits) AS DOUBLE) / count(*), 6) AS mean_bits
      |FROM db JOIN bits USING (w1, w2) GROUP BY db.doc_id""")(
    (s, dir) => TextAnalysis.bigramSurprisalBits(
      Tables.documents(s, dir), "doc_id", "text"))

  /** Pairwise audience overlap between event types WITHOUT a pairwise
    * user-level shuffle: per-type HLL registers of the user set are
    * computed in ONE scan, then pair-union estimates come from
    * max-merging the (|types| × 256)-row register table — the
    * inclusion–exclusion identity |A∩B| = |A| + |B| − |A∪B| applied to
    * sketches. The exact overlap (a distinct-pairs self-join) rides
    * along as the accuracy yardstick; at 100 TB the exact path is the
    * one you delete, the register path costs one aggregate regardless
    * of corpus size. Same portable-HLL machinery as q51/q107 — every
    * arithmetic step integer-exact or IEEE-identical, so DuckDB
    * replays the estimates bit-for-bit. */
  val q194 = {
    import graft.operators.Sketches
    val rhoCase = Sketches.rhoSql(s"(h & ${(1L << Sketches.RemBits) - 1})")
    val m = Sketches.Buckets
    val ew = Sketches.EmptyWeight
    val est = s"${Sketches.alphaSql} * ${m.toDouble}::DOUBLE * " +
      s"${m.toDouble}::DOUBLE * ${ew.toDouble}::DOUBLE"
    QueryDef.sql("q194_hll_overlap",
      s"""WITH h AS (SELECT event_type,
         |    ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
         |      AS h
         |  FROM events),
         |reg AS (SELECT event_type, h >> ${Sketches.RemBits} AS bucket,
         |    max($rhoCase) AS rho
         |  FROM h GROUP BY event_type, h >> ${Sketches.RemBits}),
         |e1 AS (SELECT event_type, count(*) AS present,
         |    SUM(1::BIGINT << (${Sketches.RemBits + 1} - rho)) AS s_present
         |  FROM reg GROUP BY 1),
         |est1 AS (SELECT event_type,
         |    $est / CAST(s_present + ($m - present) * $ew AS DOUBLE) AS hll
         |  FROM e1),
         |pairs AS (SELECT a.event_type AS et_a, b.event_type AS et_b
         |  FROM (SELECT DISTINCT event_type FROM events) a,
         |       (SELECT DISTINCT event_type FROM events) b
         |  WHERE a.event_type < b.event_type),
         |preg AS (SELECT p.et_a, p.et_b, r.bucket, max(r.rho) AS rho
         |  FROM pairs p JOIN reg r
         |    ON r.event_type = p.et_a OR r.event_type = p.et_b
         |  GROUP BY 1, 2, 3),
         |pe AS (SELECT et_a, et_b, count(*) AS present,
         |    SUM(1::BIGINT << (${Sketches.RemBits + 1} - rho)) AS s_present
         |  FROM preg GROUP BY 1, 2),
         |eu AS (SELECT et_a, et_b,
         |    $est / CAST(s_present + ($m - present) * $ew AS DOUBLE)
         |      AS hll_union
         |  FROM pe),
         |du AS (SELECT DISTINCT event_type, user_id FROM events),
         |ex AS (SELECT x.event_type AS et_a, y.event_type AS et_b,
         |    count(*) AS exact_overlap
         |  FROM du x JOIN du y ON x.user_id = y.user_id
         |    AND x.event_type < y.event_type
         |  GROUP BY 1, 2)
         |SELECT eu.et_a, eu.et_b,
         |  CAST(ex.exact_overlap AS BIGINT) AS exact_overlap,
         |  a.hll AS hll_a, b.hll AS hll_b, eu.hll_union,
         |  a.hll + b.hll - eu.hll_union AS overlap_est
         |FROM eu
         |JOIN est1 a ON a.event_type = eu.et_a
         |JOIN est1 b ON b.event_type = eu.et_b
         |JOIN ex ON ex.et_a = eu.et_a AND ex.et_b = eu.et_b""")(
      (s, dir) => {
        val ev = Tables.events(s, dir)
        // pinned: types×256 rows, consumed by the per-type estimates AND
        // every pair merge — without the pin each consumer re-scans and
        // re-aggregates events (plan-budgeted in PlanQualitySpec)
        val regs = Sketches.hllRegisters(ev, "event_type", "user_id")
          .localCheckpoint(true)
        val types = regs.select("event_type").distinct()
        val pairs = types.select(col("event_type").as("et_a"))
          .crossJoin(types.select(col("event_type").as("et_b")))
          .where(col("et_a") < col("et_b"))
        val est1 = Sketches.hllEstimate(regs, "event_type", "users")
        val pairRegs = broadcast(pairs)
          .join(regs, col("event_type") === col("et_a") ||
            col("event_type") === col("et_b"))
          .groupBy("et_a", "et_b", "bucket").agg(max("rho").as("rho"))
        val estU = Sketches.hllEstimateBy(pairRegs, Seq("et_a", "et_b"), "union")
        val du = ev.select(col("event_type"), col("user_id")).distinct()
        val exact = du.as("x")
          .join(du.as("y"), col("x.user_id") === col("y.user_id") &&
            col("x.event_type") < col("y.event_type"))
          .groupBy(col("x.event_type").as("et_a"),
            col("y.event_type").as("et_b"))
          .agg(count(lit(1)).as("exact_overlap"))
        estU
          .join(est1.select(col("event_type").as("et_a"),
            col("hll_users").as("hll_a")), "et_a")
          .join(est1.select(col("event_type").as("et_b"),
            col("hll_users").as("hll_b")), "et_b")
          .join(exact, Seq("et_a", "et_b"))
          .select(col("et_a"), col("et_b"), col("exact_overlap"),
            col("hll_a"), col("hll_b"), col("hll_union"),
            (col("hll_a") + col("hll_b") - col("hll_union")).as("overlap_est"))
      })
  }

  /** File-layout skipping audit: simulate writing events as 64
    * equal-row files under two physical orders — ts-clustered (the
    * append-order default) vs user-clustered — and measure, for a
    * deterministic probe sample of users, how many files a
    * `user_id = ?` point query must touch given per-file min/max
    * zone maps. The number a table-layout decision (z-order, bucketing,
    * sort keys) should be driven by, computed from the table itself.
    * The global file assignment uses [[graft.operators.Rank.globalRank]]
    * — the two-pass range-partitioned rank, no single-task window. */
  val q195 = QueryDef.sql("q195_layout_audit",
    """WITH e AS (SELECT user_id, ts, event_id FROM events),
      |n AS (SELECT count(*) AS cnt FROM e),
      |r1 AS (SELECT user_id,
      |    (row_number() OVER (ORDER BY ts, event_id) - 1) * 64 // cnt AS f
      |  FROM e, n),
      |r2 AS (SELECT user_id,
      |    (row_number() OVER (ORDER BY user_id, ts, event_id) - 1) * 64
      |      // cnt AS f
      |  FROM e, n),
      |b1 AS (SELECT f, min(user_id) AS lo, max(user_id) AS hi
      |       FROM r1 GROUP BY 1),
      |b2 AS (SELECT f, min(user_id) AS lo, max(user_id) AS hi
      |       FROM r2 GROUP BY 1),
      |p AS (SELECT DISTINCT user_id AS u FROM e WHERE user_id % 97 = 0),
      |t1 AS (SELECT u, count(*) AS touched FROM p
      |       JOIN b1 ON u BETWEEN lo AND hi GROUP BY 1),
      |t2 AS (SELECT u, count(*) AS touched FROM p
      |       JOIN b2 ON u BETWEEN lo AND hi GROUP BY 1)
      |SELECT 'ts' AS layout, count(*) AS n_probes,
      |  CAST(sum(touched) AS BIGINT) AS files_touched,
      |  round(CAST(sum(touched) AS DOUBLE) / count(*), 6) AS avg_touched,
      |  CAST(max(touched) AS BIGINT) AS max_touched
      |FROM t1
      |UNION ALL
      |SELECT 'user', count(*),
      |  CAST(sum(touched) AS BIGINT),
      |  round(CAST(sum(touched) AS DOUBLE) / count(*), 6),
      |  CAST(max(touched) AS BIGINT)
      |FROM t2""")(
    (s, dir) => {
      import graft.operators.Rank
      val e = Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"))
      val cnt = e.count()
      def zones(orderCols: org.apache.spark.sql.Column*) =
        Rank.globalRank(e, "rn", orderCols: _*)
          .select(col("user_id"),
            expr(s"((rn - 1) * 64) DIV $cnt").as("f"))
          .groupBy("f")
          .agg(min("user_id").as("lo"), max("user_id").as("hi"))
      val p = e.select(col("user_id").as("u"))
        .where(col("u") % 97 === 0).distinct()
      def audit(label: String, zone: org.apache.spark.sql.DataFrame) =
        p.join(broadcast(zone),
            col("u") >= col("lo") && col("u") <= col("hi"))
          .groupBy("u").agg(count(lit(1)).as("touched"))
          .agg(count(lit(1)).as("n_probes"),
            sum(col("touched")).as("files_touched"),
            max(col("touched")).as("max_touched"))
          .select(lit(label).as("layout"), col("n_probes"),
            col("files_touched"),
            round(col("files_touched").cast("double") / col("n_probes"), 6)
              .as("avg_touched"),
            col("max_touched"))
      audit("ts", zones(col("ts"), col("event_id")))
        .unionByName(audit("user",
          zones(col("user_id"), col("ts"), col("event_id"))))
    })

  /** Poisson-bootstrap 95% CI on the per-returnflag mean extended
    * price — see [[graft.operators.Bootstrap]]: B = 64 deterministic
    * hash-weighted replicates computed in ONE pass over the fact table
    * (weighted partial sums, map-side combined; only group×B partials
    * shuffle), vs the classical bootstrap's B full resamples. The CI
    * bounds are the 2nd/63rd order statistics of the replicate means;
    * every draw is an md5-threshold compare, so DuckDB replays the
    * interval bit-for-bit. */
  val q196 = {
    import graft.operators.Bootstrap
    val wCase = Bootstrap.poissonWeightSql("h")
    QueryDef.sql("q196_bootstrap_ci",
      s"""WITH li AS (SELECT l_returnflag AS g,
         |    CAST(l_orderkey AS VARCHAR) || '|' ||
         |      CAST(l_linenumber AS VARCHAR) AS key,
         |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |      AS cents
         |  FROM lineitem),
         |e AS (SELECT g, key, cents, unnest(range(64)) AS b FROM li),
         |w AS (SELECT g, b, cents, $wCase AS w
         |  FROM (SELECT *,
         |      ('0x' || substring(md5(key || '|' || CAST(b AS VARCHAR)),
         |        1, 15))::BIGINT AS h
         |    FROM e)),
         |m AS (SELECT g, b, CAST(sum(w * cents) AS BIGINT) AS s,
         |    CAST(sum(w) AS BIGINT) AS n
         |  FROM w WHERE w > 0 GROUP BY 1, 2),
         |mb AS (SELECT g, b,
         |    CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 100.0) AS mean_b
         |  FROM m),
         |r AS (SELECT g, mean_b,
         |    row_number() OVER (PARTITION BY g ORDER BY mean_b, b) AS rn
         |  FROM mb),
         |pt AS (SELECT g, count(*) AS n_rows, sum(cents) AS sc
         |  FROM li GROUP BY 1)
         |SELECT pt.g AS l_returnflag, CAST(pt.n_rows AS BIGINT) AS n_rows,
         |  round(CAST(sc AS DOUBLE) / (n_rows * 100.0), 6) AS mean_v,
         |  round(lo.mean_b, 6) AS ci_lo, round(hi.mean_b, 6) AS ci_hi
         |FROM pt
         |JOIN r lo ON lo.g = pt.g AND lo.rn = 2
         |JOIN r hi ON hi.g = pt.g AND hi.rn = 63""")(
      (s, dir) => Bootstrap.groupedMeanCI(
          Tables.lineitem(s, dir), "l_returnflag",
          concat(col("l_orderkey").cast("string"), lit("|"),
            col("l_linenumber").cast("string")),
          (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long"))
        .select(col("g").as("l_returnflag"), col("n_rows"),
          col("mean_v"), col("ci_lo"), col("ci_hi")))
  }

  /** Zipf-slope audit of the corpus vocabulary: OLS slope of
    * floor(log2 freq) on floor(log2 rank) — natural text sits near −1,
    * so a corpus whose slope drifts is a contamination/boilerplate
    * smell. Both "logs" are integer bit-lengths (`length(bin(x)) − 1`,
    * the q172 stance — no libm in the contract) and the OLS closed form
    * is exact integer sums, so the slope replays bit-for-bit. Ranking
    * uses [[graft.operators.Rank.globalRank]] over the vocabulary (the
    * model-sized frame, not the corpus), ties broken by token. */
  val q197 = QueryDef.sql("q197_zipf_slope",
    """WITH tok AS (SELECT t AS w FROM (
      |    SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
      |    FROM documents) WHERE t <> ''),
      |cu AS (SELECT w, count(*) AS c FROM tok GROUP BY 1),
      |r AS (SELECT c, row_number() OVER (ORDER BY c DESC, w) AS rank
      |      FROM cu),
      |xy AS (SELECT CAST(length(bin(rank)) - 1 AS BIGINT) AS x,
      |              CAST(length(bin(c)) - 1 AS BIGINT) AS y
      |       FROM r),
      |s AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
      |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx
      |  FROM xy)
      |SELECT CAST(n AS BIGINT) AS vocab_size,
      |  round(CAST(n * sxy - sx * sy AS DOUBLE)
      |    / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS zipf_slope,
      |  round((CAST(sy AS DOUBLE)
      |      - (CAST(n * sxy - sx * sy AS DOUBLE)
      |         / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
      |    / CAST(n AS DOUBLE), 6) AS zipf_intercept
      |FROM s""")(
    (s, dir) => {
      import graft.operators.Rank
      val cu = Tables.documents(s, dir)
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
        .where(col("w") =!= "")
        .groupBy("w").agg(count(lit(1)).as("c"))
      val r = Rank.globalRank(cu, "rank", col("c").unary_-, col("w"))
      val xy = r.select(
        expr("CAST(length(bin(rank)) - 1 AS BIGINT)").as("x"),
        expr("CAST(length(bin(c)) - 1 AS BIGINT)").as("y"))
      xy.agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .select(col("n").as("vocab_size"),
          round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
            / (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"),
            6).as("zipf_slope"),
          round((col("sy").cast("double")
              - ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
                 / (col("n") * col("sxx") - col("sx") * col("sx"))
                   .cast("double")) * col("sx").cast("double"))
            / col("n").cast("double"), 6).as("zipf_intercept"))
    })

  /** Session funnel conversion view → click → purchase: sessions are
    * 30-min-gap windows (the q186 sessionizer), stage times are per-type
    * MIN event times within the session, and a stage converts only if
    * strictly after the previous one. Per-user windows co-partition
    * with the session grouping — the whole funnel is one shuffle on
    * user_id. NULL stage times fail the strict < in both engines
    * identically. */
  val q198 = QueryDef.sql("q198_funnel_conversion",
    """WITH p AS (SELECT user_id, ts, event_id, event_type,
      |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS prev
      |  FROM events),
      |s AS (SELECT user_id, ts, event_type,
      |    sum(CASE WHEN prev IS NULL OR epoch_us(ts) - prev > 1800000000
      |             THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS UNBOUNDED PRECEDING) AS sess
      |  FROM p),
      |t AS (SELECT user_id, sess,
      |    min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS tv,
      |    min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS tc,
      |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS tp
      |  FROM s GROUP BY 1, 2)
      |SELECT count(*) AS n_sessions,
      |  CAST(sum(CASE WHEN tv IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_view,
      |  CAST(sum(CASE WHEN tc > tv THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_view_click,
      |  CAST(sum(CASE WHEN tc > tv AND tp > tc THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_full,
      |  round(CAST(sum(CASE WHEN tc > tv THEN 1 ELSE 0 END) AS DOUBLE)
      |    / sum(CASE WHEN tv IS NOT NULL THEN 1 ELSE 0 END), 6)
      |    AS r_view_click,
      |  round(CAST(sum(CASE WHEN tc > tv AND tp > tc THEN 1 ELSE 0 END)
      |      AS DOUBLE)
      |    / sum(CASE WHEN tv IS NOT NULL THEN 1 ELSE 0 END), 6) AS r_full
      |FROM t""")(
    (s, dir) => {
      val wo = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val t = Tables.events(s, dir)
        .withColumn("prev", lag(unix_micros(col("ts")), 1).over(wo))
        .withColumn("sess", sum(
          when(col("prev").isNull ||
            unix_micros(col("ts")) - col("prev") > 1800000000L, 1).otherwise(0))
          .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sess"))
        .agg(
          min(when(col("event_type") === "view", unix_micros(col("ts")))).as("tv"),
          min(when(col("event_type") === "click", unix_micros(col("ts")))).as("tc"),
          min(when(col("event_type") === "purchase", unix_micros(col("ts")))).as("tp"))
      t.agg(count(lit(1)).as("n_sessions"),
          sum(when(col("tv").isNotNull, 1).otherwise(0)).as("n_view"),
          sum(when(col("tc") > col("tv"), 1).otherwise(0)).as("n_view_click"),
          sum(when(col("tc") > col("tv") && col("tp") > col("tc"), 1)
            .otherwise(0)).as("n_full"))
        .select(col("n_sessions"), col("n_view"), col("n_view_click"),
          col("n_full"),
          round(col("n_view_click").cast("double") / col("n_view"), 6)
            .as("r_view_click"),
          round(col("n_full").cast("double") / col("n_view"), 6).as("r_full"))
    })

  /** Last-touch attribution: each purchase is credited to the user's
    * most recent view/click strictly before it and within a 7-day
    * window, else 'none'. One per-user ordered window carries the last
    * touch forward (`last(..., ignoreNulls)` over the preceding frame —
    * both the touch time and its type resolve from the SAME row, so the
    * pair is consistent); no self-join of the event stream. The shape a
    * marketing warehouse runs daily at fact-table scale: one shuffle on
    * user_id, then a 3-row aggregate. */
  val q199 = QueryDef.sql("q199_attribution",
    """WITH e AS (SELECT user_id, ts, event_id, event_type,
      |    epoch_us(ts) AS us,
      |    CASE WHEN event_type IN ('view', 'click') THEN epoch_us(ts) END
      |      AS touch_us,
      |    CASE WHEN event_type IN ('view', 'click') THEN event_type END
      |      AS touch_ty
      |  FROM events),
      |w AS (SELECT user_id, us, event_type,
      |    last_value(touch_us IGNORE NULLS) OVER
      |      (PARTITION BY user_id ORDER BY ts, event_id
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt_us,
      |    last_value(touch_ty IGNORE NULLS) OVER
      |      (PARTITION BY user_id ORDER BY ts, event_id
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt_ty
      |  FROM e),
      |a AS (SELECT CASE WHEN lt_us IS NOT NULL
      |        AND us - lt_us <= 604800000000 THEN lt_ty
      |        ELSE 'none' END AS touch_type
      |  FROM w WHERE event_type = 'purchase'),
      |tot AS (SELECT count(*) AS n FROM a)
      |SELECT touch_type, count(*) AS n_purchases,
      |  round(CAST(count(*) AS DOUBLE) / max(tot.n), 6) AS share
      |FROM a, tot GROUP BY touch_type""")(
    (s, dir) => {
      val wo = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val w = Tables.events(s, dir)
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("touch_us", when(
          col("event_type").isin("view", "click"), col("us")))
        .withColumn("touch_ty", when(
          col("event_type").isin("view", "click"), col("event_type")))
        .withColumn("lt_us", last(col("touch_us"), ignoreNulls = true).over(wo))
        .withColumn("lt_ty", last(col("touch_ty"), ignoreNulls = true).over(wo))
      val a = w.where(col("event_type") === "purchase")
        .select(when(col("lt_us").isNotNull &&
            col("us") - col("lt_us") <= 604800000000L, col("lt_ty"))
          .otherwise("none").as("touch_type"))
      val tot = a.count()
      a.groupBy("touch_type").agg(count(lit(1)).as("n_purchases"))
        .select(col("touch_type"), col("n_purchases"),
          round(col("n_purchases").cast("double") / lit(tot.toDouble), 6)
            .as("share"))
    })

  /** Cumulative distinct users per day ("users to date") — the
    * dashboard curve that naively costs one full history re-scan per
    * day. Two scale-correct forms side by side:
    * exact — each user contributes on their FIRST day only, so the
    * curve is a cumulative sum over per-day first-appearance counts
    * (one aggregate + a days-sized window);
    * sketch — per-day HLL registers max-merged along the time axis
    * (each register carried forward to every observed day ≥ it), so
    * day d's estimate is exactly the sketch of days ≤ d without
    * touching any earlier raw data — the day-d registers are what a
    * nightly job would persist, and tomorrow's curve point is one
    * 256-row merge. Both
    * replay bit-for-bit (the q51 portable-HLL stance); rel_err is the
    * observed sketch error at each day. */
  val q200 = {
    import graft.operators.Sketches
    val rhoCase = Sketches.rhoSql(s"(h & ${(1L << Sketches.RemBits) - 1})")
    val m = Sketches.Buckets
    val ew = Sketches.EmptyWeight
    val est = s"${Sketches.alphaSql} * ${m.toDouble}::DOUBLE * " +
      s"${m.toDouble}::DOUBLE * ${ew.toDouble}::DOUBLE"
    QueryDef.sql("q200_cume_distinct",
      s"""WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS d0
         |  FROM events GROUP BY 1),
         |nw AS (SELECT d0 AS day, count(*) AS new_users FROM f GROUP BY 1),
         |alldays AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
         |ex AS (SELECT d.day,
         |    sum(coalesce(nw.new_users, 0)) OVER (ORDER BY d.day
         |      ROWS UNBOUNDED PRECEDING) AS cume_users
         |  FROM alldays d LEFT JOIN nw ON nw.day = d.day),
         |h AS (SELECT CAST(ts AS DATE) AS day,
         |    ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
         |      AS h
         |  FROM events),
         |reg AS (SELECT day, h >> ${Sketches.RemBits} AS bucket,
         |    max($rhoCase) AS rho
         |  FROM h GROUP BY day, h >> ${Sketches.RemBits}),
         |-- a register persists on days after its bucket's last update:
         |-- carry each (day, bucket) forward to every OBSERVED day ≥ it,
         |-- keeping the max (register merge along the time axis)
         |days AS (SELECT DISTINCT day FROM reg),
         |carry AS (SELECT d.day, r.bucket, max(r.rho) AS rho
         |  FROM days d JOIN reg r ON r.day <= d.day
         |  GROUP BY 1, 2),
         |e AS (SELECT day, count(*) AS present,
         |    SUM(1::BIGINT << (${Sketches.RemBits + 1} - rho)) AS s_present
         |  FROM carry GROUP BY 1),
         |hll AS (SELECT day,
         |    $est / CAST(s_present + ($m - present) * $ew AS DOUBLE)
         |      AS hll_users
         |  FROM e)
         |SELECT ex.day, CAST(ex.cume_users AS BIGINT) AS cume_users,
         |  hll.hll_users,
         |  round(abs(hll.hll_users - ex.cume_users) / ex.cume_users, 6)
         |    AS rel_err
         |FROM ex JOIN hll ON ex.day = hll.day""")(
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(to_date(col("ts")).as("day"), col("user_id"))
        val nw = ev.groupBy("user_id").agg(min(col("day")).as("d0"))
          .groupBy(col("d0").as("day")).agg(count(lit(1)).as("new_users"))
        // pinned: days×256 rows — consumed by the carry join, the day
        // spine (twice) and the estimate (plan-budgeted)
        val regs = Sketches.hllRegisters(ev, "day", "user_id")
          .localCheckpoint(true)
        // carry each register forward to every observed day ≥ its day —
        // the register table is (days × 256) rows, model-sized; the
        // days⋈run join is bounded by |days|² × 256
        val days = regs.select("day").distinct()
        val ex = days
          .join(nw, Seq("day"), "left")
          .select(col("day"), sum(coalesce(col("new_users"), lit(0L))).over(
            Window.orderBy("day")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("cume_users"))
        val carry = broadcast(days.withColumnRenamed("day", "d"))
          .join(regs, col("day") <= col("d"))
          .groupBy(col("d"), col("bucket")).agg(max("rho").as("rho"))
          .withColumnRenamed("d", "day")
        val hll = Sketches.hllEstimate(carry, "day", "users")
        ex.join(hll, "day")
          .select(col("day"), col("cume_users"), col("hll_users"),
            round(abs(col("hll_users") - col("cume_users")) /
              col("cume_users"), 6).as("rel_err"))
      })
  }

  /** Time-decayed engagement with a daily half-life and ZERO libm:
    * weight(age) = 2^−age is a sum of exact binary fractions, so the
    * decayed count is maintained as the exact integer
    * Σ 2^(30 − min(age, 30)) — deterministic under any partitioning
    * and any summation order (a float `pow`/`exp` would be neither
    * cross-engine stable nor order-exact). The feature-store recency
    * feature, computable incrementally: yesterday's register halves
    * (one shift) and today's events add 2^30 each. */
  val q201 = QueryDef.sql("q201_decayed_engagement",
    """WITH r AS (SELECT max(CAST(ts AS DATE)) AS ref FROM events),
      |e AS (SELECT event_type,
      |    least(date_diff('day', CAST(ts AS DATE), ref), 30) AS age
      |  FROM events, r)
      |SELECT event_type, count(*) AS n_events,
      |  CAST(sum(1::BIGINT << (30 - age)) AS BIGINT) AS decayed_scaled,
      |  round(CAST(sum(1::BIGINT << (30 - age)) AS DOUBLE) / 1073741824.0,
      |    6) AS decayed
      |FROM e GROUP BY 1""")(
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val ref = ev.agg(max(to_date(col("ts"))).as("ref"))
      ev.crossJoin(broadcast(ref))
        .select(col("event_type"),
          least(datediff(col("ref"), to_date(col("ts"))), lit(30)).as("age"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(expr("shiftleft(1L, 30 - age)")).as("decayed_scaled"))
        .select(col("event_type"), col("n_events"), col("decayed_scaled"),
          round(col("decayed_scaled").cast("double") / lit(1073741824.0), 6)
            .as("decayed"))
    })

  /** A/B read-out: bootstrap CI on mean(value | purchase) −
    * mean(value | click) — see [[graft.operators.Bootstrap.diffMeanCI]].
    * Same B = 64 deterministic replicates resample BOTH arms in one
    * pass; the interval is the 2nd/63rd order statistic of the
    * per-replicate differences. If the CI excludes 0, ship it. */
  val q202 = {
    import graft.operators.Bootstrap
    val wCase = Bootstrap.poissonWeightSql("h")
    QueryDef.sql("q202_ab_bootstrap",
      s"""WITH ev AS (SELECT event_type AS g,
         |    CAST(event_id AS VARCHAR) AS key,
         |    CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS cents
         |  FROM events WHERE event_type IN ('purchase', 'click')),
         |e AS (SELECT g, key, cents, unnest(range(64)) AS b FROM ev),
         |w AS (SELECT g, b, cents, $wCase AS w
         |  FROM (SELECT *,
         |      ('0x' || substring(md5(key || '|' || CAST(b AS VARCHAR)),
         |        1, 15))::BIGINT AS h
         |    FROM e)),
         |m AS (SELECT g, b, CAST(sum(w * cents) AS BIGINT) AS s,
         |    CAST(sum(w) AS BIGINT) AS n
         |  FROM w WHERE w > 0 GROUP BY 1, 2),
         |mb AS (SELECT g, b,
         |    CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0) AS mean_b
         |  FROM m),
         |d AS (SELECT a.b, a.mean_b - c.mean_b AS d
         |  FROM mb a JOIN mb c ON a.b = c.b
         |  WHERE a.g = 'purchase' AND c.g = 'click'),
         |r AS (SELECT d, row_number() OVER (ORDER BY d, b) AS rn FROM d),
         |pt AS (SELECT g, count(*) AS n, sum(cents) AS sc FROM ev
         |       GROUP BY 1)
         |SELECT pa.n AS n_a, pb.n AS n_b,
         |  round(CAST(pa.sc AS DOUBLE) / (pa.n * 1000000.0)
         |    - CAST(pb.sc AS DOUBLE) / (pb.n * 1000000.0), 6) AS diff_mean,
         |  (SELECT round(d, 6) FROM r WHERE rn = 2) AS ci_lo,
         |  (SELECT round(d, 6) FROM r WHERE rn = 63) AS ci_hi
         |FROM (SELECT n, sc FROM pt WHERE g = 'purchase') pa,
         |     (SELECT n, sc FROM pt WHERE g = 'click') pb""")(
      (s, dir) => Bootstrap.diffMeanCI(
          Tables.events(s, dir), "event_type", "purchase", "click",
          col("event_id").cast("string"),
          (col("value").cast("decimal(18,6)") * 1000000).cast("long"),
          scale = 1000000.0)
        .select(
          col("n_a").cast("long").as("n_a"), col("n_b").cast("long").as("n_b"),
          col("diff_mean"), col("ci_lo"), col("ci_hi")))
  }

  /** CLUSTER bootstrap A/B read-out: q202 resamples EVENTS, which
    * understates the CI when a user's events are correlated (they
    * are — value draws share the user); the statistically-correct
    * unit is the USER, so here the Poisson weight keys on user_id and
    * every event of a drawn user rides along with the same
    * multiplicity, in BOTH arms (the paired/cluster design). Same
    * one-pass replicate machinery ([[graft.operators.Bootstrap
    * .diffMeanCI]] — the key column is a parameter), same B = 64
    * order-statistic interval; expect a wider CI than q202 on the
    * same contrast. */
  val q338 = {
    import graft.operators.Bootstrap
    val wCase = Bootstrap.poissonWeightSql("h")
    QueryDef.sql("q338_cluster_bootstrap",
      s"""WITH ev AS (SELECT event_type AS g,
         |    CAST(user_id AS VARCHAR) AS key,
         |    CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS cents
         |  FROM events WHERE event_type IN ('purchase', 'click')),
         |e AS (SELECT g, key, cents, unnest(range(64)) AS b FROM ev),
         |w AS (SELECT g, b, cents, $wCase AS w
         |  FROM (SELECT *,
         |      ('0x' || substring(md5(key || '|' || CAST(b AS VARCHAR)),
         |        1, 15))::BIGINT AS h
         |    FROM e)),
         |m AS (SELECT g, b, CAST(sum(w * cents) AS BIGINT) AS s,
         |    CAST(sum(w) AS BIGINT) AS n
         |  FROM w WHERE w > 0 GROUP BY 1, 2),
         |mb AS (SELECT g, b,
         |    CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0) AS mean_b
         |  FROM m),
         |d AS (SELECT a.b, a.mean_b - c.mean_b AS d
         |  FROM mb a JOIN mb c ON a.b = c.b
         |  WHERE a.g = 'purchase' AND c.g = 'click'),
         |r AS (SELECT d, row_number() OVER (ORDER BY d, b) AS rn FROM d),
         |pt AS (SELECT g, count(*) AS n, sum(cents) AS sc FROM ev
         |       GROUP BY 1)
         |SELECT pa.n AS n_a, pb.n AS n_b,
         |  round(CAST(pa.sc AS DOUBLE) / (pa.n * 1000000.0)
         |    - CAST(pb.sc AS DOUBLE) / (pb.n * 1000000.0), 6) AS diff_mean,
         |  (SELECT round(d, 6) FROM r WHERE rn = 2) AS ci_lo,
         |  (SELECT round(d, 6) FROM r WHERE rn = 63) AS ci_hi
         |FROM (SELECT n, sc FROM pt WHERE g = 'purchase') pa,
         |     (SELECT n, sc FROM pt WHERE g = 'click') pb""")(
      (s, dir) => Bootstrap.diffMeanCI(
          Tables.events(s, dir), "event_type", "purchase", "click",
          col("user_id").cast("string"),
          (col("value").cast("decimal(18,6)") * 1000000).cast("long"),
          scale = 1000000.0)
        .select(
          col("n_a").cast("long").as("n_a"), col("n_b").cast("long").as("n_b"),
          col("diff_mean"), col("ci_lo"), col("ci_hi")))
  }

  /** Robust anomaly days: per event type, flag days whose count sits
    * more than 3·1.4826·MAD from the per-type median (the
    * normal-consistent MAD z-score — outlier-proof where mean/stddev
    * is not). The medians run over the AGGREGATED (type × day) frame —
    * bounded, never the raw events — so the whole monitor is one
    * count aggregate plus two tiny percentile passes. MAD = 0 (a
    * metronome-flat week) degrades to flagging any deviation. */
  val q203 = QueryDef.sql("q203_mad_anomaly_days",
    """WITH c AS (SELECT event_type, CAST(ts AS DATE) AS day,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |med AS (SELECT event_type, quantile_cont(n, 0.5) AS med
      |  FROM c GROUP BY 1),
      |dev AS (SELECT c.event_type, c.day, c.n, med.med,
      |    abs(c.n - med.med) AS ab
      |  FROM c JOIN med USING (event_type)),
      |mad AS (SELECT event_type, quantile_cont(ab, 0.5) AS mad
      |  FROM dev GROUP BY 1)
      |SELECT dev.event_type, dev.day, CAST(dev.n AS BIGINT) AS n,
      |  round(dev.med, 6) AS med, round(mad.mad, 6) AS mad,
      |  CASE WHEN mad.mad > 0 THEN dev.ab > 4.4478 * mad.mad
      |       ELSE dev.ab > 0 END AS is_anomaly
      |FROM dev JOIN mad USING (event_type)""")(
    (s, dir) => {
      val c = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val med = c.groupBy("event_type")
        .agg(expr("percentile(n, 0.5)").as("med"))
      val dev = c.join(broadcast(med), "event_type")
        .withColumn("ab", abs(col("n") - col("med")))
      val mad = dev.groupBy("event_type")
        .agg(expr("percentile(ab, 0.5)").as("mad"))
      dev.join(broadcast(mad), "event_type")
        .select(col("event_type"), col("day"), col("n"),
          round(col("med"), 6).as("med"), round(col("mad"), 6).as("mad"),
          when(col("mad") > 0, col("ab") > lit(4.4478) * col("mad"))
            .otherwise(col("ab") > 0).as("is_anomaly"))
    })

  /** CUSUM changepoint per event type: the day t maximizing
    * |T·S_t − t·C| (cumulative count vs the uniform-rate line, cross-
    * multiplied so the statistic stays exact integer; the normalized
    * stat divides once at the end). The drift detector a monitoring
    * pipeline runs per metric — everything after the daily-count
    * aggregate is bounded by |days|. Ties break to the earliest day. */
  val q204 = QueryDef.sql("q204_cusum_changepoint",
    """WITH c AS (SELECT event_type, CAST(ts AS DATE) AS day,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |s AS (SELECT event_type, day, n,
      |    sum(n) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS UNBOUNDED PRECEDING) AS cume,
      |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS t,
      |    count(*) OVER (PARTITION BY event_type) AS tt,
      |    sum(n) OVER (PARTITION BY event_type) AS tot
      |  FROM c),
      |d AS (SELECT event_type, day,
      |    abs(tt * cume - t * tot) AS stat, tt, tot,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY abs(tt * cume - t * tot) DESC, day) AS rk
      |  FROM s)
      |SELECT event_type, day AS cp_day,
      |  CAST(stat AS BIGINT) AS cusum_stat,
      |  round(CAST(stat AS DOUBLE) / (tt * tot), 6) AS cusum_norm
      |FROM d WHERE rk = 1""")(
    (s, dir) => {
      val c = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val wp = Window.partitionBy("event_type")
      val wo = wp.orderBy("day")
      val st = c
        .withColumn("cume", sum("n").over(
          wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("t", row_number().over(wo))
        .withColumn("tt", count(lit(1)).over(wp))
        .withColumn("tot", sum("n").over(wp))
        .withColumn("stat", abs(col("tt") * col("cume") - col("t") * col("tot")))
        .withColumn("rk", row_number().over(
          wp.orderBy(col("stat").desc, col("day"))))
      st.where(col("rk") === 1)
        .select(col("event_type"), col("day").as("cp_day"),
          col("stat").as("cusum_stat"),
          round(col("stat").cast("double") / (col("tt") * col("tot")), 6)
            .as("cusum_norm"))
    })

  /** Priority sampling (Duffield–Lund–Thorup): ONE weighted sample of
    * k = 1000 rows answers ANY subset-sum query afterwards — est(S) =
    * Σ_{kept ∩ S} max(w, τ) with τ the (k+1)-th priority. Priorities
    * are w/u with u the md5-uniform of the row id, so the sample is
    * deterministic and the whole construction replays in DuckDB. The
    * sample itself comes from the one-pass bounded-heap
    * [[graft.functions.TopKByScore]] aggregate (n·k shuffle, never a
    * global sort); the oracle ranks explicitly. τ is integerized to
    * cents so the estimator sum stays exact under any order. Reported
    * per returnflag: exact revenue vs the estimate from the shared
    * 1000-row sample. */
  val q205 = {
    val two60 = "1152921504606846976.0"
    QueryDef.sql("q205_priority_sample",
      s"""WITH b AS (SELECT l_returnflag,
         |    CAST(l_orderkey AS VARCHAR) || '|' ||
         |    CAST(l_linenumber AS VARCHAR) || '|' ||
         |    CAST(l_partkey AS VARCHAR) || '|' ||
         |    CAST(l_suppkey AS VARCHAR) AS key,
         |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |      AS cents
         |  FROM lineitem),
         |p AS (SELECT *, CAST(cents AS DOUBLE) * $two60
         |    / (CAST(h AS DOUBLE) + 1.0) AS q
         |  FROM (SELECT *, ('0x' || substring(md5(key), 1, 15))::BIGINT AS h
         |        FROM b)),
         |r AS (SELECT *, row_number() OVER (ORDER BY q DESC, h) AS rn
         |      FROM p),
         |tau AS (SELECT CAST(round(q) AS BIGINT) AS tau_c FROM r
         |        WHERE rn = 1001),
         |kept AS (SELECT h FROM r WHERE rn <= 1000),
         |est AS (SELECT p.l_returnflag, count(*) AS n_sampled,
         |    CAST(sum(greatest(p.cents, tau.tau_c)) AS BIGINT) AS est_cents
         |  FROM p JOIN kept USING (h), tau GROUP BY 1),
         |ex AS (SELECT l_returnflag, CAST(sum(cents) AS BIGINT)
         |    AS exact_cents FROM b GROUP BY 1)
         |SELECT ex.l_returnflag, ex.exact_cents, est.n_sampled,
         |  est.est_cents,
         |  round(CAST(abs(est.est_cents - ex.exact_cents) AS DOUBLE)
         |    / ex.exact_cents, 6) AS rel_err
         |FROM ex JOIN est USING (l_returnflag)""")(
      (s, dir) => {
        import graft.operators.Sketches
        val k = 1000
        val base = Tables.lineitem(s, dir).select(col("l_returnflag"),
          concat(col("l_orderkey").cast("string"), lit("|"),
            col("l_linenumber").cast("string"), lit("|"),
            col("l_partkey").cast("string"), lit("|"),
            col("l_suppkey").cast("string")).as("key"),
          (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"))
        val withQ = base
          .withColumn("h", Sketches.hash60(col("key")))
          .withColumn("q", col("cents").cast("double") *
            lit(1152921504606846976.0) / (col("h").cast("double") + lit(1.0)))
          .localCheckpoint(true) // feeds the heap AND the kept join-back
        val top = withQ
          .agg(graft.functions.TopKAggregate.topkByScore(
            col("q"), col("h"), k + 1).as("tk"))
          .select(posexplode(col("tk")).as(Seq("pos", "p")))
          .select(col("pos"), col("p.score").as("q"), col("p.id").as("h"))
          .localCheckpoint(true) // 1001 rows; consumed twice below
        val tau = top.where(col("pos") === k)
          .select(round(col("q")).cast("long").as("tau_c"))
        val kept = top.where(col("pos") < k).select("h")
        val est = withQ.join(broadcast(kept), "h")
          .crossJoin(broadcast(tau))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n_sampled"),
            sum(greatest(col("cents"), col("tau_c"))).as("est_cents"))
        base.groupBy("l_returnflag").agg(sum("cents").as("exact_cents"))
          .join(est, "l_returnflag")
          .select(col("l_returnflag"), col("exact_cents"), col("n_sampled"),
            col("est_cents"),
            round(abs(col("est_cents") - col("exact_cents")).cast("double")
              / col("exact_cents"), 6).as("rel_err"))
      })
  }

  /** Permissive JSON ingest with quarantine accounting — the
    * semi-structured twin of the CSV try_cast quarantine (SURVEY §2.1
    * S2): a deterministic 1% of `props` payloads are mangled, then
    * parsed with an explicit schema; unparseable records are COUNTED
    * per type (the load-report metric), never dropped silently, and
    * the valid remainder aggregates normally. The corruption is
    * LEADING garbage ('X' prefixed) — the one class both parsers
    * reject identically and completely. Trailing garbage does NOT
    * work (Jackson accepts it, `json_valid` refuses) and truncation
    * does not either (Jackson's partial-results mode salvages the
    * parsed prefix) — both measured, not guessed. Corruption is
    * detected as "schema field unextractable", which also covers
    * payloads that are valid JSON of the wrong shape. */
  val q206 = QueryDef.sql("q206_json_quarantine",
    """WITH m AS (SELECT event_type,
      |    CASE WHEN event_id % 100 = 0 THEN 'X' || props
      |         ELSE props END AS pj
      |  FROM events),
      |p AS (SELECT event_type,
      |    CASE WHEN json_valid(pj)
      |         THEN CAST(json_extract(pj, '$.k') AS BIGINT) END AS k
      |  FROM m),
      |q AS (SELECT event_type, k,
      |    CASE WHEN k IS NULL THEN 1 ELSE 0 END AS bad FROM p)
      |SELECT event_type, count(*) AS n_rows,
      |  CAST(sum(bad) AS BIGINT) AS n_quarantined,
      |  CAST(sum(k) AS BIGINT) AS sum_k,
      |  round(CAST(sum(bad) AS DOUBLE) / count(*), 6) AS quarantine_rate
      |FROM q GROUP BY 1""")(
    (s, dir) => {
      val m = Tables.events(s, dir)
        .select(col("event_type"),
          when(col("event_id") % 100 === 0, concat(lit("X"), col("props")))
            .otherwise(col("props")).as("pj"))
      val p = m.select(col("event_type"),
        from_json(col("pj"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType)))).as("j"))
      p.select(col("event_type"),
          col("j.k").isNull.cast("long").as("bad"),
          col("j.k").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_rows"), sum(col("bad")).as("n_quarantined"),
          sum(col("k")).as("sum_k"))
        .select(col("event_type"), col("n_rows"), col("n_quarantined"),
          col("sum_k"),
          round(col("n_quarantined").cast("double") / col("n_rows"), 6)
            .as("quarantine_rate"))
    })

  /** Sliding 7-day active users (WAU) per day — the windowed sibling of
    * q200's cumulative curve: per-day HLL registers max-merged over a
    * 7-day window. The exact twin (distinct users per window) rides
    * along as the yardstick; at 100 TB the per-day registers are the
    * persisted artifact and each day's WAU is a ≤ 7×256-row merge,
    * where the exact form re-touches seven days of raw history per
    * day. Same portable-HLL register machinery as q51/q194/q200. */
  val q207 = {
    import graft.operators.Sketches
    val rhoCase = Sketches.rhoSql(s"(h & ${(1L << Sketches.RemBits) - 1})")
    val m = Sketches.Buckets
    val ew = Sketches.EmptyWeight
    val est = s"${Sketches.alphaSql} * ${m.toDouble}::DOUBLE * " +
      s"${m.toDouble}::DOUBLE * ${ew.toDouble}::DOUBLE"
    QueryDef.sql("q207_wau_sketch",
      s"""WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
         |  FROM events),
         |days AS (SELECT DISTINCT day FROM du),
         |exact AS (SELECT d.day, count(DISTINCT du.user_id) AS wau_exact
         |  FROM days d JOIN du
         |    ON du.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
         |  GROUP BY 1),
         |h AS (SELECT CAST(ts AS DATE) AS day,
         |    ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
         |      AS h
         |  FROM events),
         |reg AS (SELECT day, h >> ${Sketches.RemBits} AS bucket,
         |    max($rhoCase) AS rho
         |  FROM h GROUP BY day, h >> ${Sketches.RemBits}),
         |win AS (SELECT d.day, r.bucket, max(r.rho) AS rho
         |  FROM days d JOIN reg r
         |    ON r.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
         |  GROUP BY 1, 2),
         |e AS (SELECT day, count(*) AS present,
         |    SUM(1::BIGINT << (${Sketches.RemBits + 1} - rho)) AS s_present
         |  FROM win GROUP BY 1),
         |hll AS (SELECT day,
         |    $est / CAST(s_present + ($m - present) * $ew AS DOUBLE)
         |      AS wau_hll
         |  FROM e)
         |SELECT exact.day, CAST(exact.wau_exact AS BIGINT) AS wau_exact,
         |  hll.wau_hll,
         |  round(abs(hll.wau_hll - exact.wau_exact) / exact.wau_exact, 6)
         |    AS rel_err
         |FROM exact JOIN hll ON exact.day = hll.day""")(
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(to_date(col("ts")).as("day"), col("user_id"))
        // pinned: the distinct (day, user) frame feeds both the day
        // spine and the exact window join; the register table feeds the
        // sketch merge (plan-budgeted)
        val du = ev.distinct().localCheckpoint(true)
        val days = du.select("day").distinct()
        val dd = broadcast(days.withColumnRenamed("day", "d"))
        val exact = dd
          .join(du, col("day") >= date_sub(col("d"), 6) &&
            col("day") <= col("d"))
          .groupBy(col("d")).agg(countDistinct("user_id").as("wau_exact"))
        val regs = Sketches.hllRegisters(ev, "day", "user_id")
          .localCheckpoint(true)
        val win = dd
          .join(regs, col("day") >= date_sub(col("d"), 6) &&
            col("day") <= col("d"))
          .groupBy(col("d"), col("bucket")).agg(max("rho").as("rho"))
        val hll = Sketches.hllEstimate(win, "d", "wau")
        exact.join(hll, "d")
          .select(col("d").as("day"), col("wau_exact"),
            col("hll_wau").as("wau_hll"),
            round(abs(col("hll_wau") - col("wau_exact")) / col("wau_exact"),
              6).as("rel_err"))
      })
  }

  /** Table size profile — the stats a planner needs BEFORE choosing
    * join strategies: per table, row count, estimated row width under
    * an explicit byte model (8 B per numeric/temporal, avg string
    * length for text), the resulting table estimate in MB, and the
    * 10 MB broadcast-eligibility verdict the q191/q192 reports combine
    * with. One map-side-combined aggregate per table; exact integer
    * sums, one rounded division each at the end. */
  val q208 = QueryDef.sql("q208_size_profile",
    """WITH s AS (
      |  SELECT 'region' AS tbl, count(*) AS n,
      |    CAST(sum(8 + length(r_name)) AS BIGINT) AS bytes FROM region
      |  UNION ALL SELECT 'nation', count(*),
      |    CAST(sum(8 + 8 + length(n_name)) AS BIGINT) FROM nation
      |  UNION ALL SELECT 'customer', count(*),
      |    CAST(sum(8 + 8 + 8 + length(c_name) + length(c_mktsegment))
      |      AS BIGINT) FROM customer
      |  UNION ALL SELECT 'supplier', count(*),
      |    CAST(sum(8 + 8 + 8 + length(s_name)) AS BIGINT) FROM supplier
      |  UNION ALL SELECT 'part', count(*),
      |    CAST(sum(8 + 8 + 8 + length(p_name) + length(p_brand) +
      |      length(p_type)) AS BIGINT) FROM part
      |  UNION ALL SELECT 'orders', count(*),
      |    CAST(sum(8 + 8 + 8 + 8 + length(o_orderstatus) +
      |      length(o_orderpriority)) AS BIGINT) FROM orders
      |  UNION ALL SELECT 'lineitem', count(*),
      |    CAST(sum(8 * 8 + length(l_returnflag) + length(l_linestatus))
      |      AS BIGINT) FROM lineitem
      |  UNION ALL SELECT 'events', count(*),
      |    CAST(sum(8 + 8 + 8 + 8 + length(event_type) + length(props))
      |      AS BIGINT) FROM events
      |  UNION ALL SELECT 'documents', count(*),
      |    CAST(sum(8 + 8 + length(text) + length(lang) + length(source))
      |      AS BIGINT) FROM documents)
      |SELECT tbl, CAST(n AS BIGINT) AS n_rows,
      |  round(CAST(bytes AS DOUBLE) / n, 6) AS est_row_bytes,
      |  round(CAST(bytes AS DOUBLE) / 1048576.0, 6) AS est_mb,
      |  bytes <= 10485760 AS broadcast_ok
      |FROM s""")(
    (s, dir) => {
      def prof(tbl: String, df: org.apache.spark.sql.DataFrame,
               bytesExpr: String) =
        df.agg(count(lit(1)).as("n"), sum(expr(bytesExpr)).as("bytes"))
          .select(lit(tbl).as("tbl"), col("n"), col("bytes"))
      Seq(
        prof("region", Tables.region(s, dir), "8 + length(r_name)"),
        prof("nation", Tables.nation(s, dir), "8 + 8 + length(n_name)"),
        prof("customer", Tables.customer(s, dir),
          "8 + 8 + 8 + length(c_name) + length(c_mktsegment)"),
        prof("supplier", Tables.supplier(s, dir),
          "8 + 8 + 8 + length(s_name)"),
        prof("part", Tables.part(s, dir),
          "8 + 8 + 8 + length(p_name) + length(p_brand) + length(p_type)"),
        prof("orders", Tables.orders(s, dir),
          "8 + 8 + 8 + 8 + length(o_orderstatus) + length(o_orderpriority)"),
        prof("lineitem", Tables.lineitem(s, dir),
          "8 * 8 + length(l_returnflag) + length(l_linestatus)"),
        prof("events", Tables.events(s, dir),
          "8 + 8 + 8 + 8 + length(event_type) + length(props)"),
        prof("documents", Tables.documents(s, dir),
          "8 + 8 + length(text) + length(lang) + length(source)"))
        .reduce(_ unionByName _)
        .select(col("tbl"), col("n").as("n_rows"),
          round(col("bytes").cast("double") / col("n"), 6)
            .as("est_row_bytes"),
          round(col("bytes").cast("double") / lit(1048576.0), 6).as("est_mb"),
          (col("bytes") <= 10485760L).as("broadcast_ok"))
    })

  /** Decile lift & cumulative-gains curve — the model-evaluation table
    * behind every targeting decision: rank by a score (o_totalprice as
    * the stand-in model output), cut into 10 equal-population deciles
    * with integer thresholds, and report per decile the positive rate
    * (outcome: 1-URGENT priority), the lift over the base rate and the
    * cumulative share of positives captured. Ranking is the two-pass
    * [[graft.operators.Rank.globalRank]] (no single-task window over
    * the fact table); everything after is a 10-row frame. */
  val q209 = QueryDef.sql("q209_lift_curve",
    """WITH b AS (SELECT
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS sc,
      |    o_orderkey,
      |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
      |  FROM orders),
      |r AS (SELECT y,
      |    row_number() OVER (ORDER BY sc DESC, o_orderkey) AS rn FROM b),
      |n AS (SELECT count(*) AS tot, CAST(sum(y) AS BIGINT) AS pos FROM b),
      |d AS (SELECT ((rn - 1) * 10) // tot + 1 AS decile,
      |    count(*) AS n_rows, CAST(sum(y) AS BIGINT) AS n_pos
      |  FROM r, n GROUP BY 1),
      |c AS (SELECT decile, n_rows, n_pos,
      |    sum(n_pos) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
      |      AS cum_pos
      |  FROM d)
      |SELECT CAST(c.decile AS BIGINT) AS decile,
      |  CAST(c.n_rows AS BIGINT) AS n_rows, c.n_pos,
      |  round(CAST(c.n_pos * n.tot AS DOUBLE) / (c.n_rows * n.pos), 6)
      |    AS lift,
      |  round(CAST(c.cum_pos AS DOUBLE) / n.pos, 6) AS cum_gain
      |FROM c, n""")(
    (s, dir) => {
      import graft.operators.Rank
      val b = Tables.orders(s, dir).select(
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("sc"),
        col("o_orderkey"),
        when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)
          .as("y"))
      val tot = b.count()
      val r = Rank.globalRank(b, "rn", col("sc").unary_-, col("o_orderkey"))
      val d = r.groupBy(expr(s"((rn - 1) * 10) DIV $tot + 1").as("decile"))
        .agg(count(lit(1)).as("n_rows"), sum("y").as("n_pos"))
      val n = d.agg(sum("n_rows").as("tot"), sum("n_pos").as("pos"))
      d.withColumn("cum_pos", sum("n_pos").over(Window.orderBy("decile")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .crossJoin(broadcast(n))
        .select(col("decile"), col("n_rows"), col("n_pos"),
          round((col("n_pos") * col("tot")).cast("double") /
            (col("n_rows") * col("pos")), 6).as("lift"),
          round(col("cum_pos").cast("double") / col("pos"), 6).as("cum_gain"))
    })

  /** Exact ties-aware AUC (the Mann–Whitney U form) at fact-table
    * scale: AUC = P(score⁺ > score⁻) + ½P(=), computed from per-score
    * group counts with a running negative count — 2U stays integer
    * (each tie contributes 1 instead of ½), one exact division at the
    * end. The running sum is the two-pass
    * [[graft.operators.Rank.globalPrefixSum]], so no single-task
    * window touches the score-group frame. MLlib's
    * `areaUnderROC` approximates via thresholds; this is the exact
    * number it converges to. */
  val q210 = QueryDef.sql("q210_auc_exact",
    """WITH b AS (SELECT
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS sc,
      |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      |  FROM lineitem),
      |g AS (SELECT sc, CAST(sum(y) AS BIGINT) AS np,
      |    CAST(count(*) - sum(y) AS BIGINT) AS nn
      |  FROM b GROUP BY 1),
      |c AS (SELECT sc, np, nn,
      |    sum(nn) OVER (ORDER BY sc ROWS UNBOUNDED PRECEDING) - nn
      |      AS cnb
      |  FROM g),
      |t AS (SELECT CAST(sum(np) AS BIGINT) AS tp,
      |    CAST(sum(nn) AS BIGINT) AS tn,
      |    CAST(sum(np * (2 * cnb + nn)) AS BIGINT) AS u2 FROM c)
      |SELECT tp AS n_pos, tn AS n_neg,
      |  round(CAST(u2 AS DOUBLE) / (2.0 * tp * tn), 6) AS auc
      |FROM t""")(
    (s, dir) => {
      import graft.operators.Rank
      val g = Tables.lineitem(s, dir).select(
          (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
            .as("sc"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
        .groupBy("sc")
        .agg(sum("y").as("np"), (count(lit(1)) - sum("y")).as("nn"))
      val c = Rank.globalPrefixSum(g, "cni", "nn", col("sc"))
        .withColumn("cnb", col("cni") - col("nn"))
      c.agg(sum("np").as("tp"), sum("nn").as("tn"),
          sum(col("np") * (lit(2) * col("cnb") + col("nn"))).as("u2"))
        .select(col("tp").as("n_pos"), col("tn").as("n_neg"),
          round(col("u2").cast("double") /
            (lit(2.0) * col("tp") * col("tn")), 6).as("auc"))
    })

  /** Exact two-sample Kolmogorov–Smirnov distance between the purchase
    * and click value distributions: D = max |ECDF_A − ECDF_B| computed
    * as integer cross-products |cumA·nB − cumB·nA| over per-score
    * counts (the q210 AUC machinery pointed at a different statistic).
    * Running counts via [[graft.operators.Rank.globalPrefixSum]]
    * twice — never a single-task window over the score frame. The
    * argmax score reports WHERE the distributions diverge most (ties →
    * smallest score). */
  val q211 = QueryDef.sql("q211_ks_two_sample",
    """WITH b AS (SELECT
      |    CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS sc,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS a
      |  FROM events WHERE event_type IN ('purchase', 'click')),
      |g AS (SELECT sc, CAST(sum(a) AS BIGINT) AS ca,
      |    CAST(count(*) - sum(a) AS BIGINT) AS cb
      |  FROM b GROUP BY 1),
      |c AS (SELECT sc,
      |    sum(ca) OVER (ORDER BY sc ROWS UNBOUNDED PRECEDING) AS cuma,
      |    sum(cb) OVER (ORDER BY sc ROWS UNBOUNDED PRECEDING) AS cumb
      |  FROM g),
      |t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
      |    CAST(sum(cb) AS BIGINT) AS nb FROM g),
      |d AS (SELECT sc, abs(cuma * t.nb - cumb * t.na) AS num FROM c, t),
      |m AS (SELECT max(num) AS mnum FROM d)
      |SELECT t.na AS n_a, t.nb AS n_b,
      |  (SELECT min(sc) FROM d, m WHERE d.num = m.mnum) AS ks_at,
      |  round(CAST(m.mnum AS DOUBLE) / (t.na * t.nb), 6) AS ks_d
      |FROM t, m""")(
    (s, dir) => {
      import graft.operators.Rank
      val g = Tables.events(s, dir)
        .where(col("event_type").isin("purchase", "click"))
        .select((col("value").cast("decimal(18,6)") * 1000000).cast("long")
          .as("sc"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("a"))
        .groupBy("sc")
        .agg(sum("a").as("ca"), (count(lit(1)) - sum("a")).as("cb"))
        .localCheckpoint(true) // two prefix passes + the totals read it
      // both running class counts fused onto one range exchange
      val c = Rank.globalOrderStats(g,
        Seq("cuma" -> "ca", "cumb" -> "cb"), None, col("sc"))
      val t = g.agg(sum("ca").as("na"), sum("cb").as("nb"))
      val d = c.crossJoin(broadcast(t))
        .select(col("sc"),
          abs(col("cuma") * col("nb") - col("cumb") * col("na")).as("num"))
        .localCheckpoint(true) // max + argmax both read it
      val m = d.agg(max("num").as("mnum"))
      val at = d.join(broadcast(m), col("num") === col("mnum"))
        .agg(min("sc").as("ks_at"))
      broadcast(t).crossJoin(broadcast(m)).crossJoin(broadcast(at))
        .select(col("na").as("n_a"), col("nb").as("n_b"), col("ks_at"),
          round(col("mnum").cast("double") / (col("na") * col("nb")), 6)
            .as("ks_d"))
    })

  /** Calibration table + expected calibration error for a score
    * treated as its own percentile-rank prediction: bin by rank
    * deciles, compare the mean predicted percentile (Σ(rank−1) over
    * N−1 — exact rational) with the observed positive rate. The ECE
    * folds the per-bin gaps into ONE integer sum
    * Σ_b |Σ(rank−1) − pos_b·(N−1)| before the single final division,
    * so the number is partitioning-proof. Ranking is the two-pass
    * [[graft.operators.Rank.globalRank]]. */
  val q212 = QueryDef.sql("q212_calibration_ece",
    """WITH b AS (SELECT
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS sc,
      |    o_orderkey,
      |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
      |  FROM orders),
      |n AS (SELECT count(*) AS nn FROM b),
      |r AS (SELECT y,
      |    row_number() OVER (ORDER BY sc, o_orderkey) - 1 AS rk FROM b),
      |d AS (SELECT (rk * 10) // nn AS bin, count(*) AS n_rows,
      |    CAST(sum(y) AS BIGINT) AS n_pos, CAST(sum(rk) AS BIGINT) AS srk
      |  FROM r, n GROUP BY 1),
      |e AS (SELECT CAST(sum(abs(srk - n_pos * (nn - 1))) AS BIGINT) AS enum
      |  FROM d, n)
      |SELECT CAST(d.bin AS BIGINT) AS bin,
      |  CAST(d.n_rows AS BIGINT) AS n_rows, d.n_pos,
      |  round(CAST(d.srk AS DOUBLE) / (d.n_rows * (n.nn - 1)), 6)
      |    AS mean_pred,
      |  round(CAST(d.n_pos AS DOUBLE) / d.n_rows, 6) AS pos_rate,
      |  round(CAST(e.enum AS DOUBLE) / (n.nn * (n.nn - 1)), 6) AS ece
      |FROM d, n, e""")(
    (s, dir) => {
      import graft.operators.Rank
      val b = Tables.orders(s, dir).select(
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("sc"),
        col("o_orderkey"),
        when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)
          .as("y"))
      val nn = b.count()
      val d = Rank.globalRank(b, "rn", col("sc"), col("o_orderkey"))
        .select(col("y"), (col("rn") - 1).as("rk"))
        .groupBy(expr(s"(rk * 10) DIV $nn").as("bin"))
        .agg(count(lit(1)).as("n_rows"), sum("y").as("n_pos"),
          sum("rk").as("srk"))
        .localCheckpoint(true) // the ECE fold and the table both read it
      val e = d.agg(sum(abs(col("srk") - col("n_pos") * lit(nn - 1)))
        .as("enum"))
      d.crossJoin(broadcast(e))
        .select(col("bin"), col("n_rows"), col("n_pos"),
          round(col("srk").cast("double") /
            (col("n_rows") * lit(nn - 1)), 6).as("mean_pred"),
          round(col("n_pos").cast("double") / col("n_rows"), 6)
            .as("pos_rate"),
          round(col("enum").cast("double") / (lit(nn) * lit(nn - 1)), 6)
            .as("ece"))
    })

  /** Time-to-repeat survival curve (Nelson–Aalen cumulative hazard):
    * per customer, days from first to second distinct order day, right-
    * censored at the corpus horizon. At each event time t: the risk set
    * n_t = |{time ≥ t}| (suffix count = total − exclusive prefix), the
    * events d_t, and H(t) = Σ_{s≤t} d_s/n_s. Each hazard term is a
    * rational of two exact integers, fixed-pointed to nano-units BEFORE
    * the cumulative sum — summing raw doubles would be order-dependent
    * across engines; summing the rounded integers is exact under any
    * partitioning (the q201 stance). The Kaplan–Meier product follows
    * as exp(−H) downstream — deliberately NOT computed here (libm). */
  val q213 = QueryDef.sql("q213_survival_hazard",
    """WITH od AS (SELECT DISTINCT o_custkey, CAST(o_orderdate AS DATE)
      |    AS d FROM orders),
      |h AS (SELECT max(d) AS horizon FROM od),
      |f AS (SELECT o_custkey, min(d) AS f1 FROM od GROUP BY 1),
      |s AS (SELECT od.o_custkey, min(od.d) AS s2
      |  FROM od JOIN f ON od.o_custkey = f.o_custkey AND od.d > f.f1
      |  GROUP BY 1),
      |t AS (SELECT f.o_custkey,
      |    CASE WHEN s.s2 IS NULL
      |         THEN date_diff('day', f.f1, h.horizon) ELSE
      |         date_diff('day', f.f1, s.s2) END AS tm,
      |    CASE WHEN s.s2 IS NULL THEN 0 ELSE 1 END AS ev
      |  FROM f LEFT JOIN s ON f.o_custkey = s.o_custkey, h),
      |g AS (SELECT tm, CAST(sum(ev) AS BIGINT) AS d,
      |    CAST(count(*) AS BIGINT) AS c FROM t GROUP BY 1),
      |n AS (SELECT CAST(sum(c) AS BIGINT) AS tot FROM g),
      |r AS (SELECT tm, d, c,
      |    n.tot - (sum(c) OVER (ORDER BY tm ROWS UNBOUNDED PRECEDING) - c)
      |      AS n_risk
      |  FROM g, n),
      |z AS (SELECT tm, d, n_risk,
      |    CAST(round(CAST(d AS DOUBLE) / n_risk * 1000000000.0) AS BIGINT)
      |      AS h_nano
      |  FROM r WHERE d > 0)
      |SELECT CAST(tm AS BIGINT) AS t_days, d AS n_events,
      |  CAST(n_risk AS BIGINT) AS n_risk,
      |  round(CAST(sum(h_nano) OVER (ORDER BY tm ROWS UNBOUNDED PRECEDING)
      |    AS DOUBLE) / 1000000000.0, 6) AS cum_hazard
      |FROM z""")(
    (s, dir) => {
      import graft.operators.Rank
      val od = Tables.orders(s, dir)
        .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"))
        .distinct()
        .localCheckpoint(true) // horizon, first and second pass read it
      val horizon = od.agg(max("d").as("horizon"))
      val f = od.groupBy("o_custkey").agg(min("d").as("f1"))
      val s2 = od.join(f, Seq("o_custkey"))
        .where(col("d") > col("f1"))
        .groupBy("o_custkey").agg(min("d").as("s2"))
      val t = f.join(s2, Seq("o_custkey"), "left")
        .crossJoin(broadcast(horizon))
        .select(
          when(col("s2").isNull, datediff(col("horizon"), col("f1")))
            .otherwise(datediff(col("s2"), col("f1"))).as("tm"),
          when(col("s2").isNull, 0L).otherwise(1L).as("ev"))
      val g = t.groupBy("tm").agg(sum("ev").as("d"), count(lit(1)).as("c"))
      val tot = g.agg(sum("c")).head().getLong(0)
      val r = Rank.globalPrefixSum(g, "cinc", "c", col("tm"))
        .withColumn("n_risk", lit(tot) - (col("cinc") - col("c")))
        .where(col("d") > 0)
        .withColumn("h_nano",
          round(col("d").cast("double") / col("n_risk") *
            lit(1000000000.0)).cast("long"))
      Rank.globalPrefixSum(r, "hcum", "h_nano", col("tm"))
        .select(col("tm").as("t_days"), col("d").as("n_events"),
          col("n_risk"),
          round(col("hcum").cast("double") / lit(1000000000.0), 6)
            .as("cum_hazard"))
    })

  /** Feature-hash collision audit: the hashing-trick dimensioning
    * report. Every distinct token maps to one of 1024 signed buckets
    * (md5-hash, the q51 stance); the output is the tokens-per-bucket
    * occupancy histogram INCLUDING the empty-bucket row — the number
    * that says whether 2^k features is enough before anyone trains on
    * the hashed matrix. One token-distinct aggregate, then bucket- and
    * histogram-sized frames. */
  val q214 = QueryDef.sql("q214_feature_hash_audit",
    """WITH tok AS (SELECT t AS w FROM (
      |    SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
      |    FROM documents) WHERE t <> ''),
      |cu AS (SELECT w, count(*) AS c FROM tok GROUP BY 1),
      |hb AS (SELECT w, c,
      |    ('0x' || substring(md5(w), 1, 15))::BIGINT % 1024 AS b FROM cu),
      |bk AS (SELECT b, count(*) AS n_toks, CAST(sum(c) AS BIGINT) AS occ
      |  FROM hb GROUP BY 1),
      |hist AS (SELECT n_toks, count(*) AS n_buckets,
      |    CAST(sum(occ) AS BIGINT) AS occurrences
      |  FROM bk GROUP BY 1)
      |SELECT CAST(n_toks AS BIGINT) AS tokens_in_bucket, n_buckets,
      |  occurrences FROM hist
      |UNION ALL
      |SELECT 0, 1024 - (SELECT count(*) FROM bk), 0""")(
    (s, dir) => {
      import graft.operators.Sketches
      val cu = Tables.documents(s, dir)
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
        .where(col("w") =!= "")
        .groupBy("w").agg(count(lit(1)).as("c"))
      val bk = cu
        .select((Sketches.hash60(col("w")) % 1024).as("b"), col("c"))
        .groupBy("b")
        .agg(count(lit(1)).as("n_toks"), sum("c").as("occ"))
        .localCheckpoint(true) // histogram + empty-bucket count read it
      val filled = bk.count()
      bk.groupBy(col("n_toks").as("tokens_in_bucket"))
        .agg(count(lit(1)).as("n_buckets"), sum("occ").as("occurrences"))
        .unionByName(
          Tables.documents(s, dir).sparkSession.range(1)
            .select(lit(0L).as("tokens_in_bucket"),
              lit(1024L - filled).as("n_buckets"),
              lit(0L).as("occurrences")))
    })

  /** K-anonymity / l-diversity re-identification audit — the privacy
    * profile a warehouse runs BEFORE exporting a "de-identified"
    * extract: group customers by quasi-identifier combination
    * (segment, nation, $1000 balance band), k = group size, and audit
    * (a) how many customers sit in groups of k < 5 (re-identifiable)
    * and (b) how many k ≥ 2 groups are homogeneous in the sensitive
    * attribute (has-urgent-order), i.e. l-diversity 1 — attribute
    * disclosure without re-identification. One groupBy at customer
    * scale plus a semi-join-shaped flag; the balance band uses
    * floor() (NOT integer DIV — negative balances, the q79 floor
    * lesson); all shares are exact floor-ppm. */
  val q226 = QueryDef.sql("q226_k_anonymity",
    """WITH s AS (SELECT c_custkey, c_mktsegment, c_nationkey,
      |    CAST(floor(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
      |      AS BIGINT) / 100000.0) AS BIGINT) AS band
      |  FROM customer),
      |u AS (SELECT DISTINCT o_custkey FROM orders
      |  WHERE o_orderpriority = '1-URGENT'),
      |q AS (SELECT s.c_custkey, s.c_mktsegment, s.c_nationkey, s.band,
      |    u.o_custkey IS NOT NULL AS urgent
      |  FROM s LEFT JOIN u ON s.c_custkey = u.o_custkey),
      |g AS (SELECT c_mktsegment, c_nationkey, band,
      |    CAST(count(*) AS BIGINT) AS k,
      |    CAST(count(DISTINCT urgent) AS BIGINT) AS l
      |  FROM q GROUP BY 1, 2, 3)
      |SELECT CAST(sum(k) AS BIGINT) AS n_rows,
      |  CAST(count(*) AS BIGINT) AS n_groups,
      |  CAST(min(k) AS BIGINT) AS k_min,
      |  CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)
      |    AS rows_at_risk,
      |  CAST(floor(sum(CASE WHEN k < 5 THEN k ELSE 0 END) * 1000000.0
      |    / sum(k)) AS BIGINT) AS reident_ppm,
      |  CAST(sum(CASE WHEN k >= 2 AND l = 1 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS homog_groups,
      |  CAST(sum(CASE WHEN k >= 2 AND l = 1 THEN k ELSE 0 END)
      |    AS BIGINT) AS homog_rows
      |FROM g""")(
    (s, dir) => {
      val cust = Tables.customer(s, dir).select(
        col("c_custkey"), col("c_mktsegment"), col("c_nationkey"),
        floor((col("c_acctbal").cast("decimal(18,2)") * 100).cast("long") /
          lit(100000.0)).cast("long").as("band"))
      val urgent = Tables.orders(s, dir)
        .where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey")).distinct()
        .withColumn("has_urgent", lit(true))
      val q = cust.join(urgent, col("c_custkey") === col("o_custkey"),
          "left")
        .select(col("c_mktsegment"), col("c_nationkey"), col("band"),
          coalesce(col("has_urgent"), lit(false)).as("urgent"))
      val g = q.groupBy("c_mktsegment", "c_nationkey", "band")
        .agg(count(lit(1)).as("k"), count_distinct(col("urgent")).as("l"))
      g.agg(sum("k").as("n_rows"), count(lit(1)).as("n_groups"),
          min("k").as("k_min"),
          sum(when(col("k") < 5, col("k")).otherwise(0L))
            .as("rows_at_risk"),
          sum(when(col("k") >= 2 && col("l") === 1, 1L).otherwise(0L))
            .as("homog_groups"),
          sum(when(col("k") >= 2 && col("l") === 1, col("k"))
            .otherwise(0L)).as("homog_rows"))
        .select(col("n_rows"), col("n_groups"), col("k_min"),
          col("rows_at_risk"),
          floor(col("rows_at_risk") * lit(1000000.0) / col("n_rows"))
            .cast("long").as("reident_ppm"),
          col("homog_groups"), col("homog_rows"))
    })

  /** Watermark planning audit — the profiling run that sizes a
    * Structured Streaming `withWatermark` BEFORE deploying the
    * stream: replay the events under a deterministic delivery-delay
    * model (md5-derived jitter up to 10 min — the generator's
    * event_id order is exactly ts order, so disorder must be
    * modeled), compute each event's LATENESS against the high-water
    * mark of event time among strictly-earlier arrival minutes, and
    * report the drop rate per event type at four candidate watermarks.
    * The per-minute high-water prefix runs over the arrival-minute
    * frame via [[graft.operators.Rank.globalPrefixMax]] — the minute
    * count grows with the corpus's covered time span (a decade of
    * 100 TB telemetry is ~5 M minutes), so the prefix max must NOT be
    * a partitionless window draining those rows through one task; all
    * lateness arithmetic is integer µs; shares are floor-ppm. The
    * output row that first shows ≈ 0 drops is the watermark to
    * deploy — this is q22/q48's missing sizing step. */
  val q234 = QueryDef.sql("q234_watermark_planner",
    """WITH e AS (SELECT event_type, epoch_us(ts) AS us,
      |    epoch_us(ts) + ('0x' || substring(md5('d|' ||
      |      CAST(event_id AS VARCHAR)), 1, 15))::BIGINT % 600000000
      |      AS arr
      |  FROM events),
      |b AS (SELECT *, arr // 60000000 AS abk FROM e),
      |m AS (SELECT abk, max(us) AS mx FROM b GROUP BY 1),
      |p AS (SELECT abk, max(mx) OVER (ORDER BY abk
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
      |  FROM m),
      |l AS (SELECT b.event_type,
      |    GREATEST(COALESCE(p.hwm - b.us, 0), 0) AS late_us
      |  FROM b JOIN p USING (abk)),
      |w AS (SELECT CAST(w AS BIGINT) AS watermark_s
      |  FROM (VALUES (60), (300), (900), (3600)) v(w))
      |SELECT l.event_type, w.watermark_s,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CASE WHEN late_us > w.watermark_s * 1000000
      |    THEN 1 ELSE 0 END) AS BIGINT) AS dropped,
      |  CAST(floor(sum(CASE WHEN late_us > w.watermark_s * 1000000
      |    THEN 1 ELSE 0 END) * 1000000.0 / count(*)) AS BIGINT)
      |    AS drop_ppm
      |FROM l, w GROUP BY 1, 2""")(
    (s, dir) => {
      val e = Tables.events(s, dir).select(col("event_type"),
        unix_micros(col("ts")).as("us"),
        (unix_micros(col("ts")) +
          conv(substring(md5(concat(lit("d|"),
            col("event_id").cast("string"))), 1, 15), 16, 10)
            .cast("long") % 600000000L).as("arr"))
      val b = e.withColumn("abk", expr("arr DIV 60000000"))
      val m = b.groupBy("abk").agg(max("us").as("mx"))
      // the minute frame scales with the covered time span — exclusive
      // prefix max through the two-pass range-exchange operator, not a
      // single-task global window (caught by PlanQualitySpec's growth
      // guard once it measured real metrics)
      val p = graft.operators.Rank.globalPrefixMax(m, "hwm", "mx",
        col("abk"))
      val l = b.join(p.select("abk", "hwm"), "abk")
        .select(col("event_type"),
          greatest(coalesce(col("hwm") - col("us"), lit(0L)), lit(0L))
            .as("late_us"))
      val w = s.createDataFrame(Seq(Tuple1(60L), Tuple1(300L),
        Tuple1(900L), Tuple1(3600L))).toDF("watermark_s")
      l.crossJoin(broadcast(w))
        .groupBy("event_type", "watermark_s")
        .agg(count(lit(1)).as("n"),
          sum(when(col("late_us") > col("watermark_s") * 1000000L, 1L)
            .otherwise(0L)).as("dropped"))
        .select(col("event_type"), col("watermark_s"), col("n"),
          col("dropped"),
          floor(col("dropped") * lit(1000000.0) / col("n")).cast("long")
            .as("drop_ppm"))
    })

  /** Isotonic calibration (PAV fit) of the q209/q212 score-vs-outcome
    * table, computed by the CLOSED minimax identity instead of the
    * sequential pool-adjacent-violators loop: iso_i = max_{a≤i}
    * min_{b≥i} mean(a..b), with every interval mean read off two
    * integer prefix sums. The identity turns an inherently sequential
    * fit into three joins over the BUCKET frame (50 rows — the q209
    * pattern: rank at fact scale once, then all calibration math on
    * the bounded frame; the 50³ combination space is ~10⁴ rows).
    * Interval means are int/int IEEE divisions (identical both
    * engines); the fitted rate ships floor-ppm. The monotone fit is
    * what turns a raw model score into a usable probability. */
  val q240 = QueryDef.sql("q240_isotonic_calibration",
    """WITH b AS (SELECT
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS sc,
      |    o_orderkey,
      |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
      |  FROM orders),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS tot FROM b),
      |r AS (SELECT y, row_number() OVER (ORDER BY sc, o_orderkey)
      |    AS rn FROM b),
      |g AS (SELECT ((rn - 1) * 50) // tot AS bucket,
      |    CAST(count(*) AS BIGINT) AS nb, CAST(sum(y) AS BIGINT) AS pb
      |  FROM r, n GROUP BY 1),
      |c AS (SELECT bucket, nb, pb,
      |    sum(nb) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
      |      AS cn,
      |    sum(pb) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
      |      AS cp
      |  FROM g),
      |iv AS (SELECT a.bucket AS a, bb.bucket AS b,
      |    CAST(bb.cp - a.cp + a.pb AS DOUBLE) /
      |      (bb.cn - a.cn + a.nb) AS m
      |  FROM c a JOIN c bb ON a.bucket <= bb.bucket),
      |mn AS (SELECT iv.a, c.bucket AS i, min(iv.m) AS mn
      |  FROM iv JOIN c ON iv.a <= c.bucket AND c.bucket <= iv.b
      |  GROUP BY 1, 2),
      |iso AS (SELECT i, max(mn) AS iso FROM mn GROUP BY 1)
      |SELECT g.bucket, g.nb AS n_rows, g.pb AS n_pos,
      |  CAST(floor(g.pb * 1000000.0 / g.nb) AS BIGINT) AS raw_ppm,
      |  CAST(floor(iso.iso * 1000000.0) AS BIGINT) AS iso_ppm
      |FROM g JOIN iso ON g.bucket = iso.i""")(
    (s, dir) => {
      import graft.operators.Rank
      import org.apache.spark.sql.expressions.Window
      val b = Tables.orders(s, dir).select(
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("sc"),
        col("o_orderkey"),
        when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)
          .as("y"))
      val tot = b.count()
      val r = Rank.globalRank(b, "rn", col("sc"), col("o_orderkey"))
      val g = r.groupBy(expr(s"((rn - 1) * 50) DIV $tot").as("bucket"))
        .agg(count(lit(1)).as("nb"), sum("y").as("pb"))
      val w = Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // bucket frame: 50 rows — bounded global window (q209 stance)
      val c = g.select(col("bucket"), col("nb"), col("pb"),
        sum("nb").over(w).as("cn"), sum("pb").over(w).as("cp")).cache()
      val iv = c.toDF("a", "nba", "pba", "cna", "cpa")
        .join(c.toDF("b", "nbb", "pbb", "cnb", "cpb"),
          col("a") <= col("b"))
        .select(col("a"), col("b"),
          ((col("cpb") - col("cpa") + col("pba")).cast("double") /
            (col("cnb") - col("cna") + col("nba"))).as("m"))
      val mn = iv.join(c.select(col("bucket").as("i")),
          col("a") <= col("i") && col("i") <= col("b"))
        .groupBy("a", "i").agg(min("m").as("mn"))
      val iso = mn.groupBy("i").agg(max("mn").as("iso"))
      g.join(iso, col("bucket") === col("i"))
        .select(col("bucket"), col("nb").as("n_rows"),
          col("pb").as("n_pos"),
          floor(col("pb") * lit(1000000.0) / col("nb")).cast("long")
            .as("raw_ppm"),
          floor(col("iso") * lit(1000000.0)).cast("long").as("iso_ppm"))
    })

  /** Neyman-optimal sample allocation: split a 10,000-row sampling
    * budget across order-priority strata ∝ N_h·σ_h — the
    * minimum-variance survey design, and the statistically-correct
    * upgrade of q58's proportional stratified sample. Variances are
    * the q140 integer machinery (exact DECIMAL(38) sums of cents and
    * cents²); the Neyman weight integerizes as ⌊N_h·√V_h⌋ and the
    * final seats come from q90's largest-remainder apportionment —
    * so the allocation is exact integers end to end, σ's single
    * sqrt/multiply happening in one fixed op order. */
  val q246 = QueryDef.sql("q246_neyman_allocation",
    """WITH m AS (SELECT o_orderpriority AS stratum,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
      |      AS BIGINT)) AS DECIMAL(38,0)) AS sx,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
      |      AS BIGINT) * CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
      |      AS BIGINT)) AS DECIMAL(38,0)) AS sxx
      |  FROM orders GROUP BY 1),
      |v AS (SELECT stratum, n,
      |    CAST(floor(CAST(n * sxx - sx * sx AS DOUBLE) /
      |      CAST(n * (n - 1) AS DOUBLE)) AS BIGINT) AS var_c2
      |  FROM m),
      |w AS (SELECT stratum, n, var_c2,
      |    CAST(floor(n * sqrt(CAST(var_c2 AS DOUBLE))) AS BIGINT) AS wt
      |  FROM v),
      |t AS (SELECT CAST(sum(wt) AS BIGINT) AS tw FROM w),
      |q AS (SELECT stratum, n, var_c2, wt,
      |    (wt * 10000) // t.tw AS base,
      |    (wt * 10000) % t.tw AS rem
      |  FROM w, t),
      |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, stratum)
      |    AS rr FROM q),
      |s AS (SELECT CAST(sum(base) AS BIGINT) AS sb FROM q)
      |SELECT stratum, n, var_c2, wt,
      |  CAST(base + CASE WHEN rr <= 10000 - s.sb THEN 1 ELSE 0 END
      |    AS BIGINT) AS alloc
      |FROM r, s""")(
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cents = (col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
      val m = Tables.orders(s, dir)
        .groupBy(col("o_orderpriority").as("stratum"))
        .agg(count(lit(1)).as("n"),
          sum(cents.cast("decimal(38,0)")).as("sx"),
          sum((cents * cents).cast("decimal(38,0)")).as("sxx"))
      val v = m.select(col("stratum"), col("n"),
        floor((col("n") * col("sxx") - col("sx") * col("sx"))
          .cast("double") / (col("n") * (col("n") - 1)).cast("double"))
          .cast("long").as("var_c2"))
      val w = v.withColumn("wt",
        floor(col("n") * sqrt(col("var_c2").cast("double"))).cast("long"))
      val t = w.agg(sum("wt").as("tw"))
      val q = w.crossJoin(broadcast(t))
        .select(col("stratum"), col("n"), col("var_c2"), col("wt"),
          expr("(wt * 10000) DIV tw").as("base"),
          expr("(wt * 10000) % tw").as("rem"))
      val sb = q.agg(sum("base").as("sb"))
      // strata frame (5 rows) — bounded global window (q90 idiom)
      q.withColumn("rr", row_number().over(
          Window.orderBy(col("rem").desc, col("stratum"))))
        .crossJoin(broadcast(sb))
        .select(col("stratum"), col("n"), col("var_c2"), col("wt"),
          (col("base") + when(col("rr") <= lit(10000) - col("sb"), 1L)
            .otherwise(0L)).cast("long").as("alloc"))
    })

  /** Split-conformal upper bound per event type at α = 0.1: the
    * ⌈(n+1)(1−α)⌉-th order statistic of the µ-scaled values — an
    * EXACT integer rank selection, so the "90% prediction interval"
    * ships with zero floating point (conformal's whole appeal is
    * distribution-free finite-sample validity; the rank formula IS
    * the guarantee). Per-type windows shard by type; the reported
    * empirical coverage is the integer count at-or-under the bound.
    * At fact scale the order statistic comes from the same per-group
    * sort the window already does — one shuffle on the type key. */
  val q247 = QueryDef.sql("q247_conformal_bound",
    """WITH b AS (SELECT event_type,
      |    CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS sc,
      |    event_id
      |  FROM events),
      |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
      |  FROM b GROUP BY 1),
      |r AS (SELECT event_type, sc, row_number() OVER (
      |    PARTITION BY event_type ORDER BY sc, event_id) AS rk
      |  FROM b),
      |k AS (SELECT event_type, n,
      |    LEAST((n + 1) * 9 // 10 + CASE WHEN (n + 1) * 9 % 10 = 0
      |      THEN 0 ELSE 1 END, n) AS k
      |  FROM n),
      |bound AS (SELECT r.event_type, k.n, k.k, r.sc AS bound_micro
      |  FROM r JOIN k ON r.event_type = k.event_type AND r.rk = k.k)
      |SELECT bound.event_type, bound.n, bound.k, bound.bound_micro,
      |  CAST((SELECT count(*) FROM b WHERE b.event_type =
      |    bound.event_type AND b.sc <= bound.bound_micro) AS BIGINT)
      |    AS n_covered,
      |  CAST(floor((SELECT count(*) FROM b WHERE b.event_type =
      |    bound.event_type AND b.sc <= bound.bound_micro) * 1000000.0
      |    / bound.n) AS BIGINT) AS coverage_ppm
      |FROM bound""")(
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val b = Tables.events(s, dir).select(col("event_type"),
        (col("value").cast("decimal(18,6)") * 1000000).cast("long")
          .as("sc"),
        col("event_id")).cache()
      val n = b.groupBy("event_type").agg(count(lit(1)).as("n"))
      val k = n.select(col("event_type"), col("n"),
        least(expr("(n + 1) * 9 DIV 10 + " +
          "CASE WHEN (n + 1) * 9 % 10 = 0 THEN 0 ELSE 1 END"), col("n"))
          .as("k"))
      val r = b.withColumn("rk", row_number().over(
        Window.partitionBy("event_type").orderBy("sc", "event_id")))
      val bound = r.join(broadcast(k),
          r("event_type") === k("event_type") && col("rk") === col("k"))
        .select(r("event_type"), col("n"), col("k"),
          col("sc").as("bound_micro"))
      val cov = b.join(broadcast(bound.select(col("event_type"),
          col("bound_micro"))), "event_type")
        .where(col("sc") <= col("bound_micro"))
        .groupBy("event_type").agg(count(lit(1)).as("n_covered"))
      bound.join(cov, "event_type")
        .select(col("event_type"), col("n"), col("k"),
          col("bound_micro"), col("n_covered"),
          floor(col("n_covered") * lit(1000000.0) / col("n")).cast("long")
            .as("coverage_ppm"))
    })

  /** Covariate-balance audit (standardized mean differences): before
    * any causal read of "urgent orders ship differently", check
    * whether urgent vs non-urgent orders even LOOK alike on
    * pre-treatment covariates (price, customer balance) — |SMD| ≤ 0.1
    * is the conventional balance bar. Means and variances come from
    * the q140 exact integer machinery per group; the single double
    * appears in the final (m₁−m₀)/√((v₁+v₀)/2) and ships floor-milli
    * (SMD is conventionally read at 2 decimals — milli is 10×
    * finer). One scan of the joined frame, one grouped aggregate per
    * covariate. */
  val q252 = QueryDef.sql("q252_covariate_balance",
    """WITH j AS (SELECT
      |    CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
      |      AS treated,
      |    CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS price_c,
      |    CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS bal_c
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
      |lng AS (SELECT treated, 'price' AS covariate, price_c AS v FROM j
      |  UNION ALL SELECT treated, 'acctbal', bal_c FROM j),
      |m AS (SELECT covariate, treated, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(v) AS DECIMAL(38,0)) AS sx,
      |    CAST(sum(v * v) AS DECIMAL(38,0)) AS sxx
      |  FROM lng GROUP BY 1, 2),
      |g AS (SELECT covariate,
      |    max(CASE WHEN treated = 1 THEN n END) AS n1,
      |    max(CASE WHEN treated = 0 THEN n END) AS n0,
      |    max(CASE WHEN treated = 1 THEN CAST(sx AS DOUBLE) / n END)
      |      AS m1,
      |    max(CASE WHEN treated = 0 THEN CAST(sx AS DOUBLE) / n END)
      |      AS m0,
      |    max(CASE WHEN treated = 1 THEN
      |      CAST(n * sxx - sx * sx AS DOUBLE) / CAST(n * (n - 1)
      |        AS DOUBLE) END) AS v1,
      |    max(CASE WHEN treated = 0 THEN
      |      CAST(n * sxx - sx * sx AS DOUBLE) / CAST(n * (n - 1)
      |        AS DOUBLE) END) AS v0
      |  FROM m GROUP BY 1)
      |SELECT covariate, n1, n0,
      |  CAST(floor((m1 - m0) / sqrt((v1 + v0) / 2.0) * 1000) AS BIGINT)
      |    AS smd_milli,
      |  abs((m1 - m0) / sqrt((v1 + v0) / 2.0)) <= 0.1 AS balanced
      |FROM g""")(
    (s, dir) => {
      val j = Tables.orders(s, dir)
        .join(Tables.customer(s, dir),
          col("o_custkey") === col("c_custkey"))
        .select(
          when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0)
            .as("treated"),
          (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
            .as("price_c"),
          (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long")
            .as("bal_c"))
      val lng = j.select(col("treated"), lit("price").as("covariate"),
          col("price_c").as("v"))
        .unionByName(j.select(col("treated"), lit("acctbal").as("covariate"),
          col("bal_c").as("v")))
      val m = lng.groupBy("covariate", "treated")
        .agg(count(lit(1)).as("n"),
          sum(col("v").cast("decimal(38,0)")).as("sx"),
          sum((col("v") * col("v")).cast("decimal(38,0)")).as("sxx"))
      val g = m.groupBy("covariate").agg(
        max(when(col("treated") === 1, col("n"))).as("n1"),
        max(when(col("treated") === 0, col("n"))).as("n0"),
        max(when(col("treated") === 1,
          col("sx").cast("double") / col("n"))).as("m1"),
        max(when(col("treated") === 0,
          col("sx").cast("double") / col("n"))).as("m0"),
        max(when(col("treated") === 1,
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double") /
            (col("n") * (col("n") - 1)).cast("double"))).as("v1"),
        max(when(col("treated") === 0,
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double") /
            (col("n") * (col("n") - 1)).cast("double"))).as("v0"))
      val smd = (col("m1") - col("m0")) /
        sqrt((col("v1") + col("v0")) / lit(2.0))
      g.select(col("covariate"), col("n1"), col("n0"),
        floor(smd * 1000).cast("long").as("smd_milli"),
        (abs(smd) <= 0.1).as("balanced"))
    })

  /** Column-encoding audit: for each candidate lineitem column, the
    * run/distinct structure that decides its parquet encoding — dict
    * when the domain is tiny, RLE when values arrive in runs, plain
    * otherwise. Runs are counted WITHIN each l_orderkey in
    * l_linenumber order (the write-time clustering unit), so the scan
    * is one partitioned window pass — no global sort, and the count is
    * layout-meaningful: parquet pages don't span the clustering key
    * either. One wide window pass computes all four columns' lags;
    * thresholds are integer comparisons (dict: ≤1% distinct; rle:
    * ≤10% runs). */
  val q266 = QueryDef.sql("q266_encoding_audit",
    """WITH w AS (SELECT l_returnflag AS rf, l_linestatus AS ls,
      |    CAST(l_shipdate AS DATE) AS sd,
      |    CAST(CAST(l_quantity AS DECIMAL(18,6)) * 1000000 AS BIGINT)
      |      AS qt,
      |    lag(l_returnflag) OVER o AS p_rf,
      |    lag(l_linestatus) OVER o AS p_ls,
      |    lag(CAST(l_shipdate AS DATE)) OVER o AS p_sd,
      |    lag(CAST(CAST(l_quantity AS DECIMAL(18,6)) * 1000000
      |      AS BIGINT)) OVER o AS p_qt
      |  FROM lineitem
      |  WINDOW o AS (PARTITION BY l_orderkey
      |    ORDER BY l_linenumber, l_partkey, l_suppkey)),
      |m AS (
      |  SELECT 'l_returnflag' AS col, CAST(count(*) AS BIGINT) AS n,
      |    CAST(count(DISTINCT rf) AS BIGINT) AS n_distinct,
      |    CAST(count(*) FILTER (WHERE p_rf IS NULL OR rf <> p_rf)
      |      AS BIGINT) AS n_runs FROM w
      |  UNION ALL
      |  SELECT 'l_linestatus', CAST(count(*) AS BIGINT),
      |    CAST(count(DISTINCT ls) AS BIGINT),
      |    CAST(count(*) FILTER (WHERE p_ls IS NULL OR ls <> p_ls)
      |      AS BIGINT) FROM w
      |  UNION ALL
      |  SELECT 'l_shipdate', CAST(count(*) AS BIGINT),
      |    CAST(count(DISTINCT sd) AS BIGINT),
      |    CAST(count(*) FILTER (WHERE p_sd IS NULL OR sd <> p_sd)
      |      AS BIGINT) FROM w
      |  UNION ALL
      |  SELECT 'l_quantity', CAST(count(*) AS BIGINT),
      |    CAST(count(DISTINCT qt) AS BIGINT),
      |    CAST(count(*) FILTER (WHERE p_qt IS NULL OR qt <> p_qt)
      |      AS BIGINT) FROM w)
      |SELECT col, n, n_distinct, n_runs,
      |  (n_runs * 1000000) // n AS runs_ppm,
      |  CASE WHEN n_distinct * 100 <= n THEN 'dict'
      |       WHEN n_runs * 10 <= n THEN 'rle'
      |       ELSE 'plain' END AS encoding
      |FROM m""")(
    (s, dir) => {
      // (l_orderkey, l_linenumber) is NOT unique in this corpus —
      // extend the order to the (…, l_partkey, l_suppkey) candidate
      // key or the lag (and the run count) is nondeterministic
      val o = Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_partkey", "l_suppkey")
      val base = Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"),
        col("l_returnflag").as("rf"), col("l_linestatus").as("ls"),
        col("l_shipdate").cast("date").as("sd"),
        (col("l_quantity").cast("decimal(18,6)") * 1000000)
          .cast("long").as("qt"))
      val w = base.select(col("rf"), col("ls"), col("sd"), col("qt"),
        lag("rf", 1).over(o).as("p_rf"), lag("ls", 1).over(o).as("p_ls"),
        lag("sd", 1).over(o).as("p_sd"), lag("qt", 1).over(o).as("p_qt"))
      // one aggregate pass for all four columns (the oracle spells it
      // as four scans of the same CTE; same values)
      def runs(v: String, p: String) =
        count(when(col(p).isNull || col(v) =!= col(p), 1))
      val agg1 = w.agg(count(lit(1)).as("n"),
        countDistinct(col("rf")).as("nd_rf"),
        countDistinct(col("ls")).as("nd_ls"),
        countDistinct(col("sd")).as("nd_sd"),
        countDistinct(col("qt")).as("nd_qt"),
        runs("rf", "p_rf").as("nr_rf"), runs("ls", "p_ls").as("nr_ls"),
        runs("sd", "p_sd").as("nr_sd"), runs("qt", "p_qt").as("nr_qt"))
      agg1.select(expr("""stack(4,
          'l_returnflag', n, nd_rf, nr_rf,
          'l_linestatus', n, nd_ls, nr_ls,
          'l_shipdate',   n, nd_sd, nr_sd,
          'l_quantity',   n, nd_qt, nr_qt)
          AS (col, n, n_distinct, n_runs)"""))
        .select(col("col"), col("n"), col("n_distinct"), col("n_runs"),
          expr("(n_runs * 1000000) DIV n").as("runs_ppm"),
          when(col("n_distinct") * 100 <= col("n"), "dict")
            .when(col("n_runs") * 10 <= col("n"), "rle")
            .otherwise("plain").as("encoding"))
    })

  /** Differentially-private daily-count release with INTEGER-ONLY
    * discrete-Laplace noise: noise = G₁ − G₂ where each Gᵢ ~
    * Geometric(½) is the trailing-ones count of an md5-derived
    * 60-bit integer (trailing-ones of a uniform bitstream is exactly
    * Geometric(½); bit_count(x XOR (x+1)) − 1 extracts it with no
    * libm, no float, no inverse CDF — the classic two-geometric
    * construction of two-sided geometric noise, ε = ln 2 per count).
    * Deterministic given the key, so the release replays exactly in
    * the oracle. The true count is kept alongside for verification;
    * an actual release ships only (event_type, d, released). */
  val q270 = QueryDef.sql("q270_dp_release",
    """WITH g AS (SELECT event_type, CAST(ts AS DATE) AS d,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |h AS (SELECT event_type, d, n,
      |    CAST(('0x' || substring(md5(event_type || '|' ||
      |      CAST(d AS VARCHAR) || '|g1'), 1, 15)) AS BIGINT) AS h1,
      |    CAST(('0x' || substring(md5(event_type || '|' ||
      |      CAST(d AS VARCHAR) || '|g2'), 1, 15)) AS BIGINT) AS h2
      |  FROM g),
      |z AS (SELECT event_type, d, n,
      |    CAST(bit_count(xor(h1, h1 + 1)) - 1 AS BIGINT)
      |      - CAST(bit_count(xor(h2, h2 + 1)) - 1 AS BIGINT) AS noise
      |  FROM h)
      |SELECT event_type, d, n, noise, n + noise AS released
      |FROM z""")(
    (s, dir) => {
      def h(tag: String) = conv(substring(md5(concat(col("event_type"),
        lit("|"), col("d").cast("string"), lit(tag))), 1, 15), 16, 10)
        .cast("long")
      def geo(c: org.apache.spark.sql.Column) =
        (bit_count(c.bitwiseXOR(c + 1)) - 1).cast("long")
      Tables.events(s, dir)
        .groupBy(col("event_type"), col("ts").cast("date").as("d"))
        .agg(count(lit(1)).as("n"))
        .withColumn("noise", geo(h("|g1")) - geo(h("|g2")))
        .select(col("event_type"), col("d"), col("n"), col("noise"),
          (col("n") + col("noise")).as("released"))
    })

  /** LPT (longest-processing-time-first) schedule of per-(source,
    * lang) token workloads onto 4 workers: items sorted by
    * (size DESC, key), each assigned to the currently least-loaded
    * worker, ties to the lowest index — the classic 4/3-approximate
    * makespan greedy every shard-assignment planner uses. The oracle
    * replays the sequential greedy as a recursive CTE carrying the
    * four load counters; the Spark side collects the ITEM list (one
    * row per (source, lang) — the aggregate, not the corpus) and
    * folds on the driver, the q267 small-state stance. */
  val q279 = QueryDef.sql("q279_lpt_schedule",
    """WITH RECURSIVE items AS (SELECT source || '|' || lang AS item,
      |    CAST(sum(length(text) - length(replace(text, ' ', '')) + 1)
      |      AS BIGINT) AS sz
      |  FROM documents GROUP BY 1),
      |s AS (SELECT item, sz, CAST(row_number() OVER (
      |    ORDER BY sz DESC, item) AS BIGINT) AS rk FROM items),
      |a AS (
      |  SELECT rk, item, sz, CAST(0 AS BIGINT) AS w,
      |    sz AS l0, CAST(0 AS BIGINT) AS l1, CAST(0 AS BIGINT) AS l2,
      |    CAST(0 AS BIGINT) AS l3
      |  FROM s WHERE rk = 1
      |  UNION ALL
      |  SELECT s.rk, s.item, s.sz,
      |    CASE WHEN a.l0 <= a.l1 AND a.l0 <= a.l2 AND a.l0 <= a.l3
      |      THEN CAST(0 AS BIGINT)
      |      WHEN a.l1 <= a.l2 AND a.l1 <= a.l3 THEN CAST(1 AS BIGINT)
      |      WHEN a.l2 <= a.l3 THEN CAST(2 AS BIGINT)
      |      ELSE CAST(3 AS BIGINT) END,
      |    a.l0 + CASE WHEN a.l0 <= a.l1 AND a.l0 <= a.l2
      |      AND a.l0 <= a.l3 THEN s.sz ELSE 0 END,
      |    a.l1 + CASE WHEN NOT (a.l0 <= a.l1 AND a.l0 <= a.l2
      |      AND a.l0 <= a.l3) AND a.l1 <= a.l2 AND a.l1 <= a.l3
      |      THEN s.sz ELSE 0 END,
      |    a.l2 + CASE WHEN NOT (a.l0 <= a.l1 AND a.l0 <= a.l2
      |      AND a.l0 <= a.l3) AND NOT (a.l1 <= a.l2 AND a.l1 <= a.l3)
      |      AND a.l2 <= a.l3 THEN s.sz ELSE 0 END,
      |    a.l3 + CASE WHEN NOT (a.l0 <= a.l1 AND a.l0 <= a.l2
      |      AND a.l0 <= a.l3) AND NOT (a.l1 <= a.l2 AND a.l1 <= a.l3)
      |      AND NOT (a.l2 <= a.l3) THEN s.sz ELSE 0 END
      |  FROM a JOIN s ON s.rk = a.rk + 1)
      |SELECT item, sz, w AS worker FROM a""")(
    (s, dir) => {
      val items = Tables.documents(s, dir)
        .groupBy(concat(col("source"), lit("|"), col("lang")).as("item"))
        .agg(sum(length(col("text"))
          - length(regexp_replace(col("text"), " ", "")) + 1).as("sz"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
        .sortBy { case (item, sz) => (-sz, item) }
      val loads = Array.fill(4)(0L)
      val out = items.map { case (item, sz) =>
        val w = loads.indexOf(loads.min)
        loads(w) += sz
        (item, sz, w.toLong)
      }
      import s.implicits._
      out.toSeq.toDF("item", "sz", "worker")
    })

  /** t-closeness audit on q226's anonymization framing — the third
    * leg of the privacy battery (k-anonymity q226 caps group
    * rarity, l-diversity caps sensitive homogeneity, t-closeness
    * caps how much a GROUP's sensitive distribution deviates from
    * the corpus): per quasi-identifier group (mktsegment, nation,
    * balance band), the total-variation distance between the group's
    * urgent-buyer distribution and the global one. Binary sensitive
    * attribute ⇒ TV = |p_group - p_global|, computed on the common
    * integer denominator n_g * N (no division until the final
    * floor-ppm). Ships every group with its t and the release rule
    * as a flag — suppress = t_ppm > 200000 (t > 0.2), the
    * conventional threshold. One scan + one group aggregate + one
    * broadcast scalar. */
  val q297 = QueryDef.sql("q297_t_closeness",
    """WITH s AS (SELECT c_custkey, c_mktsegment, c_nationkey,
      |    CAST(floor(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
      |      AS BIGINT) / 100000.0) AS BIGINT) AS band
      |  FROM customer),
      |u AS (SELECT DISTINCT o_custkey FROM orders
      |  WHERE o_orderpriority = '1-URGENT'),
      |q AS (SELECT s.c_mktsegment, s.c_nationkey, s.band,
      |    CASE WHEN u.o_custkey IS NULL THEN 0 ELSE 1 END AS urg
      |  FROM s LEFT JOIN u ON s.c_custkey = u.o_custkey),
      |g AS (SELECT c_mktsegment, c_nationkey, band,
      |    CAST(count(*) AS BIGINT) AS n_g,
      |    CAST(sum(urg) AS BIGINT) AS n_urg
      |  FROM q GROUP BY 1, 2, 3),
      |tot AS (SELECT CAST(sum(n_g) AS BIGINT) AS n,
      |    CAST(sum(n_urg) AS BIGINT) AS n1 FROM g),
      |t AS (SELECT g.c_mktsegment, g.c_nationkey, g.band, g.n_g,
      |    g.n_urg,
      |    (abs(g.n_urg * tot.n - tot.n1 * g.n_g) * 1000000)
      |      // (g.n_g * tot.n) AS t_ppm
      |  FROM g, tot)
      |SELECT c_mktsegment, CAST(c_nationkey AS BIGINT) AS nation,
      |  band, n_g, n_urg, t_ppm,
      |  CASE WHEN t_ppm > 200000 THEN 1 ELSE 0 END AS suppress
      |FROM t""")(
    (s, dir) => {
      val sTab = Tables.customer(s, dir).select(col("c_custkey"),
        col("c_mktsegment"), col("c_nationkey"),
        floor((col("c_acctbal").cast("decimal(18,2)") * 100)
          .cast("long") / lit(100000.0)).cast("long").as("band"))
      val u = Tables.orders(s, dir)
        .where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey")).distinct()
        .withColumn("uflag", lit(1L))
      val q = sTab.join(broadcast(u),
          sTab("c_custkey") === u("o_custkey"), "left")
        .select(col("c_mktsegment"), col("c_nationkey"), col("band"),
          coalesce(col("uflag"), lit(0L)).as("urg"))
      val g = q.groupBy("c_mktsegment", "c_nationkey", "band")
        .agg(count(lit(1)).as("n_g"), sum("urg").as("n_urg"))
      val tot = g.agg(sum("n_g").as("n"), sum("n_urg").as("n1"))
      g.crossJoin(broadcast(tot))
        .select(col("c_mktsegment"),
          col("c_nationkey").cast("long").as("nation"), col("band"),
          col("n_g"), col("n_urg"),
          expr("(abs(n_urg * n - n1 * n_g) * 1000000) DIV (n_g * n)")
            .as("t_ppm"))
        .withColumn("suppress",
          when(col("t_ppm") > 200000, 1L).otherwise(0L))
    })

  /** Weight-balanced range-shard planner
    * ([[graft.operators.RangeShard]]): split the documents table into 8
    * contiguous doc_id ranges of ~equal total characters — the exact
    * boundary table behind evenly-sized ordered output files, computed
    * WITHOUT a global single-task sort: per-block partitioned running
    * sums recurse until the block frame fits one ≤ blockWidth-row
    * window, so no task sorts more than 1024 rows at any input size.
    * The oracle is the naive global window — same numbers, single-node
    * plan. */
  val q320 = QueryDef.sql("q320_range_shards",
    """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS id,
      |           CAST(n_chars AS BIGINT) AS w FROM documents),
      |t AS (SELECT CAST(sum(w) AS BIGINT) AS total FROM d),
      |c AS (SELECT id, w,
      |    COALESCE(sum(w) OVER (ORDER BY id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS cum_before
      |  FROM d)
      |SELECT CAST(c.cum_before * 8 // t.total AS INT) AS shard,
      |  count(*) AS n_docs, CAST(sum(c.w) AS BIGINT) AS char_sum,
      |  min(c.id) AS min_doc, max(c.id) AS max_doc
      |FROM c, t GROUP BY 1""")(
    (s, dir) => graft.operators.RangeShard.plan(
      Tables.documents(s, dir), "doc_id", "n_chars", shards = 8))

  /** Skew-salting plan: from the key histogram, compute the salt
    * factor a skewed groupBy/join should apply per hot key — keys
    * whose count exceeds total/200 get ⌈count/threshold⌉ salts (capped
    * at 32, a practical executor-fanout bound) and the resulting
    * per-bucket row load. This is the PLANNING half of the salted
    * machinery q69 executes; at 100 TB the histogram aggregate is the
    * only pass and the plan table is ≤ #hot-keys rows. All-integer
    * ceil-division, so the oracle replays the plan exactly. */
  val q323 = QueryDef.sql("q323_salt_plan",
    """WITH tot AS (SELECT count(*) AS n FROM events),
      |t AS (SELECT greatest(n // 200, 1) AS thr FROM tot),
      |k AS (SELECT event_type AS key, count(*) AS cnt FROM events
      |      GROUP BY 1)
      |SELECT key, cnt,
      |  CAST(least((cnt + thr - 1) // thr, 32) AS INT) AS salt_factor,
      |  CAST((cnt + least((cnt + thr - 1) // thr, 32) - 1)
      |    // least((cnt + thr - 1) // thr, 32) AS BIGINT) AS bucket_rows
      |FROM k, t WHERE cnt > thr""")(
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val thr = ev.agg(count(lit(1)).as("n"))
        .select(greatest(expr("n DIV 200"), lit(1L)).as("thr"))
      ev.groupBy(col("event_type").as("key")).agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(thr))
        .where(col("cnt") > col("thr"))
        .withColumn("salt_factor",
          least(expr("(cnt + thr - 1) DIV thr"), lit(32L)).cast("int"))
        .withColumn("bucket_rows",
          expr("(cnt + salt_factor - 1) DIV salt_factor"))
        .select("key", "cnt", "salt_factor", "bucket_rows")
    })

  /** Z-order (Morton) layout audit: interleave the low 12 bits of
    * customer key and order-day into a 24-bit z-value, bucket rows by
    * the top 8 z-bits, and report each bucket's bounding box and
    * point density — the locality table behind multi-dimensional
    * file clustering (a well-z-ordered layout gives every bucket a
    * tight box, so a 2-D predicate prunes most files; a row-order
    * layout smears every bucket across one full dimension). The
    * z-value is a pure per-row fold (no shuffle), the audit one
    * aggregate. Integer bit arithmetic replays exactly. */
  val q324 = QueryDef.sql("q324_zorder_audit",
    """WITH o AS (SELECT
      |    CAST(o_custkey % 4096 AS BIGINT) AS x,
      |    CAST((CAST(o_orderdate AS DATE) - DATE '1995-01-01') % 4096
      |      AS BIGINT) AS y
      |  FROM orders),
      |z AS (SELECT x, y,
      |    CAST(list_sum(list_transform(range(0, 12), i ->
      |      ((x // CAST(pow(2, i) AS BIGINT)) % 2)
      |        * CAST(pow(2, 2*i) AS BIGINT)
      |      + ((y // CAST(pow(2, i) AS BIGINT)) % 2)
      |        * CAST(pow(2, 2*i+1) AS BIGINT))) AS BIGINT) AS zv
      |  FROM o)
      |SELECT CAST(zv // 65536 AS INT) AS z_bucket, count(*) AS n,
      |  min(x) AS x_min, max(x) AS x_max,
      |  min(y) AS y_min, max(y) AS y_max,
      |  CAST(count(*) * 1000000
      |    // ((max(x)-min(x)+1) * (max(y)-min(y)+1)) AS BIGINT)
      |    AS density_ppm
      |FROM z GROUP BY 1""")(
    (s, dir) => Tables.orders(s, dir)
      .select(
        pmod(col("o_custkey"), lit(4096L)).as("x"),
        pmod(expr("datediff(to_date(o_orderdate), DATE'1995-01-01')")
          .cast("long"), lit(4096L)).as("y"))
      .withColumn("zv", expr(
        """aggregate(sequence(0, 11), 0L, (acc, i) ->
          |  acc + ((x DIV CAST(pow(2, i) AS BIGINT)) % 2)
          |          * CAST(pow(2, CAST(2*i AS DOUBLE)) AS BIGINT)
          |      + ((y DIV CAST(pow(2, i) AS BIGINT)) % 2)
          |          * CAST(pow(2, CAST(2*i+1 AS DOUBLE)) AS BIGINT))"""
          .stripMargin))
      .groupBy(expr("CAST(zv DIV 65536 AS INT)").as("z_bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))
      .withColumn("density_ppm", expr(
        "n * 1000000 DIV ((x_max - x_min + 1) * (y_max - y_min + 1))")))

  /** Broadcast-join advisor: per table, row count and a deterministic
    * serialized-size estimate (8 bytes per fixed-width column + string
    * lengths), and whether it fits the 10 MiB broadcast budget — the
    * statistics table behind every join-strategy choice the fraud
    * pipeline makes (masters broadcast, facts shuffle). Six single-
    * table aggregates unioned; the estimate replays exactly. */
  val q327 = QueryDef.sql("q327_broadcast_advisor",
    """WITH s AS (
      |  SELECT 'region' AS tbl, count(*) AS n_rows,
      |    CAST(sum(8 + length(r_name)) AS BIGINT) AS est_bytes FROM region
      |  UNION ALL SELECT 'nation', count(*),
      |    CAST(sum(16 + length(n_name)) AS BIGINT) FROM nation
      |  UNION ALL SELECT 'customer', count(*),
      |    CAST(sum(24 + length(c_name) + length(c_mktsegment)) AS BIGINT)
      |    FROM customer
      |  UNION ALL SELECT 'supplier', count(*),
      |    CAST(sum(24 + length(s_name)) AS BIGINT) FROM supplier
      |  UNION ALL SELECT 'part', count(*),
      |    CAST(sum(24 + length(p_name) + length(p_brand) + length(p_type))
      |      AS BIGINT) FROM part
      |  UNION ALL SELECT 'lineitem', count(*),
      |    CAST(sum(72 + length(l_returnflag) + length(l_linestatus))
      |      AS BIGINT) FROM lineitem)
      |SELECT tbl, n_rows, est_bytes, est_bytes < 10485760 AS broadcastable
      |FROM s""")(
    (s, dir) => {
      def est(df: org.apache.spark.sql.DataFrame, name: String,
              bytes: org.apache.spark.sql.Column) =
        df.agg(count(lit(1)).as("n_rows"),
            sum(bytes).cast("long").as("est_bytes"))
          .select(lit(name).as("tbl"), col("n_rows"), col("est_bytes"),
            (col("est_bytes") < 10485760L).as("broadcastable"))
      est(Tables.region(s, dir), "region", lit(8) + length(col("r_name")))
        .unionAll(est(Tables.nation(s, dir), "nation",
          lit(16) + length(col("n_name"))))
        .unionAll(est(Tables.customer(s, dir), "customer",
          lit(24) + length(col("c_name")) + length(col("c_mktsegment"))))
        .unionAll(est(Tables.supplier(s, dir), "supplier",
          lit(24) + length(col("s_name"))))
        .unionAll(est(Tables.part(s, dir), "part",
          lit(24) + length(col("p_name")) + length(col("p_brand"))
            + length(col("p_type"))))
        .unionAll(est(Tables.lineitem(s, dir), "lineitem",
          lit(72) + length(col("l_returnflag"))
            + length(col("l_linestatus"))))
    })

  /** Zone-map skipping audit across two LAYOUTS of the same fact: for
    * the predicate `l_shipdate ≥ 1998-01-01`, per-block min/max
    * shipdate and skippability when blocks follow insertion order
    * (orderkey ranges — dates smear, nothing skips) vs a
    * date-partitioned layout (year-month blocks — history prunes).
    * This is the min/max row-group statistic parquet keeps and the
    * measurement that justifies re-clustering; one aggregate per
    * layout, block counts bounded by keyspace/512 and months. */
  val q328 = QueryDef.sql("q328_zonemap_skip",
    """WITH li AS (SELECT l_orderkey, CAST(l_shipdate AS DATE) AS d
      |           FROM lineitem),
      |ins AS (SELECT 'insertion' AS layout,
      |    CAST(l_orderkey // 512 AS BIGINT) AS blk, count(*) AS n_rows,
      |    min(d) AS d_min, max(d) AS d_max
      |  FROM li GROUP BY 2),
      |dp AS (SELECT 'date_partitioned' AS layout,
      |    CAST(year(d) * 100 + month(d) AS BIGINT) AS blk, count(*)
      |      AS n_rows,
      |    min(d) AS d_min, max(d) AS d_max
      |  FROM li GROUP BY 2)
      |SELECT layout, blk, n_rows, d_min, d_max,
      |  d_max < DATE '1998-01-01' AS skippable
      |FROM (SELECT * FROM ins UNION ALL SELECT * FROM dp)""")(
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), to_date(col("l_shipdate")).as("d"))
      def audit(layout: String, blk: org.apache.spark.sql.Column) =
        li.groupBy(blk.cast("long").as("blk"))
          .agg(count(lit(1)).as("n_rows"),
            min(col("d")).as("d_min"), max(col("d")).as("d_max"))
          .select(lit(layout).as("layout"), col("blk"), col("n_rows"),
            col("d_min"), col("d_max"),
            (col("d_max") < to_date(lit("1998-01-01"))).as("skippable"))
      audit("insertion", expr("l_orderkey DIV 512"))
        .unionAll(audit("date_partitioned",
          year(col("d")) * 100 + month(col("d"))))
    })

  /** Join-ORDER advisor for the lineitem⋈orders⋈customer chain: the
    * exact intermediate cardinality of each two-table prefix (from key
    * histograms, q192's machinery — Σ c_a(k)·c_b(k) is the exact
    * equi-join size, not an estimate) and which order a cost-based
    * optimizer should pick. The final three-way size is identical
    * either way; the intermediate is what spills. Histograms shuffle
    * once per key; the advisor table is two rows. */
  val q329 = QueryDef.sql("q329_join_order_advisor",
    """WITH lo AS (SELECT l_orderkey AS k, count(*) AS c FROM lineitem
      |            GROUP BY 1),
      |oo AS (SELECT o_orderkey AS k, count(*) AS c FROM orders GROUP BY 1),
      |oc AS (SELECT o_custkey AS k, count(*) AS c FROM orders GROUP BY 1),
      |cc AS (SELECT c_custkey AS k, count(*) AS c FROM customer
      |       GROUP BY 1),
      |j AS (SELECT 'lineitem_orders_first' AS plan,
      |        CAST(sum(a.c * b.c) AS BIGINT) AS intermediate_rows
      |      FROM lo a JOIN oo b ON a.k = b.k
      |      UNION ALL
      |      SELECT 'orders_customer_first',
      |        CAST(sum(a.c * b.c) AS BIGINT)
      |      FROM oc a JOIN cc b ON a.k = b.k),
      |m AS (SELECT min(intermediate_rows) AS mn FROM j)
      |SELECT plan, intermediate_rows, intermediate_rows = m.mn AS chosen
      |FROM j, m""")(
    (s, dir) => {
      def hist(df: org.apache.spark.sql.DataFrame, key: String) =
        df.groupBy(col(key).as("k")).agg(count(lit(1)).as("c"))
      def joinSize(a: org.apache.spark.sql.DataFrame,
                   b: org.apache.spark.sql.DataFrame, plan: String) =
        a.join(b.withColumnRenamed("c", "c2"), "k")
          .agg(sum(col("c") * col("c2")).cast("long")
            .as("intermediate_rows"))
          .select(lit(plan).as("plan"), col("intermediate_rows"))
      val j = joinSize(hist(Tables.lineitem(s, dir), "l_orderkey"),
          hist(Tables.orders(s, dir), "o_orderkey"),
          "lineitem_orders_first")
        .unionAll(joinSize(hist(Tables.orders(s, dir), "o_custkey"),
          hist(Tables.customer(s, dir), "c_custkey"),
          "orders_customer_first"))
      j.crossJoin(broadcast(
          j.agg(min(col("intermediate_rows")).as("mn"))))
        .select(col("plan"), col("intermediate_rows"),
          (col("intermediate_rows") === col("mn")).as("chosen"))
    })

  /** Point-in-time leakage audit: for each purchase (label) event, the
    * feature a CORRECT as-of join serves (latest view at-or-before the
    * label, [[graft.operators.AsOfJoin]]) vs what a sloppy
    * latest-value-per-user join serves — and whether the sloppy one
    * LEAKED the future (its view is later than the label). This is the
    * train/serve-skew check every feature store runs; on this stream
    * the naive join leaks for ~94% of labels. Union-window as-of (no
    * pair explosion) + one per-user aggregate. */
  val q330 = QueryDef.sql("q330_pit_leakage",
    """WITH b AS (SELECT event_id, user_id, event_type, ts,
      |    last_value(CASE WHEN event_type = 'view' THEN event_id END
      |               IGNORE NULLS)
      |      OVER (PARTITION BY user_id
      |            ORDER BY ts, (event_type = 'view') DESC, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS asof_view_id
      |  FROM events WHERE event_type IN ('view', 'purchase')),
      |lv AS (SELECT user_id, event_id AS latest_view_id, ts AS latest_ts
      |  FROM (SELECT user_id, event_id, ts,
      |          row_number() OVER (PARTITION BY user_id
      |            ORDER BY ts DESC, event_id DESC) AS rn
      |        FROM events WHERE event_type = 'view') WHERE rn = 1)
      |SELECT b.event_id, b.user_id, b.asof_view_id, lv.latest_view_id,
      |  COALESCE(lv.latest_ts > b.ts, FALSE) AS leaked
      |FROM b LEFT JOIN lv USING (user_id)
      |WHERE b.event_type = 'purchase'""")(
    (s, dir) => {
      val e = Tables.events(s, dir)
      val views = e.where(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val correct = graft.operators.AsOfJoin(purchases, views,
        key = "user_id", leftTs = "ts", rightTs = "ts",
        payloadCols = Seq("view_id"))
      val latest = views.groupBy("user_id")
        .agg(max(struct(col("ts"), col("view_id"))).as("m"))
        .select(col("user_id"), col("m.view_id").as("latest_view_id"),
          col("m.ts").as("latest_ts"))
      correct.join(latest, Seq("user_id"), "left")
        .select(col("event_id"), col("user_id"), col("asof_view_id"),
          col("latest_view_id"),
          coalesce(col("latest_ts") > col("ts"), lit(false)).as("leaked"))
    })

  /** Experiment-size planner (power analysis): per event type, the
    * users-per-arm needed to detect a 5% lift of the mean value at
    * α = 0.05, power 0.8 — n = ⌈2σ²(z_α/2 + z_β)² / δ²⌉, with
    * (1.96 + 0.8416)² · 2 · 400 = 6279.2 folded into one literal since
    * δ = mean/20. Variance comes from exact decimal sums cast to
    * double ONCE (the q105 contract — identical IEEE ops both
    * engines), so the ceiling is bit-stable. One aggregate. */
  val q335 = QueryDef.sql("q335_power_planner",
    """WITH m AS (SELECT event_type, count(*) AS n,
      |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(value AS DECIMAL(18,2))
      |             * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sxx
      |  FROM events GROUP BY 1)
      |SELECT event_type, n,
      |  CAST(ceil(6279.2 * (n * sxx - sx * sx) / (sx * sx)) AS BIGINT)
      |    AS n_needed
      |FROM m""")(
    (s, dir) => {
      val x = col("value").cast("decimal(18,2)")
      Tables.events(s, dir).groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(x).cast("double").as("sx"),
          sum(x * x).cast("double").as("sxx"))
        .select(col("event_type"), col("n"),
          ceil(lit(6279.2) * (col("n") * col("sxx") - col("sx") * col("sx"))
            / (col("sx") * col("sx"))).cast("long").as("n_needed"))
    })

  /** Bloom-filter size planner: for each join-pruning keyset (the
    * q167 bloom-join candidates), the filter bits and hash count the
    * standard sizing formulas give at 1% and 0.1% target fpp —
    * m = ⌈−n·ln p / ln²2⌉ (the ln terms folded into per-fpp literals),
    * k = round(m/n·ln 2). Distinct counts are the only data pass; the
    * advisor table is |keysets|×|fpp| rows. */
  val q337 = QueryDef.sql("q337_bloom_planner",
    """WITH k AS (
      |  SELECT 'lineitem.l_orderkey' AS keyset,
      |    CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_keys
      |  FROM lineitem
      |  UNION ALL SELECT 'orders.o_custkey',
      |    CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders
      |  UNION ALL SELECT 'customer.c_custkey',
      |    CAST(count(DISTINCT c_custkey) AS BIGINT) FROM customer),
      |f AS (SELECT * FROM (VALUES ('1pct', 9.585059, 7),
      |      ('0.1pct', 14.377589, 10)) AS t(fpp, bits_per_key, n_hashes))
      |SELECT k.keyset, f.fpp, k.n_keys,
      |  CAST(ceil(k.n_keys * f.bits_per_key) AS BIGINT) AS filter_bits,
      |  CAST(f.n_hashes AS INT) AS n_hashes
      |FROM k, f""")(
    (s, dir) => {
      def keys(df: org.apache.spark.sql.DataFrame, name: String, c: String) =
        df.agg(countDistinct(col(c)).cast("long").as("n_keys"))
          .select(lit(name).as("keyset"), col("n_keys"))
      val k = keys(Tables.lineitem(s, dir), "lineitem.l_orderkey",
          "l_orderkey")
        .unionAll(keys(Tables.orders(s, dir), "orders.o_custkey",
          "o_custkey"))
        .unionAll(keys(Tables.customer(s, dir), "customer.c_custkey",
          "c_custkey"))
      val f = s.createDataFrame(
        java.util.List.of(
          org.apache.spark.sql.Row("1pct", 9.585059, 7),
          org.apache.spark.sql.Row("0.1pct", 14.377589, 10)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("fpp",
            org.apache.spark.sql.types.StringType, nullable = false),
          org.apache.spark.sql.types.StructField("bits_per_key",
            org.apache.spark.sql.types.DoubleType, nullable = false),
          org.apache.spark.sql.types.StructField("n_hashes",
            org.apache.spark.sql.types.IntegerType, nullable = false))))
      k.crossJoin(broadcast(f))
        .select(col("keyset"), col("fpp"), col("n_keys"),
          ceil(col("n_keys") * col("bits_per_key")).cast("long")
            .as("filter_bits"),
          col("n_hashes").cast("int").as("n_hashes"))
    })

  val all: Seq[QueryDef] = Seq(q190, q191, q192, q193, q194, q195, q196,
    q197, q198, q199, q200, q201, q202, q203, q204, q205, q206, q207, q208,
    q209, q210, q211, q212, q213, q214, q226, q234, q240, q246, q247, q252,
    q266, q270, q279, q297, q320, q323, q324, q327, q328, q329, q330, q335,
    q337, q338)
}
