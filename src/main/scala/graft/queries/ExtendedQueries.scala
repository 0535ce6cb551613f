package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 extension batch: graph labelling, time-series repair,
  * reshaping, and exact-arithmetic statistics beyond the q1–q114
  * catalog. Same contract as every other query file — each entry is a
  * Spark plan plus (where ANSI-expressible) a DuckDB oracle over the
  * same parquet, hash-compared by the driver. */
object ExtendedQueries {

  /** Undirected co-purchase edges (parts sharing an order), expanded
    * in-row per order — the q83/q99/q102/q104 derivation. */
  private def coPurchaseEdges(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).select("l_orderkey", "l_partkey")
      .groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
      .where(size(col("parts")) >= 2)
      .select(explode(graft.functions.PairExpressions
        .pairArray(col("parts"))).as("p"))
      .select(col("p.id1").as("u"), col("p.id2").as("v"))

  private val ccEdgeCte =
    """e AS (
      |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      |sym AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e)"""

  /** Bounded min-label propagation
    * ([[graft.operators.Graph.labelPropagationMin]]), 4 synchronous
    * rounds over the co-purchase graph — the oracle-checkable,
    * fixed-budget cousin of the alternating-star fixpoint (q56's
    * machinery): every round is an exact BIGINT min, so DuckDB unrolls
    * the same 4 rounds and matches bit-for-bit whether or not the
    * propagation has converged to true components yet. */
  val q115 = {
    def round(n: Int, prev: String): String =
      s"""m$n AS (SELECT s.v AS id, min(p.label) AS nl
         |  FROM $prev p JOIN sym s ON s.u = p.id GROUP BY s.v),
         |l$n AS (SELECT p.id, least(p.label, coalesce(m.nl, p.label)) AS label
         |  FROM $prev p LEFT JOIN m$n m ON p.id = m.id)"""
    QueryDef.sql("q115_cc_labelprop",
      s"""WITH $ccEdgeCte,
         |l0 AS (SELECT DISTINCT u AS id, u AS label FROM sym),
         |${round(1, "l0")},
         |${round(2, "l1")},
         |${round(3, "l2")},
         |${round(4, "l3")}
         |SELECT id, label FROM l4""")(
      (s, dir) => graft.operators.Graph.labelPropagationMin(
        coPurchaseEdges(s, dir), "u", "v", rounds = 4))
  }

  /** Time-series gap fill + forward fill: per-user daily grid from the
    * user's first to last active day (a `sequence` spine — no
    * cross-join against a global calendar), daily closing value =
    * last event of the day (deterministic ts,event_id order), silent
    * days forward-filled. The fill itself is the gaps-and-islands
    * count-partition trick (`count(v) OVER (... ORDER BY day)` then
    * one value per partition) rather than IGNORE NULLS window syntax,
    * so the oracle is plain ANSI and the value is a pure passthrough —
    * no arithmetic to drift. Spine size is Σ per-user active spans,
    * not |users|×|calendar|. */
  val q116 = QueryDef.sql("q116_gapfill_ffill",
    """WITH daily AS (
      |  SELECT user_id, day, value AS v FROM (
      |    SELECT user_id, CAST(ts AS DATE) AS day, value,
      |      row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
      |        ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM events) WHERE rn = 1),
      |b AS (SELECT user_id, min(day) AS d0, max(day) AS d1
      |      FROM daily GROUP BY user_id),
      |spine AS (SELECT user_id,
      |    CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
      |      CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM b),
      |j AS (SELECT s.user_id, s.day, d.v,
      |    count(d.v) OVER (PARTITION BY s.user_id ORDER BY s.day) AS c
      |  FROM spine s LEFT JOIN daily d
      |    ON s.user_id = d.user_id AND s.day = d.day)
      |SELECT user_id, day,
      |  max(v) OVER (PARTITION BY user_id, c) AS value_filled
      |FROM j""")(
    (s, dir) => graft.operators.TimeSeries.gapFillForwardFill(
      Tables.events(s, dir), "user_id", "ts", "event_id", "value"))

  /** UNPIVOT/melt: the four lineitem measures to long format (Spark's
    * native `unpivot` operator — one Expand node, no self-union scan
    * ×4), then one aggregation per (flag, measure). The oracle is the
    * ANSI UNION-ALL equivalent; `measure` carries the source column
    * names so the two reshape paths must agree literally. */
  val q117 = QueryDef.sql("q117_unpivot",
    """WITH long AS (
      |  SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS value
      |  FROM lineitem
      |  UNION ALL SELECT l_returnflag, 'l_extendedprice', l_extendedprice
      |  FROM lineitem
      |  UNION ALL SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
      |  UNION ALL SELECT l_returnflag, 'l_tax', l_tax FROM lineitem)
      |SELECT l_returnflag, measure,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_val,
      |  count(*) AS n
      |FROM long GROUP BY 1, 2""")(
    (s, dir) => Tables.lineitem(s, dir)
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")),
        "measure", "value")
      .groupBy("l_returnflag", "measure")
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double")
        .as("sum_val"), count(lit(1)).as("n")))

  /** Period-over-period deltas: weekly revenue per market segment with
    * the previous week's value, absolute delta and percent change —
    * the trend primitive of every OLAP report. Weekly sums accumulate
    * as DECIMAL (order-exact) and cast to double once; delta and pct
    * are then a fixed IEEE op sequence on identical inputs, so both
    * engines produce identical bits. First week per segment: NULL
    * delta/pct (lag is NULL). Monday-start `date_trunc('week', …)` on
    * both engines. */
  val q118 = QueryDef.sql("q118_period_deltas",
    """WITH r AS (
      |  SELECT c.c_mktsegment,
      |    CAST(date_trunc('week', o.o_orderdate) AS DATE) AS week,
      |    CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY 1, 2)
      |SELECT c_mktsegment, week, rev,
      |  rev - lag(rev) OVER w AS delta,
      |  round((rev - lag(rev) OVER w) / lag(rev) OVER w * 100, 6) AS pct
      |FROM r
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY week)""")(
    (s, dir) => {
      val r = Tables.orders(s, dir)
        .join(Tables.customer(s, dir),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"),
          date_trunc("week", col("o_orderdate")).cast("date").as("week"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("rev"))
      val w = Window.partitionBy("c_mktsegment").orderBy("week")
      r.select(col("c_mktsegment"), col("week"), col("rev"),
        (col("rev") - lag(col("rev"), 1).over(w)).as("delta"),
        round((col("rev") - lag(col("rev"), 1).over(w)) /
          lag(col("rev"), 1).over(w) * 100, 6).as("pct"))
    })

  /** Total-variation distance between each source's token distribution
    * and the corpus distribution — the mixture-drift audit a training
    * pipeline runs per ingest slice. EXACT rational arithmetic: with
    * integer counts c_st (token in source), c_s (source total), c_t
    * (corpus token), c_c (corpus total),
    *   TV(s) = [ Σ_{t∈Vs} |c_st·c_c − c_t·c_s| + (c_c − Σ_{t∈Vs} c_t)·c_s ]
    *           / (2·c_s·c_c)
    * where the second term folds all tokens ABSENT from the source —
    * so the plan only ever touches (source, token) rows that exist
    * (Σ|Vs| rows), never |sources|×|vocab|. One IEEE division rounded
    * at the end; everything before it is BIGINT. */
  val q119 = QueryDef.sql("q119_tv_distance",
    """WITH tok AS (
      |  SELECT source, t AS token FROM (
      |    SELECT source, unnest(string_split_regex(lower(trim(text)),
      |      '\s+')) AS t FROM documents) WHERE t <> ''),
      |st AS (SELECT source, token, count(*) AS c_st
      |       FROM tok GROUP BY 1, 2),
      |t AS (SELECT token, CAST(sum(c_st) AS BIGINT) AS c_t
      |      FROM st GROUP BY 1),
      |s AS (SELECT source, CAST(sum(c_st) AS BIGINT) AS c_s
      |      FROM st GROUP BY 1),
      |c AS (SELECT CAST(sum(c_st) AS BIGINT) AS c_c FROM st),
      |p AS (SELECT st.source,
      |    CAST(sum(abs(st.c_st * c.c_c - t.c_t * s.c_s)) AS BIGINT)
      |      AS present,
      |    CAST(sum(t.c_t) AS BIGINT) AS covered
      |  FROM st JOIN t USING (token) JOIN s USING (source) CROSS JOIN c
      |  GROUP BY 1)
      |SELECT p.source, s.c_s,
      |  round(CAST(p.present + (c.c_c - p.covered) * s.c_s AS DOUBLE) /
      |    (2.0 * CAST(s.c_s AS DOUBLE) * CAST(c.c_c AS DOUBLE)), 6)
      |    AS tv_dist
      |FROM p JOIN s USING (source) CROSS JOIN c""")(
    (s, dir) => graft.operators.TextAnalysis.tvDistance(
      Tables.documents(s, dir)
        .select(col("source"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
        .where(col("token") =!= ""),
      "source", "token"))

  /** Herfindahl–Hirschman concentration of supply per nation: shares
    * of total shipped quantity across that nation's suppliers, HHI =
    * Σ share² — the skew/market-dominance audit. Quantities become
    * exact cent-scaled BIGINTs; squares accumulate as DECIMAL(38,0)
    * (BIGINT would overflow around petabyte scale), and the single
    * IEEE division rounds at the end. */
  val q120 = QueryDef.sql("q120_hhi_concentration",
    """WITH q AS (
      |  SELECT s.s_nationkey, l.l_suppkey,
      |    CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT)
      |      AS qc
      |  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  GROUP BY 1, 2)
      |SELECT s_nationkey,
      |  count(*) AS n_suppliers,
      |  CAST(sum(qc) AS BIGINT) AS total_qc,
      |  round(CAST(sum(CAST(qc AS DECIMAL(19,0)) * CAST(qc AS DECIMAL(19,0)))
      |      AS DOUBLE) /
      |    (CAST(sum(qc) AS DOUBLE) * CAST(sum(qc) AS DOUBLE)), 6) AS hhi
      |FROM q GROUP BY 1""")(
    (s, dir) => {
      val q = Tables.lineitem(s, dir)
        .join(Tables.supplier(s, dir),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_nationkey", "l_suppkey")
        .agg((sum(col("l_quantity").cast("decimal(18,2)")) * 100)
          .cast("long").as("qc"))
      q.groupBy("s_nationkey")
        .agg(count(lit(1)).as("n_suppliers"),
          sum(col("qc")).as("total_qc"),
          round(sum(col("qc").cast("decimal(19,0)") *
              col("qc").cast("decimal(19,0)")).cast("double") /
            (sum(col("qc")).cast("double") * sum(col("qc")).cast("double")),
            6).as("hhi"))
    })

  /** Winsorized mean per group: clip values to the group's
    * [p05, p95] (exact interpolated percentiles — the q43 cross-engine
    * contract) and average. Robust-statistics cousin of q112's MAD.
    * The clipped sum is NOT a sum of clipped doubles (shuffle-order
    * dependent): untouched middle values accumulate as DECIMAL, and the
    * clipped tails enter as count×bound in one fixed IEEE sequence —
    * exact on both engines. */
  val q121 = QueryDef.sql("q121_winsorize",
    """WITH qs AS (
      |  SELECT l_returnflag,
      |    quantile_cont(l_extendedprice, 0.05) AS p05,
      |    quantile_cont(l_extendedprice, 0.95) AS p95
      |  FROM lineitem GROUP BY 1),
      |a AS (
      |  SELECT l.l_returnflag, count(*) AS n,
      |    count(*) FILTER (WHERE l.l_extendedprice < q.p05) AS n_low,
      |    count(*) FILTER (WHERE l.l_extendedprice > q.p95) AS n_high,
      |    CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)))
      |      FILTER (WHERE l.l_extendedprice >= q.p05
      |          AND l.l_extendedprice <= q.p95) AS DOUBLE) AS sum_mid,
      |    min(q.p05) AS p05, min(q.p95) AS p95
      |  FROM lineitem l JOIN qs q ON l.l_returnflag = q.l_returnflag
      |  GROUP BY 1)
      |SELECT l_returnflag, n, n_low, n_high,
      |  round(((sum_mid + (CAST(n_low AS DOUBLE) * p05))
      |    + (CAST(n_high AS DOUBLE) * p95)) / CAST(n AS DOUBLE), 6)
      |    AS win_mean
      |FROM a""")(
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      // both percentiles from ONE sort-based aggregation pass (the
      // array form shares the collected buffer; two scalar percentile
      // aggs would each sort the group)
      val qs = li.groupBy("l_returnflag")
        .agg(expr("percentile(l_extendedprice, array(0.05, 0.95))").as("ps"))
        .select(col("l_returnflag"), col("ps").getItem(0).as("p05"),
          col("ps").getItem(1).as("p95"))
      li.join(broadcast(qs), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          count(when(col("l_extendedprice") < col("p05"), 1)).as("n_low"),
          count(when(col("l_extendedprice") > col("p95"), 1)).as("n_high"),
          sum(when(col("l_extendedprice") >= col("p05") &&
              col("l_extendedprice") <= col("p95"),
            col("l_extendedprice").cast("decimal(18,2)")))
            .cast("double").as("sum_mid"),
          min(col("p05")).as("p05"), min(col("p95")).as("p95"))
        .select(col("l_returnflag"), col("n"), col("n_low"), col("n_high"),
          round(((col("sum_mid") + (col("n_low").cast("double") * col("p05")))
            + (col("n_high").cast("double") * col("p95")))
            / col("n").cast("double"), 6).as("win_mean"))
    })

  /** Missing-value imputation by group median: 'error' events are
    * treated as having lost their measurement and take the user's
    * median of non-error values (exact interpolated percentile).
    * Users with only error events stay NULL — imputation must not
    * invent data. */
  val q122 = QueryDef.sql("q122_impute_median",
    """WITH med AS (
      |  SELECT user_id, quantile_cont(value, 0.5) AS med
      |  FROM events WHERE event_type <> 'error' GROUP BY 1)
      |SELECT e.event_id, e.user_id,
      |  CASE WHEN e.event_type = 'error' THEN m.med ELSE e.value END
      |    AS value_imputed
      |FROM events e LEFT JOIN med m ON e.user_id = m.user_id""")(
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val med = ev.where(col("event_type") =!= "error")
        .groupBy("user_id")
        .agg(expr("percentile(value, 0.5)").as("med"))
      ev.join(med, Seq("user_id"), "left")
        .select(col("event_id"), col("user_id"),
          when(col("event_type") === "error", col("med"))
            .otherwise(col("value")).as("value_imputed"))
    })

  /** Vocabulary coverage / OOV rate per document against the corpus
    * top-1000 token vocabulary — the tokenizer-fit audit run before
    * training. The vocab is a global top-k with a total (count, token)
    * order: Spark plans orderBy+limit as TakeOrderedAndProject
    * (per-partition heaps + driver merge of 1000 rows — no
    * single-partition sort), and the 1000-row vocab is explicitly
    * broadcast back to the token stream. */
  val q123 = QueryDef.sql("q123_vocab_coverage",
    """WITH tok AS (
      |  SELECT doc_id, t AS token FROM (
      |    SELECT doc_id, unnest(string_split_regex(lower(trim(text)),
      |      '\s+')) AS t FROM documents) WHERE t <> ''),
      |tc AS (SELECT token, count(*) AS c FROM tok GROUP BY 1),
      |vocab AS (SELECT token FROM tc ORDER BY c DESC, token LIMIT 1000)
      |SELECT tok.doc_id, count(*) AS n_tokens,
      |  count(v.token) AS n_invocab,
      |  round(CAST(count(v.token) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
      |    AS coverage
      |FROM tok LEFT JOIN vocab v ON tok.token = v.token
      |GROUP BY tok.doc_id""")(
    (s, dir) => {
      val tok = Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
        .where(col("token") =!= "")
      val vocab = tok.groupBy("token").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("token")).limit(1000)
        .select(col("token"), lit(1).as("inv"))
      tok.join(broadcast(vocab), Seq("token"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"), count(col("inv")).as("n_invocab"))
        .select(col("doc_id"), col("n_tokens"), col("n_invocab"),
          round(col("n_invocab").cast("double") /
            col("n_tokens").cast("double"), 6).as("coverage"))
    })

  /** Hopping (sliding) event-time windows: 1-hour windows every 15
    * minutes — each event lands in exactly 4 windows. Spark's native
    * `window(ts, dur, slide)` (one generator, no self-union); the
    * oracle replays the slide algebra with integer epoch-µs division
    * against a 4-row offset table. q22's tumbling contract, extended
    * to overlap. */
  val q124 = QueryDef.sql("q124_hopping_window",
    """SELECT CAST((epoch_us(e.ts) // 900000000 - k.k) * 900 AS BIGINT)
      |    AS win_start,
      |  count(*) AS n,
      |  count(DISTINCT e.user_id) AS n_users,
      |  CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      |FROM events e CROSS JOIN (VALUES (0), (1), (2), (3)) k(k)
      |GROUP BY 1""")(
    (s, dir) => Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("win"))
      .agg(count(lit(1)).as("n"),
        count_distinct(col("user_id")).as("n_users"),
        sum(col("value").cast("decimal(18,6)")).cast("double")
          .as("sum_value"))
      .select(unix_seconds(col("win.start")).as("win_start"),
        col("n"), col("n_users"), col("sum_value")))

  /** Pairwise source vocabulary overlap: Jaccard of the distinct-token
    * sets of every source pair — the redundancy matrix consulted when
    * choosing mixture weights (q119 measures drift from the corpus;
    * this measures sources against EACH OTHER). Exact set algebra:
    * intersections count via a self-join on token (group size bounded
    * by |sources| per token, so the join cannot skew past |sources|²
    * rows per token), sizes via one aggregation, one rounded division
    * at the end. */
  val q125 = QueryDef.sql("q125_vocab_overlap",
    """WITH v AS (SELECT DISTINCT source, t AS token FROM (
      |    SELECT source, unnest(string_split_regex(lower(trim(text)),
      |      '\s+')) AS t FROM documents) WHERE t <> ''),
      |sz AS (SELECT source, count(*) AS n FROM v GROUP BY 1),
      |inter AS (SELECT a.source AS s1, b.source AS s2, count(*) AS i
      |  FROM v a JOIN v b ON a.token = b.token AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT s1, s2, i,
      |  round(CAST(i AS DOUBLE) / CAST(x.n + y.n - i AS DOUBLE), 6)
      |    AS jaccard
      |FROM inter JOIN sz x ON inter.s1 = x.source
      |           JOIN sz y ON inter.s2 = y.source""")(
    (s, dir) => {
      val v = Tables.documents(s, dir)
        .select(col("source"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
        .where(col("token") =!= "").distinct()
      val sz = v.groupBy("source").agg(count(lit(1)).as("n"))
      val inter = v.as("a").join(v.as("b"),
          col("a.token") === col("b.token") &&
            col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("s1"), col("b.source").as("s2"))
        .agg(count(lit(1)).as("i"))
      inter
        .join(broadcast(sz.select(col("source").as("s1"), col("n").as("n1"))),
          "s1")
        .join(broadcast(sz.select(col("source").as("s2"), col("n").as("n2"))),
          "s2")
        .select(col("s1"), col("s2"), col("i"),
          round(col("i").cast("double") /
            (col("n1") + col("n2") - col("i")).cast("double"), 6)
            .as("jaccard"))
    })

  /** Bounded-lag exponential smoothing (EWMA over the last 5 events
    * per user, α = ½): the numerator and the weight renormalization
    * for short histories are ONE fixed IEEE expression over 2-decimal-
    * exact lag values — no running recursion, no shuffle-order sums,
    * so the doubles agree bit-for-bit across engines. The streaming
    * twin of this is a mapGroupsWithState fold; batch-side, five lags
    * in one per-user window sort. */
  val q126 = QueryDef.sql("q126_ewma",
    """WITH l AS (
      |  SELECT event_id, user_id, value AS v0,
      |    lag(value, 1) OVER w AS v1, lag(value, 2) OVER w AS v2,
      |    lag(value, 3) OVER w AS v3, lag(value, 4) OVER w AS v4
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT event_id, user_id,
      |  round((((v0 + 0.5 * coalesce(v1, 0.0))
      |      + (0.25 * coalesce(v2, 0.0)) + (0.125 * coalesce(v3, 0.0)))
      |      + (0.0625 * coalesce(v4, 0.0))) /
      |    (((1.0 + 0.5 * (CASE WHEN v1 IS NULL THEN 0.0 ELSE 1.0 END))
      |      + (0.25 * (CASE WHEN v2 IS NULL THEN 0.0 ELSE 1.0 END))
      |      + (0.125 * (CASE WHEN v3 IS NULL THEN 0.0 ELSE 1.0 END)))
      |      + (0.0625 * (CASE WHEN v4 IS NULL THEN 0.0 ELSE 1.0 END))), 6)
      |    AS ewma
      |FROM l""")(
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      def ind(c: org.apache.spark.sql.Column) =
        when(c.isNull, lit(0.0)).otherwise(lit(1.0))
      val l = Tables.events(s, dir).select(col("event_id"), col("user_id"),
        col("value").as("v0"),
        lag(col("value"), 1).over(w).as("v1"),
        lag(col("value"), 2).over(w).as("v2"),
        lag(col("value"), 3).over(w).as("v3"),
        lag(col("value"), 4).over(w).as("v4"))
      l.select(col("event_id"), col("user_id"),
        round(((col("v0") + lit(0.5) * coalesce(col("v1"), lit(0.0)))
          + (lit(0.25) * coalesce(col("v2"), lit(0.0)))
          + (lit(0.125) * coalesce(col("v3"), lit(0.0)))
          + (lit(0.0625) * coalesce(col("v4"), lit(0.0)))) /
          (((lit(1.0) + lit(0.5) * ind(col("v1")))
            + (lit(0.25) * ind(col("v2")))
            + (lit(0.125) * ind(col("v3"))))
            + (lit(0.0625) * ind(col("v4")))), 6).as("ewma"))
    })

  /** OLS trend slope per market segment: weekly revenue (exact cents)
    * regressed on the ISO-week index, slope from the five classical
    * moments — q105's exact-moment contract extended from correlation
    * to regression. Every moment is a BIGINT (x = weeks-since-epoch
    * ≈ 1.6k, y = weekly cents ≈ 1e8 ⇒ the n·Σxy − Σx·Σy numerator
    * peaks ~1e16, two orders under the 2^63 line at this shape; a
    * 100 TB run re-centers x at min-week first, which this does too
    * so the bound is tighter still). One division, rounded: cents per
    * week. */
  val q127 = QueryDef.sql("q127_ols_slope",
    """WITH r AS (
      |  SELECT c.c_mktsegment,
      |    epoch(date_trunc('week', o.o_orderdate)) // 604800 AS wk,
      |    CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
      |      AS cents
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY 1, 2),
      |x AS (SELECT c_mktsegment, wk - min(wk) OVER () AS x, cents FROM r),
      |m AS (SELECT c_mktsegment, count(*) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(cents) AS BIGINT) AS sy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx,
      |    CAST(sum(x * cents) AS BIGINT) AS sxy
      |  FROM x GROUP BY 1)
      |SELECT c_mktsegment, n,
      |  round(CAST(n * sxy - sx * sy AS DOUBLE) /
      |    CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope_cents_per_week
      |FROM m""")(
    (s, dir) => {
      val r = Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"),
          (unix_timestamp(date_trunc("week", col("o_orderdate")))
            / 604800).cast("long").as("wk"))
        .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
          .cast("long").as("cents"))
      // global min-week: a 1-row aggregate broadcast back (no
      // single-partition window over the weekly frame)
      val minWk = r.agg(min(col("wk")).as("mw"))
      val x = r.crossJoin(broadcast(minWk))
        .select(col("c_mktsegment"), (col("wk") - col("mw")).as("x"),
          col("cents"))
      x.groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("cents")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("cents")).as("sxy"))
        .select(col("c_mktsegment"), col("n"),
          round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
            / (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"),
            6).as("slope_cents_per_week"))
    })

  /** Per-label embedding centroids, dimension-wise: the class-prototype
    * computation behind nearest-centroid classification and IVF
    * seeding. Floats are quantized to exact micro-unit BIGINTs with
    * `floor` (round() ties break differently across engines; floor
    * never does), summed exactly, and the mean itself stays in
    * floor-divided micro-units — sum_q/n is a genuine 7-decimal
    * rational whose 6-decimal round() LANDS ON TIES (sum_q is a
    * micro-int, n a count), and Java HALF_UP vs DuckDB binary rounding
    * disagree on exactly those, so no round() appears at all: the
    * centroid of a million-vector label is bit-identical on any engine
    * and any partitioning. posexplode ⇔ DuckDB's zip-unnest supplies
    * the dimension index. */
  val q128 = QueryDef.sql("q128_label_centroid",
    """WITH q AS (
      |  SELECT label, pos,
      |    CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS qx
      |  FROM (SELECT label, unnest(embedding) AS x,
      |          unnest(range(len(embedding))) AS pos FROM embeddings))
      |SELECT label, CAST(pos AS INTEGER) AS pos, count(*) AS n,
      |  CAST(sum(qx) AS BIGINT) AS sum_q,
      |  CAST(floor(CAST(sum(qx) AS DOUBLE) / CAST(count(*) AS DOUBLE))
      |    AS BIGINT) AS centroid_micro
      |FROM q GROUP BY 1, 2""")(
    (s, dir) => Tables.embeddings(s, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("label"), col("pos"),
        floor(col("x").cast("double") * 1000000).cast("long").as("qx"))
      .groupBy("label", "pos")
      .agg(count(lit(1)).as("n"), sum(col("qx")).as("sum_q"))
      .select(col("label"), col("pos"), col("n"), col("sum_q"),
        floor(col("sum_q").cast("double") / col("n").cast("double"))
          .cast("long").as("centroid_micro")))

  /** Day-of-week activity profile per event type: counts and
    * within-type share — the seasonality fingerprint read before any
    * time-based sampling. ISO day numbering pinned across engines:
    * Spark `weekday` (0 = Monday) + 1 ⇔ DuckDB `isodow` (1 = Monday);
    * Spark's `dayofweek` (1 = Sunday) is the trap. Share is two exact
    * integers and one rounded division. */
  val q129 = QueryDef.sql("q129_dow_profile",
    """WITH d AS (SELECT event_type, isodow(ts) AS dow, count(*) AS n
      |           FROM events GROUP BY 1, 2),
      |t AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS tot
      |      FROM d GROUP BY 1)
      |SELECT d.event_type, CAST(d.dow AS INTEGER) AS dow, d.n,
      |  round(CAST(d.n AS DOUBLE) / CAST(t.tot AS DOUBLE), 6) AS share
      |FROM d JOIN t ON d.event_type = t.event_type""")(
    (s, dir) => {
      val d = Tables.events(s, dir)
        .groupBy(col("event_type"),
          (weekday(col("ts")) + 1).cast("int").as("dow"))
        .agg(count(lit(1)).as("n"))
      val t = d.groupBy("event_type").agg(sum(col("n")).as("tot"))
      d.join(broadcast(t), "event_type")
        .select(col("event_type"), col("dow"), col("n"),
          round(col("n").cast("double") / col("tot").cast("double"), 6)
            .as("share"))
    })

  /** Ratio-to-report: each nation's share of its REGION's revenue —
    * the percent-of-total window over a pre-aggregated frame (25
    * nation rows; the window never sees fact rows). Cents-exact
    * BIGINTs; one rounded division. */
  val q130 = QueryDef.sql("q130_share_of_total",
    """WITH rev AS (
      |  SELECT n.n_regionkey, n.n_nationkey,
      |    CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) * 100
      |      AS BIGINT) AS cents
      |  FROM lineitem l
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN nation n ON s.s_nationkey = n.n_nationkey
      |  GROUP BY 1, 2)
      |SELECT n_regionkey, n_nationkey, cents,
      |  round(CAST(cents AS DOUBLE) /
      |    CAST(sum(cents) OVER (PARTITION BY n_regionkey) AS DOUBLE), 6)
      |    AS region_share
      |FROM rev""")(
    (s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_regionkey", "n_nationkey")
        .agg((sum(col("l_extendedprice").cast("decimal(18,2)")) * 100)
          .cast("long").as("cents"))
      rev.select(col("n_regionkey"), col("n_nationkey"), col("cents"),
        round(col("cents").cast("double") /
          sum(col("cents")).over(Window.partitionBy("n_regionkey"))
            .cast("double"), 6).as("region_share"))
    })

  /** Cumulative distinct users by day WITHOUT a distinct-in-window:
    * each user collapses to their first-seen day (one aggregation),
    * then a running sum over the |days| frame — the growth-curve
    * rewrite that keeps "count distinct so far" linear at any scale.
    * The ordered window runs on the ~30-row daily frame, never on
    * events. */
  val q131 = QueryDef.sql("q131_cumulative_users",
    """WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS day
      |           FROM events GROUP BY 1),
      |d AS (SELECT day, count(*) AS new_users FROM f GROUP BY 1)
      |SELECT day, new_users,
      |  CAST(sum(new_users) OVER (ORDER BY day
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
      |FROM d""")(
    (s, dir) => {
      val d = Tables.events(s, dir)
        .groupBy("user_id").agg(min(to_date(col("ts"))).as("day"))
        .groupBy("day").agg(count(lit(1)).as("new_users"))
      d.select(col("day"), col("new_users"),
        sum(col("new_users")).over(Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("cum_users"))
    })

  /** Order-to-ship lead-time histogram: exact day differences over the
    * orders⋈lineitem fact-fact join — both sides shuffle-partitioned
    * on the SAME key (orderkey), the plan a bucketed 100 TB warehouse
    * runs as a zero-exchange sort-merge join. */
  val q132 = QueryDef.sql("q132_leadtime_hist",
    """SELECT date_diff('day', CAST(o.o_orderdate AS DATE),
      |    CAST(l.l_shipdate AS DATE)) AS lead_days,
      |  count(*) AS n
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |GROUP BY 1""")(
    (s, dir) => Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(datediff(to_date(col("l_shipdate")),
        to_date(col("o_orderdate"))).as("lead_days"))
      .agg(count(lit(1)).as("n")))

  /** Bigram collocation mining over the document corpus: adjacent-token
    * pairs scored by the Dice coefficient 2·c_xy/(c_x + c_y) — exact
    * rational, no corpus-size term and no log (cross-engine libm is
    * not contract-grade; q57/q103 use the same linear-score stance).
    * Adjacency comes from a LEAD over per-doc token positions — the
    * per-document window never leaves the doc's partition. Support
    * floor c_xy ≥ 3. */
  val q133 = QueryDef.sql("q133_bigram_dice",
    """WITH tok AS (
      |  SELECT doc_id, pos, t AS w FROM (
      |    SELECT doc_id,
      |      unnest(string_split_regex(lower(trim(text)), '\s+')) AS t,
      |      unnest(range(len(string_split_regex(lower(trim(text)), '\s+'))))
      |        AS pos
      |    FROM documents) WHERE t <> ''),
      |bi AS (SELECT w AS w1,
      |    lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      |  FROM tok),
      |cb AS (SELECT w1, w2, count(*) AS c_xy FROM bi
      |       WHERE w2 IS NOT NULL GROUP BY 1, 2 HAVING count(*) >= 3),
      |cu AS (SELECT w, count(*) AS c FROM tok GROUP BY 1)
      |SELECT w1, w2, c_xy,
      |  round((2.0 * CAST(c_xy AS DOUBLE)) / CAST(x.c + y.c AS DOUBLE), 6)
      |    AS dice
      |FROM cb JOIN cu x ON cb.w1 = x.w JOIN cu y ON cb.w2 = y.w""")(
    (s, dir) => {
      val tok = Tables.documents(s, dir)
        .select(col("doc_id"),
          posexplode(split(lower(trim(col("text"))), "\\s+"))
            .as(Seq("pos", "w")))
        .where(col("w") =!= "")
      val bi = tok
        .withColumn("w2", lead(col("w"), 1).over(
          Window.partitionBy("doc_id").orderBy("pos")))
        .where(col("w2").isNotNull)
        .groupBy(col("w").as("w1"), col("w2"))
        .agg(count(lit(1)).as("c_xy"))
        .where(col("c_xy") >= 3)
      val cu = tok.groupBy(col("w")).agg(count(lit(1)).as("c"))
      bi.join(cu.select(col("w").as("w1"), col("c").as("c_x")), "w1")
        .join(cu.select(col("w").as("w2"), col("c").as("c_y")), "w2")
        .select(col("w1"), col("w2"), col("c_xy"),
          round((lit(2.0) * col("c_xy").cast("double")) /
            (col("c_x") + col("c_y")).cast("double"), 6).as("dice"))
    })

  /** Coverage-gap audit: (event_type, day, hour) slots with ZERO
    * events inside the observed span — the ingest-completeness check
    * run before declaring a day loadable. The spine is |types|×|days|
    * ×24 (bounded, broadcast-sized by construction); observed slots
    * distinct once; one broadcast anti join. The inverse of q116's
    * fill: this REPORTS holes instead of papering over them. */
  val q134 = QueryDef.sql("q134_missing_slots",
    """WITH b AS (SELECT min(CAST(ts AS DATE)) AS d0,
      |    max(CAST(ts AS DATE)) AS d1 FROM events),
      |days AS (SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
      |    CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM b),
      |types AS (SELECT DISTINCT event_type FROM events),
      |hours AS (SELECT CAST(unnest(range(24)) AS INTEGER) AS hour),
      |spine AS (SELECT event_type, day, hour FROM types, days, hours),
      |obs AS (SELECT DISTINCT event_type, CAST(ts AS DATE) AS day,
      |    CAST(hour(ts) AS INTEGER) AS hour FROM events)
      |SELECT s.event_type, s.day, s.hour FROM spine s
      |WHERE NOT EXISTS (SELECT 1 FROM obs o
      |  WHERE o.event_type = s.event_type AND o.day = s.day
      |    AND o.hour = s.hour)""")(
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val days = ev.agg(min(to_date(col("ts"))).as("d0"),
          max(to_date(col("ts"))).as("d1"))
        .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      val types = ev.select("event_type").distinct()
      val hours = s.range(24).select(col("id").cast("int").as("hour"))
      val spine = types.crossJoin(days).crossJoin(hours)
      val obs = ev.select(col("event_type"), to_date(col("ts")).as("day"),
        hour(col("ts")).cast("int").as("hour")).distinct()
      spine.join(broadcast(obs), Seq("event_type", "day", "hour"),
        "left_anti")
    })

  /** Per-group min-max feature scaling: (x − min)/(max − min) with the
    * group extrema broadcast back — the normalization step before any
    * distance-based model. Inputs are 2-decimal-exact doubles, extrema
    * are exact, one division rounded once. A constant group
    * (max = min) yields NULL, not a 0/0 NaN. */
  val q135 = QueryDef.sql("q135_minmax_scale",
    """WITH ex AS (SELECT event_type, min(value) AS lo, max(value) AS hi
      |           FROM events GROUP BY 1)
      |SELECT e.event_id, e.event_type,
      |  CASE WHEN ex.hi > ex.lo THEN
      |    round((e.value - ex.lo) / (ex.hi - ex.lo), 6) END AS scaled
      |FROM events e JOIN ex ON e.event_type = ex.event_type""")(
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val ex = ev.groupBy("event_type")
        .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
      ev.join(broadcast(ex), "event_type")
        .select(col("event_id"), col("event_type"),
          when(col("hi") > col("lo"),
            round((col("value") - col("lo")) / (col("hi") - col("lo")), 6))
            .as("scaled"))
    })

  /** Deterministic mode per group: the most frequent l_quantity per
    * return flag, ties broken by the smaller value — a (count DESC,
    * value ASC) total order, so the pick is reproducible on any
    * engine/partitioning (the A1 DISTINCT ON lesson from the
    * reference, done right). Two bounded aggregations; the ranking
    * window runs over value-count rows, never fact rows. */
  val q136 = QueryDef.sql("q136_mode",
    """WITH c AS (SELECT l_returnflag,
      |    CAST(l_quantity AS DECIMAL(18,2)) AS v, count(*) AS n
      |  FROM lineitem GROUP BY 1, 2),
      |r AS (SELECT l_returnflag, v, n, row_number() OVER (
      |    PARTITION BY l_returnflag ORDER BY n DESC, v) AS rn FROM c)
      |SELECT l_returnflag, CAST(v AS DOUBLE) AS mode_qty, n
      |FROM r WHERE rn = 1""")(
    (s, dir) => {
      val c = Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"),
          col("l_quantity").cast("decimal(18,2)").as("v"))
        .agg(count(lit(1)).as("n"))
      c.withColumn("rn", row_number().over(
          Window.partitionBy("l_returnflag")
            .orderBy(col("n").desc, col("v"))))
        .where(col("rn") === 1)
        .select(col("l_returnflag"), col("v").cast("double").as("mode_qty"),
          col("n"))
    })

  /** Benford first-digit audit of order amounts — the classic fraud /
    * data-fabrication screen. The first significant digit comes from
    * the DECIMAL-CENTS INTEGER rendered as a string (integer→string is
    * exact on every engine; double→string is not, and log10 is libm),
    * so the digit extraction is contract-grade. Share = two integers,
    * one rounded division. */
  val q137 = QueryDef.sql("q137_benford",
    """WITH d AS (
      |  SELECT substring(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))
      |      * 100 AS BIGINT) AS VARCHAR), 1, 1) AS digit
      |  FROM orders WHERE o_totalprice > 0),
      |c AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
      |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c)
      |SELECT digit, n,
      |  round(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS share
      |FROM c CROSS JOIN t""")(
    (s, dir) => {
      val d = Tables.orders(s, dir).where(col("o_totalprice") > 0)
        .select(substring((col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long").cast("string"), 1, 1).as("digit"))
      val c = d.groupBy("digit").agg(count(lit(1)).as("n"))
      val t = c.agg(sum(col("n")).as("tot"))
      c.crossJoin(broadcast(t))
        .select(col("digit"), col("n"),
          round(col("n").cast("double") / col("tot").cast("double"), 6)
            .as("share"))
    })

  /** Referential-integrity audit: orphan counts across every foreign-
    * key edge of the star schema in ONE union of anti-join aggregates
    * — the load-validation gate a warehouse runs after each batch.
    * True dimension parents (supplier, nation) broadcast; fact-sized
    * parents (orders, customer) keep the shuffled hash join a 100 TB
    * run needs — forcing a broadcast there would OOM the executors at
    * scale even though it happens to fit at test SFs. */
  val q138 = QueryDef.sql("q138_fk_orphans",
    """SELECT 'lineitem.l_orderkey->orders' AS fk, count(*) AS n_child,
      |  count(*) FILTER (WHERE o.o_orderkey IS NULL) AS n_orphans
      |FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      |UNION ALL
      |SELECT 'lineitem.l_suppkey->supplier', count(*),
      |  count(*) FILTER (WHERE s.s_suppkey IS NULL)
      |FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |UNION ALL
      |SELECT 'orders.o_custkey->customer', count(*),
      |  count(*) FILTER (WHERE c.c_custkey IS NULL)
      |FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      |UNION ALL
      |SELECT 'customer.c_nationkey->nation', count(*),
      |  count(*) FILTER (WHERE n.n_nationkey IS NULL)
      |FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey""")(
    (s, dir) => {
      def edge(fk: String, child: DataFrame, childKey: String,
               parent: DataFrame, parentKey: String,
               dim: Boolean): DataFrame = {
        val keys = parent.select(col(parentKey))
        child.join(if (dim) broadcast(keys) else keys,
            child(childKey) === col(parentKey), "left")
          .agg(count(lit(1)).as("n_child"),
            count(when(col(parentKey).isNull, 1)).as("n_orphans"))
          .select(lit(fk).as("fk"), col("n_child"), col("n_orphans"))
      }
      edge("lineitem.l_orderkey->orders", Tables.lineitem(s, dir),
          "l_orderkey", Tables.orders(s, dir), "o_orderkey", dim = false)
        .unionByName(edge("lineitem.l_suppkey->supplier",
          Tables.lineitem(s, dir), "l_suppkey",
          Tables.supplier(s, dir), "s_suppkey", dim = true))
        .unionByName(edge("orders.o_custkey->customer",
          Tables.orders(s, dir), "o_custkey",
          Tables.customer(s, dir), "c_custkey", dim = false))
        .unionByName(edge("customer.c_nationkey->nation",
          Tables.customer(s, dir), "c_nationkey",
          Tables.nation(s, dir), "n_nationkey", dim = true))
    })

  /** RFM customer segmentation: recency (days from the batch horizon),
    * frequency (order count), monetary (exact cents), each scored into
    * quintiles. The oracle states the scores as `ntile(5)` windows;
    * the Spark side NEVER runs a global window — each score is a
    * [[graft.operators.Rank.globalRank]] two-pass rank (the
    * per-customer frame is fact-sized at warehouse scale; an
    * unpartitioned ntile would drain it through one task) with the SQL
    * ntile bucket formula applied to (rank, n) in exact integers:
    * sizes ⌈n/k⌉ for the first n mod k buckets, ⌊n/k⌋ after.
    * Deterministic because every order ends in the unique customer
    * key. */
  val q139 = QueryDef.sql("q139_rfm",
    """WITH h AS (SELECT max(CAST(o_orderdate AS DATE)) AS horizon
      |           FROM orders),
      |c AS (SELECT o_custkey,
      |    date_diff('day', max(CAST(o_orderdate AS DATE)),
      |      min(horizon)) AS recency_days,
      |    count(*) AS frequency,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
      |      AS monetary_cents
      |  FROM orders CROSS JOIN h GROUP BY 1)
      |SELECT o_custkey, recency_days, frequency, monetary_cents,
      |  CAST(ntile(5) OVER (ORDER BY recency_days, o_custkey) AS INTEGER)
      |    AS r_score,
      |  CAST(ntile(5) OVER (ORDER BY frequency DESC, o_custkey) AS INTEGER)
      |    AS f_score,
      |  CAST(ntile(5) OVER (ORDER BY monetary_cents DESC, o_custkey)
      |    AS INTEGER) AS m_score
      |FROM c""")(
    (s, dir) => {
      val h = Tables.orders(s, dir)
        .agg(max(to_date(col("o_orderdate"))).as("horizon"))
      val c = Tables.orders(s, dir).crossJoin(broadcast(h))
        .groupBy("o_custkey")
        .agg(datediff(min(col("horizon")), max(to_date(col("o_orderdate"))))
          .as("recency_days"),
          count(lit(1)).as("frequency"),
          (sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("long").as("monetary_cents"))
      // SQL ntile(k) from a 1-based dense rank i over n rows: the
      // first n mod k buckets take ceil(n/k) rows, the rest floor —
      // bucket = if i <= (q+1)·r then ceil(i/(q+1)) else
      // r + ceil((i−(q+1)·r)/q), with q = n DIV k, r = n MOD k.
      // (q = 0 ⇒ every i falls in the first branch; no 0-division.)
      def ntileOf(rank: org.apache.spark.sql.Column,
                  n: org.apache.spark.sql.Column, k: Int) = {
        // Column./ is double division; floor-cast restores the integer
        // quotient (operands positive and far below 2^53 per partition
        // count, so the double is exact)
        val q = floor(n / k).cast("long"); val r = n % k
        when(rank <= (q + 1) * r, ceil(rank / (q + 1)))
          .otherwise(r + ceil((rank - (q + 1) * r) / q))
          .cast("int")
      }
      val withR = graft.operators.Rank.globalRank(c, "rk_r",
        col("recency_days"), col("o_custkey"))
      val withF = graft.operators.Rank.globalRank(withR, "rk_f",
        col("frequency").unary_-, col("o_custkey"))
      val withM = graft.operators.Rank.globalRank(withF, "rk_m",
        col("monetary_cents").unary_-, col("o_custkey"))
      val n = c.agg(count(lit(1)).as("n_cust"))
      withM.crossJoin(broadcast(n))
        .select(col("o_custkey"), col("recency_days"), col("frequency"),
          col("monetary_cents"),
          ntileOf(col("rk_r"), col("n_cust"), 5).as("r_score"),
          ntileOf(col("rk_f"), col("n_cust"), 5).as("f_score"),
          ntileOf(col("rk_m"), col("n_cust"), 5).as("m_score"))
    })

  /** Near-zero-variance feature audit: unbiased variance of each
    * lineitem measure — the feature-selection screen that drops dead
    * columns before training. The closed form n·Σx² − (Σx)² stays in
    * EXACT cent integers (products fit BIGINT, sums accumulate as
    * DECIMAL(38,0)), and the single division is finished with `floor`,
    * not `round`: at ~1e9 magnitudes a double's ULP (~1.2e-7) sits
    * next to the 1e-6 rounding grid, so Spark's decimal-string
    * HALF_UP and DuckDB's binary rounding genuinely diverge (caught
    * by the sf0.1 check) — whereas floor is one IEEE function of
    * bit-identical inputs on both engines, at any magnitude. Output
    * is integer cents² (scale-0 DECIMAL→DOUBLE is a single correctly-
    * rounded int conversion on both engines; fractional-scale
    * decimals are not). */
  val q140 = QueryDef.sql("q140_feature_variance",
    """WITH long AS (
      |  SELECT 'l_quantity' AS feature, l_quantity AS v FROM lineitem
      |  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
      |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
      |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem),
      |m AS (SELECT feature, count(*) AS n,
      |    CAST(sum(CAST(CAST(v AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS DECIMAL(38,0)) AS sx,
      |    CAST(sum(CAST(CAST(v AS DECIMAL(18,2)) * 100 AS BIGINT)
      |           * CAST(CAST(v AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS DECIMAL(38,0)) AS sxx
      |  FROM long GROUP BY 1)
      |SELECT feature, n,
      |  CAST(floor(CAST(n * sxx - sx * sx AS DOUBLE) /
      |    CAST(n * (n - 1) AS DOUBLE)) AS BIGINT) AS var_cents2
      |FROM m""")(
    (s, dir) => {
      val cents = col("v").cast("decimal(18,2)").multiply(100).cast("long")
      val m = Tables.lineitem(s, dir)
        .unpivot(Array.empty[org.apache.spark.sql.Column],
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")), "feature", "v")
        .groupBy("feature")
        .agg(count(lit(1)).as("n"),
          sum(cents.cast("decimal(38,0)")).as("sx"),
          sum((cents * cents).cast("decimal(38,0)")).as("sxx"))
      m.select(col("feature"), col("n"),
        floor((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
          / (col("n") * (col("n") - 1)).cast("double")).cast("long")
          .as("var_cents2"))
    })

  /** Repeat-event bursts: consecutive events of the same (user, type)
    * arriving within 60 s — the double-fire / retry-storm detector
    * (exactly the duplicate class streaming dedup evicts; this is its
    * batch forensic twin, reporting the burst with its gap and value
    * delta instead of silently dropping it). One per-user window,
    * exact integer µs gaps. */
  val q141 = QueryDef.sql("q141_repeat_events",
    """WITH l AS (
      |  SELECT event_id, user_id, event_type,
      |    epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us,
      |    value - lag(value) OVER w AS value_delta
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id, event_type
      |               ORDER BY ts, event_id))
      |SELECT event_id, user_id, event_type,
      |  CAST(gap_us AS BIGINT) AS gap_us, value_delta
      |FROM l WHERE gap_us <= 60000000""")(
    (s, dir) => {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
            .as("gap_us"),
          (col("value") - lag(col("value"), 1).over(w)).as("value_delta"))
        .where(col("gap_us") <= 60000000L)
    })

  /** Gini coefficient of order-count inequality across customers, via
    * the sorted-rank identity G = 2·Σ(i·xᵢ)/(n·Σxᵢ) − (n+1)/n. The
    * global rank i comes from [[graft.operators.Rank.globalRank]] —
    * range partitions + per-partition counts + broadcast offsets —
    * NOT a Window.orderBy over everything (the single-task drain
    * q84/q89 exist to avoid; the oracle's plain row_number is the
    * semantic spec, not the plan). Σ(i·xᵢ) stays BIGINT; two IEEE
    * divisions and one subtraction at the end, in pinned order. */
  val q142 = QueryDef.sql("q142_gini",
    """WITH c AS (SELECT o_custkey, count(*) AS x
      |           FROM orders GROUP BY 1),
      |r AS (SELECT x, row_number() OVER (ORDER BY x, o_custkey) AS i
      |      FROM c),
      |m AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
      |    CAST(sum(i * x) AS BIGINT) AS six FROM r)
      |SELECT n, sx,
      |  round((2.0 * CAST(six AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
      |    - (CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS gini
      |FROM m""")(
    (s, dir) => {
      val c = Tables.orders(s, dir)
        .groupBy("o_custkey").agg(count(lit(1)).as("x"))
      val r = graft.operators.Rank.globalRank(c, "i",
        col("x"), col("o_custkey"))
      r.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("i") * col("x")).as("six"))
        .select(col("n"), col("sx"),
          round((lit(2.0) * col("six").cast("double"))
            / (col("n").cast("double") * col("sx").cast("double"))
            - ((col("n") + 1).cast("double") / col("n").cast("double")), 6)
            .as("gini"))
    })

  /** Week-over-week churn: users active in week w but absent in w+1
    * (the last observed week has no successor and is excluded). One
    * distinct (user, week) frame self-left-joined one week forward —
    * the cohort-transition audit behind every retention dashboard,
    * exact integers throughout. */
  val q143 = QueryDef.sql("q143_churn",
    """WITH uw AS (SELECT DISTINCT user_id,
      |    CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
      |mx AS (SELECT max(wk) AS mw FROM uw)
      |SELECT a.wk, count(*) AS active,
      |  count(*) FILTER (WHERE b.user_id IS NULL) AS churned,
      |  count(*) FILTER (WHERE b.user_id IS NOT NULL) AS retained
      |FROM uw a CROSS JOIN mx
      |LEFT JOIN uw b ON a.user_id = b.user_id AND b.wk = a.wk + 7
      |WHERE a.wk < mx.mw
      |GROUP BY a.wk""")(
    (s, dir) => {
      val uw = Tables.events(s, dir)
        .select(col("user_id"),
          date_trunc("week", col("ts")).cast("date").as("wk"))
        .distinct()
      val mx = uw.agg(max(col("wk")).as("mw"))
      val b = uw.select(col("user_id").as("buid"), col("wk").as("bwk"))
      uw.crossJoin(broadcast(mx)).where(col("wk") < col("mw"))
        .join(b, col("user_id") === col("buid") &&
          col("bwk") === date_add(col("wk"), 7), "left")
        .groupBy("wk")
        .agg(count(lit(1)).as("active"),
          count(when(col("bwk").isNull, 1)).as("churned"),
          count(col("bwk")).as("retained"))
    })

  /** ABC / Pareto classification of parts by revenue: parts sorted by
    * descending cents, cumulative share banded at 80% / 95%. The
    * running total comes from [[graft.operators.Rank.globalPrefixSum]]
    * (range partitions + per-partition totals + broadcast offsets) —
    * never a single-task global window — and the share thresholds are
    * EXACT integer cross-multiplications (5·cum ≤ 4·total ⇔
    * share ≤ 0.8): no division anywhere. */
  val q144 = QueryDef.sql("q144_abc_classes",
    """WITH r AS (SELECT l_partkey,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100
      |      AS BIGINT) AS cents
      |  FROM lineitem GROUP BY 1),
      |c AS (SELECT l_partkey, cents,
      |    CAST(sum(cents) OVER (ORDER BY cents DESC, l_partkey
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
      |  FROM r),
      |t AS (SELECT CAST(sum(cents) AS BIGINT) AS tot FROM r)
      |SELECT l_partkey, cents, cum_cents,
      |  CASE WHEN 5 * cum_cents <= 4 * tot THEN 'A'
      |       WHEN 20 * cum_cents <= 19 * tot THEN 'B'
      |       ELSE 'C' END AS abc_class
      |FROM c CROSS JOIN t""")(
    (s, dir) => {
      // eager: r feeds THREE independent jobs (the range-bound sampling
      // pass inside globalPrefixSum, the per-partition totals collect,
      // and t's broadcast build) — materialized once, each hits
      // resident blocks instead of re-aggregating lineitem (round-5
      // bench recorded q144 at 10.3 s for a ~20k-row frame)
      val r = Tables.lineitem(s, dir)
        .groupBy("l_partkey")
        .agg((sum(col("l_extendedprice").cast("decimal(18,2)")) * 100)
          .cast("long").as("cents"))
        .localCheckpoint(eager = true)
      val c = graft.operators.Rank.globalPrefixSum(r, "cum_cents", "cents",
        col("cents").unary_-, col("l_partkey"))
      val t = r.agg(sum(col("cents")).as("tot"))
      c.crossJoin(broadcast(t))
        .select(col("l_partkey"), col("cents"), col("cum_cents"),
          when(lit(5) * col("cum_cents") <= lit(4) * col("tot"), "A")
            .when(lit(20) * col("cum_cents") <= lit(19) * col("tot"), "B")
            .otherwise("C").as("abc_class"))
    })

  /** Deterministic ordered string aggregation: each nation's supplier
    * roster as one comma-joined, lexicographically sorted string —
    * LISTAGG/string_agg made reproducible (collect_list order is
    * partition-arrival order; the array_sort makes it a set).
    * Binary/ASCII collation on both engines. */
  val q145 = QueryDef.sql("q145_string_agg",
    """SELECT s_nationkey, count(*) AS n_suppliers,
      |  string_agg(s_name, ',' ORDER BY s_name) AS roster
      |FROM supplier GROUP BY s_nationkey""")(
    (s, dir) => Tables.supplier(s, dir)
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_suppliers"),
        array_join(array_sort(collect_list(col("s_name"))), ",")
          .as("roster")))

  /** Tukey-fence outlier audit per group: IQR fences at Q1 − 1.5·IQR /
    * Q3 + 1.5·IQR (exact interpolated quartiles, one fixed IEEE fence
    * expression) with exact counts outside each fence — the quantile-
    * based robust-outlier twin of q112's MAD. Quartiles come from one
    * array-percentile pass and broadcast back. */
  val q146 = QueryDef.sql("q146_tukey_fences",
    """WITH qs AS (
      |  SELECT l_returnflag,
      |    quantile_cont(l_extendedprice, 0.25) AS q1,
      |    quantile_cont(l_extendedprice, 0.75) AS q3
      |  FROM lineitem GROUP BY 1)
      |SELECT l.l_returnflag, count(*) AS n,
      |  round(q.q1 - (1.5 * (q.q3 - q.q1)), 6) AS fence_lo,
      |  round(q.q3 + (1.5 * (q.q3 - q.q1)), 6) AS fence_hi,
      |  count(*) FILTER (WHERE l.l_extendedprice
      |    < q.q1 - (1.5 * (q.q3 - q.q1))) AS n_low,
      |  count(*) FILTER (WHERE l.l_extendedprice
      |    > q.q3 + (1.5 * (q.q3 - q.q1))) AS n_high
      |FROM lineitem l JOIN qs q ON l.l_returnflag = q.l_returnflag
      |GROUP BY 1, 3, 4""")(
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val qs = li.groupBy("l_returnflag")
        .agg(expr("percentile(l_extendedprice, array(0.25, 0.75))").as("ps"))
        .select(col("l_returnflag"), col("ps").getItem(0).as("q1"),
          col("ps").getItem(1).as("q3"))
      val lo = col("q1") - (lit(1.5) * (col("q3") - col("q1")))
      val hi = col("q3") + (lit(1.5) * (col("q3") - col("q1")))
      li.join(broadcast(qs), "l_returnflag")
        .groupBy(col("l_returnflag"), round(lo, 6).as("fence_lo"),
          round(hi, 6).as("fence_hi"))
        .agg(count(lit(1)).as("n"),
          count(when(col("l_extendedprice") < lo, 1)).as("n_low"),
          count(when(col("l_extendedprice") > hi, 1)).as("n_high"))
        .select(col("l_returnflag"), col("n"), col("fence_lo"),
          col("fence_hi"), col("n_low"), col("n_high"))
    })

  /** Correlated-subquery decorrelation: orders strictly above their
    * own customer's average order value. The oracle states it as the
    * textbook correlated predicate; the Spark side is the decorrelated
    * join Catalyst would rewrite it to anyway — with the comparison as
    * an exact integer CROSS-MULTIPLICATION (cents·n > Σcents), so no
    * mean is ever materialized and no rounding exists to drift. */
  val q147 = QueryDef.sql("q147_above_customer_avg",
    """SELECT o.o_orderkey, o.o_custkey
      |FROM orders o
      |WHERE CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |    * (SELECT count(*) FROM orders i
      |       WHERE i.o_custkey = o.o_custkey)
      |  > (SELECT CAST(sum(CAST(i.o_totalprice AS DECIMAL(18,2)) * 100)
      |       AS BIGINT) FROM orders i WHERE i.o_custkey = o.o_custkey)""")(
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val stats = o.groupBy(col("o_custkey").as("ck"))
        .agg(count(lit(1)).as("cnt"),
          sum((col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")).as("sum_cents"))
      o.join(stats, col("o_custkey") === col("ck"))
        .where((col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long") * col("cnt") > col("sum_cents"))
        .select(col("o_orderkey"), col("o_custkey"))
    })

  /** Trailing 7-day revenue per market segment via a RANGE window
    * frame (`RANGE BETWEEN 6 PRECEDING AND CURRENT ROW` over a day
    * index) — the moving-aggregate class q19's ROWS frame cannot
    * express when days are missing: RANGE bounds by VALUE, so silent
    * days simply fall out of the frame. Day index is exact integer
    * epoch-days; sums are exact cents. */
  val q148 = QueryDef.sql("q148_trailing_7d",
    """WITH d AS (
      |  SELECT c.c_mktsegment,
      |    epoch(CAST(CAST(o.o_orderdate AS DATE) AS TIMESTAMP)) // 86400
      |      AS day_idx,
      |    CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
      |      AS cents
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY 1, 2)
      |SELECT c_mktsegment, CAST(day_idx AS BIGINT) AS day_idx, cents,
      |  CAST(sum(cents) OVER (PARTITION BY c_mktsegment ORDER BY day_idx
      |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS trailing_7d_cents
      |FROM d""")(
    (s, dir) => {
      val d = Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"),
          (unix_timestamp(to_date(col("o_orderdate")).cast("timestamp"))
            / 86400).cast("long").as("day_idx"))
        .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
          .cast("long").as("cents"))
      d.select(col("c_mktsegment"), col("day_idx"), col("cents"),
        sum(col("cents")).over(Window.partitionBy("c_mktsegment")
          .orderBy("day_idx").rangeBetween(-6, Window.currentRow))
          .as("trailing_7d_cents"))
    })

  /** Leave-one-out target encoding: each lineitem's return-flag mean
    * price EXCLUDING the row itself, (Σ − x)/(n − 1) — the standard
    * leakage-free categorical encoding for training. Numerator and
    * denominator stay exact integers; the encoded value is emitted in
    * floor-divided cents (q128's no-round contract: integer/count
    * quotients land on rounding ties). */
  val q149 = QueryDef.sql("q149_target_encoding",
    """WITH s AS (SELECT l_returnflag, count(*) AS n,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * 100)
      |      AS BIGINT) AS sum_cents
      |  FROM lineitem GROUP BY 1)
      |SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
      |  CAST(floor(CAST(s.sum_cents
      |      - CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS DOUBLE) / CAST(s.n - 1 AS DOUBLE)) AS BIGINT)
      |    AS loo_mean_cents
      |FROM lineitem l JOIN s ON l.l_returnflag = s.l_returnflag""")(
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val cents = (col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
      val st = li.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum(cents).as("sum_cents"))
      li.join(broadcast(st), "l_returnflag")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          floor((col("sum_cents") - cents).cast("double") /
            (col("n") - 1).cast("double")).cast("long")
            .as("loo_mean_cents"))
    })

  /** Monthly seasonality index per market segment: each calendar
    * month's share of the segment's total revenue — the forecasting
    * prior. Exact cents; one rounded O(1)-magnitude division (the
    * share is ≤ 1, far from the round-tie ULP regime). */
  val q150 = QueryDef.sql("q150_month_seasonality",
    """WITH m AS (
      |  SELECT c.c_mktsegment, CAST(month(o.o_orderdate) AS INTEGER)
      |      AS month,
      |    CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
      |      AS cents
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY 1, 2),
      |t AS (SELECT c_mktsegment, CAST(sum(cents) AS BIGINT) AS tot
      |      FROM m GROUP BY 1)
      |SELECT m.c_mktsegment, m.month, m.cents,
      |  round(CAST(m.cents AS DOUBLE) / CAST(t.tot AS DOUBLE), 6)
      |    AS month_share
      |FROM m JOIN t ON m.c_mktsegment = t.c_mktsegment""")(
    (s, dir) => {
      val m = Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"),
          month(col("o_orderdate")).cast("int").as("month"))
        .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
          .cast("long").as("cents"))
      val t = m.groupBy("c_mktsegment").agg(sum(col("cents")).as("tot"))
      m.join(broadcast(t), "c_mktsegment")
        .select(col("c_mktsegment"), col("month"), col("cents"),
          round(col("cents").cast("double") / col("tot").cast("double"), 6)
            .as("month_share"))
    })

  /** Salient terms per source: tokens over-represented vs the corpus,
    * lift = (c_st/c_s)/(c_t/c_c) computed as the exact cross-ratio
    * c_st·c_c/(c_t·c_s) — q119's count frames reused for
    * characterisation instead of distance. Support floor c_st ≥ 5;
    * top-5 per source ranked by the raw lift double (identical bits
    * on both engines ⇒ identical order) with the token as total-order
    * tiebreak. */
  val q151 = QueryDef.sql("q151_salient_terms",
    """WITH tok AS (
      |  SELECT source, t AS token FROM (
      |    SELECT source, unnest(string_split_regex(lower(trim(text)),
      |      '\s+')) AS t FROM documents) WHERE t <> ''),
      |st AS (SELECT source, token, count(*) AS c_st
      |       FROM tok GROUP BY 1, 2),
      |t AS (SELECT token, CAST(sum(c_st) AS BIGINT) AS c_t
      |      FROM st GROUP BY 1),
      |s AS (SELECT source, CAST(sum(c_st) AS BIGINT) AS c_s
      |      FROM st GROUP BY 1),
      |c AS (SELECT CAST(sum(c_st) AS BIGINT) AS c_c FROM st),
      |l AS (SELECT st.source, st.token, st.c_st,
      |    CAST(st.c_st * c.c_c AS DOUBLE) / CAST(t.c_t * s.c_s AS DOUBLE)
      |      AS lift
      |  FROM st JOIN t USING (token) JOIN s USING (source) CROSS JOIN c
      |  WHERE st.c_st >= 5),
      |r AS (SELECT source, token, c_st, lift, row_number() OVER (
      |    PARTITION BY source ORDER BY lift DESC, token) AS rk FROM l)
      |SELECT source, token, c_st, round(lift, 6) AS lift,
      |  CAST(rk AS BIGINT) AS rk
      |FROM r WHERE rk <= 5""")(
    (s, dir) => {
      val tok = Tables.documents(s, dir)
        .select(col("source"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
        .where(col("token") =!= "")
      val st = tok.groupBy("source", "token").agg(count(lit(1)).as("c_st"))
      val t = st.groupBy("token").agg(sum(col("c_st")).as("c_t"))
      val srcTot = st.groupBy("source").agg(sum(col("c_st")).as("c_s"))
      val cc = st.agg(sum(col("c_st")).as("c_c"))
      val l = st.where(col("c_st") >= 5)
        .join(t, "token").join(broadcast(srcTot), "source").crossJoin(cc)
        .select(col("source"), col("token"), col("c_st"),
          ((col("c_st") * col("c_c")).cast("double") /
            (col("c_t") * col("c_s")).cast("double")).as("lift"))
      l.withColumn("rk", row_number().over(Window.partitionBy("source")
          .orderBy(col("lift").desc, col("token"))).cast("long"))
        .where(col("rk") <= 5)
        .select(col("source"), col("token"), col("c_st"),
          round(col("lift"), 6).as("lift"), col("rk"))
    })

  /** Two-sample Kolmogorov–Smirnov statistic ENTIRELY in integers:
    * D = max_v |F₁(v) − F₂(v)| becomes max over the merged support of
    * |c₁≤v·n₂ − c₂≤v·n₁| (one BIGINT per support point), with the
    * n₁·n₂ denominator applied once at the end — a distribution-shift
    * test with zero floating-point in the statistic itself. Cumulative
    * counts run over the 50-value aggregated support, never fact rows.
    * Compared groups: returned (A) vs refused-return (R) quantity
    * distributions. */
  val q152 = QueryDef.sql("q152_ks_stat",
    """WITH c AS (SELECT CAST(l_quantity AS DECIMAL(18,2)) AS v,
      |    count(*) FILTER (WHERE l_returnflag = 'A') AS ca,
      |    count(*) FILTER (WHERE l_returnflag = 'R') AS cr
      |  FROM lineitem WHERE l_returnflag IN ('A', 'R') GROUP BY 1),
      |cum AS (SELECT v,
      |    CAST(sum(ca) OVER w AS BIGINT) AS f1,
      |    CAST(sum(cr) OVER w AS BIGINT) AS f2
      |  FROM c WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)),
      |n AS (SELECT CAST(sum(ca) AS BIGINT) AS n1,
      |    CAST(sum(cr) AS BIGINT) AS n2 FROM c)
      |SELECT n1, n2,
      |  CAST(max(abs(f1 * n2 - f2 * n1)) AS BIGINT) AS ks_num,
      |  round(CAST(max(abs(f1 * n2 - f2 * n1)) AS DOUBLE) /
      |    CAST(n1 * n2 AS DOUBLE), 6) AS ks
      |FROM cum CROSS JOIN n GROUP BY n1, n2""")(
    (s, dir) => {
      val c = Tables.lineitem(s, dir)
        .where(col("l_returnflag").isin("A", "R"))
        .groupBy(col("l_quantity").cast("decimal(18,2)").as("v"))
        .agg(count(when(col("l_returnflag") === "A", 1)).as("ca"),
          count(when(col("l_returnflag") === "R", 1)).as("cr"))
      val w = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = c.select(col("v"), sum(col("ca")).over(w).as("f1"),
        sum(col("cr")).over(w).as("f2"))
      val n = c.agg(sum(col("ca")).as("n1"), sum(col("cr")).as("n2"))
      cum.crossJoin(broadcast(n))
        .groupBy("n1", "n2")
        .agg(max(abs(col("f1") * col("n2") - col("f2") * col("n1")))
          .as("ks_num"))
        .select(col("n1"), col("n2"), col("ks_num"),
          round(col("ks_num").cast("double") /
            (col("n1") * col("n2")).cast("double"), 6).as("ks"))
    })

  /** Behavioural diversity per user: Gini impurity of the event-type
    * mix, 1 − Σ(cᵢ/n)² — exact rational (n² − Σcᵢ²)/n², the
    * classification-impurity measure applied as an entity profile
    * (0 = single-typed, →0.8 = uniform over 5 types). Two bounded
    * aggregations; the O(1)-magnitude division rounds once. */
  val q153 = QueryDef.sql("q153_type_diversity",
    """WITH c AS (SELECT user_id, event_type, count(*) AS n
      |           FROM events GROUP BY 1, 2),
      |u AS (SELECT user_id, CAST(sum(n) AS BIGINT) AS n,
      |    CAST(sum(n * n) AS BIGINT) AS ssq FROM c GROUP BY 1)
      |SELECT user_id, n,
      |  round(CAST(n * n - ssq AS DOUBLE) / CAST(n * n AS DOUBLE), 6)
      |    AS impurity
      |FROM u""")(
    (s, dir) => {
      val c = Tables.events(s, dir)
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
      c.groupBy("user_id")
        .agg(sum(col("n")).as("n"), sum(col("n") * col("n")).as("ssq"))
        .select(col("user_id"), col("n"),
          round((col("n") * col("n") - col("ssq")).cast("double") /
            (col("n") * col("n")).cast("double"), 6).as("impurity"))
    })

  /** Repeat-purchase cadence: exact day gaps between a customer's
    * consecutive orders (lag over the per-customer order sequence,
    * (date, orderkey) total order), then the median interval per
    * market segment — the replenishment-cycle metric. Integer day
    * arithmetic; exact interpolated median. */
  val q154 = QueryDef.sql("q154_reorder_interval",
    """WITH g AS (
      |  SELECT c.c_mktsegment,
      |    date_diff('day',
      |      lag(CAST(o.o_orderdate AS DATE)) OVER (
      |        PARTITION BY o.o_custkey
      |        ORDER BY CAST(o.o_orderdate AS DATE), o.o_orderkey),
      |      CAST(o.o_orderdate AS DATE)) AS gap_days
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
      |SELECT c_mktsegment, count(gap_days) AS n_intervals,
      |  quantile_cont(gap_days, 0.5) AS median_gap_days
      |FROM g WHERE gap_days IS NOT NULL GROUP BY 1""")(
    (s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(to_date(col("o_orderdate")), col("o_orderkey"))
      Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"),
          datediff(to_date(col("o_orderdate")),
            lag(to_date(col("o_orderdate")), 1).over(w)).as("gap_days"))
        .where(col("gap_days").isNotNull)
        .groupBy("c_mktsegment")
        .agg(count(col("gap_days")).as("n_intervals"),
          expr("percentile(gap_days, 0.5)").as("median_gap_days"))
    })

  /** New-vs-returning revenue split per week: each order classified by
    * whether it falls on its customer's acquisition DAY (all same-day
    * first orders are 'new' — a date-level rule, deterministic with no
    * tiebreak needed), then weekly exact-cent revenue per class. The
    * first-order frame is one aggregation, joined back on the customer
    * key — no window over fact rows. */
  val q155 = QueryDef.sql("q155_new_vs_returning",
    """WITH f AS (SELECT o_custkey, min(CAST(o_orderdate AS DATE))
      |      AS first_dt FROM orders GROUP BY 1),
      |cls AS (SELECT
      |    CAST(date_trunc('week', o.o_orderdate) AS DATE) AS week,
      |    CASE WHEN CAST(o.o_orderdate AS DATE) = f.first_dt
      |         THEN 'new' ELSE 'returning' END AS cohort,
      |    CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents
      |  FROM orders o JOIN f ON o.o_custkey = f.o_custkey)
      |SELECT week, cohort, count(*) AS n_orders,
      |  CAST(sum(cents) AS BIGINT) AS revenue_cents
      |FROM cls GROUP BY 1, 2""")(
    (s, dir) => {
      val f = Tables.orders(s, dir)
        .groupBy(col("o_custkey").as("fk"))
        .agg(min(to_date(col("o_orderdate"))).as("first_dt"))
      Tables.orders(s, dir)
        .join(f, col("o_custkey") === col("fk"))
        .select(date_trunc("week", col("o_orderdate")).cast("date")
            .as("week"),
          when(to_date(col("o_orderdate")) === col("first_dt"), "new")
            .otherwise("returning").as("cohort"),
          (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"))
        .groupBy("week", "cohort")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("cents")).as("revenue_cents"))
    })

  /** DISCRETE percentile per group — the smallest actual data value
    * whose cumulative count reaches ⌈p·n⌉ (PostgreSQL percentile_disc
    * semantics, empirically pinned against DuckDB's quantile_disc),
    * unlike q43's interpolated quantile_cont which may emit a value
    * that exists in no row. Spark lacks an exact disc percentile, so
    * the definition computes directly over the AGGREGATED value
    * support (50 quantity values per flag — cumulative counts never
    * touch fact rows), which is also the shape that scales: the
    * per-fact-row window formulation would sort whole groups in
    * single tasks. */
  val q156 = QueryDef.sql("q156_percentile_disc",
    """SELECT l_returnflag,
      |  CAST(quantile_disc(CAST(l_quantity AS DECIMAL(18,2)), 0.5)
      |    AS DOUBLE) AS p50_disc,
      |  CAST(quantile_disc(CAST(l_quantity AS DECIMAL(18,2)), 0.9)
      |    AS DOUBLE) AS p90_disc
      |FROM lineitem GROUP BY 1""")(
    (s, dir) => {
      val c = Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"),
          col("l_quantity").cast("decimal(18,2)").as("v"))
        .agg(count(lit(1)).as("cnt"))
      val wCum = Window.partitionBy("l_returnflag").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wN = Window.partitionBy("l_returnflag")
      val cum = c
        .withColumn("cumc", sum(col("cnt")).over(wCum))
        .withColumn("n", sum(col("cnt")).over(wN))
      cum.groupBy("l_returnflag")
        .agg(
          min(when(col("cumc") >= ceil(lit(0.5) * col("n")), col("v")))
            .cast("double").as("p50_disc"),
          min(when(col("cumc") >= ceil(lit(0.9) * col("n")), col("v")))
            .cast("double").as("p90_disc"))
    })

  /** Per-vector L2 norms over the embedding corpus: Σx² in exact
    * floor-quantized micro-units (q128's contract), then ONE sqrt —
    * IEEE 754 requires sqrt to be correctly rounded, so unlike libm
    * log/exp it IS contract-grade across engines. The norm audit run
    * before cosine similarity assumes unit-ish vectors. */
  val q157 = QueryDef.sql("q157_embedding_norms",
    """WITH q AS (
      |  SELECT vec_id,
      |    CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS qx
      |  FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings)),
      |s AS (SELECT vec_id, count(*) AS dim,
      |    CAST(sum(qx * qx) AS BIGINT) AS ssq FROM q GROUP BY 1)
      |SELECT vec_id, dim,
      |  round(sqrt(CAST(ssq AS DOUBLE)) / 1000000.0, 6) AS l2_norm
      |FROM s""")(
    (s, dir) => Tables.embeddings(s, dir)
      .select(col("vec_id"), explode(col("embedding")).as("x"))
      .select(col("vec_id"),
        floor(col("x").cast("double") * 1000000).cast("long").as("qx"))
      .groupBy("vec_id")
      .agg(count(lit(1)).as("dim"),
        sum(col("qx") * col("qx")).as("ssq"))
      .select(col("vec_id"), col("dim"),
        round(sqrt(col("ssq").cast("double")) / lit(1000000.0), 6)
          .as("l2_norm")))

  /** DAU / WAU / stickiness by day — the canonical engagement panel.
    * "Distinct users in the trailing 7 days" is NOT a distinct-in-
    * window (unbounded at scale): the distinct (user, day) frame joins
    * the day spine on a 7-day band — a bounded ≤7× row expansion —
    * and each day counts distinct users from its own slice. Exact
    * integers; one O(1) rounded ratio. */
  val q158 = QueryDef.sql("q158_dau_wau",
    """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
      |            FROM events),
      |days AS (SELECT DISTINCT day FROM ud),
      |dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY 1),
      |wau AS (SELECT d.day, count(DISTINCT u.user_id) AS wau
      |  FROM days d JOIN ud u
      |    ON u.day BETWEEN d.day - 6 AND d.day
      |  GROUP BY 1)
      |SELECT d.day, dau.dau, wau.wau,
      |  round(CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE), 6)
      |    AS stickiness
      |FROM days d JOIN dau ON d.day = dau.day
      |JOIN wau ON d.day = wau.day""")(
    (s, dir) => {
      val ud = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val days = ud.select("day").distinct()
      val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
      val wau = days.select(col("day").as("d"))
        .join(ud, col("day").between(date_sub(col("d"), 6), col("d")))
        .groupBy(col("d").as("day"))
        .agg(count_distinct(col("user_id")).as("wau"))
      days.join(dau, "day").join(wau, "day")
        .select(col("day"), col("dau"), col("wau"),
          round(col("dau").cast("double") / col("wau").cast("double"), 6)
            .as("stickiness"))
    })

  /** Log₂ magnitude histogram of order values WITHOUT libm: for a
    * positive integer, floor(log₂ x) + 1 is the LENGTH OF ITS BINARY
    * STRING (`bin()` exists on both engines, integer-exact by
    * construction) — the power-law/skew fingerprint read before
    * choosing salting thresholds, with zero floating-point anywhere. */
  val q159 = QueryDef.sql("q159_log2_hist",
    """WITH b AS (
      |  SELECT CAST(length(bin(CAST(CAST(o_totalprice AS DECIMAL(18,2))
      |      * 100 AS BIGINT))) - 1 AS INTEGER) AS log2_bucket
      |  FROM orders WHERE o_totalprice > 0)
      |SELECT log2_bucket, count(*) AS n
      |FROM b GROUP BY 1""")(
    (s, dir) => Tables.orders(s, dir).where(col("o_totalprice") > 0)
      .select((length(bin((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long"))) - 1).cast("int").as("log2_bucket"))
      .groupBy("log2_bucket").agg(count(lit(1)).as("n")))

  def all: Seq[QueryDef] =
    Seq(q115, q116, q117, q118, q119, q120, q121, q122, q123, q124,
      q125, q126, q127, q128, q129, q130, q131, q132, q133, q134,
      q135, q136, q137, q138, q139, q140, q141, q142, q143, q144,
      q145, q146, q147, q148, q149, q150, q151, q152, q153, q154,
      q155, q156, q157, q158, q159)
}
