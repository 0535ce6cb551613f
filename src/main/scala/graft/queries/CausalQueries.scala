package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Causal-inference evaluation over the event stream — the
  * quasi-experimental battery next to the A/B machinery (q202
  * bootstrap CI, q249 Youden threshold): difference-in-differences
  * for observational pre/post comparisons and the Qini/uplift decile
  * table for targeting-model evaluation. Both are exact-integer:
  * cell means ship as floor-micro quotients of exact (sum, count)
  * pairs, treatment assignment replays cross-engine via the md5
  * recipe (q51/q202), and ranking uses the two-pass global rank —
  * so the DuckDB oracles are bit-exact. */
object CausalQueries {

  /** Difference-in-differences: did a heavy-error experience change a
    * user's engagement value? Treated = users with >= 7 error events
    * before the stream midpoint (every user in this dense synthetic
    * stream touches every type, so mere presence would put 100% in
    * the treatment arm — a count threshold makes the cohort split
    * ~50/50 at every SF); periods split at the exact integer µs
    * midpoint of the stream (the q215 stance — no calendar
    * arithmetic); outcome = value of non-error events in exact micro
    * units. The 2x2 (treated, post) cell table ships counts, exact
    * sums and floor-micro means, and did_micro =
    * (T_post - T_pre) - (C_post - C_pre) on those means — the
    * parallel-trends estimate. Scale shape: one broadcast left-join
    * for the treated flag (one row per treated user), one 4-cell
    * aggregate with map-side combine; nothing else. */
  val q288 = QueryDef.sql("q288_did_estimate",
    """WITH m AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2
      |    AS mid FROM events),
      |s AS (SELECT user_id FROM events e, m
      |  WHERE e.event_type = 'error' AND epoch_us(e.ts) < m.mid
      |  GROUP BY user_id HAVING count(*) >= 7),
      |b AS (SELECT CASE WHEN s.user_id IS NULL THEN 0 ELSE 1 END
      |      AS treated,
      |    CASE WHEN epoch_us(e.ts) < m.mid THEN 0 ELSE 1 END AS post,
      |    CAST(CAST(e.value AS DECIMAL(18,6)) * 1000000 AS BIGINT)
      |      AS vm
      |  FROM events e LEFT JOIN s ON e.user_id = s.user_id, m
      |  WHERE e.event_type <> 'error'),
      |g AS (SELECT treated, post, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(vm) AS BIGINT) AS sv
      |  FROM b GROUP BY 1, 2),
      |c AS (SELECT treated, post, n, sv, sv // n AS mm FROM g)
      |SELECT
      |  coalesce(max(CASE WHEN treated = 1 AND post = 0 THEN n END), 0)
      |    AS n_t_pre,
      |  coalesce(max(CASE WHEN treated = 1 AND post = 1 THEN n END), 0)
      |    AS n_t_post,
      |  coalesce(max(CASE WHEN treated = 0 AND post = 0 THEN n END), 0)
      |    AS n_c_pre,
      |  coalesce(max(CASE WHEN treated = 0 AND post = 1 THEN n END), 0)
      |    AS n_c_post,
      |  coalesce(max(CASE WHEN treated = 1 AND post = 0 THEN mm END), 0)
      |    AS m_t_pre,
      |  coalesce(max(CASE WHEN treated = 1 AND post = 1 THEN mm END), 0)
      |    AS m_t_post,
      |  coalesce(max(CASE WHEN treated = 0 AND post = 0 THEN mm END), 0)
      |    AS m_c_pre,
      |  coalesce(max(CASE WHEN treated = 0 AND post = 1 THEN mm END), 0)
      |    AS m_c_post,
      |  (coalesce(max(CASE WHEN treated = 1 AND post = 1 THEN mm END), 0)
      |   - coalesce(max(CASE WHEN treated = 1 AND post = 0 THEN mm END), 0))
      |  - (coalesce(max(CASE WHEN treated = 0 AND post = 1 THEN mm END), 0)
      |   - coalesce(max(CASE WHEN treated = 0 AND post = 0 THEN mm END), 0))
      |    AS did_micro
      |FROM c""")(
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val mid = ev.agg(
        expr("(min(unix_micros(ts)) + max(unix_micros(ts))) DIV 2")
          .as("mid"))
      val treated = ev.where(col("event_type") === "error")
        .crossJoin(broadcast(mid))
        .where(unix_micros(col("ts")) < col("mid"))
        .groupBy("user_id").agg(count(lit(1)).as("c"))
        .where(col("c") >= 7)
        .select(col("user_id"), lit(1L).as("tflag"))
      val b = ev.where(col("event_type") =!= "error")
        .join(broadcast(treated), Seq("user_id"), "left")
        .crossJoin(broadcast(mid))
        .select(coalesce(col("tflag"), lit(0L)).as("treated"),
          when(unix_micros(col("ts")) < col("mid"), 0L).otherwise(1L)
            .as("post"),
          (col("value").cast("decimal(18,6)") * 1000000).cast("long")
            .as("vm"))
      val c = b.groupBy("treated", "post")
        .agg(count(lit(1)).as("n"), sum("vm").as("sv"))
        .withColumn("mm", expr("sv DIV n"))
      def cell(t: Int, p: Int, v: String) = coalesce(
        max(when(col("treated") === t && col("post") === p, col(v))),
        lit(0L))
      c.agg(
        cell(1, 0, "n").as("n_t_pre"), cell(1, 1, "n").as("n_t_post"),
        cell(0, 0, "n").as("n_c_pre"), cell(0, 1, "n").as("n_c_post"),
        cell(1, 0, "mm").as("m_t_pre"), cell(1, 1, "mm").as("m_t_post"),
        cell(0, 0, "mm").as("m_c_pre"), cell(0, 1, "mm").as("m_c_post"),
        ((cell(1, 1, "mm") - cell(1, 0, "mm")) -
          (cell(0, 1, "mm") - cell(0, 0, "mm"))).as("did_micro"))
    })

  /** Qini / uplift decile table for a targeting score: users ranked
    * by click count (the "model"), treatment = md5 parity of the
    * user id (the q202 deterministic-assignment recipe), outcome =
    * any purchase. Per cumulative decile: treated/control counts,
    * converters in each arm, the uplift-rate difference in floor-ppm,
    * and qini_milli = cum_pos_t*1000 - cum_pos_c*cum_t*1000/cum_c
    * (the absolute-converters Qini form, floor-scaled). Ranking is
    * the two-pass [[graft.operators.Rank.globalRank]] over the
    * per-user frame (the q209 stance — no single-task window);
    * everything after the rank is a 10-row frame. */
  val q289 = QueryDef.sql("q289_qini_deciles",
    s"""WITH u AS (SELECT user_id,
       |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS score,
       |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
       |      END) AS BIGINT) AS conv,
       |    ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
       |      ::BIGINT % 2 AS treat
       |  FROM events GROUP BY user_id),
       |r AS (SELECT u.*, row_number() OVER (
       |    ORDER BY score DESC, user_id) AS rn FROM u),
       |n AS (SELECT count(*) AS tot FROM u),
       |d AS (SELECT ((rn - 1) * 10) // tot + 1 AS decile,
       |    CAST(sum(treat) AS BIGINT) AS n_t,
       |    CAST(count(*) - sum(treat) AS BIGINT) AS n_c,
       |    CAST(sum(CASE WHEN treat = 1 THEN conv ELSE 0 END)
       |      AS BIGINT) AS pos_t,
       |    CAST(sum(CASE WHEN treat = 0 THEN conv ELSE 0 END)
       |      AS BIGINT) AS pos_c
       |  FROM r, n GROUP BY 1),
       |c AS (SELECT CAST(decile AS BIGINT) AS decile,
       |    CAST(sum(n_t) OVER o AS BIGINT) AS cum_t,
       |    CAST(sum(n_c) OVER o AS BIGINT) AS cum_c,
       |    CAST(sum(pos_t) OVER o AS BIGINT) AS cum_pos_t,
       |    CAST(sum(pos_c) OVER o AS BIGINT) AS cum_pos_c
       |  FROM d WINDOW o AS (ORDER BY decile ROWS UNBOUNDED PRECEDING))
       |SELECT decile, cum_t, cum_c, cum_pos_t, cum_pos_c,
       |  CASE WHEN cum_t = 0 OR cum_c = 0 THEN 0 ELSE
       |    (cum_pos_t * 1000000) // cum_t
       |      - (cum_pos_c * 1000000) // cum_c END AS uplift_gap_ppm,
       |  CASE WHEN cum_c = 0 THEN cum_pos_t * 1000 ELSE
       |    cum_pos_t * 1000 - (cum_pos_c * cum_t * 1000) // cum_c END
       |    AS qini_milli
       |FROM c""")(
    (s, dir) => {
      import graft.operators.Rank
      val u = Tables.events(s, dir).groupBy("user_id").agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("score"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("conv"))
        .withColumn("treat",
          conv(substring(md5(col("user_id").cast("string")), 1, 15),
            16, 10).cast("long") % 2)
      val tot = u.count()
      val r = Rank.globalRank(u, "rn", col("score").unary_-,
        col("user_id"))
      val d = r.groupBy(expr(s"((rn - 1) * 10) DIV $tot + 1")
          .as("decile"))
        .agg(sum("treat").as("n_t"),
          (count(lit(1)) - sum("treat")).as("n_c"),
          sum(when(col("treat") === 1, col("conv")).otherwise(0L))
            .as("pos_t"),
          sum(when(col("treat") === 0, col("conv")).otherwise(0L))
            .as("pos_c"))
      val o = Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      d.select(col("decile").cast("long").as("decile"),
          sum("n_t").over(o).as("cum_t"),
          sum("n_c").over(o).as("cum_c"),
          sum("pos_t").over(o).as("cum_pos_t"),
          sum("pos_c").over(o).as("cum_pos_c"))
        .select(col("decile"), col("cum_t"), col("cum_c"),
          col("cum_pos_t"), col("cum_pos_c"),
          when(col("cum_t") === 0 || col("cum_c") === 0, 0L)
            .otherwise(expr("(cum_pos_t * 1000000) DIV cum_t" +
              " - (cum_pos_c * 1000000) DIV cum_c"))
            .as("uplift_gap_ppm"),
          when(col("cum_c") === 0, col("cum_pos_t") * 1000)
            .otherwise(expr("cum_pos_t * 1000" +
              " - (cum_pos_c * cum_t * 1000) DIV cum_c"))
            .as("qini_milli"))
    })

  /** Kaplan–Meier survival estimator on the q213 time-to-repeat
    * framing (days from a customer's first to second distinct order
    * day, right-censored at the corpus horizon) — the PRODUCT
    * estimator q213 deliberately left uncomputed ("exp(-H)
    * downstream — libm"): the product needs no libm at all when run
    * as an exact integer fold, S_k = floor(S_{k-1} * (n_k - d_k) /
    * n_k) in ppm units, sequentially over event times. The fold runs
    * in-row over the collected event-time table (one bounded array —
    * |distinct durations|, a few hundred rows — the q278 bounded-tail
    * stance) via Spark's `aggregate` HOF, and DuckDB replays the
    * identical recurrence with list_reduce, so the oracle is
    * bit-exact. Fact-scale work: the per-customer first/second-order
    * aggregates; everything after is bounded. */
  val q292 = QueryDef.sql("q292_kaplan_meier",
    """WITH od AS (SELECT DISTINCT o_custkey, CAST(o_orderdate AS DATE)
      |    AS d FROM orders),
      |h AS (SELECT max(d) AS horizon FROM od),
      |f AS (SELECT o_custkey, min(d) AS f1 FROM od GROUP BY 1),
      |s2 AS (SELECT od.o_custkey, min(od.d) AS sd
      |  FROM od JOIN f ON od.o_custkey = f.o_custkey AND od.d > f.f1
      |  GROUP BY 1),
      |t AS (SELECT
      |    CASE WHEN s2.sd IS NULL
      |         THEN date_diff('day', f.f1, h.horizon)
      |         ELSE date_diff('day', f.f1, s2.sd) END AS tm,
      |    CASE WHEN s2.sd IS NULL THEN 0 ELSE 1 END AS ev
      |  FROM f LEFT JOIN s2 ON f.o_custkey = s2.o_custkey, h),
      |g AS (SELECT tm, CAST(sum(ev) AS BIGINT) AS d,
      |    CAST(count(*) AS BIGINT) AS c FROM t GROUP BY 1),
      |n AS (SELECT CAST(sum(c) AS BIGINT) AS tot FROM g),
      |r AS (SELECT tm, d, c,
      |    n.tot - (sum(c) OVER (ORDER BY tm ROWS UNBOUNDED PRECEDING)
      |      - c) AS n_risk
      |  FROM g, n),
      |e AS (SELECT CAST(tm AS BIGINT) AS tm, d,
      |    CAST(n_risk AS BIGINT) AS n_risk FROM r WHERE d > 0),
      |packed AS (SELECT list(tm ORDER BY tm) AS tms,
      |    list(d ORDER BY tm) AS ds,
      |    list(n_risk ORDER BY tm) AS ns,
      |    list([d, n_risk] ORDER BY tm) AS steps
      |  FROM e),
      |folded AS (SELECT tms, ds, ns,
      |    list_reduce(
      |      list_prepend(CAST([1000000] AS BIGINT[]), steps),
      |      (acc, x) -> list_append(acc,
      |        (acc[len(acc)] * (x[2] - x[1])) // x[2])) AS sv
      |  FROM packed)
      |SELECT unnest(tms) AS t_days, unnest(ds) AS n_events,
      |  unnest(ns) AS n_risk, unnest(sv[2:]) AS s_ppm
      |FROM folded""")(
    (s, dir) => {
      import graft.operators.Rank
      val od = Tables.orders(s, dir)
        .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"))
        .distinct()
        .localCheckpoint(true)
      val horizon = od.agg(max("d").as("horizon"))
      val f = od.groupBy("o_custkey").agg(min("d").as("f1"))
      val s2 = od.join(f, Seq("o_custkey"))
        .where(col("d") > col("f1"))
        .groupBy("o_custkey").agg(min("d").as("sd"))
      val t = f.join(s2, Seq("o_custkey"), "left")
        .crossJoin(broadcast(horizon))
        .select(
          when(col("sd").isNull, datediff(col("horizon"), col("f1")))
            .otherwise(datediff(col("sd"), col("f1"))).as("tm"),
          when(col("sd").isNull, 0L).otherwise(1L).as("ev"))
      val g = t.groupBy("tm")
        .agg(sum("ev").as("d"), count(lit(1)).as("c"))
      val tot = g.agg(sum("c")).head().getLong(0)
      val e = Rank.globalPrefixSum(g, "cinc", "c", col("tm"))
        .withColumn("n_risk", lit(tot) - (col("cinc") - col("c")))
        .where(col("d") > 0)
        .select(col("tm").cast("long").as("tm"), col("d"),
          col("n_risk").cast("long").as("n"))
      e.agg(sort_array(collect_list(struct(col("tm"), col("d"),
          col("n")))).as("steps"))
        .select(col("steps"),
          expr("aggregate(steps, array(1000000L)," +
            " (acc, x) -> concat(acc, array(" +
            "(element_at(acc, -1) * (x.n - x.d)) DIV x.n)))").as("sv"))
        .withColumn("kms", expr("slice(sv, 2, size(steps))"))
        .select(explode(arrays_zip(col("steps"), col("kms"))).as("z"))
        .select(col("z.steps.tm").as("t_days"),
          col("z.steps.d").as("n_events"),
          col("z.steps.n").as("n_risk"),
          col("z.kms").as("s_ppm"))
    })

  /** Off-policy evaluation of a deterministic targeting policy from
    * logged interaction data — the replay method (Li et al., WSDM'11)
    * next to an inverse-propensity-scored estimate: the policy picks
    * one event type per user (md5 % |arms| — the q202 deterministic
    * assignment), and its value is estimated from exactly the logged
    * events that MATCH the policy's choice. Replay = floor-micro mean
    * reward over matches; IPS reweights each matched reward by the
    * user's empirical logging propensity for that arm (cnt_user /
    * cnt_user_arm, exact integers — floor-micro per term, then a
    * floor mean), debiasing the logging skew. One per-(user, arm)
    * aggregate, one broadcast-joined arm index, two scalar
    * aggregates; everything integer, so the oracle replays exactly. */
  val q293 = QueryDef.sql("q293_ope_replay",
    """WITH arms AS (SELECT event_type,
      |    CAST(row_number() OVER (ORDER BY event_type) - 1 AS BIGINT)
      |      AS aidx,
      |    CAST(count(*) OVER () AS BIGINT) AS n_arms
      |  FROM (SELECT DISTINCT event_type FROM events)),
      |ua AS (SELECT user_id, event_type,
      |    CAST(count(*) AS BIGINT) AS cnt_ua,
      |    CAST(sum(CAST(CAST(value AS DECIMAL(18,6)) * 1000000
      |      AS BIGINT)) AS BIGINT) AS sv_ua
      |  FROM events GROUP BY 1, 2),
      |u AS (SELECT user_id, CAST(sum(cnt_ua) AS BIGINT) AS cnt_u
      |  FROM ua GROUP BY 1),
      |pol AS (SELECT u.user_id, u.cnt_u, a.event_type AS chosen
      |  FROM u JOIN arms a
      |    ON ('0x' || substring(md5(CAST(u.user_id AS VARCHAR)), 1, 15))
      |      ::BIGINT % a.n_arms = a.aidx),
      |m AS (SELECT p.user_id, p.cnt_u, ua.cnt_ua, ua.sv_ua
      |  FROM pol p JOIN ua
      |    ON p.user_id = ua.user_id AND ua.event_type = p.chosen),
      |tot AS (SELECT CAST(sum(cnt_ua) AS BIGINT) AS n_matched,
      |    CAST(sum(sv_ua) AS BIGINT) AS sv_matched,
      |    CAST(sum((sv_ua * cnt_u) // cnt_ua) AS BIGINT) AS sv_ips
      |  FROM m),
      |base AS (SELECT CAST(count(*) AS BIGINT) AS n_events,
      |    CAST(sum(CAST(CAST(value AS DECIMAL(18,6)) * 1000000
      |      AS BIGINT)) AS BIGINT) AS sv_all
      |  FROM events)
      |SELECT base.n_events, tot.n_matched,
      |  base.sv_all // base.n_events AS logging_mean_micro,
      |  tot.sv_matched // tot.n_matched AS replay_mean_micro,
      |  tot.sv_ips // base.n_events AS ips_mean_micro
      |FROM base, tot""")(
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val arms = ev.select("event_type").distinct()
        .select(col("event_type"),
          (row_number().over(Window.orderBy("event_type")) - 1)
            .cast("long").as("aidx"))
      val nArms = arms.count()
      val ua = ev.groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("cnt_ua"),
          sum((col("value").cast("decimal(18,6)") * 1000000)
            .cast("long")).as("sv_ua"))
      val u = ua.groupBy("user_id").agg(sum("cnt_ua").as("cnt_u"))
        .withColumn("aidx",
          conv(substring(md5(col("user_id").cast("string")), 1, 15),
            16, 10).cast("long") % nArms)
      val pol = u.join(broadcast(arms), "aidx")
        .select(col("user_id"), col("cnt_u"),
          col("event_type").as("chosen"))
      val m = pol.join(ua,
        pol("user_id") === ua("user_id") &&
          ua("event_type") === pol("chosen"))
      val tot = m.agg(sum("cnt_ua").as("n_matched"),
        sum("sv_ua").as("sv_matched"),
        sum(expr("(sv_ua * cnt_u) DIV cnt_ua")).as("sv_ips"))
      val base = ev.agg(count(lit(1)).as("n_events"),
        sum((col("value").cast("decimal(18,6)") * 1000000)
          .cast("long")).as("sv_all"))
      base.crossJoin(broadcast(tot))
        .select(col("n_events"), col("n_matched"),
          expr("sv_all DIV n_events").as("logging_mean_micro"),
          expr("sv_matched DIV n_matched").as("replay_mean_micro"),
          expr("sv_ips DIV n_events").as("ips_mean_micro"))
    })

  /** Markov-chain (removal-effect) multi-touch attribution — the
    * data-driven upgrade of q199's last-touch rule: user journeys
    * (touch sequence up to the FIRST purchase, else ending in the
    * null absorber) define a first-order chain; a channel's credit is
    * its REMOVAL EFFECT, how much the START->conversion probability
    * drops when every path through that channel is killed. The
    * absorption probabilities come from a 24-step truncated power
    * iteration in exact integer ppm — p'(s) = (sum_t cnt(s,t)*p(t) +
    * cnt(s,conv)*1e6) // tot(s) — run as an in-row fold over the
    * PACKED transition matrix (|channels|+1 square, a handful of
    * BIGINTs), one fold per removal scenario with the removed
    * channel's probability clamped to zero each step. Deterministic
    * and engine-exact (the q267/q292 fold stance), so the DuckDB
    * oracle replays bit-for-bit. Scale shape: the fact-scale work is
    * ONE per-user window chain producing transition pairs and one
    * tiny count aggregate; every chain solve runs on a <40-element
    * matrix, |channels|+1 scenarios of it. */
  val q296 = QueryDef.sql("q296_markov_attribution",
    """WITH j AS (SELECT user_id, event_type, ts, event_id,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS rn
      |  FROM events),
      |fp AS (SELECT user_id, min(rn) AS conv_rn FROM j
      |  WHERE event_type = 'purchase' GROUP BY 1),
      |e AS (SELECT j.user_id,
      |    CASE WHEN j.event_type = 'purchase' THEN 'conv'
      |         ELSE j.event_type END AS st, j.rn
      |  FROM j LEFT JOIN fp ON j.user_id = fp.user_id
      |  WHERE fp.conv_rn IS NULL OR j.rn <= fp.conv_rn),
      |p AS (SELECT user_id, st,
      |    lead(st) OVER (PARTITION BY user_id ORDER BY rn) AS nxt,
      |    row_number() OVER (PARTITION BY user_id ORDER BY rn) AS orn
      |  FROM e),
      |tr AS (
      |  SELECT st AS src, coalesce(nxt, 'null') AS dst FROM p
      |  WHERE st <> 'conv'
      |  UNION ALL
      |  SELECT 'START' AS src, st AS dst FROM p WHERE orn = 1),
      |cnt AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS c
      |  FROM tr GROUP BY 1, 2),
      |ch AS (SELECT st, CAST(row_number() OVER (ORDER BY st)
      |    AS BIGINT) AS idx
      |  FROM (SELECT DISTINCT src AS st FROM cnt WHERE src <> 'START')),
      |mm AS (SELECT CAST(count(*) + 1 AS BIGINT) AS m FROM ch),
      |sidx AS (SELECT st, idx FROM ch
      |  UNION ALL SELECT 'START', m FROM mm),
      |grid AS (SELECT a.idx AS i, b.idx AS j, coalesce(cnt.c, 0) AS c
      |  FROM sidx a CROSS JOIN sidx b
      |  LEFT JOIN cnt ON cnt.src = a.st AND cnt.dst = b.st),
      |rows_ AS (SELECT i, list(c ORDER BY j) AS trrow
      |  FROM grid GROUP BY 1),
      |convs AS (SELECT a.idx AS i, coalesce(cnt.c, 0) AS cv
      |  FROM sidx a LEFT JOIN cnt
      |    ON cnt.src = a.st AND cnt.dst = 'conv'),
      |tots AS (SELECT a.idx AS i, CAST(sum(cnt.c) AS BIGINT) AS tot
      |  FROM sidx a JOIN cnt ON cnt.src = a.st GROUP BY 1),
      |packed AS (SELECT
      |    (SELECT list(trrow ORDER BY i) FROM rows_) AS trmat,
      |    (SELECT list(cv ORDER BY i) FROM convs) AS convs,
      |    (SELECT list(tot ORDER BY i) FROM tots) AS tots,
      |    (SELECT m FROM mm) AS m),
      |scen AS (SELECT idx AS cidx, st AS channel FROM ch
      |  UNION ALL SELECT 0, '__full__'),
      |folded AS (SELECT s.cidx, s.channel,
      |    list_reduce(
      |      list_prepend(list_transform(range(1, pk.m + 1),
      |          i -> CAST(0 AS BIGINT)),
      |        list_transform(range(24), x -> CAST([0] AS BIGINT[]))),
      |      (p, x) -> list_transform(range(1, pk.m + 1), i ->
      |        CASE WHEN i = s.cidx THEN CAST(0 AS BIGINT) ELSE
      |          (CAST(list_sum(list_transform(range(1, pk.m + 1),
      |             j -> pk.trmat[i][j] * p[j])) AS BIGINT)
      |           + pk.convs[i] * 1000000) // pk.tots[i]
      |        END))[pk.m] AS p_start
      |  FROM scen s CROSS JOIN packed pk),
      |fl AS (SELECT p_start AS p_full FROM folded WHERE cidx = 0),
      |rem AS (SELECT f.channel, fl.p_full, f.p_start AS p_removed,
      |    fl.p_full - f.p_start AS removal
      |  FROM folded f, fl WHERE f.cidx <> 0),
      |tot_r AS (SELECT CAST(sum(removal) AS BIGINT) AS tr FROM rem)
      |SELECT rem.channel, rem.p_full AS p_full_ppm,
      |  rem.p_removed AS p_removed_ppm, rem.removal AS removal_ppm,
      |  CASE WHEN tot_r.tr <= 0 THEN 0
      |    ELSE (rem.removal * 1000000) // tot_r.tr END AS share_ppm
      |FROM rem, tot_r""")(
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val j = Tables.events(s, dir).select(col("user_id"),
        col("event_type"), row_number().over(w).as("rn"))
      val fp = j.where(col("event_type") === "purchase")
        .groupBy("user_id").agg(min("rn").as("conv_rn"))
      val e = j.join(fp, Seq("user_id"), "left")
        .where(col("conv_rn").isNull || col("rn") <= col("conv_rn"))
        .select(col("user_id"),
          when(col("event_type") === "purchase", "conv")
            .otherwise(col("event_type")).as("st"), col("rn"))
      val ow = Window.partitionBy("user_id").orderBy("rn")
      val p = e.select(col("user_id"), col("st"),
        lead("st", 1).over(ow).as("nxt"),
        row_number().over(ow).as("orn"))
      val tr = p.where(col("st") =!= "conv")
        .select(col("st").as("src"),
          coalesce(col("nxt"), lit("null")).as("dst"))
        .unionByName(p.where(col("orn") === 1)
          .select(lit("START").as("src"), col("st").as("dst")))
      val cnt = tr.groupBy("src", "dst").agg(count(lit(1)).as("c"))
        .localCheckpoint(true) // feeds five tiny frames below
      val ch = cnt.where(col("src") =!= "START")
        .select(col("src").as("st")).distinct()
        .withColumn("idx",
          row_number().over(Window.orderBy("st")).cast("long"))
      val mRow = ch.agg((count(lit(1)) + 1).cast("long").as("m"))
      val sidx = ch.unionByName(
        mRow.select(lit("START").as("st"), col("m").as("idx")))
      val grid = sidx.toDF("sa", "i").crossJoin(sidx.toDF("sb", "j"))
        .join(cnt, col("src") === col("sa") && col("dst") === col("sb"),
          "left")
        .select(col("i"), col("j"), coalesce(col("c"), lit(0L)).as("c"))
      val rows_ = grid.groupBy("i")
        .agg(transform(sort_array(collect_list(struct(col("j"),
          col("c")))), x => x.getField("c")).as("trrow"))
      val trmat = rows_.agg(transform(sort_array(collect_list(
        struct(col("i"), col("trrow")))), x => x.getField("trrow"))
        .as("trmat"))
      val convs = sidx.toDF("sa", "i")
        .join(cnt.where(col("dst") === "conv"),
          col("src") === col("sa"), "left")
        .select(col("i"), coalesce(col("c"), lit(0L)).as("cv"))
        .agg(transform(sort_array(collect_list(struct(col("i"),
          col("cv")))), x => x.getField("cv")).as("convs"))
      val tots = sidx.toDF("sa", "i")
        .join(cnt, col("src") === col("sa"))
        .groupBy("i").agg(sum("c").as("tot"))
        .agg(transform(sort_array(collect_list(struct(col("i"),
          col("tot")))), x => x.getField("tot")).as("tots"))
      val packed = trmat.crossJoin(convs).crossJoin(tots)
        .crossJoin(mRow)
      val scen = ch.select(col("idx").as("cidx"),
          col("st").as("channel"))
        .unionByName(s.range(1).select(lit(0L).as("cidx"),
          lit("__full__").as("channel")))
      val fold =
        """element_at(aggregate(sequence(1, 24),
          |  transform(sequence(1, CAST(m AS INT)), i -> 0L),
          |  (p, x) -> transform(sequence(1, CAST(m AS INT)), i ->
          |    CASE WHEN i = CAST(cidx AS INT) THEN 0L ELSE
          |      (aggregate(sequence(1, CAST(m AS INT)), 0L,
          |        (acc, j) -> acc +
          |          element_at(element_at(trmat, i), j) *
          |          element_at(p, j))
          |       + element_at(convs, i) * 1000000L)
          |      DIV element_at(tots, i)
          |    END)), CAST(m AS INT))""".stripMargin
      val folded = scen.crossJoin(broadcast(packed))
        .withColumn("p_start", expr(fold))
        .select("cidx", "channel", "p_start")
      val full = folded.where(col("cidx") === 0)
        .select(col("p_start").as("p_full"))
      val rem = folded.where(col("cidx") =!= 0)
        .crossJoin(broadcast(full))
        .select(col("channel"), col("p_full"),
          col("p_start").as("p_removed"),
          (col("p_full") - col("p_start")).as("removal"))
      val totR = rem.agg(sum("removal").as("tr"))
      rem.crossJoin(broadcast(totR))
        .select(col("channel"), col("p_full").as("p_full_ppm"),
          col("p_removed").as("p_removed_ppm"),
          col("removal").as("removal_ppm"),
          when(col("tr") <= 0, 0L)
            .otherwise(expr("(removal * 1000000) DIV tr"))
            .as("share_ppm"))
    })

  /** Randomization test for q288's DiD estimate — is the observed
    * difference-in-differences distinguishable from cohort-label
    * noise? 64 deterministic re-randomizations of the treated flag
    * (md5(user|b) parity, the q196/q202 replicate recipe) each
    * produce a placebo DiD from the same 2x2 floor-mean machinery;
    * the p-value is the fraction of placebo |DiD| >= |observed DiD|,
    * shipped in floor-ppm along with the placebo extremes. All
    * integer, so the whole test replays in DuckDB. Shape: ONE
    * 64-way explode of the fact table (6.4M rows at sf0.1) into a
    * 64 x 4-cell aggregate — the permutation loop is data
    * parallelism, not a driver loop. Note: re-randomization, not an
    * exact size-preserving permutation — the standard approximation,
    * documented. */
  val q304 = QueryDef.sql("q304_did_permutation",
    """WITH m AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2
      |    AS mid FROM events),
      |s AS (SELECT user_id FROM events e, m
      |  WHERE e.event_type = 'error' AND epoch_us(e.ts) < m.mid
      |  GROUP BY user_id HAVING count(*) >= 7),
      |b AS (SELECT e.user_id,
      |    CASE WHEN s.user_id IS NULL THEN 0 ELSE 1 END AS treated,
      |    CASE WHEN epoch_us(e.ts) < m.mid THEN 0 ELSE 1 END AS post,
      |    CAST(CAST(e.value AS DECIMAL(18,6)) * 1000000 AS BIGINT)
      |      AS vm
      |  FROM events e LEFT JOIN s ON e.user_id = s.user_id, m
      |  WHERE e.event_type <> 'error'),
      |obs AS (SELECT
      |    (coalesce(max(CASE WHEN treated = 1 AND post = 1 THEN mm END), 0)
      |     - coalesce(max(CASE WHEN treated = 1 AND post = 0 THEN mm END), 0))
      |    - (coalesce(max(CASE WHEN treated = 0 AND post = 1 THEN mm END), 0)
      |     - coalesce(max(CASE WHEN treated = 0 AND post = 0 THEN mm END), 0))
      |      AS did
      |  FROM (SELECT treated, post,
      |      CAST(sum(vm) AS BIGINT) // CAST(count(*) AS BIGINT) AS mm
      |    FROM b GROUP BY 1, 2)),
      |r AS (SELECT g.pb,
      |    CASE WHEN ('0x' || substring(md5(CAST(b.user_id AS VARCHAR)
      |        || '|' || CAST(g.pb AS VARCHAR)), 1, 15))::BIGINT % 2 = 0
      |      THEN 1 ELSE 0 END AS rt,
      |    b.post, b.vm
      |  FROM b CROSS JOIN generate_series(1, 64) g(pb)),
      |dids AS (SELECT pb,
      |    (coalesce(max(CASE WHEN rt = 1 AND post = 1 THEN mm END), 0)
      |     - coalesce(max(CASE WHEN rt = 1 AND post = 0 THEN mm END), 0))
      |    - (coalesce(max(CASE WHEN rt = 0 AND post = 1 THEN mm END), 0)
      |     - coalesce(max(CASE WHEN rt = 0 AND post = 0 THEN mm END), 0))
      |      AS did_b
      |  FROM (SELECT pb, rt, post,
      |      CAST(sum(vm) AS BIGINT) // CAST(count(*) AS BIGINT) AS mm
      |    FROM r GROUP BY 1, 2, 3) GROUP BY pb)
      |SELECT obs.did AS did_obs_micro,
      |  CAST(count(*) AS BIGINT) AS n_perms,
      |  CAST(sum(CASE WHEN abs(did_b) >= abs(obs.did) THEN 1 ELSE 0
      |    END) AS BIGINT) AS n_extreme,
      |  (CAST(sum(CASE WHEN abs(did_b) >= abs(obs.did) THEN 1 ELSE 0
      |    END) AS BIGINT) * 1000000) // CAST(count(*) AS BIGINT)
      |    AS p_ppm,
      |  CAST(max(abs(did_b)) AS BIGINT) AS max_placebo_micro
      |FROM dids, obs GROUP BY obs.did""")(
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val mid = ev.agg(
        expr("(min(unix_micros(ts)) + max(unix_micros(ts))) DIV 2")
          .as("mid"))
      val treated = ev.where(col("event_type") === "error")
        .crossJoin(broadcast(mid))
        .where(unix_micros(col("ts")) < col("mid"))
        .groupBy("user_id").agg(count(lit(1)).as("c"))
        .where(col("c") >= 7)
        .select(col("user_id"), lit(1L).as("tflag"))
      val b = ev.where(col("event_type") =!= "error")
        .join(broadcast(treated), Seq("user_id"), "left")
        .crossJoin(broadcast(mid))
        .select(col("user_id"),
          coalesce(col("tflag"), lit(0L)).as("treated"),
          when(unix_micros(col("ts")) < col("mid"), 0L).otherwise(1L)
            .as("post"),
          (col("value").cast("decimal(18,6)") * 1000000).cast("long")
            .as("vm"))
        // full width BEFORE the checkpoint: the 64-way explode below
        // does one md5 per (row, replicate) at b's partitioning, and b
        // otherwise inherits the events scan's couple of splits
        // (measured r12: 5.4 s cpu≈wall on ~1 of 32 cores). The
        // checkpoint stores the widened layout, so every consumer —
        // the observed cells and the permutation explode — runs wide.
        .repartition(s.sparkContext.defaultParallelism)
        .localCheckpoint(true) // observed cells AND the 64-way explode
      def didOf(df: org.apache.spark.sql.DataFrame, flag: String,
                extra: Seq[String]): org.apache.spark.sql.DataFrame = {
        val cells = df.groupBy((extra :+ flag :+ "post").map(col): _*)
          .agg(expr("CAST(sum(vm) AS BIGINT) DIV count(*)").as("mm"))
        def cell(t: Int, p: Int) = coalesce(
          max(when(col(flag) === t && col("post") === p, col("mm"))),
          lit(0L))
        val g = if (extra.isEmpty) cells.groupBy(lit(1).as("__g"))
          else cells.groupBy(extra.map(col): _*)
        g.agg(((cell(1, 1) - cell(1, 0)) - (cell(0, 1) - cell(0, 0)))
          .as("did"))
      }
      val obs = didOf(b, "treated", Nil).select(col("did"))
      val perms = b.crossJoin(broadcast(
          s.range(1, 65).select(col("id").as("pb"))))
        .withColumn("rt",
          when(conv(substring(md5(concat(col("user_id").cast("string"),
            lit("|"), col("pb").cast("string"))), 1, 15), 16, 10)
            .cast("long") % 2 === 0, 1L).otherwise(0L))
      val dids = didOf(perms, "rt", Seq("pb"))
        .select(col("did").as("did_b"))
      dids.crossJoin(broadcast(obs))
        .agg(max(col("did")).as("did_obs_micro"),
          count(lit(1)).as("n_perms"),
          sum(when(abs(col("did_b")) >= abs(col("did")), 1L)
            .otherwise(0L)).as("n_extreme"),
          max(abs(col("did_b"))).as("max_placebo_micro"))
        .select(col("did_obs_micro"), col("n_perms"), col("n_extreme"),
          expr("(n_extreme * 1000000) DIV n_perms").as("p_ppm"),
          col("max_placebo_micro"))
    })

  /** Wilson-score lower-bound conversion ranking — "which engagement
    * type most reliably precedes purchase", ranked by the 95% Wilson
    * lower bound instead of the raw rate, so small-n types can't
    * outrank well-measured ones (the Reddit-sort / bandit-UCB dual).
    * Exact integer (trials, successes) per type — users who did the
    * type, of whom those who ALSO purchased — then the closed-form
    * bound in doubles: one division chain + ONE sqrt, and IEEE
    * requires sqrt and the arithmetic ops to be correctly rounded,
    * so the identical expression tree produces identical bits in
    * both engines (the q105/q157 stance); rounded to 6 anyway.
    * Shape: one per-(user, type) distinct aggregate + a broadcast
    * purchase-user flag; the bound math runs on |types| rows. */
  val q307 = QueryDef.sql("q307_wilson_ranking",
    """WITH p AS (SELECT DISTINCT user_id FROM events
      |  WHERE event_type = 'purchase'),
      |ut AS (SELECT DISTINCT user_id, event_type FROM events
      |  WHERE event_type <> 'purchase'),
      |g AS (SELECT ut.event_type,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END)
      |      AS BIGINT) AS x
      |  FROM ut LEFT JOIN p ON ut.user_id = p.user_id
      |  GROUP BY 1),
      |w AS (SELECT event_type, n, x,
      |    round(((CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
      |      + 1.96 * 1.96 / (2.0 * CAST(n AS DOUBLE))
      |      - 1.96 * sqrt((CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
      |          * (1.0 - CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
      |          / CAST(n AS DOUBLE)
      |        + 1.96 * 1.96
      |          / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
      |      / (1.0 + 1.96 * 1.96 / CAST(n AS DOUBLE)), 6)
      |      AS wilson_lb
      |  FROM g)
      |SELECT event_type, n, x, wilson_lb,
      |  CAST(row_number() OVER (ORDER BY wilson_lb DESC, event_type)
      |    AS BIGINT) AS rk
      |FROM w""")(
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val p = ev.where(col("event_type") === "purchase")
        .select("user_id").distinct().withColumn("pf", lit(1L))
      val ut = ev.where(col("event_type") =!= "purchase")
        .select("user_id", "event_type").distinct()
      val g = ut.join(broadcast(p), Seq("user_id"), "left")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("pf").isNull, 0L).otherwise(1L)).as("x"))
      val nd = col("n").cast("double"); val xd = col("x").cast("double")
      val phat = xd / nd
      val z2 = lit(1.96) * lit(1.96)
      val w = g.select(col("event_type"), col("n"), col("x"),
        round((phat + z2 / (lit(2.0) * nd) -
          lit(1.96) * sqrt(phat * (lit(1.0) - phat) / nd +
            z2 / (lit(4.0) * nd * nd))) /
          (lit(1.0) + z2 / nd), 6).as("wilson_lb"))
      w.withColumn("rk", row_number().over(
        Window.orderBy(col("wilson_lb").desc, col("event_type")))
        .cast("long"))
    })

  /** Stratified ATE — the confounder-adjusted counterpart to q288's
    * DiD: users are stratified into quintiles of a pre-period
    * activity score (click count before the midpoint — the proxy for
    * "heavy users error more AND spend more"), and the treated-vs-
    * control post-period outcome difference is taken WITHIN each
    * stratum, then pooled with stratum-size weights (the classic
    * quintile-stratification estimator; Cochran: five strata remove
    * ~90% of confounder bias). All exact integers: stratum bounds by
    * the two-pass global rank, per-cell floor-micro means, pooled
    * ATE = floor(sum(n_s * diff_s) / n). Ships per-stratum rows plus
    * the pooled row (stratum = -1). Shape: per-user aggregate ->
    * global rank -> 5x2 cells; nothing fact-scale after the first
    * aggregate. */
  val q309 = QueryDef.sql("q309_stratified_ate",
    """WITH m AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2
      |    AS mid FROM events),
      |t AS (SELECT user_id FROM events e, m
      |  WHERE e.event_type = 'error' AND epoch_us(e.ts) < m.mid
      |  GROUP BY user_id HAVING count(*) >= 7),
      |u AS (SELECT e.user_id,
      |    CAST(sum(CASE WHEN e.event_type = 'click'
      |      AND epoch_us(e.ts) < m.mid THEN 1 ELSE 0 END) AS BIGINT)
      |      AS pre_clicks,
      |    CAST(sum(CASE WHEN e.event_type NOT IN ('error')
      |      AND epoch_us(e.ts) >= m.mid
      |      THEN CAST(CAST(e.value AS DECIMAL(18,6)) * 1000000
      |        AS BIGINT) ELSE 0 END) AS BIGINT) AS post_sv,
      |    CAST(sum(CASE WHEN e.event_type NOT IN ('error')
      |      AND epoch_us(e.ts) >= m.mid THEN 1 ELSE 0 END) AS BIGINT)
      |      AS post_n
      |  FROM events e, m GROUP BY 1),
      |f AS (SELECT u.user_id, u.pre_clicks, u.post_sv, u.post_n,
      |    CASE WHEN t.user_id IS NULL THEN 0 ELSE 1 END AS treated,
      |    row_number() OVER (ORDER BY u.pre_clicks, u.user_id) AS rn
      |  FROM u LEFT JOIN t ON u.user_id = t.user_id
      |  WHERE u.post_n > 0),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS tot FROM f),
      |s AS (SELECT f.*, ((rn - 1) * 5) // n.tot + 1 AS stratum
      |  FROM f, n),
      |c AS (SELECT stratum, treated,
      |    CAST(count(*) AS BIGINT) AS n_users,
      |    CAST(sum(post_sv) AS BIGINT) // CAST(sum(post_n) AS BIGINT)
      |      AS mean_micro
      |  FROM s GROUP BY 1, 2),
      |d AS (SELECT stratum,
      |    CAST(sum(n_users) AS BIGINT) AS n_s,
      |    coalesce(max(CASE WHEN treated = 1 THEN n_users END), 0)
      |      AS n_t,
      |    coalesce(max(CASE WHEN treated = 1 THEN mean_micro END), 0)
      |    - coalesce(max(CASE WHEN treated = 0 THEN mean_micro END), 0)
      |      AS diff_micro
      |  FROM c GROUP BY 1)
      |SELECT CAST(stratum AS BIGINT) AS stratum, n_s, n_t, diff_micro
      |FROM d
      |UNION ALL
      |SELECT -1, CAST(sum(n_s) AS BIGINT), CAST(sum(n_t) AS BIGINT),
      |  (CASE WHEN CAST(sum(n_s * diff_micro) AS BIGINT) >= 0
      |    THEN CAST(sum(n_s * diff_micro) AS BIGINT)
      |      // CAST(sum(n_s) AS BIGINT)
      |    ELSE -((-CAST(sum(n_s * diff_micro) AS BIGINT)
      |      + CAST(sum(n_s) AS BIGINT) - 1)
      |      // CAST(sum(n_s) AS BIGINT)) END)
      |FROM d""")(
    (s, dir) => {
      import graft.operators.Rank
      val ev = Tables.events(s, dir)
      val mid = ev.agg(
        expr("(min(unix_micros(ts)) + max(unix_micros(ts))) DIV 2")
          .as("mid"))
      val tagged = ev.crossJoin(broadcast(mid))
      val treated = tagged.where(col("event_type") === "error" &&
          unix_micros(col("ts")) < col("mid"))
        .groupBy("user_id").agg(count(lit(1)).as("c"))
        .where(col("c") >= 7)
        .select(col("user_id"), lit(1L).as("tflag"))
      val u = tagged.groupBy("user_id").agg(
        sum(when(col("event_type") === "click" &&
          unix_micros(col("ts")) < col("mid"), 1L).otherwise(0L))
          .as("pre_clicks"),
        sum(when(col("event_type") =!= "error" &&
          unix_micros(col("ts")) >= col("mid"),
          (col("value").cast("decimal(18,6)") * 1000000).cast("long"))
          .otherwise(0L)).as("post_sv"),
        sum(when(col("event_type") =!= "error" &&
          unix_micros(col("ts")) >= col("mid"), 1L).otherwise(0L))
          .as("post_n"))
      val f = u.join(broadcast(treated), Seq("user_id"), "left")
        .where(col("post_n") > 0)
        .select(col("user_id"), col("pre_clicks"), col("post_sv"),
          col("post_n"),
          coalesce(col("tflag"), lit(0L)).as("treated"))
      val ranked = Rank.globalRank(f, "rn", col("pre_clicks"),
        col("user_id"))
      val tot = ranked.count()
      val strat = ranked
        .withColumn("stratum", expr(s"((rn - 1) * 5) DIV ${tot}L + 1"))
      val c = strat.groupBy("stratum", "treated")
        .agg(count(lit(1)).as("n_users"),
          expr("CAST(sum(post_sv) AS BIGINT)" +
            " DIV CAST(sum(post_n) AS BIGINT)").as("mean_micro"))
      val d = c.groupBy("stratum").agg(
        sum("n_users").as("n_s"),
        coalesce(max(when(col("treated") === 1, col("n_users"))),
          lit(0L)).as("n_t"),
        (coalesce(max(when(col("treated") === 1, col("mean_micro"))),
          lit(0L)) -
          coalesce(max(when(col("treated") === 0, col("mean_micro"))),
            lit(0L))).as("diff_micro"))
      val pooled = d.agg(sum("n_s").as("sn"), sum("n_t").as("st"),
          sum(col("n_s") * col("diff_micro")).as("num"))
        .select(lit(-1L).as("stratum"), col("sn").as("n_s"),
          col("st").as("n_t"),
          expr("CASE WHEN num >= 0 THEN num DIV sn" +
            " ELSE -((-num + sn - 1) DIV sn) END").as("diff_micro"))
      d.select(col("stratum").cast("long"), col("n_s"), col("n_t"),
          col("diff_micro"))
        .unionByName(pooled)
    })

  /** Deterministic weighted sampling WITH replacement — the mixture
    * DRAW primitive (q101/q90 allocate budgets; this one actually
    * draws): each brand's revenue is its weight, the cumulative
    * ranges partition [0, W), and 256 md5-derived pseudo-uniform
    * points land in ranges via a range join — every draw exact
    * integer arithmetic, replayable cross-engine, no RNG state. The
    * output is the per-brand draw count next to its floor-expected
    * count (256 * w / W): the audit that a weighted sampler is
    * actually proportional. Scale shape: one fact aggregate, one
    * ~|brands|-row prefix window, one broadcast range join of 256
    * points — at a billion keys the ranges come from the two-pass
    * prefix sum and the points bucket by range id. */
  val q316 = QueryDef.sql("q316_weighted_draws",
    """WITH w AS (SELECT p.p_brand,
      |    CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS wt
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  GROUP BY 1),
      |c AS (SELECT p_brand, wt,
      |    CAST(coalesce(sum(wt) OVER (ORDER BY p_brand
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS lo,
      |    CAST(sum(wt) OVER (ORDER BY p_brand
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS hi
      |  FROM w),
      |tot AS (SELECT CAST(sum(wt) AS BIGINT) AS tw FROM w),
      |d AS (SELECT g.i,
      |    ('0x' || substring(md5('draw|' || CAST(g.i AS VARCHAR)),
      |      1, 15))::BIGINT % tot.tw AS u
      |  FROM generate_series(1, 256) g(i), tot),
      |hits AS (SELECT c.p_brand, CAST(count(*) AS BIGINT) AS draws
      |  FROM d JOIN c ON d.u >= c.lo AND d.u < c.hi
      |  GROUP BY 1)
      |SELECT c.p_brand, c.wt,
      |  coalesce(hits.draws, 0) AS draws,
      |  (c.wt * 256) // tot.tw AS expected_floor
      |FROM c LEFT JOIN hits ON c.p_brand = hits.p_brand, tot""")(
    (s, dir) => {
      val w = Tables.lineitem(s, dir)
        .join(Tables.part(s, dir),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(sum((col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("long")).as("wt"))
      val o = Window.orderBy("p_brand")
      val c = w.select(col("p_brand"), col("wt"),
        coalesce(sum("wt").over(
          o.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
          .as("lo"),
        sum("wt").over(
          o.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("hi"))
      val tot = w.agg(sum("wt").as("tw"))
      val d = s.range(1, 257).select(col("id").as("i"))
        .crossJoin(broadcast(tot))
        .select(col("i"),
          (conv(substring(md5(concat(lit("draw|"),
            col("i").cast("string"))), 1, 15), 16, 10).cast("long")
            % col("tw")).as("u"))
      val hits = broadcast(d).join(c,
          col("u") >= col("lo") && col("u") < col("hi"))
        .groupBy("p_brand").agg(count(lit(1)).as("draws"))
      c.join(hits, Seq("p_brand"), "left")
        .crossJoin(broadcast(tot))
        .select(col("p_brand"), col("wt"),
          coalesce(col("draws"), lit(0L)).as("draws"),
          expr("(wt * 256) DIV tw").as("expected_floor"))
    })

  /** Instrumental-variable Wald estimator over an encouragement
    * design: the instrument z is the md5 parity of the user id (the
    * q202 deterministic-assignment recipe), "encouragement" adds 6 to
    * the user's error count against a data-derived cutoff (mean + 3 —
    * SF-stable, so the first stage is strong at every scale), outcome
    * is the exact micro mean of non-error values. Wald = reduced form
    * / first stage, both as integer ratios; a degenerate first stage
    * reports 0 instead of dividing by it. Two aggregates and a
    * broadcast cutoff — nothing scales with more than the user
    * count. */
  val q332 = QueryDef.sql("q332_iv_wald",
    """WITH u AS (SELECT user_id,
      |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS errs,
      |    ('0x' || substring(md5('z|' || CAST(user_id AS VARCHAR)), 1, 15))
      |      ::BIGINT % 2 AS z
      |  FROM events GROUP BY user_id),
      |c AS (SELECT CAST(sum(errs) AS BIGINT) // count(*) + 3 AS cutoff
      |      FROM u),
      |t AS (SELECT user_id, z,
      |    CASE WHEN errs + 6 * z >= c.cutoff THEN 1 ELSE 0 END AS treated
      |  FROM u, c),
      |y AS (SELECT e.user_id,
      |    CAST(sum(CAST(CAST(e.value AS DECIMAL(18,6)) * 1000000
      |      AS BIGINT)) AS BIGINT) AS sv, count(*) AS n
      |  FROM events e WHERE e.event_type <> 'error' GROUP BY 1),
      |g AS (SELECT t.z, CAST(count(*) AS BIGINT) AS n_users,
      |    CAST(sum(t.treated) AS BIGINT) AS n_treated,
      |    CAST(sum(y.sv) AS BIGINT) AS sv, CAST(sum(y.n) AS BIGINT) AS ne
      |  FROM t JOIN y USING (user_id) GROUP BY 1),
      |w AS (SELECT
      |    CAST(max(CASE WHEN z = 0 THEN n_treated * 1000000 // n_users END)
      |      AS BIGINT) AS p0_ppm,
      |    CAST(max(CASE WHEN z = 1 THEN n_treated * 1000000 // n_users END)
      |      AS BIGINT) AS p1_ppm,
      |    CAST(max(CASE WHEN z = 0 THEN sv // ne END) AS BIGINT)
      |      AS y0_micro,
      |    CAST(max(CASE WHEN z = 1 THEN sv // ne END) AS BIGINT)
      |      AS y1_micro
      |  FROM g)
      |SELECT p0_ppm, p1_ppm, y0_micro, y1_micro,
      |  CASE WHEN p1_ppm = p0_ppm THEN 0 ELSE
      |    CAST((y1_micro - y0_micro) * 1000000 // (p1_ppm - p0_ppm)
      |      AS BIGINT)
      |  END AS wald_micro
      |FROM w""")(
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val u = ev.groupBy("user_id")
        .agg(sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .as("errs"))
        .withColumn("z",
          conv(substring(md5(concat(lit("z|"),
            col("user_id").cast("string"))), 1, 15), 16, 10)
            .cast("long") % 2)
      val cut = u.agg((expr("sum(errs) DIV count(*)") + 3L).as("cutoff"))
      val t = u.crossJoin(broadcast(cut))
        .select(col("user_id"), col("z"),
          when(col("errs") + lit(6L) * col("z") >= col("cutoff"), 1L)
            .otherwise(0L).as("treated"))
      val y = ev.where(col("event_type") =!= "error")
        .groupBy("user_id")
        .agg(sum((col("value").cast("decimal(18,6)") * 1000000)
          .cast("long")).cast("long").as("sv"), count(lit(1)).as("n"))
      val g = t.join(y, Seq("user_id"))
        .groupBy("z")
        .agg(count(lit(1)).as("n_users"),
          sum(col("treated")).cast("long").as("n_treated"),
          sum(col("sv")).cast("long").as("sv"),
          sum(col("n")).cast("long").as("ne"))
      def pick(zv: Int, e: org.apache.spark.sql.Column) =
        max(when(col("z") === zv, e))
      g.agg(
          pick(0, expr("n_treated * 1000000 DIV n_users")).as("p0_ppm"),
          pick(1, expr("n_treated * 1000000 DIV n_users")).as("p1_ppm"),
          pick(0, expr("sv DIV ne")).as("y0_micro"),
          pick(1, expr("sv DIV ne")).as("y1_micro"))
        .withColumn("wald_micro",
          when(col("p1_ppm") === col("p0_ppm"), 0L)
            .otherwise(expr(
              "(y1_micro - y0_micro) * 1000000 DIV (p1_ppm - p0_ppm)")))
    })

  /** Sharp regression-discontinuity estimate: running variable =
    * event_id % 1000 (spans the full support at every SF), cutoff 500,
    * local means of the non-error value either side at three
    * bandwidths — the bandwidth-sensitivity row is the standard RD
    * robustness table. Exact integer micro means; empty sides report
    * 0 rather than dividing by zero. One pass, map-side combine to
    * 3 bandwidth groups. */
  val q333 = QueryDef.sql("q333_rd_estimate",
    """WITH u AS (SELECT event_id % 1000 AS r,
      |    CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS vm
      |  FROM events WHERE event_type <> 'error'),
      |b AS (SELECT CAST(unnest([50, 100, 200]) AS BIGINT) AS bw),
      |g AS (SELECT bw,
      |  CAST(sum(CASE WHEN r >= 500 - bw AND r < 500 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_left,
      |  CAST(sum(CASE WHEN r >= 500 AND r < 500 + bw THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_right,
      |  CAST(sum(CASE WHEN r >= 500 - bw AND r < 500 THEN vm ELSE 0 END)
      |    AS BIGINT) AS sl,
      |  CAST(sum(CASE WHEN r >= 500 AND r < 500 + bw THEN vm ELSE 0 END)
      |    AS BIGINT) AS sr
      |  FROM u, b GROUP BY bw)
      |SELECT bw, n_left, n_right,
      |  CASE WHEN n_left = 0 THEN 0 ELSE CAST(sl // n_left AS BIGINT) END
      |    AS mean_left_micro,
      |  CASE WHEN n_right = 0 THEN 0 ELSE CAST(sr // n_right AS BIGINT) END
      |    AS mean_right_micro,
      |  CASE WHEN n_left = 0 OR n_right = 0 THEN 0
      |    ELSE CAST(sr // n_right - sl // n_left AS BIGINT) END AS rd_micro
      |FROM g""")(
    (s, dir) => {
      val u = Tables.events(s, dir).where(col("event_type") =!= "error")
        .select(pmod(col("event_id"), lit(1000L)).as("r"),
          (col("value").cast("decimal(18,6)") * 1000000).cast("long")
            .as("vm"))
      val bw = s.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(50L),
          org.apache.spark.sql.Row(100L), org.apache.spark.sql.Row(200L)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("bw",
            org.apache.spark.sql.types.LongType, nullable = false))))
      val left = col("r") >= lit(500L) - col("bw") && col("r") < 500L
      val right = col("r") >= 500L && col("r") < lit(500L) + col("bw")
      u.crossJoin(broadcast(bw))
        .groupBy("bw")
        .agg(sum(when(left, 1L).otherwise(0L)).cast("long").as("n_left"),
          sum(when(right, 1L).otherwise(0L)).cast("long").as("n_right"),
          sum(when(left, col("vm")).otherwise(0L)).cast("long").as("sl"),
          sum(when(right, col("vm")).otherwise(0L)).cast("long").as("sr"))
        .select(col("bw"), col("n_left"), col("n_right"),
          when(col("n_left") === 0, 0L)
            .otherwise(expr("sl DIV n_left")).as("mean_left_micro"),
          when(col("n_right") === 0, 0L)
            .otherwise(expr("sr DIV n_right")).as("mean_right_micro"),
          when(col("n_left") === 0 || col("n_right") === 0, 0L)
            .otherwise(expr("sr DIV n_right - sl DIV n_left"))
            .as("rd_micro"))
    })

  def all: Seq[QueryDef] = Seq(q288, q289, q292, q293, q296, q304, q307,
    q309, q316, q332, q333)
}
