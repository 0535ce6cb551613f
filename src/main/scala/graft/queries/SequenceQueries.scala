package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-stream (sequence) primitives: sequential hypothesis testing
  * and run-structure statistics over per-key event streams. Everything
  * here is exact integer arithmetic on a deterministic (ts, event_id)
  * order, so the DuckDB oracles replay bit-for-bit. */
object SequenceQueries {

  /** Sequential probability ratio test (Wald SPRT), fully integer.
    *
    * Design: test p0 = 1/3 vs p1 = 2/3 on the Bernoulli stream
    * success := value > 34.0 (the corpus median sits near 34.4, so the
    * walk is a near-symmetric excursion). For this symmetric pair the
    * log-likelihood ratio after n trials with k successes is exactly
    * (2k - n) * log 2, so the Wald thresholds log B / log A reduce to
    * INTEGER bounds on the walk w = 2k - n: accept H1 when w >= +17,
    * accept H0 when w <= -17 (B = 2^17). No libm anywhere — the
    * crossing decision is a comparison of exact integers, which is why
    * this replays cross-engine (SCALING.md: libm is never a selector).
    *
    * Per event_type: trial count, first crossing index, walk value at
    * the crossing, the decision, and the final walk. Scale shape: one
    * partitioned window (cumulative sum) + one aggregate — the stream
    * per key is processed in event-time order exactly as the streaming
    * twin would consume it. */
  val q256 = QueryDef.sql("q256_sprt_decision",
    """WITH t AS (SELECT event_type, ts, event_id,
      |    CASE WHEN value > 34.0 THEN 1 ELSE -1 END AS step
      |  FROM events),
      |w AS (SELECT event_type,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY ts, event_id) AS rk,
      |    CAST(sum(step) OVER (PARTITION BY event_type
      |      ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS wlk
      |  FROM t),
      |c AS (SELECT event_type, min(rk) AS cross_rk
      |  FROM w WHERE wlk >= 17 OR wlk <= -17 GROUP BY 1),
      |f AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(step) AS BIGINT) AS final_w
      |  FROM t GROUP BY 1)
      |SELECT f.event_type, f.n,
      |  coalesce(c.cross_rk, CAST(-1 AS BIGINT)) AS cross_rk,
      |  coalesce(x.wlk, CAST(0 AS BIGINT)) AS w_at_cross,
      |  CASE WHEN x.wlk >= 17 THEN 'accept_h1'
      |       WHEN x.wlk <= -17 THEN 'accept_h0'
      |       ELSE 'continue' END AS decision,
      |  f.final_w
      |FROM f LEFT JOIN c ON f.event_type = c.event_type
      |LEFT JOIN w x ON x.event_type = c.event_type
      |  AND x.rk = c.cross_rk""")(
    (s, dir) => {
      val t = Tables.events(s, dir).select(col("event_type"), col("ts"),
        col("event_id"),
        when(col("value") > 34.0, 1L).otherwise(-1L).as("step"))
      val ord = Window.partitionBy("event_type").orderBy("ts", "event_id")
      val w = t.select(col("event_type"),
        row_number().over(ord).cast("long").as("rk"),
        sum(col("step")).over(
          ord.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("wlk"))
      val c = w.where(col("wlk") >= 17 || col("wlk") <= -17)
        .groupBy("event_type").agg(min(col("rk")).as("cross_rk"))
        .withColumnRenamed("event_type", "cet")
      val f = t.groupBy("event_type").agg(count(lit(1)).as("n"),
        sum(col("step")).as("final_w"))
      val x = w.join(broadcast(c), w("event_type") === col("cet")
          && w("rk") === col("cross_rk"))
        .select(col("cet").as("xet"), col("wlk").as("xw"))
      f.join(broadcast(c), f("event_type") === col("cet"), "left")
        .join(broadcast(x), f("event_type") === col("xet"), "left")
        .select(col("event_type"), col("n"),
          coalesce(col("cross_rk"), lit(-1L)).as("cross_rk"),
          coalesce(col("xw"), lit(0L)).as("w_at_cross"),
          when(col("xw") >= 17, "accept_h1")
            .when(col("xw") <= -17, "accept_h0")
            .otherwise("continue").as("decision"),
          col("final_w"))
    })

  /** Run structure per user stream: longest strictly-increasing run
    * (counted in steps) of the event `value` sequence and the number of
    * direction changes, on the deterministic (ts, event_id) order.
    * Gaps-and-islands with exact micro-integer comparisons; one
    * partitioned window chain, no global sort. */
  val q258 = QueryDef.sql("q258_monotone_runs",
    """WITH v AS (SELECT user_id, ts, event_id,
      |    CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS vm
      |  FROM events),
      |d AS (SELECT user_id,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS rk,
      |    CASE WHEN vm > lag(vm) OVER (PARTITION BY user_id
      |        ORDER BY ts, event_id) THEN 1
      |      WHEN vm < lag(vm) OVER (PARTITION BY user_id
      |        ORDER BY ts, event_id) THEN -1
      |      WHEN vm = lag(vm) OVER (PARTITION BY user_id
      |        ORDER BY ts, event_id) THEN 0 END AS dir
      |  FROM v),
      |ch AS (SELECT user_id,
      |    CAST(count(*) AS BIGINT) - 1 AS n_steps_plus,
      |    CAST(count(*) FILTER (WHERE dir IS NOT NULL
      |      AND pd IS NOT NULL AND dir <> pd) AS BIGINT) AS changes
      |  FROM (SELECT user_id, dir, lag(dir) OVER (PARTITION BY user_id
      |      ORDER BY rk) AS pd FROM d) GROUP BY user_id),
      |inc AS (SELECT user_id, rk - row_number() OVER (
      |      PARTITION BY user_id ORDER BY rk) AS island
      |  FROM d WHERE dir = 1),
      |runs AS (SELECT user_id, CAST(count(*) AS BIGINT) AS run_len
      |  FROM inc GROUP BY user_id, island),
      |mx AS (SELECT user_id, max(run_len) AS max_inc_run
      |  FROM runs GROUP BY user_id)
      |SELECT ch.user_id, ch.n_steps_plus + 1 AS n, ch.changes,
      |  coalesce(mx.max_inc_run, CAST(0 AS BIGINT)) AS max_inc_run
      |FROM ch LEFT JOIN mx ON ch.user_id = mx.user_id""")(
    (s, dir) => {
      val ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val v = Tables.events(s, dir).select(col("user_id"), col("ts"),
        col("event_id"),
        (col("value").cast("decimal(18,6)") * 1000000).cast("long")
          .as("vm"))
      val d = v.select(col("user_id"),
          row_number().over(ord).cast("long").as("rk"),
          lag(col("vm"), 1).over(ord).as("pv"), col("vm"))
        .withColumn("dir",
          when(col("vm") > col("pv"), 1)
            .when(col("vm") < col("pv"), -1)
            .when(col("vm") === col("pv"), 0))
      val byRk = Window.partitionBy("user_id").orderBy("rk")
      val ch = d.withColumn("pd", lag(col("dir"), 1).over(byRk))
        .groupBy("user_id").agg(
          (count(lit(1)) - 1).as("n_steps_plus"),
          count(when(col("dir").isNotNull && col("pd").isNotNull
            && col("dir") =!= col("pd"), 1)).as("changes"))
      val mx = d.where(col("dir") === 1)
        .withColumn("island",
          col("rk") - row_number().over(byRk).cast("long"))
        .groupBy("user_id", "island").agg(count(lit(1)).as("run_len"))
        .groupBy("user_id").agg(max(col("run_len")).as("max_inc_run"))
      ch.join(mx, Seq("user_id"), "left")
        .select(col("user_id"),
          (col("n_steps_plus") + 1).as("n"), col("changes"),
          coalesce(col("max_inc_run"), lit(0L)).as("max_inc_run"))
    })

  /** Floor-division by 2 that is identical on both engines for SIGNED
    * operands: Spark DIV truncates toward zero while DuckDB // floors
    * (the SCALING.md negative-DIV trap), so the negative branch is
    * spelled with non-negative operands only. `div` is the engine's
    * integer-division keyword (`DIV` / `//`). */
  private def fd2(a: String, div: String): String =
    s"(CASE WHEN ($a) >= 0 THEN ($a) $div 2" +
      s" ELSE -(((-($a)) + 1) $div 2) END)"

  /** q265's oracle: per-type daily totals, then Holt's linear
    * (double-exponential) smoothing with α = β = ½ as a recursive CTE
    * walking the day rank — every update is integer (the ½ smoothing
    * is the portable signed floor-div-by-2), so level/trend/forecast
    * replay exactly. */
  private val holtOracle: String = {
    def L(y: String, l: String, b: String) = fd2(s"$y + $l + $b", "//")
    val lExpr = L("s.y", "h.l", "h.b")
    s"""WITH RECURSIVE daily AS MATERIALIZED (SELECT event_type,
       |    CAST(ts AS DATE) AS d,
       |    CAST(sum(CAST(CAST(value AS DECIMAL(18,6)) * 1000000
       |      AS BIGINT)) AS BIGINT) AS y
       |  FROM events GROUP BY 1, 2),
       |s AS MATERIALIZED (SELECT event_type,
       |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY d)
       |      AS BIGINT) AS rk, y
       |  FROM daily),
       |h AS (
       |  SELECT event_type, rk, y AS l, CAST(0 AS BIGINT) AS b
       |  FROM s WHERE rk = 1
       |  UNION ALL
       |  SELECT s.event_type, s.rk, $lExpr,
       |    ${fd2(s"h.b + $lExpr - h.l", "//")}
       |  FROM h JOIN s ON s.event_type = h.event_type
       |    AND s.rk = h.rk + 1),
       |lst AS (SELECT event_type, max(rk) AS n_days FROM s GROUP BY 1)
       |SELECT h.event_type, lst.n_days, h.l AS level_micro,
       |  h.b AS trend_micro, h.l + h.b AS forecast_micro
       |FROM h JOIN lst ON h.event_type = lst.event_type
       |  AND h.rk = lst.n_days""".stripMargin
  }

  /** Holt linear-trend smoothing (α = β = ½, integer fixed point) of
    * each event type's daily value series: final level, trend, and
    * one-step forecast. The Spark side folds each key's sorted daily
    * array with a struct accumulator inside ONE row-level higher-order
    * `aggregate` — per-key state never leaves the executor, the
    * sequential dependency lives inside a codegen'd expression, and
    * the shuffle is just the daily pre-aggregate. */
  val q265 = QueryDef.sql("q265_holt_trend", holtOracle)(
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), col("ts").cast("date").as("d"))
        .agg(sum((col("value").cast("decimal(18,6)") * 1000000)
          .cast("long")).as("y"))
      val lS = fd2("x.y + acc.l + acc.b", "DIV")
      val step = s"named_struct('l', $lS," +
        s" 'b', ${fd2(s"acc.b + $lS - acc.l", "DIV")}, 'k', 1)"
      daily.groupBy("event_type")
        .agg(sort_array(collect_list(struct(col("d"), col("y"))))
          .as("arr"))
        .select(col("event_type"),
          size(col("arr")).cast("long").as("n_days"),
          expr("aggregate(arr, named_struct('l', CAST(0 AS BIGINT)," +
            " 'b', CAST(0 AS BIGINT), 'k', 0)," +
            " (acc, x) -> IF(acc.k = 0," +
            " named_struct('l', x.y, 'b', CAST(0 AS BIGINT), 'k', 1)," +
            s" $step))").as("h"))
        .select(col("event_type"), col("n_days"),
          col("h.l").as("level_micro"), col("h.b").as("trend_micro"),
          (col("h.l") + col("h.b")).as("forecast_micro"))
    })

  /** q267's oracle: 12 integer power-iteration rounds of the user-
    * stream Markov chain, each v_j ← Σ_i (v_i · c_ij) // rowsum_i —
    * every operand non-negative, so // and DIV agree. */
  private val markovOracle: String = {
    val sb = new StringBuilder
    sb ++= """WITH seq AS (SELECT user_id, event_type,
             |    lag(event_type) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS prev
             |  FROM events),
             |trans AS MATERIALIZED (SELECT prev AS src,
             |    event_type AS dst, CAST(count(*) AS BIGINT) AS c
             |  FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
             |rs AS (SELECT src, CAST(sum(c) AS BIGINT) AS rsum
             |  FROM trans GROUP BY 1),
             |types AS (SELECT DISTINCT event_type AS et FROM events),
             |v0 AS (SELECT et, CAST(1000000 AS BIGINT)
             |    // (SELECT count(*) FROM types) AS p FROM types),
             |""".stripMargin
    for (t <- 1 to 12)
      sb ++= s"v$t AS (SELECT ty.et, CAST(coalesce(sum(" +
        s"(v.p * tr.c) // rs.rsum), 0) AS BIGINT) AS p\n" +
        s"  FROM types ty LEFT JOIN trans tr ON tr.dst = ty.et\n" +
        s"  LEFT JOIN rs ON tr.src = rs.src\n" +
        s"  LEFT JOIN v${t - 1} v ON v.et = tr.src GROUP BY 1),\n"
    sb.setLength(sb.length - 2) // drop trailing ,\n
    sb ++= "\nSELECT et AS event_type, p AS stationary_ppm FROM v12"
    sb.toString
  }

  /** Stationary distribution of the per-user event-type Markov chain
    * (q95's transition matrix taken to its fixpoint): 12 integer
    * power-iteration rounds in ppm. The matrix is k×k for k event
    * types, so the Spark side collects the aggregated counts once
    * (k² ≤ 25 rows of driver state) and iterates in exact integer
    * arithmetic — the heavy lifting (the transition-count aggregate
    * over the full stream) stays distributed. */
  val q267 = QueryDef.sql("q267_markov_stationary", markovOracle)(
    (s, dir) => {
      val ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val seq0 = Tables.events(s, dir)
        .select(col("event_type"), lag("event_type", 1).over(ord)
          .as("prev"))
      val trans = seq0.where(col("prev").isNotNull)
        .groupBy(col("prev").as("src"), col("event_type").as("dst"))
        .agg(count(lit(1)).as("c")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      val types = Tables.events(s, dir).select("event_type").distinct()
        .collect().map(_.getString(0)).sorted
      val rsum = trans.groupBy(_._1).map { case (k, v) =>
        k -> v.map(_._3).sum }
      var p: Map[String, Long] =
        types.map(_ -> 1000000L / types.length).toMap
      for (_ <- 1 to 12)
        p = types.map { t =>
          t -> trans.filter(_._2 == t).map { case (src, _, c) =>
            p(src) * c / rsum(src) }.sum
        }.toMap
      import s.implicits._
      types.map(t => (t, p(t))).toSeq.toDF("event_type", "stationary_ppm")
    })

  /** SAX-style symbolization + motif mining of each type's daily
    * series: days map to tercile symbols a/b/c by POSITIONAL ntile on
    * the deterministic (value, day) order — rank-based breakpoints,
    * not the Gaussian ones, so no libm constant ever decides a symbol
    * — then 3-day words are counted and each type reports its modal
    * motif. One partitioned-window chain per type; everything integer
    * or string. */
  val q269 = QueryDef.sql("q269_sax_motifs",
    """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
      |    CAST(sum(CAST(CAST(value AS DECIMAL(18,6)) * 1000000
      |      AS BIGINT)) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2),
      |sym AS (SELECT event_type, d,
      |    chr(CAST(96 + ntile(3) OVER (PARTITION BY event_type
      |      ORDER BY y, d) AS INT)) AS s
      |  FROM daily),
      |words AS (SELECT event_type,
      |    lag(s, 2) OVER o || lag(s, 1) OVER o || s AS w
      |  FROM sym WINDOW o AS (PARTITION BY event_type ORDER BY d)),
      |wc AS (SELECT event_type, w, CAST(count(*) AS BIGINT) AS cnt
      |  FROM words WHERE w IS NOT NULL GROUP BY 1, 2),
      |tot AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n_words
      |  FROM wc GROUP BY 1)
      |SELECT r.event_type, r.w AS motif, r.cnt, tot.n_words
      |FROM (SELECT *, row_number() OVER (PARTITION BY event_type
      |    ORDER BY cnt DESC, w) AS rn FROM wc) r
      |JOIN tot ON r.event_type = tot.event_type
      |WHERE r.rn = 1""")(
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), col("ts").cast("date").as("d"))
        .agg(sum((col("value").cast("decimal(18,6)") * 1000000)
          .cast("long")).as("y"))
      val byVal = Window.partitionBy("event_type").orderBy("y", "d")
      val byDay = Window.partitionBy("event_type").orderBy("d")
      val sym = daily.withColumn("s",
        chr(lit(96) + ntile(3).over(byVal)))
      val words = sym.select(col("event_type"),
          concat(lag("s", 2).over(byDay), lag("s", 1).over(byDay),
            col("s")).as("w"))
        .where(col("w").isNotNull)
      val wc = words.groupBy("event_type", "w")
        .agg(count(lit(1)).as("cnt"))
      val tot = wc.groupBy("event_type").agg(sum("cnt").as("n_words"))
      wc.withColumn("rn", row_number().over(
          Window.partitionBy("event_type")
            .orderBy(col("cnt").desc, col("w"))))
        .where(col("rn") === 1)
        .join(tot, "event_type")
        .select(col("event_type"), col("w").as("motif"), col("cnt"),
          col("n_words"))
    })

  /** Behavioral similarity by edit distance: each user's first 12
    * event-type initials (in stream order) form a signature string;
    * pairs BLOCKED on the first symbol are scored with levenshtein
    * (both engines ship the identical unit-cost DP) and the 20
    * closest pairs ship. Blocking cuts the pair space 5× here and by
    * the block-count generally — the sorted-neighborhood/LSH stance
    * (q165/q30) applied to sequence similarity. */
  val q271 = QueryDef.sql("q271_behavior_editdist",
    """WITH r AS (SELECT user_id, event_type,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS rn
      |  FROM events),
      |sig AS (SELECT user_id,
      |    string_agg(substring(event_type, 1, 1), '' ORDER BY rn)
      |      AS sig
      |  FROM r WHERE rn <= 12 GROUP BY 1),
      |p AS (SELECT a.user_id AS ua, b.user_id AS ub,
      |    CAST(levenshtein(a.sig, b.sig) AS BIGINT) AS dist
      |  FROM sig a JOIN sig b
      |    ON substring(a.sig, 1, 1) = substring(b.sig, 1, 1)
      |    AND a.user_id < b.user_id)
      |SELECT ua, ub, dist, rk FROM (
      |  SELECT ua, ub, dist, CAST(row_number() OVER (
      |    ORDER BY dist, ua, ub) AS BIGINT) AS rk
      |  FROM p) WHERE rk <= 20""")(
    (s, dir) => {
      val ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val sig = Tables.events(s, dir)
        .select(col("user_id"),
          substring(col("event_type"), 1, 1).as("ini"),
          row_number().over(ord).as("rn"))
        .where(col("rn") <= 12)
        .groupBy("user_id")
        .agg(array_join(transform(
          sort_array(collect_list(struct(col("rn"), col("ini")))),
          x => x.getField("ini")), "").as("sig"))
        .withColumn("blk", substring(col("sig"), 1, 1))
      // EXACT top-20 WITHOUT the in-block pair space (VERDICT r12 #1:
      // the block key has ~5 fixed values, so in-block pairs grow
      // quadratically per data decade no matter how good the plan) —
      // the count-then-dial ladder of Linkage.topKClosestPairs:
      // identical-sig groups, then PassJoin segment-pigeonhole
      // candidates at radius 1..3 (exact: any pair the rung excludes
      // is farther than the rung's verified 20th-best), then the old
      // block join only below ladder range. The winning rung FALLS as
      // data grows (cutoff dist 3 at sf0.1, 2 at 10×), so scale runs
      // the linear rungs. rk is a window over the 20 surviving rows.
      val top = graft.operators.Linkage
        .topKClosestPairs(sig, "user_id", "sig", "blk", k = 20)
        .select(col("id1").as("ua"), col("id2").as("ub"), col("dist"))
      top.withColumn("rk", row_number().over(
        Window.orderBy(col("dist"), col("ua"), col("ub"))).cast("long"))
    })

  /** Portable floor-division for SIGNED dividend / positive divisor
    * (see [[fd2]]). */
  private def fdiv(a: String, b: String, div: String): String =
    s"(CASE WHEN ($a) >= 0 THEN ($a) $div ($b)" +
      s" ELSE -(((-($a)) + ($b) - 1) $div ($b)) END)"

  /** STL-lite seasonal decomposition of each type's daily series:
    * trend = centered 7-day mean (interior days only), detrended
    * residual averaged by day-of-week = the seasonal profile, and the
    * mean absolute remainder as the noise floor. Day-of-week is
    * integer epoch-day arithmetic ((days + 4) mod 7, Monday = 0) —
    * never the engines' disagreeing dayofweek() — and the signed
    * seasonal means use the portable floor-div spelling. One
    * partitioned window chain + two aggregates. */
  val q272 = QueryDef.sql("q272_stl_seasonal",
    s"""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
       |    CAST(sum(CAST(CAST(value AS DECIMAL(18,6)) * 1000000
       |      AS BIGINT)) AS BIGINT) AS y
       |  FROM events GROUP BY 1, 2),
       |w AS (SELECT event_type, d, y,
       |    CAST(sum(y) OVER o AS BIGINT) AS s7,
       |    CAST(count(*) OVER o AS BIGINT) AS c7,
       |    date_diff('day', DATE '1970-01-01', d) AS ed
       |  FROM daily
       |  WINDOW o AS (PARTITION BY event_type ORDER BY d
       |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
       |det AS (SELECT event_type, (ed + 4) % 7 AS dow,
       |    y - (s7 // 7) AS r
       |  FROM w WHERE c7 = 7),
       |sea AS (SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(r) AS BIGINT) AS sr FROM det GROUP BY 1, 2),
       |out AS (SELECT s.event_type, s.dow, s.n,
       |    ${fdiv("s.sr", "s.n", "//")} AS seasonal_micro,
       |    CAST(sum(abs(d.r - ${fdiv("s.sr", "s.n", "//")}))
       |      AS BIGINT) // s.n AS mean_abs_resid
       |  FROM sea s JOIN det d
       |    ON d.event_type = s.event_type AND d.dow = s.dow
       |  GROUP BY 1, 2, 3, ${fdiv("s.sr", "s.n", "//")})
       |SELECT event_type, CAST(dow AS BIGINT) AS dow, n,
       |  seasonal_micro, mean_abs_resid
       |FROM out""".stripMargin)(
    (s, dir) => {
      val o = Window.partitionBy("event_type").orderBy("d")
        .rowsBetween(-3, 3)
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), col("ts").cast("date").as("d"))
        .agg(sum((col("value").cast("decimal(18,6)") * 1000000)
          .cast("long")).as("y"))
      val det = daily.select(col("event_type"), col("d"), col("y"),
          sum("y").over(o).as("s7"), count(lit(1)).over(o).as("c7"),
          expr("unix_date(d)").as("ed"))
        .where(col("c7") === 7)
        .select(col("event_type"), pmod(col("ed") + 4, lit(7)).as("dow"),
          (col("y") - expr("s7 DIV 7")).as("r"))
      val sea = det.groupBy("event_type", "dow")
        .agg(count(lit(1)).as("n"), sum("r").as("sr"))
        .withColumn("seasonal_micro",
          expr(fdiv("sr", "n", "DIV")))
      sea.join(det, Seq("event_type", "dow"))
        .groupBy(col("event_type"), col("dow"), col("n"),
          col("seasonal_micro"))
        .agg(expr("CAST(sum(abs(r - seasonal_micro)) AS BIGINT) DIV " +
          "first(n)").as("mean_abs_resid"))
        .select(col("event_type"), col("dow").cast("long").as("dow"),
          col("n"), col("seasonal_micro"), col("mean_abs_resid"))
    })

  /** Backtest of the q267 Markov model as a next-event predictor:
    * pred(prev) = the argmax next type by global transition count
    * (integer argmax, ties by name), scored over every transition in
    * the stream. Per previous-state accuracy in floor-ppm — the
    * honest "is the chain actually predictive" number that should
    * accompany any stationary-distribution claim. */
  val q275 = QueryDef.sql("q275_markov_eval",
    """WITH seq AS (SELECT user_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS prev
      |  FROM events),
      |t AS (SELECT prev, event_type AS cur,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
      |pred AS (SELECT prev, cur AS p FROM (
      |  SELECT *, row_number() OVER (PARTITION BY prev
      |    ORDER BY c DESC, cur) AS rn FROM t) WHERE rn = 1)
      |SELECT t.prev, CAST(sum(t.c) AS BIGINT) AS n_trans,
      |  CAST(sum(CASE WHEN t.cur = pred.p THEN t.c ELSE 0 END)
      |    AS BIGINT) AS n_correct,
      |  CAST((sum(CASE WHEN t.cur = pred.p THEN t.c ELSE 0 END)
      |    * 1000000) // sum(t.c) AS BIGINT) AS acc_ppm
      |FROM t JOIN pred ON t.prev = pred.prev
      |GROUP BY 1""")(
    (s, dir) => {
      val ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val t = Tables.events(s, dir)
        .select(col("event_type").as("cur"),
          lag("event_type", 1).over(ord).as("prev"))
        .where(col("prev").isNotNull)
        .groupBy("prev", "cur").agg(count(lit(1)).as("c"))
      val pred = t.withColumn("rn", row_number().over(
          Window.partitionBy("prev").orderBy(col("c").desc, col("cur"))))
        .where(col("rn") === 1).select(col("prev"), col("cur").as("p"))
      t.join(broadcast(pred), "prev")
        .groupBy("prev").agg(sum("c").as("n_trans"),
          sum(when(col("cur") === col("p"), col("c")).otherwise(0L))
            .as("n_correct"))
        .select(col("prev"), col("n_trans"), col("n_correct"),
          expr("(n_correct * 1000000) DIV n_trans").as("acc_ppm"))
    })

  /** q276's oracle: the q265 recurrence extended with running
    * one-step-ahead error sums — forecast f_t = l_{t-1} + b_{t-1} is
    * scored BEFORE folding y_t in (rolling-origin evaluation, no
    * leakage), and the naive baseline |y_t − y_{t-1}| rides along. */
  private val holtBacktestOracle: String = {
    def L = fd2("s.y + h.l + h.b", "//")
    s"""WITH RECURSIVE daily AS MATERIALIZED (SELECT event_type,
       |    CAST(ts AS DATE) AS d,
       |    CAST(sum(CAST(CAST(value AS DECIMAL(18,6)) * 1000000
       |      AS BIGINT)) AS BIGINT) AS y
       |  FROM events GROUP BY 1, 2),
       |s AS MATERIALIZED (SELECT event_type,
       |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY d)
       |      AS BIGINT) AS rk, y
       |  FROM daily),
       |h AS (
       |  SELECT event_type, rk, y AS l, CAST(0 AS BIGINT) AS b,
       |    CAST(0 AS BIGINT) AS sae, CAST(0 AS BIGINT) AS saen,
       |    y AS py
       |  FROM s WHERE rk = 1
       |  UNION ALL
       |  SELECT s.event_type, s.rk, $L,
       |    ${fd2(s"h.b + $L - h.l", "//")},
       |    h.sae + abs(s.y - (h.l + h.b)),
       |    h.saen + abs(s.y - h.py), s.y
       |  FROM h JOIN s ON s.event_type = h.event_type
       |    AND s.rk = h.rk + 1),
       |lst AS (SELECT event_type, max(rk) AS n_days FROM s GROUP BY 1)
       |SELECT h.event_type, lst.n_days,
       |  h.sae // (lst.n_days - 1) AS mae_micro,
       |  h.saen // (lst.n_days - 1) AS mae_naive_micro,
       |  CASE WHEN h.saen = 0 THEN CAST(0 AS BIGINT)
       |    ELSE 1000 - (1000 * h.sae) // h.saen END AS skill_milli
       |FROM h JOIN lst ON h.event_type = lst.event_type
       |  AND h.rk = lst.n_days
       |WHERE lst.n_days >= 2""".stripMargin
  }

  /** Rolling-origin backtest of the q265 Holt smoother: every day's
    * forecast is made from the state BEFORE that day folds in, so the
    * MAE is honest out-of-sample error; the skill column is
    * 1000·(1 − MAE/MAE_naive) against the last-value baseline —
    * positive = the smoother earns its keep. Same single-fold scale
    * shape as q265 (error sums ride in the accumulator struct). */
  val q276 = QueryDef.sql("q276_holt_backtest", holtBacktestOracle)(
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), col("ts").cast("date").as("d"))
        .agg(sum((col("value").cast("decimal(18,6)") * 1000000)
          .cast("long")).as("y"))
      val lS = fd2("x.y + acc.l + acc.b", "DIV")
      val step = s"named_struct('l', $lS," +
        s" 'b', ${fd2(s"acc.b + $lS - acc.l", "DIV")}," +
        " 'sae', acc.sae + abs(x.y - (acc.l + acc.b))," +
        " 'saen', acc.saen + abs(x.y - acc.py)," +
        " 'py', x.y, 'k', 1)"
      daily.groupBy("event_type")
        .agg(sort_array(collect_list(struct(col("d"), col("y"))))
          .as("arr"))
        .where(size(col("arr")) >= 2)
        .select(col("event_type"),
          size(col("arr")).cast("long").as("n_days"),
          expr("aggregate(arr, named_struct('l', CAST(0 AS BIGINT)," +
            " 'b', CAST(0 AS BIGINT), 'sae', CAST(0 AS BIGINT)," +
            " 'saen', CAST(0 AS BIGINT), 'py', CAST(0 AS BIGINT)," +
            " 'k', 0)," +
            " (acc, x) -> IF(acc.k = 0," +
            " named_struct('l', x.y, 'b', CAST(0 AS BIGINT)," +
            " 'sae', CAST(0 AS BIGINT), 'saen', CAST(0 AS BIGINT)," +
            " 'py', x.y, 'k', 1)," +
            s" $step))").as("h"))
        .select(col("event_type"), col("n_days"),
          expr("h.sae DIV (n_days - 1)").as("mae_micro"),
          expr("h.saen DIV (n_days - 1)").as("mae_naive_micro"),
          expr("CASE WHEN h.saen = 0 THEN CAST(0 AS BIGINT)" +
            " ELSE 1000 - (1000 * h.sae) DIV h.saen END")
            .as("skill_milli"))
    })

  /** Trailing-28-day p95 of each type's daily totals — the tail-
    * latency/SLA monitor shape, with the percentile as an EXACT order
    * statistic (the ⌈0.95·28⌉-th smallest in the window, q247's rank
    * stance — never a quantile estimate). Spelled as a bounded rank
    * self-join (28 rows per output day) rather than a window sort,
    * identical on both engines. */
  val q277 = QueryDef.sql("q277_trailing_p95",
    """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
      |    CAST(sum(CAST(CAST(value AS DECIMAL(18,6)) * 1000000
      |      AS BIGINT)) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2),
      |s AS (SELECT event_type,
      |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY d)
      |      AS BIGINT) AS rk, d, y
      |  FROM daily),
      |p AS (SELECT a.event_type, a.rk, a.d, b.y AS by,
      |    row_number() OVER (PARTITION BY a.event_type, a.rk
      |      ORDER BY b.y, b.rk) AS rn
      |  FROM s a JOIN s b ON a.event_type = b.event_type
      |    AND b.rk BETWEEN a.rk - 27 AND a.rk
      |  WHERE a.rk >= 28)
      |SELECT event_type, d, by AS p95_micro
      |FROM p WHERE rn = 27""")(
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), col("ts").cast("date").as("d"))
        .agg(sum((col("value").cast("decimal(18,6)") * 1000000)
          .cast("long")).as("y"))
      val srk = daily.withColumn("rk", row_number().over(
        Window.partitionBy("event_type").orderBy("d")).cast("long"))
      val a = srk.select(col("event_type"), col("rk"), col("d"))
        .where(col("rk") >= 28)
      val b = srk.select(col("event_type").as("et2"),
        col("rk").as("brk"), col("y").as("by"))
      a.join(b, col("event_type") === col("et2")
          && col("brk").between(col("rk") - 27, col("rk")))
        .withColumn("rn", row_number().over(
          Window.partitionBy("event_type", "rk")
            .orderBy(col("by"), col("brk"))))
        .where(col("rn") === 27)
        .select(col("event_type"), col("d"), col("by").as("p95_micro"))
    })

  /** Process-mining VARIANT analysis: each user's journey signature
    * (event-type initials in (ts, event_id) order, capped at the
    * first 30 events — the q271 bounded-signature stance) grouped
    * into variants, top-10 by user count with cumulative coverage in
    * floor-ppm. The table a process-mining tool opens with: how many
    * distinct behaviors exist and how much traffic the head covers
    * (next to q281's eventually-follows relation and q97's session
    * paths, which summarize EDGES — variants keep whole paths).
    * Shape: one per-user window chain -> one signature aggregate ->
    * a 10-row tail. */
  val q301 = QueryDef.sql("q301_journey_variants",
    """WITH r AS (SELECT user_id, event_type,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS rn
      |  FROM events),
      |sig AS (SELECT user_id,
      |    string_agg(substring(event_type, 1, 1), '' ORDER BY rn)
      |      AS sig
      |  FROM r WHERE rn <= 30 GROUP BY 1),
      |v AS (SELECT sig, CAST(count(*) AS BIGINT) AS n_users
      |  FROM sig GROUP BY 1),
      |t AS (SELECT CAST(sum(n_users) AS BIGINT) AS tot,
      |    CAST(count(*) AS BIGINT) AS n_variants FROM v),
      |rk AS (SELECT sig, n_users,
      |    CAST(row_number() OVER (ORDER BY n_users DESC, sig)
      |      AS BIGINT) AS rk,
      |    CAST(sum(n_users) OVER (ORDER BY n_users DESC, sig
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      |  FROM v)
      |SELECT rk.rk, rk.sig AS variant, rk.n_users, t.n_variants,
      |  (rk.cum * 1000000) // t.tot AS coverage_ppm
      |FROM rk, t WHERE rk.rk <= 10""")(
    (s, dir) => {
      val ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val sig = Tables.events(s, dir)
        .select(col("user_id"),
          substring(col("event_type"), 1, 1).as("ini"),
          row_number().over(ord).as("rn"))
        .where(col("rn") <= 30)
        .groupBy("user_id")
        .agg(array_join(transform(
          sort_array(collect_list(struct(col("rn"), col("ini")))),
          x => x.getField("ini")), "").as("sig"))
      val v = sig.groupBy("sig").agg(count(lit(1)).as("n_users"))
      val t = v.agg(sum("n_users").as("tot"),
        count(lit(1)).as("n_variants"))
      val w = Window.orderBy(col("n_users").desc, col("sig"))
      v.withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("cum", sum("n_users").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .where(col("rk") <= 10)
        .crossJoin(broadcast(t))
        .select(col("rk"), col("sig").as("variant"), col("n_users"),
          col("n_variants"),
          expr("(cum * 1000000) DIV tot").as("coverage_ppm"))
    })

  /** Latency-annotated directly-follows graph — the performance view
    * of q95's transition counts: for each adjacent event-type pair in
    * the per-user stream, the exact lower-median and exact discrete
    * p90 of the transition gap in integer microseconds (rank
    * selection on the per-pair window — no interpolation, no floats,
    * the q156 percentile_disc stance). Reading it: hot edges with
    * high median gaps are the pipeline's wait states. Shape: one
    * per-user lead() chain -> per-pair windows bounded by the pair's
    * transition count -> |pairs| rows. */
  val q302 = QueryDef.sql("q302_dfg_latency",
    """WITH p AS (SELECT user_id, event_type AS src, ts, event_id,
      |    lead(event_type) OVER w AS dst,
      |    epoch_us(lead(ts) OVER w) - epoch_us(ts) AS gap_us
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |g AS (SELECT src, dst, gap_us,
      |    row_number() OVER (PARTITION BY src, dst
      |      ORDER BY gap_us, user_id, event_id) AS rk,
      |    count(*) OVER (PARTITION BY src, dst) AS n
      |  FROM p WHERE dst IS NOT NULL)
      |SELECT src, dst, CAST(max(n) AS BIGINT) AS n_transitions,
      |  CAST(max(CASE WHEN rk = (n + 1) // 2 THEN gap_us END)
      |    AS BIGINT) AS median_gap_us,
      |  CAST(max(CASE WHEN rk = (n * 9 + 9) // 10 THEN gap_us END)
      |    AS BIGINT) AS p90_gap_us
      |FROM g GROUP BY 1, 2""")(
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val p = Tables.events(s, dir)
        .select(col("user_id"), col("event_type").as("src"),
          col("event_id"),
          unix_micros(col("ts")).as("tu"),
          lead(col("event_type"), 1).over(w).as("dst"),
          (unix_micros(lead(col("ts"), 1).over(w)) -
            unix_micros(col("ts"))).as("gap_us"))
        .where(col("dst").isNotNull)
      val pw = Window.partitionBy("src", "dst")
      val g = p.select(col("src"), col("dst"), col("gap_us"),
        row_number().over(pw.orderBy("gap_us", "user_id", "event_id"))
          .as("rk"),
        count(lit(1)).over(pw).as("n"))
      g.groupBy("src", "dst").agg(
        max("n").as("n_transitions"),
        max(when(col("rk") === expr("(n + 1) DIV 2"), col("gap_us")))
          .as("median_gap_us"),
        max(when(col("rk") === expr("(n * 9 + 9) DIV 10"),
          col("gap_us"))).as("p90_gap_us"))
    })

  /** Log2-bucketed transition-gap histograms — the BOUNDED-STATE form
    * of q302's exact DFG latencies: per directly-follows pair, gaps
    * bucketed by floor(log2(gap_us)) (integer bit-length, no libm),
    * with per-bucket counts and the histogram-resolved p90 BOUND (the
    * smallest bucket whose cumulative count reaches ceil(0.9 n); the
    * true p90 lies within that bucket's [2^b, 2^(b+1)) range — a
    * factor-2 resolution certificate, not an estimate). This is the
    * representation that streams: bucket counts are commutative, so
    * `Streams.gapHistogramStream` maintains the identical histogram
    * as update-mode state with O(|pairs| x 64) rows (StreamsSpec
    * asserts bit-parity per micro-batch), while exact q302 needs the
    * full gap multiset. Shape: one per-user lead() chain -> one
    * (pair, bucket) aggregate -> per-pair bounded tails. */
  val q310 = QueryDef.sql("q310_dfg_gap_hist",
    """WITH p AS (SELECT user_id, event_type AS src,
      |    lead(event_type) OVER w AS dst,
      |    epoch_us(lead(ts) OVER w) - epoch_us(ts) AS gap_us
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |g AS (SELECT src, dst,
      |    CASE WHEN gap_us <= 0 THEN 0
      |      ELSE length(bin(gap_us)) - 1 END AS bucket
      |  FROM p WHERE dst IS NOT NULL),
      |h AS (SELECT src, dst, CAST(bucket AS BIGINT) AS bucket,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM g GROUP BY 1, 2, 3),
      |t AS (SELECT src, dst, CAST(sum(n) AS BIGINT) AS tot
      |  FROM h GROUP BY 1, 2),
      |c AS (SELECT h.src, h.dst, h.bucket, h.n, t.tot,
      |    CAST(sum(h.n) OVER (PARTITION BY h.src, h.dst
      |      ORDER BY h.bucket ROWS UNBOUNDED PRECEDING) AS BIGINT)
      |      AS cum
      |  FROM h JOIN t ON h.src = t.src AND h.dst = t.dst)
      |SELECT src, dst, bucket, n,
      |  CASE WHEN cum - n < (tot * 9 + 9) // 10
      |    AND cum >= (tot * 9 + 9) // 10 THEN 1 ELSE 0 END
      |    AS is_p90_bucket
      |FROM c""")(
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val p = Tables.events(s, dir)
        .select(col("user_id"), col("event_type").as("src"),
          lead(col("event_type"), 1).over(w).as("dst"),
          (unix_micros(lead(col("ts"), 1).over(w)) -
            unix_micros(col("ts"))).as("gap_us"))
        .where(col("dst").isNotNull)
      val h = p.select(col("src"), col("dst"),
          graft.streaming.Streams.log2Bucket(col("gap_us"))
            .as("bucket"))
        .groupBy("src", "dst", "bucket").agg(count(lit(1)).as("n"))
      val t = h.groupBy("src", "dst").agg(sum("n").as("tot"))
      val cw = Window.partitionBy("src", "dst").orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      h.join(t, Seq("src", "dst"))
        .withColumn("cum", sum("n").over(cw))
        .select(col("src"), col("dst"), col("bucket"), col("n"),
          when(col("cum") - col("n") < expr("(tot * 9 + 9) DIV 10") &&
            col("cum") >= expr("(tot * 9 + 9) DIV 10"), 1L)
            .otherwise(0L).as("is_p90_bucket"))
    })

  /** Cohort half-life: for each first-active-day cohort, the first
    * day offset at which daily active members drop to half the
    * cohort size or below — the fit-free decay summary of the q190
    * retention matrix (one number per cohort instead of a curve; no
    * exponential fitting, no libm). Also ships day-7 retention in
    * floor-ppm. Exact integers throughout: activity is a distinct
    * (user, day) aggregate, the crossing is a min over qualifying
    * offsets. Cohorts that never halve inside the observed window
    * ship half_life_days = -1 (right-censored, the q213 stance). */
  val q311 = QueryDef.sql("q311_cohort_halflife",
    """WITH ud AS (SELECT DISTINCT user_id,
      |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS ed
      |  FROM events),
      |fc AS (SELECT user_id, min(ed) AS c0 FROM ud GROUP BY 1),
      |act AS (SELECT fc.c0, ud.ed - fc.c0 AS d,
      |    CAST(count(*) AS BIGINT) AS a
      |  FROM ud JOIN fc ON ud.user_id = fc.user_id
      |  GROUP BY 1, 2),
      |n0 AS (SELECT c0, a AS n0 FROM act WHERE d = 0),
      |hl AS (SELECT act.c0,
      |    min(CASE WHEN act.d > 0 AND act.a * 2 <= n0.n0
      |      THEN act.d END) AS half_life,
      |    max(CASE WHEN act.d = 7 THEN act.a END) AS a7
      |  FROM act JOIN n0 ON act.c0 = n0.c0 GROUP BY 1)
      |SELECT hl.c0 AS cohort_ed, n0.n0,
      |  coalesce(hl.half_life, -1) AS half_life_days,
      |  (coalesce(hl.a7, 0) * 1000000) // n0.n0 AS day7_retention_ppm
      |FROM hl JOIN n0 ON hl.c0 = n0.c0""")(
    (s, dir) => {
      val ud = Tables.events(s, dir)
        .select(col("user_id"),
          datediff(col("ts").cast("date"),
            lit("1970-01-01").cast("date")).cast("long").as("ed"))
        .distinct()
      val fc = ud.groupBy("user_id").agg(min("ed").as("c0"))
      val act = ud.join(fc, "user_id")
        .groupBy(col("c0"), (col("ed") - col("c0")).as("d"))
        .agg(count(lit(1)).as("a"))
      val n0 = act.where(col("d") === 0)
        .select(col("c0"), col("a").as("n0"))
      val hl = act.join(n0, "c0")
        .groupBy("c0").agg(
          min(when(col("d") > 0 && col("a") * 2 <= col("n0"),
            col("d"))).as("half_life"),
          max(when(col("d") === 7, col("a"))).as("a7"))
      hl.join(n0, "c0")
        .select(col("c0").as("cohort_ed"), col("n0"),
          coalesce(col("half_life"), lit(-1L)).as("half_life_days"),
          expr("(coalesce(a7, 0) * 1000000) DIV n0")
            .as("day7_retention_ppm"))
    })

  /** All same-block signature pairs at edit distance ≤ 3 — the PassJoin
    * segment-pigeonhole filter ([[graft.operators.Linkage
    * .editCandidates]], q271's ladder rung) as a FIRST-CLASS exact
    * join, standalone and oracled: candidates from the filter (zero
    * false negatives — the untouched-segment pigeonhole, proof in the
    * operator scaladoc), verified with the banded thresholded DP. The
    * oracle computes the naive in-block join, so the driver hash proves
    * the filter exact against an engine that never saw it. Unlike
    * q271's top-k (whose rung adapts to density), this is the
    * fixed-radius similarity-join shape — record linkage's "give me
    * every match" query — and its cost tracks the MATCH count, not the
    * block-pair space. Signatures are capped at 8 symbols (ADVICE
    * r14: the 12-symbol cap left the test-SF oracle at 2 rows —
    * 8 symbols put real match density under the hash at every SF:
    * 118 rows at sf0.01, ~11 k at sf0.1). */
  val q341 = QueryDef.sql("q341_sig_edit_join",
    """WITH r AS (SELECT user_id, event_type,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS rn
      |  FROM events),
      |sig AS (SELECT user_id,
      |    string_agg(substring(event_type, 1, 1), '' ORDER BY rn)
      |      AS sig
      |  FROM r WHERE rn <= 8 GROUP BY 1)
      |SELECT a.user_id AS id1, b.user_id AS id2,
      |  CAST(levenshtein(a.sig, b.sig) AS BIGINT) AS dist
      |FROM sig a JOIN sig b
      |  ON substring(a.sig, 1, 1) = substring(b.sig, 1, 1)
      |  AND a.user_id < b.user_id
      |WHERE levenshtein(a.sig, b.sig) <= 3""")(
    (s, dir) => {
      val ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val sig = Tables.events(s, dir)
        .select(col("user_id"),
          substring(col("event_type"), 1, 1).as("ini"),
          row_number().over(ord).as("rn"))
        .where(col("rn") <= 8)
        .groupBy("user_id")
        .agg(array_join(transform(
          sort_array(collect_list(struct(col("rn"), col("ini")))),
          x => x.getField("ini")), "").as("sig"))
        .withColumn("blk", substring(col("sig"), 1, 1))
      // through the linkage FRONT DOOR (VERDICT r13 #6): signatures are
      // a GROWING domain (distinct sigs track users at every SF), so
      // the dial picks the PassJoin candidates + banded-DP verify —
      // the branch complementary to q49's collapse; between them the
      // driver oracles BOTH stances of Linkage.editJoin.
      graft.operators.Linkage.editJoin(sig, "user_id", "sig",
        Seq("blk"), maxDist = 3)
    })

  /** INCREMENTAL fixed-radius edit join (VERDICT r13 #7): signatures
    * of users with user_id % 3 = 0 are the DELTA (today's ingest), the
    * rest the standing corpus; output is every same-block pair at
    * levenshtein ≤ 3 INVOLVING a delta member — delta×corpus and
    * delta×delta, never corpus×corpus. The PassJoin mirror of q54's
    * incremental LSH: the corpus contributes only its r+1 index keys
    * per string (the persisted artifact a daily linkage pipeline
    * maintains), the (r+1)(2r+1)² probe blow-up is paid on the delta
    * only. The oracle computes the NAIVE block join restricted to
    * ≥-one-delta-member pairs, so the driver hash proves both the
    * filter's exactness AND the delta algebra against an engine that
    * never saw either. Streaming twin: [[graft.streaming.Streams
    * .editJoinStream]] (StreamsSpec proves batch ≡ replayed stream).
    * Signatures are capped at 8 symbols (ADVICE r14: the 12-symbol
    * cap left this oracle at ONE row at the test SF — 8 symbols put
    * 72 rows at sf0.01 / ~6 k at sf0.1 under the hash); the COLLAPSE
    * stance the dial picks at saturated decades is separately oracled
    * by q343's forced-stance query. */
  val q342 = QueryDef.sql("q342_incr_edit_join",
    """WITH r AS (SELECT user_id, event_type,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS rn
      |  FROM events),
      |sig AS (SELECT user_id,
      |    string_agg(substring(event_type, 1, 1), '' ORDER BY rn)
      |      AS sig
      |  FROM r WHERE rn <= 8 GROUP BY 1)
      |SELECT a.user_id AS id1, b.user_id AS id2,
      |  CAST(levenshtein(a.sig, b.sig) AS BIGINT) AS dist
      |FROM sig a JOIN sig b
      |  ON substring(a.sig, 1, 1) = substring(b.sig, 1, 1)
      |  AND a.user_id < b.user_id
      |WHERE levenshtein(a.sig, b.sig) <= 3
      |  AND (a.user_id % 3 = 0 OR b.user_id % 3 = 0)""")(
    (s, dir) => {
      val ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val sig = Tables.events(s, dir)
        .select(col("user_id"),
          substring(col("event_type"), 1, 1).as("ini"),
          row_number().over(ord).as("rn"))
        .where(col("rn") <= 8)
        .groupBy("user_id")
        .agg(array_join(transform(
          sort_array(collect_list(struct(col("rn"), col("ini")))),
          x => x.getField("ini")), "").as("sig"))
        .withColumn("blk", substring(col("sig"), 1, 1))
      // through the incremental FRONT DOOR: growing sig domains (the
      // test SFs) take the PassJoin candidates + verify; at bench
      // decades the signature space saturates (1500 distinct sigs
      // under 150k users at 100×) and the dial flips to the
      // distinct-value collapse — both stances exact, so this oracle
      // hash-checks whichever branch the dial picks.
      graft.operators.Linkage.incrementalEditJoin(
        sig.where(pmod(col("user_id"), lit(3)) =!= 0),
        sig.where(pmod(col("user_id"), lit(3)) === 0),
        "user_id", "sig", "blk", maxDist = 3)
    })

  val all: Seq[QueryDef] = Seq(q256, q258, q265, q267, q269, q271, q272,
    q275, q276, q277, q301, q302, q310, q311, q341, q342)
}
