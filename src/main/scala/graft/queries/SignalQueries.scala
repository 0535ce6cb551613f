package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Signal-processing features of the per-type daily series — the
  * spectral/temporal battery that complements the smoothing (q126
  * EWMA, q265 Holt), decomposition (q272 STL-lite) and changepoint
  * (q204 CUSUM) families: autocorrelation structure, lead-lag
  * cross-correlation between two streams, and Haar wavelet band
  * energies. All three run on the ~(types x days) aggregated frame —
  * the fact-scale work is ONE groupBy producing daily sums, and every
  * correlation/wavelet step is exact BIGINT arithmetic on that
  * bounded frame, so the DuckDB oracles replay bit-for-bit.
  *
  * Integer stance: daily totals in WHOLE units (floor of the exact
  * micro-scaled sum) keep every product comfortably inside BIGINT at
  * sf0.1 (|dev| <= ~4e5, dev^2 sums ~1e13, ppm numerators ~1e19 ceil
  * — two orders from the edge); at ~100x larger daily totals the
  * same queries upgrade the quotient columns to DECIMAL(38,0).
  * Deviations are taken about the FLOOR-mean — a deterministic,
  * documented statistic (exact rational means would push products
  * past BIGINT for zero analytical gain at ppm resolution). */
object SignalQueries {

  /** Portable floor-division for SIGNED dividend / positive divisor
    * (`//`/DIV truncate toward zero — see SequenceQueries.fdiv). */
  private def fdiv(a: String, b: String, div: String): String =
    s"(CASE WHEN ($a) >= 0 THEN ($a) $div ($b)" +
      s" ELSE -(((-($a)) + ($b) - 1) $div ($b)) END)"

  private val dailySql =
    """d AS (SELECT event_type,
      |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS ed,
      |    CAST(sum(CAST(CAST(value AS DECIMAL(18,6)) * 1000000
      |      AS BIGINT)) AS BIGINT) // 1000000 AS v
      |  FROM events GROUP BY 1, 2)""".stripMargin

  /** Daily whole-unit totals per event type: ed = epoch day, v =
    * floor(sum(value)) computed through the exact micro-integer sum
    * (never a float accumulation). */
  private def daily(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"),
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("ed"))
      .agg(expr("CAST(sum(CAST(CAST(value AS DECIMAL(18,6)) * 1000000" +
        " AS BIGINT)) AS BIGINT) DIV 1000000").as("v"))

  /** Autocorrelation function of each type's daily series at row
    * lags 1..7: acf_k = sum(dev_t * dev_{t-k}) / sum(dev^2) about
    * the floor-mean, as signed floor-ppm. Row-lagged on the observed
    * day sequence (a missing calendar day collapses — with this
    * 30-day dense stream the two notions coincide). Shape: fact scan
    * -> (type, day) aggregate -> seven lag() columns on the bounded
    * frame -> one unpivoted aggregate; nothing quadratic anywhere. */
  val q285 = QueryDef.sql("q285_acf_daily",
    s"""WITH $dailySql,
       |m AS (SELECT event_type,
       |    CAST(sum(v) AS BIGINT) // CAST(count(*) AS BIGINT) AS mu
       |  FROM d GROUP BY 1),
       |c AS (SELECT d.event_type, d.ed, d.v - m.mu AS dv
       |  FROM d JOIN m ON d.event_type = m.event_type),
       |w AS (SELECT event_type, dv,
       |    lag(dv, 1) OVER o AS l1, lag(dv, 2) OVER o AS l2,
       |    lag(dv, 3) OVER o AS l3, lag(dv, 4) OVER o AS l4,
       |    lag(dv, 5) OVER o AS l5, lag(dv, 6) OVER o AS l6,
       |    lag(dv, 7) OVER o AS l7
       |  FROM c WINDOW o AS (PARTITION BY event_type ORDER BY ed)),
       |den AS (SELECT event_type, CAST(sum(dv * dv) AS BIGINT) AS den
       |  FROM c GROUP BY 1),
       |u AS (
       |  SELECT event_type, CAST(k AS BIGINT) AS lag_k,
       |    CAST(count(lv) AS BIGINT) AS n_pairs,
       |    CAST(coalesce(sum(dv * lv), 0) AS BIGINT) AS num
       |  FROM (SELECT event_type, dv, k, CASE k
       |      WHEN 1 THEN l1 WHEN 2 THEN l2 WHEN 3 THEN l3
       |      WHEN 4 THEN l4 WHEN 5 THEN l5 WHEN 6 THEN l6
       |      ELSE l7 END AS lv
       |    FROM w CROSS JOIN generate_series(1, 7) g(k))
       |  WHERE lv IS NOT NULL GROUP BY 1, 2)
       |SELECT u.event_type, u.lag_k, u.n_pairs, u.num, den.den,
       |  ${fdiv("u.num * 1000000", "den.den", "//")} AS acf_ppm
       |FROM u JOIN den ON u.event_type = den.event_type""")(
    (s, dir) => {
      val d = daily(s, dir)
      val m = d.groupBy("event_type")
        .agg(expr("CAST(sum(v) AS BIGINT) DIV CAST(count(*) AS BIGINT)")
          .as("mu"))
      val c = d.join(broadcast(m), "event_type")
        .select(col("event_type"), col("ed"),
          (col("v") - col("mu")).as("dv"))
      val o = Window.partitionBy("event_type").orderBy("ed")
      val w = c.select(col("event_type") +: col("dv") +:
        (1 to 7).map(k => lag("dv", k).over(o).as(s"l$k")): _*)
      val u = w
        .select(col("event_type"), col("dv"), expr(
          "stack(7, 1L, l1, 2L, l2, 3L, l3, 4L, l4, 5L, l5, 6L, l6," +
            " 7L, l7) AS (lag_k, lv)"))
        .where(col("lv").isNotNull)
        .groupBy("event_type", "lag_k")
        .agg(count(col("lv")).as("n_pairs"),
          coalesce(sum(col("dv") * col("lv")), lit(0L)).as("num"))
      val den = c.groupBy("event_type")
        .agg(sum(col("dv") * col("dv")).as("den"))
      u.join(broadcast(den), "event_type")
        .select(col("event_type"), col("lag_k"), col("n_pairs"),
          col("num"), col("den"),
          expr(fdiv("num * 1000000", "den", "DIV")).as("acf_ppm"))
    })

  /** Lead-lag cross-correlation between the click and purchase daily
    * streams at calendar lags -5..+5: num_l = sum over overlapping
    * days of dev_click(t) * dev_purchase(t + l). Does purchasing
    * follow clicking, and by how many days? The normalizing
    * denominators are lag-invariant, so the argmax over lags — the
    * shipped is_best flag — needs no sqrt and stays in exact BIGINT;
    * the raw numerator plus both energy denominators let any
    * downstream consumer finish the float normalization. Shape: two
    * ~30-row deviation series, an 11-row lag dimension, one
    * broadcast-scale join. */
  val q286 = QueryDef.sql("q286_lead_lag",
    """WITH d AS (SELECT event_type,
      |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS ed,
      |    CAST(sum(CAST(CAST(value AS DECIMAL(18,6)) * 1000000
      |      AS BIGINT)) AS BIGINT) // 1000000 AS v
      |  FROM events WHERE event_type IN ('click', 'purchase')
      |  GROUP BY 1, 2),
      |m AS (SELECT event_type,
      |    CAST(sum(v) AS BIGINT) // CAST(count(*) AS BIGINT) AS mu
      |  FROM d GROUP BY 1),
      |c AS (SELECT d.event_type, d.ed, d.v - m.mu AS dv
      |  FROM d JOIN m ON d.event_type = m.event_type),
      |a AS (SELECT ed, dv FROM c WHERE event_type = 'click'),
      |b AS (SELECT ed, dv FROM c WHERE event_type = 'purchase'),
      |den AS (SELECT
      |    (SELECT CAST(sum(dv * dv) AS BIGINT) FROM a) AS den_click,
      |    (SELECT CAST(sum(dv * dv) AS BIGINT) FROM b) AS den_purch),
      |j AS (SELECT CAST(g.lag_d AS BIGINT) AS lag_d,
      |    CAST(count(*) AS BIGINT) AS n_pairs,
      |    CAST(sum(a.dv * b.dv) AS BIGINT) AS num
      |  FROM generate_series(-5, 5) g(lag_d)
      |  JOIN a ON true JOIN b ON b.ed = a.ed + g.lag_d
      |  GROUP BY 1)
      |SELECT j.lag_d, j.n_pairs, j.num, den.den_click, den.den_purch,
      |  CASE WHEN j.num = (SELECT max(num) FROM j) THEN 1 ELSE 0 END
      |    AS is_best
      |FROM j, den""")(
    (s, dir) => {
      val d = daily(s, dir)
        .where(col("event_type").isin("click", "purchase"))
      val m = d.groupBy("event_type")
        .agg(expr("CAST(sum(v) AS BIGINT) DIV CAST(count(*) AS BIGINT)")
          .as("mu"))
      val c = d.join(broadcast(m), "event_type")
        .select(col("event_type"), col("ed"),
          (col("v") - col("mu")).as("dv"))
      val a = c.where(col("event_type") === "click")
        .select(col("ed").as("ed_a"), col("dv").as("dv_a"))
      val b = c.where(col("event_type") === "purchase")
        .select(col("ed").as("ed_b"), col("dv").as("dv_b"))
      val lags = s.range(-5, 6).select(col("id").as("lag_d"))
      val j = a.crossJoin(broadcast(lags))
        .join(b, col("ed_b") === col("ed_a") + col("lag_d"))
        .groupBy("lag_d").agg(count(lit(1)).as("n_pairs"),
          sum(col("dv_a") * col("dv_b")).as("num"))
      val den = a.agg(sum(col("dv_a") * col("dv_a")).as("den_click"))
        .crossJoin(b.agg(sum(col("dv_b") * col("dv_b"))
          .as("den_purch")))
      val best = j.agg(max("num").as("best_num"))
      j.crossJoin(broadcast(den)).crossJoin(broadcast(best))
        .select(col("lag_d"), col("n_pairs"), col("num"),
          col("den_click"), col("den_purch"),
          when(col("num") === col("best_num"), 1L).otherwise(0L)
            .as("is_best"))
    })

  /** Unnormalized Haar wavelet band energies of each type's daily
    * series: the first 32 observed days (zero-padded past the
    * stream's end) run 5 levels of the lifting scheme — pair sums
    * carry up, pair differences drop out — and each level ships
    * energy = sum(diff^2). Level 1 = day-to-day churn, level 5 =
    * fortnight-vs-fortnight imbalance: a multi-resolution variance
    * decomposition with NO trigonometry, every coefficient an exact
    * BIGINT (the lifting scheme omits the 1/sqrt(2) normalizers, so
    * level-L energies are 2^L x the orthonormal convention —
    * documented, deterministic). Shape: one fact-scale groupBy, then
    * 5 rounds of aggregates on <= 32 rows per type; on a 100 TB
    * corpus the same query runs per series key with the identical
    * bounded tail. */
  val q287 = QueryDef.sql("q287_haar_energy",
    """WITH d AS (SELECT event_type,
      |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS ed,
      |    CAST(sum(CAST(CAST(value AS DECIMAL(18,6)) * 1000000
      |      AS BIGINT)) AS BIGINT) // 1000000 AS v
      |  FROM events GROUP BY 1, 2),
      |r AS (SELECT event_type, v, row_number() OVER (
      |    PARTITION BY event_type ORDER BY ed) - 1 AS i
      |  FROM d),
      |idx AS (SELECT t.event_type, g.i
      |  FROM (SELECT DISTINCT event_type FROM events) t
      |  CROSS JOIN generate_series(0, 31) g(i)),
      |l0 AS (SELECT idx.event_type, idx.i,
      |    CAST(coalesce(r.v, 0) AS BIGINT) AS s
      |  FROM idx LEFT JOIN r
      |    ON idx.event_type = r.event_type AND idx.i = r.i),
      |l1 AS (SELECT event_type, i // 2 AS i,
      |    CAST(sum(CASE WHEN i % 2 = 0 THEN s ELSE -s END) AS BIGINT)
      |      AS dd,
      |    CAST(sum(s) AS BIGINT) AS s
      |  FROM l0 GROUP BY 1, 2),
      |l2 AS (SELECT event_type, i // 2 AS i,
      |    CAST(sum(CASE WHEN i % 2 = 0 THEN s ELSE -s END) AS BIGINT)
      |      AS dd,
      |    CAST(sum(s) AS BIGINT) AS s
      |  FROM l1 GROUP BY 1, 2),
      |l3 AS (SELECT event_type, i // 2 AS i,
      |    CAST(sum(CASE WHEN i % 2 = 0 THEN s ELSE -s END) AS BIGINT)
      |      AS dd,
      |    CAST(sum(s) AS BIGINT) AS s
      |  FROM l2 GROUP BY 1, 2),
      |l4 AS (SELECT event_type, i // 2 AS i,
      |    CAST(sum(CASE WHEN i % 2 = 0 THEN s ELSE -s END) AS BIGINT)
      |      AS dd,
      |    CAST(sum(s) AS BIGINT) AS s
      |  FROM l3 GROUP BY 1, 2),
      |l5 AS (SELECT event_type, i // 2 AS i,
      |    CAST(sum(CASE WHEN i % 2 = 0 THEN s ELSE -s END) AS BIGINT)
      |      AS dd,
      |    CAST(sum(s) AS BIGINT) AS s
      |  FROM l4 GROUP BY 1, 2)
      |SELECT event_type, CAST(1 AS BIGINT) AS level,
      |    CAST(sum(dd * dd) AS BIGINT) AS energy FROM l1 GROUP BY 1
      |UNION ALL SELECT event_type, 2, CAST(sum(dd * dd) AS BIGINT)
      |  FROM l2 GROUP BY 1
      |UNION ALL SELECT event_type, 3, CAST(sum(dd * dd) AS BIGINT)
      |  FROM l3 GROUP BY 1
      |UNION ALL SELECT event_type, 4, CAST(sum(dd * dd) AS BIGINT)
      |  FROM l4 GROUP BY 1
      |UNION ALL SELECT event_type, 5, CAST(sum(dd * dd) AS BIGINT)
      |  FROM l5 GROUP BY 1""")(
    (s, dir) => {
      val d = daily(s, dir)
      val r = d.select(col("event_type"), col("v"),
        (row_number().over(Window.partitionBy("event_type")
          .orderBy("ed")) - 1).cast("long").as("i"))
      val idx = d.select("event_type").distinct()
        .crossJoin(s.range(0, 32).select(col("id").as("i")))
      var cur = idx.join(r, Seq("event_type", "i"), "left")
        .select(col("event_type"), col("i"),
          coalesce(col("v"), lit(0L)).as("s"))
      val energies = (1 to 5).map { level =>
        cur = cur.groupBy(col("event_type"),
            expr("i DIV 2").as("i"))
          .agg(sum(when(col("i") % 2 === 0, col("s"))
            .otherwise(-col("s"))).as("dd"),
            sum(col("s")).as("s"))
        cur.groupBy("event_type")
          .agg(sum(col("dd") * col("dd")).as("energy"))
          .select(col("event_type"), lit(level.toLong).as("level"),
            col("energy"))
      }
      energies.reduce(_.unionByName(_))
    })

  /** Dynamic-time-warping distance between every pair of event-type
    * daily profiles (whole-unit day totals, day-ordered), next to the
    * lockstep L1 distance on the same alignment. DTW is the classic
    * "same shape, shifted phase" series distance; the lockstep L1 is
    * both the naive baseline and a provable upper bound (the diagonal
    * is one valid warping path), so dtw <= lockstep_l1 is a built-in
    * self-check. The full O(m*n) DP runs as a nested fold INSIDE one
    * row — Spark's `aggregate` higher-order function over the two
    * day arrays (~900 integer cells, all exact BIGINT, no UDF, no
    * extra shuffle) — and DuckDB replays the identical recurrence
    * with nested list_reduce. Scale shape: the fact table reduces to
    * |types| day-arrays in one aggregate; the pair frame is
    * |types|^2/2 rows of bounded arrays — at 100 TB you band the
    * pairing (q271's blocking stance) and the per-pair cost is
    * unchanged. */
  val q291 = QueryDef.sql("q291_dtw_profiles",
    """WITH d AS (SELECT event_type,
      |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS ed,
      |    CAST(sum(CAST(CAST(value AS DECIMAL(18,6)) * 1000000
      |      AS BIGINT)) AS BIGINT) // 1000000 AS v
      |  FROM events GROUP BY 1, 2),
      |s AS (SELECT event_type,
      |    list(v ORDER BY ed) AS vs FROM d GROUP BY 1),
      |p AS (SELECT a.event_type AS a_type, b.event_type AS b_type,
      |    a.vs AS la, b.vs AS lb
      |  FROM s a JOIN s b ON a.event_type < b.event_type)
      |SELECT a_type, b_type,
      |  CAST(len(la) AS BIGINT) AS n_a, CAST(len(lb) AS BIGINT) AS n_b,
      |  CAST(list_reduce(
      |    list_prepend(
      |      list_reduce(
      |        list_prepend([abs(la[1] - lb[1])],
      |          list_transform(range(2, len(lb) + 1),
      |            j -> CAST([0] AS BIGINT[]))),
      |        (acc, x) -> list_append(acc,
      |          abs(la[1] - lb[len(acc) + 1]) + acc[len(acc)])),
      |      list_transform(la[2:], v -> CAST([v] AS BIGINT[]))),
      |    (prev, x) -> list_reduce(
      |      list_prepend([abs(x[1] - lb[1]) + prev[1]],
      |        list_transform(range(2, len(lb) + 1),
      |          j -> CAST([0] AS BIGINT[]))),
      |      (acc, y) -> list_append(acc,
      |        abs(x[1] - lb[len(acc) + 1]) +
      |        least(prev[len(acc) + 1], prev[len(acc)],
      |          acc[len(acc)]))))[len(lb)] AS BIGINT) AS dtw,
      |  CAST(list_sum(list_transform(
      |    range(1, least(len(la), len(lb)) + 1),
      |    i -> abs(la[i] - lb[i]))) AS BIGINT) AS lockstep_l1
      |FROM p""")(
    (s, dir) => {
      val d = daily(s, dir)
      val ser = d.groupBy("event_type")
        .agg(transform(sort_array(collect_list(struct(col("ed"),
          col("v")))), x => x.getField("v")).as("vs"))
      val a = ser.toDF("a_type", "la")
      val b = ser.toDF("b_type", "lb")
      val p = a.join(b, col("a_type") < col("b_type"))
      // nested-fold DTW: outer over rows of A (prev = previous DP
      // row), inner over columns of B (acc = the row built so far)
      val innerRow =
        """aggregate(sequence(2, size(lb)),
          |  array(abs(V0 - element_at(lb, 1)) + element_at(prev, 1)),
          |  (acc, j) -> concat(acc, array(
          |    abs(V0 - element_at(lb, CAST(size(acc) + 1 AS INT))) +
          |    least(element_at(prev, size(acc) + 1),
          |          element_at(prev, size(acc)),
          |          element_at(acc, size(acc))))))"""
          .stripMargin
      val row1 =
        """aggregate(sequence(2, size(lb)),
          |  array(abs(element_at(la, 1) - element_at(lb, 1))),
          |  (acc, j) -> concat(acc, array(
          |    abs(element_at(la, 1) -
          |        element_at(lb, CAST(size(acc) + 1 AS INT))) +
          |    element_at(acc, size(acc)))))""".stripMargin
      val dtwExpr =
        s"""element_at(aggregate(
           |  slice(la, 2, size(la) - 1),
           |  $row1,
           |  (prev, v) -> ${innerRow.replace("V0", "v")}), size(lb))"""
          .stripMargin
      p.select(col("a_type"), col("b_type"),
        size(col("la")).cast("long").as("n_a"),
        size(col("lb")).cast("long").as("n_b"),
        expr(dtwExpr).cast("long").as("dtw"),
        expr("""aggregate(sequence(1, least(size(la), size(lb))),
          |  0L, (s, i) -> s + abs(element_at(la, i) -
          |    element_at(lb, i)))""".stripMargin).cast("long")
          .as("lockstep_l1"))
    })

  /** Exact optimal L1 k-segmentation of each type's daily series —
    * the EXACT changepoint counterpart to q204's CUSUM heuristic:
    * for k = 1..4 segments, the minimum total within-segment L1
    * deviation (about the exact lower median — all integer, so
    * optimality is bit-certified against brute force in the spec),
    * plus the optimal k=2 split day. The classic O(k*n^2) DP runs
    * IN-ROW over the collected ~30-point series (cost matrix via
    * nested transforms, each dp level one transform — the q291/q296
    * fold stance): the fact-scale work is the daily aggregate,
    * the DP is a bounded per-key tail that shards by series key at
    * any corpus size. Reading the row: the cost curve's elbow is the
    * natural segment count; c1 - c2 >> c2 - c3 flags one dominant
    * regime change at split2_ed. */
  val q299 = QueryDef.sql("q299_l1_segmentation",
    """WITH d AS (SELECT event_type,
      |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS ed,
      |    CAST(sum(CAST(CAST(value AS DECIMAL(18,6)) * 1000000
      |      AS BIGINT)) AS BIGINT) // 1000000 AS v
      |  FROM events GROUP BY 1, 2),
      |s AS (SELECT event_type, list(v ORDER BY ed) AS la,
      |    list(ed ORDER BY ed) AS eds,
      |    CAST(len(list(v ORDER BY ed)) AS BIGINT) AS n
      |  FROM d GROUP BY 1),
      |c AS (SELECT event_type, eds, n,
      |  list_transform(range(1, n + 1), i ->
      |    list_transform(range(1, n + 1), j ->
      |      CASE WHEN j >= i THEN
      |        list_sum(list_transform(la[i:j], x ->
      |          abs(x - list_sort(la[i:j])
      |            [CAST((j - i + 2) // 2 AS BIGINT)])))
      |      ELSE 0 END)) AS cost
      |  FROM s),
      |d1 AS (SELECT event_type, eds, n, cost,
      |    list_transform(range(1, n + 1), j ->
      |      CAST(cost[1][j] AS BIGINT)) AS dp1
      |  FROM c),
      |d2 AS (SELECT *, list_transform(range(1, n + 1), j ->
      |    CASE WHEN j < 2 THEN CAST(1152921504606846976 AS BIGINT)
      |    ELSE CAST(list_min(list_transform(range(2, j + 1), i ->
      |      dp1[i - 1] + cost[i][j])) AS BIGINT) END) AS dp2 FROM d1),
      |d3 AS (SELECT *, list_transform(range(1, n + 1), j ->
      |    CASE WHEN j < 3 THEN CAST(1152921504606846976 AS BIGINT)
      |    ELSE CAST(list_min(list_transform(range(2, j + 1), i ->
      |      dp2[i - 1] + cost[i][j])) AS BIGINT) END) AS dp3 FROM d2),
      |d4 AS (SELECT *, list_transform(range(1, n + 1), j ->
      |    CASE WHEN j < 4 THEN CAST(1152921504606846976 AS BIGINT)
      |    ELSE CAST(list_min(list_transform(range(2, j + 1), i ->
      |      dp3[i - 1] + cost[i][j])) AS BIGINT) END) AS dp4 FROM d3),
      |sp AS (SELECT *, list_transform(range(2, n + 1), i ->
      |    CAST(dp1[i - 1] + cost[i][n] AS BIGINT)) AS spl FROM d4)
      |SELECT event_type, n AS n_days,
      |  dp1[n] AS c1, dp2[n] AS c2, dp3[n] AS c3, dp4[n] AS c4,
      |  CAST(eds[CAST(list_position(spl, list_min(spl)) + 1
      |    AS BIGINT)] AS BIGINT) AS split2_ed
      |FROM sp""")(
    (s, dir) => {
      val d = daily(s, dir)
      val ser = d.groupBy("event_type")
        .agg(transform(sort_array(collect_list(struct(col("ed"),
            col("v")))), x => x.getField("v")).as("la"),
          sort_array(collect_list(col("ed"))).as("eds"),
          count(lit(1)).as("n"))
      val BIG = "1152921504606846976L"
      // segment cost: L1 deviation about the exact lower median
      val costExpr =
        """transform(sequence(1, CAST(n AS INT)), i ->
          |  transform(sequence(1, CAST(n AS INT)), j ->
          |    CASE WHEN j >= i THEN
          |      aggregate(slice(la, i, j - i + 1), 0L, (a, x) -> a +
          |        abs(x - element_at(sort_array(slice(la, i, j - i + 1)),
          |          CAST((j - i + 2) DIV 2 AS INT))))
          |    ELSE 0L END))""".stripMargin
      def lvl(prev: String, k: Int): String =
        s"""transform(sequence(1, CAST(n AS INT)), j ->
           |  CASE WHEN j < $k THEN $BIG
           |  ELSE array_min(transform(sequence(2, j), i ->
           |    element_at($prev, i - 1) +
           |    element_at(element_at(cost, i), j))) END)""".stripMargin
      val withDp = ser.withColumn("cost", expr(costExpr))
        .withColumn("dp1", expr(
          "transform(sequence(1, CAST(n AS INT)), j ->" +
            " element_at(element_at(cost, 1), j))"))
        .withColumn("dp2", expr(lvl("dp1", 2)))
        .withColumn("dp3", expr(lvl("dp2", 3)))
        .withColumn("dp4", expr(lvl("dp3", 4)))
        .withColumn("spl", expr(
          """transform(sequence(2, CAST(n AS INT)), i ->
            |  element_at(dp1, i - 1) +
            |  element_at(element_at(cost, i), CAST(n AS INT)))"""
            .stripMargin))
      withDp.select(col("event_type"), col("n").as("n_days"),
        expr("element_at(dp1, CAST(n AS INT))").as("c1"),
        expr("element_at(dp2, CAST(n AS INT))").as("c2"),
        expr("element_at(dp3, CAST(n AS INT))").as("c3"),
        expr("element_at(dp4, CAST(n AS INT))").as("c4"),
        expr("element_at(eds, CAST(array_position(spl," +
          " array_min(spl)) + 1 AS INT))").as("split2_ed"))
    })

  /** Exact 1-D earth mover's distance (Wasserstein-1) between the
    * click and purchase value distributions — the drift metric that
    * reports HOW FAR mass moved, where KS (q211) reports the single
    * worst CDF gap and PSI (q215) needs binning. In 1-D the EMD is
    * the area between CDFs: sum over consecutive distinct values of
    * gap * |F_a - F_b|, which on the common denominator nA*nB is the
    * exact integer sum(gap_micro * |cumA*nB - cumB*nA|) // (nA*nB) —
    * micro units end-to-end, no binning, no libm. The CDFs run over
    * the DISTINCT-value marginal table (the q210/q308 compression)
    * with the two-pass global prefix sum — no single-task window.
    * BIGINT holds to ~60k x 60k samples x the observed value range;
    * past that the numerator column upgrades to DECIMAL(38,0). */
  val q314 = QueryDef.sql("q314_emd_1d",
    """WITH v AS (SELECT event_type,
      |    CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS vm
      |  FROM events WHERE event_type IN ('click', 'purchase')),
      |g AS (SELECT vm,
      |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS ca,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
      |      END) AS BIGINT) AS cb
      |  FROM v GROUP BY 1),
      |n AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
      |    CAST(sum(cb) AS BIGINT) AS nb FROM g),
      |c AS (SELECT vm,
      |    CAST(sum(ca) OVER (ORDER BY vm ROWS UNBOUNDED PRECEDING)
      |      AS BIGINT) AS cuma,
      |    CAST(sum(cb) OVER (ORDER BY vm ROWS UNBOUNDED PRECEDING)
      |      AS BIGINT) AS cumb,
      |    lead(vm) OVER (ORDER BY vm) AS nxt
      |  FROM g),
      |t AS (SELECT CAST(sum((nxt - vm) *
      |      abs(cuma * n.nb - cumb * n.na)) AS BIGINT) AS num
      |  FROM c, n WHERE nxt IS NOT NULL)
      |SELECT n.na AS n_click, n.nb AS n_purchase,
      |  t.num // (n.na * n.nb) AS emd_micro
      |FROM t, n""")(
    (s, dir) => {
      import graft.operators.Rank
      val v = Tables.events(s, dir)
        .where(col("event_type").isin("click", "purchase"))
        .select(col("event_type"),
          (col("value").cast("decimal(18,6)") * 1000000).cast("long")
            .as("vm"))
      val g = v.groupBy("vm").agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("ca"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("cb"))
      val n = g.agg(sum("ca").as("na"), sum("cb").as("nb"))
      // two-pass prefix sums + rank for the distributed lead self-join,
      // all three fused onto ONE range exchange (was three chained
      // globalPrefixSum/globalRank invocations = three of everything)
      val r = Rank.globalOrderStats(g,
        Seq("cuma" -> "ca", "cumb" -> "cb"), Some("rk"), col("vm"))
      val nxt = r.select((col("rk") - 1).as("rk"), col("vm").as("nxt"))
      val t = r.join(nxt, "rk")
        .crossJoin(broadcast(n))
        .agg(sum((col("nxt") - col("vm")) *
          abs(col("cuma") * col("nb") - col("cumb") * col("na")))
          .as("num"))
      t.crossJoin(broadcast(n))
        .select(col("na").as("n_click"), col("nb").as("n_purchase"),
          expr("num DIV (na * nb)").as("emd_micro"))
    })

  /** Pairwise 1-D Wasserstein distance MATRIX over all event-type
    * pairs — q314's exact CDF-area machinery generalized to the
    * 10-pair sweep that feeds distribution clustering ("which event
    * types have interchangeable value profiles?"). The windows here
    * are PARTITIONED BY PAIR (each pair's distinct-value grid is its
    * own partition) — the shape that sweeps many pairs in one pass,
    * where q314's single giant comparison uses the two-pass global
    * prefix sum. Same exact integer arithmetic, same micro units; a
    * symmetric distance table out. */
  val q315 = QueryDef.sql("q315_emd_matrix",
    """WITH ty AS (SELECT DISTINCT event_type FROM events),
      |pr AS (SELECT a.event_type AS ta, b.event_type AS tb
      |  FROM ty a JOIN ty b ON a.event_type < b.event_type),
      |v AS (SELECT pr.ta, pr.tb, e.event_type,
      |    CAST(CAST(e.value AS DECIMAL(18,6)) * 1000000 AS BIGINT)
      |      AS vm
      |  FROM events e JOIN pr
      |    ON e.event_type = pr.ta OR e.event_type = pr.tb),
      |g AS (SELECT ta, tb, vm,
      |    CAST(sum(CASE WHEN event_type = ta THEN 1 ELSE 0 END)
      |      AS BIGINT) AS ca,
      |    CAST(sum(CASE WHEN event_type = tb THEN 1 ELSE 0 END)
      |      AS BIGINT) AS cb
      |  FROM v GROUP BY 1, 2, 3),
      |n AS (SELECT ta, tb, CAST(sum(ca) AS BIGINT) AS na,
      |    CAST(sum(cb) AS BIGINT) AS nb FROM g GROUP BY 1, 2),
      |c AS (SELECT ta, tb, vm,
      |    CAST(sum(ca) OVER o AS BIGINT) AS cuma,
      |    CAST(sum(cb) OVER o AS BIGINT) AS cumb,
      |    lead(vm) OVER (PARTITION BY ta, tb ORDER BY vm) AS nxt
      |  FROM g WINDOW o AS (PARTITION BY ta, tb ORDER BY vm
      |    ROWS UNBOUNDED PRECEDING)),
      |t AS (SELECT c.ta, c.tb, CAST(sum((c.nxt - c.vm) *
      |      abs(c.cuma * n.nb - c.cumb * n.na)) AS BIGINT) AS num
      |  FROM c JOIN n ON c.ta = n.ta AND c.tb = n.tb
      |  WHERE c.nxt IS NOT NULL GROUP BY 1, 2)
      |SELECT t.ta, t.tb, n.na, n.nb,
      |  t.num // (n.na * n.nb) AS emd_micro
      |FROM t JOIN n ON t.ta = n.ta AND t.tb = n.tb""")(
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val ty = ev.select("event_type").distinct()
      val pr = ty.toDF("ta").join(ty.toDF("tb"),
        col("ta") < col("tb"))
      val v = ev.select(col("event_type"),
          (col("value").cast("decimal(18,6)") * 1000000).cast("long")
            .as("vm"))
        .join(broadcast(pr),
          col("event_type") === col("ta") ||
            col("event_type") === col("tb"))
      val g = v.groupBy("ta", "tb", "vm").agg(
        sum(when(col("event_type") === col("ta"), 1L).otherwise(0L))
          .as("ca"),
        sum(when(col("event_type") === col("tb"), 1L).otherwise(0L))
          .as("cb"))
      val n = g.groupBy("ta", "tb")
        .agg(sum("ca").as("na"), sum("cb").as("nb"))
      val o = Window.partitionBy("ta", "tb").orderBy("vm")
      val c = g.select(col("ta"), col("tb"), col("vm"),
        sum("ca").over(o.rowsBetween(Window.unboundedPreceding, 0))
          .as("cuma"),
        sum("cb").over(o.rowsBetween(Window.unboundedPreceding, 0))
          .as("cumb"),
        lead("vm", 1).over(o).as("nxt"))
      val t = c.where(col("nxt").isNotNull)
        .join(broadcast(n), Seq("ta", "tb"))
        .groupBy("ta", "tb")
        .agg(sum((col("nxt") - col("vm")) *
          abs(col("cuma") * col("nb") - col("cumb") * col("na")))
          .as("num"))
      t.join(broadcast(n), Seq("ta", "tb"))
        .select(col("ta"), col("tb"), col("na"), col("nb"),
          expr("num DIV (na * nb)").as("emd_micro"))
    })

  def all: Seq[QueryDef] = Seq(q285, q286, q287, q291, q299, q314, q315)
}
