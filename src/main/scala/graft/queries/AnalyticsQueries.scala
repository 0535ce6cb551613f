package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** General-analytics operators beyond the reference's surface: grouping
  * sets (rollup/cube), pivot-style conditional aggregation, exact
  * percentiles. Each with a DuckDB oracle. */
object AnalyticsQueries {
  private val D182 = DecimalType(18, 2)

  /** ROLLUP hierarchy totals (returnflag → linestatus). */
  val q40 = QueryDef.sql("q40_rollup",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""")(
    (s, dir) => Tables.lineitem(s, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(sum(col("l_quantity").cast(D182)).cast("double").as("sum_qty"),
        count(lit(1)).as("n")))

  /** CUBE over two order dimensions. */
  val q41 = QueryDef.sql("q41_cube",
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |  COUNT(*) AS n
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""")(
    (s, dir) => Tables.orders(s, dir)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(sum(col("o_totalprice").cast(D182)).cast("double").as("sum_price"),
        count(lit(1)).as("n")))

  /** Pivot: event counts per user fanned out by event_type. Expressed
    * as conditional aggregation so the oracle is plain ANSI SQL (the
    * Spark side uses the real pivot operator over a fixed value list —
    * fixed, so no extra values-discovery job runs). */
  val q42 = QueryDef.sql("q42_pivot",
    """SELECT user_id,
      |  COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
      |  COUNT(*) FILTER (WHERE event_type = 'error')    AS error,
      |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |  COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
      |  COUNT(*) FILTER (WHERE event_type = 'view')     AS view
      |FROM events GROUP BY user_id""")(
    (s, dir) => Tables.events(s, dir)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("click", "error", "purchase", "signup", "view")))

  /** Exact interpolated percentiles per group (Spark `percentile` ⇔
    * DuckDB `quantile_cont`, both linear interpolation). */
  val q43 = QueryDef.sql("q43_percentiles",
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.25) AS p25,
      |  quantile_cont(l_quantity, 0.5)  AS p50,
      |  quantile_cont(l_quantity, 0.9)  AS p90
      |FROM lineitem GROUP BY l_returnflag""")(
    (s, dir) => Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.25)").as("p25"),
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.9)").as("p90")))

  /** Sketch aggregates: HyperLogLog++ distinct counts and quantile
    * sketches — sketch internals differ per engine, so no cross-engine
    * oracle exists and this variant is not in the driver catalog:
    * AnalyticsSpec asserts accuracy vs exact, and the deterministic
    * md5-register twin (q51) carries the hash-checked oracle for the
    * mergeable-sketch semantics. */
  val q46 = QueryDef.rowsOnly("q46_sketches")(
    (s, dir) => Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_orderkey"), 0.01).as("approx_orders"),
        expr("approx_percentile(l_extendedprice, array(0.5, 0.99), 1000)")
          .as("pq"))
      .select(col("l_returnflag"), col("approx_orders"),
        element_at(col("pq"), 1).as("p50"),
        element_at(col("pq"), 2).as("p99")))

  /** Deterministic portable sketches — the oracle-checkable twin of
    * q46: md5-based HyperLogLog (raw estimator, exact integer register
    * sum — see [[graft.operators.Sketches]]) and bottom-k-by-hash
    * quantile estimation. Every arithmetic step is either exact integer
    * or IEEE exact-rounded on identical literals, so DuckDB replays the
    * estimates bit-for-bit. */
  val q51 = {
    import graft.operators.Sketches
    val rhoCase = Sketches.rhoSql(s"(h & ${(1L << Sketches.RemBits) - 1})")
    val m = Sketches.Buckets
    val ew = Sketches.EmptyWeight
    QueryDef.sql("q51_sketches_portable",
      s"""WITH h AS (
         |  SELECT l_returnflag,
         |    ('0x' || substring(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))::BIGINT AS h
         |  FROM lineitem),
         |reg AS (SELECT l_returnflag, h >> ${Sketches.RemBits} AS bucket,
         |    max($rhoCase) AS rho
         |  FROM h GROUP BY l_returnflag, h >> ${Sketches.RemBits}),
         |agg AS (SELECT l_returnflag, count(*) AS present,
         |    SUM(1::BIGINT << (${Sketches.RemBits + 1} - rho)) AS s_present
         |  FROM reg GROUP BY l_returnflag),
         |hll AS (SELECT l_returnflag,
         |    ${Sketches.alphaSql}
         |      * ${m.toDouble}::DOUBLE * ${m.toDouble}::DOUBLE * ${ew.toDouble}::DOUBLE
         |      / CAST(s_present + ($m - present) * $ew AS DOUBLE)
         |      AS hll_orders
         |  FROM agg),
         |smp AS (SELECT l_returnflag, l_extendedprice,
         |    row_number() OVER (PARTITION BY l_returnflag ORDER BY
         |      ('0x' || substring(md5(CAST(l_orderkey AS VARCHAR) || '|' ||
         |        CAST(l_linenumber AS VARCHAR)), 1, 15))::BIGINT,
         |      l_extendedprice) AS rn
         |  FROM lineitem),
         |q AS (SELECT l_returnflag,
         |    quantile_cont(l_extendedprice, 0.5)  AS sample_p50,
         |    quantile_cont(l_extendedprice, 0.99) AS sample_p99
         |  FROM smp WHERE rn <= 500 GROUP BY l_returnflag)
         |SELECT hll.l_returnflag, hll_orders, sample_p50, sample_p99
         |FROM hll JOIN q ON hll.l_returnflag = q.l_returnflag""")(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val hll = Sketches.hllDistinct(li, "l_returnflag", "l_orderkey")
          .withColumnRenamed("hll_l_orderkey", "hll_orders")
        val sample = Sketches.bottomKValues(li, "l_returnflag",
          concat(col("l_orderkey").cast("string"), lit("|"),
            col("l_linenumber").cast("string")),
          col("l_extendedprice"), k = 500)
          .groupBy("l_returnflag")
          .agg(expr("percentile(value, 0.5)").as("sample_p50"),
            expr("percentile(value, 0.99)").as("sample_p99"))
        hll.join(sample, "l_returnflag")
      })
  }

  /** Two-phase salted aggregation over a LOW-CARDINALITY (= skewed by
    * construction) grouping key: phase 1 aggregates (key, salt) so a hot
    * key spreads over `salt` reducers, phase 2 merges the partials.
    * Decimal sums keep both phases order-exact, so the result is
    * bit-identical to the direct GROUP BY the oracle runs. The same
    * shape AQE's skew mitigation cannot reach: AQE splits skewed JOIN
    * partitions, not skewed aggregation keys. */
  val q69 = QueryDef.sql("q69_skew_salted_agg",
    """SELECT event_type,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_v,
      |  COUNT(*) AS cnt
      |FROM events GROUP BY event_type""")(
    (s, dir) => graft.operators.Skew.saltedSumCount(
        Tables.events(s, dir).select(col("event_type"),
          col("value").cast(DecimalType(18, 6)).as("v")),
        key = "event_type", valueCol = "v", salt = 16)
      .select(col("event_type"),
        col("sum_v").cast("double").as("sum_v"), col("cnt")))

  /** Interval-overlap self-join with the key-shape-driven plan choice
    * ([[graft.operators.IntervalJoin.overlapsSelfAuto]]): a sampled
    * max-per-key estimate picks the naive blocked join on selective
    * keys (as here — (supplier, part) holds ~24 rows each, where the
    * Δ-explode is pure overhead) and the Δ-bucketed form on hot keys,
    * where n² per key becomes Σ adjacent-bucket² (measured 97 s → 18 s
    * in SCALING.md). Both forms are row-identical and share this
    * oracle; q70's plan is the AUTO decision, spec-pinned both ways. */
  val q70 = QueryDef.sql("q70_interval_overlap",
    """WITH iv AS (SELECT l_orderkey, l_linenumber, l_suppkey, l_partkey,
      |    l_shipdate AS s,
      |    l_shipdate + INTERVAL (CAST(l_quantity AS INT)) DAY AS e
      |  FROM lineitem)
      |SELECT a.l_suppkey, a.l_partkey,
      |  a.l_orderkey AS l_orderkey_1, a.l_linenumber AS l_linenumber_1,
      |  b.l_orderkey AS l_orderkey_2, b.l_linenumber AS l_linenumber_2,
      |  date_diff('day', greatest(a.s, b.s), least(a.e, b.e)) AS overlap_days
      |FROM iv a JOIN iv b
      |  ON a.l_suppkey = b.l_suppkey AND a.l_partkey = b.l_partkey
      |  AND (a.s < b.s OR (a.s = b.s AND
      |       (a.l_orderkey, a.l_linenumber) < (b.l_orderkey, b.l_linenumber)))
      |  AND a.s <= b.e AND b.s <= a.e""")(
    (s, dir) => {
      val iv = Tables.lineitem(s, dir).select(
        col("l_suppkey"), col("l_partkey"),
        col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate").as("ship_s"),
        expr("timestampadd(DAY, CAST(l_quantity AS INT), l_shipdate)")
          .as("ship_e"))
      graft.operators.IntervalJoin.overlapsSelfAuto(iv,
          keyCols = Seq("l_suppkey", "l_partkey"),
          idCols = Seq("l_orderkey", "l_linenumber"),
          startCol = "ship_s", endCol = "ship_e",
          maxLenUs = 50L * 86400L * 1000000L)
        .withColumn("overlap_days",
          datediff(least(col("ship_e_1"), col("ship_e_2")).cast("date"),
            greatest(col("ship_s_1"), col("ship_s_2")).cast("date")))
        .select("l_suppkey", "l_partkey", "l_orderkey_1", "l_linenumber_1",
          "l_orderkey_2", "l_linenumber_2", "overlap_days")
    })

  /** Semi-structured extraction: schema-on-read over the JSON `props`
    * column (`from_json` with an explicit schema ⇔ DuckDB json_extract),
    * then a typed aggregation. */
  val q47 = QueryDef.sql("q47_json_extract",
    """SELECT event_type,
      |  CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k,
      |  COUNT(*) FILTER (WHERE json_extract(props, '$.k') IS NULL) AS n_null
      |FROM events GROUP BY event_type""")(
    (s, dir) => Tables.events(s, dir)
      .withColumn("k", from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")).getField("k"))
      .groupBy("event_type")
      .agg(sum(col("k")).as("sum_k"), max(col("k")).as("max_k"),
        count(when(col("k").isNull, 1)).as("n_null")))

  /** Deterministic leakage-safe train/val/test split (80/10/10 by
    * user_id hash — every event of a user lands in one split; see
    * [[graft.operators.Split]]). Pure hash arithmetic, full oracle. */
  val q52 = {
    import graft.operators.Split
    val b = Split.hashBucketSql("user_id", 100)
    QueryDef.sql("q52_hash_split",
      s"""SELECT CASE WHEN $b < 80 THEN 'train'
         |            WHEN $b < 90 THEN 'val' ELSE 'test' END AS split,
         |  COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users
         |FROM events GROUP BY 1""")(
      (s, dir) => Tables.events(s, dir)
        .withColumn("split", Split.splitLabel(col("user_id"),
          Seq("train" -> 80, "val" -> 90, "test" -> 100)))
        .groupBy("split")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users")))
  }

  /** Deterministic STRATIFIED sampling: per-language keep rates (en is
    * overrepresented in the corpus, so it is downsampled hardest) where
    * every keep decision is a pure hash of the key — reproducible across
    * runs, engines and cluster sizes, and monotone in the rate (a kept
    * row stays kept when the rate grows — backfill-stable), unlike
    * `df.sample` whose selection depends on seed AND partitioning. The
    * id-sum per stratum makes the oracle verify WHICH rows were kept,
    * not just how many. See [[graft.operators.Split.sampleKeep]]. */
  val q58 = {
    import graft.operators.Split
    val b = Split.hashBucketSql("doc_id", 1000000)
    QueryDef.sql("q58_stratified_sample",
      s"""WITH r AS (SELECT lang, doc_id,
         |  CASE lang WHEN 'en' THEN 250000 WHEN 'zh' THEN 500000
         |       ELSE 1000000 END AS rate
         |  FROM documents)
         |SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(doc_id) AS BIGINT) AS id_sum
         |FROM r WHERE $b < rate GROUP BY lang""")(
      (s, dir) => {
        val rate = when(col("lang") === "en", 250000)
          .when(col("lang") === "zh", 500000).otherwise(1000000)
        Tables.documents(s, dir)
          .where(Split.sampleKeep(col("doc_id"), rate))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))
      })
  }

  /** Per-group z-score anomaly flags — the analytics shape behind
    * outlier screens (|z| ≥ 3 events per type). Moments are EXACT
    * decimal sums (sum, sum-of-squares) so the 5-row stats frame is
    * bit-identical across engines; mean/std/z then run in IEEE doubles
    * on identical operands — deterministic, oracle-replayable. Scale
    * shape: one partial-aggregated groupBy to a tiny stats frame, a
    * broadcast join back, and a per-row filter — no window, no global
    * sort; the only full-data exchange is the map-side-reduced
    * aggregation. */
  val q72 = QueryDef.sql("q72_anomaly_zscore",
    """WITH t AS (SELECT event_id, event_type,
      |    CAST(value AS DECIMAL(18,6)) AS v FROM events),
      |st AS (SELECT event_type, COUNT(*) AS n,
      |    SUM(v) AS s, SUM(v*v) AS s2 FROM t GROUP BY event_type),
      |m AS (SELECT event_type,
      |    CAST(s AS DOUBLE) / n AS mean,
      |    sqrt(greatest(CAST(s2 AS DOUBLE) / n
      |      - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n),
      |      0.0::DOUBLE)) AS std
      |  FROM st)
      |SELECT t.event_id, t.event_type, CAST(t.v AS DOUBLE) AS value,
      |  round((CAST(t.v AS DOUBLE) - m.mean) / m.std, 6) AS z
      |FROM t JOIN m USING (event_type)
      |WHERE m.std > 0
      |  AND abs((CAST(t.v AS DOUBLE) - m.mean) / m.std) >= 3.0""")(
    (s, dir) => {
      val t = Tables.events(s, dir).select(col("event_id"), col("event_type"),
        col("value").cast(DecimalType(18, 6)).as("v"))
      val mean = col("s").cast("double") / col("n")
      val stats = t.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
          sum(col("v") * col("v")).as("s2"))
        .select(col("event_type"), mean.as("mean"),
          sqrt(greatest(col("s2").cast("double") / col("n") - mean * mean,
            lit(0.0))).as("std"))
      val z = (col("v").cast("double") - col("mean")) / col("std")
      t.join(broadcast(stats), "event_type")
        .where(col("std") > 0 && abs(z) >= 3.0)
        .select(col("event_id"), col("event_type"),
          col("v").cast("double").as("value"), round(z, 6).as("z"))
    })

  /** Approximate distinct users per tumbling hour — the sketch-per-
    * window shape every 100 TB stream dashboard runs (an exact
    * count-distinct per window shuffles every (window, user) pair;
    * the HLL reduces map-side to windows × 256 registers). Portable
    * md5-HLL ([[graft.operators.Sketches]]) so the estimate itself
    * hash-matches the oracle, composed with q22's window bucketing. */
  val q78 = {
    import graft.operators.Sketches
    val rhoCase = Sketches.rhoSql(s"(h & ${(1L << Sketches.RemBits) - 1})")
    val m = Sketches.Buckets
    val ew = Sketches.EmptyWeight
    QueryDef.sql("q78_window_distinct_sketch",
      s"""WITH e AS (SELECT
         |    CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT)
         |      AS win_start,
         |    user_id FROM events),
         |h AS (SELECT win_start,
         |    ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
         |  FROM e),
         |reg AS (SELECT win_start, h >> ${Sketches.RemBits} AS bucket,
         |    max($rhoCase) AS rho
         |  FROM h GROUP BY win_start, h >> ${Sketches.RemBits}),
         |agg AS (SELECT win_start, count(*) AS present,
         |    SUM(1::BIGINT << (${Sketches.RemBits + 1} - rho)) AS s_present
         |  FROM reg GROUP BY win_start)
         |SELECT win_start,
         |  ${Sketches.alphaSql}
         |    * ${m.toDouble}::DOUBLE * ${m.toDouble}::DOUBLE * ${ew.toDouble}::DOUBLE
         |    / CAST(s_present + ($m - present) * $ew AS DOUBLE)
         |    AS hll_users
         |FROM agg""")(
      (s, dir) => Sketches.hllDistinct(
          Tables.events(s, dir)
            .select(unix_seconds(window(col("ts"), "1 hour").getField("start"))
              .as("win_start"), col("user_id")),
          "win_start", "user_id")
        .withColumnRenamed("hll_user_id", "hll_users"))
  }

  /** Retention cohorts: users grouped by first-seen day, activity
    * counted per (cohort, day offset) — the classic warehouse retention
    * matrix. Integer-microsecond day bucketing (never float epoch), so
    * the matrix is exact on both engines. Scale shape: one user-keyed
    * aggregation for first-seen, one distinct on (user, day), one
    * cohort-keyed count — all map-side combined, no window, no
    * self-join. */
  val q79 = QueryDef.sql("q79_retention_cohorts",
    """WITH ev AS (SELECT user_id,
      |    CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day FROM events),
      |fu AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id),
      |act AS (SELECT DISTINCT user_id, day FROM ev)
      |SELECT f.cohort_day, CAST(a.day - f.cohort_day AS INT) AS day_offset,
      |  count(*) AS active_users
      |FROM act a JOIN fu f USING (user_id)
      |GROUP BY 1, 2""")(
    (s, dir) => {
      // floor division (pmod form), not DIV: DuckDB's // floors while
      // DIV truncates toward zero — they disagree on pre-1970 epochs
      val ev = Tables.events(s, dir).select(col("user_id"),
        expr("(unix_micros(ts) - pmod(unix_micros(ts), 86400000000L))" +
          " DIV 86400000000L").as("day"))
      val fu = ev.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
      ev.distinct().join(fu, "user_id")
        .groupBy(col("cohort_day"),
          (col("day") - col("cohort_day")).cast("int").as("day_offset"))
        .agg(count(lit(1)).as("active_users"))
    })

  /** GROUPING SETS beyond rollup/cube's fixed lattices: an explicit
    * set list — here both one-dimension margins plus the grand total,
    * skipping the (flag, status) detail level a rollup would force.
    * `grouping()` flags disambiguate a grouped-out column from a data
    * NULL, on both engines. */
  val q81 = QueryDef.sql("q81_grouping_sets",
    """SELECT l_returnflag, l_linestatus,
      |  GROUPING(l_returnflag) AS g_flag, GROUPING(l_linestatus) AS g_status,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""")(
    (s, dir) => Tables.lineitem(s, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping(col("l_returnflag")).cast("long").as("g_flag"),
        grouping(col("l_linestatus")).cast("long").as("g_status"),
        sum(col("l_quantity").cast(D182)).cast("double").as("sum_qty"),
        count(lit(1)).as("n")))

  /** Exact triangle count over the parts-bought-together graph (parts
    * co-occurring in an order), via degree-oriented wedge closing —
    * [[graft.operators.Graph.triangleCount]]; the oracle counts the
    * same triangles with the naive a<b<c triple join (orientation
    * never changes the count). */
  val q83 = QueryDef.sql("q83_triangle_count",
    """WITH e AS (
      |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      |verts AS (SELECT count(DISTINCT x) AS n_vertices FROM (
      |  SELECT u AS x FROM e UNION ALL SELECT v FROM e)),
      |edges AS (SELECT count(*) AS n_edges FROM e),
      |tri AS (SELECT count(*) AS n_triangles
      |  FROM e e1 JOIN e e2 ON e2.u = e1.v
      |            JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
      |SELECT n_vertices, n_edges, n_triangles FROM verts, edges, tri""")(
    (s, dir) => {
      // edge derivation via the in-row pair-expansion pattern (one
      // groupBy + fused PairArray), not a lineitem self-join — the SMJ
      // sorts the fact table twice for pairs a per-order array expands
      // in-row (the q29/q30 posting-list trick; measured 3.7 s → 1.5 s)
      val li = Tables.lineitem(s, dir).select("l_orderkey", "l_partkey")
      val edges = li.groupBy("l_orderkey")
        .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
        .where(size(col("parts")) >= 2)
        .select(explode(graft.functions.PairExpressions
          .pairArray(col("parts"))).as("p"))
        .select(col("p.id1").as("u"), col("p.id2").as("v"))
      graft.operators.Graph.triangleCount(edges, "u", "v")
    })

  /** Deterministic weighted systematic sample (~50 docs by n_chars) —
    * [[graft.operators.Sampling.systematicSample]]'s distributed prefix
    * sum; the oracle replays the line layout with a window cumsum.
    * Exact integer selection arithmetic on both engines. */
  val q84 = QueryDef.sql("q84_weighted_sample",
    """WITH w AS (SELECT doc_id, n_chars FROM documents WHERE n_chars > 0),
      |t AS (SELECT sum(n_chars) // 50 AS step FROM w),
      |c AS (SELECT doc_id, n_chars,
      |        sum(n_chars) OVER (ORDER BY doc_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |      FROM w)
      |SELECT doc_id, n_chars, CAST(cum AS BIGINT) AS cum
      |FROM c, t WHERE cum // step > (cum - n_chars) // step""")(
    (s, dir) => graft.operators.Sampling.systematicSample(
      Tables.documents(s, dir), "doc_id", "n_chars", k = 50))

  /** Column profiling of `orders` — one pass, one row per column
    * ([[graft.operators.Profile.columnProfile]]); numeric/timestamp
    * min-max through the DOUBLE channel (timestamps as exact integer
    * epoch-µs), strings through the VARCHAR channel. */
  val q85 = {
    def one(c: String, numExpr: String, strCol: Boolean) = {
      val minN = if (numExpr.isEmpty) "CAST(NULL AS DOUBLE)"
                 else s"CAST(min($numExpr) AS DOUBLE)"
      val maxN = if (numExpr.isEmpty) "CAST(NULL AS DOUBLE)"
                 else s"CAST(max($numExpr) AS DOUBLE)"
      val minS = if (strCol) s"min($c)" else "CAST(NULL AS VARCHAR)"
      val maxS = if (strCol) s"max($c)" else "CAST(NULL AS VARCHAR)"
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |  count(*) - count($c) AS n_nulls,
         |  count(DISTINCT $c) AS n_distinct,
         |  $minN AS min_num, $maxN AS max_num,
         |  $minS AS min_str, $maxS AS max_str FROM orders""".stripMargin
    }
    QueryDef.sql("q85_profile",
      Seq(
        one("o_orderkey", "o_orderkey", strCol = false),
        one("o_custkey", "o_custkey", strCol = false),
        one("o_orderstatus", "", strCol = true),
        one("o_totalprice", "o_totalprice", strCol = false),
        one("o_orderdate", "epoch_us(o_orderdate)", strCol = false),
        one("o_orderpriority", "", strCol = true)).mkString("\nUNION ALL\n"))(
      (s, dir) => graft.operators.Profile.columnProfile(Tables.orders(s, dir)))
  }

  /** Deterministic global shuffle for training export: every doc ranked
    * by (md5(doc_id), doc_id) — the reproducible pseudo-random order
    * every epoch/shard reads identically — via
    * [[graft.operators.Rank.globalRank]]'s two-pass distributed
    * row-numbering (never a single-partition window; plan-guarded). */
  val q89 = QueryDef.sql("q89_global_shuffle",
    """SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS skey,
      |  CAST(row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
      |    AS BIGINT) AS rank
      |FROM documents""")(
    (s, dir) => graft.operators.Rank.globalRank(
      Tables.documents(s, dir)
        .select(col("doc_id"),
          md5(col("doc_id").cast("string")).as("skey")),
      "rank", col("skey"), col("doc_id")))

  /** Mixture allocation: apportion k = 1000 sampling slots across the
    * corpus's `source` domains proportionally to their total weight
    * (n_chars), by largest-remainder (Hamilton) apportionment — the
    * deterministic integer answer to "how many documents does each
    * source contribute to the mixture". Quotas and remainders are exact
    * BIGINT arithmetic; the remainder-ranking window runs over
    * #sources rows (domain-bounded, not data-bounded). */
  val q90 = QueryDef.sql("q90_mixture_alloc",
    """WITH w AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS weight
      |           FROM documents GROUP BY source),
      |t AS (SELECT CAST(sum(weight) AS BIGINT) AS tot FROM w),
      |q AS (SELECT source, weight,
      |        (weight * 1000) // tot AS base,
      |        (weight * 1000) % tot AS rem FROM w, t),
      |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rr
      |      FROM q),
      |s AS (SELECT CAST(sum(base) AS BIGINT) AS sb FROM q)
      |SELECT source, weight,
      |  CAST(base + CASE WHEN rr <= 1000 - sb THEN 1 ELSE 0 END AS BIGINT)
      |    AS slots
      |FROM r, s""")(
    (s, dir) => {
      val w = Tables.documents(s, dir).groupBy("source")
        .agg(sum(col("n_chars")).as("weight"))
      val t = w.agg(sum(col("weight")).as("tot"))
      val q = w.crossJoin(t)
        .select(col("source"), col("weight"),
          expr("(weight * 1000) DIV tot").as("base"),
          expr("(weight * 1000) % tot").as("rem"))
      val r = q.withColumn("rr",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("rem").desc, col("source"))))
      val sb = q.agg(sum(col("base")).as("sb"))
      r.crossJoin(sb)
        .select(col("source"), col("weight"),
          (col("base") + when(col("rr") <= lit(1000) - col("sb"), 1L)
            .otherwise(0L)).as("slots"))
    })

  /** Fixed-width histogram (32 bins) of o_totalprice with data-driven
    * bounds: two passes — a one-row min/max aggregate rides in as a
    * cross join (no driver action), then exact integer bin assignment
    * and one map-side-combined count. The at-scale shape of every
    * distribution dashboard; all arithmetic exact (prices are cents-
    * scaled, so ×100 makes the bin math pure BIGINT). */
  val q91 = QueryDef.sql("q91_histogram",
    """WITH b AS (SELECT CAST(round(min(o_totalprice) * 100) AS BIGINT) AS lo,
      |                  CAST(round(max(o_totalprice) * 100) AS BIGINT) AS hi
      |           FROM orders),
      |bins AS (SELECT ((CAST(round(o_totalprice * 100) AS BIGINT) - lo) * 32)
      |           // (hi - lo + 1) AS bin
      |         FROM orders, b)
      |SELECT bin, count(*) AS n FROM bins GROUP BY bin""")(
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val b = o.agg(
        round(min(col("o_totalprice")) * 100).cast("long").as("lo"),
        round(max(col("o_totalprice")) * 100).cast("long").as("hi"))
      o.crossJoin(b)
        .select(expr(
          "((CAST(round(o_totalprice * 100) AS BIGINT) - lo) * 32)" +
            " DIV (hi - lo + 1)").as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("n"))
    })

  /** Functional-dependency audit
    * ([[graft.operators.Profile.fdViolations]]): the parts supplied by
    * more than one supplier — the "does this claimed dependency
    * actually hold" check run against every intake table (here the FD
    * l_partkey → l_suppkey a single-sourced catalog would claim); the
    * violating keys and their spread are the data-quality report. One
    * map-side-combined aggregation; the filter prunes to violations
    * only. */
  val q96 = QueryDef.sql("q96_fd_violations",
    """SELECT l_partkey,
      |  count(DISTINCT l_suppkey) AS n_distinct_rhs,
      |  count(*) AS n_rows
      |FROM lineitem GROUP BY l_partkey
      |HAVING count(DISTINCT l_suppkey) > 1""")(
    (s, dir) => graft.operators.Profile.fdViolations(
      Tables.lineitem(s, dir), Seq("l_partkey"), "l_suppkey"))

  /** Degree distribution of the co-purchase graph
    * ([[graft.operators.Graph.degreeHistogram]]) — the skew diagnostic
    * read before any graph workload (it is exactly the Σ deg² the
    * triangle orientation caps). Edges derive in-row per order (q83's
    * pattern); two map-side-combined aggregations after that. */
  val q99 = QueryDef.sql("q99_degree_hist",
    """WITH e AS (
      |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      |d AS (SELECT x, count(*) AS degree FROM (
      |  SELECT u AS x FROM e UNION ALL SELECT v FROM e) GROUP BY x)
      |SELECT degree, count(*) AS n_nodes FROM d GROUP BY degree""")(
    (s, dir) => {
      val li = Tables.lineitem(s, dir).select("l_orderkey", "l_partkey")
      val edges = li.groupBy("l_orderkey")
        .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
        .where(size(col("parts")) >= 2)
        .select(explode(graft.functions.PairExpressions
          .pairArray(col("parts"))).as("p"))
        .select(col("p.id1").as("u"), col("p.id2").as("v"))
      graft.operators.Graph.degreeHistogram(edges, "u", "v")
    })

  /** Mixture DRAW ([[graft.operators.Sampling.mixtureDraw]]):
    * materialize the training mixture q90 only allocates — 100 slots
    * apportioned across sources by total n_chars (largest remainder),
    * each source's quota drawn in deterministic (md5(id), id) hash
    * order. Allocation + pick replay exactly in the oracle (the q90 and
    * q92 machinery composed). */
  val q101 = QueryDef.sql("q101_mixture_draw",
    """WITH w AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS weight
      |           FROM documents GROUP BY source),
      |t AS (SELECT CAST(sum(weight) AS BIGINT) AS tot FROM w),
      |q AS (SELECT source, weight,
      |        (weight * 100) // tot AS base,
      |        (weight * 100) % tot AS rem FROM w, t),
      |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rr
      |      FROM q),
      |s AS (SELECT CAST(sum(base) AS BIGINT) AS sb FROM q),
      |alloc AS (SELECT source,
      |    CAST(base + CASE WHEN rr <= 100 - sb THEN 1 ELSE 0 END AS BIGINT)
      |      AS slots FROM r, s),
      |rk AS (SELECT doc_id, source,
      |    CAST(row_number() OVER (PARTITION BY source
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
      |  FROM documents)
      |SELECT doc_id, source, rk, slots
      |FROM rk JOIN alloc USING (source) WHERE rk <= slots""")(
    (s, dir) => graft.operators.Sampling.mixtureDraw(
      Tables.documents(s, dir), "doc_id", "source", "n_chars", k = 100))

  /** Bounded-hop BFS ([[graft.operators.Graph.bfsHops]]): minimum hop
    * distance ≤ 3 from the seed parts (every 1000th partkey) over the
    * co-purchase graph — blast-radius/related-item expansion. The
    * oracle unrolls the three hops as CTEs and takes the same min over
    * level sets. */
  val q102 = QueryDef.sql("q102_bfs_hops",
    """WITH e AS (
      |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      |sym AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
      |d0 AS (SELECT DISTINCT l_partkey AS id FROM lineitem
      |       WHERE l_partkey % 1000 = 0),
      |h1 AS (SELECT DISTINCT s.v AS id FROM sym s JOIN d0 ON s.u = d0.id),
      |h2 AS (SELECT DISTINCT s.v AS id FROM sym s JOIN h1 ON s.u = h1.id),
      |h3 AS (SELECT DISTINCT s.v AS id FROM sym s JOIN h2 ON s.u = h2.id),
      |lvl AS (SELECT id, 0 AS d FROM d0
      |  UNION ALL SELECT id, 1 FROM h1
      |  UNION ALL SELECT id, 2 FROM h2
      |  UNION ALL SELECT id, 3 FROM h3)
      |SELECT id, CAST(min(d) AS BIGINT) AS dist FROM lvl GROUP BY id""")(
    (s, dir) => {
      val li = Tables.lineitem(s, dir).select("l_orderkey", "l_partkey")
      val edges = li.groupBy("l_orderkey")
        .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
        .where(size(col("parts")) >= 2)
        .select(explode(graft.functions.PairExpressions
          .pairArray(col("parts"))).as("p"))
        .select(col("p.id1").as("u"), col("p.id2").as("v"))
      val seeds = Tables.lineitem(s, dir)
        .where(pmod(col("l_partkey"), lit(1000)) === 0)
        .select(col("l_partkey").as("id"))
      graft.operators.Graph.bfsHops(edges, seeds, "u", "v", "id", maxHops = 3)
    })

  /** Market-basket LIFT over co-purchased part pairs — association-rule
    * mining with exact arithmetic: lift(a,b) = c_ab·N / (c_a·c_b), all
    * counts exact distinct-order integers, one IEEE division rounded at
    * the end (the q57 linear-idf contract). Support floor c_ab ≥ 2
    * bounds the output to meaningful rules. Pairs expand in-row per
    * order (the q83 pattern); the only corpus-wide exchanges are the
    * per-order set build and the pair/count aggregations. */
  val q103 = QueryDef.sql("q103_basket_lift",
    """WITH po AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM lineitem),
      |ca AS (SELECT l_partkey, count(*) AS c FROM po GROUP BY l_partkey),
      |cab AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS c_ab
      |        FROM po a JOIN po b ON a.l_orderkey = b.l_orderkey
      |          AND a.l_partkey < b.l_partkey
      |        GROUP BY 1, 2)
      |SELECT pa, pb, c_ab,
      |  round(CAST(c_ab * n_orders AS DOUBLE) / (x.c * y.c), 6) AS lift
      |FROM cab JOIN ca x ON cab.pa = x.l_partkey
      |         JOIN ca y ON cab.pb = y.l_partkey
      |         CROSS JOIN n
      |WHERE c_ab >= 2""")(
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val po = li.select("l_orderkey", "l_partkey").distinct()
      val n = li.agg(count_distinct(col("l_orderkey")).as("n_orders"))
      val ca = po.groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
      val grouped = po.groupBy("l_orderkey")
        .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
        .where(size(col("parts")) >= 2)
      val cab = grouped
        .select(explode(graft.functions.PairExpressions
          .pairArray(col("parts"))).as("p"))
        .groupBy(col("p.id1").as("pa"), col("p.id2").as("pb"))
        .agg(count(lit(1)).as("c_ab"))
        .where(col("c_ab") >= 2)
      cab
        .join(ca.select(col("l_partkey").as("pa"), col("c").as("c_a")), "pa")
        .join(ca.select(col("l_partkey").as("pb"), col("c").as("c_b")), "pb")
        .crossJoin(n)
        .select(col("pa"), col("pb"), col("c_ab"),
          round((col("c_ab") * col("n_orders")).cast("double") /
            (col("c_a") * col("c_b")), 6).as("lift"))
    })

  /** Integer-quantized PageRank
    * ([[graft.operators.Graph.pageRankScaled]]), 3 iterations over the
    * co-purchase graph: ranks in 1e12-unit integers, contributions via
    * integer division — every step exact BIGINT, so the oracle unrolls
    * the same three iterations as CTEs and matches bit-for-bit
    * (floating-point PageRank cannot cross engines: in-neighbour sums
    * accumulate doubles in shuffle order). */
  val q104 = {
    val scale = 1000000000000L
    val base = 15L * scale / 100L
    def iter(n: Int, prev: String): String =
      s"""c$n AS (SELECT s.v AS id, CAST(sum((r.r // d.deg)) AS BIGINT) AS s
         |  FROM $prev r JOIN deg d ON r.id = d.id
         |  JOIN sym s ON s.u = r.id
         |  GROUP BY s.v),
         |r$n AS (SELECT d.id,
         |    CAST($base + (85 * coalesce(c.s, 0)) // 100 AS BIGINT) AS r
         |  FROM deg d LEFT JOIN c$n c ON d.id = c.id)"""
    QueryDef.sql("q104_pagerank",
      s"""WITH e AS (
         |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
         |  FROM lineitem a JOIN lineitem b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
         |sym AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
         |deg AS (SELECT u AS id, count(*) AS deg FROM sym GROUP BY u),
         |r0 AS (SELECT id, CAST($scale AS BIGINT) AS r FROM deg),
         |${iter(1, "r0")},
         |${iter(2, "r1")},
         |${iter(3, "r2")}
         |SELECT id, r AS rank_scaled FROM r3""")(
      (s, dir) => {
        val li = Tables.lineitem(s, dir).select("l_orderkey", "l_partkey")
        val edges = li.groupBy("l_orderkey")
          .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
          .where(size(col("parts")) >= 2)
          .select(explode(graft.functions.PairExpressions
            .pairArray(col("parts"))).as("p"))
          .select(col("p.id1").as("u"), col("p.id2").as("v"))
        graft.operators.Graph.pageRankScaled(edges, "u", "v",
          iterations = 3, scale = scale)
      })
  }

  /** Personalized PageRank
    * ([[graft.operators.Graph.personalizedPageRankScaled]]) from the
    * two highest-degree parts of the co-purchase graph — seed
    * expansion: which parts sit closest (by random-walk-with-restart
    * mass) to the category anchors? Same exact-integer iteration as
    * q104, with the teleport term landing only on seeds, so the
    * oracle unrolls three iterations as CTEs bit-for-bit. Output is
    * restricted to nodes with nonzero mass after 3 hops (the PPR
    * frontier), keeping the result the interesting neighborhood
    * rather than |nodes| zeros. */
  val q290 = {
    val scale = 1000000000000L
    val base = 15L * scale / 100L
    def iter(n: Int, prev: String): String =
      s"""c$n AS (SELECT s.v AS id, CAST(sum((r.r // d.deg)) AS BIGINT)
         |    AS s
         |  FROM $prev r JOIN deg d ON r.id = d.id
         |  JOIN sym s ON s.u = r.id
         |  WHERE r.r > 0
         |  GROUP BY s.v),
         |r$n AS (SELECT d.id, d.seed,
         |    CAST(d.seed * $base + (85 * coalesce(c.s, 0)) // 100
         |      AS BIGINT) AS r
         |  FROM deg d LEFT JOIN c$n c ON d.id = c.id)"""
    QueryDef.sql("q290_ppr_seeded",
      s"""WITH e AS (
         |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
         |  FROM lineitem a JOIN lineitem b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
         |sym AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
         |dg AS (SELECT u AS id, count(*) AS deg FROM sym GROUP BY u),
         |sd AS (SELECT id FROM dg ORDER BY deg DESC, id LIMIT 2),
         |deg AS (SELECT dg.id, dg.deg,
         |    CASE WHEN sd.id IS NULL THEN 0 ELSE 1 END AS seed
         |  FROM dg LEFT JOIN sd ON dg.id = sd.id),
         |r0 AS (SELECT id, seed, CAST(seed * $scale AS BIGINT) AS r
         |  FROM deg),
         |${iter(1, "r0")},
         |${iter(2, "r1")},
         |${iter(3, "r2")}
         |SELECT id, CAST(seed AS BIGINT) AS seed, r AS ppr_scaled
         |FROM r3 WHERE r > 0""")(
      (s, dir) => {
        val li = Tables.lineitem(s, dir).select("l_orderkey", "l_partkey")
        val edges = li.groupBy("l_orderkey")
          .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
          .where(size(col("parts")) >= 2)
          .select(explode(graft.functions.PairExpressions
            .pairArray(col("parts"))).as("p"))
          .select(col("p.id1").as("u"), col("p.id2").as("v"))
        // one eager edge derivation feeds BOTH the seed pick and the
        // operator (which re-canonicalizes resident blocks cheaply) —
        // without it the groupBy+pairArray explode runs twice
        val canonE = edges.where(col("u") =!= col("v"))
          .select(least(col("u"), col("v")).as("u"),
            greatest(col("u"), col("v")).as("v")).distinct()
          .localCheckpoint(true)
        val deg = canonE
          .unionByName(canonE.select(col("v").as("u"), col("u").as("v")))
          .groupBy(col("u").as("id")).agg(count(lit(1)).as("deg"))
        val seeds = deg.orderBy(col("deg").desc, col("id")).limit(2)
          .select(col("id"))
        graft.operators.Graph.personalizedPageRankScaled(
            canonE, "u", "v", seeds, "id", iterations = 3, scale = scale)
          .where(col("ppr_scaled") > 0)
      })
  }

  /** Attribute modularity of the co-purchase graph partitioned by
    * part BRAND — "do co-purchases concentrate within brands?", the
    * community-quality score (Newman's Q) evaluated on a label
    * partition instead of a detected one (the complement of q253's
    * degree assortativity and q115's propagation labels). Exact
    * integer form on the common denominator 4m^2: each community
    * contributes floor-ppm of (4m*e_c - d_c^2) / 4m^2, where e_c =
    * in-community edges and d_c = summed member degrees; the shipped
    * Q is the sum of the floored contributions (deterministic,
    * documented — the floor error is < |communities| ppm). Positive
    * contribution = denser than the degree-preserving random
    * expectation. Scale shape: one edge derivation, two broadcast
    * brand joins, |brands|-row tails; BIGINT holds to ~2M edges, the
    * documented upgrade past that is DECIMAL(38,0) numerators. */
  val q300 = QueryDef.sql("q300_brand_modularity",
    """WITH e AS (
      |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e),
      |sym AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
      |deg AS (SELECT u AS id, CAST(count(*) AS BIGINT) AS dg
      |  FROM sym GROUP BY 1),
      |bu AS (SELECT p_partkey, p_brand FROM part),
      |nodes AS (SELECT deg.id, deg.dg, bu.p_brand AS brand
      |  FROM deg JOIN bu ON deg.id = bu.p_partkey),
      |dcs AS (SELECT brand, CAST(count(*) AS BIGINT) AS n_nodes,
      |    CAST(sum(dg) AS BIGINT) AS d_c
      |  FROM nodes GROUP BY 1),
      |ein AS (SELECT a.p_brand AS brand, CAST(count(*) AS BIGINT)
      |      AS e_in
      |  FROM e JOIN bu a ON e.u = a.p_partkey
      |  JOIN bu b ON e.v = b.p_partkey
      |  WHERE a.p_brand = b.p_brand GROUP BY 1),
      |contrib AS (SELECT dcs.brand, dcs.n_nodes, dcs.d_c,
      |    coalesce(ein.e_in, 0) AS e_in,
      |    (CASE WHEN (4 * m.m * coalesce(ein.e_in, 0) - dcs.d_c * dcs.d_c)
      |        >= 0
      |      THEN (4 * m.m * coalesce(ein.e_in, 0) - dcs.d_c * dcs.d_c)
      |        * 1000000 // (4 * m.m * m.m)
      |      ELSE -((-(4 * m.m * coalesce(ein.e_in, 0)
      |          - dcs.d_c * dcs.d_c) * 1000000
      |        + 4 * m.m * m.m - 1) // (4 * m.m * m.m)) END)
      |      AS contrib_ppm
      |  FROM dcs LEFT JOIN ein ON dcs.brand = ein.brand, m)
      |SELECT brand, n_nodes, e_in, d_c, contrib_ppm,
      |  (SELECT CAST(sum(contrib_ppm) AS BIGINT) FROM contrib)
      |    AS q_total_ppm
      |FROM contrib""")(
    (s, dir) => {
      val li = Tables.lineitem(s, dir).select("l_orderkey", "l_partkey")
      val e = li.groupBy("l_orderkey")
        .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
        .where(size(col("parts")) >= 2)
        .select(explode(graft.functions.PairExpressions
          .pairArray(col("parts"))).as("p"))
        .select(col("p.id1").as("u"), col("p.id2").as("v"))
        .distinct()
        .localCheckpoint(true) // m, deg and e_in all read it
      val mVal = e.count()
      val sym = e.unionByName(e.select(col("v").as("u"),
        col("u").as("v")))
      val deg = sym.groupBy(col("u").as("id"))
        .agg(count(lit(1)).as("dg"))
      val bu = Tables.part(s, dir)
        .select(col("p_partkey"), col("p_brand"))
      val nodes = deg.join(broadcast(bu),
        deg("id") === bu("p_partkey"))
      val dcs = nodes.groupBy("p_brand")
        .agg(count(lit(1)).as("n_nodes"), sum("dg").as("d_c"))
        .withColumnRenamed("p_brand", "brand")
      val ein = e
        .join(broadcast(bu.toDF("pa", "ba")), col("u") === col("pa"))
        .join(broadcast(bu.toDF("pb", "bb")), col("v") === col("pb"))
        .where(col("ba") === col("bb"))
        .groupBy(col("ba").as("brand"))
        .agg(count(lit(1)).as("e_in"))
      val num = s"(4 * ${mVal}L * e_in - d_c * d_c) * 1000000"
      val den = s"(4 * ${mVal}L * ${mVal}L)"
      val contrib = dcs.join(ein, Seq("brand"), "left")
        .withColumn("e_in", coalesce(col("e_in"), lit(0L)))
        .withColumn("contrib_ppm", expr(
          s"CASE WHEN $num >= 0 THEN $num DIV $den" +
            s" ELSE -((-($num) + $den - 1) DIV $den) END"))
      val tot = contrib.agg(sum("contrib_ppm").as("q_total_ppm"))
      contrib.crossJoin(broadcast(tot))
        .select("brand", "n_nodes", "e_in", "d_c", "contrib_ppm",
          "q_total_ppm")
    })

  /** Capture-recapture population estimate (Chapman's bias-corrected
    * Lincoln–Petersen): how many distinct users does the platform
    * REALLY have, estimated from two independent observation windows
    * — the first and last 7 days of the stream — as
    * (n1+1)(n2+1)/(m+1) - 1 where m = users seen in both. The
    * estimator every dedup/reach methodology is built on, here in
    * exact integer floor arithmetic, shipped NEXT TO the true
    * distinct count (knowable in this corpus) so the estimator's
    * bias is itself part of the audit. Shape: two filtered distinct
    * aggregates + one semi-join-sized intersection; a single row
    * out. */
  val q306 = QueryDef.sql("q306_capture_recapture",
    """WITH b AS (SELECT min(date_diff('day', DATE '1970-01-01',
      |      CAST(ts AS DATE))) AS d0,
      |    max(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)))
      |      AS d1
      |  FROM events),
      |w1 AS (SELECT DISTINCT user_id FROM events, b
      |  WHERE date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
      |    <= b.d0 + 6),
      |w2 AS (SELECT DISTINCT user_id FROM events, b
      |  WHERE date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
      |    >= b.d1 - 6),
      |s AS (SELECT
      |    (SELECT CAST(count(*) AS BIGINT) FROM w1) AS n1,
      |    (SELECT CAST(count(*) AS BIGINT) FROM w2) AS n2,
      |    (SELECT CAST(count(*) AS BIGINT) FROM w1
      |      JOIN w2 ON w1.user_id = w2.user_id) AS m,
      |    (SELECT CAST(count(DISTINCT user_id) AS BIGINT)
      |      FROM events) AS true_n)
      |SELECT n1, n2, m,
      |  ((n1 + 1) * (n2 + 1)) // (m + 1) - 1 AS chapman_est,
      |  true_n
      |FROM s""")(
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val days = ev.select(col("user_id"),
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("ed"))
      val b = days.agg(min("ed").as("d0"), max("ed").as("d1"))
      val tagged = days.crossJoin(broadcast(b))
      val w1 = tagged.where(col("ed") <= col("d0") + 6)
        .select("user_id").distinct()
      val w2 = tagged.where(col("ed") >= col("d1") - 6)
        .select("user_id").distinct()
      val a1 = w1.agg(count(lit(1)).as("n1"))
      val a2 = w2.agg(count(lit(1)).as("n2"))
      val am = w1.join(w2, "user_id").agg(count(lit(1)).as("m"))
      val tn = ev.select("user_id").distinct()
        .agg(count(lit(1)).as("true_n"))
      a1.crossJoin(a2).crossJoin(am).crossJoin(tn)
        .select(col("n1"), col("n2"), col("m"),
          expr("((n1 + 1) * (n2 + 1)) DIV (m + 1) - 1")
            .as("chapman_est"),
          col("true_n"))
    })

  /** Pearson correlation from EXACT moments: the five sums accumulate
    * as decimals (order-exact across any shuffle), cast to double once
    * (correctly rounded on both engines), and the closed form runs the
    * same IEEE op sequence on both sides — so unlike `corr()` (double
    * accumulation in shuffle order) this replays bit-for-bit. The
    * two-pass-free single-aggregation shape any 100 TB feature-stats
    * job wants.
    *
    * Caveat (latent, not hit by this data at any SF): a ZERO-VARIANCE
    * group makes the denominator 0.0 and both engines return the same
    * IEEE ±Inf/NaN — identical bits, but not a meaningful correlation;
    * a production wrapper should null it out explicitly. Noted rather
    * than masked so the oracle keeps checking the raw closed form. */
  val q105 = QueryDef.sql("q105_exact_corr",
    """WITH m AS (SELECT l_returnflag,
      |    count(*) AS n,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
      |             * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
      |             * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |             * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |  round((n * sxy - sx * sy)
      |        / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
      |    AS corr
      |FROM m""")(
    (s, dir) => {
      val x = col("l_quantity").cast(D182)
      val y = col("l_extendedprice").cast(D182)
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(x).cast("double").as("sx"),
          sum(y).cast("double").as("sy"),
          sum(x * y).cast("double").as("sxy"),
          sum(x * x).cast("double").as("sxx"),
          sum(y * y).cast("double").as("syy"))
        .select(col("l_returnflag"), col("n"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
              sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 6)
            .as("corr"))
    })

  /** Equi-depth decile binning (`ntile`) of order value within each
    * priority class — feature bucketization for training pipelines.
    * Unique (price, key) ordering makes the tile assignment
    * deterministic; the window partitions by priority (bounded by the
    * largest class, never global). */
  val q106 = QueryDef.sql("q106_decile_binning",
    """SELECT o_orderkey, o_orderpriority,
      |  CAST(ntile(10) OVER (PARTITION BY o_orderpriority
      |    ORDER BY o_totalprice, o_orderkey) AS INT) AS bucket
      |FROM orders""")(
    (s, dir) => Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderpriority"),
        ntile(10).over(org.apache.spark.sql.expressions.Window
          .partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice"), col("o_orderkey"))).as("bucket")))

  /** Sketch MERGEABILITY certificate: per-partition HLL register
    * tables (l_orderkey split by parity) merged by max-per-register
    * must estimate exactly what the direct whole-table sketch does —
    * the associativity that lets a 100 TB pipeline sketch per
    * partition/day and union states instead of re-scanning. Both
    * paths ride in one result row per group; the oracle replays both
    * (q51's portable-HLL machinery + one union-max stage). */
  val q107 = {
    import graft.operators.Sketches
    val rhoCase = Sketches.rhoSql(s"(h & ${(1L << Sketches.RemBits) - 1})")
    val m = Sketches.Buckets
    val ew = Sketches.EmptyWeight
    def estimate(regs: String, alias: String): String =
      s"""agg_$alias AS (SELECT l_returnflag, count(*) AS present,
         |    SUM(1::BIGINT << (${Sketches.RemBits + 1} - rho)) AS s_present
         |  FROM $regs GROUP BY l_returnflag),
         |est_$alias AS (SELECT l_returnflag,
         |    ${Sketches.alphaSql}
         |      * ${m.toDouble}::DOUBLE * ${m.toDouble}::DOUBLE * ${ew.toDouble}::DOUBLE
         |      / CAST(s_present + ($m - present) * $ew AS DOUBLE) AS hll_$alias
         |  FROM agg_$alias)"""
    QueryDef.sql("q107_hll_merge",
      s"""WITH h AS (
         |  SELECT l_returnflag, l_orderkey % 2 AS part,
         |    ('0x' || substring(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))::BIGINT AS h
         |  FROM lineitem),
         |reg AS (SELECT l_returnflag, part, h >> ${Sketches.RemBits} AS bucket,
         |    max($rhoCase) AS rho
         |  FROM h GROUP BY 1, 2, 3),
         |merged AS (SELECT l_returnflag, bucket, max(rho) AS rho
         |           FROM reg GROUP BY 1, 2),
         |regd AS (SELECT l_returnflag, h >> ${Sketches.RemBits} AS bucket,
         |    max($rhoCase) AS rho
         |  FROM h GROUP BY 1, 2),
         |${estimate("merged", "merged")},
         |${estimate("regd", "direct")}
         |SELECT d.l_returnflag, hll_direct, hll_merged
         |FROM est_direct d JOIN est_merged mg ON d.l_returnflag = mg.l_returnflag""")(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val halves = Seq(0, 1).map(p =>
          Sketches.hllRegisters(
            li.where(pmod(col("l_orderkey"), lit(2)) === p),
            "l_returnflag", "l_orderkey"))
        val merged = Sketches.hllEstimate(
          Sketches.hllMergeRegisters(halves: _*), "l_returnflag", "merged")
        val direct = Sketches.hllDistinct(li, "l_returnflag", "l_orderkey")
          .withColumnRenamed("hll_l_orderkey", "hll_direct")
        direct.join(merged, "l_returnflag")
      })
  }

  /** Quantity-weighted median price per return flag: the price level
    * below which half the shipped QUANTITY sits — weighted quantiles
    * are what mixture diagnostics actually need (median doc by token
    * mass, median price by volume). Exact integer cumulative weights
    * over a unique (price, line) order; the pick is the minimum
    * qualifying price, deterministic on both engines; one division at
    * the end (cents → currency). */
  val q108 = QueryDef.sql("q108_weighted_median",
    """WITH w AS (SELECT l_returnflag,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS p,
      |    CAST(l_quantity AS BIGINT) AS q,
      |    l_orderkey, l_linenumber
      |  FROM lineitem),
      |c AS (SELECT *,
      |    sum(q) OVER (PARTITION BY l_returnflag
      |      ORDER BY p, l_orderkey, l_linenumber
      |      ROWS UNBOUNDED PRECEDING) AS cum,
      |    sum(q) OVER (PARTITION BY l_returnflag) AS tot
      |  FROM w),
      |m AS (SELECT l_returnflag, min(p) AS mp
      |      FROM c WHERE 2 * cum >= tot GROUP BY l_returnflag)
      |SELECT l_returnflag, CAST(mp AS DOUBLE) / 100 AS wmedian FROM m""")(
    (s, dir) => {
      val Window = org.apache.spark.sql.expressions.Window
      val wOrd = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("p"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(col("l_returnflag"))
      Tables.lineitem(s, dir)
        .select(col("l_returnflag"),
          round(col("l_extendedprice") * 100).cast("long").as("p"),
          col("l_quantity").cast("long").as("q"),
          col("l_orderkey"), col("l_linenumber"))
        .withColumn("cum", sum(col("q")).over(wOrd))
        .withColumn("tot", sum(col("q")).over(wAll))
        .where(lit(2) * col("cum") >= col("tot"))
        .groupBy(col("l_returnflag")).agg(min(col("p")).as("mp"))
        .select(col("l_returnflag"),
          (col("mp").cast("double") / 100).as("wmedian"))
    })

  /** Quantile-sketch MERGEABILITY certificate — q107's property for
    * the bottom-k-by-hash sample: per-partition bottom-k pair tables
    * merged by union + re-selection must yield exactly the direct
    * whole-table sample (bottom-k by a fixed hash is a selection, so
    * the global bottom-k sits inside the union of partition bottom-ks).
    * Output compares the quantiles from both paths; the oracle replays
    * both with windowed selections. */
  val q109 = QueryDef.sql("q109_bottomk_merge",
    """WITH h AS (SELECT l_returnflag, l_orderkey % 2 AS part,
      |    l_extendedprice AS v,
      |    ('0x' || substring(md5(CAST(l_orderkey AS VARCHAR) || '|' ||
      |       CAST(l_linenumber AS VARCHAR)), 1, 15))::BIGINT AS h
      |  FROM lineitem),
      |dir AS (SELECT l_returnflag, v FROM (
      |    SELECT l_returnflag, v, row_number() OVER (
      |      PARTITION BY l_returnflag ORDER BY h, v) AS rn FROM h)
      |  WHERE rn <= 500),
      |pp AS (SELECT l_returnflag, h, v FROM (
      |    SELECT l_returnflag, part, h, v, row_number() OVER (
      |      PARTITION BY l_returnflag, part ORDER BY h, v) AS rn FROM h)
      |  WHERE rn <= 500),
      |mrg AS (SELECT l_returnflag, v FROM (
      |    SELECT l_returnflag, h, v, row_number() OVER (
      |      PARTITION BY l_returnflag ORDER BY h, v) AS rn FROM pp)
      |  WHERE rn <= 500),
      |qd AS (SELECT l_returnflag,
      |    quantile_cont(v, 0.5) AS direct_p50,
      |    quantile_cont(v, 0.99) AS direct_p99 FROM dir GROUP BY 1),
      |qm AS (SELECT l_returnflag,
      |    quantile_cont(v, 0.5) AS merged_p50,
      |    quantile_cont(v, 0.99) AS merged_p99 FROM mrg GROUP BY 1)
      |SELECT qd.l_returnflag, direct_p50, direct_p99, merged_p50, merged_p99
      |FROM qd JOIN qm ON qd.l_returnflag = qm.l_returnflag""")(
    (s, dir) => {
      import graft.operators.Sketches
      val li = Tables.lineitem(s, dir)
      val key = concat(col("l_orderkey").cast("string"), lit("|"),
        col("l_linenumber").cast("string"))
      val direct = Sketches
        .bottomKValues(li, "l_returnflag", key, col("l_extendedprice"), 500)
        .groupBy("l_returnflag")
        .agg(expr("percentile(value, 0.5)").as("direct_p50"),
          expr("percentile(value, 0.99)").as("direct_p99"))
      val halves = Seq(0, 1).map(p => Sketches.bottomKPairs(
        li.where(pmod(col("l_orderkey"), lit(2)) === p),
        "l_returnflag", key, col("l_extendedprice"), 500))
      val merged = Sketches.bottomKMergedValues(500)(halves: _*)
        .groupBy("l_returnflag")
        .agg(expr("percentile(value, 0.5)").as("merged_p50"),
          expr("percentile(value, 0.99)").as("merged_p99"))
      direct.join(merged, "l_returnflag")
    })

  /** Robust outliers by MAD (median absolute deviation): robust_z =
    * |x − median| / (1.4826·MAD) > 3.5 per event type — the
    * outlier detector that, unlike q72's mean/stddev z-score, is not
    * dragged by the outliers themselves. Exact interpolated medians
    * (percentile ⇔ quantile_cont, the q43 contract), then a fixed IEEE
    * op sequence per row; both medians are per-type aggregates riding
    * back in as broadcast-sized one-row-per-type frames. */
  val q112 = QueryDef.sql("q112_mad_outliers",
    """WITH m AS (SELECT event_type, quantile_cont(value, 0.5) AS med
      |           FROM events GROUP BY event_type),
      |d AS (SELECT e.event_type, e.event_id, e.value,
      |        abs(e.value - m.med) AS dev
      |      FROM events e JOIN m ON e.event_type = m.event_type),
      |md AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad
      |       FROM d GROUP BY event_type)
      |SELECT d.event_type, d.event_id, d.value,
      |  round(d.dev / (1.4826 * md.mad), 6) AS robust_z
      |FROM d JOIN md ON d.event_type = md.event_type
      |WHERE d.dev / (1.4826 * md.mad) > 3.5""")(
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val m = ev.groupBy("event_type")
        .agg(expr("percentile(value, 0.5)").as("med"))
      val d = ev.join(m, "event_type")
        .select(col("event_type"), col("event_id"), col("value"),
          abs(col("value") - col("med")).as("dev"))
      val md = d.groupBy("event_type")
        .agg(expr("percentile(dev, 0.5)").as("mad"))
      d.join(md, "event_type")
        .where(col("dev") / (lit(1.4826) * col("mad")) > 3.5)
        .select(col("event_type"), col("event_id"), col("value"),
          round(col("dev") / (lit(1.4826) * col("mad")), 6).as("robust_z"))
    })

  /** Rank-based quantile normalization (the "rank-gauss" front half):
    * each value mapped to its within-group quantile position
    * (rn−1)/(n−1) — the distribution-free feature transform. Explicit
    * formula instead of `percent_rank` so the single-row-group corner
    * is defined by arithmetic (greatest(n−1, 1)), not by engine
    * convention; unique (value, id) order makes ranks deterministic. */
  val q113 = QueryDef.sql("q113_rank_normalize",
    """SELECT event_id, event_type, value,
      |  round(CAST(rn - 1 AS DOUBLE) / greatest(n - 1, 1), 6) AS qnorm
      |FROM (SELECT event_id, event_type, value,
      |        row_number() OVER (PARTITION BY event_type
      |                           ORDER BY value, event_id) AS rn,
      |        count(*) OVER (PARTITION BY event_type) AS n
      |      FROM events)""")(
    (s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val wp = W.partitionBy(col("event_type"))
      Tables.events(s, dir)
        .select(col("event_id"), col("event_type"), col("value"),
          row_number().over(wp.orderBy(col("value"), col("event_id"))).as("rn"),
          count(lit(1)).over(wp).as("n"))
        .select(col("event_id"), col("event_type"), col("value"),
          round((col("rn") - 1).cast("double") /
            greatest(col("n") - 1, lit(1L)), 6).as("qnorm"))
    })

  /** Contingency audit of lang × source with per-cell chi-square
    * contributions — "is this metadata pair independent" at a glance
    * (large contributions = cells driving the association). Expected
    * counts and contributions run the same IEEE op sequence on exact
    * integer marginals; the marginals ride back in as broadcast-sized
    * frames. */
  val q114 = QueryDef.sql("q114_crosstab_chi2",
    """WITH c AS (SELECT lang, source, count(*) AS n
      |           FROM documents GROUP BY lang, source),
      |r AS (SELECT lang, CAST(sum(n) AS BIGINT) AS rn FROM c GROUP BY lang),
      |cl AS (SELECT source, CAST(sum(n) AS BIGINT) AS cn
      |       FROM c GROUP BY source),
      |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c)
      |SELECT c.lang, c.source, c.n,
      |  round(CAST(r.rn * cl.cn AS DOUBLE) / tot, 6) AS expected,
      |  round((n - CAST(r.rn * cl.cn AS DOUBLE) / tot)
      |        * (n - CAST(r.rn * cl.cn AS DOUBLE) / tot)
      |        / (CAST(r.rn * cl.cn AS DOUBLE) / tot), 6) AS chi2_part
      |FROM c JOIN r ON c.lang = r.lang
      |       JOIN cl ON c.source = cl.source CROSS JOIN t""")(
    (s, dir) => {
      val c = Tables.documents(s, dir)
        .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("n"))
      val r = c.groupBy(col("lang")).agg(sum(col("n")).as("rn"))
      val cl = c.groupBy(col("source")).agg(sum(col("n")).as("cn"))
      val t = c.agg(sum(col("n")).as("tot"))
      val e = (col("rn") * col("cn")).cast("double") / col("tot")
      c.join(r, "lang").join(cl, "source").crossJoin(t)
        .select(col("lang"), col("source"), col("n"),
          round(e, 6).as("expected"),
          round((col("n") - e) * (col("n") - e) / e, 6).as("chi2_part"))
    })

  /** Bloom semi-join reduction — the runtime-filter pattern for
    * fact-to-fact joins: a selective predicate on `orders` (urgent
    * orders of one quarter, ~2% of rows) would still drag EVERY
    * lineitem row through the join shuffle, so a Bloom filter built
    * from the filtered keys (Spark's own `BloomFilterAggregate`,
    * partial-aggregated and OR-merged per partition) pre-filters the
    * lineitem SCAN — the fact table's shuffle volume drops to the
    * semi-join's ~2% plus the Bloom's false positives, and those FPs
    * die in the exact join that follows. The oracle is the PLAIN join:
    * the driver hash proves sketch + verify is invisible to results.
    * Same shape Spark's AQE runtime filters inject automatically —
    * spelled explicitly here so the reduction also applies when the
    * build side is a separate pipeline stage (e.g. a decontamination
    * keylist), not a join sibling. */
  val q167 = QueryDef.sql("q167_bloom_join_prune",
    """SELECT o.o_orderstatus,
      |  count(*) AS n_lines,
      |  CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
      |               AS BIGINT)
      |           * (100 - CAST(CAST(l.l_discount AS DECIMAL(4,2)) * 100
      |                         AS BIGINT))) AS BIGINT) AS rev_cpct
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |WHERE o.o_orderpriority = '1-URGENT'
      |  AND o.o_orderdate >= TIMESTAMP '1995-01-01'
      |  AND o.o_orderdate < TIMESTAMP '1995-04-01'
      |GROUP BY o.o_orderstatus""")(
    (s, dir) => {
      import org.apache.spark.sql.graftshim.Shim
      val sel = Tables.orders(s, dir)
        .where(col("o_orderpriority") === "1-URGENT" &&
          col("o_orderdate") >= to_timestamp(lit("1995-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1995-04-01")))
        .select(col("o_orderkey"), col("o_orderstatus"))
        .cache() // two consumers: Bloom build + exact verify join
      // classic sizing for 1% fpp; the count is the build side's own
      // cardinality — one driver long, not data
      val nKeys = math.max(1L, sel.count())
      val numBits = math.max(64L, math.ceil(
        -nKeys * math.log(0.01) / (math.log(2) * math.log(2))).toLong)
      val bloom = sel.select(
        Shim.bloomAgg(col("o_orderkey"), nKeys, numBits).as("bf"))
        .head().getAs[Array[Byte]]("bf")
      val pruned = Tables.lineitem(s, dir)
        .where(Shim.bloomMightContain(bloom, col("l_orderkey")))
      // discounted revenue in exact integer cents×pct units (both
      // factors are integral BIGINTs, so the sum is exact on any
      // engine under any order — no decimal rounding to disagree on)
      pruned.join(sel, pruned("l_orderkey") === sel("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_lines"),
          sum((col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("long") *
            (lit(100L) - (col("l_discount").cast("decimal(4,2)") * 100)
              .cast("long"))).as("rev_cpct"))
    })

  /** Resharding cost, mod-N vs consistent hashing (8 → 9 shards, 64
    * vnodes): the fraction of keys that must MOVE — mod-N reshuffles
    * ~8/9 of the corpus, the ring ~1/9. The repartition-planning
    * number for growing a sharded corpus store; all md5-prefix
    * arithmetic, replayed exactly. See
    * [[graft.operators.Split.rebalanceReport]]. */
  val q189 = QueryDef.sql("q189_rebalance_cost",
    """WITH d AS (SELECT doc_id,
      |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
      |  FROM documents),
      |r1 AS (SELECT s, ('0x' || substring(md5('shard-' || s || '-' || v),
      |         1, 15))::BIGINT AS pos
      |  FROM (SELECT unnest(range(8)) AS s) ss
      |  CROSS JOIN (SELECT unnest(range(64)) AS v) vv),
      |r2 AS (SELECT s, ('0x' || substring(md5('shard-' || s || '-' || v),
      |         1, 15))::BIGINT AS pos
      |  FROM (SELECT unnest(range(9)) AS s) ss
      |  CROSS JOIN (SELECT unnest(range(64)) AS v) vv),
      |o1 AS (SELECT d.doc_id, d.h,
      |    coalesce(min_by(s, pos) FILTER (WHERE pos >= h), min_by(s, pos))
      |      AS sh
      |  FROM d CROSS JOIN r1 GROUP BY d.doc_id, d.h),
      |o2 AS (SELECT d.doc_id,
      |    coalesce(min_by(s, pos) FILTER (WHERE pos >= h), min_by(s, pos))
      |      AS sh
      |  FROM d CROSS JOIN r2 GROUP BY d.doc_id, d.h),
      |m AS (SELECT o1.doc_id,
      |    CASE WHEN o1.h % 8 != o1.h % 9 THEN 1 ELSE 0 END AS mm,
      |    CASE WHEN o1.sh != o2.sh THEN 1 ELSE 0 END AS rm
      |  FROM o1 JOIN o2 USING (doc_id))
      |SELECT CAST(count(*) AS BIGINT) AS n_keys,
      |  CAST(sum(mm) AS BIGINT) AS moved_mod,
      |  CAST(sum(rm) AS BIGINT) AS moved_ring,
      |  round(CAST(sum(mm) AS DOUBLE) / count(*), 6) AS mod_ratio,
      |  round(CAST(sum(rm) AS DOUBLE) / count(*), 6) AS ring_ratio
      |FROM m""")(
    (s, dir) => graft.operators.Split.rebalanceReport(
      Tables.documents(s, dir), "doc_id", n1 = 8, n2 = 9, vnodes = 64))

  /** Adamic–Adar link prediction over the support-≥2 co-purchase part
    * graph — for every part, the single best NON-adjacent partner by
    * common-neighbor evidence, Σ_w 1/ln(deg w): the "recommend the
    * bundle that doesn't exist yet" companion to q103's lift on pairs
    * that DO co-occur. The graph is the support-thresholded one
    * (edges need ≥ 2 co-orders) for the same reason q103 demands
    * c_ab ≥ 2: the support-1 co-purchase graph is Poisson-dense (the
    * wedge table Σ deg² is ~10⁸ rows at sf0.1) and its single-co-
    * occurrence edges are noise; thresholding IS the hub/noise guard,
    * with a deg ≤ 50 wedge-center cap kept as the structural backstop
    * (q29's df-cap stance). Selection is integer-exact end-to-end:
    * candidates keyed by (cn DESC, partner ASC) per source node, the
    * floating AA score display-only, rounded to 6. */
  val q220 = QueryDef.sql("q220_adamic_adar",
    """WITH po AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |e AS (SELECT a.l_partkey AS u, b.l_partkey AS v
      |  FROM po a JOIN po b ON a.l_orderkey = b.l_orderkey
      |    AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING count(*) >= 2),
      |deg AS (SELECT w, count(*) AS d FROM (
      |    SELECT u AS w FROM e UNION ALL SELECT v FROM e) GROUP BY 1),
      |adj AS (SELECT u AS w, v AS n FROM e
      |  UNION ALL SELECT v, u FROM e),
      |ctr AS (SELECT adj.w, adj.n, deg.d FROM adj
      |  JOIN deg ON adj.w = deg.w WHERE deg.d <= 50),
      |wedge AS (SELECT a.n AS u, b.n AS v, a.d
      |  FROM ctr a JOIN ctr b ON a.w = b.w AND a.n < b.n),
      |open_w AS (SELECT wedge.u, wedge.v, wedge.d FROM wedge
      |  LEFT JOIN e ON wedge.u = e.u AND wedge.v = e.v
      |  WHERE e.u IS NULL),
      |sc AS (SELECT u, v, CAST(count(*) AS BIGINT) AS cn,
      |    sum(1.0 / ln(CAST(d AS DOUBLE))) AS aa
      |  FROM open_w GROUP BY 1, 2),
      |sym AS (SELECT u AS src, v AS cand, cn, aa FROM sc
      |  UNION ALL SELECT v, u, cn, aa FROM sc),
      |r AS (SELECT src, cand, cn, aa, row_number()
      |    OVER (PARTITION BY src ORDER BY cn DESC, cand) AS rk
      |  FROM sym)
      |SELECT src AS part_a, cand AS predicted, cn,
      |  round(aa, 6) AS aa_score
      |FROM r WHERE rk = 1""")(
    (s, dir) => {
      val po = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_partkey").distinct()
      val e = po.toDF("ok", "u").join(po.toDF("ok2", "v"),
          col("ok") === col("ok2") && col("u") < col("v"))
        .groupBy("u", "v").agg(count(lit(1)).as("c"))
        .where(col("c") >= 2).select("u", "v")
      val deg = e.select(col("u").as("w"))
        .unionByName(e.select(col("v").as("w")))
        .groupBy("w").agg(count(lit(1)).as("d"))
      val adj = e.select(col("u").as("w"), col("v").as("n"))
        .unionByName(e.select(col("v").as("w"), col("u").as("n")))
      val ctr = adj.join(deg.where(col("d") <= 50), "w")
      val wedge = ctr.toDF("w", "n1", "d")
        .join(ctr.toDF("w", "n2", "d2").drop("d2"), "w")
        .where(col("n1") < col("n2"))
        .select(col("n1").as("u"), col("n2").as("v"), col("d"))
      val open = wedge.join(e, Seq("u", "v"), "left_anti")
      val sc = open.groupBy("u", "v")
        .agg(count(lit(1)).as("cn"),
          sum(lit(1.0) / log(col("d").cast("double"))).as("aa"))
      val sym = sc.select(col("u").as("src"), col("v").as("cand"),
          col("cn"), col("aa"))
        .unionByName(sc.select(col("v").as("src"), col("u").as("cand"),
          col("cn"), col("aa")))
      sym.withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("src")
            .orderBy(col("cn").desc, col("cand"))))
        .where(col("rk") === 1)
        .select(col("src").as("part_a"), col("cand").as("predicted"),
          col("cn"), round(col("aa"), 6).as("aa_score"))
    })

  private val CoreRounds = 8

  /** 2-core of the support-≥2 co-purchase graph by iterative peeling:
    * repeatedly drop degree-<2 nodes (8 unrolled rounds — the
    * fixpoint for this corpus arrives by round 6 at both SFs, and the
    * spec ASSERTS a further round is a no-op, so the unroll count is
    * verified, not hoped). The k-core is the classic noise filter
    * before community detection / q115's components: leaves and
    * threads peel away, cohesive shopping clusters remain. Every
    * round is one degree aggregate + two semi joins; the oracle
    * unrolls the same rounds as MATERIALIZED CTEs (the q239 lesson —
    * self-referencing chains must not re-inline). Output: surviving
    * nodes with their in-core degree. */
  val q245 = QueryDef.sql("q245_kcore", {
    val rounds = (1 to CoreRounds).map { k =>
      s"""d$k AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS d
         |  FROM (SELECT u AS w FROM e${k - 1}
         |        UNION ALL SELECT v FROM e${k - 1}) GROUP BY 1),
         |k$k AS MATERIALIZED (SELECT w FROM d$k WHERE d >= 2),
         |e$k AS MATERIALIZED (SELECT e.u, e.v FROM e${k - 1} e
         |  JOIN k$k a ON e.u = a.w JOIN k$k b ON e.v = b.w)"""
    }.mkString(",\n")
    s"""WITH po AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |e0 AS MATERIALIZED (SELECT a.l_partkey AS u, b.l_partkey AS v
       |  FROM po a JOIN po b ON a.l_orderkey = b.l_orderkey
       |    AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2 HAVING count(*) >= 2),
       |$rounds
       |SELECT w AS part, d AS core_degree
       |FROM (SELECT w, CAST(count(*) AS BIGINT) AS d
       |  FROM (SELECT u AS w FROM e$CoreRounds
       |        UNION ALL SELECT v FROM e$CoreRounds) GROUP BY 1)"""
  })(
    (s, dir) => {
      val po = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_partkey").distinct()
      var e = po.toDF("ok", "u").join(po.toDF("ok2", "v"),
          col("ok") === col("ok2") && col("u") < col("v"))
        .groupBy("u", "v").agg(count(lit(1)).as("c"))
        .where(col("c") >= 2).select("u", "v")
        .localCheckpoint(eager = true) // resident: 8 rounds re-read it
      for (_ <- 1 to CoreRounds) {
        val deg = e.select(col("u").as("w"))
          .unionByName(e.select(col("v").as("w")))
          .groupBy("w").agg(count(lit(1)).as("d"))
        val keep = deg.where(col("d") >= 2).select("w")
        e = e.join(keep.toDF("u"), Seq("u"), "left_semi")
          .join(keep.toDF("v"), Seq("v"), "left_semi")
          .select("u", "v")
          .localCheckpoint(eager = true)
      }
      e.select(col("u").as("w"))
        .unionByName(e.select(col("v").as("w")))
        .groupBy(col("w").as("part"))
        .agg(count(lit(1)).as("core_degree"))
    })

  /** One more peel round on the q245 result must be a no-op — used by
    * the spec to certify the unroll count reaches the fixpoint. */
  private[queries] def kcorePeelOnce(
      e: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val deg = e.select(col("u").as("w"))
      .unionByName(e.select(col("v").as("w")))
      .groupBy("w").agg(count(lit(1)).as("d"))
    val keep = deg.where(col("d") >= 2).select("w")
    e.join(keep.toDF("u"), Seq("u"), "left_semi")
      .join(keep.toDF("v"), Seq("v"), "left_semi")
      .select("u", "v")
  }

  /** Degree assortativity of the support-≥2 co-purchase graph — the
    * Pearson correlation of endpoint degrees over edges, the one
    * number that says whether hubs attach to hubs (assortative, r>0)
    * or to leaves (disassortative, r<0) — which decides whether
    * hub-caps (q29/q220's guards) cut noise or structure. All five
    * moments (Σdu, Σdv, Σdu·dv, Σdu², Σdv² over DIRECTED edge
    * endpoints, the standard symmetric treatment) are exact integer
    * aggregates on the degree-joined edge list; one double at the
    * end, floor-milli. */
  val q253 = QueryDef.sql("q253_assortativity",
    """WITH po AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |e AS (SELECT a.l_partkey AS u, b.l_partkey AS v
      |  FROM po a JOIN po b ON a.l_orderkey = b.l_orderkey
      |    AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING count(*) >= 2),
      |deg AS (SELECT w, CAST(count(*) AS BIGINT) AS d FROM (
      |  SELECT u AS w FROM e UNION ALL SELECT v FROM e) GROUP BY 1),
      |de AS (SELECT du.d AS da, dv.d AS db FROM e
      |  JOIN deg du ON e.u = du.w JOIN deg dv ON e.v = dv.w),
      |sym AS (SELECT da, db FROM de UNION ALL SELECT db, da FROM de),
      |s AS (SELECT CAST(count(*) AS BIGINT) AS m,
      |    CAST(sum(da) AS BIGINT) AS sa, CAST(sum(db) AS BIGINT) AS sb,
      |    CAST(sum(da * db) AS BIGINT) AS sab,
      |    CAST(sum(da * da) AS BIGINT) AS saa,
      |    CAST(sum(db * db) AS BIGINT) AS sbb
      |  FROM sym)
      |SELECT m AS n_edge_ends,
      |  CAST(floor(CAST(m * sab - sa * sb AS DOUBLE) /
      |    (sqrt(CAST(m * saa - sa * sa AS DOUBLE)) *
      |     sqrt(CAST(m * sbb - sb * sb AS DOUBLE))) * 1000) AS BIGINT)
      |    AS assortativity_milli
      |FROM s""")(
    (s, dir) => {
      val po = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_partkey").distinct()
      val e = po.toDF("ok", "u").join(po.toDF("ok2", "v"),
          col("ok") === col("ok2") && col("u") < col("v"))
        .groupBy("u", "v").agg(count(lit(1)).as("c"))
        .where(col("c") >= 2).select("u", "v")
      val deg = e.select(col("u").as("w"))
        .unionByName(e.select(col("v").as("w")))
        .groupBy("w").agg(count(lit(1)).as("d"))
      val de = e.join(broadcast(deg.toDF("u", "da")), "u")
        .join(broadcast(deg.toDF("v", "db")), "v")
        .select("da", "db")
      val sym = de.unionByName(de.select(col("db").as("da"),
        col("da").as("db")))
      val st = sym.agg(count(lit(1)).as("m"), sum("da").as("sa"),
        sum("db").as("sb"), sum(col("da") * col("db")).as("sab"),
        sum(col("da") * col("da")).as("saa"),
        sum(col("db") * col("db")).as("sbb"))
      st.select(col("m").as("n_edge_ends"),
        floor((col("m") * col("sab") - col("sa") * col("sb"))
          .cast("double") /
          (sqrt((col("m") * col("saa") - col("sa") * col("sa"))
            .cast("double")) *
           sqrt((col("m") * col("sbb") - col("sb") * col("sb"))
            .cast("double"))) * 1000).cast("long")
          .as("assortativity_milli"))
    })

  /** 2-D Pareto frontier (skyline): parts not dominated on
    * (minimize retail price, maximize size). A part is dominated iff
    * some part is no more expensive AND no smaller, with at least one
    * strict — exactly two window aggregates on the price-sorted order:
    * the running max size over STRICTLY cheaper rows (an integer RANGE
    * frame, so price ties stay out of their own frame) and the max
    * size within the same price. Exact micro-integer prices.
    *
    * Scale shape: the Spark side first prunes each partition to its
    * LOCAL skyline (domination is transitive, so a globally
    * non-dominated row survives any local pass — the classic
    * distributed-skyline reduction), then runs the global two-window
    * pass on the survivors; the global sort only ever sees the small
    * frontier-candidate set, not the table. */
  val q257 = QueryDef.sql("q257_pareto_frontier",
    """WITH p AS (SELECT p_partkey, p_size,
      |    CAST(CAST(p_retailprice AS DECIMAL(18,6)) * 1000000 AS BIGINT)
      |      AS price_micro
      |  FROM part),
      |w AS (SELECT p_partkey, p_size, price_micro,
      |    max(p_size) OVER (ORDER BY price_micro
      |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS cheaper_max,
      |    max(p_size) OVER (PARTITION BY price_micro) AS same_price_max
      |  FROM p)
      |SELECT p_partkey, price_micro, p_size
      |FROM w
      |WHERE coalesce(cheaper_max, -1) < p_size
      |  AND same_price_max = p_size""")(
    (s, dir) => {
      val p = Tables.part(s, dir).select(col("p_partkey"), col("p_size"),
        (col("p_retailprice").cast("decimal(18,6)") * 1000000)
          .cast("long").as("price_micro"))
      def skyline(df: org.apache.spark.sql.DataFrame,
          part: Seq[String]): org.apache.spark.sql.DataFrame = {
        val byPrice = if (part.isEmpty) Window.orderBy("price_micro")
          else Window.partitionBy(part.map(col): _*).orderBy("price_micro")
        val samePrice = if (part.isEmpty) Window.partitionBy("price_micro")
          else Window.partitionBy((part :+ "price_micro").map(col): _*)
        df.withColumn("cheaper_max", max(col("p_size")).over(
            byPrice.rangeBetween(Window.unboundedPreceding, -1)))
          .withColumn("same_price_max", max(col("p_size")).over(samePrice))
          .where(coalesce(col("cheaper_max"), lit(-1)) < col("p_size")
            && col("same_price_max") === col("p_size"))
          .drop("cheaper_max", "same_price_max")
      }
      val local = skyline(p.withColumn("pid", spark_partition_id()),
        Seq("pid")).drop("pid")
      skyline(local, Seq.empty)
        .select(col("p_partkey"), col("price_micro"), col("p_size"))
    })

  /** q268's oracle: 4 HITS rounds as chained CTEs over the
    * MATERIALIZED customer→part purchase edges. Every quantity is a
    * non-negative integer (counts × scores), and each round rescales
    * by `(x * 1000) // max(x)` — non-negative floor-div, so // and
    * DIV agree and the scores replay exactly. */
  private val hitsOracle: String = {
    val sb = new StringBuilder
    sb ++= """WITH e AS MATERIALIZED (SELECT o_custkey AS cust,
             |    l_partkey AS part, CAST(count(*) AS BIGINT) AS w
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  GROUP BY 1, 2),
             |h0 AS (SELECT DISTINCT cust, CAST(1000 AS BIGINT) AS hv
             |  FROM e),
             |""".stripMargin
    for (t <- 1 to 4) {
      sb ++= s"ar$t AS MATERIALIZED (SELECT e.part," +
        s" CAST(sum(e.w * h.hv) AS BIGINT) AS raw\n" +
        s"  FROM e JOIN h${t - 1} h ON e.cust = h.cust GROUP BY 1),\n"
      sb ++= s"a$t AS (SELECT part, (raw * 1000) //" +
        s" (SELECT max(raw) FROM ar$t) AS av FROM ar$t),\n"
      sb ++= s"hr$t AS MATERIALIZED (SELECT e.cust," +
        s" CAST(sum(e.w * a.av) AS BIGINT) AS raw\n" +
        s"  FROM e JOIN a$t a ON e.part = a.part GROUP BY 1),\n"
      sb ++= s"h$t AS (SELECT cust, (raw * 1000) //" +
        s" (SELECT max(raw) FROM hr$t) AS hv FROM hr$t),\n"
    }
    sb ++= """top AS (
             |  SELECT 'hub' AS kind, cust AS id, hv AS score,
             |    CAST(row_number() OVER (ORDER BY hv DESC, cust)
             |      AS BIGINT) AS rk
             |  FROM h4
             |  UNION ALL
             |  SELECT 'auth', part, av,
             |    CAST(row_number() OVER (ORDER BY av DESC, part)
             |      AS BIGINT)
             |  FROM a4)
             |SELECT kind, id, score, rk FROM top WHERE rk <= 20"""
      .stripMargin
    sb.toString
  }

  /** HITS hubs & authorities on the bipartite customer→part purchase
    * graph (weights = purchase counts): 4 mutual-reinforcement rounds
    * in integer arithmetic, rescaled to ‖·‖∞ = 1000 each half-step.
    * Top-20 of each side. Scale shape: the edge aggregate is built
    * once and cached; each half-round is one hash-aggregate joined
    * against the (≤ #custs / #parts)-row score vector — broadcast
    * here at bench scale, degrading to a shuffle join on a cluster
    * when the vector outgrows the broadcast budget (same
    * count-then-dial stance as the Graph operators). */
  val q268 = QueryDef.sql("q268_hits_scores", hitsOracle)(
    (s, dir) => {
      // EAGER materialization per half-round (the round-5 iterative-op
      // lesson, q104/q115): without it every max() collect and every
      // broadcast build re-executes the whole prior lineage — 8
      // half-rounds re-deriving each other quadratically (measured
      // 25 s -> ~2 s at sf0.1 for identical results)
      val e = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("cust"), col("l_partkey").as("part"))
        .agg(count(lit(1)).as("w")).localCheckpoint(true)
      var h = e.select("cust").distinct()
        .withColumn("hv", lit(1000L)).localCheckpoint(true)
      var a: org.apache.spark.sql.DataFrame = null
      for (_ <- 1 to 4) {
        val ar = e.join(broadcast(h), "cust")
          .groupBy("part").agg(sum(col("w") * col("hv")).as("raw"))
          .localCheckpoint(true)
        val amax = ar.agg(max("raw")).collect()(0).getLong(0)
        a = ar.select(col("part"),
          expr(s"(raw * 1000) DIV ${amax}L").as("av"))
        val hr = e.join(broadcast(a), "part")
          .groupBy("cust").agg(sum(col("w") * col("av")).as("raw"))
          .localCheckpoint(true)
        val hmax = hr.agg(max("raw")).collect()(0).getLong(0)
        h = hr.select(col("cust"),
          expr(s"(raw * 1000) DIV ${hmax}L").as("hv"))
      }
      val W = Window.orderBy(col("score").desc, col("id"))
      val hubs = h.select(lit("hub").as("kind"), col("cust").as("id"),
        col("hv").as("score"))
      val auths = a.select(lit("auth").as("kind"), col("part").as("id"),
        col("av").as("score"))
      hubs.withColumn("rk", row_number().over(W).cast("long"))
        .where(col("rk") <= 20)
        .unionAll(auths.withColumn("rk",
          row_number().over(W).cast("long")).where(col("rk") <= 20))
        .select(col("kind"), col("id"), col("score"), col("rk"))
    })

  /** Exact corpus median WITHOUT a global sort: q278 runs
    * [[graft.operators.Rank.histogramMedian]] — two hash-aggregate
    * scans (coarse histogram locates the target-rank bucket, a
    * bucket-filtered value count resolves the exact order statistic).
    * The oracle is the plain rank definition; matching it proves the
    * two-scan path computes the same ⌈n/2⌉-th value `ORDER BY` would,
    * at a plan that never range-exchanges the table. */
  val q278 = QueryDef.sql("q278_histogram_median",
    """WITH v AS (SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,6))
      |    * 1000000 AS BIGINT) AS v FROM lineitem),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
      |r AS (SELECT v, row_number() OVER (ORDER BY v) AS rk FROM v)
      |SELECT n.n, r.v AS median_micro
      |FROM r, n WHERE r.rk = (n.n + 1) // 2""")(
    (s, dir) => graft.operators.Rank.histogramMedian(
        Tables.lineitem(s, dir),
        (col("l_extendedprice").cast("decimal(18,6)") * 1000000)
          .cast("long"), shift = 28)
      .select(col("n"), col("median").as("median_micro")))

  /** Quantile regression through the origin by pinball-loss grid
    * search: fit the τ=0.9 quantile of l_extendedprice as slope·
    * l_quantity by evaluating 51 candidate slopes (0..20000 step 400)
    * against the exact pinball loss — 10·loss = 9·(y−ŷ)⁺ + (p̂−y)⁺ in
    * integer centi units, so the argmin and every grid cell replay
    * exactly. Rank 1 is the fitted slope. Plan shape: one broadcast
    * cross join with the 51-row grid, map-side partial aggregation
    * collapses to 51 groups before the only shuffle; the ranking
    * window sorts 51 rows. A 100 TB fit is one pass regardless of
    * grid size. */
  val q319 = QueryDef.sql("q319_pinball_grid",
    """WITH g AS (SELECT CAST(unnest(range(0, 51)) AS BIGINT) * 400 AS slope),
      |li AS (SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
      |           AS BIGINT) AS y,
      |         CAST(l_quantity AS BIGINT) AS x FROM lineitem),
      |l AS (SELECT g.slope,
      |    CAST(sum(CASE WHEN li.y >= g.slope * li.x * 100
      |         THEN 9 * (li.y - g.slope * li.x * 100)
      |         ELSE (g.slope * li.x * 100 - li.y) END) AS BIGINT)
      |      AS loss10_centi
      |  FROM li, g GROUP BY g.slope)
      |SELECT slope, loss10_centi,
      |  CAST(row_number() OVER (ORDER BY loss10_centi, slope) AS INT)
      |    AS rnk
      |FROM l""")(
    (s, dir) => {
      // 51 unrolled conditional sums in ONE codegen'd pass (measured
      // 7.3 s as a 51× broadcast-cross-join row blowup at sf0.1 →
      // ~1 s unrolled: no row multiplication, no per-candidate group,
      // partial aggregation ships one 51-value row per partition)
      val slopes = (0 until 51).map(_ * 400L)
      val li = Tables.lineitem(s, dir).select(
        (col("l_extendedprice").cast(D182) * 100).cast("long").as("y"),
        col("l_quantity").cast("long").as("x"))
      val aggs = slopes.map { sl =>
        val pred = col("x") * lit(sl * 100L)
        sum(when(col("y") >= pred, lit(9L) * (col("y") - pred))
          .otherwise(pred - col("y"))).cast("long").as(s"l_$sl")
      }
      li.agg(aggs.head, aggs.tail: _*)
        .select(posexplode(array(slopes.map(sl => col(s"l_$sl")): _*))
          .as(Seq("i", "loss10_centi")))
        .select((col("i").cast("long") * 400L).as("slope"),
          col("loss10_centi"))
        // 51-row frame: the unpartitioned window is grid-bounded
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("loss10_centi"), col("slope"))).cast("int"))
    })

  val all: Seq[QueryDef] = Seq(q40, q41, q42, q43, q47, q51, q52, q58, q319,
    q69, q70, q72, q78, q79, q81, q83, q84, q85, q89, q90, q91, q96, q99,
    q101, q102, q103, q104, q105, q106, q107, q108, q109, q112, q113, q114,
    q167, q189, q220, q245, q253, q257, q268, q278, q290, q300, q306)
}
