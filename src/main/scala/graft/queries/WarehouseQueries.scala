package graft.queries

import java.sql.Date

import graft.Tables
import graft.operators.{AsOfJoin, Cdc}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Warehouse-maintenance operators (SCD2, as-of, sessionization, windows,
  * set ops) over the testdata tables, with DuckDB oracle twins.
  */
object WarehouseQueries {
  private val D182 = DecimalType(18, 2)

  /** Full SCD2 transition (`incr_loading.py:60-129` as one pure function):
    * hist₀ = suppliers with suppkey%10≠0 effective from 2021-01-01;
    * snapshot = suppliers with suppkey%7≠0, balance bumped when %3=0.
    * Exercises added (close nothing), changed (close+reopen), deleted
    * (close+tombstone) in a single run. */
  val q17 = QueryDef.sql("q17_scd2_apply",
    """WITH hist AS (
      |  SELECT s_suppkey AS sk, s_name AS name,
      |         CAST(s_acctbal AS DECIMAL(18,2)) AS bal,
      |         DATE '2021-01-01' AS effective_from,
      |         DATE '9999-12-31' AS effective_to, FALSE AS deleted_flg
      |  FROM supplier WHERE s_suppkey % 10 <> 0),
      |snap AS (
      |  SELECT s_suppkey AS sk, s_name AS name,
      |         CAST(s_acctbal + CASE WHEN s_suppkey % 3 = 0 THEN 1 ELSE 0 END
      |              AS DECIMAL(18,2)) AS bal
      |  FROM supplier WHERE s_suppkey % 7 <> 0),
      |added AS (SELECT * FROM snap WHERE sk NOT IN (SELECT sk FROM hist)),
      |deleted AS (SELECT DISTINCT h.sk, h.name, h.bal FROM hist h
      |            WHERE h.sk NOT IN (SELECT sk FROM snap)),
      |changed AS (SELECT s.* FROM snap s JOIN hist h ON s.sk = h.sk
      |            WHERE s.name IS DISTINCT FROM h.name
      |               OR s.bal IS DISTINCT FROM h.bal),
      |closekeys AS (SELECT sk FROM changed UNION SELECT sk FROM deleted),
      |untouched AS (SELECT * FROM hist
      |  WHERE NOT (sk IN (SELECT sk FROM closekeys)
      |             AND effective_to = DATE '9999-12-31')),
      |closed AS (SELECT sk, name, bal, effective_from,
      |                  DATE '2021-01-31' AS effective_to, deleted_flg
      |  FROM hist WHERE sk IN (SELECT sk FROM closekeys)
      |            AND effective_to = DATE '9999-12-31')
      |SELECT sk, name, CAST(bal AS DOUBLE) AS bal, effective_from,
      |       effective_to, deleted_flg FROM (
      |  SELECT * FROM untouched
      |  UNION ALL SELECT * FROM closed
      |  UNION ALL SELECT sk, name, bal, DATE '2021-02-01',
      |    DATE '9999-12-31', FALSE FROM added
      |  UNION ALL SELECT sk, name, bal, DATE '2021-02-01',
      |    DATE '9999-12-31', FALSE FROM changed
      |  UNION ALL SELECT sk, name, bal, DATE '2021-02-01',
      |    DATE '9999-12-31', TRUE FROM deleted) u""")(
    (s, dir) => {
      val supp = Tables.supplier(s, dir)
      val hist0 = supp.where(col("s_suppkey") % 10 =!= 0).select(
          col("s_suppkey").as("sk"), col("s_name").as("name"),
          col("s_acctbal").cast(D182).as("bal"))
        .withColumn("effective_from", lit(Date.valueOf("2021-01-01")))
        .withColumn("effective_to", lit(Cdc.OpenDate))
        .withColumn("deleted_flg", lit(false))
      val snap = supp.where(col("s_suppkey") % 7 =!= 0).select(
        col("s_suppkey").as("sk"), col("s_name").as("name"),
        (col("s_acctbal") + when(col("s_suppkey") % 3 === 0, 1).otherwise(0))
          .cast(D182).as("bal"))
      Cdc.scd2Apply(hist0, snap, Date.valueOf("2021-02-01"), "sk", Seq("name", "bal"))
        // exact decimal compares inside scd2Apply; DOUBLE only at the boundary
        .withColumn("bal", col("bal").cast("double"))
    })

  /** As-of join (union-window formulation — no pair explosion): each
    * non-purchase event gets the id of the latest at-or-before purchase by
    * the same user. The oracle states the same semantics with a window. */
  val q18 = QueryDef.sql("q18_asof_join",
    """SELECT event_id, user_id, asof_purchase_id FROM (
      |  SELECT event_id, user_id, event_type,
      |    last_value(CASE WHEN event_type = 'purchase' THEN event_id END
      |               IGNORE NULLS)
      |      OVER (PARTITION BY user_id
      |            ORDER BY ts, (event_type = 'purchase') DESC, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS asof_purchase_id
      |  FROM events) t
      |WHERE event_type <> 'purchase'""")(
    (s, dir) => {
      val e = Tables.events(s, dir)
      val right = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
      val left = e.where(col("event_type") =!= "purchase")
        .select("event_id", "user_id", "ts")
      AsOfJoin(left, right, key = "user_id", leftTs = "ts", rightTs = "ts",
          payloadCols = Seq("purchase_id"))
        .select("event_id", "user_id", "asof_purchase_id")
    })

  /** Forward as-of: each non-purchase event gets the id of the EARLIEST
    * at-or-after purchase by the same user — the reversed-ordering twin
    * of q18 (same union-window shape, no pair explosion). */
  val q67 = QueryDef.sql("q67_asof_forward",
    """SELECT event_id, user_id, asof_purchase_id FROM (
      |  SELECT event_id, user_id, event_type,
      |    last_value(CASE WHEN event_type = 'purchase' THEN event_id END
      |               IGNORE NULLS)
      |      OVER (PARTITION BY user_id
      |            ORDER BY ts DESC, (event_type = 'purchase') DESC, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS asof_purchase_id
      |  FROM events) t
      |WHERE event_type <> 'purchase'""")(
    (s, dir) => {
      val e = Tables.events(s, dir)
      val right = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
      val left = e.where(col("event_type") =!= "purchase")
        .select("event_id", "user_id", "ts")
      AsOfJoin(left, right, key = "user_id", leftTs = "ts", rightTs = "ts",
          payloadCols = Seq("purchase_id"), direction = "forward")
        .select("event_id", "user_id", "asof_purchase_id")
    })

  /** Nearest as-of with a 1-hour tolerance (pandas merge_asof
    * `direction='nearest'` semantics, ties to the backward side): both
    * window orderings share one exchange; the closer in-tolerance
    * purchase wins, no match → null. */
  val q68 = QueryDef.sql("q68_asof_nearest",
    """WITH t AS (
      |  SELECT event_id, user_id, ts, event_type,
      |    last_value(CASE WHEN event_type = 'purchase' THEN event_id END
      |               IGNORE NULLS) OVER wb AS bid,
      |    last_value(CASE WHEN event_type = 'purchase' THEN ts END
      |               IGNORE NULLS) OVER wb AS bts,
      |    last_value(CASE WHEN event_type = 'purchase' THEN event_id END
      |               IGNORE NULLS) OVER wf AS fid,
      |    last_value(CASE WHEN event_type = 'purchase' THEN ts END
      |               IGNORE NULLS) OVER wf AS fts
      |  FROM events
      |  WINDOW
      |    wb AS (PARTITION BY user_id
      |           ORDER BY ts, (event_type = 'purchase') DESC, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |    wf AS (PARTITION BY user_id
      |           ORDER BY ts DESC, (event_type = 'purchase') DESC, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |d AS (SELECT *,
      |        epoch_us(ts) - epoch_us(bts) AS bd,
      |        epoch_us(fts) - epoch_us(ts) AS fd,
      |        bts IS NOT NULL
      |          AND epoch_us(ts) - epoch_us(bts) <= 3600000000 AS bok,
      |        fts IS NOT NULL
      |          AND epoch_us(fts) - epoch_us(ts) <= 3600000000 AS fok
      |      FROM t)
      |SELECT event_id, user_id,
      |  CASE WHEN bok AND (NOT fok OR bd <= fd) THEN bid
      |       WHEN fok THEN fid END AS asof_purchase_id
      |FROM d WHERE event_type <> 'purchase'""")(
    (s, dir) => {
      val e = Tables.events(s, dir)
      val right = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
      val left = e.where(col("event_type") =!= "purchase")
        .select("event_id", "user_id", "ts")
      AsOfJoin(left, right, key = "user_id", leftTs = "ts", rightTs = "ts",
          payloadCols = Seq("purchase_id"), direction = "nearest",
          toleranceUs = Some(3600L * 1000000))
        .select("event_id", "user_id", "asof_purchase_id")
    })

  /** Running aggregate window (frame-based): per-user cumulative event
    * value; decimal so the cumulative sum is order-exact on both engines. */
  val q19 = QueryDef.sql("q19_window_running",
    """SELECT event_id, user_id,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6)))
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS DOUBLE) AS running_value
      |FROM events""")(
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir).select(col("event_id"), col("user_id"),
        sum(col("value").cast(DecimalType(18, 6))).over(w)
          .cast("double").as("running_value"))
    })

  /** Top-k per group with deterministic tiebreak (rank shape of A1). */
  val q20 = QueryDef.sql("q20_topk_per_group",
    """SELECT o_custkey, o_orderkey, rnk FROM (
      |  SELECT o_custkey, o_orderkey,
      |    row_number() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      |  FROM orders) t WHERE rnk <= 3""")(
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"), row_number().over(w).as("rnk"))
        .where(col("rnk") <= 3)
    })

  /** Set operators (UNION / INTERSECT / EXCEPT) in one tagged result. */
  val q21 = QueryDef.sql("q21_set_ops",
    """SELECT 'both' AS tag, o_custkey FROM
      |  (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |   INTERSECT
      |   SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') a
      |UNION ALL
      |SELECT 'open_only' AS tag, o_custkey FROM
      |  (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |   EXCEPT
      |   SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') b""")(
    (s, dir) => {
      val o = Tables.orders(s, dir)
      def ks(st: String) = o.where(col("o_orderstatus") === st).select("o_custkey")
      ks("O").intersect(ks("F")).withColumn("tag", lit("both"))
        .unionByName(ks("O").except(ks("F")).withColumn("tag", lit("open_only")))
        .select("tag", "o_custkey")
    })

  /** Tumbling time-window aggregation (the batch shape of a Structured
    * Streaming windowed agg): 1-hour epoch-aligned buckets. */
  val q22 = QueryDef.sql("q22_tumbling_window",
    """SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT)
      |    AS win_start,
      |  event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2""")(
    (s, dir) => Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value"))
      .select(unix_seconds(col("win.start")).as("win_start"),
        col("event_type"), col("n"), col("sum_value")))

  /** Sessionization: a new session starts after a >30-min silence per user
    * (lag + cumulative flag — the batch twin of a streaming session
    * window / flatMapGroupsWithState). */
  val q23 = QueryDef.sql("q23_sessionize",
    """WITH g AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, event_id, ts,
      |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                        ROWS UNBOUNDED PRECEDING) AS session_no
      |  FROM g)
      |SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
      |  COUNT(*) AS n_events,
      |  CAST(MIN(epoch_us(ts)) AS BIGINT) AS session_start_us
      |FROM s GROUP BY user_id, session_no""")(
    (s, dir) => {
      val wo = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wf = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .withColumn("prev_ts", lag(col("ts"), 1).over(wo))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1)
          .otherwise(0))
        .withColumn("session_no", sum(col("new_sess")).over(wf))
        .groupBy("user_id", "session_no")
        .agg(count(lit(1)).as("n_events"),
          min(unix_micros(col("ts"))).as("session_start_us"))
    })

  /** Native session_window (Spark's built-in session aggregation) —
    * checked against the same lag/cumsum SQL as q23, proving the two
    * sessionization formulations agree. */
  val q48 = QueryDef.sql("q48_session_window_native",
    """WITH g AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, ts,
      |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                        ROWS UNBOUNDED PRECEDING) AS session_no
      |  FROM g)
      |SELECT user_id,
      |  CAST(MIN(epoch_us(ts)) AS BIGINT) AS session_start_us,
      |  COUNT(*) AS n_events
      |FROM s GROUP BY user_id, session_no""")(
    (s, dir) => Tables.events(s, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        col("n_events")))

  /** Funnel conversion: for every signup, the first purchase by the
    * same user within 24 h (forward as-of with tolerance), rolled up to
    * a per-day conversion rate — the product-analytics funnel as a
    * composition of the as-of operator, NOT an event self-join (the
    * join formulation pairs every signup with every later purchase;
    * the as-of window emits exactly one candidate per signup, one
    * exchange total). The oracle replays q67/q68's double-window
    * machinery plus the tolerance gate. */
  val q80 = QueryDef.sql("q80_funnel_conversion",
    """WITH t AS (
      |  SELECT user_id, ts, event_type,
      |    last_value(CASE WHEN event_type = 'purchase' THEN event_id END
      |               IGNORE NULLS) OVER wf AS fid,
      |    last_value(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END
      |               IGNORE NULLS) OVER wf AS fts
      |  FROM events
      |  WINDOW wf AS (PARTITION BY user_id
      |                ORDER BY ts DESC, (event_type = 'purchase') DESC, event_id
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |sel AS (SELECT user_id, ts,
      |    CASE WHEN fid IS NOT NULL
      |          AND fts - epoch_us(ts) <= 86400000000 THEN fid END AS conv
      |  FROM t WHERE event_type = 'signup')
      |SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS signup_day,
      |  count(*) AS signups, count(conv) AS converted,
      |  round(CAST(count(conv) AS DOUBLE) / count(*), 6) AS conversion
      |FROM sel GROUP BY 1""")(
    (s, dir) => {
      val e = Tables.events(s, dir)
      val signups = e.where(col("event_type") === "signup")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
      graft.operators.AsOfJoin(signups, purchases, key = "user_id",
          leftTs = "ts", rightTs = "ts", payloadCols = Seq("purchase_id"),
          direction = "forward", toleranceUs = Some(86400000000L))
        // floor division (pmod form), not DIV: DuckDB's // floors while
        // DIV truncates toward zero — they disagree on pre-1970 epochs
        .groupBy(expr("(unix_micros(ts) - pmod(unix_micros(ts), 86400000000L))" +
          " DIV 86400000000L").as("signup_day"))
        .agg(count(lit(1)).as("signups"),
          count(col("asof_purchase_id")).as("converted"))
        .select(col("signup_day"), col("signups"), col("converted"),
          round(col("converted").cast("double") / col("signups"), 6)
            .as("conversion"))
    })

  /** Per-user inter-event gaps via lag over a (ts, event_id)-ordered
    * user window — heartbeat/SLA monitoring's "did the feed go quiet"
    * shape. Exact integer µs gaps; the window partitions BY USER, whose
    * event count is bounded by user activity, not corpus size — never
    * the single-partition global-window cliff. */
  val q82 = QueryDef.sql("q82_event_gaps",
    """WITH g AS (SELECT user_id,
      |    epoch_us(ts) - lag(epoch_us(ts)) OVER
      |      (PARTITION BY user_id ORDER BY ts, event_id) AS gap
      |  FROM events)
      |SELECT user_id, count(*) AS n_gaps,
      |  max(gap) AS max_gap_us,
      |  CAST(sum(gap) AS BIGINT) AS sum_gap_us,
      |  count(*) FILTER (WHERE gap > 3600000000) AS n_long
      |FROM g WHERE gap IS NOT NULL GROUP BY user_id""")(
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, dir)
        .select(col("user_id"),
          (unix_micros(col("ts")) -
            lag(unix_micros(col("ts")), 1).over(w)).as("gap"))
        .where(col("gap").isNotNull)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_gaps"),
          max(col("gap")).as("max_gap_us"),
          sum(col("gap")).as("sum_gap_us"),
          count(when(col("gap") > 3600000000L, 1)).as("n_long"))
    })

  /** SCD1 merge/upsert ([[graft.operators.Cdc.mergeUpsert]]): one
    * full-outer join applies updates (segment-wide balance adjustment),
    * inserts (new synthetic keys) and keyed deletes in a single pass —
    * the `MERGE INTO` shape. The oracle replays it as FULL JOIN +
    * source-presence CASE. Disjoint source branches by construction
    * (inserts carry fresh keys; deletes exclude the updated segment). */
  val q86 = QueryDef.sql("q86_merge_upsert",
    """WITH src AS (
      |  SELECT c_custkey, c_name, c_nationkey, c_acctbal + 100.0 AS c_acctbal,
      |         c_mktsegment, false AS del
      |  FROM customer WHERE c_mktsegment = 'BUILDING'
      |  UNION ALL
      |  SELECT c_custkey + 1000000, 'Customer#new', 0, 0.0, 'NEW', false
      |  FROM customer WHERE c_custkey % 10 = 3
      |  UNION ALL
      |  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment, true
      |  FROM customer WHERE c_custkey % 97 = 0 AND c_mktsegment <> 'BUILDING')
      |SELECT COALESCE(s.c_custkey, t.c_custkey) AS c_custkey,
      |  CASE WHEN s.c_custkey IS NOT NULL THEN s.c_name ELSE t.c_name END
      |    AS c_name,
      |  CASE WHEN s.c_custkey IS NOT NULL THEN s.c_nationkey
      |       ELSE t.c_nationkey END AS c_nationkey,
      |  CASE WHEN s.c_custkey IS NOT NULL THEN s.c_acctbal
      |       ELSE t.c_acctbal END AS c_acctbal,
      |  CASE WHEN s.c_custkey IS NOT NULL THEN s.c_mktsegment
      |       ELSE t.c_mktsegment END AS c_mktsegment
      |FROM customer t FULL JOIN src s ON t.c_custkey = s.c_custkey
      |WHERE s.c_custkey IS NULL OR NOT s.del""")(
    (s, dir) => {
      val cust = Tables.customer(s, dir)
      val updates = cust.where(col("c_mktsegment") === "BUILDING")
        .withColumn("c_acctbal", col("c_acctbal") + 100.0)
        .withColumn("del", lit(false))
      val inserts = cust.where(col("c_custkey") % 10 === 3)
        .select((col("c_custkey") + 1000000L).as("c_custkey"),
          lit("Customer#new").as("c_name"),
          lit(0).cast("int").as("c_nationkey"),
          lit(0.0).as("c_acctbal"),
          lit("NEW").as("c_mktsegment"),
          lit(false).as("del"))
      val deletes = cust
        .where(col("c_custkey") % 97 === 0 && col("c_mktsegment") =!= "BUILDING")
        .withColumn("del", lit(true))
      graft.operators.Cdc.mergeUpsert(cust,
        updates.unionByName(inserts).unionByName(deletes),
        keyCols = Seq("c_custkey"), deleteCol = Some("del"))
    })

  /** Event-type transition matrix — the Markov view of user behaviour
    * (what follows what, and how fast) that powers next-event
    * prediction features and journey dashboards. One per-user lag
    * window (user-partitioned — bounded, never global) then a
    * map-side-combined aggregation over the ~|event types|² transition
    * keys. Gap arithmetic in exact integer microseconds. */
  val q95 = QueryDef.sql("q95_event_transitions",
    """WITH s AS (SELECT user_id, event_type, epoch_us(ts) AS t,
      |    lag(event_type) OVER w AS prev_type,
      |    lag(epoch_us(ts)) OVER w AS prev_t
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT prev_type, event_type AS next_type, count(*) AS n,
      |  CAST(sum(t - prev_t) AS BIGINT) AS total_gap_us,
      |  max(t - prev_t) AS max_gap_us
      |FROM s WHERE prev_type IS NOT NULL
      |GROUP BY prev_type, next_type""")(
    (s, dir) => {
      val wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, dir)
        .select(col("event_type"),
          unix_micros(col("ts")).as("t"),
          lag(col("event_type"), 1).over(wo).as("prev_type"),
          lag(unix_micros(col("ts")), 1).over(wo).as("prev_t"))
        .where(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type").as("next_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("t") - col("prev_t")).as("total_gap_us"),
          max(col("t") - col("prev_t")).as("max_gap_us"))
    })

  /** Session entry paths: sessionize (q23's 30-minute gap), take each
    * session's first three event types in order, and count sessions per
    * path — the "how do journeys start" funnel view. The path assembles
    * in-row from a per-session sorted collect (rank ≤ 3, so the arrays
    * are 3-bounded); everything downstream of the session window is
    * map-side-combined counting. */
  val q97 = QueryDef.sql("q97_session_paths",
    """WITH g AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                        ROWS UNBOUNDED PRECEDING) AS session_no
      |  FROM g),
      |r AS (
      |  SELECT user_id, session_no, event_type,
      |    row_number() OVER (PARTITION BY user_id, session_no
      |                       ORDER BY ts, event_id) AS rn
      |  FROM s),
      |p AS (
      |  SELECT user_id, session_no,
      |    string_agg(event_type, '>' ORDER BY rn) AS path
      |  FROM r WHERE rn <= 3 GROUP BY user_id, session_no)
      |SELECT path, count(*) AS n_sessions FROM p GROUP BY path""")(
    (s, dir) => {
      val wo = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wf = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .withColumn("prev_ts", lag(col("ts"), 1).over(wo))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1)
          .otherwise(0))
        .withColumn("session_no", sum(col("new_sess")).over(wf))
        .withColumn("rn", row_number().over(Window
          .partitionBy(col("user_id"), col("session_no"))
          .orderBy(col("ts"), col("event_id"))))
        .where(col("rn") <= 3)
        .groupBy(col("user_id"), col("session_no"))
        .agg(sort_array(collect_list(struct(col("rn"), col("event_type"))))
          .as("es"))
        .select(array_join(transform(col("es"), e => e.getField("event_type")),
          ">").as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
    })

  /** Per-user burstiness: coefficient of variation of inter-event
    * gaps — CV ≈ 1 is memoryless (Poisson) traffic, CV ≫ 1 bursts,
    * CV ≪ 1 a metronome (bot signature). Gaps floor to whole seconds
    * so n·Σg² stays in BIGINT (µs² would overflow); the identity
    * CV = √(n·Σg² − S²)/S is all-integer until one correctly-rounded
    * sqrt and one division. Users whose gaps all floor to 0 s report
    * NULL (undefined mean). */
  val q186 = QueryDef.sql("q186_burstiness",
    """WITH g AS (SELECT user_id,
      |    (epoch_us(ts) - lag(epoch_us(ts)) OVER
      |      (PARTITION BY user_id ORDER BY ts, event_id)) // 1000000 AS gs
      |  FROM events),
      |a AS (SELECT user_id, count(*) AS n_gaps,
      |    CAST(sum(gs) AS BIGINT) AS s,
      |    CAST(sum(gs * gs) AS BIGINT) AS ss
      |  FROM g WHERE gs IS NOT NULL GROUP BY user_id)
      |SELECT user_id, n_gaps,
      |  round(CAST(s AS DOUBLE) / n_gaps, 6) AS mean_gap_s,
      |  CASE WHEN s = 0 THEN NULL
      |       ELSE round(sqrt(CAST(n_gaps * ss - s * s AS DOUBLE)) / s, 6)
      |  END AS cv_gap
      |FROM a""")(
    (s, dir) => {
      // DIV (truncating) == DuckDB's // (floor) here: gaps are >= 0 by
      // the window ordering
      Tables.events(s, dir)
        .select(col("user_id"),
          expr("(unix_micros(ts) - lag(unix_micros(ts), 1) OVER " +
            "(PARTITION BY user_id ORDER BY ts, event_id)) DIV 1000000")
            .as("gs"))
        .where(col("gs").isNotNull)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_gaps"), sum(col("gs")).as("s"),
          sum(col("gs") * col("gs")).as("ss"))
        .select(col("user_id"), col("n_gaps"),
          round(col("s").cast("double") / col("n_gaps"), 6).as("mean_gap_s"),
          when(col("s") === 0, lit(null).cast("double"))
            .otherwise(round(
              sqrt((col("n_gaps") * col("ss") - col("s") * col("s"))
                .cast("double")) / col("s"), 6)).as("cv_gap"))
    })

  /** Temporal cold-start audit: events split at 2024-01-24; per event
    * type, the share of post-cutoff users with NO pre-cutoff history —
    * the feature-store null-rate a time-based serve split will see.
    * See [[graft.operators.Split.temporalColdStart]]. */
  val q188 = QueryDef.sql("q188_cold_start",
    """WITH tr AS (SELECT DISTINCT user_id FROM events
      |            WHERE ts < TIMESTAMP '2024-01-24 00:00:00'),
      |u AS (SELECT event_type, user_id, count(*) AS n_ev FROM events
      |      WHERE ts >= TIMESTAMP '2024-01-24 00:00:00' GROUP BY 1, 2)
      |SELECT event_type,
      |  CAST(sum(n_ev) AS BIGINT) AS n_events,
      |  CAST(count(*) AS BIGINT) AS n_users,
      |  CAST(sum(CASE WHEN tr.user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_cold_users,
      |  round(CAST(sum(CASE WHEN tr.user_id IS NULL THEN 1 ELSE 0 END)
      |    AS DOUBLE) / count(*), 6) AS cold_ratio
      |FROM u LEFT JOIN tr ON u.user_id = tr.user_id
      |GROUP BY 1""")(
    (s, dir) => graft.operators.Split.temporalColdStart(
      Tables.events(s, dir), "user_id", "event_type", "ts",
      lit("2024-01-24 00:00:00").cast("timestamp")))

  /** Referentially-consistent sampling: a dev/staging copy of the
    * warehouse that joins EXACTLY like production — sample the
    * CUSTOMER population by md5 threshold (~1/8), then take those
    * customers' orders and those orders' lineitems in full. Sampling
    * rows independently per table would orphan nearly every foreign
    * key (a 12.5% uniform sample of orders keeps ~1.5% of order⋈cust
    * pairs); entity-rooted sampling preserves every relationship by
    * construction, and the audit columns PROVE it (zero orphans,
    * exact per-table keep shares). Scale shape: the customer filter
    * is one codegen'd md5 predicate; membership flows down via two
    * semi joins on the natural join keys — no shuffle beyond them. */
  val q233 = QueryDef.sql("q233_consistent_sample",
    """WITH sc AS (SELECT c_custkey FROM customer
      |  WHERE ('0x' || substring(md5('cs|' || CAST(c_custkey AS VARCHAR)),
      |    1, 15))::BIGINT % 8 = 0),
      |so AS (SELECT o_orderkey, o_custkey FROM orders
      |  JOIN sc ON o_custkey = sc.c_custkey),
      |sl AS (SELECT l.l_orderkey FROM lineitem l
      |  JOIN so ON l.l_orderkey = so.o_orderkey),
      |t AS (SELECT 'customer' AS tbl,
      |    (SELECT count(*) FROM sc) AS kept,
      |    (SELECT count(*) FROM customer) AS total,
      |    0 AS orphans
      |  UNION ALL SELECT 'orders', (SELECT count(*) FROM so),
      |    (SELECT count(*) FROM orders),
      |    (SELECT count(*) FROM so WHERE o_custkey NOT IN
      |      (SELECT c_custkey FROM sc))
      |  UNION ALL SELECT 'lineitem', (SELECT count(*) FROM sl),
      |    (SELECT count(*) FROM lineitem),
      |    (SELECT count(*) FROM sl WHERE l_orderkey NOT IN
      |      (SELECT o_orderkey FROM so)))
      |SELECT tbl, CAST(kept AS BIGINT) AS kept,
      |  CAST(total AS BIGINT) AS total,
      |  CAST(floor(kept * 1000000.0 / total) AS BIGINT) AS keep_ppm,
      |  CAST(orphans AS BIGINT) AS orphans
      |FROM t""")(
    (s, dir) => {
      val sc = Tables.customer(s, dir).where(
        conv(substring(md5(concat(lit("cs|"),
          col("c_custkey").cast("string"))), 1, 15), 16, 10)
          .cast("long") % 8 === 0)
        .select("c_custkey")
      val so = Tables.orders(s, dir)
        .join(sc, col("o_custkey") === col("c_custkey"), "left_semi")
        .select("o_orderkey", "o_custkey").cache()
      val sl = Tables.lineitem(s, dir)
        .join(so.select("o_orderkey"),
          col("l_orderkey") === col("o_orderkey"), "left_semi")
        .select("l_orderkey").cache()
      // orphan audit: sampled child rows whose parent is missing from
      // the sample — structurally zero under entity rooting, but
      // COMPUTED (anti-join), so a refactor that breaks the rooting
      // changes the hashed result instead of being assumed away
      def row(tbl: String, kept: org.apache.spark.sql.DataFrame,
              total: org.apache.spark.sql.DataFrame,
              orphans: org.apache.spark.sql.DataFrame) =
        kept.agg(count(lit(1)).as("kept"))
          .crossJoin(broadcast(total.agg(count(lit(1)).as("total"))))
          .crossJoin(broadcast(orphans.agg(count(lit(1)).as("orphans"))))
          .select(lit(tbl).as("tbl"), col("kept"), col("total"),
            col("orphans"))
      val oOrph = so.join(sc, col("o_custkey") === col("c_custkey"),
        "left_anti")
      val lOrph = sl.join(so.select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      row("customer", sc, Tables.customer(s, dir), sc.limit(0))
        .unionByName(row("orders", so, Tables.orders(s, dir), oOrph))
        .unionByName(row("lineitem", sl, Tables.lineitem(s, dir), lOrph))
        .select(col("tbl"), col("kept"), col("total"),
          floor(col("kept") * lit(1000000.0) / col("total")).cast("long")
            .as("keep_ppm"),
          col("orphans"))
    })

  /** Error-recovery funnel: for every 'error' event, the time until
    * the SAME user's next non-error event, bucketed at 1/5/15/60
    * minutes plus 'unrecovered' — the reliability ops metric behind
    * "did users route around the failure?". Mechanically a
    * directional same-key band join (the q13 shape with a type
    * residual) followed by a min-gap per error; cumulative bucket
    * counts are integers, shares floor-ppm. At fraud-rule scale the
    * Δ-bucketed twin (q38's operator) drops in unchanged — same key,
    * same band. */
  val q235 = QueryDef.sql("q235_error_recovery",
    """WITH err AS (SELECT event_id, user_id, epoch_us(ts) AS us
      |  FROM events WHERE event_type = 'error'),
      |nxt AS (SELECT user_id, epoch_us(ts) AS us FROM events
      |  WHERE event_type <> 'error'),
      |g AS (SELECT err.event_id, min(nxt.us - err.us) AS gap_us
      |  FROM err JOIN nxt ON err.user_id = nxt.user_id
      |    AND nxt.us > err.us AND nxt.us <= err.us + 3600000000
      |  GROUP BY 1),
      |t AS (SELECT (SELECT count(*) FROM err) AS n_err),
      |c AS (SELECT
      |    CAST(sum(CASE WHEN gap_us <= 60000000 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS m1,
      |    CAST(sum(CASE WHEN gap_us <= 300000000 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS m5,
      |    CAST(sum(CASE WHEN gap_us <= 900000000 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS m15,
      |    CAST(count(*) AS BIGINT) AS m60
      |  FROM g)
      |SELECT b.bucket, b.n,
      |  CAST(floor(b.n * 1000000.0 / t.n_err) AS BIGINT) AS share_ppm
      |FROM (SELECT 'recovered_1m' AS bucket, m1 AS n FROM c
      |  UNION ALL SELECT 'recovered_5m', m5 FROM c
      |  UNION ALL SELECT 'recovered_15m', m15 FROM c
      |  UNION ALL SELECT 'recovered_60m', m60 FROM c
      |  UNION ALL SELECT 'unrecovered', t.n_err - m60 FROM c, t) b, t""")(
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val err = ev.where(col("event_type") === "error")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"))
      val nxt = ev.where(col("event_type") =!= "error")
        .select(col("user_id").as("nuser"),
          unix_micros(col("ts")).as("nus"))
      val g = err.join(nxt, col("user_id") === col("nuser") &&
          col("nus") > col("us") &&
          col("nus") <= col("us") + 3600000000L)
        .groupBy("event_id")
        .agg(min(col("nus") - col("us")).as("gap_us"))
      val t = err.agg(count(lit(1)).as("n_err"))
      val c = g.agg(
        sum(when(col("gap_us") <= 60000000L, 1L).otherwise(0L)).as("m1"),
        sum(when(col("gap_us") <= 300000000L, 1L).otherwise(0L))
          .as("m5"),
        sum(when(col("gap_us") <= 900000000L, 1L).otherwise(0L))
          .as("m15"),
        count(lit(1)).as("m60")).crossJoin(broadcast(t))
      val rows = Seq(("recovered_1m", col("m1")),
        ("recovered_5m", col("m5")), ("recovered_15m", col("m15")),
        ("recovered_60m", col("m60")),
        ("unrecovered", col("n_err") - col("m60")))
      rows.map { case (nm, n) =>
        c.select(lit(nm).as("bucket"), n.cast("long").as("n"),
          floor(n * lit(1000000.0) / col("n_err")).cast("long")
            .as("share_ppm"))
      }.reduce(_ unionByName _)
    })

  val all: Seq[QueryDef] = Seq(q17, q18, q19, q20, q21, q22, q23, q48, q67,
    q68, q80, q82, q86, q95, q97, q186, q188, q233, q235)
}
