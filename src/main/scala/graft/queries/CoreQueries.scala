package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** SURVEY.md §2 relational operators re-expressed over the testdata star
  * schema, each with its DuckDB oracle (driver contract).
  *
  * Conventions for cross-engine hash parity:
  *  - aggregates over doubles are cast to DECIMAL before summing (exact,
  *    order-insensitive) — never sum raw doubles across a shuffle;
  *  - but every FINAL decimal column is cast to DOUBLE at the output
  *    boundary (and likewise in the oracle SQL): the driver harness reads
  *    Spark parquet with pandas (DECIMAL → object) and DuckDB via .df()
  *    (DECIMAL/HUGEINT → float64), so only DOUBLE⇔DOUBLE and
  *    BIGINT⇔BIGINT hash-match. The decimal→double cast is deterministic
  *    (exact unscaled < 2^53, one correctly-rounded division) so both
  *    engines produce bit-identical doubles;
  *  - DuckDB integer SUMs widen to HUGEINT → wrap in CAST(... AS BIGINT);
  *  - time arithmetic uses integer epoch micros (`unix_micros` ⇔
  *    DuckDB `epoch_us`), never fractional seconds;
  *  - every computed column is aliased identically on both sides.
  *
  * Scale notes are inline per query; dimension tables (region, nation,
  * customer, supplier, part) are explicitly `broadcast()` so the fact
  * scan never shuffles for a dim lookup.
  */
object CoreQueries {
  private val D182 = DecimalType(18, 2)

  /** P1/P5/P6: projection + filter; both reach the parquet scan
    * (PushedFilters + 3-column ReadSchema). */
  val q01 = QueryDef.sql("q01_scan_filter_project",
    """SELECT l_orderkey, l_partkey, l_quantity
      |FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'""")(
    (s, dir) => Tables.lineitem(s, dir)
      .where(col("l_quantity") > 45 && col("l_returnflag") === "R")
      .select("l_orderkey", "l_partkey", "l_quantity"))

  /** P2/P3: literal projection + CONCAT with COALESCE null handling
    * (fio-style, `loading_rep_fraud.py:20`). */
  val q02 = QueryDef.sql("q02_scalar_concat",
    """SELECT c_custkey,
      |  concat(c_name, ' ', coalesce(c_mktsegment, '')) AS fio,
      |  'master' AS src,
      |  CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal
      |FROM customer""")(
    (s, dir) => Tables.customer(s, dir).select(
      col("c_custkey"),
      concat(col("c_name"), lit(" "), coalesce(col("c_mktsegment"), lit(""))).as("fio"),
      lit("master").as("src"),
      col("c_acctbal").cast(D182).cast("double").as("bal")))

  /** S2: decimal-comma normalization (`main.py:49`): string amount with a
    * comma separator → DECIMAL(10,2). */
  val q03 = QueryDef.sql("q03_decimal_comma",
    """SELECT l_orderkey, l_linenumber,
      |  CAST(CAST(replace(replace(CAST(l_quantity AS VARCHAR), '.', ','), ',', '.')
      |       AS DECIMAL(10,2)) AS DOUBLE) AS amount
      |FROM lineitem""")(
    (s, dir) => Tables.lineitem(s, dir).select(
      col("l_orderkey"), col("l_linenumber"),
      regexp_replace(
        regexp_replace(col("l_quantity").cast("string"), lit("\\."), lit(",")),
        lit(","), lit("."))
        .cast(DecimalType(10, 2)).cast("double").as("amount")))

  /** Aggregation (TPC-H Q1 shape): map-side partial agg + one shuffle on
    * the two grouping keys; decimal sums are exact at any parallelism. */
  val q04 = QueryDef.sql("q04_agg_groupby",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus""")(
    (s, dir) => Tables.lineitem(s, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast(D182)).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(D182)).cast("double").as("sum_base_price"),
        count(lit(1)).as("count_order")))

  /** S4/A3: batch-date extraction — deterministic `min` instead of the
    * reference's first-row pick (`main.py:53`). */
  val q05 = QueryDef.sql("q05_batch_date",
    "SELECT CAST(MIN(l_shipdate) AS DATE) AS batch_date FROM lineitem")(
    (s, dir) => Tables.lineitem(s, dir)
      .agg(min(col("l_shipdate")).cast("date").as("batch_date")))

  /** A2/S15: row counting + distinct counting. */
  val q06 = QueryDef.sql("q06_counts",
    """SELECT COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users,
      |  COUNT(DISTINCT event_type) AS n_types
      |FROM events""")(
    (s, dir) => Tables.events(s, dir).agg(
      count(lit(1)).as("n_events"),
      countDistinct(col("user_id")).as("n_users"),
      countDistinct(col("event_type")).as("n_types")))

  /** J1/J2: anti semi-join (NOT EXISTS), `comm_funcs.py:50-54`. */
  val q07 = QueryDef.sql("q07_anti_join",
    """SELECT c_custkey, c_name FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)""")(
    (s, dir) => Tables.customer(s, dir)
      .join(Tables.orders(s, dir).where(col("o_totalprice") > 100000)
          .select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"), "left_anti")
      .select("c_custkey", "c_name"))

  /** J3: reversed anti-join (history rows absent from snapshot),
    * `incr_loading.py:36-39`. */
  val q08 = QueryDef.sql("q08_anti_join_rev",
    """SELECT p_partkey, p_name FROM part p
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem l
      |  WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 40)""")(
    (s, dir) => Tables.part(s, dir)
      .join(Tables.lineitem(s, dir).where(col("l_quantity") > 40)
          .select(col("l_partkey").as("p_partkey")),
        Seq("p_partkey"), "left_anti")
      .select("p_partkey", "p_name"))

  /** J5: semi-join (EXISTS) — the key-membership split used by the SCD2
    * close step (`incr_loading.py:82`). */
  val q09 = QueryDef.sql("q09_semi_join",
    """SELECT s_suppkey, s_name FROM supplier s
      |WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey)""")(
    (s, dir) => Tables.supplier(s, dir)
      .join(Tables.lineitem(s, dir).select(col("l_suppkey").as("s_suppkey")),
        Seq("s_suppkey"), "left_semi")
      .select("s_suppkey", "s_name"))

  /** J4/P10: changed-row detection via null-safe inequality
    * (`IS DISTINCT FROM`, `incr_loading.py:52-56`) between two derived
    * snapshots of per-customer order stats. */
  val q10 = QueryDef.sql("q10_cdc_changed_rows",
    """WITH snap_a AS (
      |  SELECT o_custkey AS cust, COUNT(*) AS n_ord,
      |         CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS max_price
      |  FROM orders WHERE o_orderkey % 2 = 0 GROUP BY o_custkey),
      |snap_b AS (
      |  SELECT o_custkey AS cust, COUNT(*) AS n_ord,
      |         CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS max_price
      |  FROM orders WHERE o_orderkey % 2 = 1 GROUP BY o_custkey)
      |SELECT a.cust, a.n_ord AS n_ord_a, b.n_ord AS n_ord_b,
      |       CAST(a.max_price AS DOUBLE) AS max_price_a,
      |       CAST(b.max_price AS DOUBLE) AS max_price_b
      |FROM snap_a a JOIN snap_b b ON a.cust = b.cust
      |WHERE a.n_ord IS DISTINCT FROM b.n_ord
      |   OR a.max_price IS DISTINCT FROM b.max_price""")(
    (s, dir) => {
      val o = Tables.orders(s, dir)
      def snap(parity: Int) = o.where(col("o_orderkey") % 2 === parity)
        .groupBy(col("o_custkey").as("cust"))
        .agg(count(lit(1)).as("n_ord"),
             max(col("o_totalprice")).cast(D182).as("max_price"))
      val a = snap(0).as("a")
      val b = snap(1).as("b")
      a.join(b, col("a.cust") === col("b.cust") &&
          (!(col("a.n_ord") <=> col("b.n_ord")) ||
           !(col("a.max_price") <=> col("b.max_price"))))
        .select(col("a.cust").as("cust"),
          col("a.n_ord").as("n_ord_a"), col("b.n_ord").as("n_ord_b"),
          col("a.max_price").cast("double").as("max_price_a"),
          col("b.max_price").cast("double").as("max_price_b"))
    })

  /** J6: the cards→accounts→clients master chain
    * (`loading_rep_fraud.py:25-27`) as fact→orders→customer→nation→region.
    * Dims are broadcast: the only shuffle is the final group-by. */
  val q11 = QueryDef.sql("q11_join_chain",
    """SELECT n.n_name, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM lineitem l
      |JOIN orders o   ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n   ON c.c_nationkey = n.n_nationkey
      |JOIN region r   ON n.n_regionkey = r.r_regionkey
      |WHERE o.o_orderstatus = 'F'
      |GROUP BY n.n_name""")(
    (s, dir) => Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).where(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_items"),
           sum(col("l_extendedprice").cast(D182)).cast("double").as("sum_price")))

  /** J7: left-outer blacklist-style lookup with a filtering join condition
    * (`loading_rep_fraud.py:28`): negative-balance customers as the
    * "blacklist", hit flag from the null test (P11). */
  val q12 = QueryDef.sql("q12_left_join_lookup",
    """SELECT o.o_orderkey, o.o_orderstatus,
      |  (c.c_custkey IS NOT NULL) AS flagged
      |FROM orders o
      |LEFT JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_acctbal < 0""")(
    (s, dir) => {
      val c = broadcast(Tables.customer(s, dir).where(col("c_acctbal") < 0)).as("c")
      Tables.orders(s, dir).as("o")
        .join(c, col("o.o_custkey") === col("c.c_custkey"), "left")
        .select(col("o.o_orderkey"), col("o.o_orderstatus"),
          col("c.c_custkey").isNotNull.as("flagged"))
    })

  /** J8/P7: same-key pair band self-join within one hour
    * (`loading_rep_fraud.py:74-76`) — equi key `user_id` + time-band
    * residual, integer-microsecond arithmetic on both engines. */
  val q13 = QueryDef.sql("q13_band_pairs",
    """SELECT e1.event_id AS id1, e2.event_id AS id2, e1.user_id,
      |  epoch_us(e2.ts) - epoch_us(e1.ts) AS gap_us
      |FROM events e1
      |JOIN events e2 ON e1.user_id = e2.user_id AND e1.ts < e2.ts
      |  AND epoch_us(e2.ts) - epoch_us(e1.ts) < 3600000000""")(
    (s, dir) => {
      val e = Tables.events(s, dir)
      val e1 = e.as("e1")
      val e2 = e.as("e2")
      e1.join(e2,
          col("e1.user_id") === col("e2.user_id") &&
          col("e1.ts") < col("e2.ts") &&
          unix_micros(col("e2.ts")) - unix_micros(col("e1.ts")) < 3600000000L)
        .select(col("e1.event_id").as("id1"), col("e2.event_id").as("id2"),
          col("e1.user_id").as("user_id"),
          (unix_micros(col("e2.ts")) - unix_micros(col("e1.ts"))).as("gap_us"))
    })

  /** J9: point-in-interval join (SCD2 validity lookup shape,
    * `loading_rep_fraud.py:80-83`): equi key + BETWEEN residual. */
  val q14 = QueryDef.sql("q14_interval_join",
    """SELECT l.l_orderkey, l.l_linenumber, CAST(o.o_orderdate AS DATE) AS odate
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  AND l.l_shipdate BETWEEN o.o_orderdate AND o.o_orderdate + INTERVAL 60 DAY""")(
    (s, dir) => Tables.lineitem(s, dir).as("l")
      .join(Tables.orders(s, dir).as("o"),
        col("l.l_orderkey") === col("o.o_orderkey") &&
        col("l.l_shipdate").between(col("o.o_orderdate"),
          col("o.o_orderdate") + expr("INTERVAL 60 DAYS")))
      .select(col("l.l_orderkey"), col("l.l_linenumber"),
        col("o.o_orderdate").cast("date").as("odate")))

  /** A1: DISTINCT ON → deterministic first-row-per-group via row_number
    * with an explicit tiebreak (SURVEY §7 quirk 2). */
  val q15 = QueryDef.sql("q15_distinct_on",
    """SELECT user_id, day, event_id, value FROM (
      |  SELECT user_id, CAST(ts AS DATE) AS day, event_id, value,
      |    row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
      |                       ORDER BY ts, event_id) AS rn
      |  FROM events) t WHERE rn = 1""")(
    (s, dir) => {
      val e = Tables.events(s, dir).withColumn("day", col("ts").cast("date"))
      val w = Window.partitionBy(col("user_id"), col("day"))
        .orderBy(col("ts"), col("event_id"))
      e.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select("user_id", "day", "event_id", "value")
    })

  /** J11/P12: rule-4 shape — triple same-key chain, consecutive gaps and
    * total span < 20 min, strictly decreasing value
    * (`loading_rep_fraud.py:107-122`). */
  val q16 = QueryDef.sql("q16_triple_band",
    """SELECT e1.event_id AS id1, e2.event_id AS id2, e3.event_id AS id3,
      |  e1.user_id
      |FROM events e1
      |JOIN events e2 ON e1.user_id = e2.user_id AND e1.ts < e2.ts
      |  AND epoch_us(e2.ts) - epoch_us(e1.ts) < 3600000000
      |JOIN events e3 ON e2.user_id = e3.user_id AND e2.ts < e3.ts
      |  AND epoch_us(e3.ts) - epoch_us(e2.ts) < 3600000000
      |WHERE epoch_us(e3.ts) - epoch_us(e1.ts) < 3600000000
      |  AND e1.value > e2.value AND e2.value > e3.value""")(
    (s, dir) => {
      val e = Tables.events(s, dir)
      def a(n: String) = e.as(n)
      def us(n: String) = unix_micros(col(s"$n.ts"))
      a("e1")
        .join(a("e2"), col("e1.user_id") === col("e2.user_id") &&
          col("e1.ts") < col("e2.ts") && (us("e2") - us("e1") < 3600000000L))
        .join(a("e3"), col("e2.user_id") === col("e3.user_id") &&
          col("e2.ts") < col("e3.ts") && (us("e3") - us("e2") < 3600000000L))
        .where(us("e3") - us("e1") < 3600000000L &&
          col("e1.value") > col("e2.value") && col("e2.value") > col("e3.value"))
        .select(col("e1.event_id").as("id1"), col("e2.event_id").as("id2"),
          col("e3.event_id").as("id3"), col("e1.user_id").as("user_id"))
    })

  /** J8 again via the range-bucketed rewrite (graft.operators.BandJoin):
    * same oracle as q13 — both formulations must hash-match it. At scale
    * the bucketed plan replaces the per-key quadratic fan-out with
    * adjacent-Δ-bucket joins. */
  val q38 = QueryDef.sql("q38_band_pairs_bucketed",
    """SELECT e1.event_id AS id1, e2.event_id AS id2, e1.user_id,
      |  epoch_us(e2.ts) - epoch_us(e1.ts) AS gap_us
      |FROM events e1
      |JOIN events e2 ON e1.user_id = e2.user_id AND e1.ts < e2.ts
      |  AND epoch_us(e2.ts) - epoch_us(e1.ts) < 3600000000""")(
    (s, dir) => {
      val e = Tables.events(s, dir).select("event_id", "user_id", "ts")
      graft.operators.BandJoin.pairsWithin(e, "user_id", "ts",
          3600L * 1000000L, Seq("event_id"))
        .select(col("event_id_1").as("id1"), col("event_id_2").as("id2"),
          col("user_id"),
          (unix_micros(col("ts_2")) - unix_micros(col("ts_1"))).as("gap_us"))
    })

  /** q38's Δ-bucket rewrite under the hot-bucket SALT dial (salt=8):
    * one hot (key, bucket) pair spreads over 8 tasks via a
    * deterministic content-hash salt on one side and an 8-way replicate
    * on the other — same oracle as q13/q38, so the salted plan must
    * hash-match the naive semantics exactly. */
  val q340 = QueryDef.sql("q340_band_pairs_salted",
    """SELECT e1.event_id AS id1, e2.event_id AS id2, e1.user_id,
      |  epoch_us(e2.ts) - epoch_us(e1.ts) AS gap_us
      |FROM events e1
      |JOIN events e2 ON e1.user_id = e2.user_id AND e1.ts < e2.ts
      |  AND epoch_us(e2.ts) - epoch_us(e1.ts) < 3600000000""")(
    (s, dir) => {
      val e = Tables.events(s, dir).select("event_id", "user_id", "ts")
      graft.operators.BandJoin.pairsWithin(e, "user_id", "ts",
          3600L * 1000000L, Seq("event_id"), salt = 8)
        .select(col("event_id_1").as("id1"), col("event_id_2").as("id2"),
          col("user_id"),
          (unix_micros(col("ts_2")) - unix_micros(col("ts_1"))).as("gap_us"))
    })

  val all: Seq[QueryDef] = Seq(q01, q02, q03, q04, q05, q06, q07, q08,
    q09, q10, q11, q12, q13, q14, q15, q16, q38, q340)
}
