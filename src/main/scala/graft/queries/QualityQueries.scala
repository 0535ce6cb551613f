package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Entity-resolution blocking ([[graft.operators.Linkage]]) and
  * declared data-quality constraints ([[graft.operators.Profile]]). */
object QualityQueries {

  /** Sorted-neighborhood duplicate-account candidates: customers
    * ordered by (balance, key), each compared to its 5 successors,
    * kept when they share a nation and sit within 1.00 of balance —
    * the classic merge/purge blocking pass at O(n·w) candidate pairs
    * instead of the O(n²) cross join. Distributed form: two-pass
    * global rank (no single-task window) + an EQUI-join on rank slots;
    * the DuckDB oracle replays the neighborhood with a row_number
    * window and a rank-band self-join. Balances compare in exact
    * DECIMAL cents, so the boundary predicate can't straddle an IEEE
    * rounding difference between engines. */
  val q165 = QueryDef.sql("q165_sorted_neighborhood",
    """WITH r AS (SELECT c_custkey, c_nationkey,
      |    CAST(c_acctbal AS DECIMAL(12,2)) AS bal,
      |    row_number() OVER (ORDER BY c_acctbal, c_custkey) AS rn
      |  FROM customer)
      |SELECT a.c_custkey AS a_id, b.c_custkey AS b_id,
      |  b.rn - a.rn AS rank_gap,
      |  CAST(b.bal * 100 - a.bal * 100 AS BIGINT) AS gap_cents
      |FROM r a JOIN r b
      |  ON b.rn - a.rn BETWEEN 1 AND 5
      |WHERE a.c_nationkey = b.c_nationkey
      |  AND b.bal - a.bal <= CAST(1.00 AS DECIMAL(12,2))""")(
    (s, dir) => {
      import graft.operators.Linkage
      val c = Tables.customer(s, dir).select(
        col("c_custkey"), col("c_nationkey"),
        col("c_acctbal").cast("decimal(12,2)").as("bal"),
        col("c_acctbal"))
      Linkage.sortedNeighborhood(c, 5, col("c_acctbal"), col("c_custkey"))
        .where(col("a_c_nationkey") === col("b_c_nationkey") &&
          col("b_bal") - col("a_bal") <= lit(1.00).cast("decimal(12,2)"))
        .select(col("a_c_custkey").as("a_id"), col("b_c_custkey").as("b_id"),
          col("rank_gap"),
          (col("b_bal") * 100 - col("a_bal") * 100).cast("long")
            .as("gap_cents"))
    })

  /** Declared-constraint evaluation (the Deequ shape): the warehouse
    * intake contract for `orders` — completeness, key uniqueness,
    * value ranges, status domain, date bounds — each a
    * violation-counting aggregate in ONE pass over one scan, plus the
    * cross-table referential check as its own anti-join frame. Output
    * is the audit table a 100 TB intake gate writes per batch:
    * `(constraint, metric, passed)`, all-integer so every cell is
    * exact on any engine. */
  val q166 = QueryDef.sql("q166_constraint_suite",
    """WITH o AS (
      |  SELECT 'orders.o_orderkey.complete' AS "constraint",
      |      count(*) - count(o_orderkey) AS metric FROM orders
      |  UNION ALL
      |  SELECT 'orders.o_orderkey.unique',
      |      count(*) - count(DISTINCT o_orderkey) FROM orders
      |  UNION ALL
      |  SELECT 'orders.o_totalprice.positive',
      |      sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) FROM orders
      |  UNION ALL
      |  SELECT 'orders.o_orderstatus.domain',
      |      sum(CASE WHEN o_orderstatus NOT IN ('O','F','P')
      |               THEN 1 ELSE 0 END) FROM orders
      |  UNION ALL
      |  SELECT 'orders.o_orderdate.bounds',
      |      sum(CASE WHEN o_orderdate < TIMESTAMP '1992-01-01'
      |               OR o_orderdate >= TIMESTAMP '2000-01-01'
      |               THEN 1 ELSE 0 END) FROM orders
      |  UNION ALL
      |  SELECT 'orders.o_custkey.in.customer',
      |      (SELECT count(*) FROM orders o
      |       WHERE o.o_custkey IS NOT NULL AND NOT EXISTS
      |         (SELECT 1 FROM customer c
      |          WHERE c.c_custkey = o.o_custkey)))
      |SELECT "constraint", CAST(metric AS BIGINT) AS metric,
      |  CAST(CASE WHEN metric <= 0 THEN 1 ELSE 0 END AS BIGINT) AS passed
      |FROM o""")(
    (s, dir) => {
      import graft.operators.Profile
      import graft.operators.Profile.MetricCheck
      val orders = Tables.orders(s, dir)
      val suite = Profile.checkSuite(orders, Seq(
        MetricCheck("orders.o_orderkey.complete",
          count(lit(1)) - count(col("o_orderkey"))),
        MetricCheck("orders.o_orderkey.unique",
          count(lit(1)) - count_distinct(col("o_orderkey"))),
        MetricCheck("orders.o_totalprice.positive",
          sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L))),
        MetricCheck("orders.o_orderstatus.domain",
          sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L)
            .otherwise(0L))),
        MetricCheck("orders.o_orderdate.bounds",
          sum(when(col("o_orderdate") < to_timestamp(lit("1992-01-01")) ||
            col("o_orderdate") >= to_timestamp(lit("2000-01-01")), 1L)
            .otherwise(0L)))))
      suite.unionByName(Profile.referentialCheck(
        "orders.o_custkey.in.customer",
        orders, "o_custkey",
        broadcast(Tables.customer(s, dir)), "c_custkey"))
    })

  val all: Seq[QueryDef] = Seq(q165, q166)
}
