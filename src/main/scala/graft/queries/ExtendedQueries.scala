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

  def all: Seq[QueryDef] = Seq(q115, q116)
}
