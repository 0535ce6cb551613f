package graft.queries

import graft.Tables
import graft.operators.Reconcile
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Snapshot reconciliation ([[graft.operators.Reconcile]]) over a
  * deterministically drifted copy of `orders`: the B snapshot deletes
  * every 131st key, bumps the price of every 97th, and inserts a new
  * order for every 211th — the update/delete/insert drift mix a real
  * replica comparison sees. Fingerprints and drill-down are exact
  * cross-engine functions (md5-prefix row hash read as base-16 BIGINT,
  * `bit_xor` bucket aggregate, DECIMAL string rendering — doubles are
  * never rendered directly, engines disagree on float notation), so
  * both queries hash-check against a full DuckDB replay. */
object ReconcileQueries {
  private val D182 = DecimalType(18, 2)

  /** (snapshot A, drifted snapshot B) as (k, st, pr) frames. */
  private def snapshots(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val a = Tables.orders(s, dir).select(
      col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
      col("o_totalprice").cast(D182).as("pr"))
    val b = a.where(pmod(col("k"), lit(131)) =!= 0)
      .select(col("k"), col("st"),
        when(pmod(col("k"), lit(97)) === 0,
          (col("pr") + lit(1).cast(D182)).cast(D182))
          .otherwise(col("pr")).as("pr"))
      .unionByName(a.where(pmod(col("k"), lit(211)) === 0)
        .select((col("k") + lit(100000000L)).as("k"),
          lit("N").as("st"), col("pr")))
    (a, b)
  }

  private def renderCols: Seq[Column] =
    Seq(col("k").cast("string"), col("st"), col("pr").cast("string"))

  private val oracleSnapshots =
    """a AS (SELECT o_orderkey AS k, o_orderstatus AS st,
      |        CAST(o_totalprice AS DECIMAL(18,2)) AS pr FROM orders),
      |b AS (SELECT k, st,
      |        CASE WHEN k % 97 = 0 THEN CAST(pr + 1.00 AS DECIMAL(18,2))
      |             ELSE pr END AS pr
      |      FROM a WHERE k % 131 <> 0
      |      UNION ALL
      |      SELECT k + 100000000, 'N', pr FROM a WHERE k % 211 = 0),
      |ra AS (SELECT k AS key, CAST(k % 128 AS INT) AS bucket,
      |        ('0x' || substr(md5(concat_ws('|', CAST(k AS VARCHAR), st,
      |          CAST(pr AS VARCHAR))), 1, 15))::BIGINT AS h FROM a),
      |rb AS (SELECT k AS key, CAST(k % 128 AS INT) AS bucket,
      |        ('0x' || substr(md5(concat_ws('|', CAST(k AS VARCHAR), st,
      |          CAST(pr AS VARCHAR))), 1, 15))::BIGINT AS h FROM b),
      |fa AS (SELECT bucket, count(*) AS n, bit_xor(h) AS fp
      |       FROM ra GROUP BY bucket),
      |fb AS (SELECT bucket, count(*) AS n, bit_xor(h) AS fp
      |       FROM rb GROUP BY bucket),
      |d AS (SELECT COALESCE(fa.bucket, fb.bucket) AS bucket,
      |        COALESCE(fa.n, 0) AS n_a, COALESCE(fb.n, 0) AS n_b,
      |        fa.fp AS fp_a, fb.fp AS fp_b
      |      FROM fa FULL OUTER JOIN fb ON fa.bucket = fb.bucket
      |      WHERE NOT (COALESCE(fa.n, 0) = COALESCE(fb.n, 0)
      |                 AND fa.fp IS NOT DISTINCT FROM fb.fp))"""

  /** Mismatched-bucket fingerprints: the "where do 100 TB replicas
    * disagree" answer from 2 × 128 shipped rows. */
  val q161 = QueryDef.sql("q161_snapshot_diff",
    s"""WITH $oracleSnapshots
       |SELECT bucket, n_a, n_b, fp_a, fp_b FROM d""")(
    (s, dir) => {
      val (a, b) = snapshots(s, dir)
      Reconcile.diffBuckets(a, b, col("k"), renderCols, nBuckets = 128)
    })

  /** Row-level drill-down inside mismatched buckets only: changed keys
    * with the side that holds the differing version (a modified key
    * shows on both sides — old hash in A, new in B). */
  val q162 = QueryDef.sql("q162_snapshot_drilldown",
    s"""WITH $oracleSnapshots,
       |ras AS (SELECT * FROM ra WHERE bucket IN (SELECT bucket FROM d)),
       |rbs AS (SELECT * FROM rb WHERE bucket IN (SELECT bucket FROM d))
       |SELECT key, 'A' AS side FROM ras
       |WHERE NOT EXISTS (SELECT 1 FROM rbs WHERE rbs.bucket = ras.bucket
       |                  AND rbs.key = ras.key AND rbs.h = ras.h)
       |UNION ALL
       |SELECT key, 'B' AS side FROM rbs
       |WHERE NOT EXISTS (SELECT 1 FROM ras WHERE ras.bucket = rbs.bucket
       |                  AND ras.key = rbs.key AND ras.h = rbs.h)""")(
    (s, dir) => {
      val (a, b) = snapshots(s, dir)
      Reconcile.drillDown(a, b, col("k"), "k", renderCols, nBuckets = 128)
    })

  /** Incremental MV maintenance ([[graft.operators.Materialize]]):
    * the per-status (count, revenue-cents) aggregate of snapshot A,
    * MAINTAINED to snapshot B by applying only the signed delta rows
    * (inserts +1, deletes −1, updates −old +new) — never rescanning
    * the fact table. The oracle RECOMPUTES the aggregate directly over
    * B, so the driver hash proves maintenance lands bit-exactly on the
    * recompute — the invariant that lets a 100 TB warehouse refresh
    * its reporting MVs at O(|Δ|) per batch instead of O(everything).
    * Cents (exact BIGINT) rather than decimal sums: retractable sums
    * must be exact under any add/retract order. */
  val q164 = QueryDef.sql("q164_incr_agg_maintain",
    """WITH a AS (SELECT o_orderkey AS k, o_orderstatus AS st,
      |        CAST(o_totalprice AS DECIMAL(18,2)) AS pr FROM orders),
      |b AS (SELECT k, st,
      |        CASE WHEN k % 97 = 0 THEN CAST(pr + 1.00 AS DECIMAL(18,2))
      |             ELSE pr END AS pr
      |      FROM a WHERE k % 131 <> 0
      |      UNION ALL
      |      SELECT k + 100000000, 'N', pr FROM a WHERE k % 211 = 0)
      |SELECT st, count(*) AS n,
      |  CAST(sum(pr) * 100 AS BIGINT) AS cents
      |FROM b GROUP BY st""")(
    (s, dir) => {
      import graft.operators.Materialize
      val (a, b) = snapshots(s, dir)
      val cents = (col("pr") * 100).cast("long")
      val mv = Materialize.groupedMv(a, "st", cents)
      val delta = Materialize.signedDelta(a, b, "k", Seq("st", "pr"))
      Materialize.maintain(mv, delta, "st", cents)
        .select(col("st"), col("n"), col("s").as("cents"))
    })

  /** Incremental JOIN-view maintenance
    * ([[graft.operators.Materialize.maintainJoinView]]): the
    * orders ⋈ customer projection (key, market segment, cents) is
    * built on snapshot A, then MAINTAINED to the q161-drifted
    * snapshot B by retracting the touched keys and re-joining only
    * the delta rows to the dimension — the base fact table is never
    * rescanned. The oracle is the full recompute over B, which the
    * maintained view must equal row-for-row (the self-maintainability
    * identity, here hash-checked by the driver). */
  val q273 = QueryDef.sql("q273_mv_join_maintain",
    """WITH a AS (SELECT o_orderkey AS k, o_custkey AS ck,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents
      |  FROM orders),
      |b AS (SELECT k, ck,
      |    CASE WHEN k % 97 = 0 THEN cents + 100 ELSE cents END AS cents
      |  FROM a WHERE k % 131 <> 0
      |  UNION ALL
      |  SELECT k + 100000000, ck, cents FROM a WHERE k % 211 = 0)
      |SELECT b.k, c.c_mktsegment AS mkt, b.cents
      |FROM b JOIN customer c ON b.ck = c.c_custkey""")(
    (s, dir) => {
      val a = Tables.orders(s, dir).select(
        col("o_orderkey").as("k"), col("o_custkey").as("ck"),
        (col("o_totalprice").cast(D182) * 100).cast("long").as("cents"))
      val b = a.where(pmod(col("k"), lit(131)) =!= 0)
        .select(col("k"), col("ck"),
          when(pmod(col("k"), lit(97)) === 0, col("cents") + 100)
            .otherwise(col("cents")).as("cents"))
        .unionByName(a.where(pmod(col("k"), lit(211)) === 0)
          .select((col("k") + lit(100000000L)).as("k"), col("ck"),
            col("cents")))
      val dim = Tables.customer(s, dir)
        .select(col("c_custkey").as("ck"), col("c_mktsegment").as("mkt"))
      val view = a.join(dim, "ck").select(col("k"), col("mkt"),
        col("cents"))
      val delta = graft.operators.Materialize
        .signedDelta(a, b, "k", Seq("ck", "cents"))
      graft.operators.Materialize
        .maintainJoinView(view, delta, "k", dim, "ck")
    })

  val all: Seq[QueryDef] = Seq(q161, q162, q164, q273)
}
