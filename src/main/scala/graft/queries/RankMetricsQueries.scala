package graft.queries

import graft.Tables
import graft.operators.Rank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Exact rank/order statistics — the evaluation battery a
  * training-data pipeline runs when a quality score (q221), a dedup
  * threshold (q248) or a retrieval index (q216) needs a
  * threshold-free judgment: process-mining eventually-follows
  * support, average precision, Spearman rank correlation and Kendall
  * concordance. The shared stance: every one of these is a RANK
  * statistic, so it is computable in exact integer arithmetic (no
  * libm, no float accumulation order) and replays bit-for-bit in
  * DuckDB. Quotients ship as floor-ppm integers (the q128/q216
  * rounding stance).
  *
  * Scale shapes:
  *  - Eventually-follows compresses the stream to |users| x |types|
  *    (min, max) position marginals before any pair logic — the
  *    existence of a preceding pair is a marginal comparison, so the
  *    quadratic step never touches raw events.
  *  - AP is rank-by-rank and cannot compress ties away (the
  *    tiebreak order enters the metric, as in sklearn); the window
  *    partitions by evaluation group. For one giant global ranking
  *    use the two-pass `operators.Rank.globalRank` instead of a
  *    single-partition window (measured 2x at 19M rows, SCALING.md).
  *  - Spearman is two row_number windows + one aggregate.
  *  - Kendall pairs explode quadratically, so it runs per bounded
  *    user stream (≤ ~100 events each; the blocked pair-join stance
  *    of q271) — never across the corpus.
  */
object RankMetricsQueries {

  /** q282's rank + running-positives kernel over a (grp, sc,
    * l_orderkey, l_linenumber, pos) frame, COUNT-THEN-DIALED (the
    * broadcast/graph-dial stance): grp is l_linestatus (2-3 distinct
    * values), so the window plan drains every row through that many
    * tasks — fine while a group fits one task's appetite (the window
    * plan wins below the dial: 1.15 s vs the two-pass's shuffle
    * constants at sf0.1), a 2-core ceiling past it (measured at 10×:
    * 2.4 busy cores over 8.2 s; two-pass 6.3 s and widening with
    * cores). Above the dial: with grp as the LEADING key of the
    * global order, group blocks are contiguous — two-pass distributed
    * rank/prefix (Rank.globalRank/globalPrefixSum, the q209 stance)
    * computes global rkg/cpg and subtracts each group's rows/
    * positives-before (bounded |groups|-row driver scan) for the
    * identical per-group rk/cp at full width. `twoPassAt` is
    * injectable so RankMetricsSpec can force the two-pass branch on a
    * small frame and pin row-for-row parity (ADVICE r12: the branch
    * must not exist only in the unverified 10× bench). */
  private[queries] def rankAndRunningPos(
      b: org.apache.spark.sql.DataFrame, twoPassAt: Long)
      : org.apache.spark.sql.DataFrame = {
    if (b.count() < twoPassAt) {
      val o = Window.partitionBy("grp")
        .orderBy(col("sc").desc, col("l_orderkey"), col("l_linenumber"))
      b.select(col("grp"), col("pos"),
        row_number().over(o).cast("long").as("rk"),
        sum("pos").over(
          o.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("cp"))
    } else {
      val ord: Seq[Column] =
        Seq(col("grp"), col("sc").desc, col("l_orderkey"),
          col("l_linenumber"))
      val withRank = Rank.globalOrderStats(b,
        Seq("cpg" -> "pos"), Some("rkg"), ord: _*)
      val gtot = b.groupBy("grp")
        .agg(count(lit(1)).as("gn"), sum("pos").as("gp"))
        .orderBy("grp").collect() // bounded: one row per linestatus
      var rowsB = 0L
      var posB = 0L
      val offs = gtot.toSeq.map { t =>
        val o = (t.getString(0), rowsB, posB)
        rowsB += t.getLong(1); posB += t.getLong(2); o
      }
      val offDf = broadcast(b.sparkSession.createDataFrame(offs)
        .toDF("grp", "rows_b", "pos_b"))
      withRank.join(offDf, "grp")
        .select(col("grp"), col("pos"),
          (col("rkg") - col("rows_b")).as("rk"),
          (col("cpg") - col("pos_b")).as("cp"))
    }
  }

  /** Portable floor-division for a SIGNED dividend and positive
    * divisor: `//`/DIV truncate toward zero in both engines, so
    * negative quotients need the CASE spelling (same as
    * SequenceQueries.fdiv). */
  private def fdiv(a: String, b: String, div: String): String =
    s"(CASE WHEN ($a) >= 0 THEN ($a) $div ($b)" +
      s" ELSE -(((-($a)) + ($b) - 1) $div ($b)) END)"

  /** Process-mining EVENTUALLY-FOLLOWS relation over user event
    * streams: for each ordered type pair (a, b), in how many user
    * streams does some `a` event precede some `b` event? The trick
    * that makes this ONE aggregate instead of a pair join over raw
    * events: "exists i < j with type_i = a, type_j = b" is exactly
    * min_pos(a) < max_pos(b) on the per-user (ts, event_id) rank —
    * so the fact table collapses to |users| x |types| (min_rn,
    * max_rn) marginals and the quadratic pair step runs on that
    * bounded frame (25 pairs per user here), never on raw events.
    * Complements q95's DIRECTLY-follows transitions (adjacent steps
    * only): eventually-follows is the closure process-mining tools
    * (alpha miner, heuristics miner) start from. Ships support =
    * streams where a eventually precedes b, n_both = streams
    * containing both types, and their floor-ppm ratio. */
  val q281 = QueryDef.sql("q281_eventually_follows",
    """WITH r AS (SELECT user_id, event_type,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS rn
      |  FROM events),
      |m AS (SELECT user_id, event_type,
      |    CAST(min(rn) AS BIGINT) AS mn, CAST(max(rn) AS BIGINT) AS mx
      |  FROM r GROUP BY 1, 2),
      |p AS (SELECT a.event_type AS a_type, b.event_type AS b_type,
      |    CAST(count(*) AS BIGINT) AS n_both,
      |    CAST(sum(CASE WHEN a.mn < b.mx THEN 1 ELSE 0 END)
      |      AS BIGINT) AS support
      |  FROM m a JOIN m b ON a.user_id = b.user_id
      |    AND a.event_type <> b.event_type
      |  GROUP BY 1, 2)
      |SELECT a_type, b_type, n_both, support,
      |  (support * 1000000) // n_both AS support_ppm
      |FROM p""")(
    (s, dir) => {
      val r = Tables.events(s, dir).select(col("user_id"),
        col("event_type"),
        row_number().over(Window.partitionBy("user_id")
          .orderBy("ts", "event_id")).as("rn"))
      val m = r.groupBy("user_id", "event_type")
        .agg(min("rn").cast("long").as("mn"),
          max("rn").cast("long").as("mx"))
      val a = m.toDF("user_id", "a_type", "amn", "amx")
      val b = m.toDF("user_id", "b_type", "bmn", "bmx")
      a.join(b, Seq("user_id")).where(col("a_type") =!= col("b_type"))
        .groupBy("a_type", "b_type").agg(
          count(lit(1)).as("n_both"),
          sum(when(col("amn") < col("bmx"), 1L).otherwise(0L))
            .as("support"))
        .withColumn("support_ppm",
          expr("(support * 1000000) DIV n_both"))
    })

  /** Average precision (area under the PR curve, sklearn's ranked
    * form) per lineitem status on the same score/label framing as
    * q281, plus hits in the top 100. Ranks break score ties by
    * (orderkey, linenumber) in BOTH engines, so precision@k at each
    * positive — floor(1e6 * cum_pos / k) — is the identical integer;
    * AP is their floor-mean over the positives. One window chain per
    * evaluation group; a 0-positive group ships ap_ppm = 0 rather
    * than dividing by zero. */
  val q282 = QueryDef.sql("q282_avg_precision",
    """WITH b AS (SELECT l_linestatus AS grp,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS sc,
      |    l_orderkey, l_linenumber,
      |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS pos
      |  FROM lineitem),
      |r AS (SELECT grp, pos,
      |    CAST(row_number() OVER o AS BIGINT) AS rk,
      |    CAST(sum(pos) OVER (o ROWS BETWEEN UNBOUNDED PRECEDING
      |      AND CURRENT ROW) AS BIGINT) AS cp
      |  FROM b WINDOW o AS (PARTITION BY grp
      |    ORDER BY sc DESC, l_orderkey, l_linenumber))
      |SELECT grp, CAST(max(cp) AS BIGINT) AS n_pos,
      |  CASE WHEN max(cp) = 0 THEN 0
      |    ELSE CAST(sum(CASE WHEN pos = 1
      |      THEN (cp * 1000000) // rk ELSE 0 END) AS BIGINT) // max(cp)
      |    END AS ap_ppm,
      |  CAST(sum(CASE WHEN pos = 1 AND rk <= 100 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS hits100
      |FROM r GROUP BY 1""")(
    (s, dir) => {
      val b = Tables.lineitem(s, dir).select(
        col("l_linestatus").as("grp"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
          .as("sc"),
        col("l_orderkey"), col("l_linenumber"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("pos"))
      // per-group rank + running positives, count-then-dialed between
      // the window plan and the two-pass distributed rank — see
      // rankAndRunningPos (both branches spec-pinned for parity)
      val r = rankAndRunningPos(b, twoPassAt = 2000000L)
      r.groupBy("grp").agg(max("cp").as("n_pos"),
          sum(when(col("pos") === 1,
            expr("(cp * 1000000) DIV rk")).otherwise(0L)).as("tsum"),
          sum(when(col("pos") === 1 && col("rk") <= 100, 1L)
            .otherwise(0L)).as("hits100"))
        .select(col("grp"), col("n_pos"),
          when(col("n_pos") === 0, 0L)
            .otherwise(expr("tsum DIV n_pos")).as("ap_ppm"),
          col("hits100"))
    })

  /** Spearman rank correlation between a metric and TIME per event
    * type — "is `value` drifting monotonically over the stream?", the
    * rank-robust cousin of the Theil–Sen trend (q223). Both rankings
    * are full permutations (deterministic event_id tiebreak → no
    * ties), so rho = 1 - 6*sum(d^2)/(n(n^2-1)) is exact; ships as
    * signed floor-ppm via the portable floor-div. The ppm numerator
    * n(n^2-1)*1e6 leaves BIGINT past ~60k rows per group, so the Spark
    * side computes it in DECIMAL(38,0) (exact to 1e38; quotient back
    * in BIGINT) — the 200k-row sf1 groups run exact where the long
    * formula tripped ANSI overflow. The oracle keeps BIGINT: exact at
    * oracle SFs, identical values. */
  val q283 = QueryDef.sql("q283_spearman_drift",
    s"""WITH v AS (SELECT event_type,
       |    CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)
       |      AS vm,
       |    epoch_us(ts) AS tu, event_id
       |  FROM events),
       |r AS (SELECT event_type,
       |    CAST(row_number() OVER (PARTITION BY event_type
       |      ORDER BY vm, event_id) AS BIGINT) AS rv,
       |    CAST(row_number() OVER (PARTITION BY event_type
       |      ORDER BY tu, event_id) AS BIGINT) AS rt
       |  FROM v),
       |s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum((rv - rt) * (rv - rt)) AS BIGINT) AS s_d2
       |  FROM r GROUP BY 1)
       |SELECT event_type, n, s_d2,
       |  ${fdiv("(n * (n * n - 1) - 6 * s_d2) * 1000000",
                 "n * (n * n - 1)", "//")} AS rho_ppm
       |FROM s""")(
    (s, dir) => {
      val v = Tables.events(s, dir).select(col("event_type"),
        (col("value").cast("decimal(18,6)") * 1000000).cast("long")
          .as("vm"),
        unix_micros(col("ts")).as("tu"), col("event_id"))
      val r = v.select(col("event_type"),
        row_number().over(Window.partitionBy("event_type")
          .orderBy("vm", "event_id")).cast("long").as("rv"),
        row_number().over(Window.partitionBy("event_type")
          .orderBy("tu", "event_id")).cast("long").as("rt"))
      // the ppm numerator n(n²−1)·1e6 leaves BIGINT past ~60k rows per
      // group (the scaladoc's documented upgrade point — the 200k-row
      // sf1 event-type groups tripped ANSI overflow in the round-12
      // second-decade bench), so it rides DECIMAL(38,0); the floor-div
      // quotient lands back in BIGINT (|rho_ppm| ≤ 1e6) and every value
      // and the output schema are unchanged, so the DuckDB oracle
      // (exact BIGINT at oracle SFs) stays green untouched
      val nDec = "CAST(n AS DECIMAL(38,0))"
      r.groupBy("event_type").agg(count(lit(1)).as("n"),
          sum((col("rv") - col("rt")) * (col("rv") - col("rt")))
            .as("s_d2"))
        .withColumn("rho_ppm", expr(fdiv(
          s"($nDec * ($nDec * n - 1) - 6 * CAST(s_d2 AS DECIMAL(38,0)))" +
            " * 1000000",
          s"$nDec * ($nDec * n - 1)", "DIV")))
    })

  /** Kendall concordance of each user's value stream with time:
    * exact concordant / discordant / value-tie pair counts from a
    * blocked self-join WITHIN the user's (ts, event_id)-ordered
    * stream — pairs never cross users, so the quadratic blowup is
    * bounded by the ~100-event stream length (same blocking stance
    * as the q271 edit-distance pairs), ~5k pairs per user. tau_a =
    * (nc - nd) / (n(n-1)/2) as signed floor-ppm; streams shorter
    * than 2 events are excluded (tau undefined). */
  val q284 = QueryDef.sql("q284_kendall_time",
    s"""WITH r AS (SELECT user_id,
       |    CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)
       |      AS vm,
       |    row_number() OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS rn
       |  FROM events),
       |p AS (SELECT a.user_id,
       |    CAST(count(*) FILTER (WHERE b.vm > a.vm) AS BIGINT) AS nc,
       |    CAST(count(*) FILTER (WHERE b.vm < a.vm) AS BIGINT) AS nd,
       |    CAST(count(*) FILTER (WHERE b.vm = a.vm) AS BIGINT) AS tv
       |  FROM r a JOIN r b ON a.user_id = b.user_id AND a.rn < b.rn
       |  GROUP BY 1),
       |n AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n
       |  FROM r GROUP BY 1)
       |SELECT n.user_id, n.n, p.nc, p.nd, p.tv,
       |  ${fdiv("(p.nc - p.nd) * 2000000", "n.n * (n.n - 1)", "//")}
       |    AS tau_a_ppm
       |FROM n JOIN p ON n.user_id = p.user_id
       |WHERE n.n >= 2""")(
    (s, dir) => {
      val r = Tables.events(s, dir).select(col("user_id"),
        (col("value").cast("decimal(18,6)") * 1000000).cast("long")
          .as("vm"),
        row_number().over(Window.partitionBy("user_id")
          .orderBy("ts", "event_id")).as("rn"))
      val a = r.toDF("user_id", "va", "ra")
      val b = r.toDF("user_id", "vb", "rb")
      val p = a.join(b, Seq("user_id")).where(col("ra") < col("rb"))
        .groupBy("user_id").agg(
          sum(when(col("vb") > col("va"), 1L).otherwise(0L)).as("nc"),
          sum(when(col("vb") < col("va"), 1L).otherwise(0L)).as("nd"),
          sum(when(col("vb") === col("va"), 1L).otherwise(0L)).as("tv"))
      val n = r.groupBy("user_id").agg(count(lit(1)).as("n"))
      n.join(p, "user_id").where(col("n") >= 2)
        .select(col("user_id"), col("n"), col("nc"), col("nd"),
          col("tv"),
          expr(fdiv("(nc - nd) * 2000000", "n * (n - 1)", "DIV"))
            .as("tau_a_ppm"))
    })

  def all: Seq[QueryDef] = Seq(q281, q282, q283, q284)
}
