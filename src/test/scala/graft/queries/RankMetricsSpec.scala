package graft.queries

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the rank-metric family (q281–q284) beyond the hash
  * oracle: brute-force O(n^2) pair replays of AUC and Kendall, a
  * direct precision@k replay of AP, and the Spearman closed form
  * recomputed from scratch rankings. Runs at sf0.001. */
class RankMetricsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sf)

  private lazy val lineitems = graft.Tables.lineitem(spark, sf)
    .select(col("l_linestatus"),
      (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long"),
      col("l_returnflag"), col("l_orderkey"), col("l_linenumber"))
    .collect()
    .map(r => (r.getString(0), r.getLong(1), r.getString(2) == "R",
      r.getLong(3), r.getInt(4)))

  test("q281: eventually-follows equals the brute-force pair scan") {
    val rows = run("q281_eventually_follows").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // brute force: for each user stream and ordered type pair, does
    // ANY a-event strictly precede (in (ts, event_id) order) a b-event
    val byUser = events.groupBy(_._2)
    val types = events.map(_._1).distinct.sorted
    for (a <- types; b <- types if a != b) {
      var nBoth = 0L; var support = 0L
      for ((_, es) <- byUser) {
        val seq = es.sortBy(e => (e._4, e._5)).map(_._1)
        if (seq.contains(a) && seq.contains(b)) {
          nBoth += 1
          if (seq.indexOf(a) < seq.lastIndexOf(b)) support += 1
        }
      }
      if (nBoth == 0) assert(!rows.contains((a, b)))
      else {
        val (qb, qs, ppm) = rows((a, b))
        assert(qb == nBoth && qs == support)
        assert(ppm == support * 1000000L / nBoth)
      }
    }
  }

  test("q282: AP equals the scalar precision@k walk") {
    val rows = run("q282_avg_precision").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    for ((grp, ls) <- lineitems.groupBy(_._1)) {
      val ranked = ls.sortBy { case (_, sc, _, ok, ln) => (-sc, ok, ln) }
      var cp = 0L; var tsum = 0L; var hits100 = 0L
      for ((x, i) <- ranked.zipWithIndex) {
        val k = i + 1L
        if (x._3) {
          cp += 1
          tsum += cp * 1000000L / k
          if (k <= 100) hits100 += 1
        }
      }
      val (nPos, apPpm, h100) = rows(grp)
      assert(nPos == cp && h100 == hits100)
      assert(apPpm == (if (cp == 0) 0L else tsum / cp))
    }
  }

  private lazy val events = graft.Tables.events(spark, sf)
    .select(col("event_type"), col("user_id"),
      (col("value").cast("decimal(18,6)") * 1000000).cast("long"),
      unix_micros(col("ts")), col("event_id"))
    .collect()
    .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4)))

  test("q283: Spearman rho matches scratch rankings (and is in range)") {
    val rows = run("q283_spearman_drift").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    for ((et, es) <- events.groupBy(_._1)) {
      val byVal = es.sortBy(e => (e._3, e._5)).map(_._5)
        .zipWithIndex.toMap
      val byTime = es.sortBy(e => (e._4, e._5)).map(_._5)
        .zipWithIndex.toMap
      val s = es.map { e =>
        val d = byVal(e._5).toLong - byTime(e._5).toLong; d * d
      }.sum
      val n = es.length.toLong
      val (qn, qs, rho) = rows(et)
      assert(qn == n && qs == s)
      val dd = n * (n * n - 1)
      assert(rho == Math.floorDiv((dd - 6 * s) * 1000000L, dd))
      assert(rho >= -1000000L && rho <= 1000000L)
    }
  }

  test("q301/q302: variants and DFG latency replay from scalar streams") {
    val variants = run("q301_journey_variants").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val byUser = events.groupBy(_._2)
    val sigs = byUser.values.map { es =>
      es.sortBy(e => (e._4, e._5)).take(30).map(_._1.take(1)).mkString
    }.toSeq
    val vc = sigs.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (s, n) => (-n, s) }
    val tot = sigs.size.toLong
    var cum = 0L
    val want = vc.take(10).zipWithIndex.map { case ((sg, n), i) =>
      cum += n
      (i + 1L, sg, n, vc.size.toLong, cum * 1000000L / tot)
    }
    assert(variants.sortBy(_._1).toSeq == want)

    val dfg = run("q302_dfg_latency").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val gaps = scala.collection.mutable
      .Map.empty[(String, String), Vector[Long]].withDefaultValue(Vector())
    for (es <- byUser.values) {
      val seq = es.sortBy(e => (e._4, e._5))
      for (Seq(a, b) <- seq.sliding(2).map(_.toSeq) if seq.length > 1)
        gaps((a._1, b._1)) :+= (b._4 - a._4)
    }
    for ((k, gs) <- gaps) {
      val sorted = gs.sorted
      val n = sorted.length
      val (qn, med, p90) = dfg(k)
      assert(qn == n, k)
      assert(med == sorted((n + 1) / 2 - 1), k)
      assert(p90 == sorted(((n * 9 + 9) / 10 - 1).toInt), k)
    }
    assert(dfg.keySet == gaps.keySet)
  }

  test("q308: Gini stump equals the brute-force best split") {
    val row = run("q308_gini_stump").collect().head
    val data = lineitems.map(l => (l._2, if (l._3) 1L else 0L))
    val byScore = data.groupBy(_._1).toArray.sortBy(_._1)
      .map { case (sc, xs) =>
        (sc, xs.map(_._2).sum, xs.length.toLong - xs.map(_._2).sum) }
    val tp = byScore.map(_._2).sum; val tq = byScore.map(_._3).sum
    val n = tp + tq
    var (cp, cq) = (0L, 0L)
    var best: (Long, Long) = (Long.MaxValue, Long.MaxValue)
    var bestRow: (Long, Long, Long, Long, Long) = null
    for ((sc, p, q) <- byScore) {
      cp += p; cq += q
      val nl = cp + cq; val nr = n - nl
      if (nl > 0 && nr > 0) {
        val g = (nl * nl - cp * cp - cq * cq) * 1000000L / (nl * n) +
          (nr * nr - (tp - cp) * (tp - cp) - (tq - cq) * (tq - cq)) *
            1000000L / (nr * n)
        if (g < best._1 || (g == best._1 && sc < best._2)) {
          best = (g, sc)
          bestRow = (sc, nl, cp, nr, tp - cp)
        }
      }
    }
    val parent = (n * n - tp * tp - tq * tq) * 1000000L / (n * n)
    assert(row.getLong(0) == bestRow._1 && row.getLong(1) == bestRow._2)
    assert(row.getLong(2) == bestRow._3 && row.getLong(3) == bestRow._4)
    assert(row.getLong(4) == bestRow._5)
    assert(row.getLong(5) == best._1 && row.getLong(6) == parent)
    assert(best._1 <= parent + 2,
      "the optimal split cannot exceed parent impurity (mod floor)")
  }

  test("q311: cohort half-life replays scalar cohort activity") {
    val rows = run("q311_cohort_halflife").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    val ud = events.map(e => (e._2, e._4 / 86400000000L)).distinct
    // floor of epoch-micros to days must match CAST(ts AS DATE): both
    // are nonneg epoch values, so integer division is exact floor
    val fc = ud.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val act = ud.groupBy { case (u, d) => (fc(u), d - fc(u)) }.view
      .mapValues(_.size.toLong).toMap
    for ((c0, users) <- fc.groupBy(_._2).view.mapValues(_.size).toMap) {
      val n0 = act((c0, 0L))
      assert(n0 == users)
      val hl = act.collect { case ((c, d), a)
        if c == c0 && d > 0 && a * 2 <= n0 => d }
      val a7 = act.getOrElse((c0, 7L), 0L)
      val (qn, qhl, q7) = rows(c0)
      assert(qn == n0)
      assert(qhl == (if (hl.isEmpty) -1L else hl.min))
      assert(q7 == a7 * 1000000L / n0)
    }
    assert(rows.nonEmpty)
  }

  test("q312: feature ranking is consistent with q308 on the price feature") {
    val rows = run("q312_feature_ranking").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(rows.keySet ==
      Set("price", "quantity", "discount", "tax"))
    // the price stump must equal q308's standalone result
    val stump = run("q308_gini_stump").collect().head
    val (thr, child, parent, dec, _) = rows("price")
    assert(thr == stump.getLong(0))
    assert(child == stump.getLong(5) && parent == stump.getLong(6))
    assert(dec == parent - child)
    for ((f, (_, c, p, d, _)) <- rows) {
      assert(d == p - c, f)
      assert(c <= p + 2, s"$f: split cannot worsen impurity (mod floor)")
      assert(p >= 0 && c >= 0)
    }
    // ranks are a permutation ordered by decrease
    val byRk = rows.values.toSeq.sortBy(_._5)
    assert(byRk.map(_._5) == Seq(1L, 2L, 3L, 4L))
    assert(byRk.map(_._4).reverse == byRk.map(_._4).sorted,
      "rank order must follow impurity decrease")
  }

  test("q284: Kendall counts equal the brute-force pair scan") {
    val rows = run("q284_kendall_time").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    for ((u, es) <- events.groupBy(_._2)) {
      val vs = es.sortBy(e => (e._4, e._5)).map(_._3)
      if (vs.length < 2) assert(!rows.contains(u))
      else {
        var (nc, nd, tv) = (0L, 0L, 0L)
        for (i <- vs.indices; j <- i + 1 until vs.length) {
          val c = java.lang.Long.compare(vs(j), vs(i))
          if (c > 0) nc += 1 else if (c < 0) nd += 1 else tv += 1
        }
        val (n, qc, qd, qt, tau) = rows(u)
        assert(n == vs.length && qc == nc && qd == nd && qt == tv)
        assert(tau ==
          Math.floorDiv((nc - nd) * 2000000L, n * (n - 1)))
      }
    }
  }

  test("q282: two-pass branch is row-for-row identical to the window branch") {
    // ADVICE r12: the dial (2e6 rows) sat above every test SF, so the
    // two-pass rank/prefix path only ever ran in the unverified 10×
    // bench. Force BOTH branches on the same small frame and compare.
    val b = graft.Tables.lineitem(spark, sf).select(
      col("l_linestatus").as("grp"),
      (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
        .as("sc"),
      col("l_orderkey"), col("l_linenumber"),
      when(col("l_returnflag") === "R", 1L).otherwise(0L).as("pos"))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("grp", "pos", "rk", "cp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(identity).toSeq
    val window = rows(RankMetricsQueries.rankAndRunningPos(b, Long.MaxValue))
    val twoPass = rows(RankMetricsQueries.rankAndRunningPos(b, 0L))
    assert(window.nonEmpty && window == twoPass)
  }
}
