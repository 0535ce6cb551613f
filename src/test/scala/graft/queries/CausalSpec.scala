package graft.queries

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the causal-evaluation family (q288/q289) beyond
  * the hash oracle: full scalar replays of the DiD cell table and the
  * Qini decile accumulation from raw events, plus structural checks
  * (monotone cumulative arms, decile partition sizes). sf0.001. */
class CausalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sf)

  private lazy val events = graft.Tables.events(spark, sf)
    .select(col("user_id"), col("event_type"),
      unix_micros(col("ts")),
      (col("value").cast("decimal(18,6)") * 1000000).cast("long"),
      col("event_id"))
    .collect()
    .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
      r.getLong(4)))

  test("q288: DiD cells replay from a scalar pass") {
    val row = run("q288_did_estimate").collect().head
    val mid = Math.floorDiv(
      events.map(_._3).min + events.map(_._3).max, 2L)
    val treated = events
      .filter(e => e._2 == "error" && e._3 < mid)
      .groupBy(_._1).collect { case (u, es) if es.length >= 7 => u }
      .toSet
    val cells = events.filterNot(_._2 == "error")
      .groupBy(e => (treated.contains(e._1), e._3 >= mid))
    def nm(t: Boolean, p: Boolean): (Long, Long) =
      cells.get((t, p)).map { es =>
        (es.length.toLong, Math.floorDiv(es.map(_._4).sum,
          es.length.toLong))
      }.getOrElse((0L, 0L))
    val (ntPre, mtPre) = nm(t = true, p = false)
    val (ntPost, mtPost) = nm(t = true, p = true)
    val (ncPre, mcPre) = nm(t = false, p = false)
    val (ncPost, mcPost) = nm(t = false, p = true)
    assert(row.getLong(0) == ntPre && row.getLong(1) == ntPost)
    assert(row.getLong(2) == ncPre && row.getLong(3) == ncPost)
    assert(row.getLong(4) == mtPre && row.getLong(5) == mtPost)
    assert(row.getLong(6) == mcPre && row.getLong(7) == mcPost)
    assert(row.getLong(8) == (mtPost - mtPre) - (mcPost - mcPre))
    assert(ntPre > 0 && ncPre > 0, "both arms must have pre data")
  }

  test("q292: Kaplan-Meier replays the scalar fold and is non-increasing") {
    val rows = run("q292_kaplan_meier").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // scalar replay from raw orders
    val od = graft.Tables.orders(spark, sf)
      .select(col("o_custkey"), to_date(col("o_orderdate")))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val horizon = od.map(_._2).maxBy(_.toEpochDay)
    val durations = od.groupBy(_._1).values.map { os =>
      val days = os.map(_._2).sortBy(_.toEpochDay)
      val f1 = days.head
      days.find(_.isAfter(f1)) match {
        case Some(sd) => (sd.toEpochDay - f1.toEpochDay, true)
        case None => (horizon.toEpochDay - f1.toEpochDay, false)
      }
    }.toSeq
    val byT = durations.groupBy(_._1).toSeq.sortBy(_._1)
    var atRisk = durations.size.toLong
    var sPpm = 1000000L
    val expected = byT.flatMap { case (t, xs) =>
      val d = xs.count(_._2).toLong
      val row = if (d > 0) {
        sPpm = sPpm * (atRisk - d) / atRisk
        Some((t, d, atRisk, sPpm))
      } else None
      atRisk -= xs.size
      row
    }
    assert(rows.toSeq == expected)
    assert(rows.map(_._4).sliding(2).forall {
      case Array(a, b) => b <= a; case _ => true
    }, "survival must be non-increasing")
  }

  test("q293: replay/IPS estimates match the scalar computation") {
    val row = run("q293_ope_replay").collect().head
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(u: Long): Long = java.lang.Long.parseLong(
      md.digest(u.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16)
    val arms = events.map(_._2).distinct.sorted
    val byUser = events.groupBy(_._1)
    var (nEvents, svAll, nMatched, svMatched, svIps) = (0L, 0L, 0L, 0L, 0L)
    for ((u, es) <- byUser) {
      val chosen = arms((h(u) % arms.length).toInt)
      val cntU = es.length.toLong
      nEvents += cntU
      svAll += es.map(_._4).sum
      val matched = es.filter(_._2 == chosen)
      if (matched.nonEmpty) {
        val cntUa = matched.length.toLong
        val svUa = matched.map(_._4).sum
        nMatched += cntUa
        svMatched += svUa
        svIps += svUa * cntU / cntUa
      }
    }
    assert(row.getLong(0) == nEvents && row.getLong(1) == nMatched)
    assert(row.getLong(2) == svAll / nEvents)
    assert(row.getLong(3) == svMatched / nMatched)
    assert(row.getLong(4) == svIps / nEvents)
  }

  test("q296: Markov attribution replays the scalar chain solve") {
    val rows = run("q296_markov_attribution").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    // journeys: per user, (ts, event_id)-ordered states up to first
    // purchase ('conv'), else ending implicitly in 'null'
    val journeys = events.groupBy(_._1).values.map { es =>
      val seq = es.sortBy(e => (e._3, e._5)) // (ts, event_id)
        .map(e => if (e._2 == "purchase") "conv" else e._2)
      val cut = seq.indexOf("conv")
      if (cut >= 0) seq.take(cut + 1) else seq
    }.toSeq
    // transition counts including START and null
    val trans = scala.collection.mutable.Map
      .empty[(String, String), Long].withDefaultValue(0L)
    for (jn <- journeys) {
      trans(("START", jn.head)) += 1
      for (Array(a, b) <- jn.sliding(2).map(_.toArray)
             if a != "conv")
        trans((a, b)) += 1
      if (jn.last != "conv") trans((jn.last, "null")) += 1
    }
    val channels = trans.keys.map(_._1)
      .filter(s => s != "START").toSeq.distinct.sorted
    val states = channels :+ "START"
    val m = states.length
    def tot(s: String) = trans.collect {
      case ((a, _), c) if a == s => c }.sum
    def solve(clamp: Int): Long = {
      var p = Array.fill(m)(0L)
      for (_ <- 1 to 24) {
        p = Array.tabulate(m) { i =>
          if (i + 1 == clamp) 0L
          else {
            val s = states(i)
            val dot = states.zipWithIndex.map { case (t, k) =>
              trans((s, t)) * p(k) }.sum
            (dot + trans((s, "conv")) * 1000000L) / tot(s)
          }
        }
      }
      p(m - 1)
    }
    val pFull = solve(0)
    val removals = channels.zipWithIndex.map { case (c, i) =>
      c -> (pFull - solve(i + 1)) }.toMap
    val totR = removals.values.sum
    for (c <- channels) {
      val (qFull, qRem, qRemoval, qShare) = rows(c)
      assert(qFull == pFull, s"$c full")
      assert(qRemoval == removals(c), s"$c removal")
      assert(qRem == pFull - removals(c))
      assert(qShare ==
        (if (totR <= 0) 0L else removals(c) * 1000000L / totR))
    }
    assert(rows.size == channels.size)
    assert(pFull > 0 && pFull <= 1000000L)
  }

  test("q304: randomization test replays scalar placebo DiDs") {
    val row = run("q304_did_permutation").collect().head
    val mid = Math.floorDiv(
      events.map(_._3).min + events.map(_._3).max, 2L)
    val treated = events
      .filter(e => e._2 == "error" && e._3 < mid)
      .groupBy(_._1).collect { case (u, es) if es.length >= 7 => u }
      .toSet
    val base = events.filterNot(_._2 == "error")
      .map(e => (e._1, e._3 >= mid, e._4))
    def did(flagOf: Long => Boolean): Long = {
      val cells = base.groupBy(e => (flagOf(e._1), e._2))
      def mm(t: Boolean, p: Boolean) = cells.get((t, p))
        .map(es => Math.floorDiv(es.map(_._3).sum, es.length.toLong))
        .getOrElse(0L)
      (mm(t = true, p = true) - mm(t = true, p = false)) -
        (mm(t = false, p = true) - mm(t = false, p = false))
    }
    val obs = did(treated.contains)
    val md = java.security.MessageDigest.getInstance("MD5")
    def parity(u: Long, b: Long): Boolean = {
      val hex = md.digest(s"$u|$b".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 2 == 0
    }
    val placebos = (1L to 64L).map(b => did(u => parity(u, b)))
    val nExtreme = placebos.count(p => math.abs(p) >= math.abs(obs))
    assert(row.getLong(0) == obs)
    assert(row.getLong(1) == 64L)
    assert(row.getLong(2) == nExtreme)
    assert(row.getLong(3) == nExtreme * 1000000L / 64L)
    assert(row.getLong(4) == placebos.map(math.abs).max)
  }

  test("q307: Wilson bound replays and orders below the raw rate") {
    val rows = run("q307_wilson_ranking").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    val byUser = events.groupBy(_._1)
    val purch = byUser.collect {
      case (u, es) if es.exists(_._2 == "purchase") => u }.toSet
    for ((et, n, x, lb, _) <- rows) {
      val users = byUser.collect {
        case (u, es) if es.exists(_._2 == et) => u }.toSet
      assert(n == users.size && x == (users & purch).size, et)
      val nn = n.toDouble; val p = x.toDouble / nn; val z = 1.96
      val want = BigDecimal((p + z * z / (2 * nn) -
        z * math.sqrt(p * (1 - p) / nn + z * z / (4 * nn * nn))) /
        (1 + z * z / nn))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(lb - want) < 1e-9, et)
      assert(lb <= p + 1e-12, "lower bound cannot exceed the raw rate")
      assert(lb >= 0.0)
    }
    assert(rows.map(_._5).sorted.toSeq == (1L to rows.length))
  }

  test("q309: stratified ATE replays the scalar stratification") {
    val rows = run("q309_stratified_ate").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    val mid = Math.floorDiv(
      events.map(_._3).min + events.map(_._3).max, 2L)
    val treated = events
      .filter(e => e._2 == "error" && e._3 < mid)
      .groupBy(_._1).collect { case (u, es) if es.length >= 7 => u }
      .toSet
    val users = events.groupBy(_._1).map { case (u, es) =>
      val pre = es.count(e => e._2 == "click" && e._3 < mid).toLong
      val post = es.filter(e => e._2 != "error" && e._3 >= mid)
      (u, pre, post.map(_._4).sum, post.length.toLong)
    }.filter(_._4 > 0).toArray
    val ranked = users.sortBy { case (u, pre, _, _) => (pre, u) }
    val tot = ranked.length.toLong
    val byStratum = ranked.zipWithIndex
      .groupBy { case (_, i) => i.toLong * 5 / tot + 1 }
    var pooledNum = 0L; var pooledN = 0L; var pooledT = 0L
    for ((st, members) <- byStratum) {
      def cell(t: Boolean) = {
        val ms = members.map(_._1)
          .filter(m => treated.contains(m._1) == t)
        if (ms.isEmpty) (0L, 0L)
        else (ms.length.toLong,
          Math.floorDiv(ms.map(_._3).sum, ms.map(_._4).sum))
      }
      val (nT, mT) = cell(t = true)
      val (nC, mC) = cell(t = false)
      val diff = mT - mC
      val (qn, qt, qd) = rows(st)
      assert(qn == nT + nC && qt == nT && qd == diff, s"stratum $st")
      pooledNum += (nT + nC) * diff; pooledN += nT + nC; pooledT += nT
    }
    val (pn, pt, pd) = rows(-1L)
    assert(pn == pooledN && pt == pooledT)
    assert(pd == Math.floorDiv(pooledNum, pooledN))
  }

  test("q316: weighted draws replay and conserve the draw budget") {
    val rows = run("q316_weighted_draws").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.map(_._2._2).sum == 256L,
      "every draw must land in exactly one range")
    val totW = rows.map(_._2._1).sum
    val md = java.security.MessageDigest.getInstance("MD5")
    def u(i: Long): Long = java.lang.Long.parseLong(
      md.digest(s"draw|$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16) % totW
    val sorted = rows.sortBy(_._1)
    val ranges = sorted.scanLeft(("", 0L, 0L)) {
      case ((_, _, hi), (b, (w, _, _))) => (b, hi, hi + w)
    }.drop(1)
    val draws = (1L to 256L).map(u).groupBy { x =>
      ranges.find(r => x >= r._2 && x < r._3).get._1
    }.view.mapValues(_.size.toLong).toMap
    for ((b, (w, d, exp)) <- rows) {
      assert(d == draws.getOrElse(b, 0L), b)
      assert(exp == w * 256L / totW)
    }
  }

  test("q289: Qini deciles replay the ranked accumulation") {
    val rows = run("q289_qini_deciles").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(rows.size == 10)
    // scalar replay: per-user aggregates, md5 parity, ranked deciles
    val md = java.security.MessageDigest.getInstance("MD5")
    def treatOf(u: Long): Long = {
      val hex = md.digest(u.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 2
    }
    val users = events.groupBy(_._1).toArray.map { case (u, es) =>
      val score = es.count(_._2 == "click").toLong
      val conv = if (es.exists(_._2 == "purchase")) 1L else 0L
      (u, score, conv, treatOf(u))
    }
    val ranked = users.sortBy { case (u, sc, _, _) => (-sc, u) }
    val tot = ranked.length.toLong
    var (cumT, cumC, cumPT, cumPC) = (0L, 0L, 0L, 0L)
    var idx = 0L
    var checked = 0
    val byDecile = ranked.zipWithIndex
      .groupBy { case (_, i) => i.toLong * 10 / tot + 1 }
    for (dec <- 1L to 10L) {
      for ((rec, _) <- byDecile(dec)) {
        if (rec._4 == 1) { cumT += 1; cumPT += rec._3 }
        else { cumC += 1; cumPC += rec._3 }
        idx += 1
      }
      val (t, c, pt, pc, gap, qini) = rows(dec)
      assert((t, c, pt, pc) == ((cumT, cumC, cumPT, cumPC)), s"dec $dec")
      val expGap = if (cumT == 0 || cumC == 0) 0L
        else cumPT * 1000000L / cumT - cumPC * 1000000L / cumC
      val expQini = if (cumC == 0) cumPT * 1000L
        else cumPT * 1000L - cumPC * cumT * 1000L / cumC
      assert(gap == expGap && qini == expQini, s"dec $dec")
      checked += 1
    }
    assert(checked == 10 && idx == tot)
  }
}
