package graft.queries

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the signal family (q285–q287) beyond the hash
  * oracle: scalar replays of the ACF and cross-correlation integer
  * arithmetic from raw events, and the exact integer Parseval
  * identity for the unnormalized Haar lifting scheme:
  * 32 * sum(x^2) = s_final^2 + sum_L energy_L * 2^(5-L).
  * Runs at sf0.001. */
class SignalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sf)

  /** (type -> epoch-day-ordered whole-unit daily totals). */
  private lazy val dailySeries: Map[String, Array[Long]] = {
    val rows = graft.Tables.events(spark, sf)
      .select(col("event_type"),
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long"),
        (col("value").cast("decimal(18,6)") * 1000000).cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.groupBy(_._1).map { case (et, es) =>
      et -> es.groupBy(_._2).toArray.sortBy(_._1)
        .map { case (_, xs) => Math.floorDiv(xs.map(_._3).sum, 1000000L) }
    }
  }

  private def devs(xs: Array[Long]): Array[Long] = {
    val mu = Math.floorDiv(xs.sum, xs.length.toLong)
    xs.map(_ - mu)
  }

  test("q285: ACF replays the scalar lag products") {
    val rows = run("q285_acf_daily").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    for ((et, xs) <- dailySeries) {
      val dv = devs(xs)
      val den = dv.map(d => d * d).sum
      for (k <- 1 to 7) {
        val pairs = dv.drop(k).zip(dv.dropRight(k))
        val num = pairs.map { case (a, b) => a * b }.sum
        val (nP, qNum, qDen, acf) = rows((et, k.toLong))
        assert(nP == pairs.length && qNum == num && qDen == den,
          s"$et lag $k")
        assert(acf == Math.floorDiv(num * 1000000L, den))
        assert(acf >= -1000000L && acf <= 1000000L)
      }
    }
  }

  test("q286: lead-lag numerators replay and is_best marks the argmax") {
    val rows = run("q286_lead_lag").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val click = dailySeries("click"); val purch = dailySeries("purchase")
    // re-key deviations by epoch day (the query joins on calendar day)
    def byDay(et: String): Map[Long, Long] = {
      val recs = graft.Tables.events(spark, sf)
        .where(col("event_type") === et)
        .select(datediff(col("ts").cast("date"),
          lit("1970-01-01").cast("date")).cast("long"),
          (col("value").cast("decimal(18,6)") * 1000000).cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val sums = recs.groupBy(_._1).view
        .mapValues(xs => Math.floorDiv(xs.map(_._2).sum, 1000000L)).toMap
      val mu = Math.floorDiv(sums.values.sum, sums.size.toLong)
      sums.view.mapValues(_ - mu).toMap
    }
    val ca = byDay("click"); val pb = byDay("purchase")
    val expect = (-5L to 5L).map { l =>
      val pairs = ca.keys.toSeq.filter(d => pb.contains(d + l))
      l -> (pairs.size.toLong, pairs.map(d => ca(d) * pb(d + l)).sum)
    }.toMap
    val bestNum = expect.values.map(_._2).max
    val denC = ca.values.map(d => d * d).sum
    val denP = pb.values.map(d => d * d).sum
    assert(rows.length == 11)
    for ((l, (nP, num, dc, dp, isBest)) <- rows) {
      assert((nP, num) == expect(l), s"lag $l")
      assert(dc == denC && dp == denP)
      assert(isBest == (if (num == bestNum) 1L else 0L))
    }
    assert(click.nonEmpty && purch.nonEmpty)
  }

  test("q291: DTW replays the scalar DP and respects the lockstep bound") {
    val rows = run("q291_dtw_profiles").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    def dtwScalar(a: Array[Long], b: Array[Long]): Long = {
      val inf = Long.MaxValue / 4
      val dp = Array.fill(a.length + 1, b.length + 1)(inf)
      dp(0)(0) = 0L
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.abs(a(i - 1) - b(j - 1)) +
          math.min(dp(i - 1)(j), math.min(dp(i)(j - 1), dp(i - 1)(j - 1)))
      dp(a.length)(b.length)
    }
    val types = dailySeries.keys.toSeq.sorted
    var checked = 0
    for (i <- types.indices; j <- i + 1 until types.length) {
      val (ta, tb) = (types(i), types(j))
      val (la, lb) = (dailySeries(ta), dailySeries(tb))
      val (nA, nB, dtw, lock) = rows((ta, tb))
      assert(nA == la.length && nB == lb.length)
      assert(dtw == dtwScalar(la, lb), s"$ta/$tb")
      val expLock = la.zip(lb).map { case (x, y) => math.abs(x - y) }.sum
      assert(lock == expLock)
      if (la.length == lb.length)
        assert(dtw <= lock, "the diagonal is a valid warping path")
      checked += 1
    }
    assert(checked == rows.size && checked == 10)
  }

  test("q299: DP segmentation costs are brute-force optimal") {
    val rows = run("q299_l1_segmentation").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    def segCost(xs: Array[Long]): Long = {
      val med = xs.sorted.apply((xs.length + 1) / 2 - 1)
      xs.map(x => math.abs(x - med)).sum
    }
    for ((et, xs) <- dailySeries) {
      val n = xs.length
      val (qn, c1, c2, c3, c4, split2) = rows(et)
      assert(qn == n)
      // brute force over all cut sets for k = 1..4
      def best(k: Int): (Long, Seq[Int]) = {
        var bc = Long.MaxValue; var bCuts = Seq.empty[Int]
        for (cuts <- (1 until n).combinations(k - 1)) {
          val idx = 0 +: cuts :+ n
          val c = idx.sliding(2).map { case Seq(a, b) =>
            segCost(xs.slice(a, b)) }.sum
          if (c < bc) { bc = c; bCuts = cuts }
        }
        (bc, bCuts)
      }
      assert(c1 == segCost(xs))
      assert(c2 == best(2)._1, s"$et k=2")
      assert(c3 == best(3)._1, s"$et k=3")
      assert(c4 == best(4)._1, s"$et k=4")
      assert(c1 >= c2 && c2 >= c3 && c3 >= c4,
        "cost curve must be non-increasing in k")
      // split2_ed is a real observed day
      assert(split2 >= 0)
    }
  }

  test("q314: EMD replays the scalar CDF-area and the coupling form") {
    val row = run("q314_emd_1d").collect().head
    val vals = graft.Tables.events(spark, sf)
      .where(col("event_type").isin("click", "purchase"))
      .select(col("event_type"),
        (col("value").cast("decimal(18,6)") * 1000000).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val a = vals.filter(_._1 == "click").map(_._2).sorted
    val b = vals.filter(_._1 == "purchase").map(_._2).sorted
    // CDF-area form on the merged distinct grid
    val grid = (a ++ b).distinct.sorted
    var (ia, ib) = (0, 0)
    var num = BigInt(0)
    for (k <- 0 until grid.length - 1) {
      while (ia < a.length && a(ia) <= grid(k)) ia += 1
      while (ib < b.length && b(ib) <= grid(k)) ib += 1
      num += BigInt(grid(k + 1) - grid(k)) *
        (BigInt(ia) * b.length - BigInt(ib) * a.length).abs
    }
    val emd = num / (BigInt(a.length) * BigInt(b.length))
    assert(row.getLong(0) == a.length && row.getLong(1) == b.length)
    assert(BigInt(row.getLong(2)) == emd)
    // equal-n sanity impossible here (sizes differ); instead check the
    // dual quantile-coupling bound: EMD equals the integral of the
    // inverse-CDF gap — approximate both distributions at the common
    // 1/m grid of m = lcm-free min(n) quantile steps and confirm the
    // CDF-area exact value sits within the coarse bound's bracket
    val mQ = math.min(a.length, b.length)
    val coarse = (0 until mQ).map { i =>
      math.abs(a(i * a.length / mQ) - b(i * b.length / mQ))
    }.map(BigInt(_)).sum / mQ
    assert((emd - coarse).abs <= emd.max(coarse),
      "coupling approximation must be the same order of magnitude")
  }

  test("q315: EMD matrix agrees with q314 on the click/purchase cell and the triangle inequality") {
    val rows = run("q315_emd_matrix").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.size == 10)
    val single = run("q314_emd_1d").collect().head
    val (na, nb, emd) = rows(("click", "purchase"))
    assert(na == single.getLong(0) && nb == single.getLong(1))
    assert(emd == single.getLong(2),
      "matrix cell must equal the standalone q314 computation")
    // Wasserstein-1 is a metric: triangle inequality over all triples
    // (floor rounding can violate by at most 2 micro)
    def d(a: String, b: String): Long =
      rows.getOrElse((a, b), rows((b, a)))._3
    val types = rows.keySet.flatMap(k => Seq(k._1, k._2)).toSeq.sorted
    for (a <- types; b <- types; c <- types
         if a < b && !Seq(a, b).contains(c))
      assert(d(a, b) <= d(a, c) + d(c, b) + 2,
        s"triangle violated for ($a,$b) via $c")
    assert(rows.values.forall(_._3 >= 0))
  }

  test("q287: Haar energies replay and satisfy integer Parseval") {
    val rows = run("q287_haar_energy").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    for ((et, xs) <- dailySeries) {
      val padded = xs.take(32).padTo(32, 0L)
      var cur = padded
      var energies = Map.empty[Int, Long]
      var level = 0
      while (cur.length > 1) {
        level += 1
        val pairs = cur.grouped(2).toArray
        val dd = pairs.map { case Array(a, b) => a - b }
        energies += level -> dd.map(d => d * d).sum
        cur = pairs.map { case Array(a, b) => a + b }
      }
      for (l <- 1 to 5)
        assert(rows((et, l.toLong)) == energies(l), s"$et level $l")
      // Parseval for the unnormalized lifting scheme
      val lhs = 32L * padded.map(x => x * x).sum
      val rhs = cur(0) * cur(0) +
        (1 to 5).map(l => energies(l) * (1L << (5 - l))).sum
      assert(lhs == rhs, s"$et Parseval")
    }
  }
}
