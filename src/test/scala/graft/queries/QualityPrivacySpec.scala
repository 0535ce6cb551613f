package graft.queries

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the script-mix (q294), cluster-scatter (q295) and
  * t-closeness (q297) queries beyond the hash oracle: partition-of-
  * unity checks on the ppm ratios, a scalar centroid/scatter replay,
  * and the TV-distance bounds with a per-group replay. sf0.001. */
class QualityPrivacySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sf)

  test("q294: class ppms partition unity; counts replay on raw text") {
    val rows = run("q294_script_mix").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val ppms = Seq(r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6))
      assert(ppms.forall(p => p >= 0 && p <= 1000000))
      val s = ppms.sum
      assert(s <= 1000000 && s >= 1000000 - 3,
        s"floor-ppm partition of unity violated: $s")
    }
    // scalar replay of the class counts for one language slice
    val docs = graft.Tables.documents(spark, sf)
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .filter(_._2.nonEmpty)
    val byLang = docs.groupBy(_._1)
    val got = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2))).toMap
    for ((lang, ds) <- byLang) {
      val nChars = ds.map(_._2.length.toLong).sum
      assert(got(lang) == ((ds.length.toLong, nChars)), lang)
    }
  }

  test("q295: scatter replays scalar centroids; nearest is the argmin") {
    val rows = run("q295_cluster_scatter").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val vecs = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).toArray
          .map(x => math.floor(x.toDouble * 1000000).toLong)))
    val byLabel = vecs.groupBy(_._2)
    val cent = byLabel.map { case (l, vs) =>
      val dim = vs.head._3.length
      l -> Array.tabulate(dim) { d =>
        Math.floorDiv(vs.map(_._3(d)).sum, vs.length.toLong)
      }
    }
    for ((l, vs) <- byLabel) {
      val c = cent(l)
      val ss = vs.map(v => v._3.zip(c)
        .map { case (x, m) => (x - m) * (x - m) }.sum).sum
      val intraMsd = ss / vs.length
      val others = cent.filter(_._1 != l).map { case (o, oc) =>
        (o, c.zip(oc).map { case (a, b) => (a - b) * (a - b) }.sum)
      }.toSeq.sortBy { case (o, d2) => (d2, o) }
      val (nl, d2) = others.head
      val (nVecs, qIntra, qNearest, qInter, qScatter) = rows(l)
      assert(nVecs == vs.length && qIntra == intraMsd)
      assert(qNearest == nl.toLong && qInter == d2)
      assert(qScatter == intraMsd * 1000000L / d2)
    }
    assert(rows.size == byLabel.size)
  }

  test("q298: RAKE top-20 replays a scalar implementation") {
    val got = run("q298_rake_keywords").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val stop = Set("the", "a", "and", "of", "to", "in", "is", "for",
      "on", "with")
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // phrases: maximal stopword-free runs per doc
    val phrases = docs.flatMap { case (_, text) =>
      val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val out = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
      var cur = scala.collection.mutable.ArrayBuffer.empty[String]
      for (t <- toks) {
        if (stop(t)) { if (cur.nonEmpty) { out += cur.toSeq; cur.clear() } }
        else cur += t
      }
      if (cur.nonEmpty) out += cur.toSeq
      out
    }
    val freq = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    val deg = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    for (p <- phrases; w <- p) { freq(w) += 1; deg(w) += p.length }
    def wsc(w: String) = deg(w) * 1000000L / freq(w)
    val scored = phrases.map(p => (p.mkString(" "), p.length.toLong,
      p.map(wsc).sum))
    val agg = scored.groupBy(_._1).map { case (ph, xs) =>
      (ph, xs.head._2, xs.length.toLong, xs.head._3) }.toSeq
    val want = agg.sortBy { case (ph, _, _, sc) => (-sc, ph) }
      .take(20).zipWithIndex
      .map { case ((ph, nw, no, sc), i) => (ph, nw, no, sc, i + 1L) }
    assert(got.sortBy(_._5).toSeq == want)
    assert(got.length == 20)
  }

  test("q303: conflict audit agrees with a scalar duplicate scan") {
    val rows = run("q303_cluster_conflicts").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text", "source", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3)))
    val clusters = docs.groupBy(_._2).values.filter(_.length >= 2).toSeq
    val total = rows.filter(_._1 == "TOTAL")
    assert(total.length == 1)
    val (_, nMulti, srcPpm, langPpm) = total.head
    assert(nMulti == clusters.size)
    if (clusters.isEmpty) {
      assert(srcPpm == 0 && langPpm == 0 && rows.length == 1)
    } else {
      val srcConf = clusters.count(_.map(_._3).distinct.length > 1)
      val langConf = clusters.count(_.map(_._4).distinct.length > 1)
      assert(srcPpm == srcConf * 1000000L / clusters.size)
      assert(langPpm == langConf * 1000000L / clusters.size)
      val perCluster = rows.filterNot(_._1 == "TOTAL")
      assert(perCluster.length == clusters.size)
      for (c <- clusters) {
        val canon = c.map(_._1).min.toString
        val r = perCluster.find(_._1 == canon).get
        assert(r._2 == c.length)
        assert(r._3 == c.map(_._3).distinct.length)
        assert(r._4 == c.map(_._4).distinct.length)
      }
    }
  }

  test("q305/q306: richness and capture-recapture replay scalar counts") {
    val rich = run("q305_vocab_richness").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val docs = graft.Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    for ((src, ds) <- docs.groupBy(_._1)) {
      val words = ds.flatMap(_._2.trim.toLowerCase.split("\\s+"))
        .filter(_.nonEmpty)
      val wc = words.groupBy(identity).view.mapValues(_.size.toLong)
      val v = wc.size.toLong
      val n = words.length.toLong
      val n1 = wc.count(_._2 == 1L).toLong
      val n2 = wc.count(_._2 == 2L).toLong
      val chao = v + (if (n2 == 0) n1 * (n1 - 1) / 2
        else n1 * n1 / (2 * n2))
      val (qv, qn, q1, q2, qc, cov) = rich(src)
      assert((qv, qn, q1, q2, qc) == ((v, n, n1, n2, chao)), src)
      assert(cov == 1000000L - n1 * 1000000L / n)
      assert(qc >= qv, "Chao1 never below the observed vocabulary")
      assert(cov >= 0 && cov <= 1000000L)
    }
    val cap = run("q306_capture_recapture").collect().head
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"),
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val d0 = ev.map(_._2).min; val d1 = ev.map(_._2).max
    val w1 = ev.filter(_._2 <= d0 + 6).map(_._1).toSet
    val w2 = ev.filter(_._2 >= d1 - 6).map(_._1).toSet
    val m = (w1 & w2).size.toLong
    assert(cap.getLong(0) == w1.size && cap.getLong(1) == w2.size)
    assert(cap.getLong(2) == m)
    assert(cap.getLong(3) ==
      (w1.size + 1L) * (w2.size + 1L) / (m + 1L) - 1L)
    assert(cap.getLong(4) == ev.map(_._1).distinct.length)
  }

  test("q313: cluster diameter replays a scalar shingle pipeline") {
    val rows = run("q313_cluster_diameter").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val sh = docs.map { case (id, t) =>
      id -> (0 to math.max(t.length - 8, 0) - 0)
        .filter(_ + 8 <= t.length).map(i => t.substring(i, i + 8)).toSet
    }.toMap
    val dfreq = sh.values.flatten.groupBy(identity).view
      .mapValues(_.size).toMap
    val rare = sh.view.mapValues(_.filter(s => dfreq(s) <= 100)).toMap
    def jac(a: Long, b: Long): (Long, Long) = {
      val (sa, sb) = (rare(a), rare(b))
      val c = (sa & sb).size.toLong
      val un = sa.size + sb.size - c
      (c, if (c == 0) 0L else c * 1000000L / un)
    }
    // link pairs use the query's round-6 double rule
    val ids = docs.map(_._1).sorted
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (i <- ids.indices; j <- i + 1 until ids.length) {
      val (a, b) = (ids(i), ids(j))
      val (c, _) = jac(a, b)
      if (c > 0) {
        val un = rare(a).size + rare(b).size - c
        val jr = BigDecimal(c.toDouble / un)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        if (jr >= 0.3) {
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
      }
    }
    val clusters = ids.groupBy(find).filter(_._2.length >= 2)
    assert(rows.keySet == clusters.keySet.map(_.toLong))
    for ((lab, members) <- clusters) {
      val pairs = for {
        i <- members.indices; j <- i + 1 until members.length
      } yield jac(members(i), members(j))._2
      val (nP, minJ, weak, flag) = rows(lab)
      assert(nP == pairs.length, s"cluster $lab")
      assert(minJ == pairs.min)
      assert(weak == pairs.count(_ < 300000L))
      assert(flag == (if (pairs.min < 300000L) 1L else 0L))
    }
  }

  test("q300: modularity replays from a scalar edge scan") {
    val rows = run("q300_brand_modularity").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val li = graft.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brand = graft.Tables.part(spark, sf)
      .select("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val edges = li.groupBy(_._1).values.flatMap { ls =>
      val ps = ls.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length)
        yield (ps(i), ps(j))
    }.toSet
    val m = edges.size.toLong
    val deg = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    for ((u, v) <- edges) { deg(u) += 1; deg(v) += 1 }
    val dC = deg.groupBy { case (id, _) => brand(id) }.view
      .mapValues(_.values.sum).toMap
    val eIn = edges.toSeq.groupBy { case (u, v) =>
      (brand(u), brand(v)) }.collect {
      case ((a, b), es) if a == b => a -> es.size.toLong }.toMap
    var qTot = 0L
    val expect = dC.map { case (b, d) =>
      val e = eIn.getOrElse(b, 0L)
      val c = Math.floorDiv((4 * m * e - d * d) * 1000000L, 4 * m * m)
      qTot += c
      b -> (e, d, c)
    }
    assert(rows.map(_._1).toSet == expect.keySet)
    for ((b, (nN, e, d, c, qt)) <- rows) {
      val (we, wd, wc) = expect(b)
      assert((e, d, c) == ((we, wd, wc)), b)
      assert(qt == qTot)
      assert(nN > 0)
    }
    assert(dC.values.sum == 2 * m, "sum of community degrees = 2m")
    assert(eIn.values.sum <= m)
  }

  test("q297: TV in range, urgent totals consistent, flag matches") {
    val rows = run("q297_t_closeness").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    val n = rows.map(_._4).sum
    val n1 = rows.map(_._5).sum
    for ((_, _, _, nG, nUrg, tPpm, flag) <- rows) {
      assert(tPpm >= 0 && tPpm <= 1000000)
      assert(nUrg <= nG)
      assert(tPpm ==
        math.abs(nUrg * n - n1 * nG) * 1000000L / (nG * n))
      assert(flag == (if (tPpm > 200000) 1L else 0L))
    }
    // a singleton group's TV is |1 - p| or p — never negative, and a
    // group matching the global rate exactly has t = 0
    assert(n1 > 0 && n1 < n, "both urgent and non-urgent customers exist")
  }
}
