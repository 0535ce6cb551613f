package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LinkageSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def people(n: Int) =
    (1 to n).map(i => (i.toLong, (i * 37 % 100).toDouble, s"n${i % 5}"))
      .toDF("id", "score", "tag")

  /** Reference neighborhood via a plain single-partition window —
    * fine at toy size, the exact thing the operator must avoid at
    * scale. */
  private def reference(n: Int, w: Int): Set[(Long, Long, Long)] = {
    val rows = people(n).orderBy(col("score"), col("id"))
      .select("id").as[Long].collect()
    (for {
      i <- rows.indices
      j <- (i + 1) to math.min(i + w, rows.length - 1)
    } yield (rows(i), rows(j), (j - i).toLong)).toSet
  }

  test("candidates are exactly the rank-distance-<=w pairs in sort order") {
    val got = Linkage.sortedNeighborhood(people(200), 3,
      col("score"), col("id"))
      .select(col("a_id"), col("b_id"), col("rank_gap"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == reference(200, 3))
  }

  test("pair count is n*w - w*(w+1)/2 (every row meets its w successors)") {
    val n = 100; val w = 5
    val got = Linkage.sortedNeighborhood(people(n), w, col("score"), col("id"))
    assert(got.count() == n.toLong * w - w.toLong * (w + 1) / 2)
  }

  test("input partitioning does not change the candidate set") {
    val base = people(300)
    val got = Linkage.sortedNeighborhood(base.repartition(11), 4,
      col("score"), col("id"))
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet
    val want = reference(300, 4).map(t => (t._1, t._2))
    assert(got == want)
  }

  test("a-side is always the rank-lower row and carries all attrs") {
    val got = Linkage.sortedNeighborhood(people(50), 2, col("score"), col("id"))
    assert(got.columns.toSet ==
      Set("a_id", "a_score", "a_tag", "b_id", "b_score", "b_tag", "rank_gap"))
    // sort order is (score, id): a-side is never strictly greater
    assert(got.where(col("a_score") > col("b_score")).count() == 0L)
  }

  // ---- edit-distance family (VERDICT r12 #1) -------------------------

  /** Deterministic pseudo-random strings over a small alphabet —
    * variable lengths (including the short tail the segment grid's
    * empty-width edge exists for) and enough collisions to exercise
    * every rung. */
  private def strings(n: Int, alphabet: String, maxLen: Int): Seq[(Long, String)] =
    (1 to n).map { i =>
      var h = i * 2654435761L
      def next(m: Int) = { h = h * 6364136223846793005L + 1442695040888963407L
        (math.abs(h >> 33) % m).toInt }
      val len = 1 + next(maxLen)
      (i.toLong, (1 to len).map(_ => alphabet(next(alphabet.length))).mkString)
    }

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  /** Brute-force same-block pairs at dist ≤ r (blk = first char). */
  private def bruteWithin(rows: Seq[(Long, String)], r: Int): Set[(Long, Long, Long)] =
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib && sa.head == sb.head && lev(sa, sb) <= r
    } yield (ia, ib, lev(sa, sb).toLong)).toSet

  test("editCandidates is a superset of every same-block pair at dist <= r") {
    val rows = strings(220, "abc", 9)
    val df = rows.toDF("id", "s").withColumn("blk", substring(col("s"), 1, 1))
    for (r <- 1 to 3) {
      val cands = Linkage.editCandidates(df, "id", "s", "blk", r)
        .select(col("id1"), col("id2")).as[(Long, Long)].collect().toSet
      val need = bruteWithin(rows, r).map(t => (t._1, t._2))
      assert(need.subsetOf(cands),
        s"rung $r missed ${(need -- cands).take(5)} of ${need.size}")
      // no duplicate pairs, no self-pairs, ordered ids
      val all = Linkage.editCandidates(df, "id", "s", "blk", r)
        .select("id1", "id2").collect()
      assert(all.length == all.distinct.length)
      assert(all.forall(row => row.getLong(0) < row.getLong(1)))
    }
  }

  /** Brute-force global top-k by (dist, id1, id2) over same-blk pairs. */
  private def bruteTopK(rows: Seq[(Long, String)], k: Int): Seq[(Long, Long, Long)] =
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib && sa.head == sb.head
    } yield (ia, ib, lev(sa, sb).toLong))
      .sortBy { case (a, b, d) => (d, a, b) }.take(k)

  test("topKClosestPairs: rung-0 branch (duplicate-heavy corpus)") {
    // 2-char alphabet, short strings → many identical-sig groups;
    // singlePassBelow = 0 forces the big-corpus path on a small frame
    val rows = strings(300, "ab", 3)
    val df = rows.toDF("id", "s").withColumn("blk", substring(col("s"), 1, 1))
    val got = Linkage.topKClosestPairs(df, "id", "s", "blk", k = 15,
        singlePassBelow = 0L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == bruteTopK(rows, 15))
    assert(got.forall(_._3 == 0L), "rung 0 must have fired (all dist 0)")
    // and the small-corpus single-pass default agrees
    val sp = Linkage.topKClosestPairs(df, "id", "s", "blk", k = 15)
      .as[(Long, Long, Long)].collect().toSeq
    assert(sp == got)
  }

  test("topKClosestPairs: ladder branch (distinct strings, close pairs)") {
    val rows = strings(260, "abcde", 10)
    val df = rows.toDF("id", "s").withColumn("blk", substring(col("s"), 1, 1))
    // forced ladder (big-corpus path) and the single-pass default must
    // both equal brute force
    val ladder = Linkage.topKClosestPairs(df, "id", "s", "blk", k = 20,
        singlePassBelow = 0L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(ladder == bruteTopK(rows, 20))
    val single = Linkage.topKClosestPairs(df, "id", "s", "blk", k = 20)
      .as[(Long, Long, Long)].collect().toSeq
    assert(single == bruteTopK(rows, 20))
  }

  test("topKClosestPairs: fallback branch (sparse corpus, cutoff past maxRung)") {
    // long strings over a wide alphabet → nearest pairs sit far apart
    val rows = strings(40, "abcdefghijklmnop", 14).filter(_._2.length >= 8)
    val df = rows.toDF("id", "s").withColumn("blk", substring(col("s"), 1, 1))
    val brute = bruteTopK(rows, 10)
    assert(brute.exists(_._3 > 3), "fixture must force the fallback rung")
    val got = Linkage.topKClosestPairs(df, "id", "s", "blk", k = 10)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == brute)
    // budget 0 forces the salted-join fallback — identical answer
    val salted = Linkage.topKClosestPairs(df, "id", "s", "blk", k = 10,
        broadcastBudget = 0L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(salted == brute)
  }

  test("editJoinByDistinct equals the brute-force block join") {
    // low-distinct values: ~12 names over 150 rows, blocked on tag
    val rows = (1 to 150).map { i =>
      val name = Seq("alpha", "alpine", "alpaca", "beta", "betta", "bertha",
        "gamma", "gamba", "gumbo", "delta", "dalta", "delia")(i * 7 % 12)
      (i.toLong, name, s"t${i % 3}")
    }
    val df = rows.toDF("id", "name", "tag")
    val got = Linkage.editJoinByDistinct(df, "id", "name", Seq("tag"), maxDist = 2)
      .select(col("id1"), col("id2"), col("dist").cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    val want = (for {
      (ia, na, ta) <- rows; (ib, nb, tb) <- rows
      if ia < ib && ta == tb && lev(na, nb) <= 2
    } yield (ia, ib, lev(na, nb).toLong)).toSet
    assert(got == want)
    // each unordered pair ships exactly once
    val cnt = Linkage.editJoinByDistinct(df, "id", "name", Seq("tag"), maxDist = 2)
      .groupBy("id1", "id2").count().where(col("count") > 1).count()
    assert(cnt == 0L)
    // grid value-pair generation (gridDomain = 0 forces the PassJoin
    // grid on the value domain — VERDICT r14 #4): identical rows, and
    // still one row per unordered pair
    val grid = Linkage.editJoinByDistinct(df, "id", "name", Seq("tag"),
        maxDist = 2, gridDomain = 0L)
      .select(col("id1"), col("id2"), col("dist").cast("long"))
      .as[(Long, Long, Long)].collect()
    assert(grid.toSet == want)
    assert(grid.length == grid.distinct.length)
    // grid path with maxDist = 0: identity value pairs only
    val grid0 = Linkage.editJoinByDistinct(df, "id", "name", Seq("tag"),
        maxDist = 0, gridDomain = 0L)
      .select(col("id1"), col("id2"), col("dist").cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    val want0 = (for {
      (ia, na, ta) <- rows; (ib, nb, tb) <- rows
      if ia < ib && ta == tb && na == nb
    } yield (ia, ib, 0L)).toSet
    assert(grid0 == want0)
  }

  test("editJoinByDistinct: shuffled (non-broadcast) name-pair path parity") {
    val rows = (1 to 80).map { i =>
      (i.toLong, Seq("kilo", "kila", "milo", "mila")(i % 4), "x")
    }
    val df = rows.toDF("id", "name", "tag")
    // budget 0 forces the shuffled value-pair path; salt=3 exercises
    // the fragment grid — same rows as the broadcast path
    val got = Linkage.editJoinByDistinct(df, "id", "name", Seq("tag"),
        maxDist = 1, salt = 3, broadcastBudget = 0L)
      .select(col("id1"), col("id2"), col("dist").cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    val want = (for {
      (ia, na, _) <- rows; (ib, nb, _) <- rows
      if ia < ib && lev(na, nb) <= 1
    } yield (ia, ib, lev(na, nb).toLong)).toSet
    assert(got == want)
  }

  // ---- round-14 additions: cache hygiene, incremental, front door ----

  test("topKClosestPairs leaves no persisted RDDs behind (any branch)") {
    // VERDICT r13 #3 / ADVICE r13: the ladder caches sig, grp and each
    // rung; a long session (the 339-query bench loop) must not
    // accumulate abandoned caches. Run every branch shape and assert
    // the persistent-RDD set is exactly what it was before.
    val sc = spark.sparkContext
    def leaked[T](body: => T): Set[Int] = {
      val before = sc.getPersistentRDDs.keySet.toSet
      body
      sc.getPersistentRDDs.keySet.toSet -- before
    }
    val dup = strings(300, "ab", 3)
      .toDF("id", "s").withColumn("blk", substring(col("s"), 1, 1))
    val dist = strings(260, "abcde", 10)
      .toDF("id", "s").withColumn("blk", substring(col("s"), 1, 1))
    val sparse0 = strings(40, "abcdefghijklmnop", 14)
      .filter(_._2.length >= 8)
    val sparse = sparse0.toDF("id", "s")
      .withColumn("blk", substring(col("s"), 1, 1))
    // rung-0, ladder, single-pass and both fallback dials — each must
    // come back clean AND the results stay materialized (readable
    // after the unpersists)
    assert(leaked {
      val r = Linkage.topKClosestPairs(dup, "id", "s", "blk", 15,
        singlePassBelow = 0L)
      assert(r.count() == 15)
    }.isEmpty)
    assert(leaked {
      val r = Linkage.topKClosestPairs(dist, "id", "s", "blk", 20,
        singlePassBelow = 0L)
      assert(r.as[(Long, Long, Long)].collect().toSeq == bruteTopK(
        strings(260, "abcde", 10), 20))
    }.isEmpty)
    assert(leaked {
      Linkage.topKClosestPairs(dist, "id", "s", "blk", 20).count()
    }.isEmpty)
    assert(leaked {
      Linkage.topKClosestPairs(sparse, "id", "s", "blk", 10).count()
    }.isEmpty)
    assert(leaked {
      Linkage.topKClosestPairs(sparse, "id", "s", "blk", 10,
        broadcastBudget = 0L).count()
    }.isEmpty)
  }

  test("incrementalEditCandidates: exactly the >=1-delta-member pairs, " +
      "superset-exact after the DP verify") {
    val rows = strings(240, "abc", 9)
    val deltaIds = rows.map(_._1).filter(_ % 3 == 0).toSet
    val df = rows.toDF("id", "s").withColumn("blk", substring(col("s"), 1, 1))
    val corpus = df.where(col("id") % 3 =!= 0)
    val delta = df.where(col("id") % 3 === 0)
    for (r <- 1 to 3) {
      val cand = Linkage.incrementalEditCandidates(
          corpus, delta, "id", "s", "blk", r)
      val pairs = cand.select("id1", "id2").as[(Long, Long)].collect()
      // candidate algebra: every pair involves >= 1 delta member, no
      // duplicates, ordered ids
      assert(pairs.forall(p => deltaIds(p._1) || deltaIds(p._2)))
      assert(pairs.length == pairs.distinct.length)
      assert(pairs.forall(p => p._1 < p._2))
      // superset of every true >=1-delta pair at dist <= r ...
      val need = bruteWithin(rows, r)
        .filter(t => deltaIds(t._1) || deltaIds(t._2))
      assert(need.map(t => (t._1, t._2)).subsetOf(pairs.toSet),
        s"rung $r missed pairs")
      // ... and EXACT once verified with the banded DP
      val verified = cand
        .withColumn("dist", levenshtein(col("s1"), col("s2"), r).cast("long"))
        .where(col("dist") >= 0)
        .select("id1", "id2", "dist").as[(Long, Long, Long)].collect().toSet
      assert(verified == need, s"rung $r verify mismatch")
    }
  }

  test("editJoin front door: dial pinned pure, both stances exact and equal") {
    // the dial itself (q282 lesson: pin the decision, not just the
    // branches): collapse iff values repeat — saturation only, no
    // upper domain cap (VERDICT r14 #4: past gridDomain the collapse
    // stances generate value pairs through the PassJoin grid, so a
    // huge-but-saturated domain no longer needs the row-level stance)
    assert(!Linkage.chooseCollapse(n = 100, dn = 100))
    assert(!Linkage.chooseCollapse(n = 100, dn = 51))
    assert(Linkage.chooseCollapse(n = 100, dn = 50))
    assert(Linkage.chooseCollapse(n = 2000000, dn = 65537))
    assert(Linkage.chooseCollapse(n = 1000000000L, dn = 400000000L))
    assert(!Linkage.chooseCollapse(n = 1000000000L, dn = 500000001L))
    // duplicate-heavy corpus: default dial -> collapse; the explicit
    // override forces the PassJoin stance on the SAME frame —
    // identical rows
    val rows = (1 to 150).map { i =>
      val name = Seq("alpha", "alpine", "alpaca", "beta", "betta", "bertha",
        "gamma", "gamba", "gumbo", "delta", "dalta", "delia")(i * 7 % 12)
      (i.toLong, name, s"t${i % 3}")
    }
    val df = rows.toDF("id", "name", "tag")
    val want = (for {
      (ia, na, ta) <- rows; (ib, nb, tb) <- rows
      if ia < ib && ta == tb && lev(na, nb) <= 2
    } yield (ia, ib, lev(na, nb).toLong)).toSet
    val collapsed = Linkage.editJoin(df, "id", "name", Seq("tag"), maxDist = 2)
      .as[(Long, Long, Long)].collect().toSet
    val passjoin = Linkage.editJoin(df, "id", "name", Seq("tag"), maxDist = 2,
        collapse = Some(false))
      .as[(Long, Long, Long)].collect().toSet
    assert(collapsed == want)
    assert(passjoin == want)
    // the GRID value-pair path (gridDomain = 0 forces it inside the
    // collapse stance — the VERDICT r14 #4 branch): same rows again
    val grid = Linkage.editJoin(df, "id", "name", Seq("tag"), maxDist = 2,
        collapse = Some(true), gridDomain = 0L)
      .as[(Long, Long, Long)].collect().toSet
    assert(grid == want)
    // distinct-domain corpus (ratio ~1): the default dial takes the
    // PassJoin stance; brute parity again
    val uniq = strings(180, "abcd", 8)
    val udf = uniq.toDF("id", "s").withColumn("blk", substring(col("s"), 1, 1))
    val got = Linkage.editJoin(udf, "id", "s", Seq("blk"), maxDist = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == bruteWithin(uniq, 2))
    // maxDist = 0 degenerates to the collapse (exact equality) stance
    val eq0 = Linkage.editJoin(df, "id", "name", Seq("tag"), maxDist = 0)
      .as[(Long, Long, Long)].collect().toSet
    val eqWant = (for {
      (ia, na, ta) <- rows; (ib, nb, tb) <- rows
      if ia < ib && ta == tb && na == nb
    } yield (ia, ib, 0L)).toSet
    assert(eq0 == eqWant)
  }

  test("incrementalEditJoin front door: both stances equal the brute " +
      ">=1-delta join, each pair ships once") {
    val rows = strings(240, "abc", 9)
    val deltaIds = rows.map(_._1).filter(_ % 3 == 0).toSet
    val df = rows.toDF("id", "s").withColumn("blk", substring(col("s"), 1, 1))
    val corpus = df.where(col("id") % 3 =!= 0)
    val delta = df.where(col("id") % 3 === 0)
    val want = bruteWithin(rows, 2)
      .filter(t => deltaIds(t._1) || deltaIds(t._2))
    // growing domain (ratio ~1): default dial -> PassJoin stance
    val pass = Linkage.incrementalEditJoin(corpus, delta,
        "id", "s", "blk", maxDist = 2)
      .as[(Long, Long, Long)].collect()
    assert(pass.toSet == want)
    assert(pass.length == pass.distinct.length)
    // DUPLICATED corpus -> default dial takes the collapse stance
    val dupRows = rows.map { case (i, s) => (i, s.take(3), s"b") }
    val dupDeltaIds = dupRows.map(_._1).filter(_ % 3 == 0).toSet
    val ddf = dupRows.toDF("id", "s", "blk")
    val dCorpus = ddf.where(col("id") % 3 =!= 0)
    val dDelta = ddf.where(col("id") % 3 === 0)
    val dWant = (for {
      (ia, sa, _) <- dupRows; (ib, sb, _) <- dupRows
      if ia < ib && lev(sa, sb) <= 1 &&
        (dupDeltaIds(ia) || dupDeltaIds(ib))
    } yield (ia, ib, lev(sa, sb).toLong)).toSet
    val collapsed = Linkage.incrementalEditJoin(dCorpus, dDelta,
        "id", "s", "blk", maxDist = 1)
      .as[(Long, Long, Long)].collect()
    assert(collapsed.toSet == dWant)
    assert(collapsed.length == collapsed.distinct.length)
    // and the PassJoin stance FORCED onto the duplicated corpus agrees
    val forced = Linkage.incrementalEditJoin(dCorpus, dDelta,
        "id", "s", "blk", maxDist = 1, collapse = Some(false))
      .as[(Long, Long, Long)].collect().toSet
    assert(forced == dWant)
    // shuffled (non-broadcast) value-pair path parity on the collapse
    val shuffled = Linkage.incrementalEditJoin(dCorpus, dDelta,
        "id", "s", "blk", maxDist = 1, salt = 3, broadcastBudget = 0L)
      .as[(Long, Long, Long)].collect().toSet
    assert(shuffled == dWant)
    // the GRID value-pair path inside the incremental collapse
    // (gridDomain = 0 forces it), via the PUBLIC stance door q343
    // oracles — same rows once more
    val gridIncr = Linkage.incrementalEditJoinByDistinct(dCorpus, dDelta,
        "id", "s", "blk", maxDist = 1, gridDomain = 0L)
      .as[(Long, Long, Long)].collect()
    assert(gridIncr.toSet == dWant)
    assert(gridIncr.length == gridIncr.distinct.length)
    // the public stance door on the GROWING-domain frame (where the
    // auto dial would pick PassJoin): the collapse stance stays exact
    val forcedCollapse = Linkage.incrementalEditJoinByDistinct(
        corpus, delta, "id", "s", "blk", maxDist = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(forcedCollapse == want)
  }

  test("editJoin composite blocks: struct equality, not string concat") {
    // two block columns whose CONCAT collides ("ab","c") vs ("a","bc")
    // but whose struct values differ — the pairs must NOT match
    val df = Seq((1L, "same", "ab", "c"), (2L, "same", "a", "bc"))
      .toDF("id", "s", "b1", "b2")
    assert(Linkage.editJoin(df, "id", "s", Seq("b1", "b2"), maxDist = 2,
      collapse = Some(false)).count() == 0L)
    assert(Linkage.editJoin(df, "id", "s", Seq("b1", "b2"),
      maxDist = 2).count() == 0L)
  }
}
