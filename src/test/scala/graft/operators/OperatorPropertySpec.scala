package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Random-input invariants for the round-4 operators (raw ScalaCheck
  * generators with fixed seeds — the scalatestplus bridge is not in the
  * offline artifact cache, same pattern as Scd2PropertySpec). */
class OperatorPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val params = Gen.Parameters.default

  test("slidingChunks: token coverage, chunk-count formula, determinism") {
    val textGen = for {
      n <- Gen.choose(0, 40)
      toks <- Gen.listOfN(n, Gen.oneOf("alpha", "beta", "gamma", "x", "yz"))
    } yield toks.mkString(" ")
    for (trial <- 0 until 6) {
      val texts = Gen.listOfN(30, textGen).apply(params, Seed(7000L + trial)).get
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val window = 4 + trial % 3
      val stride = 1 + trial % window
      val out = Split.slidingChunks(docs, "doc_id", "text", window, stride)
        .as[(Long, Int, Int, String)].collect()
      val byDoc = out.groupBy(_._1)
      for ((id, text) <- texts.zipWithIndex.map(_.swap)) {
        val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
        byDoc.get(id.toLong) match {
          case None => assert(toks.isEmpty, s"doc $id lost: '$text'")
          case Some(chunks) =>
            // chunk count = 1 + ceil(max(n-W,0)/S)
            val expected = 1 + math.ceil(
              math.max(toks.size - window, 0).toDouble / stride).toInt
            assert(chunks.length == expected,
              s"doc $id: ${chunks.length} chunks, expected $expected (n=${toks.size})")
            // every token position covered by at least one chunk
            val covered = chunks.sortBy(_._2).flatMap { case (_, cid, _, txt) =>
              val start = cid * stride
              txt.split(" ").zipWithIndex.map { case (tok, j) => (start + j, tok) }
            }.toMap
            assert(covered.size == toks.size &&
              toks.indices.forall(i => covered(i) == toks(i)),
              s"doc $id coverage mismatch")
        }
      }
    }
  }

  test("BottomKByKey equals sort-take(k) on random grouped data") {
    val rowGen = for {
      g <- Gen.choose(0, 3)
      k <- Gen.choose(-1000L, 1000L)
      v <- Gen.choose(-100, 100).map(_ / 10.0)
    } yield (g, k, v)
    for (trial <- 0 until 6) {
      val rows = Gen.listOfN(400, rowGen).apply(params, Seed(8000L + trial)).get
      val df = rows.toDF("g", "h", "v")
      val k = 1 + trial * 3
      val got = df.groupBy($"g")
        .agg(graft.functions.TopKAggregate
          .bottomkByKey($"h", $"v", k).as("bk"))
        .select($"g",
          org.apache.spark.sql.functions
            .expr("transform(bk, x -> struct(x.h AS _1, x.v AS _2))").as("bk"))
        .as[(Int, Seq[(Long, Double)])].collect().toMap
      val want = rows.groupBy(_._1).map { case (g, rs) =>
        g -> rs.map(r => (r._2, r._3)).sorted.take(k)
      }
      assert(got.keySet == want.keySet)
      for ((g, w) <- want) assert(got(g) == w,
        s"group $g k=$k: ${got(g)} vs $w")
    }
  }

  test("typicalityScore ∈ (0, 1] on random corpora (c2 ≤ c1 pointwise)") {
    val textGen = for {
      n <- Gen.choose(1, 25)
      toks <- Gen.listOfN(n, Gen.oneOf("aa", "ab", "ba", "zq", "mw", "q"))
    } yield toks.mkString(" ")
    for (trial <- 0 until 4) {
      val texts = Gen.listOfN(40, textGen).apply(params, Seed(11000L + trial)).get
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = TextAnalysis.typicalityScore(docs, "doc_id", "text")
        .select("doc_id", "typicality").as[(Long, Double)].collect()
      assert(out.length == texts.length)
      for ((id, t) <- out)
        assert(t > 0.0 && t <= 1.0, s"doc $id typicality $t out of (0,1]")
    }
  }

  test("resizeStub: length min(n, target), bytes within payload range") {
    val textGen = for {
      n <- Gen.choose(0, 200)
      cs <- Gen.listOfN(n, Gen.choose('a', 'z'))
    } yield cs.mkString
    for (trial <- 0 until 4) {
      val texts = Gen.listOfN(30, textGen).apply(params, Seed(12000L + trial)).get
      // ids ≡ 0 mod 3 → every doc is 'image' kind
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong * 3, t) }
        .toDF("doc_id", "text")
        .selectExpr("doc_id", "text", "'src' AS source", "'en' AS lang",
          "length(text) AS n_chars")
      val target = 16 + trial * 16
      val out = Multimodal.resizeStub(
        Multimodal.corpusFromDocuments(docs), target).collect()
      assert(out.length == texts.length)
      for (r <- out) {
        val src = texts((r.media_id / 3).toInt).getBytes("UTF-8")
        assert(r.n_orig == src.length)
        assert(r.n_resized == math.min(src.length, target),
          s"media ${r.media_id}: ${r.n_resized} vs min(${src.length}, $target)")
        if (src.nonEmpty) {
          val lo = src.min; val hi = src.max
          assert(r.resized.forall(b => b >= lo && b <= hi),
            s"media ${r.media_id}: average left the byte range")
        }
      }
    }
  }

  test("overlapsSelf: naive ≡ bucketed on random bounded intervals") {
    val ivGen = for {
      key <- Gen.choose(0L, 4L)
      start <- Gen.choose(0L, 5000000L)
      len <- Gen.choose(0L, 600000L) // within the enforced bound below
    } yield (key, start, len)
    for (trial <- 0 until 4) {
      val ivs = Gen.listOfN(150, ivGen).apply(params, Seed(9000L + trial)).get
      val df = ivs.zipWithIndex.map { case ((key, s, len), i) =>
        (key, i.toLong,
          new java.sql.Timestamp(s / 1000),
          new java.sql.Timestamp((s + len) / 1000))
      }.toDF("k", "id", "s", "e")
      val maxLen = 1000000L // µs; len ≤ 600000 µs always passes
      def rows(d: org.apache.spark.sql.DataFrame) =
        d.select("k", "id_1", "id_2").as[(Long, Long, Long)].collect().toSet
      val naive = rows(IntervalJoin.overlapsSelfNaive(
        df, Seq("k"), Seq("id"), "s", "e", maxLen))
      val bucketed = rows(IntervalJoin.overlapsSelf(
        df, Seq("k"), Seq("id"), "s", "e", maxLen))
      assert(naive == bucketed, s"trial $trial: ${naive.size} vs ${bucketed.size}")
      assert(naive.nonEmpty, "degenerate trial: no overlapping pairs at all")
    }
  }

  test("mergeUpsert: idempotent, and target-equivalent to a map-merge model") {
    val rowGen = for {
      k <- Gen.choose(0L, 40L)
      v <- Gen.choose(-100, 100)
      name <- Gen.option(Gen.oneOf("a", "b", "c"))
    } yield (k, name, v)
    for (trial <- 0 until 4) {
      val seedRows = Gen.listOfN(30, rowGen).apply(params, Seed(11000L + trial)).get
      val target = seedRows.groupBy(_._1).map(_._2.head).toSeq
        .toDF("k", "name", "v")
      val srcRows = Gen.listOfN(15, rowGen).apply(params, Seed(12000L + trial))
        .get.groupBy(_._1).map(_._2.head).toSeq
        .map { case (k, n, v) => (k, n, v, v % 5 == 0) }
      val source = srcRows.toDF("k", "name", "v", "del")
      def run(t: org.apache.spark.sql.DataFrame) =
        Cdc.mergeUpsert(t, source, Seq("k"), Some("del"))
      val once = run(target).as[(Long, Option[String], Int)].collect().toSet
      // reference model: plain Map semantics
      val model = (target.as[(Long, Option[String], Int)].collect()
        .map(r => r._1 -> r).toMap ++
        srcRows.filterNot(_._4).map(r => r._1 -> ((r._1, r._2, r._3))).toMap)
        .-- (srcRows.filter(_._4).map(_._1))
      assert(once == model.values.toSet, s"trial $trial")
      // idempotent: merging the same source again changes nothing
      val twice = run(once.toSeq.toDF("k", "name", "v"))
        .as[(Long, Option[String], Int)].collect().toSet
      assert(twice == once, s"trial $trial not idempotent")
    }
  }

  test("systematicSample ≡ global-window form on random positive weights") {
    val wGen = Gen.choose(1L, 50L)
    for (trial <- 0 until 4) {
      val ws = Gen.listOfN(200, wGen).apply(params, Seed(13000L + trial)).get
      val df = ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("id", "w").repartition(5 + trial)
      val k = 10 + 7 * trial
      val got = Sampling.systematicSample(df, "id", "w", k)
        .as[(Long, Long, Long)].collect().toSet
      val total = ws.sum
      val step = total / k
      var cum = 0L
      val want = ws.zipWithIndex.flatMap { case (w, i) =>
        cum += w
        if (cum / step > (cum - w) / step) Some((i.toLong, w, cum)) else None
      }.toSet
      assert(got == want, s"trial $trial: ${got.size} vs ${want.size}")
      assert(got.size >= k)
    }
  }

  test("ngramContainment ∈ (0,1]; containment ≥ jaccard on random texts") {
    val textGen = for {
      n <- Gen.choose(5, 30)
      toks <- Gen.listOfN(n, Gen.oneOf("lorem", "ipsum", "dolor", "sit",
        "amet", "qq", "zz"))
    } yield toks.mkString(" ")
    for (trial <- 0 until 3) {
      val texts = Gen.listOfN(25, textGen).apply(params, Seed(14000L + trial)).get
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val cont = Dedup.ngramContainment(docs, "doc_id", "text", 5, 1000, 0.0)
        .as[(Long, Long, Double)].collect()
      val jac = Dedup.ngramJaccard(docs, "doc_id", "text", 5, 1000, 0.0)
        .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
      assert(cont.nonEmpty)
      cont.foreach { case (a, b, c) =>
        assert(c > 0.0 && c <= 1.0, s"containment $c out of (0,1]")
        assert(c >= jac((a, b)) - 1e-9, s"pair ($a,$b): $c < ${jac((a, b))}")
      }
    }
  }

  test("bfsHops: BFS certificate on random graphs — seeds at 0, every " +
       "positive distance has a predecessor one hop closer") {
    for (trial <- 0 until 4) {
      val n = 60 + trial * 25
      val edgeGen = for {
        u <- Gen.choose(1L, n.toLong); v <- Gen.choose(1L, n.toLong)
      } yield (u, v)
      val raw = Gen.listOfN(n * 2, edgeGen).apply(params, Seed(15000L + trial))
        .get.filter(e => e._1 != e._2)
      val edges = raw.toDF("u", "v")
      val seeds = Seq(1L, 2L).toDF("id")
      val maxHops = 3
      val got = Graph.bfsHops(edges, seeds, "u", "v", "id", maxHops)
        .as[(Long, Long)].collect().toMap
      assert(got(1L) == 0L && got(2L) == 0L)
      val adj = raw.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      for ((id, d) <- got) {
        assert(d >= 0 && d <= maxHops)
        if (d > 0) {
          // some neighbour sits exactly one hop closer
          assert(adj(id).exists(nb => got.get(nb).contains(d - 1)),
            s"node $id at dist $d has no predecessor at ${d - 1}")
        }
        // no neighbour is more than one hop better than claimed
        assert(adj.getOrElse(id, Set.empty)
          .forall(nb => got.get(nb).forall(_ >= d - 1)),
          s"node $id at dist $d has a neighbour closer than ${d - 1}")
      }
    }
  }

  test("pageRankScaled: mass bounds and per-node range on random graphs") {
    val scale = 1000000000000L
    for (trial <- 0 until 4) {
      val n = 50 + trial * 30
      val edgeGen = for {
        u <- Gen.choose(1L, n.toLong); v <- Gen.choose(1L, n.toLong)
      } yield (u, v)
      val raw = Gen.listOfN(n * 2, edgeGen).apply(params, Seed(16000L + trial))
        .get.filter(e => e._1 != e._2)
      val ranks = Graph.pageRankScaled(raw.toDF("u", "v"), "u", "v", 3)
        .as[(Long, Long)].collect()
      val nodes = raw.flatMap(e => Seq(e._1, e._2)).distinct.size
      assert(ranks.length == nodes)
      val total = ranks.map(_._2).sum
      // truncating divisions only LOSE mass: total <= N*scale; the
      // damping base alone guarantees >= 0.15*scale per node
      assert(total <= nodes.toLong * scale)
      assert(ranks.forall(_._2 >= 15L * scale / 100L))
      assert(total >= (nodes.toLong * scale * 14L) / 100L)
    }
  }

  test("mixtureDraw: slots sum to k and follow quotas when groups are deep") {
    for (trial <- 0 until 4) {
      val wGen = Gen.choose(1L, 50L)
      val srcs = Seq("a", "b", "c", "d")
      val rows = srcs.flatMap { s0 =>
        val ws = Gen.listOfN(80, wGen).apply(params, Seed(17000L + trial)).get
        ws.zipWithIndex.map { case (w, i) =>
          (s0.hashCode.toLong * 1000 + i, s0, w) }
      }
      val k = 40 + trial * 7
      val got = Sampling.mixtureDraw(rows.toDF("id", "src", "w"),
          "id", "src", "w", k)
        .as[(Long, String, Long, Long)].collect()
      assert(got.length == k, s"drew ${got.length} != k=$k")
      // every group drew exactly its slot count and ranks are dense
      got.groupBy(_._2).foreach { case (_, g) =>
        assert(g.length == g.head._4)
        assert(g.map(_._3).sorted.toSeq == (1L to g.length.toLong))
      }
    }
  }

  test("labelPropagationMin: labels never increase with rounds and " +
       "lower-bound the component minimum on random graphs") {
    for (trial <- 0 until 3) {
      val n = 40 + trial * 20
      val edgeGen = for {
        u <- Gen.choose(1L, n.toLong); v <- Gen.choose(1L, n.toLong)
      } yield (u, v)
      val raw = Gen.listOfN(n, edgeGen).apply(params, Seed(16000L + trial))
        .get.filter(e => e._1 != e._2)
      if (raw.nonEmpty) {
        val edges = raw.toDF("u", "v")
        val r2 = Graph.labelPropagationMin(edges, "u", "v", 2)
          .as[(Long, Long)].collect().toMap
        val r4 = Graph.labelPropagationMin(edges, "u", "v", 4)
          .as[(Long, Long)].collect().toMap
        val comp = Graph.connectedComponents(edges, "u", "v")
          .as[(Long, Long)].collect().toMap
        assert(r2.keySet == r4.keySet && r4.keySet == comp.keySet)
        for (id <- r2.keys) {
          assert(r4(id) <= r2(id), s"label grew with rounds at $id")
          assert(r4(id) >= comp(id), s"label below component min at $id")
          assert(r2(id) <= id) // a node never keeps more than its own id
        }
      }
    }
  }

  test("tvDistance ∈ [0, 1] and is 0 for a lone group on random token bags") {
    val tokGen = for {
      g <- Gen.oneOf("s1", "s2", "s3")
      t <- Gen.oneOf("a", "b", "c", "d", "e", "f")
    } yield (g, t)
    for (trial <- 0 until 3) {
      val rows = Gen.listOfN(120, tokGen).apply(params, Seed(17000L + trial))
        .get
      val out = TextAnalysis.tvDistance(rows.toDF("g", "token"), "g", "token")
        .as[(String, Long, Double)].collect()
      assert(out.nonEmpty)
      for ((g, cs, tv) <- out) {
        assert(cs == rows.count(_._1 == g).toLong)
        assert(tv >= 0.0 && tv <= 1.0, s"$g tv=$tv out of range")
      }
    }
  }

  test("globalPrefixSum: last value equals the total; deltas equal the " +
       "row weights, on random weights and partitionings") {
    for (trial <- 0 until 3) {
      val n = 100 + trial * 57
      val ws = Gen.listOfN(n, Gen.choose(0L, 9L))
        .apply(params, Seed(18000L + trial)).get
      val df = ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("id", "w").repartition(5 + trial * 7)
      val got = Rank.globalPrefixSum(df, "cum", "w", col("id"))
        .as[(Long, Long, Long)].collect().sortBy(_._1)
      assert(got.last._3 == ws.sum)
      val byId = got.map(r => r._1 -> r._3).toMap
      for (((w, i)) <- ws.zipWithIndex; if i > 0)
        assert(byId(i.toLong) - byId(i.toLong - 1) == w)
    }
  }
}
