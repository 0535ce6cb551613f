package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions.{col, count, lit, max, min}
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("triangle + pair + isolated-by-absence") {
    val m = components(Seq((1L, 2L), (2L, 3L), (1L, 3L), (7L, 9L)))
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("long chain converges to one component (diameter >> rounds)") {
    // path graph 0-1-2-…-40: naive propagation needs 40 rounds,
    // star-contraction needs O(log² n)
    val edges = (0L until 40L).map(i => (i, i + 1))
    val m = components(edges)
    assert(m.size == 41 && m.values.forall(_ == 0L))
  }

  test("duplicate edges, reversed edges and self-loops are normalized") {
    val m = components(Seq((5L, 4L), (4L, 5L), (5L, 5L), (4L, 5L)))
    assert(m == Map(4L -> 4L, 5L -> 4L))
  }

  test("two same-size components keep distinct minima") {
    val m = components(Seq((10L, 11L), (11L, 12L), (20L, 21L), (21L, 22L)))
    assert(m.filterKeys(_ < 20).values.toSet == Set(10L))
    assert(m.filterKeys(_ >= 20).values.toSet == Set(20L))
  }

  test("local union-find ≡ distributed star rounds on a random graph") {
    val rnd = new scala.util.Random(7)
    // ~600 nodes, 400 edges: chains, triangles, isolated pairs mixed
    val edges = Seq.fill(400)((rnd.nextLong(600), rnd.nextLong(600)))
      .filter { case (a, b) => a != b }
    val df = edges.toDF("a", "b")
    def run(threshold: Long) =
      Graph.connectedComponents(df, "a", "b", localThreshold = threshold)
        .as[(Long, Long)].collect().toMap
    val local = run(Long.MaxValue)
    val distributed = run(0L)
    assert(local.nonEmpty && local == distributed)
  }

  test("triangleCount: K4 has 4 triangles; dangling edges add none") {
    // K4 on {1,2,3,4} (4 triangles) + path 4-5-6 (0 triangles)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("u", "v")
    val got = Graph.triangleCount(edges, "u", "v")
      .as[(Long, Long, Long)].head()
    assert(got == ((6L, 8L, 4L)))
  }

  test("triangleCount: empty and triangle-free graphs yield zero rows-of-truth") {
    val empty = Seq.empty[(Long, Long)].toDF("u", "v")
    assert(Graph.triangleCount(empty, "u", "v")
      .as[(Long, Long, Long)].head() == ((0L, 0L, 0L)))
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    assert(Graph.triangleCount(path, "u", "v")
      .as[(Long, Long, Long)].head() == ((4L, 3L, 0L)))
  }

  test("degreeHistogram: counts nodes per degree on the canonical graph") {
    // triangle 1-2-3 plus pendant 4: degrees 2,2,3,1
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L),
      (2L, 1L), (1L, 1L)).toDF("u", "v") // reversed dup + self loop ignored
    val got = Graph.degreeHistogram(edges, "u", "v")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
  }

  test("degreeHistogram: empty edge set yields an empty histogram") {
    val empty = Seq.empty[(Long, Long)].toDF("u", "v")
    assert(Graph.degreeHistogram(empty, "u", "v").count() == 0)
  }

  test("bfsHops: min distance on a known graph; unreachable absent") {
    // path 1-2-3-4-5 plus triangle 1-6-7; node 9 isolated-by-absence
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (1L, 6L), (6L, 7L), (7L, 1L)).toDF("u", "v")
    val seeds = Seq(1L).toDF("id")
    val got = Graph.bfsHops(edges, seeds, "u", "v", "id", maxHops = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 6L -> 1L, 7L -> 1L,
      3L -> 2L, 4L -> 3L)) // 5 is 4 hops away: absent
  }

  test("bfsHops: maxHops 0 returns exactly the (deduplicated) seeds") {
    val edges = Seq((1L, 2L)).toDF("u", "v")
    val seeds = Seq(1L, 1L, 2L).toDF("id")
    val got = Graph.bfsHops(edges, seeds, "u", "v", "id", 0)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 0L))
  }

  test("pageRankScaled: mass conservation-ish bounds and hub ordering") {
    // star: center 1 with leaves 2..5, plus the 4-cycle 6-7-8-9
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L),
      (6L, 7L), (7L, 8L), (8L, 9L), (9L, 6L)).toDF("u", "v")
    val got = Graph.pageRankScaled(edges, "u", "v", iterations = 3)
      .as[(Long, Long)].collect().toMap
    // the star center dominates its leaves; cycle nodes are symmetric
    assert(got(1L) > got(2L))
    assert(Set(2L, 3L, 4L, 5L).map(got).size == 1) // leaves identical
    assert(Set(6L, 7L, 8L, 9L).map(got).size == 1) // cycle symmetric
    // cycle nodes keep (close to) their initial mass: r = base + 85% r
    // fixpoint = scale; quantization keeps them within a few units
    assert(math.abs(got(6L) - 1000000000000L) < 10L)
  }

  test("pageRankScaled: deterministic across partitionings and runs") {
    val edges = (1L to 400L).map(i => (i, (i * 7) % 400 + 1))
      .filter(e => e._1 != e._2).toDF("u", "v")
    val a = Graph.pageRankScaled(edges, "u", "v", 3)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val b = Graph.pageRankScaled(edges.repartition(13), "u", "v", 3)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  test("pageRankScaled: graphs beyond the old static star-bound run exact") {
    // 150k-node ring at the default scale=1e12: the former static guard
    // (85*N*scale < 2^63, star-graph worst case) rejected any graph
    // past ~108k nodes — the 10x sf1 co-purchase graph (200k nodes)
    // failed the bench on it while its true in-sums sit near `scale`.
    // The guard is per-row now; this graph must run and stay exact:
    // every ring node has deg 2 and holds (close to) its initial mass.
    val n = 150000L
    val edges = spark.range(n).select(col("id").as("u"),
      ((col("id") + 1) % n).as("v"))
    val ranks = Graph.pageRankScaled(edges, "u", "v", iterations = 2)
    val Array(row) = ranks.agg(count(lit(1)), min(col("rank_scaled")),
      max(col("rank_scaled"))).collect()
    assert(row.getLong(0) == n)
    assert(math.abs(row.getLong(1) - 1000000000000L) < 10L)
    assert(math.abs(row.getLong(2) - 1000000000000L) < 10L)
  }

  test("pageRankScaled: real in-sum overflow raises instead of wrapping") {
    // scale at the single-node ceiling: a 3-leaf star's center in-sum
    // (3*scale) overflows 85*s in the first damping update — the
    // per-row guard must fail the query loudly, not wrap the BIGINT
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("u", "v")
    val e = intercept[Throwable] {
      Graph.pageRankScaled(edges, "u", "v", iterations = 1,
        scale = Long.MaxValue / 85)
    }
    def messages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(c => Option(c.getMessage).getOrElse("")).mkString("\n")
    assert(messages(e).contains("overflows 85*s"))
  }

  test("triangleCount: duplicate/reversed/self edges canonicalize first") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L),
      (1L, 2L)).toDF("u", "v")
    val got = Graph.triangleCount(edges, "u", "v")
      .as[(Long, Long, Long)].head()
    assert(got == ((3L, 3L, 1L)))
  }

  test("triangleCount matches naive a<b<c triple join on a random graph") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(300)((rnd.nextLong(60), rnd.nextLong(60)))
      .filter { case (a, b) => a != b }
    val df = edges.toDF("u", "v")
    val got = Graph.triangleCount(df, "u", "v")
      .as[(Long, Long, Long)].head()._3
    val canon = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .toSet
    val naive = (for {
      (a, b) <- canon; (b2, c) <- canon
      if b2 == b && canon.contains((a, c))
    } yield (a, b, c)).size.toLong
    assert(got == naive)
  }

  test("labelPropagationMin: converges to components once rounds >= radius") {
    // two components: a 5-path (radius-from-min 4) and a triangle
    val edges = Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L),
      (20L, 21L), (21L, 22L), (20L, 22L))
    val got = Graph.labelPropagationMin(edges.toDF("a", "b"), "a", "b", 4)
      .as[(Long, Long)].collect().toMap
    val want = Graph.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("labelPropagationMin: k rounds move a label exactly k hops") {
    // path 0-1-2-3-4-5: after 2 rounds node i holds max(0, i-2)
    val edges = (0L until 5L).map(i => (i, i + 1))
    val got = Graph.labelPropagationMin(edges.toDF("a", "b"), "a", "b", 2)
      .as[(Long, Long)].collect().toMap
    assert(got == (0L to 5L).map(i => i -> math.max(0L, i - 2)).toMap)
  }

  test("personalizedPageRank: all-nodes seed set reduces to pageRankScaled") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L),
      (5L, 6L)).toDF("u", "v")
    val allNodes = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("id")
    val ppr = Graph.personalizedPageRankScaled(edges, "u", "v",
        allNodes, "id", iterations = 3, scale = 1000000L)
      .select("id", "ppr_scaled").as[(Long, Long)].collect().toMap
    val pr = Graph.pageRankScaled(edges, "u", "v", iterations = 3,
        scale = 1000000L)
      .as[(Long, Long)].collect().toMap
    assert(ppr == pr, "uniform seeding must be bit-equal to PageRank")
  }

  test("personalizedPageRank: mass stays in the seed component, decays with distance") {
    // path 1-2-3-4-5 plus a disconnected pair (10, 11); seed = node 1
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L)).toDF("u", "v")
    val seeds = Seq(1L).toDF("id")
    val r = Graph.personalizedPageRankScaled(edges, "u", "v", seeds,
        "id", iterations = 3, scale = 1000000000L)
      .select("id", "ppr_scaled").as[(Long, Long)].collect().toMap
    assert(r(10L) == 0L && r(11L) == 0L,
      "no teleport mass may leak into the off-seed component")
    assert(r(5L) == 0L, "node 4 hops out is unreachable in 3 iterations")
    // the 3-iteration frontier: exactly the nodes within 3 hops carry
    // mass (ordering along the path is NOT monotone — the un-lazy
    // power iteration oscillates with distance parity, by design)
    assert(Seq(1L, 2L, 3L, 4L).forall(r(_) > 0L),
      s"every node within 3 hops must carry mass: $r")
    val total = r.values.sum
    assert(total > 0L && total <= 1000000000L,
      s"total mass $total outside the injected-mass bound (1 seed)")
  }

  test("dedupClusters: every doc labelled, canonical keeps, duplicates dropped") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val pairs = Seq((2L, 4L), (4L, 5L)).toDF("id1", "id2")
    val out = Graph.dedupClusters(docs, "doc_id", pairs, "id1", "id2")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(out == Set(
      (1L, 1L, true), (2L, 2L, true), (3L, 3L, true),
      (4L, 2L, false), (5L, 2L, false)))
  }
}
