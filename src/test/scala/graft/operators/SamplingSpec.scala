package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("systematicSample equals the single-window global prefix form") {
    // the distributed (range-partition + per-partition offsets) cum
    // must equal a plain global-window cumsum, row for row
    val df = (1L to 997L).map(i => (i, (i % 13) + 1)).toDF("id", "w")
      .repartition(7) // scrambled input partitioning
    val got = Sampling.systematicSample(df, "id", "w", k = 40)
      .as[(Long, Long, Long)].collect().toSet
    val total = (1L to 997L).map(i => (i % 13) + 1).sum
    val step = total / 40
    val cum = df.withColumn("cum",
        sum(col("w")).over(Window.orderBy("id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .as[(Long, Long, Long)].collect()
    val want = cum.filter { case (_, w, c) => c / step > (c - w) / step }.toSet
    assert(got == want)
    assert(got.size >= 40)
  }

  test("a row with weight >= step is always selected; zero weights never") {
    val df = Seq((1L, 5L), (2L, 1000L), (3L, 5L), (4L, 0L), (5L, 7L))
      .toDF("id", "w")
    val got = Sampling.systematicSample(df, "id", "w", k = 3)
      .select("id").as[Long].collect().toSet
    assert(got.contains(2L)) // covers > step of the line
    assert(!got.contains(4L)) // zero weight covers nothing
  }

  test("fails loudly when total weight cannot support k") {
    val df = Seq((1L, 2L), (2L, 3L)).toDF("id", "w")
    val e = intercept[IllegalArgumentException](
      Sampling.systematicSample(df, "id", "w", k = 100))
    assert(e.getMessage.contains("total weight"))
  }

  test("mixtureDraw: largest-remainder quotas, deterministic hash picks") {
    // weights 50/30/20 over k=10 -> exact slots 5/3/2 (no remainders)
    val docs = (1L to 300L).map { i =>
      val src = if (i <= 150) "a" else if (i <= 240) "b" else "c"
      (i, src, if (src == "a") 50L else if (src == "b") 50L else 40L)
    }
    // per-source totals: a=150*50=7500, b=90*50=4500, c=60*40=2400
    // k=48: base = 7500*48//14400=25, 4500*48//14400=15, 2400*48//14400=8
    val df = docs.toDF("id", "src", "w")
    val got = Sampling.mixtureDraw(df, "id", "src", "w", k = 48)
      .as[(Long, String, Long, Long)].collect()
    val bySrc = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc == Map("a" -> 25, "b" -> 15, "c" -> 8))
    assert(got.length == 48)
    // rk is dense 1..slots within each source
    assert(got.groupBy(_._2).forall { case (_, rows) =>
      rows.map(_._3).sorted.toSeq == (1L to rows.length.toLong) })
    // deterministic across partitionings
    val again = Sampling.mixtureDraw(df.repartition(13), "id", "src", "w", 48)
      .as[(Long, String, Long, Long)].collect()
    assert(got.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("mixtureDraw: a group smaller than its quota under-fills visibly") {
    // source "big" carries almost all weight but has only 2 rows
    val df = Seq((1L, "big", 1000L), (2L, "big", 1000L),
      (3L, "small", 1L), (4L, "small", 1L), (5L, "small", 1L))
      .toDF("id", "src", "w")
    val got = Sampling.mixtureDraw(df, "id", "src", "w", k = 10)
      .as[(Long, String, Long, Long)].collect()
    val big = got.filter(_._2 == "big")
    assert(big.length == 2) // drew everything it has
    assert(big.head._4 > 2) // quota larger than the draw -> under-fill
  }

  test("deterministic across runs and input partitionings") {
    val base = (1L to 500L).map(i => (i, (i * i) % 29 + 1))
    val a = Sampling.systematicSample(base.toDF("id", "w"), "id", "w", 25)
      .as[(Long, Long, Long)].collect().toSet
    val b = Sampling.systematicSample(
        base.reverse.toDF("id", "w").repartition(13), "id", "w", 25)
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b)
  }

  test("nucleusTopP: crossing key kept, tail dropped, ties by key order") {
    // group g: weights 50, 30, 15, 5 — p=0.7 → 50 kept (0 < 70),
    // 30 kept (50 < 70, crosses the line), 15 dropped (80 ≥ 70)
    val df = Seq(("g", "a", 50L), ("g", "b", 30L), ("g", "c", 15L),
      ("g", "d", 5L)).toDF("grp", "key", "w")
    val got = Sampling.nucleusTopP(df, "grp", "key", "w", p = 0.7)
      .as[(String, String, Long, Double, Boolean)].collect()
      .map(r => r._2 -> r._5).toMap
    assert(got == Map("a" -> true, "b" -> true, "c" -> false, "d" -> false))

    // the heaviest key always survives, even when p is tiny
    val one = Sampling.nucleusTopP(df, "grp", "key", "w", p = 0.01)
      .as[(String, String, Long, Double, Boolean)].collect()
    assert(one.count(_._5) == 1 && one.find(_._5).get._2 == "a")

    // equal weights: ties broken by key order, deterministically
    val ties = Seq(("g", "x", 10L), ("g", "y", 10L), ("g", "z", 10L))
      .toDF("grp", "key", "w")
    val kept = Sampling.nucleusTopP(ties, "grp", "key", "w", p = 0.5)
      .as[(String, String, Long, Double, Boolean)].collect()
      .filter(_._5).map(_._2).toSet
    assert(kept == Set("x", "y")) // cum-before: x=0, y=10 < 15, z=20 ≥ 15
  }

  test("mixtureEpochs: equal-share budget implies total/(k·w) passes") {
    val w = Seq(("big", 300L), ("small", 100L)).toDF("src", "tokens")
    val got = Sampling.mixtureEpochs(w, "src", "tokens")
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // total 400, 2 sources → each targets 200 tokens
    assert(got("big") == (("big", 300L, 0.75, 0.5, 0.666667))) // round 6
    assert(got("small") == (("small", 100L, 0.25, 0.5, 2.0)))
    // weighted mixture identity: Σ natural_share = 1, Σ 1/k = 1
    assert(math.abs(got.values.map(_._3).sum - 1.0) < 1e-9)
  }
}
