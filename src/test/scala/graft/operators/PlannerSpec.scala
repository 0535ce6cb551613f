package graft.operators

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants behind the q190–q195 planner/profiling family. */
class PlannerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("skew report: uniform key reports salt_factor 1, hot key reports its share") {
    // 9 keys × 10 rows + 1 key × 910 rows: max=910, avg=100 → salt 10
    val rows = (0 until 9).flatMap(k => Seq.fill(10)(k.toLong)) ++
      Seq.fill(910)(9L)
    val df = rows.toDF("k")
    val got = Skew.report(Seq(("hot", df, "k")))
      .as[(String, Long, Long, Long, Double, Long)].collect().head
    assert(got == (("hot", 10L, 1000L, 910L, 9.1, 10L)))
    val uni = (0 until 100).map(_.toLong).toDF("k")
    val g2 = Skew.report(Seq(("uni", uni, "k")))
      .as[(String, Long, Long, Long, Double, Long)].collect().head
    assert(g2 == (("uni", 100L, 100L, 1L, 1.0, 1L)))
  }

  test("join-cardinality histograms: sum(cA*cB) equals the executed join size") {
    val li = Tables.lineitem(spark, sf)
    val or = Tables.orders(spark, sf)
    val actual = li.join(or, li("l_orderkey") === or("o_orderkey")).count()
    val lh = li.groupBy(col("l_orderkey").as("k")).agg(count(lit(1)).as("c"))
    val oh = or.groupBy(col("o_orderkey").as("k")).agg(count(lit(1)).as("c2"))
    val est = lh.join(oh, "k").agg(sum(col("c") * col("c2")))
      .as[Long].collect().head
    assert(est == actual)
  }

  test("bigram surprisal: repetitive text scores fewer bits than rare continuations") {
    val docs = Seq(
      (1L, "the cat sat on the mat " * 20),          // high-count bigrams
      (2L, "zyx qwv plk mno abc def ghi jkl")        // all-singleton bigrams
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bigramSurprisalBits(docs, "doc_id", "text")
      .select("doc_id", "mean_bits").as[(Long, Double)].collect().toMap
    assert(got(1L) < got(2L))
    // add-one smoothing bound: bits ≤ log2(c_x + V) ≤ log2(total + V)
    val nTokens = docs.select(explode(split(trim(col("text")), "\\s+")))
      .count()
    val maxBits = TextAnalysis.bigramSurprisalBits(docs, "doc_id", "text")
      .select(max(col("bigram_bits") / col("n_bigrams"))).as[Double]
      .collect().head
    assert(maxBits <= math.log(nTokens.toDouble * 2) / math.log(2.0) + 1)
  }

  test("hllEstimateBy on pair-merged registers equals hllEstimate on the concatenated set") {
    val ev = Tables.events(spark, sf)
    val a = ev.where(col("event_type") === "click")
    val b = ev.where(col("event_type") === "view")
    val direct = Sketches.hllDistinct(
      a.unionByName(b).withColumn("g", lit("ab")), "g", "user_id")
      .select("hll_user_id").as[Double].collect().head
    val ra = Sketches.hllRegisters(a.withColumn("g", lit("ab")), "g", "user_id")
    val rb = Sketches.hllRegisters(b.withColumn("g", lit("ab")), "g", "user_id")
    val merged = Sketches.hllEstimateBy(
      Sketches.hllMergeRegisters(ra, rb), Seq("g"), "u")
      .select("hll_u").as[Double].collect().head
    assert(merged == direct) // bit-equal: max-merge of registers is exact
  }

  test("fused PoissonWeights equals the composable hash60 form, and E[w] ≈ 1") {
    val keys = Tables.lineitem(spark, sf)
      .select(concat(col("l_orderkey").cast("string"), lit("|"),
        col("l_linenumber").cast("string")).as("key"))
    val fused = keys.select(col("key"),
        posexplode(graft.functions.BootstrapExpr.poissonWeights(
          col("key"), 8, Bootstrap.Thresholds)).as(Seq("b", "w")))
    val composable = keys
      .withColumn("b", explode(sequence(lit(0), lit(7))))
      .withColumn("w2", Bootstrap.poissonWeight(Sketches.hash60(
        concat(col("key"), lit("|"), col("b").cast("string")))))
    val diff = fused.join(composable, Seq("key", "b"))
      .where(col("w") =!= col("w2")).count()
    assert(diff == 0L)
    // capped Poisson(1): mean weight within a few % of 1
    val meanW = fused.agg(avg("w")).as[Double].collect().head
    assert(meanW > 0.93 && meanW < 1.05, s"mean weight $meanW")
  }

  test("bootstrap CI brackets the point mean and shrinks with n") {
    val ci = Bootstrap.groupedMeanCI(
        Tables.lineitem(spark, "/root/testdata/sf0.01"), "l_returnflag",
        concat(col("l_orderkey").cast("string"), lit("|"),
          col("l_linenumber").cast("string")),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long"))
      .select("g", "n_rows", "mean_v", "ci_lo", "ci_hi")
      .as[(String, Long, Double, Double, Double)].collect()
    assert(ci.length == 3)
    ci.foreach { case (g, n, m, lo, hi) =>
      assert(lo < m && m < hi, s"$g: CI [$lo, $hi] must bracket mean $m")
      // CLT scale: half-width within ~5 se of se = sd/√n; sd(price) ≈ 30k
      val half = (hi - lo) / 2
      assert(half < 5 * 31000.0 / math.sqrt(n.toDouble), s"$g too wide: $half")
      assert(half > 31000.0 / math.sqrt(n.toDouble) / 5, s"$g too tight: $half")
    }
  }

  test("BootstrapSums aggregate equals the exploded PoissonWeights path") {
    val base = Tables.lineitem(spark, sf).select(
      col("l_returnflag").as("g"),
      concat(col("l_orderkey").cast("string"), lit("|"),
        col("l_linenumber").cast("string")).as("key"),
      (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
        .as("cents"))
    val viaAgg = Bootstrap.replicateSums(base, 16)
      .as[(String, Int, Long, Long)].collect().toSet
    val viaExplode = base
      .select(col("g"), col("cents"),
        posexplode(graft.functions.BootstrapExpr.poissonWeights(
          col("key"), 16, Bootstrap.Thresholds)).as(Seq("b", "w")))
      .where(col("w") > 0)
      .groupBy("g", "b")
      .agg(sum(col("w") * col("cents")).as("s"), sum(col("w")).as("n"))
      .as[(String, Int, Long, Long)].collect().toSet
    assert(viaAgg == viaExplode)
  }

  test("priority sample: 1000-row sample estimates group revenue within 15%") {
    val got = graft.SparkEntry.queries("q205_priority_sample")(
        spark, "/root/testdata/sf0.01")
      .select("l_returnflag", "rel_err").as[(String, Double)].collect()
    assert(got.length == 3)
    got.foreach { case (g, e) => assert(e < 0.15, s"$g rel_err $e") }
  }

  test("A/B bootstrap: the CI brackets the point difference") {
    val got = graft.SparkEntry.queries("q202_ab_bootstrap")(
        spark, "/root/testdata/sf0.01")
      .select("diff_mean", "ci_lo", "ci_hi")
      .as[(Double, Double, Double)].collect().head
    val (d, lo, hi) = got
    assert(lo < d && d < hi, s"CI [$lo, $hi] must bracket $d")
    assert(hi - lo < 10.0, s"CI too wide for n≈20k: [$lo, $hi]")
  }

  test("layout audit: user-clustered zone maps have zero false positives") {
    // 64 zone "files" under a user-clustered order: a user's rows are
    // contiguous, so every file whose [lo,hi] covers the user MUST
    // actually hold rows of that user (touched = ceil-spread of the
    // user's own rows over file boundaries, never a false zone hit) —
    // and in aggregate the user layout beats the ts layout.
    val e = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"))
    val cnt = e.count()
    def zones(ordered: org.apache.spark.sql.DataFrame) = ordered
      .select(col("user_id"), expr(s"((rn - 1) * 64) DIV $cnt").as("f"))
    val byUser = zones(Rank.globalRank(e, "rn",
      col("user_id"), col("ts"), col("event_id"))).cache()
    val zu = byUser.groupBy("f")
      .agg(min("user_id").as("lo"), max("user_id").as("hi"))
    val probes = e.select(col("user_id").as("u")).distinct()
    val touched = probes.join(broadcast(zu),
        col("u") >= col("lo") && col("u") <= col("hi"))
      .groupBy("u").agg(count(lit(1)).as("t"))
    // zero false positives: zone-map hits == files truly holding the user
    val actualFiles = byUser.groupBy(col("user_id").as("u"))
      .agg(countDistinct("f").as("af"))
    val fp = touched.join(actualFiles, "u")
      .where(col("t") =!= col("af")).count()
    assert(fp == 0L)
    // and the ts layout touches strictly more files in aggregate
    val zt = zones(Rank.globalRank(e, "rn", col("ts"), col("event_id")))
      .groupBy("f").agg(min("user_id").as("lo"), max("user_id").as("hi"))
    val tsTouched = probes.join(broadcast(zt),
        col("u") >= col("lo") && col("u") <= col("hi"))
      .agg(count(lit(1))).as[Long].collect().head
    val userTouched = touched.agg(sum("t")).as[Long].collect().head
    assert(userTouched < tsTouched)
  }
}
