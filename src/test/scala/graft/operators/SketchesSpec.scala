package graft.operators

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("deterministic HLL estimates distinct counts within HLL error bounds") {
    val li = Tables.lineitem(spark, sf)
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("n"))
      .as[(String, Long)].collect().toMap
    val est = Sketches.hllDistinct(li, "l_returnflag", "l_orderkey")
      .as[(String, Double)].collect().toMap
    assert(est.keySet == exact.keySet)
    for ((k, e) <- est) {
      val rel = math.abs(e - exact(k)) / exact(k)
      // m=256 -> theoretical std error 1.04/sqrt(256) = 6.5%; allow 3 sigma
      assert(rel <= 0.20, s"$k: est $e vs exact ${exact(k)} (rel $rel)")
    }
  }

  test("HLL registers merge associatively: any partition split estimates " +
       "exactly the direct sketch") {
    val li = Tables.lineitem(spark, sf)
    val direct = Sketches.hllDistinct(li, "l_returnflag", "l_orderkey")
      .as[(String, Double)].collect().toMap
    for (parts <- Seq(2, 3, 7)) {
      val regs = (0 until parts).map(p => Sketches.hllRegisters(
        li.where(pmod(col("l_orderkey"), lit(parts)) === p),
        "l_returnflag", "l_orderkey"))
      val merged = Sketches.hllEstimate(
          Sketches.hllMergeRegisters(regs: _*), "l_returnflag", "m")
        .as[(String, Double)].collect().toMap
      assert(merged == direct, s"split into $parts parts diverged")
    }
  }

  test("CMS counters merge additively: any split sums to the direct table") {
    val toks = Tables.lineitem(spark, sf)
      .select(col("l_shipdate").cast("string").as("item"))
    val direct = Sketches.cmsCounters(toks, "item")
      .as[(Long, Long, Long)].collect().toSet
    for (parts <- Seq(2, 5)) {
      val tables = (0 until parts).map(p => Sketches.cmsCounters(
        Tables.lineitem(spark, sf)
          .where(pmod(col("l_orderkey"), lit(parts)) === p)
          .select(col("l_shipdate").cast("string").as("item")), "item"))
      val merged = Sketches.cmsMergeCounters(tables: _*)
        .as[(Long, Long, Long)].collect().toSet
      assert(merged == direct, s"split into $parts parts diverged")
    }
  }

  test("cmsEstimate: an item absent from the corpus estimates 0, not " +
      "a dropped row (absent counters read as 0)") {
    val toks = Tables.lineitem(spark, sf)
      .select(col("l_shipdate").cast("string").as("item"))
    val counters = Sketches.cmsCounters(toks, "item")
    val items = Seq("9999-12-31", "not-a-date-at-all").toDF("item")
    val got = Sketches.cmsEstimate(counters, items, "item")
      .as[(String, Long)].collect().toMap
    assert(got.keySet == Set("9999-12-31", "not-a-date-at-all"),
      "absent items must still appear in the output")
    // width 1024 vs ~2.5k distinct dates: collisions possible but a
    // min over 4 independent rows of a sparse table is overwhelmingly
    // 0; assert the semantic bound (never negative, present in output)
    assert(got.values.forall(_ >= 0L))
  }

  test("cmsEstimate: corpus-present items estimate >= true count " +
      "(one-sided CMS error)") {
    val toks = Tables.lineitem(spark, sf)
      .select(col("l_shipdate").cast("string").as("item"))
    val counters = Sketches.cmsCounters(toks, "item")
    val truth = toks.groupBy("item").count()
      .as[(String, Long)].collect().toMap
    val items = truth.keys.take(50).toSeq.toDF("item")
    val got = Sketches.cmsEstimate(counters, items, "item")
      .as[(String, Long)].collect().toMap
    got.foreach { case (k, est) =>
      assert(est >= truth(k), s"CMS underestimated $k: $est < ${truth(k)}")
    }
  }

  test("bottom-k sample is deterministic and uniform enough for quantiles") {
    val li = Tables.lineitem(spark, sf)
    // the (orderkey, linenumber) key is NOT unique in the testdata
    // (1161 duplicate keys with differing prices at sf0.001), so the
    // q51-style tie-break is load-bearing here too: without it, which
    // rows of a hash-tie group land inside the k-cut depends on
    // partition order
    val tb = Seq(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    def sample() = Sketches.bottomKSample(li, "l_returnflag",
      concat(col("l_orderkey").cast("string"), lit("|"),
        col("l_linenumber").cast("string")), k = 200, tieBreak = tb)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"))
      .as[(String, Long, Long)].collect().toSet
    val s1 = sample(); val s2 = sample()
    assert(s1 == s2, "same corpus must give the same sample")
    // sample quantile tracks the exact quantile on a unimodal column
    val exactP50 = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("p"))
      .as[(String, Double)].collect().toMap
    val sampleP50 = Sketches.bottomKSample(li, "l_returnflag",
      concat(col("l_orderkey").cast("string"), lit("|"),
        col("l_linenumber").cast("string")), k = 200, tieBreak = tb)
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("p"))
      .as[(String, Double)].collect().toMap
    for ((k, p) <- sampleP50) {
      val rel = math.abs(p - exactP50(k)) / exactP50(k)
      assert(rel <= 0.25, s"$k: sample p50 $p vs exact ${exactP50(k)}")
    }
  }

  test("bottomKValues (bounded aggregate) selects the window form's value multiset") {
    val li = Tables.lineitem(spark, sf)
    val key = concat(col("l_orderkey").cast("string"), lit("|"),
      col("l_linenumber").cast("string"))
    def multiset(df: org.apache.spark.sql.DataFrame, valCol: String) = df
      .groupBy("l_returnflag")
      .agg(sort_array(collect_list(col(valCol))).as("vs"))
      .as[(String, Seq[Double])].collect().toMap
    val window = multiset(
      Sketches.bottomKSample(li, "l_returnflag", key, k = 200,
        tieBreak = Seq(col("l_extendedprice")))
        .select(col("l_returnflag"), col("l_extendedprice")),
      "l_extendedprice")
    val bounded = multiset(
      Sketches.bottomKValues(li, "l_returnflag", key,
        col("l_extendedprice"), k = 200), "value")
    assert(bounded == window,
      "aggregate and window forms must select identical value multisets")
    // and the aggregate's plan has no window sort: partial aggregation
    // appears on the map side instead
    val plan = Sketches.bottomKValues(li, "l_returnflag", key,
      col("l_extendedprice"), 200).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no window operator expected:\n$plan")
  }

  test("CMS heavy hitters: estimates dominate true counts, tight at this size") {
    val toks = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
      .where(length(col("token")) > 0)
    val got = Sketches.heavyHittersCms(toks, "token", depth = 4,
      width = 1024, topK = 10)
      .as[(String, Long, Long)].collect()
    assert(got.length == 10)
    val exact = toks.groupBy("token").count()
      .as[(String, Long)].collect().toMap
    for ((t, trueC, estC) <- got) {
      assert(trueC == exact(t), s"$t true count")
      assert(estC >= trueC, s"$t: CMS estimate $estC below true $trueC")
      // vocabulary << depth*width here, so collisions should be rare
      assert(estC <= trueC * 2, s"$t: estimate $estC implausibly loose")
    }
    // the reported items are exactly the true top-10 (count desc, token asc)
    val want = exact.toSeq.sortBy { case (t, c) => (-c, t) }.take(10)
      .map(_._1).toSet
    assert(got.map(_._1).toSet == want)
  }
}
