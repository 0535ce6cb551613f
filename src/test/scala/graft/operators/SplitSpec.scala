package graft.operators

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SplitSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val cuts = Seq("train" -> 80, "val" -> 90, "test" -> 100)

  test("split is leakage-safe: every user lands in exactly one split") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("split", Split.splitLabel(col("user_id"), cuts))
    val multi = ev.groupBy("user_id")
      .agg(countDistinct(col("split")).as("n"))
      .where(col("n") > 1).count()
    assert(multi == 0)
  }

  test("split proportions track the cut points and are deterministic") {
    // synthetic keys so the proportion check has real statistics
    // (sf0.001 has only 15 distinct users — pure binomial noise)
    val keys = spark.range(10000).toDF("user_id")
    def dist() = keys
      .withColumn("split", Split.splitLabel(col("user_id"), cuts))
      .groupBy("split").count()
      .as[(String, Long)].collect().toMap
    val d1 = dist()
    assert(d1 == dist(), "assignment must be deterministic")
    val total = d1.values.sum.toDouble
    // 10k keys: 4 sigma on the 80% bucket = 1.6pp
    assert(math.abs(d1("train") / total - 0.80) < 0.02, d1.toString)
    assert(math.abs(d1("val") / total - 0.10) < 0.02, d1.toString)
    assert(math.abs(d1("test") / total - 0.10) < 0.02, d1.toString)
  }

  test("sampleKeep is deterministic, rate-tracking, and rerun-stable") {
    val keys = spark.range(20000).toDF("k")
    def kept(ppm: Int) = keys
      .where(Split.sampleKeep(col("k"), lit(ppm)))
      .as[Long].collect().toSet
    val k25 = kept(250000)
    assert(k25 == kept(250000), "same rate must select the same keys")
    // 20k keys at 25%: 4 sigma ≈ 1.2pp
    assert(math.abs(k25.size / 20000.0 - 0.25) < 0.02, k25.size.toString)
    // monotone in the rate: a kept row stays kept when the rate grows
    // (the property that makes hash sampling rerun/backfill-stable)
    assert(k25.subsetOf(kept(500000)))
  }

  test("sampleKeep supports per-stratum rates (stratified downsample)") {
    // 10k 'en' rows downsampled to ~20%, 1k 'de' rows kept at 100%
    val rows = spark.range(11000)
      .withColumn("lang", when(col("id") < 10000, "en").otherwise("de"))
    val rate = when(col("lang") === "en", 200000).otherwise(1000000)
    val got = rows.where(Split.sampleKeep(col("id"), rate))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(got("de") == 1000L, got.toString)
    assert(math.abs(got("en") / 10000.0 - 0.20) < 0.02, got.toString)
  }
}
