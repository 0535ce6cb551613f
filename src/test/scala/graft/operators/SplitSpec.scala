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

  test("packChunks: hand-computed packing, partition isolation, full coverage") {
    val docs = Seq(
      // lang a, budget 10: docs of 4,4,4 tokens -> cum-before 0,4,8 ->
      // seqs 0,0,0? no: floor(0/10)=0, floor(4/10)=0, floor(8/10)=0;
      // then 5 tokens at cum-before 12 -> seq 1
      ("a", 1L, "w w w w"), ("a", 2L, "w w w w"), ("a", 3L, "w w w w"),
      ("a", 4L, "w w w w w"),
      ("b", 5L, "w w w w w w w w w w w w"), // 12 > budget alone: seq 0
      ("b", 6L, "w")                        // cum-before 12 -> seq 1
    ).toDF("lang", "doc_id", "text")
    val got = Split.packChunks(docs, "lang", "doc_id",
      expr("size(filter(split(trim(lower(text)), '\\\\s+'), x -> x != ''))"),
      budget = 10)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("a", 0L, 3L, 12L, 1L), ("a", 1L, 1L, 5L, 4L),
      ("b", 0L, 1L, 12L, 5L), ("b", 1L, 1L, 1L, 6L)))
    // every doc lands in exactly one pack: doc counts sum to the corpus
    assert(got.toSeq.map(_._3).sum == 6L)
  }

  test("slidingChunks: window/stride arithmetic, coverage, edge cases") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"), // 10 tokens
      (2L, "a b c"),               // shorter than window: one chunk
      (3L, "a b c d"),             // exactly window: one chunk
      (4L, "   "),                 // whitespace-only: no chunks
      (5L, "a b c d e")            // n = window + 1: two chunks
    ).toDF("doc_id", "text")
    val got = Split.slidingChunks(docs, "doc_id", "text", window = 4, stride = 3)
      .as[(Long, Int, Int, String)].collect().toSet
    assert(got == Set(
      // doc 1: 1+ceil((10-4)/3) = 3 chunks at token starts 0, 3, 6
      (1L, 0, 4, "a b c d"), (1L, 1, 4, "d e f g"), (1L, 2, 4, "g h i j"),
      (2L, 0, 3, "a b c"),
      (3L, 0, 4, "a b c d"),
      // doc 5: 1+ceil((5-4)/3) = 2 chunks; the tail chunk is short
      (5L, 0, 4, "a b c d"), (5L, 1, 2, "d e")))
    // every token of doc 1 is covered by some chunk
    val covered = got.filter(_._1 == 1L).flatMap(_._4.split(" ")).toSet
    assert(covered == Set("a", "b", "c", "d", "e", "f", "g", "h", "i", "j"))
  }

  test("temporalColdStart: users without pre-cutoff history are cold") {
    val ev = Seq(
      (1L, "buy", "2024-01-10"), (1L, "buy", "2024-01-25"),  // warm
      (2L, "buy", "2024-01-26"),                             // cold
      (3L, "view", "2024-01-05"),                            // train-only
      (4L, "view", "2024-01-28"), (4L, "view", "2024-01-29") // cold, 2 ev
    ).toDF("user_id", "event_type", "d")
      .select(col("user_id"), col("event_type"), col("d").cast("timestamp").as("ts"))
    val got = Split.temporalColdStart(ev, "user_id", "event_type", "ts",
        lit("2024-01-24").cast("timestamp"))
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("buy") == (("buy", 2L, 2L, 1L, 0.5)))
    assert(got("view") == (("view", 2L, 1L, 1L, 1.0)))
  }

  test("rebalanceReport: consistent hashing moves ~1/n2, mod moves ~1-1/n2") {
    val keys = (1L to 2000L).toDF("id")
    val got = Split.rebalanceReport(keys, "id", n1 = 8, n2 = 9, vnodes = 64)
      .as[(Long, Long, Long, Double, Double)].collect().head
    assert(got._1 == 2000L)
    // mod-N: expect ~8/9 = 0.889 moved; allow wide slack, require > 0.8
    assert(got._4 > 0.8, s"mod ratio ${got._4}")
    // ring: expect ~1/9 = 0.111; require well under the mod cost
    assert(got._5 < 0.25, s"ring ratio ${got._5}")
    assert(got._5 * 3 < got._4, "consistent hashing must beat mod-N clearly")
    // the ring is sorted and covers all shards
    val ring = Split.consistentRing(8, 64)
    assert(ring.map(_._1).toSeq == ring.map(_._1).sorted.toSeq)
    assert(ring.map(_._2).toSet == (0 until 8).toSet)
  }
}
