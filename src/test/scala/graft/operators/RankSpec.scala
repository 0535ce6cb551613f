package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RankSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("globalRank equals the single-window row_number, any partitioning") {
    val df = (1L to 1000L).map(i => (i, s"k${(i * 37) % 1000}%03d"))
      .toDF("id", "key").repartition(11)
    val got = Rank.globalRank(df, "rank", col("key"), col("id"))
      .select("id", "rank").as[(Long, Long)].collect().toMap
    val want = df.orderBy("key", "id").select("id").as[Long].collect()
      .zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
    assert(got == want)
  }

  test("globalRank on an empty frame is empty, not an error") {
    val df = spark.emptyDataFrame.select(lit(1L).as("id")).where(lit(false))
    assert(Rank.globalRank(df, "rank", col("id")).count() == 0)
  }

  test("globalRank is dense 1..n and deterministic across runs") {
    val df = (1L to 257L).toDF("id")
    def run() = Rank.globalRank(df, "rank",
        md5(col("id").cast("string")), col("id"))
      .select("id", "rank").as[(Long, Long)].collect().toSet
    val a = run()
    assert(a.map(_._2) == (1L to 257L).toSet)
    assert(a == run())
  }

  test("globalPrefixSum equals the single-window running sum, any partitioning") {
    val df = (1L to 300L).map(i => (i, i % 7 + 1)).toDF("id", "w")
      .repartition(13)
    val got = Rank.globalPrefixSum(df, "cum", "w", col("id"))
      .select("id", "cum").as[(Long, Long)].collect().toMap
    // oracle: driver-side scan in id order
    var acc = 0L
    val want = (1L to 300L).map { i => acc += i % 7 + 1; i -> acc }.toMap
    assert(got == want)
  }

  test("globalPrefixSum on an empty frame is empty, not an error") {
    val df = spark.emptyDataset[(Long, Long)].toDF("id", "w")
    assert(Rank.globalPrefixSum(df, "cum", "w", col("id")).count() == 0)
  }

  test("globalOrderStats fuses several sums + the rank, equal to chaining") {
    val df = (1L to 500L).map(i => (i, i % 7 + 1, i % 3)).toDF("id", "a", "b")
      .repartition(9)
    val got = Rank.globalOrderStats(df,
        Seq("ca" -> "a", "cb" -> "b"), Some("rk"), col("id"))
      .select("id", "ca", "cb", "rk")
      .as[(Long, Long, Long, Long)].collect()
      .map { case (i, x, y, r) => i -> (x, y, r) }.toMap
    var (sa, sb) = (0L, 0L)
    val want = (1L to 500L).map { i =>
      sa += i % 7 + 1; sb += i % 3; i -> (sa, sb, i)
    }.toMap
    assert(got == want)
  }

  test("keyedPrefixSums equals the per-key running sums, any partitioning") {
    val df = (1L to 900L)
      .map(i => (s"k${i % 4}", i, i % 5 + 1, i % 2))
      .toDF("key", "id", "a", "b").repartition(7)
    val got = Rank.keyedPrefixSums(df,
        Seq("ca" -> "a", "cb" -> "b"), Seq("key"), col("id"))
      .select("key", "id", "ca", "cb")
      .as[(String, Long, Long, Long)].collect()
      .map { case (k, i, x, y) => (k, i) -> (x, y) }.toMap
    val want = (0 until 4).flatMap { k =>
      var (sa, sb) = (0L, 0L)
      (1L to 900L).filter(_ % 4 == k).sorted.map { i =>
        sa += i % 5 + 1; sb += i % 2; (s"k$k", i) -> (sa, sb)
      }
    }.toMap
    assert(got == want)
  }

  test("keyedPrefixSums spreads a hot key across range partitions") {
    // one dominant key: the range exchange must not serialize it into
    // a single task the way PARTITION BY key does
    val df = (1L to 2000L).map(i => ("hot", i, 1L)).toDF("key", "id", "a")
    val out = Rank.keyedPrefixSums(df, Seq("ca" -> "a"), Seq("key"), col("id"))
    val got = out.select("id", "ca").as[(Long, Long)].collect().toMap
    assert(got == (1L to 2000L).map(i => i -> i).toMap)
    // structural: the exchange is a RANGE partitioning on (key, order) —
    // the shape that lets one hot key span many partitions — not a hash
    // clustering on the key alone (Window.partitionBy(key) would put the
    // whole key through one task). Partition COUNTS are not asserted:
    // AQE rightly coalesces a 2000-row exchange to one partition.
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning(key"),
      s"expected a range exchange on (key, order) in:\n$plan")
  }
}
