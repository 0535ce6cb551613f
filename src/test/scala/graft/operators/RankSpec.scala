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
}
