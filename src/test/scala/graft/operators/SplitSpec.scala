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
}
