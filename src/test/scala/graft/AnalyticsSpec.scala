package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("sketch aggregates land within tolerance of exact results") {
    val li = Tables.lineitem(spark, sf)
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("n"),
        expr("percentile(l_extendedprice, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val approx = queries.AnalyticsQueries.q46.fn(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    for ((flag, (n, p50)) <- exact) {
      val (an, ap50) = approx(flag)
      assert(math.abs(an - n).toDouble / n < 0.05, s"$flag HLL: $an vs $n")
      assert(math.abs(ap50 - p50) / p50 < 0.05, s"$flag q-sketch: $ap50 vs $p50")
    }
  }
}
