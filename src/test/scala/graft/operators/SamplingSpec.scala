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

  test("deterministic across runs and input partitionings") {
    val base = (1L to 500L).map(i => (i, (i * i) % 29 + 1))
    val a = Sampling.systematicSample(base.toDF("id", "w"), "id", "w", 25)
      .as[(Long, Long, Long)].collect().toSet
    val b = Sampling.systematicSample(
        base.reverse.toDF("id", "w").repartition(13), "id", "w", 25)
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b)
  }
}
