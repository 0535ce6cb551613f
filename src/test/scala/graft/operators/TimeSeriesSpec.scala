package graft.operators

import graft.SparkTestSession
import java.sql.{Date, Timestamp}
import org.scalatest.funsuite.AnyFunSuite

class TimeSeriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def d(s: String) = Date.valueOf(s)

  private def fill(rows: Seq[(Long, Timestamp, Long, Double)]) =
    TimeSeries.gapFillForwardFill(
      rows.toDF("k", "ts", "id", "v"), "k", "ts", "id", "v")
      .as[(Long, Date, Double)].collect().toSet

  test("silent days forward-fill; spine spans first to last active day only") {
    val got = fill(Seq(
      (1L, ts("2024-03-01 10:00:00"), 1L, 10.0),
      (1L, ts("2024-03-01 18:00:00"), 2L, 11.0), // closing value of day 1
      (1L, ts("2024-03-04 09:00:00"), 3L, 40.0)))
    assert(got == Set(
      (1L, d("2024-03-01"), 11.0),
      (1L, d("2024-03-02"), 11.0), // filled
      (1L, d("2024-03-03"), 11.0), // filled
      (1L, d("2024-03-04"), 40.0)))
  }

  test("equal timestamps break ties by id; keys are independent") {
    val got = fill(Seq(
      (1L, ts("2024-03-01 10:00:00"), 5L, 1.0),
      (1L, ts("2024-03-01 10:00:00"), 6L, 2.0), // higher id wins the day
      (2L, ts("2024-03-02 00:00:00"), 7L, 7.0)))
    assert(got == Set(
      (1L, d("2024-03-01"), 2.0),
      (2L, d("2024-03-02"), 7.0)))
  }
}
