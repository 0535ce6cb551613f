package graft.operators

import java.sql.Timestamp

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of picks latest right at-or-before left, inclusive ties") {
    val left = Seq(
      (1L, 10L, ts("2021-01-01 10:00:00")),
      (2L, 10L, ts("2021-01-01 12:00:00")),
      (3L, 10L, ts("2021-01-01 09:00:00")), // before any right -> null
      (4L, 20L, ts("2021-01-01 10:30:00"))
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts("2021-01-01 10:00:00")), // tie with event 1 (inclusive)
      (101L, 10L, ts("2021-01-01 11:00:00")),
      (200L, 20L, ts("2021-01-01 10:30:00"))
    ).toDF("purchase_id", "user_id", "ts")
      .select("user_id", "ts", "purchase_id")

    val got = AsOfJoin(left, right, "user_id", "ts", "ts", Seq("purchase_id"))
      .select("event_id", "asof_purchase_id").as[(Long, Option[Long])]
      .collect().toMap
    assert(got(1L).contains(100L)) // equal timestamp matches
    assert(got(2L).contains(101L)) // latest before
    assert(got(3L).isEmpty)        // nothing before
    assert(got(4L).contains(200L))
  }

  test("two right rows at the same instant resolve deterministically") {
    val left = Seq((1L, 10L, ts("2021-01-01 12:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (7L, 10L, ts("2021-01-01 11:00:00")),
      (9L, 10L, ts("2021-01-01 11:00:00"))
    ).toDF("purchase_id", "user_id", "ts").select("user_id", "ts", "purchase_id")
    val got = AsOfJoin(left, right, "user_id", "ts", "ts", Seq("purchase_id"))
      .select("asof_purchase_id").as[Long].head()
    assert(got == 9L) // payload tiebreak: highest sorts last -> wins
  }

  test("a most-recent right row with a NULL payload value wins") {
    val left = Seq((1L, 10L, ts("2021-01-01 12:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (Some(7L), 10L, ts("2021-01-01 10:00:00")),
      (None: Option[Long], 10L, ts("2021-01-01 11:00:00")) // newer, null payload
    ).toDF("purchase_id", "user_id", "ts").select("user_id", "ts", "purchase_id")
    val got = AsOfJoin(left, right, "user_id", "ts", "ts", Seq("purchase_id"))
      .select("asof_purchase_id").as[Option[Long]].head()
    assert(got.isEmpty, "stale non-null payload must not shadow the newest right row")
  }
}
