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

  test("forward picks earliest right at-or-after, inclusive ties") {
    val left = Seq(
      (1L, 10L, ts("2021-01-01 10:00:00")), // tie -> inclusive match
      (2L, 10L, ts("2021-01-01 10:30:00")),
      (3L, 10L, ts("2021-01-01 12:00:00")), // after all rights -> null
      (4L, 20L, ts("2021-01-01 10:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts("2021-01-01 10:00:00")),
      (101L, 10L, ts("2021-01-01 11:00:00")),
      (200L, 20L, ts("2021-01-01 10:30:00"))
    ).toDF("purchase_id", "user_id", "ts").select("user_id", "ts", "purchase_id")
    val got = AsOfJoin(left, right, "user_id", "ts", "ts", Seq("purchase_id"),
        direction = "forward")
      .select("event_id", "asof_purchase_id").as[(Long, Option[Long])]
      .collect().toMap
    assert(got(1L).contains(100L))
    assert(got(2L).contains(101L)) // earliest after
    assert(got(3L).isEmpty)
    assert(got(4L).contains(200L))
  }

  test("nearest picks the closer side, backward on distance ties") {
    val left = Seq(
      (1L, 10L, ts("2021-01-01 10:20:00")), // back 20m vs fwd 40m -> back
      (2L, 10L, ts("2021-01-01 10:40:00")), // back 40m vs fwd 20m -> fwd
      (3L, 10L, ts("2021-01-01 10:30:00"))  // 30m both sides -> back
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts("2021-01-01 10:00:00")),
      (101L, 10L, ts("2021-01-01 11:00:00"))
    ).toDF("purchase_id", "user_id", "ts").select("user_id", "ts", "purchase_id")
    val got = AsOfJoin(left, right, "user_id", "ts", "ts", Seq("purchase_id"),
        direction = "nearest")
      .select("event_id", "asof_purchase_id").as[(Long, Option[Long])]
      .collect().toMap
    assert(got(1L).contains(100L))
    assert(got(2L).contains(101L))
    assert(got(3L).contains(100L))
  }

  test("tolerance nulls matches beyond the bound, per direction") {
    val left = Seq(
      (1L, 10L, ts("2021-01-01 10:10:00")), // back 10m: within 15m
      (2L, 10L, ts("2021-01-01 10:30:00")), // back 30m, fwd 30m: both out
      (3L, 10L, ts("2021-01-01 10:50:00"))  // fwd 10m: within
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts("2021-01-01 10:00:00")),
      (101L, 10L, ts("2021-01-01 11:00:00"))
    ).toDF("purchase_id", "user_id", "ts").select("user_id", "ts", "purchase_id")
    val tol = Some(15L * 60 * 1000000)
    def run(dir: String) = AsOfJoin(left, right, "user_id", "ts", "ts",
        Seq("purchase_id"), direction = dir, toleranceUs = tol)
      .select("event_id", "asof_purchase_id").as[(Long, Option[Long])]
      .collect().toMap
    val nearest = run("nearest")
    assert(nearest(1L).contains(100L))
    assert(nearest(2L).isEmpty, "both sides beyond tolerance")
    assert(nearest(3L).contains(101L))
    val backward = run("backward")
    assert(backward(3L).isEmpty, "forward-only match invisible to backward")
    assert(backward(1L).contains(100L))
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
