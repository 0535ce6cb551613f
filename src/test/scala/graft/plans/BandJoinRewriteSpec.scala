package graft.plans

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** The automatic Δ-bucket rewrite must (1) fire on plain-SQL band
  * joins, (2) never change results — asserted by running every shape
  * with the rule on and off — and (3) leave guarded plans alone. */
class BandJoinRewriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def withRule[A](enabled: Boolean)(f: => A): A = {
    spark.conf.set(BandJoinRewrite.ConfKey, enabled.toString)
    try f finally spark.conf.unset(BandJoinRewrite.ConfKey)
  }

  private def optimized(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  private def eventsView(): Unit =
    Tables.events(spark, sf).createOrReplaceTempView("ev")

  test("SQL interval band self-join: rewrite fires and results are identical") {
    eventsView()
    val sql =
      """SELECT a.event_id AS id1, b.event_id AS id2
        |FROM ev a JOIN ev b
        |  ON a.user_id = b.user_id
        |  AND b.ts > a.ts
        |  AND b.ts < a.ts + INTERVAL 1 HOUR""".stripMargin
    val (onPlan, onRows) = withRule(true) {
      val df = spark.sql(sql); (optimized(df), rows(df))
    }
    val (offPlan, offRows) = withRule(false) {
      val df = spark.sql(sql); (optimized(df), rows(df))
    }
    assert(onPlan.contains(BandJoinRewrite.BucketName), s"no rewrite in:\n$onPlan")
    assert(!offPlan.contains(BandJoinRewrite.BucketName))
    assert(onRows.nonEmpty && onRows == offRows)
  }

  test("long-domain band with subtract form, no equi key at all") {
    val df = Seq.tabulate(300)(i => (i.toLong, (i.toLong * 37) % 1000))
      .toDF("id", "v")
    df.createOrReplaceTempView("lv")
    val sql =
      """SELECT a.id AS id1, b.id AS id2
        |FROM lv a JOIN lv b
        |  ON b.v >= a.v AND b.v - a.v <= 25 AND a.id <> b.id""".stripMargin
    val (onPlan, onRows) = withRule(true) {
      val d = spark.sql(sql); (optimized(d), rows(d))
    }
    val offRows = withRule(false)(rows(spark.sql(sql)))
    assert(onPlan.contains(BandJoinRewrite.BucketName))
    assert(onRows.nonEmpty && onRows == offRows)
  }

  test("negative long domain: truncating-div adjacency stays exact") {
    val df = Seq.tabulate(400)(i => (i.toLong, i.toLong * 13 - 2600))
      .toDF("id", "v") // v spans [-2600, 2587]
    df.createOrReplaceTempView("nv")
    val sql =
      """SELECT a.id AS id1, b.id AS id2
        |FROM nv a JOIN nv b
        |  ON b.v > a.v AND b.v < a.v + 40""".stripMargin
    val onRows = withRule(true)(rows(spark.sql(sql)))
    val offRows = withRule(false)(rows(spark.sql(sql)))
    assert(withRule(true)(optimized(spark.sql(sql)))
      .contains(BandJoinRewrite.BucketName))
    assert(onRows.nonEmpty && onRows == offRows)
  }

  test("manually bucketed plans and bound-incomplete joins are left alone") {
    eventsView()
    // upper bound only — no lower bound pins the band, must not fire
    val upperOnly =
      """SELECT a.event_id FROM ev a JOIN ev b
        |  ON a.user_id = b.user_id AND b.ts < a.ts + INTERVAL 1 HOUR""".stripMargin
    assert(!withRule(true)(optimized(spark.sql(upperOnly)))
      .contains(BandJoinRewrite.BucketName))
    // the manual operator's __bucket equi key is the guard
    val manual = graft.operators.BandJoin.pairsWithin(
      Tables.events(spark, sf), "user_id", "ts",
      deltaUs = 3600L * 1000000, payload = Seq("event_id"))
    val occurrences = BandJoinRewrite.BucketName.r
      .findAllIn(withRule(true)(optimized(manual))).size
    assert(occurrences == 0)
  }

  test("manual BandJoin operator ≡ SQL-with-rule on the events table") {
    eventsView()
    val sql =
      """SELECT a.event_id AS event_id_1, b.event_id AS event_id_2
        |FROM ev a JOIN ev b
        |  ON a.user_id = b.user_id
        |  AND b.ts > a.ts AND b.ts < a.ts + INTERVAL 1 HOUR""".stripMargin
    val viaRule = withRule(true)(rows(spark.sql(sql)))
    val manual = graft.operators.BandJoin.pairsWithin(
        Tables.events(spark, sf), "user_id", "ts",
        deltaUs = 3600L * 1000000, payload = Seq("event_id"))
      .select("event_id_1", "event_id_2")
    assert(viaRule == rows(manual) && viaRule.nonEmpty)
  }
}
