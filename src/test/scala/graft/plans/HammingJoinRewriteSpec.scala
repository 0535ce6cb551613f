package graft.plans

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The automatic pigeonhole-band rewrite must (1) fire on plain-SQL
  * Hamming joins and remove the cartesian, (2) never change results —
  * including multiplicity on duplicate inputs — and (3) respect its
  * guards. */
class HammingJoinRewriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def withRule[A](enabled: Boolean)(f: => A): A = {
    spark.conf.set(HammingJoinRewrite.ConfKey, enabled.toString)
    try f finally spark.conf.unset(HammingJoinRewrite.ConfKey)
  }

  private def optimized(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  private def multiset(df: DataFrame): Map[String, Int] =
    df.collect().map(_.toString).groupBy(identity).view.mapValues(_.length).toMap

  private def sigView(): Unit =
    graft.operators.Dedup.simhash(Tables.documents(spark, sf),
      "doc_id", "text", bits = 16)
      .createOrReplaceTempView("sig")

  test("SQL Hamming self-join: cartesian becomes a banded hash join, " +
    "results identical") {
    sigView()
    val sql =
      """SELECT a.doc_id AS id1, b.doc_id AS id2,
        |  bit_count(a.simhash ^ b.simhash) AS dist
        |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |WHERE bit_count(a.simhash ^ b.simhash) <= 3""".stripMargin
    val (onPlan, onRows) = withRule(true) {
      val df = spark.sql(sql); (optimized(df), multiset(df))
    }
    val (offPlan, offRows) = withRule(false) {
      val df = spark.sql(sql); (optimized(df), multiset(df))
    }
    assert(onPlan.contains(HammingJoinRewrite.BandName), s"no rewrite in:\n$onPlan")
    assert(!offPlan.contains(HammingJoinRewrite.BandName))
    assert(onRows.nonEmpty && onRows == offRows)
    // the rewritten join is an equi join: physical plan has no
    // cartesian/nested-loop node; the off plan does
    val onPhys = withRule(true)(spark.sql(sql)
      .queryExecution.executedPlan.toString)
    val offPhys = withRule(false)(spark.sql(sql)
      .queryExecution.executedPlan.toString)
    assert(!onPhys.contains("CartesianProduct") &&
      !onPhys.contains("BroadcastNestedLoop"), s"still quadratic:\n$onPhys")
    assert(offPhys.contains("CartesianProduct") ||
      offPhys.contains("BroadcastNestedLoop"))
  }

  test("multi-band collisions emit each pair exactly once (duplicate rows too)") {
    // identical signatures collide in EVERY band; duplicated input rows
    // must keep join multiplicity (2 copies × 1 partner = 2 rows)
    val df = Seq((1L, 0xF0F0L), (2L, 0xF0F0L), (2L, 0xF0F0L), (3L, 0xF0F1L),
      (4L, 0x0F0FL)).toDF("id", "s")
    df.createOrReplaceTempView("hv")
    val sql =
      """SELECT a.id AS id1, b.id AS id2
        |FROM hv a JOIN hv b ON a.id < b.id
        |WHERE bit_count(a.s ^ b.s) <= 2""".stripMargin
    val on = withRule(true)(multiset(spark.sql(sql)))
    val off = withRule(false)(multiset(spark.sql(sql)))
    assert(on == off)
    assert(on("[1,2]") == 2, s"duplicate-row multiplicity lost: $on")
    assert(on.contains("[1,3]") && !on.keys.exists(_.contains("4")))
  }

  test("strict < and reversed >= spellings rewrite; k > 8 and " +
    "distance-only projections stay untouched") {
    sigView()
    for (pred <- Seq("bit_count(a.simhash ^ b.simhash) < 4",
        "3 >= bit_count(a.simhash ^ b.simhash)")) {
      val sql = s"""SELECT a.doc_id AS id1, b.doc_id AS id2
                   |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
                   |WHERE $pred""".stripMargin
      val (p, on) = withRule(true) {
        val d = spark.sql(sql); (optimized(d), multiset(d))
      }
      assert(p.contains(HammingJoinRewrite.BandName), s"$pred did not rewrite")
      assert(on == withRule(false)(multiset(spark.sql(sql))))
    }
    // k beyond MaxDist: guard leaves the plan alone
    val big = spark.sql(
      """SELECT a.doc_id FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |WHERE bit_count(a.simhash ^ b.simhash) <= 12""".stripMargin)
    assert(!optimized(big).contains(HammingJoinRewrite.BandName))
  }

  test("DataFrame spelling (simhashPairs shape) also rewrites") {
    val sig = graft.operators.Dedup.simhash(
      Tables.documents(spark, sf), "doc_id", "text", bits = 16)
    val a = sig.select(col("doc_id").as("id1"), col("simhash").as("s1"))
    val b = sig.select(col("doc_id").as("id2"), col("simhash").as("s2"))
    import org.apache.spark.sql.functions.bit_count
    val q = a.crossJoin(b).where(col("id1") < col("id2"))
      .where(bit_count(col("s1").bitwiseXOR(col("s2"))) <= 3)
      .select("id1", "id2")
    val on = withRule(true)(optimized(q))
    assert(on.contains(HammingJoinRewrite.BandName), s"no rewrite in:\n$on")
    val got = withRule(true)(multiset(q))
    val want = withRule(false)(multiset(q))
    assert(got == want && got.nonEmpty)
  }
}
