package graft.operators

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("salted aggregation equals plain aggregation") {
    val e = Tables.events(spark, "/root/testdata/sf0.001")
      .select("user_id", "event_id")
    val plain = e.groupBy("user_id")
      .agg(sum("event_id").as("s"), count(lit(1)).as("c"))
      .as[(Long, Long, Long)].collect().toSet
    val salted = Skew.saltedSumCount(e, "user_id", "event_id", salt = 7)
      .as[(Long, Long, Long)].collect().toSet
    assert(salted == plain)
  }

  test("salted join equals plain inner join") {
    val e = Tables.events(spark, "/root/testdata/sf0.001")
      .select("user_id", "event_id")
    val dim = Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy("user_id").agg(count(lit(1)).as("n_user"))
    val plain = e.join(dim, Seq("user_id"))
      .select("event_id", "n_user").as[(Long, Long)].collect().toSet
    val salted = Skew.saltedJoin(e, dim, "user_id", salt = 5)
      .select("event_id", "n_user").as[(Long, Long)].collect().toSet
    assert(salted == plain)
  }
}
