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

  test("spreadIdenticalRows distributes exact-duplicate rows over salts") {
    // one hot key, every row identical — the content-hash salt sends all
    // copies to one bucket; the spread variant must use several
    val dup = Seq.fill(1000)((0L, 1L)).toDF("user_id", "event_id")
    val spread = dup.withColumn("__salt",
        pmod(xxhash64(col("user_id"), col("event_id"),
          monotonically_increasing_id()), lit(8L)))
      .select("__salt").distinct().count()
    assert(spread > 1)
    // and the aggregate stays correct under spreading
    val got = Skew.saltedSumCount(dup, "user_id", "event_id", salt = 8,
        spreadIdenticalRows = true)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((0L, 1000L, 1000L)))
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
