package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Spread.scaleOut]]'s guard contract: it fans out EXACTLY the
  * single-split scan-shaped corner and is the identity everywhere else
  * — the property that makes it safe to leave in the operators at
  * 100 TB (no exchange is ever added to a big or already-distributed
  * input). */
class SpreadSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = "/root/testdata/sf0.001"

  test("single-split scan-shaped input fans out to default parallelism") {
    val df = spark.read.parquet(s"$docs/documents.parquet")
      .select("doc_id", "text")
    val out = Spread.scaleOut(df)
    assert(out.queryExecution.optimizedPlan.toString
      .contains("Repartition"), "expected a round-robin fan-out")
    assert(out.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    // values untouched
    assert(out.count() == df.count())
  }

  test("an input estimated past one scan split is returned untouched") {
    val key = "spark.sql.files.maxPartitionBytes"
    val old = spark.conf.get(key)
    spark.conf.set(key, "1024") // the 600 KB file now exceeds one split
    try {
      val df = spark.read.parquet(s"$docs/documents.parquet")
        .select("doc_id", "text")
      assert(Spread.scaleOut(df) eq df)
    } finally spark.conf.set(key, old)
  }

  test("joined / aggregated / cached inputs are returned untouched") {
    val df = spark.read.parquet(s"$docs/documents.parquet")
      .select("doc_id", "text")
    val joined = df.join(df.select(col("doc_id")), "doc_id")
    assert(Spread.scaleOut(joined) eq joined)
    val agged = df.groupBy("doc_id").agg(count(lit(1)).as("n"))
    assert(Spread.scaleOut(agged) eq agged)
    val cached = df.cache()
    try assert(Spread.scaleOut(cached) eq cached)
    finally cached.unpersist()
  }

  test("local small frames fan out too (scan-shaped, one split)") {
    val df = (1L to 100L).toDF("id").select(col("id"), lit("x").as("t"))
    val out = Spread.scaleOut(df)
    assert(out.count() == 100L)
  }
}
