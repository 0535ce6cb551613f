package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bounded top-k aggregate must agree with the row_number window
  * formulation on every group — including ties and groups smaller
  * than k — across enough shuffle partitions to exercise partial
  * buffers and merge(). */
class TopKAggregateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("topkByScore ≡ row_number window (ties, small groups, merges)") {
    // deterministic pseudo-random data with duplicated scores (ties)
    val rows = (1 to 5000).map { i =>
      val g = i % 37
      val score = ((i * 2654435761L) % 97).toDouble / 7.0
      (g.toLong, score, i.toLong)
    }
    val df = rows.toDF("g", "score", "id").repartition(16)

    val viaAgg = df.groupBy(col("g").as("id_a"))
      .agg(TopKAggregate.topkByScore(col("score"), col("id"), 5).as("nn"))
      .select(col("id_a"), posexplode(col("nn")).as(Seq("i", "e")))
      .select(col("id_a"), col("e.id"), col("e.score"), (col("i") + 1).as("rnk"))
      .as[(Long, Long, Double, Long)].collect().toSet

    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    val viaWindow = df.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 5)
      .select(col("g"), col("id"), col("score"), col("rnk").cast("long"))
      .as[(Long, Long, Double, Long)].collect().toSet

    assert(viaAgg == viaWindow)
  }

  test("topkByScoreDistinct over a duplicated multiset ≡ topkByScore over distinct") {
    // every (g, id) appears 1–4 times, always with the SAME score (the
    // documented soundness precondition); the deduplicating aggregate
    // over the multiset must equal the plain aggregate over distinct rows
    val base = (1 to 2000).map { i =>
      val g = i % 23
      val score = ((i * 40503L) % 89).toDouble / 3.0
      (g.toLong, score, i.toLong)
    }
    val dup = base.flatMap(r => Seq.fill(1 + (r._3 % 4).toInt)(r))
    val dupDf = dup.toDF("g", "score", "id").repartition(16)
    val distinctDf = base.toDF("g", "score", "id").repartition(16)

    def run(df: org.apache.spark.sql.DataFrame, distinct: Boolean) =
      df.groupBy(col("g").as("id_a"))
        .agg((if (distinct) TopKAggregate.topkByScoreDistinct(col("score"), col("id"), 5)
              else TopKAggregate.topkByScore(col("score"), col("id"), 5)).as("nn"))
        .select(col("id_a"), posexplode(col("nn")).as(Seq("i", "e")))
        .select(col("id_a"), col("e.id"), col("e.score"), (col("i") + 1).as("rnk"))
        .as[(Long, Long, Double, Long)].collect().toSet

    assert(run(dupDf, distinct = true) == run(distinctDf, distinct = false))
  }

  test("groups smaller than k return all rows ranked") {
    val df = Seq((1L, 2.0, 10L), (1L, 1.0, 11L)).toDF("g", "score", "id")
    val got = df.groupBy(col("g"))
      .agg(TopKAggregate.topkByScore(col("score"), col("id"), 5).as("nn"))
      .select(size(col("nn"))).head().getInt(0)
    assert(got == 2)
  }
}
