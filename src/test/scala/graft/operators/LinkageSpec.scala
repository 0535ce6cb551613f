package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LinkageSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def people(n: Int) =
    (1 to n).map(i => (i.toLong, (i * 37 % 100).toDouble, s"n${i % 5}"))
      .toDF("id", "score", "tag")

  /** Reference neighborhood via a plain single-partition window —
    * fine at toy size, the exact thing the operator must avoid at
    * scale. */
  private def reference(n: Int, w: Int): Set[(Long, Long, Long)] = {
    val rows = people(n).orderBy(col("score"), col("id"))
      .select("id").as[Long].collect()
    (for {
      i <- rows.indices
      j <- (i + 1) to math.min(i + w, rows.length - 1)
    } yield (rows(i), rows(j), (j - i).toLong)).toSet
  }

  test("candidates are exactly the rank-distance-<=w pairs in sort order") {
    val got = Linkage.sortedNeighborhood(people(200), 3,
      col("score"), col("id"))
      .select(col("a_id"), col("b_id"), col("rank_gap"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == reference(200, 3))
  }

  test("pair count is n*w - w*(w+1)/2 (every row meets its w successors)") {
    val n = 100; val w = 5
    val got = Linkage.sortedNeighborhood(people(n), w, col("score"), col("id"))
    assert(got.count() == n.toLong * w - w.toLong * (w + 1) / 2)
  }

  test("input partitioning does not change the candidate set") {
    val base = people(300)
    val got = Linkage.sortedNeighborhood(base.repartition(11), 4,
      col("score"), col("id"))
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet
    val want = reference(300, 4).map(t => (t._1, t._2))
    assert(got == want)
  }

  test("a-side is always the rank-lower row and carries all attrs") {
    val got = Linkage.sortedNeighborhood(people(50), 2, col("score"), col("id"))
    assert(got.columns.toSet ==
      Set("a_id", "a_score", "a_tag", "b_id", "b_score", "b_tag", "rank_gap"))
    // sort order is (score, id): a-side is never strictly greater
    assert(got.where(col("a_score") > col("b_score")).count() == 0L)
  }
}
