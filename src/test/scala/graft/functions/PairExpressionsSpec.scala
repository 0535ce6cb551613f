package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PairExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def composable = {
    val c = col("ids")
    flatten(transform(c, (x, i) =>
      transform(slice(c, i + lit(2), size(c)),
        y => struct(x.as("id1"), y.as("id2")))))
  }

  test("sorted_long_contains: binary search equals array_contains on random sets") {
    val rnd = new scala.util.Random(7)
    val hay = Array.fill(257)(rnd.nextLong()).distinct.sorted
    val needles = (hay.take(40) ++ Array.fill(200)(rnd.nextLong())).toSeq
    val df = needles.toDF("n").withColumn("hay", lit(hay))
    val got = df.select(col("n"),
        PairExpressions.sortedLongContains(col("hay"), col("n")).as("c"))
      .as[(Long, Boolean)].collect().toMap
    val want = hay.toSet
    assert(needles.forall(n => got(n) == want.contains(n)))
    // empty haystack contains nothing; works inside a filter lambda
    val empty = Seq(5L).toDF("n")
      .select(PairExpressions.sortedLongContains(
        lit(Array.empty[Long]), col("n")).as("c"))
      .as[Boolean].head()
    assert(!empty)
    val inLambda = Seq((Seq(1L, 2L, 3L))).toDF("xs")
      .select(filter(col("xs"), x => PairExpressions.sortedLongContains(
        lit(Array(2L)), x)).as("hit"))
      .as[Seq[Long]].head()
    assert(inLambda == Seq(2L))
  }

  test("pair_array equals the composable transform/slice chain, in order") {
    val df = Seq(
      Seq(1L, 2L, 3L, 4L),
      Seq(7L),
      Seq.empty[Long],
      (1L to 60L).toSeq // a maxDf-sized bucket
    ).toDF("ids")
    val fused = df.select(PairExpressions.pairArray(col("ids")).as("p"))
      .as[Seq[(Long, Long)]].collect().toSeq
    val comp = df.select(composable.as("p"))
      .as[Seq[(Long, Long)]].collect().toSeq
    assert(fused == comp)
    assert(fused.head == Seq((1L, 2L), (1L, 3L), (1L, 4L),
      (2L, 3L), (2L, 4L), (3L, 4L)))
    assert(fused(1).isEmpty && fused(2).isEmpty)
    assert(fused(3).length == 60 * 59 / 2)
  }

  test("pair_array is SQL-registered and rejects non-long arrays") {
    val got = spark.sql(
      "SELECT pair_array(array(3L, 5L, 9L)) AS p")
      .as[Seq[(Long, Long)]].head()
    assert(got == Seq((3L, 5L), (3L, 9L), (5L, 9L)))
    val err = intercept[Exception] {
      spark.sql("SELECT pair_array(array('a', 'b'))").collect()
    }
    assert(err.getMessage.contains("pair_array") ||
      err.getMessage.toLowerCase.contains("data type mismatch"))
  }

  test("pair_array fails loudly (not NegativeArraySize) on an overflow-sized bucket") {
    // n*(n-1)/2 overflows Int at n >= 46341; the check runs before any
    // allocation so a direct compute() call is cheap
    val big = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array.fill[Any](66000)(0L))
    val err = intercept[IllegalArgumentException] {
      PairArray(org.apache.spark.sql.catalyst.expressions.Literal(1L)).compute(big)
    }
    assert(err.getMessage.contains("bucket too large"))
  }
}
