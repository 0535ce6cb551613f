package graft.functions

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("dot_product is callable from SQL via session extensions") {
    val got = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head().getDouble(0)
    assert(got == 32.0)
  }

  test("dot_product participates in codegen over table data") {
    import spark.implicits._
    val df = Seq((Array(1.0, 0.0), Array(0.5, 0.5))).toDF("a", "b")
    df.createOrReplaceTempView("vecs")
    assert(spark.sql("SELECT dot_product(a, b) FROM vecs").head().getDouble(0) == 0.5)
  }

  test("every custom expression is callable from SQL") {
    import spark.implicits._
    Seq((1L, "the quick brown fox", Array.fill(64)(0.5)))
      .toDF("id", "text", "v").createOrReplaceTempView("t")
    val row = spark.sql(
      """SELECT size(lsh_buckets(v, 64, 5, 3))  AS n_buckets,
        |       size(lsh_probes(v, 64, 5, 3, 2)) AS n_probes,
        |       size(shingle_array(text, 8))     AS n_shingles,
        |       size(winnow_array(text, 5, 4))   AS n_fps
        |FROM t""".stripMargin).head()
    assert(row.getInt(0) == 3)
    assert(row.getInt(1) == 9) // 3 tables x (1 base + 2 flips)
    assert(row.getInt(2) == "the quick brown fox".length - 7)
    assert(row.getInt(3) >= 1)
    val agg = spark.sql(
      """SELECT topk_by_score(s, i, 2) FROM VALUES (1.0d, 10L), (3.0d, 11L),
        |(2.0d, 12L) AS v(s, i)""".stripMargin).head().getSeq[Any](0)
    assert(agg.size == 2)
  }

  test("bootstrap functions are callable from SQL") {
    val w = spark.sql("SELECT poisson_weights('k1', 8) AS w")
      .head().getSeq[Int](0)
    assert(w.size == 8 && w.forall(x => x >= 0 && x <= 4))
    val bs = spark.sql(
      """SELECT bootstrap_sums(k, c, 4) FROM VALUES ('a', 10L), ('b', 20L),
        |('c', 30L) AS v(k, c)""".stripMargin).head().getSeq[Any](0)
    assert(bs.size == 4)
  }
}
