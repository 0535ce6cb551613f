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
}
