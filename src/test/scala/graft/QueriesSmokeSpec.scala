package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every driver-contract query must execute at sf0.001; value-level
  * correctness is the DuckDB oracle's job (tools/check_oracle.py). */
class QueriesSmokeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes") {
      val n = fn(spark, sf).count()
      assert(n >= 0)
    }
  }
}
