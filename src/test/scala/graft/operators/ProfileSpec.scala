package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class ProfileSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("columnProfile: counts, nulls, distincts and typed min/max channels") {
    val df = Seq(
      (1L, Some("a"), Some(2.5)),
      (2L, None, Some(-1.0)),
      (3L, Some("b"), None),
      (4L, Some("a"), Some(2.5))
    ).toDF("id", "s", "x")
    val got = Profile.columnProfile(df)
      .as[(String, Long, Long, Long, Option[Double], Option[Double],
           Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("id") == ("id", 4L, 0L, 4L, Some(1.0), Some(4.0), None, None))
    assert(got("s") == ("s", 4L, 1L, 2L, None, None, Some("a"), Some("b")))
    assert(got("x") == ("x", 4L, 1L, 2L, Some(-1.0), Some(2.5), None, None))
  }

  test("columnProfile: hostile column names (backticks, quotes) survive " +
      "the stack projection") {
    val df = Seq((1L, "x"), (2L, "y"))
      .toDF("a`b", "it's")
    val got = Profile.columnProfile(df)
      .select("col_name", "n_rows", "n_distinct")
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("a`b") == ("a`b", 2L, 2L))
    assert(got("it's") == ("it's", 2L, 2L))
  }

  test("fdViolations: reports only keys with more than one distinct rhs") {
    val df = Seq(
      ("t1", "paris"), ("t1", "paris"), ("t1", "lyon"),
      ("t2", "nice"), ("t2", "nice"),
      ("t3", "oslo")
    ).toDF("terminal", "city")
    val got = Profile.fdViolations(df, Seq("terminal"), "city")
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("t1", 2L, 3L)))
  }

  test("fdViolations: a dependency that holds yields an empty audit; " +
       "null rhs never counts") {
    val df = Seq(
      ("a", Some(1)), ("a", Some(1)), ("a", None),
      ("b", None)
    ).toDF("k", "v")
    assert(Profile.fdViolations(df, Seq("k"), "v").count() == 0)
  }

  test("fdViolations: composite lhs keys") {
    val df = Seq(
      ("x", 1, "u"), ("x", 1, "w"), ("x", 2, "u")
    ).toDF("k1", "k2", "v")
    val got = Profile.fdViolations(df, Seq("k1", "k2"), "v")
      .as[(String, Int, Long, Long)].collect().toSet
    assert(got == Set(("x", 1, 2L, 2L)))
  }

  test("columnProfile: timestamp goes through the exact epoch-us channel") {
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, java.sql.Timestamp.valueOf("2024-01-02 00:00:01"))
    ).toDF("id", "ts")
    val row = Profile.columnProfile(df)
      .where($"col_name" === "ts")
      .select("min_num", "max_num").as[(Double, Double)].head()
    assert(row._1 == 1704067200000000.0)
    assert(row._2 == 1704153601000000.0)
  }
}
