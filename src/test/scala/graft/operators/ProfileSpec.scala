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

  test("checkSuite: violation counts, pass flags and tolerance budgets") {
    import Profile.MetricCheck
    import org.apache.spark.sql.functions._
    val df = Seq(
      (Some(1L), "a", 10.0), (Some(2L), "b", -1.0),
      (Some(2L), "c", 5.0), (None, "a", 3.0)
    ).toDF("k", "tag", "v")
    val got = Profile.checkSuite(df, Seq(
      MetricCheck("k.complete", count(lit(1)) - count(col("k"))),
      MetricCheck("k.unique", count(col("k")) - count_distinct(col("k"))),
      MetricCheck("v.positive", sum(when(col("v") <= 0, 1L).otherwise(0L))),
      MetricCheck("v.positive.tolerant",
        sum(when(col("v") <= 0, 1L).otherwise(0L)), maxAllowed = 1L),
      MetricCheck("tag.domain",
        sum(when(!col("tag").isin("a", "b", "c"), 1L).otherwise(0L)))))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("k.complete") == ((1L, 0L)))
    assert(got("k.unique") == ((1L, 0L)))
    assert(got("v.positive") == ((1L, 0L)))
    assert(got("v.positive.tolerant") == ((1L, 1L))) // same metric, budgeted
    assert(got("tag.domain") == ((0L, 1L)))
  }

  test("referentialCheck: orphan count ignores null child keys") {
    import org.apache.spark.sql.functions._
    val child = Seq(Some(1L), Some(2L), Some(9L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val row = Profile.referentialCheck("fk.in.parent", child, "fk",
      parent, "pk").as[(String, Long, Long)].head()
    assert(row == (("fk.in.parent", 1L, 0L)))
  }

  test("checkSuite over an all-clean table passes every check") {
    import Profile.MetricCheck
    import org.apache.spark.sql.functions._
    val df = Seq((1L, 5.0), (2L, 7.0)).toDF("k", "v")
    val got = Profile.checkSuite(df, Seq(
      MetricCheck("k.unique", count(col("k")) - count_distinct(col("k"))),
      MetricCheck("v.positive", sum(when(col("v") <= 0, 1L).otherwise(0L)))))
      .as[(String, Long, Long)].collect()
    assert(got.forall(_._3 == 1L))
    assert(got.forall(_._2 == 0L))
  }

  test("cohensKappa: perfect, chance-level, and degenerate agreement") {
    def kappa(rows: Seq[(String, String)]) =
      Profile.cohensKappa(rows.toDF("a", "b"), "a", "b")
        .as[(Long, Long, Double, Double, Option[Double])].collect().head

    // perfect agreement → κ = 1
    val perfect = kappa(Seq("x" -> "x", "y" -> "y", "x" -> "x"))
    assert(perfect._5.contains(1.0) && perfect._3 == 1.0)

    // textbook example: 2×2 with po=0.6, pe=0.5 → κ=0.2
    // A: 5×x 5×y; B: 5×x 5×y; agree on 3 x's and 3 y's
    val rows = Seq.fill(3)("x" -> "x") ++ Seq.fill(2)("x" -> "y") ++
      Seq.fill(2)("y" -> "x") ++ Seq.fill(3)("y" -> "y")
    val mid = kappa(rows)
    assert(mid == ((10L, 6L, 0.6, 0.5, Some(0.2))))

    // both raters constant and identical → pe = 1, κ undefined (null)
    val degen = kappa(Seq("x" -> "x", "x" -> "x"))
    assert(degen._5.isEmpty && degen._3 == 1.0 && degen._4 == 1.0)

    // disjoint label spaces: zero agreement, zero expected → κ = 0
    val disj = kappa(Seq("x" -> "u", "y" -> "v"))
    assert(disj._2 == 0L && disj._5.contains(0.0))
  }
}
