package graft.operators

import java.sql.Timestamp

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IntervalJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val hourUs = 3600L * 1000000L

  test("overlap, touch, disjoint, equal-start ties — canonical single emission") {
    val df = Seq(
      (10L, 1L, ts("2021-01-01 10:00:00"), ts("2021-01-01 12:00:00")),
      (10L, 2L, ts("2021-01-01 11:00:00"), ts("2021-01-01 13:00:00")), // overlaps 1
      (10L, 3L, ts("2021-01-01 13:00:00"), ts("2021-01-01 14:00:00")), // touches 2 (inclusive)
      (10L, 4L, ts("2021-01-01 15:00:00"), ts("2021-01-01 16:00:00")), // disjoint
      (10L, 5L, ts("2021-01-01 10:00:00"), ts("2021-01-01 10:30:00")), // equal start as 1; ends before 2 starts
      (20L, 6L, ts("2021-01-01 10:00:00"), ts("2021-01-01 12:00:00"))  // other key
    ).toDF("k", "id", "s", "e")
    val got = IntervalJoin.overlapsSelf(df, Seq("k"), Seq("id"),
        "s", "e", maxLenUs = 3 * hourUs)
      .select("k", "id_1", "id_2").as[(Long, Long, Long)].collect().toSet
    assert(got == Set((10L, 1L, 2L), (10L, 2L, 3L), (10L, 1L, 5L)))
  }

  test("bucketed ≡ naive blocked join on sf0.001 lineitem ship windows") {
    val iv = Tables.lineitem(spark, "/root/testdata/sf0.001").select(
      col("l_suppkey").as("k1"), col("l_partkey").as("k2"),
      col("l_orderkey").as("o"), col("l_linenumber").as("n"),
      col("l_shipdate").as("s"),
      expr("timestampadd(DAY, CAST(l_quantity AS INT), l_shipdate)").as("e"))
    def rows(df: DataFrame) = df.select("k1", "k2", "o_1", "n_1", "o_2", "n_2")
      .as[(Long, Long, Long, Int, Long, Int)].collect().toSet
    val bucketed = rows(IntervalJoin.overlapsSelf(iv, Seq("k1", "k2"),
      Seq("o", "n"), "s", "e", maxLenUs = 50L * 86400L * 1000000L))
    val a = iv.columns.foldLeft(iv)((d, c) => d.withColumnRenamed(c, s"${c}_1"))
    val b = iv.columns.foldLeft(iv)((d, c) => d.withColumnRenamed(c, s"${c}_2"))
    val naive = a.join(b,
        col("k1_1") === col("k1_2") && col("k2_1") === col("k2_2") &&
          (col("s_1") < col("s_2") ||
            (col("s_1") === col("s_2") &&
              struct(col("o_1"), col("n_1")) < struct(col("o_2"), col("n_2")))) &&
          col("s_1") <= col("e_2") && col("s_2") <= col("e_1"))
      .select(col("k1_1").as("k1"), col("k2_1").as("k2"),
        col("o_1"), col("n_1"), col("o_2"), col("n_2"))
    assert(bucketed.nonEmpty && bucketed == rows(naive))
  }

  test("overlapsSelfNaive is row-identical to the bucketed form") {
    val iv = Tables.lineitem(spark, "/root/testdata/sf0.001").select(
      col("l_suppkey").as("k1"), col("l_partkey").as("k2"),
      col("l_orderkey").as("o"), col("l_linenumber").as("n"),
      col("l_shipdate").as("s"),
      expr("timestampadd(DAY, CAST(l_quantity AS INT), l_shipdate)").as("e"))
    val maxLen = 50L * 86400L * 1000000L
    def rows(df: DataFrame) = df.select("k1", "k2", "o_1", "n_1", "o_2", "n_2")
      .as[(Long, Long, Long, Int, Long, Int)].collect().toSet
    val naive = rows(IntervalJoin.overlapsSelfNaive(
      iv, Seq("k1", "k2"), Seq("o", "n"), "s", "e", maxLen))
    assert(naive.nonEmpty && naive == rows(IntervalJoin.overlapsSelf(
      iv, Seq("k1", "k2"), Seq("o", "n"), "s", "e", maxLen)))
  }

  test("overlapsSelfAuto picks naive on selective keys, bucketed on a hot key") {
    def isBucketed(df: DataFrame): Boolean =
      df.queryExecution.analyzed.toString.contains("__bucket")
    // selective: every (k, id) its own key → naive
    val selective = (1 to 2000)
      .map(i => (i.toLong, i.toLong,
        ts("2021-01-01 10:00:00"), ts("2021-01-01 11:00:00")))
      .toDF("k", "id", "s", "e")
    val autoSel = IntervalJoin.overlapsSelfAuto(selective, Seq("k"), Seq("id"),
      "s", "e", maxLenUs = 2 * hourUs, hotKeyRows = 100, sampleFraction = 0.5)
    assert(!isBucketed(autoSel))
    // hot: one key owns every row → bucketed
    val hot = (1 to 2000)
      .map(i => (7L, i.toLong,
        ts("2021-01-01 10:00:00"), ts("2021-01-01 11:00:00")))
      .toDF("k", "id", "s", "e")
    val autoHot = IntervalJoin.overlapsSelfAuto(hot, Seq("k"), Seq("id"),
      "s", "e", maxLenUs = 2 * hourUs, hotKeyRows = 100, sampleFraction = 0.5)
    assert(isBucketed(autoHot))
    // and the hot-path result matches the explicit bucketed form
    assert(autoHot.count() == IntervalJoin.overlapsSelf(hot, Seq("k"), Seq("id"),
      "s", "e", 2 * hourUs).count())
  }

  test("an interval longer than the enforced bound fails loudly") {
    val df = Seq(
      (1L, 1L, ts("2021-01-01 00:00:00"), ts("2021-01-03 00:00:00"))
    ).toDF("k", "id", "s", "e")
    val ex = intercept[Exception] {
      IntervalJoin.overlapsSelf(df, Seq("k"), Seq("id"), "s", "e",
        maxLenUs = 24 * hourUs).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: messages(e.getCause))
    assert(messages(ex).exists(m => m != null && m.contains("maxLenUs")))
  }
}
