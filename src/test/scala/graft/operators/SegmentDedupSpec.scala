package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Dedup.stripBoilerplateSegments]] — segment-level boilerplate
  * removal (the line-dedup pass of web curation). */
class SegmentDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 3-token segments keep the fixtures readable
  private def run(docs: Seq[(Long, String)], maxDf: Int) =
    Dedup.stripBoilerplateSegments(docs.toDF("id", "text"),
        "id", "text", segTokens = 3, maxDf = maxDf)
      .as[(Long, String, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap

  test("strips a shared header segment, keeps each doc's unique tail") {
    val header = "terms of service"
    val docs = Seq(
      1L -> s"$header alpha beta gamma",
      2L -> s"$header delta eps zeta",
      3L -> s"$header eta theta iota",
      4L -> "kappa lambda mu nu xi omicron")
    val got = run(docs, maxDf = 2) // header is in 3 docs > 2
    assert(got(1L) == ((1L, "alpha beta gamma", 2L, 1L, 1L)))
    assert(got(2L) == ((2L, "delta eps zeta", 2L, 1L, 1L)))
    assert(got(3L) == ((3L, "eta theta iota", 2L, 1L, 1L)))
    assert(got(4L) == ((4L, "kappa lambda mu nu xi omicron", 2L, 2L, 0L)))
  }

  test("df counts DISTINCT documents, not occurrences") {
    // the repeated segment sits twice in ONE doc: df = 1, never hot
    val docs = Seq(
      1L -> "spam spam ham spam spam ham",
      2L -> "one two three four five six")
    val got = run(docs, maxDf = 1)
    assert(got(1L)._5 == 0L) // nothing removed
    assert(got(1L)._2 == "spam spam ham spam spam ham")
  }

  test("a fully-boilerplate document survives as an empty row") {
    val docs = Seq(
      1L -> "all rights reserved",
      2L -> "all rights reserved",
      3L -> "all rights reserved",
      4L -> "unique words here")
    val got = run(docs, maxDf = 2)
    assert(got(1L) == ((1L, "", 1L, 0L, 1L)))
    assert(got(4L) == ((4L, "unique words here", 1L, 1L, 0L)))
  }

  test("empty and whitespace-only docs yield zero segments, not errors") {
    val got = run(Seq(1L -> "", 2L -> "   ", 3L -> "real content text"), 1)
    assert(got(1L) == ((1L, "", 0L, 0L, 0L)))
    assert(got(2L) == ((2L, "", 0L, 0L, 0L)))
    assert(got(3L) == ((3L, "real content text", 1L, 1L, 0L)))
  }

  test("maxDf above corpus size reduces to whitespace normalization") {
    val docs = Seq(
      1L -> "  a  b\tc   d e  ",
      2L -> "f g")
    val got = run(docs, maxDf = 100)
    assert(got(1L)._2 == "a b c d e")
    assert(got(2L)._2 == "f g")
    assert(got(1L)._5 == 0L && got(2L)._5 == 0L)
  }

  test("ragged tail segments participate like any other segment") {
    // 4 tokens -> segments [a b c], [d]; the 1-token tail "d" shared by
    // 3 docs is boilerplate at maxDf=2
    val docs = Seq(
      1L -> "a1 b1 c1 d",
      2L -> "a2 b2 c2 d",
      3L -> "a3 b3 c3 d")
    val got = run(docs, maxDf = 2)
    assert(got(1L) == ((1L, "a1 b1 c1", 2L, 1L, 1L)))
  }

  test("invariants on the real corpus: every doc returned once, " +
       "counts add up, order preserved") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Dedup.stripBoilerplateSegments(docs, "doc_id", "text", 10, 2)
      .cache()
    assert(out.count() == docs.count())
    assert(out.where(col("n_kept") + col("n_removed") =!= col("n_segments"))
      .count() == 0)
    // clean_text of an untouched doc == single-space join of its tokens
    val untouched = out.where(col("n_removed") === 0)
      .join(docs, "doc_id")
      .where(col("clean_text") =!=
        array_join(filter(split(trim(col("text")), "\\s+"),
          t => length(t) > 0), " "))
    assert(untouched.count() == 0)
    out.unpersist()
  }
}
