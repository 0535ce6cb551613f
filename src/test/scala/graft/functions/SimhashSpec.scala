package graft.functions

import graft.{SparkTestSession, Tables}
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bit-parity of the fused single-pass [[SimhashText]] expression
  * (what [[Dedup.simhash]] runs) against the independently-derived
  * explode → distinct → weight-sum aggregation form
  * ([[Dedup.simhashAgg]]): same tokenizer (trim/lower/\s+ split), same
  * md5-prefix token hash, same ±1 weight rule, same no-token row-drop
  * semantics. */
class SimhashSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def bySig(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap

  test("fused expression ≡ aggregation form on the sf0.001 corpus (16 and 60 bits)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    for (bits <- Seq(16, 60)) {
      val fused = bySig(Dedup.simhash(docs, "doc_id", "text", bits))
      val agg = bySig(Dedup.simhashAgg(docs, "doc_id", "text", bits))
      assert(fused == agg, s"signature mismatch at bits=$bits")
      assert(fused.nonEmpty)
    }
  }

  test("edge cases: empty, whitespace-only, dup tokens, case/trim, unicode, null") {
    val df = Seq(
      (1L, Some("")),                      // no tokens -> no row
      (2L, Some("  \t\n  ")),              // whitespace-only -> no row
      (3L, Some("a a a b")),               // in-row duplicate tokens
      (4L, Some("  A   b ")),              // trim + lower + multi-space
      (5L, Some("a b")),                   // must equal 4's signature
      (6L, Some("héllo wörld ünïcode")),   // multi-byte UTF-8
      (7L, None: Option[String])           // null text -> no row
    ).toDF("doc_id", "text")
    for (bits <- Seq(16, 32, 60)) {
      val fused = bySig(Dedup.simhash(df, "doc_id", "text", bits))
      val agg = bySig(Dedup.simhashAgg(df, "doc_id", "text", bits))
      assert(fused == agg, s"edge-case mismatch at bits=$bits")
      assert(!fused.contains(1L) && !fused.contains(2L) && !fused.contains(7L))
      assert(fused(4L) == fused(5L), "trim/lower/dedup must normalize 4 to 5")
    }
  }

  test("simhash_text is SQL-registered via GraftExtensions") {
    val one = spark.sql(
      "SELECT simhash_text('alpha beta', 16) AS s").collect().head.getLong(0)
    val viaApi = bySig(Dedup.simhash(
      Seq((1L, "alpha beta")).toDF("doc_id", "text"), "doc_id", "text", 16))(1L)
    assert(one == viaApi)
  }
}
