package graft.functions

import graft.{SparkTestSession, Tables}
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Signature-parity of the fused single-pass [[MinHashSig]] expression
  * (what [[Dedup.minhashSignature]] runs) against the independently-
  * derived inverted-index formulation ([[Dedup.minhashSignatureAgg]]):
  * same distinct-shingle scan, same md5-halves double-hash family,
  * same per-hash minima. */
class MinHashSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sigs(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
    df.collect().map(r => r.getAs[Long]("doc_id") ->
      (1 until r.length).map(r.getLong)).toMap

  test("fused expression ≡ inverted-index form on the sf0.001 corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    for ((k, nh) <- Seq((8, 12), (5, 14))) {
      val fused = sigs(Dedup.minhashSignature(docs, "doc_id", "text", k, nh))
      val agg = sigs(Dedup.minhashSignatureAgg(docs, "doc_id", "text", k, nh))
      assert(fused == agg, s"signature mismatch at k=$k numHashes=$nh")
      assert(fused.nonEmpty)
    }
  }

  test("edge cases: empty text, text shorter than k, repeated shingles") {
    val df = Seq(
      (1L, ""),                         // one "" shingle, like ShingleArray
      (2L, "abc"),                      // shorter than k -> whole text
      (3L, "aaaaaaaaaaaa"),             // one distinct shingle
      (4L, "the quick brown fox"),
      (5L, "the quick brown fox")       // identical -> identical signature
    ).toDF("doc_id", "text")
    val fused = sigs(Dedup.minhashSignature(df, "doc_id", "text", 8, 12))
    val agg = sigs(Dedup.minhashSignatureAgg(df, "doc_id", "text", 8, 12))
    assert(fused == agg)
    assert(fused(4L) == fused(5L))
    assert(fused.keySet == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("minhash_sig is SQL-registered and bounds numHashes") {
    val viaSql = spark.sql(
      "SELECT minhash_sig('hello world', 8, 12) AS s")
      .as[Seq[Long]].head()
    val viaApi = sigs(Dedup.minhashSignature(
      Seq((1L, "hello world")).toDF("doc_id", "text"), "doc_id", "text", 8, 12))(1L)
    assert(viaSql == viaApi)
    val err = intercept[Exception] {
      TextExpressions.minhashSig(lit("x"), 8, 15)
    }
    assert(err.getMessage.contains("numHashes"))
  }
}
