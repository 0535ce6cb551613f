package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def media(rows: (Long, String)*) =
    Multimodal.corpusFromDocuments(
      rows.toSeq.toDF("doc_id", "text")
        .selectExpr("doc_id", "text", "'src' AS source", "'en' AS lang",
          "length(text) AS n_chars"))

  test("resizeStub: bucket-average arithmetic, short payloads, empty payloads") {
    // doc_id % 3 == 0 → kind 'image'
    val m = media(
      (0L, "abcdefgh"),  // 8 bytes → target 4: buckets of 2
      (3L, "xy"),        // shorter than target: keeps length 2
      (6L, ""))          // empty: 0-byte output survives
    val out = Multimodal.resizeStub(m, target = 4)
      .collect().map(r => r.media_id -> r).toMap
    assert(out.keySet == Set(0L, 3L, 6L))
    // pairs (a,b)(c,d)(e,f)(g,h) → truncated means
    assert(out(0L).n_orig == 8 && out(0L).n_resized == 4)
    assert(out(0L).resized.toSeq == Seq(
      ('a' + 'b') / 2, ('c' + 'd') / 2, ('e' + 'f') / 2, ('g' + 'h') / 2)
      .map(_.toByte))
    assert(out(3L).n_resized == 2 &&
      out(3L).resized.toSeq == Seq('x'.toByte, 'y'.toByte))
    assert(out(6L).n_orig == 0 && out(6L).resized.isEmpty)
    // non-image kinds never resize
    val audio = media((1L, "some audio payload"))
    assert(Multimodal.resizeStub(audio, 4).count() == 0)
  }
}
