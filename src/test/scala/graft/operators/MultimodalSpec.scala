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

  test("perceptualHash: strict-above-mean bits, re-encode variants land near") {
    // 4 bytes a,b,c,d → mean strictly exceeded only by c and d
    val m = media((0L, "aacc"))
    val h = Multimodal.perceptualHash(m, target = 4).collect()
    assert(h.length == 1 && h(0).k == 4)
    // bytes = a,a,c,c; tot = 2a+2c; a*4 < tot, c*4 > tot → bits 2,3
    assert(h(0).ahash == ((1L << 2) | (1L << 3)))

    // a one-byte "re-encode" of a long payload flips at most a few bits
    val text = ("the quick brown fox jumps over the lazy dog " * 6).trim
    val docs = Seq((0L, text)).toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'s' AS source", "'en' AS lang",
        "length(text) AS n_chars")
    val corpus = Multimodal.corpusFromDocuments(docs)
      .unionByName(Multimodal.reencodeVariants(docs))
    val sigs = Multimodal.perceptualHash(corpus, target = 60)
      .collect().map(p => p.media_id -> p.ahash).toMap
    assert(sigs.keySet == Set(0L, 3000000L))
    val dist = java.lang.Long.bitCount(sigs(0L) ^ sigs(3000000L))
    assert(dist <= 3, s"re-encode variant drifted $dist bits")
  }

  test("vadSegments: islands split exactly at below-threshold frames") {
    // audio payload (doc_id % 3 == 1): craft frames of known energies.
    // 'z'=122 (hot), ' '=32 (cold); 16-byte frames.
    val hot = "z" * 16   // energy 1952
    val cold = " " * 16  // energy 512
    val m = media((1L, hot + hot + cold + hot + "tail")) // tail dropped
    val frames = Multimodal.frameEnergies(m, frameLen = 16)
    assert(frames.collect().map(f => f.frame_idx -> f.energy).toMap ==
      Map(0 -> 1952L, 1 -> 1952L, 2 -> 512L, 3 -> 1952L))
    val segs = Multimodal.vadSegments(frames, threshold = 1000L)
      .collect().map(r => (r.getAs[Int]("seg_start"), r.getAs[Int]("seg_end"),
        r.getAs[Int]("n_frames"), r.getAs[Long]("energy_sum"))).toSet
    assert(segs == Set((0, 1, 2, 3904L), (3, 3, 1, 1952L)))
    // threshold at/above every energy → no segments (strictly-above)
    assert(Multimodal.vadSegments(frames, threshold = 1952L).count() == 0)
  }

  test("vadSegmentsInRow ≡ relational gaps-and-islands twin on the corpus") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val m = Multimodal.corpusFromDocuments(docs)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("media_id", "seg_start", "seg_end", "n_frames", "energy_sum")
        .as[(Long, Int, Int, Int, Long)].collect().toSet
    val inRow = canon(Multimodal.vadSegmentsInRow(m, threshold = 1512L).toDF())
    val twin = canon(Multimodal.vadSegments(
      Multimodal.frameEnergies(m, 16), threshold = 1512L))
    assert(inRow == twin)
    assert(inRow.nonEmpty)
    // open-run tail: a payload ending mid-segment closes at the last frame
    val tail = Multimodal.vadSegmentsInRow(
      media((1L, "z" * 33)), threshold = 1000L).collect()
    assert(tail.toSeq == Seq(
      Multimodal.VadSegment(1L, 0, 1, 2, 2 * 16 * 122L)))
  }
}
