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

  test("WAV codec round-trip: samples, rate, and container survive") {
    val samples = Array[Short](0, 1, -1, 32512, -32768, 12345, -12345)
    val bytes = Multimodal.encodeWavPcm16(samples, sampleRateHz = 16000)
    // a real RIFF/WAVE container, not a byte dump
    assert(new String(bytes.take(4), "US-ASCII") == "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") == "WAVE")
    val w = Multimodal.decodeWavPcm16(bytes)
    assert(w.sampleRateHz == 16000 && w.bits == 16 && w.channels == 1)
    assert(w.samples.toSeq == samples.toSeq)
    // empty payload is still a valid (0-sample) container
    val empty = Multimodal.decodeWavPcm16(
      Multimodal.encodeWavPcm16(Array.empty[Short], 8000))
    assert(empty.samples.isEmpty && empty.sampleRateHz == 8000)
  }

  test("PNG codec round-trip: pixels, padding, and dimensions survive") {
    val bytes = (0 until 130).map(i => ((i * 7) % 256).toByte).toArray
    val png = Multimodal.encodePngGray(bytes) // 64 wide → 3 rows, 62 pads
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P') // real PNG container
    val g = Multimodal.decodePngGray(png)
    assert(g.width == 64 && g.height == 3 && g.samples.length == 192)
    assert(g.samples.take(130).toSeq == bytes.map(_ & 0xff).toSeq)
    assert(g.samples.drop(130).forall(_ == 0)) // zero-padded tail row
    // short payload: width = length, one row, no pads
    val small = Multimodal.decodePngGray(
      Multimodal.encodePngGray(Array[Byte](5, 250.toByte)))
    assert(small.width == 2 && small.height == 1 &&
      small.samples.toSeq == Seq(5, 250))
  }

  test("Y4M codec round-trip: luma frames, padding, fps, geometry survive") {
    val bytes = (0 until 130).map(i => ((i * 7) % 256).toByte).toArray
    val y4m = Multimodal.encodeY4m(bytes) // 16×4=64/frame → 3 frames, 62 pads
    // a real YUV4MPEG2 stream: plain-text header then FRAME markers
    assert(new String(y4m.take(9), "US-ASCII") == "YUV4MPEG2")
    val v = Multimodal.decodeY4m(y4m)
    assert(v.width == 16 && v.height == 4 && v.fps == 25 && v.nFrames == 3)
    assert(v.samples.length == 192)
    assert(v.samples.take(130).toSeq == bytes.toSeq)
    assert(v.samples.drop(130).forall(_ == 0)) // zero-padded tail frame
    // one-byte payload still yields one whole (padded) frame
    val one = Multimodal.decodeY4m(Multimodal.encodeY4m(Array[Byte](42)))
    assert(one.nFrames == 1 && one.samples.length == 64 &&
      one.samples(0) == 42 && one.samples.drop(1).forall(_ == 0))
    // non-mono colorspaces are rejected, not misread
    val c420 = "YUV4MPEG2 W2 H2 F25:1 C420jpeg\nFRAME\nxxxxxx".getBytes("US-ASCII")
    val ex = intercept[IllegalArgumentException](Multimodal.decodeY4m(c420))
    assert(ex.getMessage.contains("Cmono"))
  }

  test("codec round-trips hold on random payloads (property, fixed seeds)") {
    // raw ScalaCheck generators with fixed seeds — the scalatestplus
    // bridge is not in the offline cache (OperatorPropertySpec pattern)
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val params = Gen.Parameters.default
    val bytesGen = for {
      n <- Gen.choose(1, 700)
      bs <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield bs.toArray
    for (trial <- 0 until 12) {
      val payload = bytesGen.apply(params, Seed(4200L + trial)).get
      // Y4M: content prefix survives, pads zero, frame math exact
      val v = Multimodal.decodeY4m(Multimodal.encodeY4m(payload))
      assert(v.nFrames == (payload.length + 63) / 64)
      assert(v.samples.length == v.nFrames * 64)
      assert(v.samples.take(payload.length).toSeq == payload.toSeq)
      assert(v.samples.drop(payload.length).forall(_ == 0))
      // PNG: gray samples equal unsigned bytes, zero tail pads
      val g = Multimodal.decodePngGray(Multimodal.encodePngGray(payload))
      assert(g.samples.take(payload.length).toSeq ==
        payload.map(_ & 0xff).toSeq)
      assert(g.samples.drop(payload.length).forall(_ == 0))
      // WAV: the audio-arm sample mapping round-trips exactly
      val samples = payload.map(b => (((b & 0xff) - 128) * 256).toShort)
      val w = Multimodal.decodeWavPcm16(
        Multimodal.encodeWavPcm16(samples, 16000))
      assert(w.samples.toSeq == samples.toSeq && w.sampleRateHz == 16000)
    }
  }

  test("decode: real codec stats on WAV audio, PNG images and Y4M video") {
    // doc_id 1 → audio ('b'=98 → sample (98-128)*256 = -7680;
    //                   'P'=80 → -12288), peak over |sample|
    val docs = Seq((0L, "ab"), (1L, "bP"), (2L, "vid"), (3L, ""), (4L, ""),
      (5L, "")).toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'s' AS source", "'en' AS lang",
        "length(text) AS n_chars")
    val out = Multimodal.decode(Multimodal.corpusWithCodecs(docs))
      .collect().map(d => d.media_id -> d).toMap
    val audio = out(1L)
    assert(audio.format == "pcm_s16le" && audio.sample_rate_hz == 16000)
    assert(audio.n_units == 2 && audio.peak_abs == 12288L &&
      audio.sum_abs == 7680L + 12288L)
    val image = out(0L) // real PNG: pixel stats of "ab", 2×1, no pads
    assert(image.format == "png_gray8" && image.sample_rate_hz == 0)
    assert(image.n_units == 2 && image.peak_abs == 98L &&
      image.sum_abs == 97L + 98L)
    val video = out(2L) // real Y4M: "vid" → one 64-luma frame, 61 pads
    assert(video.format == "y4m_mono" && video.sample_rate_hz == 25)
    assert(video.n_units == 64 && video.peak_abs == 'v'.toLong &&
      video.sum_abs == 'v'.toLong + 'i'.toLong + 'd'.toLong)
    val emptyVideo = out(5L) // empty video cannot encode → stays raw
    assert(emptyVideo.format == "raw_stub" && emptyVideo.n_units == 0 &&
      emptyVideo.peak_abs == 0L && emptyVideo.sum_abs == 0L)
    val emptyImage = out(3L) // empty image cannot encode → stays raw
    assert(emptyImage.format == "raw_stub" && emptyImage.n_units == 0)
    // empty AUDIO is the asymmetric case: a 0-sample RIFF/WAVE is a
    // valid container, so it encodes and decodes as real PCM with 0
    // units — NOT the raw path (the q36 oracle encodes exactly this)
    val emptyAudio = out(4L)
    assert(emptyAudio.format == "pcm_s16le" &&
      emptyAudio.sample_rate_hz == 16000 && emptyAudio.n_units == 0 &&
      emptyAudio.peak_abs == 0L && emptyAudio.sum_abs == 0L)
  }

  test("y4mShotBoundaries: luma-sum cuts on decoded frames, in-row") {
    // doc_id % 3 == 2 → video. Frame = 64 luma bytes.
    // doc 2: 'z'*64 (sum 7808) then ' '*64 (sum 2048) then 'z'*64 —
    // two cuts of |Δ|=5760. doc 5: 70 chars → frame1 is 6 chars + 58
    // zero pads, a guaranteed tail-frame cut. doc 8: uniform 2 frames,
    // |Δ|=0 → no cut. audio/image docs contribute nothing.
    val docs = Seq(
      (2L, "z" * 64 + " " * 64 + "z" * 64),
      (5L, "a" * 70),
      (8L, "b" * 128),
      (1L, "z" * 200), (0L, "z" * 200)).toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'s' AS source", "'en' AS lang",
        "length(text) AS n_chars")
    val m = Multimodal.corpusWithCodecs(docs)
    val out = Multimodal.y4mShotBoundaries(m, deltaMin = 1500L)
      .collect().map(b => (b.media_id, b.frame_idx) -> b).toMap
    assert(out.keySet == Set((2L, 1), (2L, 2), (5L, 1)))
    assert(out((2L, 1)).prev_sum == 64L * 122 &&
      out((2L, 1)).luma_sum == 64L * 32 && out((2L, 1)).delta == 5760L)
    assert(out((2L, 2)).delta == 5760L)
    // tail frame: 6×'a' + 58 zero pads vs full 64×'a'
    assert(out((5L, 1)).prev_sum == 64L * 97 &&
      out((5L, 1)).luma_sum == 6L * 97)
  }

  test("decode: magic-matching but undecodable payloads degrade to raw stats") {
    // adversarial raw payloads whose ASCII text merely BEGINS like a
    // container — each must fall back to raw-byte stats, not crash the
    // partition (the failure mode ADVICE r10 flagged)
    val riffText = "RIFF....WAVEbut not actually a wav body"
    val y4mText = "YUV4MPEG2 W0 H0\ngarbage that is not frames"
    val pngish = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10, 1, 2)
    val m = Seq(
      (10L, riffText.getBytes("US-ASCII")),
      (11L, y4mText.getBytes("US-ASCII")),
      (12L, pngish)).toDF("media_id", "bytes")
      .selectExpr("media_id", "'video' AS kind", "bytes")
    val out = Multimodal.decode(m).collect().map(d => d.media_id -> d).toMap
    assert(out.values.forall(_.format == "raw_stub"))
    assert(out(10L).n_units == riffText.length)
    assert(out(11L).n_units == y4mText.length)
    assert(out(12L).n_units == pngish.length)
    // and a VALID container under a wrong kind label still decodes by
    // magic (decoders trust bytes, not labels)
    val wav = Multimodal.encodeWavPcm16(Array[Short](100, -100), 8000)
    val mislabeled = Seq((13L, wav)).toDF("media_id", "bytes")
      .selectExpr("media_id", "'video' AS kind", "bytes")
    val d = Multimodal.decode(mislabeled).collect().head
    assert(d.format == "pcm_s16le" && d.sample_rate_hz == 8000 &&
      d.n_units == 2 && d.peak_abs == 100L)
  }
}
