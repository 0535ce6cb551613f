package graft.queries

import graft.Tables
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal queries. All three decode paths are REAL containers
  * (RIFF/WAVE and grayscale PNG via the JVM's own codecs, Y4M
  * monochrome via a zero-dependency parser — see
  * [[graft.operators.Multimodal.decode]]). All entries carry FULL
  * DuckDB oracles: payloads derive from document text, so
  * decode(encode(text)) stats replay as integer SQL over the text. */
object MultimodalQueries {

  /** Typed-metadata aggregate over the media corpus (oracle-checkable:
    * pure column logic, no stub involved). */
  val q35 = QueryDef.sql("q35_media_meta",
    """SELECT CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |            ELSE 'video' END AS kind,
      |  COUNT(*) AS n, CAST(SUM(length(text)) AS BIGINT) AS total_bytes
      |FROM documents GROUP BY 1""")(
    (s, dir) => Multimodal.corpusFromDocuments(Tables.documents(s, dir))
      .groupBy("kind")
      .agg(count(lit(1)).as("n"), sum(col("meta.n_bytes")).as("total_bytes")))

  /** Partition-wise media decode with REAL containers in ALL THREE
    * modalities: audio carries genuine RIFF/WAVE (JVM WAVE writer,
    * samples `(byte − 128)·256`), images carry genuine 8-bit grayscale
    * PNG (JVM `ImageIO` writer, pixel_i = byte_i, 64-wide rows with a
    * zero-padded tail), video carries Y4M monochrome (real YUV4MPEG2
    * stream layout, luma_i = byte_i in 16×4 frames with a zero-padded
    * tail frame). [[Multimodal.decode]] parses them back — dispatching
    * on container MAGIC, not the kind label, degrading to raw stats on
    * codec failure — and reports true decoded stats: rate from the WAV
    * header / fps from the Y4M header, `n_units` = samples/pixels/luma
    * samples, `peak_abs`/`sum_abs` over |sample| / gray / luma value.
    * Only EMPTY image/video payloads take the raw path (a 0-pixel PNG
    * or 0-frame Y4M is not encodable) — empty AUDIO is different: a
    * 0-sample RIFF/WAVE is a perfectly valid container, so it encodes,
    * decodes as pcm_s16le @ 16 kHz, and reports 0 units.
    *
    * FULL exact oracle: decode(encode(text)) is the identity on the
    * content values, so every output column is integer arithmetic over
    * the ASCII payload — samples are |byte−128|·256, pixels/luma are
    * the bytes plus zero pads to the 64-pixel row / 64-luma frame
    * boundary (pads shift n_units only; peak/sum are pad-invariant) —
    * and the oracle replays the round-trip without touching a codec,
    * which is precisely what makes a real-codec path hash-checkable
    * offline. */
  val q36 = QueryDef.sql("q36_media_decode",
    """WITH st AS (
      |  SELECT doc_id,
      |    max(CASE WHEN doc_id % 3 = 1
      |        THEN abs(ascii(substring(text, CAST(i AS INT), 1)) - 128) * 256
      |        ELSE ascii(substring(text, CAST(i AS INT), 1)) END) AS peak,
      |    sum(CASE WHEN doc_id % 3 = 1
      |        THEN abs(ascii(substring(text, CAST(i AS INT), 1)) - 128) * 256
      |        ELSE ascii(substring(text, CAST(i AS INT), 1)) END) AS sabs
      |  FROM (SELECT doc_id, text,
      |          unnest(range(1, length(text) + 1)) AS i FROM documents) t
      |  GROUP BY doc_id)
      |SELECT d.doc_id AS media_id,
      |  CASE (d.doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |       ELSE 'video' END AS kind,
      |  CASE WHEN d.doc_id % 3 = 1 THEN 'pcm_s16le'
      |       WHEN length(d.text) = 0 THEN 'raw_stub'
      |       WHEN d.doc_id % 3 = 0 THEN 'png_gray8'
      |       ELSE 'y4m_mono' END AS format,
      |  CASE WHEN d.doc_id % 3 = 1 THEN 16000
      |       WHEN length(d.text) = 0 THEN 0
      |       WHEN d.doc_id % 3 = 2 THEN 25
      |       ELSE 0 END AS sample_rate_hz,
      |  CAST(CASE WHEN d.doc_id % 3 = 0 AND length(d.text) > 64
      |       THEN 64 * CAST(ceil(length(d.text) / 64.0) AS BIGINT)
      |       WHEN d.doc_id % 3 = 2 AND length(d.text) > 0
      |       THEN 64 * CAST(ceil(length(d.text) / 64.0) AS BIGINT)
      |       ELSE length(d.text) END AS INT) AS n_units,
      |  CAST(COALESCE(st.peak, 0) AS BIGINT) AS peak_abs,
      |  CAST(COALESCE(st.sabs, 0) AS BIGINT) AS sum_abs
      |FROM documents d LEFT JOIN st ON d.doc_id = st.doc_id""")(
    (s, dir) => Multimodal.decode(
        Multimodal.corpusWithCodecs(Tables.documents(s, dir))).toDF())

  /** Frame sampling of video payloads. The stub "frames" are
    * deterministic substring arithmetic over ASCII payloads, so a full
    * DuckDB oracle is expressible (frames hex-encoded on both sides;
    * stride 4 → one 16-byte frame per 64 payload bytes, at least one). */
  val q37 = QueryDef.sql("q37_media_frames",
    """SELECT doc_id AS media_id, CAST(i AS INT) AS frame_idx,
      |  hex(CAST(substring(text, CAST(i*64+1 AS INT), 16) AS BLOB)) AS frame_hex
      |FROM (SELECT doc_id, text,
      |        unnest(range(greatest(CAST(floor(length(text)/64.0) AS BIGINT), 1))) AS i
      |      FROM documents WHERE doc_id % 3 = 2) t""")(
    (s, dir) => Multimodal.frameSample(
        Multimodal.corpusFromDocuments(Tables.documents(s, dir)), stride = 4)
      .select(col("media_id"), col("frame_idx"),
        hex(col("frame_bytes")).as("frame_hex")))

  /** Resize-stub over image payloads. FULL oracle: the bucket-average
    * downsample is integer-exact (byte i → bucket ⌊i·64/n⌋, truncated
    * mean per bucket), and payloads are ASCII, so DuckDB rebuilds the
    * resized byte string with chr()/string_agg and both sides compare
    * md5 hex. */
  val q73 = QueryDef.sql("q73_media_resize",
    """WITH m AS (SELECT doc_id AS media_id, text, length(text) AS n
      |  FROM documents WHERE doc_id % 3 = 0 AND length(text) > 0),
      |b AS (SELECT media_id, n, (i * 64) // n AS bucket,
      |    ascii(substring(text, CAST(i + 1 AS INT), 1)) AS v
      |  FROM (SELECT media_id, text, n, unnest(range(n)) AS i FROM m) t),
      |r AS (SELECT media_id, n, bucket, SUM(v) // COUNT(*) AS byte
      |      FROM b GROUP BY 1, 2, 3),
      |s AS (SELECT media_id, CAST(n AS INT) AS n_orig,
      |        string_agg(chr(CAST(byte AS INT)), '' ORDER BY bucket) AS resized
      |      FROM r GROUP BY 1, 2)
      |SELECT media_id, n_orig,
      |  CAST(length(resized) AS INT) AS n_resized,
      |  md5(resized) AS resized_md5
      |FROM s""")(
    (s, dir) => Multimodal.resizeStub(
        Multimodal.corpusFromDocuments(Tables.documents(s, dir)), target = 64)
      .toDF()
      .where(col("n_orig") > 0) // oracle builds strings; empties stay operator-side
      .select(col("media_id"), col("n_orig"), col("n_resized"),
        md5(col("resized")).as("resized_md5")))

  /** Perceptual near-dup over image payloads: 60-bit average-hash of
    * the 60-byte thumbnail (bit j = byte j strictly above the
    * thumbnail mean, integer-compared), pairs at Hamming ≤ 3 via the
    * SimHash pigeonhole banding — the multimodal twin of q50. The
    * corpus is originals plus deterministic one-byte "re-encode"
    * variants (id + 3000000), which land at distance 0–3 of their
    * source; organically distinct images sit ≥ 9 bits apart, so the
    * band join's candidate volume stays near the true-pair count.
    * FULL oracle: resize replay is q73's CTE, the hash is
    * shift-and-sum over integer comparisons, and the oracle pairs via
    * the exact quadratic join the banding provably equals. */
  val q169 = QueryDef.sql("q169_image_ahash_neardup",
    """WITH imgs AS (SELECT doc_id AS media_id, text FROM documents
      |    WHERE doc_id % 3 = 0 AND length(text) > 0),
      |corpus AS (
      |  SELECT media_id, text FROM imgs
      |  UNION ALL
      |  SELECT media_id + 3000000, '~' || substring(text, 2) FROM imgs),
      |m AS (SELECT media_id, text, length(text) AS n FROM corpus),
      |b AS (SELECT media_id, n, (i * 60) // n AS bucket,
      |    ascii(substring(text, CAST(i + 1 AS INT), 1)) AS v
      |  FROM (SELECT media_id, text, n, unnest(range(n)) AS i FROM m) t),
      |r AS (SELECT media_id, bucket, SUM(v) // COUNT(*) AS byte
      |      FROM b GROUP BY 1, 2),
      |agg AS (SELECT media_id, count(*) AS k, sum(byte) AS tot,
      |        list(byte ORDER BY bucket) AS bytes FROM r GROUP BY 1),
      |h AS (SELECT media_id,
      |  (SELECT coalesce(sum(CASE WHEN bytes[CAST(j + 1 AS INT)] * k > tot
      |            THEN (1::BIGINT << CAST(j AS INT)) ELSE 0 END), 0)
      |   FROM unnest(range(k)) AS t(j)) AS ahash
      |  FROM agg)
      |SELECT a.media_id AS id1, b.media_id AS id2,
      |  CAST(bit_count(xor(a.ahash, b.ahash)) AS INT) AS dist
      |FROM h a JOIN h b ON a.media_id < b.media_id
      |WHERE bit_count(xor(a.ahash, b.ahash)) <= 3""")(
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val media = Multimodal.corpusFromDocuments(docs)
        .unionByName(Multimodal.reencodeVariants(docs))
        .where(col("kind") === "image")
      val sig = Multimodal.perceptualHash(media, target = 60).toDF()
        .select(col("media_id"), col("ahash").as("simhash"))
      graft.operators.Dedup.simhashPairsBanded(sig, "media_id",
        maxDist = 3, bits = 60)
    })

  /** Voice-activity segments over audio payloads: 16-byte frame
    * energies (Σ unsigned bytes — integer-exact), then maximal runs of
    * frames strictly above the corpus-median energy, one row per
    * segment. The islands window is per-media (bounded by payload
    * length); FULL oracle via the same gaps-and-islands in SQL. */
  val q170 = QueryDef.sql("q170_audio_vad",
    """WITH a AS (SELECT doc_id AS media_id, text, length(text) // 16 AS nf
      |    FROM documents WHERE doc_id % 3 = 1),
      |f AS (SELECT media_id, CAST(f AS INT) AS frame_idx,
      |    (SELECT sum(ascii(substring(text, CAST(f * 16 + j + 1 AS INT), 1)))
      |     FROM unnest(range(16)) t(j)) AS e
      |  FROM (SELECT media_id, text, unnest(range(nf)) AS f FROM a) t),
      |act AS (SELECT media_id, frame_idx, e,
      |    frame_idx - (row_number() OVER (PARTITION BY media_id
      |                                    ORDER BY frame_idx) - 1) AS island
      |  FROM f WHERE e > 1512)
      |SELECT media_id, min(frame_idx) AS seg_start, max(frame_idx) AS seg_end,
      |  CAST(count(*) AS INT) AS n_frames, CAST(sum(e) AS BIGINT) AS energy_sum
      |FROM act GROUP BY media_id, island""")(
    (s, dir) => Multimodal.vadSegmentsInRow(
      Multimodal.corpusFromDocuments(Tables.documents(s, dir)),
      threshold = 1512L, frameLen = 16).toDF())

  /** Multimodal dedup END-TO-END: connected components over q169's
    * perceptual-hash near-dup pairs, every image labelled with its
    * cluster minimum and whether it is the kept canonical — the same
    * cluster/keep contract as text dedup (q56), driven by the aHash
    * pair generator. The oracle replays the fixpoint with a recursive
    * transitive-closure CTE over the exact pair set. */
  val q182 = QueryDef.sql("q182_media_dedup_clusters",
    s"""WITH RECURSIVE pairs AS (${q169.oracle.get}),
      |ids AS (SELECT doc_id AS media_id FROM documents
      |        WHERE doc_id % 3 = 0 AND length(text) > 0
      |        UNION ALL
      |        SELECT doc_id + 3000000 FROM documents
      |        WHERE doc_id % 3 = 0 AND length(text) > 0),
      |edges AS (SELECT id1 AS u, id2 AS v FROM pairs
      |          UNION SELECT id2 AS u, id1 AS v FROM pairs),
      |reach(id, lab) AS (
      |  SELECT media_id, media_id FROM ids
      |  UNION
      |  SELECT e.u, r.lab FROM edges e JOIN reach r ON e.v = r.id)
      |SELECT id AS media_id, min(lab) AS cluster, min(lab) = id AS keep
      |FROM reach GROUP BY id""")(
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val media = Multimodal.corpusFromDocuments(docs)
        .unionByName(Multimodal.reencodeVariants(docs))
        .where(col("kind") === "image")
      val sig = Multimodal.perceptualHash(media, target = 60).toDF()
        .select(col("media_id"), col("ahash").as("simhash"))
      val pairs = graft.operators.Dedup.simhashPairsBanded(sig, "media_id",
        maxDist = 3, bits = 60)
      graft.operators.Graph.dedupClusters(
        media.select(col("media_id")), "media_id", pairs, "id1", "id2")
    })

  /** Speech ratio per audio payload: fraction of 16-byte frames with
    * energy strictly above the q170 threshold — the audio-level
    * quality dial (mostly-silence payloads filter out before
    * expensive transcription). */
  val q183 = QueryDef.sql("q183_speech_ratio",
    """WITH a AS (SELECT doc_id AS media_id, text, length(text) // 16 AS nf
      |    FROM documents WHERE doc_id % 3 = 1 AND length(text) >= 16),
      |f AS (SELECT media_id, f,
      |    (SELECT sum(ascii(substring(text, CAST(f * 16 + j + 1 AS INT), 1)))
      |     FROM unnest(range(16)) t(j)) AS e
      |  FROM (SELECT media_id, text, unnest(range(nf)) AS f FROM a) t)
      |SELECT media_id, CAST(count(*) AS BIGINT) AS n_frames,
      |  CAST(sum(CASE WHEN e > 1512 THEN 1 ELSE 0 END) AS BIGINT) AS n_active,
      |  round(CAST(sum(CASE WHEN e > 1512 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / count(*), 6) AS speech_ratio
      |FROM f GROUP BY media_id""")(
    (s, dir) => Multimodal.frameEnergies(
        Multimodal.corpusFromDocuments(Tables.documents(s, dir)), frameLen = 16)
      .toDF()
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("energy") > 1512L, 1L).otherwise(0L)).as("n_active"))
      .withColumn("speech_ratio",
        round(col("n_active").cast("double") / col("n_frames"), 6)))

  /** Shot-boundary detection over sampled "video" frames: per-frame
    * 16-bit average-hash (bit j set iff byte_j·16 > Σ bytes — the q169
    * aHash at frame granularity, integer-exact), then a cut wherever
    * consecutive frames' signatures differ by ≥ 6 of 16 bits. The
    * window is per-media ordered by frame index — co-partitioned with
    * the frame explode, never global. Output is the per-media shot
    * summary a video-curation pipeline keys on (sample one frame per
    * SHOT, not per second). Payloads are the ASCII stub corpus
    * (q35–q37); the production swap-in is a real decoder behind the
    * same frame schema. */
  val q232 = {
    val totSql = (1 to 16)
      .map(j => s"ascii(substring(f, $j, 1))").mkString(" + ")
    val sigSql = (1 to 16)
      .map(j => s"(CASE WHEN ascii(substring(f, $j, 1)) * 16 > tot " +
        s"THEN ${1L << (j - 1)} ELSE 0 END)").mkString(" + ")
    QueryDef.sql("q232_shot_boundaries",
      s"""WITH fr AS (SELECT doc_id AS media_id, CAST(i AS INT)
         |    AS frame_idx,
         |    substring(text, CAST(i * 64 + 1 AS INT), 16) AS f
         |  FROM (SELECT doc_id, text,
         |      unnest(range(greatest(CAST(floor(length(text) / 64.0)
         |        AS BIGINT), 1))) AS i
         |    FROM documents WHERE doc_id % 3 = 2) t),
         |ok AS (SELECT media_id, frame_idx, f, $totSql AS tot
         |  FROM fr WHERE length(f) = 16),
         |sig AS (SELECT media_id, frame_idx, CAST($sigSql AS BIGINT)
         |    AS sig
         |  FROM ok),
         |d AS (SELECT media_id, frame_idx, sig,
         |    lag(sig) OVER (PARTITION BY media_id ORDER BY frame_idx)
         |      AS prev
         |  FROM sig)
         |SELECT media_id, CAST(count(*) AS BIGINT) AS n_frames,
         |  CAST(sum(CASE WHEN prev IS NOT NULL AND
         |    bit_count(xor(sig, prev)) >= 6 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_cuts,
         |  CAST(sum(CASE WHEN prev IS NOT NULL AND
         |    bit_count(xor(sig, prev)) >= 6 THEN 1 ELSE 0 END) + 1
         |    AS BIGINT) AS n_shots,
         |  CAST(sum(CASE WHEN prev IS NULL THEN 0
         |    ELSE bit_count(xor(sig, prev)) END) AS BIGINT) AS sum_dist
         |FROM d GROUP BY media_id""")(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("media_id").orderBy("frame_idx")
        val d = graft.operators.Multimodal.frameSignatures(
            graft.operators.Multimodal.corpusFromDocuments(
              Tables.documents(s, dir)), stride = 4)
          .withColumn("prev", lag(col("sig"), 1).over(w))
        val dist = bit_count(col("sig").bitwiseXOR(col("prev")))
        val isCut = col("prev").isNotNull && dist >= 6
        d.groupBy("media_id").agg(
          count(lit(1)).as("n_frames"),
          sum(when(isCut, 1L).otherwise(0L)).as("n_cuts"),
          (sum(when(isCut, 1L).otherwise(0L)) + 1).as("n_shots"),
          sum(when(col("prev").isNull, 0L).otherwise(dist.cast("long")))
            .as("sum_dist"))
      })
  }

  /** Shot boundaries on REAL decoded video (q232's production
    * counterpart): each video payload is a genuine Y4M container, the
    * operator parses its 16×4 luma frames back and cuts where the
    * per-frame luma SUM jumps by more than 1500 — the luma-difference
    * detector over actual decoded planes, computed in-row (all frames
    * of a payload live in its row: zero shuffles, no window state).
    *
    * FULL exact oracle: frame f's decoded luma sum = Σ ascii over
    * text[64f+1 .. 64f+64] (the tail frame's zero pads add nothing),
    * so DuckDB replays the boundaries with a per-frame group-by and a
    * lag — no codec involved. The zero-padded tail frame usually drops
    * the luma sum enough to land a boundary (not always: a payload
    * whose length divides 64 exactly, or whose tail is nearly full,
    * produces none) — on the testdata corpora the query returns a
    * healthy row count (120 at sf0.01). */
  val q339 = QueryDef.sql("q339_video_luma_cuts",
    """WITH v AS (SELECT doc_id, text, length(text) AS len FROM documents
      |  WHERE doc_id % 3 = 2 AND length(text) > 0),
      |f AS (SELECT doc_id, (i - 1) // 64 AS frame_idx,
      |    sum(ascii(substring(text, CAST(i AS INT), 1))) AS luma_sum
      |  FROM (SELECT doc_id, text, unnest(range(1, len + 1)) AS i FROM v) t
      |  GROUP BY 1, 2),
      |l AS (SELECT doc_id, frame_idx, luma_sum,
      |    lag(luma_sum) OVER (PARTITION BY doc_id ORDER BY frame_idx)
      |      AS prev
      |  FROM f)
      |SELECT doc_id AS media_id, CAST(frame_idx AS INT) AS frame_idx,
      |  CAST(prev AS BIGINT) AS prev_sum,
      |  CAST(luma_sum AS BIGINT) AS luma_sum,
      |  CAST(abs(luma_sum - prev) AS BIGINT) AS delta
      |FROM l WHERE prev IS NOT NULL AND abs(luma_sum - prev) > 1500""")(
    (s, dir) => Multimodal.y4mShotBoundaries(
        Multimodal.corpusWithCodecs(Tables.documents(s, dir)),
        deltaMin = 1500L).toDF())

  val all: Seq[QueryDef] = Seq(q35, q36, q37, q73, q169, q170, q182, q183,
    q232, q339)
}
