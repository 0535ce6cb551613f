package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators. The reference is a daily micro-batch
  * pipeline (files appear, get processed in date order, move to an
  * archive — `main.py:85-100`); these are its streaming-native twins:
  *
  *  - `fileStream`: the checkpointed file source replacing the manual
  *    archive `.backup` bookkeeping;
  *  - `tumblingCounts`: event-time windowed aggregation with a watermark
  *    (late data beyond the watermark is dropped, the streaming analog
  *    of the blacklist's idempotent re-delivery handling);
  *  - `sessionize`: custom state machine via flatMapGroupsWithState —
  *    the unbounded-state shape (SCD2-like "current version per key")
  *    that mapGroupsWithState exists for.
  *
  * All transforms work identically on batch DataFrames (same API), which
  * is how the specs validate them against the batch twins (q22/q23).
  */
object Streams {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)

  final case class Session(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n_events: Long)

  // public: the state encoder's generated code instantiates it
  final case class SessionState(start: Long, last: Long, n: Long)

  final case class EwmaPoint(event_id: Long, user_id: Long, ewma: Double)
  // public: the state encoder's generated code instantiates it
  final case class EwmaState(recent: List[Double])

  /** Streaming twin of q126's bounded-lag EWMA: per-user state is the
    * last ≤4 values (most recent first); each event emits the same
    * fixed IEEE expression the batch query evaluates — numerator
    * parenthesization, short-history weight renormalization and the
    * final HALF_UP round(…, 6) all replicated operation-for-operation,
    * so an in-order replay matches the batch output bit-for-bit (the
    * spec's assertion). Events are sorted by (ts, event_id) within
    * each micro-batch; cross-batch late data would see a stale buffer
    * — pair with a watermark + dedup upstream, as with [[sessionize]].
    * State is O(4 doubles) per user, constant. */
  def ewmaStream(events: Dataset[Event]): Dataset[EwmaPoint] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[EwmaState, EwmaPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[EwmaState]) =>
          var recent = state.getOption.map(_.recent).getOrElse(Nil)
          val out = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).map { e =>
            def lag(i: Int): Double = recent.lift(i).getOrElse(0.0)
            def ind(i: Int): Double = if (recent.lift(i).isDefined) 1.0 else 0.0
            val num = (((e.value + 0.5 * lag(0)) + 0.25 * lag(1))
              + 0.125 * lag(2)) + 0.0625 * lag(3)
            val den = (((1.0 + 0.5 * ind(0)) + 0.25 * ind(1))
              + 0.125 * ind(2)) + 0.0625 * ind(3)
            val ewma = java.math.BigDecimal.valueOf(num / den)
              .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
            recent = (e.value :: recent).take(4)
            EwmaPoint(e.event_id, user, ewma)
          }
          state.update(EwmaState(recent))
          out.iterator
      }
  }

  final case class TokenRow(source: String, token: String)
  final case class DriftPoint(source: String, c_s: Long, tv_micro: Long)
  // public: the state encoder's generated code instantiates it
  final case class DriftState(tokens: Map[String, Long])

  /** Streaming mixture-drift monitor — the stateful twin of q119's
    * total-variation distance: per-source RUNNING token counts live in
    * group state, and after every micro-batch each updated source
    * re-emits its TV distance against a STATIC corpus distribution
    * (the frozen reference the pipeline was tuned on). Exactly q119's
    * folded formula — Σ_{t∈Vs}|c_st·c_c − c_t·c_s| plus the uncovered
    * corpus mass — evaluated over the state's token map, with the TV
    * in floor-divided micro-units (the q128 no-round contract; integer
    * state makes replay exact). State per source is its running
    * vocabulary (bounded by the source's distinct tokens — the same
    * bound the batch aggregation pays, but resident).
    *
    * Once the stream has delivered exactly the corpus the reference
    * was computed from, the emitted TV equals the batch operator's
    * (the spec's assertion, micro-unit exact). */
  def tvDriftStream(tokens: Dataset[TokenRow],
                    corpusCounts: Map[String, Long]): Dataset[DriftPoint] = {
    import tokens.sparkSession.implicits._
    val cC: Long = corpusCounts.valuesIterator.sum
    tokens.groupByKey(_.source)
      .flatMapGroupsWithState[DriftState, DriftPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (source: String, it: Iterator[TokenRow], state: GroupState[DriftState]) =>
          var counts = state.getOption.map(_.tokens).getOrElse(Map.empty)
          it.foreach { r =>
            counts = counts.updated(r.token, counts.getOrElse(r.token, 0L) + 1L)
          }
          state.update(DriftState(counts))
          val cS = counts.valuesIterator.sum
          if (cS == 0) Iterator.empty
          else {
            var present = 0L
            var covered = 0L
            counts.foreach { case (t, cSt) =>
              val cT = corpusCounts.getOrElse(t, 0L)
              present += math.abs(cSt * cC - cT * cS)
              covered += cT
            }
            val num = present + (cC - covered) * cS
            val tvMicro = math.floor(
              num.toDouble / (2.0 * cS.toDouble * cC.toDouble) * 1000000.0)
              .toLong
            Iterator.single(DriftPoint(source, cS, tvMicro))
          }
      }
  }

  /** Checkpointed file source over a directory of parquet drops. */
  def fileStream(spark: SparkSession, dir: String,
                 schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(dir)

  /** Streaming exactly-once dedup: duplicate event ids arriving within
    * the watermark horizon are dropped across micro-batches (the
    * streaming twin of the blacklist anti-join idempotence,
    * `comm_funcs.py:50-54`). Uses `dropDuplicatesWithinWatermark` so the
    * dedup state is EVICTED once an id ages past the horizon — a plain
    * `dropDuplicates("event_id")` would grow state unboundedly because
    * the event-time column is not part of the dedup key. */
  def dedupStream(events: DataFrame, watermark: String): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Tumbling event-time window counts with a watermark. */
  def tumblingCounts(events: DataFrame, windowLen: String,
                     watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))

  /** Stateful sessionization: a session closes after `gapSeconds` of
    * silence per user (event-time, via state timeout on processing when
    * streaming; exact when replayed in order). Emits closed sessions. */
  def sessionize(events: Dataset[Event], gapSeconds: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapSeconds * 1000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          // within one trigger, events of a group arrive unordered
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val closed = Seq.newBuilder[Session]
          var st = state.getOption.orNull
          for (e <- sorted) {
            val t = e.ts.getTime
            st match {
              case null => st = SessionState(t, t, 1)
              case s if t - s.last > gapMs =>
                closed += Session(user, new Timestamp(s.start),
                  new Timestamp(s.last), s.n)
                st = SessionState(t, t, 1)
              case s => st = s.copy(last = math.max(s.last, t), n = s.n + 1)
            }
          }
          if (st != null) state.update(st)
          closed.result().iterator
      }
  }

  /** Streaming band join — the live twin of fraud rules 3/4
    * (`loading_rep_fraud.py:74-76`): pairs of events on the same key
    * within `deltaSeconds`, computed as a watermarked stream-stream
    * self-join. Spark turns the time-range predicate into join state
    * bounded by the watermark: each side keeps only `watermark` +
    * `deltaSeconds` of history per key, so state size is proportional
    * to the RATE, not the stream's age — the property that lets the
    * fraud rules run continuously instead of re-scanning a warehouse
    * table per day.
    *
    * Output: (key, ts_1, id_1, ts_2, id_2) with 0 < ts_2 − ts_1 <
    * deltaSeconds — the same pair semantics as
    * [[graft.operators.BandJoin.pairsWithin]], which the spec asserts
    * against the batch result on a replayed stream. */
  def bandJoinStream(events: DataFrame, keyCol: String, idCol: String,
                     deltaSeconds: Long, watermark: String): DataFrame = {
    val a = events.select(col(keyCol).as("key"), col("ts").as("ts_1"),
      col(idCol).as("id_1")).withWatermark("ts_1", watermark).as("l")
    val b = events.select(col(keyCol).as("key"), col("ts").as("ts_2"),
      col(idCol).as("id_2")).withWatermark("ts_2", watermark).as("r")
    a.join(b, expr(
      s"l.key = r.key AND ts_2 > ts_1 AND " +
        s"ts_2 < ts_1 + INTERVAL $deltaSeconds SECONDS"))
      .select(col("l.key"), col("ts_1"), col("id_1"), col("ts_2"), col("id_2"))
  }

  /** Streaming decontamination: the live twin of
    * [[graft.operators.TextAnalysis.decontaminate]] — documents arrive
    * as a stream, the benchmark n-gram set is a STATIC side (eval sets
    * change rarely; at cluster scale it is a broadcast that every
    * micro-batch reuses). Per-row the fused
    * [[graft.functions.TokenNgrams]] scan emits the doc's distinct
    * grams; a stream-static inner join + per-doc count computes the
    * overlap. No stream-stream state at all — the stateful aggregation
    * is keyed by doc id within the micro-batch the doc arrived in
    * (append semantics; a doc's grams all travel in its row).
    *
    * Emits (id, n_grams, hits, ratio) for CONTAMINATED docs only, same
    * columns and threshold semantics as the batch operator — the spec
    * replays a corpus through the stream and asserts equality with the
    * batch result. */
  def decontaminateStream(docs: DataFrame, benchGrams: DataFrame,
                          idCol: String, textCol: String,
                          n: Int, threshold: Double): DataFrame = {
    val grams = graft.functions.TextExpressions.tokenNgrams(col(textCol), n)
    docs
      .select(col(idCol), size(grams).cast("long").as("n_grams"),
        explode(grams).as("gram"))
      .join(broadcast(benchGrams.select(col("gram"))), Seq("gram"))
      .groupBy(col(idCol), col("n_grams"))
      .agg(count(lit(1)).as("hits"))
      .where(col("hits").cast("double") / col("n_grams") >= threshold)
      .select(col(idCol), col("n_grams"), col("hits"),
        round(col("hits").cast("double") / col("n_grams"), 6).as("ratio"))
  }

  /** Streaming incremental near-dup detection: the live twin of
    * [[graft.operators.Dedup.incrementalLshCandidates]] — documents
    * arrive as a stream and are checked against a STATIC corpus bucket
    * index (the persisted (band, key, id) table an incremental pipeline
    * maintains; at cluster scale a broadcast every micro-batch reuses).
    *
    * The delta side is per-row end to end: the fused MinHash signature
    * scan and in-row banding are stateless, so the only operator
    * between source and sink is a stream-static equi join on
    * (band, key) — no stream state at all. Emits candidate pairs
    * (id1, id2), id1 < id2.
    *
    * Contracts (both spec-asserted):
    *  - a pair is emitted once per band the two docs collide in —
    *    at-least-once; sinks keyed on (id1, id2) are idempotent, the
    *    same contract the warehouse sinks already use for re-delivery;
    *  - only stream×corpus pairs are found here. Within-stream pairs
    *    need a watermarked stream-stream self-join ([[bandJoinStream]]
    *    shape) or periodic batch compaction of the corpus index — the
    *    standard split, since two near-dup docs can arrive arbitrarily
    *    far apart and unbounded cross-batch state is exactly what a
    *    stream must not hold. */
  def lshDedupStream(docs: DataFrame, corpusBuckets: DataFrame,
                     idCol: String, textCol: String,
                     k: Int, bands: Int, rowsPerBand: Int): DataFrame = {
    val d = graft.operators.Dedup
      .lshBuckets(docs, idCol, textCol, k, bands, rowsPerBand)
    d.select(col(idCol).as("b"), col("band"), col("key"))
      .join(broadcast(corpusBuckets
        .select(col(idCol).as("a"), col("band"), col("key"))),
        Seq("band", "key"))
      .where(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("id1"),
        greatest(col("a"), col("b")).as("id2"))
  }

  /** Streaming segment-level boilerplate strip — the live twin of
    * [[graft.operators.Dedup.stripBoilerplateSegments]]: documents
    * arrive as a stream; the hot-segment set is STATIC, carried as a
    * sorted xxhash64 array
    * ([[graft.operators.Dedup.hotSegmentHashes]] — a periodic batch job
    * rebuilds it, every micro-batch reuses it). The entire transform is
    * per-row: segments derive in-row, the membership probe runs inside
    * the `filter` lambda (codegen'd binary search,
    * [[graft.functions.SortedLongContains]] — exact, no Bloom false
    * positives, no UDF), and reassembly is an order-preserving
    * `array_join` — no explode, no aggregation, NO STREAM STATE at
    * all, so it runs in append mode with no watermark.
    *
    * Output is row-for-row the batch operator's (both probe the same
    * hot hash set with the same 64-bit-collision trade); StreamsSpec
    * replays a corpus and asserts exact equality. */
  def stripBoilerplateStream(docs: DataFrame, hotHashes: Array[Long],
                             idCol: String, textCol: String,
                             segTokens: Int): DataFrame = {
    val segs = graft.operators.Dedup.segmentArray(col(textCol), segTokens)
    val hot = lit(hotHashes)
    docs
      .select(col(idCol), segs.as("__segs"))
      .select(col(idCol),
        filter(col("__segs"), s => !graft.functions.PairExpressions
          .sortedLongContains(hot, xxhash64(s))).as("__kept"),
        size(col("__segs")).cast("long").as("n_segments"))
      .select(col(idCol),
        array_join(col("__kept"), " ").as("clean_text"),
        col("n_segments"),
        size(col("__kept")).cast("long").as("n_kept"),
        (col("n_segments") - size(col("__kept")).cast("long")).as("n_removed"))
  }

  /** The static corpus side for [[lshDedupStream]]: the banded bucket
    * index of the existing corpus, one row per (band, key, id). */
  def corpusBucketIndex(corpus: DataFrame, idCol: String, textCol: String,
                        k: Int, bands: Int, rowsPerBand: Int): DataFrame =
    graft.operators.Dedup
      .lshBuckets(corpus, idCol, textCol, k, bands, rowsPerBand)

  /** Streaming fixed-radius edit-distance join — the live twin of
    * [[graft.operators.Linkage.incrementalEditCandidates]] (and of
    * batch q342), the [[lshDedupStream]] contract applied to PassJoin:
    * arriving rows generate their (r+1)(2r+1)² probe keys IN-ROW
    * ([[graft.operators.Linkage.editProbeKeys]] — explode only, no
    * aggregation, NO STREAM STATE, so it runs in append mode with no
    * watermark), probe the broadcast STATIC corpus index
    * ([[editCorpusIndex]] — the r+1 segment keys per corpus string a
    * daily linkage pipeline persists), and candidates verify inline
    * with the banded thresholded DP. Output: (id1, id2, dist) with
    * dist = levenshtein ≤ r, id1 < id2.
    *
    * Same split as [[lshDedupStream]]: the stream covers
    * stream×corpus; stream×stream pairs belong to a session-windowed
    * variant or periodic batch compaction (two near rows can arrive
    * arbitrarily far apart — unbounded cross-batch state is what a
    * stream must not hold). A pair sharing several grid keys emits
    * once per key (at-least-once; the sink dedupes) — the stateless
    * price of append mode, identical to the band-repeat contract of
    * [[lshDedupStream]]. StreamsSpec proves the replayed stream's
    * distinct pairs ≡ the batch incremental operator's stream×corpus
    * slice. */
  def editJoinStream(docs: DataFrame, corpusIndex: DataFrame,
                     idCol: String, strCol: String, blkCol: String,
                     r: Int): DataFrame = {
    val base = docs.select(col(idCol).as("__id"), col(strCol).as("__s"),
      col(blkCol).as("__blk"))
    graft.operators.Linkage.editProbeKeys(base, r)
      .join(broadcast(corpusIndex), Seq("__blk", "__i", "__l", "__seg"))
      .where(col("__idi") =!= col("__idp"))
      .select(least(col("__idi"), col("__idp")).as("id1"),
        greatest(col("__idi"), col("__idp")).as("id2"),
        when(col("__idi") < col("__idp"), col("__si"))
          .otherwise(col("__sp")).as("s1"),
        when(col("__idi") < col("__idp"), col("__sp"))
          .otherwise(col("__si")).as("s2"))
      .withColumn("dist", levenshtein(col("s1"), col("s2"), r).cast("long"))
      .where(col("dist") >= 0)
      .select("id1", "id2", "dist")
  }

  /** The static corpus side for [[editJoinStream]]: the PassJoin
    * segment-key index of the existing corpus, one row per (string,
    * segment slot) — r+1 rows per string. */
  def editCorpusIndex(corpus: DataFrame, idCol: String, strCol: String,
                      blkCol: String, r: Int): DataFrame =
    graft.operators.Linkage.editIndexKeys(
      corpus.select(col(idCol).as("__id"), col(strCol).as("__s"),
        col(blkCol).as("__blk")), r)

  /** The DISTINCT-VALUE-COLLAPSE streaming twin of [[editJoinStream]]
    * (VERDICT r14 #5): the same stream×corpus fixed-radius edit join,
    * for corpora whose string domain SATURATES. [[editJoinStream]]'s
    * broadcast index is per corpus ROW — n·(r+1) rows — and every
    * probe key meets every replica of a matching value, so on a
    * saturated domain the candidate×DP volume rides the corpus
    * replication. This twin broadcasts the VALUE-level index instead
    * (dn·(r+1) rows — the domain, not the corpus), verifies ONE
    * banded DP per (arriving row, matched value), and expands to
    * corpus ids afterwards with a stateless STREAM-STATIC equi-join
    * on (block, value) — pure output materialization, the
    * [[graft.operators.Linkage.editJoinByDistinct]] plan shape in
    * append mode. Still zero stream state, no watermark: probe keys
    * are per-row explodes, the index is a broadcast artifact, and the
    * expansion join's static side carries no streaming semantics.
    * Same at-least-once contract (a pair reachable through several
    * grid keys emits once per key; the sink dedupes) and the same
    * stream×corpus split as [[editJoinStream]].
    *
    * `corpus` is the RAW static corpus (id, string, block) — the twin
    * derives both artifacts (value index, expansion side) from it, so
    * a daily rebuild job refreshes one table. */
  def editJoinCollapsedStream(docs: DataFrame, corpus: DataFrame,
                              idCol: String, strCol: String,
                              blkCol: String, r: Int): DataFrame = {
    val cNorm = corpus.select(col(idCol).as("__cid"),
      col(strCol).as("__si"), col(blkCol).as("__blk"))
    // value-level PassJoin index: the value is its own id (the
    // gridValuePairs treatment); tiny — dn·(r+1) rows
    val valIndex = graft.operators.Linkage.editIndexKeys(
      cNorm.select(col("__blk"), col("__si").as("__s")).distinct()
        .select(col("__blk"), col("__s").as("__id"), col("__s")), r)
    val base = docs.select(col(idCol).as("__id"), col(strCol).as("__s"),
      col(blkCol).as("__blk"))
    // ONE DP per (arriving row, candidate VALUE) — never per replica
    val cand = graft.operators.Linkage.editProbeKeys(base, r)
      .join(broadcast(valIndex), Seq("__blk", "__i", "__l", "__seg"))
      .withColumn("dist", levenshtein(col("__sp"), col("__si"), r).cast("long"))
      .where(col("dist") >= 0)
      .select(col("__blk"), col("__idp"), col("__si"), col("dist"))
    // output-proportional expansion to corpus ids (stream-static)
    cand.join(cNorm, Seq("__blk", "__si"))
      .where(col("__idp") =!= col("__cid"))
      .select(least(col("__idp"), col("__cid")).as("id1"),
        greatest(col("__idp"), col("__cid")).as("id2"),
        col("dist"))
  }

  /** ONE front door for the streaming edit join — the
    * [[graft.operators.Linkage.editJoin]] count-then-dial stance
    * choice applied to the stream×corpus shape: one bounded aggregate
    * on the STATIC corpus at stream-assembly time (the stream side
    * cannot be probed, and need not be — the corpus is what
    * saturates) picks the row-level PassJoin twin
    * ([[editJoinStream]]) for growing domains and the value-collapse
    * twin ([[editJoinCollapsedStream]]) for saturated ones. Both
    * twins are exact on the stream×corpus slice (StreamsSpec pins
    * each against the batch incremental operator), so the dial is a
    * pure plan choice, decided once per stream, not per batch. */
  def editJoinStreamDialed(docs: DataFrame, corpus: DataFrame,
                           idCol: String, strCol: String,
                           blkCol: String, r: Int): DataFrame = {
    val probe = corpus.agg(count(lit(1)),
      count_distinct(struct(col(blkCol), col(strCol)))).head()
    if (graft.operators.Linkage.chooseCollapse(probe.getLong(0),
        probe.getLong(1)))
      editJoinCollapsedStream(docs, corpus, idCol, strCol, blkCol, r)
    else
      editJoinStream(docs,
        editCorpusIndex(corpus, idCol, strCol, blkCol, r),
        idCol, strCol, blkCol, r)
  }

  /** Streaming chunk-level novelty — the live twin of
    * [[graft.operators.Dedup.chunkContainment]] for incremental crawl
    * intake: each arriving document is cut into content-defined chunks
    * IN-ROW ([[graft.operators.Dedup.chunkBoundsCol]] — the identical
    * boundary expression the batch operator uses), and each chunk is
    * probed against the static chunk store (sorted xxhash64 array from
    * [[graft.operators.Dedup.chunkStoreHashes]], rebuilt by a periodic
    * batch job) with a codegen'd binary search. Entirely stateless —
    * no watermark, no stream state, append mode — because the store is
    * a broadcast artifact, exactly the [[stripBoilerplateStream]]
    * contract. Output row-for-row matches the batch operator modulo
    * the md5→xxhash64 store representation (64-bit-collision trade;
    * StreamsSpec asserts exact equality on a replayed corpus). */
  def chunkNoveltyStream(docs: DataFrame, storeHashes: Array[Long],
                         idCol: String, textCol: String,
                         window: Int = 8, modulus: Int = 64): DataFrame = {
    import graft.operators.Dedup
    val store = lit(storeHashes)
    docs.where(length(col(textCol)) > 0)
      .select(col(idCol), col(textCol).as("__t"),
        Dedup.chunkBoundsCol(col(textCol), window, modulus).as("__b"))
      .select(col(idCol),
        Dedup.chunkTextsCol(col("__t"), col("__b")).as("__chunks"))
      .select(col(idCol),
        size(col("__chunks")).cast("long").as("n_chunks"),
        size(filter(col("__chunks"), c => graft.functions.PairExpressions
          .sortedLongContains(store, xxhash64(c)))).cast("long").as("n_seen"))
      .withColumn("containment",
        round(col("n_seen").cast("double") / col("n_chunks"), 6))
  }

  /** True-streaming sessionization: like [[sessionize]], but an open
    * session is ALSO emitted once the event-time watermark passes its
    * last event + gap — no more events can extend it at that point, so
    * the emission is exact, not heuristic. State for the emitted session
    * is removed, bounding state size by the number of LIVE sessions.
    *
    * Streaming-only (event-time timeout needs a watermark); batch
    * replays use [[sessionize]] + [[openSessions]] instead — identical
    * output by construction, which is what the spec asserts. */
  def sessionizeStream(events: Dataset[Event], gapSeconds: Long,
                       watermark: String): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapSeconds * 1000L
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last+gap: the session can never grow — close it
            val s = state.get
            state.remove()
            Iterator.single(Session(user, new Timestamp(s.start),
              new Timestamp(s.last), s.n))
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val closed = Seq.newBuilder[Session]
            var st = state.getOption.orNull
            for (e <- sorted) {
              val t = e.ts.getTime
              st match {
                case null => st = SessionState(t, t, 1)
                case s if t - s.last > gapMs =>
                  closed += Session(user, new Timestamp(s.start),
                    new Timestamp(s.last), s.n)
                  st = SessionState(t, t, 1)
                case s => st = s.copy(last = math.max(s.last, t), n = s.n + 1)
              }
            }
            if (st != null) {
              state.update(st)
              // a timeout timestamp may not sit at/behind the watermark;
              // if the horizon already passed, fire at watermark+1ms
              state.setTimeoutTimestamp(
                math.max(st.last + gapMs, state.getCurrentWatermarkMs() + 1L))
            }
            closed.result().iterator
          }
      }
  }

  /** Flush any open sessions from a finished sessionize run (batch use:
    * the final open session per user). Streaming would use a timeout;
    * batch replays call this once at the end. */
  def openSessions(events: Dataset[Event], gapSeconds: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapSeconds * 1000000L
    val byUser = events.toDF()
      .withColumn("t", unix_micros(col("ts")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("t"), col("event_id"))
    byUser
      .withColumn("prev", lag(col("t"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev").isNull || col("t") - col("prev") > gapUs, 1).otherwise(0))
      .withColumn("sess_no", sum(col("new_sess")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sess_no")
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .withColumn("max_sess", max(col("sess_no")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")))
      .where(col("sess_no") === col("max_sess"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))
      .as[Session]
  }

  /** Streaming retrieval: an unbounded stream of query vectors scored
    * against a STATIC prebuilt IVF index
    * ([[graft.operators.Ivf.buildIndex]] — the online-serving shape:
    * build the index once, serve queries as they arrive).
    *
    * Append-safe by construction: cell probing is a per-row expression
    * over the literal centroid matrix (no streaming aggregation), and
    * the candidate lookup is a stateless stream-static equi-join on the
    * cell id — every micro-batch reuses the same cached corpus side.
    * Emits scored candidates (query_id, corpus_id, cosine); the final
    * per-query top-k ranking belongs to the consumer (a
    * `foreachBatch` [[graft.operators.Similarity.rankTopK]], or a
    * downstream update-mode aggregation) because a global rank over an
    * append stream is not well-defined until the query's candidates
    * have all arrived — which, with per-batch probing, is the end of
    * its micro-batch. StreamsSpec replays a query stream and asserts
    * the per-batch ranking equals the batch [[graft.operators.Ivf
    * .probeTopK]] row-for-row. */
  def retrieveStream(queries: DataFrame, index: graft.operators.Ivf.IvfIndex,
                     idCol: String, vecCol: String, nprobe: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
        transform(col(vecCol), x => x.cast("double")).as("va"))
      .withColumn("na", graft.operators.Similarity.norm(col("va")))
      .withColumn("cell", explode(graft.operators.Ivf
        .probeCellsFused(col("va"), index, nprobe)))
    q.join(index.indexed.select(col("id").as("corpus_id"),
        col("v").as("vb"), col("nrm").as("nb"), col("cell")), Seq("cell"))
      .withColumn("cosine", graft.operators.Similarity
        .dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .select("query_id", "corpus_id", "cosine")
  }

  /** Streaming twin of [[graft.operators.Reconcile.fingerprint]]:
    * maintain the per-bucket (n, fp) table fingerprints continuously as
    * rows arrive, instead of re-scanning the snapshot per comparison —
    * the anti-entropy shape for a table that is WRITTEN as a stream
    * (the 100 TB replica never has a quiet moment to re-fingerprint).
    *
    * Both aggregates are commutative and single-valued (`count`,
    * `bit_xor`), so an update-mode streaming aggregation maintains
    * them exactly: after any prefix of the stream, the state equals
    * the batch fingerprint of the rows seen so far — bit-for-bit,
    * shuffle- and batch-boundary-independent (StreamsSpec replays a
    * row stream in micro-batches and asserts parity with
    * [[graft.operators.Reconcile.fingerprint]] after every batch).
    * State is nBuckets rows regardless of stream length. */
  def fingerprintStream(rows: DataFrame, bucketKey: Column,
                        cols: Seq[Column], nBuckets: Int): DataFrame =
    rows.select(pmod(bucketKey, lit(nBuckets)).cast("int").as("bucket"),
        graft.operators.Reconcile.rowHash(cols).as("h"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("fp"))

  /** Streaming twin of [[graft.operators.Materialize.maintain]]: the
    * grouped `(n, s)` MV maintained continuously from a signed CDC
    * feed (`__sign` = +1 insert / −1 delete, updates as both). Signed
    * counts and integral sums are commutative aggregates, so an
    * update-mode streaming aggregation maintains them exactly: after
    * any prefix of the feed the state equals the batch
    * `maintain(groupedMv(base), delta-so-far)` — bit-for-bit,
    * batch-boundary independent (StreamsSpec replays a delta in
    * micro-batches and asserts parity after every one). Bootstrap from
    * an existing snapshot = feed it once as all-`+1` rows. State is
    * |groups| rows regardless of feed length; groups retracted to
    * zero rows are filtered out, matching the batch operator. */
  def maintainAggStream(delta: DataFrame, groupCol: String,
                        valueCol: Column): DataFrame =
    delta.groupBy(col(groupCol))
      .agg(sum(col("__sign").cast("long")).as("n"),
        sum(col("__sign").cast("long") * valueCol.cast("long")).as("s"))
      .where(col("n") > 0)

  /** Streaming twin of [[graft.operators.Sketches.hllRegisters]]: the
    * per-group HLL register table maintained continuously as rows
    * arrive. `max(rho)` is commutative, associative and single-valued,
    * so an update-mode streaming aggregation maintains it exactly —
    * after any prefix of the stream the state equals the batch
    * registers of the rows seen so far, bit-for-bit and
    * batch-boundary-independent (StreamsSpec replays in micro-batches
    * and asserts parity after every one; the [[fingerprintStream]]
    * argument). The maintained registers are what q194/q200/q207 then
    * query for overlaps and distinct-to-date curves WITHOUT re-scanning
    * history — the nightly-persisted artifact becomes a live one.
    * State is groups × 256 rows regardless of stream length. */
  def hllRegisterStream(rows: DataFrame, groupCol: String,
                        valueCol: String): DataFrame = {
    import graft.operators.Sketches
    val h = Sketches.hash60(col(valueCol))
    rows.select(col(groupCol), shiftright(h, Sketches.RemBits).as("bucket"),
        h.bitwiseAND(lit((1L << Sketches.RemBits) - 1)).as("r"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(Sketches.rho(col("r"))).as("rho"))
  }

  final case class Attribution(event_id: Long, user_id: Long,
                               touch_type: String)
  // public: the state encoder's generated code instantiates it
  final case class TouchState(us: Long, ty: String)

  /** Streaming twin of q199's last-touch attribution: per-user state is
    * ONE (time, type) pair — the most recent view/click — and each
    * purchase emits its attribution the moment it arrives, instead of
    * the batch query's full-history window. Events are ordered by
    * (µs, event_id) within each micro-batch and state updates AFTER the
    * purchase check, which reproduces the batch window's
    * `ROWS … AND 1 PRECEDING` frame exactly; an in-order replay matches
    * q199's per-purchase attribution bit-for-bit (StreamsSpec). State is
    * O(16 bytes) per user, constant in stream length. Timestamps carry
    * Timestamp.getNanos µs precision — ms-only arithmetic would break
    * ties differently from the batch `unix_micros` ordering. */
  def attributionStream(events: Dataset[Event],
                        windowUs: Long = 7L * 24 * 3600 * 1000000L):
      Dataset[Attribution] = {
    import events.sparkSession.implicits._
    def usOf(e: Event): Long =
      math.floorDiv(e.ts.getTime, 1000L) * 1000000L + e.ts.getNanos / 1000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[TouchState, Attribution](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[TouchState]) =>
          val sorted = it.toSeq.sortBy(e => (usOf(e), e.event_id))
          val out = Seq.newBuilder[Attribution]
          var st = state.getOption.orNull
          for (e <- sorted) {
            val us = usOf(e)
            if (e.event_type == "purchase") {
              val ty = if (st != null && us - st.us <= windowUs) st.ty
                       else "none"
              out += Attribution(e.event_id, user, ty)
            }
            if (e.event_type == "view" || e.event_type == "click")
              st = TouchState(us, e.event_type)
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  final case class FrameSig(media_id: Long, frame_idx: Int, sig: Long)
  final case class ShotSummary(media_id: Long, n_frames: Long,
                               n_cuts: Long, n_shots: Long, sum_dist: Long)
  // public: the state encoder's generated code instantiates it
  final case class ShotState(lastSig: Long, n: Long, cuts: Long,
                             dist: Long)

  /** Streaming twin of q232's shot-boundary detection: per-media state
    * is the LAST frame signature plus three counters — each arriving
    * frame contributes its Hamming distance to the previous one, a cut
    * when ≥ `cutBits`, and the stream emits the updated per-media shot
    * summary every micro-batch (update-style). After any prefix of
    * in-order frames the emitted summary equals the batch query over
    * the frames seen so far, bit-for-bit and batch-boundary-
    * independent (StreamsSpec replays in micro-batches). Frames are
    * sorted by frame_idx within each batch; cross-batch late frames
    * would diff against the wrong predecessor — pair with an upstream
    * watermark + in-order delivery per media (q234 is the sizing
    * tool), the [[ewmaStream]] caveat. State is O(32 bytes) per media,
    * constant in stream length. */
  def shotBoundaryStream(frames: Dataset[FrameSig],
                         cutBits: Int = 6): Dataset[ShotSummary] = {
    import frames.sparkSession.implicits._
    frames.groupByKey(_.media_id)
      .flatMapGroupsWithState[ShotState, ShotSummary](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (id: Long, it: Iterator[FrameSig], state: GroupState[ShotState]) =>
          var st = state.getOption.getOrElse(ShotState(0L, 0L, 0L, 0L))
          for (f <- it.toSeq.sortBy(_.frame_idx)) {
            if (st.n == 0) st = ShotState(f.sig, 1L, 0L, 0L)
            else {
              val d = java.lang.Long.bitCount(st.lastSig ^ f.sig).toLong
              st = ShotState(f.sig, st.n + 1,
                st.cuts + (if (d >= cutBits) 1L else 0L), st.dist + d)
            }
          }
          state.update(st)
          Iterator(ShotSummary(id, st.n, st.cuts, st.cuts + 1, st.dist))
      }
  }

  final case class SprtObs(event_type: String, ts: Timestamp,
                           event_id: Long, value: Double)
  final case class SprtStatus(event_type: String, n: Long,
                              cross_rk: Long, w_at_cross: Long,
                              decision: String, final_w: Long)
  // public: the state encoder's generated code instantiates it
  final case class SprtState(n: Long, walk: Long, crossRk: Long,
                             wAtCross: Long)

  /** Streaming twin of q256's Wald SPRT: per-arm state is the trial
    * count, the integer walk w = 2k − n, and the first-crossing record
    * — O(32 bytes) per key, constant in stream length. Each arriving
    * observation steps the walk (±1 on `value > successAbove`), latches
    * the first |w| ≥ `bound` crossing, and the stream emits the updated
    * per-arm status every micro-batch; a crossed arm keeps reporting
    * its latched decision (the monitoring dashboard shape). After any
    * in-order prefix the emitted status equals the q256 batch query
    * over the observations seen so far, bit-for-bit and
    * batch-boundary-independent (StreamsSpec replays in micro-batches).
    * Observations are sorted by (ts, event_id) within a batch;
    * cross-batch late data would step the walk out of order — pair
    * with an upstream watermark (q234 sizes it), the [[ewmaStream]]
    * caveat. */
  def sprtStream(obs: Dataset[SprtObs], successAbove: Double = 34.0,
                 bound: Long = 17L): Dataset[SprtStatus] = {
    import obs.sparkSession.implicits._
    obs.groupByKey(_.event_type)
      .flatMapGroupsWithState[SprtState, SprtStatus](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (et: String, it: Iterator[SprtObs], state: GroupState[SprtState]) =>
          var st = state.getOption.getOrElse(SprtState(0L, 0L, -1L, 0L))
          for (o <- it.toSeq.sortBy(o => (o.ts.getTime, o.event_id))) {
            val w = st.walk + (if (o.value > successAbove) 1L else -1L)
            val crossed = st.crossRk < 0 && math.abs(w) >= bound
            st = SprtState(st.n + 1, w,
              if (crossed) st.n + 1 else st.crossRk,
              if (crossed) w else st.wAtCross)
          }
          state.update(st)
          val decision =
            if (st.wAtCross >= bound) "accept_h1"
            else if (st.wAtCross <= -bound && st.crossRk > 0) "accept_h0"
            else "continue"
          Iterator(SprtStatus(et, st.n, st.crossRk, st.wAtCross,
            decision, st.walk))
      }
  }

  final case class DailyPoint(event_type: String, ed: Long, y: Long)
  final case class P95Point(event_type: String, ed: Long, p95_micro: Long)
  // public: the state encoder's generated code instantiates it
  final case class TrailState(eds: List[Long], ys: List[Long])

  /** Streaming twin of q277's trailing-28-day p95: per-key state is
    * the last 28 (epoch-day, value) points — O(28·16 B), constant in
    * stream length — and each arriving daily point emits the EXACT
    * 27th-of-28 order statistic once the window is full (append
    * mode: one row per day, same rows as the batch query over the
    * prefix; StreamsSpec replays in micro-batches). Same in-order
    * delivery contract as [[sprtStream]]. The bounded-state exact
    * order statistic is the streaming counterpart of q278's
    * histogram stance: never an estimate, never unbounded state. */
  def trailingP95Stream(days: Dataset[DailyPoint],
                        window: Int = 28): Dataset[P95Point] = {
    import days.sparkSession.implicits._
    val rank = (window * 95 + 99) / 100 - 1 // 0-based 27th of 28
    days.groupByKey(_.event_type)
      .flatMapGroupsWithState[TrailState, P95Point](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (et: String, it: Iterator[DailyPoint],
         state: GroupState[TrailState]) =>
          var st = state.getOption.getOrElse(TrailState(Nil, Nil))
          val out = Seq.newBuilder[P95Point]
          for (p <- it.toSeq.sortBy(_.ed)) {
            val eds = (st.eds :+ p.ed).takeRight(window)
            val ys = (st.ys :+ p.y).takeRight(window)
            st = TrailState(eds, ys)
            if (ys.length == window)
              out += P95Point(et, p.ed, ys.sorted.apply(rank))
          }
          state.update(st)
          out.result().iterator
      }
  }

  final case class Transition(user_id: Long, prev_type: String,
                              next_type: String, gap_us: Long)
  // public: the state encoder's generated code instantiates it
  final case class LastEvent(us: Long, ty: String)

  /** Streaming twin of q95's directly-follows transitions: per-user
    * state is ONE (time, type) pair — each arriving event emits its
    * transition edge (prev -> cur, exact µs gap) the moment it
    * arrives, in-order delivery per user (the [[attributionStream]]
    * contract, including the µs-precision Timestamp arithmetic that
    * keeps tiebreaks identical to the batch window). Downstream, a
    * plain update-mode count/sum aggregation over the emitted edges
    * maintains q95's (n, total_gap, max_gap) table and q302's
    * transition feed continuously — commutative aggregates, so state
    * equals the batch table after any prefix (StreamsSpec replays in
    * micro-batches). State is O(16 bytes) per user. */
  def transitionStream(events: Dataset[Event]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    def usOf(e: Event): Long =
      math.floorDiv(e.ts.getTime, 1000L) * 1000000L + e.ts.getNanos / 1000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEvent, Transition](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[LastEvent]) =>
          val sorted = it.toSeq.sortBy(e => (usOf(e), e.event_id))
          val out = Seq.newBuilder[Transition]
          var st = state.getOption.orNull
          for (e <- sorted) {
            val us = usOf(e)
            if (st != null)
              out += Transition(user, st.ty, e.event_type, us - st.us)
            st = LastEvent(us, e.event_type)
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  /** floor(log2(x)) for positive longs via the binary-string length —
    * identical in Spark and DuckDB (`length(bin(x)) - 1`), no libm;
    * non-positive inputs land in bucket 0. Shared by q310 and
    * [[gapHistogramStream]]. */
  def log2Bucket(c: Column): Column =
    when(c <= 0, 0L)
      .otherwise((length(bin(c)) - 1).cast("long"))

  /** Streaming twin of q310's log2-bucketed gap histograms: the
    * [[transitionStream]] edge feed aggregated to (pair, bucket)
    * counts in update mode. Bucket counts are commutative sums, so
    * after any prefix of the stream the state equals the batch
    * histogram of the transitions seen so far, bit-for-bit
    * (StreamsSpec replays in micro-batches). This is the exact-
    * parity representation q302's exact percentiles CANNOT have in
    * bounded state — the histogram trades factor-2 resolution for
    * O(|pairs| x 64) state, and q310 documents the resulting p90
    * bound semantics. */
  def gapHistogramStream(transitions: Dataset[Transition]): DataFrame =
    transitions.toDF()
      .groupBy(col("prev_type").as("src"), col("next_type").as("dst"),
        log2Bucket(col("gap_us")).as("bucket"))
      .agg(count(lit(1)).as("n"))

  /** Streaming twin of q281's eventually-follows MARGINALS: per
    * (user, event_type), the first and last stream position — encoded
    * as the lexicographic struct (ts, event_id), the same total order
    * the batch query's row_number ranks by, so marginal comparisons
    * are rank comparisons. min/max of a struct are commutative,
    * associative, single-valued aggregates, so an update-mode
    * streaming aggregation maintains the table exactly: after any
    * prefix of the stream the state equals the batch marginals of the
    * rows seen so far, bit-for-bit and batch-boundary-independent
    * (StreamsSpec replays in micro-batches and asserts parity after
    * every one — the [[fingerprintStream]] argument). State is
    * |users| x |types| rows regardless of stream length; the
    * quadratic pair step ([[eventuallyFollowsFromMarginals]]) runs
    * over the maintained state, never over history. */
  def followsMarginalsStream(events: DataFrame): DataFrame =
    events.select(col("user_id"), col("event_type"),
        struct(col("ts"), col("event_id")).as("k"))
      .groupBy("user_id", "event_type")
      .agg(min("k").as("first_k"), max("k").as("last_k"))

  /** Pair finisher over [[followsMarginalsStream]] state (batch or
    * snapshot): support of "some a precedes some b" per ordered type
    * pair — exactly q281's output columns, derived from marginals
    * alone. */
  def eventuallyFollowsFromMarginals(marginals: DataFrame): DataFrame = {
    val a = marginals.toDF("user_id", "a_type", "a_first", "a_last")
    val b = marginals.toDF("user_id", "b_type", "b_first", "b_last")
    a.join(b, Seq("user_id")).where(col("a_type") =!= col("b_type"))
      .groupBy("a_type", "b_type").agg(
        count(lit(1)).as("n_both"),
        sum(when(col("a_first") < col("b_last"), 1L).otherwise(0L))
          .as("support"))
      .withColumn("support_ppm", expr("(support * 1000000) DIV n_both"))
  }
}
