package graft.streaming

import java.sql.Timestamp

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{coalesce, col, count, count_distinct, expr, lag, levenshtein, lit, round, struct, substring, sum, when}
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

class StreamsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  private val events = Seq(
    Streams.Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
    Streams.Event(2, ts("2024-01-01 10:10:00"), 1, "click", 2.0),
    Streams.Event(3, ts("2024-01-01 11:30:00"), 1, "view", 3.0), // new session
    Streams.Event(4, ts("2024-01-01 10:05:00"), 2, "click", 4.0),
    Streams.Event(5, ts("2024-01-01 12:00:00"), 1, "view", 5.0)) // same session as 3

  test("tumbling window agg over a MemoryStream matches expectations") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streams.Event]
    mem.addData(events: _*)
    val q = Streams.tumblingCounts(mem.toDF(), "1 hour", "10 minutes")
      .writeStream.outputMode("complete")
      .format("memory").queryName("tumbling_out")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("tumbling_out")
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got == Map(
      ("2024-01-01 10:00:00.0", "click") -> 3L,
      ("2024-01-01 11:00:00.0", "view") -> 1L,
      ("2024-01-01 12:00:00.0", "view") -> 1L))
  }

  test("stateful sessionize emits closed sessions across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streams.Event]
    val q = Streams.sessionize(mem.toDS(), gapSeconds = 1800)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()
    // batch 1: user 1 first session + user 2
    mem.addData(events(0), events(1), events(3))
    q.processAllAvailable()
    // batch 2: user 1 jumps 80 min -> closes session 1
    mem.addData(events(2))
    q.processAllAvailable()
    // batch 3: 30 min later, same session continues -> nothing closes
    mem.addData(events(4))
    q.processAllAvailable()
    q.stop()
    val closed = spark.table("sessions_out").as[Streams.Session].collect()
    assert(closed.toSeq == Seq(
      Streams.Session(1, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00"), 2)))
  }

  test("sessionizeStream closes open sessions via event-time timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streams.Event]
    val q = Streams.sessionizeStream(mem.toDS(), gapSeconds = 1800,
        watermark = "0 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_to_out").start()
    // batch 1: user 1 session of two events; watermark after batch = 10:10
    mem.addData(events(0), events(1))
    q.processAllAvailable()
    // batch 2: an unrelated user far in the future pushes the watermark
    // past 10:10 + 30min — user 1's OPEN session must now time out and
    // emit, with no user-1 event ever closing it
    mem.addData(Streams.Event(99, ts("2024-01-01 23:00:00"), 7, "click", 0.0))
    q.processAllAvailable()
    // one more empty-ish advance so the timeout fires against the new watermark
    mem.addData(Streams.Event(100, ts("2024-01-01 23:59:00"), 7, "click", 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sessions_to_out").as[Streams.Session].collect()
      .filter(_.user_id == 1L).toSeq
    assert(got == Seq(
      Streams.Session(1, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00"), 2)),
      s"open session should emit on watermark passing last+gap, got $got")
  }

  test("streaming band join matches the batch band join on a replayed stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val bandEvents = Seq(
      Streams.Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      Streams.Event(2, ts("2024-01-01 10:20:00"), 1, "click", 2.0),  // pairs with 1
      Streams.Event(3, ts("2024-01-01 10:50:00"), 1, "view", 3.0),   // pairs with 2
      Streams.Event(4, ts("2024-01-01 10:10:00"), 2, "click", 4.0),
      Streams.Event(5, ts("2024-01-01 10:30:00"), 2, "click", 5.0),  // pairs with 4
      Streams.Event(6, ts("2024-01-01 13:00:00"), 1, "view", 6.0))   // too late for all
    val mem = MemoryStream[Streams.Event]
    val q = Streams.bandJoinStream(mem.toDF(), "user_id", "event_id",
        deltaSeconds = 3600, watermark = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("band_out").start()
    // micro-batches split in event-time order: nothing arrives behind
    // the watermark, so the streaming result must equal the batch twin
    mem.addData(bandEvents(0), bandEvents(1), bandEvents(3)) // up to 10:20
    q.processAllAvailable()
    mem.addData(bandEvents(4), bandEvents(2), bandEvents(5))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("band_out")
      .select("key", "id_1", "id_2").as[(Long, Long, Long)].collect().toSet
    // batch twin over the same events
    val batch = graft.operators.BandJoin.pairsWithin(
        bandEvents.toDS().toDF().select("user_id", "ts", "event_id"),
        "user_id", "ts", 3600L * 1000000L, Seq("event_id"))
      .select(col("user_id"), col("event_id_1"), col("event_id_2"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == batch)
    assert(got == Set((1L, 1L, 2L), (1L, 1L, 3L), (1L, 2L, 3L), (2L, 4L, 5L)))
  }

  test("checkpointed file stream processes drops incrementally") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("filestream").toString
    val drop1 = events.take(3)
    val drop2 = events.drop(3)
    drop1.toDS().toDF().coalesce(1).write.mode("append").parquet(dir)
    drop2.toDS().toDF().coalesce(1).write.mode("append").parquet(dir)
    val stream = Streams.fileStream(spark, dir,
      org.apache.spark.sql.Encoders.product[Streams.Event].schema)
    val q = Streams.tumblingCounts(stream, "1 hour", "10 minutes")
      .writeStream.outputMode("complete")
      .format("memory").queryName("file_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    // maxFilesPerTrigger=1 -> two micro-batches; complete mode converges
    // to the same totals as the batch aggregation
    val total = spark.table("file_out")
      .agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0)
    assert(total == events.size)
  }

  test("streaming dedup drops re-delivered events across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streams.Event]
    val q = Streams.dedupStream(mem.toDF(), "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    mem.addData(events(0), events(1))
    q.processAllAvailable()
    mem.addData(events(1), events(2)) // event 2 re-delivered
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_out").select("event_id")
      .as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L))
  }

  test("streaming decontamination matches the batch operator on a replayed corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val bench = docs.where(col("doc_id") % 19 === 0)
    val corpus = docs.where(col("doc_id") % 19 =!= 0)
    val benchGrams = bench.select(org.apache.spark.sql.functions.explode(
      graft.functions.TextExpressions.tokenNgrams(col("text"), 3)).as("gram"))
      .distinct()
    val want = graft.operators.TextAnalysis.decontaminate(
      corpus, bench, "doc_id", "text", n = 3, threshold = 0.05)
      .as[(Long, Long, Long, Double)].collect().toSet

    val mem = MemoryStream[(Long, String)]
    mem.addData(corpus.select("doc_id", "text").as[(Long, String)].collect(): _*)
    val q = Streams.decontaminateStream(
      mem.toDF().toDF("doc_id", "text"), benchGrams,
      "doc_id", "text", n = 3, threshold = 0.05)
      .writeStream.outputMode("complete")
      .format("memory").queryName("decon_out")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("decon_out")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("fingerprintStream state equals the batch fingerprint after every micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val orders = graft.Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
        col("o_totalprice").cast("decimal(18,2)").cast("string").as("pr"))
      .as[(Long, String, String)].collect()
    val cols = Seq(col("st"), col("pr"))
    val mem = MemoryStream[(Long, String, String)]
    val q = Streams.fingerprintStream(
      mem.toDF().toDF("k", "st", "pr"), col("k"), cols, nBuckets = 32)
    // default trigger (not AvailableNow: that would terminate before the
    // post-start addData calls below)
      .writeStream.outputMode("complete")
      .format("memory").queryName("fp_out")
      .start()
    // replay in 3 micro-batches; after EACH, state must equal the batch
    // fingerprint of the prefix seen so far (commutative aggregates ⇒
    // batch-boundary independence, the mergeability claim)
    val chunks = orders.grouped(math.max(1, orders.length / 3)).toSeq
    var seen = Vector.empty[(Long, String, String)]
    for (chunk <- chunks) {
      mem.addData(chunk: _*)
      q.processAllAvailable()
      seen = seen ++ chunk
      val want = graft.operators.Reconcile.fingerprint(
        seen.toDF("k", "st", "pr"), col("k"), cols, nBuckets = 32)
        .as[(Int, Long, Long)].collect().toSet
      val got = spark.table("fp_out").as[(Int, Long, Long)].collect().toSet
      assert(got == want, s"after ${seen.size} rows")
    }
    q.stop()
  }

  test("streaming LSH dedup finds the batch stream×corpus pairs on a replayed delta") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val corpus = docs.where(col("doc_id") % 10 =!= 0)
    val delta = docs.where(col("doc_id") % 10 === 0)
    val (k, bands, rpb) = (8, 4, 3)
    // batch truth, restricted to stream×corpus pairs (the stream path
    // does not self-pair the delta — see the operator doc)
    val deltaIds = delta.select("doc_id").as[Long].collect().toSet
    val allPairs: Set[(Long, Long)] = graft.operators.Dedup
      .incrementalLshCandidates(corpus, delta, "doc_id", "text", k, bands, rpb)
      .as[(Long, Long)].collect().toSet
    val want = allPairs.filter(p => deltaIds(p._1) ^ deltaIds(p._2))
    assert(want.nonEmpty)

    val index = Streams.corpusBucketIndex(corpus, "doc_id", "text", k, bands, rpb)
    val mem = MemoryStream[(Long, String)]
    val rows = delta.select("doc_id", "text").as[(Long, String)].collect()
    val (first, rest) = rows.splitAt(rows.length / 2)
    val q = Streams.lshDedupStream(mem.toDF().toDF("doc_id", "text"),
        index, "doc_id", "text", k, bands, rpb)
      .writeStream.outputMode("append")
      .format("memory").queryName("lsh_dedup_out").start()
    mem.addData(first: _*)
    q.processAllAvailable()
    mem.addData(rest: _*)
    q.processAllAvailable()
    q.stop()
    // at-least-once contract: collapse band-level repeats at the sink
    val got = spark.table("lsh_dedup_out").as[(Long, Long)].collect().toSet
    assert(got == want)
  }

  test("streaming edit join equals the batch incremental stream×corpus " +
      "slice on a replayed delta") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // same deterministic string recipe as LinkageSpec: short alphabet,
    // variable lengths, enough near-pairs at r = 2
    val rows = (1 to 240).map { i =>
      var h = i * 2654435761L
      def next(m: Int) = { h = h * 6364136223846793005L + 1442695040888963407L
        (math.abs(h >> 33) % m).toInt }
      val len = 1 + next(9)
      (i.toLong, (1 to len).map(_ => "abc"(next(3))).mkString)
    }
    val df = rows.toDF("id", "s").withColumn("blk", substring(col("s"), 1, 1))
    val corpus = df.where(col("id") % 3 =!= 0)
    val delta = df.where(col("id") % 3 === 0)
    val deltaIds = rows.map(_._1).filter(_ % 3 == 0).toSet
    val r = 2
    // batch truth (q342's operator), restricted to stream×corpus pairs
    // and DP-verified — the stream path does not self-pair the delta
    val want = graft.operators.Linkage
      .incrementalEditCandidates(corpus, delta, "id", "s", "blk", r)
      .withColumn("dist", levenshtein(col("s1"), col("s2"), r).cast("long"))
      .where(col("dist") >= 0)
      .select("id1", "id2", "dist").as[(Long, Long, Long)].collect().toSet
      .filter(p => deltaIds(p._1) ^ deltaIds(p._2))
    assert(want.nonEmpty)

    val index = Streams.editCorpusIndex(corpus, "id", "s", "blk", r)
    val mem = MemoryStream[(Long, String)]
    val drows = delta.select("id", "s").as[(Long, String)].collect()
    val (first, rest) = drows.splitAt(drows.length / 2)
    val q = Streams.editJoinStream(
        mem.toDF().toDF("id", "s")
          .withColumn("blk", substring(col("s"), 1, 1)),
        index, "id", "s", "blk", r)
      .writeStream.outputMode("append")
      .format("memory").queryName("edit_join_out").start()
    mem.addData(first: _*)
    q.processAllAvailable()
    mem.addData(rest: _*)
    q.processAllAvailable()
    q.stop()
    // at-least-once contract: collapse grid-key repeats at the sink
    val got = spark.table("edit_join_out")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("streaming collapsed edit join equals the batch stream×corpus " +
      "slice on a SATURATED replayed delta, and the dial picks it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // saturated domain: 240 rows over ~27 distinct 3-char strings —
    // the q342-at-100× shape the PassJoin twin pays replication for
    // (VERDICT r14 #5)
    val rows = (1 to 240).map { i =>
      var h = i * 2654435761L
      def next(m: Int) = { h = h * 6364136223846793005L + 1442695040888963407L
        (math.abs(h >> 33) % m).toInt }
      (i.toLong, (1 to 3).map(_ => "abc"(next(3))).mkString)
    }
    val df = rows.toDF("id", "s").withColumn("blk", substring(col("s"), 1, 1))
    val corpus = df.where(col("id") % 3 =!= 0)
    val delta = df.where(col("id") % 3 === 0)
    val deltaIds = rows.map(_._1).filter(_ % 3 == 0).toSet
    val r = 1
    val want = graft.operators.Linkage
      .incrementalEditCandidates(corpus, delta, "id", "s", "blk", r)
      .withColumn("dist", levenshtein(col("s1"), col("s2"), r).cast("long"))
      .where(col("dist") >= 0)
      .select("id1", "id2", "dist").as[(Long, Long, Long)].collect().toSet
      .filter(p => deltaIds(p._1) ^ deltaIds(p._2))
    assert(want.nonEmpty)
    // the corpus saturates, so the DIALED front door must route to
    // the collapsed twin — prove it by pinning the dial's inputs
    val pr = corpus.agg(count(lit(1)),
      count_distinct(struct(col("blk"), col("s")))).head()
    assert(graft.operators.Linkage.chooseCollapse(
      pr.getLong(0), pr.getLong(1)))
    val mem = MemoryStream[(Long, String)]
    val drows = delta.select("id", "s").as[(Long, String)].collect()
    val (first, rest) = drows.splitAt(drows.length / 2)
    val q = Streams.editJoinStreamDialed(
        mem.toDF().toDF("id", "s")
          .withColumn("blk", substring(col("s"), 1, 1)),
        corpus, "id", "s", "blk", r)
      .writeStream.outputMode("append")
      .format("memory").queryName("edit_join_collapsed_out").start()
    mem.addData(first: _*)
    q.processAllAvailable()
    mem.addData(rest: _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("edit_join_collapsed_out")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want)
    // and the dialed door on the GROWING-domain frame of the previous
    // test's recipe still equals its batch slice (PassJoin branch)
    val vrows = (1 to 240).map { i =>
      var h = i * 2654435761L
      def next(m: Int) = { h = h * 6364136223846793005L + 1442695040888963407L
        (math.abs(h >> 33) % m).toInt }
      val len = 1 + next(9)
      (i.toLong, (1 to len).map(_ => "abc"(next(3))).mkString)
    }
    val vdf = vrows.toDF("id", "s").withColumn("blk", substring(col("s"), 1, 1))
    val vCorpus = vdf.where(col("id") % 3 =!= 0)
    val vpr = vCorpus.agg(count(lit(1)),
      count_distinct(struct(col("blk"), col("s")))).head()
    assert(!graft.operators.Linkage.chooseCollapse(
      vpr.getLong(0), vpr.getLong(1)))
  }

  test("streaming boilerplate strip matches the batch operator on a replayed corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val hashes = graft.operators.Dedup.hotSegmentHashes(
      corpus, "doc_id", "text", segTokens = 10, maxDf = 2)
    assert(hashes.nonEmpty && hashes.sorted.toSeq == hashes.toSeq)
    val mem = MemoryStream[(Long, String)]
    mem.addData(corpus.as[(Long, String)].collect().toSeq: _*)
    val q = graft.streaming.Streams.stripBoilerplateStream(
        mem.toDF().toDF("doc_id", "text"), hashes, "doc_id", "text", 10)
      .writeStream.outputMode("append")
      .format("memory").queryName("strip_out")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("strip_out")
    val want = graft.operators.Dedup.stripBoilerplateSegments(
      corpus, "doc_id", "text", segTokens = 10, maxDf = 2)
    // exact probe: stream ≡ batch row-for-row, always
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("hotSegmentHashes: empty hot set strips nothing") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
    val hashes = graft.operators.Dedup.hotSegmentHashes(
      docs, "doc_id", "text", segTokens = 3, maxDf = 1)
    assert(hashes.isEmpty)
    val out = graft.streaming.Streams.stripBoilerplateStream(
        docs, hashes, "doc_id", "text", 3)
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(1L) == (("alpha beta", 1L, 1L, 0L)))
    assert(out(2L) == (("gamma delta", 1L, 1L, 0L)))
  }

  test("batch openSessions flushes the trailing session per user") {
    import spark.implicits._
    val open = Streams.openSessions(events.toDS(), gapSeconds = 1800)
      .collect().map(s => s.user_id -> s).toMap
    assert(open(1L).n_events == 2) // events 3 and 5
    assert(open(1L).session_start == ts("2024-01-01 11:30:00"))
    assert(open(2L).n_events == 1)
  }

  test("streaming retrieval against a static IVF index matches batch probeTopK") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val index = graft.operators.Ivf.buildIndex(emb, "vec_id", "embedding",
      nlist = 8)
    try {
      val queryRows = emb.where(col("vec_id") % 37 === 0)
        .select("vec_id", "embedding")
        .as[(Long, Array[Float])].collect().toSeq
      assert(queryRows.size >= 3)

      val expected = graft.operators.Ivf.probeTopK(
        emb.where(col("vec_id") % 37 === 0), index,
        "vec_id", "embedding", k = 3, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getInt(3))).toSet

      val mem = MemoryStream[(Long, Array[Float])]
      // two micro-batches: the static index serves both
      val (b1, b2) = queryRows.splitAt(queryRows.size / 2)
      val got = scala.collection.mutable.Set.empty[(Long, Long, Double, Int)]
      val q = Streams.retrieveStream(
          mem.toDF().toDF("vec_id", "embedding"), index,
          "vec_id", "embedding", nprobe = 2)
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          // per-batch ranking: each query's candidates are complete
          // within its own micro-batch
          got ++= graft.operators.Similarity.rankTopK(
            batch.select(col("query_id").as("id_a"),
              col("corpus_id").as("id_b"), col("cosine")), 3)
            .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
              r.getInt(3)))
          ()
        }
        .trigger(Trigger.AvailableNow())
      mem.addData(b1: _*)
      val run1 = q.start(); run1.processAllAvailable(); run1.stop()
      mem.addData(b2: _*)
      val run2 = q.start(); run2.processAllAvailable(); run2.stop()
      assert(got.toSet == expected,
        s"stream ${got.size} rows vs batch ${expected.size}")
    } finally index.unpersist()
  }

  test("ewmaStream matches the batch q126 formula across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 6 events for user 1 (exercises the full 5-lag buffer + the short-
    // history renormalization), 1 for user 2 (fresh state)
    val evs = (1 to 6).map(i => Streams.Event(i.toLong,
      ts(f"2024-01-01 10:0$i:00"), 1L, "click", i * 1.1)) :+
      Streams.Event(7L, ts("2024-01-01 10:00:30"), 2L, "view", 9.9)
    val mem = MemoryStream[Streams.Event]
    val q = Streams.ewmaStream(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("ewma_out").start()
    val (b1, b2) = evs.splitAt(3) // state must survive the batch boundary
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val got = spark.table("ewma_out").as[Streams.EwmaPoint].collect()
      .map(p => p.event_id -> p.ewma).toMap

    // batch twin: q126's exact expression over the same rows
    val batch = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      def ind(c: org.apache.spark.sql.Column) =
        when(c.isNull, lit(0.0)).otherwise(lit(1.0))
      val l = evs.toDF()
        .select(col("event_id"), col("user_id"), col("value").as("v0"),
          lag(col("value"), 1).over(w).as("v1"),
          lag(col("value"), 2).over(w).as("v2"),
          lag(col("value"), 3).over(w).as("v3"),
          lag(col("value"), 4).over(w).as("v4"))
      l.select(col("event_id"),
        round(((col("v0") + lit(0.5) * coalesce(col("v1"), lit(0.0)))
          + (lit(0.25) * coalesce(col("v2"), lit(0.0)))
          + (lit(0.125) * coalesce(col("v3"), lit(0.0)))
          + (lit(0.0625) * coalesce(col("v4"), lit(0.0)))) /
          (((lit(1.0) + lit(0.5) * ind(col("v1")))
            + (lit(0.25) * ind(col("v2")))
            + (lit(0.125) * ind(col("v3"))))
            + (lit(0.0625) * ind(col("v4")))), 6).as("ewma"))
        .as[(Long, Double)].collect().toMap
    }
    assert(got == batch) // bit-for-bit, not approximately
  }

  test("tvDriftStream converges to the batch TV once the corpus is replayed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      ("s1", "a"), ("s1", "a"), ("s1", "b"), ("s1", "c"),
      ("s2", "b"), ("s2", "d"), ("s2", "d"), ("s2", "d"))
      .map { case (s, t) => Streams.TokenRow(s, t) }
    val corpus = rows.groupBy(_.token).view.mapValues(_.size.toLong).toMap
    val cC = corpus.values.sum

    val mem = MemoryStream[Streams.TokenRow]
    val q = Streams.tvDriftStream(mem.toDS(), corpus)
      .writeStream.outputMode("append")
      .format("memory").queryName("drift_out").start()
    val (b1, b2) = rows.splitAt(3) // counts must survive the batch boundary
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()
    // final emission per source = highest running c_s
    val got = spark.table("drift_out").as[Streams.DriftPoint].collect()
      .groupBy(_.source).view.mapValues(_.maxBy(_.c_s)).toMap

    // driver-side batch twin with the operator's exact micro-unit math
    for ((src, grp) <- rows.groupBy(_.source)) {
      val counts = grp.groupBy(_.token).view.mapValues(_.size.toLong).toMap
      val cS = counts.values.sum
      val present = counts.map { case (t, cSt) =>
        math.abs(cSt * cC - corpus.getOrElse(t, 0L) * cS) }.sum
      // keysIterator, not keys: mapping the key SET to counts would
      // collapse equal counts before summing
      val covered = counts.keysIterator.map(t => corpus.getOrElse(t, 0L)).sum
      val num = present + (cC - covered) * cS
      val want = math.floor(
        num.toDouble / (2.0 * cS.toDouble * cC.toDouble) * 1000000.0).toLong
      assert(got(src).c_s == cS && got(src).tv_micro == want, s"$src")
    }
    // s1 saw both micro-batches: an interim emission must also exist
    assert(spark.table("drift_out").as[Streams.DriftPoint].collect()
      .count(_.source == "s1") == 2)
  }

  test("maintainAggStream state equals batch maintain after every micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val Mat = graft.operators.Materialize
    val base = graft.Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
    val drifted = base.where(col("k") % lit(131) =!= 0)
      .select(col("k"), col("st"),
        when(col("k") % lit(97) === 0, col("cents") + 100L)
          .otherwise(col("cents")).as("cents"))
      .unionByName(base.where(col("k") % lit(211) === 0)
        .select((col("k") + 100000000L).as("k"), lit("N").as("st"),
          col("cents")))
    // the feed: base snapshot as all-+1 rows (bootstrap), then the
    // snapshot-diff delta — replayed in micro-batches
    val bootstrap = base.select(col("st"), lit(1).as("__sign"), col("cents"))
      .as[(String, Int, Long)].collect()
    val delta = Mat.signedDelta(base, drifted, "k", Seq("st", "cents"))
      .select(col("st"), col("__sign"), col("cents"))
      .as[(String, Int, Long)].collect()
    assert(delta.nonEmpty)

    val mem = MemoryStream[(String, Int, Long)]
    val q = Streams.maintainAggStream(
      mem.toDF().toDF("st", "__sign", "cents"), "st", col("cents"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("mv_out")
      .start()
    // batch 1: bootstrap; batches 2..4: delta thirds
    val chunks = Seq(bootstrap) ++
      delta.grouped(math.max(1, delta.length / 3)).toSeq
    var seenDelta = Vector.empty[(String, Int, Long)]
    var first = true
    for (chunk <- chunks) {
      mem.addData(chunk: _*)
      q.processAllAvailable()
      if (!first) seenDelta = seenDelta ++ chunk
      first = false
      val want = Mat.maintain(Mat.groupedMv(base, "st", col("cents")),
        seenDelta.toDF("st", "__sign", "cents"), "st", col("cents"))
        .as[(String, Long, Long)].collect().toSet
      val got = spark.table("mv_out").as[(String, Long, Long)].collect().toSet
      assert(got == want, s"after ${seenDelta.size} delta rows")
    }
    // after the full feed the state equals the recompute over drifted
    val end = spark.table("mv_out").as[(String, Long, Long)].collect().toSet
    val recompute = Mat.groupedMv(drifted, "st", col("cents"))
      .as[(String, Long, Long)].collect().toSet
    assert(end == recompute)
    q.stop()
  }

  test("chunkNoveltyStream matches batch chunkContainment on a replayed batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val corpus = docs.where(col("doc_id") % 10 < 8)
    val batch = docs.where(col("doc_id") % 10 >= 8)

    import graft.operators.Dedup
    val want = Dedup.chunkContainment(
        Dedup.cdcChunks(batch, "doc_id", "text"),
        Dedup.cdcChunks(corpus, "doc_id", "text"), "doc_id")
      .as[(Long, Long, Long, Double)].collect().toSet

    val store = Dedup.chunkStoreHashes(corpus, "doc_id", "text")
    assert(store.length > 10)
    assert((store, store.sorted).zipped.forall(_ == _)) // probe contract

    val mem = MemoryStream[(Long, String)]
    mem.addData(batch.select("doc_id", "text").as[(Long, String)].collect(): _*)
    val q = Streams.chunkNoveltyStream(
        mem.toDF().toDF("doc_id", "text"), store, "doc_id", "text")
      .writeStream.outputMode("append")
      .format("memory").queryName("chunk_novelty_out")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("chunk_novelty_out")
      .as[(Long, Long, Long, Double)].collect().toSet
    // identical modulo md5-vs-xxhash64 store representation; on this
    // corpus there are no 64-bit collisions, so equality is exact
    assert(got == want)
    assert(got.exists(_._3 > 0), "want at least one seen chunk")
  }

  test("hllRegisterStream state equals batch registers after every micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type").as("g"), col("user_id").as("u"))
      .as[(String, Long)].collect()
    val mem = MemoryStream[(String, Long)]
    val q = Streams.hllRegisterStream(mem.toDF().toDF("g", "u"), "g", "u")
      .writeStream.outputMode("complete")
      .format("memory").queryName("hll_out")
      .start()
    val chunks = ev.grouped(math.max(1, ev.length / 3)).toSeq
    var seen = Vector.empty[(String, Long)]
    for (chunk <- chunks) {
      mem.addData(chunk: _*)
      q.processAllAvailable()
      seen = seen ++ chunk
      val want = graft.operators.Sketches.hllRegisters(
        seen.toDF("g", "u"), "g", "u")
        .as[(String, Long, Int)].collect().toSet
      val got = spark.table("hll_out").as[(String, Long, Int)].collect().toSet
      assert(got == want, s"after ${seen.size} rows")
    }
    q.stop()
  }

  test("streaming attribution matches the q199 batch window per purchase") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{last, unix_micros}
    val evDf = graft.Tables.events(spark, "/root/testdata/sf0.001")
    // batch per-purchase attribution: q199's internals at row grain
    val wo = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = evDf
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("tu", when(col("event_type").isin("view", "click"), col("us")))
      .withColumn("tt", when(col("event_type").isin("view", "click"),
        col("event_type")))
      .withColumn("lt_us", last(col("tu"), ignoreNulls = true).over(wo))
      .withColumn("lt_ty", last(col("tt"), ignoreNulls = true).over(wo))
      .where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        when(col("lt_us").isNotNull &&
          col("us") - col("lt_us") <= 604800000000L, col("lt_ty"))
          .otherwise("none").as("touch_type"))
      .as[Streams.Attribution].collect().toSet
    assert(want.nonEmpty)

    val evs = evDf
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Streams.Event].collect().sortBy(e => (e.ts.getTime, e.event_id))

    // batch-mode execution of the stateful twin
    val inBatch = Streams.attributionStream(evs.toSeq.toDS()).collect().toSet
    assert(inBatch == want)

    // micro-batched replay split at the time median: state must carry
    // the last touch across the batch boundary
    val cut = evs(evs.length / 2).ts.getTime
    val mem = MemoryStream[Streams.Event]
    val q = Streams.attributionStream(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("attr_out").start()
    mem.addData(evs.filter(_.ts.getTime < cut).toSeq: _*)
    q.processAllAvailable()
    mem.addData(evs.filter(_.ts.getTime >= cut).toSeq: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("attr_out")
      .as[Streams.Attribution].collect().toSet
    assert(streamed == want)
  }

  test("shotBoundaryStream matches the q232 batch summary after in-order replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val want = graft.SparkEntry.queries("q232_shot_boundaries")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(want.nonEmpty)
    val frames = graft.operators.Multimodal.frameSignatures(
        graft.operators.Multimodal.corpusFromDocuments(
          graft.Tables.documents(spark, sf)), stride = 4)
      .as[Streams.FrameSig].collect()
      .sortBy(f => (f.frame_idx, f.media_id)) // in-order per media
    val mem = MemoryStream[Streams.FrameSig]
    val q = Streams.shotBoundaryStream(mem.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("shots_out").start()
    // three micro-batches split by frame index — per-media order holds
    // across batches, the operator's stated delivery contract
    val (b1, rest) = frames.partition(_.frame_idx == 0)
    val (b2, b3) = rest.partition(_.frame_idx <= 2)
    for (b <- Seq(b1, b2, b3)) {
      mem.addData(b.toSeq: _*)
      q.processAllAvailable()
    }
    q.stop()
    // update mode: counters are monotone, so the max (n_frames, …)
    // struct per media IS its final state — no reliance on sink order
    val got = spark.table("shots_out")
      .groupBy("media_id")
      .agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.struct(
          "n_frames", "n_cuts", "n_shots", "sum_dist")).as("s"))
      .select(col("media_id"), col("s.n_frames"), col("s.n_cuts"),
        col("s.n_shots"), col("s.sum_dist"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("sprtStream matches the q256 batch decision after in-order replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val want = graft.SparkEntry.queries("q256_sprt_decision")(spark, sf)
      .as[(String, Long, Long, Long, String, Long)].collect().toSet
    assert(want.nonEmpty)
    val obs = graft.Tables.events(spark, sf)
      .select(col("event_type"), col("ts"), col("event_id"), col("value"))
      .as[Streams.SprtObs].collect()
      .sortBy(o => (o.ts.getTime, o.event_id)) // in-order per arm
    val mem = MemoryStream[Streams.SprtObs]
    val q = Streams.sprtStream(mem.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("sprt_out").start()
    val third = obs.length / 3
    for (b <- Seq(obs.take(third), obs.slice(third, 2 * third),
        obs.drop(2 * third))) {
      mem.addData(b.toSeq: _*)
      q.processAllAvailable()
    }
    q.stop()
    // update mode: n is monotone per arm, so the max-n row per arm is
    // its final status — no reliance on sink order
    val got = spark.table("sprt_out")
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.struct(
          "n", "cross_rk", "w_at_cross", "decision", "final_w")).as("s"))
      .select(col("event_type"), col("s.n"), col("s.cross_rk"),
        col("s.w_at_cross"), col("s.decision"), col("s.final_w"))
      .as[(String, Long, Long, Long, String, Long)].collect().toSet
    assert(got == want)
  }

  test("trailingP95Stream matches the q277 batch rows after in-order replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // sf0.001 has under 28 distinct days; replay sf0.01's daily series
    val sf = "/root/testdata/sf0.01"
    val want = graft.SparkEntry.queries("q277_trailing_p95")(spark, sf)
      .select(col("event_type"), expr("unix_date(d)"), col("p95_micro"))
      .as[(String, Long, Long)].collect().toSet
    assert(want.nonEmpty, "fixture has no full 28-day window")
    val days = graft.Tables.events(spark, sf)
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(sum((col("value").cast("decimal(18,6)") * 1000000)
        .cast("long")).as("y"))
      .select(col("event_type"), expr("unix_date(d)").as("ed"), col("y"))
      .as[Streams.DailyPoint].collect().sortBy(_.ed)
    val mem = MemoryStream[Streams.DailyPoint]
    val q = Streams.trailingP95Stream(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("p95_out").start()
    val third = days.length / 3
    for (b <- Seq(days.take(third), days.slice(third, 2 * third),
        days.drop(2 * third))) {
      mem.addData(b.toSeq: _*)
      q.processAllAvailable()
    }
    q.stop()
    val got = spark.table("p95_out")
      .as[(String, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("transitionStream edges aggregate to q95's batch transition table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val raw = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[Streams.Event].collect()
      // replay grouped by user so each user's events arrive in order
      // across micro-batches (the in-order delivery contract)
      .sortBy(e => (e.user_id, e.ts.getTime, e.event_id))
    val mem = MemoryStream[Streams.Event]
    val q = Streams.transitionStream(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("trans_out")
      .start()
    for (chunk <- raw.grouped(math.max(1, raw.length / 3))) {
      mem.addData(chunk.toSeq: _*)
      q.processAllAvailable()
    }
    q.stop()
    val got = spark.table("trans_out")
      .groupBy("prev_type", "next_type")
      .agg(expr("count(*)").as("n"), sum("gap_us").as("total_gap_us"),
        expr("max(gap_us)").as("max_gap_us"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val want = graft.SparkEntry.queries("q95_event_transitions")(
        spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("gapHistogramStream equals the batch q310 histogram per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val raw = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[Streams.Event].collect()
      .sortBy(e => (e.user_id, e.ts.getTime, e.event_id))
    val mem = MemoryStream[Streams.Event]
    val q = Streams.gapHistogramStream(
        Streams.transitionStream(mem.toDS()))
      .writeStream.outputMode("complete")
      .format("memory").queryName("gaphist_out")
      .start()
    var seen = Vector.empty[Streams.Event]
    for (chunk <- raw.grouped(math.max(1, raw.length / 3))) {
      mem.addData(chunk.toSeq: _*)
      q.processAllAvailable()
      seen = seen ++ chunk
      // batch truth over the prefix: per-user adjacent transitions
      val want = seen.groupBy(_.user_id).values.flatMap { es =>
        val s = es.sortBy(e => (e.ts.getTime * 1000 +
          e.ts.getNanos / 1000 % 1000, e.event_id))
        s.sliding(2).collect { case Seq(a, b) =>
          val gap = (b.ts.getTime - a.ts.getTime) * 1000 +
            (b.ts.getNanos - a.ts.getNanos) / 1000
          val bucket = if (gap <= 0) 0L
            else 63L - java.lang.Long.numberOfLeadingZeros(gap)
          (a.event_type, b.event_type, bucket)
        }
      }.toSeq.groupBy(identity).view.mapValues(_.size.toLong)
        .map { case ((s, d, b), n) => (s, d, b, n) }.toSet
      val got = spark.table("gaphist_out")
        .as[(String, String, Long, Long)].collect().toSet
      assert(got == want, s"after ${seen.size} events")
    }
    q.stop()
    // the final state equals the batch q310 per-bucket counts
    val batch = graft.SparkEntry.queries("q310_dfg_gap_hist")(
        spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    val fin = spark.table("gaphist_out")
      .as[(String, String, Long, Long)].collect().toSet
    assert(fin == batch)
    assert(fin.nonEmpty)
  }

  test("followsMarginalsStream equals batch marginals per micro-batch; finisher equals q281") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val raw = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[Streams.Event].collect()
    def marg(df: org.apache.spark.sql.DataFrame) =
      Streams.followsMarginalsStream(df)
    val mem = MemoryStream[Streams.Event]
    val q = marg(mem.toDF())
      .writeStream.outputMode("complete")
      .format("memory").queryName("follows_out")
      .start()
    val chunks = raw.grouped(math.max(1, raw.length / 3)).toSeq
    var seen = Vector.empty[Streams.Event]
    for (chunk <- chunks) {
      mem.addData(chunk: _*)
      q.processAllAvailable()
      seen = seen ++ chunk
      val want = marg(seen.toDF()).collect()
        .map(r => (r.getLong(0), r.getString(1),
          r.getStruct(2).toString, r.getStruct(3).toString)).toSet
      val got = spark.table("follows_out").collect()
        .map(r => (r.getLong(0), r.getString(1),
          r.getStruct(2).toString, r.getStruct(3).toString)).toSet
      assert(got == want, s"after ${seen.size} rows")
    }
    q.stop()
    // the pair finisher over the final state equals the batch q281
    val fromState = Streams
      .eventuallyFollowsFromMarginals(spark.table("follows_out"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val batch = graft.SparkEntry.queries("q281_eventually_follows")(
        spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(fromState == batch)
    assert(fromState.nonEmpty)
  }
}
