package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  * A warmup action runs first so JVM/classloader/codegen startup isn't
  * charged to whichever query happens to run first. */
object Bench {

  /** Per-query measurement: best-run seconds plus the task metrics of
    * that same run. `cpuNs` (executor CPU) and `gcMs` (JVM GC) make
    * stalled-vs-CPU-bound decidable from the artifact alone: a query
    * whose wall seconds dwarf its CPU seconds was waiting, not
    * computing. `load` is the 1-min system load average sampled when
    * the winning run STARTED — the per-query noise annotation
    * (VERDICT r14 #7). */
  final case class M(sec: Double, sr: Long, sw: Long, sp: Long,
                     in: Long, fs: Long, cpuNs: Long, gcMs: Long,
                     load: Double)

  /** The per-query NOISY predicate, pure so BenchHistorySpec can pin
    * it (VERDICT r14 #7: three rounds of headline numbers carried
    * visible box interference — q312's 6.0 s driver row vs 4.17 s
    * quiet detail at loadavg 5.5 — and adjudication needed the
    * builder's side detail each time). A measurement is flagged when
    * the load average at its winning run's start exceeds the
    * threshold: the record then self-identifies as contended, per
    * query, from the artifact alone. Sub-second rows are exempt —
    * interference that cannot move a number past 1 s is not worth an
    * annotation. */
  private[graft] def noisyShaped(sec: Double, load: Double,
                                 threshold: Double): Boolean =
    sec >= 1.0 && load > threshold

  /** Committed per-query history from the last `n` rounds' records:
    * short query key → seconds per round. Two record shapes merge per
    * round:
    *
    *  - `BENCH_r<N>.json` (driver): `parsed.queries` carries the
    *    top-110 slowest individually — the fast tail rides in "rest";
    *  - `bench_detail_r<N>*.json` (the committed full detail): EVERY
    *    query with ns precision — so the proportional stall gate sees
    *    the whole catalog, not just the headline bucket (a spike in a
    *    rest-bucketed query was previously invisible to it).
    *
    * `sfShort` filters rounds to the CURRENT scale factor (basename
    * compare, e.g. "sf0.1"): a run at a different SF must not be gated
    * against another scale's medians — larger-SF runs would re-measure
    * everything, smaller-SF stalls would hide. Records predating the sf
    * field (rounds ≤ 4) were all driver sf0.1 runs and are treated as
    * such. No matching rounds ⇒ empty history ⇒ byte gate only. Parse
    * failures degrade the same way. */
  private[graft] def loadHistory(dir: String = ".", n: Int = 3,
      sfShort: Option[String] = None): Map[String, Vector[Double]] = {
    import scala.jdk.CollectionConverters._
    import com.fasterxml.jackson.databind.JsonNode
    def base(s: String) =
      s.split('/').filter(_.nonEmpty).lastOption.getOrElse(s)
    def sfOk(node: JsonNode): Boolean = sfShort.forall { want =>
      val v = node.path("sf")
      if (v.isTextual) base(v.asText) == want else want == "sf0.1"
    }
    try {
      val rxDriver = "^BENCH_r(\\d+)\\.json$".r
      val rxDetail = "^bench_detail_r(\\d+)".r
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      def parse(p: java.nio.file.Path, detail: Boolean)
          : Option[Map[String, Double]] =
        try {
          val root = om.readTree(java.nio.file.Files.readString(p))
          val rec = if (detail) root else root.path("parsed")
          if (!sfOk(rec)) None
          else {
            val qs = rec.path("queries")
            if (!qs.isObject) None
            // negative values are the bench's error sentinels (-1.0 for
            // a failed query) — a failed round must not poison the
            // median a recovered query is gated against
            else Some(qs.fields().asScala.flatMap { e =>
              val sec =
                if (detail) {
                  val s = e.getValue.path("sec")
                  if (s.isNumber) Some(s.asDouble) else None
                } else if (e.getValue.isNumber) Some(e.getValue.asDouble)
                else None
              sec.filter(v => v >= 0 && e.getKey != "rest")
                .map(v => e.getKey.takeWhile(_ != '_') -> v)
            }.toMap)
          }
        } catch { case _: Throwable => None }
      val listed = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
        .iterator().asScala.toVector
      def byRound(rx: scala.util.matching.Regex): Map[Int, java.nio.file.Path] =
        listed.flatMap { p =>
          rx.findFirstMatchIn(p.getFileName.toString)
            .map(m => m.group(1).toInt -> p)
        }.groupBy(_._1).map { case (r, ps) =>
          // deterministic winner when several files match one round
          // (ADVICE r13 — Files.list order is filesystem-dependent):
          // shortest filename first, so the canonical
          // bench_detail_r<N>.json beats suffixed variants like
          // bench_detail_r<N>_builder.json; ties break lexicographically
          r -> ps.map(_._2).minBy { p =>
            val nm = p.getFileName.toString; (nm.length, nm)
          }
        }
      val drivers = byRound(rxDriver)
      val details = byRound(rxDetail)
      val perRound = (drivers.keySet ++ details.keySet).toVector.sorted
        .map { r =>
          // the detail record covers every query; driver entries fill in
          // only when no detail exists for that round
          val d = drivers.get(r).flatMap(parse(_, detail = false))
          val t = details.get(r).flatMap(parse(_, detail = true))
          (d, t) match {
            case (Some(a), Some(b)) => Some(a ++ b)
            case (a, b) => b.orElse(a)
          }
        }
        .collect { case Some(m) if m.nonEmpty => m }
        .takeRight(n)
      perRound.flatten.groupMap(_._1)(_._2)
        .view.mapValues(_.toVector).toMap
    } catch { case _: Throwable => Map.empty }
  }

  private[graft] def median(xs: Vector[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  /** The stall-arbitration predicate, pure so BenchHistorySpec can pin
    * it. A measurement is stall-shaped — re-measure once at the end of
    * the run, keep the min — when EITHER gate fires:
    *  - BYTE gate: seconds-long wall over trivial measured work
    *    (< 8 MB shuffle, < 64 MB file reads, zero spill) — a stalled
    *    light query;
    *  - PROPORTIONAL gate: wall above 3× the query's own committed
    *    three-round median, regardless of byte shape — the r10 q115
    *    case (41 s over 32 MB of shuffle vs a 3.5 s history) that the
    *    absolute byte gate structurally cannot see.
    * Genuinely-regressed queries re-measure once (harmless, min-kept)
    * and still land slow, so real slowdowns stay visible. */
  private[graft] def stallShaped(sec: Double, shuffleRead: Long,
                                 fsRead: Long, spilled: Long,
                                 histMedian: Option[Double]): Boolean = {
    val byteShaped = sec > 4.0 && shuffleRead < (8L << 20) &&
      fsRead < (64L << 20) && spilled == 0
    val propShaped = histMedian.exists(h => sec > math.max(4.0, 3.0 * h))
    byteShaped || propShaped
  }

  private def loadAvg: Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .getSystemLoadAverage

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    // Quiet-run discipline: a contended machine produces a record that
    // overstates the engine (round 10: +111 s of pure interference).
    // Wait — boundedly — for the load average to drop below a threshold
    // before measuring, and RECORD load before/after so a contended run
    // is self-identifying from the artifact alone.
    val loadThreshold = sys.env.getOrElse("SPARK_GRAFT_LOAD_MAX",
      math.max(4.0, cpus.toDouble / 4).toString).toDouble
    val quietWaitSec = sys.env.getOrElse("SPARK_GRAFT_QUIET_WAIT", "120").toInt
    var waited = 0
    while (loadAvg > loadThreshold && waited < quietWaitSec) {
      System.err.println(f"[bench] loadavg ${loadAvg}%.1f > " +
        f"$loadThreshold%.1f, waiting for quiet ($waited/$quietWaitSec s)")
      Thread.sleep(10000); waited += 10
    }
    val loadBefore = loadAvg
    val wallT0 = System.nanoTime()
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: touch every input table once + exercise codegen/shuffle
    Tables.lineitem(spark, sfDir).count()
    Tables.events(spark, sfDir).count()
    Tables.documents(spark, sfDir).count()
    Tables.embeddings(spark, sfDir).count()
    spark.range(1000000).selectExpr("sum(id % 7)").collect()
    // JIT-warm the vector kernels (DotProduct, BlockTopK, TopKAggregate)
    // on a small slice: the similarity queries run mid-bench and
    // measured ±3 s run-to-run while C2 compiled these loops mid-query
    val embWarm = Tables.embeddings(spark, sfDir).limit(256)
    graft.operators.Similarity.cosineTopK(embWarm, "vec_id", "embedding", 5).count()
    graft.operators.Similarity
      .cosineTopKBlocked(embWarm, "vec_id", "embedding", 5, blocks = 4).count()
    // JIT-warm the graph kernels (orientation joins, SortedIntersectCount)
    // on a toy graph — q83's first execution otherwise pays ~7 s of
    // C2 compilation mid-measurement
    locally {
      import spark.implicits._
      val warmEdges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
        .toDF("u", "v")
      graft.operators.Graph.triangleCount(warmEdges, "u", "v").count()
    }
    spark.catalog.clearCache()

    // Cumulative task-metric counters: the per-query deltas quantify the
    // scale story ("minimize shuffles") with measured bytes, not plan
    // reading. Listener delivery is async; the short post-query sleep
    // bounds attribution error to far below the numbers' use.
    val mSr = new java.util.concurrent.atomic.AtomicLong
    val mSw = new java.util.concurrent.atomic.AtomicLong
    val mSp = new java.util.concurrent.atomic.AtomicLong
    val mIn = new java.util.concurrent.atomic.AtomicLong
    val mCpu = new java.util.concurrent.atomic.AtomicLong // executor CPU, ns
    val mGc = new java.util.concurrent.atomic.AtomicLong  // JVM GC, ms
    // TaskMetrics' input_read counts CACHED-block reads too (a resident
    // localCheckpoint scanned 3× shows as 3× its in-memory size), so it
    // cannot distinguish "re-scans the source file per iteration" (the
    // scale-killer) from "iterates over resident blocks" (the fix).
    // Hadoop FileSystem statistics count actual file bytes — in local
    // mode all tasks share this JVM, so the delta per query is exact.
    def fsBytes: Long = {
      import scala.jdk.CollectionConverters._
      org.apache.hadoop.fs.FileSystem.getAllStatistics.asScala
        .map(_.getBytesRead).sum
    }
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) {
            mSr.addAndGet(m.shuffleReadMetrics.totalBytesRead)
            mSw.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            mSp.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
            mIn.addAndGet(m.inputMetrics.bytesRead)
            mCpu.addAndGet(m.executorCpuTime)
            mGc.addAndGet(m.jvmGCTime)
          }
        }
      })
    def snap() = (mSr.get, mSw.get, mSp.get, mIn.get, fsBytes,
      mCpu.get, mGc.get)

    // A failing query must surface as an error, not as a fast "success"
    // folded into the total — otherwise a regression that breaks a query
    // would IMPROVE the benchmark.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // Best-of-N per query (default 2): a single-shot bench cannot tell a
    // real regression from a one-off scheduler/GC/machine-load hiccup
    // (round 5 recorded a 10.3 s singleton on a 1.5 MB-shuffle query).
    // The MIN over runs is the noise-robust estimator for a deterministic
    // plan — variance is all additive interference. The reported
    // task-metric deltas come from the fastest run, so bytes and seconds
    // describe the same execution. Failed queries are not re-run.
    val reps = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt)
    // Local-iteration filter: comma-separated query-name prefixes. Unset
    // (the driver's case) = the whole catalog.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def measureBest(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        n: Int): M = {
      val runs = Iterator.range(0, n).takeWhile(_ =>
        !errors.contains(name)).map { _ =>
        val repLoad = loadAvg // the run's own noise context (r14 #7)
        val before = snap()
        val t0 = System.nanoTime()
        // noop sink: materializes EVERY output column (a count() would
        // let Catalyst prune computed columns and under-measure the
        // query)
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .linesIterator.take(1).mkString.take(200)
          System.err.println(s"[bench] $name FAILED: ${errors(name)}")
        }
        val elapsed = if (errors.contains(name)) -1.0
                      else (System.nanoTime() - t0) / 1e9
        Thread.sleep(150) // drain in-flight task-end events
        val after = snap()
        // Release the caches operators populate (packed blocks, LSH
        // indexes, IVF cells, …) — untimed, so each run is charged its
        // OWN cache build, storage doesn't accumulate across the bench,
        // and no run inherits a predecessor's warm cache.
        spark.catalog.clearCache()
        // clearCache only drops the SQL cache registry — localCheckpoint
        // blocks (every iterative graph op) live as persistent RDDs
        // outside it and otherwise accumulate across the 160-query run,
        // strangling execution memory for everything downstream
        // (measured: q115 12.0 s mid-bench vs 3.1 s isolated, and the
        // alphabetically-later q40 at 5.1 s vs 1.1 s isolated).
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        M(elapsed, after._1 - before._1, after._2 - before._2,
          after._3 - before._3, after._4 - before._4, after._5 - before._5,
          after._6 - before._6, after._7 - before._7, repLoad)
      }.toVector
      if (errors.contains(name)) M(-1.0, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0.0)
      else runs.minBy(_.sec)
    }
    val firstPass = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
      .map { case (name, fn) => name -> measureBest(name, fn, reps) }
    // Deferred spike arbitration: best-of-2 back-to-back reps cannot
    // outlive a SUSTAINED external stall (driver round 8 measured
    // q105_exact_corr — a 3-column groupBy with 552 B of shuffle — at
    // 18.8 s on BOTH reps, and 0.94 s under the identical harness once
    // the machine was quiet; a different query spikes each driver run).
    // A query whose best time is seconds long while its MEASURED work
    // is tiny (KBs of shuffle, MBs of file reads, zero spill) is
    // stalled, not slow — re-measure it once at the END of the run,
    // after the interference window has passed, and keep the faster
    // execution. Genuinely heavy queries never qualify: their byte
    // counters are commensurate with their seconds.
    //
    // The input gate is FS bytes (actual file reads), not TaskMetrics
    // input_read: input_read counts resident cached/localCheckpoint
    // blocks too, so an iterative op scanning an in-memory graph 20×
    // (q268: 636 MB input_read, ~20 MB of files) looked "heavy" to the
    // old gate and its environmental spikes escaped re-measurement.
    // Cost of the wider gate: a handful of genuinely CPU-bound queries
    // with no I/O footprint (the fused bootstrap q196) re-run once at
    // the end (~10-20 s per full bench); min-keeping makes that
    // harmless, and byte counters alone cannot distinguish pure-CPU
    // work from a stall.
    //
    // SECOND gate — PROPORTIONAL, from committed history: the byte gate
    // is absolute, so a moderate-shuffle iterative query stalled by
    // machine load escapes it (round 10: q115 at 41 s over 32 MB of
    // shuffle vs a 3.5 s three-round history — 12× its own record on
    // unchanged code). A query whose best time exceeds 3× the MEDIAN of
    // its last three committed driver records (BENCH_r*.json, loaded at
    // startup) is disproportionate regardless of its byte shape —
    // re-measure it once at the end and keep the faster execution. A
    // genuine regression re-measures once (harmless, min-kept) and
    // still lands slow, so real slowdowns stay visible; only transient
    // interference is filtered. New queries have no history and fall
    // back to the byte gate alone.
    val sfShort = sfDir.split('/').filter(_.nonEmpty).lastOption.getOrElse(sfDir)
    val history = loadHistory(sfShort = Some(sfShort))
    val results = firstPass.map { case (name, m) =>
      val histMed = history.get(name.takeWhile(_ != '_'))
        .filter(_.size >= 2).map(median)
      val shaped = !errors.contains(name) &&
        stallShaped(m.sec, m.sr, m.fs, m.sp, histMed)
      if (!shaped) name -> m
      else {
        val again = measureBest(name, SparkEntry.queries(name), 1)
        val why = histMed match {
          case Some(h) if m.sec > math.max(4.0, 3.0 * h) =>
            f"${m.sec}%.2f s vs 3-round median $h%.2f s"
          case _ => "small-byte stall shape"
        }
        if (again.sec >= 0 && again.sec < m.sec) {
          System.err.println(f"[bench] $name re-measured: ${m.sec}%.2f s " +
            f"(cpu ${m.cpuNs / 1e9}%.2f s, gc ${m.gcMs / 1e3}%.2f s) -> " +
            f"${again.sec}%.2f s (cpu ${again.cpuNs / 1e9}%.2f s); $why")
          name -> again
        } else {
          if (histMed.isDefined) System.err.println(
            f"[bench] $name confirmed slow on re-measure: ${m.sec}%.2f s, " +
              f"cpu ${m.cpuNs / 1e9}%.2f s, gc ${m.gcMs / 1e3}%.2f s; $why")
          name -> m
        }
      }
    }
    def jstr(s: String) = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    // Precision vs the driver's ~2000-char tail window: past ~140
    // queries even 2-decimal everywhere overflows, so sub-10s queries
    // print 1 decimal (±0.05 s — run-to-run noise is larger) and only
    // 10s+ outliers keep 2. Full ns precision lives in bench_detail
    // .json. Trailing ".0" is kept: the line must stay parseable JSON
    // with numeric values.
    def sec(v: Double) = if (v < 10) f"$v%.1f" else f"$v%.2f"
    val errJson = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, m) if m.sec >= 0 => m.sec }.sum
    val loadAfter = loadAvg
    val wallSec = (System.nanoTime() - wallT0) / 1e9
    // Run-context preamble on stderr: a contended record identifies
    // itself (loadavg before/after; wall minus sum-of-query = warmup +
    // harness + interference absorbed between queries).
    System.err.println(f"[bench] loadavg before=$loadBefore%.1f " +
      f"after=$loadAfter%.1f; wall=$wallSec%.1f s, sum-of-query=" +
      f"$total%.1f s, reps=$reps, waited-for-quiet=$waited s")
    // Full per-query detail (long names, ns precision, measured task
    // metrics incl. executor CPU and GC time — wall≫cpu ⇒ the query
    // was waiting, not computing) goes to a side file; stdout gets ONE
    // COMPACT line. The driver keeps only the last ~2000 chars of
    // output, so the parseable line must stay well under that — short
    // "qNN" keys + ms precision keep 70 queries near ~1 KB.
    // per-query noisy annotation (VERDICT r14 #7): flag measurements
    // whose winning run started under external load, so a contended
    // record adjudicates itself without the builder's quiet-box detail
    val noisyLoad = sys.env.getOrElse("SPARK_GRAFT_NOISY_LOAD", "4.0").toDouble
    val noisyQs = results.filter { case (n, m) =>
      !errors.contains(n) && noisyShaped(m.sec, m.load, noisyLoad) }
    val fullQs = results.map { case (k, m) =>
      s"\"" + k + "\":{\"sec\":" + m.sec + ",\"shuffle_read\":" + m.sr +
        ",\"shuffle_write\":" + m.sw + ",\"spilled\":" + m.sp +
        ",\"input_read\":" + m.in + ",\"fs_read\":" + m.fs +
        ",\"cpu_sec\":" + f"${m.cpuNs / 1e9}%.3f" +
        ",\"gc_sec\":" + f"${m.gcMs / 1e3}%.3f" +
        ",\"load\":" + f"${m.load}%.2f" +
        ",\"noisy\":" + noisyShaped(m.sec, m.load, noisyLoad) + "}"
    }.mkString("{", ",", "}")
    val runMeta = f""""load_before":$loadBefore%.2f,"load_after":$loadAfter%.2f,"wall_sec":$wallSec%.1f,"reps":$reps"""
    val full = s"""{"metric":"total","value":$total,"unit":"sec",$runMeta,"queries":$fullQs,"errors":$errJson,"sf":"$sfDir"}"""
    try {
      val p = java.nio.file.Paths.get("bench_detail.json")
      java.nio.file.Files.write(p, full.getBytes("UTF-8"))
      // Per-round committed copy (VERDICT r12 #6): the 3×-median
      // arbitration gate reads bench_detail_r<N>*.json history, so each
      // round must leave its own full-coverage detail or the gate's
      // window stops sliding. SPARK_GRAFT_ROUND is set by the builder's
      // bench invocation; driver runs (env unset) keep writing only
      // bench_detail.json, which the builder commits under the round
      // name.
      sys.env.get("SPARK_GRAFT_ROUND").filter(_.matches("\\d+")).foreach {
        r => java.nio.file.Files.write(
          java.nio.file.Paths.get(s"bench_detail_r$r.json"),
          full.getBytes("UTF-8"))
      }
    } catch { case _: Throwable => () }
    // Per-query keys at full catalog size no longer fit the driver's
    // ~2000-char tail window (162 queries measured 1767 chars). The
    // line lists failed queries plus the slowest `topN` individually —
    // the only timings that carry signal — and folds the fast tail
    // into one "rest" bucket (count + summed seconds). topN is
    // SELF-SIZING: start at 110 and shrink until the line fits 1615
    // chars — 85% of the ~1900-char window, i.e. a guaranteed >=15%
    // margin (measured r10: 336 queries at topN 110 → ~1380 chars, so
    // the loop is headroom against catalog growth, not a working
    // constraint). The COMPLETE per-query map with ns precision and
    // task metrics is always in bench_detail.json, committed every
    // round.
    val (errQs, okQs) = results.partition { case (n, _) => errors.contains(n) }
    def mkQs(topN: Int): String = {
      val keep = errQs ++ okQs.sortBy { case (n, m) => (-m.sec, n) }.take(topN)
      val keepSet = keep.map(_._1).toSet
      val rest = results.filterNot(r => keepSet(r._1))
      val shortKeys = keep.map { case (k, _) => k.takeWhile(_ != '_') }
      require(shortKeys.distinct.size == shortKeys.size,
        s"shortened bench keys collide: ${shortKeys.diff(shortKeys.distinct).distinct.mkString(",")}")
      val restEntry =
        if (rest.isEmpty) Nil
        else Seq("\"rest\":{\"n\":" + rest.size + ",\"sec\":" +
          sec(rest.map(_._2.sec).sum) + "}")
      (keep.sortBy(_._1).map { case (k, m) =>
        "\"" + k.takeWhile(_ != '_') + "\":" + sec(m.sec)
      } ++ restEntry).mkString("{", ",", "}")
    }
    // basename only ("sf0.1") — the driver wrapper records the full dir
    // itself, and every char here is headroom against its tail window.
    // "load" [before, after] makes a contended record self-identifying
    // from the metric line alone; "noisy" names the specific queries
    // whose winning run started under load > threshold (slowest 12 —
    // usually empty, so usually zero chars), each with that run's
    // loadavg.
    val noisyJson =
      if (noisyQs.isEmpty) ""
      else "\"noisy\":" + noisyQs.sortBy { case (_, m) => -m.sec }.take(12)
        .map { case (n, m) =>
          "\"" + n.takeWhile(_ != '_') + "\":" + f"${m.load}%.1f" }
        .mkString("{", ",", "},")
    def mkLine(qs: String, errs: String) =
      f"""{"metric":"total","value":${sec(total)},"unit":"sec","load":[$loadBefore%.1f,$loadAfter%.1f],$noisyJson"queries":$qs,"errors":$errs,"sf":"$sfShort"}"""
    // The driver json-parses the last ~2000 chars of raw stdout; an
    // over-long line silently truncates to parsed:null there. Degrade
    // in order: (1) full error messages at topN 110; (2) error NAMES
    // only (one broken table ⇒ dozens of failed queries × 200-char
    // messages); (3) shrink topN. A parseable line with fewer per-query
    // timings beats no metric line at all. Full messages are always in
    // bench_detail.json.
    val errNamesJson = errors.keys.map(k => s"${jstr(k)}:${jstr("failed")}")
      .mkString("{", ",", "}")
    val line = {
      val full = mkLine(mkQs(110), errJson)
      if (full.length <= 1615) full
      else Iterator.iterate(110)(_ - 10).takeWhile(_ >= 10)
        .map(n => mkLine(mkQs(n), errNamesJson))
        .find(_.length <= 1615)
        .getOrElse(mkLine(mkQs(10), errNamesJson))
    }
    // Capacity (not failure-mode) overflow now requires even topN=10
    // to blow the window — still fail loudly at dev time if it does.
    require(errors.nonEmpty || line.length <= 1615,
      s"bench metric line ${line.length} chars exceeds 85% of the " +
        "~1900-char driver tail window even at topN=10; shorten keys " +
        "or precision before adding queries")
    println(line)
    spark.stop()
  }
}
