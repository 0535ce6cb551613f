package graft

import graft.operators.{BandJoin, Dedup, Graph, Ivf, Similarity}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: measure the scale-path operators against their naive twins
  * on inflated inputs (results recorded in SCALING.md). The inflation
  * keeps per-key densities realistic: events are replicated with
  * distinct users and shifted ids, so hot-key structure is preserved
  * rather than amplified artificially. */
object ScaleStress {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mult = if (args.length > 1) args(1).toInt else 8
    val sections: Set[String] =
      if (args.length > 2) args(2).split(",").toSet
      else Set("band", "interval", "decon", "ann")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[${math.min(32, Runtime.getRuntime.availableProcessors())}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f s  $name ($n rows)")
    }

    if (sections("band")) {
    // --- band join: naive vs bucketed on mult x events (distinct users)
    val e0 = Tables.events(spark, sf).select("event_id", "user_id", "ts")
    val e = (0 until mult).map { i =>
      e0.select((col("event_id") + lit(i.toLong * 1000000000L)).as("event_id"),
        (col("user_id") + lit(i.toLong * 1000000)).as("user_id"), col("ts"))
    }.reduce(_ unionByName _).cache()
    println(s"events inflated: ${e.count()} rows")
    val delta = 3600L * 1000000L
    time("band naive")(
      BandJoin.pairsWithinNaive(e, "user_id", "ts", delta, Seq("event_id")).count())
    time("band bucketed")(
      BandJoin.pairsWithin(e, "user_id", "ts", delta, Seq("event_id")).count())
    // long-history variant: same users, each replica shifted +40 days —
    // per-key row count grows x mult while the Δ-bucket density stays
    // constant. This is where the naive per-key quadratic shows.
    val hot = (0 until mult).map { i =>
      e0.select((col("event_id") + lit(i.toLong * 1000000000L)).as("event_id"),
        col("user_id"),
        timestamp_micros(unix_micros(col("ts")) +
          lit(i.toLong * 40L * 86400L * 1000000L)).as("ts"))
    }.reduce(_ unionByName _).cache()
    println(s"long-history events: ${hot.count()} rows")
    time("band naive (long history)")(
      BandJoin.pairsWithinNaive(hot, "user_id", "ts", delta, Seq("event_id")).count())
    time("band bucketed (long history)")(
      BandJoin.pairsWithin(hot, "user_id", "ts", delta, Seq("event_id")).count())
    // single-hot-key variant: one key owns every row. The naive plan
    // sort-merges the whole key in ONE task (straggler); the bucketed
    // plan parallelizes over (key, Δ-bucket).
    val oneKey = (0 until 2).map { i =>
      e0.select((col("event_id") + lit(i.toLong * 1000000000L)).as("event_id"),
        lit(0L).as("user_id"),
        timestamp_micros(unix_micros(col("ts")) +
          lit(i.toLong * 40L * 86400L * 1000000L)).as("ts"))
    }.reduce(_ unionByName _).cache()
    println(s"single-hot-key events: ${oneKey.count()} rows")
    time("band naive (one hot key)")(
      BandJoin.pairsWithinNaive(oneKey, "user_id", "ts", delta, Seq("event_id")).count())
    time("band bucketed (one hot key)")(
      BandJoin.pairsWithin(oneKey, "user_id", "ts", delta, Seq("event_id")).count())
    e.unpersist(); hot.unpersist(); oneKey.unpersist()
    }

    if (sections("interval")) {
    // --- interval overlap: naive blocked join vs Δ-bucketed on a
    // long-history hot key (every replica same (supp, part) keys,
    // shifted +60 days: per-key rows grow × mult, bucket density flat)
    val li0 = Tables.lineitem(spark, sf).select(
      col("l_suppkey").as("k1"), col("l_partkey").as("k2"),
      col("l_orderkey").as("o"), col("l_linenumber").as("n"),
      col("l_shipdate").cast("timestamp").as("s"),
      expr("CAST(timestampadd(DAY, CAST(l_quantity AS INT), l_shipdate) AS TIMESTAMP)").as("e"))
    val li = (0 until mult).map { i =>
      li0.select(col("k1"), col("k2"),
        (col("o") + lit(i.toLong * 1000000000L)).as("o"), col("n"),
        timestamp_micros(unix_micros(col("s")) +
          lit(i.toLong * 60L * 86400L * 1000000L)).as("s"),
        timestamp_micros(unix_micros(col("e")) +
          lit(i.toLong * 60L * 86400L * 1000000L)).as("e"))
    }.reduce(_ unionByName _).cache()
    println(s"lineitem intervals: ${li.count()} rows")
    val maxLen = 50L * 86400L * 1000000L
    def naiveOverlap(df: DataFrame): DataFrame =
      graft.operators.IntervalJoin.overlapsSelfNaive(
        df, Seq("k1", "k2"), Seq("o", "n"), "s", "e", maxLen)
    time("interval naive")(naiveOverlap(li).count())
    time("interval bucketed")(graft.operators.IntervalJoin.overlapsSelf(
      li, Seq("k1", "k2"), Seq("o", "n"), "s", "e", maxLen).count())
    // hot-key variant: ONE (supp, part) key owns a 1-in-25 sample of the
    // inflated rows. The naive plan degenerates to a single-task n^2
    // same-key scan; the bucketed plan spreads (key, bucket) groups.
    val liHot = li.where(pmod(col("o"), lit(25)) === 0)
      .select(lit(0L).as("k1"), lit(0L).as("k2"),
        col("o"), col("n"), col("s"), col("e")).cache()
    println(s"hot-key intervals: ${liHot.count()} rows")
    time("interval naive (one hot key)")(naiveOverlap(liHot).count())
    time("interval bucketed (one hot key)")(graft.operators.IntervalJoin
      .overlapsSelf(liHot, Seq("k1", "k2"), Seq("o", "n"), "s", "e", maxLen)
      .count())
    liHot.unpersist()
    li.unpersist()

    }
    if (sections("decon")) {
    // --- decontamination: exact broadcast vs bloom prefilter, with the
    // benchmark side inflated × mult (the regime bloom exists for)
    val docs0 = Tables.documents(spark, sf)
    val corpus = docs0.where(pmod(col("doc_id"), lit(19)) =!= 0)
    val benchBig = (0 until mult).map { i =>
      docs0.where(pmod(col("doc_id"), lit(19)) === 0)
        .select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
          concat(col("text"), lit(s" tail$i")).as("text"))
    }.reduce(_ unionByName _).cache()
    println(s"benchmark docs: ${benchBig.count()} rows")
    time("decontaminate exact broadcast")(graft.operators.TextAnalysis
      .decontaminate(corpus, benchBig, "doc_id", "text", 3, 0.05).count())
    time("decontaminate bloom prefilter")(graft.operators.TextAnalysis
      .decontaminateBloom(corpus, benchBig, "doc_id", "text", 3, 0.05).count())
    benchBig.unpersist()
    }

    if (sections("curation")) {
    // --- end-to-end curation funnel at mult x the document corpus.
    // Replicas get distinct ids and a per-replica vowel rotation: a
    // character-level rewrite changes most 8-char shingles, so replicas
    // are DISTINCT documents to the Jaccard stage (a verbatim copy
    // would near-dup-collapse the whole corpus to one canonical per
    // template); replicas 5 apart share a rotation and stay near-dups,
    // leaving the dedup stages real work at every multiple.
    val d0 = Tables.documents(spark, sf).select("doc_id", "text")
    val vowels = "aeiou"
    val corpus = (0 until mult).map { i =>
      val rot = vowels.drop(i % 5) + vowels.take(i % 5)
      d0.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
        concat(translate(col("text"), vowels, rot), lit(s" tail$i")).as("text"))
    }.reduce(_ unionByName _).cache()
    val bench = d0.where(pmod(col("doc_id"), lit(19)) === 0)
    val nDocs = corpus.count()
    println(s"curation corpus: $nDocs docs")
    // dials sized to the corpus, not the sf0.01 defaults (measured
    // collapses with the defaults at 10x corpus — see SCALING.md):
    // near-dup via banded SimHash because template text from a 50-word
    // vocabulary is pairwise-similar EVERYWHERE at char-8-gram
    // granularity — set-overlap candidates explode (OOM at 8x even
    // df-capped), while hamming<=3 signature banding collides only on
    // near-identity; decontamination at word-5-grams/0.5 because
    // 3-gram overlap with a large eval set saturates on the same
    // vocabulary
    def run() = graft.pipeline.Curation.curate(corpus, "doc_id", "text",
      benchmark = Some(bench), nearDup = "simhash",
      deconN = 5, deconThreshold = 0.5)
    time("curation funnel (quality+dedup+decon+split)")(run().kept.count())
    time("curation chunks")(run().chunks.count())
    corpus.unpersist()
    }

    if (sections("layout")) {
    // --- bucketed layout: the repeated fact-fact join with and without
    // the write-time shuffle already paid. mult scales the fact side.
    val o0 = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val l0 = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"), col("l_extendedprice"))
    val l = (0 until mult).map { i =>
      l0.select(col("o_orderkey"), col("l_quantity"),
        (col("l_extendedprice") + lit(i.toDouble)).as("l_extendedprice"))
    }.reduce(_ unionByName _)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    time("fact join, plain shuffle")(
      o0.join(l, "o_orderkey").groupBy("o_custkey")
        .agg(sum("l_quantity")).count())
    time("bucketed write orders (one-off layout cost)") {
      graft.sources.Layout.writeBucketed(o0, "ss_orders_b", Seq("o_orderkey"), 32,
        sortCols = Seq("o_orderkey")); 1L
    }
    time("bucketed write lineitem (one-off layout cost)") {
      graft.sources.Layout.writeBucketed(l, "ss_lineitem_b", Seq("o_orderkey"), 32,
        sortCols = Seq("o_orderkey")); 1L
    }
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    time("fact join, co-located buckets (repeat cost)")(
      spark.table("ss_orders_b").join(spark.table("ss_lineitem_b"), "o_orderkey")
        .groupBy("o_custkey").agg(sum("l_quantity")).count())
    spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE IF EXISTS ss_orders_b")
    spark.sql("DROP TABLE IF EXISTS ss_lineitem_b")
    }

    if (sections("zorder")) {
    // --- multi-dimension file skipping: ts-range layout vs Z-order
    // (ts, user_id) under single- and two-dimension predicates.
    // Bytes = actual file bytes (FileSystem statistics, the Bench
    // meter), so row-group pruning inside touched files counts too.
    val ev0 = Tables.events(spark, sf).select("event_id", "ts", "user_id", "value")
    val ev = (0 until mult).map { i =>
      ev0.select((col("event_id") + lit(i.toLong * 1000000000L)).as("event_id"),
        col("ts"), (col("user_id") + lit(i.toLong * 1000000L)).as("user_id"),
        col("value"))
    }.reduce(_ unionByName _)
    println(s"events for layout: ${ev.count()} rows")
    def fsBytes: Long = {
      import scala.jdk.CollectionConverters._
      org.apache.hadoop.fs.FileSystem.getAllStatistics.asScala
        .map(_.getBytesRead).sum
    }
    val tsDir = java.nio.file.Files.createTempDirectory("ss_ts").toString
    val zDir = java.nio.file.Files.createTempDirectory("ss_z").toString
    time("write ts-range layout (64 files)") {
      graft.sources.Layout.writeRangeLayout(ev, tsDir, Seq("ts"), 64); 1L }
    time("write z-order(ts, user_id) layout (64 files)") {
      graft.sources.Layout.writeZOrder(ev, zDir, Seq("ts", "user_id"), 64); 1L }
    val bounds = ev.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))),
      max(col("user_id"))).head()
    val (tLo, tHi, uMax) = (bounds.getLong(0), bounds.getLong(1), bounds.getLong(2))
    val tCut = tLo + (tHi - tLo) / 16
    def scan(dir: String, pred: Column): Unit = {
      val before = fsBytes
      val n = spark.read.parquet(dir).where(pred).count()
      val mb = (fsBytes - before) / 1e6
      // files that actually CONTAIN matching rows — the deterministic
      // locality signal (byte counts on a warm local FS under-report)
      val touched = spark.read.parquet(dir).where(pred)
        .select(input_file_name()).distinct().count()
      println(f"  $mb%8.1f MB read, $touched%2d/64 files hold the $n matching rows")
    }
    for ((label, pred) <- Seq(
        ("ts window (1/16)", unix_micros(col("ts")) <= tCut),
        ("user slice (1/16)", col("user_id") <= uMax / 16),
        ("ts AND user", unix_micros(col("ts")) <= tCut &&
          col("user_id") <= uMax / 16))) {
      println(s"predicate: $label")
      print("  ts-range layout:"); scan(tsDir, pred)
      print("  z-order layout: "); scan(zDir, pred)
    }
    for (dir <- Seq(tsDir, zDir)) {
      val p = java.nio.file.Paths.get(dir)
      java.nio.file.Files.walk(p)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => java.nio.file.Files.delete(f))
    }
    }

    if (sections("graph")) {
    // --- triangle counting: naive a<b<c triple join vs the
    // degree-oriented adjacency-intersection operator, on the
    // co-purchase graph (mult scales the fact side feeding the graph)
    val li0 = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey")
    val li = (0 until mult).map { i =>
      li0.select((col("l_orderkey") + lit(i.toLong * 1000000000L)).as("l_orderkey"),
        col("l_partkey"))
    }.reduce(_ unionByName _)
    val edges = li.groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
      .where(size(col("parts")) >= 2)
      .select(explode(graft.functions.PairExpressions.pairArray(col("parts"))).as("p"))
      .select(col("p.id1").as("u"), col("p.id2").as("v"))
      .distinct().cache()
    println(s"graph edges: ${edges.count()}")
    time("triangles, adjacency-intersection operator")(
      graft.operators.Graph.triangleCount(edges, "u", "v")
        .select("n_triangles").head().getLong(0))
    time("triangles, naive triple join")(
      edges.as("e1")
        .join(edges.as("e2"), col("e2.u") === col("e1.v"))
        .join(edges.as("e3"),
          col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
        .count())
    edges.unpersist()
    }

    if (sections("pagerank")) {
    // --- iterative rank propagation: per-iteration shuffle join (the
    // naive spelling, edge set re-exchanged every round) vs the
    // resident-edges + broadcast-dialed-ranks operator. mult scales
    // the fact side feeding the graph.
    val li0 = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey")
    val li = (0 until mult).map { i =>
      li0.select((col("l_orderkey") + lit(i.toLong * 1000000000L)).as("l_orderkey"),
        (col("l_partkey") + lit(i.toLong * 1000000000L)).as("l_partkey"))
    }.reduce(_ unionByName _)
    val edges = li.groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
      .where(size(col("parts")) >= 2)
      .select(explode(graft.functions.PairExpressions.pairArray(col("parts"))).as("p"))
      .select(col("p.id1").as("u"), col("p.id2").as("v"))
      .distinct().cache()
    println(s"pagerank edges: ${edges.count()}")
    time("pagerank 3 iters, resident edges + broadcast ranks")(
      graft.operators.Graph.pageRankScaled(edges, "u", "v", 3)
        .agg(sum(col("rank_scaled"))).head().getLong(0))
    time("pagerank 3 iters, per-iteration shuffle join") {
      val sym = edges.unionByName(edges.select(col("v").as("u"), col("u").as("v")))
        .localCheckpoint(eager = false)
      val deg = sym.groupBy(col("u").as("id")).agg(count(lit(1)).as("deg"))
        .localCheckpoint(eager = false)
      val scale = 1000000000000L
      var rank = deg.select(col("id"), lit(scale).as("r"))
      for (_ <- 1 to 3) {
        val contrib = rank.join(deg, "id")
          .select(col("id").as("u"), expr("r DIV deg").as("c"))
          .join(sym, "u")
          .groupBy(col("v").as("id")).agg(sum(col("c")).as("s"))
        rank = deg.select(col("id")).join(contrib, Seq("id"), "left")
          .select(col("id"), (lit(15L * scale / 100L) +
            expr("85 * coalesce(s, 0L) DIV 100")).as("r"))
          .localCheckpoint(eager = false)
      }
      rank.agg(sum(col("r"))).head().getLong(0)
    }
    edges.unpersist()
    }

    if (sections("labelprop")) {
    // --- component labelling: bounded min-label propagation (the
    // oracle-checkable fixed-budget operator, q115) vs the
    // alternating-star fixpoint (true components, unknown rounds).
    // Star contraction converges in O(log² n) rounds regardless of
    // diameter; k-round propagation is k joins flat — cheaper when k
    // is small and the graph is short-diameter (co-purchase graphs
    // are), semantically different when it is not.
    val li0 = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey")
    val li = (0 until mult).map { i =>
      li0.select((col("l_orderkey") + lit(i.toLong * 1000000000L)).as("l_orderkey"),
        (col("l_partkey") + lit(i.toLong * 1000000000L)).as("l_partkey"))
    }.reduce(_ unionByName _)
    val edges = li.groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
      .where(size(col("parts")) >= 2)
      .select(explode(graft.functions.PairExpressions.pairArray(col("parts"))).as("p"))
      .select(col("p.id1").as("u"), col("p.id2").as("v"))
      .distinct().cache()
    println(s"labelprop edges: ${edges.count()}")
    time("label propagation, 4 bounded rounds")(
      graft.operators.Graph.labelPropagationMin(edges, "u", "v", 4)
        .agg(sum(col("label"))).head().getLong(0))
    time("connected components, star-contraction fixpoint")(
      graft.operators.Graph.connectedComponents(edges, "u", "v")
        .agg(sum(col("component"))).head().getLong(0))
    edges.unpersist()
    }

    if (sections("prefix")) {
    // --- global prefix quantities: single-partition window (the naive
    // Spark spelling) vs the two-pass range-partition form
    // (Sampling.systematicSample / Rank.globalRank). mult scales rows.
    val l0 = Tables.lineitem(spark, sf)
      .select((col("l_orderkey") * 10 + col("l_linenumber")).as("id"),
        (col("l_quantity").cast("long") + 1L).as("w"))
    val rows = (0 until mult).map { i =>
      l0.select((col("id") + lit(i.toLong * 100000000L)).as("id"), col("w"))
    }.reduce(_ unionByName _).cache()
    val n = rows.count()
    println(s"prefix rows: $n")
    val k = 1000
    import org.apache.spark.sql.expressions.Window
    time("weighted sample, single-partition global window") {
      val tot = rows.agg(sum(col("w"))).head().getLong(0)
      val step = tot / k
      rows.withColumn("cum", sum(col("w")).over(Window.orderBy("id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .where(expr(s"cum DIV ${step}L > (cum - w) DIV ${step}L")).count()
    }
    time("weighted sample, two-pass distributed prefix")(
      graft.operators.Sampling.systematicSample(rows, "id", "w", k).count())
    spark.catalog.clearCache()
    rows.cache(); rows.count()
    time("global rank, single-partition window")(
      rows.withColumn("rank", row_number().over(Window.orderBy("id")))
        .agg(max(col("rank").cast("long"))).head().getLong(0))
    time("global rank, two-pass distributed")(
      graft.operators.Rank.globalRank(rows, "rank", col("id"))
        .agg(max(col("rank").cast("long"))).head().getLong(0))
    rows.unpersist()
    }

    if (sections("reconcile")) {
    // --- snapshot reconciliation: full-row compare (every row crosses
    // the join) vs fingerprint + drill-down (2 x nBuckets fingerprint
    // rows cross; row movement ∝ drift). Sparse drift — the regime the
    // operator is FOR (dense drift degenerates both paths to a full
    // compare; see SCALING.md sizing rule).
    val o0 = Tables.orders(spark, sf).select(col("o_orderkey").as("k"),
      col("o_orderstatus").as("st"),
      col("o_totalprice").cast("decimal(18,2)").as("pr"))
    val aSnap = (0 until mult).map { i =>
      o0.select((col("k") + lit(i.toLong * 1000000000L)).as("k"),
        col("st"), col("pr"))
    }.reduce(_ unionByName _).cache()
    println(s"snapshot rows: ${aSnap.count()}")
    val bSnap = aSnap.where(pmod(col("k"), lit(20011)) =!= 0)
      .select(col("k"), col("st"),
        when(pmod(col("k"), lit(9973)) === 0,
          (col("pr") + lit(1).cast("decimal(18,2)")).cast("decimal(18,2)"))
          .otherwise(col("pr")).as("pr")).cache()
    bSnap.count()
    val rcols = Seq(col("k").cast("string"), col("st"),
      col("pr").cast("string"))
    val Rec = graft.operators.Reconcile
    time("full-outer row compare") {
      aSnap.select(col("k"), Rec.rowHash(rcols).as("ha"))
        .join(bSnap.select(col("k"), Rec.rowHash(rcols).as("hb")),
          Seq("k"), "full_outer")
        .where(not(col("ha") <=> col("hb"))).count()
    }
    time("fingerprint + drill-down (65536 buckets)")(
      Rec.drillDown(aSnap, bSnap, col("k"), "k", rcols, 65536).count())
    // maintained-state regime: fingerprints already exist (a periodic
    // job or Streams.fingerprintStream's state) — a comparison costs
    // the 2 x nBuckets-row diff plus drift-proportional drill-down only
    val faM = Rec.fingerprint(aSnap, col("k"), rcols, 65536)
      .localCheckpoint(true)
    val fbM = Rec.fingerprint(bSnap, col("k"), rcols, 65536)
      .localCheckpoint(true)
    time("diff + drill-down, maintained fingerprints")(
      Rec.drillDown(aSnap, bSnap, col("k"), "k", rcols, 65536,
        badBuckets = Some(Rec.diffFingerprints(faM, fbM))).count())
    aSnap.unpersist(); bSnap.unpersist()
    }

    if (sections("maintain")) {
    // --- incremental MV maintenance: recompute-from-scratch vs
    // delta-apply. The delta is PRE-MATERIALIZED (the CDC-feed regime
    // the operator is for — a warehouse batch hands you the changed
    // rows); the snapshot-diff derivation is timed separately since
    // it re-scans both snapshots and is the fallback path only.
    val om = Tables.orders(spark, sf).select(col("o_orderkey").as("k"),
      col("o_orderstatus").as("st"),
      (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
        .as("cents"))
    val aMv = (0 until mult).map { i =>
      om.select((col("k") + lit(i.toLong * 1000000000L)).as("k"),
        col("st"), col("cents"))
    }.reduce(_ unionByName _).cache()
    println(s"MV base rows: ${aMv.count()}")
    // sparse drift: ~0.03% of keys touched
    val bMv = aMv.where(pmod(col("k"), lit(20011)) =!= 0)
      .select(col("k"), col("st"),
        when(pmod(col("k"), lit(9973)) === 0, col("cents") + 100L)
          .otherwise(col("cents")).as("cents")).cache()
    bMv.count()
    val Mat = graft.operators.Materialize
    val mv0 = Mat.groupedMv(aMv, "st", col("cents")).localCheckpoint(true)
    val deltaM = Mat.signedDelta(aMv, bMv, "k", Seq("st", "cents"))
      .localCheckpoint(true)
    println(s"delta rows: ${deltaM.count()}")
    time("recompute grouped agg over full B")(
      Mat.groupedMv(bMv, "st", col("cents")).count())
    time("maintain MV from materialized delta")(
      Mat.maintain(mv0, deltaM, "st", col("cents")).count())
    time("snapshot-diff delta derivation (fallback path)")(
      Mat.signedDelta(aMv, bMv, "k", Seq("st", "cents")).count())
    aMv.unpersist(); bMv.unpersist()
    }

    if (sections("ann")) {
    // --- ANN: brute force vs LSH vs IVF on mult x embeddings
    // (replicas perturbed per-dimension so they are distinct vectors)
    val emb0 = Tables.embeddings(spark, sf)
    val emb = (0 until mult).map { i =>
      emb0.select((col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
        transform(col("embedding"),
          x => x * (lit(1.0f) + lit(i.toFloat / 100))).as("embedding"))
    }.reduce(_ unionByName _).cache()
    println(s"embeddings: ${emb.count()} rows")
    time("cosine brute force top-5")(
      Similarity.cosineTopK(emb, "vec_id", "embedding", 5).count())
    // planes auto-sized: ceil(log2(n/16)) = 10 at 16k vectors
    time("LSH top-5 (auto planes, 20 tables, 4 margin probes)")(
      Similarity.lshTopKAuto(emb, "vec_id", "embedding", 64, 5).count())
    // nlist ~ sqrt(n): candidate work per query ~ n * nprobe / nlist
    time("IVF top-5 (nlist 128, nprobe 8)")(
      Ivf.ivfTopK(emb, "vec_id", "embedding", 5, 128, 8).count())
    }

    if (sections("pq")) {
    // --- PQ-ADC serving vs exact brute force for the same query batch
    // on mult× embeddings: the quantized scan does 8 integer adds per
    // (corpus, query) pair through a broadcast LUT where the exact scan
    // does a 64-dim double dot; encode is the one-off index build.
    val emb0 = Tables.embeddings(spark, sf)
    val emb = (0 until mult).map { i =>
      emb0.select((col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
        transform(col("embedding"),
          x => x * (lit(1.0f) + lit(i.toFloat / 100))).as("embedding"))
    }.reduce(_ unionByName _).cache()
    val pred = pmod(col("vec_id"), lit(250L)) === 7
    println(s"embeddings: ${emb.count()} rows, " +
      s"queries: ${emb.where(pred).count()}")
    val enc = graft.operators.Pq.packCodes(
      graft.operators.Pq.encode(emb, "vec_id", "embedding"),
      partitions = spark.sparkContext.defaultParallelism * 4).cache()
    time("PQ encode + pack (8x16 codebook, index build)")(enc.count())
    time("exact retrieve top-5 (broadcast query batch, 64-dim dots)") {
      val c = emb.select(col("vec_id").cast("long").as("id_b"),
          transform(col("embedding"), x => x.cast("double")).as("vb"))
        .withColumn("nb", Similarity.norm(col("vb")))
      val q = emb.where(pred)
        .select(col("vec_id").cast("long").as("id_a"),
          transform(col("embedding"), x => x.cast("double")).as("va"))
        .withColumn("na", Similarity.norm(col("va")))
      Similarity.rankTopK(
        c.crossJoin(broadcast(q)).where(col("id_a") =!= col("id_b"))
          .withColumn("cosine", Similarity.dot(col("va"), col("vb"))
            / (col("na") * col("nb")))
          .select("id_a", "id_b", "cosine"), 5).count()
    }
    time("PQ-ADC top-5 (packed codes + broadcast LUT, prebuilt index)")(
      graft.operators.Pq.adcTopK(emb, "vec_id", "embedding",
        pred, 5, encoded = Some(enc)).count())
    enc.unpersist()
    emb.unpersist()
    }

    if (sections("chunks")) {
    // --- content-defined chunking + chunk-store containment at mult×
    // documents (each replica's text is prefixed so replica chunks
    // differ across groups while in-group chunk sharing is preserved)
    import graft.operators.Dedup
    val docs0 = Tables.documents(spark, sf)
    val docs = (0 until mult).map { i =>
      docs0.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
        concat(lit(s"v$i "), col("text")).as("text"))
    }.reduce(_ unionByName _).cache()
    println(s"documents: ${docs.count()} rows")
    time("cdcChunks (in-row boundaries, window 8, mod 64)")(
      Dedup.cdcChunks(docs, "doc_id", "text").count())
    val chunks = Dedup.cdcChunks(docs, "doc_id", "text").cache()
    chunks.count()
    val batchC = chunks.where(pmod(col("doc_id"), lit(10)) >= 8)
    val corpusC = chunks.where(pmod(col("doc_id"), lit(10)) < 8)
    time("chunkContainment, md5 hash join (batch 20% vs store 80%)")(
      Dedup.chunkContainment(batchC, corpusC, "doc_id").count())
    val corpusDocs = docs.where(pmod(col("doc_id"), lit(10)) < 8)
    var store: Array[Long] = null
    time("chunk store build (distinct xxhash64 → sorted driver array)") {
      store = Dedup.chunkStoreHashes(corpusDocs, "doc_id", "text")
      store.length.toLong
    }
    time("in-row store probe (stream shape: binary search, no join)")(
      graft.streaming.Streams.chunkNoveltyStream(
        docs.where(pmod(col("doc_id"), lit(10)) >= 8), store,
        "doc_id", "text").count())
    chunks.unpersist(); docs.unpersist()
    }

    if (sections("ahash")) {
    // --- perceptual-hash near-dup: banded vs quadratic at mult× image
    // corpora. Replica i of each image perturbs byte i+1 (a distinct
    // one-byte "re-encode"), so every replica group is a near-dup
    // cluster: candidate volume scales with TRUE pairs, not n².
    import graft.operators.{Dedup, Multimodal}
    val docs0 = Tables.documents(spark, sf)
    val media = (0 until mult).map { i =>
      Multimodal.corpusFromDocuments(
        docs0.select((col("doc_id") + lit(i.toLong * 3000000L)).as("doc_id"),
          concat(col("text").substr(lit(1), lit(i)), lit("~"),
            expr(s"substring(text, ${i + 2})")).as("text"),
          col("lang"), col("source"), col("n_chars")))
    }.reduce(_ unionByName _).where(col("kind") === "image")
    val sig = Multimodal.perceptualHash(media, target = 60).toDF()
      .select(col("media_id"), col("ahash").as("simhash")).cache()
    println(s"image signatures: ${sig.count()} rows")
    time("aHash pairs, pigeonhole banded (dist ≤ 3, 4×15-bit bands)")(
      Dedup.simhashPairsBanded(sig, "media_id", maxDist = 3, bits = 60).count())
    // the HammingJoinRewrite rule would silently band the "quadratic"
    // spelling too — disable it so the baseline measures the cartesian
    spark.conf.set(graft.plans.HammingJoinRewrite.ConfKey, "false")
    time("aHash pairs, quadratic baseline (same threshold, rule off)")(
      Dedup.simhashPairs(sig, "media_id", maxDist = 3).count())
    spark.conf.unset(graft.plans.HammingJoinRewrite.ConfKey)
    sig.unpersist()
    }

    if (sections("bootstrap")) {
    // --- Poisson-bootstrap replicate pass: composable hash60 chain vs
    // fused per-row weights expression vs the one-pass combiner
    // aggregate, on a mult×-inflated fact table (distinct row keys per
    // replica). B = 64 replicates throughout; all three paths are
    // draw-for-draw identical (PlannerSpec).
    import graft.operators.{Bootstrap, Sketches}
    val li0 = Tables.lineitem(spark, sf)
    val base = (0 until mult).map { i =>
      li0.select(col("l_returnflag").as("g"),
        concat(col("l_orderkey").cast("string"), lit(s"|$i|"),
          col("l_linenumber").cast("string")).as("key"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
    }.reduce(_ unionByName _).cache()
    println(s"bootstrap input: ${base.count()} rows × 64 replicates")
    time("replicate sums, composable (explode + hash60 per draw)")(
      base.withColumn("b", explode(sequence(lit(0), lit(63))))
        .withColumn("w", Bootstrap.poissonWeight(Sketches.hash60(
          concat(col("key"), lit("|"), col("b").cast("string")))))
        .where(col("w") > 0).groupBy("g", "b")
        .agg(sum(col("w") * col("cents")), sum(col("w"))).count())
    time("replicate sums, fused weights expression + explode")(
      base.select(col("g"), col("cents"),
          posexplode(graft.functions.BootstrapExpr.poissonWeights(
            col("key"), 64, Bootstrap.Thresholds)).as(Seq("b", "w")))
        .where(col("w") > 0).groupBy("g", "b")
        .agg(sum(col("w") * col("cents")), sum(col("w"))).count())
    time("replicate sums, one-pass combiner aggregate")(
      Bootstrap.replicateSums(base, 64).count())
    base.unpersist()
    }

    if (sections("loso")) {
    // --- LOSO data valuation: the q244 one-pass count-subtraction
    // form vs the naive per-source retrain loop (drop source s,
    // recount, rescore — 20 full corpus passes). Same numbers, same
    // eval slice; the one-pass form reads the corpus once.
    val docs0 = Tables.documents(spark, sf)
    val docs = (0 until mult).map { i =>
      docs0.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
        col("source"), col("text"))
    }.reduce(_ unionByName _)
    val hd = docs.select(col("doc_id"), col("source"), col("text"),
      (conv(substring(md5(concat(lit("s|"), col("doc_id").cast("string"))),
        1, 15), 16, 10).cast("long") % 16).as("h"))
    // corpus deliberately NOT cached: at warehouse scale nobody pins
    // the token explode — the naive loop pays it per source
    val tok = hd.select(col("source"), col("h"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .where(length(col("tok")) > 0)
    println(s"loso corpus tokens: ${tok.count()}")
    val tr = tok.where(col("h") < 8).select("source", "tok")
    val ev = tok.where(col("h") === 15).select("tok").cache()
    println(s"loso eval tokens: ${ev.count()}")
    val srcNames = tr.select("source").distinct()
      .collect().map(_.getString(0)).sorted
    time("LOSO influence, one-pass count subtraction (all sources)") {
      val c = tr.groupBy("tok").agg(count(lit(1)).as("c")).cache()
      val cs = tr.groupBy("source", "tok").agg(count(lit(1)).as("cs"))
      val t = c.agg(sum("c").as("t"), count(lit(1)).as("v"))
      val ts = cs.groupBy("source").agg(sum("cs").as("t_s"))
      val vmin = cs.join(c, "tok").groupBy("source")
        .agg(sum(when(col("c") === col("cs"), 1L).otherwise(0L))
          .as("v_gone"))
      val srcs = tr.select("source").distinct()
      val n = ev.crossJoin(broadcast(srcs))
        .join(c, Seq("tok"), "left")
        .join(cs, Seq("source", "tok"), "left")
        .crossJoin(broadcast(t))
        .join(broadcast(ts), "source").join(broadcast(vmin), "source")
        .groupBy("source")
        .agg((sum(length(bin(expr(
          "((t - t_s) + (v - v_gone)) DIV " +
            "(coalesce(c, 0) - coalesce(cs, 0) + 1)"))))
          - count(lit(1))).as("bits")).count()
      c.unpersist(blocking = false)
      n
    }
    time("LOSO influence, naive per-source retrain loop") {
      var total = 0L
      for (s0 <- srcNames) {
        val trs = tr.where(col("source") =!= s0)
        val c = trs.groupBy("tok").agg(count(lit(1)).as("c"))
        val t = c.agg(sum("c").as("t"), count(lit(1)).as("v"))
        total += ev.join(c, Seq("tok"), "left").crossJoin(broadcast(t))
          .agg((sum(length(bin(
            expr("(t + v) DIV (coalesce(c, 0) + 1)"))))
            - count(lit(1))).as("bits")).count()
      }
      total
    }
    tok.unpersist(blocking = false); ev.unpersist(blocking = false)
    }

    if (sections("spatial")) {
    // --- grid ε-join vs brute force. Base points from customer keys;
    // inflated set multiplies ids (fresh md5 coordinates per replica,
    // so density rises ×mult and per-cell occupancy with it — the
    // regime where the stencil join's candidate volume grows ~n²·ε²/W²
    // while the cross join grows n²).
    import graft.operators.Spatial
    val keys0 = Tables.customer(spark, sf).select(col("c_custkey"))
    val base = Spatial.derivePoints(keys0, "c_custkey").cache()
    println(s"spatial base points: ${base.count()}")
    time("eps pairs, brute force (base)")(
      Spatial.epsPairsNaive(base, 18).count())
    time("eps pairs, grid stencil (base)")(
      Spatial.epsPairs(base, 18).count())
    val big = Spatial.derivePoints(
      (0 until mult).map(i => keys0.select(
        (col("c_custkey") + lit(i.toLong * 10000000L)).as("c_custkey")))
        .reduce(_ unionByName _), "c_custkey").cache()
    println(s"spatial inflated points: ${big.count()}")
    time("eps pairs, grid stencil (inflated)")(
      Spatial.epsPairs(big, 18).count())
    // hot-cell regime: all points collapse into ONE ε-cell (mod-2^16
    // coordinates ⇒ max pairwise distance 92k < ε) — every pair IS a
    // result, so the n²/2 output is information-theoretic, not a plan
    // defect. The measurement documents that the stencil join degrades
    // to exactly output cost (one fat cell task); the FIX at corpus
    // scale is upstream density reduction (quantize/canopy dedup,
    // q60/q61) before pairing — same stance as LSH banding on a
    // template-saturated corpus.
    val hot = base.select(col("k"), pmod(col("x"), lit(1L << 16)).as("x"),
      pmod(col("y"), lit(1L << 16)).as("y")).cache()
    println(s"hot-cell points: ${hot.count()} (all within one ε-cell)")
    time("eps pairs, grid stencil (hot cell — output itself quadratic)")(
      Spatial.epsPairs(hot, 18).count())
    base.unpersist(); big.unpersist(); hot.unpersist()
    }

    if (sections("selection")) {
    // --- iterative selection ops on an inflated embedding corpus:
    // the claim under test is "cost = rounds × one cached scan" (plus
    // O(d) driver state), i.e. per-round time flat as rounds grow and
    // total time linear in corpus size, never quadratic.
    val emb0 = Tables.embeddings(spark, sf)
    val embBig = (0 until mult).map { i =>
      emb0.select((col("vec_id") + lit(i.toLong * 100000000L))
        .as("vec_id"), col("embedding"), col("label"))
    }.reduce(_ unionByName _).cache()
    println(s"embeddings inflated: ${embBig.count()} rows")
    time("k-center k=8 (base)")(
      Similarity.kCenterGonzalez(emb0, "vec_id", "embedding", 8).count())
    time("k-center k=8 (inflated)")(
      Similarity.kCenterGonzalez(embBig, "vec_id", "embedding", 8).count())
    time("k-center k=16 (inflated)")(
      Similarity.kCenterGonzalez(embBig, "vec_id", "embedding", 16).count())
    time("pca power 6 rounds (inflated)")(
      Similarity.pcaTopComponent(embBig, "vec_id", "embedding", 6).count())
    time("pca power 12 rounds (inflated)")(
      Similarity.pcaTopComponent(embBig, "vec_id", "embedding", 12).count())
    embBig.unpersist()
    // join-view maintenance: recompute vs maintain under sparse drift
    val oj = Tables.orders(spark, sf).select(col("o_orderkey").as("k"),
      col("o_custkey").as("ck"),
      (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
        .as("cents"))
    val aJ = (0 until mult).map { i =>
      oj.select((col("k") + lit(i.toLong * 1000000000L)).as("k"),
        col("ck"), col("cents"))
    }.reduce(_ unionByName _).cache()
    println(s"join-view base rows: ${aJ.count()}")
    val bJ = aJ.where(pmod(col("k"), lit(20011)) =!= 0)
      .select(col("k"), col("ck"),
        when(pmod(col("k"), lit(9973)) === 0, col("cents") + 100L)
          .otherwise(col("cents")).as("cents")).cache()
    bJ.count()
    val dimJ = Tables.customer(spark, sf)
      .select(col("c_custkey").as("ck"), col("c_mktsegment").as("mkt"))
    val Mat = graft.operators.Materialize
    val viewJ = aJ.join(dimJ, "ck")
      .select(col("k"), col("mkt"), col("cents")).localCheckpoint(true)
    val deltaJ = Mat.signedDelta(aJ, bJ, "k", Seq("ck", "cents"))
      .localCheckpoint(true)
    println(s"join-view delta rows: ${deltaJ.count()}")
    time("recompute join view over full B")(
      bJ.join(dimJ, "ck").select(col("k"), col("mkt"), col("cents"))
        .count())
    time("maintain join view from materialized delta")(
      Mat.maintainJoinView(viewJ, deltaJ, "k", dimJ, "ck").count())
    aJ.unpersist(); bJ.unpersist()
    }

    if (sections("seqstats")) {
    // --- sequence statistics (q281 eventually-follows / q284 Kendall):
    // the claim under test is the marginal-compression boundary.
    // Eventually-follows collapses each stream to |types| (min, max)
    // marginals BEFORE any pair logic, so it must stay ~linear whether
    // the corpus grows WIDE (more users) or LONG (longer streams).
    // Kendall's pair join is quadratic IN THE STREAM LENGTH by design
    // (bounded blocks); wide growth is linear, long growth is not —
    // that boundary is documented on the query, and measured here.
    import org.apache.spark.sql.expressions.Window
    val ev0 = Tables.events(spark, sf)
      .select("user_id", "event_type", "ts", "event_id")
    def wide(mlt: Int) = (0 until mlt).map { i =>
      ev0.select((col("user_id") + lit(i.toLong * 1000000L))
        .as("user_id"), col("event_type"),
        col("ts"), (col("event_id") + lit(i.toLong * 1000000000L))
          .as("event_id"))
    }.reduce(_ unionByName _)
    def long_(mlt: Int) = (0 until mlt).map { i =>
      ev0.select(col("user_id"), col("event_type"),
        timestamp_micros(unix_micros(col("ts")) +
          lit(i.toLong * 40L * 86400L * 1000000L)).as("ts"),
        (col("event_id") + lit(i.toLong * 1000000000L)).as("event_id"))
    }.reduce(_ unionByName _)
    def efollows(df: DataFrame): Long = {
      val m = df.select(col("user_id"), col("event_type"),
          struct(col("ts"), col("event_id")).as("k"))
        .groupBy("user_id", "event_type")
        .agg(min("k").as("first_k"), max("k").as("last_k"))
      val a = m.toDF("user_id", "a_type", "af", "al")
      val b = m.toDF("user_id", "b_type", "bf", "bl")
      a.join(b, Seq("user_id")).where(col("a_type") =!= col("b_type"))
        .groupBy("a_type", "b_type")
        .agg(sum(when(col("af") < col("bl"), 1L).otherwise(0L))
          .as("support")).count()
    }
    def kendall(df: DataFrame): Long = {
      val r = df.select(col("user_id"), col("event_id").as("vm"),
        row_number().over(Window.partitionBy("user_id")
          .orderBy("ts", "event_id")).as("rn"))
      val a = r.toDF("user_id", "va", "ra")
      val b = r.toDF("user_id", "vb", "rb")
      a.join(b, Seq("user_id")).where(col("ra") < col("rb"))
        .groupBy("user_id")
        .agg(sum(when(col("vb") > col("va"), 1L).otherwise(0L))
          .as("nc")).count()
    }
    val wBig = wide(mult).cache(); println(s"wide: ${wBig.count()} rows")
    val lBig = long_(mult).cache(); println(s"long: ${lBig.count()} rows")
    val base = ev0.cache(); base.count()
    time("eventually-follows (base)")(efollows(base))
    time("eventually-follows (wide xm)")(efollows(wBig))
    time("eventually-follows (long xm)")(efollows(lBig))
    time("kendall pairs (base)")(kendall(base))
    time("kendall pairs (wide xm)")(kendall(wBig))
    time("kendall pairs (long xm)")(kendall(lBig))
    base.unpersist(); wBig.unpersist(); lBig.unpersist()
    }

    if (sections("megacluster")) {
    // --- adversarial dedup corpus: the inputs the asymptotic prose
    // used to merely assert. ONE chained mega-cluster (every doc in a
    // single transitive-closure component whose weakest pair scores 0
    // — exactly the over-merge q313 exists to detect, and exactly the
    // input that makes naive within-cluster all-pairs quadratic) plus
    // ONE ubiquitous shingle family on every doc (df = corpus size,
    // the stop-shingle stress for the df-capped inverted index).
    val nChain = 150 * mult // mult=8 → 1200-doc mega-cluster
    val corpus = chainCorpus(spark, nChain,
      hotSuffix = Some(" the same trailing text everywhere")).cache()
    println(s"chain corpus: ${corpus.count()} docs, one expected mega-cluster")
    // q29's plan: the hot shingles exceed maxDf and generate no pairs;
    // candidate volume is governed by the chain's df<=4 block shingles
    time("ngram jaccard df-capped (hot shingle present)")(
      Dedup.ngramJaccard(corpus, "doc_id", "text", 8, 100, 0.3).count())
    // q30's plan: the mega-cluster collides into shared LSH buckets —
    // the in-bucket quadratic is LSH's known bound, measured here
    time("minhash LSH candidates (mega-cluster buckets)")(
      Dedup.minhashLshCandidates(corpus, "doc_id", "text", 8,
        bands = 4, rowsPerBand = 3).count())
    // q56's plan: transitive closure must converge to ONE component
    time("dedup clusters (chained closure)")(
      Graph.dedupClusters(corpus, "doc_id",
        Dedup.ngramJaccard(corpus, "doc_id", "text", 8, 100, 0.3),
        "id1", "id2").where(col("cluster") === 0L).count())
    // q313's audit: memberCap bounds pairing at cap·(cap−1)/2 per
    // cluster vs the naive nChain²/2 set intersections (the reported
    // row count is Σ n_pairs — the actual intersection volume)
    time("over-merge audit CAPPED (64)")(
      Dedup.clusterOverMergeAudit(corpus, "doc_id", "text", 8, 100, 0.3,
        memberCap = 64).agg(sum("n_pairs")).head().getLong(0))
    time("over-merge audit UNCAPPED (naive)")(
      Dedup.clusterOverMergeAudit(corpus, "doc_id", "text", 8, 100, 0.3,
        memberCap = Int.MaxValue).agg(sum("n_pairs")).head().getLong(0))
    corpus.unpersist()
    }

    if (sections("sf10x")) {
    // --- one more measured decade for the top-5 headline bench queries:
    // inflate the sf tables 10× the way a 10× scale-factor generator
    // would — NEW keys per replica, per-key density preserved — then
    // compare wall time and report the scaling exponent
    // log10(t_10x / t_1x). An exponent near 1 is linear scaling; the
    // 100 TB design claims want every headline query ≤ ~1.2 (some
    // superlinearity is inherent: shuffles sort, and 10× on a fixed
    // 32-thread box has no extra executors to spread onto, unlike a
    // real 10× cluster).
    val out = sys.props("java.io.tmpdir") + "/graft_sf10x"
    val reps = 10
    // lineitem: new orders AND new parts per replica — disjoint
    // co-purchase graph copies, the structure TPC-H SF growth produces
    // (more orders over more parts, constant per-order basket size)
    val li = Tables.lineitem(spark, sf)
    (0 until reps).map(i => li
        .withColumn("l_orderkey", col("l_orderkey") + lit(i * 1000000000L))
        .withColumn("l_partkey", col("l_partkey") + lit(i * 1000000000L)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    // documents: per-replica Caesar-translated text — each replica's
    // shingles live in a disjoint space, so the 10× corpus behaves as
    // 10 independent corpora of NEW documents (intra-replica near-dup
    // structure and per-shingle df preserved exactly), not as 10 copies
    // whose clusters merge into artificial mega-clusters
    val docs = Tables.documents(spark, sf)
    (0 until reps).map(i => docs
        .withColumn("doc_id", col("doc_id") + lit(i * 100000000L))
        .withColumn("text", caesarText(col("text"), i)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    // events: new users per replica on the same time axis — per-user
    // event density (what the DID mid-split and per-user aggregations
    // key on) is preserved
    val ev = Tables.events(spark, sf)
    (0 until reps).map(i => ev
        .withColumn("event_id", col("event_id") + lit(i * 1000000000L))
        .withColumn("user_id", col("user_id") + lit(i * 100000000L)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    println(s"10x tables written to $out")

    val headline = Seq("q115_cc_labelprop", "q179_cluster_size_hist",
      "q196_bootstrap_ci", "q225_lsh_dedup_eval", "q304_did_permutation")
    def measure(name: String, dir: String): Double = {
      val fn = SparkEntry.queries(name)
      // best-of-2, caches released between runs — the bench's protocol,
      // but with BLOCKING unpersist: an async drop of a multi-GB 10×
      // cache bleeds GC churn into the next measurement (observed: a
      // pure-CPU query at 8× its committed history right after a 10×
      // cache release)
      val ts = (0 until 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        t
      }
      ts.min
    }
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    // TWO PASSES, not interleaved scales: measure every query at sf0.1
    // while nothing 10×-sized has ever been cached, then every query at
    // 10× — so each pass's numbers share a memory/GC regime. One
    // query's failure must not lose the others (a 10× run on ONE JVM —
    // driver + all 32 executor threads — can hit memory walls a real
    // 10× cluster would not; run the probe with SPARK_DRIVER_MEM=24g,
    // per build.sbt).
    def pass(dir: String, tag: String): Map[String, Double] =
      headline.flatMap { n =>
        try Some(n -> measure(n, dir))
        catch {
          case e: Throwable =>
            println(s"$n [$tag] FAILED: " + Option(e.getMessage)
              .getOrElse(e.getClass.getName).linesIterator.take(1).mkString)
            spark.catalog.clearCache()
            spark.sparkContext.getPersistentRDDs.values
              .foreach(_.unpersist(blocking = true))
            None
        }
      }.toMap
    println(f"loadavg before sf0.1 pass: ${osBean.getSystemLoadAverage}%.1f")
    val base = pass(sf, "sf0.1")
    println(f"loadavg before 10x pass: ${osBean.getSystemLoadAverage}%.1f")
    val big = pass(out, "10x")
    headline.foreach { n =>
      (base.get(n), big.get(n)) match {
        case (Some(t1), Some(t10)) =>
          val expo = math.log(t10 / t1) / math.log(10.0)
          println(f"$n%-24s  sf0.1 $t1%7.2f s   10x $t10%7.2f s   exponent $expo%5.2f")
        case _ => ()
      }
    }
    }

    if (sections("sf1")) {
      // --- complete 10× dataset for the FULL-catalog second decade
      // (VERDICT r11 #5): the sf10x probe inflates only the three tables
      // its five headline queries read; running the whole 337-query
      // bench a decade up needs every table. Same inflation philosophy —
      // NEW keys per replica, per-key density preserved, referential
      // integrity kept WITHIN each replica (what a 10× TPC-H-style
      // generator produces) — extended to the remaining tables:
      //  - region/nation: fixed-size dimensions at every SF, copied as-is
      //    (TPC-H holds them constant across scale factors);
      //  - customer/supplier/part/orders: key-shifted replicas; orders
      //    shifts o_custkey and lineitem shifts l_partkey/l_suppkey by
      //    the SAME per-replica stride, so every FK resolves to exactly
      //    its own replica's dimension row and join fan-outs match real
      //    SF growth (10× facts joining one shared dim would inflate
      //    per-dim-key fan-out 10×, which SF growth does not do);
      //  - embeddings: vec_id-shifted replicas with the vector cyclically
      //    dim-rotated per replica (13·i positions, 13 coprime to 64 so
      //    all ten rotations are distinct). Rotation is an isometry:
      //    norms and all intra-replica cosines are preserved EXACTLY, so
      //    per-replica neighbor structure (what ANN recall is measured
      //    on) carries over, while cross-replica cosines decorrelate —
      //    the 10× corpus behaves as 10 independent vector sets, not as
      //    10 exact-duplicate neighbor groups that would turn every
      //    top-k list into copies of one vector.
      // Bench runs against the output via SPARK_GRAFT_SF_DIR (the
      // committed record is BENCH_sf1.json + bench_detail_sf1.json —
      // the detail filename deliberately does NOT match Bench
      // .loadHistory's bench_detail_r<N> pattern, and its "sf" field
      // differs, so sf0.1 stall gating never sees this record).
      val out = if (args.length > 3) args(3)
                else sys.props("java.io.tmpdir") + "/graft_sf1"
      val reps = 10
      val C = 1000000000L
      def rep(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
        (0 until reps).map(i => f(df, i)).reduce(_ unionByName _)
      def save(name: String, df: DataFrame): Unit =
        time(s"sf1 write $name") {
          df.write.mode("overwrite").parquet(s"$out/$name.parquet")
          spark.read.parquet(s"$out/$name.parquet").count()
        }
      save("region", Tables.region(spark, sf))
      save("nation", Tables.nation(spark, sf))
      save("customer", rep(Tables.customer(spark, sf))((d, i) =>
        d.withColumn("c_custkey", col("c_custkey") + lit(i * C))))
      save("supplier", rep(Tables.supplier(spark, sf))((d, i) =>
        d.withColumn("s_suppkey", col("s_suppkey") + lit(i * C))))
      save("part", rep(Tables.part(spark, sf))((d, i) =>
        d.withColumn("p_partkey", col("p_partkey") + lit(i * C))))
      save("orders", rep(Tables.orders(spark, sf))((d, i) =>
        d.withColumn("o_orderkey", col("o_orderkey") + lit(i * C))
          .withColumn("o_custkey", col("o_custkey") + lit(i * C))))
      save("lineitem", rep(Tables.lineitem(spark, sf))((d, i) =>
        d.withColumn("l_orderkey", col("l_orderkey") + lit(i * C))
          .withColumn("l_partkey", col("l_partkey") + lit(i * C))
          .withColumn("l_suppkey", col("l_suppkey") + lit(i * C))))
      save("events", rep(Tables.events(spark, sf))((d, i) =>
        d.withColumn("event_id", col("event_id") + lit(i * C))
          .withColumn("user_id", col("user_id") + lit(i * 100000000L))))
      save("documents", rep(Tables.documents(spark, sf))((d, i) =>
        d.withColumn("doc_id", col("doc_id") + lit(i * 100000000L))
          .withColumn("text", caesarText(col("text"), i))))
      save("embeddings", rep(Tables.embeddings(spark, sf))((d, i) => {
        val k = (i * 13) % 64
        val rotated =
          if (k == 0) col("embedding")
          else concat(slice(col("embedding"), k + 1, 64 - k),
                      slice(col("embedding"), 1, k))
        d.withColumn("vec_id", col("vec_id") + lit(i * 100000000L))
          .withColumn("embedding", rotated)
      }))
      println(s"sf1: complete 10x dataset at $out")
    }

    if (sections("hotband")) {
      // Adversarial hot-bucket band join (VERDICT r11 #4): ONE key with
      // n rows inside ONE Δ window — the Δ-bucket rewrite bounds the
      // candidate set per (key, bucket) but all ~n²/2 in-window pairs
      // still land on a single task at salt=1. The pair count is
      // SEMANTIC (they all qualify); salt is a parallelism dial, so the
      // fix shows as max-task-time (and wall) dropping ~linearly in
      // salt while the row count stays identical.
      val n = sys.env.getOrElse("SPARK_GRAFT_HOT_ROWS", "50000").toInt
      val delta = 3600L * 1000000L
      val t0us = 1700000000L * 1000000L
      val hot = spark.range(n).select(
        col("id").as("event_id"), lit(0L).as("user_id"),
        timestamp_micros(lit(t0us) + col("id") * lit(delta / n)).as("ts"))
      val bg = spark.range(1000000).select(
        (col("id") + lit(10000000L)).as("event_id"),
        (pmod(xxhash64(col("id")), lit(100000L)) + 1L).as("user_id"),
        timestamp_micros(lit(t0us) + pmod(xxhash64(col("id"), lit(7)),
          lit(delta))).as("ts"))
      val df = hot.unionByName(bg).cache()
      println(s"hot-bucket corpus: ${df.count()} rows ($n on the hot key)")
      val maxTaskMs = new java.util.concurrent.atomic.AtomicLong
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(
              t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
            maxTaskMs.updateAndGet(m => math.max(m, t.taskInfo.duration))
        })
      // Two traps stand between the salt dial and a bounded task, both
      // config-shaped rather than plan-shaped:
      //  1. AQE's byte-based partition coalescing: the salted join's
      //     shuffle BYTES are tiny (the inputs) while its per-row cost
      //     is huge (the n²/2 emitted pairs), so AQE sees "small
      //     shuffle" and merges the salt groups back into few reduce
      //     partitions — undoing the dial for a reason it cannot see.
      //  2. Reduce-partition hash collisions: `salt` groups hashed into
      //     ≈`salt` partitions put ~ln n/ln ln n groups on one task; the
      //     groups must land in MANY more partitions than there are
      //     salts. A real cluster runs thousands of shuffle partitions,
      //     so only the probe's 32-partition default needs the override.
      // Sweep all three configs so SCALING.md records the dial AND both
      // traps.
      val sweeps = Seq(
        ("defaults (AQE coalesce, 32 parts)", true, 32),
        ("coalesce off, 32 parts", false, 32),
        ("coalesce off, 256 parts", false, 256))
      // restore the values IN EFFECT before the sweep, not hard-coded
      // builder defaults — silently wrong for any later section if the
      // session builder changes (ADVICE r12)
      val savedCoalesce =
        spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
      val savedParts = spark.conf.get("spark.sql.shuffle.partitions")
      try sweeps.foreach { case (tag, coalesce, parts) =>
        spark.conf.set(
          "spark.sql.adaptive.coalescePartitions.enabled", coalesce)
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        Seq(1, 8, 32).foreach { s =>
          maxTaskMs.set(0)
          time(f"hot-bucket pairsWithin salt=$s%-2d [$tag]")(
            BandJoin.pairsWithin(df, "user_id", "ts", delta,
              Seq("event_id"), salt = s).count())
          Thread.sleep(200) // drain task-end events
          println(f"          max task ${maxTaskMs.get / 1e3}%.1f s")
        }
      } finally {
        spark.conf.set(
          "spark.sql.adaptive.coalescePartitions.enabled", savedCoalesce)
        spark.conf.set("spark.sql.shuffle.partitions", savedParts)
      }
      df.unpersist(blocking = true)
    }

    if (sections("pipeline")) {
      // End-to-end daily bank pipeline at volume (VERDICT r11 #2):
      // nDays synthetic days × rowsPerDay transactions (defaults: 30 ×
      // 1.6M ≈ 100× the fixture's per-day volume), run twice — the
      // reference's full-history-rescan mode vs the incremental dials
      // (rules 1/2 today-partition, rules 3/4 Δ-margin window). The
      // claim under test: incremental day cost is FLAT in N while
      // full-scan grows with accumulated history (the r11 `weak`).
      // Synthetic cards keep realistic per-card density (~4 txns/day);
      // 1% of rows land on seeded master cards so the enrichment joins
      // and mart appends exercise their real paths. Rules 3/4 only fire
      // for master cards (their enrichment joins are inner on the seed
      // chain), so the generator must produce their shapes ON those
      // cards: seeded rows take a hash-spread terminal (different cities
      // inside 1 h windows → rule 3 fires at volume), and each day
      // carries 40 crafted REJECT→REJECT→SUCCESS decreasing-amount
      // triples 36 min apart (> the 20-min span, so triples never chain
      // into each other) → rule 4 fires a deterministic 40/day. The
      // per-rule mart counts printed after each curve must be IDENTICAL
      // across modes for rules 3/4 — the probe shows the Δ-margin
      // rewrite exact at volume, not just on the fixture.
      import graft.bank.{Pipeline, Schemas, Seeds, Warehouse}
      val nDays = if (args.length > 3) args(3).toInt else 30
      val rowsPerDay = if (args.length > 4) args(4).toInt else 1600000
      val seed = Seeds.load(spark, "/root/reference/data/ddl_dml.sql")
      val seedCards = seed.cards.select("card_num").limit(20)
        .collect().map(_.getString(0)).toSeq // bounded: 20 master cards
      val nCards = math.max(1000L, rowsPerDay / 4L)
      val day0 = java.time.LocalDate.of(2022, 1, 1)
      def dayTxns(d: Int): DataFrame = {
        val dayStartUs = day0.plusDays(d.toLong).toEpochDay * 86400000000L
        val synth = concat(lit("SYN"),
          pmod(xxhash64(col("id"), lit(d)), lit(nCards)))
        val seeded = element_at(
          array(seedCards.map(lit(_)): _*),
          (pmod(xxhash64(col("id"), lit(d + 1)), lit(20L)) + 1).cast("int"))
        val isSeeded = pmod(col("id"), lit(100)) === 0
        val sampled = spark.range(rowsPerDay).select(
          concat(lit(s"tx${d}_"), col("id")).as("transaction_id"),
          timestamp_micros(lit(dayStartUs) +
            col("id") * lit(86400000000L / rowsPerDay)).as("transaction_date"),
          when(isSeeded, seeded).otherwise(synth).as("card_num"),
          lit("PAYMENT").as("oper_type"),
          (pmod(col("id"), lit(1000)) + 1).cast("decimal(10,2)").as("amount"),
          when(pmod(col("id"), lit(17)) === 0, lit("REJECT"))
            .otherwise(lit("SUCCESS")).as("oper_result"),
          // seeded (master-card) rows spread over all 100 terminals by
          // hash — id is a multiple of 100 here, so `id mod 100` would
          // pin them all to TS0/one city and rule 3 could never fire
          when(isSeeded,
            concat(lit("TS"), pmod(xxhash64(col("id"), lit(d + 3)), lit(100L))))
            .otherwise(concat(lit("TS"), pmod(col("id"), lit(100))))
            .as("terminal"))
        // 40 crafted rule-4 triples: k = triple index, j = position;
        // REJECT(900) → REJECT(600) → SUCCESS(300), 10 s apart, on a
        // fixed terminal (one city — the triple itself never adds a
        // rule-3 pair); triples 2160 s apart so chains can't span them
        val crafted = spark.range(120).select(
          concat(lit(s"cr${d}_"), col("id")).as("transaction_id"),
          timestamp_micros(lit(dayStartUs + 300000000L) +
            expr("id DIV 3") * lit(2160000000L) +
            pmod(col("id"), lit(3)) * lit(10000000L)).as("transaction_date"),
          element_at(array(seedCards.map(lit(_)): _*),
            (pmod(expr("id DIV 3"), lit(20L)) + 1).cast("int")).as("card_num"),
          lit("PAYMENT").as("oper_type"),
          (lit(900) - pmod(col("id"), lit(3)) * 300).cast("decimal(10,2)")
            .as("amount"),
          when(pmod(col("id"), lit(3)) < 2, lit("REJECT"))
            .otherwise(lit("SUCCESS")).as("oper_result"),
          lit("TS0").as("terminal"))
        sampled.unionByName(crafted)
      }
      val terminals = spark.range(100).select(
        concat(lit("TS"), col("id")).as("terminal_id"),
        lit("POS").as("terminal_type"),
        when(col("id") % 2 === 0, "Moscow").otherwise("Kazan")
          .as("terminal_city"),
        concat(lit("addr "), col("id")).as("terminal_address")).cache()
      val emptyBl = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        Schemas.factPassportBlacklist)
      def run(tag: String, inc12: Boolean, inc34: Boolean): Vector[Double] = {
        val root = java.nio.file.Files.createTempDirectory(s"pipescale_$tag")
        val wh = new Warehouse(spark, root.resolve("wh").toString)
        val pipe = new Pipeline(wh, seed, incrementalRules12 = inc12,
          incrementalRules34 = inc34)
        import scala.jdk.CollectionConverters._
        def gcMs: Long = java.lang.management.ManagementFactory
          .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
        val times = (0 until nDays).map { d =>
          val t0 = System.nanoTime(); val g0 = gcMs
          pipe.runDayStaged(dayTxns(d), emptyBl, terminals,
            java.sql.Date.valueOf(day0.plusDays(d.toLong)))
          // compact-behind EVERY table the day appended to, exactly like
          // the streaming daily drain (IngestStream.runDailyDrains) —
          // a first probe run that compacted only the fact left the
          // unpartitioned mart and meta audit accumulating 4 + 10 small
          // files per day, an O(N)-files read path no production cadence
          // would tolerate
          wh.compactIfFragmented(Pipeline.FactTransactions,
            Seq("txn_date"), maxFiles = 256)
          wh.compactIfFragmented(Pipeline.RepFraud, maxFiles = 64)
          wh.compactIfFragmented(Pipeline.MetaLoading, maxFiles = 64)
          val t = (System.nanoTime() - t0) / 1e9
          // per-day GC: decides environment-vs-structural growth from
          // the log alone (a day whose wall grows with flat GC is doing
          // more WORK; growing GC in one long-lived probe JVM is heap
          // aging, which a real per-day driver never accumulates)
          println(f"[$tag] day $d%2d: $t%7.2f s  (gc ${(gcMs - g0) / 1e3}%5.2f s)")
          t
        }.toVector
        println(s"[$tag] fact files: " +
          s"${wh.parquetFileCount(Pipeline.FactTransactions)}, " +
          s"mart files: ${wh.parquetFileCount(Pipeline.RepFraud)}, " +
          s"meta files: ${wh.parquetFileCount(Pipeline.MetaLoading)}, " +
          s"meta rows: ${wh.read(Pipeline.MetaLoading).count()}")
        // Per-rule mart counts: rules 1/2 totals legitimately differ
        // across modes (incremental12 is the sane each-hit-once variant
        // of the reference's re-report quirk — Pipeline.ruleFacts note);
        // rules 3/4 totals must be IDENTICAL in every mode — the Δ-margin
        // rewrite is exact, and the probe output shows it next to the
        // cost curves (full byte parity is IncrementalPipelineSpec's).
        wh.read(Pipeline.RepFraud).groupBy("event_type").count()
          .orderBy("event_type").collect() // bounded: 4 rule types
          .foreach(r => println(s"[$tag] mart ${r.get(0)}: ${r.get(1)}"))
        times
      }
      val modes = Seq(
        ("full-scan", false, false), // the reference's plan, O(history)
        ("inc12-only", true, false), // isolates rules 3/4's growth (r11 weak)
        ("incremental", true, true)) // both dials: the O(day) plan
      val curves = modes.map { case (tag, i12, i34) =>
        tag -> run(tag, i12, i34)
      }
      def mean(v: Seq[Double]) = v.sum / v.size
      curves.foreach { case (tag, ts) =>
        println(f"$tag%-11s days 1-3 ${mean(ts.slice(1, 4))}%6.2f s -> " +
          f"last 3 ${mean(ts.takeRight(3))}%6.2f s " +
          f"(x${mean(ts.takeRight(3)) / mean(ts.slice(1, 4))}%.2f)")
      }
    }

    if (sections("hotsalt")) {
      // --- VERDICT r13 #2 re-measure: the adversarial hot-key corpus
      // THROUGH Skew.saltedJoin (the r12 salt inversion was measured
      // and fixed on BandJoin; saltedJoin carried the same trap until
      // the round-14 pin). One key owns 75% of the big side; the
      // small side fans every key out ×16 and each joined pair pays a
      // banded edit-distance DP — the EXACT per-pair work of
      // saltedJoin's production call site (topKClosestPairs'
      // block-join fallback) — so the hot key's 3n/4 × 16 DPs land on
      // ONE task at salt=1 and must spread ~linearly with the dial.
      // Run under DEFAULT config (AQE coalescing on, 32 shuffle
      // partitions) — the exact regime that inverted r12.
      val n = sys.env.getOrElse("SPARK_GRAFT_HOT_ROWS", "1000000").toInt
      val big = spark.range(n).select(
        when(pmod(col("id"), lit(4L)) =!= 0, lit(0L))
          .otherwise(pmod(xxhash64(col("id")), lit(100000L)) + 1L).as("k"),
        md5(col("id").cast("string")).as("s1")).cache()
      val small = spark.range(100001L * 16).select(
        pmod(col("id"), lit(100001L)).as("k"),
        md5((col("id") + 7L).cast("string")).as("s2")).cache()
      println(s"hotsalt corpus: big ${big.count()} rows " +
        s"(${big.where(col("k") === 0).count()} on the hot key), " +
        s"small ${small.count()} rows")
      val maxTaskMs = new java.util.concurrent.atomic.AtomicLong
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(
              t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
            maxTaskMs.updateAndGet(m => math.max(m, t.taskInfo.duration))
        })
      Seq(1, 8, 32).foreach { s =>
        maxTaskMs.set(0)
        time(f"hotsalt saltedJoin salt=$s%-2d [defaults]")(
          graft.operators.Skew.saltedJoin(big, small, "k", salt = s)
            .select(levenshtein(col("s1"), col("s2"), 8).as("d"))
            .agg(coalesce(sum("d"), lit(0L))).head().getLong(0))
        Thread.sleep(200)
        println(f"          max task ${maxTaskMs.get / 1e3}%.1f s")
      }
      big.unpersist(blocking = true); small.unpersist(blocking = true)
    }

    if (sections("sf2")) {
      // --- THIRD decade (VERDICT r13 #5): 100× of the sf0.1 flagship
      // tables — events/part (q271/q341/q342/q340/q49) and embeddings
      // (q160) — with the BENCH_sf1 inflation philosophy: NEW keys per
      // replica, per-key density preserved, and p_name's value domain
      // deliberately UNCHANGED (its saturation is exactly what q49's
      // collapse stance exists for; a 100× part table still has ~1.6k
      // distinct (brand, initial, name) triples). Embeddings
      // decorrelate per replica by rotation (13·i mod 64) COMPOSED
      // with a per-replica ±1 diagonal (sign pattern from
      // xxhash64(i, dim)): both are isometries, so intra-replica norms
      // and cosines carry over EXACTLY, while cross-replica cosines
      // stay uncorrelated — the rotation alone would repeat after 64
      // replicas and hand every vector an exact duplicate, turning the
      // ANN truth set degenerate.
      val out = if (args.length > 3) args(3)
                else sys.props("java.io.tmpdir") + "/graft_sf2"
      val reps = 100
      val C = 1000000000L
      def rep(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
        (0 until reps).map(i => f(df, i)).reduce(_ unionByName _)
      def save(name: String, df: DataFrame): Unit =
        time(s"sf2 write $name") {
          df.write.mode("overwrite").parquet(s"$out/$name.parquet")
          spark.read.parquet(s"$out/$name.parquet").count()
        }
      save("part", rep(Tables.part(spark, sf))((d, i) =>
        d.withColumn("p_partkey", col("p_partkey") + lit(i * C))))
      save("events", rep(Tables.events(spark, sf))((d, i) =>
        d.withColumn("event_id", col("event_id") + lit(i * C))
          .withColumn("user_id", col("user_id") + lit(i * 100000000L))))
      save("embeddings", rep(Tables.embeddings(spark, sf))((d, i) => {
        val k = (i * 13) % 64
        val rotated =
          if (k == 0) col("embedding")
          else concat(slice(col("embedding"), k + 1, 64 - k),
                      slice(col("embedding"), 1, k))
        // ±1 diagonal: float negation is exact, type preserved
        val signed = transform(rotated, (x, j) =>
          when(pmod(xxhash64(lit(i), j), lit(2L)) === 0, x).otherwise(-x))
        d.withColumn("vec_id", col("vec_id") + lit(i * 100000000L))
          .withColumn("embedding", signed)
      }))
      // documents (VERDICT r14 #6 — the text/dedup family's third
      // decade): replica-decorrelated text via the per-replica affine
      // character bijection (see caesarText — 100 distinct bijections,
      // so no cross-replica exact duplicates), shingle structure and
      // per-replica df preserved exactly
      save("documents", rep(Tables.documents(spark, sf))((d, i) =>
        d.withColumn("doc_id", col("doc_id") + lit(i * 100000000L))
          .withColumn("text", caesarText(col("text"), i))))
      println(s"sf2: 100x flagship tables at $out")
    }

    if (sections("ivfdial")) {
      // --- VERDICT r13 #1 (the round's one `weak`): the old dial
      // nprobe = max(16, nlist/8) floors the probed FRACTION at 1/8 —
      // Θ(n²/8) candidate work at every scale; the new dial
      // nprobe = max(16, bitlen(n)) decouples nprobe from nlist so the
      // fraction falls as log n/√n. For each input dir (sf + extra
      // args beyond position 3), measure BOTH dials on the same
      // deterministic index: total candidate volume (the scale
      // driver), wall of the full self-search, and recall@5 against
      // the exact truth on the deterministic query sample
      // vec_id % 37 = 0 (the q225 treatment: truth measured, not
      // assumed).
      import graft.operators.Similarity.dot
      // dev knobs for targeted re-runs: LEGS picks which dials run
      // (old/new/ma2, comma-separated; default all), MA_NPROBE
      // overrides the multi-assigned leg's nprobe (budget-matching
      // probes)
      val legs = sys.env.getOrElse("SPARK_GRAFT_IVF_LEGS", "old,new,ma2")
        .split(",").map(_.trim).toSet
      val dirs = (Seq(sf) ++ args.drop(3)).distinct
      dirs.foreach { dir =>
        val emb = Tables.embeddings(spark, dir)
        val n = emb.count()
        val (nlist, nprobeNew) = Ivf.detDial(n)
        val nprobeOld = math.max(16, nlist / 8)
        val nprobeMa = sys.env.get("SPARK_GRAFT_IVF_MA_NPROBE")
          .map(_.toInt).getOrElse(nprobeNew)
        val index = Ivf.buildIndexDeterministic(
          emb, "vec_id", "embedding", nlist)
        val sizes = index.indexed.groupBy("cell")
          .agg(count(lit(1)).as("cnt")).cache()
        def cand(np: Int): Long = index.indexed
          .select(explode(Ivf.probeCellsFused(col("v"), index, np)).as("cell"))
          .join(sizes, "cell")
          .agg(coalesce(sum("cnt"), lit(0L))).head().getLong(0)
        // exact truth for the sampled queries: one corpus scan against
        // the broadcast sample, bounded top-k aggregation
        val qs = index.indexed.where(pmod(col("id"), lit(37L)) === 0)
          .select(col("id").as("id_a"), col("v").as("va"),
            col("nrm").as("na"))
        val cs = index.indexed.select(col("id").as("id_b"),
          col("v").as("vb"), col("nrm").as("nb"))
        val truth = Similarity.rankTopK(
            cs.crossJoin(broadcast(qs))
              .where(col("id_a") =!= col("id_b"))
              .withColumn("cosine",
                dot(col("va"), col("vb")) / (col("na") * col("nb")))
              .select("id_a", "id_b", "cosine"), 5)
          .select("id_a", "id_b").cache()
        val nTruth = truth.count()
        Seq("old" -> nprobeOld, "new" -> nprobeNew)
          .filter(t => legs(t._1)).foreach {
          case (tag, np) =>
            val t0 = System.nanoTime()
            val res = Ivf.probeTopK(
                index.indexed.select(col("id"), col("v")), index,
                "id", "v", k = 5, nprobe = np, excludeSelf = true)
              .select("id_a", "id_b").cache()
            val rows = res.count()
            val wall = (System.nanoTime() - t0) / 1e9
            val hit = truth.join(res, Seq("id_a", "id_b")).count()
            println(f"ivfdial $dir n=$n nlist=$nlist $tag%-3s nprobe=$np%-3d " +
              f"frac=${np.toDouble / nlist}%.4f cand=${cand(np)}%,d " +
              f"wall=$wall%7.2f s recall@5=${hit.toDouble / nTruth}%.3f " +
              f"($hit/$nTruth) rows=$rows")
            res.unpersist()
        }
        // the MULTI-ASSIGNED variant of the new dial: each corpus
        // vector indexed into its 2 nearest cells (constant ×2 on the
        // candidate volume, still Θ(n^1.5 log n)) — the boundary-miss
        // fix, measured against the same truth
        if (legs("ma2")) {
          val index2 = Ivf.buildIndexDeterministic(
            emb, "vec_id", "embedding", nlist, assign = 2)
          val t0 = System.nanoTime()
          val res2 = Ivf.probeTopK(
              emb.select(col("vec_id"), col("embedding")), index2,
              "vec_id", "embedding", k = 5, nprobe = nprobeMa,
              excludeSelf = true, distinctCandidates = true)
            .select("id_a", "id_b").cache()
          val rows2 = res2.count()
          val wall2 = (System.nanoTime() - t0) / 1e9
          val sizes2 = index2.indexed.groupBy("cell")
            .agg(count(lit(1)).as("cnt"))
          val cand2 = index2.indexed.select(col("id"), col("v"))
            .dropDuplicates("id")
            .select(explode(
              Ivf.probeCellsFused(col("v"), index2, nprobeMa)).as("cell"))
            .join(sizes2, "cell")
            .agg(coalesce(sum("cnt"), lit(0L))).head().getLong(0)
          val hit2 = truth.join(res2, Seq("id_a", "id_b")).count()
          println(f"ivfdial $dir n=$n nlist=$nlist ma2 nprobe=$nprobeMa%-3d " +
            f"frac=${nprobeMa.toDouble / nlist}%.4f cand=$cand2%,d " +
            f"wall=$wall2%7.2f s recall@5=${hit2.toDouble / nTruth}%.3f " +
            f"($hit2/$nTruth) rows=$rows2")
          res2.unpersist(); index2.unpersist()
        }
        // the RECALL-FLOOR calibrated dial (VERDICT r14 #3): report
        // the measured ladder (the SCALING recall-vs-wall curve) and
        // the full-corpus serve at the calibrated nprobe
        if (legs("cal")) {
          val floor = sys.env.getOrElse("SPARK_GRAFT_IVF_FLOOR", "0.8")
            .toDouble
          val index2 = Ivf.buildIndexDeterministic(
            emb, "vec_id", "embedding", nlist, assign = 2)
          val (npCal, curve) = Ivf.calibrateNprobe(index2, k = 5,
            recallFloor = floor, n = n, startNprobe = nprobeNew)
          println(s"ivfdial $dir n=$n nlist=$nlist cal floor=$floor " +
            "curve=" + curve.map { case (p, r) =>
              f"$p:$r%.3f" }.mkString(","))
          val t0 = System.nanoTime()
          val res3 = Ivf.probeTopK(
              emb.select(col("vec_id"), col("embedding")), index2,
              "vec_id", "embedding", k = 5, nprobe = npCal,
              excludeSelf = true, distinctCandidates = true)
            .select("id_a", "id_b").cache()
          val rows3 = res3.count()
          val wall3 = (System.nanoTime() - t0) / 1e9
          val hit3 = truth.join(res3, Seq("id_a", "id_b")).count()
          println(f"ivfdial $dir n=$n nlist=$nlist cal nprobe=$npCal%-3d " +
            f"frac=${npCal.toDouble / nlist}%.4f " +
            f"wall=$wall3%7.2f s recall@5=${hit3.toDouble / nTruth}%.3f " +
            f"($hit3/$nTruth) rows=$rows3")
          res3.unpersist(); index2.unpersist()
        }
        truth.unpersist(); sizes.unpersist(); index.unpersist()
      }
    }

    if (sections("streamtwin")) {
      // --- streaming edit-join twin crossover (VERDICT r14 #5): the
      // two stream twins are STATELESS, so one micro-batch's cost is
      // exactly the twin's DataFrame plan applied to a static delta —
      // measure both plans on a fixed-size delta against corpora of
      // growing REPLICATION (v distinct strings, m replicas each).
      // The row-level twin's broadcast index grows with n = v·m and
      // every probe key meets every replica; the collapse twin's
      // index stays at v and pays replicas only in the (output-
      // proportional) expansion join. SCALING.md records the table.
      // 128-char strings: the banded DP is the cost the collapse twin
      // exists to deduplicate — the row-level twin runs it once per
      // CORPUS REPLICA met, the collapse twin once per VALUE
      val v = 200
      val dRows = 2000
      def mkStr(idc: Column): Column = {
        val vid = pmod(idc, lit(v.toLong))
        concat((0 until 4).map(j =>
          md5(concat(vid.cast("string"), lit(s"#$j")))): _*)
      }
      val delta = spark.range(dRows).select(
          (col("id") + 10000000L).as("id"), mkStr(col("id")).as("s"))
        .withColumn("blk", substring(col("s"), 1, 1))
        .localCheckpoint(true)
      Seq(1, 16, 64, 256).foreach { m =>
        val corpus = spark.range(v.toLong * m).select(col("id"),
            mkStr(col("id")).as("s"))
          .withColumn("blk", substring(col("s"), 1, 1))
          .localCheckpoint(true)
        val idx = graft.streaming.Streams
          .editCorpusIndex(corpus, "id", "s", "blk", r = 3)
          .localCheckpoint(true) // the persisted artifact, not the cost
        println(s"streamtwin m=$m broadcast index: row-level " +
          s"${idx.count()} rows vs value-level ${v * 4} rows")
        time(f"streamtwin m=$m%-3d row-level twin")(
          graft.streaming.Streams.editJoinStream(
            delta, idx, "id", "s", "blk", r = 3)
            .agg(count(lit(1))).head().getLong(0))
        time(f"streamtwin m=$m%-3d collapse twin ")(
          graft.streaming.Streams.editJoinCollapsedStream(
            delta, corpus, "id", "s", "blk", r = 3)
            .agg(count(lit(1))).head().getLong(0))
      }
    }

    if (sections("flagship")) {
      // --- third-decade flagship re-measure (VERDICT r13 #5): run the
      // named headline queries against each input dir (sf + extra args
      // beyond position 3 — pass sf0.1, the sf1 10× dir, the sf2 100×
      // dir) with the bench protocol (noop write, blocking cache
      // release). One run per (query, dir): these are decade-shape
      // probes, not medians — SCALING.md records the table.
      // SPARK_GRAFT_FLAGSHIP overrides the list (round-15: the
      // text/dedup family's third decade over sf2 documents)
      val headline = sys.env.get("SPARK_GRAFT_FLAGSHIP")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(Seq("q271_behavior_editdist", "q341_sig_edit_join",
          "q342_incr_edit_join", "q49_fuzzy_match", "q340_band_pairs_salted",
          "q160_ann_ivf_det"))
      val dirs = (Seq(sf) ++ args.drop(3)).distinct
      dirs.foreach { dir =>
        headline.foreach { name =>
          try {
            val t0 = System.nanoTime()
            SparkEntry.queries(name)(spark, dir)
              .write.format("noop").mode("overwrite").save()
            val wall = (System.nanoTime() - t0) / 1e9
            println(f"flagship $dir $name%-24s $wall%8.2f s")
          } catch {
            case e: Throwable =>
              println(s"flagship $dir $name FAILED: " +
                Option(e.getMessage).getOrElse(e.getClass.getName)
                  .linesIterator.take(1).mkString)
          } finally {
            spark.catalog.clearCache()
            spark.sparkContext.getPersistentRDDs.values
              .foreach(_.unpersist(blocking = true))
          }
        }
      }
    }
    spark.stop()
  }

  /** Per-replica deterministic character BIJECTION for document
    * inflation — letters AND digits map (digits per ADVICE r11: an
    * all-digit shingle would otherwise coincide across replicas and
    * merge their posting lists), so each replica's shingles live in a
    * disjoint space and the inflated corpus behaves as `reps`
    * independent corpora of NEW documents. Residual caveat: shingles
    * of ONLY punctuation/whitespace still coincide — noted in
    * SCALING.md, immeasurably rare in this corpus. The map is an
    * affine permutation
    * x ↦ a·x + b on each alphabet (a coprime to the alphabet size, so
    * always a permutation). For i < 26 the letter map has a = 1 —
    * exactly the original Caesar rotation, so every sf1/sf10x replica
    * is byte-identical to previous rounds — but a Caesar-only family
    * repeats at period 26: at the sf2 decade (100 replicas) it would
    * hand every letters-only document an EXACT duplicate 26 replicas
    * over, quietly corrupting the dedup/cluster truth the corpus
    * exists to measure. The (a, b) pair is injective over i ∈ 0..103,
    * so all 100 sf2 replicas decorrelate. A character bijection
    * preserves word lengths, whitespace and punctuation, hence
    * per-replica shingle structure and df counts — EXACTLY what the
    * text-family scale measurements need. */
  private def caesarText(c: Column, i: Int): Column = {
    def affine(s: String, a: Int, b: Int): String =
      s.indices.map(j => s((a * j + b) % s.length)).mkString
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val digits = "0123456789"
    val mapped = affine(lower, Seq(1, 3, 5, 7)((i / 26) % 4), i % 26)
    val mappedD = affine(digits, Seq(1, 3, 7, 9)((i / 10) % 4), i % 10)
    translate(c, lower + lower.toUpperCase + digits,
      mapped + mapped.toUpperCase + mappedD)
  }

  /** Adversarial near-dup CHAIN corpus: doc i = 4 consecutive 100-char
    * blocks (i..i+3), so adjacent docs share 3 of 4 blocks (Jaccard
    * ≈ 0.59 on 8-gram shingles), docs 2 apart ≈ 0.33, 3+ apart ≈ 0.13
    * — a 0.3-threshold transitive closure chains ALL docs into one
    * mega-cluster whose weakest pair scores 0, while every block
    * shingle's document frequency stays ≤ 4 (the chain defeats the
    * df-cap, not the audit — that is the point). `hotSuffix` appends
    * the same literal to every doc: a ubiquitous shingle family with
    * df = corpus size that the df-capped index must drop. Blocks are
    * md5-derived, so the corpus is deterministic at any size. */
  def chainCorpus(spark: SparkSession, nChain: Int,
                  hotSuffix: Option[String] = None): DataFrame = {
    def block(j: Column): Column = substring(concat(
      (0 until 4).map(r =>
        md5((j * 4 + lit(r)).cast("string").cast("binary"))): _*), 1, 100)
    val base = spark.range(nChain).select(
      col("id").as("doc_id"),
      concat((0 until 4).map(o => block(col("id") + lit(o))): _*).as("text"))
    hotSuffix.fold(base)(s =>
      base.withColumn("text", concat(col("text"), lit(s))))
  }
}
