package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only stage profiler (test scope, never shipped): times labelled
  * sub-plans of the heavy queries. Data dir + parallelism from args. */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): Unit = {
      val t0 = System.nanoTime
      f
      println(f"PROF $label: ${(System.nanoTime - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    graft.Tables.embeddings(spark, dir).count()
    graft.Tables.documents(spark, dir).count()

    // q39's fitted-IVF variant left the driver catalog (deterministic
    // twin q160 carries the oracle) — profile the twin instead
    for (q <- Seq("q160_ann_ivf_det", "q34_ann_lsh", "q75_typicality",
                  "q70_interval_overlap", "q74_curation_funnel")) {
      for (i <- 1 to 2) {
        spark.catalog.clearCache()
        t(s"$q run$i")(noop(graft.SparkEntry.queries(q)(spark, dir)))
      }
    }
    // q74 decomposition: stage-by-stage actions on the funnel inputs
    {
      import org.apache.spark.sql.functions._
      spark.catalog.clearCache()
      val docs = graft.Tables.documents(spark, dir)
      val corp = docs.where(pmod(col("doc_id"), lit(19)) =!= 0).cache()
      corp.count()
      val q = graft.operators.TextAnalysis.quality(corp, "doc_id", "text")
        .where(col("n_tokens") >= 5 && col("digit_ratio") <= 0.3)
        .select(col("doc_id"))
      val qualityDocs = corp.join(q, "doc_id")
      t("q74: quality gate")(qualityDocs.count())
      val exactKeep = graft.operators.Dedup.exactGroups(qualityDocs, "doc_id", "text")
        .select(col("keep_id").as("doc_id"))
      val exactDocs = qualityDocs.join(exactKeep, "doc_id").cache()
      t("q74: exact dedup")(exactDocs.count())
      val pairs = graft.operators.Dedup.ngramJaccard(exactDocs, "doc_id", "text",
        k = 8, maxDf = 100, threshold = 0.3)
      t("q74: jaccard pairs")(pairs.count())
      val clusters = graft.operators.Graph.dedupClusters(exactDocs, "doc_id",
        pairs, "id1", "id2")
      t("q74: components")(clusters.count())
      val nearDocs = exactDocs.join(clusters.where(col("keep"))
        .select(col("doc_id")), "doc_id").cache()
      t("q74: nearDocs join")(nearDocs.count())
      val bench = docs.where(pmod(col("doc_id"), lit(19)) === 0)
        .select(col("doc_id"), col("text"))
      val contaminated = graft.operators.TextAnalysis.decontaminate(
        nearDocs, bench, "doc_id", "text", n = 3, threshold = 0.05)
        .select(col("doc_id"))
      t("q74: decontaminate")(contaminated.count())
      t("q74: final anti+label")(noop(
        nearDocs.join(contaminated, Seq("doc_id"), "left_anti")
          .withColumn("split", graft.operators.Split
            .splitLabel(col("doc_id"),
              Seq("train" -> 98, "val" -> 99, "test" -> 100)))
          .select(col("doc_id"), col("split"))))
    }

    // q29 decomposition: inverted index vs pair expansion vs scoring
    {
      import org.apache.spark.sql.functions._
      spark.catalog.clearCache()
      val docs = graft.Tables.documents(spark, dir).cache()
      docs.count()
      val inv = graft.operators.Dedup.invertedIndexHashed(
        docs, "doc_id", "text", 8)
      t("q29: inverted index build")(inv.count())
      val kept = inv.where(size(col("docs")) <= 100)
      val expanded = kept.where(size(col("docs")) >= 2)
        .select(explode(graft.functions.PairExpressions
          .pairArray(col("docs"))).as("p"))
      println(s"q29: expanded pair rows = " +
        kept.where(size(col("docs")) >= 2)
          .agg(sum(expr("size(docs)*(size(docs)-1) div 2"))).head().getLong(0) +
        s", distinct shingles kept = ${kept.count()}")
      t("q29: pair explode+agg")(
        expanded.groupBy(col("p.id1"), col("p.id2")).agg(count(lit(1))).count())
      t("q29: full ngramJaccard")(noop(graft.operators.Dedup
        .ngramJaccard(docs, "doc_id", "text", 8, 100, 0.3)))
    }

    // q83 decomposition: edge derivation vs triangle kernel
    {
      import org.apache.spark.sql.functions._
      spark.catalog.clearCache()
      val li = graft.Tables.lineitem(spark, dir).select("l_orderkey", "l_partkey")
      val edges = li.groupBy("l_orderkey")
        .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
        .where(size(col("parts")) >= 2)
        .select(explode(graft.functions.PairExpressions
          .pairArray(col("parts"))).as("p"))
        .select(col("p.id1").as("u"), col("p.id2").as("v"))
      t("q83: edge derivation (to distinct count)")(
        edges.distinct().count())
      val cached = edges.distinct().cache()
      cached.count()
      t("q83: triangle kernel on cached distinct edges")(
        graft.operators.Graph.triangleCount(cached, "u", "v")
          .select("n_triangles").head().getLong(0))
      cached.unpersist()
      t("q83: full query")(noop(graft.SparkEntry
        .queries("q83_triangle_count")(spark, dir)))
    }

    // q39 decomposition: index build (KMeans fit + assign) vs probe
    spark.catalog.clearCache()
    val emb = graft.Tables.embeddings(spark, dir)
    var idx: graft.operators.Ivf.IvfIndex = null
    t("q39: buildIndex (KMeans fit + assign + cache)") {
      val n = math.max(emb.count(), 1L)
      val nlist = math.max(4, math.ceil(math.sqrt(n.toDouble)).toInt)
      idx = graft.operators.Ivf.buildIndex(emb, "vec_id", "embedding", nlist)
      idx.indexed.count()
    }
    t("q39: probeTopK on warm index") {
      import org.apache.spark.sql.functions.col
      noop(graft.operators.Ivf.probeTopK(
        idx.indexed.select(col("id"), col("v")), idx, "id", "v",
        k = 5, nprobe = math.max(4, idx.centroids.length / 8),
        excludeSelf = true))
    }
    spark.stop()
  }
}
