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

    for (q <- Seq("q39_ann_ivf", "q34_ann_lsh", "q75_typicality",
                  "q70_interval_overlap", "q74_curation_funnel")) {
      for (i <- 1 to 2) {
        spark.catalog.clearCache()
        t(s"$q run$i")(noop(graft.SparkEntry.queries(q)(spark, dir)))
      }
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
