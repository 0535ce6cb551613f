package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
    val docs = graft.Tables.documents(spark, dir)
    docs.count()
    def t[A](label: String)(f: => A): Unit = {
      val t0 = System.nanoTime
      f
      println(f"PROF $label: ${(System.nanoTime - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    for (q <- Seq("q56_dedup_clusters", "q54_incremental_lsh", "q61_semantic_dedup")) {
      for (i <- 1 to 3) {
        spark.catalog.clearCache()
        t(s"$q run$i")(noop(graft.SparkEntry.queries(q)(spark, dir)))
      }
    }
    // q56 decomposition
    spark.catalog.clearCache()
    val pairs = graft.operators.Dedup.ngramJaccard(docs, "doc_id", "text", 8, 100, 0.3)
    t("q56: jaccard pairs")(noop(pairs))
    t("q56: cc on warm pairs")(noop(graft.operators.Graph.dedupClusters(docs, "doc_id", pairs, "id1", "id2")))
    spark.stop()
  }
}
