package graft

import graft.operators.{BandJoin, Ivf, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
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
    spark.stop()
  }
}
