package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val (dim, planes, tables, k, mp) = (64, 7, 20, 5, 4)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STEP $label: ${(System.nanoTime()-t0)/1e9}%.2f"); r
    }
    // warm
    graft.operators.Similarity.lshTopK(emb.limit(256), "vec_id", "embedding", dim, planes, tables, k, mp).count()
    spark.catalog.clearCache()
    for (round <- 1 to 2) {
      val v = emb.select(col("vec_id").as("id"), transform(col("embedding"), x => x.cast("double")).as("v")).cache()
      time("v.count")(v.count())
      val blocks = v.select(col("id"), col("v"),
          posexplode(graft.functions.VectorExpressions.lshBucketsNative(col("v"), dim, planes, tables)).as(Seq("t","b")))
        .groupBy(col("t"), col("b")).agg(collect_list(struct(col("id"), col("v"))).as("rows")).cache()
      time("blocks")(blocks.count())
      val probes = v.select(col("id").as("id_a"), col("v").as("va"),
          posexplode(graft.functions.VectorExpressions.lshProbesNative(col("v"), dim, planes, tables, mp)).as(Seq("pt","b")))
        .select(col("id_a"), col("va"), (col("pt")/lit(mp+1)).cast("int").as("t"), col("b"))
        .groupBy(col("t"), col("b")).agg(collect_list(struct(col("id_a").as("id"), col("va").as("v"))).as("qrows")).cache()
      time("probes")(probes.count())
      val cand = probes.join(blocks, Seq("t","b"))
        .select(explode(graft.functions.VectorExpressions.blockTopKNative(col("qrows"), col("rows"), k)).as("p"))
        .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"), col("p.cosine").as("cosine")).cache()
      time("kernel")(println("cand rows: " + cand.count()))
      time("agg")(graft.operators.Similarity.rankTopK(cand, k, distinctIds = true).write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache()
      println(s"--- end round $round")
    }
    spark.stop()
  }
}
