package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
// Scratch profiling main - not part of the library (deleted before commit).
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().withExtensions(new graft.functions.GraftExtensions)
      .master("local[32]").config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.sql.session.timeZone","UTC").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = { val t0=System.nanoTime; val n=f; println(f"PROF $name%-28s ${(System.nanoTime-t0)/1e9}%6.2f s  rows=$n") }
    val docs = graft.Tables.documents(spark, dir)
    docs.count()
    time("shingle_scan")(graft.operators.Dedup.shingles(docs, "doc_id", "text", 8).count())
    val inv = graft.operators.Dedup.invertedIndex(docs, "doc_id", "text", 8)
    time("inverted_index_build")(inv.count())
    val kept = inv.where(size(col("docs")) <= 100)
    time("pair_expand_count") {
      kept.where(size(col("docs")) >= 2)
        .select(explode(graft.functions.PairExpressions.pairArray(col("docs"))).as("p"))
        .groupBy(col("p.id1"), col("p.id2")).agg(count(lit(1))).count()
    }
    time("pair_total_volume") {
      kept.select(sum((size(col("docs")).cast("long") * (size(col("docs"))-1)).cast("long"))).collect()(0).getLong(0)
    }
    time("sizes")(kept.select(explode(col("docs")).as("doc_id")).groupBy("doc_id").agg(count(lit(1))).count())
    time("q29_full")(graft.operators.Dedup.ngramJaccard(docs, "doc_id", "text", 8, 100, 0.3).count())
    time("q29_full_again")(graft.operators.Dedup.ngramJaccard(docs, "doc_id", "text", 8, 100, 0.3).count())
    time("simhash60")(graft.operators.Dedup.simhash(docs, "doc_id", "text", 60).count())
    time("q50_full")(graft.operators.Dedup.simhashPairsBanded(
      graft.operators.Dedup.simhash(docs, "doc_id", "text", 60), "doc_id", 3, 60).count())
    spark.stop()
  }
}
