package graft
import org.apache.spark.sql.SparkSession

/** Dev-only probe: schema/read sanity over the testdata tables. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    for (t <- Seq("lineitem", "orders", "events", "documents", "embeddings")) {
      try {
        val df = spark.read.parquet(s"$dir/$t.parquet")
        println(s"== $t: ${df.count()} rows")
        df.printSchema()
        df.show(3, 60)
      } catch {
        case e: Throwable => println(s"== $t FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
