package graft
import org.apache.spark.sql.SparkSession
object DbgPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(0))(spark, args(1))
    df.queryExecution.toRdd.foreach(_ => ())
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
