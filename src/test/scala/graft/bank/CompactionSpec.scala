package graft.bank

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CompactionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def parquetFiles(dir: String): Seq[java.nio.file.Path] = {
    val s = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(_.toString.endsWith(".parquet")).toList
    } finally s.close()
  }

  test("compact merges small append files; data and partition layout survive") {
    val root = java.nio.file.Files.createTempDirectory("wh_compact").toString
    val wh = new Warehouse(spark, root)
    // 12 daily appends, each a multi-partition write → many small files
    for (d <- 1 to 12) {
      val day = f"2021-03-$d%02d"
      wh.append("facts",
        spark.range(200).select(col("id"), lit(day).as("dt")),
        partitionCols = Seq("dt"))
    }
    val before = parquetFiles(root + "/facts")
    val sumBefore = wh.read("facts").agg(sum("id"), count(lit(1)))
      .as[(Long, Long)].first()

    wh.compact("facts", partitionCols = Seq("dt"))

    val after = parquetFiles(root + "/facts")
    assert(after.size < before.size,
      s"expected fewer files, got ${before.size} -> ${after.size}")
    // identical data, partition directories intact
    assert(wh.read("facts").agg(sum("id"), count(lit(1)))
      .as[(Long, Long)].first() == sumBefore)
    assert(after.forall(_.toString.contains("dt=")),
      "partition directory layout must survive compaction")
    // partition pruning still works on the compacted table
    val oneDay = wh.read("facts").where(col("dt") === "2021-03-05").count()
    assert(oneDay == 200L)
  }

  test("compact on an unpartitioned table shrinks to the computed file count") {
    val root = java.nio.file.Files.createTempDirectory("wh_compact2").toString
    val wh = new Warehouse(spark, root)
    for (_ <- 1 to 8)
      wh.append("t", spark.range(1000).toDF("id"))
    val before = parquetFiles(root + "/t").size
    val rows = wh.read("t").count()
    wh.compact("t") // tiny table → one target file
    assert(parquetFiles(root + "/t").size == 1, s"before=$before")
    assert(wh.read("t").count() == rows)
  }
}
