package graft.sources

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def withConf[A](kv: (String, String)*)(body: => A): A = {
    val old = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed tables join with zero exchange and match the shuffle join") {
    val o = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val l = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    try {
      Layout.writeBucketed(o, "layout_orders_b", Seq("o_orderkey"), 8,
        sortCols = Seq("o_orderkey"))
      Layout.writeBucketed(l, "layout_lineitem_b", Seq("o_orderkey"), 8,
        sortCols = Seq("o_orderkey"))
      // forbid broadcast so the co-location claim is what's on trial;
      // the legacy flag re-enables consuming per-bucket sort metadata
      // (off by default since Spark 3.0 because multi-file buckets
      // broke it — writeBucketed guarantees one file per bucket, the
      // exact case the flag is sound for)
      withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.legacy.bucketedTableScan.outputOrdering" -> "true") {
        val j = Layout.readBucketed(spark, "layout_orders_b")
          .join(Layout.readBucketed(spark, "layout_lineitem_b"), "o_orderkey")
        val plan = j.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"bucketed join must not shuffle either side:\n$plan")
        // pre-sorted buckets: the merge join needs no Sort operator either
        assert(!plan.contains("+- Sort "),
          s"bucket-sorted join must not re-sort:\n$plan")
        val expected = o.join(l, Seq("o_orderkey")).count()
        assert(j.count() == expected)
        // one-sided layout still helps: unbucketed side shuffles, bucketed
        // side reads in place (exactly one exchange in the plan)
        val half = Layout.readBucketed(spark, "layout_orders_b")
          .join(l, "o_orderkey")
        val halfPlan = half.queryExecution.executedPlan.toString
        assert("Exchange".r.findAllIn(halfPlan).size == 1,
          s"one-sided bucketing must shuffle exactly one side:\n$halfPlan")
        assert(half.count() == expected)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS layout_orders_b")
      spark.sql("DROP TABLE IF EXISTS layout_lineitem_b")
    }
  }

  test("bucketed groupBy on the bucket key aggregates without exchange") {
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    try {
      Layout.writeBucketed(o, "layout_orders_g", Seq("o_orderkey"), 8)
      val agg = Layout.readBucketed(spark, "layout_orders_g")
        .groupBy("o_orderkey").agg(sum("o_totalprice"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"groupBy on the bucket key must not shuffle:\n$plan")
      assert(agg.count() == o.select("o_orderkey").distinct().count())
    } finally spark.sql("DROP TABLE IF EXISTS layout_orders_g")
  }

  test("zCode interleaves bits exactly (reference implementation)") {
    import spark.implicits._
    def ref(a: Long, b: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (z, i) =>
        z | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }
    val rows = for (a <- 0L to 7L; b <- 0L to 7L) yield (a, b)
    val got = rows.toDF("a", "b")
      .select(col("a"), col("b"),
        Layout.zCode(Seq(col("a"), col("b")), bits = 3).as("z"))
      .as[(Long, Long, Long)].collect()
    for ((a, b, z) <- got) assert(z == ref(a, b, 3), s"a=$a b=$b")
    // morton codes over the full grid are a permutation of 0..63
    assert(got.map(_._3).sorted.toSeq == (0L until 64L))
  }

  test("z-order layout: predicates on EITHER dimension touch few files; " +
      "ts-range layout only skips on ts") {
    val ev = Tables.events(spark, sf).select("event_id", "ts", "user_id", "value")
    val tsDir = java.nio.file.Files.createTempDirectory("layout_ts").toString
    val zDir = java.nio.file.Files.createTempDirectory("layout_z").toString
    try {
      Layout.writeRangeLayout(ev, tsDir, Seq("ts"), files = 16)
      Layout.writeZOrder(ev, zDir, Seq("ts", "user_id"), files = 16)
      val zBack = spark.read.parquet(zDir)
      assert(zBack.count() == ev.count())
      // narrow user_id slice (~1/8 of the id space)
      val uMax = ev.agg(max("user_id")).head().getLong(0)
      def touched(dir: String): Long = {
        val d = spark.read.parquet(dir)
        d.where(col("user_id") <= uMax / 8)
          .select(input_file_name()).distinct().count()
      }
      val zTouched = touched(zDir)
      val tsTouched = touched(tsDir)
      // the ts-range layout scatters every user across all files; the
      // z-order layout clusters user_id too, so the slice lives in a
      // strict subset of files
      assert(tsTouched >= 14, s"ts layout unexpectedly skipped: $tsTouched")
      assert(zTouched <= tsTouched / 2,
        s"z-order touched $zTouched of 16 vs ts layout $tsTouched")
    } finally {
      for (dir <- Seq(tsDir, zDir)) {
        val p = java.nio.file.Paths.get(dir)
        java.nio.file.Files.walk(p)
          .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(f => java.nio.file.Files.delete(f))
      }
    }
  }

  test("range layout: files cover pairwise-disjoint ranges, no rows lost") {
    val ev = Tables.events(spark, sf).select("event_id", "ts", "value")
    val dir = java.nio.file.Files.createTempDirectory("layout_range").toString
    try {
      Layout.writeRangeLayout(ev, dir, Seq("ts"), files = 4)
      val back = spark.read.parquet(dir)
      assert(back.count() == ev.count())
      val ranges = back.groupBy(input_file_name().as("f"))
        .agg(min(unix_micros(col("ts"))).as("lo"),
          max(unix_micros(col("ts"))).as("hi"))
        .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
      assert(ranges.nonEmpty && ranges.length <= 4)
      for (Array((_, hi1), (lo2, _)) <- ranges.sliding(2).map(_.toArray))
        assert(hi1 <= lo2, s"file ranges overlap: ${ranges.mkString(", ")}")
    } finally {
      val p = java.nio.file.Paths.get(dir)
      java.nio.file.Files.walk(p)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => java.nio.file.Files.delete(f))
    }
  }
}
