package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed dense global ranking — `row_number() OVER (ORDER BY …)`
  * without the single-partition cliff. A training-data export wants the
  * whole corpus in a deterministic pseudo-random order ("global
  * shuffle": order by a hash of the id so every shard of every epoch
  * reads the same sequence); the naive window formulation drains the
  * table through ONE task to assign row numbers.
  *
  * Same two-pass shape as [[Sampling.systematicSample]]'s prefix sum:
  * range-repartition on the order key (partitions are contiguous key
  * ranges, in order), per-partition COUNTS to the driver (one row per
  * partition — bounded by parallelism, not data), exclusive offsets
  * broadcast back, in-partition `row_number` under a per-partition
  * window. The heavy machinery is the range exchange — the same
  * exchange a global `ORDER BY` pays — but rank assignment then runs
  * fully parallel.
  *
  * Ties: the order-key tuple must uniquely identify a row (pass a
  * tiebreaker column last — ids are the natural one); uniqueness keeps
  * the rank deterministic under ANY partitioning.
  */
object Rank {

  /** @return `df` + `rankCol` (1-based, dense, deterministic), ranked
    *         by `orderCols` lexicographically ascending */
  def globalRank(df: DataFrame, rankCol: String, orderCols: Column*): DataFrame =
    globalOrderStats(df, Nil, Some(rankCol), orderCols: _*)

  /** Distributed inclusive prefix SUM of a long column in `orderCols`
    * order — `sum(x) OVER (ORDER BY … ROWS UNBOUNDED PRECEDING)`
    * without the single-partition cliff. Identical two-pass shape to
    * [[globalRank]], with per-partition TOTALS of `valueCol` shipped
    * to the driver instead of counts. The running total is the
    * backbone of cumulative-share reports (ABC / Pareto
    * classification) and of [[Sampling.systematicSample]]'s weight
    * line. `valueCol` must be integral (exact under any summation
    * order); the order-key tuple must be unique per row.
    *
    * Needing SEVERAL running stats in the same order? Call
    * [[globalOrderStats]] ONCE — chaining two of these pays the whole
    * two-exchange + collect machinery twice for the same ordering. */
  def globalPrefixSum(df: DataFrame, sumCol: String, valueCol: String,
                      orderCols: Column*): DataFrame =
    globalOrderStats(df, Seq(sumCol -> valueCol), None, orderCols: _*)

  /** The fused engine behind [[globalRank]] / [[globalPrefixSum]]: any
    * number of inclusive prefix sums plus an optional 1-based rank, all
    * in `orderCols` order, for ONE range exchange, ONE cache, ONE
    * bounded driver collect and ONE window pass. The former
    * double-invocation pattern (`globalPrefixSum(globalPrefixSum(g, …))`,
    * used by the CDF/KS/Youden/Gini family) re-ranged, re-cached and
    * re-windowed the SAME frame once per running stat — at k stats
    * that is k range exchanges + k pid-clustering exchanges where this
    * does one of each (guide §2.4: two operations keyed the same way
    * share one exchange).
    *
    * `sums` are (outputCol, valueCol) pairs; value columns must be
    * integral (exact under any summation order) and non-null. The
    * order-key tuple must uniquely identify a row. Driver state: one
    * row per shuffle partition — bounded by parallelism, not data. */
  def globalOrderStats(df: DataFrame, sums: Seq[(String, String)],
                       rankCol: Option[String], orderCols: Column*): DataFrame = {
    require(sums.nonEmpty || rankCol.isDefined,
      "globalOrderStats: nothing to compute")
    val spark = df.sparkSession
    // cached: the totals pass and the window pass must see the SAME
    // range partitioning (session-scoped; Bench/Verify clear per query)
    val parted = df.repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .cache()
    // one aggregate per requested stat (+ a row count for the rank),
    // all in a single per-partition pass
    val width = sums.size + (if (rankCol.isDefined) 1 else 0)
    val aggCols = sums.zipWithIndex.map { case ((_, v), i) =>
      sum(col(v).cast("long")).as(s"__t$i")
    } ++ rankCol.map(_ => count(lit(1)).as(s"__t${sums.size}")).toSeq
    val totals = parted.groupBy("__pid").agg(aggCols.head, aggCols.tail: _*)
      .collect()
      .map(r => (r.getInt(0), Array.tabulate(width)(i => r.getLong(i + 1))))
      .sortBy(_._1)
    // exclusive running offsets per stat, in partition order
    val offsets = totals.scanLeft((0, Array.fill(width)(0L))) {
      case ((_, acc), (pid, t)) =>
        (pid, Array.tabulate(width)(i => acc(i) + t(i)))
    }.init.zip(totals).map { case ((_, off), (pid, _)) => (pid, off) }
    val offSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__pid",
        org.apache.spark.sql.types.IntegerType, nullable = false) +:
        (0 until width).map(i => org.apache.spark.sql.types.StructField(
          s"__o$i", org.apache.spark.sql.types.LongType, nullable = false)))
    // LocalRelation, NOT an RDD-backed frame: a LogicalRDD has no size
    // statistics (defaults to defaultSizeInBytes = huge), which poisons
    // every downstream join estimate of the returned frame — measured as
    // a non-equi join in q240 degrading BroadcastNestedLoop →
    // CartesianProduct (caught by PlanQualitySpec)
    import scala.jdk.CollectionConverters._
    val offDf = spark.createDataFrame(
      offsets.toSeq.map { case (pid, off) =>
        org.apache.spark.sql.Row.fromSeq(pid +: off.toSeq)
      }.asJava, offSchema)
    val wBase = Window.partitionBy("__pid").orderBy(orderCols: _*)
    val wSum = wBase.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = parted.join(broadcast(offDf), "__pid")
    val withSums = sums.zipWithIndex.foldLeft(joined) {
      case (d, ((out, v), i)) =>
        d.withColumn(out, col(s"__o$i") + sum(col(v).cast("long")).over(wSum))
    }
    val withRank = rankCol.fold(withSums)(rc => withSums.withColumn(rc,
      col(s"__o${sums.size}") + row_number().over(wBase)))
    withRank.drop("__pid" +: (0 until width).map(i => s"__o$i"): _*)
  }

  /** [[globalOrderStats]] with a PARTITION KEY: inclusive prefix sums
    * of `sums` in `orderCols` order WITHIN each distinct `keyCols`
    * group — `sum(x) OVER (PARTITION BY key ORDER BY … ROWS UNBOUNDED
    * PRECEDING)` without the one-task-per-key cliff. A per-key window
    * puts each key's ENTIRE frame through one task, so a key whose
    * frame grows with the corpus (q312: distinct prices of the `price`
    * feature) serializes exactly like the partitionless window it was
    * meant to avoid. Here the range exchange runs on (key, order) —
    * a hot key spreads over MANY contiguous partitions — and the
    * cross-partition carry is resolved per (partition, key) on the
    * driver: one row per partition per key it touches, bounded by
    * parallelism × |keys|, so `keyCols` must be LOW-cardinality
    * (features, event types — not user ids). */
  def keyedPrefixSums(df: DataFrame, sums: Seq[(String, String)],
                      keyCols: Seq[String], orderCols: Column*): DataFrame = {
    require(sums.nonEmpty, "keyedPrefixSums: nothing to compute")
    require(keyCols.nonEmpty, "keyedPrefixSums: no key (use globalOrderStats)")
    val spark = df.sparkSession
    val rangeCols = keyCols.map(col) ++ orderCols
    val parted = df.repartitionByRange(rangeCols: _*)
      .sortWithinPartitions(rangeCols: _*)
      .withColumn("__pid", spark_partition_id())
      .cache()
    val width = sums.size
    val aggCols = sums.zipWithIndex.map { case ((_, v), i) =>
      sum(col(v).cast("long")).as(s"__t$i") }
    val totals = parted.groupBy("__pid", keyCols: _*)
      .agg(aggCols.head, aggCols.tail: _*)
      .collect()
      .map { r =>
        val key = keyCols.indices.map(i => r.get(i + 1)).toVector
        (r.getInt(0), key,
          Array.tabulate(width)(i => r.getLong(i + 1 + keyCols.size)))
      }
    // exclusive running offsets per KEY across partitions in pid order
    val offsets = totals.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      val inOrder = rows.sortBy(_._1)
      inOrder.scanLeft(Array.fill(width)(0L)) { case (acc, (_, _, t)) =>
        Array.tabulate(width)(i => acc(i) + t(i))
      }.init.zip(inOrder).map { case (off, (pid, key, _)) => (pid, key, off) }
    }
    val keyFields = keyCols.map(k => df.schema(k))
    val offSchema = org.apache.spark.sql.types.StructType(
      (org.apache.spark.sql.types.StructField("__pid",
        org.apache.spark.sql.types.IntegerType, nullable = false) +: keyFields) ++
        (0 until width).map(i => org.apache.spark.sql.types.StructField(
          s"__o$i", org.apache.spark.sql.types.LongType, nullable = false)))
    import scala.jdk.CollectionConverters._
    val offDf = spark.createDataFrame(
      offsets.map { case (pid, key, off) =>
        org.apache.spark.sql.Row.fromSeq((pid +: key) ++ off.toSeq)
      }.asJava, offSchema)
    val wSum = Window.partitionBy("__pid", keyCols: _*).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = parted.join(broadcast(offDf), "__pid" +: keyCols)
    sums.zipWithIndex.foldLeft(joined) { case (d, ((out, v), i)) =>
      d.withColumn(out, col(s"__o$i") + sum(col(v).cast("long")).over(wSum))
    }.drop("__pid" +: (0 until width).map(i => s"__o$i"): _*)
  }

  /** Distributed EXCLUSIVE prefix MAX of a long column in `orderCols`
    * order — `max(x) OVER (ORDER BY … ROWS BETWEEN UNBOUNDED PRECEDING
    * AND 1 PRECEDING)` without the single-partition cliff, NULL where
    * no strictly-earlier row exists (the first row globally). The
    * high-water-mark shape: "the largest event time seen before this
    * arrival minute" (watermark sizing), "the running record so far".
    * Same two-pass skeleton as [[globalPrefixSum]]: range-exchange on
    * the order key, per-partition MAXes to the driver (one row per
    * partition), exclusive cross-partition running maxes broadcast
    * back, in-partition exclusive-max window. `greatest` skips NULLs,
    * so the partition boundary and the global first row fall out of
    * NULL offsets for free. `valueCol` must be long; the order-key
    * tuple must be unique per row. */
  def globalPrefixMax(df: DataFrame, outCol: String, valueCol: String,
                      orderCols: Column*): DataFrame = {
    val spark = df.sparkSession
    val parted = df.repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .cache()
    val maxes = parted.groupBy("__pid").agg(max(col(valueCol)).as("__m"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    // exclusive: partition p sees the max over partitions strictly
    // before it; the first non-empty partition sees NULL
    val offsets = maxes.scanLeft(Option.empty[Long]) {
      case (acc, (_, m)) => Some(acc.fold(m)(math.max(_, m)))
    }.init.zip(maxes).map { case (off, (pid, _)) =>
      (pid, off.map(java.lang.Long.valueOf).orNull)
    }
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offsets.toSeq.map {
        case (pid, off) => org.apache.spark.sql.Row(pid, off)
      }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__pid",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("__off",
          org.apache.spark.sql.types.LongType, nullable = true))))
    parted.join(broadcast(offDf), "__pid")
      .withColumn(outCol, greatest(col("__off"),
        max(col(valueCol)).over(Window.partitionBy("__pid")
          .orderBy(orderCols: _*)
          .rowsBetween(Window.unboundedPreceding, -1))))
      .drop("__pid", "__off")
  }

  /** EXACT median (the ⌈n/2⌉-th order statistic) of a long column in
    * TWO scans and zero global sorts — the shape that survives 100 TB
    * where `ORDER BY` + rank drains the table through a range exchange
    * and `percentile` sorts per group:
    *
    *  1. histogram of `value >> shift` (one hash aggregate, map-side
    *     combined; bucket count = value-range / 2^shift, asserted
    *     ≤ 2^20 so the driver walk is trivial) locates the bucket
    *     holding the target rank;
    *  2. a per-VALUE count aggregate restricted to that one bucket
    *     (filter pushed to the scan) resolves the exact value at the
    *     residual rank.
    *
    * Arithmetic-shift bucketing keeps negatives ordered (shiftright
    * floors), and ranks over ties are well-defined because the walk is
    * over (value, count) — no tiebreaker needed. `shift` is the one
    * dial: pick it from the column's known scale so buckets fit the
    * driver; an auto variant would spend one extra min/max scan.
    * Exactly reproducible under any partitioning — the oracle replays
    * it as a plain order statistic (q278). */
  def histogramMedian(df: DataFrame, valueCol: Column,
                      shift: Int = 28): DataFrame = {
    val spark = df.sparkSession
    val v = df.select(valueCol.cast("long").as("v"))
    val hist = v.groupBy(shiftright(col("v"), shift).as("b"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    require(hist.length <= (1 << 20),
      s"shift=$shift yields ${hist.length} buckets; raise shift")
    val n = hist.map(_._2).sum
    val k = (n + 1) / 2
    def walk(arr: Array[(Long, Long)], target: Long): (Long, Long) = {
      var cum = 0L
      for ((value, c) <- arr) {
        if (cum + c >= target) return (value, target - cum)
        cum += c
      }
      throw new IllegalStateException("rank beyond histogram")
    }
    val (bucket, rIn) = walk(hist, k)
    val inBucket = v.where(shiftright(col("v"), shift) === bucket)
      .groupBy("v").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val (median, _) = walk(inBucket, rIn)
    import spark.implicits._
    Seq((n, median)).toDF("n", "median")
  }
}
