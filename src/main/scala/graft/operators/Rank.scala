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
  def globalRank(df: DataFrame, rankCol: String, orderCols: Column*): DataFrame = {
    val spark = df.sparkSession
    // cached: the count pass and the rank pass must see the SAME
    // range partitioning (session-scoped; Bench/Verify clear per query)
    val parted = df.repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .cache()
    val counts = parted.groupBy("__pid").agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (pid, n)) =>
      (pid, acc + n)
    }.init.zip(counts).map { case ((_, off), (pid, _)) => (pid, off) }
    val offDf = spark.createDataFrame(offsets.toSeq).toDF("__pid", "__off")
    parted.join(broadcast(offDf), "__pid")
      .withColumn(rankCol, col("__off") +
        row_number().over(Window.partitionBy("__pid").orderBy(orderCols: _*)))
      .drop("__pid", "__off")
  }

  /** Distributed inclusive prefix SUM of a long column in `orderCols`
    * order — `sum(x) OVER (ORDER BY … ROWS UNBOUNDED PRECEDING)`
    * without the single-partition cliff. Identical two-pass shape to
    * [[globalRank]], with per-partition TOTALS of `valueCol` shipped
    * to the driver instead of counts. The running total is the
    * backbone of cumulative-share reports (ABC / Pareto
    * classification) and of [[Sampling.systematicSample]]'s weight
    * line. `valueCol` must be integral (exact under any summation
    * order); the order-key tuple must be unique per row. */
  def globalPrefixSum(df: DataFrame, sumCol: String, valueCol: String,
                      orderCols: Column*): DataFrame = {
    val spark = df.sparkSession
    val parted = df.repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .cache()
    val totals = parted.groupBy("__pid")
      .agg(sum(col(valueCol).cast("long")).as("__t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = totals.scanLeft((0, 0L)) { case ((_, acc), (pid, t)) =>
      (pid, acc + t)
    }.init.zip(totals).map { case ((_, off), (pid, _)) => (pid, off) }
    val offDf = spark.createDataFrame(offsets.toSeq).toDF("__pid", "__off")
    parted.join(broadcast(offDf), "__pid")
      .withColumn(sumCol, col("__off") +
        sum(col(valueCol).cast("long")).over(
          Window.partitionBy("__pid").orderBy(orderCols: _*)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__pid", "__off")
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
