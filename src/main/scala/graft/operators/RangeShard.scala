package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weight-balanced range sharding: assign ordered rows to `shards`
  * contiguous buckets of ~equal total WEIGHT (bytes, chars, rows…) —
  * the boundary table a writer needs to emit evenly-sized ordered
  * output files, and what Spark's `RangePartitioner` approximates by
  * sampling. Here it is exact: shard(r) = ⌊cumBefore(r)·K / total⌋
  * over the exclusive running weight sum in key order.
  *
  * The exact global cumulative sum is computed WITHOUT a global
  * single-task sort (the naive `Window.orderBy(key)` moves the whole
  * table through one partition): keys group into coarse blocks of
  * `blockWidth` consecutive ids, the running sum WITHIN a block is a
  * partitioned window (parallel, each ≤ blockWidth rows), and the
  * block OFFSETS come from a RECURSIVE call on the n/blockWidth-row
  * block frame — so the only unpartitioned window is the recursion's
  * base case over ≤ blockWidth rows, no matter the input size
  * (levels = log_blockWidth(n); a trillion rows at width 1024 is 4).
  * The total rides in on a broadcast one-row frame.
  */
object RangeShard {

  /** Exclusive running-weight sum in `id` order, RECURSIVELY
    * two-leveled: blocks of `blockWidth` consecutive ids get a
    * partitioned within-block window; block totals get their offsets
    * from a recursive call on the (n/blockWidth)-row block frame. The
    * recursion bottoms out when the frame fits one unpartitioned
    * window of ≤ blockWidth rows — so NO single task ever sorts more
    * than blockWidth rows, at any input size (a trillion rows with
    * blockWidth 1024 is 4 levels; levels = log_blockWidth(n)).
    * Returns (id, w, cum_before). */
  private[graft] def exclusiveCumSum(df: DataFrame,
                                     blockWidth: Long): DataFrame = {
    val floorRows = blockWidth
    // the small-frame base case: one bounded unpartitioned window
    // (the probe reads at most floorRows+1 rows)
    if (df.limit(math.min(floorRows + 1, Int.MaxValue - 1L).toInt).count()
        <= floorRows)
      df.withColumn("cum_before",
        coalesce(sum(col("w")).over(Window.orderBy("id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    else {
      val base = df.withColumn("blk", expr(s"id DIV $blockWidth"))
      val within = base.withColumn("in_before",
        coalesce(sum(col("w")).over(Window.partitionBy("blk").orderBy("id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      val blocks = base.groupBy("blk").agg(sum(col("w")).as("bw"))
        .select(col("blk").as("id"), col("bw").as("w"))
      val offsets = exclusiveCumSum(blocks, blockWidth)
        .select(col("id").as("blk"), col("cum_before").as("off"))
      within.join(broadcast(offsets), "blk")
        .withColumn("cum_before", col("off") + col("in_before"))
        .drop("blk", "in_before", "off")
    }
  }

  /** Per-shard summary: (shard, n_docs, char_sum, min_doc, max_doc).
    * `idCol` must be a non-negative integral key; ties impossible
    * (ids are the order). */
  def plan(df: DataFrame, idCol: String, weightCol: String,
           shards: Int, blockWidth: Long = 1024L): DataFrame = {
    val base = df.select(col(idCol).cast("long").as("id"),
      col(weightCol).cast("long").as("w"))
    val total = base.agg(sum(col("w")).as("total"))
    exclusiveCumSum(base, blockWidth)
      .crossJoin(broadcast(total))
      .withColumn("shard",
        expr(s"(cum_before * $shards) DIV total").cast("int"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("char_sum"),
        min(col("id")).as("min_doc"), max(col("id")).as("max_doc"))
  }
}
