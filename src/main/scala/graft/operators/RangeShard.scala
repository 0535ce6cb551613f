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
  * block OFFSETS come from a per-block aggregate whose cumulative sum
  * is the only unpartitioned window — over n/blockWidth rows, i.e.
  * ~1 M offset rows for a billion-row table, a single-task sort of a
  * few MB. (A third level repeats the trick if even that grows too
  * large.) The total rides in on a broadcast one-row frame.
  */
object RangeShard {

  /** Per-shard summary: (shard, n_docs, char_sum, min_doc, max_doc).
    * `idCol` must be a non-negative integral key; ties impossible
    * (ids are the order). */
  def plan(df: DataFrame, idCol: String, weightCol: String,
           shards: Int, blockWidth: Long = 1024L): DataFrame = {
    val base = df.select(col(idCol).cast("long").as("id"),
        col(weightCol).cast("long").as("w"))
      .withColumn("blk", expr(s"id DIV $blockWidth"))
    val within = base.withColumn("in_before",
      coalesce(sum(col("w")).over(Window.partitionBy("blk").orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val offsets = base.groupBy("blk").agg(sum(col("w")).as("bw"))
      .withColumn("off",
        coalesce(sum(col("bw")).over(Window.orderBy("blk")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("blk"), col("off"))
    val total = base.agg(sum(col("w")).as("total"))
    within.join(broadcast(offsets), "blk")
      .crossJoin(broadcast(total))
      .withColumn("cum_before", col("off") + col("in_before"))
      .withColumn("shard",
        expr(s"(cum_before * $shards) DIV total").cast("int"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("char_sum"),
        min(col("id")).as("min_doc"), max(col("id")).as("max_doc"))
  }
}
