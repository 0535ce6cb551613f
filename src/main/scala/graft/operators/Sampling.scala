package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weighted SYSTEMATIC sampling — the deterministic mixture-construction
  * primitive of training-data pipelines ("take ~k documents from this
  * corpus, proportional to length/quality-weight, reproducibly"):
  * conceptually lay every row's integer weight end-to-end along a line
  * in id order and pick the row under every step-th tick
  * (step = ⌊total/k⌋). Every selection is exact integer arithmetic —
  * no RNG, no floats — so the sample is stable across runs, engines and
  * partitionings, and weight-proportional by construction (a row of
  * weight w covers w ticks' worth of line, so it is picked ⌈w/step⌉ ≥ 1
  * times the share a unit-weight row gets; rows with w ≥ step are
  * always picked — the deterministic analog of inclusion-probability
  * min(1, k·w/W) in Sunter/systematic-PPS sampling).
  *
  * The global prefix sum is computed DISTRIBUTED, never through a
  * single-partition global window (the classic cliff: a global
  * `Window.orderBy` drains the table through ONE task):
  * range-repartition by id (so partitions are contiguous id ranges in
  * order), per-partition totals → driver (one row per partition —
  * bounded by cluster parallelism, not data), exclusive prefix offsets
  * broadcast back, in-partition running sum under a PER-PARTITION
  * window. Two passes over (id, weight) pairs; at 100 TB both are
  * narrow-column scans and the only wide machinery is the range
  * exchange.
  */
object Sampling {

  /** @param df        input
    * @param idCol     unique orderable id (the deterministic line order)
    * @param weightCol positive integral weight (rows with weight ≤ 0 or
    *                  NULL are excluded — they cover no line segment)
    * @param k         approximate sample size (exact when step divides
    *                  the weight layout evenly; never less than k)
    * @return (idCol, weightCol, cum) of the selected rows, where `cum`
    *         is the inclusive prefix weight — deterministic, so it
    *         doubles as the selection's audit trail
    */
  def systematicSample(df: DataFrame, idCol: String, weightCol: String,
                       k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be positive")
    val spark = df.sparkSession
    val w = df.select(col(idCol), col(weightCol).cast("long").as(weightCol))
      .where(col(weightCol) > 0)
    // contiguous id ranges per partition, ordered within. Cached: the
    // totals pass and the selection pass must see the SAME partitioning
    // (session-scoped cache, same convention as cosineTopKBlocked —
    // Bench/Verify clearCache per query).
    val parted = w.repartitionByRange(col(idCol))
      .sortWithinPartitions(idCol)
      .withColumn("__pid", spark_partition_id())
      .cache()
    // one row per partition: the bounded driver round-trip
    val partTotals = parted.groupBy("__pid")
      .agg(sum(weightCol).as("__psum"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    val total = partTotals.map(_._2).sum
    require(total >= k,
      s"total weight $total < k=$k — nothing sensible to sample")
    val step = total / k
    // exclusive prefix offset per partition (range partitions are in
    // id order, so pid order IS line order)
    val offsets = partTotals
      .scanLeft((0, 0L)) { case ((_, acc), (pid, s)) => (pid, acc + s) }
      .init.zip(partTotals)
      .map { case ((_, off), (pid, _)) => (pid, off) }
    val offDf = spark.createDataFrame(offsets.toSeq).toDF("__pid", "__off")
    // running sum stays inside each range partition; the broadcast
    // offset join globalizes it without a global sort
    val cum = parted.join(broadcast(offDf), "__pid")
      .withColumn("cum", col("__off") +
        sum(col(weightCol)).over(
          Window.partitionBy("__pid").orderBy(idCol)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    cum.where(expr(s"cum DIV ${step}L") >
        expr(s"(cum - $weightCol) DIV ${step}L"))
      .select(col(idCol), col(weightCol), col("cum"))
  }

  /** Materialize a training MIXTURE: apportion `k` slots across the
    * groups of `srcCol` proportionally to their total `weightCol`
    * (largest-remainder / Hamilton apportionment — exact BIGINT
    * quotas), then DRAW each group's slots deterministically by
    * (md5(id), id) hash order — reproducible, ingestion-order-free,
    * and unbiased by any meaningful column. The composition of the
    * q90 allocation and the q92 ranked pick: allocation says how many,
    * the hash rank says which.
    *
    * Returns (id, src, rk, slots) for drawn rows only; a group with
    * fewer rows than slots contributes everything it has (under-fill
    * is visible as max(rk) < slots, left to the caller's re-balance
    * policy).
    *
    * Scale shape: the apportionment runs on #groups rows
    * (domain-bounded; its global rank window is over that tiny frame,
    * not data), the rank window partitions BY GROUP (bounded by the
    * largest group like q92), and the slot table joins back broadcast.
    * Weights must be non-negative; k ≥ 1. */
  def mixtureDraw(df: DataFrame, idCol: String, srcCol: String,
                  weightCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val w = df.groupBy(col(srcCol)).agg(sum(col(weightCol)).as("weight"))
    val t = w.agg(sum(col("weight")).as("tot"))
    val q = w.crossJoin(t).select(col(srcCol), col("weight"),
      expr(s"(weight * $k) DIV tot").as("base"),
      expr(s"(weight * $k) % tot").as("rem"))
    val r = q.withColumn("rr", row_number().over(
      Window.orderBy(col("rem").desc, col(srcCol))))
    val sb = q.agg(sum(col("base")).as("sb"))
    val alloc = r.crossJoin(sb).select(col(srcCol),
      (col("base") + when(col("rr") <= lit(k.toLong) - col("sb"), 1L)
        .otherwise(0L)).as("slots"))
    val wr = Window.partitionBy(col(srcCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.select(col(idCol), col(srcCol),
        row_number().over(wr).cast("long").as("rk"))
      .join(broadcast(alloc), srcCol)
      .where(col("rk") <= col("slots"))
      .select(col(idCol), col(srcCol), col("rk"), col("slots"))
  }

  /** Nucleus (top-p) truncation of a weighted key set per group — the
    * mixture-pruning move of data curation ("per language, keep the
    * head sources that together carry p of the tokens, drop the long
    * tail"). A key is KEPT iff the cumulative weight of strictly
    * heavier keys (ties broken by key order) is still below p·total,
    * so the key that crosses the p line is included — matching nucleus
    * sampling's definition — and at least one key per group always
    * survives.
    *
    * Integer weights in, one IEEE multiply (p·total) and one division
    * (the reported share) — deterministic across engines. The windows
    * partition by `groupCol`: per-group key cardinality (sources per
    * language, domains per bucket) is bounded by catalog size, never
    * by corpus row count, so no single partition grows with data
    * volume — run it on the AGGREGATED weights, not raw rows. */
  def nucleusTopP(weights: DataFrame, groupCol: String, keyCol: String,
                  weightCol: String, p: Double): DataFrame = {
    require(p > 0 && p <= 1, s"p=$p outside (0, 1]")
    val order = Window.partitionBy(groupCol)
      .orderBy(col(weightCol).desc, col(keyCol))
    val whole = Window.partitionBy(groupCol)
    weights
      .withColumn("cum", sum(col(weightCol)).over(order))
      .withColumn("tot", sum(col(weightCol)).over(whole))
      .select(col(groupCol), col(keyCol), col(weightCol),
        round(col("cum").cast("double") / col("tot"), 6).as("cum_share"),
        ((col("cum") - col(weightCol)) < lit(p) * col("tot")).as("kept"))
  }

  /** Uniform-target mixture epochs: given per-source token weights,
    * how many passes (epochs) over each source a training run makes
    * when every source must contribute an EQUAL share of the token
    * budget (the budget being the corpus total) — epochs > 1 marks
    * sources that will repeat (risking memorization), epochs < 1
    * sources that are subsampled. Integer sums, one division per
    * reported ratio (round 6); the totals row is a broadcast, never a
    * window over the corpus. */
  def mixtureEpochs(weights: DataFrame, keyCol: String,
                    weightCol: String): DataFrame = {
    val t = weights.agg(sum(col(weightCol)).as("__total"),
      count(lit(1)).as("__k"))
    weights.crossJoin(broadcast(t)).select(
      col(keyCol), col(weightCol),
      round(col(weightCol).cast("double") / col("__total"), 6)
        .as("natural_share"),
      round(lit(1.0) / col("__k"), 6).as("target_share"),
      round(col("__total").cast("double") / (col("__k") * col(weightCol)), 6)
        .as("epochs"))
  }
}
