package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity-resolution blocking: generate candidate pairs WITHOUT the
  * all-pairs cross join.
  *
  * Sorted-neighborhood (Hernández & Stolfo, SIGMOD '95) is the classic
  * third blocking family next to key-equality blocking (the LSH/band
  * joins in [[Dedup]]) and similarity-prefix blocking
  * ([[Dedup]]'s Jaccard prefix filter): sort the corpus by a blocking
  * key and compare each record only to its `w` successors in sort
  * order. Candidates are O(n·w) instead of O(n²), and near-matches
  * with slightly different keys still meet because they land near each
  * other in the order.
  *
  * The distributed formulation: a global total order is exactly the
  * single-task-window trap, so ranks come from [[Rank.globalRank]]
  * (range-exchange + per-partition windows, fully parallel), and the
  * "next w records" relation becomes an EQUI-join on rank after
  * exploding each row into its `w` successor slots — a plain shuffle
  * join that AQE can size, never a range/theta join. Partition-boundary
  * pairs need no special case: ranks are global, so a pair spanning two
  * range partitions still meets in the rank-join shuffle.
  */
object Linkage {

  /** Candidate pairs of rows at rank distance 1..`w` in the total
    * order given by `orderCols` (pass a unique tiebreaker last — the
    * [[Rank.globalRank]] contract). Every input column appears twice,
    * prefixed `a_`/`b_` (a-side is the rank-lower row), plus
    * `rank_gap` ∈ [1, w]. The caller applies its verify predicate
    * (edit distance, numeric closeness, …) on the paired columns —
    * blocking and matching stay separate concerns. */
  def sortedNeighborhood(df: DataFrame, w: Int, orderCols: Column*): DataFrame = {
    require(w >= 1, s"window must be >= 1, got $w")
    val ranked = Rank.globalRank(df, "__rn", orderCols: _*)
    def side(p: String) = ranked.columns.foldLeft(ranked) { (d, c) =>
      d.withColumnRenamed(c, p + c)
    }
    side("a_")
      .withColumn("__off", explode(array((1 to w).map(lit): _*)))
      .withColumn("b___rn", col("a___rn") + col("__off"))
      .join(side("b_"), "b___rn")
      .withColumn("rank_gap", col("__off").cast("long"))
      .drop("__off", "a___rn", "b___rn")
  }
}
