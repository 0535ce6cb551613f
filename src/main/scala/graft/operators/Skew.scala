package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys — the manual dials used when
  * AQE's runtime skew-join splitting is unavailable (non-shuffle-join
  * plans) or insufficient (one key ≫ a partition).
  *
  * `saltedAggregate` is two-phase aggregation: partial aggregation on
  * (key, salt) spreads a hot key over `salt` reducers, then a second,
  * tiny aggregation merges the partials. Only algebraic aggregates
  * (sum/count/min/max) compose this way — the API takes the partial and
  * merge expressions explicitly so misuse is visible at the call site.
  *
  * `saltedJoin` replicates the (small) right side `salt` times so a
  * skewed left key's rows distribute over `salt` tasks.
  *
  * The salt mixes a per-row disambiguator (`monotonically_increasing_id`)
  * into the row hash: fully identical rows — the most common hot-key
  * pathology — still spread over all salt buckets (a pure row-content
  * hash would send every copy to one bucket and the mitigation would
  * degenerate to the unsalted plan). Salt assignment therefore varies
  * run-to-run with partitioning, but every aggregate/join result is
  * salt-invariant by construction.
  */
object Skew {

  /** Two-phase (salted) sum/count aggregation over a possibly-skewed
    * key. Returns one row per key with `sum_<c>` / `cnt` columns. */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
                     salt: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(col).toSeq :+ monotonically_increasing_id(): _*),
        lit(salt.toLong)))
    val partial = salted.groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial.groupBy(col(key))
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("cnt"))
  }

  /** Broadcast-free skewed equi-join: salts the big (left) side, fans
    * the small (right) side out over every salt value. Semantically an
    * inner equi-join on `key`. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salt: Int): DataFrame = {
    val l = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toSeq :+ monotonically_increasing_id(): _*),
        lit(salt.toLong)))
    val r = small.withColumn("__salt",
      explode(array((0 until salt).map(lit(_)): _*)))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
