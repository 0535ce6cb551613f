package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap self-join: pairs of rows sharing an equi key whose
  * [start, end] intervals intersect (inclusive) — scheduling conflicts,
  * concurrent sessions, co-occurring validity windows.
  *
  * The naive form `JOIN ON keys AND a.s <= b.e AND b.s <= a.e` blocks
  * only on the equi keys: every same-key pair is materialized and the
  * overlap residual filters afterwards — n² per key, the same 100 TB
  * cliff as the naive band join.
  *
  * With a known bound L on interval LENGTH, two overlapping intervals
  * must start within L of each other (a.s ≤ b.e = b.s + len_b ≤ b.s+L,
  * and symmetrically), so the Δ-bucket trick applies with W = L: bucket
  * every start, have the later-starting side probe its own bucket and
  * the previous one, join on (keys, bucket), keep the overlap predicate
  * as residual. Per-key cost drops from n² to Σ adjacent-bucket
  * populations² — the standard interval-join binning; engines that
  * don't bound length split long intervals into L-sized segments
  * instead (same idea, one row per segment).
  *
  * The length bound is ENFORCED, not assumed: a row whose interval
  * exceeds `maxLenUs` fails the query loudly (`raise_error`) rather
  * than silently missing pairs.
  *
  * When to use (measured, SCALING.md): bucketing wins when per-key
  * density carries the volume — a hot key measured 97 s naive vs 18 s
  * bucketed at 191k same-key intervals. When the blocking keys are
  * already selective (a handful of rows each), the naive blocked
  * equi-join is FASTER (4.7 s vs 6.7 s at 4.8M rows over 200k keys):
  * the explode doubles one side for fan-out the equi keys already
  * bounded. Choose by key shape, not table size.
  *
  * Pairs are emitted once, in canonical order: (s, id) of side 1
  * lexicographically below side 2's (ties on equal starts break by the
  * id struct).
  */
object IntervalJoin {

  /** @param df       input; must contain `keyCols ++ idCols` and the
    *                 interval columns
    * @param keyCols  equi keys (blocking; output unsuffixed)
    * @param idCols   row identity (output as `<name>_1` / `<name>_2`);
    *                 (keyCols, idCols) must uniquely identify a row
    * @param startCol interval start (timestamp; output `<name>_1/_2`)
    * @param endCol   interval end (timestamp, ≥ start; output
    *                 `<name>_1/_2`)
    * @param maxLenUs enforced upper bound on end − start, microseconds
    */
  def overlapsSelf(df: DataFrame, keyCols: Seq[String], idCols: Seq[String],
                   startCol: String, endCol: String,
                   maxLenUs: Long): DataFrame = {
    require(maxLenUs > 0, s"maxLenUs=$maxLenUs must be positive")
    // cast("timestamp") admits TIMESTAMP_NTZ columns too (exact under
    // the engine-wide UTC session contract)
    val checked = df
      .withColumn("__s", unix_micros(col(startCol).cast("timestamp")))
      .withColumn("__e", unix_micros(col(endCol).cast("timestamp")))
      .withColumn("__len_ok",
        when((col("__e") - col("__s")).between(lit(0L), lit(maxLenUs)), lit(true))
          .otherwise(raise_error(concat(
            lit(s"interval longer than maxLenUs=$maxLenUs or negative: "),
            col(startCol).cast("string"), lit(" .. "),
            col(endCol).cast("string")))))
      .where(col("__len_ok"))
      .withColumn("__bucket", expr(s"__s DIV ${maxLenUs}L"))

    def side(n: Int): DataFrame = (idCols ++ Seq(startCol, endCol, "__s", "__e"))
      .foldLeft(checked.select((keyCols ++ idCols ++ Seq(startCol, endCol)).map(col) :+
        col("__s") :+ col("__e") :+ col("__bucket"): _*))(
        (d, c) => d.withColumnRenamed(c, s"${c}_$n"))

    // the later-STARTING side probes its own bucket and the previous
    // one: overlap + bounded length ⇒ 0 ≤ s₂ − s₁ ≤ L ⇒ the starts'
    // buckets are equal or adjacent
    val one = side(1)
    val two = side(2).withColumn("__bucket",
      explode(array(col("__bucket"), col("__bucket") - 1)))

    val id1 = struct(idCols.map(c => col(s"${c}_1")): _*)
    val id2 = struct(idCols.map(c => col(s"${c}_2")): _*)
    one.join(two, keyCols :+ "__bucket")
      .where(
        // canonical order: (start, id) strictly increasing
        (col("__s_1") < col("__s_2") ||
          (col("__s_1") === col("__s_2") && id1 < id2)) &&
        // inclusive overlap residual
        col("__s_1") <= col("__e_2") && col("__s_2") <= col("__e_1"))
      .drop("__bucket", "__s_1", "__e_1", "__s_2", "__e_2")
  }
}
