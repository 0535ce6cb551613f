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
                   maxLenUs: Long): DataFrame =
    overlaps(df, keyCols, idCols, startCol, endCol, maxLenUs, bucketed = true)

  /** The naive blocked form: equi-join on `keyCols` only, overlap as
    * residual — row-identical to [[overlapsSelf]] (same canonical
    * ordering, same length enforcement). FASTER when the blocking keys
    * are selective (a handful of rows each): the Δ-explode doubles one
    * side for fan-out the keys already bounded. The 100 TB cliff is per-
    * key density, not table size — see [[overlapsSelfAuto]]. */
  def overlapsSelfNaive(df: DataFrame, keyCols: Seq[String], idCols: Seq[String],
                        startCol: String, endCol: String,
                        maxLenUs: Long): DataFrame =
    overlaps(df, keyCols, idCols, startCol, endCol, maxLenUs, bucketed = false)

  /** Key-shape-driven choice between [[overlapsSelfNaive]] and
    * [[overlapsSelf]] — the dial SCALING.md measures (selective keys:
    * naive 4.7 s vs bucketed 6.7 s; one hot key: naive 97 s vs bucketed
    * 18 s). Estimates the max per-key row count from a `sampleFraction`
    * sample (hot keys are exactly what a uniform sample cannot miss)
    * and buckets when the estimate crosses `hotKeyRows`. Costs one
    * sampled aggregation job up front — the same price the LSH/IVF
    * auto-parameterizations pay, and worth it for the 5× swing in
    * either direction; pipelines that know their key shape should call
    * the explicit form and skip the job. */
  def overlapsSelfAuto(df: DataFrame, keyCols: Seq[String], idCols: Seq[String],
                       startCol: String, endCol: String, maxLenUs: Long,
                       hotKeyRows: Long = 10000, sampleFraction: Double = 0.01,
                       seed: Long = 42L): DataFrame = {
    require(sampleFraction > 0 && sampleFraction <= 1,
      s"sampleFraction=$sampleFraction must be in (0, 1]")
    val sampledMax = df.sample(withReplacement = false, sampleFraction, seed)
      .groupBy(keyCols.map(col): _*).count()
      .agg(max("count")).collect().headOption
      .flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Long])).getOrElse(0L)
    val estMaxPerKey = (sampledMax / sampleFraction).toLong
    if (estMaxPerKey >= hotKeyRows)
      overlapsSelf(df, keyCols, idCols, startCol, endCol, maxLenUs)
    else
      overlapsSelfNaive(df, keyCols, idCols, startCol, endCol, maxLenUs)
  }

  private def overlaps(df: DataFrame, keyCols: Seq[String], idCols: Seq[String],
                       startCol: String, endCol: String,
                       maxLenUs: Long, bucketed: Boolean): DataFrame = {
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

    def side(n: Int): DataFrame = (idCols ++ Seq(startCol, endCol, "__s", "__e"))
      .foldLeft(checked.select((keyCols ++ idCols ++ Seq(startCol, endCol)).map(col) :+
        col("__s") :+ col("__e"): _*))(
        (d, c) => d.withColumnRenamed(c, s"${c}_$n"))

    // the later-STARTING side probes its own bucket and the previous
    // one: overlap + bounded length ⇒ 0 ≤ s₂ − s₁ ≤ L ⇒ the starts'
    // buckets are equal or adjacent
    val one =
      if (bucketed) side(1).withColumn("__bucket", expr(s"__s_1 DIV ${maxLenUs}L"))
      else side(1)
    val two =
      if (bucketed) side(2).withColumn("__bucket",
        explode(array(expr(s"__s_2 DIV ${maxLenUs}L"),
          expr(s"__s_2 DIV ${maxLenUs}L") - 1)))
      else side(2)

    val id1 = struct(idCols.map(c => col(s"${c}_1")): _*)
    val id2 = struct(idCols.map(c => col(s"${c}_2")): _*)
    one.join(two, if (bucketed) keyCols :+ "__bucket" else keyCols)
      .where(
        // canonical order: (start, id) strictly increasing
        (col("__s_1") < col("__s_2") ||
          (col("__s_1") === col("__s_2") && id1 < id2)) &&
        // inclusive overlap residual
        col("__s_1") <= col("__e_2") && col("__s_2") <= col("__e_1"))
      .drop("__bucket", "__s_1", "__e_1", "__s_2", "__e_2")
  }
}
