package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Poisson bootstrap — uncertainty quantification that
  * scales like an aggregation, not like a resample.
  *
  * The classical bootstrap draws n rows with replacement B times — at
  * 100 TB that is B full shuffles of the fact table. The Poisson
  * bootstrap (Chamandy et al., "Estimating Uncertainty for Massive
  * Data Streams", Google 2012 — public) replaces the multinomial draw
  * with an independent Poisson(1) weight per (row, replicate): each
  * replicate's aggregate is then a weighted SUM computable in the SAME
  * single pass as the plain aggregate, map-side combined, no shuffle of
  * row data at all — only (group × B) partial rows move.
  *
  * Determinism: the Poisson draw is the 60-bit md5 prefix of
  * `key|replicate` compared against precomputed integer thresholds
  * floor(CDF_Poisson(1)(k) · 2^60) — no RNG state, no libm at query
  * time, bit-identical on any engine (the q51 portable-sketch stance).
  * Weights are capped at 4 (CDF 0.981 → the top 1.9% of draws);
  * the cap loses ~0.4% of resample mass, far inside the CI noise floor,
  * and keeps the CASE chain 4 branches deep.
  */
object Bootstrap {

  /** floor(CDF_Poisson(λ=1)(k) · 2^60) for k = 0..3; ≥ t(3) ⇒ weight 4. */
  val Thresholds: Seq[Long] = Seq(
    424136118829305344L,   // CDF(0) = e^-1
    848272237658610688L,   // CDF(1)
    1060340297073263360L,  // CDF(2)
    1131029650211480960L)  // CDF(3)

  /** Poisson(1) weight of a 60-bit uniform hash. */
  def poissonWeight(h: Column): Column =
    when(h < Thresholds(0), 0)
      .when(h < Thresholds(1), 1)
      .when(h < Thresholds(2), 2)
      .when(h < Thresholds(3), 3)
      .otherwise(4)

  /** The same CASE chain as DuckDB SQL over a hash expression. */
  def poissonWeightSql(h: String): String =
    s"""CASE WHEN $h < ${Thresholds(0)} THEN 0
       |     WHEN $h < ${Thresholds(1)} THEN 1
       |     WHEN $h < ${Thresholds(2)} THEN 2
       |     WHEN $h < ${Thresholds(3)} THEN 3
       |     ELSE 4 END""".stripMargin

  /** Per-group mean of an exact integer value column (cents-scaled by
    * `scale`) with a B-replicate Poisson-bootstrap percentile CI.
    * `keyCol` must be a row-unique string. Returns one row per group:
    * (group, n_rows, mean_<alias>, ci_lo, ci_hi) with the CI bounds the
    * 2nd and (B−1)th order statistics of the replicate means (≈2.5% /
    * 97.5% at B = 64).
    *
    * Plan shape: the fact scan explodes ×B (rows never shuffle — the
    * weight is computed inline and partial sums combine map-side), one
    * exchange of (group × B) partials, one tiny per-group window over B
    * rows to pick the order statistics. */
  def groupedMeanCI(df: DataFrame, groupCol: String, keyCol: Column,
                    cents: Column, scale: Double = 100.0,
                    b: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(groupCol).as("g"), keyCol.as("key"),
      cents.as("cents"))
    // pinned: the replicate pass reduces to (groups × B) rows here, and
    // BOTH order-statistic joins below consume it — without the pin each
    // join re-runs it (the Reconcile drill-down lesson, SCALING.md).
    val rep = replicateSums(base, b)
      .withColumn("mean_b",
        col("s").cast("double") / (col("n").cast("double") * lit(scale)))
      .localCheckpoint(true)
      .withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("mean_b"), col("b"))))
    val pt = base.groupBy("g")
      .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("sc"))
    pt.join(rep.where(col("rn") === 2)
        .select(col("g"), round(col("mean_b"), 6).as("ci_lo")), "g")
      .join(rep.where(col("rn") === b - 1)
        .select(col("g"), round(col("mean_b"), 6).as("ci_hi")), "g")
      .select(col("g"), col("n_rows"),
        round(col("sc").cast("double") / (col("n_rows") * lit(scale)), 6)
          .as("mean_v"),
        col("ci_lo"), col("ci_hi"))
  }

  /** The (g, b, s = Σ w·cents, n = Σ w) replicate table over a
    * `(g, key, cents)` frame — via the one-pass
    * [[graft.functions.BootstrapSums]] aggregate: the B-way fan-out
    * lives inside a 2B-long combiner buffer, so the shuffle carries
    * groups × 2B longs, independent of row count (the explode-×B
    * formulation it replaces shuffled nothing either, but pushed B
    * rows per input row through the aggregation — measured 69 s at
    * sf0.1 composable, ~7 s fused-explode, ~3 s this form; all three
    * draw-for-draw identical, PlannerSpec). Replicates that drew no
    * rows (n = 0, impossible beyond toy sizes) are dropped to match
    * the exploded form's `w > 0` semantics. */
  def replicateSums(base: DataFrame, b: Int): DataFrame = {
    // The partial aggregate does B md5 draws PER ROW — the per-row cost
    // is ~64× a scan's — but it runs at the SCAN's parallelism, and the
    // local testdata fact table is a couple of parquet splits (measured
    // r12: q196 at 7.2 s cpu≈wall on ~1 of 32 cores). Widen only when
    // the input is narrower than the session parallelism: one
    // round-robin shuffle of the narrow (g, key, cents) rows buys
    // full-width hashing; on a real cluster the fact scan already has
    // thousands of splits and this is a no-op.
    val want = base.sparkSession.sparkContext.defaultParallelism
    val wide = if (base.rdd.getNumPartitions < want)
      base.repartition(want) else base
    wide.groupBy("g")
      .agg(graft.functions.BootstrapExpr.bootstrapSums(
        col("key"), col("cents"), b, Thresholds).as("bs"))
      .select(col("g"), posexplode(col("bs")).as(Seq("b", "p")))
      .select(col("g"), col("b"), col("p.s").as("s"), col("p.n").as("n"))
      .where(col("n") > 0)
  }

  /** Two-sample bootstrap: CI on mean(gA) − mean(gB). The SAME B
    * replicates resample both groups (keys are globally unique, so the
    * draws are independent between groups), each replicate yields one
    * difference, and the CI is the 2nd/(B−1)th order statistic of the
    * differences — the A/B-test read-out. One pass over both groups
    * together; everything else as [[groupedMeanCI]]. Returns one row:
    * (n_a, n_b, diff_mean, ci_lo, ci_hi). */
  def diffMeanCI(df: DataFrame, groupCol: String, gA: String, gB: String,
                 keyCol: Column, cents: Column, scale: Double = 100.0,
                 b: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.where(col(groupCol).isin(gA, gB))
      .select(col(groupCol).as("g"), keyCol.as("key"), cents.as("cents"))
    val rep = replicateSums(base, b)
      .withColumn("mean_b",
        col("s").cast("double") / (col("n").cast("double") * lit(scale)))
      .localCheckpoint(true) // both group slices + the window read it
    val diffs = rep.where(col("g") === gA)
      .select(col("b"), col("mean_b").as("ma"))
      .join(rep.where(col("g") === gB)
        .select(col("b"), col("mean_b").as("mb")), "b")
      .withColumn("d", col("ma") - col("mb"))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("d"), col("b")))) // B rows — bounded window
    val pt = base.groupBy("g")
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sc"))
    val pa = pt.where(col("g") === gA)
      .select(col("n").as("n_a"), col("sc").as("sa"))
    val pb = pt.where(col("g") === gB)
      .select(col("n").as("n_b"), col("sc").as("sb"))
    pa.crossJoin(pb)
      .crossJoin(diffs.where(col("rn") === 2)
        .select(round(col("d"), 6).as("ci_lo")))
      .crossJoin(diffs.where(col("rn") === b - 1)
        .select(round(col("d"), 6).as("ci_hi")))
      .select(col("n_a"), col("n_b"),
        round(col("sa").cast("double") / (col("n_a") * lit(scale)) -
          col("sb").cast("double") / (col("n_b") * lit(scale)), 6)
          .as("diff_mean"),
        col("ci_lo"), col("ci_hi"))
  }
}
