package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, cross-engine-replayable sketches.
  *
  * Spark's native sketches (`approx_count_distinct` HLL++,
  * `approx_percentile` GK) are the production path (q46) but their
  * internals are engine-specific — no oracle can replay them. These
  * operators implement the same two ideas from md5 hashing and exact
  * integer arithmetic, so a DuckDB oracle reproduces every bit (q51):
  *
  *  - [[hllDistinct]]: textbook HyperLogLog (Flajolet et al. 2007, raw
  *    estimator, no small/large-range correction — document, don't
  *    hide; the bucket count is sized so tested scales stay in the raw
  *    regime). The float-sensitive register sum Σ 2^-ρ is computed in
  *    an EXACT integer domain (Σ 2^(RemBits+1−ρ) over a BIGINT, total
  *    ≤ 2^61 — never rounds), making the estimate independent of
  *    aggregation order; the only float ops are IEEE-exact-rounded
  *    multiply/divide on identical literals, which agree across engines
  *    (unlike libm ln/log2, deliberately avoided — ρ itself is a
  *    comparison chain, not a logarithm).
  *  - [[bottomKSample]]: bottom-k-by-hash sampling — the k rows with
  *    the smallest md5 of a unique key form a uniform sample usable for
  *    quantile estimation. Deterministic: same corpus → same sample on
  *    any engine. Implemented with a row_number window (fine up to the
  *    tested scales); at extreme scale the same bounded TopKAggregate
  *    that backs cosine top-k is the drop-in (score = −hash).
  *
  * At 100 TB both are one shuffle: HLL reduces map-side to
  * (group, bucket, max ρ) — at most groups × 1024 rows cross the wire.
  */
object Sketches {

  /** m = 256 buckets: small enough that every tested scale (≥ ~1k
    * distinct per group at sf0.001) sits in the RAW-estimator regime —
    * the small-range linear-counting correction needs ln(), which is
    * libm-dependent and not bit-stable across engines, so the sketch
    * deliberately stays where the correction is unnecessary (std error
    * 1.04/√256 = 6.5%). */
  val BucketBits = 8
  val Buckets: Int = 1 << BucketBits // 256
  val RemBits: Int = 60 - BucketBits // 52 remainder bits
  /** Exact-integer register weight of an EMPTY bucket: 2^(RemBits+1)
    * (ρ = 0); a bucket with register ρ weighs 2^(RemBits+1-ρ). */
  val EmptyWeight: Long = 1L << (RemBits + 1)
  /** Raw-estimator bias constant α_m, from the SAME literal arithmetic
    * the oracle uses (IEEE ops on identical literals —
    * engine-independent). */
  def alphaExpr: Column = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(Buckets.toDouble))
  def alphaSql: String =
    s"(0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / ${Buckets.toDouble}::DOUBLE))"

  /** 60-bit md5 prefix of a column (the widest that fits a signed
    * long) — same family as MinHash/SimHash. */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 15), 16, 10).cast("long")

  /** ρ = position of the first set bit in the `RemBits`-bit (52-bit)
    * remainder (1-based from the top), RemBits+1 = 53 if the remainder
    * is zero. A comparison chain, NOT floor(log2(...)) — libm
    * logarithms are not bit-stable across engines; comparisons are. */
  def rho(r: Column): Column =
    (1 to RemBits).foldRight(lit(RemBits + 1): Column) { (i, els) =>
      when(r >= lit(1L << (RemBits - i)), lit(i)).otherwise(els)
    }

  /** The same ρ chain as DuckDB SQL (for oracle construction). */
  def rhoSql(r: String): String =
    (1 to RemBits).map(i => s"WHEN $r >= ${1L << (RemBits - i)} THEN $i")
      .mkString("CASE ", " ", s" ELSE ${RemBits + 1} END")

  /** Per-group HyperLogLog distinct estimate of `valueCol` as
    * `hll_<valueCol>` (DOUBLE, raw estimator). */
  /** The MERGEABLE state of [[hllDistinct]]: one (group, bucket, rho)
    * row per non-empty register. Sketch union = max(rho) per
    * (group, bucket) — associative/commutative/idempotent, which is
    * the whole point of shipping sketches between pipeline stages:
    * per-partition register tables merge into exactly the sketch of
    * the union (q107 certifies this against the direct sketch). */
  def hllRegisters(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val h = hash60(col(valueCol))
    df.select(col(groupCol), shiftright(h, RemBits).as("bucket"),
        h.bitwiseAND(lit((1L << RemBits) - 1)).as("r"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(rho(col("r"))).as("rho"))
  }

  /** Merge register tables (max per register) — sketch union. */
  def hllMergeRegisters(regs: DataFrame*): DataFrame = {
    // the group column is whatever [[hllRegisters]] carried through in
    // position 0; a group column literally named "bucket"/"rho" would
    // silently collide with the register columns — reject it
    val groupCol = regs.head.columns(0)
    require(groupCol != "bucket" && groupCol != "rho",
      s"group column '$groupCol' collides with the register schema")
    regs.reduce(_ unionByName _)
      .groupBy(groupCol, "bucket")
      .agg(max(col("rho")).as("rho"))
  }

  /** Raw-HLL estimate from a register table, named `hll_<alias>`. */
  def hllEstimate(registers: DataFrame, groupCol: String,
                  alias: String): DataFrame =
    hllEstimateBy(registers, Seq(groupCol), alias)

  /** [[hllEstimate]] generalized to a composite group key — the form a
    * pairwise/lattice analysis needs when registers have been max-merged
    * under a multi-column group (e.g. (set_a, set_b) union registers for
    * inclusion–exclusion overlap estimates). */
  def hllEstimateBy(registers: DataFrame, groupCols: Seq[String],
                    alias: String): DataFrame =
    // Σ 2^-ρ in the exact integer domain: Σ 2^(RemBits+1-ρ), empty
    // buckets contribute 2^(RemBits+1) each (ρ = 0 ⇔ weight 1); the
    // total stays ≤ m·2^(RemBits+1) = 2^61 — never rounds in a long
    registers.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("present"),
        sum(expr(s"shiftleft(1L, ${RemBits + 1} - rho)")).as("s_present"))
      .select(groupCols.map(col) :+
        (alphaExpr * lit(Buckets.toDouble) * lit(Buckets.toDouble) *
          lit(EmptyWeight.toDouble) /
          (col("s_present") + (lit(Buckets.toLong) - col("present")) * lit(EmptyWeight))
            .cast("double")).as(s"hll_$alias"): _*)

  def hllDistinct(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    hllEstimate(hllRegisters(df, groupCol, valueCol), groupCol, valueCol)

  /** Count-min-sketch heavy hitters: CMS counters (`depth` hash rows ×
    * `width` buckets) over one row per item OCCURRENCE, plus the CMS
    * estimate (min over the item's `depth` counters — always ≥ the
    * true count) for the `topK` items by true count (ties broken by
    * item value). Hash family is the portable Kirsch–Mitzenmacher
    * double hash from the two 60-bit md5 halves — the same md5-prefix
    * arithmetic as the MinHash family, so a DuckDB oracle replays the
    * counters and estimates exactly.
    *
    * Scale shape: true counts are ONE map-side-combined shuffle of the
    * vocabulary; the counter table is a fixed depth×width aggregate
    * (broadcast-sized by construction) — the sketch is what a pipeline
    * ships between stages, the exact counts here double as the
    * verification twin. */
  def heavyHittersCms(df: DataFrame, itemCol: String, depth: Int = 4,
                      width: Int = 1024, topK: Int = 20): DataFrame = {
    require(depth >= 1 && depth <= 14,
      s"depth=$depth outside [1, 14] (64-bit double-hash family)")
    require(width >= 1, s"width=$width must be positive")
    val counts = df.groupBy(col(itemCol)).agg(count(lit(1)).as("true_c"))
    // cached: counters and the top-k probe both read the hashed vocab
    // (Bench/Verify clear per-query caches)
    val hashed = counts
      .withColumn("md", md5(col(itemCol).cast("string").cast("binary")))
      .withColumn("h1", conv(substring(col("md"), 1, 15), 16, 10).cast("long"))
      .withColumn("h2", conv(substring(col("md"), 17, 15), 16, 10).cast("long")
        % lit(576460752303423488L))
      .drop("md")
      .cache()
    def withBuckets(d: DataFrame): DataFrame = d
      .select(col(itemCol), col("true_c"), col("h1"), col("h2"),
        explode(sequence(lit(0L), lit((depth - 1).toLong))).as("i"))
      .withColumn("bucket", pmod(col("h1") + col("i") * col("h2"), lit(width.toLong)))
    val counters = withBuckets(hashed)
      .groupBy(col("i"), col("bucket")).agg(sum(col("true_c")).as("cnt"))
    val top = hashed.orderBy(col("true_c").desc, col(itemCol)).limit(topK)
    withBuckets(top)
      .join(broadcast(counters), Seq("i", "bucket"))
      .groupBy(col(itemCol), col("true_c"))
      .agg(min(col("cnt")).as("est_c"))
  }

  /** The MERGEABLE state of [[heavyHittersCms]]: the depth×width
    * counter table (i, bucket, cnt) over item OCCURRENCE rows. CMS
    * counters merge by element-wise SUM ([[cmsMergeCounters]]) — with
    * [[hllRegisters]] (max-merge) and [[bottomKPairs]] (select-merge)
    * this completes the mergeable-state trio of the portable sketches
    * (q107/q109/q110 each certify merged ≡ direct). Same hash family
    * and bucket arithmetic as [[heavyHittersCms]]. */
  def cmsCounters(df: DataFrame, itemCol: String, depth: Int = 4,
                  width: Int = 1024): DataFrame = {
    require(depth >= 1 && depth <= 14,
      s"depth=$depth outside [1, 14] (64-bit double-hash family)")
    require(width >= 1, s"width=$width must be positive")
    df.groupBy(col(itemCol)).agg(count(lit(1)).as("true_c"))
      .withColumn("md", md5(col(itemCol).cast("string").cast("binary")))
      .withColumn("h1", conv(substring(col("md"), 1, 15), 16, 10).cast("long"))
      .withColumn("h2", conv(substring(col("md"), 17, 15), 16, 10).cast("long")
        % lit(576460752303423488L))
      .select(col("true_c"), col("h1"), col("h2"),
        explode(sequence(lit(0L), lit((depth - 1).toLong))).as("i"))
      .withColumn("bucket", pmod(col("h1") + col("i") * col("h2"), lit(width.toLong)))
      .groupBy(col("i"), col("bucket")).agg(sum(col("true_c")).as("cnt"))
  }

  /** Merge CMS counter tables (sketch union): element-wise sum. */
  def cmsMergeCounters(tables: DataFrame*): DataFrame =
    tables.reduce(_ unionByName _)
      .groupBy(col("i"), col("bucket")).agg(sum(col("cnt")).as("cnt"))

  /** CMS estimates (min over depth counters) for the given items, from
    * a counter table: (item, est_c). */
  def cmsEstimate(counters: DataFrame, items: DataFrame, itemCol: String,
                  depth: Int = 4, width: Int = 1024): DataFrame =
    items
      .withColumn("md", md5(col(itemCol).cast("string").cast("binary")))
      .withColumn("h1", conv(substring(col("md"), 1, 15), 16, 10).cast("long"))
      .withColumn("h2", conv(substring(col("md"), 17, 15), 16, 10).cast("long")
        % lit(576460752303423488L))
      .select(col(itemCol), col("h1"), col("h2"),
        explode(sequence(lit(0L), lit((depth - 1).toLong))).as("i"))
      .withColumn("bucket", pmod(col("h1") + col("i") * col("h2"), lit(width.toLong)))
      .join(broadcast(counters), Seq("i", "bucket"), "left")
      .groupBy(col(itemCol))
      // an absent counter row means that (i, bucket) cell is 0 — an
      // item hashed to an all-empty row estimates 0, and a partially
      // empty depth row clamps the min instead of dropping the row
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_c"))

  /** The k rows per group with the smallest 60-bit md5 of `keyCol` — a
    * deterministic uniform sample. If `keyCol` is not unique (rows
    * sharing a key hash identically), pass the downstream value
    * column(s) as `tieBreak`: rows tied on the hash then sort by value,
    * so the SELECTED VALUE MULTISET is engine-independent even when the
    * k-cut falls inside a tie group. (The testdata lineitem has 118k
    * duplicate (orderkey, linenumber) keys with differing prices — the
    * tie-break is what keeps q51 cross-engine exact.) */
  def bottomKSample(df: DataFrame, groupCol: String, keyCol: Column,
                    k: Int, tieBreak: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__h") +: tieBreak: _*)
    df.withColumn("__h", hash60(keyCol))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .drop("__h", "__rn")
  }

  /** The bounded-aggregate form of [[bottomKSample]] for a SINGLE value
    * column: per group, the k lexicographically smallest
    * (hash60(key), value) pairs, returned as (group, value) rows.
    * Selects the SAME value multiset as the window form ordered by
    * (hash, value) — pair selection subsumes the tie-break — but the
    * plan is a [[graft.functions.BottomKByKey]] aggregation: map-side
    * partials of ≤ k pairs, a shuffle of groups × k rows, and
    * parallelism set by the DATA, not the group count. The window form
    * sorts everything in #groups tasks — with 3 strata that is a
    * 3-task sort at any cluster size, the quiet scale-killer q51
    * carried until it switched to this form (SketchesSpec pins the
    * multiset equality). */
  def bottomKValues(df: DataFrame, groupCol: String, keyCol: Column,
                    valueCol: Column, k: Int): DataFrame =
    df.groupBy(col(groupCol))
      .agg(graft.functions.TopKAggregate
        .bottomkByKey(hash60(keyCol), valueCol.cast("double"), k).as("__bk"))
      .select(col(groupCol), explode(col("__bk").getField("v")).as("value"))

  /** The MERGEABLE state of [[bottomKValues]]: per group, the k
    * lexicographically smallest (hash, value) PAIRS as rows — the
    * quantile-sketch analogue of [[hllRegisters]]. Bottom-k by a fixed
    * hash is a SELECTION, so the global bottom-k is contained in the
    * union of any partition's bottom-ks — merging = union + re-select
    * ([[bottomKMergedValues]]); q109 certifies merged ≡ direct. */
  def bottomKPairs(df: DataFrame, groupCol: String, keyCol: Column,
                   valueCol: Column, k: Int): DataFrame =
    df.groupBy(col(groupCol))
      .agg(graft.functions.TopKAggregate
        .bottomkByKey(hash60(keyCol), valueCol.cast("double"), k).as("__bk"))
      .select(col(groupCol), explode(col("__bk")).as("p"))
      .select(col(groupCol), col("p.h").as("h"), col("p.v").as("value"))

  /** Merge bottom-k pair tables (sketch union): re-select the k
    * smallest pairs per group from the union, return the value rows —
    * same schema as [[bottomKValues]]. */
  def bottomKMergedValues(k: Int)(pairTables: DataFrame*): DataFrame = {
    val groupCol = pairTables.head.columns(0)
    require(groupCol != "h" && groupCol != "value",
      s"group column '$groupCol' collides with the pair schema")
    pairTables.reduce(_ unionByName _)
      .groupBy(col(groupCol))
      .agg(graft.functions.TopKAggregate
        .bottomkByKey(col("h"), col("value"), k).as("__bk"))
      .select(col(groupCol), explode(col("__bk").getField("v")).as("value"))
  }
}
