package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, leakage-safe dataset splitting — the train/val/test
  * assignment step of a training-data pipeline.
  *
  * Assignment is a pure function of the SPLIT KEY's md5 (bucket =
  * hash mod `denom`), so:
  *  - it is reproducible across runs, engines and cluster sizes (no
  *    rand(), no row order dependence — a DuckDB oracle replays it
  *    exactly, q52);
  *  - splitting BY A GROUP KEY (user, document source, session) puts
  *    every row of the group in the same split — the standard fix for
  *    train/test leakage through correlated rows;
  *  - new data routes consistently: a user stays in their split as
  *    more of their rows arrive (the property random sampling lacks).
  *
  * Zero shuffle: the assignment is a per-row expression; only whatever
  * aggregation the caller does afterwards exchanges data.
  */
object Split {

  /** 60-bit md5 prefix ([[Sketches.hash60]] — ONE definition of the
    * parity-critical hash) bucketed to [0, denom). */
  def hashBucket(key: Column, denom: Int): Column =
    pmod(Sketches.hash60(key), lit(denom.toLong))

  /** Split label for `key` given cumulative percentage cut points,
    * e.g. `Seq("train" -> 80, "val" -> 90, "test" -> 100)`. */
  def splitLabel(key: Column, cuts: Seq[(String, Int)], denom: Int = 100): Column = {
    require(cuts.nonEmpty && cuts.last._2 == denom,
      s"cut points must end at $denom, got $cuts")
    val b = hashBucket(key, denom)
    cuts.init.foldRight(lit(cuts.last._1): Column) { case ((name, cut), els) =>
      when(b < cut, name).otherwise(els)
    }
  }

  /** The same bucketing as DuckDB SQL (for oracle construction). */
  def hashBucketSql(key: String, denom: Int): String =
    s"(('0x' || substring(md5(CAST($key AS VARCHAR)), 1, 15))::BIGINT % $denom)"

  /** Deterministic Bernoulli-by-hash keep predicate: true for a
    * `ppm`-parts-per-million slice of keys. `ppm` may be any expression
    * (e.g. a per-stratum rate), which makes this the building block for
    * STRATIFIED sampling — downsample overrepresented classes at
    * per-class rates while every decision stays a pure function of the
    * key: reproducible across runs/engines/cluster sizes, and stable
    * under reruns (a kept row stays kept), unlike `rand()`-based
    * `df.sample` whose selection is seed-and-partitioning dependent. */
  def sampleKeep(key: Column, ppm: Column): Column =
    hashBucket(key, 1000000) < ppm

  /** Concat-and-chunk sequence packing: documents in `orderCol` order
    * within each `partCol` group are laid head-to-tail and cut into
    * training sequences of `budget` tokens — a doc starts sequence
    * `⌊(cumulative tokens before it) / budget⌋`. Returns one row per
    * (group, seq_id) with doc/token counts and the first doc id. This
    * is the standard "concatenate then chunk" packing of LLM training
    * pipelines, made deterministic (no greedy bin state) so it is
    * reproducible and oracle-replayable.
    *
    * Scale shape: ONE window partitioned by `partCol` (shard key:
    * language, source, date bucket) — cumulative sums run partition-
    * parallel; nothing is globally ordered. Token counts come from a
    * per-row expression in the same scan. A pipeline with heavily
    * skewed groups should pre-split the shard key (salt high-volume
    * languages by date) — the operator composes, it does not global-
    * sort. */
  def packChunks(df: DataFrame, partCol: String, orderCol: String,
                 tokens: Column, budget: Int): DataFrame = {
    require(budget >= 1, s"budget=$budget must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(partCol)).orderBy(col(orderCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.select(col(partCol), col(orderCol), tokens.cast("long").as("n_tok"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("seq_id",
        floor((col("cum") - col("n_tok")).cast("double") / budget).cast("long"))
      .groupBy(col(partCol), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tok_sum"),
        min(col(orderCol)).as("first_doc"))
  }

  /** Per-document sliding-window chunking: token windows of `window`
    * tokens starting every `stride` tokens — the context-window prep
    * step for embedding/retrieval indexing (overlap = window − stride
    * keeps boundary context in two chunks). Chunk `i` covers tokens
    * `[i·stride, i·stride + window)`; the final chunk may be short but
    * every token is covered; empty docs emit nothing.
    *
    * Scale shape: per-row generator — tokenize once, `explode` the
    * chunk index range, `slice` the token array. ZERO shuffle and no
    * per-chunk re-tokenization; output partitioning inherits the scan,
    * so a downstream embed/index stage runs embarrassingly parallel. */
  def slidingChunks(df: DataFrame, idCol: String, textCol: String,
                    window: Int, stride: Int): DataFrame = {
    require(window >= 1, s"window=$window must be positive")
    require(stride >= 1 && stride <= window,
      s"stride=$stride must be in [1, window=$window]")
    val toks = filter(
      split(trim(lower(col(textCol))), "\\s+"), t => t =!= lit(""))
    df.select(col(idCol), toks.as("toks"))
      .where(size(col("toks")) > 0)
      .select(col(idCol), col("toks"),
        explode(sequence(lit(0),
          ceil(greatest(size(col("toks")) - window, lit(0))
            .cast("double") / stride).cast("int"))).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        size(slice(col("toks"), col("chunk_id") * stride + 1, lit(window)))
          .as("chunk_tokens"),
        array_join(slice(col("toks"), col("chunk_id") * stride + 1, lit(window)), " ")
          .as("chunk_text"))
  }

  /** Temporal cold-start audit for a time-based train/serve split: per
    * group (event type), how many serve-side entities have NO history
    * before the cutoff — exactly the rows for which a feature store
    * built on the train window returns nulls. The train-side entity
    * set joins as a distinct key table (semi-join sized); the serve
    * side aggregates once per (group, entity) before the flag rollup,
    * so the join carries entities, not events. */
  def temporalColdStart(events: DataFrame, entityCol: String,
                        groupCol: String, tsCol: String,
                        cutoff: Column): DataFrame = {
    val train = events.where(col(tsCol) < cutoff)
      .select(col(entityCol)).distinct()
      .withColumn("__seen", lit(1L))
    events.where(col(tsCol) >= cutoff)
      .groupBy(col(groupCol), col(entityCol))
      .agg(count(lit(1)).as("__n"))
      .join(train, Seq(entityCol), "left")
      .groupBy(col(groupCol))
      .agg(sum(col("__n")).as("n_events"),
        count(lit(1)).as("n_users"),
        sum(when(col("__seen").isNull, 1L).otherwise(0L)).as("n_cold_users"))
      .withColumn("cold_ratio",
        round(col("n_cold_users").cast("double") / col("n_users"), 6))
  }

  /** md5-prefix position on the 60-bit hash ring for vnode `v` of
    * shard `s` — same hex-prefix convention as every signature in the
    * library, so the ring replays in SQL verbatim. */
  private[graft] def ringPos(s: Int, v: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"shard-$s-$v".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** The consistent-hash ring for `shards` shards × `vnodes` virtual
    * nodes, sorted by ring position. Tiny (shards·vnodes entries) —
    * the broadcast artifact any shard router holds. */
  private[graft] def consistentRing(shards: Int, vnodes: Int): Array[(Long, Int)] =
    (0 until shards).flatMap(s => (0 until vnodes).map(v => (ringPos(s, v), s)))
      .sortBy(_._1).toArray

  /** Resharding cost report, mod-N vs consistent hashing: the fraction
    * of keys that MOVE when the shard count grows n1 → n2. Mod-N
    * reshuffles ~1−1/n2 of the corpus (every key whose hash changes
    * residue); the ring moves only keys captured by the new shard's
    * vnodes (~1/n2) — the planning number for corpus repartitioning
    * and shard-store growth. Key positions are 60-bit md5 prefixes;
    * ring lookup is a binary-search successor probe against the
    * broadcast ring (driver-built, shards·vnodes entries), one typed
    * map over the corpus, zero shuffles before the single summary
    * aggregation. One output row. */
  def rebalanceReport(df: DataFrame, idCol: String,
                      n1: Int, n2: Int, vnodes: Int = 64): DataFrame = {
    require(n1 >= 1 && n2 >= 1 && vnodes >= 1, "positive shard/vnode counts")
    import df.sparkSession.implicits._
    val ring1 = consistentRing(n1, vnodes)
    val ring2 = consistentRing(n2, vnodes)
    def owner(ring: Array[(Long, Int)], h: Long): Int = {
      var lo = 0
      var hi = ring.length // first index with pos >= h
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (ring(mid)._1 >= h) hi = mid else lo = mid + 1
      }
      ring(if (lo == ring.length) 0 else lo)._2
    }
    val moved = df
      .select(conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
        .cast("long").as("h"))
      .as[Long].map { h =>
        val modMoved = if (h % n1 != h % n2) 1L else 0L
        val ringMoved = if (owner(ring1, h) != owner(ring2, h)) 1L else 0L
        (modMoved, ringMoved)
      }.toDF("mod_moved", "ring_moved")
    moved.agg(count(lit(1)).as("n_keys"),
        sum(col("mod_moved")).as("moved_mod"),
        sum(col("ring_moved")).as("moved_ring"))
      .select(col("n_keys"), col("moved_mod"), col("moved_ring"),
        round(col("moved_mod").cast("double") / col("n_keys"), 6)
          .as("mod_ratio"),
        round(col("moved_ring").cast("double") / col("n_keys"), 6)
          .as("ring_ratio"))
  }
}
