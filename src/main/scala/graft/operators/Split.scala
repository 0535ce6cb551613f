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
}
