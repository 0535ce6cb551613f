package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") — the
  * tokenizer-training step of a training-data pipeline: repeatedly count
  * adjacent symbol pairs over the word-frequency table and merge the
  * most frequent pair everywhere, yielding the ordered merge rules a
  * BPE tokenizer replays.
  *
  * Semantics (all deterministic, both engines replay them exactly):
  *  - words = lowercased whitespace tokens, weighted by corpus
  *    frequency; symbols start as single characters;
  *  - pair counts are adjacent-overlap counts weighted by word
  *    frequency ('aaa' counts (a,a) twice), the textbook formulation;
  *  - the winning pair is (count DESC, sym_a ASC, sym_b ASC) — exact
  *    integer counts, lexicographic tiebreak;
  *  - merging is canonical GREEDY left-to-right: in a run of equal
  *    symbols ('aaa', pair (a,a)) the 1st+2nd merge, the 3rd survives.
  *    Greedy selection is expressed relationally (gaps-and-islands
  *    parity, below), so the DuckDB oracle replays it with the same
  *    window algebra instead of an imperative loop.
  *
  * Why this shape scales: BPE trains on the word-TYPE table, not the
  * corpus — |types| is language-bounded (plus noise) and the per-round
  * work is two window passes over exploded symbols of that table. The
  * corpus-sized work is exactly one aggregation (the word count); at
  * 100 TB that is the only exchange that grows. Each round's one
  * driver-side action collects a single row (the winning pair) — the
  * same bounded count-then-dial pattern as
  * [[Graph.connectedComponents]]'s convergence test, NOT a data
  * collect. Round state is locally checkpointed so lineage stays flat
  * across rounds (the connectedComponents lesson; swap for reliable
  * `checkpoint` on a cluster).
  *
  * Returns one row per merge round: (round, sym_a, sym_b, merged,
  * pair_count) — the merge table itself, which is what a tokenizer
  * consumes. Stops early if the vocabulary runs out of adjacent pairs.
  */
object Bpe {

  /** The word-frequency table BPE trains on: (word, cnt, syms) with
    * syms = the word's single-character symbol array. */
  private[graft] def vocab(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(filter(split(lower(trim(col(textCol))), "\\s+"),
        t => length(t) > 0)).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("syms", expr("regexp_extract_all(word, '.', 0)"))

  /** Adjacent pair counts over the symbol table, weighted by word
    * frequency: (a, b, c). */
  private def pairCounts(state: DataFrame): DataFrame =
    state.where(size(col("syms")) >= 2)
      .select(col("cnt"), explode(
        transform(sequence(lit(0), size(col("syms")) - 2),
          i => struct(element_at(col("syms"), i + 1).as("a"),
            element_at(col("syms"), i + 2).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("cnt")).as("c"))

  /** One greedy merge of pair (a, b) applied to every word's symbol
    * array — IN-ROW, as a left fold over the array: append the next
    * symbol, or replace the accumulator's tail with the merged symbol
    * when (tail, next) = (a, b). The fold IS canonical greedy
    * left-to-right: the only way it could over-merge a run is if a
    * just-merged tail compared equal to `a` again, and a+b = a is
    * impossible (length grows) — so 'aaa' under (a,a) folds to
    * [aa, a], exactly the 1st+2nd greedy merge. Zero shuffle, zero
    * explode: the q29 in-row lesson applied to BPE (the first cut of
    * this operator spelled the same greedy selection as three window
    * passes over exploded symbols — gaps-and-islands grouping + run
    * parity — at four exchanges per round; the DuckDB oracle still
    * replays THAT relational formulation, which makes the two engines
    * independently-derived implementations of the same semantics). */
  private def applyMerge(state: DataFrame, a: String, b: String): DataFrame =
    state.select(col("word"), col("cnt"),
      aggregate(col("syms"), array().cast("array<string>"),
        (acc, x) => when(
          size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x)))).as("syms"))

  /** Train `rounds` merge rules over the corpus' text column. */
  def train(spark: SparkSession, df: DataFrame, textCol: String,
            rounds: Int): DataFrame = {
    import spark.implicits._
    require(rounds >= 1, s"rounds=$rounds must be >= 1")
    var state = vocab(df, textCol).localCheckpoint(eager = false)
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val best = pairCounts(state)
        .orderBy(col("c").desc, col("a"), col("b")).limit(1)
        .collect()
      best.headOption match {
        case None => exhausted = true // no adjacent pairs anywhere
        case Some(row) =>
          val (a, b, c) = (row.getString(0), row.getString(1), row.getLong(2))
          merges += ((r, a, b, a + b, c))
          state = applyMerge(state, a, b).localCheckpoint(eager = false)
          r += 1
      }
    }
    merges.result()
      .toDF("round", "sym_a", "sym_b", "merged", "pair_count")
  }
}
