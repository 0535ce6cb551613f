package graft.pipeline

import graft.operators.{Dedup, Graph, Split, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The operators composed end-to-end: raw documents → curated,
  * deduplicated, decontaminated, split-labelled corpus → training
  * chunks. This is the "user story" of the library — every stage is an
  * existing catalog operator, chained as one lazy plan (no driver-side
  * actions inside; callers decide what to materialize and when).
  *
  * Stage order is the standard cheap-to-expensive funnel:
  *  1. quality gate (per-row fused scan — drops junk before anything
  *     that shuffles);
  *  2. exact dedup (one hash aggregation, min-id canonical);
  *  3. near-dup dedup (inverted-index Jaccard pairs → connected
  *     components → cluster-canonical only);
  *  4. optional benchmark decontamination (n-gram overlap vs an eval
  *     set, broadcast-sized side);
  *  5. leakage-safe split labels (pure hash of the doc id — a doc and
  *     all its re-deliveries land in one split forever);
  *  6. sliding context-window chunks for the downstream
  *     embedding/training job, split labels carried through.
  *
  * Every stage is deterministic (content hashes, min-id canonicals,
  * hash splits — no rand()), so the whole pipeline is reproducible
  * across runs, engines, and cluster sizes; CurationSpec asserts the
  * funnel invariants and replay stability.
  */
object Curation {

  final case class Curated(kept: DataFrame, chunks: DataFrame)

  /** @param docs      input corpus with `idCol` (long), `textCol`
    * @param benchmark optional eval set (same `textCol`) to
    *                  decontaminate against
    * @param minTokens quality gate: minimum token count
    * @param maxDigitRatio quality gate: maximum digit character ratio
    * @param jaccardThreshold near-dup threshold over 8-gram shingles
    * @param cuts      cumulative split percentages, e.g.
    *                  train/val/test 98/1/1
    * @param window/stride context-window chunking parameters
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             benchmark: Option[DataFrame] = None,
             minTokens: Int = 5, maxDigitRatio: Double = 0.3,
             jaccardThreshold: Double = 0.3,
             cuts: Seq[(String, Int)] = Seq("train" -> 98, "val" -> 99, "test" -> 100),
             window: Int = 32, stride: Int = 24): Curated = {
    // 1. quality gate: per-row metrics, no shuffle
    val q = TextAnalysis.quality(docs, idCol, textCol)
      .where(col("n_tokens") >= minTokens && col("digit_ratio") <= maxDigitRatio)
      .select(col(idCol))
    val qualityDocs = docs.join(q, idCol)

    // 2. exact dedup: keep the min id of every identical-content group
    val exactKeep = Dedup.exactGroups(qualityDocs, idCol, textCol)
      .select(col("keep_id").as(idCol))
    val exactDocs = qualityDocs.join(exactKeep, idCol)

    // 3. near-dup dedup: Jaccard pairs → components → canonical only
    val pairs = Dedup.ngramJaccard(exactDocs, idCol, textCol,
      k = 8, maxDf = 100, threshold = jaccardThreshold)
    val nearDocs = exactDocs.join(
      Graph.dedupClusters(exactDocs, idCol, pairs, "id1", "id2")
        .where(col("keep")).select(col(idCol)), idCol)

    // 4. optional decontamination: drop docs overlapping the eval set
    val cleanDocs = benchmark match {
      case Some(bench) =>
        val contaminated = TextAnalysis.decontaminate(
          nearDocs, bench, idCol, textCol, n = 3, threshold = 0.05)
          .select(col(idCol))
        nearDocs.join(contaminated, Seq(idCol), "left_anti")
      case None => nearDocs
    }

    // 5. leakage-safe split label (pure function of the id hash)
    val kept = cleanDocs.withColumn("split",
      Split.splitLabel(col(idCol), cuts))

    // 6. sliding chunks with the split label carried through
    val chunks = Split.slidingChunks(kept, idCol, textCol, window, stride)
      .join(kept.select(col(idCol), col("split")), idCol)
    Curated(kept, chunks)
  }
}
