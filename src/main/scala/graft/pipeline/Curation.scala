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
    * @param jaccardMaxDf stop-shingle document-frequency cap. This is a
    *                  CORPUS-RELATIVE dial, not a constant: it bounds
    *                  pair fan-out at Σ df², but a cap that is a tiny
    *                  fraction of the corpus strips documents down to a
    *                  few rare shingles and Jaccard over those welds the
    *                  corpus into one giant near-dup component (measured:
    *                  the 500-doc-calibrated default kept 4 of 5000 docs
    *                  at 10× corpus — see SCALING.md). Size it as a few
    *                  percent of |corpus|, the way a stop-WORD list is
    *                  corpus-relative.
    * @param deconN/deconThreshold decontamination word-n-gram order and
    *                  overlap ratio. Corpus-relative like the df cap: on
    *                  a small vocabulary, low-order grams saturate (every
    *                  doc shares 3-grams with any large eval set) — raise
    *                  n / the threshold until only true eval copies trip.
    * @param decontam  "exact" (broadcast the benchmark gram set — the
    *                  default for eval-set-sized benchmarks) or "bloom"
    *                  (Bloom-prefiltered, for the regime where the gram
    *                  set outgrows a broadcast: contamination sweeps
    *                  against many benchmarks, or corpus-vs-corpus
    *                  overlap). Bit-identical verdicts — the Bloom path
    *                  exact-verifies its candidates — so the dial is a
    *                  pure memory/scale trade (CurationSpec asserts
    *                  kept-set parity between the two). Caveat: the
    *                  Bloom sketch is BUILT when curate() is called
    *                  (one eager job over the benchmark grams) — the
    *                  exception to this pipeline's otherwise fully lazy
    *                  contract, inherent to serializing the filter into
    *                  the probe expression.
    * @param nearDup   "jaccard" (exact set overlap, df-capped — the
    *                  default for corpora where most pairs are
    *                  dissimilar) or "simhash" (banded 60-bit signatures,
    *                  hamming ≤ 3). When the corpus is DENSE in
    *                  similarity space (template/boilerplate-heavy), any
    *                  set-overlap candidate generator explodes — its
    *                  bucket sizes are the similarity density itself
    *                  (measured: OOM at 40k template docs, SCALING.md) —
    *                  while signature banding with a tight hamming radius
    *                  stays selective: near-identity, not similarity,
    *                  drives its collisions.
    * @param cuts      cumulative split percentages, e.g.
    *                  train/val/test 98/1/1
    * @param window/stride context-window chunking parameters
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             benchmark: Option[DataFrame] = None,
             minTokens: Int = 5, maxDigitRatio: Double = 0.3,
             jaccardThreshold: Double = 0.3, jaccardMaxDf: Int = 100,
             deconN: Int = 3, deconThreshold: Double = 0.05,
             decontam: String = "exact",
             nearDup: String = "jaccard",
             cuts: Seq[(String, Int)] = Seq("train" -> 98, "val" -> 99, "test" -> 100),
             window: Int = 32, stride: Int = 24): Curated = {
    require(nearDup == "jaccard" || nearDup == "simhash",
      s"nearDup must be jaccard|simhash, got $nearDup")
    require(decontam == "exact" || decontam == "bloom",
      s"decontam must be exact|bloom, got $decontam")
    // 1. quality gate: per-row metrics, no shuffle
    val q = TextAnalysis.quality(docs, idCol, textCol)
      .where(col("n_tokens") >= minTokens && col("digit_ratio") <= maxDigitRatio)
      .select(col(idCol))
    val qualityDocs = docs.join(q, idCol)

    // 2. exact dedup: keep the min id of every identical-content group.
    // cached: this frame seeds the near-dup pair generator, the
    // component labelling AND the canonical-only join below — uncached,
    // the scan + quality gate + exact-dedup shuffle re-run once per
    // consumer (the same cache-miss-race lesson as Dedup's inverted
    // index; Bench/Verify clear the session cache per query)
    val exactKeep = Dedup.exactGroups(qualityDocs, idCol, textCol)
      .select(col("keep_id").as(idCol))
    val exactDocs = qualityDocs.join(exactKeep, idCol).cache()

    // 3. near-dup dedup: pairs → components → canonical only
    val pairs = nearDup match {
      case "jaccard" => Dedup.ngramJaccard(exactDocs, idCol, textCol,
        k = 8, maxDf = jaccardMaxDf, threshold = jaccardThreshold)
      case "simhash" => Dedup.simhashPairsBanded(
        Dedup.simhash(exactDocs, idCol, textCol, bits = 60),
        idCol, maxDist = 3, bits = 60)
    }
    // cached when a benchmark follows: the decontamination branch reads
    // it twice (gram scan + the left-anti that applies the verdict)
    val nearDocs0 = exactDocs.join(
      Graph.dedupClusters(exactDocs, idCol, pairs, "id1", "id2")
        .where(col("keep")).select(col(idCol)), idCol)
    val nearDocs = if (benchmark.isDefined) nearDocs0.cache() else nearDocs0

    // 4. optional decontamination: drop docs overlapping the eval set
    val cleanDocs = benchmark match {
      case Some(bench) =>
        val contaminated = (decontam match {
          case "bloom" => TextAnalysis.decontaminateBloom(
            nearDocs, bench, idCol, textCol, n = deconN,
            threshold = deconThreshold)
          case _ => TextAnalysis.decontaminate(
            nearDocs, bench, idCol, textCol, n = deconN,
            threshold = deconThreshold)
        }).select(col(idCol))
        nearDocs.join(contaminated, Seq(idCol), "left_anti")
      case None => nearDocs
    }

    // 5. leakage-safe split label (pure function of the id hash).
    // cached: `kept` is both returned and read twice by the chunk
    // branch (chunk expansion + split-label join)
    val kept = cleanDocs.withColumn("split",
      Split.splitLabel(col(idCol), cuts)).cache()

    // 6. sliding chunks with the split label carried through
    val chunks = Split.slidingChunks(kept, idCol, textCol, window, stride)
      .join(kept.select(col(idCol), col("split")), idCol)
    Curated(kept, chunks)
  }
}
