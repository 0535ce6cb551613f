package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * token counting, quality scoring, language identification, document
  * fingerprinting. Everything is built from codegen'd built-in
  * expressions (no UDFs) so whole-stage codegen spans the full pipeline
  * and the operators parallelize embarrassingly — each document is
  * scored independently, no shuffle at all until a downstream group-by.
  *
  * Determinism note: occurrence counting uses the replace-length trick
  * (plain substring replace, identical across engines) rather than
  * regex, so DuckDB oracles reproduce results bit-for-bit.
  */
object TextAnalysis {

  /** ` `-padded, lowercased, whitespace-collapsed text — the base for
    * word-boundary substring counting. */
  def normalized(text: Column): Column =
    concat(lit(" "), regexp_replace(lower(trim(text)), "\\s+", " "), lit(" "))

  /** Non-overlapping occurrences of ` word ` in normalized text. */
  def wordHits(norm: Column, word: String): Column = {
    val needle = s" $word "
    ((length(norm) - length(regexp_replace(norm, java.util.regex.Pattern.quote(needle), " ")))
      / lit(needle.length - 1)).cast("int")
  }

  /** Whitespace token count (0 for blank text). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0)
      .otherwise(size(split(trim(text), "\\s+")))

  /** Per-document surface statistics. */
  def stats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(col(idCol),
      length(t).as("n_chars"),
      tokenCount(t).as("n_tokens"),
      (length(t) - length(regexp_replace(t, "[.,!?;:]", ""))).as("n_punct"),
      (length(t) - length(regexp_replace(t, "[0-9]", ""))).as("n_digits"),
      (length(t) - length(regexp_replace(t, "[A-Z]", ""))).as("n_upper"))
  }

  /** Marker stopwords per language for the n-gram/stopword heuristic
    * language ID. Deliberately tiny — the operator shape (score + argmax
    * with a fixed priority tiebreak) is what a real model would reuse. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of"),
    "de" -> Seq("der", "und", "die"),
    "fr" -> Seq("le", "la", "et"),
    "es" -> Seq("el", "los", "que"))

  /** Language ID: argmax of marker-word hits, ties resolved by the fixed
    * language order above; no hits at all → "und". */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // one fused normalization + needle scan for ALL marker words (the
    // composable per-word wordHits form re-normalized and re-scanned
    // per word; TextExpressionsSpec asserts per-word equality)
    val allWords = LangMarkers.flatMap(_._2)
    val hits = graft.functions.TextExpressions
      .stopHits(col(textCol), allWords).as("__hits")
    val offsets = LangMarkers.scanLeft(0) { case (o, (_, ws)) => o + ws.size }
    val scores = LangMarkers.zipWithIndex.map { case ((lang, ws), i) =>
      lang -> ws.indices
        .map(j => element_at(col("__hits"), offsets(i) + j + 1))
        .reduce(_ + _)
    }
    val withScores = df.select(col(idCol), hits)
      .select(col(idCol) +:
        scores.map { case (lang, c) => c.as(s"score_$lang") }: _*)
    val detected = scores.indices.foldRight(lit("und")) { (i, els) =>
      val (lang, _) = scores(i)
      val me = col(s"score_$lang")
      val beatsLater = scores.drop(i + 1)
        .map { case (l2, _) => me >= col(s"score_$l2") }
        .foldLeft(me > 0)(_ && _)
      when(beatsLater, lang).otherwise(els)
    }
    withScores.withColumn("detected_lang", detected)
  }

  /** Composite quality score in [0,1]: penalizes punctuation/digit-heavy
    * text, rewards stopword presence and mid-length tokens —
    * the usual cheap pre-filters before expensive dedup/training. */
  def quality(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val nTok = tokenCount(t)
    // one fused scan for all stopwords instead of one regex replace per
    // word (12 full scans per row was the entire cost of q25)
    val words = LangMarkers.flatMap(_._2).distinct
    val punct = length(t) - length(regexp_replace(t, "[.,!?;:]", ""))
    val digits = length(t) - length(regexp_replace(t, "[0-9]", ""))
    val stopHits = words.indices
      .map(i => element_at(col("__hits"), i + 1)).reduce(_ + _)
    df.select(col(idCol), nTok.as("n_tokens"), length(t).as("__len"),
        punct.as("__punct"), digits.as("__digits"),
        graft.functions.TextExpressions.stopHits(t, words).as("__hits"))
      .select(col(idCol),
        col("n_tokens"),
        round(stopHits.cast("double") / greatest(col("n_tokens"), lit(1)), 6)
          .as("stopword_ratio"),
        round(col("__punct").cast("double") / greatest(col("__len"), lit(1)), 6)
          .as("punct_ratio"),
        round(col("__digits").cast("double") / greatest(col("__len"), lit(1)), 6)
          .as("digit_ratio"))
  }

  /** Content fingerprint: md5 of the normalized text. Identical content
    * modulo case/whitespace maps to one fingerprint → exact-dedup key. */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      md5(normalized(col(textCol)).cast("binary")).as("fingerprint"))

  /** Corpus-typicality score: a character-bigram model TRAINED ON THE
    * CORPUS ITSELF (the cheap stand-in for CCNet-style LM-perplexity
    * filtering — no external LM in this container), scoring every doc by
    * how typical its character transitions are:
    *
    *   score(d) = Σ_g C₂(g) / Σ_g C₁(first(g))   over d's bigrams g
    *
    * where C₂/C₁ are corpus bigram/char-position counts over NORMALIZED
    * text. Boilerplate scores high, junk (rare transitions) scores low.
    * The ratio-of-sums form keeps every accumulation an exact BIGINT —
    * a mean of per-bigram probabilities would sum doubles in shuffle
    * order — so one IEEE division at the end makes the score
    * cross-engine exact (q75's oracle replays it bit-for-bit).
    *
    * Scale shape: "train" is ONE map-side-combined groupBy whose
    * key space is the character alphabet² (a few KB at any corpus
    * size); the model broadcasts; scoring is an explode + broadcast
    * join + exact per-doc sums. Two passes over the corpus, nothing
    * driver-side. */
  def typicalityScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // "train": one map-side-combined aggregation into the
    // alphabet²-bounded model, collected to ride along with the fused
    // scorer (a few thousand rows at ANY corpus size — same bounded-
    // collect contract as Graph.localComponents)
    val model = trainBigramModel(df, textCol)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // score: ONE pass per document — no explode, no join, no re-agg
    // (the composable explode+broadcast-join form this replaces is kept
    // as typicalityScoreComposed; TextAnalysisSpec asserts equality)
    df.select(col(idCol),
        graft.functions.TextExpressions
          .typicalityStats(normalized(col(textCol)), model).as("t"))
      .select(col(idCol), col("t.n_bigrams").as("n_bigrams"),
        col("t.sum_c2").as("sum_c2"), col("t.sum_c1").as("sum_c1"),
        round(col("t.sum_c2").cast("double") / col("t.sum_c1").cast("double"), 6)
          .as("typicality"))
  }

  /** The corpus bigram model: (g, c2 = corpus count of bigram g,
    * c1 = corpus count of bigrams starting with g's first char). */
  private def trainBigramModel(df: DataFrame, textCol: String): DataFrame = {
    val grams = df.select(explode(graft.functions.TextExpressions
      .shingleMultiArray(normalized(col(textCol)), 2)).as("g"))
    val c2 = grams.groupBy(col("g")).agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy(substring(col("g"), 1, 1).as("a"))
      .agg(sum(col("c2")).as("c1"))
    c2.join(c1, substring(col("g"), 1, 1) === col("a"))
      .select(col("g"), col("c2"), col("c1"))
  }

  /** The original explode + broadcast-join + re-aggregate formulation —
    * SEMANTIC REFERENCE for [[typicalityScore]]'s fused scorer
    * (identical output; kept for the parity spec). */
  private[graft] def typicalityScoreComposed(df: DataFrame, idCol: String,
                                             textCol: String): DataFrame = {
    val grams = df.select(col(idCol), normalized(col(textCol)).as("norm"))
      .select(col(idCol),
        explode(graft.functions.TextExpressions.shingleMultiArray(col("norm"), 2))
          .as("g"))
    grams
      .join(broadcast(trainBigramModel(df, textCol)), "g")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("c2")).as("sum_c2"), sum(col("c1")).as("sum_c1"))
      .select(col(idCol), col("n_bigrams"), col("sum_c2"), col("sum_c1"),
        round(col("sum_c2").cast("double") / col("sum_c1").cast("double"), 6)
          .as("typicality"))
  }

  /** BPE-ish subword-boundary token count: letter runs, digit runs and
    * punctuation runs count separately (the pre-tokenization split every
    * BPE vocabulary starts from). Regex kept in the RE2 ∩ Java subset so
    * the DuckDB oracle replays it. */
  val BpeishPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+"
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeishPattern), lit(0)))

  /** Winnowing document fingerprints (the rolling-hash scheme used for
    * plagiarism/near-dup detection): hash every k-gram, slide a window
    * of `w` consecutive hashes, keep each window's minimum; the distinct
    * minima are the fingerprint set. Guarantees any match of length ≥
    * w + k − 1 shares a fingerprint. Hashes are md5-prefix ints so the
    * oracle reproduces them exactly. */
  def winnowing(df: DataFrame, idCol: String, textCol: String,
                k: Int, w: Int): DataFrame =
    // One fused expression per document — no window functions and no
    // shuffle at all (dedup is per-doc, like Dedup.shingles): hash every
    // k-gram, take each full w-window's min, distinct minima. The
    // composable chain (transform/slice/array_min over interpreted
    // lambdas) computes the same set; [[graft.functions.WinnowArray]]
    // does it in one JIT-compiled pass (q45 3.9 s → 1.95 s at sf0.1; SCALING.md).
    Spread.scaleOut(df.select(col(idCol), col(textCol)))
      .select(col(idCol),
        explode(graft.functions.TextExpressions
          .winnowArray(col(textCol), k, w)).as("fp"))

  /** Within-document repetition metrics — the Gopher-style cheap
    * signals that flag templated/spammy text before it reaches
    * dedup or training:
    *  - `dup_token_ratio`: 1 − distinct/total tokens (0 for empty docs);
    *  - `top_bigram_frac`: occurrences of the most frequent word bigram
    *    over the n−1 bigram slots (0 when fewer than 2 tokens).
    * All arithmetic is exact-integer-then-one-IEEE-division, so the
    * DuckDB oracle replays it bit-for-bit (q59).
    *
    * Scale shape: bigram expansion happens in-row over the token array
    * (no window sort); the two aggregations key on (doc, bigram) and
    * doc — per-key cardinality is bounded by DOCUMENT LENGTH, never
    * corpus size, so partitions stay small at any scale. */
  def repetition(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val r = graft.functions.TextExpressions.repetitionStats(col(textCol))
    df.select(col(idCol), r.as("r"))
      .select(col(idCol), col("r.n").as("n_tokens"),
        round(when(col("r.n") > 0,
          (col("r.n") - col("r.d")).cast("double") / col("r.n"))
          .otherwise(0.0), 6).as("dup_token_ratio"),
        round(when(col("r.n") >= 2,
          coalesce(col("r.topc"), lit(0L)).cast("double") / (col("r.n") - 1))
          .otherwise(0.0), 6).as("top_bigram_frac"))
  }

  /** The original explode → count → re-aggregate → join formulation of
    * [[repetition]]: two corpus-wide shuffles plus a join for per-row
    * values. Kept ONLY as the independently-derived baseline the fused
    * [[graft.functions.RepetitionStats]] expression is verified against
    * (TextAnalysisSpec); not used by any query. */
  def repetitionAgg(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = trim(lower(col(textCol)))
    val arr = when(length(t) === 0, array().cast("array<string>"))
      .otherwise(split(t, "\\s+"))
    val base = df.select(col(idCol), arr.as("toks"))
      .withColumn("n", size(col("toks")))
      .withColumn("d", size(array_distinct(col("toks"))))
    val bigrams = base.where(col("n") >= 2)
      .select(col(idCol), explode(expr(
        "transform(slice(toks, 1, size(toks) - 1), " +
          "(x, i) -> concat(x, ' ', element_at(toks, i + 2)))")).as("bigram"))
    val top = bigrams.groupBy(col(idCol), col("bigram")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol)).agg(max(col("c")).as("topc"))
    base.join(top, Seq(idCol), "left")
      .select(col(idCol), col("n").as("n_tokens"),
        round(when(col("n") > 0,
          (col("n") - col("d")).cast("double") / col("n"))
          .otherwise(0.0), 6).as("dup_token_ratio"),
        round(when(col("n") >= 2,
          coalesce(col("topc"), lit(0L)).cast("double") / (col("n") - 1))
          .otherwise(0.0), 6).as("top_bigram_frac"))
  }

  /** Benchmark decontamination: corpus documents whose distinct word
    * `n`-gram sets overlap a benchmark (eval-set) document collection
    * by at least `threshold` — the docs a training pipeline must drop
    * so evaluation stays honest. Returns (id, n_grams, hits, ratio)
    * for flagged docs; ratio = |doc grams ∩ benchmark grams| /
    * |doc grams| (rounded 6 in the output, UNROUNDED in the filter).
    *
    * Scale shape: n-gram extraction is the fused zero-shuffle
    * [[graft.functions.TokenNgrams]] scan; the benchmark gram set is
    * small by nature (eval sets, not corpora) and broadcasts, so the
    * whole operator is one corpus scan + one per-doc aggregation — no
    * corpus-side shuffle-join. Drop the broadcast hint if a benchmark
    * ever outgrows executor memory; the plan degrades to a hash join
    * on the gram, still shuffle-partitioned, never all-pairs. */
  def decontaminate(corpus: DataFrame, bench: DataFrame, idCol: String,
                    textCol: String, n: Int, threshold: Double): DataFrame = {
    val grams = graft.functions.TextExpressions.tokenNgrams(col(textCol), n)
    val benchGrams = bench.select(explode(grams).as("gram")).distinct()
    // both corpus passes (size scan + gram explode) tokenize every row;
    // spread once so neither runs inside a one-task scan
    val corpusP = Spread.scaleOut(corpus.select(col(idCol), col(textCol)))
    // distinct-gram count comes from the array length in the same scan
    // — no corpus-wide (doc, gram) aggregation for a per-row value
    val sz = corpusP.select(col(idCol), size(grams).cast("long").as("n_grams"))
      .where(col("n_grams") > 0)
    val hits = corpusP.select(col(idCol), explode(grams).as("gram"))
      .join(broadcast(benchGrams), Seq("gram"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("hits"))
    sz.join(hits, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        round(coalesce(col("hits"), lit(0L)).cast("double") / col("n_grams"), 6)
          .as("ratio"))
      .where(col("hits").cast("double") / col("n_grams") >= threshold)
  }

  /** Contamination PROVENANCE: for every doc [[decontaminate]] flags,
    * the benchmark document with the largest distinct-gram overlap
    * (ties broken by smallest benchmark id) plus the shared-gram count
    * — the audit trail behind a decontamination drop ("which eval doc
    * leaked here"). Output: (id, n_grams, hits, ratio, bench_id,
    * shared).
    *
    * Scale shape: the per-benchmark-doc join runs only for the FLAGGED
    * docs (a tiny fraction by construction), so the (doc, bench doc)
    * fan-out is bounded by |contaminated| × their gram lists — the
    * full corpus never joins gram-to-gram at doc granularity. */
  def decontaminationReport(corpus: DataFrame, bench: DataFrame, idCol: String,
                            textCol: String, n: Int, threshold: Double): DataFrame = {
    val grams = graft.functions.TextExpressions.tokenNgrams(col(textCol), n)
    val flagged = decontaminate(corpus, bench, idCol, textCol, n, threshold)
    val flaggedGrams = corpus.join(flagged.select(col(idCol)), Seq(idCol))
      .select(col(idCol), explode(grams).as("gram"))
    val benchGrams = bench.select(col(idCol).as("bench_id"),
      explode(grams).as("gram"))
    val best = flaggedGrams.join(broadcast(benchGrams), Seq("gram"))
      .groupBy(col(idCol), col("bench_id"))
      .agg(count(lit(1)).as("shared"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
          .orderBy(col("shared").desc, col("bench_id"))))
      .where(col("rn") === 1)
      .select(col(idCol), col("bench_id"), col("shared"))
    flagged.join(best, Seq(idCol))
  }

  /** [[decontaminate]] with a Bloom prefilter — the formulation for the
    * regime where the benchmark gram set is too large to broadcast as an
    * exact hash set (contamination sweeps against MANY benchmarks at
    * once, or n-gram overlap against another big corpus). The corpus
    * side probes a serialized `BloomFilterAggregate` sketch (~1.2 bytes
    * per gram at 1% fpp vs ~50+ bytes per exact UTF8 gram entry, built
    * distributed, probed inside whole-stage codegen — no UDF), so only
    * the ~fpp false-positive tail plus the true hits reach the exact
    * gram join. The exact join then removes every false positive:
    * output is bit-identical to [[decontaminate]] (asserted in
    * TextAnalysisSpec; q66 shares q62's DuckDB oracle).
    *
    * Scale shape: one corpus scan; the shuffle that remains carries
    * `hit_rate + fpp` of the postings instead of all of them — at 100 TB
    * with a 0.1% contamination rate and fpp 1%, ~1% of the posting
    * volume. The Bloom build is a partial-aggregated OR-merge, one pass
    * over the benchmark side. */
  def decontaminateBloom(corpus: DataFrame, bench: DataFrame, idCol: String,
                         textCol: String, n: Int, threshold: Double,
                         fpp: Double = 0.01): DataFrame = {
    val grams = graft.functions.TextExpressions.tokenNgrams(col(textCol), n)
    // Cached: three consumers (count, Bloom build, exact verify join).
    // NOT unpersisted here — the verify join in the returned plan still
    // needs it; callers running query batches should clearCache()
    // between queries (Bench does), long-lived sessions can unpersist
    // once the returned frame is materialized.
    val benchGrams = bench.select(explode(grams).as("gram")).distinct()
      .cache()
    // numBits for the target fpp: m = -n·ln(p)/ln(2)²  (classic sizing)
    val nBench = math.max(1L, benchGrams.count())
    val numBits = math.max(64L,
      math.ceil(-nBench * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val bloomBytes = benchGrams
      .select(org.apache.spark.sql.graftshim.Shim
        .bloomAgg(col("gram"), nBench, numBits).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val corpusP = Spread.scaleOut(corpus.select(col(idCol), col(textCol)))
    val sz = corpusP.select(col(idCol), size(grams).cast("long").as("n_grams"))
      .where(col("n_grams") > 0)
    val hits = corpusP.select(col(idCol), explode(grams).as("gram"))
      .where(org.apache.spark.sql.graftshim.Shim
        .bloomMightContain(bloomBytes, col("gram")))
      .join(benchGrams, Seq("gram")) // exact verify: kills Bloom FPs
      .groupBy(col(idCol)).agg(count(lit(1)).as("hits"))
    sz.join(hits, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        round(coalesce(col("hits"), lit(0L)).cast("double") / col("n_grams"), 6)
          .as("ratio"))
      .where(col("hits").cast("double") / col("n_grams") >= threshold)
  }

  /** PII redaction patterns, kept inside the RE2 ∩ Java regex subset
    * (no backreferences, no lookaround) so the same pattern text runs
    * unchanged on Spark, DuckDB, and the usual scan engines. Order
    * matters when redacting: the SSN shape is also a valid phone-ish
    * digit run, so ids are replaced before phones. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val SsnPattern   = "[0-9]{3}-[0-9]{2}-[0-9]{4}"
  val PhonePattern = "\\+?[0-9][0-9()\\-. ]{7,}[0-9]"

  /** Masked text: emails → `<EMAIL>`, SSN-shaped ids → `<ID>`, phone
    * number runs → `<PHONE>`. Pure per-row regexp_replace chain —
    * codegen'd, embarrassingly parallel, no shuffle. The synthetic
    * corpus carries no PII (so no catalog query), but the operator is
    * exercised by PiiSpec on adversarial fixtures. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        SsnPattern, "<ID>"),
      PhonePattern, "<PHONE>")

  /** Per-document PII hit counts (same patterns as [[redactPii]]). */
  def piiStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      size(regexp_extract_all(col(textCol), lit(EmailPattern), lit(0))).as("n_email"),
      size(regexp_extract_all(col(textCol), lit(SsnPattern), lit(0))).as("n_ssn"),
      size(regexp_extract_all(col(textCol), lit(PhonePattern), lit(0))).as("n_phone"))

  /** Top-`k` characteristic terms per document by tf·idf, with a
    * LINEAR inverse-document-frequency weight: score = tf · N / df.
    * The classical log-idf weight is avoided deliberately — libm
    * logarithms are not bit-stable across engines (see q51's HLL for
    * the same rule) — and the linear weight keeps every arithmetic step
    * exact-int-then-one-IEEE-division, so the DuckDB oracle replays
    * scores bit-for-bit. Ranking within a document differs from log-idf
    * only in how strongly rarity is rewarded; both are standard
    * keyword-extraction weightings.
    *
    * Scale shape: tf is one (doc, term) aggregation; df one term
    * aggregation; N rides in as a one-row broadcast (no driver action,
    * no collect); the final top-k window partitions BY DOCUMENT, whose
    * term count is bounded by document length — partitions stay small
    * at any corpus size, so the window never becomes the wide-shuffle
    * row_number trap the similarity queries avoid with TopKAggregate. */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .where(length(col("term")) > 0)
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("n"))
    val scored = tf.join(dfreq, "term")
      .join(broadcast(n))
      .withColumn("score",
        round((col("tf") * col("n")).cast("double") / col("df"), 6))
    scored
      .withColumn("rnk", row_number().over(Window.partitionBy(col(idCol))
        .orderBy(col("score").desc, col("term"))))
      .where(col("rnk") <= k)
      .select(col(idCol), col("term"), col("score"), col("rnk"))
  }

  /** Total-variation distance of each group's token distribution from
    * the corpus distribution — the per-source mixture-drift audit.
    * EXACT rational arithmetic until one final IEEE division: with
    * integer counts c_st (token in group), c_s (group total), c_t
    * (corpus token), c_c (corpus total),
    *   TV(s) = [ Σ_{t∈Vs} |c_st·c_c − c_t·c_s| + (c_c − Σ_{t∈Vs} c_t)·c_s ]
    *           / (2·c_s·c_c)
    * The second numerator term folds every token ABSENT from the group
    * (there p=0, so Σ|0−q_t| telescopes to the uncovered corpus mass) —
    * the plan touches only (group, token) rows that EXIST, never the
    * |groups|×|vocab| cross product a naive full-union join would
    * materialize. Input: one row per token OCCURRENCE.
    * Output: (groupCol, c_s, tv_dist). */
  def tvDistance(tokens: DataFrame, groupCol: String,
                 tokenCol: String): DataFrame = {
    val st = tokens.groupBy(col(groupCol), col(tokenCol).as("token"))
      .agg(count(lit(1)).as("c_st"))
    val t = st.groupBy("token").agg(sum(col("c_st")).as("c_t"))
    val grpTot = st.groupBy(groupCol).agg(sum(col("c_st")).as("c_s"))
    val cc = st.agg(sum(col("c_st")).as("c_c"))
    val p = st.join(t, "token").join(grpTot, groupCol).crossJoin(cc)
      .groupBy(col(groupCol))
      .agg(sum(abs(col("c_st") * col("c_c") - col("c_t") * col("c_s")))
        .as("present"), sum(col("c_t")).as("covered"))
    p.join(grpTot, groupCol).crossJoin(cc)
      .select(col(groupCol), col("c_s"),
        round((col("present") + (col("c_c") - col("covered")) * col("c_s"))
          .cast("double") /
          (lit(2.0) * col("c_s").cast("double") * col("c_c").cast("double")),
          6).as("tv_dist"))
  }

  /** Per-document unigram surprisal under the corpus's own Laplace-
    * smoothed unigram LM — the classic perplexity-style quality dial
    * (very low = boilerplate, very high = gibberish / OCR noise),
    * without shipping an external language model.
    *
    * Token surprisal is quantized to WHOLE BITS via integer floor-log2:
    * bits(tok) = ⌊log2((T+V) / (c+1))⌋ computed as
    * `length(bin((T+V) div (c+1))) − 1` — exact integer division plus
    * the binary-string length, so there is NO libm call anywhere (the
    * q159 lesson: Math.log vs libm log differ in the last ulp and can
    * flip a floor at quantization boundaries; bin() cannot).
    *
    * Scale shape: one token explode, one vocab-sized aggregation, a
    * single-row totals broadcast, one join of instances to the vocab
    * (shuffle on token — skew-capped because stop words hit the ⌊⌋ at
    * small bits but still join 1:1), one per-doc aggregation. */
  def unigramSurprisalBits(df: DataFrame, idCol: String,
                           textCol: String): DataFrame = {
    val toks = df
      .select(col(idCol),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("tok"))
      .where(length(col("tok")) > 0)
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    val totals = counts.agg(sum(col("c")).as("t_total"),
      count(lit(1)).as("v_vocab"))
    val bits = counts.crossJoin(broadcast(totals))
      .select(col("tok"),
        expr("CAST(length(bin((t_total + v_vocab) DIV (c + 1))) - 1 AS BIGINT)")
          .as("bits"))
    toks.join(bits, "tok")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("bits")).as("surprisal_bits"))
      .withColumn("mean_bits",
        round(col("surprisal_bits").cast("double") / col("n_tokens"), 6))
  }

  /** Bigram conditional surprisal per document — the CCNet-style LM
    * fluency filter with an integer-only scoring core. Each adjacent
    * token pair (w1, w2) is scored floor(log2((c(w1) + V) / (c(w1w2)
    * + 1))) bits — the add-one-smoothed inverse conditional probability
    * — via the same `length(bin(x)) - 1` trick as
    * [[unigramSurprisalBits]], so no libm call enters the contract and
    * DuckDB replays bit-for-bit. Disfluent/rare-continuation docs score
    * high, boilerplate scores low.
    *
    * Scale shape: tokens explode once; corpus bigram and unigram models
    * are groupBy aggregates (map-side combined); the per-bigram score
    * joins on (w1, w2) — at 100 TB the model frames are the Zipf head
    * plus a long tail, so the join shuffles model-sized data, never
    * re-shuffling documents. The only per-doc window is the in-document
    * LEAD, co-partitioned with the explode. */
  def bigramSurprisalBits(df: DataFrame, idCol: String,
                          textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df
      .select(col(idCol),
        posexplode(split(lower(trim(col(textCol))), "\\s+"))
          .as(Seq("pos", "w")))
      .where(col("w") =!= "")
    val db = toks
      .withColumn("w2", lead(col("w"), 1).over(
        Window.partitionBy(idCol).orderBy("pos")))
      .where(col("w2").isNotNull)
      .select(col(idCol), col("w").as("w1"), col("w2"))
    val cb = db.groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
    val cu = toks.groupBy(col("w").as("w1")).agg(count(lit(1)).as("c_x"))
    val v = cu.agg(count(lit(1)).as("vsz"))
    val bits = cb.join(cu, "w1").crossJoin(broadcast(v))
      .select(col("w1"), col("w2"),
        expr("CAST(length(bin((c_x + vsz) DIV (c_xy + 1))) - 1 AS BIGINT)")
          .as("bits"))
    db.join(bits, Seq("w1", "w2"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("bits")).as("bigram_bits"))
      .withColumn("mean_bits",
        round(col("bigram_bits").cast("double") / col("n_bigrams"), 6))
  }
}
