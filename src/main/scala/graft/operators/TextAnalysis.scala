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
    val norm = normalized(col(textCol))
    val scores = LangMarkers.map { case (lang, words) =>
      lang -> words.map(w => wordHits(norm, w)).reduce(_ + _)
    }
    val scoreCols = scores.map { case (lang, c) => c.as(s"score_$lang") }
    val withScores = df.select(col(idCol) +: scoreCols: _*)
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
    val norm = normalized(t)
    val nTok = tokenCount(t)
    val stopHits = LangMarkers.flatMap(_._2).distinct
      .map(w => wordHits(norm, w)).reduce(_ + _)
    val punct = length(t) - length(regexp_replace(t, "[.,!?;:]", ""))
    val digits = length(t) - length(regexp_replace(t, "[0-9]", ""))
    df.select(col(idCol),
      nTok.as("n_tokens"),
      round(stopHits.cast("double") / greatest(nTok, lit(1)), 6).as("stopword_ratio"),
      round(punct.cast("double") / greatest(length(t), lit(1)), 6).as("punct_ratio"),
      round(digits.cast("double") / greatest(length(t), lit(1)), 6).as("digit_ratio"))
  }

  /** Content fingerprint: md5 of the normalized text. Identical content
    * modulo case/whitespace maps to one fingerprint → exact-dedup key. */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      md5(normalized(col(textCol)).cast("binary")).as("fingerprint"))

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
    df.select(col(idCol),
      explode(graft.functions.TextExpressions
        .winnowArray(col(textCol), k, w)).as("fp"))
}
