package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for web-scale corpora: exact, n-gram Jaccard,
  * MinHash+LSH, SimHash. All are pure DataFrame transforms over built-in
  * (codegen'd) expressions; every hash is md5-based so results are
  * portable across engines (the DuckDB oracles replay them exactly).
  *
  * Scale design:
  *  - exact dedup is one hash-shuffle on the fingerprint;
  *  - n-gram Jaccard bounds its candidate join with a document-frequency
  *    cap on shingles (stop-shingle removal): a shingle occurring in more
  *    than `maxDf` documents generates no pairs, which caps the per-key
  *    fan-out of the shingle self-join at maxDf² instead of n²;
  *  - MinHash+LSH replaces the all-pairs comparison entirely: per-doc
  *    signature (one aggregation), band keys, bucket self-join — the only
  *    quadratic term is within a bucket;
  *  - SimHash gives a constant-size signature per doc; near-dup = small
  *    Hamming distance, joinable by signature bands at scale.
  */
object Dedup {

  /** Distinct k-char shingles per document: (id, s). Per-document
    * dedup happens inside one row (`array_distinct` over the shingle
    * array) — no shuffle at all, unlike `explode().distinct()` which
    * would shuffle every (doc, shingle) pair. Documents are bounded
    * (text columns), so the per-row array is small. */
  def shingles(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.select(col(idCol),
      explode(array_distinct(transform(
        sequence(lit(1), greatest(length(col(textCol)) - (k - 1), lit(0))),
        i => col(textCol).substr(i, lit(k))))).as("s"))

  /** Exact duplicate groups by content hash: one row per distinct text
    * with the kept (minimum) id and the duplicate count. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("h"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n"))

  /** All-pairs n-gram Jaccard similarity over shingle sets, with
    * stop-shingle removal (df > maxDf) bounding the join fan-out.
    * Returns (id1, id2, jaccard) for pairs ≥ threshold, id1 < id2.
    * Jaccard is computed over the FILTERED shingle sets (consistent on
    * both sides of the oracle). */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
                   k: Int, maxDf: Int, threshold: Double): DataFrame = {
    val sh = shingles(df, idCol, textCol, k).cache()
    val dfCounts = sh.groupBy("s").agg(count(lit(1)).as("df"))
    // stop-shingle removal: anti-join against high-df shingles
    val rare = sh.join(dfCounts.where(col("df") > maxDf).select("s"),
      Seq("s"), "left_anti")
    val sizes = rare.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    // Pure optimization: df=1 shingles cannot produce a pair, so the
    // self-join only reads shingles with 2 ≤ df ≤ maxDf. Sizes above
    // still count every retained shingle (the Jaccard denominator is
    // unchanged), so results are identical — just a smaller join.
    val joinable = sh.join(
      dfCounts.where(col("df") >= 2 && col("df") <= maxDf).select("s"),
      Seq("s"), "left_semi")
    val a = joinable.select(col(idCol).as("id1"), col("s"))
    val b = joinable.select(col(idCol).as("id2"), col("s"))
    val common = a.join(b, Seq("s")).where(col("id1") < col("id2"))
      .groupBy("id1", "id2").agg(count(lit(1)).as("c"))
    common
      .join(sizes.select(col(idCol).as("id1"), col("sz").as("sz1")), "id1")
      .join(sizes.select(col(idCol).as("id2"), col("sz").as("sz2")), "id2")
      .withColumn("jaccard",
        round(col("c").cast("double") / (col("sz1") + col("sz2") - col("c")), 6))
      .where(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")
  }

  /** MinHash signature: numHashes md5-min values over the shingle set.
    * Hash family i = md5(i || '|' || shingle) — portable and uniform. */
  def minhashSignature(df: DataFrame, idCol: String, textCol: String,
                       k: Int, numHashes: Int): DataFrame = {
    val sh = shingles(df, idCol, textCol, k)
    // md5 is the expensive part: hash each DISTINCT shingle value once
    // (numHashes md5s over ~|vocabulary| strings instead of ~Σ doc-size),
    // then broadcast-join the small hash table back to (doc, shingle).
    val hashed = sh.select("s").distinct()
      .select(col("s") +: (0 until numHashes).map { i =>
        md5(concat(lit(i.toString), lit("|"), col("s")).cast("binary")).as(s"v$i")
      }: _*)
    // no broadcast hint: the vocabulary size is data-dependent, AQE
    // converts to broadcast at runtime when it's small enough
    val joined = sh.join(hashed, Seq("s"))
    val aggs = (0 until numHashes).map(i => min(col(s"v$i")).as(s"h$i"))
    joined.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash + LSH candidate pairs: signatures banded `bands` ×
    * `rowsPerBand`; docs sharing any band key are candidates.
    * Returns distinct (id1, id2), id1 < id2. */
  def minhashLshCandidates(df: DataFrame, idCol: String, textCol: String,
                           k: Int, bands: Int, rowsPerBand: Int): DataFrame = {
    val sig = minhashSignature(df, idCol, textCol, k, bands * rowsPerBand)
    val bandCols = (0 until bands).map { b =>
      val parts = (0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}"))
      struct(lit(b).as("band"),
        md5(concat_ws("|", parts: _*).cast("binary")).as("key"))
    }
    val buckets = sig.select(col(idCol),
        explode(array(bandCols: _*)).as("bk"))
      .select(col(idCol), col("bk.band").as("band"), col("bk.key").as("key"))
    val l = buckets.select(col(idCol).as("id1"), col("band"), col("key"))
    val r = buckets.select(col(idCol).as("id2"), col("band"), col("key"))
    l.join(r, Seq("band", "key")).where(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
  }

  /** SimHash signature over distinct whitespace tokens: `bits`-wide
    * (default 16). Token hash = first 8 md5 hex chars as a 32-bit int;
    * signature bit j set iff Σ_tokens (bit j set ? +1 : −1) > 0. */
  def simhash(df: DataFrame, idCol: String, textCol: String,
              bits: Int = 16): DataFrame = {
    val toks = df
      .select(col(idCol), explode(split(lower(trim(col(textCol))), "\\s+")).as("tok"))
      .where(length(col("tok")) > 0)
      .distinct()
      .withColumn("h", conv(substring(md5(col("tok").cast("binary")), 1, 8), 16, 10)
        .cast("long"))
    val weightAggs = (0 until bits).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"w$j")
    }
    val weights = toks.groupBy(col(idCol)).agg(weightAggs.head, weightAggs.tail: _*)
    val sig = (0 until bits).map { j =>
      when(col(s"w$j") > 0, 1L << j).otherwise(0L)
    }.reduce(_ + _)
    weights.select(col(idCol), sig.as("simhash"))
  }

  /** Near-duplicate pairs by SimHash Hamming distance ≤ maxDist.
    * All-pairs formulation for modest n; at corpus scale, band the
    * signature (pigeonhole: dist ≤ d ⇒ some ⌈bits/(d+1)⌉-bit band equal)
    * and bucket-join like LSH. */
  def simhashPairs(sig: DataFrame, idCol: String, maxDist: Int): DataFrame = {
    val a = sig.select(col(idCol).as("id1"), col("simhash").as("s1"))
    val b = sig.select(col(idCol).as("id2"), col("simhash").as("s2"))
    a.crossJoin(b).where(col("id1") < col("id2"))
      .withColumn("dist", bit_count(col("s1").bitwiseXOR(col("s2"))))
      .where(col("dist") <= maxDist)
      .select("id1", "id2", "dist")
  }
}
