package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused text-shingling expressions.
  *
  * The composable formulations (`array_distinct(transform(sequence(...),
  * i => substr(i, k)))` and the winnowing chain on top of it) are
  * CORRECT but run as interpreted higher-order functions — Spark's
  * lambda expressions are CodegenFallback, so every element pays
  * interpreted-eval overhead; the shingle scan measured 2.7 s of q29's
  * ~5.5 s at sf0.1 on that alone. These expressions compute the same
  * arrays in one JIT-compiled pass per row. Codegen emits a single call
  * into the eval helper (same pattern as [[LshProbes]]) — still inside
  * whole-stage codegen, no interpreted expression fallback.
  *
  * Semantics notes (asserted equal to the composable forms in
  * TextExpressionsSpec over the real corpus):
  *  - distinct keeps FIRST-OCCURRENCE order, like `array_distinct`;
  *  - a text shorter than k yields the whole text as its one shingle
  *    (what `substr` clamping does in the composable form);
  *  - winnowing of a text with fewer than w k-grams yields no
  *    fingerprints (the composable form was undefined there — `slice`
  *    with index 0 — and the DuckDB oracle's `range` is empty).
  */
object TextExpressions {
  /** Distinct k-character shingles of `text`, first-occurrence order. */
  def shingleArray(text: Column, k: Int): Column =
    org.apache.spark.sql.graftshim.Shim.column(ShingleArray(
      org.apache.spark.sql.graftshim.Shim.expression(text), k))

  /** Distinct xxhash64 values of the k-character shingles of `text`,
    * first-occurrence order — see [[ShingleHashArray]]. */
  def shingleHashArray(text: Column, k: Int): Column =
    org.apache.spark.sql.graftshim.Shim.column(ShingleHashArray(
      org.apache.spark.sql.graftshim.Shim.expression(text), k))

  /** All k-character shingles in position order, multiplicity
    * preserved — see [[ShingleMultiArray]]. */
  def shingleMultiArray(text: Column, k: Int): Column =
    org.apache.spark.sql.graftshim.Shim.column(ShingleMultiArray(
      org.apache.spark.sql.graftshim.Shim.expression(text), k))

  /** Distinct winnowing fingerprints of `text` (k-gram md5-prefix
    * hashes, min per w-window), first-occurrence order. */
  def winnowArray(text: Column, k: Int, w: Int): Column =
    org.apache.spark.sql.graftshim.Shim.column(WinnowArray(
      org.apache.spark.sql.graftshim.Shim.expression(text), k, w))

  /** Ascending content-defined chunk END positions (1-based; last is
    * always length) — see [[CdcBoundaries]]. */
  def cdcBoundaries(text: Column, window: Int, modulus: Int): Column =
    org.apache.spark.sql.graftshim.Shim.column(CdcBoundaries(
      org.apache.spark.sql.graftshim.Shim.expression(text), window, modulus))

  /** Per-row repetition counters `struct<n, d, topc>` — see
    * [[RepetitionStats]]. */
  def repetitionStats(text: Column): Column =
    org.apache.spark.sql.graftshim.Shim.column(RepetitionStats(
      org.apache.spark.sql.graftshim.Shim.expression(text)))

  /** Per-row MinHash signature `array<long>` — see [[MinHashSig]]. */
  def minhashSig(text: Column, k: Int, numHashes: Int): Column =
    org.apache.spark.sql.graftshim.Shim.column(MinHashSig(
      org.apache.spark.sql.graftshim.Shim.expression(text), k, numHashes))

  /** Distinct word n-grams, first-occurrence order — see
    * [[TokenNgrams]]. */
  def tokenNgrams(text: Column, n: Int): Column =
    org.apache.spark.sql.graftshim.Shim.column(TokenNgrams(
      org.apache.spark.sql.graftshim.Shim.expression(text), n))

  /** Per-word ` word ` hit counts in normalized text, input order —
    * see [[StopHits]]. */
  def stopHits(text: Column, words: Seq[String]): Column =
    org.apache.spark.sql.graftshim.Shim.column(StopHits(
      org.apache.spark.sql.graftshim.Shim.expression(text), words))

  /** Per-row typicality counters `struct<n_bigrams, sum_c2, sum_c1>`
    * against a trained bigram model — see [[TypicalityStats]]. */
  def typicalityStats(text: Column, model: Array[(String, Long, Long)]): Column =
    org.apache.spark.sql.graftshim.Shim.column(TypicalityStats(
      org.apache.spark.sql.graftshim.Shim.expression(text), model))
}

/** Fused typicality scoring: the three per-document sums of the
  * corpus-bigram model ([[graft.operators.TextAnalysis.typicalityScore]])
  * in ONE pass over the normalized text.
  *
  * The composable formulation — explode every bigram occurrence, inner
  * broadcast-join the (g → c2, c1) model, re-aggregate by document —
  * shuffles nothing (partial aggregation absorbs it) but pays explode +
  * probe + hash-agg row machinery per BIGRAM; at ~document-length rows
  * per document that machinery dominated q75. Here the model rides
  * along as one reference object (alphabet²-bounded — a few thousand
  * entries at any corpus size) and each row is one walk over its
  * bigrams with a hash lookup each: same sums, exact BIGINT, no
  * intermediate rows at all.
  *
  * Semantics locked to the composable form (TextAnalysisSpec asserts
  * row-for-row equality): bigrams in position order with multiplicity
  * ([[ShingleMultiArray]] slicing, including the shorter-than-k clamp),
  * and a bigram absent from the model contributes to NO counter —
  * exactly what the inner join drops. Long sums are order-free, so the
  * single in-order walk equals the aggregate's arbitrary order. */
case class TypicalityStats(child: Expression,
                           model: Array[(String, Long, Long)])
    extends UnaryExpression {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.types.{StructField, StructType}

  override def dataType: DataType = StructType(Seq(
    StructField("n_bigrams", LongType), StructField("sum_c2", LongType),
    StructField("sum_c1", LongType)))
  override def prettyName: String = "typicality_stats"

  // UTF8String-keyed view of the model, built once per JVM from the
  // serializable String form
  @transient private lazy val map: java.util.HashMap[UTF8String, Array[Long]] = {
    val m = new java.util.HashMap[UTF8String, Array[Long]](model.length * 2)
    model.foreach { case (g, c2, c1) =>
      m.put(UTF8String.fromString(g), Array(c2, c1))
    }
    m
  }

  def compute(s: UTF8String): InternalRow = {
    val len = s.numChars()
    var n = 0L
    var s2 = 0L
    var s1 = 0L
    def hit(g: UTF8String): Unit = {
      val e = map.get(g)
      if (e != null) { n += 1; s2 += e(0); s1 += e(1) }
    }
    if (len <= 2) hit(s.substringSQL(1, 2))
    else {
      // one byte walk + zero-copy byte-window probes (substringSQL
      // re-walks the prefix per call — O(len²); fromAddress views the
      // window in place, no copy per probe)
      val base = s.getBaseObject
      val off = s.getBaseOffset
      val nb = s.numBytes()
      val offs = new Array[Int](len + 1)
      var ci = 0; var b = 0
      while (b < nb) {
        offs(ci) = b
        b += UTF8String.numBytesForFirstByte(s.getByte(b))
        ci += 1
      }
      offs(len) = nb
      var i = 0
      val last = len - 2
      while (i <= last) {
        hit(UTF8String.fromAddress(base, off + offs(i), offs(i + 2) - offs(i)))
        i += 1
      }
    }
    InternalRow(n, s2, s1)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("typicalityExpr", this,
        classOf[TypicalityStats].getName)
      s"${ev.value} = $self.compute($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): TypicalityStats =
    copy(child = newChild)
}

/** Content-defined chunk boundaries in ONE JIT-compiled pass: END
  * position i (1-based) is a boundary iff the first-15-hex-chars md5
  * prefix of the `window`-gram ending at i is ≡ 0 (mod `modulus`);
  * the text length is always the final bound. Bit-identical to the
  * composable `filter(sequence(...), md5-conv)` form in
  * [[graft.operators.Dedup.chunkBoundsColComposable]] (the lambda
  * there is interpreted per position — switching to this loop took
  * q173 from 3.3 s to 1.8 s at sf0.1, with chunk-cut and chunk-md5
  * costs unchanged) and to the q173/q174/q178 DuckDB oracles, which replay
  * the same md5-prefix rule. Parity asserted in TextExpressionsSpec
  * over the corpus plus multi-byte/short/empty edge cases. */
case class CdcBoundaries(child: Expression, window: Int, modulus: Int)
    extends UnaryExpression {
  require(window >= 1, s"window=$window must be positive")
  require(modulus >= 2, s"modulus=$modulus must be >= 2")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "cdc_boundaries"

  @transient private lazy val mdLocal =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  def compute(s: UTF8String): GenericArrayData = {
    val n = s.numChars()
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    if (n >= window) {
      val md = mdLocal.get()
      var i = window
      while (i <= n) {
        val d = md.digest(s.substringSQL(i - window + 1, window).getBytes)
        // first 15 hex chars of the digest as a 60-bit long — identical
        // to conv(substring(md5(gram), 1, 15), 16, 10)
        var h = 0L
        var b = 0
        while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
        h = (h << 4) | ((d(7) >> 4) & 0xfL)
        if (h % modulus == 0) out += i
        i += 1
      }
    }
    if (out.isEmpty || out.last != n) out += n
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("cdcExpr", this,
        classOf[CdcBoundaries].getName)
      s"${ev.value} = $self.compute($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): CdcBoundaries =
    copy(child = newChild)
}

case class ShingleArray(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"k=$k must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_array"

  def compute(s: UTF8String): GenericArrayData = {
    val len = s.numChars()
    if (len <= k) return new GenericArrayData(Array[Any](s.substringSQL(1, k)))
    val n = len - k + 1
    val seen = new java.util.LinkedHashSet[UTF8String](n * 2)
    var i = 1
    while (i <= n) { seen.add(s.substringSQL(i, k)); i += 1 }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("shingleExpr", this,
        classOf[ShingleArray].getName)
      s"${ev.value} = $self.compute($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleArray =
    copy(child = newChild)
}

/** ALL k-character shingles of `text` in position order, multiplicity
  * preserved — the COUNTING twin of [[ShingleArray]] (which dedupes for
  * the set operators). Backing for per-position statistics like the
  * typicality score, where every occurrence contributes; the fused
  * JIT-compiled loop replaces a `transform(sequence(...), substring)`
  * chain whose per-element interpreted evaluation dominated q75.
  * Equality with the composable chain is asserted in
  * TextExpressionsSpec. */
case class ShingleMultiArray(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"k=$k must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_multi_array"

  def compute(s: UTF8String): GenericArrayData = {
    val len = s.numChars()
    if (len <= k) return new GenericArrayData(Array[Any](s.substringSQL(1, k)))
    // one byte walk for all char offsets — substringSQL(i, k) re-walks
    // the prefix per call, O(len²) on long rows (same fix as
    // ShingleHashArray); each shingle copies its own byte window
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nb = s.numBytes()
    val offs = new Array[Int](len + 1)
    var ci = 0; var b = 0
    while (b < nb) {
      offs(ci) = b
      b += UTF8String.numBytesForFirstByte(s.getByte(b))
      ci += 1
    }
    offs(len) = nb
    val n = len - k + 1
    val out = new Array[AnyRef](n)
    var i = 0
    while (i < n) {
      val bs = new Array[Byte](offs(i + k) - offs(i))
      org.apache.spark.unsafe.Platform.copyMemory(
        base, off + offs(i), bs, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        bs.length)
      out(i) = UTF8String.fromBytes(bs)
      i += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[AnyRef]])
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("shingleMultiExpr", this,
        classOf[ShingleMultiArray].getName)
      s"${ev.value} = $self.compute($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleMultiArray =
    copy(child = newChild)
}

/** Distinct xxhash64 values (seed 42 — identical to `xxhash64(shingle)`)
  * of the k-character shingles of `text`, first-occurrence order.
  *
  * The shingle-SET operators (Jaccard, LSH banding) never need the
  * shingle STRINGS downstream — only identity. Hashing inside the scan
  * means the posting shuffle carries 8-byte longs instead of UTF8
  * strings (≈3× smaller rows) and the aggregate hash map compares
  * longs, not bytes. One byte-offset walk per row: char positions are
  * precomputed once, each shingle hashed directly from the underlying
  * buffer — no per-shingle UTF8String allocation at all (ShingleArray's
  * `substringSQL(i, k)` re-walks the prefix per call, O(len²) on long
  * rows). 64-bit collisions merge two shingles (~0.03 expected at 10⁹
  * distinct — acceptable for dedup semantics, same trade documented on
  * the string index). Parity with `xxhash64(explode(shingle_array))`
  * asserted in TextExpressionsSpec. */
case class ShingleHashArray(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"k=$k must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash_array"

  def compute(s: UTF8String): GenericArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nb = s.numBytes()
    // byte offset of every char start, plus the end sentinel
    val len = s.numChars()
    val offs = new Array[Int](len + 1)
    var i = 0; var b = 0
    while (b < nb) {
      offs(i) = b
      b += UTF8String.numBytesForFirstByte(s.getByte(b))
      i += 1
    }
    offs(len) = nb
    if (len <= k) // whole text as its one shingle (substringSQL clamp)
      return new GenericArrayData(
        Array(XXH64.hashUnsafeBytes(base, off, nb, 42L)))
    val n = len - k + 1
    val seen = new java.util.LinkedHashSet[java.lang.Long](n * 2)
    i = 0
    while (i < n) {
      seen.add(XXH64.hashUnsafeBytes(
        base, off + offs(i), offs(i + k) - offs(i), 42L))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("shingleHashExpr", this,
        classOf[ShingleHashArray].getName)
      s"${ev.value} = $self.compute($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashArray =
    copy(child = newChild)
}

case class WinnowArray(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, s"k=$k, w=$w must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_array"

  // one digest instance per thread, not per row (digest() self-resets);
  // MessageDigest is not thread-safe, and expression instances are
  // shared across tasks
  @transient private lazy val mdLocal =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  def compute(s: UTF8String): GenericArrayData = {
    val len = s.numChars()
    val m = if (len >= k) len - k + 1 else 0
    if (m < w) return new GenericArrayData(Array.emptyLongArray)
    // k-gram hashes: first 4 md5 bytes as an unsigned 32-bit value —
    // identical to conv(substring(md5(g), 1, 8), 16, 10) in the
    // composable form and '0x'||substring(md5(g),1,8) in the oracle
    val md = mdLocal.get()
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      val d = md.digest(s.substringSQL(i + 1, k).getBytes)
      hs(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var j = 0
    while (j <= m - w) {
      var min = hs(j)
      var t = j + 1
      while (t < j + w) { if (hs(t) < min) min = hs(t); t += 1 }
      seen.add(min)
      j += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("winnowExpr", this,
        classOf[WinnowArray].getName)
      s"${ev.value} = $self.compute($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowArray =
    copy(child = newChild)
}

/** Fused within-doc repetition counters.
  *
  * The composable formulation ([[graft.operators.TextAnalysis
  * .repetitionAgg]]) explodes every bigram of every document into a
  * corpus-wide (doc, bigram) aggregation, re-aggregates per doc, and
  * joins the result back to the token counts — two full shuffles plus
  * a join for values that only ever depend on ONE row's text. This
  * expression computes the same counters in a single JIT-compiled pass
  * per document: tokenize (trim/lower/`\s+` split, empty tokens KEPT —
  * exactly `split(trim(lower(text)), "\s+")`), count distinct tokens,
  * count the modal bigram in a per-row hash map. Zero shuffles;
  * TextAnalysisSpec asserts row-for-row equality with the aggregation
  * form on the corpus and edge-case fixtures.
  *
  * Returns `struct(n int, d int, topc bigint)`: token count, distinct
  * token count, modal-bigram multiplicity (null when n < 2 — the
  * aggregation form's left-join miss).
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

  override def dataType: DataType = StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("d", IntegerType, nullable = false),
    StructField("topc", LongType, nullable = true)))
  override def prettyName: String = "repetition_stats"

  @transient private lazy val ws =
    java.util.regex.Pattern.compile("\\s+")

  def compute(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    // trim() is Spark's space-only trim; toLowerCase is UTF8String-
    // native — identical to trim(lower(text)). An all-spaces text trims
    // to "" (n = 0); other whitespace survives and splits like the
    // composable form (leading/trailing empty tokens kept, limit -1).
    val t = s.trim().toLowerCase().toString
    if (t.isEmpty)
      return org.apache.spark.sql.catalyst.InternalRow(0, 0, null)
    val toks = ws.split(t, -1)
    val n = toks.length
    val seen = new java.util.HashSet[String](n * 2)
    var i = 0
    while (i < n) { seen.add(toks(i)); i += 1 }
    if (n < 2)
      return org.apache.spark.sql.catalyst.InternalRow(n, seen.size, null)
    val counts = new java.util.HashMap[String, Int](n * 2)
    var topc = 0L
    i = 0
    while (i < n - 1) {
      val bg = toks(i) + " " + toks(i + 1)
      val c = counts.merge(bg, 1, Integer.sum)
      if (c > topc) topc = c.toLong
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(n, seen.size,
      java.lang.Long.valueOf(topc))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("repExpr", this,
        classOf[RepetitionStats].getName)
      s"${ev.value} = $self.compute($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

/** Fused per-row MinHash signature.
  *
  * The composable formulation ([[graft.operators.Dedup
  * .minhashSignatureAgg]]) routes every (shingle, doc) posting through
  * the corpus-wide inverted-index shuffle and a per-doc min
  * aggregation — a full shuffle of the posting list to compute a value
  * that only depends on ONE row's text (the index pays off only when a
  * plan-equal cached copy is already warm from a Jaccard run). This
  * expression computes the signature in a single JIT-compiled pass per
  * document: distinct k-shingles (same first-occurrence scan as
  * [[ShingleArray]]), one raw md5 per shingle, running minima of the
  * Kirsch–Mitzenmacher double-hash family hashᵢ = h1 + i·(h2 mod 2^59)
  * with h1/h2 = the two 60-bit md5 halves — bit-identical to the
  * aggregation form (and the DuckDB oracles' replay) because the md5
  * prefix extraction matches `conv(substring(md5(s), 1|17, 15), 16,
  * 10)` exactly. The round-1 measurement that ruled out per-posting
  * hashing was about INTERPRETED md5+conv Spark expressions; a raw
  * digest of a k-byte shingle inside one JIT loop costs ~µs per
  * document and buys back the entire posting shuffle.
  *
  * Zero shuffles; MinHashSpec asserts signature equality with the
  * aggregation form on the corpus and edge cases. Never null: every
  * text (even empty) has ≥ 1 shingle, like the composable form.
  */
case class MinHashSig(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression {
  require(k >= 1, s"k=$k must be positive")
  // 2^60 + 13·2^59 < 2^63; 15 hashes would overflow (same bound,
  // same reasoning as the aggregation form)
  require(numHashes >= 1 && numHashes <= 14,
    s"numHashes=$numHashes outside [1, 14] (64-bit double-hash family)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "minhash_sig"

  private val HashMod = 576460752303423488L // 2^59

  @transient private lazy val mdLocal =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  def compute(s: UTF8String): GenericArrayData = {
    val md = mdLocal.get()
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val len = s.numChars()
    val n = if (len <= k) 1 else len - k + 1
    val seen = new java.util.HashSet[UTF8String](n * 2)
    var i = 1
    while (i <= n) {
      val sh = s.substringSQL(i, k)
      if (seen.add(sh)) {
        val d = md.digest(sh.getBytes)
        // h1 = first 15 hex chars (60 bits), h2 = hex chars 17..31:
        // identical to conv(substring(md5(s), 1, 15), 16, 10) and
        // conv(substring(md5(s), 17, 15), 16, 10) % 2^59
        var h1 = 0L
        var j = 0
        while (j < 7) { h1 = (h1 << 8) | (d(j) & 0xffL); j += 1 }
        h1 = (h1 << 4) | ((d(7) >> 4) & 0xfL)
        var h2 = 0L
        j = 8
        while (j < 15) { h2 = (h2 << 8) | (d(j) & 0xffL); j += 1 }
        h2 = ((h2 << 4) | ((d(15) >> 4) & 0xfL)) % HashMod
        var q = 0
        var h = h1
        while (q < numHashes) {
          if (h < sig(q)) sig(q) = h
          h += h2
          q += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("minhashExpr", this,
        classOf[MinHashSig].getName)
      s"${ev.value} = $self.compute($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Distinct word n-grams (space-joined, first-occurrence order) over
  * the nonempty whitespace tokens of `text` — the unit of benchmark
  * decontamination (an eval-set n-gram occurring in a training doc
  * marks contamination). Tokenization is the corpus standard:
  * trim/lower/`\s+` split, empty tokens dropped. A text with fewer
  * than n tokens has no n-grams (empty array). One JIT-compiled pass
  * per row, zero shuffles; the composable
  * transform/sequence/array_distinct chain is interpreted
  * (CodegenFallback) and TextExpressionsSpec asserts equality. */
case class TokenNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n=$n must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "token_ngrams"

  @transient private lazy val ws =
    java.util.regex.Pattern.compile("\\s+")

  def compute(s: UTF8String): GenericArrayData = {
    val toks0 = ws.split(s.trim().toLowerCase().toString, -1)
    var m = 0
    var i = 0
    while (i < toks0.length) { if (toks0(i).nonEmpty) m += 1; i += 1 }
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[String](m)
    var j = 0
    i = 0
    while (i < toks0.length) {
      if (toks0(i).nonEmpty) { toks(j) = toks0(i); j += 1 }
      i += 1
    }
    val seen = new java.util.LinkedHashSet[UTF8String]((m - n + 1) * 2)
    val sb = new java.lang.StringBuilder()
    i = 0
    while (i <= m - n) {
      sb.setLength(0)
      var g = 0
      while (g < n) {
        if (g > 0) sb.append(' ')
        sb.append(toks(i + g))
        g += 1
      }
      seen.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("ngramExpr", this,
        classOf[TokenNgrams].getName)
      s"${ev.value} = $self.compute($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): TokenNgrams =
    copy(child = newChild)
}

/** Fused marker-word hit counters.
  *
  * The composable formulation ([[graft.operators.TextAnalysis
  * .wordHits]]) counts ` word ` occurrences by length difference after
  * a `regexp_replace` — correct, but each WORD pays a full regex scan
  * of the text AND recomputes the whitespace-collapsed normalization:
  * the 12-stopword quality metric ran 12 regex scans per document and
  * was the whole cost of q25. This expression normalizes once
  * (trim/lower/`\s+`→single space, space-padded — identical to
  * `concat(' ', regexp_replace(lower(trim(t)), '\s+', ' '), ' ')`) and
  * counts every needle with plain `indexOf` scans, continuing each
  * search at match END — the same non-overlapping semantics as the
  * regex replace (consecutive repeats share a delimiter space, so
  * ` the the ` counts ONE ` the ` hit in both forms). Returns one
  * count per word, in input order; TextExpressionsSpec asserts
  * per-word equality with the composable form over the corpus. */
case class StopHits(child: Expression, words: Seq[String])
    extends UnaryExpression {
  import org.apache.spark.sql.types.IntegerType
  require(words.nonEmpty, "words must be non-empty")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "stop_hits"

  @transient private lazy val ws =
    java.util.regex.Pattern.compile("\\s+")
  @transient private lazy val needles = words.map(w => s" $w ").toArray

  def compute(s: UTF8String): GenericArrayData = {
    val norm = " " + ws.matcher(s.trim().toLowerCase().toString)
      .replaceAll(" ") + " "
    val out = new Array[Int](needles.length)
    var w = 0
    while (w < needles.length) {
      val needle = needles(w)
      var hits = 0
      var from = 0
      var pos = norm.indexOf(needle, from)
      while (pos >= 0) {
        hits += 1
        from = pos + needle.length
        pos = norm.indexOf(needle, from)
      }
      out(w) = hits
      w += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("stopHitsExpr", this,
        classOf[StopHits].getName)
      s"${ev.value} = $self.compute($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): StopHits =
    copy(child = newChild)
}
