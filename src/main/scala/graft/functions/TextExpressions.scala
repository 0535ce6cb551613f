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

  /** Distinct winnowing fingerprints of `text` (k-gram md5-prefix
    * hashes, min per w-window), first-occurrence order. */
  def winnowArray(text: Column, k: Int, w: Int): Column =
    org.apache.spark.sql.graftshim.Shim.column(WinnowArray(
      org.apache.spark.sql.graftshim.Shim.expression(text), k, w))
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
