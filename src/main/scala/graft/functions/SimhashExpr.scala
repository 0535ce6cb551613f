package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-row SimHash.
  *
  * The composable formulation ([[graft.operators.Dedup.simhashAgg]])
  * tokenizes with an explode, deduplicates (doc, token)
  * with a corpus-wide DISTINCT shuffle, and folds bit weights with a
  * `bits`-accumulator aggregation — two full shuffles of every token in
  * the corpus to compute a value that only ever depends on ONE row's
  * text. This expression computes the signature in a single
  * JIT-compiled pass per document: tokenize, de-duplicate in-row, md5
  * each distinct token once, accumulate the ±1 bit weights, emit the
  * sign bits. Zero shuffles; the signature stays bit-identical (same
  * tokenizer, same md5-prefix hash, same weight rule — SimhashSpec
  * asserts equality with the aggregation form on corpus + edge cases,
  * and the q31/q50 DuckDB oracles replay it unchanged).
  *
  * Returns NULL for a document with no tokens — the aggregation form
  * emits no row for such a document, so callers filter nulls and the
  * two forms stay row-for-row identical.
  */
object SimhashExpr {
  def simhashText(text: Column, bits: Int): Column =
    org.apache.spark.sql.graftshim.Shim.column(SimhashText(
      org.apache.spark.sql.graftshim.Shim.expression(text), bits))
}

case class SimhashText(child: Expression, bits: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 60, s"bits=$bits outside [1, 60]")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash_text"

  // 8 hex chars (32 bits) for narrow signatures, 15 (60 bits) above —
  // the same widths as the aggregation form and the DuckDB oracles
  private val hexLen = if (bits <= 32) 8 else 15

  @transient private lazy val mdLocal =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))
  @transient private lazy val ws =
    java.util.regex.Pattern.compile("\\s+")

  /** Boxed Long so codegen's nullSafeEval contract can yield null
    * (no tokens ⇒ the aggregation form emits no row). */
  def compute(s: UTF8String): java.lang.Long = {
    // trim() removes ' ' only and toLowerCase is UTF8String-native —
    // exactly Spark's trim()/lower(); the regex split matches
    // functions.split(_, "\\s+") + the length > 0 filter
    val toks = ws.split(s.trim().toLowerCase().toString, -1)
    val seen = new java.util.HashSet[String]()
    val w = new Array[Int](bits)
    val md = mdLocal.get()
    var any = false
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      if (tok.nonEmpty && seen.add(tok)) {
        any = true
        val d = md.digest(tok.getBytes("UTF-8"))
        // first hexLen hex chars of the digest as a long — identical to
        // conv(substring(md5(tok), 1, hexLen), 16, 10)
        var h = 0L
        if (hexLen == 8) {
          h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        } else {
          var i = 0
          while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
          h = (h << 4) | ((d(7) >> 4) & 0xfL)
        }
        var j = 0
        while (j < bits) {
          if (((h >> j) & 1L) == 1L) w(j) += 1 else w(j) -= 1
          j += 1
        }
      }
      t += 1
    }
    if (!any) return null
    var sig = 0L
    var j = 0
    while (j < bits) { if (w(j) > 0) sig |= 1L << j; j += 1 }
    java.lang.Long.valueOf(sig)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("simhashExpr", this,
        classOf[SimhashText].getName)
      s"""java.lang.Long r = $self.compute($v);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.longValue(); }
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimhashText =
    copy(child = newChild)
}
