package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-row Poisson-bootstrap weight vector.
  *
  * The composable formulation (explode ×B, then per-(row, replicate)
  * `md5(concat(key, '|', b))` through [[graft.operators.Sketches.hash60]])
  * pays Spark's per-call Md5 overhead — a fresh digest instance plus a
  * hex-string round-trip and a string-parsing `conv` — B times per row;
  * measured 69 s for the 38M-hash replicate pass at sf0.1. This
  * expression computes all B weights in ONE invocation per row: a
  * task-local reused MessageDigest, key bytes encoded once, and the
  * 60-bit prefix read directly from the digest bytes (`(bytes[0..7]
  * big-endian) >>> 4` ≡ `conv(substring(md5(k), 1, 15), 16, 10)` — the
  * [[SimhashText]] trick). Bit-identical to the composable form and to
  * the DuckDB oracle replay (BootstrapSpec/PlannerSpec assert both).
  */
object BootstrapExpr {
  def poissonWeights(key: Column, b: Int, thresholds: Seq[Long]): Column =
    org.apache.spark.sql.graftshim.Shim.column(PoissonWeights(
      org.apache.spark.sql.graftshim.Shim.expression(key), b, thresholds))
}

case class PoissonWeights(child: Expression, b: Int, thresholds: Seq[Long])
    extends UnaryExpression {
  require(b >= 1, s"b=$b replicates")
  require(thresholds.size == 4, "exactly 4 Poisson CDF thresholds")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "poisson_weights"

  @transient private lazy val t = thresholds.toArray
  @transient private lazy val mdLocal =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))
  // "|0", "|1", ... suffix bytes, encoded once per task
  @transient private lazy val suffixes: Array[Array[Byte]] =
    Array.tabulate(b)(i => ("|" + i).getBytes("UTF-8"))

  def compute(key: UTF8String): ArrayData = {
    val md = mdLocal.get()
    val keyBytes = key.getBytes
    val out = new Array[Int](b)
    var i = 0
    while (i < b) {
      md.update(keyBytes)
      md.update(suffixes(i))
      val d = md.digest() // digest() resets the instance for reuse
      var h = 0L
      var j = 0
      while (j < 7) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
      h = (h << 4) | ((d(7) >> 4) & 0xfL)
      out(i) =
        if (h < t(0)) 0 else if (h < t(1)) 1
        else if (h < t(2)) 2 else if (h < t(3)) 3 else 4
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("poissonWeightsExpr", this,
        classOf[PoissonWeights].getName)
      s"${ev.value} = ($self.compute($v));"
    })

  override protected def withNewChildInternal(newChild: Expression): PoissonWeights =
    copy(child = newChild)
}
