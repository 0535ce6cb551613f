package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructField, StructType}
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

  /** Column API for [[BootstrapSums]]: per group, the B (Σ w·cents,
    * Σ w) replicate accumulators as `array<struct<s, n>>`, position =
    * replicate index. */
  def bootstrapSums(key: Column, cents: Column, b: Int,
                    thresholds: Seq[Long]): Column = {
    import org.apache.spark.sql.graftshim.Shim
    Shim.column(BootstrapSums(Shim.expression(key), Shim.expression(cents),
      b, thresholds).toAggregateExpression())
  }
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

/** One-pass bootstrap replicate accumulator: per group, B pairs
  * (Σ w_b·cents, Σ w_b) with w_b the deterministic Poisson weight of
  * (row key, replicate b) — the SAME draw as [[PoissonWeights]]
  * (PlannerSpec asserts bit-parity between the two paths).
  *
  * The explode-×B formulation materializes B rows per input row through
  * the aggregation; this algebraic aggregate keeps the fan-out inside a
  * 2B-long buffer — partials combine by element-wise addition, so the
  * map side reduces each partition to ONE buffer per group before the
  * exchange and the shuffle carries groups × 2B longs, independent of
  * row count. The bootstrap becomes exactly as distributed as a plain
  * SUM. */
case class BootstrapSums(
    keyExpr: Expression,
    centsExpr: Expression,
    b: Int,
    thresholds: Seq[Long],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {
  require(b >= 1, s"b=$b replicates")
  require(thresholds.size == 4, "exactly 4 Poisson CDF thresholds")

  @transient private lazy val t = thresholds.toArray
  @transient private lazy val mdLocal =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))
  @transient private lazy val suffixes: Array[Array[Byte]] =
    Array.tabulate(b)(i => ("|" + i).getBytes("UTF-8"))

  // buffer layout: s(0..b-1) then n(b..2b-1)
  override def createAggregationBuffer(): Array[Long] = new Array[Long](2 * b)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val k = keyExpr.eval(input)
    val c = centsExpr.eval(input)
    if (k != null && c != null) {
      val keyBytes = k.asInstanceOf[UTF8String].getBytes
      val cents = c.asInstanceOf[Long]
      val md = mdLocal.get()
      var i = 0
      while (i < b) {
        md.update(keyBytes)
        md.update(suffixes(i))
        val d = md.digest()
        var h = 0L
        var j = 0
        while (j < 7) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
        h = (h << 4) | ((d(7) >> 4) & 0xfL)
        val w =
          if (h < t(0)) 0 else if (h < t(1)) 1
          else if (h < t(2)) 2 else if (h < t(3)) 3 else 4
        if (w > 0) { buf(i) += w * cents; buf(b + i) += w }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 2 * b) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(Array.tabulate[Any](b)(i =>
      org.apache.spark.sql.catalyst.InternalRow(buf(i), buf(b + i))))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bytes = new Array[Byte](16 * b)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    var i = 0
    while (i < 2 * b) { bb.putLong(buf(i)); i += 1 }
    bytes
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Long](2 * b)
    var i = 0
    while (i < 2 * b) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("s", LongType), StructField("n", LongType))))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(keyExpr, centsExpr)
  override def prettyName: String = "bootstrap_sums"

  override def withNewMutableAggBufferOffset(newOffset: Int): BootstrapSums =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BootstrapSums =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BootstrapSums =
    copy(keyExpr = newChildren(0), centsExpr = newChildren(1))
}
