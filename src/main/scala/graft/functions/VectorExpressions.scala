package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the dense dot product of two
  * `array<double>` columns.
  *
  * The composable formulation `aggregate(zip_with(a, b, _*_), 0d, _+_)`
  * is semantically identical but allocates an intermediate array and
  * walks lambda-bound higher-order functions per row — at 25M pairs ×
  * 64 dims (brute-force similarity at sf0.1) that dominates the query.
  * This expression keeps whole-stage codegen tight: one fused loop, no
  * allocation, strict left-to-right summation (bit-identical to the
  * fold and to the DuckDB oracle's `list_dot_product`).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs are constructed internally as array<double>; no analysis-time
  // coercion needed (AbstractDataType is private[sql] in Spark 4)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Fused random-hyperplane LSH bucketing: ALL `tables` bucket keys of a
  * vector in one pass over one flattened ±1 plane matrix.
  *
  * The composable formulation (one [[DotProduct]] per plane, `tables ×
  * planes` separate expression trees each against a `dim`-element literal
  * array) is semantically identical but costs a huge expression tree per
  * row — 252 plane probes at the q34 parameters. Here the matrix is a
  * single `double[]` reference object and the whole signature is one
  * codegen'd triple loop: `tables·planes·dim` multiply-adds, zero
  * allocation beyond the output array.
  *
  * The matrix is NOT serialized: it is rebuilt deterministically on each
  * executor from (planes, tables, dim) via the same md5-derived
  * [[graft.operators.Similarity.planeSign]] family the unfused form uses,
  * so results are bit-identical to the per-plane [[DotProduct]] chain. */
case class LshBuckets(child: Expression, dim: Int, planes: Int, tables: Int)
    extends UnaryExpression {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types.{ArrayType, LongType}

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_buckets"

  // flattened [plane][dim]; deterministic, rebuilt per JVM (not shipped)
  @transient private lazy val signs: Array[Double] =
    Array.tabulate(tables * planes * dim)(i =>
      graft.operators.Similarity.planeSign(i / dim, i % dim))

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(dim, v.numElements())
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var key = 0L
      var j = 0
      while (j < planes) {
        val base = (t * planes + j) * dim
        var s = 0.0
        var i = 0
        while (i < n) { s += v.getDouble(i) * signs(base + i); i += 1 }
        if (s > 0) key |= 1L << j
        j += 1
      }
      out(t) = key
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val m = ctx.addReferenceObj("lshSigns", signs, "double[]")
      val n = ctx.freshName("n")
      val arr = ctx.freshName("arr")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val key = ctx.freshName("key")
      val base = ctx.freshName("base")
      s"""
         |int $n = java.lang.Math.min($dim, $v.numElements());
         |long[] $arr = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $key = 0L;
         |  for (int $j = 0; $j < $planes; $j++) {
         |    int $base = ($t * $planes + $j) * $dim;
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $s += $v.getDouble($i) * $m[$base + $i];
         |    }
         |    if ($s > 0) $key |= 1L << $j;
         |  }
         |  $arr[$t] = $key;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

/** Query-directed multiprobe keys (Lv et al., VLDB'07): per table, the
  * base bucket plus `flips` perturbed buckets obtained by flipping the
  * planes with the SMALLEST |dot| margin — the planes a true neighbour
  * most plausibly landed on the other side of. Against blind all-bit
  * flipping this concentrates the probe budget where the collision
  * probability mass actually is, so the same recall needs a fraction of
  * the candidate pairs.
  *
  * Output layout: `tables × (flips+1)` longs; entry `t*(flips+1)` is
  * table t's base bucket, followed by its `flips` perturbations
  * (ascending margin). Same deterministic md5 plane family as
  * [[LshBuckets]] — a probe key equals the neighbour's [[LshBuckets]]
  * base key whenever they truly collide, which is what the bucket
  * equi-join tests.
  *
  * The margin bookkeeping makes hand-rolled codegen noisy, so codegen
  * emits one call into [[computeProbes]] (JIT-compiled Scala, same
  * triple loop) instead of inlining it — still inside whole-stage
  * codegen, no interpreted expression fallback. */
case class LshProbes(child: Expression, dim: Int, planes: Int, tables: Int,
                     flips: Int)
    extends UnaryExpression {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types.{ArrayType, LongType}
  require(flips >= 0 && flips <= planes,
    s"flips=$flips must be within [0, planes=$planes]")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_probes"

  // flattened [plane][dim]; deterministic, rebuilt per JVM (not shipped)
  @transient private lazy val signs: Array[Double] =
    Array.tabulate(tables * planes * dim)(i =>
      graft.operators.Similarity.planeSign(i / dim, i % dim))

  def computeProbes(v: ArrayData): Array[Long] = {
    val n = math.min(dim, v.numElements())
    val out = new Array[Long](tables * (flips + 1))
    val margin = new Array[Double](planes)
    var t = 0
    while (t < tables) {
      var key = 0L
      var j = 0
      while (j < planes) {
        val base = (t * planes + j) * dim
        var s = 0.0
        var i = 0
        while (i < n) { s += v.getDouble(i) * signs(base + i); i += 1 }
        margin(j) = math.abs(s)
        if (s > 0) key |= 1L << j
        j += 1
      }
      val off = t * (flips + 1)
      out(off) = key
      var used = 0L
      var f = 0
      while (f < flips) {
        var bestJ = 0
        var bestA = Double.MaxValue
        j = 0
        while (j < planes) {
          if (((used >> j) & 1L) == 0L && margin(j) < bestA) {
            bestA = margin(j); bestJ = j
          }
          j += 1
        }
        used |= 1L << bestJ
        out(off + 1 + f) = key ^ (1L << bestJ)
        f += 1
      }
      t += 1
    }
    out
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(computeProbes(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("lshProbesExpr", this,
        classOf[LshProbes].getName)
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"$self.computeProbes($v));"
    })

  override protected def withNewChildInternal(newChild: Expression): LshProbes =
    copy(child = newChild)
}

/** Block-nested-loop exact cosine kernel: given two BLOCKS of vectors
  * (arrays of `struct<id bigint, v array<double>>`), emit for every
  * left vector its best `k` right neighbours within this block pair —
  * `array<struct<id_a, id_b, cosine>>`, to be merged across block pairs
  * by the bounded [[TopKByScore]] aggregate.
  *
  * This is how exact all-pairs similarity survives scale: the row-level
  * crossJoin ([[graft.operators.Similarity.cosineAllPairs]]) evaluates
  * one expression tree per PAIR — n² virtual-call row handoffs dominate
  * long before the arithmetic does. Blocking turns the same n²·d work
  * into blocks² dense kernels over primitive arrays (unpacked once per
  * block pair, cache-resident), exactly the shape of a matrix-multiply
  * tile — and neither side ever needs to fit in memory, because blocks
  * pair up one at a time.
  *
  * Bit-parity: per-vector norms and per-pair dots use the same strict
  * index-order folds as [[DotProduct]], and the local top-k uses the
  * same (cosine DESC, id ASC) order as [[TopKByScore]], so the merged
  * result is identical to the crossJoin formulation row-for-row — the
  * two share one DuckDB oracle.
  *
  * Codegen emits one call into [[compute]] (JIT-compiled Scala) — the
  * kernel stays inside whole-stage codegen without inlining a page of
  * generated Java, same pattern as [[LshProbes]]. */
case class BlockTopK(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.types.{ArrayType, LongType, StructField, StructType}
  require(k >= 1, s"k=$k must be positive")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id_a", LongType), StructField("id_b", LongType),
    StructField("cosine", DoubleType))), containsNull = false)
  override def prettyName: String = "block_topk"

  private def unpack(block: ArrayData): (Array[Long], Array[Array[Double]], Array[Double]) = {
    val n = block.numElements()
    val ids = new Array[Long](n)
    val vecs = new Array[Array[Double]](n)
    val nrms = new Array[Double](n)
    var i = 0
    while (i < n) {
      val row = block.getStruct(i, 2)
      ids(i) = row.getLong(0)
      val v = row.getArray(1).toDoubleArray()
      vecs(i) = v
      var s = 0.0
      var d = 0
      while (d < v.length) { s += v(d) * v(d); d += 1 }
      nrms(i) = math.sqrt(s)
      i += 1
    }
    (ids, vecs, nrms)
  }

  def compute(ra: ArrayData, rb: ArrayData): GenericArrayData = {
    val (idsA, vecsA, nrmA) = unpack(ra)
    val (idsB, vecsB, nrmB) = unpack(rb)
    val out = new java.util.ArrayList[Any](idsA.length * k)
    // per left vector: bounded insertion top-k, best-first, ordered
    // (cosine DESC, id ASC) — the same order TopKByScore merges with
    val topS = new Array[Double](k)
    val topI = new Array[Long](k)
    var a = 0
    while (a < idsA.length) {
      val va = vecsA(a)
      val na = nrmA(a)
      var cnt = 0
      var b = 0
      while (b < idsB.length) {
        if (idsB(b) != idsA(a)) {
          val vb = vecsB(b)
          val d = math.min(va.length, vb.length)
          var s = 0.0
          var i = 0
          while (i < d) { s += va(i) * vb(i); i += 1 }
          val cos = s / (na * nrmB(b))
          val id = idsB(b)
          if (cnt < k ||
              cos > topS(cnt - 1) || (cos == topS(cnt - 1) && id < topI(cnt - 1))) {
            var pos = math.min(cnt, k - 1)
            while (pos > 0 &&
                   (cos > topS(pos - 1) || (cos == topS(pos - 1) && id < topI(pos - 1)))) {
              topS(pos) = topS(pos - 1); topI(pos) = topI(pos - 1); pos -= 1
            }
            topS(pos) = cos; topI(pos) = id
            if (cnt < k) cnt += 1
          }
        }
        b += 1
      }
      var j = 0
      while (j < cnt) {
        out.add(InternalRow(idsA(a), topI(j), topS(j)))
        j += 1
      }
      a += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val self = ctx.addReferenceObj("blockTopKExpr", this,
        classOf[BlockTopK].getName)
      s"${ev.value} = $self.compute($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BlockTopK =
    copy(left = newLeft, right = newRight)
}

/** Block-nested-loop exact cosine NEAR-DUP kernel: given two blocks of
  * vectors (same packed shape as [[BlockTopK]]), emit every cross pair
  * with id_a < id_b and cosine ≥ threshold. The ordered-id filter makes
  * each unordered pair surface in exactly ONE of the two symmetric
  * block pairs of the blocks² cross join (and once within a diagonal
  * block), so no downstream distinct is needed. Same strict index-order
  * folds as [[DotProduct]]/[[BlockTopK]], so results are bit-identical
  * to the crossJoin formulation
  * ([[graft.operators.Similarity.cosineNearDup]]) and share its DuckDB
  * oracle. */
case class BlockNearDup(left: Expression, right: Expression, threshold: Double)
    extends BinaryExpression {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.types.{ArrayType, LongType, StructField, StructType}

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id_a", LongType), StructField("id_b", LongType),
    StructField("cosine", DoubleType))), containsNull = false)
  override def prettyName: String = "block_neardup"

  private def unpack(block: ArrayData): (Array[Long], Array[Array[Double]], Array[Double]) = {
    val n = block.numElements()
    val ids = new Array[Long](n)
    val vecs = new Array[Array[Double]](n)
    val nrms = new Array[Double](n)
    var i = 0
    while (i < n) {
      val row = block.getStruct(i, 2)
      ids(i) = row.getLong(0)
      val v = row.getArray(1).toDoubleArray()
      vecs(i) = v
      var s = 0.0
      var d = 0
      while (d < v.length) { s += v(d) * v(d); d += 1 }
      nrms(i) = math.sqrt(s)
      i += 1
    }
    (ids, vecs, nrms)
  }

  def compute(ra: ArrayData, rb: ArrayData): GenericArrayData = {
    val (idsA, vecsA, nrmA) = unpack(ra)
    val (idsB, vecsB, nrmB) = unpack(rb)
    val out = new java.util.ArrayList[Any]()
    var a = 0
    while (a < idsA.length) {
      val va = vecsA(a)
      val na = nrmA(a)
      val ia = idsA(a)
      var b = 0
      while (b < idsB.length) {
        if (ia < idsB(b)) {
          val vb = vecsB(b)
          val d = math.min(va.length, vb.length)
          var s = 0.0
          var i = 0
          while (i < d) { s += va(i) * vb(i); i += 1 }
          val cos = s / (na * nrmB(b))
          if (cos >= threshold) out.add(InternalRow(ia, idsB(b), cos))
        }
        b += 1
      }
      a += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val self = ctx.addReferenceObj("blockNearDupExpr", this,
        classOf[BlockNearDup].getName)
      s"${ev.value} = $self.compute($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BlockNearDup =
    copy(left = newLeft, right = newRight)
}

/** Fused IVF cell probe: the `nprobe` nearest centroids of a vector in
  * ONE pass over one flattened centroid matrix.
  *
  * The composable formulation ([[graft.operators.Ivf.probeCellsExpr]] —
  * an `array_sort` over `nlist` per-centroid struct expressions, each
  * with its own [[DotProduct]] against a `dim`-element literal array)
  * is semantically identical but builds an `nlist`-wide expression tree
  * per row — at the textbook nlist ≈ √n sizing that tree GROWS with the
  * corpus (√20000 ≈ 142 dot products per row at sf0.1) and its
  * evaluation dominated q39, the same way the per-plane LSH chain
  * dominated q34 before [[LshBuckets]]. Here the centroids ride along
  * as one flat `double[]` reference object and the probe is one
  * codegen'd double loop plus a bounded (d², cell)-ordered insertion —
  * identical selection order to `array_sort(struct(d, cell))`, so the
  * probed cells match the composable form exactly (IvfSpec asserts it).
  *
  * Unlike [[LshBuckets]]' seed-derived planes, centroids are DATA
  * (KMeans output), so the matrix ships with the serialized plan —
  * nlist × dim doubles, e.g. 142 × 16 ≈ 18 KB at sf0.1: far under any
  * task-size concern, and broadcast-equivalent in cost. Per-row and
  * stateless, so it composes with streaming probes
  * ([[graft.streaming.Streams.retrieveStream]]) in append mode. */
case class IvfProbe(child: Expression, centroidsFlat: Array[Double],
                    dim: Int, nprobe: Int)
    extends UnaryExpression {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types.{ArrayType, IntegerType}
  require(dim > 0 && centroidsFlat.length % dim == 0,
    s"centroid matrix length ${centroidsFlat.length} not a multiple of dim=$dim")
  private def nlist: Int = centroidsFlat.length / dim
  require(nprobe >= 1 && nprobe <= nlist,
    s"nprobe=$nprobe must be within [1, nlist=$nlist]")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "ivf_probe"

  // ‖c‖² per cell, precomputed once per plan (strict index-order sum —
  // same order as the composable form's c.map(x => x*x).sum)
  @transient private lazy val cn2: Array[Double] = {
    val out = new Array[Double](nlist)
    var c = 0
    while (c < nlist) {
      var s = 0.0
      var i = 0
      while (i < dim) { s += centroidsFlat(c * dim + i) * centroidsFlat(c * dim + i); i += 1 }
      out(c) = s
      c += 1
    }
    out
  }

  def computeCells(v: ArrayData): Array[Int] = {
    val n = math.min(dim, v.numElements())
    // ‖v‖² via the same strict fold → sqrt → square chain as the
    // composable form (which receives nrm = sqrt(dot(v,v)) and squares
    // it), so d² is bit-identical to probeCellsExpr's
    var s1 = 0.0
    var i = 0
    while (i < n) { s1 += v.getDouble(i) * v.getDouble(i); i += 1 }
    val nrm = math.sqrt(s1)
    val vn2 = nrm * nrm
    // bounded ascending insertion by (d², cell): array_sort order
    val topD = new Array[Double](nprobe)
    val topC = new Array[Int](nprobe)
    var cnt = 0
    var c = 0
    while (c < nlist) {
      var dp = 0.0
      i = 0
      val base = c * dim
      while (i < n) { dp += v.getDouble(i) * centroidsFlat(base + i); i += 1 }
      val d = vn2 - 2.0 * dp + cn2(c)
      if (cnt < nprobe || d < topD(cnt - 1)) { // cell asc: strict < keeps earlier cell on tie
        var pos = math.min(cnt, nprobe - 1)
        while (pos > 0 && d < topD(pos - 1)) {
          topD(pos) = topD(pos - 1); topC(pos) = topC(pos - 1); pos -= 1
        }
        topD(pos) = d; topC(pos) = c
        if (cnt < nprobe) cnt += 1
      }
      c += 1
    }
    java.util.Arrays.copyOf(topC, cnt)
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(computeCells(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("ivfProbeExpr", this,
        classOf[IvfProbe].getName)
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"$self.computeCells($v));"
    })

  override protected def withNewChildInternal(newChild: Expression): IvfProbe =
    copy(child = newChild)
}

/** Native ADC (asymmetric-distance) lookup-sum for PQ serving:
  * `codes` is a vector's packed `array<int>` of m subquantizer codes,
  * `lut` a query's flattened `array<long>` of m·k exact codeword
  * distances ordered by (subquantizer, code); result =
  * Σ_m lut[m·k + codes[m]].
  *
  * The composable forms measured slower than the exact 64-dim dot
  * they are meant to beat (the whole point of 8-byte codes):
  * `aggregate(zip_with(...))` runs interpreted with per-row allocation
  * (~3× the dot at 262M pairs), and even 8 unrolled `element_at`
  * terms pay branchy per-access checks (~1.5×). One fused loop keeps
  * the pair scan inside whole-stage codegen at m array reads + adds. */
case class AdcLookup(left: Expression, right: Expression, codewords: Int)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "adc_lookup"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    var acc = 0L
    var m = 0
    val n = codes.numElements()
    while (m < n) {
      acc += lut.getLong(m * codewords + codes.getInt(m))
      m += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $codes.numElements();
         |long $acc = 0L;
         |for (int $m = 0; $m < $n; $m++) {
         |  $acc += $lut.getLong($m * $codewords + $codes.getInt($m));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcLookup =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** `Column` wrapper for [[AdcLookup]]. */
  def adcLookupNative(codes: Column, lut: Column, codewords: Int): Column =
    org.apache.spark.sql.graftshim.Shim.column(AdcLookup(
      org.apache.spark.sql.graftshim.Shim.expression(codes),
      org.apache.spark.sql.graftshim.Shim.expression(lut), codewords))

  /** `Column` wrapper for [[DotProduct]]. */
  def dotNative(a: Column, b: Column): Column =
    org.apache.spark.sql.graftshim.Shim.column(DotProduct(
      org.apache.spark.sql.graftshim.Shim.expression(a),
      org.apache.spark.sql.graftshim.Shim.expression(b)))

  /** `Column` wrapper for [[LshBuckets]]: array of `tables` bucket keys. */
  def lshBucketsNative(vec: Column, dim: Int, planes: Int, tables: Int): Column =
    org.apache.spark.sql.graftshim.Shim.column(LshBuckets(
      org.apache.spark.sql.graftshim.Shim.expression(vec), dim, planes, tables))

  /** `Column` wrapper for [[BlockTopK]]: per-left-vector local top-k
    * over one block pair. */
  def blockTopKNative(ra: Column, rb: Column, k: Int): Column =
    org.apache.spark.sql.graftshim.Shim.column(BlockTopK(
      org.apache.spark.sql.graftshim.Shim.expression(ra),
      org.apache.spark.sql.graftshim.Shim.expression(rb), k))

  /** `Column` wrapper for [[BlockNearDup]]: threshold pairs over one
    * block pair, id_a < id_b. */
  def blockNearDupNative(ra: Column, rb: Column, threshold: Double): Column =
    org.apache.spark.sql.graftshim.Shim.column(BlockNearDup(
      org.apache.spark.sql.graftshim.Shim.expression(ra),
      org.apache.spark.sql.graftshim.Shim.expression(rb), threshold))

  /** `Column` wrapper for [[IvfProbe]]: the `nprobe` nearest cells. */
  def ivfProbeNative(vec: Column, centroidsFlat: Array[Double], dim: Int,
                     nprobe: Int): Column =
    org.apache.spark.sql.graftshim.Shim.column(IvfProbe(
      org.apache.spark.sql.graftshim.Shim.expression(vec), centroidsFlat, dim, nprobe))

  /** `Column` wrapper for [[LshProbes]]: `tables×(flips+1)` probe keys. */
  def lshProbesNative(vec: Column, dim: Int, planes: Int, tables: Int,
                      flips: Int): Column =
    org.apache.spark.sql.graftshim.Shim.column(LshProbes(
      org.apache.spark.sql.graftshim.Shim.expression(vec), dim, planes, tables, flips))
}
