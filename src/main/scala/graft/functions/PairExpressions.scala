package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Fused in-bucket pair expansion.
  *
  * Every bucket-join dedup operator (n-gram Jaccard postings, MinHash
  * band buckets, incremental-LSH delta buckets) expands the ordered
  * pairs of a sorted id array in-row. The composable formulation —
  * `explode(flatten(transform(ids, (x, i) => transform(slice(ids,
  * i + 2, size(ids)), y => struct(x, y)))))` — is correct but every
  * element runs through three interpreted lambda layers plus two
  * intermediate array copies (Spark's higher-order functions are
  * CodegenFallback). This expression emits the same
  * `array<struct<id1, id2>>` in one JIT-compiled loop with a single
  * output allocation, preserving order (lexicographic in input
  * positions), so `explode` over it is a drop-in replacement.
  *
  * Long ids only — the only id type the corpus operators use; callers
  * with non-long ids keep the composable form
  * ([[graft.operators.Dedup.pairsFromBuckets]] picks per input type).
  */
object PairExpressions {
  /** Ordered pairs (by position) of a sorted `array<long>` column. */
  def pairArray(ids: Column): Column =
    org.apache.spark.sql.graftshim.Shim.column(PairArray(
      org.apache.spark.sql.graftshim.Shim.expression(ids)))

  /** |a ∩ b| of two SORTED `array<long>` columns — one two-pointer
    * walk, see [[SortedIntersectCount]]. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    org.apache.spark.sql.graftshim.Shim.column(SortedIntersectCount(
      org.apache.spark.sql.graftshim.Shim.expression(a),
      org.apache.spark.sql.graftshim.Shim.expression(b)))

  /** Binary-search membership of a long in a SORTED long array — the
    * exact per-row set probe, see [[SortedLongContains]]. */
  def sortedLongContains(sorted: Column, needle: Column): Column =
    org.apache.spark.sql.graftshim.Shim.column(SortedLongContains(
      org.apache.spark.sql.graftshim.Shim.expression(sorted),
      org.apache.spark.sql.graftshim.Shim.expression(needle)))
}

/** Membership of a long in a sorted-ascending long array by binary
  * search — the EXACT per-row set probe for a bounded reference set
  * that rides the plan as one literal (the streaming boilerplate
  * strip's hot-hash set). `array_contains` scans linearly and a Bloom
  * sketch trades in false positives (Spark's `BloomFilterAggregate` is
  * tuned for join pruning — measured ~1e-3 FP at small sketch sizes
  * regardless of the textbook numBits sizing); the binary search is
  * exact, O(log n) per row, and stays inside whole-stage codegen.
  * Input array MUST be sorted ascending; an empty array contains
  * nothing. */
case class SortedLongContains(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "sorted_long_contains"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sorted_long_contains expects (array<bigint>, bigint), got $other")
    }

  override def nullSafeEval(a: Any, n: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val x = n.asInstanceOf[Long]
    var lo = 0
    var hi = arr.numElements() - 1
    var found = false
    while (lo <= hi && !found) {
      val mid = (lo + hi) >>> 1
      val v = arr.getLong(mid)
      if (v == x) found = true
      else if (v < x) lo = mid + 1
      else hi = mid - 1
    }
    found
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, n) => {
      val lo = ctx.freshName("lo"); val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid"); val v = ctx.freshName("v")
      s"""
         |int $lo = 0; int $hi = $a.numElements() - 1;
         |${ev.value} = false;
         |while ($lo <= $hi && !${ev.value}) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  long $v = $a.getLong($mid);
         |  if ($v == $n) { ${ev.value} = true; }
         |  else if ($v < $n) { $lo = $mid + 1; } else { $hi = $mid - 1; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongContains =
    copy(left = newLeft, right = newRight)
}

/** Intersection SIZE of two sorted long arrays in one two-pointer walk.
  *
  * The triangle-count kernel ([[graft.operators.Graph.triangleCount]]):
  * per oriented edge (a→b), |out(a) ∩ out(b)| is the number of
  * triangles closed through that edge. `size(array_intersect(...))`
  * computes the same number but builds the intersection ARRAY through
  * interpreted higher-order machinery and hashes one side per row;
  * this walk does Σ(|a|+|b|) long comparisons in JIT-compiled code and
  * allocates nothing. Inputs must be sorted ascending (the adjacency
  * build sorts once per vertex, not once per edge). Duplicate elements
  * are counted min-multiplicity-wise, exactly like a sorted-merge —
  * adjacency arrays are duplicate-free by construction. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < nx && j < ny) {
      val xi = x.getLong(i)
      val yj = y.getLong(j)
      if (xi == yj) { c += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi"); val yj = ctx.freshName("yj")
      s"""
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $nx && $j < $ny) {
         |  long $xi = $a.getLong($i); long $yj = $b.getLong($j);
         |  if ($xi == $yj) { $c++; $i++; $j++; }
         |  else if ($xi < $yj) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

case class PairArray(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id1", LongType, nullable = false),
      StructField("id2", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "pair_array"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pair_array expects array<bigint>, got $other")
    }

  def compute(arr: ArrayData): GenericArrayData = {
    val n = arr.numElements()
    // Long arithmetic: n*(n-1)/2 overflows Int at n ≥ 46341, which
    // would surface as a NegativeArraySizeException on a degenerate
    // bucket (e.g. a band full of identical documents). Fail with the
    // actual cause instead — callers bound bucket size (maxDf, band
    // width) but MUST see a clear error when a corpus defeats those.
    val pairs = n.toLong * (n - 1) / 2
    if (pairs > Int.MaxValue - 8) throw new IllegalArgumentException(
      s"pair_array bucket too large: $n ids -> $pairs pairs exceeds array " +
        "capacity; cap bucket cardinality (maxDf / band width) before expansion")
    val out = new Array[Any](pairs.toInt)
    var idx = 0
    var i = 0
    while (i < n) {
      val a = arr.getLong(i)
      var j = i + 1
      while (j < n) {
        out(idx) = InternalRow(a, arr.getLong(j))
        idx += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("pairExpr", this, classOf[PairArray].getName)
      s"${ev.value} = $self.compute($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): PairArray =
    copy(child = newChild)
}
