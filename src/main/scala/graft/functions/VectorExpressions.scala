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

object VectorExpressions {
  /** `Column` wrapper for [[DotProduct]]. */
  def dotNative(a: Column, b: Column): Column =
    org.apache.spark.sql.graftshim.Shim.column(DotProduct(
      org.apache.spark.sql.graftshim.Shim.expression(a),
      org.apache.spark.sql.graftshim.Shim.expression(b)))

  /** `Column` wrapper for [[LshBuckets]]: array of `tables` bucket keys. */
  def lshBucketsNative(vec: Column, dim: Int, planes: Int, tables: Int): Column =
    org.apache.spark.sql.graftshim.Shim.column(LshBuckets(
      org.apache.spark.sql.graftshim.Shim.expression(vec), dim, planes, tables))
}
