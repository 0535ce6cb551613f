package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the most recent right row
  * of the same key at-or-before the left row's time.
  *
  * The reference expresses this shape as an equi-join with a BETWEEN
  * residual against an SCD2 dimension (`loading_rep_fraud.py:80-83`).
  * That works when the right side is a versioned dimension with closed
  * intervals; the general as-of (no closing timestamp) is implemented here
  * with the union-sort trick instead of a join:
  *
  *   union(left, right) → window over (key ORDER BY ts, rightFirst) →
  *   last_value(right payload STRUCT IGNORE NULLS) → filter left rows.
  *
  * The payload is carried as a struct (non-null per right row) so a right
  * row whose payload VALUE is null still wins as the most recent match.
  *
  * This never builds join pairs, so a key with n left × m right rows costs
  * O(n+m log(n+m)) inside one shuffle partition instead of O(n·m) — the
  * property that matters at 100 TB where a hot key would otherwise explode.
  * Ties (left.ts == right.ts) match inclusively: right rows sort first.
  */
object AsOfJoin {

  /** @param left       probe side
    * @param right      build side (its `payloadCols` are appended)
    * @param key        equi key column name (same name both sides)
    * @param leftTs     event-time column on `left`
    * @param rightTs    event-time column on `right`
    * @param payloadCols right columns to carry (renamed `asof_<name>`)
    */
  def apply(left: DataFrame, right: DataFrame, key: String,
            leftTs: String, rightTs: String,
            payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val t = "__asof_ts"
    val side = "__asof_side" // 0 = right (sorts first at equal ts), 1 = left
    val p = "__asof_p"
    // The payload travels inside a struct that is non-null for every
    // right row (and null for left rows): `last(..., ignoreNulls)` then
    // always picks the MOST RECENT right row, even when that row's
    // payload value is legitimately NULL — flat per-column last() would
    // skip it and surface a stale older payload instead.
    val pType = org.apache.spark.sql.types.StructType(
      payloadCols.map(c => right.schema(c)))

    val l = left
      .withColumn(t, col(leftTs))
      .withColumn(side, lit(1))
      .select(Seq(col(key), col(t), col(side)) ++
        leftCols.filterNot(_ == key).map(col) :+
        lit(null).cast(pType).as(p): _*)
    val r = right
      .withColumn(t, col(rightTs))
      .withColumn(side, lit(0))
      .select(Seq(col(key), col(t), col(side)) ++
        leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payloadCols.map(col): _*).as(p): _*)

    // The payload struct joins the ordering as a tiebreak so that two
    // right rows sharing (key, ts) resolve deterministically (left rows
    // carry a null struct there and are unaffected).
    val w = Window.partitionBy(col(key))
      .orderBy(col(t), col(side), col(p))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = l.unionByName(r)
      .select(Seq(col(key), col(side)) ++
        leftCols.filterNot(_ == key).map(col) :+
        last(col(p), ignoreNulls = true).over(w).as(p): _*)

    filled.where(col(side) === 1)
      .select(leftCols.map(col) ++
        payloadCols.map(c => col(p).getField(c).as(s"asof_$c")): _*)
  }

  /** Convenience for the common "latest right id/time" projection. */
  def latest(left: DataFrame, right: DataFrame, key: String,
             leftTs: String, rightTs: String, idCol: String): DataFrame =
    apply(left, right, key, leftTs, rightTs, Seq(idCol))
}
