package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType, TimestampType}

/** As-of (point-in-time) join: for each left row, the right row of the
  * same key nearest in time — at-or-before (`backward`, the default),
  * at-or-after (`forward`), or whichever is closer (`nearest`), with an
  * optional match tolerance.
  *
  * The reference expresses the backward shape as an equi-join with a
  * BETWEEN residual against an SCD2 dimension
  * (`loading_rep_fraud.py:80-83`). That works when the right side is a
  * versioned dimension with closed intervals; the general as-of (no
  * closing timestamp) is implemented here with the union-sort trick
  * instead of a join:
  *
  *   union(left, right) → window over (key ORDER BY ts, rightFirst) →
  *   last_value(right payload STRUCT IGNORE NULLS) → filter left rows.
  *
  * The payload is carried as a struct (non-null per right row) so a right
  * row whose payload VALUE is null still wins as the most recent match.
  * The struct's first field is the matched right timestamp, which also
  * powers tolerance and nearest-side selection.
  *
  * This never builds join pairs, so a key with n left × m right rows costs
  * O(n+m log(n+m)) inside one shuffle partition instead of O(n·m) — the
  * property that matters at 100 TB where a hot key would otherwise explode.
  * `forward` is the same window over the reversed time ordering;
  * `nearest` evaluates both orderings (one exchange, two sorts — the
  * partitioning is shared) and picks the closer match, backward on ties.
  * Ties (left.ts == right.ts) match inclusively in both directions:
  * right rows sort first.
  */
object AsOfJoin {

  private val Directions = Set("backward", "forward", "nearest")

  /** @param left        probe side
    * @param right       build side (its `payloadCols` are appended)
    * @param key         equi key column name (same name both sides)
    * @param leftTs      event-time column on `left`
    * @param rightTs     event-time column on `right`
    * @param payloadCols right columns to carry (renamed `asof_<name>`)
    * @param direction   `backward` | `forward` | `nearest`
    * @param toleranceUs max |left.ts − right.ts| in microseconds for a
    *                    match to count (None = unbounded)
    */
  def apply(left: DataFrame, right: DataFrame, key: String,
            leftTs: String, rightTs: String,
            payloadCols: Seq[String],
            direction: String = "backward",
            toleranceUs: Option[Long] = None): DataFrame = {
    require(Directions(direction),
      s"direction must be one of ${Directions.mkString("/")}, got $direction")
    val leftCols = left.columns.toSeq
    val t = "__asof_ts"
    val side = "__asof_side" // 0 = right (sorts first at equal ts), 1 = left
    val p = "__asof_p"
    val rts = "__asof_rts" // matched right timestamp, rides the struct
    // The payload travels inside a struct that is non-null for every
    // right row (and null for left rows): `last(..., ignoreNulls)` then
    // always picks the MOST RECENT right row, even when that row's
    // payload value is legitimately NULL — flat per-column last() would
    // skip it and surface a stale older payload instead.
    val pType = StructType(
      StructField(rts, right.schema(rightTs).dataType) +:
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
        struct(col(rightTs).as(rts) +: payloadCols.map(col): _*).as(p): _*)

    // The payload struct joins the ordering as a tiebreak so that two
    // right rows sharing (key, ts) resolve deterministically (left rows
    // carry a null struct there and are unaffected).
    def win(desc: Boolean) = Window.partitionBy(col(key))
      .orderBy(if (desc) col(t).desc else col(t).asc, col(side), col(p))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    def us(c: Column): Column =
      if (right.schema(rightTs).dataType == TimestampType) unix_micros(c)
      else c.cast("long")

    val lts = us(col(t))
    def withinTol(dist: Column): Column =
      toleranceUs.map(tol => dist <= tol).getOrElse(lit(true))

    val chosen: Column = direction match {
      case "backward" =>
        val b = last(col(p), ignoreNulls = true).over(win(desc = false))
        when(b.isNotNull && withinTol(lts - us(b.getField(rts))), b)
      case "forward" =>
        val f = last(col(p), ignoreNulls = true).over(win(desc = true))
        when(f.isNotNull && withinTol(us(f.getField(rts)) - lts), f)
      case "nearest" =>
        val b = last(col(p), ignoreNulls = true).over(win(desc = false))
        val f = last(col(p), ignoreNulls = true).over(win(desc = true))
        val bDist = lts - us(b.getField(rts))
        val fDist = us(f.getField(rts)) - lts
        val bOk = b.isNotNull && withinTol(bDist)
        val fOk = f.isNotNull && withinTol(fDist)
        when(bOk && (!fOk || bDist <= fDist), b).when(fOk, f)
    }

    val filled = l.unionByName(r)
      .select(Seq(col(key), col(side)) ++
        leftCols.filterNot(_ == key).map(col) :+ chosen.as(p): _*)

    filled.where(col(side) === 1)
      .select(leftCols.map(col) ++
        payloadCols.map(c => col(p).getField(c).as(s"asof_$c")): _*)
  }

  /** Convenience for the common "latest right id/time" projection. */
  def latest(left: DataFrame, right: DataFrame, key: String,
             leftTs: String, rightTs: String, idCol: String): DataFrame =
    apply(left, right, key, leftTs, rightTs, Seq(idCol))
}
