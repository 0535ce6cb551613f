package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a grouped-aggregate materialized view.
  *
  * The reference pipeline recomputes its reporting aggregates from the
  * full warehouse on every batch (`/root/reference/main.py` re-runs the
  * report SQL after each load). At 100 TB a full recompute per batch is
  * the scale-killer: the right shape is a maintained MV — `(group,
  * count, sum)` kept current by applying only the batch's CHANGED rows
  * as signed deltas. Counts and integral sums are self-maintainable
  * aggregates (+1/-1 per inserted/deleted row; an update is a delete
  * plus an insert), so maintenance cost is O(|Δ| + |groups|),
  * independent of the fact table's size.
  *
  * All sums are over an integral (cents-style) value column — exact
  * under any partitioning and any add/retract order, the same contract
  * as [[Rank.globalPrefixSum]]. Doubles would drift under retraction
  * (a-b+b ≠ a in IEEE once magnitudes differ), which is why streaming
  * engines keep retractable sums in longs/decimals too.
  */
object Materialize {

  /** Signed row-level delta between two keyed snapshots: `+1` rows
    * that exist only in `b` (inserts, and the new version of updates),
    * `-1` rows that exist only in `a` (deletes, and the old version of
    * updates). Unchanged rows produce NOTHING — the output is O(|Δ|),
    * which is the whole point. One co-partitioned full-outer join on
    * the key (both sides shuffle-hash on `keyCol`); attr comparison is
    * a null-safe struct equality, so NULL attr values compare stable.
    *
    * In production the delta usually ARRIVES as a CDC feed; this
    * derivation is the snapshot-diff fallback (and the test fixture).
    *
    * @return `keyCol, attrCols…, __sign` — one row per delta version
    */
  def signedDelta(a: DataFrame, b: DataFrame, keyCol: String,
                  attrCols: Seq[String]): DataFrame = {
    val attrs = attrCols.map(col)
    val aa = a.select(col(keyCol).as("__k"), struct(attrs: _*).as("__a"))
    val bb = b.select(col(keyCol).as("__k"), struct(attrs: _*).as("__b"))
    val ins = struct(lit(1).as("sign"), col("__b").as("r"))
    val del = struct(lit(-1).as("sign"), col("__a").as("r"))
    // slice(…, 1, 0) is the typed empty array (explode then emits no
    // row for the unchanged case — they never leave the join stage)
    val contrib = when(col("__a").isNull, array(ins))
      .when(col("__b").isNull, array(del))
      .when(col("__a") <=> col("__b"), slice(array(ins), 1, 0))
      .otherwise(array(del, ins))
    aa.join(bb, Seq("__k"), "full_outer")
      .select(col("__k").as(keyCol), explode(contrib).as("__e"))
      .select(col(keyCol) +: col("__e.sign").as("__sign") +:
        attrCols.map(c => col(s"__e.r.$c").as(c)): _*)
  }

  /** The grouped MV itself: `(group, n, s)` with an exact integral
    * sum. One shuffle on the group key, map-side partial aggregation —
    * the plan a 100 TB bootstrap build wants. */
  def groupedMv(snap: DataFrame, groupCol: String, valueCol: Column): DataFrame =
    snap.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(valueCol.cast("long")).as("s"))

  /** Maintain a key-projected JOIN view V = A ⋈ dim under a FACT-side
    * signed delta: retract every view row whose key has any delta
    * version (the old rows of updates, and deletes), then append the
    * +1 delta rows re-joined to the dimension. Join views are
    * self-maintainable under single-side deltas — ΔV = (Δ⁺A ⋈ dim)
    * minus the touched keys' old rows — so maintenance costs
    * O(|Δ| ⋈ dim) plus one anti-join against the stored view, never a
    * rescan of A. (Dimension-side changes need the symmetric
    * A ⋈ ΔB leg; pair with [[signedDelta]] on whichever side drifts.)
    * Result columns follow `view`'s schema; the delta must carry the
    * fact attributes the view projects. */
  def maintainJoinView(view: DataFrame, delta: DataFrame, keyCol: String,
                       dim: DataFrame, joinCol: String): DataFrame = {
    val touched = delta.select(col(keyCol)).distinct()
    val adds = delta.where(col("__sign") === 1).drop("__sign")
      .join(dim, joinCol)
    view.join(touched, Seq(keyCol), "left_anti")
      .unionByName(adds.select(view.columns.map(col): _*))
  }

  /** Apply a signed delta (from [[signedDelta]] or a CDC feed with a
    * `__sign` column) to a grouped MV. The delta first collapses to
    * one row per touched group (tiny — bounded by |Δ|), then a
    * full-outer join against the MV patches counts and sums; groups
    * whose count reaches zero are dropped (they no longer exist in the
    * base table). The MV side shuffles on the group key only if it
    * isn't already laid out that way — store the MV bucketed by group
    * and maintenance touches |touched groups| rows. */
  def maintain(mv: DataFrame, delta: DataFrame, groupCol: String,
               valueCol: Column): DataFrame = {
    val d = delta.groupBy(col(groupCol)).agg(
      sum(col("__sign").cast("long")).as("__dn"),
      sum(col("__sign").cast("long") * valueCol.cast("long")).as("__ds"))
    mv.join(d, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        (coalesce(col("n"), lit(0L)) + coalesce(col("__dn"), lit(0L))).as("n"),
        (coalesce(col("s"), lit(0L)) + coalesce(col("__ds"), lit(0L))).as("s"))
      .where(col("n") > 0)
  }
}
