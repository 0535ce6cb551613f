package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series repair primitives: regularize an event stream onto a
  * per-key daily grid. The reference pipeline's batch ingest implicitly
  * assumes one file per day; real feeds skip days, and every
  * daily-state consumer downstream (SCD2 effective-dating, retention
  * cohorts, balance snapshots) needs the grid made explicit. */
object TimeSeries {

  /** Per-key daily grid from the key's first to last active day, with
    * each day carrying the CLOSING value (last event of the day by
    * (tsCol, idCol) — idCol makes the pick deterministic under equal
    * timestamps) and silent days forward-filled from the most recent
    * active day.
    *
    * Scale shape: the spine is `sequence(first_day, last_day)` exploded
    * PER KEY — Σ active spans, not |keys| × |calendar|, and no global
    * calendar cross-join. The forward fill is the gaps-and-islands
    * count-partition trick (`count(v) OVER (ORDER BY day)` then the
    * one non-null value per partition) — two narrow per-key windows,
    * both planned as a single sort within the key's partition; no
    * IGNORE NULLS syntax so the same plan replays as ANSI SQL on any
    * engine (q116's oracle). Leading days are never null: the spine
    * starts at the key's first ACTIVE day.
    *
    * Output: (keyCol, day, value_filled). */
  def gapFillForwardFill(events: DataFrame, keyCol: String, tsCol: String,
                         idCol: String, valueCol: String): DataFrame = {
    val ev = events.select(col(keyCol), to_date(col(tsCol)).as("day"),
      col(tsCol).as("ts"), col(idCol).as("tie"), col(valueCol).as("value"))
    val daily = ev
      .withColumn("rn", row_number().over(
        Window.partitionBy(keyCol, "day")
          .orderBy(col("ts").desc, col("tie").desc)))
      .where(col("rn") === 1)
      .select(col(keyCol), col("day"), col("value").as("v"))
    val spine = daily.groupBy(keyCol)
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col(keyCol), explode(sequence(col("d0"), col("d1"))).as("day"))
    spine.join(daily, Seq(keyCol, "day"), "left")
      .withColumn("c", count(col("v")).over(
        Window.partitionBy(keyCol).orderBy("day")))
      .select(col(keyCol), col("day"),
        max(col("v")).over(Window.partitionBy(col(keyCol), col("c")))
          .as("value_filled"))
  }
}
