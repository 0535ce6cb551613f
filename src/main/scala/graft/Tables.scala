package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All loads are plain parquet scans so Catalyst's column pruning and
  * predicate pushdown reach the file scan. The one exception is `events`,
  * whose `ts` physical type has drifted across testdata drops — see
  * [[events]] for the normalization contract (always TimestampType µs).
  */
object Tables {
  private def p(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Insurance against the generator re-emitting TIMESTAMP(NANOS) (it
    * did for events in rounds ≤6): with `nanosAsLong` set by [[events]],
    * a NANOS column loads as LongType — convert it back to a timestamp
    * (exact: generator values are µs-precision) instead of letting
    * every downstream date expression fail analysis. A no-op for the
    * current MICROS drops (column loads as a timestamp type already). */
  private def deNanos(df: DataFrame, tsCols: String*): DataFrame =
    tsCols.foldLeft(df) { (d, c) =>
      d.schema(c).dataType match {
        case org.apache.spark.sql.types.LongType =>
          d.withColumn(c, timestamp_micros(expr(s"$c DIV 1000L")))
        case _ => d
      }
    }

  def region(spark: SparkSession, dir: String): DataFrame   = p(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = p(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = p(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = p(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = p(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   =
    deNanos(p(spark, dir, "orders"), "o_orderdate")
  def lineitem(spark: SparkSession, dir: String): DataFrame =
    deNanos(p(spark, dir, "lineitem"), "l_shipdate")
  def documents(spark: SparkSession, dir: String): DataFrame  = p(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = p(spark, dir, "embeddings")

  /** events with `ts` as TimestampType (µs).
    *
    * The generator has emitted `ts` as TIMESTAMP(NANOS) in some testdata
    * drops and TIMESTAMP(MICROS) in others. NANOS is illegal for Spark's
    * vectorized reader, so we read with `nanosAsLong` (a no-op for MICROS
    * files) and then branch on the type actually loaded: LongType means the
    * file was NANOS and we convert with exact integer arithmetic (the
    * generator's values are µs-precision, so DIV 1000 is lossless);
    * TIMESTAMP_NTZ (plain `timestamp[us]` parquet) is RE-READ with an
    * explicit schema requesting TimestampType — value-preserving because
    * every entrypoint pins `spark.sql.session.timeZone=UTC`, and required
    * because the query catalog uses `unix_micros`/window functions that
    * take TIMESTAMP. An explicit-schema read (not a `.cast`) so that `ts`
    * predicates still PUSH DOWN to the parquet scan — a cast wrapper
    * would strand every time filter above the scan, which at 100 TB is
    * the difference between pruning row groups and reading them all.
    * The schema is the file's own inferred one with only `ts` overridden,
    * so unrelated generator drift (new/renamed columns) passes through.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = p(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000L")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        val sch = org.apache.spark.sql.types.StructType(raw.schema.fields.map {
          f =>
            if (f.name == "ts") f.copy(dataType = org.apache.spark.sql.types.TimestampType)
            else f
        })
        spark.read.schema(sch).parquet(s"$dir/events.parquet")
      case _ => raw
    }
  }
}
