package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All loads are plain parquet scans so Catalyst's column pruning and
  * predicate pushdown reach the file scan. The one exception is `events`,
  * whose parquet carries TIMESTAMP(NANOS) — illegal for Spark's vectorized
  * reader — so it is read with `spark.sql.legacy.parquet.nanosAsLong` and
  * converted to microsecond timestamps with exact integer arithmetic
  * (the generator emits microsecond-precision values, so this is lossless).
  */
object Tables {
  private def p(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = p(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = p(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = p(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = p(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = p(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = p(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = p(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame  = p(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = p(spark, dir, "embeddings")

  /** events with `ts` as TimestampType (µs). Nanos → micros via integer DIV. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    p(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000L")))
  }
}
