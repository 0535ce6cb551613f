package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{aggregate, BloomFilterMightContain, Expression, Literal, XxHash64}
import org.apache.spark.sql.classic.ExpressionUtils

/** Narrow bridge to `private[sql]` Column ⇄ Expression converters (the
  * supported extension-point plumbing lives behind package-private API
  * in Spark 4; a sql-subpackage shim is the standard access pattern for
  * libraries shipping custom Catalyst expressions). */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Distributed Bloom-filter build: Spark's own `BloomFilterAggregate`
    * (the engine's runtime-join-filter sketch — partial aggregation per
    * partition, OR-merge of bit arrays) over `xxhash64(value)`. Returns
    * a binary column holding the serialized filter. */
  def bloomAgg(value: Column, estimatedItems: Long, numBits: Long): Column =
    column(new aggregate.BloomFilterAggregate(
      new XxHash64(Seq(expression(value))),
      Literal(estimatedItems), Literal(numBits)).toAggregateExpression())

  /** Codegen'd membership probe against a serialized Bloom filter
    * (`BloomFilterMightContain` — no UDF, stays inside whole-stage
    * codegen; the filter bytes ride the plan as one literal and are
    * deserialized once per task). */
  def bloomMightContain(bloomBytes: Array[Byte], value: Column): Column =
    column(BloomFilterMightContain(
      Literal(bloomBytes, org.apache.spark.sql.types.BinaryType),
      new XxHash64(Seq(expression(value)))))
}
