package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Narrow bridge to `private[sql]` Column ⇄ Expression converters (the
  * supported extension-point plumbing lives behind package-private API
  * in Spark 4; a sql-subpackage shim is the standard access pattern for
  * libraries shipping custom Catalyst expressions). */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
