package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable operator: a Spark implementation and (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle computing the same
  * result over the same parquet tables. Column names must match exactly —
  * the driver sorts columns by name before hashing values. */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle.stripMargin.trim))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
