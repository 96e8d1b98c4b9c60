package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ catalyst Expression bridge. Spark 4 backs `Column` with
  * ColumnNode and gates the converters behind `private[sql]`
  * (`classic.ExpressionUtils`); custom native expressions need this one
  * in-package hop to surface as user-facing Columns.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** The session's `SparkSessionExtensions` instance (private[sql]).
    * Sessions derived via `newSession()` — e.g. Spark Connect's isolated
    * per-client sessions — build their SessionState from this same object,
    * so injections made here apply to every later-derived session even
    * when the host session was built without `spark.sql.extensions`. */
  def sessionExtensions(s: SparkSession): SparkSessionExtensions =
    s.asInstanceOf[classic.SparkSession].extensions
}
