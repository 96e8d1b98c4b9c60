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
}
