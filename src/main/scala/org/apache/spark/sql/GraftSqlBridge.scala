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

  /** Register a table-valued function on an ALREADY-BUILT session's
    * registry (private[sql]) — the post-hoc analog of
    * `SparkSessionExtensions.injectTableFunction`, which only applies to
    * SessionStates built after injection. Idempotent: the registry
    * upserts by name. */
  def registerTableFunction(s: SparkSession, name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] =>
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit =
    s.asInstanceOf[classic.SparkSession].sessionState.tableFunctionRegistry
      .registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name), info,
        builder)

  /** The session's `SparkSessionExtensions` instance (private[sql]).
    * Sessions derived via `newSession()` — e.g. Spark Connect's isolated
    * per-client sessions — build their SessionState from this same object,
    * so injections made here apply to every later-derived session even
    * when the host session was built without `spark.sql.extensions`. */
  def sessionExtensions(s: SparkSession): SparkSessionExtensions =
    s.asInstanceOf[classic.SparkSession].extensions
}
