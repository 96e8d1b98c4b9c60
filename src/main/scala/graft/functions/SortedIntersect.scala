package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `sorted_intersect_count(a, b)` — |a ∩ b| of two ASCENDING-sorted
  * duplicate-free long arrays as a native Catalyst expression: one
  * zero-allocation merge walk over `ArrayData.getLong`.
  *
  * Exists for the triangle-count hot loop
  * ([[graft.operators.GraphOps.triangles]]): the built-in
  * `size(array_intersect(...))` allocates an OpenHashSet AND a result
  * array PER EDGE ROW, and with O(√m)-sized adjacency arrays those are
  * exactly the humongous-region churn behind the graph_triangles GC
  * excursions BASELINE.md's round-10 paragraph documents (±2s on a ~4s
  * query with byte-identical code). The merge walk needs the count only
  * — no set, no result array, nothing allocated per row — and stays
  * inside whole-stage codegen. Callers own the precondition (sort at
  * adjacency build, duplicate-free by `distinct()`); unsorted input
  * would undercount, exactly like feeding an unsorted array to a binary
  * search.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count needs two array<bigint> columns, got " +
        s"${left.dataType} and ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.countCommon(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} =
        graft.functions.SortedIntersectCount.countCommon($a, $b);""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect_count"
}

object SortedIntersectCount {

  /** Static merge walk shared by interpreted eval and generated code. */
  def countCommon(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** Column-level API. */
  def sorted_intersect_count(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      SortedIntersectCount(
        org.apache.spark.sql.GraftSqlBridge.expression(a),
        org.apache.spark.sql.GraftSqlBridge.expression(b)))
}
