package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** `cosine_sim(a, b)` — cosine similarity of two float-array embedding
  * columns as a native Catalyst expression: one sequential pass accumulating
  * dot, |a|², |b|² left-to-right in doubles (bit-identical to the UDF and
  * HOF reference forms, and to DuckDB `list_dot_product` on DOUBLE[]).
  *
  * Native expression rather than a UDF so the similarity hot loops
  * (brute-force verify tier, LSH candidate scoring) stay inside whole-stage
  * codegen: `doGenCode` reads `ArrayData.getFloat` directly — no Seq boxing,
  * no closure dispatch per row.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // NULL can arise from NON-null inputs (length mismatch, zero-norm):
  // without this override, non-nullable children would make nullSafeCodeGen
  // emit an assignment to an undeclared isNull variable (codegen fallback)
  // and let the optimizer fold IsNull(...) to false
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim needs two array<float> columns, got " +
        s"${left.dataType} and ${right.dataType}")
  }

  // mismatched lengths yield NULL, matching the HOF reference form
  // (zip_with pads the shorter side with nulls, poisoning the fold) —
  // a malformed vector must never silently rank by a truncated prefix.
  // A NaN result (zero-norm vector → 0/0, or non-finite input) also yields
  // NULL: Spark orders NaN above every double, so one all-zero embedding
  // would otherwise rank as the top neighbor of every query
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val v = CosineSim.cosine(x, y)
      if (java.lang.Double.isNaN(v)) null else v
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if ($a.numElements() != $b.numElements()) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.CosineSim.cosine($a, $b);
        if (Double.isNaN(${ev.value})) { ${ev.isNull} = true; }
      }""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}

/** `cosine_sim_i8(a, b)` — cosine similarity of two int8-quantized
  * embedding columns (`array<tinyint>`, see
  * [[graft.pipeline.Similarity.quantizeInt8]]) scored WITHOUT
  * dequantizing: per-vector quantization scales cancel out of the cosine,
  * so the whole ranking runs on integer dot products inside whole-stage
  * codegen — the serving fast path over a 4×-smaller stored corpus.
  * Same null contract as [[CosineSim]]: length mismatch or zero-norm →
  * NULL.
  */
case class CosineSimInt8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // NULL from non-null inputs (length mismatch, zero-norm) — see the
  // identical override on [[CosineSim]]
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(org.apache.spark.sql.types.ByteType, _) => true
      case _                                                 => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim_i8 needs two array<tinyint> columns, got " +
        s"${left.dataType} and ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val v = CosineSim.cosineInt8(x, y)
      if (java.lang.Double.isNaN(v)) null else v
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if ($a.numElements() != $b.numElements()) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.CosineSim.cosineInt8($a, $b);
        if (Double.isNaN(${ev.value})) { ${ev.isNull} = true; }
      }""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimInt8 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim_i8"
}

object CosineSim {

  /** Integer-accumulated cosine over int8 arrays (shared by interpreted
    * eval and generated code): dot and norms fit a long far beyond any
    * realistic dims (127² × dims). */
  def cosineInt8(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0L
    var na = 0L
    var nb = 0L
    var i = 0
    while (i < n) {
      val x = a.getByte(i).toLong
      val y = b.getByte(i).toLong
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  /** Column-level API for [[CosineSimInt8]]. */
  def cosine_sim_i8(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      CosineSimInt8(org.apache.spark.sql.GraftSqlBridge.expression(a),
        org.apache.spark.sql.GraftSqlBridge.expression(b)))

  /** Plain-array twin of [[cosine]] for driver/UDF-side use: identical
    * accumulation order and zero-norm behavior, so values are bit-equal
    * to the codegen expression (length mismatch → NaN, mirroring the
    * expression's null). */
  def cosineArrays(a: Array[Float], b: Array[Float]): Double = {
    if (a == null || b == null || a.length != b.length) return Double.NaN
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble
      val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Static entry point shared by interpreted eval and generated code.
    * Accumulation order matches the HOF fold and DuckDB exactly. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Column-level API. */
  def cosine_sim(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      CosineSim(org.apache.spark.sql.GraftSqlBridge.expression(a),
        org.apache.spark.sql.GraftSqlBridge.expression(b)))
}
