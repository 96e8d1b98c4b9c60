package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.model.TimeNano

/** `format_ns(ts)` — render an epoch-nano long as RFC3339 with full
  * nanosecond digits in a fixed zone (the reference's timestamp rendering,
  * `timestamp_nano.rs:58-71` / `dataseries_ref.rs:70-148`).
  *
  * A native Catalyst expression rather than a UDF so distributed outputs
  * (e.g. `format = parquet` with `format_datetime = true`, or downstream
  * SQL) keep whole-stage codegen: `doGenCode` emits a direct static call —
  * no row-level closure dispatch, no boxing of the input long.
  *
  * The zone is bound at plan time (query `tz =` setting), mirroring the
  * reference's interpret-time timezone resolution.
  */
case class FormatNanos(child: Expression, zoneIdString: String)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"format_ns needs a LongType nanos column, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    FormatNanos.format(input.asInstanceOf[Long], zoneIdString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val zoneRef = ctx.addReferenceObj("zoneIdStr", zoneIdString, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.FormatNanos.format($c, $zoneRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): FormatNanos =
    copy(child = newChild)

  override def prettyName: String = "format_ns"
}

object FormatNanos {
  // ZoneId lookup cached per executor; zones are a handful per job
  private val zones =
    new java.util.concurrent.ConcurrentHashMap[String, java.time.ZoneId]()

  /** Static entry point shared by interpreted eval and generated code. */
  def format(nanos: Long, zoneIdStr: String): UTF8String = {
    val zone = zones.computeIfAbsent(zoneIdStr,
      (s: String) => TimeNano.resolveZone(s))
    UTF8String.fromString(TimeNano.formatNanos(nanos, zone))
  }

  /** Column-level API. */
  def format_ns(c: Column, tz: String = "UTC"): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      FormatNanos(org.apache.spark.sql.GraftSqlBridge.expression(c), tz))
}
