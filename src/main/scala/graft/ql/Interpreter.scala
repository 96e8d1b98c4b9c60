package graft.ql

import java.time.{Instant, ZoneId, ZoneOffset}
import graft.model.TimeNano
import Ast._

/** Analyzer/planner front half ("lexer" in the reference,
  * `zikeiretsu/src/tsdb/query/lexer/mod.rs:198-263`): resolves meta-tables vs
  * real metrics, with-clause settings, column aliases, and folds every
  * datetime expression to concrete epoch-nano bounds at interpret time (the
  * reference evaluates all datetime arithmetic before execution —
  * `lexer/where.rs:9-77`).
  */
object Interpreter {

  final case class QueryException(kind: String, msg: String)
      extends RuntimeException(s"$kind: $msg")

  final case class OutputCondition(
      format: OutputFormat,
      toMemory: Boolean,
      filePath: Option[String]
  )

  sealed trait Limit
  object Limit {
    final case class Head(n: Int) extends Limit
    final case class Tail(n: Int) extends Limit
  }

  /** `[sinceInclusive, untilExclusive)` in epoch nanos; None = unbounded. */
  final case class NanoRange(since: Option[Long], until: Option[Long])

  sealed trait Interpreted {
    def output: OutputCondition
  }
  final case class ListMetrics(db: Option[String], output: OutputCondition)
      extends Interpreted
  final case class DescribeMetrics(
      db: Option[String],
      metricsFilter: Option[String],
      blockList: Boolean,
      output: OutputCondition
  ) extends Interpreted
  final case class SearchMetrics(
      db: Option[String],
      metrics: String,
      /** Output field names in select order; None = all fields. */
      fieldSelectors: Option[Seq[String]],
      /** Positional aliases for the metrics' value fields (with cols=[...]). */
      colAliases: Option[Seq[String]],
      range: NanoRange,
      limit: Option[Limit],
      tz: ZoneId,
      formatDatetime: Boolean,
      useCache: Boolean,
      forceSync: Boolean,
      output: OutputCondition
  ) extends Interpreted

  def interpret(q: ParsedQuery, now: Instant = Instant.now()): Interpreted = {
    val w    = q.withClause.getOrElse(WithClause())
    val zone = w.tz.map(TimeNano.resolveZone).getOrElse(ZoneOffset.UTC)
    val out  = OutputCondition(
      w.format.getOrElse(OutputFormat.Table), w.outputToMemory, w.outputFile)
    if (out.filePath.isEmpty && !out.toMemory &&
        (out.format == OutputFormat.Parquet || out.format == OutputFormat.ParquetSnappy))
      throw QueryException("InvalidOutputDestination",
        "parquet output requires output_file or output_to_memory")

    val metricsFilter = q.where.flatMap(_.metricsFilter)

    q.from match {
      case ".metrics" =>
        if (metricsFilter.isDefined)
          throw QueryException("MetricsFilterIsNotSupported", ".metrics")
        ListMetrics(w.database, out)
      case ".describe" =>
        DescribeMetrics(w.database, metricsFilter, blockList = false, out)
      case ".block_list" =>
        DescribeMetrics(w.database, metricsFilter, blockList = true, out)
      case m if m.startsWith(".") =>
        throw QueryException("InvalidMetrics", m)
      case metrics =>
        if (metricsFilter.isDefined)
          throw QueryException("MetricsFilterIsNotSupported",
            "metrics filter only valid on meta tables")
        // missing WHERE on a real metrics is an error
        // (`lexer/mod.rs:230-232` → EmptyFilterCondition)
        val dtFilter = q.where.flatMap(_.datetimeFilter).getOrElse(
          throw QueryException("EmptyFilterCondition",
            "you need at least one where condition"))
        val (range, limit) = foldFilter(dtFilter, zone, now)
        val selectors =
          if (q.selectAll) None
          else {
            val aliases = w.cols.getOrElse(
              throw QueryException("NoColumnDef",
                s"columns: ${q.selectCols.mkString(",")}"))
            val aliasSet = aliases.toSet
            q.selectCols.foreach { c =>
              if (!aliasSet.contains(c))
                throw QueryException("NoColumnDef", c)
            }
            Some(q.selectCols)
          }
        SearchMetrics(w.database, metrics, selectors, w.cols, range, limit,
          zone, w.formatDatetime.getOrElse(true), w.useCache,
          w.forceSyncCloud, out)
    }
  }

  /** Fold a datetime filter to `[since, until)` nanos + optional grouped
    * limit — exact reproduction of `lexer/where.rs:19-77`:
    * Gt → since+1ns, Lte → until = v+1ns, Equal → accuracy expansion.
    */
  def foldFilter(f: DatetimeFilter, zone: ZoneId, now: Instant)
      : (NanoRange, Option[Limit]) = f match {
    case DatetimeFilter.In(from, to) =>
      (NanoRange(Some(eval(from, zone, now)), Some(eval(to, zone, now))), None)
    case DatetimeFilter.Gte(v, lim) =>
      (NanoRange(Some(eval(v, zone, now)), None), lim.map(Limit.Head))
    case DatetimeFilter.Gt(v, lim) =>
      (NanoRange(Some(eval(v, zone, now) + 1), None), lim.map(Limit.Head))
    case DatetimeFilter.Lte(v, lim) =>
      (NanoRange(None, Some(eval(v, zone, now) + 1)), lim.map(Limit.Tail))
    case DatetimeFilter.Lt(v, lim) =>
      (NanoRange(None, Some(eval(v, zone, now))), lim.map(Limit.Tail))
    case DatetimeFilter.Equal(v) =>
      val since = eval(v, zone, now)
      val acc   = TimeNano.accuracyOf(since, zone)
      // day/hour/… expansion adds the unit on the zone-local datetime
      // (fixed-length units; chrono Duration::days == 24h)
      (NanoRange(Some(since), Some(since + acc.expandNanos)), None)
  }

  /** Evaluate a datetime value to epoch nanos. Literals are naive and get
    * localized in the query zone after applying the delta
    * (`datetime_filter_parser.rs:122-137`); function values are instants and
    * get the delta added after (`:139-158`).
    */
  def eval(v: DatetimeValue, zone: ZoneId, now: Instant): Long = v match {
    case DatetimeValue.Str(naive, delta) =>
      val shifted = naive.plusNanos(delta.fold(0L)(_.micros) * 1000L)
      TimeNano.toNanos(shifted, zone)
    case fn: DatetimeValue.Fn =>
      val base = fn match {
        case DatetimeValue.Today(_)     => TimeNano.todayNanos(zone, now)
        case DatetimeValue.Yesterday(_) => TimeNano.yesterdayNanos(zone, now)
        case DatetimeValue.Tomorrow(_)  => TimeNano.tomorrowNanos(zone, now)
      }
      base + fn.delta.fold(0L)(_.micros) * 1000L
  }
}
