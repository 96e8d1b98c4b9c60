package graft.ql

/** AST for the reference's query dialect
  * (`zikeiretsu/src/tsdb/query/query.pest:149-155`):
  * `WITH? SELECT FROM WHERE? ;?` — a deliberately narrow surface: single
  * table, one timestamp predicate, positional projection, with-clause
  * settings. Parsed representation mirrors
  * `query/parser/mod.rs:97-102` + the clause structs under
  * `query/parser/clause/`.
  */
object Ast {

  sealed trait OutputFormat
  object OutputFormat {
    case object Table         extends OutputFormat
    case object Json          extends OutputFormat
    case object Parquet       extends OutputFormat
    case object ParquetSnappy extends OutputFormat
  }

  /** `with` clause settings (`parser/clause/with_clause.rs`). */
  final case class WithClause(
      cols: Option[Seq[String]] = None,
      database: Option[String] = None,
      tz: Option[String] = None,
      format: Option[OutputFormat] = None,
      outputFile: Option[String] = None,
      outputToMemory: Boolean = false,
      useCache: Boolean = true,
      forceSyncCloud: Boolean = false,
      formatDatetime: Option[Boolean] = None
  )

  /** A datetime delta: `+ 2 hours` (duration, µs-resolved) or `+9:00`
    * (clock offset) — `parser/parts/duration_parser.rs`,
    * `parser/parts/clock_parser.rs`. The reference collapses every delta to
    * micros (`DatetimeDelta::as_micro_second`), so we carry micros directly.
    */
  final case class Delta(micros: Long)

  sealed trait DatetimeValue { def delta: Option[Delta] }
  object DatetimeValue {
    /** Naive literal, interpreted in the query timezone at fold time. */
    final case class Str(naive: java.time.LocalDateTime, delta: Option[Delta])
        extends DatetimeValue
    sealed trait Fn extends DatetimeValue
    final case class Today(delta: Option[Delta])     extends Fn
    final case class Yesterday(delta: Option[Delta]) extends Fn
    final case class Tomorrow(delta: Option[Delta])  extends Fn

    def withDelta(v: DatetimeValue, d: Delta): DatetimeValue = v match {
      case Str(n, old)    => Str(n, Some(compose(old, d)))
      case Today(old)     => Today(Some(compose(old, d)))
      case Yesterday(old) => Yesterday(Some(compose(old, d)))
      case Tomorrow(old)  => Tomorrow(Some(compose(old, d)))
    }
    private def compose(old: Option[Delta], d: Delta): Delta =
      old.fold(d)(o => Delta(o.micros + d.micros))
  }

  /** Timestamp predicate (`parser/parts/datetime_filter_parser.rs:9-17`).
    * Grouped limits (`>=|n` …) ride on the comparison ops. */
  sealed trait DatetimeFilter
  object DatetimeFilter {
    final case class In(from: DatetimeValue, to: DatetimeValue) extends DatetimeFilter
    final case class Gte(v: DatetimeValue, limit: Option[Int])  extends DatetimeFilter
    final case class Gt(v: DatetimeValue, limit: Option[Int])   extends DatetimeFilter
    final case class Lte(v: DatetimeValue, limit: Option[Int])  extends DatetimeFilter
    final case class Lt(v: DatetimeValue, limit: Option[Int])   extends DatetimeFilter
    final case class Equal(v: DatetimeValue)                    extends DatetimeFilter
  }

  final case class WhereClause(
      datetimeFilter: Option[DatetimeFilter],
      metricsFilter: Option[String]
  )

  final case class ParsedQuery(
      withClause: Option[WithClause],
      selectAll: Boolean,
      selectCols: Seq[String],
      from: String,
      where: Option[WhereClause]
  )

  final case class ParseException(msg: String, pos: Int)
      extends RuntimeException(s"parse error at $pos: $msg")
}
