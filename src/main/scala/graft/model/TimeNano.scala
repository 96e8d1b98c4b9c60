package graft.model

import java.time._
import java.time.format.DateTimeFormatterBuilder
import java.time.temporal.ChronoField

/** Nanosecond-precision time model.
  *
  * The reference keeps timestamps as epoch **nanoseconds** end to end
  * (`zikeiretsu/src/tsdb/datetime/timestamp_nano.rs:10-13`). Spark's
  * `TimestampType` is microsecond-precision, so the engine carries `ts` as a
  * `LongType` column of epoch nanos (parquet `timestamp[ns]` columns are read
  * via `spark.sql.legacy.parquet.nanosAsLong=true`; `timestamp[us]` columns
  * normalize through `unix_micros * 1000` in [[graft.storage.Tables]], with
  * [[graft.plans.NanoTsRewrite]] folding literal predicates back onto the
  * native column for scan pruning) and only derives µs timestamps at the
  * edges (display, streaming watermarks).
  */
object TimeNano {
  val NanosPerMicro = 1000L
  val NanosPerMilli = 1000000L
  val NanosPerSec   = 1000000000L
  val NanosPerMin   = 60L * NanosPerSec
  val NanosPerHour  = 3600L * NanosPerSec
  val NanosPerDay   = 86400L * NanosPerSec

  /** Datetime-literal precision, used for equality-filter range expansion
    * (`zikeiretsu/src/tsdb/datetime/util.rs:40-58`). The reference's sub-second
    * branching is reproduced verbatim, quirks included: sub-µs precision maps
    * to MicroSecond, whole-ms to NanoSecond.
    */
  sealed abstract class Accuracy(val expandNanos: Long)
  object Accuracy {
    case object NanoSecond  extends Accuracy(1L)
    case object MicroSecond extends Accuracy(NanosPerMicro)
    case object MilliSecond extends Accuracy(NanosPerMilli)
    case object Second      extends Accuracy(NanosPerSec)
    case object Minute      extends Accuracy(NanosPerMin)
    case object Hour        extends Accuracy(NanosPerHour)
    case object Day         extends Accuracy(NanosPerDay)
  }

  /** Accuracy of an instant as seen in `zone` (reference computes it on the
    * query-timezone-local datetime: `query/lexer/where.rs:57-66`). */
  def accuracyOf(nanos: Long, zone: ZoneId): Accuracy = {
    val zdt     = zonedOf(nanos, zone)
    val nanoSec = zdt.getNano
    if (nanoSec == 0) {
      (zdt.getHour, zdt.getMinute, zdt.getSecond) match {
        case (0, 0, 0) => Accuracy.Day
        case (_, 0, 0) => Accuracy.Hour
        case (_, _, 0) => Accuracy.Minute
        case _         => Accuracy.Second
      }
    } else if (nanoSec % 1000 != 0) Accuracy.MicroSecond
    else if (nanoSec % 1000000 != 0) Accuracy.MilliSecond
    else Accuracy.NanoSecond
  }

  private val literalFormat = new DateTimeFormatterBuilder()
    .appendPattern("yyyy-MM-dd")
    .optionalStart()
    .appendPattern(" HH:mm")
    .optionalStart()
    .appendPattern(":ss")
    .optionalStart()
    .appendFraction(ChronoField.NANO_OF_SECOND, 1, 9, true)
    .optionalEnd()
    .optionalEnd()
    .optionalEnd()
    .toFormatter()

  /** Parse a naive datetime literal (no quotes). Accepted shapes mirror
    * `datetime/util.rs:86-90`: `yyyy-MM-dd[ HH:mm[:ss[.f{1..9}]]]`. */
  def parseNaive(s: String): LocalDateTime = {
    val t = literalFormat.parse(s.trim)
    if (t.isSupported(ChronoField.HOUR_OF_DAY)) LocalDateTime.from(t)
    else LocalDate.from(t).atStartOfDay()
  }

  /** Interpret a naive local datetime in `zone` → epoch nanos (the reference
    * localizes naive literals in the query timezone:
    * `datetime_filter_parser.rs:122-137`). */
  def toNanos(ldt: LocalDateTime, zone: ZoneId): Long = {
    val zdt = ldt.atZone(zone)
    zdt.toEpochSecond * NanosPerSec + zdt.getNano
  }

  def zonedOf(nanos: Long, zone: ZoneId): ZonedDateTime = {
    val secs = Math.floorDiv(nanos, NanosPerSec)
    val sub  = Math.floorMod(nanos, NanosPerSec)
    Instant.ofEpochSecond(secs, sub).atZone(zone)
  }

  /** Midnight of today/±1day in `zone`, as epoch nanos
    * (`datetime/util.rs:18-28`). `now` injectable for deterministic tests. */
  def todayNanos(zone: ZoneId, now: Instant): Long = {
    val d = now.atZone(zone).toLocalDate
    toNanos(d.atStartOfDay(), zone)
  }
  def yesterdayNanos(zone: ZoneId, now: Instant): Long =
    toNanos(now.atZone(zone).toLocalDate.minusDays(1).atStartOfDay(), zone)
  def tomorrowNanos(zone: ZoneId, now: Instant): Long =
    toNanos(now.atZone(zone).toLocalDate.plusDays(1).atStartOfDay(), zone)

  /** RFC3339 with full nanosecond digits in `zone`
    * (`timestamp_nano.rs:58-71` uses `to_rfc3339_opts(Nanos)`). */
  def formatNanos(nanos: Long, zone: ZoneId): String = {
    val zdt = zonedOf(nanos, zone)
    val base = f"${zdt.getYear}%04d-${zdt.getMonthValue}%02d-${zdt.getDayOfMonth}%02d" +
      f"T${zdt.getHour}%02d:${zdt.getMinute}%02d:${zdt.getSecond}%02d.${zdt.getNano}%09d"
    val off = zdt.getOffset.getId match {
      case "Z" => "+00:00"
      case o   => o
    }
    base + off
  }

  /** Resolve a dialect timezone spec: IANA name (`Asia/Tokyo`) or offset
    * (`+9`, `+09:00`, `-3:30`) — `datetime/timezone.rs:4-26`. Default UTC. */
  def resolveZone(tz: String): ZoneId = {
    val s = tz.trim
    if (s.isEmpty) ZoneOffset.UTC
    else if (s.head == '+' || s.head == '-') {
      val sign = if (s.head == '-') -1 else 1
      val body = s.tail
      val parts = body.split(":", -1)
      val h = parts(0).toInt
      val m = if (parts.length > 1 && parts(1).nonEmpty) parts(1).toInt else 0
      ZoneOffset.ofTotalSeconds(sign * (h * 3600 + m * 60))
    } else ZoneId.of(s)
  }
}
