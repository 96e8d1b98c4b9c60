package graft

import java.time.{Instant, ZoneOffset}
import org.scalatest.funsuite.AnyFunSuite
import graft.model.TimeNano
import graft.ql.{Interpreter, QueryParser}
import graft.ql.Interpreter._

/** Datetime-folding semantics — the spec is `query/lexer/where.rs` and its
  * tests (`:79-202`): Gt=+1ns, Lte=+1ns on until, equality accuracy
  * expansion, naive literals localized in the query tz.
  */
class InterpreterSpec extends AnyFunSuite {

  private val now = Instant.parse("2024-06-15T10:30:00Z")
  private val jst = TimeNano.resolveZone("+9")

  private def searchOf(q: String): SearchMetrics =
    Interpreter.interpret(QueryParser.parse(q), now).asInstanceOf[SearchMetrics]

  private def nsUtc(s: String): Long =
    TimeNano.toNanos(TimeNano.parseNaive(s), ZoneOffset.UTC)
  private def nsJst(s: String): Long =
    TimeNano.toNanos(TimeNano.parseNaive(s), jst)

  test("equality day accuracy expands +1 day in query tz (lexer_datetime_eq_1)") {
    val s = searchOf("with tz = +9 select * from m where ts = '2021-09-27'")
    assert(s.range.since.contains(nsJst("2021-09-27")))
    assert(s.range.until.contains(nsJst("2021-09-27") + TimeNano.NanosPerDay))
  }

  test("equality hour accuracy expands +1 hour (lexer_datetime_eq_2)") {
    val s = searchOf("with tz = +9 select * from m where ts = '2021-09-27 23:00'")
    assert(s.range.since.contains(nsJst("2021-09-27 23:00")))
    assert(s.range.until.contains(nsJst("2021-09-27 23:00") + TimeNano.NanosPerHour))
  }

  test("equality minute accuracy expands +1 minute (lexer_datetime_eq_3)") {
    val s = searchOf("with tz = +9 select * from m where ts = '2021-09-27 23:10'")
    assert(s.range.until.contains(nsJst("2021-09-27 23:10") + TimeNano.NanosPerMin))
  }

  test("equality second accuracy expands +1 second (lexer_datetime_eq_4)") {
    val s = searchOf("with tz = +9 select * from m where ts = '2021-09-27 23:00:01'")
    assert(s.range.until.contains(nsJst("2021-09-27 23:00:01") + TimeNano.NanosPerSec))
  }

  test("gt adds one nano (lexer/where.rs Gt arm)") {
    val s = searchOf("select * from m where ts > '2021-09-27'")
    assert(s.range.since.contains(nsUtc("2021-09-27") + 1))
    assert(s.range.until.isEmpty)
  }

  test("lte adds one nano to until") {
    val s = searchOf("select * from m where ts <= '2021-09-27'")
    assert(s.range.until.contains(nsUtc("2021-09-27") + 1))
  }

  test("lt is exclusive") {
    val s = searchOf("select * from m where ts < '2021-09-27'")
    assert(s.range.until.contains(nsUtc("2021-09-27")))
  }

  test("grouped limits carried") {
    assert(searchOf("select * from m where ts >=|2 '2021-09-27'").limit
      .contains(Limit.Head(2)))
    assert(searchOf("select * from m where ts <=|10 '2021-09-27'").limit
      .contains(Limit.Tail(10)))
  }

  test("in range folds both bounds; delta close = start + delta") {
    val s = searchOf("select * from m where ts in ('2022-04-26', +2 minutes)")
    assert(s.range.since.contains(nsUtc("2022-04-26")))
    assert(s.range.until.contains(nsUtc("2022-04-26") + 2 * TimeNano.NanosPerMin))
  }

  test("today()/yesterday()/tomorrow() resolve to tz-midnight") {
    val s = searchOf("with tz = +9 select * from m where ts in (yesterday(), tomorrow())")
    // now=2024-06-15T10:30Z → in +9 it is 2024-06-15T19:30 → today=06-15
    assert(s.range.since.contains(nsJst("2024-06-14")))
    assert(s.range.until.contains(nsJst("2024-06-16")))
  }

  test("ts in today() = equality with day expansion") {
    val s = searchOf("with tz = +9 select * from m where ts in today()")
    assert(s.range.since.contains(nsJst("2024-06-15")))
    assert(s.range.until.contains(nsJst("2024-06-15") + TimeNano.NanosPerDay))
  }

  test("clock delta on function shifts the instant") {
    val s = searchOf("select * from m where ts >= yesterday() -9:00")
    assert(s.range.since.contains(nsUtc("2024-06-14") - 9 * TimeNano.NanosPerHour))
  }

  test("naive literal localized in query tz") {
    val sUtc = searchOf("select * from m where ts >= '2024-01-10'")
    val sJst = searchOf("with tz = +9 select * from m where ts >= '2024-01-10'")
    assert(sUtc.range.since.get - sJst.range.since.get == 9 * TimeNano.NanosPerHour)
  }

  test("missing where on real metrics errors (EmptyFilterCondition)") {
    val ex = intercept[QueryException](searchOf("select * from m"))
    assert(ex.kind == "EmptyFilterCondition")
  }

  test("metrics filter rejected outside meta tables") {
    val ex = intercept[QueryException](
      Interpreter.interpret(QueryParser.parse(
        "select * from m where metrics = x"), now))
    assert(ex.kind == "MetricsFilterIsNotSupported")
  }

  test("select names require cols aliases (NoColumnDef)") {
    val ex = intercept[QueryException](
      searchOf("select a, b from m where ts in today()"))
    assert(ex.kind == "NoColumnDef")
    val ex2 = intercept[QueryException](
      Interpreter.interpret(QueryParser.parse(
        "with cols = [a] select b from m where ts in today()"), now))
    assert(ex2.kind == "NoColumnDef")
  }

  test("parquet format to stdout rejected") {
    val ex = intercept[QueryException](
      searchOf("with format = parquet select * from m where ts in today()"))
    assert(ex.kind == "InvalidOutputDestination")
  }

  test("unknown dot-table rejected") {
    val ex = intercept[QueryException](
      Interpreter.interpret(QueryParser.parse("select * from .bogus"), now))
    assert(ex.kind == "InvalidMetrics")
  }

  test("accuracy quirk reproduction: sub-µs → µs, whole-ms → ns") {
    // reference util.rs:40-58 branches on nanos%1000 and %1_000_000
    import TimeNano._
    val z = ZoneOffset.UTC
    assert(accuracyOf(toNanos(parseNaive("2021-09-27 09:42:40.741778001"), z), z)
      == Accuracy.MicroSecond)
    assert(accuracyOf(toNanos(parseNaive("2021-09-27 09:42:40.7417"), z), z)
      == Accuracy.MilliSecond)
    assert(accuracyOf(toNanos(parseNaive("2021-09-27 09:42:40.741"), z), z)
      == Accuracy.NanoSecond)
  }
}
