package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ql.{Ast, QueryParser}
import Ast._

/** Parser acceptance suite — ported from the reference's parser tests
  * (`zikeiretsu/src/tsdb/query/parser/mod.rs:174-482`,
  * `parser/parts/datetime_filter_parser.rs` tests, `where_clause.rs:71-357`).
  */
class ParserSpec extends AnyFunSuite {

  test("select star from metrics") {
    val q = QueryParser.parse("select * from trades")
    assert(q.selectAll)
    assert(q.from == "trades")
    assert(q.where.isEmpty)
  }

  test("with cols, tz name, select columns") {
    val q = QueryParser.parse(
      "with cols = [is_buy, volume, price], tz = Asia/Tokyo " +
        "select is_buy, price from trades where ts in today()")
    val w = q.withClause.get
    assert(w.cols.contains(Seq("is_buy", "volume", "price")))
    assert(w.tz.contains("Asia/Tokyo"))
    assert(q.selectCols == Seq("is_buy", "price"))
    // `in <fn>` lowers to Equal (datetime_filter_parser.rs:27-40)
    assert(q.where.get.datetimeFilter.get.isInstanceOf[DatetimeFilter.Equal])
  }

  test("tz offset form") {
    val q = QueryParser.parse("with tz = +9 select * from t where ts in today()")
    assert(q.withClause.get.tz.contains("+9"))
  }

  test("in range with two datetimes") {
    val q = QueryParser.parse(
      "select * from m where ts in ('2012-12-30', '2013-01-02')")
    q.where.get.datetimeFilter.get match {
      case DatetimeFilter.In(DatetimeValue.Str(f, None), DatetimeValue.Str(t, None)) =>
        assert(f.toLocalDate.toString == "2012-12-30")
        assert(t.toLocalDate.toString == "2013-01-02")
      case other => fail(s"unexpected: $other")
    }
  }

  test("in range with delta close applies delta to start") {
    val q = QueryParser.parse(
      "select * from m where ts in ('2012-12-30', +2 hours)")
    q.where.get.datetimeFilter.get match {
      case DatetimeFilter.In(DatetimeValue.Str(f, None), DatetimeValue.Str(t, Some(d))) =>
        assert(f == t)
        assert(d.micros == 2L * 3600 * 1000000)
      case other => fail(s"unexpected: $other")
    }
  }

  test("in range close with clock delta") {
    val q = QueryParser.parse(
      "select * from m where ts in (yesterday(), +9:00)")
    q.where.get.datetimeFilter.get match {
      case DatetimeFilter.In(DatetimeValue.Yesterday(None),
          DatetimeValue.Yesterday(Some(d))) =>
        assert(d.micros == 9L * 3600 * 1000000)
      case other => fail(s"unexpected: $other")
    }
  }

  test("gte filter") {
    val q = QueryParser.parse("select * from m where ts >= '2012-12-30'")
    assert(q.where.get.datetimeFilter.get ==
      DatetimeFilter.Gte(DatetimeValue.Str(
        java.time.LocalDate.parse("2012-12-30").atStartOfDay(), None), None))
  }

  test("alternative operator spellings => and =<") {
    val q1 = QueryParser.parse("select * from m where ts => '2012-12-30'")
    assert(q1.where.get.datetimeFilter.get.isInstanceOf[DatetimeFilter.Gte])
    val q2 = QueryParser.parse("select * from m where ts =< '2012-12-30'")
    assert(q2.where.get.datetimeFilter.get.isInstanceOf[DatetimeFilter.Lte])
  }

  test("grouped limits >=|2 <=|10 <|10 >|3") {
    def limOf(q: String): DatetimeFilter =
      QueryParser.parse(q).where.get.datetimeFilter.get
    assert(limOf("select * from m where ts >=|2 '2012-12-30'")
      .asInstanceOf[DatetimeFilter.Gte].limit.contains(2))
    assert(limOf("select * from m where ts <=|10 '2012-12-30'")
      .asInstanceOf[DatetimeFilter.Lte].limit.contains(10))
    assert(limOf("select * from m where ts <|10 '2012-12-30'")
      .asInstanceOf[DatetimeFilter.Lt].limit.contains(10))
    assert(limOf("select * from m where ts >|3 '2012-12-30'")
      .asInstanceOf[DatetimeFilter.Gt].limit.contains(3))
  }

  test("equality filter with datetime literal precisions") {
    for (lit <- Seq("'2021-09-27'", "'2021-09-27 23:00'", "'2021-09-27 23:00:01'",
        "'2021-09-27 09:42:40.741778000'")) {
      val q = QueryParser.parse(s"select * from m where ts = $lit")
      assert(q.where.get.datetimeFilter.get.isInstanceOf[DatetimeFilter.Equal], lit)
    }
  }

  test("duration delta spellings") {
    for ((d, micros) <- Seq(
        ("+ 2 hours", 2L * 3600000000L), ("2 hours", 2L * 3600000000L),
        ("-2 hours", -2L * 3600000000L), ("+1 day", 86400000000L),
        ("+30 minutes", 30L * 60000000L), ("+10 seconds", 10000000L),
        ("+5 millis", 5000L), ("+7 micros", 7L))) {
      val q = QueryParser.parse(s"select * from m where ts >= '2012-12-30' $d")
      q.where.get.datetimeFilter.get match {
        case DatetimeFilter.Gte(DatetimeValue.Str(_, Some(delta)), None) =>
          assert(delta.micros == micros, s"for '$d'")
        case other => fail(s"unexpected for '$d': $other")
      }
    }
  }

  test("meta tables parse") {
    assert(QueryParser.parse("select * from .metrics;").from == ".metrics")
    assert(QueryParser.parse("select * from .describe").from == ".describe")
    val q = QueryParser.parse("select * from .block_list where metrics = m1")
    assert(q.from == ".block_list")
    assert(q.where.get.metricsFilter.contains("m1"))
  }

  test("with-clause output settings") {
    val q = QueryParser.parse(
      "with format = json, output_file = '/tmp/out.json', use_cache = false, " +
        "force_sync_cloud = true, format_datetime = false, db = mydb " +
        "select * from m where ts in today()")
    val w = q.withClause.get
    assert(w.format.contains(OutputFormat.Json))
    assert(w.outputFile.contains("/tmp/out.json"))
    assert(!w.useCache)
    assert(w.forceSyncCloud)
    assert(w.formatDatetime.contains(false))
    assert(w.database.contains("mydb"))
  }

  test("keywords are case-insensitive") {
    val q = QueryParser.parse("SELECT * FROM trades WHERE ts IN TODAY()")
    assert(q.selectAll && q.from == "trades")
  }

  test("comments and stray whitespace are skipped") {
    val q = QueryParser.parse(
      "select * // trailing comment\n from trades \\ where ts in today()")
    assert(q.from == "trades")
  }

  test("trailing garbage rejected") {
    assertThrows[ParseException](QueryParser.parse("select * from m where ts in today() garbage"))
  }

  test("unterminated datetime literal rejected") {
    assertThrows[ParseException](QueryParser.parse("select * from m where ts >= '2019-12-13"))
  }

  test("in with bare literal (non-function) rejected") {
    assertThrows[ParseException](QueryParser.parse("select * from m where ts in '2012-12-30'"))
  }
}
