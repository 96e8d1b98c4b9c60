package graft.ql

import graft.model.TimeNano
import Ast._

/** Hand-rolled recursive-descent parser for the dialect defined by the
  * reference's PEG grammar (`zikeiretsu/src/tsdb/query/query.pest`). The
  * grammar is LL(1)-friendly (~40 rules); keywords are case-insensitive;
  * whitespace includes literal backslash and newlines; `// …` comments are
  * skipped (grammar lines 1-4).
  */
final class QueryParser(input: String) {
  private var pos = 0

  private def fail(msg: String): Nothing = throw ParseException(msg, pos)

  // --- low-level -------------------------------------------------------
  private def eof: Boolean = pos >= input.length
  private def peekCh: Char = if (eof) '\u0000' else input.charAt(pos)

  private def skipWs(): Unit = {
    var go = true
    while (go) {
      go = false
      while (!eof && (peekCh == ' ' || peekCh == '\t' || peekCh == '\n' ||
               peekCh == '\r' || peekCh == '\\')) { pos += 1; go = true }
      if (!eof && pos + 1 < input.length && input.charAt(pos) == '/' &&
          input.charAt(pos + 1) == '/') {
        while (!eof && peekCh != '\n') pos += 1
        go = true
      }
    }
  }

  /** Case-insensitive keyword, not followed by an alphanumeric. */
  private def tryKeyword(kw: String): Boolean = {
    skipWs()
    val end = pos + kw.length
    if (end > input.length) return false
    if (!input.regionMatches(true, pos, kw, 0, kw.length)) return false
    if (end < input.length && Character.isLetterOrDigit(input.charAt(end))) return false
    pos = end
    true
  }

  private def expectKeyword(kw: String): Unit =
    if (!tryKeyword(kw)) fail(s"expected '$kw'")

  private def trySymbol(s: String): Boolean = {
    skipWs()
    if (input.startsWith(s, pos)) { pos += s.length; true } else false
  }
  private def expectSymbol(s: String): Unit =
    if (!trySymbol(s)) fail(s"expected '$s'")

  private def takeWhile(p: Char => Boolean): String = {
    skipWs()
    val start = pos
    while (!eof && p(peekCh)) pos += 1
    input.substring(start, pos)
  }

  private def ident(extra: Set[Char]): String = {
    val s = takeWhile(c => Character.isLetterOrDigit(c) || extra(c))
    if (s.isEmpty) fail("expected identifier")
    s
  }

  private def columnName(): String  = ident(Set('_', '-'))
  private def metricsName(): String = ident(Set('_', '-', '.'))
  private def digits(): String = {
    val s = takeWhile(_.isDigit)
    if (s.isEmpty) fail("expected digits")
    s
  }

  // --- datetime values -------------------------------------------------
  private def quotedDatetime(): java.time.LocalDateTime = {
    expectSymbol("'")
    val start = pos
    while (!eof && peekCh != '\'') pos += 1
    if (eof) fail("unterminated datetime literal")
    val body = input.substring(start, pos)
    pos += 1
    try TimeNano.parseNaive(body)
    catch { case _: Exception => fail(s"invalid datetime literal '$body'") }
  }

  /** `+ 2 hours` | `-2 hours` | `+9:00` — sign optional (grammar
    * `DATETIME_DELTA`). Returns None when no delta follows. */
  private def tryDelta(): Option[Delta] = {
    skipWs()
    val save = pos
    var sign = 1L
    if (trySymbol("+")) sign = 1L
    else if (trySymbol("-")) sign = -1L
    skipWs()
    if (!peekCh.isDigit) { pos = save; return None }
    val num = digits()
    skipWs()
    if (peekCh == ':') {
      // clock delta e.g. `9:00` → fixed offset (clock_parser.rs)
      pos += 1
      val mins = digits()
      val micros = sign * (num.toLong * 3600L + mins.toLong * 60L) * 1000000L
      Some(Delta(micros))
    } else {
      val unitMicros =
        if (tryKeyword("micros") || tryKeyword("micro")) 1L
        else if (tryKeyword("millis") || tryKeyword("milli")) 1000L
        else if (tryKeyword("seconds") || tryKeyword("second")) 1000000L
        else if (tryKeyword("minutes") || tryKeyword("minute")) 60L * 1000000L
        else if (tryKeyword("hours") || tryKeyword("hour")) 3600L * 1000000L
        else if (tryKeyword("days") || tryKeyword("day")) 86400L * 1000000L
        else { pos = save; return None }
      Some(Delta(sign * num.toLong * unitMicros))
    }
  }

  private def datetimeValue(): DatetimeValue = {
    skipWs()
    val base: DatetimeValue =
      if (tryKeyword("today()")) DatetimeValue.Today(None)
      else if (tryKeyword("yesterday()")) DatetimeValue.Yesterday(None)
      else if (tryKeyword("tomorrow()")) DatetimeValue.Tomorrow(None)
      else if (peekCh == '\'') DatetimeValue.Str(quotedDatetime(), None)
      else fail("expected datetime literal or function")
    tryDelta() match {
      case Some(d) => DatetimeValue.withDelta(base, d)
      case None    => base
    }
  }

  // --- where -----------------------------------------------------------
  private def relOp(): String = {
    skipWs()
    val ops = Seq(">=|", "=>|", "<=|", "=<|", ">|", "<|",
      ">=", "=>", "<=", "=<", ">", "<", "=")
    ops.find(o => input.startsWith(o, pos)) match {
      case Some(o) if o.endsWith("|") =>
        pos += o.length
        val n = digits()
        o + n
      case Some(o) => pos += o.length; o
      case None if tryKeyword("in") => "in"
      case None => fail("expected relational operator")
    }
  }

  private def datetimeFilter(): DatetimeFilter = {
    val op = relOp()
    skipWs()
    if (op == "in") {
      if (peekCh == '(') {
        pos += 1
        val from = datetimeValue()
        expectSymbol(",")
        skipWs()
        // range close: either a full datetime or a bare delta applied to `from`
        // (`datetime_filter_parser.rs:224-282`)
        val to: DatetimeValue = {
          val save = pos
          tryDelta() match {
            case Some(d) =>
              skipWs()
              if (peekCh == ')' ) DatetimeValue.withDelta(from, d)
              else { pos = save; datetimeValue() }
            case None => datetimeValue()
          }
        }
        expectSymbol(")")
        DatetimeFilter.In(from, to)
      } else {
        // `ts in today()` → equality on a built-in function
        // (`datetime_filter_parser.rs:27-40`)
        val v = datetimeValue()
        v match {
          case _: DatetimeValue.Fn => DatetimeFilter.Equal(v)
          case _ => fail("'in' needs a datetime range or built-in function")
        }
      }
    } else {
      val v = datetimeValue()
      def lim(o: String, prefixLen: Int): Option[Int] =
        if (o.length > prefixLen) Some(o.substring(prefixLen).toInt) else None
      op.take(3) match {
        case ">=|" | "=>|" => DatetimeFilter.Gte(v, lim(op, 3))
        case "<=|" | "=<|" => DatetimeFilter.Lte(v, lim(op, 3))
        case _ =>
          op.take(2) match {
            case ">|" => DatetimeFilter.Gt(v, lim(op, 2))
            case "<|" => DatetimeFilter.Lt(v, lim(op, 2))
            case ">=" | "=>" => DatetimeFilter.Gte(v, None)
            case "<=" | "=<" => DatetimeFilter.Lte(v, None)
            case _ =>
              op match {
                case ">" => DatetimeFilter.Gt(v, None)
                case "<" => DatetimeFilter.Lt(v, None)
                case "=" => DatetimeFilter.Equal(v)
                case o   => fail(s"invalid operator '$o'")
              }
          }
      }
    }
  }

  private def whereClause(): WhereClause = {
    skipWs()
    if (tryKeyword("ts")) WhereClause(Some(datetimeFilter()), None)
    else if (tryKeyword("metrics")) {
      expectSymbol("=")
      WhereClause(None, Some(metricsName()))
    } else fail("expected 'ts' or 'metrics' filter")
  }

  // --- with ------------------------------------------------------------
  private def boolValue(): Boolean =
    if (tryKeyword("true")) true
    else if (tryKeyword("false")) false
    else fail("expected true/false")

  private def withDefine(w: WithClause): WithClause = {
    if (tryKeyword("cols")) {
      expectSymbol("="); expectSymbol("[")
      val cols = scala.collection.mutable.ArrayBuffer(columnName())
      while (trySymbol(",")) cols += columnName()
      expectSymbol("]")
      w.copy(cols = Some(cols.toSeq))
    } else if (tryKeyword("tz")) {
      expectSymbol("=")
      val name = takeWhile(c =>
        Character.isLetterOrDigit(c) || c == '/' || c == '+' || c == '-' ||
          c == '_' || c == ':')
      // resolve eagerly: a bad zone is a parse-time error in the reference
      // ("invalid timezone: {0}", parser/parts/timezone_parser.rs:38-44) —
      // never a raw java.time exception later in the plan
      try TimeNano.resolveZone(name)
      catch { case _: Exception => fail(s"invalid timezone: $name") }
      w.copy(tz = Some(name))
    } else if (tryKeyword("format_datetime")) {
      expectSymbol("=")
      w.copy(formatDatetime = Some(boolValue()))
    } else if (tryKeyword("format")) {
      expectSymbol("=")
      val f =
        if (tryKeyword("json")) OutputFormat.Json
        else if (tryKeyword("table")) OutputFormat.Table
        else if (tryKeyword("parquet_snappy")) OutputFormat.ParquetSnappy
        else if (tryKeyword("parquet")) OutputFormat.Parquet
        else fail("expected json|table|parquet|parquet_snappy")
      w.copy(format = Some(f))
    } else if (tryKeyword("output_to_memory")) {
      w.copy(outputToMemory = true)
    } else if (tryKeyword("output_file")) {
      expectSymbol("="); expectSymbol("'")
      val p = takeWhile(c => Character.isLetterOrDigit(c) || "./\\-_".contains(c))
      expectSymbol("'")
      w.copy(outputFile = Some(p))
    } else if (tryKeyword("use_cache")) {
      expectSymbol("=")
      w.copy(useCache = boolValue())
    } else if (tryKeyword("force_sync_cloud")) {
      expectSymbol("=")
      w.copy(forceSyncCloud = boolValue())
    } else if (tryKeyword("db")) {
      expectSymbol("=")
      w.copy(database = Some(ident(Set('_', '-'))))
    } else fail("unknown with-clause setting")
  }

  private def withClause(): WithClause = {
    var w = withDefine(WithClause())
    while (trySymbol(",")) w = withDefine(w)
    w
  }

  // --- query -----------------------------------------------------------
  def parse(): ParsedQuery = {
    val w = if (tryKeyword("with")) Some(withClause()) else None
    expectKeyword("select")
    skipWs()
    val (all, cols) =
      if (trySymbol("*")) (true, Nil)
      else {
        val cs = scala.collection.mutable.ArrayBuffer(columnName())
        while (trySymbol(",")) cs += columnName()
        (false, cs.toSeq)
      }
    expectKeyword("from")
    val from = metricsName()
    val where = if (tryKeyword("where")) Some(whereClause()) else None
    trySymbol(";")
    skipWs()
    if (!eof) fail(s"unexpected trailing input: '${input.substring(pos).take(30)}'")
    ParsedQuery(w, all, cols, from, where)
  }
}

object QueryParser {
  def parse(q: String): ParsedQuery = new QueryParser(q).parse()
}
