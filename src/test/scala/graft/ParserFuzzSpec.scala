package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ql.{Ast, Interpreter, QueryParser}

/** Seeded random fuzz over the dialect: every generated-valid query must
  * parse and interpret; every mutation of one must either parse or raise
  * the typed error taxonomy (ParseException / QueryException) — never any
  * other exception. Deterministic (fixed seed), so failures reproduce.
  */
class ParserFuzzSpec extends AnyFunSuite {

  private val now = java.time.Instant.parse("2024-01-15T12:00:00Z")

  private def interpretOk(q: String): Unit = {
    val iq = Interpreter.interpret(QueryParser.parse(q), now)
    iq match {
      case s: Interpreter.SearchMetrics =>
        assert(s.metrics.nonEmpty)
      case _ => ()
    }
  }

  test("300 generated-valid queries parse and interpret") {
    val rnd = new scala.util.Random(4242)
    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))
    val datetimes = Seq("'2024-01-10'", "'2024-01-10 12:30'",
      "'2024-01-10 12:30:45'", "'2024-01-10 12:30:45.123'",
      "'2024-01-10 12:30:45.123456789'", "today()", "yesterday()",
      "tomorrow()")
    val deltas = Seq("", " + 2 hours", " - 30 minutes", " + 500 millis",
      " + 1 day", " + 9:00", " - 2:30", " + 15 seconds", " +90 micros")
    val withParts = Seq("cols = [eid, uid, etype, val, props]",
      "tz = +9", "tz = -5:30", "format = json", "format = table",
      "format_datetime = false")
    def dt() = pick(datetimes) + pick(deltas)
    def where() = rnd.nextInt(6) match {
      case 0 => s"ts = ${dt()}"
      case 1 => s"ts > ${dt()}"
      case 2 => s"ts >= ${dt()}"
      case 3 => s"ts <= ${dt()}"
      case 4 => s"ts in (${dt()}, ${dt()})"
      case 5 => s"ts >=|${1 + rnd.nextInt(50)} ${dt()}"
    }
    for (_ <- 0 until 300) {
      val withClause =
        if (rnd.nextBoolean()) {
          val n = 1 + rnd.nextInt(2)
          "with " + rnd.shuffle(withParts).take(n).mkString(", ") + " "
        } else ""
      val select =
        if (withClause.contains("cols") && rnd.nextBoolean()) "select eid, val"
        else "select *"
      val q = s"$withClause$select from events where ${where()}"
      withClue(q) { interpretOk(q) }
    }
  }

  test("mutated queries fail only with the typed error taxonomy") {
    val rnd = new scala.util.Random(777)
    val base = "with cols = [eid, uid, etype, val, props], tz = +9 " +
      "select eid, val from events where ts in ('2024-01-10', +2 hours)"
    val glyphs = "abz019 '=,()[]<>|+-.:*"
    var parsed = 0
    var rejected = 0
    for (_ <- 0 until 500) {
      val sb = new StringBuilder(base)
      val edits = 1 + rnd.nextInt(3)
      for (_ <- 0 until edits) {
        val pos = rnd.nextInt(sb.length)
        rnd.nextInt(3) match {
          case 0 => sb.insert(pos, glyphs(rnd.nextInt(glyphs.length)))
          case 1 => sb.deleteCharAt(pos)
          case 2 => sb.setCharAt(pos, glyphs(rnd.nextInt(glyphs.length)))
        }
      }
      val q = sb.toString
      try { Interpreter.interpret(QueryParser.parse(q), now); parsed += 1 }
      catch {
        case _: Ast.ParseException            => rejected += 1
        case _: Interpreter.QueryException    => rejected += 1
        case e: Throwable =>
          fail(s"unexpected ${e.getClass.getName}: ${e.getMessage}\nquery: $q")
      }
    }
    assert(parsed + rejected == 500)
    assert(rejected > 100) // mutations do get caught, not silently accepted
  }
}
