package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench harness's pure decision logic: the fork-replication
  * stop rule, the BENCHROW wire format, and the banded window verdict.
  * These decide what number an artifact publishes and how it qualifies
  * itself — they must not drift silently when the harness is edited. */
class BenchSpec extends AnyFunSuite {

  // ---- floorAgreed: the replication stop rule ------------------------

  test("one child is never a confirmed level") {
    assert(!Bench.floorAgreed(Seq(1.0)))
    assert(!Bench.floorAgreed(Seq.empty))
  }

  test("two lowest medians within 1.2x confirm the floor") {
    assert(Bench.floorAgreed(Seq(1.0, 1.19)))
    assert(Bench.floorAgreed(Seq(1.0, 1.2)))
    assert(!Bench.floorAgreed(Seq(1.0, 1.21)))
  }

  test("agreement reads the two LOWEST medians, order-independent") {
    // a third, slower child (a bad level) must not block agreement
    assert(Bench.floorAgreed(Seq(3.4, 1.0, 1.1)))
    assert(Bench.floorAgreed(Seq(1.1, 3.4, 1.0)))
    // nor can two slow children agree past a single fast floor: the
    // floor is the claim, so the confirming pair must include it
    assert(!Bench.floorAgreed(Seq(1.0, 2.0, 2.1)))
  }

  // ---- BENCHROW: the child->parent wire format -----------------------

  test("BENCHROW line roundtrips through the child's own formatter") {
    val line =
      f"""BENCHROW {"name":"graph_triangles","median":${3.752}%.3f,"min":${3.591}%.3f,"calib":${0.112}%.3f}"""
    line match {
      case Bench.RowLine(n, med, min, cal) =>
        assert(n == "graph_triangles")
        assert(med.toDouble == 3.752)
        assert(min.toDouble == 3.591)
        assert(cal.toDouble == 0.112)
      case _ => fail(s"RowLine did not match: $line")
    }
  }

  test("BENCHROW parse ignores surrounding executor log noise") {
    val out = Seq(
      "26/08/16 INFO Executor: Starting executor",
      """BENCHROW {"name":"ql_range","median":0.151,"min":0.118,"calib":0.262}""",
      "[bench] shutdown")
    val parsed = out.collectFirst {
      case Bench.RowLine(n, med, _, _) => (n, med.toDouble) }
    assert(parsed.contains(("ql_range", 0.151)))
  }

  // ---- degradedAxes: the banded window verdict -----------------------

  test("quiesced readings on every axis verdict clean") {
    assert(Bench.degradedAxes(calib = 0.12, calibEnd = 0.14,
      calibIo = 0.18, calibStore = 1.4, calibShuffle = 0.40,
      calibShuffleEnd = 0.42, memClean = true).isEmpty)
  }

  test("each axis fires independently at its band threshold") {
    def axes(c: Double = 0.1, ce: Double = 0.1, io: Double = 0.2,
        st: Double = 1.2, sh: Double = 0.4, she: Double = 0.4,
        mem: Boolean = true) =
      Bench.degradedAxes(c, ce, io, st, sh, she, mem)
    assert(axes(c = 0.21) == Seq("cpu"))
    assert(axes(io = 0.41) == Seq("io"))
    assert(axes(st = 2.01) == Seq("store"))
    assert(axes(sh = 0.56) == Seq("shuffle"))
    assert(axes(mem = false) == Seq("mem"))
  }

  test("cpu and shuffle judge the WORSE of start and end samples") {
    // a mid-run era shift (clean start, degraded end) must not read clean
    assert(Bench.degradedAxes(0.10, 0.67, 0.2, 1.2, 0.40, 0.40, true)
      == Seq("cpu"))
    assert(Bench.degradedAxes(0.10, 0.10, 0.2, 1.2, 0.35, 0.81, true)
      == Seq("shuffle"))
    // and a recovered end does not excuse a degraded start
    assert(Bench.degradedAxes(0.67, 0.10, 0.2, 1.2, 0.81, 0.35, true)
      == Seq("cpu", "shuffle"))
  }

  test("the slow-era readings that motivated the shuffle band verdict degraded") {
    // round-13 slow era: calib_shuffle 0.564-0.773 with green cpu/io —
    // the exact window the banding exists to self-report
    val axes = Bench.degradedAxes(0.11, 0.12, 0.19, 1.3, 0.564, 0.61, true)
    assert(axes == Seq("shuffle"))
  }
}
