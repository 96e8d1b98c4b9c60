package graft

import graft.operators.RecurrenceOps
import org.scalatest.funsuite.AnyFunSuite

/** Sequential-recurrence tier: the sorted-partition fold must reproduce the
  * defining integer recurrences exactly, reset state across series, and
  * stay deterministic under any input order (the repartition+sort owns
  * ordering).
  */
class RecurrenceOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ev(rows: Seq[(Long, Long, Long, Double)]) =
    rows.toDF("user_id", "ts", "event_id", "value")

  test("ewma: defined recurrence, steady state on a constant series") {
    // constant series: m = c·2^a is a fixed point, ewma_cents == c forever
    val const = ev((0 until 8).map(i => (1L, i * 10L, i.toLong, 50.0)))
    val out = RecurrenceOps.ewma(const, Seq("user_id"), alphaLog2 = 4)
      .orderBy("ts").collect()
    assert(out.forall(_.getAs[Long]("ewma_num") == 5000L * 16))
    assert(out.forall(_.getAs[Long]("ewma_cents") == 5000L))
    // reference fold: m1 = c1·16, mi = m(i-1) - floor(m(i-1)/16) + ci
    val vals = Seq(10.0, 90.0, 30.0, 70.0, 50.0)
    val df = ev(vals.zipWithIndex.map { case (v, i) => (2L, i * 10L, i.toLong, v) })
    val got = RecurrenceOps.ewma(df, Seq("user_id"), alphaLog2 = 4)
      .orderBy("ts").collect().map(_.getAs[Long]("ewma_num")).toSeq
    val cents = vals.map(v => (v * 100).toLong)
    val expect = cents.tail.scanLeft(cents.head * 16) { (m, c) =>
      m - Math.floorDiv(m, 16L) + c
    }
    assert(got == expect)
  }

  test("ewma: state resets between series; input order irrelevant") {
    // interleave two users in scrambled row order — the op's own
    // repartition+sort must produce each user's time-ordered fold
    val rows = Seq(
      (2L, 20L, 21L, 80.0), (1L, 10L, 11L, 40.0), (2L, 10L, 20L, 20.0),
      (1L, 20L, 12L, 60.0))
    val out = RecurrenceOps.ewma(ev(rows), Seq("user_id"), alphaLog2 = 2)
      .orderBy("user_id", "ts").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("ewma_num"))).toSeq
    // u1: m1=4000·4=16000; m2=16000−4000+6000=18000
    // u2: m1=2000·4=8000;  m2=8000−2000+8000=14000  (fresh state)
    assert(out == Seq((1L, 16000L), (1L, 18000L), (2L, 8000L), (2L, 14000L)))
  }

  test("ewma: non-castable values are dropped, not folded") {
    val rows = Seq((1L, 10L, 1L, 50.0), (1L, 20L, 2L, Double.NaN),
      (1L, 30L, 3L, 50.0))
    val out = RecurrenceOps.ewma(ev(rows), Seq("user_id"), alphaLog2 = 4)
      .collect()
    assert(out.length == 2) // NaN row gone
    assert(out.forall(_.getAs[Long]("ewma_cents") == 5000L))
  }

  test("cusum: sustained upward drift alarms then resets") {
    // target 50.00, slack 5.00, threshold 15.00: five 60.00 points drift
    // s_pos by 500/step → alarm on the 4th (2000 > 1500), reset after
    val rows = (0 until 5).map(i => (1L, i * 10L, i.toLong, 60.0))
    val out = RecurrenceOps.cusum(ev(rows), Seq("user_id"),
        targetCents = 5000L, slackCents = 500L, thresholdCents = 1500L)
      .orderBy("ts").collect()
      .map(r => (r.getAs[Long]("s_pos"), r.getAs[Long]("alarm"))).toSeq
    assert(out == Seq((500L, 0L), (1000L, 0L), (1500L, 0L), (2000L, 1L),
      (500L, 0L)))
  }

  test("holt: constant series is a fixed point; linear ramp learns the slope") {
    val m = 1L << 20
    val const = ev((0 until 6).map(i => (1L, i * 10L, i.toLong, 50.0)))
    val c = RecurrenceOps.holt(const, Seq("user_id")).orderBy("ts").collect()
    assert(c.forall(_.getAs[Long]("level_num") == 5000L * m))
    assert(c.forall(_.getAs[Long]("trend_num") == 0L))
    assert(c.forall(_.getAs[Long]("fc1_cents") == 5000L))
    // ramp +1.00/step: the one-step forecast must converge NEAR the true
    // next value (within 1.00) once the trend is learned
    val ramp = ev((0 until 60).map(i => (2L, i * 10L, i.toLong, 50.0 + i)))
    val last = RecurrenceOps.holt(ramp, Seq("user_id")).orderBy("ts")
      .collect().last
    val trueNext = 5000L + 60 * 100L
    assert(Math.abs(last.getAs[Long]("fc1_cents") - trueNext) <= 100L,
      s"fc=${last.getAs[Long]("fc1_cents")} vs $trueNext")
  }

  test("holt: reference fold matches the defined recurrence exactly") {
    val m = 1L << 20
    val vals = Seq(10.0, 90.0, 30.0, 70.0)
    val df = ev(vals.zipWithIndex.map { case (v, i) => (3L, i * 10L, i.toLong, v) })
    val got = RecurrenceOps.holt(df, Seq("user_id")).orderBy("ts").collect()
      .map(r => (r.getAs[Long]("level_num"), r.getAs[Long]("trend_num"))).toSeq
    val cents = vals.map(v => (v * 100).toLong)
    var (l, b) = (cents.head * m, 0L)
    val expect = cents.map { c =>
      val drift = l + b
      l = drift + Math.floorDiv(c * m - drift, 8L)
      b = b + Math.floorDiv(l - drift, 16L)
      (l, b)
    }
    assert(got == expect)
  }

  private def lttbPoints(rows: Seq[(Long, Long, Long, Double)], w: Long) =
    RecurrenceOps.lttb(ev(rows), Seq("user_id"), w)
      .orderBy("ts", "id").collect()
      .map(r => (r.getAs[Long]("ts"), r.getAs[Long]("cents"))).toSeq

  test("lttb: hand-walked selection — anchor, two interior picks, last") {
    val g = 1000000000L // 1s; bucket width 10s
    // b1 [0,10): t=1 c=10.00 (anchor), t=5 c=99.00 (first-bucket tail,
    //   DISCARDED); b2 [10,20): t=11 c=50.00, t=15 c=10.00; b3: t=21
    //   c=30.00; b4: t=35 c=70.00 (last)
    // interior pick in b2, prev=(rel 0, 1000c), next-avg=b3 (n=1, sx=20,
    //   sy=3000):
    //   p(11): |(0·1−20)(5000−1000) − (0−10)(3000−1000)| = 60000
    //   p(15): |(0·1−20)(1000−1000) − (0−14)(3000−1000)| = 28000 → pick 11
    // interior pick in b3: its only point
    val rows = Seq((1L, 1 * g, 1L, 10.0), (1L, 5 * g, 2L, 99.0),
      (1L, 11 * g, 3L, 50.0), (1L, 15 * g, 4L, 10.0),
      (1L, 21 * g, 5L, 30.0), (1L, 35 * g, 6L, 70.0))
    assert(lttbPoints(rows, 10 * g) == Seq((1 * g, 1000L), (11 * g, 5000L),
      (21 * g, 3000L), (35 * g, 7000L)))
  }

  test("lttb: degenerate series — single bucket keeps first and last") {
    val g = 1000000000L
    assert(lttbPoints(Seq((1L, 1 * g, 1L, 5.0), (1L, 2 * g, 2L, 6.0),
      (1L, 3 * g, 3L, 7.0)), 100 * g) == Seq((1 * g, 500L), (3 * g, 700L)))
    // a single point appears exactly once, never duplicated as "last"
    assert(lttbPoints(Seq((1L, 1 * g, 1L, 5.0)), 100 * g) ==
      Seq((1 * g, 500L)))
    // two buckets, no interior: anchor + last only
    assert(lttbPoints(Seq((1L, 1 * g, 1L, 5.0), (1L, 2 * g, 2L, 9.0),
      (1L, 11 * g, 3L, 6.0), (1L, 12 * g, 4L, 7.0)), 10 * g) ==
      Seq((1 * g, 500L), (12 * g, 700L)))
  }

  test("lttb: series are independent and order-insensitive") {
    val g = 1000000000L
    val a = Seq((1L, 1 * g, 1L, 10.0), (1L, 11 * g, 2L, 50.0),
      (1L, 21 * g, 3L, 30.0), (1L, 35 * g, 4L, 70.0))
    val b = a.map { case (_, ts, id, v) => (2L, ts, id + 10, v + 1) }
    val out = RecurrenceOps.lttb(
      ev(scala.util.Random.shuffle(a ++ b)), Seq("user_id"), 10 * g)
      .orderBy("user_id", "ts").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("ts"))).toSeq
    assert(out == a.map(x => (1L, x._2)) ++ b.map(x => (2L, x._2)))
  }

  test("cusum: downward drift trips the negative side") {
    val rows = (0 until 4).map(i => (1L, i * 10L, i.toLong, 40.0))
    val out = RecurrenceOps.cusum(ev(rows), Seq("user_id"),
        targetCents = 5000L, slackCents = 500L, thresholdCents = 1200L)
      .orderBy("ts").collect()
    assert(out.map(_.getAs[Long]("s_neg")).toSeq == Seq(500L, 1000L, 1500L, 500L))
    assert(out.map(_.getAs[Long]("alarm")).toSeq == Seq(0L, 0L, 1L, 0L))
    assert(out.forall(_.getAs[Long]("s_pos") == 0L))
  }
}
