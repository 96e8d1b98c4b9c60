package graft

import org.scalatest.funsuite.AnyFunSuite

/** Randomized cross-checks for the round-8 operator tier: every trial pits
  * the distributed implementation against an INDEPENDENT brute-force
  * reference written from the operator's definition (not its code), over
  * seeded random inputs. Complements the handpicked fixtures — what this
  * hunts is the case nobody thought to pick: tie collisions, empty
  * buckets, degenerate graphs, boundary residues.
  */
class OperatorPropSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val G = 1000000000L

  test("triangles: random graphs match the all-triples count") {
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 0 until 25) {
      val n = 4 + rnd.nextInt(7)
      val edges = (for {
        a <- 1L to n; b <- (a + 1) to n
        if rnd.nextDouble() < 0.45
      } yield (a, b)).toSeq
      if (edges.nonEmpty) {
        val es = edges.toSet
        val expect = (for {
          a <- 1L to n; b <- (a + 1) to n; c <- (b + 1) to n
          if es((a, b)) && es((b, c)) && es((a, c))
        } yield 1).size.toLong
        val got = graft.operators.GraphOps.triangles(edges.toDF("src", "dst"))
          .head().getAs[Long]("n_triangles")
        spark.catalog.clearCache()
        assert(got == expect, s"trial $trial edges=$edges")
      }
    }
  }

  test("kCore: random graphs match the definitional fixpoint") {
    val rnd = new scala.util.Random(20260815L)
    def ref(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
      var e = edges.map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
        .filter(p => p._1 != p._2).toSet
      var changed = true
      while (changed) {
        val deg = e.toSeq.flatMap(p => Seq(p._1, p._2))
          .groupBy(identity).map { case (k2, v) => k2 -> v.size }
        val keep = deg.filter(_._2 >= k).keySet
        val e2 = e.filter(p => keep(p._1) && keep(p._2))
        changed = e2 != e; e = e2
      }
      e.toSeq.flatMap(p => Seq(p._1, p._2))
        .groupBy(identity).map { case (k2, v) => k2 -> v.size.toLong }
    }
    for (trial <- 0 until 20) {
      val n = 4 + rnd.nextInt(7)
      val k = 2 + rnd.nextInt(3)
      val edges = (for {
        a <- 1L to n; b <- (a + 1) to n
        if rnd.nextDouble() < 0.5
      } yield (a, b)).toSeq
      if (edges.nonEmpty) {
        val got = graft.operators.GraphOps
          .kCore(edges.toDF("src", "dst"), k, maxRounds = 30)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        spark.catalog.clearCache()
        assert(got == ref(edges, k), s"trial $trial k=$k edges=$edges")
      }
    }
  }

  test("histogramQuantile: random data matches the definitional rank walk") {
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 0 until 20) {
      val bounds = Seq(100L, 250L, 600L, 900L)
      val (qn, qd) = Seq((1L, 2L), (9L, 10L), (99L, 100L))(rnd.nextInt(3))
      val rows = (0 until (1 + rnd.nextInt(40)))
        .map(_ => ("k" + rnd.nextInt(3), rnd.nextInt(1200) / 100.0))
      def ref(vals: Seq[Long]): (Long, Long) = {
        val inf = Long.MaxValue
        val le = vals.map(c => bounds.find(_ >= c).getOrElse(inf))
        val present = le.distinct.sorted
        val total = vals.size.toLong
        var cum = 0L
        for (b <- present) {
          val cnt = le.count(_ == b).toLong
          cum += cnt
          if (cum * qd >= total * qn) {
            val q = if (b == inf) bounds.last
            else {
              val prev = bounds.filter(_ < b).lastOption.getOrElse(0L)
              prev + Math.floorDiv(
                (b - prev) * (qn * total - qd * (cum - cnt)), qd * cnt)
            }
            return (total, q)
          }
        }
        throw new IllegalStateException("unreachable")
      }
      val expect = rows.groupBy(_._1).map { case (k, vs) =>
        k -> ref(vs.map(v => Math.round(v._2 * 100)))
      }
      val got = graft.operators.TsOps.histogramQuantile(
          rows.toDF("k", "value"), Seq("k"), bounds, qn, qd)
        .collect()
        .map(r => r.getAs[String]("k") ->
          ((r.getAs[Long]("n"), r.getAs[Long]("q_cents")))).toMap
      assert(got == expect, s"trial $trial q=$qn/$qd rows=$rows")
    }
  }

  test("lttb: random series match the all-in-memory reference walk") {
    val rnd = new scala.util.Random(20260817L)
    def ref(pts: Seq[(Long, Long, Long)], w: Long): Seq[(Long, Long)] = {
      val sorted = pts.sortBy(p => (p._1, p._2))
      val first = sorted.head
      val tsMin = first._1
      val b1 = Math.floorDiv(first._1, w)
      def rel(ts: Long) = Math.floorDiv(ts - tsMin, G)
      val beyond = sorted.filter(p => Math.floorDiv(p._1, w) != b1)
      val buckets = beyond.groupBy(p => Math.floorDiv(p._1, w))
        .toSeq.sortBy(_._1).map(_._2)
      val out = scala.collection.mutable.ArrayBuffer((first._1, first._2))
      var ax = 0L; var ay = first._3
      for (j <- buckets.indices.dropRight(1)) {
        val next = buckets(j + 1)
        val n = BigInt(next.length)
        val sx = next.map(p => BigInt(rel(p._1))).sum
        val sy = next.map(p => BigInt(p._3)).sum
        var bp: (Long, Long, Long) = null; var bs = BigInt(-1)
        for (p <- buckets(j)) {
          val sc = ((BigInt(ax) * n - sx) * BigInt(p._3 - ay) -
            BigInt(ax - rel(p._1)) * (sy - BigInt(ay) * n)).abs
          if (sc > bs) { bs = sc; bp = p }
        }
        out += ((bp._1, bp._2)); ax = rel(bp._1); ay = bp._3
      }
      if (buckets.nonEmpty) out += ((beyond.last._1, beyond.last._2))
      else {
        val l = sorted.last
        if ((l._1, l._2) != (first._1, first._2)) out += ((l._1, l._2))
      }
      out.toSeq
    }
    for (trial <- 0 until 15) {
      val w = 10 * G
      val nPts = 1 + rnd.nextInt(30)
      // duplicate ts on purpose (distinct ids): ties must break by id
      val pts = (0 until nPts).map { i =>
        (rnd.nextInt(60).toLong * G + rnd.nextInt(3).toLong * G,
          i.toLong, rnd.nextInt(2000).toLong)
      }
      val expect = ref(pts, w)
      val got = graft.operators.RecurrenceOps.lttb(
          pts.map(p => (1L, p._1, p._2, p._3 / 100.0))
            .toDF("k", "ts", "event_id", "value"),
          Seq("k"), w)
        .orderBy("ts", "id").collect()
        .map(r => (r.getAs[Long]("ts"), r.getAs[Long]("id"))).toSeq
      assert(got == expect.sorted, s"trial $trial pts=$pts")
    }
  }

  test("toleranceJoin: random pairs match the naive theta join") {
    val rnd = new scala.util.Random(20260818L)
    for (trial <- 0 until 15) {
      val tol = (1 + rnd.nextInt(5)).toLong * G
      val l = (0 until (1 + rnd.nextInt(15))).map(i =>
        (rnd.nextInt(3).toLong, rnd.nextInt(40).toLong * G, i.toLong))
      val r = (0 until (1 + rnd.nextInt(15))).map(i =>
        (rnd.nextInt(3).toLong, rnd.nextInt(40).toLong * G, 100L + i))
      val expect = (for {
        a <- l; b <- r
        if a._1 == b._1 && math.abs(a._2 - b._2) <= tol
      } yield (a._1, a._3, b._3)).sorted
      val got = graft.operators.TsOps.toleranceJoin(
          l.toDF("k", "ts", "lid"), r.toDF("k", "ts", "rid"), tol, Seq("k"))
        .select("k", "lid", "r_rid").collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).sorted.toSeq
      assert(got == expect, s"trial $trial tol=$tol")
    }
  }

  test("dupSpanCoverage: random corpora match the covered-position union") {
    // independent reference: mark every position under ANY >= 2-count
    // window, count marks — the definition, with no island arithmetic
    val rnd = new scala.util.Random(20260815L)
    val k = 3
    for (trial <- 0 until 12) {
      val syms = "abcdefgh".map(_.toString)
      val docs = (1L to (8 + rnd.nextInt(10))).map { id =>
        val len = rnd.nextInt(26) // 0-length docs included
        (id, (0 until len).map(_ => syms(rnd.nextInt(syms.size)))
          .mkString(" "))
      }
      val toksAll = docs.map { case (id, t) =>
        id -> t.split(" ").filter(_.nonEmpty).toSeq }
      val counts = toksAll.flatMap { case (_, ts) =>
        ts.sliding(k).filter(_.size == k).map(_.mkString(" ")) }
        .groupBy(identity).map { case (g, o) => g -> o.size }
      val expect = toksAll.map { case (id, ts) =>
        val n = ts.size
        val covered = Array.fill(n)(false)
        for (i <- 0 to n - k
             if n >= k && counts(ts.slice(i, i + k).mkString(" ")) >= 2;
             j <- i until i + k) covered(j) = true
        (id, n.toLong, covered.count(identity).toLong)
      }.sortBy(_._1)
      val got = graft.pipeline.Text.dupSpanCoverage(
          docs.toDF("doc_id", "text"), "doc_id", "text", k = k)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == expect, s"trial $trial")
      // the excision transform against the same definition: survivors
      // are exactly the unmarked positions, rejoined in order
      val expectClean = toksAll.map { case (id, ts) =>
        val n = ts.size
        val covered = Array.fill(n)(false)
        for (i <- 0 to n - k
             if n >= k && counts(ts.slice(i, i + k).mkString(" ")) >= 2;
             j <- i until i + k) covered(j) = true
        (id, ts.zipWithIndex.collect {
          case (t, p) if !covered(p) => t }.mkString(" "))
      }.sortBy(_._1)
      val gotClean = graft.pipeline.Text.exciseDupSpans(
          docs.toDF("doc_id", "text"), "doc_id", "text", k = k)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getAs[String]("text_clean"))).toSeq
      assert(gotClean == expectClean, s"trial $trial (excision)")
    }
  }
}
