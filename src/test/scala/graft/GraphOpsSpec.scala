package graft

import graft.operators.GraphOps
import org.scalatest.funsuite.AnyFunSuite

class GraphOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("pagerank: symmetric 2-cycle stays symmetric with exact values") {
    // a <-> b, S = 2^30, N = 2: init ⌊S/2⌋ = 536870912,
    // B = ⌊15S/200⌋ = 80530636, one superstep:
    // pr' = B + ⌊85·536870912/100⌋ = 80530636 + 456340275 = 536870911
    val e = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val pr1 = GraphOps.pageRank(e, iters = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr1(1L) == pr1(2L))
    assert(pr1(1L) == 80530636L + (85L * 536870912L) / 100L)
  }

  test("pagerank: linked nodes outrank base-rank-only leaves") {
    // leaves 2..5 all point at 1; 1 points back at 2. Leaves 3,4,5 have no
    // in-edges, so they hold only base rank; 1 (four in-edges) and 2 (the
    // hub's whole mass — out-degree 1) must both outrank them, and the
    // symmetric leaves tie exactly
    val e = Seq((2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L), (1L, 2L))
      .toDF("src", "dst")
    val pr = GraphOps.pageRank(e, iters = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(3L, 4L, 5L).forall(l => pr(1L) > pr(l)))
    assert(Seq(3L, 4L, 5L).forall(l => pr(2L) > pr(l)))
    assert(pr(3L) == pr(4L) && pr(4L) == pr(5L)) // symmetric leaves tie
  }

  test("pagerank: iterations are deterministic under repartitioning") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("src", "dst")
    val a = GraphOps.pageRank(e, iters = 3).orderBy("node").collect().toSeq
    val b = GraphOps.pageRank(e.repartition(7), iters = 3)
      .orderBy("node").collect().toSeq
    assert(a == b)
  }

  test("pagerank: an empty edge frame fails fast with a clear error") {
    val e = Seq.empty[(Long, Long)].toDF("src", "dst")
    val ex = intercept[IllegalArgumentException] {
      GraphOps.pageRank(e, iters = 1)
    }
    assert(ex.getMessage.contains("non-empty edge frame"))
  }

  test("pagerank: mid-loop pinning leaves every rank bit unchanged") {
    // 10 supersteps with a pin every 3 must equal the pure-lineage run —
    // pinning is a plan-size/recompute control, never a semantic change
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L))
      .toDF("src", "dst")
    val pinned = GraphOps.pageRank(e, iters = 10, pinEvery = 3)
      .orderBy("node").collect().toSeq
    val pure = GraphOps.pageRank(e, iters = 10, pinEvery = 0)
      .orderBy("node").collect().toSeq
    assert(pinned == pure)
  }

  private def triRow(pairs: Seq[(Long, Long)]): (Long, Long, Long) = {
    val r = GraphOps.triangles(pairs.toDF("src", "dst")).collect()(0)
    (r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges"),
      r.getAs[Long]("n_triangles"))
  }

  test("triangles: K4 holds exactly its four triangles") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(triRow(k4) == ((4L, 6L, 4L)))
  }

  test("triangles: a path graph holds none") {
    assert(triRow(Seq((1L, 2L), (2L, 3L), (3L, 4L))) == ((4L, 3L, 0L)))
  }

  test("triangles: a closed star counts once despite the degree-skew hub") {
    // hub 1 with leaves 2..6, plus the single closing edge (2,3): the only
    // triangle is {1,2,3}; orientation must not double- or zero-count it
    val star = (2L to 6L).map(l => (1L, l)) :+ (2L, 3L)
    assert(triRow(star) == ((6L, 6L, 1L)))
  }

  test("triangles: direction, duplicates, and self-loops normalize away") {
    // same K3 delivered messy: reversed edges, a duplicate, a self-loop
    val messy = Seq((2L, 1L), (1L, 2L), (3L, 2L), (1L, 3L), (3L, 3L))
    assert(triRow(messy) == ((3L, 3L, 1L)))
  }

  private def core(pairs: Seq[(Long, Long)], k: Int, maxRounds: Int = 12) =
    GraphOps.kCore(pairs.toDF("src", "dst"), k, maxRounds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("kCore: pendant peels off, the clique survives with its degrees") {
    // K4 on 1..4 plus pendant 5—1: the 3-core is exactly the K4
    val k4 = (for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)) :+
      ((1L, 5L))
    assert(core(k4, 3) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("kCore: a path cascades from both ends to an empty 2-core") {
    // each round exposes new endpoints — the multi-round cascade case
    val path = (1L until 8L).map(i => (i, i + 1))
    assert(core(path, 2) == Map.empty)
    // the cycle closes the ends: every node holds degree 2 and survives
    val cycle = path :+ ((8L, 1L))
    assert(core(cycle, 2) == (1L to 8L).map(_ -> 2L).toMap)
  }

  test("triangles and kCore: empty edge frames return empty, not errors") {
    val none = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(triRow(Seq.empty[(Long, Long)] :+ ((1L, 1L))) == ((0L, 0L, 0L)))
    assert(GraphOps.triangles(none).collect()(0).toSeq == Seq(0L, 0L, 0L))
    assert(GraphOps.kCore(none, 2).collect().isEmpty)
  }

  test("cache hygiene: triangles releases its pins; pageRank/kCore do " +
      "so under unpersistOnExit") {
    spark.sharedState.cacheManager.clearCache()
    val k4 = (for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)).toDF(
      "src", "dst")
    assert(GraphOps.triangles(k4).collect()(0).getAs[Long]("n_triangles")
      == 4L)
    assert(spark.sharedState.cacheManager.isEmpty,
      "triangles left cache entries registered")
    // pageRank/kCore: pin cadence forced every iteration so the exit path
    // must release a live lastPin too, not just nodes/deg
    val pr = GraphOps.pageRank(k4, iters = 3, pinEvery = 1,
      unpersistOnExit = true)
    assert(pr.count() == 4L)
    assert(spark.sharedState.cacheManager.isEmpty,
      "pageRank(unpersistOnExit) left cache entries registered")
    val core = GraphOps.kCore(k4, k = 3, pinEvery = 1,
      unpersistOnExit = true)
    assert(core.count() == 4L)
    assert(spark.sharedState.cacheManager.isEmpty,
      "kCore(unpersistOnExit) left cache entries registered")
  }

  test("kCore: a non-converged peel fails loudly, never partially") {
    val path = (1L until 12L).map(i => (i, i + 1))
    val ex = intercept[IllegalStateException] { core(path, 2, maxRounds = 2) }
    assert(ex.getMessage.contains("did not converge"))
  }
}
