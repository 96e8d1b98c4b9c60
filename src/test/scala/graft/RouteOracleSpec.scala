package graft

import graft.storage.RollupStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property sweep over the serving routers: for SEEDED-random point
  * budgets and ranges against tiered layouts, every routed answer must
  * equal the direct aggregate of the NEVER-TIERED samples at the grain
  * the router chose, over the outward-widened window it serves — and
  * the source label must be internally consistent (a "raw" serve's
  * window may never dip below the tier horizon).
  *
  * This is the test class that catches routing-arithmetic bugs the
  * example-based specs miss: the widened-lower-bound horizon dip fixed
  * in this round lived exactly in the gap between hand-picked budgets.
  * The probe set is deterministic (fixed seed) so a failure reproduces.
  */
class RouteOracleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val S = 1000000000L
  private val H = 3600L * S
  private val Day = 86400L * S

  /** ~200 samples over 5 days at irregular offsets, two-decimal values
    * — the never-tiered truth every layout serves a view of. */
  private def samples: DataFrame = {
    val rnd = new scala.util.Random(42)
    (0 until 200).map { i =>
      val ts = (rnd.nextDouble() * 5 * 86400).toLong * S + rnd.nextInt(1000)
      val v = math.rint(rnd.nextDouble() * 10000) / 100.0
      (ts, v)
    }.toDF("ts", "value")
  }

  private def direct(rows: DataFrame, g: Long, lo: Long, hi: Long)
      : Seq[(Long, Long, Double)] =
    rows.filter(col("ts") >= lo && col("ts") < hi)
      .groupBy(expr(graft.operators.TsOps.floorBucketSql("ts", g))
        .as("bucket_ts"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("sum_c"))
      .orderBy("bucket_ts").collect()
      .map(r => (r.getAs[Long]("bucket_ts"), r.getAs[Long]("n"),
        r.getAs[java.math.BigDecimal]("sum_c").doubleValue())).toSeq

  private def served(df: DataFrame): (Long, String, Seq[(Long, Long, Double)]) = {
    val rows = df.select("bucket_ts", "n", "sum_c", "grain_ns", "source")
      .orderBy("bucket_ts").collect()
    assert(rows.nonEmpty)
    val gs = rows.map(_.getAs[Long]("grain_ns")).distinct
    val srcs = rows.map(_.getAs[String]("source")).distinct
    assert(gs.length == 1 && srcs.length == 1, (gs.toSeq, srcs.toSeq))
    (gs.head, srcs.head,
      rows.map(r => (r.getAs[Long]("bucket_ts"), r.getAs[Long]("n"),
        r.getAs[java.math.BigDecimal]("sum_c").doubleValue())).toSeq)
  }

  private def widen(since: Long, until: Long, g: Long): (Long, Long) =
    (Math.floorDiv(since, g) * g, (Math.floorDiv(until - 1, g) + 1) * g)

  /** Deterministic probe set: ranges at awkward offsets crossing the
    * horizons, budgets from 1 (maximal clamp) to huge (finest grain) —
    * PLUS targeted probes starting just above each tier horizon with
    * budgets whose fitted grain exceeds that offset, so the widened
    * first bucket dips below the horizon (the dip window is seconds
    * wide; uniform sampling alone would almost never land in it, and
    * this is exactly where the round-9 widened-bound bug lived). */
  private def probes(rnd: scala.util.Random,
      horizons: Seq[Long]): Seq[(Long, Long, Int)] = {
    val uniform = (0 until 25).map { _ =>
      val a = (rnd.nextDouble() * 5 * 86400).toLong * S
      val span = ((rnd.nextDouble() * 3 * 86400).toLong + 600) * S
      val mp = rnd.nextInt(4) match {
        case 0 => 1 + rnd.nextInt(3)
        case 1 => 10 + rnd.nextInt(90)
        case 2 => 1000 + rnd.nextInt(9000)
        case _ => 1000000000
      }
      (a, a + span, mp)
    }
    val dips = horizons.flatMap { h =>
      Seq(1800L, 30L, 3599L).flatMap { off =>
        // span/budget pairs fitting grains of minutes-to-an-hour —
        // larger than the offset, so widening crosses the horizon
        Seq((h + off * S, h + off * S + 34000L * S, 10),
          (h + off * S, h + off * S + 7200L * S, 3))
      }
    }
    uniform ++ dips
  }

  test("route over a tiered store: every probe equals the never-tiered " +
      "direct aggregate at the chosen grain over the widened window") {
    val base = SparkTestBase.tempDir("graft-ro-route")
    val rawP = new java.io.File(base, "raw").getPath
    val stP = new java.io.File(base, "store").getPath
    samples.write.parquet(rawP)
    RollupStore.tierOff(spark, rawP, stP, cutoff = 2 * Day, bucketNanos = H)
    val rawNow = spark.read.parquet(rawP)
    val rnd = new scala.util.Random(7)
    for ((since, until, mp) <- probes(rnd, Seq(2 * Day))) {
      val (g, src, got) =
        served(RollupStore.route(spark, stP, rawNow, since, until, mp))
      val (lo, hi) = widen(since, until, g)
      assert((hi - lo) / g <= mp, s"budget violated: $since $until $mp $g")
      if (src == "raw") assert(lo >= 2 * Day,
        s"raw serve dips below the horizon: $since $until $mp -> $lo")
      assert(got == direct(samples, g, lo, hi),
        s"probe ($since, $until, $mp): grain=$g source=$src")
    }
  }

  test("routeCascade over three tiers: every probe equals the " +
      "never-tiered direct aggregate") {
    val base = SparkTestBase.tempDir("graft-ro-casc")
    val rawP = new java.io.File(base, "raw").getPath
    val stH = new java.io.File(base, "st_h").getPath
    val stD = new java.io.File(base, "st_d").getPath
    samples.write.parquet(rawP)
    // hourly below day 3, daily below day 1 — three live tiers
    RollupStore.tierOff(spark, rawP, stH, cutoff = 3 * Day, bucketNanos = H)
    RollupStore.tierOffStore(spark, stH, stD, cutoff = Day,
      coarseBucketNanos = Day)
    val rawNow = spark.read.parquet(rawP)
    val rnd = new scala.util.Random(13)
    for ((since, until, mp) <- probes(rnd, Seq(3 * Day, Day))) {
      val (g, src, got) = served(RollupStore.routeCascade(spark, rawP,
        Seq(stH, stD), since, until, mp))
      val (lo, hi) = widen(since, until, g)
      assert((hi - lo) / g <= mp, s"budget violated: $since $until $mp $g")
      if (src == "raw") assert(lo >= 3 * Day,
        s"raw serve dips below the finest horizon: $since $until $mp -> $lo")
      assert(got == direct(samples, g, lo, hi),
        s"probe ($since, $until, $mp): grain=$g source=$src")
    }
  }

  test("route with sketch dimensions: histogram counters and distinct " +
      "counts stay exact through tiered serving at every probe") {
    // counters are plain longs merged by vector addition — EXACTLY
    // reproducible — and at these per-bucket cardinalities the HLL
    // estimate equals the exact distinct count (the same contract the
    // rollup_store_users gate relies on)
    val bounds = Seq(2000L, 5000L, 8000L)
    val rnd0 = new scala.util.Random(42)
    val rows = (0 until 200).map { _ =>
      val ts = (rnd0.nextDouble() * 5 * 86400).toLong * S + rnd0.nextInt(1000)
      val v = math.rint(rnd0.nextDouble() * 10000) / 100.0
      (ts, v, (rnd0.nextInt(20) + 1).toLong)
    }.toDF("ts", "value", "uid")
    val base = SparkTestBase.tempDir("graft-ro-dims")
    val rawP = new java.io.File(base, "raw").getPath
    val stP = new java.io.File(base, "store").getPath
    rows.write.parquet(rawP)
    RollupStore.tierOff(spark, rawP, stP, cutoff = 2 * Day, bucketNanos = H,
      distinctCol = Some("uid"), histBoundsCents = bounds)
    val rawNow = spark.read.parquet(rawP)
    val rnd = new scala.util.Random(31)
    for ((since, until, mp) <- probes(rnd, Seq(2 * Day)).take(15)) {
      val df = RollupStore.route(spark, stP, rawNow, since, until, mp,
        distinctCol = Some("uid"), histBoundsCents = bounds)
      val got = df.select("bucket_ts", "hcnt", "distinct_est")
        .orderBy("bucket_ts").collect()
        .map(r => (r.getAs[Long]("bucket_ts"),
          r.getAs[Seq[Long]]("hcnt").toList,
          r.getAs[Long]("distinct_est"))).toSeq
      assert(got.nonEmpty)
      val g = df.select("grain_ns").head().getLong(0)
      val (lo, hi) = widen(since, until, g)
      val windowRows = rows.filter(col("ts") >= lo && col("ts") < hi)
      // direct counters via the SHARED rollupRows bucket assignment on
      // the never-tiered window — bit-exact, no tolerance
      val direct = RollupStore.rollupRows(windowRows, g, "value", "ts",
          None, 12, bounds)
        .select("bucket_ts", "hcnt").orderBy("bucket_ts").collect()
        .map(r => (r.getAs[Long]("bucket_ts"),
          r.getAs[Seq[Long]]("hcnt").toList)).toSeq
      val exactDistinct = windowRows
        .groupBy(expr(graft.operators.TsOps.floorBucketSql("ts", g))
          .as("bucket_ts"))
        .agg(countDistinct("uid").as("du"))
        .orderBy("bucket_ts").collect()
        .map(r => (r.getAs[Long]("bucket_ts"), r.getAs[Long]("du"))).toSeq
      assert(got.map(x => (x._1, x._2)) == direct,
        s"counters diverged at probe ($since, $until, $mp), grain=$g")
      assert(got.map(x => (x._1, x._3)) == exactDistinct,
        s"distinct diverged at probe ($since, $until, $mp), grain=$g")
    }
  }

  test("routeStoreCascade over a mirror plus tiers: every probe equals " +
      "the direct aggregate of everything ingested") {
    val base = SparkTestBase.tempDir("graft-ro-mirror")
    val stM = new java.io.File(base, "mirror").getPath
    val stD = new java.io.File(base, "st_d").getPath
    // the mirror holds EVERY bucket (streaming-maintained lifecycle);
    // old buckets age into the daily tier
    RollupStore.write(samples, stM, H)
    RollupStore.tierOffStore(spark, stM, stD, cutoff = 2 * Day,
      coarseBucketNanos = Day)
    val rnd = new scala.util.Random(29)
    for ((since, until, mp) <- probes(rnd, Seq(2 * Day))) {
      val (g, _, got) = served(RollupStore.routeStoreCascade(spark,
        Seq(stM, stD), since, until, mp))
      val (lo, hi) = widen(since, until, g)
      assert((hi - lo) / g <= mp, s"budget violated: $since $until $mp $g")
      assert(got == direct(samples, g, lo, hi),
        s"probe ($since, $until, $mp): grain=$g")
    }
  }

  test("KEYED raw-less mirror cascade: routeStoreCascade serves the " +
      "grouped truth per series at every probe") {
    val hosts = Seq("web", "db", "cache")
    val rnd0 = new scala.util.Random(41)
    val keyed = {
      val rows = samples.collect().map(r =>
        (r.getLong(0), r.getDouble(1), hosts(rnd0.nextInt(hosts.size))))
      rows.toSeq.toDF("ts", "value", "host")
    }
    val base = SparkTestBase.tempDir("graft-ro-kmirror")
    val stM = new java.io.File(base, "mirror").getPath
    val stD = new java.io.File(base, "st_d").getPath
    RollupStore.write(keyed, stM, H, keyCols = Seq("host"))
    RollupStore.tierOffStore(spark, stM, stD, cutoff = 2 * Day,
      coarseBucketNanos = Day)
    def directKeyed(g: Long, lo: Long, hi: Long)
        : Seq[(String, Long, Long, Double)] =
      keyed.filter(col("ts") >= lo && col("ts") < hi)
        .groupBy(col("host"),
          expr(graft.operators.TsOps.floorBucketSql("ts", g))
            .as("bucket_ts"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).as("sum_c"))
        .orderBy("host", "bucket_ts").collect()
        .map(r => (r.getAs[String]("host"), r.getAs[Long]("bucket_ts"),
          r.getAs[Long]("n"),
          r.getAs[java.math.BigDecimal]("sum_c").doubleValue())).toSeq
    val rnd = new scala.util.Random(43)
    for ((since, until, mp) <- probes(rnd, Seq(2 * Day))) {
      val rows = RollupStore.routeStoreCascade(spark, Seq(stM, stD),
          since, until, mp)
        .select("host", "bucket_ts", "n", "sum_c", "grain_ns")
        .orderBy("host", "bucket_ts").collect()
      assert(rows.nonEmpty)
      val g = rows.map(_.getAs[Long]("grain_ns")).distinct match {
        case Array(one) => one
        case gs => fail(s"mixed grains served: ${gs.toSeq}")
      }
      val (lo, hi) = widen(since, until, g)
      assert((hi - lo) / g <= mp, s"budget violated: $since $until $mp $g")
      val got = rows.map(r => (r.getAs[String]("host"),
        r.getAs[Long]("bucket_ts"), r.getAs[Long]("n"),
        r.getAs[java.math.BigDecimal]("sum_c").doubleValue())).toSeq
      assert(got == directKeyed(g, lo, hi),
        s"probe ($since, $until, $mp): grain=$g")
    }
    // key pushdown through the raw-less cascade: one series served
    // equals the per-series slice of the unfiltered truth; an empty
    // slice verifies at the unfiltered route's (filter-independent) grain
    val rnd3 = new scala.util.Random(47)
    for ((since, until, mp) <- probes(rnd3, Seq(2 * Day)).take(10)) {
      val df = RollupStore.routeStoreCascade(spark, Seq(stM, stD),
        since, until, mp, keyFilter = Some(col("host") === "cache"))
      val rows = df.select("host", "bucket_ts", "n", "sum_c", "grain_ns")
        .orderBy("bucket_ts").collect()
      val gExp = RollupStore.routeStoreCascade(spark, Seq(stM, stD),
        since, until, mp).select("grain_ns").head().getLong(0)
      rows.map(_.getAs[Long]("grain_ns")).distinct.foreach(g =>
        assert(g == gExp, s"filter changed the grain: $g vs $gExp"))
      val (lo, hi) = widen(since, until, gExp)
      val got = rows.map(r => (r.getAs[String]("host"),
        r.getAs[Long]("bucket_ts"), r.getAs[Long]("n"),
        r.getAs[java.math.BigDecimal]("sum_c").doubleValue())).toSeq
      assert(got == directKeyed(gExp, lo, hi).filter(_._1 == "cache"),
        s"filtered probe ($since, $until, $mp): grain=$gExp")
    }
  }

  test("KEYED route over a tiered dimensional store: every probe equals " +
      "the never-tiered grouped aggregate per series") {
    val hosts = Seq("web", "db", "cache")
    val rnd0 = new scala.util.Random(31)
    val keyed = {
      val rows = samples.collect().map(r =>
        (r.getLong(0), r.getDouble(1), hosts(rnd0.nextInt(hosts.size))))
      rows.toSeq.toDF("ts", "value", "host")
    }
    def directKeyed(g: Long, lo: Long, hi: Long)
        : Seq[(String, Long, Long, Double)] =
      keyed.filter(col("ts") >= lo && col("ts") < hi)
        .groupBy(col("host"),
          expr(graft.operators.TsOps.floorBucketSql("ts", g))
            .as("bucket_ts"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).as("sum_c"))
        .orderBy("host", "bucket_ts").collect()
        .map(r => (r.getAs[String]("host"), r.getAs[Long]("bucket_ts"),
          r.getAs[Long]("n"),
          r.getAs[java.math.BigDecimal]("sum_c").doubleValue())).toSeq
    val base = SparkTestBase.tempDir("graft-ro-keyed")
    val rawP = new java.io.File(base, "raw").getPath
    val stP = new java.io.File(base, "store").getPath
    keyed.write.parquet(rawP)
    RollupStore.tierOff(spark, rawP, stP, cutoff = 2 * Day, bucketNanos = H,
      keyCols = Seq("host"))
    val rawNow = spark.read.parquet(rawP)
    val rnd = new scala.util.Random(37)
    for ((since, until, mp) <- probes(rnd, Seq(2 * Day))) {
      val df = RollupStore.route(spark, stP, rawNow, since, until, mp)
      val rows = df.select("host", "bucket_ts", "n", "sum_c", "grain_ns",
          "source").orderBy("host", "bucket_ts").collect()
      assert(rows.nonEmpty)
      val g = rows.map(_.getAs[Long]("grain_ns")).distinct match {
        case Array(one) => one
        case gs => fail(s"mixed grains served: ${gs.toSeq}")
      }
      val (lo, hi) = widen(since, until, g)
      // the budget binds the TIME axis (per series), not rows × keys
      assert((hi - lo) / g <= mp, s"budget violated: $since $until $mp $g")
      val got = rows.map(r => (r.getAs[String]("host"),
        r.getAs[Long]("bucket_ts"), r.getAs[Long]("n"),
        r.getAs[java.math.BigDecimal]("sum_c").doubleValue())).toSeq
      assert(got == directKeyed(g, lo, hi),
        s"probe ($since, $until, $mp): grain=$g")
    }
    // KEY PUSHDOWN sweep: the filtered route ("one series, zoomed") must
    // equal the per-series slice of the never-tiered truth at every
    // probe shape — store-served, stitched, and raw-served budgets alike
    val rnd2 = new scala.util.Random(41)
    for ((since, until, mp) <- probes(rnd2, Seq(2 * Day)).take(12)) {
      val df = RollupStore.route(spark, stP, rawNow, since, until, mp,
        keyFilter = Some(col("host") === "db"))
      val rows = df.select("host", "bucket_ts", "n", "sum_c", "grain_ns")
        .orderBy("bucket_ts").collect()
      // the grain choice is filter-independent (range/budget/horizon
      // arithmetic over the unfiltered store) — derive the expected
      // grain from the unfiltered route so an EMPTY filtered slice
      // (a window where this series has no samples) still verifies
      val gExp = RollupStore.route(spark, stP, rawNow, since, until, mp)
        .select("grain_ns").head().getLong(0)
      rows.map(_.getAs[Long]("grain_ns")).distinct.foreach(g =>
        assert(g == gExp, s"filter changed the grain: $g vs $gExp"))
      val (lo, hi) = widen(since, until, gExp)
      val got = rows.map(r => (r.getAs[String]("host"),
        r.getAs[Long]("bucket_ts"), r.getAs[Long]("n"),
        r.getAs[java.math.BigDecimal]("sum_c").doubleValue())).toSeq
      assert(got == directKeyed(gExp, lo, hi).filter(_._1 == "db"),
        s"filtered probe ($since, $until, $mp): grain=$gExp")
    }
  }
}
