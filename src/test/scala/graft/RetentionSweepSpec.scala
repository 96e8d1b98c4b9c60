package graft

import graft.storage.RollupStore
import graft.storage.RollupStore.TierSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property sweep over the declarative retention lifecycle: a
  * SEEDED-random interleaving of ingest batches and [[RollupStore
  * .applyRetention]] cycles (some cycles double-run — the crashed-cron
  * retry the deterministic tier keys must absorb), asserting after
  * EVERY cycle that the stitched cascade read still equals the direct
  * daily aggregate of everything ever ingested. Example-based specs pin
  * each move in isolation; this sweep exercises the lifecycle the way a
  * deployment runs it — clock advancing unevenly, data arriving between
  * cycles, tiers appearing as data ages into them — where a cutoff
  * bookkeeping bug would surface as a one-bucket discrepancy several
  * cycles in. Ingested timestamps stay at-or-after the finest horizon
  * (the out-of-order-beyond-retention write a TSDB rejects at ingest;
  * below-horizon stragglers are deliberately invisible to stitched
  * reads, so admitting them would test a non-contract).
  */
class RetentionSweepSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val S = 1000000000L
  private val H = 3600L * S
  private val Day = 86400L * S

  private def directDaily(rows: Seq[(Long, Double)]): Seq[(Long, Long, Double)] =
    rows.toDF("ts", "value")
      .groupBy(expr(graft.operators.TsOps.floorBucketSql("ts", Day))
        .as("bucket_ts"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("sum_c"))
      .orderBy("bucket_ts").collect()
      .map(r => (r.getAs[Long]("bucket_ts"), r.getAs[Long]("n"),
        r.getAs[java.math.BigDecimal]("sum_c").doubleValue())).toSeq

  private def stitchedDaily(rawP: String, stores: Seq[String])
      : Seq[(Long, Long, Double)] =
    RollupStore.cascadeRollup(spark, rawP, stores, Day)
      .select("bucket_ts", "n", "sum_c").orderBy("bucket_ts").collect()
      .map(r => (r.getAs[Long]("bucket_ts"), r.getAs[Long]("n"),
        r.getAs[java.math.BigDecimal]("sum_c").doubleValue())).toSeq

  test("random ingest/cycle interleaving with double-run cycles keeps " +
      "the cascade read exact after every cycle") {
    val rnd = new scala.util.Random(17)
    val base = SparkTestBase.tempDir("graft-retsweep")
    val rawP = new java.io.File(base, "raw").getPath
    val stH = new java.io.File(base, "st_h").getPath
    val stD = new java.io.File(base, "st_d").getPath
    // keep 2 days raw, 6 days hourly, daily forever
    val tiers = Seq(TierSpec(stH, H, keepNanos = 6 * Day),
      TierSpec(stD, Day))
    var all = Vector.empty[(Long, Double)]
    var now = 10L * Day
    var finestCutoff = 0L
    for (step <- 0 until 6) {
      // a batch of samples between the finest horizon and now — late
      // data allowed back to exactly the retention boundary
      val batch = (0 until 30).map { _ =>
        val ts = finestCutoff + (rnd.nextDouble() *
          (now - finestCutoff)).toLong / S * S + rnd.nextInt(1000)
        (ts, math.rint(rnd.nextDouble() * 10000) / 100.0)
      }
      batch.toDF("ts", "value").write.mode("append").parquet(rawP)
      all ++= batch
      // clock advances unevenly: 6 hours to 2.5 days per cycle
      now += (6L + rnd.nextInt(55)) * H
      val cuts = RollupStore.applyRetention(spark, rawP,
        rawKeepNanos = 2 * Day, tiers, now)
      if (rnd.nextBoolean()) // the crashed-cron double run: same clock,
        // same cutoffs — the deterministic tier keys must absorb it
        RollupStore.applyRetention(spark, rawP, rawKeepNanos = 2 * Day,
          tiers, now)
      finestCutoff = math.max(finestCutoff, cuts.head._2)
      assert(stitchedDaily(rawP, Seq(stH, stD)) == directDaily(all),
        s"step $step (now=$now, cuts=$cuts): stitched read diverged " +
          "from the never-tiered truth")
    }
    // end state sanity: data really did move down the cascade
    assert(spark.read.parquet(stD).count() > 0, "nothing aged to daily")
    assert(spark.read.parquet(rawP).agg(min("ts")).head().getLong(0) >=
      finestCutoff)
  }

  test("KEYED lifecycle: the same random sweep with a series dimension " +
      "stays exact per key through every cycle and double-run") {
    val rnd = new scala.util.Random(23)
    val base = SparkTestBase.tempDir("graft-retsweepk")
    val rawP = new java.io.File(base, "raw").getPath
    val stH = new java.io.File(base, "st_h").getPath
    val stD = new java.io.File(base, "st_d").getPath
    val tiers = Seq(TierSpec(stH, H, keepNanos = 6 * Day),
      TierSpec(stD, Day))
    val hosts = Seq("web", "db", "cache")
    def directKeyed(rows: Seq[(Long, Double, String)])
        : Seq[(String, Long, Long, Double)] =
      rows.toDF("ts", "value", "host")
        .groupBy(col("host"),
          expr(graft.operators.TsOps.floorBucketSql("ts", Day))
            .as("bucket_ts"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).as("sum_c"))
        .orderBy("host", "bucket_ts").collect()
        .map(r => (r.getAs[String]("host"), r.getAs[Long]("bucket_ts"),
          r.getAs[Long]("n"),
          r.getAs[java.math.BigDecimal]("sum_c").doubleValue())).toSeq
    def stitchedKeyed(): Seq[(String, Long, Long, Double)] =
      RollupStore.cascadeRollup(spark, rawP, Seq(stH, stD), Day)
        .select("host", "bucket_ts", "n", "sum_c")
        .orderBy("host", "bucket_ts").collect()
        .map(r => (r.getAs[String]("host"), r.getAs[Long]("bucket_ts"),
          r.getAs[Long]("n"),
          r.getAs[java.math.BigDecimal]("sum_c").doubleValue())).toSeq
    var all = Vector.empty[(Long, Double, String)]
    var now = 10L * Day
    var finestCutoff = 0L
    for (step <- 0 until 5) {
      val batch = (0 until 30).map { _ =>
        val ts = finestCutoff + (rnd.nextDouble() *
          (now - finestCutoff)).toLong / S * S + rnd.nextInt(1000)
        (ts, math.rint(rnd.nextDouble() * 10000) / 100.0,
          hosts(rnd.nextInt(hosts.size)))
      }
      batch.toDF("ts", "value", "host").write.mode("append").parquet(rawP)
      all ++= batch
      now += (6L + rnd.nextInt(55)) * H
      val cuts = RollupStore.applyRetention(spark, rawP,
        rawKeepNanos = 2 * Day, tiers, now, keyCols = Seq("host"))
      if (rnd.nextBoolean())
        RollupStore.applyRetention(spark, rawP, rawKeepNanos = 2 * Day,
          tiers, now, keyCols = Seq("host"))
      finestCutoff = math.max(finestCutoff, cuts.head._2)
      assert(stitchedKeyed() == directKeyed(all),
        s"step $step (now=$now, cuts=$cuts): keyed stitched read " +
          "diverged from the never-tiered truth")
    }
    // the dimension survived the full cascade: the daily tier holds
    // every host that aged into it, keyed per row
    assert(spark.read.parquet(stD).select("host").distinct().count() > 1,
      "nothing keyed aged to daily")
  }
}
