package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.model.TimeNano
import graft.operators.TsOps
import graft.pipeline.{Dedup, Multimodal, Similarity, Text}
import graft.ql.Engine
import graft.storage.Tables

/** Driver contract — one `queries` entry per implemented operator
  * (SURVEY.md §2 + the pipeline extensions), each with a DuckDB oracle where
  * SQL can express it. Every query ends in a total-order `ORDER BY` mirrored
  * in the oracle so result hashing is deterministic.
  */
object SparkEntry {

  /** Per-process discriminator + per-dataset cache for the stored scratch
    * indexes — knn_ivf_stored (key = dataset dir) and knn_ivfpq_stored
    * (key = dir + "#pq") — one write per process per dataset, no
    * cross-process path sharing. */
  private lazy val processId: String =
    java.util.UUID.randomUUID().toString.take(8)
  private val ivfStorePaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  /** Per-dataset cache for the stream-maintained IVF index (base write +
    * one streaming ingest per process per dataset). */
  private val streamIvfPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  /** Per-dataset cache for the at-rest near-dup index (one write per
    * process per dataset; probes reuse it). */
  private val nearDupIndexPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  /** Per-dataset cache for the at-rest BM25 index (one corpus tokenize
    * pass per process per dataset; stored probes reuse it). */
  private val bm25IndexPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  /** Per-dataset cache for the at-rest trained models (BPE tokenizer,
    * n-gram LM — key = dir + "#tok" / "#lm"): one training pass per
    * process per dataset; stored probes reuse the artifact. */
  private val modelStorePaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Collision-free dataset-dir discriminator for scratch paths/table names
    * (32-bit hashCode collisions are easy to hit across many dirs). */
  private def dirTag(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString

  /** Per-dataset cache of the bucketed orders/customer catalog tables
    * backing `join_bucketed` (one bucketed write per process per dataset;
    * files go to scratch via the external-path form of
    * [[graft.storage.Tables.writeBucketed]]). Returns the table names. */
  private val bucketedTables =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  private def bucketedOrdersCustomer(s: SparkSession, d: String): (String, String) =
    bucketedTables.computeIfAbsent(d, dir => {
      val tag = s"${processId}_${dirTag(dir)}"
      val base = new java.io.File(sys.props("java.io.tmpdir"), s"graft-bkt-$tag")
      val ot = s"graft_bkt_orders_$tag"
      val ct = s"graft_bkt_customer_$tag"
      Tables.writeBucketed(t(s, dir, "orders"), ot, Seq("o_custkey"), 16,
        Seq("o_custkey"), Some(new java.io.File(base, "orders").getPath))
      Tables.writeBucketed(t(s, dir, "customer"), ct, Seq("c_custkey"), 16,
        Seq("c_custkey"), Some(new java.io.File(base, "customer").getPath))
      (ot, ct)
    })

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(spark, dir, name)

  /** Per-dataset cache of the z-ordered events copy backing `zorder_scan`
    * (one clustered write per process per dataset; scans reuse it). */
  private val zOrderPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Per-dataset cache of the persisted boilerplate span index backing
    * `text_remove_boilerplate_stored` (one write per process per dataset). */
  private val boilerIdxPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def zOrderedEvents(s: SparkSession, d: String): String =
    zOrderPaths.computeIfAbsent(d, dir => {
      val path = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-zord-${processId}_${dirTag(dir)}/events").getPath
      graft.storage.ZOrder.write(t(s, dir, "events"), path,
        Seq("user_id", "ts"), numFiles = 16)
      path
    })

  /** Per-dataset cache of the at-rest 1h rollup store backing
    * `rollup_store_daily` (one base write per process per dataset; coarser
    * rollups read the store, never the raw table). */
  private val rollupStorePaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Per-dataset cache of the at-rest dup-gram index backing
    * `text_dup_spans_stored` and the streaming dup-span twins (one
    * mine+publish per process per dataset). */
  private val dupGramIndexPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def dupGramIdx(s: SparkSession, d: String): String =
    dupGramIndexPaths.computeIfAbsent(d, dir => {
      val p = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-dupgram-$processId-${dirTag(dir)}").getPath
      Text.writeDupGramIndex(t(s, dir, "documents"), p, "doc_id",
        "text", k = 8)
      p
    })

  /** Per-dataset cache of the INCREMENTALLY-built maintenance index
    * backing `text_dup_index_incr` (base + replayed increment +
    * compaction). */
  private val dupIncrIndexPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Per-dataset cache of the hourly counter-increase LIFECYCLE store
    * backing `rollup_counter_store`: base write + batch-keyed append +
    * that append replayed (the at-least-once path) + compaction. The
    * increase rows come from ONE counterIncrease pass — the producer owns
    * the cross-slice lag — and split by bucket across the appends. */
  private val counterStorePaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def counterStore1h(s: SparkSession, d: String): String =
    counterStorePaths.computeIfAbsent(d, dir => {
      val p = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-ctr-$processId-${dirTag(dir)}/store").getPath
      val hourNs = 3600L * 1000000000L
      val inc = TsOps.counterIncrease(
        tsUs(t(s, dir, "events"))
          .select("user_id", "ts", "event_id", "value"),
        Seq("user_id"), hourNs)
      val split = ns("2024-01-15") / hourNs
      graft.storage.CounterStore.write(
        inc.filter(col("bucket") < split), p, hourNs)
      graft.storage.CounterStore.append(
        inc.filter(col("bucket") >= split), p, "b#1", hourNs)
      graft.storage.CounterStore.append( // at-least-once redelivery
        inc.filter(col("bucket") >= split), p, "b#1", hourNs)
      graft.storage.CounterStore.compact(s, p)
      p
    })

  /** Per-dataset cache of the AQP sample-tier LIFECYCLE store backing
    * `aqp_*`: base build (first half-month) + batch-keyed append (the
    * rest) + that append replayed (at-least-once redelivery) +
    * compaction — estimates must see each sampled row exactly once
    * through the whole lifecycle. */
  private val aqpStorePaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def aqpStorePath(s: SparkSession, d: String): String =
    aqpStorePaths.computeIfAbsent(d, dir => {
      val p = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-aqp-$processId-${dirTag(dir)}/store").getPath
      val ev = t(s, dir, "events")
      val split = ns("2024-01-16")
      // bits = 5 → rate 1/32: deliberately NOT a power of 16, pinning
      // the bit-level ladder (the old hex-char ladder could only jump
      // 1/16 → 1/256) through the whole lifecycle + oracle mirror
      graft.storage.SampleStore.build(
        ev.filter(col("ts") < split), p, idCol = "event_id", bits = 5)
      graft.storage.SampleStore.append(
        ev.filter(col("ts") >= split), p, "b#1", idCol = "event_id",
        bits = 5)
      graft.storage.SampleStore.append( // at-least-once redelivery
        ev.filter(col("ts") >= split), p, "b#1", idCol = "event_id",
        bits = 5)
      graft.storage.SampleStore.compact(s, p)
      p
    })

  /** Per-dataset cache of the STRATIFIED sample store backing
    * `aqp_stratified`/`aqp_quantiles`: exponential value-band strata, so
    * per-stratum rates genuinely differ (rare bands keep all rows). */
  private def aqpStratifiedPath(s: SparkSession, d: String): String =
    modelStorePaths.computeIfAbsent(d + "#aqps", _ => {
      val sp = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-aqps-$processId-${dirTag(d)}").getPath
      val ev = t(s, d, "events")
        .withColumn("band", expr("cast(floor(value / 100) as long)"))
      graft.storage.SampleStore.buildStratified(ev, sp,
        idCol = "event_id", stratumCol = "band", minRows = 50L,
        maxBits = 8)
      sp
    })

  /** Per-dataset cache of the TIERED counter layout backing
    * `rollup_counter_tiered`: its own fine store (tierOff trims it) plus
    * the daily coarse tier, the tier cycle run twice to prove the
    * deterministic-key retry collapses. */
  private val counterTierPathsMap =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  private def counterTierPaths(s: SparkSession, d: String)
      : (String, String) =
    counterTierPathsMap.computeIfAbsent(d, dir => {
      val root = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-ctrt-$processId-${dirTag(dir)}")
      val fineP = new java.io.File(root, "fine").getPath
      val coarseP = new java.io.File(root, "coarse").getPath
      val hourNs = 3600L * 1000000000L
      val inc = TsOps.counterIncrease(
        tsUs(t(s, dir, "events"))
          .select("user_id", "ts", "event_id", "value"),
        Seq("user_id"), hourNs)
      graft.storage.CounterStore.write(inc, fineP, hourNs)
      graft.storage.CounterStore.tierOff(s, fineP, coarseP,
        cutoff = ns("2024-01-10"), factor = 24L)
      graft.storage.CounterStore.tierOff(s, fineP, coarseP, // retry
        cutoff = ns("2024-01-10"), factor = 24L)
      (fineP, coarseP)
    })

  /** Per-dataset cache of the KEYED (dimensional) 1h rollup store backing
    * `rollup_keyed_*`: one tree holding every event_type series, keyed per
    * row — the shape a 100 TB store with millions of series needs (one
    * tree per series would be a file-listing catastrophe). */
  private val keyedStorePaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def keyedStore1h(s: SparkSession, d: String): String =
    keyedStorePaths.computeIfAbsent(d, dir => {
      val path = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-rollk-${processId}_${dirTag(dir)}/events-1h").getPath
      graft.storage.RollupStore.write(t(s, dir, "events"), path,
        bucketNanos = BucketH, distinctCol = Some("user_id"),
        histBoundsCents = HistBounds, keyCols = Seq("event_type"))
      path
    })

  /** Per-dataset cache of the KEYED tiered layout backing
    * `rollup_keyed_tiered`: raw events copied to scratch, pre-cutoff
    * samples tiered into the keyed 1h store — retention with the series
    * dimension intact. */
  private val keyedTierPaths =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  private def keyedTieredEvents(s: SparkSession, d: String)
      : (String, String) =
    keyedTierPaths.computeIfAbsent(d, dir => {
      val base = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-tierk-${processId}_${dirTag(dir)}")
      val rawP = new java.io.File(base, "raw").getPath
      val stP = new java.io.File(base, "store").getPath
      t(s, dir, "events").write.mode("overwrite").parquet(rawP)
      graft.storage.RollupStore.tierOff(s, rawP, stP,
        cutoff = ns("2024-01-15"), bucketNanos = BucketH,
        distinctCol = Some("user_id"), keyCols = Seq("event_type"))
      (rawP, stP)
    })

  /** Per-dataset cache of the KEYED three-tier retention cascade backing
    * `rollup_keyed_cascade`: a clock-driven `applyRetention` policy over
    * a keyed raw table — the dimension must survive raw→1h→1d intact. */
  private val keyedCascadePaths =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String, String)]()

  private def keyedCascadeEvents(s: SparkSession, d: String)
      : (String, String, String) =
    keyedCascadePaths.computeIfAbsent(d, dir => {
      val base = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-casck-${processId}_${dirTag(dir)}")
      val rawP = new java.io.File(base, "raw").getPath
      val stH = new java.io.File(base, "st-1h").getPath
      val stD = new java.io.File(base, "st-1d").getPath
      val day = 86400L * 1000000000L
      t(s, dir, "events").write.mode("overwrite").parquet(rawP)
      graft.storage.RollupStore.applyRetention(s, rawP,
        rawKeepNanos = 5 * day,
        Seq(graft.storage.RollupStore.TierSpec(stH, BucketH,
            keepNanos = 15 * day),
          graft.storage.RollupStore.TierSpec(stD, day)),
        nowNs = ns("2024-01-30"), keyCols = Seq("event_type"))
      (rawP, stH, stD)
    })

  /** Per-dataset cache of the VARIANCE-dimension tiered layout backing
    * `rollup_store_stddev`: a keyed 1h store written withVariance, half
    * the month tiered off — so the gate proves (n, sum, sumsq) survive
    * tiering and stitch to the direct pass exactly. */
  private val varianceTierPathsMap =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  private def varianceTieredEvents(s: SparkSession, d: String)
      : (String, String) =
    varianceTierPathsMap.computeIfAbsent(d, dir => {
      val base = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-vartier-${processId}_${dirTag(dir)}")
      val rawP = new java.io.File(base, "raw").getPath
      val stP = new java.io.File(base, "store").getPath
      t(s, dir, "events").write.mode("overwrite").parquet(rawP)
      graft.storage.RollupStore.tierOff(s, rawP, stP,
        cutoff = ns("2024-01-15"), bucketNanos = BucketH,
        keyCols = Seq("event_type"), withVariance = true)
      (rawP, stP)
    })

  /** Per-dataset cache of the TIERED events copy backing
    * `rollup_tiered_scan`: raw events copied to scratch, then samples
    * before the cutoff tiered off into a 1h rollup store (one tiering per
    * process per dataset). */
  private val tieredPaths =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  private def tieredEvents(s: SparkSession, d: String): (String, String) =
    tieredPaths.computeIfAbsent(d, dir => {
      val base = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-tier-${processId}_${dirTag(dir)}")
      val rawP = new java.io.File(base, "raw").getPath
      val stP = new java.io.File(base, "store").getPath
      // overwrite: a failed prior attempt must rebuild, not die on
      // "path already exists" forever after
      t(s, dir, "events").write.mode("overwrite").parquet(rawP)
      graft.storage.RollupStore.tierOff(s, rawP, stP,
        cutoff = ns("2024-01-15"), bucketNanos = BucketH,
        distinctCol = Some("user_id"), histBoundsCents = HistBounds)
      (rawP, stP)
    })

  /** Per-dataset cache of the three-tier CASCADE layout backing
    * `rollup_cascade_*`: raw events → 1h store (days before Jan 20) →
    * 1d store (days before Jan 10), with the 1h store compacted after
    * the cascade so the gate also proves the tier horizon survives
    * compaction's batch-key rewrite. */
  private val cascadePaths =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String, String)]()

  /** Per-dataset cache of the POLICY-driven retention layout backing
    * `rollup_retention_scan`: the events table arrives in two waves with
    * a declarative `applyRetention` cycle after each (clock injected), so
    * the layout is whatever "keep 5 days raw, hourly for 10, daily
    * forever" produces after two maintenance runs — not hand-placed
    * cutoffs. */
  private val retentionPaths =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String, String)]()

  private def retentionEvents(s: SparkSession, d: String)
      : (String, String, String) =
    retentionPaths.computeIfAbsent(d, dir => {
      val base = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-retain-${processId}_${dirTag(dir)}")
      val rawP = new java.io.File(base, "raw").getPath
      val stH = new java.io.File(base, "st-1h").getPath
      val stD = new java.io.File(base, "st-1d").getPath
      val ev = t(s, dir, "events")
      val day = 86400L * 1000000000L
      val tiers = Seq(
        graft.storage.RollupStore.TierSpec(stH, BucketH,
          keepNanos = 10 * day),
        graft.storage.RollupStore.TierSpec(stD, day))
      def cycle(nowNs: Long): Unit =
        graft.storage.RollupStore.applyRetention(s, rawP,
          rawKeepNanos = 5 * day, tiers, nowNs,
          distinctCol = Some("user_id"), histBoundsCents = HistBounds)
      ev.filter(col("ts") < ns("2024-01-22")).write.mode("overwrite")
        .parquet(rawP)
      cycle(ns("2024-01-20"))
      ev.filter(col("ts") >= ns("2024-01-22")).write.mode("append")
        .parquet(rawP)
      cycle(ns("2024-01-30"))
      (rawP, stH, stD)
    })

  /** Per-dataset cache of the RAW-LESS mirror cascade backing
    * `rollup_route_mirror`: a 1h store kept as a complete mirror (base
    * write + a replay-keyed append, exactly the state `rollupIngest`
    * leaves), with days before Jan 10 aged into a 1d store. */
  private val mirrorPaths =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  private def mirrorCascadeEvents(s: SparkSession, d: String)
      : (String, String) =
    mirrorPaths.computeIfAbsent(d, dir => {
      val base = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-mirror-${processId}_${dirTag(dir)}")
      val stH = new java.io.File(base, "st-1h").getPath
      val stD = new java.io.File(base, "st-1d").getPath
      val ev = t(s, dir, "events")
      graft.storage.RollupStore.write(
        ev.filter(col("ts") < ns("2024-01-25")), stH, BucketH)
      graft.storage.RollupStore.append(
        ev.filter(col("ts") >= ns("2024-01-25")), stH, "ab12#1", BucketH)
      graft.storage.RollupStore.tierOffStore(s, stH, stD,
        cutoff = ns("2024-01-10"),
        coarseBucketNanos = 86400L * 1000000000L)
      (stH, stD)
    })

  /** Per-dataset cache of the POLICY-driven mirror cascade backing
    * `rollup_retention_mirror`: the 1h mirror fills in two waves with an
    * `applyStoreRetention` cycle after each (clock injected) — "1h for 5
    * days, daily forever" with no raw table at all. */
  private val mirrorRetainPaths =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  private def mirrorRetentionEvents(s: SparkSession, d: String)
      : (String, String) =
    mirrorRetainPaths.computeIfAbsent(d, dir => {
      val base = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-mretain-${processId}_${dirTag(dir)}")
      val stH = new java.io.File(base, "st-1h").getPath
      val stD = new java.io.File(base, "st-1d").getPath
      val ev = t(s, dir, "events")
      val day = 86400L * 1000000000L
      val tiers = Seq(
        graft.storage.RollupStore.TierSpec(stH, BucketH,
          keepNanos = 5 * day),
        graft.storage.RollupStore.TierSpec(stD, day))
      graft.storage.RollupStore.write(
        ev.filter(col("ts") < ns("2024-01-22")), stH, BucketH)
      graft.storage.RollupStore.applyStoreRetention(s, tiers,
        nowNs = ns("2024-01-20"))
      graft.storage.RollupStore.append(
        ev.filter(col("ts") >= ns("2024-01-22")), stH, "ab12#2", BucketH)
      graft.storage.RollupStore.applyStoreRetention(s, tiers,
        nowNs = ns("2024-01-30"), compactStores = true)
      (stH, stD)
    })

  /** Per-dataset cache of the RETAINED dialect metrics db backing
    * `ql_retained_metrics` / `rollup_metrics_history`: the events table
    * written in the WritableStore `__day=` block layout inside a scratch
    * db, then aged by `applyRetention` ("10 days raw, hourly history") —
    * the history store lives OUTSIDE the db so `.metrics` listings stay
    * clean. Cutoff lands on 2024-01-15 (now Jan 25, keep 10d). */
  private val retainDbPaths =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  private def retainedMetricsDb(s: SparkSession, d: String)
      : (String, String) =
    retainDbPaths.computeIfAbsent(d, dir => {
      val base = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-qlret-${processId}_${dirTag(dir)}")
      val db = new java.io.File(base, "db").getPath
      val rawP = new java.io.File(db, "events").getPath
      val stH = new java.io.File(base, "hist-1h").getPath
      val day = 86400L * 1000000000L
      t(s, dir, "events")
        .withColumn(graft.storage.WritableStore.PartitionCol,
          date_from_unix_date(expr(
            "(ts - pmod(ts, 86400000000000L)) div 86400000000000L")
            .cast("int")).cast("string"))
        .write.partitionBy(graft.storage.WritableStore.PartitionCol)
        .parquet(rawP)
      graft.storage.RollupStore.applyRetention(s, rawP,
        rawKeepNanos = 10 * day,
        Seq(graft.storage.RollupStore.TierSpec(stH, BucketH)),
        nowNs = ns("2024-01-25"))
      (db, stH)
    })

  private def cascadeEvents(s: SparkSession, d: String)
      : (String, String, String) =
    cascadePaths.computeIfAbsent(d, dir => {
      val base = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-cascade-${processId}_${dirTag(dir)}")
      val rawP = new java.io.File(base, "raw").getPath
      val stH = new java.io.File(base, "st-1h").getPath
      val stD = new java.io.File(base, "st-1d").getPath
      t(s, dir, "events").write.mode("overwrite").parquet(rawP)
      graft.storage.RollupStore.tierOff(s, rawP, stH,
        cutoff = ns("2024-01-20"), bucketNanos = BucketH,
        distinctCol = Some("user_id"), histBoundsCents = HistBounds)
      graft.storage.RollupStore.tierOffStore(s, stH, stD,
        cutoff = ns("2024-01-10"),
        coarseBucketNanos = 86400L * 1000000000L)
      graft.storage.RollupStore.compact(s, stH)
      (rawP, stH, stD)
    })

  private def rollupStore1h(s: SparkSession, d: String): String =
    rollupStorePaths.computeIfAbsent(d, dir => {
      val path = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-roll-${processId}_${dirTag(dir)}/events-1h").getPath
      graft.storage.RollupStore.write(t(s, dir, "events"), path,
        bucketNanos = BucketH, distinctCol = Some("user_id"),
        histBoundsCents = HistBounds)
      path
    })

  /** Epoch nanos of a UTC date/datetime literal (plan-time constant). */
  private def ns(s: String): Long =
    TimeNano.toNanos(TimeNano.parseNaive(s), java.time.ZoneOffset.UTC)

  /** Exact decimal-backed sum rendered as double — bit-identical between
    * Spark and DuckDB regardless of summation order. */
  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,2)")).cast("double")

  /** The stratified sample tier's bits ladder (minRows = 50, maxBits = 8)
    * as DuckDB SQL — the largest b with count ≥ 50·2^b, the exact mirror
    * of [[graft.storage.SampleStore]]'s integer CASE. */
  private val DuckBitsLadder: String =
    "CASE " + (8 to 1 by -1).map(b =>
      s"WHEN count(*) >= 50 * ${1L << b} THEN $b ").mkString +
      "ELSE 0 END"

  /** Shared builder of the grouping-set revenue queries — one body for
    * ROLLUP and CUBE so the shape (casts, markers, joins) cannot drift
    * one-sided; `prefix` keeps the temp-view names per-query. */
  private def groupingSetRevenue(sets: String, prefix: String)
      : (SparkSession, String) => DataFrame = (s, d) => {
    t(s, d, "orders").createOrReplaceTempView(s"${prefix}_orders")
    t(s, d, "customer").createOrReplaceTempView(s"${prefix}_customer")
    t(s, d, "nation").createOrReplaceTempView(s"${prefix}_nation")
    s.sql(s"""
      SELECT coalesce(n_name, 'ALL') AS n_name,
             coalesce(c_mktsegment, 'ALL') AS c_mktsegment,
             count(*) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
      FROM ${prefix}_orders
      JOIN ${prefix}_customer ON o_custkey = c_custkey
      JOIN ${prefix}_nation ON c_nationkey = n_nationkey
      GROUP BY $sets(n_name, c_mktsegment)
      ORDER BY n_name, c_mktsegment""")
  }

  /** Integer cents of a 2-decimal-generated price column, and discount
    * percent as an integer — the exact units for revenue products
    * (`cents × (100 − disc100)`): decimal casts of double PRODUCTS
    * round-tie differently across engines, raw 2-decimal values don't. */
  private def epCents =
    (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
  private def disc100 =
    (col("l_discount").cast("decimal(18,2)") * 100).cast("long")

  private def engine(spark: SparkSession, dir: String) = new Engine(spark, dir)

  /** Deterministic clustered vector fixture for the ANN recall gates: `n`
    * vectors in `nCenters` tight clusters around real embedding rows, with
    * per-(row, dim) seeded hash noise — genuine locality, identical on every
    * run. (The raw embeddings are near-orthogonal; no ANN method recalls
    * neighbors that aren't local, so gates measure on clusterable data, the
    * case the operator exists for.) */
  private def clusteredVecs(s: SparkSession, d: String, n: Int, nCenters: Int,
      noise: Float): DataFrame = {
    val centers = t(s, d, "embeddings")
      .filter(col("vec_id") < nCenters).orderBy("vec_id")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val gen = udf((i: Long) => {
      val c = centers((i % nCenters).toInt)
      val out = new Array[Float](c.length)
      var dim = 0
      while (dim < c.length) {
        val h = scala.util.hashing.MurmurHash3.productHash((i, dim, 4242))
        out(dim) = c(dim) +
          noise * ((h & 0xffffff).toFloat / 0x1000000.toFloat - 0.5f)
        dim += 1
      }
      out
    })
    s.range(n).select(col("id").as("vec_id"), gen(col("id")).as("embedding"))
  }

  /** Truncate the ns `ts` column to µs resolution (×1000 scale kept) for
    * oracle-facing outputs: DuckDB 1.0 reads parquet `timestamp[ns]` as µs
    * TIMESTAMP, so the oracle can only see µs. Engine internals stay ns
    * (ns fidelity is covered by the ScalaTest roundtrips). */
  private def tsUs(df: DataFrame): DataFrame =
    df.withColumn("ts", col("ts") - pmod(col("ts"), lit(1000L)))

  /** Streaming scan of the raw events table with `ts` normalized to
    * epoch-nano longs — the streaming twin of [[Tables.read]]'s
    * normalization. The file source must be given the RAW physical schema
    * (`timestamp[us]`, surfacing as TimestampType under
    * [[Tables.configure]]): handing it the normalized LongType schema would
    * make the parquet reader emit the raw int64 MICROS as longs — every
    * ns-based window/filter downstream silently 1000× off. */
  private def eventStream(s: SparkSession, d: String): DataFrame = {
    Tables.configure(s)
    val raw = s.read.option("pathGlobFilter", "events.parquet").parquet(d)
    Tables.normalizeTs(s.readStream.schema(raw.schema)
      .option("pathGlobFilter", "events.parquet").parquet(d))
  }

  /** Drive a streaming frame to completion (AvailableNow) into a memory
    * sink and return the materialized table. A timeout means the table is
    * PARTIAL: stop the query (else the next run's identical queryName
    * throws) and fail loudly rather than hand an incomplete result to the
    * oracle compare. */
  private def runStreamToTable(s: SparkSession, df: DataFrame,
      name: String, mode: String = "append",
      singleBatch: Boolean = false): DataFrame = {
    // singleBatch (Trigger.Once) is for operators whose batch-oracle
    // equivalence depends on ALL input arriving in one micro-batch
    // (e.g. the user-day ledger's cohort pinning) — AvailableNow may
    // split a multi-file source and silently break that precondition
    val q = df.writeStream.outputMode(mode)
      .format("memory").queryName(name)
      .trigger(
        if (singleBatch) org.apache.spark.sql.streaming.Trigger.Once()
        else org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    if (!q.awaitTermination(300000)) {
      q.stop()
      throw new IllegalStateException(s"streaming query did not finish: $name")
    }
    s.table(name)
  }

  /** Flagship: dialect query end-to-end on sf0.001 (SURVEY §7.3). */
  def entry(spark: SparkSession): DataFrame = {
    val e = engine(spark, "/root/testdata/sf0.001")
    e.frame(
      "with cols = [eid, uid, etype, val, props], tz = +9 " +
        "select eid, etype, val from events where ts in ('2024-01-05', '2024-01-20');")
  }

  // ---- reference-surface queries (dialect goes through parser+planner) ----

  private val qlQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_scan_project" -> ((s, d) =>
      t(s, d, "events").select("event_id", "value").orderBy("event_id")),
    "ql_range" -> ((s, d) =>
      tsUs(engine(s, d)
        .frame("select * from events where ts in ('2024-01-10', '2024-01-12')"))
        .orderBy("ts", "event_id")),
    "ql_eq_day" -> ((s, d) =>
      tsUs(engine(s, d)
        .frame("select * from events where ts = '2024-01-15'"))
        .orderBy("ts", "event_id")),
    "ql_gt_delta" -> ((s, d) =>
      tsUs(engine(s, d)
        .frame("select * from events where ts > '2024-01-28' -12 hours"))
        .orderBy("ts", "event_id")),
    "ql_head_limit" -> ((s, d) =>
      tsUs(engine(s, d)
        .frame("select * from events where ts >=|50 '2024-01-10'"))
        .orderBy("ts", "event_id")),
    "ql_tail_limit" -> ((s, d) =>
      tsUs(engine(s, d)
        .frame("select * from events where ts <=|50 '2024-01-20'"))
        .orderBy("ts", "event_id")),
    "ql_tz_offset" -> ((s, d) =>
      tsUs(engine(s, d)
        .frame("with tz = +9 select * from events where ts in ('2024-01-10', '2024-01-11')"))
        .orderBy("ts", "event_id")),
    "ql_projection" -> ((s, d) =>
      tsUs(engine(s, d)
        .frame("with cols = [eid, uid, etype, val, props] " +
          "select eid, val from events where ts in ('2024-01-10', +2 days)"))
        .orderBy("ts", "eid")),
    "ts_format_ns" -> ((s, d) =>
      tsUs(t(s, d, "events").select("event_id", "ts"))
        .select(col("event_id"),
          graft.functions.FormatNanos.format_ns(col("ts")).as("iso"))
        .orderBy("event_id")),
    "meta_metrics" -> ((s, d) => Tables.metricsDf(s, d)),
    "meta_describe_events" -> ((s, d) =>
      // updated_at (file mtime) is engine surface but not oracle-stable
      Tables.describeDf(s, d, Some("events")).drop("updated_at")
        .withColumn("from_ts", col("from_ts") - pmod(col("from_ts"), lit(1000L)))
        .withColumn("end_ts", col("end_ts") - pmod(col("end_ts"), lit(1000L))))
  )

  private def qlOracles: Map[String, String] = {
    def evSql(since: Long, until: Long, extra: String = ""): String =
      s"SELECT epoch_ns(ts) AS ts, event_id, user_id, event_type, value, props " +
        s"FROM events WHERE epoch_ns(ts) >= $since AND epoch_ns(ts) < $until " +
        s"$extra ORDER BY ts, event_id"
    Map(
      "ts_scan_project" ->
        "SELECT event_id, value FROM events ORDER BY event_id",
      "ql_range" -> evSql(ns("2024-01-10"), ns("2024-01-12")),
      "ql_eq_day" -> evSql(ns("2024-01-15"), ns("2024-01-16")),
      "ql_gt_delta" ->
        (s"SELECT epoch_ns(ts) AS ts, event_id, user_id, event_type, value, props " +
          s"FROM events WHERE epoch_ns(ts) >= ${ns("2024-01-27 12:00") + 1} " +
          "ORDER BY ts, event_id"),
      // the retained-metrics db trims only below the Jan 15 horizon, so
      // an above-horizon dialect range equals the pristine table
      "ql_retained_metrics" ->
        (s"SELECT epoch_ns(ts) AS ts, event_id, user_id, event_type, value, props " +
          s"FROM events WHERE epoch_ns(ts) >= ${ns("2024-01-20")} " +
          "ORDER BY ts, event_id"),
      "ql_head_limit" ->
        s"""SELECT ts, event_id, user_id, event_type, value, props FROM (
           |  SELECT epoch_ns(ts) AS ts, event_id, user_id, event_type, value, props,
           |         dense_rank() OVER (ORDER BY ts) AS rk
           |  FROM events WHERE epoch_ns(ts) >= ${ns("2024-01-10")}
           |) WHERE rk <= 50 ORDER BY ts, event_id""".stripMargin,
      "ql_tail_limit" ->
        s"""SELECT ts, event_id, user_id, event_type, value, props FROM (
           |  SELECT epoch_ns(ts) AS ts, event_id, user_id, event_type, value, props,
           |         dense_rank() OVER (ORDER BY ts DESC) AS rk
           |  FROM events WHERE epoch_ns(ts) < ${ns("2024-01-20") + 1}
           |) WHERE rk <= 50 ORDER BY ts, event_id""".stripMargin,
      "ql_tz_offset" -> evSql(
        ns("2024-01-10") - 9L * 3600 * 1000000000L,
        ns("2024-01-11") - 9L * 3600 * 1000000000L),
      "ql_projection" ->
        (s"SELECT epoch_ns(ts) AS ts, event_id AS eid, value AS val FROM events " +
          s"WHERE epoch_ns(ts) >= ${ns("2024-01-10")} AND epoch_ns(ts) < ${ns("2024-01-12")} " +
          "ORDER BY ts, eid"),
      "ts_format_ns" ->
        ("SELECT event_id, strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') || '000+00:00' AS iso " +
          "FROM events ORDER BY event_id"),
      "meta_metrics" ->
        ("SELECT * FROM (VALUES ('customer'),('documents'),('embeddings'),('events')," +
          "('lineitem'),('nation'),('orders'),('part'),('region'),('supplier')) " +
          "AS t(metrics) ORDER BY metrics"),
      "meta_describe_events" ->
        ("SELECT 'events' AS metrics, CAST(1 AS BIGINT) AS block_num, " +
          "count(*) AS row_num, " +
          "min(epoch_ns(ts)) AS from_ts, max(epoch_ns(ts)) AS end_ts FROM events")
    )
  }

  // ---- analytics / TPC-H-ish (join, agg, window at scale) ----------------

  private val BucketH = 3600L * 1000000000L

  /** The shared histogram bucket schedule (cents): ts_histogram_quantile,
    * its streaming twin, and the rollup store's stored counters all ride
    * the same literal bounds so their results compose. */
  private val HistBounds = Seq(500L, 1000L, 2500L, 5000L, 10000L, 25000L)

  private val analyticsQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_downsample_1h" -> ((s, d) => {
      val ev = t(s, d, "events")
      // integer floor bucket, not floor(ts/b): Column `/` is double
      // division, and epoch-ns magnitudes round to ~256 ns before the
      // floor — a ts within that of a bucket boundary would bucket
      // differently than the oracle's integer arithmetic
      ev.groupBy(expr(TsOps.floorBucketSql("ts", BucketH)).as("bucket_ts"))
        .agg(count(lit(1)).as("n"), min("value").as("min_v"),
          max("value").as("max_v"), dsum(col("value")).as("sum_v"))
        .orderBy("bucket_ts")
    }),
    "agg_downsample_gapfill" -> ((s, d) => {
      val day = 86400L * 1000000000L
      val ev = t(s, d, "events")
      val agg = ev.groupBy(expr(TsOps.floorBucketSql("ts", day)).as("bucket_ts"))
        .agg(count(lit(1)).as("n"), min("value").as("min_v"),
          max("value").as("max_v"), dsum(col("value")).as("sum_v"))
      TsOps.fillGaps(agg, day, ns("2023-12-25"), ns("2024-02-05"))
        .orderBy("bucket_ts")
    }),
    "agg_hopping_24h_6h" -> ((s, d) =>
      // sliding 24h windows every 6h (4× overlap fan-out, combinable agg)
      TsOps.hoppingDownsample(t(s, d, "events"),
        24L * 3600 * 1000000000L, 6L * 3600 * 1000000000L, "value")
        .orderBy("window_start")),
    "ts_retention" -> ((s, d) =>
      // cohort retention matrix: users grouped by first-activity day,
      // distinct actives per (cohort day, day offset)
      TsOps.retention(tsUs(t(s, d, "events")), "user_id",
        dayNanos = 86400L * 1000000000L)
        .orderBy("cohort_day", "day_offset")),
    "ts_interval_join" -> ((s, d) => {
      // attribute purchases to 1h-gap sessions via the binned range join;
      // bin = 1h ≈ typical session length, so explode factor stays ~1-2
      val ev = tsUs(t(s, d, "events"))
      val sessions = TsOps.sessionize(ev.select("user_id", "ts"),
          3600L * 1000000000L, Seq("user_id"))
        .groupBy("user_id", "session_idx")
        .agg(min("ts").as("session_start"), max("ts").as("session_end"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("user_id", "ts", "value")
      TsOps.intervalJoin(purchases, sessions, Seq("user_id"),
          "session_start", "session_end", binNanos = 3600L * 1000000000L)
        .groupBy("user_id", "session_idx")
        .agg(count(lit(1)).as("n_purchases"),
          dsum(col("value")).as("purchase_value"))
        .orderBy("user_id", "session_idx")
    }),
    "ts_heatmap" -> ((s, d) =>
      // dow × hour activity matrix (UTC, integer epoch arithmetic)
      TsOps.heatmap(tsUs(t(s, d, "events"))).orderBy("dow", "hour")),
    "ts_concurrency" -> ((s, d) => {
      // concurrent-session load curve: sessions sampled at hour ticks —
      // the intervalJoin reused keyless (grid has no user), with a
      // distributed spark.range grid, never a driver-side tick array
      val hour = 3600L * 1000000000L
      val ev = tsUs(t(s, d, "events"))
      val sess = TsOps.sessionize(ev.select("user_id", "ts"), hour,
          Seq("user_id"))
        .groupBy("user_id", "session_idx")
        .agg(min("ts").as("s"), max("ts").as("e"))
        .select("s", "e")
      val grid = s.range(ns("2023-12-25") / hour, ns("2024-02-05") / hour)
        .select((col("id") * hour).as("ts"))
      TsOps.intervalJoin(grid, sess, Nil, "s", "e", binNanos = hour)
        .groupBy("ts").agg(count(lit(1)).as("n_active"))
        .orderBy("ts")
    }),
    "agg_value_quantiles" -> ((s, d) =>
      // exact dyadic quartiles of value CENTS per event type — integer
      // inputs + p ∈ {.25, .5, .75} make the interpolation bit-exact
      // (the text_length_quantiles discipline on the events table)
      tsUs(t(s, d, "events"))
        .select(col("event_type"),
          (col("value").cast("decimal(18,2)") * 100).cast("long").as("c"))
        .filter(col("c").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          expr("percentile(c, 0.25)").as("p25"),
          expr("percentile(c, 0.5)").as("p50"),
          expr("percentile(c, 0.75)").as("p75"))
        .orderBy("event_type")),
    "ts_event_features" -> ((s, d) => {
      // ML feature extraction: each event with its sequence context —
      // previous/next type and gaps, per-user ordinal — one window over
      // the (ts, event_id) total order, no self-joins
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      tsUs(t(s, d, "events"))
        .select("event_id", "ts", "user_id", "event_type")
        .withColumn("seq_idx", row_number().over(w).cast("long"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .withColumn("gap_prev", col("ts") - lag(col("ts"), 1).over(w))
        .withColumn("gap_next", lead(col("ts"), 1).over(w) - col("ts"))
        .orderBy("event_id")
    }),
    "ts_transitions" -> ((s, d) =>
      // event-type transition matrix per user sequence ((ts, event_id)
      // total order) — the session-flow Markov substrate
      TsOps.transitions(
        tsUs(t(s, d, "events"))
          .select("user_id", "ts", "event_id", "event_type"),
        Seq("user_id"), "event_type", Seq("ts", "event_id"))
        .orderBy("from_type", "to_type")),
    "ts_counter_increase" -> ((s, d) =>
      // reset-aware counter semantics (PromQL increase()/resets() over
      // raw samples): per-user daily delta sums in exact cents, a value
      // drop counts the post-reset value — the monitoring-counter read
      // of a sampled series
      TsOps.counterIncrease(
        tsUs(t(s, d, "events")).select("user_id", "ts", "event_id", "value"),
        Seq("user_id"), 86400L * 1000000000L)
        .orderBy("user_id", "bucket")),
    "rollup_counter_store" -> ((s, d) => {
      // the counter recording rule AT REST with the full store lifecycle:
      // hourly increase rows land as a base write plus a batch-keyed
      // append PLUS that append replayed (at-least-once redelivery), and
      // the daily read still equals the direct pass — replay dedup +
      // additive partial merges + compaction, the rollup-store discipline
      // on the monitoring-counter tier (shares ts_counter_increase's
      // oracle). Deltas land in the observing sample's bucket, so one
      // counterIncrease pass feeds arbitrary append splits losslessly.
      graft.storage.CounterStore.read(s, counterStore1h(s, d),
          factor = 24L)
        .orderBy("user_id", "bucket")
    }),
    "rollup_counter_tiered" -> ((s, d) => {
      // the cutoff-keyed coarsening tier: pre-Jan-10 hourly buckets fold
      // 24x into a daily store under the deterministic tier-<cutoff> key
      // (run TWICE — the retry collapses in the replay dedup), the fine
      // store trims by whole-day directory drops, and the stitched daily
      // read equals the never-tiered direct pass (same shared oracle)
      val (fineP, coarseP) = counterTierPaths(s, d)
      graft.storage.CounterStore.readTiered(s, fineP, coarseP,
          factor = 24L)
        .orderBy("user_id", "bucket")
    }),
    "rollup_counter_route" -> ((s, d) => {
      // budget routing on the counter tier: the month-wide 40-point
      // budget clamps to the daily coarse tier below its horizon, the
      // hourly fine store folds 24x above it, and the stitched indexes
      // telescope to the direct daily pass (shares ts_counter_increase's
      // oracle plus the grain/source contract)
      val (fineP, coarseP) = counterTierPaths(s, d)
      graft.storage.CounterStore.route(s, fineP, Some(coarseP),
          ns("2024-01-01"), ns("2024-01-31"), maxPoints = 40)
        .orderBy("user_id", "bucket")
    }),
    "stream_counter_store" -> ((s, d) => {
      // the counter store MAINTAINED BY the stream: cross-batch lag in
      // the state store (one long per series), per-batch increase rows
      // appended under replay-stable keys — the rollupIngest discipline
      // on the counter tier; the daily read over the streamed store
      // equals the batch recording rule (shares ts_counter_increase's
      // oracle)
      Tables.configure(s)
      val base = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-sctr-$processId-${dirTag(d)}")
      if (base.exists())
        org.apache.commons.io.FileUtils.deleteDirectory(base)
      val p = new java.io.File(base, "store").getPath
      val src = eventStream(s, d)
      val qy = graft.streaming.StreamIngest.counterIngest(src, p,
        new java.io.File(base, "ck").getPath, 3600L * 1000000000L,
        trigger = org.apache.spark.sql.streaming.Trigger.Once())
      if (!qy.awaitTermination(300000)) {
        qy.stop()
        throw new IllegalStateException(
          "stream_counter_store: ingest did not finish")
      }
      graft.storage.CounterStore.read(s, p, factor = 24L)
        .orderBy("user_id", "bucket")
    }),
    "aqp_event_stats" -> ((s, d) => {
      // approximate query processing from the deterministic at-rest
      // sample tier (1/32 by md5 bit-prefix membership — a rate the old
      // hex ladder could not express): grouped counts and cents sums
      // estimated as sample-aggregate × 32 — an exact integer scale-up
      // of a reproducible sample, so the ESTIMATES themselves hash-match
      // the DuckDB mirror (which re-derives the same sample from raw).
      // The store behind it is built + appended + REPLAY-appended +
      // compacted: the estimate sees each sampled row exactly once
      // through the whole lifecycle
      graft.storage.SampleStore.estimate(s, aqpStorePath(s, d),
          Seq("event_type"), "value")
        .orderBy("event_type")
    }),
    "aqp_window" -> ((s, d) => {
      // time-scoped estimates: the [since, until) scope prunes whole
      // __day directories off the sample scan before the aggregate
      // (PlanAuditSpec pins the PartitionFilters) — at 100 TB a
      // ten-day-window estimate reads ten days of the 1/16 sample,
      // not the store
      graft.storage.SampleStore.open(s, aqpStorePath(s, d))
        .estimate(Seq("event_type"), "value",
          since = Some(ns("2024-01-10")), until = Some(ns("2024-01-20")))
        .orderBy("event_type")
    }),
    "aqp_stratified" -> ((s, d) => {
      // STRATIFIED AQP (the BlinkDB observation): the exponential
      // value-band strata (~8.7k/1.1k/150/22/1 at sf0.01) keep almost no
      // tail evidence at a uniform 1/16 — per-stratum rates freeze at
      // build so every band keeps >= minRows expected rows (rare bands
      // keep ALL), and the Horvitz-Thompson estimate stays exact
      // integer: the oracle re-derives the identical rate map from the
      // same raw counts and hash-matches every estimate
      graft.storage.SampleStore.open(s, aqpStratifiedPath(s, d))
        .estimate(Seq("band"), "value")
        .orderBy("band")
    }),
    "aqp_retained" -> ((s, d) => {
      // retention on the sample tier: the trim drops whole day
      // directories below the cutoff (run TWICE — idempotent), and
      // estimates over the retained window equal the windowed oracle —
      // a sample outliving the raw table's retention estimates nothing
      // a query may legally read
      val cutoff = ns("2024-01-10")
      val p = modelStorePaths.computeIfAbsent(d + "#aqpr", _ => {
        val sp = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft-aqpr-$processId-${dirTag(d)}").getPath
        graft.storage.SampleStore.build(t(s, d, "events"), sp,
          idCol = "event_id")
        graft.storage.SampleStore.trimBelow(s, sp, cutoff)
        graft.storage.SampleStore.trimBelow(s, sp, cutoff) // retry: no-op
        sp
      })
      graft.storage.SampleStore.open(s, p)
        .estimate(Seq("event_type"), "value", since = Some(cutoff))
        .orderBy("event_type")
    }),
    "stream_aqp_stratified" -> ((s, d) => {
      // the STRATIFIED sample tier maintained by the stream: rates
      // freeze on the seed half-month at build (the BlinkDB offline
      // plan), micro-batches of the second half sample themselves under
      // the FROZEN map — strata the seed never saw keep ALL their rows
      // (the rare-band tail at sf0.01 exercises exactly that path) —
      // and the oracle re-derives the seed-frozen map + keep-all
      // fallback from raw, hash-matching every estimate
      Tables.configure(s)
      val base = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-saqps-$processId-${dirTag(d)}")
      if (base.exists())
        org.apache.commons.io.FileUtils.deleteDirectory(base)
      val p = new java.io.File(base, "store").getPath
      val split = ns("2024-01-16")
      val bandExpr = expr("cast(floor(value / 100) as long)")
      val ev = t(s, d, "events").withColumn("band", bandExpr)
      graft.storage.SampleStore.buildStratified(
        ev.filter(col("ts") < split), p, idCol = "event_id",
        stratumCol = "band", minRows = 50L, maxBits = 8)
      val src = eventStream(s, d)
        .withColumn("band", bandExpr)
        .filter(col("ts") >= split) // batches PARTITION the source
      val qy = graft.streaming.StreamIngest.sampleIngestStratified(src,
        p, new java.io.File(base, "ck").getPath, idCol = "event_id")
      if (!qy.awaitTermination(300000)) {
        qy.stop()
        throw new IllegalStateException(
          "stream_aqp_stratified: ingest did not finish")
      }
      graft.storage.SampleStore.open(s, p)
        .estimate(Seq("band"), "value")
        .orderBy("band")
    }),
    "aqp_quantiles" -> ((s, d) => {
      // quantile ESTIMATES from the stratified sample, grouped by a
      // DIFFERENT axis than the strata — each event_type group spans
      // value bands with different rates, so the Horvitz-Thompson
      // weighting genuinely bites: percentile(c, p, rate_den) is the
      // exact percentile of the multiset where each row repeats its
      // inverse inclusion probability, and the oracle reproduces it by
      // literally replicating the sampled rows
      graft.storage.SampleStore.open(s, aqpStratifiedPath(s, d))
        .estimateQuantile(Seq("event_type"), "value")
        .orderBy("event_type")
    }),
    "aqp_error_report" -> ((s, d) => {
      // the honesty artifact an AQP surface must show beside every
      // estimate: per group, sampled estimate vs exact count and the
      // integer-permille error — both engines compute both sides, so the
      // report itself is exactly mirrored (at 100 TB the exact side is
      // the once-a-day audit; the estimate is the interactive path)
      val exact = t(s, d, "events").groupBy("event_type")
        .agg(count(lit(1)).as("n_exact"))
      graft.storage.SampleStore.estimate(s, aqpStorePath(s, d),
          Seq("event_type"), "value")
        .select("event_type", "est_count")
        .join(exact, "event_type")
        .withColumn("err_permille",
          expr("abs(est_count - n_exact) * 1000 div n_exact"))
        .orderBy("event_type")
    }),
    "rollup_route_aqp" -> ((s, d) => {
      // the two serving tiers COMPOSED — the actual dashboard contract
      // at 100 TB (coarse-first, error-bounded drill-in): a 1440-point
      // budget over one day fits a 1-minute grain, finer than the
      // stored 1h buckets, so the budget beats every exact tier and the
      // router answers from the 1/32 sample store with source="sample",
      // rate_den, and the HT variance bar riding the columns — where
      // route() would have re-aggregated the raw table. The oracle
      // re-derives the same sample and buckets it identically, so the
      // routed ESTIMATES hash-match
      Tables.configure(s)
      graft.storage.RollupStore.routeSampled(s, rollupStore1h(s, d),
          aqpStorePath(s, d), ns("2024-01-05"), ns("2024-01-06"),
          maxPoints = 1440)
        .orderBy("bucket_ts")
    }),
    "stream_aqp_ingest" -> ((s, d) => {
      // the sample tier MAINTAINED BY the stream: membership is a pure
      // function of the row id (zero state), micro-batches append their
      // survivors under replay-stable keys, and estimates from the
      // streamed store equal the one-shot batch build (shared
      // aqp_event_stats oracle)
      Tables.configure(s)
      val base = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-saqp-$processId-${dirTag(d)}")
      if (base.exists())
        org.apache.commons.io.FileUtils.deleteDirectory(base)
      val p = new java.io.File(base, "store").getPath
      val qy = graft.streaming.StreamIngest.sampleIngest(eventStream(s, d),
        p, new java.io.File(base, "ck").getPath, idCol = "event_id",
        bits = 5)
      if (!qy.awaitTermination(300000)) {
        qy.stop()
        throw new IllegalStateException(
          "stream_aqp_ingest: ingest did not finish")
      }
      graft.storage.SampleStore.estimate(s, p, Seq("event_type"), "value")
        .orderBy("event_type")
    }),
    "ts_gaps" -> ((s, d) =>
      // per-user inter-event gap stats (ingest-cadence profiling)
      TsOps.gapStats(tsUs(t(s, d, "events")).select("user_id", "ts"),
        Seq("user_id")).orderBy("user_id")),
    "ts_funnel" -> ((s, d) => {
      // conversion funnel view→click→purchase per user, closing within
      // 7 days of the first view; greedy earliest-first stage matching
      val ev = tsUs(t(s, d, "events"))
        .select("user_id", "ts", "event_type")
      TsOps.funnel(ev, Seq("user_id"), Seq("view", "click", "purchase"),
        withinNanos = 7L * 86400 * 1000000000L)
        .orderBy("user_id")
    }),
    "ts_zscore_anomaly" -> ((s, d) => {
      // alerting: points > 2σ from their user's trailing-7d mean over
      // windows of ≥ 10 points; the z-test is an exact integer
      // comparison on cents, so the flag set hash-matches SQL
      val ev = tsUs(t(s, d, "events"))
        .select("event_id", "ts", "user_id", "value")
      TsOps.zscoreAnomalies(ev, 7L * 86400 * 1000000000L, "value",
        Seq("user_id"), k = 2, minN = 10)
        .select("event_id", "ts", "user_id", "value", "roll_n", "lhs", "rhs")
        .orderBy("event_id")
    }),
    "ts_mad_anomaly" -> ((s, d) =>
      // robust outliers: |x − median| > 3·MAD per user, decided by the
      // exact integer comparison on doubled/quadrupled cent units
      TsOps.madAnomalies(
        tsUs(t(s, d, "events"))
          .select("event_id", "ts", "user_id", "value"),
        "value", Seq("user_id"), k = 3, minN = 10)
        .select("event_id", "ts", "user_id", "value", "med2", "dev2", "mad4")
        .orderBy("event_id")),
    "ts_seasonal_anomaly" -> ((s, d) =>
      // calendar-shaped alerting: points > 2σ from their OWN seasonal cell
      // (dow × hour) mean — one 168-row profile agg + broadcast join, no
      // window; the residual test is exact integer algebra on cents
      TsOps.seasonalAnomalies(t(s, d, "events"), "value", k = 2, minN = 10)
        .select("event_id", "ts", "dow", "hour", "cell_n", "value")
        .orderBy("event_id")),
    "ts_paa_symbols" -> ((s, d) =>
      // per-user PAA over 6h segments + quantile-SAX symbol (alphabet 4);
      // symbols assigned by ntile over IEEE-exact mean ordering, so the
      // (user, segment) → symbol map is engine-identical
      TsOps.paaSymbols(t(s, d, "events"), Seq("user_id"),
          6L * 3600 * 1000000000L, alphabet = 4)
        .select(col("user_id"), col("seg"), col("seg_n"), col("seg_sum"),
          col("symbol").cast("long").as("symbol"))
        .orderBy("user_id", "seg")),
    "ts_sax_words" -> ((s, d) =>
      // one SAX word per user: activity-shape fingerprint; equal words
      // across users = behaviorally similar series, found by GROUP BY —
      // the SimHash pigeonhole applied to time series
      TsOps.saxWords(t(s, d, "events"), Seq("user_id"),
          6L * 3600 * 1000000000L, alphabet = 4)
        .select("user_id", "word", "n_segments")
        .orderBy("user_id")),
    "ts_ewma" -> ((s, d) =>
      // integer EWMA (α = 1/16) per user in one sorted partition pass;
      // the floor-division recurrence is engine-defined, so a DuckDB
      // recursive CTE reproduces every scaled state bit-for-bit
      graft.operators.RecurrenceOps.ewma(t(s, d, "events"), Seq("user_id"),
          alphaLog2 = 4)
        .select(col("user_id"), col("ts"), col("id").as("event_id"),
          col("cents"), col("ewma_num"), col("ewma_cents"))
        .orderBy("user_id", "ts", "event_id")),
    "ts_holt" -> ((s, d) =>
      // level+trend smoothing (α=1/8, β=1/16, 2^20 fixed point) with the
      // one-step forecast — the recurrence tier's forecasting member;
      // every division floors, so the recursive CTE reproduces all state
      graft.operators.RecurrenceOps.holt(t(s, d, "events"), Seq("user_id"))
        .select(col("user_id"), col("ts"), col("id").as("event_id"),
          col("cents"), col("level_num"), col("trend_num"), col("fc1_cents"))
        .orderBy("user_id", "ts", "event_id")),
    "ts_cusum" -> ((s, d) =>
      // two-sided integer CUSUM drift detector per user (target 50.00,
      // slack 5.00, threshold 200.00), sequential state in the same
      // sorted-fold tier; alarms reset the statistic (page test)
      graft.operators.RecurrenceOps.cusum(t(s, d, "events"), Seq("user_id"),
          targetCents = 5000L, slackCents = 500L, thresholdCents = 20000L)
        .select(col("user_id"), col("ts"), col("id").as("event_id"),
          col("cents"), col("s_pos"), col("s_neg"), col("alarm"))
        .orderBy("user_id", "ts", "event_id")),
    "text_compress_ratio" -> ((s, d) =>
      // entropy-class quality signal. raw_bytes (UTF-8 length) is
      // VALUE-oracled; the DEFLATE output itself is zlib-implementation-
      // defined (see Scaladoc), so the oracle-facing view carries
      // ratio_ok — an in-plan bounds gate (compressed within (0,
      // raw + 64], ratio in sane basis points) — instead of raw zlib
      // bytes, the approx-sketch convention
      // the ratio band only applies past a raw-size floor: DEFLATE's ~8
      // constant overhead bytes push ratio_bps over any fixed band for
      // docs shorter than ~9 UTF-8 bytes, so tiny docs are gated on the
      // absolute comp_bytes bound alone (corpus-independent either way)
      Text.compressionRatio(t(s, d, "documents"), "doc_id", "text")
        .filter(col("raw_bytes").isNotNull) // empty/null text, like oracle
        .select(col("doc_id"), col("raw_bytes"),
          (col("comp_bytes") > 0 &&
            col("comp_bytes") <= col("raw_bytes") + 64 &&
            (col("raw_bytes") < 16L ||
              col("ratio_bps").between(1L, 12000L)))
            .cast("long").as("ratio_ok"))
        .orderBy("doc_id")),
    "dedup_containment" -> ((s, d) =>
      // asymmetric quote/subset detection: pairs where >= 60% of EITHER
      // side's shingles appear in the other — catches the embedded-
      // paragraph case symmetric jaccard structurally misses
      Dedup.containmentPairs(t(s, d, "documents"), "doc_id", "text",
          threshold = 0.6)
        .orderBy("id1", "id2")),
    "dedup_fuzzy_pairs" -> ((s, d) =>
      // typo-grade near-dup: pairs whose normalized 40-char prefix keys
      // are within edit distance 1, via SymSpell deletion-neighborhood
      // blocking (complete recall, no all-pairs) + levenshtein verify.
      // The oracle is the INDEPENDENT brute-force all-pairs scan
      Dedup.fuzzyPairs(t(s, d, "documents"), "doc_id", "text", keyLen = 40)
        .orderBy("doc_a", "doc_b")),
    "sketch_overlap" -> ((s, d) => {
      // cross-source vocabulary overlap from at-rest HLL sketches: exact
      // per-pair intersections are VALUE-oracled; est_ok gates the
      // inclusion-exclusion estimate within 8% of the exact union (the
      // error scale inclusion-exclusion actually has)
      val docs = t(s, d, "documents")
      val est = Text.tokenOverlapSketch(docs, "text", "lang")
      val tok = docs.select(col("lang"),
        explode(Text.tokens(col("text"))).as("tok")).distinct()
      val exact = tok.select(col("lang").as("group_a"), col("tok"))
        .join(tok.select(col("lang").as("group_b"), col("tok")), "tok")
        .filter(col("group_a") < col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(count(lit(1)).as("n_int"))
      val perLang = tok.groupBy("lang")
        .agg(count(lit(1)).as("n_distinct"))
      est.join(exact, Seq("group_a", "group_b"))
        .join(perLang.select(col("lang").as("group_a"),
          col("n_distinct").as("__na")), "group_a")
        .join(perLang.select(col("lang").as("group_b"),
          col("n_distinct").as("__nb")), "group_b")
        // 8% of the exact union, with an absolute floor of 4: at small
        // unions the relative bound collapses below HLL's integer
        // discretization and the gate would flip on a ±1 estimate —
        // corpus-independent where a bare percentage is not
        .select(col("group_a"), col("group_b"), col("n_int"),
          (abs(col("est_intersect") - col("n_int")) <=
            greatest(
              (col("__na") + col("__nb") - col("n_int")) * 0.08,
              lit(4.0)))
            .cast("long").as("est_ok"))
        .orderBy("group_a", "group_b")
    }),
    "graph_pagerank" -> ((s, d) => {
      // link authority over the bidirectional customer↔supplier trade
      // graph (node ids disambiguated by parity); 3 integer supersteps,
      // every arithmetic step a floor division the unrolled SQL oracle
      // reproduces exactly
      val pairs = t(s, d, "orders").select("o_orderkey", "o_custkey")
        .join(t(s, d, "lineitem").select("l_orderkey", "l_suppkey"),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      val edges = pairs.unionByName(
        pairs.select(col("dst").as("src"), col("src").as("dst")))
      graft.operators.GraphOps.pageRank(edges, iters = 3)
        .orderBy("node")
    }),
    "graph_triangles" -> ((s, d) => {
      // clustering density of the part co-purchase graph (parts linked
      // when one order contains both — per-order pair fan-out is bounded
      // by order size, never corpus²); the oracle counts the same
      // triangles via the ORDER-INDEPENDENT a<b<c three-join, so it
      // validates the degree-ordered orientation independently
      val li = t(s, d, "lineitem").select("l_orderkey", "l_partkey")
      // pair enumeration via per-order sorted part arrays: ONE groupBy
      // shuffle (the equivalent self-join shuffles both sides and joins),
      // fan-out still bounded by order size — measured 14% off the whole
      // row at sf0.1; the un-distincted pair stream feeds triangles'
      // single normalize+distinct as before
      val pairs = li.groupBy("l_orderkey")
        .agg(array_sort(collect_set("l_partkey")).as("ps"))
        .select(explode(expr(
          "flatten(transform(ps, (x, i) -> transform(" +
            "slice(ps, i + 2, greatest(size(ps) - i - 1, 0)), " +
            "y -> struct(x as src, y as dst))))")).as("e"))
        .select(col("e.src"), col("e.dst"))
      graft.operators.GraphOps.triangles(pairs)
    }),
    "ts_tolerance_join" -> ((s, d) => {
      // symmetric temporal correlation: clicks within ±1h of each error
      // by the same user — planned as a hash equi-join on (user, tol
      // bucket) with 3× left fan-out, never the nested loop the raw theta
      // predicate would force
      val ev = t(s, d, "events")
      val errs = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("event_id"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      TsOps.toleranceJoin(errs, clicks, 3600L * 1000000000L, Seq("user_id"))
        .select(col("user_id"), col("event_id").as("err_id"),
          col("ts").as("err_ts"), col("r_event_id").as("clk_id"),
          col("r_ts").as("clk_ts"),
          (col("r_ts") - col("ts")).as("delta_ns"))
        .orderBy("user_id", "err_id", "clk_id")
    }),
    "ts_path_trigrams" -> ((s, d) => {
      // top 3-step behavioral paths: two lead windows in the per-user
      // (ts, id) total order, then one combinable count over the ≤|types|³
      // path space — output is metadata-sized at any event volume
      val w = Window.partitionBy("user_id").orderBy(col("ts"),
        col("event_id"))
      t(s, d, "events").select("user_id", "ts", "event_id", "event_type")
        .withColumn("t2", lead("event_type", 1).over(w))
        .withColumn("t3", lead("event_type", 2).over(w))
        .filter(col("t3").isNotNull)
        .groupBy(col("event_type").as("s1"), col("t2").as("s2"),
          col("t3").as("s3"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("s1"), col("s2"), col("s3"))
        .limit(20)
    }),
    "graph_kcore" -> ((s, d) => {
      // the 30-core of the customer↔supplier trade graph: peeling drops
      // the loosely-attached fringe (few trade links) and keeps the
      // densely-inter-linked core — convergence is data-verified: the
      // oracle unrolls 6 peel rounds (no-ops past the fixpoint)
      val pairs = t(s, d, "orders").select("o_orderkey", "o_custkey")
        .join(t(s, d, "lineitem").select("l_orderkey", "l_suppkey"),
          col("o_orderkey") === col("l_orderkey"))
        .select(
          least(col("o_custkey") * 2, col("l_suppkey") * 2 + 1).as("src"),
          greatest(col("o_custkey") * 2, col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      // maxRounds pinned to the oracle's unroll depth: convergence in
      // <= 6 rounds is the invariant the oracle equality needs, so a
      // 7-round graph must fail HERE, not surface as an oracle mismatch
      graft.operators.GraphOps.kCore(pairs, k = 30, maxRounds = 6)
    }),
    "rollup_store_daily" -> ((s, d) => {
      // continuous-aggregate routing: daily stats answered from the
      // at-rest 1h rollup store alone — the oracle aggregates the RAW
      // table, so equality proves the store's partials compose exactly
      Tables.configure(s)
      val day = 86400L * 1000000000L
      graft.storage.RollupStore.rollup(s, rollupStore1h(s, d), day)
        .select(col("bucket_ts"), col("n"),
          col("min_c").cast("double").as("min_v"),
          col("max_c").cast("double").as("max_v"),
          col("sum_c").cast("double").as("sum_v"))
        .orderBy("bucket_ts")
    }),
    "rollup_route" -> ((s, d) => {
      // the dashboard contract: a 30-day range under a 40-point budget
      // routes to the STORE at the derived 19h grain (the budget applies
      // to the outward-WIDENED bounds, so 18h's 41 whole buckets re-derive
      // to 19h's 39) — the oracle re-derives the same grain over raw, so
      // equality proves the routing arithmetic, the widened-budget
      // contract, and the store's composition at a non-day grain
      Tables.configure(s)
      graft.storage.RollupStore.route(s, rollupStore1h(s, d),
          t(s, d, "events"), ns("2024-01-01"), ns("2024-01-31"),
          maxPoints = 40, distinctCol = Some("user_id"),
          histBoundsCents = HistBounds)
        .select(col("bucket_ts"), col("n"),
          col("min_c").cast("double").as("min_v"),
          col("max_c").cast("double").as("max_v"),
          col("sum_c").cast("double").as("sum_v"),
          col("grain_ns"), col("source"))
        .orderBy("bucket_ts")
    }),
    "rollup_tiered_scan" -> ((s, d) => {
      // the retention-policy read path: half the month was tiered off
      // (raw trimmed, 1h rollups kept), yet the stitched daily aggregate
      // equals the raw-table oracle exactly — tier ranges are disjoint
      // whole buckets, so the merge is the same associative fold
      Tables.configure(s)
      val (rawP, stP) = tieredEvents(s, d)
      graft.storage.RollupStore.tieredRollup(s, rawP, stP,
          86400L * 1000000000L, distinctCol = Some("user_id"),
          histBoundsCents = HistBounds)
        .select(col("bucket_ts"), col("n"),
          col("min_c").cast("double").as("min_v"),
          col("max_c").cast("double").as("max_v"),
          col("sum_c").cast("double").as("sum_v"))
        .orderBy("bucket_ts")
    }),
    "rollup_route_tiered" -> ((s, d) => {
      // the round-8 composition gap, closed: a dashboard zooms into the
      // whole month at a budget demanding finer-than-stored grain, but
      // the first half was tiered off — the router CLAMPS to the stored
      // 1h grain and stitches store+raw instead of silently serving only
      // the post-horizon raw remnant; the oracle aggregates the
      // NEVER-tiered table at that grain, so equality proves the routed
      // answer is complete
      Tables.configure(s)
      val (rawP, stP) = tieredEvents(s, d)
      graft.storage.RollupStore.route(s, stP, s.read.parquet(rawP),
          ns("2024-01-01"), ns("2024-01-31"), maxPoints = 2000,
          distinctCol = Some("user_id"), histBoundsCents = HistBounds)
        .select(col("bucket_ts"), col("n"),
          col("min_c").cast("double").as("min_v"),
          col("max_c").cast("double").as("max_v"),
          col("sum_c").cast("double").as("sum_v"),
          col("grain_ns"), col("source"))
        .orderBy("bucket_ts")
    }),
    "rollup_tiered_users" -> ((s, d) => {
      // distinct users per day over the TIERED layout: the store's HLL
      // sketches (pre-horizon) union with raw-side sketches (post-
      // horizon) — the same associative union compaction uses — so the
      // estimate survives tiering; gated against the exact count with
      // the rollup_store_users rank-error bound (lgK=12 ⇒ 3σ rse ≈ 4.9%)
      Tables.configure(s)
      val day = 86400L * 1000000000L
      val (rawP, stP) = tieredEvents(s, d)
      val st = graft.storage.RollupStore.tieredRollup(s, rawP, stP, day,
          distinctCol = Some("user_id"), histBoundsCents = HistBounds)
        .select(col("bucket_ts"), col("n"), col("distinct_est"))
      val exact = t(s, d, "events")
        .groupBy(expr(TsOps.floorBucketSql("ts", day)).as("bucket_ts"))
        .agg(countDistinct("user_id").as("__exact"))
      st.join(exact, "bucket_ts")
        .select(col("bucket_ts"), col("n"),
          (abs(col("distinct_est") - col("__exact")).cast("double") <=
            greatest(col("__exact") * 0.05, lit(4.0)))
            .cast("long").as("hll_ok"))
        .orderBy("bucket_ts")
    }),
    "rollup_tiered_p90" -> ((s, d) => {
      // p90 per day over the TIERED layout: stored hourly counter arrays
      // (pre-horizon) vector-add with raw-side counters (post-horizon)
      // into exactly the daily counts a direct pass builds — integer-
      // exact, so this shares rollup_store_p90's value oracle
      Tables.configure(s)
      val day = 86400L * 1000000000L
      val (rawP, stP) = tieredEvents(s, d)
      val st = graft.storage.RollupStore.tieredRollup(s, rawP, stP, day,
        distinctCol = Some("user_id"), histBoundsCents = HistBounds)
      val counts = graft.storage.RollupStore.histogramCounts(st, HistBounds,
        Seq("bucket_ts"))
      TsOps.histogramQuantileFromCounts(counts, Seq("bucket_ts"),
          HistBounds, qNum = 90L, qDen = 100L)
        .orderBy("bucket_ts")
    }),
    "rollup_cascade_daily" -> ((s, d) => {
      // three-tier retention cascade (raw → 1h → 1d, the "full resolution
      // for a week, hourly for a year, daily forever" policy), with the
      // middle tier COMPACTED after cascading — the stitched daily
      // aggregate still equals the raw-table oracle, proving the per-tier
      // horizon windows partition the timeline exactly and the horizon
      // survives compaction's batch-key rewrite
      Tables.configure(s)
      val day = 86400L * 1000000000L
      val (rawP, stH, stD) = cascadeEvents(s, d)
      graft.storage.RollupStore.cascadeRollup(s, rawP, Seq(stH, stD), day,
          distinctCol = Some("user_id"), histBoundsCents = HistBounds)
        .select(col("bucket_ts"), col("n"),
          col("min_c").cast("double").as("min_v"),
          col("max_c").cast("double").as("max_v"),
          col("sum_c").cast("double").as("sum_v"))
        .orderBy("bucket_ts")
    }),
    "rollup_cascade_route" -> ((s, d) => {
      // budget routing over the THREE-tier cascade: a fine budget over
      // the whole month touches the daily tier, so the grain clamps to
      // 1d — the finest resolution every touched tier can serve — and
      // the stitched answer equals the never-tiered table at that grain
      Tables.configure(s)
      val (rawP, stH, stD) = cascadeEvents(s, d)
      graft.storage.RollupStore.routeCascade(s, rawP, Seq(stH, stD),
          ns("2024-01-01"), ns("2024-01-31"), maxPoints = 2000,
          distinctCol = Some("user_id"), histBoundsCents = HistBounds)
        .select(col("bucket_ts"), col("n"),
          col("min_c").cast("double").as("min_v"),
          col("max_c").cast("double").as("max_v"),
          col("sum_c").cast("double").as("sum_v"),
          col("grain_ns"), col("source"))
        .orderBy("bucket_ts")
    }),
    "rollup_cascade_users" -> ((s, d) => {
      // distinct users per day across THREE tiers: the daily store's
      // sketches were union-folded twice (tierOff, then tierOffStore) and
      // still cover exactly the per-day hash sets — same gate as
      // rollup_store_users
      Tables.configure(s)
      val day = 86400L * 1000000000L
      val (rawP, stH, stD) = cascadeEvents(s, d)
      val st = graft.storage.RollupStore.cascadeRollup(s, rawP,
          Seq(stH, stD), day, distinctCol = Some("user_id"),
          histBoundsCents = HistBounds)
        .select(col("bucket_ts"), col("n"), col("distinct_est"))
      val exact = t(s, d, "events")
        .groupBy(expr(TsOps.floorBucketSql("ts", day)).as("bucket_ts"))
        .agg(countDistinct("user_id").as("__exact"))
      st.join(exact, "bucket_ts")
        .select(col("bucket_ts"), col("n"),
          (abs(col("distinct_est") - col("__exact")).cast("double") <=
            greatest(col("__exact") * 0.05, lit(4.0)))
            .cast("long").as("hll_ok"))
        .orderBy("bucket_ts")
    }),
    "ql_retained_metrics" -> ((s, d) => {
      // the DIALECT surface over a retention-managed metrics table: the
      // engine queries the day-trimmed block tree exactly as it would the
      // full one — an above-horizon range answers identically to the
      // pristine table (the oracle), proving the reference's query
      // surface composes with the retention tier
      val (db, _) = retainedMetricsDb(s, d)
      tsUs(engine(s, db)
        .frame("select * from events where ts >= '2024-01-20'"))
        .orderBy("ts", "event_id")
    }),
    "rollup_metrics_history" -> ((s, d) => {
      // ...and the aged-off history is still served: the stitched daily
      // read over the SAME trimmed metrics table plus its hourly history
      // store equals the raw-table oracle over the full span
      Tables.configure(s)
      val day = 86400L * 1000000000L
      val (db, stH) = retainedMetricsDb(s, d)
      val rawP = new java.io.File(db, "events").getPath
      graft.storage.RollupStore.tieredRollup(s, rawP, stH, day)
        .select(col("bucket_ts"), col("n"),
          col("min_c").cast("double").as("min_v"),
          col("max_c").cast("double").as("max_v"),
          col("sum_c").cast("double").as("sum_v"))
        .orderBy("bucket_ts")
    }),
    "rollup_metrics_route" -> ((s, d) => {
      // budget routing over the DIALECT's own retained table: the
      // __day-block metrics tree (trimmed by applyRetention) plus its
      // hourly history store serve a month-wide budget — the grain clamps
      // to the stored hour over the aged range and the answer equals the
      // pristine table at that grain (the dashboard a TSDB's own tables
      // get)
      Tables.configure(s)
      val (db, stH) = retainedMetricsDb(s, d)
      val rawP = new java.io.File(db, "events").getPath
      graft.storage.RollupStore.routeCascade(s, rawP, Seq(stH),
          ns("2024-01-01"), ns("2024-01-31"), maxPoints = 2000)
        .select(col("bucket_ts"), col("n"),
          col("min_c").cast("double").as("min_v"),
          col("max_c").cast("double").as("max_v"),
          col("sum_c").cast("double").as("sum_v"),
          col("grain_ns"), col("source"))
        .orderBy("bucket_ts")
    }),
    "rollup_route_mirror" -> ((s, d) => {
      // budget routing when there is NO raw table — the stream-maintained
      // lifecycle: the whole month at a budget finer than the mirror can
      // serve clamps first UP to the mirror's 1h buckets, then to the 1d
      // tier the range touches; the stitched answer equals the raw-table
      // daily aggregate
      Tables.configure(s)
      val (stH, stD) = mirrorCascadeEvents(s, d)
      graft.storage.RollupStore.routeStoreCascade(s, Seq(stH, stD),
          ns("2024-01-01"), ns("2024-01-31"), maxPoints = 2000)
        .select(col("bucket_ts"), col("n"),
          col("min_c").cast("double").as("min_v"),
          col("max_c").cast("double").as("max_v"),
          col("sum_c").cast("double").as("sum_v"),
          col("grain_ns"), col("source"))
        .orderBy("bucket_ts")
    }),
    "rollup_retention_mirror" -> ((s, d) => {
      // the declarative policy with NO raw table — the stream-maintained
      // lifecycle's maintenance call: two clock-injected cycles (samples
      // arriving between, stores compacted after the second) and the
      // raw-less stitched daily read still equals the raw-table oracle
      Tables.configure(s)
      val day = 86400L * 1000000000L
      val (stH, stD) = mirrorRetentionEvents(s, d)
      graft.storage.RollupStore.storeCascadeRollup(s, Seq(stH, stD), day)
        .select(col("bucket_ts"), col("n"),
          col("min_c").cast("double").as("min_v"),
          col("max_c").cast("double").as("max_v"),
          col("sum_c").cast("double").as("sum_v"))
        .orderBy("bucket_ts")
    }),
    "rollup_retention_scan" -> ((s, d) => {
      // the DECLARATIVE retention lifecycle end to end: two applyRetention
      // cycles (clock injected, samples arriving between them) produce
      // whatever layout "5 days raw, hourly for 10, daily forever"
      // implies, and the stitched daily read still equals the raw-table
      // oracle — policy-computed cutoffs, not hand-placed ones
      Tables.configure(s)
      val day = 86400L * 1000000000L
      val (rawP, stH, stD) = retentionEvents(s, d)
      graft.storage.RollupStore.cascadeRollup(s, rawP, Seq(stH, stD), day,
          distinctCol = Some("user_id"), histBoundsCents = HistBounds)
        .select(col("bucket_ts"), col("n"),
          col("min_c").cast("double").as("min_v"),
          col("max_c").cast("double").as("max_v"),
          col("sum_c").cast("double").as("sum_v"))
        .orderBy("bucket_ts")
    }),
    "rollup_cascade_p90" -> ((s, d) => {
      // p90 per day across THREE tiers: the daily store's counter arrays
      // were vector-added twice (tierOff, then the store→store tier) and
      // still hold exactly the per-day counts a direct pass builds —
      // integer-exact, so this shares rollup_store_p90's value oracle
      Tables.configure(s)
      val day = 86400L * 1000000000L
      val (rawP, stH, stD) = cascadeEvents(s, d)
      val st = graft.storage.RollupStore.cascadeRollup(s, rawP,
        Seq(stH, stD), day, distinctCol = Some("user_id"),
        histBoundsCents = HistBounds)
      val counts = graft.storage.RollupStore.histogramCounts(st, HistBounds,
        Seq("bucket_ts"))
      TsOps.histogramQuantileFromCounts(counts, Seq("bucket_ts"),
          HistBounds, qNum = 90L, qDen = 100L)
        .orderBy("bucket_ts")
    }),
    "rollup_store_p90" -> ((s, d) => {
      // p90 per day from STORED histogram counters: 24 hourly counter
      // arrays vector-add into exactly the daily counts a direct pass
      // builds, then the shared exact-integer finisher interpolates —
      // the Prometheus recording-rule serving shape, fully value-oracled
      Tables.configure(s)
      val day = 86400L * 1000000000L
      val st = graft.storage.RollupStore.rollup(s, rollupStore1h(s, d), day)
      val counts = graft.storage.RollupStore.histogramCounts(st, HistBounds,
        Seq("bucket_ts"))
      TsOps.histogramQuantileFromCounts(counts, Seq("bucket_ts"),
          HistBounds, qNum = 90L, qDen = 100L)
        .orderBy("bucket_ts")
    }),
    "rollup_store_users" -> ((s, d) => {
      // daily distinct users answered from the at-rest 1h store. The
      // merged sketch covers the SAME hash set a direct daily pass does,
      // but DataSketches estimates from different internal modes
      // (coupon list / set / dense HLL) at mid cardinalities — merged and
      // direct ESTIMATES legitimately differ by a few counts (measured
      // at sf0.1: |est−exact| ≤ ~0.7%), so the gate is the documented
      // rank-error bound vs the EXACT count (5% with an absolute floor,
      // the sketch_overlap convention; lgK=12 ⇒ 3σ rse ≈ 4.9%); the
      // day's row count rides beside it, value-oracled
      Tables.configure(s)
      val day = 86400L * 1000000000L
      val st = graft.storage.RollupStore.rollup(s, rollupStore1h(s, d), day)
        .select(col("bucket_ts"), col("n"), col("distinct_est"))
      val exact = t(s, d, "events")
        .groupBy(expr(TsOps.floorBucketSql("ts", day)).as("bucket_ts"))
        .agg(countDistinct("user_id").as("__exact"))
      st.join(exact, "bucket_ts")
        .select(col("bucket_ts"), col("n"),
          (abs(col("distinct_est") - col("__exact")).cast("double") <=
            greatest(col("__exact") * 0.05, lit(4.0)))
            .cast("long").as("hll_ok"))
        .orderBy("bucket_ts")
    }),
    "rollup_keyed_daily" -> ((s, d) => {
      // the DIMENSIONAL continuous aggregate: one store tree holds every
      // event_type series (keys ride each row, readers infer them from
      // the schema) — per-series daily stats answered from the keyed 1h
      // store alone; the oracle aggregates the raw table grouped the
      // same way, so equality proves the keyed partials compose exactly
      Tables.configure(s)
      val day = 86400L * 1000000000L
      graft.storage.RollupStore.rollup(s, keyedStore1h(s, d), day)
        .select(col("event_type"), col("bucket_ts"), col("n"),
          col("min_c").cast("double").as("min_v"),
          col("max_c").cast("double").as("max_v"),
          col("sum_c").cast("double").as("sum_v"))
        .orderBy("event_type", "bucket_ts")
    }),
    "rollup_keyed_fold" -> ((s, d) => {
      // DROPPING the dimension: keepKeys=Nil folds the keyed store across
      // event types — the merges are associative across keys exactly as
      // across time, so the fold equals the UNKEYED daily aggregate bit
      // for bit (shares rollup_store_daily's oracle)
      Tables.configure(s)
      val day = 86400L * 1000000000L
      graft.storage.RollupStore.rollup(s, keyedStore1h(s, d), day,
          keepKeys = Some(Nil))
        .select(col("bucket_ts"), col("n"),
          col("min_c").cast("double").as("min_v"),
          col("max_c").cast("double").as("max_v"),
          col("sum_c").cast("double").as("sum_v"))
        .orderBy("bucket_ts")
    }),
    "rollup_keyed_users" -> ((s, d) => {
      // distinct users PER SERIES per day from the keyed store's HLL
      // dimension — n value-oracled, the estimate gated by the documented
      // rank-error bound vs the exact count (rollup_store_users's
      // convention; per-key cardinalities are smaller, same lgK=12 bound)
      Tables.configure(s)
      val day = 86400L * 1000000000L
      val st = graft.storage.RollupStore.rollup(s, keyedStore1h(s, d), day)
        .select(col("event_type"), col("bucket_ts"), col("n"),
          col("distinct_est"))
      val exact = t(s, d, "events")
        .groupBy(col("event_type"),
          expr(TsOps.floorBucketSql("ts", day)).as("bucket_ts"))
        .agg(countDistinct("user_id").as("__exact"))
      st.join(exact, Seq("event_type", "bucket_ts"))
        .select(col("event_type"), col("bucket_ts"), col("n"),
          (abs(col("distinct_est") - col("__exact")).cast("double") <=
            greatest(col("__exact") * 0.05, lit(4.0)))
            .cast("long").as("hll_ok"))
        .orderBy("event_type", "bucket_ts")
    }),
    "rollup_keyed_route" -> ((s, d) => {
      // budget routing over the keyed store: the grain contract stays on
      // the TIME axis (per series), so the same 30-day/40-point budget
      // that rollup_route resolves to 19h resolves identically here —
      // every event_type series served at that grain from the store
      Tables.configure(s)
      graft.storage.RollupStore.route(s, keyedStore1h(s, d),
          t(s, d, "events"), ns("2024-01-01"), ns("2024-01-31"),
          maxPoints = 40, distinctCol = Some("user_id"),
          histBoundsCents = HistBounds)
        .select(col("event_type"), col("bucket_ts"), col("n"),
          col("min_c").cast("double").as("min_v"),
          col("max_c").cast("double").as("max_v"),
          col("sum_c").cast("double").as("sum_v"),
          col("grain_ns"), col("source"))
        .orderBy("event_type", "bucket_ts")
    }),
    "rollup_keyed_route_one" -> ((s, d) => {
      // ONE SERIES, ZOOMED — the most common keyed dashboard query: the
      // key predicate pushes into the router, pruning the store scan
      // (parquet pushed filter over the KB rows) and the raw
      // re-aggregation BEFORE any stitch, instead of stitching every
      // series and filtering client-side; same 19h grain derivation as
      // rollup_keyed_route, oracle filtered to the same series
      Tables.configure(s)
      graft.storage.RollupStore.route(s, keyedStore1h(s, d),
          t(s, d, "events"), ns("2024-01-01"), ns("2024-01-31"),
          maxPoints = 40, distinctCol = Some("user_id"),
          histBoundsCents = HistBounds,
          keyFilter = Some(col("event_type") === lit("click")))
        .select(col("event_type"), col("bucket_ts"), col("n"),
          col("min_c").cast("double").as("min_v"),
          col("max_c").cast("double").as("max_v"),
          col("sum_c").cast("double").as("sum_v"),
          col("grain_ns"), col("source"))
        .orderBy("bucket_ts")
    }),
    "rollup_keyed_p90" -> ((s, d) => {
      // the keyed store's histogram dimension closes the loop on the
      // direct operator: per-(series, day) counter arrays vector-add to
      // per-series whole-table counts, and the shared integer finisher
      // reproduces ts_histogram_quantile's p90 EXACTLY (same oracle) —
      // stored recording rules answer what the raw-table pass answers
      Tables.configure(s)
      val day = 86400L * 1000000000L
      val st = graft.storage.RollupStore.rollup(s, keyedStore1h(s, d), day)
      val counts = graft.storage.RollupStore.histogramCounts(st,
          HistBounds, Seq("event_type", "bucket_ts"))
        .groupBy("event_type", "le").agg(sum("cnt").as("cnt"))
      TsOps.histogramQuantileFromCounts(counts, Seq("event_type"),
          HistBounds, qNum = 90L, qDen = 100L)
        .orderBy("event_type")
    }),
    "rollup_keyed_tiered_users" -> ((s, d) => {
      // the keyed HLL dimension SURVIVES tiering: per-(series, day)
      // distinct users from the stitched store+raw read, n value-oracled
      // and the estimate gated by the rank-error bound — the
      // rollup_tiered_users proof with the dimension attached
      Tables.configure(s)
      val day = 86400L * 1000000000L
      val (rawP, stP) = keyedTieredEvents(s, d)
      val st = graft.storage.RollupStore.tieredRollup(s, rawP, stP, day,
          distinctCol = Some("user_id"))
        .select(col("event_type"), col("bucket_ts"), col("n"),
          col("distinct_est"))
      val exact = t(s, d, "events")
        .groupBy(col("event_type"),
          expr(TsOps.floorBucketSql("ts", day)).as("bucket_ts"))
        .agg(countDistinct("user_id").as("__exact"))
      st.join(exact, Seq("event_type", "bucket_ts"))
        .select(col("event_type"), col("bucket_ts"), col("n"),
          (abs(col("distinct_est") - col("__exact")).cast("double") <=
            greatest(col("__exact") * 0.05, lit(4.0)))
            .cast("long").as("hll_ok"))
        .orderBy("event_type", "bucket_ts")
    }),
    "rollup_keyed_cascade" -> ((s, d) => {
      // the dimension through the FULL policy cascade: one clock-driven
      // applyRetention cycle tiers a keyed raw table raw→1h→1d, and the
      // stitched per-series daily read still equals the never-tiered
      // grouped oracle — keys ride every tier hop and every stitch window
      Tables.configure(s)
      val day = 86400L * 1000000000L
      val (rawP, stH, stD) = keyedCascadeEvents(s, d)
      graft.storage.RollupStore.cascadeRollup(s, rawP, Seq(stH, stD), day)
        .select(col("event_type"), col("bucket_ts"), col("n"),
          col("min_c").cast("double").as("min_v"),
          col("max_c").cast("double").as("max_v"),
          col("sum_c").cast("double").as("sum_v"))
        .orderBy("event_type", "bucket_ts")
    }),
    "rollup_keyed_cascade_route" -> ((s, d) => {
      // budget routing over the KEYED policy cascade: the month-wide fine
      // budget touches the daily tier, so the grain clamps to 1d and
      // every event_type series serves complete stitched daily buckets —
      // keys ride the router's stitch exactly as they ride the scan's
      Tables.configure(s)
      val (rawP, stH, stD) = keyedCascadeEvents(s, d)
      graft.storage.RollupStore.routeCascade(s, rawP, Seq(stH, stD),
          ns("2024-01-01"), ns("2024-01-31"), maxPoints = 2000)
        .select(col("event_type"), col("bucket_ts"), col("n"),
          col("min_c").cast("double").as("min_v"),
          col("max_c").cast("double").as("max_v"),
          col("sum_c").cast("double").as("sum_v"),
          col("grain_ns"), col("source"))
        .orderBy("event_type", "bucket_ts")
    }),
    "rollup_store_stddev" -> ((s, d) => {
      // the VARIANCE recording rule: per-(series, day) n/sum/sum-of-
      // squares served from a tiered keyed store — the sums of squares
      // merge by the same associative fold as everything else, so the
      // stitched stats equal the direct pass and mean/stddev over any
      // range become stored recording rules. var_num = n·Σv² − (Σv)² is
      // compared as the EXACT integer-valued rational both engines
      // compute in decimal before one double cast
      Tables.configure(s)
      val day = 86400L * 1000000000L
      val (rawP, stP) = varianceTieredEvents(s, d)
      graft.storage.RollupStore.tieredRollup(s, rawP, stP, day)
        .select(col("event_type"), col("bucket_ts"), col("n"),
          (col("sumsq_c") * col("n") - col("sum_c") * col("sum_c"))
            .cast("double").as("var_num"))
        .orderBy("event_type", "bucket_ts")
    }),
    "rollup_route_sql" -> ((s, d) => {
      // the serving routers in PLAIN SQL: graft_route is a table-valued
      // function (SparkSessionExtensions.injectTableFunction, registered
      // post-hoc here for extension-less sessions), so ANY SQL surface —
      // including a stock Spark Connect client over gRPC — gets the
      // budget-routed, key-pruned, tier-stitched answer with grain_ns and
      // source riding the columns (the keyed cascade route's oracle,
      // filtered to the one requested series)
      Tables.configure(s)
      val (rawP, stH, stD) = keyedCascadeEvents(s, d)
      GraftExtensions.registerRouteTvf(s)
      s.sql(
        s"""SELECT event_type, bucket_ts, n,
           |  CAST(min_c AS DOUBLE) AS min_v,
           |  CAST(max_c AS DOUBLE) AS max_v,
           |  CAST(sum_c AS DOUBLE) AS sum_v, grain_ns, source
           |FROM graft_route('$stH,$stD', '$rawP',
           |  ${ns("2024-01-01")}L, ${ns("2024-01-31")}L, 2000,
           |  "event_type = 'click'")
           |ORDER BY bucket_ts""".stripMargin)
    }),
    "aqp_sql" -> ((s, d) => {
      // the sample tier in PLAIN SQL: graft_aqp is a table-valued
      // function, so any SQL surface — including a stock Spark Connect
      // client over gRPC — gets exact-integer Horvitz-Thompson estimates
      // from the at-rest sample instead of scanning raw (shares
      // aqp_event_stats' oracle: same store, same estimator)
      Tables.configure(s)
      val p = aqpStorePath(s, d)
      GraftExtensions.registerAqpTvf(s)
      s.sql(
        s"""SELECT event_type, n_sample, est_count, est_sum_cents,
           |  est_var_cents2
           |FROM graft_aqp('$p', 'event_type', 'value')
           |ORDER BY event_type""".stripMargin)
    }),
    "rollup_keyed_tiered" -> ((s, d) => {
      // retention WITH the series dimension: half the month tiered off
      // into the keyed store, and the stitched per-series daily read
      // still equals the never-tiered grouped oracle — tier windows are
      // key-agnostic (the horizon is global), so every series stitches
      // on the same boundary
      Tables.configure(s)
      val day = 86400L * 1000000000L
      val (rawP, stP) = keyedTieredEvents(s, d)
      graft.storage.RollupStore.tieredRollup(s, rawP, stP, day,
          distinctCol = Some("user_id"))
        .select(col("event_type"), col("bucket_ts"), col("n"),
          col("min_c").cast("double").as("min_v"),
          col("max_c").cast("double").as("max_v"),
          col("sum_c").cast("double").as("sum_v"))
        .orderBy("event_type", "bucket_ts")
    }),
    "ts_histogram_quantile" -> ((s, d) =>
      // Prometheus-style p90 latency/value per event type over fixed
      // cumulative buckets — exact integer interpolation, so the oracle
      // reproduces every floor division
      TsOps.histogramQuantile(t(s, d, "events"), Seq("event_type"),
          boundsCents = Seq(500L, 1000L, 2500L, 5000L, 10000L, 25000L),
          qNum = 90L, qDen = 100L)
        .orderBy("event_type")),
    "ts_lttb" -> ((s, d) => {
      // visual-fidelity downsampling: 64 series, 6h grid — every kept
      // point is reproduced by the oracle's transition-table walk of the
      // same exact-integer triangle-area recurrence
      val ev = t(s, d, "events").select(
        pmod(col("user_id"), lit(64L)).as("sid"), col("ts"),
        col("event_id"), col("value"))
      graft.operators.RecurrenceOps.lttb(ev, Seq("sid"),
          bucketNanos = 6L * 3600 * 1000000000L)
        .select(col("sid"), col("ts"), col("id").as("event_id"),
          col("cents"))
        .orderBy("sid", "ts", "event_id")
    }),
    "zorder_scan" -> ((s, d) => {
      // the two-dimensional slice the z-ordered layout exists for: a
      // user band AND a time window together — footer stats prune files
      // in BOTH dimensions (ZOrderSpec pins the hit fractions); results
      // are layout-independent, which is what the oracle checks
      val (tLo, tHi) = (ns("2024-01-10"), ns("2024-01-15"))
      Tables.configure(s)
      s.read.parquet(zOrderedEvents(s, d))
        .filter(col("user_id") >= 100L && col("user_id") < 200L &&
          col("ts") >= tLo && col("ts") < tHi)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy("event_id")
    }),
    "ts_rate_cusum" -> ((s, d) => {
      // RATE monitoring: per-user daily event counts, gap-filled with
      // zeros across each user's active span (a quiet day must drive the
      // negative side — without the grid it would be invisible), then the
      // integer CUSUM fold over the count series. Pure composition of
      // existing tiers: one keyed agg + a calendar-bounded explode + the
      // sorted-partition recurrence
      val day = 86400L * 1000000000L
      val ev = t(s, d, "events")
      val counts = ev
        .select(col("user_id"), expr(TsOps.floorDivSql("ts", day)).as("b"))
        .groupBy("user_id", "b").agg(count(lit(1)).as("n"))
      val grid = counts.groupBy("user_id")
        .agg(min("b").as("b0"), max("b").as("b1"))
        .select(col("user_id"), explode(sequence(col("b0"), col("b1"))).as("b"))
      val filled = grid.join(counts, Seq("user_id", "b"), "left")
        .select(col("user_id"), (col("b") * day).as("ts"), col("b").as("eid"),
          coalesce(col("n"), lit(0L)).cast("double").as("value"))
      graft.operators.RecurrenceOps.cusum(filled, Seq("user_id"),
          targetCents = 300L, slackCents = 100L, thresholdCents = 600L,
          idCol = "eid")
        .select(col("user_id"), col("ts"), col("id").as("day_idx"),
          col("cents"), col("s_pos"), col("s_neg"), col("alarm"))
        .orderBy("user_id", "ts")
    }),
    "retrieval_bm25" -> ((s, d) => {
      // lexical top-10 per query, BM25-shaped with the engine-exact
      // rational idf; the oracle reproduces every integral division
      import s.implicits._
      val q = Seq((1L, "fast vector scan"), (2L, "stream window agg"),
        (3L, "customer join query")).toDF("query_id", "qtext")
      graft.pipeline.Retrieval.bm25(t(s, d, "documents"), q, topK = 10)
        .select("query_id", "doc_id", "score", "n_terms", "rank")
        .orderBy("query_id", "rank")
    }),
    "text_quality_score" -> ((s, d) =>
      // classifier-scored quality filtering: the fixed linear model over
      // the engineered features (left-folded sum — IEEE addition order
      // fixed, so the oracle reproduces the score bit-for-bit) with the
      // keep decision at 0.5
      Text.qualityScore(t(s, d, "documents"), "text")
        .select(col("doc_id"), col("q_score"), col("q_keep"))
        .orderBy("doc_id")),
    "retrieval_hybrid_rrf" -> ((s, d) => {
      // hybrid eval-mining: sparse BM25 top-20 fused with dense cosine
      // top-20 by integer reciprocal-rank fusion (k=60). Query n's dense
      // representation is embedding vec_id n — the deterministic stand-in
      // for a text encoder (the fusion semantics are what is under test);
      // the doc id space is shared by construction (vec_id = doc_id)
      import s.implicits._
      val q = Seq((1L, "fast vector scan"), (2L, "stream window agg"),
        (3L, "customer join query")).toDF("query_id", "qtext")
      val sparse = graft.pipeline.Retrieval
        .bm25(t(s, d, "documents"), q, topK = 20)
      val emb = t(s, d, "embeddings")
      val qv = emb.filter(col("vec_id").isin(1L, 2L, 3L))
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val dense = Similarity.knnBrute(emb, qv, k = 20)
        .select(col("qid").as("query_id"), col("vec_id").as("doc_id"),
          col("rank"))
      graft.pipeline.Retrieval.rrfFuse(sparse, dense, topK = 10)
        .orderBy("query_id", "rrf_rank")
    }),
    "retrieval_bm25_stored" -> ((s, d) => {
      // retrieval_bm25 probed AT REST: the index (tf/dl/dfs + corpus
      // scalars) is persisted term-bucketed once, and the probe prunes the
      // tf/dfs scans to the query terms' buckets at file-listing time
      // (PlanAuditSpec asserts the PartitionFilters) — a serving restart
      // never re-tokenizes the corpus. Same scores as retrieval_bm25, so
      // it shares that value oracle
      import s.implicits._
      val q = Seq((1L, "fast vector scan"), (2L, "stream window agg"),
        (3L, "customer join query")).toDF("query_id", "qtext")
      val path = bm25IndexPaths.computeIfAbsent(d, dir => {
        val p = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft-bm25-$processId-${dirTag(dir)}").getPath
        graft.pipeline.Retrieval.writeBm25Index(t(s, dir, "documents"), p)
        p
      })
      graft.pipeline.Retrieval.bm25Stored(s, path, q, topK = 10)
        .select("query_id", "doc_id", "score", "n_terms", "rank")
        .orderBy("query_id", "rank")
    }),
    "rolling_24h_stats" -> ((s, d) => {
      // rolling window on µs-truncated ts so the oracle sees identical gaps
      val ev = tsUs(t(s, d, "events")).select("event_id", "ts", "user_id", "value")
      val win = 24L * 3600 * 1000000000L
      // decimal-cast parity sum belongs to the oracle-facing query, not the
      // library operator (TsOps.rollingAgg sums the raw column); same window
      // spec, so Catalyst folds both sums into one Window node
      val w = Window.partitionBy("user_id").orderBy(col("ts"))
        .rangeBetween(-win, 0)
      TsOps.rollingAgg(ev, win, "value", Seq("user_id"))
        .withColumn("roll_sum",
          sum(col("value").cast("decimal(18,2)")).over(w).cast("double"))
        .select("event_id", "ts", "user_id", "value", "roll_n", "roll_sum",
          "roll_min", "roll_max")
        .orderBy("event_id")
    }),
    "agg_downsample_locf" -> ((s, d) => {
      val day = 86400L * 1000000000L
      val ev = t(s, d, "events")
      val agg = ev.groupBy(expr(TsOps.floorBucketSql("ts", day)).as("bucket_ts"))
        .agg(count(lit(1)).as("n"), min("value").as("min_v"),
          max("value").as("max_v"), dsum(col("value")).as("sum_v"))
      val filled = TsOps.fillGaps(agg, day, ns("2023-12-25"), ns("2024-02-05"))
      TsOps.locf(filled, Seq("min_v", "max_v", "sum_v")).orderBy("bucket_ts")
    }),
    "meta_describe_all" -> ((s, d) =>
      Tables.describeDf(s, d, None).drop("updated_at")
        .withColumn("from_ts", col("from_ts") - pmod(col("from_ts"), lit(1000L)))
        .withColumn("end_ts", col("end_ts") - pmod(col("end_ts"), lit(1000L)))),
    "agg_event_type_stats" -> ((s, d) =>
      t(s, d, "events").groupBy("event_type")
        .agg(count(lit(1)).as("n"), countDistinct("user_id").as("n_users"),
          dsum(col("value")).as("sum_v"), min("value").as("min_v"),
          max("value").as("max_v"))
        .orderBy("event_type")),
    "json_props_stats" -> ((s, d) =>
      t(s, d, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          min("k").as("min_k"), max("k").as("max_k"))
        .orderBy("event_type")),
    "stream_downsample" -> ((s, d) => {
      // Structured Streaming rollup driven to completion (AvailableNow) and
      // returned as the materialized memory-sink table. Oracle-checked: on
      // static input the emitted set is exactly the buckets whose window end
      // is <= final watermark (max event time, ms-truncated, minus the 2h
      // lateness) — the batch downsample restricted to that subset. The sum
      // rides a decimal cast so partial-aggregation merge order across
      // micro-batch shuffles cannot perturb the double.
      val src = eventStream(s, d)
        .withColumn("value", col("value").cast("decimal(18,2)"))
      val agg = graft.streaming.StreamIngest.windowedDownsample(
        src, "value", "1 hour", "2 hours")
      runStreamToTable(s, agg, "stream_ds_out")
        .select(col("bucket_start_us"), col("n"),
          col("min_v").cast("double").as("min_v"),
          col("max_v").cast("double").as("max_v"),
          col("sum_v").cast("double").as("sum_v"))
        .orderBy("bucket_start_us")
    }),
    "tpch_q1" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),
    "tpch_q3" -> ((s, d) => {
      // shipping-priority shape (TPC-H Q3 on the synthetic star): segment
      // semi-join prunes orders early, both date filters push to the scans,
      // revenue aggregates per order, distributed top-10 finishes it. No
      // explicit broadcast hint: the filtered dims are auto-broadcast when
      // small and shuffle-joined when not — the honest cluster-scale plan.
      val cutoff = to_timestamp(lit("1998-06-01"))
      val cust = t(s, d, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val ord = t(s, d, "orders")
        .filter(col("o_orderdate") < cutoff)
        .join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
        .select("o_orderkey")
      // revenue in integer cents×(100−d·100): a double PRODUCT cast to
      // decimal can round-tie differently across engines (the raw
      // 2-decimal columns are exact, their product is not — measured at
      // sf0.1), so the multiplication happens in exact integer units
      t(s, d, "lineitem")
        .filter(col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(sum(epCents * (lit(100L) - disc100)).as("revenue_c4"))
        .orderBy(col("revenue_c4").desc, col("l_orderkey").asc)
        .limit(10)
    }),
    "tpch_q5" -> ((s, d) => {
      // local-supplier-volume shape (TPC-H Q5): five-way join with the
      // region→nation dim chain broadcast, date filter pushed to the
      // orders scan, and the c_nationkey = s_nationkey locality
      // predicate riding the supplier join
      val lo = to_timestamp(lit("1996-01-01"))
      val hi = to_timestamp(lit("1997-01-01"))
      val nation = t(s, d, "nation")
        .join(t(s, d, "region").filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val orders = t(s, d, "orders")
        .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
        .select("o_orderkey", "o_custkey")
      t(s, d, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer").select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(t(s, d, "supplier").select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        // same exact integer-cents revenue as tpch_q3 (product round-tie)
        .agg(sum(epCents * (lit(100L) - disc100)).as("revenue_c4"))
        .orderBy(col("revenue_c4").desc, col("n_name").asc)
    }),
    "tpch_q18" -> ((s, d) => {
      // large-quantity-order customers (TPC-H Q18): the aggregate-filtered
      // semi-join shape — lineitem pre-aggregates per order (partial aggs
      // combine map-side), HAVING keeps only the rare >300-qty orders, and
      // just those orderkeys flow into the customer/orders joins. The
      // big-order set is ~0.05% of orders, so AQE turns both joins into
      // broadcasts at runtime; the classic formulation's second
      // sum(l_quantity) per customer/order group is unnecessary — the join
      // on orderkey is 1:1 with the pre-aggregate, which already carries
      // the sum. Quantities are integral-valued doubles → exact BIGINT
      // sums on both engines; order date renders as a date string (engine-
      // portable, no timestamp-unit hazard).
      val big = t(s, d, "lineitem")
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
        .filter(col("sum_qty") > 300L)
      t(s, d, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(t(s, d, "customer").select("c_custkey", "c_name"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderdate").asc,
          col("o_orderkey").asc)
        .limit(100)
    }),
    "tpch_q4" -> ((s, d) => {
      // order-priority checking (TPC-H Q4): the EXISTS-semi-join shape —
      // the one classic join form Q1/Q3/Q5/Q18 don't cover. This dataset
      // carries no l_commitdate/l_receiptdate, so the "late order"
      // predicate becomes: some lineitem shipped ≥ 60 days after the
      // order date — which makes the semi-join CORRELATED beyond the key:
      // an equi-join on orderkey with the date comparison as a residual
      // predicate (never a range-join nested loop), and left_semi
      // guarantees each order counts once no matter how many late items
      // it has. The quarter filter pushes to the orders scan, so the
      // probe side is ~1% of orders; lineitem needs only 2 columns.
      val lo = to_timestamp(lit("1996-07-01"))
      val hi = to_timestamp(lit("1996-10-01"))
      val ord = t(s, d, "orders")
        .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
      val items = t(s, d, "lineitem").select("l_orderkey", "l_shipdate")
      ord.join(items,
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") >= col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),
    "tpch_q14" -> ((s, d) => {
      // promotion-effect shape (TPC-H Q14): one-month lineitem slice
      // joined to the part dim (broadcast), conditional revenue split by
      // p_type — emitted as the two exact cent-sums rather than the
      // classic float percentage, the engine's exact-units convention
      val lo = to_timestamp(lit("1995-09-01"))
      val hi = to_timestamp(lit("1995-10-01"))
      val rev = epCents * (lit(100L) - disc100)
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
        .select(col("l_partkey"), rev.as("__rev"))
        .join(broadcast(t(s, d, "part").select("p_partkey", "p_type")),
          col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", col("__rev"))
            .otherwise(0L)).as("promo_rev_c4"),
          sum(col("__rev")).as("total_rev_c4"))
    }),
    "tpch_q6" -> ((s, d) => {
      // forecast revenue change (TPC-H Q6): the pure scan-filter-agg
      // shape — no join at all; every predicate pushes to the parquet
      // scan (date + quantity natively, the discount band as the exact
      // integer disc100 in [5,7]); revenue = price · discount in exact
      // cent·basis-point units
      val lo = to_timestamp(lit("1996-01-01"))
      val hi = to_timestamp(lit("1997-01-01"))
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi &&
          disc100.between(5L, 7L) && col("l_quantity") < 24)
        .agg(sum(epCents * disc100).as("revenue_c4"),
          count(lit(1)).as("n_items"))
    }),
    "tpch_q7" -> ((s, d) => {
      // volume shipping (TPC-H Q7): the nation-pair join shape — both
      // nation dims filtered to the two trading partners and broadcast
      // (pruning suppliers/customers before the fact joins), the
      // disjunctive pair predicate as the residual, revenue grouped by
      // the derived ship year in exact cents
      val rev = epCents * (lit(100L) - disc100)
      val picked = t(s, d, "nation")
        .filter(col("n_name").isin("NATION_1", "NATION_2"))
      val supN = broadcast(picked.select(col("n_nationkey").as("__snk"),
        col("n_name").as("supp_nation")))
      val cusN = broadcast(picked.select(col("n_nationkey").as("__cnk"),
        col("n_name").as("cust_nation")))
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1995-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1997-01-01")))
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).cast("long").as("l_year"), rev.as("__rev"))
        .join(t(s, d, "supplier").select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey"))
        .join(supN, col("s_nationkey") === col("__snk"))
        .join(t(s, d, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer").select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(cusN, col("c_nationkey") === col("__cnk"))
        .filter((col("supp_nation") === "NATION_1" &&
            col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" &&
            col("cust_nation") === "NATION_1"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(sum("__rev").as("revenue_c4"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),
    "tpch_q13" -> ((s, d) => {
      // order-count distribution (TPC-H Q13): the LEFT OUTER join +
      // double-aggregation shape — zero-order customers must land in the
      // c_count=0 bucket, which an inner join silently drops; the order
      // exclusion predicate lives in the join (ON), not a post-filter
      // (this dataset has no o_comment, so the classic comment-pattern
      // exclusion becomes a priority-class exclusion — same plan shape)
      val ord = t(s, d, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select("o_orderkey", "o_custkey")
      t(s, d, "customer").select("c_custkey")
        .join(ord, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),
    "tpch_q17" -> ((s, d) => {
      // small-quantity-order revenue (TPC-H Q17): the correlated
      // scalar-subquery shape — l_quantity < 0.2 · avg(l_quantity) per
      // part — decorrelated to a per-part WINDOW aggregate over the
      // (brand, type)-selected parts' lineitems: bounded partitions
      // (lines per part) and ONE lineitem scan, where the agg+rejoin
      // form plans two (no exchange reuse across the differing
      // aggregates). The 0.2·avg threshold is decided by integer
      // cross-multiplication (5·qty·cnt < sum_qty — quantities are
      // integral-valued doubles), never a float division; the classic
      // "/7.0 avg_yearly" is emitted as the exact floor-divided cents
      val pt = broadcast(t(s, d, "part")
        .filter(col("p_brand") === "Brand#23" && col("p_type") === "MEDIUM")
        .select("p_partkey"))
      val w17 = Window.partitionBy("l_partkey")
      t(s, d, "lineitem")
        .join(pt, col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), col("l_quantity").cast("long").as("__qty"),
          epCents.as("__price_c"))
        .withColumn("__s", sum("__qty").over(w17))
        .withColumn("__n", count(lit(1)).over(w17))
        .filter(col("__qty") * lit(5L) * col("__n") < col("__s"))
        .agg(coalesce(sum("__price_c"), lit(0L)).as("small_qty_rev_c"),
          count(lit(1)).as("n_items"))
        .withColumn("avg_yearly_c", expr("small_qty_rev_c div 7"))
    }),
    "tpch_q19" -> ((s, d) => {
      // disjunctive-predicate shape (TPC-H Q19): revenue over an OR of
      // three (brand, size-range, quantity-range) branches — the
      // predicate class join reordering and pushdown must survive; the
      // join stays a broadcast of the part dim with the residual OR on top
      val rev = epCents * (lit(100L) - disc100)
      val li = t(s, d, "lineitem")
        .select(col("l_partkey"), col("l_quantity"), rev.as("__rev"))
      val pt = t(s, d, "part").select("p_partkey", "p_brand", "p_size")
      li.join(broadcast(pt), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#4" && col("p_size").between(10, 30) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#19" && col("p_size").between(20, 50) &&
            col("l_quantity").between(20, 30)))
        .agg(sum(col("__rev")).as("revenue_c4"), count(lit(1)).as("n_items"))
    }),
    "tpch_q22" -> ((s, d) => {
      // global-sales-opportunity shape (TPC-H Q22): scalar-aggregate
      // threshold + NOT EXISTS — the ANTI-join form Q4's semi join doesn't
      // cover (this dataset has no c_phone, so nationkey stands in for the
      // country-code grouping and "no orders since 1999" for dormancy).
      // The positive-balance average is never divided out: candidates
      // compare via the integer cross-multiplication bal_c·n_pos > s_c —
      // engine-exact where a float avg could round-tie (headroom: cents ≤
      // 1e6 × even 1e10 customers < 2^63). The 1-row aggregate broadcasts
      // onto customers (a BroadcastNestedLoopJoin over ONE row, not a
      // collect — stays a single job, no driver sync), and the anti join
      // is a hash join whose build side is the date-pruned orders slice.
      val cust = t(s, d, "customer").select(col("c_custkey"),
        col("c_nationkey"),
        (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long")
          .as("bal_c"))
      val thr = cust.filter(col("bal_c") > 0L)
        .agg(sum("bal_c").as("s_c"), count(lit(1)).as("n_pos"))
      val recent = t(s, d, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("1999-01-01")))
        .select("o_custkey")
      cust.crossJoin(broadcast(thr))
        .filter(col("bal_c") * col("n_pos") > col("s_c"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("numcust"), sum("bal_c").as("totacctbal_c"))
        .orderBy("c_nationkey")
    }),
    "tpch_q10" -> ((s, d) => {
      // returned-item reporting (TPC-H Q10): the aggregate-then-join
      // shape — revenue pre-aggregates per CUSTKEY (map-side partials)
      // BEFORE the customer join, so the join input is one row per
      // customer-with-returns, not one per return line; customer
      // attributes ride the equi-join afterwards (custkey determines
      // them — same result as the spec's wide GROUP BY, half the shuffle),
      // nation broadcasts at 25 rows, and the top-20 is a TakeOrdered,
      // never a global sort. Revenue in exact integer cents×(100−d·100)
      // (the q3/q5 round-tie rule); acctbal as integer cents (q22 rule).
      val lo = to_timestamp(lit("1996-07-01"))
      val hi = to_timestamp(lit("1996-10-01"))
      val ord = t(s, d, "orders")
        .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
        .select("o_orderkey", "o_custkey")
      val ret = t(s, d, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      val rev = ret.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(sum(epCents * (lit(100L) - disc100)).as("revenue_c4"))
      rev.join(t(s, d, "customer")
            .select("c_custkey", "c_name", "c_nationkey", "c_acctbal"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation").select("n_nationkey", "n_name")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"),
          (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long")
            .as("bal_c"),
          col("n_name"), col("revenue_c4"))
        .orderBy(col("revenue_c4").desc, col("c_custkey").asc)
        .limit(20)
    }),
    "tpch_q12" -> ((s, d) => {
      // shipping-mode/priority shape (TPC-H Q12): two conditional counts
      // over the orders⨝lineitem join in ONE pass — adapted to this
      // dataset like Q4 (no l_shipmode or commit/receipt dates):
      // l_linestatus stands in for the shipmode grouping and "shipped ≥
      // 60 days after order" for the late-arrival predicate. The year
      // filter pushes to the lineitem scan; the date comparison is a
      // RESIDUAL on the orderkey equi-join (hash, never a range-join
      // nested loop); both CASE sums fold into one partial aggregate.
      val lo = to_timestamp(lit("1996-01-01"))
      val hi = to_timestamp(lit("1997-01-01"))
      val items = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
        .select("l_orderkey", "l_shipdate", "l_linestatus")
      val hiPri = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      t(s, d, "orders")
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
        .join(items, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(sum(when(hiPri, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(hiPri, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy("l_linestatus")
    }),
    "tpch_q2" -> ((s, d) => {
      // minimum-cost-supplier shape (TPC-H Q2): the groupwise-MIN
      // correlated subquery — adapted like Q4/Q13/Q22 (no partsupp
      // table): supply cost per (part, supplier) is the MINIMUM observed
      // line price in exact cents from lineitem, the scope is EUROPE
      // suppliers of size-15 STANDARD parts. Decorrelated the way
      // Catalyst rewrites it: one per-part min over the scoped cost
      // frame as a per-part WINDOW MIN (bounded partitions — suppliers
      // per part — and ONE lineitem scan; the agg+rejoin alternative
      // plans two full scans because nothing makes the exchanges
      // reusable). The selected-part dim broadcasts BEFORE the cost
      // aggregation so the groupBy only shuffles the ~0.3% of lineitem
      // that can matter; ties on min cost all survive (classic Q2
      // semantics), order is total.
      val pt = broadcast(t(s, d, "part")
        .filter(col("p_size") === 15 && col("p_type") === "STANDARD")
        .select("p_partkey"))
      val eurSupp = t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation")
            .join(t(s, d, "region").filter(col("r_name") === "EUROPE"),
              col("n_regionkey") === col("r_regionkey"))
            .select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"),
          (col("s_acctbal").cast("decimal(18,2)") * 100).cast("long")
            .as("bal_c"))
      val cost = t(s, d, "lineitem")
        .join(pt, col("l_partkey") === col("p_partkey"))
        .join(eurSupp.select("s_suppkey"),
          col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(min(epCents).as("cost_c"))
      cost.withColumn("__min_c",
          min("cost_c").over(Window.partitionBy("l_partkey")))
        .filter(col("cost_c") === col("__min_c"))
        .join(eurSupp, col("l_suppkey") === col("s_suppkey"))
        .select(col("bal_c"), col("s_name"), col("n_name"),
          col("l_partkey").as("p_partkey"), col("cost_c"))
        .orderBy(col("bal_c").desc, col("n_name").asc, col("s_name").asc,
          col("p_partkey").asc)
        .limit(100)
    }),
    "tpch_q8" -> ((s, d) => {
      // national-market-share shape (TPC-H Q8): the 7-table join with a
      // conditional share per year. Both dim chains (part type filter;
      // customer nation→AMERICA region) broadcast-prune the fact side
      // before the orders join; the share is emitted as the two exact
      // cent·pct sums (numerator = NATION_3-supplied revenue) instead of
      // the classic float division — the engine's exact-units convention.
      val lo = to_timestamp(lit("1995-01-01"))
      val hi = to_timestamp(lit("1997-01-01"))
      val rev = epCents * (lit(100L) - disc100)
      val pt = broadcast(t(s, d, "part")
        .filter(col("p_type") === "ECONOMY").select("p_partkey"))
      val amerNations = broadcast(t(s, d, "nation")
        .join(t(s, d, "region").filter(col("r_name") === "AMERICA"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("__cnk")))
      val supN = broadcast(t(s, d, "nation")
        .select(col("n_nationkey").as("__snk"), col("n_name")))
      t(s, d, "lineitem")
        .join(pt, col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey"), col("l_suppkey"), rev.as("__rev"))
        .join(t(s, d, "supplier").select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey"))
        .join(supN, col("s_nationkey") === col("__snk"))
        .join(t(s, d, "orders")
            .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
            .select(col("o_orderkey"), col("o_custkey"),
              year(col("o_orderdate")).cast("long").as("o_year")),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer").select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(amerNations, col("c_nationkey") === col("__cnk"), "left_semi")
        .groupBy("o_year")
        .agg(sum(when(col("n_name") === "NATION_3", col("__rev"))
            .otherwise(0L)).as("nation_rev_c4"),
          sum(col("__rev")).as("total_rev_c4"))
        .orderBy("o_year")
    }),
    "tpch_q9" -> ((s, d) => {
      // product-type-profit shape (TPC-H Q9): profit per supplier nation
      // per order year over name-matched parts. Adapted (no partsupp):
      // supply cost is 50% of the part's retail price per unit, so
      // profit_c4 = rev_c4 − qty·retail_cents·50 in exact cent·pct units
      // (can go negative — BIGINT either way). The LIKE filter broadcasts
      // with the part dim; orders joins last and only for the year.
      val pt = broadcast(t(s, d, "part")
        .filter(col("p_name").like("%red%"))
        .select(col("p_partkey"),
          (col("p_retailprice").cast("decimal(18,2)") * 100).cast("long")
            .as("__rp_c")))
      val profit = epCents * (lit(100L) - disc100) -
        col("l_quantity").cast("long") * col("__rp_c") * lit(50L)
      t(s, d, "lineitem")
        .join(pt, col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey"), col("l_suppkey"), profit.as("__profit"))
        .join(t(s, d, "supplier").select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, d, "nation").select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .join(t(s, d, "orders").select(col("o_orderkey"),
            year(col("o_orderdate")).cast("long").as("o_year")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("n_name", "o_year")
        .agg(sum("__profit").as("profit_c4"))
        .orderBy(col("n_name").asc, col("o_year").desc)
    }),
    "tpch_q11" -> ((s, d) => {
      // important-stock shape (TPC-H Q11): groupwise value + global
      // scalar-fraction HAVING. Adapted (no partsupp): a part's stocked
      // value for NATION_7's suppliers is the exact cent sum of their
      // lineitem prices. The 1-row total broadcasts onto the per-part
      // aggregate (BroadcastNestedLoopJoin over ONE row, the q22
      // pattern) and the 0.01% threshold is decided by integer
      // cross-multiplication — never a float division.
      val natSupp = t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation")
            .filter(col("n_name") === "NATION_7").select("n_nationkey")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      val lines = t(s, d, "lineitem")
        .join(natSupp, col("l_suppkey") === col("s_suppkey"), "left_semi")
        .select(col("l_partkey"), epCents.as("__price_c"))
      // the per-part aggregate feeds BOTH the total and the output —
      // persist it so the lineitem scan + shuffle run once, not twice
      // (no exchange reuse across the differing downstream aggregates);
      // the frame is per-part metadata, orders smaller than the fact
      val perPart = lines.groupBy("l_partkey")
        .agg(sum("__price_c").as("value_c"))
        .persist()
      val total = perPart.agg(sum("value_c").as("__total_c"))
      perPart.crossJoin(broadcast(total))
        .filter(col("value_c") * lit(10000L) > col("__total_c"))
        .select(col("l_partkey").as("p_partkey"), col("value_c"))
        .orderBy(col("value_c").desc, col("p_partkey").asc)
    }),
    "tpch_q15" -> ((s, d) => {
      // top-supplier shape (TPC-H Q15): the revenue view + scalar-MAX
      // subquery. One quarter's per-supplier revenue aggregates in exact
      // cent·pct units; the view is PERSISTED because the max branch and
      // the output branch would otherwise each rescan lineitem (the
      // differing downstream aggregates defeat exchange reuse) — the
      // frame is per-supplier, orders smaller than the fact. The 1-row
      // max broadcasts back; ties all survive, classic semantics.
      val lo = to_timestamp(lit("1996-01-01"))
      val hi = to_timestamp(lit("1996-04-01"))
      val rev = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
        .groupBy("l_suppkey")
        .agg(sum(epCents * (lit(100L) - disc100)).as("total_rev_c4"))
        .persist()
      val mx = rev.agg(max("total_rev_c4").as("__max_rev"))
      rev.crossJoin(broadcast(mx))
        .filter(col("total_rev_c4") === col("__max_rev"))
        .join(t(s, d, "supplier").select("s_suppkey", "s_name"),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_rev_c4"))
        .orderBy("s_suppkey")
    }),
    "tpch_q16" -> ((s, d) => {
      // supplier-count-by-part-attribute shape (TPC-H Q16): DISTINCT
      // pairs + NOT IN exclusion + count(DISTINCT). Adapted: the
      // part-supplier relation is the distinct (partkey, suppkey) pairs
      // observed in lineitem (standing in for partsupp), and "complaint"
      // suppliers are those with negative balance, excluded via a
      // broadcast ANTI join (never a NOT IN null-trap). The distinct
      // runs AFTER the broadcast part-attribute join so partial
      // aggregation dedups map-side on the already-pruned rows.
      val pt = broadcast(t(s, d, "part")
        .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 23))
        .select("p_partkey", "p_brand", "p_type", "p_size"))
      val complaints = t(s, d, "supplier")
        .filter(col("s_acctbal") < 0).select("s_suppkey")
      t(s, d, "lineitem").select("l_partkey", "l_suppkey")
        .join(pt, col("l_partkey") === col("p_partkey"))
        .join(broadcast(complaints),
          col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand").asc,
          col("p_type").asc, col("p_size").asc)
    }),
    "tpch_q20" -> ((s, d) => {
      // part-promotion shape (TPC-H Q20): the nested IN-subquery chain —
      // name-matched parts → per-(part, supplier) correlated quantity
      // threshold → supplier semi-join → nation filter. Adapted (no
      // partsupp availqty): a pair qualifies when its 1996 shipments
      // exceed HALF its all-time shipments (the same agg-vs-correlated-
      // agg comparison, decided by integer cross-multiplication). Both
      // sums fold into ONE conditional aggregate pass — no self-join of
      // lineitem against itself.
      val lo = to_timestamp(lit("1996-01-01"))
      val hi = to_timestamp(lit("1997-01-01"))
      val pt = broadcast(t(s, d, "part")
        .filter(col("p_name").like("red%")).select("p_partkey"))
      val qty = col("l_quantity").cast("long")
      val in96 = col("l_shipdate") >= lo && col("l_shipdate") < hi
      val qual = t(s, d, "lineitem")
        .join(pt, col("l_partkey") === col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(sum(when(in96, qty).otherwise(0L)).as("__q96"),
          sum(qty).as("__qall"))
        .filter(col("__q96") * lit(2L) > col("__qall"))
        .select("l_suppkey").distinct()
      t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation")
            .filter(col("n_name") === "NATION_4").select("n_nationkey")),
          col("s_nationkey") === col("n_nationkey"))
        .join(qual, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    }),
    "tpch_q21" -> ((s, d) => {
      // waiting-supplier shape (TPC-H Q21): the EXISTS + NOT-EXISTS
      // double self-correlation on lineitem — decorrelated into ONE
      // per-order aggregate: count distinct suppliers and distinct LATE
      // suppliers per finished order ("late" = shipped >90 days after
      // order date, the Q4/Q12 adaptation), then a supplier's qualifying
      // lines are its late lines in orders with >1 supplier where it is
      // the ONLY late one. One lineitem scan feeds both the aggregate
      // and the probe (ReuseExchange); the classic form would self-join
      // lineitem twice.
      val ords = t(s, d, "orders")
        .filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate")
      val li = t(s, d, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(ords, col("l_orderkey") === col("o_orderkey"))
        .withColumn("__late",
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey", "__late")
      val perOrd = li.groupBy("l_orderkey")
        .agg(countDistinct(col("l_suppkey")).as("__n_supp"),
          countDistinct(when(col("__late"), col("l_suppkey")))
            .as("__n_late"))
        .filter(col("__n_supp") > 1L && col("__n_late") === 1L)
        .select(col("l_orderkey").as("__ok"))
      li.filter(col("__late"))
        .join(perOrd, col("l_orderkey") === col("__ok"), "left_semi")
        .join(t(s, d, "supplier")
            .join(broadcast(t(s, d, "nation")
                .filter(col("n_name") === "NATION_2")
                .select("n_nationkey")),
              col("s_nationkey") === col("n_nationkey"))
            .select("s_suppkey", "s_name"),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name").asc)
        .limit(100)
    }),
    "ts_active_users" -> ((s, d) =>
      // DAU + trailing-7d WAU: bounded explode over the deduplicated
      // (user, day) frame, no per-day self-join (see TsOps.activeUsers)
      TsOps.activeUsers(tsUs(t(s, d, "events")), "user_id",
        dayNanos = 86400L * 1000000000L).orderBy("day")),
    // grouping-set subtotals (nation × segment) in ONE pass each: rollup
    // emits detail + per-nation + grand-total, cube adds the segment
    // marginal — a single shuffle where naive per-level queries would
    // re-scan per level. NULL markers coalesce to 'ALL' for an engine-
    // independent total order. SQL formulation: the DataFrame rollup's
    // Expand duplicates the grouping attributes and a following select
    // trips the ambiguous-self-join checker (the same plan through the
    // SQL parser resolves cleanly); nation auto-broadcasts at 25 rows.
    "agg_rollup_revenue" -> groupingSetRevenue("ROLLUP", "gr"),
    "agg_cube_revenue" -> groupingSetRevenue("CUBE", "gc"),
    "agg_pivot_types" -> ((s, d) => {
      // day × event-type count matrix via pivot with an EXPLICIT type
      // list — the plan stays a single two-phase agg (no distinct-values
      // pre-scan, deterministic schema at any scale)
      val day = 86400L * 1000000000L
      t(s, d, "events")
        .groupBy(expr(TsOps.floorDivSql("ts", day)).as("day"))
        .pivot("event_type", Seq("view", "click", "purchase", "signup"))
        .agg(count(lit(1)))
        .select(col("day"),
          coalesce(col("view"), lit(0L)).as("n_view"),
          coalesce(col("click"), lit(0L)).as("n_click"),
          coalesce(col("purchase"), lit(0L)).as("n_purchase"),
          coalesce(col("signup"), lit(0L)).as("n_signup"))
        .orderBy("day")
    }),
    "join_revenue_by_nation" -> ((s, d) => {
      val orders   = t(s, d, "orders")
      val customer = t(s, d, "customer")
      val nation   = t(s, d, "nation")
      orders
        .join(customer, orders("o_custkey") === customer("c_custkey"))
        .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
        .orderBy("n_name")
    }),
    "join_revenue_salted" -> ((s, d) => {
      // the salted-join path must produce byte-identical results to the
      // plain join — same oracle SQL as join_revenue_by_nation
      val orders = t(s, d, "orders").withColumnRenamed("o_custkey", "custkey")
      val customer = t(s, d, "customer").withColumnRenamed("c_custkey", "custkey")
      val nation = t(s, d, "nation")
      graft.operators.Skew.saltedJoin(orders, customer, Seq("custkey"))
        .join(broadcast(nation), col("c_nationkey") === nation("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
        .orderBy("n_name")
    }),
    "join_bucketed" -> ((s, d) => {
      // the CO-LOCATED form of join_revenue_by_nation: orders and customer
      // are hash-bucketed (and sorted) on the join key at WRITE time, so
      // the fact-fact join reads matching buckets directly — no Exchange
      // on either side (PlanAuditSpec pins the plan). This is the layout
      // for fact tables that outlive one query: pay the bucketed write
      // once, join shuffle-free forever after. Identical result to the
      // shuffle join, so it shares join_revenue_by_nation's value oracle.
      val (ot, ct) = bucketedOrdersCustomer(s, d)
      val orders = s.table(ot)
      val customer = s.table(ct)
      orders
        .join(customer.hint("merge"),
          orders("o_custkey") === customer("c_custkey"))
        .join(broadcast(t(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
        .orderBy("n_name")
    }),
    "agg_downsample_interp" -> ((s, d) => {
      val day = 86400L * 1000000000L
      val ev = t(s, d, "events")
      val agg = ev.groupBy(expr(TsOps.floorBucketSql("ts", day)).as("bucket_ts"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_v"))
      val filled = TsOps.fillGaps(agg, day, ns("2023-12-25"), ns("2024-02-05"))
      TsOps.interpolate(filled, "sum_v")
        .select("bucket_ts", "n", "sum_v").orderBy("bucket_ts")
    }),
    "stream_sessionize" -> ((s, d) => {
      // stateful streaming sessionize driven to completion: emitted sessions
      // are (a) closed by a later event, or (b) timed out once the final
      // watermark (max event ms - 10min lateness) passes last + gap. The
      // batch sessionize restricted to that subset is the oracle. Gap math
      // runs on µs-truncated ts so DuckDB agrees on boundaries; sum_v is
      // omitted (double accumulation order across state updates is not
      // oracle-stable — counts/extrema are).
      Tables.configure(s)
      val src = tsUs(eventStream(s, d))
      val sess = graft.streaming.StreamIngest.statefulSessionize(
        src.select("user_id", "ts", "value"),
        gapNanos = 3600L * 1000000000L, lateness = "10 minutes")
      runStreamToTable(s, sess.toDF(), "stream_sess_out")
        .select("user_id", "session_start", "session_end", "n_events")
        .orderBy("user_id", "session_start")
    }),
    "window_top_orders" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rn")
    }),
    "asof_purchase_view" -> ((s, d) => {
      val ev = t(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "ts", "user_id", "value")
      val views = ev.filter(col("event_type") === "view")
        .select("user_id", "ts", "value")
      val joined = TsOps.asofJoin(purchases, views, Seq("user_id"))
      tsUs(joined)
        .withColumn("r_ts", col("r_ts") - pmod(col("r_ts"), lit(1000L)))
        .orderBy("event_id")
    }),
    "sessionize_stats" -> ((s, d) => {
      // gap computation on µs-truncated ts so the DuckDB oracle (which only
      // sees µs) agrees on boundary gaps
      val ev = tsUs(t(s, d, "events")).select("user_id", "ts")
      TsOps.sessionize(ev, 3600L * 1000000000L, Seq("user_id"))
        .groupBy("user_id", "session_idx")
        .agg(count(lit(1)).as("n_events"), min("ts").as("session_start"),
          max("ts").as("session_end"))
        .orderBy("user_id", "session_idx")
    }),
    "sessionize_chunked_stats" -> ((s, d) => {
      // the hot-key-safe sessionize variant (heavy window keyed on
      // (user, day-chunk), per-key sequential work only over chunk
      // summaries) — row-identical to sessionize_stats, so it shares that
      // value oracle; TsOpsSpec proves equality on a planted 30%-hot key
      val ev = tsUs(t(s, d, "events")).select("user_id", "ts")
      TsOps.sessionizeChunked(ev, 3600L * 1000000000L, Seq("user_id"))
        .groupBy("user_id", "session_idx")
        .agg(count(lit(1)).as("n_events"), min("ts").as("session_start"),
          max("ts").as("session_end"))
        .orderBy("user_id", "session_idx")
    }),
    "text_top_tokens" -> ((s, d) =>
      t(s, d, "documents")
        .select(explode(graft.pipeline.Text.tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok").asc)
        .limit(50)),
    "meta_block_list" -> ((s, d) =>
      Tables.blockListDf(s, d, Some("events")).drop("updated_at")
        .withColumn("block_start",
          col("block_start") - pmod(col("block_start"), lit(1000L)))
        .withColumn("block_end",
          col("block_end") - pmod(col("block_end"), lit(1000L))))
  )

  private val analyticsOracles: Map[String, String] = Map(
    "ts_tolerance_join" ->
      """SELECT e.user_id, e.event_id AS err_id, epoch_ns(e.ts) AS err_ts,
        |  c.event_id AS clk_id, epoch_ns(c.ts) AS clk_ts,
        |  epoch_ns(c.ts) - epoch_ns(e.ts) AS delta_ns
        |FROM events e JOIN events c ON e.user_id = c.user_id
        | AND e.event_type = 'error' AND c.event_type = 'click'
        | AND abs(epoch_ns(c.ts) - epoch_ns(e.ts)) <= 3600000000000
        |ORDER BY e.user_id, err_id, clk_id""".stripMargin,
    "ts_path_trigrams" ->
      """WITH p AS (
        |  SELECT event_type AS s1,
        |    lead(event_type, 1) OVER w AS s2,
        |    lead(event_type, 2) OVER w AS s3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |)
        |SELECT s1, s2, s3, count(*) AS n FROM p WHERE s3 IS NOT NULL
        |GROUP BY 1, 2, 3 ORDER BY n DESC, s1, s2, s3 LIMIT 20""".stripMargin,
    // peeling unrolled: each round re-derives degrees over the previous
    // round's edge set and re-scopes it to the >= k survivors — rounds
    // past the fixpoint are identity, so 6 unrolled rounds cover any
    // converged-within-6 state (the Spark side fails loudly otherwise)
    "graph_kcore" -> {
      val k = 30
      val rounds = 6
      // AS MATERIALIZED is load-bearing: inlined, each round re-expands
      // the whole prior chain (4^rounds parquet scans — DuckDB runs out
      // of file handles before it runs out of patience)
      val head =
        """WITH pairs AS MATERIALIZED (
          |  SELECT DISTINCT least(o_custkey * 2, l_suppkey * 2 + 1) AS src,
          |                  greatest(o_custkey * 2, l_suppkey * 2 + 1) AS dst
          |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          |), e0 AS MATERIALIZED (SELECT src, dst FROM pairs)""".stripMargin
      val steps = (1 to rounds).map { i =>
        s""",
           |keep$i AS MATERIALIZED (SELECT node FROM (
           |  SELECT node, count(*) AS d FROM (
           |    SELECT src AS node FROM e${i - 1}
           |    UNION ALL SELECT dst FROM e${i - 1})
           |  GROUP BY 1) WHERE d >= $k),
           |e$i AS MATERIALIZED (SELECT e.src, e.dst FROM e${i - 1} e
           |  JOIN keep$i k1 ON e.src = k1.node
           |  JOIN keep$i k2 ON e.dst = k2.node)""".stripMargin
      }.mkString
      head + steps +
        s"""
           |SELECT node, count(*) AS deg FROM (
           |  SELECT src AS node FROM e$rounds
           |  UNION ALL SELECT dst FROM e$rounds)
           |GROUP BY 1 ORDER BY node""".stripMargin
    },
    // the oracle aggregates the RAW table at daily grain; the query answers
    // from the 1h rollup store — equality proves partial composition
    "rollup_store_daily" ->
      """SELECT (epoch_ns(ts) // 86400000000000) * 86400000000000
        |    AS bucket_ts,
        |  count(*) AS n,
        |  CAST(min(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_v,
        |  CAST(max(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_v,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
        |FROM events GROUP BY 1 ORDER BY bucket_ts""".stripMargin,
    // grain re-derived as a literal: span 30d / budget 40 → 18h raw →
    // 41 widened buckets → 19h (39 buckets); the widened serving bounds
    // cover the whole data span, so no filter
    "rollup_route" ->
      """SELECT (epoch_ns(ts) // 68400000000000) * 68400000000000
        |    AS bucket_ts,
        |  count(*) AS n,
        |  CAST(min(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_v,
        |  CAST(max(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_v,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
        |  CAST(68400000000000 AS BIGINT) AS grain_ns,
        |  'store' AS source
        |FROM events GROUP BY 1 ORDER BY bucket_ts""".stripMargin,
    // the tiered route CLAMPS to the stored 1h grain (2000 points would
    // demand ~22min buckets, but the pre-horizon samples exist only at
    // 1h) and stitches store+raw — the oracle is the NEVER-tiered table
    // at that grain, so equality proves completeness
    "rollup_route_tiered" ->
      """SELECT (epoch_ns(ts) // 3600000000000) * 3600000000000
        |    AS bucket_ts,
        |  count(*) AS n,
        |  CAST(min(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_v,
        |  CAST(max(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_v,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
        |  CAST(3600000000000 AS BIGINT) AS grain_ns,
        |  'stitched' AS source
        |FROM events GROUP BY 1 ORDER BY bucket_ts""".stripMargin,
    // with no raw table the month-long fine budget clamps to the daily
    // tier the range touches — the oracle is the raw table at that grain
    "rollup_route_mirror" ->
      """SELECT (epoch_ns(ts) // 86400000000000) * 86400000000000
        |    AS bucket_ts,
        |  count(*) AS n,
        |  CAST(min(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_v,
        |  CAST(max(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_v,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
        |  CAST(86400000000000 AS BIGINT) AS grain_ns,
        |  'stitched' AS source
        |FROM events GROUP BY 1 ORDER BY bucket_ts""".stripMargin,
    // over the cascade the fine budget clamps to the coarsest touched
    // tier (the 1d store) — the oracle is the never-tiered table at the
    // daily grain
    "rollup_cascade_route" ->
      """SELECT (epoch_ns(ts) // 86400000000000) * 86400000000000
        |    AS bucket_ts,
        |  count(*) AS n,
        |  CAST(min(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_v,
        |  CAST(max(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_v,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
        |  CAST(86400000000000 AS BIGINT) AS grain_ns,
        |  'stitched' AS source
        |FROM events GROUP BY 1 ORDER BY bucket_ts""".stripMargin,
    // the keyed (dimensional) store: per-series daily stats — the oracle
    // groups the raw table by the same key, so equality proves the keyed
    // partials compose exactly per series
    "rollup_keyed_daily" ->
      """SELECT event_type,
        |  (epoch_ns(ts) // 86400000000000) * 86400000000000 AS bucket_ts,
        |  count(*) AS n,
        |  CAST(min(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_v,
        |  CAST(max(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_v,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
        |FROM events GROUP BY 1, 2
        |ORDER BY event_type, bucket_ts""".stripMargin,
    // the variance recording rule: the store's (n, Σv, Σv²) stitched
    // across the tier boundary equal the direct per-(series, day) pass —
    // var_num is the exact integer-valued rational both engines compute
    // in decimal before one double cast
    "rollup_store_stddev" ->
      """WITH e AS (
        |  SELECT event_type, epoch_ns(ts) AS ts,
        |    CAST(value AS DECIMAL(18,2)) AS v
        |  FROM events
        |)
        |SELECT event_type,
        |  (ts // 86400000000000) * 86400000000000 AS bucket_ts,
        |  count(*) AS n,
        |  CAST(count(*) * sum(v*v) - sum(v)*sum(v) AS DOUBLE) AS var_num
        |FROM e GROUP BY 1, 2
        |ORDER BY event_type, bucket_ts""".stripMargin,
    // the keyed router: same 19h grain derivation as rollup_route (the
    // budget is on the time axis), grouped by the store's key
    "rollup_keyed_route" ->
      """SELECT event_type,
        |  (epoch_ns(ts) // 68400000000000) * 68400000000000 AS bucket_ts,
        |  count(*) AS n,
        |  CAST(min(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_v,
        |  CAST(max(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_v,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
        |  CAST(68400000000000 AS BIGINT) AS grain_ns,
        |  'store' AS source
        |FROM events GROUP BY 1, 2
        |ORDER BY event_type, bucket_ts""".stripMargin,
    // one series zoomed: the key predicate pushed into the router — the
    // oracle is the same 19h grain over the FILTERED raw table
    "rollup_keyed_route_one" ->
      """SELECT event_type,
        |  (epoch_ns(ts) // 68400000000000) * 68400000000000 AS bucket_ts,
        |  count(*) AS n,
        |  CAST(min(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_v,
        |  CAST(max(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_v,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
        |  CAST(68400000000000 AS BIGINT) AS grain_ns,
        |  'store' AS source
        |FROM events WHERE event_type = 'click' GROUP BY 1, 2
        |ORDER BY bucket_ts""".stripMargin,
    // n value-oracled per series; the per-key sketch estimate gated by
    // the rank-error bound (rollup_store_users's convention)
    "rollup_keyed_users" ->
      """SELECT event_type,
        |  (epoch_ns(ts) // 86400000000000) * 86400000000000 AS bucket_ts,
        |  count(*) AS n, CAST(1 AS BIGINT) AS hll_ok
        |FROM events GROUP BY 1, 2
        |ORDER BY event_type, bucket_ts""".stripMargin,
    // n value-oracled from raw; the sketch equality is JVM-side (DuckDB
    // has no DataSketches HLL) — the sketch-store gate convention
    "rollup_store_users" ->
      """SELECT (epoch_ns(ts) // 86400000000000) * 86400000000000
        |    AS bucket_ts,
        |  count(*) AS n, CAST(1 AS BIGINT) AS hll_ok
        |FROM events GROUP BY 1 ORDER BY bucket_ts""".stripMargin,
    // the per-day mirror of ts_histogram_quantile's arithmetic, computed
    // directly over raw — equality proves the stored hourly counter
    // arrays compose exactly to the daily histogram
    "rollup_store_p90" -> {
      val bounds = "[500, 1000, 2500, 5000, 10000, 25000]::BIGINT[]"
      val day = 86400L * 1000000000L
      s"""WITH v AS (
         |  SELECT (epoch_ns(ts) // $day) * $day AS bucket_ts,
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
         |  FROM events
         |), b AS (
         |  SELECT bucket_ts,
         |    coalesce(list_min(list_filter($bounds, x -> x >= cents)),
         |      9223372036854775807) AS le
         |  FROM v WHERE cents IS NOT NULL
         |), c AS (
         |  SELECT bucket_ts, le, count(*) AS cnt FROM b GROUP BY 1, 2
         |), w AS (
         |  SELECT bucket_ts, le, cnt,
         |    sum(cnt) OVER (PARTITION BY bucket_ts ORDER BY le) AS cum,
         |    coalesce(list_max(list_filter($bounds, x -> x < le)),
         |      CAST(0 AS BIGINT)) AS prev_le,
         |    sum(cnt) OVER (PARTITION BY bucket_ts) AS total
         |  FROM c
         |), f AS (
         |  SELECT *, row_number() OVER (PARTITION BY bucket_ts ORDER BY le)
         |    AS rn
         |  FROM w WHERE cum * 100 >= total * 90
         |)
         |SELECT bucket_ts, CAST(total AS BIGINT) AS n,
         |  CAST(CASE WHEN le = 9223372036854775807 THEN 25000
         |       ELSE prev_le + ((le - prev_le) *
         |         (90 * total - 100 * (cum - cnt))) // (100 * cnt)
         |  END AS BIGINT) AS q_cents
         |FROM f WHERE rn = 1 ORDER BY bucket_ts""".stripMargin
    },
    // mirrors histogramQuantile's integer fixed point exactly: same bucket
    // assignment off the literal schedule, same cross-multiplied rank
    // comparison, same floor-divided interpolation
    "ts_histogram_quantile" -> {
      val bounds = "[500, 1000, 2500, 5000, 10000, 25000]::BIGINT[]"
      s"""WITH v AS (
         |  SELECT event_type,
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
         |  FROM events
         |), b AS (
         |  SELECT event_type,
         |    coalesce(list_min(list_filter($bounds, x -> x >= cents)),
         |      9223372036854775807) AS le
         |  FROM v WHERE cents IS NOT NULL
         |), c AS (
         |  SELECT event_type, le, count(*) AS cnt FROM b GROUP BY 1, 2
         |), w AS (
         |  SELECT event_type, le, cnt,
         |    sum(cnt) OVER (PARTITION BY event_type ORDER BY le) AS cum,
         |    coalesce(list_max(list_filter($bounds, x -> x < le)),
         |      CAST(0 AS BIGINT)) AS prev_le,
         |    sum(cnt) OVER (PARTITION BY event_type) AS total
         |  FROM c
         |), f AS (
         |  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY le)
         |    AS rn
         |  FROM w WHERE cum * 100 >= total * 90
         |)
         |SELECT event_type, CAST(total AS BIGINT) AS n,
         |  CAST(CASE WHEN le = 9223372036854775807 THEN 25000
         |       ELSE prev_le + ((le - prev_le) *
         |         (90 * total - 100 * (cum - cnt))) // (100 * cnt)
         |  END AS BIGINT) AS q_cents
         |FROM f WHERE rn = 1 ORDER BY event_type""".stripMargin
    },
    // the LTTB walk re-derived relationally: a transition table holds, for
    // every (bucket, possible previous choice), the argmax-area point —
    // then a recursive CTE walks the actual choice chain. Every floor
    // division, tie-break, and the first/last-bucket rules mirror
    // RecurrenceOps.lttb exactly (HUGEINT clears the avg division by
    // multiplying through by the next bucket's count)
    "ts_lttb" ->
      """WITH RECURSIVE pts AS (
        |  SELECT user_id % 64 AS sid, epoch_ns(ts) AS ts, event_id AS id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM events
        |), base AS (
        |  SELECT sid, ts, id, c,
        |    (ts - min(ts) OVER (PARTITION BY sid)) // 1000000000 AS rel,
        |    ts // 21600000000000 AS b
        |  FROM pts
        |), anch AS (
        |  SELECT sid, ts, id, c, rel, b FROM (
        |    SELECT *, row_number() OVER (PARTITION BY sid ORDER BY ts, id)
        |      AS rn FROM base) WHERE rn = 1
        |), beyond AS (
        |  SELECT p.sid, p.ts, p.id, p.c, p.rel, p.b,
        |    dense_rank() OVER (PARTITION BY p.sid ORDER BY p.b) AS bi
        |  FROM base p JOIN anch a ON p.sid = a.sid AND p.b > a.b
        |), mm AS (SELECT sid, max(bi) AS m FROM beyond GROUP BY sid),
        |avgs AS (
        |  SELECT sid, bi, count(*) AS n, sum(rel) AS sx, sum(c) AS sy
        |  FROM beyond GROUP BY 1, 2
        |), t1 AS (
        |  SELECT sid, ts, id, c FROM (
        |    SELECT p.sid, p.ts, p.id, p.c,
        |      row_number() OVER (PARTITION BY p.sid ORDER BY
        |        abs((CAST(a.rel AS HUGEINT) * v.n - v.sx) * (p.c - a.c)
        |          - CAST(a.rel - p.rel AS HUGEINT)
        |            * (v.sy - CAST(a.c AS HUGEINT) * v.n)) DESC,
        |        p.ts, p.id) AS rn
        |    FROM beyond p
        |    JOIN anch a ON a.sid = p.sid
        |    JOIN avgs v ON v.sid = p.sid AND v.bi = 2
        |    JOIN mm ON mm.sid = p.sid AND mm.m >= 2
        |    WHERE p.bi = 1
        |  ) WHERE rn = 1
        |), tj AS (
        |  SELECT sid, bi, prev_ts, prev_id, ts, id, c FROM (
        |    SELECT p.sid, p.bi, q.ts AS prev_ts, q.id AS prev_id,
        |      p.ts, p.id, p.c,
        |      row_number() OVER (PARTITION BY p.sid, p.bi, q.ts, q.id
        |        ORDER BY
        |        abs((CAST(q.rel AS HUGEINT) * v.n - v.sx) * (p.c - q.c)
        |          - CAST(q.rel - p.rel AS HUGEINT)
        |            * (v.sy - CAST(q.c AS HUGEINT) * v.n)) DESC,
        |        p.ts, p.id) AS rn
        |    FROM beyond p
        |    JOIN beyond q ON q.sid = p.sid AND q.bi = p.bi - 1
        |    JOIN avgs v ON v.sid = p.sid AND v.bi = p.bi + 1
        |    JOIN mm ON mm.sid = p.sid AND p.bi < mm.m
        |    WHERE p.bi >= 2
        |  ) WHERE rn = 1
        |), walk AS (
        |  SELECT sid, CAST(1 AS BIGINT) AS bi, ts, id, c FROM t1
        |  UNION ALL
        |  SELECT t.sid, w.bi + 1, t.ts, t.id, t.c
        |  FROM walk w JOIN tj t ON t.sid = w.sid AND t.bi = w.bi + 1
        |    AND t.prev_ts = w.ts AND t.prev_id = w.id
        |), lastp AS (
        |  SELECT sid, ts, id, c FROM (
        |    SELECT sid, ts, id, c, row_number() OVER (PARTITION BY sid
        |      ORDER BY ts DESC, id DESC) AS rn
        |    FROM base) WHERE rn = 1
        |)
        |SELECT DISTINCT sid, ts, id AS event_id, c AS cents FROM (
        |  SELECT sid, ts, id, c FROM anch
        |  UNION ALL SELECT sid, ts, id, c FROM walk
        |  UNION ALL SELECT sid, ts, id, c FROM lastp
        |) ORDER BY sid, ts, event_id""".stripMargin,
    // order-independent a<b<c three-join — counts the same triangles the
    // degree-ordered orientation does, via a structurally different plan,
    // so it validates the algorithm rather than mirroring it
    "graph_triangles" ->
      """WITH pairs AS (
        |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |), nn AS (
        |  SELECT count(DISTINCT node) AS n_nodes FROM (
        |    SELECT src AS node FROM pairs UNION ALL SELECT dst FROM pairs)
        |), m AS (SELECT count(*) AS n_edges FROM pairs),
        |tri AS (
        |  SELECT count(*) AS n_triangles
        |  FROM pairs e1
        |  JOIN pairs e2 ON e1.dst = e2.src
        |  JOIN pairs e3 ON e3.src = e1.src AND e3.dst = e2.dst
        |)
        |SELECT nn.n_nodes, m.n_edges, tri.n_triangles
        |FROM nn, m, tri""".stripMargin,
    "agg_downsample_1h" ->
      s"""SELECT (epoch_ns(ts) // $BucketH) * $BucketH AS bucket_ts,
         |  count(*) AS n, min(value) AS min_v, max(value) AS max_v,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
         |FROM events GROUP BY 1 ORDER BY bucket_ts""".stripMargin,
    "agg_downsample_gapfill" -> {
      val day = 86400L * 1000000000L
      s"""WITH buckets AS (
         |  SELECT generate_series AS bucket_ts
         |  FROM generate_series(${ns("2023-12-25")}, ${ns("2024-02-05") - 1}, $day)
         |), a AS (
         |  SELECT (epoch_ns(ts) // $day) * $day AS bucket_ts,
         |    count(*) AS n, min(value) AS min_v, max(value) AS max_v,
         |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
         |  FROM events GROUP BY 1
         |)
         |SELECT b.bucket_ts, coalesce(a.n, 0) AS n, a.min_v, a.max_v, a.sum_v
         |FROM buckets b LEFT JOIN a ON a.bucket_ts = b.bucket_ts
         |ORDER BY b.bucket_ts""".stripMargin
    },
    "agg_hopping_24h_6h" ->
      """WITH w AS (
        |  SELECT unnest(range(
        |      (epoch_ns(ts) // 21600000000000 - 3) * 21600000000000,
        |      (epoch_ns(ts) // 21600000000000) * 21600000000000 + 1,
        |      21600000000000)) AS window_start,
        |    value
        |  FROM events
        |)
        |SELECT window_start, count(*) AS n, min(value) AS min_v,
        |  max(value) AS max_v
        |FROM w GROUP BY window_start ORDER BY window_start""".stripMargin,
    "ts_retention" ->
      """WITH a AS (
        |  SELECT DISTINCT user_id,
        |    epoch_ns(ts) // 86400000000000 AS day
        |  FROM events
        |), c AS (
        |  SELECT user_id, min(day) AS cohort_day FROM a GROUP BY user_id
        |)
        |SELECT cohort_day, day - cohort_day AS day_offset,
        |  CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
        |FROM a JOIN c USING (user_id)
        |GROUP BY cohort_day, day_offset
        |ORDER BY cohort_day, day_offset""".stripMargin,
    "ts_interval_join" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) AS ts, event_type, value FROM events
        |), s AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > 3600000000000 THEN 1
        |         ELSE 0 END AS is_new
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), c AS (
        |  SELECT user_id, ts,
        |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        |  FROM s
        |), g AS (
        |  SELECT user_id, session_idx, min(ts) AS session_start,
        |         max(ts) AS session_end
        |  FROM c GROUP BY user_id, session_idx
        |)
        |SELECT g.user_id, g.session_idx, count(*) AS n_purchases,
        |  CAST(sum(CAST(p.value AS DECIMAL(18,2))) AS DOUBLE) AS purchase_value
        |FROM g JOIN e p ON p.user_id = g.user_id
        |  AND p.ts BETWEEN g.session_start AND g.session_end
        |WHERE p.event_type = 'purchase'
        |GROUP BY g.user_id, g.session_idx
        |ORDER BY g.user_id, g.session_idx""".stripMargin,
    "ts_heatmap" ->
      """SELECT ((epoch_ns(ts) // 86400000000000) + 4) % 7 AS dow,
        |  (epoch_ns(ts) % 86400000000000) // 3600000000000 AS hour,
        |  count(*) AS n
        |FROM events GROUP BY dow, hour ORDER BY dow, hour""".stripMargin,
    "ts_concurrency" -> {
      val hour = 3600L * 1000000000L
      s"""WITH e AS (
         |  SELECT user_id, epoch_ns(ts) AS ts FROM events
         |), s AS (
         |  SELECT user_id, ts,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |           OR ts - lag(ts) OVER w > $hour THEN 1
         |         ELSE 0 END AS is_new
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
         |), c AS (
         |  SELECT user_id, ts,
         |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
         |  FROM s
         |), g AS (
         |  SELECT min(ts) AS s, max(ts) AS e
         |  FROM c GROUP BY user_id, session_idx
         |), grid AS (
         |  SELECT generate_series AS ts FROM generate_series(
         |    ${ns("2023-12-25")}, ${ns("2024-02-05") - 1}, $hour)
         |)
         |SELECT grid.ts, count(*) AS n_active
         |FROM grid JOIN g ON grid.ts BETWEEN g.s AND g.e
         |GROUP BY grid.ts ORDER BY grid.ts""".stripMargin
    },
    "agg_value_quantiles" ->
      """WITH c AS (
        |  SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL
        |)
        |SELECT event_type, count(*) AS n,
        |  quantile_cont(c, 0.25) AS p25,
        |  quantile_cont(c, 0.5) AS p50,
        |  quantile_cont(c, 0.75) AS p75
        |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin,
    "ts_event_features" ->
      """WITH e AS (
        |  SELECT event_id, epoch_ns(ts) AS ts, user_id, event_type
        |  FROM events
        |)
        |SELECT event_id, ts, user_id, event_type,
        |  CAST(row_number() OVER w AS BIGINT) AS seq_idx,
        |  lag(event_type) OVER w AS prev_type,
        |  lead(event_type) OVER w AS next_type,
        |  ts - lag(ts) OVER w AS gap_prev,
        |  lead(ts) OVER w - ts AS gap_next
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,
    "ts_counter_increase" ->
      // same floor-mod day idiom as ts_seasonal_anomaly (DuckDB %//
      // truncate; the engine floors), same lag/tie total order as ts_gaps
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) AS ts, event_id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM events
        |), p AS (
        |  SELECT user_id, ts, c,
        |    lag(c) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev
        |  FROM e WHERE c IS NOT NULL
        |)
        |SELECT user_id,
        |  (ts - ((ts % 86400000000000) + 86400000000000) % 86400000000000)
        |    // 86400000000000 AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_deltas,
        |  CAST(sum(CASE WHEN c >= prev THEN c - prev ELSE c END)
        |    AS BIGINT) AS inc_cents,
        |  CAST(sum(CASE WHEN c < prev THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_resets
        |FROM p WHERE prev IS NOT NULL
        |GROUP BY 1, 2
        |ORDER BY user_id, bucket""".stripMargin,
    "ts_transitions" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) AS ts, event_id, event_type
        |  FROM events
        |), p AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS to_type
        |  FROM e
        |)
        |SELECT from_type, to_type, count(*) AS n
        |FROM p WHERE to_type IS NOT NULL
        |GROUP BY from_type, to_type
        |ORDER BY from_type, to_type""".stripMargin,
    "ts_gaps" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) AS ts FROM events),
        |g AS (
        |  SELECT user_id,
        |    ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS gap
        |  FROM e
        |)
        |SELECT user_id, count(*) AS n_gaps, min(gap) AS min_gap,
        |  max(gap) AS max_gap, CAST(sum(gap) AS BIGINT) AS sum_gap
        |FROM g WHERE gap IS NOT NULL GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    // stagewise min-aggregation mirror of the greedy funnel
    "ts_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(epoch_ns(ts)) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id
        |), s2 AS (
        |  SELECT e.user_id, min(epoch_ns(e.ts)) AS t2
        |  FROM events e JOIN s1 USING (user_id)
        |  WHERE event_type = 'click' AND epoch_ns(e.ts) > t1
        |    AND epoch_ns(e.ts) <= t1 + 604800000000000
        |  GROUP BY e.user_id
        |), s3 AS (
        |  SELECT e.user_id, min(epoch_ns(e.ts)) AS t3
        |  FROM events e JOIN s1 USING (user_id) JOIN s2 USING (user_id)
        |  WHERE event_type = 'purchase' AND epoch_ns(e.ts) > t2
        |    AND epoch_ns(e.ts) <= t1 + 604800000000000
        |  GROUP BY e.user_id
        |)
        |SELECT user_id, t1, t2, t3
        |FROM s1 JOIN s2 USING (user_id) JOIN s3 USING (user_id)
        |ORDER BY user_id""".stripMargin,
    "ts_mad_anomaly" ->
      """WITH c AS (
        |  SELECT event_id, epoch_ns(ts) AS ts, user_id, value,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM events
        |), m AS (
        |  SELECT user_id, count(c) AS n_pts,
        |    CAST(quantile_cont(c, 0.5) * 2 AS BIGINT) AS med2
        |  FROM c GROUP BY user_id
        |), d AS (
        |  SELECT c.event_id, c.ts, c.user_id, c.value, m.med2,
        |    abs(c.c * 2 - m.med2) AS dev2
        |  FROM c JOIN m ON c.user_id IS NOT DISTINCT FROM m.user_id
        |  WHERE m.n_pts >= 10
        |), md AS (
        |  SELECT user_id, CAST(quantile_cont(dev2, 0.5) * 2 AS BIGINT)
        |    AS mad4
        |  FROM d GROUP BY user_id
        |)
        |SELECT d.event_id, d.ts, d.user_id, d.value, d.med2, d.dev2,
        |  md.mad4
        |FROM d JOIN md ON d.user_id IS NOT DISTINCT FROM md.user_id
        |WHERE d.dev2 * 2 > 3 * md.mad4
        |ORDER BY d.event_id""".stripMargin,
    "ts_seasonal_anomaly" ->
      // DuckDB %/// truncate toward zero; the engine floors (pmod + div).
      // tod = floor-mod(ts, day) and (ts - tod)//day = floor-div make the
      // calendar cells engine-identical even for pre-1970 timestamps
      """WITH e0 AS (
        |  SELECT event_id, epoch_ns(ts) AS ts, value,
        |    ((epoch_ns(ts) % 86400000000000) + 86400000000000)
        |      % 86400000000000 AS tod,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM events
        |), e AS (
        |  SELECT event_id, ts, value, c,
        |    (((ts - tod) // 86400000000000 + 4) % 7 + 7) % 7 AS dow,
        |    tod // 3600000000000 AS hour
        |  FROM e0
        |), cells AS (
        |  SELECT dow, hour, count(c) AS cell_n,
        |    CAST(sum(c) AS BIGINT) AS s, CAST(sum(c*c) AS BIGINT) AS sq
        |  FROM e GROUP BY dow, hour HAVING count(c) >= 10
        |)
        |SELECT e.event_id, e.ts, e.dow, e.hour, cells.cell_n, e.value
        |FROM e JOIN cells USING (dow, hour)
        |WHERE CAST(cells.cell_n * e.c - cells.s AS HUGEINT)
        |        * (cells.cell_n * e.c - cells.s)
        |      > 4 * (CAST(cells.cell_n AS HUGEINT) * cells.sq
        |        - CAST(cells.s AS HUGEINT) * cells.s)
        |ORDER BY e.event_id""".stripMargin,
    "ts_paa_symbols" ->
      // floor-mod idiom: the engine's seg = ts - pmod(ts, m) floors, so
      // the oracle must too (DuckDB % truncates — divergent pre-1970)
      """WITH e AS (
        |  SELECT user_id,
        |    epoch_ns(ts) - ((epoch_ns(ts) % 21600000000000)
        |      + 21600000000000) % 21600000000000 AS seg,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM events
        |), segs AS (
        |  SELECT user_id, seg, count(c) AS seg_n,
        |    CAST(sum(c) AS BIGINT) AS seg_sum
        |  FROM e GROUP BY 1, 2 HAVING count(c) > 0
        |)
        |SELECT user_id, seg, seg_n, seg_sum,
        |  CAST(ntile(4) OVER (PARTITION BY user_id
        |    ORDER BY CAST(seg_sum AS DOUBLE) / seg_n, seg) AS BIGINT)
        |    AS symbol
        |FROM segs ORDER BY user_id, seg""".stripMargin,
    "ts_sax_words" ->
      """WITH e AS (
        |  SELECT user_id,
        |    epoch_ns(ts) - ((epoch_ns(ts) % 21600000000000)
        |      + 21600000000000) % 21600000000000 AS seg,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM events
        |), segs AS (
        |  SELECT user_id, seg, count(c) AS seg_n,
        |    CAST(sum(c) AS BIGINT) AS seg_sum
        |  FROM e GROUP BY 1, 2 HAVING count(c) > 0
        |), syms AS (
        |  SELECT user_id, seg,
        |    ntile(4) OVER (PARTITION BY user_id
        |      ORDER BY CAST(seg_sum AS DOUBLE) / seg_n, seg) AS symbol
        |  FROM segs
        |)
        |SELECT user_id,
        |  string_agg(chr(CAST(96 + symbol AS INTEGER)), ''
        |    ORDER BY seg) AS word,
        |  count(*) AS n_segments
        |FROM syms GROUP BY user_id ORDER BY user_id""".stripMargin,
    "ts_ewma" ->
      """WITH RECURSIVE base AS (
        |  SELECT user_id, epoch_ns(ts) AS ts, event_id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_ns(ts), event_id) AS rn
        |  FROM events
        |), rec AS (
        |  SELECT user_id, ts, event_id, cents, rn,
        |    cents * 16 AS ewma_num
        |  FROM base WHERE rn = 1
        |  UNION ALL
        |  -- floor-division idiom (DuckDB // truncates; engine floors):
        |  -- harmless on this non-negative data, load-bearing if a corpus
        |  -- ever carries negative values
        |  SELECT b.user_id, b.ts, b.event_id, b.cents, b.rn,
        |    r.ewma_num
        |      - (r.ewma_num - (((r.ewma_num % 16) + 16) % 16)) // 16
        |      + b.cents
        |  FROM rec r JOIN base b
        |    ON b.user_id = r.user_id AND b.rn = r.rn + 1
        |)
        |SELECT user_id, ts, event_id, cents, ewma_num,
        |  (ewma_num - (((ewma_num % 16) + 16) % 16)) // 16 AS ewma_cents
        |FROM rec ORDER BY user_id, ts, event_id""".stripMargin,
    "ts_holt" ->
      """WITH RECURSIVE base AS (
        |  SELECT user_id, epoch_ns(ts) AS ts, event_id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_ns(ts), event_id) AS rn
        |  FROM events
        |), rec AS (
        |  SELECT user_id, ts, event_id, cents, rn,
        |    cents * 1048576 AS l, CAST(0 AS BIGINT) AS b
        |  FROM base WHERE rn = 1
        |  UNION ALL
        |  -- DuckDB // truncates toward zero; the engine floors. With the
        |  -- divisor positive, floor(x/d) = (x - ((x % d) + d) % d) // d
        |  SELECT q.user_id, q.ts, q.event_id, q.cents, q.rn, q.l1,
        |    q.b0 + (q.l1 - q.drift
        |      - (((q.l1 - q.drift) % 16) + 16) % 16) // 16
        |  FROM (
        |    SELECT q0.*,
        |      q0.drift + (q0.d1 - (((q0.d1 % 8) + 8) % 8)) // 8 AS l1
        |    FROM (
        |      SELECT b2.user_id, b2.ts, b2.event_id, b2.cents, b2.rn,
        |        r.b AS b0, r.l + r.b AS drift,
        |        b2.cents * 1048576 - r.l - r.b AS d1
        |      FROM rec r JOIN base b2
        |        ON b2.user_id = r.user_id AND b2.rn = r.rn + 1) q0) q
        |)
        |SELECT user_id, ts, event_id, cents, l AS level_num, b AS trend_num,
        |  (l + b - (((l + b) % 1048576) + 1048576) % 1048576) // 1048576
        |    AS fc1_cents
        |FROM rec ORDER BY user_id, ts, event_id""".stripMargin,
    "ts_cusum" ->
      """WITH RECURSIVE base AS (
        |  SELECT user_id, epoch_ns(ts) AS ts, event_id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_ns(ts), event_id) AS rn
        |  FROM events
        |), rec AS (
        |  SELECT user_id, ts, event_id, cents, rn,
        |    greatest(0, cents - 5000 - 500) AS sp0,
        |    greatest(0, -(cents - 5000) - 500) AS sn0,
        |    CASE WHEN greatest(0, cents - 5000 - 500) > 20000
        |           OR greatest(0, -(cents - 5000) - 500) > 20000
        |         THEN 1 ELSE 0 END AS alarm
        |  FROM base WHERE rn = 1
        |  UNION ALL
        |  SELECT b.user_id, b.ts, b.event_id, b.cents, b.rn,
        |    greatest(0, CASE WHEN r.alarm = 1 THEN 0 ELSE r.sp0 END
        |      + (b.cents - 5000) - 500),
        |    greatest(0, CASE WHEN r.alarm = 1 THEN 0 ELSE r.sn0 END
        |      - (b.cents - 5000) - 500),
        |    CASE WHEN greatest(0, CASE WHEN r.alarm = 1 THEN 0 ELSE r.sp0
        |        END + (b.cents - 5000) - 500) > 20000
        |      OR greatest(0, CASE WHEN r.alarm = 1 THEN 0 ELSE r.sn0 END
        |        - (b.cents - 5000) - 500) > 20000
        |      THEN 1 ELSE 0 END
        |  FROM rec r JOIN base b
        |    ON b.user_id = r.user_id AND b.rn = r.rn + 1
        |)
        |SELECT user_id, ts, event_id, cents, sp0 AS s_pos, sn0 AS s_neg,
        |  CAST(alarm AS BIGINT) AS alarm
        |FROM rec ORDER BY user_id, ts, event_id""".stripMargin,
    "dedup_containment" ->
      s"""$SharedPairsSqlPrefix
         |SELECT id1, id2, shared, n1, n2,
         |       CAST(shared AS DOUBLE) / n1 AS c_ab,
         |       CAST(shared AS DOUBLE) / n2 AS c_ba
         |FROM p
         |WHERE greatest(CAST(shared AS DOUBLE) / n1,
         |               CAST(shared AS DOUBLE) / n2) >= 0.6
         |ORDER BY id1, id2""".stripMargin,
    // brute-force all-pairs — deliberately NOT the engine's candidate
    // scheme, so it independently validates SymSpell blocking recall
    // (the length-band prefilter is implied by ed <= 1, not a heuristic)
    "dedup_fuzzy_pairs" ->
      """WITH k AS (
        |  SELECT doc_id,
        |    substr(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'),
        |           1, 40) AS key
        |  FROM documents
        |)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(levenshtein(a.key, b.key) AS INTEGER) AS dist
        |FROM k a JOIN k b ON a.doc_id < b.doc_id
        |  AND abs(length(a.key) - length(b.key)) <= 1
        |WHERE levenshtein(a.key, b.key) <= 1
        |ORDER BY doc_a, doc_b""".stripMargin,
    "sketch_overlap" ->
      s"""WITH tok AS (
        |  SELECT DISTINCT lang, tok FROM (
        |    SELECT lang, unnest($DuckToks) AS tok FROM documents)
        |)
        |SELECT a.lang AS group_a, b.lang AS group_b,
        |  count(*) AS n_int, CAST(1 AS BIGINT) AS est_ok
        |FROM tok a JOIN tok b ON a.tok = b.tok AND a.lang < b.lang
        |GROUP BY 1, 2 ORDER BY group_a, group_b""".stripMargin,
    "graph_pagerank" -> {
      // the 3 supersteps unrolled as CTEs it1..it3 — recursive CTEs cannot
      // aggregate in the recursive term, so the fixed iteration count is
      // generated here (the Spark side loops the same constant)
      val s = 1073741824L // 2^30, matching GraphOps.pageRank scaleLog2=30
      val head =
        s"""WITH pairs AS (
           |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
           |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
           |), e AS (
           |  SELECT src, dst FROM pairs
           |  UNION ALL SELECT dst, src FROM pairs
           |), nodes AS (
           |  SELECT DISTINCT node FROM (
           |    SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
           |), nn AS (SELECT count(*) AS n FROM nodes),
           |deg AS (SELECT src, count(*) AS od FROM e GROUP BY 1),
           |it0 AS (
           |  SELECT node, $s // (SELECT n FROM nn) AS pr FROM nodes)""".stripMargin
      val steps = (1 to 3).map { i =>
        s"""it$i AS (
           |  SELECT n.node,
           |    (15 * CAST($s AS BIGINT)) // (100 * (SELECT n FROM nn)) +
           |      (85 * COALESCE(c.s, 0)) // 100 AS pr
           |  FROM nodes n LEFT JOIN (
           |    SELECT e.dst AS node, sum(p.pr // d.od) AS s
           |    FROM e JOIN it${i - 1} p ON p.node = e.src
           |    JOIN deg d ON d.src = e.src
           |    GROUP BY e.dst) c ON c.node = n.node)""".stripMargin
      }
      (head +: steps).mkString(",\n") +
        "\nSELECT node, CAST(pr AS BIGINT) AS pr FROM it3 ORDER BY node"
    },
    "zorder_scan" ->
      s"""SELECT event_id, epoch_ns(ts) AS ts, user_id, event_type, value
        |FROM events
        |WHERE user_id >= 100 AND user_id < 200
        |  AND epoch_ns(ts) >= ${ns("2024-01-10")}
        |  AND epoch_ns(ts) < ${ns("2024-01-15")}
        |ORDER BY event_id""".stripMargin,
    "text_compress_ratio" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS raw_bytes,
        |  CAST(1 AS BIGINT) AS ratio_ok
        |FROM documents WHERE text IS NOT NULL AND text <> ''
        |ORDER BY doc_id""".stripMargin,
    "ts_rate_cusum" ->
      """WITH RECURSIVE c AS (
        |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS b,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2
        |), span AS (
        |  SELECT user_id, min(b) AS b0, max(b) AS b1 FROM c GROUP BY 1
        |), grid AS (
        |  SELECT user_id, unnest(range(b0, b1 + 1)) AS b FROM span
        |), base AS (
        |  SELECT g.user_id, g.b * 86400000000000 AS ts, g.b AS day_idx,
        |    COALESCE(c.n, 0) * 100 AS cents,
        |    row_number() OVER (PARTITION BY g.user_id ORDER BY g.b) AS rn
        |  FROM grid g LEFT JOIN c ON c.user_id = g.user_id AND c.b = g.b
        |), rec AS (
        |  SELECT user_id, ts, day_idx, cents, rn,
        |    greatest(0, cents - 300 - 100) AS sp0,
        |    greatest(0, -(cents - 300) - 100) AS sn0,
        |    CASE WHEN greatest(0, cents - 300 - 100) > 600
        |           OR greatest(0, -(cents - 300) - 100) > 600
        |         THEN 1 ELSE 0 END AS alarm
        |  FROM base WHERE rn = 1
        |  UNION ALL
        |  SELECT b.user_id, b.ts, b.day_idx, b.cents, b.rn,
        |    greatest(0, CASE WHEN r.alarm = 1 THEN 0 ELSE r.sp0 END
        |      + (b.cents - 300) - 100),
        |    greatest(0, CASE WHEN r.alarm = 1 THEN 0 ELSE r.sn0 END
        |      - (b.cents - 300) - 100),
        |    CASE WHEN greatest(0, CASE WHEN r.alarm = 1 THEN 0 ELSE r.sp0
        |        END + (b.cents - 300) - 100) > 600
        |      OR greatest(0, CASE WHEN r.alarm = 1 THEN 0 ELSE r.sn0 END
        |        - (b.cents - 300) - 100) > 600
        |      THEN 1 ELSE 0 END
        |  FROM rec r JOIN base b
        |    ON b.user_id = r.user_id AND b.rn = r.rn + 1
        |)
        |SELECT user_id, ts, day_idx, cents, sp0 AS s_pos, sn0 AS s_neg,
        |  CAST(alarm AS BIGINT) AS alarm
        |FROM rec ORDER BY user_id, ts""".stripMargin,
    "retrieval_bm25" ->
      s"""${bm25RankedCtes(10)}
        |SELECT query_id, doc_id, score, n_terms, rank
        |FROM bm25r ORDER BY query_id, rank""".stripMargin,
    "retrieval_hybrid_rrf" ->
      s"""${bm25RankedCtes(20)},
        |qd AS (
        |  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec
        |  FROM embeddings WHERE vec_id IN (1, 2, 3)
        |), cd AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
        |), dsc AS (
        |  SELECT qid, vec_id,
        |    list_dot_product(qvec, vec) /
        |      (sqrt(list_dot_product(qvec, qvec)) * sqrt(list_dot_product(vec, vec))) AS cos
        |  FROM qd CROSS JOIN cd WHERE qid <> vec_id
        |), denser AS (
        |  SELECT qid AS query_id, vec_id AS doc_id, rank FROM (
        |    SELECT qid, vec_id,
        |      row_number() OVER (PARTITION BY qid
        |        ORDER BY cos DESC, vec_id ASC) AS rank
        |    FROM dsc) WHERE rank <= 20
        |), fused AS (
        |  SELECT COALESCE(b.query_id, d.query_id) AS query_id,
        |    COALESCE(b.doc_id, d.doc_id) AS doc_id,
        |    COALESCE(1048576 // (60 + b.rank), 0)
        |      + COALESCE(1048576 // (60 + d.rank), 0) AS rrf_score
        |  FROM bm25r b FULL OUTER JOIN denser d
        |    ON b.query_id = d.query_id AND b.doc_id = d.doc_id
        |)
        |SELECT query_id, doc_id, CAST(rrf_score AS BIGINT) AS rrf_score,
        |  rrf_rank
        |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY rrf_score DESC, doc_id ASC) AS rrf_rank FROM fused)
        |WHERE rrf_rank <= 10 ORDER BY query_id, rrf_rank""".stripMargin,
    "text_quality_score" ->
      s"""WITH f AS (
        |  SELECT doc_id,
        |    CASE WHEN length(text) > 0 THEN
        |      CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()-]', '', 'g')) AS DOUBLE) / length(text)
        |    ELSE 0.0 END AS punct_ratio,
        |    CASE WHEN length(text) > 0 THEN
        |      CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / length(text)
        |    ELSE 0.0 END AS digit_ratio,
        |    CASE WHEN length(text) > 0 THEN
        |      CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE) / length(text)
        |    ELSE 0.0 END AS ws_ratio,
        |    CASE WHEN len($DuckToks) > 0 THEN
        |      CAST(len(list_filter($DuckToks,
        |        x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','was','at','by'], x))) AS DOUBLE)
        |        / len($DuckToks)
        |    ELSE 0.0 END AS stopword_ratio,
        |    CASE WHEN len($DuckToks) > 0 THEN
        |      CAST(list_sum(list_transform($DuckToks, x -> length(x))) AS DOUBLE)
        |        / len($DuckToks)
        |    ELSE 0.0 END AS mean_token_len,
        |    CAST(least(len($DuckToks), 100) AS DOUBLE) / 100.0 AS len_ramp
        |  FROM documents
        |), sc AS (
        |  SELECT doc_id,
        |    0.0 + 3.0 * stopword_ratio + -2.0 * punct_ratio
        |        + -4.0 * digit_ratio + 1.0 * ws_ratio
        |        + -0.25 * mean_token_len + 2.0 * len_ramp AS q_score
        |  FROM f
        |)
        |SELECT doc_id, q_score,
        |  CASE WHEN q_score >= 0.5 THEN CAST(1 AS BIGINT)
        |       ELSE CAST(0 AS BIGINT) END AS q_keep
        |FROM sc ORDER BY doc_id""".stripMargin,
    "ts_zscore_anomaly" ->
      """WITH b AS (
        |  SELECT event_id, epoch_ns(ts) AS ts, user_id, value,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM events
        |), w AS (
        |  SELECT event_id, ts, user_id, value, c,
        |    count(c) OVER win AS roll_n,
        |    CAST(sum(c) OVER win AS BIGINT) AS s,
        |    CAST(sum(c*c) OVER win AS BIGINT) AS sq
        |  FROM b
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts
        |    RANGE BETWEEN 604800000000000 PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_id, ts, user_id, value, roll_n,
        |  (roll_n*c - s)*(roll_n*c - s) AS lhs,
        |  4*(roll_n*sq - s*s) AS rhs
        |FROM w
        |WHERE roll_n >= 10
        |  AND (roll_n*c - s)*(roll_n*c - s) > 4*(roll_n*sq - s*s)
        |ORDER BY event_id""".stripMargin,
    "rolling_24h_stats" ->
      """SELECT event_id, epoch_ns(ts) AS ts, user_id, value,
        |  count(*) OVER w AS roll_n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS roll_sum,
        |  min(value) OVER w AS roll_min,
        |  max(value) OVER w AS roll_max
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts)
        |  RANGE BETWEEN 86400000000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "agg_downsample_locf" -> {
      val day = 86400L * 1000000000L
      s"""WITH buckets AS (
         |  SELECT generate_series AS bucket_ts
         |  FROM generate_series(${ns("2023-12-25")}, ${ns("2024-02-05") - 1}, $day)
         |), a AS (
         |  SELECT (epoch_ns(ts) // $day) * $day AS bucket_ts,
         |    count(*) AS n, min(value) AS min_v, max(value) AS max_v,
         |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
         |  FROM events GROUP BY 1
         |), filled AS (
         |  SELECT b.bucket_ts, coalesce(a.n, 0) AS n, a.min_v, a.max_v, a.sum_v
         |  FROM buckets b LEFT JOIN a ON a.bucket_ts = b.bucket_ts
         |)
         |SELECT bucket_ts, n,
         |  last_value(min_v IGNORE NULLS) OVER w AS min_v,
         |  last_value(max_v IGNORE NULLS) OVER w AS max_v,
         |  last_value(sum_v IGNORE NULLS) OVER w AS sum_v
         |FROM filled
         |WINDOW w AS (ORDER BY bucket_ts ROWS UNBOUNDED PRECEDING)
         |ORDER BY bucket_ts""".stripMargin
    },
    "meta_describe_all" -> {
      val noTs = Seq("customer", "documents", "embeddings", "lineitem",
        "nation", "orders", "part", "region", "supplier")
      val rows = noTs.map(n =>
        s"SELECT '$n' AS metrics, CAST(1 AS BIGINT) AS block_num, " +
          s"(SELECT count(*) FROM $n) AS row_num, " +
          "CAST(NULL AS BIGINT) AS from_ts, CAST(NULL AS BIGINT) AS end_ts")
      (rows :+ ("SELECT 'events' AS metrics, CAST(1 AS BIGINT) AS block_num, " +
        "count(*) AS row_num, " +
        "min(epoch_ns(ts)) AS from_ts, max(epoch_ns(ts)) AS end_ts FROM events"))
        .mkString("", " UNION ALL ", " ORDER BY metrics")
    },
    "agg_event_type_stats" ->
      """SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
        |  min(value) AS min_v, max(value) AS max_v
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // the oracle re-derives the SAME deterministic sample from raw (the
    // md5 bit-prefix membership — the first-8-hex-chars value below
    // 2^(32-bits) — is engine-portable) and applies the same integer
    // scale-up — the estimates hash-match exactly. bits = 5 → rate 1/32,
    // deliberately not a power of 16 (the bit ladder's whole point)
    "aqp_event_stats" ->
      """WITH sm AS (
        |  SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM events
        |  WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
        |          ::BIGINT < (CAST(1 AS BIGINT) << 27)
        |)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_sample,
        |  CAST(count(*) * 32 AS BIGINT) AS est_count,
        |  CAST(sum(c) * 32 AS BIGINT) AS est_sum_cents,
        |  CAST(sum(c * c) * 32 * 31 AS BIGINT) AS est_var_cents2
        |FROM sm GROUP BY event_type ORDER BY event_type""".stripMargin,
    "aqp_window" ->
      s"""WITH sm AS (
         |  SELECT event_type,
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
         |  FROM events
         |  WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
         |          ::BIGINT < (CAST(1 AS BIGINT) << 27)
         |    AND epoch_ns(ts) >= ${ns("2024-01-10")}
         |    AND epoch_ns(ts) < ${ns("2024-01-20")}
         |)
         |SELECT event_type, CAST(count(*) AS BIGINT) AS n_sample,
         |  CAST(count(*) * 32 AS BIGINT) AS est_count,
         |  CAST(sum(c) * 32 AS BIGINT) AS est_sum_cents,
         |  CAST(sum(c * c) * 32 * 31 AS BIGINT) AS est_var_cents2
         |FROM sm GROUP BY event_type ORDER BY event_type""".stripMargin,
    "aqp_stratified" ->
      s"""WITH e AS (
         |  SELECT event_id, value,
         |    CAST(floor(value / 100) AS BIGINT) AS band
         |  FROM events
         |), pm AS (
         |  SELECT band, $DuckBitsLadder AS p
         |  FROM e GROUP BY band
         |), sm AS (
         |  SELECT e.band,
         |    CAST(CAST(e.value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
         |    (CAST(1 AS BIGINT) << pm.p) AS rd
         |  FROM e JOIN pm USING (band)
         |  WHERE ('0x' || substr(md5(CAST(e.event_id AS VARCHAR)), 1, 8))
         |          ::BIGINT < (CAST(1 AS BIGINT) << (32 - pm.p))
         |)
         |SELECT band, CAST(count(*) AS BIGINT) AS n_sample,
         |  CAST(sum(rd) AS BIGINT) AS est_count,
         |  CAST(sum(c * rd) AS BIGINT) AS est_sum_cents,
         |  CAST(sum(c * c * rd * (rd - 1)) AS BIGINT) AS est_var_cents2
         |FROM sm GROUP BY band ORDER BY band""".stripMargin,
    "aqp_retained" ->
      s"""WITH sm AS (
         |  SELECT event_type,
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
         |  FROM events
         |  WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
         |          ::BIGINT < (CAST(1 AS BIGINT) << 28)
         |    AND epoch_ns(ts) >= ${ns("2024-01-10")}
         |)
         |SELECT event_type, CAST(count(*) AS BIGINT) AS n_sample,
         |  CAST(count(*) * 16 AS BIGINT) AS est_count,
         |  CAST(sum(c) * 16 AS BIGINT) AS est_sum_cents,
         |  CAST(sum(c * c) * 16 * 15 AS BIGINT) AS est_var_cents2
         |FROM sm GROUP BY event_type ORDER BY event_type""".stripMargin,
    // the seed-frozen stratified mirror: rates derive from the FIRST
    // half-month's counts only (the map freezes at build), every event
    // row samples under that map, and strata absent from the seed fall
    // back to keep-all (p = 0) — the appendStratified contract
    "stream_aqp_stratified" ->
      s"""WITH e AS (
         |  SELECT event_id, value, epoch_ns(ts) AS tsn,
         |    CAST(floor(value / 100) AS BIGINT) AS band
         |  FROM events
         |), pm AS (
         |  SELECT band, $DuckBitsLadder AS p
         |  FROM e WHERE tsn < ${ns("2024-01-16")} GROUP BY band
         |), sm AS (
         |  SELECT e.band,
         |    CAST(CAST(e.value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
         |    (CAST(1 AS BIGINT) << coalesce(pm.p, 0)) AS rd
         |  FROM e LEFT JOIN pm USING (band)
         |  WHERE ('0x' || substr(md5(CAST(e.event_id AS VARCHAR)), 1, 8))
         |          ::BIGINT <
         |        (CAST(1 AS BIGINT) << (32 - coalesce(pm.p, 0)))
         |)
         |SELECT band, CAST(count(*) AS BIGINT) AS n_sample,
         |  CAST(sum(rd) AS BIGINT) AS est_count,
         |  CAST(sum(c * rd) AS BIGINT) AS est_sum_cents,
         |  CAST(sum(c * c * rd * (rd - 1)) AS BIGINT) AS est_var_cents2
         |FROM sm GROUP BY band ORDER BY band""".stripMargin,
    // the weighted-quantile mirror: each sampled row REPLICATES rate_den
    // times (unnest over range), then plain quantile_cont — exactly the
    // multiset Spark's percentile(c, p, frequency) interpolates over
    "aqp_quantiles" ->
      s"""WITH e AS (
         |  SELECT event_id, event_type, value,
         |    CAST(floor(value / 100) AS BIGINT) AS band
         |  FROM events
         |), pm AS (
         |  SELECT band, $DuckBitsLadder AS p
         |  FROM e GROUP BY band
         |), sm AS (
         |  SELECT e.event_type,
         |    CAST(CAST(e.value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
         |    (CAST(1 AS BIGINT) << pm.p) AS rd
         |  FROM e JOIN pm USING (band)
         |  WHERE ('0x' || substr(md5(CAST(e.event_id AS VARCHAR)), 1, 8))
         |          ::BIGINT < (CAST(1 AS BIGINT) << (32 - pm.p))
         |    AND CAST(CAST(e.value AS DECIMAL(18,2)) * 100 AS BIGINT)
         |        IS NOT NULL
         |), rep AS (
        |  SELECT event_type, c
        |  FROM (SELECT event_type, c, unnest(range(rd)) AS __i FROM sm)
        |)
        |SELECT event_type, n_sample, q25, q50, q75
        |FROM (SELECT event_type, CAST(count(*) AS BIGINT) AS n_sample
        |      FROM sm GROUP BY event_type)
        |JOIN (SELECT event_type, quantile_cont(c, 0.25) AS q25,
        |        quantile_cont(c, 0.5) AS q50,
        |        quantile_cont(c, 0.75) AS q75
        |      FROM rep GROUP BY event_type) USING (event_type)
        |ORDER BY event_type""".stripMargin,
    "aqp_error_report" ->
      """WITH est AS (
        |  SELECT event_type, CAST(count(*) * 32 AS BIGINT) AS est_count
        |  FROM events
        |  WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
        |          ::BIGINT < (CAST(1 AS BIGINT) << 27)
        |  GROUP BY event_type
        |), ex AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_exact
        |  FROM events GROUP BY event_type
        |)
        |SELECT event_type, n_exact, est_count,
        |  CAST(abs(est_count - n_exact) * 1000 // n_exact AS BIGINT)
        |    AS err_permille
        |FROM est JOIN ex USING (event_type)
        |ORDER BY event_type""".stripMargin,
    // the routed fine zoom: 1-minute buckets of the 1/32 sample over
    // one day — grain and bounds are the router's own arithmetic
    // (span 86400e9 / 1440 points = 60e9, day-aligned so widening is
    // the identity), mirrored here as literals
    "rollup_route_aqp" ->
      s"""WITH sm AS (
         |  SELECT (epoch_ns(ts) - epoch_ns(ts) % 60000000000)
         |      AS bucket_ts,
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
         |  FROM events
         |  WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
         |          ::BIGINT < (CAST(1 AS BIGINT) << 27)
         |    AND epoch_ns(ts) >= ${ns("2024-01-05")}
         |    AND epoch_ns(ts) < ${ns("2024-01-06")}
         |)
         |SELECT bucket_ts, CAST(count(*) AS BIGINT) AS n_sample,
         |  CAST(count(*) * 32 AS BIGINT) AS est_count,
         |  CAST(sum(c) * 32 AS BIGINT) AS est_sum_cents,
         |  CAST(sum(c * c) * 32 * 31 AS BIGINT) AS est_var_cents2,
         |  CAST(32 AS BIGINT) AS rate_den,
         |  CAST(60000000000 AS BIGINT) AS grain_ns,
         |  'sample' AS source
         |FROM sm GROUP BY bucket_ts ORDER BY bucket_ts""".stripMargin,
    "json_props_stats" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(min(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS min_k,
        |  CAST(max(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "tpch_q3" ->
      """SELECT l_orderkey,
        |  CAST(sum(
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) *
        |    (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
        |  ) AS BIGINT) AS revenue_c4
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l_shipdate > TIMESTAMP '1998-06-01'
        |  AND EXISTS (SELECT 1 FROM customer
        |              WHERE c_custkey = o_custkey
        |                AND c_mktsegment = 'BUILDING')
        |GROUP BY l_orderkey
        |ORDER BY revenue_c4 DESC, l_orderkey LIMIT 10""".stripMargin,
    "tpch_q5" ->
      """SELECT n_name,
        |  CAST(sum(
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) *
        |    (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
        |  ) AS BIGINT) AS revenue_c4
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |  AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue_c4 DESC, n_name""".stripMargin,
    "tpch_q18" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(CAST(l_quantity AS BIGINT)) > 300
        |)
        |SELECT c_name, c_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  o_totalprice, sum_qty
        |FROM big
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
        |LIMIT 100""".stripMargin,
    "tpch_q10" ->
      """WITH rev AS (
        |  SELECT o_custkey, CAST(sum(
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) *
        |    (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
        |  ) AS BIGINT) AS revenue_c4
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_returnflag = 'R'
        |    AND o_orderdate >= TIMESTAMP '1996-07-01'
        |    AND o_orderdate < TIMESTAMP '1996-10-01'
        |  GROUP BY o_custkey
        |)
        |SELECT c_custkey, c_name,
        |  CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_c,
        |  n_name, revenue_c4
        |FROM rev
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY revenue_c4 DESC, c_custkey LIMIT 20""".stripMargin,
    "tpch_q12" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_shipdate >= o_orderdate + INTERVAL 60 DAY
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin,
    "tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate >= o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "tpch_q14" ->
      """SELECT
        |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) *
        |    (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
        |    ELSE 0 END) AS BIGINT) AS promo_rev_c4,
        |  CAST(sum(
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) *
        |    (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
        |  ) AS BIGINT) AS total_rev_c4
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1995-09-01'
        |  AND l_shipdate < TIMESTAMP '1995-10-01'""".stripMargin,
    "tpch_q6" ->
      """SELECT
        |  CAST(sum(
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) *
        |    CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)
        |  ) AS BIGINT) AS revenue_c4,
        |  count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)
        |    BETWEEN 5 AND 7
        |  AND l_quantity < 24""".stripMargin,
    "tpch_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  CAST(sum(
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) *
        |    (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
        |  ) AS BIGINT) AS revenue_c4
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "tpch_q13" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "tpch_q17" ->
      """WITH pt AS (
        |  SELECT p_partkey FROM part
        |  WHERE p_brand = 'Brand#23' AND p_type = 'MEDIUM'
        |), li AS (
        |  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS price_c
        |  FROM lineitem JOIN pt ON l_partkey = p_partkey
        |), a AS (
        |  SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS s,
        |    count(*) AS n
        |  FROM li GROUP BY 1
        |)
        |SELECT
        |  COALESCE(CAST(sum(li.price_c) AS BIGINT), 0) AS small_qty_rev_c,
        |  count(*) AS n_items,
        |  COALESCE(CAST(sum(li.price_c) AS BIGINT), 0) // 7 AS avg_yearly_c
        |FROM li JOIN a ON li.l_partkey = a.l_partkey
        |WHERE li.qty * 5 * a.n < a.s""".stripMargin,
    "tpch_q19" ->
      """SELECT
        |  CAST(sum(
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) *
        |    (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
        |  ) AS BIGINT) AS revenue_c4,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE
        |  (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity BETWEEN 1 AND 11)
        |  OR (p_brand = 'Brand#4' AND p_size BETWEEN 10 AND 30
        |    AND l_quantity BETWEEN 10 AND 20)
        |  OR (p_brand = 'Brand#19' AND p_size BETWEEN 20 AND 50
        |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "tpch_q22" ->
      """WITH c AS (
        |  SELECT c_custkey, c_nationkey,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_c
        |  FROM customer
        |), t AS (
        |  SELECT CAST(sum(bal_c) AS BIGINT) AS s_c, count(*) AS n_pos
        |  FROM c WHERE bal_c > 0
        |)
        |SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
        |  CAST(sum(bal_c) AS BIGINT) AS totacctbal_c
        |FROM c, t
        |WHERE bal_c * n_pos > s_c
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,
    "tpch_q2" ->
      """WITH pt AS (
        |  SELECT p_partkey FROM part
        |  WHERE p_size = 15 AND p_type = 'STANDARD'
        |), eur AS (
        |  SELECT s_suppkey, s_name, n_name,
        |    CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_c
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'
        |), cost AS (
        |  SELECT l_partkey, l_suppkey, CAST(min(
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |  ) AS BIGINT) AS cost_c
        |  FROM lineitem JOIN pt ON l_partkey = p_partkey
        |  WHERE l_suppkey IN (SELECT s_suppkey FROM eur)
        |  GROUP BY 1, 2
        |), m AS (
        |  SELECT l_partkey, min(cost_c) AS min_c FROM cost GROUP BY 1
        |)
        |SELECT bal_c, s_name, n_name, cost.l_partkey AS p_partkey, cost_c
        |FROM cost JOIN m ON cost.l_partkey = m.l_partkey
        |  AND cost_c = min_c
        |JOIN eur ON l_suppkey = s_suppkey
        |ORDER BY bal_c DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,
    "tpch_q8" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(sum(CASE WHEN n1.n_name = 'NATION_3' THEN
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) *
        |    (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
        |    ELSE 0 END) AS BIGINT) AS nation_rev_c4,
        |  CAST(sum(
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) *
        |    (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
        |  ) AS BIGINT) AS total_rev_c4
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |JOIN region ON n2.n_regionkey = r_regionkey
        |WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
        |  AND o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "tpch_q9" ->
      """SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(sum(
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) *
        |    (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)) -
        |    CAST(l_quantity AS BIGINT) *
        |    CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 50
        |  ) AS BIGINT) AS profit_c4
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2
        |ORDER BY n_name, o_year DESC""".stripMargin,
    "tpch_q11" ->
      """WITH v AS (
        |  SELECT l_partkey, CAST(sum(
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |  ) AS BIGINT) AS value_c
        |  FROM lineitem
        |  WHERE l_suppkey IN (
        |    SELECT s_suppkey FROM supplier
        |    JOIN nation ON s_nationkey = n_nationkey
        |    WHERE n_name = 'NATION_7')
        |  GROUP BY 1
        |), t AS (
        |  SELECT CAST(sum(value_c) AS BIGINT) AS total_c FROM v
        |)
        |SELECT l_partkey AS p_partkey, value_c FROM v, t
        |WHERE value_c * 10000 > total_c
        |ORDER BY value_c DESC, p_partkey""".stripMargin,
    "tpch_q15" ->
      """WITH rev AS (
        |  SELECT l_suppkey, CAST(sum(
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) *
        |    (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
        |  ) AS BIGINT) AS total_rev_c4
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1
        |)
        |SELECT s_suppkey, s_name, total_rev_c4
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_rev_c4 = (SELECT max(total_rev_c4) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "tpch_q16" ->
      """SELECT p_brand, p_type, p_size,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 23)
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "tpch_q20" ->
      """WITH q AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
        |      AND l_shipdate < TIMESTAMP '1997-01-01'
        |      THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS q96,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qall
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE 'red%'
        |  GROUP BY 1, 2
        |)
        |SELECT s_suppkey, s_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_4'
        |  AND s_suppkey IN (SELECT l_suppkey FROM q WHERE q96 * 2 > qall)
        |ORDER BY s_suppkey""".stripMargin,
    "tpch_q21" ->
      """SELECT s_name, count(*) AS numwait
        |FROM lineitem l1
        |JOIN orders ON l1.l_orderkey = o_orderkey
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F' AND n_name = 'NATION_2'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin,
    "ts_active_users" ->
      """WITH a AS (
        |  SELECT DISTINCT user_id,
        |    epoch_ns(ts) // 86400000000000 AS day
        |  FROM events
        |), dau AS (
        |  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        |  FROM a GROUP BY day
        |), w AS (
        |  SELECT user_id, unnest(range(day, day + 7)) AS day FROM a
        |), wau AS (
        |  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
        |  FROM w GROUP BY day
        |)
        |SELECT day, dau, wau FROM dau JOIN wau USING (day)
        |ORDER BY day""".stripMargin,
    "agg_rollup_revenue" ->
      """SELECT coalesce(n_name, 'ALL') AS n_name,
        |  coalesce(c_mktsegment, 'ALL') AS c_mktsegment,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(n_name, c_mktsegment)
        |ORDER BY n_name, c_mktsegment""".stripMargin,
    "agg_cube_revenue" ->
      """SELECT coalesce(n_name, 'ALL') AS n_name,
        |  coalesce(c_mktsegment, 'ALL') AS c_mktsegment,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY CUBE(n_name, c_mktsegment)
        |ORDER BY n_name, c_mktsegment""".stripMargin,
    "agg_pivot_types" ->
      """SELECT epoch_ns(ts) // 86400000000000 AS day,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_view,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_click,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_signup
        |FROM events GROUP BY day ORDER BY day""".stripMargin,
    "join_revenue_by_nation" ->
      """SELECT n_name, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "join_revenue_salted" ->
      """SELECT n_name, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "agg_downsample_interp" -> {
      val day = 86400L * 1000000000L
      s"""WITH buckets AS (
         |  SELECT generate_series AS bucket_ts
         |  FROM generate_series(${ns("2023-12-25")}, ${ns("2024-02-05") - 1}, $day)
         |), a AS (
         |  SELECT (epoch_ns(ts) // $day) * $day AS bucket_ts,
         |    count(*) AS n,
         |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
         |  FROM events GROUP BY 1
         |), filled AS (
         |  SELECT b.bucket_ts, coalesce(a.n, 0) AS n, a.sum_v
         |  FROM buckets b LEFT JOIN a ON a.bucket_ts = b.bucket_ts
         |), w AS (
         |  SELECT bucket_ts, n, sum_v,
         |    last_value(sum_v IGNORE NULLS) OVER back AS pv,
         |    last_value(CASE WHEN sum_v IS NOT NULL THEN bucket_ts END
         |      IGNORE NULLS) OVER back AS pt,
         |    first_value(sum_v IGNORE NULLS) OVER fwd AS nv,
         |    first_value(CASE WHEN sum_v IS NOT NULL THEN bucket_ts END
         |      IGNORE NULLS) OVER fwd AS nt
         |  FROM filled
         |  WINDOW back AS (ORDER BY bucket_ts ROWS UNBOUNDED PRECEDING),
         |    fwd AS (ORDER BY bucket_ts
         |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
         |)
         |SELECT bucket_ts, n,
         |  CASE WHEN sum_v IS NOT NULL THEN sum_v
         |       WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
         |         pv + (nv - pv) *
         |           (CAST(bucket_ts - pt AS DOUBLE) / (nt - pt))
         |  END AS sum_v
         |FROM w ORDER BY bucket_ts""".stripMargin
    },
    "stream_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) AS ts FROM events
        |), s AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > 3600000000000 THEN 1
        |         ELSE 0 END AS is_new
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), c AS (
        |  SELECT user_id, ts,
        |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        |  FROM s
        |), g AS (
        |  SELECT user_id, session_idx, count(*) AS n_events,
        |         min(ts) AS session_start, max(ts) AS session_end
        |  FROM c GROUP BY user_id, session_idx
        |), mx AS (SELECT max(epoch_ns(ts)) AS m FROM events),
        |ls AS (SELECT user_id, max(session_idx) AS mi FROM g GROUP BY user_id)
        |SELECT g.user_id, g.session_start, g.session_end, g.n_events
        |FROM g JOIN ls ON g.user_id = ls.user_id, mx
        |WHERE g.session_idx < ls.mi
        |   OR (g.session_end // 1000000 + 3600000 + 1) < (m // 1000000 - 600000)
        |ORDER BY g.user_id, g.session_start""".stripMargin,
    "window_top_orders" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders
        |) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "asof_purchase_view" ->
      """SELECT l.event_id, epoch_ns(l.ts) AS ts, l.user_id, l.value,
        |       epoch_ns(r.ts) AS r_ts, r.value AS r_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') l
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin,
    "sessionize_stats" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) AS ts FROM events
        |), s AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > 3600000000000 THEN 1
        |         ELSE 0 END AS is_new
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), c AS (
        |  SELECT user_id, ts,
        |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        |  FROM s
        |)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |       min(ts) AS session_start, max(ts) AS session_end
        |FROM c GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,
    "text_top_tokens" ->
      s"""SELECT tok, count(*) AS n FROM (
         |  SELECT unnest($DuckToks) AS tok FROM documents
         |) GROUP BY tok ORDER BY n DESC, tok LIMIT 50""".stripMargin,
    "meta_block_list" ->
      ("SELECT 'events' AS metrics, 1 AS seq, count(*) AS row_num, " +
        "min(epoch_ns(ts)) AS block_start, max(epoch_ns(ts)) AS block_end " +
        "FROM events"),
    "stream_downsample" -> {
      val h = 3600L * 1000000L // 1h in µs
      // Spark tracks the watermark in milliseconds: emitted windows are
      // those with end(ms) <= max event time(ms) - lateness(ms)
      s"""WITH a AS (
         |  SELECT (epoch_us(ts) // $h) * $h AS bucket_start_us,
         |    count(*) AS n, min(value) AS min_v, max(value) AS max_v,
         |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
         |  FROM events GROUP BY 1
         |), mx AS (SELECT max(epoch_us(ts)) AS m FROM events)
         |SELECT bucket_start_us, n, min_v, max_v, sum_v FROM a, mx
         |WHERE (bucket_start_us + $h) // 1000 <= (m // 1000) - 7200000
         |ORDER BY bucket_start_us""".stripMargin
    }
  )

  // ---- pipeline extensions (dedup / text / similarity / multimodal) ------

  private val pipelineQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> ((s, d) =>
      Dedup.exact(t(s, d, "documents"), "doc_id", "text").orderBy("fp")),
    "dedup_keep_best" -> ((s, d) =>
      // survivor policy: keep the LONGEST raw variant of each duplicate
      // group (members share normalized text but differ in ws/case, so
      // raw length discriminates); argmax fold, no window
      Dedup.exactKeepBest(t(s, d, "documents"), "doc_id", "text",
        length(col("text")).cast("long")).orderBy("fp")),
    "dedup_jaccard_pairs" -> ((s, d) =>
      Dedup.jaccardPairs(t(s, d, "documents"), "doc_id", "text",
        threshold = 0.3, shingleSize = 3).orderBy("id1", "id2")),
    "dedup_clusters" -> ((s, d) => {
      // transitive near-dup clusters over the exact pair list: min-label
      // propagation vs a DuckDB recursive-CTE transitive closure — proves
      // the iterative component labels (and the keep-one-per-cluster
      // representative flag) are exactly the connected components
      val pairs = Dedup.jaccardPairs(t(s, d, "documents"), "doc_id", "text",
        threshold = 0.3, shingleSize = 3)
      Dedup.components(pairs)
        .select(col("id").as("doc_id"), col("comp").as("component"),
          (col("id") === col("comp")).cast("long").as("is_rep"))
        .orderBy("doc_id")
    }),
    "dedup_cluster_keepbest" -> ((s, d) => {
      // keep-the-BEST-per-near-dup-cluster: components over the exact
      // pair list, survivor = highest token count (min id on ties)
      val docs = t(s, d, "documents")
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
        threshold = 0.3, shingleSize = 3)
      Dedup.clusterKeepBest(pairs,
        docs.select(col("doc_id"),
          Text.tokenCount(col("text")).cast("long").as("quality")),
        "doc_id", "quality")
        .orderBy("component")
    }),
    "dedup_clusters_logstar" -> ((s, d) => {
      // the same transitive clusters through the alternating
      // large-star/small-star algorithm — O(log n) rounds on ANY graph
      // shape (min-label propagation needs diameter rounds). Identical
      // output contract, so it shares dedup_clusters' recursive-CTE oracle
      val pairs = Dedup.jaccardPairs(t(s, d, "documents"), "doc_id", "text",
        threshold = 0.3, shingleSize = 3)
      Dedup.componentsLogRounds(pairs)
        .select(col("id").as("doc_id"), col("comp").as("component"),
          (col("id") === col("comp")).cast("long").as("is_rep"))
        .orderBy("doc_id")
    }),
    "dedup_minhash_lsh" -> ((s, d) =>
      Dedup.nearDuplicates(t(s, d, "documents"), "doc_id", "text",
        threshold = 0.3, bands = 16, rowsPerBand = 4, shingleSize = 3)
        .orderBy("id1", "id2")),
    "dedup_minhash_oracle" -> ((s, d) => {
      // the full LSH pipeline with oracle-reproducible md5 hashing: DuckDB
      // recomputes signatures, banding, candidates, and the exact verify —
      // a hash-matched proof of the banding/verify semantics (the xxhash64
      // fast path above shares every step but the base hash)
      val docs = t(s, d, "documents")
      val cands = Dedup.minhashCandidatesMd5(docs, "doc_id", "text",
        bands = 16, rowsPerBand = 4, shingleSize = 3)
      Dedup.jaccardVerify(docs, cands, "doc_id", "text", shingleSize = 3)
        .filter(col("jaccard") >= 0.3)
        .orderBy("id1", "id2")
    }),
    "dedup_embedding" -> ((s, d) =>
      Dedup.embeddingNearDups(t(s, d, "embeddings"), "vec_id", "embedding",
        threshold = 0.4, dims = 64, exact = true)
        .select(col("id1"), col("id2"), round(col("cos"), 6).as("cos"))
        .orderBy("id1", "id2")),
    "dedup_embedding_lsh" -> ((s, d) =>
      Dedup.embeddingNearDups(t(s, d, "embeddings"), "vec_id", "embedding",
        threshold = 0.4, dims = 64, exact = false, numPlanes = 8)
        .select(col("id1"), col("id2"), round(col("cos"), 6).as("cos"))
        .orderBy("id1", "id2")),
    "text_token_counts" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        Text.tokenCount(col("text")).cast("long").as("n_tokens"),
        Text.bpeTokenCount(col("text")).cast("long").as("n_bpe_tokens"))
        .orderBy("doc_id")),
    "pipeline_curate" -> ((s, d) =>
      graft.pipeline.Pipelines.curate(t(s, d, "documents"), "doc_id", "text")
        .select("doc_id", "lang_pred", "n_tokens")
        .orderBy("doc_id")),
    "pipeline_funnel" -> ((s, d) =>
      // the curation audit: per-stage survivor counts through the curate
      // chain — the report a production run ships with its output; the
      // oracle recomputes every stage from the same CTE chain that
      // value-oracles pipeline_curate itself
      graft.pipeline.Pipelines.curationFunnel(
          t(s, d, "documents"), "doc_id", "text")
        .orderBy("stage_idx")),
    "pipeline_funnel_prep" -> ((s, d) => {
      // the full trainPrep audit: the curate funnel extended with the
      // decontamination and token-budget stages, over the same inputs as
      // pipeline_train_prep — six stages from raw corpus to the budgeted
      // training set, each count oracled from the shared CTE chain
      val docs = t(s, d, "documents")
      graft.pipeline.Pipelines.curationFunnel(
          docs.filter(pmod(col("doc_id"), lit(97L)) =!= 0), "doc_id", "text",
          evalDf = Some(docs.filter(pmod(col("doc_id"), lit(97L)) === 0)),
          budgets = Map("en" -> 2000L, "de" -> 600L, "es" -> 600L,
            "fr" -> 500L),
          scrubFirst = true)
        .orderBy("stage_idx")
    }),
    "pipeline_train_prep" -> ((s, d) => {
      // the WHOLE prep job end to end: scrub → quality/langid/dedup curate
      // → benchmark decontamination → per-language token-budget mixing →
      // sequence packing. One call from raw docs to the trainer-facing
      // packed layout, every stage an individually-oracled operator
      val docs = t(s, d, "documents")
      graft.pipeline.Pipelines.trainPrep(
        docs.filter(pmod(col("doc_id"), lit(97L)) =!= 0), "doc_id", "text",
        docs.filter(pmod(col("doc_id"), lit(97L)) === 0),
        Map("en" -> 2000L, "de" -> 600L, "es" -> 600L, "fr" -> 500L),
        contextLen = 128, numBuckets = 4)
        .orderBy("doc_id")
    }),
    "dedup_simhash" -> ((s, d) =>
      // maxHamming=3 → 4×16-bit pigeonhole blocks: complete recall with
      // wide buckets (64-bit-key joins), the scale-safe operating point.
      // md5 token hashes so the DuckDB all-pairs oracle reproduces the
      // exact result set — the oracle CONFIRMS the complete-recall claim
      Dedup.simhashCandidates(
        Dedup.simhash(t(s, d, "documents"), "doc_id", "text", hash = "md5"),
        "doc_id", maxHamming = 3).orderBy("id1", "id2")),
    "dedup_jaccard_grouped" -> ((s, d) =>
      // adjacency-list variant of dedup_jaccard_pairs — identical output
      // (shares its oracle); see Dedup.jaccardPairsGrouped for the trade
      Dedup.jaccardPairsGrouped(t(s, d, "documents"), "doc_id", "text",
        threshold = 0.3, shingleSize = 3).orderBy("id1", "id2")),
    "dedup_cross_corpus" -> ((s, d) => {
      // dedupe the "new dump" (2/3 of docs) against the "training set"
      // (every 3rd doc); the reference side owns the capped vocabulary
      val docs = t(s, d, "documents")
      Dedup.crossCorpusNearDups(
        docs.filter(pmod(col("doc_id"), lit(3L)) =!= 0),
        docs.filter(pmod(col("doc_id"), lit(3L)) === 0),
        "doc_id", "text", threshold = 0.3)
        .orderBy("new_id", "ref_id")
    }),
    "corpus_diff" -> ((s, d) => {
      // release audit between two snapshot versions (overlapping halves
      // of the corpus): per language, distinct contents added/removed/kept
      val docs = t(s, d, "documents")
      Dedup.corpusDiff(
        docs.filter(pmod(col("doc_id"), lit(2L)) === 0),
        docs.filter(pmod(col("doc_id"), lit(3L)) =!= 0),
        "text", "lang")
        .orderBy("lang")
    }),
    "dedup_index_probe" -> ((s, d) => {
      // dedup_cross_corpus probed AT REST: the reference side's stop
      // list + capped inverted index persist once (writeNearDupIndex),
      // then the new dump joins against the stored index — no
      // reference-corpus shingle recompute per dump. Same result as the
      // recompute path, so it shares dedup_cross_corpus's oracle
      val docs = t(s, d, "documents")
      val path = nearDupIndexPaths.computeIfAbsent(d, dir => {
        val p = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft-ndidx-$processId-${dirTag(dir)}").getPath
        Dedup.writeNearDupIndex(
          docs.filter(pmod(col("doc_id"), lit(3L)) === 0),
          "doc_id", "text", p)
        p
      })
      Dedup.probeNearDupIndex(s, path,
        docs.filter(pmod(col("doc_id"), lit(3L)) =!= 0),
        "doc_id", "text", threshold = 0.3)
        .orderBy("new_id", "ref_id")
    }),
    "text_contamination" -> ((s, d) => {
      // decontamination probe: eval set = every 97th doc (stands in for a
      // held-out benchmark suite), train = the rest; a train doc is flagged
      // when any of its 3-gram shingles appears anywhere in the eval set.
      // The eval shingle set broadcasts — the 100 TB shape (benchmark
      // suites are tiny next to a pretraining corpus)
      val docs = t(s, d, "documents")
      Dedup.contamination(
        docs.filter(pmod(col("doc_id"), lit(97L)) =!= 0),
        docs.filter(pmod(col("doc_id"), lit(97L)) === 0),
        "doc_id", "text", shingleSize = 3)
        .orderBy("doc_id")
    }),
    "contamination_report" -> ((s, d) => {
      // eval-side leakage report: per eval doc (every 97th), how many of
      // its shingles the train corpus contains — including zero-leak rows
      val docs = t(s, d, "documents")
      Dedup.contaminationReport(
        docs.filter(pmod(col("doc_id"), lit(97L)) =!= 0),
        docs.filter(pmod(col("doc_id"), lit(97L)) === 0),
        "doc_id", "text", shingleSize = 3)
        .orderBy("doc_id")
    }),
    "dedup_bloom" -> ((s, d) => {
      // cross-corpus exact dedup, bloom-prescreened: incoming docs whose
      // fingerprint exists in the reference third of the corpus. Output
      // is the exact semi-join result (bloom is the prescreen layer)
      val docs = t(s, d, "documents")
      Dedup.bloomDedup(docs,
        docs.filter(pmod(col("doc_id"), lit(3L)) === 0),
        "doc_id", "text")
        .orderBy("doc_id")
    }),
    "text_novelty" -> ((s, d) =>
      // per-doc unique-content metric: distinct shingles with corpus
      // df == 1 — the inverse signal of the dup-ngram miner
      Text.noveltyCounts(t(s, d, "documents"), "doc_id", "text",
        shingleSize = 3)
        .orderBy("doc_id")),
    "source_stats" -> ((s, d) =>
      // per-source corpus composition: volume, language spread, distinct
      // content — the curation report a crawl pipeline publishes
      Text.sourceStats(t(s, d, "documents"), "text", "source")
        .orderBy("source")),
    "text_length_hist" -> ((s, d) =>
      // token-length distribution per language, width-10 buckets
      Text.lengthHistogram(t(s, d, "documents"), "text", "lang", 10)
        .orderBy("lang", "bucket")),
    "text_bpe_pairs" -> ((s, d) =>
      // tokenizer-training statistics: top within-word character pairs
      // by occurrence — the table BPE's first merge rule comes from
      Text.bpePairCounts(t(s, d, "documents"), "text", topK = 50)),
    "text_bpe_encode" -> ((s, d) => {
      // the REAL tokenizer loop: train 8 BPE merges on the corpus
      // vocabulary (greedy top-pair rounds), then encode every doc with
      // the learned merge chain — exact subword counts, full oracle
      // (the training rounds unroll into the SQL)
      val docs = t(s, d, "documents")
      Text.bpeEncode(docs, "doc_id", "text",
        Text.bpeTrain(docs, "text", merges = 8))
        .orderBy("doc_id")
    }),
    "text_bpe_encode_stored" -> ((s, d) => {
      // text_bpe_encode with the tokenizer AT REST: the 8 learned merges
      // are written once (two-rename publish) and every encode run opens
      // the frozen artifact — token budgets stay reproducible across
      // serving restarts and corpus growth. Byte-identical encode, so it
      // shares text_bpe_encode's value oracle
      val docs = t(s, d, "documents")
      val path = modelStorePaths.computeIfAbsent(d + "#tok", _ => {
        val p = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft-bpetok-$processId-${dirTag(d)}").getPath
        Text.writeTokenizer(s, Text.bpeTrain(docs, "text", merges = 8), p)
        p
      })
      Text.bpeEncode(docs, "doc_id", "text", Text.openTokenizer(s, path))
        .orderBy("doc_id")
    }),
    "text_bpe_encode_batch" -> ((s, d) => {
      // REAL-vocabulary-scale tokenizer training: 8 rounds × up to 32
      // symbol-disjoint merges per round = a 256-merge tokenizer in 8
      // vocabulary-sized jobs (rounds, not merges, drive cost — the
      // ceiling bpeTrain's one-job-per-merge loop could never reach);
      // the oracle unrolls the same rank-window selection per round
      val docs = t(s, d, "documents")
      Text.bpeEncode(docs, "doc_id", "text",
        Text.bpeTrainBatch(docs, "text", rounds = 8, pairsPerRound = 32,
          candidatesPerRound = 256))
        .orderBy("doc_id")
    }),
    "text_pack_bpe" -> ((s, d) => {
      // the composition batch training exists FOR: sequence packing under
      // the REAL tokenizer's counts — the 256-merge chain's n_bpe drives
      // the bucketed offset cumsum, so every context-window boundary sits
      // at the token budget a training job actually loads (the whitespace
      // proxy misplaces pack boundaries by the merge compression factor)
      val docs = t(s, d, "documents")
      val counts = Text.bpeEncode(docs, "doc_id", "text",
        Text.bpeTrainBatch(docs, "text", rounds = 8, pairsPerRound = 32,
          candidatesPerRound = 256))
      Text.packByCounts(counts, "doc_id", "n_bpe", contextLen = 256,
          numBuckets = 8)
        .orderBy("doc_id")
    }),
    "text_lm_score_stored" -> ((s, d) => {
      // text_lm_score with the LM AT REST: the reference-third count
      // tables persist once; scoring a fresh corpus never re-counts the
      // reference and every run scores under the same frozen model (the
      // CCNet comparability property). Shares text_lm_score's oracle
      val docs = t(s, d, "documents")
      val path = modelStorePaths.computeIfAbsent(d + "#lm", _ => {
        val p = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft-lm-$processId-${dirTag(d)}").getPath
        Text.writeLm(Text.lmRef(
          docs.filter(pmod(col("doc_id"), lit(3L)) === 0), "text"), p)
        p
      })
      Text.lmScore(docs, Text.openLm(s, path), "doc_id", "text")
        .orderBy("doc_id")
    }),
    "text_window_cooccur" -> ((s, d) =>
      // skip-gram statistics: ±2-position pairs over the raw sequence,
      // top-100 vocabulary — the embedding-training count table
      Text.windowCooccurrence(t(s, d, "documents"), "text",
        window = 2, topK = 100)
        .orderBy("tok_a", "tok_b")),
    "text_cooccur" -> ((s, d) =>
      // doc-level co-occurrence counts over the top-100 vocabulary —
      // integer PMI substrate; pair fan-out bounded by the vocab cap
      Text.cooccurrence(t(s, d, "documents"), "doc_id", "text", topK = 100)
        .orderBy("tok_a", "tok_b")),
    "text_collocations" -> ((s, d) =>
      // phrase discovery: adjacent bigrams ranked by scaled rational PMI
      // (integer-exact), min-count 5, global top-50
      Text.collocations(t(s, d, "documents"), "text",
        minCount = 5, topK = 50)),
    "text_lm_score" -> ((s, d) => {
      // CCNet-shaped LM quality scoring: mean add-one-smoothed bigram
      // probability under the reference third of the corpus, fixed-point
      val docs = t(s, d, "documents")
      Text.lmScore(docs,
        Text.lmRef(docs.filter(pmod(col("doc_id"), lit(3L)) === 0), "text"),
        "doc_id", "text")
        .orderBy("doc_id")
    }),
    "text_classifier_score" -> ((s, d) => {
      // TRAINED quality filter (the DCLM/fastText shape): token-ratio
      // weights counted from the labeled 4/5 train split (positive = the
      // English reference distribution, negative = the rest), every doc
      // scored by its mean scaled token likelihood ratio. Training is
      // counting, so model and scores hash-match the DuckDB mirror
      val docs = t(s, d, "documents")
      val train = docs.filter(pmod(col("doc_id"), lit(5L)) < 4)
      Text.classifierScore(docs,
        Text.classifierTrain(train.filter(col("lang") === "en"),
          train.filter(col("lang") =!= "en"), "text"),
        "doc_id", "text")
        .orderBy("doc_id")
    }),
    "text_classifier_stored" -> ((s, d) => {
      // text_classifier_score with the model AT REST: weights + scalars
      // persist once (the quality filter is trained once, applied to
      // every fresh dump under one frozen model); scoring never recounts
      // the training corpora. Shares text_classifier_score's oracle
      val docs = t(s, d, "documents")
      val path = modelStorePaths.computeIfAbsent(d + "#clf", _ => {
        val p = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft-clf-$processId-${dirTag(d)}").getPath
        val train = docs.filter(pmod(col("doc_id"), lit(5L)) < 4)
        Text.writeClassifier(
          Text.classifierTrain(train.filter(col("lang") === "en"),
            train.filter(col("lang") =!= "en"), "text"), p)
        p
      })
      Text.classifierScore(docs, Text.openClassifier(s, path),
        "doc_id", "text")
        .orderBy("doc_id")
    }),
    "text_classifier_incr" -> ((s, d) => {
      // INCREMENTAL training: the even half of the train split builds
      // the count store, the odd half arrives later as an appended
      // batch, and the append is then REPLAYED under the same batch key
      // (at-least-once redelivery) — the derived weights must equal the
      // one-shot train over the whole split, so this shares
      // text_classifier_score's oracle: counts merge by addition,
      // replays collapse before the sum
      val docs = t(s, d, "documents")
      val path = modelStorePaths.computeIfAbsent(d + "#clfcnt", _ => {
        val p = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft-clfcnt-$processId-${dirTag(d)}").getPath
        val train = docs.filter(pmod(col("doc_id"), lit(5L)) < 4)
        val even = train.filter(pmod(col("doc_id"), lit(2L)) === 0)
        val odd = train.filter(pmod(col("doc_id"), lit(2L)) === 1)
        def pos(df: org.apache.spark.sql.DataFrame) =
          df.filter(col("lang") === "en")
        def neg(df: org.apache.spark.sql.DataFrame) =
          df.filter(col("lang") =!= "en")
        Text.writeClassifierCounts(pos(even), neg(even), "text", p)
        Text.appendClassifierCounts(pos(odd), neg(odd), "text", p,
          batchKey = "dump-1")
        Text.appendClassifierCounts(pos(odd), neg(odd), "text", p,
          batchKey = "dump-1") // redelivery: must be a no-op on read
        p
      })
      Text.classifierScore(docs, Text.openClassifierCounts(s, path),
        "doc_id", "text")
        .orderBy("doc_id")
    }),
    "text_classifier_eval" -> ((s, d) => {
      // the classifier's HELD-OUT confusion matrix (the 1/5 split the
      // trainer never saw): truth = reference-language membership,
      // prediction = mean-ratio threshold — the evaluation artifact a
      // filter must produce before gating a 100 TB crawl, exactly
      // mirrored. NOTE the synthetic corpus draws every lang label from
      // ONE token pool, so the matrix here is ~chance BY CONSTRUCTION —
      // the gate is the exact mirror of the evaluation computation;
      // label RECOVERY on a separable corpus is pinned by
      // PipelineSpec's planted-fixture classifier test
      val docs = t(s, d, "documents")
      val train = docs.filter(pmod(col("doc_id"), lit(5L)) < 4)
      val ref = Text.classifierTrain(train.filter(col("lang") === "en"),
        train.filter(col("lang") =!= "en"), "text")
      Text.classifierScore(docs.filter(pmod(col("doc_id"), lit(5L)) === 4),
          ref, "doc_id", "text")
        .join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy((col("lang") === "en").cast("long").as("is_pos"),
          col("pred_pos"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("is_pos", "pred_pos")
    }),
    "text_dup_ngrams" -> ((s, d) =>
      // most-duplicated 5-token spans with doc frequency — the
      // substring-dedup signal (Lee et al. 2022) at fixed span length
      Dedup.dupNgrams(t(s, d, "documents"), "doc_id", "text",
        n = 5, minDf = 2, topK = 50)),
    "text_dup_chunks" -> ((s, d) =>
      // paragraph-dedup signal: per doc, how many fixed 32-token chunks
      // are duplicated anywhere in the corpus
      Text.dupChunkStats(t(s, d, "documents"), "doc_id", "text", size = 32)
        .orderBy("doc_id")),
    "text_dup_spans" -> ((s, d) =>
      // exact duplicated-span COVERAGE per doc (Lee et al. 2022): the
      // union of all 8-token windows occurring >= 2 times in the corpus,
      // merged into maximal spans — the token count a span-excision
      // dedup pass would remove, not just a dup-window tally
      Text.dupSpanCoverage(t(s, d, "documents"), "doc_id", "text", k = 8)
        .orderBy("doc_id")),
    "text_excise_spans" -> ((s, d) =>
      // the TRANSFORM half of Lee et al. 2022: every token under a
      // duplicated 8-window leaves, survivors rejoin in order over the
      // canonical token stream — the dedup a training pipeline actually
      // applies, not just the metric
      Text.exciseDupSpans(t(s, d, "documents"), "doc_id", "text", k = 8)
        .orderBy("doc_id")),
    "text_dup_index_incr" -> ((s, d) => {
      // incremental index maintenance: base dump mined once, a later
      // dump appended under a replay-stable key (delivered TWICE — the
      // at-least-once dedup must absorb it), serving set summed from the
      // partials with minCount on the TOTAL — counts merge by addition,
      // so scoring the full corpus against the incrementally-built set
      // equals the one-shot whole-corpus mine (shares text_dup_spans'
      // oracle); cnt=1 partials are load-bearing across dumps
      val docs = t(s, d, "documents")
      val path = dupIncrIndexPaths.computeIfAbsent(d, dir => {
        val p = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft-dupincr-$processId-${dirTag(dir)}").getPath
        val all = t(s, dir, "documents")
        val baseDocs = all.filter(pmod(col("doc_id"), lit(97L)) =!= 0)
        val incDocs = all.filter(pmod(col("doc_id"), lit(97L)) === 0)
        Text.appendDupGramIndex(baseDocs, p, "base", "doc_id", "text",
          k = 8)
        Text.appendDupGramIndex(incDocs, p, "inc#1", "doc_id", "text",
          k = 8)
        Text.appendDupGramIndex(incDocs, p, "inc#1", "doc_id", "text",
          k = 8) // the at-least-once redelivery
        Text.compactDupGramIndex(s, p)
        p
      })
      Text.dupSpanCoverageStored(docs, "doc_id", "text",
        Text.dupGramsFrom(s, path, k = 8), k = 8)
        .orderBy("doc_id")
    }),
    "text_dup_spans_stored" -> ((s, d) => {
      // the dup-gram set AT REST: mined once (index is the duplicated
      // subset only — tiny), probed by a one-pass scoring join with no
      // corpus-wide re-count; same corpus + same set ⇒ shares
      // text_dup_spans' oracle, and the k self-description is validated
      // on open
      val docs = t(s, d, "documents")
      Text.dupSpanCoverageStored(docs, "doc_id", "text",
        Text.openDupGramIndex(s, dupGramIdx(s, d), k = 8), k = 8)
        .orderBy("doc_id")
    }),
    "text_chunks" -> ((s, d) =>
      Text.chunk(t(s, d, "documents"), "doc_id", "text",
        size = 32, overlap = 8)
        .orderBy("doc_id", "chunk_idx")),
    "text_remove_boilerplate" -> ((s, d) =>
      // corpus cleaning: spans repeated >= 3 times anywhere drop, text
      // reassembles from the surviving spans — full cleaned-text oracle
      Text.removeBoilerplate(t(s, d, "documents"), "doc_id", "text",
        size = 16, minDf = 3)
        .orderBy("doc_id")),
    "text_remove_boilerplate_stored" -> ((s, d) => {
      // probe the persisted span index: identical cleaning arithmetic,
      // only the span set's provenance (parquet vs recompute) differs —
      // shares text_remove_boilerplate's oracle (the knn_ivf_stored
      // convention). Index written once per process per dataset.
      val path = boilerIdxPaths.computeIfAbsent(d, dir => {
        val p = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft-boiler-${processId}_${dirTag(dir)}/idx").getPath
        Text.writeBoilerplateIndex(t(s, dir, "documents"), "doc_id",
          "text", p, size = 16, minDf = 3)
        p
      })
      Text.removeBoilerplateStored(s, t(s, d, "documents"), "doc_id",
        "text", path).orderBy("doc_id")
    }),
    "quality_length_trim" -> ((s, d) =>
      // adaptive per-source length band: each source keeps its own
      // [10th, 90th] percentile lengths; decided on the per-(source, len)
      // histogram + broadcast semi join — never a per-row window
      Text.lengthTrimPct(t(s, d, "documents")
          .select("doc_id", "source", "n_chars"),
        "n_chars", "source", loPct = 10, hiPct = 90)
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")),
    "sample_split" -> ((s, d) =>
      Text.hashSplit(t(s, d, "documents").select("doc_id"), "doc_id")
        .groupBy("split").agg(count(lit(1)).as("n"))
        .orderBy("split")),
    "train_shuffle_shards" -> ((s, d) =>
      // reproducible global training order: seeded md5 key → shard +
      // in-shard position, identical on every run and cluster size; one
      // hash shuffle + per-shard sort, never a global range sort
      Text.shuffleShards(t(s, d, "documents").select("doc_id"), "doc_id",
        seed = 7L, nShards = 16)
        .select("doc_id", "shard", "pos")
        .orderBy("shard", "pos")),
    "profile_documents" -> ((s, d) =>
      // one-pass data-validation profile: per-column null/distinct/range
      // stats from a single scan + single multi-distinct aggregate
      Text.profile(t(s, d, "documents"),
        Seq("doc_id", "text", "lang", "source", "n_chars"))
        .orderBy("col_name")),
    "mix_sample" -> ((s, d) =>
      // data mixing: per-language token budgets (en-heavy, zh excluded);
      // deterministic md5-ordered fill so the oracle reproduces the exact
      // survivor set. Budgets are absolute tokens — at sf0.01 they keep
      // roughly half of en and a third of de/es/fr
      Text.mixSample(t(s, d, "documents"), "doc_id", "text", "lang",
        Map("en" -> 4000L, "de" -> 1000L, "es" -> 1000L, "fr" -> 800L))
        .orderBy("doc_id")),
    "mix_importance" -> ((s, d) => {
      // DSIR-shaped selection: reweight the corpus toward the English
      // slice via hashed-bucket frequency ratios; deterministic
      // hash-threshold acceptance, integer-exact weights
      val docs = t(s, d, "documents")
      Text.importanceSample(docs, docs.filter(col("lang") === "en"),
        "doc_id", "text", buckets = 256)
        .orderBy("doc_id")
    }),
    "mix_temperature" -> ((s, d) => {
      // α=1/2 temperature mixing: budgets derived from the corpus itself
      // (∝ sqrt of per-lang tokens), then the standard md5-ordered fill;
      // integer-exact weights so the oracle derives identical budgets
      val docs = t(s, d, "documents")
      val budgets = Text.temperatureBudgets(docs, "text", "lang",
        totalBudget = 6000L)
      Text.mixSample(docs, "doc_id", "text", "lang", budgets)
        .orderBy("doc_id")
    }),
    "mix_epochs" -> ((s, d) =>
      // data-constrained mixing: en budget > its corpus → 2 full epochs
      // + remainder prefix; de/fr fractional; es/zh excluded
      Text.mixEpochs(t(s, d, "documents"), "doc_id", "text", "lang",
        Map("en" -> 30000L, "de" -> 1000L, "fr" -> 800L))
        .orderBy("doc_id")),
    "mix_schedule" -> ((s, d) =>
      // the trainer-facing order: one row per (doc, epoch) occurrence
      // with the per-epoch reshuffle key; sort by (epoch, order_key)
      Text.mixSchedule(t(s, d, "documents"), "doc_id", "text", "lang",
        Map("en" -> 30000L, "de" -> 1000L, "fr" -> 800L))
        .orderBy("doc_id", "epoch")),
    "sample_stratified" -> ((s, d) =>
      // fixed-size per-language eval carve-out, deterministic md5 order
      Text.sampleStratified(t(s, d, "documents"), "doc_id", "lang", k = 10)
        .orderBy("doc_id")),
    "quantile_sketch" -> ((s, d) =>
      // mergeable-sketch median per language: exact p50 VALUE-oracled
      // (dyadic p → bit-equal to quantile_cont), est_ok gates the
      // percentile_approx sketch within one element of exact
      Text.lengthQuantileSketch(t(s, d, "documents"), "text", "lang")
        .select(col("lang"), col("n_docs"), col("p_exact"),
          (abs(col("p_approx") - col("p_exact")) <= 1.0)
            .cast("long").as("est_ok"))
        .orderBy("lang")),
    "approx_distinct_tokens" -> ((s, d) => {
      // HLL sketch distinct-token counts: the exact per-group counts are
      // VALUE-oracled; est_ok gates the sketch estimate within 5% of exact
      // AND (on the '*' row) that the union of per-language sketches
      // estimates identically to one sketch over all tokens — the
      // mergeability that makes sketches the 100 TB distinct-count path
      val docs = t(s, d, "documents")
      val sk = Text.distinctTokenSketch(docs, "text", "lang")
      val tok = docs.select(col("lang"),
        explode(Text.tokens(col("text"))).as("token"))
      val perOut = sk.join(tok.groupBy("lang")
          .agg(count_distinct(col("token")).as("n_exact")), Seq("lang"))
        .select(col("lang"), col("n_exact"),
          (abs(col("estimate") - col("n_exact")) <= col("n_exact") * 0.05)
            .cast("long").as("est_ok"))
      val gOut = tok.agg(count_distinct(col("token")).as("n_exact"))
        .crossJoin(Text.distinctTokenSketch(
            docs.withColumn("__g", lit(1)), "text", "__g")
          .select(col("estimate").as("est_direct")))
        .crossJoin(Text.mergeSketchEstimate(sk.select("sketch"))
          .select(col("estimate").as("est_merged")))
        .select(lit("*").as("lang"), col("n_exact"),
          ((abs(col("est_direct") - col("n_exact")) <= col("n_exact") * 0.05)
            && col("est_direct") === col("est_merged"))
            .cast("long").as("est_ok"))
      perOut.unionByName(gOut).orderBy("lang")
    }),
    "text_quality" -> ((s, d) =>
      Text.qualityFeatures(t(s, d, "documents"), "text")
        .select("doc_id", "n_chars_m", "n_tokens", "punct_ratio",
          "digit_ratio", "ws_ratio", "stopword_ratio", "mean_token_len")
        .orderBy("doc_id")),
    "text_langid" -> ((s, d) =>
      Text.langId(t(s, d, "documents"), "text")
        .select("doc_id", "score_de", "score_en", "score_es", "score_fr",
          "lang_pred")
        .orderBy("doc_id")),
    "text_lang_confusion" -> ((s, d) =>
      // label-quality audit: predicted vs recorded language confusion
      // matrix — the standard check before trusting either column as the
      // mixing/filter key; metadata-sized output (|langs|² cells)
      Text.langId(t(s, d, "documents"), "text")
        .groupBy(col("lang").as("lang_true"),
          col("lang_pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy("lang_true", "lang_pred")),
    "text_fingerprint" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), Text.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")),
    "text_nfc" -> ((s, d) => {
      // NFC on the raw text, plus a marker proving a REAL composition:
      // appending decomposed e+combining-acute (U+0065 U+0301) must
      // normalize to composed U+00E9 (the corpus itself may already be
      // NFC, which would make the text column alone a weak check)
      val decomposed = "e\u0301"
      val composed = "\u00e9"
      // NFC(text) computed ONCE and reused by both output columns; only
      // the text+decomposed probe needs a second normalization pass
      t(s, d, "documents")
        .select(col("doc_id"), col("text"),
          Text.normalizeNfc(col("text")).as("nfc_text"))
        .select(col("doc_id"), col("nfc_text"),
          (Text.normalizeNfc(concat(col("text"), lit(decomposed))) ===
            concat(col("nfc_text"), lit(composed)))
            .cast("long").as("composed_ok"))
        .orderBy("doc_id")
    }),
    "text_length_quantiles" -> ((s, d) =>
      // EXACT per-language token-count quantiles (percentile, not the
      // approx sketch): both engines define the continuous quantile as
      // linear interpolation at p*(n-1), and with integer inputs and
      // dyadic p the arithmetic is bit-identical
      t(s, d, "documents")
        .select(col("lang"), Text.tokenCount(col("text")).cast("long").as("n"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          expr("percentile(n, 0.25)").as("p25"),
          expr("percentile(n, 0.5)").as("p50"),
          expr("percentile(n, 0.75)").as("p75"))
        .orderBy("lang")),
    "text_pack" -> ((s, d) =>
      // training sequence packing: concat-then-cut-every-256-tokens over 8
      // deterministic streams; per doc its offset and spanned packs
      Text.packSequences(t(s, d, "documents"), "doc_id", "text",
        contextLen = 256, numBuckets = 8)
        .orderBy("doc_id")),
    "text_length_filter" -> ((s, d) =>
      // relative outlier cut: keep docs inside their language's exact
      // [12.5%, 87.5%] token-count band (dyadic p → bit-exact interpolation
      // in both engines)
      Text.filterByLengthQuantiles(t(s, d, "documents"), "doc_id", "text",
        "lang", pLo = 0.125, pHi = 0.875)
        .select("doc_id", "lang", "n_tokens", "p_lo", "p_hi")
        .orderBy("doc_id")),
    "text_pack_manifest" -> ((s, d) =>
      // the dataloader-facing index of the packed layout: per context
      // window, its contributing docs and exact fill (256 everywhere but
      // each bucket's final pack)
      Text.packManifest(t(s, d, "documents"), "doc_id", "text",
        contextLen = 256, numBuckets = 8)
        .orderBy("bucket", "pack")),
    "text_tfidf" -> ((s, d) =>
      // integer TF-IDF components, top-3 terms per doc (tf desc, token
      // asc): the raw counts the weighting formula is computed from —
      // emitted unweighted so the oracle is exact
      Text.tfIdfTopK(t(s, d, "documents"), "doc_id", "text", k = 3)
        .orderBy("doc_id", "rank")),
    "text_gopher_filter" -> ((s, d) =>
      // the composite drop decision (Gopher rules, integer-exact flags)
      Text.gopherFilter(t(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id")),
    "text_repetition" -> ((s, d) =>
      // Gopher-style within-doc repetition signals (duplicate tokens /
      // 3-grams, top-token dominance) as integer counts — the boilerplate
      // and degenerate-loop filter of a pretraining pipeline
      Text.repetitionStats(t(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id")),
    "text_pii_scrub" -> ((s, d) => {
      // PII redaction proof: plant deterministic emails/phones into the
      // fixture text (base corpus has none), scrub, and count — the oracle
      // recomputes both the planted text and the regex scrub
      val docs = t(s, d, "documents")
      val planted = docs.select(col("doc_id"),
        concat(col("text"),
          when(pmod(col("doc_id"), lit(3L)) === 0,
            concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(5L)) === 0,
            concat(lit(" call +1 555 "),
              lpad(pmod(col("doc_id"), lit(10000L)).cast("string"), 4, "0")))
            .otherwise(lit(""))).as("t"))
      planted.select(col("doc_id"),
          Text.scrubPii(col("t")).as("scrubbed"),
          Text.piiEmailCount(col("t")).as("n_emails"),
          Text.piiPhoneCount(col("t")).as("n_phones"))
        .orderBy("doc_id")
    }),
    "pipeline_clean" -> ((s, d) => {
      // the composed cleaning pass: scrub → boilerplate removal → per-
      // source percentile trim, over a corpus with PLANTED PII (the
      // text_pii_scrub fixture) so every stage does real work; full-chain
      // value oracle reproduces the surviving cleaned texts exactly
      val planted = t(s, d, "documents").withColumn("text",
        concat(col("text"),
          when(pmod(col("doc_id"), lit(3L)) === 0,
            concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(5L)) === 0,
            concat(lit(" call +1 555 "),
              lpad(pmod(col("doc_id"), lit(10000L)).cast("string"), 4, "0")))
            .otherwise(lit(""))))
      graft.pipeline.Pipelines.clean(planted, "doc_id", "text", "source",
          size = 16, minDf = 3, loPct = 10, hiPct = 90)
        .orderBy("doc_id")
    }),
    "text_shingle_fp" -> ((s, d) =>
      // md5-derived 60-bit hashes so the DuckDB oracle reproduces the folds
      // exactly; the xxhash64 fast path is covered by PipelineSpec
      Text.shingleFingerprint(t(s, d, "documents"), "text", hash = "md5")
        .select("doc_id", "fp_min", "fp_max", "fp_xor")
        .orderBy("doc_id")),
    "knn_brute" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.knnBrute(emb, q, k = 5)
        .select(col("qid"), col("rank"), col("vec_id"), round(col("cos"), 6).as("cos"))
        .orderBy("qid", "rank")
    }),
    "knn_lsh" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.lshKnn(emb, q, k = 5, dims = 64, numPlanes = 8)
        .select(col("qid"), col("rank"), col("vec_id"), round(col("cos"), 6).as("cos"))
        .orderBy("qid", "rank")
    }),
    "knn_ivf" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val cents = emb.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val assigned = Similarity.ivfAssign(emb, cents)
      Similarity.ivfKnn(assigned, cents, q, k = 5, nprobe = 3)
        .select(col("qid"), col("rank"), col("vec_id"), round(col("cos"), 6).as("cos"))
        .orderBy("qid", "rank")
    }),
    "embed_cluster_stats" -> ((s, d) => {
      // corpus composition by cluster: every vector assigned to its
      // nearest sampled centroid, per-cell count + id range — the coverage
      // report IVF/SemDeDup capacity planning reads (cell sizes bound
      // probe and verify cost). Full value oracle: DuckDB recomputes the
      // argmax-cosine assignment from the same sampled centroids
      val emb = t(s, d, "embeddings")
      val cents = emb.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      Similarity.ivfAssign(emb, cents)
        .groupBy("cid")
        .agg(count(lit(1)).as("n"), min("vec_id").as("min_id"),
          max("vec_id").as("max_id"))
        .orderBy("cid")
    }),
    "embed_label_centroids" -> ((s, d) =>
      // per-label centroid sufficient statistics (decimal-exact, shuffle-
      // order independent); consumers divide sum_v/n for the mean vector
      graft.pipeline.Similarity.labelCentroidSums(
        t(s, d, "embeddings"), "label")
        .orderBy("label", "pos")),
    "embed_outliers" -> ((s, d) => {
      // embedding-quality gate: vectors whose best cosine to every
      // sampled centroid stays under 0.1 — off-manifold junk that would
      // pollute cells; full value oracle via the same argmax-cosine SQL
      val emb = t(s, d, "embeddings")
      val cents = emb.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      Similarity.embeddingOutliers(emb, cents, threshold = 0.1)
        .select(col("vec_id"), col("cid"), round(col("cos"), 6).as("cos"))
        .orderBy("vec_id")
    }),
    "knn_ivf_stored" -> ((s, d) => {
      // knn_ivf probed AT REST: the assignment is persisted with cid as the
      // storage partition key and the probe prunes the scan to the probed
      // cell directories (PlanAuditSpec asserts the PartitionFilters) —
      // same result as knn_ivf, so it shares that value oracle
      val emb = t(s, d, "embeddings")
      val cents = emb.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      // one index write per (process, dataset): the per-process UUID keeps
      // concurrent driver/verify processes off each other's cell dirs, the
      // cache keeps repeat invocations (bench iterations) probing the same
      // already-written index instead of leaking a corpus copy per call
      val path = ivfStorePaths.computeIfAbsent(d, dir => {
        val p = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft-ivf-$processId-${dirTag(dir)}").getPath
        Similarity.writeIvf(Similarity.ivfAssign(emb, cents), p)
        p
      })
      Similarity.ivfKnnStored(s, path, cents, q, k = 5, nprobe = 3)
        .select(col("qid"), col("rank"), col("vec_id"), round(col("cos"), 6).as("cos"))
        .orderBy("qid", "rank")
    }),
    "stream_ivf_ingest" -> ((s, d) => {
      // index freshness: the corpus's first 400 vectors are written at rest,
      // the remainder arrive THROUGH THE STREAM (per-batch assign + cell-dir
      // append), and the stored probe over the merged index must equal the
      // batch knn_ivf over the full corpus — so it shares that value oracle
      Tables.configure(s)
      val emb = t(s, d, "embeddings")
      val cents = emb.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val path = streamIvfPaths.computeIfAbsent(d, dir => {
        val base = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft-sivf-$processId-${dirTag(dir)}")
        // a retry after a failed first attempt must start from scratch:
        // the base rewrite below wipes appended cell files, so a SURVIVING
        // stream checkpoint would mark those batches committed and the
        // re-run would silently ingest nothing
        if (base.exists())
          org.apache.commons.io.FileUtils.deleteDirectory(base)
        val p = new java.io.File(base, "idx").getPath
        Similarity.writeIvf(
          Similarity.ivfAssign(emb.filter(col("vec_id") < 400), cents), p)
        val schema = emb.schema
        val src = s.readStream.schema(schema)
          .option("pathGlobFilter", "embeddings.parquet").parquet(dir)
          .filter(col("vec_id") >= 400)
        val qy = graft.streaming.StreamIngest.ivfIngest(src, cents, p,
          new java.io.File(base, "ck").getPath)
        if (!qy.awaitTermination(300000)) {
          qy.stop()
          throw new IllegalStateException("ivf ingest stream did not finish")
        }
        // fold the per-batch cell files back to one per cell — the probe
        // below runs over the COMPACTED tree, gating the whole lifecycle
        // (write → stream-append → compact → probe) on the value oracle
        Similarity.compactIvf(s, p)
        p
      })
      Similarity.ivfKnnStored(s, path, cents, q, k = 5, nprobe = 3)
        .select(col("qid"), col("rank"), col("vec_id"),
          round(col("cos"), 6).as("cos"))
        .orderBy("qid", "rank")
    }),
    // ---- recall gates: approximation quality as oracle-checkable facts ----
    // The approximate paths (LSH/IVF/embedding-LSH) cannot have SQL oracles —
    // their outputs depend on JVM-side hashing. What CAN be checked is the
    // property that makes them correct: recall against the exact path on
    // data with genuine locality. Each gate emits a single {recall_ok: 1}
    // row (deterministic: seeded fixtures, exact arithmetic) that the DuckDB
    // oracle pins to the constant 1 — if a code change degrades recall below
    // the threshold, the driver compare fails. Raw embeddings are
    // near-orthogonal (max pairwise cos ≈ 0.5 — no method can recall
    // neighbors that aren't local), so the kNN gates run on a clustered
    // fixture derived from the real vectors.
    "knn_lsh_recall" -> ((s, d) => {
      val corpus = clusteredVecs(s, d, n = 1000, nCenters = 5, noise = 0.05f)
      val q = corpus.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val brute = Similarity.knnBrute(corpus, q, k = 5).select("qid", "vec_id")
      val approx = Similarity.lshKnn(corpus, q, k = 5, dims = 64, numPlanes = 8)
        .select("qid", "vec_id")
      brute.join(approx, Seq("qid", "vec_id"), "left_semi")
        .agg((count(lit(1)) >= lit(45L)).cast("long").as("recall_ok")) // 45/50 = 0.9
    }),
    "text_heavy_hitters" -> ((s, d) => {
      // Misra-Gries gate: never overestimates, misses nothing above N/m,
      // and every estimate is within N/m of truth — checked against exact
      // counts entirely in-plan (the N aggregate broadcasts as one row)
      val m = 64
      val exact = t(s, d, "documents")
        .select(explode(graft.pipeline.Text.tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
      val hh = graft.pipeline.Text.heavyHitters(
        t(s, d, "documents"), "text", m)
      val tot = exact.agg(sum("cnt").as("N"))
      val viol =
        (col("cnt") * m > col("N") && col("est").isNull) ||
          (col("est").isNotNull &&
            (col("est") > col("cnt") ||
              col("est") * m < col("cnt") * m - col("N")))
      exact.join(hh, Seq("tok"), "left").crossJoin(broadcast(tot))
        .agg((sum(viol.cast("long")) === 0).cast("long").as("recall_ok"))
    }),
    "text_cms_counts" -> ((s, d) => {
      // count-min gate, all in-plan: point estimates never under-count
      // (hard CMS guarantee — gate at exactly zero), and over-count past
      // (e/w)·N on at most ~e^−d ≈ 1.8% of tokens (probabilistic bound;
      // gated at 5% = violators*20 <= tokens for deterministic margin)
      val dd = 4; val ww = 2048
      val ve = graft.pipeline.Text.cmsVsExact(
        t(s, d, "documents"), "text", dd, ww)
      val tot = ve.agg(sum("cnt").as("N"))
      ve.crossJoin(broadcast(tot))
        .agg((sum((col("est") < col("cnt")).cast("long")) === 0 &&
          sum((col("est") > col("cnt") +
            ceil(lit(math.E / ww) * col("N"))).cast("long")) * 20
            <= count(lit(1))).cast("long").as("cms_ok"))
    }),
    "sketch_store_rollup" -> ((s, d) => {
      // at-rest sketch store gate: write per-source sketch rows, roll up
      // HALF the sources from DISK (partition-pruned — plan-pinned in
      // PlanAuditSpec), and check against a direct pass over the selected
      // raw text: token totals match exactly, the rolled-up CMS is
      // BIT-equal to the direct sketch (merge is vector addition — the
      // property that makes stored partials trustworthy), and the HLL
      // estimate lands within 5% of exact distinct (lgK=12 ⇒ σ≈1.6%)
      val dd = 4; val ww = 2048
      val docs = t(s, d, "documents")
      val path =
        s"${System.getProperty("java.io.tmpdir")}/graft_sketch_store"
      graft.pipeline.Text.writeSketchStore(
        docs, path, "text", "source", 12, dd, ww)
      val half = (0 until 10).map(i => s"src$i")
      val roll = graft.pipeline.Text.sketchRollup(s, path, half)
      val sub = docs.filter(col("source").isin(half: _*))
      val truth = sub
        .select(explode(graft.pipeline.Text.tokens(col("text"))).as("tok"))
        .agg(count(lit(1)).as("n_exact"),
          count_distinct(col("tok")).as("d_exact"))
      val direct = graft.pipeline.Text.countMinSketch(sub, "text", dd, ww)
        .withColumnRenamed("sk", "cms_direct")
      roll.crossJoin(broadcast(truth)).crossJoin(broadcast(direct))
        .select((col("n_tokens") === col("n_exact") &&
          col("cms") === col("cms_direct") &&
          abs(col("distinct_est") - col("d_exact")) * 20 <= col("d_exact"))
          .cast("long").as("store_ok"))
    }),
    "knn_pq_recall" -> ((s, d) => {
      // product quantization end-to-end: sample-trained codebooks (m=4
      // subspaces × k=256 centroids — the standard full-byte codebook,
      // offset-encoded into signed tinyints), 4 code bytes + a float
      // (64× smaller than the 64-dim float vectors), ADC table scoring.
      // Gate is CLUSTER recall: quantization error exceeds intra-cluster
      // distances by design (all of a tight cluster's members share
      // codes), so exact-neighbor identity is not PQ's contract —
      // returning members of the right cluster is
      val corpus = clusteredVecs(s, d, n = 1000, nCenters = 5, noise = 0.05f)
      val q = corpus.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val books = Similarity.pqTrain(corpus, m = 4, k = 256)
      val enc = Similarity.pqEncode(corpus, books)
      val viaPq = Similarity.pqKnn(enc, books, q, k = 5).select("qid", "vec_id")
      viaPq
        .agg((sum(when(pmod(col("vec_id"), lit(5L)) ===
          pmod(col("qid"), lit(5L)), 1L).otherwise(0L)) >= lit(45L))
          .cast("long").as("recall_ok")) // >= 45/50 in-cluster
    }),
    "knn_ivfpq_recall" -> ((s, d) => {
      // IVF-PQ composition: kmeans cells prune to nprobe=2 of 5, PQ codes
      // score the survivors via ADC — the FAISS-standard shape; gated on
      // cluster recall like knn_pq_recall
      val corpus = clusteredVecs(s, d, n = 1000, nCenters = 5, noise = 0.05f)
      val q = corpus.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val cents = Similarity.kmeans(corpus, k = 5)
      val assigned = Similarity.ivfAssign(corpus, cents)
        .select("vec_id", "cid")
      val books = Similarity.pqTrain(corpus, m = 4, k = 256)
      val enc = Similarity.pqEncode(corpus, books).join(assigned, "vec_id")
      val top = Similarity.ivfPqKnn(enc, cents, books, q, k = 5)
        .select("qid", "vec_id")
      top.agg((sum(when(pmod(col("vec_id"), lit(5L)) ===
        pmod(col("qid"), lit(5L)), 1L).otherwise(0L)) >= lit(45L))
        .cast("long").as("recall_ok"))
    }),
    "knn_ivfpq_stored" -> ((s, d) => {
      // IVF-PQ at rest: encoded corpus partitioned by cid on disk, probe
      // prunes to the probed cell dirs (PlanAuditSpec asserts the
      // PartitionFilters) and ADC-ranks rows that carry 4 code bytes
      // instead of 64 floats; cluster-recall gated like knn_ivfpq_recall
      val corpus = clusteredVecs(s, d, n = 1000, nCenters = 5, noise = 0.05f)
      val q = corpus.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      // vec_ids 0..4 are one member per true cluster — deterministic
      // centroids, so a cached on-disk index from an earlier invocation
      // always matches this invocation's probe cells (kmeans float means
      // could drift between runs)
      val cents = corpus.filter(col("vec_id") < 5)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val books = Similarity.pqTrain(corpus, m = 4, k = 256)
      val path = ivfStorePaths.computeIfAbsent(d + "#pq", _ => {
        val p = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft-ivfpq-$processId-${dirTag(d)}").getPath
        val assigned = Similarity.ivfAssign(corpus, cents)
          .select("vec_id", "cid")
        Similarity.writeIvf(
          Similarity.pqEncode(corpus, books).join(assigned, "vec_id"), p)
        p
      })
      val top = Similarity.ivfPqKnnStored(s, path, cents, books, q, k = 5)
        .select("qid", "vec_id")
      top.agg((sum(when(pmod(col("vec_id"), lit(5L)) ===
        pmod(col("qid"), lit(5L)), 1L).otherwise(0L)) >= lit(45L))
        .cast("long").as("recall_ok"))
    }),
    "knn_quantized_recall" -> ((s, d) => {
      // the int8-quantized corpus (4× smaller at rest) must still recover
      // the float corpus's neighbors — scored on the REAL fast path: the
      // stored bytes rank directly through the integer codegen cosine
      // (no dequantize), queries quantized on the fly
      val corpus = clusteredVecs(s, d, n = 1000, nCenters = 5, noise = 0.05f)
      val q = corpus.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val brute = Similarity.knnBrute(corpus, q, k = 5).select("qid", "vec_id")
      val qCorpus = corpus.select(col("vec_id"),
          Similarity.quantizeInt8(col("embedding")).as("qs"))
        .select(col("vec_id"), col("qs.q").as("q"))
      val viaQuant = Similarity.knnBruteQuantized(qCorpus, q, k = 5)
        .select("qid", "vec_id")
      brute.join(viaQuant, Seq("qid", "vec_id"), "left_semi")
        .agg((count(lit(1)) >= lit(45L)).cast("long").as("recall_ok"))
    }),
    "knn_ivf_recall" -> ((s, d) => {
      val corpus = clusteredVecs(s, d, n = 1000, nCenters = 5, noise = 0.05f)
      val cents = t(s, d, "embeddings").filter(col("vec_id") < 5)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val q = corpus.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val brute = Similarity.knnBrute(corpus, q, k = 5).select("qid", "vec_id")
      val assigned = Similarity.ivfAssign(corpus, cents)
      val ivf = Similarity.ivfKnn(assigned, cents, q, k = 5, nprobe = 2)
        .select("qid", "vec_id")
      brute.join(ivf, Seq("qid", "vec_id"), "left_semi")
        .agg((count(lit(1)) >= lit(45L)).cast("long").as("recall_ok"))
    }),
    "knn_ivf_trained" -> ((s, d) => {
      // the TRAINED index: centroids come from distributed k-means over the
      // corpus itself (knn_ivf_recall seeds cells from arbitrary sample
      // vectors) — proves the Lloyd loop converges to cell representatives
      // good enough that a 2-of-5-cell probe still recovers >= 90% of the
      // exact neighbors. Deterministic end to end: seeded fixture, ordered
      // init, exact float means
      val corpus = clusteredVecs(s, d, n = 1000, nCenters = 5, noise = 0.05f)
      val cents = Similarity.kmeans(corpus, k = 5, iters = 3)
      val q = corpus.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val brute = Similarity.knnBrute(corpus, q, k = 5).select("qid", "vec_id")
      val assigned = Similarity.ivfAssign(corpus, cents)
      val ivf = Similarity.ivfKnn(assigned, cents, q, k = 5, nprobe = 2)
        .select("qid", "vec_id")
      brute.join(ivf, Seq("qid", "vec_id"), "left_semi")
        .agg((count(lit(1)) >= lit(45L)).cast("long").as("recall_ok"))
    }),
    "dedup_embedding_lsh_recall" -> ((s, d) => {
      // plant near-duplicates: each vector re-emitted with ±1% per-component
      // scaling (cos ≈ 0.9999) — the LSH tier must find >= 90% of the exact
      // path's >= 0.9-cosine pairs
      val base = t(s, d, "embeddings").filter(col("vec_id") < 500)
        .select("vec_id", "embedding")
      val pert = udf((v: Seq[Float], id: Long) => {
        val out = new Array[Float](v.length)
        var i = 0
        while (i < v.length) {
          val h = scala.util.hashing.MurmurHash3.productHash((id, i, 777))
          out(i) = v(i) *
            (1.0f + 0.02f * ((h & 0xffffff).toFloat / 0x1000000.toFloat - 0.5f))
          i += 1
        }
        out
      })
      val dups = base.select((col("vec_id") + 100000L).as("vec_id"),
        pert(col("embedding"), col("vec_id")).as("embedding"))
      val both = base.unionByName(dups)
      val exactP = Dedup.embeddingNearDups(both, "vec_id", "embedding",
        threshold = 0.9, dims = 64, exact = true).select("id1", "id2")
      val lshP = Dedup.embeddingNearDups(both, "vec_id", "embedding",
        threshold = 0.9, dims = 64, exact = false, numPlanes = 8)
        .select("id1", "id2")
      exactP.join(lshP, Seq("id1", "id2"), "left_semi")
        .agg(count(lit(1)).as("hits"))
        .crossJoin(exactP.agg(count(lit(1)).as("total")))
        .select((col("hits") >= col("total") * 0.9).cast("long").as("recall_ok"))
    }),
    "semdedup_recall" -> ((s, d) => {
      // SemDeDup tier: kmeans cells as the candidate buckets. Planted ±1%
      // twins (cos ≈ 0.9999) must be recovered through TRAINED cells —
      // >= 90% of the exact >= 0.99-cosine pairs (the pair stage verifies
      // cosine exactly, so precision is 1 by construction; only a twin
      // straddling a cell boundary can be missed)
      val base = t(s, d, "embeddings").filter(col("vec_id") < 500)
        .select("vec_id", "embedding")
      val pert = udf((v: Seq[Float], id: Long) => {
        val out = new Array[Float](v.length)
        var i = 0
        while (i < v.length) {
          val h = scala.util.hashing.MurmurHash3.productHash((id, i, 777))
          out(i) = v(i) *
            (1.0f + 0.02f * ((h & 0xffffff).toFloat / 0x1000000.toFloat - 0.5f))
          i += 1
        }
        out
      })
      val dups = base.select((col("vec_id") + 100000L).as("vec_id"),
        pert(col("embedding"), col("vec_id")).as("embedding"))
      val both = base.unionByName(dups)
      val exactP = Dedup.embeddingNearDups(both, "vec_id", "embedding",
        threshold = 0.99, dims = 64, exact = true).select("id1", "id2")
      val semP = Similarity.semDedupPairs(both, k = 8, iters = 2, tau = 0.99)
        .select("id1", "id2")
      exactP.join(semP, Seq("id1", "id2"), "left_semi")
        .agg(count(lit(1)).as("hits"))
        .crossJoin(exactP.agg(count(lit(1)).as("total")))
        .select((col("hits") >= col("total") * 0.9).cast("long").as("recall_ok"))
    }),
    "dedup_minhash_lsh_recall" -> ((s, d) => {
      // MinHash-LSH + verify vs the exact inverted-index path on the real
      // documents table — candidate generation must surface >= 90% of true
      // >= 0.3-Jaccard pairs (the verify stage is exact, so misses can only
      // come from banding)
      val docs = t(s, d, "documents")
      val exactP = Dedup.jaccardPairs(docs, "doc_id", "text",
        threshold = 0.3, shingleSize = 3).select("id1", "id2")
      val lshP = Dedup.nearDuplicates(docs, "doc_id", "text",
        threshold = 0.3, bands = 16, rowsPerBand = 4, shingleSize = 3)
        .select("id1", "id2")
      exactP.join(lshP, Seq("id1", "id2"), "left_semi")
        .agg(count(lit(1)).as("hits"))
        .crossJoin(exactP.agg(count(lit(1)).as("total")))
        .select((col("hits") >= col("total") * 0.9).cast("long").as("recall_ok"))
    }),
    "dedup_minhash_lsh_match" -> ((s, d) => {
      // the xxhash64 fast path and its md5 oracle twin share every step but
      // the base hash; the verify stage is exact, so both emit exactly the
      // candidate pairs with true jaccard >= threshold that their banding
      // surfaced. This gate pins the fast path to the (hash-proven) md5
      // result SET in both directions — the driver-green proof that the
      // fast path's banding loses nothing and invents nothing
      val docs = t(s, d, "documents")
      val fast = Dedup.nearDuplicates(docs, "doc_id", "text",
        threshold = 0.3, bands = 16, rowsPerBand = 4, shingleSize = 3)
        .select("id1", "id2")
      val md5p = Dedup.jaccardVerify(docs,
        Dedup.minhashCandidatesMd5(docs, "doc_id", "text",
          bands = 16, rowsPerBand = 4, shingleSize = 3),
        "doc_id", "text", shingleSize = 3)
        .filter(col("jaccard") >= 0.3).select("id1", "id2")
      fast.join(md5p, Seq("id1", "id2"), "left_anti")
        .agg(count(lit(1)).as("fast_only"))
        .crossJoin(md5p.join(fast, Seq("id1", "id2"), "left_anti")
          .agg(count(lit(1)).as("md5_only")))
        .select(((col("fast_only") === 0) && (col("md5_only") === 0))
          .cast("long").as("match_ok"))
    }),
    "embed_quantize" -> ((s, d) => {
      // per-vector symmetric int8 quantization — exact arithmetic (floor,
      // raw max_abs), so DuckDB reproduces every byte
      val emb = t(s, d, "embeddings")
      emb.select(col("vec_id"),
          Similarity.quantizeInt8(col("embedding")).as("qs"))
        // serialize the int8 array to a CSV string: the driver's pandas
        // compare cannot sort raw array columns, and byte-joined string
        // equality is equivalent to array equality
        .select(col("vec_id"),
          concat_ws(",", col("qs.q").cast("array<string>")).as("q"),
          col("qs.max_abs").as("max_abs"))
        .orderBy("vec_id")
    }),
    "knn_quantized" -> ((s, d) => {
      // top-5 over the int8-quantized corpus via integer codegen cosine —
      // VALUE-oracled, not just recall-gated: quantization is exact floor
      // arithmetic and the integer dot products (≤ 64×127² per vector,
      // far under 2^53) are bit-reproducible in DuckDB doubles, so the
      // whole ANN scoring path hash-matches SQL
      val emb = t(s, d, "embeddings")
      val corpusQ = emb.select(col("vec_id"),
          Similarity.quantizeInt8(col("embedding")).as("qs"))
        .select(col("vec_id"), col("qs.q").as("q"))
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.knnBruteQuantized(corpusQ, q, k = 5)
        .select(col("qid"), col("rank"), col("vec_id"),
          round(col("cos"), 6).as("cos"))
        .orderBy("qid", "rank")
    }),
    "stream_dedup" -> ((s, d) => {
      // streaming exact dedup driven to completion (AvailableNow):
      // dropDuplicatesWithinWatermark keeps an ARBITRARY representative
      // row per fingerprint, so only the deterministic fingerprint set is
      // emitted and compared — it must equal the batch distinct set
      Tables.configure(s)
      val schema = t(s, d, "documents").schema
      // +1 day: doc_id 0 would land exactly on the initial watermark
      // (epoch 0) and be discarded as late before any state exists
      val src = s.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(d)
        .withColumn("__ns", ((col("doc_id") + 86400L) * 1000000000L).cast("long"))
      val deduped = graft.streaming.StreamIngest.streamingDedup(
        src, "text", "__ns", "1 hour")
      runStreamToTable(s, deduped.select("fp"), "stream_dedup_out")
        .select("fp").orderBy("fp")
    }),
    "stream_funnel" -> ((s, d) => {
      // live funnel tracking: same greedy stage matching as ts_funnel,
      // per-key state = stage progress; a drained stream emits exactly
      // the batch completion set (shared oracle)
      Tables.configure(s)
      val src = tsUs(eventStream(s, d))
      val done = graft.streaming.StreamIngest.streamingFunnel(
        src, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), 7L * 86400 * 1000000000L)
      runStreamToTable(s, done, "stream_funnel_out")
        .select(col("user_id"), col("ts_list")(0).as("t1"),
          col("ts_list")(1).as("t2"), col("ts_list")(2).as("t3"))
        .orderBy("user_id")
    }),
    "stream_zscore" -> ((s, d) => {
      // streaming alerting: the exact integer z-test over per-user
      // trailing windows, state = one bounded deque per user; a drained
      // single batch flags exactly the batch set (shared oracle)
      Tables.configure(s)
      val src = tsUs(eventStream(s, d))
        .select("event_id", "ts", "user_id", "value")
      val flagged = graft.streaming.StreamIngest.streamingZscoreAnomalies(
        src, 7L * 86400 * 1000000000L, k = 2, minN = 10)
      runStreamToTable(s, flagged, "stream_zscore_out")
        .select("event_id", "ts", "user_id", "value", "roll_n", "lhs", "rhs")
        .orderBy("event_id")
    }),
    "stream_seasonal" -> ((s, d) => {
      // train-batch/score-stream: the 168-cell profile built from history
      // broadcasts into a STATELESS stream filter; profile == streamed
      // data here, so the drained flag set equals the batch op (shared
      // oracle)
      val profile = TsOps.seasonalProfile(t(s, d, "events"), "value")
      val src = eventStream(s, d)
      val flagged = graft.streaming.StreamIngest
        .streamingSeasonalAnomalies(src, profile)
      runStreamToTable(s, flagged, "stream_seasonal_out")
        .select("event_id", "ts", "dow", "hour", "cell_n", "value")
        .orderBy("event_id")
    }),
    "stream_bm25" -> ((s, d) => {
      // live retrieval: queries stream against the batch-built index with
      // ZERO streaming state (stream-static joins only); the per-query
      // top-k rolls up on the drained sink and equals the batch ranker
      // (shared oracle)
      import s.implicits._
      Tables.configure(s)
      val qdir = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-bm25q-${processId}_${dirTag(d)}").getPath
      val qdf = Seq((1L, "fast vector scan"), (2L, "stream window agg"),
        (3L, "customer join query")).toDF("query_id", "qtext")
      qdf.write.mode("overwrite").parquet(qdir)
      val src = s.readStream.schema(qdf.schema).parquet(qdir)
      val idx = graft.pipeline.Retrieval.buildIndex(t(s, d, "documents"))
      val scored = graft.pipeline.Retrieval.streamingBm25(src, idx)
      val sink = runStreamToTable(s, scored, "stream_bm25_out")
      idx.release()
      val agg = sink.groupBy("query_id", "doc_id")
        .agg(sum("term_score").as("score"), count(lit(1)).as("n_terms"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("score").desc, col("doc_id").asc)
      agg.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 10)
        .select("query_id", "doc_id", "score", "n_terms", "rank")
        .orderBy("query_id", "rank")
    }),
    "stream_counter_increase" -> ((s, d) => {
      // live counter monitoring: one long of state per user (the last
      // sample's cents); per-sample delta partials roll up on the drained
      // sink to the batch per-day increase/reset counts (shared oracle).
      // Trigger.Once: exact equality needs each user's rows in ONE batch
      // (deltas fold in arrival order across batches)
      val src = eventStream(s, d)
      val part = graft.streaming.StreamIngest.streamingCounterIncrease(
        src, 86400L * 1000000000L)
      runStreamToTable(s, part, "stream_counter_out", singleBatch = true)
        .groupBy("user_id", "bucket")
        .agg(count(lit(1)).as("n_deltas"), sum("inc_cents").as("inc_cents"),
          sum("reset").as("n_resets"))
        .orderBy("user_id", "bucket")
    }),
    "stream_ewma" -> ((s, d) => {
      // live smoothing: one scaled long of state per user, the identical
      // floor-division recurrence as the batch fold (shared oracle via
      // the ts_ewma recursive CTE)
      val src = eventStream(s, d)
      val sm = graft.streaming.StreamIngest.streamingEwma(src)
      // Trigger.Once: the oracle equality needs every row of a user in ONE
      // batch (the recurrence folds in arrival order across batches)
      runStreamToTable(s, sm, "stream_ewma_out", singleBatch = true)
        .select("user_id", "ts", "event_id", "cents", "ewma_num",
          "ewma_cents")
        .orderBy("user_id", "ts", "event_id")
    }),
    "stream_holt" -> ((s, d) => {
      // live level+trend forecast feed: two longs per user, identical
      // recurrence to the batch fold (shared recursive-CTE oracle)
      val src = eventStream(s, d)
      val ho = graft.streaming.StreamIngest.streamingHolt(src)
      runStreamToTable(s, ho, "stream_holt_out", singleBatch = true)
        .select("user_id", "ts", "event_id", "cents", "level_num",
          "trend_num", "fc1_cents")
        .orderBy("user_id", "ts", "event_id")
    }),
    "stream_cusum" -> ((s, d) => {
      // live drift alarms: two longs of state per user, alarm resets —
      // a drained single batch equals the batch page test (shared oracle)
      val src = eventStream(s, d)
      val cu = graft.streaming.StreamIngest.streamingCusum(src,
        targetCents = 5000L, slackCents = 500L, thresholdCents = 20000L)
      runStreamToTable(s, cu, "stream_cusum_out", singleBatch = true)
        .select("user_id", "ts", "event_id", "cents", "s_pos", "s_neg",
          "alarm")
        .orderBy("user_id", "ts", "event_id")
    }),
    "stream_embed_outliers" -> ((s, d) => {
      // stateless ingest-side twin of embed_outliers: broadcast-centroid
      // argmax in one UDF, same cosine arithmetic — a drained stream
      // emits exactly the batch outlier set, so it shares that oracle
      Tables.configure(s)
      val emb = t(s, d, "embeddings")
      val cents = emb.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val schema = emb.schema
      val src = s.readStream.schema(schema)
        .option("pathGlobFilter", "embeddings.parquet").parquet(d)
      val flagged = graft.streaming.StreamIngest.streamingEmbedOutliers(
        src, cents, threshold = 0.1)
      runStreamToTable(s, flagged, "stream_embed_outliers_out")
        .select(col("vec_id"), col("cid"), round(col("cos"), 6).as("cos"))
        .orderBy("vec_id")
    }),
    "stream_bloom_admit" -> ((s, d) => {
      // ingest admission gate: stream the corpus against the reference
      // third; admitted = docs whose fingerprint is NOT in the reference
      // (exact — bloom false positives are re-admitted by the anti-join)
      Tables.configure(s)
      val schema = t(s, d, "documents").schema
      val src = s.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(d)
      val admitted = graft.streaming.StreamIngest.streamingBloomAdmit(
        src, t(s, d, "documents")
          .filter(pmod(col("doc_id"), lit(3L)) === 0),
        "doc_id", "text")
      runStreamToTable(s, admitted, "stream_bloom_admit_out")
        .select("doc_id", "fp").orderBy("doc_id")
    }),
    "stream_tolerance_join" -> ((s, d) => {
      // live temporal correlation: errors STREAM in and probe the static
      // click table through the same bucket-rewritten toleranceJoin — the
      // ±1-bucket explode keeps it a stateless stream-static equi-join
      // (the raw theta predicate would be unsupported in streaming), so
      // drained pairs equal the batch twin exactly (shared oracle)
      Tables.configure(s)
      val clicks = t(s, d, "events")
        .filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val errs = eventStream(s, d)
        .filter(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("event_id"))
      val joined = TsOps.toleranceJoin(errs, clicks, 3600L * 1000000000L,
          Seq("user_id"))
        .select(col("user_id"), col("event_id").as("err_id"),
          col("ts").as("err_ts"), col("r_event_id").as("clk_id"),
          col("r_ts").as("clk_ts"),
          (col("r_ts") - col("ts")).as("delta_ns"))
      runStreamToTable(s, joined, "stream_tolerance_join_out")
        .orderBy("user_id", "err_id", "clk_id")
    }),
    "stream_interval_join" -> ((s, d) => {
      // live purchase-to-session attribution: the SAME intervalJoin code
      // runs with a streaming points side — binning keeps it a stateless
      // stream-static equi-join (a streaming theta-join would be
      // unsupported); the rollup is a complete-mode agg. A drained
      // stream equals the batch ts_interval_join (shared oracle)
      Tables.configure(s)
      val ev = tsUs(t(s, d, "events"))
      val sessions = TsOps.sessionize(ev.select("user_id", "ts"),
          3600L * 1000000000L, Seq("user_id"))
        .groupBy("user_id", "session_idx")
        .agg(min("ts").as("session_start"), max("ts").as("session_end"))
      val src = tsUs(eventStream(s, d))
        .filter(col("event_type") === "purchase")
        .select("user_id", "ts", "value")
      val joined = TsOps.intervalJoin(src, sessions, Seq("user_id"),
          "session_start", "session_end", binNanos = 3600L * 1000000000L)
        .groupBy("user_id", "session_idx")
        .agg(count(lit(1)).as("n_purchases"),
          dsum(col("value")).as("purchase_value"))
      runStreamToTable(s, joined, "stream_interval_join_out",
        mode = "complete")
        .orderBy("user_id", "session_idx")
    }),
    "stream_histogram" -> ((s, d) => {
      // live SLO quantiles: complete-mode cumulative-bucket counts —
      // state is the |keys|·(|bounds|+1) counter matrix itself; the
      // drained counts run the identical exact-integer interpolation
      // finisher, so the twin shares the batch oracle
      Tables.configure(s)
      val bounds = Seq(500L, 1000L, 2500L, 5000L, 10000L, 25000L)
      val counts = TsOps.histogramBuckets(eventStream(s, d),
        Seq("event_type"), bounds)
      val drained = runStreamToTable(s, counts, "stream_histogram_out",
        mode = "complete")
      TsOps.histogramQuantileFromCounts(drained, Seq("event_type"), bounds,
          qNum = 90L, qDen = 100L)
        .orderBy("event_type")
    }),
    "stream_heatmap" -> ((s, d) => {
      // live dow×hour activity matrix: complete-mode agg whose state is
      // at most 168 counters — the cheapest possible live dashboard
      Tables.configure(s)
      val src = tsUs(eventStream(s, d))
      val agg = TsOps.heatmap(src)
      runStreamToTable(s, agg, "stream_heatmap_out", mode = "complete")
        .orderBy("dow", "hour")
    }),
    "stream_retention" -> ((s, d) => {
      // live cohort retention: the user-day ledger emits each (user, day)
      // once with its cohort tag; the rollup on the drained sink equals
      // the batch retention matrix (shared oracle)
      Tables.configure(s)
      val src = tsUs(eventStream(s, d))
      val ledger = graft.streaming.StreamIngest.streamingUserDays(
        src, "user_id", "ts", dayNanos = 86400L * 1000000000L)
      runStreamToTable(s, ledger, "stream_retention_out",
        singleBatch = true)
        .groupBy("cohort_day", "day_offset")
        .agg(count_distinct(col("user_id")).as("n_users"))
        .orderBy("cohort_day", "day_offset")
    }),
    "stream_active_users" -> ((s, d) => {
      // live DAU/WAU off the same drained user-day ledger (the batch
      // explode-and-count shape applied to the sink; shared oracle)
      Tables.configure(s)
      val src = tsUs(eventStream(s, d))
      val ledger = graft.streaming.StreamIngest.streamingUserDays(
        src, "user_id", "ts", dayNanos = 86400L * 1000000000L)
      val tbl = runStreamToTable(s, ledger, "stream_active_users_out",
        singleBatch = true)
      // the BATCH operator runs on the drained ledger (day is already a
      // day index, so dayNanos = 1), keeping the twins one code path
      TsOps.activeUsers(tbl, "user_id", dayNanos = 1L, tsCol = "day")
        .orderBy("day")
    }),
    "stream_transitions" -> ((s, d) => {
      // live transition feed: pair rows stream out append-mode; the
      // count rollup runs on the drained sink table, which then equals
      // the batch transition matrix (shared oracle)
      Tables.configure(s)
      val src = tsUs(eventStream(s, d))
      val pairs = graft.streaming.StreamIngest.streamingTransitions(
        src, "user_id", "ts", "event_id", "event_type")
      runStreamToTable(s, pairs, "stream_transitions_out")
        .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
        .orderBy("from_type", "to_type")
    }),
    "stream_pivot_types" -> ((s, d) => {
      // live day × type matrix: streaming frames can't pivot(), but the
      // explicit-list pivot IS conditional sums — which stream fine as a
      // complete-mode agg; state = one row per day (bounded by calendar)
      val day = 86400L * 1000000000L
      val src = eventStream(s, d)
      def cnt(tpe: String) = sum(when(col("event_type") === tpe, 1L)
        .otherwise(0L))
      val agg = src.groupBy(expr(TsOps.floorDivSql("ts", day)).as("day"))
        .agg(cnt("view").as("n_view"), cnt("click").as("n_click"),
          cnt("purchase").as("n_purchase"), cnt("signup").as("n_signup"))
      runStreamToTable(s, agg, "stream_pivot_types_out", mode = "complete")
        .orderBy("day")
    }),
    "stream_window_cooccur" -> ((s, d) => {
      // live skip-gram counts: the batch vocabulary rides a broadcast
      // into the same pairing UDF; state = complete-mode pair counts
      // (≤ K²/2)
      Tables.configure(s)
      val docs = t(s, d, "documents")
      val vocab = s.sparkContext.broadcast(
        Text.occurrenceVocab(docs, "text", topK = 100))
      val src = s.readStream.schema(docs.schema)
        .option("pathGlobFilter", "documents.parquet").parquet(d)
      val pairs = src
        .select(explode(Text.windowPairsUdf(vocab, window = 2)(
          col("text"))).as("__p"))
        .select(col("__p._1").as("tok_a"), col("__p._2").as("tok_b"))
        .groupBy("tok_a", "tok_b").agg(count(lit(1)).as("n"))
      runStreamToTable(s, pairs, "stream_window_cooccur_out",
        mode = "complete")
        .orderBy("tok_a", "tok_b")
    }),
    "stream_cooccur" -> ((s, d) => {
      // live co-occurrence counts against a FIXED vocabulary (the batch
      // top-100, embedded as a literal like the eval-shingle probes):
      // per-doc pair expansion is stateless — the array_intersect
      // replaces the batch's vocab join — and the only state is the
      // complete-mode pair-count map, bounded by K²/2 regardless of
      // stream length. A drained stream equals the batch matrix
      Tables.configure(s)
      val docs = t(s, d, "documents")
      // the SAME vocab helper the batch op uses — the shared-oracle
      // equivalence cannot drift at a rank-100 tie
      val vocab: Array[String] = Text.docFrequencyVocab(docs, "text", 100)
        .collect().map(_.getString(0))
      val schema = docs.schema
      val src = s.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(d)
      val pairs = src
        .select(sort_array(array_intersect(Text.tokenSet(col("text")),
          typedLit(vocab.toSeq))).as("__toks"))
        .select(explode(Text.tokenPairsUdf(col("__toks"))).as("__p"))
        .select(col("__p._1").as("tok_a"), col("__p._2").as("tok_b"))
        .groupBy("tok_a", "tok_b").agg(count(lit(1)).as("n_docs"))
      runStreamToTable(s, pairs, "stream_cooccur_out", mode = "complete")
        .orderBy("tok_a", "tok_b")
    }),
    "stream_top_tokens" -> ((s, d) => {
      // live token leaderboard: complete-mode running counts + top-50;
      // a drained stream's final emission is the batch counts exactly,
      // so it shares text_top_tokens' oracle
      Tables.configure(s)
      val schema = t(s, d, "documents").schema
      val src = s.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(d)
      val top = graft.streaming.StreamIngest.streamingTopTokens(
        src, "text", topK = 50)
      runStreamToTable(s, top, "stream_top_tokens_out", mode = "complete")
        .orderBy(col("n").desc, col("tok").asc)
    }),
    "stream_rollup_stddev" -> ((s, d) => {
      // the VARIANCE dimension maintained by the stream: each micro-batch
      // appends (n, sum, sumsq) partials under replay-stable keys, and
      // the daily fold over the streamed store equals the direct pass —
      // sums of squares are the same associative merge as everything else
      Tables.configure(s)
      val day = 86400L * 1000000000L
      val base = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-rlsv-$processId-${dirTag(d)}")
      if (base.exists())
        org.apache.commons.io.FileUtils.deleteDirectory(base)
      val p = new java.io.File(base, "store").getPath
      val qy = graft.streaming.StreamIngest.rollupIngest(eventStream(s, d),
        p, new java.io.File(base, "ck").getPath, bucketNanos = BucketH,
        withVariance = true)
      if (!qy.awaitTermination(300000)) {
        qy.stop()
        throw new IllegalStateException(
          "stream_rollup_stddev: ingest did not finish")
      }
      graft.storage.RollupStore.rollup(s, p, day)
        .select(col("bucket_ts"), col("n"),
          (col("sumsq_c") * col("n") - col("sum_c") * col("sum_c"))
            .cast("double").as("var_num"))
        .orderBy("bucket_ts")
    }),
    "stream_rollup_store" -> ((s, d) => {
      // continuous aggregate maintained BY the stream: micro-batches
      // append per-bucket partials under replay-stable keys; the daily
      // rollup over accumulated partials must equal the raw-table oracle
      // (decimal sums / min / max / counts are associative and
      // order-free), so this twin shares rollup_store_daily's oracle
      Tables.configure(s)
      val day = 86400L * 1000000000L
      val base = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-rlst-$processId-${dirTag(d)}")
      if (base.exists())
        org.apache.commons.io.FileUtils.deleteDirectory(base)
      val p = new java.io.File(base, "store").getPath
      val qy = graft.streaming.StreamIngest.rollupIngest(eventStream(s, d),
        p, new java.io.File(base, "ck").getPath, bucketNanos = BucketH)
      if (!qy.awaitTermination(300000)) {
        // fail loudly: rolling up a partially-ingested store would hand
        // an incomplete result to the oracle compare (runStreamToTable's
        // contract)
        qy.stop()
        throw new IllegalStateException(
          "stream_rollup_store: ingest did not finish")
      }
      graft.storage.RollupStore.rollup(s, p, day)
        .select(col("bucket_ts"), col("n"),
          col("min_c").cast("double").as("min_v"),
          col("max_c").cast("double").as("max_v"),
          col("sum_c").cast("double").as("sum_v"))
        .orderBy("bucket_ts")
    }),
    "stream_rollup_keyed" -> ((s, d) => {
      // the stream-maintained KEYED store: each micro-batch appends one
      // partial row per (event_type, bucket) under its replay-stable
      // key, and the per-series daily rollup equals the grouped
      // raw-table oracle — the keyed twin of stream_rollup_store
      Tables.configure(s)
      val day = 86400L * 1000000000L
      val base = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-rlkst-$processId-${dirTag(d)}")
      if (base.exists())
        org.apache.commons.io.FileUtils.deleteDirectory(base)
      val p = new java.io.File(base, "store").getPath
      val qy = graft.streaming.StreamIngest.rollupIngest(eventStream(s, d),
        p, new java.io.File(base, "ck").getPath, bucketNanos = BucketH,
        keyCols = Seq("event_type"))
      if (!qy.awaitTermination(300000)) {
        qy.stop()
        throw new IllegalStateException(
          "stream_rollup_keyed: ingest did not finish")
      }
      graft.storage.RollupStore.rollup(s, p, day)
        .select(col("event_type"), col("bucket_ts"), col("n"),
          col("min_c").cast("double").as("min_v"),
          col("max_c").cast("double").as("max_v"),
          col("sum_c").cast("double").as("sum_v"))
        .orderBy("event_type", "bucket_ts")
    }),
    "stream_rollup_cascade" -> ((s, d) => {
      // the stream-maintained store COMPOSED with store→store tiering:
      // micro-batches keep a 1h mirror store (replay-keyed appends, no
      // tier horizon), old buckets age into a daily store, and the
      // raw-less stitched read still equals the raw-table oracle — the
      // mirror serves [horizon, ∞), the daily tier everything below
      Tables.configure(s)
      val day = 86400L * 1000000000L
      val base = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-rlcas-$processId-${dirTag(d)}")
      if (base.exists())
        org.apache.commons.io.FileUtils.deleteDirectory(base)
      val stH = new java.io.File(base, "st-1h").getPath
      val stD = new java.io.File(base, "st-1d").getPath
      val qy = graft.streaming.StreamIngest.rollupIngest(eventStream(s, d),
        stH, new java.io.File(base, "ck").getPath, bucketNanos = BucketH)
      if (!qy.awaitTermination(300000)) {
        qy.stop()
        throw new IllegalStateException(
          "stream_rollup_cascade: ingest did not finish")
      }
      graft.storage.RollupStore.tierOffStore(s, stH, stD,
        cutoff = ns("2024-01-10"), coarseBucketNanos = day)
      graft.storage.RollupStore.storeCascadeRollup(s, Seq(stH, stD), day)
        .select(col("bucket_ts"), col("n"),
          col("min_c").cast("double").as("min_v"),
          col("max_c").cast("double").as("max_v"),
          col("sum_c").cast("double").as("sum_v"))
        .orderBy("bucket_ts")
    }),
    "stream_sketch_store" -> ((s, d) => {
      // incremental sketch store: documents arrive THROUGH the stream and
      // each micro-batch appends per-source sketch partials; a rollup
      // over the accumulated partials must equal the one-pass batch
      // store's answers — CMS bit-equal (vector addition is order-free),
      // token totals exact, HLL estimate equal (register-max union is
      // order-free over the same hash set)
      Tables.configure(s)
      val docs = t(s, d, "documents")
      val base = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-sksk-$processId-${dirTag(d)}")
      if (base.exists())
        org.apache.commons.io.FileUtils.deleteDirectory(base)
      val p = new java.io.File(base, "store").getPath
      val src = s.readStream.schema(docs.schema)
        .option("pathGlobFilter", "documents.parquet").parquet(d)
      val qy = graft.streaming.StreamIngest.sketchIngest(src, p,
        new java.io.File(base, "ck").getPath)
      if (!qy.awaitTermination(300000)) {
        qy.stop() // then fail loudly — a partial store must not reach
        throw new IllegalStateException( // the oracle compare
          "stream_sketch_store: ingest did not finish")
      }
      val half = (0 until 10).map(i => s"src$i")
      val bp = new java.io.File(base, "batch").getPath
      graft.pipeline.Text.writeSketchStore(docs, bp)
      val batch = graft.pipeline.Text.sketchRollup(s, bp, half)
        .select(col("cms").as("cms_b"), col("n_tokens").as("n_b"),
          col("distinct_est").as("de_b"))
      graft.pipeline.Text.sketchRollup(s, p, half)
        .crossJoin(broadcast(batch))
        .select((col("cms") === col("cms_b") &&
          col("n_tokens") === col("n_b") &&
          col("distinct_est") === col("de_b"))
          .cast("long").as("store_ok"))
    }),
    "stream_cms" -> ((s, d) => {
      // live count-min sketch: merge is elementwise sum, so the drained
      // complete-mode state is BIT-equal to the batch sketch of the same
      // rows — compared array-wise in-plan, emitted as a one-row gate
      Tables.configure(s)
      val schema = t(s, d, "documents").schema
      val src = s.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(d)
      val sk = graft.streaming.StreamIngest.streamingCms(src, "text")
      val drained = runStreamToTable(s, sk, "stream_cms_out",
        mode = "complete")
      val batch = graft.pipeline.Text.countMinSketch(
        t(s, d, "documents"), "text").withColumnRenamed("sk", "sk_b")
      drained.crossJoin(broadcast(batch))
        .select((col("sk") === col("sk_b")).cast("long").as("cms_ok"))
    }),
    "stream_neardup" -> ((s, d) => {
      // incremental-ingest near-dup: the documents table streamed against
      // ITSELF as the static reference index — LSH band-key probe
      // (stream-static join) + capped-vocabulary exact verify. Streaming
      // the same corpus the index holds makes the emitted pair set equal
      // the batch md5 near-dup pipeline, so it shares that value oracle
      Tables.configure(s)
      val schema = t(s, d, "documents").schema
      val src = s.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(d)
        .withColumn("__ns", ((col("doc_id") + 86400L) * 1000000000L).cast("long"))
      val matches = graft.streaming.StreamIngest.streamingNearDup(
        src, t(s, d, "documents"), "doc_id", "text", "__ns", "1 hour",
        threshold = 0.3)
      runStreamToTable(s, matches, "stream_neardup_out")
        .orderBy("id1", "id2")
    }),
    "stream_contamination" -> ((s, d) => {
      // the decontamination gate on the ingest stream: train docs streamed,
      // eval shingle set static — stateless probe, so the emitted rows are
      // exactly the batch contamination result (shared oracle)
      Tables.configure(s)
      val schema = t(s, d, "documents").schema
      val src = s.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(d)
        .filter(pmod(col("doc_id"), lit(97L)) =!= 0)
      val evalDf = t(s, d, "documents")
        .filter(pmod(col("doc_id"), lit(97L)) === 0)
      val out = graft.streaming.StreamIngest.streamingContamination(
        src, evalDf, "doc_id", "text")
      runStreamToTable(s, out, "stream_contamination_out").orderBy("doc_id")
    }),
    "stream_dup_index" -> ((s, d) => {
      // the dup-gram index MAINTAINED BY the stream: micro-batches append
      // gram-count partials under replay-stable keys, and scoring the
      // corpus against the streamed index equals the one-shot mine
      // (shares text_dup_spans' oracle) — the rollupIngest discipline on
      // the dedup tier
      Tables.configure(s)
      val base = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-dgst-$processId-${dirTag(d)}")
      if (base.exists())
        org.apache.commons.io.FileUtils.deleteDirectory(base)
      val p = new java.io.File(base, "idx").getPath
      val schema = t(s, d, "documents").schema
      val src = s.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(d)
      val qy = graft.streaming.StreamIngest.dupGramIngest(src, p,
        new java.io.File(base, "ck").getPath, "doc_id", "text", k = 8)
      if (!qy.awaitTermination(300000)) {
        qy.stop()
        throw new IllegalStateException(
          "stream_dup_index: ingest did not finish")
      }
      Text.dupSpanCoverageStored(t(s, d, "documents"), "doc_id", "text",
        Text.dupGramsFrom(s, p, k = 8), k = 8)
        .orderBy("doc_id")
    }),
    "stream_excise_spans" -> ((s, d) => {
      // ingest-side excision: each micro-batch loses its duplicated
      // spans through the SAME index-probing join the at-rest path uses
      // (no driver-collected gram closure — the set is corpus-sized at
      // scale); the drained sink equals the batch transform (shared
      // oracle, rebuilt text included)
      Tables.configure(s)
      val base = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-sexc-$processId-${dirTag(d)}")
      if (base.exists())
        org.apache.commons.io.FileUtils.deleteDirectory(base)
      val schema = t(s, d, "documents").schema
      val src = s.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(d)
      val sink = new java.io.File(base, "sink").getPath
      val qy = graft.streaming.StreamIngest.streamingExciseSpans(
        src, Text.openDupGramIndex(s, dupGramIdx(s, d), k = 8), sink,
        new java.io.File(base, "ck").getPath, "doc_id", "text", k = 8)
      if (!qy.awaitTermination(300000)) {
        qy.stop()
        throw new IllegalStateException(
          "stream_excise_spans: ingest did not finish")
      }
      s.read.parquet(sink)
        .dropDuplicates("doc_id", "batch_key") // at-least-once replays
        .select("doc_id", "n_tokens", "dup_tokens", "text_clean")
        .orderBy("doc_id")
    }),
    "stream_dup_spans" -> ((s, d) => {
      // ingest-side duplicated-span coverage: each micro-batch probes
      // the AT-REST serving index with the distributed scoring join
      // (broadcast under the size gate, shuffle past it) — never a
      // driver-collected gram set, which is corpus-proportional and
      // cannot exist at 100 TB; the drained sink equals the batch
      // coverage (shared oracle)
      Tables.configure(s)
      val base = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-sdsp-$processId-${dirTag(d)}")
      if (base.exists())
        org.apache.commons.io.FileUtils.deleteDirectory(base)
      val schema = t(s, d, "documents").schema
      val src = s.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(d)
      val sink = new java.io.File(base, "sink").getPath
      val qy = graft.streaming.StreamIngest.streamingDupSpans(
        src, Text.openDupGramIndex(s, dupGramIdx(s, d), k = 8), sink,
        new java.io.File(base, "ck").getPath, "doc_id", "text", k = 8)
      if (!qy.awaitTermination(300000)) {
        qy.stop()
        throw new IllegalStateException(
          "stream_dup_spans: ingest did not finish")
      }
      s.read.parquet(sink)
        .dropDuplicates("doc_id", "batch_key") // at-least-once replays
        .select("doc_id", "n_tokens", "dup_tokens")
        .orderBy("doc_id")
    }),
    "stream_length_trim" -> ((s, d) => {
      // ingest-side adaptive length gate: band mined from the static
      // corpus, arrivals pass/drop via a stateless broadcast semi join —
      // admitted set equals the batch trim exactly (shared oracle)
      Tables.configure(s)
      val schema = t(s, d, "documents").schema
      val src = s.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(d)
        .select("doc_id", "source", "n_chars")
      val out = graft.streaming.StreamIngest.streamingLengthTrim(
        src, t(s, d, "documents").select("doc_id", "source", "n_chars"),
        "n_chars", "source", loPct = 10, hiPct = 90)
      runStreamToTable(s, out, "stream_len_trim_out")
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    }),
    "stream_remove_boilerplate" -> ((s, d) => {
      // ingest-side boilerplate cleaning: the repeated-span fingerprints
      // mine once from the static corpus, each arriving doc cleans in
      // its own row — stateless, so the emitted rows are exactly the
      // batch removeBoilerplate result (shared oracle)
      Tables.configure(s)
      val schema = t(s, d, "documents").schema
      val src = s.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(d)
      val out = graft.streaming.StreamIngest.streamingRemoveBoilerplate(
        src, t(s, d, "documents"), "doc_id", "text")
      runStreamToTable(s, out, "stream_rm_boiler_out").orderBy("doc_id")
    }),
    "stream_mix_sample" -> ((s, d) => {
      // ingest-side budget admission: one AvailableNow pass over the
      // corpus admits exactly the batch mixSample survivor set (md5 order
      // within the batch, prefix rule over all arrivals) — shared oracle
      Tables.configure(s)
      val schema = t(s, d, "documents").schema
      val src = s.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(d)
      val admitted = graft.streaming.StreamIngest.streamingBudgetAdmit(
        src, "doc_id", "text", "lang",
        Map("en" -> 4000L, "de" -> 1000L, "es" -> 1000L, "fr" -> 800L))
      runStreamToTable(s, admitted, "stream_mix_sample_out")
        .select("doc_id", "lang", "n_tokens", "cum_tokens")
        .orderBy("doc_id")
    }),
    "stream_embed_neardup" -> ((s, d) => {
      // incremental-ingest SEMANTIC dedup: the embeddings table streamed
      // against its own static RHP signature index — bucket collision is
      // symmetric, so the emitted ordered pair set equals the batch LSH
      // path and shares dedup_embedding_lsh's literal-planes value oracle
      Tables.configure(s)
      val schema = t(s, d, "embeddings").schema
      val src = s.readStream.schema(schema)
        .option("pathGlobFilter", "embeddings.parquet").parquet(d)
        .withColumn("__ns", ((col("vec_id") + 86400L) * 1000000000L).cast("long"))
      val pairs = graft.streaming.StreamIngest.streamingEmbedNearDup(
        src, t(s, d, "embeddings"), "vec_id", "embedding", "__ns", "1 hour",
        threshold = 0.4, dims = 64, numPlanes = 8)
      runStreamToTable(s, pairs, "stream_embed_neardup_out")
        .select(col("id1"), col("id2"), round(col("cos"), 6).as("cos"))
        .orderBy("id1", "id2")
    }),
    "stream_quality_score" -> ((s, d) => {
      // stateless streaming quality scoring: the linear model runs
      // unchanged inside a micro-batch pipeline (narrow map, no
      // watermark, every row emits), so the batch value oracle applies
      // to the streamed output as-is — score docs for keep/drop WHILE
      // the corpus arrives
      Tables.configure(s)
      val schema = t(s, d, "documents").schema
      val src = s.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(d)
      val scored = Text.qualityScore(src, "text")
      runStreamToTable(s, scored, "stream_quality_out")
        .select(col("doc_id"), col("q_score"), col("q_keep"))
        .orderBy("doc_id")
    }),
    "stream_mix_importance" -> ((s, d) => {
      // live DSIR admission: the trained weight table persists once
      // (decisions stay frozen while the crawl streams in); arriving
      // docs score via a stateless broadcast join and the md5-coin
      // keep decision lands on the drained sink's associative reduce —
      // exactly the batch sampler (shared value oracle)
      Tables.configure(s)
      val docs = t(s, d, "documents")
      val path = modelStorePaths.computeIfAbsent(d + "#dsir", _ => {
        val p = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft-dsir-$processId-${dirTag(d)}").getPath
        Text.writeImportanceWeights(Text.ImportanceModel(
          Text.importanceWeights(docs,
            docs.filter(col("lang") === "en"), "text"), 256, 20), p)
        p
      })
      val model = Text.openImportanceWeights(s, path)
      val src = s.readStream.schema(docs.schema)
        .option("pathGlobFilter", "documents.parquet").parquet(d)
      val part = Text.streamingImportanceScore(src, model, "doc_id", "text")
      Text.importanceReduce(
        runStreamToTable(s, part, "stream_dsir_out"), "doc_id",
        model.scaleLog2)
        .orderBy("doc_id")
    }),
    "stream_lm_score" -> ((s, d) => {
      // live LM quality scoring with ZERO streaming state: per-bigram
      // smoothed probabilities via stream-static joins against the
      // at-rest LM (the same stored artifact text_lm_score_stored
      // probes — no micro-batch recounts the reference), partial rows
      // drained to the sink and reduced there. The partials are
      // associative, so the roll-up equals the batch scorer however the
      // source splits into micro-batches (shared value oracle)
      Tables.configure(s)
      val docs = t(s, d, "documents")
      val path = modelStorePaths.computeIfAbsent(d + "#lm", _ => {
        val p = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft-lm-$processId-${dirTag(d)}").getPath
        Text.writeLm(Text.lmRef(
          docs.filter(pmod(col("doc_id"), lit(3L)) === 0), "text"), p)
        p
      })
      val src = s.readStream.schema(docs.schema)
        .option("pathGlobFilter", "documents.parquet").parquet(d)
      val part = Text.streamingLmScore(src, Text.openLm(s, path),
        "doc_id", "text")
      runStreamToTable(s, part, "stream_lm_out")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), sum("p").as("__sum"))
        .withColumn("lm_score", expr("__sum div n_bigrams"))
        .drop("__sum")
        .orderBy("doc_id")
    }),
    "stream_classifier" -> ((s, d) => {
      // live quality filtering with ZERO streaming state: per-token
      // weight lookups via a stream-static join against the at-rest
      // model (the same stored artifact text_classifier_stored probes),
      // partials drained to the sink and reduced there — associative, so
      // the roll-up equals the batch scorer however the source splits
      // into micro-batches (shared value oracle)
      Tables.configure(s)
      val docs = t(s, d, "documents")
      val path = modelStorePaths.computeIfAbsent(d + "#clf", _ => {
        val p = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft-clf-$processId-${dirTag(d)}").getPath
        val train = docs.filter(pmod(col("doc_id"), lit(5L)) < 4)
        Text.writeClassifier(
          Text.classifierTrain(train.filter(col("lang") === "en"),
            train.filter(col("lang") =!= "en"), "text"), p)
        p
      })
      val ref = Text.openClassifier(s, path)
      val src = s.readStream.schema(docs.schema)
        .option("pathGlobFilter", "documents.parquet").parquet(d)
      val part = Text.streamingClassifierScore(src, ref, "doc_id", "text")
      runStreamToTable(s, part, "stream_clf_out")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_toks"),
          sum(col("w").cast("decimal(38,0)")).as("__sum"))
        .withColumn("clf_score", expr("__sum div n_toks"))
        .withColumn("pred_pos", (col("clf_score") >= ref.s).cast("long"))
        .drop("__sum")
        .orderBy("doc_id")
    }),
    "stream_quantize" -> ((s, d) => {
      // stateless streaming feature extraction: the exact-arithmetic int8
      // quantizer runs unchanged inside a micro-batch pipeline — no
      // watermark, every row emits, and the batch quantization value
      // oracle applies to the streamed output as-is
      Tables.configure(s)
      val schema = t(s, d, "embeddings").schema
      val src = s.readStream.schema(schema)
        .option("pathGlobFilter", "embeddings.parquet").parquet(d)
      val qdf = graft.streaming.StreamIngest.quantizedIngest(
        src, "vec_id", "embedding")
      runStreamToTable(s, qdf, "stream_quantize_out")
        // same compare-safe CSV serialization as embed_quantize (shared oracle)
        .select(col("vec_id"),
          concat_ws(",", col("q").cast("array<string>")).as("q"),
          col("max_abs"))
        .orderBy("vec_id")
    }),
    "stream_asof" -> ((s, d) => {
      // streaming as-of enrichment driven to completion: purchases emit
      // once the watermark strictly passes their event-time ms, joined to
      // the latest view at-or-before their ts. Oracle = batch ASOF LEFT
      // JOIN restricted to watermark-complete purchases (max purchase/view
      // event ms - 10 min lateness; the type filter precedes the watermark
      // node, so only joined types drive completeness). ts is µs-truncated at the source so DuckDB (µs
      // timestamps) agrees on every boundary; values pass through with no
      // accumulation, so doubles are oracle-stable.
      Tables.configure(s)
      val src = tsUs(eventStream(s, d))
      val joined = graft.streaming.StreamIngest.streamingAsof(
        src, leftType = "purchase", rightType = "view")
      runStreamToTable(s, joined.toDF(), "stream_asof_out")
        .select("event_id", "user_id", "ts", "value", "r_ts", "r_value")
        .orderBy("event_id")
    }),
    "multimodal_frames" -> ((s, d) =>
      Multimodal.frameSample(
        Multimodal.syntheticMedia(t(s, d, "documents"), "doc_id", "text"), 4)
        .select("media_id", "frame_idx", "frame_key")
        .orderBy("media_id", "frame_idx")),
    "multimodal_features" -> ((s, d) =>
      Multimodal.extractFeatures(
        Multimodal.syntheticMedia(t(s, d, "documents"), "doc_id", "text"))
        .select("media_id", "modality", "n_bytes")
        .orderBy("media_id")),
    "multimodal_decode" -> ((s, d) =>
      // REAL decode: PNG bytes synthesized from a pure (id,x,y) pixel
      // function, decoded back with JDK ImageIO; the oracle recomputes the
      // channel sums arithmetically, so a green row proves a genuine
      // lossless encode→decode roundtrip, not plumbing alone
      Multimodal.decodeImages(
        Multimodal.syntheticImages(t(s, d, "documents"), "doc_id"))
        .orderBy("media_id")),
    "multimodal_phash" -> ((s, d) => {
      // image near-dup via aHash on REAL pixels: exact re-renders (id +
      // 16128 preserves base/width/height) must collide, one-pixel noise
      // must stay within hamming 2, and the 50 distinct images must not
      // degenerate to a handful of hashes
      val ids = t(s, d, "documents").select("doc_id")
        .filter(col("doc_id") < 50)
      val orig = Multimodal.syntheticImages(ids, "doc_id")
      val twins = Multimodal.syntheticImages(
        ids.withColumn("doc_id", col("doc_id") + 16128L), "doc_id")
      val noisy = Multimodal.syntheticImagesPerturbed(ids, "doc_id")
      val h = Multimodal.imageHashes(
        orig.unionByName(twins).unionByName(noisy))
      val o = h.filter(col("media_id") < 50)
        .select(col("media_id").as("id"), col("phash").as("h0"))
      val tw = h.filter(col("media_id") >= 16128L &&
          col("media_id") < 16128L + 50)
        .select((col("media_id") - 16128L).as("id"), col("phash").as("ht"))
      val nz = h.filter(col("media_id") >= Multimodal.PerturbOffset)
        .select((col("media_id") - Multimodal.PerturbOffset).as("id"),
          col("phash").as("hn"))
      o.join(tw, "id").join(nz, "id")
        .agg(
          sum(when(col("h0") === col("ht"), 1L).otherwise(0L)).as("twin_eq"),
          sum(when(expr("bit_count(h0 ^ hn)") <= 2, 1L).otherwise(0L))
            .as("noise_close"),
          count_distinct(col("h0")).as("n_distinct"))
        .select((col("twin_eq") === 50L && col("noise_close") === 50L &&
          col("n_distinct") >= 20L).cast("long").as("phash_ok"))
    }),
    "multimodal_resize" -> ((s, d) =>
      // REAL resize: synthesize PNGs → ImageIO decode → nearest-neighbor
      // resample (integer source coords) → PNG re-encode → decode AGAIN;
      // the oracle recomputes the resampled channel sums arithmetically,
      // proving the full decode→transform→re-encode chain on real pixels
      Multimodal.decodeImages(
        Multimodal.resizeImages(
          Multimodal.syntheticImages(t(s, d, "documents"), "doc_id"),
          width = 12, height = 10))
        .orderBy("media_id")),
    "multimodal_audio" -> ((s, d) =>
      // the audio twin of multimodal_decode: 16-bit PCM synthesized from a
      // pure (id, i) sample function, wrapped in a REAL RIFF/WAV container
      // and decoded back through javax.sound.sampled — the oracle
      // recomputes sample count, duration, and integer sample sums
      Multimodal.decodeAudio(
        Multimodal.syntheticAudio(t(s, d, "documents"), "doc_id"))
        .orderBy("media_id")),
    "multimodal_video" -> ((s, d) =>
      // REAL video-container frame sampling: packed PNG frames (MJPEG
      // shape) parsed and every 2nd frame ImageIO-decoded; the oracle
      // recomputes the sampled frames' channel sums from the shared pixel
      // function with the per-frame base shift
      Multimodal.decodeVideoFrames(
        Multimodal.syntheticVideo(t(s, d, "documents"), "doc_id"), stride = 2)
        .orderBy("media_id", "frame_idx"))
  )

  private def langScoreSql(words: Seq[String]): String =
    s"CAST(len(list_filter($DuckToks, x -> list_contains([" +
      words.map(w => s"'$w'").mkString(",") + s"], x))) AS BIGINT)"

  private def langCaseSql: String =
    """CASE
      |    WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de > 0 THEN 'de'
      |    WHEN s_en >= s_es AND s_en >= s_fr AND s_en > 0 THEN 'en'
      |    WHEN s_es >= s_fr AND s_es > 0 THEN 'es'
      |    WHEN s_fr > 0 THEN 'fr'
      |    ELSE 'und'
      |  END""".stripMargin

  /** DuckDB-side tokenizer (must mirror [[Text.tokens]]). */
  private def DuckToks =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"

  /** Shared CTE body of the classifier oracles: trains the token-ratio
    * model on the 4/5 split exactly as [[Text.classifierTrain]] does
    * (counting + HUGEINT cross-multiplication, S = 2^20), ending with
    * `w` (tok → weight) and `m` (class totals + vocab scalar). */
  private def classifierOracleCore: String =
    s"""tr AS (
       |  SELECT lang, $DuckToks AS toks FROM documents WHERE doc_id % 5 < 4
       |), cpos AS (
       |  SELECT tok, CAST(count(*) AS BIGINT) AS cp
       |  FROM (SELECT unnest(toks) AS tok FROM tr WHERE lang = 'en')
       |  GROUP BY tok
       |), cneg AS (
       |  SELECT tok, CAST(count(*) AS BIGINT) AS cn
       |  FROM (SELECT unnest(toks) AS tok FROM tr WHERE lang <> 'en')
       |  GROUP BY tok
       |), vocab AS (
       |  SELECT coalesce(cpos.tok, cneg.tok) AS tok,
       |    coalesce(cp, 0) AS cp, coalesce(cn, 0) AS cn
       |  FROM cpos FULL JOIN cneg ON cpos.tok = cneg.tok
       |), m AS (
       |  SELECT CAST(sum(cp) AS BIGINT) AS npos,
       |    CAST(sum(cn) AS BIGINT) AS nneg,
       |    CAST(count(*) AS BIGINT) AS v FROM vocab
       |), w AS (
       |  SELECT tok, CAST((1048576::HUGEINT * (cp + 1)
       |      * ((SELECT nneg FROM m) + (SELECT v FROM m)))
       |    // ((cn + 1)::HUGEINT
       |      * ((SELECT npos FROM m) + (SELECT v FROM m))) AS BIGINT) AS w
       |  FROM vocab
       |), w0 AS (
       |  SELECT CAST((1048576::HUGEINT * (nneg + v)) // (npos + v)
       |    AS BIGINT) AS w0 FROM m
       |)""".stripMargin

  /** The `text_bpe_encode` oracle, with the greedy training loop UNROLLED:
    * round k's CTE pair (pK = weighted top adjacent symbol pair of
    * segmentation w(K-1), wK = that pair merged everywhere via plain
    * left-to-right replace) reproduces [[Text.bpeTrain]] bit-for-bit —
    * the pageRank unrolled-iteration oracle pattern applied to tokenizer
    * training. Precondition (holds on any real corpus): every round finds
    * at least one pair. */
  private def bpeEncodeOracleSql(merges: Int): String = {
    // AS MATERIALIZED on every level: each wK is referenced twice (the
    // next round's pair count AND the next wK+1) — inlined, the chain
    // re-evaluates w0 2^merges times; materialized, each level runs once
    val rounds = (1 to merges).map { k =>
      s"""p$k AS MATERIALIZED (
         |  SELECT bg AS pair FROM (
         |    SELECT bg, sum(cnt) AS c FROM (
         |      SELECT cnt, unnest([syms[i] || ' ' || syms[i+1]
         |        for i in generate_series(1, greatest(len(syms)-1, 0))]) AS bg
         |      FROM (SELECT cnt, string_split(trim(seq), ' ') AS syms
         |            FROM w${k - 1})
         |    ) GROUP BY bg ORDER BY c DESC, bg LIMIT 1
         |  )
         |), w$k AS MATERIALIZED (
         |  SELECT w, cnt,
         |    replace(seq, ' ' || (SELECT pair FROM p$k) || ' ',
         |      ' ' || (SELECT replace(pair, ' ', '') FROM p$k) || ' ') AS seq
         |  FROM w${k - 1}
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH w0 AS MATERIALIZED (
       |  SELECT w, CAST(count(*) AS BIGINT) AS cnt,
       |    ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS seq
       |  FROM (SELECT unnest($DuckToks) AS w FROM documents) GROUP BY w
       |), $rounds
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(len(string_split(trim(seq), ' '))) AS BIGINT) AS n_bpe
       |FROM (SELECT doc_id, unnest($DuckToks) AS w FROM documents) d
       |JOIN w$merges USING (w)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** The `text_bpe_encode_batch` oracle: [[Text.bpeTrainBatch]]'s
    * round-at-a-time learning unrolled — round r ranks the bigram
    * candidates of segmentation w(r-1) (count desc, pair asc, top
    * `cands`), keeps those sharing no symbol with ANY higher-ranked
    * candidate (the rank-window rule — expressible as this NOT EXISTS,
    * which is exactly why the Spark side uses it), takes the first
    * `k` survivors, and applies them via k null-guarded replaces
    * (chr(1) never occurs in a symbol, so an absent slot no-ops).
    * Selected pairs are symbol-disjoint, so the replace order within a
    * round cannot matter. */
  private def bpeBatchEncodeOracleSql(rounds: Int, k: Int,
      cands: Int): String =
    s"""WITH ${bpeBatchCtes(rounds, k, cands)}
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(len(string_split(trim(seq), ' '))) AS BIGINT) AS n_bpe
       |FROM (SELECT doc_id, unnest($DuckToks) AS w FROM documents) d
       |JOIN w$rounds USING (w)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** `text_pack_bpe`: the packing arithmetic of `text_pack` fed by the
    * REAL tokenizer's per-doc counts — the batch-trained merge chain's
    * n_bpe replaces the whitespace proxy, so every pack boundary sits at
    * the token budget a training job actually loads. */
  private def bpePackOracleSql(rounds: Int, k: Int, cands: Int,
      contextLen: Int, buckets: Int): String =
    s"""WITH ${bpeBatchCtes(rounds, k, cands)}, enc AS (
       |  SELECT doc_id,
       |    CAST(sum(len(string_split(trim(seq), ' '))) AS BIGINT) AS n_bpe
       |  FROM (SELECT doc_id, unnest($DuckToks) AS w FROM documents) d
       |  JOIN w$rounds USING (w)
       |  GROUP BY doc_id
       |), o AS (
       |  SELECT doc_id, doc_id % $buckets AS bucket, n_bpe AS n_tokens,
       |    CAST(coalesce(sum(n_bpe) OVER (
       |      PARTITION BY doc_id % $buckets ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS "offset"
       |  FROM enc
       |)
       |SELECT doc_id, bucket, n_tokens, "offset",
       |  "offset" // $contextLen AS pack_first,
       |  CASE WHEN n_tokens > 0 THEN ("offset" + n_tokens - 1) // $contextLen
       |       ELSE "offset" // $contextLen END AS pack_last
       |FROM o ORDER BY doc_id""".stripMargin

  private def bpeBatchCtes(rounds: Int, k: Int, cands: Int): String = {
    val roundSql = (1 to rounds).map { r =>
      val applied = (1 to k).foldLeft("seq") { (acc, i) =>
        s"replace($acc, ' ' || coalesce((SELECT pair FROM sel$r " +
          s"WHERE sn = $i), chr(1)) || ' ', ' ' || " +
          s"coalesce((SELECT replace(pair, ' ', '') FROM sel$r " +
          s"WHERE sn = $i), chr(1)) || ' ')"
      }
      s"""cand$r AS MATERIALIZED (
         |  SELECT bg AS pair, row_number() OVER (ORDER BY c DESC, bg) AS rn
         |  FROM (
         |    SELECT bg, sum(cnt) AS c FROM (
         |      SELECT cnt, unnest([syms[i] || ' ' || syms[i+1]
         |        for i in generate_series(1, greatest(len(syms)-1, 0))]) AS bg
         |      FROM (SELECT cnt, string_split(trim(seq), ' ') AS syms
         |            FROM w${r - 1})
         |    ) GROUP BY bg ORDER BY c DESC, bg LIMIT $cands
         |  )
         |), sel$r AS MATERIALIZED (
         |  SELECT pair, row_number() OVER (ORDER BY rn) AS sn
         |  FROM cand$r a
         |  WHERE NOT EXISTS (
         |    SELECT 1 FROM cand$r b
         |    WHERE b.rn < a.rn AND len(list_intersect(
         |      string_split(a.pair, ' '), string_split(b.pair, ' '))) > 0)
         |  ORDER BY rn LIMIT $k
         |), w$r AS MATERIALIZED (
         |  SELECT w, cnt, $applied AS seq FROM w${r - 1}
         |)""".stripMargin
    }.mkString(", ")
    s"""w0 AS MATERIALIZED (
       |  SELECT w, CAST(count(*) AS BIGINT) AS cnt,
       |    ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS seq
       |  FROM (SELECT unnest($DuckToks) AS w FROM documents) GROUP BY w
       |), $roundSql""".stripMargin
  }

  /** Shared CTE chain of the trainPrep oracles (`pipeline_train_prep`,
    * `pipeline_funnel_prep`): scrub → curate chain → decontamination →
    * budget mix, terminating in `mx` — one definition so the end-to-end
    * value oracle and the funnel audit cannot drift. */
  private def trainPrepCtesSql: String =
    s"""scr AS (
       |  SELECT doc_id, ${duckScrubSql("text")} AS text
       |  FROM documents WHERE doc_id % 97 <> 0
       |), ${curateCtesSql("scr")}, cur AS (
       |  SELECT doc_id, text, lang_pred, n_tokens FROM ex
       |  WHERE doc_id NOT IN (SELECT id2 FROM drops)
       |), escr AS (
       |  SELECT doc_id, ${duckScrubSql("text")} AS text
       |  FROM documents WHERE doc_id % 97 = 0
       |), et AS (
       |  SELECT doc_id, $DuckToks AS toks FROM escr
       |), esh AS (
       |  SELECT doc_id, list_distinct(
       |    [array_to_string(toks[i:i+2], ' ')
       |     for i in generate_series(1, greatest(len(toks)-2, 0))]) AS sh
       |  FROM et
       |), ev AS (
       |  SELECT DISTINCT unnest(sh) AS tok FROM esh
       |), ct AS (
       |  SELECT doc_id, $DuckToks AS toks FROM cur
       |), csh AS (
       |  SELECT doc_id, list_distinct(
       |    [array_to_string(toks[i:i+2], ' ')
       |     for i in generate_series(1, greatest(len(toks)-2, 0))]) AS sh
       |  FROM ct
       |), contam AS (
       |  SELECT DISTINCT doc_id
       |  FROM (SELECT doc_id, unnest(sh) AS tok FROM csh) JOIN ev USING (tok)
       |), cln AS (
       |  SELECT * FROM cur WHERE doc_id NOT IN (SELECT doc_id FROM contam)
       |), mx0 AS (
       |  SELECT doc_id, lang_pred, n_tokens,
       |    CAST(sum(n_tokens) OVER (PARTITION BY lang_pred
       |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens,
       |    CASE lang_pred WHEN 'en' THEN 2000 WHEN 'de' THEN 600
       |                   WHEN 'es' THEN 600 WHEN 'fr' THEN 500
       |                   ELSE 0 END AS b
       |  FROM cln
       |), mx AS (
       |  SELECT doc_id, lang_pred, n_tokens, cum_tokens FROM mx0
       |  WHERE b > 0 AND cum_tokens <= b
       |)""".stripMargin

  /** Shared CTE prefix of the BM25 oracles (`retrieval_bm25`,
    * `retrieval_bm25_stored`, `stream_bm25` via sharing, and the sparse
    * leg of `retrieval_hybrid_rrf`): the full index build + engine-exact
    * rational-idf scoring, ranked per query and cut at `topK` in the
    * terminal CTE `bm25r` — one definition so the rankers cannot drift. */
  private def bm25RankedCtes(topK: Int): String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest($DuckToks) AS tok FROM documents
       |), tf AS (
       |  SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2
       |), dl AS (
       |  SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1
       |), stats AS (
       |  SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS t FROM dl
       |), dfs AS (
       |  SELECT tok, count(*) AS df FROM tf GROUP BY 1
       |), q AS (
       |  SELECT * FROM (VALUES (1, 'fast vector scan'),
       |    (2, 'stream window agg'), (3, 'customer join query'))
       |    AS v(query_id, text)
       |), qt AS (
       |  SELECT DISTINCT query_id, unnest($DuckToks) AS tok FROM q
       |), scored AS (
       |  SELECT qt.query_id, tf.doc_id,
       |    CAST(
       |      CAST((1048576 * (s.n - dfs.df + 1)) // (dfs.df + 1)
       |        AS HUGEINT) * 22 * s.t * tf.tf
       |      // CAST(10 * s.t * tf.tf + 3 * s.t + 9 * dl.dl * s.n
       |        AS HUGEINT)
       |      AS BIGINT) AS sc
       |  FROM qt
       |  JOIN dfs USING (tok) JOIN tf USING (tok)
       |  JOIN dl ON dl.doc_id = tf.doc_id, stats s
       |), agg AS (
       |  SELECT query_id, doc_id, CAST(sum(sc) AS BIGINT) AS score,
       |    count(*) AS n_terms
       |  FROM scored GROUP BY 1, 2
       |), bm25r AS (
       |  SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score,
       |    n_terms, rank
       |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, doc_id) AS rank FROM agg)
       |  WHERE rank <= $topK
       |)""".stripMargin

  /** Shared CTE prefix of the epoch-plan oracles (`mix_epochs`,
    * `mix_schedule`): tokenized docs with per-language budgets, domain
    * totals, integer-division full epochs, md5-order cumulative sums and
    * the remainder — one definition so the two oracles cannot drift. */
  private def DuckEpochPlanCtes: String =
    s"""d AS (
       |  SELECT doc_id, lang,
       |         CAST(len($DuckToks) AS BIGINT) AS n_tokens,
       |         md5(CAST(doc_id AS VARCHAR)) AS key,
       |         CASE lang WHEN 'en' THEN 30000 WHEN 'de' THEN 1000
       |                   WHEN 'fr' THEN 800 ELSE 0 END AS bb
       |  FROM documents
       |), f AS (
       |  SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS t
       |  FROM d WHERE bb > 0 GROUP BY lang
       |), e AS (
       |  SELECT lang, t,
       |    CASE WHEN t > 0 THEN CAST((SELECT max(bb) FROM d x
       |      WHERE x.lang = f.lang) // t AS BIGINT)
       |         ELSE CAST(0 AS BIGINT) END AS full_epochs
       |  FROM f
       |), c AS (
       |  SELECT doc_id, d.lang, n_tokens,
       |         CAST(sum(n_tokens) OVER (PARTITION BY d.lang
       |           ORDER BY key, doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |           AS BIGINT) AS cum_tokens,
       |         bb, e.full_epochs, bb - e.full_epochs * e.t AS rem
       |  FROM d JOIN e ON d.lang = e.lang
       |  WHERE bb > 0
       |)""".stripMargin

  /** DuckDB-side PII scrub (must mirror [[Text.scrubPii]]). */
  private def duckScrubSql(textExpr: String): String =
    s"""regexp_replace(regexp_replace($textExpr,
       |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
       |      '\\+[0-9][0-9 -]{6,}[0-9]', '<PHONE>', 'g')""".stripMargin

  /** The curate oracle's CTE chain (feat → … → drops), parameterized on the
    * source relation (must expose doc_id, text) so compositions
    * (pipeline_train_prep) reuse it over a pre-scrubbed/filtered source.
    * Survivors = `SELECT … FROM ex WHERE doc_id NOT IN (SELECT id2 FROM
    * drops)`. */
  private def curateCtesSql(src: String): String =
    s"""feat AS (
       |  SELECT doc_id, text, CAST(len($DuckToks) AS BIGINT) AS n_tokens,
       |    ${langScoreSql(Text.StopwordsDe)} AS s_de,
       |    ${langScoreSql(Text.StopwordsEn)} AS s_en,
       |    ${langScoreSql(Text.StopwordsEs)} AS s_es,
       |    ${langScoreSql(Text.StopwordsFr)} AS s_fr
       |  FROM $src
       |), kept AS (
       |  SELECT doc_id, text, n_tokens, $langCaseSql AS lang_pred
       |  FROM feat WHERE n_tokens BETWEEN 20 AND 70
       |), fp AS (
       |  SELECT *, md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS f
       |  FROM kept
       |), ex AS (
       |  SELECT * FROM fp
       |  WHERE doc_id IN (SELECT min(doc_id) FROM fp GROUP BY f)
       |), t2 AS (
       |  SELECT doc_id, $DuckToks AS toks FROM ex
       |), sh AS (
       |  SELECT doc_id, list_distinct(
       |    [array_to_string(toks[i:i+2], ' ')
       |     for i in generate_series(1, greatest(len(toks)-2, 0))]) AS s
       |  FROM t2
       |), e0 AS (
       |  SELECT doc_id, unnest(s) AS tok FROM sh
       |), stop AS (
       |  SELECT tok FROM e0 GROUP BY tok HAVING count(*) >
       |    greatest(20, ((SELECT count(*) FROM ex) * 5) // 1000)
       |), e AS (
       |  SELECT doc_id, count(*) OVER (PARTITION BY doc_id) AS n, tok
       |  FROM e0 WHERE tok NOT IN (SELECT tok FROM stop)
       |), p AS (
       |  SELECT a.doc_id AS id1, b.doc_id AS id2, a.n AS n1, b.n AS n2,
       |         count(*) AS shared
       |  FROM e a JOIN e b ON a.tok = b.tok AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2, 3, 4
       |), drops AS (
       |  SELECT DISTINCT id2 FROM p
       |  WHERE CAST(shared AS DOUBLE) / (n1 + n2 - shared) >= 0.3
       |)""".stripMargin

  /** The exact shingle-Jaccard pair query (mirrors [[Dedup.jaccardPairs]]
    * incl. the corpus-relative df cap), WITHOUT an ORDER BY so it can serve
    * both as the `dedup_jaccard_pairs` oracle and as the edge-list CTE of
    * the `dedup_clusters` transitive closure. */
  /** Shared CTE prefix (shingles → df-cap → shared-count pair table `p`)
    * of the jaccard and containment oracles — one definition so the two
    * cannot drift. */
  private def SharedPairsSqlPrefix =
    s"""WITH t AS (
       |  SELECT doc_id, $DuckToks AS toks FROM documents
       |), s AS (
       |  SELECT doc_id, list_distinct(
       |    [array_to_string(toks[i:i+2], ' ')
       |     for i in generate_series(1, greatest(len(toks)-2, 0))]) AS sh
       |  FROM t
       |), e0 AS (
       |  SELECT doc_id, unnest(sh) AS tok FROM s
       |), stop AS (
       |  SELECT tok FROM e0 GROUP BY tok HAVING count(*) >
       |    greatest(20, ((SELECT count(*) FROM documents) * 5) // 1000)
       |), e AS (
       |  SELECT doc_id, count(*) OVER (PARTITION BY doc_id) AS n, tok
       |  FROM e0 WHERE tok NOT IN (SELECT tok FROM stop)
       |), p AS (
       |  SELECT a.doc_id AS id1, b.doc_id AS id2, a.n AS n1, b.n AS n2,
       |         count(*) AS shared
       |  FROM e a JOIN e b ON a.tok = b.tok AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2, 3, 4
       |)""".stripMargin

  private def JaccardPairsSqlCore =
    s"""$SharedPairsSqlPrefix
       |SELECT id1, id2, shared, n1, n2,
       |       CAST(shared AS DOUBLE) / (n1 + n2 - shared) AS jaccard
       |FROM p
       |WHERE CAST(shared AS DOUBLE) / (n1 + n2 - shared) >= 0.3""".stripMargin

  /** RHP plane `p` as a DuckDB double-literal array (exact round-trip:
    * components are dyadic rationals). */
  private def planeSql(p: Int, dims: Int, seed: Int): String =
    (0 until dims).map(d =>
      java.lang.Double.toString(Similarity.planeComponent(p, d, seed)))
      .mkString("[", ", ", "]")

  /** RHP signature of `vExpr` (a DOUBLE[] expression) as DuckDB SQL —
    * mirrors [[Similarity.rhpSignature]] bit for bit: per plane, a
    * sequential dot product against the literal plane, sign → bit. */
  private def sigSql(vExpr: String, numPlanes: Int, dims: Int, seed: Int): String =
    (0 until numPlanes).map(p =>
      s"(CASE WHEN list_dot_product($vExpr, ${planeSql(p, dims, seed)}) >= 0" +
        s" THEN ${1 << p} ELSE 0 END)")
      .mkString("(", " + ", ")")

  /** DuckDB cosine matching [[graft.functions.CosineSim]]'s fold order,
    * including its zero-norm guard (NULL, never NaN — NaN sorts above every
    * double in Spark, so it must not reach a ranking). */
  private def cosSql(a: String, b: String): String =
    s"(CASE WHEN list_dot_product($a, $a) = 0 OR list_dot_product($b, $b) = 0" +
      s" THEN NULL ELSE list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * " +
      s"sqrt(list_dot_product($b, $b))) END)"

  private val pipelineOracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp,
        |  min(doc_id) AS keep_id, count(*) AS dup_count
        |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin,
    "dedup_keep_best" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp,
        |    CAST(length(text) AS BIGINT) AS s
        |  FROM documents
        |), r AS (
        |  SELECT fp, doc_id, s,
        |    count(*) OVER (PARTITION BY fp) AS dup_count,
        |    row_number() OVER (PARTITION BY fp ORDER BY s DESC, doc_id ASC)
        |      AS rn
        |  FROM f
        |)
        |SELECT fp, doc_id AS keep_id, s AS score, dup_count
        |FROM r WHERE rn = 1 ORDER BY fp""".stripMargin,
    "dedup_jaccard_pairs" ->
      s"""$JaccardPairsSqlCore
         |ORDER BY id1, id2""".stripMargin,
    "dedup_cross_corpus" ->
      s"""WITH t AS (
         |  SELECT doc_id, $DuckToks AS toks FROM documents
         |), s AS (
         |  SELECT doc_id, list_distinct(
         |    [array_to_string(toks[i:i+2], ' ')
         |     for i in generate_series(1, greatest(len(toks)-2, 0))]) AS sh
         |  FROM t
         |), refd AS (
         |  SELECT * FROM s WHERE doc_id % 3 = 0
         |), newd AS (
         |  SELECT * FROM s WHERE doc_id % 3 <> 0
         |), e0r AS (
         |  SELECT doc_id, unnest(sh) AS tok FROM refd
         |), stop AS (
         |  SELECT tok FROM e0r GROUP BY tok HAVING count(*) >
         |    greatest(20, ((SELECT count(*) FROM refd) * 5) // 1000)
         |), er AS (
         |  SELECT doc_id, count(*) OVER (PARTITION BY doc_id) AS n, tok
         |  FROM e0r WHERE tok NOT IN (SELECT tok FROM stop)
         |), e0n AS (
         |  SELECT doc_id, unnest(sh) AS tok FROM newd
         |), en AS (
         |  SELECT doc_id, count(*) OVER (PARTITION BY doc_id) AS n, tok
         |  FROM e0n WHERE tok NOT IN (SELECT tok FROM stop)
         |), p AS (
         |  SELECT en.doc_id AS new_id, er.doc_id AS ref_id,
         |         en.n AS n_new, er.n AS n_ref, count(*) AS shared
         |  FROM en JOIN er ON en.tok = er.tok
         |  GROUP BY 1, 2, 3, 4
         |)
         |SELECT new_id, ref_id, shared, n_new, n_ref,
         |       CAST(shared AS DOUBLE) / (n_new + n_ref - shared) AS jaccard
         |FROM p
         |WHERE CAST(shared AS DOUBLE) / (n_new + n_ref - shared) >= 0.3
         |ORDER BY new_id, ref_id""".stripMargin,
    "text_contamination" ->
      s"""WITH t AS (
         |  SELECT doc_id, $DuckToks AS toks FROM documents
         |), s AS (
         |  SELECT doc_id, list_distinct(
         |    [array_to_string(toks[i:i+2], ' ')
         |     for i in generate_series(1, greatest(len(toks)-2, 0))]) AS sh
         |  FROM t
         |), ev AS (
         |  SELECT DISTINCT unnest(sh) AS tok FROM s WHERE doc_id % 97 = 0
         |), tr AS (
         |  SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_shingles,
         |         unnest(sh) AS tok
         |  FROM s WHERE doc_id % 97 <> 0
         |)
         |SELECT doc_id, n_shingles, count(*) AS n_hits,
         |       CAST(count(*) AS DOUBLE) / n_shingles AS contamination
         |FROM tr JOIN ev USING (tok)
         |GROUP BY doc_id, n_shingles
         |ORDER BY doc_id""".stripMargin,
    "contamination_report" ->
      s"""WITH t AS (
         |  SELECT doc_id, $DuckToks AS toks FROM documents
         |), s AS (
         |  SELECT doc_id, list_distinct(
         |    [array_to_string(toks[i:i+2], ' ')
         |     for i in generate_series(1, greatest(len(toks)-2, 0))]) AS sh
         |  FROM t
         |), ev0 AS (
         |  SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_shingles, sh
         |  FROM s WHERE doc_id % 97 = 0
         |), ev AS (
         |  SELECT doc_id, unnest(sh) AS tok FROM ev0
         |), tr AS (
         |  SELECT DISTINCT unnest(sh) AS tok FROM s WHERE doc_id % 97 <> 0
         |), agg AS (
         |  SELECT ev.doc_id,
         |    CAST(sum(CASE WHEN tr.tok IS NOT NULL THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_shared
         |  FROM ev LEFT JOIN tr ON ev.tok = tr.tok
         |  GROUP BY ev.doc_id
         |)
         |SELECT ev0.doc_id, ev0.n_shingles,
         |  coalesce(agg.n_shared, CAST(0 AS BIGINT)) AS n_shared,
         |  CASE WHEN ev0.n_shingles > 0
         |       THEN CAST(coalesce(agg.n_shared, 0) AS DOUBLE) / ev0.n_shingles
         |       ELSE 0.0 END AS leakage
         |FROM ev0 LEFT JOIN agg USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "dedup_bloom" ->
      """WITH fp AS (
        |  SELECT doc_id,
        |    md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
        |  FROM documents
        |)
        |SELECT doc_id, fp FROM fp
        |WHERE fp IN (SELECT fp FROM fp WHERE doc_id % 3 = 0)
        |ORDER BY doc_id""".stripMargin,
    // the admitted set is the exact complement of dedup_bloom's dup set
    "stream_bloom_admit" ->
      """WITH fp AS (
        |  SELECT doc_id,
        |    md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
        |  FROM documents
        |)
        |SELECT f.doc_id, f.fp FROM fp f
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM fp r WHERE r.doc_id % 3 = 0 AND r.fp = f.fp)
        |ORDER BY f.doc_id""".stripMargin,
    "text_novelty" ->
      s"""WITH t AS (
         |  SELECT doc_id, $DuckToks AS toks FROM documents
         |), s AS (
         |  SELECT doc_id, list_distinct(
         |    [array_to_string(toks[i:i+2], ' ')
         |     for i in generate_series(1, greatest(len(toks)-2, 0))]) AS sh
         |  FROM t
         |), e AS (
         |  SELECT doc_id, unnest(sh) AS tok FROM s
         |), d AS (
         |  SELECT tok, count(*) AS df FROM e GROUP BY tok
         |)
         |SELECT doc_id, count(*) AS n_shingles,
         |  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
         |  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
         |    AS novelty
         |FROM e JOIN d USING (tok)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "source_stats" ->
      s"""WITH l AS (
         |  SELECT source, text,
         |    ${langScoreSql(Text.StopwordsDe)} AS s_de,
         |    ${langScoreSql(Text.StopwordsEn)} AS s_en,
         |    ${langScoreSql(Text.StopwordsEs)} AS s_es,
         |    ${langScoreSql(Text.StopwordsFr)} AS s_fr
         |  FROM documents
         |), p AS (
         |  SELECT source,
         |    CAST(len($DuckToks) AS BIGINT) AS nt,
         |    CAST(length(text) AS BIGINT) AS nc,
         |    md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp,
         |    $langCaseSql AS lang_pred
         |  FROM l
         |)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(nt) AS BIGINT) AS n_tokens,
         |  CAST(sum(nc) AS BIGINT) AS n_chars,
         |  CAST(count(DISTINCT lang_pred) AS BIGINT) AS n_langs,
         |  CAST(count(DISTINCT fp) AS BIGINT) AS n_unique
         |FROM p GROUP BY source ORDER BY source""".stripMargin,
    "text_length_hist" ->
      s"""SELECT lang, CAST(len($DuckToks) // 10 AS BIGINT) AS bucket,
         |  count(*) AS n_docs
         |FROM documents GROUP BY 1, 2
         |ORDER BY lang, bucket""".stripMargin,
    "text_bpe_pairs" ->
      s"""WITH w AS (
         |  SELECT unnest($DuckToks) AS w FROM documents
         |), p AS (
         |  SELECT unnest([substr(w, i, 2)
         |    for i in generate_series(1, len(w) - 1)]) AS pair
         |  FROM w
         |)
         |SELECT pair, count(*) AS n FROM p
         |GROUP BY pair ORDER BY n DESC, pair LIMIT 50""".stripMargin,
    "text_bpe_encode" -> bpeEncodeOracleSql(8),
    "text_bpe_encode_batch" -> bpeBatchEncodeOracleSql(8, 32, 256),
    "text_pack_bpe" -> bpePackOracleSql(8, 32, 256, 256, 8),
    "text_dup_chunks" -> {
      val size = 32
      s"""WITH t AS (
         |  SELECT doc_id, $DuckToks AS toks FROM documents
         |), m AS (
         |  SELECT doc_id, toks, len(toks) AS n,
         |    CASE WHEN len(toks) = 0 THEN 0
         |         ELSE greatest(1, (len(toks) + $size - 1) // $size)
         |    END AS nc
         |  FROM t
         |), c AS (
         |  SELECT doc_id,
         |    md5(array_to_string(toks[i * $size + 1 : i * $size + $size], ' '))
         |      AS fp
         |  FROM m CROSS JOIN (
         |    SELECT unnest(generate_series(0, 999)) AS i
         |  ) WHERE i < nc
         |), f AS (SELECT fp, count(*) AS df FROM c GROUP BY fp)
         |SELECT doc_id, count(*) AS n_chunks,
         |  CAST(sum(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_dup_chunks
         |FROM c JOIN f USING (fp)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
    // exact duplicated-span coverage: the same k-gram windows, occurrence
    // filter, and gaps-and-islands merge as the operator — pure integer
    // arithmetic end to end, so equality is bit-exact
    "text_dup_spans" -> {
      val k = 8
      s"""WITH t AS (
         |  SELECT doc_id, $DuckToks AS toks FROM documents
         |), g AS (
         |  SELECT doc_id, toks,
         |    unnest(generate_series(1,
         |      greatest(len(toks) - ${k - 1}, 0))) AS i
         |  FROM t
         |), e AS (
         |  SELECT doc_id, i - 1 AS pos,
         |    array_to_string(toks[i : i + ${k - 1}], ' ') AS gram
         |  FROM g
         |), dup AS (
         |  SELECT gram FROM e GROUP BY gram HAVING count(*) >= 2
         |), p AS (
         |  SELECT e.doc_id, e.pos FROM e JOIN dup USING (gram)
         |), isl AS (
         |  SELECT doc_id, pos,
         |    CASE WHEN coalesce(pos >= max(pos + $k) OVER (
         |        PARTITION BY doc_id ORDER BY pos
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |      TRUE) THEN 1 ELSE 0 END AS nw
         |  FROM p
         |), isl2 AS (
         |  SELECT doc_id, pos,
         |    sum(nw) OVER (PARTITION BY doc_id ORDER BY pos) AS island
         |  FROM isl
         |), cov AS (
         |  SELECT doc_id, max(pos) + $k - min(pos) AS covered
         |  FROM isl2 GROUP BY doc_id, island
         |), per AS (
         |  SELECT doc_id, CAST(sum(covered) AS BIGINT) AS dup_tokens
         |  FROM cov GROUP BY doc_id
         |)
         |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
         |  coalesce(per.dup_tokens, 0) AS dup_tokens
         |FROM t LEFT JOIN per USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    },
    // the excision transform: same islands, then survivors rejoin in
    // token order — list(tok ORDER BY pos) mirrors the sorted fold
    "text_excise_spans" -> {
      val k = 8
      s"""WITH t AS (
         |  SELECT doc_id, $DuckToks AS toks FROM documents
         |), g AS (
         |  SELECT doc_id, toks,
         |    unnest(generate_series(1,
         |      greatest(len(toks) - ${k - 1}, 0))) AS i
         |  FROM t
         |), e AS (
         |  SELECT doc_id, i - 1 AS pos,
         |    array_to_string(toks[i : i + ${k - 1}], ' ') AS gram
         |  FROM g
         |), dup AS (
         |  SELECT gram FROM e GROUP BY gram HAVING count(*) >= 2
         |), p AS (
         |  SELECT e.doc_id, e.pos FROM e JOIN dup USING (gram)
         |), isl AS (
         |  SELECT doc_id, pos,
         |    CASE WHEN coalesce(pos >= max(pos + $k) OVER (
         |        PARTITION BY doc_id ORDER BY pos
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |      TRUE) THEN 1 ELSE 0 END AS nw
         |  FROM p
         |), isl2 AS (
         |  SELECT doc_id, pos,
         |    sum(nw) OVER (PARTITION BY doc_id ORDER BY pos) AS island
         |  FROM isl
         |), spans AS (
         |  SELECT doc_id, min(pos) AS s, max(pos) + $k AS e2
         |  FROM isl2 GROUP BY doc_id, island
         |), cov AS (
         |  SELECT doc_id, CAST(sum(e2 - s) AS BIGINT) AS dup_tokens
         |  FROM spans GROUP BY doc_id
         |), cut AS (
         |  SELECT doc_id, unnest(generate_series(s, e2 - 1)) AS pos
         |  FROM spans
         |), tok AS (
         |  SELECT doc_id, unnest(generate_series(1, len(toks))) - 1 AS pos,
         |    toks AS toks
         |  FROM t
         |), kept AS (
         |  SELECT tok.doc_id, tok.pos, tok.toks[tok.pos + 1] AS w
         |  FROM tok ANTI JOIN cut
         |    ON tok.doc_id = cut.doc_id AND tok.pos = cut.pos
         |), clean AS (
         |  SELECT doc_id,
         |    array_to_string(list(w ORDER BY pos), ' ') AS text_clean
         |  FROM kept GROUP BY doc_id
         |)
         |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
         |  coalesce(cov.dup_tokens, 0) AS dup_tokens,
         |  coalesce(clean.text_clean, '') AS text_clean
         |FROM t LEFT JOIN cov USING (doc_id)
         |  LEFT JOIN clean USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    },
    "quality_length_trim" ->
      """WITH h AS (
        |  SELECT source, n_chars, count(*) AS c
        |  FROM documents GROUP BY 1, 2
        |), cum AS (
        |  SELECT source, n_chars, c,
        |    sum(c) OVER (PARTITION BY source ORDER BY n_chars) AS cle
        |  FROM h
        |), tot AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1
        |), keep AS (
        |  SELECT source, n_chars
        |  FROM cum JOIN tot USING (source)
        |  WHERE cle * 100 > n * 10 AND (cle - c) * 100 < n * 90
        |)
        |SELECT doc_id, source, n_chars
        |FROM documents JOIN keep USING (source, n_chars)
        |ORDER BY doc_id""".stripMargin,
    "pipeline_clean" -> {
      val size = 16
      s"""WITH src AS (
         |  SELECT doc_id, source,
         |    regexp_replace(regexp_replace(
         |      text ||
         |      CASE WHEN doc_id % 3 = 0
         |        THEN ' contact user' || doc_id || '@example.com'
         |        ELSE '' END ||
         |      CASE WHEN doc_id % 5 = 0
         |        THEN ' call +1 555 ' ||
         |          lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         |        ELSE '' END,
         |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
         |      '<EMAIL>', 'g'),
         |      '\\+[0-9][0-9 -]{6,}[0-9]', '<PHONE>', 'g') AS t
         |  FROM documents
         |), toks AS (
         |  SELECT doc_id, source,
         |    list_filter(string_split_regex(lower(t), '[^a-z0-9]+'),
         |      x -> x <> '') AS tk
         |  FROM src
         |), m AS (
         |  SELECT doc_id, source, tk,
         |    CASE WHEN len(tk) = 0 THEN 0
         |         ELSE greatest(1, (len(tk) + $size - 1) // $size)
         |    END AS nc
         |  FROM toks
         |), c AS (
         |  SELECT doc_id, i AS ci,
         |    array_to_string(tk[i * $size + 1 : i * $size + $size], ' ')
         |      AS ct
         |  FROM m CROSS JOIN (
         |    SELECT unnest(generate_series(0, 999)) AS i
         |  ) WHERE i < nc
         |), f AS (SELECT ct, count(*) AS df FROM c GROUP BY ct
         |), g AS (
         |  SELECT doc_id, count(*) AS n_chunks,
         |    CAST(sum(CASE WHEN df >= 3 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_dropped,
         |    string_agg(CASE WHEN df < 3 THEN ct END, ' ' ORDER BY ci)
         |      AS clean
         |  FROM c JOIN f USING (ct) GROUP BY doc_id
         |), j AS (
         |  SELECT m.doc_id, m.source,
         |    COALESCE(clean, '') AS text_clean,
         |    COALESCE(n_chunks, 0) AS n_chunks,
         |    COALESCE(n_dropped, 0) AS n_dropped,
         |    len(COALESCE(clean, '')) AS l
         |  FROM m LEFT JOIN g USING (doc_id)
         |), h AS (
         |  SELECT source, l, count(*) AS cnt FROM j GROUP BY 1, 2
         |), cum AS (
         |  SELECT source, l, cnt,
         |    sum(cnt) OVER (PARTITION BY source ORDER BY l) AS cle
         |  FROM h
         |), tot AS (
         |  SELECT source, CAST(sum(cnt) AS BIGINT) AS n FROM h GROUP BY 1
         |), keep AS (
         |  SELECT source, l FROM cum JOIN tot USING (source)
         |  WHERE cle * 100 > n * 10 AND (cle - cnt) * 100 < n * 90
         |)
         |SELECT doc_id, source, text_clean, n_chunks, n_dropped
         |FROM j JOIN keep USING (source, l)
         |ORDER BY doc_id""".stripMargin
    },
    "text_remove_boilerplate" -> {
      val size = 16
      s"""WITH t AS (
         |  SELECT doc_id, $DuckToks AS toks FROM documents
         |), m AS (
         |  SELECT doc_id, toks,
         |    CASE WHEN len(toks) = 0 THEN 0
         |         ELSE greatest(1, (len(toks) + $size - 1) // $size)
         |    END AS nc
         |  FROM t
         |), c AS (
         |  SELECT doc_id, i AS ci,
         |    array_to_string(toks[i * $size + 1 : i * $size + $size], ' ')
         |      AS ct
         |  FROM m CROSS JOIN (
         |    SELECT unnest(generate_series(0, 999)) AS i
         |  ) WHERE i < nc
         |), f AS (SELECT ct, count(*) AS df FROM c GROUP BY ct
         |), g AS (
         |  SELECT doc_id, count(*) AS n_chunks,
         |    CAST(sum(CASE WHEN df >= 3 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_dropped,
         |    string_agg(CASE WHEN df < 3 THEN ct END, ' ' ORDER BY ci)
         |      AS clean
         |  FROM c JOIN f USING (ct) GROUP BY doc_id
         |)
         |SELECT d.doc_id, COALESCE(clean, '') AS text_clean,
         |  COALESCE(n_chunks, 0) AS n_chunks,
         |  COALESCE(n_dropped, 0) AS n_dropped
         |FROM documents d LEFT JOIN g USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    },
    "text_window_cooccur" ->
      s"""WITH t AS (
         |  SELECT $DuckToks AS toks FROM documents
         |), v AS (
         |  SELECT tok FROM (
         |    SELECT unnest(toks) AS tok FROM t
         |  ) GROUP BY tok
         |  ORDER BY count(*) DESC, tok LIMIT 100
         |), pos AS (
         |  SELECT toks, unnest(generate_series(1, len(toks))) AS i FROM t
         |), pr AS (
         |  SELECT least(toks[i], toks[i + o]) AS tok_a,
         |         greatest(toks[i], toks[i + o]) AS tok_b
         |  FROM pos CROSS JOIN (SELECT unnest([1, 2]) AS o)
         |  WHERE i + o <= len(toks)
         |    AND toks[i] IN (SELECT tok FROM v)
         |    AND toks[i + o] IN (SELECT tok FROM v)
         |)
         |SELECT tok_a, tok_b, count(*) AS n
         |FROM pr GROUP BY tok_a, tok_b
         |ORDER BY tok_a, tok_b""".stripMargin,
    "text_cooccur" ->
      s"""WITH td AS (
         |  SELECT doc_id, unnest(list_distinct($DuckToks)) AS tok
         |  FROM documents
         |), v AS (
         |  SELECT tok FROM (
         |    SELECT tok, count(*) AS df FROM td GROUP BY tok
         |    ORDER BY df DESC, tok LIMIT 100
         |  )
         |), f AS (SELECT doc_id, tok FROM td JOIN v USING (tok))
         |SELECT a.tok AS tok_a, b.tok AS tok_b, count(*) AS n_docs
         |FROM f a JOIN f b ON a.doc_id = b.doc_id AND a.tok < b.tok
         |GROUP BY tok_a, tok_b
         |ORDER BY tok_a, tok_b""".stripMargin,
    "text_collocations" ->
      s"""WITH t AS (SELECT $DuckToks AS toks FROM documents),
         |uni AS (
         |  SELECT tok, CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT unnest(toks) AS tok FROM t) GROUP BY tok
         |), n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni),
         |bi AS (
         |  SELECT bg, CAST(count(*) AS BIGINT) AS c_ab FROM (
         |    SELECT unnest([toks[i] || ' ' || toks[i+1]
         |      for i in generate_series(1, greatest(len(toks)-1, 0))]) AS bg
         |    FROM t)
         |  GROUP BY bg HAVING count(*) >= 5
         |)
         |SELECT string_split(bg, ' ')[1] AS tok_a,
         |  string_split(bg, ' ')[2] AS tok_b, c_ab, ca.c AS c_a, cb.c AS c_b,
         |  CAST((1048576::HUGEINT * c_ab * (SELECT n FROM n))
         |    // (ca.c::HUGEINT * cb.c) AS BIGINT) AS pmi_s
         |FROM bi
         |JOIN uni ca ON ca.tok = string_split(bg, ' ')[1]
         |JOIN uni cb ON cb.tok = string_split(bg, ' ')[2]
         |ORDER BY pmi_s DESC, tok_a, tok_b LIMIT 50""".stripMargin,
    "text_lm_score" ->
      s"""WITH rt AS (
         |  SELECT $DuckToks AS toks FROM documents WHERE doc_id % 3 = 0
         |), runi AS (
         |  SELECT tok, CAST(count(*) AS BIGINT) AS c1
         |  FROM (SELECT unnest(toks) AS tok FROM rt) GROUP BY tok
         |), v AS (SELECT CAST(count(*) AS BIGINT) AS v FROM runi),
         |rbi AS (
         |  SELECT bg, CAST(count(*) AS BIGINT) AS c12 FROM (
         |    SELECT unnest([toks[i] || ' ' || toks[i+1]
         |      for i in generate_series(1, greatest(len(toks)-1, 0))]) AS bg
         |    FROM rt)
         |  GROUP BY bg
         |), d AS (
         |  SELECT doc_id, unnest([toks[i] || ' ' || toks[i+1]
         |    for i in generate_series(1, greatest(len(toks)-1, 0))]) AS bg
         |  FROM (SELECT doc_id, $DuckToks AS toks FROM documents)
         |), p AS (
         |  SELECT doc_id,
         |    (1048576::HUGEINT * (coalesce(c12, 0) + 1))
         |      // (coalesce(c1, 0) + (SELECT v FROM v)) AS p
         |  FROM d
         |  LEFT JOIN rbi USING (bg)
         |  LEFT JOIN runi ON runi.tok = string_split(d.bg, ' ')[1]
         |)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  CAST(sum(p) // count(*) AS BIGINT) AS lm_score
         |FROM p GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_classifier_score" ->
      s"""WITH $classifierOracleCore, d AS (
         |  SELECT doc_id, unnest(toks) AS tok
         |  FROM (SELECT doc_id, $DuckToks AS toks FROM documents)
         |), p AS (
         |  SELECT doc_id, coalesce(w, (SELECT w0 FROM w0)) AS w
         |  FROM d LEFT JOIN w USING (tok)
         |)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
         |  CAST(sum(w::HUGEINT) // count(*) AS BIGINT) AS clf_score,
         |  CAST(CASE WHEN sum(w::HUGEINT) // count(*) >= 1048576
         |    THEN 1 ELSE 0 END AS BIGINT) AS pred_pos
         |FROM p GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_classifier_eval" ->
      s"""WITH $classifierOracleCore, d AS (
         |  SELECT doc_id, unnest(toks) AS tok
         |  FROM (SELECT doc_id, $DuckToks AS toks FROM documents
         |        WHERE doc_id % 5 = 4)
         |), p AS (
         |  SELECT doc_id, coalesce(w, (SELECT w0 FROM w0)) AS w
         |  FROM d LEFT JOIN w USING (tok)
         |), sc AS (
         |  SELECT doc_id,
         |    CASE WHEN sum(w::HUGEINT) // count(*) >= 1048576
         |      THEN 1 ELSE 0 END AS pred_pos
         |  FROM p GROUP BY doc_id
         |)
         |SELECT CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT)
         |    AS is_pos,
         |  CAST(pred_pos AS BIGINT) AS pred_pos,
         |  CAST(count(*) AS BIGINT) AS n_docs
         |FROM sc JOIN documents USING (doc_id)
         |GROUP BY 1, 2 ORDER BY is_pos, pred_pos""".stripMargin,
    "text_dup_ngrams" ->
      s"""WITH t AS (
         |  SELECT doc_id, $DuckToks AS toks FROM documents
         |), s AS (
         |  SELECT doc_id, list_distinct(
         |    [array_to_string(toks[i:i+4], ' ')
         |     for i in generate_series(1, greatest(len(toks)-4, 0))]) AS sh
         |  FROM t
         |)
         |SELECT tok AS ngram, count(*) AS df, min(doc_id) AS first_doc
         |FROM (SELECT doc_id, unnest(sh) AS tok FROM s)
         |GROUP BY tok HAVING count(*) >= 2
         |ORDER BY df DESC, ngram LIMIT 50""".stripMargin,
    // transitive closure over the same pair list: reach = every (node,
    // reachable-node) via the recursive CTE, component = min reachable id
    "dedup_clusters" ->
      s"""WITH RECURSIVE pr AS (
         |$JaccardPairsSqlCore
         |), und AS (
         |  SELECT id1 AS a, id2 AS b FROM pr
         |  UNION SELECT id2, id1 FROM pr
         |), reach(id, r) AS (
         |  SELECT a, a FROM und
         |  UNION
         |  SELECT und.a, reach.r FROM und JOIN reach ON und.b = reach.id
         |)
         |SELECT id AS doc_id, min(r) AS component,
         |       CAST(CASE WHEN id = min(r) THEN 1 ELSE 0 END AS BIGINT)
         |         AS is_rep
         |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin,
    "dedup_cluster_keepbest" ->
      s"""WITH RECURSIVE pr AS (
         |$JaccardPairsSqlCore
         |), und AS (
         |  SELECT id1 AS a, id2 AS b FROM pr
         |  UNION SELECT id2, id1 FROM pr
         |), reach(id, r) AS (
         |  SELECT a, a FROM und
         |  UNION
         |  SELECT und.a, reach.r FROM und JOIN reach ON und.b = reach.id
         |), comp AS (
         |  SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id
         |), sc AS (
         |  SELECT doc_id, CAST(len($DuckToks) AS BIGINT) AS s FROM documents
         |), r AS (
         |  SELECT component, comp.doc_id, s,
         |    row_number() OVER (PARTITION BY component
         |      ORDER BY s DESC, comp.doc_id ASC) AS rn,
         |    CAST(count(*) OVER (PARTITION BY component) AS BIGINT)
         |      AS cluster_size
         |  FROM comp JOIN sc ON comp.doc_id = sc.doc_id
         |)
         |SELECT component, doc_id AS keep_id, s AS score, cluster_size
         |FROM r WHERE rn = 1 ORDER BY component""".stripMargin,
    "pipeline_curate" ->
      s"""WITH ${curateCtesSql("documents")}
         |SELECT doc_id, lang_pred, n_tokens FROM ex
         |WHERE doc_id NOT IN (SELECT id2 FROM drops)
         |ORDER BY doc_id""".stripMargin,
    "pipeline_funnel" ->
      s"""WITH ${curateCtesSql("documents")}
         |SELECT CAST(stage_idx AS BIGINT) AS stage_idx, stage,
         |  CAST(n_docs AS BIGINT) AS n_docs
         |FROM (
         |  SELECT 1 AS stage_idx, 'input' AS stage,
         |    (SELECT count(*) FROM feat) AS n_docs
         |  UNION ALL SELECT 2, 'length_lang', (SELECT count(*) FROM kept)
         |  UNION ALL SELECT 3, 'exact_dedup', (SELECT count(*) FROM ex)
         |  UNION ALL SELECT 4, 'near_dedup',
         |    (SELECT count(*) FROM ex) - (SELECT count(*) FROM drops)
         |) ORDER BY stage_idx""".stripMargin,
    "pipeline_funnel_prep" ->
      s"""WITH $trainPrepCtesSql
         |SELECT CAST(stage_idx AS BIGINT) AS stage_idx, stage,
         |  CAST(n_docs AS BIGINT) AS n_docs
         |FROM (
         |  SELECT 1 AS stage_idx, 'input' AS stage,
         |    (SELECT count(*) FROM scr) AS n_docs
         |  UNION ALL SELECT 2, 'length_lang', (SELECT count(*) FROM kept)
         |  UNION ALL SELECT 3, 'exact_dedup', (SELECT count(*) FROM ex)
         |  UNION ALL SELECT 4, 'near_dedup', (SELECT count(*) FROM cur)
         |  UNION ALL SELECT 5, 'decontaminated', (SELECT count(*) FROM cln)
         |  UNION ALL SELECT 6, 'budget_mixed', (SELECT count(*) FROM mx)
         |) ORDER BY stage_idx""".stripMargin,
    "pipeline_train_prep" ->
      s"""WITH $trainPrepCtesSql, o AS (
         |  SELECT doc_id, lang_pred, n_tokens, cum_tokens,
         |    doc_id % 4 AS bucket,
         |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY doc_id % 4
         |      ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS "offset"
         |  FROM mx
         |)
         |SELECT doc_id, lang_pred, n_tokens, cum_tokens, bucket, "offset",
         |  "offset" // 128 AS pack_first,
         |  CASE WHEN n_tokens > 0 THEN ("offset" + n_tokens - 1) // 128
         |       ELSE "offset" // 128 END AS pack_last
         |FROM o ORDER BY doc_id""".stripMargin,
    "dedup_embedding" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |), p AS (
        |  SELECT a.vec_id AS id1, b.vec_id AS id2,
        |    list_dot_product(a.v, b.v) /
        |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id
        |)
        |SELECT id1, id2, round(cos, 6) AS cos FROM p
        |WHERE cos >= 0.4 ORDER BY id1, id2""".stripMargin,
    "text_token_counts" ->
      s"""SELECT doc_id,
         |  CAST(len($DuckToks) AS BIGINT) AS n_tokens,
         |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_bpe_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,
    "dedup_minhash_oracle" -> minhashMd5Sql,
    // the xxhash64 fast path emits the same verified pair set as the md5
    // twin (dedup_minhash_lsh_match pins set-equality in both directions),
    // and the row values (shared/n1/n2/jaccard) come from the exact verify
    // stage, which is hash-independent — so the md5 reconstruction is a
    // valid value oracle for the fast path the driver runs
    "dedup_minhash_lsh" -> minhashMd5Sql,
    // streaming the corpus against its own static index emits exactly the
    // batch near-dup pair set (same banding, same capped verify)
    "stream_neardup" -> minhashMd5Sql,
  )

  private lazy val minhashMd5Sql: String =
      s"""WITH t AS (
         |  SELECT doc_id, $DuckToks AS toks FROM documents
         |), s AS (
         |  SELECT doc_id, list_distinct(
         |    [array_to_string(toks[i:i+2], ' ')
         |     for i in generate_series(1, greatest(len(toks)-2, 0))]) AS sh
         |  FROM t
         |), e0 AS (
         |  SELECT doc_id, unnest(sh) AS tok FROM s
         |), stop AS (
         |  SELECT tok FROM e0 GROUP BY tok HAVING count(*) >
         |    greatest(20, ((SELECT count(*) FROM documents) * 5) // 1000)
         |), e AS (
         |  SELECT doc_id, count(*) OVER (PARTITION BY doc_id) AS n, tok
         |  FROM e0 WHERE tok NOT IN (SELECT tok FROM stop)
         |), hx AS (
         |  SELECT doc_id, r.i,
         |    min(('0x' || substr(md5(CAST(r.i AS VARCHAR) || ':' || e0.tok),
         |      1, 15))::BIGINT) AS mh
         |  FROM e0 CROSS JOIN range(64) r(i)
         |  GROUP BY doc_id, r.i
         |), bnd AS (
         |  SELECT doc_id, i // 4 AS band,
         |    string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS bucket
         |  FROM hx GROUP BY doc_id, i // 4
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |  FROM bnd a JOIN bnd b
         |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
         |), p AS (
         |  SELECT a.doc_id AS id1, b.doc_id AS id2, a.n AS n1, b.n AS n2,
         |         count(*) AS shared
         |  FROM e a JOIN e b ON a.tok = b.tok AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 3, 4
         |)
         |SELECT p.id1, p.id2, p.shared, p.n1, p.n2,
         |       CAST(p.shared AS DOUBLE) / (p.n1 + p.n2 - p.shared) AS jaccard
         |FROM p JOIN cand ON p.id1 = cand.id1 AND p.id2 = cand.id2
         |WHERE CAST(p.shared AS DOUBLE) / (p.n1 + p.n2 - p.shared) >= 0.3
         |ORDER BY p.id1, p.id2""".stripMargin

  private val pipelineOracles2: Map[String, String] = Map(
    "embed_quantize" ->
      """WITH c AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |), m AS (
        |  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS ma
        |  FROM c
        |)
        |SELECT vec_id,
        |  array_to_string(
        |    CASE WHEN ma = 0 THEN list_transform(v, x -> CAST(0 AS TINYINT))
        |         ELSE list_transform(v, x -> CAST(greatest(-127.0,
        |           least(127.0, floor(x * 127.0 / ma + 0.5))) AS TINYINT)) END,
        |    ',') AS q,
        |  ma AS max_abs
        |FROM m ORDER BY vec_id""".stripMargin,
    "knn_quantized" ->
      """WITH c AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |), m AS (
        |  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS ma
        |  FROM c
        |), qz AS (
        |  SELECT vec_id,
        |    CASE WHEN ma = 0 THEN list_transform(v, x -> CAST(0 AS DOUBLE))
        |         ELSE list_transform(v, x -> CAST(greatest(-127.0,
        |           least(127.0, floor(x * 127.0 / ma + 0.5))) AS DOUBLE)) END AS q
        |  FROM m
        |), qs AS (
        |  SELECT vec_id AS qid, q AS qq FROM qz WHERE vec_id < 10
        |), sc AS (
        |  SELECT qs.qid, qz.vec_id,
        |    list_dot_product(qs.qq, qz.q) /
        |      (sqrt(list_dot_product(qs.qq, qs.qq)) *
        |       sqrt(list_dot_product(qz.q, qz.q))) AS cos
        |  FROM qs CROSS JOIN qz WHERE qs.qid <> qz.vec_id
        |), r AS (
        |  SELECT qid, vec_id, cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC)
        |      AS rank
        |  FROM sc
        |)
        |SELECT qid, rank, vec_id, round(cos, 6) AS cos FROM r
        |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,
    "text_nfc" ->
      """SELECT doc_id, nfc_normalize(text) AS nfc_text,
        |  CAST(nfc_normalize(text || 'e' || chr(769)) =
        |       nfc_normalize(text) || chr(233) AS BIGINT) AS composed_ok
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the emitted subset of the streaming as-of join is the batch ASOF
    // LEFT JOIN over purchases whose event-time ms is strictly below the
    // final watermark (max event ms - 10 min lateness)
    "stream_asof" ->
      """WITH l AS (
        |  SELECT event_id, user_id, epoch_ns(ts) AS ts, value
        |  FROM events WHERE event_type = 'purchase'
        |), r AS (
        |  SELECT user_id, epoch_ns(ts) AS ts, value
        |  FROM events WHERE event_type = 'view'
        |), j AS (
        |  SELECT l.event_id, l.user_id, l.ts, l.value,
        |         r.ts AS r_ts, r.value AS r_value
        |  FROM l ASOF LEFT JOIN r
        |    ON l.user_id = r.user_id AND l.ts >= r.ts
        |), mx AS (SELECT max(epoch_ns(ts)) AS m FROM events
        |          WHERE event_type IN ('purchase', 'view'))
        |SELECT event_id, user_id, ts, value, r_ts, r_value FROM j, mx
        |WHERE ts // 1000000 < m // 1000000 - 600000
        |ORDER BY event_id""".stripMargin,
    // streaming dedup emits one arbitrary row per fingerprint — the
    // deterministic fact is the fingerprint SET, = batch distinct
    "stream_dedup" ->
      """SELECT DISTINCT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
        |FROM documents ORDER BY fp""".stripMargin,
    "dedup_simhash" -> {
      // 60-bit md5 token hashes: per-bit sign-sums, assemble bits 0-59
      // (bits 60-63 sign-sum to -n → 0), all-pairs hamming <= 3. Matches
      // the pigeonhole candidate generator exactly BECAUSE its recall is
      // complete — the oracle is the proof.
      val bitSum = (0 until 60).map(b =>
        s"(CASE WHEN sum(CASE WHEN (hv >> $b) & 1 = 1 THEN 1 ELSE -1 END)" +
          s" > 0 THEN (1::BIGINT << $b) ELSE 0::BIGINT END)")
        .mkString(" + ")
      s"""WITH e AS (
         |  SELECT doc_id,
         |    ('0x' || substr(md5(unnest($DuckToks)), 1, 15))::BIGINT AS hv
         |  FROM documents
         |), s AS (
         |  SELECT doc_id, $bitSum AS simhash FROM e GROUP BY doc_id
         |), p AS (
         |  SELECT a.doc_id AS id1, b.doc_id AS id2,
         |         a.simhash AS sh1, b.simhash AS sh2,
         |         bit_count(xor(a.simhash, b.simhash)) AS hamming
         |  FROM s a JOIN s b ON a.doc_id < b.doc_id
         |)
         |SELECT id1, id2, sh1, sh2, hamming FROM p
         |WHERE hamming <= 3 ORDER BY id1, id2""".stripMargin
    },
    "text_chunks" -> {
      val (size, overlap) = (32, 8); val step = size - overlap
      s"""WITH t AS (
         |  SELECT doc_id, $DuckToks AS toks FROM documents
         |), m AS (
         |  SELECT doc_id, toks, len(toks) AS n,
         |    CASE WHEN len(toks) = 0 THEN 0
         |         ELSE greatest(1, (len(toks) - $overlap + $step - 1) // $step)
         |    END AS nc
         |  FROM t
         |)
         |SELECT doc_id, i AS chunk_idx,
         |  CAST(least($size, n - i * $step) AS BIGINT) AS n_chunk_tokens,
         |  array_to_string(toks[i * $step + 1 : i * $step + $size], ' ')
         |    AS chunk_text
         |FROM m CROSS JOIN (
         |  SELECT unnest(generate_series(0, 999)) AS i
         |) g
         |WHERE g.i < m.nc
         |ORDER BY doc_id, chunk_idx""".stripMargin
    },
    "sample_split" ->
      """SELECT split, count(*) AS n FROM (
        |  SELECT CASE
        |    WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |         % 100 < 90 THEN 'train'
        |    WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |         % 100 < 95 THEN 'valid'
        |    ELSE 'test'
        |  END AS split FROM documents
        |) GROUP BY split ORDER BY split""".stripMargin,
    "train_shuffle_shards" ->
      """WITH k AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':7'), 1, 15))
        |      ::BIGINT AS key
        |  FROM documents
        |)
        |SELECT doc_id, key % 16 AS shard,
        |  CAST(row_number() OVER (PARTITION BY key % 16
        |    ORDER BY key, doc_id) - 1 AS BIGINT) AS pos
        |FROM k
        |ORDER BY shard, pos""".stripMargin,
    "profile_documents" ->
      """WITH a AS (
        |  SELECT count(*) AS n,
        |    sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS id_nu,
        |    count(DISTINCT doc_id) AS id_nd,
        |    CAST(min(doc_id) AS VARCHAR) AS id_mn,
        |    CAST(max(doc_id) AS VARCHAR) AS id_mx,
        |    sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS tx_nu,
        |    count(DISTINCT text) AS tx_nd,
        |    min(text) AS tx_mn, max(text) AS tx_mx,
        |    sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS lg_nu,
        |    count(DISTINCT lang) AS lg_nd,
        |    min(lang) AS lg_mn, max(lang) AS lg_mx,
        |    sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS sc_nu,
        |    count(DISTINCT source) AS sc_nd,
        |    min(source) AS sc_mn, max(source) AS sc_mx,
        |    sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS nc_nu,
        |    count(DISTINCT n_chars) AS nc_nd,
        |    CAST(min(n_chars) AS VARCHAR) AS nc_mn,
        |    CAST(max(n_chars) AS VARCHAR) AS nc_mx
        |  FROM documents
        |)
        |SELECT 'doc_id' AS col_name, CAST(n AS BIGINT) AS n,
        |  CAST(id_nu AS BIGINT) AS n_nulls, CAST(id_nd AS BIGINT)
        |    AS n_distinct, id_mn AS min_s, id_mx AS max_s FROM a
        |UNION ALL SELECT 'text', CAST(n AS BIGINT), CAST(tx_nu AS BIGINT),
        |  CAST(tx_nd AS BIGINT), tx_mn, tx_mx FROM a
        |UNION ALL SELECT 'lang', CAST(n AS BIGINT), CAST(lg_nu AS BIGINT),
        |  CAST(lg_nd AS BIGINT), lg_mn, lg_mx FROM a
        |UNION ALL SELECT 'source', CAST(n AS BIGINT), CAST(sc_nu AS BIGINT),
        |  CAST(sc_nd AS BIGINT), sc_mn, sc_mx FROM a
        |UNION ALL SELECT 'n_chars', CAST(n AS BIGINT), CAST(nc_nu AS BIGINT),
        |  CAST(nc_nd AS BIGINT), nc_mn, nc_mx FROM a
        |ORDER BY col_name""".stripMargin,
    // single-window definition of the mixture sample — the Spark side
    // computes the same cumulative sums through the bucketed prefix sum
    "mix_sample" ->
      s"""WITH d AS (
         |  SELECT doc_id, lang,
         |         CAST(len($DuckToks) AS BIGINT) AS n_tokens,
         |         md5(CAST(doc_id AS VARCHAR)) AS key
         |  FROM documents
         |), c AS (
         |  SELECT doc_id, lang, n_tokens,
         |         CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY key, doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |           AS BIGINT) AS cum_tokens,
         |         CASE lang WHEN 'en' THEN 4000 WHEN 'de' THEN 1000
         |                   WHEN 'es' THEN 1000 WHEN 'fr' THEN 800
         |                   ELSE 0 END AS b
         |  FROM d
         |)
         |SELECT doc_id, lang, n_tokens, cum_tokens
         |FROM c WHERE b > 0 AND cum_tokens <= b
         |ORDER BY doc_id""".stripMargin,
    "mix_importance" ->
      s"""WITH b AS (
         |  SELECT doc_id,
         |    ('0x' || substr(md5(tok), 1, 15))::BIGINT % 256 AS bkt
         |  FROM (SELECT doc_id, unnest($DuckToks) AS tok FROM documents)
         |), raw AS (
         |  SELECT bkt, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY bkt
         |), nr AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM raw),
         |tgt AS (
         |  SELECT bkt, CAST(count(*) AS BIGINT) AS tc
         |  FROM b JOIN documents USING (doc_id)
         |  WHERE lang = 'en' GROUP BY bkt
         |), nt AS (SELECT CAST(sum(tc) AS BIGINT) AS n FROM tgt),
         |w AS (
         |  SELECT r.bkt,
         |    (1048576::HUGEINT * (coalesce(t.tc, 0) + 1)
         |       * (SELECT n FROM nr))
         |      // ((r.c + 1)::HUGEINT * (SELECT n FROM nt)) AS w
         |  FROM raw r LEFT JOIN tgt t USING (bkt)
         |), doc AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
         |    CAST(sum(w) // count(*) AS BIGINT) AS weight
         |  FROM b JOIN w USING (bkt) GROUP BY doc_id
         |)
         |SELECT doc_id, n_toks, weight,
         |  CAST(CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
         |      1, 15))::BIGINT % 1048576 < weight
         |    THEN 1 ELSE 0 END AS BIGINT) AS kept
         |FROM doc ORDER BY doc_id""".stripMargin,
    // the sqrt-weight derivation mirrored in SQL: integer weights →
    // integer share division → the same single-window fill as mix_sample
    "mix_temperature" ->
      s"""WITH d AS (
         |  SELECT doc_id, lang,
         |         CAST(len($DuckToks) AS BIGINT) AS n_tokens,
         |         md5(CAST(doc_id AS VARCHAR)) AS key
         |  FROM documents
         |), t AS (
         |  SELECT lang,
         |    CAST(floor(sqrt(CAST(sum(n_tokens) AS DOUBLE))) AS BIGINT) AS w
         |  FROM d GROUP BY lang
         |), b AS (
         |  SELECT lang,
         |    CAST(6000 * w // (SELECT CAST(sum(w) AS BIGINT) FROM t)
         |      AS BIGINT) AS b
         |  FROM t
         |), c AS (
         |  SELECT doc_id, lang, n_tokens,
         |         CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY key, doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |           AS BIGINT) AS cum_tokens
         |  FROM d
         |)
         |SELECT c.doc_id, c.lang, c.n_tokens, c.cum_tokens
         |FROM c JOIN b USING (lang)
         |WHERE b.b > 0 AND c.cum_tokens <= b.b
         |ORDER BY doc_id""".stripMargin,
    // single-window mirror of the epoch-repeat plan: per-domain totals,
    // full epochs by integer division, remainder filled in md5 order
    "mix_epochs" ->
      s"""WITH $DuckEpochPlanCtes
         |SELECT doc_id, lang, n_tokens, cum_tokens, full_epochs,
         |  CAST(full_epochs + CASE WHEN cum_tokens <= rem THEN 1 ELSE 0 END
         |    AS BIGINT) AS repeats
         |FROM c ORDER BY doc_id""".stripMargin,
    // mix_epochs' repeats exploded to (doc, epoch) occurrences with the
    // per-epoch reshuffle key
    "mix_schedule" ->
      s"""WITH $DuckEpochPlanCtes, r AS (
         |  SELECT doc_id, lang, n_tokens,
         |    CAST(full_epochs + CASE WHEN cum_tokens <= rem THEN 1 ELSE 0 END
         |      AS BIGINT) AS repeats
         |  FROM c
         |)
         |SELECT doc_id, lang, n_tokens,
         |  CAST(unnest(generate_series(1, repeats)) AS BIGINT) AS epoch,
         |  md5(CAST(doc_id AS VARCHAR) || ':' ||
         |      CAST(unnest(generate_series(1, repeats)) AS VARCHAR))
         |    AS order_key
         |FROM r WHERE repeats > 0
         |ORDER BY doc_id, epoch""".stripMargin,
    "sample_stratified" ->
      """SELECT doc_id, lang, rank FROM (
        |  SELECT doc_id, lang,
        |         row_number() OVER (PARTITION BY lang
        |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rank
        |  FROM documents
        |) WHERE rank <= 10 ORDER BY doc_id""".stripMargin,
    // exact distinct counts are the oracle-checked values; the sketch-
    // accuracy and merge gates are pinned to 1 (see the gate comment above
    // the recall oracles)
    "corpus_diff" ->
      """WITH d AS (
        |  SELECT lang, doc_id,
        |    md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
        |  FROM documents
        |), o AS (
        |  SELECT DISTINCT lang, fp, 1 AS in_o FROM d WHERE doc_id % 2 = 0
        |), n AS (
        |  SELECT DISTINCT lang, fp, 1 AS in_n FROM d WHERE doc_id % 3 <> 0
        |), j AS (
        |  SELECT lang, in_o, in_n FROM o FULL OUTER JOIN n USING (lang, fp)
        |)
        |SELECT lang,
        |  CAST(sum(CASE WHEN in_o IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_added,
        |  CAST(sum(CASE WHEN in_n IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_removed,
        |  CAST(sum(CASE WHEN in_o IS NOT NULL AND in_n IS NOT NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM j GROUP BY lang ORDER BY lang""".stripMargin,
    "quantile_sketch" ->
      s"""SELECT lang, count(*) AS n_docs,
         |  quantile_cont(len($DuckToks), 0.5) AS p_exact,
         |  CAST(1 AS BIGINT) AS est_ok
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "approx_distinct_tokens" ->
      s"""SELECT lang, CAST(count(DISTINCT tok) AS BIGINT) AS n_exact,
         |       CAST(1 AS BIGINT) AS est_ok
         |FROM (SELECT lang, unnest($DuckToks) AS tok FROM documents)
         |GROUP BY lang
         |UNION ALL
         |SELECT '*', CAST(count(DISTINCT tok) AS BIGINT),
         |       CAST(1 AS BIGINT)
         |FROM (SELECT unnest($DuckToks) AS tok FROM documents)
         |ORDER BY lang""".stripMargin,
    "text_quality" ->
      s"""SELECT doc_id,
         |  length(text) AS n_chars_m,
         |  len($DuckToks) AS n_tokens,
         |  CASE WHEN length(text) > 0 THEN
         |    CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()-]', '', 'g')) AS DOUBLE) / length(text)
         |  ELSE 0.0 END AS punct_ratio,
         |  CASE WHEN length(text) > 0 THEN
         |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / length(text)
         |  ELSE 0.0 END AS digit_ratio,
         |  CASE WHEN length(text) > 0 THEN
         |    CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE) / length(text)
         |  ELSE 0.0 END AS ws_ratio,
         |  CASE WHEN len($DuckToks) > 0 THEN
         |    CAST(len(list_filter($DuckToks,
         |      x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','was','at','by'], x))) AS DOUBLE)
         |      / len($DuckToks)
         |  ELSE 0.0 END AS stopword_ratio,
         |  CASE WHEN len($DuckToks) > 0 THEN
         |    CAST(list_sum(list_transform($DuckToks, x -> length(x))) AS DOUBLE)
         |      / len($DuckToks)
         |  ELSE 0.0 END AS mean_token_len
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_langid" -> {
      def score(words: Seq[String]): String =
        s"CAST(len(list_filter($DuckToks, x -> list_contains([" +
          words.map(w => s"'$w'").mkString(",") + s"], x))) AS BIGINT)"
      s"""WITH s AS (
         |  SELECT doc_id,
         |    ${score(Text.StopwordsDe)} AS score_de,
         |    ${score(Text.StopwordsEn)} AS score_en,
         |    ${score(Text.StopwordsEs)} AS score_es,
         |    ${score(Text.StopwordsFr)} AS score_fr
         |  FROM documents
         |)
         |SELECT doc_id, score_de, score_en, score_es, score_fr,
         |  CASE
         |    WHEN score_de >= score_en AND score_de >= score_es AND score_de >= score_fr AND score_de > 0 THEN 'de'
         |    WHEN score_en >= score_es AND score_en >= score_fr AND score_en > 0 THEN 'en'
         |    WHEN score_es >= score_fr AND score_es > 0 THEN 'es'
         |    WHEN score_fr > 0 THEN 'fr'
         |    ELSE 'und'
         |  END AS lang_pred
         |FROM s ORDER BY doc_id""".stripMargin
    },
    "text_lang_confusion" ->
      s"""WITH s AS (
         |  SELECT lang,
         |    ${langScoreSql(Text.StopwordsDe)} AS s_de,
         |    ${langScoreSql(Text.StopwordsEn)} AS s_en,
         |    ${langScoreSql(Text.StopwordsEs)} AS s_es,
         |    ${langScoreSql(Text.StopwordsFr)} AS s_fr
         |  FROM documents
         |), p AS (
         |  SELECT lang AS lang_true, $langCaseSql AS lang_pred FROM s
         |)
         |SELECT lang_true, lang_pred, count(*) AS n
         |FROM p GROUP BY lang_true, lang_pred
         |ORDER BY lang_true, lang_pred""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        |  md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_length_quantiles" ->
      s"""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  quantile_cont(len($DuckToks), 0.25) AS p25,
         |  quantile_cont(len($DuckToks), 0.5) AS p50,
         |  quantile_cont(len($DuckToks), 0.75) AS p75
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // mirrors Text.packSequences: per-bucket running token offset ordered
    // by id, integer-divided into context windows
    "text_pack" ->
      s"""WITH t AS (
         |  SELECT doc_id, doc_id % 8 AS bucket,
         |    CAST(len($DuckToks) AS BIGINT) AS n_tokens
         |  FROM documents
         |), o AS (
         |  SELECT doc_id, bucket, n_tokens,
         |    CAST(coalesce(sum(n_tokens) OVER (
         |      PARTITION BY bucket ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS "offset"
         |  FROM t
         |)
         |SELECT doc_id, bucket, n_tokens, "offset",
         |  "offset" // 256 AS pack_first,
         |  CASE WHEN n_tokens > 0 THEN ("offset" + n_tokens - 1) // 256
         |       ELSE "offset" // 256 END AS pack_last
         |FROM o ORDER BY doc_id""".stripMargin,
    "text_length_filter" ->
      s"""WITH tk AS (
         |  SELECT doc_id, lang, CAST(len($DuckToks) AS BIGINT) AS n_tokens
         |  FROM documents
         |), b AS (
         |  SELECT lang, quantile_cont(n_tokens, 0.125) AS p_lo,
         |         quantile_cont(n_tokens, 0.875) AS p_hi
         |  FROM tk GROUP BY lang
         |)
         |SELECT doc_id, tk.lang, n_tokens, p_lo, p_hi
         |FROM tk JOIN b USING (lang)
         |WHERE n_tokens >= p_lo AND n_tokens <= p_hi
         |ORDER BY doc_id""".stripMargin,
    "text_pack_manifest" ->
      s"""WITH t AS (
         |  SELECT doc_id, doc_id % 8 AS bucket,
         |    CAST(len($DuckToks) AS BIGINT) AS n_tokens
         |  FROM documents
         |), o AS (
         |  SELECT doc_id, bucket, n_tokens,
         |    CAST(coalesce(sum(n_tokens) OVER (
         |      PARTITION BY bucket ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS "offset"
         |  FROM t
         |), p AS (
         |  SELECT doc_id, bucket, n_tokens, "offset",
         |    unnest(generate_series("offset" // 256,
         |      ("offset" + n_tokens - 1) // 256)) AS pack
         |  FROM o WHERE n_tokens > 0
         |)
         |SELECT bucket, pack, count(*) AS n_docs, min(doc_id) AS first_doc,
         |  max(doc_id) AS last_doc,
         |  CAST(sum(least("offset" + n_tokens, (pack + 1) * 256) -
         |      greatest("offset", pack * 256)) AS BIGINT) AS n_tokens
         |FROM p GROUP BY bucket, pack
         |ORDER BY bucket, pack""".stripMargin,
    // mirrors Text.tfIdfTopK: tf per (doc, token), df per token over the
    // tf table, deterministic top-3 window
    "text_tfidf" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest($DuckToks) AS token FROM documents
         |), tf AS (
         |  SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2
         |), dfreq AS (
         |  SELECT token, count(*) AS df FROM tf GROUP BY 1
         |), r AS (
         |  SELECT doc_id, token, tf, row_number() OVER (
         |    PARTITION BY doc_id ORDER BY tf DESC, token ASC) AS rank
         |  FROM tf
         |)
         |SELECT r.doc_id, r.token, CAST(r.tf AS BIGINT) AS tf,
         |  CAST(dfreq.df AS BIGINT) AS df,
         |  CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_docs,
         |  CAST(r.rank AS BIGINT) AS rank
         |FROM r JOIN dfreq USING (token)
         |WHERE r.rank <= 3
         |ORDER BY r.doc_id, r.rank""".stripMargin,
    // mirrors Text.repetitionStats: per-token frequency table for the
    // token stats, list-comprehension 3-gram construction for the shingle
    // stats (docs shorter than 3 tokens join as 0-count rows)
    "text_gopher_filter" ->
      s"""WITH t AS (
         |  SELECT doc_id, $DuckToks AS toks FROM documents
         |), f AS (
         |  SELECT doc_id, tok, count(*) AS c
         |  FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
         |  GROUP BY doc_id, tok
         |), a AS (
         |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |    CAST(count(*) AS BIGINT) AS n_distinct,
         |    CAST(max(c) AS BIGINT) AS max_freq,
         |    CAST(sum(c * len(tok)) AS BIGINT) AS sum_len
         |  FROM f GROUP BY doc_id
         |), s AS (
         |  SELECT doc_id,
         |    CAST(greatest(len(toks) - 2, 0) AS BIGINT) AS n_3grams,
         |    CAST(len(list_distinct(
         |      [array_to_string(toks[i:i+2], ' ')
         |       for i in generate_series(1, greatest(len(toks)-2, 0))]))
         |      AS BIGINT) AS n_distinct_3grams
         |  FROM t
         |), m AS (
         |  SELECT d.doc_id, coalesce(a.n_tokens, 0) AS n_tokens,
         |    coalesce(a.n_distinct, 0) AS n_distinct,
         |    coalesce(a.max_freq, 0) AS max_freq,
         |    s.n_3grams, s.n_distinct_3grams,
         |    coalesce(a.sum_len, 0) AS sum_len
         |  FROM documents d
         |  LEFT JOIN a ON d.doc_id = a.doc_id
         |  JOIN s ON d.doc_id = s.doc_id
         |), r AS (
         |  SELECT *,
         |    CAST(n_tokens BETWEEN 10 AND 200 AS BIGINT) AS len_ok,
         |    CAST((n_tokens - n_distinct) * 10 <= n_tokens * 3 AS BIGINT)
         |      AS dup_tok_ok,
         |    CAST((n_3grams - n_distinct_3grams) * 10 <= n_3grams * 3
         |      AS BIGINT) AS dup_3gram_ok,
         |    CAST(max_freq * 5 <= n_tokens AS BIGINT) AS top_tok_ok,
         |    CAST(n_tokens * 2 <= sum_len AND sum_len <= n_tokens * 12
         |      AS BIGINT) AS tok_len_ok
         |  FROM m
         |)
         |SELECT *, CAST(len_ok + dup_tok_ok + dup_3gram_ok + top_tok_ok +
         |    tok_len_ok = 5 AS BIGINT) AS keep
         |FROM r ORDER BY doc_id""".stripMargin,
    "text_repetition" ->
      s"""WITH t AS (
         |  SELECT doc_id, $DuckToks AS toks FROM documents
         |), f AS (
         |  SELECT doc_id, tok, count(*) AS c
         |  FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
         |  GROUP BY doc_id, tok
         |), a AS (
         |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |    CAST(count(*) AS BIGINT) AS n_distinct_tokens,
         |    CAST(max(c) AS BIGINT) AS max_token_freq
         |  FROM f GROUP BY doc_id
         |), s AS (
         |  SELECT doc_id,
         |    CAST(greatest(len(toks) - 2, 0) AS BIGINT) AS n_shingles3,
         |    CAST(len(list_distinct(
         |      [array_to_string(toks[i:i+2], ' ')
         |       for i in generate_series(1, greatest(len(toks)-2, 0))]))
         |      AS BIGINT) AS n_distinct_shingles3
         |  FROM t
         |)
         |SELECT d.doc_id, coalesce(a.n_tokens, 0) AS n_tokens,
         |  coalesce(a.n_distinct_tokens, 0) AS n_distinct_tokens,
         |  coalesce(a.max_token_freq, 0) AS max_token_freq,
         |  s.n_shingles3, s.n_distinct_shingles3
         |FROM documents d
         |LEFT JOIN a USING (doc_id) JOIN s USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    // mirrors Text.scrubPii/pii*Count incl. the planted suffixes; RE2 and
    // Java regex agree on these patterns, 'g' makes DuckDB replace all
    "text_pii_scrub" ->
      """WITH p AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 3 = 0
        |      THEN ' contact user' || doc_id || '@example.com' ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0
        |      THEN ' call +1 555 ' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |      ELSE '' END AS t
        |  FROM documents
        |)
        |SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |      '<EMAIL>', 'g'),
        |    '\+[0-9][0-9 -]{6,}[0-9]', '<PHONE>', 'g') AS scrubbed,
        |  CAST(len(regexp_extract_all(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
        |    AS n_emails,
        |  CAST(len(regexp_extract_all(t, '\+[0-9][0-9 -]{6,}[0-9]')) AS BIGINT)
        |    AS n_phones
        |FROM p ORDER BY doc_id""".stripMargin,
    "text_shingle_fp" ->
      s"""WITH t AS (
         |  SELECT doc_id, $DuckToks AS toks FROM documents
         |), s AS (
         |  SELECT doc_id, list_distinct(
         |    [array_to_string(toks[i:i+2], ' ')
         |     for i in generate_series(1, greatest(len(toks)-2, 0))]) AS sh
         |  FROM t
         |), h AS (
         |  SELECT doc_id,
         |    ('0x' || substr(md5(unnest(sh)), 1, 15))::BIGINT AS hv
         |  FROM s
         |), a AS (
         |  SELECT doc_id, min(hv) AS fp_min, max(hv) AS fp_max,
         |         bit_xor(hv) AS fp_xor
         |  FROM h GROUP BY doc_id
         |)
         |SELECT d.doc_id, a.fp_min, a.fp_max,
         |       coalesce(a.fp_xor, 0) AS fp_xor
         |FROM documents d LEFT JOIN a USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    "multimodal_features" ->
      """SELECT doc_id AS media_id,
        |  ['image','audio','video'][(doc_id % 3) + 1] AS modality,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |FROM documents ORDER BY media_id""".stripMargin,
    "multimodal_frames" ->
      """SELECT doc_id AS media_id, i AS frame_idx,
        |       doc_id || ':' || i AS frame_key
        |FROM documents, generate_series(0, 3) AS t(i)
        |ORDER BY media_id, frame_idx""".stripMargin,
    // mirrors Multimodal.pxR/pxG/pxB + imgW/imgH: the decoded channel sums
    // must equal the closed-form pixel function summed over the image area
    "multimodal_decode" ->
      """WITH p AS (
        |  SELECT doc_id AS media_id,
        |         8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h,
        |         doc_id % 256 AS base
        |  FROM documents
        |)
        |SELECT media_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
        |  CAST(sum((base + 3*x + 5*y) % 256) AS BIGINT) AS sum_r,
        |  CAST(sum((2*base + x + 7*y) % 256) AS BIGINT) AS sum_g,
        |  CAST(sum((base + x*y) % 256) AS BIGINT) AS sum_b
        |FROM p, generate_series(0, 16) AS tx(x), generate_series(0, 13) AS ty(y)
        |WHERE x < w AND y < h
        |GROUP BY 1, 2, 3
        |ORDER BY media_id""".stripMargin,
    // nearest-neighbor source coords are integer floor division, so the
    // resized pixels stay arithmetic functions of (id, x, y)
    "multimodal_resize" ->
      """WITH p AS (
        |  SELECT doc_id AS media_id,
        |         8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h,
        |         doc_id % 256 AS base
        |  FROM documents
        |), g AS (
        |  SELECT media_id, base, (x * w) // 12 AS sx, (y * h) // 10 AS sy
        |  FROM p, generate_series(0, 11) AS tx(x), generate_series(0, 9) AS ty(y)
        |)
        |SELECT media_id, CAST(12 AS INTEGER) AS width,
        |  CAST(10 AS INTEGER) AS height,
        |  CAST(sum((base + 3*sx + 5*sy) % 256) AS BIGINT) AS sum_r,
        |  CAST(sum((2*base + sx + 7*sy) % 256) AS BIGINT) AS sum_g,
        |  CAST(sum((base + sx*sy) % 256) AS BIGINT) AS sum_b
        |FROM g GROUP BY 1, 2, 3
        |ORDER BY media_id""".stripMargin,
    // mirrors Multimodal.pcmSample/audioSamples: 16-bit samples are pure
    // integer arithmetic over (id, i), so the WAV encode→decode roundtrip
    // is provable sum-exactly (bounded series + filter: DuckDB 1.0 has no
    // lateral generate_series)
    "multimodal_audio" ->
      """WITH d AS (
        |  SELECT doc_id AS media_id, 200 + doc_id % 101 AS n FROM documents
        |), s AS (
        |  SELECT media_id, n,
        |    ((media_id*31 + 7*i*i + 13*i) % 65536) - 32768 AS v
        |  FROM d, generate_series(0, 300) AS t(i)
        |  WHERE i < n
        |)
        |SELECT media_id,
        |  CAST(any_value(n) AS BIGINT) AS n_samples,
        |  CAST(8000 AS INTEGER) AS sample_rate,
        |  CAST(any_value(n) * 1000 // 8000 AS BIGINT) AS duration_ms,
        |  CAST(sum(v) AS BIGINT) AS sum_s,
        |  CAST(sum(abs(v)) AS BIGINT) AS sum_abs
        |FROM s GROUP BY media_id
        |ORDER BY media_id""".stripMargin,
    // mirrors Multimodal.syntheticVideo/decodeVideoFrames: sampled frames
    // (k % 2 = 0 of 2 + id % 4) share the image pixel functions with a
    // per-frame base shift (id + 131k) % 256
    "multimodal_video" ->
      """WITH d AS (
        |  SELECT doc_id AS media_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h,
        |         2 + doc_id % 4 AS nf
        |  FROM documents
        |), f AS (
        |  SELECT media_id, w, h, k, (media_id + 131*k) % 256 AS base
        |  FROM d, generate_series(0, 5) AS t(k)
        |  WHERE k < nf AND k % 2 = 0
        |)
        |SELECT media_id, CAST(k AS INTEGER) AS frame_idx,
        |  CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
        |  CAST(sum((base + 3*x + 5*y) % 256) AS BIGINT) AS sum_r,
        |  CAST(sum((2*base + x + 7*y) % 256) AS BIGINT) AS sum_g,
        |  CAST(sum((base + x*y) % 256) AS BIGINT) AS sum_b
        |FROM f, generate_series(0, 16) AS tx(x), generate_series(0, 13) AS ty(y)
        |WHERE x < w AND y < h
        |GROUP BY media_id, k, w, h
        |ORDER BY media_id, frame_idx""".stripMargin,
    // recall gates: the Spark side computes recall-vs-exact and emits 1 iff
    // it clears the threshold; the oracle pins the constant (see the gate
    // queries for why the approximations can't have value oracles)
    "knn_lsh_recall" -> "SELECT CAST(1 AS BIGINT) AS recall_ok",
    "text_heavy_hitters" -> "SELECT CAST(1 AS BIGINT) AS recall_ok",
    // CMS gates: Spark checks the sketch's bounds (no under-counts, e^-d
    // over-count fraction) / batch-vs-drained-stream bit-equality in-plan
    "text_cms_counts" -> "SELECT CAST(1 AS BIGINT) AS cms_ok",
    "stream_cms" -> "SELECT CAST(1 AS BIGINT) AS cms_ok",
    "sketch_store_rollup" -> "SELECT CAST(1 AS BIGINT) AS store_ok",
    "stream_sketch_store" -> "SELECT CAST(1 AS BIGINT) AS store_ok",
    "knn_ivf_recall" -> "SELECT CAST(1 AS BIGINT) AS recall_ok",
    "multimodal_phash" -> "SELECT CAST(1 AS BIGINT) AS phash_ok",
    "knn_pq_recall" -> "SELECT CAST(1 AS BIGINT) AS recall_ok",
    "knn_ivfpq_recall" -> "SELECT CAST(1 AS BIGINT) AS recall_ok",
    "knn_ivfpq_stored" -> "SELECT CAST(1 AS BIGINT) AS recall_ok",
    "knn_ivf_trained" -> "SELECT CAST(1 AS BIGINT) AS recall_ok",
    "knn_quantized_recall" -> "SELECT CAST(1 AS BIGINT) AS recall_ok",
    "dedup_embedding_lsh_recall" -> "SELECT CAST(1 AS BIGINT) AS recall_ok",
    "semdedup_recall" -> "SELECT CAST(1 AS BIGINT) AS recall_ok",
    "dedup_minhash_lsh_recall" -> "SELECT CAST(1 AS BIGINT) AS recall_ok",
    // match gate: fast-path (xxhash64) verified pair set ≡ md5-twin set —
    // with dedup_minhash_oracle hash-proving the md5 set itself, this
    // transitively value-proves the fast path the driver runs
    "dedup_minhash_lsh_match" -> "SELECT CAST(1 AS BIGINT) AS match_ok",
    // the RHP-LSH paths are oracle-EXACT: the plane matrix is embedded as
    // literal arrays, so DuckDB recomputes signatures, the <=1-bit
    // multiprobe candidate set, and the cosine ranking identically
    "dedup_embedding_lsh" ->
      s"""WITH c AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |), sg AS (
         |  SELECT vec_id, v, ${sigSql("v", 8, 64, 42)} AS sig FROM c
         |), pr AS (
         |  SELECT a.vec_id AS id1, b.vec_id AS id2,
         |         ${cosSql("a.v", "b.v")} AS cos
         |  FROM sg a JOIN sg b
         |    ON a.vec_id < b.vec_id
         |   AND bit_count(xor(CAST(a.sig AS BIGINT), CAST(b.sig AS BIGINT))) <= 1
         |)
         |SELECT id1, id2, round(cos, 6) AS cos FROM pr
         |WHERE cos >= 0.4 ORDER BY id1, id2""".stripMargin,
    "knn_lsh" ->
      s"""WITH c AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |), sg AS (
         |  SELECT vec_id, v, ${sigSql("v", 8, 64, 42)} AS sig FROM c
         |), q AS (
         |  SELECT vec_id AS qid, v AS qv, sig AS qsig FROM sg WHERE vec_id < 10
         |), sc AS (
         |  SELECT q.qid, s.vec_id, ${cosSql("q.qv", "s.v")} AS cos
         |  FROM q JOIN sg s
         |    ON s.vec_id <> q.qid
         |   AND bit_count(xor(CAST(q.qsig AS BIGINT), CAST(s.sig AS BIGINT))) <= 1
         |), r AS (
         |  SELECT qid, vec_id, cos,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC)
         |      AS rank
         |  FROM sc
         |)
         |SELECT qid, rank, vec_id, round(cos, 6) AS cos FROM r
         |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,
    "embed_cluster_stats" ->
      s"""WITH c AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |), ct AS (
         |  SELECT vec_id AS cid, v AS cv FROM c WHERE vec_id % 50 = 0
         |), asg AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT c.vec_id, ct.cid,
         |      row_number() OVER (PARTITION BY c.vec_id
         |        ORDER BY ${cosSql("ct.cv", "c.v")} DESC, ct.cid ASC) AS rn
         |    FROM c CROSS JOIN ct
         |  ) WHERE rn = 1
         |)
         |SELECT cid, CAST(count(*) AS BIGINT) AS n,
         |       min(vec_id) AS min_id, max(vec_id) AS max_id
         |FROM asg GROUP BY cid ORDER BY cid""".stripMargin,
    "embed_label_centroids" ->
      """WITH e AS (
        |  SELECT label, unnest(embedding) AS v,
        |         unnest(range(1, len(embedding) + 1)) AS pos
        |  FROM embeddings
        |)
        |SELECT label, pos,
        |  CAST(sum(CAST(floor(CAST(v AS DOUBLE) * 1099511627776) AS BIGINT))
        |    AS BIGINT) AS sum_q,
        |  count(*) AS n
        |FROM e GROUP BY label, pos ORDER BY label, pos""".stripMargin,
    "embed_outliers" ->
      s"""WITH c AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |), ct AS (
         |  SELECT vec_id AS cid, v AS cv FROM c WHERE vec_id % 50 = 0
         |), best AS (
         |  SELECT vec_id, cid, cos FROM (
         |    SELECT c.vec_id, ct.cid, ${cosSql("ct.cv", "c.v")} AS cos,
         |      row_number() OVER (PARTITION BY c.vec_id
         |        ORDER BY ${cosSql("ct.cv", "c.v")} DESC, ct.cid ASC) AS rn
         |    FROM c CROSS JOIN ct
         |  ) WHERE rn = 1
         |)
         |SELECT vec_id, cid, round(cos, 6) AS cos
         |FROM best WHERE cos < 0.1 ORDER BY vec_id""".stripMargin,
    "knn_ivf" ->
      s"""WITH c AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |), ct AS (
         |  SELECT vec_id AS cid, v AS cv FROM c WHERE vec_id % 50 = 0
         |), asg AS (
         |  SELECT vec_id, v, cid FROM (
         |    SELECT c.vec_id, c.v, ct.cid,
         |      row_number() OVER (PARTITION BY c.vec_id
         |        ORDER BY ${cosSql("ct.cv", "c.v")} DESC, ct.cid ASC) AS rn
         |    FROM c CROSS JOIN ct
         |  ) WHERE rn = 1
         |), q AS (
         |  SELECT vec_id AS qid, v AS qv FROM c WHERE vec_id < 10
         |), qc AS (
         |  SELECT qid, qv, cid FROM (
         |    SELECT q.qid, q.qv, ct.cid,
         |      row_number() OVER (PARTITION BY q.qid
         |        ORDER BY ${cosSql("q.qv", "ct.cv")} DESC, ct.cid ASC) AS rn
         |    FROM q CROSS JOIN ct
         |  ) WHERE rn <= 3
         |), sc AS (
         |  SELECT qc.qid, asg.vec_id, ${cosSql("qc.qv", "asg.v")} AS cos
         |  FROM asg JOIN qc ON asg.cid = qc.cid AND asg.vec_id <> qc.qid
         |), r AS (
         |  SELECT qid, vec_id, cos,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC)
         |      AS rank
         |  FROM sc
         |)
         |SELECT qid, rank, vec_id, round(cos, 6) AS cos FROM r
         |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,
    "knn_brute" ->
      """WITH q AS (
        |  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec
        |  FROM embeddings WHERE vec_id < 10
        |), c AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
        |), sc AS (
        |  SELECT qid, vec_id,
        |    list_dot_product(qvec, vec) /
        |      (sqrt(list_dot_product(qvec, qvec)) * sqrt(list_dot_product(vec, vec))) AS cos
        |  FROM q CROSS JOIN c WHERE qid <> vec_id
        |), r AS (
        |  SELECT qid, vec_id, cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rank
        |  FROM sc
        |)
        |SELECT qid, rank, vec_id, round(cos, 6) AS cos
        |FROM r WHERE rank <= 5 ORDER BY qid, rank""".stripMargin
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    qlQueries ++ analyticsQueries ++ pipelineQueries

  def oracleSql: Map[String, String] = {
    val base = qlOracles ++ analyticsOracles ++ pipelineOracles ++ pipelineOracles2
    // the stored-index probe computes the same result as knn_ivf (identical
    // centroids/queries/ranking — only the corpus goes through the
    // partitionBy(cid) layout on disk), so it shares the value oracle;
    // likewise the chunked sessionize is row-identical to the plain one
    base +
      ("knn_ivf_stored" -> base("knn_ivf")) +
      // the bucketed co-located join computes the same aggregate as the
      // shuffle join — only the storage layout differs
      ("join_bucketed" -> base("join_revenue_by_nation")) +
      // log-round star contraction labels the same connected components
      // as min-label propagation, so it shares the recursive-CTE oracle
      ("dedup_clusters_logstar" -> base("dedup_clusters")) +
      ("sessionize_chunked_stats" -> base("sessionize_stats")) +
      // stateless streaming quantization emits every row with the exact
      // batch arithmetic, so it shares embed_quantize's value oracle
      ("stream_quantize" -> base("embed_quantize")) +
      // the linear quality model is a stateless narrow map — streamed
      // scores are the batch scores bit-for-bit (shared value oracle)
      ("stream_quality_score" -> base("text_quality_score")) +
      // the stateless streaming contamination probe emits exactly the
      // batch result (literal eval set, same shingle arithmetic)
      ("stream_contamination" -> base("text_contamination")) +
      // same corpus, same dup-gram set, same window/island arithmetic —
      // the stream emits exactly the batch coverage rows
      ("stream_dup_spans" -> base("text_dup_spans")) +
      // the stored index IS the batch miner's dup set at rest
      ("text_dup_spans_stored" -> base("text_dup_spans")) +
      // gram counts merge by addition, replay-deduped — base + increment
      // equals the one-shot whole-corpus mine
      ("text_dup_index_incr" -> base("text_dup_spans")) +
      // the same additive merge under streaming batch keys
      ("stream_dup_index" -> base("text_dup_spans")) +
      // same set, same islands, same survivor rebuild — per row
      ("stream_excise_spans" -> base("text_excise_spans")) +
      // deltas land in the observing sample's bucket, so stored hourly
      // increase rows sum to the direct daily pass exactly
      ("rollup_counter_store" -> base("ts_counter_increase")) +
      // stateless membership + replay-keyed appends: the streamed sample
      // store holds exactly the batch build's rows, so estimates match
      ("stream_aqp_ingest" -> base("aqp_event_stats")) +
      // the TVF expands to the identical estimate plan over the same
      // store — same sample, same Horvitz-Thompson integers
      ("aqp_sql" -> base("aqp_event_stats")) +
      // the coarsening tier: pre-cutoff hourly buckets fold 24x into the
      // daily store; the stitched read telescopes to the direct pass
      ("rollup_counter_tiered" -> base("ts_counter_increase")) +
      // stream-maintained counter store: cross-batch lag in state, per-
      // batch additive appends — the drained store reads the batch rule
      ("stream_counter_store" -> base("ts_counter_increase")) +
      // the budget router on the counter tier: the month/40-point budget
      // clamps to the daily tier — the oracle is the direct daily pass
      // with the routing contract columns attached
      ("rollup_counter_route" ->
        """WITH e AS (
          |  SELECT user_id, epoch_ns(ts) AS ts, event_id,
          |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
          |  FROM events
          |), p AS (
          |  SELECT user_id, ts, c,
          |    lag(c) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          |      AS prev
          |  FROM e WHERE c IS NOT NULL
          |)
          |SELECT user_id,
          |  (ts - ((ts % 86400000000000) + 86400000000000) % 86400000000000)
          |    // 86400000000000 AS bucket,
          |  CAST(count(*) AS BIGINT) AS n_deltas,
          |  CAST(sum(CASE WHEN c >= prev THEN c - prev ELSE c END)
          |    AS BIGINT) AS inc_cents,
          |  CAST(sum(CASE WHEN c < prev THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_resets,
          |  CAST(86400000000000 AS BIGINT) AS grain_ns,
          |  'stitched' AS source
          |FROM p WHERE prev IS NOT NULL
          |GROUP BY 1, 2
          |ORDER BY user_id, bucket""".stripMargin) +
      // same clamped-to-1h stitched contract as the tiered route, now
      // over the dialect's own retained __day-block table
      ("rollup_metrics_route" -> base("rollup_route_tiered")) +
      // in-row chunk/probe/reassemble against the static corpus's mined
      // span set = the batch cleaned text bit-for-bit (JVM md5 == md5())
      ("stream_remove_boilerplate" -> base("text_remove_boilerplate")) +
      // probing the persisted span index runs the identical cleaning —
      // only the span set's provenance (parquet vs recompute) differs
      ("text_remove_boilerplate_stored" -> base("text_remove_boilerplate")) +
      // the stateless band semi-join admits exactly the batch trim set
      ("stream_length_trim" -> base("quality_length_trim")) +
      // the stream-maintained index holds exactly the batch assignment
      // (same centroids, same arithmetic, only arrival path differs), so
      // the stored probe shares knn_ivf's value oracle
      ("stream_ivf_ingest" -> base("knn_ivf")) +
      // symmetric bucket collision: streaming the corpus against its own
      // signature index emits the batch LSH pair set
      ("stream_embed_neardup" -> base("dedup_embedding_lsh")) +
      // one AvailableNow batch in md5 order admits the batch survivor set
      ("stream_mix_sample" -> base("mix_sample")) +
      // the adjacency-list pair generator emits exactly the self-join's
      // pair multiset, so the whole pipeline shares the same SQL
      ("dedup_jaccard_grouped" -> base("dedup_jaccard_pairs")) +
      // probing the persisted reference index runs the identical
      // keptExploded/crossVerify computation — only the ref frame's
      // provenance (parquet index vs recompute) differs
      ("dedup_index_probe" -> base("dedup_cross_corpus")) +
      // the stateless UDF argmax reproduces the batch window argmax
      // bit-for-bit (same cosine accumulation, same tie-break)
      ("stream_embed_outliers" -> base("embed_outliers")) +
      // one drained batch processes each user's rows in event-time order
      // through the same integer z-test → exactly the batch flag set
      ("stream_zscore" -> base("ts_zscore_anomaly")) +
      // one drained batch replays each user in (ts, id) order — exactly
      // the batch recurrence folds, so both twins share their oracles
      ("stream_ewma" -> base("ts_ewma")) +
      // per-sample delta partials are associative — the drained-sink
      // roll-up equals the batch per-day counter increase exactly
      ("stream_counter_increase" -> base("ts_counter_increase")) +
      // per-bucket rollup partials are associative (decimal sums, min/max,
      // counts), so the stream-maintained store's daily rollup equals the
      // raw-table aggregate bit-for-bit
      ("stream_rollup_store" -> base("rollup_store_daily")) +
      // streamed (n, Σv, Σv²) partials fold to the direct variance
      // numerator exactly — the unkeyed twin of rollup_store_stddev
      ("stream_rollup_stddev" ->
        """WITH e AS (
          |  SELECT epoch_ns(ts) AS ts, CAST(value AS DECIMAL(18,2)) AS v
          |  FROM events
          |)
          |SELECT (ts // 86400000000000) * 86400000000000 AS bucket_ts,
          |  count(*) AS n,
          |  CAST(count(*) * sum(v*v) - sum(v)*sum(v) AS DOUBLE) AS var_num
          |FROM e GROUP BY 1
          |ORDER BY bucket_ts""".stripMargin) +
      // the raw-less stitch (mirror [horizon,∞) ∪ tiers) folds the same
      // associative partials, so it shares the raw-table oracle too
      ("stream_rollup_cascade" -> base("rollup_store_daily")) +
      // the keyed stream-maintained store folds the same per-series
      // partials the batch keyed store does — shared grouped oracle
      ("stream_rollup_keyed" -> base("rollup_keyed_daily")) +
      // dropping the dimension folds across keys with the same
      // associative merges — equals the UNKEYED daily aggregate
      ("rollup_keyed_fold" -> base("rollup_store_daily")) +
      // tier windows are key-agnostic (global horizon), so the keyed
      // stitched read shares the never-tiered grouped oracle
      ("rollup_keyed_tiered" -> base("rollup_keyed_daily")) +
      // the per-series sketch unions across the tier boundary under the
      // same rank-error gate the untiered keyed store uses
      ("rollup_keyed_tiered_users" -> base("rollup_keyed_users")) +
      // same argument through the full raw→1h→1d policy cascade
      ("rollup_keyed_cascade" -> base("rollup_keyed_daily")) +
      // per-(series, day) counters vector-add to per-series totals and
      // the shared integer finisher reproduces the direct operator
      ("rollup_keyed_p90" -> base("ts_histogram_quantile")) +
      // the keyed router clamps the month budget to the daily tier —
      // the grouped daily oracle plus the clamped grain/source literals
      ("rollup_keyed_cascade_route" ->
        """SELECT event_type,
          |  (epoch_ns(ts) // 86400000000000) * 86400000000000
          |    AS bucket_ts,
          |  count(*) AS n,
          |  CAST(min(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_v,
          |  CAST(max(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_v,
          |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
          |  CAST(86400000000000 AS BIGINT) AS grain_ns,
          |  'stitched' AS source
          |FROM events GROUP BY 1, 2
          |ORDER BY event_type, bucket_ts""".stripMargin) +
      // the same routed answer through the SQL table function, one series
      ("rollup_route_sql" ->
        """SELECT event_type,
          |  (epoch_ns(ts) // 86400000000000) * 86400000000000
          |    AS bucket_ts,
          |  count(*) AS n,
          |  CAST(min(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_v,
          |  CAST(max(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_v,
          |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
          |  CAST(86400000000000 AS BIGINT) AS grain_ns,
          |  'stitched' AS source
          |FROM events WHERE event_type = 'click' GROUP BY 1, 2
          |ORDER BY bucket_ts""".stripMargin) +
      ("stream_cusum" -> base("ts_cusum")) +
      ("stream_holt" -> base("ts_holt")) +
      // profile built from the full history == leave-in batch semantics
      ("stream_seasonal" -> base("ts_seasonal_anomaly")) +
      // drained scored-candidate sink rolled up == the batch ranker
      ("stream_bm25" -> base("retrieval_bm25")) +
      // disjoint whole-bucket tiers merge with the same associative fold
      // any rollup uses, so the stitched read equals the raw-table daily
      // aggregate exactly
      ("rollup_tiered_scan" -> base("rollup_store_daily")) +
      // the tiered layout's sketch dims stitch through the same
      // associative unions (HLL union, counter vector-add) the store's
      // own rollups use — so they share the untiered store's oracles
      ("rollup_tiered_users" -> base("rollup_store_users")) +
      ("rollup_tiered_p90" -> base("rollup_store_p90")) +
      // three tiers partition the timeline by horizon windows; the
      // stitched fold is associative, so the cascade shares the
      // raw-table oracles too
      ("rollup_cascade_daily" -> base("rollup_store_daily")) +
      ("rollup_cascade_users" -> base("rollup_store_users")) +
      ("rollup_cascade_p90" -> base("rollup_store_p90")) +
      // the policy-driven layout is a cascade like any other — the
      // stitched fold is associative, so it shares the raw-table oracle
      ("rollup_retention_scan" -> base("rollup_store_daily")) +
      ("rollup_retention_mirror" -> base("rollup_store_daily")) +
      // the trimmed metrics table + its history store stitch to the same
      // daily aggregate the raw table yields
      ("rollup_metrics_history" -> base("rollup_store_daily")) +
      // the stored probe reads the identical tf/dl/dfs frames back from
      // the term-bucketed layout (bucket pruning only skips rows no query
      // term can join), so it shares retrieval_bm25's value oracle
      ("retrieval_bm25_stored" -> base("retrieval_bm25")) +
      // the stored tokenizer round-trips the identical rank-ordered merge
      // list, so encoding is byte-identical to the in-process chain
      ("text_bpe_encode_stored" -> base("text_bpe_encode")) +
      // the stored LM round-trips the exact uni/bi counts + V scalar —
      // same smoothed rationals, same fixed-point scores
      ("text_lm_score_stored" -> base("text_lm_score")) +
      // stateless partials against the stored LM, reduced on the drained
      // sink — associative sums reproduce the batch scores exactly
      ("stream_lm_score" -> base("text_lm_score")) +
      // the stored classifier round-trips the exact weight table + the
      // (w0, s) scalars — same ratio weights, same fixed-point scores
      ("text_classifier_stored" -> base("text_classifier_score")) +
      // base + appended + replayed count batches merge by addition to
      // the one-shot train's totals — same weights, same scores
      ("text_classifier_incr" -> base("text_classifier_score")) +
      // stateless per-token weight lookups against the stored model,
      // reduced on the drained sink — associative sums reproduce the
      // batch scores exactly
      ("stream_classifier" -> base("text_classifier_score")) +
      // stateless per-token partials against the stored weight table;
      // the sink reduce + md5 coin reproduce the batch sampler exactly
      ("stream_mix_importance" -> base("mix_importance")) +
      // the sequential greedy stage pointer over ts-ordered events IS
      // the batch funnel's earliest-first matching
      ("stream_funnel" -> base("ts_funnel")) +
      // a drained complete-mode count aggregation holds exactly the batch
      // token counts — same tokenizer, same tie-break, same top-50
      ("stream_top_tokens" -> base("text_top_tokens")) +
      // one drained batch replays each key in (ts, id) order through the
      // last-event state — the emitted pair multiset IS the batch lead
      // window's, so the counted sink equals the batch matrix
      ("stream_transitions" -> base("ts_transitions")) +
      // a drained complete-mode conditional-sum agg holds exactly the
      // batch pivot's counts (same day buckets, same type list)
      ("stream_pivot_types" -> base("agg_pivot_types")) +
      // the identical intervalJoin plan with a streaming points side —
      // a drained stream rolls up exactly the batch attribution
      ("stream_interval_join" -> base("ts_interval_join")) +
      // the bucket-rewritten band join is stateless against the static
      // right side — drained pairs are the batch pair set bit-for-bit
      ("stream_tolerance_join" -> base("ts_tolerance_join")) +
      // the drained user-day ledger IS the batch distinct (user, day)
      // frame with cohort tags — both rollups equal their batch twins
      ("stream_retention" -> base("ts_retention")) +
      ("stream_active_users" -> base("ts_active_users")) +
      // a drained complete-mode heatmap agg holds exactly the batch
      // dow×hour counts (same integer arithmetic)
      ("stream_heatmap" -> base("ts_heatmap")) +
      // drained complete-mode bucket counts + the same exact finisher ==
      // the batch histogram quantile bit-for-bit
      ("stream_histogram" -> base("ts_histogram_quantile")) +
      // the literal vocabulary equals the batch top-100 (same total
      // order), so the drained pair counts equal the batch matrix
      ("stream_cooccur" -> base("text_cooccur")) +
      // identical vocabulary + pairing UDF → identical pair multiset
      ("stream_window_cooccur" -> base("text_window_cooccur"))
  }
}
