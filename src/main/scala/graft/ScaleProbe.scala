package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness: measure how the headline plans scale when the data grows
  * N× (events; default 10) / M× (documents, quadratic-risk ops; default 4). Builds the scaled
  * tables in /tmp by unioning shifted copies of sf0.1 (disjoint time ranges
  * and user/doc id spaces — same distribution, bigger), then times the same
  * operator code at 1× and N×. Near-linear ratios are the evidence that the
  * partitioning/shuffle story holds as data grows; anything superlinear is
  * a scale bug. Not part of the driver contract.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val work  = "/tmp/graft_scaleprobe"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.TsOps
    import graft.pipeline.{Dedup, Pipelines}

    // ---- build scaled tables (idempotent) -------------------------------
    val events = graft.storage.Tables.read(spark, sfDir, "events")
    val docs   = spark.read.parquet(s"$sfDir/documents.parquet")
    val span = 40L * 86400L * 1000000000L // shift copies by > the data span
    def scaledEvents(k: Int): DataFrame =
      (0 until k).map(i => events
        .withColumn("ts", col("ts") + lit(i * span))
        .withColumn("user_id", col("user_id") + lit(i * 1000000L))
        .withColumn("event_id", col("event_id") + lit(i * 100000000L)))
        .reduce(_.unionByName(_))
    // per-copy caesar cipher on the text: token-length/shingle statistics
    // (and so the df profile and true-dup density) are preserved inside each
    // copy, but vocabularies across copies are disjoint — the 4× corpus has
    // 4× the near-dup structure, not k² cross-copy duplicates
    def scaledDocs(k: Int): DataFrame =
      (0 until k).map { i =>
        val alpha = "abcdefghijklmnopqrstuvwxyz"
        val shifted = alpha.drop(i % 26) + alpha.take(i % 26)
        docs
          .withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
          .withColumn("text", translate(lower(col("text")), alpha, shifted))
      }.reduce(_.unionByName(_))
    // growth factors are env-tunable so the same probe runs the 10x/4x
    // default and bigger sweeps (e.g. 20x/8x) unchanged
    val evK  = sys.env.getOrElse("SPARK_GRAFT_SCALE_EVENTS", "10").toInt
    val docK = sys.env.getOrElse("SPARK_GRAFT_SCALE_DOCS", "4").toInt
    // always regenerate: a cached copy can be stale (different SF dir) or
    // half-written (prior crash) and would silently skew every ratio
    val evScaledPath = s"$work/events$evK.parquet"
    val docScaledPath = s"$work/documents$docK.parquet"
    scaledEvents(evK).repartition(32).write.mode("overwrite").parquet(evScaledPath)
    scaledDocs(docK).repartition(32).write.mode("overwrite").parquet(docScaledPath)
    val evScaled = spark.read.parquet(evScaledPath)
    val docScaled = spark.read.parquet(docScaledPath)

    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // SPARK_GRAFT_PROBE=<regex> runs only matching probes — a full sweep
    // is minutes, a single new row is seconds
    val only = sys.env.get("SPARK_GRAFT_PROBE").map(_.r)
    def sel(name: String) = only.forall(_.findFirstIn(name).isDefined)
    def report(name: String, factor: Int, base: => Long, scaled: => Long): Unit = {
      if (!sel(name)) return
      base; scaled // warm both code paths
      val tb = time(base); val ts = time(scaled)
      println(f"[scale] $name%-22s 1x=$tb%6.2fs  ${factor}x=$ts%6.2fs  " +
        f"ratio=${ts / tb}%5.2f (linear would be <= $factor)")
    }

    report("range_filter", evK,
      TsOps.rangeFilter(events, Some(1704067200L * 1000000000L), None).count(),
      TsOps.rangeFilter(evScaled, Some(1704067200L * 1000000000L), None).count())
    report("downsample_1h", evK,
      TsOps.downsample(events, 3600L * 1000000000L, "value").count(),
      TsOps.downsample(evScaled, 3600L * 1000000000L, "value").count())
    report("sessionize", evK,
      TsOps.sessionize(events.select("user_id", "ts"), 3600L * 1000000000L,
        Seq("user_id")).count(),
      TsOps.sessionize(evScaled.select("user_id", "ts"), 3600L * 1000000000L,
        Seq("user_id")).count())
    report("rolling_24h", evK,
      TsOps.rollingAgg(events.select("user_id", "ts", "value"),
        24L * 3600 * 1000000000L, "value", Seq("user_id")).count(),
      TsOps.rollingAgg(evScaled.select("user_id", "ts", "value"),
        24L * 3600 * 1000000000L, "value", Seq("user_id")).count())
    report("grouped_head_50", evK,
      TsOps.groupedHead(events, 50).count(),
      TsOps.groupedHead(evScaled, 50).count())
    report("zscore_anomalies", evK,
      TsOps.zscoreAnomalies(events.select("event_id", "ts", "user_id",
        "value"), 7L * 86400 * 1000000000L, "value", Seq("user_id")).count(),
      TsOps.zscoreAnomalies(evScaled.select("event_id", "ts", "user_id",
        "value"), 7L * 86400 * 1000000000L, "value", Seq("user_id")).count())
    report("funnel_3stage", evK,
      TsOps.funnel(events.select("user_id", "ts", "event_type"),
        Seq("user_id"), Seq("view", "click", "purchase"),
        7L * 86400 * 1000000000L).count(),
      TsOps.funnel(evScaled.select("user_id", "ts", "event_type"),
        Seq("user_id"), Seq("view", "click", "purchase"),
        7L * 86400 * 1000000000L).count())
    report("retention", evK,
      TsOps.retention(events, "user_id", 86400L * 1000000000L).count(),
      TsOps.retention(evScaled, "user_id", 86400L * 1000000000L).count())
    report("seasonal_anomaly", evK,
      TsOps.seasonalAnomalies(events, "value").count(),
      TsOps.seasonalAnomalies(evScaled, "value").count())
    report("ewma_fold", evK,
      graft.operators.RecurrenceOps.ewma(events.select("user_id", "ts",
        "event_id", "value"), Seq("user_id")).count(),
      graft.operators.RecurrenceOps.ewma(evScaled.select("user_id", "ts",
        "event_id", "value"), Seq("user_id")).count())
    report("sax_words", evK,
      TsOps.saxWords(events, Seq("user_id"), 6L * 3600 * 1000000000L).count(),
      TsOps.saxWords(evScaled, Seq("user_id"), 6L * 3600 * 1000000000L).count())
    if (sel("pagerank")) {
      def edgesOf(ev: DataFrame) = {
        val p = ev.select((col("user_id") * 2).as("src"),
          (pmod(col("event_id"), lit(500L)) * 2 + 1).as("dst")).distinct()
        p.unionByName(p.select(col("dst").as("src"), col("src").as("dst")))
      }
      report("pagerank_3iter", evK,
        graft.operators.GraphOps.pageRank(edgesOf(events), iters = 3).count(),
        graft.operators.GraphOps.pageRank(edgesOf(evScaled), iters = 3).count())
      // the realistic iteration regime the round-7 verdict flagged: 10
      // supersteps with the default pin cadence (pin at 8) — probes that
      // cached nodes/deg + mid-loop pinning keep deep iteration sublinear
      report("pagerank_10iter", evK,
        graft.operators.GraphOps.pageRank(edgesOf(events), iters = 10).count(),
        graft.operators.GraphOps.pageRank(edgesOf(evScaled), iters = 10).count())
    }
    if (sel("triangles")) {
      // triangle counting over an events-derived co-occurrence graph: the
      // degree-ordered orientation must keep wedge fan-out bounded as the
      // node/edge count grows with the event volume
      def triCount(ev: DataFrame): Long = {
        val pairs = ev.select(col("user_id").as("src"),
          (pmod(col("event_id"), lit(500L)) + 1000000L).as("dst")).distinct()
        val n = graft.operators.GraphOps.triangles(pairs)
          .head().getAs[Long]("n_edges")
        spark.catalog.clearCache()
        n
      }
      report("triangles", evK, triCount(events), triCount(evScaled))
    }
    if (sel("kcore")) {
      // peeling rounds are data-bounded (converges or fails loudly); the
      // probe pins that per-round cost tracks the edge volume, not worse
      def coreCount(ev: DataFrame): Long = {
        val pairs = ev.select(col("user_id").as("src"),
          (pmod(col("event_id"), lit(500L)) + 1000000L).as("dst")).distinct()
        val n = graft.operators.GraphOps.kCore(pairs, k = 3).count()
        spark.catalog.clearCache()
        n
      }
      report("kcore_peel", evK, coreCount(events), coreCount(evScaled))
    }
    def lttb64(ev: DataFrame): Long =
      graft.operators.RecurrenceOps.lttb(
        ev.select(pmod(col("user_id"), lit(64L)).as("sid"), col("ts"),
          col("event_id"), col("value")),
        Seq("sid"), 6L * 3600 * 1000000000L).count()
    report("lttb_downsample", evK, lttb64(events), lttb64(evScaled))
    report("histogram_quantile", evK,
      TsOps.histogramQuantile(events, Seq("event_type"),
        Seq(500L, 1000L, 2500L, 5000L, 10000L, 25000L), 90L, 100L).count(),
      TsOps.histogramQuantile(evScaled, Seq("event_type"),
        Seq(500L, 1000L, 2500L, 5000L, 10000L, 25000L), 90L, 100L).count())
    if (sel("rollup_store")) {
      // build cost scales with raw rows; the QUERY cost scales with the
      // store (buckets), which grows with the time span, not sample rate —
      // both sides of the continuous-aggregate trade, measured
      val day = 86400L * 1000000000L
      def storeRoundtrip(ev: DataFrame, tag: String): Long = {
        val p = s"$work/rollup_$tag"
        graft.storage.RollupStore.write(ev, p, 3600L * 1000000000L)
        graft.storage.RollupStore.rollup(spark, p, day).count()
      }
      report("rollup_store", evK,
        storeRoundtrip(events, "1x"), storeRoundtrip(evScaled, s"${evK}x"))
    }
    if (sel("rollup_keyed")) {
      // the DIMENSIONAL store: 640 synthetic series keyed per row in ONE
      // tree (per-series trees would be a file-listing catastrophe at
      // scale). The keyed roundtrip should scale like the unkeyed
      // rollup_store row — the key column rides the same groupBy, so the
      // dimension costs shuffle width, not an extra pass
      val day = 86400L * 1000000000L
      def keyedRoundtrip(ev: DataFrame, tag: String): Long = {
        val p = s"$work/rollup_keyed_$tag"
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
        graft.storage.RollupStore.write(
          ev.withColumn("host", pmod(col("user_id"), lit(640L))),
          p, 3600L * 1000000000L, keyCols = Seq("host"))
        graft.storage.RollupStore.rollup(spark, p, day).count()
      }
      report("rollup_keyed", evK,
        keyedRoundtrip(events, "1x"), keyedRoundtrip(evScaled, s"${evK}x"))
    }
    if (sel("rollup_var")) {
      // the variance dimension's cost claim: (n, sum, sumsq) ride the
      // same groupBy as the base stats — the extra decimal column costs
      // shuffle width, not an extra pass, so the roundtrip should scale
      // like the plain rollup_store row
      val day = 86400L * 1000000000L
      def varRoundtrip(ev: DataFrame, tag: String): Long = {
        val p = s"$work/rollup_var_$tag"
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
        graft.storage.RollupStore.write(ev, p, 3600L * 1000000000L,
          withVariance = true)
        graft.storage.RollupStore.rollup(spark, p, day).count()
      }
      report("rollup_var", evK,
        varRoundtrip(events, "1x"), varRoundtrip(evScaled, s"${evK}x"))
    }
    if (sel("counter_store")) {
      // the counter recording rule's lifecycle claims, both sides:
      // counter_store  — BUILD (one keyed window over samples) + daily
      //                  read; build scales with samples, the read with
      //                  the KB store
      // counter_append — appending one fixed increase batch to a 1× vs
      //                  evK× accumulated store costs the INCREMENT, not
      //                  the base (the incremental-maintenance claim,
      //                  dup_index_append's twin on the counter tier)
      val hr = 3600L * 1000000000L
      def inc(ev: DataFrame) = TsOps.counterIncrease(
        ev.select("user_id", "ts", "event_id", "value"), Seq("user_id"), hr)
      report("counter_inc", evK,
        inc(events).count(), inc(evScaled).count())
      def counterBuild(ev: DataFrame, tag: String): Long = {
        val p = s"$work/ctr_$tag"
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
        graft.storage.CounterStore.write(inc(ev), p, hr)
        1L
      }
      report("counter_build", evK,
        counterBuild(events, "1x"), counterBuild(evScaled, s"${evK}x"))
      report("counter_read", evK,
        graft.storage.CounterStore.read(spark, s"$work/ctr_1x",
          factor = 24L).count(),
        graft.storage.CounterStore.read(spark, s"$work/ctr_${evK}x",
          factor = 24L).count())
      val incFixed = TsOps.counterIncrease(events.limit(50000)
        .select("user_id", "ts", "event_id", "value"), Seq("user_id"), hr)
        .cache()
      incFixed.count()
      var apN = 0
      def appendOnce(p: String): Long = {
        apN += 1 // fresh key per evaluation — report warms then re-times
        graft.storage.CounterStore.append(incFixed, p, s"inc#$apN", hr,
          validateGrain = false, validateKeys = false)
        incFixed.count()
      }
      report("counter_append", evK,
        appendOnce(s"$work/ctr_1x"), appendOnce(s"$work/ctr_${evK}x"))
      incFixed.unpersist()
    }
    if (sel("cascade_serve")) {
      // the retention-cascade SERVING claim, measured end to end: build a
      // three-tier layout (last 2 days raw, hourly for the prior 10 days,
      // daily below) from each table, then time ONLY the stitched
      // day-grain read. 10× the history grows the serve by the stores'
      // bucket count (the time span) plus a fixed-days raw remnant —
      // never the raw sample count, which is the point of tiering; the
      // build cost is rollup_store's row and is excluded here
      val day = 86400L * 1000000000L
      val hour = 3600L * 1000000000L
      def buildCascade(ev: DataFrame, tag: String): (String, String, String) = {
        val base = s"$work/cascade_$tag"
        // stale stores from a prior run (different SF dir or growth
        // factor) would survive the tier-key dedup and skew the ratio —
        // same always-regenerate discipline as the scaled tables
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
        val (rawP, stH, stD) = (s"$base/raw", s"$base/st1h", s"$base/st1d")
        ev.write.mode("overwrite").parquet(rawP)
        val hi = ev.agg(max("ts")).head().getLong(0)
        val cutH = (hi / day) * day - 2 * day  // day-aligned ⇒ hour-aligned
        val cutD = cutH - 10 * day
        graft.storage.RollupStore.tierOff(spark, rawP, stH,
          cutoff = cutH, bucketNanos = hour)
        graft.storage.RollupStore.tierOffStore(spark, stH, stD,
          cutoff = cutD, coarseBucketNanos = day)
        (rawP, stH, stD)
      }
      val (r1, h1, d1) = buildCascade(events, "1x")
      val (rK, hK, dK) = buildCascade(evScaled, s"${evK}x")
      report("cascade_serve", evK,
        graft.storage.RollupStore.cascadeRollup(spark, r1,
          Seq(h1, d1), day).count(),
        graft.storage.RollupStore.cascadeRollup(spark, rK,
          Seq(hK, dK), day).count())
    }
    if (sel("retention_cycle")) {
      // a maintenance cycle's cost is the DISPLACED window's rollup, not
      // the table's history: bring each layout to steady state with a
      // cycle at now−1d, then time ONLY the incremental cycle at now —
      // both displace exactly one day of identical per-day volume, so
      // the ratio should sit near 1 while the histories differ 10×.
      // report()'s warm-then-time would re-run an idempotent no-op
      // cycle, so this row times the single real cycle directly.
      val day = 86400L * 1000000000L
      val hour = 3600L * 1000000000L
      def prep(ev: DataFrame, tag: String): (String, Seq[graft.storage.RollupStore.TierSpec], Long) = {
        val base = s"$work/retain_$tag"
        // always regenerate — stale stores would skew the ratio
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
        val rawP = s"$base/raw"
        ev.write.mode("overwrite").parquet(rawP)
        val hi = ev.agg(max("ts")).head().getLong(0)
        val now = (hi / day) * day + day // end of the last full day
        val tiers = Seq(
          graft.storage.RollupStore.TierSpec(s"$base/st1h", hour,
            keepNanos = 10 * day),
          graft.storage.RollupStore.TierSpec(s"$base/st1d", day))
        graft.storage.RollupStore.applyRetention(spark, rawP,
          rawKeepNanos = 3 * day, tiers, nowNs = now - day) // steady state
        (rawP, tiers, now)
      }
      val (r1, t1s, n1) = prep(events, "1x")
      val (rK, tKs, nK) = prep(evScaled, s"${evK}x")
      val c1 = time { graft.storage.RollupStore.applyRetention(spark, r1,
        3 * day, t1s, nowNs = n1); 1L }
      val cK = time { graft.storage.RollupStore.applyRetention(spark, rK,
        3 * day, tKs, nowNs = nK); 1L }
      println(f"[scale] retention_cycle       1x=$c1%6.2fs  " +
        f"${evK}x=$cK%6.2fs  ratio=${cK / c1}%5.2f (displaced window " +
        "pinned at 1 day; only the history is 10x)")
    }
    if (sel("zorder_slice")) {
      // A/B at the SAME scaled size: the 2-dim slice on a z-ordered copy
      // vs a ts-sorted copy — the layout, not the operator, is under test
      // the 1× table: users are uniform across time there — the scaled
      // copies shift user AND ts ranges together, which would let a plain
      // ts-sort accidentally prune user bands too
      val zd = s"$work/zord_events"
      val td = s"$work/tsord_events"
      graft.storage.ZOrder.write(events, zd, Seq("user_id", "ts"),
        numFiles = 32)
      events.repartitionByRange(32, col("ts"))
        .sortWithinPartitions("ts").write.mode("overwrite").parquet(td)
      val bounds = events.agg(min("user_id"), max("user_id"),
        min("ts"), max("ts")).head()
      val (uLo, uHi) = (bounds.getLong(0),
        bounds.getLong(0) + (bounds.getLong(1) - bounds.getLong(0)) / 10)
      val (tLo, tHi) = (bounds.getLong(2),
        bounds.getLong(2) + (bounds.getLong(3) - bounds.getLong(2)) / 10)
      // the USER-band slice is the differentiating query: a time window
      // prunes equally well on either layout (both cluster ts), but only
      // the z-order can skip files for a user predicate
      def slice(path: String) = spark.read.parquet(path)
        .filter(col("user_id").between(uLo, uHi)).count()
      reportPair("zorder_slice", slice(td), slice(zd),
        la = "ts-sorted", lb = "z-ordered")
      // wall time at this scale is scan-bound either way; the metric that
      // predicts 100 TB behavior is the fraction of files whose footer
      // stats force a read of the 2-dim slice
      def hitFrac(dir: String): Double = {
        import scala.jdk.CollectionConverters._
        import org.apache.parquet.hadoop.ParquetFileReader
        import org.apache.parquet.hadoop.util.HadoopInputFile
        val conf = spark.sessionState.newHadoopConf()
        val files = new java.io.File(dir).listFiles()
          .filter(_.getName.endsWith(".parquet"))
        val hits = files.count { f =>
          val r = ParquetFileReader.open(HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f.getPath), conf))
          try {
            def mm(c: String): (Long, Long) = {
              val sts = r.getFooter.getBlocks.asScala.flatMap(
                _.getColumns.asScala.find(_.getPath.toDotString == c)
                  .map(_.getStatistics))
              (sts.map(_.genericGetMin.asInstanceOf[Number].longValue()).min,
                sts.map(_.genericGetMax.asInstanceOf[Number].longValue()).max)
            }
            val (umin, umax) = mm("user_id")
            umax >= uLo && umin <= uHi
          } finally r.close()
        }
        hits.toDouble / files.length
      }
      println(f"[scale] zorder_slice_files   ts-sorted-hit=${hitFrac(td)}%5.2f" +
        f"  z-ordered-hit=${hitFrac(zd)}%5.2f  (fraction of files a 10%%" +
        " user band must read)")
    }
    def intervalJoinCount(ev: DataFrame): Long = {
      val gapNs = 3600L * 1000000000L
      val sess = TsOps.sessionize(ev.select("user_id", "ts"), gapNs,
          Seq("user_id"))
        .groupBy("user_id", "session_idx")
        .agg(min("ts").as("s"), max("ts").as("e"))
      TsOps.intervalJoin(
        ev.filter(col("event_type") === "purchase")
          .select("user_id", "ts"),
        sess, Seq("user_id"), "s", "e", gapNs).count()
    }
    report("interval_join", evK,
      intervalJoinCount(events), intervalJoinCount(evScaled))
    report("active_users_wau", evK,
      TsOps.activeUsers(events, "user_id", 86400L * 1000000000L).count(),
      TsOps.activeUsers(evScaled, "user_id", 86400L * 1000000000L).count())
    report("transitions", evK,
      TsOps.transitions(events.select("user_id", "ts", "event_id",
        "event_type"), Seq("user_id"), "event_type",
        Seq("ts", "event_id")).count(),
      TsOps.transitions(evScaled.select("user_id", "ts", "event_id",
        "event_type"), Seq("user_id"), "event_type",
        Seq("ts", "event_id")).count())
    report("mad_anomalies", evK,
      TsOps.madAnomalies(events.select("event_id", "ts", "user_id",
        "value"), "value", Seq("user_id")).count(),
      TsOps.madAnomalies(evScaled.select("event_id", "ts", "user_id",
        "value"), "value", Seq("user_id")).count())
    report("hopping_24h_6h", evK,
      TsOps.hoppingDownsample(events, 24L * 3600 * 1000000000L,
        6L * 3600 * 1000000000L, "value").count(),
      TsOps.hoppingDownsample(evScaled, 24L * 3600 * 1000000000L,
        6L * 3600 * 1000000000L, "value").count())
    report("window_cooccur", docK,
      graft.pipeline.Text.windowCooccurrence(docs, "text").count(),
      graft.pipeline.Text.windowCooccurrence(docScaled, "text").count())
    // vocabulary-scale variant: topK=10k (here: effectively the whole
    // vocab) — the broadcast path this size requires
    report("window_cooccur_10k", docK,
      graft.pipeline.Text.windowCooccurrence(docs, "text",
        topK = 10000).count(),
      graft.pipeline.Text.windowCooccurrence(docScaled, "text",
        topK = 10000).count())
    report("dup_chunks", docK,
      graft.pipeline.Text.dupChunkStats(docs, "doc_id", "text").count(),
      graft.pipeline.Text.dupChunkStats(docScaled, "doc_id", "text").count())
    locally {
      import spark.implicits._
      val bmq = Seq((1L, "fast vector scan"), (2L, "stream window agg"),
        (3L, "customer join query")).toDF("query_id", "qtext")
      report("bm25_top10", docK,
        graft.pipeline.Retrieval.bm25(docs, bmq).count(),
        graft.pipeline.Retrieval.bm25(docScaled, bmq).count())
    }
    report("cooccur_top100", docK,
      graft.pipeline.Text.cooccurrence(docs, "doc_id", "text").count(),
      graft.pipeline.Text.cooccurrence(docScaled, "doc_id", "text").count())
    report("heavy_hitters_mg64", docK,
      graft.pipeline.Text.heavyHitters(docs, "text").count(),
      graft.pipeline.Text.heavyHitters(docScaled, "text").count())
    report("cms_sketch", docK,
      graft.pipeline.Text.countMinSketch(docs, "text").count(),
      graft.pipeline.Text.countMinSketch(docScaled, "text").count())
    report("novelty", docK,
      graft.pipeline.Text.noveltyCounts(docs, "doc_id", "text").count(),
      graft.pipeline.Text.noveltyCounts(docScaled, "doc_id", "text").count())
    report("bpe_pairs", docK,
      graft.pipeline.Text.bpePairCounts(docs, "text").count(),
      graft.pipeline.Text.bpePairCounts(docScaled, "text").count())
    report("dedup_exact", docK,
      Dedup.exact(docs, "doc_id", "text").count(),
      Dedup.exact(docScaled, "doc_id", "text").count())
    report("jaccard_pairs", docK,
      Dedup.jaccardPairs(docs, "doc_id", "text", 0.3).count(),
      Dedup.jaccardPairs(docScaled, "doc_id", "text", 0.3).count())
    // span coverage is one gram groupBy + one join + a per-doc window;
    // the caesar-scaled corpus keeps dup density per copy, so sublinear
    // here means the inverted-index shape holds, not shrinking work
    report("dup_spans", docK,
      graft.pipeline.Text.dupSpanCoverage(docs, "doc_id", "text").count(),
      graft.pipeline.Text.dupSpanCoverage(docScaled, "doc_id", "text")
        .count())
    if (sel("dup_index_append")) {
      // the incremental-maintenance claim: appending ONE dump to the
      // at-rest gram index costs the increment, not the accumulated
      // base — time the same small append against a 1× and a docK×
      // base index (validateK=false: a long-lived appender validates
      // once at stream start, the dupGramIngest discipline)
      val inc = docs.limit(200)
      def buildBase(base: DataFrame, tag: String): String = {
        val p = s"$work/dupidx_$tag"
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
        graft.pipeline.Text.appendDupGramIndex(base, p, "base",
          "doc_id", "text")
        p
      }
      val p1 = buildBase(docs, "1x")
      val pK = buildBase(docScaled, s"${docK}x")
      var apN = 0
      def appendOnce(p: String): Long = {
        apN += 1 // fresh key per evaluation — report warms then re-times
        graft.pipeline.Text.appendDupGramIndex(inc, p, s"inc#$apN",
          "doc_id", "text", validateK = false)
        inc.count()
      }
      report("dup_index_append", docK, appendOnce(p1), appendOnce(pK))
    }
    if (sel("dup_probe_batch")) {
      // the streaming-twin claim: scoring a FIXED micro-batch against the
      // at-rest serving index costs the BATCH, not the index — the join
      // path streamingDupSpans runs per micro-batch. A ratio near 1 as
      // the index grows docK× is the evidence the foreachBatch probe
      // replaces the (corpus-proportional, driver-impossible) gram-set
      // closure without a per-batch cost cliff
      def buildServing(base: DataFrame, tag: String): String = {
        val p = s"$work/dupserve_$tag"
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
        graft.pipeline.Text.writeDupGramIndex(base, p, "doc_id", "text")
        p
      }
      val s1 = buildServing(docs, "1x")
      val sK = buildServing(docScaled, s"${docK}x")
      val batch = docs.limit(500).cache()
      batch.count()
      def probeOnce(p: String): Long =
        graft.pipeline.Text.dupSpanCoverageStored(batch, "doc_id", "text",
          graft.pipeline.Text.openDupGramIndex(spark, p, 8), 8).count()
      report("dup_probe_batch", docK, probeOnce(s1), probeOnce(sK))
      batch.unpersist()
    }
    if (sel("clf_train")) {
      // classifier training is two count passes + a vocabulary-sized
      // join — the BUILD side, near-linear in the corpus by construction
      // (the caesar-shifted copies also grow the vocab docK×, so the
      // join side scales too)
      def train(c: DataFrame): Long =
        graft.pipeline.Text.classifierTrain(
          c.filter(col("lang") === "en"), c.filter(col("lang") =!= "en"),
          "text").w.count()
      report("clf_train", docK, train(docs), train(docScaled))
    }
    if (sel("clf_probe_batch")) {
      // the serving claim: scoring a FIXED batch costs the BATCH — the
      // weight join is vocabulary-sized however big the training corpus
      // was (and AQE still broadcasts the model when it fits), so a
      // model trained on docK× the data scores the same 500 docs at the
      // same cost
      def buildModel(c: DataFrame, tag: String): String = {
        val p = s"$work/clf_$tag"
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
        graft.pipeline.Text.writeClassifier(
          graft.pipeline.Text.classifierTrain(
            c.filter(col("lang") === "en"),
            c.filter(col("lang") =!= "en"), "text"), p)
        p
      }
      val m1 = buildModel(docs, "1x")
      val mK = buildModel(docScaled, s"${docK}x")
      val batch = docs.limit(500).cache()
      batch.count()
      def score(p: String): Long =
        graft.pipeline.Text.classifierScore(batch,
          graft.pipeline.Text.openClassifier(spark, p), "doc_id", "text")
          .count()
      report("clf_probe_batch", docK, score(m1), score(mK))
      batch.unpersist()
    }
    report("minhash_lsh", docK,
      Dedup.nearDuplicates(docs, "doc_id", "text", 0.3).count(),
      Dedup.nearDuplicates(docScaled, "doc_id", "text", 0.3).count())
    report("pipeline_curate", docK,
      Pipelines.curate(docs, "doc_id", "text").count(),
      Pipelines.curate(docScaled, "doc_id", "text").count())
    // filter on pos so ColumnPruning can't drop the window (count alone
    // would let Catalyst elide the very thing being measured)
    report("shuffle_shards", docK,
      graft.pipeline.Text.shuffleShards(docs.select("doc_id"), "doc_id",
        7L, 64).filter(col("pos") >= 0).count(),
      graft.pipeline.Text.shuffleShards(docScaled.select("doc_id"),
        "doc_id", 7L, 64).filter(col("pos") >= 0).count())
    report("remove_boilerplate", docK,
      graft.pipeline.Text.removeBoilerplate(docs, "doc_id", "text")
        .filter(col("n_dropped") >= 0).count(),
      graft.pipeline.Text.removeBoilerplate(docScaled, "doc_id", "text")
        .filter(col("n_dropped") >= 0).count())
    report("counter_increase", evK,
      TsOps.counterIncrease(events.select("user_id", "ts", "event_id",
        "value"), Seq("user_id"), 86400L * 1000000000L).count(),
      TsOps.counterIncrease(evScaled.select("user_id", "ts", "event_id",
        "value"), Seq("user_id"), 86400L * 1000000000L).count())
    report("fuzzy_pairs", docK,
      Dedup.fuzzyPairs(docs, "doc_id", "text").count(),
      Dedup.fuzzyPairs(docScaled, "doc_id", "text").count())
    // encode cost must be independent of corpus size per doc: the merge
    // chain is a fixed codegen'd expression, so the ratio tracks the scan
    locally {
      val merges = graft.pipeline.Text.bpeTrain(docs, "text", 16)
      report("bpe_encode_16", docK,
        graft.pipeline.Text.bpeEncode(docs, "doc_id", "text", merges)
          .count(),
        graft.pipeline.Text.bpeEncode(docScaled, "doc_id", "text", merges)
          .count())
    }
    // batch BPE's scale claim is about the MERGE axis, not the data axis:
    // same corpus, same 4 rounds, 8× the merges (k=8 → k=64, 32 → 256
    // learned) — rounds drive job count, so the ratio should sit near 1
    // (the only per-merge cost is the deeper codegen'd replace chain in
    // later rounds' count passes), where bpeTrain's one-job-per-merge
    // loop would be pinned at ~8×
    if (sel("bpe_batch_rounds")) {
      graft.pipeline.Text.bpeTrainBatch(docs, "text", rounds = 2,
        pairsPerRound = 8).size // warm the code path (report's discipline)
      val t8 = time(graft.pipeline.Text.bpeTrainBatch(docs, "text",
        rounds = 4, pairsPerRound = 8, candidatesPerRound = 256).size.toLong)
      val t64 = time(graft.pipeline.Text.bpeTrainBatch(docs, "text",
        rounds = 4, pairsPerRound = 64, candidatesPerRound = 512).size.toLong)
      println(f"[scale] bpe_batch_rounds       32m=$t8%6.2fs  256m=$t64%6.2fs  " +
        f"ratio=${t64 / t8}%5.2f (8x merges, same 4 rounds; per-merge " +
        "training would be ~8)")
    }
    // REAL-VOCABULARY train on the SCALED corpus: 8k merges (the round-10
    // cap lift — the reference tokenizer scale is 32k; 8k proves the
    // curve) vs 1k, same batch shape, so rounds scale 8×. Incremental
    // segmentation makes per-round cost constant — the ratio should sit
    // near the 8× round count (linear in merges), where the old
    // full-list replay grew quadratically and its 8k-deep replace chain
    // broke codegen outright. The synthetic corpus draws from a 31-word
    // list (its word vocabulary exhausts BPE at ~335 merges), so the
    // probe trains over word TRIGRAMS glued with an alphanumeric
    // separator — a 16k-type population with realistic word-piece
    // lengths, which is what an 8k-merge vocabulary needs to exist
    if (sel("bpe_train_8k")) {
      val triDocs = docScaled
        .withColumn("__ws", split(lower(col("text")), "[^a-z0-9]+"))
        .filter(size(col("__ws")) >= 3)
        .withColumn("text", expr(
          "array_join(transform(sequence(0, size(__ws) - 3), " +
            "i -> concat(__ws[i], '000', __ws[i + 1], '000', " +
            "__ws[i + 2])), ' ')"))
        .drop("__ws")
        .localCheckpoint()
      graft.pipeline.Text.bpeTrainBatch(triDocs, "text", rounds = 4,
        pairsPerRound = 32).size // warm the code path
      var n1k = 0L
      var n8k = 0L
      val m1k = time { n1k = graft.pipeline.Text.bpeTrainBatch(triDocs,
        "text", rounds = 48, pairsPerRound = 32,
        candidatesPerRound = 512).size.toLong; n1k }
      val m8k = time { n8k = graft.pipeline.Text.bpeTrainBatch(triDocs,
        "text", rounds = 384, pairsPerRound = 32,
        candidatesPerRound = 512).size.toLong; n8k }
      println(f"[scale] bpe_train_8k           1k=$m1k%6.2fs ($n1k merges)" +
        f"  8k=$m8k%6.2fs ($n8k merges)  ratio=${m8k / m1k}%5.2f " +
        "(8x rounds at 4x docs; linear-in-rounds would be ~8, the old " +
        "replay quadratic ~64)")
    }
    // the PRODUCTION vocabulary: 32k merges (500 rounds × 64 pairs —
    // the reference-tokenizer scale the round-11 ask named), trained
    // over glued word 4-GRAMS (the trigram population's 16k types
    // exhaust under 32k; 4-grams give the merge axis room), vs the same
    // shape at 4k merges — near-linear in rounds is the claim. The 32k
    // list then ENCODES the scaled corpus through bpeEncode's broadcast
    // rank-priority path (a 32k-deep replace-chain Column does not
    // analyze; the rank path is proven byte-equivalent to the chain in
    // PipelineSpec), priced against the same path at 4k and against the
    // round-12 interpreted vocabulary-join — the end-to-end proof that
    // a trained production vocabulary exists AND tokenizes at scale
    if (sel("bpe_train_32k")) {
      val quadDocs = docScaled
        .withColumn("__ws", split(lower(col("text")), "[^a-z0-9]+"))
        .filter(size(col("__ws")) >= 4)
        .withColumn("text", expr(
          "array_join(transform(sequence(0, size(__ws) - 4), " +
            "i -> concat(__ws[i], '000', __ws[i + 1], '000', " +
            "__ws[i + 2], '000', __ws[i + 3])), ' ')"))
        .drop("__ws")
        .localCheckpoint()
      graft.pipeline.Text.bpeTrainBatch(quadDocs, "text", rounds = 4,
        pairsPerRound = 64).size // warm the code path
      // merge-BUDGET training (the production contract): stop at 4k and
      // 32k LEARNED merges — per-round yield under the rank-window rule
      // is corpus-dependent (~22/round here), so round counts are what
      // the early-stop discovers, and rounds-linear cost means the time
      // ratio tracks the ROUND ratio, not the 8x merge ratio
      var n4k = 0L
      var n32k = 0L
      var m4: Seq[(String, String)] = Nil
      var m32: Seq[(String, String)] = Nil
      val t4k = time { m4 = graft.pipeline.Text.bpeTrainBatch(quadDocs,
        "text", rounds = 4096, pairsPerRound = 64,
        candidatesPerRound = 1024, maxMerges = 4096)
        n4k = m4.size.toLong; n4k }
      val t32k = time { m32 = graft.pipeline.Text.bpeTrainBatch(quadDocs,
        "text", rounds = 4096, pairsPerRound = 64,
        candidatesPerRound = 1024, maxMerges = 32768)
        n32k = m32.size.toLong; n32k }
      // ENCODE under both vocabulary depths through the automatic
      // (broadcast rank-priority) path — the round-13 scale claim is
      // that encode cost is flat in vocabulary depth, so 32k/4k should
      // sit near 1 where the old interpreted vocabulary-join path paid
      // one full symbol scan per merge (~8x here, priced alongside)
      graft.pipeline.Text.bpeEncode(quadDocs, "doc_id", "text", m4)
        .count() // warm the encode machinery
      val tEnc4k = time(graft.pipeline.Text.bpeEncode(quadDocs, "doc_id",
        "text", m4).count())
      val tEnc = time(graft.pipeline.Text.bpeEncode(quadDocs, "doc_id",
        "text", m32).count())
      val tEncJoin = time(graft.pipeline.Text.bpeEncodeVia(quadDocs,
        "doc_id", "text", m32, "join").count())
      println(f"[scale] bpe_train_32k          4k=$t4k%6.2fs ($n4k merges)" +
        f"  32k=$t32k%6.2fs ($n32k merges)  ratio=${t32k / t4k}%5.2f " +
        f"(8x merges; rounds-linear ~= the round ratio)")
      println(f"[scale] bpe_encode_32k         rank4k=$tEnc4k%6.2fs  " +
        f"rank32k=$tEnc%6.2fs  ratio=${tEnc / tEnc4k}%5.2f " +
        f"(depth-flat ~= 1; join path at 32k for comparison: " +
        f"$tEncJoin%6.2fs)")
      // the id-level product end to end at the production vocabulary:
      // tokenize (ids, not counts) and the materialized context
      // windows — both should sit near the count-only encode, since
      // the id mapping is one memoized hash lookup per piece and the
      // pack reassembly ships span slices, not per-token rows
      // LAZY checkpoint: the first action (the timed count) pays the
      // tokenize pass, and the pack row then prices ONLY the pack
      // machinery over the cached ids (an eager checkpoint would
      // materialize outside the timer and report a cache read)
      val toks32 = graft.pipeline.Text.bpeTokenize(quadDocs, "doc_id",
        "text", m32).localCheckpoint(eager = false)
      val tTok = time(toks32.count())
      val tPack = time(graft.pipeline.Text.packTokenIds(toks32,
        "doc_id", contextLen = 2048, numBuckets = 32).count())
      println(f"[scale] bpe_tokenize_32k       tokenize=$tTok%6.2fs  " +
        f"pack2048=$tPack%6.2fs (vs rank32k count-only $tEnc%6.2fs)")
    }
    report("collocations", docK,
      graft.pipeline.Text.collocations(docs, "text").count(),
      graft.pipeline.Text.collocations(docScaled, "text").count())
    // model side fixed (1x reference corpus); the SCORED corpus scales —
    // the realistic shape: one trained LM, ever-growing data to score
    locally {
      val ref = graft.pipeline.Text.lmRef(docs, "text")
      report("lm_score", docK,
        graft.pipeline.Text.lmScore(docs, ref, "doc_id", "text").count(),
        graft.pipeline.Text.lmScore(docScaled, ref, "doc_id", "text")
          .count())
    }
    // raw corpus scales, target slice scales with it (the DSIR shape:
    // reweight a big crawl toward a curated slice)
    report("importance_sample", docK,
      graft.pipeline.Text.importanceSample(docs,
        docs.filter(col("lang") === "en"), "doc_id", "text").count(),
      graft.pipeline.Text.importanceSample(docScaled,
        docScaled.filter(col("lang") === "en"), "doc_id", "text").count())
    report("profile_5col", docK,
      graft.pipeline.Text.profile(docs,
        Seq("doc_id", "text", "lang", "source", "n_chars"))
        .collect().length.toLong,
      graft.pipeline.Text.profile(docScaled,
        Seq("doc_id", "text", "lang", "source", "n_chars"))
        .collect().length.toLong)

    // ---- hot-key sessionize: plain (per-key window) vs chunked ---------
    // one user owns ~30% of the scaled events table — the plain window
    // serializes those rows into a single task; the chunked variant keys
    // the heavy window on (user, day) and must stay flat
    def reportPair(name: String, a: => Long, b: => Long,
        la: String = "plain", lb: String = "chunked"): Unit = {
      if (!sel(name)) return
      a; b // warm both code paths
      val ta = time(a); val tb = time(b)
      println(f"[scale] $name%-22s $la=$ta%6.2fs  $lb=$tb%6.2fs  " +
        f"speedup=${ta / tb}%5.2f")
    }
    if (sel("aqp_vs_exact")) {
      // the AQP SERVING claim as an A/B on the SAME evK× data: a burst
      // of 20 grouped aggregates answered exactly from raw vs estimated
      // from ONE pinned open of the 1/16 sample (the
      // open-once/estimate-many dashboard shape — metadata validation
      // prices in once, every estimate reads the in-memory sample).
      // Single-shot wall times flip with page-cache state at this toy
      // scale (bytes are KB either way; at 100 TB the 1/rate byte ratio
      // IS the claim); the burst amortizes the noise and measures the
      // serving pattern a dashboard actually issues
      val p = s"$work/aqp_${evK}x"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
      graft.storage.SampleStore.build(evScaled, p, idCol = "event_id")
      val h = graft.storage.SampleStore.open(spark, p, pin = true)
      def exact(): Long = (1 to 20).map { _ =>
        evScaled
          .withColumn("__c", graft.operators.TsOps.centsExpr("value"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("__c").as("sc")).count()
      }.sum
      def est(): Long = (1 to 20).map { _ =>
        h.estimate(Seq("event_type"), "value").count()
      }.sum
      reportPair("aqp_vs_exact", exact(), est(), "exact20", "sample20")
      h.close()
    }
    if (sel("route_aqp_fine")) {
      // the ROUTED fine zoom's serving claim at evK×: ten day drill-ins
      // at a finer-than-stored grain answered by a PREPARED
      // SampledRouter (the open-once dashboard shape — cold
      // routeSampled measured 2.4s/call here, all repeated metadata
      // jobs, which is exactly why prepareSampled exists) vs the same
      // buckets re-aggregated exactly from raw, i.e. the route() raw
      // fallback this composition replaces. Toy-scale wall times are
      // plan-overhead-bound both ways (the 1/rate byte ratio is the
      // 100 TB claim); the burst measures the dashboard pattern.
      val day = 86400L * 1000000000L
      val minNs = 60L * 1000000000L
      val stP = s"$work/aqp_rt_store_${evK}x"
      val smP = s"$work/aqp_rt_sample_${evK}x"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stP))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(smP))
      graft.storage.RollupStore.write(evScaled, stP,
        3600L * 1000000000L)
      graft.storage.SampleStore.build(evScaled, smP, idCol = "event_id",
        bits = 5)
      val t0 = evScaled.agg(min("ts")).head().getLong(0)
      val lo0 = t0 - Math.floorMod(t0, day) + day
      val router = graft.storage.RollupStore.prepareSampled(spark, stP,
        smP)
      def routed(): Long = (0 until 10).map { i =>
        router.route(lo0 + i * day, lo0 + (i + 1) * day,
          maxPoints = 1440).count()
      }.sum
      def exactFine(): Long = (0 until 10).map { i =>
        TsOps.rangeFilter(evScaled, Some(lo0 + i * day),
            Some(lo0 + (i + 1) * day))
          .withColumn("__c", TsOps.centsExpr("value"))
          .groupBy(expr(TsOps.floorBucketSql("ts", minNs)).as("b"))
          .agg(count(lit(1)).as("n"), sum("__c").as("sc")).count()
      }.sum
      reportPair("route_aqp_fine", exactFine(), routed(),
        "exact10", "routed10")
      router.close()
    }
    if (sel("route_aqp_stratified")) {
      // the STRATIFIED routed fine zoom at evK× (the round-12
      // composition): ten keyed day drill-ins through a prepared router
      // whose sample tier carries per-stratum rates — the HT weighting
      // and the key pushdown both live — vs the same keyed buckets
      // re-aggregated exactly from raw. Same burst shape as
      // route_aqp_fine; the added claim is that stratified rates cost
      // the serve nothing (rate_den rides the rows; the estimator is
      // the same integer aggregate)
      val day = 86400L * 1000000000L
      val minNs = 60L * 1000000000L
      val stP = s"$work/aqp_rts_store_${evK}x"
      val smP = s"$work/aqp_rts_sample_${evK}x"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stP))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(smP))
      graft.storage.RollupStore.write(evScaled, stP,
        3600L * 1000000000L, keyCols = Seq("event_type"))
      graft.storage.SampleStore.buildStratified(
        evScaled.withColumn("band",
          expr("cast(floor(value / 100) as long)")),
        smP, idCol = "event_id", stratumCol = "band", minRows = 50L,
        maxBits = 8)
      val t0 = evScaled.agg(min("ts")).head().getLong(0)
      val lo0 = t0 - Math.floorMod(t0, day) + day
      val router = graft.storage.RollupStore.prepareSampled(spark, stP,
        smP)
      val key = Some(col("event_type") === "click")
      def routed(): Long = (0 until 10).map { i =>
        router.route(lo0 + i * day, lo0 + (i + 1) * day,
          maxPoints = 1440, keyFilter = key).count()
      }.sum
      def exactFine(): Long = (0 until 10).map { i =>
        TsOps.rangeFilter(evScaled.filter(col("event_type") === "click"),
            Some(lo0 + i * day), Some(lo0 + (i + 1) * day))
          .withColumn("__c", TsOps.centsExpr("value"))
          .groupBy(col("event_type"),
            expr(TsOps.floorBucketSql("ts", minNs)).as("b"))
          .agg(count(lit(1)).as("n"), sum("__c").as("sc")).count()
      }.sum
      reportPair("route_aqp_stratified", exactFine(), routed(),
        "exact10", "routed10")
      router.close()
    }
    if (sel("tiering_trim")) {
      // A/B on the SAME 10x data: retention trim on a day-partitioned raw
      // tree (whole-directory drop, O(days dropped)) vs a flat tree (full
      // rewrite of the retained window). Copies are built OUTSIDE the
      // timer (one file per day on the partitioned side - the 128MB-file
      // regime a real table lives in); the timed region is tierOff alone,
      // and the rollup append inside it is identical on both sides.
      val day = 86400L * 1000000000L
      val cut0 = evScaled.agg(min("ts")).head().getLong(0)
      // EARLY cutoff: 2 days tier off, ~400 stay — isolates the trim
      // (the rollup append is 2 days of work on both sides; the flat side
      // then rewrites the whole retained window, the partitioned side
      // drops 2 directories)
      val cut = (cut0 - Math.floorMod(cut0, day)) + 2 * day
      def run(partitioned: Boolean): Double = {
        val p = s"$work/tier_${if (partitioned) "part" else "flat"}"
        if (partitioned)
          evScaled.withColumn("__day", date_from_unix_date(
              expr(s"(ts - pmod(ts, ${day}L)) div ${day}L").cast("int"))
              .cast("string"))
            .repartition(col("__day"))
            .write.mode("overwrite").partitionBy("__day").parquet(p)
        else evScaled.write.mode("overwrite").parquet(p)
        val st = s"$work/tier_store_${if (partitioned) "p" else "f"}"
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(st))
        val t0 = System.nanoTime()
        graft.storage.RollupStore.tierOff(spark, p, st, cut,
          3600L * 1000000000L)
        (System.nanoTime() - t0) / 1e9
      }
      run(false); run(true) // warm both code paths
      val tf = run(false); val tp = run(true)
      println(f"[scale] tiering_trim           flat-rewrite=$tf%6.2fs  " +
        f"day-dir-drop=$tp%6.2fs  speedup=${tf / tp}%5.2f")
    }
    val gap = 3600L * 1000000000L
    val hot = evScaled.withColumn("user_id",
        when(pmod(col("event_id"), lit(10L)) < 3, lit(0L))
          .otherwise(col("user_id")))
      .select("user_id", "ts")
    reportPair(s"sessionize_hot30_${evK}x",
      TsOps.sessionize(hot, gap, Seq("user_id")).count(),
      TsOps.sessionizeChunked(hot, gap, Seq("user_id")).count())
    val uniform = evScaled.select("user_id", "ts")
    reportPair(s"sessionize_uniform_${evK}x",
      TsOps.sessionize(uniform, gap, Seq("user_id")).count(),
      TsOps.sessionizeChunked(uniform, gap, Seq("user_id")).count())
    // fully degenerate: ONE key owns the whole scaled table — the plain window
    // is a single-task sort of everything; chunked splits it by day
    val oneKey = evScaled.select(lit(0L).as("user_id"), col("ts"))
    reportPair(s"sessionize_1key_${evK}x",
      TsOps.sessionize(oneKey, gap, Seq("user_id")).count(),
      TsOps.sessionizeChunked(oneKey, gap, Seq("user_id")).count())

    // ---- hot-key fact-dim join: plain (AQE skew split) vs salted --------
    // the same 30%-hot fixture joined to a per-user dim too big to
    // broadcast (threshold forced off): AQE's skew-join split is the
    // engine default; saltedJoin is the explicit fallback. Measured
    // head-to-head so SCALE.md can state when each wins.
    import graft.operators.Skew
    val dim = evScaled.select("user_id").distinct()
      .withColumn("seg", pmod(col("user_id"), lit(100L)))
      .localCheckpoint()
    // capture the session's values so the experiment restores what was
    // actually configured, not hardcoded defaults
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevSkewJoin = spark.conf.get("spark.sql.adaptive.skewJoin.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    reportPair(s"join_hot30_${evK}x",
      hot.join(dim, Seq("user_id")).count(),
      Skew.saltedJoin(hot, dim, Seq("user_id")).count(),
      la = "plain", lb = "salted")
    // AQE skew split OFF: what the salted join buys on engines/configs
    // without runtime skew handling (and a check that our default config
    // is actually doing the splitting above)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    reportPair(s"join_hot30_noaqe_${evK}x",
      hot.join(dim, Seq("user_id")).count(),
      Skew.saltedJoin(hot, dim, Seq("user_id")).count(),
      la = "plain", lb = "salted")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", prevSkewJoin)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)

    // ---- jaccard pair generation: self-join vs adjacency lists ----------
    // identical output (shared oracle); measures whether skipping the
    // join machinery beats the ReuseExchange self-join at this scale
    reportPair(s"jaccard_pairs_1x",
      Dedup.jaccardPairs(docs, "doc_id", "text", 0.3).count(),
      Dedup.jaccardPairsGrouped(docs, "doc_id", "text", 0.3).count(),
      la = "selfjoin", lb = "grouped")
    reportPair(s"jaccard_pairs_${docK}x",
      Dedup.jaccardPairs(docScaled, "doc_id", "text", 0.3).count(),
      Dedup.jaccardPairsGrouped(docScaled, "doc_id", "text", 0.3).count(),
      la = "selfjoin", lb = "grouped")

    // ---- mixture sampling: bucketed prefix sum vs naive domain window ---
    // worst case for the naive shape: ONE domain owns the whole corpus, so
    // Window.partitionBy(domain) serializes every row through a single
    // task; the bucketed prefix sum spreads the same cumsum over 256
    // buckets. Budget keeps ~half the corpus so both paths do comparable
    // output work. (At this local scale the narrow tokenize stage
    // dominates both plans — the honest expectation is parity-to-modest
    // speedup here, with the single-task sort/memory wall being the real
    // 100 TB failure mode the bucketed shape removes.)
    {
      import graft.pipeline.Text
      import org.apache.spark.sql.expressions.Window
      val oneDomain = docScaled.select(col("doc_id"),
        lit("all").as("lang"), col("text"))
      val halfTokens = oneDomain
        .select(sum(Text.tokenCount(col("text")).cast("long"))).collect()(0)
        .getLong(0) / 2
      val budgets = Map("all" -> halfTokens)
      def naive(): Long = {
        val budget = lit(halfTokens)
        val w = Window.partitionBy("lang")
          .orderBy(col("__key"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, 0)
        oneDomain.select(col("doc_id"), col("lang"),
            Text.tokenCount(col("text")).cast("long").as("n_tokens"),
            md5(col("doc_id").cast("string")).as("__key"))
          .withColumn("cum_tokens", sum("n_tokens").over(w))
          .filter(col("cum_tokens") <= budget).count()
      }
      reportPair(s"mix_sample_1dom_${docK}x",
        naive(),
        Text.mixSample(oneDomain, "doc_id", "text", "lang", budgets).count(),
        la = "window", lb = "bucketed")
    }

    // ---- sequence packing: bucket count vs wall time --------------------
    // each bucket's offset cumsum is ONE window task, so the bucket count
    // is the parallelism knob: too few buckets = long single-task windows
    // (the 100 TB failure mode), enough buckets = flat. The auto default
    // derives buckets from plan-stats input size (packBucketsFor).
    if (sel("pack_buckets")) {
      import graft.pipeline.Text
      val auto = Text.packBucketsFor(docScaled)
      def pack(b: Int): Long =
        Text.packSequences(docScaled, "doc_id", "text", 256, b).count()
      pack(1) // warm
      for (b <- Seq(1, 8, auto, 256).distinct) {
        val t = time(pack(b))
        println(f"[scale] pack_buckets_${docK}x   buckets=$b%-6d " +
          f"t=$t%6.2fs${if (b == auto) "  (= auto-derived)" else ""}")
      }
    }

    // ---- trainPrep: lineage (exchange reuse) vs materialize -------------
    // the curate diamond + the clean/docs double-references either ride
    // exchange reuse in one job (materialize=false) or get pinned via
    // localCheckpoint (true); measured so SCALE.md can state the default's
    // rationale rather than guess
    {
      import graft.pipeline.Pipelines
      val evalDf = docScaled.filter(pmod(col("doc_id"), lit(97L)) === 0)
      val train = docScaled.filter(pmod(col("doc_id"), lit(97L)) =!= 0)
      val budgets = Map("en" -> 8000L, "de" -> 2400L, "es" -> 2400L,
        "fr" -> 2000L)
      reportPair(s"train_prep_${docK}x",
        Pipelines.trainPrep(train, "doc_id", "text", evalDf, budgets,
          contextLen = 128, numBuckets = 32).count(),
        Pipelines.trainPrep(train, "doc_id", "text", evalDf, budgets,
          contextLen = 128, numBuckets = 32, materialize = true).count(),
        la = "lineage", lb = "matrlzd")
    }

    // ---- cross-corpus exact dedup: plain semi-join vs bloom prescreen ---
    // identical output (the bloom only prunes the join input); measures
    // what the broadcast filter buys when most incoming docs are novel
    {
      val ref = docScaled.filter(pmod(col("doc_id"), lit(3L)) === 0)
      def plain(): Long = {
        val fps = ref.select(
          graft.pipeline.Text.fingerprint(col("text")).as("fp"))
        docScaled.select(col("doc_id"),
            graft.pipeline.Text.fingerprint(col("text")).as("fp"))
          .join(fps, Seq("fp"), "left_semi").count()
      }
      reportPair(s"bloom_dedup_${docK}x",
        plain(),
        Dedup.bloomDedup(docScaled, ref, "doc_id", "text").count(),
        la = "semijoin", lb = "bloomed")
    }

    // ---- float vs int8 brute scoring over the stored corpus -------------
    // same ranking work (200 queries × full corpus), float vectors vs the
    // 4×-smaller quantized bytes through the integer codegen cosine
    import graft.pipeline.Similarity
    val embT = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val qset = embT.filter(col("vec_id") < 200)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val qCorpusPath = s"$work/emb_q.parquet"
    embT.select(col("vec_id"), Similarity.quantizeInt8(col("embedding")).as("qs"))
      .select(col("vec_id"), col("qs.q").as("q"))
      .write.mode("overwrite").parquet(qCorpusPath)
    val qCorpus = spark.read.parquet(qCorpusPath)
    reportPair("knn_brute_200q",
      Similarity.knnBrute(embT, qset, 5).count(),
      Similarity.knnBruteQuantized(qCorpus, qset, 5).count(),
      la = "float", lb = "int8")

    // ---- top-k tail: rank window vs mergeable partial aggregate ---------
    // identical scoring work (200 queries × 32x corpus ≈ 12.8M candidates).
    // Both shapes bound the shuffle to O(k·partitions) per query — the
    // window via Spark 4's WindowGroupLimit Partial, the aggregator via
    // ObjectHashAggregate partial k-heaps — so this measures pure
    // formulation overhead. Measured: window 4.18s vs mergeagg 8.71s (the
    // typed-encoder hop + JVM-object heap updates lose to the codegen'd
    // partial sort) → the window is the default (Similarity.rankTopK);
    // re-measure here if Spark or the scoring expression changes
    if (sel("knn_topk_tail")) {
      val embScaled = (0 until 32).map(i => embT
        .withColumn("vec_id", col("vec_id") + lit(i * 10000000L)))
        .reduce(_.unionByName(_))
      val q200 = embT.filter(col("vec_id") < 200)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      reportPair("knn_topk_tail",
        Similarity.knnBrute(embScaled, q200, 10).count(),
        Similarity.rankTopKAgg(
          embScaled.crossJoin(broadcast(q200)), 10, "vec_id", "qid",
          excludeSelf = true,
          Similarity.cosine(col("qvec"), col("embedding"))).count(),
        la = "window", lb = "mergeagg")
    }

    // ---- user-day ledger: state size vs stream LENGTH -------------------
    // the SAME users kept active 10x longer (ts-shifted copies, ids kept):
    // the live cohort ledger's per-key state should grow ~1 bit per
    // calendar day, not 8 bytes per distinct active day like the seen-day
    // list it replaced. Measured from the state store's own accounting
    // after an AvailableNow drain.
    if (sel("user_days_state")) {
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      val day = 86400L * 1000000000L
      def stateAfterDrain(k: Int): (Long, Long) = {
        val base = s"$work/udays_${k}x"
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
        (0 until k).map(i => events.withColumn("ts", col("ts") + lit(i * span)))
          .reduce(_.unionByName(_))
          .select("user_id", "ts").write.mode("overwrite").parquet(s"$base/in")
        val src = spark.readStream
          .schema(StructType(Seq(StructField("user_id", LongType),
            StructField("ts", LongType))))
          .parquet(s"$base/in")
        val led = graft.streaming.StreamIngest.streamingUserDays(
          src, "user_id", "ts", day)
        val q = led.writeStream.format("noop")
          .option("checkpointLocation", s"$base/ck")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination(600000); q.stop()
        val st = q.recentProgress.flatMap(_.stateOperators).lastOption
        (st.map(_.numRowsTotal).getOrElse(-1L),
          st.map(_.memoryUsedBytes).getOrElse(-1L))
      }
      val (u1, b1) = stateAfterDrain(1)
      val (u10, b10) = stateAfterDrain(10)
      println(f"[scale] user_days_state       1x=${b1 / 1024}%5dKiB/$u1 keys  " +
        f"10x=${b10 / 1024}%5dKiB/$u10 keys  ratio=${b10.toDouble / b1}%5.2f " +
        "(distinct-day list would be ~10)")
    }
    spark.stop()
  }
}
