package graft.storage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** At-rest lifecycle for the counter RECORDING RULE — the store behind
  * [[graft.operators.TsOps.counterIncrease]] rows, with the
  * [[RollupStore]] discipline applied to the monitoring-counter shape
  * (the reference computes every aggregate from raw samples,
  * `zikeiretsu/src/tsdb/query/executor/mod.rs`; a recording rule AT REST
  * is the standard at-scale extension SURVEY.md §2.4 sanctions).
  *
  * Layout: ONE parquet tree of per-bucket increase rows
  * `(keys..., bucket, bucket_ns, n_deltas, inc_cents, n_resets,
  * batch_key)`, partitioned by `__day` derived from
  * `bucket * bucket_ns` (the [[WritableStore]] date-bucket convention, so
  * range trims drop whole day directories). All three measures are plain
  * longs and deltas land in the OBSERVING sample's bucket
  * ([[graft.operators.TsOps.counterIncrease]]'s contract), so partials
  * merge by ADDITION at any coarser grain — a fold over stored rows
  * equals the direct pass bit for bit, which is what makes the whole
  * lifecycle (append / replay dedup / compact / coarsening tier) exact
  * rather than approximate.
  *
  * Ingest follows the rollup-store discipline: [[write]] stamps
  * `batch_key = "base"`; each producer batch [[append]]s its increase
  * rows under a replay-stable key ([[graft.streaming.StreamIngest
  * .counterIngest]] derives it from (checkpoint, micro-batch id)), so an
  * at-least-once redelivery lands DUPLICATE (keys, bucket, bucket_ns,
  * batch_key) rows every reader and [[compact]] drop before summing.
  * NOTE the producer boundary: the store accumulates increase ROWS, not
  * samples — the cross-batch lag (last sample per series) lives with the
  * producer (the one keyed window of a batch [[graft.operators.TsOps
  * .counterIncrease]] pass, or the streaming twin's one-long state), so
  * splitting a day's increase rows across appends is free, but computing
  * increase independently per slice of SAMPLES would silently drop every
  * cross-slice delta.
  *
  * 100 TB shape: the store is ~(samples / samples-per-bucket) rows — KB
  * to GB where raw is TB; reads are partition-pruned scans + one
  * combinable aggregation; [[tierOff]] keeps a fine recent window and an
  * old coarse tail exactly like the rollup cascade.
  */
object CounterStore {

  private val DayNs = 86400L * 1000000000L

  private val ReservedCols: Set[String] = Set("bucket", "bucket_ns",
    "n_deltas", "inc_cents", "n_resets", "batch_key",
    WritableStore.PartitionCol)

  /** Keys are self-describing, exactly as in [[RollupStore]]: any
    * non-reserved column is a group key riding every fold. */
  private def keyColsOf(df: DataFrame): Seq[String] =
    df.columns.toSeq.filterNot(ReservedCols.contains)

  private def requireShape(df: DataFrame, context: String): Seq[String] = {
    val missing = Seq("bucket", "n_deltas", "inc_cents", "n_resets")
      .filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"$context: increase rows lack ${missing.mkString(", ")} — the " +
        "store accumulates counterIncrease output, not raw samples")
    keyColsOf(df)
  }

  /** `__day` partition value — the bucket's start instant floor-divided
    * to days, the shared [[WritableStore]] integer derivation. */
  private def dayCol(bucketNanos: Long) = date_from_unix_date(
    expr(s"((bucket * ${bucketNanos}L) - pmod(bucket * ${bucketNanos}L, " +
      s"${DayNs}L)) div ${DayNs}L").cast("int")).cast("string")

  /** One batch's rows, folded to one row per (keys, bucket) and stamped
    * with the store's self-description. The fold makes the append shape
    * canonical whether the producer handed per-bucket rows (batch
    * counterIncrease) or finer partials.
    *
    * ALIGNED WRITES: the frame repartitions on `__day` before the
    * partitioned write, so each day directory receives ONE file instead
    * of one per (task × day). Without it, a store spanning D days written
    * from P tasks opens up to D×P writers and lands D×P near-empty
    * parquet files — measured 25× (not 10×) build cost at 10× the span,
    * with every later read paying the listing. The extra shuffle moves
    * only the KB-per-day folded rows. */
  private def canonical(df: DataFrame, batchKey: String,
      bucketNanos: Long): DataFrame = {
    val keys = requireShape(df, "CounterStore")
    df.groupBy((keys :+ "bucket").map(col): _*)
      .agg(sum("n_deltas").as("n_deltas"),
        sum("inc_cents").as("inc_cents"),
        sum("n_resets").as("n_resets"))
      .withColumn("bucket_ns", lit(bucketNanos))
      .withColumn("batch_key", lit(batchKey))
      .withColumn(WritableStore.PartitionCol, dayCol(bucketNanos))
      .repartition(col(WritableStore.PartitionCol))
  }

  /** Build a counter store from increase rows: one atomic publish of the
    * whole tree (two-rename; a crash leaves a complete store). */
  def write(increase: DataFrame, path: String, bucketNanos: Long): Unit = {
    require(bucketNanos > 0, s"bucketNanos must be positive: $bucketNanos")
    AtomicDir.publish(increase.sparkSession, path, "counter store") { tmp =>
      canonical(increase, "base", bucketNanos)
        .write.partitionBy(WritableStore.PartitionCol).parquet(tmp)
    }
  }

  /** Append one producer batch's increase rows under a replay-stable
    * key. Grain and key-set validation mirror [[RollupStore.append]] —
    * SEPARATE gates, so a streaming appender that probed the grain once
    * at stream start cannot silently skip key validation too. */
  def append(increase: DataFrame, path: String, batchKey: String,
      bucketNanos: Long, validateGrain: Boolean = true,
      validateKeys: Boolean = true): Unit = {
    require(bucketNanos > 0, s"bucketNanos must be positive: $bucketNanos")
    val spark = increase.sparkSession
    if (validateGrain) requireGrain(spark, path, bucketNanos, "append")
    if (validateKeys) requireKeys(spark, path,
      requireShape(increase, "append"), "append")
    canonical(increase, batchKey, bucketNanos)
      .write.mode("append").partitionBy(WritableStore.PartitionCol)
      .parquet(path)
  }

  private[graft] def requireGrain(spark: SparkSession, path: String,
      bucketNanos: Long, context: String): Unit =
    storeWidthOpt(spark, path).foreach(bn => require(bn == bucketNanos,
      s"$context: counter store at $path holds $bn-ns buckets; appending " +
        s"$bucketNanos-ns rows would mix grains in one store"))

  private[graft] def requireKeys(spark: SparkSession, path: String,
      keyCols: Seq[String], context: String): Unit =
    readable(spark, path).foreach { df =>
      val have = keyColsOf(df)
      require(have.sorted == keyCols.sorted,
        s"$context: counter store at $path is keyed by " +
          s"[${have.mkString(", ")}]; this writer's keys are " +
          s"[${keyCols.mkString(", ")}] — one store holds exactly one " +
          "key set")
    }

  private def storeWidthOpt(spark: SparkSession, path: String)
      : Option[Long] =
    readable(spark, path).flatMap { df =>
      df.select("bucket_ns").distinct().collect()
        .map(_.getLong(0)).sorted.toSeq match {
        case Seq(bn) => Some(bn)
        case Seq() => None
        case ws => throw new IllegalStateException(
          s"counter store at $path holds MIXED bucket widths " +
            s"${ws.mkString(", ")} — one store holds exactly one grain")
      }
    }

  private def readable(spark: SparkSession, path: String)
      : Option[DataFrame] = {
    val live = new org.apache.hadoop.fs.Path(path)
    val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(live)) None
    else {
      AtomicDir.recover(fs, live, "counter store")
      graft.pipeline.Similarity.recoverCompact(fs, live)
      try Some(spark.read.parquet(path))
      catch { case _: org.apache.spark.sql.AnalysisException => None }
    }
  }

  /** The tier horizon, mined from the deterministic `tier-<cutoffNs>`
    * batch keys and from the `compact-<uuid>-h<cutoff>` keys [[compact]]
    * stamps — None if never tiered into. */
  private def tierHorizon(stored: DataFrame): Option[Long] = {
    val fromTier = when(col("batch_key").startsWith("tier-"),
      expr("CAST(substring(batch_key, 6) AS LONG)"))
    val fromCompact = expr(
      "CAST(nullif(regexp_extract(batch_key, " +
        "'^compact-[0-9a-f]+-h(-?[0-9]+)$', 1), '') AS LONG)")
    val r = stored.agg(max(coalesce(fromTier, fromCompact))).head()
    if (r.isNullAt(0)) None else Some(r.getLong(0))
  }

  /** Replay-deduped partial rows scoped to `[since, until)` bucket-start
    * nanos, with `__day` directory pruning — the shared front half of
    * every read. */
  private def scoped(spark: SparkSession, path: String,
      since: Option[Long], until: Option[Long]): DataFrame = {
    val df = readable(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"counter store at $path is absent or empty"))
    val bn = storeWidthOpt(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"counter store at $path is empty"))
    def dayStr(nanos: Long): String = java.time.LocalDate.ofEpochDay(
      Math.floorDiv(nanos, DayNs)).toString
    val startNs = col("bucket") * lit(bn)
    val conds =
      since.map(v => startNs >= lit(v)).toSeq ++
        until.map(v => startNs < lit(v)).toSeq ++
        since.map(v =>
          col(WritableStore.PartitionCol) >= lit(dayStr(v))) ++
        until.map(v =>
          col(WritableStore.PartitionCol) <= lit(dayStr(v - 1)))
    conds.reduceOption(_ && _).fold(df)(df.filter)
      .dropDuplicates(keyColsOf(df) ++
        Seq("bucket", "bucket_ns", "batch_key"))
  }

  /** Answer at `factor`× the stored grain from the store alone: replay
    * duplicates dropped, partials summed per (keys, coarse bucket) via
    * [[graft.operators.TsOps.counterIncreaseCoarsen]] — the additive
    * merge proven equal to the direct coarse pass. `factor = 1` reads
    * the stored grain itself. */
  def read(spark: SparkSession, path: String, factor: Long = 1L,
      since: Option[Long] = None, until: Option[Long] = None,
      keyFilter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(factor >= 1, s"bucket ratio must be positive: $factor")
    val part0 = scoped(spark, path, since, until)
    // key pushdown, RollupStore.route's contract: validated against the
    // key schema (a value-column predicate would filter partial rows
    // before the fold), applied before the fold so the predicate reaches
    // the store scan
    keyFilter.foreach(RollupStore.requireKeyPredicate(_, part0,
      "CounterStore.read", keyColsOf(part0)))
    val part = keyFilter.fold(part0)(part0.filter)
    graft.operators.TsOps.counterIncreaseCoarsen(
      part.drop("bucket_ns", "batch_key", WritableStore.PartitionCol),
      factor, keyColsOf(part))
  }

  /** Fold accumulated per-batch partials to one row per (keys, bucket) —
    * the IO compaction that caps file-listing cost, doubling as the
    * durable replay repair. The tier horizon survives in the folded
    * batch key. Quiesce appends first (the [[RollupStore.compact]]
    * rule). */
  def compact(spark: SparkSession, path: String): Unit = {
    val live = new org.apache.hadoop.fs.Path(path)
    val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
    graft.pipeline.Similarity.recoverCompact(fs, live)
    AtomicDir.compactPublish(spark, path, "compact counter store") { tmp =>
      val live0 = spark.read.parquet(path)
      val bn = storeWidthOpt(spark, path).getOrElse(
        throw new IllegalArgumentException(
          s"counter store at $path is empty"))
      val key = tierHorizon(live0).fold(
        s"compact-${java.util.UUID.randomUUID().toString.take(8)}")(h =>
        s"compact-${java.util.UUID.randomUUID().toString.take(8)}-h$h")
      val keys = keyColsOf(live0)
      live0
        .dropDuplicates(keys ++ Seq("bucket", "bucket_ns", "batch_key"))
        .groupBy((keys :+ "bucket").map(col): _*)
        .agg(sum("n_deltas").as("n_deltas"),
          sum("inc_cents").as("inc_cents"),
          sum("n_resets").as("n_resets"))
        .withColumn("bucket_ns", lit(bn))
        .withColumn("batch_key", lit(key))
        .withColumn(WritableStore.PartitionCol, dayCol(bn))
        .repartition(col(WritableStore.PartitionCol)) // one file per day
        .write.partitionBy(WritableStore.PartitionCol).parquet(tmp)
    }
  }

  /** Age the fine store down: buckets starting below `cutoff` (bucket-
    * start nanos, aligned to the coarse grain) fold `factor`× coarser
    * into the coarse store under the deterministic `tier-<cutoff>` key,
    * then leave the fine store (whole-day directory drops when the
    * cutoff is day-aligned, atomic rewrite otherwise). IDEMPOTENT like
    * [[RollupStore.tierOff]]: a retry re-appends under the SAME key and
    * the replay dedup collapses it; run with appends to the affected
    * range quiesced. */
  def tierOff(spark: SparkSession, finePath: String, coarsePath: String,
      cutoff: Long, factor: Long): Unit = {
    require(factor >= 1, s"bucket ratio must be positive: $factor")
    val fineBnOpt = storeWidthOpt(spark, finePath)
    if (fineBnOpt.isEmpty) return // fully-trimmed fine store: no-op retry
    val fineBn = fineBnOpt.get
    val coarseBn = fineBn * factor
    require(Math.floorMod(cutoff, coarseBn) == 0,
      s"tierOff: cutoff $cutoff is not aligned to the $coarseBn coarse " +
        "bucket — a straddling bucket would be half fine, half coarse")
    storeWidthOpt(spark, coarsePath).foreach(bn => require(bn == coarseBn,
      s"tierOff: coarse store at $coarsePath holds $bn-ns buckets, not " +
        s"$coarseBn"))
    val old = read(spark, finePath, factor, until = Some(cutoff))
    if (old.isEmpty) return
    requireKeys(spark, coarsePath, keyColsOf(old), "tierOff")
    append(old, coarsePath, s"tier-$cutoff", coarseBn,
      validateGrain = false) // validated above against the fine grain
    trimBelow(spark, finePath, cutoff, fineBn)
  }

  /** Drop fine rows below `cutoff`: whole `__day` directory deletes when
    * the cutoff is day-aligned (O(days dropped), never a rewrite of the
    * retained window), atomic two-rename rewrite otherwise. */
  private def trimBelow(spark: SparkSession, path: String, cutoff: Long,
      bucketNanos: Long): Unit = {
    val live = new org.apache.hadoop.fs.Path(path)
    val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
    val dayDirs = Option(fs.globStatus(new org.apache.hadoop.fs.Path(
      path, s"${WritableStore.PartitionCol}=*"))).getOrElse(Array.empty)
    if (dayDirs.nonEmpty && Math.floorMod(cutoff, DayNs) == 0) {
      val cutDay = java.time.LocalDate.ofEpochDay(
        Math.floorDiv(cutoff, DayNs)).toString
      dayDirs.filter(_.getPath.getName.stripPrefix(
          s"${WritableStore.PartitionCol}=") < cutDay)
        .foreach(d => fs.delete(d.getPath, true))
      spark.catalog.refreshByPath(path)
    } else AtomicDir.publish(spark, path, "trimmed counter store") { tmp =>
      spark.read.parquet(path)
        .filter(col("bucket") * lit(bucketNanos) >= cutoff)
        .write.partitionBy(WritableStore.PartitionCol).parquet(tmp)
    }
  }

  /** Budget routing over the counter tier — [[RollupStore.route]]'s
    * maxDataPoints contract on the recording rule: answer `[since,
    * until)` under a point budget at the finest grain every touched tier
    * can serve, never a silently partial answer. The grain fits the
    * widened span (shared [[RollupStore.fitCascadeGrain]] arithmetic:
    * the fine store's width is the floor; a range dipping below the
    * coarse tier's horizon clamps to the coarse width), buckets are
    * floor-div indexes AT the chosen grain, and `grain_ns`/`source` ride
    * the columns so a dashboard sees which tier answered. Counter
    * partials merge by addition at any nesting grain, so every routed
    * answer equals the direct pass over never-stored samples. */
  def route(spark: SparkSession, finePath: String,
      coarsePath: Option[String], since: Long, until: Long,
      maxPoints: Int,
      keyFilter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(until > since, s"route: empty range [$since, $until)")
    require(maxPoints >= 1, "route needs a positive point budget")
    val fineBn = storeWidthOpt(spark, finePath).getOrElse(
      throw new IllegalArgumentException(
        s"counter store at $finePath is absent or empty"))
    val coarse = coarsePath.flatMap(p =>
      readable(spark, p).map(df => (p, df,
        storeWidthOpt(spark, p), tierHorizon(df))))
    // present tiers (width, horizon) — a coarse store never tiered into
    // (or fully trimmed) does not route
    val present: Seq[(Long, Long)] = coarse.toSeq.flatMap {
      case (_, _, Some(w), Some(h)) => Seq((w, h))
      case _ => Nil
    }
    val (g, touched) = RollupStore.fitCascadeGrain(present, since, until,
      maxPoints, floorW = fineBn)
    require(g % fineBn == 0, s"route: grain $g does not nest $fineBn")
    val (lo, hi) = RollupStore.widenTo(since, until, g)
    if (touched.isEmpty)
      read(spark, finePath, g / fineBn, Some(lo), Some(hi), keyFilter)
        .withColumn("grain_ns", lit(g)).withColumn("source", lit("store"))
    else {
      // stitch: the coarse tier serves its pre-horizon window, the fine
      // store the rest — disjoint whole g-buckets (g is a multiple of
      // the coarse width, which is a multiple of the fine width and of
      // the horizon's alignment), merged by one more additive fold
      val (cPath, _, cwOpt, hOpt) = coarse.get
      val (cw, h) = (cwOpt.get, hOpt.get)
      require(g % cw == 0, s"route: grain $g does not nest $cw")
      val old = read(spark, cPath, g / cw, Some(lo),
        Some(math.min(h, hi)), keyFilter)
      val recent = read(spark, finePath, g / fineBn,
        Some(math.max(h, lo)), Some(hi), keyFilter)
      graft.operators.TsOps.counterIncreaseCoarsen(
          old.unionByName(recent), 1L, keyColsOf(old))
        .withColumn("grain_ns", lit(g))
        .withColumn("source", lit("stitched"))
    }
  }

  /** Stitched read across the fine + coarse pair at the COARSE grain:
    * the coarse store serves its pre-horizon buckets, the fine store its
    * at-or-after-horizon ones folded `factor`× — disjoint whole coarse
    * buckets (the [[tierOff]] alignment contract), merged by the same
    * additive fold, so the result equals a never-tiered direct pass bit
    * for bit even during a crashed tierOff's append-to-trim window (the
    * horizon, not "whatever fine holds", bounds the fine side). */
  def readTiered(spark: SparkSession, finePath: String,
      coarsePath: String, factor: Long): DataFrame = {
    require(factor >= 1, s"bucket ratio must be positive: $factor")
    val coarse = readable(spark, coarsePath)
    val horizon = coarse.flatMap(tierHorizon)
    val fine = read(spark, finePath, factor, since = horizon)
    horizon match {
      case None => fine // never tiered: the fine store holds everything
      case Some(h) =>
        val old = read(spark, coarsePath, 1L, until = Some(h))
        val keys = keyColsOf(old)
        require(keys.sorted == keyColsOf(fine).sorted,
          s"readTiered: tiers carry DIFFERENT key sets — " +
            s"$finePath=[${keyColsOf(fine).mkString(", ")}], " +
            s"$coarsePath=[${keys.mkString(", ")}]")
        // tier windows are disjoint whole coarse buckets: union, then
        // one more additive fold per bucket for schema-stable output
        graft.operators.TsOps.counterIncreaseCoarsen(
          old.unionByName(fine), 1L, keys)
    }
  }
}
