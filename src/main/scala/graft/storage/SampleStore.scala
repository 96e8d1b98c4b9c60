package graft.storage

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** At-rest DETERMINISTIC sample tier — approximate query processing the
  * BlinkDB way, minus the nondeterminism: membership is a pure function
  * of the row's id (`md5(id)` hex prefix all-zero at `prefixLen` chars →
  * kept, rate 1/16^prefixLen), so the sample is reproducible by any
  * engine from the same raw table, every estimate is EXACTLY
  * `sample-aggregate × rate_den` (integer cents, no float scale-up
  * drift), and re-sampling a replayed batch yields byte-identical rows.
  * The reference answers every aggregate from raw samples
  * (`zikeiretsu/src/tsdb/query/executor/mod.rs`); a sampled serving tier
  * is the standard at-scale extension SURVEY.md §2.4 sanctions — at
  * 100 TB an exploratory GROUP BY reads the GB-sized sample, not the
  * table, and the error is the textbook √(1/n_sample) of a uniform
  * hash sample.
  *
  * Layout: ONE parquet tree of sampled RAW rows + self-description
  * (`rate_den`, `sample_col` — the [[CounterStore]] `bucket_ns`
  * discipline: readers fail loudly on a mixed-rate or mixed-id store
  * instead of silently mis-scaling) + `batch_key`, partitioned by
  * `__day` from the row's ts (aligned write: repartition on `__day`
  * first, one file per day directory). Ingest follows the store
  * discipline everywhere else: [[build]] publishes atomically under
  * `batch_key = "base"`; [[append]] lands one producer batch under a
  * replay-stable key — an at-least-once redelivery re-samples the SAME
  * rows (membership is deterministic), and readers drop duplicate
  * `(id, batch_key)` rows before aggregating. [[compact]] folds the
  * accumulated per-batch files, capping listing cost.
  */
object SampleStore {

  private val DayNs = 86400L * 1000000000L

  // Reserved self-description / lifecycle columns riding every row:
  // rate_den, sample_col, stratum_col (the stratification column's name;
  // empty string for uniform stores), batch_key, __day.

  /** The membership predicate: first `prefixLen` hex chars of
    * `md5(cast(id as string))` all '0' — rate 1/16^prefixLen. Engine-
    * portable (DuckDB: `substr(md5(CAST(id AS VARCHAR)), 1, p) = '0…0'`),
    * deterministic, and uncorrelated with any data column. */
  def memberExpr(idCol: String, prefixLen: Int): Column = {
    require(prefixLen >= 1 && prefixLen <= 8,
      s"prefixLen $prefixLen out of range: rates below 16^-8 keep nothing")
    substring(md5(col(idCol).cast("string")), 1, prefixLen) ===
      lit("0" * prefixLen)
  }

  /** [[memberExpr]] with a PER-ROW prefix length column (the stratified
    * path; `p = 0` keeps everything — `substr(x, 1, 0) = ''` in both
    * engines). */
  private def memberExprVar(idCol: String, pCol: String): Column =
    expr(s"substr(md5(cast($idCol as string)), 1, $pCol) = " +
      s"substr('00000000', 1, $pCol)")

  /** The scale-up factor 16^prefixLen. */
  def rateDen(prefixLen: Int): Long = {
    require(prefixLen >= 0 && prefixLen <= 8)
    (1 to prefixLen).foldLeft(1L)((a, _) => a * 16L)
  }

  /** 16^p as a Column over a per-row prefix-length column. */
  private def rateDenCol(pCol: String): Column =
    (0 to 8).foldLeft(lit(null).cast("long")) { (acc, p) =>
      when(col(pCol) === p, lit(rateDen(p))).otherwise(acc)
    }

  private def stamp(df: DataFrame, idCol: String, tsCol: String,
      batchKey: String, stratumCol: String): DataFrame =
    df
      .withColumn("sample_col", lit(idCol))
      .withColumn("stratum_col", lit(stratumCol))
      .withColumn("batch_key", lit(batchKey))
      .withColumn(WritableStore.PartitionCol, date_from_unix_date(
        expr(s"(($tsCol) - pmod($tsCol, ${DayNs}L)) div ${DayNs}L")
          .cast("int")).cast("string"))
      .repartition(col(WritableStore.PartitionCol))

  private def canonical(df: DataFrame, idCol: String, tsCol: String,
      prefixLen: Int, batchKey: String): DataFrame = {
    require(df.columns.contains(idCol) && df.columns.contains(tsCol),
      s"sample source lacks $idCol/$tsCol")
    stamp(df.filter(memberExpr(idCol, prefixLen))
        .withColumn("rate_den", lit(rateDen(prefixLen))),
      idCol, tsCol, batchKey, stratumCol = "")
  }

  /** Build a sample store in one atomic publish (two-rename; a crash
    * leaves a complete store). */
  def build(df: DataFrame, path: String, idCol: String,
      tsCol: String = "ts", prefixLen: Int = 1): Unit =
    AtomicDir.publish(df.sparkSession, path, "sample store") { tmp =>
      canonical(df, idCol, tsCol, prefixLen, "base")
        .write.partitionBy(WritableStore.PartitionCol).parquet(tmp)
    }

  /** Append one producer batch's rows under a replay-stable key. Rate
    * and id-column validation mirror [[CounterStore.append]]'s SEPARATE
    * grain/key gates; a long-lived streaming appender probes once at
    * stream start ([[graft.streaming.StreamIngest.sampleIngest]]).
    * Producer contract (every at-rest tier here shares it): batches
    * PARTITION the source — the same row redelivered under the same key
    * collapses in the read-side dedup, but the same row sent under TWO
    * keys is a producer bug this store cannot repair (raw rows have no
    * additive fold to absorb it). */
  def append(df: DataFrame, path: String, batchKey: String, idCol: String,
      tsCol: String = "ts", prefixLen: Int = 1,
      validateRate: Boolean = true): Unit = {
    if (validateRate) requireRate(df.sparkSession, path, prefixLen, idCol,
      "append")
    canonical(df, idCol, tsCol, prefixLen, batchKey)
      .write.mode("append").partitionBy(WritableStore.PartitionCol)
      .parquet(path)
  }

  /** Per-stratum prefix length: the largest `p ≤ maxPrefixLen` with
    * `count(stratum) ≥ minRows × 16^p` — every stratum keeps an expected
    * `minRows`-plus sample however small it is (p = 0 keeps ALL rows of
    * a rare stratum), while huge strata thin 16^p×. Pure integer CASE
    * over the stratum counts, so a second engine derives the identical
    * rate map from the same raw table. */
  private def prefixLenCol(nCol: String, minRows: Long,
      maxPrefixLen: Int): Column =
    // ascending fold: the LAST-folded (largest) p becomes the OUTERMOST
    // when(), so the biggest qualifying prefix wins
    (1 to maxPrefixLen).foldLeft(lit(0)) { (acc, p) =>
      when(col(nCol) >= lit(minRows) * lit(rateDen(p)), lit(p))
        .otherwise(acc)
    }

  /** Build a STRATIFIED sample store — the BlinkDB observation: a
    * uniform rate starves rare strata exactly where per-group answers
    * need evidence most. Rates derive from the stratum counts at build
    * time ([[prefixLenCol]]) and ride every row as `rate_den`, so the
    * Horvitz-Thompson estimate in [[SampleHandle.estimate]] stays exact
    * integer. The stratum→rate map FREEZES at build (the BlinkDB offline
    * sample-planning posture): [[appendStratified]] reuses the stored
    * map, never re-derives it from a batch's own counts. */
  def buildStratified(df: DataFrame, path: String, idCol: String,
      stratumCol: String, minRows: Long, maxPrefixLen: Int = 2,
      tsCol: String = "ts"): Unit = {
    require(df.columns.contains(stratumCol),
      s"sample source lacks stratum column $stratumCol")
    require(minRows >= 1 && maxPrefixLen >= 1 && maxPrefixLen <= 8)
    val rates = df.groupBy(stratumCol)
      .agg(count(lit(1)).as("__n"))
      .select(col(stratumCol),
        prefixLenCol("__n", minRows, maxPrefixLen).as("__p"))
    // a null stratum would silently vanish (null keys never equi-join,
    // identically in both engines) — make the caller derive a non-null
    // stratum column instead of losing rows
    require(rates.filter(col(stratumCol).isNull).isEmpty,
      s"buildStratified: $stratumCol holds nulls — derive a non-null " +
        "stratum column (e.g. coalesce a sentinel) before stratifying")
    AtomicDir.publish(df.sparkSession, path, "sample store") { tmp =>
      stamp(df.join(rates, stratumCol)
          .filter(memberExprVar(idCol, "__p"))
          .withColumn("rate_den", rateDenCol("__p"))
          .drop("__p"),
        idCol, tsCol, "base", stratumCol)
        .write.partitionBy(WritableStore.PartitionCol).parquet(tmp)
    }
  }

  /** Append one producer batch to a STRATIFIED store under the FROZEN
    * stratum→rate map mined from the stored rows (one metadata-sized
    * distinct) — re-deriving rates from the batch's own counts would
    * mis-scale every mixed read. Strata the map has never seen keep ALL
    * their rows (p = 0, the `minRows` intent for brand-new rare strata);
    * re-plan the store offline when a new stratum grows large. */
  def appendStratified(df: DataFrame, path: String, batchKey: String,
      idCol: String, tsCol: String = "ts"): Unit = {
    val spark = df.sparkSession
    val stored = readable(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"appendStratified: no stratified store at $path (build first)"))
    val meta = stored.select("sample_col", "stratum_col").distinct()
      .collect()
    require(meta.length == 1 && meta(0).getString(1).nonEmpty,
      s"appendStratified: store at $path is not a stratified store")
    require(meta(0).getString(0) == idCol,
      s"appendStratified: store at $path sampled on " +
        s"${meta(0).getString(0)}; this writer samples on $idCol")
    val stratumCol = meta(0).getString(1)
    val rateMap = stored.select(col(stratumCol), col("rate_den"))
      .distinct()
    require(rateMap.groupBy(stratumCol).count()
        .filter(col("count") > 1).isEmpty,
      s"sample store at $path holds mixed per-stratum rates")
    // invert rate_den → prefix length by explicit CASE (never float log)
    val pFromRate = (0 to 8).foldLeft(lit(null).cast("int")) { (acc, p) =>
      when(col("rate_den") === rateDen(p), lit(p)).otherwise(acc)
    }
    stamp(df.join(rateMap, Seq(stratumCol), "left")
        .withColumn("rate_den", coalesce(col("rate_den"), lit(1L)))
        .withColumn("__p", pFromRate)
        .filter(memberExprVar(idCol, "__p"))
        .drop("__p"),
      idCol, tsCol, batchKey, stratumCol)
      .write.mode("append").partitionBy(WritableStore.PartitionCol)
      .parquet(path)
  }

  /** Fail loudly when an existing store's rate, sampled-id column, or
    * stratification differs — appending a different membership function
    * would silently mis-scale every later estimate. */
  private[graft] def requireRate(spark: SparkSession, path: String,
      prefixLen: Int, idCol: String, context: String): Unit =
    readable(spark, path).foreach { df =>
      df.select("rate_den", "sample_col", "stratum_col").distinct()
        .collect().foreach { r =>
          require(r.getString(2).isEmpty,
            s"$context: sample store at $path is STRATIFIED on " +
              s"${r.getString(2)}; use appendStratified")
          require(r.getLong(0) == rateDen(prefixLen),
            s"$context: sample store at $path holds 1/${r.getLong(0)} " +
              s"rows; appending 1/${rateDen(prefixLen)} rows would mix " +
              "rates in one store")
          require(r.getString(1) == idCol,
            s"$context: sample store at $path sampled on " +
              s"${r.getString(1)}; this writer samples on $idCol — one " +
              "store holds exactly one membership function")
        }
    }

  private def readable(spark: SparkSession, path: String)
      : Option[DataFrame] = {
    val live = new org.apache.hadoop.fs.Path(path)
    val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(live)) None
    else {
      AtomicDir.recover(fs, live, "sample store")
      graft.pipeline.Similarity.recoverCompact(fs, live)
      try Some(spark.read.parquet(path))
      catch { case _: org.apache.spark.sql.AnalysisException => None }
    }
  }

  /** An opened sample store: validated sampled rows. The serving shape
    * is OPEN ONCE, ESTIMATE MANY — a dashboard issues thousands of
    * estimates against one open, so the metadata validation prices in
    * once, and `pin = true` persists the sampled rows (the BlinkDB
    * posture: the sample is sized to fit where raw cannot — 100 TB raw
    * at 1/256 is cluster-cache-sized, and every estimate then reads
    * memory, not the lake). */
  final case class SampleHandle(rows: DataFrame, idCol: String,
      preDeduped: Boolean = false) {

    /** Grouped estimates from the sample alone, in Horvitz-Thompson
      * form: per group, `n_sample` (the evidence),
      * `est_count = Σ rate_den`, `est_sum_cents = Σ cents × rate_den` —
      * each row stands in for exactly its inverse inclusion probability,
      * so ONE estimator serves uniform stores (where it telescopes to
      * `n × rate_den`) and stratified ones (where rates vary by
      * stratum) — plus `est_var_cents2 = Σ cents² × rd × (rd−1)`, the
      * unbiased HT variance estimator of the sum under Bernoulli
      * inclusion (σ of the estimate ≈ √var: the error bar a dashboard
      * prints beside the number; EXACTLY ZERO for keep-all strata,
      * which hold no sampling randomness). All exact integer arithmetic
      * a second engine reproduces bit for bit; at extreme widths
      * (cents² × rd² nearing 2^63) swap the emission to decimal — the
      * estimator, not the width, is the contract here. The
      * `[since, until)` scope applies BEFORE the replay dedup —
      * duplicates are byte-identical rows, so the order is free, and
      * the scope then lands as `__day` directory pruning on the store
      * scan instead of dying above the dedup (dropDuplicates compiles
      * to first()-aggregates whose outputs block pushdown; PlanAuditSpec
      * pins the PartitionFilters). */
    /** Scoped, replay-deduped rows — the shared front half. A
      * `preDeduped` (pinned) handle already collapsed replays at open,
      * so each estimate is ONE aggregation with no dedup shuffle: at
      * dashboard burst rates the per-query stage count is the cost. */
    private def scoped(tsCol: String, since: Option[Long],
        until: Option[Long]): DataFrame = {
      def dayStr(nanos: Long): String = java.time.LocalDate.ofEpochDay(
        Math.floorDiv(nanos, DayNs)).toString
      val conds =
        since.map(v => col(tsCol) >= lit(v)).toSeq ++
          until.map(v => col(tsCol) < lit(v)).toSeq ++
          since.map(v =>
            col(WritableStore.PartitionCol) >= lit(dayStr(v))) ++
          until.map(v =>
            col(WritableStore.PartitionCol) <= lit(dayStr(v - 1)))
      val sc = conds.reduceOption(_ && _).fold(rows)(rows.filter)
      if (preDeduped) sc else sc.dropDuplicates(idCol, "batch_key")
    }

    def estimate(groupCols: Seq[String], valueCol: String,
        tsCol: String = "ts", since: Option[Long] = None,
        until: Option[Long] = None): DataFrame = {
      require(groupCols.nonEmpty,
        "estimate needs at least one group column")
      scoped(tsCol, since, until)
        .withColumn("__c", graft.operators.TsOps.centsExpr(valueCol))
        .groupBy(groupCols.map(col): _*)
        .agg(count(lit(1)).as("n_sample"),
          sum("rate_den").as("est_count"),
          sum(col("__c") * col("rate_den")).as("est_sum_cents"),
          sum(col("__c") * col("__c") * col("rate_den") *
            (col("rate_den") - 1)).as("est_var_cents2"))
    }

    /** Grouped QUANTILE estimates from the sample: the exact percentile
      * of the multiset in which each sampled row repeats `rate_den`
      * times — the Horvitz-Thompson-weighted empirical CDF, so one
      * estimator serves uniform stores (where the constant weight
      * cancels and it is the plain sample quantile) and stratified ones
      * (where a group spanning strata weights each row by its inverse
      * inclusion probability). Spark's `percentile(c, p, frequency)`
      * computes exactly that replicated-multiset percentile; integer
      * cents + dyadic `probs` keep the interpolation bit-exact, so a
      * second engine reproduces every estimate by literally replicating
      * the sample rows (the [[estimate]] exactness discipline on the
      * quantile axis). Same scope-before-dedup contract as
      * [[estimate]]. */
    def estimateQuantile(groupCols: Seq[String], valueCol: String,
        probs: Seq[Double] = Seq(0.25, 0.5, 0.75), tsCol: String = "ts",
        since: Option[Long] = None, until: Option[Long] = None)
        : DataFrame = {
      require(groupCols.nonEmpty,
        "estimateQuantile needs at least one group column")
      require(probs.nonEmpty && probs.forall(p => p > 0 && p < 1))
      val qCols = probs.map { p =>
        expr(s"percentile(__c, ${p}D, rate_den)")
          .as(s"q${(p * 100).round}")
      }
      scoped(tsCol, since, until)
        .withColumn("__c", graft.operators.TsOps.centsExpr(valueCol))
        .filter(col("__c").isNotNull)
        .groupBy(groupCols.map(col): _*)
        .agg(count(lit(1)).as("n_sample"),
          qCols: _*)
    }

    /** Release a pinned sample (no-op if never pinned). */
    def close(): Unit = { rows.unpersist(); () }
  }

  /** Open a sample store: ONE metadata pass validates the membership
    * self-description — exactly one (sampled-id, stratum) pair, and for
    * uniform stores exactly one rate (a mis-rated concurrent writer
    * fails the read, never mis-scales it; stratified stores carry
    * per-stratum rates by design, validated per-stratum at build).
    * `pin = true` persists the sampled rows for estimate-many serving.
    * The replay dedup runs per estimate AFTER the time scope (see
    * [[SampleHandle.estimate]]) — over sample-sized rows it is the cheap
    * half of the aggregation. */
  def open(spark: SparkSession, path: String,
      pin: Boolean = false): SampleHandle = {
    val df = readable(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"sample store at $path is absent or empty"))
    val meta = df.select("sample_col", "stratum_col").distinct().collect()
    require(meta.nonEmpty, s"sample store at $path is empty")
    if (meta.length > 1) throw new IllegalStateException(
      s"sample store at $path holds MIXED membership functions " +
        s"${meta.map(r => s"(${r.getString(0)}/${r.getString(1)})")
          .mkString(", ")} — one store holds exactly one")
    if (meta(0).getString(1).isEmpty) {
      val rates = df.select("rate_den").distinct().collect()
      if (rates.length > 1) throw new IllegalStateException(
        s"sample store at $path holds MIXED rates " +
          s"${rates.map(r => s"1/${r.getLong(0)}").mkString(", ")} — a " +
          "uniform store holds exactly one")
    }
    // the pinned serving copy pays the replay dedup ONCE and compacts to
    // core-count partitions: a day-partitioned store tree reads as one
    // micro-partition per day file and the dedup is a whole shuffle
    // stage, so an un-prepared pin would charge a dashboard burst
    // hundreds of near-empty task launches PLUS a dedup stage per
    // estimate — one open-time pass buys every later estimate a single
    // core-sized aggregation (the dedup-before-scope swap is exact:
    // replays are byte-identical rows, so scoping the deduped frame
    // equals deduping the scoped one)
    val idCol = meta(0).getString(0)
    SampleHandle(
      if (pin) df.dropDuplicates(idCol, "batch_key")
        .repartition(df.sparkSession.sparkContext.defaultParallelism)
        .persist()
      else df,
      idCol, preDeduped = pin)
  }

  /** One-shot convenience: open cold, estimate once. Serving layers
    * should [[open]] once (pinned) and estimate many. */
  def estimate(spark: SparkSession, path: String, groupCols: Seq[String],
      valueCol: String, tsCol: String = "ts",
      since: Option[Long] = None, until: Option[Long] = None): DataFrame =
    open(spark, path).estimate(groupCols, valueCol, tsCol, since, until)

  /** Drop sampled days strictly below `cutoff` ts-nanos — the retention
    * trim on the sample tier (a sample outliving the raw table's own
    * retention estimates nothing a query may legally read). Cutoffs must
    * be day-aligned so every trim is a whole-`__day` directory drop
    * (O(days dropped), never a rewrite of the retained window) — the
    * same day-floored-cutoff rule [[RollupStore.applyRetention]] keeps
    * its trims on the fast path with; the store does not carry the ts
    * column's NAME, so a sub-day trim has nothing exact to filter on and
    * is rejected rather than approximated. Idempotent: a retried trim
    * finds the days already gone. */
  def trimBelow(spark: SparkSession, path: String, cutoff: Long): Unit = {
    require(Math.floorMod(cutoff, DayNs) == 0,
      "sample-store trims are whole-day directory drops — day-floor the " +
        "cutoff (the applyRetention discipline)")
    val live = new org.apache.hadoop.fs.Path(path)
    val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
    val dayDirs = Option(fs.globStatus(new org.apache.hadoop.fs.Path(
      path, s"${WritableStore.PartitionCol}=*"))).getOrElse(Array.empty)
    val cutDay = java.time.LocalDate.ofEpochDay(
      Math.floorDiv(cutoff, DayNs)).toString
    dayDirs.filter(_.getPath.getName.stripPrefix(
        s"${WritableStore.PartitionCol}=") < cutDay)
      .foreach(d => fs.delete(d.getPath, true))
    spark.catalog.refreshByPath(path)
  }

  /** Rewrite accumulated per-batch files into one file per day — the IO
    * compaction that caps file-listing cost, doubling as the durable
    * replay repair (quiesce appends first). Batch keys are PRESERVED as
    * data (dictionary-encoded, near-free): unlike the additive stores
    * there is no fold to hide them behind, and rewriting them would
    * change what the read-side `(id, batch_key)` dedup sees. */
  def compact(spark: SparkSession, path: String): Unit = {
    val live = new org.apache.hadoop.fs.Path(path)
    val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
    graft.pipeline.Similarity.recoverCompact(fs, live)
    AtomicDir.compactPublish(spark, path, "compact sample store") { tmp =>
      val df = spark.read.parquet(path)
      val idCol = df.select("sample_col").head().getString(0)
      df.dropDuplicates(idCol, "batch_key")
        .repartition(col(WritableStore.PartitionCol))
        .write.partitionBy(WritableStore.PartitionCol).parquet(tmp)
    }
  }
}
