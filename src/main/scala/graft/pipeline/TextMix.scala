package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => Fn}

/** Packing / splitting / mixture tier of [[Text]]: sequence packing,
  * token-budget mixtures, epochs and temperature schedules, stratified
  * sampling, deterministic splits and shuffle shards. Split from Text.scala
  * round 12; `Text.<member>` call sites are unchanged. */
private[pipeline] trait TextMix { self: Text.type =>

  /** Training sequence packing: assign each document a token OFFSET in a
    * deterministic concatenated stream, then cut the stream every
    * `contextLen` tokens — the concat-then-chunk packing an autoregressive
    * training job feeds its context windows with. Emits per doc: its
    * stream bucket, token count, offset, and the first/last pack (context
    * window) it lands in; a doc spanning a boundary is split by the cut,
    * exactly like the real layout.
    *
    * Parallel + deterministic: docs hash into `numBuckets` independent
    * streams (bucket = id % numBuckets), and the running offset is a
    * per-bucket window cumsum ordered by id — no global sequential scan.
    * Each bucket is still ONE window task, so the bucket count must grow
    * with the corpus: `numBuckets <= 0` (the default) derives it from the
    * input's plan statistics via [[packBucketsFor]] (≈ one bucket per
    * 128 MiB of scan input, metadata-only). A fixed count is only
    * appropriate when the layout must be reproducible across inputs of
    * different sizes (as the oracle queries require) — 8 buckets over a
    * 100 TB corpus would mean 12.5 TB single-task windows.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      contextLen: Int, numBuckets: Int = 0): DataFrame = {
    val buckets =
      if (numBuckets > 0) numBuckets
      else packBucketsFor(df, textCol = Some(textCol))
    packByCounts(fanOut(df).select(col(idCol),
        tokenCount(col(textCol)).cast("long").as("n_tokens")),
      idCol, "n_tokens", contextLen, buckets)
  }

  /** MATERIALIZED context windows — the training-data pipeline's final
    * artifact: every `contextLen`-id window of the bucketed document
    * stream, as an actual id array (where [[packByCounts]] plans the
    * layout, this one produces the windows a data loader reads).
    * `tokens` is any (`idCol`, `ids` array) frame — [[Text.bpeTokenize]]
    * output under a frozen tokenizer is the canonical feed, making the
    * whole train→tokenize→pack chain reproducible at the id level.
    * Output: one row per (bucket, pack) with the window's `ids` (docs in
    * id order, each doc's ids in sequence — identical to the
    * [[packByCounts]] layout over the same counts), `n_tokens`,
    * `n_docs`. Every pack is exactly `contextLen` ids except each
    * bucket's last (partial, as a loader expects).
    *
    * Scale shape: a doc is exploded into its PACK SPANS (one row per
    * context window it touches — O(docs + packs) rows, each carrying an
    * array slice), never into per-token rows: the reassembly shuffle
    * moves corpus-token PAYLOAD but only span-count KEYS, and the
    * window cumsum is the same bucketed single-pass [[packByCounts]]
    * runs. Buckets grow with the corpus exactly as there. */
  def packTokenIds(tokens: DataFrame, idCol: String,
      contextLen: Int, numBuckets: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(contextLen > 0 && numBuckets > 0,
      s"packTokenIds needs positive contextLen/numBuckets: " +
        s"$contextLen/$numBuckets")
    requireIntegralId(tokens, idCol, "packTokenIds")
    val w = Window.partitionBy("bucket").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val spans = tokens
      .select(col(idCol), col("ids"),
        pmod(col(idCol), lit(numBuckets.toLong)).as("bucket"),
        size(col("ids")).cast("long").as("n_tokens"))
      .withColumn("offset", coalesce(sum("n_tokens").over(w), lit(0L)))
      // one row per context window this doc touches; empty docs still
      // land one (empty) span so n_docs matches the planner's view
      .withColumn("pack", explode(expr(
        s"sequence(offset div $contextLen, " +
          s"(offset + greatest(n_tokens, 1L) - 1L) div $contextLen)")))
      // the doc's id slice inside this window, in global positions
      .withColumn("__lo",
        greatest(col("pack") * contextLen, col("offset")))
      .withColumn("__hi",
        least((col("pack") + 1) * contextLen,
          col("offset") + col("n_tokens")))
      .withColumn("piece", expr(
        "slice(ids, cast(__lo - offset + 1 as int), " +
          "cast(greatest(__hi - __lo, 0L) as int))"))
    spans
      .groupBy("bucket", "pack")
      .agg(
        flatten(transform(
          array_sort(collect_list(struct(col("offset").as("o"),
            col("piece").as("p")))),
          x => x.getField("p"))).as("ids"),
        count(lit(1)).as("n_docs"))
      .withColumn("n_tokens", size(col("ids")).cast("long"))
  }

  /** pmod on a non-numeric id coerces via double → NULL buckets, which
    * silently collapses every doc into one null-keyed bucket and a SINGLE
    * window-partition task — the exact serialization the bucketing exists
    * to avoid. Shared guard for every pmod-bucketed packer. */
  private def requireIntegralId(df: DataFrame, idCol: String,
      caller: String): Unit = {
    import org.apache.spark.sql.types._
    val dt = df.schema(df.schema.fieldIndex(idCol)).dataType
    require(
      Set[DataType](ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"$caller buckets by pmod($idCol, n) — needs an integral id " +
        s"column, got $dt (string/uuid ids: hash them to a long first)")
  }

  /** The packing core over ANY per-doc token-count frame — the same
    * bucketed offset cumsum and context-window arithmetic, with the count
    * column supplied by the caller. [[packSequences]] feeds it the
    * whitespace proxy; feeding it [[bpeEncode]]'s `n_bpe` packs under the
    * REAL tokenizer's counts (the exact-token-budget layout a training
    * job actually loads — proxy counts misplace every pack boundary).
    */
  def packByCounts(counts: DataFrame, idCol: String, nCol: String,
      contextLen: Int, numBuckets: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(contextLen > 0 && numBuckets > 0,
      s"packByCounts needs positive contextLen/numBuckets: " +
        s"$contextLen/$numBuckets")
    requireIntegralId(counts, idCol, "packByCounts")
    val w = Window.partitionBy("bucket").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    counts
      .select(col(idCol),
        pmod(col(idCol), lit(numBuckets.toLong)).as("bucket"),
        col(nCol).cast("long").as("n_tokens"))
      .withColumn("offset", coalesce(sum("n_tokens").over(w), lit(0L)))
      // SQL `div` = exact integer division (Column./ on longs is double)
      .withColumn("pack_first", expr(s"offset div $contextLen"))
      .withColumn("pack_last",
        when(col("n_tokens") > 0,
          expr(s"(offset + n_tokens - 1) div $contextLen"))
          .otherwise(expr(s"offset div $contextLen")))
  }

  /** Sizing rule for [[packSequences]]' stream-bucket count: one bucket
    * per `bytesPerBucket` of estimated scan input, read from the plan's
    * statistics (file-size metadata — no extra Spark job). Keeps every
    * per-bucket window cumsum a bounded single-task slice regardless of
    * corpus size: 100 TB / 128 MiB ≈ 800k buckets, each a sub-second
    * window. Floor of 8 preserves useful parallelism on tiny inputs; cap
    * of 2^20 bounds the shuffle's key space.
    */
  def packBucketsFor(df: DataFrame, bytesPerBucket: Long = 128L << 20,
      textCol: Option[String] = None): Int = {
    val plan = df.queryExecution.optimizedPlan
    val est = plan.stats.sizeInBytes
    // Scan-backed frames report real file bytes, but Catalyst's
    // size-only visitor estimates a join as the PRODUCT of its children
    // and a stats-less relation (e.g. a localCheckpoint) saturates
    // toward Long.MaxValue — the same pitfall fanOut guards. So the
    // estimate is trusted only when the plan is join-free and the number
    // is physically plausible; otherwise, given the text column, fall
    // back to ONE exact byte-count aggregate (a narrow map-side-combined
    // pass — real work at 100 TB, but the price of a correct layout on
    // exactly the frames whose stats are unusable).
    val joinFree = plan.collectFirst {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.isEmpty
    val bytes: BigInt =
      if (joinFree && est > 0 && est < BigInt(1L << 60)) est
      else textCol match {
        case Some(c) =>
          val r = df.agg(sum(octet_length(col(c)).cast("long"))).collect()(0)
          BigInt(if (r.isNullAt(0)) 0L else r.getLong(0))
        case None => BigInt(0) // the floor of 8 applies
      }
    (bytes / BigInt(math.max(bytesPerBucket, 1L)) + 1)
      .max(BigInt(8)).min(BigInt(1 << 20)).toInt
  }

  /** Domain-weighted mixture sampling to a token budget — the data-mixing
    * step of a pretraining pipeline: from each domain, take documents in a
    * deterministic pseudo-random order (md5 of the id) until that domain's
    * token budget is spent. A doc is kept iff its domain has a budget and
    * the running token total through the doc stays within it; domains
    * absent from `budgets` are dropped entirely.
    *
    * Scale shape — a distributed prefix sum, NOT a per-domain window (a
    * `partitionBy(domain)` running sum would put each domain's entire
    * corpus in one partition, serializing terabytes through single tasks):
    *   1. bucket = first 2 hex chars of the md5 key, so the 256 buckets are
    *      CONTIGUOUS RANGES of the per-domain sample order;
    *   2. per-(domain, bucket) token sums — one map-side-combinable
    *      aggregation, ≤ |domains|×256 rows of metadata;
    *   3. each bucket's starting offset = running sum over that tiny frame;
    *      buckets that start past their domain's budget are pruned HERE,
    *      before any wide shuffle — at 100 TB with a fixed budget that
    *      eliminates almost all of the corpus in the metadata join;
    *   4. surviving rows join the broadcast offsets and finish with a
    *      within-(domain, bucket) cumulative sum — parallelism is
    *      |domains|×256 and each window holds ~1/256 of a domain.
    * The result is byte-identical to the single-window definition the SQL
    * oracle uses (the bucket boundaries respect the md5 sort order).
    */
  def mixSample(df: DataFrame, idCol: String, textCol: String,
      domainCol: String, budgets: Map[String, Long]): DataFrame = {
    val budget = budgets.foldLeft(lit(0L)) { case (acc, (k, v)) =>
      when(col(domainCol) === lit(k), lit(v)).otherwise(acc) }
    val base = fanOut(df).select(col(idCol), col(domainCol),
      tokenCount(col(textCol)).cast("long").as("n_tokens"))
    budgetedTake(base, idCol, domainCol, "n_tokens", budget, "cum_tokens")
      .select(col(idCol), col(domainCol), col("n_tokens"), col("cum_tokens"))
  }

  /** Temperature-scaled (α = 1/2) mixture budgets — the multilingual
    * up/down-sampling rule (budget_d ∝ n_d^α flattens the domain
    * distribution toward uniform as α → 0). Integer-exact by
    * construction: weights are `floor(sqrt(n_d))` (IEEE sqrt and floor
    * are correctly rounded, so every engine computes the same longs) and
    * shares come from long division — no float sum whose accumulation
    * order could drift. The per-domain count frame is |domains|-sized
    * (metadata), so the collect is a scalar fetch, not a data move; feed
    * the result to [[mixSample]] / [[mixEpochs]].
    */
  def temperatureBudgets(df: DataFrame, textCol: String, domainCol: String,
      totalBudget: Long): Map[String, Long] = {
    val counts = fanOut(df)
      .groupBy(domainCol)
      .agg(sum(tokenCount(col(textCol)).cast("long")).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val w = counts.map { case (dom, n) =>
      dom -> math.floor(math.sqrt(n.toDouble)).toLong }
    val sumW = w.map(_._2).sum
    // every domain empty (floor(sqrt(0)) = 0 each) → zero budgets, not a
    // divide-by-zero from the share computation
    if (sumW == 0L) w.map { case (dom, _) => dom -> 0L }.toMap
    // the product routes through BigInt: totalBudget · √(domain tokens)
    // overflows Long at 100 TB-class corpora (the decimal(38,0)
    // discipline the in-plan products already follow)
    else w.map { case (dom, wd) =>
      dom -> (BigInt(totalBudget) * wd / sumW).toLong }.toMap
  }

  /** Epoch-repeat mixture planning — the data-constrained companion of
    * [[mixSample]]: when a domain's token budget EXCEEDS its corpus, the
    * mix repeats the domain (multiple epochs) rather than truncating.
    * Emits every doc of every budgeted domain with its repeat count:
    * `budget div domain_tokens` full epochs for all docs, plus one extra
    * for the md5-order prefix whose cumulative tokens fit the remainder
    * (exactly [[mixSample]]'s fill rule). Σ(repeats·n_tokens) per domain
    * never exceeds the budget (the prefix rule admits only whole docs
    * that fit); the slack is an undershoot bounded by the first excluded
    * doc. Domains absent from `budgets` are dropped.
    *
    * Scale shape: the same bucketed distributed prefix sum as
    * [[mixSample]] (per-domain totals and bucket offsets are
    * metadata-sized broadcasts; the cumsum runs per (domain, md5-prefix
    * bucket)); unlike the sampler, no bucket is pruned — every doc emits
    * a row, so the full scan is inherent to the report.
    */
  def mixEpochs(df: DataFrame, idCol: String, textCol: String,
      domainCol: String, budgets: Map[String, Long]): DataFrame = {
    val budget = budgets.foldLeft(lit(0L)) { case (acc, (key, v)) =>
      when(col(domainCol) === lit(key), lit(v)).otherwise(acc) }
    val base = fanOut(df)
      .select(col(idCol), col(domainCol),
        tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("__b", budget).filter(col("__b") > 0)
    val totals = base.groupBy(domainCol)
      .agg(sum("n_tokens").as("__t"), first("__b").as("__bb"))
      .withColumn("full_epochs",
        expr("CASE WHEN __t > 0 THEN __bb div __t ELSE CAST(0 AS BIGINT) END"))
      .withColumn("__rem", col("__bb") - col("full_epochs") * col("__t"))
      .select(col(domainCol), col("full_epochs"), col("__rem"))
    bucketedCumsum(base, idCol, domainCol, "n_tokens", "cum_tokens")
      .join(broadcast(totals), Seq(domainCol))
      .withColumn("repeats", col("full_epochs") +
        when(col("cum_tokens") <= col("__rem"), 1L).otherwise(0L))
      .select(col(idCol), col(domainCol), col("n_tokens"),
        col("cum_tokens"), col("full_epochs"), col("repeats"))
  }

  /** Deterministic training schedule from [[mixEpochs]]' repeat counts:
    * one row per (doc, epoch) occurrence with a reshuffle key — the
    * order a trainer reads is the sort by (epoch, order_key), giving an
    * independent deterministic shuffle per epoch (the key is
    * md5(doc:epoch), so the same doc lands at a different position each
    * epoch, reproducibly). No global rank is materialized — that would
    * be a single-partition window; consumers sort/range-partition by
    * (epoch, order_key), which Spark distributes.
    */
  def mixSchedule(df: DataFrame, idCol: String, textCol: String,
      domainCol: String, budgets: Map[String, Long]): DataFrame =
    mixEpochs(df, idCol, textCol, domainCol, budgets)
      .filter(col("repeats") > 0)
      .withColumn("epoch", explode(sequence(lit(1L), col("repeats"))))
      .withColumn("order_key", md5(concat(col(idCol).cast("string"),
        lit(":"), col("epoch").cast("string"))))
      .select(col(idCol), col(domainCol), col("n_tokens"), col("epoch"),
        col("order_key"))

  /** Deterministic stratified sampling: the first `k` documents of every
    * stratum in md5-of-id order — a reservoir-sample equivalent that is
    * exactly reproducible (and therefore SQL-oracle-able), for carving
    * fixed-size eval/calibration sets out of each domain. Same distributed
    * prefix-sum shape as [[mixSample]] with per-doc cost 1: no per-stratum
    * single-partition window, and strata buckets past `k` are pruned before
    * the wide shuffle. Emits the sampled rows with their 1-based `rank`.
    */
  def sampleStratified(df: DataFrame, idCol: String, domainCol: String,
      k: Int): DataFrame = {
    val base = fanOut(df)
      .select(col(idCol), col(domainCol), lit(1L).as("__one"))
    budgetedTake(base, idCol, domainCol, "__one", lit(k.toLong), "rank")
      .select(col(idCol), col(domainCol), col("rank"))
  }

  /** Shared distributed-prefix-sum core of [[mixSample]] /
    * [[sampleStratified]]: keep each domain's md5-ordered prefix whose
    * running `costCol` total stays within `budget` (see the mixSample
    * Scaladoc for the bucket/offset/prune mechanics). `base` must carry
    * (`idCol`, `domainCol`, `costCol`); emits surviving rows plus the
    * inclusive running total as `cumName`.
    */
  /** Shared core of the md5-order distributed prefix sums
    * ([[budgetedTake]], [[mixEpochs]]): adds `__key`/`__bucket` and
    * `cumName` = the running `costCol` total per domain in (md5, id)
    * order — per-(domain, bucket) sums, broadcast bucket offsets,
    * within-bucket windows. `offsetKeep` prunes offset rows (a
    * metadata-sized frame) BEFORE the wide join — the sampler drops
    * out-of-budget buckets there. */
  private def bucketedCumsum(base0: DataFrame, idCol: String,
      domainCol: String, costCol: String, cumName: String,
      offsetKeep: Option[Column] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = base0
      .withColumn("__key", md5(col(idCol).cast("string")))
      .withColumn("__bucket", substring(col("__key"), 1, 2))
    val wOff = Window.partitionBy(domainCol).orderBy("__bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets0 = base.groupBy(domainCol, "__bucket")
      .agg(sum(costCol).as("__bsum"))
      .withColumn("__off", coalesce(sum("__bsum").over(wOff), lit(0L)))
    val offsets = offsetKeep.fold(offsets0)(offsets0.filter)
      .select(col(domainCol), col("__bucket"), col("__off"))
    val wCum = Window.partitionBy(domainCol, "__bucket")
      .orderBy(col("__key"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    base.join(broadcast(offsets), Seq(domainCol, "__bucket"))
      .withColumn(cumName, col("__off") + sum(costCol).over(wCum))
  }

  private def budgetedTake(base0: DataFrame, idCol: String, domainCol: String,
      costCol: String, budget: Column, cumName: String): DataFrame =
    // <= keeps zero-cost docs sitting exactly at the boundary comparable
    // with the oracle's single-window definition
    bucketedCumsum(base0, idCol, domainCol, costCol, cumName,
      offsetKeep = Some(col("__off") <= budget))
      .filter(budget > lit(0L) && col(cumName) <= budget)

  /** Pack manifest: the per-context-window index a training dataloader
    * reads — for every (stream bucket, pack) of [[packSequences]]' layout,
    * the documents contributing tokens to that window, with the exact
    * token count each window holds. Every pack is exactly `contextLen`
    * full except the last one per bucket (the invariant the spec pins).
    * One explode over the docs' spanned-pack ranges + one
    * map-side-combinable aggregation keyed on (bucket, pack); a doc spans
    * `1 + n_tokens/contextLen` packs at most, so the explode fan-out is
    * bounded by corpus tokens / contextLen.
    */
  def packManifest(df: DataFrame, idCol: String, textCol: String,
      contextLen: Int, numBuckets: Int = 0): DataFrame = {
    val c = lit(contextLen.toLong)
    packSequences(df, idCol, textCol, contextLen, numBuckets)
      .filter(col("n_tokens") > 0)
      .withColumn("pack", explode(sequence(col("pack_first"), col("pack_last"))))
      .withColumn("__tip",
        least(col("offset") + col("n_tokens"), (col("pack") + 1) * c) -
          greatest(col("offset"), col("pack") * c))
      .groupBy("bucket", "pack")
      .agg(count(lit(1)).as("n_docs"),
        min(idCol).as("first_doc"), max(idCol).as("last_doc"),
        sum("__tip").as("n_tokens"))
  }

  /** Sliding token-window chunking — the context-window prep step of a
    * training pipeline: overlapping chunks of `size` tokens with `overlap`
    * tokens shared between neighbors. Chunk i covers tokens
    * `[i·step, i·step + size)` where `step = size - overlap`; a document
    * with n tokens yields `max(1, ceil((n - overlap) / step))` chunks
    * (0 for empty docs), so every token lands in at least one chunk and the
    * final partial chunk is kept. One narrow map + explode — no shuffle.
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      size: Int, overlap: Int): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val step = size - overlap
    val toks = col("__toks")
    // null-text docs tokenize to a NULL array; without the coalesce the
    // n===0 guard would not fire (null predicate) and greatest(1, null)
    // = 1 would emit one phantom empty chunk per null doc
    val n = coalesce(Fn.size(toks), lit(0)) // `size` param shadows
      // functions.size here
    val nChunks = when(n === 0, lit(0))
      .otherwise(greatest(lit(1), ((n - overlap + step - 1) / step).cast("int")))
    df.withColumn("__toks", tokens(col(textCol)))
      .withColumn("__nc", nChunks)
      // guard nc=0: sequence(0, -1) would DESCEND in Spark, not be empty
      .select(col(idCol), toks, col("__nc"),
        explode(when(col("__nc") > 0, sequence(lit(0), col("__nc") - 1))
          .otherwise(array().cast("array<int>"))).as("chunk_idx"))
      .withColumn("chunk_text",
        concat_ws(" ", slice(toks, col("chunk_idx") * step + 1, lit(size))))
      .withColumn("n_chunk_tokens",
        least(lit(size), Fn.size(toks) - col("chunk_idx") * step)
          .cast("long"))
      .select(col(idCol), col("chunk_idx"), col("n_chunk_tokens"),
        col("chunk_text"))
  }

  /** Deterministic, engine-portable split assignment for reproducible
    * train/valid/test mixes: bucket = md5-derived 60-bit hash of the id,
    * mod 100 — stable across runs, Spark versions, and engines (DuckDB:
    * `('0x' || substr(md5(id::text),1,15))::BIGINT % 100`). Returns the
    * frame with a `split` column; fractions are percentage cut points.
    */
  def hashSplit(df: DataFrame, idCol: String,
      cuts: Seq[(String, Int)] = Seq("train" -> 90, "valid" -> 95,
        "test" -> 100)): DataFrame = {
    require(cuts.nonEmpty && cuts.last._2 == 100 &&
      cuts.map(_._2) == cuts.map(_._2).sorted, "cuts must ascend to 100")
    val bucket = pmod(
      conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
        .cast("long"), lit(100))
    val expr = cuts.foldRight(lit(cuts.last._1): Column) { case ((name, hi), acc) =>
      when(bucket < hi, lit(name)).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** Deterministic global corpus shuffle with shard assignment — the
    * reproducible-training-order primitive: every run (any cluster size,
    * any partitioning of the input) produces the SAME permutation and the
    * same shard files, because the order derives only from data. The key
    * is the [[hashSplit]] md5-60-bit hash salted with `seed` (so
    * different seeds give independent permutations, and DuckDB can mirror
    * it bit-for-bit); `shard = key mod nShards`, `pos` = rank within the
    * shard by (key, id).
    *
    * Scale shape: ONE hash shuffle on `shard` + a per-shard sort — no
    * global sort, no range exchange. Size `nShards` for the data
    * (~256 MB of payload per shard → hundreds of thousands of shards at
    * 100 TB), which simultaneously bounds the per-task sort and matches
    * the files a training loader wants. The 60-bit key makes collisions
    * (ties broken by id) astronomically rare but still deterministic.
    */
  def shuffleShards(df: DataFrame, idCol: String, seed: Long,
      nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    import org.apache.spark.sql.expressions.Window
    val key = conv(substring(md5(concat(col(idCol).cast("string"),
      lit(":" + seed))), 1, 15), 16, 10).cast("long")
    val w = Window.partitionBy("shard").orderBy(col("__key"), col(idCol))
    df.withColumn("__key", key)
      .withColumn("shard", pmod(col("__key"), lit(nShards.toLong)))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .drop("__key")
  }
}
