package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => Fn}

/** Text-analysis operators for large-scale corpus pipelines: tokenization,
  * quality scoring, language-ID heuristic, fingerprinting. All built from
  * codegen'd `functions._` expressions — no UDFs in the hot path, so
  * whole-stage codegen keeps these inside the scan stage.
  */
object Text {

  /** Canonical tokenizer: lowercase, split on non-alphanumeric runs, drop
    * empties. Equivalent DuckDB expression (used by the oracle):
    * `list_filter(string_split_regex(lower(text),'[^a-z0-9]+'), x -> x <> '')`.
    */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= lit(""))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token estimate: letter runs, digit runs, and individual
    * non-alphanumeric glyphs each count as one token — the standard cheap
    * proxy for subword-tokenizer counts (a real BPE vocab would merge/split
    * further; this bounds the count without shipping a vocab). Mirrors the
    * DuckDB oracle expression
    * `len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))`.
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"),
      lit(0)))

  /** Distinct-token array (set semantics, original order dropped). */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** Word n-gram shingles from an already-materialized token array.
    *
    * Perf note: callers on hot paths must bind the token array to its own
    * projection column first (`select(tokens(text).as("__toks"))`) and pass
    * `col("__toks")` here. Embedding `tokens(text)` directly would place the
    * split+filter inside the `transform` lambda, where Catalyst cannot hoist
    * it — re-tokenizing once per shingle index (O(tokens²) per doc).
    */
  def shinglesOfTokens(toks: Column, n: Int): Column = {
    val idxs = sequence(lit(0), greatest(size(toks) - n, lit(0)))
    // build "t[i] t[i+1] … t[i+n-1]" for i in 0 .. size-n
    array_distinct(
      filter(
        transform(idxs, i =>
          when(i + n <= size(toks),
            concat_ws(" ", slice(toks, i + 1, lit(n))))),
        s => s.isNotNull))
  }

  /** Word n-gram shingles of the token stream, joined by a single space:
    * the unit for Jaccard/MinHash near-dup detection. Convenience form for
    * small inputs — hot paths use [[shinglesOfTokens]] on a bound column. */
  def shingles(text: Column, n: Int): Column = shinglesOfTokens(tokens(text), n)

  // --- JVM hot-path equivalents -----------------------------------------
  // Catalyst higher-order functions (transform/filter/aggregate) are
  // CodegenFallback: every lambda element is an interpreted expression-tree
  // walk (~ms per doc for shingle building). For per-doc heavy text ops a
  // compact Scala UDF is strictly faster — there is no codegen to lose.
  // Semantics are kept bit-identical to the expression forms above (and to
  // the DuckDB oracle): lower → split [^a-z0-9]+ → drop empties → n-gram
  // join by ' ' → first-occurrence-order distinct.

  private val TokenPattern = java.util.regex.Pattern.compile("[^a-z0-9]+")

  def tokensScala(s: String): Array[String] =
    if (s == null) Array.empty
    else TokenPattern.split(s.toLowerCase(java.util.Locale.ROOT))
      .filter(_.nonEmpty)

  def shinglesScala(toks: Array[String], n: Int): Array[String] = {
    if (toks.length < n) return Array.empty
    val out = new Array[String](toks.length - n + 1)
    var i = 0
    while (i + n <= toks.length) {
      out(i) = toks.slice(i, i + n).mkString(" ")
      i += 1
    }
    out.distinct
  }

  /** text → distinct word-n-gram shingles, as a single narrow-map UDF. */
  def shingleSetUdf(n: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((text: String) => shinglesScala(tokensScala(text), n))

  /** Repartition up to the session default parallelism when the input is
    * small enough that its scan yields too few partitions (a single small
    * parquet file = 1 partition = 1 core for every narrow stage above it).
    * The decision reads Catalyst's size estimate — `df.rdd` would force RDD
    * lineage materialization of the analyzed plan as a side channel — and
    * is a no-op at real scale, where file splits provide the parallelism.
    */
  def fanOut(df: DataFrame): DataFrame = {
    // streaming frames get their parallelism from the source; their plan
    // stats are not meaningful to read (and a blanket repartition would
    // add a shuffle to every micro-batch)
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val maxPartBytes = df.sparkSession.sessionState.conf.filesMaxPartitionBytes
    // below target × split-size the scan CANNOT yield `target` partitions,
    // so the repartition buys cores for (at most) that many cheap bytes;
    // above it, file splits already provide the parallelism. Sources with
    // no real estimate (est saturates at the Long.MaxValue default, or a
    // join product overflows it): probe an RDD-backed leaf's EXISTING
    // partition count — free, the RDD already exists, unlike df.rdd which
    // materializes new lineage — and fan out only when it is genuinely
    // narrow; unknown without such a leaf is left alone (repartitioning
    // an unbounded input on a guess could shuffle terabytes or SHRINK a
    // wide RDD to core count).
    val unknown = est >= BigInt(Long.MaxValue)
    val needed =
      if (!unknown) est < BigInt(maxPartBytes) * target
      else df.queryExecution.optimizedPlan.collectFirst {
        case r: org.apache.spark.sql.execution.LogicalRDD =>
          r.rdd.getNumPartitions < math.max(2, target / 2)
      }.getOrElse(false)
    if (needed) df.repartition(target) else df
  }

  /** Quality-score features (length / punctuation / stopword / digit
    * ratios) — the standard cheap heuristics a pretraining pipeline filters
    * on. All ratios are exact integer/integer divisions, so an SQL oracle
    * reproduces them bit-for-bit.
    */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = col("__toks") // materialized once — see shinglesOfTokens note
    val nChars = length(t)
    val nTokens = size(toks)
    val nPunct = nChars - length(regexp_replace(t, "[.,;:!?'\"()-]", ""))
    val nDigit = nChars - length(regexp_replace(t, "[0-9]", ""))
    val nWs = nChars - length(regexp_replace(t, " ", ""))
    val stop = array(StopwordsEn.map(lit): _*)
    val nStop = size(filter(toks, w => array_contains(stop, w)))
    df.withColumn("__toks", tokens(t))
      .withColumn("n_chars_m", nChars.cast("long"))
      .withColumn("n_tokens", nTokens.cast("long"))
      .withColumn("punct_ratio",
        when(nChars > 0, nPunct.cast("double") / nChars).otherwise(lit(0.0)))
      .withColumn("digit_ratio",
        when(nChars > 0, nDigit.cast("double") / nChars).otherwise(lit(0.0)))
      .withColumn("ws_ratio",
        when(nChars > 0, nWs.cast("double") / nChars).otherwise(lit(0.0)))
      .withColumn("stopword_ratio",
        when(nTokens > 0, nStop.cast("double") / nTokens).otherwise(lit(0.0)))
      .withColumn("mean_token_len",
        when(nTokens > 0,
          aggregate(toks, lit(0L), (acc, w) => acc + length(w))
            .cast("double") / nTokens).otherwise(lit(0.0)))
      .drop("__toks")
  }

  /** Fixed default weights for [[qualityScore]] — an interpretable linear
    * model over the engineered features: stopword density and healthy
    * whitespace vote FOR natural prose, digit/punctuation stuffing and
    * extreme token lengths vote against, and a capped length ramp rewards
    * docs long enough to carry signal. Deliberately published constants
    * (not learned here): the point is the STAGE — classifier-scored
    * filtering à la CCNet/fastText quality — with a deterministic model
    * any engine reproduces; a trained linear model drops into the same
    * (weights, bias, threshold) slots. */
  val DefaultQualityWeights: Seq[(String, Double)] = Seq(
    "stopword_ratio" -> 3.0,
    "punct_ratio" -> -2.0,
    "digit_ratio" -> -4.0,
    "ws_ratio" -> 1.0,
    "mean_token_len" -> -0.25,
    "len_ramp" -> 2.0)

  /** Classifier-based quality scoring: a linear model over
    * [[qualityFeatures]] (+ `len_ramp` = min(n_tokens, 100)/100) with a
    * keep decision at `threshold` — the model-scored filtering stage a
    * curation pipeline runs after the hard rule filters. The score is a
    * LEFT-FOLDED sum `bias + Σ wᵢ·fᵢ` in declared weight order: IEEE
    * double addition is order-sensitive, so fixing the order makes the
    * score bit-identical across engines (the SQL oracle mirrors the same
    * association). One narrow map over the scan — no shuffle, no UDF.
    */
  def qualityScore(df: DataFrame, textCol: String,
      weights: Seq[(String, Double)] = DefaultQualityWeights,
      bias: Double = 0.0, threshold: Double = 0.5): DataFrame = {
    val feats = qualityFeatures(df, textCol)
      .withColumn("len_ramp",
        least(col("n_tokens"), lit(100L)).cast("double") / lit(100.0))
    val score = weights.foldLeft(lit(bias)) {
      case (acc, (f, w)) => acc + lit(w) * col(f)
    }
    feats.withColumn("q_score", score)
      .withColumn("q_keep", (col("q_score") >= lit(threshold)).cast("long"))
  }

  /** Within-document repetition statistics — the Gopher-style signals a
    * pretraining filter cuts boilerplate and degenerate (looping) text on:
    * duplicate-token and duplicate-3-gram fractions plus top-token
    * dominance. Emitted as raw INTEGER counts (ratios are one division
    * away) so the SQL oracle compares bit-exactly. One pass per document in
    * a compact JVM UDF — per-doc HashMap beats exploding the token stream
    * into two groupBy shuffles, and stays a narrow map at any corpus size.
    */
  /** One-pass per-doc counters shared by [[repetitionStats]] and
    * [[gopherFilter]] — ONE implementation of the counting semantics the
    * DuckDB oracles mirror: (token count, distinct tokens, max token
    * frequency, positional 3-grams, distinct 3-grams, total token chars).
    * Total 3-gram count is positional (n-2); shinglesScala returns the
    * DISTINCT set. */
  private def docCountersScala(s: String)
      : (Long, Long, Long, Long, Long, Long) = {
    val toks = tokensScala(if (s == null) "" else s)
    val counts = new scala.collection.mutable.HashMap[String, Int]()
    var sumLen = 0L
    toks.foreach { t =>
      counts.update(t, counts.getOrElse(t, 0) + 1); sumLen += t.length }
    val n = toks.length
    val maxFreq = if (counts.isEmpty) 0 else counts.valuesIterator.max
    (n.toLong, counts.size.toLong, maxFreq.toLong,
      math.max(n - 2, 0).toLong, shinglesScala(toks, 3).length.toLong,
      sumLen)
  }

  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val f = udf((s: String) => docCountersScala(s))
    fanOut(df).select(col(idCol), f(col(textCol)).as("__r"))
      .select(col(idCol),
        col("__r._1").as("n_tokens"),
        col("__r._2").as("n_distinct_tokens"),
        col("__r._3").as("max_token_freq"),
        col("__r._4").as("n_shingles3"),
        col("__r._5").as("n_distinct_shingles3"))
  }

  /** Gopher-style composite quality filter (Rae et al. 2021, Appendix A —
    * adapted thresholds): the rule set a pretraining pipeline actually
    * DROPS on, combining length, duplicate-token/3-gram fractions,
    * top-token dominance, and mean token length. Every rule is evaluated
    * as an INTEGER cross-multiplication (e.g. dup-fraction <= 3/10 checked
    * as `(n - distinct) * 10 <= n * 3`), so the SQL oracle reproduces each
    * flag bit-exactly — no float thresholds. Emits the raw counters, one
    * 0/1 flag per rule, and the final `keep`. One narrow UDF pass per doc
    * (same engine-choice rationale as [[repetitionStats]]).
    */
  def gopherFilter(df: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 10, maxTokens: Int = 200): DataFrame = {
    val f = udf((s: String) => docCountersScala(s))
    val c = fanOut(df).select(col(idCol), f(col(textCol)).as("__c"))
      .select(col(idCol),
        col("__c._1").as("n_tokens"), col("__c._2").as("n_distinct"),
        col("__c._3").as("max_freq"), col("__c._4").as("n_3grams"),
        col("__c._5").as("n_distinct_3grams"), col("__c._6").as("sum_len"))
    val n = col("n_tokens")
    c.withColumn("len_ok",
        n.between(minTokens.toLong, maxTokens.toLong).cast("long"))
      .withColumn("dup_tok_ok",
        ((n - col("n_distinct")) * 10 <= n * 3).cast("long"))
      .withColumn("dup_3gram_ok",
        ((col("n_3grams") - col("n_distinct_3grams")) * 10 <=
          col("n_3grams") * 3).cast("long"))
      .withColumn("top_tok_ok", (col("max_freq") * 5 <= n).cast("long"))
      .withColumn("tok_len_ok",
        (n * 2 <= col("sum_len") && col("sum_len") <= n * 12).cast("long"))
      .withColumn("keep",
        (col("len_ok") + col("dup_tok_ok") + col("dup_3gram_ok") +
          col("top_tok_ok") + col("tok_len_ok") === 5L).cast("long"))
  }

  /** Top-`k` terms per document by term frequency, carrying the corpus
    * document frequency and corpus size — the INTEGER components of
    * TF-IDF, emitted raw so the oracle compares exactly (the weighting
    * formula is one float expression away and a caller choice: ln, log10,
    * smoothed, BM25...). Ties break on the token for determinism.
    *
    * Scale shape: two map-side-combinable aggregations (tf keyed on
    * (doc, token), df keyed on token), one token-keyed join, and a per-doc
    * top-k window — no global sort, no driver data.
    */
  def tfIdfTopK(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = fanOut(df).select(col(idCol),
      explode(tokens(col(textCol))).as("token"))
    val tf = tok.groupBy(idCol, "token").agg(count(lit(1)).as("tf"))
    val idf = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(idCol).orderBy(col("tf").desc, col("token").asc)
    tf.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .join(idf, Seq("token"))
      .crossJoin(broadcast(nDocs))
      .select(col(idCol), col("token"), col("tf"), col("df"),
        col("n_docs"), col("rank"))
  }

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
    // pmod on a non-numeric id coerces via double → NULL buckets, which
    // would silently collapse the pack into ONE window partition — the
    // exact single-task serialization the bucketing exists to avoid
    require({
        import org.apache.spark.sql.types._
        Set[DataType](ByteType, ShortType, IntegerType, LongType)
          .contains(counts.schema(counts.schema.fieldIndex(idCol)).dataType)
      },
      s"packByCounts buckets by pmod($idCol, n) — needs an integral id " +
        "column (string/uuid ids: hash them to a long first)")
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

  /** Per-document novelty — the memorization-risk / content-uniqueness
    * metric: of a doc's distinct shingles, how many appear in NO other
    * document (corpus df == 1). High-novelty docs carry unique content;
    * near-zero novelty marks boilerplate assembled from shared spans.
    * Emits (id, n_shingles, n_novel, novelty) — one row per doc WITH AT
    * LEAST `shingleSize` tokens. Shorter docs have no shingles and no
    * output row (they'd need an n_shingles=0 row with an undefined
    * novelty ratio); a consumer averaging novelty per source must
    * left-join from the corpus if it wants those docs represented.
    *
    * Scale shape: explode distinct shingles once, df by one
    * map-side-combinable count keyed on shingle, then join the exploded
    * rows back on the same shingle key — the df frame and the exploded
    * frame hash-partition identically, so the join reuses the df
    * aggregation's exchange — and finish with a doc-keyed count. Two
    * keyed shuffles total (vocabulary, then docs); nothing quadratic,
    * no broadcast of corpus-sized state.
    */
  def noveltyCounts(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3): DataFrame = {
    val ex = fanOut(df).select(col(idCol).as("__id"),
        explode(shingleSetUdf(shingleSize)(col(textCol))).as("__tok"))
    val dfreq = ex.groupBy("__tok").agg(count(lit(1)).as("__df"))
    ex.join(dfreq, Seq("__tok"))
      .groupBy("__id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("__df") === 1L, 1L).otherwise(0L)).as("n_novel"))
      .select(col("__id").as(idCol), col("n_shingles"), col("n_novel"),
        (col("n_novel").cast("double") / col("n_shingles")).as("novelty"))
  }

  /** Per-source curation report — the corpus-composition summary a data
    * pipeline publishes per crawl/source: document and token volume,
    * character volume, language spread, and distinct-content count
    * (n_docs − n_unique = exact duplicates within the source). One
    * groupBy over the scan; the two distincts expand map-side and
    * partial-aggregate, so per-source state stays bounded by the
    * source's distinct languages + fingerprints, never its row count.
    */
  def sourceStats(df: DataFrame, textCol: String,
      sourceCol: String): DataFrame =
    langId(fanOut(df), textCol)
      .select(col(sourceCol), col(textCol), col("lang_pred"),
        tokenCount(col(textCol)).cast("long").as("__nt"),
        length(col(textCol)).cast("long").as("__nc"),
        fingerprint(col(textCol)).as("__fp"))
      .groupBy(sourceCol)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__nt")).as("n_tokens"),
        sum(col("__nc")).as("n_chars"),
        countDistinct(col("lang_pred")).as("n_langs"),
        countDistinct(col("__fp")).as("n_unique"))

  /** Token-length histogram per group: docs bucketed by
    * `n_tokens div width` — the length-distribution profile used to pick
    * truncation/packing context sizes. One map-side-combinable groupBy;
    * output is |groups| × |buckets| metadata rows at any corpus size. */
  def lengthHistogram(df: DataFrame, textCol: String, groupCol: String,
      width: Int): DataFrame = {
    // div 0 is NULL in Spark SQL — a zero width would yield one
    // plausible-looking null bucket instead of failing
    require(width > 0, s"lengthHistogram needs a positive width: $width")
    fanOut(df)
      .select(col(groupCol),
        tokenCount(col(textCol)).cast("long").as("__nt"))
      .withColumn("bucket", expr(s"__nt div $width"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(count(lit(1)).as("n_docs"))
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

  /** Adjacent character-pair frequencies over the tokenized corpus — the
    * count table BPE tokenizer training starts from (the most frequent
    * pair is the first merge rule). Pairs are within-word only, one
    * count per occurrence, exactly like the BPE statistics pass. One
    * map-side-combinable count keyed on the pair (the key space is
    * alphabet², tiny) + a distributed TakeOrdered on the total
    * (count DESC, pair) order — no full sort materializes at any corpus
    * size. Per-word pair expansion runs in a compact JVM UDF (the HOF
    * equivalent is CodegenFallback, measured ~20× slower on per-doc text
    * work).
    */
  def bpePairCounts(df: DataFrame, textCol: String, topK: Int = 50)
      : DataFrame = {
    // one compiled text→pairs pass (the shingleSetUdf pattern) — routing
    // through the tokens() HOF would put the interpreted lambda this
    // comment's own rationale warns about back on the hot path
    val pairsUdf = udf((text: String) =>
      tokensScala(text).flatMap(w =>
        (0 until w.length - 1).map(i => w.substring(i, i + 2))).toSeq)
    fanOut(df)
      .select(explode(pairsUdf(col(textCol))).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(topK)
  }

  /** Ordered-pair expansion of a sorted token array — shared by
    * [[cooccurrence]] and its streaming twin. */
  def tokenPairsUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((toks: Seq[String]) =>
      for { i <- toks.indices; j <- i + 1 until toks.size }
        yield (toks(i), toks(j)))

  /** Top-`topK` tokens by DOCUMENT frequency, (df desc, tok asc) order —
    * [[cooccurrence]]'s vocabulary, shared with its streaming twin so
    * the two can never drift at a rank-`topK` tie. */
  def docFrequencyVocab(df: DataFrame, textCol: String,
      topK: Int): DataFrame =
    fanOut(df)
      .select(explode(tokenSet(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("tok").asc).limit(topK)
      .select("tok")

  /** Doc-level token co-occurrence counts over a capped vocabulary — the
    * raw-count substrate for PMI / association mining (consumers divide by
    * doc totals; counts stay integer here so the result is engine-exact).
    * The vocabulary cap is the scale control: only the global top-`topK`
    * tokens by document frequency participate, so the per-document pair
    * fan-out is bounded by `topK²/2` regardless of corpus size, and the
    * per-doc token buffer by `topK` entries. Two shuffles after the
    * (small, broadcast) vocabulary is built: one groupBy doc to assemble
    * the capped token list, one on the pair key to count. The all-pairs
    * self-join alternative would shuffle the token-doc frame twice and
    * re-filter; this posting-list form is strictly bounded because the
    * list is capped by construction (unlike a raw df-capped posting list,
    * which grows with the corpus).
    */
  def cooccurrence(df: DataFrame, idCol: String, textCol: String,
      topK: Int = 100): DataFrame = {
    val tokDoc = fanOut(df)
      .select(col(idCol), explode(tokenSet(col(textCol))).as("tok"))
    val vocab = docFrequencyVocab(df, textCol, topK)
    tokDoc.join(broadcast(vocab), "tok")
      .groupBy(idCol).agg(sort_array(collect_list("tok")).as("__toks"))
      .select(explode(tokenPairsUdf(col("__toks"))).as("__p"))
      .select(col("__p._1").as("tok_a"), col("__p._2").as("tok_b"))
      .groupBy("tok_a", "tok_b").agg(count(lit(1)).as("n_docs"))
  }

  /** Mergeable Misra-Gries heavy-hitter sketch over the token stream.
    * Guarantees (capacity `m`, stream length N): never overestimates,
    * underestimates by at most N/m, and therefore every token with true
    * frequency > N/m is present — all preserved under MERGE (Agarwal et
    * al. 2012: sum counters, then subtract the (m+1)-th largest and drop
    * non-positives), so partial sketches combine map-side and roll up
    * across partitions/days exactly like the HLL sketches above. State is
    * ≤ m counters regardless of vocabulary size — the answer when even the
    * vocabulary-bounded exact count (streamingTopTokens) is too big, e.g.
    * url/user-id domains. Runs as a typed Aggregator → Spark plans it as
    * an ObjectHashAggregate with a real partial/merge split.
    */
  private class MisraGriesAgg(m: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        String, scala.collection.mutable.HashMap[String, Long],
        Seq[(String, Long)]] {
    type Buf = scala.collection.mutable.HashMap[String, Long]
    def zero: Buf = scala.collection.mutable.HashMap.empty
    def reduce(b: Buf, tok: String): Buf = {
      b.get(tok) match {
        case Some(c) => b(tok) = c + 1
        case None if b.size < m => b(tok) = 1L
        case None => // classic MG step: decrement all, evict zeros
          val dead = List.newBuilder[String]
          b.foreachEntry { (k, c) =>
            if (c == 1L) dead += k else b(k) = c - 1
          }
          dead.result().foreach(b.remove)
      }
      b
    }
    def merge(a: Buf, c: Buf): Buf = {
      c.foreachEntry { (k, v) => a(k) = a.getOrElse(k, 0L) + v }
      if (a.size > m) {
        val cut = a.values.toArray.sortInPlace()
          .apply(a.size - m - 1) // (m+1)-th largest
        val dead = List.newBuilder[String]
        a.foreachEntry { (k, v) =>
          if (v <= cut) dead += k else a(k) = v - cut
        }
        dead.result().foreach(a.remove)
      }
      a
    }
    def finish(b: Buf): Seq[(String, Long)] =
      b.toSeq.sortBy { case (t, c) => (-c, t) }
    def bufferEncoder: org.apache.spark.sql.Encoder[Buf] =
      org.apache.spark.sql.Encoders.kryo[Buf]
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[(String, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** [[MisraGriesAgg]] over a text column's tokens → (tok, est) frame. */
  def heavyHitters(df: DataFrame, textCol: String, m: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    fanOut(df)
      .select(explode(tokens(col(textCol))).as("tok")).as[String]
      .select(new MisraGriesAgg(m).toColumn)
      .toDF("hh")
      .select(explode(col("hh")).as("p"))
      .select(col("p._1").as("tok"), col("p._2").as("est"))
  }

  /** Count-min sketch plumbing shared by the batch and streaming paths.
    * Row hashes are murmur3 with per-row seeds — deterministic across JVMs
    * and engines, no RNG state to ship. */
  private[graft] object Cms {
    def index(tok: String, row: Int, w: Int): Int =
      math.floorMod(
        scala.util.hashing.MurmurHash3.stringHash(tok, 0x9e3779b9 + row), w)
    /** Point estimate: min over the d row counters — never BELOW the true
      * count (every row counter ≥ truth by construction), above it by more
      * than (e/w)·N with probability ≤ e^−d (Cormode & Muthukrishnan). */
    def estimate(sk: Array[Long], tok: String, d: Int, w: Int): Long = {
      var m = Long.MaxValue
      var i = 0
      while (i < d) {
        val c = sk(i * w + index(tok, i, w))
        if (c < m) m = c
        i += 1
      }
      m
    }
  }

  /** Mergeable count-min sketch over the token stream: d rows × w counters
    * (flat long array), each token incrementing one counter per row.
    * MERGE is elementwise sum — partial sketches combine map-side and roll
    * up across partitions/days/corpora exactly, so the sketch of a union
    * IS the sum of the parts' sketches (the property the spec pins).
    * Answers point-frequency queries where [[MisraGriesAgg]] answers
    * top-k membership: state is d·w longs (d=4, w=2048 → 64 KiB)
    * REGARDLESS of vocabulary — the shape that holds at 100 TB where even
    * a vocabulary-bounded exact map is too big (url/user-id domains), and
    * the same state bound a streaming complete-mode agg carries. Runs as
    * a typed Aggregator → ObjectHashAggregate with a real partial/merge
    * split. */
  private[graft] class CountMinAgg(d: Int, w: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        String, Array[Long], Array[Long]] {
    def zero: Array[Long] = new Array[Long](d * w)
    def reduce(b: Array[Long], tok: String): Array[Long] = {
      var i = 0
      while (i < d) { b(i * w + Cms.index(tok, i, w)) += 1; i += 1 }
      b
    }
    def merge(a: Array[Long], c: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += c(i); i += 1 }
      a
    }
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** One-row (sk: array<bigint>) frame: the corpus token stream folded
    * into a [[CountMinAgg]] sketch. */
  def countMinSketch(df: DataFrame, textCol: String,
      d: Int = 4, w: Int = 2048): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    fanOut(df)
      .select(explode(tokens(col(textCol))).as("tok")).as[String]
      .select(new CountMinAgg(d, w).toColumn)
      .toDF("sk")
  }

  /** (tok, cnt, est) for every distinct token: exact counts joined with
    * the broadcast one-row sketch, estimates via [[Cms.estimate]]. The
    * verification surface for the sketch's two bounds — est ≥ cnt always,
    * est ≤ cnt + (e/w)·N for all but ~e^−d of tokens. */
  def cmsVsExact(df: DataFrame, textCol: String,
      d: Int = 4, w: Int = 2048): DataFrame = {
    val est = udf((sk: Seq[Long], tok: String) =>
      Cms.estimate(sk.toArray, tok, d, w))
    val exact = fanOut(df)
      .select(explode(tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    exact.crossJoin(broadcast(countMinSketch(df, textCol, d, w)))
      .select(col("tok"), col("cnt"), est(col("sk"), col("tok")).as("est"))
  }

  /** Top-`topK` tokens by total occurrence, (count desc, tok asc) order —
    * the vocabulary for [[windowCooccurrence]] and its streaming twin. */
  def occurrenceVocab(df: DataFrame, textCol: String,
      topK: Int): Set[String] =
    fanOut(df)
      .select(explode(tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok").asc).limit(topK)
      .collect().map(_.getString(0)).toSet

  /** Text→pairs UDF of [[windowCooccurrence]] — the vocab arrives as a
    * BROADCAST variable (shipped once per executor, not serialized into
    * every task closure — immaterial at topK=100, the difference between
    * workable and not at real vocabulary sizes), and tokenization happens
    * INSIDE the compiled UDF ([[tokensScala]]): routing through the
    * `tokens()` HOF would put the interpreted CodegenFallback lambda back
    * on the per-doc hot path (the ~20× measured penalty the bpePairCounts
    * comment records). */
  def windowPairsUdf(vocab: org.apache.spark.broadcast.Broadcast[Set[String]],
      window: Int): org.apache.spark.sql.expressions.UserDefinedFunction = {
    require(window >= 1, "window must be >= 1")
    udf((text: String) => {
      val v = vocab.value
      val toks = tokensScala(text)
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      var i = 0
      while (i < toks.length) {
        val a = toks(i)
        if (v(a)) {
          var o = 1
          while (o <= window && i + o < toks.length) {
            val b = toks(i + o)
            if (v(b))
              out += (if (a <= b) (a, b) else (b, a))
            o += 1
          }
        }
        i += 1
      }
      out.toSeq
    })
  }

  /** Positional (±`window`) token co-occurrence — the word2vec/skip-gram
    * statistic, distinct from [[cooccurrence]]'s doc-level co-membership:
    * a pair counts once per time the two tokens appear within `window`
    * positions in the raw sequence (gaps are NOT collapsed — tokens
    * outside the vocabulary still occupy positions). The top-`topK`-by-
    * occurrence vocabulary bounds the pair key space at K²/2; it is
    * topK-sized metadata, collected once and BROADCAST to the pairing
    * UDF. Pair fan-out ≤ `window` per token; one count shuffle.
    */
  def windowCooccurrence(df: DataFrame, textCol: String, window: Int = 2,
      topK: Int = 100): DataFrame = {
    val pairsUdf = windowPairsUdf(
      df.sparkSession.sparkContext.broadcast(
        occurrenceVocab(df, textCol, topK)), window)
    fanOut(df)
      .select(explode(pairsUdf(col(textCol))).as("__p"))
      .select(col("__p._1").as("tok_a"), col("__p._2").as("tok_b"))
      .groupBy("tok_a", "tok_b").agg(count(lit(1)).as("n"))
  }

  /** Per-group HLL distinct-token sketches (Apache DataSketches via Spark's
    * `hll_sketch_agg`) with their estimates — the scale path for "how many
    * distinct tokens/users/urls per domain" questions where exact
    * `count_distinct` would shuffle the full key set: sketch state is a few
    * KB per group regardless of cardinality, partial-aggregates map-side,
    * and sketches MERGE, so per-partition/per-day/per-domain sketches roll
    * up without touching raw data again ([[mergeSketchEstimate]]).
    * `lgK`=12 ⇒ ~1.6% standard error.
    */
  def distinctTokenSketch(df: DataFrame, textCol: String, groupCol: String,
      lgK: Int = 12): DataFrame =
    fanOut(df)
      .select(col(groupCol), explode(tokens(col(textCol))).as("__token"))
      .groupBy(groupCol)
      .agg(expr(s"hll_sketch_agg(__token, $lgK)").as("sketch"))
      .withColumn("estimate", expr("hll_sketch_estimate(sketch)"))

  /** Mergeable approximate quantiles per group: `percentile_approx` is a
    * partial-aggregating sketch (KB of state per group, merges across
    * partitions/days), the 100 TB quantile path beside the exact
    * `percentile` the length filter uses — exact quantiles shuffle the
    * full value column, the sketch never does. Emits the exact value
    * next to the estimate so callers (and the driver gate) can bound the
    * sketch error against truth.
    */
  def lengthQuantileSketch(df: DataFrame, textCol: String, groupCol: String,
      p: Double = 0.5, accuracy: Int = 10000): DataFrame =
    fanOut(df)
      .select(col(groupCol), tokenCount(col(textCol)).cast("long").as("__nt"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"),
        expr(s"percentile(__nt, $p)").as("p_exact"),
        expr(s"percentile_approx(__nt, $p, $accuracy)").as("p_approx"))

  /** Merge a frame of HLL sketches into one global (sketch, estimate) row —
    * the roll-up step proving sketch mergeability. */
  def mergeSketchEstimate(sketches: DataFrame,
      sketchCol: String = "sketch"): DataFrame =
    sketches.agg(expr(s"hll_union_agg($sketchCol, true)").as("sketch"))
      .withColumn("estimate", expr("hll_sketch_estimate(sketch)"))

  /** Per-doc DEFLATE compression ratio in basis points
    * (compressed·10⁴/raw) — the entropy-flavored quality signal of the
    * Gopher class: boilerplate, keyword stuffing, and template spam
    * compress far below natural prose, so a low ratio flags low-entropy
    * docs the token-level filters miss. One reused `Deflater` per
    * partition (allocation-free inner loop, the same mapPartitions shape
    * as the multimodal decoders); null/empty text yields null ratio
    * (absent data is not "maximally compressible"). DEFLATE output bytes
    * are deterministic for a fixed level but NOT specified across zlib
    * implementations, so this op is deliberately rows-only at the driver
    * gate — the ordering property (repetitive ≪ varied) is pinned in
    * ScalaTest instead, and thresholds consuming the ratio should be
    * calibrated per deployment, not hardcoded.
    */
  def compressionRatio(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    // the mapPartitions below reads the id as a Long; any other id type
    // must fail HERE at plan time, not as per-task ClassCastExceptions
    // mid-job (string/uuid ids: hash them to a long first — md5Long)
    require(df.schema(idIdx).dataType == LongType,
      s"compressionRatio needs a LongType id column; $idCol is " +
        s"${df.schema(idIdx).dataType.simpleString}")
    val txtIdx = df.schema.fieldIndex(textCol)
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("raw_bytes", LongType),
      StructField("comp_bytes", LongType),
      StructField("ratio_bps", LongType)))
    val rdd = df.rdd.mapPartitions { it =>
      val defl = new java.util.zip.Deflater(6)
      // Deflater holds NATIVE zlib memory until end() — finalization is
      // too late on long-lived executors running many tasks, so release
      // deterministically when the task completes (covers both iterator
      // exhaustion and task failure/cancellation mid-stream)
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => defl.end()))
      val buf = new Array[Byte](64 * 1024)
      it.map { row =>
        val id = row.getLong(idIdx)
        val text = if (row.isNullAt(txtIdx)) null else row.getString(txtIdx)
        if (text == null || text.isEmpty)
          org.apache.spark.sql.Row(id, null, null, null)
        else {
          val raw = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          defl.reset()
          defl.setInput(raw)
          defl.finish()
          var comp = 0L
          while (!defl.finished()) comp += defl.deflate(buf)
          org.apache.spark.sql.Row(id, raw.length.toLong, comp,
            comp * 10000L / raw.length)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Pairwise distinct-token OVERLAP estimates between groups via HLL
    * inclusion–exclusion: |A∩B| ≈ est(A) + est(B) − est(A∪B), with the
    * union estimated by a scalar `hll_union` of the two stored sketches —
    * no raw-data rescan. This is the cross-corpus question ("how much
    * vocabulary do these two sources share?") answered from KB-sized
    * at-rest state: per-group sketches build once (combinable agg), the
    * pair table is |groups|² over a broadcast self-join of sketch ROWS,
    * never a join of token sets. Intersection error compounds the three
    * estimates' errors, so it is relative to the UNION size (~5% at
    * lgK=12) — callers gate accordingly; the engine's exactness rule is
    * deliberately traded here, which is why the driver query emits the
    * exact intersection BESIDE the estimate and hash-checks only exact
    * values plus an in-plan error-bound bit.
    */
  def tokenOverlapSketch(df: DataFrame, textCol: String, groupCol: String,
      lgK: Int = 12): DataFrame = {
    val sk = distinctTokenSketch(df, textCol, groupCol, lgK)
    val a = sk.select(col(groupCol).as("group_a"), col("sketch").as("__sa"),
      col("estimate").as("est_a"))
    val b = sk.select(col(groupCol).as("group_b"), col("sketch").as("__sb"),
      col("estimate").as("est_b"))
    a.crossJoin(broadcast(b)).filter(col("group_a") < col("group_b"))
      .withColumn("est_union",
        expr("hll_sketch_estimate(hll_union(__sa, __sb, true))"))
      .withColumn("est_intersect",
        greatest(lit(0L), col("est_a") + col("est_b") - col("est_union")))
      .drop("__sa", "__sb")
  }

  /** Elementwise-sum merge of stored [[CountMinAgg]] counter arrays — the
    * roll-up half of the at-rest sketch store (CMS merge IS vector
    * addition, so merging stored partials is exact, not approximate-on-
    * approximate). */
  private[graft] class CmsMergeAgg
      extends org.apache.spark.sql.expressions.Aggregator[
        Array[Long], Array[Long], Array[Long]] {
    def zero: Array[Long] = Array.empty
    private def add(b: Array[Long], a: Array[Long]): Array[Long] =
      if (a == null || a.isEmpty) b
      else if (b.isEmpty) a.clone()
      else {
        require(b.length == a.length,
          s"CMS geometry mismatch: ${b.length} vs ${a.length}")
        var i = 0
        while (i < b.length) { b(i) += a(i); i += 1 }
        b
      }
    def reduce(b: Array[Long], a: Array[Long]): Array[Long] = add(b, a)
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = add(x, y)
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** At-rest sketch store: ONE compact row per group (HLL distinct-token
    * sketch + CMS counter array + exact token total), written partitioned
    * by the group column. The incremental-statistics workflow a growing
    * corpus needs: each ingest shard sketches itself once, and every later
    * "how many distinct tokens / how often does X appear / how big" question
    * over ANY group subset is answered from the stored KB-sized rows —
    * [[sketchRollup]] prunes non-selected groups at file-listing time
    * (PartitionFilters) and never rescans raw text. Both sketches merge
    * EXACTLY (HLL union; CMS vector addition), so a rollup equals the
    * sketch a direct pass over the union would build. */
  /** The per-group sketch aggregation both store writers share: (group,
    * hll, cms, n_tokens) — one compact row per group in `df`. */
  private[graft] def sketchRows(df: DataFrame, textCol: String,
      groupCol: String, lgK: Int, d: Int, w: Int): DataFrame =
    df.select(col(groupCol), explode(tokens(col(textCol))).as("__token"))
      .groupBy(groupCol)
      .agg(expr(s"hll_sketch_agg(__token, $lgK)").as("hll"),
        udaf(new CountMinAgg(d, w)).apply(col("__token")).as("cms"),
        count(lit(1)).as("n_tokens"))

  def writeSketchStore(df: DataFrame, path: String,
      textCol: String = "text", groupCol: String = "source",
      lgK: Int = 12, d: Int = 4, w: Int = 2048): Unit =
    sketchRows(fanOut(df), textCol, groupCol, lgK, d, w)
      // overwrite-mode base write: exactly one "base" row per group can
      // exist, so the constant key never collides under replay dedup
      .withColumn("batch_key", lit("base"))
      .write.mode("overwrite").partitionBy(groupCol).parquet(path)

  /** Append one batch's per-group partial rows to a sketch store, stamped
    * with `batchKey` — the row identity that makes streamed ingest
    * effectively exactly-once: a replayed micro-batch recomputes the SAME
    * (deterministic) partial under the SAME key, and [[sketchRollup]] /
    * [[compactSketchStore]] drop duplicate (group, batch_key) rows before
    * merging. Callers must make `batchKey` unique per logical batch and
    * STABLE across retries of that batch —
    * [[graft.streaming.StreamIngest.sketchIngest]] derives it from
    * (checkpoint location, micro-batch id). */
  def appendSketchStore(df: DataFrame, path: String, batchKey: String,
      textCol: String = "text", groupCol: String = "source",
      lgK: Int = 12, d: Int = 4, w: Int = 2048): Unit =
    sketchRows(df, textCol, groupCol, lgK, d, w)
      .withColumn("batch_key", lit(batchKey))
      .write.mode("append").partitionBy(groupCol).parquet(path)

  /** Compact an at-rest sketch store in place: streaming ingest
    * ([[graft.streaming.StreamIngest.sketchIngest]]) appends one partial
    * row per (group, micro-batch); this folds them back to ONE row per
    * group — the same per-group merge a rollup performs, made durable.
    * An IO optimization (caps file-listing cost as batches accumulate)
    * that doubles as the replay repair: duplicate (group, batch_key)
    * partials from an at-least-once redelivery collapse to one row
    * before the fold, the [[Similarity.compactIvf]] dropDuplicates
    * discipline. The folded row gets a fresh unique key, so it can never
    * be deduped against a later batch. Two-rename publish + crash
    * self-heal as compactIvf. Run it with the ingest stream stopped or
    * quiesced: a batch replayed AFTER its original partial was folded is
    * no longer detectable (the fold erased the row identities). */
  def compactSketchStore(spark: org.apache.spark.sql.SparkSession,
      path: String, groupCol: String = "source"): Unit = {
    val live = new org.apache.hadoop.fs.Path(path)
    val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
    Similarity.recoverCompact(fs, live)
    graft.storage.AtomicDir.compactPublish(spark, path,
      "compactSketchStore") { tmp =>
      spark.read.parquet(path)
        .dropDuplicates(groupCol, "batch_key") // replayed-batch repair
        .groupBy(groupCol)
        .agg(expr("hll_union_agg(hll, true)").as("hll"),
          udaf(new CmsMergeAgg).apply(col("cms")).as("cms"),
          sum("n_tokens").as("n_tokens"))
        .withColumn("batch_key",
          lit(s"compact-${java.util.UUID.randomUUID().toString.take(8)}"))
        .write.mode("overwrite").partitionBy(groupCol).parquet(tmp)
    }
  }

  /** Roll a stored sketch subset up to one (hll, cms, n_tokens,
    * distinct_est) row — reads ONLY the selected groups' partitions
    * (pruned at file listing), touches no raw text. Duplicate
    * (group, batch_key) partials — an at-least-once replay that landed
    * between compactions — are dropped before the merge, so a replayed
    * batch cannot double-count `cms`/`n_tokens`. */
  def sketchRollup(spark: org.apache.spark.sql.SparkSession, path: String,
      groups: Seq[String], groupCol: String = "source"): DataFrame =
    spark.read.parquet(path)
      .filter(col(groupCol).isin(groups: _*))
      .dropDuplicates(groupCol, "batch_key")
      .agg(expr("hll_union_agg(hll, true)").as("hll"),
        udaf(new CmsMergeAgg).apply(col("cms")).as("cms"),
        sum("n_tokens").as("n_tokens"))
      .withColumn("distinct_est", expr("hll_sketch_estimate(hll)"))

  /** Percentile-band length filter: keep documents whose token count lies
    * within the exact [`pLo`, `pHi`] quantiles of their group's length
    * distribution — the RELATIVE outlier cut (too short/long for their
    * domain) a quality pipeline applies after absolute thresholds, so one
    * rule serves domains with very different natural lengths. Exact
    * interpolating `percentile` (bit-identical to DuckDB `quantile_cont`
    * on integer inputs with dyadic p — see `text_length_quantiles`); the
    * per-group bound table is tiny and broadcasts back onto the corpus.
    * At extreme group cardinality swap in `approx_percentile` — the plan
    * shape (agg + broadcast join + filter) is unchanged.
    */
  def filterByLengthQuantiles(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, pLo: Double, pHi: Double): DataFrame = {
    val toks = fanOut(df).select(col(idCol), col(groupCol),
      tokenCount(col(textCol)).cast("long").as("n_tokens"))
    val bounds = toks.groupBy(groupCol).agg(
      expr(s"percentile(n_tokens, $pLo)").as("p_lo"),
      expr(s"percentile(n_tokens, $pHi)").as("p_hi"))
    toks.join(broadcast(bounds), Seq(groupCol))
      .filter(col("n_tokens") >= col("p_lo") && col("n_tokens") <= col("p_hi"))
  }

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

  /** Email/phone patterns shared by [[scrubPii]] and the count expressions.
    * Deliberately simple constructs (classes, bounded repeats) that behave
    * identically under Java regex (Spark) and RE2 (DuckDB), keeping the
    * scrub oracle-exact. */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern: String = "\\+[0-9][0-9 -]{6,}[0-9]"

  /** PII scrub: mask emails and international-format phone numbers — the
    * redaction pass a training-data pipeline runs before anything else
    * sees the text. Pure `regexp_replace` chain: codegen'd, no UDF. */
  def scrubPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")

  /** Match counts on the UNSCRUBBED text (audit trail for the scrub). */
  def piiEmailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailPattern), lit(0))).cast("long")
  def piiPhoneCount(text: Column): Column =
    size(regexp_extract_all(text, lit(PhonePattern), lit(0))).cast("long")

  val StopwordsEn: Seq[String] = Seq("the", "a", "an", "and", "or", "of", "to",
    "in", "is", "it", "that", "for", "on", "with", "as", "was", "at", "by")
  val StopwordsDe: Seq[String] = Seq("der", "die", "das", "und", "oder", "von",
    "zu", "im", "ist", "es", "dass", "mit", "als", "war", "bei", "ein", "eine")
  val StopwordsEs: Seq[String] = Seq("el", "la", "los", "las", "y", "o", "de",
    "en", "es", "que", "por", "con", "como", "un", "una", "del", "se")
  val StopwordsFr: Seq[String] = Seq("le", "la", "les", "et", "ou", "de", "en",
    "est", "que", "pour", "avec", "comme", "un", "une", "du", "se", "au")

  /** Language-ID n-gram/stopword heuristic: per-language stopword hit counts
    * over the token stream; argmax with deterministic tie-break (language
    * code order). `und` when nothing matches. A real pipeline swaps in
    * fastText — the *shape* (scores struct + argmax) is the operator.
    */
  def langId(df: DataFrame, textCol: String): DataFrame = {
    val toks = col("__toks")
    def score(words: Seq[String]): Column =
      size(filter(toks, w => array_contains(array(words.map(lit): _*), w)))
        .cast("long")
    // greatest-of-structs argmax: (score, langRank) — ranks inverted so ties
    // pick the alphabetically-first language
    val scored = df
      .withColumn("__toks", tokens(col(textCol)))
      .withColumn("score_de", score(StopwordsDe))
      .withColumn("score_en", score(StopwordsEn))
      .withColumn("score_es", score(StopwordsEs))
      .withColumn("score_fr", score(StopwordsFr))
      .drop("__toks")
    val langs = Seq("de", "en", "es", "fr")
    val best = greatest(langs.zipWithIndex.map { case (l, i) =>
      struct(col(s"score_$l").as("s"), lit(langs.length - i).as("r"),
        lit(l).as("lang"))
    }: _*)
    scored.withColumn("lang_pred",
      when(best.getField("s") > 0, best.getField("lang")).otherwise(lit("und")))
  }

  /** Unicode NFC normalization — the canonical pre-dedup text transform:
    * composed and decomposed spellings of the same grapheme ("é" vs
    * "é") must fingerprint identically before any hashing. JDK
    * `java.text.Normalizer` NFC; DuckDB's `nfc_normalize` computes the
    * same mapping, so the op is value-oracled. */
  def normalizeNfc(text: Column): Column = {
    val f = udf((s: String) =>
      if (s == null) null
      else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    f(text)
  }

  /** Content fingerprint: md5 of the whitespace-normalized lowercase text —
    * canonical exact-dup key. (DuckDB has `md5`, so the oracle matches.) */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  /** Chunk-granularity duplication stats — the paragraph-dedup signal
    * (CCNet/RefinedWeb shape at fixed token spans): non-overlapping
    * [[chunk]]s fingerprint with md5, the corpus-wide occurrence
    * frequency joins back, and each doc reports how many of its chunks
    * are duplicated ANYWHERE (including within itself — repeated
    * boilerplate is the point). Two keyed shuffles on the fingerprint
    * and the doc id; chunking itself is a narrow map + explode.
    */
  /** Exact duplicated-SPAN coverage per document — the substring-dedup
    * signal of "Deduplicating Training Data Makes Language Models Better"
    * (Lee et al. 2022) as a per-doc measure: how many of a document's
    * tokens sit inside at least one k-token window whose exact text
    * occurs ≥ `minCount` times across the corpus (within-doc repeats
    * count — a self-repeating doc is as memorization-prone as a cross-doc
    * copy). Overlapping duplicated windows merge into MAXIMAL spans
    * before measuring, so a token under many windows counts once —
    * `dup_tokens` is the size of the union of covered positions, the
    * number a span-excision pass would actually remove.
    *
    * Scale shape: one tokenize pass; occurrence counts are one groupBy
    * over the exploded k-grams (inverted-index shape, map-side combined)
    * joined back on the gram; span merging is a per-DOC window over that
    * doc's duplicated positions only — bounded by the doc's own token
    * count, never a global sort. The gram string is the shuffle key so a
    * second engine reproduces the result bit for bit; a production run
    * would xxhash64 it (same equality, 8-byte keys).
    */
  def dupSpanCoverage(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, minCount: Long = 2L): DataFrame = {
    require(minCount >= 2L, s"minCount < 2 would cover every token")
    val base = spanTokens(df, idCol, textCol)
    val grams = spanGrams(base, idCol, k)
    val dupGrams = grams.groupBy("__gram").agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") >= minCount)
    spanCoverage(base, grams, dupGrams, idCol, k)
  }

  private def spanTokens(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    df.select(col(idCol), coalesce(tokens(col(textCol)), array())
      .as("__toks"))

  /** (id, __pos, __gram) — every k-token window of every doc, 0-based
    * start positions. A doc shorter than k has none (sequence(1,0) would
    * count DOWN in Spark, hence the guard). */
  private def spanGrams(base: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"span length must be positive: $k")
    base.select(col(idCol), posexplode(expr(
        s"""CASE WHEN size(__toks) >= $k
           |THEN transform(sequence(1, size(__toks) - ${k - 1}),
           |  i -> array_join(slice(__toks, i, $k), ' '))
           |ELSE array() END""".stripMargin)))
      .select(col(idCol), col("pos").as("__pos"), col("col").as("__gram"))
  }

  /** Merge each doc's duplicated window positions into MAXIMAL spans —
    * gaps-and-islands over the doc's OWN duplicated positions: a new
    * island starts where a window clears every previous window's end.
    * One row per (doc, island) with `[__start, __end)` token bounds. */
  private def spanIslands(grams: DataFrame, dupGrams: DataFrame,
      idCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dupPos = grams.join(dupGrams.select("__gram"), "__gram")
      .select(col(idCol), col("__pos"))
    val w = Window.partitionBy(idCol).orderBy("__pos")
    dupPos
      .withColumn("__prev_end", max(col("__pos") + k)
        .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__new", when(col("__prev_end").isNull ||
        col("__pos") >= col("__prev_end"), 1L).otherwise(0L))
      .withColumn("__isl", sum("__new").over(w))
      .groupBy(col(idCol), col("__isl"))
      .agg(min(col("__pos")).as("__start"),
        (max(col("__pos")) + k).as("__end"))
  }

  /** Join each doc's windows against the duplicated-gram frame and
    * report the merged-span coverage. */
  private def spanCoverage(base: DataFrame, grams: DataFrame,
      dupGrams: DataFrame, idCol: String, k: Int): DataFrame = {
    val covered = spanIslands(grams, dupGrams, idCol, k)
      .groupBy(idCol)
      .agg(sum(col("__end") - col("__start")).as("dup_tokens"))
    base.select(col(idCol), size(col("__toks")).cast("long").as("n_tokens"))
      .join(covered, Seq(idCol), "left")
      .withColumn("dup_tokens", coalesce(col("dup_tokens"), lit(0L)))
  }

  /** EXCISE the duplicated spans — the transform half of Lee et al.
    * 2022 (their dedup deletes the duplicated substring, keeping the
    * document): every token under a ≥ `minCount`-occurrence k-window
    * leaves, the survivors rejoin in order. Output text is the CANONICAL
    * token stream (lowercased, punctuation collapsed to single spaces) —
    * the same normal form the duplication is defined on, so excision
    * bounds are exact rather than a byte-offset approximation.
    *
    * Scale shape: the island frame is per-doc-bounded as in
    * [[dupSpanCoverage]]; covered positions explode at most one row per
    * REMOVED token (never corpus × windows), and the rebuild is one
    * per-doc sorted fold (`sort_array(collect_list)` of (pos, token)
    * structs — bounded by the doc's own length). */
  def exciseDupSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, minCount: Long = 2L): DataFrame = {
    require(minCount >= 2L, s"minCount < 2 would excise every token")
    val base = spanTokens(df, idCol, textCol)
    val grams = spanGrams(base, idCol, k)
    val dupGrams = grams.groupBy("__gram").agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") >= minCount)
    exciseWith(base, grams, dupGrams, idCol, k)
  }

  /** [[exciseDupSpans]] against a stored (or otherwise pre-mined)
    * dup-gram frame — the transform half of [[dupSpanCoverageStored]]:
    * same windows, same island merge, same rebuild, but the duplicated
    * set comes from the index, so a new dump (or a streaming micro-batch
    * — [[graft.streaming.StreamIngest.streamingExciseSpans]]) excises in
    * one scoring join with no corpus-wide re-count. */
  def exciseDupSpansStored(df: DataFrame, idCol: String, textCol: String,
      index: DataFrame, k: Int = 8): DataFrame = {
    val base = spanTokens(df, idCol, textCol)
    exciseWith(base, spanGrams(base, idCol, k),
      index.select(col("gram").as("__gram")), idCol, k)
  }

  /** Shared excision core: island merge, coverage stats, covered-position
    * removal, and the per-doc sorted rebuild — identical whether the
    * duplicated set was mined inline or read from an index. */
  private def exciseWith(base: DataFrame, grams: DataFrame,
      dupGrams: DataFrame, idCol: String, k: Int): DataFrame = {
    // ONE island pass feeds both the coverage stats and the excision
    val islands = spanIslands(grams, dupGrams, idCol, k)
    val covered = islands.groupBy(idCol)
      .agg(sum(col("__end") - col("__start")).as("dup_tokens"))
    val coveredPos = islands.select(col(idCol),
      explode(expr("sequence(__start, __end - 1)")).as("__pos"))
    val toks = base.select(col(idCol), posexplode(col("__toks")))
      .select(col(idCol), col("pos").as("__pos"), col("col").as("__tok"))
    val rebuilt = toks
      .join(coveredPos, Seq(idCol, "__pos"), "left_anti")
      .groupBy(idCol)
      .agg(array_join(expr(
        "transform(sort_array(collect_list(struct(__pos, __tok))), " +
          "s -> s.__tok)"), " ").as("text_clean"))
    // docs fully excised (or empty to begin with) keep a row with ''
    base.select(col(idCol), size(col("__toks")).cast("long").as("n_tokens"))
      .join(covered, Seq(idCol), "left")
      .withColumn("dup_tokens", coalesce(col("dup_tokens"), lit(0L)))
      .join(rebuilt, Seq(idCol), "left")
      .withColumn("text_clean", coalesce(col("text_clean"), lit("")))
  }

  /** [[dupSpanCoverage]]'s duplicated-gram set AT REST: mine the corpus
    * once, store `(gram, cnt)` with the span length `k` riding every row
    * (the bucket_ns self-description discipline — [[openDupGramIndex]]
    * fails loudly on a k mismatch instead of silently scoring with the
    * wrong window width). Atomic two-rename publish. The index is the
    * DUPLICATED subset only — tiny relative to the corpus — so later
    * dumps, streams, and probes score against it without re-mining. */
  def writeDupGramIndex(df: DataFrame, path: String, idCol: String,
      textCol: String, k: Int = 8, minCount: Long = 2L): Unit = {
    require(minCount >= 2L, s"minCount < 2 would cover every token")
    val grams = spanGrams(spanTokens(df, idCol, textCol), idCol, k)
    graft.storage.AtomicDir.publish(df.sparkSession, path,
      "dup-gram index") { tmp =>
      grams.groupBy("__gram").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= minCount)
        .select(col("__gram").as("gram"), col("cnt"),
          lit(k).as("k"))
        .write.parquet(tmp)
    }
  }

  /** Read a stored dup-gram index, failing loudly when its span length
    * differs from the probe's `k`. */
  def openDupGramIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, k: Int): DataFrame = {
    val idx = spark.read.parquet(path)
    idx.withColumn("gram", when(assert_true(col("k") === k,
      lit(s"dup-gram index at $path was mined at a different span " +
        s"length than the probe's k=$k")).isNull, col("gram")))
  }

  /** INCREMENTAL dup-gram maintenance — at 100 TB a new dump cannot
    * trigger a corpus-wide re-mine, so the maintenance index accumulates
    * per-batch gram COUNTS (counts merge by addition — the one
    * associative fold this tier needs) under replay-stable batch keys,
    * exactly the rollup-store append discipline: an at-least-once
    * redelivery lands a DUPLICATE (gram, batch_key) row that every
    * reader and [[compactDupGramIndex]] drop before summing. Unlike the
    * serving index ([[writeDupGramIndex]]), the maintenance index keeps
    * cnt=1 rows — they are load-bearing: a gram seen once in two
    * different dumps is duplicated overall, and dropping singletons
    * would make that cross-dump duplication invisible forever. The span
    * length is validated against the index FIRST (metadata-sized scan),
    * the requireGrain posture. */
  def appendDupGramIndex(df: DataFrame, path: String, batchKey: String,
      idCol: String, textCol: String, k: Int = 8,
      validateK: Boolean = true): Unit = {
    val spark = df.sparkSession
    if (validateK) requireIndexK(spark, path, k)
    spanGrams(spanTokens(df, idCol, textCol), idCol, k)
      .groupBy("__gram").agg(count(lit(1)).as("cnt"))
      .select(col("__gram").as("gram"), col("cnt"), lit(k).as("k"),
        lit(batchKey).as("batch_key"))
      .write.mode("append").parquet(path)
  }

  /** Fail loudly when an existing maintenance index's span length
    * differs from `k` — the requireGrain posture. A long-lived appender
    * ([[graft.streaming.StreamIngest.dupGramIngest]]) runs this ONCE at
    * stream start instead of per micro-batch (the probe scans every
    * accumulated partial file); [[openDupGramIndex]]'s in-plan assert
    * still backstops a writer that bypasses it. */
  private[graft] def requireIndexK(
      spark: org.apache.spark.sql.SparkSession, path: String,
      k: Int): Unit = {
    val live = new org.apache.hadoop.fs.Path(path)
    val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(live))
      spark.read.parquet(path).select("k").distinct().collect()
        .map(_.getInt(0)).foreach(k0 => require(k0 == k,
          s"dup-gram index at $path holds $k0-token grams; appending " +
            s"$k-token partials would mix span lengths"))
  }

  /** The duplicated-gram frame a maintenance index serves: replay
    * duplicates dropped, per-batch partials summed per gram, `minCount`
    * applied to the TOTAL — so base + increments equal a one-shot mine
    * of the union corpus exactly. Feed it to [[dupSpanCoverageStored]],
    * or publish it as a probe-optimized serving index via
    * [[writeServingIndex]]. */
  def dupGramsFrom(spark: org.apache.spark.sql.SparkSession, path: String,
      k: Int, minCount: Long = 2L): DataFrame = {
    require(minCount >= 2L, s"minCount < 2 would cover every token")
    openDupGramIndex(spark, path, k)
      .dropDuplicates("gram", "batch_key")
      .groupBy("gram", "k").agg(sum("cnt").as("cnt"))
      .filter(col("cnt") >= minCount)
      .select("gram", "cnt", "k")
  }

  /** Re-publish the tiny probe-optimized serving index from the
    * maintenance index — one pass over the INDEX (gram-count rows),
    * never the corpus. Atomic two-rename publish. */
  def writeServingIndex(spark: org.apache.spark.sql.SparkSession,
      maintenancePath: String, servingPath: String, k: Int,
      minCount: Long = 2L): Unit =
    graft.storage.AtomicDir.publish(spark, servingPath,
      "dup-gram serving index") { tmp =>
      dupGramsFrom(spark, maintenancePath, k, minCount).write.parquet(tmp)
    }

  /** Fold a maintenance index's accumulated per-batch partials to one
    * row per gram — the IO compaction that caps file-listing cost as
    * dumps pile up, doubling as the durable replay repair (the
    * rollup-store compaction discipline; run with appends quiesced). */
  def compactDupGramIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    val live = new org.apache.hadoop.fs.Path(path)
    val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
    graft.pipeline.Similarity.recoverCompact(fs, live)
    graft.storage.AtomicDir.compactPublish(spark, path,
      "compact dup-gram index") { tmp =>
      val key = s"compact-${java.util.UUID.randomUUID().toString.take(8)}"
      spark.read.parquet(path)
        .dropDuplicates("gram", "batch_key")
        .groupBy("gram", "k").agg(sum("cnt").as("cnt"))
        .select(col("gram"), col("cnt"), col("k"),
          lit(key).as("batch_key"))
        .write.parquet(tmp)
    }
  }

  /** Score documents against a stored (or otherwise pre-mined) dup-gram
    * frame — the probe half of [[dupSpanCoverage]]: same windows, same
    * maximal-span merge, but the duplicated set comes from the index, so
    * a new dump scores in one pass with no corpus-wide re-count. */
  def dupSpanCoverageStored(df: DataFrame, idCol: String, textCol: String,
      index: DataFrame, k: Int = 8): DataFrame = {
    val base = spanTokens(df, idCol, textCol)
    spanCoverage(base, spanGrams(base, idCol, k),
      index.select(col("gram").as("__gram")), idCol, k)
  }

  def dupChunkStats(df: DataFrame, idCol: String, textCol: String,
      size: Int = 32): DataFrame = {
    val chunks = chunk(df, idCol, textCol, size, overlap = 0)
      .select(col(idCol), md5(col("chunk_text")).as("__fp"))
    val freq = chunks.groupBy("__fp").agg(count(lit(1)).as("__df"))
    chunks.join(freq, "__fp")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("__df") >= 2, 1L).otherwise(0L)).as("n_dup_chunks"))
  }

  /** Per-group percentile length trim — the ADAPTIVE quality filter:
    * instead of one fixed length band for the whole corpus, each group
    * (language, source) keeps only its own [loPct, hiPct] percentile
    * band, so a short-form source and a long-form source each lose their
    * own outliers. Each length value occupies the rank-mass interval
    * (cnt_lt, cnt_le] of its group; a row survives iff that interval
    * OVERLAPS the kept band (n·lo/100, n·hi/100] — so a length entirely
    * inside the bottom loPct or top (100−hiPct) tail drops, while a
    * constant-length group (whose single value IS the central mass)
    * keeps everything. Decided by integer cross-multiplication
    * (cnt·100 vs n·pct), never a float percentile.
    *
    * Scale shape: the quantile never runs as a per-row window. The
    * per-(group, length) HISTOGRAM aggregates first (map-side partials),
    * the cumulative window runs over that metadata-sized frame, and the
    * surviving (group, length) pairs broadcast back as a semi join — so
    * the big table is touched by one aggregate and one broadcast filter,
    * no matter how skewed the groups are.
    */
  def lengthTrimPct(df: DataFrame, lenCol: String, groupCol: String,
      loPct: Int = 5, hiPct: Int = 95): DataFrame =
    df.join(broadcast(lengthBand(df, lenCol, groupCol, loPct, hiPct)),
      Seq(groupCol, lenCol), "left_semi")

  /** The kept (group, length) pairs of [[lengthTrimPct]]'s band —
    * exposed separately so a STREAM can trim against a static corpus's
    * band (stream-static semi join, stateless) and so a band mined once
    * can filter later dumps without re-aggregating. Metadata-sized: one
    * row per surviving distinct (group, length). */
  def lengthBand(df: DataFrame, lenCol: String, groupCol: String,
      loPct: Int = 5, hiPct: Int = 95): DataFrame = {
    require(0 <= loPct && loPct < hiPct && hiPct <= 100,
      s"need 0 <= loPct < hiPct <= 100, got [$loPct, $hiPct]")
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(groupCol, lenCol).agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(groupCol).orderBy(lenCol)
    val cum = counts
      .withColumn("__cum_le", sum("__c").over(w))
      .withColumn("__cum_lt", col("__cum_le") - col("__c"))
    val tot = counts.groupBy(groupCol).agg(sum("__c").as("__n"))
    cum.join(tot, groupCol)
      .filter(col("__cum_le") * 100 > col("__n") * loPct &&
        col("__cum_lt") * 100 < col("__n") * hiPct)
      .select(groupCol, lenCol)
  }

  /** Boilerplate removal — the "most common spans" cleaning step
    * (CCNet/RefinedWeb shape): fixed non-overlapping [[chunk]] spans
    * fingerprint with md5, spans whose corpus-wide occurrence count
    * reaches `minDf` (headers, footers, nav text, license blurbs —
    * anything repeated across the corpus) are DROPPED, and each doc's
    * text reassembles from its surviving spans in order. Unlike
    * [[dupChunkStats]] (which only reports the signal) this returns the
    * cleaned corpus: (id, text_clean, n_chunks, n_dropped); docs whose
    * every span is boilerplate come back with empty text (n_chunks =
    * n_dropped), and token-less docs pass through untouched.
    *
    * Scale shape: two keyed shuffles (fingerprint df, then doc
    * reassembly); the per-doc collect is bounded by the doc's own chunk
    * count, and the df table is the distinct-span set — never all-pairs.
    */
  def removeBoilerplate(df: DataFrame, idCol: String, textCol: String,
      size: Int = 16, minDf: Long = 3): DataFrame = {
    require(minDf >= 2, s"minDf < 2 would drop every span, got $minDf")
    removeBoilerplateWith(df, idCol, textCol, size,
      boilerplateSpans(df, idCol, textCol, size, minDf))
  }

  /** The mined boilerplate span set of a corpus: one (fp, df) row per
    * span whose corpus-wide occurrence count reaches `minDf`. Small by
    * construction (only the repeated spans), which is what makes it a
    * broadcastable at-rest artifact — see [[writeBoilerplateIndex]]. */
  def boilerplateSpans(df: DataFrame, idCol: String, textCol: String,
      size: Int = 16, minDf: Long = 3): DataFrame =
    chunk(df, idCol, textCol, size, overlap = 0)
      .select(md5(col("chunk_text")).as("fp"))
      .groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)

  /** Clean `df` against an already-mined span set (same semantics as
    * [[removeBoilerplate]]; the span frame broadcasts, so the corpus pays
    * one chunk pass + one broadcast join + the per-doc reassembly). */
  def removeBoilerplateWith(df: DataFrame, idCol: String, textCol: String,
      size: Int, spans: DataFrame): DataFrame = {
    val chunks = chunk(df, idCol, textCol, size, overlap = 0)
      .withColumn("__fp", md5(col("chunk_text")))
    val keep = col("df").isNull // no span row = not boilerplate
    val agg = chunks.join(broadcast(spans.select(col("fp"), col("df"))),
        col("__fp") === col("fp"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(keep, 0L).otherwise(1L)).as("n_dropped"),
        array_join(transform(
          array_sort(collect_list(when(keep,
            struct(col("chunk_idx"), col("chunk_text"))))),
          x => x.getField("chunk_text")), " ").as("text_clean"))
    df.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"))
  }

  /** Persist the mined span set ([[boilerplateSpans]]) with its mining
    * parameters — the at-rest artifact that lets serving restarts, later
    * corpus dumps, and the streaming cleaner skip the corpus mining pass
    * (the [[graft.pipeline.Retrieval.writeBm25Index]] convention; same
    * [[graft.storage.AtomicDir]] crash-safe publish). */
  def writeBoilerplateIndex(df: DataFrame, idCol: String, textCol: String,
      path: String, size: Int = 16, minDf: Long = 3): Unit = {
    require(minDf >= 2, s"minDf < 2 would drop every span, got $minDf")
    val spark = df.sparkSession
    import spark.implicits._
    graft.storage.AtomicDir.publish(spark, path,
      "writeBoilerplateIndex") { tmp =>
      Seq((size, minDf)).toDF("size", "min_df")
        .write.mode("overwrite").parquet(s"$tmp/meta.parquet")
      boilerplateSpans(df, idCol, textCol, size, minDf)
        .coalesce(1) // small by construction — one file serves fastest
        .write.mode("overwrite").parquet(s"$tmp/spans.parquet")
    }
  }

  /** Clean a corpus against a stored [[writeBoilerplateIndex]] — the
    * chunk size comes from the INDEX meta so a probe can never chunk
    * differently than the miner did. */
  def removeBoilerplateStored(spark: org.apache.spark.sql.SparkSession,
      df: DataFrame, idCol: String, textCol: String,
      path: String): DataFrame = {
    graft.storage.AtomicDir.recover(
      new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sessionState.newHadoopConf()),
      new org.apache.hadoop.fs.Path(path), "writeBoilerplateIndex")
    val meta = spark.read.parquet(s"$path/meta.parquet").head()
    removeBoilerplateWith(df, idCol, textCol, meta.getInt(0),
      spark.read.parquet(s"$path/spans.parquet"))
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

  /** Single-pass table profile — the data-validation primitive: per-column
    * row/null/distinct counts and native-ordered min/max, computed in ONE
    * aggregate over ONE scan (the only honest shape at 100 TB — a
    * per-column loop would rescan the table N times). Distinct counts are
    * exact (Spark plans the multi-distinct via Expand — one pass, ×N rows
    * into the shuffle); for quick approximate profiles at extreme scale
    * the HLL sketch tier ([[approxDistinct]]) is the alternative. Min/max
    * compare in the column's native type and render as strings so one
    * tidy (col_name, n, n_nulls, n_distinct, min_s, max_s) row per column
    * comes back regardless of schema.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__${c}__nulls"),
        countDistinct(col(c)).as(s"__${c}__nd"),
        min(col(c)).cast("string").as(s"__${c}__min"),
        max(col(c)).cast("string").as(s"__${c}__max"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stacked = cols.map { c =>
      s"'$c', __n, __${c}__nulls, __${c}__nd, __${c}__min, __${c}__max"
    }.mkString(", ")
    one.select(expr(
      s"stack(${cols.size}, $stacked) AS " +
        "(col_name, n, n_nulls, n_distinct, min_s, max_s)"))
  }

  /** Rolling-hash document fingerprint: min/max/xor folds over 64-bit hashes
    * of word shingles (winnowing-style content signature; robust to word
    * order at the edges).
    *
    * `hash = "xx"` (default) uses Spark-native seed-stable xxhash64 — the
    * fast path. `hash = "md5"` derives a 60-bit value from the first 15 hex
    * digits of md5, which DuckDB reproduces exactly
    * (`('0x' || substr(md5(s),1,15))::BIGINT`) — the oracle-checkable path.
    */
  def shingleFingerprint(df: DataFrame, textCol: String, n: Int = 3,
      hash: String = "xx"): DataFrame = {
    val hashFn: Column => Column = hash match {
      case "xx"  => s => xxhash64(s)
      case "md5" => s => conv(substring(md5(s), 1, 15), 16, 10).cast("long")
      case other => throw new IllegalArgumentException(s"unknown hash '$other'")
    }
    df.withColumn("__toks", tokens(col(textCol)))
      .withColumn("__hashes",
        transform(shinglesOfTokens(col("__toks"), n), hashFn))
      .withColumn("fp_min", array_min(col("__hashes")))
      .withColumn("fp_max", array_max(col("__hashes")))
      .withColumn("fp_xor",
        aggregate(col("__hashes"), lit(0L), (acc, h) => acc.bitwiseXOR(h)))
      .drop("__toks", "__hashes")
  }

  // --- Adjacent-bigram substrate (collocations, LM scoring) ---------------

  /** Adjacent token bigrams WITH multiplicity, joined by one space — the
    * positional counterpart of [[shinglesScala]]'s set semantics. A compact
    * UDF for the same reason the shingle path has one: higher-order Column
    * functions are CodegenFallback, so per-doc array surgery is faster as
    * one narrow JVM map (measured rationale at the JVM hot-path section
    * above). */
  def bigramsScala(toks: Array[String]): Array[String] = {
    if (toks.length < 2) return Array.empty
    val out = new Array[String](toks.length - 1)
    var i = 0
    while (i + 1 < toks.length) {
      out(i) = toks(i) + " " + toks(i + 1)
      i += 1
    }
    out
  }

  /** text → adjacent-bigram array (with multiplicity), one narrow map. */
  def bigramsUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((text: String) => bigramsScala(tokensScala(text)))

  /** Collocation mining: adjacent bigrams ranked by a scaled RATIONAL PMI —
    * the phrase-discovery stage of a corpus pipeline ("new york", "machine
    * learning") as pure integer arithmetic. For bigram count c_ab, unigram
    * counts c_a/c_b, corpus token total N, and scale S = 2^`scaleLog2`:
    *
    *   pmi_s = ⌊ S · c_ab · N / (c_a · c_b) ⌋
    *
    * — exp(PMI) scaled, monotone in true PMI for fixed counts, engine-exact
    * (a float log would hash differently across libm builds; the BM25 idf
    * makes the same trade). `minCount` drops rare-pair noise (classic PMI
    * failure mode: hapax pairs score highest), then the global top-`topK`
    * by (pmi_s, pair) is emitted.
    *
    * Scale shape: two aggregation passes over the tokenized corpus (unigram
    * counts, bigram counts) — both map-side combinable; N derives from the
    * unigram frame, never a second corpus scan. The bigram→unigram joins
    * run AFTER the `minCount` filter, so the joined side is the surviving
    * candidate set, not the corpus; intermediates ride decimal(38,0)
    * (c_ab·N overflows long at corpus scale). Output is topK rows —
    * metadata-sized.
    */
  def collocations(df: DataFrame, textCol: String, minCount: Long = 5,
      topK: Int = 50, scaleLog2: Int = 20): DataFrame = {
    // the result is ≤ topK rows (metadata-sized by construction), so it
    // materializes HERE and the unigram pin releases before return — a
    // long-lived session calling this per source/day accumulates no
    // cache entries (the [[graft.operators.GraphOps.triangles]]
    // discipline; plan audits inspect [[collocationsPlan]] instead)
    val (out, uni) = collocationsPlan(df, textCol, minCount, topK,
      scaleLog2)
    try {
      val spark = df.sparkSession
      spark.createDataFrame(
        spark.sparkContext.parallelize(out.collect().toSeq, 1), out.schema)
    } finally uni.unpersist()
  }

  /** The lazy [[collocations]] plan plus its persisted unigram frame —
    * split out so plan audits can pin the cache reuse while
    * [[collocations]] owns the materialization and release. */
  private[graft] def collocationsPlan(df: DataFrame, textCol: String,
      minCount: Long = 5, topK: Int = 50, scaleLog2: Int = 20)
      : (DataFrame, DataFrame) = {
    require(minCount >= 1 && topK >= 1 && scaleLog2 >= 10 && scaleLog2 <= 30)
    val s = 1L << scaleLog2
    val big = (c: Column) => c.cast("decimal(38,0)")
    val base = fanOut(df)
    // the unigram frame is read three times (N scalar + two joins): persist
    // the vocabulary-sized aggregate so the corpus is scanned exactly twice
    // (once per count pass), not once per consumer
    val uni = base.select(explode(tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .persist()
    // coalesce: an empty corpus sums to NULL, which must read as zero
    // tokens, not a driver NPE
    val n = uni.agg(coalesce(sum("c"), lit(0L))).head().getLong(0)
    val bi = base.select(explode(bigramsUdf(col(textCol))).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
      .withColumn("tok_a", split(col("bg"), " ").getItem(0))
      .withColumn("tok_b", split(col("bg"), " ").getItem(1))
    val out = bi
      .join(uni.withColumnRenamed("tok", "tok_a").withColumnRenamed("c", "c_a"),
        "tok_a")
      .join(uni.withColumnRenamed("tok", "tok_b").withColumnRenamed("c", "c_b"),
        "tok_b")
      .withColumn("__num", big(lit(s)) * big(col("c_ab")) * big(lit(n)))
      .withColumn("__den", big(col("c_a")) * big(col("c_b")))
      .withColumn("pmi_s", expr("__num div __den"))
      .select("tok_a", "tok_b", "c_ab", "c_a", "c_b", "pmi_s")
      .orderBy(col("pmi_s").desc, col("tok_a").asc, col("tok_b").asc)
      .limit(topK)
    (out, uni)
  }

  /** The reference bigram language model [[lmScore]] scores against:
    * add-one-smoothed conditional counts from a reference corpus. `bi` is
    * (bg, c12) over adjacent bigrams, `uni` is (tok, c1) over tokens, `v`
    * the reference vocabulary size — the smoothing denominator. Both frames
    * are vocabulary-sized (not corpus-sized); `v` is the only scalar. */
  final case class LmRef(bi: DataFrame, uni: DataFrame, v: Long)

  /** One reference-corpus pass → [[LmRef]]. */
  def lmRef(refDf: DataFrame, textCol: String): LmRef = {
    val base = fanOut(refDf)
    val uni = base.select(explode(tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c1"))
    val bi = base.select(explode(bigramsUdf(col(textCol))).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c12"))
    LmRef(bi, uni, uni.count())
  }

  /** N-gram LM quality scoring (the CCNet/KenLM-shaped stage): each doc is
    * scored by its mean add-one-smoothed bigram probability under a
    * reference-corpus model, in exact integer arithmetic. Per doc bigram
    * (w1, w2) with reference counts c12 = c(w1 w2), c1 = c(w1 ·), vocab V,
    * scale S = 2^`scaleLog2`:
    *
    *   p_s  = ⌊ S · (c12 + 1) / (c1 + V) ⌋        (≤ S; unseen w1 → c1 = 0)
    *   lm_score = ⌊ Σ p_s / n_bigrams ⌋
    *
    * — the scaled-likelihood surrogate of perplexity: monotone in mean
    * probability (high = reference-like, low = gibberish/boilerplate), no
    * float log anywhere, so scores are bit-identical across engines. The
    * reference corpus plays KenLM's wiki-LM role; swapping a real trained
    * count table into [[LmRef]] changes nothing downstream. Docs with no
    * bigram (< 2 tokens) are dropped — they carry no sequence signal.
    *
    * Scale shape: one tokenize pass over the scored corpus; the model
    * frames are vocabulary-sized keyed joins (p_s via decimal(38,0) — at
    * corpus scale S·c12 exceeds long), never broadcast-forced so AQE picks
    * broadcast exactly when the model fits. The per-doc reduce is one
    * map-side-combinable groupBy.
    */
  def lmScore(df: DataFrame, ref: LmRef, idCol: String, textCol: String,
      scaleLog2: Int = 20): DataFrame =
    streamingLmScore(fanOut(df), ref, idCol, textCol, scaleLog2)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), sum("p").as("__sum"))
      .withColumn("lm_score", expr("__sum div n_bigrams"))
      .drop("__sum")

  // --- BPE tokenizer: train + encode --------------------------------------

  /** A word as its space-separated symbol sequence with boundary spaces —
    * " c h a r s " — so a merge (a, b) applies as the plain string replace
    * " a b " → " ab ": the boundary spaces make symbol identity positional
    * (no symbol is a substring-match of another across a merge), and
    * left-to-right non-overlapping replace semantics are identical in the
    * JVM and DuckDB, which is what makes the whole tokenizer
    * oracle-checkable. */
  private def bpeSeq0(word: Column): Column =
    concat(lit(" "), regexp_replace(word, "(.)", "$1 "))

  /** Apply an ordered merge list to a symbol sequence — one codegen'd
    * string replace per merge, composed as a narrow Column chain. */
  def bpeApply(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(bpeSeq0(word)) { case (c, (a, b)) =>
      replace(c, lit(s" $a $b "), lit(s" $a$b "))
    }

  private def symBigramsUdf
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((s: String) => bigramsScala(s.trim.split(" ")))

  /** BPE tokenizer TRAINING (Sennrich et al. 2016, arXiv:1508.07909): the
    * `merges` highest-count adjacent symbol pairs, learned greedily —
    * round k counts pairs over the current segmentation, takes the top
    * pair by (weighted count desc, pair asc), and merges it everywhere
    * (one left-to-right replace pass) before round k+1.
    *
    * Scale shape — the part that matters at 100 TB: training runs over
    * the WORD-COUNT VOCABULARY, not the corpus. One corpus pass builds
    * (word, count); every merge round is then one map-side-combinable
    * aggregation over that vocabulary-sized persisted frame plus a 1-row
    * collect (the chosen pair — metadata). Corpus size only ever affects
    * the single word-count pass; 10 merges = 10 small jobs, the pageRank
    * loop discipline. The returned merge list is tokenizer metadata
    * (`merges` entries).
    *
    * Training stops early only if NO adjacent pair remains (every word
    * fully merged) — with the fixed-round oracle this is a documented
    * precondition, not a behavioral branch, on any real corpus.
    *
    * The one-job-per-merge loop caps this entry at 64 merges; real
    * vocabularies (32k+ merges) go through [[bpeTrainBatch]], where
    * rounds — not merges — drive cost.
    */
  def bpeTrain(df: DataFrame, textCol: String, merges: Int)
      : Seq[(String, String)] = {
    require(merges >= 1 && merges <= 64)
    val words = fanOut(df)
      .select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .persist()
    try {
      val out = Seq.newBuilder[(String, String)]
      var learned = List.empty[(String, String)]
      var k = 0
      var exhausted = false
      while (k < merges && !exhausted) {
        val seq = bpeApply(col("w"), learned.reverse)
        val top = words
          .select(col("cnt"), explode(symBigramsUdf(seq)).as("bg"))
          .groupBy("bg").agg(sum("cnt").as("c"))
          .orderBy(col("c").desc, col("bg").asc)
          .limit(1).collect()
        if (top.isEmpty) exhausted = true
        else {
          val parts = top(0).getString(0).split(" ")
          val m = (parts(0), parts(1))
          out += m
          learned = m :: learned
          k += 1
        }
      }
      out.result()
    } finally words.unpersist()
  }

  /** Batch BPE training: [[bpeTrain]]'s greedy loop learns ONE merge per
    * Spark job, capping practical vocabularies at tens of merges; this
    * variant learns up to `pairsPerRound` merges per round, so ROUNDS —
    * not merges — drive job count and wall time, and 256+ merge
    * tokenizers train in single-digit rounds (toward real-vocabulary
    * scale; the per-round work is still one map-side-combinable
    * aggregation over the vocabulary-sized word frame plus a bounded
    * `candidatesPerRound`-row collect).
    *
    * Within a round, counts are computed ONCE, so only merges that cannot
    * interact may land together: candidates rank by (weighted count desc,
    * pair asc); a candidate is REJECTED when it shares a symbol with ANY
    * higher-ranked candidate in the window (rejected ones included — the
    * rule depends only on rank order, which keeps it reproducible as a
    * rank-window anti-join in the oracle SQL); the first `pairsPerRound`
    * survivors merge this round. Symbol-disjoint merges touch disjoint
    * occurrence sets, so every selected pair's count is exact — the trade
    * vs classic BPE is only that ranks 2..k are chosen under round-start
    * counts (the standard greedy-batch compromise), and the learned list
    * replays deterministically through the unchanged [[bpeApply]] /
    * [[bpeEncode]] / [[writeTokenizer]] chain.
    *
    * REAL-VOCABULARY shape (the round-10 cap lift): the vocabulary is
    * segmented INCREMENTALLY — round r applies only ITS OWN ≤
    * `pairsPerRound` merges to the already-segmented persisted frame,
    * never replays the whole learned list (replaces compose:
    * `apply(learned ++ sel) = apply(sel) ∘ apply(learned)`, so the
    * incremental frame is bit-identical to a from-scratch replay). That
    * turns the old quadratic learned-list replay — and its
    * rounds×pairs-deep expression tree, which breaks codegen near a
    * thousand merges — into constant per-round work: one cached-vocab
    * aggregation + one ≤64-replace projection. Lineage is pinned every
    * `pinEvery` rounds (the [[graft.operators.GraphOps.pageRank]] loop
    * discipline), bounding plan depth however many rounds run. 8k+
    * merges train in `merges / pairsPerRound` small jobs; wall time is
    * measured near-linear in merges (SCALE.md `bpe_train_8k`).
    */
  def bpeTrainBatch(df: DataFrame, textCol: String, rounds: Int,
      pairsPerRound: Int = 32, candidatesPerRound: Int = 256,
      pinEvery: Int = 8,
      pinMode: String = graft.pipeline.Pipelines.PinLocal)
      : Seq[(String, String)] = {
    require(rounds >= 1 && rounds <= 4096,
      s"rounds out of range: $rounds")
    require(pairsPerRound >= 1 && pairsPerRound <= 64 &&
      candidatesPerRound >= pairsPerRound && candidatesPerRound <= 8192,
      s"bad batch shape: $pairsPerRound pairs from $candidatesPerRound " +
        "candidates")
    require(pinEvery >= 1, s"pinEvery must be positive: $pinEvery")
    // the incrementally segmented vocabulary: (current symbol sequence,
    // corpus count) — the ONE corpus pass; every round after is
    // vocabulary-sized
    var seg = fanOut(df)
      .select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(bpeSeq0(col("w")).as("w"), col("cnt"))
      .persist()
    var lastPin: DataFrame = null
    try {
      var learned = Vector.empty[(String, String)]
      var r = 0
      var exhausted = false
      while (r < rounds && !exhausted) {
        val cands = seg
          .select(col("cnt"), explode(symBigramsUdf(col("w"))).as("bg"))
          .groupBy("bg").agg(sum("cnt").as("c"))
          .orderBy(col("c").desc, col("bg").asc)
          .limit(candidatesPerRound).collect().map(_.getString(0))
        if (cands.isEmpty) exhausted = true
        else {
          // rank-window selection (the top candidate always survives).
          // Component-set disjointness is SUFFICIENT for exact counts:
          // a selected pair's concatenation is not a round-start symbol
          // (symbols only arise from characters and PRIOR-round merges,
          // and a prior-round merge's pair can't reappear as a bigram —
          // the merge replaced every adjacency), so no same-round
          // candidate can contain another's merged output
          val seen = scala.collection.mutable.HashSet[String]()
          val sel = Vector.newBuilder[(String, String)]
          var n = 0
          val it = cands.iterator
          while (it.hasNext && n < pairsPerRound) {
            val parts = it.next().split(" ")
            if (!seen(parts(0)) && !seen(parts(1))) {
              sel += ((parts(0), parts(1)))
              n += 1
            }
            seen += parts(0)
            seen += parts(1)
          }
          val picked = sel.result()
          learned ++= picked
          r += 1
          if (r < rounds) {
            // re-segment with ONLY this round's merges; materialize from
            // the still-persisted parent before releasing it so the next
            // round never recomputes the corpus pass
            val applied = picked.foldLeft(col("w")) { case (c, (a, b)) =>
              replace(c, lit(s" $a $b "), lit(s" $a$b "))
            }
            val next0 = seg.select(applied.as("w"), col("cnt"))
            val next =
              if (r % pinEvery == 0) {
                val pinned = graft.pipeline.Pipelines.pinFrame(next0,
                  pinMode)
                pinned.count() // eager: truncate lineage NOW
                if (lastPin != null) lastPin.unpersist()
                lastPin = pinned
                pinned
              } else {
                val p = next0.persist()
                p.count()
                p
              }
            seg.unpersist()
            seg = next
          }
        }
      }
      learned
    } finally {
      seg.unpersist()
      if (lastPin != null && !(lastPin eq seg)) lastPin.unpersist()
    }
  }

  /** BPE ENCODE: per-doc subword token counts under a trained merge list —
    * the exact-token-budget primitive packing and mixture stages need (the
    * whitespace proxy [[bpeTokenCount]] bounds; this one is the real
    * tokenizer's answer). Pure narrow map: explode words, apply the merge
    * chain (codegen'd replaces — no join against a vocabulary table, so
    * encoding cost is independent of vocabulary size), count symbols, sum
    * per doc.
    */
  def bpeEncode(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame =
    fanOut(df)
      .select(col(idCol), explode(tokens(col(textCol))).as("w"))
      .withColumn("__n", size(split(trim(bpeApply(col("w"), merges)), " ")))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"),
        sum(col("__n").cast("long")).as("n_bpe"))

  // --- DSIR-style importance resampling -----------------------------------

  /** md5-derived 60-bit hash — the oracle-reproducible hash family used
    * throughout ([[shingleFingerprint]]'s md5 mode); always non-negative,
    * so `pmod` and `%` agree across engines. */
  private def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Per-bucket importance weights for [[importanceSample]]: tokens hash
    * into `buckets` buckets; each bucket's weight is the scaled ratio of
    * its relative frequency under the TARGET distribution vs the RAW
    * corpus (add-one smoothed, S = 2^`scaleLog2`):
    *
    *   w_b = ⌊ S · (tgt_b + 1) · N_raw  /  ((raw_b + 1) · N_tgt) ⌋
    *
    * — w_b ≈ S means the bucket is equally likely under both; > S,
    * target-enriched. The output is `buckets` rows — tokenizer-metadata
    * scale, broadcastable by construction. Two corpus passes (one per
    * distribution), each a narrow hash-map into a `buckets`-key
    * aggregation; the totals derive from the bucket frames, never a
    * third scan.
    */
  def importanceWeights(raw: DataFrame, tgt: DataFrame, textCol: String,
      buckets: Int = 256, scaleLog2: Int = 20): DataFrame = {
    require(buckets >= 2 && scaleLog2 >= 10 && scaleLog2 <= 30)
    val s = 1L << scaleLog2
    val big = (c: Column) => c.cast("decimal(38,0)")
    def bucketCounts(df: DataFrame): DataFrame = fanOut(df)
      .select(explode(tokens(col(textCol))).as("tok"))
      .select(pmod(md5Long(col("tok")), lit(buckets.toLong)).as("bkt"))
      .groupBy("bkt").agg(count(lit(1)).as("c"))
    val rawB = bucketCounts(raw)
    val tgtB = bucketCounts(tgt)
    val nRaw = rawB.agg(coalesce(sum("c"), lit(0L))).head().getLong(0)
    val nTgt = tgtB.agg(coalesce(sum("c"), lit(0L))).head().getLong(0)
    require(nTgt > 0, "importanceWeights needs a non-empty target corpus")
    // DENSE bucket table — all `buckets` rows, raw-absent buckets at
    // raw_b = 0. Batch scoring never reads the extra rows (a raw token's
    // bucket is raw-present by definition), but STREAMING scoring
    // against a stored table does: a stream token hashing into a bucket
    // the historical raw corpus never touched must score with the
    // maximally-target-enriched weight, not silently vanish from the
    // doc mean in the inner join
    raw.sparkSession.range(buckets.toLong).select(col("id").as("bkt"))
      .join(rawB, Seq("bkt"), "left")
      .join(tgtB.withColumnRenamed("c", "tc"), Seq("bkt"), "left")
      .withColumn("__wn",
        big(lit(s)) * big(coalesce(col("tc"), lit(0L)) + 1) * big(lit(nRaw)))
      .withColumn("__wd",
        big(coalesce(col("c"), lit(0L)) + 1) * big(lit(nTgt)))
      .withColumn("w", expr("__wn div __wd"))
      .select("bkt", "w")
  }

  /** DSIR-shaped data selection (Xie et al. 2023, arXiv:2302.03169):
    * deterministic importance resampling of the raw corpus toward a
    * target distribution, with hashed token buckets as the feature space.
    * Each doc scores the mean bucket weight of its tokens,
    *
    *   weight = ⌊ Σ_tok w_bucket(tok) / n_toks ⌋     (scaled: S ≈ 1.0)
    *
    * and is kept iff `md5(doc_id) mod S < weight` — acceptance with
    * probability min(1, weight/S), proportional to the importance ratio,
    * reproducible on any engine (DSIR's Gumbel top-k draws an RNG; the
    * hash-threshold form is the same selection pressure with a
    * deterministic coin, the [[mixSample]]/[[hashSplit]] discipline).
    * Docs with zero tokens carry no feature signal and are dropped.
    *
    * Scale shape: the weight table is `buckets` rows — broadcast onto one
    * exploded corpus pass; the per-doc reduce is map-side combinable; the
    * keep decision is a narrow map. Nothing driver-side beyond the two
    * total-count scalars.
    */
  def importanceSample(df: DataFrame, tgtDf: DataFrame, idCol: String,
      textCol: String, buckets: Int = 256, scaleLog2: Int = 20): DataFrame =
    importanceReduce(
      streamingImportanceScore(fanOut(df),
        ImportanceModel(importanceWeights(df, tgtDf, textCol, buckets,
          scaleLog2), buckets, scaleLog2), idCol, textCol),
      idCol, scaleLog2)

  /** A trained DSIR weight table plus the layout parameters scoring must
    * reproduce (bucket count for the token hash, scale for the coin). */
  final case class ImportanceModel(w: DataFrame, buckets: Int, scaleLog2: Int)

  /** Per-token weight partials for importance scoring — STATELESS on a
    * stream (the weight table is `buckets` rows, broadcast; no watermark,
    * no state store), reduced per doc by [[importanceReduce]] on the
    * drained sink / downstream. Partials are associative, so the reduce
    * equals the batch [[importanceSample]] however the source splits. */
  def streamingImportanceScore(stream: DataFrame, model: ImportanceModel,
      idCol: String, textCol: String): DataFrame =
    stream
      .select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .withColumn("bkt",
        pmod(md5Long(col("tok")), lit(model.buckets.toLong)))
      .join(broadcast(model.w), "bkt")
      .select(col(idCol), col("w"))

  /** The per-doc reduce over [[streamingImportanceScore]] partials: mean
    * bucket weight + the deterministic md5-coin keep decision. */
  def importanceReduce(partials: DataFrame, idCol: String,
      scaleLog2: Int = 20): DataFrame =
    partials
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_toks"), sum("w").as("__sw"))
      .withColumn("weight", expr("__sw div n_toks"))
      .withColumn("kept",
        (pmod(md5Long(col(idCol).cast("string")), lit(1L << scaleLog2)) <
          col("weight")).cast("long"))
      .drop("__sw")

  /** Persist a trained DSIR weight table — `buckets` rows + the layout
    * scalars, so admission decisions stay frozen while crawls stream in
    * (retraining shifts every acceptance threshold; the stored table is
    * the reproducibility unit, the [[writeTokenizer]] argument). Same
    * two-rename publish. */
  def writeImportanceWeights(model: ImportanceModel, path: String): Unit = {
    val spark = model.w.sparkSession
    import spark.implicits._
    graft.storage.AtomicDir.publish(spark, path, "writeImportanceWeights") {
      tmp =>
        Seq((model.buckets, model.scaleLog2)).toDF("buckets", "scale_log2")
          .coalesce(1).write.mode("overwrite").parquet(s"$tmp/meta.parquet")
        model.w.coalesce(1).write.mode("overwrite")
          .parquet(s"$tmp/weights.parquet")
    }
  }

  /** Open a [[writeImportanceWeights]]-stored model — scoring runs
    * unchanged against the stored table. */
  def openImportanceWeights(spark: org.apache.spark.sql.SparkSession,
      path: String): ImportanceModel = {
    val p = new org.apache.hadoop.fs.Path(path)
    graft.storage.AtomicDir.recover(
      p.getFileSystem(spark.sessionState.newHadoopConf()), p,
      "writeImportanceWeights")
    val meta = spark.read.parquet(s"$path/meta.parquet").head()
    ImportanceModel(spark.read.parquet(s"$path/weights.parquet"),
      meta.getAs[Int]("buckets"), meta.getAs[Int]("scale_log2"))
  }

  // --- trained-model artifacts at rest ------------------------------------

  /** Persist a [[bpeTrain]]ed or [[bpeTrainBatch]]-learned merge list.
    * The artifact is tiny (tokenizer metadata — merge-count rows)
    * but it gates every downstream token budget: packing, mixture fills and
    * contract checks are only reproducible under the EXACT merge chain that
    * produced them, so the tokenizer ships as a versioned artifact — never
    * a recomputation (retraining on a grown corpus yields different merges
    * and silently shifts every budget). Layout: `merges.parquet`
    * (rank, lhs, rhs), one file; published with the shared two-rename swap
    * so readers never observe a half-written list. */
  def writeTokenizer(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[(String, String)], path: String): Unit = {
    require(merges.nonEmpty, "writeTokenizer needs at least one merge")
    import spark.implicits._
    graft.storage.AtomicDir.publish(spark, path, "writeTokenizer") { tmp =>
      merges.zipWithIndex
        .map { case ((l, r), i) => (i.toLong, l, r) }
        .toDF("rank", "lhs", "rhs")
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/merges.parquet")
    }
  }

  /** Open a [[writeTokenizer]]-stored merge list, rank-ordered — API parity
    * with [[bpeTrain]]'s return, so [[bpeEncode]] runs unchanged. The
    * collect is bounded by the merge-list size (tokenizer metadata). */
  def openTokenizer(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[(String, String)] = {
    val p = new org.apache.hadoop.fs.Path(path)
    graft.storage.AtomicDir.recover(
      p.getFileSystem(spark.sessionState.newHadoopConf()), p,
      "writeTokenizer")
    spark.read.parquet(s"$path/merges.parquet")
      .orderBy("rank").collect()
      .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs"))).toSeq
  }

  /** Streaming twin of [[lmScore]]: per-bigram smoothed probabilities as a
    * STATELESS stream-static join — the model frames are the static side
    * (typically [[openLm]]'s at-rest parquet, so no micro-batch recounts
    * anything), no watermark, no state store. The per-doc reduce is left
    * to the drained sink / downstream aggregation: partial `(id, p)` rows
    * sum-and-divide to exactly the batch `lm_score` regardless of how the
    * source splits into micro-batches (the partials are associative — a
    * doc spanning batches still reduces correctly). */
  def streamingLmScore(stream: DataFrame, ref: LmRef, idCol: String,
      textCol: String, scaleLog2: Int = 20): DataFrame = {
    require(scaleLog2 >= 10 && scaleLog2 <= 30)
    val s = 1L << scaleLog2
    val big = (c: Column) => c.cast("decimal(38,0)")
    stream
      .select(col(idCol), explode(bigramsUdf(col(textCol))).as("bg"))
      .withColumn("__w1", split(col("bg"), " ").getItem(0))
      .join(ref.bi, Seq("bg"), "left")
      .join(ref.uni.withColumnRenamed("tok", "__w1"), Seq("__w1"), "left")
      .withColumn("__pn", big(lit(s)) * big(coalesce(col("c12"), lit(0L)) + 1))
      .withColumn("__pd", big(coalesce(col("c1"), lit(0L)) + ref.v))
      .select(col(idCol), expr("__pn div __pd").as("p"))
  }

  /** Persist an [[lmRef]] — the n-gram LM AT REST, so quality-scoring a
    * fresh crawl skips the reference-corpus count pass and every scoring
    * run holds the model fixed (the CCNet property: scores are only
    * comparable under one frozen LM). Layout: `meta.parquet` (v),
    * `uni.parquet` (tok, c1) and `bi.parquet` (bg, c12), both written in a
    * bounded file count sorted by key (row-group stats serve future point
    * probes; the full-corpus scoring join reads the whole model either
    * way, so no bucketing column is imposed). Same two-rename publish:
    * uni/bi/v must change together or smoothing denominators go stale. */
  def writeLm(ref: LmRef, path: String): Unit = {
    val spark = ref.uni.sparkSession
    import spark.implicits._
    graft.storage.AtomicDir.publish(spark, path, "writeLm") { tmp =>
      Seq(ref.v).toDF("v")
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/meta.parquet")
      ref.uni.repartition(4).sortWithinPartitions("tok")
        .write.mode("overwrite").parquet(s"$tmp/uni.parquet")
      ref.bi.repartition(8).sortWithinPartitions("bg")
        .write.mode("overwrite").parquet(s"$tmp/bi.parquet")
    }
  }

  /** Open a [[writeLm]]-stored model as an [[LmRef]] — [[lmScore]] runs
    * unchanged against the stored frames; no count pass, no persist. */
  def openLm(spark: org.apache.spark.sql.SparkSession, path: String): LmRef = {
    val p = new org.apache.hadoop.fs.Path(path)
    graft.storage.AtomicDir.recover(
      p.getFileSystem(spark.sessionState.newHadoopConf()), p, "writeLm")
    LmRef(
      spark.read.parquet(s"$path/bi.parquet"),
      spark.read.parquet(s"$path/uni.parquet"),
      spark.read.parquet(s"$path/meta.parquet").head().getAs[Long]("v"))
  }

  // --- Trained quality classifier (counting-trained token ratios) ---------

  /** A TRAINED document classifier at the shape of the fastText/DCLM
    * quality filter: `w` maps every token of the joint training vocabulary
    * to a scaled add-one-smoothed class-likelihood ratio
    * ⌊S·p̂(tok|pos)/p̂(tok|neg)⌋, `w0` is the weight of a token unseen in
    * training (both class counts zero — the same formula at cp = cn = 0),
    * `s` the fixed-point scale. Training is COUNTING (the multinomial
    * Naive Bayes estimator), so the whole model is reproducible by a
    * second engine bit for bit — the same reason [[LmRef]] carries counts,
    * not floats. The frame is vocabulary-sized; the scalars fold in at
    * weight-build time. */
  final case class ClassifierRef(w: DataFrame, w0: Long, s: Long)

  /** Train a [[ClassifierRef]] from a labeled positive/negative corpus
    * pair — the DCLM/CCNet setup where "positive" is a curated reference
    * distribution and "negative" the raw crawl. Per joint-vocabulary token
    * with class counts cp, cn, class token totals nPos, nNeg, vocab V,
    * scale S = 2^`scaleLog2`:
    *
    *   w_s(tok) = ⌊ S · (cp+1) · (nNeg+V) / ((cn+1) · (nPos+V)) ⌋
    *
    * — the add-one-smoothed likelihood ratio p̂(tok|pos)/p̂(tok|neg): > S
    * means the token prefers the positive class. No float log anywhere
    * (decimal(38,0) cross-multiplication), so weights are bit-identical
    * across engines; the monotone-score deviation from log-space Naive
    * Bayes is deliberate and documented at [[classifierScore]].
    *
    * Scale shape: two count passes (one per class, each a narrow
    * tokenize + combinable groupBy), a vocabulary-sized full outer join,
    * and three scalars. Nothing is corpus-sized past the first
    * aggregation — training a quality filter over a 100 TB crawl is two
    * scans and a vocab-sized shuffle. */
  def classifierTrain(pos: DataFrame, neg: DataFrame, textCol: String,
      scaleLog2: Int = 20): ClassifierRef =
    classifierFromVocab(classVocab(pos, neg, textCol), scaleLog2)

  /** One labeled corpus pair → joint-vocabulary `(tok, cp, cn)` counts —
    * the classifier's mergeable substrate (counts add; weights do not). */
  private def classVocab(pos: DataFrame, neg: DataFrame,
      textCol: String): DataFrame = {
    def classCounts(df: DataFrame, name: String) = fanOut(df)
      .select(explode(tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as(name))
    classCounts(pos, "__cp")
      .join(classCounts(neg, "__cn"), Seq("tok"), "full")
      .select(col("tok"), coalesce(col("__cp"), lit(0L)).as("cp"),
        coalesce(col("__cn"), lit(0L)).as("cn"))
  }

  /** Weight derivation shared by [[classifierTrain]] and
    * [[openClassifierCounts]]: merged `(tok, cp, cn)` counts →
    * [[ClassifierRef]], scalars folded in at build time. */
  private def classifierFromVocab(vocab: DataFrame,
      scaleLog2: Int): ClassifierRef = {
    require(scaleLog2 >= 10 && scaleLog2 <= 30)
    val s = 1L << scaleLog2
    val m = vocab.agg(coalesce(sum("cp"), lit(0L)),
      coalesce(sum("cn"), lit(0L)), count(lit(1))).head()
    val (nPos, nNeg, v) = (m.getLong(0), m.getLong(1), m.getLong(2))
    require(nPos > 0 && nNeg > 0,
      "classifier needs non-empty positive AND negative token counts")
    val big = (c: Column) => c.cast("decimal(38,0)")
    val w = vocab
      .withColumn("__num", big(lit(s)) * big(col("cp") + 1) *
        big(lit(nNeg + v)))
      .withColumn("__den", big(col("cn") + 1) * big(lit(nPos + v)))
      .select(col("tok"), expr("__num div __den").as("w"))
    val w0 = (BigInt(s) * BigInt(nNeg + v) / BigInt(nPos + v)).toLong
    ClassifierRef(w, w0, s)
  }

  /** Score documents under a trained [[ClassifierRef]]: per doc,
    * `clf_score` = ⌊ Σ w_s(tok) / n_toks ⌋ — the MEAN scaled token
    * likelihood ratio — and `pred_pos` = 1 iff clf_score ≥ S (the mean
    * token prefers the positive class). Deliberate deviation from
    * log-space Naive Bayes: the mean of ratios replaces the sum of
    * log-ratios, trading the probabilistic calibration for exact integer
    * arithmetic (the [[lmScore]] surrogate argument: monotone in per-token
    * class preference, no transcendental anywhere, oracle-checkable bit
    * for bit). Zero-token docs are dropped — no lexical evidence.
    *
    * Scale shape: one tokenize pass over the scored corpus, a
    * vocabulary-sized left join (never broadcast-forced; AQE broadcasts
    * exactly when the model fits), one map-side-combinable per-doc
    * reduce. The sum rides decimal(38,0): a billion-token document times
    * a 2^40-scale ratio weight must not wrap a long. */
  def classifierScore(df: DataFrame, ref: ClassifierRef, idCol: String,
      textCol: String): DataFrame =
    streamingClassifierScore(fanOut(df), ref, idCol, textCol)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_toks"),
        sum(col("w").cast("decimal(38,0)")).as("__sum"))
      .withColumn("clf_score", expr("__sum div n_toks"))
      .withColumn("pred_pos", (col("clf_score") >= ref.s).cast("long"))
      .drop("__sum")

  /** Streaming twin of [[classifierScore]]'s per-token half: weight
    * lookups as a STATELESS stream-static join against the (typically
    * [[openClassifier]]-stored) model — no state store, no watermark, and
    * the `(id, w)` partials are associative, so the sink-side reduce
    * equals the batch scorer however the source splits into
    * micro-batches (the [[streamingLmScore]] contract). */
  def streamingClassifierScore(stream: DataFrame, ref: ClassifierRef,
      idCol: String, textCol: String): DataFrame =
    stream
      .select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .join(ref.w, Seq("tok"), "left")
      .select(col(idCol), coalesce(col("w"), lit(ref.w0)).as("w"))

  /** Persist a [[ClassifierRef]] — the quality filter AT REST, trained
    * once and applied to every fresh dump (scores are only comparable
    * under one frozen model). Layout: `meta.parquet` (w0, s) +
    * `w.parquet` (tok, w) sorted by token in a bounded file count; the
    * same two-rename publish as [[writeLm]] — weights and scalars must
    * change together or unseen-token scoring goes stale. */
  def writeClassifier(ref: ClassifierRef, path: String): Unit = {
    val spark = ref.w.sparkSession
    import spark.implicits._
    graft.storage.AtomicDir.publish(spark, path, "writeClassifier") { tmp =>
      Seq((ref.w0, ref.s)).toDF("w0", "s")
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/meta.parquet")
      ref.w.repartition(4).sortWithinPartitions("tok")
        .write.mode("overwrite").parquet(s"$tmp/w.parquet")
    }
  }

  /** Open a [[writeClassifier]]-stored model — [[classifierScore]] runs
    * unchanged against the stored frame; no count pass. */
  def openClassifier(spark: org.apache.spark.sql.SparkSession,
      path: String): ClassifierRef = {
    val p = new org.apache.hadoop.fs.Path(path)
    graft.storage.AtomicDir.recover(
      p.getFileSystem(spark.sessionState.newHadoopConf()), p,
      "writeClassifier")
    val meta = spark.read.parquet(s"$path/meta.parquet").head()
    ClassifierRef(spark.read.parquet(s"$path/w.parquet"),
      meta.getAs[Long]("w0"), meta.getAs[Long]("s"))
  }

  /** One labeled batch → its `(tok, cp, cn, batch_key)` count partial. */
  private def classBatchCounts(pos: DataFrame, neg: DataFrame,
      textCol: String, batchKey: String): DataFrame =
    classVocab(pos, neg, textCol).withColumn("batch_key", lit(batchKey))

  /** The classifier's count substrate AT REST — INCREMENTAL training: at
    * 100 TB a fresh labeled dump cannot trigger a re-tokenize of every
    * corpus ever labeled, so the count store accumulates per-batch class
    * token counts under replay-stable batch keys (the
    * [[appendDupGramIndex]] discipline: counts merge by ADDITION, the one
    * associative fold this tier needs; an at-least-once redelivery lands
    * a duplicate `(tok, batch_key)` row every reader drops before
    * summing). Weights are NOT stored — they are a per-token function of
    * the GLOBAL totals, so any cached weight goes stale on every append;
    * [[openClassifierCounts]] derives them from the merged counts, making
    * an incrementally-grown model equal the from-scratch train bit for
    * bit. Serve-time freeze still goes through [[writeClassifier]]. */
  def writeClassifierCounts(pos: DataFrame, neg: DataFrame,
      textCol: String, path: String, batchKey: String = "base"): Unit =
    graft.storage.AtomicDir.publish(pos.sparkSession, path,
      "classifier counts") { tmp =>
      classBatchCounts(pos, neg, textCol, batchKey)
        .coalesce(4).write.parquet(tmp)
    }

  /** Append one labeled batch's count partial under a replay-stable key. */
  def appendClassifierCounts(pos: DataFrame, neg: DataFrame,
      textCol: String, path: String, batchKey: String): Unit =
    classBatchCounts(pos, neg, textCol, batchKey)
      .coalesce(4).write.mode("append").parquet(path)

  /** Derive the serving [[ClassifierRef]] from an accumulated count
    * store: replay duplicates dropped, per-batch partials summed per
    * token, then the [[classifierTrain]] weight formula over the merged
    * totals — base + increments ≡ a one-shot train over the union
    * corpus. */
  def openClassifierCounts(spark: org.apache.spark.sql.SparkSession,
      path: String, scaleLog2: Int = 20): ClassifierRef = {
    val p = new org.apache.hadoop.fs.Path(path)
    graft.storage.AtomicDir.recover(
      p.getFileSystem(spark.sessionState.newHadoopConf()), p,
      "classifier counts")
    classifierFromVocab(
      spark.read.parquet(path)
        .dropDuplicates("tok", "batch_key")
        .groupBy("tok").agg(sum("cp").as("cp"), sum("cn").as("cn")),
      scaleLog2)
  }

  /** Fold accumulated per-batch count partials to one row per token —
    * the IO compaction that caps file-listing cost as labeled dumps pile
    * up, doubling as the durable replay repair (run with appends
    * quiesced — the rollup-store compaction rule). */
  def compactClassifierCounts(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    val live = new org.apache.hadoop.fs.Path(path)
    val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
    graft.pipeline.Similarity.recoverCompact(fs, live)
    graft.storage.AtomicDir.compactPublish(spark, path,
      "compact classifier counts") { tmp =>
      val key = s"compact-${java.util.UUID.randomUUID().toString.take(8)}"
      spark.read.parquet(path)
        .dropDuplicates("tok", "batch_key")
        .groupBy("tok").agg(sum("cp").as("cp"), sum("cn").as("cn"))
        .withColumn("batch_key", lit(key))
        .coalesce(4).write.parquet(tmp)
    }
  }
}
