package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => Fn}

/** BPE tokenizer tier of [[Text]]: greedy and batched training over the
  * word-count vocabulary, codegen and interpreted encode paths, tokenizer
  * artifacts at rest. Split from Text.scala round 12; `Text.<member>` call
  * sites are unchanged. */
private[pipeline] trait TextBpe { self: Text.type =>

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
      pinMode: String = graft.pipeline.Pipelines.PinLocal,
      maxMerges: Int = Int.MaxValue)
      : Seq[(String, String)] = {
    require(rounds >= 1 && rounds <= 4096,
      s"rounds out of range: $rounds")
    require(pairsPerRound >= 1 && pairsPerRound <= 64 &&
      candidatesPerRound >= pairsPerRound && candidatesPerRound <= 8192,
      s"bad batch shape: $pairsPerRound pairs from $candidatesPerRound " +
        "candidates")
    require(pinEvery >= 1, s"pinEvery must be positive: $pinEvery")
    require(maxMerges >= 1, s"maxMerges must be positive: $maxMerges")
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
      // maxMerges is an early-stop on the LEARNED count (a production
      // vocabulary targets a merge budget, not a round budget — the
      // per-round yield under the rank-window rule is corpus-dependent);
      // the list may finish up to pairsPerRound - 1 past the target in
      // the final round, so callers wanting an exact size take(maxMerges)
      while (r < rounds && !exhausted && learned.size < maxMerges) {
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
          // also gate on the merge budget: the final budget-crossing
          // round must not build+persist+count a re-segmented frame the
          // loop condition immediately discards (one full vocabulary
          // aggregation wasted per training run otherwise)
          if (r < rounds && learned.size < maxMerges) {
            // re-segment with ONLY this round's merges; materialize from
            // the still-persisted parent before releasing it so the next
            // round never recomputes the corpus pass
            val applied = picked.foldLeft(col("w")) { case (c, (a, b)) =>
              replace(c, lit(s" $a $b "), lit(s" $a$b "))
            }
            val next0 = seg.select(applied.as("w"), col("cnt"))
            // the eager count can throw mid-round (executor loss, OOM);
            // until the frame is assigned to seg/lastPin the finally
            // block below cannot see it, so release it HERE on the
            // failure path — no cache residue however training dies
            def countOrRelease(p: DataFrame): DataFrame =
              try { p.count(); p }
              catch { case t: Throwable => p.unpersist(); throw t }
            val next =
              if (r % pinEvery == 0) {
                val pinned = countOrRelease( // eager: truncate lineage NOW
                  graft.pipeline.Pipelines.pinFrame(next0, pinMode))
                if (lastPin != null) lastPin.unpersist()
                lastPin = pinned
                pinned
              } else countOrRelease(next0.persist())
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
  /** Above this merge count, [[bpeEncode]] switches from the codegen'd
    * [[bpeApply]] replace-chain Column (one expression node per merge —
    * analyzer/codegen-hostile past a few hundred, impossible at 32k) to
    * the interpreted vocabulary-level path: the SAME ordered-replace
    * algorithm run as one JVM pass per DISTINCT word, joined back to
    * the token occurrences. Production-vocabulary (32k-merge)
    * tokenizers encode through that path; the small-list Column path
    * keeps its plan (and its whole-stage codegen) untouched. */
  val BpeEncodeChainMax = 64

  /** The fixed base alphabet of [[tokens]]' output — the canonical
    * tokenizer lowercases and strips to `[a-z0-9]`, so a trained merge
    * list induces a COMPLETE token-id space from the artifact alone
    * (the GPT-2 bytes+merges posture, chars standing in for bytes):
    * `'0'..'9'` → ids 0-9, `'a'..'z'` → 10-35, merge k → 36 + k. No
    * out-of-vocabulary token can exist. */
  val BpeBaseAlphabet = "0123456789abcdefghijklmnopqrstuvwxyz"

  /** The interpreted twin of [[bpeApply]]: the identical ordered
    * left-to-right literal replaces (Java `String.replace` ==
    * `replace()`'s UTF8String semantics on this ASCII-space alphabet),
    * one word per call — byte-identical output, proven against the
    * Column chain in PipelineSpec across the threshold. */
  private def bpeApplyScala(merges: IndexedSeq[(String, String)])
      : String => String = {
    val from = merges.map { case (a, b) => s" $a $b " }
    val to = merges.map { case (a, b) => s" $a$b " }
    (w: String) => {
      var s = " " + w.flatMap(c => s"$c ")
      var i = 0
      while (i < from.length) { s = s.replace(from(i), to(i)); i += 1 }
      s
    }
  }

  /** The SCALE encode path: one rank-priority pass per word over a
    * broadcast merge-rank table, cost independent of vocabulary depth —
    * where the ordered-replace twin pays one full symbol-string scan PER
    * MERGE per word (5.99s for the probe corpus at 32k merges, SCALE.md
    * `bpe_train_32k` round 12 — a per-token constant that becomes THE
    * tokenizer bottleneck at 100 TB, since every training token flows
    * through encode exactly once).
    *
    * Correctness rests on a provable equivalence with the ordered
    * replace chain — for ANY merge list, not a new semantics. Let the
    * encoder repeatedly find the lowest rank STRICTLY ABOVE a cursor
    * whose pair is adjacent somewhere in the word, run one replace pass
    * of that rank, and advance the cursor to it. Induction: if both
    * executions share state S after cursor rank p, and r is the minimum
    * present rank > p in S, then ordered replace no-ops through every
    * rank in (p, r) — each was absent in S and no-ops don't change S —
    * and applies r's pass at exactly S. So the effective pass sequences
    * coincide, pass for pass, state for state; ranks the cursor skips
    * are precisely the ranks ordered replace would have no-opped, even
    * if their pair becomes adjacent LATER (ordered replace never
    * revisits either). A pair listed at several ranks keeps ALL its
    * ranks (the cursor picks the lowest one still above itself), which
    * is why trained lists that re-learn a pair — pass residue keeps a
    * merged pair's bigram countable, see below — replay exactly.
    *
    * The per-pass semantics replicate [[bpeApply]]'s literal string
    * replace EXACTLY, including its shared-separator quirk: a ` a b `
    * match consumes the trailing space, so the immediately following
    * pair in the same pass is ineligible (`abab` under (a,b) →
    * `[ab, a, b]`, not classic BPE's `[ab, ab]`) — and one pass per
    * rank, never a revisit, so pass residue stays unmerged exactly as
    * the replace chain leaves it until a higher-ranked duplicate fires.
    * Byte-equivalence against the replace chain and the interpreted
    * vocabulary-join twin is pinned in PipelineSpec across the
    * threshold, on duplicate-bearing trained lists, and on adversarial
    * out-of-order lists. */
  private[graft] final class BpeRankEncoder(
      lhs: Array[String], rhs: Array[String]) extends Serializable {
    /** pair → ALL its ranks, ascending; built lazily PER EXECUTOR from
      * the two broadcast string arrays (a prebuilt map would serialize
      * per-reference; the arrays ship once via the broadcast). */
    @transient private lazy val ranks
        : java.util.HashMap[String, Array[Int]] = {
      val m = new java.util.HashMap[String, Array[Int]](lhs.length * 2)
      var i = 0
      while (i < lhs.length) {
        // ascending i keeps each array sorted without a sort
        m.merge(lhs(i) + " " + rhs(i), Array(i), (a, b) => a ++ b)
        i += 1
      }
      m
    }
    /** symbol string → token id, determined by the ARTIFACT alone (the
      * GPT-2 bytes+merges posture): [[BpeBaseAlphabet]] chars take ids
      * 0-35, merge k's output takes 36 + k; when a duplicate listing
      * re-creates a string the FIRST rank wins (putIfAbsent). Every
      * piece a segmentation can emit is in here: single chars are
      * alphabet members ([[tokens]] strips to [a-z0-9]), multi-char
      * pieces only arise as some merge's lhs+rhs. */
    @transient private lazy val vocabIds
        : java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](lhs.length * 2 + 64)
      var i = 0
      while (i < BpeBaseAlphabet.length) {
        m.put(String.valueOf(BpeBaseAlphabet.charAt(i)),
          Integer.valueOf(i))
        i += 1
      }
      i = 0
      while (i < lhs.length) {
        m.putIfAbsent(lhs(i) + rhs(i),
          Integer.valueOf(BpeBaseAlphabet.length + i))
        i += 1
      }
      m
    }
    /** Per-executor word → piece-count / token-id memos (the
      * distinct-word saving the old vocabulary join bought, without its
      * shuffle); bounded so an adversarial unique-word corpus cannot
      * grow them without limit. */
    @transient private lazy val memo =
      new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @transient private lazy val idsMemo =
      new java.util.concurrent.ConcurrentHashMap[String, Array[Int]]()
    private val MemoCap = 1 << 20

    def pieceCount(word: String): Int = {
      val hit = memo.get(word)
      if (hit != null) hit.intValue()
      else {
        val syms = segment(word)
        val n = syms.length
        if (memo.size < MemoCap) memo.put(word, Integer.valueOf(n))
        n
      }
    }

    /** The word's token-id sequence under the induced vocabulary. */
    def tokenIds(word: String): Array[Int] = {
      val hit = idsMemo.get(word)
      if (hit != null) hit
      else {
        val syms = segment(word)
        val ids = new Array[Int](syms.length)
        var i = 0
        while (i < syms.length) {
          // never null: chars are alphabet members, multi-char pieces
          // are some merge's output (vocabIds scaladoc)
          ids(i) = vocabIds.get(syms(i)).intValue()
          i += 1
        }
        if (idsMemo.size < MemoCap) idsMemo.put(word, ids)
        ids
      }
    }

    /** The final symbol sequence — the shared core of [[pieceCount]]
      * and [[tokenIds]]. */
    private def segment(word: String): Array[String] = {
      var n = word.length
      if (n == 0) return Array.empty
      if (n == 1) return Array(word)
      val syms = new Array[String](n)
      var i = 0
      while (i < n) { syms(i) = String.valueOf(word.charAt(i)); i += 1 }
      // strictly-increasing rank cursor: residue of an applied rank
      // (the shared-separator skip can leave the pair adjacent) must
      // not re-fire AT THAT RANK — ordered replace runs each listed
      // merge once; a duplicate listing of the pair at a higher rank
      // is a separate pass and fires from its own rank
      var last = -1
      var done = false
      while (!done && n > 1) {
        var best = Int.MaxValue
        i = 0
        while (i < n - 1) {
          val rs = ranks.get(syms(i) + " " + syms(i + 1))
          if (rs != null) {
            // lowest listed rank above the cursor (arrays are tiny —
            // almost always length 1)
            var j = 0
            while (j < rs.length && rs(j) <= last) j += 1
            if (j < rs.length && rs(j) < best) best = rs(j)
          }
          i += 1
        }
        if (best == Int.MaxValue) done = true
        else {
          val a = lhs(best); val b = rhs(best); val ab = a + b
          var w = 0
          i = 0
          while (i < n) {
            if (i + 1 < n && syms(i) == a && syms(i + 1) == b) {
              syms(w) = ab; w += 1; i += 2
              // the match consumed the next pair's leading separator:
              // copy one symbol verbatim before rescanning (the ` a b `
              // → ` ab ` left-to-right literal-replace semantics)
              if (i < n) { syms(w) = syms(i); w += 1; i += 1 }
            } else { syms(w) = syms(i); w += 1; i += 1 }
          }
          n = w
          last = best
        }
      }
      java.util.Arrays.copyOf(syms, n)
    }
  }

  def bpeEncode(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame =
    bpeEncodeVia(df, idCol, textCol, merges,
      if (merges.size <= BpeEncodeChainMax) "chain" else "rank")

  /** [[bpeEncode]] with the path pinned — `chain` (codegen replace
    * chain, small lists only), `rank` (broadcast rank-priority encoder,
    * the production-vocabulary scale path — equivalent to the chain for
    * ANY list, [[BpeRankEncoder]] scaladoc), `join` (interpreted
    * ordered-replace over the distinct-word vocabulary, joined back —
    * the depth-proportional round-12 path, kept as the equivalence
    * spec's second witness and the probe's cost comparison). Exposed so
    * the spec and the scale probe can price the paths against each
    * other; [[bpeEncode]] picks automatically. */
  private[graft] def bpeEncodeVia(df: DataFrame, idCol: String,
      textCol: String, merges: Seq[(String, String)],
      path: String): DataFrame = {
    val toks = fanOut(df)
      .select(col(idCol), explode(tokens(col(textCol))).as("w"))
    val withN = path match {
      case "chain" =>
        toks.withColumn("__n",
          size(split(trim(bpeApply(col("w"), merges)), " ")))
      case "rank" =>
        // ONE narrow pass over the occurrences: the merge table rides a
        // broadcast (two string arrays, ~1 MB at 32k), the rank map and
        // word memo build once per executor — no distinct, no join, no
        // shuffle before the per-doc aggregate, and per-word cost that
        // does not grow with vocabulary depth
        val bc = df.sparkSession.sparkContext.broadcast(
          new BpeRankEncoder(
            merges.view.map(_._1).toArray, merges.view.map(_._2).toArray))
        val nUdf = udf((w: String) => bc.value.pieceCount(w))
        toks.withColumn("__n", nUdf(col("w")))
      case "join" =>
        // the round-12 big-list shape: segment each DISTINCT word once
        // (the vocabulary is tokenizer-metadata-scale next to the
        // corpus), then join the per-word piece count back to the
        // occurrences — the trained-classifier tier's explode+vocab-join
        // shape; AQE broadcasts the vocab side when it fits. Per-word
        // cost grows with vocabulary DEPTH (one full scan per merge),
        // which is why `rank` replaced it as the automatic path
        val applyM = bpeApplyScala(merges.toIndexedSeq)
        val nUdf = udf((w: String) =>
          applyM(w).trim.split(" ").length)
        val vocab = toks.select("w").distinct()
          .withColumn("__n", nUdf(col("w")))
        toks.join(vocab, "w")
      case other => throw new IllegalArgumentException(
        s"unknown bpe encode path '$other' (chain | rank | join)")
    }
    withN
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"),
        sum(col("__n").cast("long")).as("n_bpe"))
  }

  /** BPE TOKENIZE: the per-doc TOKEN-ID SEQUENCE under a trained merge
    * list — what a training pipeline actually emits per document (where
    * [[bpeEncode]] prices documents, this one produces them). Ids come
    * from the artifact-induced vocabulary ([[BpeBaseAlphabet]] chars
    * 0-35, merge k → 36 + k, first listing wins on duplicates), so the
    * same frozen tokenizer yields the same ids on every engine and
    * every run — the packing/mixture reproducibility contract extended
    * to the id level. Output: (`idCol`, `ids` array — words in document
    * order, each word's pieces in order — and `n_bpe = size(ids)`,
    * byte-consistent with [[bpeEncode]]). Documents with no tokens are
    * absent, exactly as in [[bpeEncode]].
    *
    * Scale shape: one narrow pass per occurrence through the broadcast
    * [[BpeRankEncoder]] (depth-flat, memoized per executor — any list
    * size, no threshold: the rank path is byte-equivalent to the chain
    * everywhere), then ONE per-doc aggregation that reassembles word
    * order via the posexplode index — no window, no second shuffle. */
  def bpeTokenize(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(
      new BpeRankEncoder(
        merges.view.map(_._1).toArray, merges.view.map(_._2).toArray))
    val idsUdf = udf((w: String) => bc.value.tokenIds(w))
    fanOut(df)
      .select(col(idCol),
        posexplode(tokens(col(textCol))).as(Seq("__p", "__w")))
      .withColumn("__ids", idsUdf(col("__w")))
      .groupBy(idCol)
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("__p").as("p"),
          col("__ids").as("ids")))),
        x => x.getField("ids"))).as("ids"))
      .withColumn("n_bpe", size(col("ids")).cast("long"))
  }

  // --- DSIR-style importance resampling -----------------------------------

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
}
