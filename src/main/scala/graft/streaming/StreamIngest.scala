package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured-Streaming ingest: the streaming analog of the reference's
  * buffered push + periodic persist (`store/writable_store/persistence.rs`),
  * re-expressed as `readStream → transform → writeStream`.
  *
  * `ts` stays epoch-nano long in the data; watermarking needs a real
  * timestamp, so a derived µs `__event_time` column drives
  * watermark/windows while the payload keeps full ns fidelity.
  */
object StreamIngest {

  /** Static-side index frames persisted by the streaming near-dup builders,
    * keyed by the stream frame each call returned — so a caller can release
    * exactly those cached blocks when its query stops, instead of
    * `spark.catalog.clearCache()` which drops unrelated caches too.
    * Keys are weak (DataFrame has identity equals/hashCode): a caller that
    * simply drops the returned frame loses the registry entry with it, so
    * ContextCleaner's GC-driven unpersist keeps working and the map cannot
    * grow without bound across many builder calls. The index frames don't
    * reference the output frame, so an entry never pins its own key. */
  private val indexCaches = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[DataFrame, Seq[DataFrame]]())

  private def registerIndex(out: DataFrame, idx: DataFrame*): DataFrame = {
    indexCaches.put(out, idx.toSeq)
    out
  }

  /** Unpersist the static index frames backing `out` (a frame returned by
    * [[streamingNearDup]] or [[streamingEmbedNearDup]]). Call after the
    * query consuming `out` stops; no-op for frames without a registered
    * index. */
  def releaseIndex(out: DataFrame): Unit =
    Option(indexCaches.remove(out)).getOrElse(Nil)
      .foreach(_.unpersist(blocking = false))

  /** File-source stream over a directory of Parquet drops (a "WAL directory"
    * shape: producers drop sorted files, the stream folds them in). */
  def fromParquetDir(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  def withEventTime(df: DataFrame, tsCol: String = "ts"): DataFrame =
    // integer FLOOR div, NOT `/`: long/long division goes through double,
    // and epoch-ns magnitudes (~1.7e18) round to the nearest 256 ns before
    // dividing — the truncated µs could come out one low, skewing the
    // watermark and window bucketing off the exact arithmetic the oracles
    // use. Floor (not `div`'s truncate-toward-zero) so a pre-epoch ns
    // timestamp maps to the µs at-or-before it, like Math.floorDiv.
    df.withColumn("__event_time",
      timestamp_micros(expr(graft.operators.TsOps.floorDivSql(s"`$tsCol`", 1000L))))

  /** Watermarked fixed-window downsample — the streaming rollup: late data
    * beyond `lateness` dropped, append-mode emission on window close. */
  def windowedDownsample(df: DataFrame, valueCol: String,
      windowDur: String = "1 minute", lateness: String = "5 minutes")
      : DataFrame = {
    withEventTime(df)
      .withWatermark("__event_time", lateness)
      .groupBy(window(col("__event_time"), windowDur))
      .agg(count(lit(1)).as("n"), min(valueCol).as("min_v"),
        max(valueCol).as("max_v"), sum(valueCol).as("sum_v"))
      .select(
        unix_micros(col("window.start")).as("bucket_start_us"),
        col("n"), col("min_v"), col("max_v"), col("sum_v"))
  }

  /** Streaming exact dedup for a document stream: normalized-content
    * fingerprint + `dropDuplicatesWithinWatermark` — the continuous-ingest
    * analog of [[graft.pipeline.Dedup.exact]]. State holds one fingerprint
    * per distinct document seen within the watermark horizon, then ages
    * out: `lateness` is the dedup window at scale (a duplicate arriving
    * later than that re-emits — the standard bounded-state trade; widen
    * the horizon to widen the guarantee). `eventTimeCol` is an epoch-nano
    * long, as everywhere in the engine.
    */
  def streamingDedup(df: DataFrame, textCol: String,
      eventTimeCol: String, lateness: String): DataFrame =
    withEventTime(df, eventTimeCol)
      .withColumn("fp", graft.pipeline.Text.fingerprint(col(textCol)))
      .withWatermark("__event_time", lateness)
      .dropDuplicatesWithinWatermark("fp")

  /** Input row for [[statefulSessionize]]: ns event time + key + value.
    * Carries the derived µs event-time column too — the watermark attribute
    * must flow into the stateful operator for EventTimeTimeout. */
  final case class SessEvent(user_id: Long, ts: Long, value: Double,
      __event_time: java.sql.Timestamp)

  /** Open-session state carried between micro-batches. */
  final case class SessState(start: Long, last: Long, n: Long, sum: Double)

  final case class SessionOut(user_id: Long, session_start: Long,
      session_end: Long, n_events: Long, sum_v: Double)

  /** Streaming gap-sessionization with custom state
    * (`flatMapGroupsWithState`): per user, events extend the open session
    * while gaps stay <= `gapNanos`; a larger gap (or event-time timeout
    * once the watermark passes last+gap) closes and emits the session.
    *
    * State is one [[SessState]] per active user — bounded by active-key
    * cardinality, evicted via timeouts; the batch analog is
    * `TsOps.sessionize`.
    */
  def statefulSessionize(df: DataFrame, gapNanos: Long,
      lateness: String = "10 minutes"): Dataset[SessionOut] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = df.sparkSession
    import spark.implicits._
    val withTime = withEventTime(df.select("user_id", "ts", "value"))
    val ds = withTime.withWatermark("__event_time", lateness)
      .select(col("user_id"), col("ts"), col("value"), col("__event_time"))
      .as[SessEvent]

    def fn(userId: Long, events: Iterator[SessEvent],
        state: GroupState[SessState]): Iterator[SessionOut] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
      var cur = state.getOption
      if (state.hasTimedOut) {
        cur.foreach(s =>
          out += SessionOut(userId, s.start, s.last, s.n, s.sum))
        state.remove()
      } else {
        for (e <- events.toSeq.sortBy(_.ts)) {
          cur match {
            case Some(s) if e.ts - s.last <= gapNanos =>
              cur = Some(SessState(s.start, math.max(s.last, e.ts),
                s.n + 1, s.sum + e.value))
            case Some(s) =>
              out += SessionOut(userId, s.start, s.last, s.n, s.sum)
              cur = Some(SessState(e.ts, e.ts, 1L, e.value))
            case None =>
              cur = Some(SessState(e.ts, e.ts, 1L, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          // close once the watermark passes the session gap. The clamp
          // mirrors streamingAsof's: Spark admits late events under the
          // PREVIOUS batch's watermark but validates timeout timestamps
          // against the CURRENT one, so a late-but-admitted event whose
          // gap-close time already passed would otherwise throw and kill
          // the query — clamped, the (closable) session fires at the
          // next timeout sweep instead
          state.setTimeoutTimestamp(math.max(
            (s.last + gapNanos) / 1000000L + 1L,
            state.getCurrentWatermarkMs() + 1L))
        }
      }
      out.iterator
    }

    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Input row for [[streamingAsof]]: ns event time + key + payload; `side`
    * is 1 for left (enrich-me) rows, 0 for right (reference) rows. */
  final case class AsofIn(user_id: Long, ts: Long, event_id: Long,
      value: Double, side: Int, __event_time: java.sql.Timestamp)

  final case class AsofRight(ts: Long, value: Double)
  final case class AsofPending(event_id: Long, ts: Long, value: Double)

  /** Per-key state for [[streamingAsof]]: lefts not yet watermark-complete,
    * rights at-or-above the emit horizon, and `carry` — the single latest
    * right BELOW the horizon (every earlier right is dominated for any
    * still-possible left, so the below-horizon tail collapses to one row;
    * that collapse is what bounds the state). */
  final case class AsofJoinState(pending: List[AsofPending],
      rights: List[AsofRight], carry: Option[AsofRight])

  final case class AsofOut(event_id: Long, user_id: Long, ts: Long,
      value: Double, r_ts: Option[Long], r_value: Option[Double])

  /** Streaming as-of join over a single interleaved event stream: each
    * non-late `leftType` row is emitted exactly once, enriched with the
    * latest `rightType` row of the same user at-or-before its ts — the
    * streaming analog of [[graft.operators.TsOps.asofJoin]].
    *
    * Emission is watermark-gated: a left emits only when the watermark
    * strictly passes its event-time ms, at which point any right that could
    * still match it (ts <= left.ts) has either been ingested or dropped as
    * late — so the emitted subset equals the batch as-of join restricted to
    * watermark-complete lefts, PROVIDED no left itself arrived late (a
    * late left cannot be matched correctly — the right history at-or-below
    * its ts has already collapsed — so it is dropped like any late row;
    * widen `lateness` to widen that guarantee). State per key is bounded:
    * pendings and rights live only inside the watermark horizon, and the
    * below-horizon right history collapses to the one `carry` row (which
    * persists per active key, like a session state).
    *
    * The watermark is driven by the joined types only (the type filter
    * precedes the watermark node; Catalyst would push it there regardless),
    * and — because Spark does NOT late-filter flatMapGroupsWithState input
    * the way it does aggregations — rows below the watermark are dropped
    * explicitly at ingest, which is what makes emitted matches final.
    */
  def streamingAsof(df: DataFrame, leftType: String, rightType: String,
      lateness: String = "10 minutes"): Dataset[AsofOut] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = df.sparkSession
    import spark.implicits._
    val ds = withEventTime(df.filter(col("event_type").isin(leftType, rightType)))
      .withWatermark("__event_time", lateness)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"),
        when(col("event_type") === leftType, 1).otherwise(0).as("side"),
        col("__event_time"))
      .as[AsofIn]

    def fn(userId: Long, events: Iterator[AsofIn],
        state: GroupState[AsofJoinState]): Iterator[AsofOut] = {
      val wm = state.getCurrentWatermarkMs()
      var st = state.getOption.getOrElse(AsofJoinState(Nil, Nil, None))
      if (!state.hasTimedOut) {
        // drop late rows (below the watermark) ourselves: emitted matches
        // are only final if no already-emittable right can still arrive
        events.filter(_.ts / 1000000L >= wm).foreach { e =>
          if (e.side == 1)
            st = st.copy(pending = AsofPending(e.event_id, e.ts, e.value) :: st.pending)
          else st = st.copy(rights = AsofRight(e.ts, e.value) :: st.rights)
        }
      }
      // emit lefts strictly below the watermark: anything that could still
      // arrive has event time >= wm ms, hence ts > any emitted left's ts
      val (emit, keep) = st.pending.partition(_.ts / 1000000L < wm)
      val rightsSorted = (st.carry.toList ++ st.rights).sortBy(_.ts).toArray
      val out = scala.collection.mutable.ArrayBuffer.empty[AsofOut]
      var i = 0
      var best: AsofRight = null
      emit.sortBy(_.ts).foreach { l =>
        while (i < rightsSorted.length && rightsSorted(i).ts <= l.ts) {
          best = rightsSorted(i); i += 1
        }
        out += AsofOut(l.event_id, userId, l.ts, l.value,
          Option(best).map(_.ts), Option(best).map(_.value))
      }
      // collapse rights below the horizon to the single latest one: every
      // remaining or future left has ts >= wm ms, so only the max survives
      val (old, fresh) = rightsSorted.partition(_.ts / 1000000L < wm)
      val carry = old.lastOption
      if (keep.isEmpty && fresh.isEmpty && carry.isEmpty) state.remove()
      else {
        state.update(AsofJoinState(keep, fresh.toList, carry))
        if (keep.nonEmpty) {
          // fire once the watermark strictly passes the earliest pending
          // left (timeouts fire iff timeout_ts < watermark); must also be
          // strictly above the current watermark or Spark rejects it.
          // When the earliest left sits exactly AT the watermark the +1
          // loses a 1 ms window (final watermark landing exactly at
          // ts_ms+1 would not fire) — inherent to Spark's strict timeout
          // inequality, and unreachable in practice
          val t = math.max(keep.map(_.ts / 1000000L).min, wm + 1L)
          state.setTimeoutTimestamp(t)
        } else {
          // no pending left needs a wake-up, but a previously-armed (now
          // stale, already-fired) timestamp would otherwise persist in the
          // state store and re-fire a no-op invocation every batch — park
          // it far ahead; new data re-arms the real one
          state.setTimeoutTimestamp(wm + 100L * 365 * 86400 * 1000)
        }
      }
      out.iterator
    }

    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Streaming int8 quantization: map each embedding batch through
    * [[graft.pipeline.Similarity.quantizeInt8]] — stateless, so it needs no
    * watermark and emits every row; compose with [[persistStream]] for a
    * continuously-built quantized corpus (4× scan bandwidth at rest). The
    * arithmetic is the exact batch quantizer, so the batch value oracle
    * applies to the streamed output unchanged. */
  def quantizedIngest(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol),
        graft.pipeline.Similarity.quantizeInt8(col(vecCol)).as("qs"))
      .select(col(idCol), col("qs.q").as("q"), col("qs.max_abs").as("max_abs"))

  /** Streaming benchmark-contamination probe: flag incoming documents that
    * share word n-gram shingles with a static eval corpus — the
    * decontamination gate an incremental-ingest pipeline runs before a doc
    * reaches the training set. The eval shingle set is index metadata (a
    * benchmark suite is bounded by contract), so it embeds in the plan as a
    * literal array and the probe is a STATELESS narrow map
    * (`array_intersect` against each doc's shingle set): no watermark, no
    * state store, no stream-side shuffle — per-batch work proportional to
    * batch size alone at any corpus scale. Same output contract as the
    * batch [[graft.pipeline.Dedup.contamination]], whose oracle it shares
    * when the streamed corpus is the train side.
    */
  def streamingContamination(stream: DataFrame, evalDf: DataFrame,
      idCol: String, textCol: String, shingleSize: Int = 3): DataFrame = {
    import graft.pipeline.Text
    val evalSh: Set[String] = evalDf
      .select(explode(Text.shingleSetUdf(shingleSize)(col(textCol))).as("t"))
      .distinct().collect().map(_.getString(0)).toSet
    // probe via a UDF closing over ONE prebuilt hash set: Catalyst's
    // ArrayIntersect against a literal would rebuild the eval-set hash
    // per ROW — O(|eval|) each — where this pays O(|doc shingles|)
    val hits = udf((set: Seq[String]) =>
      if (set == null) 0L else set.count(evalSh.contains).toLong)
    stream
      .select(col(idCol),
        Text.shingleSetUdf(shingleSize)(col(textCol)).as("__set"))
      .withColumn("n_shingles", size(col("__set")).cast("long"))
      .withColumn("n_hits", hits(col("__set")))
      .filter(col("n_hits") > 0)
      .select(col(idCol), col("n_shingles"), col("n_hits"),
        (col("n_hits").cast("double") / col("n_shingles"))
          .as("contamination"))
  }

  /** Stream-maintained dup-gram index: each micro-batch appends its gram
    * counts to the at-rest maintenance index under a replay-stable key —
    * the [[rollupIngest]] discipline applied to
    * [[graft.pipeline.Text.appendDupGramIndex]]. State is ZERO (the
    * index on disk is the accumulator); a replayed batch collapses in
    * the (gram, batch_key) dedup instead of double-counting, so the
    * serving set over base + streamed dumps equals a one-shot mine of
    * everything ingested. Same compaction rule as every at-rest
    * accumulator: quiesce the stream before
    * [[graft.pipeline.Text.compactDupGramIndex]]. */
  def dupGramIngest(stream: DataFrame, path: String, checkpointDir: String,
      idCol: String = "doc_id", textCol: String = "text", k: Int = 8,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    // span-length validation ONCE at stream start (the rollupIngest
    // rationale: the probe scans every accumulated partial file)
    graft.pipeline.Text.requireIndexK(stream.sparkSession, path, k)
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.pipeline.Text.appendDupGramIndex(batch, path,
          sketchBatchKey(checkpointDir, batchId), idCol, textCol, k,
          validateK = false)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }

  /** Streaming duplicated-span coverage against an AT-REST dup-gram
    * index — the ingest-side twin of
    * [[graft.pipeline.Text.dupSpanCoverageStored]]: each micro-batch
    * probes the serving index with the SAME distributed scoring join the
    * at-rest path uses (explode windows → join on the gram → per-doc
    * island merge) and appends scored rows to the sink under a
    * replay-stable batch key. The duplicated-gram set is DATA-DERIVED
    * and corpus-proportional — at 100 TB it is billions of grams — so it
    * can never be a driver-collected UDF closure; the index stays a
    * distributed frame and the join broadcasts only when the index is
    * measurably small ([[sizeGatedIndex]]), falling back to a shuffle
    * join past the gate. State is ZERO (the index is at rest, the sink
    * is the accumulator); a replayed batch lands duplicate
    * (id, batch_key) rows a reader drops, the rollup-store discipline.
    *
    * Sink schema: the batch operator's columns plus `batch_key`. */
  def streamingDupSpans(stream: DataFrame, index: DataFrame,
      sinkPath: String, checkpointDir: String, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 8,
      broadcastRowCap: Long = 4000000L,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val idx = sizeGatedIndex(index, broadcastRowCap)
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.pipeline.Text.dupSpanCoverageStored(batch, idCol, textCol,
            idx, k)
          .withColumn("batch_key",
            lit(sketchBatchKey(checkpointDir, batchId)))
          .write.mode("append").parquet(sinkPath)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }

  /** [[streamingDupSpans]] plus the EXCISION transform — the ingest-side
    * twin of [[graft.pipeline.Text.exciseDupSpansStored]]: covered
    * tokens leave, survivors rejoin in order over the canonical token
    * stream, per micro-batch through the same index-probing join (same
    * shared batch oracle, same replay-keyed sink discipline). */
  def streamingExciseSpans(stream: DataFrame, index: DataFrame,
      sinkPath: String, checkpointDir: String, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 8,
      broadcastRowCap: Long = 4000000L,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val idx = sizeGatedIndex(index, broadcastRowCap)
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.pipeline.Text.exciseDupSpansStored(batch, idCol, textCol,
            idx, k)
          .withColumn("batch_key",
            lit(sketchBatchKey(checkpointDir, batchId)))
          .write.mode("append").parquet(sinkPath)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }

  /** The broadcast-or-shuffle gate a long-lived index probe needs: ONE
    * count of the index at stream start (a scan of the KB-to-GB index,
    * never the corpus) decides whether every micro-batch's scoring join
    * broadcasts it or shuffles on the gram key. A guessed broadcast of a
    * grown index would OOM every executor; an unconditional shuffle
    * would tax every small-index stream — measure once, then let each
    * batch plan against the decided shape. */
  private def sizeGatedIndex(index: DataFrame, broadcastRowCap: Long)
      : DataFrame =
    if (index.count() <= broadcastRowCap) broadcast(index) else index

  /** Streaming boilerplate removal against a static corpus — the
    * ingest-side twin of [[graft.pipeline.Text.removeBoilerplate]]: the
    * repeated-span fingerprints are mined ONCE from the static corpus
    * (bounded: only spans with df ≥ `minDf` — the boilerplate set, tiny
    * relative to the corpus) and each arriving doc is chunked, probed,
    * and reassembled entirely within its own row — a stateless narrow
    * map, so the query runs in append mode with no state store and the
    * emitted rows are exactly the batch result (shared value oracle).
    *
    * The probe is a UDF closing over ONE prebuilt hash set (the
    * [[streamingContamination]] rationale: per-row cost is O(doc
    * chunks), not O(boilerplate set)); its JVM md5 hex matches Spark's
    * `md5()` on UTF-8 bytes, so stream and batch agree on every
    * fingerprint.
    */
  def streamingRemoveBoilerplate(stream: DataFrame, staticDf: DataFrame,
      idCol: String, textCol: String, size: Int = 16,
      minDf: Long = 3): DataFrame = {
    // the batch twin's guard, mirrored: minDf < 2 marks EVERY distinct
    // span as boilerplate and silently empties the whole stream
    require(minDf >= 2, s"minDf=$minDf would drop every span")
    import graft.pipeline.Text
    val boiler: Set[String] = Text.boilerplateSpans(staticDf, idCol,
        textCol, size, minDf)
      .select("fp").collect().map(_.getString(0)).toSet
    val clean = udf((chunks: Seq[String]) => {
      val md = java.security.MessageDigest.getInstance("MD5")
      def hex(s: String): String =
        md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val cs = if (chunks == null) Seq.empty[String] else chunks
      val flags = cs.map(c => boiler.contains(hex(c)))
      (cs.zip(flags).collect { case (c, false) => c }.mkString(" "),
        cs.size.toLong, flags.count(identity).toLong)
    })
    val toks = Text.tokens(col(textCol))
    // `size` param shadows functions.size here; the coalesce mirrors
    // Text.chunk — a null-text doc's NULL token array must not slip the
    // n===0 guard and emit a phantom empty chunk (stream==batch parity)
    val n = coalesce(
      org.apache.spark.sql.functions.size(col("__toks")), lit(0))
    val nc = when(n === 0, lit(0))
      .otherwise(greatest(lit(1), ((n + size - 1) / size).cast("int")))
    stream
      .withColumn("__toks", toks)
      .withColumn("__chunks", transform(
        when(nc > 0, sequence(lit(0), nc - 1))
          .otherwise(array().cast("array<int>")),
        i => concat_ws(" ",
          slice(col("__toks"), i * size + 1, lit(size)))))
      .withColumn("__r", clean(col("__chunks")))
      .select(col(idCol), col("__r._1").as("text_clean"),
        col("__r._2").as("n_chunks"), col("__r._3").as("n_dropped"))
  }

  /** Streaming length trim against a static corpus's percentile band —
    * the ingest-side twin of [[graft.pipeline.Text.lengthTrimPct]]: the
    * kept (group, length) band is mined once from the static corpus
    * (metadata-sized) and each arriving row passes or drops via a
    * stream-static broadcast SEMI join — stateless, append mode, no
    * state store. When the streamed corpus IS the static corpus the
    * admitted set equals the batch trim exactly (shared oracle).
    */
  def streamingLengthTrim(stream: DataFrame, staticDf: DataFrame,
      lenCol: String, groupCol: String, loPct: Int = 5,
      hiPct: Int = 95): DataFrame = {
    val band = graft.pipeline.Text.lengthBand(
      staticDf, lenCol, groupCol, loPct, hiPct)
    stream.join(broadcast(band), Seq(groupCol, lenCol), "left_semi")
  }

  /** Streaming near-duplicate detection against a static reference corpus —
    * the incremental-ingest dedup shape: incoming documents are LSH-probed
    * into a prebuilt band-bucket index of the existing training set, and
    * only bucket-colliding candidates get the exact capped-vocabulary
    * Jaccard verify. Everything on the stream side is a stateless narrow
    * map (shingle set → md5 minhash signature → band keys) except one
    * `dropDuplicatesWithinWatermark` that collapses multi-band hits of the
    * same pair; candidate lookup and verify are stream-static joins
    * (broadcastable index, no stream-stream state).
    *
    * Emits one (id1, id2, shared, n1, n2, jaccard) row per detected pair
    * with jaccard >= `threshold`, ids ordered. When the streamed corpus IS
    * the reference corpus, the emitted set equals the batch
    * [[graft.pipeline.Dedup.nearDuplicates]] md5 pipeline — which is what
    * the driver oracle pins.
    *
    * At 100 TB: the reference index is (docs × bands) small keys + the
    * capped shingle sets; both partition by their join keys, and stream
    * work stays proportional to incoming volume, not corpus size.
    */
  def streamingNearDup(stream: DataFrame, ref: DataFrame, idCol: String,
      textCol: String, eventTimeCol: String, lateness: String,
      threshold: Double, bands: Int = 16, rowsPerBand: Int = 4,
      shingleSize: Int = 3,
      maxShingleDf: Int = graft.pipeline.Dedup.DefaultMaxShingleDf): DataFrame = {
    import graft.pipeline.{Dedup, Text}
    // the ref corpus's stop-shingle list, embedded as a literal: tiny by
    // the df-cap contract (boilerplate only), it is index metadata — the
    // incoming doc's verify vocabulary must be capped by the SAME list
    val stop: Seq[String] =
      if (maxShingleDf <= 0) Seq.empty
      else Dedup.stopShingles(ref, idCol, textCol, shingleSize, maxShingleDf)
        .collect().headOption
        .map(_.getSeq[String](0)).getOrElse(Seq.empty)
    val stopLit =
      if (stop.isEmpty) array().cast("array<string>")
      else array(stop.map(lit): _*)
    // the static index: ONE shingle pass over the reference corpus feeds
    // both the band keys and the capped verify sets (the collected stop
    // list caps in-plan), and both frames persist — stream-static joins
    // re-evaluate the static plan every micro-batch otherwise, making
    // per-batch work proportional to corpus size instead of batch size
    val refSets = ref.select(col(idCol).as("__rid"),
        Text.shingleSetUdf(shingleSize)(col(textCol)).as("__rset"))
      .persist() // the shared shingle pass itself — without this pin the
      // two derived frames below would each re-shingle the full corpus
      // on their first materialization
    val refKeys = Dedup.md5BandKeysFromSets(refSets, "__rid", "__rset",
        bands, rowsPerBand)
      .select(col("__rid"), col("band"), col("bucket")).persist()
    val refKept = refSets
      .withColumn("__rk", array_except(col("__rset"), stopLit))
      .select(col("__rid"), col("__rk"), size(col("__rk")).cast("long").as("__rn"))
      .persist()
    // stream side: stateless shingle set + band keys, watermark carried
    val ss = withEventTime(stream, eventTimeCol)
      .withWatermark("__event_time", lateness)
      .select(col("__event_time"), col(idCol),
        Text.shingleSetUdf(shingleSize)(col(textCol)).as("__sset"))
    val sk = Dedup.md5BandKeysFromSets(ss, idCol, "__sset", bands,
      rowsPerBand, extraCols = Seq("__event_time"))
    // dedup on the SORTED pair: collapses multi-band hits, and — when the
    // streamed corpus overlaps the reference — the two probe directions of
    // the same pair (verify is symmetric, either representative is valid)
    val cand = sk.join(refKeys, Seq("band", "bucket"))
      .filter(col(idCol) =!= col("__rid"))
      .select(col("__event_time"), col(idCol).as("__sid"), col("__sset"),
        col("__rid"),
        least(col(idCol), col("__rid")).as("__p1"),
        greatest(col(idCol), col("__rid")).as("__p2"))
      .dropDuplicatesWithinWatermark("__p1", "__p2")
    // verify: stream doc's capped set vs the ref doc's capped set — the
    // ref side resolves via one stream-static join on the candidate id.
    // An all-boilerplate pair (both capped sets empty) has an undefined
    // jaccard and is filtered BEFORE the division — under ANSI mode the
    // 0/0 would otherwise kill the query; the batch pipeline can never
    // emit such a pair (its verify join requires a shared kept shingle)
    val sidLtRid = col("__sid") < col("__rid")
    registerIndex(cand.join(refKept, Seq("__rid"))
      .withColumn("__sk", array_except(col("__sset"), stopLit))
      .withColumn("__sn", size(col("__sk")).cast("long"))
      .withColumn("shared",
        size(array_intersect(col("__sk"), col("__rk"))).cast("long"))
      .filter(col("__sn") + col("__rn") - col("shared") > 0)
      .withColumn("jaccard", col("shared").cast("double") /
        (col("__sn") + col("__rn") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select(
        col("__p1").as("id1"),
        col("__p2").as("id2"),
        col("shared"),
        when(sidLtRid, col("__sn")).otherwise(col("__rn")).as("n1"),
        when(sidLtRid, col("__rn")).otherwise(col("__sn")).as("n2"),
        col("jaccard")), refKeys, refKept, refSets)
  }

  /** Streaming embedding-quality gate — the ingest side of
    * [[graft.pipeline.Similarity.embeddingOutliers]]: flag incoming
    * vectors whose best cosine to EVERY centroid stays under
    * `threshold`, before they pollute cells or clusters. Fully stateless
    * and join-free: the k×dims centroid matrix rides a broadcast into
    * one UDF that computes the argmax per row (ascending-cid iteration
    * with a strict improvement test = the batch window's
    * (cos DESC, cid ASC) tie-break), using the SAME accumulation-order
    * cosine as the codegen expression — so a drained stream emits
    * exactly the batch outlier set. Per-row cost is k dot products;
    * nothing shuffles.
    */
  def streamingEmbedOutliers(stream: DataFrame, centroids: DataFrame,
      threshold: Double, idCol: String = "vec_id",
      vecCol: String = "embedding", cidCol: String = "cid",
      cvecCol: String = "cvec"): DataFrame = {
    val cents = centroids
      .select(col(cidCol).cast("long"), col(cvecCol))
      .filter(col(cidCol).isNotNull && col(cvecCol).isNotNull)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    val bc = stream.sparkSession.sparkContext.broadcast(cents)
    val best = udf((v: Seq[Float]) => {
      if (v == null) None
      else {
        val arr = v.toArray
        var bid = -1L
        var bcos = Double.NegativeInfinity
        for ((cid, cv) <- bc.value) {
          val c = graft.functions.CosineSim.cosineArrays(cv, arr)
          if (!c.isNaN && c > bcos) { bid = cid; bcos = c }
        }
        if (bid < 0L) None else Some((bid, bcos))
      }
    })
    stream.select(col(idCol), best(col(vecCol)).as("__b"))
      .filter(col("__b").isNotNull && col("__b._2") < threshold)
      .select(col(idCol), col("__b._1").as(cidCol), col("__b._2").as("cos"))
  }

  /** Streaming corpus-admission dedup — the ingest side of
    * [[graft.pipeline.Dedup.bloomDedup]]: admit only incoming documents
    * whose content fingerprint is NOT already in the reference corpus
    * (the "don't re-ingest pages the corpus already has" gate). Fully
    * stateless: bloom-NEGATIVE rows are definitely novel and admit on
    * the narrow path — no join at all, which at a typical low dup rate
    * is almost every row — while bloom-POSITIVE rows take a
    * stream-static LEFT ANTI join against the reference fingerprints, so
    * Bloom false positives get re-admitted and the admitted set is
    * EXACT. No watermark, no state: the reference is static for the
    * query's lifetime (self-dups within the stream are
    * [[streamingDedup]]'s job; refresh the reference by restarting the
    * query against a rebuilt index). The fingerprint frame persists for
    * the query's lifetime — release it with [[releaseIndex]] on the
    * returned frame; the broadcast Bloom filter costs ~1.2 B per
    * reference doc at the default 1% fpp.
    */
  def streamingBloomAdmit(stream: DataFrame, refDf: DataFrame, idCol: String,
      textCol: String, fpp: Double = 0.01,
      expectedItems: Long = 0L): DataFrame = {
    import graft.pipeline.{Dedup, Text}
    val (refFps0, might) =
      Dedup.fingerprintBloom(refDf, textCol, fpp, expectedItems)
    val refFps = refFps0.persist()
    // fingerprint + bloom probe computed ONCE per row; the two branches
    // split on the precomputed flag (the union still plans the source
    // per branch — the price of skipping the anti-join for the
    // overwhelmingly-common novel case)
    val withFp = stream.select(col(idCol),
        Text.fingerprint(col(textCol)).as("fp"))
      .withColumn("__might", might(col("fp")))
    val novel = withFp.filter(!col("__might")).select(col(idCol), col("fp"))
    val verified = withFp.filter(col("__might"))
      .join(refFps, Seq("fp"), "left_anti")
      .select(col(idCol), col("fp"))
    registerIndex(novel.unionByName(verified), refFps)
  }

  final case class AdmitIn(dom: String, id: Long, n_tokens: Long, key: String)
  final case class AdmitOut(doc_id: Long, dom: String, n_tokens: Long,
      cum_tokens: Long)

  /** Streaming token-budget admission — the ingest-side half of
    * [[graft.pipeline.Text.mixSample]]: each domain admits documents until
    * its token budget is spent, with per-domain state = ONE long (the
    * running token total, counted over every arriving doc, admitted or
    * not, exactly like the batch prefix rule). Within a micro-batch, docs
    * are processed in the batch sampler's md5 order, so a single-batch
    * stream reproduces the batch `mixSample` survivor set byte-for-byte
    * (the driver oracle pins that); across batches, admission follows
    * arrival order — the honest semantics of an admission gate that
    * cannot see the future. Rows of domains absent from `budgets` are
    * filtered out BEFORE the shuffle (the batch rule admits none of them
    * anyway), so state is bounded by |budgets| longs regardless of the
    * domain column's cardinality, and rejected domains pay no shuffle.
    * No watermark: the budget is for the stream's lifetime. A null or
    * uncastable id (nothing to admit) is dropped; a null text counts 0
    * tokens — one malformed row must not kill a continuous ingest gate.
    */
  def streamingBudgetAdmit(stream: DataFrame, idCol: String, textCol: String,
      domainCol: String, budgets: Map[String, Long]): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import graft.pipeline.Text
    val spark = stream.sparkSession
    import spark.implicits._
    val ds = stream
      .filter(col(domainCol).isin(budgets.keys.toSeq: _*))
      .filter(col(idCol).cast("long").isNotNull)
      .select(
        col(domainCol).cast("string").as("dom"),
        col(idCol).cast("long").as("id"),
        coalesce(Text.tokenCount(col(textCol)).cast("long"), lit(0L))
          .as("n_tokens"),
        md5(col(idCol).cast("string")).as("key"))
      .as[AdmitIn]
    def fn(dom: String, rows: Iterator[AdmitIn],
        state: GroupState[Long]): Iterator[AdmitOut] = {
      val budget = budgets.getOrElse(dom, 0L)
      var spent = state.getOption.getOrElse(0L)
      val out = scala.collection.mutable.ArrayBuffer.empty[AdmitOut]
      for (r <- rows.toSeq.sortBy(r => (r.key, r.id))) {
        spent += r.n_tokens // prefix rule: rejected docs still consume
        if (budget > 0L && spent <= budget)
          out += AdmitOut(r.id, dom, r.n_tokens, spent)
      }
      state.update(spent)
      out.iterator
    }
    ds.groupByKey(_.dom)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fn)
      .withColumnRenamed("dom", domainCol)
      .withColumnRenamed("doc_id", idCol)
  }

  final case class FIn(key: Long, ts: Long, etype: String)
  final case class FOut(user_id: Long, ts_list: Seq[Long])

  /** Streaming conversion funnel — the live twin of
    * [[graft.operators.TsOps.funnel]] with the same greedy
    * earliest-first semantics: per-key state is the stage progress (at
    * most |stages| timestamps, a completed funnel keeps its full list as
    * the done marker), events are replayed in event-time order within a
    * batch, and a key emits exactly once, in the micro-batch its final
    * stage arrives. A drained single batch therefore emits exactly the
    * batch operator's completion set (the driver oracle pins that);
    * across batches the greedy pointer advances with arrival, the
    * honest semantics of a live funnel. Only stage-set events reach the
    * shuffle (other types can never advance a funnel, and keys emitting
    * none keep no state); null key/ts/type rows are dropped. The key
    * must cast to long (unlike the batch twin's arbitrary multi-column
    * keys — a streaming state key needs one encodable column). Keys
    * silent longer than `stateTtl` drop their progress (pass empty to
    * keep state forever, the oracle-drain configuration). Returns
    * (key, ts_list) — callers project the stage timestamps out of the
    * list.
    */
  def streamingFunnel(stream: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, stages: Seq[String], withinNanos: Long,
      stateTtl: String = ""): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = stream.sparkSession
    import spark.implicits._
    val ttl = Option(stateTtl).map(_.trim).filter(_.nonEmpty)
    val ds = stream
      .filter(col(typeCol).isin(stages: _*))
      .select(col(keyCol).cast("long").as("key"),
        col(tsCol).cast("long").as("ts"),
        col(typeCol).cast("string").as("etype"))
      .filter(col("key").isNotNull && col("ts").isNotNull &&
        col("etype").isNotNull)
      .as[FIn]
    val n = stages.length
    def fn(key: Long, rows: Iterator[FIn],
        state: GroupState[Seq[Long]]): Iterator[FOut] = {
      if (state.hasTimedOut) {
        state.remove()
        return Iterator.empty
      }
      val prog0 = state.getOption.getOrElse(Seq.empty).toVector
      var prog = prog0
      val out = scala.collection.mutable.ArrayBuffer.empty[FOut]
      if (prog.length < n) {
        for (r <- rows.toSeq.sortBy(r => (r.ts, r.etype))
            if prog.length < n) {
          val fits = r.etype == stages(prog.length) &&
            (prog.isEmpty ||
              (r.ts > prog.last && r.ts <= prog.head + withinNanos))
          if (fits) {
            prog = prog :+ r.ts
            if (prog.length == n) out += FOut(key, prog)
          }
        }
        if (prog != prog0) state.update(prog)
      }
      if (state.exists) ttl.foreach(state.setTimeoutDuration)
      out.iterator
    }
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout)(fn)
      .withColumnRenamed("user_id", keyCol)
  }

  final case class UDIn(key: Long, day: Long)
  final case class UDOut(user_id: Long, day: Long, cohort_day: Long,
      day_offset: Long)

  /** Streaming user-day activity ledger — the live substrate for cohort
    * retention and DAU/WAU: per-key state is (cohort day, seen-day set;
    * bounded by the calendar), and each (user, day) pair emits EXACTLY
    * once, tagged with the user's cohort day and offset. Within a batch,
    * days replay in ascending order, so a drained single batch pins the
    * cohort to the user's true first day and the emitted ledger equals
    * the batch `distinct (user, day)` frame — retention and active-user
    * rollups computed on the drained sink match the batch operators
    * (their shared oracles pin that; the driver queries enforce the
    * one-batch precondition with `Trigger.Once`, since AvailableNow may
    * split a multi-file source). Across batches the cohort is whatever
    * day arrived first (live semantics: emitted rows are never
    * retracted, so a late earlier day cannot rewrite history — a later
    * earlier-day arrival emits with a negative offset against the
    * pinned cohort).
    *
    * State is BOUNDED BY THE CALENDAR, not the stream: per key it holds
    * (cohort day, anchor day, seen-day bitmap), where bit `i` of the
    * bitmap marks day `anchor + i` as seen. A user-year costs 46 bytes
    * (365 bits) regardless of how many events arrive — vs ~8 bytes per
    * DISTINCT DAY for the naive seen-day list this replaced (ScaleProbe
    * `user_days_state` pins the measured per-key state byte growth vs
    * stream length). The anchor only moves (and the bitmap only shifts)
    * on the rare late-arriving pre-anchor day. `maxSpanDays` (default
    * 200 years) fail-fasts on garbage timestamps whose day span would
    * balloon the bitmap — a data-quality guard, not a tuning knob.
    */
  def streamingUserDays(stream: DataFrame, keyCol: String, tsCol: String,
      dayNanos: Long, stateTtl: String = "",
      maxSpanDays: Int = 73000): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = stream.sparkSession
    import spark.implicits._
    val ttl = Option(stateTtl).map(_.trim).filter(_.nonEmpty)
    val ds = stream
      .select(col(keyCol).cast("long").as("key"),
        expr(graft.operators.TsOps.floorDivSql(s"`$tsCol`", dayNanos))
          .as("day"))
      .filter(col("key").isNotNull && col("day").isNotNull)
      .as[UDIn]
    def testBit(bits: Array[Long], i: Long): Boolean = {
      val w = (i >> 6).toInt
      w < bits.length && ((bits(w) >>> (i & 63).toInt) & 1L) != 0L
    }
    def setBit(bits: Array[Long], i: Long): Array[Long] = {
      val w = (i >> 6).toInt
      val arr = if (w < bits.length) bits
        else java.util.Arrays.copyOf(bits, w + 1)
      arr(w) |= 1L << (i & 63).toInt
      arr
    }
    // shift every bit up by `shift` positions (a pre-anchor day arrived;
    // the bitmap re-anchors lower). Word-wise, O(words), rare.
    def shiftUp(bits: Array[Long], shift: Long): Array[Long] = {
      val wordShift = (shift >> 6).toInt
      val bitShift = (shift & 63).toInt
      val out = new Array[Long](bits.length + wordShift + 1)
      var i = 0
      while (i < bits.length) {
        val v = bits(i)
        if (v != 0L) {
          out(i + wordShift) |= v << bitShift
          if (bitShift != 0) out(i + wordShift + 1) |= v >>> (64 - bitShift)
        }
        i += 1
      }
      out
    }
    def fn(key: Long, rows: Iterator[UDIn],
        state: GroupState[(Long, Long, Array[Long])]): Iterator[UDOut] = {
      if (state.hasTimedOut) {
        state.remove()
        return Iterator.empty
      }
      var (cohort, anchor, bits) = state.getOption
        .getOrElse((Long.MaxValue, Long.MaxValue, Array.empty[Long]))
      var changed = false
      val out = scala.collection.mutable.ArrayBuffer.empty[UDOut]
      for (r <- rows.toSeq.sortBy(_.day)) {
        if (cohort == Long.MaxValue) { cohort = r.day; anchor = r.day }
        if (r.day < anchor) {
          // the span guard must run BEFORE the shift: a garbage negative
          // timestamp re-anchors (its own offset becomes 0, so the post-
          // shift check below never sees it), and the unchecked shift
          // would Int-wrap the word offset or allocate a gigabyte bitmap
          require(anchor - r.day < maxSpanDays,
            s"user-day span ${anchor - r.day} days for key $key exceeds " +
              s"maxSpanDays=$maxSpanDays — timestamps are likely garbage " +
              "(span guard, not a capacity limit)")
          bits = shiftUp(bits, anchor - r.day)
          anchor = r.day
          changed = true
        }
        val off = r.day - anchor
        require(off < maxSpanDays, s"user-day span $off days for key $key " +
          s"exceeds maxSpanDays=$maxSpanDays — timestamps are likely " +
          "garbage (span guard, not a capacity limit)")
        if (!testBit(bits, off)) {
          bits = setBit(bits, off)
          changed = true
          out += UDOut(key, r.day, cohort, r.day - cohort)
        }
      }
      if (changed) state.update((cohort, anchor, bits))
      if (state.exists) ttl.foreach(state.setTimeoutDuration)
      out.iterator
    }
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[(Long, Long, Array[Long]), UDOut](
        OutputMode.Append,
        if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout)(fn)
      .toDF()
      // hand the caller's key name back (the sibling stateful operators'
      // convention) — a caller selecting the keyCol it passed in must
      // not hit an AnalysisException or join on the wrong column
      .withColumnRenamed("user_id", keyCol)
  }

  final case class TrIn(key: Long, ts: Long, eid: Long, etype: String)
  final case class TrOut(from_type: String, to_type: String)

  /** Streaming event-type transition pairs — the live twin of
    * [[graft.operators.TsOps.transitions]]: per-key state is ONE tuple
    * (last ts, id, type); each arriving event after a key's first emits
    * one (from, to) pair row. Within a batch, events replay in
    * (ts, id) order — a drained single batch therefore emits exactly the
    * batch operator's pair multiset (the shared oracle pins that, with
    * the count aggregation applied on the sink table). Across batches a
    * straggler pairs at its ARRIVAL position (live semantics: emitted
    * pairs are never retracted), the inherent trade of an incremental
    * transition feed. Null key/ts/id rows drop before the state function;
    * a null TYPE advances the pointer without emitting (the batch lead
    * window drops null-successor pairs but keeps null as a from-type —
    * matched here so the drained equality holds on null-typed data too).
    * Keys silent past `stateTtl` drop their tuple.
    */
  def streamingTransitions(stream: DataFrame, keyCol: String, tsCol: String,
      idCol: String, typeCol: String, stateTtl: String = ""): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = stream.sparkSession
    import spark.implicits._
    val ttl = Option(stateTtl).map(_.trim).filter(_.nonEmpty)
    val ds = stream
      .select(col(keyCol).cast("long").as("key"),
        col(tsCol).cast("long").as("ts"),
        col(idCol).cast("long").as("eid"),
        col(typeCol).cast("string").as("etype"))
      .filter(col("key").isNotNull && col("ts").isNotNull &&
        col("eid").isNotNull)
      .as[TrIn]
    def fn(key: Long, rows: Iterator[TrIn],
        state: GroupState[(Long, Long, String)]): Iterator[TrOut] = {
      if (state.hasTimedOut) {
        state.remove()
        return Iterator.empty
      }
      var last = state.getOption
      val out = scala.collection.mutable.ArrayBuffer.empty[TrOut]
      for (r <- rows.toSeq.sortBy(r => (r.ts, r.eid))) {
        if (r.etype != null)
          last.foreach { case (_, _, t) => out += TrOut(t, r.etype) }
        last = Some((r.ts, r.eid, r.etype))
      }
      last.foreach(state.update)
      ttl.foreach(state.setTimeoutDuration)
      out.iterator
    }
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[(Long, Long, String), TrOut](OutputMode.Append,
        if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout)(fn)
      .toDF()
  }

  final case class RcIn(key: Long, ts: Long, eid: Long, c: Long)
  final case class EwOut(user_id: Long, ts: Long, event_id: Long,
      cents: Long, ewma_num: Long, ewma_cents: Long)
  final case class CuOut(user_id: Long, ts: Long, event_id: Long,
      cents: Long, s_pos: Long, s_neg: Long, alarm: Long)

  /** Shared input prep of the recurrence twins: (key, ts, id, cents),
    * non-castable values dropped before state — one malformed point must
    * not perturb a smoothing/drift statistic (same posture as the batch
    * tier and the z-score twin). */
  private def recurrenceInput(stream: DataFrame, keyCol: String,
      tsCol: String, idCol: String, valueCol: String): Dataset[RcIn] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream.select(col(keyCol).cast("long").as("key"),
        col(tsCol).cast("long").as("ts"),
        col(idCol).cast("long").as("eid"),
        graft.operators.TsOps.centsExpr(valueCol).as("c"))
      .filter(col("key").isNotNull && col("ts").isNotNull &&
        col("eid").isNotNull && col("c").isNotNull)
      .as[RcIn]
  }

  /** Streaming integer EWMA — the live twin of
    * [[graft.operators.RecurrenceOps.ewma]] with the identical
    * floor-division recurrence (α = 1/2^`alphaLog2`): per-key state is ONE
    * long (the 2^a-scaled mean), initialized m₁ = c₁·2^a at the key's
    * first point. Within a batch, rows replay in (ts, id) order, so a
    * drained single batch emits exactly the batch operator's sequence
    * (the shared oracle pins it). Across batches the recurrence folds in
    * arrival order — a straggler older than already-folded points smooths
    * at its arrival position (live semantics: emitted rows are never
    * retracted), the inherent trade of incremental smoothing. Keys silent
    * past `stateTtl` drop their long.
    */
  def streamingEwma(stream: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts", idCol: String = "event_id",
      valueCol: String = "value", alphaLog2: Int = 4,
      stateTtl: String = ""): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(alphaLog2 >= 1 && alphaLog2 <= 20, "alphaLog2 in [1, 20]")
    val scale = 1L << alphaLog2
    val spark = stream.sparkSession
    import spark.implicits._
    val ttl = Option(stateTtl).map(_.trim).filter(_.nonEmpty)
    val ds = recurrenceInput(stream, keyCol, tsCol, idCol, valueCol)
    def fn(key: Long, rows: Iterator[RcIn],
        state: GroupState[Long]): Iterator[EwOut] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      var m = state.getOption
      val out = scala.collection.mutable.ArrayBuffer.empty[EwOut]
      for (r <- rows.toSeq.sortBy(r => (r.ts, r.eid))) {
        val next = m match {
          case None => r.c * scale
          case Some(prev) => prev - Math.floorDiv(prev, scale) + r.c
        }
        m = Some(next)
        out += EwOut(key, r.ts, r.eid, r.c, next, Math.floorDiv(next, scale))
      }
      m.foreach(state.update)
      ttl.foreach(state.setTimeoutDuration)
      out.iterator
    }
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[Long, EwOut](OutputMode.Append,
        if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout)(fn)
      .toDF()
      .withColumnRenamed("user_id", keyCol)
  }

  final case class HoOut(user_id: Long, ts: Long, event_id: Long,
      cents: Long, level_num: Long, trend_num: Long, fc1_cents: Long)

  /** Streaming Holt level+trend smoothing — the live twin of
    * [[graft.operators.RecurrenceOps.holt]] (identical fixed-point
    * recurrences, two longs of state per key). The one-step forecast makes
    * this the live "expected next value" feed a gap detector or
    * freshness monitor consumes; batch-order replay and the arrival-order
    * cross-batch trade are as in [[streamingEwma]].
    */
  def streamingHolt(stream: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts", idCol: String = "event_id",
      valueCol: String = "value", alphaLog2: Int = 3, betaLog2: Int = 4,
      scaleLog2: Int = 20, stateTtl: String = ""): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val m = 1L << scaleLog2
    val (a, bb) = (1L << alphaLog2, 1L << betaLog2)
    val spark = stream.sparkSession
    import spark.implicits._
    val ttl = Option(stateTtl).map(_.trim).filter(_.nonEmpty)
    val ds = recurrenceInput(stream, keyCol, tsCol, idCol, valueCol)
    def fn(key: Long, rows: Iterator[RcIn],
        state: GroupState[(Long, Long)]): Iterator[HoOut] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      var st = state.getOption
      val out = scala.collection.mutable.ArrayBuffer.empty[HoOut]
      for (r <- rows.toSeq.sortBy(r => (r.ts, r.eid))) {
        val (l0, b0) = st.getOrElse((r.c * m, 0L))
        val drift = l0 + b0
        val l1 = drift + Math.floorDiv(r.c * m - drift, a)
        val b1 = b0 + Math.floorDiv(l1 - drift, bb)
        st = Some((l1, b1))
        out += HoOut(key, r.ts, r.eid, r.c, l1, b1,
          Math.floorDiv(l1 + b1, m))
      }
      st.foreach(state.update)
      ttl.foreach(state.setTimeoutDuration)
      out.iterator
    }
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[(Long, Long), HoOut](OutputMode.Append,
        if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout)(fn)
      .toDF()
      .withColumnRenamed("user_id", keyCol)
  }

  /** Streaming two-sided integer CUSUM — the live twin of
    * [[graft.operators.RecurrenceOps.cusum]], same recurrences, same
    * alarm-resets-state page-test behavior. Per-key state is two longs;
    * batch-order replay and the arrival-order cross-batch trade are as in
    * [[streamingEwma]]. This is the op streaming exists for: sustained
    * drift in a live metric alarms within one micro-batch of crossing the
    * threshold, with O(1) state per series.
    */
  def streamingCusum(stream: DataFrame, targetCents: Long, slackCents: Long,
      thresholdCents: Long, keyCol: String = "user_id",
      tsCol: String = "ts", idCol: String = "event_id",
      valueCol: String = "value", stateTtl: String = ""): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = stream.sparkSession
    import spark.implicits._
    val ttl = Option(stateTtl).map(_.trim).filter(_.nonEmpty)
    val ds = recurrenceInput(stream, keyCol, tsCol, idCol, valueCol)
    def fn(key: Long, rows: Iterator[RcIn],
        state: GroupState[(Long, Long)]): Iterator[CuOut] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      var (sp, sn) = state.getOption.getOrElse((0L, 0L))
      val out = scala.collection.mutable.ArrayBuffer.empty[CuOut]
      for (r <- rows.toSeq.sortBy(r => (r.ts, r.eid))) {
        val d = r.c - targetCents
        sp = Math.max(0L, sp + d - slackCents)
        sn = Math.max(0L, sn - d - slackCents)
        val alarm = if (sp > thresholdCents || sn > thresholdCents) 1L else 0L
        out += CuOut(key, r.ts, r.eid, r.c, sp, sn, alarm)
        if (alarm == 1L) { sp = 0L; sn = 0L }
      }
      state.update((sp, sn))
      ttl.foreach(state.setTimeoutDuration)
      out.iterator
    }
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[(Long, Long), CuOut](OutputMode.Append,
        if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout)(fn)
      .toDF()
      .withColumnRenamed("user_id", keyCol)
  }

  final case class ZIn(key: Long, event_id: Long, ts: Long, value: Double,
      c: Long)
  final case class ZOut(event_id: Long, ts: Long, user_id: Long,
      value: Double, roll_n: Long, lhs: Long, rhs: Long)

  /** Streaming rolling z-score anomaly detection — the alerting twin of
    * [[graft.operators.TsOps.zscoreAnomalies]], with the identical exact
    * integer z-test on value cents. Per-key state is the trailing
    * window's ts-SORTED (ts, cents) deque plus incremental sums. Rows
    * are processed in event-time order within a batch, and all rows
    * sharing a timestamp enter the window together before any of them is
    * tested (RANGE-frame semantics, so a drained single batch flags
    * exactly the batch operator's set — the driver oracle pins that).
    * Across batches, a straggler inserts into its sorted position and
    * tests against only the entries in ITS [t−win, t] window (the sorted
    * suffix past t is subtracted), and a clock-skewed far-future row
    * cannot block eviction — it waits at the tail while older entries
    * age out normally, so state stays bounded by the active window's
    * span (plus any strays ahead of it). Rows whose value doesn't cast
    * to cents (null/NaN/overflow) or with null key/id/ts are dropped
    * BEFORE the state function — one malformed point must not kill
    * alerting — matching the batch op, where a non-castable value
    * neither counts toward `roll_n` nor can flag. Keys silent longer
    * than `stateTtl` have their state dropped (pass empty to keep state
    * forever, the oracle-drain configuration).
    *
    * Clock-skew containment (`maxSkew`): by default event time is fully
    * trusted — a genuine quiet period correctly ages the whole window
    * out, and so would one bogus far-future timestamp. Sources that can
    * emit skewed clocks should set `maxSkew`: a timestamp jumping more
    * than that past the key's high-water mark is held back as a
    * CANDIDATE — tested against its own window but not admitted into
    * state and not advancing eviction — until a second point lands
    * within `maxSkew` of it (one point is a spike, two are a step).
    * Confirmation restarts the window at the new region; the candidate
    * point itself is not retroactively counted.
    */
  final case class CiOut(user_id: Long, bucket: Long, inc_cents: Long,
    reset: Long)

  /** Streaming reset-aware counter deltas — the live twin of
    * [[graft.operators.TsOps.counterIncrease]]: per-key state is ONE long
    * (the last sample's cents), each arriving sample emits its delta
    * partial (increase, reset flag, current-sample bucket) and the
    * per-bucket roll-up happens on the drained sink — partials are
    * associative, so the roll-up equals the batch operator whenever per-key
    * arrival order matches (within a batch rows replay in (ts, id) order;
    * the single-drain oracle configuration pins exact equality). The
    * first sample of a key sets state and emits nothing, as in batch.
    * Keys silent past `stateTtl` drop their long.
    */
  def streamingCounterIncrease(stream: DataFrame, bucketNanos: Long,
      keyCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id", valueCol: String = "value",
      stateTtl: String = ""): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(bucketNanos > 0, "streamingCounterIncrease needs a positive bucket")
    val spark = stream.sparkSession
    import spark.implicits._
    val ttl = Option(stateTtl).map(_.trim).filter(_.nonEmpty)
    val ds = recurrenceInput(stream, keyCol, tsCol, idCol, valueCol)
    def fn(key: Long, rows: Iterator[RcIn],
        state: GroupState[Long]): Iterator[CiOut] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      var prev = state.getOption
      val out = scala.collection.mutable.ArrayBuffer.empty[CiOut]
      for (r <- rows.toSeq.sortBy(r => (r.ts, r.eid))) {
        prev match {
          case Some(p) =>
            out += CiOut(key, Math.floorDiv(r.ts, bucketNanos),
              if (r.c >= p) r.c - p else r.c, if (r.c < p) 1L else 0L)
          case None => // first sample: state only, no delta
        }
        prev = Some(r.c)
      }
      prev.foreach(state.update)
      ttl.foreach(state.setTimeoutDuration)
      out.iterator
    }
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[Long, CiOut](OutputMode.Append,
        if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout)(fn)
      .toDF()
      .withColumnRenamed("user_id", keyCol)
  }

  /** Streaming seasonal-residual anomalies — the live twin of
    * [[graft.operators.TsOps.seasonalAnomalies]]: incoming points are
    * scored against a STATIC seasonal profile (the ≤ 168-cell dow×hour
    * frame [[graft.operators.TsOps.seasonalProfile]] builds batch-side
    * from history) with the identical exact integer
    * residual test on decimal(38,0). Stateless by design — the profile is
    * a broadcast lookup, so there is no streaming state at all: this is
    * the train-batch/score-stream split a live calendar detector actually
    * wants (the profile refreshes on whatever cadence history is rebuilt,
    * e.g. nightly, not per event). When the profile is built from exactly
    * the streamed data, a drained stream flags exactly the batch set
    * (leave-in semantics both sides — the driver oracle pins that).
    */
  def streamingSeasonalAnomalies(stream: DataFrame, profile: DataFrame,
      valueCol: String = "value", tsCol: String = "ts", k: Int = 2)
      : DataFrame = {
    // THE batch expressions — calendar cell, cents fixed point, and every
    // product in decimal (the batch twin's overflow discipline): reused,
    // not copied, so the score-identical contract cannot drift
    import graft.operators.TsOps.{centsExpr, dowExpr, hourExpr}
    val big = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    stream
      .withColumn("dow", dowExpr(tsCol))
      .withColumn("hour", hourExpr(tsCol))
      .withColumn("__c", centsExpr(valueCol))
      .join(broadcast(profile), Seq("dow", "hour"))
      .withColumn("lhs",
        (big(col("cell_n")) * big(col("__c")) - big(col("__s"))) *
          (big(col("cell_n")) * big(col("__c")) - big(col("__s"))))
      .withColumn("rhs",
        big(lit(k.toLong * k)) * (big(col("cell_n")) * big(col("__sq")) -
          big(col("__s")) * big(col("__s"))))
      .filter(col("lhs") > col("rhs"))
      .drop("__c", "__s", "__sq", "lhs", "rhs")
  }

  def streamingZscoreAnomalies(stream: DataFrame, windowNanos: Long,
      k: Int = 2, minN: Long = 10, idCol: String = "event_id",
      tsCol: String = "ts", keyCol: String = "user_id",
      valueCol: String = "value", stateTtl: String = "",
      maxSkew: Long = Long.MaxValue): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = stream.sparkSession
    import spark.implicits._
    val ttl = Option(stateTtl).map(_.trim).filter(_.nonEmpty)
    val ds = stream
      .select(
        col(keyCol).cast("long").as("key"),
        col(idCol).cast("long").as("event_id"),
        col(tsCol).cast("long").as("ts"),
        col(valueCol).cast("double").as("value"),
        (col(valueCol).cast("decimal(18,2)") * 100).cast("long").as("c"))
      .filter(col("key").isNotNull && col("event_id").isNotNull &&
        col("ts").isNotNull && col("c").isNotNull)
      .as[ZIn]
    val k2 = k.toLong * k
    // state: (window deque sorted by ts, high-water ts, candidate-step ts)
    def fn(key: Long, rows: Iterator[ZIn],
        state: GroupState[(Seq[(Long, Long)], Long, Long)])
        : Iterator[ZOut] = {
      if (state.hasTimedOut) {
        state.remove()
        return Iterator.empty
      }
      var (deque0, hw, cand) =
        state.getOption.getOrElse((Seq.empty[(Long, Long)], Long.MinValue,
          Long.MinValue))
      var deque = deque0.toVector
      var s = deque.iterator.map(_._2).sum
      var sq = deque.iterator.map(p => p._2 * p._2).sum
      val out = scala.collection.mutable.ArrayBuffer.empty[ZOut]
      def skewOk(base: Long, t: Long): Boolean =
        base == Long.MinValue || t - base <= maxSkew || t <= base
      // ts groups in ascending order; equal-ts rows join the window
      // together before any is tested
      for (group <- rows.toSeq.sortBy(r => (r.ts, r.event_id))
          .groupBy(_.ts).toSeq.sortBy(_._1).map(_._2)) {
        val t = group.head.ts
        val admit =
          if (skewOk(hw, t)) { if (t > hw) hw = t; cand = Long.MinValue; true }
          else if (cand != Long.MinValue && math.abs(t - cand) <= maxSkew) {
            hw = t; cand = Long.MinValue; true // second point confirms a step
          } else { cand = t; false }  // lone far-future point: hold back
        if (!admit) {
          // held-back candidate: tested against its own [t-win, t] window
          // (the group plus any retained entries still in range — with
          // maxSkew < windowNanos the old region can overlap it) but NOT
          // admitted: state, high-water, and eviction are untouched, so a
          // genuine anomaly at a clock step still alerts while a bogus
          // timestamp cannot poison the window
          val cut = t - windowNanos
          var n = 0L; var ws = 0L; var wsq = 0L
          for (p <- deque if p._1 >= cut && p._1 <= t) {
            n += 1; ws += p._2; wsq += p._2 * p._2
          }
          for (r <- group) { n += 1; ws += r.c; wsq += r.c * r.c }
          if (n >= minN) for (r <- group) {
            val d = n * r.c - ws
            val lhs = d * d
            val rhs = k2 * (n * wsq - ws * ws)
            if (lhs > rhs)
              out += ZOut(r.event_id, r.ts, key, r.value, n, lhs, rhs)
          }
        }
        if (admit) {
          val cut = t - windowNanos // [t-win, t] incl., like rangeBetween
          while (deque.nonEmpty && deque.head._1 < hw - windowNanos) {
            val c0 = deque.head._2
            s -= c0; sq -= c0 * c0
            deque = deque.tail
          }
          // sorted insert keeps head-eviction correct under stragglers
          // (in-order streams append at the tail)
          val (before, after) = deque.span(_._1 <= t)
          deque = (before ++ group.map(r => (r.ts, r.c))) ++ after
          for (r <- group) { s += r.c; sq += r.c * r.c }
          // the row's window excludes entries AHEAD of t and (for a
          // straggler) entries already aged past its own cut
          var exN = 0L; var exS = 0L; var exSq = 0L
          for (p <- after) { exN += 1; exS += p._2; exSq += p._2 * p._2 }
          for (p <- deque if p._1 < cut) {
            exN += 1; exS += p._2; exSq += p._2 * p._2
          }
          val n = deque.size.toLong - exN
          val (ws, wsq) = (s - exS, sq - exSq)
          if (n >= minN) for (r <- group) {
            val d = n * r.c - ws
            val lhs = d * d
            val rhs = k2 * (n * wsq - ws * ws)
            if (lhs > rhs)
              out += ZOut(r.event_id, r.ts, key, r.value, n, lhs, rhs)
          }
        }
      }
      state.update((deque, hw, cand))
      ttl.foreach(state.setTimeoutDuration)
      out.iterator
    }
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout)(fn)
      .withColumnRenamed("user_id", keyCol)
  }

  /** Streaming embedding near-dup against a static reference corpus — the
    * vector analog of [[streamingNearDup]] (incremental-ingest semantic
    * dedup): incoming embeddings are RHP-signed statelessly and
    * multiprobed (exact bucket + every 1-bit flip) into the prebuilt
    * signature index of the existing corpus; only bucket collisions get
    * the exact cosine, and multi-probe hits of the same pair collapse
    * through one `dropDuplicatesWithinWatermark` — so the per-pair dedup
    * GUARANTEE is the watermark horizon (the same bounded-state trade as
    * [[streamingDedup]]): two probe directions of one pair arriving in
    * micro-batches further apart than `lateness` re-emit it. Bucket
    * collision is SYMMETRIC (a flip-probe hits iff the two signatures
    * differ by <= 1 bit), so when the streamed corpus is the reference
    * itself AND the stream drains within the horizon (one AvailableNow
    * pass, as the driver query runs it) the ordered emitted set equals
    * the batch [[graft.pipeline.Dedup.embeddingNearDups]] LSH path —
    * which is what the driver oracle pins, literal planes and all.
    *
    * At scale the index is (id, signature, vector) partitioned by
    * signature for the join; stream-side work is numPlanes+1 probe rows
    * per incoming vector — proportional to batch size, not corpus size.
    * The signature index stays cached for the query's lifetime (same
    * pattern as [[streamingNearDup]]); release exactly it with
    * [[releaseIndex]] on the returned frame after stopping the stream.
    */
  def streamingEmbedNearDup(stream: DataFrame, ref: DataFrame, idCol: String,
      vecCol: String, eventTimeCol: String, lateness: String,
      threshold: Double, dims: Int, numPlanes: Int = 12,
      seed: Int = 42): DataFrame = {
    // default matches batch embeddingNearDups (12): different plane
    // counts build different signature matrices, silently breaking the
    // documented drained-stream == batch pair-set equality for callers
    // relying on defaults
    import graft.pipeline.Similarity
    val refIdx = ref.select(col(idCol).as("__rid"), col(vecCol).as("__rv"))
      .withColumn("__sig",
        Similarity.rhpSignature(col("__rv"), dims, numPlanes, seed))
      .persist()
    val probed = withEventTime(stream, eventTimeCol)
      .withWatermark("__event_time", lateness)
      .select(col("__event_time"), col(idCol).as("__sid"),
        col(vecCol).as("__sv"))
      .withColumn("__sig0",
        Similarity.rhpSignature(col("__sv"), dims, numPlanes, seed))
      .select(col("__event_time"), col("__sid"), col("__sv"),
        explode(array((col("__sig0") +: (0 until numPlanes).map(p =>
          col("__sig0").bitwiseXOR(lit(1 << p)))): _*)).as("__sig"))
    registerIndex(probed.join(refIdx, Seq("__sig"))
      .filter(col("__sid") =!= col("__rid"))
      .withColumn("cos", Similarity.cosine(col("__sv"), col("__rv")))
      .filter(col("cos") >= threshold)
      .select(col("__event_time"),
        least(col("__sid"), col("__rid")).as("id1"),
        greatest(col("__sid"), col("__rid")).as("id2"),
        col("cos"))
      .dropDuplicatesWithinWatermark(Seq("id1", "id2"))
      .select("id1", "id2", "cos"), refIdx)
  }

  /** Streaming IVF index maintenance — the freshness path of the ANN-at-
    * rest story: each incoming vector is assigned to its nearest (static)
    * centroid and APPENDED into the cell-partitioned index that
    * [[graft.pipeline.Similarity.writeIvf]] laid down. New vectors land as
    * new parquet files inside their cell directory, so probes
    * ([[graft.pipeline.Similarity.ivfKnnStored]]) see them on the next
    * scan — no index rebuild, no rewrite of existing files, and the
    * partition-pruned probe shape is unchanged. Per micro-batch: one
    * broadcast-centroid assignment (narrow) + a `partitionBy(cid)` append;
    * the accumulation of small per-batch files is the same compaction
    * story as the metrics store's blocks. Centroids stay fixed between
    * retrainings, exactly like a production IVF serving index.
    *
    * Delivery is AT-LEAST-ONCE: a crash between a batch's files landing
    * and its checkpoint commit replays the batch on restart, briefly
    * duplicating those vectors in the index (a duplicate can shadow one
    * true neighbor in a top-k until repaired). [[graft.pipeline.Similarity
    * .compactIvf]] is the repair — it drops duplicate ids while folding
    * the small files, so run it on the same cadence as block compaction.
    * Exactly-once would need a transactional table format, out of scope
    * for plain parquet.
    */
  def ivfIngest(stream: DataFrame, centroids: DataFrame, path: String,
      checkpointDir: String, idCol: String = "vec_id",
      vecCol: String = "embedding",
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.pipeline.Similarity.ivfAssign(batch, centroids, idCol, vecCol)
          .write.mode("append").partitionBy("cid").parquet(path)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** Incremental sketch-store ingest: each micro-batch folds its documents
    * into per-group sketch rows APPENDED to the at-rest store
    * ([[graft.pipeline.Text.writeSketchStore]] layout, partitioned by
    * group). Because both sketches merge exactly (HLL register-max union,
    * CMS vector addition — both order-independent), a
    * [[graft.pipeline.Text.sketchRollup]] over the accumulated per-batch
    * partials answers identically to a store built in one batch pass —
    * compaction of the small files is an IO optimization, never a
    * semantic need. Per batch the work is one map-side-combined
    * aggregation producing ≤ |groups| KB-sized rows: the 100 TB ingest
    * shape where corpus statistics stay queryable WHILE the corpus
    * arrives, no rescan ever.
    *
    * Delivery is at-least-once at the FILE level but effectively
    * EXACTLY-ONCE at the answer level: each batch's partial rows are
    * stamped with a batch key derived from (checkpoint location,
    * micro-batch id) — deterministic across a crash-restart, since the
    * replayed batch reruns under the same checkpoint with the same id —
    * and [[graft.pipeline.Text.sketchRollup]] /
    * [[graft.pipeline.Text.compactSketchStore]] drop duplicate
    * (group, batch_key) rows before merging, so a replayed batch can no
    * longer double-count `cms`/`n_tokens` (`hll` was always
    * replay-immune — union is idempotent). The one remaining window:
    * compacting WHILE a crashed stream still has an uncommitted batch
    * whose partial already landed — the fold erases row identities, so
    * run compaction with the stream stopped or committed (its Scaladoc
    * states the rule).
    */
  def sketchIngest(stream: DataFrame, path: String, checkpointDir: String,
      textCol: String = "text", groupCol: String = "source",
      lgK: Int = 12, d: Int = 4, w: Int = 2048,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.pipeline.Text.appendSketchStore(batch, path,
          sketchBatchKey(checkpointDir, batchId), textCol, groupCol,
          lgK, d, w)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** Continuous-aggregate maintenance: each micro-batch appends its
    * per-bucket partial rollup rows to an at-rest
    * [[graft.storage.RollupStore]] under a replay-stable batch key — the
    * sketch-ingest discipline applied to the TSDB's own downsample tier.
    * Partials are associative (decimal sums, min/max, counts), so a rollup
    * over base + streamed partials equals the one-pass batch store exactly,
    * and a replayed micro-batch collapses in the (bucket_ts, batch_key)
    * dedup instead of double-counting. State is ZERO: the store on disk is
    * the accumulator; each batch is one bounded aggregation of its own
    * rows. Same compaction rule as sketchIngest: quiesce the stream before
    * [[graft.storage.RollupStore.compact]].
    */
  def rollupIngest(stream: DataFrame, path: String, checkpointDir: String,
      bucketNanos: Long, valueCol: String = "value", tsCol: String = "ts",
      distinctCol: Option[String] = None, lgK: Int = 12,
      histBoundsCents: Seq[Long] = Nil,
      trigger: Trigger = Trigger.AvailableNow(),
      keyCols: Seq[String] = Nil,
      withVariance: Boolean = false): StreamingQuery = {
    // grain + key-set validation ONCE at stream start, not per
    // micro-batch: the probe scans every accumulated partial file, so
    // inside foreachBatch it would grow with the stream's life between
    // compactions; the read side's uniform-width assert still backstops
    // a concurrent writer that lands a different grain mid-stream
    graft.storage.RollupStore.requireGrain(stream.sparkSession, path,
      bucketNanos, "rollupIngest")
    graft.storage.RollupStore.requireKeys(stream.sparkSession, path,
      keyCols, "rollupIngest")
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.storage.RollupStore.append(batch, path,
          sketchBatchKey(checkpointDir, batchId), bucketNanos, valueCol,
          tsCol, distinctCol, lgK, histBoundsCents,
          validateWidth = false, keyCols = keyCols, validateKeys = false,
          withVariance = withVariance)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }

  /** Stream-maintained counter recording rule: [[streamingCounterIncrease]]
    * carries the cross-batch lag (one long per series in the state
    * store), each micro-batch folds its per-sample delta partials to
    * per-bucket increase rows and appends them to an at-rest
    * [[graft.storage.CounterStore]] under a replay-stable key — the
    * [[rollupIngest]] discipline on the monitoring-counter tier. The
    * partials are plain additive longs, so base + streamed appends equal
    * a one-pass batch [[graft.operators.TsOps.counterIncrease]] over
    * everything ingested, and a replayed micro-batch collapses in the
    * (key, bucket, batch_key) dedup instead of double-counting. Grain and
    * key-set validation run ONCE at stream start (the probe scans every
    * accumulated partial file); the read side's uniform-width guard
    * backstops a concurrent mis-grained writer. */
  def counterIngest(stream: DataFrame, path: String, checkpointDir: String,
      bucketNanos: Long, keyCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id", valueCol: String = "value",
      stateTtl: String = "",
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    graft.storage.CounterStore.requireGrain(stream.sparkSession, path,
      bucketNanos, "counterIngest")
    graft.storage.CounterStore.requireKeys(stream.sparkSession, path,
      Seq(keyCol), "counterIngest")
    val partials = streamingCounterIncrease(stream, bucketNanos, keyCol,
      tsCol, idCol, valueCol, stateTtl)
    partials.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.storage.CounterStore.append(
          batch.groupBy(col(keyCol), col("bucket"))
            .agg(count(lit(1)).as("n_deltas"),
              sum("inc_cents").as("inc_cents"),
              sum("reset").as("n_resets")),
          path, sketchBatchKey(checkpointDir, batchId), bucketNanos,
          validateGrain = false, validateKeys = false)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }

  /** Stream-maintained sample tier: each micro-batch filters itself
    * through [[graft.storage.SampleStore]]'s deterministic membership
    * predicate (stateless — membership is a pure function of the row id)
    * and appends the survivors under a replay-stable key. A crash-replay
    * re-samples the SAME rows, which collapse in the read-side
    * `(id, batch_key)` dedup, so estimates from a streamed store equal
    * the one-shot batch [[graft.storage.SampleStore.build]] exactly.
    * Rate/id validation runs ONCE at stream start (the probe scans every
    * accumulated file); the read side's uniform-rate guard backstops a
    * concurrent mis-rated writer.
    *
    * MIGRATION HAZARD (round-11 rate-ladder change): this parameter was
    * `prefixLen` (hex chars, rate 1/16^p) before the bit ladder and is
    * now `bits` (rate 1/2^b) IN THE SAME POSITION — a recompiled caller
    * still passing an old positional value (e.g. 2 for 1/256) would
    * sample a FRESH store at 1/4 with no guard firing (`requireRate`
    * only protects appends to existing stores). Old rates convert as
    * `bits = 4 × prefixLen`; the old default (prefixLen = 1 ≡ 1/16) maps
    * to the new default (bits = 4), so default-using callers are
    * unaffected. */
  def sampleIngest(stream: DataFrame, path: String, checkpointDir: String,
      idCol: String, tsCol: String = "ts", bits: Int = 4,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    graft.storage.SampleStore.requireRate(stream.sparkSession, path,
      bits, idCol, tsCol, "sampleIngest")
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.storage.SampleStore.append(batch, path,
          sketchBatchKey(checkpointDir, batchId), idCol, tsCol, bits,
          validateRate = false)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }

  /** Stream-maintained STRATIFIED sample tier: each micro-batch samples
    * itself under the store's FROZEN stratum→rate map
    * ([[graft.storage.SampleStore.appendStratified]] mines it from the
    * stored rows per batch — metadata-sized; strata the map never saw
    * keep ALL their rows) and appends under a replay-stable key. Same
    * exactness argument as [[sampleIngest]]: membership is a pure
    * function of (id, frozen rate), so a crash-replay re-samples
    * byte-identical rows that collapse in the read-side dedup, and
    * estimates from the streamed store equal the batch build + batch
    * appends over the same rows. */
  def sampleIngestStratified(stream: DataFrame, path: String,
      checkpointDir: String, idCol: String, tsCol: String = "ts",
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.storage.SampleStore.appendStratified(batch, path,
          sketchBatchKey(checkpointDir, batchId), idCol, tsCol)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** The replay-stable identity of one sketch-ingest micro-batch: a hash
    * of the checkpoint location (md5 prefix — the same verbatim string
    * must be passed on restart, the standard Structured Streaming
    * contract) plus the monotone per-checkpoint batch id. Two streams
    * with different checkpoints ingesting into one store get disjoint
    * keys; a crash-replay of batch k reproduces key k exactly. */
  private[graft] def sketchBatchKey(checkpointDir: String,
      batchId: Long): String = {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(checkpointDir.getBytes("UTF-8"))
      .take(4).map(b => f"$b%02x").mkString
    s"$tag#$batchId"
  }

  /** Persist a stream to a metrics dir as sorted parquet blocks: one block
    * per micro-batch (the streaming analog of the reference's periodic
    * persist). Returns the running query; caller stops it.
    */
  def persistStream(df: DataFrame, metricsDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    df.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.sortWithinPartitions("ts")
          .write.mode("append").parquet(metricsDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** Live token leaderboard: running token counts with complete-mode top-k
    * emission. State is the (token, count) aggregation map — bounded by
    * VOCABULARY size, not stream length, so it holds for unbounded streams
    * over natural language (vocabularies plateau in the millions while the
    * corpus grows without bound; partial aggregation combines map-side
    * before the state store sees rows). Sort + limit ride on top of the
    * stateful aggregation, which Structured Streaming permits exactly in
    * complete mode — run this through a complete-mode sink.
    */
  def streamingTopTokens(src: DataFrame, textCol: String,
      topK: Int = 50): DataFrame =
    src.select(explode(graft.pipeline.Text.tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok").asc)
      .limit(topK)

  /** Live count-min sketch: the streaming twin of
    * [[graft.pipeline.Text.countMinSketch]] — one complete-mode global
    * aggregation whose state is the d·w-long counter array itself (64 KiB
    * at the defaults) REGARDLESS of vocabulary or stream length, where
    * [[streamingTopTokens]]' exact map grows with vocabulary. Merge is
    * elementwise sum, so a drained stream's final emission is bit-equal
    * to the batch sketch of the same rows (the shared-oracle property);
    * partial aggregation combines map-side before the state store. */
  def streamingCms(src: DataFrame, textCol: String,
      d: Int = 4, w: Int = 2048): DataFrame = {
    val spark = src.sparkSession
    import spark.implicits._
    src.select(explode(graft.pipeline.Text.tokens(col(textCol))).as("tok"))
      .as[String]
      .select(new graft.pipeline.Text.CountMinAgg(d, w).toColumn)
      .toDF("sk")
  }

  /** Memory-sink runner for tests: starts an AvailableNow query into
    * `spark.table(name)` and returns it STILL RUNNING — await with
    * `processAllAvailable()` (or `awaitTermination`) before reading the
    * table, or it may be empty/partial. */
  def runToMemory(df: DataFrame, name: String): StreamingQuery =
    df.writeStream.outputMode("append")
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
}
