package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-series sequential recurrences — smoothing and changepoint state that
  * window functions cannot express (each output depends on the previous
  * OUTPUT, not on a frame of inputs): integer EWMA and CUSUM.
  *
  * Execution shape: `repartition(keys) → sortWithinPartitions(keys, ts, id)
  * → mapPartitions` streaming each partition once with O(1) state per
  * series — the batch analog of `mapGroupsWithState`, and the only tier in
  * the engine allowed an imperative per-partition loop (SURVEY's
  * "mapPartitions as a last resort" clause: these recurrences are the
  * genuine case). Memory is independent of series length — state is a few
  * longs, rows stream through the sort iterator — so a single 10-year
  * series costs no more RAM than a 10-minute one; parallelism is across
  * series (hash partitioning), which is the right axis at 100 TB where
  * series are many and each is time-ordered anyway.
  *
  * All arithmetic is integer (value cents, power-of-two smoothing), so
  * results are engine-exact and oracle-checkable against a DuckDB
  * recursive CTE computing the same recurrence.
  */
object RecurrenceOps {

  /** Shared prepare: project to (keys..., ts, id, cents), drop rows whose
    * value does not cast (they must not perturb state — the posture every
    * anomaly op in the engine takes), co-locate each series on one
    * partition and sort it by (keys, ts, id) for a deterministic fold. */
  private[graft] def prepared(df: DataFrame, keyCols: Seq[String],
      tsCol: String, idCol: String, valueCol: String): DataFrame = {
    val cents = (col(valueCol).cast("decimal(18,2)") * 100).cast("long")
    df.select((keyCols.map(c => col(c).cast("long").as(c)) ++
        Seq(col(tsCol).cast("long").as("ts"), col(idCol).cast("long").as("id"),
          cents.as("c"))): _*)
      .filter(col("c").isNotNull &&
        keyCols.map(col(_).isNotNull).reduce(_ && _) &&
        col("ts").isNotNull && col("id").isNotNull)
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions((keyCols :+ "ts" :+ "id").map(col): _*)
  }

  /** One streamed pass over the sorted partition: `step` folds each row's
    * cents through per-series state (reset on key change) and returns the
    * extra output columns appended after (keys..., ts, id, c). */
  private def foldPartitions(p: DataFrame, nKeys: Int, extra: Seq[StructField])
      (init: Long => Array[Long])(step: (Array[Long], Long) => Seq[Long])
      : DataFrame = {
    val spark = p.sparkSession
    val outSchema = StructType(p.schema.fields ++ extra)
    val rdd = p.rdd.mapPartitions { it =>
      var key: Seq[Long] = null
      var state: Array[Long] = null
      it.map { r =>
        val k = (0 until nKeys).map(r.getLong)
        val c = r.getLong(nKeys + 2)
        if (key != k) { key = k; state = init(c) }
        val outs = step(state, c)
        Row.fromSeq(r.toSeq ++ outs)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Integer exponentially-weighted moving average per series, smoothing
    * factor α = 1/2^`alphaLog2`. State is the 2^a-scaled mean
    * `m` (init m₁ = c₁·2^a, then mᵢ = mᵢ₋₁ − ⌊mᵢ₋₁/2^a⌋ + cᵢ): the
    * floor-division recurrence is the engine's DEFINED semantic — exact
    * integers end to end, a constant series holds exactly steady
    * (⌊c·2^a/2^a⌋ = c), and per-step rounding drift is bounded by 1 scaled
    * unit. Emits `ewma_num` (the scaled state, exact) and `ewma_cents`
    * (⌊m/2^a⌋, display). Power-of-two α keeps every operation a
    * shift/subtract — no float enters at any point, so a DuckDB recursive
    * CTE reproduces the sequence bit-for-bit.
    */
  def ewma(df: DataFrame, keyCols: Seq[String], alphaLog2: Int = 4,
      valueCol: String = "value", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    require(alphaLog2 >= 1 && alphaLog2 <= 20, "alphaLog2 in [1, 20]")
    val scale = 1L << alphaLog2
    val p = prepared(df, keyCols, tsCol, idCol, valueCol)
    foldPartitions(p, keyCols.length, Seq(
      StructField("ewma_num", LongType, nullable = false),
      StructField("ewma_cents", LongType, nullable = false))) { c =>
      Array(c * scale)
    } { (st, c) =>
      st(0) = st(0) - Math.floorDiv(st(0), scale) + c
      Seq(st(0), Math.floorDiv(st(0), scale))
    }.withColumnRenamed("c", "cents")
  }

  /** Integer Holt linear-trend smoothing per series — level + trend state
    * with α = 1/2^`alphaLog2`, β = 1/2^`betaLog2`, both components in
    * 2^`scaleLog2` fixed point (M). The defined recurrences (floor
    * division throughout, `Math.floorDiv` so negative trends round the
    * same way DuckDB's `//` does):
    *
    *   l_t = l₋ + b₋ + ⌊(c_t·M − l₋ − b₋) / 2^α⌋
    *   b_t = b₋ + ⌊(l_t − l₋ − b₋) / 2^β⌋        (l₋,b₋ = previous state)
    *
    * init l₁ = c₁·M, b₁ = 0. Emits the scaled state plus the one-step
    * forecast `fc1_cents = ⌊(l + b) / M⌋` — the "what should the next
    * point be" signal a drift monitor or gap-filler consumes. A constant
    * series is a fixed point (l = c·M, b = 0); a perfect linear ramp
    * converges to b = slope·M. Same sorted-fold execution and
    * recursive-CTE oracle story as [[ewma]].
    */
  def holt(df: DataFrame, keyCols: Seq[String], alphaLog2: Int = 3,
      betaLog2: Int = 4, scaleLog2: Int = 20, valueCol: String = "value",
      tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    require(alphaLog2 >= 1 && betaLog2 >= 1 && scaleLog2 <= 30)
    val m = 1L << scaleLog2
    val (a, b) = (1L << alphaLog2, 1L << betaLog2)
    val p = prepared(df, keyCols, tsCol, idCol, valueCol)
    foldPartitions(p, keyCols.length, Seq(
      StructField("level_num", LongType, nullable = false),
      StructField("trend_num", LongType, nullable = false),
      StructField("fc1_cents", LongType, nullable = false))) { c =>
      Array(c * m, 0L)
    } { (st, c) =>
      val (l0, b0) = (st(0), st(1))
      val drift = l0 + b0
      val l1 = drift + Math.floorDiv(c * m - drift, a)
      val b1 = b0 + Math.floorDiv(l1 - drift, b)
      st(0) = l1; st(1) = b1
      Seq(l1, b1, Math.floorDiv(l1 + b1, m))
    }.withColumnRenamed("c", "cents")
  }

  /** Two-sided integer CUSUM changepoint statistic per series: with
    * deviation d = c − `targetCents`, the classic recurrences
    * S⁺ᵢ = max(0, S⁺ᵢ₋₁ + d − `slackCents`) and
    * S⁻ᵢ = max(0, S⁻ᵢ₋₁ − d − `slackCents`) accumulate sustained drift
    * above/below target while the slack absorbs noise; `alarm` is 1 when
    * either side exceeds `thresholdCents`. Pure integer — exact across
    * engines — and sequential by construction (each S depends on the
    * previous S after clamping), which is why it lives in this tier and
    * not in a window. Both statistics reset to 0 on alarm (restart
    * detection), the standard page-test behavior.
    */
  def cusum(df: DataFrame, keyCols: Seq[String], targetCents: Long,
      slackCents: Long, thresholdCents: Long, valueCol: String = "value",
      tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    val p = prepared(df, keyCols, tsCol, idCol, valueCol)
    foldPartitions(p, keyCols.length, Seq(
      StructField("s_pos", LongType, nullable = false),
      StructField("s_neg", LongType, nullable = false),
      StructField("alarm", LongType, nullable = false))) { _ =>
      Array(0L, 0L)
    } { (st, c) =>
      val d = c - targetCents
      st(0) = Math.max(0L, st(0) + d - slackCents)
      st(1) = Math.max(0L, st(1) - d - slackCents)
      val alarm = if (st(0) > thresholdCents || st(1) > thresholdCents) 1L else 0L
      val out = Seq(st(0), st(1), alarm)
      if (alarm == 1L) { st(0) = 0L; st(1) = 0L }
      out
    }.withColumnRenamed("c", "cents")
  }

  /** Largest-triangle-three-buckets downsampling (Steinarsson 2013,
    * "Downsampling Time Series for Visual Representation", University of
    * Iceland) on a fixed time grid — the visual-fidelity decimation a
    * dashboard-serving TSDB applies before shipping a dense series to a
    * renderer: per series keep the FIRST sample, then for every interior
    * grid bucket the single point forming the largest triangle with the
    * previously kept point and the NEXT bucket's average point, then the
    * LAST sample. Spikes and inflections survive where min/max or mean
    * decimation flattens them.
    *
    * Engine-exact semantics (every choice reproducible by the SQL oracle):
    *  - buckets are the absolute `⌊ts/bucketNanos⌋` grid; the bucket
    *    holding the first sample contributes ONLY that sample (the
    *    canonical first-bucket rule, time-gridded);
    *  - x is whole SECONDS relative to the series' first sample, y is
    *    value cents; the doubled-triangle-area comparison is cleared of
    *    the next-bucket average's division by multiplying through by its
    *    count n — `|(ax·n − Σx)·(py − ay) − (ax − px)·(Σy − ay·n)|`, all
    *    exact BigInt, no float anywhere;
    *  - ties take the earliest (ts, id) candidate;
    *  - the selection recurrence (each choice depends on the previous
    *    CHOICE) is why this lives in the sequential tier: a window cannot
    *    express it.
    *
    * Execution: the shared sorted-fold layout with TWO-bucket lookahead —
    * per series the fold holds the bucket awaiting selection plus the
    * accumulating next bucket (the average the choice needs), so memory is
    * two buckets of samples + the m selected points, never the series.
    * Parallelism across series, the downsample output is m+2 points per
    * series by construction. No streaming twin BY DESIGN: each choice
    * needs the complete NEXT bucket, so any stream emits at one-bucket
    * latency — batch recompute over the closed range is the honest shape.
    */
  def lttb(df: DataFrame, keyCols: Seq[String], bucketNanos: Long,
      valueCol: String = "value", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    require(bucketNanos > 0, "lttb needs a positive bucket width")
    val p = prepared(df, keyCols, tsCol, idCol, valueCol)
    val spark = p.sparkSession
    val nKeys = keyCols.length
    val outSchema = StructType(p.schema.fields)
    val rdd = p.rdd.mapPartitions { it =>
      val bit = it.buffered
      def keyOf(r: Row): Seq[Long] = (0 until nKeys).map(r.getLong)
      new Iterator[Row] {
        private var queue: Iterator[Row] = Iterator.empty
        override def hasNext: Boolean = queue.hasNext || bit.hasNext
        override def next(): Row = {
          while (!queue.hasNext && bit.hasNext) {
            val key = keyOf(bit.head)
            queue = lttbSeries(new Iterator[Row] {
              def hasNext: Boolean = bit.hasNext && keyOf(bit.head) == key
              def next(): Row = bit.next()
            }, nKeys, bucketNanos).iterator
          }
          queue.next()
        }
      }
    }
    spark.createDataFrame(rdd, outSchema).withColumnRenamed("c", "cents")
  }

  /** One series' LTTB walk (rows pre-sorted by (ts, id)). */
  private def lttbSeries(rows: Iterator[Row], nKeys: Int,
      w: Long): Seq[Row] = {
    final case class Pt(row: Row, rel: Long, c: Long, ts: Long, id: Long)
    val out = scala.collection.mutable.ArrayBuffer[Row]()
    var tsMin = 0L
    var ax = 0L; var ay = 0L // previously KEPT point (x rel-sec, y cents)
    var b1 = 0L
    var pending: scala.collection.mutable.ArrayBuffer[Pt] = null
    var cur: scala.collection.mutable.ArrayBuffer[Pt] = null
    var curId = 0L
    var anchorTs = 0L; var anchorId = 0L
    var last: Pt = null
    var first = true
    def select(): Unit = { // choose from `pending` against avg(`cur`)
      val n = BigInt(cur.length)
      var sx = BigInt(0); var sy = BigInt(0)
      cur.foreach { q => sx += q.rel; sy += q.c }
      var best: Pt = null; var bestScore = BigInt(-1)
      pending.foreach { q => // sorted (ts, id) ⇒ strict > keeps earliest tie
        val score = ((BigInt(ax) * n - sx) * BigInt(q.c - ay) -
          BigInt(ax - q.rel) * (sy - BigInt(ay) * n)).abs
        if (score > bestScore) { best = q; bestScore = score }
      }
      out += best.row
      ax = best.rel; ay = best.c
    }
    while (rows.hasNext) {
      val r = rows.next()
      val ts = r.getLong(nKeys); val id = r.getLong(nKeys + 1)
      val c = r.getLong(nKeys + 2)
      if (first) {
        first = false; tsMin = ts; b1 = Math.floorDiv(ts, w)
        out += r; ax = 0L; ay = c; anchorTs = ts; anchorId = id
      }
      val pt = Pt(r, Math.floorDiv(ts - tsMin, 1000000000L), c, ts, id)
      last = pt
      val b = Math.floorDiv(ts, w)
      if (b != b1) { // the anchor bucket's tail never enters the buffers
        if (cur == null) { cur = scala.collection.mutable.ArrayBuffer(pt); curId = b }
        else if (b == curId) cur += pt
        else { // a new bucket opens ⇒ `cur` is complete
          if (pending != null) select()
          pending = cur
          cur = scala.collection.mutable.ArrayBuffer(pt); curId = b
        }
      }
    }
    if (cur != null) {
      if (pending != null) select() // second-to-last bucket, vs avg(last)
      out += cur.last.row           // the series' last sample
    } else if (last != null && (last.ts != anchorTs || last.id != anchorId)) {
      out += last.row // single-bucket series: first + last
    }
    out.toSeq
  }
}
