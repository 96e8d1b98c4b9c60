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

  /** File-source stream over a directory of Parquet drops (a "WAL directory"
    * shape: producers drop sorted files, the stream folds them in). */
  def fromParquetDir(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  def withEventTime(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.withColumn("__event_time",
      timestamp_micros((col(tsCol) / 1000L).cast("long")))

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
          // close once the watermark passes the session gap
          state.setTimeoutTimestamp((s.last + gapNanos) / 1000000L + 1L)
        }
      }
      out.iterator
    }

    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
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

  /** Memory-sink runner for tests: drains all available input synchronously
    * and returns the sink table name. */
  def runToMemory(df: DataFrame, name: String): StreamingQuery = {
    val q = df.writeStream.outputMode("append")
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q
  }
}
