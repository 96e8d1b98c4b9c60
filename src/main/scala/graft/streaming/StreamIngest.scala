package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
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
