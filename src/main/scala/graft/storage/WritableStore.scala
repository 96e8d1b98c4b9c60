package graft.storage

import java.util.concurrent.{Executors, ScheduledExecutorService, TimeUnit}
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.TimeNano

/** One ingest row: epoch-nano timestamp + typed field values
  * (`zikeiretsu/src/tsdb/data_types/datapoint.rs:10-13`). */
final case class DataPoint(tsNanos: Long, fields: Seq[Any])

/** Ingest path: buffered, sorted, flushed to Parquet "blocks".
  *
  * Mirrors the reference's `WritableStore`
  * (`zikeiretsu/src/tsdb/store/writable_store/mod.rs`): `push` appends to a
  * dirty buffer; reads/persist first fold the buffer in sorted by (ts,
  * insertion order) — duplicate timestamps are legal and preserved in arrival
  * order (`store/mod.rs:500-521`). `persist` writes the selected range as one
  * sorted Parquet append ("block"), optionally clearing it from memory.
  *
  * Deliberate divergences, documented:
  *  - no WAL: Parquet block writes are atomic-enough for a batch engine (the
  *    reference's WAL, `storage/wal/single_file_wal.rs`, protects an
  *    in-process buffer; ours is re-playable by the caller);
  *  - single-writer per metrics assumed (the reference's lockfiles,
  *    `storage/api/write.rs:184-202`, are out of scope for immutable files);
  *  - blocks are date-bucket partitioned (`__day=YYYY-MM-DD/`) so directory
  *    pruning kicks in before row-group stats at scale.
  */
final class WritableStore(
    spark: SparkSession,
    dbDir: String,
    metrics: String,
    fieldSchema: Seq[StructField],
    validate: Boolean = true,
    partitionByDay: Boolean = false
) {
  import WritableStore._

  private val buffer = ArrayBuffer.empty[DataPoint]
  private var sortedUpTo = 0 // prefix of `buffer` known to be sorted
  private var scheduler: Option[ScheduledExecutorService] = None

  val schema: StructType =
    StructType(StructField("ts", LongType, nullable = false) +: fieldSchema)

  def push(dp: DataPoint): Unit = pushMulti(Seq(dp))

  def pushMulti(dps: Seq[DataPoint]): Unit = synchronized {
    if (validate) dps.foreach { dp =>
      require(dp.fields.length == fieldSchema.length,
        s"field count ${dp.fields.length} != schema ${fieldSchema.length}")
    }
    buffer ++= dps
  }

  /** Sort the dirty suffix and merge — stable, so equal timestamps keep
    * arrival order (reference sorts dirty datapoints then merge-inserts,
    * `writable_store/mod.rs:167-208`). */
  private def applyDirties(): Unit = synchronized {
    if (sortedUpTo < buffer.length) {
      val all = buffer.sortBy(_.tsNanos) // scala sortBy is stable
      buffer.clear()
      buffer ++= all
      sortedUpTo = buffer.length
    }
  }

  def bufferedFrame(): DataFrame = synchronized {
    applyDirties()
    toDf(buffer.toSeq)
  }

  /** Coerce a pushed value to its declared field type. Scala harmonizes
    * mixed numeric Seq literals (`Seq(1L, 1.0)` becomes `Seq[Double]`), so
    * boxed types at the push site routinely drift from the schema; ingest
    * normalizes instead of failing deep inside the row encoder. */
  private def coerce(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _)                  => null
    case (n: Number, LongType)      => n.longValue()
    case (n: Number, DoubleType)    => n.doubleValue()
    case (n: Number, IntegerType)   => n.intValue()
    case (n: Number, FloatType)     => n.floatValue()
    case (n: Number, ShortType)     => n.shortValue()
    case (n: Number, ByteType)      => n.byteValue()
    case (other, _)                 => other
  }

  private def toDf(dps: Seq[DataPoint]): DataFrame = {
    val fieldTypes = schema.fields.map(_.dataType)
    val rows = dps.map { dp =>
      val vals = (dp.tsNanos +: dp.fields).zip(fieldTypes)
        .map { case (v, dt) => coerce(v, dt) }
      Row.fromSeq(vals)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, rows.length / 500000 + 1)),
      schema)
  }

  /** Flush buffered rows in `[since, until)` (None = all) to a Parquet block;
    * `clearAfter` evicts them from the buffer (reference
    * `persist(PersistCondition)` `writable_store/mod.rs:230-275`). */
  def persist(since: Option[Long] = None, until: Option[Long] = None,
      clearAfter: Boolean = true): Long = synchronized {
    applyDirties()
    val inRange = buffer.toSeq.filter { dp =>
      since.forall(dp.tsNanos >= _) && until.forall(dp.tsNanos < _)
    }
    if (inRange.nonEmpty) {
      val df = toDf(inRange).sortWithinPartitions("ts")
      val w0 = df.coalesce(math.max(1, inRange.length / 2000000))
      val target = new java.io.File(dbDir, metrics).getPath
      if (partitionByDay) {
        // pure integer floor-div to epoch day — must match Tables.readRange's
        // Math.floorDiv pruning exactly, independent of session timezone and
        // immune to double rounding (epoch nanos exceed 2^53, so `/` on longs
        // — which returns double — is not exact; `div` stays integral)
        val dayNs = 86400L * 1000000000L
        val epochDay =
          expr(s"(ts - pmod(ts, ${dayNs}L)) div ${dayNs}L").cast("int")
        w0.withColumn(PartitionCol,
            date_from_unix_date(epochDay).cast("string"))
          .write.mode("append").partitionBy(PartitionCol).parquet(target)
      } else {
        w0.write.mode("append").parquet(target)
      }
      if (clearAfter) {
        val keep = buffer.toSeq.filterNot { dp =>
          since.forall(dp.tsNanos >= _) && until.forall(dp.tsNanos < _)
        }
        buffer.clear(); buffer ++= keep; sortedUpTo = buffer.length
      }
    }
    inRange.length.toLong
  }

  /** Range-delete from the in-memory buffer
    * (`writable_store/mod.rs:215-227`). */
  def purge(since: Long, until: Long): Unit = synchronized {
    applyDirties()
    val keep = buffer.toSeq.filterNot(dp => dp.tsNanos >= since && dp.tsNanos < until)
    buffer.clear(); buffer ++= keep; sortedUpTo = buffer.length
  }

  /** Periodic persistence daemon
    * (`store/writable_store/persistence.rs:54-131`); `shutdown()` does a
    * final flush. */
  def startPeriodicPersist(intervalMillis: Long): Unit = synchronized {
    require(scheduler.isEmpty, "already started")
    val ex = Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, s"graft-persist-$metrics"); t.setDaemon(true); t
    })
    ex.scheduleAtFixedRate(() => persist(), intervalMillis, intervalMillis,
      TimeUnit.MILLISECONDS)
    scheduler = Some(ex)
  }

  def shutdown(): Unit = synchronized {
    scheduler.foreach { ex => ex.shutdown(); ex.awaitTermination(10, TimeUnit.SECONDS) }
    scheduler = None
    persist()
    ()
  }

  def bufferedCount: Int = synchronized(buffer.length)
}

object WritableStore {
  /** Date-bucket partition column written by [[WritableStore.persist]];
    * stripped from the logical schema on read ([[Tables.read]]). */
  val PartitionCol = "__day"
}
