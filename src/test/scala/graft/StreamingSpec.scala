package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.StreamIngest
import graft.storage.{DataPoint, Tables, WritableStore}

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val schema = StructType(Seq(
    StructField("ts", LongType), StructField("value", DoubleType)))

  test("streaming windowed downsample over a parquet drop dir") {
    val dir = SparkTestBase.tempDir("graft-stream-in")
    // write a batch of source data as a "drop"
    val store = new WritableStore(spark, dir, "m", Seq(StructField("value", DoubleType)))
    val base = 1700000100L * 1000000000L // minute-aligned epoch second
    store.pushMulti((0 until 600).map(i =>
      DataPoint(base + i.toLong * 1000000000L, Seq(i.toDouble))))
    store.persist()

    val src = StreamIngest.fromParquetDir(spark,
      new java.io.File(dir, "m").getPath, schema)
    val agg = StreamIngest.windowedDownsample(src, "value", "1 minute", "2 minutes")
    val q = StreamIngest.runToMemory(agg, "stream_out")
    q.processAllAvailable()
    q.stop()
    val out = spark.table("stream_out").orderBy("bucket_start_us").collect()
    // 600s of data in 1-min windows → windows fully before watermark emit;
    // append mode holds back the last (incomplete-watermark) windows
    assert(out.length >= 7)
    assert(out.head.getAs[Long]("n") == 60L)
    assert(out.head.getAs[Double]("min_v") == 0.0)
    assert(out.head.getAs[Double]("max_v") == 59.0)
  }

  test("stateful streaming sessionize emits closed sessions") {
    val dir = SparkTestBase.tempDir("graft-sess-in")
    val store = new WritableStore(spark, dir, "m", Seq(
      StructField("user_id", LongType), StructField("value", DoubleType)))
    val base = 1700000100L * 1000000000L
    val sec = 1000000000L
    // user 1: two sessions (gap 600s > 300s); user 2: one session
    store.pushMulti(Seq(
      DataPoint(base, Seq(1L, 1.0)),
      DataPoint(base + 10 * sec, Seq(1L, 2.0)),
      DataPoint(base + 610 * sec, Seq(1L, 3.0)),
      DataPoint(base + 5 * sec, Seq(2L, 4.0)),
      // far-future event per user advances the watermark so earlier
      // sessions time out and emit
      DataPoint(base + 100000 * sec, Seq(1L, 0.0)),
      DataPoint(base + 100000 * sec, Seq(2L, 0.0))))
    store.persist()
    val schema = StructType(Seq(StructField("ts", LongType),
      StructField("user_id", LongType), StructField("value", DoubleType)))
    val src = StreamIngest.fromParquetDir(spark,
      new java.io.File(dir, "m").getPath, schema)
    val sessions = StreamIngest.statefulSessionize(src, 300L * sec)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val out = spark.table("sess_out")
      .orderBy("user_id", "session_start").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getDouble(4)))
    // closed sessions: user1 [base, base+10s] n=2 sum=3.0; user1 [610s] n=1
    // sum=3.0; user2 [5s] n=1 sum=4.0 (the far-future ones stay open)
    assert(out.length == 3, out.mkString(","))
    assert(out(0) == (1L, 2L, 3.0))
    assert(out(1) == (1L, 1L, 3.0))
    assert(out(2) == (2L, 1L, 4.0))
  }

  test("persistStream writes sorted parquet blocks per micro-batch") {
    val inDir = SparkTestBase.tempDir("graft-stream-in2")
    val outDir = SparkTestBase.tempDir("graft-stream-out")
    val ck = SparkTestBase.tempDir("graft-stream-ck")
    val store = new WritableStore(spark, inDir, "m", Seq(StructField("value", DoubleType)))
    store.pushMulti((0 until 100).map(i =>
      DataPoint(1700000000000000000L + i, Seq(i.toDouble))))
    store.persist()
    val src = StreamIngest.fromParquetDir(spark,
      new java.io.File(inDir, "m").getPath, schema)
    val q = StreamIngest.persistStream(src, outDir + "/m", ck)
    q.awaitTermination(60000)
    val back = Tables.read(spark, outDir, "m")
    assert(back.count() == 100)
  }
}
