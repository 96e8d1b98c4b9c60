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

  test("sessionize survives a late-but-admitted event whose gap-close " +
      "time is already below the eviction watermark") {
    // Spark admits late events under the PREVIOUS batch's watermark but
    // validates timeout timestamps against the CURRENT one: batch A's
    // 60min event makes batch B's eviction watermark 50min, and batch
    // B's 20min event (admitted — the late filter still reads 0) arms a
    // 25min timeout. Pre-clamp this threw IllegalArgumentException and
    // killed the query; clamped, the session closes at the next sweep.
    import spark.implicits._
    val srcDir = new java.io.File(SparkTestBase.tempDir("graft-sess-late"))
    val t0 = 1700000000L * 1000000000L
    val min = 60L * 1000000000L
    def writeDrop(name: String, modTime: Long,
        rows: Seq[(Long, Long, Double)]): Unit = {
      val stage = SparkTestBase.tempDir("graft-sess-stage")
      rows.toDF("user_id", "ts", "value")
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(srcDir, name)
      java.nio.file.Files.move(part.toPath, dst.toPath)
      assert(dst.setLastModified(modTime))
    }
    writeDrop("a.parquet", 1000000L, Seq((9L, t0 + 60 * min, 0.0)))
    writeDrop("b.parquet", 2000000L, Seq((2L, t0 + 20 * min, 2.0),
      (9L, t0 + 120 * min, 0.0)))
    writeDrop("c.parquet", 3000000L, Seq((9L, t0 + 180 * min, 0.0)))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      StructField("user_id", LongType), StructField("ts", LongType),
      StructField("value", DoubleType)))
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir.getPath)
    val sessions = StreamIngest.statefulSessionize(src, 5L * min)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_late_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000)) // pre-fix: StreamingQueryException
    val u2 = spark.table("sess_late_out").filter($"user_id" === 2L)
      .collect().map(r => (r.getLong(3), r.getDouble(4)))
    assert(u2.toSeq == Seq((1L, 2.0)), u2.mkString(","))
  }

  test("streaming as-of join across micro-batches: late drop + carry match") {
    import spark.implicits._
    val srcDir = new java.io.File(SparkTestBase.tempDir("graft-asof-in"))
    val t0 = 1700000000L * 1000000000L
    val sec = 1000000000L
    def writeDrop(name: String, modTime: Long,
        rows: Seq[(Long, Long, Long, Double, String)]): Unit = {
      val stage = SparkTestBase.tempDir("graft-asof-stage")
      rows.toDF("ts", "user_id", "event_id", "value", "event_type")
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(srcDir, name)
      java.nio.file.Files.move(part.toPath, dst.toPath)
      assert(dst.setLastModified(modTime))
    }
    // batch A: u1 views at t0/t0+20s around purchases at +10s/+1000s;
    // u2 views only; a far-future u9 view at +100000s drives the
    // watermark (only joined types advance it)
    writeDrop("a.parquet", 1000000L, Seq(
      (t0, 1L, 100L, 1.0, "view"),
      (t0 + 10 * sec, 1L, 1L, 10.0, "purchase"),
      (t0 + 20 * sec, 1L, 101L, 2.0, "view"),
      (t0 + 1000 * sec, 1L, 2L, 20.0, "purchase"),
      (t0, 2L, 102L, 3.0, "view"),
      (t0 + 5 * sec, 2L, 103L, 4.0, "view"),
      (t0 + 100000 * sec, 9L, 900L, 0.0, "view")))
    // batch B: a LATE u1 view (below the batch-A watermark — must be
    // dropped, so purchase 1 still matches the view at t0, not this one);
    // a u2 purchase that must match the batch-A carry (view at +5s); a
    // further u9 view so the final watermark passes that purchase
    writeDrop("b.parquet", 2000000L, Seq(
      (t0 + 5 * sec, 1L, 104L, 9.9, "view"),
      (t0 + 99500 * sec, 2L, 3L, 30.0, "purchase"),
      (t0 + 200000 * sec, 9L, 901L, 0.0, "view")))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      StructField("ts", LongType), StructField("user_id", LongType),
      StructField("event_id", LongType), StructField("value", DoubleType),
      StructField("event_type", StringType)))
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir.getPath)
    val joined = StreamIngest.streamingAsof(src, "purchase", "view")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("asof_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000))
    val out = spark.table("asof_out").orderBy("event_id").collect()
      .map(r => (r.getLong(0), r.getAs[Any]("r_ts"), r.getAs[Any]("r_value")))
    assert(out.length == 3, out.mkString(","))
    assert(out(0) == (1L, t0, 1.0))                  // late view 104 dropped
    assert(out(1) == (2L, t0 + 20 * sec, 2.0))
    assert(out(2) == (3L, t0 + 5 * sec, 4.0))        // matched via carry
  }

  test("streaming near-dup flags incoming docs against a static ref index") {
    import spark.implicits._
    val dir = SparkTestBase.tempDir("graft-neardup-in")
    // existing corpus: two distinct docs
    val ref = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely different content about spark shuffles and joins")
    ).toDF("doc_id", "text")
    // incoming stream: doc 10 is a near-copy of ref doc 1 (one token
    // changed), doc 11 is novel
    Seq(
      (10L, "the quick brown fox jumps over the lazy cat again and again"),
      (11L, "yet another unrelated document with its own vocabulary here")
    ).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(new java.io.File(dir, "in").getPath)
    val src = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
      .parquet(new java.io.File(dir, "in").getPath)
      .withColumn("__ns", ((col("doc_id") + 86400L) * 1000000000L).cast("long"))
    // 32×2 banding: the planted pair's jaccard is ~0.54, and 16×4 bands
    // would miss its bucket collision ~24% of the time — wider/shallower
    // bands make the collision near-certain (miss prob ~2e-5)
    val matches = StreamIngest.streamingNearDup(
      src, ref, "doc_id", "text", "__ns", "1 hour",
      threshold = 0.5, bands = 32, rowsPerBand = 2, maxShingleDf = 0)
    val q = StreamIngest.runToMemory(matches, "neardup_out")
    q.processAllAvailable()
    q.stop()
    val out = spark.table("neardup_out").orderBy("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(5)))
    assert(out.length == 1)
    assert(out(0)._1 == 1L && out(0)._2 == 10L && out(0)._3 > 0.5)
  }

  test("streaming contamination probes incoming docs against a literal eval set") {
    import spark.implicits._
    val dir = SparkTestBase.tempDir("graft-contam-in")
    val evalDf = Seq(
      (100L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    // doc 10 = verbatim eval leak (7/7 trigrams), doc 11 clean
    Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),
      (11L, "yet another unrelated document with its own vocabulary here")
    ).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(new java.io.File(dir, "in").getPath)
    val src = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
      .parquet(new java.io.File(dir, "in").getPath)
    val flagged = StreamIngest.streamingContamination(
      src, evalDf, "doc_id", "text")
    val q = StreamIngest.runToMemory(flagged, "contam_out")
    q.processAllAvailable()
    q.stop()
    val out = spark.table("contam_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((10L, 7L, 7L)))
  }

  test("streaming boilerplate removal equals the batch cleaned text") {
    import spark.implicits._
    val dir = SparkTestBase.tempDir("graft-boiler-in")
    val corpus = Seq(
      (0L, "common header text here alpha beta gamma delta"),
      (1L, "common header text here epsilon zeta eta theta"),
      (2L, "common header text here iota kappa lambda mu"),
      (3L, "totally unique document body with eight words here"))
      .toDF("doc_id", "text")
    corpus.write.mode("overwrite")
      .parquet(new java.io.File(dir, "in").getPath)
    val src = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
      .parquet(new java.io.File(dir, "in").getPath)
    val cleaned = StreamIngest.streamingRemoveBoilerplate(
      src, corpus, "doc_id", "text", size = 4, minDf = 3)
    val q = StreamIngest.runToMemory(cleaned, "boiler_out")
    q.processAllAvailable()
    q.stop()
    val got = spark.table("boiler_out").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    val want = graft.pipeline.Text.removeBoilerplate(
        corpus, "doc_id", "text", size = 4, minDf = 3)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got == want)
    assert(got(0)._2 == "alpha beta gamma delta") // header stripped
  }

  test("streaming user-day ledger: once-only emission, cohort carried") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val dir = SparkTestBase.tempDir("graft-udays-in")
    val in = new java.io.File(dir, "in").getPath
    val schema = StructType(Seq(StructField("user_id", LongType),
      StructField("ts", LongType)))
    // batch 1 (day = ts div 10): user 1 active days 0 and 2 (dup event on
    // day 2 emits once); user 2 day 1
    Seq((1L, 1L), (1L, 21L), (1L, 25L), (2L, 12L)).toDF("user_id", "ts")
      .write.parquet(s"$in/b1")
    val src = spark.readStream.schema(schema).parquet(s"$in/*")
    val ledger = StreamIngest.streamingUserDays(src, "user_id", "ts",
      dayNanos = 10L)
    val ck = SparkTestBase.tempDir("graft-udays-ck")
    val outDir = new java.io.File(SparkTestBase.tempDir("graft-udays-out"),
      "rows").getPath
    def drain(): Unit = {
      val q = ledger.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.write.mode("append").parquet(outDir)
        }
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000); q.stop()
    }
    drain()
    // batch 2: user 1 re-seen on day 2 (no emission) and new on day 3
    // (cohort 0 carried → offset 3)
    Seq((1L, 27L), (1L, 35L)).toDF("user_id", "ts").write.parquet(s"$in/b2")
    drain()
    // batch 3: user 2 late-arrives PRE-cohort day 0 — the bitmap
    // re-anchors (shift path) and the row emits with a negative offset
    // against the pinned cohort day 1
    Seq((2L, 3L)).toDF("user_id", "ts").write.parquet(s"$in/b3")
    drain()
    // batch 4: re-send both of user 2's days — the shifted bitmap must
    // still know them (no emission), proving re-anchoring kept old bits
    Seq((2L, 5L), (2L, 14L)).toDF("user_id", "ts").write.parquet(s"$in/b4")
    drain()
    val out = spark.read.parquet(outDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted
    assert(out.toSeq == Seq((1L, 0L, 0L, 0L), (1L, 2L, 0L, 2L),
      (1L, 3L, 0L, 3L), (2L, 0L, 1L, -1L), (2L, 1L, 1L, 0L)))
  }

  test("user-day ledger restart: retention rollup equals batch operator") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    // real corpus split mid-stream: the ledger drains half the events,
    // restarts from its checkpoint, drains the rest — the cohort rollup
    // on the accumulated sink must equal the single-shot batch operator
    // on the full table (cohort state provably survived the restart).
    val events = graft.storage.Tables.read(spark, "/root/testdata/sf0.001",
      "events").select("user_id", "ts")
    val dayNs = 86400L * 1000000000L
    val dir = SparkTestBase.tempDir("graft-udret-in")
    val in = new java.io.File(dir, "in").getPath
    // split at the mid-span DAY: batch 1 holds every user's early days,
    // so the cohorts pinned there must survive the restart for batch-2
    // offsets to come out right (live semantics pin cohort at first
    // ARRIVAL — a parity split would legitimately diverge from batch)
    val dayCol = expr(s"ts div ${dayNs}L")
    val bounds = events.select(min(dayCol), max(dayCol)).head
    val midDay = (bounds.getLong(0) + bounds.getLong(1)) / 2
    events.filter(dayCol < midDay).write.parquet(s"$in/b1")
    val schema = events.schema
    val src = spark.readStream.schema(schema).parquet(s"$in/*")
    val ledger = StreamIngest.streamingUserDays(src, "user_id", "ts", dayNs)
    val ck = SparkTestBase.tempDir("graft-udret-ck")
    val outDir = new java.io.File(SparkTestBase.tempDir("graft-udret-out"),
      "rows").getPath
    def drain(): Unit = {
      val q = ledger.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.write.mode("append").parquet(outDir)
        }
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000); q.stop()
    }
    drain()
    events.filter(dayCol >= midDay).write.parquet(s"$in/b2")
    drain()
    val sink = spark.read.parquet(outDir)
    // ledger rows are exactly-once → distinct == identity; cohort rollup
    val streamed = sink.groupBy("cohort_day", "day_offset")
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort_day", "day_offset").collect().toSeq
    val batch = graft.operators.TsOps.retention(events, "user_id", dayNs)
      .orderBy("cohort_day", "day_offset").collect().toSeq
    assert(streamed.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) ==
      batch.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))))
  }

  test("streaming transitions: cross-batch carry via last-event state") {
    import spark.implicits._
    val dir = SparkTestBase.tempDir("graft-trans-in")
    val schema = StructType(Seq(StructField("user_id", LongType),
      StructField("ts", LongType), StructField("event_id", LongType),
      StructField("event_type", StringType)))
    import org.apache.spark.sql.streaming.Trigger
    val in = new java.io.File(dir, "in").getPath
    // batch 1: user 1 a@1, b@2 → pair (a,b); user 2 single x@5 → none yet
    Seq((1L, 1L, 10L, "a"), (1L, 2L, 11L, "b"), (2L, 5L, 12L, "x"))
      .toDF("user_id", "ts", "event_id", "event_type")
      .write.parquet(s"$in/b1")
    val src = spark.readStream.schema(schema).parquet(s"$in/*")
    val pairs = StreamIngest.streamingTransitions(
      src, "user_id", "ts", "event_id", "event_type")
    val ck = SparkTestBase.tempDir("graft-trans-ck")
    val outDir = new java.io.File(SparkTestBase.tempDir("graft-trans-out"),
      "rows").getPath
    def drain(): Unit = {
      val q = pairs.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.write.mode("append").parquet(outDir)
        }
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000); q.stop()
    }
    drain()
    // batch 2: user 2's null-typed event advances the pointer without
    // emitting (batch lead semantics), then y pairs against IT
    Seq((2L, 6L, 13L, null: String), (2L, 7L, 14L, "y"))
      .toDF("user_id", "ts", "event_id", "event_type")
      .write.parquet(s"$in/b2")
    drain()
    val out = spark.read.parquet(outDir).collect()
      .map(r => (Option(r.getString(0)), r.getString(1))).sorted
    assert(out.toSeq == Seq((None, "y"), (Some("a"), "b")))
  }

  test("streaming top tokens: complete-mode leaderboard equals batch counts") {
    import spark.implicits._
    val dir = SparkTestBase.tempDir("graft-toptok-in")
    Seq((0L, "a b b c"), (1L, "b c c z"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(new java.io.File(dir, "in").getPath)
    val src = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
      .parquet(new java.io.File(dir, "in").getPath)
    val top = StreamIngest.streamingTopTokens(src, "text", topK = 3)
    val q = top.writeStream.outputMode("complete")
      .format("memory").queryName("toptok_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("toptok_out")
      .orderBy(col("n").desc, col("tok").asc).collect()
      .map(r => r.getAs[String]("tok") -> r.getAs[Long]("n"))
    // b=3, c=3 (tie → lexical), a/z=1 → top-3 keeps the lexically-first 1
    assert(out.toSeq == Seq("b" -> 3L, "c" -> 3L, "a" -> 1L))
  }

  test("streaming IVF ingest makes new vectors probe-visible, no rebuild") {
    import spark.implicits._
    import graft.pipeline.Similarity
    val base = SparkTestBase.tempDir("graft-ivf-ingest")
    val idx = new java.io.File(base, "idx").getPath
    // two well-separated cells; base corpus holds one vector per cell
    val cents = Seq((0L, Array(1f, 0f, 0f)), (1L, Array(0f, 1f, 0f)))
      .toDF("cid", "cvec")
    val corpus = Seq((10L, Array(0.9f, 0.1f, 0f)), (11L, Array(0.1f, 0.9f, 0f)))
      .toDF("vec_id", "embedding")
    Similarity.writeIvf(Similarity.ivfAssign(corpus, cents), idx)
    val q = Seq((0L, Array(1f, 0f, 0f))).toDF("qid", "qvec")
    def top(): Seq[Long] =
      Similarity.ivfKnnStored(spark, idx, cents, q, k = 2, nprobe = 1,
          excludeSelf = false)
        .orderBy("rank").collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(top() == Seq(10L)) // cell 0 holds one vector pre-ingest
    // stream two new vectors in: 20 lands in cell 0 closer than 10
    Seq((20L, Array(0.99f, 0.01f, 0f)), (21L, Array(0f, 0.8f, 0.2f)))
      .toDF("vec_id", "embedding")
      .write.parquet(new java.io.File(base, "in").getPath)
    val src = spark.readStream.schema(corpus.schema)
      .parquet(new java.io.File(base, "in").getPath)
    val qy = StreamIngest.ivfIngest(src, cents, idx,
      new java.io.File(base, "ck").getPath)
    qy.processAllAvailable(); qy.stop()
    assert(top() == Seq(20L, 10L)) // streamed vector visible and ranked first
    // the base files were appended to, never rewritten: both cells exist
    val files = new java.io.File(idx).listFiles().map(_.getName).sorted
    assert(files.count(_.startsWith("cid=")) == 2, files.toSeq)
    // cell 0 now holds base + streamed files; compaction folds each cell
    // to one file and the probe result is unchanged
    def cellFiles(c: Long): Int = new java.io.File(idx, s"cid=$c")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(cellFiles(0L) >= 2)
    Similarity.compactIvf(spark, idx)
    assert(cellFiles(0L) == 1 && cellFiles(1L) == 1)
    assert(top() == Seq(20L, 10L))
  }

  test("streaming embed near-dup flags an incoming twin, skips novel vectors") {
    import spark.implicits._
    val dir = SparkTestBase.tempDir("graft-embneardup-in")
    // reference corpus: two well-separated vectors
    val ref = Seq((1L, Array(1f, 0f, 0f, 0f)), (2L, Array(0f, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    // stream: doc 10 is a near-twin of ref 1 (cos ~ 0.9997), 11 is novel
    Seq((10L, Array(0.99f, 0.02f, 0f, 0f)), (11L, Array(0f, 0f, 0f, 1f)))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(new java.io.File(dir, "in").getPath)
    val src = spark.readStream
      .schema(StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
      .parquet(new java.io.File(dir, "in").getPath)
      .withColumn("__ns", ((col("vec_id") + 86400L) * 1000000000L).cast("long"))
    val pairs = StreamIngest.streamingEmbedNearDup(
      src, ref, "vec_id", "embedding", "__ns", "1 hour",
      threshold = 0.9, dims = 4, numPlanes = 6)
    val q = StreamIngest.runToMemory(pairs, "embnd_out")
    q.processAllAvailable()
    q.stop()
    val out = spark.table("embnd_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == 1)
    assert(out(0)._1 == 1L && out(0)._2 == 10L && out(0)._3 > 0.99)
    // the signature index persisted for the query's lifetime; releaseIndex
    // drops exactly those blocks (and only once — second call is a no-op)
    val persistedBefore = spark.sparkContext.getPersistentRDDs.size
    assert(persistedBefore > 0)
    StreamIngest.releaseIndex(pairs)
    assert(spark.sparkContext.getPersistentRDDs.size < persistedBefore)
    StreamIngest.releaseIndex(pairs) // idempotent
  }

  test("streaming funnel completes across batches, emits once per key") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val dir = SparkTestBase.tempDir("graft-funnel")
    val in = new java.io.File(dir, "in").getPath
    // batch 1: user 1 views and clicks; user 2 views only
    Seq((1L, 10L, "view"), (1L, 20L, "click"), (2L, 15L, "view"))
      .toDF("user_id", "ts", "event_type").write.parquet(s"$in/b1")
    val schema = StructType(Seq(StructField("user_id", LongType),
      StructField("ts", LongType), StructField("event_type", StringType)))
    val src = spark.readStream.schema(schema).parquet(s"$in/*")
    val done = StreamIngest.streamingFunnel(src, "user_id", "ts",
      "event_type", Seq("view", "click", "purchase"), withinNanos = 100L)
    val ck = SparkTestBase.tempDir("graft-funnel-ck")
    val outDir = new java.io.File(SparkTestBase.tempDir("graft-funnel-out"),
      "rows").getPath
    def drain(): Unit = {
      val q = done.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.write.mode("append").parquet(outDir)
        }
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000); q.stop()
    }
    drain()
    assert(!new java.io.File(outDir).exists() ||
      spark.read.parquet(outDir).isEmpty) // nobody finished yet
    // batch 2: user 1 purchases (completes, state carried); user 2's
    // purchase precedes any click → still incomplete
    Seq((1L, 30L, "purchase"), (2L, 25L, "purchase"))
      .toDF("user_id", "ts", "event_type").write.parquet(s"$in/b2")
    drain()
    val out = spark.read.parquet(outDir).collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[Seq[Long]]("ts_list").toList))
    assert(out.toSeq == Seq((1L, List(10L, 20L, 30L))))
    // batch 3: a second purchase must NOT re-emit user 1
    Seq((1L, 40L, "purchase"))
      .toDF("user_id", "ts", "event_type").write.parquet(s"$in/b3")
    drain()
    assert(spark.read.parquet(outDir).count() == 1)
  }

  test("streaming zscore anomalies equal the batch flag set on a drained stream") {
    import spark.implicits._
    val dir = SparkTestBase.tempDir("graft-zsc")
    val ev = graft.storage.Tables.read(spark, "/root/testdata/sf0.001",
        "events")
      .withColumn("ts", col("ts") - pmod(col("ts"), lit(1000L)))
      .select("event_id", "ts", "user_id", "value")
    ev.write.mode("overwrite").parquet(new java.io.File(dir, "in").getPath)
    val src = spark.readStream.schema(ev.schema)
      .parquet(new java.io.File(dir, "in").getPath)
    val win = 7L * 86400 * 1000000000L
    val q = StreamIngest.runToMemory(
      StreamIngest.streamingZscoreAnomalies(src, win, k = 2, minN = 5),
      "zsc_out")
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("zsc_out")
      .select("event_id", "roll_n", "lhs", "rhs")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sorted.toSeq
    val batch = graft.operators.TsOps.zscoreAnomalies(ev, win, "value",
        Seq("user_id"), k = 2, minN = 5)
      .select("event_id", "roll_n", "lhs", "rhs")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sorted.toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("streaming zscore: future-skewed row cannot block eviction; NaN dropped") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val dir = SparkTestBase.tempDir("graft-zsc2")
    val in = new java.io.File(dir, "in").getPath
    // batch 1: 12 steady points + one clock-skewed far-future row
    val b1 = (0 until 12).map(i =>
      (i.toLong, i * 1000000000L, 7L, 50.0)) :+
      (99L, 1000000000000000000L, 7L, 50.0)
    b1.toDF("event_id", "ts", "user_id", "value").write.parquet(s"$in/b1")
    val schema = StructType(Seq(StructField("event_id", LongType),
      StructField("ts", LongType), StructField("user_id", LongType),
      StructField("value", DoubleType)))
    val src = spark.readStream.schema(schema).parquet(s"$in/*")
    val flagged = StreamIngest.streamingZscoreAnomalies(
      src, 60L * 1000000000L, k = 2, minN = 10,
      maxSkew = 30L * 86400 * 1000000000L)
    val ck = SparkTestBase.tempDir("graft-zsc2-ck")
    val outDir = new java.io.File(SparkTestBase.tempDir("graft-zsc2-out"),
      "rows").getPath
    def drain(): Unit = {
      val q = flagged.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.write.mode("append").parquet(outDir)
        }
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000); q.stop()
    }
    drain()
    // batch 2: a spike (must be flagged against the 12 steady points +
    // itself — NOT the future straggler, which sits outside its window)
    // and a NaN row (must be dropped, not kill the query)
    Seq((12L, 12L * 1000000000L, 7L, 99.0),
        (13L, 13L * 1000000000L, 7L, Double.NaN))
      .toDF("event_id", "ts", "user_id", "value").write.parquet(s"$in/b2")
    drain()
    val out = spark.read.parquet(outDir).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("roll_n"),
        r.getAs[Long]("lhs"))).sorted.toSeq
    // n = 13: the 12 steady points + the spike; the future row excluded
    val (n, s) = (13L, 12L * 5000L + 9900L)
    assert(out == Seq((12L, n, (n * 9900L - s) * (n * 9900L - s))),
      out.toString)
  }

  test("streaming zscore: held-back clock-step candidate still alerts, untested state") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val dir = SparkTestBase.tempDir("graft-zsc3")
    val in = new java.io.File(dir, "in").getPath
    val sec = 1000000000L
    // window 100s, maxSkew 10s: the 30s spike jumps 19s past the 11s
    // high-water → held back as a candidate, but its OWN window
    // [-70s, 30s] still contains the 12 steady points, so the doc
    // contract says it must be tested (and flag) without entering state
    val b1 = (0 until 12).map(i => (i.toLong, i * sec, 7L, 50.0))
    b1.toDF("event_id", "ts", "user_id", "value").write.parquet(s"$in/b1")
    val schema = StructType(Seq(StructField("event_id", LongType),
      StructField("ts", LongType), StructField("user_id", LongType),
      StructField("value", DoubleType)))
    val src = spark.readStream.schema(schema).parquet(s"$in/*")
    val flagged = StreamIngest.streamingZscoreAnomalies(
      src, 100L * sec, k = 2, minN = 10, maxSkew = 10L * sec)
    val ck = SparkTestBase.tempDir("graft-zsc3-ck")
    val outDir = new java.io.File(SparkTestBase.tempDir("graft-zsc3-out"),
      "rows").getPath
    def drain(): Unit = {
      val q = flagged.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.write.mode("append").parquet(outDir)
        }
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000); q.stop()
    }
    drain()
    Seq((90L, 30L * sec, 7L, 99.0)) // candidate spike
      .toDF("event_id", "ts", "user_id", "value").write.parquet(s"$in/b2")
    drain()
    // a confirming second point within maxSkew of the candidate restarts
    // the window there; the candidate itself is NOT retroactively in
    // state, so this steady point sees 12 steady + itself = all 50s →
    // clean. (Were the candidate admitted, hw/eviction bookkeeping would
    // differ and a re-test here would see the 99.)
    Seq((13L, 31L * sec, 7L, 50.0))
      .toDF("event_id", "ts", "user_id", "value").write.parquet(s"$in/b3")
    drain()
    val out = spark.read.parquet(outDir).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("roll_n"),
        r.getAs[Long]("lhs"))).sorted.toSeq
    // n = 13 (12 steady + the candidate itself); integer z-test exact:
    // s = 12·5000 + 9900, d = 13·9900 − s = 58800
    assert(out == Seq((90L, 13L, 58800L * 58800L)), out.toString)
  }

  test("streaming embed outliers equal the batch outlier set, ties to min cid") {
    import spark.implicits._
    val dir = SparkTestBase.tempDir("graft-embout")
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),  // on-centroid → kept
      (1L, Array(0.0f, 0.0f, 1.0f, 0.0f)),  // orthogonal → outlier
      (2L, Array(0.0f, 0.0f, 0.0f, 1.0f)))  // orthogonal → outlier
    vecs.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(new java.io.File(dir, "in").getPath)
    val cents = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (10L, Array(0.0f, 1.0f, 0.0f, 0.0f))).toDF("cid", "cvec")
    val src = spark.readStream
      .schema(StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
      .parquet(new java.io.File(dir, "in").getPath)
    val q = StreamIngest.runToMemory(
      StreamIngest.streamingEmbedOutliers(src, cents, threshold = 0.5),
      "embout_out")
    q.processAllAvailable()
    q.stop()
    val out = spark.table("embout_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    // both orthogonal vectors tie at cos 0 on every centroid → cid 0
    assert(out == Seq((1L, 0L, 0.0), (2L, 0L, 0.0)))
    // equality with the batch operator on the same frames
    val batch = graft.pipeline.Similarity.embeddingOutliers(
      vecs.toDF("vec_id", "embedding"), cents, threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cid"),
        r.getAs[Double]("cos"))).sorted.toSeq
    assert(out == batch)
  }

  test("streaming bloom admission: novel docs pass, corpus dups rejected, FP-safe") {
    import spark.implicits._
    val dir = SparkTestBase.tempDir("graft-bloomadm")
    val ref = Seq(
      (900L, "the quick brown fox jumps over the lazy dog"),
      (901L, "der schnelle braune fuchs springt und die katze ist da"))
      .toDF("doc_id", "text")
    Seq(
      (1L, "the quick  BROWN fox jumps over the lazy dog"), // ws/case dup → reject
      (2L, "a genuinely novel document unseen in the reference"),
      (3L, "another fresh document with its own content"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(new java.io.File(dir, "in").getPath)
    val src = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
      .parquet(new java.io.File(dir, "in").getPath)
    // fpp 0.5 forces bloom false positives through the verify anti-join
    val admitted = StreamIngest.streamingBloomAdmit(
      src, ref, "doc_id", "text", fpp = 0.5)
    val q = StreamIngest.runToMemory(admitted, "bloomadm_out")
    q.processAllAvailable()
    q.stop()
    val out = spark.table("bloomadm_out").collect()
      .map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(out == Seq(2L, 3L))
    StreamIngest.releaseIndex(admitted)
  }

  test("streaming budget admission: prefix rule within batch, state across batches") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val dir = SparkTestBase.tempDir("graft-admit-in")
    val in = new java.io.File(dir, "in").getPath
    // batch 1: three docs in domain a (2 tokens each), budget 5 → the two
    // earliest in md5 order are admitted (prefix rule: 2, 4; third hits 6)
    val b1 = Seq((1L, "t1 t2", "a"), (2L, "t1 t2", "a"), (3L, "t1 t2", "a"))
    b1.toDF("doc_id", "text", "dom").write.parquet(s"$in/b1")
    val src = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType), StructField("dom", StringType))))
      .parquet(s"$in/*")
    val admitted = StreamIngest.streamingBudgetAdmit(
      src, "doc_id", "text", "dom", Map("a" -> 5L))
    val ck = SparkTestBase.tempDir("graft-admit-ck")
    val outDir = new java.io.File(SparkTestBase.tempDir("graft-admit-out"),
      "rows").getPath
    def drain(): Unit = {
      // memory sinks cannot recover from a checkpoint; foreachBatch can —
      // and the restart across drains is exactly what this test exercises
      val q = admitted.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.write.mode("append").parquet(outDir)
        }
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000); q.stop()
    }
    def admittedIds(): Seq[Long] = spark.read.parquet(outDir)
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    drain()
    val expect1 = b1.map(t => (t._1, SparkTestBase.md5hex(t._1.toString)))
      .sortBy(p => (p._2, p._1)).take(2).map(_._1).sorted
    assert(admittedIds() == expect1)
    // batch 2: the spent total carried over is 6 of 5 (the REJECTED third
    // doc also consumed, per the prefix rule) — a 2-token doc is rejected
    // even though the batch alone would fit it
    Seq((10L, "t1 t2", "a")).toDF("doc_id", "text", "dom")
      .write.parquet(s"$in/b2")
    drain()
    assert(admittedIds() == expect1,
      s"budget must stay spent across batches: ${admittedIds()}")
  }

  test("sketch ingest: two arrival waves accumulate to the batch store") {
    import spark.implicits._
    import graft.pipeline.Text
    val base = SparkTestBase.tempDir("graft-skingest")
    val in = new java.io.File(base, "in").getPath
    val store = new java.io.File(base, "store").getPath
    val ck = new java.io.File(base, "ck").getPath
    val wave1 = Seq((0L, "a b c a", "s0"), (1L, "b c d", "s1"))
    val wave2 = Seq((2L, "c d e f", "s0"), (3L, "a f", "s1"))
    wave1.toDF("doc_id", "text", "source").write.parquet(s"$in/w1")
    val src = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType), StructField("source", StringType))))
      .parquet(s"$in/*")
    def drain(): Unit = {
      val q = StreamIngest.sketchIngest(src, store, ck, d = 4, w = 128)
      q.awaitTermination(120000); q.stop()
    }
    drain()
    // wave 2 lands later; the checkpoint resumes past wave 1's files, so
    // the store accumulates one partial row per (source, wave)
    wave2.toDF("doc_id", "text", "source").write.parquet(s"$in/w2")
    drain()
    assert(spark.read.parquet(store).count() == 4) // 2 sources x 2 waves
    val roll = Text.sketchRollup(spark, store, Seq("s0", "s1")).collect()(0)
    // rollup over the accumulated partials == one-pass batch store rollup
    val bp = new java.io.File(base, "batch").getPath
    Text.writeSketchStore(
      (wave1 ++ wave2).toDF("doc_id", "text", "source"), bp,
      d = 4, w = 128)
    val batch = Text.sketchRollup(spark, bp, Seq("s0", "s1")).collect()(0)
    assert(roll.getAs[Long]("n_tokens") == batch.getAs[Long]("n_tokens"))
    assert(roll.getAs[scala.collection.Seq[Long]]("cms").toList ==
      batch.getAs[scala.collection.Seq[Long]]("cms").toList)
    assert(roll.getAs[Long]("distinct_est") ==
      batch.getAs[Long]("distinct_est"))
    // crash-replay of wave 2's micro-batch: the redelivered partial lands
    // under the stream's own (checkpoint, batchId) key, so every rollup
    // answer stays equal to the one-pass batch store
    Text.appendSketchStore(wave2.toDF("doc_id", "text", "source"), store,
      StreamIngest.sketchBatchKey(ck, 1L), d = 4, w = 128)
    assert(spark.read.parquet(store).count() == 6) // dup partials at rest
    val replayed = Text.sketchRollup(spark, store, Seq("s0", "s1"))
      .collect()(0)
    assert(replayed.getAs[Long]("n_tokens") == batch.getAs[Long]("n_tokens"))
    assert(replayed.getAs[scala.collection.Seq[Long]]("cms").toList ==
      batch.getAs[scala.collection.Seq[Long]]("cms").toList)
  }

  test("rollup ingest: waves + a replayed batch still equal the batch store") {
    import spark.implicits._
    import graft.storage.RollupStore
    val H = 3600L * 1000000000L
    val day = 86400L * 1000000000L
    val base = SparkTestBase.tempDir("graft-rlingest")
    val in = new java.io.File(base, "in").getPath
    val store = new java.io.File(base, "store").getPath
    val ck = new java.io.File(base, "ck").getPath
    val wave1 = Seq((1L * H, 10.25), (2L * H, 3.10), (25L * H, 7.77))
    val wave2 = Seq((26L * H, 100.01), (49L * H, 0.02))
    wave1.toDF("ts", "value").write.parquet(s"$in/w1")
    val src = spark.readStream
      .schema(StructType(Seq(StructField("ts", LongType),
        StructField("value", DoubleType))))
      .parquet(s"$in/*")
    def drain(): Unit = {
      val q = StreamIngest.rollupIngest(src, store, ck, H,
        distinctCol = Some("ts"))
      q.awaitTermination(120000); q.stop()
    }
    drain()
    wave2.toDF("ts", "value").write.parquet(s"$in/w2")
    drain()
    // crash-replay of wave 2's micro-batch lands under the stream's own
    // (checkpoint, batchId) key → deduped, not double-counted
    RollupStore.append(wave2.toDF("ts", "value"), store,
      StreamIngest.sketchBatchKey(ck, 1L), H, distinctCol = Some("ts"))
    val direct = (wave1 ++ wave2).toDF("ts", "value")
      .groupBy(expr(graft.operators.TsOps.floorBucketSql("ts", day))
        .as("bucket_ts"))
      .agg(count(lit(1)).as("n"),
        min(col("value").cast("decimal(18,2)")).as("min_c"),
        max(col("value").cast("decimal(18,2)")).as("max_c"),
        sum(col("value").cast("decimal(18,2)")).as("sum_c"))
      .orderBy("bucket_ts").collect().toSeq
    val viaStore = RollupStore.rollup(spark, store, day)
      .select("bucket_ts", "n", "min_c", "max_c", "sum_c")
      .orderBy("bucket_ts").collect().toSeq
    assert(viaStore == direct)
    // the distinct dimension streams through too: per-day unique ts
    // (2, 2, 1) — small exact cardinalities, the estimate is exact
    val de = RollupStore.rollup(spark, store, day)
      .select("bucket_ts", "distinct_est").orderBy("bucket_ts")
      .collect().map(_.getLong(1)).toSeq
    assert(de == Seq(2L, 2L, 1L))
    // an append that FORGETS the store's distinctCol must fail loudly at
    // the next read, not silently undercount streamed buckets
    RollupStore.append(wave2.toDF("ts", "value"), store, "naked#1", H)
    val ex = intercept[Exception] {
      RollupStore.rollup(spark, store, day).collect()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage} | ${chain(t.getCause)}"
    assert(chain(ex).contains("hll-less"), chain(ex))
  }

  test("streaming bm25 serves from an opened at-rest index (restart path)") {
    // the serving-restart story end to end: the corpus is tokenized ONCE
    // into the stored index; a "restarted" server opens it and scores a
    // query stream with zero corpus access — drained scores equal batch
    import spark.implicits._
    val docs = Seq((1L, "apple apple pie"), (2L, "apple banana"),
      (3L, "banana cherry pie")).toDF("doc_id", "text")
    val ipath = SparkTestBase.tempDir("graft-bm25s") + "/idx"
    graft.pipeline.Retrieval.writeBm25Index(docs, ipath, buckets = 8)
    val idx = graft.pipeline.Retrieval.openBm25Index(spark, ipath)
    val qdf = Seq((1L, "apple pie"), (2L, "banana")).toDF("query_id", "qtext")
    val qdir = SparkTestBase.tempDir("graft-bm25s-q")
    qdf.write.parquet(s"$qdir/b1")
    val src = spark.readStream.schema(qdf.schema).parquet(s"$qdir/*")
    val scored = graft.pipeline.Retrieval.streamingBm25(src, idx)
    val q = StreamIngest.runToMemory(scored, "bm25_stored_out")
    q.processAllAvailable(); q.stop()
    val drained = spark.table("bm25_stored_out")
      .groupBy("query_id", "doc_id").agg(sum("term_score").as("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    val batch = graft.pipeline.Retrieval.bm25(docs, qdf, topK = 10)
      .select("query_id", "doc_id", "score")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    assert(drained.nonEmpty && drained == batch)
  }

  test("compactIvf repairs replayed batches and heals a crashed swap") {
    import spark.implicits._
    import graft.pipeline.Similarity
    val base = SparkTestBase.tempDir("graft-ivf-repair")
    val idx = new java.io.File(base, "idx").getPath
    val cents = Seq((0L, Array(1f, 0f, 0f))).toDF("cid", "cvec")
    val corpus = Seq((10L, Array(0.9f, 0.1f, 0f)), (11L, Array(0.8f, 0.2f, 0f)))
      .toDF("vec_id", "embedding")
    val assigned = Similarity.ivfAssign(corpus, cents)
    Similarity.writeIvf(assigned, idx)
    // at-least-once replay: the same batch appends a second time
    assigned.write.mode("append").partitionBy("cid").parquet(idx)
    assert(spark.read.parquet(idx).count() == 4) // duplicated rows visible
    val q = Seq((0L, Array(1f, 0f, 0f))).toDF("qid", "qvec")
    def top(): Seq[Long] =
      Similarity.ivfKnnStored(spark, idx, cents, q, k = 2, nprobe = 1,
          excludeSelf = false)
        .orderBy("rank").collect().map(_.getAs[Long]("vec_id")).toSeq
    Similarity.compactIvf(spark, idx) // repair: duplicates collapse
    assert(spark.read.parquet(idx).count() == 2)
    assert(top() == Seq(10L, 11L))
    // crashed swap: live moved aside, nothing at the live path — the next
    // probe must self-heal by promoting the .compact-old copy back
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.rename(new org.apache.hadoop.fs.Path(idx),
      new org.apache.hadoop.fs.Path(idx + ".compact-old")))
    assert(top() == Seq(10L, 11L))
  }

  test("streaming ewma+cusum: drained stream equals the batch recurrence; " +
      "state carries across batches") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val ev = graft.storage.Tables.read(spark, "/root/testdata/sf0.001",
      "events").select("user_id", "ts", "event_id", "value")
    val dir = SparkTestBase.tempDir("graft-rec-in")
    val in = new java.io.File(dir, "in").getPath
    ev.write.parquet(s"$in/b1")
    val src = spark.readStream.schema(ev.schema).parquet(s"$in/*")
    def drained(df: org.apache.spark.sql.DataFrame, name: String) = {
      val q = StreamIngest.runToMemory(df, name)
      q.processAllAvailable(); q.stop()
      spark.table(name)
    }
    val sEw = drained(StreamIngest.streamingEwma(src), "rec_ew")
      .select("user_id", "ts", "event_id", "ewma_num")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sorted.toSeq
    val bEw = graft.operators.RecurrenceOps.ewma(ev, Seq("user_id"))
      .select(col("user_id"), col("ts"), col("id"), col("ewma_num"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sorted.toSeq
    assert(sEw.nonEmpty && sEw == bEw)
    val sHo = drained(StreamIngest.streamingHolt(src), "rec_ho")
      .select("user_id", "ts", "level_num", "trend_num")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sorted.toSeq
    val bHo = graft.operators.RecurrenceOps.holt(ev, Seq("user_id"))
      .select(col("user_id"), col("ts"), col("level_num"), col("trend_num"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sorted.toSeq
    assert(sHo.nonEmpty && sHo == bHo)
    // cross-batch state: user 9000001's second point must fold onto the
    // first batch's state, not restart the recurrence
    val dir2 = SparkTestBase.tempDir("graft-rec2-in")
    val in2 = new java.io.File(dir2, "in").getPath
    Seq((9000001L, 10L, 1L, 40.0)).toDF("user_id", "ts", "event_id", "value")
      .write.parquet(s"$in2/b1")
    val src2 = spark.readStream.schema(ev.schema).parquet(s"$in2/*")
    val cu = StreamIngest.streamingCusum(src2, targetCents = 5000L,
      slackCents = 0L, thresholdCents = 100000L)
    val ck = SparkTestBase.tempDir("graft-rec2-ck")
    val outDir = new java.io.File(SparkTestBase.tempDir("graft-rec2-out"),
      "rows").getPath
    def drain(): Unit = {
      val q = cu.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.write.mode("append").parquet(outDir)
        }
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000); q.stop()
    }
    drain()
    Seq((9000001L, 20L, 2L, 40.0)).toDF("user_id", "ts", "event_id", "value")
      .write.parquet(s"$in2/b2")
    drain()
    val sNeg = spark.read.parquet(outDir).orderBy("ts")
      .collect().map(_.getAs[Long]("s_neg")).toSeq
    // d = -1000 per point: s_neg accumulates 1000 then 2000 ONLY if the
    // second batch started from the first batch's state
    assert(sNeg == Seq(1000L, 2000L))
  }

  test("streaming seasonal: stream scored against batch profile equals " +
      "the batch flag set") {
    val ev = graft.storage.Tables.read(spark, "/root/testdata/sf0.001",
      "events").select("event_id", "ts", "value")
    val dir = SparkTestBase.tempDir("graft-seas-in")
    val in = new java.io.File(dir, "in").getPath
    ev.write.parquet(s"$in/b1")
    val profile = graft.operators.TsOps.seasonalProfile(ev, "value")
    val src = spark.readStream.schema(ev.schema).parquet(s"$in/*")
    val q = StreamIngest.runToMemory(
      StreamIngest.streamingSeasonalAnomalies(src, profile), "seas_out")
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("seas_out").select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val batch = graft.operators.TsOps.seasonalAnomalies(ev, "value")
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(streamed.nonEmpty && streamed == batch)
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
