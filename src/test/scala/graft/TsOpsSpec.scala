package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TsOps
import graft.storage.{DataPoint, Tables, WritableStore}
import org.apache.spark.sql.types._

/** Operator semantics against the reference's boundary fixtures
  * (FIXTURES.md §1.4: ts array `[9,10,19,20,20,20,30,40,50,50,51]`,
  * duplicates kept; grouped-limit tie tests from `store/mod.rs:479-521`).
  */
class TsOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val tsFixture = Seq(9L, 10L, 19L, 20L, 20L, 20L, 30L, 40L, 50L, 50L, 51L)
  private lazy val df = tsFixture.zipWithIndex
    .map { case (ts, i) => (ts, i.toLong) }.toDF("ts", "v")

  private def tss(d: org.apache.spark.sql.DataFrame): Seq[Long] =
    d.orderBy("ts", "v").collect().map(_.getLong(0)).toSeq

  test("range filter: since inclusive, until exclusive, duplicates kept") {
    assert(tss(TsOps.rangeFilter(df, Some(20L), Some(50L))) ==
      Seq(20L, 20L, 20L, 30L, 40L))
    assert(tss(TsOps.rangeFilter(df, Some(21L), Some(50L))) == Seq(30L, 40L))
    assert(tss(TsOps.rangeFilter(df, None, Some(20L))) == Seq(9L, 10L, 19L))
    assert(tss(TsOps.rangeFilter(df, Some(51L), None)) == Seq(51L))
    assert(tss(TsOps.rangeFilter(df, None, None)) == tsFixture)
    assert(TsOps.rangeFilter(df, Some(52L), None).count() == 0)
  }

  test("grouped head keeps all rows sharing the nth distinct ts") {
    assert(tss(TsOps.groupedHead(df, 4)) == Seq(9L, 10L, 19L, 20L, 20L, 20L))
    assert(tss(TsOps.groupedHead(df, 1)) == Seq(9L))
    assert(TsOps.groupedHead(df, 0).count() == 0)
    assert(tss(TsOps.groupedHead(df, 100)) == tsFixture)
  }

  test("grouped tail keeps ties at the nth-from-last distinct ts") {
    assert(tss(TsOps.groupedTail(df, 2)) == Seq(50L, 50L, 51L))
    assert(tss(TsOps.groupedTail(df, 1)) == Seq(51L))
    assert(TsOps.groupedTail(df, 0).count() == 0)
  }

  test("threshold-based grouped limit matches window-based reference impl") {
    for (n <- Seq(1, 2, 4, 7, 11, 20)) {
      assert(tss(TsOps.groupedHead(df, n)) ==
        tss(TsOps.groupedLimitWindow(df, n, head = true)), s"head $n")
      assert(tss(TsOps.groupedTail(df, n)) ==
        tss(TsOps.groupedLimitWindow(df, n, head = false)), s"tail $n")
    }
  }

  test("reference tail-limit fixture: tail(2) keeps last 3 rows (dup ts)") {
    // store/mod.rs:479-521 via FIXTURES.md §1.2
    val fx = Seq(
      (1629745451715062000L, 100.0), (1629745451715063000L, 200.0),
      (1629745451715064000L, 200.0), (1629745451715065000L, 300.0),
      (1629745451715066000L, 300.0), (1639745451715061000L, 1300.0),
      (1639745451715062000L, 1200.0), (1639745451715062000L, 1201.0)
    ).toDF("ts", "f0")
    val got = TsOps.groupedTail(fx, 2).orderBy("ts", "f0").collect()
    assert(got.map(r => (r.getLong(0), r.getDouble(1))).toSeq == Seq(
      (1639745451715061000L, 1300.0),
      (1639745451715062000L, 1200.0),
      (1639745451715062000L, 1201.0)))
  }

  test("downsample buckets + aggregates") {
    val d = Seq((0L, 1.0), (5L, 2.0), (10L, 3.0), (14L, 4.0), (20L, 5.0))
      .toDF("ts", "value")
    val out = TsOps.downsample(d, 10L, "value").orderBy("bucket_ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      (0L, 2L, 1.0, 2.0, 3.0), (10L, 2L, 3.0, 4.0, 7.0), (20L, 1L, 5.0, 5.0, 5.0)))
  }

  test("asof join picks latest right row <= left ts per key") {
    val trades = Seq(("A", 10L, 1.0), ("A", 20L, 2.0), ("B", 15L, 3.0))
      .toDF("sym", "ts", "px").withColumnRenamed("sym", "k")
    val quotes = Seq(("A", 8L, 100.0), ("A", 12L, 101.0), ("A", 25L, 102.0),
      ("B", 20L, 200.0)).toDF("k", "ts", "bid")
    val out = TsOps.asofJoin(
      trades.select("k", "ts", "px"), quotes, Seq("k"))
      .orderBy("k", "ts").collect()
    // A@10 → quote@8; A@20 → quote@12; B@15 → no quote yet → null
    assert(out(0).getDouble(out(0).fieldIndex("r_bid")) == 100.0)
    assert(out(1).getDouble(out(1).fieldIndex("r_bid")) == 101.0)
    assert(out(2).isNullAt(out(2).fieldIndex("r_bid")))
  }

  test("asof join handles overlapping left/right column names") {
    val l = Seq(("A", 10L, 1.0, 100L), ("A", 20L, 2.0, 101L))
      .toDF("k", "ts", "value", "event_id")
    val r = Seq(("A", 9L, 50.0, 900L), ("A", 15L, 60.0, 901L))
      .toDF("k", "ts", "value", "event_id")
    val out = TsOps.asofJoin(l, r, Seq("k")).orderBy("ts").collect()
    // left's own columns intact, right payload prefixed
    assert(out(0).getAs[Double]("value") == 1.0)
    assert(out(0).getAs[Double]("r_value") == 50.0)
    assert(out(0).getAs[Long]("r_event_id") == 900L)
    assert(out(1).getAs[Double]("value") == 2.0)
    assert(out(1).getAs[Double]("r_value") == 60.0)
  }

  test("sessionize splits on gap and is 1-based per key") {
    val d = Seq(
      ("u1", 0L), ("u1", 10L), ("u1", 200L), ("u1", 205L),
      ("u2", 0L), ("u2", 500L)
    ).toDF("user", "ts")
    val out = TsOps.sessionize(d, 100L, Seq("user"))
      .orderBy("user", "ts").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("u1", 0L, 1L), ("u1", 10L, 1L), ("u1", 200L, 2L), ("u1", 205L, 2L),
      ("u2", 0L, 1L), ("u2", 500L, 2L)))
  }

  test("asof join respects tolerance") {
    val l = Seq(("A", 100L, 1.0)).toDF("k", "ts", "px")
    val r = Seq(("A", 10L, 50.0)).toDF("k", "ts", "bid")
    val near = TsOps.asofJoin(l, r, Seq("k"), toleranceNanos = 1000L).collect()
    assert(near(0).getDouble(near(0).fieldIndex("r_bid")) == 50.0)
    val far = TsOps.asofJoin(l, r, Seq("k"), toleranceNanos = 10L).collect()
    assert(far(0).isNullAt(far(0).fieldIndex("r_bid")))
  }

  test("salted join and skewed distinct count match unsalted results") {
    import graft.operators.Skew
    val rnd = new scala.util.Random(11)
    // heavy-hitter key "hot" (80% of rows)
    val big = (1 to 500).map { i =>
      (if (rnd.nextDouble() < 0.8) "hot" else s"k${rnd.nextInt(10)}",
        rnd.nextInt(40).toLong)
    }.toDF("k", "v")
    val small = Seq(("hot", 1.0), ("k1", 2.0), ("k2", 3.0)).toDF("k", "w")
    val plain = big.join(small, "k").agg(sum("w"), count(lit(1)))
      .collect()(0)
    val salted = Skew.saltedJoin(big, small, Seq("k")).agg(sum("w"), count(lit(1)))
      .collect()(0)
    assert(plain.getDouble(0) == salted.getDouble(0))
    assert(plain.getLong(1) == salted.getLong(1))

    val want = big.groupBy("k").agg(countDistinct("v").as("v_distinct"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Skew.skewedDistinctCount(big, Seq("k"), "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("writable store: unsorted push → persist → sorted read, dup ts kept") {
    val dir = SparkTestBase.tempDir("graft-store")
    val store = new WritableStore(spark, dir, "test_metrics",
      Seq(StructField("f0", DoubleType), StructField("f1", DoubleType)))
    // out-of-order with duplicate ts (store/mod.rs:537-546)
    store.pushMulti(Seq(
      DataPoint(1629745451715063000L, Seq(200.0, 36.0)),
      DataPoint(1629745451715062000L, Seq(100.0, 12.0)),
      DataPoint(1629745451715066000L, Seq(300.0, 36.0)),
      DataPoint(1629745451715064000L, Seq(200.0, 37.0)),
      DataPoint(1639745451715062000L, Seq(1200.0, 37.0)),
      DataPoint(1639745451715062000L, Seq(1201.0, 38.0))))
    assert(store.persist() == 6L)
    assert(store.bufferedCount == 0)
    val back = Tables.read(spark, dir, "test_metrics")
    assert(back.count() == 6)
    val ts = back.orderBy("ts").collect().map(_.getLong(0)).toSeq
    assert(ts == ts.sorted)
    assert(ts.count(_ == 1639745451715062000L) == 2)
  }

  test("writable store: purge removes range from buffer") {
    val dir = SparkTestBase.tempDir("graft-store2")
    val store = new WritableStore(spark, dir, "m",
      Seq(StructField("v", DoubleType)))
    store.pushMulti((1L to 10L).map(i => DataPoint(i, Seq(i.toDouble))))
    store.purge(3L, 7L)
    assert(store.bufferedCount == 6) // 1,2,7,8,9,10
    store.persist()
    val vals = Tables.read(spark, dir, "m").orderBy("ts").collect()
      .map(_.getLong(0)).toSeq
    assert(vals == Seq(1L, 2L, 7L, 8L, 9L, 10L))
  }

  test("date-partitioned store: round-trip + directory pruning in the plan") {
    val dir = SparkTestBase.tempDir("graft-part")
    val store = new WritableStore(spark, dir, "pm",
      Seq(StructField("v", DoubleType)), partitionByDay = true)
    val day = 86400L * 1000000000L
    // three days of data, two points per day
    store.pushMulti((0 until 6).map(i =>
      DataPoint(19000L * day + (i / 2) * day + i, Seq(i.toDouble))))
    store.persist()
    val all = Tables.read(spark, dir, "pm")
    assert(all.count() == 6)
    assert(!all.columns.contains(WritableStore.PartitionCol))
    // range read over the middle day only
    val mid = Tables.readRange(spark, dir, "pm",
      Some(19001L * day), Some(19002L * day))
    assert(mid.orderBy("ts").collect().map(_.getDouble(1)).toSeq == Seq(2.0, 3.0))
    // directory-level pruning: the day-range lands in PartitionFilters
    // (executed scan reads only matching __day= dirs), ts range in
    // PushedFilters for row-group skipping
    val plan = mid.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(__day"), plan)
    assert(plan.contains("PushedFilters: [IsNotNull(ts)"), plan)
  }

  test("compact merges many small blocks into few sorted disjoint blocks") {
    val dir = SparkTestBase.tempDir("graft-compact")
    val store = new WritableStore(spark, dir, "cm",
      Seq(StructField("v", DoubleType)))
    // 8 out-of-order flushes → 8 block files
    (0 until 8).foreach { i =>
      store.pushMulti((0 until 100).map(j =>
        DataPoint(((7 - i) * 100 + j).toLong, Seq(i * 100.0 + j))))
      store.persist()
    }
    def files = Tables.blockListDf(spark, dir, Some("cm")).collect()
    assert(files.length == 8)
    assert(store.compact(targetRowsPerBlock = 300) == 800L)
    val after = files
    assert(after.length == 3, after.length) // ceil(800/300)
    // blocks are ts-disjoint (range-sorted) and data survives intact
    val ranges = after.map(r => (r.getAs[Long]("block_start"),
      r.getAs[Long]("block_end"))).sortBy(_._1)
    ranges.sliding(2).foreach { case Array((_, e1), (s2, _)) =>
      assert(e1 < s2, s"overlap: $e1 >= $s2"); case _ => }
    val back = Tables.read(spark, dir, "cm")
    assert(back.count() == 800)
    assert(back.orderBy("ts").collect().map(_.getLong(0)).toSeq ==
      (0L until 800L).toSeq)
  }

  test("compact(zOrderBy) clusters blocks in ts AND the named key") {
    val dir = SparkTestBase.tempDir("graft-compact-z")
    val store = new WritableStore(spark, dir, "zc",
      Seq(StructField("key", LongType)))
    // key is a bijective scramble of ts (odd multiplier mod 2^12), so a
    // ts-sorted layout is maximally blind to key ranges
    val n = 4096
    (0 until 4).foreach { f =>
      store.pushMulti((f * (n / 4) until (f + 1) * (n / 4)).map { i =>
        DataPoint(i.toLong, Seq((i * 2654435761L) & 4095L))
      })
      store.persist()
    }
    def fileStats(column: String): Seq[(Long, Long)] = {
      import scala.jdk.CollectionConverters._
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      val conf = spark.sessionState.newHadoopConf()
      new java.io.File(dir, "zc").listFiles().toSeq
        .filter(_.getName.endsWith(".parquet"))
        .map { f =>
          val r = ParquetFileReader.open(HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f.getPath), conf))
          try {
            val sts = r.getFooter.getBlocks.asScala
              .flatMap(_.getColumns.asScala
                .find(_.getPath.toDotString == column).map(_.getStatistics))
            (sts.map(_.genericGetMin.asInstanceOf[Number].longValue()).min,
              sts.map(_.genericGetMax.asInstanceOf[Number].longValue()).max)
          } finally r.close()
        }
    }
    def hitFraction(column: String, lo: Long, hi: Long): Double = {
      val stats = fileStats(column)
      stats.count { case (mn, mx) => mx >= lo && mn <= hi }
        .toDouble / stats.size
    }
    assert(store.compact(targetRowsPerBlock = 256,
      zOrderBy = Seq("key")) == n.toLong)
    // data intact through the clustered rewrite
    val back = Tables.read(spark, dir, "zc")
    assert(back.count() == n.toLong)
    assert(back.agg(sum("key")).head().getLong(0) == (0L until 4096L).sum)
    // ~10% slices in EACH dimension touch a minority of the 16 blocks
    assert(hitFraction("ts", 0L, 409L) <= 0.5,
      s"ts slice: ${hitFraction("ts", 0L, 409L)}")
    assert(hitFraction("key", 0L, 409L) <= 0.5,
      s"key slice: ${hitFraction("key", 0L, 409L)}")
    // contrast: the default ts-only compaction prunes ts but is BLIND to
    // the key dimension — the trade zOrderBy exists to flip
    assert(store.compact(targetRowsPerBlock = 256) == n.toLong)
    assert(hitFraction("ts", 0L, 409L) <= 0.5)
    assert(hitFraction("key", 0L, 409L) == 1.0)
  }

  test("compact preserves __day partitioning and directory pruning") {
    val dir = SparkTestBase.tempDir("graft-compact-day")
    val store = new WritableStore(spark, dir, "cd",
      Seq(StructField("v", DoubleType)), partitionByDay = true)
    val day = 86400L * 1000000000L
    // two flushes over the same two days → 2 files per day dir
    (0 until 2).foreach { f =>
      store.pushMulti((0 until 4).map(i =>
        DataPoint(19000L * day + (i % 2) * day + f * 10 + i, Seq(i.toDouble))))
      store.persist()
    }
    assert(store.compact(targetRowsPerBlock = 4) == 8L)
    val dirs = new java.io.File(dir, "cd").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(dirs == Seq(
      s"__day=${java.time.LocalDate.ofEpochDay(19000)}",
      s"__day=${java.time.LocalDate.ofEpochDay(19001)}"))
    assert(Tables.read(spark, dir, "cd").count() == 8)
    val oneDay = Tables.readRange(spark, dir, "cd",
      Some(19000L * day), Some(19001L * day))
    assert(oneDay.count() == 4)
    val plan = oneDay.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(__day"), plan)
  }

  test("periodic persist daemon flushes on schedule") {
    val dir = SparkTestBase.tempDir("graft-daemon")
    val store = new WritableStore(spark, dir, "pd",
      Seq(StructField("v", DoubleType)))
    store.pushMulti(Seq(DataPoint(1L, Seq(1.0)), DataPoint(2L, Seq(2.0))))
    store.startPeriodicPersist(intervalMillis = 200)
    val deadline = System.nanoTime() + 20L * 1000000000L
    while (store.bufferedCount > 0 && System.nanoTime() < deadline)
      Thread.sleep(100)
    assert(store.bufferedCount == 0, "daemon did not flush in time")
    assert(Tables.read(spark, dir, "pd").count() == 2)
    // rows pushed after the first flush are flushed by shutdown at latest
    store.pushMulti(Seq(DataPoint(3L, Seq(3.0))))
    store.shutdown()
    assert(Tables.read(spark, dir, "pd").count() == 3)
  }

  test("interpolate with key columns fills per series independently") {
    val d = Seq[(String, Long, Option[Double])](
      ("a", 0L, Some(0.0)), ("a", 10L, None), ("a", 20L, Some(10.0)),
      ("b", 0L, Some(100.0)), ("b", 10L, None), ("b", 20L, Some(0.0))
    ).toDF("k", "bucket_ts", "v")
    val out = TsOps.interpolate(d, "v", keyCols = Seq("k"))
      .orderBy("k", "bucket_ts").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(out.toSeq == Seq(
      ("a", 0L, Some(0.0)), ("a", 10L, Some(5.0)), ("a", 20L, Some(10.0)),
      ("b", 0L, Some(100.0)), ("b", 10L, Some(50.0)), ("b", 20L, Some(0.0))))
  }

  test("bucketed tables join without a shuffle on either side") {
    import spark.implicits._
    val facts = (1L to 1000L).map(i => (i % 50, i, i * 1.5)).toDF("k", "a", "x")
    val dims  = (0L until 50L).map(i => (i, s"dim$i")).toDF("k", "name")
    Tables.writeBucketed(facts, "graft_bkt_facts", Seq("k"), 8, Seq("k"))
    Tables.writeBucketed(dims, "graft_bkt_dims", Seq("k"), 8)
    val j = spark.table("graft_bkt_facts")
      .join(spark.table("graft_bkt_dims").hint("merge"), Seq("k"))
    val joined = j.groupBy("name").count()
    assert(joined.count() == 50)
    // both sides read pre-bucketed on k: no Exchange below the join
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("SelectedBucketsCount"), plan)
  }

  test("journaled store: unflushed rows survive reopen; persist truncates") {
    val dir = SparkTestBase.tempDir("graft-journal")
    val s1 = new WritableStore(spark, dir, "jm",
      Seq(StructField("v", DoubleType)), journaled = true)
    s1.pushMulti(Seq(
      DataPoint(30L, Seq(3.0)), DataPoint(10L, Seq(1.0))))
    s1.pushMulti(Seq(
      DataPoint(10L, Seq(1.5)), // duplicate ts — arrival order must survive
      DataPoint(20L, Seq(2.0))))
    // "crash": drop s1 without persist; a fresh store replays the journal
    val s2 = new WritableStore(spark, dir, "jm",
      Seq(StructField("v", DoubleType)), journaled = true)
    assert(s2.bufferedCount == 4)
    val replayed = s2.bufferedFrame().collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // stable sort: equal-ts rows keep journal arrival order (1.0 then 1.5)
    assert(replayed == Seq((10L, 1.0), (10L, 1.5), (20L, 2.0), (30L, 3.0)))
    // partial persist keeps the un-flushed remainder journaled
    s2.persist(until = Some(20L))
    val s3 = new WritableStore(spark, dir, "jm",
      Seq(StructField("v", DoubleType)), journaled = true)
    assert(s3.bufferedCount == 2)
    // full persist truncates the journal (dir stays as an empty, complete
    // copy — _SUCCESS marker, no data files — so crash recovery can always
    // prefer it over a stale pre-rewrite journal)
    s3.persist()
    val jm = new java.io.File(new java.io.File(dir, WritableStore.JournalDirName), "jm")
    assert(jm.isDirectory)
    assert(!jm.listFiles().exists(_.getName.endsWith(".parquet")))
    val s4 = new WritableStore(spark, dir, "jm",
      Seq(StructField("v", DoubleType)), journaled = true)
    assert(s4.bufferedCount == 0)
    val persisted = Tables.read(spark, dir, "jm").orderBy("ts").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(persisted == Seq((10L, 1.0), (10L, 1.5), (20L, 2.0), (30L, 3.0)))
    // the journal dir never leaks into the metrics catalog
    assert(Tables.listMetrics(dir) == Seq("jm"))
  }

  test("crash recovery: orphaned journal tmp and compact dirs are promoted") {
    // journal: simulate a rewrite that died between delete and rename
    val dir = SparkTestBase.tempDir("graft-recover")
    val s1 = new WritableStore(spark, dir, "rm",
      Seq(StructField("v", DoubleType)), journaled = true)
    s1.pushMulti(Seq(DataPoint(1L, Seq(1.0)), DataPoint(2L, Seq(2.0))))
    val jDir = new java.io.File(new java.io.File(dir, WritableStore.JournalDirName), "rm")
    val jTmp = new java.io.File(jDir.getPath + ".tmp")
    assert(jDir.renameTo(jTmp)) // the post-delete, pre-rename crash state
    val s2 = new WritableStore(spark, dir, "rm",
      Seq(StructField("v", DoubleType)), journaled = true)
    assert(s2.bufferedCount == 2) // replayed from the promoted tmp
    s2.persist()
    // compaction: simulate a swap that died between live→old and tmp→live
    val dataDir = new java.io.File(dir, "rm")
    val cOld = new java.io.File(dir, ".compact-rm-old")
    assert(dataDir.renameTo(cOld))
    val s3 = new WritableStore(spark, dir, "rm",
      Seq(StructField("v", DoubleType)), journaled = true)
    assert(new java.io.File(dir, "rm").isDirectory)
    assert(Tables.read(spark, dir, "rm").count() == 2)
    assert(s3.bufferedCount == 0)
  }

  test("crash recovery: journal rewrite mid-swap prefers tmp over old") {
    // crash state between live->old and tmp->live: the tmp (post-persist,
    // empty) journal is the newest truth; promoting old instead would
    // resurrect the just-persisted rows
    val dir = SparkTestBase.tempDir("graft-recover-swap")
    val s1 = new WritableStore(spark, dir, "rs",
      Seq(StructField("v", DoubleType)), journaled = true)
    s1.pushMulti(Seq(DataPoint(1L, Seq(1.0)), DataPoint(2L, Seq(2.0))))
    val jDir = new java.io.File(new java.io.File(dir, WritableStore.JournalDirName), "rs")
    val jTmp = new java.io.File(jDir.getPath + ".tmp")
    val jOld = new java.io.File(jDir.getPath + ".old")
    // simulate: persist completed its block write + built the empty tmp,
    // then crashed after renaming live->old
    assert(jDir.renameTo(jOld))
    jTmp.mkdirs()
    new java.io.File(jTmp, "_SUCCESS").createNewFile()
    val s2 = new WritableStore(spark, dir, "rs",
      Seq(StructField("v", DoubleType)), journaled = true)
    assert(s2.bufferedCount == 0) // tmp won; old rows not resurrected
    assert(!jTmp.exists && !jOld.exists) // stale side copies cleaned

    // crash state after both renames but mid-rmTree(old): live journal
    // exists; the leftover old must be swept, replay uses live only
    val s3 = new WritableStore(spark, dir, "rs",
      Seq(StructField("v", DoubleType)), journaled = true)
    s3.pushMulti(Seq(DataPoint(3L, Seq(3.0))))
    jOld.mkdirs()
    new java.io.File(jOld, "_SUCCESS").createNewFile()
    val s4 = new WritableStore(spark, dir, "rs",
      Seq(StructField("v", DoubleType)), journaled = true)
    assert(s4.bufferedCount == 1)
    assert(!jOld.exists)
  }

  test("journal: append files are bounded by threshold compaction") {
    val dir = SparkTestBase.tempDir("graft-journal-compact")
    val s1 = new WritableStore(spark, dir, "jc",
      Seq(StructField("v", DoubleType)), journaled = true)
    (0 until WritableStore.JournalCompactFiles + 5).foreach { i =>
      s1.push(DataPoint(i.toLong, Seq(i.toDouble)))
    }
    val jDir = new java.io.File(new java.io.File(dir, WritableStore.JournalDirName), "jc")
    val nFiles = jDir.listFiles().count(_.getName.endsWith(".parquet"))
    assert(nFiles <= WritableStore.JournalCompactFiles, s"journal grew to $nFiles files")
    // replay after compaction still yields every row in arrival order
    val s2 = new WritableStore(spark, dir, "jc",
      Seq(StructField("v", DoubleType)), journaled = true)
    assert(s2.bufferedCount == WritableStore.JournalCompactFiles + 5)
    val replayed = s2.bufferedFrame().collect().map(_.getLong(0)).toSeq
    assert(replayed == (0 until WritableStore.JournalCompactFiles + 5).map(_.toLong))
  }

  test("writer lockfile: live foreign lock blocks persist, stale is stolen") {
    sys.props("graft.lockWaitMs") = "300" // keep the contention wait short
    try {
      val dir = SparkTestBase.tempDir("graft-lock")
      val store = new WritableStore(spark, dir, "lk",
        Seq(StructField("v", DoubleType)))
      store.push(DataPoint(1L, Seq(1.0)))
      // a live lock held by another writer (reference lockfile path scheme:
      // <metrics>.lock in the db dir) blocks the flush after the wait
      val lock = new java.io.File(dir, "lk.lock")
      assert(lock.createNewFile())
      val foreign = new java.io.FileOutputStream(lock)
      try foreign.write("someone-else".getBytes("UTF-8")) finally foreign.close()
      val e = intercept[IllegalStateException] { store.persist() }
      assert(e.getMessage.contains("write-locked"), e.getMessage)
      assert(store.bufferedCount == 1) // nothing flushed, nothing lost
      assert(lock.exists) // a failed contender never deletes a foreign lock
      // a stale lock (holder crashed long ago, no heartbeat) is taken over
      assert(lock.setLastModified(System.currentTimeMillis() - 3600L * 1000))
      assert(store.persist() == 1L)
      assert(!lock.exists) // released after the operation
      assert(Tables.read(spark, dir, "lk").count() == 1)
      // the lockfile never shows up as a metrics
      assert(Tables.listMetrics(dir) == Seq("lk"))
    } finally { sys.props.remove("graft.lockWaitMs"); () }
  }

  test("chunked sessionize is row-identical to plain, incl. a 30%-hot key") {
    import spark.implicits._
    val tenMin = 600L * 1000000000L
    val twoH = 7200L * 1000000000L
    // hot user 99: ~3000 events (≈30% of the table) with a 2h gap every 50
    // events → many sessions crossing day-chunk boundaries; 20 normal users
    val hot = (0 until 3000).map { i =>
      (99L, i.toLong * tenMin + (i / 50).toLong * twoH)
    }
    val rest = for (u <- 0 until 20; i <- 0 until 350) yield
      (u.toLong, i.toLong * tenMin * 3 + u * 77L + (i / 40).toLong * twoH)
    // NULL keys form their own session group in a window partition — the
    // chunked variant must keep them (its offset join is null-safe)
    val nulls = (0 until 40).map(i =>
      (null.asInstanceOf[java.lang.Long], i.toLong * tenMin + (i / 15).toLong * twoH))
    val df = ((hot ++ rest).map { case (u, t) =>
      (java.lang.Long.valueOf(u), t)
    } ++ nulls).toDF("user_id", "ts")
    val gap = 3600L * 1000000000L
    def key(r: org.apache.spark.sql.Row): (Any, Long, Long) =
      (if (r.isNullAt(0)) null else r.getLong(0), r.getLong(1), r.getLong(2))
    val plain = TsOps.sessionize(df, gap, Seq("user_id"))
      .select("user_id", "ts", "session_idx").collect().map(key).toSet
    val chunked = TsOps.sessionizeChunked(df, gap, Seq("user_id"))
      .select("user_id", "ts", "session_idx").collect().map(key).toSet
    assert(plain.count(_._1 == null) == 40) // null group survived in both
    assert(chunked == plain,
      s"diff: ${(plain diff chunked).take(5)} / ${(chunked diff plain).take(5)}")
    // the heavy event-level window is keyed on (user, chunk), never on the
    // bare user — the hot key splits across its chunks
    val out = TsOps.sessionizeChunked(df, gap, Seq("user_id"))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("__chunk"), plan)
    val eventWindowPartitioned = plan.linesIterator.exists(l =>
      l.contains("hashpartitioning(user_id") && l.contains("__chunk"))
    assert(eventWindowPartitioned, plan)
  }

  test("writer lock serializes concurrent persists from two stores") {
    // two store instances on the SAME metrics, racing persists from two
    // threads: the lockfile's wait-retry path must serialize the parquet
    // appends (concurrent Spark writes to one dir would collide on
    // _temporary) and lose nothing
    val dir = SparkTestBase.tempDir("graft-lock-race")
    val mkStore = () => new WritableStore(spark, dir, "race",
      Seq(StructField("v", DoubleType)))
    val s1 = mkStore(); val s2 = mkStore()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val f1 = Future { (0 until 4).foreach { i =>
      s1.push(DataPoint(1000L + i, Seq(i.toDouble))); s1.persist() } }
    val f2 = Future { (0 until 4).foreach { i =>
      s2.push(DataPoint(2000L + i, Seq(i.toDouble))); s2.persist() } }
    Await.result(Future.sequence(Seq(f1, f2)), 120.seconds)
    assert(Tables.read(spark, dir, "race").count() == 8)
    assert(!new java.io.File(dir, "race.lock").exists) // fully released
  }

  test("chunked sessionize property: identical to plain over random inputs") {
    import spark.implicits._
    // seeded-random sweep: random event times (bursts + long gaps), random
    // gap thresholds, and chunk widths down to tiny (maximizing chunk
    // boundaries, where the offset math lives)
    val rnd = new scala.util.Random(20260812)
    for (round <- 0 until 4) {
      val nKeys = 1 + rnd.nextInt(6)
      val events = (0 until 800).map { _ =>
        val key = rnd.nextInt(nKeys).toLong
        // mixture: mostly short steps, occasionally huge jumps
        val t = math.abs(rnd.nextLong() % (30L * 86400 * 1000000000L))
        (key, t)
      }
      val df = events.toDF("user_id", "ts")
      val gap = (1L + rnd.nextInt(48)) * 1800L * 1000000000L // 0.5h..24h
      val chunk = (1L + rnd.nextInt(12)) * 7200L * 1000000000L // 2h..24h
      val plain = TsOps.sessionize(df, gap, Seq("user_id"))
        .select("user_id", "ts", "session_idx").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      val chunked = TsOps.sessionizeChunked(df, gap, Seq("user_id"),
          chunkNanos = chunk)
        .select("user_id", "ts", "session_idx").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      assert(chunked == plain,
        s"round=$round gap=$gap chunk=$chunk " +
          s"diff=${(plain.toSet diff chunked.toSet).take(3)}")
    }
  }

  test("metrics catalog works through a non-file filesystem scheme") {
    // object-store path hygiene: every catalog operation (list, read,
    // describe, block_list, range read, dialect engine) must survive a
    // dbDir whose scheme is not file: — java.io.File would break here
    spark.sparkContext.hadoopConfiguration.set("fs.graftfs.impl",
      classOf[GraftTestFileSystem].getName)
    val db = "graftfs:/root/testdata/sf0.001"
    assert(Tables.listMetrics(db).contains("events"))
    assert(Tables.read(spark, db, "events").count() == 1000)
    val desc = Tables.describeDf(spark, db, Some("events")).collect()(0)
    assert(desc.getAs[Long]("row_num") == 1000L)
    assert(Tables.blockListDf(spark, db, Some("events")).count() >= 1)
    val lo = desc.getAs[Long]("from_ts")
    assert(Tables.readRange(spark, db, "events", Some(lo), Some(lo + 1)).count() >= 1)
    val eng = new graft.ql.Engine(spark, db)
    val out = eng.frame(
      "with use_cache = false select * from events where ts >= '2020-01-01'")
    assert(out.count() == 1000)
  }

  test("date partition boundary rows land in the exact epoch day") {
    val dir = SparkTestBase.tempDir("graft-part-edge")
    val store = new WritableStore(spark, dir, "pe",
      Seq(StructField("v", DoubleType)), partitionByDay = true)
    val day = 86400L * 1000000000L
    val mid = 19000L * day // a midnight; ts±1ns exceeds double's exact range
    store.pushMulti(Seq(
      DataPoint(mid - 1L, Seq(1.0)),
      DataPoint(mid, Seq(2.0)),
      DataPoint(mid + 1L, Seq(3.0))))
    store.persist()
    val dirs = new java.io.File(dir, "pe").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    val d0 = java.time.LocalDate.ofEpochDay(18999).toString
    val d1 = java.time.LocalDate.ofEpochDay(19000).toString
    assert(dirs == Seq(s"__day=$d0", s"__day=$d1"))
    // a read of only the earlier day must see the ns-before-midnight row:
    // double-rounded day derivation used to misfile it into d1, where the
    // partition pruning of this very query silently dropped it
    val prevDay = Tables.readRange(spark, dir, "pe", Some(mid - day), Some(mid))
      .collect().map(_.getDouble(1)).toSeq
    assert(prevDay == Seq(1.0))
    val crossing = Tables.readRange(spark, dir, "pe", Some(mid - 1), Some(mid + 2))
      .orderBy("ts").collect().map(_.getDouble(1)).toSeq
    assert(crossing == Seq(1.0, 2.0, 3.0))
  }

  test("fillGaps densifies empty buckets with zero counts") {
    val d = Seq((0L, 1.0), (25L, 2.0)).toDF("ts", "value")
    val agg = TsOps.downsample(d, 10L, "value")
    val filled = TsOps.fillGaps(agg, 10L, 0L, 40L)
      .orderBy("bucket_ts").collect()
    assert(filled.map(_.getLong(0)).toSeq == Seq(0L, 10L, 20L, 30L))
    assert(filled.map(_.getLong(1)).toSeq == Seq(1L, 0L, 1L, 0L))
    assert(filled(1).isNullAt(filled(1).fieldIndex("min_v")))
  }

  test("locf forward-fills and interpolate is linear with null edges") {
    val d = Seq[(Long, Option[Double])](
      (0L, None), (10L, Some(2.0)), (20L, None), (30L, None),
      (40L, Some(8.0)), (50L, None)
    ).toDF("bucket_ts", "v")
    val filled = TsOps.locf(d, Seq("v")).orderBy("bucket_ts").collect()
      .map(r => if (r.isNullAt(1)) None else Some(r.getDouble(1)))
    assert(filled.toSeq == Seq(None, Some(2.0), Some(2.0), Some(2.0),
      Some(8.0), Some(8.0)))
    val interp = TsOps.interpolate(d, "v").orderBy("bucket_ts").collect()
      .map(r => if (r.isNullAt(1)) None else Some(r.getDouble(1)))
    assert(interp.toSeq == Seq(None, Some(2.0), Some(4.0), Some(6.0),
      Some(8.0), None))
  }

  test("persist range-selects and later flush appends a second block") {
    val dir = SparkTestBase.tempDir("graft-store3")
    val store = new WritableStore(spark, dir, "m",
      Seq(StructField("v", DoubleType)))
    store.pushMulti((1L to 10L).map(i => DataPoint(i, Seq(i.toDouble))))
    store.persist(until = Some(6L))
    assert(store.bufferedCount == 5)
    store.persist()
    val back = Tables.read(spark, dir, "m")
    assert(back.count() == 10)
    // two flushes → two block files in the block list
    val bl = Tables.blockListDf(spark, dir, Some("m")).collect()
    assert(bl.length == 2)
  }

  test("retention: first-day cohorts, distinct actives per offset") {
    // day = ts div 10; user 1 first on day 0, active days 0 and 2 (two
    // events on day 2 count once); user 2 first on day 1, active day 1
    val ev = Seq((1L, 1L), (1L, 21L), (1L, 25L), (2L, 12L))
      .toDF("user_id", "ts")
    val out = TsOps.retention(ev, "user_id", dayNanos = 10L)
      .collect().map(r => (r.getAs[Long]("cohort_day"),
        r.getAs[Long]("day_offset")) -> r.getAs[Long]("n_users")).toMap
    assert(out == Map((0L, 0L) -> 1L, (0L, 2L) -> 1L, (1L, 0L) -> 1L))
  }

  test("intervalJoin: bin-spanning intervals, overlaps, residual filter") {
    // bin = 10; interval A [5, 25] spans bins 0-2, B [22, 24] inside bin 2,
    // C other key. Point 23 (bin 2) hits BOTH A and B exactly once each;
    // point 7 hits A only; point 40 (bin 4) and key-2 point 23 hit nothing
    // except C where applicable.
    val iv = Seq((1L, 5L, 25L, "A"), (1L, 22L, 24L, "B"), (2L, 30L, 45L, "C"))
      .toDF("k", "s", "e", "name")
    val pts = Seq((1L, 7L), (1L, 23L), (1L, 40L), (2L, 23L), (2L, 31L))
      .toDF("k", "ts")
    val out = TsOps.intervalJoin(pts, iv, Seq("k"), "s", "e", binNanos = 10L)
      .select("k", "ts", "name").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(out == Set((1L, 7L, "A"), (1L, 23L, "A"), (1L, 23L, "B"),
      (2L, 31L, "C")))
    // no duplicate pairs even though A spans 3 bins
    val n = TsOps.intervalJoin(pts, iv, Seq("k"), "s", "e", binNanos = 10L)
      .count()
    assert(n == 4)
  }

  test("heatmap: epoch day 0 is Thursday, hour buckets from pure arithmetic") {
    val day = 86400L * 1000000000L
    val hour = 3600L * 1000000000L
    // ts=0 → Thursday (dow 4) hour 0; ts=day+2.5h → Friday (dow 5) hour 2
    val ev = Seq(0L, day + 2L * hour + hour / 2, day + 2L * hour).toDF("ts")
    val out = TsOps.heatmap(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map((4L, 0L) -> 1L, (5L, 2L) -> 2L))
  }

  test("pre-epoch timestamps bucket with floor semantics (DuckDB `//` parity)") {
    // SQL `div` truncates toward zero, so a negative epoch-nano ts would
    // bucket one HIGH (into the window after it); the operators bucket via
    // (x - pmod(x, b)) div b = floor division, matching DuckDB's `//` and
    // Math.floorDiv — the semantics every oracle comparison rides
    // one nano before epoch = Wednesday 1969-12-31 23:59:59.999999999 UTC
    val hm = TsOps.heatmap(Seq(-1L).toDF("ts")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(hm == Map((3L, 23L) -> 1L))
    // window=slide=10 → exactly one window per row; ts=-1 belongs to
    // [-10, 0), not [0, 10) as truncation would have it
    val hop = TsOps.hoppingDownsample(Seq((-1L, 1.0)).toDF("ts", "value"),
      10L, 10L, "value").collect().map(_.getLong(0)).toSeq
    assert(hop == Seq(-10L))
    val ds = TsOps.downsample(Seq((-1L, 1.0)).toDF("ts", "value"), 10L,
      "value").collect().map(_.getLong(0)).toSeq
    assert(ds == Seq(-10L))
    // activity on days -1 and 0 → cohort -1, offsets 0 and 1
    val ret = TsOps.retention(Seq((1L, -5L), (1L, 5L)).toDF("user_id", "ts"),
      "user_id", dayNanos = 10L).collect()
      .map(r => (r.getAs[Long]("cohort_day"), r.getAs[Long]("day_offset")) ->
        r.getAs[Long]("n_users")).toMap
    assert(ret == Map((-1L, 0L) -> 1L, (-1L, 1L) -> 1L))
    // interval [-10,-1] floors to bin -1 only; point -5 floors to bin -1
    // → one match (truncation would put the point in bin 0, missing it
    // unless the interval's spurious extra bin 0 caught it)
    val ij = TsOps.intervalJoin(Seq((1L, -5L)).toDF("k", "ts"),
      Seq((1L, -10L, -1L)).toDF("k", "s", "e"), Seq("k"), "s", "e",
      binNanos = 10L)
    assert(ij.count() == 1)
    val au = TsOps.activeUsers(Seq((1L, -1L)).toDF("user_id", "ts"),
      "user_id", 10L).collect().map(_.getLong(0)).toSeq
    assert(au == Seq(-1L))
  }

  test("gapStats: consecutive deltas per key, dup-ts gap is zero") {
    val ev = Seq((1L, 10L), (1L, 30L), (1L, 30L), (1L, 70L), (2L, 5L))
      .toDF("k", "ts")
    val out = TsOps.gapStats(ev, Seq("k")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    // user 2 has a single event → no gaps → no row
    assert(out == Map(1L -> ((3L, 0L, 40L, 60L))))
  }

  test("new ops: empty inputs yield empty outputs, no exceptions") {
    val emptyEv = Seq.empty[(Long, Long, Long, String)]
      .toDF("user_id", "ts", "event_id", "event_type")
    val emptyIv = Seq.empty[(Long, Long, Long)].toDF("k", "s", "e")
    val emptyPts = Seq.empty[(Long, Long)].toDF("k", "ts")
    assert(TsOps.retention(emptyEv, "user_id", 10L).isEmpty)
    assert(TsOps.transitions(emptyEv, Seq("user_id"), "event_type",
      Seq("ts", "event_id")).isEmpty)
    assert(TsOps.intervalJoin(emptyPts, emptyIv, Seq("k"), "s", "e", 10L)
      .isEmpty)
    assert(TsOps.heatmap(emptyEv).isEmpty)
    assert(TsOps.gapStats(emptyEv, Seq("user_id")).isEmpty)
    assert(TsOps.activeUsers(emptyEv, "user_id", 10L).isEmpty)
    assert(TsOps.hoppingDownsample(emptyEv.withColumn("value", lit(1.0)),
      20L, 10L, "value").isEmpty)
    val emptyVal = Seq.empty[(Long, Long, Long, Double)]
      .toDF("event_id", "user_id", "ts", "value")
    assert(TsOps.madAnomalies(emptyVal, "value", Seq("user_id")).isEmpty)
  }

  test("madAnomalies: integer MAD rule flags the planted spike, minN gates") {
    // user 1: ten 1.00s and one 50.00 → med=100c, MAD=0 → spike flagged
    // (dev2=9800·2 > 3·0); the 1.00 points have dev2=0 → clean.
    // user 2: < 10 points → gated out entirely.
    val ev = ((1 to 10).map(i => (i.toLong, 1L, i.toLong * 10, 1.0)) :+
      (11L, 1L, 110L, 50.0)) ++ Seq((20L, 2L, 5L, 999.0))
    val df = ev.toDF("event_id", "user_id", "ts", "value")
    val out = TsOps.madAnomalies(df, "value", Seq("user_id")).collect()
      .map(_.getAs[Long]("event_id"))
    assert(out.toSeq == Seq(11L))
  }

  test("hoppingDownsample: each row lands in window/slide windows") {
    // window=20, slide=10 → k=2; ts=25 lands in starts {10, 20};
    // ts=5 in {-10, 0}; counts per start reflect the overlap
    val ev = Seq((25L, 1.0), (5L, 2.0)).toDF("ts", "value")
    val out = TsOps.hoppingDownsample(ev, 20L, 10L, "value").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(-10L -> 1L, 0L -> 1L, 10L -> 1L, 20L -> 1L))
  }

  test("transitions: adjacent pairs per key in total order, last row dropped") {
    // user 1: a@1 → b@2 → a@3; user 2: b@5 → b@6; singleton user 3 emits none
    val ev = Seq((1L, 1L, 10L, "a"), (1L, 2L, 11L, "b"), (1L, 3L, 12L, "a"),
      (2L, 5L, 13L, "b"), (2L, 6L, 14L, "b"), (3L, 9L, 15L, "a"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = TsOps.transitions(ev, Seq("user_id"), "event_type",
      Seq("ts", "event_id")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("a", "b") -> 1L, ("b", "a") -> 1L, ("b", "b") -> 1L))
  }

  test("funnel: ordered stages within window, greedy anchor, dropouts excluded") {
    val ev = Seq(
      // user 1 completes in order: view@10, click@20, purchase@30
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      // user 2: purchase BEFORE click → no completion
      (2L, 10L, "view"), (2L, 30L, "click"), (2L, 20L, "purchase"),
      // user 3: click outside the window of the first view
      (3L, 10L, "view"), (3L, 200L, "click"), (3L, 210L, "purchase"),
      // user 4: two views; greedy anchors at the FIRST (t1 = 5)
      (4L, 5L, "view"), (4L, 8L, "view"), (4L, 9L, "click"),
      (4L, 12L, "purchase"))
      .toDF("user_id", "ts", "event_type")
    val out = TsOps.funnel(ev, Seq("user_id"),
      Seq("view", "click", "purchase"), withinNanos = 50L)
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("t1"), r.getAs[Long]("t2"), r.getAs[Long]("t3"))))
      .toMap
    assert(out == Map(1L -> ((10L, 20L, 30L)), 4L -> ((5L, 9L, 12L))))
  }

  test("zscore anomalies: planted spike flagged, steady points are not") {
    // one user, 12 steady points at 50.00 then a 99.00 spike, 1s apart —
    // only the spike deviates > 2σ from its trailing window
    val rows = (0 until 12).map(i =>
      (i.toLong, i * 1000000000L, 7L, 50.0)) :+
      (12L, 12L * 1000000000L, 7L, 99.0)
    val ev = rows.toDF("event_id", "ts", "user_id", "value")
    val out = TsOps.zscoreAnomalies(ev, 60L * 1000000000L, "value",
      Seq("user_id"), k = 2, minN = 10).collect()
    assert(out.map(_.getAs[Long]("event_id")).toSeq == Seq(12L))
    val r = out(0)
    // exact integer terms: n=13, c=9900, S=12*5000+9900
    val (n, s) = (13L, 12L * 5000L + 9900L)
    assert(r.getAs[Long]("roll_n") == n)
    assert(r.getAs[Long]("lhs") == (n * 9900L - s) * (n * 9900L - s))
    // a window still under minN points flags nothing even on a spike
    val few = (0 until 5).map(i =>
      (i.toLong, i * 1000000000L, 8L, 50.0)) :+
      (5L, 5L * 1000000000L, 8L, 99.0)
    assert(TsOps.zscoreAnomalies(few.toDF("event_id", "ts", "user_id",
      "value"), 60L * 1000000000L, "value", Seq("user_id")).count() == 0)
  }

  test("seasonal anomalies: spike flagged against its OWN dow×hour cell") {
    val hour = 3600L * 1000000000L
    val day = 86400L * 1000000000L
    // twelve Thursdays (epoch day 0 = Thursday, dow 4) at hour 0, steady
    // 50.00 plus one 99.00; hour 1 gets a same-value 99.00 crowd so the
    // spike is only anomalous within its own cell
    val rows = (0 until 11).map(i =>
      (i.toLong, i * 7 * day, 99.0 * 0 + 50.0)) ++ Seq((11L, 11 * 7 * day, 99.0)) ++
      (20 until 32).map(i => (i.toLong, (i - 20) * 7 * day + hour, 99.0))
    val ev = rows.toDF("event_id", "ts", "value")
    val out = TsOps.seasonalAnomalies(ev, "value", k = 2, minN = 10)
      .collect()
    assert(out.map(_.getAs[Long]("event_id")).toSeq == Seq(11L))
    assert(out(0).getAs[Long]("dow") == 4L && out(0).getAs[Long]("hour") == 0L)
  }

  test("paa symbols + sax words: quantile symbols in segment order") {
    // one user, 8 segments of one point each, values in a shuffled order:
    // quartile symbols must follow the VALUE ranking, the word follows
    // segment TIME order
    val seg = 10L
    val vals = Seq(3.0, 7.0, 1.0, 8.0, 5.0, 2.0, 6.0, 4.0)
    val ev = vals.zipWithIndex.map { case (v, i) => (1L, i * seg, v) }
      .toDF("user_id", "ts", "value")
    val syms = TsOps.paaSymbols(ev, Seq("user_id"), seg, alphabet = 4)
      .orderBy("seg").collect().map(_.getAs[Int]("symbol")).toSeq
    // value ranks: 3,7,1,8,5,2,6,4 → quartiles (1=lowest): 2,4,1,4,3,1,3,2
    assert(syms == Seq(2, 4, 1, 4, 3, 1, 3, 2))
    val words = TsOps.saxWords(ev, Seq("user_id"), seg, alphabet = 4)
      .collect()
    assert(words.length == 1)
    assert(words(0).getAs[String]("word") == "bdadcaCB".toLowerCase)
    assert(words(0).getAs[Long]("n_segments") == 8L)
  }

  test("counterIncrease: resets count the post-reset value, day attribution") {
    val day = 86400L * 1000000000L
    val g = 1000000000L
    // user 1: 10.00 → 12.50 (+250) → 3.00 (RESET, +300) in day 0;
    //         3.00 (+0) → 7.25 (+425) in day 1
    // user 2: a single sample — no delta, must not appear at all
    val ev = Seq(
      (1L, 1 * g, 1L, 10.00), (1L, 2 * g, 2L, 12.50), (1L, 3 * g, 3L, 3.00),
      (1L, day + 1 * g, 4L, 3.00), (1L, day + 2 * g, 5L, 7.25),
      (2L, 5 * g, 6L, 99.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val out = TsOps.counterIncrease(ev, Seq("user_id"), day)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("bucket")) ->
        ((r.getAs[Long]("n_deltas"), r.getAs[Long]("inc_cents"),
          r.getAs[Long]("n_resets")))).toMap
    assert(out == Map(
      (1L, 0L) -> ((2L, 550L, 1L)),
      (1L, 1L) -> ((2L, 425L, 0L))))
    // bucket sums telescope: total increase = Σ per-day increases
    assert(out.values.map(_._2).sum == 250L + 300L + 0L + 425L)
  }

  test("counterIncreaseCoarsen: stored fine rows sum to the direct " +
      "coarse pass — floor semantics across the epoch") {
    val h = 3600L * 1000000000L
    val day = 24 * h
    // samples straddle the epoch: pre-epoch hours must land in coarse
    // bucket -1 (floor), not 0 (toward-zero truncation)
    val ev = Seq(
      (1L, -2 * h + 5L, 1L, 10.00), (1L, -h + 9L, 2L, 12.50),
      (1L, h + 3L, 3L, 3.00), (1L, 2 * h + 7L, 4L, 7.25),
      (1L, day + h, 5L, 9.00)
    ).toDF("user_id", "ts", "event_id", "value")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("bucket")) ->
        ((r.getAs[Long]("n_deltas"), r.getAs[Long]("inc_cents"),
          r.getAs[Long]("n_resets")))).toMap
    val direct = rows(TsOps.counterIncrease(ev, Seq("user_id"), day))
    val viaStore = rows(TsOps.counterIncreaseCoarsen(
      TsOps.counterIncrease(ev, Seq("user_id"), h), factor = 24L,
      Seq("user_id")))
    assert(viaStore == direct)
    assert(direct.keySet.map(_._2).contains(-1L),
      "fixture must actually exercise a pre-epoch coarse bucket")
  }

  test("toleranceJoin: inclusive bound, adjacent buckets, no duplicates") {
    import spark.implicits._
    val tol = 100L
    val l = Seq((1L, 1000L, 10L), (1L, 5000L, 11L), (2L, 1000L, 12L))
      .toDF("k", "ts", "lid")
    // matches for lid=10 (k=1, ts=1000): 900 (tol-exact, PREVIOUS bucket),
    // 1100 (tol-exact, NEXT bucket), 1050 (same bucket); 1101 is 1ns out;
    // k=2 r-side rows must not match k=1
    val r = Seq((1L, 900L, 20L), (1L, 1100L, 21L), (1L, 1050L, 22L),
      (1L, 1101L, 23L), (2L, 1000L, 24L)).toDF("k", "ts", "rid")
    val out = graft.operators.TsOps.toleranceJoin(l, r, tol, Seq("k"))
      .select("k", "lid", "r_rid").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).sorted.toSeq
    assert(out == Seq((1L, 10L, 20L), (1L, 10L, 21L), (1L, 10L, 22L),
      (2L, 12L, 24L)))
  }

  private def hq(rows: Seq[(String, Double)], bounds: Seq[Long], qn: Long,
      qd: Long): Map[String, (Long, Long)] =
    TsOps.histogramQuantile(rows.toDF("k", "value"), Seq("k"), bounds, qn, qd)
      .collect()
      .map(r => r.getAs[String]("k") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("q_cents")))).toMap

  test("histogramQuantile: interpolation skips empty schedule buckets") {
    // values 50c and 250c against bounds [100, 200, 300]: buckets present
    // are le=100 (cnt 1) and le=300 (cnt 1); the 200 bucket is EMPTY.
    // p90: rank condition cum·100 ≥ total·90 first holds at le=300
    // (cum 2 ≥ 1.8); the interpolation lower bound must be the SCHEDULE
    // predecessor 200 (not the data predecessor 100):
    // 200 + ⌊(300−200)·(90·2 − 100·1) / (100·1)⌋ = 200 + 80 = 280
    val out = hq(Seq(("a", 0.50), ("a", 2.50)), Seq(100L, 200L, 300L),
      90L, 100L)
    assert(out == Map("a" -> ((2L, 280L))))
  }

  test("histogramQuantile: first bucket interpolates from zero") {
    // one value in the first bucket, median: 0 + ⌊100·(1·1 − 2·0)/(2·1)⌋
    val out = hq(Seq(("a", 0.50)), Seq(100L, 200L), 1L, 2L)
    assert(out == Map("a" -> ((1L, 50L))))
  }

  test("histogramQuantile: +Inf bucket reports the highest finite bound") {
    // both values above every bound → quantile lands in the +Inf bucket;
    // Prometheus semantics: report the last finite bound, never infinity
    val out = hq(Seq(("a", 9.00), ("a", 8.00)), Seq(100L, 200L), 90L, 100L)
    assert(out == Map("a" -> ((2L, 200L))))
  }

  test("histogramQuantile: per-key independence and exact bound hit") {
    // key b: values 1.00 ×9 and 2.00 ×1 with bounds [100, 200]: p90 rank
    // condition holds at le=100 exactly (cum·100 = 900 = total·90) →
    // 0 + ⌊100·(90·10 − 100·0)/(100·9)⌋ = 100 — the bucket upper bound
    // key c: one 40c value, p90 in the first bucket:
    // 0 + ⌊(100−0)·(90·1 − 100·0)/(100·1)⌋ = 90
    val rows = Seq.fill(9)(("b", 1.00)) :+ (("b", 2.00)) :+ (("c", 0.40))
    val out = hq(rows, Seq(100L, 200L), 90L, 100L)
    assert(out == Map("b" -> ((10L, 100L)), "c" -> ((1L, 90L))))
  }

  test("counterIncrease: a malformed sample neither counts nor swallows") {
    // [10.00, null, 20.00] per key: the null is dropped BEFORE the lag, so
    // the 20.00 sample still diffs against 10.00 — without the filter the
    // null row would emit a null-inc delta and the real 1000c increase
    // would vanish (and batch would diverge from the streaming twin,
    // which drops non-castable rows before its state function)
    val rows = Seq((1L, 1L, 1L, Some(10.00)), (1L, 2L, 2L, None),
      (1L, 3L, 3L, Some(20.00))).toDF("k", "ts", "event_id", "value")
    val out = TsOps.counterIncrease(rows, Seq("k"), 1000L)
      .select("n_deltas", "inc_cents", "n_resets").collect()
    assert(out.length == 1)
    assert((out(0).getLong(0), out(0).getLong(1), out(0).getLong(2)) ==
      ((1L, 1000L, 0L)))
  }

  test("histogramQuantile: malformed values observe nothing, not +Inf") {
    // 9 nulls beside one real 50c observation: the nulls must not count
    // as +Inf observations (they would drag p50 to the top bound)
    val rows = (Seq(("a", Some(0.50))) ++ Seq.fill(9)(("a", None: Option[Double])))
      .toDF("k", "value")
    val out = TsOps.histogramQuantile(rows, Seq("k"), Seq(100L, 200L),
      1L, 2L).select("n", "q_cents").collect()
    assert(out.length == 1)
    assert((out(0).getLong(0), out(0).getLong(1)) == ((1L, 50L)))
  }

  test("histogramQuantile: non-positive first bound reports the bound") {
    // cents −150 lands in the le=−100 bucket; interpolating that bucket
    // from 0 would report a value ABOVE every observation in it —
    // Prometheus returns the bucket bound itself when it is ≤ 0
    val out = hq(Seq(("a", -1.50)), Seq(-100L, 0L, 100L), 1L, 2L)
    assert(out == Map("a" -> ((1L, -100L))))
  }

  test("madAnomalies: NULL-key series is processed, not silently dropped") {
    // groupBy puts null keys in one group (as a window partition would);
    // the joins back must be null-safe or the whole series vanishes
    val rows = (Seq.fill(10)((None: Option[Long], 1.00)) :+
      ((None: Option[Long], 100.00))).zipWithIndex
      .map { case ((k, v), i) => (k, i.toLong, v) }.toDF("k", "event_id", "value")
    val flagged = TsOps.madAnomalies(rows, "value", Seq("k")).collect()
    assert(flagged.length == 1)
    assert(flagged(0).isNullAt(flagged(0).fieldIndex("k")))
    assert(flagged(0).getAs[Long]("dev2") == 19800L)
  }

  test("asof join: duplicate right timestamps resolve deterministically") {
    // two right rows at the same (key, ts): the GREATEST payload struct
    // wins — an explicit tie-break, so reruns and repartitionings agree
    val l = Seq((1L, 150L, 9L)).toDF("k", "ts", "lid")
    val r = Seq((1L, 100L, 1.0), (1L, 100L, 2.0)).toDF("k", "ts", "v")
    val out = TsOps.asofJoin(l, r, Seq("k"))
    assert(out.select("r_v").head.getDouble(0) == 2.0)
  }

  test("degenerate parameters fail loudly instead of corrupting output") {
    val d = Seq((1L, 1.0)).toDF("ts", "value")
    val e = Seq((1L, 1L, "a", 1L)).toDF("ts", "user_id", "event_type", "event_id")
    intercept[IllegalArgumentException](TsOps.downsample(d, 0L, "value"))
    intercept[IllegalArgumentException](TsOps.fillGaps(d, 0L, 0L, 10L))
    intercept[IllegalArgumentException](
      TsOps.rollingAgg(d, 0L, "value", Seq("ts")))
    intercept[IllegalArgumentException](
      TsOps.zscoreAnomalies(d, 0L, "value", Nil))
    intercept[IllegalArgumentException](TsOps.sessionize(e, 0L, Seq("user_id")))
    intercept[IllegalArgumentException](
      TsOps.sessionizeChunked(e, 0L, Seq("user_id")))
    intercept[IllegalArgumentException](TsOps.retention(e, "user_id", 0L))
    // windowDays = 0 would sequence() DESCENDING and count users toward
    // the WRONG day — must throw, not silently misattribute
    intercept[IllegalArgumentException](
      TsOps.activeUsers(e, "user_id", 1L, windowDays = 0))
    intercept[IllegalArgumentException](
      TsOps.paaSymbols(d, Nil, 0L))
    intercept[IllegalArgumentException](
      TsOps.transitions(e, Seq("user_id"), "event_type", Nil))
  }

  test("intervalJoin: colliding non-key columns are rejected loudly") {
    // both sides carry `value` beyond the key — downstream references
    // would be ambiguous; the operator fails with a clear message instead
    val pts = Seq((1L, 5L, 1.0)).toDF("k", "ts", "value")
    val ivs = Seq((1L, 0L, 10L, 2.0)).toDF("k", "s", "e", "value")
    val ex = intercept[IllegalArgumentException](
      TsOps.intervalJoin(pts, ivs, Seq("k"), "s", "e", 10L))
    assert(ex.getMessage.contains("value"))
  }

  test("seasonalProfile: sum of squares rides decimal, not a wrapped long") {
    // cents 4e9 per sample → c² = 1.6e19 > Long.Max; ten samples in one
    // cell must yield Σc² = 1.6e20 exactly (a long sum would wrap
    // negative and poison every flag decision in the cell)
    val rows = (0 until 10).map(i => (i.toLong, 4.0e7)).toDF("ts", "value")
    val sq = TsOps.seasonalProfile(rows, "value", minN = 1)
      .select("__sq").head.getDecimal(0)
    assert(sq.compareTo(new java.math.BigDecimal("160000000000000000000")) == 0)
  }
}
