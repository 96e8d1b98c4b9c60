package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.ql.Engine
import graft.storage.{DataPoint, WritableStore}

/** End-to-end minimum slice (SURVEY §7.3): ingest → flush → dialect query →
  * formatted output; plus meta-tables and output-format behavior.
  */
class EngineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** trades fixture from the reference README (README.md:237-282). */
  private lazy val dbDir: String = {
    val dir = SparkTestBase.tempDir("graft-db")
    val store = new WritableStore(spark, dir, "trades", Seq(
      StructField("is_buy", BooleanType),
      StructField("price", DoubleType),
      StructField("size", DoubleType)))
    // 2022-04-26T09:00 JST = 2022-04-26T00:00 UTC
    val base = 1650931200L * 1000000000L
    store.pushMulti(Seq(
      DataPoint(base + 10, Seq(true, 100.0, 1.0)),
      DataPoint(base + 60L * 1000000000L, Seq(false, 101.5, 2.0)),
      DataPoint(base + 90L * 1000000000L, Seq(true, 102.0, 0.5)),
      DataPoint(base + 200L * 1000000000L, Seq(false, 99.0, 3.0))))
    store.persist()
    dir
  }

  test("minimum slice: with cols+tz, select subset, in-range, ascii table") {
    val e = new Engine(spark, dbDir)
    val out = e.execute(
      "with cols = [is_buy, price, volume], tz = +9 " +
        "select is_buy, price from trades where ts in ('2022-04-26 09:00', +2 minutes);")
    assert(out.contains("| ts"))
    assert(out.contains("is_buy"))
    assert(out.contains("price"))
    assert(!out.contains("volume"))
    // 3 rows inside [09:00, 09:02) JST
    assert(out.linesIterator.count(_.startsWith("|")) == 1 + 3)
    // ns-precision tz rendering
    assert(out.contains("2022-04-26T09:00:00.000000010+09:00"))
  }

  test("empty result renders [empty]") {
    val e = new Engine(spark, dbDir)
    val out = e.execute("select * from trades where ts in ('1999-01-01', +1 day)")
    assert(out == "[empty]")
  }

  test("render caps at maxRows via local iterator (no unbounded collect)") {
    import graft.ql.Output
    val e = new Engine(spark, dbDir)
    val df = e.frame("select * from trades where ts in ('2022-04-26', +1 day)")
    val capped = Output.asciiTable(df, java.time.ZoneOffset.UTC,
      formatDatetime = false, maxRows = 2)
    assert(capped.linesIterator.count(_.startsWith("|")) == 1 + 2)
    assert(capped.endsWith("[truncated to 2 rows]"))
    val full = Output.asciiTable(df, java.time.ZoneOffset.UTC,
      formatDatetime = false)
    assert(full.linesIterator.count(_.startsWith("|")) == 1 + 4)
    assert(!full.contains("truncated"))
    val json = Output.columnJson(df, java.time.ZoneOffset.UTC,
      formatDatetime = false, maxRows = 3)
    assert(json.contains("\"price\":[100.0,101.5,102.0]"))
    // capped JSON is marked — a truncated result must be distinguishable
    assert(json.contains("\"__truncated__\":3"))
    val fullJson = Output.columnJson(df, java.time.ZoneOffset.UTC,
      formatDatetime = false)
    assert(!fullJson.contains("__truncated__"))
  }

  test("column-oriented json output") {
    val e = new Engine(spark, dbDir)
    val out = e.execute(
      "with cols = [is_buy, price, volume], format = json, format_datetime = false " +
        "select price from trades where ts in ('2022-04-26', +1 day)")
    assert(out.startsWith("{\"ts\":["))
    assert(out.contains("\"price\":[100.0,101.5,102.0,99.0]"))
  }

  test("parquet output writes file") {
    val e = new Engine(spark, dbDir)
    val out = java.nio.file.Files.createTempDirectory("graft-out").toString + "/r"
    e.execute(
      s"with format = parquet_snappy, output_file = '$out' " +
        "select * from trades where ts in ('2022-04-26', +1 day)")
    val back = spark.read.parquet(out)
    assert(back.count() == 4)
    assert(back.columns.head == "ts")
    // interactive-scale result → the reference's one-parquet-per-query shape
    assert(new java.io.File(out).listFiles()
      .count(_.getName.endsWith(".parquet")) == 1)
  }

  test("single-file parquet default is size-guarded, not unconditional") {
    // small estimate → single file (reference parity); big estimate → the
    // coalesce(1) one-task funnel must NOT apply to a large extract
    val e = new Engine(spark, dbDir)
    val small = e.frame("select * from trades where ts in ('2022-04-26', +1 day)")
    assert(graft.ql.Output.singleFileFor(small))
    val big = spark.range(1L << 32) // Catalyst sizes this at 8 B/row = 32 GB
    assert(!graft.ql.Output.singleFileFor(big.toDF()))
  }

  test("grouped tail via dialect") {
    val e = new Engine(spark, dbDir)
    val df = e.frame("select * from trades where ts <=|2 '2023-01-01'")
    assert(df.count() == 2) // two largest distinct ts
  }

  test("meta .metrics lists the metrics") {
    val e = new Engine(spark, dbDir)
    val names = e.frame("select * from .metrics").collect().map(_.getString(0))
    assert(names.contains("trades"))
  }

  test("meta .describe returns range") {
    val e = new Engine(spark, dbDir)
    val row = e.frame("select * from .describe where metrics = trades").collect()(0)
    assert(row.getAs[String]("metrics") == "trades")
    assert(row.getAs[Long]("row_num") == 4L)
    assert(row.getAs[Long]("from_ts") <= row.getAs[Long]("end_ts"))
  }

  test("meta .block_list has one row per block file") {
    val e = new Engine(spark, dbDir)
    val rows = e.frame("select * from .block_list where metrics = trades").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("metrics") == "trades"))
  }

  test("filter pushdown reaches the parquet scan (uncached path)") {
    val e = new Engine(spark, dbDir)
    val df = e.frame(
      "with use_cache = false select * from trades where ts in ('2022-04-26', +1 day)")
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") &&
      physical.contains("GreaterThanOrEqual(ts,"), physical)
  }

  test("default cached path reads from the table LRU") {
    val e = new Engine(spark, dbDir)
    val df = e.frame("select * from trades where ts in ('2022-04-26', +1 day)")
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("InMemoryTableScan"), physical)
    assert(graft.storage.CacheRegistry.size >= 1)
  }

  test("spark.sql superset over the same tables, with format_ns registered") {
    val e = new Engine(spark, dbDir)
    val rows = e.sql(
      "SELECT format_ns(ts) AS iso, price FROM trades " +
        "WHERE ts >= 1650931200000000000 ORDER BY ts").collect()
    assert(rows.length == 4)
    assert(rows(0).getString(0) == "2022-04-26T00:00:00.000000010+00:00")
  }

  test("cosine_sim registered in the SQL superset") {
    val e = new Engine(spark, dbDir)
    val r = e.sql(
      "SELECT cosine_sim(CAST(array(3.0, 4.0) AS array<float>), " +
        "CAST(array(3.0, 4.0) AS array<float>)) AS c, " +
        "cosine_sim_i8(CAST(array(3, 4) AS array<tinyint>), " +
        "CAST(array(3, 4) AS array<tinyint>)) AS i").collect()
    assert(math.abs(r(0).getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r(0).getDouble(1) - 1.0) < 1e-12)
  }

  test("db= with-clause resolves a database subdirectory") {
    val root = SparkTestBase.tempDir("graft-dbroot")
    val store = new WritableStore(spark,
      new java.io.File(root, "mydb").getPath, "m",
      Seq(StructField("v", DoubleType)))
    store.pushMulti(Seq(DataPoint(1650931200L * 1000000000L, Seq(1.5))))
    store.persist()
    val e = new Engine(spark, root)
    val df = e.frame(
      "with db = mydb, use_cache = false select * from m where ts >= '2020-01-01'")
    assert(df.collect().map(_.getDouble(1)).toSeq == Seq(1.5))
  }

  test("unknown metrics errors") {
    val e = new Engine(spark, dbDir)
    assertThrows[IllegalArgumentException](
      e.frame("select * from nope where ts in today()"))
  }
}
