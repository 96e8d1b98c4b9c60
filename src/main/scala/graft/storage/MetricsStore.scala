package graft.storage

import java.io.File
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-backed metrics catalog.
  *
  * A "database" is a directory; each metrics is either `dbDir/<name>/` (our
  * writer's layout, §`WritableStore`) or `dbDir/<name>.parquet` (single-file
  * layout, e.g. driver testdata). This replaces the reference's bespoke
  * block/block-list format (`zikeiretsu/src/tsdb/storage/`, SPEC.md:23-77)
  * with Parquet: row-group min/max stats are the block index, files are the
  * blocks, directory listing is the metrics list.
  *
  * Timestamps: a metrics table's `ts` column is epoch-nano LongType. Parquet
  * `timestamp[ns]` columns are read as longs via
  * `spark.sql.legacy.parquet.nanosAsLong` (set in [[Tables.configure]]).
  */
object Tables {

  /** Runtime confs every session needs before reading metrics tables. */
  def configure(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // min/max/count meta-queries answered from parquet footers
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    // the engine's time model is UTC epoch-nanos; pin the session so no
    // date/timestamp rendering ever depends on the host timezone
    spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  def metricsPath(dbDir: String, metrics: String): String = {
    val dir  = new File(dbDir, metrics)
    val file = new File(dbDir, metrics + ".parquet")
    if (dir.isDirectory) dir.getPath
    else if (file.exists) file.getPath
    else throw new IllegalArgumentException(s"unknown metrics '$metrics' in $dbDir")
  }

  def read(spark: SparkSession, dbDir: String, metrics: String): DataFrame = {
    configure(spark)
    val df = spark.read.parquet(metricsPath(dbDir, metrics))
    // drop writer partition columns (date bucketing) from the logical schema
    if (df.columns.contains(WritableStore.PartitionCol))
      df.drop(WritableStore.PartitionCol)
    else df
  }

  /** Range-aware read: applies the `[since, until)` ts predicate AND, for
    * date-bucketed tables, the equivalent predicate on the `__day` partition
    * column — directory-level pruning needs a filter on the partition column
    * itself; the ts filter alone only prunes row-groups via footer stats.
    */
  def readRange(spark: SparkSession, dbDir: String, metrics: String,
      since: Option[Long], until: Option[Long]): DataFrame = {
    configure(spark)
    val raw = spark.read.parquet(metricsPath(dbDir, metrics))
    def dayStr(nanos: Long): String =
      java.time.LocalDate.ofEpochDay(
        Math.floorDiv(nanos, 86400L * 1000000000L)).toString
    val tsConds =
      since.map(s => col("ts") >= lit(s)).toSeq ++
        until.map(u => col("ts") < lit(u)).toSeq
    val dayConds =
      if (raw.columns.contains(WritableStore.PartitionCol))
        since.map(s => col(WritableStore.PartitionCol) >= lit(dayStr(s))).toSeq ++
          until.map(u => col(WritableStore.PartitionCol) <= lit(dayStr(u - 1))).toSeq
      else Nil
    val filtered = (tsConds ++ dayConds).reduceOption(_ && _).fold(raw)(raw.filter)
    if (raw.columns.contains(WritableStore.PartitionCol))
      filtered.drop(WritableStore.PartitionCol)
    else filtered
  }

  /** All metrics names in the database dir (`.metrics` meta-table —
    * `query/executor/metrics_list.rs`). */
  def listMetrics(dbDir: String): Seq[String] = {
    val root = new File(dbDir)
    val entries = Option(root.listFiles()).getOrElse(Array.empty)
    entries.flatMap { f =>
      if (f.isDirectory && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
        Some(f.getName)
      else if (f.isFile && f.getName.endsWith(".parquet"))
        Some(f.getName.stripSuffix(".parquet"))
      else None
    }.distinct.sorted.toSeq
  }

  def metricsDf(spark: SparkSession, dbDir: String): DataFrame = {
    import spark.implicits._
    listMetrics(dbDir).toDF("metrics")
  }

  /** `.describe`: per metrics — row count and ts range (`.describe` builds
    * updated_at/block_num/from/end from block metadata,
    * `query/executor/describe_metrics.rs:9-113`). With aggregate pushdown the
    * min/max/count run footer-only.
    */
  /** Data files + newest mtime (ns) for a metrics — `.describe`'s
    * updated_at/block_num (reference block metadata,
    * `describe_metrics.rs:95-112`). */
  private def dataFiles(dbDir: String, metrics: String): Seq[File] = {
    val root = new File(metricsPath(dbDir, metrics))
    def walk(f: File): Seq[File] =
      if (f.isFile) Seq(f)
      else Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
    walk(root).filter(f =>
      f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
  }

  private def fileStats(dbDir: String, metrics: String): (Long, Long) = {
    val files = dataFiles(dbDir, metrics)
    val mtimeNs = files.map(_.lastModified()).maxOption.getOrElse(0L) * 1000000L
    (files.length.toLong, mtimeNs)
  }

  def describeDf(spark: SparkSession, dbDir: String,
      metricsFilter: Option[String]): DataFrame = {
    configure(spark)
    val names = metricsFilter.fold(listMetrics(dbDir))(m => Seq(m))
    val frames = names.map { m =>
      val (blockNum, updatedAt) = fileStats(dbDir, m)
      val df = read(spark, dbDir, m)
      val base =
        if (df.columns.contains("ts"))
          df.agg(count(lit(1)).as("row_num"),
            min("ts").as("from_ts"), max("ts").as("end_ts"))
        else
          df.agg(count(lit(1)).as("row_num"))
            .withColumn("from_ts", lit(null).cast("long"))
            .withColumn("end_ts", lit(null).cast("long"))
      base.select(lit(m).as("metrics"), lit(updatedAt).as("updated_at"),
        lit(blockNum).as("block_num"), col("row_num"), col("from_ts"),
        col("end_ts"))
    }
    frames.reduce(_.unionByName(_)).orderBy("metrics")
  }

  /** `.block_list`: one row per parquet data file ("block"), with its ts
    * min/max (`describe_metrics.rs:116-158`). seq = position in filename
    * order, mirroring the reference's block sequence numbers.
    */
  def blockListDf(spark: SparkSession, dbDir: String,
      metricsFilter: Option[String]): DataFrame = {
    configure(spark)
    val names = metricsFilter.fold(listMetrics(dbDir))(m => Seq(m))
    val frames = names.flatMap { m =>
      val df = read(spark, dbDir, m)
      if (!df.columns.contains("ts")) None
      else Some {
        import org.apache.spark.sql.expressions.Window
        import spark.implicits._
        val perFile = df.groupBy(input_file_name().as("file"))
          .agg(count(lit(1)).as("row_num"),
            min("ts").as("block_start"), max("ts").as("block_end"))
        // per-block updated_at from file mtimes, joined on unique part name
        val mtimes = dataFiles(dbDir, m)
          .map(f => (f.getName, f.lastModified() * 1000000L))
          .toDF("fname", "updated_at")
        perFile
          .withColumn("fname", element_at(split(col("file"), "/"), -1))
          .join(broadcast(mtimes), Seq("fname"), "left_outer")
          .withColumn("seq",
            row_number().over(Window.orderBy(col("block_start"), col("file"))))
          .select(lit(m).as("metrics"), col("updated_at"), col("seq"),
            col("row_num"), col("block_start"), col("block_end"))
      }
    }
    if (frames.isEmpty) {
      import org.apache.spark.sql.types._
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          StructField("metrics", StringType),
          StructField("updated_at", LongType),
          StructField("seq", IntegerType),
          StructField("row_num", LongType),
          StructField("block_start", LongType),
          StructField("block_end", LongType))))
    } else frames.reduce(_.unionByName(_)).orderBy("metrics", "seq")
  }
}
