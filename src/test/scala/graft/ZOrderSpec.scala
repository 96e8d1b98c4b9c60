package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order clustered writes: content-identical to the source, and the
  * footer stats must actually prune in BOTH interleaved dimensions — the
  * property the layout exists for.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import graft.storage.{Tables, ZOrder}

  private lazy val events = Tables
    .read(spark, "/root/testdata/sf0.001", "events")

  private lazy val zdir: String = {
    val d = SparkTestBase.tempDir("graft-zorder") + "/events"
    ZOrder.write(events, d, Seq("user_id", "ts"), numFiles = 16)
    d
  }

  /** Per-file (min, max) of a long column from parquet footers. */
  private def fileStats(dir: String, column: String): Seq[(Long, Long)] = {
    import scala.jdk.CollectionConverters._
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sessionState.newHadoopConf()
    new java.io.File(dir).listFiles().toSeq
      .filter(f => f.getName.endsWith(".parquet"))
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

  test("z-ordered copy is content-identical to the source") {
    val back = spark.read.parquet(zdir)
    assert(back.count() == events.count())
    assert(back.exceptAll(events).isEmpty && events.exceptAll(back).isEmpty)
  }

  test("footer stats prune in BOTH dimensions; a ts-sorted layout cannot") {
    def hitFraction(stats: Seq[(Long, Long)], lo: Long, hi: Long): Double =
      stats.count { case (mn, mx) => mx >= lo && mn <= hi }.toDouble / stats.size
    // narrow user slice (~10% of the id range) and narrow time slice
    val Array(uMin, uMax) = events.agg(min("user_id"), max("user_id"))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    val Array(tMin, tMax) = events.agg(min("ts"), max("ts"))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    val (uLo, uHi) = (uMin, uMin + (uMax - uMin) / 10)
    val (tLo, tHi) = (tMin, tMin + (tMax - tMin) / 10)
    val zU = hitFraction(fileStats(zdir, "user_id"), uLo, uHi)
    val zT = hitFraction(fileStats(zdir, "ts"), tLo, tHi)
    // both dims prune: a 10% slice must touch well under half the files
    assert(zU <= 0.5, s"user_id hit fraction $zU")
    assert(zT <= 0.5, s"ts hit fraction $zT")
    // contrast: the time-sorted layout prunes ts but is BLIND on user_id
    val tsDir = SparkTestBase.tempDir("graft-tsorder") + "/events"
    events.repartitionByRange(16, col("ts")).sortWithinPartitions("ts")
      .write.parquet(tsDir)
    assert(hitFraction(fileStats(tsDir, "ts"), tLo, tHi) <= 0.5)
    assert(hitFraction(fileStats(tsDir, "user_id"), uLo, uHi) == 1.0)
  }

  test("empty frame or all-null column fails fast with a clear error") {
    import spark.implicits._
    val out = SparkTestBase.tempDir("graft-zempty") + "/x"
    val empty = Seq.empty[(Long, Long)].toDF("user_id", "ts")
    val e1 = intercept[IllegalArgumentException] {
      ZOrder.write(empty, out, Seq("user_id", "ts"))
    }
    assert(e1.getMessage.contains("no non-null values"))
    val allNull = Seq((Some(1L), Option.empty[Long]),
      (Some(2L), Option.empty[Long])).toDF("user_id", "ts")
    val e2 = intercept[IllegalArgumentException] {
      ZOrder.write(allNull, out, Seq("user_id", "ts"))
    }
    assert(e2.getMessage.contains("'ts'"))
  }

  test("predicates on either dimension reach the scan as PushedFilters") {
    val p = spark.read.parquet(zdir)
      .filter(col("user_id") >= 10L && col("user_id") < 20L &&
        col("ts") >= 0L)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") &&
      p.contains("GreaterThanOrEqual(user_id,"), p)
  }
}
