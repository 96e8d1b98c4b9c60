package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.plans.NanoTsRewrite]]: literal predicates over the epoch-nano
  * normalization of a native `timestamp[us]` column must (a) keep exact
  * integer semantics at every bound direction — including ns literals that
  * are not whole µs, where naive division would off-by-one — and (b) reach
  * the parquet scan as PushedFilters on the native column.
  */
class NanoTsRewriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** A tiny timestamp[us] parquet table: micros −2, −1, 0, 1, 2 around the
    * epoch (negatives pin the floor-vs-truncate distinction). */
  private lazy val dir: String = {
    val d = SparkTestBase.tempDir("nanots")
    Seq(-2L, -1L, 0L, 1L, 2L).toDF("us")
      .select(col("us"), timestamp_micros(col("us")).as("ts"))
      .write.mode("overwrite").parquet(s"$d/t.parquet")
    d
  }

  private def tbl = graft.storage.Tables.read(spark, dir, "t")

  test("normalizeTs yields epoch-nano longs from timestamp[us]") {
    val rows = tbl.select("us", "ts").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSet == Set(-2L, -1L, 0L, 1L, 2L).map(u => (u, u * 1000L)))
  }

  /** Expected survivor set computed directly over ns = us·1000. */
  private def expect(pred: Long => Boolean): Set[Long] =
    Set(-2L, -1L, 0L, 1L, 2L).filter(u => pred(u * 1000L))

  test("every bound direction matches brute-force ns semantics") {
    // ns literals straddling µs boundaries: whole-µs, +1ns, −1ns, negatives
    val lits = Seq(-2000L, -1999L, -1001L, -1000L, -1L, 0L, 1L, 999L, 1000L,
      1001L, 1999L, 2000L)
    for (v <- lits) {
      def got(f: org.apache.spark.sql.Column): Set[Long] =
        tbl.filter(f).select("us").collect().map(_.getLong(0)).toSet
      assert(got(col("ts") >= v) == expect(_ >= v), s">= $v")
      assert(got(col("ts") > v) == expect(_ > v), s"> $v")
      assert(got(col("ts") <= v) == expect(_ <= v), s"<= $v")
      assert(got(col("ts") < v) == expect(_ < v), s"< $v")
      assert(got(col("ts") === v) == expect(_ == v), s"= $v")
      assert(got(lit(v) <= col("ts")) == expect(_ >= v), s"$v <= ts")
      assert(got(lit(v) < col("ts")) == expect(_ > v), s"$v < ts")
      assert(got(lit(v) >= col("ts")) == expect(_ <= v), s"$v >= ts")
      assert(got(lit(v) > col("ts")) == expect(_ < v), s"$v > ts")
    }
  }

  test("rewritten predicate reaches the parquet scan as PushedFilters") {
    val p = tbl.filter(col("ts") >= 1000L && col("ts") < 2000L)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") &&
      p.contains("GreaterThanOrEqual(ts,") && p.contains("LessThan(ts,"), p)
  }

  test("readRange prunes with native pushdown too") {
    val df = graft.storage.Tables.readRange(spark, dir, "t",
      since = Some(-1000L), until = Some(2000L))
    assert(df.select("us").collect().map(_.getLong(0)).toSet == Set(-1L, 0L, 1L))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("GreaterThanOrEqual(ts,"), p)
  }
}
