package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fuzz coverage for [[graft.plans.NanoTsRewrite]]'s bound arithmetic:
  * random µs payloads (both signs, boundary-adjacent) against random ns
  * literals, every comparison direction, Spark result vs a plain Scala
  * evaluation of the same predicate over ns = µs·1000. Complements the
  * handpicked boundary cases in NanoTsRewriteSpec — the failure mode this
  * hunts is an off-by-one in a floor/ceil direction that only some
  * (value, literal) residue combination exposes.
  */
class NanoTsRewritePropSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("randomized bounds: rewritten filters match brute-force ns semantics") {
    val rnd = new scala.util.Random(20260813L)
    // µs values clustered near literal/1000 boundaries on purpose
    val us = (Seq(-3L, -2L, -1L, 0L, 1L, 2L, 3L) ++
      (0 until 150).map(_ => rnd.nextLong() % 2000000L)).distinct
    val dir = SparkTestBase.tempDir("nanots-prop")
    us.toDF("us").select(col("us"), timestamp_micros(col("us")).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    val tbl = graft.storage.Tables.read(spark, dir, "t").cache()
    try {
      for (_ <- 0 until 40) {
        // ns literals biased to land near ×1000 residues 0, ±1
        val q = rnd.nextLong() % 2000000L
        val v = q * 1000L + (rnd.nextInt(5) match {
          case 0 => 0L
          case 1 => 1L
          case 2 => -1L
          case 3 => 999L
          case _ => rnd.nextInt(1999) - 999L
        })
        def got(f: org.apache.spark.sql.Column): Set[Long] =
          tbl.filter(f).select("us").collect().map(_.getLong(0)).toSet
        def exp(p: Long => Boolean): Set[Long] =
          us.filter(u => p(u * 1000L)).toSet
        assert(got(col("ts") >= v) == exp(_ >= v), s">= $v")
        assert(got(col("ts") > v) == exp(_ > v), s"> $v")
        assert(got(col("ts") <= v) == exp(_ <= v), s"<= $v")
        assert(got(col("ts") < v) == exp(_ < v), s"< $v")
        assert(got(col("ts") === v) == exp(_ == v), s"= $v")
        assert(got(lit(v) < col("ts")) == exp(_ > v), s"$v < ts")
        assert(got(lit(v) >= col("ts")) == exp(_ <= v), s"$v >= ts")
      }
    } finally tbl.unpersist()
  }
}
