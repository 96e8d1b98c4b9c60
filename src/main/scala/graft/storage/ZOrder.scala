package graft.storage

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustered parquet writes: multi-dimensional
  * row-group pruning from plain footer statistics.
  *
  * A time-sorted layout prunes `ts` ranges beautifully (every row group
  * spans a narrow ts interval) but is blind to every other column: a
  * `user_id` predicate still decodes the whole table because each row
  * group's user_id stats span the full domain. Interleaving the bits of
  * several columns' range-normalized codes into one sort key makes row
  * groups locally clustered in EVERY interleaved dimension at once, so
  * range predicates on ANY of them skip most row groups — the standard
  * multi-dim clustering trick (Delta/Iceberg `ZORDER BY`), here built from
  * nothing but `repartitionByRange` + `sortWithinPartitions` + parquet
  * footers. No reader-side change at all: Spark's ordinary PushedFilters
  * and row-group stats do the skipping.
  *
  * The z-value is computed with pure Column bit-arithmetic (shifts, and,
  * or) — codegen'd end to end, no UDF on the write path.
  */
object ZOrder {

  /** Per-column code: value scaled to EXACTLY `bits` wide by shifting
    * (v − min) down (wide domains, e.g. ns timestamps) or UP (narrow
    * domains, e.g. a few hundred user ids) — without the up-shift a
    * narrow column's high code bits are always zero, the other dimension
    * owns every significant interleaved bit, and the curve degenerates to
    * a single-column sort. Power-of-two scaling keeps the arithmetic
    * exact at any magnitude (no double division that would lose
    * ns-precision longs past 2^53), one codegen'd shift per row. */
  private def code(c: Column, min: Long, max: Long, bits: Int): Column = {
    val span = Math.max(max - min, 1L)
    val bitLen = 64 - java.lang.Long.numberOfLeadingZeros(span)
    val base = c.cast("long") - lit(min)
    if (bitLen >= bits) shiftright(base, bitLen - bits)
    else shiftleft(base, bits - bitLen)
  }

  /** Interleave `codes` round-robin from bit 0: result bit (b·n + i) is
    * bit b of code i. With n·bits ≤ 63 the z-value fits a long. */
  private def interleave(codes: Seq[Column], bits: Int): Column = {
    val n = codes.length
    val terms = for {
      b <- 0 until bits
      (c, i) <- codes.zipWithIndex
    } yield shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** The interleaved z-value column for `df` over `cols` (long-castable):
    * one tiny min/max agg drives the range normalization, then pure
    * codegen'd bit arithmetic per row. Shared by [[write]] and
    * [[WritableStore.compact]]'s clustered layout. Fails fast with a
    * clear message on an empty frame or an all-null column — the min/max
    * aggregates come back null there, and a bare `getLong` would NPE
    * with no context. */
  def zValue(df: DataFrame, cols: Seq[String], bits: Int = 16)
      : Column = {
    require(cols.nonEmpty && cols.length * bits <= 63,
      s"${cols.length} cols x $bits bits must fit a long")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("long"), max(col(c)).cast("long")))
    val mm = df.agg(aggs.head, aggs.tail: _*).head()
    val codes = cols.zipWithIndex.map { case (c, i) =>
      require(!mm.isNullAt(2 * i) && !mm.isNullAt(2 * i + 1),
        s"ZOrder: column '$c' has no non-null values " +
          "(empty frame or all-null column) — nothing to cluster")
      code(col(c), mm.getLong(2 * i), mm.getLong(2 * i + 1), bits)
    }
    interleave(codes, bits)
  }

  /** Write `df` z-ordered on `cols` (long-castable columns). One tiny
    * min/max agg drives the range normalization; rows are then
    * range-partitioned AND sorted by the interleaved key, so both file
    * boundaries and row-group boundaries within files follow the Morton
    * curve. `numFiles` controls output parallelism (each file's row
    * groups inherit the clustering regardless).
    */
  def write(df: DataFrame, path: String, cols: Seq[String],
      numFiles: Int = 8, bits: Int = 16): Unit =
    df.withColumn("__z", zValue(df, cols, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
