package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Time-series operators over frames carrying `ts` as epoch-nano LongType.
  *
  * Scale notes (100 TB target):
  *  - the range filter is a plain comparison on a long column → Catalyst
  *    pushes it into the Parquet scan (row-group min/max skipping replaces the
  *    reference's sorted-block binary search,
  *    `zikeiretsu/src/tsdb/storage/block_list/mod.rs:254-328`);
  *  - the grouped limit avoids a global single-partition window: it computes
  *    the n-th distinct timestamp with a TakeOrderedAndProject (distributed
  *    top-n, no full sort) and re-filters — two scans, both
  *    filter-pushdown-friendly, no stage is single-threaded.
  */
object TsOps {

  /** `[since, until)` — the reference's only WHERE predicate
    * (`time_series_dataframe.rs:355-385`): since inclusive, until exclusive,
    * duplicate timestamps preserved.
    */
  def rangeFilter(df: DataFrame, since: Option[Long], until: Option[Long],
      tsCol: String = "ts"): DataFrame = {
    val conds: Seq[Column] =
      since.map(s => col(tsCol) >= lit(s)).toSeq ++
        until.map(u => col(tsCol) < lit(u)).toSeq
    conds.reduceOption(_ && _).fold(df)(df.filter)
  }

  /** Tie-preserving head limit: keep all rows whose `ts` is among the `n`
    * smallest **distinct** timestamps — rows sharing the n-th timestamp all
    * survive (`time_series_dataframe.rs:105-153`).
    *
    * Implemented threshold-first: distinct → top-n (TakeOrderedAndProject) →
    * `ts <= threshold` filter, so no global one-partition window at scale.
    */
  def groupedHead(df: DataFrame, n: Int, tsCol: String = "ts"): DataFrame = {
    if (n <= 0) return df.limit(0)
    val nth = df.select(col(tsCol)).distinct()
      .orderBy(col(tsCol).asc).limit(n)
      .agg(max(tsCol)).collect()(0)
    if (nth.isNullAt(0)) df.limit(0)
    else df.filter(col(tsCol) <= lit(nth.getLong(0)))
  }

  /** Tie-preserving tail limit: rows within the `n` largest distinct
    * timestamps. */
  def groupedTail(df: DataFrame, n: Int, tsCol: String = "ts"): DataFrame = {
    if (n <= 0) return df.limit(0)
    val nth = df.select(col(tsCol)).distinct()
      .orderBy(col(tsCol).desc).limit(n)
      .agg(min(tsCol)).collect()(0)
    if (nth.isNullAt(0)) df.limit(0)
    else df.filter(col(tsCol) >= lit(nth.getLong(0)))
  }

  /** Window-based variant of the grouped limit (single-node semantics
    * reference; used to cross-check `groupedHead`/`groupedTail` in tests).
    * The empty `partitionBy` makes it a one-partition plan — do not use at
    * scale. */
  def groupedLimitWindow(df: DataFrame, n: Int, head: Boolean,
      tsCol: String = "ts"): DataFrame = {
    val w =
      if (head) Window.orderBy(col(tsCol).asc)
      else Window.orderBy(col(tsCol).desc)
    df.withColumn("__rk", dense_rank().over(w))
      .filter(col("__rk") <= n).drop("__rk")
  }

  /** Downsample into fixed `bucketNanos` buckets with standard aggregates —
    * the canonical TSDB rollup (beyond the reference surface, which has no
    * aggregation; map-side partial aggregation makes this one shuffle of
    * (bucket × groupCols) cardinality).
    */
  def downsample(df: DataFrame, bucketNanos: Long, valueCol: String,
      groupCols: Seq[String] = Nil, tsCol: String = "ts"): DataFrame = {
    val bucket = (floor(col(tsCol) / lit(bucketNanos)) * lit(bucketNanos))
      .cast("long").as("bucket_ts")
    df.groupBy(bucket +: groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        min(valueCol).as("min_v"),
        max(valueCol).as("max_v"),
        sum(valueCol).as("sum_v"))
  }

  /** As-of join: for each left row, the latest right row with
    * `right.ts <= left.ts` (within `toleranceNanos` if >= 0), per matching
    * `keyCols`. Composed from a union + running last_value window — one
    * shuffle on (key), no custom physical operator needed.
    *
    * right columns are emitted with `rightPrefix`.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      toleranceNanos: Long = -1L, tsCol: String = "ts",
      rightPrefix: String = "r_"): DataFrame = {
    val rightVals = right.columns.filterNot(c => c == tsCol || keyCols.contains(c))
    // tag and union; sort within (key) by (ts, side) so right rows precede
    // left rows at equal ts — last_value then gives "latest right <= left.ts"
    val l = left.withColumn("__side", lit(1))
    var r = right.withColumn("__side", lit(0))
    for (c <- left.columns if !right.columns.contains(c)) r = r.withColumn(c, lit(null))
    var l2 = l
    for (c <- rightVals) l2 = l2.withColumn(c, lit(null))
    val unioned = l2.select((left.columns :+ "__side") ++ rightVals map col: _*)
      .unionByName(r.select((left.columns :+ "__side") ++ rightVals map col: _*))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val withLast = unioned
      .withColumn("__r_ts",
        last(when(col("__side") === 0, col(tsCol)), ignoreNulls = true).over(w))
    val joined = rightVals.foldLeft(withLast) { (d, c) =>
      d.withColumn(rightPrefix + c,
        last(when(col("__side") === 0, col(c)), ignoreNulls = true).over(w))
    }
    val tolOk =
      if (toleranceNanos >= 0)
        col("__r_ts").isNotNull && (col(tsCol) - col("__r_ts")) <= toleranceNanos
      else lit(true)
    val cleaned = joined.filter(col("__side") === 1)
      .withColumn("__keep", tolOk)
    val out = rightVals.foldLeft(
      cleaned.withColumn(rightPrefix + tsCol,
        when(col("__keep"), col("__r_ts")))) { (d, c) =>
      d.withColumn(rightPrefix + c, when(col("__keep"), col(rightPrefix + c)))
    }
    out.select(left.columns.map(col) ++
      (tsCol +: rightVals.toSeq).map(c => col(rightPrefix + c)): _*)
  }
}
