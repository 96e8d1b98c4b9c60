package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation utilities.
  *
  * First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`,
  * on by default) which splits oversized sort-merge partitions at runtime —
  * the engine's sessions keep it enabled. These helpers cover the cases AQE
  * does not: broadcast-ineligible dimension joins against a heavy-hitter
  * fact key, and non-partial aggregations.
  */
object Skew {

  /** Salted inner equi-join: the (possibly skewed) `big` side gets a
    * per-row salt in `[0, saltN)`; the `small` side is replicated `saltN`
    * times; the join key becomes (key, salt) so one hot key spreads over
    * `saltN` reducers. Correctness is salt-invariant — any per-row salt
    * works; `rand(seed)` keeps the run reproducible.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keyCols: Seq[String],
      saltN: Int = 16, seed: Long = 42L): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      (rand(seed) * saltN).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltN - 1))))
    saltedBig.join(replicatedSmall, keyCols :+ "__salt").drop("__salt")
  }

  /** Two-phase aggregation for aggregates without map-side partials
    * (exact distinct counts per key): phase 1 de-dups on
    * (key, value-hash-salt buckets), phase 2 merges counts per key.
    * `countDistinct` over a hot key otherwise funnels into one reducer.
    */
  def skewedDistinctCount(df: DataFrame, keyCols: Seq[String],
      valueCol: String, buckets: Int = 64): DataFrame = {
    val bucketed = df
      .withColumn("__b", pmod(xxhash64(col(valueCol)), lit(buckets)))
      .select((keyCols :+ "__b" :+ valueCol).map(col): _*)
      .distinct() // shuffle keyed on (key, bucket, value) — spread
      .groupBy((keyCols :+ "__b").map(col): _*)
      .agg(count(lit(1)).as("__c")) // per-bucket distinct counts
    bucketed.groupBy(keyCols.map(col): _*)
      .agg(sum("__c").as(s"${valueCol}_distinct"))
  }
}
