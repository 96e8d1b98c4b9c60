package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Composed corpus-curation pipeline — the end-to-end shape of a
  * training-data preparation job, chaining the individual operators:
  *
  *   quality features → keep-band filter → language ID →
  *   exact dedup (keep min id) → near-dup removal (drop the larger id of
  *   each >= threshold shingle-Jaccard pair) → curated corpus.
  *
  * Every stage is one of the verified operators; the composition stays
  * shuffle-minimal: features/langid ride the scan, exact dedup is one
  * keyed shuffle, near-dup pairs come from the inverted-index join.
  */
object Pipelines {

  def curate(df: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 20, maxTokens: Int = 70,
      nearDupThreshold: Double = 0.3, shingleSize: Int = 3,
      maxShingleDf: Int = Dedup.DefaultMaxShingleDf,
      materialize: Boolean = false): DataFrame = {
    val feats = Text.langId(Text.qualityFeatures(df, textCol), textCol)
    val kept = feats.filter(col("n_tokens").between(minTokens, maxTokens))
    // exact dedup: keep the smallest id per normalized fingerprint
    val reps = kept.withColumn("__fp", Text.fingerprint(col(textCol)))
    val keepIds = reps.groupBy("__fp").agg(min(idCol).as(idCol))
      .select(idCol)
    val exactKept0 = reps.join(keepIds, Seq(idCol), "left_semi").drop("__fp")
    // the survivor set fans out into a diamond (inverted-index branches +
    // the final anti-join). `materialize` checkpoints it once so the
    // feature/langid/dedup chain doesn't recompute per branch — measured
    // neutral at bench scale (Spark's exchange reuse already dedups the
    // heavy subtrees), so the pure-lineage plan is the default; flip it on
    // clusters where re-scanning the corpus per branch dominates.
    val exactKept =
      if (materialize) exactKept0.localCheckpoint(false) else exactKept0
    // near-dup removal among survivors: drop the larger id of each pair
    val dropIds = Dedup.jaccardPairs(exactKept, idCol, textCol,
        nearDupThreshold, shingleSize, maxShingleDf)
      .select(col("id2").as(idCol)).distinct()
    exactKept.join(dropIds, Seq(idCol), "left_anti")
  }
}
