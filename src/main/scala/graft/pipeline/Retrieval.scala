package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval over the document corpus: BM25-shaped ranking through
  * the same inverted-index machinery as the dedup tier — the "find the
  * docs that answer this query" primitive a curation pipeline needs for
  * eval-set mining, targeted decontamination, and quality probes.
  */
object Retrieval {

  /** BM25-shaped top-k retrieval with engine-exact fixed-point scoring.
    *
    * Classic BM25 (k1 = 1.2, b = 0.75) except the idf: the log curve is
    * replaced by the RATIONAL surrogate
    * `idf_s = ⌊2²⁰·(N − df + 1) / (df + 1)⌋` — monotone in df like the
    * original, but computable in exact integer arithmetic, so scores are
    * bit-identical across engines (the same engine-exact trade the
    * fixed-point centroids and quantile-SAX make; a float `ln` would hash
    * differently across libm implementations). With dl the doc length,
    * avgdl = T/N (T = total tokens, N = docs), clearing denominators at
    * k1 = 6/5, b = 3/4 gives the per-term score
    *
    *   score_t = ⌊ idf_s · 22·T·tf  /  (10·T·tf + 3·T + 9·dl·N) ⌋
    *
    * — one integral division per (query, term, doc), summed per doc.
    * Intermediates ride decimal(38,0): at corpus scale idf_s·22·T·tf
    * reaches ~10³⁴, far past long; `div` (IntegralDivide) on decimals
    * emits the long quotient exactly.
    *
    * Scale shape: tf/dl/df are combinable aggs over one tokenize pass;
    * the query side is tiny and broadcast onto the term-partitioned
    * inverted index, so candidate volume is Σ_t df(t) over query terms —
    * `maxDf` caps it by dropping stopword-grade terms (BM25 weights them
    * near zero anyway), the same hot-key cap as the jaccard tier. The
    * final top-k is a per-query window over candidates, never a global
    * sort.
    */
  def bm25(docs: DataFrame, queries: DataFrame, topK: Int = 10,
      maxDf: Long = Long.MaxValue, idCol: String = "doc_id",
      textCol: String = "text", qidCol: String = "query_id",
      qtextCol: String = "qtext"): DataFrame = {
    val exact = termScores(docs, queries, maxDf, idCol, textCol, qidCol,
      qtextCol)
    val agg = exact.groupBy(col(qidCol), col(idCol))
      .agg(sum("__sc").as("score"), count(lit(1)).as("n_terms"))
    val w = Window.partitionBy(qidCol)
      .orderBy(col("score").desc, col(idCol).asc)
    agg.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
  }

  /** Shared stateless scoring core: one row per (query, matched term, doc)
    * with the exact per-term score in `__sc`. The query side may be a
    * STREAMING frame — every step on it is stateless (per-row
    * `array_distinct` replaces a cross-row distinct; the corpus N/T
    * scalars fold to plan-time literals; every join is stream-static
    * against the batch-built index), which is what makes the live serving
    * twin a pure pass-through. */
  private[pipeline] def termScores(docs: DataFrame, queries: DataFrame,
      maxDf: Long, idCol: String, textCol: String, qidCol: String,
      qtextCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(Text.tokens(col(textCol))).as("tok"))
    val tf = toks.groupBy(idCol, "tok").agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy(idCol).agg(count(lit(1)).as("dl"))
    val statsRow = dl.agg(count(lit(1)).as("n"), sum("dl").as("t")).head()
    val (n, t) = (statsRow.getLong(0), statsRow.getLong(1))
    val dfs = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    // per-row array_distinct, NOT .distinct(): identical term set (one row
    // per query), and it keeps a streaming query side stateless
    val qterms = queries.select(col(qidCol),
      explode(array_distinct(Text.tokens(col(qtextCol)))).as("tok"))
    val big = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    qterms
      .join(dfs, "tok")
      .join(tf, "tok")
      .join(dl, idCol)
      // idf_s fits long (2^20·N); the num/den products need decimal(38,0)
      .withColumn("__idf",
        expr(s"(1048576 * (${n}L - df + 1)) div (df + 1)"))
      .withColumn("__num",
        big(col("__idf")) * lit(22) * big(lit(t)) * big(col("tf")))
      .withColumn("__den",
        big(lit(10)) * big(lit(t)) * big(col("tf")) +
          big(lit(3)) * big(lit(t)) + big(lit(9)) * big(col("dl")) * big(lit(n)))
      .withColumn("__sc", expr("__num div __den"))
  }

  /** Live retrieval: a STREAM of queries scored against the batch-built
    * index — the serving twin of [[bm25]]. The streaming side is entirely
    * stateless (see [[termScores]]), so each micro-batch emits its
    * (query, doc, term-score) rows immediately; the per-query top-k
    * aggregation runs batch-side on the drained sink (rank is not
    * streamable in append mode, and serving reads want the raw scored
    * candidates anyway). A drained stream rolled up this way equals
    * [[bm25]] exactly — the driver oracle pins it.
    *
    * Scale shape: the index frames (tf/dl/df) are the static side of
    * stream-static joins — build them once, persist or store them as
    * tables, and each arriving query costs Σ_t df(t) joined rows, exactly
    * the batch candidate volume per query.
    */
  def streamingBm25(queryStream: DataFrame, docs: DataFrame,
      maxDf: Long = Long.MaxValue, idCol: String = "doc_id",
      textCol: String = "text", qidCol: String = "query_id",
      qtextCol: String = "qtext"): DataFrame =
    termScores(docs, queryStream, maxDf, idCol, textCol, qidCol, qtextCol)
      .select(col(qidCol), col(idCol), col("tok"), col("__sc").as("term_score"))
}
