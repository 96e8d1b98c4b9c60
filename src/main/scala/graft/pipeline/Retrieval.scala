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
    val toks = docs.select(col(idCol),
      explode(Text.tokens(col(textCol))).as("tok"))
    val tf = toks.groupBy(idCol, "tok").agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy(idCol).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n"), sum("dl").as("t"))
    val dfs = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    val qterms = queries
      .select(col(qidCol), explode(Text.tokens(col(qtextCol))).as("tok"))
      .distinct()
    val big = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val exact = qterms
      .join(dfs, "tok")
      .join(tf, "tok")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      // idf_s fits long (2^20·N); the num/den products need decimal(38,0)
      .withColumn("__idf",
        expr("(1048576 * (n - df + 1)) div (df + 1)"))
      .withColumn("__num",
        big(col("__idf")) * lit(22) * big(col("t")) * big(col("tf")))
      .withColumn("__den",
        big(lit(10)) * big(col("t")) * big(col("tf")) +
          big(lit(3)) * big(col("t")) + big(lit(9)) * big(col("dl")) * big(col("n")))
      .withColumn("__sc", expr("__num div __den"))
    val agg = exact.groupBy(col(qidCol), col(idCol))
      .agg(sum("__sc").as("score"), count(lit(1)).as("n_terms"))
    val w = Window.partitionBy(qidCol)
      .orderBy(col("score").desc, col(idCol).asc)
    agg.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
  }
}
