package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale corpus pipelines: tokenization,
  * quality scoring, language-ID heuristic, fingerprinting. All built from
  * codegen'd `functions._` expressions — no UDFs in the hot path, so
  * whole-stage codegen keeps these inside the scan stage.
  */
object Text {

  /** Canonical tokenizer: lowercase, split on non-alphanumeric runs, drop
    * empties. Equivalent DuckDB expression (used by the oracle):
    * `list_filter(string_split_regex(lower(text),'[^a-z0-9]+'), x -> x <> '')`.
    */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= lit(""))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Distinct-token array (set semantics, original order dropped). */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** Word n-gram shingles of the token stream, joined by a single space:
    * the unit for Jaccard/MinHash near-dup detection. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val idxs = sequence(lit(0), greatest(size(toks) - n, lit(0)))
    // build "t[i] t[i+1] … t[i+n-1]" for i in 0 .. size-n
    array_distinct(
      filter(
        transform(idxs, i =>
          when(i + n <= size(toks),
            concat_ws(" ", slice(toks, i + 1, lit(n))))),
        s => s.isNotNull))
  }

  /** Quality-score features (length / punctuation / stopword / digit
    * ratios) — the standard cheap heuristics a pretraining pipeline filters
    * on. All ratios are exact integer/integer divisions, so an SQL oracle
    * reproduces them bit-for-bit.
    */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val nChars = length(t)
    val nTokens = tokenCount(t)
    val nPunct = nChars - length(regexp_replace(t, "[.,;:!?'\"()-]", ""))
    val nDigit = nChars - length(regexp_replace(t, "[0-9]", ""))
    val nWs = nChars - length(regexp_replace(t, " ", ""))
    val stop = array(StopwordsEn.map(lit): _*)
    val nStop = size(filter(tokens(t), w => array_contains(stop, w)))
    df.withColumn("n_chars_m", nChars.cast("long"))
      .withColumn("n_tokens", nTokens.cast("long"))
      .withColumn("punct_ratio",
        when(nChars > 0, nPunct.cast("double") / nChars).otherwise(lit(0.0)))
      .withColumn("digit_ratio",
        when(nChars > 0, nDigit.cast("double") / nChars).otherwise(lit(0.0)))
      .withColumn("ws_ratio",
        when(nChars > 0, nWs.cast("double") / nChars).otherwise(lit(0.0)))
      .withColumn("stopword_ratio",
        when(nTokens > 0, nStop.cast("double") / nTokens).otherwise(lit(0.0)))
      .withColumn("mean_token_len",
        when(nTokens > 0,
          aggregate(tokens(t), lit(0L), (acc, w) => acc + length(w))
            .cast("double") / nTokens).otherwise(lit(0.0)))
  }

  val StopwordsEn: Seq[String] = Seq("the", "a", "an", "and", "or", "of", "to",
    "in", "is", "it", "that", "for", "on", "with", "as", "was", "at", "by")
  val StopwordsDe: Seq[String] = Seq("der", "die", "das", "und", "oder", "von",
    "zu", "im", "ist", "es", "dass", "mit", "als", "war", "bei", "ein", "eine")
  val StopwordsEs: Seq[String] = Seq("el", "la", "los", "las", "y", "o", "de",
    "en", "es", "que", "por", "con", "como", "un", "una", "del", "se")
  val StopwordsFr: Seq[String] = Seq("le", "la", "les", "et", "ou", "de", "en",
    "est", "que", "pour", "avec", "comme", "un", "une", "du", "se", "au")

  /** Language-ID n-gram/stopword heuristic: per-language stopword hit counts
    * over the token stream; argmax with deterministic tie-break (language
    * code order). `und` when nothing matches. A real pipeline swaps in
    * fastText — the *shape* (scores struct + argmax) is the operator.
    */
  def langId(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    def score(words: Seq[String]): Column =
      size(filter(toks, w => array_contains(array(words.map(lit): _*), w)))
        .cast("long")
    // greatest-of-structs argmax: (score, langRank) — ranks inverted so ties
    // pick the alphabetically-first language
    val scored = df
      .withColumn("score_de", score(StopwordsDe))
      .withColumn("score_en", score(StopwordsEn))
      .withColumn("score_es", score(StopwordsEs))
      .withColumn("score_fr", score(StopwordsFr))
    val langs = Seq("de", "en", "es", "fr")
    val best = greatest(langs.zipWithIndex.map { case (l, i) =>
      struct(col(s"score_$l").as("s"), lit(langs.length - i).as("r"),
        lit(l).as("lang"))
    }: _*)
    scored.withColumn("lang_pred",
      when(best.getField("s") > 0, best.getField("lang")).otherwise(lit("und")))
  }

  /** Content fingerprint: md5 of the whitespace-normalized lowercase text —
    * canonical exact-dup key. (DuckDB has `md5`, so the oracle matches.) */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  /** Rolling-hash document fingerprint: min/max/xor folds over 64-bit hashes
    * of word shingles (winnowing-style content signature; robust to word
    * order at the edges). xxhash64 is Spark-native and seed-stable.
    */
  def shingleFingerprint(df: DataFrame, textCol: String, n: Int = 3): DataFrame = {
    val sh = shingles(col(textCol), n)
    val hashes = transform(sh, s => xxhash64(s))
    df.withColumn("fp_min", array_min(hashes))
      .withColumn("fp_max", array_max(hashes))
      .withColumn("fp_xor",
        aggregate(hashes, lit(0L), (acc, h) => acc.bitwiseXOR(h)))
  }
}
