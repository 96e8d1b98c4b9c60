package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.model.TimeNano
import graft.operators.TsOps
import graft.pipeline.{Dedup, Multimodal, Similarity, Text}
import graft.ql.Engine
import graft.storage.Tables
import graft.EntryFixtures._
import graft.EntryOracleParts._

/** DuckDB oracle SQL for [[EntryPipeline]], second half. */
private[graft] object EntryPipelineOracles2 {
  val oracles: Map[String, String] = Map(
    "embed_quantize" ->
      """WITH c AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |), m AS (
        |  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS ma
        |  FROM c
        |)
        |SELECT vec_id,
        |  array_to_string(
        |    CASE WHEN ma = 0 THEN list_transform(v, x -> CAST(0 AS TINYINT))
        |         ELSE list_transform(v, x -> CAST(greatest(-127.0,
        |           least(127.0, floor(x * 127.0 / ma + 0.5))) AS TINYINT)) END,
        |    ',') AS q,
        |  ma AS max_abs
        |FROM m ORDER BY vec_id""".stripMargin,
    "knn_quantized" ->
      """WITH c AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |), m AS (
        |  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS ma
        |  FROM c
        |), qz AS (
        |  SELECT vec_id,
        |    CASE WHEN ma = 0 THEN list_transform(v, x -> CAST(0 AS DOUBLE))
        |         ELSE list_transform(v, x -> CAST(greatest(-127.0,
        |           least(127.0, floor(x * 127.0 / ma + 0.5))) AS DOUBLE)) END AS q
        |  FROM m
        |), qs AS (
        |  SELECT vec_id AS qid, q AS qq FROM qz WHERE vec_id < 10
        |), sc AS (
        |  SELECT qs.qid, qz.vec_id,
        |    list_dot_product(qs.qq, qz.q) /
        |      (sqrt(list_dot_product(qs.qq, qs.qq)) *
        |       sqrt(list_dot_product(qz.q, qz.q))) AS cos
        |  FROM qs CROSS JOIN qz WHERE qs.qid <> qz.vec_id
        |), r AS (
        |  SELECT qid, vec_id, cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC)
        |      AS rank
        |  FROM sc
        |)
        |SELECT qid, rank, vec_id, round(cos, 6) AS cos FROM r
        |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,
    "text_nfc" ->
      """SELECT doc_id, nfc_normalize(text) AS nfc_text,
        |  CAST(nfc_normalize(text || 'e' || chr(769)) =
        |       nfc_normalize(text) || chr(233) AS BIGINT) AS composed_ok
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the emitted subset of the streaming as-of join is the batch ASOF
    // LEFT JOIN over purchases whose event-time ms is strictly below the
    // final watermark (max event ms - 10 min lateness)
    "stream_asof" ->
      """WITH l AS (
        |  SELECT event_id, user_id, epoch_ns(ts) AS ts, value
        |  FROM events WHERE event_type = 'purchase'
        |), r AS (
        |  SELECT user_id, epoch_ns(ts) AS ts, value
        |  FROM events WHERE event_type = 'view'
        |), j AS (
        |  SELECT l.event_id, l.user_id, l.ts, l.value,
        |         r.ts AS r_ts, r.value AS r_value
        |  FROM l ASOF LEFT JOIN r
        |    ON l.user_id = r.user_id AND l.ts >= r.ts
        |), mx AS (SELECT max(epoch_ns(ts)) AS m FROM events
        |          WHERE event_type IN ('purchase', 'view'))
        |SELECT event_id, user_id, ts, value, r_ts, r_value FROM j, mx
        |WHERE ts // 1000000 < m // 1000000 - 600000
        |ORDER BY event_id""".stripMargin,
    // streaming dedup emits one arbitrary row per fingerprint — the
    // deterministic fact is the fingerprint SET, = batch distinct
    "stream_dedup" ->
      """SELECT DISTINCT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
        |FROM documents ORDER BY fp""".stripMargin,
    "dedup_simhash" -> {
      // 60-bit md5 token hashes: per-bit sign-sums, assemble bits 0-59
      // (bits 60-63 sign-sum to -n → 0), all-pairs hamming <= 3. Matches
      // the pigeonhole candidate generator exactly BECAUSE its recall is
      // complete — the oracle is the proof.
      val bitSum = (0 until 60).map(b =>
        s"(CASE WHEN sum(CASE WHEN (hv >> $b) & 1 = 1 THEN 1 ELSE -1 END)" +
          s" > 0 THEN (1::BIGINT << $b) ELSE 0::BIGINT END)")
        .mkString(" + ")
      s"""WITH e AS (
         |  SELECT doc_id,
         |    ('0x' || substr(md5(unnest($DuckToks)), 1, 15))::BIGINT AS hv
         |  FROM documents
         |), s AS (
         |  SELECT doc_id, $bitSum AS simhash FROM e GROUP BY doc_id
         |), p AS (
         |  SELECT a.doc_id AS id1, b.doc_id AS id2,
         |         a.simhash AS sh1, b.simhash AS sh2,
         |         bit_count(xor(a.simhash, b.simhash)) AS hamming
         |  FROM s a JOIN s b ON a.doc_id < b.doc_id
         |)
         |SELECT id1, id2, sh1, sh2, hamming FROM p
         |WHERE hamming <= 3 ORDER BY id1, id2""".stripMargin
    },
    "text_chunks" -> {
      val (size, overlap) = (32, 8); val step = size - overlap
      s"""WITH t AS (
         |  SELECT doc_id, $DuckToks AS toks FROM documents
         |), m AS (
         |  SELECT doc_id, toks, len(toks) AS n,
         |    CASE WHEN len(toks) = 0 THEN 0
         |         ELSE greatest(1, (len(toks) - $overlap + $step - 1) // $step)
         |    END AS nc
         |  FROM t
         |)
         |SELECT doc_id, i AS chunk_idx,
         |  CAST(least($size, n - i * $step) AS BIGINT) AS n_chunk_tokens,
         |  array_to_string(toks[i * $step + 1 : i * $step + $size], ' ')
         |    AS chunk_text
         |FROM m CROSS JOIN (
         |  SELECT unnest(generate_series(0, 999)) AS i
         |) g
         |WHERE g.i < m.nc
         |ORDER BY doc_id, chunk_idx""".stripMargin
    },
    "sample_split" ->
      """SELECT split, count(*) AS n FROM (
        |  SELECT CASE
        |    WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |         % 100 < 90 THEN 'train'
        |    WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |         % 100 < 95 THEN 'valid'
        |    ELSE 'test'
        |  END AS split FROM documents
        |) GROUP BY split ORDER BY split""".stripMargin,
    "train_shuffle_shards" ->
      """WITH k AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':7'), 1, 15))
        |      ::BIGINT AS key
        |  FROM documents
        |)
        |SELECT doc_id, key % 16 AS shard,
        |  CAST(row_number() OVER (PARTITION BY key % 16
        |    ORDER BY key, doc_id) - 1 AS BIGINT) AS pos
        |FROM k
        |ORDER BY shard, pos""".stripMargin,
    "profile_documents" ->
      """WITH a AS (
        |  SELECT count(*) AS n,
        |    sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS id_nu,
        |    count(DISTINCT doc_id) AS id_nd,
        |    CAST(min(doc_id) AS VARCHAR) AS id_mn,
        |    CAST(max(doc_id) AS VARCHAR) AS id_mx,
        |    sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS tx_nu,
        |    count(DISTINCT text) AS tx_nd,
        |    min(text) AS tx_mn, max(text) AS tx_mx,
        |    sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS lg_nu,
        |    count(DISTINCT lang) AS lg_nd,
        |    min(lang) AS lg_mn, max(lang) AS lg_mx,
        |    sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS sc_nu,
        |    count(DISTINCT source) AS sc_nd,
        |    min(source) AS sc_mn, max(source) AS sc_mx,
        |    sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS nc_nu,
        |    count(DISTINCT n_chars) AS nc_nd,
        |    CAST(min(n_chars) AS VARCHAR) AS nc_mn,
        |    CAST(max(n_chars) AS VARCHAR) AS nc_mx
        |  FROM documents
        |)
        |SELECT 'doc_id' AS col_name, CAST(n AS BIGINT) AS n,
        |  CAST(id_nu AS BIGINT) AS n_nulls, CAST(id_nd AS BIGINT)
        |    AS n_distinct, id_mn AS min_s, id_mx AS max_s FROM a
        |UNION ALL SELECT 'text', CAST(n AS BIGINT), CAST(tx_nu AS BIGINT),
        |  CAST(tx_nd AS BIGINT), tx_mn, tx_mx FROM a
        |UNION ALL SELECT 'lang', CAST(n AS BIGINT), CAST(lg_nu AS BIGINT),
        |  CAST(lg_nd AS BIGINT), lg_mn, lg_mx FROM a
        |UNION ALL SELECT 'source', CAST(n AS BIGINT), CAST(sc_nu AS BIGINT),
        |  CAST(sc_nd AS BIGINT), sc_mn, sc_mx FROM a
        |UNION ALL SELECT 'n_chars', CAST(n AS BIGINT), CAST(nc_nu AS BIGINT),
        |  CAST(nc_nd AS BIGINT), nc_mn, nc_mx FROM a
        |ORDER BY col_name""".stripMargin,
    // single-window definition of the mixture sample — the Spark side
    // computes the same cumulative sums through the bucketed prefix sum
    "mix_sample" ->
      s"""WITH d AS (
         |  SELECT doc_id, lang,
         |         CAST(len($DuckToks) AS BIGINT) AS n_tokens,
         |         md5(CAST(doc_id AS VARCHAR)) AS key
         |  FROM documents
         |), c AS (
         |  SELECT doc_id, lang, n_tokens,
         |         CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY key, doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |           AS BIGINT) AS cum_tokens,
         |         CASE lang WHEN 'en' THEN 4000 WHEN 'de' THEN 1000
         |                   WHEN 'es' THEN 1000 WHEN 'fr' THEN 800
         |                   ELSE 0 END AS b
         |  FROM d
         |)
         |SELECT doc_id, lang, n_tokens, cum_tokens
         |FROM c WHERE b > 0 AND cum_tokens <= b
         |ORDER BY doc_id""".stripMargin,
    "mix_importance" ->
      s"""WITH b AS (
         |  SELECT doc_id,
         |    ('0x' || substr(md5(tok), 1, 15))::BIGINT % 256 AS bkt
         |  FROM (SELECT doc_id, unnest($DuckToks) AS tok FROM documents)
         |), raw AS (
         |  SELECT bkt, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY bkt
         |), nr AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM raw),
         |tgt AS (
         |  SELECT bkt, CAST(count(*) AS BIGINT) AS tc
         |  FROM b JOIN documents USING (doc_id)
         |  WHERE lang = 'en' GROUP BY bkt
         |), nt AS (SELECT CAST(sum(tc) AS BIGINT) AS n FROM tgt),
         |w AS (
         |  SELECT r.bkt,
         |    (1048576::HUGEINT * (coalesce(t.tc, 0) + 1)
         |       * (SELECT n FROM nr))
         |      // ((r.c + 1)::HUGEINT * (SELECT n FROM nt)) AS w
         |  FROM raw r LEFT JOIN tgt t USING (bkt)
         |), doc AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
         |    CAST(sum(w) // count(*) AS BIGINT) AS weight
         |  FROM b JOIN w USING (bkt) GROUP BY doc_id
         |)
         |SELECT doc_id, n_toks, weight,
         |  CAST(CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
         |      1, 15))::BIGINT % 1048576 < weight
         |    THEN 1 ELSE 0 END AS BIGINT) AS kept
         |FROM doc ORDER BY doc_id""".stripMargin,
    // the sqrt-weight derivation mirrored in SQL: integer weights →
    // integer share division → the same single-window fill as mix_sample
    "mix_temperature" ->
      s"""WITH d AS (
         |  SELECT doc_id, lang,
         |         CAST(len($DuckToks) AS BIGINT) AS n_tokens,
         |         md5(CAST(doc_id AS VARCHAR)) AS key
         |  FROM documents
         |), t AS (
         |  SELECT lang,
         |    CAST(floor(sqrt(CAST(sum(n_tokens) AS DOUBLE))) AS BIGINT) AS w
         |  FROM d GROUP BY lang
         |), b AS (
         |  SELECT lang,
         |    CAST(6000 * w // (SELECT CAST(sum(w) AS BIGINT) FROM t)
         |      AS BIGINT) AS b
         |  FROM t
         |), c AS (
         |  SELECT doc_id, lang, n_tokens,
         |         CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY key, doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |           AS BIGINT) AS cum_tokens
         |  FROM d
         |)
         |SELECT c.doc_id, c.lang, c.n_tokens, c.cum_tokens
         |FROM c JOIN b USING (lang)
         |WHERE b.b > 0 AND c.cum_tokens <= b.b
         |ORDER BY doc_id""".stripMargin,
    // single-window mirror of the epoch-repeat plan: per-domain totals,
    // full epochs by integer division, remainder filled in md5 order
    "mix_epochs" ->
      s"""WITH $DuckEpochPlanCtes
         |SELECT doc_id, lang, n_tokens, cum_tokens, full_epochs,
         |  CAST(full_epochs + CASE WHEN cum_tokens <= rem THEN 1 ELSE 0 END
         |    AS BIGINT) AS repeats
         |FROM c ORDER BY doc_id""".stripMargin,
    // mix_epochs' repeats exploded to (doc, epoch) occurrences with the
    // per-epoch reshuffle key
    "mix_schedule" ->
      s"""WITH $DuckEpochPlanCtes, r AS (
         |  SELECT doc_id, lang, n_tokens,
         |    CAST(full_epochs + CASE WHEN cum_tokens <= rem THEN 1 ELSE 0 END
         |      AS BIGINT) AS repeats
         |  FROM c
         |)
         |SELECT doc_id, lang, n_tokens,
         |  CAST(unnest(generate_series(1, repeats)) AS BIGINT) AS epoch,
         |  md5(CAST(doc_id AS VARCHAR) || ':' ||
         |      CAST(unnest(generate_series(1, repeats)) AS VARCHAR))
         |    AS order_key
         |FROM r WHERE repeats > 0
         |ORDER BY doc_id, epoch""".stripMargin,
    "sample_stratified" ->
      """SELECT doc_id, lang, rank FROM (
        |  SELECT doc_id, lang,
        |         row_number() OVER (PARTITION BY lang
        |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rank
        |  FROM documents
        |) WHERE rank <= 10 ORDER BY doc_id""".stripMargin,
    // exact distinct counts are the oracle-checked values; the sketch-
    // accuracy and merge gates are pinned to 1 (see the gate comment above
    // the recall oracles)
    "corpus_diff" ->
      """WITH d AS (
        |  SELECT lang, doc_id,
        |    md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
        |  FROM documents
        |), o AS (
        |  SELECT DISTINCT lang, fp, 1 AS in_o FROM d WHERE doc_id % 2 = 0
        |), n AS (
        |  SELECT DISTINCT lang, fp, 1 AS in_n FROM d WHERE doc_id % 3 <> 0
        |), j AS (
        |  SELECT lang, in_o, in_n FROM o FULL OUTER JOIN n USING (lang, fp)
        |)
        |SELECT lang,
        |  CAST(sum(CASE WHEN in_o IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_added,
        |  CAST(sum(CASE WHEN in_n IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_removed,
        |  CAST(sum(CASE WHEN in_o IS NOT NULL AND in_n IS NOT NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM j GROUP BY lang ORDER BY lang""".stripMargin,
    "quantile_sketch" ->
      s"""SELECT lang, count(*) AS n_docs,
         |  quantile_cont(len($DuckToks), 0.5) AS p_exact,
         |  CAST(1 AS BIGINT) AS est_ok
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "approx_distinct_tokens" ->
      s"""SELECT lang, CAST(count(DISTINCT tok) AS BIGINT) AS n_exact,
         |       CAST(1 AS BIGINT) AS est_ok
         |FROM (SELECT lang, unnest($DuckToks) AS tok FROM documents)
         |GROUP BY lang
         |UNION ALL
         |SELECT '*', CAST(count(DISTINCT tok) AS BIGINT),
         |       CAST(1 AS BIGINT)
         |FROM (SELECT unnest($DuckToks) AS tok FROM documents)
         |ORDER BY lang""".stripMargin,
    "text_quality" ->
      s"""SELECT doc_id,
         |  length(text) AS n_chars_m,
         |  len($DuckToks) AS n_tokens,
         |  CASE WHEN length(text) > 0 THEN
         |    CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()-]', '', 'g')) AS DOUBLE) / length(text)
         |  ELSE 0.0 END AS punct_ratio,
         |  CASE WHEN length(text) > 0 THEN
         |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / length(text)
         |  ELSE 0.0 END AS digit_ratio,
         |  CASE WHEN length(text) > 0 THEN
         |    CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE) / length(text)
         |  ELSE 0.0 END AS ws_ratio,
         |  CASE WHEN len($DuckToks) > 0 THEN
         |    CAST(len(list_filter($DuckToks,
         |      x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','was','at','by'], x))) AS DOUBLE)
         |      / len($DuckToks)
         |  ELSE 0.0 END AS stopword_ratio,
         |  CASE WHEN len($DuckToks) > 0 THEN
         |    CAST(list_sum(list_transform($DuckToks, x -> length(x))) AS DOUBLE)
         |      / len($DuckToks)
         |  ELSE 0.0 END AS mean_token_len
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_langid" -> {
      def score(words: Seq[String]): String =
        s"CAST(len(list_filter($DuckToks, x -> list_contains([" +
          words.map(w => s"'$w'").mkString(",") + s"], x))) AS BIGINT)"
      s"""WITH s AS (
         |  SELECT doc_id,
         |    ${score(Text.StopwordsDe)} AS score_de,
         |    ${score(Text.StopwordsEn)} AS score_en,
         |    ${score(Text.StopwordsEs)} AS score_es,
         |    ${score(Text.StopwordsFr)} AS score_fr
         |  FROM documents
         |)
         |SELECT doc_id, score_de, score_en, score_es, score_fr,
         |  CASE
         |    WHEN score_de >= score_en AND score_de >= score_es AND score_de >= score_fr AND score_de > 0 THEN 'de'
         |    WHEN score_en >= score_es AND score_en >= score_fr AND score_en > 0 THEN 'en'
         |    WHEN score_es >= score_fr AND score_es > 0 THEN 'es'
         |    WHEN score_fr > 0 THEN 'fr'
         |    ELSE 'und'
         |  END AS lang_pred
         |FROM s ORDER BY doc_id""".stripMargin
    },
    "text_lang_confusion" ->
      s"""WITH s AS (
         |  SELECT lang,
         |    ${langScoreSql(Text.StopwordsDe)} AS s_de,
         |    ${langScoreSql(Text.StopwordsEn)} AS s_en,
         |    ${langScoreSql(Text.StopwordsEs)} AS s_es,
         |    ${langScoreSql(Text.StopwordsFr)} AS s_fr
         |  FROM documents
         |), p AS (
         |  SELECT lang AS lang_true, $langCaseSql AS lang_pred FROM s
         |)
         |SELECT lang_true, lang_pred, count(*) AS n
         |FROM p GROUP BY lang_true, lang_pred
         |ORDER BY lang_true, lang_pred""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        |  md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_length_quantiles" ->
      s"""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  quantile_cont(len($DuckToks), 0.25) AS p25,
         |  quantile_cont(len($DuckToks), 0.5) AS p50,
         |  quantile_cont(len($DuckToks), 0.75) AS p75
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // mirrors Text.packSequences: per-bucket running token offset ordered
    // by id, integer-divided into context windows
    "text_pack" ->
      s"""WITH t AS (
         |  SELECT doc_id, doc_id % 8 AS bucket,
         |    CAST(len($DuckToks) AS BIGINT) AS n_tokens
         |  FROM documents
         |), o AS (
         |  SELECT doc_id, bucket, n_tokens,
         |    CAST(coalesce(sum(n_tokens) OVER (
         |      PARTITION BY bucket ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS "offset"
         |  FROM t
         |)
         |SELECT doc_id, bucket, n_tokens, "offset",
         |  "offset" // 256 AS pack_first,
         |  CASE WHEN n_tokens > 0 THEN ("offset" + n_tokens - 1) // 256
         |       ELSE "offset" // 256 END AS pack_last
         |FROM o ORDER BY doc_id""".stripMargin,
    "text_length_filter" ->
      s"""WITH tk AS (
         |  SELECT doc_id, lang, CAST(len($DuckToks) AS BIGINT) AS n_tokens
         |  FROM documents
         |), b AS (
         |  SELECT lang, quantile_cont(n_tokens, 0.125) AS p_lo,
         |         quantile_cont(n_tokens, 0.875) AS p_hi
         |  FROM tk GROUP BY lang
         |)
         |SELECT doc_id, tk.lang, n_tokens, p_lo, p_hi
         |FROM tk JOIN b USING (lang)
         |WHERE n_tokens >= p_lo AND n_tokens <= p_hi
         |ORDER BY doc_id""".stripMargin,
    "text_pack_manifest" ->
      s"""WITH t AS (
         |  SELECT doc_id, doc_id % 8 AS bucket,
         |    CAST(len($DuckToks) AS BIGINT) AS n_tokens
         |  FROM documents
         |), o AS (
         |  SELECT doc_id, bucket, n_tokens,
         |    CAST(coalesce(sum(n_tokens) OVER (
         |      PARTITION BY bucket ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS "offset"
         |  FROM t
         |), p AS (
         |  SELECT doc_id, bucket, n_tokens, "offset",
         |    unnest(generate_series("offset" // 256,
         |      ("offset" + n_tokens - 1) // 256)) AS pack
         |  FROM o WHERE n_tokens > 0
         |)
         |SELECT bucket, pack, count(*) AS n_docs, min(doc_id) AS first_doc,
         |  max(doc_id) AS last_doc,
         |  CAST(sum(least("offset" + n_tokens, (pack + 1) * 256) -
         |      greatest("offset", pack * 256)) AS BIGINT) AS n_tokens
         |FROM p GROUP BY bucket, pack
         |ORDER BY bucket, pack""".stripMargin,
    // mirrors Text.tfIdfTopK: tf per (doc, token), df per token over the
    // tf table, deterministic top-3 window
    "text_tfidf" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest($DuckToks) AS token FROM documents
         |), tf AS (
         |  SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2
         |), dfreq AS (
         |  SELECT token, count(*) AS df FROM tf GROUP BY 1
         |), r AS (
         |  SELECT doc_id, token, tf, row_number() OVER (
         |    PARTITION BY doc_id ORDER BY tf DESC, token ASC) AS rank
         |  FROM tf
         |)
         |SELECT r.doc_id, r.token, CAST(r.tf AS BIGINT) AS tf,
         |  CAST(dfreq.df AS BIGINT) AS df,
         |  CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_docs,
         |  CAST(r.rank AS BIGINT) AS rank
         |FROM r JOIN dfreq USING (token)
         |WHERE r.rank <= 3
         |ORDER BY r.doc_id, r.rank""".stripMargin,
    // mirrors Text.repetitionStats: per-token frequency table for the
    // token stats, list-comprehension 3-gram construction for the shingle
    // stats (docs shorter than 3 tokens join as 0-count rows)
    "text_gopher_filter" ->
      s"""WITH t AS (
         |  SELECT doc_id, $DuckToks AS toks FROM documents
         |), f AS (
         |  SELECT doc_id, tok, count(*) AS c
         |  FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
         |  GROUP BY doc_id, tok
         |), a AS (
         |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |    CAST(count(*) AS BIGINT) AS n_distinct,
         |    CAST(max(c) AS BIGINT) AS max_freq,
         |    CAST(sum(c * len(tok)) AS BIGINT) AS sum_len
         |  FROM f GROUP BY doc_id
         |), s AS (
         |  SELECT doc_id,
         |    CAST(greatest(len(toks) - 2, 0) AS BIGINT) AS n_3grams,
         |    CAST(len(list_distinct(
         |      [array_to_string(toks[i:i+2], ' ')
         |       for i in generate_series(1, greatest(len(toks)-2, 0))]))
         |      AS BIGINT) AS n_distinct_3grams
         |  FROM t
         |), m AS (
         |  SELECT d.doc_id, coalesce(a.n_tokens, 0) AS n_tokens,
         |    coalesce(a.n_distinct, 0) AS n_distinct,
         |    coalesce(a.max_freq, 0) AS max_freq,
         |    s.n_3grams, s.n_distinct_3grams,
         |    coalesce(a.sum_len, 0) AS sum_len
         |  FROM documents d
         |  LEFT JOIN a ON d.doc_id = a.doc_id
         |  JOIN s ON d.doc_id = s.doc_id
         |), r AS (
         |  SELECT *,
         |    CAST(n_tokens BETWEEN 10 AND 200 AS BIGINT) AS len_ok,
         |    CAST((n_tokens - n_distinct) * 10 <= n_tokens * 3 AS BIGINT)
         |      AS dup_tok_ok,
         |    CAST((n_3grams - n_distinct_3grams) * 10 <= n_3grams * 3
         |      AS BIGINT) AS dup_3gram_ok,
         |    CAST(max_freq * 5 <= n_tokens AS BIGINT) AS top_tok_ok,
         |    CAST(n_tokens * 2 <= sum_len AND sum_len <= n_tokens * 12
         |      AS BIGINT) AS tok_len_ok
         |  FROM m
         |)
         |SELECT *, CAST(len_ok + dup_tok_ok + dup_3gram_ok + top_tok_ok +
         |    tok_len_ok = 5 AS BIGINT) AS keep
         |FROM r ORDER BY doc_id""".stripMargin,
    "text_repetition" ->
      s"""WITH t AS (
         |  SELECT doc_id, $DuckToks AS toks FROM documents
         |), f AS (
         |  SELECT doc_id, tok, count(*) AS c
         |  FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
         |  GROUP BY doc_id, tok
         |), a AS (
         |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |    CAST(count(*) AS BIGINT) AS n_distinct_tokens,
         |    CAST(max(c) AS BIGINT) AS max_token_freq
         |  FROM f GROUP BY doc_id
         |), s AS (
         |  SELECT doc_id,
         |    CAST(greatest(len(toks) - 2, 0) AS BIGINT) AS n_shingles3,
         |    CAST(len(list_distinct(
         |      [array_to_string(toks[i:i+2], ' ')
         |       for i in generate_series(1, greatest(len(toks)-2, 0))]))
         |      AS BIGINT) AS n_distinct_shingles3
         |  FROM t
         |)
         |SELECT d.doc_id, coalesce(a.n_tokens, 0) AS n_tokens,
         |  coalesce(a.n_distinct_tokens, 0) AS n_distinct_tokens,
         |  coalesce(a.max_token_freq, 0) AS max_token_freq,
         |  s.n_shingles3, s.n_distinct_shingles3
         |FROM documents d
         |LEFT JOIN a USING (doc_id) JOIN s USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    // mirrors Text.scrubPii/pii*Count incl. the planted suffixes; RE2 and
    // Java regex agree on these patterns, 'g' makes DuckDB replace all
    "text_pii_scrub" ->
      """WITH p AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 3 = 0
        |      THEN ' contact user' || doc_id || '@example.com' ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0
        |      THEN ' call +1 555 ' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |      ELSE '' END AS t
        |  FROM documents
        |)
        |SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |      '<EMAIL>', 'g'),
        |    '\+[0-9][0-9 -]{6,}[0-9]', '<PHONE>', 'g') AS scrubbed,
        |  CAST(len(regexp_extract_all(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
        |    AS n_emails,
        |  CAST(len(regexp_extract_all(t, '\+[0-9][0-9 -]{6,}[0-9]')) AS BIGINT)
        |    AS n_phones
        |FROM p ORDER BY doc_id""".stripMargin,
    "text_shingle_fp" ->
      s"""WITH t AS (
         |  SELECT doc_id, $DuckToks AS toks FROM documents
         |), s AS (
         |  SELECT doc_id, list_distinct(
         |    [array_to_string(toks[i:i+2], ' ')
         |     for i in generate_series(1, greatest(len(toks)-2, 0))]) AS sh
         |  FROM t
         |), h AS (
         |  SELECT doc_id,
         |    ('0x' || substr(md5(unnest(sh)), 1, 15))::BIGINT AS hv
         |  FROM s
         |), a AS (
         |  SELECT doc_id, min(hv) AS fp_min, max(hv) AS fp_max,
         |         bit_xor(hv) AS fp_xor
         |  FROM h GROUP BY doc_id
         |)
         |SELECT d.doc_id, a.fp_min, a.fp_max,
         |       coalesce(a.fp_xor, 0) AS fp_xor
         |FROM documents d LEFT JOIN a USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    "multimodal_features" ->
      """SELECT doc_id AS media_id,
        |  ['image','audio','video'][(doc_id % 3) + 1] AS modality,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |FROM documents ORDER BY media_id""".stripMargin,
    "multimodal_frames" ->
      """SELECT doc_id AS media_id, i AS frame_idx,
        |       doc_id || ':' || i AS frame_key
        |FROM documents, generate_series(0, 3) AS t(i)
        |ORDER BY media_id, frame_idx""".stripMargin,
    // mirrors Multimodal.pxR/pxG/pxB + imgW/imgH: the decoded channel sums
    // must equal the closed-form pixel function summed over the image area
    "multimodal_decode" ->
      """WITH p AS (
        |  SELECT doc_id AS media_id,
        |         8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h,
        |         doc_id % 256 AS base
        |  FROM documents
        |)
        |SELECT media_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
        |  CAST(sum((base + 3*x + 5*y) % 256) AS BIGINT) AS sum_r,
        |  CAST(sum((2*base + x + 7*y) % 256) AS BIGINT) AS sum_g,
        |  CAST(sum((base + x*y) % 256) AS BIGINT) AS sum_b
        |FROM p, generate_series(0, 16) AS tx(x), generate_series(0, 13) AS ty(y)
        |WHERE x < w AND y < h
        |GROUP BY 1, 2, 3
        |ORDER BY media_id""".stripMargin,
    // nearest-neighbor source coords are integer floor division, so the
    // resized pixels stay arithmetic functions of (id, x, y)
    "multimodal_resize" ->
      """WITH p AS (
        |  SELECT doc_id AS media_id,
        |         8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h,
        |         doc_id % 256 AS base
        |  FROM documents
        |), g AS (
        |  SELECT media_id, base, (x * w) // 12 AS sx, (y * h) // 10 AS sy
        |  FROM p, generate_series(0, 11) AS tx(x), generate_series(0, 9) AS ty(y)
        |)
        |SELECT media_id, CAST(12 AS INTEGER) AS width,
        |  CAST(10 AS INTEGER) AS height,
        |  CAST(sum((base + 3*sx + 5*sy) % 256) AS BIGINT) AS sum_r,
        |  CAST(sum((2*base + sx + 7*sy) % 256) AS BIGINT) AS sum_g,
        |  CAST(sum((base + sx*sy) % 256) AS BIGINT) AS sum_b
        |FROM g GROUP BY 1, 2, 3
        |ORDER BY media_id""".stripMargin,
    // mirrors Multimodal.pcmSample/audioSamples: 16-bit samples are pure
    // integer arithmetic over (id, i), so the WAV encode→decode roundtrip
    // is provable sum-exactly (bounded series + filter: DuckDB 1.0 has no
    // lateral generate_series)
    "multimodal_audio" ->
      """WITH d AS (
        |  SELECT doc_id AS media_id, 200 + doc_id % 101 AS n FROM documents
        |), s AS (
        |  SELECT media_id, n,
        |    ((media_id*31 + 7*i*i + 13*i) % 65536) - 32768 AS v
        |  FROM d, generate_series(0, 300) AS t(i)
        |  WHERE i < n
        |)
        |SELECT media_id,
        |  CAST(any_value(n) AS BIGINT) AS n_samples,
        |  CAST(8000 AS INTEGER) AS sample_rate,
        |  CAST(any_value(n) * 1000 // 8000 AS BIGINT) AS duration_ms,
        |  CAST(sum(v) AS BIGINT) AS sum_s,
        |  CAST(sum(abs(v)) AS BIGINT) AS sum_abs
        |FROM s GROUP BY media_id
        |ORDER BY media_id""".stripMargin,
    // mirrors Multimodal.syntheticVideo/decodeVideoFrames: sampled frames
    // (k % 2 = 0 of 2 + id % 4) share the image pixel functions with a
    // per-frame base shift (id + 131k) % 256
    "multimodal_video" ->
      """WITH d AS (
        |  SELECT doc_id AS media_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h,
        |         2 + doc_id % 4 AS nf
        |  FROM documents
        |), f AS (
        |  SELECT media_id, w, h, k, (media_id + 131*k) % 256 AS base
        |  FROM d, generate_series(0, 5) AS t(k)
        |  WHERE k < nf AND k % 2 = 0
        |)
        |SELECT media_id, CAST(k AS INTEGER) AS frame_idx,
        |  CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
        |  CAST(sum((base + 3*x + 5*y) % 256) AS BIGINT) AS sum_r,
        |  CAST(sum((2*base + x + 7*y) % 256) AS BIGINT) AS sum_g,
        |  CAST(sum((base + x*y) % 256) AS BIGINT) AS sum_b
        |FROM f, generate_series(0, 16) AS tx(x), generate_series(0, 13) AS ty(y)
        |WHERE x < w AND y < h
        |GROUP BY media_id, k, w, h
        |ORDER BY media_id, frame_idx""".stripMargin,
    // recall gates: the Spark side computes recall-vs-exact and emits 1 iff
    // it clears the threshold; the oracle pins the constant (see the gate
    // queries for why the approximations can't have value oracles)
    "knn_lsh_recall" -> "SELECT CAST(1 AS BIGINT) AS recall_ok",
    "text_heavy_hitters" -> "SELECT CAST(1 AS BIGINT) AS recall_ok",
    // CMS gates: Spark checks the sketch's bounds (no under-counts, e^-d
    // over-count fraction) / batch-vs-drained-stream bit-equality in-plan
    "text_cms_counts" -> "SELECT CAST(1 AS BIGINT) AS cms_ok",
    "stream_cms" -> "SELECT CAST(1 AS BIGINT) AS cms_ok",
    "sketch_store_rollup" -> "SELECT CAST(1 AS BIGINT) AS store_ok",
    "stream_sketch_store" -> "SELECT CAST(1 AS BIGINT) AS store_ok",
    "knn_ivf_recall" -> "SELECT CAST(1 AS BIGINT) AS recall_ok",
    "multimodal_phash" -> "SELECT CAST(1 AS BIGINT) AS phash_ok",
    "knn_pq_recall" -> "SELECT CAST(1 AS BIGINT) AS recall_ok",
    "knn_ivfpq_recall" -> "SELECT CAST(1 AS BIGINT) AS recall_ok",
    "knn_ivfpq_stored" -> "SELECT CAST(1 AS BIGINT) AS recall_ok",
    "knn_ivf_trained" -> "SELECT CAST(1 AS BIGINT) AS recall_ok",
    "knn_quantized_recall" -> "SELECT CAST(1 AS BIGINT) AS recall_ok",
    "dedup_embedding_lsh_recall" -> "SELECT CAST(1 AS BIGINT) AS recall_ok",
    "semdedup_recall" -> "SELECT CAST(1 AS BIGINT) AS recall_ok",
    "dedup_minhash_lsh_recall" -> "SELECT CAST(1 AS BIGINT) AS recall_ok",
    // match gate: fast-path (xxhash64) verified pair set ≡ md5-twin set —
    // with dedup_minhash_oracle hash-proving the md5 set itself, this
    // transitively value-proves the fast path the driver runs
    "dedup_minhash_lsh_match" -> "SELECT CAST(1 AS BIGINT) AS match_ok",
    // the RHP-LSH paths are oracle-EXACT: the plane matrix is embedded as
    // literal arrays, so DuckDB recomputes signatures, the <=1-bit
    // multiprobe candidate set, and the cosine ranking identically
    "dedup_embedding_lsh" ->
      s"""WITH c AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |), sg AS (
         |  SELECT vec_id, v, ${sigSql("v", 8, 64, 42)} AS sig FROM c
         |), pr AS (
         |  SELECT a.vec_id AS id1, b.vec_id AS id2,
         |         ${cosSql("a.v", "b.v")} AS cos
         |  FROM sg a JOIN sg b
         |    ON a.vec_id < b.vec_id
         |   AND bit_count(xor(CAST(a.sig AS BIGINT), CAST(b.sig AS BIGINT))) <= 1
         |)
         |SELECT id1, id2, round(cos, 6) AS cos FROM pr
         |WHERE cos >= 0.4 ORDER BY id1, id2""".stripMargin,
    "knn_lsh" ->
      s"""WITH c AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |), sg AS (
         |  SELECT vec_id, v, ${sigSql("v", 8, 64, 42)} AS sig FROM c
         |), q AS (
         |  SELECT vec_id AS qid, v AS qv, sig AS qsig FROM sg WHERE vec_id < 10
         |), sc AS (
         |  SELECT q.qid, s.vec_id, ${cosSql("q.qv", "s.v")} AS cos
         |  FROM q JOIN sg s
         |    ON s.vec_id <> q.qid
         |   AND bit_count(xor(CAST(q.qsig AS BIGINT), CAST(s.sig AS BIGINT))) <= 1
         |), r AS (
         |  SELECT qid, vec_id, cos,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC)
         |      AS rank
         |  FROM sc
         |)
         |SELECT qid, rank, vec_id, round(cos, 6) AS cos FROM r
         |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,
    "embed_cluster_stats" ->
      s"""WITH c AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |), ct AS (
         |  SELECT vec_id AS cid, v AS cv FROM c WHERE vec_id % 50 = 0
         |), asg AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT c.vec_id, ct.cid,
         |      row_number() OVER (PARTITION BY c.vec_id
         |        ORDER BY ${cosSql("ct.cv", "c.v")} DESC, ct.cid ASC) AS rn
         |    FROM c CROSS JOIN ct
         |  ) WHERE rn = 1
         |)
         |SELECT cid, CAST(count(*) AS BIGINT) AS n,
         |       min(vec_id) AS min_id, max(vec_id) AS max_id
         |FROM asg GROUP BY cid ORDER BY cid""".stripMargin,
    "embed_label_centroids" ->
      """WITH e AS (
        |  SELECT label, unnest(embedding) AS v,
        |         unnest(range(1, len(embedding) + 1)) AS pos
        |  FROM embeddings
        |)
        |SELECT label, pos,
        |  CAST(sum(CAST(floor(CAST(v AS DOUBLE) * 1099511627776) AS BIGINT))
        |    AS BIGINT) AS sum_q,
        |  count(*) AS n
        |FROM e GROUP BY label, pos ORDER BY label, pos""".stripMargin,
    "embed_outliers" ->
      s"""WITH c AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |), ct AS (
         |  SELECT vec_id AS cid, v AS cv FROM c WHERE vec_id % 50 = 0
         |), best AS (
         |  SELECT vec_id, cid, cos FROM (
         |    SELECT c.vec_id, ct.cid, ${cosSql("ct.cv", "c.v")} AS cos,
         |      row_number() OVER (PARTITION BY c.vec_id
         |        ORDER BY ${cosSql("ct.cv", "c.v")} DESC, ct.cid ASC) AS rn
         |    FROM c CROSS JOIN ct
         |  ) WHERE rn = 1
         |)
         |SELECT vec_id, cid, round(cos, 6) AS cos
         |FROM best WHERE cos < 0.1 ORDER BY vec_id""".stripMargin,
    "knn_ivf" ->
      s"""WITH c AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |), ct AS (
         |  SELECT vec_id AS cid, v AS cv FROM c WHERE vec_id % 50 = 0
         |), asg AS (
         |  SELECT vec_id, v, cid FROM (
         |    SELECT c.vec_id, c.v, ct.cid,
         |      row_number() OVER (PARTITION BY c.vec_id
         |        ORDER BY ${cosSql("ct.cv", "c.v")} DESC, ct.cid ASC) AS rn
         |    FROM c CROSS JOIN ct
         |  ) WHERE rn = 1
         |), q AS (
         |  SELECT vec_id AS qid, v AS qv FROM c WHERE vec_id < 10
         |), qc AS (
         |  SELECT qid, qv, cid FROM (
         |    SELECT q.qid, q.qv, ct.cid,
         |      row_number() OVER (PARTITION BY q.qid
         |        ORDER BY ${cosSql("q.qv", "ct.cv")} DESC, ct.cid ASC) AS rn
         |    FROM q CROSS JOIN ct
         |  ) WHERE rn <= 3
         |), sc AS (
         |  SELECT qc.qid, asg.vec_id, ${cosSql("qc.qv", "asg.v")} AS cos
         |  FROM asg JOIN qc ON asg.cid = qc.cid AND asg.vec_id <> qc.qid
         |), r AS (
         |  SELECT qid, vec_id, cos,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC)
         |      AS rank
         |  FROM sc
         |)
         |SELECT qid, rank, vec_id, round(cos, 6) AS cos FROM r
         |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,
    "knn_brute" ->
      """WITH q AS (
        |  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec
        |  FROM embeddings WHERE vec_id < 10
        |), c AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
        |), sc AS (
        |  SELECT qid, vec_id,
        |    list_dot_product(qvec, vec) /
        |      (sqrt(list_dot_product(qvec, qvec)) * sqrt(list_dot_product(vec, vec))) AS cos
        |  FROM q CROSS JOIN c WHERE qid <> vec_id
        |), r AS (
        |  SELECT qid, vec_id, cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rank
        |  FROM sc
        |)
        |SELECT qid, rank, vec_id, round(cos, 6) AS cos
        |FROM r WHERE rank <= 5 ORDER BY qid, rank""".stripMargin
  )
}
