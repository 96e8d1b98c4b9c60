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

/** DuckDB oracle SQL for [[EntryPipeline]], first half. */
private[graft] object EntryPipelineOracles {
  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp,
        |  min(doc_id) AS keep_id, count(*) AS dup_count
        |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin,
    "dedup_keep_best" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp,
        |    CAST(length(text) AS BIGINT) AS s
        |  FROM documents
        |), r AS (
        |  SELECT fp, doc_id, s,
        |    count(*) OVER (PARTITION BY fp) AS dup_count,
        |    row_number() OVER (PARTITION BY fp ORDER BY s DESC, doc_id ASC)
        |      AS rn
        |  FROM f
        |)
        |SELECT fp, doc_id AS keep_id, s AS score, dup_count
        |FROM r WHERE rn = 1 ORDER BY fp""".stripMargin,
    "dedup_jaccard_pairs" ->
      s"""$JaccardPairsSqlCore
         |ORDER BY id1, id2""".stripMargin,
    "dedup_cross_corpus" ->
      s"""WITH t AS (
         |  SELECT doc_id, $DuckToks AS toks FROM documents
         |), s AS (
         |  SELECT doc_id, list_distinct(
         |    [array_to_string(toks[i:i+2], ' ')
         |     for i in generate_series(1, greatest(len(toks)-2, 0))]) AS sh
         |  FROM t
         |), refd AS (
         |  SELECT * FROM s WHERE doc_id % 3 = 0
         |), newd AS (
         |  SELECT * FROM s WHERE doc_id % 3 <> 0
         |), e0r AS (
         |  SELECT doc_id, unnest(sh) AS tok FROM refd
         |), stop AS (
         |  SELECT tok FROM e0r GROUP BY tok HAVING count(*) >
         |    greatest(20, ((SELECT count(*) FROM refd) * 5) // 1000)
         |), er AS (
         |  SELECT doc_id, count(*) OVER (PARTITION BY doc_id) AS n, tok
         |  FROM e0r WHERE tok NOT IN (SELECT tok FROM stop)
         |), e0n AS (
         |  SELECT doc_id, unnest(sh) AS tok FROM newd
         |), en AS (
         |  SELECT doc_id, count(*) OVER (PARTITION BY doc_id) AS n, tok
         |  FROM e0n WHERE tok NOT IN (SELECT tok FROM stop)
         |), p AS (
         |  SELECT en.doc_id AS new_id, er.doc_id AS ref_id,
         |         en.n AS n_new, er.n AS n_ref, count(*) AS shared
         |  FROM en JOIN er ON en.tok = er.tok
         |  GROUP BY 1, 2, 3, 4
         |)
         |SELECT new_id, ref_id, shared, n_new, n_ref,
         |       CAST(shared AS DOUBLE) / (n_new + n_ref - shared) AS jaccard
         |FROM p
         |WHERE CAST(shared AS DOUBLE) / (n_new + n_ref - shared) >= 0.3
         |ORDER BY new_id, ref_id""".stripMargin,
    "text_contamination" ->
      s"""WITH t AS (
         |  SELECT doc_id, $DuckToks AS toks FROM documents
         |), s AS (
         |  SELECT doc_id, list_distinct(
         |    [array_to_string(toks[i:i+2], ' ')
         |     for i in generate_series(1, greatest(len(toks)-2, 0))]) AS sh
         |  FROM t
         |), ev AS (
         |  SELECT DISTINCT unnest(sh) AS tok FROM s WHERE doc_id % 97 = 0
         |), tr AS (
         |  SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_shingles,
         |         unnest(sh) AS tok
         |  FROM s WHERE doc_id % 97 <> 0
         |)
         |SELECT doc_id, n_shingles, count(*) AS n_hits,
         |       CAST(count(*) AS DOUBLE) / n_shingles AS contamination
         |FROM tr JOIN ev USING (tok)
         |GROUP BY doc_id, n_shingles
         |ORDER BY doc_id""".stripMargin,
    "contamination_report" ->
      s"""WITH t AS (
         |  SELECT doc_id, $DuckToks AS toks FROM documents
         |), s AS (
         |  SELECT doc_id, list_distinct(
         |    [array_to_string(toks[i:i+2], ' ')
         |     for i in generate_series(1, greatest(len(toks)-2, 0))]) AS sh
         |  FROM t
         |), ev0 AS (
         |  SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_shingles, sh
         |  FROM s WHERE doc_id % 97 = 0
         |), ev AS (
         |  SELECT doc_id, unnest(sh) AS tok FROM ev0
         |), tr AS (
         |  SELECT DISTINCT unnest(sh) AS tok FROM s WHERE doc_id % 97 <> 0
         |), agg AS (
         |  SELECT ev.doc_id,
         |    CAST(sum(CASE WHEN tr.tok IS NOT NULL THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_shared
         |  FROM ev LEFT JOIN tr ON ev.tok = tr.tok
         |  GROUP BY ev.doc_id
         |)
         |SELECT ev0.doc_id, ev0.n_shingles,
         |  coalesce(agg.n_shared, CAST(0 AS BIGINT)) AS n_shared,
         |  CASE WHEN ev0.n_shingles > 0
         |       THEN CAST(coalesce(agg.n_shared, 0) AS DOUBLE) / ev0.n_shingles
         |       ELSE 0.0 END AS leakage
         |FROM ev0 LEFT JOIN agg USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "dedup_bloom" ->
      """WITH fp AS (
        |  SELECT doc_id,
        |    md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
        |  FROM documents
        |)
        |SELECT doc_id, fp FROM fp
        |WHERE fp IN (SELECT fp FROM fp WHERE doc_id % 3 = 0)
        |ORDER BY doc_id""".stripMargin,
    // the admitted set is the exact complement of dedup_bloom's dup set
    "stream_bloom_admit" ->
      """WITH fp AS (
        |  SELECT doc_id,
        |    md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
        |  FROM documents
        |)
        |SELECT f.doc_id, f.fp FROM fp f
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM fp r WHERE r.doc_id % 3 = 0 AND r.fp = f.fp)
        |ORDER BY f.doc_id""".stripMargin,
    "text_novelty" ->
      s"""WITH t AS (
         |  SELECT doc_id, $DuckToks AS toks FROM documents
         |), s AS (
         |  SELECT doc_id, list_distinct(
         |    [array_to_string(toks[i:i+2], ' ')
         |     for i in generate_series(1, greatest(len(toks)-2, 0))]) AS sh
         |  FROM t
         |), e AS (
         |  SELECT doc_id, unnest(sh) AS tok FROM s
         |), d AS (
         |  SELECT tok, count(*) AS df FROM e GROUP BY tok
         |)
         |SELECT doc_id, count(*) AS n_shingles,
         |  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
         |  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
         |    AS novelty
         |FROM e JOIN d USING (tok)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "source_stats" ->
      s"""WITH l AS (
         |  SELECT source, text,
         |    ${langScoreSql(Text.StopwordsDe)} AS s_de,
         |    ${langScoreSql(Text.StopwordsEn)} AS s_en,
         |    ${langScoreSql(Text.StopwordsEs)} AS s_es,
         |    ${langScoreSql(Text.StopwordsFr)} AS s_fr
         |  FROM documents
         |), p AS (
         |  SELECT source,
         |    CAST(len($DuckToks) AS BIGINT) AS nt,
         |    CAST(length(text) AS BIGINT) AS nc,
         |    md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp,
         |    $langCaseSql AS lang_pred
         |  FROM l
         |)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(nt) AS BIGINT) AS n_tokens,
         |  CAST(sum(nc) AS BIGINT) AS n_chars,
         |  CAST(count(DISTINCT lang_pred) AS BIGINT) AS n_langs,
         |  CAST(count(DISTINCT fp) AS BIGINT) AS n_unique
         |FROM p GROUP BY source ORDER BY source""".stripMargin,
    "text_length_hist" ->
      s"""SELECT lang, CAST(len($DuckToks) // 10 AS BIGINT) AS bucket,
         |  count(*) AS n_docs
         |FROM documents GROUP BY 1, 2
         |ORDER BY lang, bucket""".stripMargin,
    "text_bpe_pairs" ->
      s"""WITH w AS (
         |  SELECT unnest($DuckToks) AS w FROM documents
         |), p AS (
         |  SELECT unnest([substr(w, i, 2)
         |    for i in generate_series(1, len(w) - 1)]) AS pair
         |  FROM w
         |)
         |SELECT pair, count(*) AS n FROM p
         |GROUP BY pair ORDER BY n DESC, pair LIMIT 50""".stripMargin,
    "text_bpe_encode" -> bpeEncodeOracleSql(8),
    "text_bpe_tokenize" -> bpeTokenizeOracleSql(8),
    "text_pack_tokens" -> bpePackTokensOracleSql(8, 256, 8),
    "text_bpe_encode_batch" -> bpeBatchEncodeOracleSql(8, 32, 256),
    "text_pack_bpe" -> bpePackOracleSql(8, 32, 256, 256, 8),
    "text_dup_chunks" -> {
      val size = 32
      s"""WITH t AS (
         |  SELECT doc_id, $DuckToks AS toks FROM documents
         |), m AS (
         |  SELECT doc_id, toks, len(toks) AS n,
         |    CASE WHEN len(toks) = 0 THEN 0
         |         ELSE greatest(1, (len(toks) + $size - 1) // $size)
         |    END AS nc
         |  FROM t
         |), c AS (
         |  SELECT doc_id,
         |    md5(array_to_string(toks[i * $size + 1 : i * $size + $size], ' '))
         |      AS fp
         |  FROM m CROSS JOIN (
         |    SELECT unnest(generate_series(0, 999)) AS i
         |  ) WHERE i < nc
         |), f AS (SELECT fp, count(*) AS df FROM c GROUP BY fp)
         |SELECT doc_id, count(*) AS n_chunks,
         |  CAST(sum(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_dup_chunks
         |FROM c JOIN f USING (fp)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
    // exact duplicated-span coverage: the same k-gram windows, occurrence
    // filter, and gaps-and-islands merge as the operator — pure integer
    // arithmetic end to end, so equality is bit-exact
    "text_dup_spans" -> {
      val k = 8
      s"""WITH t AS (
         |  SELECT doc_id, $DuckToks AS toks FROM documents
         |), g AS (
         |  SELECT doc_id, toks,
         |    unnest(generate_series(1,
         |      greatest(len(toks) - ${k - 1}, 0))) AS i
         |  FROM t
         |), e AS (
         |  SELECT doc_id, i - 1 AS pos,
         |    array_to_string(toks[i : i + ${k - 1}], ' ') AS gram
         |  FROM g
         |), dup AS (
         |  SELECT gram FROM e GROUP BY gram HAVING count(*) >= 2
         |), p AS (
         |  SELECT e.doc_id, e.pos FROM e JOIN dup USING (gram)
         |), isl AS (
         |  SELECT doc_id, pos,
         |    CASE WHEN coalesce(pos >= max(pos + $k) OVER (
         |        PARTITION BY doc_id ORDER BY pos
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |      TRUE) THEN 1 ELSE 0 END AS nw
         |  FROM p
         |), isl2 AS (
         |  SELECT doc_id, pos,
         |    sum(nw) OVER (PARTITION BY doc_id ORDER BY pos) AS island
         |  FROM isl
         |), cov AS (
         |  SELECT doc_id, max(pos) + $k - min(pos) AS covered
         |  FROM isl2 GROUP BY doc_id, island
         |), per AS (
         |  SELECT doc_id, CAST(sum(covered) AS BIGINT) AS dup_tokens
         |  FROM cov GROUP BY doc_id
         |)
         |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
         |  coalesce(per.dup_tokens, 0) AS dup_tokens
         |FROM t LEFT JOIN per USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    },
    // the excision transform: same islands, then survivors rejoin in
    // token order — list(tok ORDER BY pos) mirrors the sorted fold
    "text_excise_spans" -> {
      val k = 8
      s"""WITH t AS (
         |  SELECT doc_id, $DuckToks AS toks FROM documents
         |), g AS (
         |  SELECT doc_id, toks,
         |    unnest(generate_series(1,
         |      greatest(len(toks) - ${k - 1}, 0))) AS i
         |  FROM t
         |), e AS (
         |  SELECT doc_id, i - 1 AS pos,
         |    array_to_string(toks[i : i + ${k - 1}], ' ') AS gram
         |  FROM g
         |), dup AS (
         |  SELECT gram FROM e GROUP BY gram HAVING count(*) >= 2
         |), p AS (
         |  SELECT e.doc_id, e.pos FROM e JOIN dup USING (gram)
         |), isl AS (
         |  SELECT doc_id, pos,
         |    CASE WHEN coalesce(pos >= max(pos + $k) OVER (
         |        PARTITION BY doc_id ORDER BY pos
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |      TRUE) THEN 1 ELSE 0 END AS nw
         |  FROM p
         |), isl2 AS (
         |  SELECT doc_id, pos,
         |    sum(nw) OVER (PARTITION BY doc_id ORDER BY pos) AS island
         |  FROM isl
         |), spans AS (
         |  SELECT doc_id, min(pos) AS s, max(pos) + $k AS e2
         |  FROM isl2 GROUP BY doc_id, island
         |), cov AS (
         |  SELECT doc_id, CAST(sum(e2 - s) AS BIGINT) AS dup_tokens
         |  FROM spans GROUP BY doc_id
         |), cut AS (
         |  SELECT doc_id, unnest(generate_series(s, e2 - 1)) AS pos
         |  FROM spans
         |), tok AS (
         |  SELECT doc_id, unnest(generate_series(1, len(toks))) - 1 AS pos,
         |    toks AS toks
         |  FROM t
         |), kept AS (
         |  SELECT tok.doc_id, tok.pos, tok.toks[tok.pos + 1] AS w
         |  FROM tok ANTI JOIN cut
         |    ON tok.doc_id = cut.doc_id AND tok.pos = cut.pos
         |), clean AS (
         |  SELECT doc_id,
         |    array_to_string(list(w ORDER BY pos), ' ') AS text_clean
         |  FROM kept GROUP BY doc_id
         |)
         |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
         |  coalesce(cov.dup_tokens, 0) AS dup_tokens,
         |  coalesce(clean.text_clean, '') AS text_clean
         |FROM t LEFT JOIN cov USING (doc_id)
         |  LEFT JOIN clean USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    },
    "quality_length_trim" ->
      """WITH h AS (
        |  SELECT source, n_chars, count(*) AS c
        |  FROM documents GROUP BY 1, 2
        |), cum AS (
        |  SELECT source, n_chars, c,
        |    sum(c) OVER (PARTITION BY source ORDER BY n_chars) AS cle
        |  FROM h
        |), tot AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1
        |), keep AS (
        |  SELECT source, n_chars
        |  FROM cum JOIN tot USING (source)
        |  WHERE cle * 100 > n * 10 AND (cle - c) * 100 < n * 90
        |)
        |SELECT doc_id, source, n_chars
        |FROM documents JOIN keep USING (source, n_chars)
        |ORDER BY doc_id""".stripMargin,
    "pipeline_clean" -> {
      val size = 16
      s"""WITH src AS (
         |  SELECT doc_id, source,
         |    regexp_replace(regexp_replace(
         |      text ||
         |      CASE WHEN doc_id % 3 = 0
         |        THEN ' contact user' || doc_id || '@example.com'
         |        ELSE '' END ||
         |      CASE WHEN doc_id % 5 = 0
         |        THEN ' call +1 555 ' ||
         |          lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         |        ELSE '' END,
         |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
         |      '<EMAIL>', 'g'),
         |      '\\+[0-9][0-9 -]{6,}[0-9]', '<PHONE>', 'g') AS t
         |  FROM documents
         |), toks AS (
         |  SELECT doc_id, source,
         |    list_filter(string_split_regex(lower(t), '[^a-z0-9]+'),
         |      x -> x <> '') AS tk
         |  FROM src
         |), m AS (
         |  SELECT doc_id, source, tk,
         |    CASE WHEN len(tk) = 0 THEN 0
         |         ELSE greatest(1, (len(tk) + $size - 1) // $size)
         |    END AS nc
         |  FROM toks
         |), c AS (
         |  SELECT doc_id, i AS ci,
         |    array_to_string(tk[i * $size + 1 : i * $size + $size], ' ')
         |      AS ct
         |  FROM m CROSS JOIN (
         |    SELECT unnest(generate_series(0, 999)) AS i
         |  ) WHERE i < nc
         |), f AS (SELECT ct, count(*) AS df FROM c GROUP BY ct
         |), g AS (
         |  SELECT doc_id, count(*) AS n_chunks,
         |    CAST(sum(CASE WHEN df >= 3 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_dropped,
         |    string_agg(CASE WHEN df < 3 THEN ct END, ' ' ORDER BY ci)
         |      AS clean
         |  FROM c JOIN f USING (ct) GROUP BY doc_id
         |), j AS (
         |  SELECT m.doc_id, m.source,
         |    COALESCE(clean, '') AS text_clean,
         |    COALESCE(n_chunks, 0) AS n_chunks,
         |    COALESCE(n_dropped, 0) AS n_dropped,
         |    len(COALESCE(clean, '')) AS l
         |  FROM m LEFT JOIN g USING (doc_id)
         |), h AS (
         |  SELECT source, l, count(*) AS cnt FROM j GROUP BY 1, 2
         |), cum AS (
         |  SELECT source, l, cnt,
         |    sum(cnt) OVER (PARTITION BY source ORDER BY l) AS cle
         |  FROM h
         |), tot AS (
         |  SELECT source, CAST(sum(cnt) AS BIGINT) AS n FROM h GROUP BY 1
         |), keep AS (
         |  SELECT source, l FROM cum JOIN tot USING (source)
         |  WHERE cle * 100 > n * 10 AND (cle - cnt) * 100 < n * 90
         |)
         |SELECT doc_id, source, text_clean, n_chunks, n_dropped
         |FROM j JOIN keep USING (source, l)
         |ORDER BY doc_id""".stripMargin
    },
    "text_remove_boilerplate" -> {
      val size = 16
      s"""WITH t AS (
         |  SELECT doc_id, $DuckToks AS toks FROM documents
         |), m AS (
         |  SELECT doc_id, toks,
         |    CASE WHEN len(toks) = 0 THEN 0
         |         ELSE greatest(1, (len(toks) + $size - 1) // $size)
         |    END AS nc
         |  FROM t
         |), c AS (
         |  SELECT doc_id, i AS ci,
         |    array_to_string(toks[i * $size + 1 : i * $size + $size], ' ')
         |      AS ct
         |  FROM m CROSS JOIN (
         |    SELECT unnest(generate_series(0, 999)) AS i
         |  ) WHERE i < nc
         |), f AS (SELECT ct, count(*) AS df FROM c GROUP BY ct
         |), g AS (
         |  SELECT doc_id, count(*) AS n_chunks,
         |    CAST(sum(CASE WHEN df >= 3 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_dropped,
         |    string_agg(CASE WHEN df < 3 THEN ct END, ' ' ORDER BY ci)
         |      AS clean
         |  FROM c JOIN f USING (ct) GROUP BY doc_id
         |)
         |SELECT d.doc_id, COALESCE(clean, '') AS text_clean,
         |  COALESCE(n_chunks, 0) AS n_chunks,
         |  COALESCE(n_dropped, 0) AS n_dropped
         |FROM documents d LEFT JOIN g USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    },
    "text_window_cooccur" ->
      s"""WITH t AS (
         |  SELECT $DuckToks AS toks FROM documents
         |), v AS (
         |  SELECT tok FROM (
         |    SELECT unnest(toks) AS tok FROM t
         |  ) GROUP BY tok
         |  ORDER BY count(*) DESC, tok LIMIT 100
         |), pos AS (
         |  SELECT toks, unnest(generate_series(1, len(toks))) AS i FROM t
         |), pr AS (
         |  SELECT least(toks[i], toks[i + o]) AS tok_a,
         |         greatest(toks[i], toks[i + o]) AS tok_b
         |  FROM pos CROSS JOIN (SELECT unnest([1, 2]) AS o)
         |  WHERE i + o <= len(toks)
         |    AND toks[i] IN (SELECT tok FROM v)
         |    AND toks[i + o] IN (SELECT tok FROM v)
         |)
         |SELECT tok_a, tok_b, count(*) AS n
         |FROM pr GROUP BY tok_a, tok_b
         |ORDER BY tok_a, tok_b""".stripMargin,
    "text_cooccur" ->
      s"""WITH td AS (
         |  SELECT doc_id, unnest(list_distinct($DuckToks)) AS tok
         |  FROM documents
         |), v AS (
         |  SELECT tok FROM (
         |    SELECT tok, count(*) AS df FROM td GROUP BY tok
         |    ORDER BY df DESC, tok LIMIT 100
         |  )
         |), f AS (SELECT doc_id, tok FROM td JOIN v USING (tok))
         |SELECT a.tok AS tok_a, b.tok AS tok_b, count(*) AS n_docs
         |FROM f a JOIN f b ON a.doc_id = b.doc_id AND a.tok < b.tok
         |GROUP BY tok_a, tok_b
         |ORDER BY tok_a, tok_b""".stripMargin,
    "text_collocations" ->
      s"""WITH t AS (SELECT $DuckToks AS toks FROM documents),
         |uni AS (
         |  SELECT tok, CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT unnest(toks) AS tok FROM t) GROUP BY tok
         |), n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni),
         |bi AS (
         |  SELECT bg, CAST(count(*) AS BIGINT) AS c_ab FROM (
         |    SELECT unnest([toks[i] || ' ' || toks[i+1]
         |      for i in generate_series(1, greatest(len(toks)-1, 0))]) AS bg
         |    FROM t)
         |  GROUP BY bg HAVING count(*) >= 5
         |)
         |SELECT string_split(bg, ' ')[1] AS tok_a,
         |  string_split(bg, ' ')[2] AS tok_b, c_ab, ca.c AS c_a, cb.c AS c_b,
         |  CAST((1048576::HUGEINT * c_ab * (SELECT n FROM n))
         |    // (ca.c::HUGEINT * cb.c) AS BIGINT) AS pmi_s
         |FROM bi
         |JOIN uni ca ON ca.tok = string_split(bg, ' ')[1]
         |JOIN uni cb ON cb.tok = string_split(bg, ' ')[2]
         |ORDER BY pmi_s DESC, tok_a, tok_b LIMIT 50""".stripMargin,
    "text_lm_score" ->
      s"""WITH rt AS (
         |  SELECT $DuckToks AS toks FROM documents WHERE doc_id % 3 = 0
         |), runi AS (
         |  SELECT tok, CAST(count(*) AS BIGINT) AS c1
         |  FROM (SELECT unnest(toks) AS tok FROM rt) GROUP BY tok
         |), v AS (SELECT CAST(count(*) AS BIGINT) AS v FROM runi),
         |rbi AS (
         |  SELECT bg, CAST(count(*) AS BIGINT) AS c12 FROM (
         |    SELECT unnest([toks[i] || ' ' || toks[i+1]
         |      for i in generate_series(1, greatest(len(toks)-1, 0))]) AS bg
         |    FROM rt)
         |  GROUP BY bg
         |), d AS (
         |  SELECT doc_id, unnest([toks[i] || ' ' || toks[i+1]
         |    for i in generate_series(1, greatest(len(toks)-1, 0))]) AS bg
         |  FROM (SELECT doc_id, $DuckToks AS toks FROM documents)
         |), p AS (
         |  SELECT doc_id,
         |    (1048576::HUGEINT * (coalesce(c12, 0) + 1))
         |      // (coalesce(c1, 0) + (SELECT v FROM v)) AS p
         |  FROM d
         |  LEFT JOIN rbi USING (bg)
         |  LEFT JOIN runi ON runi.tok = string_split(d.bg, ' ')[1]
         |)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  CAST(sum(p) // count(*) AS BIGINT) AS lm_score
         |FROM p GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_classifier_score" ->
      s"""WITH $classifierOracleCore, d AS (
         |  SELECT doc_id, unnest(toks) AS tok
         |  FROM (SELECT doc_id, $DuckToks AS toks FROM documents)
         |), p AS (
         |  SELECT doc_id, coalesce(w, (SELECT w0 FROM w0)) AS w
         |  FROM d LEFT JOIN w USING (tok)
         |)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
         |  CAST(sum(w::HUGEINT) // count(*) AS BIGINT) AS clf_score,
         |  CAST(CASE WHEN sum(w::HUGEINT) // count(*) >= 1048576
         |    THEN 1 ELSE 0 END AS BIGINT) AS pred_pos
         |FROM p GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_classifier_eval" ->
      s"""WITH $classifierOracleCore, d AS (
         |  SELECT doc_id, unnest(toks) AS tok
         |  FROM (SELECT doc_id, $DuckToks AS toks FROM documents
         |        WHERE doc_id % 5 = 4)
         |), p AS (
         |  SELECT doc_id, coalesce(w, (SELECT w0 FROM w0)) AS w
         |  FROM d LEFT JOIN w USING (tok)
         |), sc AS (
         |  SELECT doc_id,
         |    CASE WHEN sum(w::HUGEINT) // count(*) >= 1048576
         |      THEN 1 ELSE 0 END AS pred_pos
         |  FROM p GROUP BY doc_id
         |)
         |SELECT CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT)
         |    AS is_pos,
         |  CAST(pred_pos AS BIGINT) AS pred_pos,
         |  CAST(count(*) AS BIGINT) AS n_docs
         |FROM sc JOIN documents USING (doc_id)
         |GROUP BY 1, 2 ORDER BY is_pos, pred_pos""".stripMargin,
    "text_dup_ngrams" ->
      s"""WITH t AS (
         |  SELECT doc_id, $DuckToks AS toks FROM documents
         |), s AS (
         |  SELECT doc_id, list_distinct(
         |    [array_to_string(toks[i:i+4], ' ')
         |     for i in generate_series(1, greatest(len(toks)-4, 0))]) AS sh
         |  FROM t
         |)
         |SELECT tok AS ngram, count(*) AS df, min(doc_id) AS first_doc
         |FROM (SELECT doc_id, unnest(sh) AS tok FROM s)
         |GROUP BY tok HAVING count(*) >= 2
         |ORDER BY df DESC, ngram LIMIT 50""".stripMargin,
    // transitive closure over the same pair list: reach = every (node,
    // reachable-node) via the recursive CTE, component = min reachable id
    "dedup_clusters" ->
      s"""WITH RECURSIVE pr AS (
         |$JaccardPairsSqlCore
         |), und AS (
         |  SELECT id1 AS a, id2 AS b FROM pr
         |  UNION SELECT id2, id1 FROM pr
         |), reach(id, r) AS (
         |  SELECT a, a FROM und
         |  UNION
         |  SELECT und.a, reach.r FROM und JOIN reach ON und.b = reach.id
         |)
         |SELECT id AS doc_id, min(r) AS component,
         |       CAST(CASE WHEN id = min(r) THEN 1 ELSE 0 END AS BIGINT)
         |         AS is_rep
         |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin,
    "dedup_cluster_keepbest" ->
      s"""WITH RECURSIVE pr AS (
         |$JaccardPairsSqlCore
         |), und AS (
         |  SELECT id1 AS a, id2 AS b FROM pr
         |  UNION SELECT id2, id1 FROM pr
         |), reach(id, r) AS (
         |  SELECT a, a FROM und
         |  UNION
         |  SELECT und.a, reach.r FROM und JOIN reach ON und.b = reach.id
         |), comp AS (
         |  SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id
         |), sc AS (
         |  SELECT doc_id, CAST(len($DuckToks) AS BIGINT) AS s FROM documents
         |), r AS (
         |  SELECT component, comp.doc_id, s,
         |    row_number() OVER (PARTITION BY component
         |      ORDER BY s DESC, comp.doc_id ASC) AS rn,
         |    CAST(count(*) OVER (PARTITION BY component) AS BIGINT)
         |      AS cluster_size
         |  FROM comp JOIN sc ON comp.doc_id = sc.doc_id
         |)
         |SELECT component, doc_id AS keep_id, s AS score, cluster_size
         |FROM r WHERE rn = 1 ORDER BY component""".stripMargin,
    "pipeline_curate" ->
      s"""WITH ${curateCtesSql("documents")}
         |SELECT doc_id, lang_pred, n_tokens FROM ex
         |WHERE doc_id NOT IN (SELECT id2 FROM drops)
         |ORDER BY doc_id""".stripMargin,
    "pipeline_funnel" ->
      s"""WITH ${curateCtesSql("documents")}
         |SELECT CAST(stage_idx AS BIGINT) AS stage_idx, stage,
         |  CAST(n_docs AS BIGINT) AS n_docs
         |FROM (
         |  SELECT 1 AS stage_idx, 'input' AS stage,
         |    (SELECT count(*) FROM feat) AS n_docs
         |  UNION ALL SELECT 2, 'length_lang', (SELECT count(*) FROM kept)
         |  UNION ALL SELECT 3, 'exact_dedup', (SELECT count(*) FROM ex)
         |  UNION ALL SELECT 4, 'near_dedup',
         |    (SELECT count(*) FROM ex) - (SELECT count(*) FROM drops)
         |) ORDER BY stage_idx""".stripMargin,
    "pipeline_funnel_prep" ->
      s"""WITH $trainPrepCtesSql
         |SELECT CAST(stage_idx AS BIGINT) AS stage_idx, stage,
         |  CAST(n_docs AS BIGINT) AS n_docs
         |FROM (
         |  SELECT 1 AS stage_idx, 'input' AS stage,
         |    (SELECT count(*) FROM scr) AS n_docs
         |  UNION ALL SELECT 2, 'length_lang', (SELECT count(*) FROM kept)
         |  UNION ALL SELECT 3, 'exact_dedup', (SELECT count(*) FROM ex)
         |  UNION ALL SELECT 4, 'near_dedup', (SELECT count(*) FROM cur)
         |  UNION ALL SELECT 5, 'decontaminated', (SELECT count(*) FROM cln)
         |  UNION ALL SELECT 6, 'budget_mixed', (SELECT count(*) FROM mx)
         |) ORDER BY stage_idx""".stripMargin,
    "pipeline_train_prep" ->
      s"""WITH $trainPrepCtesSql, o AS (
         |  SELECT doc_id, lang_pred, n_tokens, cum_tokens,
         |    doc_id % 4 AS bucket,
         |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY doc_id % 4
         |      ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS "offset"
         |  FROM mx
         |)
         |SELECT doc_id, lang_pred, n_tokens, cum_tokens, bucket, "offset",
         |  "offset" // 128 AS pack_first,
         |  CASE WHEN n_tokens > 0 THEN ("offset" + n_tokens - 1) // 128
         |       ELSE "offset" // 128 END AS pack_last
         |FROM o ORDER BY doc_id""".stripMargin,
    "dedup_embedding" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |), p AS (
        |  SELECT a.vec_id AS id1, b.vec_id AS id2,
        |    list_dot_product(a.v, b.v) /
        |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id
        |)
        |SELECT id1, id2, round(cos, 6) AS cos FROM p
        |WHERE cos >= 0.4 ORDER BY id1, id2""".stripMargin,
    "text_token_counts" ->
      s"""SELECT doc_id,
         |  CAST(len($DuckToks) AS BIGINT) AS n_tokens,
         |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_bpe_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,
    "dedup_minhash_oracle" -> minhashMd5Sql,
    // the xxhash64 fast path emits the same verified pair set as the md5
    // twin (dedup_minhash_lsh_match pins set-equality in both directions),
    // and the row values (shared/n1/n2/jaccard) come from the exact verify
    // stage, which is hash-independent — so the md5 reconstruction is a
    // valid value oracle for the fast path the driver runs
    "dedup_minhash_lsh" -> minhashMd5Sql,
    // streaming the corpus against its own static index emits exactly the
    // batch near-dup pair set (same banding, same capped verify)
    "stream_neardup" -> minhashMd5Sql,
  )

  private lazy val minhashMd5Sql: String =
      s"""WITH t AS (
         |  SELECT doc_id, $DuckToks AS toks FROM documents
         |), s AS (
         |  SELECT doc_id, list_distinct(
         |    [array_to_string(toks[i:i+2], ' ')
         |     for i in generate_series(1, greatest(len(toks)-2, 0))]) AS sh
         |  FROM t
         |), e0 AS (
         |  SELECT doc_id, unnest(sh) AS tok FROM s
         |), stop AS (
         |  SELECT tok FROM e0 GROUP BY tok HAVING count(*) >
         |    greatest(20, ((SELECT count(*) FROM documents) * 5) // 1000)
         |), e AS (
         |  SELECT doc_id, count(*) OVER (PARTITION BY doc_id) AS n, tok
         |  FROM e0 WHERE tok NOT IN (SELECT tok FROM stop)
         |), hx AS (
         |  SELECT doc_id, r.i,
         |    min(('0x' || substr(md5(CAST(r.i AS VARCHAR) || ':' || e0.tok),
         |      1, 15))::BIGINT) AS mh
         |  FROM e0 CROSS JOIN range(64) r(i)
         |  GROUP BY doc_id, r.i
         |), bnd AS (
         |  SELECT doc_id, i // 4 AS band,
         |    string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS bucket
         |  FROM hx GROUP BY doc_id, i // 4
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |  FROM bnd a JOIN bnd b
         |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
         |), p AS (
         |  SELECT a.doc_id AS id1, b.doc_id AS id2, a.n AS n1, b.n AS n2,
         |         count(*) AS shared
         |  FROM e a JOIN e b ON a.tok = b.tok AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 3, 4
         |)
         |SELECT p.id1, p.id2, p.shared, p.n1, p.n2,
         |       CAST(p.shared AS DOUBLE) / (p.n1 + p.n2 - p.shared) AS jaccard
         |FROM p JOIN cand ON p.id1 = cand.id1 AND p.id2 = cand.id2
         |WHERE CAST(p.shared AS DOUBLE) / (p.n1 + p.n2 - p.shared) >= 0.3
         |ORDER BY p.id1, p.id2""".stripMargin
}
