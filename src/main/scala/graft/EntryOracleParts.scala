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

/** Shared DuckDB SQL fragments (CTE builders, language score cases,
  * BPE replay chains) consumed by the oracle maps. */
private[graft] object EntryOracleParts {
  def langScoreSql(words: Seq[String]): String =
    s"CAST(len(list_filter($DuckToks, x -> list_contains([" +
      words.map(w => s"'$w'").mkString(",") + s"], x))) AS BIGINT)"

  def langCaseSql: String =
    """CASE
      |    WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de > 0 THEN 'de'
      |    WHEN s_en >= s_es AND s_en >= s_fr AND s_en > 0 THEN 'en'
      |    WHEN s_es >= s_fr AND s_es > 0 THEN 'es'
      |    WHEN s_fr > 0 THEN 'fr'
      |    ELSE 'und'
      |  END""".stripMargin

  /** DuckDB-side tokenizer (must mirror [[Text.tokens]]). */
  def DuckToks =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"

  /** Shared CTE body of the classifier oracles: trains the token-ratio
    * model on the 4/5 split exactly as [[Text.classifierTrain]] does
    * (counting + HUGEINT cross-multiplication, S = 2^20), ending with
    * `w` (tok → weight) and `m` (class totals + vocab scalar). */
  def classifierOracleCore: String =
    s"""tr AS (
       |  SELECT lang, $DuckToks AS toks FROM documents WHERE doc_id % 5 < 4
       |), cpos AS (
       |  SELECT tok, CAST(count(*) AS BIGINT) AS cp
       |  FROM (SELECT unnest(toks) AS tok FROM tr WHERE lang = 'en')
       |  GROUP BY tok
       |), cneg AS (
       |  SELECT tok, CAST(count(*) AS BIGINT) AS cn
       |  FROM (SELECT unnest(toks) AS tok FROM tr WHERE lang <> 'en')
       |  GROUP BY tok
       |), vocab AS (
       |  SELECT coalesce(cpos.tok, cneg.tok) AS tok,
       |    coalesce(cp, 0) AS cp, coalesce(cn, 0) AS cn
       |  FROM cpos FULL JOIN cneg ON cpos.tok = cneg.tok
       |), m AS (
       |  SELECT CAST(sum(cp) AS BIGINT) AS npos,
       |    CAST(sum(cn) AS BIGINT) AS nneg,
       |    CAST(count(*) AS BIGINT) AS v FROM vocab
       |), w AS (
       |  SELECT tok, CAST((1048576::HUGEINT * (cp + 1)
       |      * ((SELECT nneg FROM m) + (SELECT v FROM m)))
       |    // ((cn + 1)::HUGEINT
       |      * ((SELECT npos FROM m) + (SELECT v FROM m))) AS BIGINT) AS w
       |  FROM vocab
       |), w0 AS (
       |  SELECT CAST((1048576::HUGEINT * (nneg + v)) // (npos + v)
       |    AS BIGINT) AS w0 FROM m
       |)""".stripMargin

  /** The `text_bpe_encode` oracle, with the greedy training loop UNROLLED:
    * round k's CTE pair (pK = weighted top adjacent symbol pair of
    * segmentation w(K-1), wK = that pair merged everywhere via plain
    * left-to-right replace) reproduces [[Text.bpeTrain]] bit-for-bit —
    * the pageRank unrolled-iteration oracle pattern applied to tokenizer
    * training. Precondition (holds on any real corpus): every round finds
    * at least one pair. */
  /** The unrolled greedy-training CTE chain shared by the bpe encode /
    * tokenize oracles: `w0` (word counts + initial segmentation) and
    * per-round (`pK` = top pair of w(K-1), `wK` = that pair merged).
    * AS MATERIALIZED on every level: each wK is referenced twice (the
    * next round's pair count AND the next wK+1) — inlined, the chain
    * re-evaluates w0 2^merges times; materialized, each level runs
    * once. */
  private def bpeGreedyCtes(merges: Int): String = {
    val rounds = (1 to merges).map { k =>
      s"""p$k AS MATERIALIZED (
         |  SELECT bg AS pair FROM (
         |    SELECT bg, sum(cnt) AS c FROM (
         |      SELECT cnt, unnest([syms[i] || ' ' || syms[i+1]
         |        for i in generate_series(1, greatest(len(syms)-1, 0))]) AS bg
         |      FROM (SELECT cnt, string_split(trim(seq), ' ') AS syms
         |            FROM w${k - 1})
         |    ) GROUP BY bg ORDER BY c DESC, bg LIMIT 1
         |  )
         |), w$k AS MATERIALIZED (
         |  SELECT w, cnt,
         |    replace(seq, ' ' || (SELECT pair FROM p$k) || ' ',
         |      ' ' || (SELECT replace(pair, ' ', '') FROM p$k) || ' ') AS seq
         |  FROM w${k - 1}
         |)""".stripMargin
    }.mkString(", ")
    s"""w0 AS MATERIALIZED (
       |  SELECT w, CAST(count(*) AS BIGINT) AS cnt,
       |    ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS seq
       |  FROM (SELECT unnest($DuckToks) AS w FROM documents) GROUP BY w
       |), $rounds""".stripMargin
  }

  def bpeEncodeOracleSql(merges: Int): String =
    s"""WITH ${bpeGreedyCtes(merges)}
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(len(string_split(trim(seq), ' '))) AS BIGINT) AS n_bpe
       |FROM (SELECT doc_id, unnest($DuckToks) AS w FROM documents) d
       |JOIN w$merges USING (w)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** The `text_bpe_tokenize` oracle: the same unrolled training chain,
    * then every word's final segmentation EXPLODED with word and piece
    * ordinals, each piece mapped to its artifact-induced id (single
    * chars by alphabet position, merge outputs by `36 + rank`, MIN rank
    * when a duplicate listing re-creates a string), and the per-doc id
    * SEQUENCE pinned through scalar columns: the order-weighted
    * checksum `Σ id × position` plus the first ten ids verbatim. */
  /** The tokenize CTE chain shared by the tokenize / pack-tokens
    * oracles: training ([[bpeGreedyCtes]]) + the merge-output vocabulary
    * with MIN-rank ids + per-piece ids, ending with `g`
    * (doc_id, id, gp — the in-doc 1-based position). */
  private def bpeTokenizeCtes(merges: Int): String = {
    val mergeIds = (1 to merges).map(k =>
      s"SELECT (SELECT replace(pair, ' ', '') FROM p$k) AS sym, " +
        s"${35 + k} AS id").mkString(" UNION ALL ")
    s"""${bpeGreedyCtes(merges)}, mvocab AS (
       |  SELECT sym, MIN(id) AS id FROM ($mergeIds) GROUP BY sym
       |), wp AS (
       |  SELECT doc_id, u.wi AS wi, u.w AS w FROM (
       |    SELECT doc_id, unnest([{'wi': i, 'w': toks[i]}
       |      for i in generate_series(1, len(toks))]) AS u
       |    FROM (SELECT doc_id, $DuckToks AS toks FROM documents)
       |  )
       |), pc AS (
       |  SELECT doc_id, wi, v.pi AS pi, v.piece AS piece FROM (
       |    SELECT doc_id, wi, unnest([{'pi': j, 'piece': ps[j]}
       |      for j in generate_series(1, len(ps))]) AS v
       |    FROM (SELECT doc_id, wi, string_split(trim(seq), ' ') AS ps
       |          FROM wp JOIN w$merges USING (w))
       |  )
       |), pids AS (
       |  SELECT p.doc_id, p.wi, p.pi,
       |    CASE WHEN len(p.piece) = 1
       |      THEN strpos('0123456789abcdefghijklmnopqrstuvwxyz',
       |        p.piece) - 1
       |      ELSE mv.id END AS id
       |  FROM pc p LEFT JOIN mvocab mv ON mv.sym = p.piece
       |), g AS (
       |  SELECT doc_id, id,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY wi, pi) AS gp
       |  FROM pids
       |)""".stripMargin
  }

  def bpeTokenizeOracleSql(merges: Int): String =
    s"""WITH ${bpeTokenizeCtes(merges)}
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bpe,
       |  CAST(sum(CAST(id AS BIGINT) * gp) AS BIGINT) AS ids_sum,
       |  array_to_string(list(id ORDER BY gp)[1:10], '-') AS ids_head
       |FROM g GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** The `text_pack_tokens` oracle: per-id GLOBAL positions (the
    * bucketed offset cumsum of [[bpeTokenizeCtes]]' per-doc counts, plus
    * the in-doc position) assign every token to its context window;
    * per-window scalars pin the materialized ids — count, distinct
    * docs, the order-weighted checksum, and both edge ids (arg_min/max
    * by global position). DuckDB explodes per TOKEN where the engine
    * ships per-span array slices — same windows, different scale
    * shape, which is the point of the oracle. */
  def bpePackTokensOracleSql(merges: Int, contextLen: Int,
      buckets: Int): String =
    s"""WITH ${bpeTokenizeCtes(merges)}, dn AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n
       |  FROM g GROUP BY doc_id
       |), off AS (
       |  SELECT doc_id, doc_id % $buckets AS bucket, n,
       |    CAST(coalesce(sum(n) OVER (PARTITION BY doc_id % $buckets
       |      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
       |      AND 1 PRECEDING), 0) AS BIGINT) AS off
       |  FROM dn
       |), tok AS (
       |  SELECT o.bucket,
       |    CAST((o.off + g.gp - 1) // $contextLen AS BIGINT) AS pack,
       |    o.off + g.gp - 1 AS gpos, g.id, g.doc_id
       |  FROM g JOIN off o USING (doc_id)
       |), wp2 AS (
       |  SELECT bucket, pack, doc_id, id, gpos,
       |    row_number() OVER (PARTITION BY bucket, pack
       |      ORDER BY gpos) AS pp
       |  FROM tok
       |)
       |SELECT bucket, pack, CAST(count(*) AS BIGINT) AS n_tokens,
       |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |  CAST(sum(CAST(id AS BIGINT) * pp) AS BIGINT) AS ids_sum,
       |  CAST(arg_min(id, gpos) AS BIGINT) AS id_first,
       |  CAST(arg_max(id, gpos) AS BIGINT) AS id_last
       |FROM wp2 GROUP BY bucket, pack ORDER BY bucket, pack""".stripMargin

  /** The `text_bpe_encode_batch` oracle: [[Text.bpeTrainBatch]]'s
    * round-at-a-time learning unrolled — round r ranks the bigram
    * candidates of segmentation w(r-1) (count desc, pair asc, top
    * `cands`), keeps those sharing no symbol with ANY higher-ranked
    * candidate (the rank-window rule — expressible as this NOT EXISTS,
    * which is exactly why the Spark side uses it), takes the first
    * `k` survivors, and applies them via k null-guarded replaces
    * (chr(1) never occurs in a symbol, so an absent slot no-ops).
    * Selected pairs are symbol-disjoint, so the replace order within a
    * round cannot matter. */
  def bpeBatchEncodeOracleSql(rounds: Int, k: Int,
      cands: Int): String =
    s"""WITH ${bpeBatchCtes(rounds, k, cands)}
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(len(string_split(trim(seq), ' '))) AS BIGINT) AS n_bpe
       |FROM (SELECT doc_id, unnest($DuckToks) AS w FROM documents) d
       |JOIN w$rounds USING (w)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** `text_pack_bpe`: the packing arithmetic of `text_pack` fed by the
    * REAL tokenizer's per-doc counts — the batch-trained merge chain's
    * n_bpe replaces the whitespace proxy, so every pack boundary sits at
    * the token budget a training job actually loads. */
  def bpePackOracleSql(rounds: Int, k: Int, cands: Int,
      contextLen: Int, buckets: Int): String =
    s"""WITH ${bpeBatchCtes(rounds, k, cands)}, enc AS (
       |  SELECT doc_id,
       |    CAST(sum(len(string_split(trim(seq), ' '))) AS BIGINT) AS n_bpe
       |  FROM (SELECT doc_id, unnest($DuckToks) AS w FROM documents) d
       |  JOIN w$rounds USING (w)
       |  GROUP BY doc_id
       |), o AS (
       |  SELECT doc_id, doc_id % $buckets AS bucket, n_bpe AS n_tokens,
       |    CAST(coalesce(sum(n_bpe) OVER (
       |      PARTITION BY doc_id % $buckets ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS "offset"
       |  FROM enc
       |)
       |SELECT doc_id, bucket, n_tokens, "offset",
       |  "offset" // $contextLen AS pack_first,
       |  CASE WHEN n_tokens > 0 THEN ("offset" + n_tokens - 1) // $contextLen
       |       ELSE "offset" // $contextLen END AS pack_last
       |FROM o ORDER BY doc_id""".stripMargin

  def bpeBatchCtes(rounds: Int, k: Int, cands: Int): String = {
    val roundSql = (1 to rounds).map { r =>
      val applied = (1 to k).foldLeft("seq") { (acc, i) =>
        s"replace($acc, ' ' || coalesce((SELECT pair FROM sel$r " +
          s"WHERE sn = $i), chr(1)) || ' ', ' ' || " +
          s"coalesce((SELECT replace(pair, ' ', '') FROM sel$r " +
          s"WHERE sn = $i), chr(1)) || ' ')"
      }
      s"""cand$r AS MATERIALIZED (
         |  SELECT bg AS pair, row_number() OVER (ORDER BY c DESC, bg) AS rn
         |  FROM (
         |    SELECT bg, sum(cnt) AS c FROM (
         |      SELECT cnt, unnest([syms[i] || ' ' || syms[i+1]
         |        for i in generate_series(1, greatest(len(syms)-1, 0))]) AS bg
         |      FROM (SELECT cnt, string_split(trim(seq), ' ') AS syms
         |            FROM w${r - 1})
         |    ) GROUP BY bg ORDER BY c DESC, bg LIMIT $cands
         |  )
         |), sel$r AS MATERIALIZED (
         |  SELECT pair, row_number() OVER (ORDER BY rn) AS sn
         |  FROM cand$r a
         |  WHERE NOT EXISTS (
         |    SELECT 1 FROM cand$r b
         |    WHERE b.rn < a.rn AND len(list_intersect(
         |      string_split(a.pair, ' '), string_split(b.pair, ' '))) > 0)
         |  ORDER BY rn LIMIT $k
         |), w$r AS MATERIALIZED (
         |  SELECT w, cnt, $applied AS seq FROM w${r - 1}
         |)""".stripMargin
    }.mkString(", ")
    s"""w0 AS MATERIALIZED (
       |  SELECT w, CAST(count(*) AS BIGINT) AS cnt,
       |    ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS seq
       |  FROM (SELECT unnest($DuckToks) AS w FROM documents) GROUP BY w
       |), $roundSql""".stripMargin
  }

  /** Shared CTE chain of the trainPrep oracles (`pipeline_train_prep`,
    * `pipeline_funnel_prep`): scrub → curate chain → decontamination →
    * budget mix, terminating in `mx` — one definition so the end-to-end
    * value oracle and the funnel audit cannot drift. */
  def trainPrepCtesSql: String =
    s"""scr AS (
       |  SELECT doc_id, ${duckScrubSql("text")} AS text
       |  FROM documents WHERE doc_id % 97 <> 0
       |), ${curateCtesSql("scr")}, cur AS (
       |  SELECT doc_id, text, lang_pred, n_tokens FROM ex
       |  WHERE doc_id NOT IN (SELECT id2 FROM drops)
       |), escr AS (
       |  SELECT doc_id, ${duckScrubSql("text")} AS text
       |  FROM documents WHERE doc_id % 97 = 0
       |), et AS (
       |  SELECT doc_id, $DuckToks AS toks FROM escr
       |), esh AS (
       |  SELECT doc_id, list_distinct(
       |    [array_to_string(toks[i:i+2], ' ')
       |     for i in generate_series(1, greatest(len(toks)-2, 0))]) AS sh
       |  FROM et
       |), ev AS (
       |  SELECT DISTINCT unnest(sh) AS tok FROM esh
       |), ct AS (
       |  SELECT doc_id, $DuckToks AS toks FROM cur
       |), csh AS (
       |  SELECT doc_id, list_distinct(
       |    [array_to_string(toks[i:i+2], ' ')
       |     for i in generate_series(1, greatest(len(toks)-2, 0))]) AS sh
       |  FROM ct
       |), contam AS (
       |  SELECT DISTINCT doc_id
       |  FROM (SELECT doc_id, unnest(sh) AS tok FROM csh) JOIN ev USING (tok)
       |), cln AS (
       |  SELECT * FROM cur WHERE doc_id NOT IN (SELECT doc_id FROM contam)
       |), mx0 AS (
       |  SELECT doc_id, lang_pred, n_tokens,
       |    CAST(sum(n_tokens) OVER (PARTITION BY lang_pred
       |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens,
       |    CASE lang_pred WHEN 'en' THEN 2000 WHEN 'de' THEN 600
       |                   WHEN 'es' THEN 600 WHEN 'fr' THEN 500
       |                   ELSE 0 END AS b
       |  FROM cln
       |), mx AS (
       |  SELECT doc_id, lang_pred, n_tokens, cum_tokens FROM mx0
       |  WHERE b > 0 AND cum_tokens <= b
       |)""".stripMargin

  /** Shared CTE prefix of the BM25 oracles (`retrieval_bm25`,
    * `retrieval_bm25_stored`, `stream_bm25` via sharing, and the sparse
    * leg of `retrieval_hybrid_rrf`): the full index build + engine-exact
    * rational-idf scoring, ranked per query and cut at `topK` in the
    * terminal CTE `bm25r` — one definition so the rankers cannot drift. */
  def bm25RankedCtes(topK: Int): String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest($DuckToks) AS tok FROM documents
       |), tf AS (
       |  SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2
       |), dl AS (
       |  SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1
       |), stats AS (
       |  SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS t FROM dl
       |), dfs AS (
       |  SELECT tok, count(*) AS df FROM tf GROUP BY 1
       |), q AS (
       |  SELECT * FROM (VALUES (1, 'fast vector scan'),
       |    (2, 'stream window agg'), (3, 'customer join query'))
       |    AS v(query_id, text)
       |), qt AS (
       |  SELECT DISTINCT query_id, unnest($DuckToks) AS tok FROM q
       |), scored AS (
       |  SELECT qt.query_id, tf.doc_id,
       |    CAST(
       |      CAST((1048576 * (s.n - dfs.df + 1)) // (dfs.df + 1)
       |        AS HUGEINT) * 22 * s.t * tf.tf
       |      // CAST(10 * s.t * tf.tf + 3 * s.t + 9 * dl.dl * s.n
       |        AS HUGEINT)
       |      AS BIGINT) AS sc
       |  FROM qt
       |  JOIN dfs USING (tok) JOIN tf USING (tok)
       |  JOIN dl ON dl.doc_id = tf.doc_id, stats s
       |), agg AS (
       |  SELECT query_id, doc_id, CAST(sum(sc) AS BIGINT) AS score,
       |    count(*) AS n_terms
       |  FROM scored GROUP BY 1, 2
       |), bm25r AS (
       |  SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score,
       |    n_terms, rank
       |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, doc_id) AS rank FROM agg)
       |  WHERE rank <= $topK
       |)""".stripMargin

  /** Shared CTE prefix of the epoch-plan oracles (`mix_epochs`,
    * `mix_schedule`): tokenized docs with per-language budgets, domain
    * totals, integer-division full epochs, md5-order cumulative sums and
    * the remainder — one definition so the two oracles cannot drift. */
  def DuckEpochPlanCtes: String =
    s"""d AS (
       |  SELECT doc_id, lang,
       |         CAST(len($DuckToks) AS BIGINT) AS n_tokens,
       |         md5(CAST(doc_id AS VARCHAR)) AS key,
       |         CASE lang WHEN 'en' THEN 30000 WHEN 'de' THEN 1000
       |                   WHEN 'fr' THEN 800 ELSE 0 END AS bb
       |  FROM documents
       |), f AS (
       |  SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS t
       |  FROM d WHERE bb > 0 GROUP BY lang
       |), e AS (
       |  SELECT lang, t,
       |    CASE WHEN t > 0 THEN CAST((SELECT max(bb) FROM d x
       |      WHERE x.lang = f.lang) // t AS BIGINT)
       |         ELSE CAST(0 AS BIGINT) END AS full_epochs
       |  FROM f
       |), c AS (
       |  SELECT doc_id, d.lang, n_tokens,
       |         CAST(sum(n_tokens) OVER (PARTITION BY d.lang
       |           ORDER BY key, doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |           AS BIGINT) AS cum_tokens,
       |         bb, e.full_epochs, bb - e.full_epochs * e.t AS rem
       |  FROM d JOIN e ON d.lang = e.lang
       |  WHERE bb > 0
       |)""".stripMargin

  /** DuckDB-side PII scrub (must mirror [[Text.scrubPii]]). */
  def duckScrubSql(textExpr: String): String =
    s"""regexp_replace(regexp_replace($textExpr,
       |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
       |      '\\+[0-9][0-9 -]{6,}[0-9]', '<PHONE>', 'g')""".stripMargin

  /** The curate oracle's CTE chain (feat → … → drops), parameterized on the
    * source relation (must expose doc_id, text) so compositions
    * (pipeline_train_prep) reuse it over a pre-scrubbed/filtered source.
    * Survivors = `SELECT … FROM ex WHERE doc_id NOT IN (SELECT id2 FROM
    * drops)`. */
  def curateCtesSql(src: String): String =
    s"""feat AS (
       |  SELECT doc_id, text, CAST(len($DuckToks) AS BIGINT) AS n_tokens,
       |    ${langScoreSql(Text.StopwordsDe)} AS s_de,
       |    ${langScoreSql(Text.StopwordsEn)} AS s_en,
       |    ${langScoreSql(Text.StopwordsEs)} AS s_es,
       |    ${langScoreSql(Text.StopwordsFr)} AS s_fr
       |  FROM $src
       |), kept AS (
       |  SELECT doc_id, text, n_tokens, $langCaseSql AS lang_pred
       |  FROM feat WHERE n_tokens BETWEEN 20 AND 70
       |), fp AS (
       |  SELECT *, md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS f
       |  FROM kept
       |), ex AS (
       |  SELECT * FROM fp
       |  WHERE doc_id IN (SELECT min(doc_id) FROM fp GROUP BY f)
       |), t2 AS (
       |  SELECT doc_id, $DuckToks AS toks FROM ex
       |), sh AS (
       |  SELECT doc_id, list_distinct(
       |    [array_to_string(toks[i:i+2], ' ')
       |     for i in generate_series(1, greatest(len(toks)-2, 0))]) AS s
       |  FROM t2
       |), e0 AS (
       |  SELECT doc_id, unnest(s) AS tok FROM sh
       |), stop AS (
       |  SELECT tok FROM e0 GROUP BY tok HAVING count(*) >
       |    greatest(20, ((SELECT count(*) FROM ex) * 5) // 1000)
       |), e AS (
       |  SELECT doc_id, count(*) OVER (PARTITION BY doc_id) AS n, tok
       |  FROM e0 WHERE tok NOT IN (SELECT tok FROM stop)
       |), p AS (
       |  SELECT a.doc_id AS id1, b.doc_id AS id2, a.n AS n1, b.n AS n2,
       |         count(*) AS shared
       |  FROM e a JOIN e b ON a.tok = b.tok AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2, 3, 4
       |), drops AS (
       |  SELECT DISTINCT id2 FROM p
       |  WHERE CAST(shared AS DOUBLE) / (n1 + n2 - shared) >= 0.3
       |)""".stripMargin

  /** The exact shingle-Jaccard pair query (mirrors [[Dedup.jaccardPairs]]
    * incl. the corpus-relative df cap), WITHOUT an ORDER BY so it can serve
    * both as the `dedup_jaccard_pairs` oracle and as the edge-list CTE of
    * the `dedup_clusters` transitive closure. */
  /** Shared CTE prefix (shingles → df-cap → shared-count pair table `p`)
    * of the jaccard and containment oracles — one definition so the two
    * cannot drift. */
  def SharedPairsSqlPrefix =
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
       |), p AS (
       |  SELECT a.doc_id AS id1, b.doc_id AS id2, a.n AS n1, b.n AS n2,
       |         count(*) AS shared
       |  FROM e a JOIN e b ON a.tok = b.tok AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2, 3, 4
       |)""".stripMargin

  def JaccardPairsSqlCore =
    s"""$SharedPairsSqlPrefix
       |SELECT id1, id2, shared, n1, n2,
       |       CAST(shared AS DOUBLE) / (n1 + n2 - shared) AS jaccard
       |FROM p
       |WHERE CAST(shared AS DOUBLE) / (n1 + n2 - shared) >= 0.3""".stripMargin

  /** RHP plane `p` as a DuckDB double-literal array (exact round-trip:
    * components are dyadic rationals). */
  def planeSql(p: Int, dims: Int, seed: Int): String =
    (0 until dims).map(d =>
      java.lang.Double.toString(Similarity.planeComponent(p, d, seed)))
      .mkString("[", ", ", "]")

  /** RHP signature of `vExpr` (a DOUBLE[] expression) as DuckDB SQL —
    * mirrors [[Similarity.rhpSignature]] bit for bit: per plane, a
    * sequential dot product against the literal plane, sign → bit. */
  def sigSql(vExpr: String, numPlanes: Int, dims: Int, seed: Int): String =
    (0 until numPlanes).map(p =>
      s"(CASE WHEN list_dot_product($vExpr, ${planeSql(p, dims, seed)}) >= 0" +
        s" THEN ${1 << p} ELSE 0 END)")
      .mkString("(", " + ", ")")

  /** DuckDB cosine matching [[graft.functions.CosineSim]]'s fold order,
    * including its zero-norm guard (NULL, never NaN — NaN sorts above every
    * double in Spark, so it must not reach a ranking). */
  def cosSql(a: String, b: String): String =
    s"(CASE WHEN list_dot_product($a, $a) = 0 OR list_dot_product($b, $b) = 0" +
      s" THEN NULL ELSE list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * " +
      s"sqrt(list_dot_product($b, $b))) END)"
}
