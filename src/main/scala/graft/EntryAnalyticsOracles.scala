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

/** DuckDB oracle SQL for [[EntryAnalytics]]. */
private[graft] object EntryAnalyticsOracles {
  val oracles: Map[String, String] = Map(
    "ts_tolerance_join" ->
      """SELECT e.user_id, e.event_id AS err_id, epoch_ns(e.ts) AS err_ts,
        |  c.event_id AS clk_id, epoch_ns(c.ts) AS clk_ts,
        |  epoch_ns(c.ts) - epoch_ns(e.ts) AS delta_ns
        |FROM events e JOIN events c ON e.user_id = c.user_id
        | AND e.event_type = 'error' AND c.event_type = 'click'
        | AND abs(epoch_ns(c.ts) - epoch_ns(e.ts)) <= 3600000000000
        |ORDER BY e.user_id, err_id, clk_id""".stripMargin,
    "ts_path_trigrams" ->
      """WITH p AS (
        |  SELECT event_type AS s1,
        |    lead(event_type, 1) OVER w AS s2,
        |    lead(event_type, 2) OVER w AS s3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |)
        |SELECT s1, s2, s3, count(*) AS n FROM p WHERE s3 IS NOT NULL
        |GROUP BY 1, 2, 3 ORDER BY n DESC, s1, s2, s3 LIMIT 20""".stripMargin,
    // peeling unrolled: each round re-derives degrees over the previous
    // round's edge set and re-scopes it to the >= k survivors — rounds
    // past the fixpoint are identity, so 6 unrolled rounds cover any
    // converged-within-6 state (the Spark side fails loudly otherwise)
    "graph_kcore" -> {
      val k = 30
      val rounds = 6
      // AS MATERIALIZED is load-bearing: inlined, each round re-expands
      // the whole prior chain (4^rounds parquet scans — DuckDB runs out
      // of file handles before it runs out of patience)
      val head =
        """WITH pairs AS MATERIALIZED (
          |  SELECT DISTINCT least(o_custkey * 2, l_suppkey * 2 + 1) AS src,
          |                  greatest(o_custkey * 2, l_suppkey * 2 + 1) AS dst
          |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          |), e0 AS MATERIALIZED (SELECT src, dst FROM pairs)""".stripMargin
      val steps = (1 to rounds).map { i =>
        s""",
           |keep$i AS MATERIALIZED (SELECT node FROM (
           |  SELECT node, count(*) AS d FROM (
           |    SELECT src AS node FROM e${i - 1}
           |    UNION ALL SELECT dst FROM e${i - 1})
           |  GROUP BY 1) WHERE d >= $k),
           |e$i AS MATERIALIZED (SELECT e.src, e.dst FROM e${i - 1} e
           |  JOIN keep$i k1 ON e.src = k1.node
           |  JOIN keep$i k2 ON e.dst = k2.node)""".stripMargin
      }.mkString
      head + steps +
        s"""
           |SELECT node, count(*) AS deg FROM (
           |  SELECT src AS node FROM e$rounds
           |  UNION ALL SELECT dst FROM e$rounds)
           |GROUP BY 1 ORDER BY node""".stripMargin
    },
    // the oracle aggregates the RAW table at daily grain; the query answers
    // from the 1h rollup store — equality proves partial composition
    "rollup_store_daily" ->
      """SELECT (epoch_ns(ts) // 86400000000000) * 86400000000000
        |    AS bucket_ts,
        |  count(*) AS n,
        |  CAST(min(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_v,
        |  CAST(max(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_v,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
        |FROM events GROUP BY 1 ORDER BY bucket_ts""".stripMargin,
    // grain re-derived as a literal: span 30d / budget 40 → 18h raw →
    // 41 widened buckets → 19h (39 buckets); the widened serving bounds
    // cover the whole data span, so no filter
    "rollup_route" ->
      """SELECT (epoch_ns(ts) // 68400000000000) * 68400000000000
        |    AS bucket_ts,
        |  count(*) AS n,
        |  CAST(min(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_v,
        |  CAST(max(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_v,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
        |  CAST(68400000000000 AS BIGINT) AS grain_ns,
        |  'store' AS source
        |FROM events GROUP BY 1 ORDER BY bucket_ts""".stripMargin,
    // the tiered route CLAMPS to the stored 1h grain (2000 points would
    // demand ~22min buckets, but the pre-horizon samples exist only at
    // 1h) and stitches store+raw — the oracle is the NEVER-tiered table
    // at that grain, so equality proves completeness
    "rollup_route_tiered" ->
      """SELECT (epoch_ns(ts) // 3600000000000) * 3600000000000
        |    AS bucket_ts,
        |  count(*) AS n,
        |  CAST(min(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_v,
        |  CAST(max(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_v,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
        |  CAST(3600000000000 AS BIGINT) AS grain_ns,
        |  'stitched' AS source
        |FROM events GROUP BY 1 ORDER BY bucket_ts""".stripMargin,
    // with no raw table the month-long fine budget clamps to the daily
    // tier the range touches — the oracle is the raw table at that grain
    "rollup_route_mirror" ->
      """SELECT (epoch_ns(ts) // 86400000000000) * 86400000000000
        |    AS bucket_ts,
        |  count(*) AS n,
        |  CAST(min(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_v,
        |  CAST(max(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_v,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
        |  CAST(86400000000000 AS BIGINT) AS grain_ns,
        |  'stitched' AS source
        |FROM events GROUP BY 1 ORDER BY bucket_ts""".stripMargin,
    // over the cascade the fine budget clamps to the coarsest touched
    // tier (the 1d store) — the oracle is the never-tiered table at the
    // daily grain
    "rollup_cascade_route" ->
      """SELECT (epoch_ns(ts) // 86400000000000) * 86400000000000
        |    AS bucket_ts,
        |  count(*) AS n,
        |  CAST(min(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_v,
        |  CAST(max(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_v,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
        |  CAST(86400000000000 AS BIGINT) AS grain_ns,
        |  'stitched' AS source
        |FROM events GROUP BY 1 ORDER BY bucket_ts""".stripMargin,
    // the keyed (dimensional) store: per-series daily stats — the oracle
    // groups the raw table by the same key, so equality proves the keyed
    // partials compose exactly per series
    "rollup_keyed_daily" ->
      """SELECT event_type,
        |  (epoch_ns(ts) // 86400000000000) * 86400000000000 AS bucket_ts,
        |  count(*) AS n,
        |  CAST(min(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_v,
        |  CAST(max(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_v,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
        |FROM events GROUP BY 1, 2
        |ORDER BY event_type, bucket_ts""".stripMargin,
    // the variance recording rule: the store's (n, Σv, Σv²) stitched
    // across the tier boundary equal the direct per-(series, day) pass —
    // var_num is the exact integer-valued rational both engines compute
    // in decimal before one double cast
    "rollup_store_stddev" ->
      """WITH e AS (
        |  SELECT event_type, epoch_ns(ts) AS ts,
        |    CAST(value AS DECIMAL(18,2)) AS v
        |  FROM events
        |)
        |SELECT event_type,
        |  (ts // 86400000000000) * 86400000000000 AS bucket_ts,
        |  count(*) AS n,
        |  CAST(count(*) * sum(v*v) - sum(v)*sum(v) AS DOUBLE) AS var_num
        |FROM e GROUP BY 1, 2
        |ORDER BY event_type, bucket_ts""".stripMargin,
    // the keyed router: same 19h grain derivation as rollup_route (the
    // budget is on the time axis), grouped by the store's key
    "rollup_keyed_route" ->
      """SELECT event_type,
        |  (epoch_ns(ts) // 68400000000000) * 68400000000000 AS bucket_ts,
        |  count(*) AS n,
        |  CAST(min(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_v,
        |  CAST(max(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_v,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
        |  CAST(68400000000000 AS BIGINT) AS grain_ns,
        |  'store' AS source
        |FROM events GROUP BY 1, 2
        |ORDER BY event_type, bucket_ts""".stripMargin,
    // one series zoomed: the key predicate pushed into the router — the
    // oracle is the same 19h grain over the FILTERED raw table
    "rollup_keyed_route_one" ->
      """SELECT event_type,
        |  (epoch_ns(ts) // 68400000000000) * 68400000000000 AS bucket_ts,
        |  count(*) AS n,
        |  CAST(min(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_v,
        |  CAST(max(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_v,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
        |  CAST(68400000000000 AS BIGINT) AS grain_ns,
        |  'store' AS source
        |FROM events WHERE event_type = 'click' GROUP BY 1, 2
        |ORDER BY bucket_ts""".stripMargin,
    // n value-oracled per series; the per-key sketch estimate gated by
    // the rank-error bound (rollup_store_users's convention)
    "rollup_keyed_users" ->
      """SELECT event_type,
        |  (epoch_ns(ts) // 86400000000000) * 86400000000000 AS bucket_ts,
        |  count(*) AS n, CAST(1 AS BIGINT) AS hll_ok
        |FROM events GROUP BY 1, 2
        |ORDER BY event_type, bucket_ts""".stripMargin,
    // n value-oracled from raw; the sketch equality is JVM-side (DuckDB
    // has no DataSketches HLL) — the sketch-store gate convention
    "rollup_store_users" ->
      """SELECT (epoch_ns(ts) // 86400000000000) * 86400000000000
        |    AS bucket_ts,
        |  count(*) AS n, CAST(1 AS BIGINT) AS hll_ok
        |FROM events GROUP BY 1 ORDER BY bucket_ts""".stripMargin,
    // the per-day mirror of ts_histogram_quantile's arithmetic, computed
    // directly over raw — equality proves the stored hourly counter
    // arrays compose exactly to the daily histogram
    "rollup_store_p90" -> {
      val bounds = "[500, 1000, 2500, 5000, 10000, 25000]::BIGINT[]"
      val day = 86400L * 1000000000L
      s"""WITH v AS (
         |  SELECT (epoch_ns(ts) // $day) * $day AS bucket_ts,
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
         |  FROM events
         |), b AS (
         |  SELECT bucket_ts,
         |    coalesce(list_min(list_filter($bounds, x -> x >= cents)),
         |      9223372036854775807) AS le
         |  FROM v WHERE cents IS NOT NULL
         |), c AS (
         |  SELECT bucket_ts, le, count(*) AS cnt FROM b GROUP BY 1, 2
         |), w AS (
         |  SELECT bucket_ts, le, cnt,
         |    sum(cnt) OVER (PARTITION BY bucket_ts ORDER BY le) AS cum,
         |    coalesce(list_max(list_filter($bounds, x -> x < le)),
         |      CAST(0 AS BIGINT)) AS prev_le,
         |    sum(cnt) OVER (PARTITION BY bucket_ts) AS total
         |  FROM c
         |), f AS (
         |  SELECT *, row_number() OVER (PARTITION BY bucket_ts ORDER BY le)
         |    AS rn
         |  FROM w WHERE cum * 100 >= total * 90
         |)
         |SELECT bucket_ts, CAST(total AS BIGINT) AS n,
         |  CAST(CASE WHEN le = 9223372036854775807 THEN 25000
         |       ELSE prev_le + ((le - prev_le) *
         |         (90 * total - 100 * (cum - cnt))) // (100 * cnt)
         |  END AS BIGINT) AS q_cents
         |FROM f WHERE rn = 1 ORDER BY bucket_ts""".stripMargin
    },
    // mirrors histogramQuantile's integer fixed point exactly: same bucket
    // assignment off the literal schedule, same cross-multiplied rank
    // comparison, same floor-divided interpolation
    "ts_histogram_quantile" -> {
      val bounds = "[500, 1000, 2500, 5000, 10000, 25000]::BIGINT[]"
      s"""WITH v AS (
         |  SELECT event_type,
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
         |  FROM events
         |), b AS (
         |  SELECT event_type,
         |    coalesce(list_min(list_filter($bounds, x -> x >= cents)),
         |      9223372036854775807) AS le
         |  FROM v WHERE cents IS NOT NULL
         |), c AS (
         |  SELECT event_type, le, count(*) AS cnt FROM b GROUP BY 1, 2
         |), w AS (
         |  SELECT event_type, le, cnt,
         |    sum(cnt) OVER (PARTITION BY event_type ORDER BY le) AS cum,
         |    coalesce(list_max(list_filter($bounds, x -> x < le)),
         |      CAST(0 AS BIGINT)) AS prev_le,
         |    sum(cnt) OVER (PARTITION BY event_type) AS total
         |  FROM c
         |), f AS (
         |  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY le)
         |    AS rn
         |  FROM w WHERE cum * 100 >= total * 90
         |)
         |SELECT event_type, CAST(total AS BIGINT) AS n,
         |  CAST(CASE WHEN le = 9223372036854775807 THEN 25000
         |       ELSE prev_le + ((le - prev_le) *
         |         (90 * total - 100 * (cum - cnt))) // (100 * cnt)
         |  END AS BIGINT) AS q_cents
         |FROM f WHERE rn = 1 ORDER BY event_type""".stripMargin
    },
    // the LTTB walk re-derived relationally: a transition table holds, for
    // every (bucket, possible previous choice), the argmax-area point —
    // then a recursive CTE walks the actual choice chain. Every floor
    // division, tie-break, and the first/last-bucket rules mirror
    // RecurrenceOps.lttb exactly (HUGEINT clears the avg division by
    // multiplying through by the next bucket's count)
    "ts_lttb" ->
      """WITH RECURSIVE pts AS (
        |  SELECT user_id % 64 AS sid, epoch_ns(ts) AS ts, event_id AS id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM events
        |), base AS (
        |  SELECT sid, ts, id, c,
        |    (ts - min(ts) OVER (PARTITION BY sid)) // 1000000000 AS rel,
        |    ts // 21600000000000 AS b
        |  FROM pts
        |), anch AS (
        |  SELECT sid, ts, id, c, rel, b FROM (
        |    SELECT *, row_number() OVER (PARTITION BY sid ORDER BY ts, id)
        |      AS rn FROM base) WHERE rn = 1
        |), beyond AS (
        |  SELECT p.sid, p.ts, p.id, p.c, p.rel, p.b,
        |    dense_rank() OVER (PARTITION BY p.sid ORDER BY p.b) AS bi
        |  FROM base p JOIN anch a ON p.sid = a.sid AND p.b > a.b
        |), mm AS (SELECT sid, max(bi) AS m FROM beyond GROUP BY sid),
        |avgs AS (
        |  SELECT sid, bi, count(*) AS n, sum(rel) AS sx, sum(c) AS sy
        |  FROM beyond GROUP BY 1, 2
        |), t1 AS (
        |  SELECT sid, ts, id, c FROM (
        |    SELECT p.sid, p.ts, p.id, p.c,
        |      row_number() OVER (PARTITION BY p.sid ORDER BY
        |        abs((CAST(a.rel AS HUGEINT) * v.n - v.sx) * (p.c - a.c)
        |          - CAST(a.rel - p.rel AS HUGEINT)
        |            * (v.sy - CAST(a.c AS HUGEINT) * v.n)) DESC,
        |        p.ts, p.id) AS rn
        |    FROM beyond p
        |    JOIN anch a ON a.sid = p.sid
        |    JOIN avgs v ON v.sid = p.sid AND v.bi = 2
        |    JOIN mm ON mm.sid = p.sid AND mm.m >= 2
        |    WHERE p.bi = 1
        |  ) WHERE rn = 1
        |), tj AS (
        |  SELECT sid, bi, prev_ts, prev_id, ts, id, c FROM (
        |    SELECT p.sid, p.bi, q.ts AS prev_ts, q.id AS prev_id,
        |      p.ts, p.id, p.c,
        |      row_number() OVER (PARTITION BY p.sid, p.bi, q.ts, q.id
        |        ORDER BY
        |        abs((CAST(q.rel AS HUGEINT) * v.n - v.sx) * (p.c - q.c)
        |          - CAST(q.rel - p.rel AS HUGEINT)
        |            * (v.sy - CAST(q.c AS HUGEINT) * v.n)) DESC,
        |        p.ts, p.id) AS rn
        |    FROM beyond p
        |    JOIN beyond q ON q.sid = p.sid AND q.bi = p.bi - 1
        |    JOIN avgs v ON v.sid = p.sid AND v.bi = p.bi + 1
        |    JOIN mm ON mm.sid = p.sid AND p.bi < mm.m
        |    WHERE p.bi >= 2
        |  ) WHERE rn = 1
        |), walk AS (
        |  SELECT sid, CAST(1 AS BIGINT) AS bi, ts, id, c FROM t1
        |  UNION ALL
        |  SELECT t.sid, w.bi + 1, t.ts, t.id, t.c
        |  FROM walk w JOIN tj t ON t.sid = w.sid AND t.bi = w.bi + 1
        |    AND t.prev_ts = w.ts AND t.prev_id = w.id
        |), lastp AS (
        |  SELECT sid, ts, id, c FROM (
        |    SELECT sid, ts, id, c, row_number() OVER (PARTITION BY sid
        |      ORDER BY ts DESC, id DESC) AS rn
        |    FROM base) WHERE rn = 1
        |)
        |SELECT DISTINCT sid, ts, id AS event_id, c AS cents FROM (
        |  SELECT sid, ts, id, c FROM anch
        |  UNION ALL SELECT sid, ts, id, c FROM walk
        |  UNION ALL SELECT sid, ts, id, c FROM lastp
        |) ORDER BY sid, ts, event_id""".stripMargin,
    // order-independent a<b<c three-join — counts the same triangles the
    // degree-ordered orientation does, via a structurally different plan,
    // so it validates the algorithm rather than mirroring it
    "graph_triangles" ->
      """WITH pairs AS (
        |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |), nn AS (
        |  SELECT count(DISTINCT node) AS n_nodes FROM (
        |    SELECT src AS node FROM pairs UNION ALL SELECT dst FROM pairs)
        |), m AS (SELECT count(*) AS n_edges FROM pairs),
        |tri AS (
        |  SELECT count(*) AS n_triangles
        |  FROM pairs e1
        |  JOIN pairs e2 ON e1.dst = e2.src
        |  JOIN pairs e3 ON e3.src = e1.src AND e3.dst = e2.dst
        |)
        |SELECT nn.n_nodes, m.n_edges, tri.n_triangles
        |FROM nn, m, tri""".stripMargin,
    "agg_downsample_1h" ->
      s"""SELECT (epoch_ns(ts) // $BucketH) * $BucketH AS bucket_ts,
         |  count(*) AS n, min(value) AS min_v, max(value) AS max_v,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
         |FROM events GROUP BY 1 ORDER BY bucket_ts""".stripMargin,
    "agg_downsample_gapfill" -> {
      val day = 86400L * 1000000000L
      s"""WITH buckets AS (
         |  SELECT generate_series AS bucket_ts
         |  FROM generate_series(${ns("2023-12-25")}, ${ns("2024-02-05") - 1}, $day)
         |), a AS (
         |  SELECT (epoch_ns(ts) // $day) * $day AS bucket_ts,
         |    count(*) AS n, min(value) AS min_v, max(value) AS max_v,
         |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
         |  FROM events GROUP BY 1
         |)
         |SELECT b.bucket_ts, coalesce(a.n, 0) AS n, a.min_v, a.max_v, a.sum_v
         |FROM buckets b LEFT JOIN a ON a.bucket_ts = b.bucket_ts
         |ORDER BY b.bucket_ts""".stripMargin
    },
    "agg_hopping_24h_6h" ->
      """WITH w AS (
        |  SELECT unnest(range(
        |      (epoch_ns(ts) // 21600000000000 - 3) * 21600000000000,
        |      (epoch_ns(ts) // 21600000000000) * 21600000000000 + 1,
        |      21600000000000)) AS window_start,
        |    value
        |  FROM events
        |)
        |SELECT window_start, count(*) AS n, min(value) AS min_v,
        |  max(value) AS max_v
        |FROM w GROUP BY window_start ORDER BY window_start""".stripMargin,
    "ts_retention" ->
      """WITH a AS (
        |  SELECT DISTINCT user_id,
        |    epoch_ns(ts) // 86400000000000 AS day
        |  FROM events
        |), c AS (
        |  SELECT user_id, min(day) AS cohort_day FROM a GROUP BY user_id
        |)
        |SELECT cohort_day, day - cohort_day AS day_offset,
        |  CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
        |FROM a JOIN c USING (user_id)
        |GROUP BY cohort_day, day_offset
        |ORDER BY cohort_day, day_offset""".stripMargin,
    "ts_interval_join" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) AS ts, event_type, value FROM events
        |), s AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > 3600000000000 THEN 1
        |         ELSE 0 END AS is_new
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), c AS (
        |  SELECT user_id, ts,
        |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        |  FROM s
        |), g AS (
        |  SELECT user_id, session_idx, min(ts) AS session_start,
        |         max(ts) AS session_end
        |  FROM c GROUP BY user_id, session_idx
        |)
        |SELECT g.user_id, g.session_idx, count(*) AS n_purchases,
        |  CAST(sum(CAST(p.value AS DECIMAL(18,2))) AS DOUBLE) AS purchase_value
        |FROM g JOIN e p ON p.user_id = g.user_id
        |  AND p.ts BETWEEN g.session_start AND g.session_end
        |WHERE p.event_type = 'purchase'
        |GROUP BY g.user_id, g.session_idx
        |ORDER BY g.user_id, g.session_idx""".stripMargin,
    "ts_heatmap" ->
      """SELECT ((epoch_ns(ts) // 86400000000000) + 4) % 7 AS dow,
        |  (epoch_ns(ts) % 86400000000000) // 3600000000000 AS hour,
        |  count(*) AS n
        |FROM events GROUP BY dow, hour ORDER BY dow, hour""".stripMargin,
    "ts_concurrency" -> {
      val hour = 3600L * 1000000000L
      s"""WITH e AS (
         |  SELECT user_id, epoch_ns(ts) AS ts FROM events
         |), s AS (
         |  SELECT user_id, ts,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |           OR ts - lag(ts) OVER w > $hour THEN 1
         |         ELSE 0 END AS is_new
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
         |), c AS (
         |  SELECT user_id, ts,
         |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
         |  FROM s
         |), g AS (
         |  SELECT min(ts) AS s, max(ts) AS e
         |  FROM c GROUP BY user_id, session_idx
         |), grid AS (
         |  SELECT generate_series AS ts FROM generate_series(
         |    ${ns("2023-12-25")}, ${ns("2024-02-05") - 1}, $hour)
         |)
         |SELECT grid.ts, count(*) AS n_active
         |FROM grid JOIN g ON grid.ts BETWEEN g.s AND g.e
         |GROUP BY grid.ts ORDER BY grid.ts""".stripMargin
    },
    "agg_value_quantiles" ->
      """WITH c AS (
        |  SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL
        |)
        |SELECT event_type, count(*) AS n,
        |  quantile_cont(c, 0.25) AS p25,
        |  quantile_cont(c, 0.5) AS p50,
        |  quantile_cont(c, 0.75) AS p75
        |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin,
    "ts_event_features" ->
      """WITH e AS (
        |  SELECT event_id, epoch_ns(ts) AS ts, user_id, event_type
        |  FROM events
        |)
        |SELECT event_id, ts, user_id, event_type,
        |  CAST(row_number() OVER w AS BIGINT) AS seq_idx,
        |  lag(event_type) OVER w AS prev_type,
        |  lead(event_type) OVER w AS next_type,
        |  ts - lag(ts) OVER w AS gap_prev,
        |  lead(ts) OVER w - ts AS gap_next
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,
    "ts_counter_increase" ->
      // same floor-mod day idiom as ts_seasonal_anomaly (DuckDB %//
      // truncate; the engine floors), same lag/tie total order as ts_gaps
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) AS ts, event_id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM events
        |), p AS (
        |  SELECT user_id, ts, c,
        |    lag(c) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev
        |  FROM e WHERE c IS NOT NULL
        |)
        |SELECT user_id,
        |  (ts - ((ts % 86400000000000) + 86400000000000) % 86400000000000)
        |    // 86400000000000 AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_deltas,
        |  CAST(sum(CASE WHEN c >= prev THEN c - prev ELSE c END)
        |    AS BIGINT) AS inc_cents,
        |  CAST(sum(CASE WHEN c < prev THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_resets
        |FROM p WHERE prev IS NOT NULL
        |GROUP BY 1, 2
        |ORDER BY user_id, bucket""".stripMargin,
    "ts_transitions" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) AS ts, event_id, event_type
        |  FROM events
        |), p AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS to_type
        |  FROM e
        |)
        |SELECT from_type, to_type, count(*) AS n
        |FROM p WHERE to_type IS NOT NULL
        |GROUP BY from_type, to_type
        |ORDER BY from_type, to_type""".stripMargin,
    "ts_gaps" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) AS ts FROM events),
        |g AS (
        |  SELECT user_id,
        |    ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS gap
        |  FROM e
        |)
        |SELECT user_id, count(*) AS n_gaps, min(gap) AS min_gap,
        |  max(gap) AS max_gap, CAST(sum(gap) AS BIGINT) AS sum_gap
        |FROM g WHERE gap IS NOT NULL GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    // stagewise min-aggregation mirror of the greedy funnel
    "ts_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(epoch_ns(ts)) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id
        |), s2 AS (
        |  SELECT e.user_id, min(epoch_ns(e.ts)) AS t2
        |  FROM events e JOIN s1 USING (user_id)
        |  WHERE event_type = 'click' AND epoch_ns(e.ts) > t1
        |    AND epoch_ns(e.ts) <= t1 + 604800000000000
        |  GROUP BY e.user_id
        |), s3 AS (
        |  SELECT e.user_id, min(epoch_ns(e.ts)) AS t3
        |  FROM events e JOIN s1 USING (user_id) JOIN s2 USING (user_id)
        |  WHERE event_type = 'purchase' AND epoch_ns(e.ts) > t2
        |    AND epoch_ns(e.ts) <= t1 + 604800000000000
        |  GROUP BY e.user_id
        |)
        |SELECT user_id, t1, t2, t3
        |FROM s1 JOIN s2 USING (user_id) JOIN s3 USING (user_id)
        |ORDER BY user_id""".stripMargin,
    "ts_mad_anomaly" ->
      """WITH c AS (
        |  SELECT event_id, epoch_ns(ts) AS ts, user_id, value,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM events
        |), m AS (
        |  SELECT user_id, count(c) AS n_pts,
        |    CAST(quantile_cont(c, 0.5) * 2 AS BIGINT) AS med2
        |  FROM c GROUP BY user_id
        |), d AS (
        |  SELECT c.event_id, c.ts, c.user_id, c.value, m.med2,
        |    abs(c.c * 2 - m.med2) AS dev2
        |  FROM c JOIN m ON c.user_id IS NOT DISTINCT FROM m.user_id
        |  WHERE m.n_pts >= 10
        |), md AS (
        |  SELECT user_id, CAST(quantile_cont(dev2, 0.5) * 2 AS BIGINT)
        |    AS mad4
        |  FROM d GROUP BY user_id
        |)
        |SELECT d.event_id, d.ts, d.user_id, d.value, d.med2, d.dev2,
        |  md.mad4
        |FROM d JOIN md ON d.user_id IS NOT DISTINCT FROM md.user_id
        |WHERE d.dev2 * 2 > 3 * md.mad4
        |ORDER BY d.event_id""".stripMargin,
    "ts_seasonal_anomaly" ->
      // DuckDB %/// truncate toward zero; the engine floors (pmod + div).
      // tod = floor-mod(ts, day) and (ts - tod)//day = floor-div make the
      // calendar cells engine-identical even for pre-1970 timestamps
      """WITH e0 AS (
        |  SELECT event_id, epoch_ns(ts) AS ts, value,
        |    ((epoch_ns(ts) % 86400000000000) + 86400000000000)
        |      % 86400000000000 AS tod,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM events
        |), e AS (
        |  SELECT event_id, ts, value, c,
        |    (((ts - tod) // 86400000000000 + 4) % 7 + 7) % 7 AS dow,
        |    tod // 3600000000000 AS hour
        |  FROM e0
        |), cells AS (
        |  SELECT dow, hour, count(c) AS cell_n,
        |    CAST(sum(c) AS BIGINT) AS s, CAST(sum(c*c) AS BIGINT) AS sq
        |  FROM e GROUP BY dow, hour HAVING count(c) >= 10
        |)
        |SELECT e.event_id, e.ts, e.dow, e.hour, cells.cell_n, e.value
        |FROM e JOIN cells USING (dow, hour)
        |WHERE CAST(cells.cell_n * e.c - cells.s AS HUGEINT)
        |        * (cells.cell_n * e.c - cells.s)
        |      > 4 * (CAST(cells.cell_n AS HUGEINT) * cells.sq
        |        - CAST(cells.s AS HUGEINT) * cells.s)
        |ORDER BY e.event_id""".stripMargin,
    "ts_paa_symbols" ->
      // floor-mod idiom: the engine's seg = ts - pmod(ts, m) floors, so
      // the oracle must too (DuckDB % truncates — divergent pre-1970)
      """WITH e AS (
        |  SELECT user_id,
        |    epoch_ns(ts) - ((epoch_ns(ts) % 21600000000000)
        |      + 21600000000000) % 21600000000000 AS seg,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM events
        |), segs AS (
        |  SELECT user_id, seg, count(c) AS seg_n,
        |    CAST(sum(c) AS BIGINT) AS seg_sum
        |  FROM e GROUP BY 1, 2 HAVING count(c) > 0
        |)
        |SELECT user_id, seg, seg_n, seg_sum,
        |  CAST(ntile(4) OVER (PARTITION BY user_id
        |    ORDER BY CAST(seg_sum AS DOUBLE) / seg_n, seg) AS BIGINT)
        |    AS symbol
        |FROM segs ORDER BY user_id, seg""".stripMargin,
    "ts_sax_words" ->
      """WITH e AS (
        |  SELECT user_id,
        |    epoch_ns(ts) - ((epoch_ns(ts) % 21600000000000)
        |      + 21600000000000) % 21600000000000 AS seg,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM events
        |), segs AS (
        |  SELECT user_id, seg, count(c) AS seg_n,
        |    CAST(sum(c) AS BIGINT) AS seg_sum
        |  FROM e GROUP BY 1, 2 HAVING count(c) > 0
        |), syms AS (
        |  SELECT user_id, seg,
        |    ntile(4) OVER (PARTITION BY user_id
        |      ORDER BY CAST(seg_sum AS DOUBLE) / seg_n, seg) AS symbol
        |  FROM segs
        |)
        |SELECT user_id,
        |  string_agg(chr(CAST(96 + symbol AS INTEGER)), ''
        |    ORDER BY seg) AS word,
        |  count(*) AS n_segments
        |FROM syms GROUP BY user_id ORDER BY user_id""".stripMargin,
    "ts_ewma" ->
      """WITH RECURSIVE base AS (
        |  SELECT user_id, epoch_ns(ts) AS ts, event_id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_ns(ts), event_id) AS rn
        |  FROM events
        |), rec AS (
        |  SELECT user_id, ts, event_id, cents, rn,
        |    cents * 16 AS ewma_num
        |  FROM base WHERE rn = 1
        |  UNION ALL
        |  -- floor-division idiom (DuckDB // truncates; engine floors):
        |  -- harmless on this non-negative data, load-bearing if a corpus
        |  -- ever carries negative values
        |  SELECT b.user_id, b.ts, b.event_id, b.cents, b.rn,
        |    r.ewma_num
        |      - (r.ewma_num - (((r.ewma_num % 16) + 16) % 16)) // 16
        |      + b.cents
        |  FROM rec r JOIN base b
        |    ON b.user_id = r.user_id AND b.rn = r.rn + 1
        |)
        |SELECT user_id, ts, event_id, cents, ewma_num,
        |  (ewma_num - (((ewma_num % 16) + 16) % 16)) // 16 AS ewma_cents
        |FROM rec ORDER BY user_id, ts, event_id""".stripMargin,
    "ts_holt" ->
      """WITH RECURSIVE base AS (
        |  SELECT user_id, epoch_ns(ts) AS ts, event_id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_ns(ts), event_id) AS rn
        |  FROM events
        |), rec AS (
        |  SELECT user_id, ts, event_id, cents, rn,
        |    cents * 1048576 AS l, CAST(0 AS BIGINT) AS b
        |  FROM base WHERE rn = 1
        |  UNION ALL
        |  -- DuckDB // truncates toward zero; the engine floors. With the
        |  -- divisor positive, floor(x/d) = (x - ((x % d) + d) % d) // d
        |  SELECT q.user_id, q.ts, q.event_id, q.cents, q.rn, q.l1,
        |    q.b0 + (q.l1 - q.drift
        |      - (((q.l1 - q.drift) % 16) + 16) % 16) // 16
        |  FROM (
        |    SELECT q0.*,
        |      q0.drift + (q0.d1 - (((q0.d1 % 8) + 8) % 8)) // 8 AS l1
        |    FROM (
        |      SELECT b2.user_id, b2.ts, b2.event_id, b2.cents, b2.rn,
        |        r.b AS b0, r.l + r.b AS drift,
        |        b2.cents * 1048576 - r.l - r.b AS d1
        |      FROM rec r JOIN base b2
        |        ON b2.user_id = r.user_id AND b2.rn = r.rn + 1) q0) q
        |)
        |SELECT user_id, ts, event_id, cents, l AS level_num, b AS trend_num,
        |  (l + b - (((l + b) % 1048576) + 1048576) % 1048576) // 1048576
        |    AS fc1_cents
        |FROM rec ORDER BY user_id, ts, event_id""".stripMargin,
    "ts_cusum" ->
      """WITH RECURSIVE base AS (
        |  SELECT user_id, epoch_ns(ts) AS ts, event_id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_ns(ts), event_id) AS rn
        |  FROM events
        |), rec AS (
        |  SELECT user_id, ts, event_id, cents, rn,
        |    greatest(0, cents - 5000 - 500) AS sp0,
        |    greatest(0, -(cents - 5000) - 500) AS sn0,
        |    CASE WHEN greatest(0, cents - 5000 - 500) > 20000
        |           OR greatest(0, -(cents - 5000) - 500) > 20000
        |         THEN 1 ELSE 0 END AS alarm
        |  FROM base WHERE rn = 1
        |  UNION ALL
        |  SELECT b.user_id, b.ts, b.event_id, b.cents, b.rn,
        |    greatest(0, CASE WHEN r.alarm = 1 THEN 0 ELSE r.sp0 END
        |      + (b.cents - 5000) - 500),
        |    greatest(0, CASE WHEN r.alarm = 1 THEN 0 ELSE r.sn0 END
        |      - (b.cents - 5000) - 500),
        |    CASE WHEN greatest(0, CASE WHEN r.alarm = 1 THEN 0 ELSE r.sp0
        |        END + (b.cents - 5000) - 500) > 20000
        |      OR greatest(0, CASE WHEN r.alarm = 1 THEN 0 ELSE r.sn0 END
        |        - (b.cents - 5000) - 500) > 20000
        |      THEN 1 ELSE 0 END
        |  FROM rec r JOIN base b
        |    ON b.user_id = r.user_id AND b.rn = r.rn + 1
        |)
        |SELECT user_id, ts, event_id, cents, sp0 AS s_pos, sn0 AS s_neg,
        |  CAST(alarm AS BIGINT) AS alarm
        |FROM rec ORDER BY user_id, ts, event_id""".stripMargin,
    "dedup_containment" ->
      s"""$SharedPairsSqlPrefix
         |SELECT id1, id2, shared, n1, n2,
         |       CAST(shared AS DOUBLE) / n1 AS c_ab,
         |       CAST(shared AS DOUBLE) / n2 AS c_ba
         |FROM p
         |WHERE greatest(CAST(shared AS DOUBLE) / n1,
         |               CAST(shared AS DOUBLE) / n2) >= 0.6
         |ORDER BY id1, id2""".stripMargin,
    // brute-force all-pairs — deliberately NOT the engine's candidate
    // scheme, so it independently validates SymSpell blocking recall
    // (the length-band prefilter is implied by ed <= 1, not a heuristic)
    "dedup_fuzzy_pairs" ->
      """WITH k AS (
        |  SELECT doc_id,
        |    substr(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'),
        |           1, 40) AS key
        |  FROM documents
        |)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(levenshtein(a.key, b.key) AS INTEGER) AS dist
        |FROM k a JOIN k b ON a.doc_id < b.doc_id
        |  AND abs(length(a.key) - length(b.key)) <= 1
        |WHERE levenshtein(a.key, b.key) <= 1
        |ORDER BY doc_a, doc_b""".stripMargin,
    "sketch_overlap" ->
      s"""WITH tok AS (
        |  SELECT DISTINCT lang, tok FROM (
        |    SELECT lang, unnest($DuckToks) AS tok FROM documents)
        |)
        |SELECT a.lang AS group_a, b.lang AS group_b,
        |  count(*) AS n_int, CAST(1 AS BIGINT) AS est_ok
        |FROM tok a JOIN tok b ON a.tok = b.tok AND a.lang < b.lang
        |GROUP BY 1, 2 ORDER BY group_a, group_b""".stripMargin,
    "graph_pagerank" -> {
      // the 3 supersteps unrolled as CTEs it1..it3 — recursive CTEs cannot
      // aggregate in the recursive term, so the fixed iteration count is
      // generated here (the Spark side loops the same constant)
      val s = 1073741824L // 2^30, matching GraphOps.pageRank scaleLog2=30
      val head =
        s"""WITH pairs AS (
           |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
           |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
           |), e AS (
           |  SELECT src, dst FROM pairs
           |  UNION ALL SELECT dst, src FROM pairs
           |), nodes AS (
           |  SELECT DISTINCT node FROM (
           |    SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
           |), nn AS (SELECT count(*) AS n FROM nodes),
           |deg AS (SELECT src, count(*) AS od FROM e GROUP BY 1),
           |it0 AS (
           |  SELECT node, $s // (SELECT n FROM nn) AS pr FROM nodes)""".stripMargin
      val steps = (1 to 3).map { i =>
        s"""it$i AS (
           |  SELECT n.node,
           |    (15 * CAST($s AS BIGINT)) // (100 * (SELECT n FROM nn)) +
           |      (85 * COALESCE(c.s, 0)) // 100 AS pr
           |  FROM nodes n LEFT JOIN (
           |    SELECT e.dst AS node, sum(p.pr // d.od) AS s
           |    FROM e JOIN it${i - 1} p ON p.node = e.src
           |    JOIN deg d ON d.src = e.src
           |    GROUP BY e.dst) c ON c.node = n.node)""".stripMargin
      }
      (head +: steps).mkString(",\n") +
        "\nSELECT node, CAST(pr AS BIGINT) AS pr FROM it3 ORDER BY node"
    },
    "zorder_scan" ->
      s"""SELECT event_id, epoch_ns(ts) AS ts, user_id, event_type, value
        |FROM events
        |WHERE user_id >= 100 AND user_id < 200
        |  AND epoch_ns(ts) >= ${ns("2024-01-10")}
        |  AND epoch_ns(ts) < ${ns("2024-01-15")}
        |ORDER BY event_id""".stripMargin,
    "text_compress_ratio" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS raw_bytes,
        |  CAST(1 AS BIGINT) AS ratio_ok
        |FROM documents WHERE text IS NOT NULL AND text <> ''
        |ORDER BY doc_id""".stripMargin,
    "ts_rate_cusum" ->
      """WITH RECURSIVE c AS (
        |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS b,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2
        |), span AS (
        |  SELECT user_id, min(b) AS b0, max(b) AS b1 FROM c GROUP BY 1
        |), grid AS (
        |  SELECT user_id, unnest(range(b0, b1 + 1)) AS b FROM span
        |), base AS (
        |  SELECT g.user_id, g.b * 86400000000000 AS ts, g.b AS day_idx,
        |    COALESCE(c.n, 0) * 100 AS cents,
        |    row_number() OVER (PARTITION BY g.user_id ORDER BY g.b) AS rn
        |  FROM grid g LEFT JOIN c ON c.user_id = g.user_id AND c.b = g.b
        |), rec AS (
        |  SELECT user_id, ts, day_idx, cents, rn,
        |    greatest(0, cents - 300 - 100) AS sp0,
        |    greatest(0, -(cents - 300) - 100) AS sn0,
        |    CASE WHEN greatest(0, cents - 300 - 100) > 600
        |           OR greatest(0, -(cents - 300) - 100) > 600
        |         THEN 1 ELSE 0 END AS alarm
        |  FROM base WHERE rn = 1
        |  UNION ALL
        |  SELECT b.user_id, b.ts, b.day_idx, b.cents, b.rn,
        |    greatest(0, CASE WHEN r.alarm = 1 THEN 0 ELSE r.sp0 END
        |      + (b.cents - 300) - 100),
        |    greatest(0, CASE WHEN r.alarm = 1 THEN 0 ELSE r.sn0 END
        |      - (b.cents - 300) - 100),
        |    CASE WHEN greatest(0, CASE WHEN r.alarm = 1 THEN 0 ELSE r.sp0
        |        END + (b.cents - 300) - 100) > 600
        |      OR greatest(0, CASE WHEN r.alarm = 1 THEN 0 ELSE r.sn0 END
        |        - (b.cents - 300) - 100) > 600
        |      THEN 1 ELSE 0 END
        |  FROM rec r JOIN base b
        |    ON b.user_id = r.user_id AND b.rn = r.rn + 1
        |)
        |SELECT user_id, ts, day_idx, cents, sp0 AS s_pos, sn0 AS s_neg,
        |  CAST(alarm AS BIGINT) AS alarm
        |FROM rec ORDER BY user_id, ts""".stripMargin,
    "retrieval_bm25" ->
      s"""${bm25RankedCtes(10)}
        |SELECT query_id, doc_id, score, n_terms, rank
        |FROM bm25r ORDER BY query_id, rank""".stripMargin,
    "retrieval_hybrid_rrf" ->
      s"""${bm25RankedCtes(20)},
        |qd AS (
        |  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec
        |  FROM embeddings WHERE vec_id IN (1, 2, 3)
        |), cd AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
        |), dsc AS (
        |  SELECT qid, vec_id,
        |    list_dot_product(qvec, vec) /
        |      (sqrt(list_dot_product(qvec, qvec)) * sqrt(list_dot_product(vec, vec))) AS cos
        |  FROM qd CROSS JOIN cd WHERE qid <> vec_id
        |), denser AS (
        |  SELECT qid AS query_id, vec_id AS doc_id, rank FROM (
        |    SELECT qid, vec_id,
        |      row_number() OVER (PARTITION BY qid
        |        ORDER BY cos DESC, vec_id ASC) AS rank
        |    FROM dsc) WHERE rank <= 20
        |), fused AS (
        |  SELECT COALESCE(b.query_id, d.query_id) AS query_id,
        |    COALESCE(b.doc_id, d.doc_id) AS doc_id,
        |    COALESCE(1048576 // (60 + b.rank), 0)
        |      + COALESCE(1048576 // (60 + d.rank), 0) AS rrf_score
        |  FROM bm25r b FULL OUTER JOIN denser d
        |    ON b.query_id = d.query_id AND b.doc_id = d.doc_id
        |)
        |SELECT query_id, doc_id, CAST(rrf_score AS BIGINT) AS rrf_score,
        |  rrf_rank
        |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY rrf_score DESC, doc_id ASC) AS rrf_rank FROM fused)
        |WHERE rrf_rank <= 10 ORDER BY query_id, rrf_rank""".stripMargin,
    "text_quality_score" ->
      s"""WITH f AS (
        |  SELECT doc_id,
        |    CASE WHEN length(text) > 0 THEN
        |      CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()-]', '', 'g')) AS DOUBLE) / length(text)
        |    ELSE 0.0 END AS punct_ratio,
        |    CASE WHEN length(text) > 0 THEN
        |      CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / length(text)
        |    ELSE 0.0 END AS digit_ratio,
        |    CASE WHEN length(text) > 0 THEN
        |      CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE) / length(text)
        |    ELSE 0.0 END AS ws_ratio,
        |    CASE WHEN len($DuckToks) > 0 THEN
        |      CAST(len(list_filter($DuckToks,
        |        x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','was','at','by'], x))) AS DOUBLE)
        |        / len($DuckToks)
        |    ELSE 0.0 END AS stopword_ratio,
        |    CASE WHEN len($DuckToks) > 0 THEN
        |      CAST(list_sum(list_transform($DuckToks, x -> length(x))) AS DOUBLE)
        |        / len($DuckToks)
        |    ELSE 0.0 END AS mean_token_len,
        |    CAST(least(len($DuckToks), 100) AS DOUBLE) / 100.0 AS len_ramp
        |  FROM documents
        |), sc AS (
        |  SELECT doc_id,
        |    0.0 + 3.0 * stopword_ratio + -2.0 * punct_ratio
        |        + -4.0 * digit_ratio + 1.0 * ws_ratio
        |        + -0.25 * mean_token_len + 2.0 * len_ramp AS q_score
        |  FROM f
        |)
        |SELECT doc_id, q_score,
        |  CASE WHEN q_score >= 0.5 THEN CAST(1 AS BIGINT)
        |       ELSE CAST(0 AS BIGINT) END AS q_keep
        |FROM sc ORDER BY doc_id""".stripMargin,
    "ts_zscore_anomaly" ->
      """WITH b AS (
        |  SELECT event_id, epoch_ns(ts) AS ts, user_id, value,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM events
        |), w AS (
        |  SELECT event_id, ts, user_id, value, c,
        |    count(c) OVER win AS roll_n,
        |    CAST(sum(c) OVER win AS BIGINT) AS s,
        |    CAST(sum(c*c) OVER win AS BIGINT) AS sq
        |  FROM b
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts
        |    RANGE BETWEEN 604800000000000 PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_id, ts, user_id, value, roll_n,
        |  (roll_n*c - s)*(roll_n*c - s) AS lhs,
        |  4*(roll_n*sq - s*s) AS rhs
        |FROM w
        |WHERE roll_n >= 10
        |  AND (roll_n*c - s)*(roll_n*c - s) > 4*(roll_n*sq - s*s)
        |ORDER BY event_id""".stripMargin,
    "rolling_24h_stats" ->
      """SELECT event_id, epoch_ns(ts) AS ts, user_id, value,
        |  count(*) OVER w AS roll_n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS roll_sum,
        |  min(value) OVER w AS roll_min,
        |  max(value) OVER w AS roll_max
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts)
        |  RANGE BETWEEN 86400000000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "agg_downsample_locf" -> {
      val day = 86400L * 1000000000L
      s"""WITH buckets AS (
         |  SELECT generate_series AS bucket_ts
         |  FROM generate_series(${ns("2023-12-25")}, ${ns("2024-02-05") - 1}, $day)
         |), a AS (
         |  SELECT (epoch_ns(ts) // $day) * $day AS bucket_ts,
         |    count(*) AS n, min(value) AS min_v, max(value) AS max_v,
         |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
         |  FROM events GROUP BY 1
         |), filled AS (
         |  SELECT b.bucket_ts, coalesce(a.n, 0) AS n, a.min_v, a.max_v, a.sum_v
         |  FROM buckets b LEFT JOIN a ON a.bucket_ts = b.bucket_ts
         |)
         |SELECT bucket_ts, n,
         |  last_value(min_v IGNORE NULLS) OVER w AS min_v,
         |  last_value(max_v IGNORE NULLS) OVER w AS max_v,
         |  last_value(sum_v IGNORE NULLS) OVER w AS sum_v
         |FROM filled
         |WINDOW w AS (ORDER BY bucket_ts ROWS UNBOUNDED PRECEDING)
         |ORDER BY bucket_ts""".stripMargin
    },
    "meta_describe_all" -> {
      val noTs = Seq("customer", "documents", "embeddings", "lineitem",
        "nation", "orders", "part", "region", "supplier")
      val rows = noTs.map(n =>
        s"SELECT '$n' AS metrics, CAST(1 AS BIGINT) AS block_num, " +
          s"(SELECT count(*) FROM $n) AS row_num, " +
          "CAST(NULL AS BIGINT) AS from_ts, CAST(NULL AS BIGINT) AS end_ts")
      (rows :+ ("SELECT 'events' AS metrics, CAST(1 AS BIGINT) AS block_num, " +
        "count(*) AS row_num, " +
        "min(epoch_ns(ts)) AS from_ts, max(epoch_ns(ts)) AS end_ts FROM events"))
        .mkString("", " UNION ALL ", " ORDER BY metrics")
    },
    "agg_event_type_stats" ->
      """SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
        |  min(value) AS min_v, max(value) AS max_v
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // the oracle re-derives the SAME deterministic sample from raw (the
    // md5 bit-prefix membership — the first-8-hex-chars value below
    // 2^(32-bits) — is engine-portable) and applies the same integer
    // scale-up — the estimates hash-match exactly. bits = 5 → rate 1/32,
    // deliberately not a power of 16 (the bit ladder's whole point)
    "aqp_event_stats" ->
      """WITH sm AS (
        |  SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM events
        |  WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
        |          ::BIGINT < (CAST(1 AS BIGINT) << 27)
        |)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_sample,
        |  CAST(count(*) * 32 AS BIGINT) AS est_count,
        |  CAST(sum(c) * 32 AS BIGINT) AS est_sum_cents,
        |  CAST(sum(c * c) * 32 * 31 AS BIGINT) AS est_var_cents2
        |FROM sm GROUP BY event_type ORDER BY event_type""".stripMargin,
    "aqp_window" ->
      s"""WITH sm AS (
         |  SELECT event_type,
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
         |  FROM events
         |  WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
         |          ::BIGINT < (CAST(1 AS BIGINT) << 27)
         |    AND epoch_ns(ts) >= ${ns("2024-01-10")}
         |    AND epoch_ns(ts) < ${ns("2024-01-20")}
         |)
         |SELECT event_type, CAST(count(*) AS BIGINT) AS n_sample,
         |  CAST(count(*) * 32 AS BIGINT) AS est_count,
         |  CAST(sum(c) * 32 AS BIGINT) AS est_sum_cents,
         |  CAST(sum(c * c) * 32 * 31 AS BIGINT) AS est_var_cents2
         |FROM sm GROUP BY event_type ORDER BY event_type""".stripMargin,
    "aqp_stratified" ->
      s"""WITH e AS (
         |  SELECT event_id, value,
         |    CAST(floor(value / 100) AS BIGINT) AS band
         |  FROM events
         |), pm AS (
         |  SELECT band, $DuckBitsLadder AS p
         |  FROM e GROUP BY band
         |), sm AS (
         |  SELECT e.band,
         |    CAST(CAST(e.value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
         |    (CAST(1 AS BIGINT) << pm.p) AS rd
         |  FROM e JOIN pm USING (band)
         |  WHERE ('0x' || substr(md5(CAST(e.event_id AS VARCHAR)), 1, 8))
         |          ::BIGINT < (CAST(1 AS BIGINT) << (32 - pm.p))
         |)
         |SELECT band, CAST(count(*) AS BIGINT) AS n_sample,
         |  CAST(sum(rd) AS BIGINT) AS est_count,
         |  CAST(sum(c * rd) AS BIGINT) AS est_sum_cents,
         |  CAST(sum(c * c * rd * (rd - 1)) AS BIGINT) AS est_var_cents2
         |FROM sm GROUP BY band ORDER BY band""".stripMargin,
    "aqp_retained" ->
      s"""WITH sm AS (
         |  SELECT event_type,
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
         |  FROM events
         |  WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
         |          ::BIGINT < (CAST(1 AS BIGINT) << 28)
         |    AND epoch_ns(ts) >= ${ns("2024-01-10")}
         |)
         |SELECT event_type, CAST(count(*) AS BIGINT) AS n_sample,
         |  CAST(count(*) * 16 AS BIGINT) AS est_count,
         |  CAST(sum(c) * 16 AS BIGINT) AS est_sum_cents,
         |  CAST(sum(c * c) * 16 * 15 AS BIGINT) AS est_var_cents2
         |FROM sm GROUP BY event_type ORDER BY event_type""".stripMargin,
    // the seed-frozen stratified mirror: rates derive from the FIRST
    // half-month's counts only (the map freezes at build), every event
    // row samples under that map, and strata absent from the seed fall
    // back to keep-all (p = 0) — the appendStratified contract
    "stream_aqp_stratified" ->
      s"""WITH e AS (
         |  SELECT event_id, value, epoch_ns(ts) AS tsn,
         |    CAST(floor(value / 100) AS BIGINT) AS band
         |  FROM events
         |), pm AS (
         |  SELECT band, $DuckBitsLadder AS p
         |  FROM e WHERE tsn < ${ns("2024-01-16")} GROUP BY band
         |), sm AS (
         |  SELECT e.band,
         |    CAST(CAST(e.value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
         |    (CAST(1 AS BIGINT) << coalesce(pm.p, 0)) AS rd
         |  FROM e LEFT JOIN pm USING (band)
         |  WHERE ('0x' || substr(md5(CAST(e.event_id AS VARCHAR)), 1, 8))
         |          ::BIGINT <
         |        (CAST(1 AS BIGINT) << (32 - coalesce(pm.p, 0)))
         |)
         |SELECT band, CAST(count(*) AS BIGINT) AS n_sample,
         |  CAST(sum(rd) AS BIGINT) AS est_count,
         |  CAST(sum(c * rd) AS BIGINT) AS est_sum_cents,
         |  CAST(sum(c * c * rd * (rd - 1)) AS BIGINT) AS est_var_cents2
         |FROM sm GROUP BY band ORDER BY band""".stripMargin,
    // the weighted-quantile mirror: each sampled row REPLICATES rate_den
    // times (unnest over range), then plain quantile_cont — exactly the
    // multiset Spark's percentile(c, p, frequency) interpolates over
    "aqp_quantiles" ->
      s"""WITH e AS (
         |  SELECT event_id, event_type, value,
         |    CAST(floor(value / 100) AS BIGINT) AS band
         |  FROM events
         |), pm AS (
         |  SELECT band, $DuckBitsLadder AS p
         |  FROM e GROUP BY band
         |), sm AS (
         |  SELECT e.event_type,
         |    CAST(CAST(e.value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
         |    (CAST(1 AS BIGINT) << pm.p) AS rd
         |  FROM e JOIN pm USING (band)
         |  WHERE ('0x' || substr(md5(CAST(e.event_id AS VARCHAR)), 1, 8))
         |          ::BIGINT < (CAST(1 AS BIGINT) << (32 - pm.p))
         |    AND CAST(CAST(e.value AS DECIMAL(18,2)) * 100 AS BIGINT)
         |        IS NOT NULL
         |), rep AS (
        |  SELECT event_type, c
        |  FROM (SELECT event_type, c, unnest(range(rd)) AS __i FROM sm)
        |)
        |SELECT event_type, n_sample, q25, q50, q75
        |FROM (SELECT event_type, CAST(count(*) AS BIGINT) AS n_sample
        |      FROM sm GROUP BY event_type)
        |JOIN (SELECT event_type, quantile_cont(c, 0.25) AS q25,
        |        quantile_cont(c, 0.5) AS q50,
        |        quantile_cont(c, 0.75) AS q75
        |      FROM rep GROUP BY event_type) USING (event_type)
        |ORDER BY event_type""".stripMargin,
    "aqp_error_report" ->
      """WITH est AS (
        |  SELECT event_type, CAST(count(*) * 32 AS BIGINT) AS est_count
        |  FROM events
        |  WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
        |          ::BIGINT < (CAST(1 AS BIGINT) << 27)
        |  GROUP BY event_type
        |), ex AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_exact
        |  FROM events GROUP BY event_type
        |)
        |SELECT event_type, n_exact, est_count,
        |  CAST(abs(est_count - n_exact) * 1000 // n_exact AS BIGINT)
        |    AS err_permille
        |FROM est JOIN ex USING (event_type)
        |ORDER BY event_type""".stripMargin,
    // the routed fine zoom: 1-minute buckets of the 1/32 sample over
    // one day — grain and bounds are the router's own arithmetic
    // (span 86400e9 / 1440 points = 60e9, day-aligned so widening is
    // the identity), mirrored here as literals
    "rollup_route_aqp" ->
      s"""WITH sm AS (
         |  SELECT (epoch_ns(ts) - epoch_ns(ts) % 60000000000)
         |      AS bucket_ts,
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
         |  FROM events
         |  WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
         |          ::BIGINT < (CAST(1 AS BIGINT) << 27)
         |    AND epoch_ns(ts) >= ${ns("2024-01-05")}
         |    AND epoch_ns(ts) < ${ns("2024-01-06")}
         |)
         |SELECT bucket_ts, CAST(count(*) AS BIGINT) AS n_sample,
         |  CAST(count(*) * 32 AS BIGINT) AS est_count,
         |  CAST(sum(c) * 32 AS BIGINT) AS est_sum_cents,
         |  CAST(sum(c * c) * 32 * 31 AS BIGINT) AS est_var_cents2,
         |  CAST(32 AS BIGINT) AS rate_den,
         |  CAST(60000000000 AS BIGINT) AS grain_ns,
         |  'sample' AS source
         |FROM sm GROUP BY bucket_ts ORDER BY bucket_ts""".stripMargin,
    // the keyed routed fine zoom: the same sample + grain arithmetic as
    // rollup_route_aqp, sliced to one series by the pushed key predicate
    // and grouped by the store's key dimension
    "rollup_route_aqp_keyed" ->
      s"""WITH sm AS (
         |  SELECT event_type,
         |    (epoch_ns(ts) - epoch_ns(ts) % 1800000000000)
         |      AS bucket_ts,
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
         |  FROM events
         |  WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
         |          ::BIGINT < (CAST(1 AS BIGINT) << 27)
         |    AND epoch_ns(ts) >= ${ns("2024-01-01")}
         |    AND epoch_ns(ts) < ${ns("2024-02-01")}
         |    AND event_type = 'click'
         |)
         |SELECT event_type, bucket_ts,
         |  CAST(count(*) AS BIGINT) AS n_sample,
         |  CAST(count(*) * 32 AS BIGINT) AS est_count,
         |  CAST(sum(c) * 32 AS BIGINT) AS est_sum_cents,
         |  CAST(sum(c * c) * 32 * 31 AS BIGINT) AS est_var_cents2,
         |  CAST(32 AS BIGINT) AS rate_den,
         |  CAST(1800000000000 AS BIGINT) AS grain_ns,
         |  'sample' AS source
         |FROM sm GROUP BY event_type, bucket_ts
         |ORDER BY event_type, bucket_ts""".stripMargin,
    // the stratified routed fine zoom: re-derive the FROZEN stratum→rate
    // map from raw (the 2× bits ladder over per-band counts, minRows 50,
    // maxBits 8), sample each band at its own rate, and HT-weight every
    // row by its inverse inclusion probability — rate_den per bucket is
    // the coarsest contributing rate, exactly the store's label
    "rollup_route_aqp_stratified" ->
      s"""WITH rates AS (
         |  SELECT band,
         |    CASE WHEN n >= 50 * 256 THEN 8
         |         WHEN n >= 50 * 128 THEN 7
         |         WHEN n >= 50 * 64  THEN 6
         |         WHEN n >= 50 * 32  THEN 5
         |         WHEN n >= 50 * 16  THEN 4
         |         WHEN n >= 50 * 8   THEN 3
         |         WHEN n >= 50 * 4   THEN 2
         |         WHEN n >= 50 * 2   THEN 1
         |         ELSE 0 END AS bits
         |  FROM (SELECT CAST(floor(value / 100) AS BIGINT) AS band,
         |          count(*) AS n
         |        FROM events GROUP BY 1)
         |), sm AS (
         |  SELECT e.event_type,
         |    (epoch_ns(e.ts) - epoch_ns(e.ts) % 1800000000000)
         |      AS bucket_ts,
         |    CAST(CAST(e.value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
         |    (CAST(1 AS BIGINT) << r.bits) AS rd
         |  FROM events e
         |  JOIN rates r ON CAST(floor(e.value / 100) AS BIGINT) = r.band
         |  WHERE ('0x' || substr(md5(CAST(e.event_id AS VARCHAR)), 1, 8))
         |          ::BIGINT < (CAST(1 AS BIGINT) << (32 - r.bits))
         |    AND epoch_ns(e.ts) >= ${ns("2024-01-01")}
         |    AND epoch_ns(e.ts) < ${ns("2024-02-01")}
         |    AND e.event_type = 'click'
         |)
         |SELECT event_type, bucket_ts,
         |  CAST(count(*) AS BIGINT) AS n_sample,
         |  CAST(sum(rd) AS BIGINT) AS est_count,
         |  CAST(sum(c * rd) AS BIGINT) AS est_sum_cents,
         |  CAST(sum(c * c * rd * (rd - 1)) AS BIGINT) AS est_var_cents2,
         |  CAST(max(rd) AS BIGINT) AS rate_den,
         |  CAST(1800000000000 AS BIGINT) AS grain_ns,
         |  'sample' AS source
         |FROM sm GROUP BY event_type, bucket_ts
         |ORDER BY event_type, bucket_ts""".stripMargin,
    "json_props_stats" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(min(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS min_k,
        |  CAST(max(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "tpch_q3" ->
      """SELECT l_orderkey,
        |  CAST(sum(
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) *
        |    (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
        |  ) AS BIGINT) AS revenue_c4
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l_shipdate > TIMESTAMP '1998-06-01'
        |  AND EXISTS (SELECT 1 FROM customer
        |              WHERE c_custkey = o_custkey
        |                AND c_mktsegment = 'BUILDING')
        |GROUP BY l_orderkey
        |ORDER BY revenue_c4 DESC, l_orderkey LIMIT 10""".stripMargin,
    "tpch_q5" ->
      """SELECT n_name,
        |  CAST(sum(
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) *
        |    (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
        |  ) AS BIGINT) AS revenue_c4
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |  AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue_c4 DESC, n_name""".stripMargin,
    "tpch_q18" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(CAST(l_quantity AS BIGINT)) > 300
        |)
        |SELECT c_name, c_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  o_totalprice, sum_qty
        |FROM big
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
        |LIMIT 100""".stripMargin,
    "tpch_q10" ->
      """WITH rev AS (
        |  SELECT o_custkey, CAST(sum(
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) *
        |    (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
        |  ) AS BIGINT) AS revenue_c4
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_returnflag = 'R'
        |    AND o_orderdate >= TIMESTAMP '1996-07-01'
        |    AND o_orderdate < TIMESTAMP '1996-10-01'
        |  GROUP BY o_custkey
        |)
        |SELECT c_custkey, c_name,
        |  CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_c,
        |  n_name, revenue_c4
        |FROM rev
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY revenue_c4 DESC, c_custkey LIMIT 20""".stripMargin,
    "tpch_q12" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_shipdate >= o_orderdate + INTERVAL 60 DAY
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin,
    "tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate >= o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "tpch_q14" ->
      """SELECT
        |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) *
        |    (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
        |    ELSE 0 END) AS BIGINT) AS promo_rev_c4,
        |  CAST(sum(
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) *
        |    (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
        |  ) AS BIGINT) AS total_rev_c4
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1995-09-01'
        |  AND l_shipdate < TIMESTAMP '1995-10-01'""".stripMargin,
    "tpch_q6" ->
      """SELECT
        |  CAST(sum(
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) *
        |    CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)
        |  ) AS BIGINT) AS revenue_c4,
        |  count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)
        |    BETWEEN 5 AND 7
        |  AND l_quantity < 24""".stripMargin,
    "tpch_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  CAST(sum(
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) *
        |    (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
        |  ) AS BIGINT) AS revenue_c4
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "tpch_q13" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "tpch_q17" ->
      """WITH pt AS (
        |  SELECT p_partkey FROM part
        |  WHERE p_brand = 'Brand#23' AND p_type = 'MEDIUM'
        |), li AS (
        |  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS price_c
        |  FROM lineitem JOIN pt ON l_partkey = p_partkey
        |), a AS (
        |  SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS s,
        |    count(*) AS n
        |  FROM li GROUP BY 1
        |)
        |SELECT
        |  COALESCE(CAST(sum(li.price_c) AS BIGINT), 0) AS small_qty_rev_c,
        |  count(*) AS n_items,
        |  COALESCE(CAST(sum(li.price_c) AS BIGINT), 0) // 7 AS avg_yearly_c
        |FROM li JOIN a ON li.l_partkey = a.l_partkey
        |WHERE li.qty * 5 * a.n < a.s""".stripMargin,
    "tpch_q19" ->
      """SELECT
        |  CAST(sum(
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) *
        |    (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
        |  ) AS BIGINT) AS revenue_c4,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE
        |  (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity BETWEEN 1 AND 11)
        |  OR (p_brand = 'Brand#4' AND p_size BETWEEN 10 AND 30
        |    AND l_quantity BETWEEN 10 AND 20)
        |  OR (p_brand = 'Brand#19' AND p_size BETWEEN 20 AND 50
        |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "tpch_q22" ->
      """WITH c AS (
        |  SELECT c_custkey, c_nationkey,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_c
        |  FROM customer
        |), t AS (
        |  SELECT CAST(sum(bal_c) AS BIGINT) AS s_c, count(*) AS n_pos
        |  FROM c WHERE bal_c > 0
        |)
        |SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
        |  CAST(sum(bal_c) AS BIGINT) AS totacctbal_c
        |FROM c, t
        |WHERE bal_c * n_pos > s_c
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,
    "tpch_q2" ->
      """WITH pt AS (
        |  SELECT p_partkey FROM part
        |  WHERE p_size = 15 AND p_type = 'STANDARD'
        |), eur AS (
        |  SELECT s_suppkey, s_name, n_name,
        |    CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_c
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'
        |), cost AS (
        |  SELECT l_partkey, l_suppkey, CAST(min(
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |  ) AS BIGINT) AS cost_c
        |  FROM lineitem JOIN pt ON l_partkey = p_partkey
        |  WHERE l_suppkey IN (SELECT s_suppkey FROM eur)
        |  GROUP BY 1, 2
        |), m AS (
        |  SELECT l_partkey, min(cost_c) AS min_c FROM cost GROUP BY 1
        |)
        |SELECT bal_c, s_name, n_name, cost.l_partkey AS p_partkey, cost_c
        |FROM cost JOIN m ON cost.l_partkey = m.l_partkey
        |  AND cost_c = min_c
        |JOIN eur ON l_suppkey = s_suppkey
        |ORDER BY bal_c DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,
    "tpch_q8" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(sum(CASE WHEN n1.n_name = 'NATION_3' THEN
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) *
        |    (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
        |    ELSE 0 END) AS BIGINT) AS nation_rev_c4,
        |  CAST(sum(
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) *
        |    (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
        |  ) AS BIGINT) AS total_rev_c4
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |JOIN region ON n2.n_regionkey = r_regionkey
        |WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
        |  AND o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "tpch_q9" ->
      """SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(sum(
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) *
        |    (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)) -
        |    CAST(l_quantity AS BIGINT) *
        |    CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 50
        |  ) AS BIGINT) AS profit_c4
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2
        |ORDER BY n_name, o_year DESC""".stripMargin,
    "tpch_q11" ->
      """WITH v AS (
        |  SELECT l_partkey, CAST(sum(
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |  ) AS BIGINT) AS value_c
        |  FROM lineitem
        |  WHERE l_suppkey IN (
        |    SELECT s_suppkey FROM supplier
        |    JOIN nation ON s_nationkey = n_nationkey
        |    WHERE n_name = 'NATION_7')
        |  GROUP BY 1
        |), t AS (
        |  SELECT CAST(sum(value_c) AS BIGINT) AS total_c FROM v
        |)
        |SELECT l_partkey AS p_partkey, value_c FROM v, t
        |WHERE value_c * 10000 > total_c
        |ORDER BY value_c DESC, p_partkey""".stripMargin,
    "tpch_q15" ->
      """WITH rev AS (
        |  SELECT l_suppkey, CAST(sum(
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) *
        |    (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
        |  ) AS BIGINT) AS total_rev_c4
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1
        |)
        |SELECT s_suppkey, s_name, total_rev_c4
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_rev_c4 = (SELECT max(total_rev_c4) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "tpch_q16" ->
      """SELECT p_brand, p_type, p_size,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 23)
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "tpch_q20" ->
      """WITH q AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
        |      AND l_shipdate < TIMESTAMP '1997-01-01'
        |      THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS q96,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qall
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE 'red%'
        |  GROUP BY 1, 2
        |)
        |SELECT s_suppkey, s_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_4'
        |  AND s_suppkey IN (SELECT l_suppkey FROM q WHERE q96 * 2 > qall)
        |ORDER BY s_suppkey""".stripMargin,
    "tpch_q21" ->
      """SELECT s_name, count(*) AS numwait
        |FROM lineitem l1
        |JOIN orders ON l1.l_orderkey = o_orderkey
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F' AND n_name = 'NATION_2'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin,
    "ts_active_users" ->
      """WITH a AS (
        |  SELECT DISTINCT user_id,
        |    epoch_ns(ts) // 86400000000000 AS day
        |  FROM events
        |), dau AS (
        |  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        |  FROM a GROUP BY day
        |), w AS (
        |  SELECT user_id, unnest(range(day, day + 7)) AS day FROM a
        |), wau AS (
        |  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
        |  FROM w GROUP BY day
        |)
        |SELECT day, dau, wau FROM dau JOIN wau USING (day)
        |ORDER BY day""".stripMargin,
    "agg_rollup_revenue" ->
      """SELECT coalesce(n_name, 'ALL') AS n_name,
        |  coalesce(c_mktsegment, 'ALL') AS c_mktsegment,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(n_name, c_mktsegment)
        |ORDER BY n_name, c_mktsegment""".stripMargin,
    "agg_cube_revenue" ->
      """SELECT coalesce(n_name, 'ALL') AS n_name,
        |  coalesce(c_mktsegment, 'ALL') AS c_mktsegment,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY CUBE(n_name, c_mktsegment)
        |ORDER BY n_name, c_mktsegment""".stripMargin,
    "agg_pivot_types" ->
      """SELECT epoch_ns(ts) // 86400000000000 AS day,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_view,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_click,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_signup
        |FROM events GROUP BY day ORDER BY day""".stripMargin,
    "join_revenue_by_nation" ->
      """SELECT n_name, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "join_revenue_salted" ->
      """SELECT n_name, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "agg_downsample_interp" -> {
      val day = 86400L * 1000000000L
      s"""WITH buckets AS (
         |  SELECT generate_series AS bucket_ts
         |  FROM generate_series(${ns("2023-12-25")}, ${ns("2024-02-05") - 1}, $day)
         |), a AS (
         |  SELECT (epoch_ns(ts) // $day) * $day AS bucket_ts,
         |    count(*) AS n,
         |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
         |  FROM events GROUP BY 1
         |), filled AS (
         |  SELECT b.bucket_ts, coalesce(a.n, 0) AS n, a.sum_v
         |  FROM buckets b LEFT JOIN a ON a.bucket_ts = b.bucket_ts
         |), w AS (
         |  SELECT bucket_ts, n, sum_v,
         |    last_value(sum_v IGNORE NULLS) OVER back AS pv,
         |    last_value(CASE WHEN sum_v IS NOT NULL THEN bucket_ts END
         |      IGNORE NULLS) OVER back AS pt,
         |    first_value(sum_v IGNORE NULLS) OVER fwd AS nv,
         |    first_value(CASE WHEN sum_v IS NOT NULL THEN bucket_ts END
         |      IGNORE NULLS) OVER fwd AS nt
         |  FROM filled
         |  WINDOW back AS (ORDER BY bucket_ts ROWS UNBOUNDED PRECEDING),
         |    fwd AS (ORDER BY bucket_ts
         |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
         |)
         |SELECT bucket_ts, n,
         |  CASE WHEN sum_v IS NOT NULL THEN sum_v
         |       WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
         |         pv + (nv - pv) *
         |           (CAST(bucket_ts - pt AS DOUBLE) / (nt - pt))
         |  END AS sum_v
         |FROM w ORDER BY bucket_ts""".stripMargin
    },
    "stream_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) AS ts FROM events
        |), s AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > 3600000000000 THEN 1
        |         ELSE 0 END AS is_new
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), c AS (
        |  SELECT user_id, ts,
        |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        |  FROM s
        |), g AS (
        |  SELECT user_id, session_idx, count(*) AS n_events,
        |         min(ts) AS session_start, max(ts) AS session_end
        |  FROM c GROUP BY user_id, session_idx
        |), mx AS (SELECT max(epoch_ns(ts)) AS m FROM events),
        |ls AS (SELECT user_id, max(session_idx) AS mi FROM g GROUP BY user_id)
        |SELECT g.user_id, g.session_start, g.session_end, g.n_events
        |FROM g JOIN ls ON g.user_id = ls.user_id, mx
        |WHERE g.session_idx < ls.mi
        |   OR (g.session_end // 1000000 + 3600000 + 1) < (m // 1000000 - 600000)
        |ORDER BY g.user_id, g.session_start""".stripMargin,
    "window_top_orders" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders
        |) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "asof_purchase_view" ->
      """SELECT l.event_id, epoch_ns(l.ts) AS ts, l.user_id, l.value,
        |       epoch_ns(r.ts) AS r_ts, r.value AS r_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') l
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin,
    "sessionize_stats" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) AS ts FROM events
        |), s AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > 3600000000000 THEN 1
        |         ELSE 0 END AS is_new
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), c AS (
        |  SELECT user_id, ts,
        |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        |  FROM s
        |)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |       min(ts) AS session_start, max(ts) AS session_end
        |FROM c GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,
    "text_top_tokens" ->
      s"""SELECT tok, count(*) AS n FROM (
         |  SELECT unnest($DuckToks) AS tok FROM documents
         |) GROUP BY tok ORDER BY n DESC, tok LIMIT 50""".stripMargin,
    "meta_block_list" ->
      ("SELECT 'events' AS metrics, 1 AS seq, count(*) AS row_num, " +
        "min(epoch_ns(ts)) AS block_start, max(epoch_ns(ts)) AS block_end " +
        "FROM events"),
    "stream_downsample" -> {
      val h = 3600L * 1000000L // 1h in µs
      // Spark tracks the watermark in milliseconds: emitted windows are
      // those with end(ms) <= max event time(ms) - lateness(ms)
      s"""WITH a AS (
         |  SELECT (epoch_us(ts) // $h) * $h AS bucket_start_us,
         |    count(*) AS n, min(value) AS min_v, max(value) AS max_v,
         |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
         |  FROM events GROUP BY 1
         |), mx AS (SELECT max(epoch_us(ts)) AS m FROM events)
         |SELECT bucket_start_us, n, min_v, max_v, sum_v FROM a, mx
         |WHERE (bucket_start_us + $h) // 1000 <= (m // 1000) - 7200000
         |ORDER BY bucket_start_us""".stripMargin
    }
  )

  // ---- pipeline extensions (dedup / text / similarity / multimodal) ------
}
