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

/** The reference-surface (dialect) query family + oracles. */
private[graft] object EntryQl {
  // ---- reference-surface queries (dialect goes through parser+planner) ----

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_scan_project" -> ((s, d) =>
      t(s, d, "events").select("event_id", "value").orderBy("event_id")),
    "ql_range" -> ((s, d) =>
      tsUs(engine(s, d)
        .frame("select * from events where ts in ('2024-01-10', '2024-01-12')"))
        .orderBy("ts", "event_id")),
    "ql_eq_day" -> ((s, d) =>
      tsUs(engine(s, d)
        .frame("select * from events where ts = '2024-01-15'"))
        .orderBy("ts", "event_id")),
    "ql_gt_delta" -> ((s, d) =>
      tsUs(engine(s, d)
        .frame("select * from events where ts > '2024-01-28' -12 hours"))
        .orderBy("ts", "event_id")),
    "ql_head_limit" -> ((s, d) =>
      tsUs(engine(s, d)
        .frame("select * from events where ts >=|50 '2024-01-10'"))
        .orderBy("ts", "event_id")),
    "ql_tail_limit" -> ((s, d) =>
      tsUs(engine(s, d)
        .frame("select * from events where ts <=|50 '2024-01-20'"))
        .orderBy("ts", "event_id")),
    "ql_tz_offset" -> ((s, d) =>
      tsUs(engine(s, d)
        .frame("with tz = +9 select * from events where ts in ('2024-01-10', '2024-01-11')"))
        .orderBy("ts", "event_id")),
    "ql_projection" -> ((s, d) =>
      tsUs(engine(s, d)
        .frame("with cols = [eid, uid, etype, val, props] " +
          "select eid, val from events where ts in ('2024-01-10', +2 days)"))
        .orderBy("ts", "eid")),
    "ts_format_ns" -> ((s, d) =>
      tsUs(t(s, d, "events").select("event_id", "ts"))
        .select(col("event_id"),
          graft.functions.FormatNanos.format_ns(col("ts")).as("iso"))
        .orderBy("event_id")),
    "meta_metrics" -> ((s, d) => Tables.metricsDf(s, d)),
    "meta_describe_events" -> ((s, d) =>
      // updated_at (file mtime) is engine surface but not oracle-stable
      Tables.describeDf(s, d, Some("events")).drop("updated_at")
        .withColumn("from_ts", col("from_ts") - pmod(col("from_ts"), lit(1000L)))
        .withColumn("end_ts", col("end_ts") - pmod(col("end_ts"), lit(1000L))))
  )

  def oracles: Map[String, String] = {
    def evSql(since: Long, until: Long, extra: String = ""): String =
      s"SELECT epoch_ns(ts) AS ts, event_id, user_id, event_type, value, props " +
        s"FROM events WHERE epoch_ns(ts) >= $since AND epoch_ns(ts) < $until " +
        s"$extra ORDER BY ts, event_id"
    Map(
      "ts_scan_project" ->
        "SELECT event_id, value FROM events ORDER BY event_id",
      "ql_range" -> evSql(ns("2024-01-10"), ns("2024-01-12")),
      "ql_eq_day" -> evSql(ns("2024-01-15"), ns("2024-01-16")),
      "ql_gt_delta" ->
        (s"SELECT epoch_ns(ts) AS ts, event_id, user_id, event_type, value, props " +
          s"FROM events WHERE epoch_ns(ts) >= ${ns("2024-01-27 12:00") + 1} " +
          "ORDER BY ts, event_id"),
      // the retained-metrics db trims only below the Jan 15 horizon, so
      // an above-horizon dialect range equals the pristine table
      "ql_retained_metrics" ->
        (s"SELECT epoch_ns(ts) AS ts, event_id, user_id, event_type, value, props " +
          s"FROM events WHERE epoch_ns(ts) >= ${ns("2024-01-20")} " +
          "ORDER BY ts, event_id"),
      "ql_head_limit" ->
        s"""SELECT ts, event_id, user_id, event_type, value, props FROM (
           |  SELECT epoch_ns(ts) AS ts, event_id, user_id, event_type, value, props,
           |         dense_rank() OVER (ORDER BY ts) AS rk
           |  FROM events WHERE epoch_ns(ts) >= ${ns("2024-01-10")}
           |) WHERE rk <= 50 ORDER BY ts, event_id""".stripMargin,
      "ql_tail_limit" ->
        s"""SELECT ts, event_id, user_id, event_type, value, props FROM (
           |  SELECT epoch_ns(ts) AS ts, event_id, user_id, event_type, value, props,
           |         dense_rank() OVER (ORDER BY ts DESC) AS rk
           |  FROM events WHERE epoch_ns(ts) < ${ns("2024-01-20") + 1}
           |) WHERE rk <= 50 ORDER BY ts, event_id""".stripMargin,
      "ql_tz_offset" -> evSql(
        ns("2024-01-10") - 9L * 3600 * 1000000000L,
        ns("2024-01-11") - 9L * 3600 * 1000000000L),
      "ql_projection" ->
        (s"SELECT epoch_ns(ts) AS ts, event_id AS eid, value AS val FROM events " +
          s"WHERE epoch_ns(ts) >= ${ns("2024-01-10")} AND epoch_ns(ts) < ${ns("2024-01-12")} " +
          "ORDER BY ts, eid"),
      "ts_format_ns" ->
        ("SELECT event_id, strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') || '000+00:00' AS iso " +
          "FROM events ORDER BY event_id"),
      "meta_metrics" ->
        ("SELECT * FROM (VALUES ('customer'),('documents'),('embeddings'),('events')," +
          "('lineitem'),('nation'),('orders'),('part'),('region'),('supplier')) " +
          "AS t(metrics) ORDER BY metrics"),
      "meta_describe_events" ->
        ("SELECT 'events' AS metrics, CAST(1 AS BIGINT) AS block_num, " +
          "count(*) AS row_num, " +
          "min(epoch_ns(ts)) AS from_ts, max(epoch_ns(ts)) AS end_ts FROM events")
    )
  }
}
