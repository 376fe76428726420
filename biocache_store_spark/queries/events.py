"""Event-stream queries (batch view of the streaming surface).

The reference has no streaming engine (SURVEY.md §2.11) — incrementality is
file/flag-based — so the events table exercises the batch forms of the
windowed/sessionized operators that streaming/ re-runs with readStream +
watermarks. Timestamps are handled as timestamp_ntz end-to-end (io.read_table)
so values compare exactly against DuckDB regardless of session timezone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biocache_store_spark.io import read_table
from biocache_store_spark.queries import register


@register(
    "event_facet_counts",
    doc=(
        "Facet over the stream table — pageOverFacet shape "
        "(index/SolrIndexDAO.scala:299-329) on event_type."
    ),
    oracle="""
        SELECT event_type AS facet_value, COUNT(*) AS facet_count,
               ROUND(SUM(value), 2) AS total_value
        FROM events GROUP BY event_type
    """,
)
def event_facet_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "events")
        .groupBy(F.col("event_type").alias("facet_value"))
        .agg(
            F.count(F.lit(1)).alias("facet_count"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@register(
    "event_hourly_histogram",
    doc=(
        "Tumbling-window aggregate in batch form — occurrence_year/decade "
        "bucketing (index/IndexDAO.scala:578-585) generalized to a time "
        "histogram; the streaming twin is a window('1 hour') aggregation."
    ),
    bench=True,
    oracle="""
        SELECT date_trunc('hour', ts) AS hour_bucket,
               event_type,
               COUNT(*) AS n,
               ROUND(SUM(value), 2) AS total_value
        FROM events GROUP BY 1, 2
    """,
)
def event_hourly_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_bucket"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@register(
    "event_json_extract",
    doc=(
        "JSON-in-string property extraction — the reference stores maps as "
        "JSON strings (util/Json.scala, miscProperties); get_json_object is "
        "the typed projection."
    ),
    oracle="""
        SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
               COUNT(*) AS n,
               ROUND(SUM(value), 2) AS total_value
        FROM events GROUP BY 1
    """,
)
def event_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "events")
        .withColumn("k", F.get_json_object("props", "$.k").cast("bigint"))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@register(
    "event_sessionization",
    doc=(
        "Gap-based sessionization: a new session starts after a >30 min "
        "silence per user; sessions counted and measured per user. The "
        "batch twin of a session-window streaming aggregation, expressed "
        "with lag + conditional cumulative sum windows on both sides."
    ),
    bench=True,
    oracle="""
        WITH marked AS (
            SELECT user_id, ts,
                   CASE WHEN LAG(ts) OVER w IS NULL
                        OR date_diff('microsecond',
                                     LAG(ts) OVER w, ts) > 1800000000
                        THEN 1 ELSE 0 END AS new_session,
                   event_id
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sessions AS (
            SELECT user_id, ts,
                   SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS session_no
            FROM marked
        ),
        per_session AS (
            SELECT user_id, session_no, COUNT(*) AS n_events,
                   date_diff('microsecond', MIN(ts), MAX(ts)) // 1000000 AS duration_s
            FROM sessions GROUP BY user_id, session_no
        )
        SELECT user_id,
               COUNT(*) AS n_sessions,
               CAST(SUM(n_events) AS BIGINT) AS n_events,
               CAST(MAX(duration_s) AS BIGINT) AS longest_session_s
        FROM per_session GROUP BY user_id
    """,
)
def event_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = read_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(order)
    # microsecond diffs on both sides: ANSI forbids casting timestamp_ntz to
    # long, and DuckDB's date_diff('second') counts boundary CROSSINGS while
    # Spark's timestampdiff(SECOND) truncates — off-by-one at fractional
    # seconds, which flips session splits. Microseconds are exact at both
    # engines' resolution.
    gap_us = F.expr("timestampdiff(MICROSECOND, __prev_ts, ts)")
    sessions = (
        ev.withColumn("__prev_ts", prev_ts)
        .withColumn(
            "new_session",
            (F.col("__prev_ts").isNull() | (gap_us > 1_800_000_000)).cast("int"),
        )
        .withColumn(
            "session_no",
            F.sum("new_session").over(order.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    per_session = sessions.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.expr("timestampdiff(MICROSECOND, min(ts), max(ts))") / 1_000_000)
        .cast("long")
        .alias("duration_s"),
    )
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.max("duration_s").alias("longest_session_s"),
    )


@register(
    "event_user_sessions",
    doc=(
        "Per-user activity roll-up with event-time ordering: first/last/count "
        "per user — the deleted-record-log / lastModified bookkeeping shape "
        "(Store.getDeletedRecords) as a grouped min/max."
    ),
    oracle="""
        SELECT user_id,
               COUNT(*) AS n_events,
               MIN(ts) AS first_ts,
               MAX(ts) AS last_ts,
               COUNT(DISTINCT event_type) AS n_types
        FROM events GROUP BY user_id
    """,
)
def event_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.countDistinct("event_type").alias("n_types"),
        )
    )


@register(
    "streaming_event_windows",
    doc=(
        "The SAME hourly histogram computed through Structured Streaming: "
        "readStream over the events parquet -> tumbling window('1 hour') "
        "aggregation (streaming/incremental.py windowed_event_counts, the "
        "streaming twin SURVEY 2.11 promises) -> complete-mode memory sink "
        "driven to completion with Trigger.AvailableNow. availableNow over "
        "static files is exactly the reference's process-what-arrived "
        "incremental semantics, and complete-mode output over a bounded "
        "stream equals the batch aggregate - hence an EXACT SQL oracle, "
        "not a rows-only check. At scale the same pipeline runs unbounded "
        "with the declared watermark bounding state."
    ),
    oracle="""
        SELECT date_trunc('hour', ts) AS window_start,
               event_type,
               COUNT(*) AS n,
               ROUND(SUM(value), 2) AS total_value
        FROM events GROUP BY 1, 2
    """,
)
def streaming_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from biocache_store_spark.streaming.incremental import (
        read_events_stream,
        windowed_event_counts,
    )

    sink = "streaming_event_windows_sink"
    for q in spark.streams.active:
        if q.name == sink:
            q.stop()
    stream = read_events_stream(spark, sf_dir)
    # no watermark: bounded availableNow stream in complete mode — and the
    # tz-independent TIMESTAMP_NTZ event time (oracle exactness) is not a
    # legal watermark column anyway
    agg = windowed_event_counts(stream, window_duration="1 hour", watermark=None)
    query = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="sew_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(sink).select(
        F.col("win.start").alias("window_start"),
        "event_type",
        "n",
        "total_value",
    )


@register(
    "event_rollup_combined",
    doc=(
        "Continuous aggregate (operators/rollup.py): hourly buckets before "
        "the Jan-15 cutoff are MATERIALIZED once (parquet partitioned by "
        "day — closed windows never change), then the full-range histogram "
        "is answered as materialized-buckets UNION an on-the-fly aggregate "
        "of the raw tail. The cutoff sits on a bucket boundary so the two "
        "sides are bucket-disjoint and nothing re-aggregates. The oracle "
        "aggregates the raw table directly — the query proves the rewrite "
        "is exact, which is the correctness obligation of any materialized "
        "view. At 100 TB this turns dashboard histograms into bounded "
        "reads: the rollup is (buckets x keys) rows however large raw "
        "grows."
    ),
    oracle="""
        SELECT date_trunc('hour', ts) AS hour_bucket,
               event_type,
               COUNT(*) AS n,
               ROUND(SUM(value), 2) AS total_value
        FROM events GROUP BY 1, 2
    """,
)
def event_rollup_combined(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from biocache_store_spark.operators.rollup import rollup_query, write_rollup

    events = read_table(spark, sf_dir, "events")
    cutoff = "2024-01-15 00:00:00"
    path = tempfile.mkdtemp(prefix="rollup_") + "/hourly"
    write_rollup(events, path, cutoff)
    return rollup_query(spark, path, events, cutoff)
