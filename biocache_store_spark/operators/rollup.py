"""Continuous aggregate ("hypertable rollup"): materialize closed time
buckets once, answer full-range queries as materialized-buckets UNION
on-the-fly tail.

The reference's index precomputes occurrence_year/decade buckets per
record (index/IndexDAO.scala:578-585); at event-stream scale the same
need becomes a time-partitioned rollup table — the TimescaleDB/"continuous
aggregate" pattern: buckets strictly before a cutoff are CLOSED (late
data beyond the watermark is dropped by contract, cf.
streaming/incremental.py), so they are aggregated exactly once and
persisted partitioned by day; only the open tail after the cutoff is
aggregated from raw at query time. A query over the full range is then

    read(rollup)  UNION ALL  aggregate(raw WHERE ts >= cutoff)

with NO re-aggregation: the cutoff lies on a bucket boundary, so the two
sides' buckets are disjoint by construction. Incremental refresh is the
same dynamic-partition-overwrite shape as streaming store maintenance —
recompute only the day partitions newly closed since the last cutoff.

At 100 TB this converts every dashboard-style histogram from a full scan
into a bounded read: the rollup table is (buckets x keys) rows however
large the raw table grows, and day-partition pruning serves range
queries from a handful of files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _require_hour_boundary(cutoff: str) -> None:
    """The closed/tail split is bucket-disjoint ONLY when the cutoff lies
    on an hour boundary; a misaligned cutoff would silently emit two
    partial rows per (hour_bucket, key) for the boundary hour. Fail loudly
    instead of producing quietly-wrong unions."""
    import datetime as _dt

    ts = _dt.datetime.fromisoformat(cutoff)
    if (ts.minute, ts.second, ts.microsecond) != (0, 0, 0):
        raise ValueError(
            f"rollup cutoff must lie on an hour boundary, got {cutoff!r}: "
            "the materialized side and the raw tail would each emit a "
            "partial row for the boundary hour"
        )


def write_rollup(
    events: DataFrame,
    path: str,
    cutoff: str,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> None:
    """Materialize hourly buckets strictly before `cutoff` (an hour
    boundary), partitioned by day. Sums are stored UNROUNDED — rounding
    is a presentation concern applied at query output, so refresh can
    never compound rounding error.

    The write is a DYNAMIC partition overwrite over (day, hour): only
    the hour partitions present in this aggregation are replaced. Hour
    granularity matters for the boundary day — cutoffs are hour-aligned,
    so an incremental refresh that passes only the newly-closed hours'
    events must not wipe the boundary day's ALREADY-materialized earlier
    hours (day-level overwrite silently did exactly that). Re-running
    the same refresh rewrites the same partitions with the same
    contents, where a plain append would double-count."""
    _require_hour_boundary(cutoff)
    agg = (
        events.filter(F.col(ts_col) < F.lit(cutoff).cast("timestamp_ntz"))
        .groupBy(
            F.date_trunc("hour", F.col(ts_col)).alias("hour_bucket"),
            F.col(key_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(value_col).alias("sum_value"),
        )
        .withColumn("day", F.to_date("hour_bucket"))
        .withColumn("hour", F.hour("hour_bucket"))
    )
    (
        agg.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day", "hour")
        .parquet(path)
    )


def rollup_query(
    spark: SparkSession,
    path: str,
    events: DataFrame,
    cutoff: str,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Full-range hourly aggregate = materialized closed buckets + raw
    tail, bucket-disjoint by the cutoff contract. Output is identical to
    aggregating the raw table directly (the registered query's oracle
    does exactly that)."""
    _require_hour_boundary(cutoff)
    closed = spark.read.parquet(path).select(
        "hour_bucket", key_col, "n", "sum_value"
    )
    tail = (
        events.filter(F.col(ts_col) >= F.lit(cutoff).cast("timestamp_ntz"))
        .groupBy(
            F.date_trunc("hour", F.col(ts_col)).alias("hour_bucket"),
            F.col(key_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(value_col).alias("sum_value"),
        )
    )
    return closed.unionByName(tail).select(
        "hour_bucket",
        key_col,
        "n",
        F.round(F.col("sum_value"), 2).alias("total_value"),
    )
