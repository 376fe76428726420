"""Local replica of the driver's DuckDB-oracle comparator.

Runs a registry query through Spark and its oracle SQL through DuckDB on the
same parquet tables, then compares row count, column-name set, and values
order-insensitively (columns sorted by name, rows sorted by all columns) —
the same gate CORRECTNESS_r{N}.json records, so a green run here means a
green driver run.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from biocache_store_spark.io import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        # unify timestamp resolutions (spark: ns, duckdb: us)
        if pd.api.types.is_datetime64_any_dtype(df[col]):
            df[col] = df[col].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def compare(spark_df, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = exact match)."""
    problems: list[str] = []
    spark_pdf = spark_df.toPandas()
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"schema mismatch: spark={sorted(spark_pdf.columns)} "
            f"oracle={sorted(oracle_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
        return problems
    s = _canonicalize(spark_pdf)
    o = _canonicalize(oracle_pdf)
    for col in s.columns:
        sv, ov = s[col].tolist(), o[col].tolist()
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(sv, ov)) if not _values_equal(x, y)
        ]
        if bad:
            i, x, y = bad[0]
            problems.append(
                f"column {col}: {len(bad)}/{len(sv)} values differ; "
                f"first at sorted-row {i}: spark={x!r} oracle={y!r}"
            )
    return problems


def run_query_pair(spark, sf_dir: str, name: str) -> list[str]:
    from biocache_store_spark.queries import load_all

    q = load_all()[name]
    if q.oracle is None:
        df = q.spark_fn(spark, sf_dir)
        return [] if df.count() >= 0 else ["spark query failed"]
    con = duckdb_conn(sf_dir)
    try:
        oracle_pdf = con.execute(q.oracle).df()
    finally:
        con.close()
    return compare(q.spark_fn(spark, sf_dir), oracle_pdf)
