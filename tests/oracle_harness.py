"""Local replica of the driver's DuckDB-oracle comparator.

Runs a registry query through Spark and its oracle SQL through DuckDB on the
same parquet tables, then compares row count, column-name set, column DTYPE
KIND, and values order-insensitively (columns sorted by name, rows sorted by
all columns) — the same gate CORRECTNESS_r{N}.json records.

The dtype check exists because the driver's value-hash is dtype-sensitive:
a DuckDB HUGEINT aggregate (e.g. un-CAST `SUM(...)`) materializes as pandas
float64 while Spark returns int64, producing value-equal frames that hash
differently (the round-4 `span_dedup` / `sequence_packing` /
`embedding_quantize` failure class). A green run here must mean a green
driver run, so int-vs-float (and bool-vs-int, numeric-vs-object) column
kinds are treated as mismatches even when every value compares equal.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
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


def _scalar_kind(x) -> str:
    """Classify one non-null value into the kind lattice used for columns."""
    if isinstance(x, (bool, np.bool_)):
        return "bool"
    if isinstance(x, (int, np.integer)):
        return "int"
    if isinstance(x, (float, np.floating)):
        return "float"
    return "object"


def _column_kind(series: pd.Series) -> str:
    """Canonical dtype kind: widths don't matter (int32==int64 hash the same
    once values become Python ints) but int/float/bool/object/datetime do.

    Object columns are classified by their non-null contents, because DuckDB
    returns some typed results as object arrays (e.g. decimal, list) and a
    nullable int column can surface as object-with-ints on one engine and
    int64 on the other — those must compare as the same kind.
    """
    kind = series.dtype.kind
    if kind in "iu":
        return "int"
    if kind == "f":
        return "float"
    if kind == "b":
        return "bool"
    if kind in "mM":
        return "datetime"
    vals = [v for v in series if v is not None and not (isinstance(v, float) and math.isnan(v))]
    if not vals:
        return "empty"
    kinds = {_scalar_kind(v) for v in vals}
    return kinds.pop() if len(kinds) == 1 else "object"


def _kinds_compatible(a: str, b: str) -> bool:
    if "empty" in (a, b):
        return True
    return a == b


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    # dtype-strict: int 1 vs float 1.0 (the HUGEINT→float64 class) and
    # bool vs int are DIFFERENT — the driver's hash sees them differently.
    ka, kb = _scalar_kind(a), _scalar_kind(b)
    if ka != kb and "object" not in (ka, kb):
        return False
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
        ks, ko = _column_kind(s[col]), _column_kind(o[col])
        if not _kinds_compatible(ks, ko):
            problems.append(
                f"column {col}: dtype kind mismatch spark={ks}({s[col].dtype}) "
                f"oracle={ko}({o[col].dtype}) — value-hash WILL differ at the "
                f"driver even if values are equal; CAST the oracle aggregate"
            )
            continue
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
