"""Map loader: batch-insert records supplied as plain property maps.

Port of load/MapDataLoader.scala:11-39 — the API ingest path: each record
arrives as a {header: value} map, keys are canonicalised through the DwC
term vocabulary (DwC.retrieveCanonicals), a rowKey is minted from the
data resource + unique-term values, and the records enter the store like
any loader output. Spark shape: one createDataFrame over the union of
canonical keys; identity minting reuses the DwC CSV loader's uuid5 path
(sources/csv_loader.py add_record_identity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from biocache_store_spark.sources.csv_loader import add_record_identity
from biocache_store_spark.sources.dwc_terms import match_term


def canonicalise_keys(record: dict) -> dict:
    """DwC.retrieveCanonicals: unknown keys pass through unchanged
    (MapDataLoader.scala:30-32)."""
    return {match_term(k) or k: v for k, v in record.items()}


def load_map_records(
    spark: SparkSession,
    values: list[dict],
    data_resource_uid: str,
    unique_terms: list[str],
) -> DataFrame:
    """Load a batch of property-map records; returns the records DataFrame
    with minted rowKey/uuid columns (the reference returns the uuid list —
    select("rowKey") for that)."""
    canonical = [canonicalise_keys(r) for r in values]
    columns = sorted({k for r in canonical for k in r})
    schema = T.StructType(
        [T.StructField(c, T.StringType(), True) for c in columns]
    )
    rows = [
        tuple(None if r.get(c) is None else str(r.get(c)) for c in columns)
        for r in canonical
    ]
    # Arrow path (util.arrow_rows_df): a Python-list createDataFrame
    # plans as a pickled-RDD scan that re-crosses the Python boundary on
    # every downstream action — a real tax once the loaded batch feeds
    # dedup/enrichment chains.
    from biocache_store_spark.util import arrow_rows_df

    df = arrow_rows_df(spark, schema, rows)
    return add_record_identity(df, data_resource_uid, unique_terms)
