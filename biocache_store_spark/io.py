"""Readers over the driver-provided parquet tables.

The reference's scan surface (PersistenceManager.scala:19-191 --
pageOverAll / pageOverLocal / pageOverSelect / pageOverIndexedField /
selectRows) collapses to `spark.read.parquet` + select/filter: Catalyst
does column pruning and predicate pushdown, file splits give the
token-range parallelism, and task retry replaces the checkpoint file.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_SF_DIR = "/root/testdata/sf0.1"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Full-table scan (reference: pageOverAll / pageOverLocal).

    Partition-parallel by parquet file splits; column pruning and filter
    pushdown happen automatically on whatever the caller selects next.

    `events.parquet` carries INT64 TIMESTAMP(NANOS) which Spark's parquet
    reader rejects by default; we read nanos as long and rebuild a
    timestamp_ntz with pure integer arithmetic (no session-timezone
    dependence, so results compare exactly against DuckDB's naive
    microsecond timestamps).
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts",
                # FLOOR division, not `div` (truncate-toward-zero): a
                # pre-epoch nanosecond timestamp with a fractional-µs part
                # would otherwise land 1 µs late vs DuckDB's nanosecond
                # read. pmod keeps it in exact integer arithmetic.
                F.expr(
                    "timestampadd(MICROSECOND, (ts - pmod(ts, 1000)) div 1000,"
                    " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ),
            )
        return df
    return spark.read.parquet(path)


def read_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: read_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql() can be used."""
    for name in TABLES:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)
