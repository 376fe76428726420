"""Store: the read/maintenance API facade.

Port of the reference's client API surface (Store.scala) over the processed
occurrence table: point lookups, raw-vs-processed comparison, assertion
retrieval, streaming consumption. Each method is a thin, lazily-evaluated
DataFrame expression — callers compose further before any action runs.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from biocache_store_spark.processors.chain import PROCESSED_FIELDS


def get_by_row_key(occ: DataFrame, row_key: str, key_col: str = "rowKey") -> DataFrame:
    """Store.getByRowKey / OccurrenceDAO.getByRowKey."""
    return occ.filter(F.col(key_col) == row_key)


def get_comparison(occ: DataFrame, key_col: str = "rowKey") -> DataFrame:
    """Store.getComparison (Store.scala:92-125): long-format zip of raw vs
    processed values per field for every record."""
    pairs = []
    for field in PROCESSED_FIELDS:
        raw = (
            F.col(field).cast("string")
            if field in occ.columns
            else F.lit(None).cast("string")
        )
        pairs.append(
            F.struct(
                F.lit(field).alias("field"),
                raw.alias("raw"),
                F.col("processed")[field].alias("processed"),
            )
        )
    return occ.select(
        F.col(key_col), F.explode(F.array(*pairs)).alias("cmp")
    ).select(
        key_col,
        F.col("cmp.field").alias("field"),
        F.col("cmp.raw").alias("raw"),
        F.col("cmp.processed").alias("processed"),
    )


def get_all_system_assertions(occ: DataFrame, key_col: str = "rowKey") -> DataFrame:
    """Store.getAllSystemAssertions (Store.scala:301-317): exploded
    assertion rows per record, with the unchecked codes derivable by
    set-difference against the full code table."""
    return occ.select(
        F.col(key_col), F.explode(F.col("assertions")).alias("a")
    ).select(
        key_col,
        F.col("a.code").alias("code"),
        F.col("a.name").alias("name"),
        F.col("a.qa_status").alias("qa_status"),
        F.col("a.comment").alias("comment"),
    )


def records_with_failed_assertion(
    occ: DataFrame, code: int, key_col: str = "rowKey"
) -> DataFrame:
    """Index-style filter: records where a given assertion failed — array
    higher-order predicate, no explode."""
    return occ.filter(
        F.exists(
            F.col("assertions"),
            lambda a: (a["code"] == code) & (a["qa_status"] == 0),
        )
    )


def stream(occ: DataFrame, fields: list[str]) -> Iterator[list]:
    """Store.writeToStream: bounded-memory iteration for API consumers."""
    for row in occ.select(*fields).toLocalIterator():
        yield list(row)
