"""Table maintenance: deletes and upserts as DataFrame rewrites.

Ports of the reference's delete/upsert surface (SURVEY.md §2.2):
  * delete by key list — tool/DeleteRecords.scala / util/ListDelete: an
    anti-join against the keys set, with the removed keys logged (the
    `dellog` table becomes a returned DataFrame the caller persists);
  * delete by query — tool/QueryDelete.scala: the stored-query translator
    supplies the predicate;
  * upsert — load/SimpleLoader.scala / Store.upsertRecord: union + keep the
    newest version per key (Delta MERGE semantics expressed as a
    window-dedup rewrite for plain-parquet backends).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from biocache_store_spark.plans.solr_query import translate


def delete_by_keys(
    table: DataFrame, keys: DataFrame, key_col: str = "rowKey"
) -> tuple[DataFrame, DataFrame]:
    """Returns (remaining, delete_log). keys: single-column DataFrame."""
    keys_named = keys.toDF(key_col)
    remaining = table.join(F.broadcast(keys_named), key_col, "left_anti")
    deleted = table.join(F.broadcast(keys_named), key_col, "left_semi").select(
        F.col(key_col).alias("deleted_key"),
        F.current_timestamp().alias("deleted_at"),
    )
    return remaining, deleted


def delete_by_query(
    table: DataFrame, query: str, field_mapping: dict[str, str] | None = None,
    key_col: str = "rowKey",
) -> tuple[DataFrame, DataFrame]:
    """Delete every record matching a stored-query string."""
    predicate = translate(query, field_mapping)
    remaining = table.filter(~predicate)
    deleted = table.filter(predicate).select(
        F.col(key_col).alias("deleted_key"),
        F.current_timestamp().alias("deleted_at"),
    )
    return remaining, deleted


def upsert(
    table: DataFrame,
    updates: DataFrame,
    key_col: str = "rowKey",
    version_col: str | None = None,
) -> DataFrame:
    """Union + newest-per-key. With no version column, updates win over
    existing rows (the reference's put semantics)."""
    existing = table.withColumn("__src", F.lit(0))
    incoming = updates.withColumn("__src", F.lit(1))
    merged = existing.unionByName(incoming, allowMissingColumns=True)
    order = (
        [F.col(version_col).desc_nulls_last(), F.col("__src").desc()]
        if version_col
        else [F.col("__src").desc()]
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    return (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """Diff two corpus snapshots: per id, classify as added / removed /
    changed (same id, different content hash) / unchanged — the
    regression gate between two corpus builds (did tonight's build drop
    a source? rewrite documents it shouldn't have?).

    One full-outer join on the id with md5 content hashes compared
    JVM-side; output is one row per id in either snapshot with its
    status, so downstream rollups (status x source counts) are ordinary
    aggregations. At 100 TB both sides shuffle once on the id — the
    unavoidable cost of an exact diff — with hash comparison instead of
    text comparison keeping the shuffle rows narrow."""
    o = old.select(
        F.col(id_col).alias("__old_id"), F.md5(F.col(content_col)).alias("__old_h")
    )
    n = new.select(
        F.col(id_col).alias("__new_id"), F.md5(F.col(content_col)).alias("__new_h")
    )
    joined = o.join(n, o["__old_id"] == n["__new_id"], "full_outer")
    status = (
        F.when(F.col("__old_id").isNull(), "added")
        .when(F.col("__new_id").isNull(), "removed")
        # null-SAFE comparison: a side with NULL content must read as
        # changed, not fall through to unchanged (plain != yields NULL)
        .when(~F.col("__old_h").eqNullSafe(F.col("__new_h")), "changed")
        .otherwise("unchanged")
    )
    return joined.select(
        F.coalesce(F.col("__old_id"), F.col("__new_id")).alias(id_col),
        status.alias("status"),
    )
