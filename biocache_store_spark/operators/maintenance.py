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

from pyspark.sql import Column, DataFrame
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


# --- resource cleanup (tool/ResourceCleanupTask.scala) -------------------

# columns the reference never strips (ResourceCleanupTask.scala:133,
# valuesToIgnore) plus the identity/partition columns this engine adds,
# PLUS the store's bookkeeping columns. The reference only ever deletes
# fields for which `fullRecord.hasNestedProperty(fieldName)` holds
# (ResourceCleanupTask.scala:140) — i.e. raw DwC record properties —
# so lifecycle columns like the deleted flag and lastModifiedTime are
# structurally immune there. This engine stores them alongside the raw
# columns in one table, so they must be protected explicitly: nulling
# lastModifiedTime would make a later `rows` cleanup treat every record
# as stale (its no-lastModified branch deletes unconditionally), and
# nulling `deleted`/`processed`/`assertions` destroys store state no
# column cleanup is licensed to touch.
_CLEANUP_PROTECTED = (
    "rowKey",
    "uuid",
    "originalSensitiveValues",
    "dataResourceUid",
    "deleted",
    "dateDeleted",
    "lastModifiedTime",
    "firstLoaded",
    "processed",
    "assertions",
    "userAssertions",
)


def is_deleted_flag(col: Column) -> Column:
    """The store's deleted-flag convention in one place: the flag holds a
    deletion-date STRING, so any value other than null/''/'false' means
    deleted ('false' is accepted so BooleanType columns cast cleanly).
    Shared by cleanup_rows, remove_deleted_records, the index projection
    and the scan-records CLI so no consumer re-implements the test."""
    return ~F.coalesce(col.cast("string"), F.lit("")).isin("", "false")


def cleanup_rows(
    table: DataFrame,
    data_resource_uid: str,
    last_load_date: str,
    dr_col: str = "dataResourceUid",
    modified_col: str = "lastModifiedTime",
    deleted_col: str = "deleted",
    delete_time: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """`resource-cleanup ... rows`: mark the resource's records deleted
    when not reloaded since `last_load_date`, and REINSTATE previously
    deleted records the latest load did refresh — the two branches of
    ResourceCleanupTask.modifyRecord (ResourceCleanupTask.scala:308-348,
    incl. the no-lastModified branch, which deletes unconditionally).

    The deleted flag follows the store's string convention (a deletion
    date; empty/'false' = live). Returns (rewritten table, changes log
    with rowKey + action 'deleted'|'reinstated') — one projection pass,
    no paging loop; at scale this is a partition-pruned rewrite when the
    store is partitioned by resource."""
    in_dr = F.col(dr_col) == data_resource_uid
    lm = F.col(modified_col).cast("string")
    stale = lm.isNull() | (lm == "") | (lm < last_load_date)
    # string view of the flag up front: the rewrite mixes existing values
    # with a deletion-date string and '', so a BooleanType input column
    # must be widened to string BEFORE the when/otherwise (mixing boolean
    # and string branches fails analysis)
    old_flag = F.col(deleted_col).cast("string")
    was_deleted = is_deleted_flag(old_flag)
    when_deleted = (
        F.lit(delete_time)
        if delete_time is not None
        else F.date_format(F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss'Z'")
    )
    action = F.when(in_dr & stale & ~was_deleted, F.lit("deleted")).when(
        in_dr & ~stale & was_deleted, F.lit("reinstated")
    )
    new_flag = (
        F.when(~in_dr, old_flag)
        .when(stale, F.when(was_deleted, old_flag).otherwise(when_deleted))
        .otherwise(F.lit(""))
    )
    rewritten = table.withColumn(deleted_col, new_flag)
    changes = (
        table.withColumn("__action", action)
        .filter(F.col("__action").isNotNull())
        .select("rowKey", F.col("__action").alias("action"))
    )
    return rewritten, changes


def cleanup_columns(
    table: DataFrame,
    data_resource_uid: str | None,
    columns: list[str],
    keep: bool = True,
    dr_col: str = "dataResourceUid",
    protected: tuple[str, ...] = _CLEANUP_PROTECTED,
) -> tuple[DataFrame, DataFrame]:
    """`resource-cleanup ... columns`: null out raw columns on the
    resource's records — keep=True clears every non-protected column NOT
    in `columns` (removeRawRecordColumnsNotInList,
    ResourceCleanupTask.scala:126-166), keep=False clears exactly the
    listed columns (removeSpecifiedColumns, :168-199). The Cassandra
    deleteColumns-per-record loop becomes one conditional projection;
    other resources' records pass through untouched. Returns (rewritten
    table, report of column -> records cleared) — the tool's summary
    log as a DataFrame.

    `data_resource_uid=None` clears the columns on EVERY record — the
    whole-table variant (DeleteLocalColumn, tool/DeleteLocalColumn.scala:
    12-69): the reference's per-node token-range full scan is just the
    same projection without the resource predicate here."""
    in_dr = (
        F.lit(True)
        if data_resource_uid is None
        else F.col(dr_col) == data_resource_uid
    )
    if keep:
        targets = [
            c for c in table.columns if c not in columns and c not in protected
        ]
    else:
        targets = [c for c in table.columns if c in columns and c not in protected]
    rewritten = table.select(
        *[
            F.when(in_dr, F.lit(None))
            .otherwise(F.col(c))
            .cast(dict(table.dtypes)[c])
            .alias(c)
            if c in targets
            else F.col(c)
            for c in table.columns
        ]
    )
    if targets:
        report = (
            table.filter(in_dr)
            .select(
                F.explode(
                    F.array(
                        *[
                            F.when(
                                F.col(c).isNotNull(), F.lit(c)
                            )
                            for c in targets
                        ]
                    )
                ).alias("column")
            )
            .filter(F.col("column").isNotNull())
            .groupBy("column")
            .agg(F.count(F.lit(1)).alias("records_cleared"))
        )
    else:
        from biocache_store_spark.util import empty_df

        report = empty_df(
            table.sparkSession, "column string, records_cleared long"
        )
    return rewritten, report


def rename_columns(
    table: DataFrame, mapping: dict[str, str]
) -> DataFrame:
    """Column-rename sweep (tool/RenameColumns.scala:11-50: the layer-name
    -> cl/el-id migration): every old column's ORIGINAL values move to
    the new name and the old column drops — one projection built from
    the original table, so the whole mapping applies SIMULTANEOUSLY.
    Chained maps ({a->b, b->c}) and swaps ({a->b, b->a}) therefore
    behave like the reference's snapshot semantics (it reads each
    record's map once, then puts from that snapshot), where a sequential
    withColumn chain would feed one rename's output into the next and
    silently destroy data. When the NEW name already exists and is NOT
    itself renamed away, a record's old value wins where present and the
    existing value survives where the old cell was absent (the
    reference's per-cell put). Two olds mapping to one new would be an
    ambiguous merge — rejected. Pass the site's own layer map; the
    reference's default map is deployment config."""
    mapping = {
        o: n for o, n in mapping.items() if o in table.columns and o != n
    }
    targets = list(mapping.values())
    if len(set(targets)) != len(targets):
        dupes = sorted({t for t in targets if targets.count(t) > 1})
        raise ValueError(
            f"rename_columns: multiple old columns map to {dupes} — an "
            "ambiguous merge; rename them in separate passes"
        )
    inv = {n: o for o, n in mapping.items()}
    cols = []
    for c in table.columns:
        if c in inv:
            # this position receives old's ORIGINAL values; if the
            # existing column isn't itself renamed away, it survives
            # where the old cell was absent
            moved = F.col(inv[c])
            value = moved if c in mapping else F.coalesce(moved, F.col(c))
            cols.append(value.alias(c))
        elif c in mapping:
            continue  # renamed away; its target is emitted elsewhere
        else:
            cols.append(F.col(c))
    for o, n in mapping.items():
        if n not in table.columns:  # brand-new target: append
            cols.append(F.col(o).alias(n))
    return table.select(*cols)


def remove_deleted_records(
    table: DataFrame,
    data_resource_uid: str,
    last_load_date: str,
    dr_col: str = "dataResourceUid",
    modified_col: str = "lastModifiedTime",
    deleted_col: str = "deleted",
    key_col: str = "rowKey",
) -> tuple[DataFrame, DataFrame]:
    """`resource-cleanup ... delete`: physically remove the resource's
    records that are BOTH flagged deleted and stale (last modified
    before `last_load_date`), returning (remaining, delete log) — the
    occ -> dellog move of ResourceCleanupTask.removeDeletedRecords
    (ResourceCleanupTask.scala:352-385) with the same double condition
    (the deleted flag alone is not enough; a record refreshed after the
    date survives even if still flagged)."""
    is_deleted = is_deleted_flag(F.col(deleted_col))
    lm = F.col(modified_col).cast("string")
    cond = (
        (F.col(dr_col) == data_resource_uid)
        & is_deleted
        & lm.isNotNull()
        & (lm < last_load_date)
    )
    remaining = table.filter(~F.coalesce(cond, F.lit(False)))
    dellog = table.filter(F.coalesce(cond, F.lit(False))).select(
        F.col(key_col).alias("deleted_key"),
        F.current_timestamp().alias("deleted_at"),
    )
    return remaining, dellog


def remap_unique_keys(
    records: DataFrame,
    data_resource_uids: list[str],
    fields: list[str],
    dr_col: str = "dataResourceUid",
    key_col: str = "rowKey",
) -> DataFrame:
    """`remap-unique-id` (util/RemapUniqueKey.scala:33-47): when a
    dataset's unique-key field list changes (e.g. catalogNumber ->
    occurrenceID), mint the NEW unique id from the new field list and
    emit the occ_uuid mapping table (uniqueID -> rowKey) that lets
    lookups under the new key reach the existing records. The id is
    createUniqueID with stripSpaces (OccurrenceDAOImpl.scala:163-169):
    'dr|term1|...|termN' with ALL whitespace removed. Records whose
    identifying terms are all empty are skipped, as the reference skips
    them. One filtered projection — the paging loop and per-record put
    become a DataFrame the caller persists (or feeds to upsert)."""
    terms = [
        F.coalesce(F.col(f).cast("string"), F.lit(""))
        if f in records.columns
        else F.lit("")
        for f in fields
    ]
    any_term = F.lit(False)
    for t in terms:
        any_term = any_term | (t != "")
    unique_id = F.regexp_replace(
        F.trim(F.concat_ws("|", F.col(dr_col), *terms)), r"\s", ""
    )
    return (
        records.filter(F.col(dr_col).isin(list(data_resource_uids)))
        .filter(any_term)
        .select(unique_id.alias("uniqueID"), F.col(key_col).alias(key_col))
    )
