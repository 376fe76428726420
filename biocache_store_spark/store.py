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
    set-difference against the full code table.

    explode_outer: a record whose assertions array is empty or null must
    still surface (one row with null code) — plain explode would drop it
    entirely, making an all-codes-unchecked record indistinguishable
    from one that doesn't exist and breaking the set-difference."""
    return occ.select(
        F.col(key_col), F.explode_outer(F.col("assertions")).alias("a")
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
    """Store.writeToStream: bounded-memory iteration for API consumers
    (delegates to the exporters' stream_records — one implementation)."""
    from biocache_store_spark.exports.exporters import stream_records

    return stream_records(occ, fields)


def get_duplicate_details(dups: DataFrame, uuid: str) -> DataFrame:
    """Store.getDuplicateDetails (Store.scala:676-681) /
    DuplicateDAO.getDuplicateInfo: the duplicate-store rows forming the
    uuid's cluster — the representative plus every member sharing it
    (the reference's DuplicateRecordDetails carries exactly that: the
    record, its rowKey link and the associated duplicates). Empty for a
    unique/untested uuid, matching the reference's empty-details return.

    `dups` is the detect_duplicates output (the persisted duplicate
    store). The uuid probe is a one-row relation broadcast into the
    membership join, so the read costs one store scan — partition-pruned
    when the store is partitioned and the caller pre-filters — never a
    collect."""
    rec = dups.filter(
        (F.col("row_key") == uuid) & (F.col("status") != "U")
    ).select(
        F.when(F.col("status") == "R", F.col("row_key"))
        .otherwise(F.col("duplicate_of"))
        .alias("__rep")
    )
    return dups.join(
        F.broadcast(rec),
        (
            (dups["row_key"] == F.col("__rep"))
            | (dups["duplicate_of"] == F.col("__rep"))
        )
        & (dups["status"] != "U"),
        "inner",
    ).drop("__rep")


def get_duplicates_for(
    dups: DataFrame, lsid: str, year: str, month: str, day: str
) -> DataFrame:
    """DuplicateDAO.getDuplicatesFor (DuplicateDAOImpl.scala:92-104): the
    existing duplicate cluster rows for one (taxon, year, month, day)
    group key — the incremental re-check read. Blank date parts match the
    store's ''-coalesced group keys."""
    return dups.filter(
        (F.col("taxon") == lsid)
        & (F.col("year") == (year or ""))
        & (F.col("month") == (month or ""))
        & (F.col("day") == (day or ""))
        & (F.col("status") != "U")
    )


# ---------------------------------------------------------------------------
# User assertions (Store.scala:322-412) — thin façade over
# operators/user_assertions; the store is a (rowKey, uuid)-keyed DataFrame
# the caller persists between calls (Delta-style rewrites, like the delete/
# upsert maintenance ops).
# ---------------------------------------------------------------------------


def get_user_assertions(assertions: DataFrame, row_key: str) -> DataFrame:
    """Store.getUserAssertions."""
    return assertions.filter(F.col("rowKey") == row_key)


def get_user_assertion(
    assertions: DataFrame, row_key: str, assertion_uuid: str
) -> DataFrame:
    """Store.getUserAssertion."""
    return assertions.filter(
        (F.col("rowKey") == row_key) & (F.col("uuid") == assertion_uuid)
    )


def add_user_assertion(assertions: DataFrame, new_assertion: DataFrame) -> DataFrame:
    """Store.addUserAssertion — returns the rewritten store; recompute the
    per-record status with operators.user_assertions.combined_user_status
    (the reference reindexes the touched rowKey here)."""
    from biocache_store_spark.operators.user_assertions import add_user_assertions

    return add_user_assertions(assertions, new_assertion)


def delete_user_assertion(
    assertions: DataFrame, row_key: str, assertion_uuid: str
) -> DataFrame:
    """Store.deleteUserAssertion — returns the rewritten store."""
    from biocache_store_spark.operators.user_assertions import (
        delete_user_assertions,
    )

    spark = assertions.sparkSession
    from biocache_store_spark.util import local_rows_df

    keys = local_rows_df(
        spark, "rowKey string, uuid string", [(row_key, assertion_uuid)]
    )
    return delete_user_assertions(assertions, keys)


# ---------------------------------------------------------------------------
# Validation rules (Store.scala:380-394 addValidationRule/getValidationRule/
# getValidationRules/deleteValidationRule) — the rule table is a plain
# DataFrame with one row per rule; apply with
# operators/validation_rules.apply_rule_delta.
# ---------------------------------------------------------------------------

VALIDATION_RULE_COLUMNS = [
    "rule_id", "query", "assertion_code", "assertion_name", "comment",
    "wkt", "bbox",
]


def upsert_validation_rule(rules: DataFrame, rule) -> DataFrame:
    """Store.addValidationRule (upsert by rule_id)."""
    spark = rules.sparkSession
    from biocache_store_spark.util import local_rows_df

    row = local_rows_df(
        spark,
        "rule_id string, query string, assertion_code int, "
        "assertion_name string, comment string, wkt string, "
        "bbox array<double>",
        [(
            rule.rule_id, rule.query, rule.assertion_code,
            rule.assertion_name, rule.comment, rule.wkt,
            list(rule.bbox) if rule.bbox is not None else None,
        )],
    )
    # shared upsert primitive (null-safe on the key — a plain != filter
    # would silently drop any NULL-keyed row on every unrelated upsert)
    from biocache_store_spark.operators.maintenance import upsert

    return upsert(rules, row, key_col="rule_id")


def get_validation_rules(rules: DataFrame, rule_ids: list[str] | None = None) -> DataFrame:
    """Store.getValidationRule(s)."""
    if rule_ids is None:
        return rules
    return rules.filter(F.col("rule_id").isin(rule_ids))


def delete_validation_rule(rules: DataFrame, rule_id: str) -> DataFrame:
    """Store.deleteValidationRule (null-safe: other rules — including a
    NULL-keyed row — are untouched)."""
    return rules.filter(~F.col("rule_id").eqNullSafe(rule_id))
