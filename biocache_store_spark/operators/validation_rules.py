"""Validation rules: stored queries applied as assertions.

Port of qa/ValidationRuleRunner.scala:151-260: a validation rule persists a
query (SOLR q string, optionally a WKT area) and an assertion; applying a
rule asserts every matching record, and re-applying after data changes must
also UN-assert records that no longer match (new-minus-old / old-minus-new
set difference, ValidationRuleRunner.applyCommon/modifyList).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from biocache_store_spark.plans.solr_query import qid_predicate


@dataclass(frozen=True)
class ValidationRule:
    """A stored query + assertion. Like the reference's Qid/ValidationRule
    (model/Qid.scala:9, model/ValidationRule.scala) the scope may carry a
    WKT polygon and/or a [minX, minY, maxX, maxY] bbox alongside the q
    string; both become static Column predicates over the coordinate
    columns (plans/solr_query.wkt_predicate / bbox_predicate)."""

    rule_id: str
    query: str  # SOLR q string over index-table columns
    assertion_code: int
    assertion_name: str
    comment: str = ""
    wkt: str | None = None
    bbox: tuple[float, float, float, float] | None = None
    lat_col: str = "decimalLatitude"
    lon_col: str = "decimalLongitude"


def _rule_predicate(rule: ValidationRule, field_mapping: dict[str, str] | None):
    return qid_predicate(
        rule.query,
        wkt=rule.wkt,
        bbox=list(rule.bbox) if rule.bbox is not None else None,
        lat_col=rule.lat_col,
        lon_col=rule.lon_col,
        field_mapping=field_mapping,
    )


def matching_ids(
    df: DataFrame, rule: ValidationRule, id_col: str = "id",
    field_mapping: dict[str, str] | None = None,
) -> DataFrame:
    """Record ids currently matching the rule's stored query (q AND the
    optional wkt/bbox area)."""
    return df.filter(_rule_predicate(rule, field_mapping)).select(
        F.col(id_col).alias("record_id")
    )


def apply_rule_delta(
    df: DataFrame,
    rule: ValidationRule,
    previously_asserted: DataFrame | None = None,
    id_col: str = "id",
    field_mapping: dict[str, str] | None = None,
) -> DataFrame:
    """(record_id, action) delta for a rule application:
    'assert' for newly matching records, 'unassert' for records asserted
    before but no longer matching (ValidationRuleRunner.scala:173-260)."""
    current = matching_ids(df, rule, id_col, field_mapping)
    if previously_asserted is None:
        return current.select("record_id", F.lit("assert").alias("action"))
    prev = previously_asserted.select(F.col("record_id"))
    to_assert = current.subtract(prev).select(
        "record_id", F.lit("assert").alias("action")
    )
    to_unassert = prev.subtract(current).select(
        "record_id", F.lit("unassert").alias("action")
    )
    return to_assert.unionByName(to_unassert)


def annotate_with_rule(
    df: DataFrame,
    rule: ValidationRule,
    field_mapping: dict[str, str] | None = None,
) -> DataFrame:
    """Append the rule's assertion to each record's assertions array:
    failed (qa_status 0) for matches, passed (1) otherwise."""
    matches = _rule_predicate(rule, field_mapping)
    assertion = F.struct(
        F.lit(rule.assertion_code).alias("code"),
        F.lit(rule.assertion_name).alias("name"),
        F.when(matches, F.lit(0)).otherwise(F.lit(1)).alias("qa_status"),
        F.lit(rule.comment).alias("comment"),
    )
    from biocache_store_spark.processors.assertions import append_assertion

    return append_assertion(df, assertion)
