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

from biocache_store_spark.plans.solr_query import translate


@dataclass(frozen=True)
class ValidationRule:
    rule_id: str
    query: str  # SOLR q string over index-table columns
    assertion_code: int
    assertion_name: str
    comment: str = ""


def matching_ids(
    df: DataFrame, rule: ValidationRule, id_col: str = "id",
    field_mapping: dict[str, str] | None = None,
) -> DataFrame:
    """Record ids currently matching the rule's stored query."""
    return df.filter(translate(rule.query, field_mapping)).select(
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
    matches = translate(rule.query, field_mapping)
    assertion = F.struct(
        F.lit(rule.assertion_code).alias("code"),
        F.lit(rule.assertion_name).alias("name"),
        F.when(matches, F.lit(0)).otherwise(F.lit(1)).alias("qa_status"),
        F.lit(rule.comment).alias("comment"),
    )
    if "assertions" in df.columns:
        return df.withColumn(
            "assertions", F.concat(F.col("assertions"), F.array(assertion))
        )
    return df.withColumn("assertions", F.array(assertion))
