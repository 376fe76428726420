"""Expert-distribution outliers + validation-rule apply/unapply."""

from __future__ import annotations

import pytest

from biocache_store_spark.operators.outlier_distribution import (
    distance_outside_m,
)
from biocache_store_spark.operators.sampling import parse_wkt_polygon

RING = parse_wkt_polygon("POLYGON((140 -40, 150 -40, 150 -30, 140 -30, 140 -40))")


def test_distance_outside():
    assert distance_outside_m(145.0, -35.0, RING) == 0.0  # inside
    d = distance_outside_m(139.0, -35.0, RING)  # 1 degree west of edge
    assert d == pytest.approx(1.0 * 111320.0 * 0.8191, rel=0.01)  # cos(-35)
    d2 = distance_outside_m(145.0, -29.0, RING)  # 1 degree north
    assert d2 == pytest.approx(110540.0, rel=0.01)


def test_find_outliers(spark):
    from biocache_store_spark.operators.outlier_distribution import find_outliers

    records = spark.createDataFrame(
        [
            ("o1", "lsid:a", "-35.0", "145.0"),  # inside
            ("o2", "lsid:a", "-35.0", "139.0"),  # outside west
            ("o3", "lsid:b", "-35.0", "139.0"),  # no distribution -> untested
            ("o4", "lsid:a", None, None),  # no coords -> untested
        ],
        "occurrenceID string, taxonConceptID string, decimalLatitude string,"
        " decimalLongitude string",
    )
    dist = spark.createDataFrame(
        [("lsid:a", "POLYGON((140 -40, 150 -40, 150 -30, 140 -30, 140 -40))")],
        "taxonConceptID string, wkt string",
    )
    out = {r["occurrence_id"]: r for r in find_outliers(records, dist).collect()}
    assert set(out) == {"o1", "o2"}
    assert out["o1"]["in_range"] is True
    assert out["o2"]["in_range"] is False
    assert out["o2"]["distance_outside_m"] > 90000


def test_validation_rule_apply_unapply(spark):
    from biocache_store_spark.operators.validation_rules import (
        ValidationRule,
        apply_rule_delta,
        annotate_with_rule,
        matching_ids,
    )

    rule = ValidationRule("vr1", "state:Victoria AND year:[2000 TO *]", 20019,
                          "userAssertionOther", "suspect region")
    df = spark.createDataFrame(
        [("r1", "Victoria", 2005), ("r2", "Victoria", 1999), ("r3", "Tasmania", 2005)],
        "id string, state string, year int",
    )
    ids = {r["record_id"] for r in matching_ids(df, rule).collect()}
    assert ids == {"r1"}

    # first application: everything matching is asserted
    delta = {
        (r["record_id"], r["action"]) for r in apply_rule_delta(df, rule).collect()
    }
    assert delta == {("r1", "assert")}

    # data changed: r1 no longer matches, r3 newly matches
    df2 = spark.createDataFrame(
        [("r1", "Queensland", 2005), ("r3", "Victoria", 2005)],
        "id string, state string, year int",
    )
    prev = spark.createDataFrame([("r1",)], "record_id string")
    delta2 = {
        (r["record_id"], r["action"])
        for r in apply_rule_delta(df2, rule, prev).collect()
    }
    assert delta2 == {("r3", "assert"), ("r1", "unassert")}

    annotated = {r["id"]: r for r in annotate_with_rule(df, rule).collect()}
    a1 = annotated["r1"]["assertions"][0]
    assert (a1["code"], a1["qa_status"], a1["comment"]) == (20019, 0, "suspect region")
    assert annotated["r2"]["assertions"][0]["qa_status"] == 1
