"""Store facade: lookups, raw/processed comparison, assertion retrieval."""

from __future__ import annotations

import datetime as dt

import pytest

from biocache_store_spark.processors.chain import process_records


@pytest.fixture(scope="module")
def occ(spark):
    df = spark.createDataFrame(
        [
            ("k1", "dr1", "PreservedSpecimen", "1981-10-17", "-35.2", "144.8", "WGS84"),
            ("k2", "dr1", None, "bad date", "999", "999", None),
        ],
        "rowKey string, dataResourceUid string, basisOfRecord string,"
        " eventDate string, decimalLatitude string, decimalLongitude string,"
        " geodeticDatum string",
    )
    return process_records(df, today=dt.date(2026, 8, 13))


def test_get_by_row_key(spark, occ):
    from biocache_store_spark.store import get_by_row_key

    row = get_by_row_key(occ, "k1").collect()
    assert len(row) == 1 and row[0]["rowKey"] == "k1"


def test_get_comparison(spark, occ):
    from biocache_store_spark.store import get_comparison

    cmp = {
        (r["rowKey"], r["field"]): (r["raw"], r["processed"])
        for r in get_comparison(occ).collect()
    }
    assert cmp[("k1", "eventDate")] == ("1981-10-17", "1981-10-17")
    assert cmp[("k1", "basisOfRecord")] == ("PreservedSpecimen", "PreservedSpecimen")
    assert cmp[("k2", "eventDate")] == ("bad date", None)


def test_assertions_and_filter(spark, occ):
    from biocache_store_spark.store import (
        get_all_system_assertions,
        records_with_failed_assertion,
    )

    rows = get_all_system_assertions(occ).collect()
    assert {r["rowKey"] for r in rows} == {"k1", "k2"}
    # 5 = coordinatesOutOfRange failed only for k2
    bad = records_with_failed_assertion(occ, 5).collect()
    assert [r["rowKey"] for r in bad] == ["k2"]


def test_stream(spark, occ):
    from biocache_store_spark.store import stream

    assert sorted(v[0] for v in stream(occ, ["rowKey"])) == ["k1", "k2"]


def test_user_assertion_store_facade(spark):
    """Store.getUserAssertions / addUserAssertion / deleteUserAssertion
    (Store.scala:322-412) over the DataFrame-backed assertion store."""
    from biocache_store_spark import store as S
    from biocache_store_spark.operators.user_assertions import (
        QA_UNCONFIRMED,
        USER_ASSERTION_SCHEMA,
        empty_store,
    )

    st = empty_store(spark)
    new = spark.createDataFrame(
        [("r1", "a1", 10, 0, "", "u1", None, 0)], USER_ASSERTION_SCHEMA
    )
    st = S.add_user_assertion(st, new)
    got = S.get_user_assertions(st, "r1").collect()
    assert len(got) == 1
    assert got[0]["qa_status"] == QA_UNCONFIRMED  # forced unconfirmed on add
    assert S.get_user_assertion(st, "r1", "a1").count() == 1
    st = S.delete_user_assertion(st, "r1", "a1")
    assert S.get_user_assertions(st, "r1").count() == 0


def test_validation_rule_store_facade(spark):
    """Store.addValidationRule / getValidationRules / deleteValidationRule
    (Store.scala:380-394)."""
    from biocache_store_spark import store as S
    from biocache_store_spark.operators.validation_rules import ValidationRule

    rules = spark.createDataFrame(
        [],
        "rule_id string, query string, assertion_code int, "
        "assertion_name string, comment string, wkt string, "
        "bbox array<double>",
    )
    r1 = ValidationRule("vr1", "state:Victoria", 1, "x")
    r2 = ValidationRule("vr2", "year:[2000 TO *]", 2, "y",
                        bbox=(0.0, 0.0, 10.0, 10.0))
    rules = S.upsert_validation_rule(rules, r1)
    rules = S.upsert_validation_rule(rules, r2)
    assert rules.count() == 2
    # upsert replaces by id
    rules = S.upsert_validation_rule(
        rules, ValidationRule("vr1", "state:Tasmania", 1, "x")
    )
    got = {r["rule_id"]: r for r in rules.collect()}
    assert len(got) == 2 and got["vr1"]["query"] == "state:Tasmania"
    assert list(got["vr2"]["bbox"]) == [0.0, 0.0, 10.0, 10.0]
    assert S.get_validation_rules(rules, ["vr2"]).count() == 1
    rules = S.delete_validation_rule(rules, "vr1")
    assert [r["rule_id"] for r in rules.collect()] == ["vr2"]


def test_get_duplicate_details_and_for(spark):
    """Store.getDuplicateDetails (Store.scala:681) + the group-key read
    (DuplicateDAOImpl.getDuplicatesFor): the uuid's whole cluster from
    either end, empty for unique records."""
    from biocache_store_spark import store as S

    dups = spark.createDataFrame(
        [
            ("t1", "2000", "1", "5", "o1", "R", None, [], 4),
            ("t1", "2000", "1", "5", "o2", "D1", "o1", [4], 0),
            ("t1", "2000", "1", "5", "o3", "D2", "o1", [4, 6], 0),
            ("t1", "2000", "1", "5", "o9", "U", None, [], 0),
            ("t2", "2001", "", "", "p1", "R", None, [], 4),
            ("t2", "2001", "", "", "p2", "D1", "p1", [5], 0),
        ],
        "taxon string, year string, month string, day string,"
        " row_key string, status string, duplicate_of string,"
        " dup_types array<int>, precision int",
    )
    # from a duplicate member
    got = {r["row_key"] for r in S.get_duplicate_details(dups, "o2").collect()}
    assert got == {"o1", "o2", "o3"}
    # from the representative
    got = {r["row_key"] for r in S.get_duplicate_details(dups, "o1").collect()}
    assert got == {"o1", "o2", "o3"}
    # unique and unknown uuids -> empty
    assert S.get_duplicate_details(dups, "o9").count() == 0
    assert S.get_duplicate_details(dups, "zz").count() == 0
    # group-key read, blank date parts match the ''-coalesced keys
    got = {
        r["row_key"]
        for r in S.get_duplicates_for(dups, "t2", "2001", None, None).collect()
    }
    assert got == {"p1", "p2"}
