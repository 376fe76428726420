"""User-assertion lifecycle: add/delete + combined status recalculation.

Mirrors the scenarios of the reference's AssertionIntegrationTest.scala /
QualityAssertionTests.scala against operators/user_assertions.py
(dao/OccurrenceDAOImpl.scala:892-1160 semantics).
"""

from __future__ import annotations

import pytest

from biocache_store_spark.operators.user_assertions import (
    QA_CORRECTED,
    QA_NONE,
    QA_OPEN_ISSUE,
    QA_UNCONFIRMED,
    QA_VERIFIED,
    add_user_assertions,
    combined_user_status,
    delete_user_assertions,
    empty_store,
    overlay_user_status,
)


def _qa(row_key, uuid, code, status, related=None, rec=0):
    return (row_key, uuid, code, status, "", "user1", related, rec)


def _mk(spark, rows):
    from biocache_store_spark.operators.user_assertions import (
        USER_ASSERTION_SCHEMA,
    )

    return spark.createDataFrame(rows, USER_ASSERTION_SCHEMA)


@pytest.fixture(scope="module")
def statuses(spark):
    """One store covering every state-machine branch, evaluated once."""
    store = add_user_assertions(
        empty_store(spark),
        _mk(
            spark,
            [
                # r1: plain user assertion, never verified -> UNCONFIRMED
                _qa("r1", "a1", 10, 0),
                # r2: assertion verified as correct -> VERIFIED
                _qa("r2", "a2", 10, 0),
                # r3: verified then re-flagged open -> OPEN_ISSUE + reopen
                _qa("r3", "a3", 10, 0),
                # r4: two assertions, one verified -> UNCONFIRMED (b4 open)
                _qa("r4", "a4", 10, 0),
                _qa("r4", "b4", 11, 0),
                # r5: corrected -> CORRECTED
                _qa("r5", "a5", 10, 0),
            ],
        ),
    )
    store = add_user_assertions(
        store,
        _mk(
            spark,
            [
                _qa("r2", "v2", 50000, QA_VERIFIED, related="a2", rec=1),
                _qa("r3", "v3a", 50000, QA_VERIFIED, related="a3", rec=1),
                _qa("r3", "v3b", 50000, QA_OPEN_ISSUE, related="a3", rec=2),
                _qa("r4", "v4", 50000, QA_VERIFIED, related="a4", rec=1),
                _qa("r5", "v5", 50000, QA_CORRECTED, related="a5", rec=1),
            ],
        ),
    )
    out = combined_user_status(store)
    return store, {r["rowKey"]: r for r in out.collect()}


def test_unconfirmed_on_add(statuses):
    """A new user assertion is stored unconfirmed and leaves the record
    UNCONFIRMED (OccurrenceDAOImpl.scala:895-897)."""
    _, by_key = statuses
    assert by_key["r1"]["user_assertion_status"] == QA_UNCONFIRMED
    assert by_key["r1"]["outstanding_codes"] == [10]


def test_verified(statuses):
    _, by_key = statuses
    assert by_key["r2"]["user_assertion_status"] == QA_VERIFIED
    assert by_key["r2"]["outstanding_count"] == 0


def test_open_issue_reopens(statuses):
    """The LATEST verification per assertion wins; OPEN_ISSUE reopens the
    verified assertion (getCombinedUserStatus, scala:1074-1080)."""
    _, by_key = statuses
    assert by_key["r3"]["user_assertion_status"] == QA_OPEN_ISSUE
    assert by_key["r3"]["outstanding_codes"] == [10]


def test_mixed_assertions_stay_unconfirmed(statuses):
    """Any un-verified assertion keeps the record UNCONFIRMED even when a
    sibling assertion is verified (scala:1070-1072)."""
    _, by_key = statuses
    assert by_key["r4"]["user_assertion_status"] == QA_UNCONFIRMED
    assert by_key["r4"]["outstanding_codes"] == [11]


def test_corrected(statuses):
    _, by_key = statuses
    assert by_key["r5"]["user_assertion_status"] == QA_CORRECTED


def test_unverified_suppresses_reopen(spark):
    """Reopened codes only surface when NO unverified assertions remain:
    getCombinedUserStatus adds the OPEN_ISSUE-related assertions in the
    `else` branch (scala:1074-1080), which never runs while
    combinedUserAssertions is non-empty — so a record with both reports
    only the unverified codes, status UNCONFIRMED."""
    store = add_user_assertions(
        empty_store(spark),
        _mk(
            spark,
            [
                _qa("r6", "a6", 10, 0),  # verified then reopened below
                _qa("r6", "b6", 11, 0),  # never verified
                _qa("r6", "v6a", 50000, QA_VERIFIED, related="a6", rec=1),
                _qa("r6", "v6b", 50000, QA_OPEN_ISSUE, related="a6", rec=2),
            ],
        ),
    )
    row = {r["rowKey"]: r for r in combined_user_status(store).collect()}["r6"]
    assert row["user_assertion_status"] == QA_UNCONFIRMED
    assert row["outstanding_codes"] == [11]
    assert row["outstanding_count"] == 1


def test_delete_recalculates(spark, statuses):
    """Deleting the open assertion flips r4 to VERIFIED; deleting r1's only
    assertion removes its status row entirely (-> QA_NONE via overlay)."""
    store, _ = statuses
    keys = spark.createDataFrame(
        [("r4", "b4"), ("r1", "a1")], ["rowKey", "uuid"]
    )
    after = delete_user_assertions(store, keys)
    by_key = {r["rowKey"]: r for r in combined_user_status(after).collect()}
    assert by_key["r4"]["user_assertion_status"] == QA_VERIFIED
    assert "r1" not in by_key


def test_overlay_defaults_and_flags(spark, statuses):
    store, _ = statuses
    records = spark.createDataFrame(
        [("r1",), ("r2",), ("r5",), ("r9",)], ["rowKey"]
    )
    out = {r["rowKey"]: r for r in overlay_user_status(records, store).collect()}
    assert out["r9"]["user_assertion_status"] == QA_NONE
    assert out["r9"]["outstanding_count"] == 0
    assert not out["r9"]["user_verified"]
    assert out["r2"]["user_verified"]  # VERIFIED
    assert out["r5"]["user_verified"]  # CORRECTED counts as verified
    assert out["r1"]["has_user_assertions"]
    assert not out["r2"]["has_user_assertions"]


def test_index_overlay_via_build_index(spark, statuses):
    """The user-assertion overlay rides on the index build: records keyed
    by the index id gain user_assertion_status / has_user_assertions /
    user_verified (SolrIndexDAO's userAssertions/userVerified fields)."""
    from biocache_store_spark.operators.index_projection import build_index
    from biocache_store_spark.processors.chain import process_records

    store, _ = statuses
    raw = spark.createDataFrame(
        [("r1", "dr1", "PreservedSpecimen"), ("r2", "dr1", "HumanObservation"),
         ("r9", "dr1", "MachineObservation")],
        ["occurrenceID", "dataResourceUid", "basisOfRecord"],
    )
    idx = build_index(process_records(raw), user_assertions=store)
    rows = {r["id"]: r for r in idx.collect()}
    assert rows["r1"]["user_assertion_status"] == QA_UNCONFIRMED
    assert rows["r1"]["has_user_assertions"]
    assert rows["r2"]["user_assertion_status"] == QA_VERIFIED
    assert rows["r2"]["user_verified"]
    assert rows["r9"]["user_assertion_status"] == QA_NONE


def test_re_add_same_uuid_replaces_not_duplicates(spark):
    """The store is (rowKey, uuid)-keyed: re-adding an existing uuid
    (client retry / edited comment) replaces the row."""
    store = add_user_assertions(
        empty_store(spark), _mk(spark, [_qa("r1", "a1", 10, 0)])
    )
    edited = _mk(spark, [("r1", "a1", 10, 0, "edited comment", "user1", None, 0)])
    store = add_user_assertions(store, edited)
    rows = store.collect()
    assert len(rows) == 1
    assert rows[0]["comment"] == "edited comment"
    st = {r["rowKey"]: r for r in combined_user_status(store).collect()}
    assert st["r1"]["outstanding_count"] == 1  # one logical assertion


def test_delete_cascades_orphaned_verifications(spark):
    """Deleting an assertion removes verifications pointing at it —
    otherwise a record with zero assertions would keep reporting the
    orphaned verification's status instead of QA_NONE."""
    store = add_user_assertions(
        empty_store(spark),
        _mk(
            spark,
            [
                _qa("r1", "a1", 10, 0),
                _qa("r1", "v1", 50000, QA_VERIFIED, related="a1", rec=1),
            ],
        ),
    )
    store = delete_user_assertions(
        store, _mk(spark, [_qa("r1", "a1", 10, 0)]).select("rowKey", "uuid")
    )
    assert store.count() == 0  # the verification cascaded
    records = spark.createDataFrame([("r1",)], "rowKey string")
    r = overlay_user_status(records, store).collect()[0]
    assert r["user_assertion_status"] == QA_NONE
    assert r["user_verified"] is False


def test_latest_verification_tie_breaks_deterministically(spark):
    """Two assertions whose latest verifications share record_num: the
    combined status must not flip between runs — uuid is the tie-break,
    so the lexicographically-greater verification wins."""
    store = add_user_assertions(
        empty_store(spark),
        _mk(
            spark,
            [
                _qa("r1", "a1", 10, 0),
                _qa("r1", "b1", 11, 0),
                _qa("r1", "va", 50000, QA_VERIFIED, related="a1", rec=1),
                _qa("r1", "vb", 50000, QA_CORRECTED, related="b1", rec=1),
            ],
        ),
    )
    st = {r["rowKey"]: r for r in combined_user_status(store).collect()}
    # 'vb' > 'va' lexicographically -> CORRECTED, stably
    assert st["r1"]["user_assertion_status"] == QA_CORRECTED


def test_salted_join_skips_map_columns(spark):
    from pyspark.sql import functions as F

    from biocache_store_spark.operators.skew import salted_join

    skewed = spark.createDataFrame(
        [("k", 1, {"a": "b"}), ("k", 2, {"c": "d"})],
        "key string, v int, m map<string,string>",
    )
    other = spark.createDataFrame([("k", "dim")], "key string, d string")
    out = salted_join(skewed, other, "key").orderBy("v").collect()
    assert [r["v"] for r in out] == [1, 2]
    assert all(r["d"] == "dim" for r in out)


def test_annotate_with_rule_tolerates_null_assertions(spark):
    from pyspark.sql import functions as F

    from biocache_store_spark.operators.validation_rules import ValidationRule, annotate_with_rule

    df = spark.createDataFrame(
        [("r1", "CLOSED", None), ("r2", "OPEN", [])],
        "rowKey string, status string, assertions array<struct<code:int,name:string,qa_status:int,comment:string>>",
    )
    rule = ValidationRule(
        rule_id="q1",
        query="status:OPEN",
        assertion_code=20020,
        assertion_name="openFlag",
        comment="",
    )
    out = {r["rowKey"]: r["assertions"] for r in annotate_with_rule(df, rule).collect()}
    assert out["r1"] is not None and len(out["r1"]) == 1  # null no longer swallows
    assert out["r2"][0]["qa_status"] == 0  # matched -> failed
    assert out["r1"][0]["qa_status"] == 1  # unmatched -> passed
