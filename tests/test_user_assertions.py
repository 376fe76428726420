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
