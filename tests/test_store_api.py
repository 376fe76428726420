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
