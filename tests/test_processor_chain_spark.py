"""Spark integration of the processing chain: one mapInPandas pass over a
raw occurrences DataFrame + broadcast classification enrichment."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from biocache_store_spark.processors.chain import (
    enrich_classification,
    process_records,
)

TODAY = dt.date(2026, 8, 13)


@pytest.fixture(scope="module")
def occurrences(spark):
    rows = [
        # well-formed Australian record
        ("occ1", "dr1", "PreservedSpecimen", "1978-12-31", None, None, None,
         "-35.21667", "144.81060", "WGS84", "Australia", "Macropus rufus"),
        # transposed coordinates
        ("occ2", "dr1", "preserved_specimen", None, "78", "16", "6",
         None, None, None, None, "Macropus rufus"),
        # zero coordinates -> not kosher
        ("occ3", "dr2", "garbage-bor", "2000-01-01", None, None, None,
         "0", "0", "WGS84", None, "Unknownus speciesus"),
        # missing everything
        ("occ4", "dr2", None, None, None, None, None,
         None, None, None, None, None),
    ]
    cols = [
        "occurrenceID", "dataResourceUid", "basisOfRecord", "eventDate",
        "year", "month", "day", "decimalLatitude", "decimalLongitude",
        "geodeticDatum", "country", "scientificName",
    ]
    return spark.createDataFrame(rows, cols)


@pytest.fixture(scope="module")
def taxa(spark):
    return spark.createDataFrame(
        [("Macropus rufus", "urn:lsid:mr", "species", 10, 11, "Red Kangaroo")],
        ["scientificName", "taxonConceptID", "taxonRank", "lft", "rgt", "vernacularName"],
    )


def test_chain(spark, occurrences, taxa):
    out = process_records(
        occurrences,
        default_values_by_resource={"dr2": {"basisOfRecord": "HumanObservation"}},
        today=TODAY,
    )
    out = enrich_classification(out, taxa)
    rows = {r["occurrenceID"]: r for r in out.collect()}

    r1 = rows["occ1"]
    assert r1["processed"]["basisOfRecord"] == "PreservedSpecimen"
    assert r1["processed"]["eventDate"] == "1978-12-31"
    assert r1["processed"]["decimalLatitude"] == "-35.21667"
    assert r1["processed"]["occurrenceStatus"] == "present"
    assert r1["geospatially_kosher"] is True
    assert r1["matched_taxonConceptID"] == "urn:lsid:mr"
    codes = {a["code"]: a["qa_status"] for a in r1["assertions"]}
    assert codes[10004] == 1  # name recognised

    r2 = rows["occ2"]
    assert r2["processed"]["eventDate"] == "1978-06-16"
    assert r2["processed"]["basisOfRecord"] == "PreservedSpecimen"
    codes2 = {a["code"]: a["qa_status"] for a in r2["assertions"]}
    assert codes2[30009] == 0  # dayMonthTransposed failed

    r3 = rows["occ3"]
    assert r3["geospatially_kosher"] is False  # zero coords
    codes3 = {a["code"]: a["qa_status"] for a in r3["assertions"]}
    assert codes3[4] == 0  # zeroCoordinates
    assert codes3[20002] == 0  # badlyFormedBasisOfRecord
    # default value applied from dr2 before bor stage
    assert r3["processed"]["basisOfRecord"] == "HumanObservation"
    assert r3["matched_taxonConceptID"] is None
    assert codes3[10004] == 0  # nameNotRecognised

    r4 = rows["occ4"]
    codes4 = {a["code"]: a["qa_status"] for a in r4["assertions"]}
    assert codes4[30008] == 0  # missingCollectionDate
    assert codes4[43] == 0  # locationNotSupplied
    # defaults fill bor without assertions
    assert r4["processed"]["basisOfRecord"] == "HumanObservation"


def test_chain_plan_is_single_pass(spark, occurrences):
    out = process_records(occurrences, today=TODAY)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle: scan -> mapInPandas only


def test_assertion_rollups(spark, occurrences):
    """Index-time assertion roll-ups as array higher-order functions
    (SolrIndexDAO.extractPassAndFailed, index/SolrIndexDAO.scala:609-629)."""
    out = process_records(occurrences, today=TODAY)
    rolled = out.select(
        "occurrenceID",
        F.size(F.filter("assertions", lambda a: a["qa_status"] == 0)).alias("n_failed"),
        F.size(F.filter("assertions", lambda a: a["qa_status"] == 1)).alias("n_passed"),
    ).collect()
    by_id = {r["occurrenceID"]: r for r in rolled}
    assert by_id["occ1"]["n_failed"] >= 1  # missing uncertainty etc.
    assert by_id["occ1"]["n_passed"] >= 5


def test_hybrid_chain_equivalent(spark):
    """process_records_hybrid (vocab stages as per-distinct broadcast map
    joins) must produce the same processed struct, the same assertion
    MULTISET, and the same kosher flag as the full per-record pass."""
    from biocache_store_spark.processors.chain import process_records_hybrid

    rows = [
        ("h1", "dr1", "PreservedSpecimen", "holotype material", "native",
         "present", "1978-12-31", "-35.2", "144.8", "WGS84"),
        ("h2", "dr1", "preserved_specimen", "HOLOTYPUS", "naturalised; indigenous",
         "absent", None, None, None, None),
        ("h3", "dr2", "garbage-bor", "junk", "garbage", "", "2000-01-01",
         "0", "0", "WGS84"),
        ("h4", "dr2", None, None, None, None, None, None, None, None),
        ("h5", "dr3", "", "paratype and syntype", None, "zzz-no-such", None,
         "10", "20", "WGS84"),
    ]
    cols = [
        "occurrenceID", "dataResourceUid", "basisOfRecord", "typeStatus",
        "establishmentMeans", "occurrenceStatus", "eventDate",
        "decimalLatitude", "decimalLongitude", "geodeticDatum",
    ]
    df = spark.createDataFrame(rows, cols)
    defaults = {
        "dr2": {"basisOfRecord": "HumanObservation"},
        "dr3": {"typeStatus": "neotype"},
    }
    full = {r["occurrenceID"]: r
            for r in process_records(df, defaults, today=TODAY).collect()}
    hyb = {r["occurrenceID"]: r
           for r in process_records_hybrid(df, defaults, today=TODAY).collect()}
    assert full.keys() == hyb.keys()
    for k in full:
        assert full[k]["processed"].asDict() == hyb[k]["processed"].asDict(), k
        assert sorted(map(tuple, full[k]["assertions"])) == sorted(
            map(tuple, hyb[k]["assertions"])
        ), k
        assert full[k]["geospatially_kosher"] == hyb[k]["geospatially_kosher"], k


def test_pure_stage_memo_equivalent(spark):
    """The round-10 per-task event/location memo (memoize_pure_stages)
    must be invisible in the output: rows sharing date/coordinate tuples
    (memo hits) and rows with unique tuples produce exactly the
    unmemoized results, assertions included."""
    rows = []
    for i in range(40):
        # 4 distinct date tuples x 5 distinct coordinate tuples across
        # 40 records -> heavy memo reuse; a few deliberately dirty
        rows.append((
            f"m{i:02d}", "dr1", "PreservedSpecimen", None, None, None,
            ["1978-12-31", "2000-01-01", "bogus-date", None][i % 4],
            ["-35.2", "0", "91.0", None, "abc"][i % 5],
            ["144.8", "0", "200.0", None, "144.8"][i % 5],
            "WGS84",
        ))
    schema = (
        "occurrenceID string, dataResourceUid string, basisOfRecord string, "
        "typeStatus string, establishmentMeans string, occurrenceStatus "
        "string, eventDate string, decimalLatitude string, decimalLongitude "
        "string, geodeticDatum string"
    )
    df = spark.createDataFrame(rows, schema)
    memo = {r["occurrenceID"]: r
            for r in process_records(df, today=TODAY).collect()}
    plain = {r["occurrenceID"]: r
             for r in process_records(
                 df, today=TODAY, memoize_pure_stages=False
             ).collect()}
    assert memo.keys() == plain.keys()
    for k in memo:
        assert memo[k]["processed"].asDict() == plain[k]["processed"].asDict(), k
        assert [tuple(a) for a in memo[k]["assertions"]] == [
            tuple(a) for a in plain[k]["assertions"]
        ], k
        assert memo[k]["geospatially_kosher"] == plain[k]["geospatially_kosher"], k


def test_hybrid_chain_missing_vocab_columns(spark):
    """Hybrid path with none of the vocab columns present in the input:
    occurrenceStatus defaults to present (assumed), others stay null, and
    the output schema matches the full pass (no helper columns leak)."""
    from biocache_store_spark.processors.chain import process_records_hybrid

    df = spark.createDataFrame(
        [("m1", "dr1", "-35.2", "144.8", "WGS84")],
        ["occurrenceID", "dataResourceUid", "decimalLatitude",
         "decimalLongitude", "geodeticDatum"],
    )
    full = process_records(df, today=TODAY)
    hyb = process_records_hybrid(df, today=TODAY)
    assert [f.name for f in full.schema.fields] == [
        f.name for f in hyb.schema.fields
    ]
    fr, hr = full.collect()[0], hyb.collect()[0]
    assert hr["processed"]["occurrenceStatus"] == "present"
    assert fr["processed"].asDict() == hr["processed"].asDict()
    assert sorted(map(tuple, fr["assertions"])) == sorted(
        map(tuple, hr["assertions"])
    )


def test_hybrid_event_by_distinct_equivalent(spark):
    """The per-distinct-tuple event stage must reproduce the dict-update
    semantics exactly — including process_event explicitly setting
    eventDate to None (invalid future year), which must override a
    resource default, and range nullification via eventDateEnd."""
    from biocache_store_spark.processors.chain import process_records_hybrid

    rows = [
        # future year: parse rejects it outright, so the dr3 default
        # survives on both sides (the was_set=False merge path)
        ("e1", "dr3", "3025-01-02", None, None, None, None),
        # components assemble; event fields from day/month/year
        ("e2", "dr1", None, None, "12", "3", "1999"),
        # separately-supplied end date: differing day nullifies day
        ("e3", "dr1", "1987-05-14", "1987-05-16", None, None, None),
        ("e4", "dr1", None, None, None, None, None),
    ]
    cols = ["occurrenceID", "dataResourceUid", "eventDate", "eventDateEnd",
            "month", "day", "year"]
    df = spark.createDataFrame(rows, cols)
    defaults = {"dr3": {"eventDate": "1999-01-01"}}
    full = {r["occurrenceID"]: r
            for r in process_records(df, defaults, today=TODAY).collect()}
    hyb = {r["occurrenceID"]: r
           for r in process_records_hybrid(df, defaults, today=TODAY).collect()}
    for k in full:
        assert full[k]["processed"].asDict() == hyb[k]["processed"].asDict(), k
        assert sorted(map(tuple, full[k]["assertions"])) == sorted(
            map(tuple, hyb[k]["assertions"])
        ), k
    assert hyb["e1"]["processed"]["eventDate"] == "1999-01-01"  # default kept


def test_hybrid_location_by_distinct_equivalent(spark):
    """Opt-in location lift: distinct-tuple LocationProcessor must match
    the in-loop pass, including the geospatially_kosher recomputation from
    the merged assertion array (zero-coords and transposed fixtures)."""
    from biocache_store_spark.processors.chain import process_records_hybrid

    rows = [
        ("l1", "dr1", "-35.5", "149.25", "WGS84", "Australia"),
        ("l2", "dr1", "0", "0", "WGS84", None),            # zero -> not kosher
        ("l3", "dr1", "149.25", "-35.5", "WGS84", None),    # inverted
        ("l4", "dr2", None, None, None, "vic"),             # state inference
        ("l5", "dr1", "-200.5", "149.25", "WGS84", None),   # out of range
    ]
    cols = ["occurrenceID", "dataResourceUid", "decimalLatitude",
            "decimalLongitude", "geodeticDatum", "country"]
    df = spark.createDataFrame(rows, cols)
    full = {r["occurrenceID"]: r
            for r in process_records(df, today=TODAY).collect()}
    hyb = {r["occurrenceID"]: r
           for r in process_records_hybrid(
               df, today=TODAY, location_by_distinct=True
           ).collect()}
    for k in full:
        assert full[k]["processed"].asDict() == hyb[k]["processed"].asDict(), k
        assert sorted(map(tuple, full[k]["assertions"])) == sorted(
            map(tuple, hyb[k]["assertions"])
        ), k
        assert full[k]["geospatially_kosher"] == hyb[k]["geospatially_kosher"], k
    assert not hyb["l2"]["geospatially_kosher"]
    assert hyb["l1"]["geospatially_kosher"]
