"""IdentificationQualifier / OfflineTest / Miscellaneous-extras tests —
mirror IdentificationQualifierTests.scala and the MiscellaneousProcessor
behaviors."""

from __future__ import annotations

import pytest

from biocache_store_spark.processors.assertions import FAILED, PASSED
from biocache_store_spark.processors.assertions import AssertionCodes as C
from biocache_store_spark.processors.assertions import QualityAssertion as QA
from biocache_store_spark.processors.chain import process_record
from biocache_store_spark.processors.identification import (
    classify_identification_qualifier,
    parse_interaction,
    process_interactions,
    process_offline_tests,
)


# IdentificationQualifierTests.scala:21-55
@pytest.mark.parametrize(
    "value,expected",
    [
        ("?", "Uncertain"),
        ("? abc", "Uncertain"),
        ("sp.", "Uncertain"),
        ("sp. abc", "Uncertain"),
        ("not confirmed", "Uncertain"),
        ("not confirm", "Uncertain"),
        ("certain", "Certain"),
        ("", "Not provided"),
        (None, "Not provided"),
        ("abc as", "Not recognised"),
        ("cf. Macropus", "Uncertain"),
        ("aff. rufus", "Uncertain"),
        ("CONFIRMED by expert", "Certain"),
        ("verified", "Certain"),
        ("possible hybrid", "Uncertain"),
    ],
)
def test_qualifier_classification(value, expected):
    assert classify_identification_qualifier(value) == expected


def test_qualifier_in_chain():
    p, _ = process_record({"identificationQualifier": "sp."})
    assert p["identificationQualifier"] == "Uncertain"
    p, _ = process_record({})
    assert p["identificationQualifier"] == "Not provided"


def test_offline_carry_forward():
    # OfflineTestProcessor.scala:11-30: offline fields + only the offline
    # assertion codes are carried
    last = {"duplicationStatus": "R", "outlierForLayers": ["el882"],
            "associatedOccurrences": "abc|def"}
    last_assertions = [
        QA.failed(C.INFERRED_DUPLICATE_RECORD, "dup"),
        QA.failed(C.DETECTED_OUTLIER, "outlier"),
        QA.failed(C.ZERO_COORDINATES, "not offline"),
    ]
    processed: dict = {}
    carried = process_offline_tests(processed, last, last_assertions)
    assert processed["duplicationStatus"] == "R"
    assert processed["outlierForLayers"] == ["el882"]
    codes = {qa.code for qa in carried}
    assert codes == {C.INFERRED_DUPLICATE_RECORD.code, C.DETECTED_OUTLIER.code}
    # no previous version -> nothing carried
    assert process_offline_tests({}, None, None) == []


def test_interactions():
    # MiscellaneousProcessor.scala:150-172 (dr642 associatedTaxa form)
    assert parse_interaction("Predates:Rattus rattus") == "Predates"
    assert parse_interaction("no colon here") is None
    processed: dict = {}
    process_interactions({"associatedTaxa": "Infects:Eucalyptus"}, processed)
    assert processed["interactions"] == ["Infects"]
    processed = {}
    process_interactions({"associatedTaxa": "host:Eucalyptus"}, processed)
    assert processed["interactions"] == ["Infects"]  # variant -> canonical


def test_media_copy_and_misc_qas():
    raw = {"images": ["http://example.org/a.jpg"], "catalogNumber": None,
           "dataGeneralizations": "generalised to 10km"}
    p, a = process_record(raw)
    assert p.get("images") == ["http://example.org/a.jpg"]

    def status(code):
        found = [x for x in a if x.code == code]
        return found[-1].qa_status if found else None

    assert status(C.MISSING_CATALOGUENUMBER.code) == FAILED
    assert status(C.DATA_ARE_GENERALISED.code) == FAILED
    assert status(C.MISSING_IDENTIFIEDBY.code) == FAILED
    raw = {"catalogNumber": "C123", "identifiedBy": "A Person",
           "dateIdentified": "2020-01-01"}
    _, a2 = process_record(raw)

    def status2(code):
        found = [x for x in a2 if x.code == code]
        return found[-1].qa_status if found else None

    assert status2(C.MISSING_CATALOGUENUMBER.code) == PASSED
    assert status2(C.MISSING_DATEIDENTIFIED.code) == PASSED


def test_reprocessing_retains_sampling():
    # ReprocessingProcessor.scala:18-31
    from biocache_store_spark.processors.identification import process_reprocessing

    processed = {"decimalLatitude": "-35.2", "decimalLongitude": "144.8"}
    last = {"decimalLatitude": "-35.2", "decimalLongitude": "144.8",
            "el": {"el882": 12.5}, "cl": {"cl22": "New South Wales"}}
    process_reprocessing(processed, last)
    assert processed["el"] == {"el882": 12.5}
    # coordinates changed -> sampling NOT carried
    processed = {"decimalLatitude": "-36.0", "decimalLongitude": "144.8"}
    process_reprocessing(processed, last)
    assert "el" not in processed


def test_is_geospatially_kosher_codes_reference_cases():
    """AssertionCodeTest.scala 'Test isGeospatiallyKosher': code 20000
    (miscellaneous band) and code 1 are kosher; any array containing code
    0 (geospatialIssue) is not."""
    from biocache_store_spark.processors.assertions import (
        is_geospatially_kosher_codes,
    )

    assert is_geospatially_kosher_codes([20000]) is True
    assert is_geospatially_kosher_codes([1]) is True
    assert is_geospatially_kosher_codes([0, 1]) is False
    assert is_geospatially_kosher_codes([]) is True
