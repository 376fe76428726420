"""LocationProcessor tests — mirror the coordinate cases of
ProcessLocationTest.scala."""

from __future__ import annotations

from biocache_store_spark.processors.assertions import FAILED, PASSED
from biocache_store_spark.processors.assertions import AssertionCodes as C
from biocache_store_spark.processors.location import process_location


def qa_status(assertions, code):
    found = [a for a in assertions if a.code == code]
    return found[-1].qa_status if found else None


def test_valid_wgs84():
    p, a = process_location(
        {"decimalLatitude": "-35.21667", "decimalLongitude": "144.81060",
         "geodeticDatum": "WGS84"}
    )
    assert p["decimalLatitude"] == "-35.21667"
    assert p["geodeticDatum"] == "EPSG:4326"
    assert qa_status(a, C.COORDINATES_OUT_OF_RANGE.code) == PASSED
    assert qa_status(a, C.UNRECOGNIZED_GEODETIC_DATUM.code) == PASSED


def test_missing_datum_assumed():
    p, a = process_location(
        {"decimalLatitude": "-35.2", "decimalLongitude": "144.8"}
    )
    assert qa_status(a, C.GEODETIC_DATUM_ASSUMED_WGS84.code) == FAILED
    assert p["geodeticDatum"] == "EPSG:4326"


def test_gda94_recognized():
    p, a = process_location(
        {"decimalLatitude": "-35.2", "decimalLongitude": "144.8",
         "geodeticDatum": "GDA94"}
    )
    assert qa_status(a, C.UNRECOGNIZED_GEODETIC_DATUM.code) == PASSED
    assert qa_status(a, C.DECIMAL_LAT_LONG_CONVERTED.code) == FAILED
    assert p["geodeticDatum"] == "EPSG:4326"


def test_unknown_datum_kept():
    p, a = process_location(
        {"decimalLatitude": "-35.2", "decimalLongitude": "144.8",
         "geodeticDatum": "garbage datum"}
    )
    assert qa_status(a, C.UNRECOGNIZED_GEODETIC_DATUM.code) == FAILED
    assert p["decimalLatitude"] == "-35.2"


def test_out_of_range():
    p, a = process_location(
        {"decimalLatitude": "-95.0", "decimalLongitude": "200.0",
         "geodeticDatum": "WGS84"}
    )
    assert qa_status(a, C.COORDINATES_OUT_OF_RANGE.code) == FAILED


def test_inverted_coordinates():
    # lat 144.8 out of range but valid as a longitude -> swap
    p, a = process_location(
        {"decimalLatitude": "144.81060", "decimalLongitude": "-35.21667",
         "geodeticDatum": "WGS84"}
    )
    assert qa_status(a, C.INVERTED_COORDINATES.code) == FAILED
    assert p["decimalLatitude"] == "-35.21667"
    assert p["decimalLongitude"] == "144.81060"


def test_zero_zero():
    p, a = process_location(
        {"decimalLatitude": "0", "decimalLongitude": "0", "geodeticDatum": "WGS84"}
    )
    assert qa_status(a, C.ZERO_COORDINATES.code) == FAILED
    assert p["decimalLatitude"] is None
    assert p["decimalLongitude"] is None


def test_negated_latitude_australia():
    # Australia with positive latitude -> negated-latitude fix
    p, a = process_location(
        {"decimalLatitude": "35.21667", "decimalLongitude": "144.81060",
         "geodeticDatum": "WGS84", "country": "Australia"}
    )
    assert qa_status(a, C.NEGATED_LATITUDE.code) == FAILED
    assert p["decimalLatitude"] == "-35.21667"


def test_country_mismatch():
    p, a = process_location(
        {"decimalLatitude": "55.0", "decimalLongitude": "20.0",
         "geodeticDatum": "WGS84", "country": "Australia"}
    )
    assert qa_status(a, C.COUNTRY_COORDINATE_MISMATCH.code) == FAILED


def test_unknown_country():
    p, a = process_location(
        {"decimalLatitude": "-35.2", "decimalLongitude": "144.8",
         "geodeticDatum": "WGS84", "country": "Notacountry"}
    )
    assert qa_status(a, C.UNKNOWN_COUNTRY_NAME.code) == FAILED


def test_verbatim_dms_fallback():
    p, a = process_location(
        {"verbatimLatitude": "22° 2' S", "verbatimLongitude": "92° 2' E"}
    )
    assert qa_status(a, C.DECIMAL_LAT_LONG_CALCULATED_FROM_VERBATIM.code) == FAILED
    assert float(p["decimalLatitude"]) < 0


def test_uncertainty_parsing():
    p, a = process_location(
        {"decimalLatitude": "-35.2", "decimalLongitude": "144.8",
         "geodeticDatum": "WGS84", "coordinateUncertaintyInMeters": "100 metres"}
    )
    assert p["coordinateUncertaintyInMeters"] == "100.0"
    assert qa_status(a, C.UNCERTAINTY_RANGE_MISMATCH.code) == PASSED


def test_uncertainty_in_precision():
    p, a = process_location(
        {"decimalLatitude": "-35.2", "decimalLongitude": "144.8",
         "geodeticDatum": "WGS84", "coordinatePrecision": "100"}
    )
    assert p["coordinateUncertaintyInMeters"] == "100"
    assert qa_status(a, C.UNCERTAINTY_IN_PRECISION.code) == FAILED


def test_precision_valid():
    p, a = process_location(
        {"decimalLatitude": "-35.217", "decimalLongitude": "144.810",
         "geodeticDatum": "WGS84", "coordinatePrecision": "0.001"}
    )
    assert qa_status(a, C.PRECISION_RANGE_MISMATCH.code) == PASSED
    assert qa_status(a, C.COORDINATE_PRECISION_MISMATCH.code) == PASSED


def test_no_location():
    p, a = process_location({})
    assert qa_status(a, C.LOCATION_NOT_SUPPLIED.code) == FAILED


def test_kosher_flag():
    from biocache_store_spark.processors.assertions import geospatially_kosher

    _, good = process_location(
        {"decimalLatitude": "-35.2", "decimalLongitude": "144.8",
         "geodeticDatum": "WGS84"}
    )
    assert geospatially_kosher(good)
    _, bad = process_location(
        {"decimalLatitude": "0", "decimalLongitude": "0", "geodeticDatum": "WGS84"}
    )
    assert not geospatially_kosher(bad)


def test_grid_reference_resolution():
    p, a = process_location({"gridReference": "NM39"})
    assert p["decimalLatitude"] == "56.97001"
    assert p["decimalLongitude"] == "-6.36199"
    assert p["geodeticDatum"] == "EPSG:4326"
    assert p["coordinateUncertaintyInMeters"] == "10000.0"
    assert qa_status(a, C.DECIMAL_LAT_LONG_CALCULATED_FROM_GRID_REF.code) == FAILED
    assert qa_status(a, C.UNCERTAINTY_NOT_SPECIFIED.code) == PASSED


def test_agd66_reprojection():
    # DatumTest.scala "AGD66 re-projection": coordinates must actually move
    # (~160 m NE for south-east Queensland) and the datum become WGS84
    raw = {"decimalLatitude": "-27.5623432", "decimalLongitude": "152.28342342",
           "geodeticDatum": "AGD66"}
    p, a = process_location(raw)
    assert p["geodeticDatum"] == "EPSG:4326"
    assert p["decimalLatitude"] != raw["decimalLatitude"]
    assert p["decimalLongitude"] != raw["decimalLongitude"]
    assert qa_status(a, C.DECIMAL_LAT_LONG_CONVERTED.code) == FAILED
    assert qa_status(a, C.DECIMAL_LAT_LONG_CONVERSION_FAILED.code) == PASSED
    # shift magnitude sanity: 100-250 m NE
    dlat = float(p["decimalLatitude"]) - float(raw["decimalLatitude"])
    dlon = float(p["decimalLongitude"]) - float(raw["decimalLongitude"])
    assert 0.0005 < dlat < 0.0025 and 0.0005 < dlon < 0.0025


def test_agd84_66_variant_reprojection():
    # DatumTest.scala "AGD84/66 re-projection" (datums.txt maps the combined
    # form to AGD84)
    raw = {"decimalLatitude": "-27.5623432", "decimalLongitude": "152.28342342",
           "geodeticDatum": "AGD84/66"}
    p, a = process_location(raw)
    assert p["geodeticDatum"] == "EPSG:4326"
    assert p["decimalLatitude"] != raw["decimalLatitude"]


def test_reprojection_rounds_to_input_precision():
    # LocationProcessor.scala:459-466: min(dp(lat), dp(lon)) decimals
    p, _ = process_location(
        {"decimalLatitude": "-27.56", "decimalLongitude": "152.2834",
         "geodeticDatum": "AGD66"}
    )
    assert len(p["decimalLatitude"].split(".")[1]) <= 2
    assert len(p["decimalLongitude"].split(".")[1]) <= 2
