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


def test_state_inferred_from_raw_when_no_coords():
    # processStateCountryValues (LocationProcessor.scala:137-165)
    p, _ = process_location({"stateProvince": "NSW"})
    assert p["stateProvince"] == "New South Wales"
    assert p["country"] == "Australia"


def test_country_from_country_code():
    p, _ = process_location({"countryCode": "AU"})
    assert p["country"] == "Australia"


def test_state_not_inferred_when_coords_present():
    p, _ = process_location(
        {"decimalLatitude": "-35.2", "decimalLongitude": "144.8",
         "geodeticDatum": "WGS84", "stateProvince": "NSW"}
    )
    # no intersect callback -> no processed state; raw state must NOT be
    # canonicalized when coordinates were supplied
    assert "stateProvince" not in p or p["stateProvince"] is None


def test_state_centre_point_detected():
    # ProcessLocationTest "state centre": exact NSW centre at full precision
    from biocache_store_spark.processors.location import (
        STATE_CENTRES,
        coordinates_match_centre,
    )

    centre = STATE_CENTRES["new south wales"]
    assert coordinates_match_centre(centre, "-31.2532183", "146.921099")
    # truncated-precision variants still match (CentrePoints.round truncation)
    assert coordinates_match_centre(centre, "-31.25", "146.92")
    assert not coordinates_match_centre(centre, "-31.26", "146.92")
    assert not coordinates_match_centre(centre, "-31.2", "150.0")


def test_centre_of_state_assertion_via_intersect():
    p, a = process_location(
        {"decimalLatitude": "-31.2532183", "decimalLongitude": "146.921099",
         "geodeticDatum": "WGS84"},
        intersect=lambda lat, lon: {"stateProvince": "New South Wales",
                                    "country": "Australia", "biome": "Terrestrial"},
    )
    assert p["stateProvince"] == "New South Wales"
    assert qa_status(a, C.COORDINATES_CENTRE_OF_STATEPROVINCE.code) == FAILED
    # country came from the layers, not the record
    assert qa_status(a, C.COUNTRY_INFERRED_FROM_COORDINATES.code) == FAILED


def test_state_mismatch():
    # checkForStateMismatch (LocationProcessor.scala:727-748)
    p, a = process_location(
        {"decimalLatitude": "-31.25", "decimalLongitude": "146.92",
         "geodeticDatum": "WGS84", "stateProvince": "Victoria"},
        intersect=lambda lat, lon: {"stateProvince": "New South Wales"},
    )
    assert qa_status(a, C.STATE_COORDINATE_MISMATCH.code) == FAILED
    p, a = process_location(
        {"decimalLatitude": "-31.25", "decimalLongitude": "146.92",
         "geodeticDatum": "WGS84", "stateProvince": "nsw"},
        intersect=lambda lat, lon: {"stateProvince": "New South Wales"},
    )
    assert qa_status(a, C.STATE_COORDINATE_MISMATCH.code) == PASSED


def test_biome_mismatch():
    # checkForBiomeMismatch (LocationProcessor.scala:652-696)
    _, a = process_location(
        {"decimalLatitude": "-31.25", "decimalLongitude": "146.92",
         "geodeticDatum": "WGS84"},
        intersect=lambda lat, lon: {"biome": "Marine"},
        species_habitats=["Terrestrial"],
    )
    assert qa_status(a, C.COORDINATE_HABITAT_MISMATCH.code) == FAILED
    _, a = process_location(
        {"decimalLatitude": "-31.25", "decimalLongitude": "146.92",
         "geodeticDatum": "WGS84"},
        intersect=lambda lat, lon: {"biome": "Terrestrial"},
        species_habitats=["Non-marine"],
    )
    assert qa_status(a, C.COORDINATE_HABITAT_MISMATCH.code) == PASSED


def test_depth_elevation_parsing():
    # processAltitudeAndDepth (LocationProcessor.scala:216-310)
    p, a = process_location(
        {"verbatimDepth": "10m", "verbatimElevation": "100ft"}
    )
    assert p["verbatimDepth"] == "10.0"
    assert qa_status(a, C.DEPTH_OUT_OF_RANGE.code) == PASSED
    assert qa_status(a, C.ALTITUDE_IN_FEET.code) == FAILED
    p, a = process_location({"verbatimDepth": "20000m"})
    assert qa_status(a, C.DEPTH_OUT_OF_RANGE.code) == FAILED
    _, a = process_location({"verbatimElevation": "sealevel"})
    assert qa_status(a, C.ALTITUDE_NON_NUMERIC.code) == FAILED


def test_min_max_reversal():
    p, a = process_location(
        {"minimumDepthInMeters": "20", "maximumDepthInMeters": "10"}
    )
    assert p["minimumDepthInMeters"] == "10.0"
    assert p["maximumDepthInMeters"] == "20.0"
    assert qa_status(a, C.MIN_MAX_DEPTH_REVERSED.code) == FAILED
    p, a = process_location(
        {"minimumElevationInMeters": "100", "maximumElevationInMeters": "200"}
    )
    assert qa_status(a, C.MIN_MAX_ALTITUDE_REVERSED.code) == PASSED


def test_georeference_missing_checks():
    _, a = process_location(
        {"decimalLatitude": "-35.2", "decimalLongitude": "144.8",
         "geodeticDatum": "WGS84", "georeferencedBy": "A Person"}
    )
    assert qa_status(a, C.MISSING_GEOREFERENCEDBY.code) == PASSED
    assert qa_status(a, C.MISSING_GEOREFERENCEPROTOCOL.code) == FAILED
    assert qa_status(a, C.MISSING_GEOREFERENCE_DATE.code) == FAILED


def test_easting_northing_zone_gda94():
    # GA Buninyong MGA94 test point: zone 54 E=758173.797 N=5828674.340
    # -> GDA94 (-37.65282113, 143.92649554), rounded to 5 decimals
    p, a = process_location(
        {"easting": "758173.797", "northing": "5828674.340", "zone": "54"}
    )
    assert p["decimalLatitude"] == "-37.65282"
    assert p["decimalLongitude"] == "143.9265"
    assert qa_status(a, C.DECIMAL_LAT_LONG_CALCULATED_FROM_EASTING_NORTHING.code) == FAILED
    assert qa_status(a, C.DECIMAL_LAT_LONG_CALCULATION_FROM_EASTING_NORTHING_FAILED.code) == PASSED


def test_easting_northing_zone_agd66():
    # AGD66/AMG falls ~150-200m SW of the GDA94 result for the same grid coords
    p66, _ = process_location(
        {"easting": "334000", "northing": "6252000", "zone": "56",
         "verbatimSRS": "AGD66"}
    )
    p94, _ = process_location(
        {"easting": "334000", "northing": "6252000", "zone": "56"}
    )
    assert abs(float(p66["decimalLatitude"]) - float(p94["decimalLatitude"])) > 0.0005
    assert abs(float(p66["decimalLatitude"]) + 33.85786) < 1e-5


def test_easting_northing_unknown_zone():
    p, a = process_location(
        {"easting": "334000", "northing": "6252000", "zone": "99"}
    )
    assert p.get("decimalLatitude") is None
    assert qa_status(a, C.DECIMAL_LAT_LONG_CALCULATION_FROM_EASTING_NORTHING_FAILED.code) == FAILED


def test_wgs84_utm_northern_hemisphere():
    p, _ = process_location(
        {"easting": "448251.795", "northing": "5411932.678", "zone": "31N",
         "verbatimSRS": "WGS84"}
    )
    assert abs(float(p["decimalLatitude"]) - 48.8582) < 1e-4
    assert abs(float(p["decimalLongitude"]) - 2.2945) < 1e-4


def test_easting_northing_zone_reference_values():
    # ProcessLocationTest.scala:546-577
    p, a = process_location({"easting": "539514.0", "northing": "5362674.0", "zone": "55"})
    assert p["decimalLatitude"] == "-41.88688"
    assert p["decimalLongitude"] == "147.47628"
    assert any(
        x.name == "decimalLatLongCalculatedFromEastingNorthing" and x.qa_status == 0
        for x in a
    )


def test_verbatim_dms_float32_string():
    # ProcessLocationTest.scala:579-603 — verbatim coordinates pass through
    # Float, so the stored string is the shortest float32 repr
    p, a = process_location(
        {"verbatimLatitude": "22° 2' 56\" N", "verbatimLongitude": "92° 25' 11\" E"}
    )
    assert p["decimalLatitude"] == "22.04889"
    assert p["decimalLongitude"] == "92.41972"
    assert p["geodeticDatum"] == "EPSG:4326"


def test_agd66_epsg_code_reprojection():
    # ProcessLocationTest.scala:605-637 — EPSG:4202 recognised as AGD66
    p, a = process_location(
        {"decimalLatitude": "-35.126", "decimalLongitude": "150.681",
         "geodeticDatum": "EPSG:4202"}
    )
    assert p["decimalLatitude"] == "-35.125"
    assert p["decimalLongitude"] == "150.682"
    assert p["geodeticDatum"] == "EPSG:4326"
