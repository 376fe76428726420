"""DMS and distance parser tests — mirror VerbatimLatLonTest.scala and
DistanceRangeParserTest.scala."""

from __future__ import annotations

import pytest

from biocache_store_spark.parsers import distance, latlon


@pytest.mark.parametrize(
    "s,expected",
    [
        ("30° 01' S", -30.0166666),
        ("153° 12' E", 153.2),
        ("145° 44' 55.85\" E", 145.74884),
        ("16° 52' 37\" S", -16.876944),
        ("41 05 54.03S", -41.0983416),
        ("121 10 34.681E", 121.176302),
        ("145° 44' 55.85'' E", 145.74884),
        ("17d 27m S", -17.45),
        ("30°  01'S", -30.0166666),
    ],
)
def test_verbatim_latlon(s, expected):
    value = latlon.parse(s)
    assert value is not None, f"failed to parse {s!r}"
    assert value == pytest.approx(expected, abs=1e-4)


@pytest.mark.parametrize("s", ["", "no coords", "999x", None])
def test_verbatim_latlon_invalid(s):
    assert latlon.parse(s) is None


def test_direction_detection():
    assert latlon.parse_with_direction("30° 01' S")[1] == "lat"
    assert latlon.parse_with_direction("153° 12' E")[1] == "lon"


@pytest.mark.parametrize(
    "s,metres,unit",
    [
        ("2000", 2000.0, distance.METRES),
        ("100m", 100.0, distance.METRES),
        ("100 metres", 100.0, distance.METRES),
        ("1km-10km", 10000.0, distance.KILOMETRES),
        ("100m-1000m", 1000.0, distance.METRES),
        (">10km", 10000.0, distance.KILOMETRES),
        (">100m", 100.0, distance.METRES),
        ("<50m", 50.0, distance.METRES),
        ("100-1000 m", 1000.0, distance.METRES),
        ("3km", 3000.0, distance.KILOMETRES),
        ("3.5km", 3500.0, distance.KILOMETRES),
        ("6ft", 1.8288, distance.FEET),
        ("10 feet", 3.048, distance.FEET),
        ("1.5", 1.5, distance.METRES),
        ("100,000m", 100000.0, distance.METRES),
    ],
)
def test_distance(s, metres, unit):
    result = distance.parse(s)
    assert result is not None, f"failed to parse {s!r}"
    value, parsed_unit = result
    assert value == pytest.approx(metres, rel=1e-6)
    assert parsed_unit == unit


@pytest.mark.parametrize("s", ["", "far away", None, "m"])
def test_distance_invalid(s):
    assert distance.parse(s) is None


def test_verbatim_leading_sign_consumed_hemisphere_decides():
    """The reference's leading `[\\-]` character class: an optional '-'
    (or stray backslash) is consumed and IGNORED — the hemisphere letter
    alone decides the sign (VerbatimLatLongParser.scala:10-11)."""
    from biocache_store_spark.parsers.latlon import parse

    assert parse("30° 01' S") == parse("-30° 01' S")
    v = parse("-30° 01' S")
    assert v is not None and v < 0
    # north stays positive even with a leading '-'
    vn = parse("-30° 01' N")
    assert vn is not None and vn > 0


def test_utm_inverse_rejects_nan_and_absurd_northings():
    """A NaN or astronomically large northing must fail fast (None), not
    hang the executor in the meridional-arc iteration."""
    from biocache_store_spark.parsers.utm import easting_northing_zone_to_wgs84

    assert easting_northing_zone_to_wgs84(float("nan"), 6000000.0, "55") is None
    assert easting_northing_zone_to_wgs84(500000.0, float("nan"), "55") is None
    # absurd magnitude: must RETURN promptly (iteration is capped); the
    # nonsense output is then rejected by the downstream lat/lon range QA
    out = easting_northing_zone_to_wgs84(500000.0, 1e22, "55")
    assert out is None or abs(out[0]) > 90  # never a plausible latitude
    # sane input still converts
    ok = easting_northing_zone_to_wgs84(500000.0, 6000000.0, "55")
    assert ok is not None


def test_parse_date_year_zero_ranges_return_none():
    from biocache_store_spark.parsers.dates import parse_date

    for s in ("0000/2000", "2000/0000", "0000-01/2000-01", "0000-01/02"):
        assert parse_date(s) is None, s
